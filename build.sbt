ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "galaxyspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the 61-query bench holds several cached dedup artifacts
  // at once; at 8g GC pauses dominated run-to-run variance on local[32]
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // THP (madvise mode) for the heap + full pre-touch at startup. This
  // host faults anonymous 4 KiB pages at ~0.02 GB/s (~200 µs/page — VM
  // on-demand memory), so a growing 16 GiB heap costs ~14 CPU-MINUTES of
  // page faults scattered across whichever queries first touch each
  // region — measured as random 10–90 s stalls on trivial queries, 45%
  // system CPU, and 3–8× suite-wide bench inflation. With 2 MiB huge
  // pages the same memory faults at ~138 GB/s (6800×), and AlwaysPreTouch
  // moves the whole cost to a sub-second JVM-startup step.
  "-XX:+UseTransparentHugePages",
  "-XX:+AlwaysPreTouch",
) ++ sys.env.get("SPARK_GRAFT_JVM").map(_.split(" ").toSeq).getOrElse(Seq.empty)
