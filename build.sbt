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
  // This host's VM memory is pathologically slow: FIRST touch of a fresh
  // anonymous page provisions from the hypervisor at ~5–20 MB/s, and
  // even RESIDENT memory that has gone cold re-reads at ~50 MB/s (host
  // swap) — measured with a 6 GiB touch loop: first pass 0.005 GB/s,
  // immediate second pass 0.047 GB/s, identical with 2 MiB THP pages
  // (the bottleneck is host bandwidth, not per-fault overhead; an
  // -Xms16g -XX:+AlwaysPreTouch experiment cost 13 MINUTES of JVM
  // startup). The only lever that works here is a SMALL FOOTPRINT:
  // demand-grown heap sized to the suite's live set (the dedup chain now
  // caches 16-byte hash pairs, not shingle strings), so the JVM touches
  // as little fresh memory as possible. THP stays on: fewer guest-side
  // faults for the memory we do touch, zero fallbacks observed.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:+UseTransparentHugePages",
) ++ sys.env.get("SPARK_GRAFT_JVM").map(_.split(" ").toSeq).getOrElse(Seq.empty)
