package graft

/** Child-JVM fault injector for the crash-recovery rehearsal
  * (`CrashRecoverySpec` forks this main): opens the artifact at
  * `args(1)` and runs ONE lifecycle step, installing `Runtime.halt(137)`
  * at the [[graft.streaming.Faults]] point named by `args(2)` — halt is
  * the SIGKILL equivalent (no stack unwinding, no finally blocks, no
  * shutdown hooks), so the parent observes a genuinely dead process
  * whose last on-disk state is a torn next-version dir with the
  * pointer still on the committed version. Exit codes: 137 = halted at
  * the requested point (the rehearsal's success path); 0 = the step
  * completed WITHOUT reaching the point — the spec fails on that,
  * because a rehearsal that didn't crash proved nothing.
  *
  *   runMain graft.CrashProbe compact <indexDir> compact.table.signatures
  *   runMain graft.CrashProbe purge   <indexDir> purge.precommit
  *   runMain graft.CrashProbe purge-slice <indexDir> purge.precommit
  *   runMain graft.CrashProbe admit   <indexDir> admit.precommit
  *   runMain graft.CrashProbe journal-request <indexDir> <id,id,…> <deltaId>
  *     (no injection point: opens the DEFAULT-wired admitting stream —
  *     plain `new TakedownQueue()`, no journalDir anywhere — so the
  *     stream attaches `<indexDir>/_takedown_journal` itself, then
  *     requests the takedown and halts immediately after `request`
  *     returns: the enqueue-to-drain window the default journal exists
  *     to survive)
  */
object CrashProbe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val idx = args(1)
    val point = args(2)
    if (mode == "journal-request") {
      val spark = GraftSession.local(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-crashprobe")
      spark.sparkContext.setLogLevel("WARN")
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.IngestDoc]
      val tq = new graft.streaming.TakedownQueue()
      val q = graft.streaming.IngestDedup.dedupIngestFromIndex(
        input.toDS(), idx,
        java.nio.file.Files.createTempDirectory("crashprobe-jck").toString,
        admitId = Some("cjprev"), takedowns = Some(tq)) { (p, _) =>
          p.count(); ()
        }
      require(q.isActive)
      tq.request(point.split(',').map(_.trim.toLong).toSeq, args(3))
      System.err.println("[crashprobe] halting after journaled request")
      Runtime.getRuntime.halt(137)
    }
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-crashprobe")
    spark.sparkContext.setLogLevel("WARN")
    graft.streaming.Faults.handler = p =>
      if (p == point) {
        System.err.println(s"[crashprobe] halting at $p")
        Runtime.getRuntime.halt(137)
      }
    mode match {
      case "compact" =>
        // maxFiles = 0: threshold collapses to the bucket floor, so any
        // admission accrual forces the rewrite (same as the specs)
        graft.analytics.DedupIndex.compact(spark, idx, maxFiles = 0)
      case "purge" =>
        graft.analytics.DedupIndex.purge(spark, idx)
      case "purge-slice" =>
        // ONE budget=1 slice — the spec commits earlier slices
        // in-process first, so the halt lands MID-CHAIN: committed
        // version carries _purge.txt progress, sidecar still up
        graft.analytics.DedupIndex.purge(spark, idx, budget = 1)
      case "admit" =>
        import spark.implicits._
        graft.analytics.DedupIndex.delete(spark, idx,
          Seq(1L).toDF("doc_id"), "crash-admit-td")
      case other => sys.error(s"unknown mode $other")
    }
    // reaching here means the injection point never fired
    spark.stop()
    sys.exit(0)
  }
}
