package graft.analytics

import java.io.File
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** CRASH-RECOVERY rehearsal of the artifact lifecycle with a REAL dead
  * process (r16 verdict #3): a forked child JVM runs a compacting /
  * purging step and `Runtime.halt(137)`s at a [[graft.streaming.Faults]]
  * injection point between the data writes and the pointer commit —
  * the SIGKILL window. The parent then asserts, against a never-crashed
  * CONTROL copy of the same artifact:
  *
  *   1. POINTER INTEGRITY — the crash left `_CURRENT` on the committed
  *      version; the torn next-version dir is invisible to readers
  *      (probe output unchanged, applied-delta ledger intact).
  *   2. RECOVERY — re-running the step in-process (the "restart")
  *      clears the torn dir (`clearStale`) and commits; final table
  *      content (row multisets), ledger, and probe output are
  *      IDENTICAL to the control's.
  *
  * Crash points chosen for the messiest states: `compact.table
  * .signatures` (first table rewritten into vNext, second not — a
  * partial table set) and `purge.precommit` (every table rewritten,
  * sidecar dropped from vNext, pointer not swapped). Together with the
  * admission-replay specs (`IngestAdmitSpec`), this completes the
  * at-least-once story for the index lifecycle: every transaction
  * either committed atomically or left a state the next attempt
  * rebuilds from scratch.
  */
class CrashRecoverySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = {
    import spark.implicits._
    graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
  }

  private def rows(idx: String, table: String): Seq[String] = {
    val cur = graft.analytics.DedupIndex.currentVersion(idx).get
    spark.read.parquet(new File(new File(idx, s"v$cur"), table)
      .getAbsolutePath).collect().map(_.toString).toSeq.sorted
  }

  private def probeSet(idx: String,
      delta: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    DedupIndex.probe(spark, idx, delta).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def copyDir(src: String, dst: String): Unit = {
    val s = Paths.get(src); val d = Paths.get(dst)
    Files.walk(s).iterator().asScala.foreach { p =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
  }

  /** Fork `graft.CrashProbe` with this JVM's classpath and module opens;
    * returns the exit code. 137 = halted at the injection point.
    */
  private def fork(mode: String, idx: String, point: String,
      extra: String*): Int = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val in = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    // reconstruct --add-opens pairs however the launcher passed them
    // (two args or one --add-opens=… arg) — Spark on JDK 17 needs them
    val opens = in.sliding(2).collect {
      case List("--add-opens", v) => List("--add-opens", v)
    }.flatten.toList ++ in.filter(_.startsWith("--add-opens="))
    val cmd = List(javaBin) ++ opens ++ List(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.CrashProbe", mode, idx, point) ++ extra
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    info(s"[fork $mode@$point] rc=$rc " +
      out.linesIterator.toSeq.takeRight(3).mkString(" | "))
    rc
  }

  test("SIGKILL mid-compact and mid-purge: pointer integrity, torn-dir " +
      "invisibility, and restart parity with a never-crashed control") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-crash-idx").toString
    val corpus = docs.filter($"doc_id" % 5 =!= 4)
    val delta = docs.filter($"doc_id" % 5 === 4)
    DedupIndex.build(spark, corpus, idx, DedupIndex.Shape.Oracle)
    // accrual so compact has something to fold; tombstones so purge
    // has something to drop
    val seed = corpus.orderBy($"doc_id").limit(1).collect().head.getString(1)
    assert(DedupIndex.append(spark,
      Seq((700001L, seed)).toDF("doc_id", "text"), idx, "crash-delta-1"))
    val dropIds = probeSet(idx, delta).map(_._1).toSeq.sorted.take(2)
    assert(dropIds.nonEmpty, "fixture must contain cross-split pairs")
    assert(DedupIndex.delete(spark, idx, dropIds.toDF("doc_id"), "crash-td"))
    val probePre = probeSet(idx, delta)
    val deltasPre = DedupIndex.appliedDeltas(idx)
    val vPre = DedupIndex.currentVersion(idx).get

    // CONTROL: the same artifact, compact + purge without any crash
    val control = Files.createTempDirectory("graft-crash-ctl").toString
    new File(control).delete()
    copyDir(idx, control)
    assert(DedupIndex.compact(spark, control, maxFiles = 0) > 0)
    assert(DedupIndex.purge(spark, control))
    val ctlSig = rows(control, "signatures")
    val ctlBands = rows(control, "bands")
    val ctlDeltas = DedupIndex.appliedDeltas(control)
    val ctlProbe = probeSet(control, delta)

    // CRASH 1: halt after the FIRST table (signatures) is rewritten
    // into vNext, before bands and before any commit metadata
    assert(fork("compact", idx, "compact.table.signatures") == 137,
      "child must halt at the injection point (0 = point never fired)")
    assert(DedupIndex.currentVersion(idx).contains(vPre),
      "crash moved the pointer — swap must be the last step")
    assert(probeSet(idx, delta) === probePre,
      "torn compact dir visible to readers")
    assert(DedupIndex.appliedDeltas(idx) === deltasPre)
    // RESTART: the retried compact clears the torn dir and commits
    assert(DedupIndex.compact(spark, idx, maxFiles = 0) > 0)
    assert(DedupIndex.currentVersion(idx).contains(vPre + 1))
    assert(probeSet(idx, delta) === probePre,
      "recovered compact changed probe output")

    // CRASH 2: halt after EVERY purge table is rewritten, pre-commit
    assert(fork("purge", idx, "purge.precommit") == 137,
      "child must halt at the injection point (0 = point never fired)")
    assert(DedupIndex.currentVersion(idx).contains(vPre + 1),
      "crash moved the pointer — swap must be the last step")
    assert(probeSet(idx, delta) === probePre,
      "torn purge dir visible to readers (tombstone filter lost)")
    // RESTART: the retried purge commits
    assert(DedupIndex.purge(spark, idx))

    // FINAL PARITY with the never-crashed control: identical table
    // multisets, ledger, and probe output
    assert(rows(idx, "signatures") === ctlSig,
      "post-recovery signatures differ from the never-crashed control")
    assert(rows(idx, "bands") === ctlBands,
      "post-recovery bands differ from the never-crashed control")
    assert(DedupIndex.appliedDeltas(idx) === ctlDeltas)
    assert(probeSet(idx, delta) === ctlProbe)
    assert(ctlProbe === probePre, "purge changed probe output")
  }

  test("SIGKILL mid-CHAIN of a budget-sliced purge: committed slice " +
      "progress survives the crash, the resumed purge redoes no " +
      "committed slice, and parity with a never-crashed control holds") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-crash-slice").toString
    val corpus = docs.filter($"doc_id" % 5 =!= 4)
    val delta = docs.filter($"doc_id" % 5 === 4)
    DedupIndex.build(spark, corpus, idx, DedupIndex.Shape.Oracle)
    val dropIds = probeSet(idx, delta).map(_._1).toSeq.sorted.take(2)
    assert(dropIds.nonEmpty, "fixture must contain cross-split pairs")
    assert(DedupIndex.delete(spark, idx, dropIds.toDF("doc_id"),
      "slice-td"))
    val probePre = probeSet(idx, delta)

    // CONTROL: the same artifact, sliced to completion without a crash
    val control = Files.createTempDirectory("graft-crash-slice-c").toString
    new File(control).delete()
    copyDir(idx, control)
    var guard = 0
    while ({ assert(DedupIndex.purge(spark, control, budget = 1))
      guard += 1
      DedupIndex.purgePending(control) && guard < 64 }) ()
    assert(guard >= 2 && guard < 64,
      s"fixture must take >= 2 slices (took $guard)")
    val ctlSig = rows(control, "signatures")
    val ctlBands = rows(control, "bands")
    val ctlProbe = probeSet(control, delta)

    // slice 1 commits in-process; record what it REWROTE (non-link vs
    // the pre-purge version) so the recovery can prove no redone work
    val vPre = DedupIndex.currentVersion(idx).get
    assert(DedupIndex.purge(spark, idx, budget = 1))
    assert(DedupIndex.purgePending(idx),
      "whole purge fit one slice — mid-chain crash pins nothing")
    val vS1 = DedupIndex.currentVersion(idx).get
    def tableFiles(v: Long, t: String): Map[String, File] = {
      def files(d: File): Seq[File] = Option(d.listFiles())
        .getOrElse(Array.empty).toSeq
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      val tDir = new File(new File(idx, s"v$v"), t)
      (files(tDir) ++ files(new File(tDir, "_l0")))
        .map(f => s"$t/${f.getName}" -> f).toMap
    }
    val tables = Seq("signatures", "bands")
    val preFiles = tables.flatMap(tableFiles(vPre, _)).toMap
    val slice1Rewrote = tables.flatMap(tableFiles(vS1, _)).filter {
      case (rel, f) => !preFiles.get(rel).exists(old =>
        Files.isSameFile(f.toPath, old.toPath))
    }
    assert(slice1Rewrote.nonEmpty, "slice 1 rewrote nothing — fixture " +
      "too weak to pin no-redone-work")

    // CRASH during slice 2, pre-commit
    assert(fork("purge-slice", idx, "purge.precommit") == 137,
      "child must halt at the injection point (0 = point never fired)")
    assert(DedupIndex.currentVersion(idx).contains(vS1),
      "crash moved the pointer — swap must be the last step")
    assert(new File(new File(idx, s"v$vS1"), "_purge.txt").exists(),
      "slice-1 progress lost to the crash")
    assert(new File(new File(idx, s"v$vS1"), "tombstones").isDirectory,
      "sidecar must survive a mid-chain crash (logical filter intact)")
    assert(probeSet(idx, delta) === probePre,
      "torn slice visible to readers")

    // RESUME: budget=1 to completion; committed slice-1 files must
    // carry as hard links through every later slice — nothing redone
    guard = 0
    while ({ assert(DedupIndex.purge(spark, idx, budget = 1))
      guard += 1
      DedupIndex.purgePending(idx) && guard < 64 }) ()
    val vFinal = DedupIndex.currentVersion(idx).get
    val finalFiles = tables.flatMap(tableFiles(vFinal, _)).toMap
    for ((rel, f) <- slice1Rewrote) {
      val carried = finalFiles.get(rel)
      assert(carried.exists(c => Files.isSameFile(c.toPath, f.toPath)),
        s"slice-1 output $rel was redone after the crash")
    }
    assert(rows(idx, "signatures") === ctlSig,
      "post-recovery signatures differ from the never-crashed control")
    assert(rows(idx, "bands") === ctlBands,
      "post-recovery bands differ from the never-crashed control")
    assert(probeSet(idx, delta) === ctlProbe)
    assert(ctlProbe === probePre, "sliced purge changed probe output")
  }

  test("SIGKILL between a JOURNALED enqueue and its drain: the restarted " +
      "stream applies the takedown with NO caller re-request") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("graft-crash-journal").toString
    DedupIndex.build(spark, docs.filter($"doc_id" % 5 =!= 4), idx,
      DedupIndex.Shape.Oracle)
    val delta = docs.filter($"doc_id" % 5 === 4)
    val matched = probeSet(idx, delta).map(_._1).toSeq.sorted
    assert(matched.nonEmpty, "fixture must contain cross-split pairs")
    val dropId = matched.head
    val jd = new File(idx, graft.streaming.TakedownQueue.DefaultJournalName)
      .getAbsolutePath

    // the "previous process" runs the DEFAULT wiring — no journalDir
    // anywhere; the stream attaches the artifact-default journal — then
    // dies before any batch could drain its request (a REAL dead
    // process, not a simulated one)
    assert(fork("journal-request", idx, s"$dropId", "crash-journal-td")
        == 137,
      "child must halt right after the journaled request")
    assert(Option(new File(jd).listFiles()).getOrElse(Array.empty)
      .exists(_.getName.endsWith(".req")),
      "the crashed process must leave its journaled entry behind — " +
        "the writer seat is supposed to be durable BY DEFAULT")

    // RESTART, still default-wired: constructing the stream attaches
    // the journal and replays the entry; the stream drains it — nobody
    // calls request again
    val tq = new graft.streaming.TakedownQueue()
    val rows = delta.as[graft.streaming.IngestDoc].collect()
      .sortBy(_.doc_id).toSeq
    val input = MemoryStream[graft.streaming.IngestDoc]
    val q = graft.streaming.IngestDedup.dedupIngestFromIndex(input.toDS(),
      idx, Files.createTempDirectory("graft-crash-journal-ck").toString,
      admitId = Some("cjstream"), takedowns = Some(tq)) { (pairs, _) =>
        pairs.count(); ()
      }
    try {
      assert(!tq.isEmpty,
        "the journal entry must replay at the default attach")
      input.addData(rows); q.processAllAvailable()
    } finally q.stop()
    assert(DedupIndex.appliedDeltas(idx).contains("crash-journal-td"),
      "the replayed takedown must reach the applied-delta ledger")
    assert(!Option(new File(jd).listFiles()).getOrElse(Array.empty)
      .exists(_.getName.endsWith(".req")),
      "the drained entry must truncate from the journal")
    assert(probeSet(idx, delta).forall(p =>
      p._1 != dropId && p._2 != dropId),
      "the journaled takedown must filter probes after the restart drain")
  }

  test("SIGKILL mid-admission (takedown delete, pre-commit): the deltaId " +
      "is NOT recorded, so the caller's re-request applies") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-crash-admit").toString
    DedupIndex.build(spark, docs.filter($"doc_id" % 5 =!= 4), idx,
      DedupIndex.Shape.Oracle)
    val vPre = DedupIndex.currentVersion(idx).get
    assert(fork("admit", idx, "admit.precommit") == 137)
    assert(DedupIndex.currentVersion(idx).contains(vPre))
    assert(!DedupIndex.appliedDeltas(idx).contains("crash-admit-td"),
      "a crashed admission must not appear applied — the ledger IS the " +
        "takedown acknowledgement check")
    // the re-request (the documented caller contract) applies cleanly
    assert(DedupIndex.delete(spark, idx, Seq(1L).toDF("doc_id"),
      "crash-admit-td"))
    assert(DedupIndex.appliedDeltas(idx).contains("crash-admit-td"))
  }
}
