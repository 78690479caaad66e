package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{count, element_at, expr, lit, window, xxhash64}
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Structured Streaming semantics: watermark lateness handling on windowed
  * aggregation, and stateful gap sessionization (session closure on gap and
  * on watermark timeout).
  */
class EventStreamsSpec extends SparkSpec {

  // base offset keeps all event times strictly above the initial watermark
  // (epoch 0) — a row AT the watermark is considered late and dropped
  private val BaseMin = 1020L // hour-aligned so window starts == ts(0), ts(60), …

  private def ts(minutes: Long): Timestamp =
    new Timestamp((BaseMin + minutes) * 60000L)

  private def ev(id: Long, min: Long, user: Long = 1L,
      tpe: String = "click", value: Double = 1.0): StreamEvent =
    StreamEvent(id, ts(min), user, tpe, value)

  test("tumbling window aggregates by event time; late-beyond-watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.tumblingCounts(input.toDS())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events in hour-0, one in hour-1; advances watermark to
      // max(ts) - 2h
      input.addData(ev(1, 10), ev(2, 20), ev(3, 70))
      q.processAllAvailable()
      // batch 2: push watermark past hour-1 (ts=300 ⇒ wm=180) so hours 0+1
      // finalize and emit (Append emits only finalized windows)
      input.addData(ev(4, 300))
      q.processAllAvailable()
      val emitted = spark.table("tumbling")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(emitted.contains((ts(0), "click", 2L, 2.0)))
      assert(emitted.contains((ts(60), "click", 1L, 1.0)))
      // batch 3: a too-late row for hour 0 (watermark already at 180) is
      // dropped; a fresh row advances watermark to finalize hour 5
      input.addData(ev(5, 15), ev(6, 500))
      q.processAllAvailable()
      val after = spark.table("tumbling")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(after.count(_._1 == ts(0)) == 1, "late row must not reopen hour 0")
      assert(after.contains((ts(300), "click", 1L, 1.0)))
    } finally q.stop()
  }

  test("native session_window: gap merge + watermark finalization") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.sessionWindowAgg(input.toDS())
      .writeStream.format("memory").queryName("sesswin")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: events at 0, 10, 25 min (gaps < 30) → ONE session;
      // at 70 min (gap 45) → a second session
      input.addData(ev(1, 0), ev(2, 10), ev(3, 25), ev(4, 70))
      q.processAllAvailable()
      // advance the watermark far past both session ends so Append emits
      input.addData(ev(5, 500))
      q.processAllAvailable()
      val emitted = spark.table("sesswin")
        .as[(Long, Timestamp, Long, Double)].collect().toSet
      assert(emitted.contains((1L, ts(0), 3L, 3.0)),
        s"merged 3-event session expected in $emitted")
      assert(emitted.contains((1L, ts(70), 1L, 1.0)),
        s"45-min gap must start a new session in $emitted")
    } finally q.stop()
  }

  test("sessionize: gap closes a session; watermark timeout closes the tail") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: events at 0,10,20 then a gap, then 60 → first session closes
      // when the 60-min event arrives in the SAME group invocation
      input.addData(ev(1, 0), ev(2, 10), ev(3, 20), ev(4, 60))
      q.processAllAvailable()
      val first = spark.table("sessions").as[UserSession].collect()
      assert(first.length == 1)
      assert(first.head == UserSession(1L, ts(0), ts(20), 3L, 3.0))
      // a far-future event from ANOTHER user advances the watermark past
      // 60+30 ⇒ user 1's open session times out and closes
      input.addData(ev(5, 400, user = 2L))
      q.processAllAvailable()
      input.addData(ev(6, 500, user = 2L)) // one more nudge for the timeout pass
      q.processAllAvailable()
      val closed = spark.table("sessions").as[UserSession].collect()
      assert(closed.exists(s => s.user_id == 1L && s.session_start == ts(60)
        && s.n_events == 1L))
    } finally q.stop()
  }

  test("sessionize parity with the batch sessionizer on in-order data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // deterministic in-order event set for 3 users with gaps
    val events = for {
      u <- 1L to 3L
      i <- 0L until 20L
    } yield ev(u * 100 + i, min = i * 7 + (if (i >= 10) 60 else 0), user = u,
      value = i.toDouble)
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events)
      q.processAllAvailable()
      input.addData(ev(9999, 10000, user = 99L)) // flush via watermark
      q.processAllAvailable()
      input.addData(ev(10000, 10001, user = 99L))
      q.processAllAvailable()
      val streamed = spark.table("sessions_parity").as[UserSession]
        .collect().filter(_.user_id <= 3).toSet
      // batch truth: i*7 for i<10 (gap 7min), then jump +60 at i=10 → 2
      // sessions per user: [0..63]x10 and [130..193]x10
      val expected = (1L to 3L).flatMap { u =>
        Seq(
          UserSession(u, ts(0), ts(63), 10L, (0L until 10L).map(_.toDouble).sum),
          UserSession(u, ts(130), ts(193), 10L, (10L until 20L).map(_.toDouble).sum))
      }.toSet
      assert(streamed == expected)
    } finally q.stop()
  }

  test("enrich joins the stream with a broadcast static dimension") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.enrich(input.toDS(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(1, 10, user = 1L), ev(2, 11, user = 3L))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select($"event_id", $"segment").as[(Long, Option[String])]
        .collect().toMap
      assert(rows(1L).contains("gold"))
      assert(rows(2L).isEmpty) // left join keeps unmatched stream rows
    } finally q.stop()
  }

  test("stream-stream interval join matches purchases to prior clicks only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.clickPurchaseJoin(input.toDS())
      .writeStream.format("memory").queryName("cpjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        ev(1, 0, user = 1L, tpe = "click"),
        ev(2, 20, user = 1L, tpe = "purchase", value = 9.0), // 20min after → match
        ev(3, 40, user = 1L, tpe = "purchase", value = 7.0), // 40min after → no
        ev(4, 10, user = 2L, tpe = "purchase", value = 5.0)) // no click → no
      q.processAllAvailable()
      // advance both watermarks far enough to close all join windows
      input.addData(ev(8, 1000, user = 9L, tpe = "click"),
        ev(9, 1000, user = 9L, tpe = "purchase"))
      q.processAllAvailable()
      val rows = spark.table("cpjoin")
        .select($"purchase_id", $"click_id").as[(Long, Long)]
        .collect().toSet
      assert(rows.contains((2L, 1L)))
      assert(!rows.exists(_._1 == 3L))
      assert(!rows.exists(_._1 == 4L))
    } finally q.stop()
  }

  test("dedupById suppresses within-watermark duplicates across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.dedupById(input.toDS())
      .writeStream.format("memory").queryName("dedup_id")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(1, 10), ev(1, 10), ev(2, 20)) // dup within batch
      q.processAllAvailable()
      input.addData(ev(1, 10), ev(3, 30)) // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_id").as[StreamEvent]
        .collect().map(_.event_id).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("dedupByContent drops redeliveries but keeps repeated actions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.dedupByContent(input.toDS())
      .writeStream.format("memory").queryName("dedup_content")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        ev(1, 10, user = 7L, value = 5.0),
        ev(2, 10, user = 7L, value = 5.0), // redelivery: same ts+payload, new id → dup
        ev(3, 25, user = 7L, value = 5.0)) // same action REPEATED later → kept
      q.processAllAvailable()
      val rows = spark.table("dedup_content").as[StreamEvent].collect()
      assert(rows.length === 2)
      assert(rows.map(_.event_id).sorted.toSeq === Seq(1L, 3L))
    } finally q.stop()
  }

  test("windowed CMS accumulates across micro-batches exactly (sum-merge in state)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.windowedCms(input.toDS())
      .writeStream.format("memory").queryName("wcms")
      .outputMode(OutputMode.Append()).start()
    try {
      // hour-0 rows split across TWO batches: the sketch must merge in the
      // state store, not restart per batch
      input.addData(ev(1, 5, tpe = "click"), ev(2, 10, tpe = "view"))
      q.processAllAvailable()
      input.addData(ev(3, 20, tpe = "click"), ev(4, 25, tpe = "click"))
      q.processAllAvailable()
      input.addData(ev(5, 300)) // advance watermark → finalize hour 0
      q.processAllAvailable()
      val row = spark.table("wcms")
        .filter($"window_start" === ts(0)).collect().head
      assert(row.getLong(2) === 4L)
      val cms = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        row.getSeq[Long](1).toArray)
      val hashOf = (s: String) => spark.range(1)
        .select(xxhash64(lit(s))).first().getLong(0)
      // 2 distinct keys in a 256-wide 4-deep sketch: estimates are exact
      // unless all 4 rows collide (probability ~(2/256)^4)
      assert(graft.functions.CmsKernel.estimate(cms, hashOf("click"), 4) === 3L)
      assert(graft.functions.CmsKernel.estimate(cms, hashOf("view"), 4) === 1L)
    } finally q.stop()
  }

  test("windowed approx-percentiles: GK buffers merge across batches in " +
      "the state store; result equals the one-batch build") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // values chosen so every quantile is a distinct element — any
    // cross-batch merge bug shifts a rank and changes the output
    val hour0 = (1 to 20).map(i => ev(i, (i % 55).toLong, value = i * 1.0))
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.windowedPercentiles(input.toDS())
      .writeStream.format("memory").queryName("wpct")
      .outputMode(OutputMode.Append()).start()
    try {
      // hour-0 rows split across TWO batches: the sketch buffers must
      // merge in the state store, not restart per batch
      input.addData(hour0.take(8))
      q.processAllAvailable()
      input.addData(hour0.drop(8))
      q.processAllAvailable()
      input.addData(ev(99, 500)) // advance watermark → finalize hour 0
      q.processAllAvailable()
      val streamed = spark.table("wpct")
        .filter($"window_start" === ts(0)).collect().head
      // one batch pass over the same rows = the reference answer
      val batch = hour0.toDS()
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(expr("approx_percentile(value, array(0.5, 0.9, 0.99), 1000)")
          .as("p"))
        .select(element_at($"p", 1), element_at($"p", 2), element_at($"p", 3))
        .collect().head
      assert(streamed.getDouble(2) === batch.getDouble(0), "p50")
      assert(streamed.getDouble(3) === batch.getDouble(1), "p90")
      assert(streamed.getDouble(4) === batch.getDouble(2), "p99")
      assert(streamed.getLong(5) === 20L)
    } finally q.stop()
  }

  test("windowed approx-percentiles: streaming output over the events " +
      "table equals the ORACLED batch face q_events_window_percentile") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // at sf0.001 every (window, type) group is far below the streaming
    // face's accuracy=1000, so GK's rank-error bound is < 1 and both
    // accuracies return the exact rank element — the streaming dashboard
    // and the driver-gate oracle row must agree cell-for-cell
    val dir = "/root/testdata/sf0.001"
    val events = graft.GraftSession.table(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[StreamEvent].collect().toSeq
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.windowedPercentiles(input.toDS())
      .writeStream.format("memory").queryName("wpct_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      events.grouped(300).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      // flush: watermark far past every window
      input.addData(StreamEvent(999999L,
        new Timestamp(events.map(_.ts.getTime).max + 100L * 3600_000L),
        1L, "flush", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("wpct_parity")
        .filter($"event_type" =!= "flush")
        .select($"window_start", $"event_type", $"p50", $"p90", $"p99", $"n")
        .collect().map(_.toSeq).toSet
      val batch = graft.analytics.EventsQueries
        .qEventsWindowPercentile(spark, dir)
        .collect().map(_.toSeq).toSet
      assert(streamed === batch,
        "streaming dashboard diverged from the oracled batch face")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog and terminates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamEvent]
    input.addData(ev(1, 10), ev(2, 20), ev(3, 30))
    val q = input.toDS()
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("avail_now")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // the batch-catchup operation mode: process everything available,
    // commit the checkpoint, stop on its own (no manual stop())
    assert(q.awaitTermination(60000), "query must self-terminate")
    assert(!q.isActive)
    val n = spark.table("avail_now").as[(String, Long)].collect().toMap
    assert(n("click") === 3L)
  }

  test("foreachBatch upsert keeps latest-per-user; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val store = new EventStreams.UpsertStore
    val input = MemoryStream[StreamEvent]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-upsert-ckpt").toString
    val q = EventStreams.upsertLatest(input.toDS(), store, ckpt)
    try {
      input.addData(ev(1, 10, user = 1, value = 5.0),
        ev(2, 20, user = 1, value = 7.0), ev(3, 15, user = 2, value = 3.0))
      q.processAllAvailable()
      assert(store.snapshot(1L).event_id === 2L)
      assert(store.snapshot(1L).value === 7.0)
      assert(store.snapshot(2L).event_id === 3L)
      // a later batch overwrites user 1, leaves user 2
      input.addData(ev(4, 30, user = 1, value = 9.0))
      q.processAllAvailable()
      assert(store.snapshot(1L).event_id === 4L)
      assert(store.snapshot(2L).event_id === 3L)
    } finally q.stop()
    // at-least-once replay: re-merging old batches (any order) must not
    // move the store backwards — the version rule makes the effect
    // exactly-once
    val before = store.snapshot
    val replay = Seq(ev(1, 10, user = 1, value = 5.0),
      ev(2, 20, user = 1, value = 7.0), ev(3, 15, user = 2, value = 3.0)).toDS()
    EventStreams.mergeBatch(replay, store)
    EventStreams.mergeBatch(replay, store)
    assert(store.snapshot === before)
    store.close()
    assert(store.snapshot.isEmpty) // released from the JVM registry
  }

  test("streaming upsert sink reproduces the ORACLED batch face on the real events table") {
    // q_scd1_upsert (DuckDB-oracled in the driver gate) replays the
    // events table as 3 batches with one redelivered through mergeBatch —
    // the batch FACE of this sink. This spec closes the loop: the same
    // table pushed through the ACTUAL foreachBatch streaming sink, same
    // batch split, same redelivery, must produce the identical serving
    // table — tying the oracled batch semantics to the streaming path
    // (exactly-once effect over at-least-once delivery).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val events = graft.GraftSession.table(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[StreamEvent]
    val batches = (0 until 3).map(b =>
      events.filter($"event_id" % 3 === b).collect().toSeq)
    val store = new EventStreams.UpsertStore
    val input = MemoryStream[StreamEvent]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-scd1-parity-ckpt").toString
    val q = EventStreams.upsertLatest(input.toDS(), store, ckpt)
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // at-least-once: redeliver the middle batch as one more micro-batch
      input.addData(batches(1)); q.processAllAvailable()
      val streamed = store.snapshot.values
        .map(r => (r.user_id, r.ts_ms, r.event_id, r.value)).toSet
      val oracle = graft.analytics.EventsQueries
        .qScd1Upsert(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed === oracle,
        "streaming sink state diverged from the oracled batch face")
    } finally { q.stop(); store.close() }
  }

  test("ParquetUpsertStore honors the same merge contract as the KV store " +
      "(parity, replay idempotence, atomic pointer)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val events = graft.GraftSession.table(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[StreamEvent]
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-pq-upsert").toString
    val pq = new EventStreams.ParquetUpsertStore(storeDir)
    val input = MemoryStream[StreamEvent]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-pq-upsert-ckpt").toString
    val batches = (0 until 3).map(b =>
      events.filter($"event_id" % 3 === b).collect().toSeq)
    val q = EventStreams.upsertLatestParquet(input.toDS(), pq, ckpt)
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // at-least-once: redeliver the middle batch
      input.addData(batches(1)); q.processAllAvailable()
    } finally q.stop()
    val table = pq.snapshot(spark).collect()
      .map(r => (r.user_id, r.ts_ms, r.event_id, r.value)).toSet
    val oracle = graft.analytics.EventsQueries
      .qScd1Upsert(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(table === oracle,
      "parquet serving table diverged from the oracled batch face")
    // idempotence at the TABLE level: re-merging an old batch in batch
    // mode must not move the snapshot (or its version pointer semantics)
    val before = pq.snapshot(spark).collect().toSet
    pq.merge(EventStreams.reduceLatest(batches(0).toDS()))
    assert(pq.snapshot(spark).collect().toSet === before,
      "replayed batch moved the serving table backwards")
    // snapshots are versioned dirs + a pointer — the atomic-swap layout
    val files = new java.io.File(storeDir).list().toSet
    assert(files.contains("_CURRENT"), files)
    assert(files.exists(_.startsWith("v")), files)
  }

  test("ParquetUpsertStore merge is bucket-pruned: buckets untouched by a " +
      "batch carry into the new version as hard links") {
    import spark.implicits._
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-pq-bucketed").toString
    val pq = new EventStreams.ParquetUpsertStore(storeDir, buckets = 8)
    // seed: many users spread across all buckets
    pq.merge((1L to 200L).map(u =>
      EventStreams.UserLatest(u, ts_ms = 1000L, event_id = u, value = 1.0)).toDS())
    val v0 = new java.io.File(storeDir, "v0")
    val bkts0 = v0.listFiles().filter(d =>
      d.isDirectory && d.getName.startsWith("bkt=")).sortBy(_.getName)
    assert(bkts0.length === 8, "200 users must populate all 8 buckets")
    // a 1-user batch touches exactly one bucket
    pq.merge(Seq(EventStreams.UserLatest(42L, 2000L, 9999L, 7.0)).toDS())
    val v1 = new java.io.File(storeDir, "v1")
    val touchedName = bkts0.map(_.getName).find { n =>
      // the rewritten bucket: at least one file differs from v0's
      val d1 = new java.io.File(v1, n)
      d1.listFiles().exists(f =>
        !new java.io.File(v0 + "/" + n, f.getName).exists() ||
          !java.nio.file.Files.isSameFile(f.toPath,
            new java.io.File(v0 + "/" + n, f.getName).toPath))
    }
    assert(touchedName.isDefined, "exactly one bucket should be rewritten")
    val untouched = bkts0.filter(_.getName != touchedName.get)
    assert(untouched.length === 7)
    untouched.foreach { d0 =>
      val d1 = new java.io.File(v1, d0.getName)
      assert(d1.isDirectory, s"bucket ${d0.getName} missing from v1")
      d0.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f0 =>
        val f1 = new java.io.File(d1, f0.getName)
        assert(f1.isFile && java.nio.file.Files.isSameFile(f0.toPath, f1.toPath),
          s"untouched bucket rewritten: ${d0.getName}/${f0.getName}")
      }
    }
    // and the merge semantics held
    val row = pq.snapshot(spark).filter($"user_id" === 42L).collect()
    assert(row.length === 1 && row.head.value === 7.0)
    assert(pq.snapshot(spark).count() === 200)
  }
}
