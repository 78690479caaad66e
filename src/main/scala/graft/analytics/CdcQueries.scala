package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.table
import graft.cdc.TaskFilter
import graft.model.ColumnDef
import graft.registry.SchemaRegistry
import graft.sources.BinlogReplay
import graft.streaming.CdcPipeline

/** DuckDB-oracled exercises of the CDC dataflow (SURVEY.md §2.1–2.4) over
  * driver data: the `events` table replayed as a deterministic binlog
  * (see [[BinlogReplay.fromEventsTable]]) and pushed through the REAL
  * filter→project→envelope pipeline — the same code the streaming path runs
  * per micro-batch. The oracle reproduces the expected envelopes with plain
  * SQL over `events`.
  */
object CdcQueries {

  /** The five event types the driver generator emits — the synthetic
    * `app.*` table registry (stands in for `SHOW FULL COLUMNS` capture).
    */
  val eventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  private def pipeline(filter: TaskFilter): CdcPipeline = {
    val registry = new SchemaRegistry()
    eventTypes.foreach { t =>
      registry.put(graft.model.TableSchema("app", t, Seq(
        ColumnDef("event_id", "bigint"),
        ColumnDef("user_id", "bigint"),
        ColumnDef("value", "decimal(10,2)"))))
    }
    new CdcPipeline("t_cdc", registry, filter)
  }

  /** F1+F2+F3+P1–P4+P6: full envelope pipeline, `app.*` include with one
    * table excluded; flattened to oracle-comparable columns.
    */
  def cdcEnvelope(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = BinlogReplay.fromEventsTable(table(spark, dir, "events"))
    val p = pipeline(TaskFilter(
      databases = Seq("app"),
      tables = Seq("app.*"),
      excludeTables = Seq("app.click")))
    val env = p.projectBatch(raw)
    env.select(
      $"database".as("db"),
      $"table".as("tbl"),
      $"action",
      concat_ws(".", lit(p.taskId), $"database", $"table").as("topic"),
      concat_ws(".", $"database", $"table").as("msg_key"),
      coalesce(element_at($"after", "event_id"),
        element_at($"before", "event_id")).cast("long").as("event_id"),
      coalesce(element_at($"after", "user_id"),
        element_at($"before", "user_id")).cast("long").as("user_id"),
      coalesce(element_at($"after", "value"),
        element_at($"before", "value")).as("value_str")
    )
  }

  /** P3 pairing: update events only — before/after images side by side. */
  def cdcUpdatePairing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = BinlogReplay.fromEventsTable(table(spark, dir, "events"))
    val env = pipeline(TaskFilter(databases = Seq("app"))).projectBatch(raw)
    env.filter($"action" === "update")
      .select(
        $"table".as("tbl"),
        element_at($"before", "event_id").cast("long").as("event_id"),
        element_at($"before", "user_id").cast("long").as("user_before"),
        element_at($"after", "user_id").cast("long").as("user_after"),
        // orgRow carries both positional images, in (before, after) order
        element_at(element_at($"orgRow", 1), 2).cast("long").as("org_before"),
        element_at(element_at($"orgRow", 2), 2).cast("long").as("org_after")
      )
  }

  /** F2 deep-include wildcardless path: only two fully-qualified tables. */
  def cdcDeepInclude(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = BinlogReplay.fromEventsTable(table(spark, dir, "events"))
    val env = pipeline(TaskFilter(
      tables = Seq("app.view", "app.error"))).projectBatch(raw)
    env.groupBy($"table".as("tbl"), $"action")
      .agg(count(lit(1)).as("n"))
  }

  /** P7 oracled end-to-end: the reference's ALTER corpus shapes
    * (`internal/sync_server/sync_test.go:147-156` — DROP COLUMN, ADD
    * COLUMN FIRST/AFTER, CHANGE rename; MODIFY ignored) applied to the
    * registry MID-STREAM between three replay phases, exactly where the
    * streaming pipeline applies binlog DDL between micro-batches
    * ([[CdcPipeline.start]]). A real binlog's row images always match the
    * table's schema at that point in the log, so each phase generates its
    * positional images in the CURRENT layout:
    *
    *   phase 0 (event_id%3=0): [event_id, user_id, value]   — v0 schema
    *     then `DROP COLUMN value`, `ADD COLUMN score bigint FIRST`
    *   phase 1 (event_id%3=1): [score, event_id, user_id]
    *     then `ADD COLUMN region varchar(16) AFTER event_id`,
    *          `CHANGE user_id uid bigint`, and a `MODIFY` that must be a
    *          no-op
    *   phase 2 (event_id%3=2): [score, event_id, region, uid]
    *
    * Each phase's projection captures the registry snapshot eagerly at
    * plan-construction time (the per-micro-batch broadcast semantic), so
    * the lazily-executed union still projects each phase under its own
    * schema version. The flattened envelope columns — which fields exist,
    * which are null, which name the row binds to — are the observable
    * face of the positional evolution ops, reproduced by the DuckDB
    * oracle from plain `events`.
    */
  def cdcDdlEvolution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val registry = new SchemaRegistry()
    eventTypes.foreach { t =>
      registry.put(graft.model.TableSchema("app", t, Seq(
        ColumnDef("event_id", "bigint"),
        ColumnDef("user_id", "bigint"),
        ColumnDef("value", "decimal(10,2)"))))
    }
    val filter = TaskFilter(databases = Seq("app"))
    val ev = table(spark, dir, "events")
    val mod10 = col("event_id") % 10
    val idS = col("event_id").cast("string")
    val userS = col("user_id").cast("string")
    val user1S = (col("user_id") + 1).cast("string")
    val fmtValue = regexp_replace(format_number(col("value"), 2), ",", "")
    val scoreS = (col("user_id") % 100).cast("string")
    val regionS = concat(lit("r"), (col("user_id") % 5).cast("string"))
    // one phase of the synthetic binlog, images in the CURRENT positional
    // layout; updates increment user_id in the after image (integer-exact,
    // oracle-reproducible), deletes carry only the before image
    def phaseRaw(phase: Int, img: Seq[org.apache.spark.sql.Column],
        imgAfter: Seq[org.apache.spark.sql.Column]) =
      ev.filter(col("event_id") % 3 === phase)
        .select(
          lit("master.000001").as("file"),
          col("event_id").as("logPos"),
          unix_timestamp(col("ts")).as("timestamp"),
          when(mod10 === 0, "update_rows")
            .when(mod10 === 1, "delete_rows")
            .otherwise("write_rows").as("eventType"),
          lit("app").as("database"),
          col("event_type").as("table"),
          when(mod10 === 0, array(array(img: _*), array(imgAfter: _*)))
            .otherwise(array(array(img: _*))).as("rows"),
          lit(null: String).as("query"),
          lit(0).as("errorCode"),
          lit(null: String).as("nextLogName"),
          lit(0L).as("position"))
        .as[graft.model.RawBinlogEvent]
    def project(raw: org.apache.spark.sql.Dataset[graft.model.RawBinlogEvent]) =
      graft.cdc.Projector.project(raw, registry.snapshot(), filter)
    val p0 = project(phaseRaw(0,
      Seq(idS, userS, fmtValue), Seq(idS, user1S, fmtValue)))
    eventTypes.foreach { t =>
      registry.applyDdl("app", s"ALTER TABLE `$t` DROP COLUMN `value`")
      registry.applyDdl("app", s"ALTER TABLE $t ADD COLUMN score bigint FIRST")
    }
    val p1 = project(phaseRaw(1,
      Seq(scoreS, idS, userS), Seq(scoreS, idS, user1S)))
    eventTypes.foreach { t =>
      registry.applyDdl("app",
        s"ALTER TABLE $t ADD COLUMN region varchar(16) AFTER event_id")
      registry.applyDdl("app", s"ALTER TABLE $t CHANGE user_id uid bigint")
      // MODIFY must be ignored (baseinfo.go:129-131) — a regression here
      // would rename/drop and break the oracle match
      registry.applyDdl("app", s"ALTER TABLE $t MODIFY uid varchar(32)")
    }
    val p2 = project(phaseRaw(2,
      Seq(scoreS, idS, regionS, userS), Seq(scoreS, idS, regionS, user1S)))
    def field(name: String) =
      coalesce(element_at($"after", name), element_at($"before", name))
    p0.unionByName(p1).unionByName(p2)
      .select(
        $"database".as("db"),
        $"table".as("tbl"),
        $"action",
        field("event_id").cast("long").as("event_id"),
        // the USER column binds to `user_id` in phases 0-1 and to the
        // renamed `uid` in phase 2 — same physical position, new name
        coalesce(field("user_id"), field("uid")).cast("long").as("user_id"),
        field("score").cast("long").as("score"),
        field("region").as("region"),
        field("value").as("value_str"))
  }

  /** K4–K6-analog oracled end-to-end: the events table replayed as keyed
    * CHANGES (pk = user_id, so each key sees its whole event history;
    * version = (unix ts, event_id) — the (timestamp, logPos) pair) through
    * the REAL [[graft.streaming.CdcServingTable]] merge as 3 deterministic
    * batches with the middle one applied TWICE (at-least-once redelivery),
    * then the serving snapshot read back. The oracle computes the same
    * current state in SQL: the latest change per (table, user), excluded
    * if that latest change is a delete — pinning last-writer-wins, the
    * tombstone rule, and replay idempotence in the driver's hash gate.
    * The store merges are sink ACTIONS (like the streaming sink they
    * mirror); the snapshot is store-sized (one live row per key).
    */
  /** The events table replayed as keyed CHANGES — the shared adapter of
    * the store-materializer oracles ([[cdcServingState]],
    * [[cdcScd2History]], [[cdcTimeTravel]]): pk = user_id (each key sees
    * its whole event history), version = (unix ts, event_id) — the
    * (timestamp, logPos) pair — action by event_id mod 10 (0 = update,
    * 1 = delete, else insert). `batch_key` rides along for batch splits.
    */
  private def changeEnvelopes(ev: DataFrame): DataFrame = {
    val mod10 = col("event_id") % 10
    val img = map(
      lit("event_id"), col("event_id").cast("string"),
      lit("user_id"), col("user_id").cast("string"),
      lit("value"), regexp_replace(format_number(col("value"), 2), ",", ""))
    val emptyImg = typedlit(Map.empty[String, String])
    ev.select(
      lit("app").as("database"),
      col("event_type").as("table"),
      when(mod10 === 0, "update").when(mod10 === 1, "delete")
        .otherwise("insert").as("action"),
      when(mod10 === 1, img).otherwise(emptyImg).as("before"),
      when(mod10 === 1, emptyImg).otherwise(img).as("after"),
      typedlit(Seq.empty[Seq[String]]).as("orgRow"),
      struct(unix_timestamp(col("ts")).as("timestamp"),
        col("event_id").as("logPos"),
        lit("").as("segment")).as("eventHeader"),
      col("event_id").as("batch_key"))
  }

  def cdcServingState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.streaming.CdcServingTable
    val envs = changeEnvelopes(table(spark, dir, "events"))
    val serveDir = java.nio.file.Files
      .createTempDirectory("graft-serving-state").toString
    // default AUTO-SIZED buckets (the production path, r12's hand-tuned
    // buckets=4 retired): per-table counts come from observed bytes at
    // ~256 MB/bucket, so this corpus's ~10k-row tables run at 1 bucket
    // (no per-dir commit tax) while a 10 TB table would land at
    // thousands. Bucket-level pruning/carry semantics are spec-pinned
    // independently of the count (CdcMaterializeSpec).
    val serving = new CdcServingTable(serveDir,
      eventTypes.map(t => s"app.$t" -> "user_id").toMap)
    // four merge ACTIONS consume the same adapter output — cache it so
    // the events scan + envelope build runs once, not once per batch
    val cached = envs.persist()
    try {
      (0 until 3).foreach { b =>
        serving.merge(cached.filter($"batch_key" % 3 === b).drop("batch_key")
          .as[graft.model.MQEvent])
      }
      // redeliver batch 1: versions + tombstones must make this a no-op;
      // the known-final merge folds the prune into its own transaction
      // (one version walk, no separate pass — r19 verdict #3)
      serving.merge(cached.filter($"batch_key" % 3 === 1).drop("batch_key")
        .as[graft.model.MQEvent], pruneKeep = 1)
    } finally { cached.unpersist(); () }
    serving.snapshot(spark)
      .select($"tbl", $"pk".cast("long").as("user_id"),
        get_json_object($"after_json", "$.event_id").cast("long")
          .as("last_event_id"),
        get_json_object($"after_json", "$.value").as("value_str"))
  }

  /** The INITIAL-LOAD path oracled end-to-end: seed an empty
    * [[graft.streaming.CdcServingTable]] with a snapshot of the live
    * state at the corpus ts-midpoint cut — rows carrying the SOURCE
    * version of the last change they reflect (the
    * [[graft.streaming.CdcServingTable.bootstrap]] contract) — then
    * replay the change stream from a quarter-range BEFORE the cut (a
    * deliberate at-least-once overlap window) in two batches. Because
    * snapshot versions are source positions, the overlapping replay is
    * absorbed by last-writer-wins, and the final snapshot must equal the
    * pure full-replay state — which is why this query shares
    * [[cdcServingState]]'s oracle verbatim: one independent SQL
    * semantics pins BOTH the replay-only and the bootstrap+switchover
    * paths to the same answer, hash-checked.
    */
  def cdcBootstrapSwitchover(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.streaming.CdcServingTable
    val envs = changeEnvelopes(table(spark, dir, "events")).persist()
    try {
      val b = envs.agg(min($"eventHeader.timestamp"),
        max($"eventHeader.timestamp")).first()
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val cut = (lo + hi) / 2
      val replayFrom = cut - (hi - lo) / 4
      // live state at the cut, re-enveloped as inserts with source versions
      val pk = coalesce(element_at($"after", "user_id"),
        element_at($"before", "user_id"))
      val snapshot = envs
        .filter($"eventHeader.timestamp" <= cut)
        .withColumn("pk", pk)
        .groupBy($"database", $"table", $"pk")
        // (ts, logPos) is a total order on this stream (logPos = unique
        // event_id), so max_by needs no map-typed tiebreak — the thing
        // struct-max cannot order
        .agg(max_by(
          struct($"eventHeader.timestamp".as("ts"),
            $"eventHeader.logPos".as("pos"), $"action".as("action"),
            $"after".as("after")),
          struct($"eventHeader.timestamp", $"eventHeader.logPos")).as("v"))
        .filter($"v.action" =!= "delete")
        .select($"database", $"table", lit("insert").as("action"),
          typedlit(Map.empty[String, String]).as("before"),
          $"v.after".as("after"),
          typedlit(Seq.empty[Seq[String]]).as("orgRow"),
          struct($"v.ts".as("timestamp"), $"v.pos".as("logPos"),
            lit("").as("segment")).as("eventHeader"))
        .as[graft.model.MQEvent]
      val serveDir = java.nio.file.Files
        .createTempDirectory("graft-bootstrap").toString
      // default auto-sized buckets — see cdcServingState's sizing note
      val serving = new CdcServingTable(serveDir,
        eventTypes.map(t => s"app.$t" -> "user_id").toMap)
      serving.bootstrap(snapshot)
      (0 until 2).foreach { k =>
        serving.merge(envs
          .filter($"eventHeader.timestamp" > replayFrom &&
            $"batch_key" % 2 === k)
          .drop("batch_key").as[graft.model.MQEvent],
          // known-final merge folds the prune (see cdcServingState)
          pruneKeep = if (k == 1) 1 else 0)
      }
      serving.snapshot(spark)
        .select($"tbl", $"pk".cast("long").as("user_id"),
          get_json_object($"after_json", "$.event_id").cast("long")
            .as("last_event_id"),
          get_json_object($"after_json", "$.value").as("value_str"))
    } finally { envs.unpersist(); () }
  }

  /** The temporal complement of [[cdcServingState]], oracled end-to-end:
    * the same keyed change stream appended to the REAL
    * [[graft.streaming.CdcHistoryTable]] as 3 deterministic batches with
    * the middle one applied TWICE (at-least-once redelivery — the
    * append-only log keeps the duplicate; the read view must absorb it),
    * then the SCD2 history read back: one row per change with its
    * validity interval. The oracle computes the same intervals in SQL
    * with a window `lead` per (table, user) — pinning interval chaining,
    * the is_current/tombstone rule, and read-time replay idempotence in
    * the driver's hash gate. The appends are sink ACTIONS; history read
    * is ONE window shuffle over the log.
    */
  def cdcScd2History(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.streaming.CdcHistoryTable
    val envs = changeEnvelopes(table(spark, dir, "events"))
    val histDir = java.nio.file.Files
      .createTempDirectory("graft-scd2-history").toString
    val hist = new CdcHistoryTable(histDir,
      eventTypes.map(t => s"app.$t" -> "user_id").toMap)
    // three append ACTIONS consume the same adapter output — cache it
    val cached = envs.persist()
    try {
      (0 until 3).foreach { b =>
        hist.append(cached.filter($"batch_key" % 3 === b).drop("batch_key")
          .as[graft.model.MQEvent])
      }
      // redeliver batch 1: history/asOf must not move (read-time dedup)
      hist.append(cached.filter($"batch_key" % 3 === 1).drop("batch_key")
        .as[graft.model.MQEvent])
    } finally { cached.unpersist(); () }
    // compact INSIDE the oracled path: four appends left ≥4 files per hot
    // partition, the rewrite collapses them, and the driver's hash gate
    // then pins compaction's multiset invariance (duplicates included)
    // every round — not just the spec
    hist.compact(spark, maxFiles = 1, pruneKeep = 1)
    hist.history(spark)
      .select($"tbl", $"pk".cast("long").as("user_id"),
        $"ver_pos".as("event_id"), $"action",
        $"valid_from", $"valid_to", $"is_current")
  }

  /** Time travel over the changelog: the live row set as of the corpus
    * midpoint timestamp — the latest change per (table, user) at or
    * before the cut, excluded if that change is a delete. The cut is
    * (min+max)/2 of the event epoch seconds (integer arithmetic, exact
    * in both engines). ONE struct-max shuffle over the log; idempotent
    * under duplicates by construction, so a single append suffices.
    */
  def cdcTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.streaming.CdcHistoryTable
    val ev = table(spark, dir, "events")
    val envs = changeEnvelopes(ev)
    val histDir = java.nio.file.Files
      .createTempDirectory("graft-time-travel").toString
    val hist = new CdcHistoryTable(histDir,
      eventTypes.map(t => s"app.$t" -> "user_id").toMap)
    hist.append(envs.drop("batch_key").as[graft.model.MQEvent])
    // the cut is a 1-row scalar — an index-build-sized driver action
    val cut = ev.agg(((min(unix_timestamp($"ts")) +
      max(unix_timestamp($"ts"))) / 2).cast("long")).head().getLong(0)
    hist.asOf(spark, cut)
      .select($"tbl", $"pk".cast("long").as("user_id"),
        $"ver_pos".as("last_event_id"),
        get_json_object($"after_json", "$.value").as("value_str"))
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "cdc_envelope" -> cdcEnvelope,
    "cdc_update_pairing" -> cdcUpdatePairing,
    "cdc_deep_include" -> cdcDeepInclude,
    "cdc_ddl_evolution" -> cdcDdlEvolution,
    "cdc_serving_state" -> cdcServingState,
    "cdc_bootstrap_switchover" -> cdcBootstrapSwitchover,
    "cdc_scd2_history" -> cdcScd2History,
    "cdc_time_travel" -> cdcTimeTravel
  )

  val oracles: Map[String, String] = Map(
    "cdc_envelope" ->
      """SELECT 'app' AS db, event_type AS tbl,
        | CASE WHEN event_id % 10 = 0 THEN 'update'
        |      WHEN event_id % 10 = 1 THEN 'delete'
        |      ELSE 'insert' END AS action,
        | 't_cdc.app.' || event_type AS topic,
        | 'app.' || event_type AS msg_key,
        | event_id,
        | CASE WHEN event_id % 10 = 0 THEN user_id + 1 ELSE user_id END AS user_id,
        | printf('%.2f', value) AS value_str
        |FROM events
        |WHERE event_type <> 'click'""".stripMargin,
    "cdc_update_pairing" ->
      """SELECT event_type AS tbl, event_id,
        | user_id AS user_before, user_id + 1 AS user_after,
        | user_id AS org_before, user_id + 1 AS org_after
        |FROM events WHERE event_id % 10 = 0""".stripMargin,
    "cdc_deep_include" ->
      """SELECT event_type AS tbl,
        | CASE WHEN event_id % 10 = 0 THEN 'update'
        |      WHEN event_id % 10 = 1 THEN 'delete'
        |      ELSE 'insert' END AS action,
        | count(*) AS n
        |FROM events WHERE event_type IN ('view','error')
        |GROUP BY 1, 2""".stripMargin,
    // schema-evolution observability: which envelope fields exist per
    // phase, and that the user column is +1 on updates regardless of its
    // current NAME (user_id → uid after the CHANGE)
    "cdc_ddl_evolution" ->
      """SELECT 'app' AS db, event_type AS tbl,
        | CASE WHEN event_id % 10 = 0 THEN 'update'
        |      WHEN event_id % 10 = 1 THEN 'delete'
        |      ELSE 'insert' END AS action,
        | event_id,
        | CASE WHEN event_id % 10 = 0 THEN user_id + 1 ELSE user_id END
        |   AS user_id,
        | CASE WHEN event_id % 3 = 0 THEN NULL
        |      ELSE user_id % 100 END AS score,
        | CASE WHEN event_id % 3 = 2 THEN 'r' || (user_id % 5)
        |      ELSE NULL END AS region,
        | CASE WHEN event_id % 3 = 0 THEN printf('%.2f', value)
        |      ELSE NULL END AS value_str
        |FROM events""".stripMargin,
    // current state = the LATEST change per (table, user) by the
    // (timestamp, logPos=event_id) version, excluded when that latest
    // change is a delete (event_id % 10 = 1) — the tombstone rule
    "cdc_serving_state" -> servingStateOracle,
    // bootstrap+switchover must CONVERGE to the pure-replay answer — the
    // shared oracle is the point (see cdcBootstrapSwitchover's scaladoc)
    "cdc_bootstrap_switchover" -> servingStateOracle,
    // SCD2: each change's validity runs until the NEXT change of the same
    // (table, user) key in (ts, event_id=logPos) version order; the head
    // is current unless it is a tombstone. The redelivered batch must
    // leave these intervals untouched.
    "cdc_scd2_history" ->
      """WITH ch AS (
        |  SELECT 'app.' || event_type AS tbl, user_id, event_id,
        |   floor(epoch(ts))::BIGINT AS ts_sec,
        |   CASE WHEN event_id % 10 = 0 THEN 'update'
        |        WHEN event_id % 10 = 1 THEN 'delete'
        |        ELSE 'insert' END AS action
        |  FROM events),
        | h AS (
        |  SELECT tbl, user_id, event_id, ts_sec, action,
        |   lead(ts_sec) OVER (PARTITION BY tbl, user_id
        |     ORDER BY ts_sec, event_id) AS next_ts
        |  FROM ch)
        |SELECT tbl, user_id, event_id, action,
        | ts_sec AS valid_from, next_ts AS valid_to,
        | (next_ts IS NULL AND action <> 'delete') AS is_current
        |FROM h""".stripMargin,
    // time travel: latest change per key at or before the corpus-midpoint
    // cut, excluded when that change is a delete
    "cdc_time_travel" ->
      """WITH cut AS (
        |  SELECT (min(floor(epoch(ts))::BIGINT) +
        |          max(floor(epoch(ts))::BIGINT)) // 2 AS c
        |  FROM events),
        | ch AS (
        |  SELECT 'app.' || event_type AS tbl, user_id, event_id, value,
        |   row_number() OVER (PARTITION BY event_type, user_id
        |     ORDER BY epoch(ts) DESC, event_id DESC) AS rk
        |  FROM events, cut WHERE floor(epoch(ts))::BIGINT <= cut.c)
        |SELECT tbl, user_id, event_id AS last_event_id,
        | printf('%.2f', value) AS value_str
        |FROM ch WHERE rk = 1 AND event_id % 10 <> 1""".stripMargin
  )

  /** Current state = latest change per (table, user) in (ts, event_id)
    * version order, excluded when that change is a tombstone. ONE
    * independent semantics pinning both the replay-only serving path and
    * the bootstrap+switchover path.
    */
  private def servingStateOracle: String =
    """WITH ch AS (
      |  SELECT 'app.' || event_type AS tbl, user_id, event_id,
      |   epoch(ts)::BIGINT AS ts_sec, value,
      |   row_number() OVER (PARTITION BY event_type, user_id
      |     ORDER BY epoch(ts) DESC, event_id DESC) AS rk
      |  FROM events)
      |SELECT tbl, user_id, event_id AS last_event_id,
      | printf('%.2f', value) AS value_str
      |FROM ch WHERE rk = 1 AND event_id % 10 <> 1""".stripMargin
}
