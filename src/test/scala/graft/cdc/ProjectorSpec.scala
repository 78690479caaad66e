package graft.cdc

import graft.SparkSpec
import graft.model._

/** P1–P4 golden semantics (SURVEY.md §2.3), incl. the reference quirks we
  * deliberately do NOT reproduce (update image orientation swap,
  * `process.go:138-141`).
  */
class ProjectorSpec extends SparkSpec {

  private val cols = Seq("id", "name", "qty")

  test("P1 insert: each row image zips to an `after` map") {
    val e = RawBinlogEvent.rowsEvent("write_rows", "db", "t",
      Seq(Seq("1", "ada", "10"), Seq("2", "bob", "20")),
      logPos = 42L, timestamp = 1000L)
    val out = Projector.projectEvent(e, Some(cols))
    assert(out.length == 2)
    assert(out.head.action == Actions.Insert)
    assert(out.head.after == Map("id" -> "1", "name" -> "ada", "qty" -> "10"))
    assert(out.head.before.isEmpty)
    assert(out.head.orgRow == Seq(Seq("1", "ada", "10")))
    assert(out.head.eventHeader == EventHeader(1000L, 42L, "master.000001"))
  }

  test("P2 delete: row image lands in `before`") {
    val e = RawBinlogEvent.rowsEvent("delete_rows", "db", "t",
      Seq(Seq("1", "ada", "10")))
    val out = Projector.projectEvent(e, Some(cols))
    assert(out.head.action == Actions.Delete)
    assert(out.head.before("name") == "ada")
    assert(out.head.after.isEmpty)
  }

  test("P3 update: (i, i+1) pairs with CORRECT (before, after) orientation") {
    // Reference swaps the labels (After=Rows[i], Before=Rows[i+1],
    // process.go:138-141); binlog order is (before, after) — we keep it.
    val e = RawBinlogEvent.rowsEvent("update_rows", "db", "t",
      Seq(Seq("1", "ada", "10"), Seq("1", "ada", "11"),
        Seq("2", "bob", "20"), Seq("2", "rob", "20")))
    val out = Projector.projectEvent(e, Some(cols))
    assert(out.length == 2)
    assert(out(0).before("qty") == "10" && out(0).after("qty") == "11")
    assert(out(1).before("name") == "bob" && out(1).after("name") == "rob")
    assert(out(0).orgRow == Seq(Seq("1", "ada", "10"), Seq("1", "ada", "11")))
  }

  test("P3 guard: odd or short update row sets drop the event") {
    val odd = RawBinlogEvent.rowsEvent("update_rows", "db", "t",
      Seq(Seq("1", "a", "1"), Seq("1", "a", "2"), Seq("2", "b", "1")))
    assert(Projector.projectEvent(odd, Some(cols)).isEmpty)
    val single = RawBinlogEvent.rowsEvent("update_rows", "db", "t",
      Seq(Seq("1", "a", "1")))
    assert(Projector.projectEvent(single, Some(cols)).isEmpty)
  }

  test("arity validation: mismatched row width drops the event") {
    // process.go:192-196 — schema drift mid-stream must not emit misaligned maps
    val e = RawBinlogEvent.rowsEvent("write_rows", "db", "t",
      Seq(Seq("1", "ada"))) // 2 values vs 3 columns
    assert(Projector.projectEvent(e, Some(cols)).isEmpty)
  }

  test("unknown table or event type drops the event") {
    val e = RawBinlogEvent.rowsEvent("write_rows", "db", "t", Seq(Seq("1")))
    assert(Projector.projectEvent(e, None).isEmpty)
    val rot = RawBinlogEvent.rotate("master.000002", 4L)
    assert(Projector.projectEvent(rot, Some(cols)).isEmpty)
  }

  test("Column projection ≡ typed projectEvent on a mixed corpus") {
    import spark.implicits._
    val snapshot = Map("db.t" -> cols, "db.u" -> Seq("a", "b"))
    val filter = TaskFilter(databases = Seq("db"))
    val corpus = Seq(
      RawBinlogEvent.rowsEvent("write_rows", "db", "t",
        Seq(Seq("1", "ada", "10"), Seq("2", null, "20")), logPos = 1L, timestamp = 10L),
      RawBinlogEvent.rowsEvent("delete_rows", "db", "t",
        Seq(Seq("3", "cy", "30")), logPos = 2L, timestamp = 11L),
      RawBinlogEvent.rowsEvent("update_rows", "db", "u",
        Seq(Seq("x", "1"), Seq("x", "2"), Seq("y", "7"), Seq("z", "7")),
        logPos = 3L, timestamp = 12L),
      RawBinlogEvent.rowsEvent("update_rows", "db", "u",
        Seq(Seq("x", "1"), Seq("x", "2"), Seq("y", "7"))), // odd → dropped
      RawBinlogEvent.rowsEvent("write_rows", "db", "t",
        Seq(Seq("1", "ada"))), // arity mismatch → dropped
      RawBinlogEvent.rowsEvent("write_rows", "db", "nowhere",
        Seq(Seq("1"))), // unknown table → dropped
      RawBinlogEvent.rowsEvent("write_rows", "elsewhere", "t",
        Seq(Seq("1", "a", "2"))), // filtered database → dropped
      RawBinlogEvent.ddl("db", "ALTER TABLE t ADD COLUMN c INT"), // not a rows event
      RawBinlogEvent.rotate("master.000002", 4L)
    )
    val expected = corpus
      .filter(e => e.database != null && e.table != null &&
        filter.accepts(e.database, e.table))
      .flatMap(e =>
        Projector.projectEvent(e, snapshot.get(s"${e.database}.${e.table}")))
    val got = Projector.project(corpus.toDS(), snapshot, filter).collect().toSeq
    assert(got.toSet == expected.toSet)
    assert(got.length == expected.length)
  }

  test("empty schema snapshot projects nothing") {
    import spark.implicits._
    val events = Seq(
      RawBinlogEvent.rowsEvent("write_rows", "db", "t", Seq(Seq("1")))).toDS()
    assert(Projector.project(events, Map.empty).isEmpty)
  }

  test("project preserves streaming-ness for ANY snapshot (incl. empty)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[RawBinlogEvent]
    // empty registry (no DDL seen yet) must NOT demote the stream to batch
    assert(Projector.project(stream.toDS(), Map.empty).isStreaming)
    assert(Projector.project(stream.toDS(), Map("db.t" -> cols)).isStreaming)
  }

  test("distributed project applies filter + schema broadcast") {
    import spark.implicits._
    val events = Seq(
      RawBinlogEvent.rowsEvent("write_rows", "db", "keep", Seq(Seq("1"))),
      RawBinlogEvent.rowsEvent("write_rows", "db", "drop_me", Seq(Seq("2"))),
      RawBinlogEvent.rowsEvent("write_rows", "other", "keep", Seq(Seq("3"))),
      RawBinlogEvent.rowsEvent("write_rows", "db", "unknown", Seq(Seq("4")))
    ).toDS()
    val out = Projector.project(events,
      schemaSnapshot = Map("db.keep" -> Seq("id"), "db.drop_me" -> Seq("id")),
      filter = TaskFilter(databases = Seq("db"),
        excludeTables = Seq("db.drop_me"))).collect()
    assert(out.map(_.after("id")).toSet == Set("1"))
  }
}
