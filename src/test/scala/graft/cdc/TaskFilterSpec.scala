package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** F1–F3 semantics (SURVEY.md §2.2): empty-list=allow-all, `db.*` shallow
  * wildcard, deep `db.table`, exclusion precedence. Reference behavior from
  * `internal/sync_server/process.go:40-75`.
  */
class TaskFilterSpec extends AnyFunSuite {

  test("empty filter allows everything") {
    assert(TaskFilter.allowAll.accepts("any", "thing"))
  }

  test("F1 database include") {
    val f = TaskFilter(databases = Seq("test"))
    assert(f.accepts("test", "t1"))
    assert(!f.accepts("other", "t1"))
  }

  test("F2 shallow wildcard and deep table include") {
    val f = TaskFilter(tables = Seq("test.*", "other.exact"))
    assert(f.accepts("test", "anything"))
    assert(f.accepts("other", "exact"))
    assert(!f.accepts("other", "different"))
  }

  test("F3 exclusion beats inclusion") {
    val f = TaskFilter(tables = Seq("test.*"), excludeTables = Seq("test.secret"))
    assert(f.accepts("test", "open"))
    assert(!f.accepts("test", "secret"))
    val g = TaskFilter(excludeTables = Seq("db.*"))
    assert(!g.accepts("db", "anything"))
    assert(g.accepts("other", "anything"))
  }

  test("column expression agrees with the Scala predicate") {
    import org.apache.spark.sql.functions.col
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val universe = for {
      db <- Seq("a", "b", "c"); t <- Seq("x", "y", "z")
    } yield (db, t)
    val df = universe.toDF("db", "tbl")
    val filters = Seq(
      TaskFilter(),
      TaskFilter(databases = Seq("a")),
      TaskFilter(tables = Seq("a.*", "b.y")),
      TaskFilter(excludeTables = Seq("a.x", "c.*")),
      TaskFilter(Seq("a", "b"), Seq("a.*", "b.y"), Seq("a.z"))
    )
    filters.foreach { f =>
      val got = df.filter(f.column(col("db"), col("tbl")))
        .as[(String, String)].collect().toSet
      val want = universe.filter { case (d, t) => f.accepts(d, t) }.toSet
      assert(got == want, s"filter $f")
    }
  }

  test("property: accepts ⇔ conjunction of the three rules (exhaustive)") {
    // Exhaustive over a small closed universe — deterministic and covers
    // every combination of empty/deep/shallow include+exclude lists.
    val names = Seq("db1", "db2", "t1", "t2")
    val dbLists = Seq(Nil, Seq("db1"), Seq("db1", "db2"))
    val tblLists = Seq(Nil, Seq("db1.t1"), Seq("db2.*"), Seq("db1.t1", "db2.*"))
    val exclLists = Seq(Nil, Seq("db2.t2"), Seq("db1.*"))
    for {
      dbs <- dbLists; tbls <- tblLists; excl <- exclLists
      db <- names; tbl <- names
    } {
      val f = TaskFilter(dbs, tbls, excl)
      assert(f.accepts(db, tbl) ==
        (f.acceptsDatabase(db) && f.acceptsTable(db, tbl) && f.notExcluded(db, tbl)),
        s"TaskFilter($dbs, $tbls, $excl).accepts($db, $tbl)")
    }
  }
}
