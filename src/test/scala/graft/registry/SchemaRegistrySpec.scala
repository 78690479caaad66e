package graft.registry

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColumnDef, TableSchema}

/** P7 DDL evolution semantics against the reference's behavior
  * (`baseinfo.go:100-251`) and its own DDL corpus
  * (`sync_test.go:126-156`), plus registry persistence round-trips.
  */
class SchemaRegistrySpec extends AnyFunSuite {

  private def fresh(): SchemaRegistry = {
    val r = new SchemaRegistry()
    r.put(TableSchema("test", "casbin_rule",
      Seq(ColumnDef("p_type", "varchar(100)"), ColumnDef("v0", "varchar(100)"),
        ColumnDef("v1", "varchar(100)"), ColumnDef("v2", "varchar(100)"))))
    r
  }

  test("ADD COLUMN appends last by default") {
    val r = fresh()
    val s = r.applyDdl("test", "ALTER TABLE casbin_rule ADD age int(11)").get
    assert(s.columnNames == Seq("p_type", "v0", "v1", "v2", "age"))
    assert(s.version == 1)
  }

  test("ADD COLUMN FIRST / AFTER insert positionally") {
    val r = fresh()
    r.applyDdl("test", "ALTER TABLE casbin_rule ADD num int FIRST")
    val s = r.applyDdl("test",
      "ALTER TABLE casbin_rule ADD COLUMN ps varchar(11) AFTER v0").get
    assert(s.columnNames == Seq("num", "p_type", "v0", "ps", "v1", "v2"))
  }

  test("DROP [COLUMN] removes; CHANGE renames keeping position") {
    val r = fresh()
    r.applyDdl("test", "ALTER TABLE casbin_rule DROP COLUMN v2")
    val s = r.applyDdl("test",
      "ALTER TABLE casbin_rule CHANGE v0 vzero varchar(200)").get
    assert(s.columnNames == Seq("p_type", "vzero", "v1"))
    assert(s.columns(1).mysqlType == "varchar(200)")
  }

  test("MODIFY is deliberately ignored (baseinfo.go:129-131)") {
    val r = fresh()
    assert(r.applyDdl("test",
      "ALTER TABLE casbin_rule MODIFY v0 text").isEmpty)
    assert(r.get("test", "casbin_rule").get.version == 0)
  }

  test("db-qualified names and backticks bind to the right table") {
    val r = fresh()
    val s = r.applyDdl("ignored_default",
      "ALTER TABLE `test`.`casbin_rule` ADD `x` bigint").get
    assert(s.database == "test" && s.columnNames.last == "x")
  }

  test("DBeaver comment prefix is stripped (sync_test.go:128)") {
    val r = fresh()
    val s = r.applyDdl("test",
      "/* ApplicationName=DBeaver 21.0.2 */ ALTER TABLE casbin_rule ADD ps varchar(11)").get
    assert(s.columnNames.contains("ps"))
  }

  test("multi-clause ALTER applies clauses in order") {
    val r = fresh()
    val s = r.applyDdl("test",
      "ALTER TABLE casbin_rule ADD a decimal(10,2) AFTER p_type, DROP v1").get
    assert(s.columnNames == Seq("p_type", "a", "v0", "v2"))
    assert(s.columns(1).mysqlType == "decimal(10,2)")
  }

  test("unknown table / non-ALTER statements are no-ops") {
    val r = fresh()
    assert(r.applyDdl("test", "ALTER TABLE nope ADD x int").isEmpty)
    assert(r.applyDdl("test", "CREATE TABLE t (x int)").isEmpty)
    assert(r.applyDdl("test", "BEGIN").isEmpty)
  }

  test("duplicate ADD is a no-op (idempotent replay safety)") {
    val r = fresh()
    r.applyDdl("test", "ALTER TABLE casbin_rule ADD age int")
    assert(r.applyDdl("test", "ALTER TABLE casbin_rule ADD age int").isEmpty)
    assert(r.get("test", "casbin_rule").get.version == 1)
  }

  test("persistence: schemas survive a registry restart (K8 analog)") {
    val dir = Files.createTempDirectory("graft-registry")
    val r1 = new SchemaRegistry(Some(dir))
    r1.put(TableSchema("db", "t", Seq(ColumnDef("id", "bigint"),
      ColumnDef("name", "varchar(50)"))))
    r1.applyDdl("db", "ALTER TABLE t ADD extra decimal(10,2)")
    val r2 = new SchemaRegistry(Some(dir))
    val s = r2.get("db", "t").get
    assert(s.columnNames == Seq("id", "name", "extra"))
    assert(s.version == 1)
  }

  test("snapshot is the broadcastable (db.table -> columns) view") {
    val r = fresh()
    assert(r.snapshot() ==
      Map("test.casbin_rule" -> Seq("p_type", "v0", "v1", "v2")))
  }

  test("getOrFetch installs on miss, caches on hit (S4 read-through)") {
    val r = new SchemaRegistry()
    var fetches = 0
    def fetch: Option[Seq[ColumnDef]] = { fetches += 1; Some(Seq(ColumnDef("id", "int"))) }
    assert(r.getOrFetch("d", "t")(fetch).get.columnNames == Seq("id"))
    assert(r.getOrFetch("d", "t")(fetch).isDefined)
    assert(fetches == 1)
  }
}
