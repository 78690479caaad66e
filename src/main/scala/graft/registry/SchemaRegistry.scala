package graft.registry

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import graft.model.{ColumnDef, TableSchema}

/** Per-table schema registry with DDL evolution — operators S4 + P7 + the K8
  * KV-persistence analog of SURVEY.md §2.
  *
  * Reference: schemas cached in memory and persisted as JSON in badger under
  * `scheam.<db>.<table>` (typo in reference, `storage.go:131-133` — we use
  * `schema.`), read-through on first sight of a table
  * (`baseinfo.go:39-58`), mutated in place by `updateSchema()`
  * (`baseinfo.go:100-251`) when DDL arrives on the binlog.
  *
  * Spark-native shape: the registry lives on the driver / control service;
  * per micro-batch the projection takes an immutable `snapshot()` that is
  * broadcast to executors (see [[graft.cdc.Projector]]), so executors never
  * see a torn mid-DDL schema — the same effect as the reference's RW-lock.
  * Persistence is one JSON file per table under a directory (the badger
  * analog for this offline build; swappable for any KV).
  */
final class SchemaRegistry(persistDir: Option[Path] = None) {

  private val cache = new ConcurrentHashMap[String, TableSchema]()

  persistDir.foreach { dir =>
    Files.createDirectories(dir)
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .foreach { p =>
        SchemaJson.parse(Files.readString(p)).foreach(s => cache.put(s.key, s))
      }
  }

  def get(database: String, table: String): Option[TableSchema] =
    Option(cache.get(s"$database.$table"))

  /** Read-through: return cached schema or install the one produced by
    * `fetch` (the `SHOW FULL COLUMNS` analog — in this offline build, a
    * catalog/fixture lookup). Mirrors `tableSchema()` `baseinfo.go:39-58`.
    */
  def getOrFetch(database: String, table: String)(
      fetch: => Option[Seq[ColumnDef]]): Option[TableSchema] =
    get(database, table).orElse {
      fetch.map { cols =>
        val s = TableSchema(database, table, cols, version = 0)
        put(s)
        s
      }
    }

  def put(schema: TableSchema): Unit = {
    cache.put(schema.key, schema)
    persist(schema)
  }

  def remove(database: String, table: String): Unit = {
    cache.remove(s"$database.$table")
    persistDir.foreach(d =>
      Files.deleteIfExists(d.resolve(s"schema.$database.$table.json")))
  }

  /** All known (db.table → ordered column names) — the broadcastable
    * projection snapshot.
    */
  def snapshot(): Map[String, Seq[String]] =
    ListMap.from(cache.asScala.view.mapValues(_.columnNames).toSeq.sortBy(_._1))

  def tables(): Seq[TableSchema] = cache.values.asScala.toSeq.sortBy(_.key)

  /** Apply a binlog DDL statement (QueryEvent payload). Returns the updated
    * schema when the statement changed anything. `defaultDatabase` is the
    * QueryEvent's schema field — an unqualified `ALTER TABLE t` binds to it
    * (reference: `process.go:216-239` passes the event schema through).
    */
  def applyDdl(defaultDatabase: String, sql: String): Option[TableSchema] =
    DdlParser.parse(sql).flatMap { alter =>
      val db = alter.database.getOrElse(defaultDatabase)
      get(db, alter.table).flatMap { schema =>
        val evolved = alter.ops.foldLeft(schema.columns)(applyOp)
        if (evolved == schema.columns) None
        else {
          val next = schema.copy(columns = evolved, version = schema.version + 1)
          put(next)
          Some(next)
        }
      }
    }

  private def applyOp(cols: Seq[ColumnDef], op: DdlParser.DdlOp): Seq[ColumnDef] =
    op match {
      case DdlParser.DropColumn(name) =>
        cols.filterNot(_.name == name) // baseinfo.go:152-178
      case DdlParser.AddColumn(name, tpe, pos) if !cols.exists(_.name == name) =>
        val c = ColumnDef(name, tpe)
        pos match { // positional insertion: baseinfo.go:179-226
          case DdlParser.Last  => cols :+ c
          case DdlParser.First => c +: cols
          case DdlParser.After(anchor) =>
            val i = cols.indexWhere(_.name == anchor)
            if (i < 0) cols :+ c
            else (cols.take(i + 1) :+ c) ++ cols.drop(i + 1)
        }
      case DdlParser.RenameColumn(old, nw, tpe) =>
        cols.map(c => // baseinfo.go:227-248
          if (c.name == old)
            c.copy(name = nw,
              mysqlType = if (tpe.nonEmpty) tpe else c.mysqlType)
          else c)
      case _ => cols // MODIFY / unrecognized: baseinfo.go:129-131
    }

  private def persist(schema: TableSchema): Unit =
    persistDir.foreach { dir =>
      Files.write(
        dir.resolve(s"schema.${schema.database}.${schema.table}.json"),
        SchemaJson.render(schema).getBytes(StandardCharsets.UTF_8))
    }
}

/** Minimal hand-rolled JSON for `TableSchema` — keeps the registry free of
  * library deps; the format mirrors the reference's marshaled `[]Columns`.
  */
object SchemaJson {

  private def esc(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case '\n'          => "\\n"
      case '\r'          => "\\r"
      case '\t'          => "\\t"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  def render(s: TableSchema): String = {
    val cols = s.columns.map(c =>
      s"""{"name":"${esc(c.name)}","type":"${esc(c.mysqlType)}","not_null":${c.notNull}}""")
      .mkString("[", ",", "]")
    s"""{"database":"${esc(s.database)}","table":"${esc(s.table)}","version":${s.version},"columns":$cols}"""
  }

  // Tight parser for exactly the shape `render` emits (registry round-trip),
  // tolerant of whitespace. Not a general JSON parser.
  private val Outer =
    """(?s)\{\s*"database"\s*:\s*"(.*?)"\s*,\s*"table"\s*:\s*"(.*?)"\s*,\s*"version"\s*:\s*(\d+)\s*,\s*"columns"\s*:\s*\[(.*)\]\s*\}\s*""".r
  private val Col =
    """\{\s*"name"\s*:\s*"(.*?)"\s*,\s*"type"\s*:\s*"(.*?)"\s*,\s*"not_null"\s*:\s*(true|false)\s*\}""".r

  private def unesc(s: String): String =
    if (!s.contains('\\')) s
    else {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '"'  => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case 'n'  => sb += '\n'; i += 2
            case 'r'  => sb += '\r'; i += 2
            case 't'  => sb += '\t'; i += 2
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case o => sb += o; i += 2
          }
        } else { sb += c; i += 1 }
      }
      sb.toString
    }

  def parse(json: String): Option[TableSchema] = json match {
    case Outer(db, table, version, colsBlob) =>
      val cols = Col.findAllMatchIn(colsBlob).map { m =>
        ColumnDef(unesc(m.group(1)), unesc(m.group(2)), m.group(3).toBoolean)
      }.toSeq
      Some(TableSchema(unesc(db), unesc(table), cols, version.toInt))
    case _ => None
  }
}
