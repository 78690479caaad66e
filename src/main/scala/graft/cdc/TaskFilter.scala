package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Database/table filter rules of a CDC task — operators F1–F3 (and the F4
  * DDL variant) of SURVEY.md §2.2.
  *
  * Reference semantics (`internal/sync_server/process.go:40-75`,
  * `pkg/req_resp.go:19-43`):
  *   - empty list ⇒ allow all (each of the three rules independently);
  *   - `databases`: keep iff `database ∈ set` (F1);
  *   - `tables`: keep iff `"db.*" ∈ set` (shallow wildcard) or
  *     `"db.table" ∈ set` (deep) (F2);
  *   - `excludeTables`: drop iff `"db.*"` or `"db.table"` ∈ set (F3).
  *
  * Exposed both as a plain Scala predicate (for typed `Dataset.filter` /
  * driver-side checks) and as a `Column` expression built from
  * `isInCollection` — which Catalyst compiles to an O(1) `InSet` lookup and
  * can constant-fold / push toward the scan, matching the reference's
  * prebuilt-hash-set short-circuit design (SURVEY.md §4).
  */
final case class TaskFilter(
    databases: Seq[String] = Seq.empty,
    tables: Seq[String] = Seq.empty,
    excludeTables: Seq[String] = Seq.empty
) {

  private val dbSet: Set[String] = databases.toSet
  private val tableSet: Set[String] = tables.toSet
  private val excludeSet: Set[String] = excludeTables.toSet

  /** F1 — also the F4 predicate for DDL events. */
  def acceptsDatabase(db: String): Boolean =
    dbSet.isEmpty || dbSet.contains(db)

  /** F2 — include with `db.*` wildcard. */
  def acceptsTable(db: String, table: String): Boolean =
    tableSet.isEmpty || tableSet.contains(s"$db.*") ||
      tableSet.contains(s"$db.$table")

  /** F3 — exclude with `db.*` wildcard. */
  def notExcluded(db: String, table: String): Boolean =
    !(excludeSet.contains(s"$db.*") || excludeSet.contains(s"$db.$table"))

  /** Conjunction of F1 ∧ F2 ∧ F3 — the row-event accept rule
    * (`process.go:40-75` runs them in this order, cheapest first).
    */
  def accepts(db: String, table: String): Boolean =
    acceptsDatabase(db) && acceptsTable(db, table) && notExcluded(db, table)

  /** The same rule as a Catalyst `Column`, for declarative pipelines where
    * Catalyst can push it down (each `isInCollection` on a literal list
    * becomes an `InSet`).
    */
  def column(db: Column, table: Column): Column = {
    val full = concat_ws(".", db, table)
    val shallow = concat_ws(".", db, lit("*"))
    val f1 =
      if (databases.isEmpty) lit(true) else db.isInCollection(databases)
    val f2 =
      if (tables.isEmpty) lit(true)
      else shallow.isInCollection(tables) || full.isInCollection(tables)
    val f3 =
      if (excludeTables.isEmpty) lit(true)
      else !(shallow.isInCollection(excludeTables) ||
        full.isInCollection(excludeTables))
    f1 && f2 && f3
  }
}

object TaskFilter {
  /** Allow-everything filter (all three lists empty). */
  val allowAll: TaskFilter = TaskFilter()
}
