package graft.registry

/** `ALTER TABLE` → schema-evolution ops — operator P7 of SURVEY.md §2.3.
  *
  * Reference: `internal/sync_server/baseinfo.go:100-251` — a lowercase,
  * whitespace-split parser handling:
  *   - optional leading block comment before the statement (DBeaver emits
  *     one with its application name, `sync_test.go:128`);
  *   - `DROP [COLUMN] x` (`baseinfo.go:152-178`);
  *   - `ADD [COLUMN] x <type...> [FIRST | AFTER y]` with positional
  *     insertion (`baseinfo.go:179-226`);
  *   - `CHANGE old new <type...>` rename (`baseinfo.go:227-248`);
  *   - `MODIFY` deliberately ignored (`baseinfo.go:129-131`);
  *   - `db.`-qualified table names stripped (`baseinfo.go:120-127`).
  *
  * Same observable semantics, reimplemented as a token-stream parser that
  * also supports comma-separated multi-clause ALTERs (a strict superset —
  * the reference processes only the first clause shape it recognizes).
  */
object DdlParser {

  sealed trait DdlOp
  final case class DropColumn(name: String) extends DdlOp
  final case class AddColumn(name: String, mysqlType: String, position: Position)
      extends DdlOp
  final case class RenameColumn(oldName: String, newName: String,
      mysqlType: String) extends DdlOp
  case object Ignored extends DdlOp // MODIFY and anything unrecognized

  sealed trait Position
  case object Last extends Position
  case object First extends Position
  final case class After(column: String) extends Position

  /** Parse result: target (db?, table) + the ops, or None if the statement
    * is not an ALTER TABLE at all.
    */
  final case class Alter(database: Option[String], table: String,
      ops: Seq[DdlOp])

  private val CommentPrefix = """(?s)^\s*/\*.*?\*/\s*""".r

  /** Strip comments, lowercase, normalize backticks/whitespace — mirrors the
    * reference's `strings.ToLower` + manual trimming. Backticks are deleted
    * (not blanked) so `` `db`.`table` `` stays one token.
    */
  def normalize(sql: String): String =
    CommentPrefix.replaceFirstIn(sql, "")
      .replace("`", "")
      .toLowerCase
      .trim

  def parse(sql: String): Option[Alter] = {
    val norm = normalize(sql)
    val tokens = norm.split("""[\s;]+""").filter(_.nonEmpty).toList
    tokens match {
      case "alter" :: "table" :: target :: rest =>
        val (db, table) = target.split('.') match {
          case Array(d, t) => (Some(d), t)
          case _           => (None, target)
        }
        Some(Alter(db, table, parseClauses(rest)))
      case _ => None
    }
  }

  /** Split the clause region on top-level commas, then parse each. Type
    * tokens like `decimal(10,2)` contain commas inside parens — rejoin by
    * tracking paren depth over the raw token stream.
    */
  private def parseClauses(tokens: List[String]): Seq[DdlOp] = {
    val joined = tokens.mkString(" ")
    val clauses = splitTopLevel(joined)
    clauses.map(c => parseClause(c.split("""\s+""").filter(_.nonEmpty).toList))
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.result().filter(_.nonEmpty)
  }

  private def dropColumnKw(ts: List[String]): List[String] = ts match {
    case "column" :: rest => rest
    case other            => other
  }

  private def parseClause(ts: List[String]): DdlOp = ts match {
    case "drop" :: rest =>
      dropColumnKw(rest) match {
        case name :: _ => DropColumn(name)
        case Nil       => Ignored
      }
    case "add" :: rest =>
      dropColumnKw(rest) match {
        case name :: tail =>
          val (typeTokens, pos) = extractPosition(tail)
          AddColumn(name, typeTokens.mkString(" "), pos)
        case Nil => Ignored
      }
    case "change" :: rest =>
      dropColumnKw(rest) match {
        case old :: nw :: typeRest => RenameColumn(old, nw, typeRest.mkString(" "))
        case _                     => Ignored
      }
    // MODIFY (type-only change) intentionally ignored: baseinfo.go:129-131
    case "modify" :: _ => Ignored
    case _             => Ignored
  }

  /** Pull a trailing `FIRST` / `AFTER y`; everything before it is the
    * type + attribute tokens.
    */
  private def extractPosition(ts: List[String]): (List[String], Position) = {
    val idxFirst = ts.lastIndexOf("first")
    val idxAfter = ts.lastIndexOf("after")
    if (idxAfter >= 0 && idxAfter == ts.length - 2)
      (ts.take(idxAfter), After(ts.last))
    else if (idxFirst == ts.length - 1)
      (ts.take(idxFirst), First)
    else (ts, Last)
  }
}
