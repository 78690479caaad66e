package graft.registry

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.registry.DdlParser._

/** Property: rendering a random ALTER intent to SQL — with arbitrary
  * keyword casing, backticks, extra whitespace, optional COLUMN keywords,
  * leading comments, and comma-bearing parenthesized types — then parsing
  * it recovers exactly the intent. The reference's whitespace-split parser
  * is quirk-compatible only on the corpus; this pins OUR parser's contract
  * over the full statement space it claims.
  *
  * (Raw scalacheck `Gen` with fixed seeds — the scalatest bridge artifact
  * is not in the offline cache; fixed seeds keep cases reproducible.)
  */
class DdlParserPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val name: Gen[String] = Gen.chooseNum(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9'))).map(cs =>
      ("c" +: cs).mkString)) // leading letter

  private val colType: Gen[String] = Gen.oneOf(
    "int", "bigint", "varchar(255)", "decimal(10,2)", "text",
    "double", "datetime(6)")

  private sealed trait Intent
  private case class DropI(col: String, kw: Boolean) extends Intent
  private case class AddI(col: String, tpe: String, pos: Position, kw: Boolean)
    extends Intent
  private case class ChangeI(old: String, nw: String, tpe: String, kw: Boolean)
    extends Intent
  private case class ModifyI(col: String, tpe: String) extends Intent

  private val position: Gen[Position] = Gen.oneOf(
    Gen.const(Last), Gen.const(First), name.map(After))

  private val intent: Gen[Intent] = Gen.oneOf(
    for { c <- name; kw <- Gen.oneOf(true, false) } yield DropI(c, kw),
    for {
      c <- name; t <- colType; p <- position; kw <- Gen.oneOf(true, false)
    } yield AddI(c, t, p, kw),
    for {
      o <- name; n <- name; t <- colType; kw <- Gen.oneOf(true, false)
    } yield ChangeI(o, n, t, kw),
    for { c <- name; t <- colType } yield ModifyI(c, t))

  /** random keyword casing */
  private def kase(s: String, seed: Int): String =
    s.zipWithIndex.map { case (c, i) =>
      if (((seed >> (i % 16)) & 1) == 1) c.toUpper else c
    }.mkString

  private def renderClause(i: Intent, seed: Int): String = i match {
    case DropI(c, kw) =>
      s"${kase("drop", seed)} ${if (kw) kase("column", seed) + " " else ""}`$c`"
    case AddI(c, t, pos, kw) =>
      val p = pos match {
        case Last     => ""
        case First    => " " + kase("first", seed)
        case After(y) => s" ${kase("after", seed)} `$y`"
      }
      s"${kase("add", seed)} ${if (kw) kase("column", seed) + " " else ""}`$c`  $t$p"
    case ChangeI(o, n, t, kw) =>
      s"${kase("change", seed)} ${if (kw) kase("column", seed) + " " else ""}`$o` `$n` $t"
    case ModifyI(c, t) => s"${kase("modify", seed)} `$c` $t"
  }

  private def expected(i: Intent): DdlOp = i match {
    case DropI(c, _)         => DropColumn(c)
    case AddI(c, t, p, _)    => AddColumn(c, t, p)
    case ChangeI(o, n, t, _) => RenameColumn(o, n, t)
    case ModifyI(_, _)       => Ignored
  }

  test("render → parse round-trips arbitrary ALTER intents") {
    val stmt = for {
      db <- Gen.option(name)
      tbl <- name
      is <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, intent))
      seed <- Gen.chooseNum(0, 65535)
      comment <- Gen.oneOf("", "/* comment; with ; semis */ ")
    } yield {
      val target = db.map(d => s"`$d`.`$tbl`").getOrElse(s"`$tbl`")
      val sql = s"$comment${kase("alter", seed)}  ${kase("table", seed)} " +
        s"$target ${is.zipWithIndex.map { case (i, k) => renderClause(i, seed + k) }.mkString(" , ")};"
      (db, tbl, is, sql)
    }
    val cases = samples(stmt, 400)
    assert(cases.nonEmpty)
    cases.foreach { case (db, tbl, is, sql) =>
      val parsed = DdlParser.parse(sql)
      assert(parsed.isDefined, sql)
      val Alter(pdb, ptbl, ops) = parsed.get
      assert(pdb === db, sql)
      assert(ptbl === tbl, sql)
      assert(ops === is.map(expected), sql)
    }
  }

  test("non-ALTER statements parse to None, never throw") {
    val junk = Gen.oneOf(
      "begin", "BEGIN", "create table t (a int)", "drop table t",
      "insert into t values (1)", "", "   ", "alter", "alter index i",
      "truncate table t", "/* x */ commit")
    samples(junk, 50).foreach(s => assert(DdlParser.parse(s).isEmpty, s))
  }
}
