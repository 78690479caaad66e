package graft.cdc

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property: the Catalyst `Column` form of the filter must decide exactly
  * like the Scala predicate for ARBITRARY rule sets and inputs — the
  * streaming path (Column) and the driver-side checks (predicate) must
  * never disagree, or a row could pass validation but be dropped by the
  * pipeline (or vice versa).
  *
  * (Raw scalacheck `Gen` sampled with a FIXED seed — the scalatest-plus
  * bridge artifact is not in the offline cache; a fixed seed also keeps
  * the case set reproducible across runs.)
  */
class TaskFilterPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val name: Gen[String] =
    Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "db", "t", "x")).map(_.mkString))

  private val rule: Gen[String] = for {
    db <- name
    t <- Gen.oneOf(name, Gen.const("*"))
  } yield s"$db.$t"

  private val filterGen: Gen[TaskFilter] = for {
    dbs <- Gen.listOf(name)
    inc <- Gen.listOf(rule)
    exc <- Gen.listOf(rule)
  } yield TaskFilter(dbs, inc, exc)

  test("Column form ≡ Scala predicate for arbitrary filters and names") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // a fixed universe of (db, table) probes, evaluated ONCE per filter
    val probes = (for {
      d <- Seq("a", "b", "db", "x", "ab", "dbt")
      t <- Seq("a", "t", "x", "tt", "ba")
    } yield (d, t)).distinct
    val probeDf = probes.toDF("database", "table")
    samples(filterGen, 40).foreach { f =>
      val gotCol = probeDf
        .filter(f.column(col("database"), col("table")))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val gotPred = probes.filter { case (d, t) => f.accepts(d, t) }.toSet
      assert(gotCol == gotPred, s"filter $f")
    }
  }
}
