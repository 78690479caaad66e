package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Containment dedup: the prefix filter must be EXACT (it is a pigeonhole
  * argument, not an LSH probability), and the direction must be
  * asymmetric — the small doc is reported as contained in the big one,
  * never the reverse.
  */
class ContainmentSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("prefix-filtered result equals the brute-force all-pairs answer") {
    import spark.implicits._
    val got = DedupQueries.qDedupContainment(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: exact shingle sets, all ordered pairs — independent of
    // the prefix filter, df ranking, and candidate join under test
    val sh = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", explode(expr(
        """transform(sequence(1, greatest(length(text) - 15, 1)),
          |  i -> substring(text, i, 16))""".stripMargin)).as("sh"))
      .distinct()
      .select($"doc_id", xxhash64($"sh").as("hx"))
      .groupBy($"doc_id")
      .agg(sort_array(collect_set($"hx")).as("hs"), count(lit(1)).as("n"))
      .filter($"n" >= 20)
    graft.functions.VectorFunctions.register(spark)
    val a = sh.select($"doc_id".as("id_a"), $"hs".as("a_hs"), $"n".as("a_n"))
    val b = sh.select($"doc_id".as("id_b"), $"hs".as("b_hs"))
    val brute = a.crossJoin(b)
      .filter($"id_a" =!= $"id_b")
      .withColumn("inter", expr("graft_sorted_and_count(a_hs, b_hs)"))
      .filter($"inter".cast("double") / $"a_n" >= 0.9)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
  }

  test("incremental face = the batch answer restricted to cross-delta pairs") {
    import spark.implicits._
    val inc = DedupQueries.qDedupContainmentIncremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchCross = DedupQueries.qDedupContainment(spark, dir)
      .filter(($"id_a" % 5 === 4) =!= ($"id_b" % 5 === 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === batchCross)
  }

  test("a paragraph quoted inside a bigger doc is caught, direction-correct") {
    import spark.implicits._
    val small = "the quick brown fox jumps over the lazy dog again and again, " +
      "a sentence long enough to clear the twenty-shingle fragment floor."
    val big = "PREAMBLE that shares nothing with the quote. " * 8 +
      small + (" trailing filler content that is entirely novel text. " * 8)
    val docs = Seq((1L, small), (2L, big), (3L, "unrelated filler " * 40))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-contain").toString
    docs.write.parquet(s"$tmp/documents.parquet")
    val got = DedupQueries.qDedupContainment(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"small-in-big missing from $got")
    assert(!got.contains((2L, 1L)), "big doc must not be 'contained' in small")
  }
}
