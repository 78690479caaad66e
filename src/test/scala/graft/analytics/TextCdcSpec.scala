package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-defined chunking's load-bearing property: boundaries are a
  * function of CONTENT, so an insertion near the front of a document
  * shifts only the chunk it lands in and every later boundary RE-ALIGNS —
  * most chunk fingerprints survive the shift. A fixed-size grid loses
  * alignment at the insertion point and every later chunk changes. This
  * difference is the reason shift-robust corpus dedup (and every
  * backup/dedup system) chunks by content.
  */
class TextCdcSpec extends SparkSpec {

  test("an insertion preserves most content-defined chunk fingerprints " +
      "and destroys most fixed-grid ones") {
    import spark.implicits._
    // a long synthetic doc with varied content (so boundaries occur)
    val base = (0 until 400)
      .map(i => s"w${i % 97}x${(i * 31) % 89}").mkString(" ")
    val shifted = "INSERTED PREFIX " + base
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")

    val ch = TextQueries.cdcChunksOf(spark, docs)
      .select($"doc_id", $"chunk_fp").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val cdcShared = ch(1L).intersect(ch(2L)).size
    assert(ch(1L).size >= 10,
      s"fixture must produce many chunks, got ${ch(1L).size}")
    // all but the first chunk (where the insertion landed) re-align
    assert(cdcShared * 10 >= ch(1L).size * 8,
      s"CDC chunks must mostly survive the shift: " +
        s"$cdcShared of ${ch(1L).size} shared")

    // fixed 64-char grid over the same pair: alignment lost at the
    // insertion, so (almost) no grid chunk of the shifted copy matches
    val grid = docs.select($"doc_id", posexplode(expr(
        """transform(sequence(0, cast(floor((length(text) - 1) / 64) as int)),
          |  k -> substring(text, k * 64 + 1, 64))""".stripMargin)))
      .select($"doc_id", expr("graft_poly_hash(col)").as("fp"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val gridShared = grid(1L).intersect(grid(2L)).size
    assert(gridShared * 5 <= grid(1L).size,
      s"fixed grid should lose alignment: $gridShared of " +
        s"${grid(1L).size} shared")
    assert(cdcShared > gridShared,
      s"CDC ($cdcShared) must beat the fixed grid ($gridShared)")
  }

  test("chunks tile each document exactly: concatenation invariants") {
    import spark.implicits._
    val docs = graft.GraftSession
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val stats = TextQueries.cdcChunksOf(spark, docs)
      .groupBy($"doc_id")
      .agg(sum($"chunk_len").as("sum_len"), min($"chunk_start").as("first"),
        count(lit(1)).as("n_chunks"))
      .join(docs.select($"doc_id", length($"text").cast("long").as("len")),
        "doc_id")
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(r.getAs[Long]("sum_len") === r.getAs[Long]("len"),
        s"chunks must tile doc ${r.getAs[Long]("doc_id")} exactly")
      assert(r.getAs[Long]("first") === 1L)
    }
  }
}
