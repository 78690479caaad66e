package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The leakage-safety property that justifies q_split_leakage_safe: no
  * near-dup pair may straddle a split boundary, and docs outside any
  * component keep the plain per-doc hash split.
  */
class LeakageSplitSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no near-dup pair crosses a split boundary") {
    import spark.implicits._
    val split = DedupQueries.qSplitLeakageSafe(spark, dir)
      .select($"doc_id", $"split")
    val pairs = DedupQueries.qDedupMinhashLsh(spark, dir)
    assert(pairs.count() > 0, "sf0.001 must contain near-dup pairs")
    val crossing = pairs
      .join(split.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "split_a"), "id_a")
      .join(split.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "split_b"), "id_b")
      .filter($"split_a" =!= $"split_b")
    assert(crossing.count() === 0, "a near-dup pair straddles splits")
  }

  test("docs outside any component keep the per-doc hash split") {
    import spark.implicits._
    val leakSafe = DedupQueries.qSplitLeakageSafe(spark, dir)
    val loners = leakSafe.filter($"group_id" === $"doc_id")
    assert(loners.count() > 0)
    // group_id = doc_id ⇒ identical md5 bucket as the plain split rule
    val h = substring(md5($"doc_id".cast("string")), 1, 2)
    val recomputed = loners.withColumn("expected",
      when(h < "e6", "train").when(h < "f3", "val").otherwise("test"))
    assert(recomputed.filter($"split" =!= $"expected").count() === 0)
  }

  test("all three splits are non-empty at sf0.001") {
    val splits = DedupQueries.qSplitLeakageSafe(spark, dir)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet === Set("train", "val", "test"), s"got $splits")
  }
}
