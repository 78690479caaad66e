package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted joins must be result-identical to the plain join — salting is a
  * physical redistribution, never a semantic change.
  */
class SkewUtilsSpec extends SparkSpec {

  test("saltedJoin equals plain inner join on a skewed key") {
    import spark.implicits._
    // 90% of the large side lands on key 1 (the hot key)
    val large = (1 to 1000).map { i =>
      (if (i <= 900) 1L else (i % 7).toLong, s"payload$i")
    }.toDF("k", "payload")
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("k", "name")

    val plain = large.join(small, "k")
      .select($"k", $"payload", $"name")
    val salted = SkewUtils.saltedJoin(large, small, "k", saltBuckets = 8)
      .select($"k", $"payload", $"name")

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("keySkewProfile surfaces the hot key with its share") {
    import spark.implicits._
    val df = ((1 to 80).map(_ => 5L) ++ (1 to 20).map(i => 100L + i))
      .toDF("k")
    val top = SkewUtils.keySkewProfile(df, "k", topN = 1).collect()
    assert(top.head.getLong(0) === 5L)
    assert(math.abs(top.head.getDouble(2) - 0.8) < 1e-9)
  }
}
