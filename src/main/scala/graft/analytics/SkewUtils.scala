package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: key salting.
  *
  * AQE's skew-join splitting (enabled in [[graft.GraftSession]]) handles
  * skew it can SEE — post-shuffle partitions above the split threshold.
  * Salting is the complementary static technique for keys so hot that even
  * a split partition serializes on one reducer: the large side scatters
  * each hot key across `saltBuckets` sub-keys, the small side replicates
  * its matching rows into every bucket, and the join key becomes
  * (key, salt). Join results are identical; the hot key's work spreads
  * over `saltBuckets` reducers at the cost of replicating the small side's
  * hot rows `saltBuckets`×.
  *
  * Use when a profiled key distribution shows a head key owning a
  * double-digit percentage of rows (e.g. a null-like sentinel, a bot
  * user_id). At 100 TB the alternative — one reducer owning 10 TB — is a
  * stalled stage, not a slow one.
  */
object SkewUtils {

  /** Inner-join `large` with `small` on `large(key) === small(key)`,
    * salting the large side into `saltBuckets` sub-keys.
    *
    * @param large the skewed (probe) side; gains a transient `__salt` col
    * @param small the replicated (build) side — its row count multiplies
    *              by `saltBuckets`, so keep it the dimension side
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // seeded rand: uniform scatter even when hot-key rows are IDENTICAL
    // (a row-hash salt would send every duplicate of the hot row to ONE
    // bucket — no scatter at all). Seeded rand is deterministic per
    // partition, so task retries and speculative attempts reproduce it.
    val salted = large.withColumn("__salt",
      floor(rand(42) * saltBuckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    // hint the SHUFFLE-hash strategy with the replicated side as build:
    // salting exists to spread a hot key across (key, salt) REDUCERS, so
    // the join must be a shuffle join — left to the planner, the
    // replicated side's small pre-explode size estimate selects a
    // BROADCAST join, which (a) funnels the saltBuckets× replica set
    // through the driver (measured: ~9 s of a 750 k-row join at sf0.1)
    // and (b) has no reducers to spread, making the salt pure overhead.
    salted
      .join(replicated.hint("shuffle_hash"),
        salted(key) === replicated(key) &&
          salted("__salt") === replicated("__salt"))
      .drop(replicated(key))
      .drop(salted("__salt")).drop(replicated("__salt"))
  }

  /** Top-N heavy keys of `df(key)` with their share of all rows — the
    * profiling step that decides whether salting is warranted.
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    // grand total as a 1-row cross join, NOT an unpartitioned window — a
    // global window would funnel every distinct key's count through one
    // task (the exact stall this module exists to prevent)
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val total = df.select(count(lit(1)).as("__total"))
    counts.crossJoin(total)
      .withColumn("share", col("n") / col("__total"))
      .drop("__total")
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
