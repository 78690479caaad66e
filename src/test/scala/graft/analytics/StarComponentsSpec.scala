package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The star-alternation components engine ([[DedupQueries.starComponents]])
  * — correctness on adversarial topologies plus equality with the
  * min-label sibling on the real pair graph. The path-graph case is the
  * REASON the engine exists: diameter-bounded propagation needs one round
  * per hop, the alternation contracts the same chain in O(log n) rounds.
  */
class StarComponentsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Canonical big→small edge frame from (lo, hi) literal pairs. */
  private def edgeDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("lo", "hi").select($"hi".as("s"), $"lo".as("d"))
  }

  test("1000-node path graph converges in O(log n) rounds, not diameter") {
    import spark.implicits._
    // path 0–1–2–…–999: diameter 999; min-label propagation would need
    // ~999 rounds. The alternation must finish in well under 20.
    val path = edgeDf((0L until 999L).map(i => (i, i + 1)))
    val (labels, iters) = DedupQueries.starComponents(spark, path)
    assert(iters <= 12, s"path graph took $iters alternations")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === 1000)
    assert(got.values.toSet === Set(0L), "every node must label to the min")
  }

  test("disjoint components keep separate minima; ring and star shapes") {
    // component A: ring 10–11–12–13–10; component B: star centered 20;
    // component C: single edge
    val edges = edgeDf(Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L),
      (20L, 21L), (20L, 22L), (20L, 23L),
      (30L, 31L)))
    val (labels, _) = DedupQueries.starComponents(spark, edges)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(10L, 11L, 12L, 13L).forall(got(_) == 10L))
    assert(Seq(20L, 21L, 22L, 23L).forall(got(_) == 20L))
    assert(Seq(30L, 31L).forall(got(_) == 30L))
  }

  test("a capped-out run throws instead of returning mid-contraction labels") {
    val path = edgeDf((0L until 999L).map(i => (i, i + 1)))
    val ex = intercept[IllegalArgumentException] {
      DedupQueries.starComponents(spark, path, maxIter = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("empty edge set yields empty labeling without iteration blow-up") {
    val (labels, iters) = DedupQueries.starComponents(spark, edgeDf(Seq.empty))
    assert(labels.count() === 0L)
    assert(iters <= 2)
  }

  test("quality keeper is a member of its component with the max score") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val comp = DedupQueries.qDedupComponents(spark, dir)
      .select($"doc_id", $"component").collect()
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    val quality = TextQueries.qualityScored(spark, dir)
      .select($"doc_id", $"quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val keepers = DedupQueries.qDedupKeeperQuality(spark, dir).collect()
    assert(keepers.nonEmpty)
    keepers.foreach { r =>
      val (c, n, keeper, kq) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(comp(c).contains(keeper), s"keeper $keeper not in component $c")
      assert(n === comp(c).size)
      val maxQ = comp(c).map(quality).max
      assert(kq === maxQ, s"component $c keeper quality $kq != max $maxQ")
      assert(quality(keeper) === maxQ)
    }
  }

  test("star engine matches the min-label engine on the real pair graph") {
    val a = DedupQueries.qDedupComponents(spark, dir)
      .select("doc_id", "component", "n_docs", "is_keeper")
      .collect().map(_.toSeq).toSet
    val b = DedupQueries.qDedupComponentsStar(spark, dir)
      .select("doc_id", "component", "n_docs", "is_keeper")
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty, "sf0.001 must contain at least one near-dup component")
    assert(a === b)
  }
}
