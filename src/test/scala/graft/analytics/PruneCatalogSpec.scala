package graft.analytics

import graft.SparkSpec

/** `prune` on a bucketed-layout artifact must drop the pruned versions'
  * external-table catalog entries along with their files (r14 advisory:
  * stale entries whose LOCATION is gone are metadata lint that
  * accumulates one pair per admission in a long-lived session) — and
  * must leave the kept versions' entries untouched, so an open reader's
  * registered frames keep resolving.
  */
class PruneCatalogSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed DedupIndex.prune deregisters pruned versions' tables " +
      "and keeps the survivors'") {
    import spark.implicits._
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-prune-cat").toString
    DedupIndex.build(spark, docs.filter($"doc_id" % 5 < 3), idx)
    // v1, v2: two admissions; probe each version so its tables register
    DedupIndex.probe(spark, idx, docs.filter($"doc_id" % 5 === 4)).count()
    assert(DedupIndex.append(spark, docs.filter($"doc_id" % 5 === 3), idx,
      "day1"))
    DedupIndex.probe(spark, idx, docs.filter($"doc_id" % 5 === 4)).count()
    assert(DedupIndex.append(spark, docs.limit(1), idx, "day2"))
    DedupIndex.probe(spark, idx, docs.filter($"doc_id" % 5 === 4)).count()

    val family = IndexLayout.familyOf(idx)
    def registered(ver: Long): Boolean =
      spark.catalog.tableExists(s"${family}_bands_v$ver") ||
        spark.catalog.tableExists(s"${family}_signatures_v$ver")
    assert((0L to 2L).forall(registered),
      "fixture: each probed version must have registered its tables")

    DedupIndex.prune(spark, idx, keep = 2)
    assert(!registered(0L),
      "pruned version v0 left stale catalog entries behind")
    assert(registered(1L) && registered(2L),
      "prune dropped a KEPT version's catalog entries")
    // the surviving artifact still probes
    assert(DedupIndex.probe(spark, idx,
      docs.filter($"doc_id" % 5 === 4)).count() >= 0)
  }
}
