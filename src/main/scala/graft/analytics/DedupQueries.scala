package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession.table

/** Deduplication operators for a training-data pipeline over `documents` /
  * `embeddings` (driver mandate: exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine near-dup).
  *
  * Scale design (the driver data keeps documents small; the plans are built
  * for 100 TB — no all-pairs joins, no data-dependent driver-side jobs
  * during plan construction, no corpus-side broadcasts):
  *   - exact dedup is a hash-groupBy on a 256-bit digest — one shuffle on
  *     the digest, map-side partial aggregation;
  *   - MinHash+LSH (j ≥ 0.8) and n-gram Jaccard (j ≥ 0.7) share one
  *     candidate-generation engine: a 128-permutation MinHash signature
  *     (ONE custom aggregate, one shared cache), banded so only
  *     same-bucket docs ever meet, then EXACT Jaccard verification of the
  *     candidate set via the sorted merge-scan kernel. Rows-per-band stays
  *     at 4 for BOTH thresholds — the corpus's background inter-doc
  *     similarity (measured: planted near-dups at j ≥ 0.93, next pair at
  *     0.31) means shallow bands (r=2) collide on background pairs and the
  *     candidate set degenerates toward all-pairs (measured: 145 s at
  *     sf0.1); r=4 keeps background collisions ~p⁴ while the threshold
  *     band count controls recall:
  *       j ≥ 0.8: b=16 (slots 1–64)  ⇒ P(miss) ≤ (1−0.8⁴)¹⁶ ≈ 4e-8
  *       j ≥ 0.7: b=32 (slots 1–128) ⇒ P(miss) ≤ (1−0.7⁴)³² ≈ 1.5e-4
  *         at EXACTLY the threshold; at the corpus's actual qualifying
  *         margin (j ≥ 0.93) it is ≤ (1−0.93⁴)³² ≈ 1e-19. A corpus with
  *         mass near 0.7 would raise bands further (the aggregate width is
  *         a parameter), trading candidate volume for recall.
  *   - SimHash (hamming ≤ 3 over a 32-bit sketch) uses DETERMINISTIC
  *     pigeonhole banding: 4 disjoint 8-bit bands — ≤ 3 differing bits
  *     cannot touch all 4 bands, so every qualifying pair shares ≥ 1 exact
  *     band. Candidates come from a shuffle equi-join on (band, bits); the
  *     per-pair verify is one `bit_count(xor)`. Exact by construction, no
  *     probability involved;
  *   - embedding near-dup keeps the exact all-pairs double-cosine as the
  *     BASELINE (see [[qDedupEmbedding]] for why the measured data makes
  *     that unavoidable at its threshold) and adds [[qDedupEmbeddingLsh]],
  *     the banded sign-LSH scale shape with a deterministic seeded
  *     hyperplane matrix that the oracle reproduces bit-for-bit.
  *
  * Everything is built from codegen'd `functions._` expressions and native
  * Catalyst kernels — no UDFs — and every query has an exact DuckDB oracle.
  */
object DedupQueries {

  /** 5-char shingle multiset of `text` (guarded for short docs). NOTE: no
    * in-array `array_distinct` — it is O(n²) on string arrays and shows up
    * as the dominant cost at scale; dedup happens post-explode as a
    * shuffle-partial distinct instead.
    */
  private val shingleExpr =
    "transform(sequence(1, greatest(length(text) - 4, 1))," +
      " i -> substring(text, i, 5))"

  /** (doc_id, hx, hp, hp2) — the DISTINCT shingle set of each doc, carried
    * as its hash projections: `hx` = xxhash64 (MinHash / verify-set
    * stream), `hp` = the Karp–Rabin polynomial hash (SimHash stream) and
    * `hp2` = the independent second polynomial stream (the wide-simhash
    * bits — 8 B/shingle buys the 60-bit sketch a free ride on this cache
    * instead of a second corpus scan+explode+distinct, measured ~5 s at
    * sf0.1). One narrow projection + explode + dedup. The distinct runs on
    * the shingle STRINGS (exactly the oracle's set semantics — deduping on
    * a hash would collapse rare colliding shingles the oracle still
    * counts) and costs NO exchange (grouping on (doc_id, sh) is satisfied
    * by the doc_id clustering below — subset rule); the strings then DIE
    * inside the same stage — only the 24 bytes of hashes per shingle reach
    * the cache. Measured at sf0.1 dropping the strings cuts the cached
    * chain ~3× (~9.5 M shingle strings otherwise live in cache for the
    * life of the suite) and with it the GC load every downstream dedup
    * query inherits.
    *
    * MATERIALIZED AS A DURABLE ARTIFACT (`chain-<fp>/shingles` under the
    * ANN index root, fingerprint-keyed like every other index artifact):
    * built once per corpus CONTENT, read from parquet thereafter — the
    * "checkpointed parquet of the same projection" the original cache
    * doc promised at scale, now the only path. The session heap cache it
    * replaces was this host's single worst variance source: storing the
    * ~9.5 M-row columnar cache provisions hundreds of MB of fresh
    * anonymous heap pages at the host's measured 5–20 MB/s, so the
    * shared chain build swung 1.3 → 27 s across IDLE back-to-back passes
    * (r15's official bench caught a 7.4 s min-of-3). Parquet writes ride
    * the page cache (file-backed, compressed ~5×) and re-reads are
    * codegen'd vectorized scans — stable, and at 100 TB the signature
    * store could never be heap-resident anyway. Consumers are unchanged:
    * every reader takes the read-back frame.
    */
  private def docShingles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // repartition BY doc_id before the ~N×5 explode: the corpus arrives as
    // few parquet splits (1 at small SF), so without this the whole
    // shingle pipeline runs on one core; hashing on doc_id also satisfies
    // the downstream distinct and groupBy(doc_id) clustering, so the heavy
    // post-explode rows are never shuffled — only the narrow
    // (doc_id, text) rows are (and the artifact's files inherit the
    // doc_id clustering).
    chainTable(spark, dir, "shingles") {
      table(spark, dir, "documents")
        .select($"doc_id", $"text")
        .repartition($"doc_id")
        .select($"doc_id", explode(expr(shingleExpr)).as("sh"))
        .distinct()
        .select($"doc_id", xxhash64($"sh").as("hx"),
          expr("graft_poly_hash(sh)").as("hp"),
          expr("graft_poly_hash2(sh)").as("hp2"))
    }
  }

  /** Load-or-build of one durable chain table (`chain-<fp>/<name>`):
    * content-fingerprint-keyed like the ANN/dedup index artifacts
    * resolved through the same root, so rewritten source data can never
    * serve stale signatures, and any session over the same corpus —
    * bench pass, verify run, spec — reads the one materialization.
    * `_SUCCESS` is parquet's own commit marker (checked through the
    * Hadoop FS like [[AnnIndex.exists]] — the root may be a lake path);
    * a killed write leaves none and the next caller rebuilds over it.
    * Synchronized: one builder per JVM (the in-JVM callers are
    * sequential; cross-JVM concurrency is already excluded by the
    * bench/verify contract).
    */
  private def chainTable(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame = synchronized {
    val path = s"${SimilarityQueries.indexRoot}/chain-" +
      s"${AnnIndex.sourceFingerprint(spark, s"$dir/documents.parquet")}/$name"
    if (!AnnIndex.exists(spark, path))
      build.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Exact dedup: SHA-256 digest groupBy; keeper = min doc_id per digest.
    * Also exposes a normalized variant (lowercase, collapsed whitespace) in
    * the same pass.
    */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select($"doc_id",
        sha2($"text", 256).as("digest"),
        sha2(regexp_replace(lower($"text"), "\\s+", " "), 256).as("norm_digest"))
      .groupBy($"digest", $"norm_digest")
      .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_dups"))
      .select($"keeper_id", $"n_dups", substring($"digest", 1, 16).as("digest16"))
  }

  // ------------------------------------------------------ MinHash+LSH core

  /** (doc_id, mhsig: array<bigint>[128], hs: sorted distinct 64-bit
    * shingle hashes, sz) — ONE shuffle computes BOTH per-doc artifacts:
    * the MinHash signature (for banding) and the sorted hash set (for
    * exact verification via the merge-scan kernel). No global dictionary,
    * no driver-side job at plan time, nothing data-dependent in the plan
    * shape. 128 slots serve both band shapes (16×4 uses slots 1–64, 32×4
    * uses all), so the two LSH queries share ONE cached table.
    *
    * The signature is a SINGLE custom aggregate
    * ([[graft.functions.MinHash64]]: array<bigint> buffer, one primitive
    * mix+min loop per row, map-side partial aggregation) — separate
    * `min()` columns generate so much Janino code that one-time
    * compilation dominates the whole query (~12 s of a ~20 s cold run at
    * sf0.1 with 64 columns). Duplicate shingles are harmless under min, so
    * no distinct shuffle.
    *
    * Durable chain table (`mh128` — see [[chainTable]]): scanned by the
    * banding pipeline and by both verify-join sides as a vectorized
    * parquet read. The per-doc array rows (128-slot signature + the hs
    * verify set) are exactly the wide-object heap blocks the host's
    * page-provisioning tax punished under the old session persist; on
    * disk they cost one page-cached scan per consumer instead.
    */
  private def minhashPer(spark: SparkSession, dir: String): DataFrame =
    chainTable(spark, dir, "mh128")(mh128Build(spark, dir))

  /** The mh128 BUILDER frame — what [[chainTable]] materializes when the
    * artifact is absent. Exposed (with [[pairsBuild]]) for
    * `PlanAssertionsSpec`: the scale contracts (object-hash minhash with
    * partial merge, sort-merge verify join) live on the BUILD plan now
    * that consumers read the durable artifact back.
    */
  private[graft] def mh128Build(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    docShingles(spark, dir)
      .groupBy($"doc_id")
      .agg(
        expr("graft_minhash128(hx)").as("mhsig"),
        sort_array(collect_set($"hx")).as("hs"))
      .withColumn("sz", size($"hs").cast("long"))
  }

  /** The verified-pair BUILDER frame at one band shape — the plan
    * [[chainTable]] materializes for `pairs16x4_080`/`pairs32x4_070`
    * (probe side and corpus side both read the mh128 artifact, exactly
    * as the production build does).
    */
  private[graft] def pairsBuild(spark: SparkSession, dir: String,
      bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val per = minhashPer(spark, dir)
    verifyJaccard(per, lshCandidates(per, bands, rowsPerBand), threshold)
  }

  /** The 256-slot sibling of [[minhashPer]] — same ONE-shuffle shape, same
    * shared [[docShingles]] cache underneath, wider signature
    * (`graft_minhash256`: the aggregate is width-parameterized on the same
    * permutation stream, so slots 1–128 of this signature ARE
    * [[minhashPer]]'s slots — widening extends, never reseeds). Serves the
    * corpus-scale r=8 band shapes whose 64-bit band values keep noise
    * collisions falling as j₀⁸ (SCALE.md band-shape law).
    */
  private def minhash256Per(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    chainTable(spark, dir, "mh256") {
      docShingles(spark, dir)
        .groupBy($"doc_id")
        .agg(
          expr("graft_minhash256(hx)").as("mhsig"),
          sort_array(collect_set($"hx")).as("hs"))
        .withColumn("sz", size($"hs").cast("long"))
    }
  }

  /** LSH candidate pairs from the 128-slot MinHash signature, banded
    * `bands × rowsPerBand` (must fit the signature width — slots past the
    * end would read as null, hash every doc to the SAME band value, and
    * silently degenerate the candidate set to all-pairs). Shuffle key is
    * (band, signature-hash) so only same-bucket docs ever meet; the
    * in-bucket pair expansion emits sorted (id_a < id_b) pairs, deduped
    * across bands.
    */
  /** The banded bucket keys of a 128-slot `mhsig` column: one
    * (band, sig) struct per band, sig = xxhash64 of that band's
    * signature slots. Shared by the self-join candidate generator and
    * the incremental (delta-probes-corpus) generator.
    */
  private[analytics] def bandStructs(bands: Int, rowsPerBand: Int,
      slots: Int = 128) = {
    require(bands * rowsPerBand <= slots,
      s"band shape $bands×$rowsPerBand exceeds the $slots-slot signature")
    (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(r =>
          element_at(col("mhsig"), b * rowsPerBand + r + 1)): _*).as("sig"))
    }
  }

  private def lshCandidates(per: DataFrame, bands: Int, rowsPerBand: Int,
      slots: Int = 128): DataFrame = {
    val bandCols = bandStructs(bands, rowsPerBand, slots)
    per
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .groupBy(col("bs.band"), col("bs.sig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) ->" +
          " transform(slice(ids, i + 2, size(ids)), y -> struct(x AS id_a, y AS id_b))))"))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
  }

  /** Exact-Jaccard verification of candidate pairs against the per-doc
    * sorted hash sets: |A∩B| via the codegen'd merge-scan kernel
    * (O(|a|+|b|) longs, zero allocation — `array_intersect` over string
    * shingles was 23 s of a 23.4 s query at sf0.1 / 283 k candidates).
    *
    * Join shapes, chosen for 100 TB (and measured on this host): join 1
    * attaches A's hash set to each candidate pair — `per` (the corpus —
    * LARGE) is already hash-partitioned on doc_id from its groupBy, so it
    * never moves; only the NARROW candidate rows shuffle, hinted
    * shuffle-hash so the build side is the (id_a, id_b) pair list, never
    * the corpus. Join 2 has NO narrow side — the pair rows now carry
    * A's full hash set — so it must NOT be a hash join: building a
    * HashedRelation over pair×set rows is a multi-GB allocation spike
    * (measured: 26/32 executor threads in LongToUnsafeRowMap.grow and
    * 3.3 s/young-GC while the 32-band verify ran 108 s). Sort-merge
    * streams both sides instead: the corpus side reuses its doc_id
    * partitioning plus a local sort, the wide rows spill sequentially,
    * and nothing rides the heap. No corpus-side broadcast, no
    * driver-side job during plan construction.
    */
  private def verifyJaccard(per: DataFrame, cand: DataFrame,
      threshold: Double): DataFrame =
    verifyJaccardSplit(per, per, cand, threshold)

  /** [[verifyJaccard]] with separate id_a / id_b signature frames — the
    * incremental shape, where the a-side is the standing corpus and the
    * b-side a delta whose signatures were computed batch-locally.
    *
    * `micro = true` declares the b-side a MICRO-BATCH delta (bounded per
    * trigger by the stream's admission control, never a day-sized batch):
    * the candidate set and the candidate-bounded a-side rows broadcast,
    * so the corpus-sized a table STREAMS from its cache scan with zero
    * per-batch exchange or sort — the join tax the streaming probe would
    * otherwise pay on every trigger (measured: the containment face's
    * per-batch exchange of 10× postings was its whole corpus-size term).
    * The batch faces keep `micro = false`: a daily delta is NOT
    * broadcast-bounded, and the shuffle_hash/merge shape is the one
    * sized for it.
    */
  private[graft] def verifyJaccardSplit(perA: DataFrame, perB: DataFrame,
      cand: DataFrame, threshold: Double,
      micro: Boolean = false): DataFrame = {
    val a = perA.select(col("doc_id").as("a_id"),
      col("hs").as("a_hs"), col("sz").as("a_sz"))
    val b = perB.select(col("doc_id").as("b_id"),
      col("hs").as("b_hs"), col("sz").as("b_sz"))
    val withA =
      (if (micro) a.join(broadcast(cand), col("a_id") === col("id_a"))
       else a.join(cand.hint("shuffle_hash"), col("a_id") === col("id_a")))
      .select(col("id_a"), col("id_b"), col("a_hs"), col("a_sz"))
    (if (micro) b.join(broadcast(withA), col("id_b") === col("b_id"))
     else b.join(withA.hint("merge"), col("id_b") === col("b_id")))
      .withColumn("inter", expr("graft_sorted_and_count(a_hs, b_hs)"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("a_sz") + col("b_sz") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash + LSH near-dup (j ≥ 0.8): banded 16×4 ⇒ miss probability at
    * the threshold (1−0.8⁴)¹⁶ ≈ 4e-8 (smaller above it), so the verified
    * output equals the exact all-pairs answer. Hash collisions in the
    * verify sets would perturb the count with probability ~|vocab|²/2⁶⁵ —
    * negligible at any realistic vocabulary.
    */
  /** Materialize the shared dedup chain (shingles → minhash
    * signatures/hash-sets → banded 16×4 LSH → exact-verified pair set) in
    * one action: the shingle/minhash tables resolve as durable
    * fingerprint-keyed parquet artifacts ([[chainTable]] — built only if
    * absent for this corpus content, the ANN-index pattern), and the
    * tiny verified pair set persists in-session. Benchmark-attribution
    * hook: the bench charges this to its own labeled row so each chain
    * CONSUMER's line measures that query's own compute, not whichever
    * member happened to run first cold; a cold-artifact pass 1 carries
    * the one-time signature build, later passes only LSH + verify.
    */
  def buildChain(spark: SparkSession, dir: String): Unit = {
    qDedupMinhashLsh(spark, dir).count()
    // the simhash sketch table is chain state too (shared by the 32- and
    // 60-bit faces): building it here keeps the one-time cost in the
    // chain_build row instead of landing on whichever consumer runs first
    simhashSketches(spark, dir).count()
    ()
  }

  def qDedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // the verified pair set is itself a deterministic corpus derivation
    // (seeded permutations, exact-jaccard verify), so it joins the chain
    // artifact: built once per corpus content, a tiny parquet read
    // thereafter. The in-session persist on the read-back stays for
    // [[qDedupComponents]], whose alternation LOOP re-reads the edge set
    // per iteration and builds the identical plan — the shared cache
    // entry keeps the loop in memory (the entry is near-dup-density
    // small; re-registering it per pass is noise).
    chainTable(spark, dir, "pairs16x4_080") {
      pairsBuild(spark, dir, bands = 16, rowsPerBand = 4, 0.8)
    }.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** INCREMENTAL near-dup (j ≥ 0.8): the new batch ("delta", doc_id % 5
    * = 4 — today's crawl increment) probed against the STANDING corpus's
    * LSH index — the daily-ingest shape of every production dedup
    * deployment. The structural point vs [[qDedupMinhashLsh]]: candidates
    * come from an equi-join of the delta's band keys against the corpus's
    * band keys, so corpus×corpus pairs are NEVER expanded — re-running
    * ingest costs O(|delta| + matches), not O(|corpus|²) re-dedup. At
    * 100 TB the corpus band table is the persisted LSH index (bucketed by
    * (band, sig) — see `Bucketing`); the delta's bands shuffle to it and
    * nothing else moves. Signatures reuse the SAME shared [[minhashPer]]
    * chain as the batch dedup queries (one shingle+minhash build per
    * session); verification is the same merge-scan exact-Jaccard engine,
    * narrow-candidate build side and sort-merge wide join included.
    * Banding miss probability at the threshold is the (1−0.8⁴)¹⁶ ≈ 4e-8
    * of the 16×4 shape, so the output equals the oracle's exact
    * delta×corpus answer.
    */
  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val idx = artifactDir(spark, dir, "dedup")
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("text"))
    // Shape.Oracle EXPLICITLY (not the build default): the DuckDB oracle
    // computes the EXACT delta×corpus j ≥ 0.8 answer, and 16×4 is the
    // shape whose banding miss at the threshold (≈4e-8) makes the probe
    // equal it. Production builds default to the corpus-scale 32×8/256 —
    // recorded in the artifact, replayed by every probe (DedupIndexSpec
    // pins Corpus-artifact pair parity).
    if (!DedupIndex.hasCurrent(idx))
      DedupIndex.build(spark, docs.filter(col("doc_id") % 5 =!= 4), idx,
        DedupIndex.Shape.Oracle)
    DedupIndex.probe(spark, idx, docs.filter(col("doc_id") % 5 === 4))
  }

  /** [[qDedupIncremental]] with the corpus indexed IN TWO STEPS — build
    * over doc_id % 5 < 3, then ADMIT the % 5 = 3 slice through the
    * production admission path ([[DedupIndex.append]]: signatures at
    * the bucket modulus, bands as L0 accrual) — before the same
    * % 5 = 4 delta probes it. The oracle is [[qDedupIncremental]]'s
    * EXACT same answer: per-doc minhash banding is deterministic, so a
    * corpus indexed incrementally carries identical band content, and
    * the probe's base+L0 union legs must surface the admitted docs'
    * pairs bit-exactly. This puts the ADMISSION write path — and the
    * L0 read path on its other side — inside the driver's oracle gate
    * (the incremental faces oracle build+probe only; `IndexL0Spec`
    * pins the file shape, this row pins the VALUES every round). The
    * deltaId-idempotent admit makes replays no-ops on a resolved
    * artifact.
    */
  def qDedupAdmitted(spark: SparkSession, dir: String): DataFrame =
    admittedFace(spark, dir, "dedup-admitted", "admitted-day1",
      compactAfter = false)

  /** The shared build(% 5 < 3) + admit(% 5 = 3) [+ fold] + probe(% 5 = 4)
    * lifecycle behind [[qDedupAdmitted]]/[[qDedupCompacted]] and their
    * manifest-carrier twins — one body so the four oracled rows cannot
    * drift apart in anything but family name and carrier.
    */
  private def admittedFace(spark: SparkSession, dir: String, kind: String,
      deltaId: String, compactAfter: Boolean): DataFrame = {
    val idx = artifactDir(spark, dir, kind)
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("text"))
    if (!DedupIndex.hasCurrent(idx))
      DedupIndex.build(spark, docs.filter(col("doc_id") % 5 < 3), idx,
        DedupIndex.Shape.Oracle)
    DedupIndex.append(spark, docs.filter(col("doc_id") % 5 === 3), idx,
      deltaId)
    if (compactAfter) DedupIndex.compact(spark, idx, maxFiles = 0)
    DedupIndex.probe(spark, idx, docs.filter(col("doc_id") % 5 === 4))
  }

  /** Run `body` with the MANIFEST carrier conf set (restored after):
    * builds inside record [[graft.streaming.VersionedArtifact
    * .ManifestMeta]], so the whole lifecycle executes through
    * `_carry.txt` reference resolution, logical file reads, and vacuum
    * prune. The conf is read at BUILD only — an already-resolved
    * artifact keeps whatever carrier its meta records.
    *
    * SINGLE-THREADED contract (r20 verdict): the conf is session-global,
    * so two concurrent queries on one session could leak the carrier
    * into each other's builds. Verify/Bench run queries sequentially by
    * construction; a concurrent caller must pin the carrier per build
    * (build inside its own `withManifestCarrier`) from ONE thread — the
    * same single-writer rule every artifact lifecycle already carries.
    */
  private def withManifestCarrier[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(DedupIndex.CarrierConf)
    spark.conf.set(DedupIndex.CarrierConf,
      graft.streaming.VersionedArtifact.ManifestValue)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(DedupIndex.CarrierConf, v)
      case None => spark.conf.unset(DedupIndex.CarrierConf)
    }
  }

  /** [[qDedupAdmitted]] on the MANIFEST carrier (own `dedup-adm-m`
    * family): the admission lifecycle executed through `_carry.txt`
    * references instead of hard links, against the SAME exact oracle —
    * r19 proved the carrier seam at spec level (`ManifestCarrierSpec`);
    * this row puts it inside the driver's hash gate every round (r19
    * verdict #2: "no oracled row has ever executed through _carry.txt
    * resolution").
    */
  def qDedupAdmittedManifest(spark: SparkSession, dir: String): DataFrame =
    withManifestCarrier(spark) {
      admittedFace(spark, dir, "dedup-adm-m", "admitted-day1",
        compactAfter = false)
    }

  /** [[qDedupAdmitted]] driven through COMPACTION: the two-step
    * build + admit is FOLDED ([[DedupIndex.compact]] — the
    * bucket-granular minor/major fold of
    * `VersionedArtifact.compactBucketed`, consuming the admission
    * accrual whichever side of the L0 cutover wrote it) before the
    * probe, so the driver's hash gate pins compaction's multiset
    * invariance against the same exact DuckDB answer every round
    * (`DedupIndexSpec` pins it at spec level; this row makes it an
    * oracle). `maxFiles = 0` keeps the threshold at the bucket floor,
    * so the fold FIRES on every run — deliberately: the row prices
    * admit + fold + probe as one maintained-artifact cycle, and a
    * re-run stays deterministic because the fold preserves the row
    * multiset and the re-admit no-ops by deltaId.
    */
  def qDedupCompacted(spark: SparkSession, dir: String): DataFrame =
    admittedFace(spark, dir, "dedup-compacted", "compacted-day1",
      compactAfter = true)

  /** [[qDedupCompacted]] on the MANIFEST carrier (own `dedup-cmp-m`
    * family): admit + bucket-granular fold where the kept base files
    * carry as `_carry.txt` references — the fold's "link the dominant
    * file" optimization becomes "reference the dominant file", and the
    * probe must still hash-equal the one-shot build's exact answer.
    */
  def qDedupCompactedManifest(spark: SparkSession, dir: String): DataFrame =
    withManifestCarrier(spark) {
      admittedFace(spark, dir, "dedup-cmp-m", "compacted-day1",
        compactAfter = true)
    }

  /** [[qDedupIncremental]] after a TAKEDOWN: a deterministic slice of
    * the indexed corpus (doc_id % 7 = 3) is tombstoned
    * ([[DedupIndex.delete]] — the [[IndexTombstones]] logical phase),
    * and the probe must report exactly the pairs whose corpus side
    * SURVIVES. Own artifact family (`dedup-td`) so the shared `dedup`
    * artifact the other faces probe stays un-deleted; the delete is
    * deltaId-idempotent, so re-running the face (or a crash between
    * build and delete on a fresh fingerprint) converges — the delete
    * call runs unconditionally every time.
    */
  def qDedupIncrementalTakedown(spark: SparkSession,
      dir: String): DataFrame = {
    val idx = artifactDir(spark, dir, "dedup-td")
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    if (!DedupIndex.hasCurrent(idx))
      DedupIndex.build(spark, corpus, idx, DedupIndex.Shape.Oracle)
    // the deltaId ENCODES the slice: a changed predicate must not no-op
    // against an artifact that applied the old one under the same id
    DedupIndex.delete(spark, idx,
      corpus.filter(col("doc_id") % 7 === 3).select(col("doc_id")),
      "takedown-mod7-3")
    DedupIndex.probe(spark, idx, docs.filter(col("doc_id") % 5 === 4))
  }

  /** [[qDedupIncrementalTakedown]] driven through the PHYSICAL phase:
    * same tombstoned slice, but the face also runs [[DedupIndex.purge]]
    * before probing — so the driver's hash gate pins the whole
    * two-phase contract end to end (rows physically rewritten out,
    * sidecar dropped, bucket-selective carry, deltas preserved) against
    * the same exact DuckDB answer as the logical face: purge must be
    * INVISIBLE to readers. Converges across re-runs: the delete no-ops
    * by deltaId (the ledger survives the purge — that is the point),
    * and a purge with no live tombstones returns false without a
    * version bump. Own artifact family (`dedup-purge`).
    */
  def qDedupPurge(spark: SparkSession, dir: String): DataFrame = {
    val idx = artifactDir(spark, dir, "dedup-purge")
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    if (!DedupIndex.hasCurrent(idx))
      DedupIndex.build(spark, corpus, idx, DedupIndex.Shape.Oracle)
    DedupIndex.delete(spark, idx,
      corpus.filter(col("doc_id") % 7 === 3).select(col("doc_id")),
      "takedown-mod7-3")
    DedupIndex.purge(spark, idx)
    DedupIndex.probe(spark, idx, docs.filter(col("doc_id") % 5 === 4))
  }

  /** [[qDedupPurge]] driven through the BUDGET-SLICED physical phase
    * (round 18): the same tombstoned slice is purged ONE BUCKET PER
    * CALL (`budget = 1`, the maximally-interleaved schedule) until the
    * sidecar drops — so the driver's hash gate pins end to end that a
    * sliced purge converges to the identical exact answer as the
    * one-shot purge and the logical filter: readers can never tell
    * which phase, or which slice, they read under. Re-runs converge:
    * the delete no-ops by deltaId and a sidecar-free purge returns
    * false on the first call; the final prune keeps the
    * version-per-slice accrual bounded. Own artifact family
    * (`dedup-psl`).
    */
  def qDedupPurgeSliced(spark: SparkSession, dir: String): DataFrame =
    purgeSlicedFace(spark, dir, "dedup-psl")

  private def purgeSlicedFace(spark: SparkSession, dir: String,
      kind: String): DataFrame = {
    val idx = artifactDir(spark, dir, kind)
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    if (!DedupIndex.hasCurrent(idx))
      DedupIndex.build(spark, corpus, idx, DedupIndex.Shape.Oracle)
    DedupIndex.delete(spark, idx,
      corpus.filter(col("doc_id") % 7 === 3).select(col("doc_id")),
      "takedown-mod7-3")
    var slices = 0
    while (DedupIndex.purge(spark, idx, budget = 1)) {
      slices += 1
      require(slices <= 4096,
        s"sliced purge did not converge at $idx — progress is not carrying")
    }
    DedupIndex.prune(spark, idx)
    DedupIndex.probe(spark, idx, docs.filter(col("doc_id") % 5 === 4))
  }

  /** [[qDedupPurgeSliced]] on the MANIFEST carrier (own `dedup-psl-m`
    * family): delete + one-bucket-per-call budgeted purge + VACUUM prune
    * ([[graft.streaming.VersionedStore.pruneVacuum]] — the reference-
    * counted GC a reference carry requires, since unlike a hard link a
    * reference does not keep bytes alive), probed against the same exact
    * oracle as the link twin. This is the row that executes `pruneVacuum`
    * under the hash gate.
    */
  def qDedupPurgeSlicedManifest(spark: SparkSession,
      dir: String): DataFrame =
    withManifestCarrier(spark) {
      purgeSlicedFace(spark, dir, "dedup-psl-m")
    }

  /** [[qDedupIncremental]] at the DEFAULT corpus-scale artifact shape
    * (32×8/256, [[DedupIndex.Shape.Corpus]]) — the face that drives the
    * production build path through the driver's hash gate rather than
    * only through specs. Own artifact dir (`dedup256-` prefix): the
    * shape is recorded per artifact, so the two oracled faces must not
    * share one. Oracle = the same EXACT delta×corpus j ≥ 0.8 answer as
    * [[qDedupIncremental]]: r=8 bands prune noise collisions, never
    * true near-dups on this corpus family (`ShapeProbe` measured
    * verified 67 = 67 at sf0.1, 4 = 4 at sf0.01; same argument as the
    * long-green `q_dedup_minhash256` row at the lower j ≥ 0.7 bar —
    * this corpus's dup mass sits at j ≥ 0.93, where the 32×8 miss
    * probability is ~4e-12).
    */
  def qDedupIncremental256(spark: SparkSession, dir: String): DataFrame = {
    val idx = artifactDir(spark, dir, "dedup256")
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("text"))
    if (!DedupIndex.hasCurrent(idx))
      DedupIndex.build(spark, docs.filter(col("doc_id") % 5 =!= 4), idx)
    DedupIndex.probe(spark, idx, docs.filter(col("doc_id") % 5 === 4))
  }

  /** The artifact-free in-session face of [[qDedupIncremental]] (shared
    * [[minhashPer]] chain, no disk round-trip) — what `DedupIndexSpec`
    * compares the persisted index's probe AGAINST; the oracled face
    * resolves through the artifact, so the independent reference must
    * stay a separate derivation.
    */
  private[graft] def incrementalInSession(spark: SparkSession,
      dir: String,
      shape: DedupIndex.Shape = DedupIndex.Shape.Oracle): DataFrame = {
    val per =
      if (shape.slots <= 128) minhashPer(spark, dir)
      else minhash256Per(spark, dir)
    incrementalPairs(per.filter(col("doc_id") % 5 =!= 4),
      per.filter(col("doc_id") % 5 === 4), shape)
  }

  /** Content-fingerprinted artifact path for `dir`'s documents table —
    * the [[AnnIndex.sourceFingerprint]] addressing scheme ([[DedupIndex]]
    * / [[ContainIndex]] live beside the ANN artifacts under the same
    * root): rewritten source data can never serve a stale index, and the
    * oracled incremental faces above resolve build-once-probe-thereafter
    * through it (`DedupArtifactResolveSpec` pins the build counter).
    */
  private def artifactDir(spark: SparkSession, dir: String,
      kind: String): String = {
    val fp = AnnIndex.sourceFingerprint(spark, s"$dir/documents.parquet")
    s"${SimilarityQueries.indexRoot}/$kind-$fp"
  }

  /** The delta-probes-corpus engine behind [[qDedupIncremental]] and the
    * streaming ingest sink ([[graft.streaming.IngestDedup]]): band
    * equi-join candidates (no corpus-internal expansion), then the exact
    * merge-scan verify with the corpus as the a-side.
    */
  private[graft] def incrementalPairs(corpusPer: DataFrame,
      deltaPer: DataFrame,
      shape: DedupIndex.Shape = DedupIndex.Shape.Oracle): DataFrame = {
    val bandCols = bandStructs(shape.bands, shape.rowsPerBand, shape.slots)
    def bandsOf(df: DataFrame) = df
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.sig"))
    val corpusBands = bandsOf(corpusPer).withColumnRenamed("doc_id", "id_a")
    val deltaBands = bandsOf(deltaPer).withColumnRenamed("doc_id", "id_b")
    val cand = deltaBands
      .join(corpusBands, Seq("band", "sig"))
      .select(col("id_a"), col("id_b")).distinct()
    verifyJaccardSplit(corpusPer, deltaPer, cand, 0.8)
      .select(col("id_a").as("corpus_id"), col("id_b").as("new_id"),
        col("jaccard"))
  }

  /** Batch-scoped signature frame (doc_id, mhsig, hs, sz) from raw
    * (doc_id, text) rows — the per-micro-batch face of [[minhashPer]]
    * (same expressions, no session persist): what a streaming ingest
    * computes for each arriving delta before probing the standing index.
    */
  private[graft] def signaturesOf(docs: DataFrame,
      slots: Int = 128): DataFrame = {
    require(slots == 128 || slots == 256,
      s"registered minhash kernels are 128/256-slot, got $slots")
    graft.functions.VectorFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), explode(expr(shingleExpr)).as("sh"))
      .distinct()
      .select(col("doc_id"), xxhash64(col("sh")).as("hx"))
      .groupBy(col("doc_id"))
      // both kernels draw from the same permutation stream (slots 1–128
      // of the 256 ARE the 128's), so widening extends, never reseeds
      .agg(expr(s"graft_minhash$slots(hx)").as("mhsig"),
        sort_array(collect_set(col("hx"))).as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))
  }

  /** Exact n-gram Jaccard near-dup pairs (j ≥ 0.7), MinHash-LSH candidate
    * generation + exact verify — the same engine as [[qDedupMinhashLsh]]
    * with more bands for the lower threshold: b=32, r=4 over the 128-slot
    * signature (see the class doc for the band-shape reasoning and miss
    * bounds; r=2 banding measured degenerate on this corpus).
    *
    * Band shape is the CORPUS-SCALE knob (SCALE.md "band-shape law",
    * measured at 10×): r=4 is right at oracle scale but its candidate
    * constant explodes on boilerplate-heavy corpora; at scale run r=8
    * (same chain via [[nearDupStats]], `graft_minhash256` for b=32×r=8) —
    * measured 360× candidate pruning at 50 k docs with the identical
    * verified output, invariance spec-pinned in `DedupIncrementalSpec`.
    *
    * (Earlier design note, kept for the record: a global shingle→bit
    * dictionary with bitset signatures verified exactly too, but its
    * dictionary width was a data-dependent `count()` — a driver-side Spark
    * job at PLAN time — and its pair step was an all-pairs broadcast NLJ,
    * both 100 TB killers. The bitset kernels remain in
    * [[graft.functions.VectorExpressions]] as the fixed-vocabulary verifier
    * option.)
    */
  /** Scale-probe face of the banded near-dup chain (NOT an oracled query):
    * the same shared signature chain under a CONFIGURABLE band shape,
    * reporting (docs, LSH candidates, verified pairs). The oracled queries
    * pin r=4 at test scale; this is how the r-must-grow-with-log-N law is
    * MEASURED (SCALE.md "10× stress"): with background similarity j₀ > 0
    * the candidate count is ~N²·b·j₀^r, so holding it linear as N grows
    * means raising rowsPerBand, not accepting a quadratic verify. All 128
    * signature slots are available (b·r ≤ 128).
    */
  def nearDupStats(spark: SparkSession, dir: String, bands: Int,
      rowsPerBand: Int, threshold: Double): (Long, Long, Long) = {
    import spark.implicits._
    // shapes within the shared 128-slot chain reuse its cache; wider
    // shapes (the b=32 × r=8 = 256-slot corpus calibration) build their
    // signature from the SAME cached shingle table with graft_minhash256
    val slots = bands * rowsPerBand
    val per =
      if (slots <= 128) minhashPer(spark, dir)
      else {
        require(slots <= 256, s"widest registered signature is 256 slots, got $slots")
        minhash256Per(spark, dir)
      }
    val cand = lshCandidates(per, bands, rowsPerBand, slots = math.max(slots, 128))
    val nCand = cand.count()
    val nVerified = verifyJaccard(per, cand, threshold).count()
    val nDocs = per.count()
    (nDocs, nCand, nVerified)
  }

  def qDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    // durable + persisted for the same reasons as [[qDedupMinhashLsh]]:
    // the verified j ≥ 0.7 pair set is tiny and [[qNeighborTopk]]
    // consumes the identical plan
    chainTable(spark, dir, "pairs32x4_070") {
      pairsBuild(spark, dir, bands = 32, rowsPerBand = 4, 0.7)
    }.persist(StorageLevel.MEMORY_AND_DISK)

  /** The corpus-scale near-dup default (SCALE.md band-shape law, measured
    * at 10×): the SAME j ≥ 0.7 semantics as [[qDedupNgramJaccard]], banded
    * 32×8 over the 256-slot signature. r=8 band values collide on
    * background similarity as j₀⁸ instead of j₀⁴ — measured ~400× fewer
    * candidates (3.9 M → 10.8 k at 50 k docs) with IDENTICAL verified
    * output on this corpus, whose true dup mass sits at j ≥ 0.93 where
    * the 32×8 S-curve is ≥ 1−4e-12. At a corpus with real mass at the
    * 0.7 boundary, recall there is modeled 1−(1−0.7⁸)³² ≈ 0.85 — the
    * shape to buy hard-threshold recall is more bands (b≈128), not
    * narrower rows (the quadratic direction). Rides [[docShingles]]; the
    * signature's slots 1–128 are [[minhashPer]]'s (same permutation
    * stream — widening extends, never reseeds).
    */
  def qDedupMinhash256(spark: SparkSession, dir: String): DataFrame = {
    val per = minhash256Per(spark, dir)
    verifyJaccard(per,
      lshCandidates(per, bands = 32, rowsPerBand = 8, slots = 256), 0.7)
  }

  /** Nearest neighbor per involved doc (semantic-dedup evidence: for each
    * doc in a near-dup relationship, its single most-similar peer). Built
    * ON TOP of the verified j ≥ 0.7 pair set — the expensive part
    * (LSH candidates + exact verify) is the shared pipeline; this adds
    * only a symmetric explode of the tiny pair table and a per-doc top-1
    * window. Ties break on (jaccard desc, nbr_id): the jaccard is an
    * exact integer-ratio in BOTH engines (same intersection/union
    * counts), so cross-engine tie order is deterministic.
    */
  def qNeighborTopk(spark: SparkSession, dir: String): DataFrame = {
    val pairs = qDedupNgramJaccard(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("nbr_id").asc)
    pairs
      .select(explode(array(
        struct(col("id_a").as("doc_id"), col("id_b").as("nbr_id"),
          col("jaccard")),
        struct(col("id_b").as("doc_id"), col("id_a").as("nbr_id"),
          col("jaccard")))).as("e"))
      .select(col("e.doc_id"), col("e.nbr_id"), col("e.jaccard"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("jaccard"), col("nbr_id"))
  }

  /** Near-dup CONNECTED COMPONENTS + keeper selection — the step that
    * turns pairwise near-dup evidence into dedup decisions: transitive
    * closure over the j ≥ 0.8 pair graph, component id = min doc_id (the
    * canonical "keeper"), one row per involved doc.
    *
    * Algorithm: distributed min-label propagation — labels start as own
    * doc_id; each iteration takes the min label over neighbors; fixpoint
    * in ≤ diameter iterations (near-dup components are template-duplicate
    * clusters — diameter is small; a 20-iteration cap guards pathological
    * chains, where the large-star/small-star alternation [Kiveris et al.,
    * "Connected Components in MapReduce"] would replace the plain
    * propagation, same join shape). Iteration shape, tuned to ONE
    * edge-sized shuffle per step:
    *   - the edge list carries self-loops, so min over in-neighbors IS
    *     `least(own, neighbors)` — no second join against the old labels;
    *   - edges are persisted pre-partitioned on the join key `d`, so the
    *     per-iteration join only exchanges the (node-sized) label table;
    *     the joined rows then shuffle once into the groupBy on `s`;
    *   - labels are non-increasing pointwise, so `sum(lbl)` strictly
    *     decreases until the fixpoint — the convergence check is one
    *     scalar aggregate on the table the iteration materializes anyway,
    *     not a separate filter+count pass. The per-iteration driver
    *     action is the convergence check of an iterative graph algorithm,
    *     not plan-shaping metadata.
    *
    * Oracle: exact all-pairs j ≥ 0.8 edges + a recursive CTE computing
    * min reachable id — the true transitive closure, so the fixpoint loop
    * is verified against genuinely independent semantics.
    */
  /** Scoped shuffle-partition override for the iterative component
    * loops: every per-iteration frame here is EDGE-set-sized (near-dup
    * density × corpus, tiny relative to the corpus at any SF), but the
    * loops' exchanges and per-generation caches ran at the session
    * constant — 32 one-row tasks per wave per iteration at sf0.1, the
    * r21 8-vs-32-core inversion (ratios ≤ 0.63 on every loop row).
    * Partition count derives from the MATERIALIZED edge count (~16 B/row
    * at a 64 MB/partition target, guide §2.2 "fewer, larger partitions"),
    * floored at 1 and capped at the session parallelism — so a 100 TB
    * edge set still fans out to every core while sf0.1's 100 edges run
    * one task per wave. Conf is set/restored around the loop only; the
    * RETURNED lazy frame executes under the caller's session conf (its
    * final projection is component-count-sized either way). Session-conf
    * mutation rides the same single-threaded bench/verify contract as
    * withManifestCarrier.
    */
  private def withLoopPartitions[T](spark: SparkSession, rows: Long)(
      body: => T): T = {
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      rows * 16L / (64L << 20) + 1L)).toInt
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, parts.toString)
    try body finally spark.conf.set(key, prev)
  }

  def qDedupComponents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = qDedupMinhashLsh(spark, dir)
    // materializes the (persisted) pair set once and prices the loop's
    // partitioning from it — 4 edge rows per pair before the distinct
    val nPairs = pairs.count()
    withLoopPartitions(spark, 4L * nPairs) {
    // both edge directions + self-loops in ONE pass over the pair pipeline
    // (a union of selects would evaluate the whole LSH subtree per branch);
    // distinct dedupes the self-loops a doc contributes per incident pair
    val edges = pairs
      .select(explode(array(
        struct($"id_a".as("s"), $"id_b".as("d")),
        struct($"id_b".as("s"), $"id_a".as("d")),
        struct($"id_a".as("s"), $"id_a".as("d")),
        struct($"id_b".as("s"), $"id_b".as("d")))).as("e"))
      .select($"e.s".as("s"), $"e.d".as("d"))
      .distinct()
      .repartition($"d") // cached partitioning feeds every iteration's join
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count() // materialize once: iterations must not re-run the LSH pipeline
    // label₀ = min(self, direct neighbors): the first propagation folded
    // into init (self-loops put own id in the min), so pair-shaped
    // components — the common near-dup case — converge immediately
    var labels = edges.groupBy($"s".as("doc_id")).agg(min($"d").as("lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the CACHED dataset of each generation — unpersist must target the
    // dataset that was persisted (unpersisting a derived select is a
    // no-op), or every iteration's label table stays cached for the life
    // of the session (node-count-sized at scale)
    var cachedGen = labels
    // coalesce: sum over an EMPTY label table (no near-dup pairs at all)
    // is null — the loop must converge cleanly to an empty result, not NPE
    def lblSum(df: DataFrame): Long =
      df.agg(coalesce(sum($"lbl"), lit(0L))).first().getLong(0)
    var prevSum = lblSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < 20) {
      // labels (node-sized, the SMALL side) build the hash table; edges
      // stream from cache already partitioned on d
      val stepped = edges
        .join(labels.hint("shuffle_hash"), edges("d") === labels("doc_id"))
        .groupBy(edges("s").as("doc_id")).agg(min($"lbl").as("lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val s = lblSum(stepped) // materializes stepped
      cachedGen.unpersist()
      cachedGen = stepped
      labels = stepped
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    labels
      .select($"doc_id", $"lbl".as("component"))
      .withColumn("n_docs",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"component")))
      .withColumn("is_keeper", ($"doc_id" === $"component").cast("boolean"))
    } // withLoopPartitions
  }

  /** The LARGE-STAR / SMALL-STAR alternation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) over a canonical
    * big→small directed edge frame `(s, d)` with `s > d`. Returns the
    * `(doc_id, component)` labeling (component = min node id, every node
    * incident to an edge labeled) and the number of alternation rounds
    * used.
    *
    * Why a second components engine: [[qDedupComponents]]'s min-label
    * propagation needs DIAMETER rounds — fine for template-duplicate
    * clusters (diameter ~2), catastrophic for chain topologies (a crawl
    * snapshot whose page k near-dups page k+1 makes a path graph; 10⁶
    * docs ⇒ 10⁶ rounds). The star alternation contracts ANY topology in
    * O(log n) rounds:
    *   - large-star (symmetric view, one groupBy + one join on `s`):
    *     each center u computes m = min(N(u) ∪ {u}) and rewires every
    *     LARGER neighbor v > u to m. Output is inherently big→small
    *     (m ≤ u < v) with no self-loops.
    *   - small-star (big→small view, same shape): each center u rewires
    *     itself and all its (smaller) neighbors to m = min(N(u) ∪ {u}).
    * Both rounds are edge-sized shuffles on the center key — the
    * symmetric view is repartitioned on `s` ONCE and that exchange is
    * reused by its groupBy and its join (subset rule), so a full
    * alternation costs 2 shuffle passes over the edge list, independent
    * of topology.
    *
    * Convergence is checked EXACTLY — equal count plus an empty left-anti
    * diff against the previous round's edge set (one more edge-sized
    * shuffle, the same cost class as the round; no fingerprint
    * heuristics that could false-converge). At the fixpoint the edge set
    * is a star forest rooted at component minima, so the labeling is one
    * projection: non-roots read their root off their single edge, roots
    * label themselves.
    */
  private[graft] def starComponents(spark: SparkSession, edges0: DataFrame,
      maxIter: Int = 20): (DataFrame, Int) = {
    import spark.implicits._
    // EAGER lineage truncation each generation: the symmetric view
    // references the previous generation TWICE, so without truncation the
    // logical plan doubles per round — exponential plan growth that OOMs
    // the driver around round 10 regardless of data size (persist() alone
    // does NOT cut the plan; Catalyst still carries the full tree).
    // localCheckpoint materializes the rows and replaces the lineage with
    // the checkpointed RDD, keeping every round's plan O(1). At cluster
    // scale swap for reliable `checkpoint()` to a durable dir — same
    // truncation semantics, executor-loss-safe.
    var edges = edges0.select($"s", $"d").distinct().localCheckpoint(true)
    var nOld = edges.count()
    // alternation rounds at an edge-count-derived partition count (see
    // withLoopPartitions): the generations only ever SHRINK from nOld,
    // so pricing the scope once from the materialized input is an upper
    // bound for every round
    withLoopPartitions(spark, nOld) {
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR: neighborhoods need both orientations; repartition the
      // symmetric view on the center key once — groupBy and join reuse it
      val sym = edges.select($"s", $"d")
        .union(edges.select($"d".as("s"), $"s".as("d")))
        .repartition($"s")
      val mins = sym.groupBy($"s").agg(min($"d").as("mind"))
        .select($"s".as("u"), least($"s", $"mind").as("m"))
      val large = sym.join(mins, sym("s") === mins("u"))
        .filter($"d" > $"s")
        .select($"d".as("s"), $"m".as("d"))
        .distinct()
      // SMALL-STAR: already big→small oriented; center = the big end
      val lmins = large.groupBy($"s").agg(min($"d").as("mind"))
        .select($"s".as("u"), least($"s", $"mind").as("m"))
      val small = large.join(lmins, large("s") === lmins("u"))
        .select(explode(array(
          struct($"d".as("ns"), $"m".as("nd")),
          struct($"s".as("ns"), $"m".as("nd")))).as("e"))
        .select($"e.ns".as("s"), $"e.nd".as("d"))
        .filter($"s" =!= $"d")
        .distinct()
        .localCheckpoint(true)
      val nNew = small.count()
      converged = nNew == nOld &&
        small.join(edges, Seq("s", "d"), "left_anti").limit(1).count() == 0
      edges = small
      nOld = nNew
      iter += 1
    }
    // the label projection below ASSUMES a star forest; labels read off a
    // mid-contraction edge set would silently split true components, so a
    // cap-out must be loud, never wrong (20 alternations covers any
    // realistic n under the O(log n) bound — hitting the cap means
    // something is broken, not that the graph is big)
    require(converged,
      s"star alternation did not converge within $maxIter rounds " +
        s"($nOld edges in the last generation) — labels would be wrong")
    val labels = edges
      .select($"s".as("doc_id"), $"d".as("lbl"))
      .union(edges.select($"d".as("doc_id"), $"d".as("lbl")))
      .groupBy($"doc_id").agg(min($"lbl").as("component"))
    (labels, iter)
    } // withLoopPartitions
  }

  /** LEAKAGE-SAFE train/val/test split: the [[graft.analytics
    * .PipelineQueries.qSplitAssign]] hash split, keyed on the near-dup
    * COMPONENT instead of the doc — every member of a duplicate cluster
    * lands in the same split, so a test document can never have a
    * near-duplicate in train. Hash-splitting independent docs is the
    * standard reproducible-split idiom, but under duplication it leaks:
    * at web-crawl dup densities a per-doc split puts a near-copy of a
    * meaningful fraction of test INTO train, and eval scores inherit the
    * contamination. Group-then-hash is the fix every serious pipeline
    * applies (same reason eval decontamination `q_text_contamination`
    * exists — this is the intra-corpus face of it).
    *
    * Shape at scale: the component map is near-dup-density-bounded
    * (tiny vs the corpus) — the join is broadcast-able; everything after
    * is a pure projection of exact md5 arithmetic, zero extra shuffles,
    * reproducible on any cluster/partitioning. Rides the session's
    * cached pair chain + components fixpoint.
    */
  def qSplitLeakageSafe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val comp = qDedupComponents(spark, dir).select($"doc_id", $"component")
    val h = substring(md5($"group_id".cast("string")), 1, 2)
    table(spark, dir, "documents")
      .select($"doc_id", $"lang")
      .join(broadcast(comp), Seq("doc_id"), "left")
      .withColumn("group_id", coalesce($"component", $"doc_id"))
      .select($"doc_id", $"lang", $"group_id",
        when(h < "e6", "train").when(h < "f3", "val").otherwise("test")
          .as("split"))
  }

  /** QUALITY-WEIGHTED keeper selection — what production dedup actually
    * ships: within each near-dup component keep the HIGHEST-QUALITY
    * member (the [[TextQueries.qualityScored]] score; ties broken by min
    * doc_id), not the arbitrary min-id member the plain components
    * output marks. The distinction matters at corpus scale: template
    * clusters typically contain one clean original and N degraded
    * scrapes, and min-id keeps whichever was crawled first.
    *
    * Cross-engine determinism: the quality score's arithmetic is
    * bit-identical in DuckDB (same literal operand order, IEEE-rounded
    * ops over integer counts — `q_text_quality` hash-pins it), and the
    * argmax ordering (quality, −doc_id) is total because doc_id is
    * unique, so the keeper choice never rests on a tie Spark and DuckDB
    * could break differently. Shape: component map (density-bounded) ⋈
    * metadata-wide quality frame, one groupBy — no new heavy shuffle.
    */
  def qDedupKeeperQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val comp = qDedupComponents(spark, dir).select($"doc_id", $"component")
    val q = TextQueries.qualityScored(spark, dir)
      .select($"doc_id", $"quality")
    comp.join(q, "doc_id")
      .groupBy($"component")
      .agg(count(lit(1)).as("n_docs"),
        max_by($"doc_id", struct($"quality", -$"doc_id")).as("keeper_id"),
        max($"quality").as("keeper_quality"))
  }

  /** Near-dup components via the star alternation — same pair graph, same
    * output contract, and the SAME transitive-closure oracle as
    * [[qDedupComponents]]: the two engines are verified against one
    * independent recursive-CTE semantics, so the alternation's rewiring
    * logic is hash-pinned, not merely compared to the sibling loop.
    */
  def qDedupComponentsStar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = qDedupMinhashLsh(spark, dir)
      .select($"id_b".as("s"), $"id_a".as("d"))
    val (labels, _) = starComponents(spark, edges)
    labels
      .withColumn("n_docs",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"component")))
      .withColumn("is_keeper", ($"doc_id" === $"component").cast("boolean"))
  }

  // ----------------------------------------------------------- Containment

  /** CONTAINMENT dedup (doc-inside-doc): ordered pairs (a, b) with
    * |Sh(a) ∩ Sh(b)| / |Sh(a)| ≥ 0.9 — the asymmetric cousin of Jaccard
    * that catches a small document quoted wholesale inside a big one,
    * which symmetric near-dup misses outright (a 1-paragraph doc inside a
    * 100-paragraph doc has Jaccard ≈ 0.01 and containment 1.0). The
    * training-data use is quote/boilerplate/subset elimination.
    *
    * Candidate generation is EXACT prefix filtering (the SSJoin/PPJoin
    * family, Chaudhuri et al., ICDE'06 — no LSH miss probability at all):
    * order every doc's shingles by the GLOBAL (df ASC, hash ASC) total
    * order; a doc missing more than ⌊0.1·|a|⌋ of a's shingles cannot be a
    * 0.9-container, so if b contains a then b holds at least one of a's
    * first ⌊0.1·|a|⌋+1 shingles (pigeonhole — integer arithmetic, no
    * float edge). Candidates = a's prefix tokens equi-joined against the
    * corpus inverted index. Rarest-first ordering makes each prefix
    * token's posting list short, so candidate volume is Σ_prefix df(t) —
    * the standard SSJoin cost, linear-ish in corpus size — while a
    * random prefix order would pay stopword-shingle posting lists.
    * Verification is the exact merge-scan kernel over per-doc sorted
    * hash sets; the df table adds the only other shuffles (term-key
    * groupBy + join, the vocabulary-sized pattern every TF-IDF query
    * here already rides).
    *
    * The shingle unit is 16 CHARS, not the dedup chain's 5: prefix
    * filtering lives or dies on vocabulary discrimination, and this
    * corpus has only ~2 k distinct 5-char shingles over 5 k docs (sf0.1)
    * — the "rarest" 5-gram still has df ≈ 250, the filter degenerates,
    * and candidates approach all-pairs (measured: 11.9 M candidate pairs
    * and a 77 s verify; the same corpus at 16 chars has 603 k distinct
    * shingles — corpus-wide mean df ≈ 2.3, prefix df_avg 1.10 — and the
    * candidate set collapses to 569 pairs, ~21 000× fewer). A
    * 16-char window (~2–3 words) is also the natural quote-detection
    * unit. General law: pick the prefix-filter token so that corpus
    * vocabulary ≫ corpus size.
    *
    * Docs under 20 distinct shingles are excluded on BOTH sides (and in
    * the oracle): sub-20-shingle texts are fragments whose containment is
    * noise, and every real pipeline floors fragment length first.
    */
  private[graft] val containShingleExpr =
    "transform(sequence(1, greatest(length(text) - 15, 1))," +
      " i -> substring(text, i, 16))"

  /** (hx, doc_id, rn, n): each doc's shingle hashes ranked by the global
    * (df ASC, hx ASC) order, fragment floor n ≥ 20 applied — THE shared
    * block of the containment family (batch/incremental faces, the
    * persisted [[ContainIndex]], and `ContainProbe`). One definition so
    * the fragment floor and the ⌊n/10⌋+1 prefix rule can never drift
    * between the oracled query and the artifact. Left join + coalesce:
    * tokens absent from `dfTable` (a delta probing a frozen index) rank
    * rarest at df 0; with live df the join is total and the coalesce is
    * a no-op.
    */
  private[graft] def containRanked(sh: DataFrame,
      dfTable: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("hx"))
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    sh.join(dfTable, Seq("hx"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .filter(col("n") >= 20)
  }

  /** The prefix slice of [[containRanked]] output: ⌊n/10⌋+1 rarest. */
  private[graft] def containPrefix(ranked: DataFrame): DataFrame =
    ranked.filter(col("rn") <= floor(col("n") / 10) + 1)

  /** Shared 16-char frames: `ranked` = (doc_id, hx, rn, n) with `rn` the
    * doc-local rank in the global (df ASC, hx ASC) order and `n` the
    * doc's distinct-shingle count (fragment floor applied); `per` =
    * (doc_id, hs, sz) sorted hash sets for the merge-scan verify. Own
    * pipeline (NOT docShingles' 5-char cache — different unit); same
    * narrow-projection discipline: strings die in-stage, only
    * (doc_id, hash) reaches the cache.
    */
  /** The persisted narrow 16-char shingle frame (doc_id, hx) the whole
    * containment family shares — extracted so [[buildContainChain]] can
    * force exactly the cache entry and nothing else.
    */
  private def containSh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    table(spark, dir, "documents")
      .select($"doc_id", $"text")
      // EXPLICIT count (REPARTITION_BY_NUM — never AQE-coalesced): this
      // spread exists to parallelize the ~N×5 explode BELOW it, whose
      // output size Spark cannot see in the pre-explode stats. With
      // cached-plan AQE enabled (r22) a by-column repartition inside
      // this persist's fill plan coalesced on the narrow input bytes and
      // ran the whole shingle pipeline near-serially (contain_build
      // 0.45 → 4.3 s measured); the count pins the documented intent at
      // any conf. defaultParallelism = total cores, not a local constant.
      .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id", explode(expr(containShingleExpr)).as("sh"))
      .distinct()
      .select($"doc_id", xxhash64($"sh").as("hx"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Force [[containSh]]'s cache — the Bench's `contain_build` labeled
    * row (the `chain_build` precedent applied to the containment family):
    * without it, whichever containment face ran first charged the shared
    * shingle build to its own line, making that row swing round-over-round
    * while its plan was unchanged. Only the PERSISTED frame is forced —
    * the df groupBy and rank window are deliberately unpersisted (see
    * [[containFrames]]) and stay on their consumers' lines.
    */
  def buildContainChain(spark: SparkSession, dir: String): Unit = {
    containSh(spark, dir).count()
    ()
  }

  private def containFrames(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val sh = containSh(spark, dir)
    val dfTable = sh.groupBy($"hx").agg(count(lit(1)).as("df"))
    // deliberately NOT persisted (only the narrow `sh` projection above
    // is). Both variants were measured at the 10× corpus and the trade
    // is host-noise-dominated: persisting ranked/per loads the whole
    // cost onto the first face (containment 44–67 s, incremental 3–5 s;
    // columnar materialization of the 14 M-row frame pays this host's
    // page-provisioning tax), while recompute-from-narrow-cache spreads
    // it (37 s + 22 s — the incremental face consumes ranked four
    // times). Unpersisted keeps each oracled row self-attributing and
    // the peak memory flat, so it is the shipped shape; at real scale
    // neither applies — the standing token/prefix index is a persisted
    // TABLE written once at ingest, which both faces probe.
    val ranked = containRanked(sh, dfTable)
    val per = sh.groupBy($"doc_id")
      .agg(sort_array(collect_set($"hx")).as("hs"))
      .withColumn("sz", size($"hs").cast("long"))
    (ranked, per)
  }

  /** Exact merge-scan containment verify of (id_a, id_b) candidates. */
  private[analytics] def verifyContainment(per: DataFrame,
      cand: DataFrame): DataFrame =
    verifyContainmentSplit(per, per, cand)

  /** [[verifyContainment]] with separate id_a / id_b set frames — the
    * split shape that lets an incremental probe keep each side UNIQUE by
    * construction (delta sets on one side, corpus sets on the other —
    * no union, no anti-join, and a bucketed corpus `sets` table joins in
    * place). Join shapes as [[verifyJaccardSplit]]: narrow candidates
    * build the hash side against the a-sets, the wide b-side streams
    * sort-merge.
    */
  private[analytics] def verifyContainmentSplit(perA: DataFrame,
      perB: DataFrame, cand: DataFrame, micro: Boolean = false): DataFrame = {
    val a = perA.select(col("doc_id").as("a_id"), col("hs").as("a_hs"),
      col("sz").as("a_sz"))
    val b = perB.select(col("doc_id").as("b_id"), col("hs").as("b_hs"))
    // micro: see verifyJaccardSplit — candidate/delta sides broadcast so
    // a corpus-sized side streams from cache with no per-batch exchange
    val withA =
      (if (micro) a.join(broadcast(cand), col("a_id") === col("id_a"))
       else a.join(cand.hint("shuffle_hash"), col("a_id") === col("id_a")))
      .select(col("id_a"), col("id_b"), col("a_hs"), col("a_sz"))
    (if (micro) b.join(broadcast(withA), col("id_b") === col("b_id"))
     else b.join(withA.hint("merge"), col("id_b") === col("b_id")))
      .withColumn("inter", expr("graft_sorted_and_count(a_hs, b_hs)"))
      .withColumn("containment", col("inter").cast("double") / col("a_sz"))
      .filter(col("containment") >= 0.9)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** BOTH verify directions of an incremental containment probe over ONE
    * corpus `sets` scan (r21 verdict #2 — the bucketed batch shape read
    * the corpus-sized table once per direction). Every candidate pair has
    * exactly one delta side and one corpus side; the directions differ
    * only in WHICH side is the contained `id_a` (whose size divides the
    * intersection), and the merge-scan intersection count itself is
    * symmetric. So: tag each direction's candidates with where their
    * corpus side sits, join the delta sets once (delta-sized), then join
    * the corpus sets ONCE — last, `merge`-hinted, so the bucketed table
    * (clustered AND sorted by doc_id) streams in place with zero
    * exchange and zero sort, the same in-place contract as the split
    * shape — and divide by the contained side's size per direction.
    *
    * Row-for-row equal to the two-pass split: same inner-join semantics
    * (a pair missing either side's set drops, both shapes), same
    * intersection, same divisor; a RE-probe pair that shows up in both
    * directions verifies twice against the same sizes (same doc ⇒ same
    * set) and collapses in the caller's final distinct, exactly as the
    * two-pass union did.
    */
  private[analytics] def verifyContainmentOneScan(corpusSets: DataFrame,
      deltaSets: DataFrame, candNewInOld: DataFrame,
      candOldInNew: DataFrame): DataFrame = {
    val cand = candNewInOld.withColumn("corp_b", lit(true))
      .unionByName(candOldInNew.withColumn("corp_b", lit(false)))
      .withColumn("c_id", when(col("corp_b"), col("id_b"))
        .otherwise(col("id_a")))
      .withColumn("dl_id", when(col("corp_b"), col("id_a"))
        .otherwise(col("id_b")))
    val d = deltaSets.select(col("doc_id").as("d_doc"),
      col("hs").as("d_hs"), col("sz").as("d_sz"))
    // narrow candidates build the hash side against the delta sets (both
    // delta-bounded), then the candidate-bounded result exchanges+sorts
    // on the corpus id once while the corpus table streams
    val withD = d.join(cand.hint("shuffle_hash"), col("dl_id") === col("d_doc"))
      .select(col("id_a"), col("id_b"), col("corp_b"), col("c_id"),
        col("d_hs"), col("d_sz"))
    corpusSets.select(col("doc_id").as("c_doc"), col("hs").as("c_hs"),
        col("sz").as("c_sz"))
      .join(withD.hint("merge"), col("c_doc") === col("c_id"))
      .withColumn("inter", expr("graft_sorted_and_count(c_hs, d_hs)"))
      .withColumn("containment", col("inter").cast("double") /
        when(col("corp_b"), col("d_sz")).otherwise(col("c_sz")))
      .filter(col("containment") >= 0.9)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  def qDedupContainment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (ranked, per) = containFrames(spark, dir)
    val prefixA = containPrefix(ranked)
      .select($"doc_id".as("id_a"), $"hx")
    val fullB = ranked.select($"doc_id".as("id_b"), $"hx")
    val cand = prefixA.join(fullB, "hx")
      .filter($"id_a" =!= $"id_b")
      .select($"id_a", $"id_b").distinct()
    verifyContainment(per, cand)
  }

  /** INCREMENTAL containment — the daily-ingest face: containment pairs
    * with exactly one side in today's delta (doc_id % 5 = 4, the suite's
    * delta convention), found by probing STANDING indexes with
    * delta-sized inputs only:
    *   - new-in-old: the delta's PREFIX tokens probe the corpus's full
    *     inverted index (the standing token index);
    *   - old-in-new: the delta's FULL tokens probe the corpus's PREFIX
    *     index — which is ~10% of corpus tokens, the part a production
    *     deployment persists precisely so this direction never scans
    *     corpus-sized state.
    * Both joins are O(|delta| × df) — corpus×corpus pairs never expand,
    * the [[qDedupIncremental]] argument applied to the asymmetric
    * relation. Prefix EXACTNESS is order-independent (the pigeonhole
    * holds for ANY ⌊n/10⌋+1 distinct shingles of the contained doc), so
    * df drift between index build and probe time can cost efficiency,
    * never recall — the property that makes a persisted prefix index
    * safe to probe without rebuilding on every ingest.
    */
  def qDedupContainmentIncremental(spark: SparkSession,
      dir: String): DataFrame = {
    val idx = artifactDir(spark, dir, "contain")
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("text"))
    if (!ContainIndex.hasCurrent(idx))
      ContainIndex.build(spark, docs.filter(col("doc_id") % 5 =!= 4), idx)
    ContainIndex.probe(spark, idx, docs.filter(col("doc_id") % 5 === 4))
  }

  /** [[qDedupContainmentIncremental]] with the corpus indexed in TWO
    * steps — build over doc_id % 5 < 3, then ADMIT the % 5 = 3 slice
    * ([[ContainIndex.append]]: frozen-df prefix ranking, tokens/prefix
    * as L0 accrual, sets at the modulus) — same oracle, same exact
    * answer: the prefix pigeonhole is ORDER-INDEPENDENT (any
    * ⌊n/10⌋+1 distinct shingles of a contained doc hit the index), so
    * ranking the admitted slice's prefixes by the build-time df instead
    * of the full-corpus df can cost candidate efficiency, never recall,
    * and the verify is exact containment either way. The one oracled
    * row that drives the containment ADMISSION path (incl. both L0
    * probe legs) every round.
    */
  def qDedupContainmentAdmitted(spark: SparkSession,
      dir: String): DataFrame =
    containAdmittedFace(spark, dir, "contain-admitted")

  private def containAdmittedFace(spark: SparkSession, dir: String,
      kind: String): DataFrame = {
    val idx = artifactDir(spark, dir, kind)
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("text"))
    if (!ContainIndex.hasCurrent(idx))
      ContainIndex.build(spark, docs.filter(col("doc_id") % 5 < 3), idx)
    ContainIndex.append(spark, docs.filter(col("doc_id") % 5 === 3), idx,
      "admitted-day1")
    ContainIndex.probe(spark, idx, docs.filter(col("doc_id") % 5 === 4))
  }

  /** [[qDedupContainmentAdmitted]] on the MANIFEST carrier (own
    * `contain-adm-m` family) — with [[qDedupEmbeddingAdmittedManifest]]
    * this puts ALL THREE families' manifest admissions under the
    * driver's hash gate, not just the dedup family's (the spec pins
    * parity; these rows pin the VALUES every round).
    */
  def qDedupContainmentAdmittedManifest(spark: SparkSession,
      dir: String): DataFrame =
    withManifestCarrier(spark) {
      containAdmittedFace(spark, dir, "contain-adm-m")
    }

  /** [[qDedupContainmentIncremental]] after a TAKEDOWN of the corpus's
    * doc_id % 7 = 3 slice — deletion under the ASYMMETRIC two-direction
    * probe (a tombstoned corpus doc must vanish from pairs whether it
    * is the contained `id_a` or the containing `id_b`). Same
    * own-family + unconditional-idempotent-delete shape as
    * [[qDedupIncrementalTakedown]].
    */
  def qDedupContainmentTakedown(spark: SparkSession,
      dir: String): DataFrame = {
    val idx = artifactDir(spark, dir, "contain-td")
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    if (!ContainIndex.hasCurrent(idx))
      ContainIndex.build(spark, corpus, idx)
    ContainIndex.delete(spark, idx,
      corpus.filter(col("doc_id") % 7 === 3).select(col("doc_id")),
      "takedown-mod7-3")
    ContainIndex.probe(spark, idx, docs.filter(col("doc_id") % 5 === 4))
  }

  /** The artifact-free in-session face of
    * [[qDedupContainmentIncremental]] — ranks prefixes by LIVE
    * (corpus ∪ delta) df where the artifact path probes under the frozen
    * corpus df; `ContainIndexSpec` pins the two equal (the pigeonhole's
    * order-independence), which requires this independent derivation to
    * keep existing.
    */
  private[graft] def containmentIncrementalInSession(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val (ranked, per) = containFrames(spark, dir)
    val isDelta = $"doc_id" % 5 === 4
    val prefix = containPrefix(ranked)
    val newInOld = prefix.filter(isDelta).select($"doc_id".as("id_a"), $"hx")
      .join(ranked.filter(!isDelta).select($"doc_id".as("id_b"), $"hx"), "hx")
    val oldInNew = prefix.filter(!isDelta).select($"doc_id".as("id_a"), $"hx")
      .join(ranked.filter(isDelta).select($"doc_id".as("id_b"), $"hx"), "hx")
    val cand = newInOld.unionByName(oldInNew)
      .select($"id_a", $"id_b").distinct()
    verifyContainment(per, cand)
  }

  // --------------------------------------------------------------- SimHash

  /** SimHash near-dup: 32-bit bit-majority sketch over polynomial shingle
    * hashes (mod 2^31−1 — exact in both engines), pairs at hamming ≤ 3.
    *
    * Pair generation is DETERMINISTIC pigeonhole banding, not a join over
    * all pairs: the sketch splits into 4 disjoint 8-bit bands; a pair with
    * ≤ 3 differing bits cannot differ in all 4 bands, so every qualifying
    * pair matches exactly on ≥ 1 band. Candidates = shuffle equi-join on
    * (band, band_bits); verify = one `bit_count(xor)` per bucket-mate pair;
    * multi-band matches dedupe with a final distinct. Output is provably
    * identical to the all-pairs scan (which at 100× the corpus is 125 G
    * pairs; bucket-mates scale with near-dup density instead). At larger
    * corpora widen the sketch (64-bit, 16-bit bands) — same plan shape.
    */
  /** BOTH simhash sketches (32-bit and 60-bit), one row per doc, as a
    * durable chain table — computed in ONE pass over the shingle chain
    * (a single ObjectHashAggregate carrying two
    * `TypedImperativeAggregate`s with map-side partial merge). The
    * sketch is 1 row/doc, so materializing it turns every simhash
    * consumer from "shuffle the full multi-million-row shingle set,
    * then aggregate" (the per-run tax the r16 verdict flagged:
    * q_dedup_simhash 0.195 → ~0.43 s after the shingle chain moved
    * from a doc_id-partitioned heap cache to parquet, whose read
    * loses the partitioning and re-shuffles per run) into "read a
    * corpus-cardinality parquet and band-join it". Same architecture
    * as the minhash pair chain and the ANN artifacts: sketches are
    * standing-index state, sessions load them, they don't re-derive
    * them — at 100 TB re-simhashing the corpus per query was never
    * the plan.
    */
  private def simhashSketches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    chainTable(spark, dir, "simhash") {
      docShingles(spark, dir)
        .select($"doc_id", $"hp",
          ($"hp" % lit(1073741824L) +
            ($"hp2" % lit(1073741824L)) * lit(1073741824L)).as("h60"))
        .groupBy($"doc_id")
        .agg(expr("graft_simhash32(hp)").as("sim32"),
          expr("graft_simhash60(h60)").as("sim60"))
    }
  }

  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // docShingles is distinct on SHINGLE STRINGS before hashing (exactly
    // the oracle's set semantics — the bit-majority REQUIRES the set);
    // the sketch itself loads from the durable chain ([[simhashSketches]]
    // — corpus-cardinality); persisted because BOTH self-join sides scan
    // it. The repartition is load-bearing: the sketch parquet is ONE
    // small file, so without it the scan is a single split and the
    // whole explode→join→partial-distinct pipeline (the multi-million
    // candidate mass) runs on ONE task — measured 1.2–2.2 s vs ~0.3 s
    // 32-way; the shuffle being repartitioned is 1 row/doc, noise
    val sim = simhashSketches(spark, dir)
      .select($"doc_id", $"sim32".as("sim"))
      // explicit count: see containSh — the spread feeds the post-cache
      // explode+self-join whose mass the pre-explode stats cannot see;
      // cached-plan AQE coalescing collapsed it (q_dedup_simhash
      // 0.34 → 0.90 s measured r22)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = sim.select($"doc_id", $"sim",
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright($"sim", 8 * b).bitwiseAND(lit(255L)).as("bits"))): _*))
        .as("bb"))
      .select($"doc_id", $"sim", $"bb.band".as("band"), $"bb.bits".as("bits"))
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bits" === $"b.bits" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        expr("bit_count(a.sim ^ b.sim)").cast("long").as("hamming"))
      .filter($"hamming" <= 3)
      .distinct()
  }

  /** The CORPUS-SCALE simhash face (SCALE.md band-shape law, measured at
    * 10×: the 32-bit sketch's 8-bit bands cap band-value cardinality at
    * 2⁸ and go quadratic once bucket occupancy grows): 60 reproducible
    * bits — two independent 31-bit polynomial streams (`graft_poly_hash`,
    * `graft_poly_hash2`), 30 bits each — banded 4×15, so each band ranges
    * over 2¹⁵ values and bucket occupancy stays density-bound two orders
    * of magnitude deeper into corpus growth. Hamming ≤ 3 over 60 bits is
    * the same pigeonhole guarantee (≤ 3 differing bits cannot touch all 4
    * bands); the tighter relative threshold (3/60 vs 3/32) is the point —
    * at corpus scale the wide sketch separates near-dups from the noise
    * floor that the 32-bit sketch's collision mass swamps. Same plan
    * shape as [[qDedupSimhash]]: band equi-join, xor-popcount verify,
    * cross-band distinct.
    */
  def qDedupSimhash64(spark: SparkSession, dir: String): DataFrame =
    simhash60Pairs(spark, dir, bands = 4)

  /** The 60-bit simhash engine at a CONFIGURABLE band count — the
    * SCALE.md band-shape knob as a parameter instead of a code edit.
    * Output is EXACTLY the hamming ≤ 3 pair set for every legal shape
    * (pigeonhole: ≤ 3 differing bits cannot touch all `bands` bands when
    * `bands ≥ 4`, so every qualifying pair still collides somewhere; the
    * verify stage re-checks the full sketch), which `SimhashBandsSpec`
    * pins — band count trades bucket cardinality (2^(60/bands)) against
    * rows scanned per band, it never moves the answer. Rides the shared
    * [[docShingles]] cache (which carries BOTH polynomial streams
    * precisely for this consumer): the 60-bit value is a cheap scalar
    * combine of the cached hashes — no second corpus scan.
    */
  def simhash60Pairs(spark: SparkSession, dir: String,
      bands: Int): DataFrame = {
    require(bands >= 4, s"hamming<=3 pigeonhole needs >= 4 bands, got $bands")
    require(60 % bands == 0, s"bands=$bands must divide the 60-bit sketch")
    val width = 60 / bands
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // repartition: single-file sketch scan → 32-way pipeline (see
    // [[qDedupSimhash]])
    val sim = simhashSketches(spark, dir)
      .select($"doc_id", $"sim60".as("sim"))
      // explicit count: see qDedupSimhash's spread note
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = sim.select($"doc_id", $"sim",
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright($"sim", width * b)
            .bitwiseAND(lit((1L << width) - 1)).as("bits"))): _*))
        .as("bb"))
      .select($"doc_id", $"sim", $"bb.band".as("band"), $"bb.bits".as("bits"))
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bits" === $"b.bits" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        expr("bit_count(a.sim ^ b.sim)").cast("long").as("hamming"))
      .filter($"hamming" <= 3)
      .distinct()
  }

  // ---------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-dup pairs (cos ≥ 0.46, exact double cosine) —
    * the EXACT baseline, all-pairs by necessity.
    *
    * Why this one stays quadratic (measured, sf0.01/sf0.1 driver data): the
    * qualifying pairs are the extreme tail of the random-cosine
    * distribution — max observed cos is 0.60 and the bulk sits at
    * 0.46–0.55, i.e. 3.7–4.8σ for 64-dim noise (σ = 1/√64 = 0.125). There
    * is no margin between "near-dup" and "noise": a sign-LSH bit agrees
    * with probability 1−θ/π ≈ 0.652 for a qualifying pair vs 0.5 for a
    * random one, and no (bands, rows) setting of that ratio yields both
    * recall ≈ 1 and pruning > 1 (recall b·p_min^r ≥ ~12 forces
    * b·0.5^r ≥ ~12·(0.5/0.652)^r, which exceeds 1 until r ≈ 18 and then
    * needs b ≈ 30 000). Exactness at a noise-floor threshold is inherently
    * all-pairs; the broadcast NLJ over the codegen'd `graft_dot` kernel IS
    * the optimal plan for it. The scale path is [[qDedupEmbeddingLsh]]:
    * accept LSH-defined recall, which is what production near-dup systems
    * do — at a REAL near-dup threshold (cos ≥ 0.9 on data with planted
    * duplicates) the same banded plan prunes thousands-fold.
    *
    * Ascending-index summation in [[graft.functions.ArrayDotProduct]] keeps
    * results bit-identical to the oracle's sequential fold.
    */
  /** Fail-fast guard for the exact all-pairs baseline: N² cosines and an
    * N-row broadcast are fine at corpus-sample sizes and an executor-OOM /
    * cluster-melt at corpus sizes, so refuse to even START the quadratic
    * plan past a bound. `spark.read.parquet(...).count()` IS a distributed
    * job (one task per file split), but it answers from row-group METADATA
    * — zero column IO — so its cost scales with file count, not data
    * volume: milliseconds here, a listing-bound footer sweep at corpus
    * scale, and either is negligible next to the N² plan it guards. Bound
    * override (specs, deliberate big-sample runs): system property
    * `graft.dedup.exact.maxRows`.
    */
  private def gateExactAllPairs(spark: SparkSession, dir: String): Unit = {
    val maxRows = sys.props.get("graft.dedup.exact.maxRows")
      .map(_.toLong).getOrElse(100000L)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    require(n <= maxRows,
      s"q_dedup_embedding is the EXACT all-pairs baseline (O(N^2) cosines, " +
      s"O(N) broadcast): $n embeddings exceeds the $maxRows-row gate. " +
      s"Use q_dedup_embedding_lsh (banded SRP, no quadratic join) at scale, " +
      s"or raise -Dgraft.dedup.exact.maxRows for a deliberate exact run.")
  }

  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    gateExactAllPairs(spark, dir)
    val e = table(spark, dir, "embeddings")
      .select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
    val a = e.select($"vec_id".as("id_a"), $"v".as("va"), $"nrm".as("na"))
    val b = e.select($"vec_id".as("id_b"), $"v".as("vb"), $"nrm".as("nb"))
    a.join(broadcast(b), $"id_a" < $"id_b")
      .withColumn("cos", expr("graft_dot(va, vb)") / ($"na" * $"nb"))
      .filter($"cos" >= 0.46)
      .select($"id_a", $"id_b", $"cos")
  }

  /** Banded sign-LSH (SRP) embedding near-dup — the 100 TB plan shape.
    * Semantics: pairs that collide in ≥ 1 signature band AND have exact
    * cos ≥ 0.46; the DuckDB oracle reproduces the identical pipeline (the
    * hyperplane matrix is a deterministic seeded literal embedded in both
    * plans), so the result is hash-exact by construction while the recall
    * relative to [[qDedupEmbedding]] is the honestly-modeled LSH recall.
    *
    * Shape: 32 Rademacher (±1) hyperplanes → 32 sign bits → 8 bands × 4
    * bits; candidates from a shuffle equi-join on (band, bits); exact
    * double-cosine verify via the `graft_dot` kernel; distinct to dedupe
    * multi-band collisions. No all-pairs join anywhere in the plan.
    *
    * Parameter note (see [[qDedupEmbedding]] for the measured data): at
    * this dataset's noise-floor threshold, 8×4 gives modeled recall
    * ≈ 1−(1−0.652⁴)⁸ ≈ 0.80 and ~2.5× candidate pruning — deliberately
    * recall-leaning. At a production threshold (cos ≥ 0.9 ⇒ bit-agree
    * p ≈ 0.856) the same pipeline at 64 bands × 16 bits gives recall 0.996
    * with ~1000× pruning; band shape is a config, not a code change.
    */
  def qDedupEmbeddingLsh(spark: SparkSession, dir: String): DataFrame =
    srpBandedPairs(spark, dir, Srp.Narrow)

  /** The CORPUS-SCALE SRP face (the `q_dedup_simhash64` treatment applied
    * to embeddings — SCALE.md measured the 4-bit bands of
    * [[qDedupEmbeddingLsh]] at ×20.9 for 10× data): 128 seeded hyperplanes
    * → 8 bands × 16 bits. A band now ranges over 2¹⁶ values instead of 2⁴,
    * so bucket occupancy on background (near-orthogonal) vectors stays
    * density-bound ~4 orders of magnitude deeper into corpus growth — at
    * 2¹⁶ ≥ N the expected background bucket-mate count per band is
    * ~N²/2¹⁷, i.e. the candidate join touches near-dups plus birthday
    * collisions, not the corpus square.
    *
    * Recall is the honest price and is threshold-dependent (bit-agree
    * p = 1 − θ/π): at this dataset's noise-floor cos ≥ 0.46 (p ≈ 0.652) a
    * 16-bit band matches with p¹⁶ ≈ 1.1e-3 — near-zero recall, because
    * nothing separates "near-dup" from noise here (see
    * [[qDedupEmbedding]]); at a production near-dup threshold cos ≥ 0.9
    * (p ≈ 0.856) recall is 1−(1−p¹⁶)⁸ ≈ 0.50, and doubling bands to 16
    * (256 planes — band shape is a config, not a code change) gives 0.75.
    * The oracle replays the identical seeded pipeline, so the row is
    * hash-exact at ANY recall; this query's job is pinning the band shape
    * whose candidate volume survives 100× corpus growth.
    */
  def qDedupEmbeddingLsh64(spark: SparkSession, dir: String): DataFrame =
    srpBandedPairs(spark, dir, Srp.Wide)

  /** The banded-SRP engine at a CONFIGURABLE shape — the SCALE.md tuning
    * table as a parameter. Because the plane stream is GLOBAL (plane p is
    * the same hyperplane in every shape), a shape's bands are a PREFIX of
    * any wider same-rowsPerBand shape's bands, so growing `bands` only
    * ADDS candidate buckets: output(b₁×r) ⊆ output(b₂×r) for b₁ ≤ b₂ —
    * recall grows monotonically with bands, pinned in `SrpShapeSpec`.
    * Every output pair is exact-cosine-verified regardless of shape.
    */
  def srpPairs(spark: SparkSession, dir: String, bands: Int,
      rowsPerBand: Int): DataFrame =
    srpBandedPairs(spark, dir,
      SrpShape(bands * rowsPerBand, bands, rowsPerBand))

  /** Shared banded-SRP engine: `shape.planes` sign bits packed 64/word by
    * the [[graft.functions.SrpSignature]] kernel (one codegen'd call per
    * word — the former 32 unrolled `graft_dot(v, array(±1,…)) >= 0`
    * subtrees were a giant codegen unit), band values shift/masked from
    * the packed words, candidates from a shuffle equi-join on
    * (band, bits), exact double-cosine verify via `graft_dot`, distinct
    * to dedupe multi-band collisions. No all-pairs join anywhere in the
    * plan, for any shape.
    */
  /** (vec_id, v, nrm, band, bits) — one row per vector per band, persisted
    * (both sides of the candidate self-join scan it). */
  /** (vec_id, v, nrm) from a `(vec_id, embedding)` frame — the vector
    * face both the in-session banded frames and the durable [[SrpIndex]]
    * artifact build from.
    */
  private[analytics] def srpVectorsOf(spark: SparkSession,
      vecs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    vecs.select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  /** `shape`'s (vec_id, band, bits) band keys for a [[srpVectorsOf]]
    * frame — the posting rows the durable index persists.
    */
  private[analytics] def srpBandsOf(spark: SparkSession, vectors: DataFrame,
      shape: SrpShape): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val sigCols = (0 until shape.words).map { w =>
      val signsLit = typedlit((w * 64 until math.min((w + 1) * 64,
        shape.planes)).map(p =>
        (0 until Srp.Dims).map(d => Srp.sign(p, d).toDouble)))
      call_function("graft_srp_sig", $"v", signsLit).as(s"sig$w")
    }
    vectors.select($"vec_id" +: sigCols: _*)
      .select($"vec_id",
        explode(array((0 until shape.bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col(s"sig${shape.wordOf(b)}"), shape.shiftOf(b))
              .bitwiseAND(lit((1L << shape.rowsPerBand) - 1)).as("bits"))): _*))
          .as("bb"))
      .select($"vec_id", $"bb.band".as("band"), $"bb.bits".as("bits"))
  }

  private def srpBanded(spark: SparkSession, dir: String,
      shape: SrpShape): DataFrame = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val e = srpVectorsOf(spark,
      table(spark, dir, "embeddings").select($"vec_id", $"embedding"))
    val sigCols = (0 until shape.words).map { w =>
      val signsLit = typedlit((w * 64 until math.min((w + 1) * 64,
        shape.planes)).map(p =>
        (0 until Srp.Dims).map(d => Srp.sign(p, d).toDouble)))
      call_function("graft_srp_sig", $"v", signsLit).as(s"sig$w")
    }
    e.select($"vec_id" +: $"v" +: $"nrm" +: sigCols: _*)
      .select($"vec_id", $"v", $"nrm",
        explode(array((0 until shape.bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col(s"sig${shape.wordOf(b)}"), shape.shiftOf(b))
              .bitwiseAND(lit((1L << shape.rowsPerBand) - 1)).as("bits"))): _*))
          .as("bb"))
      .select($"vec_id", $"v", $"nrm",
        $"bb.band".as("band"), $"bb.bits".as("bits"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  private def srpBandedPairs(spark: SparkSession, dir: String,
      shape: SrpShape): DataFrame = {
    import spark.implicits._
    val banded = srpBanded(spark, dir, shape)
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bits" === $"b.bits" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"),
        (expr("graft_dot(a.v, b.v)") / ($"a.nrm" * $"b.nrm")).as("cos"))
      .filter($"cos" >= 0.46)
      .distinct()
  }

  /** INCREMENTAL embedding near-dup — the SRP counterpart of
    * [[qDedupIncremental]]'s daily-ingest shape: the delta (vec_id % 5
    * = 4, today's embedding batch) probes the STANDING corpus's banded
    * SRP index by equi-join on (band, bits), so corpus×corpus pairs are
    * never expanded and re-running ingest costs O(|delta| + matches),
    * not O(|corpus|²). At 100 TB the corpus band table is the persisted
    * index (bucketed by (band, bits)); the delta's bands shuffle to it
    * and nothing else moves. Shares [[srpBanded]]'s cached frame (and
    * therefore plan-cache identity) with [[qDedupEmbeddingLsh]] — the
    * batch and ingest faces price one signature build between them.
    * Semantics mirror the batch face: band collision AND exact
    * cos ≥ 0.46, both replayed bit-identically by the oracle, so the row
    * is hash-exact at the shape's honest recall.
    */
  def qDedupEmbeddingIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // resolves through the persisted SRP artifact, completing the
    // durable-index family (DedupIndex / ContainIndex / SrpIndex) for
    // every oracled incremental face — fingerprint-keyed,
    // build-once-probe-thereafter (`DedupArtifactResolveSpec`)
    val fp = AnnIndex.sourceFingerprint(spark, s"$dir/embeddings.parquet")
    val idx = s"${SimilarityQueries.indexRoot}/srp-$fp"
    val vecs = table(spark, dir, "embeddings").select($"vec_id", $"embedding")
    // Narrow EXPLICITLY (not the build default): the DuckDB oracle
    // replays the seeded 8×4 pipeline, so this face must band-match it.
    // Production builds take the default corpus-scale Wide shape —
    // recorded in the artifact, replayed by every probe (SrpIndexSpec
    // pins Wide-artifact pair parity).
    if (!SrpIndex.hasCurrent(idx))
      SrpIndex.build(spark, vecs.filter($"vec_id" % 5 =!= 4), idx,
        Srp.Narrow)
    SrpIndex.probe(spark, idx, vecs.filter($"vec_id" % 5 === 4))
  }

  /** [[qDedupEmbeddingIncremental]] with the corpus indexed in TWO
    * steps — build over vec_id % 5 < 3, then ADMIT the % 5 = 3 slice
    * ([[SrpIndex.append]]: vectors at the modulus, bands as L0
    * accrual) — same oracle, same bit-exact answer: SRP banding is
    * deterministic per vector at the recorded shape, so the two-step
    * corpus carries identical band content and the probe's base+L0
    * union legs must reproduce the one-shot build's pairs. The
    * embedding member of the oracled ADMISSION trio (see
    * [[qDedupAdmitted]]).
    */
  def qDedupEmbeddingAdmitted(spark: SparkSession,
      dir: String): DataFrame =
    embeddingAdmittedFace(spark, dir, "srp-admitted")

  private def embeddingAdmittedFace(spark: SparkSession, dir: String,
      kind: String): DataFrame = {
    import spark.implicits._
    val fp = AnnIndex.sourceFingerprint(spark, s"$dir/embeddings.parquet")
    val idx = s"${SimilarityQueries.indexRoot}/$kind-$fp"
    val vecs = table(spark, dir, "embeddings").select($"vec_id", $"embedding")
    if (!SrpIndex.hasCurrent(idx))
      SrpIndex.build(spark, vecs.filter($"vec_id" % 5 < 3), idx,
        Srp.Narrow)
    SrpIndex.append(spark, vecs.filter($"vec_id" % 5 === 3), idx,
      "admitted-day1")
    SrpIndex.probe(spark, idx, vecs.filter($"vec_id" % 5 === 4))
  }

  /** [[qDedupEmbeddingAdmitted]] on the MANIFEST carrier (own
    * `srp-adm-m` family) — see [[qDedupContainmentAdmittedManifest]].
    */
  def qDedupEmbeddingAdmittedManifest(spark: SparkSession,
      dir: String): DataFrame =
    withManifestCarrier(spark) {
      embeddingAdmittedFace(spark, dir, "srp-adm-m")
    }

  /** [[qDedupEmbeddingIncremental]] after a TAKEDOWN — the embedding
    * family's deletion face, completing the oracled takedown trio
    * (dedup / containment / embedding): a deterministic slice of the
    * indexed corpus (vec_id % 8 = 6 — chosen to intersect the pair
    * mass at BOTH gate scales: drops 1 of sf0.01's 2 pairs and 2 of
    * sf0.1's 21, so the row is non-vacuous everywhere) is tombstoned
    * ([[SrpIndex.delete]], the [[IndexTombstones]] logical phase) and
    * the probe must report exactly the pairs whose corpus side
    * SURVIVES. Own artifact family (`srp-td`) so the shared `srp`
    * artifact stays un-deleted; the delete runs unconditionally every
    * time and converges by deltaId idempotence. Delta ids (% 5 = 4)
    * are never in the tombstone set (it is drawn from the corpus
    * slice), so the oracle's one-sided corpus exclusion is exact.
    */
  def qDedupEmbeddingTakedown(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val fp = AnnIndex.sourceFingerprint(spark, s"$dir/embeddings.parquet")
    val idx = s"${SimilarityQueries.indexRoot}/srp-td-$fp"
    val vecs = table(spark, dir, "embeddings").select($"vec_id", $"embedding")
    val corpus = vecs.filter($"vec_id" % 5 =!= 4)
    if (!SrpIndex.hasCurrent(idx))
      SrpIndex.build(spark, corpus, idx, Srp.Narrow)
    // the deltaId ENCODES the slice: a changed predicate must not no-op
    // against an artifact that applied the old one under the same id
    SrpIndex.delete(spark, idx,
      corpus.filter($"vec_id" % 8 === 6).select($"vec_id"),
      "takedown-mod8-6")
    SrpIndex.probe(spark, idx, vecs.filter($"vec_id" % 5 === 4))
  }

  /** [[qDedupEmbeddingIncremental]] at the DEFAULT corpus-scale Wide
    * shape (8×16-bit, the [[SrpIndex.build]] default) — drives the
    * production SRP artifact path through the driver's hash gate. Own
    * artifact dir (`srpw-` prefix; the shape is recorded per artifact).
    * The oracle replays the identical seeded 128-plane banding in
    * DuckDB, so the row is hash-exact at ANY recall — Wide's honest
    * near-zero recall at this corpus's noise-floor threshold is itself
    * part of what the row pins (see [[qDedupEmbeddingLsh64]]).
    */
  def qDedupEmbeddingIncrementalWide(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val fp = AnnIndex.sourceFingerprint(spark, s"$dir/embeddings.parquet")
    val idx = s"${SimilarityQueries.indexRoot}/srpw-$fp"
    val vecs = table(spark, dir, "embeddings").select($"vec_id", $"embedding")
    if (!SrpIndex.hasCurrent(idx))
      SrpIndex.build(spark, vecs.filter($"vec_id" % 5 =!= 4), idx)
    SrpIndex.probe(spark, idx, vecs.filter($"vec_id" % 5 === 4))
  }

  /** Planted-delta parameters of [[qDedupEmbeddingWidePlanted]]: copies
    * get `vec_id + PlantOffset` (disjoint from any driver id range), the
    * per-dim rescale draws one of [[PlantPatterns]] seeded Rademacher
    * patterns off the global plane stream at [[PlantSeed]] (far past any
    * signature plane index, so planted noise is independent of every
    * banding), and the ±[[PlantWobble]] amplitude puts exact
    * cos(v, v·(1 ± w)) near 1/√(1+w²) ≈ 0.958 — ABOVE the 0.9
    * production threshold the Wide S-curve recovers at.
    */
  private[graft] val PlantOffset = 10000000L
  private val PlantPatterns = 4
  private val PlantSeed = 4096
  private val PlantWobble = 0.3

  /** The coefficient 1 ± wobble for pattern `k`, dim `d` — ONE
    * definition emitting both the Spark literal and the oracle's SQL
    * text, so the two plans perturb bit-identically.
    */
  private def plantCoef(k: Int, d: Int): Double =
    if (Srp.sign(PlantSeed + k, d) > 0) 1.0 + PlantWobble
    else 1.0 - PlantWobble

  /** The planted near-dup delta: the `vec_id % 10 == 0` corpus slice,
    * re-identified past [[PlantOffset]], each vector rescaled per-dim by
    * its pattern's coefficients (computed in DOUBLE on both sides — the
    * float→double widening happens before the multiply, so Spark and
    * the DuckDB oracle see bit-identical planted vectors and therefore
    * bit-identical SRP signatures).
    */
  private[graft] def plantedDelta(vecs: DataFrame): DataFrame = {
    val pats = (0 until PlantPatterns).map { k =>
      array((0 until Srp.Dims).map(d => lit(plantCoef(k, d))): _*)
    }
    // pattern selector on vec_id/10 (the slice index), NOT vec_id: the
    // % 10 == 0 slice makes vec_id always even, so a vec_id % 4 selector
    // could only ever fire patterns 0 and 2 — half the seeded diversity
    // dead. The oracle's CASE replays the same (src // 10) % 4.
    val sel = expr(s"(vec_id div 10) % $PlantPatterns")
    val coef = (1 until PlantPatterns)
      .foldLeft(when(sel === 0, pats(0))) {
        (w, k) => w.when(sel === k, pats(k))
      }.otherwise(pats(0)) // unreachable: % covers 0 until PlantPatterns
    vecs.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + PlantOffset).as("vec_id"),
        zip_with(transform(col("embedding"), _.cast("double")), coef,
          (a, b) => a * b).as("embedding"))
  }

  /** The Wide shape at a PRODUCTION near-dup threshold with PLANTED
    * expected pairs — the row that makes the Wide S-curve recovery claim
    * carry a green driver hash (r13 verdict #4): [[qDedupEmbeddingLsh64]]
    * honestly shows near-zero Wide recall at this corpus's noise-floor
    * cos ≥ 0.46, and THIS face shows the same 8×16 banding recovering
    * recall where real duplicate mass lives. Corpus = ALL embeddings in
    * a Wide-default durable [[SrpIndex]] artifact (own `srpwp-` dir);
    * delta = [[plantedDelta]]'s copies at exact cos ≈ 0.958; output =
    * verified (corpus_id, new_id, cos ≥ 0.9) matches.
    *
    * Recall model vs measurement: at cos 0.958 a sign bit agrees with
    * p = 1 − acos(0.958)/π ≈ 0.908, a 16-bit band matches at p¹⁶ ≈ 0.21,
    * and 8 bands give 1−(1−p¹⁶)⁸ ≈ 0.85 — the oracle replays the
    * identical seeded pipeline, so the row is hash-exact at whatever
    * recall the S-curve actually delivers (measured sf0.1: see SCALE.md
    * round-15 planted-recall row; `SrpPlantedRecallSpec` bounds it).
    */
  def qDedupEmbeddingWidePlanted(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val fp = AnnIndex.sourceFingerprint(spark, s"$dir/embeddings.parquet")
    val idx = s"${SimilarityQueries.indexRoot}/srpwp-$fp"
    val vecs = table(spark, dir, "embeddings").select($"vec_id", $"embedding")
    if (!SrpIndex.hasCurrent(idx)) SrpIndex.build(spark, vecs, idx)
    SrpIndex.probe(spark, idx, plantedDelta(vecs))
      .filter($"cos" >= 0.9)
  }

  /** The artifact-free in-session face of [[qDedupEmbeddingIncremental]]
    * (shared [[srpBanded]] cache, no disk round-trip) — `SrpIndexSpec`'s
    * independent reference, same reasoning as [[incrementalInSession]].
    */
  private[graft] def embeddingIncrementalInSession(spark: SparkSession,
      dir: String, shape: SrpShape = Srp.Narrow): DataFrame = {
    import spark.implicits._
    val banded = srpBanded(spark, dir, shape)
    val corpus = banded.filter($"vec_id" % 5 =!= 4)
    val delta = banded.filter($"vec_id" % 5 === 4)
    corpus.as("a").join(delta.as("b"),
        $"a.band" === $"b.band" && $"a.bits" === $"b.bits")
      .select($"a.vec_id".as("corpus_id"), $"b.vec_id".as("new_id"),
        (expr("graft_dot(a.v, b.v)") / ($"a.nrm" * $"b.nrm")).as("cos"))
      .filter($"cos" >= 0.46)
      .distinct()
  }

  /** SRP band-shape instrumentation (the [[nearDupStats]] counterpart for
    * sign-LSH — SCALE.md's SRP row): bucket-mate pair count from bucket
    * OCCUPANCIES (Σ n·(n−1)/2 — the verify-stage workload, counted
    * without materializing the join) + the verified pair count.
    */
  def srpStats(spark: SparkSession, dir: String, bands: Int,
      rowsPerBand: Int): (Long, Long, Long) = {
    import spark.implicits._
    val shape = SrpShape(bands * rowsPerBand, bands, rowsPerBand)
    val banded = srpBanded(spark, dir, shape)
    val cand = banded.groupBy($"band", $"bits")
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(sum($"n" * ($"n" - 1) / 2), lit(0L)).cast("long"))
      .first().getLong(0)
    val verified = srpBandedPairs(spark, dir, shape).count()
    val vecs = table(spark, dir, "embeddings").count()
    banded.unpersist()
    (vecs, cand, verified)
  }

  /** Deterministic seeded Rademacher hyperplanes shared by the Spark plan
    * and the generated DuckDB oracle SQL. splitmix64-style finalizer —
    * public-domain PRNG construction (Steele et al., "Fast splittable
    * pseudorandom number generators").
    */
  /** A banded-SRP signature layout. Sign bits pack 64 to a long word, and
    * a band must never straddle a word (`64 % rowsPerBand == 0`), so band
    * `b`'s value is one shift/mask of word `wordOf(b)` — in Spark and in
    * the generated oracle alike. The plane index stream is GLOBAL (plane
    * `p` means the same hyperplane in every shape), so widening a shape
    * extends the signature rather than reseeding it.
    */
  private[graft] final case class SrpShape(planes: Int, bands: Int,
      rowsPerBand: Int) {
    require(planes == bands * rowsPerBand,
      s"SrpShape: $bands bands x $rowsPerBand rows != $planes planes")
    require(rowsPerBand > 0 && 64 % rowsPerBand == 0,
      s"SrpShape: rowsPerBand=$rowsPerBand must divide the 64-bit word")
    val words: Int = (planes + 63) / 64
    def wordOf(b: Int): Int = b * rowsPerBand / 64
    def shiftOf(b: Int): Int = b * rowsPerBand % 64
  }

  private[graft] object Srp {
    /** [[qDedupEmbeddingLsh]]: recall-leaning at the noise-floor
      * threshold (modeled ≈ 0.80 at cos ≥ 0.46). */
    val Narrow: SrpShape = SrpShape(planes = 32, bands = 8, rowsPerBand = 4)
    /** [[qDedupEmbeddingLsh64]]: corpus-scale candidate volume (2¹⁶ band
      * values keep buckets density-bound). */
    val Wide: SrpShape = SrpShape(planes = 128, bands = 8, rowsPerBand = 16)
    val Dims = 64

    private def mix64(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    /** ±1 sign of hyperplane `p`, dimension `d`. */
    def sign(p: Int, d: Int): Int =
      if ((mix64(p.toLong * Dims + d) >>> 63) == 1L) 1 else -1

    /** DuckDB: explicit left-assoc sum `±e[1] ±e[2] …` (1-indexed) —
      * ascending-index summation in the [[graft.functions.SrpSignature]]
      * kernel matches this `+` chain bit-for-bit (±1 products are exact;
      * adds occur in the same order). */
    def duckPlaneDot(p: Int): String =
      (0 until Dims).map { d =>
        val s = if (sign(p, d) > 0) "+" else "-"
        s"$s e[${d + 1}]"
      }.mkString(" ")
  }

  /** The end-to-end curation funnel — the operators of this engine
    * COMPOSED the way a training-data pipeline runs them: language filter
    * → Gopher quality rules → exact-dedup keeper → near-dup keeper
    * (corpus-wide LSH components), reporting survivors per stage.
    *
    * Composition notes: the Gopher metrics run on the language survivors
    * only (each stage consumes the previous); exact keeper = min doc_id
    * per SHA-256 digest among quality survivors (a window, no extra
    * scan); near-dup non-keepers come from [[qDedupComponents]] — the
    * corpus-wide pair graph (near-dup detection runs corpus-wide before
    * per-doc filters in a real pipeline), removed via a null-check on a
    * left join. Stage counts come from ONE pass of per-doc survival
    * flags, so each upstream operator evaluates exactly once.
    */
  def qCurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = table(spark, dir, "documents").select($"doc_id", $"lang", $"text")
    val s1 = docs.filter($"lang" === "en")
    val passing = TextQueries.gopherMetrics(s1.select($"doc_id", $"text"))
      .filter($"dup_word_frac" <= 0.85 && $"top_bigram_frac" <= 0.2 &&
        $"mean_word_len" >= 3.0 && $"mean_word_len" <= 10.0 &&
        $"n_words" >= 50L)
      .select($"doc_id", lit(true).as("q_pass"))
    val nonKeepers = qDedupComponents(spark, dir)
      .filter(!$"is_keeper").select($"doc_id", lit(true).as("near_dup"))
    // ONE linear pass: per-doc survival flags for every stage, then a
    // single aggregate. A union-of-stage-counts spelling re-evaluates the
    // shared lineage per branch (gopher metrics 3x, the digest window 2x
    // — measured 8.3 s at sf0.1 vs 5.5 s for this shape); flags make each
    // upstream operator run exactly once. The exact-keeper window runs
    // over ALL en docs with min(when(q, doc_id)) — the min over quality
    // survivors within a digest group, identical to windowing the
    // survivor subset.
    val wDigest = org.apache.spark.sql.expressions.Window
      .partitionBy($"digest")
    val flags = s1.select($"doc_id", sha2($"text", 256).as("digest"))
      .join(passing, Seq("doc_id"), "left")
      .withColumn("q", coalesce($"q_pass", lit(false)))
      .withColumn("keep_exact",
        $"q" && min(when($"q", $"doc_id")).over(wDigest) === $"doc_id")
      .join(nonKeepers, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n2"),
        sum(when($"q", 1L).otherwise(0L)).as("n3"),
        sum(when($"keep_exact", 1L).otherwise(0L)).as("n4"),
        sum(when($"keep_exact" && $"near_dup".isNull, 1L).otherwise(0L))
          .as("n5"))
    docs.agg(count(lit(1)).as("n1")).crossJoin(flags)
      .select(explode(array(
        struct(lit(1L).as("stage_no"), lit("all").as("stage"),
          $"n1".as("n_docs")),
        struct(lit(2L).as("stage_no"), lit("lang_en").as("stage"),
          $"n2".as("n_docs")),
        struct(lit(3L).as("stage_no"), lit("quality").as("stage"),
          $"n3".as("n_docs")),
        struct(lit(4L).as("stage_no"), lit("exact_keeper").as("stage"),
          $"n4".as("n_docs")),
        struct(lit(5L).as("stage_no"), lit("near_dup_keeper").as("stage"),
          $"n5".as("n_docs")))).as("s"))
      .select($"s.stage_no", $"s.stage", $"s.n_docs")
  }

  val queries: Map[String, CoreQueries.QFn] = Map(
    "q_curation_pipeline" -> qCurationPipeline,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_ngram_jaccard" -> qDedupNgramJaccard,
    "q_dedup_minhash256" -> qDedupMinhash256,
    "q_neighbor_topk" -> qNeighborTopk,
    "q_dedup_minhash_lsh" -> qDedupMinhashLsh,
    "q_dedup_incremental" -> qDedupIncremental,
    "q_dedup_admitted" -> qDedupAdmitted,
    "q_dedup_admitted_manifest" -> qDedupAdmittedManifest,
    "q_dedup_compacted" -> qDedupCompacted,
    "q_dedup_compacted_manifest" -> qDedupCompactedManifest,
    "q_dedup_incremental_takedown" -> qDedupIncrementalTakedown,
    "q_dedup_purge" -> qDedupPurge,
    "q_dedup_purge_sliced" -> qDedupPurgeSliced,
    "q_dedup_purge_sliced_manifest" -> qDedupPurgeSlicedManifest,
    "q_dedup_incremental256" -> qDedupIncremental256,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_simhash64" -> qDedupSimhash64,
    "q_dedup_embedding" -> qDedupEmbedding,
    "q_dedup_embedding_lsh" -> qDedupEmbeddingLsh,
    "q_dedup_embedding_lsh64" -> qDedupEmbeddingLsh64,
    "q_dedup_embedding_incremental" -> qDedupEmbeddingIncremental,
    "q_dedup_embedding_admitted" -> qDedupEmbeddingAdmitted,
    "q_dedup_embedding_admitted_manifest" -> qDedupEmbeddingAdmittedManifest,
    "q_dedup_embedding_takedown" -> qDedupEmbeddingTakedown,
    "q_dedup_embedding_incremental_wide" -> qDedupEmbeddingIncrementalWide,
    "q_dedup_embedding_wide_planted" -> qDedupEmbeddingWidePlanted,
    "q_dedup_components" -> qDedupComponents,
    "q_dedup_components_star" -> qDedupComponentsStar,
    "q_dedup_containment" -> qDedupContainment,
    "q_dedup_containment_incremental" -> qDedupContainmentIncremental,
    "q_dedup_containment_admitted" -> qDedupContainmentAdmitted,
    "q_dedup_containment_admitted_manifest" ->
      qDedupContainmentAdmittedManifest,
    "q_dedup_containment_takedown" -> qDedupContainmentTakedown,
    "q_split_leakage_safe" -> qSplitLeakageSafe,
    "q_dedup_keeper_quality" -> qDedupKeeperQuality
  )

  private val duckShingles =
    "list_distinct([substr(text, i::INT, 5)" +
      " FOR i IN range(1, greatest(length(text) - 4, 1) + 1)])"

  /** [[containShingleExpr]]'s DuckDB face — 16-char shingle set. */
  private val duckContainShingles =
    "list_distinct([substr(text, i::INT, 16)" +
      " FOR i IN range(1, greatest(length(text) - 15, 1) + 1)])"

  /** Inverted-index exact-jaccard pair CTEs over the 5-char shingle sets,
    * ending in `pairs(id_a, id_b, jaccard)`. Identical semantics to the
    * all-pairs `list_intersect/list_distinct(a||b)` form: unnest → shingle
    * equi-join → group-count gives |A∩B| exactly (shingle lists are
    * distinct), |A∪B| = |A|+|B|−|A∩B| arithmetically, and pairs sharing no
    * shingle (the only ones the inverted index skips) have j = 0 < thr.
    * ~40× cheaper in DuckDB (28 s → 0.7 s per evaluation at sf0.01,
    * measured): the r11 gate came back empty because five closure oracles
    * built on the quadratic form cost ~80 s apiece (66% of a 624 s suite).
    */
  private def duckJaccardPairs(thr: String,
                               pred: String = "a.doc_id < b.doc_id"): String =
    s"""sh AS MATERIALIZED (SELECT doc_id, $duckShingles AS s FROM documents),
       | shn AS MATERIALIZED (SELECT doc_id, len(s) AS n FROM sh),
       | tok AS MATERIALIZED (SELECT doc_id, unnest(s) AS t FROM sh),
       | co AS MATERIALIZED (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS inter
       |  FROM tok a JOIN tok b ON a.t = b.t AND $pred
       |  GROUP BY 1, 2),
       | pairs AS MATERIALIZED (
       |  SELECT co.id_a, co.id_b,
       |   inter::DOUBLE / (na.n + nb.n - inter) AS jaccard
       |  FROM co JOIN shn na ON co.id_a = na.doc_id
       |   JOIN shn nb ON co.id_b = nb.doc_id
       |  WHERE inter::DOUBLE / (na.n + nb.n - inter) >= $thr)""".stripMargin

  /** Inverted-index form of the containment oracle (16-char shingles,
    * |A∩B| / |A| ≥ 0.9 over docs with ≥ 20 shingles) — same rewrite as
    * [[duckJaccardPairs]]; 59.5 s → 0.8 s measured at sf0.01. */
  private def duckContainPairs(pred: String): String =
    s"""WITH csh AS MATERIALIZED (SELECT doc_id, $duckContainShingles AS s FROM documents),
       | f AS MATERIALIZED (SELECT doc_id, s, len(s) AS n FROM csh WHERE len(s) >= 20),
       | ctok AS MATERIALIZED (SELECT doc_id, unnest(s) AS t FROM f),
       | cco AS MATERIALIZED (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS inter
       |  FROM ctok a JOIN ctok b ON a.t = b.t AND $pred
       |  GROUP BY 1, 2)
       |SELECT cco.id_a, cco.id_b, inter::DOUBLE / na.n AS containment
       |FROM cco JOIN f na ON cco.id_a = na.doc_id
       |WHERE inter::DOUBLE / na.n >= 0.9""".stripMargin

  /** Oracle for the banded-SRP engine at a given shape: the same seeded
    * pipeline in SQL — sign bits from explicit left-assoc ±component sums,
    * band packing, a band-bucket join under `joinPred` (self-join for the
    * batch faces, corpus×delta for the incremental face), exact cosine
    * verify.
    */
  private def embeddingLshOracle(shape: SrpShape,
      joinPred: String = "a.vec_id < b.vec_id",
      outA: String = "id_a", outB: String = "id_b"): String = {
    val sigCols = (0 until shape.planes).map { p =>
      s"CASE WHEN (${Srp.duckPlaneDot(p)}) >= 0 THEN 1 ELSE 0 END AS p$p"
    }.mkString(",\n   ")
    val bandCase = (0 until shape.bands).map { b =>
      val bits = (0 until shape.rowsPerBand).map { r =>
        val p = b * shape.rowsPerBand + r
        if (r == 0) s"p$p" else s"${1L << r}*p$p"
      }.mkString(" + ")
      s"WHEN $b THEN $bits"
    }.mkString(" ")
    val bandList = (0 until shape.bands).map(b => s"($b)").mkString(",")
    s"""WITH v AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       | sig AS MATERIALIZED (
       |  SELECT vec_id, e,
       |   $sigCols
       |  FROM v),
       | banded AS MATERIALIZED (
       |  SELECT vec_id, e, bb.band,
       |   (CASE bb.band $bandCase END)::BIGINT AS bits
       |  FROM sig CROSS JOIN (VALUES $bandList) bb(band)),
       | cand AS MATERIALIZED (
       |  SELECT DISTINCT a.vec_id AS $outA, b.vec_id AS $outB
       |  FROM banded a JOIN banded b
       |   ON a.band = b.band AND a.bits = b.bits AND $joinPred)
       |SELECT c.$outA, c.$outB,
       | list_cosine_similarity(va.e, vb.e) AS cos
       |FROM cand c
       | JOIN v va ON va.vec_id = c.$outA
       | JOIN v vb ON vb.vec_id = c.$outB
       |WHERE list_cosine_similarity(va.e, vb.e) >= 0.46""".stripMargin
  }

  /** [[qDedupEmbeddingWidePlanted]]'s oracle: the identical planted
    * construction (same [[plantCoef]] literals, pattern chosen on the
    * SOURCE vec_id inside an inner scope so no alias shadowing), the
    * identical seeded Wide banding, verify at the production cos ≥ 0.9.
    */
  private def plantedWideOracle: String = {
    val shape = Srp.Wide
    val sigCols = (0 until shape.planes).map { p =>
      s"CASE WHEN (${Srp.duckPlaneDot(p)}) >= 0 THEN 1 ELSE 0 END AS p$p"
    }.mkString(",\n   ")
    val bandCase = (0 until shape.bands).map { b =>
      val bits = (0 until shape.rowsPerBand).map { r =>
        val p = b * shape.rowsPerBand + r
        if (r == 0) s"p$p" else s"${1L << r}*p$p"
      }.mkString(" + ")
      s"WHEN $b THEN $bits"
    }.mkString(" ")
    val bandList = (0 until shape.bands).map(b => s"($b)").mkString(",")
    val plantedDims = (0 until Srp.Dims).map { d =>
      val cases = (0 until PlantPatterns).map { k =>
        if (k == PlantPatterns - 1) s"ELSE ${plantCoef(k, d)}"
        else s"WHEN $k THEN ${plantCoef(k, d)}"
      }.mkString(" ")
      s"e[${d + 1}] * (CASE ((src // 10) % $PlantPatterns) $cases END)"
    }.mkString(",\n    ")
    s"""WITH v AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       | planted AS MATERIALIZED (
       |  SELECT src + $PlantOffset AS vec_id, e2 AS e FROM (
       |   SELECT vec_id AS src,
       |   [$plantedDims] AS e2
       |   FROM v WHERE vec_id % 10 = 0)),
       | sigc AS MATERIALIZED (
       |  SELECT vec_id, e,
       |   $sigCols
       |  FROM v),
       | sigp AS MATERIALIZED (
       |  SELECT vec_id, e,
       |   $sigCols
       |  FROM planted),
       | bc AS MATERIALIZED (
       |  SELECT vec_id, bb.band,
       |   (CASE bb.band $bandCase END)::BIGINT AS bits
       |  FROM sigc CROSS JOIN (VALUES $bandList) bb(band)),
       | bp AS MATERIALIZED (
       |  SELECT vec_id, bb.band,
       |   (CASE bb.band $bandCase END)::BIGINT AS bits
       |  FROM sigp CROSS JOIN (VALUES $bandList) bb(band)),
       | cand AS MATERIALIZED (
       |  SELECT DISTINCT a.vec_id AS corpus_id, b.vec_id AS new_id
       |  FROM bc a JOIN bp b ON a.band = b.band AND a.bits = b.bits)
       |SELECT c.corpus_id, c.new_id,
       | list_cosine_similarity(va.e, vb.e) AS cos
       |FROM cand c
       | JOIN v va ON va.vec_id = c.corpus_id
       | JOIN planted vb ON vb.vec_id = c.new_id
       |WHERE list_cosine_similarity(va.e, vb.e) >= 0.9""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_curation_pipeline" ->
      s"""WITH RECURSIVE s1 AS (
         |  SELECT doc_id, text FROM documents WHERE lang = 'en'),
         | base AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws,
         |   len(string_split(text, ' '))::BIGINT AS n_words,
         |   len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct
         |  FROM s1),
         | per_doc AS (
         |  SELECT doc_id, n_words,
         |   1.0 - n_distinct::DOUBLE / n_words::DOUBLE AS dup_word_frac,
         |   list_sum([length(w) FOR w IN ws])::DOUBLE / n_words::DOUBLE AS mean_word_len
         |  FROM base),
         | bg AS (
         |  SELECT doc_id, n_words,
         |   unnest([ws[i] || ' ' || ws[i + 1] FOR i IN range(1, len(ws))]) AS bg
         |  FROM base),
         | top_bg AS (
         |  SELECT doc_id, cnt::DOUBLE / (n_words - 1)::DOUBLE AS top_bigram_frac
         |  FROM (
         |   SELECT doc_id, n_words, bg, count(*)::BIGINT AS cnt,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, bg) AS rnk
         |   FROM bg GROUP BY 1, 2, 3)
         |  WHERE rnk = 1),
         | s2 AS (
         |  SELECT s1.doc_id, s1.text
         |  FROM s1 JOIN per_doc p ON s1.doc_id = p.doc_id
         |  JOIN top_bg t ON s1.doc_id = t.doc_id
         |  WHERE p.dup_word_frac <= 0.85 AND t.top_bigram_frac <= 0.2
         |   AND p.mean_word_len BETWEEN 3.0 AND 10.0 AND p.n_words >= 50),
         | s3 AS (
         |  SELECT doc_id FROM (
         |   SELECT doc_id, min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
         |   FROM s2)
         |  WHERE doc_id = keeper),
         | ${duckJaccardPairs("0.8")},
         | edges AS MATERIALIZED (
         |  SELECT id_a, id_b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         | reach(doc, r) AS (
         |  SELECT DISTINCT id_a, id_a FROM edges
         |  UNION
         |  SELECT e.id_a, re.r FROM reach re JOIN edges e ON e.id_b = re.doc),
         | comp AS MATERIALIZED (SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc),
         | non_keep AS (SELECT doc_id FROM comp WHERE doc_id <> component),
         | s4 AS (
         |  SELECT doc_id FROM s3
         |  WHERE doc_id NOT IN (SELECT doc_id FROM non_keep))
         |SELECT 1::BIGINT AS stage_no, 'all' AS stage, count(*) AS n_docs FROM documents
         |UNION ALL SELECT 2::BIGINT, 'lang_en', count(*) FROM s1
         |UNION ALL SELECT 3::BIGINT, 'quality', count(*) FROM s2
         |UNION ALL SELECT 4::BIGINT, 'exact_keeper', count(*) FROM s3
         |UNION ALL SELECT 5::BIGINT, 'near_dup_keeper', count(*) FROM s4""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keeper_id, count(*) AS n_dups,
        | substr(sha256(text), 1, 16) AS digest16
        |FROM documents
        |GROUP BY sha256(text), sha256(regexp_replace(lower(text), '\s+', ' ', 'g'))""".stripMargin,
    "q_dedup_ngram_jaccard" ->
      s"""WITH ${duckJaccardPairs("0.7")}
         |SELECT id_a, id_b, jaccard FROM pairs""".stripMargin,
    // identical SEMANTICS to q_dedup_ngram_jaccard (j >= 0.7 on the 5-char
    // shingle sets) — the banding is recall machinery, and on this corpus
    // (dup mass at j >= 0.93, where the 32x8 S-curve's miss probability is
    // ~4e-12) the banded output equals the exact all-pairs answer, exactly
    // as it provably does for the other banded minhash rows
    "q_dedup_minhash256" ->
      s"""WITH ${duckJaccardPairs("0.7")}
         |SELECT id_a, id_b, jaccard FROM pairs""".stripMargin,
    "q_neighbor_topk" ->
      s"""WITH ${duckJaccardPairs("0.7")},
         | e AS (
         |  SELECT id_a AS doc_id, id_b AS nbr_id, jaccard FROM pairs
         |  UNION ALL
         |  SELECT id_b AS doc_id, id_a AS nbr_id, jaccard FROM pairs),
         | r AS (
         |  SELECT doc_id, nbr_id, jaccard, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY jaccard DESC, nbr_id) AS rk
         |  FROM e)
         |SELECT doc_id, jaccard, nbr_id FROM r WHERE rk = 1""".stripMargin,
    "q_dedup_minhash_lsh" ->
      s"""WITH ${duckJaccardPairs("0.8")}
         |SELECT id_a, id_b, jaccard FROM pairs""".stripMargin,
    "q_dedup_incremental" ->
      s"""WITH ${duckJaccardPairs("0.8",
             "a.doc_id % 5 <> 4 AND b.doc_id % 5 = 4")}
         |SELECT id_a AS corpus_id, id_b AS new_id, jaccard FROM pairs""".stripMargin,
    // admitted face: build(% 5 < 3) + append(% 5 = 3) must hash-equal
    // the one-shot build over % 5 <> 4 — banding is per-doc
    // deterministic, so the oracle is qDedupIncremental's verbatim
    "q_dedup_admitted" ->
      s"""WITH ${duckJaccardPairs("0.8",
             "a.doc_id % 5 <> 4 AND b.doc_id % 5 = 4")}
         |SELECT id_a AS corpus_id, id_b AS new_id, jaccard FROM pairs""".stripMargin,
    // manifest-carrier twin: the SAME lifecycle through _carry.txt
    // reference resolution must hash-equal the same exact answer
    "q_dedup_admitted_manifest" ->
      s"""WITH ${duckJaccardPairs("0.8",
             "a.doc_id % 5 <> 4 AND b.doc_id % 5 = 4")}
         |SELECT id_a AS corpus_id, id_b AS new_id, jaccard FROM pairs""".stripMargin,
    // compacted face: build + admit + bucket-granular FOLD must still
    // hash-equal the one-shot build — compaction is multiset-invariant
    "q_dedup_compacted" ->
      s"""WITH ${duckJaccardPairs("0.8",
             "a.doc_id % 5 <> 4 AND b.doc_id % 5 = 4")}
         |SELECT id_a AS corpus_id, id_b AS new_id, jaccard FROM pairs""".stripMargin,
    "q_dedup_compacted_manifest" ->
      s"""WITH ${duckJaccardPairs("0.8",
             "a.doc_id % 5 <> 4 AND b.doc_id % 5 = 4")}
         |SELECT id_a AS corpus_id, id_b AS new_id, jaccard FROM pairs""".stripMargin,
    // takedown face: the corpus side additionally excludes the
    // tombstoned doc_id % 7 = 3 slice (delta ids are % 5 = 4, never
    // tombstoned, so the one-sided exclusion is exact)
    "q_dedup_incremental_takedown" ->
      s"""WITH ${duckJaccardPairs("0.8",
             "a.doc_id % 5 <> 4 AND a.doc_id % 7 <> 3 AND b.doc_id % 5 = 4")}
         |SELECT id_a AS corpus_id, id_b AS new_id, jaccard FROM pairs""".stripMargin,
    // the PHYSICAL phase must be reader-invisible: same exact answer as
    // the logical takedown face
    "q_dedup_purge" ->
      s"""WITH ${duckJaccardPairs("0.8",
             "a.doc_id % 5 <> 4 AND a.doc_id % 7 <> 3 AND b.doc_id % 5 = 4")}
         |SELECT id_a AS corpus_id, id_b AS new_id, jaccard FROM pairs""".stripMargin,
    // ... and so must every SLICE of the budgeted purge: same exact
    // answer again after a one-bucket-per-call purge ran to completion
    "q_dedup_purge_sliced" ->
      s"""WITH ${duckJaccardPairs("0.8",
             "a.doc_id % 5 <> 4 AND a.doc_id % 7 <> 3 AND b.doc_id % 5 = 4")}
         |SELECT id_a AS corpus_id, id_b AS new_id, jaccard FROM pairs""".stripMargin,
    // manifest twin: sliced purge + VACUUM prune, same exact answer
    "q_dedup_purge_sliced_manifest" ->
      s"""WITH ${duckJaccardPairs("0.8",
             "a.doc_id % 5 <> 4 AND a.doc_id % 7 <> 3 AND b.doc_id % 5 = 4")}
         |SELECT id_a AS corpus_id, id_b AS new_id, jaccard FROM pairs""".stripMargin,
    // RECALL DEPENDENCY (ADVICE r13): this pins the 32x8/256 LSH probe
    // against the EXACT delta-corpus answer — equality holds because the
    // fixture's true pairs all sit at j >= 0.93, where the r=8 S-curve's
    // miss probability is ~4e-12; a fixture/generator that planted pairs
    // in j in [0.8, ~0.93) could hash-fail with a CORRECT engine. The
    // gate asserts that no-pairs-in-band precondition explicitly
    // (Verify's band-recall probe), so a drift fails diagnosably there,
    // not as an opaque hash mismatch here.
    "q_dedup_incremental256" ->
      s"""WITH ${duckJaccardPairs("0.8",
             "a.doc_id % 5 <> 4 AND b.doc_id % 5 = 4")}
         |SELECT id_a AS corpus_id, id_b AS new_id, jaccard FROM pairs""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest($duckShingles) AS sh FROM documents),
         | hh AS (
         |  SELECT doc_id, list_reduce(list_prepend(7::BIGINT,
         |      [ascii(c)::BIGINT FOR c IN string_split(sh, '')]),
         |    (acc, c) -> (acc * 31 + c) % 2147483647) AS h
         |  FROM sh),
         | bits AS (
         |  SELECT doc_id, i,
         |   sum(CASE WHEN (h >> i::INT) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM hh CROSS JOIN range(0, 32) t(i) GROUP BY 1, 2),
         | simh AS (
         |  SELECT doc_id,
         |   sum(CASE WHEN s > 0 THEN (1::BIGINT << i::INT) ELSE 0 END)::BIGINT AS sim
         |  FROM bits GROUP BY 1)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | bit_count(xor(a.sim, b.sim))::BIGINT AS hamming
         |FROM simh a JOIN simh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3""".stripMargin,
    // the 60-bit wide-sketch face: two polynomial streams combined into
    // bits 0-29 / 30-59, bit-majority, all-pairs xor-popcount (the oracle
    // may be quadratic; the Spark plan is the banded equi-join)
    "q_dedup_simhash64" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest($duckShingles) AS sh FROM documents),
         | hh AS (
         |  SELECT doc_id,
         |   list_reduce(list_prepend(7::BIGINT,
         |      [ascii(c)::BIGINT FOR c IN string_split(sh, '')]),
         |    (acc, c) -> (acc * 31 + c) % 2147483647) AS h1,
         |   list_reduce(list_prepend(11::BIGINT,
         |      [ascii(c)::BIGINT FOR c IN string_split(sh, '')]),
         |    (acc, c) -> (acc * 31 + c) % 2147483629) AS h2
         |  FROM sh),
         | hc AS (
         |  SELECT doc_id,
         |   (h1 % 1073741824) + (h2 % 1073741824) * 1073741824 AS h
         |  FROM hh),
         | bits AS (
         |  SELECT doc_id, i,
         |   sum(CASE WHEN (h >> i::INT) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM hc CROSS JOIN range(0, 60) t(i) GROUP BY 1, 2),
         | simh AS (
         |  SELECT doc_id,
         |   sum(CASE WHEN s > 0 THEN (1::BIGINT << i::INT) ELSE 0 END)::BIGINT AS sim
         |  FROM bits GROUP BY 1)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | bit_count(xor(a.sim, b.sim))::BIGINT AS hamming
         |FROM simh a JOIN simh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3""".stripMargin,
    "q_dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.46""".stripMargin,
    "q_dedup_embedding_lsh" -> embeddingLshOracle(Srp.Narrow),
    "q_dedup_embedding_lsh64" -> embeddingLshOracle(Srp.Wide),
    "q_dedup_embedding_incremental" -> embeddingLshOracle(Srp.Narrow,
      joinPred = "a.vec_id % 5 <> 4 AND b.vec_id % 5 = 4",
      outA = "corpus_id", outB = "new_id"),
    // admitted face: two-step indexing carries identical band content
    // (deterministic SRP banding), so the oracle is the incremental's
    "q_dedup_embedding_admitted" -> embeddingLshOracle(Srp.Narrow,
      joinPred = "a.vec_id % 5 <> 4 AND b.vec_id % 5 = 4",
      outA = "corpus_id", outB = "new_id"),
    // manifest twin: same lifecycle through _carry.txt resolution,
    // same exact oracle
    "q_dedup_embedding_admitted_manifest" -> embeddingLshOracle(Srp.Narrow,
      joinPred = "a.vec_id % 5 <> 4 AND b.vec_id % 5 = 4",
      outA = "corpus_id", outB = "new_id"),
    // takedown face: the corpus side additionally excludes the
    // tombstoned vec_id % 8 = 6 slice (delta ids are % 5 = 4, never
    // tombstoned, so the one-sided exclusion is exact)
    "q_dedup_embedding_takedown" -> embeddingLshOracle(Srp.Narrow,
      joinPred = "a.vec_id % 5 <> 4 AND a.vec_id % 8 <> 6 " +
        "AND b.vec_id % 5 = 4",
      outA = "corpus_id", outB = "new_id"),
    "q_dedup_embedding_incremental_wide" -> embeddingLshOracle(Srp.Wide,
      joinPred = "a.vec_id % 5 <> 4 AND b.vec_id % 5 = 4",
      outA = "corpus_id", outB = "new_id"),
    "q_dedup_embedding_wide_planted" -> plantedWideOracle,
    "q_dedup_components" -> componentsOracle,
    "q_dedup_components_star" -> componentsOracle,
    "q_dedup_keeper_quality" -> keeperQualityOracle,
    "q_split_leakage_safe" ->
      s"""$componentsCte
         |SELECT d.doc_id, d.lang,
         | coalesce(c.component, d.doc_id) AS group_id,
         | CASE WHEN substr(md5(coalesce(c.component, d.doc_id)::VARCHAR), 1, 2) < 'e6' THEN 'train'
         |      WHEN substr(md5(coalesce(c.component, d.doc_id)::VARCHAR), 1, 2) < 'f3' THEN 'val'
         |      ELSE 'test' END AS split
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin,
    "q_dedup_containment" -> duckContainPairs("a.doc_id <> b.doc_id"),
    "q_dedup_containment_incremental" -> duckContainPairs(
      "a.doc_id <> b.doc_id AND ((a.doc_id % 5 = 4) <> (b.doc_id % 5 = 4))"),
    // admitted face: prefix exactness is order-independent (pigeonhole
    // holds for ANY prefix choice), so two-step indexing answers the
    // same exact containment oracle as the incremental face
    "q_dedup_containment_admitted" -> duckContainPairs(
      "a.doc_id <> b.doc_id AND ((a.doc_id % 5 = 4) <> (b.doc_id % 5 = 4))"),
    // manifest twin: same lifecycle through _carry.txt resolution,
    // same exact oracle
    "q_dedup_containment_admitted_manifest" -> duckContainPairs(
      "a.doc_id <> b.doc_id AND ((a.doc_id % 5 = 4) <> (b.doc_id % 5 = 4))"),
    // takedown face: either side that is a corpus doc (% 5 <> 4) in the
    // tombstoned % 7 = 3 slice is excluded — the probe filters BOTH pair
    // columns, and in this face only corpus docs can be tombstoned
    "q_dedup_containment_takedown" -> duckContainPairs(
      "a.doc_id <> b.doc_id AND ((a.doc_id % 5 = 4) <> (b.doc_id % 5 = 4))" +
        " AND NOT (a.doc_id % 5 <> 4 AND a.doc_id % 7 = 3)" +
        " AND NOT (b.doc_id % 5 <> 4 AND b.doc_id % 7 = 3)")
  )

  /** Recursive-CTE transitive closure over the exact all-pairs j ≥ 0.8
    * graph, ending in `comp(doc_id, component)` — shared by every oracle
    * that consumes component identity.
    */
  private def componentsCte: String =
      s"""WITH RECURSIVE ${duckJaccardPairs("0.8")},
         | edges AS MATERIALIZED (
         |  SELECT id_a, id_b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         | reach(doc, r) AS (
         |  SELECT DISTINCT id_a, id_a FROM edges
         |  UNION
         |  SELECT e.id_a, re.r FROM reach re JOIN edges e ON e.id_b = re.doc),
         | comp AS MATERIALIZED (
         |  SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc)""".stripMargin

  private def keeperQualityOracle: String =
    s"""$componentsCte,
       | ${TextQueries.duckQualityCte},
       | r AS (
       |  SELECT c.component, c.doc_id, q.quality,
       |   row_number() OVER (PARTITION BY c.component
       |     ORDER BY q.quality DESC, c.doc_id ASC) AS rk,
       |   count(*) OVER (PARTITION BY c.component) AS n_docs
       |  FROM comp c JOIN q ON c.doc_id = q.doc_id)
       |SELECT component, n_docs, doc_id AS keeper_id,
       | quality AS keeper_quality
       |FROM r WHERE rk = 1""".stripMargin

  /** ONE independent semantics pinning BOTH component engines (the
    * min-label loop and the star alternation).
    */
  private def componentsOracle: String =
      s"""$componentsCte
         |SELECT doc_id, component,
         | count(*) OVER (PARTITION BY component) AS n_docs,
         | doc_id = component AS is_keeper
         |FROM comp""".stripMargin
}
