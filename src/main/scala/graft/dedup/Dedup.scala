package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.functions.MinHashExpressions.{minhashSignature, shingleSet, simhash64}
import graft.functions.SortedIntersectSize.sortedIntersectSize
import graft.operators.Tables

/** Deduplication operators for training-data pipelines, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Scale design notes (the part that matters at 100 TB):
  *  - exact dedup is a hash-aggregate on the dedup key — one shuffle of
  *    (key → min id); Catalyst's partial aggregation means each mapper sends
  *    one row per local key, not one per document.
  *  - MinHash/LSH dedup NEVER does all-pairs: documents explode to
  *    (band, bandHash) keys, candidates are pairs that collide in ≥1 band —
  *    a shuffle on the band key whose fan-out is bounded by bucket sizes.
  *    Hot buckets (boilerplate docs) are the skew risk; cap pairs per bucket
  *    or salt if a bucket exceeds a bound.
  *  - SimHash is a pure map (one 64-bit signature per doc) + an exact
  *    group-by on the signature: near-dup detection cost of an exact dedup.
  */
object Dedup {

  private def toks(c: Column): Column = TextAnalysis.tokens(c)

  /** Exact-dedup statistics per source: total vs distinct texts — the
    * standard "how much boilerplate does each crawl shard carry" question.
    * One partial-aggregated shuffle. */
  def exactStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct"))

  /** Exact dedup after canonicalization: key = sorted distinct token set.
    * Catches reordered/repeated-token copies that byte-exact dedup misses.
    * Emits one row per duplicate group (keeper = min doc_id). */
  def normalizedDupGroups(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat_ws(" ", array_sort(array_distinct(toks(col("text")))))
          .as("canon"))
      .groupBy(col("canon"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("keep_id"), col("n_copies"))

  /** Exact near-dup pairs by n-gram Jaccard over distinct unigram token
    * sets, on the deterministic doc_id % 4 sample (the oracle-checkable
    * ground truth that the LSH path approximates). Pair generation is a
    * range-predicate self-join over the sample — fine for a sample, and
    * exactly what LSH avoids doing on the full corpus.
    *
    * Exactness-preserving optimizations (results identical to the naive
    * string form, which is what the oracle computes):
    *  - tokens are hashed to longs once per doc (injective on any real
    *    vocabulary): the per-pair merge walk compares 8-byte longs instead
    *    of UTF8Strings, and the joined rows carry long arrays, not strings;
    *  - size-ratio prefilter in the JOIN CONDITION: jac ≤ min(|A|,|B|) /
    *    max(|A|,|B|), so pairs whose sizes differ by more than the
    *    threshold ratio can be skipped before any intersection work. */
  def ngramJaccardPairs(s: SparkSession, d: String, threshold: Double = 0.6)
      : DataFrame = {
    // The τ = 0.6 pair table is a deterministic corpus function consumed
    // by several operators (q26 directly, q124's dup-cluster components,
    // spec ground truths), so it persists through WarehouseCache like the
    // ANN index artifacts and the interaction-graph edge list: built once
    // per documents snapshot, read back metadata-only after. Callers with
    // a HIGHER threshold filter the cached UNROUNDED jac (identical to
    // recomputing — the filter is on the same double); lower thresholds
    // fall back to a direct build.
    val base =
      if (threshold >= 0.6)
        graft.operators.WarehouseCache.cachedParquet(s,
          s"graft_jacpairs_${graft.operators.WarehouseCache.dirSuffix(d)}",
          graft.operators.WarehouseCache
            .sourceFingerprint(s, d, "documents.parquet")) {
          jaccardPairsDirect(s, d, 0.6)
        }
      else jaccardPairsDirect(s, d, threshold)
    base.filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
  }

  /** The uncached all-pairs build: (doc_a, doc_b, jac) with jac UNROUNDED
    * so threshold filters over the cache are exact. */
  private def jaccardPairsDirect(s: SparkSession, d: String,
      threshold: Double): DataFrame = {
    val t = Tables.documents(s, d)
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"),
        array_sort(transform(array_distinct(toks(col("text"))),
          tk => xxhash64(tk))).as("toks"))
      .withColumn("sz", size(col("toks")))
    // the sample is one small partition; without an explicit repartition the
    // broadcast-NL pair loop runs in a single task no matter how many cores
    // the cluster has — the parallelism must be forced on the streamed side
    val a = t.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"),
        col("sz").as("sz_a"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_a"))
    val b = t.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"),
      col("sz").as("sz_b"))
    a.join(broadcast(b),
        col("doc_a") < col("doc_b") &&
          col("sz_a") >= col("sz_b") * lit(threshold) &&
          col("sz_b") >= col("sz_a") * lit(threshold))
      .withColumn("inter",
        sortedIntersectSize(col("toks_a"), col("toks_b")).cast("double"))
      .withColumn("den", col("sz_a") + col("sz_b") - col("inter"))
      .withColumn("jac",
        col("inter") / when(col("den") > 0, col("den")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  /** The same exact Jaccard ≥ 0.6 pairs as [[ngramJaccardPairs]], produced
    * by PREFIX FILTERING (the PPJoin candidate scheme, Xiao et al. WWW'08)
    * instead of the all-pairs loop — the shape that makes EXACT set-
    * similarity join feasible on a full corpus: candidates come from an
    * inverted index over each set's RAREST tokens, not from n²/2
    * comparisons.
    *
    * Theory: jac(A,B) ≥ τ forces |A∩B| ≥ ceil(τ·|X|) for both sides, and
    * any two sets overlapping in ≥ t elements must share a token within
    * their (|X|−t+1)-length prefixes under ANY global token order — so
    * indexing prefixes of length |X| − ceil(τ·|X|) + 1 loses nothing.
    * Ordering tokens rarest-first makes those prefixes low-frequency, so
    * the inverted-index buckets (and thus candidates) stay small.
    *
    * Engineering: τ stays the rational 3/5 and prefix lengths use exact
    * integer ceil ((3·n+4) div 5) — float ceil(0.6·n) rounds 3.0000…04 up
    * and silently SHORTENS a prefix (missed pairs). Tokens become dense
    * ranks ordered by (document frequency, token): a bijection, so rank-
    * array intersections equal token intersections and the verify step
    * reuses the native sorted merge-walk kernel. The vocabulary ranking
    * window is vocab-sized, not corpus-sized (at extreme vocab it would
    * become a range-partitioned sort + per-range offsets, the q64
    * distributed-prefix-sum shape). Oracle: q26's brute-force SQL at
    * τ = 0.6 — a hash match proves the candidate scheme exact. */
  def prefixFilterJaccardPairs(s: SparkSession, d: String): DataFrame =
    prefixFilterJaccardPairsDf(
      Tables.documents(s, d).filter(col("doc_id") % 4 === 0))

  /** [[prefixFilterJaccardPairs]] over any (doc_id, text) frame — the
    * production surface, also driven by the scale probe. */
  def prefixFilterJaccardPairsDf(src: DataFrame): DataFrame = {
    val docs = src
      .select(col("doc_id"), array_distinct(toks(col("text"))).as("tk"))
    val occ = docs.select(col("doc_id"), explode(col("tk")).as("tok"))
    // token rarity rank over the whole VOCABULARY — at 100 TB that is
    // billions of distinct tokens, so the global row number comes from
    // GlobalOrder's range-partitioned two-level prefix sum, never a
    // bare single-partition window
    val rank = graft.operators.GlobalOrder
      .rowNumber(occ.groupBy(col("tok")).agg(count(lit(1)).as("dfreq")),
        "rk", col("dfreq"), col("tok"))
      .select(col("tok"), col("rk"))
    val ranked = occ.join(rank, "tok")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("rk"))).as("toks"))
      .withColumn("sz", size(col("toks")))
      .withColumn("pl", col("sz") - expr("(sz * 3 + 4) div 5") + 1)
      .localCheckpoint() // the index and both verify sides read it
    val pre = ranked.select(col("doc_id"), col("sz"),
      explode(expr("slice(toks, 1, pl)")).as("rk"))
    // keyed repartition pins the candidate join's width (round 14): AQE
    // sizes post-shuffle partitions from the byte-small prefix streams
    // (→ 1-4 partitions) but the join's OUTPUT is Σ df_pre(rk)² rows —
    // the expansion, the size-ratio filter, and the distinct's map-side
    // dedup were running on a few cores (the probe measured the cand
    // stage at 2.0-2.7 s of the query's 2.7 s total). An explicit count
    // is exempt from AQE coalescing and forces both sides wide.
    val par = ranked.sparkSession.sparkContext.defaultParallelism
    val cand = pre.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"),
        col("rk"))
      .repartition(par, col("rk"))
      .join(pre.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
        col("rk")), Seq("rk"))
      .filter(col("doc_a") < col("doc_b") &&
        col("sz_a") * 3 <= col("sz_b") * 5 &&
        col("sz_b") * 3 <= col("sz_a") * 5)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
      // re-spread the byte-small distinct output so the merge-walk
      // verify below runs at cluster width, not AQE's 4 coalesced
      // partitions (the q231/q185 fix)
      .repartition(par, col("doc_a"))
    cand
      .join(ranked.select(col("doc_id").as("doc_a"),
        col("toks").as("toks_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(ranked.select(col("doc_id").as("doc_b"),
        col("toks").as("toks_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .withColumn("inter",
        sortedIntersectSize(col("toks_a"), col("toks_b")).cast("double"))
      .withColumn("den", col("sz_a") + col("sz_b") - col("inter"))
      .withColumn("jac", col("inter") / when(col("den") > 0, col("den")))
      .filter(col("jac") >= 0.6)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
  }

  // ---------------------------------------------------------------- MinHash

  /** Number of hash functions in the MinHash signature and the LSH banding
    * (Bands × RowsPerBand = NumHashes). b=8, r=4 targets the ~0.6 Jaccard
    * s-curve threshold ((1/b)^(1/r) ≈ 0.59). */
  val NumHashes = 32
  val Bands = 8
  val RowsPerBand = 4

  /** MinHash hashing scheme. Shingle STRINGS are never materialized:
    * building n-gram strings is O(tokens²) per doc in slice copies and
    * benchmarked as the dominant cost of the whole LSH query (6 of 8.5 s at
    * sf0.1). Instead each token is xxhash64'd once, and a 3-gram shingle's
    * hash is an arithmetic mix of three consecutive token hashes via a
    * lead-window — O(tokens) per doc, all-numeric. The `NumHashes` hash
    * families are affine transforms `pmod(a_i * h + b_i, p)` of the shingle
    * hash (the standard MinHash construction). All hash domains are reduced
    * mod 1e9+7 first so Spark 4's ANSI arithmetic can never overflow.
    * Duplicate shingles need no dedup — min over a multiset equals min over
    * its set. */
  val MinhashPrime = 2305843009213693951L // 2^61 - 1
  val HashDomain = 1000000007L

  // Each family is a true permutation of Z_{1e9+7} (a·s wraps the
  // modulus — see MinHashKernel for the q271-found degeneracy the
  // previous coefficients had); products stay < 2^63 under ANSI.
  private val hashFamilies: Seq[(Long, Long)] =
    (0 until NumHashes).map { i =>
      (java.lang.Math.floorMod(2654435761L * (i + 1) + 1013904223L,
        HashDomain - 1) + 1,
        java.lang.Math.floorMod(40503L * 2654435761L * (i + 1) + 97531L,
          HashDomain))
    }

  /** Spec accessor: the affine family coefficients (also mirrored by the
    * native MinHashKernel — the agreement spec recomputes signatures from
    * these against both implementations). */
  def hashFamiliesForSpec: Seq[(Long, Long)] = hashFamilies

  /** (doc_id, h) — one row per 3-gram shingle hash, from a (doc_id, toks)
    * frame. Docs shorter than 3 tokens fall back to unigram/bigram mixes
    * (trailing positions with missing leads), so no doc is left without a
    * signature.
    *
    * This exploded formulation is the SPEC REFERENCE for the native
    * per-row kernel (graft.functions.MinHashKernel) that the production
    * paths below use: the kernel computes the identical hashes with zero
    * shuffle, while this version pays an explode + window + aggregate. The
    * agreement spec (MinHashKernelSpec) pins the two together. */
  def hashedShingles(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), size(col("toks")).as("ntok"),
        posexplode(col("toks")))
      .select(col("doc_id"), col("ntok"), col("pos"),
        pmod(xxhash64(col("col")), lit(HashDomain)).as("h0"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    tok
      .withColumn("h1", lead(col("h0"), 1).over(w))
      .withColumn("h2", lead(col("h0"), 2).over(w))
      .filter(col("h2").isNotNull || col("ntok") < 3)
      .select(col("doc_id"),
        pmod(col("h0") * lit(961L) +
          coalesce(col("h1"), lit(0L)) * lit(31L) +
          coalesce(col("h2"), lit(0L)), lit(HashDomain)).as("h"))
  }

  /** Sorted distinct shingle-hash set per doc — the verification/ground-
    * truth feature space (long arrays; merge-walk intersect via
    * sorted_intersect_size). Computed per-row by the native kernel: a pure
    * projection, no explode/shuffle. */
  def hashedShingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), shingleSet(col("toks")).as("sh"))
      .filter(col("sh").isNotNull)

  private def docTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), toks(col("text")).as("toks"))

  /** Exact all-pairs shingle-Jaccard on the % 4 sample — the ground truth
    * the LSH path is measured against (same hashed feature space). */
  def shingleJaccardPairs(s: SparkSession, d: String, threshold: Double)
      : DataFrame = {
    val t = hashedShingleSets(
      docTokens(s, d).filter(col("doc_id") % 4 === 0))
    val a = t.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_a"))
    val b = t.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(broadcast(b), col("doc_a") < col("doc_b"))
      .withColumn("inter",
        sortedIntersectSize(col("sh_a"), col("sh_b")).cast("double"))
      .withColumn("den", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jac", col("inter") / when(col("den") > 0, col("den")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
  }

  /** Buckets larger than this switch from all-pairs to STAR pairing: a
    * bucket of g docs makes g²/2 candidate pairs, and mega-buckets
    * (boilerplate / filler text sharing a global min-hash) would turn LSH
    * into all-pairs. Star pairing (bucket-min doc ↔ every other member,
    * g−1 pairs) bounds the fan-out linearly while preserving CONNECTIVITY:
    * for dedup-by-components a homogeneous mega-bucket still collapses into
    * one group through its hub, and heterogeneous members simply fail the
    * exact-verification step. */
  val MaxBucket = 64

  /** LSH near-dup pairs: band the signatures, pair within capped buckets,
    * exact-verify candidates with shingle Jaccard ≥ threshold. */
  def minhashDupPairs(s: SparkSession, d: String, threshold: Double = 0.6)
      : DataFrame =
    // Banding is threshold-independent (Bands/RowsPerBand are constants;
    // the threshold only filters the exactly-verified jac), so the FULL
    // verified candidate table caches once per documents snapshot
    // (WarehouseCache, same contract as the Jaccard pair table above) and
    // every threshold filters the unrounded jac identically to a rebuild.
    // The fingerprint carries a kernel-version salt: this artifact is a
    // function of the DATA *and* the hash family — without the salt, a
    // kernel change (the q271-driven family fix) would silently serve
    // candidates computed by the old family from cache.
    graft.operators.WarehouseCache.cachedParquet(s,
      s"graft_mhpairs_${graft.operators.WarehouseCache.dirSuffix(d)}",
      graft.operators.WarehouseCache
        .sourceFingerprint(s, d, "documents.parquet") + ":mhk2") {
      minhashCandidatesDf(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
    }
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))

  /** Same, over any (doc_id, text) frame (uncached). */
  def minhashDupPairsDf(documents: DataFrame, threshold: Double = 0.6)
      : DataFrame =
    minhashCandidatesDf(documents)
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))

  /** The full LSH candidate pipeline with exact verification, UNFILTERED:
    * (doc_a, doc_b, jac) for every banded candidate pair, jac unrounded —
    * the cacheable threshold-independent unit. */
  def minhashCandidatesDf(documents: DataFrame): DataFrame = {
    // ids + band hashes only — shingle arrays do NOT ride through the
    // shuffle; they are re-attached for the (small) candidate set at the end.
    // Signature + shingle set are per-row kernel projections (no explode, no
    // window, no aggregate — the corpus is never shuffled to build them);
    // localCheckpoint materializes the scan once for the three consumers
    // (banding and both verify joins).
    val combined = documents
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .select(col("doc_id"),
        minhashSignature(col("toks")).as("sig"),
        shingleSet(col("toks")).as("sh"))
      .filter(col("sig").isNotNull)
      .localCheckpoint()
    val sigs = combined.select(col("doc_id"), col("sig"))
    val bandCols = (0 until Bands).map { b =>
      xxhash64(concat_ws(",",
        (0 until RowsPerBand).map(r =>
          element_at(col("sig"), b * RowsPerBand + r + 1)): _*))
    }
    val banded = sigs
      .select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandhash")

    // annotate buckets: need >= 2 to pair; window count + min over the
    // bucket key = one shuffle, and the upstream signature aggregation is
    // computed once (a join against a separate bucket aggregate would
    // recompute it per consumer).
    val bucketW = Window.partitionBy(col("band"), col("bandhash"))
    val annotated = banded
      .withColumn("bucket_n", count(lit(1)).over(bucketW))
      .withColumn("bucket_min", min(col("doc_id")).over(bucketW))
      .filter(col("bucket_n") >= 2)

    // small buckets: all pairs; mega buckets: star pairs around the hub
    val small = annotated.filter(col("bucket_n") <= MaxBucket)
    val allPairs = small.select(col("band"), col("bandhash"),
        col("doc_id").as("doc_a"))
      .join(small.select(col("band"), col("bandhash"),
        col("doc_id").as("doc_b")), Seq("band", "bandhash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val starPairs = annotated.filter(col("bucket_n") > MaxBucket)
      .filter(col("doc_id") =!= col("bucket_min"))
      .select(col("bucket_min").as("doc_a"), col("doc_id").as("doc_b"))

    val pairs = allPairs.unionAll(starPairs)
      .distinct()   // a pair may collide in several bands

    // verify candidates with exact shingle Jaccard (arrays attached here,
    // for candidates only)
    val sh = combined.select(col("doc_id"), col("sh"))
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .withColumn("inter",
        sortedIntersectSize(col("sh_a"), col("sh_b")).cast("double"))
      .withColumn("den", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jac", col("inter") / when(col("den") > 0, col("den")))
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over the token set: per-token xxhash64, sum ±1 per bit,
    * sign → bit. Pure per-row map built from higher-order functions. */
  def simhash(text: Column): Column = {
    val hashes = transform(array_distinct(toks(text)), t => xxhash64(t))
    val bitSums = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => array((0 until 64).map { i =>
        element_at(acc, i + 1) +
          when(shiftright(h, i).bitwiseAND(lit(1L)) === lit(1L), lit(1))
            .otherwise(lit(-1))
      }: _*))
    (0 until 64).map { i =>
      when(element_at(bitSums, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Apply dedup: collapse near-dup pairs into groups (connected
    * components) and elect the minimum doc_id of each component as its
    * canonical document. Components come from iterated min-label
    * propagation over the undirected pair graph — each round is one
    * shuffle (groupBy node), rounds = graph diameter, which for dup
    * clusters is tiny (they are near-cliques: LSH links most members
    * directly). Returns (doc_id, canonical_id) for every doc in some dup
    * group; docs absent from the result are already unique. */
  def assignCanonical(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // materialize the edge list once: every propagation round joins it, and
    // without this the whole upstream pair pipeline (for dedupApply, the
    // entire LSH) would re-run per iteration
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node"), col("src").as("label"))
      .unionAll(edges.select(col("src").as("node"), col("dst").as("label")))
      .groupBy(col("node")).agg(min(col("label")).as("label"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // pull the smallest label among each node's neighbors (and itself).
      // The old label rides along so convergence is OBSERVED during the
      // same job that materializes the checkpoint — one action per round,
      // not a separate isEmpty() pass over a diff join.
      val obs = new org.apache.spark.sql.Observation(s"lp_iter_$iter")
      val neighborLabels = edges
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("label"))
        .unionAll(labels)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .observe(obs,
          count(when(col("label") =!= col("old"), 1)).as("n_changed"))
        .select(col("node"), col("label"))
        .localCheckpoint()
      converged = obs.get("n_changed").asInstanceOf[Long] == 0L
      labels = neighborLabels
      iter += 1
    }
    labels.select(col("node").as("doc_id"), col("label").as("canonical_id"))
  }

  /** End-to-end dedup of the documents table: LSH pairs → components →
    * per-source counts of kept (canonical or unique) vs dropped docs. */
  def dedupApply(s: SparkSession, d: String, threshold: Double = 0.6)
      : DataFrame = {
    val assignments = assignCanonical(minhashDupPairs(s, d, threshold))
    Tables.documents(s, d)
      .join(assignments, Seq("doc_id"), "left")
      .withColumn("kept",
        col("canonical_id").isNull || col("canonical_id") === col("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("kept"), 1)).as("n_kept"),
        count(when(!col("kept"), 1)).as("n_dropped"))
  }

  /** Scalable SimHash: distinct tokens explode to rows, each hashed once;
    * the 64 per-bit ±1 sums are partial-aggregated columns of one groupBy
    * (same semantics as the column-level [[simhash]], which serves as its
    * per-row reference in the specs). */
  def simhashDf(docs: DataFrame): DataFrame = {
    val exploded = docs
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitAggs = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === lit(1L),
        lit(1)).otherwise(lit(-1))).as(s"b$i")
    }
    val grouped = exploded.groupBy(col("doc_id"))
      .agg(bitAggs.head, bitAggs.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    grouped.select(col("doc_id"), sig.as("sig"))
  }

  /** SimHash signature per document plus duplicate-signature groups —
    * near-dup detection at exact-dedup cost. Signatures come from the
    * native per-row kernel (one pass over the token array, inside codegen);
    * the only shuffle is the group count over the 64-bit signature. The
    * `size(toks) > 0` filter mirrors the explode-based [[simhashDf]], where
    * tokenless docs produce no rows. */
  def simhashGroups(s: SparkSession, d: String): DataFrame =
    simhashGroupsDf(Tables.documents(s, d).select(col("doc_id"), col("text")))

  /** Same, over any (doc_id, text) frame — shared by the driver query and
    * the scale probe, so what the probe measures IS the production path. */
  def simhashGroupsDf(documents: DataFrame): DataFrame = {
    val sigs = documents
      .select(col("doc_id"), array_distinct(toks(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), simhash64(col("toks")).as("sig"))
    val w = Window.partitionBy(col("sig"))
    sigs.withColumn("n_same_sig", count(lit(1)).over(w))
      .filter(col("n_same_sig") > 1)
      .select(col("doc_id"), col("sig"), col("n_same_sig"))
  }

  /** Driver-checkable form of [[simhashGroups]] (q28): identical
    * distinct-token SETS hash to identical SimHash signatures by
    * construction, so every doc in a ≥2-member exact set-duplicate
    * class (q25's canonical-token-set classes — oracle-reproducible)
    * MUST appear in the signature groups. Emits the exact-dup doc count
    * plus that coverage invariant as a boolean: lose a signature
    * collision and the driver gate fails. */
  def simhashCoverageCheck(s: SparkSession, d: String): DataFrame = {
    val canon = Tables.documents(s, d)
      .select(col("doc_id"),
        concat_ws(" ", array_sort(array_distinct(toks(col("text")))))
          .as("canon"))
      // tokenless docs (canon = "") never enter simhashGroups (its
      // size(toks) > 0 filter — a 0-token signature is meaningless),
      // so the coverage universe must exclude them too or an
      // empty-text duplicate pair would flip the boolean against the
      // oracle's literal true
      .filter(col("canon") =!= "")
    val w = Window.partitionBy(col("canon"))
    val exactDups = canon
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("n") > 1)
      .select(col("doc_id"))
      .localCheckpoint() // count + anti-join consumers
    val grouped = simhashGroups(s, d).select(col("doc_id"))
    val missed = exactDups.join(grouped, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
    exactDups.agg(count(lit(1)).as("n_exact_dup_docs"))
      .crossJoin(broadcast(missed))
      .select(col("n_exact_dup_docs"),
        (col("n_missed") === 0).as("all_exact_dups_grouped"))
  }

  /** Driver-checkable form of [[dedupApply]] (q47): per source, the doc
    * count and the exact-duplicate excess among TOKENFUL docs (docs
    * minus distinct texts, both oracle-reproducible), plus the
    * structural invariants of the LSH dedup as a boolean: kept +
    * dropped partitions the source, and dropped covers at least that
    * excess (byte-identical TOKENFUL copies always band together, share
    * every signature, verify at jac = 1, and at most one member of each
    * component is kept). Tokenless docs are excluded from the excess —
    * minhashSignature is null for them, so LSH can never pair or drop
    * them, and counting a hypothetical empty-text duplicate pair into
    * min_dropped would flip the boolean against the oracle's literal
    * true. */
  def dedupApplyCheck(s: SparkSession, d: String): DataFrame = {
    val tokStats = Tables.documents(s, d)
      .filter(size(toks(col("text"))) > 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("text")).as("n_tok_distinct"))
    dedupApply(s, d)
      .join(tokStats, Seq("source"))
      .select(col("source"), col("n_docs"),
        (col("n_tok") - col("n_tok_distinct")).as("min_dropped"),
        (col("n_kept") + col("n_dropped") === col("n_docs") &&
          col("n_dropped") >= col("n_tok") - col("n_tok_distinct"))
          .as("dedup_ok"))
  }

  /** Driver-checkable form of the MinHash pipeline (q27): exact
    * ground-truth near-dup pairs built from STRING 3-gram shingles —
    * a metric both engines can compute bit-identically — plus LSH
    * recall against that truth as a boolean. The threshold compare is
    * pure integer arithmetic (inter·5 ≥ (sa+sb−inter)·4 ⇔ jac ≥ 0.8),
    * so no float boundary exists cross-engine. Universe: docs with ≥3
    * tokens (the shingle special-case below 3 tokens is Spark-kernel
    * specific and excluded from the contract). Truth at τ=0.8 sits well
    * above the banding s-curve midpoint, where measured recall ≈ 1, so
    * the 0.9 bound has margin on any testdata regeneration. Exact-pair
    * generation is the inverted-index join (shared-shingle candidates
    * only), never an all-pairs product — and it runs on the % 4 sample
    * (the same ground-truth universe the recall spec uses), so the
    * exact arm stays a fixed fraction of the corpus while the LSH arm
    * under test is the full cached production pipeline. */
  def minhashRecallCheck(s: SparkSession, d: String): DataFrame = {
    val sh = docTokens(s, d)
      .filter(col("doc_id") % 4 === 0)
      .withColumnRenamed("toks", "w")
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(w) - 3), i -> " +
          "concat_ws(' ', element_at(w, i + 1), element_at(w, i + 2), " +
          "element_at(w, i + 3)))"))).as("sh"))
      .localCheckpoint() // sizes pass + both sides of the pair join
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val truth = sh.select(col("doc_id").as("doc_a"), col("sh"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
      // sz is per-DOC (corpus-sized at scale): plain shuffle joins —
      // the pair table already shuffles on doc keys, and forcing a
      // corpus-sized broadcast would OOM at any real size
      .join(sz.select(col("doc_id").as("doc_a"),
        col("sz").as("sa")), Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"),
        col("sz").as("sb")), Seq("doc_b"))
      .filter(col("inter") * 5 >= (col("sa") + col("sb") - col("inter")) * 4)
      .select(col("doc_a"), col("doc_b"))
    val found = minhashDupPairs(s, d, threshold = 0.8)
      .filter(col("doc_a") % 4 === 0 && col("doc_b") % 4 === 0)
      .select(col("doc_a"), col("doc_b"))
    val hits = truth.join(found, Seq("doc_a", "doc_b"))
      .agg(count(lit(1)).as("n_hits"))
    truth.agg(count(lit(1)).as("n_true_pairs"))
      .crossJoin(broadcast(hits))
      .select(col("n_true_pairs"),
        (col("n_hits") >= col("n_true_pairs") * 0.9).as("recall_ok"))
  }

  /** Substring-level exact dedup coverage — the ExactSubstr statistic of
    * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better") in fixed-window form: a K-token window is DUPLICATED if its
    * exact content occurs at ≥ 2 positions anywhere in the corpus
    * (including within one document), and each document reports how much
    * of it is covered by duplicated windows — the signal that drives
    * span-level dedup rather than whole-doc dropping, and catches the
    * shared-boilerplate case (identical header/footer inside otherwise
    * distinct pages) that document-level dedup (q24-q28) cannot.
    *
    * Scale shape: window generation is an array HOF inside the scan
    * projection (one row per window position — linear in corpus tokens,
    * no joins); windows carry their md5 instead of the K-token string so
    * the global duplicate detection shuffles 32-byte keys, not text.
    * That detection is ONE content-keyed partial-aggregated count — the
    * exact-dedup shuffle shape. The join back to positions is keyed on
    * the same hash (no pair explosion: a window duplicated d times
    * contributes d rows, never d²). Coverage resolves per document: the
    * union length of sorted fixed-length intervals is Σ min(K, nextᵢ−iᵢ)
    * via one lead() over a per-doc window — per-document grain, bounded
    * by document length at any corpus size. The flag compares in integer
    * arithmetic (dup_tokens·5 > n_tok ⟺ coverage > 0.2). */
  def substringDedup(s: SparkSession, d: String): DataFrame =
    substringDedupDf(Tables.documents(s, d).select(col("doc_id"), col("text")))

  /** [[substringDedup]] over an arbitrary (doc_id, text) frame. */
  def substringDedupDf(docs: DataFrame, k: Int = 8): DataFrame = {
    val base = docs
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x != '')").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tok"),
        col("w"))
    val wins = base
      .select(col("doc_id"), col("n_tok"),
        posexplode(expr(s"transform(sequence(0, size(w) - $k), i -> " +
          s"md5(concat_ws(' ', slice(w, i + 1, $k))))"))
          .as(Seq("i", "h")))
      .localCheckpoint() // global dup counts + per-doc coverage share it
    val dup = wins.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("h"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val cov = wins.join(dup, Seq("h"))
      .withColumn("nxt", lead(col("i"), 1).over(wd))
      .select(col("doc_id"),
        when(col("nxt").isNull, lit(k.toLong))
          .otherwise(least(lit(k.toLong), (col("nxt") - col("i"))
            .cast("long"))).as("covd"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"),
        sum(col("covd")).as("dup_tokens"))
    base.select(col("doc_id"), col("n_tok"))
      .join(cov, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) /
          col("n_tok").cast("double"), 6).as("dup_frac"),
        (coalesce(col("dup_tokens"), lit(0L)) * 5 > col("n_tok"))
          .as("flagged"))
  }

  /** Substring-level dedup APPLY — the rewrite half of Lee et al. 2021's
    * ExactSubstr: every token covered by ANY corpus-duplicated K-window
    * is cut out and the document is reassembled from the surviving
    * tokens (the paper's span removal, not whole-doc dropping).
    * [[substringDedup]] measures; this rewrites. Documents shorter than
    * K tokens can never contain a window and pass through VERBATIM —
    * the apply preserves the corpus, unlike the census which skips them.
    *
    * Output per doc: original/kept token counts, the removed-token
    * count (which equals the census's interval-union `dup_tokens` by
    * construction — the spec pins the reconciliation), and an md5
    * fingerprint of the reassembled text (exact, and keeps the output
    * row narrow at any document size).
    *
    * Scale shape: everything [[substringDedupDf]] argues, plus: covered
    * positions explode K rows per duplicated OCCURRENCE (linear — never
    * d² for a window duplicated d times), distinct per (doc, pos), and
    * the rebuild is a per-document sorted reassembly
    * (sort_array(collect_list)) whose grain is one document's tokens —
    * bounded by document length at any corpus size, the same per-doc
    * contract as the census's lead() window. */
  def substringDedupApply(s: SparkSession, d: String): DataFrame =
    substringDedupApplyDf(
      Tables.documents(s, d).select(col("doc_id"), col("text")))

  /** NEAR-dup provenance — [[dupProvenance]]'s question asked of
    * near-duplicates: which source pairs share Jaccard ≥ 0.6 content
    * that isn't byte- or token-set-identical (paraphrased mirrors,
    * templated rewrites — the overlap exact dedup can't see). Pairs
    * come from the cached exact ≥ 0.6 pair table over the
    * deterministic doc_id % 4 sample (the q26 contract — the ground
    * truth the LSH path approximates), so the matrix is EXACT and
    * oracle-checkable, not an LSH estimate.
    *
    * Scale shape: the pair table is a cached corpus artifact
    * (WarehouseCache); attaching sources is two doc-keyed equi-joins
    * of that pair list against the (doc_id, source) projection — the
    * corpus never self-joins here. Output grain ≤ |sources|². */
  def neardupProvenance(s: SparkSession, d: String): DataFrame = {
    val pairs = ngramJaccardPairs(s, d)
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"), col("jaccard"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("jaccard")), 4).as("avg_jaccard"))
  }

  /** MinHash estimator calibration — certifies the statistical engine
    * the whole LSH dedup stack (q27, q47, q83) rests on: over a FIXED
    * 100-document calibration panel (fixed panel ⇒ the pair count is
    * 4950 at ANY corpus size — calibration needs a sample, not the
    * corpus), compare the NumHashes(=32)-permutation signature-agreement
    * estimate of Jaccard against the EXACT 3-gram Jaccard, and assert
    * the binomial error bound |est − J| ≤ 6·√(J(1−J)/32) + 3/32 per
    * pair (6σ puts the per-regeneration violation probability near
    * 1e-9 across the panel; the +3/32 absorbs shingle-hash modulus
    * collisions — the estimator hashes shingles mod 1e9+7 while the
    * exact arm compares literal trigram strings). The exact arm is the
    * oracle-checked output; the estimate never leaves the query (DuckDB
    * cannot reproduce the signature), entering only through the bound
    * boolean — the q31 in-query-ground-truth discipline.
    *
    * Scale shape: the panel is 100 rows (broadcast both sides of the
    * 4950-pair join); signatures come from the native per-row kernel;
    * the corpus is scanned once with a doc_id < 100 pushed filter. */
  def minhashCalibration(s: SparkSession, d: String): DataFrame =
    minhashCalibrationDf(
      Tables.documents(s, d).select(col("doc_id"), col("text")))

  /** [[minhashCalibration]] over an arbitrary (doc_id, text) frame. */
  def minhashCalibrationDf(docs: DataFrame): DataFrame = {
    val panel = docs.filter(col("doc_id") < 100)
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x != '')").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(0, size(t) - 3), " +
          "i -> concat_ws(' ', slice(t, i + 1, 3))))").as("g"),
        minhashSignature(col("t")).as("sig"))
      .localCheckpoint() // both sides of the pair join read it
    val a = panel.select(col("doc_id").as("doc_a"), col("g").as("ga"),
      col("sig").as("sa"))
    val b = panel.select(col("doc_id").as("doc_b"), col("g").as("gb"),
      col("sig").as("sb"))
    a.join(broadcast(b), col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
          (size(col("ga")) + size(col("gb")) -
            size(array_intersect(col("ga"), col("gb"))))).as("j"),
        (size(expr("filter(zip_with(sa, sb, (x, y) -> x = y), v -> v)"))
          .cast("double") /
          graft.functions.MinHashKernel.NumHashes.toDouble).as("est"))
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("j_exact"),
        (abs(col("est") - col("j")) <=
          sqrt(col("j") * (lit(1.0) - col("j")) /
            graft.functions.MinHashKernel.NumHashes.toDouble) * 6.0 +
          3.0 / graft.functions.MinHashKernel.NumHashes.toDouble)
          .as("est_within_bound"))
  }

  /** Duplicate-provenance matrix — WHICH sources duplicate WHICH: for
    * every canonical-dup cluster (q25's sorted-distinct-token-set key),
    * count duplicate PAIRS per source pair — Σ over clusters of n_a·n_b
    * (a<b) and C(n_a,2) on the diagonal. A pipeline owner reads this as
    * the mirror-site / scraper-overlap report: a hot off-diagonal cell
    * means two feeds ingest the same underlying corpus, and the fix is
    * upstream (drop a feed), not per-document dedup.
    *
    * Scale shape: the pair counts come from per-(cluster, source)
    * COUNTS, never materialized pairs — the per-cluster self-join fans
    * out at most |sources|² rows per cluster REGARDLESS of cluster
    * size (a million-doc mega-cluster is one row per source on each
    * side), so there is no hot-cluster blow-up by construction; the
    * cluster key is a 32-byte md5, one content-keyed shuffle. All
    * arithmetic is exact integers. */
  def dupProvenance(s: SparkSession, d: String): DataFrame =
    dupProvenanceDf(
      Tables.documents(s, d).select(col("source"), col("text")))

  /** [[dupProvenance]] over an arbitrary (source, text) frame. */
  def dupProvenanceDf(docs: DataFrame): DataFrame = {
    val cs = docs
      .select(col("source"),
        md5(concat_ws(" ", array_sort(array_distinct(
          expr("filter(split(lower(text), ' '), x -> x != '')")))))
          .as("h"))
      .groupBy(col("h"), col("source")).agg(count(lit(1)).as("n"))
      .localCheckpoint() // both sides of the per-cluster source join
    cs.select(col("h"), col("source").as("source_a"), col("n").as("na"))
      .join(cs.select(col("h"), col("source").as("source_b"),
        col("n").as("nb")), Seq("h"))
      .filter(col("source_a") <= col("source_b"))
      .select(col("source_a"), col("source_b"),
        when(col("source_a") === col("source_b"),
          expr("(na * (na - 1)) div 2"))
          .otherwise(col("na") * col("nb")).as("p"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("p")).as("n_pairs"))
      .filter(col("n_pairs") > 0)
  }

  /** Incremental snapshot dedup — the "new crawl dump arrives" path:
    * classify every document of an ARRIVING batch against a FROZEN
    * registry of already-ingested content without re-processing the
    * existing corpus (the way successive CommonCrawl snapshots are
    * deduplicated against each other rather than re-deduplicating the
    * union from scratch). Key = q25's canonical sorted-distinct-token
    * set, so reordered/repeated-token copies classify as dups. Each
    * arriving doc lands in exactly one class:
    *   - `dup_of_existing`: its canon is already registered → keep_id
    *     is the registry keeper (min existing doc_id);
    *   - `dup_in_batch`: first seen in THIS batch but a lower-id batch
    *     doc shares the canon → keep_id is that batch keeper;
    *   - `new`: first occurrence anywhere → keep_id is itself.
    * The deterministic batch is doc_id % 5 == 4 (~20%); production
    * swaps in the actual arriving snapshot and persists the registry
    * (canon → keeper) as the incremental state, exactly the frozen
    * train-once / score-anything split of dsirLambda/rebalanceApply.
    *
    * Scale shape: the registry aggregate and both classification joins
    * are content-keyed shuffles (partial-aggregated, one row per key);
    * no pair join anywhere, so a million-copy canon costs one registry
    * row, not a blow-up. The batch-internal keeper reuses the same
    * aggregate — no ranking window. */
  def snapshotDedup(s: SparkSession, d: String): DataFrame =
    snapshotDedupDf(
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
        col("text")))

  /** [[snapshotDedup]] over an arbitrary (doc_id, lang, text) frame. */
  def snapshotDedupDf(docs: DataFrame): DataFrame = {
    val canon = docs
      .select(col("doc_id"), col("lang"),
        md5(concat_ws(" ", array_sort(array_distinct(
          expr("filter(split(lower(text), ' '), x -> x != '')")))))
          .as("canon"))
    val batch = canon.filter(col("doc_id") % 5 === 4)
      .localCheckpoint() // classification join + batch-keeper agg share it
    val reg = canon.filter(col("doc_id") % 5 =!= 4)
      .groupBy(col("canon")).agg(min(col("doc_id")).as("reg_id"))
    val batchMin = batch.groupBy(col("canon"))
      .agg(min(col("doc_id")).as("batch_min"))
    batch
      .join(reg, Seq("canon"), "left_outer")
      .join(batchMin, Seq("canon"))
      .select(col("doc_id"), col("lang"),
        when(col("reg_id").isNotNull, lit("dup_of_existing"))
          .when(col("batch_min") < col("doc_id"), lit("dup_in_batch"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("reg_id"), col("batch_min")).as("keep_id"))
  }

  /** Incremental NEAR-dup ingest — [[snapshotDedup]]'s fuzzy sibling
    * and the near-dup analogue of q269's index delta ingest: an
    * arriving panel of documents is checked against the existing
    * corpus for ≥ 0.6 trigram-Jaccard neighbours, the way a new crawl
    * snapshot probes a frozen LSH signature registry instead of
    * re-running corpus-wide dedup. Two arms:
    *   - EXACT (the per-doc output, oracle-reproducible): distinct
    *     trigram md5s join on CONTENT (an inverted-index probe — pairs
    *     arise only from shared trigrams, never from a pair scan),
    *     Jaccard rounds to 4 dp BEFORE ranking, best match breaks ties
    *     on the lower existing id; no-match docs report (-1, 0.0).
    *   - LSH PROBE (the production path, aggregated to one hashable
    *     boolean): panel band hashes join the existing side's band
    *     hashes — the frozen-registry probe — and collisions
    *     exact-verify on the same trigram space; `lsh_recall_ok` holds
    *     the ≥ 0.5 in-query recall bound vs the exact arm (q31's
    *     judged-in-query discipline; at the τ = 0.6 operating point the
    *     designed band S-curve already gives ≥ 0.67 per pair).
    *
    * The panel is SCALE-CAPPED: modulus = max(20, ⌈n/100⌉) keeps it at
    * ~100 docs at any corpus size (the q271 fixed-panel rule — derived
    * from the exact count, so both engines pick the same panel), and
    * the existing side is touched only through content-keyed shuffles
    * (trigram grain — the q260 cost class) plus a per-row signature
    * map. No quadratic-in-corpus step anywhere. */
  def snapshotNeardup(s: SparkSession, d: String): DataFrame = {
    val n = Tables.documents(s, d).count()
    val m = math.max(20L, (n + 99L) / 100L)
    val base = snapBase(Tables.documents(s, d))
    val panel = base.filter(col("doc_id") % m === 4)
      .localCheckpoint() // trigram arm + signature arm + output spine
    // The existing-side REGISTRY — per-doc trigram-md5 set + minhash
    // signature — is the frozen offline artifact of this query's own
    // production story (a snapshot probes a registry built when the
    // corpus was ingested), so it caches under WarehouseCache exactly
    // like the ANN indexes (q31's offline-index economics). The
    // fingerprint carries the kernel salt AND the modulus: a corpus
    // growth that shifts the panel split rebuilds the registry.
    val existing = graft.operators.WarehouseCache.cachedParquet(s,
      s"graft_snapdupreg_${graft.operators.WarehouseCache.dirSuffix(d)}",
      graft.operators.WarehouseCache
        .sourceFingerprint(s, d, "documents.parquet") + s":m$m:mhk2") {
      snapRegistry(base.filter(col("doc_id") % m =!= 4))
    }.localCheckpoint()
    snapProbe(panel, existing)
  }

  /** [[snapshotNeardup]] over an arbitrary (doc_id, text) frame —
    * registry built inline, uncached (probes and specs; the table form
    * above is the production-economics path). */
  def snapshotNeardupDf(docs: DataFrame): DataFrame = {
    val n = docs.count()
    val m = math.max(20L, (n + 99L) / 100L)
    val base = snapBase(docs)
    val panel = base.filter(col("doc_id") % m === 4).localCheckpoint()
    val existing =
      snapRegistry(base.filter(col("doc_id") % m =!= 4)).localCheckpoint()
    snapProbe(panel, existing)
  }

  private def snapBase(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      expr("filter(split(lower(text), ' '), x -> x != '')").as("w"))
    .filter(size(col("w")) >= 3)

  /** Per-doc trigram-md5 set + minhash signature — the registry row. */
  private def snapRegistry(existing: DataFrame): DataFrame = existing
    .select(col("doc_id").as("e_id"),
      array_distinct(expr(
        "transform(sequence(0, size(w) - 3), i -> " +
          "md5(concat_ws(' ', element_at(w, i + 1), " +
          "element_at(w, i + 2), element_at(w, i + 3))))")).as("gs"),
      minhashSignature(col("w")).as("sig"))

  /** The near-dup REGISTRY row set of a (doc_id, text) corpus —
    * (e_id, trigram-md5 set, minhash signature). Public for the
    * streaming probe ([[graft.streaming.StreamingNeardup]]), which
    * checks arriving documents against exactly this artifact. The
    * projection is per-row (kernel expressions, no shuffle), so the
    * SAME call also fingerprints a streaming frame. */
  def neardupRegistryDf(docs: DataFrame): DataFrame =
    snapRegistry(snapBase(docs))

  /** Banded LSH keys of a (idCol, sig) frame: one (idCol, band,
    * bandhash) row per band — a stateless per-row explode, applied
    * identically to batch and streaming frames. */
  private[graft] def bandTable(sigs: DataFrame, idCol: String)
      : DataFrame = {
    val bandCols = (0 until Bands).map { b =>
      xxhash64(concat_ws(",",
        (0 until RowsPerBand).map(r =>
          element_at(col("sig"), b * RowsPerBand + r + 1)): _*))
    }
    sigs.filter(col("sig").isNotNull)
      .select(col(idCol), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandhash")
  }

  private def snapProbe(panel: DataFrame, existing: DataFrame)
      : DataFrame = {

    // ---- exact arm: inverted trigram-md5 join. Set sizes come from
    // the per-row ARRAY width (map-side projection — no count shuffle),
    // and the corpus side's exploded trigrams are pruned by a broadcast
    // semi-join against the panel's trigram set BEFORE the content
    // shuffle: the panel is fixed-size, so its distinct-trigram set is
    // broadcastable at any corpus scale, and the only trigrams that
    // ever ride an exchange are panel-relevant ones (the full-corpus
    // trigram shuffle this replaces was 5× the cost at ×16).
    val pSets = panel
      .select(col("doc_id").as("p_id"), array_distinct(expr(
        "transform(sequence(0, size(w) - 3), i -> " +
          "md5(concat_ws(' ', element_at(w, i + 1), " +
          "element_at(w, i + 2), element_at(w, i + 3))))")).as("gs"))
      .select(col("p_id"), size(col("gs")).as("sp"), col("gs"))
      .localCheckpoint() // trigram probe + sizes share it
    val tp = pSets.select(col("p_id"), explode(col("gs")).as("g"))
    val panelG = pSets.select(explode(col("gs")).as("g")).distinct()
    val te = existing
      .select(col("e_id"), size(col("gs")).as("se"),
        explode(col("gs")).as("g"))
      .join(broadcast(panelG), Seq("g"), "left_semi")
    val scored = tp.join(te, Seq("g"))
      .groupBy(col("p_id"), col("e_id"), col("se"))
      .agg(count(lit(1)).as("i"))
      .join(broadcast(pSets.select(col("p_id"), col("sp"))), Seq("p_id"))
      .select(col("p_id"), col("e_id"),
        round(col("i").cast("double") /
          (col("sp") + col("se") - col("i")), 4).as("jac"))
      .localCheckpoint() // best-match rank + LSH verification share it
    val best = scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("p_id"))
        .orderBy(col("jac").desc, col("e_id"))))
      .filter(col("rk") === 1)
      .select(col("p_id").as("doc_id"), col("e_id").as("best_id"),
        col("jac").as("best_jac"))

    // ---- LSH probe arm: panel bands against the frozen registry bands
    val cand = bandTable(panel.select(col("doc_id").as("p_id"),
        minhashSignature(col("w")).as("sig")), "p_id")
      .join(bandTable(existing.select(col("e_id"), col("sig")), "e_id"),
        Seq("band", "bandhash"))
      .select(col("p_id"), col("e_id")).distinct()
    val lshFound = cand
      .join(scored.filter(col("jac") >= 0.6), Seq("p_id", "e_id"))
      .select(col("p_id")).distinct()
    val truthPos = best.filter(col("best_jac") >= 0.6)
      .select(col("doc_id").as("p_id"))
    val rec = truthPos.agg(count(lit(1)).as("n_truth"))
      .crossJoin(truthPos.join(lshFound, Seq("p_id"))
        .agg(count(lit(1)).as("n_hit")))
      .select((col("n_truth") === 0 ||
        col("n_hit") * 2 >= col("n_truth")).as("lsh_recall_ok"))

    panel.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left_outer")
      .crossJoin(broadcast(rec))
      .select(col("doc_id"),
        coalesce(col("best_jac") >= 0.6, lit(false)).as("has_neardup"),
        coalesce(col("best_id"), lit(-1L)).as("best_id"),
        coalesce(col("best_jac"), lit(0.0)).as("best_jac"),
        col("lsh_recall_ok"))
  }

  /** [[substringDedupApply]] over an arbitrary (doc_id, text) frame. */
  def substringDedupApplyDf(docs: DataFrame, k: Int = 8): DataFrame = {
    val base = docs
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x != '')").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tok"),
        col("w"))
      .localCheckpoint() // window census + the rebuild both read it
    val wins = base
      .filter(size(col("w")) >= k)
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(0, size(w) - $k), i -> " +
          s"md5(concat_ws(' ', slice(w, i + 1, $k))))"))
          .as(Seq("i", "h")))
      .localCheckpoint() // dup counts + occurrence join share it
    val dup = wins.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("h"))
    // covered token positions: K rows per duplicated occurrence, then
    // distinct — linear in occurrences, never quadratic in dup count
    val covered = wins.join(dup, Seq("h"))
      .select(col("doc_id"),
        explode(expr(s"sequence(i, i + ${k - 1})")).as("pos"))
      .distinct()
    val kept = base
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "tok")))
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          e => e("tok"))).as("kept_text"))
    base.select(col("doc_id"), col("n_tok"))
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tok") - coalesce(col("n_kept"), lit(0L)))
          .as("removed_tokens"),
        md5(coalesce(col("kept_text"), lit(""))).as("kept_fp"))
  }
}
