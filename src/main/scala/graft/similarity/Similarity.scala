package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.AggregateKernels.{topKByScore, vectorSum}
import graft.functions.VectorFunctions._
import graft.operators.{Tables, WarehouseCache}

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>[64], label).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the full corpus; one pass, no shuffle of the corpus, a
  *    per-query top-k via window. The 100 TB story: queries broadcast, corpus
  *    streams; cost is one full scan per batch of queries.
  *  - [[ivfTopK]]: IVF-style bucketed ANN — corpus vectors are assigned to
  *    their nearest centroid once (map-side), queries probe only the
  *    `nprobe` nearest buckets, turning full scans into
  *    |corpus|·nprobe/|centroids| work. Centroids here are a deterministic
  *    sample of the corpus (vec_id % CentroidStep), standing in for a
  *    k-means pass.
  */
object Similarity {

  /** Deterministic query subset: every 100th vector — see
    * [[queryFilter]] for the fixed-panel cap that bounds it at scale. */
  val QueryStep = 100
  /** Hard cap on the ANN query panel (the q271/q139 fixed-panel rule):
    * an uncapped `% QueryStep` panel grows linearly with the corpus,
    * and the exact TRUTH arms every ANN query carries (queries ×
    * corpus brute force) grow quadratically — the ×64 run measured
    * q84/q112 at ~21× for 4× data from exactly this. The cap engages
    * only past ~12.8k vectors, so every committed test-scale result
    * (sf0.001/0.01/0.1) is bit-identical. */
  val QueryPanelMax = 128L
  val CentroidStep = 97

  /** Memoized panel steps: the corpus count behind the panel cap is
    * (session, analyzed-plan) invariant — bench runs execute the same
    * ANN frame dozens of times, and an EAGER count at plan-build time
    * sat inside every timed region (the round-8 ADVICE measured it as
    * part of q112's drift). Keyed per SESSION through weak references
    * (round 10: a strong session key retained every stopped session
    * for process lifetime across test churn) and, within a session, by
    * an md5 of the full CANONICALIZED plan text — not the 32-bit
    * semanticHash, whose collision between two frames would silently
    * reuse the wrong step. Assumes the source parquet is immutable
    * within a session (the same contract WarehouseCache's
    * fingerprint-keyed artifacts already rely on). */
  private val panelStepCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[
        (String, Long, Long), java.lang.Long]]()

  /** The deterministic query panel over a (vec_id, …) frame: modulo
    * step = max(QueryStep, ⌈n / QueryPanelMax⌉), derived from one
    * (memoized) count — panel size is corpus-independent past the cap.
    * Mirrored in every ANN oracle as
    * `vec_id % greatest(100, (count(*) + 127) // 128) = 0` so the
    * cap's engaged regime (> ~12.8k vectors) stays oracle-checkable. */
  private def queryFilter(v: DataFrame): DataFrame =
    v.filter(col("vec_id") % corpusCount(v, QueryStep.toLong,
      QueryPanelMax) === 0)

  /** Memoized `max(floor, ⌈count/target⌉)` over a frame — the shared
    * machinery behind every fixed-size panel/sample rule (ANN query
    * panels, q83's truth-arm sample). One count per (session, plan). */
  private def corpusCount(v: DataFrame, floor: Long, target: Long): Long = {
    val perSession = panelStepCache.synchronized {
      var m = panelStepCache.get(v.sparkSession)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[
          (String, Long, Long), java.lang.Long]()
        panelStepCache.put(v.sparkSession, m)
      }
      m
    }
    val planId = java.security.MessageDigest.getInstance("MD5")
      .digest(v.queryExecution.analyzed.canonicalized.toString
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    perSession.computeIfAbsent((planId, floor, target),
      _ => math.max(floor, (v.count() + target - 1) / target))
  }

  /** Coarse-list cap for [[kmeansCentroids]]: nlist = min(n/97, 1024).
    * Production IVF sizes nlist ~ √n; the cap is the guard that keeps
    * the Lloyd assignment linear and the centroid broadcast small when
    * the corpus outgrows the `% CentroidStep` seed. */
  val IvfMaxLists = 1024L
  val NProbe = 6

  private def vectors(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))

  /** Exact cosine near-dup pairs on the deterministic % 10 sample (the
    * embedding-space analog of ngram Jaccard dedup). */
  def cosineNearDupPairs(s: SparkSession, d: String,
      threshold: Double = 0.25): DataFrame = {
    val v = vectors(s, d).filter(col("vec_id") % 10 === 0)
    // force parallelism: the sample is one input split, and a broadcast-NL
    // join otherwise runs its whole quadratic loop in a single task
    val a = v.select(col("vec_id").as("vec_a"), col("emb").as("emb_a"))
      .repartition(s.sparkContext.defaultParallelism, col("vec_a"))
    val b = v.select(col("vec_id").as("vec_b"), col("emb").as("emb_b"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("sim", cosine(col("emb_a"), col("emb_b")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
  }

  /** Exact top-k nearest neighbors (cosine) for each query vector.
    * Ranking is on the 6-decimal-rounded similarity with vec_id tie-break so
    * the order is reproducible across engines.
    *
    * Top-k is the bounded-heap AGGREGATE (topk_by_score), not a ranking
    * window: partial aggregation keeps a k-entry heap per query per mapper,
    * so the shuffle carries |queries|·mappers·k entries instead of every
    * scored (query, candidate) row — at corpus scale the scored stream
    * never leaves the mappers. Ordering (score desc, id asc) matches the
    * window formulation exactly (spec + oracle pinned).
    *
    * Null-similarity contract: candidates whose cosine is null (zero-norm
    * vectors) are EXCLUDED by the aggregate — a degenerate query whose
    * every candidate scores null returns no rows for that query_id, rather
    * than the window form's k null-ranked rows. Undefined similarity is
    * not a neighbor. */
  def bruteForceTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val v = vectors(s, d)
    val q = queryFilter(v)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    v.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("sim"), (col("pos") + 1).cast("int").as("rk"))
  }

  /** IVF-bucketed approximate top-k: assign every vector to its nearest
    * centroid (broadcast centroids, map-side argmax), probe the query's
    * `NProbe` nearest buckets only. Same output shape as brute force;
    * recall measured in the spec against [[bruteForceTopK]]. */
  /** Lloyd refinement rounds for the IVF centroids. */
  val KMeansIters = 3

  /** Deterministically-seeded k-means over the corpus: init = the
    * vec_id % CentroidStep sample, then `iters` rounds of
    * assign (broadcast argmax) + recompute (element-wise mean via
    * posexplode + per-dimension avg). Everything is DataFrame ops — no
    * ml.clustering, no RNG — so centroids are reproducible.
    *
    * The argmax is a partial-aggregated `max_by` over the scored cross
    * join, NOT a ranking window: a window would shuffle |corpus|×|cents|
    * rows (each carrying two embedding arrays) per Lloyd round, while
    * map-side max_by collapses to one row per vector before the shuffle —
    * a |cents|× reduction in shuffled rows. The `(cdist, -cent_id)`
    * ordering struct reproduces the window's deterministic tie-break
    * (highest similarity, then lowest centroid id). */
  def kmeansCentroids(s: SparkSession, v: DataFrame, iters: Int = KMeansIters)
      : DataFrame = {
    // seed step grows once n/CentroidStep would exceed IvfMaxLists:
    // an UN-capped `% CentroidStep` seed makes nlist linear in the
    // corpus and the assignment join n·nlist = n²/step — quadratic at
    // scale. Capped, assignment stays ≤ n·IvfMaxLists (linear) and the
    // centroid table stays broadcastable. No-op below ~100k vectors
    // (every committed test scale), so existing results are unchanged.
    val n = v.count()
    val step = math.max(CentroidStep.toLong,
      (n + IvfMaxLists - 1) / IvfMaxLists)
    var cents = v.filter(col("vec_id") % step === 0)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent_emb"))
    for (_ <- 0 until iters) {
      val assigned = nearestCentroid(s, v, cents)
      // element-wise mean via the vector_sum aggregate: one dim-length
      // buffer per centroid per mapper, vs the posexplode formulation's
      // |rows|·dim shuffled triples + second aggregation
      cents = assigned
        .groupBy(col("cent_id"))
        .agg(vectorSum(col("emb")).as("vsum"), count(lit(1)).as("cnt"))
        .select(col("cent_id"),
          transform(col("vsum"), x => x / col("cnt")).as("cent_emb"))
        .localCheckpoint()
    }
    cents
  }

  /** Nearest-centroid assignment: broadcast cross join + map-side
    * hash-aggregated argmax with deterministic (cdist, -cent_id)
    * tie-break — one shuffled row per vector. Shared by the k-means
    * loop, ivfTopK, and the scale probe. Input v: (vec_id, emb); cents:
    * (cent_id, cent_emb). Round 10: the argmax is
    * [[graft.functions.AggregateKernels.argMaxTieMinId]] and `emb`
    * re-attaches with a narrow equi-join — the prior
    * max_by(_, struct(…)) + first(array) form has non-mutable buffer
    * types, which silently demoted this aggregate to SortAggregateExec:
    * the n·|cents| crossJoin stream was SORTED per task with both
    * embedding arrays riding every row (the argMaxTieMinId scaladoc has
    * the measured evidence).
    *
    * PRECONDITION: `vec_id` must be UNIQUE in v and v must be
    * deterministic under re-evaluation (it is read twice: argmax input
    * and emb join-back). Every caller feeds a parquet/checkpoint-backed
    * frame keyed by a primary id; a duplicate-keyed input would
    * multiply join-back rows where the old groupBy+first collapsed
    * them. Same contract at pqAssign ((vec_id, m) unique) and
    * semdedup's assignTo. */
  def nearestCentroid(s: SparkSession, v: DataFrame, cents: DataFrame)
      : DataFrame =
    v.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .crossJoin(broadcast(cents))
      .withColumn("cdist", cosine(col("emb"), col("cent_emb")))
      .groupBy(col("vec_id"))
      .agg(graft.functions.AggregateKernels.argMaxTieMinId(
        col("cdist"), col("cent_id")).as("cent_id"))
      .join(v.select(col("vec_id"), col("emb")), Seq("vec_id"))
      .select(col("vec_id"), col("cent_id"), col("emb"))

  // ---------------------------------------------------------------- RP-LSH

  /** Random-hyperplane LSH geometry: 4 bands × (adaptive) bits.
    * Deterministic fixed-seed gaussians — signatures are reproducible
    * across runs and partitionings.
    *
    * Bits per band ADAPT to the corpus (round 9): a FIXED 8-bit band
    * has only 256 buckets, so per-band candidate volume Σ|bucket|² ≈
    * n²/256 is quadratic no matter how good the hash is — the ×64 run
    * convicted q83 at 15.6× time for 4× data from exactly this (plus
    * the truth arm, fixed separately). bits = ⌈log₂(n/64)⌉ keeps
    * expected bucket size ~64, so candidates stay ~4·64·n = linear.
    * Floor 8 (identical signatures at every committed test scale —
    * bits only grow past ~16k vectors), cap 24 (16M buckets; int keys).
    * Recall at the planted cosine ≈ 0.999: per-bit agreement
    * p = 1 − acos(0.999)/π ≈ 0.9858, band miss (1−p^b)⁴ — 1.4e-4 at
    * b=8, 7.3e-3 at b=24: the 0.9 recall gate keeps wide margin over
    * the whole adaptive range. */
  val LshBands = 4
  val LshBitsPerBand = 8
  val LshMaxBits = 24
  val LshTargetBucket = 64L
  private val hyperplaneCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  private def hyperplanes(bits: Int): Array[Array[Double]] =
    hyperplaneCache.computeIfAbsent(bits, { b =>
      val r = new scala.util.Random(42)
      Array.fill(LshBands * b)(Array.fill(64)(r.nextGaussian()))
    })
  private def lshBits(corpusSize: Long): Int = {
    var b = LshBitsPerBand
    while (b < LshMaxBits && (corpusSize >> b) > LshTargetBucket) b += 1
    b
  }

  /** Near-duplicate detection over embeddings via random-hyperplane LSH
    * (the SimHash construction for cosine space, Charikar'02): sign
    * pattern of 32 hyperplane projections, banded 4×8 bits; vectors
    * agreeing on any band become candidates; candidates are verified with
    * exact cosine. The quadratic all-pairs compare becomes
    * |bucket|²-bounded work per (band, key) bucket — the 100 TB
    * embedding-dedup shape: candidate generation shuffles slim
    * (band, key, vec_id) triples only, arrays re-attach for survivors.
    *
    * The corpus is augmented with deterministic planted near-duplicates
    * (alternate dims scaled ±2%, cosine ≈ 0.999 to their source): the
    * synthetic embeddings are near-orthogonal random vectors, so without
    * planting there is nothing above any meaningful threshold and the
    * query would be vacuous. The spec measures planted-pair recall. */
  def rpLshNearDup(s: SparkSession, d: String,
      threshold: Double = 0.9): DataFrame = {
    val v0 = vectors(s, d)
    val planted = v0.select((col("vec_id") + 1000000L).as("vec_id"),
      expr("transform(emb, (x, i) -> CASE WHEN i % 2 = 0 " +
        "THEN x * 1.02 ELSE x * 0.98 END)").as("emb"))
    val v = v0.unionByName(planted)
    // corpus = 2·|v0| (planted doubles it); one memoized count sizes
    // the band width — see lshBits
    val bits = lshBits(2 * corpusCount(v0, 1L, 1L))

    val planes = hyperplanes(bits)
    val bandCols = (0 until LshBands).map { b =>
      (0 until bits).map { j =>
        val w = array(planes(b * bits + j).map(lit): _*)
        when(dot(col("emb"), w) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    val sigs = v.select(col("vec_id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bkey")))

    // candidate pairs: same (band, key); slim id-only shuffle; dedup pairs
    // found by several bands before touching any arrays
    val a = sigs.select(col("band"), col("bkey"), col("vec_id").as("vec_a"))
    val b = sigs.select(col("band"), col("bkey"), col("vec_id").as("vec_b"))
    val cands = a.join(b, Seq("band", "bkey"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()

    cands
      .join(v.select(col("vec_id").as("vec_a"), col("emb").as("emb_a")),
        Seq("vec_a"))
      .join(v.select(col("vec_id").as("vec_b"), col("emb").as("emb_b")),
        Seq("vec_b"))
      .withColumn("sim", cosine(col("emb_a"), col("emb_b")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
  }

  // ------------------------------------------------------------------- PQ

  /** PQ geometry: 64 dims → 8 subspaces × 8 dims, deterministic
    * vec_id % 29 seed CAPPED at 256 codes per subspace (PqMaxCodes), 2
    * Lloyd rounds, 40 ADC candidates re-ranked exactly. The cap is
    * PQ's definition, not a tuning choice: a code must fit one byte
    * (the "8 bytes per vector" compression story), and an un-capped
    * `% 29` seed makes the codebook linear in the corpus — training
    * cost n·K = n²/29 (quadratic) and the ADC LUT broadcast
    * corpus-proportional. Capped, training is ≤ n·256 per round and
    * the LUT stays |queries|·256·8 rows at any corpus size. The cap
    * only engages past ~7.4k vectors, so every committed test-scale
    * result is unchanged. */
  val PqM = 8
  val PqSubDim = 8
  val PqCentStep = 29
  val PqMaxCodes = 256L
  val PqIters = 2
  val PqCand = 40

  /** (vec_id, m, sv) → nearest sub-centroid per subspace (L2, via the
    * identity argmin‖s−c‖² = argmax(s·c − ½‖c‖²) so the per-pair kernel is
    * the NATIVE fused-loop dot product — the HOF zip_with L2 blocked
    * whole-stage codegen and allocated a zipped array per evaluation,
    * measured 3-4× slower on the |subvectors|×|centroids| join). ½‖c‖² is
    * computed once per centroid, not per pair. Deterministic (score,
    * lowest-code) tie-break; one shuffled row per (vector, subspace). */
  private def pqAssign(sub: DataFrame, cents: DataFrame): DataFrame = {
    val c2 = cents.withColumn("halfn",
      lit(0.5) * dot(col("cv"), col("cv")))
    // hash-aggregated argmax + sv join-back (round 10): max_by(struct)
    // + first(array) buffers demote to SortAggregateExec and sort the
    // |subvectors|·|codes| stream per task — argMaxTieMinId's scaladoc
    // has the measured evidence. PRECONDITION (nearestCentroid scaladoc):
    // (vec_id, m) unique in sub and sub deterministic — it is read twice
    sub.join(broadcast(c2), Seq("m"))
      .withColumn("score", dot(col("sv"), col("cv")) - col("halfn"))
      .groupBy(col("vec_id"), col("m"))
      .agg(graft.functions.AggregateKernels.argMaxTieMinId(
        col("score"), col("code")).as("code"))
      .join(sub.select(col("vec_id"), col("m"), col("sv")),
        Seq("vec_id", "m"))
      .select(col("vec_id"), col("m"), col("code"), col("sv"))
  }

  /** Product-quantization ANN (Jégou et al. 2011): per-subspace codebooks
    * from a deterministic joint k-means (ONE grouped Lloyd loop covers all
    * 8 subspaces — centroids keyed by (m, code)), vectors encode to 8
    * small codes, and queries score candidates through an ADC lookup
    * table: dot(q, v) ≈ Σ_m dot(q_m, centroid[m, code_m(v)]), a join on
    * (m, code) + partial-aggregated sum instead of any full-vector math.
    * Top ADC candidates are re-ranked with exact cosine. At 100 TB the
    * corpus stores 8 bytes of codes per vector (64× compression) and the
    * scan does table lookups, not 64-dim arithmetic; recall vs exact
    * brute force is the spec's business. */
  def pqTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val v = vectors(s, d)
    val fp = WarehouseCache.sourceFingerprint(s, d, "embeddings.parquet")
    pqAnn(s, v, "graft_pq" + WarehouseCache.dirSuffix(d), fp, k)
  }

  /** OPQ-style rotated PQ (Ge et al., CVPR'13): plain PQ quantizes each
    * subspace independently, so subspaces that happen to carry more
    * variance than others are quantized coarser for the same code budget.
    * OPQ's fix is an orthogonal transform R chosen to balance variance
    * across subspaces before splitting. This implements OPQ's
    * eigenvalue-allocation idea restricted to PERMUTATION rotations over
    * the raw coordinates: per-dimension variances (one vector_sum pass
    * over the corpus) are greedily bin-packed — largest variance first,
    * into the least-loaded subspace with room — and the resulting
    * permutation (an orthogonal matrix, deterministic, data-derived, no
    * RNG) re-orders every vector before the standard PQ pipeline runs.
    * Cosine is permutation-invariant, so scoring and exact re-ranking in
    * the permuted space equal the original space; the permutation itself
    * persists in the WarehouseCache next to the codebooks it shapes. */
  def opqTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    import scala.collection.mutable.ArrayBuffer
    val v = vectors(s, d)
    val fp = WarehouseCache.sourceFingerprint(s, d, "embeddings.parquet")
    val sfx = WarehouseCache.dirSuffix(d)
    val permDf = WarehouseCache.cachedParquet(s, s"graft_opq_perm$sfx", fp) {
      val row = v.agg(vectorSum(col("emb")).as("s1"),
        vectorSum(transform(col("emb"), x => x * x)).as("s2"),
        count(lit(1)).as("n")).head()
      val dim = PqM * PqSubDim
      val perm: Array[Int] =
        if (row.isNullAt(0)) (0 until dim).toArray // empty corpus: identity
        else {
          val s1 = row.getSeq[Double](0).toArray
          val s2 = row.getSeq[Double](1).toArray
          val n = row.getLong(2).toDouble
          val vars = s1.indices
            .map(i => s2(i) / n - math.pow(s1(i) / n, 2)).toArray
          val binSum = Array.fill(PqM)(0.0)
          val bins = Array.fill(PqM)(ArrayBuffer.empty[Int])
          vars.zipWithIndex.sortBy { case (vr, i) => (-vr, i) }.foreach {
            case (vr, i) =>
              val b = (0 until PqM).filter(bins(_).size < PqSubDim)
                .minBy(binSum)
              bins(b) += i
              binSum(b) += vr
          }
          bins.flatMap(_.toArray)
        }
      import s.implicits._
      perm.zipWithIndex.map { case (src, pos) => (pos, src) }.toSeq
        .toDF("pos", "src")
    }
    val perm = permDf.collect().map(r => r.getInt(0) -> r.getInt(1))
      .sortBy(_._1).map(_._2)
    val vRot = v.select(col("vec_id"),
      array(perm.map(i => col("emb").getItem(i)).toIndexedSeq: _*).as("emb"))
    pqAnn(s, vRot, s"graft_opq$sfx", fp, k)
  }

  /** The PQ pipeline shared by [[pqTopK]] and [[opqTopK]], over whatever
    * (possibly transformed) vector space `v` presents.
    * Codebooks and encoded codes are the PQ INDEX: deterministic
    * functions of the corpus, trained/encoded once per corpus snapshot
    * and persisted (WarehouseCache, fingerprint-invalidated) — exactly
    * how a production ANN index amortizes its offline build. Per-query
    * work below is LUT construction + ADC scan + re-rank only. */
  private def pqAnn(s: SparkSession, v: DataFrame, prefix: String,
      fp: String, k: Int): DataFrame = {
    // materialized once per BUILD (localCheckpoint, not cache: scratch
    // that CacheManager would never release); lazy so a cache hit never
    // evaluates the explode at all
    lazy val sub = v.select(col("vec_id"),
      posexplode(expr(s"transform(sequence(0, ${PqM - 1}), " +
        s"m -> slice(emb, m * $PqSubDim + 1, $PqSubDim))"))
        .as(Seq("m", "sv"))).localCheckpoint()

    val cents = WarehouseCache.cachedParquet(s, s"${prefix}_codebook", fp) {
      // cap the seed at PqMaxCodes per subspace (see the PQ geometry
      // doc): count runs only on a build, never on a cache hit
      val n = v.count()
      val step = math.max(PqCentStep.toLong,
        (n + PqMaxCodes - 1) / PqMaxCodes)
      var c = sub.filter(col("vec_id") % step === 0)
        .select(col("m"), col("vec_id").as("code"), col("sv").as("cv"))
      for (_ <- 0 until PqIters) {
        c = pqAssign(sub, c)
          .groupBy(col("m"), col("code"))
          .agg(graft.functions.AggregateKernels.vectorSum(col("sv")).as("vs"),
            count(lit(1)).as("cnt"))
          .select(col("m"), col("code"),
            transform(col("vs"), x => x / col("cnt")).as("cv"))
          .localCheckpoint()
      }
      c
    }
    val codes = WarehouseCache.cachedParquet(s, s"${prefix}_codes", fp) {
      pqAssign(sub, cents).select(col("vec_id"), col("m"), col("code"))
    }

    val q = queryFilter(v)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val qsub = q.select(col("query_id"),
      posexplode(expr(s"transform(sequence(0, ${PqM - 1}), " +
        s"m -> slice(q_emb, m * $PqSubDim + 1, $PqSubDim))"))
        .as(Seq("m", "qv")))
    val lut = qsub.join(broadcast(cents), Seq("m"))
      .select(col("query_id"), col("m"), col("code"),
        dot(col("qv"), col("cv")).as("part"))

    val adc = codes.join(broadcast(lut), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("part")).as("adc"))
    val cand = adc.groupBy(col("query_id"))
      .agg(topKByScore(col("adc"), col("vec_id"), PqCand).as("cs"))
      .select(col("query_id"), explode(col("cs")).as("c"))
      .select(col("query_id"), col("c").getField("id").as("vec_id"))

    cand
      .join(v, Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("sim"), (col("pos") + 1).cast("int").as("rk"))
  }

  /** IVF+PQ residual ANN (the IVFADC scheme of Jégou et al. 2011 §IV):
    * vectors assign to a coarse centroid, the PQ codebooks quantize the
    * RESIDUAL v − c(v) rather than v itself — residual energy is much
    * smaller than vector energy, so the same code budget quantizes finer.
    * Scoring decomposes exactly: dot(q, v) ≈ dot(q, c(v)) + Σ_m dot(q_m,
    * cb[m, code_m]) — one per-(query, centroid) coarse term + the same ADC
    * lookup join as plain PQ, restricted to the probed buckets. All three
    * index artifacts (coarse centroids, inverted lists with codes,
    * residual codebooks) are deterministic corpus functions persisted via
    * [[graft.operators.WarehouseCache]]; per-query work is probe + ADC
    * over nprobe/ncentroids of the corpus + exact re-rank of [[PqCand]].
    * At 100 TB: lists store 8-byte codes, the scan does table lookups. */
  def ivfPqTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val v = vectors(s, d)
    val fp = WarehouseCache.sourceFingerprint(s, d, "embeddings.parquet")
    val sfx = WarehouseCache.dirSuffix(d)
    val coarse = WarehouseCache.cachedParquet(s, s"graft_ivfpq_coarse$sfx", fp)(
      kmeansCentroids(s, v))
    val lists = WarehouseCache.cachedParquet(s, s"graft_ivfpq_lists$sfx", fp)(
      nearestCentroid(s, v, coarse))
    // residual subvectors (build-only; lazy so cache hits skip it)
    lazy val sub = lists.join(broadcast(coarse), Seq("cent_id"))
      .select(col("vec_id"),
        zip_with(col("emb"), col("cent_emb"), (a, b) => a - b).as("remb"))
      .select(col("vec_id"),
        posexplode(expr(s"transform(sequence(0, ${PqM - 1}), " +
          s"m -> slice(remb, m * $PqSubDim + 1, $PqSubDim))"))
          .as(Seq("m", "sv"))).localCheckpoint()
    val cb = WarehouseCache.cachedParquet(s, s"graft_ivfpq_codebook$sfx", fp) {
      // same PqMaxCodes cap as pqAnn's codebook (PQ geometry doc)
      val n = v.count()
      val step = math.max(PqCentStep.toLong,
        (n + PqMaxCodes - 1) / PqMaxCodes)
      var c = sub.filter(col("vec_id") % step === 0)
        .select(col("m"), col("vec_id").as("code"), col("sv").as("cv"))
      for (_ <- 0 until PqIters) {
        c = pqAssign(sub, c)
          .groupBy(col("m"), col("code"))
          .agg(vectorSum(col("sv")).as("vs"), count(lit(1)).as("cnt"))
          .select(col("m"), col("code"),
            transform(col("vs"), x => x / col("cnt")).as("cv"))
          .localCheckpoint()
      }
      c
    }
    val codes = WarehouseCache.cachedParquet(s, s"graft_ivfpq_codes$sfx", fp) {
      pqAssign(sub, cb).select(col("vec_id"), col("m"), col("code"))
    }

    val q = queryFilter(v)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    // per-(query, centroid) coarse terms: dot for the score decomposition,
    // cosine for probe ranking (same probe rule as ivfTopK)
    val qc = q.crossJoin(broadcast(coarse))
      .select(col("query_id"), col("cent_id"),
        dot(col("q_emb"), col("cent_emb")).as("cdot"),
        cosine(col("q_emb"), col("cent_emb")).as("cdist"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cent_id"))
    val probes = qc.withColumn("crk", row_number().over(pw))
      .filter(col("crk") <= NProbe)
      .select(col("query_id"), col("cent_id"), col("cdot"))

    // ADC lookup table on the QUERY subvectors (not query residuals:
    // dot(q, r) already decomposes over q's own subvectors)
    val qsub = q.select(col("query_id"),
      posexplode(expr(s"transform(sequence(0, ${PqM - 1}), " +
        s"m -> slice(q_emb, m * $PqSubDim + 1, $PqSubDim))"))
        .as(Seq("m", "qv")))
    val lut = qsub.join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("m"), col("code"),
        dot(col("qv"), col("cv")).as("part"))

    // candidates restricted to probed buckets; score = coarse + residual ADC
    val cand0 = lists.select(col("vec_id"), col("cent_id"))
      .join(probes, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
    val adc = cand0.join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("query_id", "m", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(first(col("cdot")).as("cdot"), sum(col("part")).as("radc"))
      .select(col("query_id"), col("vec_id"),
        (col("cdot") + col("radc")).as("score"))
    val cand = adc.groupBy(col("query_id"))
      .agg(topKByScore(col("score"), col("vec_id"), PqCand).as("cs"))
      .select(col("query_id"), explode(col("cs")).as("c"))
      .select(col("query_id"), col("c").getField("id").as("vec_id"))

    cand
      .join(v, Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("sim"), (col("pos") + 1).cast("int").as("rk"))
  }

  def ivfTopK(s: SparkSession, d: String, k: Int = 5): DataFrame =
    ivfTopKProbed(s, d, k, NProbe)

  /** [[ivfTopK]] with an explicit probe budget — the tuning axis the
    * probe-curve query (q281) sweeps; `ivfTopK` is the nprobe = NProbe
    * point, byte-identical plan. */
  def ivfTopKProbed(s: SparkSession, d: String, k: Int, nprobe: Int)
      : DataFrame = {
    val v = vectors(s, d)
    // Centroids + inverted lists are the IVF INDEX — deterministic
    // corpus functions, built once per corpus snapshot and persisted
    // (WarehouseCache, fingerprint-invalidated). Per-query work is
    // probe selection + scoring the probed buckets.
    val fp = WarehouseCache.sourceFingerprint(s, d, "embeddings.parquet")
    val sfx = WarehouseCache.dirSuffix(d)
    val cents = WarehouseCache.cachedParquet(s, s"graft_ivf_centroids$sfx", fp)(
      kmeansCentroids(s, v))

    // corpus → nearest bucket (see nearestCentroid); the persisted form
    // IS the inverted-lists layout (bucket-keyed vectors)
    val assigned = WarehouseCache.cachedParquet(s, s"graft_ivf_lists$sfx", fp)(
      nearestCentroid(s, v, cents))

    // queries → NProbe nearest buckets: the query set is tiny, so a ranking
    // window is fine — but over slim (query_id, cent_id, cdist) triples,
    // with q_emb re-attached by a broadcast join afterwards
    val q = queryFilter(v)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("cent_id"),
        cosine(col("q_emb"), col("cent_emb")).as("cdist"))
      .withColumn("crk", row_number().over(pw))
      .filter(col("crk") <= nprobe)
      .select(col("query_id"), col("cent_id"))
      .join(broadcast(q), Seq("query_id"))

    // probe-bucket scoring, top-k via the bounded-heap aggregate (see
    // bruteForceTopK — scored rows never shuffle, only k-entry heaps)
    assigned
      .join(probes, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("sim"), (col("pos") + 1).cast("int").as("rk"))
  }

  /** Scalar-quantized (SQ8) ANN — the third quantization family next to
    * IVF (q31/q96) and PQ (q84/q112): each dimension compresses to one
    * byte against per-dim corpus [min, max] (code = ⌊(x−mn)/(mx−mn)·256⌋
    * clamped to 255), and search scores the RAW query against the
    * dequantized reconstruction mn + (c+0.5)·(mx−mn)/256 — asymmetric
    * distance computation, 4× smaller vectors than float32 with no
    * codebook training. Unlike PQ, the quantizer is CLOSED-FORM, so the
    * whole path is DuckDB-oracle-checkable (floor is IEEE-exact — no
    * rounding-mode ties — and every scalar op is a mirrored single IEEE
    * instruction; the dot fold runs in index order on both engines).
    * Scale shape: min/max is one map-side-combined pass whose 2·dim
    * result broadcasts; encoding is a pure map (codes persist beside the
    * corpus at 100 TB — same artifact contract as the PQ codes); queries
    * broadcast and the corpus never shuffles; top-k is the bounded-heap
    * aggregate (k entries per query per mapper). */
  def sq8TopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val v = vectors(s, d)
    val mm = v.select(posexplode(col("emb")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(i, mn))), " +
        "t -> t.mn)").as("mns"),
        expr("transform(array_sort(collect_list(struct(i, mx))), " +
          "t -> t.mx)").as("mxs"))
    val deq = v.crossJoin(broadcast(mm))
      .select(col("vec_id"),
        expr("transform(sequence(0, size(emb) - 1), i -> " +
          "CASE WHEN element_at(mxs, i + 1) > element_at(mns, i + 1) " +
          "THEN element_at(mns, i + 1) + " +
          "(least(floor((element_at(emb, i + 1) - element_at(mns, i + 1))" +
          " / (element_at(mxs, i + 1) - element_at(mns, i + 1)) * 256), " +
          "255) + 0.5) * " +
          "(element_at(mxs, i + 1) - element_at(mns, i + 1)) / 256 " +
          "ELSE element_at(mns, i + 1) END)").as("deq"))
    val q = queryFilter(v)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"))
    deq.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(expr("aggregate(zip_with(qe, deq, (x, y) -> x * y), 0D, " +
          "(a, b) -> a + b)"), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("sim"), (col("pos") + 1).cast("int").as("rk"))
  }

  /** Two-stage retrieve-then-rerank ANN — the production retrieval
    * pattern: a cheap approximate stage over COMPRESSED vectors builds a
    * per-query shortlist, then the exact metric runs only on shortlist
    * candidates. Stage 1 scores approximate cosine against the SQ8
    * dequantized corpus (same codec as [[sq8TopK]]) and keeps a
    * `shortlist`-sized bounded heap per query (partial-aggregated — the
    * scored stream never leaves the mappers); stage 2 re-joins the
    * shortlist ids to the EXACT vectors and reranks with exact cosine,
    * so whenever the shortlist covers the true top-k the output is
    * IDENTICAL to brute force — which is the oracle here: the DuckDB
    * side computes exact brute-force top-k with no knowledge of the
    * two-stage plan, so the hash match certifies shortlist recall 1.0
    * end-to-end. At 100 TB stage 1 reads 1 byte/dim instead of 8 and
    * stage 2 touches |Q|·shortlist rows — the full-precision corpus is
    * random-accessed, never scanned. */
  def rerankTopK(s: SparkSession, d: String, shortlist: Int = 50,
      k: Int = 5): DataFrame = {
    val v = vectors(s, d)
    val mm = v.select(posexplode(col("emb")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(i, mn))), " +
        "t -> t.mn)").as("mns"),
        expr("transform(array_sort(collect_list(struct(i, mx))), " +
          "t -> t.mx)").as("mxs"))
    val deq = v.crossJoin(broadcast(mm))
      .select(col("vec_id"),
        expr("transform(sequence(0, size(emb) - 1), i -> " +
          "CASE WHEN element_at(mxs, i + 1) > element_at(mns, i + 1) " +
          "THEN element_at(mns, i + 1) + " +
          "(least(floor((element_at(emb, i + 1) - element_at(mns, i + 1))" +
          " / (element_at(mxs, i + 1) - element_at(mns, i + 1)) * 256), " +
          "255) + 0.5) * " +
          "(element_at(mxs, i + 1) - element_at(mns, i + 1)) / 256 " +
          "ELSE element_at(mns, i + 1) END)").as("deq"))
    val q = queryFilter(v)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"))
    val short = deq
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qe"), col("deq")).as("asim"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("asim"), col("vec_id"), shortlist).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("c"))
      .select(col("query_id"), col("c.id").as("vec_id"))
    short
      .join(v, Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qe"), col("emb")), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("sim"), (col("pos") + 1).cast("int").as("rk"))
  }

  // ------------------------------------------------- driver-checkable ANN

  /** Collapses an ANN method's quality into values the driver's oracle
    * gate can hash: the query count (oracle-reproducible — DuckDB counts
    * the same deterministic query subset) and aggregate recall@k vs the
    * exact brute-force top-k, as a boolean against `bound`. The
    * neighbor SETS themselves cannot be oracled (they depend on
    * centroid/codebook construction DuckDB cannot replicate), but on
    * fixed data + fixed seeds the recall is a deterministic number, so
    * "recall ≥ bound" is a hashable contract: break the index build and
    * the boolean flips. Bounds sit well below the measured sf0.01
    * values (IVF/SQ8 measure ≈1.0; PQ-family well above 0.5) so a
    * testdata regeneration cannot flap them. */
  def annRecallCheck(method: DataFrame, bf: DataFrame, bound: Double)
      : DataFrame = {
    val truth = bf.select(col("query_id"), col("neighbor_id"))
    val hits = truth
      .join(method.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .agg(count(lit(1)).as("n_hits"))
    val tot = truth.agg(
      count_distinct(col("query_id")).as("n_queries"),
      count(lit(1)).as("n_truth"))
    tot.crossJoin(broadcast(hits))
      .select(col("n_queries"),
        (col("n_hits") >= col("n_truth") * bound).as("recall_ok"))
  }

  /** IVF probe-budget recall curve — the recall-vs-nprobe tuning table
    * every production vector store publishes before fixing an operating
    * point (q31 pins ONE point; this sweeps the axis). Per budget
    * (1, 2, 4, NProbe): recall@k of [[ivfTopKProbed]] against the exact
    * brute-force truth, reported as two in-query booleans —
    * `recall_nondecreasing` (probe sets are nested by construction:
    * budget b's buckets are a PREFIX of budget b′ > b's ranking, so a
    * truth member found at b is still a candidate at b′, and a true
    * top-k vector is displaced from the heap only by globally-closer
    * vectors, of which fewer than k exist — recall can only grow) and
    * `recall_ok` (the committed ≥ 0.5 bound at the production NProbe
    * operating point). The exact columns (panel size, truth pair count,
    * mean true top-1 similarity in DECIMAL) are oracle-reproducible.
    *
    * Scale shape: the truth arm is q30's committed brute-force class
    * (fixed-rate panel); each budget's arm reuses the WarehouseCache
    * index and probes nprobe/|centroids| of the corpus; the curve
    * assembly windows over |probes| = 4 metadata rows. */
  def ivfProbeCurve(s: SparkSession, d: String, k: Int = 5,
      probes: Seq[Int] = Seq(1, 2, 4, NProbe)): DataFrame = {
    val truth = bruteForceTopK(s, d, k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk"))
      .localCheckpoint() // stats + one hits-join per probe budget
    val stats = truth.agg(
      countDistinct(col("query_id")).as("n_queries"),
      count(lit(1)).as("truth_pairs"),
      round(avg(when(col("rk") === 1,
        col("sim").cast("decimal(18,6)"))).cast("double"), 6)
        .as("mean_true_top1"))
    val rows = probes.map { np =>
      ivfTopKProbed(s, d, k, np)
        .select(col("query_id"), col("neighbor_id"))
        .join(truth.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(np).as("nprobe"), col("hits"))
    }.reduce(_.union(_))
    // |probes|-row metadata frame: the bare window is bounded by the
    // sweep length, never by data
    val w = Window.orderBy(col("nprobe"))
    rows.crossJoin(broadcast(stats))
      .withColumn("prev_hits", lag(col("hits"), 1).over(w))
      .select(col("nprobe"), col("n_queries"), col("truth_pairs"),
        col("mean_true_top1"),
        coalesce(col("hits") >= col("prev_hits"), lit(true))
          .as("recall_nondecreasing"),
        (col("nprobe") < lit(NProbe) ||
          col("hits") * 2 >= col("truth_pairs")).as("recall_ok"))
  }

  def ivfRecallCheck(s: SparkSession, d: String): DataFrame =
    annRecallCheck(ivfTopK(s, d), bruteForceTopK(s, d), 0.5)
  def pqRecallCheck(s: SparkSession, d: String): DataFrame =
    annRecallCheck(pqTopK(s, d), bruteForceTopK(s, d), 0.5)
  def opqRecallCheck(s: SparkSession, d: String): DataFrame =
    annRecallCheck(opqTopK(s, d), bruteForceTopK(s, d), 0.5)
  def ivfPqRecallCheck(s: SparkSession, d: String): DataFrame =
    annRecallCheck(ivfPqTopK(s, d), bruteForceTopK(s, d), 0.5)

  /** Driver-checkable form of [[rpLshNearDup]]: the exact ≥-threshold
    * pair count over the planted corpus (oracle-reproducible — DuckDB
    * rebuilds the same deterministic planted vectors and cosines) plus
    * LSH recall against that exact truth as a boolean. The planted
    * pairs sit at cosine ≈ 0.999 where banded detection misses at most
    * ~7e-3 of pairs over the whole adaptive-bits range, so 0.9 has
    * wide margin on any regeneration. The exact-truth arm runs on a
    * deterministic FIXED-SIZE sample (round 9 — the q271/q139
    * fixed-panel rule): step = max(5, ⌈n/1280⌉) from one memoized
    * count, so the quadratic ground-truth pass is ~2560 vectors at ANY
    * corpus size (the old fixed % 5 sample grew with the corpus and
    * the ×64 run convicted the pass at 15.6× time for 4× data).
    * Sampling keys on `vec_id % 10⁶` keeps every planted counterpart
    * (id + 10⁶) in or out WITH its source for any step — mirrored
    * verbatim in the oracle SQL. Engages only past 6.4k vectors; all
    * committed gate scales keep the exact % 5 sample bit-identical. */
  def rpLshRecallCheck(s: SparkSession, d: String,
      threshold: Double = 0.9): DataFrame = {
    val v0 = vectors(s, d)
    val step = corpusCount(v0, 5L, 1280L)
    val planted = v0.select((col("vec_id") + 1000000L).as("vec_id"),
      expr("transform(emb, (x, i) -> CASE WHEN i % 2 = 0 " +
        "THEN x * 1.02 ELSE x * 0.98 END)").as("emb"))
    val v = v0.unionByName(planted)
      .filter((col("vec_id") % 1000000L) % step === 0).localCheckpoint()
    val truth = v.select(col("vec_id").as("vec_a"), col("emb").as("ea"))
      .join(v.select(col("vec_id").as("vec_b"), col("emb").as("eb")),
        col("vec_a") < col("vec_b"))
      .filter(cosine(col("ea"), col("eb")) >= threshold)
      .select(col("vec_a"), col("vec_b"))
    val found = rpLshNearDup(s, d, threshold)
      .filter((col("vec_a") % 1000000L) % step === 0 &&
        (col("vec_b") % 1000000L) % step === 0)
      .select(col("vec_a"), col("vec_b"))
    val hits = truth.join(found, Seq("vec_a", "vec_b"))
      .agg(count(lit(1)).as("n_hits"))
    truth.agg(count(lit(1)).as("n_true_pairs"))
      .crossJoin(broadcast(hits))
      .select(col("n_true_pairs"),
        (col("n_hits") >= col("n_true_pairs") * 0.9).as("recall_ok"))
  }

  // ------------------------------------------------------------- SemDeDup

  /** Anchor cap for [[semDedupDf]]: a vector is compared against at most
    * this many lowest-id members of its cluster. The cap is the enforced
    * form of "cluster sizes are bounded" — without it a degenerate
    * embedding space (everything in one cluster) makes the in-cluster
    * pair join Σ|c|² = n² through a single join key, the exact hot-key
    * cliff q231/q232 closed this round. With it, per-cluster work is
    * ≤ |c|·cap (linear). No-op at every committed test scale
    * (expected |c| ≈ CentroidStep = 97 < 256). */
  val SemDedupAnchorCap = 256

  /** Hard cap on [[semDedupDf]]'s cluster-seed count — the assignment
    * pass scores every vector against every seed, so an uncapped
    * corpus-proportional seed sample is quadratic (see the in-function
    * comment). 1024 clusters is the IvfMaxLists discipline. */
  val SemMaxClusters = 1024

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then drop any
    * vector whose cosine to a LOWER-id member of its own cluster
    * reaches the threshold — keep-lowest-id, the deterministic form of
    * the paper's keep-one-per-duplicate-group rule. Clustering is
    * TRAINED k-means, not a raw seed sample: the capped
    * `% CentroidStep` modulo sample seeds one Lloyd refinement round
    * under [[Clustering]]'s cross-engine determinism discipline
    * (per-dimension DECIMAL(30,12) means — order-independent sums —
    * re-quantized to 7 dp), then vectors assign to the REFINED
    * centroids. Refined centroids track embedding density where raw
    * modulo seeds don't: with skewed density, seed-sample clusters are
    * unbalanced, degrading both the anchor cap's one-sided error and
    * recall of the dup decision. (Precondition unchanged: ids dense
    * enough that the modulo sample is non-empty — an id space dodging
    * every multiple of CentroidStep yields no seeds and an empty
    * result. Empty clusters drop after refinement; surviving cluster
    * ids remain their seed's vec_id.)
    *
    * Determinism across engines: assignment ranks the 6-dp-ROUNDED
    * cosine with a lowest-centroid-id tie-break (the q30 discipline —
    * both engines rank the identical rounded double), centroid means
    * follow the q165 DECIMAL rule so the oracle rebuilds bit-identical
    * centroid arrays, and the dup decision compares the 6-dp-rounded
    * pair cosine against the threshold, so the oracle reproduces every
    * boolean exactly.
    *
    * 100 TB shape: assignment is a broadcast cross join + map-side
    * argmax (one shuffled row per vector); the pair join shuffles on
    * cluster_id with the anchor side capped at [[SemDedupAnchorCap]]
    * lowest ids per cluster (a bounded-heap aggregate — ≤ cap entries
    * per mapper per cluster, never a per-cluster sort), so per-cluster
    * work is linear in |c| even for a mega cluster. Vectors beyond the
    * cap's id range can still BE dropped (they are
    * compared against the capped prefix) — the estimator effect of the
    * cap is only that dups detectable solely via a >cap-rank anchor
    * are kept, the same documented one-sided semantics as the q232
    * degree cap. */
  def semDedupDf(s: SparkSession, v: DataFrame,
      threshold: Double = 0.3,
      anchorCap: Int = SemDedupAnchorCap): DataFrame = {
    // The seed set is HARD-CAPPED at the SemMaxClusters lowest seed
    // ids (TakeOrdered partial top-k, never a global sort): an
    // uncapped % CentroidStep sample grows WITH the corpus, making the
    // broadcast-argmax assignment n·seeds ∝ n²/97 — the same
    // corpus-proportional-codebook defect the round's ×16 close caught
    // in the PQ/IVF builds (PqMaxCodes/IvfMaxLists), surfaced here by
    // the ×64 semdedup_mega_cluster probe (5.2× for 4× data). The cap
    // engages only past ~100 k vectors (sf0.1 has 52 seeds, the ×16
    // replica 825), so every committed test-scale result is unchanged.
    val seeds = v.filter(col("vec_id") % CentroidStep === 0)
      .orderBy(col("vec_id")).limit(SemMaxClusters)
      .select(col("vec_id").as("cluster_id"), col("emb").as("cent_emb"))
    // broadcast-argmax assignment against a (bounded) centroid table:
    // one shuffled row per vector, deterministic (csim desc, lowest
    // cluster_id) tie-break. Round 10: hash-aggregated argmax
    // (argMaxTieMinId — its scaladoc has the measured evidence) with
    // emb re-attached by a narrow equi-join; the prior max_by(struct)
    // + first(array) form demoted to SortAggregateExec and sorted the
    // whole n·seeds crossJoin stream, which the ×128 mega-cluster
    // probe caught thrashing in sorter page allocation. PRECONDITION
    // (nearestCentroid scaladoc): vec_id unique in v, v deterministic —
    // v is a checkpointed projection of the embeddings table here.
    def assignTo(cents: DataFrame): DataFrame = v
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", round(cosine(col("emb"), col("cent_emb")), 6))
      .groupBy(col("vec_id"))
      .agg(graft.functions.AggregateKernels.argMaxTieMinId(
        col("csim"), col("cluster_id")).as("cluster_id"))
      .join(v.select(col("vec_id"), col("emb")), Seq("vec_id"))
      .select(col("vec_id"), col("cluster_id"), col("emb"))
    // ONE Lloyd refinement round (k-means, the q165 determinism rule):
    // per-dimension means in DECIMAL(30,12) — order-independent — then
    // /n and a 7-dp re-quantization, so both engines rebuild the same
    // centroid arrays bit-for-bit. The (cluster, pos) aggregate's
    // post-partial grain is ≤ SemMaxClusters·dim at any corpus size.
    val cents = assignTo(seeds)
      .select(col("cluster_id"), posexplode(col("emb")).as(Seq("pos", "x")))
      .groupBy(col("cluster_id"), col("pos"))
      .agg(sum(col("x").cast("decimal(30,12)")).as("sx"),
        count(lit(1)).as("n"))
      .select(col("cluster_id"), col("pos"),
        round(col("sx").cast("double") / col("n"), 7).as("m"))
      .groupBy(col("cluster_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        t => t.getField("m")).as("cent_emb"))
    val asg = assignTo(cents)
      // every branch below (anchor ranking, both pair-join sides, the
      // final left join) re-derives from the assignment; pin it so the
      // broadcast-argmax scan runs once
      .localCheckpoint()
    // lowest anchorCap ids per cluster via the bounded-heap aggregate,
    // NOT a per-cluster ranking window: a window must sort the whole
    // cluster in one task (a mega cluster would bottleneck there even
    // with the pair join capped), while the heap partial-aggregates to
    // ≤ cap entries per mapper per cluster before the shuffle
    val anchors = asg
      .groupBy(col("cluster_id"))
      .agg(graft.functions.AggregateKernels.topKByScore(
        (-col("vec_id")).cast("double"), col("vec_id"), anchorCap)
        .as("tk"))
      .select(col("cluster_id"), explode(col("tk")).as("a"))
      .select(col("cluster_id"), col("a.id").as("lo_id"))
      .join(asg.select(col("cluster_id"),
        col("vec_id").as("lo_id"), col("emb").as("lo_emb")),
        Seq("cluster_id", "lo_id"))
    val maxLower = asg.select(col("cluster_id"), col("vec_id"),
        col("emb"))
      .join(anchors, Seq("cluster_id"))
      .filter(col("lo_id") < col("vec_id"))
      .select(col("vec_id"),
        round(cosine(col("emb"), col("lo_emb")), 6).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max(col("sim")).as("max_sim_lower"))
    asg.join(maxLower, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster_id"), col("max_sim_lower"),
        coalesce(col("max_sim_lower") >= threshold, lit(false))
          .as("is_dup"))
  }

  def semDedup(s: SparkSession, d: String,
      threshold: Double = 0.3): DataFrame =
    semDedupDf(s, vectors(s, d), threshold)

  /** Filtered ANN — top-k under a metadata predicate (here: candidates
    * must share the query's `label`, the same-class / same-tenant /
    * same-language restriction every production vector store supports).
    * The output is the EXACT filtered top-k (strong oracle: brute force
    * within the label class, rounded-cosine + vec_id ordering), plus an
    * in-query recall check of the FILTERED-IVF arm — the scale path —
    * against that exact arm (the q31 discipline: the approximate arm is
    * judged by ground truth computed in the same query).
    *
    * PRE-filtering is the design choice that matters: the label
    * predicate applies at the inverted-list scan, before any scoring, so
    * selectivity cuts work proportionally — post-filtering k results
    * from an unfiltered search returns < k (or wrong) rows whenever the
    * filter is selective. The filtered arm probes 2·NProbe buckets
    * (double the unfiltered q31 budget) because a ~10%-selective
    * predicate thins each probed bucket ~10× — probe widening against
    * filter selectivity is the standard compensation, and the exact-arm
    * comparison measures whether it suffices.
    *
    * Scale shape: both arms reuse the cached corpus index (same
    * WarehouseCache artifacts as q31 — the index is built once per
    * corpus snapshot, filters are per-query); queries broadcast; top-k
    * is the bounded-heap aggregate; the corpus never shuffles. */
  def filteredTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val vl = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("emb"))
    val v = vl.select(col("vec_id"), col("emb"))
    val fp = WarehouseCache.sourceFingerprint(s, d, "embeddings.parquet")
    val sfx = WarehouseCache.dirSuffix(d)
    val cents = WarehouseCache.cachedParquet(
      s, s"graft_ivf_centroids$sfx", fp)(kmeansCentroids(s, v))
    val assigned = WarehouseCache.cachedParquet(
      s, s"graft_ivf_lists$sfx", fp)(nearestCentroid(s, v, cents))
    filteredTopKDf(s, vl, cents, assigned, k)
  }

  /** [[filteredTopK]] over an arbitrary (vec_id, label, emb) frame with
    * the IVF index (cents, assigned lists) supplied by the caller. */
  def filteredTopKDf(s: SparkSession, vl: DataFrame, cents: DataFrame,
      assigned: DataFrame, k: Int): DataFrame = {
    val q = queryFilter(vl)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("emb").as("q_emb"))
    val exact = vl
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .join(broadcast(q),
        col("label") === col("q_label") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("sim"), (col("pos") + 1).cast("int").as("rk"))
      .localCheckpoint() // the output AND the recall compare read it

    // filtered-IVF arm over the supplied (cached in the (s, d) form) index
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("cent_id"),
        cosine(col("q_emb"), col("cent_emb")).as("cdist"))
      .withColumn("crk", row_number().over(pw))
      .filter(col("crk") <= 2 * NProbe)
      .select(col("query_id"), col("cent_id"))
      .join(broadcast(q), Seq("query_id"))
    val ivf = assigned
      .join(vl.select(col("vec_id"), col("label")), Seq("vec_id"))
      .join(probes, Seq("cent_id"))
      .filter(col("label") === col("q_label") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("c"))
      .select(col("query_id"), col("c.id").as("neighbor_id"))

    val recall = exact.select(col("query_id"), col("neighbor_id"))
      .join(ivf, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    val nEx = exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_ex"))
    exact
      .join(broadcast(nEx.join(recall, Seq("query_id"), "left_outer")
        .select(col("query_id"),
          (coalesce(col("hits"), lit(0L)) * 2 >= col("n_ex"))
            .as("ivf_recall_ok"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk"),
        col("ivf_recall_ok"))
  }

  /** IVF index DELTA INGEST — the index-maintenance path every
    * production vector store needs: a batch of NEW vectors joins an
    * EXISTING index by assigning against the FROZEN centroids (one
    * map-side broadcast-argmax pass over just the batch — the same
    * per-batch cost shape as streaming ingestion), with NO re-clustering
    * and NO touch of the existing inverted lists. Search runs over the
    * union. The alternative — retraining k-means per batch — re-scans
    * the whole corpus for every arriving batch and invalidates every
    * cached list; frozen-centroid assignment is what FAISS's `add()`
    * does after `train()`.
    *
    * The corpus splits deterministically (vec_id % 7 == 3 ≈ 14% plays
    * the arriving batch); centroids train on the base only and cache
    * under their own WarehouseCache key (the frozen offline artifact);
    * the base lists cache too (delta ingest must not rebuild them); the
    * delta assignment recomputes per run — by design, it IS the ingest
    * cost being measured. Output is exact + invariant: query/truth
    * counts (oracle = full-corpus brute force), the truth mass supplied
    * by delta vectors (non-vacuous: the batch contains true neighbors),
    * and recall booleans overall AND restricted to delta-supplied truth
    * — proving newly ingested vectors are immediately findable through
    * the frozen index at the same ≥ 0.5 bound as q31. */
  def ivfDeltaRecallCheck(s: SparkSession, d: String): DataFrame = {
    val v = vectors(s, d)
    val base = v.filter(col("vec_id") % 7 =!= 3)
    val delta = v.filter(col("vec_id") % 7 === 3)
    val fp = WarehouseCache.sourceFingerprint(s, d, "embeddings.parquet")
    val sfx = WarehouseCache.dirSuffix(d)
    val cents = WarehouseCache.cachedParquet(
      s, s"graft_ivf_base_cents$sfx", fp)(kmeansCentroids(s, base))
    val asgBase = WarehouseCache.cachedParquet(
      s, s"graft_ivf_base_lists$sfx", fp)(nearestCentroid(s, base, cents))
    val found = ivfDeltaTopKFrom(s, v, cents,
      asgBase.unionByName(nearestCentroid(s, delta, cents)), 5)
    val truth = bruteForceTopK(s, d)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint() // totals + the hit join share it
    val hits = truth
      .join(found, Seq("query_id", "neighbor_id"))
      .agg(count(lit(1)).as("n_hits"),
        count_if(col("neighbor_id") % 7 === 3).as("delta_hits"))
    truth.agg(count_distinct(col("query_id")).as("n_queries"),
      count(lit(1)).as("n_truth"),
      count_if(col("neighbor_id") % 7 === 3).as("delta_truth"))
      .crossJoin(broadcast(hits))
      .select(col("n_queries"), col("n_truth"), col("delta_truth"),
        (col("n_hits") * 2 >= col("n_truth")).as("recall_ok"),
        (col("delta_hits") * 2 >= col("delta_truth"))
          .as("delta_recall_ok"))
  }

  /** Spec-facing form: centroids train on `base` alone, `delta` ingests
    * by frozen-centroid assignment, search covers the union. Returns
    * (query_id, neighbor_id) for the queryFilter panel.*/
  def ivfDeltaTopKDf(s: SparkSession, base: DataFrame, delta: DataFrame,
      k: Int = 5): DataFrame = {
    val cents = kmeansCentroids(s, base)
    val assigned = nearestCentroid(s, base, cents)
      .unionByName(nearestCentroid(s, delta, cents))
    ivfDeltaTopKFrom(s, base.unionByName(delta), cents, assigned, k)
  }

  private def ivfDeltaTopKFrom(s: SparkSession, v: DataFrame,
      cents: DataFrame, assigned: DataFrame, k: Int): DataFrame = {
    val q = queryFilter(v)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("cent_id"),
        cosine(col("q_emb"), col("cent_emb")).as("cdist"))
      .withColumn("crk", row_number().over(pw))
      .filter(col("crk") <= NProbe)
      .select(col("query_id"), col("cent_id"))
      .join(broadcast(q), Seq("query_id"))
    assigned
      .join(probes, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("sim"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), k).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("c"))
      .select(col("query_id"), col("c.id").as("neighbor_id"))
  }

  /** Embedding-space outlier detection — the semantic quality filter a
    * curation pipeline runs over encoder outputs (the batch analogue of
    * CLIP-score filtering): score every vector by cosine to its class
    * centroid and flag the class's most atypical third. Mislabeled,
    * off-topic, or encoder-degenerate items sit far from their class
    * center; SemDeDup (q256) removes the over-REPRESENTED end of the
    * embedding space, this removes the UNDER-cohesive end — the two
    * complementary embedding-side curation signals.
    *
    * Determinism discipline: centroid component sums accumulate in
    * DECIMAL(30,12) (order-independent ring — the q165 k-means rule) and
    * round to 7 dp, so both engines score against bit-identical
    * centroids; cosines round to 6 dp (q30); the low/mid/high cut is
    * RANK-FREE — per-label cumulative counts over DISTINCT rounded
    * similarities (the q263 value-count compression), bucket by integer
    * compare, ties share a bucket.
    *
    * Scale shape: the centroid aggregate is a partial-aggregated
    * (label, dim) shuffle — state per mapper is |labels|·dim cells
    * regardless of corpus size — and the centroid table (|labels| rows)
    * broadcasts back; scoring is map-side; the bucket cut runs over the
    * value-count frame whose grain the 6-dp rounding bounds. No pair
    * joins, no per-label ranking window over data rows. */
  def embeddingOutliers(s: SparkSession, d: String): DataFrame =
    embeddingOutliersDf(Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("emb")))

  /** [[embeddingOutliers]] over an arbitrary (vec_id, label, emb) frame. */
  def embeddingOutliersDf(v: DataFrame): DataFrame = {
    val cent = v
      .select(col("label"), posexplode(col("emb")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(sum(col("x").cast("decimal(30,12)")).as("sx"),
        count(lit(1)).as("n"))
      .select(col("label"), col("i"),
        round(col("sx").cast("double") / col("n"), 7).as("m"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("m")))),
        e => e("m")).as("cent"))
    val sims = v.join(broadcast(cent), Seq("label"))
      .select(col("vec_id"), col("label"),
        round(cosine(col("emb"), col("cent")), 6).as("centroid_sim"))
      .localCheckpoint() // value-count cutoffs + the output share it
    val vc = sims.groupBy(col("label"), col("centroid_sim"))
      .agg(count(lit(1)).as("c"))
    val cw = Window.partitionBy(col("label")).orderBy(col("centroid_sim"))
    val cum = vc
      .withColumn("cum", sum(col("c")).over(
        cw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(sims.groupBy(col("label")).agg(count(lit(1)).as("n")),
        Seq("label"))
      .select(col("label"), col("centroid_sim"),
        when(col("cum") * 3 <= col("n"), lit("low"))
          .when(col("cum") * 3 <= col("n") * 2, lit("mid"))
          .otherwise(lit("high")).as("sim_bucket"))
    sims.join(cum, Seq("label", "centroid_sim"))
      .select(col("vec_id"), col("label"), col("centroid_sim"),
        col("sim_bucket"), (col("sim_bucket") === "low").as("outlier"))
  }

  /** Per-dimension embedding-health monitor — the encoder sanity check a
    * pipeline runs before trusting embedding-side curation (SemDeDup,
    * outlier filtering, ANN recall all silently degrade when the encoder
    * collapses): per-dimension mean and variance, each dimension's share
    * of total variance, a near-zero-variance flag (dead dimension), and
    * the dominant-dimension marker (anisotropy — one dimension carrying
    * an outsized variance share is the classic symptom of a degenerate
    * embedding space, Ethayarajh 2019). Output grain is the embedding
    * width (64 rows), constant in the corpus.
    *
    * Determinism discipline: component sums AND squared-component sums
    * accumulate in DECIMAL(30,12) (order-independent — the q165 rule;
    * x² is one IEEE multiply, identical on both engines, quantized to
    * 12 dp before the sum); mean rounds to 7 dp and the variance uses
    * the ROUNDED mean (re-quantize before reuse); total variance sums
    * the 7-dp per-dim variances in DECIMAL so the share denominator is
    * exact; shares round to 6 dp.
    *
    * Scale shape: one partial-aggregated (dim) shuffle whose mapper
    * state is `width` cells regardless of corpus size; everything after
    * is a 64-row frame (the max/total "windows" run over that metadata
    * grain, not over data rows). */
  def embeddingHealth(s: SparkSession, d: String): DataFrame =
    embeddingHealthDf(Tables.embeddings(s, d)
      .select(asDouble(col("embedding")).as("emb")))

  /** SQ8 quantization-distortion audit — the index-quality monitor run
    * BEFORE trusting one-byte codes in production (q216 uses the codec;
    * this measures what it costs): per dimension, the max absolute
    * reconstruction error, the mean squared error, and the PROVABLE
    * half-step bound |x − deq(x)| ≤ (mx−mn)/512 as a boolean (deq
    * reconstructs at the cell midpoint, and the clamp at code 255 still
    * lands within half a step of mx). A dimension whose mse approaches
    * the uniform-quantization floor step²/12 is healthy; one far above
    * it signals outlier-stretched [mn, mx] ranges that want clipping.
    *
    * Fully oracle-exact: the quantizer is closed-form (the q216
    * argument — floor and every scalar op are single mirrored IEEE
    * instructions), errors quantize to 12 dp before the DECIMAL sum
    * (order-independent), mse rounds to 9. Scale shape: one (dim)-grain
    * partial aggregate for ranges, one for the error rollup — mapper
    * state is `width` cells; no joins beyond the |dims|-row broadcast. */
  def sq8Distortion(s: SparkSession, d: String): DataFrame = {
    val xs = vectors(s, d)
      .select(posexplode(col("emb")).as(Seq("dim", "x")))
    val mm = xs.groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val step = (col("mx") - col("mn")) / lit(256.0)
    val deq = when(col("mx") > col("mn"),
      col("mn") + (least(floor((col("x") - col("mn")) /
        (col("mx") - col("mn")) * lit(256.0)), lit(255.0)) + lit(0.5)) *
        (col("mx") - col("mn")) / lit(256.0))
      .otherwise(col("mn"))
    xs.join(broadcast(mm), Seq("dim"))
      .select(col("dim"), col("mn"), col("mx"),
        round(abs(col("x") - deq), 12).as("e"))
      .select(col("dim"), col("mn"), col("mx"), col("e"),
        round(col("e") * col("e"), 12).cast("decimal(30,12)").as("e2"))
      .groupBy(col("dim"), col("mn"), col("mx"))
      .agg(max(col("e")).as("max_abs_err"),
        round(sum(col("e2")).cast("double") / count(lit(1)), 9).as("mse"))
      .withColumn("within_bound",
        col("max_abs_err") <= step / lit(2.0) + lit(1e-12))
  }

  /** [[embeddingHealth]] over an arbitrary (emb: array<double>) frame. */
  def embeddingHealthDf(v: DataFrame): DataFrame = {
    val st = v
      .select(posexplode(col("emb")).as(Seq("dim", "x")))
      .select(col("dim"), col("x").cast("decimal(30,12)").as("xd"),
        round(col("x") * col("x"), 12).cast("decimal(30,12)").as("x2"))
      .groupBy(col("dim"))
      .agg(sum(col("xd")).as("sx"), sum(col("x2")).as("sxx"),
        count(lit(1)).as("n"))
      .select(col("dim"),
        round(col("sx").cast("double") / col("n"), 7).as("mean_v"),
        col("sxx"), col("n"))
    val withVar = st
      .select(col("dim"), col("mean_v"),
        round(col("sxx").cast("double") / col("n") -
          col("mean_v") * col("mean_v"), 7).cast("decimal(20,7)")
          .as("var_v"))
    val tot = withVar.agg(sum(col("var_v")).as("tot_var"),
      max(col("var_v")).as("max_var"))
    withVar.crossJoin(broadcast(tot))
      .select(col("dim"), col("mean_v"),
        col("var_v").cast("double").as("var_v"),
        round(col("var_v").cast("double") /
          col("tot_var").cast("double"), 6).as("var_share"),
        (col("var_v").cast("double") < 1e-6).as("dead_dim"),
        (col("var_v") === col("max_var")).as("dominant_dim"))
  }
}
