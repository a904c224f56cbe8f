package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Tables

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

  /** Deterministic query subset: every 100th vector. */
  val QueryStep = 100
  val CentroidStep = 97
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
    * the order is reproducible across engines. The scored rows are slimmed
    * to (query_id, vec_id, sim) BEFORE the ranking window: the window
    * shuffle moves 24-byte triples, not embedding arrays — at corpus scale
    * that is a ~10× shuffle-size cut. */
  def bruteForceTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val v = vectors(s, d)
    val q = v.filter(col("vec_id") % QueryStep === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val scored = v.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("sim"), col("rk").cast("int").as("rk"))
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
    var cents = v.filter(col("vec_id") % CentroidStep === 0)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent_emb"))
    for (_ <- 0 until iters) {
      val assigned = v
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .crossJoin(broadcast(cents))
        .withColumn("cdist", cosine(col("emb"), col("cent_emb")))
        .groupBy(col("vec_id"))
        .agg(
          max_by(col("cent_id"),
            struct(col("cdist"), -col("cent_id"))).as("cent_id"),
          first(col("emb")).as("emb"))
      cents = assigned
        .select(col("cent_id"), posexplode(col("emb")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cent_id"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cent_emb"))
        .localCheckpoint()
    }
    cents
  }

  def ivfTopK(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val v = vectors(s, d)
    val cents = kmeansCentroids(s, v)

    // corpus → nearest bucket: map-side max_by argmax (see kmeansCentroids),
    // one shuffled row per vector
    val assigned = v
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .crossJoin(broadcast(cents))
      .withColumn("cdist", cosine(col("emb"), col("cent_emb")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("cent_id"),
          struct(col("cdist"), -col("cent_id"))).as("cent_id"),
        first(col("emb")).as("emb"))

    // queries → NProbe nearest buckets: the query set is tiny, so a ranking
    // window is fine — but over slim (query_id, cent_id, cdist) triples,
    // with q_emb re-attached by a broadcast join afterwards
    val q = v.filter(col("vec_id") % QueryStep === 0)
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

    // probe-bucket scoring, slimmed to triples before the top-k window
    val scored = assigned
      .join(probes, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("sim"), col("rk").cast("int").as("rk"))
  }
}
