package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Tables

/** Fixed-iteration Lloyd's k-means over the embedding corpus — the
  * clustering primitive under coarse ANN quantizers (IVF cell training),
  * corpus bucketing for curriculum/mixture construction, and diversity
  * sampling. The reference has no clustering operator; this extends the
  * embedding surface (SURVEY §2.3) the same way IVF/PQ do.
  *
  * Determinism contract (what makes this ORACLE-CHECKABLE cross-engine,
  * unlike MLlib's sampled/seeded KMeans):
  *  - init = the K lowest vec_ids' vectors (no RNG);
  *  - assignment distances are computed in INDEX ORDER (left fold) in both
  *    engines and rounded to 6 decimals before the argmin, ties broken by
  *    cluster id — the same re-quantization q30 applies to similarities;
  *  - centroid means accumulate per-dimension in DECIMAL(30,12) — a ring
  *    where reassociation is lossless, so shuffle/summation order (engine-
  *    and run-dependent for doubles) cannot move the result; the single
  *    double division that follows is bit-identical given identical inputs
  *    (NOTES_r4's float-summation lesson applied to vector math);
  *  - centroid components round to 7 decimals each round (q86's per-round
  *    re-quantization), so round-2 distances see identical inputs.
  *
  * Scale shape: centroids are k·dim values — always broadcast; assignment
  * is a map-side cross join (no shuffle of the corpus); the centroid
  * recompute shuffles k·dim partial sums per mapper (posexplode feeds a
  * partial-aggregated groupBy), not vectors. The loop composes ONE lazy
  * plan (fixed rounds, no convergence read — PageRank's compose-only
  * pattern, Graph.scala:74-77).
  */
object Clustering {

  val K = 8
  val Iters = 2

  /** Squared Euclidean distance, left-fold in index order (bit-matches the
    * oracle's list_sum(list_transform(...)) evaluation). */
  def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, t) => s + t)

  /** (vec_id, cid, d2) after `iters` Lloyd rounds on `embeddings`. */
  def kmeans(s: SparkSession, d: String, k: Int = K,
      iters: Int = Iters): DataFrame = {
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      // reused by every round's assignment AND the final pass: one scan
      .localCheckpoint()

    // deterministic seed centroids: the K lowest vec_ids (tiny subplan —
    // the single-partition window runs over K rows post-limit)
    var cents = v.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1)
        .cast("long").as("cid"), col("emb").as("cent"))

    def assign(cs: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("cid"))
      v.join(broadcast(cs), lit(true))
        .select(col("vec_id"), col("emb"), col("cid"),
          round(dist2(col("emb"), col("cent")), 6).as("d2"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .drop("rk")
    }

    for (_ <- 1 until iters) {
      // exact per-dimension means: DECIMAL sums are order-independent, the
      // one double division afterwards is bit-identical cross-engine
      cents = assign(cents)
        .select(col("cid"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x").cast("decimal(30,12)")).as("sx"),
          count(lit(1)).as("n"))
        .select(col("cid"), col("pos"),
          round(col("sx").cast("double") / col("n"), 7).as("m"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          t => t.getField("m")).as("cent"))
    }
    assign(cents).select(col("vec_id"), col("cid"), col("d2"))
  }
}
