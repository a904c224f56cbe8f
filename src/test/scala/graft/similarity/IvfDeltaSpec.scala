package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Tables

/** q269 IVF delta ingest — new vectors join a frozen-centroid index with
  * no re-clustering and are immediately findable. */
class IvfDeltaSpec extends SparkTestBase {
  import spark.implicits._

  test("delta ingest: a newly ingested vector is immediately findable " +
      "through the frozen centroids") {
    def vec(axis: Int, bump: Double): Seq[Double] = {
      val a = Array.fill(4)(0.0); a(axis) = 1.0; a(0) += bump; a.toSeq
    }
    // base: two seed-eligible ids (0, 97) anchoring two directions plus
    // cluster mass; query 300 (% 100 == 0) points along e1
    val base = Seq(
      (0L, vec(0, 0.0)), (1L, vec(0, 0.01)), (2L, vec(0, 0.02)),
      (97L, vec(1, 0.0)), (98L, vec(1, 0.01)), (99L, vec(1, 0.02)),
      (300L, vec(0, 0.05))).toDF("vec_id", "emb")
    // the arriving batch: id 10 is (nearly) the query itself — the
    // strongest possible true neighbor, visible ONLY via delta ingest
    val delta = Seq((10L, vec(0, 0.05))).toDF("vec_id", "emb")
    val found = Similarity.ivfDeltaTopKDf(spark, base, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val q300 = found.filter(_._1 == 300L).map(_._2).toSet
    assert(q300.contains(10L), s"delta vector not found: $q300")
    // and no query returns itself
    assert(found.forall { case (q, n) => q != n })
  }

  test("delta ingest on testdata: recall holds overall AND restricted " +
      "to delta-supplied truth; the delta arm is non-vacuous") {
    val r = Similarity.ivfDeltaRecallCheck(spark, sf0001).collect()
    assert(r.length === 1)
    val row = r(0)
    val (nq, nt, dt) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nq > 0 && nt === nq * 5)
    assert(dt > 0L, "the delta batch must supply some true neighbors")
    assert(row.getBoolean(3), "overall recall")
    assert(row.getBoolean(4), "delta-restricted recall")
    // the deterministic split really is a split
    val n = Tables.embeddings(spark, sf0001).count()
    val nd = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 7 === 3).count()
    assert(nd > 0 && nd < n)
  }

  test("probe curve: recall climbs with the budget, and probing every " +
      "bucket IS brute force (exact result-set equality)") {
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    val truth = asSet(Similarity.bruteForceTopK(spark, sf0001))
    // nprobe >= every bucket count: the probe filter passes all
    // centroids, so IVF degenerates to exhaustive search exactly
    val all = asSet(Similarity.ivfTopKProbed(spark, sf0001, 5, 1000))
    assert(all === truth,
      "all-bucket IVF must equal brute force row-for-row")
    def hits(np: Int): Long = {
      val found = Similarity.ivfTopKProbed(spark, sf0001, 5, np)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.count(t => found.contains((t._1, t._2))).toLong
    }
    val curve = Seq(1, 2, 4, Similarity.NProbe).map(hits)
    assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
      s"recall must be nondecreasing in nprobe: $curve")
    assert(curve.last * 2 >= truth.size,
      "the committed >= 0.5 bound holds at the operating point")
  }

  test("sq8 distortion: hand-computed cell-midpoint errors, the clamp " +
      "edge sits exactly at half a step, constant dims cost nothing") {
    val dir = java.nio.file.Files.createTempDirectory("sq8dist").toString
    // dim 0: {0, 1} → step 1/256, both points err exactly 1/512;
    // dim 1: constant → mx == mn branch, zero error
    Seq((0L, Seq(0.0, 5.0)), (100L, Seq(1.0, 5.0)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.sq8Distortion(spark, dir).collect()
      .map(r => r.getInt(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    val (e0, mse0, ok0) = out(0)
    assert(e0 === 1.0 / 512.0, "clamp edge reconstructs half a step off")
    assert(mse0 === 3.815e-6, s"mse must be (1/512)^2 rounded to 9, got $mse0")
    assert(ok0, "the half-step bound holds at its own edge")
    assert(out(1) === ((0.0, 0.0, true)), "constant dim is error-free")
  }

  test("sq8 distortion on testdata: every dim within the provable bound, " +
      "mse near the uniform-quantization floor step^2/12") {
    Similarity.sq8Distortion(spark, sf0001).collect().foreach { r =>
      val (mn, mx, mse, ok) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(4), r.getBoolean(5))
      assert(ok)
      val floorMse = math.pow((mx - mn) / 256.0, 2) / 12.0
      assert(mse > 0.3 * floorMse && mse < 3.0 * floorMse,
        s"mse $mse vs uniform floor $floorMse")
    }
  }
}
