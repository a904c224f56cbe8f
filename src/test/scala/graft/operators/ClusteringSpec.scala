package graft.operators

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.Clustering

class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  /** Spark's round(col, n) on doubles: BigDecimal.valueOf (shortest decimal
    * repr) + HALF_UP — mirrored exactly so the sequential reference is
    * bit-comparable. */
  private def rnd(x: Double, n: Int): Double =
    JBig.valueOf(x).setScale(n, RoundingMode.HALF_UP).doubleValue

  /** Sequential single-threaded Lloyd's with the operator's exact
    * quantization contract (d2 index-order fold → round 6, tie by cid;
    * DECIMAL(30,12) mean accumulation → round 7). */
  private def reference(vecs: Seq[(Long, Array[Double])], k: Int,
      iters: Int): Map[Long, (Long, Double)] = {
    val sorted = vecs.sortBy(_._1)
    var cents: Seq[(Long, Array[Double])] =
      sorted.take(k).zipWithIndex.map { case ((_, e), i) => (i.toLong, e) }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      rnd(s, 6)
    }
    def assign(): Map[Long, (Long, Double)] =
      sorted.map { case (id, e) =>
        val (cid, dd) = cents.map { case (c, ce) => (c, d2(e, ce)) }
          .minBy { case (c, dd) => (dd, c) }
        id -> (cid, dd)
      }.toMap
    for (_ <- 1 until iters) {
      val byC = assign().toSeq.groupBy(_._2._1)
      val vecById = sorted.toMap
      cents = byC.toSeq.map { case (cid, members) =>
        val es = members.map(m => vecById(m._1))
        val dim = es.head.length
        val mean = (0 until dim).map { i =>
          // DECIMAL(30,12) accumulation, exactly the cast the plan does
          val sum = es.map(e => JBig.valueOf(e(i))
            .setScale(12, RoundingMode.HALF_UP))
            .reduce(_.add(_))
          rnd(sum.doubleValue / es.size, 7)
        }.toArray
        (cid, mean)
      }.sortBy(_._1)
    }
    assign()
  }

  private lazy val vecs: Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().toSeq

  test("kmeans matches the sequential Lloyd reference exactly") {
    val got = Clustering.kmeans(spark, sf0001)
      .as[(Long, Long, Double)].collect()
      .map { case (id, cid, dd) => id -> (cid, dd) }.toMap
    val want = reference(vecs, Clustering.K, Clustering.Iters)
    assert(got.size === want.size)
    val diffs = want.collect {
      case (id, w) if got(id) != w => s"$id: got ${got(id)} want $w"
    }
    assert(diffs.isEmpty, diffs.take(5).mkString("\n"))
  }

  test("kmeans yields k non-empty clusters and Lloyd-monotone inertia") {
    val one = Clustering.kmeans(spark, sf0001, iters = 1)
      .agg(sum($"d2")).head().getDouble(0)
    val two = Clustering.kmeans(spark, sf0001, iters = 2).cache()
    val inertia = two.agg(sum($"d2")).head().getDouble(0)
    // Lloyd's never increases inertia; quantization perturbs < n*1e-6
    assert(inertia <= one + 1e-3, s"inertia $inertia vs round-1 $one")
    val sizes = two.groupBy($"cid").count().as[(Long, Long)].collect()
    assert(sizes.length === Clustering.K)
    assert(sizes.forall(_._2 > 0))
    two.unpersist()
  }
}
