package graft.operators

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.PCA

class PCASpec extends SparkTestBase {
  import spark.implicits._

  private def rnd(x: Double, n: Int): Double =
    JBig.valueOf(x).setScale(n, RoundingMode.HALF_UP).doubleValue

  private def dec12(x: Double): JBig =
    JBig.valueOf(x).setScale(12, RoundingMode.HALF_UP)

  /** Sequential single-threaded power iteration with the operator's
    * exact quantization contract (DECIMAL(30,12) accumulation for every
    * reduction, 9dp covariance + per-round iterate quantization). A
    * bit-exact match proves the DISTRIBUTED covariance + mat-vec
    * pipeline equals the textbook sequential algorithm. */
  private def reference(vecs: Array[Array[Double]], rounds: Int)
      : (Array[Double], Double) = {
    val n = vecs.length
    val dim = vecs.head.length
    // moments accumulate as exact floor-scaled integers (the operator's
    // scaled-long contract), reconstructed through decimal → double
    def scaled(terms: Iterator[Double]): Double = {
      val s = terms.foldLeft(BigInt(0))((acc, x) =>
        acc + BigInt(math.floor(x * 1e9).toLong))
      new JBig(s.bigInteger).doubleValue
    }
    val mean = Array.tabulate(dim) { i =>
      scaled(vecs.iterator.map(_(i))) / 1e9 / n
    }
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      rnd(scaled(vecs.iterator.map(v => v(i) * v(j))) / 1e9 / n -
        mean(i) * mean(j), 9)
    }
    var v = Array.fill(dim)(0.125)
    var nrm = 0.0
    (1 to rounds).foreach { _ =>
      val w = Array.tabulate(dim) { i =>
        (0 until dim).foldLeft(JBig.ZERO)((s, j) =>
          s.add(dec12(cov(i)(j) * v(j)))).doubleValue
      }
      nrm = math.sqrt(
        w.foldLeft(JBig.ZERO)((s, x) => s.add(dec12(x * x))).doubleValue)
      v = w.map(x => rnd(x / nrm, 9))
    }
    (v, nrm)
  }

  test("power iteration bit-matches the sequential reference") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .orderBy($"vec_id")
      .as[(Long, Array[Double])].collect().map(_._2)
    val (wantV, wantNrm) = reference(vecs, PCA.Rounds)
    val got = PCA.powerIteration(spark, sf0001)
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(got.length === vecs.head.length)
    got.foreach { case (pos, loading, ev) =>
      assert(loading === wantV(pos), s"pos $pos")
      assert(ev === rnd(wantNrm, 6))
    }
    // the iterate is (quantized-)unit-norm and the eigenvalue positive
    val norm2 = got.map(g => g._2 * g._2).sum
    assert(math.abs(norm2 - 1.0) < 1e-6)
    assert(got.head._3 > 0.0)
  }

  test("power iteration converges on a planted-spike fixture") {
    // vectors concentrated along axis 3: the principal loading must
    // put dominant mass there
    val base = Array.fill(8)(0.0)
    val fixture = (0 until 40).map { r =>
      val v = base.clone()
      v(3) = if (r % 2 == 0) 5.0 else -5.0
      v(r % 8) += 0.1
      (r.toLong, v)
    }
    val dir = "/root/repo/target/test-warehouse/pca_fixture"
    fixture.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = PCA.powerIteration(spark, dir)
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val dominant = got.maxBy(g => math.abs(g._2))
    assert(dominant._1 === 3)
    assert(math.abs(dominant._2) > 0.99)
  }
}
