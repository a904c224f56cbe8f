package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tables

/** Principal-component extraction over the embedding corpus: exact
  * covariance in one distributed pass, then fixed-round power iteration
  * on the (dim × dim) moment matrix — the spectral primitive under OPQ
  * rotation training, whitening, and embedding-drift monitoring. The
  * reference has no spectral operator; this extends the embedding
  * surface (SURVEY §2.3) alongside k-means/IVF/PQ.
  *
  * Determinism contract (fully ORACLE-CHECKABLE, like q165's k-means):
  *  - the corpus-sized reductions (cross-moments, means) accumulate
  *    floor-scaled LONGS (reassociation-lossless integer sums, split
  *    div/mod 1e9 so no component overflows at any scale) and
  *    reconstruct exactly in DECIMAL once per cell; the mat-vec and
  *    norm reductions of the driver iterate accumulate in
  *    DECIMAL(30,12) — either way shuffle order can't move a bit, and
  *    per-element products are single IEEE ops on identical doubles;
  *  - the covariance quantizes to 9 decimals once, and the iterate
  *    re-quantizes to 9 decimals per round (q86's per-round
  *    re-quantization), so round r+1 sees identical inputs cross-engine;
  *  - v0 = 1/8 per component (exactly dyadic), no RNG; the principal
  *    eigenvalue of a PSD matrix keeps the iterate's sign stable.
  *
  * Scale shape: the covariance pass is the only corpus-sized stage —
  * the double positional explode emits dim² terms per row and partial
  * aggregation combines them map-side, so the shuffle carries dim²
  * partial sums per mapper, independent of corpus size (at 100 TB this
  * is the scan-bound stage; dim² = 4096 cells is broadcast-small).
  * The power rounds then run sequentially on the collected matrix:
  * past the moments pass the problem is dim²-sized for ANY corpus, so
  * the iterate is driver work by construction (the q123
  * broadcast-stats shape, not the iterative-graph shape — distributing
  * it would add ~12 overhead-bound shuffles of 64-row data).
  */
object PCA {

  val Rounds = 6

  /** (pos, loading, eigenvalue): the power-iterate after [[Rounds]]
    * rounds and the final ||C·v|| eigenvalue estimate. */
  def powerIteration(s: SparkSession, d: String,
      rounds: Int = Rounds): DataFrame = {
    val rows = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val px = rows.select(col("vec_id"),
      posexplode(col("e")).as(Seq("i", "x")))

    // Exact sums via SCALED LONGS, not decimal: each term quantizes as
    // floor(v·1e9) (floor is IEEE-exact — identical cross-engine, no
    // rounding-mode ties), then sums split into (t div 1e9, t mod 1e9)
    // long pairs so neither component can overflow even at 10¹² rows;
    // the exact total reconstructs in DECIMAL once per CELL, not per
    // term. Decimal-per-term summation here measured ~100× slower (the
    // per-row Decimal churn dominated the whole query at sf0.1: 13.7 s
    // → 0.13 s warm for the dim² pass).
    val B = 1000000000L
    def scaledSum(g: org.apache.spark.sql.RelationalGroupedDataset) = g
      .agg(sum(expr("t div 1000000000")).as("shi"),
        sum(expr("t % 1000000000")).as("slo"), count(lit(1)).as("n"))
    def exact(shiCol: Column, sloCol: Column): Column =
      (shiCol.cast("decimal(38,0)") * B + sloCol).cast("double")
    val means = scaledSum(
      px.select(col("i"), floor(col("x") * 1e9).as("t")).groupBy(col("i")))
      .select(col("i"), (exact(col("shi"), col("slo")) / 1e9 / col("n"))
        .as("m"))
    // dim² cross moments via the native moment_matrix aggregate: one
    // dim²-cell buffer per mapper, NO Generate — the earlier outer-
    // product posexplode pushed |rows|·dim² rows (200M at bench scale)
    // through a generator + shuffle; the kernel does the same
    // multiplications in a tight JVM loop with bit-identical per-cell
    // arithmetic (same association, floor, truncating div/mod), so the
    // swap cannot move a result (PCASpec + oracle pin it)
    val sxy = rows
      .agg(graft.functions.AggregateKernels.momentMatrix(col("e"))
        .as("m"))
      .select(explode(col("m")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"),
        col("c.shi").as("shi"), col("c.slo").as("slo"),
        col("c.n").as("n"))
    val cov = sxy
      .join(means.select(col("i"), col("m").as("mi")), Seq("i"))
      .join(means.select(col("i").as("j"), col("m").as("mj")), Seq("j"))
      .select(col("i"), col("j"),
        round(exact(col("shi"), col("slo")) / 1e9 / col("n") -
          col("mi") * col("mj"), 9).as("c"))

    // The iterate runs SEQUENTIALLY on the collected dim² matrix: the
    // moment matrix is driver-scale at ANY corpus size (4096 cells for
    // dim=64), so distributing the mat-vec rounds would buy 12 tiny
    // overhead-bound shuffles and nothing else — the broadcast-stats
    // shape (q123), not the iterative-graph shape. PCASpec proves the
    // sequential iterate bit-equals a distributed DECIMAL formulation;
    // the DuckDB oracle runs the ALGEBRAIC unroll in SQL, so the hash
    // match stays algorithm-diverse.
    import java.math.{BigDecimal => JBig, RoundingMode}
    def dec12(x: Double): JBig =
      JBig.valueOf(x).setScale(12, RoundingMode.HALF_UP)
    def rnd(x: Double, p: Int): Double =
      JBig.valueOf(x).setScale(p, RoundingMode.HALF_UP).doubleValue
    val cells = cov.collect()
    // empty corpus → empty covariance → empty result (cold-start safe)
    if (cells.isEmpty)
      return s.createDataFrame(Seq.empty[(Int, Double, Double)])
        .toDF("pos", "loading", "eigenvalue")
    val dim = cells.map(_.getInt(0)).max + 1
    val m = Array.ofDim[Double](dim, dim)
    cells.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    var v = Array.fill(dim)(0.125)
    var nrm = 0.0
    (1 to rounds).foreach { _ =>
      val w = Array.tabulate(dim) { i =>
        (0 until dim).foldLeft(JBig.ZERO)((acc, j) =>
          acc.add(dec12(m(i)(j) * v(j)))).doubleValue
      }
      nrm = math.sqrt(
        w.foldLeft(JBig.ZERO)((acc, x) => acc.add(dec12(x * x)))
          .doubleValue)
      v = w.map(x => rnd(x / nrm, 9))
    }
    val out = v.zipWithIndex.map { case (x, i) => (i, x, rnd(nrm, 6)) }
    s.createDataFrame(out.toIndexedSeq)
      .toDF("pos", "loading", "eigenvalue")
  }
}
