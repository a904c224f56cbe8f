package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Z-order clustering specs: the interleave is a correct Morton code, and
  * the clustered layout actually delivers two-dimensional data skipping —
  * measured as the fraction of files a min/max-pruning reader must touch
  * for selective predicates on EITHER dimension. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave is a correct Morton code") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b")).as("z"))
      .as[Long].collect()
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val expected = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (65535L, 65535L)).map((morton _).tupled)
    assert(rows.toSeq === expected)
  }

  test("z-ordered layout skips files on BOTH dimensions; single-sort only on one") {
    val d = sf0001
    val orders = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val nFiles = 8

    val zDir = Files.createTempDirectory("zorder").toString + "/t"
    ZOrder.writeClustered(orders, "o_custkey", "o_totalprice", zDir, nFiles)

    // contrast layout: clustered by custkey alone
    val sDir = Files.createTempDirectory("singlesort").toString + "/t"
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(sDir)

    val z = spark.read.parquet(zDir)
    val s = spark.read.parquet(sDir)

    val stats = orders.agg(
      expr("percentile(o_custkey, 0.5)"),
      expr("percentile(o_totalprice, 0.5)")).head()
    val midCust = stats.getDouble(0)
    val midPrice = stats.getDouble(1)

    val zCust = ZOrder.touchFraction(ZOrder.fileSpans(z, "o_custkey"), midCust)
    val zPrice = ZOrder.touchFraction(ZOrder.fileSpans(z, "o_totalprice"), midPrice)
    val sCust = ZOrder.touchFraction(ZOrder.fileSpans(s, "o_custkey"), midCust)
    val sPrice = ZOrder.touchFraction(ZOrder.fileSpans(s, "o_totalprice"), midPrice)

    // single-sort: near-perfect on its sort key, useless on the other
    assert(sCust <= 0.25, s"sCust=$sCust")
    assert(sPrice >= 0.9, s"sPrice=$sPrice")
    // z-order: usable skipping on BOTH dimensions
    assert(zCust <= 0.75, s"zCust=$zCust")
    assert(zPrice <= 0.75, s"zPrice=$zPrice")
    // and data is preserved
    assert(z.count() === orders.count())
  }
}
