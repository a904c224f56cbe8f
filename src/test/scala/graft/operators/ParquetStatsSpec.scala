package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Footer-statistics scalar aggregates must agree EXACTLY with the
  * scan-based aggregate (zone maps are exact for numeric types), and
  * must refuse — None, never a wrong value — when the column is absent. */
class ParquetStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("footer max/min equal the scan aggregate on real testdata") {
    val path = s"$sf0001/orders.parquet"
    val scan = spark.read.parquet(path)
      .agg(max($"o_totalprice"), min($"o_totalprice")).head()
    assert(ParquetStats.doubleMax(spark, path, "o_totalprice")
      === Some(scan.getDouble(0)))
    assert(ParquetStats.doubleMin(spark, path, "o_totalprice")
      === Some(scan.getDouble(1)))
  }

  test("row count from footer metadata equals count(*)") {
    val path = s"$sf0001/lineitem.parquet"
    assert(ParquetStats.rowCount(spark, path)
      === spark.read.parquet(path).count())
  }

  test("missing column yields None, and a multi-file dir reduces over all files") {
    val dir = java.nio.file.Files.createTempDirectory("pqstats").toString
    Seq(1.0, 2.0, 3.5).toDF("v").repartition(2)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(ParquetStats.doubleMax(spark, s"$dir/t.parquet", "nope").isEmpty)
    assert(ParquetStats.doubleMax(spark, s"$dir/t.parquet", "v")
      === Some(3.5))
    assert(ParquetStats.doubleMin(spark, s"$dir/t.parquet", "v")
      === Some(1.0))
  }

  test("all-null row groups are skipped; all-null column yields None") {
    val dir = java.nio.file.Files.createTempDirectory("pqstats2").toString
    Seq[Option[Double]](None, None).toDF("v")
      .write.mode("overwrite").parquet(s"$dir/n.parquet")
    assert(ParquetStats.doubleMax(spark, s"$dir/n.parquet", "v").isEmpty)
    Seq[Option[Double]](None, Some(7.25), None).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/m.parquet")
    assert(ParquetStats.doubleMax(spark, s"$dir/m.parquet", "v")
      === Some(7.25))
  }
}
