package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DiagnosticsSpec extends SparkTestBase {
  import spark.implicits._

  test("key skew profile surfaces the hot key and its ratio") {
    val df = (Seq.fill(100)(7L) ++ (0L until 50L)).toDF("k")
    val r = Diagnostics.keySkew(df, "k").head()
    assert(r.getAs[Long]("max_n") === 101) // 7L appears 100 + 1 times
    assert(r.getAs[Seq[String]]("top_keys").head === "7")
    assert(r.getAs[Double]("skew_ratio") >= 50.0)
    assert(r.getAs[Long]("n_keys") === 50)
  }

  test("broadcast advice: small dim yes, threshold respected") {
    val small = Tables.nation(spark, sf0001)
    val r = Diagnostics.broadcastAdvice(spark, small).head()
    assert(r.getAs[Boolean]("would_broadcast"))
    assert(BigInt(r.getAs[String]("estimated_bytes")) > 0)
  }

  test("broadcast advice survives the -1 disable idiom") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val r = Diagnostics.broadcastAdvice(spark, Tables.nation(spark, sf0001))
        .head()
      assert(!r.getAs[Boolean]("would_broadcast"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
