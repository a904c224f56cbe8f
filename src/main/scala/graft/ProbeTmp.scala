package graft

import org.apache.spark.sql.functions._

object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Tables, TextQueries}
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val par = spark.sparkContext.defaultParallelism
    for (rnd <- 1 to 3) {
      println(s"[probe] === round $rnd")
      val docs = Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text"))
      val tf = time("tf") { TextQueries.wjTf(docs).localCheckpoint() }
      val idx = time("idx") { TextQueries.wjIndex(tf, 0.3).localCheckpoint() }
      val base = idx.select(col("doc_id").as("doc_a"), col("word"))
        .join(idx.select(col("doc_id").as("doc_b"), col("word")), Seq("word"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
      time("candA distinct-then-repart")(noop(base.distinct().repartition(par)))
      time("candB keyed-repart-then-distinct")(noop(
        base.repartition(par, col("doc_a"), col("doc_b")).distinct()))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
