package graft

import org.apache.spark.sql.functions._

object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Tables
    import graft.functions.SortedIntersectSize.sortedIntersectSize
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val toks = (c: org.apache.spark.sql.Column) =>
      expr("filter(split(lower(text), ' '), x -> x != '')")
    for (rnd <- 1 to 3) {
      println(s"[probe] === round $rnd")
      val src0 = Tables.documents(spark, sfDir).filter(col("doc_id") % 4 === 0)
      val docs = src0.select(col("doc_id"),
        array_distinct(expr("filter(split(lower(text), ' '), x -> x != '')")).as("tk"))
      val occ = docs.select(col("doc_id"), explode(col("tk")).as("tok"))
      val rank = graft.operators.GlobalOrder
        .rowNumber(occ.groupBy(col("tok")).agg(count(lit(1)).as("dfreq")),
          "rk", col("dfreq"), col("tok"))
        .select(col("tok"), col("rk"))
      val ranked = time("ranked") {
        occ.join(rank, "tok")
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_list(col("rk"))).as("toks"))
          .withColumn("sz", size(col("toks")))
          .withColumn("pl", col("sz") - expr("(sz * 3 + 4) div 5") + 1)
          .localCheckpoint()
      }
      val pre = ranked.select(col("doc_id"), col("sz"),
        explode(expr("slice(toks, 1, pl)")).as("rk"))
      val cand = time("cand") {
        pre.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("rk"))
          .join(pre.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
            col("rk")), Seq("rk"))
          .filter(col("doc_a") < col("doc_b") &&
            col("sz_a") * 3 <= col("sz_b") * 5 &&
            col("sz_b") * 3 <= col("sz_a") * 5)
          .select(col("doc_a"), col("doc_b"))
          .distinct().localCheckpoint()
      }
      println("[probe] cand rows " + cand.count() + " parts " + cand.rdd.getNumPartitions)
      time("verify")(noop(cand
        .join(ranked.select(col("doc_id").as("doc_a"),
          col("toks").as("toks_a"), col("sz").as("sz_a")), Seq("doc_a"))
        .join(ranked.select(col("doc_id").as("doc_b"),
          col("toks").as("toks_b"), col("sz").as("sz_b")), Seq("doc_b"))
        .withColumn("inter",
          sortedIntersectSize(col("toks_a"), col("toks_b")).cast("double"))
        .withColumn("den", col("sz_a") + col("sz_b") - col("inter"))
        .withColumn("jac", col("inter") / when(col("den") > 0, col("den")))
        .filter(col("jac") >= 0.6)))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
