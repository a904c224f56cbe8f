package graft

import org.apache.spark.sql.functions._

object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Graph, Tables}
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (rnd <- 1 to 3) {
      println(s"[probe] === round $rnd")
      val pairs = time("ngramJaccardPairs") {
        graft.dedup.Dedup.ngramJaccardPairs(spark, sfDir, threshold = 0.8)
          .select(col("doc_a"), col("doc_b")).localCheckpoint()
      }
      println("[probe] pairs " + pairs.count())
      val nodes = Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 4 === 0).select(col("doc_id"))
      time("connectedComponents") {
        Graph.connectedComponents(nodes, pairs).count()
      }
      println("[probe] cc rounds " + Graph.lastRounds)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
