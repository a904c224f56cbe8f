package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries to files — the
  * plan evidence the optimization rounds commit under plans/rNN/.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [queryPrefix...]
  * Writes <outDir>/<query>_<suffix>.txt for each selected query.
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench so the dumped
  * plan is the one the bench actually executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val prefixes = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val all = SparkEntry.queries.keys.toSeq.sorted
    val names =
      if (prefixes.isEmpty) all
      else all.filter(n => prefixes.exists(n.startsWith))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
        println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
