package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Batch orchestration parity: the reference's Airflow loop (cron every
  * 10 min, sensor, claim first file, run pipeline — `code/airflow_pipe.py:
  * 63-94`) as a single-process driver. One claim+run per cycle; the loop is
  * single-threaded, which IS the reference's `max_active_runs=1`.
  *
  * CLI (the `code/metadata.json` parameter contract as args):
  *   inputDir outputDir [prefix] [--once | --cycles N] [--interval-ms M]
  */
object FoodOrdersDriver {

  final case class Config(inputDir: String, outputDir: String,
      prefix: String = "food_daily", cycles: Int = Int.MaxValue,
      intervalMs: Long = 10 * 60 * 1000L)

  def parse(args: Array[String]): Config = {
    require(args.length >= 2, "usage: inputDir outputDir [prefix] [--once]")
    var cfg = Config(args(0), args(1))
    var i = 2
    while (i < args.length) {
      args(i) match {
        case "--once" => cfg = cfg.copy(cycles = 1)
        case "--cycles" => cfg = cfg.copy(cycles = args(i + 1).toInt); i += 1
        case "--interval-ms" =>
          cfg = cfg.copy(intervalMs = args(i + 1).toLong); i += 1
        case p => cfg = cfg.copy(prefix = p)
      }
      i += 1
    }
    cfg
  }

  /** One sense→claim→process cycle. Returns the counts when a file was
    * processed, None when nothing was sensed (the reference's sensor just
    * reschedules in that case). */
  def runCycle(spark: SparkSession, cfg: Config)
      : Option[FoodOrdersJob.Counts] = {
    val conf = spark.sparkContext.hadoopConfiguration
    if (!FileClaimer.senses(conf, cfg.inputDir, cfg.prefix)) None
    else {
      val claimed = FileClaimer.claimFirst(conf, cfg.inputDir, cfg.prefix)
      val counts =
        FoodOrdersJob.runSinglePass(spark, claimed.toString, cfg.outputDir)
      Some(counts)
    }
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val spark = GraftSession.get()
    var cycle = 0
    while (cycle < cfg.cycles) {
      runCycle(spark, cfg) match {
        case Some(c) =>
          // the reference logs total/delivered/other each run
          // (code/beam.py:140-162)
          println(s"[food-orders] total=${c.total} delivered=${c.delivered} " +
            s"other=${c.other}")
        case None =>
          println(s"[food-orders] no file with prefix '${cfg.prefix}'")
      }
      cycle += 1
      if (cycle < cfg.cycles) Thread.sleep(cfg.intervalMs)
    }
    spark.stop()
  }
}
