package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop micro-bench: MiniBench's isolated 3-trial-minimum protocol
  * over an ARBITRARY query-prefix subset (MiniBench's panel is
  * protocol-fixed; this main is for optimization A/B loops where the
  * subset is whatever is being worked on). Not part of the driver
  * contract; never recorded in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.QBench <trials> <prefix...>
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = args(0).toInt
    val prefixes = args.drop(1)
    val spark: SparkSession = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    def dropCheckpoints(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    names.foreach { n => // untimed warmup
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[qbench] warmup $n failed: ${e.getMessage}") }
      dropCheckpoints()
    }
    System.gc()
    val results = names.map { n =>
      val ts = (0 until trials).map { _ =>
        dropCheckpoints(); System.gc()
        val t0 = System.nanoTime()
        val ok = try { SparkEntry.queries(n)(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      n -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"qbench","trials":$trials,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
