package graft

import org.apache.spark.sql.SparkSession

/** Pinned-environment mini-bench for the ANN/dedup/sketch query cluster
  * whose round-6→7 drift triggered a verdict investigation (NOTES_r7 §3:
  * the cause was a contract change, not contamination — established by
  * exactly this isolated re-measurement, now committed as a tool).
  *
  * Protocol: the FIXED 17-query panel below runs in isolation order —
  * checkpoint blocks dropped and a full GC between queries, `trials`
  * repetitions per query with the MINIMUM kept (the min of k trials
  * estimates the contention-free cost; means smear box noise back in).
  * Run it at round start and round end: a start-vs-end diff isolates
  * code-change effects from machine noise (both runs share the
  * environment) — attribution the full bench's single pass can't give.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.MiniBench [trials]
  * Prints one JSON line {"metric":"mini_bench","queries":{...}}. */
object MiniBench {

  /** The drift-investigation panel: ANN family (index + probe paths),
    * MinHash/SimHash dedup, sketches, and the graph/sim heavies that
    * co-moved in the round-6→7 delta. Fixed — comparability across
    * rounds is the point; grow it only by appending. */
  val Panel: Seq[String] = Seq(
    "q27_dedup_minhash", "q28_dedup_simhash", "q31_ann_ivf",
    "q47_dedup_apply", "q84_pq_ann", "q96_ivfpq_ann", "q112_opq_ann",
    "q173_cm_frequent", "q216_sq8_ann", "q225_rerank_ann",
    "q232_item_cosine", "q250_hyperanf", "q256_semdedup",
    "q262_filtered_ann", "q269_ivf_delta_ingest", "q281_ivf_probe_curve",
    "q282_sq8_distortion",
    // round 9 appends (comparability: the original 17 keep their order):
    // the four round-8 scale rewrites are now the queries whose drift
    // matters most — PassJoin segments, probe-loop quantiles, the geo
    // cascade, and the prefix-filtered containment join
    "q59_fuzzy_levenshtein", "q111_sketch_quantiles", "q125_geo_nearest",
    "q240_shingle_containment",
    // round 10 appends: the extracted fuzzy kernel's second caller and
    // the new image near-dup family — the current drift-sensitive surface
    "q284_fuzzy_phone_linkage", "q285_image_neardup_pairs",
    "q286_image_neardup_apply", "q287_image_neardup_wide",
    // round 11 appends: the audio and video near-dup families — the
    // near-dup panel now spans text, embeddings, images, audio, video
    "q288_audio_neardup_pairs", "q289_audio_neardup_apply",
    "q290_audio_neardup_wide", "q291_video_neardup_pairs",
    "q292_video_neardup_apply",
    // round 12 appends — the ADJUDICATION ANNEX (verdict items 1+7):
    // the seven queries the round-11 driver bench flagged over the 2×
    // ratchet with NO MiniBench history to adjudicate against
    // (over2x:7, adjudicated:0 — the evidence machinery existed but
    // these had no isolated recordings), plus the five non-panel
    // retried-clear repeat offenders from the same run. On the panel
    // they accumulate isolated 3-trial minimums every round, so a
    // future in-sequence flag self-discharges through
    // BenchGuard.adjudicateStamped instead of dangling as an open claim
    "q110_recursive_chain", "q139_knn_triangles", "q247_tpch_q16",
    "q263_ccnet_buckets", "q276_vocab_coverage", "q277_dsir_ess",
    "q278_snapshot_neardup",
    "q69_contamination", "q86_pagerank", "q97_scd2_merge",
    "q98_bfs_reach", "q251_heaps_law",
    // round 12 new-operator appends: the animated-GIF89a video
    // container arm (real-world multi-frame packaging of q291/q292)
    "q293_video_neardup_gif", "q294_video_neardup_gif_apply",
    // round 13 appends (verdict item 1): the three queries the round-12
    // driver bench flagged over the 2× ratchet with no isolated history
    // — on the panel they accumulate stamped 3-trial minimums every
    // round, so a future in-sequence flag self-discharges (and Bench
    // itself now runs this protocol in-run on any flag that survives
    // its single retry, so non-panel queries no longer dangle either)
    "q197_auc", "q205_fifo_costing", "q224_changepoint",
    // round 13 new-operator appends: the MJPEG (lossy) video container
    // arm — the near-dup family's first member through quantization loss
    "q295_video_neardup_mjpeg", "q296_video_neardup_mjpeg_apply")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val trials = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dropCheckpoints(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))

    // one untimed warmup pass (JIT, codegen cache, parquet footers,
    // WarehouseCache index artifacts — offline work in production)
    Panel.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
      dropCheckpoints()
    }
    System.gc()

    val results = Panel.map { n =>
      val trialTimes = (0 until trials).map { _ =>
        dropCheckpoints()
        System.gc()
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(n)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[mini] $n failed: ${e.getMessage}")
            false
          }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // a failed trial poisons the query: report -1, never a fake min
      n -> (if (trialTimes.exists(_ < 0)) -1.0 else trialTimes.min)
    }
    val qs = results
      .map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // code-identity stamp: recorded BASELINE.md blocks carry it as a
    // `code: <stamp>` line so BenchGuard.adjudicateStamped can refuse
    // stale evidence (a record predating the code under test)
    val stamp = BenchGuard.codeStamp().getOrElse("unavailable")
    // box-speed index vs the recorded MiniBench best-knowns: the panel
    // is isolated 3-trial minimums on both sides, so the median ratio
    // IS the box — see BenchGuard.boxIndex
    val md =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("BASELINE.md"))
      catch { case _: Throwable => "" }
    val miniBest = BenchGuard.miniHistory(md)
      .map { case (q, h) => q -> h.min }
    val box = BenchGuard.boxIndex(results, miniBest)
      .map(b => f""","box":$b%.3f""").getOrElse("")
    println(f"""{"metric":"mini_bench","value":$total%.3f,"unit":"sec","trials":$trials,"code":"$stamp"$box,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
