package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.multimodal.{BmpCodec, GifCodec, VideoNeardup}

/** The streaming video near-dup probe mirrors the image/audio arms'
  * contract: stream equals batch on the distinct matched set, stateless
  * plan, exact dups score hamming 0 — plus the video-specific property
  * that ONE stream carries BOTH containers (GVID and animated GIF89a)
  * and they match against the same registry. */
class StreamingVideoNeardupSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic 9×8 grayscale raster per seed (independent md5 per
    * 16-cell chunk, the corpus recipe); `perturb` adds 128 to cell 0 —
    * cell 0 feeds only comparison bit (0,0), so a perturbed frame moves
    * ≤ 1 of its 64 dHash bits. */
  private def raster(seed: Long, perturb: Boolean): BmpCodec.Decoded = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var dig: Array[Byte] = null
    val p = Array.tabulate(72) { i =>
      if (i % 16 == 0)
        dig = md.digest(s"sv${seed}_${i / 16}".getBytes("UTF-8"))
      dig(i % 16) & 0xff
    }
    if (perturb) p(0) = (p(0) + 128) % 256
    val bgr = new Array[Byte](72 * 3)
    for (i <- 0 until 72) {
      val v = p(i).toByte
      bgr(i * 3) = v; bgr(i * 3 + 1) = v; bgr(i * 3 + 2) = v
    }
    BmpCodec.Decoded(9, 8, bgr)
  }

  // pf = 3 below is load-bearing (like the audio spec's seed choice):
  // a +128 edit of cell 0 flips comparison bit (0,0) only when it
  // changes the sign of p(1)-p(0) — for video seed 0 that holds on
  // frames 0 and 3, not 1 or 2 (dHash edits give no >=1-flip guarantee)
  private def frames(seed: Long, pf: Int): Seq[BmpCodec.Decoded] =
    (0 until VideoNeardup.FrameCount)
      .map(f => raster(seed * 4 + f, f == pf))

  private def gvid(seed: Long, pf: Int = -1): Array[Byte] =
    VideoNeardup.encodeVideo(frames(seed, pf).map(BmpCodec.encode))

  private def agif(seed: Long, pf: Int = -1): Array[Byte] =
    GifCodec.encodeFrames(frames(seed, pf))

  test("streaming video near-dup probe: arriving videos (both " +
      "containers in one stream) flag against the frozen registry, " +
      "stream equals batch on the distinct match set") {
    // geometry sanity through the production fingerprints
    val fa = VideoNeardup.fingerprintOf(gvid(0L)).get
    val fn = VideoNeardup.fingerprintOf(gvid(0L, pf = 3)).get
    val fg = VideoNeardup.fingerprintOf(agif(0L)).get
    def ham(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(fa.toSeq === fg.toSeq, "container-independent fingerprint")
    assert(ham(fa, fn) <= 1, "planted perturbation moves at most 1 bit")
    val fu = VideoNeardup.fingerprintOf(gvid(777L)).get
    assert(ham(fa, fu) > VideoNeardup.MaxHamming, "unrelated stays out")

    val registry = VideoNeardup.fingerprints(Seq(
      (1L, gvid(0L)), (2L, gvid(31337L))
    ).toDF("asset_id", "media"), spark).localCheckpoint()
    val arriving = Seq(
      (100L, gvid(0L, pf = 3)), // near-dup of 1, GVID container
      (101L, agif(777L)),       // unrelated, GIF container
      (102L, agif(0L))          // exact dup of 1, GIF container
    )
    val batchPairs = StreamingVideoNeardup.matches(
        arriving.toDF("asset_id", "media"), registry, spark)
      .select($"asset_id", $"match_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(batchPairs === Set((100L, 1L), (102L, 1L)), s"got $batchPairs")
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val q = StreamingVideoNeardup.matches(
        input.toDS().toDF("asset_id", "media"), registry, spark)
      .writeStream.format("memory").queryName("svidnear")
      .outputMode("append").start()
    input.addData(arriving.take(1))
    q.processAllAvailable()
    input.addData(arriving.drop(1))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("svidnear")
      .select($"asset_id", $"match_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(streamed === batchPairs,
      "stream must equal batch on the distinct matched set")
    val hams = spark.table("svidnear")
      .select($"asset_id", $"hamming")
      .as[(Long, Int)].collect().toMap
    assert(hams(102L) === 0,
      "the cross-container exact dup scores hamming 0")
    assert(hams(100L) === 1)
  }

  test("checkpointed restart is exactly-once: each arriving video's " +
      "matches land once, an idle restart adds nothing, and the final " +
      "output equals the batch probe row-for-row") {
    def tmpDir(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val src = tmpDir("vidnear-src"); val out = tmpDir("vidnear-out")
    val ckpt = tmpDir("vidnear-ckpt")
    val registry = VideoNeardup.fingerprints(Seq(
      (1L, gvid(0L)), (2L, gvid(31337L))
    ).toDF("asset_id", "media"), spark).localCheckpoint()
    val arriving = Seq(
      (100L, gvid(0L, pf = 3)),
      (101L, agif(777L)),
      (102L, agif(0L)))
    def run(): Unit = {
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = StreamingVideoNeardup.matches(stream, registry, spark)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); q.stop()
    }
    def addFile(rows: Seq[(Long, Array[Byte])], name: String): Unit = {
      val stage = tmpDir("vidnear-stage")
      rows.toDF("asset_id", "media")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(src, name))
    }
    addFile(arriving.take(2), "f1.parquet")
    run() // processes file 1
    addFile(arriving.drop(2), "f2.parquet")
    run() // restart from the checkpoint: only file 2 is new
    val afterTwo = spark.read.parquet(out)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    run() // restart with nothing new: must be a no-op
    val afterThree = spark.read.parquet(out)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(afterThree === afterTwo, "an idle restart must add no rows")
    val batch = StreamingVideoNeardup.matches(
        arriving.toDF("asset_id", "media"), registry, spark)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(afterTwo === batch,
      "restarted stream equals batch row-for-row (per-band multiset)")
  }

  test("the MJPEG (lossy) container joins the stream: variants flag " +
      "against a frozen MJPEG registry within the planted bound, an " +
      "exact byte dup scores hamming 0, and a third container rides " +
      "the same stream — stream equals batch on the distinct set") {
    // the corpus generator is the only sound frame source here: the
    // local raster() recipe has no adjacency margin, so JPEG noise
    // could legally shift its hash — the no-tie corpus grid is what
    // makes lossy assertions exact (MjpegNeardupSpec pins why)
    val corpus = VideoNeardup.videoCorpusMjpegDf(
      Seq(0L, 20L, 777L).toDF("doc_id"), spark).localCheckpoint()
    val off = graft.multimodal.ImageNeardup.VariantOffset
    val bases = corpus.filter($"asset_id" < off)
    val registry = VideoNeardup.fingerprints(bases, spark)
      .localCheckpoint()
    val media777 = bases.filter($"asset_id" === 777L)
      .select($"media").as[Array[Byte]].head()
    val variants = corpus.filter($"asset_id" >= off)
      .select($"asset_id", $"media").as[(Long, Array[Byte])].collect()
    assert(variants.map(_._1).toSet === Set(off, off + 20L))
    val arriving = variants.toSeq ++ Seq(
      (200L, media777), // exact MJPEG byte dup of base 777
      (201L, gvid(777L))) // a GVID asset in the same stream (unrelated)
    val batchPairs = StreamingVideoNeardup.matches(
        arriving.toDF("asset_id", "media"), registry, spark)
      .select($"asset_id", $"match_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(batchPairs === Set((off, 0L), (off + 20L, 20L), (200L, 777L)),
      s"got $batchPairs")
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val q = StreamingVideoNeardup.matches(
        input.toDS().toDF("asset_id", "media"), registry, spark)
      .writeStream.format("memory").queryName("svidnearmj")
      .outputMode("append").start()
    input.addData(arriving.take(2))
    q.processAllAvailable()
    input.addData(arriving.drop(2))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("svidnearmj")
      .select($"asset_id", $"match_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(streamed === batchPairs,
      "stream must equal batch on the distinct matched set")
    val hams = spark.table("svidnearmj")
      .select($"asset_id", $"hamming")
      .as[(Long, Int)].collect().groupBy(_._1).map {
        case (k, vs) => k -> vs.map(_._2).min }
    assert(hams(200L) === 0, "exact byte dup scores hamming 0")
    assert(hams(off) <= 2 && hams(off + 20L) <= 2,
      "planted variants stay within the deterministic <=2-bit bound")
  }

  test("the streaming probe plan is stateless (no state store nodes)") {
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val registry = VideoNeardup.fingerprints(Seq(
      (1L, gvid(0L))).toDF("asset_id", "media"), spark)
      .localCheckpoint()
    val out = StreamingVideoNeardup.matches(
      input.toDS().toDF("asset_id", "media"), registry, spark)
    assert(out.isStreaming)
    // node-typed check: the hamming column uses the `aggregate`
    // higher-order FUNCTION, so a plan-string grep would false-positive
    // — what must be absent is a logical Aggregate NODE (state store)
    val aggNodes = out.queryExecution.analyzed.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggNodes.isEmpty,
      "probe must not introduce a streaming aggregation")
  }
}
