package graft.multimodal

import graft.SparkTestBase

/** Pins for the MJPEG (lossy) video container arm — the near-dup
  * family's first member through real quantization loss. The load-
  * bearing pin is the DECODE-SIDE LUMA TOLERANCE: the no-tie margin
  * corpus guarantees exact planted-pair recall only while the JPEG
  * roundtrip error stays under ±16 per cell, so that bound is measured
  * here on the actual corpus distribution (and the arm's lossiness
  * itself is asserted — a silently-lossless path would trivialize the
  * claim the arm exists to test). Splitter structure, fingerprint
  * determinism, planted geometry, and sf0.001 pair/apply exactness
  * mirror VideoNeardupSpec one container over. */
class MjpegNeardupSpec extends SparkTestBase {
  import spark.implicits._

  private val W = ImageNeardup.GridW
  private val H = ImageNeardup.GridH

  private def lumaOf(img: BmpCodec.Decoded, i: Int): Int = {
    val b = img.bgr(i * 3) & 0xff
    val g = img.bgr(i * 3 + 1) & 0xff
    val r = img.bgr(i * 3 + 2) & 0xff
    (r * 299 + g * 587 + b * 114) / 1000
  }

  private def encodeGrid(p: Array[Int]): Array[Byte] = {
    val bgr = new Array[Byte](W * H * 3)
    p.indices.foreach { i =>
      val v = p(i).toByte
      bgr(i * 3) = v; bgr(i * 3 + 1) = v; bgr(i * 3 + 2) = v
    }
    JpegCodec.encode(BmpCodec.Decoded(W, H, bgr),
      VideoNeardup.MjpegQuality)
  }

  test("decode-side luma tolerance: JPEG roundtrip error on the no-tie " +
      "corpus distribution stays far inside the ±16 margin the exact-" +
      "recall construction needs — and the path IS lossy (some cell " +
      "somewhere decodes off the source)") {
    var maxErr = 0
    var anyLoss = false
    for (seed <- 0L until 300L; perturb <- Seq(-1, (seed % 72).toInt)) {
      val p = VideoNeardup.mjpegGrid(seed, perturb)
      val dec = JpegCodec.decode(encodeGrid(p)).get
      assert(dec.width === W && dec.height === H)
      p.indices.foreach { i =>
        val e = math.abs(lumaOf(dec, i) - p(i))
        maxErr = math.max(maxErr, e)
        if (e > 0) anyLoss = true
      }
    }
    assert(maxErr < 16, s"luma error $maxErr reaches the margin — the " +
      "exact-recall construction is broken")
    assert(maxErr <= 6, s"luma error $maxErr is beyond the documented " +
      "quality-100 budget (~3): re-derive the margin before trusting it")
    assert(anyLoss, "the roundtrip was bit-exact everywhere — the arm " +
      "is not exercising quantization loss at all")
  }

  test("the no-tie grid construction holds for every seed: horizontally " +
      "adjacent cells differ by >= 32 luma and never exactly 128, and " +
      "the +128 perturbation of ANY cell preserves both properties " +
      "while moving at most 2 comparison bits") {
    def checkMargins(p: Array[Int]): Unit =
      for (y <- 0 until H; x <- 1 until W) {
        val d = math.abs(p(y * W + x) - p(y * W + x - 1))
        assert(d >= 32 && d != 128, s"margin broken at ($x,$y): $d")
      }
    def bits(p: Array[Int]): Seq[Boolean] =
      for (y <- 0 until H; x <- 0 until W - 1)
        yield p(y * W + x + 1) > p(y * W + x)
    for (seed <- 0L until 200L) {
      val base = VideoNeardup.mjpegGrid(seed, -1)
      checkMargins(base)
      assert(base.forall(v => v >= 16 && v <= 240 && (v - 16) % 32 == 0))
      val pi = (seed % (W * H)).toInt
      val pert = VideoNeardup.mjpegGrid(seed, pi)
      checkMargins(pert)
      // unperturbed cells identical; the perturbed one moved ±128
      base.indices.foreach { i =>
        if (i == pi)
          // +4 levels mod 8 on the 16+32k lattice is exactly ±128 luma
          assert(math.abs(pert(i) - base(i)) === 128,
            s"cell $pi moved ${pert(i) - base(i)}")
        else assert(pert(i) === base(i))
      }
      val flips = bits(base).zip(bits(pert)).count { case (a, b) => a != b }
      assert(flips <= 2, s"seed $seed: $flips comparison bits moved")
    }
  }

  test("the MJPEG splitter recovers every frame byte-exact, survives an " +
      "EOI byte pattern inside a segment payload, and rejects junk, " +
      "truncation, and trailing garbage") {
    val frames = (0 until 4).map(f =>
      encodeGrid(VideoNeardup.mjpegGrid(100L + f, -1)))
    val enc = VideoNeardup.encodeMjpeg(frames)
    val dec = VideoNeardup.decodeMjpeg(enc).get
    assert(dec.length === 4)
    frames.zip(dec).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // splice a COM segment whose PAYLOAD contains the FFD9 EOI pattern
    // right after frame 0's SOI: a naive EOI scan would cut the frame
    // there; the segment walk must skip it by declared length
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0x04,
      0xff.toByte, 0xd9.toByte)
    val tricky = frames(0).take(2) ++ com ++ frames(0).drop(2)
    assert(JpegCodec.frameLength(tricky, 0) === Some(tricky.length))
    val enc2 = VideoNeardup.encodeMjpeg(tricky +: frames.tail)
    val dec2 = VideoNeardup.decodeMjpeg(enc2).get
    assert(dec2.length === 4 && dec2.head.toSeq === tricky.toSeq)
    // malformed forms
    assert(VideoNeardup.decodeMjpeg(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoNeardup.decodeMjpeg(Array.empty[Byte]).isEmpty)
    assert(VideoNeardup.decodeMjpeg(enc.dropRight(1)).isEmpty,
      "truncated final frame must reject the whole container")
    assert(VideoNeardup.decodeMjpeg(enc :+ 0x7f.toByte).isEmpty,
      "trailing non-JPEG bytes are malformed")
  }

  test("fingerprintOf dispatches MJPEG on the JPEG magic and requires " +
      "exactly FrameCount decodable frames") {
    val frames = (0 until VideoNeardup.FrameCount).map(f =>
      encodeGrid(VideoNeardup.mjpegGrid(4242L * 4 + f, -1)))
    val fp = VideoNeardup.fingerprintOf(VideoNeardup.encodeMjpeg(frames))
    assert(fp.exists(_.length === VideoNeardup.FrameCount))
    // per-frame hash = decode + dHash of that frame, composed in order
    val expect = frames.map(b =>
      ImageNeardup.dhashOfDecoded(JpegCodec.decode(b).get))
    assert(fp.get.toSeq === expect)
    // wrong frame count → None
    assert(VideoNeardup.fingerprintOf(
      VideoNeardup.encodeMjpeg(frames.take(2))).isEmpty)
  }

  test("the lossy corpus finds exactly the planted pair set at sf0.001 " +
      "(recall 1.0, zero false pairs through real quantization) and " +
      "every video fingerprints") {
    val corpus = VideoNeardup.videoCorpusMjpeg(spark, sf0001)
      .localCheckpoint()
    val n = corpus.count()
    val fps = VideoNeardup.fingerprints(corpus, spark)
    assert(fps.count() === n, "every MJPEG video must decode+fingerprint")
    val pairs = VideoNeardup.videoNeardupPairsMjpeg(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(b === a + ImageNeardup.VariantOffset,
        s"only planted (base, base+10^7) pairs expected, got ($a,$b)")
    }
    val expected = graft.operators.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 20 === 0).count()
    assert(pairs.length === expected)
  }

  test("apply over the lossy corpus marks every planted variant dropped " +
      "and its base kept with degree 1; unplanted videos are isolated") {
    val got = VideoNeardup.videoNeardupApplyMjpeg(spark, sf0001)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val planted = graft.operators.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 20 === 0).select($"doc_id")
      .as[Long].collect()
    assert(planted.nonEmpty)
    planted.foreach { d =>
      assert(got(d) === ((1L, true)), s"base $d keeps with degree 1")
      assert(got(d + ImageNeardup.VariantOffset) === ((1L, false)),
        s"variant of $d drops")
    }
    got.collect { case (id, (deg, keep))
        if id < ImageNeardup.VariantOffset && id % 20 != 0 =>
      assert(deg === 0L && keep, s"unplanted $id must be isolated")
    }
  }
}
