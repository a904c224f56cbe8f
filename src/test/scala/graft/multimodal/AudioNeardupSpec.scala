package graft.multimodal

import graft.SparkTestBase

/** Pins for the audio near-dup family: the fingerprint equals an
  * independent in-test Haitsma-Kalker re-derivation from the raw PCM,
  * planted-variant geometry (≤ 2 bits, last-band column), corpus pair
  * exactness at sf0.001 for both widths, apply semantics over the real
  * corpus, and never-throw decoding. The banded-join == brute-force
  * guarantee itself is pinned by ImageNeardupSpec — audio composes the
  * image family's band machinery on its own fingerprint columns. */
class AudioNeardupSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent HK reference: energies and sign bits re-derived here
    * from first principles (no AudioNeardup internals beyond pcm). */
  private def referenceBits(samples: Array[Short], frames: Int,
      bands: Int): Seq[Int] = {
    def e(f: Int, m: Int): Long = {
      val b = f * bands + m
      (0 until AudioNeardup.BlockLen)
        .map(j => samples(b * AudioNeardup.BlockLen + j).toLong)
        .map(s => s * s).sum
    }
    for {
      f <- 1 until frames
      m <- 0 until bands - 1
      if (e(f, m) - e(f, m + 1)) - (e(f - 1, m) - e(f - 1, m + 1)) > 0
    } yield (f - 1) * (bands - 1) + m
  }

  test("the 64-bit fingerprint equals the independent HK re-derivation " +
      "through the full encode→decode path") {
    for (seed <- Seq(0L, 7L, 4242L, 999983L); pb <- Seq(-1, 0, 84)) {
      val n = AudioNeardup.Frames * AudioNeardup.Bands * AudioNeardup.BlockLen
      val samples = AudioNeardup.pcm(seed, pb, n)
      val wav = WavCodec.encode(WavCodec.Wav(AudioNeardup.SampleRate, 1,
        samples))
      val got = AudioNeardup.fingerprintOf(wav).get
      val want = referenceBits(samples, AudioNeardup.Frames,
        AudioNeardup.Bands).map(1L << _).foldLeft(0L)(_ | _)
      assert(got === want, s"seed=$seed pb=$pb")
    }
  }

  test("the 256-bit fingerprint equals the independent re-derivation") {
    val n = AudioNeardup.WideFrames * AudioNeardup.WideBands *
      AudioNeardup.BlockLen
    val samples = AudioNeardup.pcm(4242L, -1, n)
    val wav = WavCodec.encode(WavCodec.Wav(AudioNeardup.SampleRate, 1,
      samples))
    val got = AudioNeardup.fingerprint256Of(wav).get
    val want = new Array[Long](4)
    referenceBits(samples, AudioNeardup.WideFrames, AudioNeardup.WideBands)
      .foreach(i => want(i >> 6) |= 1L << (i & 63))
    assert(got.toSeq === want.toSeq)
  }

  test("a last-band block perturbation flips at most 2 fingerprint bits " +
      "and at least the planted pairs qualify") {
    val n = AudioNeardup.Frames * AudioNeardup.Bands * AudioNeardup.BlockLen
    for (doc <- 0L until 40L by 20L) {
      val pb = ((doc % AudioNeardup.Frames) * AudioNeardup.Bands +
        (AudioNeardup.Bands - 1)).toInt
      val base = AudioNeardup.fingerprintOf(WavCodec.encode(WavCodec.Wav(
        AudioNeardup.SampleRate, 1, AudioNeardup.pcm(doc, -1, n)))).get
      val vari = AudioNeardup.fingerprintOf(WavCodec.encode(WavCodec.Wav(
        AudioNeardup.SampleRate, 1, AudioNeardup.pcm(doc, pb, n)))).get
      assert(java.lang.Long.bitCount(base ^ vari) <= 2, s"doc=$doc")
    }
  }

  test("the corpus plants one variant per 20th doc and the pair query " +
      "finds exactly the planted set at sf0.001") {
    val corpus = AudioNeardup.audioCorpus(spark, sf0001).localCheckpoint()
    val nAssets = corpus.count()
    val fps = AudioNeardup.fingerprints(corpus, spark)
    assert(fps.count() === nAssets, "every clip must decode+fingerprint")
    val pairs = AudioNeardup.audioNeardupPairs(spark, sf0001)
      .as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, d) =>
      assert(b === a + ImageNeardup.VariantOffset,
        s"only planted (base, base+10^7) pairs expected, got ($a,$b)")
      assert(d <= 2, "a last-band block edit flips at most 2 bits")
    }
    val expected = graft.operators.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 20 === 0).count()
    assert(pairs.length === expected)
  }

  test("the wide corpus plants the same geometry and q290 finds exactly " +
      "the planted set at sf0.001") {
    val pairs = AudioNeardup.audioNeardupWide(spark, sf0001)
      .as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, d) =>
      assert(b === a + ImageNeardup.VariantOffset,
        s"only planted (base, base+10^7) pairs expected, got ($a,$b)")
      assert(d <= 2)
    }
    val expected = graft.operators.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 20 === 0).count()
    assert(pairs.length === expected)
  }

  test("apply marks every planted variant dropped and its base kept " +
      "with degree 1") {
    val got = AudioNeardup.audioNeardupApply(spark, sf0001)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val planted = graft.operators.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 20 === 0).select($"doc_id")
      .as[Long].collect()
    assert(planted.nonEmpty)
    planted.foreach { d =>
      assert(got(d) === ((1L, true)), s"base $d keeps with degree 1")
      assert(got(d + ImageNeardup.VariantOffset) === ((1L, false)),
        s"variant of $d drops (its base has the smaller id)")
    }
    // everything unplanted is isolated: degree 0, kept
    got.collect { case (id, (deg, keep))
        if id < ImageNeardup.VariantOffset && id % 20 != 0 =>
      assert(deg === 0L && keep, s"unplanted $id must be isolated")
    }
  }

  test("fingerprintOf never throws on junk, short clips, or empty input") {
    assert(AudioNeardup.fingerprintOf(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioNeardup.fingerprintOf(Array.empty[Byte]).isEmpty)
    // a VALID wav that is too short for the geometry → None, not a crash
    val tiny = WavCodec.encode(WavCodec.Wav(8000, 1,
      Array.tabulate(10)(i => i.toShort)))
    assert(AudioNeardup.fingerprintOf(tiny).isEmpty)
    assert(AudioNeardup.fingerprint256Of(tiny).isEmpty)
    // and a wav exactly at the compact length fingerprints but is too
    // short for the wide geometry
    val exact = WavCodec.encode(WavCodec.Wav(8000, 1,
      AudioNeardup.pcm(1L, -1,
        AudioNeardup.Frames * AudioNeardup.Bands * AudioNeardup.BlockLen)))
    assert(AudioNeardup.fingerprintOf(exact).isDefined)
    assert(AudioNeardup.fingerprint256Of(exact).isEmpty)
  }
}
