package graft.multimodal

import graft.SparkTestBase

/** Pins for the video near-dup family: container roundtrip and
  * malformed-input rejection, the temporal fingerprint equals the
  * per-frame dHash composition, planted geometry (≤ 2 bits, one
  * frame), corpus pair exactness at sf0.001, and apply semantics. The
  * banded join itself is ImageNeardupSpec's (the fingerprint reuses
  * the wide 4-long shape verbatim). */
class VideoNeardupSpec extends SparkTestBase {
  import spark.implicits._

  private def frame(seed: Long, arm: Long, perturb: Int = -1): Array[Byte] =
    ImageNeardup.renderImage(arm, seed, perturb)._1

  test("container roundtrips frames byte-for-byte and rejects junk, " +
      "truncation, and frame-count lies") {
    val frames = Seq(frame(1L, 0L), frame(2L, 1L), frame(3L, 2L),
      Array[Byte]())
    val enc = VideoNeardup.encodeVideo(frames)
    val dec = VideoNeardup.decodeVideo(enc).get
    assert(dec.length === frames.length)
    frames.zip(dec).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    assert(VideoNeardup.decodeVideo(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoNeardup.decodeVideo(Array.empty[Byte]).isEmpty)
    assert(VideoNeardup.decodeVideo(enc.dropRight(1)).isEmpty,
      "truncated payload must be rejected, not mis-sliced")
    val lied = enc.clone(); lied(4) = 9 // claims 9 frames
    assert(VideoNeardup.decodeVideo(lied).isEmpty)
    // trailing garbage after the last frame is malformed too — the
    // contract is None on ANY malformed input (round-11 advice: the
    // truncation check alone passed only because dropping a byte
    // shortens the last frame)
    assert(VideoNeardup.decodeVideo(enc :+ 0x7f.toByte).isEmpty,
      "appended trailing bytes must be rejected")
  }

  test("the temporal fingerprint equals the per-frame dHash composition " +
      "through the full container path") {
    for (key <- Seq(0L, 7L, 4242L)) {
      val frames = (0 until VideoNeardup.FrameCount)
        .map(f => frame(key * 4 + f, key + f))
      val fp = VideoNeardup.fingerprintOf(
        VideoNeardup.encodeVideo(frames)).get
      val expect = frames.map(b => ImageNeardup.dhashOf(b).get)
      assert(fp.toSeq === expect, s"key=$key")
    }
    // wrong frame count → None
    assert(VideoNeardup.fingerprintOf(
      VideoNeardup.encodeVideo(Seq(frame(1L, 0L)))).isEmpty)
    // an undecodable frame → None
    assert(VideoNeardup.fingerprintOf(VideoNeardup.encodeVideo(
      Seq(frame(1L, 0L), frame(2L, 1L), frame(3L, 2L),
        Array[Byte](9, 9, 9)))).isEmpty)
  }

  test("the fingerprint is container-independent: the same pixel frames " +
      "through GVID and animated GIF89a hash identically, and the GIF " +
      "corpus finds exactly the GVID corpus's pairs at sf0.001") {
    // unit level: one video, both containers, equal 256-bit stacks
    for (key <- Seq(0L, 7L, 4242L)) {
      val rasters = (0 until VideoNeardup.FrameCount)
        .map(f => ImageNeardup.renderDecoded(key * 4 + f, -1))
      val viaGvid = VideoNeardup.fingerprintOf(VideoNeardup.encodeVideo(
        rasters.zipWithIndex.map { case (r, f) =>
          ImageNeardup.renderImage(key + f, key * 4 + f, -1)._1 }))
      val viaGif = VideoNeardup.fingerprintOf(
        GifCodec.encodeFrames(rasters))
      assert(viaGif.isDefined && viaGvid.isDefined, s"key=$key")
      assert(viaGif.get.toSeq === viaGvid.get.toSeq, s"key=$key")
    }
    // wrong frame count through the GIF arm → None
    assert(VideoNeardup.fingerprintOf(GifCodec.encodeFrames(
      Seq(ImageNeardup.renderDecoded(1L, -1)))).isEmpty)
    // corpus level: q293 == q291 pair-for-pair
    val viaGifCorpus = VideoNeardup.videoNeardupPairsGif(spark, sf0001)
      .as[(Long, Long, Int)].collect().toSet
    val viaGvidCorpus = VideoNeardup.videoNeardupPairs(spark, sf0001)
      .as[(Long, Long, Int)].collect().toSet
    assert(viaGifCorpus === viaGvidCorpus)
    assert(viaGifCorpus.nonEmpty)
  }

  test("the corpus plants one variant per 20th doc within 2 bits of one " +
      "frame and the pair query finds exactly the planted set at sf0.001") {
    val corpus = VideoNeardup.videoCorpus(spark, sf0001).localCheckpoint()
    val n = corpus.count()
    val fps = VideoNeardup.fingerprints(corpus, spark)
    assert(fps.count() === n, "every video must decode+fingerprint")
    val pairs = VideoNeardup.videoNeardupPairs(spark, sf0001)
      .as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, d) =>
      assert(b === a + ImageNeardup.VariantOffset,
        s"only planted (base, base+10^7) pairs expected, got ($a,$b)")
      assert(d <= 2, "a one-cell one-frame edit flips at most 2 bits")
    }
    val expected = graft.operators.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 20 === 0).count()
    assert(pairs.length === expected)
  }

  test("apply marks every planted variant dropped and its base kept " +
      "with degree 1; unplanted videos are isolated") {
    val got = VideoNeardup.videoNeardupApply(spark, sf0001)
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
