package graft.multimodal

import graft.SparkTestBase

/** Pins for the image near-dup family: banded-join exactness vs brute
  * force (the pigeonhole guarantee), planted-variant geometry, codec-arm
  * invariance of the hash, apply semantics, and never-throw decoding. */
class ImageNeardupSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteforce(hs: Seq[(Long, Long)], t: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= t
    } yield (ia, ib, d)).toSet

  test("banded pair join equals brute force, including adversarial bit " +
      "patterns at every band boundary") {
    // hashes engineered to differ in exactly 0..5 bits, with flips
    // placed inside one band, across two bands, and at band edges
    // (bits 15/16, 31/32, 47/48, 63)
    val base = 0x5a5a5a5a5a5a5a5aL
    val hs: Seq[(Long, Long)] = Seq(
      1L -> base,
      2L -> base, // exact dup
      3L -> (base ^ 1L), // 1 bit, band 0
      4L -> (base ^ (1L << 15) ^ (1L << 16)), // 2 bits straddling bands 0/1
      5L -> (base ^ (1L << 31) ^ (1L << 32) ^ (1L << 63)), // 3 bits, 3 bands
      6L -> (base ^ 0xfL), // 4 bits, one band — over threshold
      7L -> (base ^ (1L << 47) ^ (1L << 48) ^ (1L << 62) ^ (1L << 63)), // 4 bits
      8L -> ~base // 64 bits
    )
    for (t <- Seq(0, 1, 3)) {
      val got = ImageNeardup
        .neardupPairs(hs.toDF("asset_id", "dhash"), t)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === bruteforce(hs, t), s"maxHamming=$t")
    }
  }

  test("banded pair join equals brute force on a pseudo-random corpus") {
    // deterministic splitmix64 stream — no Math.random in tests either
    var x = 0x9e3779b97f4a7c15L
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val base = Seq.tabulate(120)(i => (i.toLong, next()))
    // plant near variants so the ≤3 regime is actually exercised
    val planted = base.take(20).map { case (id, h) =>
      (id + 1000L, h ^ (1L << ((id * 13 % 64).toInt)))
    }
    val hs = base ++ planted
    val got = ImageNeardup.neardupPairs(hs.toDF("asset_id", "dhash"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got === bruteforce(hs, 3))
    assert(got.size >= 20, "the planted variants must all be found")
  }

  test("the corpus plants one variant per 20th doc, within 2 dHash bits, " +
      "and the pair query finds exactly the planted set at sf0.001") {
    val corpus = ImageNeardup.imageCorpus(spark, sf0001).localCheckpoint()
    val n = corpus.count()
    val hashed = ImageNeardup.dHashes(corpus, spark)
    assert(hashed.count() === n, "every rendered asset must decode+hash")
    val pairs = ImageNeardup.neardupPairs(hashed)
      .as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, d) =>
      assert(b === a + ImageNeardup.VariantOffset,
        s"only planted (base, base+10^7) pairs expected, got ($a,$b)")
      assert(d <= 2, "a one-cell luma edit flips at most 2 comparison bits")
    }
    // exactly the planted population: every 20th doc_id
    val expected = graft.operators.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 20 === 0).count()
    assert(pairs.length === expected)
  }

  test("all three corpus generators fail loudly on doc_id >= the " +
      "planted-variant offset instead of silently colliding keys") {
    // round-12 verdict item 3: the ScaleProbe callers were guarded in
    // round 11 but the generators weren't — a documents table with
    // doc_id >= 10^7 (plausible at sf >~ 100) would alias variant keys
    // onto base keys and corrupt the planted-pair contract
    val bad = Seq(1L, 20L, ImageNeardup.VariantOffset).toDF("doc_id")
    // round 13: the guard is per-row inside the render mapPartitions
    // (zero extra Spark jobs — the old eager agg(max) re-evaluated the
    // input plan inside every probe's timed window), so the loud
    // failure now surfaces as a task failure wrapping the requirement
    // message somewhere in the cause chain
    def mustThrow(what: String)(f: => Any): Unit = {
      val e = intercept[Throwable](f)
      val msgs = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).take(8)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("VariantOffset"), s"$what: $e")
    }
    mustThrow("image") {
      ImageNeardup.imageCorpusDf(bad, spark,
        ImageNeardup.GridW, ImageNeardup.GridH).count()
    }
    mustThrow("audio") {
      AudioNeardup.audioCorpusDf(bad, spark,
        AudioNeardup.Frames, AudioNeardup.Bands).count()
    }
    mustThrow("video") { VideoNeardup.videoCorpusDf(bad, spark).count() }
    // ids strictly below the offset (and the empty frame) stay fine
    val ok = Seq(0L, ImageNeardup.VariantOffset - 1).toDF("doc_id")
    assert(ImageNeardup.imageCorpusDf(ok, spark,
      ImageNeardup.GridW, ImageNeardup.GridH).count() === 3)
    assert(VideoNeardup.videoCorpusDf(
      spark.range(0).selectExpr("id as doc_id"), spark).count() === 0)
  }

  test("dHash is invariant across codec arms (same pixels through " +
      "BMP, PNG and GIF decode to the same hash)") {
    val p = ImageNeardup.lumaGrid(4242L, -1)
    val bgr = new Array[Byte](p.length * 3)
    p.indices.foreach { i =>
      val v = p(i).toByte; bgr(i * 3) = v; bgr(i * 3 + 1) = v; bgr(i * 3 + 2) = v
    }
    val img = BmpCodec.Decoded(ImageNeardup.GridW, ImageNeardup.GridH, bgr)
    val viaBmp = ImageNeardup.dhashOf(BmpCodec.encode(img))
    val viaPng = ImageNeardup.dhashOf(PngCodec.encode(img))
    val viaGif = ImageNeardup.dhashOf(GifCodec.encode(img))
    assert(viaBmp.isDefined && viaBmp === viaPng && viaBmp === viaGif)
  }

  test("dhashOf never throws on junk and returns None") {
    assert(ImageNeardup.dhashOf(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageNeardup.dhashOf(Array.empty[Byte]).isEmpty)
    assert(ImageNeardup.dhashOf("BM".getBytes ++ Array.fill[Byte](60)(0)).isEmpty)
  }

  private def bruteforceWide(hs: Seq[(Long, Array[Long])], t: Int)
      : Set[(Long, Long, Int)] =
    (for {
      (ia, wa) <- hs; (ib, wb) <- hs if ia < ib
      d = wa.zip(wb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum if d <= t
    } yield (ia, ib, d)).toSet

  test("wide (256-bit) banded pair join equals brute force, with flips " +
      "at every 32-bit band boundary and across words") {
    val base = Array.fill(4)(0x5a5a5a5a5a5a5a5aL)
    def flip(bits: Int*): Array[Long] = {
      val w = base.clone()
      bits.foreach(i => w(i >> 6) ^= 1L << (i & 63))
      w
    }
    val hs: Seq[(Long, Array[Long])] = Seq(
      1L -> base, 2L -> base.clone(),
      3L -> flip(0), // 1 bit, band 0
      4L -> flip(31, 32), // straddles bands 0/1 inside word 0
      5L -> flip(63, 64), // straddles words 0/1
      6L -> flip(0, 33, 66, 99, 132, 165, 198), // 7 bits, 7 bands — in
      7L -> flip(0, 33, 66, 99, 132, 165, 198, 231), // 8 bits — out at 7
      8L -> flip(255), // top bit of word 3
      9L -> flip(0 until 16: _*) // 16 bits in one band — out
    )
    for (t <- Seq(0, 1, 7)) {
      val got = ImageNeardup
        .neardupPairsWide(hs.toDF("asset_id", "dwords"), t)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === bruteforceWide(hs, t), s"maxHamming=$t")
    }
  }

  test("the wide corpus plants one variant per 20th doc, within 2 bits " +
      "of the 256-bit hash, and q287 finds exactly the planted set") {
    val corpus = ImageNeardup.imageCorpusWide(spark, sf0001)
      .localCheckpoint()
    val n = corpus.count()
    val hashed = ImageNeardup.dHashesWide(corpus, spark)
    assert(hashed.count() === n, "every rendered asset must decode+hash")
    val pairs = ImageNeardup.imageNeardupWide(spark, sf0001)
      .as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, d) =>
      assert(b === a + ImageNeardup.VariantOffset,
        s"only planted (base, base+10^7) pairs expected, got ($a,$b)")
      assert(d <= 2, "a one-cell luma edit flips at most 2 comparison bits")
    }
    val expected = graft.operators.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 20 === 0).count()
    assert(pairs.length === expected)
  }

  test("the 256-bit hash is invariant across codec arms") {
    val p = ImageNeardup.lumaGridN(4242L, -1,
      ImageNeardup.WideW * ImageNeardup.WideH)
    val bgr = new Array[Byte](p.length * 3)
    p.indices.foreach { i =>
      val v = p(i).toByte; bgr(i * 3) = v; bgr(i * 3 + 1) = v; bgr(i * 3 + 2) = v
    }
    val img = BmpCodec.Decoded(ImageNeardup.WideW, ImageNeardup.WideH, bgr)
    val viaBmp = ImageNeardup.dhash256Of(BmpCodec.encode(img))
    val viaPng = ImageNeardup.dhash256Of(PngCodec.encode(img))
    val viaGif = ImageNeardup.dhash256Of(GifCodec.encode(img))
    assert(viaBmp.isDefined)
    assert(viaBmp.get.toSeq === viaPng.get.toSeq)
    assert(viaBmp.get.toSeq === viaGif.get.toSeq)
    assert(ImageNeardup.dhash256Of(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("apply keeps exactly the min-id member of each pair group and " +
      "counts degrees symmetrically") {
    val hs = Seq( // 1-2-3 form a hamming-0/1 chain; 9 is isolated
      1L -> 100L, 2L -> 100L, 3L -> 101L, 9L -> 0x0fff0fff0fff0fffL)
    val got = ImageNeardup.neardupApply(hs.toDF("asset_id", "dhash"))
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((2L, true)), "min id of the group survives")
    assert(got(2L) === ((2L, false)))
    assert(got(3L) === ((2L, false)))
    assert(got(9L) === ((0L, true)), "isolated asset keeps with degree 0")
  }
}
