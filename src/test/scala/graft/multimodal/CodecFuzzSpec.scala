package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** Codec fuzz hardening (round 7): malformed media bytes — truncations,
  * bit flips, magic-prefixed garbage, and tiny buffers — must come back
  * as None through every decode arm, NEVER as an executor-killing throw.
  * A corrupt asset at 100 TB is a certainty, and a codec that throws on
  * one fails the whole task (and after 4 retries, the job); Multimodal's
  * contract is "unsupported/undecodable → None, keep scanning".
  *
  * Seeds are valid outputs of our own encoders (so the fuzz explores
  * deep decode paths, not just the magic check); mutations may still
  * decode successfully (a bit flip in pixel payload is valid data) —
  * the property is NO-THROW, not must-reject. */
object CodecFuzzSpec extends Properties("CodecFuzz") {
  import Prop.{forAllNoShrink => forAll}

  private def pattern(w: Int, h: Int): BmpCodec.Decoded = {
    val px = Array.tabulate(w * h * 3) { i =>
      ((i * 2654435761L >>> 7) & 0xff).toByte
    }
    BmpCodec.Decoded(w, h, px)
  }

  private val seeds: Seq[(String, Array[Byte])] = {
    val img = pattern(12, 9)
    val wav = WavCodec.Wav(sampleRate = 8000, channels = 2,
      samples = Array.tabulate(64)(i => (i * 997 % 65536 - 32768).toShort))
    // video containers fuzz through the PRODUCTION video dispatch
    // (round 13): VideoNeardup.fingerprintOf covers the strict
    // multi-frame GIF composition (incl. the allocation budget), the
    // GVID walk, and the MJPEG segment-walk splitter — a corrupt video
    // asset must drop exactly like a corrupt image
    val frames = (0 until 4).map(_ => pattern(9, 8))
    Seq(
      "bmp" -> BmpCodec.encode(img),
      "png" -> PngCodec.encode(img),
      "gif" -> GifCodec.encode(img),
      "jpeg" -> JpegCodec.encode(img),
      "wav" -> WavCodec.encode(wav),
      "gvid" -> VideoNeardup.encodeVideo(frames.map(BmpCodec.encode)),
      "agif" -> GifCodec.encodeFrames(frames),
      "mjpeg" -> VideoNeardup.encodeMjpeg(
        frames.map(JpegCodec.encode(_, 100))))
  }

  private val videoLabels = Set("gvid", "agif", "mjpeg")

  /** Decode through the PRODUCTION dispatch, mapping any throw to a
    * property failure with the codec named. */
  private def noThrow(label: String, b: Array[Byte]): Prop =
    try {
      if (label == "wav") WavCodec.decode(b)
      else if (videoLabels(label)) VideoNeardup.fingerprintOf(b)
      else Multimodal.decodeAny(b)
      Prop.passed
    } catch {
      case e: Throwable =>
        Prop.falsified.label(
          s"$label threw ${e.getClass.getSimpleName}: ${e.getMessage} " +
            s"on ${b.length} bytes")
    }

  private val seedGen: Gen[(String, Array[Byte])] = Gen.oneOf(seeds)

  property("truncation at every prefix length never throws") =
    forAll(seedGen, Gen.chooseNum(0.0, 1.0)) { case ((label, good), f) =>
      val cut = (good.length * f).toInt min (good.length - 1) max 0
      noThrow(label, good.take(cut))
    }

  property("single bit flips never throw") =
    forAll(seedGen, Gen.chooseNum(0, Int.MaxValue), Gen.chooseNum(0, 7)) {
      case ((label, good), posSeed, bit) =>
        val b = good.clone()
        val pos = posSeed % b.length
        b(pos) = (b(pos) ^ (1 << bit)).toByte
        noThrow(label, b)
    }

  property("multi-byte corruption runs never throw") =
    forAll(seedGen, Gen.chooseNum(0, Int.MaxValue), Gen.chooseNum(1, 64),
      Gen.long) { case ((label, good), posSeed, runLen, seed) =>
      val b = good.clone()
      val start = posSeed % b.length
      var x = seed
      (start until math.min(b.length, start + runLen)).foreach { i =>
        x = x * 6364136223846793005L + 1442695040888963407L
        b(i) = (x >>> 56).toByte
      }
      noThrow(label, b)
    }

  property("valid magic + garbage tail never throws") =
    forAll(seedGen, Gen.chooseNum(1, 256), Gen.long) {
      case ((label, good), tailLen, seed) =>
        // keep just enough header to pass the magic dispatch
        val keep = math.min(good.length, 16)
        var x = seed
        val tail = Array.fill(tailLen) {
          x = x * 6364136223846793005L + 1442695040888963407L
          (x >>> 56).toByte
        }
        noThrow(label, good.take(keep) ++ tail)
    }

  property("empty and sub-magic buffers never throw") =
    forAll(Gen.chooseNum(0, 8), Gen.long) { (n, seed) =>
      var x = seed
      val b = Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 56).toByte
      }
      Prop.all(noThrow("dispatch", b), noThrow("wav", b))
    }
}
