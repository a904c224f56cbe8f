package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** PNG codec pinned against the JDK's own ImageIO PNG implementation —
  * an independent, spec-complete reference that ships in every JVM: our
  * decoder must reproduce ImageIO's pixels (ImageIO encodes with
  * non-trivial scanline filters, exercising the sub/up/average/paeth
  * paths), and ImageIO must read back what our encoder writes. */
class PngCodecSpec extends AnyFunSuite {

  /** Deterministic test pattern with gradients + hard edges (gradients
    * make average/paeth filters profitable, so ImageIO uses them). */
  private def pattern(w: Int, h: Int): BmpCodec.Decoded = {
    val bgr = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      bgr(i) = ((x * 255) / w).toByte // B gradient
      bgr(i + 1) = ((y * 255) / h).toByte // G gradient
      bgr(i + 2) = (if ((x / 4 + y / 4) % 2 == 0) 230 else 20).toByte // R checker
    }
    BmpCodec.Decoded(w, h, bgr)
  }

  private def toBuffered(img: BmpCodec.Decoded): BufferedImage = {
    val bi = new BufferedImage(img.width, img.height, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val i = (y * img.width + x) * 3
      val rgb = ((img.bgr(i + 2) & 0xff) << 16) |
        ((img.bgr(i + 1) & 0xff) << 8) | (img.bgr(i) & 0xff)
      bi.setRGB(x, y, rgb)
    }
    bi
  }

  private def pixelsEqual(a: BmpCodec.Decoded, bi: BufferedImage): Boolean =
    a.width == bi.getWidth && a.height == bi.getHeight &&
      (0 until a.height).forall(y => (0 until a.width).forall { x =>
        val i = (y * a.width + x) * 3
        val rgb = bi.getRGB(x, y) & 0xffffff
        rgb == (((a.bgr(i + 2) & 0xff) << 16) |
          ((a.bgr(i + 1) & 0xff) << 8) | (a.bgr(i) & 0xff))
      })

  test("decodes ImageIO-encoded RGB PNGs pixel-exact (filters exercised)") {
    val img = pattern(37, 23) // odd sizes: no stride alignment luck
    val out = new ByteArrayOutputStream()
    ImageIO.write(toBuffered(img), "png", out)
    val decoded = PngCodec.decode(out.toByteArray)
    assert(decoded.isDefined)
    assert(decoded.get.bgr.sameElements(img.bgr))
  }

  test("decodes RGBA (color type 6) PNGs, dropping alpha") {
    val img = pattern(16, 16)
    val argb = new BufferedImage(16, 16, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 16; x <- 0 until 16)
      argb.setRGB(x, y, (0x80 << 24) | (toBuffered(img).getRGB(x, y) & 0xffffff))
    val out = new ByteArrayOutputStream()
    ImageIO.write(argb, "png", out)
    val decoded = PngCodec.decode(out.toByteArray)
    assert(decoded.isDefined)
    assert(decoded.get.bgr.sameElements(img.bgr))
  }

  test("ImageIO reads back our encoder's output pixel-exact") {
    val img = pattern(41, 17)
    val png = PngCodec.encode(img)
    assert(PngCodec.isPng(png))
    val bi = ImageIO.read(new ByteArrayInputStream(png))
    assert(bi != null, "ImageIO rejected our PNG")
    assert(pixelsEqual(img, bi))
  }

  test("round trip through our own encode/decode is exact") {
    val img = pattern(64, 48)
    val back = PngCodec.decode(PngCodec.encode(img))
    assert(back.isDefined)
    assert(back.get.width === 64 && back.get.height === 48)
    assert(back.get.bgr.sameElements(img.bgr))
  }

  test("rejects garbage, truncation, and illegal profiles") {
    assert(PngCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(PngCodec.decode(null).isEmpty)
    val good = PngCodec.encode(pattern(20, 20))
    assert(PngCodec.decode(good.take(good.length / 2)).isEmpty)
    // illegal color type (5 is not defined by RFC 2083 §6.1): the IHDR
    // color-type byte sits at 8(sig) + 8(len+type) + 9
    val bad = good.clone()
    bad(25) = 5
    assert(PngCodec.decode(bad).isEmpty)
  }
}

/** 16-bit and gray+alpha profiles, pinned against ImageIO's RAW raster
  * samples (not getRGB, which would route gray through the non-linear
  * CS_GRAY→sRGB colorspace conversion): our 16→8 downscale rule is
  * round(v·255/65535). */
class Png16BitSpec extends AnyFunSuite {
  import java.awt.Transparency
  import java.awt.color.ColorSpace
  import java.awt.image.{ComponentColorModel, DataBuffer}

  private def scale16(v: Int): Int = (v * 255 + 32767) / 65535

  private def writePng(bi: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(bi, "png", out)
    out.toByteArray
  }

  private def ihdrDepth(b: Array[Byte]): Int = b(24) & 0xff
  private def ihdrColorType(b: Array[Byte]): Int = b(25) & 0xff

  test("decodes 16-bit grayscale (type 0 depth 16) vs raw raster samples") {
    val (w, h) = (23, 11)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 65535 / (w - 1)) ^ (y * 2731))
    val png = writePng(bi)
    assert(ihdrDepth(png) === 16 && ihdrColorType(png) === 0)
    val got = PngCodec.decode(png)
    assert(got.isDefined)
    val ref = ImageIO.read(new ByteArrayInputStream(png))
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val expected = scale16(ref.getRaster.getSample(x, y, 0))
      for (c <- 0 until 3)
        assert((got.get.bgr(i + c) & 0xff) === expected, s"($x,$y) ch$c")
    }
  }

  test("decodes 16-bit truecolor (type 2 depth 16) vs raw raster samples") {
    val (w, h) = (19, 13)
    val cm = new ComponentColorModel(
      ColorSpace.getInstance(ColorSpace.CS_sRGB), false, false,
      Transparency.OPAQUE, DataBuffer.TYPE_USHORT)
    val raster = cm.createCompatibleWritableRaster(w, h)
    val bi = new BufferedImage(cm, raster, false, null)
    for (y <- 0 until h; x <- 0 until w) {
      raster.setSample(x, y, 0, x * 65535 / (w - 1))
      raster.setSample(x, y, 1, y * 65535 / (h - 1))
      raster.setSample(x, y, 2, ((x + y) * 4099) & 0xffff)
    }
    val png = writePng(bi)
    assert(ihdrDepth(png) === 16 && ihdrColorType(png) === 2)
    val got = PngCodec.decode(png)
    assert(got.isDefined)
    val ref = ImageIO.read(new ByteArrayInputStream(png)).getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      assert((got.get.bgr(i + 2) & 0xff) === scale16(ref.getSample(x, y, 0)), s"R($x,$y)")
      assert((got.get.bgr(i + 1) & 0xff) === scale16(ref.getSample(x, y, 1)), s"G($x,$y)")
      assert((got.get.bgr(i) & 0xff) === scale16(ref.getSample(x, y, 2)), s"B($x,$y)")
    }
  }

  test("decodes gray+alpha (type 4), dropping alpha") {
    val (w, h) = (17, 9)
    val cm = new ComponentColorModel(
      ColorSpace.getInstance(ColorSpace.CS_GRAY), true, false,
      Transparency.TRANSLUCENT, DataBuffer.TYPE_BYTE)
    val raster = cm.createCompatibleWritableRaster(w, h)
    val bi = new BufferedImage(cm, raster, false, null)
    for (y <- 0 until h; x <- 0 until w) {
      raster.setSample(x, y, 0, (x * 255 / (w - 1)) ^ (y * 37 & 0xff))
      raster.setSample(x, y, 1, 128 + (x + y) % 100) // alpha: dropped
    }
    val png = writePng(bi)
    assert(ihdrColorType(png) === 4, s"writer emitted type ${ihdrColorType(png)}")
    val got = PngCodec.decode(png)
    assert(got.isDefined)
    val ref = ImageIO.read(new ByteArrayInputStream(png)).getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val expected =
        if (ihdrDepth(png) == 16) scale16(ref.getSample(x, y, 0))
        else ref.getSample(x, y, 0)
      for (c <- 0 until 3)
        assert((got.get.bgr(i + c) & 0xff) === expected, s"($x,$y) ch$c")
    }
  }

  test("decodes 16-bit RGBA (type 6 depth 16), dropping alpha") {
    val (w, h) = (11, 7)
    val cm = new ComponentColorModel(
      ColorSpace.getInstance(ColorSpace.CS_sRGB), true, false,
      Transparency.TRANSLUCENT, DataBuffer.TYPE_USHORT)
    val raster = cm.createCompatibleWritableRaster(w, h)
    val bi = new BufferedImage(cm, raster, false, null)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 4)
      raster.setSample(x, y, c, ((x * 7 + y * 13 + c * 29) * 2053) & 0xffff)
    val png = writePng(bi)
    assert(ihdrDepth(png) === 16 && ihdrColorType(png) === 6)
    val got = PngCodec.decode(png)
    assert(got.isDefined)
    val ref = ImageIO.read(new ByteArrayInputStream(png)).getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      assert((got.get.bgr(i + 2) & 0xff) === scale16(ref.getSample(x, y, 0)), s"R($x,$y)")
      assert((got.get.bgr(i + 1) & 0xff) === scale16(ref.getSample(x, y, 1)), s"G($x,$y)")
      assert((got.get.bgr(i) & 0xff) === scale16(ref.getSample(x, y, 2)), s"B($x,$y)")
    }
  }

  test("encode16: our decoder round-trips it and ImageIO sees v*257 samples") {
    val (w, h) = (19, 13)
    val img = BmpCodec.Decoded(w, h,
      Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte))
    val png = PngCodec.encode16(img)
    assert(ihdrDepth(png) === 16 && ihdrColorType(png) === 2)
    // own decoder: downscale round(v·257·255/65535) = v, exact identity
    val back = PngCodec.decode(png)
    assert(back.isDefined)
    assert(back.get.bgr.toSeq === img.bgr.toSeq)
    // independent reader: raw 16-bit raster samples must be exactly v·257
    val ref = ImageIO.read(new ByteArrayInputStream(png)).getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      assert(ref.getSample(x, y, 0) === (img.bgr(i + 2) & 0xff) * 257, s"R($x,$y)")
      assert(ref.getSample(x, y, 1) === (img.bgr(i + 1) & 0xff) * 257, s"G($x,$y)")
      assert(ref.getSample(x, y, 2) === (img.bgr(i) & 0xff) * 257, s"B($x,$y)")
    }
  }
}

/** Dispatch integration: mixed BMP + PNG asset batches decode through one
  * path, resize re-encodes in the source format. */
class PngDispatchSpec extends SparkTestBase {
  import spark.implicits._

  private def mixedAssets = {
    val img = BmpCodec.Decoded(12, 8, Array.tabulate(12 * 8 * 3)(i => (i * 7).toByte))
    Seq(
      Multimodal.Asset(1L, BmpCodec.encode(img), "image/bmp",
        BmpCodec.encode(img).length.toLong),
      Multimodal.Asset(2L, PngCodec.encode(img), "image/png",
        PngCodec.encode(img).length.toLong),
      Multimodal.Asset(3L, Array[Byte](9, 9, 9), "application/octet-stream", 3L)
    ).toDF()
  }

  test("decodeImages handles BMP and PNG arms, skips opaque payloads") {
    val got = Multimodal.decodeImages(mixedAssets, spark).collect()
      .map(i => i.asset_id -> i).toMap
    assert(got.keySet === Set(1L, 2L))
    // same source pixels ⇒ identical features from both codecs
    assert(got(1L).mean_r === got(2L).mean_r)
    assert(got(1L).thumb.sameElements(got(2L).thumb))
  }

  test("resizeImages re-encodes in the source format") {
    val out = Multimodal.resizeImages(mixedAssets, spark, 6, 4).collect()
      .map(a => a.asset_id -> a).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L).mime === "image/bmp" && BmpCodec.isBmp(out(1L).media))
    assert(out(2L).mime === "image/png" && PngCodec.isPng(out(2L).media))
    val p = PngCodec.decode(out(2L).media).get
    assert(p.width === 6 && p.height === 4)
    assert(p.bgr.sameElements(BmpCodec.decode(out(1L).media).get.bgr))
  }
}

/** Adam7-interlace decode pinned against ImageIO's progressive writer. */
class PngAdam7Spec extends AnyFunSuite {

  private def pattern(w: Int, h: Int): BmpCodec.Decoded = {
    val bgr = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      bgr(i) = ((x * 255) / w).toByte
      bgr(i + 1) = ((y * 255) / h).toByte
      bgr(i + 2) = (if ((x / 4 + y / 4) % 2 == 0) 230 else 20).toByte
    }
    BmpCodec.Decoded(w, h, bgr)
  }

  private def toBuffered(img: BmpCodec.Decoded): BufferedImage = {
    val bi = new BufferedImage(img.width, img.height, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val i = (y * img.width + x) * 3
      val rgb = ((img.bgr(i + 2) & 0xff) << 16) |
        ((img.bgr(i + 1) & 0xff) << 8) | (img.bgr(i) & 0xff)
      bi.setRGB(x, y, rgb)
    }
    bi
  }

  /** ImageIO's PNG writer in progressive mode emits Adam7 interlacing. */
  private def encodeInterlaced(bi: BufferedImage): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageWriteParam}
    val w = ImageIO.getImageWritersByFormatName("png").next()
    val p = w.getDefaultWriteParam
    p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    w.write(null, new IIOImage(bi, null, null), p)
    ios.close(); w.dispose()
    val bytes = out.toByteArray
    // be sure we actually produced an interlaced file (IHDR byte 12)
    assert((bytes(8 + 8 + 12) & 0xff) === 1, "writer did not interlace")
    bytes
  }

  test("decodes Adam7-interlaced RGB PNGs pixel-exact") {
    val img = pattern(37, 23)
    val decoded = PngCodec.decode(encodeInterlaced(toBuffered(img)))
    assert(decoded.isDefined)
    assert(decoded.get.bgr.sameElements(img.bgr))
  }

  test("Adam7: dimensions below one 8x8 tile exercise skipped passes") {
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1), (3, 5), (8, 8), (7, 2))) {
      val img = pattern(w, h)
      val got = PngCodec.decode(encodeInterlaced(toBuffered(img)))
      assert(got.isDefined, s"${w}x$h not decoded")
      assert(got.get.bgr.sameElements(img.bgr), s"${w}x$h mismatch")
    }
  }

  test("decodes paletted PNGs (8-bit indexed) pixel-exact") {
    val img = pattern(37, 23)
    val bi = new BufferedImage(37, 23, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 23; x <- 0 until 37) {
      val i = (y * 37 + x) * 3
      bi.setRGB(x, y, ((img.bgr(i + 2) & 0xff) << 16) |
        ((img.bgr(i + 1) & 0xff) << 8) | (img.bgr(i) & 0xff))
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(bi, "png", out)
    val got = PngCodec.decode(out.toByteArray)
    assert(got.isDefined)
    // compare against ImageIO's own read of the same file (the indexed
    // write quantizes colors, so the source pattern is not the reference)
    val ref = ImageIO.read(new ByteArrayInputStream(out.toByteArray))
    for (y <- 0 until 23; x <- 0 until 37) {
      val i = (y * 37 + x) * 3
      val rgb = ref.getRGB(x, y) & 0xffffff
      val ours = ((got.get.bgr(i + 2) & 0xff) << 16) |
        ((got.get.bgr(i + 1) & 0xff) << 8) | (got.get.bgr(i) & 0xff)
      assert(ours === rgb, s"($x,$y)")
    }
  }

  test("decodes sub-8-bit paletted PNGs (1-bit binary, 4-bit indexed)") {
    // 1-bit: black/white checkerboard via TYPE_BYTE_BINARY
    val bw = new BufferedImage(19, 11, BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 11; x <- 0 until 19)
      bw.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    val out1 = new ByteArrayOutputStream()
    ImageIO.write(bw, "png", out1)
    val got1 = PngCodec.decode(out1.toByteArray)
    assert(got1.isDefined)
    val ref1 = ImageIO.read(new ByteArrayInputStream(out1.toByteArray))
    for (y <- 0 until 11; x <- 0 until 19) {
      val i = (y * 19 + x) * 3
      assert((ref1.getRGB(x, y) & 0xffffff) ===
        (((got1.get.bgr(i + 2) & 0xff) << 16) |
          ((got1.get.bgr(i + 1) & 0xff) << 8) | (got1.get.bgr(i) & 0xff)),
        s"1-bit ($x,$y)")
    }
    // 4-bit: 16-color IndexColorModel
    val cmap = (0 until 16).map(i => (i * 17) << 16 | (255 - i * 17) << 8 |
      (i * 8)).toArray
    val icm = new java.awt.image.IndexColorModel(4, 16,
      cmap.map(c => ((c >> 16) & 0xff).toByte),
      cmap.map(c => ((c >> 8) & 0xff).toByte),
      cmap.map(c => (c & 0xff).toByte))
    val bi4 = new BufferedImage(13, 7, BufferedImage.TYPE_BYTE_BINARY, icm)
    for (y <- 0 until 7; x <- 0 until 13) bi4.setRGB(x, y, cmap((x + y) % 16))
    val out4 = new ByteArrayOutputStream()
    ImageIO.write(bi4, "png", out4)
    val got4 = PngCodec.decode(out4.toByteArray)
    assert(got4.isDefined)
    val ref4 = ImageIO.read(new ByteArrayInputStream(out4.toByteArray))
    for (y <- 0 until 7; x <- 0 until 13) {
      val i = (y * 13 + x) * 3
      assert((ref4.getRGB(x, y) & 0xffffff) ===
        (((got4.get.bgr(i + 2) & 0xff) << 16) |
          ((got4.get.bgr(i + 1) & 0xff) << 8) | (got4.get.bgr(i) & 0xff)),
        s"4-bit ($x,$y)")
    }
  }

  test("decodes Adam7 RGBA PNGs, dropping alpha") {
    val img = pattern(21, 13)
    val bi = new BufferedImage(21, 13, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 13; x <- 0 until 21) {
      val i = (y * 21 + x) * 3
      val rgb = ((img.bgr(i + 2) & 0xff) << 16) |
        ((img.bgr(i + 1) & 0xff) << 8) | (img.bgr(i) & 0xff)
      bi.setRGB(x, y, 0xcc000000 | rgb)
    }
    val decoded = PngCodec.decode(encodeInterlaced(bi))
    assert(decoded.isDefined)
    assert(decoded.get.bgr.sameElements(img.bgr))
  }
}
