package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

/** JPEG decoder pinned against the JDK's ImageIO reading the SAME
  * compressed bytes. JPEG decode is not bit-exact across implementations
  * (T.81 permits IDCT variation, and chroma-upsampling filters differ:
  * ours is nearest, ImageIO interpolates), so assertions are small
  * per-pixel tolerances, not byte equality. */
class JpegCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): BufferedImage = {
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, (((x * 255) / w) << 16) | (((y * 255) / h) << 8) |
        ((x + y) * 255 / (w + h)))
    bi
  }

  private def encodeJpeg(bi: BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    w.write(null, new IIOImage(bi, null, null), p)
    ios.close(); w.dispose()
    out.toByteArray
  }

  /** (mean abs diff, max abs diff) across all channels vs ImageIO's own
    * decode of the same bytes. */
  private def diffVsImageIO(jpeg: Array[Byte]): (Double, Int) = {
    val ours = JpegCodec.decode(jpeg).getOrElse(fail("decode returned None"))
    val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
    assert(ours.width === ref.getWidth && ours.height === ref.getHeight)
    var sum = 0L; var max = 0; var n = 0
    for (y <- 0 until ours.height; x <- 0 until ours.width) {
      val i = (y * ours.width + x) * 3
      val rgb = ref.getRGB(x, y)
      val ds = Seq(
        math.abs((ours.bgr(i + 2) & 0xff) - ((rgb >> 16) & 0xff)),
        math.abs((ours.bgr(i + 1) & 0xff) - ((rgb >> 8) & 0xff)),
        math.abs((ours.bgr(i) & 0xff) - (rgb & 0xff)))
      ds.foreach { d => sum += d; if (d > max) max = d; n += 1 }
    }
    (sum.toDouble / n, max)
  }

  test("gradient RGB (4:2:0 chroma) tracks ImageIO within tolerance") {
    val (mean, max) = diffVsImageIO(encodeJpeg(gradient(64, 48), 0.9f))
    assert(mean <= 3.0, s"mean diff $mean")
    assert(max <= 48, s"max diff $max")
  }

  test("solid color decodes near-exactly") {
    val bi = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) bi.setRGB(x, y, 0x4080c0)
    val (mean, max) = diffVsImageIO(encodeJpeg(bi, 0.9f))
    assert(mean <= 1.0, s"mean diff $mean")
    assert(max <= 4, s"max diff $max")
  }

  test("odd dimensions (partial MCUs) decode correctly") {
    val (mean, _) = diffVsImageIO(encodeJpeg(gradient(37, 21), 0.95f))
    assert(mean <= 3.0, s"mean diff $mean")
  }

  test("grayscale single-component JPEGs decode (raw raster compare)") {
    val bi = new BufferedImage(40, 24, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 40) {
      val v = (x * 255) / 40
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val jpeg = encodeJpeg(bi, 0.9f)
    val ours = JpegCodec.decode(jpeg).getOrElse(fail("decode returned None"))
    // compare RAW samples: ImageIO's gray BufferedImage is in a LINEAR
    // gray color space, so getRGB gamma-converts — getSample is the
    // actual decoded JPEG value both implementations produce
    val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
    var sum = 0L; var max = 0; var n = 0
    for (y <- 0 until 24; x <- 0 until 40) {
      val d = math.abs((ours.bgr((y * 40 + x) * 3) & 0xff) -
        ref.getRaster.getSample(x, y, 0))
      sum += d; if (d > max) max = d; n += 1
    }
    assert(sum.toDouble / n <= 2.0, s"mean diff ${sum.toDouble / n}")
    assert(max <= 16, s"max diff $max")
  }

  test("progressive JPEGs decode within tolerance of ImageIO") {
    val jpeg = encodeJpeg(gradient(64, 48), 0.9f, progressive = true)
    // make sure the writer actually emitted SOF2
    assert((0 until jpeg.length - 1).exists(i =>
      (jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) == 0xc2))
    val (mean, max) = diffVsImageIO(jpeg)
    assert(mean <= 3.0, s"mean diff $mean")
    assert(max <= 48, s"max diff $max")
  }

  test("progressive odd dimensions and solid color decode correctly") {
    val (mean, _) = diffVsImageIO(encodeJpeg(gradient(37, 21), 0.95f,
      progressive = true))
    assert(mean <= 3.0, s"mean diff $mean")
    val bi = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) bi.setRGB(x, y, 0x4080c0)
    val (ms, mx) = diffVsImageIO(encodeJpeg(bi, 0.9f, progressive = true))
    assert(ms <= 1.0 && mx <= 4, s"solid mean $ms max $mx")
  }

  test("progressive grayscale decodes (raw raster compare)") {
    val bi = new BufferedImage(40, 24, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 40) {
      val v = (x * 255) / 40
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val jpeg = encodeJpeg(bi, 0.9f, progressive = true)
    val ours = JpegCodec.decode(jpeg).getOrElse(fail("decode returned None"))
    val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
    var sum = 0L; var n = 0
    for (y <- 0 until 24; x <- 0 until 40) {
      sum += math.abs((ours.bgr((y * 40 + x) * 3) & 0xff) -
        ref.getRaster.getSample(x, y, 0)); n += 1
    }
    assert(sum.toDouble / n <= 2.0, s"mean diff ${sum.toDouble / n}")
  }

  test("garbage and truncation are rejected") {
    assert(JpegCodec.decode(null).isEmpty)
    assert(JpegCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    val good = encodeJpeg(gradient(32, 32), 0.9f)
    assert(JpegCodec.decode(good.take(good.length / 3)).isEmpty)
  }

  test("dispatch: decodeAny routes JPEG payloads to this codec") {
    val jpeg = encodeJpeg(gradient(16, 16), 0.9f)
    val got = Multimodal.decodeAny(jpeg)
    assert(got.isDefined && got.get.width === 16)
  }

  // --------------------------------------------------------- encoder arm

  /** BGR top-down raster from a BufferedImage (the codec's pixel layout). */
  private def toDecoded(bi: BufferedImage): BmpCodec.Decoded = {
    val out = new Array[Byte](bi.getWidth * bi.getHeight * 3)
    for (y <- 0 until bi.getHeight; x <- 0 until bi.getWidth) {
      val rgb = bi.getRGB(x, y)
      val i = (y * bi.getWidth + x) * 3
      out(i) = (rgb & 0xff).toByte
      out(i + 1) = ((rgb >> 8) & 0xff).toByte
      out(i + 2) = ((rgb >> 16) & 0xff).toByte
    }
    BmpCodec.Decoded(bi.getWidth, bi.getHeight, out)
  }

  /** (mean, max) abs channel diff between a source raster and a decode. */
  private def rasterDiff(a: BmpCodec.Decoded, b: BmpCodec.Decoded)
      : (Double, Int) = {
    assert(a.width === b.width && a.height === b.height)
    var sum = 0L; var max = 0
    for (i <- a.bgr.indices) {
      val d = math.abs((a.bgr(i) & 0xff) - (b.bgr(i) & 0xff))
      sum += d; if (d > max) max = d
    }
    (sum.toDouble / a.bgr.length, max)
  }

  test("encode: our decoder round-trips our encoder within quant loss") {
    val src = toDecoded(gradient(64, 48))
    val jpeg = JpegCodec.encode(src, quality = 90)
    val back = JpegCodec.decode(jpeg).getOrElse(fail("self-decode failed"))
    val (mean, max) = rasterDiff(src, back)
    assert(mean <= 3.0, s"mean diff $mean")
    assert(max <= 48, s"max diff $max")
  }

  test("encode: ImageIO reads our bytes back within quant loss") {
    val src = toDecoded(gradient(64, 48))
    val jpeg = JpegCodec.encode(src, quality = 90)
    val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
    assert(ref != null, "ImageIO rejected our JPEG")
    val (mean, max) = rasterDiff(src, toDecoded(ref))
    assert(mean <= 3.0, s"mean diff $mean")
    assert(max <= 48, s"max diff $max")
  }

  test("encode: odd dimensions (edge-replicated partial MCUs)") {
    val src = toDecoded(gradient(37, 21))
    val jpeg = JpegCodec.encode(src, quality = 95)
    val back = JpegCodec.decode(jpeg).getOrElse(fail("self-decode failed"))
    assert(back.width === 37 && back.height === 21)
    val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
    assert(ref.getWidth === 37 && ref.getHeight === 21)
    assert(rasterDiff(src, back)._1 <= 3.0)
  }

  test("encode: solid color compresses near-losslessly and tiny") {
    val bi = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) bi.setRGB(x, y, 0x4080c0)
    val src = toDecoded(bi)
    val jpeg = JpegCodec.encode(src, quality = 90)
    assert(jpeg.length < 1200, s"solid 32x32 should be header-dominated, " +
      s"got ${jpeg.length} bytes")
    val (mean, max) = rasterDiff(src, JpegCodec.decode(jpeg).get)
    assert(mean <= 1.0 && max <= 4, s"mean $mean max $max")
  }

  test("encode: quality knob trades size for error monotonically") {
    val src = toDecoded(gradient(64, 64))
    val lo = JpegCodec.encode(src, quality = 30)
    val hi = JpegCodec.encode(src, quality = 95)
    assert(lo.length < hi.length)
    val eLo = rasterDiff(src, JpegCodec.decode(lo).get)._1
    val eHi = rasterDiff(src, JpegCodec.decode(hi).get)._1
    assert(eHi < eLo, s"q95 err $eHi should beat q30 err $eLo")
  }

  test("resizeImages keeps JPEG assets as JPEG (lossy round trip)") {
    import SparkHolder.spark.implicits._
    val jpeg = JpegCodec.encode(toDecoded(gradient(16, 16)), 90)
    val assets = Seq(
      Multimodal.Asset(7L, jpeg, "image/jpeg", jpeg.length.toLong)).toDS()
    val out = Multimodal.resizeImages(assets.toDF(), SparkHolder.spark, 8, 8)
      .collect()
    assert(out.length === 1 && out(0).mime === "image/jpeg")
    assert(JpegCodec.isJpeg(out(0).media))
    val thumb = JpegCodec.decode(out(0).media).get
    assert(thumb.width === 8 && thumb.height === 8)
  }
}

/** Session for the one Spark-touching test in this file. */
private object SparkHolder {
  lazy val spark = graft.SparkTestBase.session
}
