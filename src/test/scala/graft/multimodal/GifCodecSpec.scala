package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import java.awt.image.{BufferedImage, IndexColorModel}

import org.scalatest.funsuite.AnyFunSuite

/** GIF arm pinned against the JDK's independent ImageIO GIF
  * implementation in BOTH directions, plus an interlaced file from
  * ImageIO's progressive writer. */
class GifCodecSpec extends AnyFunSuite {

  private def indexedImage(w: Int, h: Int): BufferedImage = {
    // 16-color palette; deterministic pattern touching every entry
    val r = new Array[Byte](16); val g = new Array[Byte](16)
    val b = new Array[Byte](16)
    for (i <- 0 until 16) {
      r(i) = (i * 17).toByte; g(i) = (255 - i * 16).toByte
      b(i) = (i * i).toByte
    }
    val cm = new IndexColorModel(4, 16, r, g, b)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY, cm)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 3 + y * 7 + (x * y) % 5) % 16)
    bi
  }

  private def writeGif(bi: BufferedImage,
      progressive: Boolean = false): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    if (progressive)
      param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new IIOImage(bi, null, null), param)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("decodes ImageIO-written GIFs pixel-exact (non-interlaced)") {
    val (w, h) = (29, 17)
    val bi = indexedImage(w, h)
    val gif = writeGif(bi)
    assert(GifCodec.isGif(gif))
    val got = GifCodec.decode(gif)
    assert(got.isDefined)
    val ref = ImageIO.read(new ByteArrayInputStream(gif))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val i = (y * w + x) * 3
      assert((got.get.bgr(i + 2) & 0xff) === ((rgb >> 16) & 0xff), s"R($x,$y)")
      assert((got.get.bgr(i + 1) & 0xff) === ((rgb >> 8) & 0xff), s"G($x,$y)")
      assert((got.get.bgr(i) & 0xff) === (rgb & 0xff), s"B($x,$y)")
    }
  }

  test("decodes interlaced GIFs from ImageIO's progressive writer") {
    val (w, h) = (23, 19)
    val bi = indexedImage(w, h)
    val gif = writeGif(bi, progressive = true)
    // interlace flag lives in the image descriptor; find 0x2C and check
    var pos = 13 + 3 * 16 // header + LSD + 16-entry GCT
    while ((gif(pos) & 0xff) == 0x21) {
      pos += 2
      while ((gif(pos) & 0xff) != 0) pos += 1 + (gif(pos) & 0xff)
      pos += 1
    }
    assert((gif(pos) & 0xff) === 0x2c)
    assert((gif(pos + 9) & 0x40) === 0x40, "writer did not interlace")
    val got = GifCodec.decode(gif)
    assert(got.isDefined)
    val ref = ImageIO.read(new ByteArrayInputStream(gif))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val i = (y * w + x) * 3
      assert((got.get.bgr(i + 2) & 0xff) === ((rgb >> 16) & 0xff), s"R($x,$y)")
      assert((got.get.bgr(i + 1) & 0xff) === ((rgb >> 8) & 0xff), s"G($x,$y)")
      assert((got.get.bgr(i) & 0xff) === (rgb & 0xff), s"B($x,$y)")
    }
  }

  test("encode: own round trip is the identity; ImageIO reads it back") {
    // ≤256 distinct colors → lossless palette path
    val (w, h) = (31, 13)
    val bgr = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val c = (x + y * 2) % 24
      bgr(i) = (c * 10).toByte; bgr(i + 1) = (c * 5 + 3).toByte
      bgr(i + 2) = (255 - c * 9).toByte
    }
    val img = BmpCodec.Decoded(w, h, bgr)
    val gif = GifCodec.encode(img)
    assert(GifCodec.isGif(gif))
    val back = GifCodec.decode(gif)
    assert(back.isDefined)
    assert(back.get.bgr.toSeq === bgr.toSeq)
    // independent reader agrees
    val ref = ImageIO.read(new ByteArrayInputStream(gif))
    assert(ref.getWidth === w && ref.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val i = (y * w + x) * 3
      assert((rgb & 0xff) === (bgr(i) & 0xff), s"B($x,$y)")
      assert(((rgb >> 8) & 0xff) === (bgr(i + 1) & 0xff), s"G($x,$y)")
      assert(((rgb >> 16) & 0xff) === (bgr(i + 2) & 0xff), s"R($x,$y)")
    }
  }

  test("encode: dictionary-reset path on large high-entropy images") {
    // big enough that LZW fills 4096 entries and emits a mid-stream
    // clear; palette is the quantized 3-3-2 cube (deterministic)
    val (w, h) = (160, 120)
    val bgr = Array.tabulate(w * h * 3) { i =>
      (((i * 2654435761L) >>> 13) & 0xff).toByte
    }
    val img = BmpCodec.Decoded(w, h, bgr)
    val gif = GifCodec.encode(img)
    val back = GifCodec.decode(gif)
    assert(back.isDefined)
    // quantized, so compare against ImageIO's reading of the same file
    val ref = ImageIO.read(new ByteArrayInputStream(gif))
    for (y <- 0 until h by 7; x <- 0 until w by 11) {
      val rgb = ref.getRGB(x, y)
      val i = (y * w + x) * 3
      assert((back.get.bgr(i + 2) & 0xff) === ((rgb >> 16) & 0xff), s"($x,$y)")
      assert((back.get.bgr(i) & 0xff) === (rgb & 0xff), s"($x,$y)")
    }
  }

  test("multimodal dispatch: GIF assets decode and resize in kind") {
    val img = BmpCodec.Decoded(12, 8,
      Array.tabulate(12 * 8 * 3)(i => ((i % 13) * 19).toByte))
    val gif = GifCodec.encode(img)
    assert(Multimodal.decodeAny(gif).isDefined)
  }
}

/** q158: the four-arm encode→decode battery as a distributed query. */
class CodecBatterySpec extends graft.SparkTestBase {
  test("codec battery exercises all four arms with full dimensions") {
    val r = Multimodal.codecBattery(
      Multimodal.assets(spark, sf0001), spark).collect()
      .map(row => row.getString(0) -> row).toMap
    assert(r.keySet === Set("image/bmp", "image/png", "image/jpeg",
      "image/gif"))
    r.values.foreach { row =>
      assert(row.getLong(1) > 0) // n
      assert(row.getInt(3) === 16 && row.getInt(4) === 12, row) // w, h
    }
  }
}
