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

  // ---- animated GIF89a (round 12) ----

  private def frame(w: Int, h: Int, salt: Int): BmpCodec.Decoded =
    BmpCodec.Decoded(w, h,
      Array.tabulate(w * h * 3)(i => ((i * 7 + salt * 31) % 251).toByte))

  test("encodeFrames round-trips every frame pixel-exact through " +
      "decodeFrames, and the JDK's ImageIO reads the same frames back") {
    val (w, h) = (11, 9)
    val frames = Seq(frame(w, h, 1), frame(w, h, 2), frame(w, h, 3))
    val gif = GifCodec.encodeFrames(frames)
    assert(GifCodec.isGif(gif) && gif(4) == '9') // GIF89a
    val got = GifCodec.decodeFrames(gif)
    assert(got.isDefined && got.get.length === 3)
    frames.zip(got.get).zipWithIndex.foreach { case ((a, b), f) =>
      assert(b.width === w && b.height === h)
      assert(a.bgr.toSeq === b.bgr.toSeq, s"frame $f")
    }
    // independent reader: ImageIO sees 3 frames with the same pixels
    // (every frame is full-screen here, so raw raster == composition)
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(gif))
    reader.setInput(iis)
    assert(reader.getNumImages(true) === 3)
    for (f <- 0 until 3) {
      val ref = reader.read(f)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = ref.getRGB(x, y)
        val i = (y * w + x) * 3
        assert((frames(f).bgr(i + 2) & 0xff) === ((rgb >> 16) & 0xff),
          s"R($x,$y) frame $f")
        assert((frames(f).bgr(i + 1) & 0xff) === ((rgb >> 8) & 0xff),
          s"G($x,$y) frame $f")
        assert((frames(f).bgr(i) & 0xff) === (rgb & 0xff),
          s"B($x,$y) frame $f")
      }
    }
    reader.dispose(); iis.close()
  }

  test("decodeFrames agrees with decode on single-frame files and is " +
      "strict about stream structure where decode is lenient") {
    val img = frame(7, 5, 4)
    val single = GifCodec.encode(img) // GIF87a, one frame
    val viaFrames = GifCodec.decodeFrames(single)
    assert(viaFrames.isDefined && viaFrames.get.length === 1)
    assert(viaFrames.get.head.bgr.toSeq ===
      GifCodec.decode(single).get.bgr.toSeq)
    // strictness: trailing bytes after the trailer, truncation, and a
    // missing trailer are all malformed for the whole-stream contract
    assert(GifCodec.decodeFrames(single :+ 0x00.toByte).isEmpty,
      "trailing bytes after the trailer must be rejected")
    assert(GifCodec.decodeFrames(single.dropRight(1)).isEmpty,
      "a stream without its trailer must be rejected")
    assert(GifCodec.decodeFrames(single.dropRight(10)).isEmpty)
    assert(GifCodec.decodeFrames(Array[Byte](1, 2, 3)).isEmpty)
    // decode keeps its documented first-frame contract (stops reading
    // at its frame, tolerates what follows)
    assert(GifCodec.decode(single :+ 0x00.toByte).isDefined)
  }

  /** Hand-assemble a GIF89a around spec-valid LZW data: a 4-entry GCT
    * (bg=0: black, 1: red, 2: green, 3: blue) and per-frame
    * (left, top, iw, ih, indices, disposal, transparentIdx). */
  private def handGif(w: Int, h: Int,
      frames: Seq[(Int, Int, Int, Int, Array[Byte], Int, Int)])
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0x80 | 1) // GCT present, 4 entries
    out.write(0); out.write(0) // bg index 0, aspect
    // GCT: black, red, green, blue (RGB order)
    out.write(Array[Byte](0, 0, 0, -1, 0, 0, 0, -1, 0, 0, 0, -1))
    frames.foreach { case (left, top, iw, ih, idx, disposal, tIdx) =>
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((disposal << 2) | (if (tIdx >= 0) 1 else 0))
      w16(0) // delay
      out.write(math.max(tIdx, 0))
      out.write(0)
      out.write(0x2c); w16(left); w16(top); w16(iw); w16(ih)
      out.write(0) // no LCT, not interlaced
      out.write(2) // mcs
      GifCodec.writeLzw(out, idx, 2)
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  test("decodeFrames refuses allocation-bomb files: a large logical " +
      "screen plus many tiny image blocks trips the decoded-byte budget " +
      "and returns None instead of allocating multi-GB (round-12 advice: " +
      "the OutOfMemoryError is an Error, which would escape the 'callers " +
      "drop, never throw' catch and kill an executor)") {
    // 3000×3000 canvas = 27 MB per composed-frame snapshot; 12 one-pixel
    // image blocks would compose ~324 MB of snapshots from a sub-2KB file
    val bomb = handGif(3000, 3000,
      (0 until 12).map(_ => (0, 0, 1, 1, Array[Byte](1), 0, -1)))
    assert(bomb.length < 2000)
    assert(GifCodec.decodeFrames(bomb).isEmpty)
    // the budget is a cap, not a small-animation regression: 6 frames on
    // the same canvas stay under it and still compose
    val ok = handGif(3000, 3000,
      (0 until 6).map(_ => (0, 0, 1, 1, Array[Byte](1), 0, -1)))
    assert(GifCodec.decodeFrames(ok).exists(_.length == 6))
    // round-13 advice: the budget also applies to the HEADER dimensions
    // BEFORE the canvas allocates — a sub-KB file declaring a canvas
    // whose minimum live set (canvas + snapshot + disposal save) alone
    // busts the budget must return None without the ~192 MB allocation
    // + background fill the old per-block check only caught afterwards
    val headerBomb = handGif(8000, 8000,
      Seq((0, 0, 1, 1, Array[Byte](1), 0, -1)))
    assert(headerBomb.length < 2000)
    assert(GifCodec.decodeFrames(headerBomb).isEmpty)
  }

  test("decodeFrames honors GCE transparency and disposal methods 2 " +
      "and 3 per the 89a spec") {
    // logical screen 4x3 over a black background; color letters:
    // K=black(0) R=red(1) G=green(2) B=blue(3)
    val full = Array.fill[Byte](12)(1) // frame 1: all red, disposal 2
    // frame 2: 2x2 at (1,1), [G, transparent; transparent, G],
    // disposal 3 (restore previous)
    val patch = Array[Byte](2, 3, 3, 2)
    val gif = handGif(4, 3, Seq(
      (0, 0, 4, 3, full, 2, -1),
      (1, 1, 2, 2, patch, 3, 3), // transparent index 3 (the blues)
      (0, 0, 4, 3, Array.fill[Byte](12)(3), 0, -1))) // frame 3: all blue
    val got = GifCodec.decodeFrames(gif)
    assert(got.isDefined && got.get.length === 3)
    def rgbAt(d: BmpCodec.Decoded, x: Int, y: Int): (Int, Int, Int) = {
      val i = (y * d.width + x) * 3
      ((d.bgr(i + 2) & 0xff), (d.bgr(i + 1) & 0xff), (d.bgr(i) & 0xff))
    }
    val Seq(f1, f2, f3) = got.get
    // frame 1: all red
    for (y <- 0 until 3; x <- 0 until 4)
      assert(rgbAt(f1, x, y) === ((255, 0, 0)), s"f1($x,$y)")
    // frame 1's disposal 2 restored the full region to background
    // BEFORE frame 2, so frame 2 = black canvas + the green diagonal
    // of the patch (its blue cells are transparent → background shows)
    for (y <- 0 until 3; x <- 0 until 4) {
      val expected =
        if ((x, y) == (1, 1) || (x, y) == (2, 2)) (0, 255, 0)
        else (0, 0, 0)
      assert(rgbAt(f2, x, y) === expected, s"f2($x,$y)")
    }
    // frame 2's disposal 3 restored the pre-frame-2 canvas (all
    // black), and frame 3 paints it all blue
    for (y <- 0 until 3; x <- 0 until 4)
      assert(rgbAt(f3, x, y) === ((0, 0, 255)), s"f3($x,$y)")
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
