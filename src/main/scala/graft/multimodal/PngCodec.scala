package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Second REAL codec arm for the multimodal seam: PNG (RFC 2083), decoded
  * with pure JVM byte arithmetic + `java.util.zip` for the DEFLATE stream —
  * no external libraries. Supports the mainstream still-image profile:
  * 8-bit-per-channel truecolor (color type 2) and truecolor+alpha (type 6,
  * alpha dropped), non-interlaced, with ALL five scanline filters (none /
  * sub / up / average / paeth) implemented for decode. Encode emits
  * filter-0 RGB rows.
  *
  * Decodes into [[BmpCodec.Decoded]] (BGR, top-down) so every downstream
  * primitive — mean color, nearest-neighbor resize, gray thumbnails — is
  * shared across codecs; [[Multimodal]] dispatches on magic bytes.
  */
object PngCodec {

  private val Sig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b != null && b.length > 8 && {
      var i = 0
      var ok = true
      while (i < 8) { if (b(i) != Sig(i)) ok = false; i += 1 }
      ok
    }

  @inline private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  @inline private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** None for non-PNG payloads or variants outside the supported profile —
    * callers fall through to the next codec / documented stub. */
  def decode(b: Array[Byte]): Option[BmpCodec.Decoded] = {
    if (!isPng(b)) return None
    try {
      var pos = 8
      var w = -1; var h = -1
      var bitDepth = -1; var colorType = -1; var interlace = -1
      val idat = new ByteArrayOutputStream()
      var done = false
      while (!done && pos + 12 <= b.length) {
        val len = be32(b, pos)
        if (len < 0 || pos + 12 + len > b.length) return None
        val typ = new String(b, pos + 4, 4, "US-ASCII")
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            w = be32(b, pos + 8); h = be32(b, pos + 12)
            bitDepth = b(pos + 16) & 0xff; colorType = b(pos + 17) & 0xff
            interlace = b(pos + 20) & 0xff
          case "IDAT" => idat.write(b, pos + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped
        }
        pos += 12 + len
      }
      // crafted headers must not drive allocation: bound dimensions first
      if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
      if (bitDepth != 8 || (colorType != 2 && colorType != 6) ||
        interlace != 0) return None
      val bpp = if (colorType == 2) 3 else 4
      val stride = w * bpp
      val expected = (stride + 1) * h
      val raw = inflate(idat.toByteArray, expected)
      if (raw == null || raw.length != expected) return None

      val img = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val ft = raw(y * (stride + 1)) & 0xff
        if (ft > 4) return None
        val rowOff = y * (stride + 1) + 1
        val outOff = y * stride
        var x = 0
        while (x < stride) {
          val cur = raw(rowOff + x) & 0xff
          val a = if (x >= bpp) img(outOff + x - bpp) & 0xff else 0
          val u = if (y > 0) img(outOff - stride + x) & 0xff else 0
          val c = if (x >= bpp && y > 0) img(outOff - stride + x - bpp) & 0xff
            else 0
          val v = ft match {
            case 0 => cur
            case 1 => cur + a
            case 2 => cur + u
            case 3 => cur + ((a + u) >> 1)
            case _ => cur + paeth(a, u, c)
          }
          img(outOff + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      // RGB(A) → BGR top-down (alpha dropped): the shared Decoded layout
      val bgr = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val o = i * bpp; val p = i * 3
        bgr(p) = img(o + 2); bgr(p + 1) = img(o + 1); bgr(p + 2) = img(o)
        i += 1
      }
      Some(BmpCodec.Decoded(w, h, bgr))
    } catch {
      case _: Exception => None // truncated/corrupt stream: not decodable
    }
  }

  /** Encode as 8-bit truecolor, non-interlaced, filter-0 rows. */
  def encode(img: BmpCodec.Decoded): Array[Byte] = {
    val stride = img.width * 3
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      raw(y * (stride + 1)) = 0
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = y * (stride + 1) + 1 + x * 3
        raw(d) = img.bgr(s + 2) // R
        raw(d + 1) = img.bgr(s + 1) // G
        raw(d + 2) = img.bgr(s) // B
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    out.write(Sig, 0, 8)
    val ihdr = new Array[Byte](13)
    def put32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
    put32(ihdr, 0, img.width); put32(ihdr, 4, img.height)
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    len(0) = (data.length >>> 24).toByte; len(1) = (data.length >>> 16).toByte
    len(2) = (data.length >>> 8).toByte; len(3) = data.length.toByte
    out.write(len, 0, 4)
    val typB = typ.getBytes("US-ASCII")
    out.write(typB, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(typB); crc.update(data)
    val v = crc.getValue.toInt
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        // zero progress while unfinished = truncated input OR a stream
        // demanding a preset dictionary (FDICT) — either way undecodable;
        // returning null here (not looping) is what keeps a crafted
        // payload from hanging the executor task
        if (n == 0) return null
        off += n
      }
      if (off == expected && inf.getRemaining == 0) out else null
    } finally inf.end()
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(data); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }
}
