package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Second REAL codec arm for the multimodal seam: PNG (RFC 2083), decoded
  * with pure JVM byte arithmetic + `java.util.zip` for the DEFLATE stream —
  * no external libraries. Decodes EVERY legal still-image profile of the
  * spec: truecolor (color type 2) and truecolor+alpha (type 6) at depths
  * 8 and 16, GRAYSCALE (type 0) at 1/2/4/8/16, GRAYSCALE+ALPHA (type 4)
  * at 8/16, PALETTED (type 3, PLTE-resolved) at 1/2/4/8; alpha dropped,
  * 16-bit samples downscaled round(v·255/65535); BOTH interlace modes
  * (none and Adam7), with ALL five scanline filters (none / sub / up /
  * average / paeth) implemented for decode. Encode emits filter-0
  * non-interlaced RGB rows.
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
      var plte: Array[Byte] = null
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
          case "PLTE" =>
            if (len % 3 != 0 || len > 256 * 3) return None
            plte = java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + len)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped (tRNS too: alpha drops)
        }
        pos += 12 + len
      }
      // crafted headers must not drive allocation: bound dimensions first
      if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
      val paletted = colorType == 3
      if (interlace != 0 && interlace != 1) return None
      // legal (type, depth) profiles per RFC 2083 §6.1 that we decode:
      // palette 1/2/4/8; gray 1/2/4/8/16; gray+alpha, RGB, RGBA 8/16
      val depthOk = colorType match {
        case 3 => plte != null && Set(1, 2, 4, 8).contains(bitDepth)
        case 0 => Set(1, 2, 4, 8, 16).contains(bitDepth)
        case 2 | 4 | 6 => bitDepth == 8 || bitDepth == 16
        case _ => false
      }
      if (!depthOk) return None
      val channels =
        colorType match { case 2 => 3; case 4 => 2; case 6 => 4; case _ => 1 }
      val sampleBytes = if (bitDepth == 16) 2 else 1
      val subByte = bitDepth < 8
      // bpp: bytes per pixel in the intermediate buffer — 1 byte (palette
      // INDEX or gray sample) for sub-8-bit rows, which unpack after
      // unfiltering (filters for depth < 8 operate bytewise with bpp = 1,
      // RFC 2083 §6.5); channels·sampleBytes otherwise (16-bit filters
      // operate on BYTES with the full pixel width as the left-delta)
      val bpp = if (subByte) 1 else channels * sampleBytes
      // packed bytes per n-pixel filtered row
      def packedBytes(n: Int): Int =
        if (subByte) (n * bitDepth + 7) / 8 else n * bpp
      // unpack one unfiltered packed row into bpp-bytes-per-pixel values
      def expandRow(src: Array[Byte], srcOff: Int, dst: Array[Byte],
          dstOff: Int, n: Int): Unit =
        if (!subByte) {
          System.arraycopy(src, srcOff, dst, dstOff, n * bpp)
        } else {
          val mask = (1 << bitDepth) - 1
          var i = 0
          while (i < n) {
            val bit = i * bitDepth
            dst(dstOff + i) = ((src(srcOff + (bit >> 3)) >>
              (8 - bitDepth - (bit & 7))) & mask).toByte
            i += 1
          }
        }
      val stride = w * bpp

      val img = new Array[Byte](h * stride)
      if (interlace == 0) {
        val rb = packedBytes(w)
        val expected = (rb + 1) * h
        val raw = inflate(idat.toByteArray, expected)
        if (raw == null || raw.length != expected) return None
        if (subByte) {
          val packed = new Array[Byte](h * rb)
          if (!unfilter(raw, 0, packed, 0, h, rb, rb, 1)) return None
          var y = 0
          while (y < h) {
            expandRow(packed, y * rb, img, y * stride, w)
            y += 1
          }
        } else if (!unfilter(raw, 0, img, 0, h, w * bpp, stride, bpp)) {
          return None
        }
      } else {
        // Adam7: seven filtered sub-images, each scanline-filtered within
        // its own pass, pixels scattered on the (xStart + i·xStep,
        // yStart + j·yStep) lattice
        val xs = Array(0, 4, 0, 2, 0, 1, 0)
        val ys = Array(0, 0, 4, 0, 2, 0, 1)
        val xStep = Array(8, 8, 4, 4, 2, 2, 1)
        val yStep = Array(8, 8, 8, 4, 4, 2, 2)
        def passW(p: Int) = (w - xs(p) + xStep(p) - 1) / xStep(p)
        def passH(p: Int) = (h - ys(p) + yStep(p) - 1) / yStep(p)
        val expected = (0 until 7).map { p =>
          val (pw, ph) = (passW(p), passH(p))
          if (pw > 0 && ph > 0) ph * (1 + packedBytes(pw)) else 0
        }.sum
        val raw = inflate(idat.toByteArray, expected)
        if (raw == null || raw.length != expected) return None
        var off = 0
        var p = 0
        while (p < 7) {
          val pw = passW(p); val ph = passH(p)
          if (pw > 0 && ph > 0) {
            val rb = packedBytes(pw)
            val sub = new Array[Byte](ph * rb)
            if (!unfilter(raw, off, sub, 0, ph, rb, rb, bpp)) return None
            off += ph * (1 + rb)
            // unpack + scatter the de-filtered sub-image onto the lattice
            val rowPix = new Array[Byte](pw * bpp)
            var j = 0
            while (j < ph) {
              expandRow(sub, j * rb, rowPix, 0, pw)
              val dy = (ys(p) + j * yStep(p)) * stride
              var i = 0
              while (i < pw) {
                val so = i * bpp
                val dd = dy + (xs(p) + i * xStep(p)) * bpp
                var k = 0
                while (k < bpp) { img(dd + k) = rowPix(so + k); k += 1 }
                i += 1
              }
              j += 1
            }
          }
          p += 1
        }
      }
      // → BGR top-down (alpha dropped; palette indices resolved through
      // PLTE): the shared Decoded layout. 16-bit samples downscale by
      // round(v·255/65535) — the same rounding ImageIO's raster scaling
      // uses, pinned in PngCodecSpec against raw raster samples.
      @inline def sample8(pixOff: Int, ch: Int): Byte =
        if (sampleBytes == 2) {
          val o = pixOff + ch * 2
          val v = ((img(o) & 0xff) << 8) | (img(o + 1) & 0xff)
          ((v * 255 + 32767) / 65535).toByte
        } else img(pixOff + ch)
      val bgr = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val p = i * 3
        if (paletted) {
          val idx = (img(i) & 0xff) * 3
          if (idx + 2 >= plte.length) return None // index past the palette
          bgr(p) = plte(idx + 2); bgr(p + 1) = plte(idx + 1)
          bgr(p + 2) = plte(idx)
        } else if (channels <= 2) { // gray / gray+alpha (alpha dropped)
          val v =
            if (subByte) // scale a d-bit sample to full range: v·255/(2^d−1)
              ((img(i) & 0xff) * 255 / ((1 << bitDepth) - 1)).toByte
            else sample8(i * bpp, 0)
          bgr(p) = v; bgr(p + 1) = v; bgr(p + 2) = v
        } else { // RGB / RGBA (alpha dropped)
          val o = i * bpp
          bgr(p) = sample8(o, 2); bgr(p + 1) = sample8(o, 1)
          bgr(p + 2) = sample8(o, 0)
        }
        i += 1
      }
      Some(BmpCodec.Decoded(w, h, bgr))
    } catch {
      case _: Exception => None // truncated/corrupt stream: not decodable
    }
  }

  /** Reverse the per-scanline filters for `rows` consecutive rows of one
    * (sub-)image: `raw` holds [filter byte ‖ rowBytes] per row starting at
    * `rawOff`; de-filtered rows land in `out` at `outStride` apart. False
    * on an invalid filter type. */
  private def unfilter(raw: Array[Byte], rawOff: Int, out: Array[Byte],
      outOff: Int, rows: Int, rowBytes: Int, outStride: Int, bpp: Int)
      : Boolean = {
    var y = 0
    while (y < rows) {
      val ft = raw(rawOff + y * (rowBytes + 1)) & 0xff
      if (ft > 4) return false
      val rowOff = rawOff + y * (rowBytes + 1) + 1
      val o = outOff + y * outStride
      var x = 0
      while (x < rowBytes) {
        val cur = raw(rowOff + x) & 0xff
        val a = if (x >= bpp) out(o + x - bpp) & 0xff else 0
        val u = if (y > 0) out(o - outStride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) out(o - outStride + x - bpp) & 0xff
          else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + u
          case 3 => cur + ((a + u) >> 1)
          case _ => cur + paeth(a, u, c)
        }
        out(o + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    true
  }

  /** Encode as 16-bit truecolor (type 2, depth 16), non-interlaced,
    * filter-0 rows. Samples upscale v → v·257 (= v·65535/255 exactly), the
    * inverse of the decoder's round(v·255/65535) downscale — so
    * decode(encode16(x)) == x bit-for-bit, and the full legal depth range
    * of RFC 2083 is covered on the WRITE side too (the decode side already
    * covers every profile). */
  def encode16(img: BmpCodec.Decoded): Array[Byte] = {
    val stride = img.width * 6
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      raw(y * (stride + 1)) = 0
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = y * (stride + 1) + 1 + x * 6
        var c = 0
        while (c < 3) {
          // BGR → RGB channel order; v·257 duplicates the byte (0xAB →
          // 0xABAB), the canonical 8→16 bit replication
          val v = (img.bgr(s + (2 - c)) & 0xff) * 257
          raw(d + 2 * c) = (v >>> 8).toByte
          raw(d + 2 * c + 1) = (v & 0xff).toByte
          c += 1
        }
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
    ihdr(8) = 16; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
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
