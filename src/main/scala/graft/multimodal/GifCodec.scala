package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM GIF87a/89a codec (CompuServe spec; LZW per the original
  * GIF appendix). Decode covers the full still-image profile: global and
  * local color tables at any legal depth, BOTH interlace modes, variable-
  * width LZW with dictionary resets and the KwKwK case, and extension
  * blocks (graphic control / comment / application) skipped via their
  * sub-block chains. Animated files decode to their FIRST frame composed
  * onto the logical screen; transparency is ignored (the transparent
  * index renders as its palette color — the shared representation has no
  * alpha channel, same policy as the PNG arm's alpha drop).
  *
  * Encode writes GIF87a, non-interlaced, one image: palette = the sorted
  * distinct colors when ≤ 256 (lossless round trip), else deterministic
  * 3-3-2 RGB quantization; LZW with an explicit initial clear, width
  * growth at dictionary fill, and a clear+reset at the 4096-entry cap.
  * ImageIO reads our output back (spec-pinned both directions). */
object GifCodec {

  def isGif(b: Array[Byte]): Boolean =
    b.length > 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  def decode(b: Array[Byte]): Option[BmpCodec.Decoded] = {
    try {
      if (!isGif(b)) return None
      val width = u16(b, 6)
      val height = u16(b, 8)
      if (width <= 0 || height <= 0 || width.toLong * height > 64000000L)
        return None
      val packed = b(10) & 0xff
      var pos = 13
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 1 << ((packed & 7) + 1)
        gct = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
        pos += 3 * n
      }
      val bgIndex = b(11) & 0xff
      // logical screen starts as the background color (first-frame
      // compose target when the frame doesn't cover the whole screen)
      val out = new Array[Byte](width * height * 3)
      if (gct != null && bgIndex * 3 + 2 < gct.length) {
        var i = 0
        while (i < width * height) {
          out(i * 3) = gct(bgIndex * 3 + 2)
          out(i * 3 + 1) = gct(bgIndex * 3 + 1)
          out(i * 3 + 2) = gct(bgIndex * 3)
          i += 1
        }
      }
      while (pos < b.length) {
        (b(pos) & 0xff) match {
          case 0x3b => return None // trailer before any image
          case 0x21 => // extension: label + sub-block chain
            pos += 2
            while ((b(pos) & 0xff) != 0) pos += 1 + (b(pos) & 0xff)
            pos += 1
          case 0x2c =>
            val left = u16(b, pos + 1); val top = u16(b, pos + 3)
            val iw = u16(b, pos + 5); val ih = u16(b, pos + 7)
            val ip = b(pos + 9) & 0xff
            pos += 10
            var pal = gct
            if ((ip & 0x80) != 0) {
              val n = 1 << ((ip & 7) + 1)
              pal = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
              pos += 3 * n
            }
            if (pal == null || iw <= 0 || ih <= 0) return None
            val interlaced = (ip & 0x40) != 0
            val mcs = b(pos) & 0xff
            pos += 1
            // concatenate the data sub-blocks
            val data = new ByteArrayOutputStream()
            while ((b(pos) & 0xff) != 0) {
              val n = b(pos) & 0xff
              data.write(b, pos + 1, n)
              pos += 1 + n
            }
            val idx = lzwDecode(data.toByteArray, mcs, iw * ih)
            if (idx == null) return None
            // interlace passes: rows 0/8, 4/8, 2/4, 1/2
            val rowOrder = new Array[Int](ih)
            if (interlaced) {
              var r = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- start until ih by step) { rowOrder(r) = y; r += 1 }
            } else {
              var y = 0
              while (y < ih) { rowOrder(y) = y; y += 1 }
            }
            var srcRow = 0
            while (srcRow < ih) {
              val y = top + rowOrder(srcRow)
              var x = 0
              while (x < iw && y < height) {
                val px = idx(srcRow * iw + x) & 0xff
                val gx = left + x
                if (gx < width && px * 3 + 2 < pal.length) {
                  val o = (y * width + gx) * 3
                  out(o) = pal(px * 3 + 2)
                  out(o + 1) = pal(px * 3 + 1)
                  out(o + 2) = pal(px * 3)
                }
                x += 1
              }
              srcRow += 1
            }
            return Some(BmpCodec.Decoded(width, height, out))
          case _ => return None
        }
      }
      None
    } catch { case _: Exception => None }
  }

  /** GIF-variant variable-width LZW: codes LSB-first, clear = 1<<mcs,
    * EOI = clear+1, dictionary entries as (prefix code, suffix byte)
    * expanded through a stack, width grows when the next code would not
    * fit, 12-bit cap until the encoder's own clear. */
  private def lzwDecode(data: Array[Byte], mcs: Int, nPixels: Int)
      : Array[Byte] = {
    if (mcs < 2 || mcs > 11) return null
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var next = eoi + 1
    var width = mcs + 1
    var prev = -1
    var bitBuf = 0
    var bitCnt = 0
    var dp = 0
    var firstOfPrev: Byte = 0
    while (outPos < nPixels) {
      while (bitCnt < width && dp < data.length) {
        bitBuf |= (data(dp) & 0xff) << bitCnt
        bitCnt += 8
        dp += 1
      }
      if (bitCnt < width) return if (outPos == nPixels) out else null
      val code = bitBuf & ((1 << width) - 1)
      bitBuf >>>= width
      bitCnt -= width
      if (code == clear) {
        next = eoi + 1
        width = mcs + 1
        prev = -1
      } else if (code == eoi) {
        return if (outPos == nPixels) out else null
      } else {
        var sp = 0
        var entryFirst: Byte = 0
        if (code < next) {
          // expand dict[code] back to its root (0..clear-1)
          var c = code
          while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
          if (c >= clear) return null
          entryFirst = c.toByte
          stack(sp) = c.toByte; sp += 1
        } else if (code == next && prev != -1) {
          // KwKwK: entry = prev-string + first(prev-string)
          stack(sp) = firstOfPrev; sp += 1
          var c = prev
          while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
          if (c >= clear) return null
          entryFirst = c.toByte
          stack(sp) = c.toByte; sp += 1
        } else return null
        // emit reversed
        while (sp > 0 && outPos < nPixels) {
          sp -= 1; out(outPos) = stack(sp); outPos += 1
        }
        if (prev != -1 && next < 4096) {
          prefix(next) = prev
          suffix(next) = entryFirst
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
        firstOfPrev = entryFirst
      }
    }
    out
  }

  /** Encode as GIF87a. Lossless when the image has ≤ 256 distinct
    * colors; otherwise colors quantize deterministically to the 3-3-2
    * RGB cube. */
  def encode(img: BmpCodec.Decoded): Array[Byte] = {
    val nPix = img.width * img.height
    // a 0×N GIF is not representable (readers reject zero dims, and the
    // LZW stream needs at least one literal) — fail loudly, not deep in
    // the bit packer
    require(nPix > 0, "cannot GIF-encode an empty image")
    // distinct colors, packed RGB
    val seen = new java.util.TreeSet[Integer]()
    var i = 0
    while (i < nPix && seen.size() <= 256) {
      val rgb = ((img.bgr(i * 3 + 2) & 0xff) << 16) |
        ((img.bgr(i * 3 + 1) & 0xff) << 8) | (img.bgr(i * 3) & 0xff)
      seen.add(rgb)
      i += 1
    }
    val exact = seen.size() <= 256
    val palette: Array[Int] =
      if (exact) {
        val it = seen.iterator(); val a = new Array[Int](seen.size())
        var j = 0
        while (it.hasNext) { a(j) = it.next(); j += 1 }
        a
      } else Array.tabulate(256) { c =>
        // 3-3-2: rrr Rgg gbb → expand each channel to 8 bits
        val r = (c >> 5) & 7; val g = (c >> 2) & 7; val bb = c & 3
        (((r * 255) / 7) << 16) | (((g * 255) / 7) << 8) | ((bb * 255) / 3)
      }
    val lookup = new java.util.HashMap[Integer, Integer]()
    if (exact) {
      var j = 0
      while (j < palette.length) { lookup.put(palette(j), j); j += 1 }
    }
    def index(rgb: Int): Int =
      if (exact) lookup.get(rgb)
      else (((rgb >> 16) & 0xff) >> 5 << 5) |
        (((rgb >> 8) & 0xff) >> 5 << 2) | ((rgb & 0xff) >> 6)
    val idx = new Array[Byte](nPix)
    i = 0
    while (i < nPix) {
      val rgb = ((img.bgr(i * 3 + 2) & 0xff) << 16) |
        ((img.bgr(i * 3 + 1) & 0xff) << 8) | (img.bgr(i * 3) & 0xff)
      idx(i) = index(rgb).toByte
      i += 1
    }
    // GCT size: power of two ≥ palette length, min 2 entries
    var gctBits = 1
    while ((1 << gctBits) < palette.length) gctBits += 1
    val gctN = 1 << gctBits
    val out = new ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(img.width); w16(img.height)
    out.write(0x80 | (gctBits - 1)) // GCT present, depth
    out.write(0) // background index
    out.write(0) // aspect
    var j = 0
    while (j < gctN) {
      val rgb = if (j < palette.length) palette(j) else 0
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff)
      out.write(rgb & 0xff)
      j += 1
    }
    out.write(0x2c); w16(0); w16(0); w16(img.width); w16(img.height)
    out.write(0) // no LCT, not interlaced
    val mcs = math.max(2, gctBits)
    out.write(mcs)
    writeLzw(out, idx, mcs)
    out.write(0) // block terminator
    out.write(0x3b)
    out.toByteArray
  }

  private def writeLzw(out: ByteArrayOutputStream, idx: Array[Byte],
      mcs: Int): Unit = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val block = new ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    def flushBytes(): Unit =
      while (bitCnt >= 8) {
        block.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
        if (block.size() == 255) {
          out.write(255); block.writeTo(out); block.reset()
        }
      }
    var width = mcs + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      flushBytes()
    }
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    emit(clear)
    var prev = idx(0) & 0xff
    var i = 1
    while (i < idx.length) {
      val c = idx(i) & 0xff
      val k = (prev << 8) | c
      val hit = dict.get(k)
      if (hit != null) prev = hit
      else {
        emit(prev)
        if (next < 4096) {
          dict.put(k, next)
          next += 1
          // width growth must track the DECODER's counter, which lags
          // this one by one add (the decoder only materializes an entry
          // when the NEXT code reveals its first byte) — so the encoder
          // widens one add later than its own counter suggests
          if (next == (1 << width) + 1 && width < 12) width += 1
        } else {
          emit(clear)
          dict = new java.util.HashMap[Integer, Integer]()
          next = eoi + 1
          width = mcs + 1
        }
        prev = c
      }
      i += 1
    }
    emit(prev)
    emit(eoi)
    // flushBytes keeps bitCnt ≤ 7, so at most one padding byte remains
    if (bitCnt > 0) {
      block.write((bitBuf & 0xff).toInt)
      if (block.size() == 255) { out.write(255); block.writeTo(out); block.reset() }
    }
    if (block.size() > 0) {
      out.write(block.size()); block.writeTo(out)
    }
  }
}
