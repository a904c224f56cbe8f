package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM GIF87a/89a codec (CompuServe spec; LZW per the original
  * GIF appendix). [[decode]] covers the full still-image profile: global
  * and local color tables at any legal depth, BOTH interlace modes,
  * variable-width LZW with dictionary resets and the KwKwK case, and
  * extension blocks (graphic control / comment / application) skipped
  * via their sub-block chains. Under [[decode]] animated files yield
  * their FIRST frame composed onto the logical screen and transparency
  * is ignored (the transparent index renders as its palette color — the
  * shared representation has no alpha channel, same policy as the PNG
  * arm's alpha drop); [[decodeFrames]] (round 12) is the full animated
  * profile — every frame composed per the 89a GCE semantics.
  *
  * Encode: [[encode]] writes GIF87a, non-interlaced, one image —
  * palette = the sorted distinct colors when ≤ 256 (lossless round
  * trip), else deterministic 3-3-2 RGB quantization; LZW with an
  * explicit initial clear, width growth at dictionary fill, and a
  * clear+reset at the 4096-entry cap. [[encodeFrames]] writes animated
  * GIF89a from the same per-frame machinery. ImageIO reads both back
  * (spec-pinned in all directions). */
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

  /** Full animated decode (GIF89a multi-frame profile, round 12): every
    * image block composes onto the logical screen in document order and
    * the canvas is snapshotted after each — the returned sequence is
    * what a viewer displays, not the raw per-image rasters. Honors the
    * Graphic Control Extension per the 89a spec: transparency (the
    * transparent index leaves the underlying canvas pixel) and disposal
    * methods 0/1 (leave), 2 (restore the frame's REGION to the
    * background color) and 3 (restore the pre-frame canvas). Interlaced
    * frames and local color tables compose like [[decode]]'s.
    *
    * STRICT on the whole stream where [[decode]] (first-frame contract,
    * unchanged) stops reading at its frame: every block must parse, the
    * file must end with the 0x3b trailer, and trailing bytes after the
    * trailer are malformed — None on any violation (the codec-family
    * contract: callers drop, never throw). */
  /** [[decodeFrames]] bounds — see the image-block budget check below:
    * frame count mirrors GVID's cap; the byte budget caps the TOTAL
    * decoded output (canvas + disposal snapshot + every composed-frame
    * clone) at 256 MB, generous for any real animation yet far below
    * the multi-GB a crafted file could otherwise force. */
  private val MaxFrames = 65536
  private val MaxDecodedBytes = 256L << 20

  def decodeFrames(b: Array[Byte]): Option[Seq[BmpCodec.Decoded]] = {
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
      val bg = new Array[Byte](3) // canvas-order BGR background color
      if (gct != null && bgIndex * 3 + 2 < gct.length) {
        bg(0) = gct(bgIndex * 3 + 2); bg(1) = gct(bgIndex * 3 + 1)
        bg(2) = gct(bgIndex * 3)
      }
      // the decoded-byte budget applies to the HEADER dimensions before
      // the logical-screen canvas is allocated (round-13 advice): a
      // sub-KB file declaring 64M pixels (under the pixel cap above)
      // would otherwise force a ~192 MB canvas allocation + background
      // fill before the per-image-block budget check ever runs. 3L·
      // mirrors the minimum live set the block check counts (canvas +
      // first snapshot + one disposal save).
      if (3L * width * height * 3 > MaxDecodedBytes) return None
      val canvas = new Array[Byte](width * height * 3)
      var i = 0
      while (i < width * height) {
        canvas(i * 3) = bg(0); canvas(i * 3 + 1) = bg(1)
        canvas(i * 3 + 2) = bg(2); i += 1
      }
      val frames = Seq.newBuilder[BmpCodec.Decoded]
      var nFrames = 0
      // GCE state: applies to the single NEXT image block, then resets
      var transparentIdx = -1
      var disposal = 0
      while (pos < b.length) {
        (b(pos) & 0xff) match {
          case 0x3b =>
            // trailer: must be the LAST byte and at least one frame
            // must have decoded
            return if (pos == b.length - 1 && nFrames > 0)
              Some(frames.result()) else None
          case 0x21 =>
            if ((b(pos + 1) & 0xff) == 0xf9 && (b(pos + 2) & 0xff) == 4) {
              val p = b(pos + 3) & 0xff
              disposal = (p >> 2) & 7
              transparentIdx = if ((p & 1) != 0) b(pos + 6) & 0xff else -1
            }
            pos += 2
            while ((b(pos) & 0xff) != 0) pos += 1 + (b(pos) & 0xff)
            pos += 1
          case 0x2c =>
            // Allocation budget (round-12 advice): every composed frame
            // snapshots the full logical-screen canvas, so a crafted
            // KB-scale file — a large logical screen plus many ~15-byte
            // 1×1 image blocks — could otherwise allocate multi-GB, and
            // the resulting OutOfMemoryError is an Error, NOT an
            // Exception: it escapes the family's "callers drop, never
            // throw" catch and would kill an executor instead of
            // dropping the row (GVID bounds frames at 65536 and frame
            // bytes by input length; this decoder must bound both too).
            // Budget = live canvases plus every snapshot taken so far.
            if (nFrames >= MaxFrames ||
              (nFrames + 3).toLong * width * height * 3 > MaxDecodedBytes)
              return None
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
            val data = new ByteArrayOutputStream()
            while ((b(pos) & 0xff) != 0) {
              val n = b(pos) & 0xff
              data.write(b, pos + 1, n)
              pos += 1 + n
            }
            pos += 1 // the data-chain terminator byte
            val idx = lzwDecode(data.toByteArray, mcs, iw * ih)
            if (idx == null) return None
            // disposal 3 needs the pre-compose canvas back afterwards
            val saved = if (disposal == 3) canvas.clone() else null
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
                if (gx < width && px != transparentIdx &&
                  px * 3 + 2 < pal.length) {
                  val o = (y * width + gx) * 3
                  canvas(o) = pal(px * 3 + 2)
                  canvas(o + 1) = pal(px * 3 + 1)
                  canvas(o + 2) = pal(px * 3)
                }
                x += 1
              }
              srcRow += 1
            }
            frames += BmpCodec.Decoded(width, height, canvas.clone())
            nFrames += 1
            if (disposal == 2) {
              // restore the frame's region to the background color
              var y = top
              while (y < top + ih && y < height) {
                var gx = left
                while (gx < left + iw && gx < width) {
                  val o = (y * width + gx) * 3
                  canvas(o) = bg(0); canvas(o + 1) = bg(1)
                  canvas(o + 2) = bg(2)
                  gx += 1
                }
                y += 1
              }
            } else if (disposal == 3) {
              System.arraycopy(saved, 0, canvas, 0, canvas.length)
            }
            transparentIdx = -1
            disposal = 0
          case _ => return None
        }
      }
      None // ran off the end without a trailer
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

  /** Deterministic palette for one image: the sorted distinct colors
    * when ≤ 256 (lossless), else the fixed 3-3-2 RGB cube; returns
    * (palette as packed RGB, per-pixel indices, table depth in bits).
    * Factored from [[encode]] so [[encodeFrames]] reuses it per frame
    * as a local color table. */
  private def quantize(img: BmpCodec.Decoded)
      : (Array[Int], Array[Byte], Int) = {
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
    // table size: power of two ≥ palette length, min 2 entries
    var gctBits = 1
    while ((1 << gctBits) < palette.length) gctBits += 1
    (palette, idx, gctBits)
  }

  private def writePalette(out: ByteArrayOutputStream,
      palette: Array[Int], bits: Int): Unit = {
    var j = 0
    while (j < (1 << bits)) {
      val rgb = if (j < palette.length) palette(j) else 0
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff)
      out.write(rgb & 0xff)
      j += 1
    }
  }

  /** Encode as GIF87a. Lossless when the image has ≤ 256 distinct
    * colors; otherwise colors quantize deterministically to the 3-3-2
    * RGB cube. */
  def encode(img: BmpCodec.Decoded): Array[Byte] = {
    val (palette, idx, gctBits) = quantize(img)
    val out = new ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(img.width); w16(img.height)
    out.write(0x80 | (gctBits - 1)) // GCT present, depth
    out.write(0) // background index
    out.write(0) // aspect
    writePalette(out, palette, gctBits)
    out.write(0x2c); w16(0); w16(0); w16(img.width); w16(img.height)
    out.write(0) // no LCT, not interlaced
    val mcs = math.max(2, gctBits)
    out.write(mcs)
    writeLzw(out, idx, mcs)
    out.write(0) // block terminator
    out.write(0x3b)
    out.toByteArray
  }

  /** Encode a frame sequence as an animated GIF89a (round 12): the
    * real-world multi-frame container for the video near-dup family —
    * logical screen = the (uniform) frame dims, a NETSCAPE2.0
    * loop-forever application extension, then per frame a Graphic
    * Control Extension (disposal 1 — every frame fully covers the
    * screen in this encoder — no transparency, `delayCs` hundredths)
    * followed by a full-screen image block with its own local color
    * table from [[quantize]]. Lossless per frame under the same ≤ 256
    * distinct-colors condition as [[encode]]; [[decodeFrames]] and the
    * JDK's ImageIO both read it back (spec-pinned in GifCodecSpec). */
  def encodeFrames(frames: Seq[BmpCodec.Decoded],
      delayCs: Int = 4): Array[Byte] = {
    require(frames.nonEmpty, "cannot GIF-encode an empty frame sequence")
    val w = frames.head.width; val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "animated GIF frames must share dimensions")
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0) // no global color table — each frame carries an LCT
    out.write(0) // background index (meaningless without a GCT)
    out.write(0) // aspect
    // NETSCAPE2.0 loop-forever application extension
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); w16(0) // sub-block: loop count 0 = forever
    out.write(0) // application-extension terminator
    frames.foreach { img =>
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(1 << 2) // disposal 1 (leave in place), no transparency
      w16(delayCs)
      out.write(0) // transparent index (unused)
      out.write(0) // GCE terminator
      val (palette, idx, bits) = quantize(img)
      out.write(0x2c); w16(0); w16(0); w16(w); w16(h)
      out.write(0x80 | (bits - 1)) // LCT present, non-interlaced
      writePalette(out, palette, bits)
      val mcs = math.max(2, bits)
      out.write(mcs)
      writeLzw(out, idx, mcs)
      out.write(0) // block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  // private[multimodal]: GifCodecSpec hand-assembles GIFs with
  // arbitrary descriptors/GCEs around spec-valid LZW data to pin the
  // multi-frame composition semantics
  private[multimodal] def writeLzw(out: ByteArrayOutputStream,
      idx: Array[Byte], mcs: Int): Unit = {
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
