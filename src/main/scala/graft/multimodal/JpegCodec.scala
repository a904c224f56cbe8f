package graft.multimodal

/** Third REAL codec arm: JPEG (ITU T.81) decode with pure JVM
  * arithmetic — marker parse, canonical Huffman entropy decode (with
  * byte-stuffing and restart markers), dequantization, inverse zigzag,
  * separable float IDCT, chroma upsampling (any h/v sampling factors
  * incl. 4:2:0), JFIF full-range YCbCr→RGB.
  *
  * Scope: 8-bit baseline (SOF0) AND progressive (SOF2 — spectral
  * selection + successive approximation, DC/AC first and refinement
  * scans, EOB runs), 1 or 3 components; no arithmetic coding, no
  * hierarchical/lossless modes. Unsupported profiles return None and
  * fall through [[Multimodal]]'s dispatch. A baseline encoder
  * ([[encode]]) completes the arm.
  *
  * Unlike BMP/PNG, JPEG decoding is not bit-exact across implementations
  * (the spec allows IDCT variation) — the spec pins this decoder against
  * the JDK's ImageIO within a small per-pixel tolerance instead of
  * byte equality.
  */
object JpegCodec {

  def isJpeg(b: Array[Byte]): Boolean =
    b != null && b.length > 3 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table as a flat (maxcode/valptr) decoder. */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = code - 1
        if (counts(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      if (l > 16) throw new IllegalStateException("bad huffman code")
      symbols(valPtr(l) + code - minCode(l))
    }
  }

  /** MSB-first bit reader over the entropy-coded segment, handling 0xFF00
    * stuffing; stops at markers (restart markers are consumed by the
    * caller via `restart()`). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw new IllegalStateException("eof")
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          val m = if (pos < b.length) b(pos) & 0xff else -1
          if (m == 0x00) pos += 1 // stuffed byte
          else throw new MarkerHit(0xff00 | m)
        }
        cur = v; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume the EXPECTED restart marker (RSTn cycles
      * 0..7). A wrong or missing index means the entropy stream is
      * desynchronized — throw (→ decode returns None) rather than
      * resyncing on a byte pair that may be payload. */
    def restart(expected: Int): Unit = {
      nbits = 0
      // only 0xFF pad bytes may precede the marker
      while (pos < b.length && (b(pos) & 0xff) == 0xff &&
        pos + 1 < b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != (0xd0 | expected))
        throw new IllegalStateException("restart desync")
      pos += 2
    }
  }
  private final class MarkerHit(val marker: Int)
    extends RuntimeException(null, null, false, false)

  /** Extend a magnitude-category value to its signed coefficient. */
  @inline private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private val IdctScale: Array[Double] = {
    val s = new Array[Double](8)
    s(0) = 1.0 / math.sqrt(2.0)
    for (i <- 1 until 8) s(i) = 1.0
    s
  }
  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))

  /** Separable 2D IDCT (float reference form), in-place on a 64-int
    * block, with level shift and clamp to [0,255]. `tmp` is caller-owned
    * scratch (one allocation per decode, not per block — ~375k blocks for
    * a 16 MP image otherwise churn ~190 MB of temporaries). */
  private def idct(block: Array[Int], tmp: Array[Double]): Unit = {
    // rows
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += IdctScale(u) * block(y * 8 + u) * Cos(x)(u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    // cols
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          s += IdctScale(v) * tmp(v * 8 + x) * Cos(yy)(v)
          v += 1
        }
        val p = math.round(s / 2.0 + 128.0).toInt
        block(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: Huff = _
    var acTab: Huff = _
    var pred: Int = 0
    var planeW: Int = 0
    var planeH: Int = 0
    // samples are clamped to [0,255] at IDCT time: byte planes keep the
    // transient footprint 4× smaller than int planes (header-declared
    // dimensions allocate BEFORE entropy data is validated)
    var plane: Array[Byte] = _
    // progressive-mode state: the full-image coefficient buffer (blocks
    // in the padded interleaved grid bw×bh, NATURAL order within each
    // 64-coef block) accumulated across scans, plus the component's
    // non-interleaved block dims (T.81 A.2.2: single-component scans
    // cover ceil(compW/8)×ceil(compH/8), NOT the MCU-padded grid)
    var bw = 0
    var bh = 0
    var nbw = 0
    var nbh = 0
    var coefs: Array[Int] = _
  }

  def decode(b: Array[Byte]): Option[BmpCodec.Decoded] = {
    if (!isJpeg(b)) return None
    try decodeInner(b)
    catch { case _: Exception => None }
  }

  // ------------------------------------------------- progressive scans
  //
  // T.81 G.1.2 / G.2: coefficients accumulate across scans — DC first
  // (diff-coded, scaled by 2^Al) then refined one bit at a time; AC bands
  // (Ss..Se) first-coded with EOB-run compression across blocks, then
  // refined with per-coefficient correction bits.

  /** One DC data unit: first pass decodes a diff at approximation Al;
    * refinement appends one magnitude bit. */
  @inline private def dcUnit(br: BitReader, c: Component, off: Int,
      ah: Int, al: Int): Unit = {
    if (ah == 0) {
      val t = c.dcTab.decode(br)
      c.pred += extend(br.bits(t), t)
      c.coefs(off) = c.pred << al
    } else if (br.bit() == 1) {
      c.coefs(off) |= (1 << al)
    }
  }

  /** First AC pass for one block; returns the remaining EOB run. */
  private def acFirst(br: BitReader, c: Component, off: Int,
      ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    if (eobrunIn > 0) return eobrunIn - 1
    var k = ss
    while (k <= se) {
      val rs = c.acTab.decode(br)
      val r = rs >> 4
      val s = rs & 0x0f
      if (s == 0) {
        if (r < 15) {
          var eob = (1 << r) - 1
          if (r > 0) eob += br.bits(r)
          return eob
        }
        k += 16 // ZRL
      } else {
        k += r
        if (k > se) throw new IllegalStateException("ac overflow")
        c.coefs(off + ZigZag(k)) = extend(br.bits(s), s) << al
        k += 1
      }
    }
    0
  }

  /** AC refinement pass for one block (T.81 G.1.2.3 shape: zero-history
    * runs interleave with correction bits for already-nonzero
    * coefficients); returns the remaining EOB run. */
  private def acRefine(br: BitReader, c: Component, off: Int,
      ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    val p1 = 1 << al
    var eobrun = eobrunIn
    var k = ss
    @inline def correct(pos: Int): Unit = {
      val v = c.coefs(pos)
      if (br.bit() == 1 && (v & p1) == 0)
        c.coefs(pos) = if (v >= 0) v + p1 else v - p1
    }
    if (eobrun == 0) {
      var done = false
      while (k <= se && !done) {
        val rs = c.acTab.decode(br)
        var r = rs >> 4
        val s = rs & 0x0f
        var newval = 0
        if (s == 0) {
          if (r < 15) {
            eobrun = 1 << r
            if (r > 0) eobrun += br.bits(r)
            done = true // correction bits for the tail run below
          }
          // r == 15: ZRL — skip 16 zero-history coefs, correcting en route
        } else {
          newval = if (br.bit() == 1) p1 else -p1
        }
        if (!done) {
          var placed = false
          while (k <= se && !placed) {
            val pos = off + ZigZag(k)
            if (c.coefs(pos) != 0) correct(pos)
            else if (r == 0) {
              if (newval != 0) c.coefs(pos) = newval
              placed = true
            } else r -= 1
            k += 1
          }
        }
      }
    }
    if (eobrun > 0) {
      while (k <= se) {
        val pos = off + ZigZag(k)
        if (c.coefs(pos) != 0) correct(pos)
        k += 1
      }
      eobrun - 1
    } else 0
  }

  /** Decode one progressive scan's entropy data; returns the byte
    * position the reader stopped at (the caller searches for the next
    * marker from there). */
  private def progressiveScan(b: Array[Byte], start: Int,
      scanComps: Array[Component], mcusX: Int, mcusY: Int,
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int): Int = {
    val br = new BitReader(b, start)
    var eobrun = 0
    var restarts = 0
    scanComps.foreach(_.pred = 0)
    try {
      if (ss == 0) {
        if (se != 0) throw new IllegalStateException("bad DC band")
        if (scanComps.length > 1) {
          // interleaved DC scan over the padded MCU grid
          val total = mcusX * mcusY
          var mcu = 0
          while (mcu < total) {
            if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
              br.restart(restarts % 8); restarts += 1
              scanComps.foreach(_.pred = 0); eobrun = 0
            }
            val mx = mcu % mcusX
            val my = mcu / mcusX
            scanComps.foreach { c =>
              var by = 0
              while (by < c.v) {
                var bx = 0
                while (bx < c.h) {
                  val bix = (my * c.v + by) * c.bw + (mx * c.h + bx)
                  dcUnit(br, c, bix * 64, ah, al)
                  bx += 1
                }
                by += 1
              }
            }
            mcu += 1
          }
        } else {
          val c = scanComps(0)
          val total = c.nbw * c.nbh
          var i = 0
          while (i < total) {
            if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
              br.restart(restarts % 8); restarts += 1; c.pred = 0
            }
            dcUnit(br, c, ((i / c.nbw) * c.bw + (i % c.nbw)) * 64, ah, al)
            i += 1
          }
        }
      } else {
        // AC scans are single-component by construction (T.81 B.2.3)
        if (scanComps.length != 1) throw new IllegalStateException("AC ns>1")
        val c = scanComps(0)
        val total = c.nbw * c.nbh
        var i = 0
        while (i < total) {
          if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
            br.restart(restarts % 8); restarts += 1; eobrun = 0
          }
          val off = ((i / c.nbw) * c.bw + (i % c.nbw)) * 64
          eobrun =
            if (ah == 0) acFirst(br, c, off, ss, se, al, eobrun)
            else acRefine(br, c, off, ss, se, al, eobrun)
          i += 1
        }
      }
    } catch {
      // a marker inside the scan = truncated scan; keep what decoded so
      // far (progressive refinement is safely partial by design)
      case _: MarkerHit => ()
    }
    br.pos
  }

  /** Byte length of ONE complete JPEG stream starting at `from` (SOI
    * through EOI inclusive) — the MJPEG splitter's segment walk
    * ([[VideoNeardup.decodeMjpeg]] consumes a container of raw
    * concatenated JPEG streams through this). Splitting needs each
    * stream's TRUE end: a bare FFD9 byte pattern may legally occur
    * inside a length-prefixed segment payload (APPn/COM carry arbitrary
    * bytes), so naive EOI scanning would cut streams short — the walk
    * instead skips marker segments by their declared lengths, and
    * crosses entropy-coded data the way [[nextMarker]] does (stuffed
    * FF00 and restart markers stay inside the scan; multi-scan
    * progressive streams just walk scan by scan). None when the stream
    * is structurally malformed or truncated — the codec-family
    * contract: callers drop, never throw. */
  def frameLength(b: Array[Byte], from: Int): Option[Int] = {
    try {
      var pos = from
      if (pos + 2 > b.length || (b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != 0xd8) return None
      pos += 2
      def seglen(): Int = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      while (pos + 2 <= b.length) {
        if ((b(pos) & 0xff) != 0xff) return None
        val m = b(pos + 1) & 0xff
        if (m == 0xd9) return Some(pos + 2 - from)
        else if (m == 0xff) pos += 1 // optional fill byte before a marker
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2
        else if (m == 0xd8 || m == 0x00) return None // nested SOI / bare stuffing
        else if (m == 0xda) {
          if (pos + 4 > b.length) return None
          pos += 2 + seglen() // SOS header by declared length
          pos = nextMarker(b, pos) // entropy data: FF00/RSTn stay inside
        } else {
          if (pos + 4 > b.length) return None
          pos += 2 + seglen()
        }
      }
      None
    } catch { case _: Exception => None }
  }

  /** Position of the next non-RST marker at or after `from`. */
  private def nextMarker(b: Array[Byte], from: Int): Int = {
    var p = math.max(from, 0)
    while (p + 1 < b.length) {
      if ((b(p) & 0xff) == 0xff) {
        val m = b(p + 1) & 0xff
        if (m == 0x00 || m == 0xff) p += (if (m == 0xff) 1 else 2)
        else if (m >= 0xd0 && m <= 0xd7) p += 2
        else return p
      } else p += 1
    }
    b.length
  }

  private def decodeInner(b: Array[Byte]): Option[BmpCodec.Decoded] = {
    val qt = new Array[Array[Int]](4)
    val dcH = new Array[Huff](4)
    val acH = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var adobeRgb = false
    var progressive = false
    var eoiSeen = false
    var pos = 2
    var sosAt = -1

    def u16(p: Int) = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

    while (sosAt < 0 && !eoiSeen) {
      if (pos + 2 > b.length) return None
      if ((b(pos) & 0xff) != 0xff) return None
      val marker = b(pos + 1) & 0xff
      // T.81 B.1.1.2: 0xFF fill bytes may pad between segments; TEM and
      // RSTn are standalone (no length field)
      if (marker == 0xff) { pos += 1 }
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2
      } else if (marker == 0xd9) {
        // EOI: terminates a progressive stream whose scans all ran;
        // before any scan data it is just a broken file
        if (progressive && comps != null && comps.exists(_.coefs != null))
          eoiSeen = true
        else return None
      } else {
      if (pos + 4 > b.length) return None
      val len = u16(pos + 2)
      val seg = pos + 4
      var nextPos = pos + 2 + len
      marker match {
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
          if ((b(seg) & 0xff) != 8) return None
          progressive = marker == 0xc2
          h = u16(seg + 1); w = u16(seg + 3)
          val nc = b(seg + 5) & 0xff
          val dimCap = if (progressive) 1 << 12 else 1 << 13
          if (w <= 0 || h <= 0 || w > dimCap || h > dimCap) return None
          if (nc != 1 && nc != 3) return None
          comps = Array.tabulate(nc) { i =>
            val o = seg + 6 + 3 * i
            Component(b(o) & 0xff, (b(o + 1) & 0xff) >> 4,
              b(o + 1) & 0x0f, b(o + 2) & 0xff)
          }
        case 0xee => // APP14 Adobe: transform byte 0 = components are RGB
          if (len >= 14 && new String(b, seg, 5, "US-ASCII") == "Adobe" &&
            (b(seg + 11) & 0xff) == 0) adobeRgb = true
        case 0xc1 | 0xc3 => return None // non-baseline sequential SOFs
        case 0xc4 => // DHT (possibly several tables)
          var p = seg
          while (p < seg + len - 2) {
            val tc = (b(p) & 0xff) >> 4
            val th = b(p) & 0x0f
            val counts = Array.tabulate(16)(i => b(p + 1 + i) & 0xff)
            val n = counts.sum
            val syms = Array.tabulate(n)(i => b(p + 17 + i) & 0xff)
            val tab = new Huff(counts, syms)
            if (tc == 0) dcH(th) = tab else acH(th) = tab
            p += 17 + n
          }
        case 0xdb => // DQT (possibly several tables)
          var p = seg
          while (p < seg + len - 2) {
            val pq = (b(p) & 0xff) >> 4
            val tq = b(p) & 0x0f
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(i) = if (pq == 0) b(p + 1 + i) & 0xff
                else u16(p + 1 + 2 * i)
              i += 1
            }
            qt(tq) = t
            p += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xdd => restartInterval = u16(seg)
        case 0xda => // SOS
          if (comps == null) return None
          val ns = b(seg) & 0xff
          val scanComps = new Array[Component](ns)
          var i = 0
          while (i < ns) {
            val cid = b(seg + 1 + 2 * i) & 0xff
            val tabs = b(seg + 2 + 2 * i) & 0xff
            val c = comps.find(_.id == cid).getOrElse(return None)
            c.dcTab = dcH((tabs >> 4) & 0x0f)
            c.acTab = acH(tabs & 0x0f)
            scanComps(i) = c
            i += 1
          }
          if (!progressive) {
            sosAt = seg + len - 2
          } else {
            val ss = b(seg + 1 + 2 * ns) & 0xff
            val se = b(seg + 2 + 2 * ns) & 0xff
            val ahal = b(seg + 3 + 2 * ns) & 0xff
            if (ss > 63 || se > 63 || se < ss) return None
            val hM = comps.map(_.h).max
            val vM = comps.map(_.v).max
            val mX = (w + 8 * hM - 1) / (8 * hM)
            val mY = (h + 8 * vM - 1) / (8 * vM)
            comps.foreach { c =>
              if (c.coefs == null) {
                c.bw = mX * c.h; c.bh = mY * c.v
                c.nbw = ((w * c.h + hM - 1) / hM + 7) / 8
                c.nbh = ((h * c.v + vM - 1) / vM + 7) / 8
                c.coefs = new Array[Int](c.bw * c.bh * 64)
              }
            }
            val stop = progressiveScan(b, seg + len - 2, scanComps, mX, mY,
              ss, se, ahal >> 4, ahal & 0x0f, restartInterval)
            nextPos = nextMarker(b, stop)
          }
        case _ => () // APPn/COM/etc: skip
      }
      pos = nextPos
      }
    }
    if (comps == null || comps.exists(c => qt(c.tq) == null)) return None
    if (!progressive && comps.exists(c =>
      c.dcTab == null || c.acTab == null)) return None
    // 3-component color must be YCbCr: Adobe transform=0 or R/G/B
    // component ids mean the planes are RGB and the 1.402/1.772 rotation
    // below would silently corrupt colors — reject instead
    if (comps.length == 3 && (adobeRgb ||
      comps.map(_.id).sameElements(Array('R'.toInt, 'G'.toInt, 'B'.toInt))))
      return None

    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * 8 * c.h
      c.planeH = mcusY * 8 * c.v
      c.plane = new Array[Byte](c.planeW * c.planeH)
    }

    if (progressive) {
      // all scans already accumulated into the coefficient buffers:
      // dequantize + IDCT every block of the padded grid into the planes
      val block = new Array[Int](64)
      val tmp = new Array[Double](64)
      comps.foreach { c =>
        val q = qt(c.tq)
        var gy = 0
        while (gy < c.bh) {
          var gx = 0
          while (gx < c.bw) {
            val off = (gy * c.bw + gx) * 64
            var n = 0
            while (n < 64) {
              block(n) = c.coefs(off + n) * q(ZigZagInv(n))
              n += 1
            }
            idct(block, tmp)
            val ox = gx * 8; val oy = gy * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                c.plane((oy + yy) * c.planeW + ox + xx) =
                  block(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            gx += 1
          }
          gy += 1
        }
      }
      return Some(finishImage(b, comps, w, h, hMax, vMax))
    }

    val br = new BitReader(b, sosAt)
    val block = new Array[Int](64)
    val idctTmp = new Array[Double](64)
    var mcu = 0
    var restarts = 0
    val totalMcus = mcusX * mcusY
    try {
      while (mcu < totalMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(restarts % 8)
          restarts += 1
          comps.foreach(_.pred = 0)
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        comps.foreach { c =>
          val q = qt(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              java.util.Arrays.fill(block, 0)
              // DC
              val t = c.dcTab.decode(br)
              c.pred += extend(br.bits(t), t)
              block(0) = c.pred * q(0)
              // AC
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = c.acTab.decode(br)
                val r = rs >> 4
                val s = rs & 0x0f
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += r
                  if (k > 63) throw new IllegalStateException("ac overflow")
                  block(ZigZag(k)) = extend(br.bits(s), s) * q(k)
                  k += 1
                }
              }
              idct(block, idctTmp)
              // place into the component plane
              val ox = (mx * c.h + bx) * 8
              val oy = (my * c.v + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx2 = 0
                while (xx2 < 8) {
                  c.plane((oy + yy) * c.planeW + ox + xx2) =
                    block(yy * 8 + xx2).toByte
                  xx2 += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
        }
        mcu += 1
      }
    } catch {
      case _: MarkerHit => if (mcu < totalMcus) return None
    }

    Some(finishImage(b, comps, w, h, hMax, vMax))
  }

  /** Upsample the component planes + color convert → BGR top-down
    * (shared by the baseline and progressive paths). */
  private def finishImage(b: Array[Byte], comps: Array[Component],
      w: Int, h: Int, hMax: Int, vMax: Int): BmpCodec.Decoded = {
    val bgr = new Array[Byte](w * h * 3)
    val gray = comps.length == 1
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        val o = (yy * w + xx) * 3
        if (gray) {
          val c0 = comps(0)
          val yv = c0.plane(
            (yy * c0.v / vMax) * c0.planeW + (xx * c0.h / hMax))
          bgr(o) = yv; bgr(o + 1) = yv; bgr(o + 2) = yv
        } else {
          def sample(c: Component): Int =
            c.plane((yy * c.v / vMax) * c.planeW + (xx * c.h / hMax)) & 0xff
          val yv = sample(comps(0)).toDouble
          val cb = sample(comps(1)) - 128.0
          val cr = sample(comps(2)) - 128.0
          bgr(o) = clampD(yv + 1.772 * cb) // B
          bgr(o + 1) = clampD(yv - 0.344136 * cb - 0.714136 * cr) // G
          bgr(o + 2) = clampD(yv + 1.402 * cr) // R
        }
        xx += 1
      }
      yy += 1
    }
    BmpCodec.Decoded(w, h, bgr)
  }

  @inline private def clampD(v: Double): Byte = {
    val r = math.round(v).toInt
    (if (r < 0) 0 else if (r > 255) 255 else r).toByte
  }

  // -------------------------------------------------------------- encoder
  //
  // Baseline sequential encoder: 4:4:4 (no subsampling), one interleaved
  // scan, ITU T.81 Annex K quantization + Huffman tables (quant tables
  // quality-scaled the conventional way). Pinned in the spec both ways:
  // our decoder and ImageIO must read the produced bytes back within a
  // small tolerance of the source pixels.

  /** T.81 Table K.1/K.2 base quantization tables (row-major). */
  private val StdLumaQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val StdChromaQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** T.81 Annex K Huffman specs: (BITS counts per code length 1..16,
    * HUFFVAL symbol list). */
  private val DcLumaSpec: (Array[Int], Array[Int]) =
    (Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
      (0 to 11).toArray)
  private val DcChromaSpec: (Array[Int], Array[Int]) =
    (Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
      (0 to 11).toArray)
  private val AcLumaSpec: (Array[Int], Array[Int]) =
    (Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d),
      Array(
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
        0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
        0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
        0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
        0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
        0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
  private val AcChromaSpec: (Array[Int], Array[Int]) =
    (Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
      Array(
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
        0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
        0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
        0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
        0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
        0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
        0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
        0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))

  /** Canonical Huffman code assignment from a (BITS, HUFFVAL) spec —
    * the encoder-side inverse of [[Huff]]. */
  private final class HuffEnc(spec: (Array[Int], Array[Int])) {
    val codes = new Array[Int](256)
    val sizes = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        var i = 0
        while (i < spec._1(len - 1)) {
          codes(spec._2(k)) = code
          sizes(spec._2(k)) = len
          code += 1; k += 1; i += 1
        }
        code <<= 1
      }
    }
  }
  private lazy val DcLumaEnc = new HuffEnc(DcLumaSpec)
  private lazy val DcChromaEnc = new HuffEnc(DcChromaSpec)
  private lazy val AcLumaEnc = new HuffEnc(AcLumaSpec)
  private lazy val AcChromaEnc = new HuffEnc(AcChromaSpec)

  /** MSB-first bit emitter with the mandatory 0xFF 0x00 byte stuffing. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        val b = ((acc >> (n - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00)
        n -= 8
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (n > 0) put(0x7f, 8 - n)
  }

  /** Magnitude category of a coefficient (number of bits to code it). */
  @inline private def category(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Forward 8×8 DCT (separable float reference form) + quantization +
    * zigzag, the exact inverse composition of [[idct]]: input block holds
    * level-shifted samples, output is zigzag-ordered quantized coeffs. */
  private def fdctQuant(in: Array[Double], tmp: Array[Double],
      q: Array[Int], out: Array[Int]): Unit = {
    // rows: tmp(y,u) = Σ_x in(y,x) cos((2x+1)uπ/16)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += in(y * 8 + x) * Cos(x)(u); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    // cols + scale + quantize: F(u,v) = C(u)C(v)/4 Σ_y tmp(y,u) cos(...)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Cos(yy)(v); yy += 1 }
        val f = s * IdctScale(u) * IdctScale(v) / 4.0
        val qi = q(v * 8 + u)
        out(ZigZagInv(v * 8 + u)) = math.round(f / qi).toInt
        u += 1
      }
      v += 1
    }
  }

  /** Zigzag position for each natural index, precomputed (the decoder's
    * [[ZigZag]] maps zigzag→natural; this is its inverse). */
  private lazy val ZigZagInv: Array[Int] = {
    val inv = new Array[Int](64)
    for (i <- 0 until 64) inv(ZigZag(i)) = i
    inv
  }

  /** Quality-scaled quantization table (libjpeg convention). */
  private def scaledQ(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  /** Encode BGR top-down pixels as a baseline sequential 4:4:4 JFIF
    * JPEG. Output decodes in this file's [[decode]], ImageIO, and any
    * T.81 baseline decoder. */
  def encode(img: BmpCodec.Decoded, quality: Int = 90): Array[Byte] = {
    val w = img.width; val h = img.height
    require(w > 0 && h > 0, "jpeg encode: empty image")
    val lq = scaledQ(StdLumaQ, quality)
    val cq = scaledQ(StdChromaQ, quality)
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    // APP0/JFIF 1.1, no thumbnail
    marker(0xe0); u16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0 (luma), table 1 (chroma), zigzag order
    for ((tbl, id) <- Seq((lq, 0), (cq, 1))) {
      marker(0xdb); u16(67); u8(id)
      for (i <- 0 until 64) u8(tbl(ZigZag(i)))
    }
    // SOF0: 8-bit, 3 components, all 1×1 sampling (4:4:4)
    marker(0xc0); u16(8 + 3 * 3); u8(8); u16(h); u16(w); u8(3)
    u8(1); u8(0x11); u8(0) // Y → quant table 0
    u8(2); u8(0x11); u8(1) // Cb → quant table 1
    u8(3); u8(0x11); u8(1) // Cr
    // DHT ×4 (Annex K)
    for ((spec, cls, id) <- Seq((DcLumaSpec, 0, 0), (AcLumaSpec, 1, 0),
      (DcChromaSpec, 0, 1), (AcChromaSpec, 1, 1))) {
      marker(0xc4); u16(2 + 1 + 16 + spec._2.length)
      u8((cls << 4) | id)
      spec._1.foreach(u8)
      spec._2.foreach(u8)
    }
    // SOS
    marker(0xda); u16(6 + 2 * 3); u8(3)
    u8(1); u8(0x00) // Y: DC table 0, AC table 0
    u8(2); u8(0x11) // Cb: DC table 1, AC table 1
    u8(3); u8(0x11)
    u8(0); u8(63); u8(0) // full spectral selection, no approximation

    val bw = new BitWriter(out)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    val coefs = new Array[Int](64)
    val pred = new Array[Int](3)

    def emitBlock(dcEnc: HuffEnc, acEnc: HuffEnc, comp: Int): Unit = {
      val diff = coefs(0) - pred(comp)
      pred(comp) = coefs(0)
      val s = category(diff)
      bw.put(dcEnc.codes(s), dcEnc.sizes(s))
      if (s > 0)
        bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      var run = 0
      var i = 1
      while (i < 64) {
        val c = coefs(i)
        if (c == 0) run += 1
        else {
          while (run >= 16) {
            bw.put(acEnc.codes(0xf0), acEnc.sizes(0xf0)); run -= 16
          }
          val cs = category(c)
          val sym = (run << 4) | cs
          bw.put(acEnc.codes(sym), acEnc.sizes(sym))
          bw.put(if (c < 0) c + (1 << cs) - 1 else c, cs)
          run = 0
        }
        i += 1
      }
      if (run > 0) bw.put(acEnc.codes(0x00), acEnc.sizes(0x00)) // EOB
    }

    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // gather the 8×8 tile once, converting BGR → YCbCr (BT.601 JFIF);
        // edge MCUs replicate the last row/column (standard practice —
        // keeps gradients flat across the pad, minimizing ringing)
        var comp = 0
        while (comp < 3) {
          var yy = 0
          while (yy < 8) {
            val sy = math.min(h - 1, my * 8 + yy)
            var xx = 0
            while (xx < 8) {
              val sx = math.min(w - 1, mx * 8 + xx)
              val p = (sy * w + sx) * 3
              val bb = img.bgr(p) & 0xff
              val gg = img.bgr(p + 1) & 0xff
              val rr = img.bgr(p + 2) & 0xff
              val v = comp match {
                case 0 => 0.299 * rr + 0.587 * gg + 0.114 * bb
                case 1 => 128.0 - 0.168736 * rr - 0.331264 * gg + 0.5 * bb
                case _ => 128.0 + 0.5 * rr - 0.418688 * gg - 0.081312 * bb
              }
              block(yy * 8 + xx) = v - 128.0
              xx += 1
            }
            yy += 1
          }
          fdctQuant(block, tmp, if (comp == 0) lq else cq, coefs)
          if (comp == 0) emitBlock(DcLumaEnc, AcLumaEnc, 0)
          else emitBlock(DcChromaEnc, AcChromaEnc, comp)
          comp += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
