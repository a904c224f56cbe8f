package graft.multimodal

/** Third REAL codec arm: baseline sequential JPEG (ITU T.81) decode with
  * pure JVM arithmetic — marker parse, canonical Huffman entropy decode
  * (with byte-stuffing and restart markers), dequantization, inverse
  * zigzag, separable float IDCT, chroma upsampling (any h/v sampling
  * factors incl. 4:2:0), JFIF full-range YCbCr→RGB.
  *
  * Scope: 8-bit baseline DCT (SOF0), 1 or 3 components, no progressive
  * (SOF2) or arithmetic coding — the profile virtually every
  * camera/web JPEG encoder emits. Unsupported profiles return None and
  * fall through [[Multimodal]]'s dispatch.
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
  }

  def decode(b: Array[Byte]): Option[BmpCodec.Decoded] = {
    if (!isJpeg(b)) return None
    try decodeInner(b)
    catch { case _: Exception => None }
  }

  private def decodeInner(b: Array[Byte]): Option[BmpCodec.Decoded] = {
    val qt = new Array[Array[Int]](4)
    val dcH = new Array[Huff](4)
    val acH = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var adobeRgb = false
    var pos = 2
    var sosAt = -1

    def u16(p: Int) = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

    while (sosAt < 0) {
      if (pos + 2 > b.length) return None
      if ((b(pos) & 0xff) != 0xff) return None
      val marker = b(pos + 1) & 0xff
      // T.81 B.1.1.2: 0xFF fill bytes may pad between segments; TEM and
      // RSTn are standalone (no length field)
      if (marker == 0xff) { pos += 1 }
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2
      } else {
      if (pos + 4 > b.length) return None
      val len = u16(pos + 2)
      val seg = pos + 4
      marker match {
        case 0xc0 => // SOF0 baseline
          if ((b(seg) & 0xff) != 8) return None
          h = u16(seg + 1); w = u16(seg + 3)
          val nc = b(seg + 5) & 0xff
          if (w <= 0 || h <= 0 || w > (1 << 13) || h > (1 << 13)) return None
          if (nc != 1 && nc != 3) return None
          comps = Array.tabulate(nc) { i =>
            val o = seg + 6 + 3 * i
            Component(b(o) & 0xff, (b(o + 1) & 0xff) >> 4,
              b(o + 1) & 0x0f, b(o + 2) & 0xff)
          }
        case 0xee => // APP14 Adobe: transform byte 0 = components are RGB
          if (len >= 14 && new String(b, seg, 5, "US-ASCII") == "Adobe" &&
            (b(seg + 11) & 0xff) == 0) adobeRgb = true
        case 0xc2 | 0xc1 | 0xc3 => return None // non-baseline SOF
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
          val ns = b(seg) & 0xff
          var i = 0
          while (i < ns) {
            val cid = b(seg + 1 + 2 * i) & 0xff
            val tabs = b(seg + 2 + 2 * i) & 0xff
            val c = comps.find(_.id == cid).getOrElse(return None)
            c.dcTab = dcH((tabs >> 4) & 0x0f)
            c.acTab = acH(tabs & 0x0f)
            i += 1
          }
          sosAt = seg + len - 2
        case 0xd9 => return None // EOI before SOS
        case _ => () // APPn/COM/etc: skip
      }
      pos += 2 + len
      }
    }
    if (comps == null || comps.exists(c => c.dcTab == null ||
      c.acTab == null || qt(c.tq) == null)) return None
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

    // upsample + color convert → BGR top-down
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
    Some(BmpCodec.Decoded(w, h, bgr))
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
