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
}
