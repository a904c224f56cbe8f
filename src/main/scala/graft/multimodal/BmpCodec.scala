package graft.multimodal

/** A REAL (if narrow) image codec for the multimodal seam: uncompressed
  * 24-bit BMP (BITMAPINFOHEADER), decoded with pure byte arithmetic — no
  * external libraries, so it runs in this container and in any executor.
  * Handles bottom-up and top-down row order and 4-byte row padding.
  *
  * This is the proof that the codec seam is real: [[Multimodal]] dispatches
  * BMP payloads here and everything else to the documented stub, behind one
  * `Array[Byte] => …` signature that a JNI/ffmpeg/JPEG decoder would slot
  * into unchanged.
  */
object BmpCodec {

  /** Decoded image: BGR row-major, top-down, 3 bytes/pixel. */
  final case class Decoded(width: Int, height: Int, bgr: Array[Byte])

  def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length > 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  @inline private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  @inline private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** None for non-BMP payloads or unsupported variants (compressed, non-24
    * bpp) — callers route those to the fallback codec. */
  def decode(b: Array[Byte]): Option[Decoded] = {
    if (!isBmp(b)) return None
    val off = le32(b, 10)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val bpp = le16(b, 28)
    val comp = le32(b, 30)
    if (bpp != 24 || comp != 0 || w <= 0 || hRaw == 0) return None
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    // crafted headers can claim dimensions whose products overflow Int and
    // turn the bounds check into a pass followed by a crash — validate in
    // Long arithmetic and bound the decoded size before any allocation
    if (w > (1 << 20) || h > (1 << 20)) return None
    val rowSize = ((w.toLong * 3 + 3) / 4) * 4
    val pixelBytes = w.toLong * h * 3
    if (off < 54 || pixelBytes > Int.MaxValue ||
      off.toLong + rowSize * h > b.length) return None
    val out = new Array[Byte](pixelBytes.toInt)
    val rowSizeI = rowSize.toInt // validated above: fits comfortably in Int
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      System.arraycopy(b, off + srcRow * rowSizeI, out, y * w * 3, w * 3)
      y += 1
    }
    Some(Decoded(w, h, out))
  }

  /** Encode as a standard bottom-up 24-bit BMP with padded rows. */
  def encode(img: Decoded): Array[Byte] = {
    val rowSize = ((img.width * 3 + 3) / 4) * 4
    val dataSize = rowSize * img.height
    val fileSize = 54 + dataSize
    val b = new Array[Byte](fileSize)
    def put32(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    }
    b(0) = 'B'.toByte; b(1) = 'M'.toByte
    put32(2, fileSize); put32(10, 54)
    put32(14, 40); put32(18, img.width); put32(22, img.height)
    put16(26, 1); put16(28, 24); put32(30, 0); put32(34, dataSize)
    var y = 0
    while (y < img.height) {
      val dstRow = img.height - 1 - y // bottom-up
      System.arraycopy(img.bgr, y * img.width * 3,
        b, 54 + dstRow * rowSize, img.width * 3)
      y += 1
    }
    b
  }

  /** Per-channel means in [0,1], RGB order. */
  def meanColor(img: Decoded): (Double, Double, Double) = {
    var sb = 0L; var sg = 0L; var sr = 0L
    var i = 0
    while (i < img.bgr.length) {
      sb += img.bgr(i) & 0xff
      sg += img.bgr(i + 1) & 0xff
      sr += img.bgr(i + 2) & 0xff
      i += 3
    }
    val n = (img.width.toLong * img.height) * 255.0
    (sr / n, sg / n, sb / n)
  }

  /** Nearest-neighbor resize — the distributed-thumbnail primitive. */
  def resizeNearest(img: Decoded, w2: Int, h2: Int): Decoded = {
    require(w2 > 0 && h2 > 0)
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * img.height / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * img.width / w2).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * w2 + x) * 3
        out(d) = img.bgr(s); out(d + 1) = img.bgr(s + 1); out(d + 2) = img.bgr(s + 2)
        x += 1
      }
      y += 1
    }
    Decoded(w2, h2, out)
  }

  /** k×k grayscale grid in [0,1] (nearest-neighbor sampled) — the
    * fixed-length embedding-ish feature for similarity/dedup over images. */
  def grayThumb(img: Decoded, k: Int): Array[Float] = {
    val small = resizeNearest(img, k, k)
    val f = new Array[Float](k * k)
    var i = 0
    while (i < k * k) {
      val b = small.bgr(i * 3) & 0xff
      val g = small.bgr(i * 3 + 1) & 0xff
      val r = small.bgr(i * 3 + 2) & 0xff
      // ITU-R BT.601 luma
      f(i) = ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat
      i += 1
    }
    f
  }
}
