package graft.multimodal

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The real-codec arm of the multimodal seam: BMP encode/decode round
  * trips (including row padding for widths not divisible by 4), mean
  * color, resize, and the end-to-end path binaryFile-ingest → distributed
  * decode → feature rows. */
class BmpCodecSpec extends SparkTestBase {

  /** Solid-color image, BGR. */
  private def solid(w: Int, h: Int, r: Int, g: Int, b: Int)
      : BmpCodec.Decoded = {
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      px(i) = b.toByte; px(i + 1) = g.toByte; px(i + 2) = r.toByte
      i += 3
    }
    BmpCodec.Decoded(w, h, px)
  }

  test("encode→decode round trip preserves pixels (padded odd width)") {
    // w=3 → row 9 bytes padded to 12; gradient so row order errors show
    val w = 3; val h = 5
    val px = Array.tabulate(w * h * 3)(i => (i * 7 % 251).toByte)
    val img = BmpCodec.Decoded(w, h, px)
    val back = BmpCodec.decode(BmpCodec.encode(img)).get
    assert(back.width === w && back.height === h)
    assert(back.bgr.toSeq === px.toSeq)
  }

  test("decode rejects non-BMP and unsupported payloads") {
    assert(BmpCodec.decode("just text".getBytes).isEmpty)
    assert(BmpCodec.decode(Array[Byte]('B', 'M', 1, 2)).isEmpty)
    // truncated: valid header claiming more data than present
    val enc = BmpCodec.encode(solid(10, 10, 1, 2, 3))
    assert(BmpCodec.decode(enc.take(80)).isEmpty)
    // crafted header whose width*3 overflows Int: must be None, not a crash
    val evil = BmpCodec.encode(solid(2, 2, 0, 0, 0)).clone()
    evil(18) = 0x00; evil(19) = 0x00; evil(20) = 0x00; evil(21) = 0x40 // w=2^30
    assert(BmpCodec.decode(evil).isEmpty)
    // dimensions over the sanity bound are rejected too
    val big = BmpCodec.encode(solid(2, 2, 0, 0, 0)).clone()
    big(18) = 0x00; big(19) = 0x00; big(20) = 0x20; big(21) = 0x00 // w=2^21
    assert(BmpCodec.decode(big).isEmpty)
  }

  test("mean color and grayscale thumbnail are exact on solid images") {
    val img = solid(16, 8, 255, 0, 0) // pure red
    val (r, g, b) = BmpCodec.meanColor(img)
    assert(r === 1.0 && g === 0.0 && b === 0.0)
    val thumb = BmpCodec.grayThumb(img, 4)
    assert(thumb.length === 16)
    thumb.foreach(v => assert(math.abs(v - 0.299f) < 1e-3))
  }

  test("nearest-neighbor resize halves dimensions and keeps solid color") {
    val img = solid(8, 4, 10, 20, 30)
    val small = BmpCodec.resizeNearest(img, 4, 2)
    assert(small.width === 4 && small.height === 2)
    assert(small.bgr.grouped(3).map(_.toSeq).toSeq.distinct.length === 1)
    assert((small.bgr(2) & 0xff) === 10)
  }

  test("binaryFile ingest → distributed decode → feature rows, non-BMP skipped") {
    val dir = Files.createTempDirectory("bmps")
    Files.write(dir.resolve("red.bmp"),
      BmpCodec.encode(solid(12, 6, 255, 0, 0)))
    Files.write(dir.resolve("green.bmp"),
      BmpCodec.encode(solid(5, 7, 0, 255, 0)))
    Files.write(dir.resolve("noise.bmp"), "not really a bmp".getBytes)

    val assets = Multimodal.assetsFromDir(spark, dir.toString, "*.bmp")
    val infos = Multimodal.decodeImages(assets, spark).collect()
    assert(infos.length === 2) // noise.bmp decodes to None → skipped
    val byDims = infos.map(i => (i.width, i.height) -> i).toMap
    assert(math.abs(byDims((12, 6)).mean_r - 1.0) < 1e-9)
    assert(math.abs(byDims((5, 7)).mean_g - 1.0) < 1e-9)
    infos.foreach(i => assert(i.thumb.length ===
      Multimodal.ThumbSize * Multimodal.ThumbSize))

    // distributed resize re-encodes valid BMPs
    val resized = Multimodal.resizeImages(assets, spark, 4, 4).collect()
    assert(resized.length === 2)
    resized.foreach { a =>
      val d = BmpCodec.decode(a.media).get
      assert(d.width === 4 && d.height === 4)
      assert(a.n_bytes === a.media.length.toLong)
    }
  }

  test("image thumb features feed the similarity surface (cosine on thumbs)") {
    import graft.functions.VectorFunctions
    val a = BmpCodec.grayThumb(solid(16, 16, 200, 10, 10), 8)
    val b = BmpCodec.grayThumb(solid(16, 16, 201, 10, 10), 8)
    val c = BmpCodec.grayThumb(solid(16, 16, 0, 0, 255), 8)
    import spark.implicits._
    val df = Seq(("a", a.map(_.toDouble)), ("b", b.map(_.toDouble)),
      ("c", c.map(_.toDouble))).toDF("id", "v")
    val sims = df.as("x").crossJoin(df.as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id"),
        VectorFunctions.cosine(col("x.v"), col("y.v")).as("sim"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    // solid images: cosine of constant vectors is exactly 1 for any pair;
    // near-dup detection on real images separates on the thumb pattern, so
    // just assert the plumbing computes sane similarities
    assert(sims.values.forall(s => s > 0.99))
  }
}
