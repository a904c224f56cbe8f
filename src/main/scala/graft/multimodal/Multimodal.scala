package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tables

/** Multimodal-column plumbing: opaque `binary` media columns with typed
  * metadata, plus the decode / feature-extract / frame-sample operator
  * shapes a training-data pipeline needs.
  *
  * The Spark-side mechanics here are real and tested — schema, partitioning,
  * per-partition batch processing. The codec seam has THREE real arms
  * behind magic-byte dispatch — [[BmpCodec]] (pure-JVM 24-bit BMP,
  * decode+encode), [[PngCodec]] (pure-JVM PNG, decode+encode), and
  * [[JpegCodec]] (pure-JVM baseline JPEG, decode) — with the
  * clearly-marked deterministic [[StubCodec]] covering everything else
  * (audio/video containers need libraries this container doesn't have; at
  * 100 TB the codec is a pluggable leaf anyway — an ffmpeg/JNI decoder
  * adds a dispatch arm behind the same signature).
  *
  * Ingestion paths: `spark.read.format("binaryFile")` for real asset dirs;
  * here the `documents` table stands in, with each text's UTF-8 bytes as the
  * media payload — deterministic, so metadata/checksum results are
  * oracle-checkable in DuckDB.
  */
object Multimodal {

  /** Typed asset row: opaque payload + metadata columns. */
  final case class Asset(asset_id: Long, media: Array[Byte], mime: String,
      n_bytes: Long)

  /** Fixed-size fake "decoded frame" feature. */
  final case class AssetFeature(asset_id: Long, n_bytes: Long,
      feature: Array[Float])

  /** Real-asset ingestion path: a directory of media files via Spark's
    * binaryFile source — (path, modificationTime, length, content) with
    * content as the opaque binary column; normalized into the same Asset
    * schema as [[assets]], so everything downstream (metadata pass, codec,
    * frame sampling) is source-agnostic. `pathGlobFilter` prunes by
    * extension at listing time — no bytes read for skipped files. */
  def assetsFromDir(s: SparkSession, dir: String, glob: String = "*")
      : DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        abs(xxhash64(col("path"))).as("asset_id"),
        col("content").as("media"),
        lit("application/octet-stream").as("mime"),
        col("length").as("n_bytes"),
        col("path"))

  /** Build an asset table from a documents frame: media = UTF-8 bytes of
    * text. Partitioned by asset_id so downstream per-asset work is
    * co-located. */
  def assetsFrom(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("mime"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  def assets(s: SparkSession, d: String): DataFrame =
    assetsFrom(Tables.documents(s, d))

  /** ASCII-scoped variant for the byte-exact oracle: frame slicing is
    * byte-based, but SQL engines slice characters — restricting to docs
    * where octet_length == char length makes the two provably identical
    * (the oracle applies the same predicate). */
  def sampleFramesAscii(s: SparkSession, d: String): DataFrame =
    sampleFramesDf(assetsFrom(Tables.documents(s, d)
      .filter(octet_length(encode(col("text"), "UTF-8")) ===
        length(col("text"))))) 

  /** Metadata + checksum extraction — pure column expressions, no decode:
    * the "cheap pass" that runs over all 100 TB before any codec work. */
  def metadata(s: SparkSession, d: String): DataFrame =
    assets(s, d).select(
      col("asset_id"), col("mime"), col("n_bytes"),
      md5(col("media")).as("checksum"))

  /** The codec seam. Deterministic stand-in for a real image/audio decoder:
    * derives a fixed-length feature from payload bytes. Swap for a real
    * codec (JNI/ffmpeg) behind the same `Array[Byte] => Array[Float]`
    * signature; everything around it (partitioning, batching, schema) stays
    * unchanged. */
  object StubCodec {
    val FeatureDim = 8
    def decodeFeature(media: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < media.length) {
        f(i % FeatureDim) += (media(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }
  }

  /** Feature extraction over partition-local batches: `mapPartitions` over
    * the typed Dataset — the Scala analog of `mapInPandas` (one iterator per
    * partition, codec amortized across the batch, no per-row UDF overhead).
    * Repartitions by asset_id first so work is evenly spread and co-located
    * for downstream joins. */
  def extractFeatures(s: SparkSession, d: String): Dataset[AssetFeature] = {
    import s.implicits._
    assets(s, d)
      .repartition(col("asset_id"))
      .as[Asset]
      .mapPartitions { it =>
        it.map { a =>
          AssetFeature(a.asset_id, a.n_bytes,
            StubCodec.decodeFeature(a.media))
        }
      }
  }

  /** Decoded-image row: dimensions, mean color, fixed-length grayscale
    * thumbnail feature. */
  final case class ImageInfo(asset_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, thumb: Array[Float])

  /** REAL decode path: magic-byte dispatch over the codec arms — BMP
    * through [[BmpCodec]], PNG through [[PngCodec]], baseline JPEG
    * through [[JpegCodec]] (all pure-JVM), everything else is skipped —
    * same mapPartitions batch shape as [[extractFeatures]], so an
    * ffmpeg/JNI decoder composes in by adding a dispatch arm. ThumbSize²
    * grayscale grid is the image-space feature for downstream
    * similarity/dedup (see Similarity — the thumb is an embedding column
    * like any other). */
  val ThumbSize = 8

  /** One decoded representation (BGR top-down) behind all codec arms. */
  def decodeAny(media: Array[Byte]): Option[BmpCodec.Decoded] =
    if (BmpCodec.isBmp(media)) BmpCodec.decode(media)
    else if (PngCodec.isPng(media)) PngCodec.decode(media)
    else if (JpegCodec.isJpeg(media)) JpegCodec.decode(media)
    else if (GifCodec.isGif(media)) GifCodec.decode(media)
    else None

  def decodeImages(assetsDf: DataFrame, s: SparkSession)
      : Dataset[ImageInfo] = {
    import s.implicits._
    assetsDf.select(col("asset_id"), col("media"))
      .repartition(col("asset_id"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, media) =>
          decodeAny(media).map { img =>
            val (r, g, b) = BmpCodec.meanColor(img)
            ImageInfo(id, img.width, img.height, r, g, b,
              BmpCodec.grayThumb(img, ThumbSize))
          }
        }
      }
  }

  /** Distributed thumbnailing: decode → nearest-neighbor resize → re-encode,
    * emitting a new asset table of valid image payloads in the SOURCE
    * format (the "resize a billion images" job). Pure map work — scales
    * with input splits. */
  def resizeImages(assetsDf: DataFrame, s: SparkSession, w: Int, h: Int)
      : Dataset[Asset] = {
    import s.implicits._
    assetsDf.select(col("asset_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, media) =>
          // every format round-trips in kind: BMP/PNG losslessly, JPEG
          // through the baseline encoder (lossy, like any JPEG resize)
          val isBmp = BmpCodec.isBmp(media)
          val isJpg = JpegCodec.isJpeg(media)
          val isGif = GifCodec.isGif(media)
          decodeAny(media).map { img =>
            val small = BmpCodec.resizeNearest(img, w, h)
            val out =
              if (isBmp) BmpCodec.encode(small)
              else if (isJpg) JpegCodec.encode(small)
              else if (isGif) GifCodec.encode(small)
              else PngCodec.encode(small)
            val mime =
              if (isBmp) "image/bmp"
              else if (isJpg) "image/jpeg"
              else if (isGif) "image/gif" else "image/png"
            Asset(id, out, mime, out.length.toLong)
          }
        }
      }
  }

  /** The deterministic image fixture behind q158's battery AND
    * roundtrip: a 16×12 BGR tile md5-seeded from the asset bytes,
    * encoded through the arm picked by asset_id % 4. ONE definition on
    * purpose — the DuckDB oracles are hand-derived from these exact
    * formulas, so a fork between the two queries (they were verbatim
    * copies before) would silently diverge a query from its oracle.
    * Returns (decoded image, encoded bytes, mime, lossless-arm). */
  private[multimodal] def imageFixture(id: Long, media: Array[Byte])
      : (BmpCodec.Decoded, Array[Byte], String, Boolean) = {
    val w = 16; val h = 12
    val seed = java.security.MessageDigest.getInstance("MD5")
      .digest(media)
    val bgr = Array.tabulate(w * h * 3) { i =>
      (seed(i % 16) + i * 31).toByte
    }
    val img = BmpCodec.Decoded(w, h, bgr)
    val (bytes, mime, lossless) = (id % 4) match {
      case 0 => (BmpCodec.encode(img), "image/bmp", true)
      case 1 => (PngCodec.encode(img), "image/png", true)
      case 2 => (JpegCodec.encode(img), "image/jpeg", false)
      case _ => (GifCodec.encode(img), "image/gif", true)
    }
    (img, bytes, mime, lossless)
  }

  /** Same single-definition rule for q164's PCM16 WAV fixture:
    * md5-seeded samples, rate/channels derived from asset_id. */
  private[multimodal] def wavFixture(id: Long, media: Array[Byte])
      : WavCodec.Wav = {
    val seed = java.security.MessageDigest.getInstance("MD5")
      .digest(media)
    val ch = 1 + (id % 2).toInt
    val rate = 8000 * (1 + (id % 3).toInt)
    val samples = Array.tabulate(400 * ch) { i =>
      ((seed(i % 16) * 191 + i * 37) % 32768).toShort
    }
    WavCodec.Wav(rate, ch, samples)
  }

  /** All four codec arms driven end-to-end as ONE driver-contract query:
    * every document renders through [[imageFixture]] (deterministic
    * 16×12 tile, arm picked by doc_id % 4: BMP / PNG / baseline JPEG /
    * GIF) and the batch decodes back through the magic-byte dispatch
    * into per-format decode stats. Per-codec correctness lives in the
    * ImageIO-pinned specs — this query is the DISTRIBUTED plumbing
    * proof: encode and decode are per-partition map work over asset
    * rows, no driver involvement. */
  def codecBattery(assetsDf: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    val decoded = assetsDf.select(col("asset_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, media) =>
          val (_, bytes, mime, _) = imageFixture(id, media)
          decodeAny(bytes).map { back =>
            val (r, g, b) = BmpCodec.meanColor(back)
            (mime, bytes.length, back.width, back.height, r, g, b)
          }
        }
      }
      .toDF("mime", "n_bytes", "w", "h", "mean_r", "mean_g", "mean_b")
    decoded.groupBy(col("mime"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("n_bytes")), 2).as("avg_bytes"),
        max(col("w")).as("w"), max(col("h")).as("h"),
        round(avg(col("mean_r")), 2).as("avg_r"))
  }

  /** Driver-checkable form of [[codecBattery]] (q158): per-mime counts
    * (oracle-reproducible — the mime is a pure function of asset_id % 4
    * over the documents table), fixed dimensions, and the round-trip
    * contract collapsed to a boolean the driver can hash. BMP/PNG/GIF
    * are lossless for this fixture (192 pixels ≤ the 256-entry GIF
    * palette), so ok means byte-exact BGR recovery; JPEG is lossy, so
    * ok means exact dimensions + mean color within a generous-but-fixed
    * tolerance. All checks are deterministic (md5-seeded pixels), so a
    * codec regression flips the boolean and fails the driver gate. */
  def codecRoundtrip(assetsDf: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    val checked = assetsDf.select(col("asset_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, media) =>
          val (img, bytes, mime, lossless) = imageFixture(id, media)
          val ok = decodeAny(bytes).exists { back =>
            val dims = back.width == img.width && back.height == img.height
            if (lossless) dims && java.util.Arrays.equals(back.bgr, img.bgr)
            else {
              val (r0, g0, b0) = BmpCodec.meanColor(img)
              val (r1, g1, b1) = BmpCodec.meanColor(back)
              dims && math.abs(r1 - r0) <= 32 &&
                math.abs(g1 - g0) <= 32 && math.abs(b1 - b0) <= 32
            }
          }
          (mime, ok)
        }
      }
      .toDF("mime", "ok")
    checked.groupBy(col("mime"))
      .agg(count(lit(1)).as("n"), bool_and(col("ok")).as("roundtrip_ok"))
      .select(col("mime"), col("n"), lit(16).as("w"), lit(12).as("h"),
        col("roundtrip_ok"))
  }

  /** Audio arm driven as a contract query: every document renders to a
    * deterministic PCM16 WAV (md5-seeded samples; rate and channel count
    * vary by id), encodes, decodes back, and reports per-(rate, channels)
    * duration/amplitude stats. Rows-only (no SQL engine parses RIFF);
    * WavCodec itself is javax.sound-pinned in its spec. Same distributed
    * shape as [[codecBattery]]: encode/decode are per-partition map work. */
  def audioBattery(assetsDf: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    assetsDf.select(col("asset_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, media) =>
          val bytes = WavCodec.encode(wavFixture(id, media))
          WavCodec.decode(bytes).map { w =>
            (w.sampleRate, w.channels, w.nFrames,
              math.round(w.durationMs * 1000) / 1000.0,
              math.round(w.rms * 100) / 100.0)
          }
        }
      }
      .toDF("rate", "channels", "n_frames", "dur_ms", "rms")
      .groupBy(col("rate"), col("channels"))
      .agg(count(lit(1)).as("n"), max(col("n_frames")).as("n_frames"),
        round(avg(col("dur_ms")), 3).as("avg_dur_ms"),
        round(avg(col("rms")), 2).as("avg_rms"))
  }

  /** Driver-checkable form of [[audioBattery]] (q164): rate/channel mix,
    * counts, frame count and duration are all pure arithmetic on
    * asset_id over the documents table (oracle-reproducible), and the
    * PCM16 WAV round trip — decode(encode(w)) returns the identical
    * rate, channel count and sample array — collapses to a boolean.
    * WAV is lossless by construction, so any false here is a codec
    * regression the driver gate now catches. */
  def audioRoundtrip(assetsDf: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    assetsDf.select(col("asset_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, media) =>
          val w = wavFixture(id, media)
          val ok = WavCodec.decode(WavCodec.encode(w)).exists { back =>
            back.sampleRate == w.sampleRate &&
              back.channels == w.channels &&
              java.util.Arrays.equals(back.samples, w.samples)
          }
          (w.sampleRate, w.channels, w.nFrames,
            math.round(w.durationMs * 1000) / 1000.0, ok)
        }
      }
      .toDF("rate", "channels", "n_frames", "dur_ms", "ok")
      .groupBy(col("rate"), col("channels"))
      .agg(count(lit(1)).as("n"), max(col("n_frames")).as("n_frames"),
        round(avg(col("dur_ms")), 3).as("avg_dur_ms"),
        bool_and(col("ok")).as("roundtrip_ok"))
  }

  /** Frame-sampling plumbing: treat the payload as a sequence of fixed-size
    * "frames", emit every `stride`-th frame's offset + a frame checksum —
    * the explode-shape of video frame extraction (one input row → n frame
    * rows), without a real container parser. */
  def sampleFrames(s: SparkSession, d: String, frameSize: Int = 64,
      stride: Int = 4): DataFrame = sampleFramesDf(assets(s, d), frameSize, stride)

  def sampleFramesDf(assetsDf: DataFrame, frameSize: Int = 64,
      stride: Int = 4): DataFrame =
    assetsDf
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest((col("n_bytes") / frameSize).cast("int") - 1, lit(0)),
          lit(stride))))
      .select(
        col("asset_id"), col("frame_idx").cast("int").as("frame_idx"),
        (col("frame_idx") * frameSize).cast("long").as("byte_offset"),
        md5(expr(s"substring(media, frame_idx * $frameSize + 1, $frameSize)"))
          .as("frame_checksum"))
}
