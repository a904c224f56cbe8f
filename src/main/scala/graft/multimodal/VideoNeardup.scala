package graft.multimodal

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tables

/** Video near-duplicate detection — the temporal member of the near-dup
  * family (text q27/q83, embeddings q29, images q285-q287, audio
  * q288-q290): a video is a frame sequence; its fingerprint is the
  * TEMPORAL STACK of per-frame 64-bit dHashes — 4 frames × 64 bits =
  * one 256-bit code, the frame-level-hash + temporal-aggregation shape
  * of Facebook's public PDQ/TMK video-similarity stack — and the join
  * is [[ImageNeardup.neardupPairsWide]] UNCHANGED (8 × 32-bit
  * pigeonhole bands at maxHamming 7, each band one half of one frame's
  * hash). Two videos are near-dups when their aligned frames differ by
  * ≤ 7 comparison bits in total: pigeonhole-exact, never video×video,
  * and every component is already spec/oracle-proven.
  *
  * Containers, THREE (round 12 added the real-world lossless one,
  * round 13 the lossy one):
  * (a) the minimal length-prefixed "GVID" container (u32 frame count,
  * then u32-length-prefixed encoded frames — each an ordinary
  * BMP/PNG/GIF payload decoded by [[Multimodal.decodeAny]]),
  * (b) animated GIF89a via [[GifCodec.encodeFrames]]/
  * [[GifCodec.decodeFrames]] — a public, spec-defined multi-frame
  * format the JDK's ImageIO independently reads back, and
  * (c) MJPEG — raw concatenated JPEG streams through the real
  * [[JpegCodec]], the family's first LOSSY member (its corpus and
  * oracle differ by necessity; see the MJPEG section below).
  * [[fingerprintOf]] dispatches on the magic bytes, so one asset
  * column may mix all three; every decoder returns None on any
  * malformed input (the codec-family contract: callers drop, never
  * throw). The GVID/GIF arms share one pixel contract (and oracle);
  * the lossy arm's decoded pixels carry quantization noise, so its
  * correctness claims rest on the no-tie margin corpus instead.
  *
  * The contract corpus ([[videoCorpus]]): one 4-frame video per
  * document; frame f renders the [[ImageNeardup.lumaGridN]] grid for
  * seed doc_id·4+f (per-(doc,frame) independent grids — seed spaces
  * disjoint across docs) through codec arm (doc_id+f) mod 3, so every
  * video exercises all three lossless arms. Every 20th document plants
  * a variant at doc_id + 10⁷ with ONE cell of ONE frame perturbed
  * (frame doc_id mod 4, cell doc_id mod 72) — ≤ 2 bits of the 256-bit
  * stack, always within maxHamming 7. The DuckDB oracle rebuilds the
  * per-frame grids from the same md5 arithmetic and brute-forces pairs
  * over four HUGEINT words; the Spark side goes the long way —
  * render → encode frames → container → decode container → decode
  * frames → luma → hash — so a regression in the container OR any
  * codec arm diverges the hashes and fails the driver gate. */
object VideoNeardup {

  val FrameCount = 4
  val MaxHamming = ImageNeardup.WideMaxHamming // 7

  final case class VideoAsset(asset_id: Long, media: Array[Byte],
      mime: String)

  /** Minimal deterministic container: "GVID" + u32 n + n × (u32 len,
    * frame bytes). Little-endian, like the WAV codec. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write("GVID".getBytes("US-ASCII"))
    w32(frames.length)
    frames.foreach { f => w32(f.length); out.write(f) }
    out.toByteArray
  }

  def decodeVideo(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    try {
      if (b.length < 8 || b(0) != 'G' || b(1) != 'V' || b(2) != 'I' ||
        b(3) != 'D') return None
      def u32(off: Int): Int =
        (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
          ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
      val n = u32(4)
      if (n < 0 || n > 65536) return None
      var pos = 8
      val frames = Seq.newBuilder[Array[Byte]]
      var i = 0
      while (i < n) {
        if (pos + 4 > b.length) return None
        val len = u32(pos)
        if (len < 0 || pos + 4 + len > b.length) return None
        frames += java.util.Arrays.copyOfRange(b, pos + 4, pos + 4 + len)
        pos += 4 + len
        i += 1
      }
      // the scaladoc contract is None on ANY malformed input: trailing
      // bytes after the last frame are malformed too (round-11 advice —
      // the truncation spec passed only because dropping a byte happens
      // to shorten the last frame, not because the tail was checked)
      if (pos != b.length) return None
      Some(frames.result())
    } catch { case _: Exception => None }
  }

  /** Render one video: frame f = the 9×8 luma grid of seed
    * key·4+f (perturbed at `pi` when f == pf), encoded through codec
    * arm (key+f) mod 3. */
  private def renderVideo(key: Long, seed: Long, pf: Int,
      pi: Int): Array[Byte] =
    encodeVideo((0 until FrameCount).map { f =>
      ImageNeardup.renderImage(key + f, seed * FrameCount + f,
        if (f == pf) pi else -1)._1
    })

  /** The deterministic video corpus over the documents table. Planted
    * variant for every 20th doc at doc_id + 10⁷: frame doc_id mod 4,
    * cell doc_id mod 72 perturbed. Width-pinned exchange before the
    * compute-bound render (the round-11 corpus lesson). */
  def videoCorpusDf(docs: DataFrame, s: SparkSession,
      offset: Long = ImageNeardup.VariantOffset): DataFrame = {
    import s.implicits._
    val base = docs.select(col("doc_id").as("key"),
      col("doc_id").as("seed"), lit(-1).as("pf"), lit(-1).as("pi"))
    val variants = docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + lit(offset)).as("key"),
        col("doc_id").as("seed"),
        (col("doc_id") % FrameCount).cast("int").as("pf"),
        (col("doc_id") % (ImageNeardup.GridW * ImageNeardup.GridH))
          .cast("int").as("pi"))
    base.unionByName(variants)
      .repartition(s.sparkContext.defaultParallelism, col("key"))
      .as[(Long, Long, Int, Int)]
      .mapPartitions(_.map { case (key, seed, pf, pi) =>
        // per-row variant-offset guard riding the render pass — see
        // ImageNeardup.requireSeedBelowOffset (round-13 advice form)
        ImageNeardup.requireSeedBelowOffset(seed, "videoCorpusDf", offset)
        VideoAsset(key, renderVideo(key, seed, pf, pi), "video/x-gvid")
      })
      .toDF()
  }

  def videoCorpus(s: SparkSession, d: String): DataFrame =
    videoCorpusDf(Tables.documents(s, d).select(col("doc_id")), s)

  /** The same corpus through the REAL container (round 12): identical
    * per-(doc,frame) luma grids and planted variants, but packaged as
    * one animated GIF89a per video instead of GVID — the pixel math is
    * container-invariant, so q293/q294 reuse q291/q292's oracle SQL
    * verbatim while the Spark side exercises the full multi-frame GIF
    * encode→decode path (LCT per frame, GCE disposal, LZW ×4). */
  def videoCorpusGifDf(docs: DataFrame, s: SparkSession,
      offset: Long = ImageNeardup.VariantOffset): DataFrame = {
    import s.implicits._
    val base = docs.select(col("doc_id").as("key"),
      col("doc_id").as("seed"), lit(-1).as("pf"), lit(-1).as("pi"))
    val variants = docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + lit(offset)).as("key"),
        col("doc_id").as("seed"),
        (col("doc_id") % FrameCount).cast("int").as("pf"),
        (col("doc_id") % (ImageNeardup.GridW * ImageNeardup.GridH))
          .cast("int").as("pi"))
    base.unionByName(variants)
      .repartition(s.sparkContext.defaultParallelism, col("key"))
      .as[(Long, Long, Int, Int)]
      .mapPartitions(_.map { case (key, seed, pf, pi) =>
        ImageNeardup.requireSeedBelowOffset(seed, "videoCorpusGifDf",
          offset)
        val frames = (0 until FrameCount).map { f =>
          ImageNeardup.renderDecoded(seed * FrameCount + f,
            if (f == pf) pi else -1)
        }
        VideoAsset(key, GifCodec.encodeFrames(frames), "image/gif")
      })
      .toDF()
  }

  def videoCorpusGif(s: SparkSession, d: String): DataFrame =
    videoCorpusGifDf(Tables.documents(s, d).select(col("doc_id")), s)

  // -------------------------------------------------------------- MJPEG
  //
  // The LOSSY container arm (round 13): every prior near-dup member —
  // text, embeddings, image, audio, GVID and GIF89a video — round-trips
  // its content bit-exactly, so the family had never exercised dHash's
  // actual real-world claim: robustness under lossy re-encode. MJPEG is
  // the classic raw-concatenated-JPEG video stream; each frame goes
  // through the from-scratch [[JpegCodec]] (baseline 4:4:4, quality
  // [[MjpegQuality]]) and comes back with QUANTIZATION NOISE — decoded
  // luma is only close to the source, never equal.
  //
  // What makes exact correctness claims possible on a lossy path is the
  // corpus construction ([[mjpegGrid]]): every horizontally-adjacent
  // cell pair differs by ≥ 32 luma (8 levels, 16+32k, no ties and never
  // exactly 4 levels apart), so a comparison bit can only flip if the
  // decode-side error reaches ±16 — an order of magnitude above the
  // measured quality-100 roundtrip error (spec-pinned tolerance). The
  // planted perturbation (+128 = +4 levels; the level set is closed
  // under it) moves ≤ 2 comparison bits and can never create a tie, so
  // a planted pair's fingerprint hamming is ≤ 2 DETERMINISTICALLY,
  // noise notwithstanding, and cross-video hammings concentrate near
  // 128. Hence: detected pairs == planted pairs EXACTLY, which is what
  // q295/q296 assert through the round-6 invariant-oracle pattern —
  // DuckDB cannot run a JPEG decode, but it can enumerate the planted
  // pair set from the documents table, and any false/missed pair (a
  // quantization bit-flip breaking the margin) diverges the result.

  /** JPEG quality for the MJPEG arm: 100 → all-ones quantization
    * tables, the codec's lowest-loss setting — roundtrip error is FDCT/
    * IDCT rounding only (measured ≤ ~3 luma on this corpus; the margin
    * construction tolerates ±15). Still genuinely lossy: decoded
    * pixels differ from the source, which is the point of the arm. */
  val MjpegQuality = 100
  /** Luma levels per cell of the no-tie grid (values 16 + 32·k). */
  val MjpegLevels = 8

  /** The no-tie 8-level luma grid of the lossy arm: base level = md5
    * nibble (one independent digest per 16-cell chunk — the round-11
    * decorrelation lesson, domain-tagged "_m" so lossy-arm grids share
    * nothing with the lossless family's), bumped +1 mod 8 while it
    * equals the left neighbor or sits exactly 4 levels from it (≤ 2
    * bumps terminate: 8 levels, 2 excluded). The rule guarantees, for
    * EVERY horizontally-adjacent pair: distinct levels (≥ 32 luma
    * apart) and never 4 apart — so the +4-level perturbation of any
    * single cell keeps the whole row tie-free, and ≤ 2 dHash comparison
    * bits move. Deterministic left-to-right, so base and variant grids
    * agree on every unperturbed cell. */
  private[multimodal] def mjpegGrid(seed: Long, perturb: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val w = ImageNeardup.GridW
    val cells = w * ImageNeardup.GridH
    val k = new Array[Int](cells)
    var dig: Array[Byte] = null
    var i = 0
    while (i < cells) {
      if (i % 16 == 0)
        dig = md.digest(s"${seed}_m${i / 16}".getBytes("UTF-8"))
      k(i) = dig(i % 16) & 7
      if (i % w != 0) {
        val left = k(i - 1)
        while (k(i) == left || k(i) == (left + 4) % MjpegLevels)
          k(i) = (k(i) + 1) % MjpegLevels
      }
      i += 1
    }
    if (perturb >= 0) k(perturb) = (k(perturb) + 4) % MjpegLevels
    var j = 0
    while (j < cells) { k(j) = 16 + 32 * k(j); j += 1 }
    k
  }

  /** One MJPEG frame: the no-tie grid as a 9×8 grayscale raster through
    * the real JPEG encoder. */
  private def renderMjpegFrame(seed: Long, perturb: Int): Array[Byte] = {
    val p = mjpegGrid(seed, perturb)
    val w = ImageNeardup.GridW; val h = ImageNeardup.GridH
    val bgr = new Array[Byte](w * h * 3)
    var i = 0
    while (i < p.length) {
      val v = p(i).toByte
      bgr(i * 3) = v; bgr(i * 3 + 1) = v; bgr(i * 3 + 2) = v
      i += 1
    }
    JpegCodec.encode(BmpCodec.Decoded(w, h, bgr), MjpegQuality)
  }

  /** MJPEG container encode: raw concatenation of complete JPEG
    * streams — the format's actual wire shape (no wrapper). */
  def encodeMjpeg(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    frames.foreach(out.write)
    out.toByteArray
  }

  /** Split an MJPEG byte stream back into its complete JPEG frames via
    * [[JpegCodec.frameLength]]'s segment walk (an EOI byte pattern
    * inside a segment payload cannot cut a frame short). None on any
    * malformed or trailing content, and frames are capped like GVID's
    * 65536 — callers drop, never throw. */
  def decodeMjpeg(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    try {
      if (!JpegCodec.isJpeg(b)) return None
      var pos = 0
      var n = 0
      val frames = Seq.newBuilder[Array[Byte]]
      while (pos < b.length) {
        if (n >= 65536) return None
        JpegCodec.frameLength(b, pos) match {
          case Some(len) =>
            frames += java.util.Arrays.copyOfRange(b, pos, pos + len)
            pos += len
            n += 1
          case None => return None
        }
      }
      Some(frames.result())
    } catch { case _: Exception => None }
  }

  /** The lossy-arm corpus: same every-20th planted-variant geometry as
    * the GVID/GIF arms, but frames render the no-tie grid and pass
    * through real JPEG quantization — one MJPEG stream per video. */
  def videoCorpusMjpegDf(docs: DataFrame, s: SparkSession,
      offset: Long = ImageNeardup.VariantOffset): DataFrame = {
    import s.implicits._
    val base = docs.select(col("doc_id").as("key"),
      col("doc_id").as("seed"), lit(-1).as("pf"), lit(-1).as("pi"))
    val variants = docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + lit(offset)).as("key"),
        col("doc_id").as("seed"),
        (col("doc_id") % FrameCount).cast("int").as("pf"),
        (col("doc_id") % (ImageNeardup.GridW * ImageNeardup.GridH))
          .cast("int").as("pi"))
    base.unionByName(variants)
      .repartition(s.sparkContext.defaultParallelism, col("key"))
      .as[(Long, Long, Int, Int)]
      .mapPartitions(_.map { case (key, seed, pf, pi) =>
        ImageNeardup.requireSeedBelowOffset(seed, "videoCorpusMjpegDf",
          offset)
        val frames = (0 until FrameCount).map { f =>
          renderMjpegFrame(seed * FrameCount + f, if (f == pf) pi else -1)
        }
        VideoAsset(key, encodeMjpeg(frames), "video/x-motion-jpeg")
      })
      .toDF()
  }

  def videoCorpusMjpeg(s: SparkSession, d: String): DataFrame =
    videoCorpusMjpegDf(Tables.documents(s, d).select(col("doc_id")), s)

  /** q295: the lossy arm's pair query — ids only. The per-pair hamming
    * is deterministic but depends on quantization noise DuckDB cannot
    * reproduce, while the PAIR SET is exactly the planted set by the
    * margin construction — so the oracle enumerates planted pairs in
    * pure SQL and any noise-induced false/missed pair fails the gate. */
  def videoNeardupPairsMjpeg(s: SparkSession, d: String): DataFrame =
    ImageNeardup.neardupPairsWide(fingerprints(videoCorpusMjpeg(s, d), s),
      MaxHamming)
      .select(col("asset_a"), col("asset_b"))

  /** q296: the apply form (near-dup degree + min-id-survivor verdict)
    * over the lossy corpus — the production operator end-to-end; the
    * oracle derives every asset's exact expected degree and verdict
    * from the planted geometry alone. */
  def videoNeardupApplyMjpeg(s: SparkSession, d: String): DataFrame = {
    val fps = fingerprints(videoCorpusMjpeg(s, d), s).localCheckpoint()
    ImageNeardup.neardupApplyFromPairs(fps.select(col("asset_id")),
      ImageNeardup.neardupPairsWide(fps, MaxHamming))
  }

  /** The lossy arm's oracle: DuckDB cannot decode JPEG, but the margin
    * construction pins the detected pair set to EXACTLY the planted
    * set, which IS pure SQL over the documents table (the round-6
    * invariant pattern — exact oracle-computable columns instead of
    * raster hashes). Base keys sort below variant keys (offset 10⁷),
    * matching the operator's asset_a < asset_b orientation. */
  val MjpegPairsOracleSql: String =
    "SELECT doc_id AS asset_a, doc_id + 10000000 AS asset_b " +
      "FROM documents WHERE doc_id % 20 = 0"

  /** Apply-form oracle: with the pair set pinned to the planted set,
    * every asset's degree and keep verdict follow from the geometry —
    * a base doc with a variant has exactly one neighbor (larger id →
    * keep), its variant has one (smaller id → drop), all others none. */
  val MjpegApplyOracleSql: String =
    "SELECT doc_id AS asset_id, " +
      "CAST(CASE WHEN doc_id % 20 = 0 THEN 1 ELSE 0 END AS BIGINT) " +
      "AS n_neardups, true AS keep FROM documents " +
      "UNION ALL SELECT doc_id + 10000000 AS asset_id, " +
      "CAST(1 AS BIGINT) AS n_neardups, false AS keep " +
      "FROM documents WHERE doc_id % 20 = 0"

  /** 256-bit temporal fingerprint: decode the container (GVID or
    * animated GIF89a, dispatched on the magic bytes), dHash each of
    * the 4 frames, stack as 4 longs. None unless the container holds
    * exactly [[FrameCount]] decodable frames. Container-independent by
    * construction: the same pixel frames produce the same fingerprint
    * through either container (spec-pinned), which is why q293/q294
    * reuse q291/q292's oracle SQL verbatim. */
  def fingerprintOf(media: Array[Byte]): Option[Array[Long]] = {
    val hashes: Option[Seq[Long]] =
      if (GifCodec.isGif(media))
        GifCodec.decodeFrames(media).filter(_.length == FrameCount)
          .map(_.map(ImageNeardup.dhashOfDecoded))
      else if (JpegCodec.isJpeg(media))
        // MJPEG (round 13): concatenated JPEG frames — the lossy arm
        decodeMjpeg(media).filter(_.length == FrameCount)
          .map(_.flatMap(f =>
            JpegCodec.decode(f).map(ImageNeardup.dhashOfDecoded)))
      else
        decodeVideo(media).filter(_.length == FrameCount)
          .map(_.flatMap(ImageNeardup.dhashOf))
    // the GVID arm's per-frame decode may drop an undecodable frame —
    // require all FrameCount hashes, not just a full container
    hashes.filter(_.length == FrameCount).map(_.toArray)
  }

  /** Decode + fingerprint as per-partition map work: (asset_id, dwords
    * array<long>[4]) — the wide band machinery applies unchanged. */
  def fingerprints(assets: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    assets.select(col("asset_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, media) =>
        fingerprintOf(media).map((id, _))
      })
      .toDF("asset_id", "dwords")
  }

  /** q291: corpus render → container decode → per-frame hash → stacked
    * 256-bit banded exact pair join. */
  def videoNeardupPairs(s: SparkSession, d: String): DataFrame =
    ImageNeardup.neardupPairsWide(fingerprints(videoCorpus(s, d), s),
      MaxHamming)

  /** q292: the apply form (per-video near-dup degree + min-id-survivor
    * keep verdict) over the same corpus. */
  def videoNeardupApply(s: SparkSession, d: String): DataFrame = {
    val fps = fingerprints(videoCorpus(s, d), s).localCheckpoint()
    ImageNeardup.neardupApplyFromPairs(fps.select(col("asset_id")),
      ImageNeardup.neardupPairsWide(fps, MaxHamming))
  }

  /** q293: q291 through the animated-GIF89a container — same planted
    * pairs, same oracle, real-world packaging (multi-frame GIF encode →
    * strict composed decode → per-frame hash). */
  def videoNeardupPairsGif(s: SparkSession, d: String): DataFrame =
    ImageNeardup.neardupPairsWide(fingerprints(videoCorpusGif(s, d), s),
      MaxHamming)

  /** q294: q292 through the animated-GIF89a container. */
  def videoNeardupApplyGif(s: SparkSession, d: String): DataFrame = {
    val fps = fingerprints(videoCorpusGif(s, d), s).localCheckpoint()
    ImageNeardup.neardupApplyFromPairs(fps.select(col("asset_id")),
      ImageNeardup.neardupPairsWide(fps, MaxHamming))
  }

  /** DuckDB mirror: per (doc, frame) the [[ImageNeardup]] grid with
    * seed doc·4+f (per-chunk md5), dHash bits packed per frame into one
    * HUGEINT word each, hamming = the summed per-word bit_count of the
    * xor, brute-forced over all key pairs. */
  private val OracleGrid: String =
    "WITH ks AS (SELECT doc_id AS key, doc_id AS seed, -1 AS pf, -1 AS pi " +
      "FROM documents " +
      "UNION ALL SELECT doc_id + 10000000, doc_id, " +
      s"CAST(doc_id % $FrameCount AS INT), CAST(doc_id % 72 AS INT) " +
      "FROM documents WHERE doc_id % 20 = 0), " +
      "px AS (SELECT key, f, x, y, " +
      "CASE WHEN f = pf AND x + 9*y = pi THEN (b0 + 128) % 256 ELSE b0 END AS p " +
      "FROM (SELECT key, pf, pi, f, x, y, " +
      s"(strpos('0123456789abcdef', substr(md5(CAST(seed*$FrameCount + f AS VARCHAR) " +
      "|| '_' || CAST((x + 9*y) // 16 AS VARCHAR)), " +
      "2*((x + 9*y) % 16) + 1, 1)) - 1) * 16 " +
      s"+ strpos('0123456789abcdef', substr(md5(CAST(seed*$FrameCount + f AS VARCHAR) " +
      "|| '_' || CAST((x + 9*y) // 16 AS VARCHAR)), " +
      "2*((x + 9*y) % 16) + 2, 1)) - 1 AS b0 " +
      s"FROM ks, range(0, $FrameCount) tf(f), range(0, 9) tx(x), " +
      "range(0, 8) ty(y))), " +
      "h AS (SELECT l.key, " +
      (0 until FrameCount).map { f =>
        s"bit_or(CASE WHEN l.f = $f AND r.p > l.p " +
          "THEN 1::HUGEINT << CAST(l.y*8 + l.x AS INT) " +
          s"ELSE 0::HUGEINT END) AS w$f"
      }.mkString(", ") +
      " FROM px l JOIN px r ON r.key = l.key AND r.f = l.f " +
      "AND r.y = l.y AND r.x = l.x + 1 GROUP BY l.key)"

  private val Ham: String = (0 until FrameCount)
    .map(f => s"CAST(bit_count(xor(a.w$f, b.w$f)) AS INT)")
    .mkString(" + ")

  val PairsOracleSql: String = OracleGrid +
    s" SELECT a.key AS asset_a, b.key AS asset_b, $Ham AS hamming " +
    s"FROM h a JOIN h b ON a.key < b.key WHERE $Ham <= $MaxHamming"

  val ApplyOracleSql: String = OracleGrid +
    s", pr AS (SELECT a.key AS ka, b.key AS kb FROM h a JOIN h b " +
    s"ON a.key < b.key WHERE $Ham <= $MaxHamming), " +
    "nb AS (SELECT ka AS id, kb AS nb FROM pr UNION ALL SELECT kb, ka FROM pr) " +
    "SELECT k.key AS asset_id, count(nb.nb) AS n_neardups, " +
    "count(CASE WHEN nb.nb < k.key THEN 1 END) = 0 AS keep " +
    "FROM ks k LEFT JOIN nb ON nb.id = k.key GROUP BY k.key"
}
