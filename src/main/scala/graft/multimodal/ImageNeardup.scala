package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tables

/** Image near-duplicate detection — the missing member of the multimodal
  * curation family: decoded pixels → 64-bit perceptual difference hash
  * (dHash: each bit is a luma comparison between horizontally adjacent
  * cells of a 9×8 grid — Krawetz's classic formulation) → banded Hamming
  * LSH candidate join → exact Hamming verify. Composes the proven parts:
  * the pure-JVM codecs ([[BmpCodec]]/[[PngCodec]]/[[GifCodec]]/
  * [[JpegCodec]] behind [[Multimodal.decodeAny]]) and the banded-LSH
  * join shape of [[graft.dedup.Dedup]].
  *
  * EXACT by construction for Hamming ≤ maxHamming: the 64-bit hash is
  * split into maxHamming+1 contiguous bit bands, so ≤ maxHamming
  * differing bits leave at least one band identical (pigeonhole) — every
  * true pair collides in some band, and the verify step is an exact
  * bit_count on the carried hashes. No recall parameter to tune and the
  * brute-force oracle must match bit-for-bit.
  *
  * 100 TB shape: candidates come from a shuffle equi-join on
  * (band, bandkey) — never image×image. Candidate volume is the honest
  * bound that picks between the two operators: random-hash bucket
  * occupancy is n / 2^bandBits per band, so expected candidates are
  * (maxHamming+1) · n² / 2^bandBits — the q83 lesson (a FIXED band
  * width is a quadratic arm past its design range). At the compact
  * 64-bit hash's 16-bit bands that stays under ~10·n to ~6·10⁵ images
  * and is the right tool for per-shard dedup; past that, use
  * [[neardupPairsWide]] — the 256-bit grid hash whose 32-bit bands
  * (maxHamming 7) hold expected occupancy below 1 to ~4·10⁹ images,
  * with the identical join shape. The decode+hash pass is
  * per-partition map work (mapPartitions, the codec batch shape of
  * [[Multimodal]]); the verify is candidate-local. Nothing is
  * image×image in either operator.
  *
  * The contract corpus ([[imageCorpus]]) renders one deterministic 9×8
  * grayscale image per document (md5-seeded luma, one independent
  * digest per 16-cell chunk — [[lumaGrid]]'s scaladoc has the measured
  * reason the cheaper tiled-digest + ramp recipe was replaced in round
  * 11) through a codec arm picked
  * by key % 3 (BMP/PNG/GIF — the lossless arms, so the decoded grid is
  * bit-exact), and plants a near-dup variant for every 20th document at
  * key + 10⁷ (the q284 alias-key pattern) with ONE luma cell perturbed —
  * flipping ≤ 2 dHash bits, always within the default threshold. All
  * formulas are engine-agnostic integer+md5 arithmetic, mirrored verbatim
  * in the DuckDB oracle (which rebuilds the luma grid in SQL and
  * brute-forces pairs with HUGEINT xor/bit_count).
  */
object ImageNeardup {

  val GridW = 9
  val GridH = 8
  val DefaultMaxHamming = 3
  /** Wide (256-bit) grid: 16 comparisons × 16 rows. */
  val WideW = 17
  val WideH = 16
  /** Wide threshold: 7/256 ≈ the compact contract's 3/64 bit fraction;
    * 8 pigeonhole bands of 32 bits. */
  val WideMaxHamming = 7
  /** Planted-variant key offset — far above any replica's doc_id range
    * (same constant as q284's alias keys). */
  val VariantOffset = 10000000L

  final case class ImageAsset(asset_id: Long, media: Array[Byte],
      mime: String)
  final case class HashedAsset(asset_id: Long, dhash: Long)

  /** Deterministic luma grid for a seed key: cell i holds byte (i mod
    * 16) of md5(seed ++ "_" ++ i/16) — one INDEPENDENT digest per
    * 16-cell chunk. Round 11, forced by the first recorded
    * `image_neardup_wide` ScaleProbe rows (21.4 s ×16 → 588 s ×64, 27×
    * for 4× data): the previous single-digest + 31·i ramp recipe made
    * dHash bits CORRELATED ACROSS SEEDS — on the 17-wide grid, bit
    * (x, y) and bit (x−1, y+1) compare the SAME digest-byte pair
    * (17 ≡ 1 mod 16, the ramp only shifts both sides by a constant), so
    * a band's 32 bits carried far less than 32 bits of entropy and the
    * banded join's accidental-candidate volume was measured QUADRATIC:
    * 288 k candidate pairs at 88 k images → 4.58 M at 352 k (16× for
    * 4×, max bucket 103 where uniform hashing expects ~1). Per-chunk
    * digests remove the shared structure: same simulation, 145 → 2 337
    * accidental candidates (max bucket 3) — linear. The defect was in
    * this CORPUS GENERATOR, not the operator: the banded join is
    * agnostic to how hashes were produced, but the probe measures it on
    * this corpus, and the corpus's intent is unique decorrelated
    * images. `perturb` ≥ 0 adds 128 (mod 256) to that one cell — the
    * planted near-dup edit, touching at most 2 comparison bits (both
    * geometries re-verified under the new grid). */
  private[multimodal] def lumaGrid(seed: Long, perturb: Int): Array[Int] =
    lumaGridN(seed, perturb, GridW * GridH)

  private[multimodal] def lumaGridN(seed: Long, perturb: Int,
      cells: Int): Array[Int] = {
    val md = MessageDigest.getInstance("MD5")
    var dig: Array[Byte] = null
    val p = Array.tabulate(cells) { i =>
      if (i % 16 == 0)
        dig = md.digest(s"${seed}_${i / 16}".getBytes("UTF-8"))
      dig(i % 16) & 0xff
    }
    if (perturb >= 0) p(perturb) = (p(perturb) + 128) % 256
    p
  }

  /** Render a luma grid as an encoded grayscale image (R=G=B) through
    * the lossless arm picked by key % 3. */
  /** The luma grid as an un-encoded grayscale raster (the pixel content
    * of [[renderImage]] before a codec arm wraps it) — the animated-GIF
    * video container feeds frames from here. */
  private[multimodal] def renderDecoded(seed: Long, perturb: Int,
      w: Int = GridW, h: Int = GridH): BmpCodec.Decoded = {
    val p = lumaGridN(seed, perturb, w * h)
    val bgr = new Array[Byte](w * h * 3)
    var i = 0
    while (i < p.length) {
      val v = p(i).toByte
      bgr(i * 3) = v; bgr(i * 3 + 1) = v; bgr(i * 3 + 2) = v
      i += 1
    }
    BmpCodec.Decoded(w, h, bgr)
  }

  private[multimodal] def renderImage(key: Long, seed: Long, perturb: Int,
      w: Int = GridW, h: Int = GridH): (Array[Byte], String) = {
    val img = renderDecoded(seed, perturb, w, h)
    (key % 3) match {
      case 0 => (BmpCodec.encode(img), "image/bmp")
      case 1 => (PngCodec.encode(img), "image/png")
      case _ => (GifCodec.encode(img), "image/gif")
    }
  }

  /** The deterministic image-asset corpus over the documents table: one
    * base image per doc_id plus a planted one-cell-perturbed variant at
    * doc_id + 10⁷ for every 20th document. Rendering is per-partition
    * map work after a key repartition. */
  def imageCorpus(s: SparkSession, d: String): DataFrame =
    imageCorpusDf(Tables.documents(s, d).select(col("doc_id")), s,
      GridW, GridH)

  /** Wide-grid (17×16) form of the corpus — one 256-bit-hashable image
    * per doc plus the same every-20th planted variant (perturb cell
    * doc_id % 272). */
  def imageCorpusWide(s: SparkSession, d: String): DataFrame =
    imageCorpusDf(Tables.documents(s, d).select(col("doc_id")), s,
      WideW, WideH)

  /** Fail loudly when a corpus id would collide with the planted-variant
    * key range (round-12, verdict item 3 — the round-11 A4 fix guarded
    * the ScaleProbe callers but not the generators themselves): variants
    * live at doc_id + [[VariantOffset]], so a documents table with
    * doc_id ≥ 10⁷ (plausible at sf ≳ 100) would silently alias variant
    * keys onto base keys and corrupt the planted-pair contract that the
    * near-dup oracles and ScaleProbe linearity claims rest on.
    *
    * Round 13 (advice): checked PER ROW inside each generator's render
    * mapPartitions instead of an eager agg(max) action — the check now
    * rides the existing render pass (zero extra Spark jobs; the old
    * eager scan re-evaluated the input plan inside every probe's timed
    * window) and still fails the job loudly, as a task failure carrying
    * this message, on the first colliding id. Noise-free next to the
    * per-row render work it shares a loop with. */
  @inline private[multimodal] def requireSeedBelowOffset(seed: Long,
      who: String, offset: Long): Unit =
    require(seed < offset,
      s"$who: doc_id $seed reaches VariantOffset $offset — " +
        "planted-variant keys would collide with base keys; " +
        "raise the offset")

  /** [[imageCorpus]] over an arbitrary doc_id frame (ScaleProbe
    * replicates ids through here). `offset` relocates the planted
    * variants: the production queries keep the [[VariantOffset]]
    * default (the oracle SQL hardcodes it), while probe factors whose
    * replicated id range crosses 10⁷ pass a larger one — the planted
    * geometry is offset-invariant, so the probe still measures the
    * production plan. */
  def imageCorpusDf(docs: DataFrame, s: SparkSession,
      w: Int, h: Int, offset: Long = VariantOffset): DataFrame = {
    import s.implicits._
    val base = docs.select(col("doc_id").as("key"),
      col("doc_id").as("seed"), lit(-1).as("pi"))
    val variants = docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + lit(offset)).as("key"),
        col("doc_id").as("seed"),
        (col("doc_id") % (w * h)).cast("int").as("pi"))
    // WIDTH-PINNED exchange (round 11, the q259 lesson recurring): the
    // pre-render rows are skinny (key, seed, pi) triples — a count-less
    // repartition(col) lets AQE coalesce them BY SIZE into one
    // partition, serializing the compute-bound render→decode→hash
    // pipeline that follows in the same stage on a single core (the
    // first image_neardup_wide ScaleProbe rows measured exactly this:
    // ~890 s at ×64 where the parallel plan takes ~1/30th). An explicit
    // partition count pins the exchange width against AQE.
    base.unionByName(variants)
      .repartition(s.sparkContext.defaultParallelism, col("key"))
      .as[(Long, Long, Int)]
      .mapPartitions(_.map { case (key, seed, pi) =>
        requireSeedBelowOffset(seed, "imageCorpusDf", offset)
        val (bytes, mime) = renderImage(key, seed, pi, w, h)
        ImageAsset(key, bytes, mime)
      })
      .toDF()
  }

  /** 64-bit dHash of one encoded image: decode (any codec arm),
    * nearest-neighbor down to the 9×8 grid, integer BT.601 luma
    * (exact for grayscale pixels: (299v+587v+114v)/1000 = v), bit
    * y·8+x set iff luma(x+1,y) > luma(x,y). None for undecodable
    * payloads — callers drop those rows, never throw. */
  def dhashOf(media: Array[Byte]): Option[Long] =
    Multimodal.decodeAny(media).map(dhashOfDecoded)

  /** [[dhashOf]] on an already-decoded raster — the animated-GIF video
    * container hashes its composed frames through here (same resize,
    * luma and bit layout; container-independence is spec-pinned). */
  private[multimodal] def dhashOfDecoded(img: BmpCodec.Decoded): Long = {
    val g =
      if (img.width == GridW && img.height == GridH) img
      else BmpCodec.resizeNearest(img, GridW, GridH)
    @inline def luma(x: Int, y: Int): Int = {
      val i = (y * GridW + x) * 3
      val b = g.bgr(i) & 0xff; val gg = g.bgr(i + 1) & 0xff
      val r = g.bgr(i + 2) & 0xff
      (r * 299 + gg * 587 + b * 114) / 1000
    }
    var h = 0L
    var y = 0
    while (y < GridH) {
      var x = 0
      while (x < GridW - 1) {
        if (luma(x + 1, y) > luma(x, y)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Decode + hash as per-partition map work over an (asset_id, media)
    * frame — batch or streaming (stateless). */
  def dHashes(assets: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    assets.select(col("asset_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, media) =>
        dhashOf(media).map(HashedAsset(id, _))
      })
      .toDF()
  }

  /** 256-bit grid dHash of one encoded image, packed little-endian into
    * 4 longs: decode, nearest-resize to the 17×16 grid, integer luma,
    * bit y·16+x (x < 16) set iff luma(x+1,y) > luma(x,y). The scale-path
    * hash: its 32-bit pigeonhole bands (at [[WideMaxHamming]] = 7) keep
    * banded-join bucket occupancy under 1 to ~4·10⁹ images. */
  def dhash256Of(media: Array[Byte]): Option[Array[Long]] =
    Multimodal.decodeAny(media).map { img =>
      val g =
        if (img.width == WideW && img.height == WideH) img
        else BmpCodec.resizeNearest(img, WideW, WideH)
      @inline def luma(x: Int, y: Int): Int = {
        val i = (y * WideW + x) * 3
        val b = g.bgr(i) & 0xff; val gg = g.bgr(i + 1) & 0xff
        val r = g.bgr(i + 2) & 0xff
        (r * 299 + gg * 587 + b * 114) / 1000
      }
      val w = new Array[Long](4)
      var y = 0
      while (y < WideH) {
        var x = 0
        while (x < WideW - 1) {
          if (luma(x + 1, y) > luma(x, y)) {
            val idx = y * 16 + x
            w(idx >> 6) |= 1L << (idx & 63)
          }
          x += 1
        }
        y += 1
      }
      w
    }

  /** Decode + wide-hash as per-partition map work: (asset_id,
    * dwords array<long>[4]). */
  def dHashesWide(assets: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    assets.select(col("asset_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, media) =>
        dhash256Of(media).map(ws => (id, ws))
      })
      .toDF("asset_id", "dwords")
  }

  /** 8 × 32-bit pigeonhole band keys of the 4-word wide hash: band b is
    * the half-word dwords[b/2] >>> 32·(b%2). Hamming ≤ 7 leaves ≥ 1 of
    * the 8 bands intact. */
  private[graft] def wideBandKeys(): Seq[Column] =
    (0 until 8).map { b =>
      shiftrightunsigned(element_at(col("dwords"), b / 2 + 1),
        32 * (b % 2)).bitwiseAND(lit(0xffffffffL))
    }

  /** One (idCol, band, bandkey, dwords) row per wide band — the
    * 256-bit counterpart of [[bandTable]]; stateless per-row explode,
    * identical on batch and streaming frames (the streaming video
    * probe's registry/arrival key tables). */
  private[graft] def bandTableWide(hashes: DataFrame,
      idCol: String): DataFrame =
    hashes.select(col("asset_id").as(idCol), col("dwords"))
      .select(col(idCol), col("dwords"),
        posexplode(array(wideBandKeys(): _*)).as(Seq("band", "bandkey")))

  /** All asset pairs within [[WideMaxHamming]] bits of the 256-bit
    * hash, exact — the 100 TB operator ([[neardupPairs]] scaladoc has
    * the occupancy math). Same join shape: banded candidates, exact
    * summed bit_count verify on the carried words. */
  def neardupPairsWide(hashes: DataFrame,
      maxHamming: Int = WideMaxHamming): DataFrame = {
    val banded = hashes.select(col("asset_id"), col("dwords"),
      posexplode(array(wideBandKeys(): _*)).as(Seq("band", "bandkey")))
    val a = banded.select(col("band"), col("bandkey"),
      col("asset_id").as("asset_a"), col("dwords").as("wa"))
    val b = banded.select(col("band"), col("bandkey"),
      col("asset_id").as("asset_b"), col("dwords").as("wb"))
    // SHUFFLE_HASH, never broadcast (round 11): both sides are the
    // corpus-derived band table hidden behind MapPartitions, whose size
    // Catalyst estimates from the tiny pre-render child — at ×64 probe
    // scale the optimizer auto-broadcast a 2.8M-row / ~230 MB side
    // (driver collect of the ENTIRE rendered corpus + a single-threaded
    // hashed-relation build; stage profile measured the join side at
    // 75× the render's CPU). At 100 TB that plan is a driver OOM. The
    // hint pins the scale-correct plan: co-partition both sides on
    // (band, bandkey), build per-partition hash maps.
    a.hint("SHUFFLE_HASH").join(b.hint("SHUFFLE_HASH"),
        Seq("band", "bandkey"))
      .filter(col("asset_a") < col("asset_b"))
      .select(col("asset_a"), col("asset_b"), col("wa"), col("wb"))
      .distinct()
      .withColumn("hamming", expr(
        "aggregate(zip_with(wa, wb, (x, y) -> CAST(bit_count(x ^ y) " +
          "AS INT)), 0, (acc, v) -> acc + v)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("asset_a"), col("asset_b"), col("hamming"))
  }

  /** q287: the wide-hash contract query — 17×16 corpus → 256-bit hash →
    * 8-banded exact pair join. */
  def imageNeardupWide(s: SparkSession, d: String): DataFrame =
    neardupPairsWide(dHashesWide(imageCorpusWide(s, d), s))

  /** Contiguous bit-band keys of the `dhash` column: maxHamming+1 bands
    * cover all 64 bits, so ≤ maxHamming flipped bits leave ≥ 1 band
    * intact. Shared by the batch pair join and the streaming probe. */
  private[graft] def bandKeys(maxHamming: Int): Seq[Column] = {
    val bands = maxHamming + 1
    require(bands >= 1 && bands <= 64, s"maxHamming out of range: $maxHamming")
    val width = 64 / bands
    (0 until bands).map { b =>
      val lo = b * width
      val w = if (b == bands - 1) 64 - lo else width
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftrightunsigned(col("dhash"), lo).bitwiseAND(lit(mask))
    }
  }

  /** One (idCol, band, bandkey, dhash) row per band — the LSH key table
    * of a hashed frame; stateless per-row explode, identical on batch
    * and streaming frames. */
  private[graft] def bandTable(hashes: DataFrame, idCol: String,
      maxHamming: Int): DataFrame =
    hashes.select(col("asset_id").as(idCol), col("dhash"))
      .select(col(idCol), col("dhash"),
        posexplode(array(bandKeys(maxHamming): _*)).as(Seq("band", "bandkey")))

  /** All asset pairs within `maxHamming` dHash bits, exact: banded
    * candidate equi-join on (band, bandkey), then exact bit_count
    * verify on the carried hashes. Output (asset_a < asset_b, hamming). */
  def neardupPairs(hashes: DataFrame, maxHamming: Int = DefaultMaxHamming)
      : DataFrame = {
    val banded = bandTable(hashes, "asset_id", maxHamming)
    val a = banded.select(col("band"), col("bandkey"),
      col("asset_id").as("asset_a"), col("dhash").as("ha"))
    val b = banded.select(col("band"), col("bandkey"),
      col("asset_id").as("asset_b"), col("dhash").as("hb"))
    // SHUFFLE_HASH, never broadcast — see neardupPairsWide: the band
    // table's size is opaque to Catalyst behind MapPartitions and the
    // auto-broadcast plan collects the whole corpus to the driver
    a.hint("SHUFFLE_HASH").join(b.hint("SHUFFLE_HASH"),
        Seq("band", "bandkey"))
      .filter(col("asset_a") < col("asset_b"))
      .select(col("asset_a"), col("asset_b"), col("ha"), col("hb"))
      .distinct() // a pair may collide in several bands; ha/hb are id-functional
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("asset_a"), col("asset_b"), col("hamming"))
  }

  /** Group-assignment apply form: per asset, its near-dup degree and the
    * keep/drop verdict (keep iff no neighbor with a smaller id — the
    * min-id survivor rule of the text dedup family). */
  def neardupApply(hashes: DataFrame, maxHamming: Int = DefaultMaxHamming)
      : DataFrame =
    neardupApplyFromPairs(hashes.select(col("asset_id")),
      neardupPairs(hashes, maxHamming))

  /** The apply verdict from ANY (asset_a, asset_b) pair frame — shared
    * by the compact/wide image forms and the audio/video members that
    * compose this family's pair operators (round 11). */
  def neardupApplyFromPairs(assetIds: DataFrame, pairFrame: DataFrame)
      : DataFrame = {
    val pairs = pairFrame
      .localCheckpoint() // both direction projections read it
    val nb = pairs.select(col("asset_a").as("asset_id"),
        col("asset_b").as("nb"))
      .unionByName(pairs.select(col("asset_b").as("asset_id"),
        col("asset_a").as("nb")))
    assetIds.select(col("asset_id"))
      .join(nb, Seq("asset_id"), "left_outer")
      .groupBy(col("asset_id"))
      .agg(count(col("nb")).as("n_neardups"),
        sum(when(col("nb") < col("asset_id"), 1).otherwise(0)).as("sm"))
      .select(col("asset_id"), col("n_neardups"),
        (col("sm") === 0).as("keep"))
  }

  /** q285: the contract pair query — corpus render → decode+hash →
    * banded exact pair join. */
  def imageNeardupPairs(s: SparkSession, d: String): DataFrame =
    neardupPairs(dHashes(imageCorpus(s, d), s))

  /** q286: the apply form over the same corpus. */
  def imageNeardupApply(s: SparkSession, d: String): DataFrame =
    neardupApply(dHashes(imageCorpus(s, d), s))

  /** DuckDB mirror of the corpus + hash arithmetic: rebuilds the luma
    * grid from the SAME md5+integer formulas (hex pairs parsed via
    * strpos — engine-agnostic), derives the 64 dHash bits from adjacent-
    * cell comparisons, packs them into a HUGEINT (BIGINT shifts raise on
    * bit 63 in DuckDB; HUGEINT xor/bit_count are exact), and brute-
    * forces all pairs. The Spark side goes the long way — render →
    * encode (BMP/PNG/GIF by key % 3) → decode → luma → hash — so a
    * codec regression on any arm diverges the hashes and fails the
    * driver gate. */
  private val OracleGrid: String =
    "WITH ks AS (SELECT doc_id AS key, doc_id AS seed, -1 AS pi FROM documents " +
      "UNION ALL SELECT doc_id + 10000000, doc_id, CAST(doc_id % 72 AS INT) " +
      "FROM documents WHERE doc_id % 20 = 0), " +
      "px AS (SELECT key, x, y, " +
      "CASE WHEN x + 9*y = pi THEN (b0 + 128) % 256 ELSE b0 END AS p FROM (" +
      "SELECT key, pi, x, y, " +
      "(strpos('0123456789abcdef', substr(md5(CAST(seed AS VARCHAR) " +
      "|| '_' || CAST((x + 9*y) // 16 AS VARCHAR)), " +
      "2*((x + 9*y) % 16) + 1, 1)) - 1) * 16 " +
      "+ strpos('0123456789abcdef', substr(md5(CAST(seed AS VARCHAR) " +
      "|| '_' || CAST((x + 9*y) // 16 AS VARCHAR)), " +
      "2*((x + 9*y) % 16) + 2, 1)) - 1 AS b0 " +
      "FROM ks, range(0, 9) tx(x), range(0, 8) ty(y))), " +
      "h AS (SELECT l.key, " +
      "bit_or(CASE WHEN r.p > l.p THEN 1::HUGEINT << CAST(l.y*8 + l.x AS INT) " +
      "ELSE 0::HUGEINT END) AS dh " +
      "FROM px l JOIN px r ON r.key = l.key AND r.y = l.y AND r.x = l.x + 1 " +
      "GROUP BY l.key)"

  val PairsOracleSql: String = OracleGrid +
    " SELECT a.key AS asset_a, b.key AS asset_b, " +
    "CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming " +
    "FROM h a JOIN h b ON a.key < b.key " +
    "WHERE bit_count(xor(a.dh, b.dh)) <= 3"

  /** DuckDB mirror of the WIDE corpus + 256-bit hash: same md5+integer
    * luma formulas on the 17×16 grid, the 256 comparison bits packed
    * into four 64-bit words carried as HUGEINTs (shift ≤ 63 per word —
    * BIGINT shifts raise on bit 63), hamming = the summed per-word
    * bit_count of the xor, brute-forced over all key pairs. */
  private val WideOracleGrid: String =
    "WITH ks AS (SELECT doc_id AS key, doc_id AS seed, -1 AS pi FROM documents " +
      "UNION ALL SELECT doc_id + 10000000, doc_id, CAST(doc_id % 272 AS INT) " +
      "FROM documents WHERE doc_id % 20 = 0), " +
      "px AS (SELECT key, x, y, " +
      "CASE WHEN x + 17*y = pi THEN (b0 + 128) % 256 ELSE b0 END AS p FROM (" +
      "SELECT key, pi, x, y, " +
      "(strpos('0123456789abcdef', substr(md5(CAST(seed AS VARCHAR) " +
      "|| '_' || CAST((x + 17*y) // 16 AS VARCHAR)), " +
      "2*((x + 17*y) % 16) + 1, 1)) - 1) * 16 " +
      "+ strpos('0123456789abcdef', substr(md5(CAST(seed AS VARCHAR) " +
      "|| '_' || CAST((x + 17*y) // 16 AS VARCHAR)), " +
      "2*((x + 17*y) % 16) + 2, 1)) - 1 AS b0 " +
      "FROM ks, range(0, 17) tx(x), range(0, 16) ty(y))), " +
      "h AS (SELECT l.key, " +
      (0 until 4).map { w =>
        s"bit_or(CASE WHEN (l.y*16 + l.x) // 64 = $w AND r.p > l.p " +
          "THEN 1::HUGEINT << CAST((l.y*16 + l.x) % 64 AS INT) " +
          s"ELSE 0::HUGEINT END) AS w$w"
      }.mkString(", ") +
      " FROM px l JOIN px r ON r.key = l.key AND r.y = l.y AND r.x = l.x + 1 " +
      "GROUP BY l.key)"

  val WideOracleSql: String = WideOracleGrid + {
    // bit_count returns a TINYINT in DuckDB — the 4-word sum overflows
    // 127 on far pairs, so each term is cast to INT before adding
    val ham = (0 until 4)
      .map(w => s"CAST(bit_count(xor(a.w$w, b.w$w)) AS INT)")
      .mkString(" + ")
    s" SELECT a.key AS asset_a, b.key AS asset_b, $ham AS hamming " +
      s"FROM h a JOIN h b ON a.key < b.key WHERE $ham <= 7"
  }

  val ApplyOracleSql: String = OracleGrid +
    ", pr AS (SELECT a.key AS ka, b.key AS kb FROM h a JOIN h b " +
    "ON a.key < b.key WHERE bit_count(xor(a.dh, b.dh)) <= 3), " +
    "nb AS (SELECT ka AS id, kb AS nb FROM pr UNION ALL SELECT kb, ka FROM pr) " +
    "SELECT k.key AS asset_id, count(nb.nb) AS n_neardups, " +
    "count(CASE WHEN nb.nb < k.key THEN 1 END) = 0 AS keep " +
    "FROM ks k LEFT JOIN nb ON nb.id = k.key GROUP BY k.key"
}
