package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tables

/** Audio near-duplicate detection — the last modality without a dedup
  * member (text q27/q83, embeddings q29, images q285-q287 all have one):
  * decoded PCM → a band-energy SIGN fingerprint in the Haitsma-Kalker
  * shape ("A Highly Robust Audio Fingerprint", ISMIR'02: bit(f,m) is the
  * sign of the frame-delta of the band-delta of band energies,
  * (E(f,m) − E(f,m+1)) − (E(f−1,m) − E(f−1,m+1)) > 0) → the SAME
  * pigeonhole-banded Hamming join as the image family. Band energies
  * here are block energies of contiguous PCM sample blocks (integer
  * sums of squares) rather than FFT bins: the HK bit formula and its
  * robustness argument are unchanged, and every step stays exact
  * integer arithmetic the DuckDB oracle mirrors bit-for-bit — the same
  * trade the image family makes with its md5 luma grid vs real photos.
  *
  * EXACT by construction for Hamming ≤ maxHamming (pigeonhole bands,
  * [[ImageNeardup]] scaladoc) — the join machinery IS the image
  * family's: the fingerprint is a 64-bit (compact) or 256-bit (wide)
  * column, and [[ImageNeardup.neardupPairs]]/[[ImageNeardup.neardupApply]]/
  * [[ImageNeardup.neardupPairsWide]] are hash-agnostic over
  * (asset_id, dhash | dwords) frames, so audio composes them rather
  * than duplicating the band/verify plan. Same scale envelope too:
  * the compact 64-bit fingerprint (16-bit bands at maxHamming 3) is
  * honest to ~6·10⁵ clips; [[audioNeardupWide]]'s 256-bit fingerprint
  * (32-bit bands, maxHamming 7) holds expected bucket occupancy < 1 to
  * ~4·10⁹ clips. Decode+fingerprint is per-partition map work; nothing
  * is clip×clip in either operator.
  *
  * The contract corpus ([[audioCorpus]]) synthesizes one deterministic
  * PCM16 mono clip per document — sample i is byte (i mod 16) of
  * md5(seed ++ "_" ++ i/16), minus 128: one INDEPENDENT digest per
  * 16-sample chunk ([[pcm]]'s scaladoc has the measured reason the
  * image family's cheaper tiled-digest + ramp recipe fails under
  * energy double-differences) — rendered through [[WavCodec.encode]]
  * and decoded back before
  * fingerprinting, so a WAV codec regression diverges the hashes and
  * fails the driver gate. Every 20th document plants a variant at
  * doc_id + 10⁷ with ONE block's samples shifted by +128 (mod 256):
  * the block sits in the LAST energy band (m = Bands−1), whose energy
  * enters only bits (f₀, Bands−2) and (f₀+1, Bands−2) — ≤ 2 flipped
  * bits, always within maxHamming 3 (and a last-frame block flips ≤ 1).
  */
object AudioNeardup {

  /** Compact geometry: 17 frames × 5 bands × 4-sample blocks = 340
    * samples; bits (f−1)·4+m for f ∈ 1..16, m ∈ 0..3 → 64 bits. */
  val Frames = 17
  val Bands = 5
  val BlockLen = 4
  /** Wide geometry: 17 frames × 17 bands → (16×16) = 256 bits, packed
    * little-endian into 4 longs like [[ImageNeardup.dhash256Of]]. */
  val WideFrames = 17
  val WideBands = 17
  val SampleRate = 8000
  val DefaultMaxHamming = ImageNeardup.DefaultMaxHamming // 3
  val WideMaxHamming = ImageNeardup.WideMaxHamming       // 7

  final case class AudioAsset(asset_id: Long, media: Array[Byte],
      mime: String)

  /** Deterministic PCM16 samples for a seed: sample i is byte (i mod 16)
    * of md5(seed ++ "_" ++ i/16) − 128 — one digest per 16-sample chunk,
    * every chunk an INDEPENDENT digest. The image family's cheaper
    * single-digest + 31·i ramp recipe does NOT survive this fingerprint:
    * dHash bits compare adjacent cells (digest-byte differences, seed-
    * dependent), but block-energy double-differences largely cancel the
    * tiled digest's seed-dependent variance and are left dominated by
    * the SHARED ramp — measured: min pairwise hamming 1 across 600 base
    * docs (10 accidental ≤1-bit pairs), vs min 8 across 6 000 docs
    * (18M pairs) with per-chunk digests. `pb` ≥ 0 shifts the 4 samples
    * of that block by +128 (mod 256, pre-centering) — the planted
    * near-dup edit. */
  private[graft] def pcm(seed: Long, pb: Int,
      nSamples: Int): Array[Short] = {
    val md = MessageDigest.getInstance("MD5")
    var dig: Array[Byte] = null
    Array.tabulate(nSamples) { i =>
      if (i % 16 == 0)
        dig = md.digest(s"${seed}_${i / 16}".getBytes("UTF-8"))
      val r0 = dig(i % 16) & 0xff
      val r = if (pb >= 0 && i / BlockLen == pb) (r0 + 128) % 256 else r0
      (r - 128).toShort
    }
  }

  /** The deterministic audio-asset corpus over the documents table: one
    * WAV clip per doc_id plus a planted one-block-perturbed variant at
    * doc_id + 10⁷ for every 20th document. The perturbed block is
    * (doc_id mod frames, last band) — ≤ 2 fingerprint bits (scaladoc).
    * Synthesis + encode is per-partition map work after a key
    * repartition, the [[ImageNeardup.imageCorpusDf]] shape. */
  def audioCorpusDf(docs: DataFrame, s: SparkSession,
      frames: Int, bands: Int,
      offset: Long = ImageNeardup.VariantOffset): DataFrame = {
    import s.implicits._
    val n = frames * bands * BlockLen
    val base = docs.select(col("doc_id").as("key"),
      col("doc_id").as("seed"), lit(-1).as("pb"))
    val variants = docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + lit(offset)).as("key"),
        col("doc_id").as("seed"),
        ((col("doc_id") % frames) * bands + (bands - 1)).cast("int").as("pb"))
    // width-pinned exchange — see ImageNeardup.imageCorpusDf: a
    // count-less repartition(col) lets AQE coalesce the skinny
    // pre-synth triples into one partition and serialize the
    // compute-bound synth→encode→decode→fingerprint stage
    base.unionByName(variants)
      .repartition(s.sparkContext.defaultParallelism, col("key"))
      .as[(Long, Long, Int)]
      .mapPartitions(_.map { case (key, seed, pb) =>
        // per-row variant-offset guard riding the synth pass — see
        // ImageNeardup.requireSeedBelowOffset (round-13 advice form)
        ImageNeardup.requireSeedBelowOffset(seed, "audioCorpusDf", offset)
        val wav = WavCodec.Wav(SampleRate, 1, pcm(seed, pb, n))
        AudioAsset(key, WavCodec.encode(wav), "audio/wav")
      })
      .toDF()
  }

  def audioCorpus(s: SparkSession, d: String): DataFrame =
    audioCorpusDf(Tables.documents(s, d).select(col("doc_id")), s,
      Frames, Bands)

  def audioCorpusWide(s: SparkSession, d: String): DataFrame =
    audioCorpusDf(Tables.documents(s, d).select(col("doc_id")), s,
      WideFrames, WideBands)

  /** Block energies of the first frames×bands blocks of a decoded clip:
    * E(f,m) = Σ s², s over the 4 samples of block f·bands+m. None when
    * the clip is shorter than the geometry needs (callers drop, never
    * throw — the codec-family contract). Integer-exact: |s| ≤ 32768 and
    * 4 samples bound each energy < 2³², summed deltas < 2³⁴ in Long. */
  private def energies(w: WavCodec.Wav, frames: Int,
      bands: Int): Option[Array[Long]] = {
    val need = frames * bands * BlockLen
    if (w.samples.length < need) None
    else Some(Array.tabulate(frames * bands) { b =>
      var e = 0L
      var j = 0
      while (j < BlockLen) {
        val s = w.samples(b * BlockLen + j).toLong
        e += s * s
        j += 1
      }
      e
    })
  }

  /** Haitsma-Kalker sign bit for (f ≥ 1, m ≤ bands−2) over an energy
    * grid: (E(f,m) − E(f,m+1)) − (E(f−1,m) − E(f−1,m+1)) > 0. */
  @inline private def hkBit(e: Array[Long], bands: Int, f: Int,
      m: Int): Boolean =
    (e(f * bands + m) - e(f * bands + m + 1)) -
      (e((f - 1) * bands + m) - e((f - 1) * bands + m + 1)) > 0

  /** 64-bit compact fingerprint of one encoded clip: decode WAV →
    * 17×5 block energies → 16×4 HK sign bits, bit (f−1)·4+m. */
  def fingerprintOf(media: Array[Byte]): Option[Long] =
    WavCodec.decode(media).flatMap(energies(_, Frames, Bands)).map { e =>
      var h = 0L
      var f = 1
      while (f < Frames) {
        var m = 0
        while (m < Bands - 1) {
          if (hkBit(e, Bands, f, m)) h |= 1L << ((f - 1) * (Bands - 1) + m)
          m += 1
        }
        f += 1
      }
      h
    }

  /** 256-bit wide fingerprint: 17×17 energies → 16×16 HK bits, bit
    * (f−1)·16+m packed little-endian into 4 longs. */
  def fingerprint256Of(media: Array[Byte]): Option[Array[Long]] =
    WavCodec.decode(media).flatMap(energies(_, WideFrames, WideBands))
      .map { e =>
        val w = new Array[Long](4)
        var f = 1
        while (f < WideFrames) {
          var m = 0
          while (m < WideBands - 1) {
            if (hkBit(e, WideBands, f, m)) {
              val idx = (f - 1) * (WideBands - 1) + m
              w(idx >> 6) |= 1L << (idx & 63)
            }
            m += 1
          }
          f += 1
        }
        w
      }

  /** Decode + fingerprint as per-partition map work over an
    * (asset_id, media) frame — batch or streaming (stateless). The
    * output column is named `dhash` so the image family's band/verify
    * operators apply unchanged. */
  def fingerprints(assets: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    assets.select(col("asset_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, media) =>
        fingerprintOf(media).map((id, _))
      })
      .toDF("asset_id", "dhash")
  }

  /** Decode + wide fingerprint: (asset_id, dwords array<long>[4]). */
  def fingerprintsWide(assets: DataFrame, s: SparkSession): DataFrame = {
    import s.implicits._
    assets.select(col("asset_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, media) =>
        fingerprint256Of(media).map((id, _))
      })
      .toDF("asset_id", "dwords")
  }

  /** q288: corpus synth → WAV encode → decode → fingerprint → banded
    * exact pair join ([[ImageNeardup.neardupPairs]] — hash-agnostic). */
  def audioNeardupPairs(s: SparkSession, d: String): DataFrame =
    ImageNeardup.neardupPairs(fingerprints(audioCorpus(s, d), s))

  /** q289: the apply form (per-clip near-dup degree + min-id-survivor
    * keep verdict) over the same corpus. */
  def audioNeardupApply(s: SparkSession, d: String): DataFrame =
    ImageNeardup.neardupApply(fingerprints(audioCorpus(s, d), s))

  /** q290: the wide-fingerprint contract query — 17×17 corpus → 256-bit
    * fingerprint → 8-banded exact pair join (the scale path). */
  def audioNeardupWide(s: SparkSession, d: String): DataFrame =
    ImageNeardup.neardupPairsWide(fingerprintsWide(audioCorpusWide(s, d), s))

  /** DuckDB mirror of the corpus + fingerprint arithmetic: rebuilds the
    * PCM samples from the SAME md5+integer formulas (hex pairs parsed
    * via strpos, the [[ImageNeardup]] oracle idiom), aggregates block
    * energies, derives the HK sign bits from four self-joins on the
    * energy grid, packs them into HUGEINTs (BIGINT shifts raise on bit
    * 63), and brute-forces all pairs. The Spark side goes the long way —
    * synth → WAV encode → decode → energies → bits — so a WavCodec
    * regression diverges the hashes and fails the driver gate. */
  private def oracleGrid(frames: Int, bands: Int): String = {
    val n = frames * bands * BlockLen
    s"WITH ks AS (SELECT doc_id AS key, doc_id AS seed, -1 AS pb FROM documents " +
      s"UNION ALL SELECT doc_id + 10000000, doc_id, " +
      s"CAST((doc_id % $frames) * $bands + ${bands - 1} AS INT) " +
      "FROM documents WHERE doc_id % 20 = 0), " +
      "sm AS (SELECT key, i // 4 AS blk, " +
      "(CASE WHEN i // 4 = pb THEN (r + 128) % 256 ELSE r END) - 128 AS s " +
      "FROM (SELECT key, pb, i, " +
      "(strpos('0123456789abcdef', substr(md5(CAST(seed AS VARCHAR) " +
      "|| '_' || CAST(i // 16 AS VARCHAR)), 2*(i % 16) + 1, 1)) - 1) * 16 " +
      "+ strpos('0123456789abcdef', substr(md5(CAST(seed AS VARCHAR) " +
      "|| '_' || CAST(i // 16 AS VARCHAR)), 2*(i % 16) + 2, 1)) - 1 " +
      s"AS r FROM ks, range(0, $n) t(i))), " +
      s"e AS (SELECT key, blk // $bands AS f, blk % $bands AS m, " +
      "sum(s*s) AS e FROM sm GROUP BY key, blk)"
  }

  /** The 4-way energy self-join producing one row per (key, f≥1,
    * m≤bands−2) with the HK delta `d`. */
  private def oracleBits(bands: Int): String =
    ", b AS (SELECT c.key, c.f, c.m, " +
      "(c.e - rm.e) - (um.e - ur.e) AS d " +
      "FROM e c JOIN e rm ON rm.key = c.key AND rm.f = c.f AND rm.m = c.m + 1 " +
      "JOIN e um ON um.key = c.key AND um.f = c.f - 1 AND um.m = c.m " +
      "JOIN e ur ON ur.key = c.key AND ur.f = c.f - 1 AND ur.m = c.m + 1 " +
      s"WHERE c.f >= 1 AND c.m <= ${bands - 2})"

  private val OracleHash: String = oracleGrid(Frames, Bands) +
    oracleBits(Bands) +
    ", h AS (SELECT key, bit_or(CASE WHEN d > 0 " +
    s"THEN 1::HUGEINT << CAST((f-1)*${Bands - 1} + m AS INT) " +
    "ELSE 0::HUGEINT END) AS fp FROM b GROUP BY key)"

  val PairsOracleSql: String = OracleHash +
    " SELECT a.key AS asset_a, b.key AS asset_b, " +
    "CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming " +
    "FROM h a JOIN h b ON a.key < b.key " +
    s"WHERE bit_count(xor(a.fp, b.fp)) <= $DefaultMaxHamming"

  val ApplyOracleSql: String = OracleHash +
    ", pr AS (SELECT a.key AS ka, b.key AS kb FROM h a JOIN h b " +
    s"ON a.key < b.key WHERE bit_count(xor(a.fp, b.fp)) <= $DefaultMaxHamming), " +
    "nb AS (SELECT ka AS id, kb AS nb FROM pr UNION ALL SELECT kb, ka FROM pr) " +
    "SELECT k.key AS asset_id, count(nb.nb) AS n_neardups, " +
    "count(CASE WHEN nb.nb < k.key THEN 1 END) = 0 AS keep " +
    "FROM ks k LEFT JOIN nb ON nb.id = k.key GROUP BY k.key"

  val WideOracleSql: String = {
    val grid = oracleGrid(WideFrames, WideBands) + oracleBits(WideBands)
    val perWord = (0 until 4).map { w =>
      s"bit_or(CASE WHEN ((f-1)*${WideBands - 1} + m) // 64 = $w AND d > 0 " +
        s"THEN 1::HUGEINT << CAST(((f-1)*${WideBands - 1} + m) % 64 AS INT) " +
        s"ELSE 0::HUGEINT END) AS w$w"
    }.mkString(", ")
    // bit_count returns TINYINT — cast each word's term before summing
    val ham = (0 until 4)
      .map(w => s"CAST(bit_count(xor(a.w$w, b.w$w)) AS INT)")
      .mkString(" + ")
    grid + s", h AS (SELECT key, $perWord FROM b GROUP BY key)" +
      s" SELECT a.key AS asset_a, b.key AS asset_b, $ham AS hamming " +
      s"FROM h a JOIN h b ON a.key < b.key WHERE $ham <= $WideMaxHamming"
  }
}
