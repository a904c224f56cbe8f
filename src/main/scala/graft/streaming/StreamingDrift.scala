package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Continuously-maintained distribution-drift monitor: the streaming arm
  * of TextQueries.hashedDrift / driftApplyDf (q268). Each source's
  * cumulative 256-bucket token histogram is keyed streaming state —
  * BOUNDED state by construction (≤ 256 longs per source, regardless of
  * stream length or vocabulary, the same fixed-state argument as
  * StreamingSketch) — and every trigger the source receives data it
  * emits refreshed KL(source-so-far ‖ frozen reference) in bits
  * (Update mode).
  *
  * The reference is the SAME frozen ≤256-entry map driftApplyDf takes
  * (train once on a reference corpus via TextQueries.driftReference,
  * score a live stream forever) and the KL uses the same Laplace-
  * smoothed formula, so stream state after N triggers scores exactly
  * like the batch of all N triggers' data — the spec pins that parity.
  *
  * At 100 TB/day: tokens bucket map-side (a projection on the stream),
  * the shuffle per trigger carries (source, bucket) partial counts —
  * ≤ |sources|·256 rows after map-side combine — and the state store
  * holds |sources| entries of 256 counters. Nothing grows with history.
  */
object StreamingDrift {

  /** One source's cumulative bucket counts. */
  final case class DriftState(counts: Map[String, Long])

  /** One source's refreshed drift reading. */
  final case class SourceDrift(source: String, nTokens: Long,
      klBits: Double)

  private val Ln2 = math.log(2.0)
  private def log2(x: Double): Double = math.log(x) / Ln2

  /** KL(counts ‖ ref) in bits, Laplace-smoothed reference — the scala
    * form of driftApplyDf's column expression (shared by the emit path
    * and the spec's independent recompute). */
  def klBits(counts: Map[String, Long], ref: Map[String, Long]): Double = {
    val ns = counts.values.sum
    val nr = ref.values.sum
    if (ns == 0L) 0.0
    else {
      val kl = counts.map { case (b, k) =>
        (k.toDouble / ns) * (log2(k.toDouble) - log2(ns.toDouble) +
          log2(nr + 256.0) - log2(ref.getOrElse(b, 0L) + 1.0))
      }.sum
      math.rint(kl * 1e4) / 1e4
    }
  }

  /** rows: (source, bucket) — one row per token, buckets from
    * TextQueries' substring(md5(token), 1, 2) projection. */
  def drift(rows: Dataset[(String, String)], ref: Map[String, Long])
      : Dataset[SourceDrift] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .mapGroupsWithState[DriftState, SourceDrift](
        GroupStateTimeout.NoTimeout) { (source, it, state) =>
        var counts = state.getOption.map(_.counts).getOrElse(Map.empty)
        it.foreach { case (_, b) =>
          counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
        }
        state.update(DriftState(counts))
        SourceDrift(source, counts.values.sum, klBits(counts, ref))
      }
  }
}
