package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** STREAMING as-of join — the batch `AsOfJoinExec` semantics (for every
  * left row, the greatest right time ≤ left time among equal keys, LEFT
  * OUTER) carried to Structured Streaming with watermark-driven
  * finalization.
  *
  * A left row at time t can only be answered once no earlier-timestamped
  * right row can still arrive — i.e. once the watermark passes t. So the
  * per-key state buffers BOTH sides' pending rows, and each watermark
  * advance (data arrival or event-time timeout) emits every left row
  * with t ≤ watermark, matched against the rights visible at that
  * moment.
  *
  * The state-pruning invariant that keeps this bounded: once the
  * watermark passes right rows r1 < r2 ≤ wm, r1 can never again be the
  * "greatest right ≤ t" for any future left (future lefts have t > wm ≥
  * r2 > r1) — so of the rights at-or-under the watermark only the
  * LATEST survives; rights above it are still pending. State per key is
  * one right row + the in-flight (within-watermark) arrivals,
  * independent of stream length — the streaming analog of
  * `AsOfJoinExec`'s one buffered row per partition.
  *
  * Late-data contract (inherited from the stateful operator): input rows
  * with ts ≤ the current watermark are dropped before the state function
  * runs — including, at the very first batch, events at epoch 0 (the
  * initial watermark). Late-but-above-watermark rights DO fold in and
  * can win matches (spec-pinned).
  */
object StreamingAsOf {

  /** Input row: one side's event. `value` is null-free on the right side
    * (the payload carried to matched lefts). */
  final case class In(key: Long, tsMs: Long, left: Boolean, value: Double,
      ts: java.sql.Timestamp)

  final case class AsOfState(lefts: List[(Long, Double)],
      rights: List[(Long, Double)])

  /** Output: each finalized left row with its matched right (or nulls). */
  final case class Out(key: Long, ts_ms: Long, left_value: Double,
      right_ms: Option[Long], right_value: Option[Double])

  /** `in` must carry a watermark on `ts`. Append-mode output: each left
    * row is emitted exactly once, when the watermark passes its time.
    * `toleranceMs` mirrors the batch operator's merge_asof bound: a
    * nearest right older than the bound null-extends (pruning is
    * unchanged — tolerance only removes matches, and the latest
    * at-or-before right is always the only candidate). */
  def backward(in: Dataset[In],
      toleranceMs: Option[Long] = None): Dataset[Out] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state) =>
          val prev = state.getOption.getOrElse(AsOfState(Nil, Nil))
          var lefts = prev.lefts
          var rights = prev.rights
          if (!state.hasTimedOut) {
            it.foreach { e =>
              if (e.left) lefts ::= (e.tsMs, e.value)
              else rights ::= (e.tsMs, e.value)
            }
          }
          val wm = state.getCurrentWatermarkMs()
          // finalize every left at-or-under the watermark: all rights
          // with smaller-or-equal times have arrived by now
          val (ready, pendingL) = lefts.partition(_._1 <= wm)
          val sortedR = rights.sortBy(r => (r._1, r._2))
          val out = ready.sortBy(_._1).map { case (t, v) =>
            val m = sortedR.takeWhile(_._1 <= t).lastOption
              .filter(r => toleranceMs.forall(t - r._1 <= _))
            Out(key, t, v, m.map(_._1), m.map(_._2))
          }
          // prune rights: of those ≤ wm only the latest can ever match a
          // future left; everything above the watermark is still live
          val (rOld, rLive) = sortedR.partition(_._1 <= wm)
          val keptR = rOld.lastOption.toList ++ rLive
          if (pendingL.isEmpty && keptR.isEmpty) {
            state.remove()
          } else {
            state.update(AsOfState(pendingL, keptR))
            // wake when the watermark passes the earliest pending left —
            // guarantees emission even if no further data arrives for
            // this key. (+1: timeouts fire strictly AFTER the timestamp)
            if (pendingL.nonEmpty)
              state.setTimeoutTimestamp(pendingL.map(_._1).min + 1)
          }
          out.iterator
      }
  }
}
