package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.MGSummary

/** Streaming heavy hitters: the Misra-Gries summary (the same mergeable
  * sketch the batch q81 pipeline uses, graft.functions.MGSummary) held as
  * keyed streaming state.
  *
  * Items hash-partition into `shards` groups, each holding ONE ≤k-entry
  * summary — state is shards·k entries TOTAL regardless of stream length
  * or vocabulary, and each word lives in exactly one shard, so the
  * per-shard MG guarantee (est ≥ f(x) − n_shard/(k+1)) applies to its full
  * frequency. Every trigger folds the new arrivals into the summary and
  * emits the shard's refreshed candidate set (Update mode); the union of
  * shard candidates is the live heavy-hitter superset at any moment.
  */
object StreamingSketch {

  /** One shard's refreshed summary: total items seen and the current
    * candidate (item, est) entries. */
  final case class ShardSummary(shard: Int, n: Long,
      items: Map[String, Long])

  /** Keyed state (public: encoder codegen needs accessible accessors). */
  final case class MGState(items: Map[String, Long], n: Long)

  def streamingHeavyHitters(words: Dataset[String], shards: Int = 8,
      k: Int = 64): Dataset[ShardSummary] = {
    import words.sparkSession.implicits._
    words
      .map(w => (math.floorMod(w.hashCode, shards), w))
      .groupByKey(_._1)
      .mapGroupsWithState[MGState, ShardSummary](GroupStateTimeout.NoTimeout) {
        (shard, it, state) =>
          val prev = state.getOption.getOrElse(MGState(Map.empty, 0L))
          val mg = new MGSummary(k)
          prev.items.foreach { case (i, c) => mg.entries(i) = c }
          var n = prev.n
          it.foreach { case (_, w) => mg.offer(w); n += 1 }
          val next = MGState(mg.entries.toMap, n)
          state.update(next)
          ShardSummary(shard, n, next.items)
      }
  }

  /** One key's refreshed quantile estimates (emitted every trigger the
    * key receives data, Update mode). */
  final case class KeyQuantiles(key: String, n: Long, p50: Double,
      p95: Double, p99: Double)

  /** Keyed KLL state: the serialized ladder (same byte layout the batch
    * aggregate shuffles). */
  final case class KllState(bytes: Array[Byte])

  /** Streaming per-key quantiles: the SAME mergeable KLL summary the
    * batch q111 aggregate uses (graft.functions.KllSummary), held as
    * keyed streaming state — per-key latency/size percentiles over an
    * unbounded stream with O(k log n) state per key, never a buffer of
    * raw values. Every trigger folds new arrivals into the key's ladder
    * and emits refreshed p50/p95/p99 estimates (Update mode); the batch
    * spec's rank-error bound carries over because the state IS the batch
    * summary. */
  def streamingQuantiles(values: Dataset[(String, Double)], k: Int = 200)
      : Dataset[KeyQuantiles] = {
    import values.sparkSession.implicits._
    import graft.functions.KllSummary
    values
      .groupByKey(_._1)
      .mapGroupsWithState[KllState, KeyQuantiles](GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val sk = state.getOption
            .map(s => KllSummary.fromBytes(k, s.bytes))
            .getOrElse(new KllSummary(k))
          it.foreach { case (_, v) => sk.update(v) }
          state.update(KllState(sk.toBytes))
          val (vs, ws) = sk.sortedItems()
          def q(p: Double): Double =
            KllSummary.valueAtRank(vs, ws, p * math.max(sk.n - 1, 0L))
          KeyQuantiles(key, sk.n, q(0.5), q(0.95), q(0.99))
      }
  }

  /** A timestamped word (input row of the event-time variant). */
  final case class WordAt(word: String, ts: java.sql.Timestamp)

  /** One (tumbling window, shard)'s FINAL summary, emitted once the
    * watermark passes the window end. */
  final case class WindowShardSummary(windowStartMs: Long, shard: Int,
      n: Long, items: Map[String, Long])

  /** EVENT-TIME windowed heavy hitters ([[streamingHeavyHitters]] is
    * processing-order): state keys are (shard, tumbling window), so a
    * late arrival WITHIN the watermark folds into the window its event
    * time belongs to — not whichever trigger it happened to ride in on —
    * and each window's summary is emitted exactly once (Append mode),
    * when the watermark crosses the window end (EventTimeTimeout).
    * Arrivals beyond the watermark for an already-finalized window are
    * discarded instead of resurrecting state.
    *
    * `words` must already carry a watermark on `ts` (the caller owns the
    * lateness budget). State remains shards·k entries per OPEN window;
    * closed windows free theirs via `state.remove()`. */
  def windowedHeavyHitters(words: Dataset[WordAt],
      windowMs: Long = 3600000L, shards: Int = 8, k: Int = 64)
      : Dataset[WindowShardSummary] = {
    import words.sparkSession.implicits._
    words
      .groupByKey(w => (math.floorMod(w.word.hashCode, shards),
        math.floorDiv(w.ts.getTime, windowMs) * windowMs))
      .flatMapGroupsWithState[MGState, WindowShardSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((shard, winStart), it, state) =>
          if (state.hasTimedOut) {
            // watermark passed the window end: finalize and free
            val s = state.get
            state.remove()
            Iterator.single(
              WindowShardSummary(winStart, shard, s.n, s.items))
          } else if (winStart + windowMs <= state.getCurrentWatermarkMs()) {
            // beyond-watermark stragglers for a window that already
            // finalized (or will finalize this trigger with no state):
            // dropping them is the watermark contract
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(MGState(Map.empty, 0L))
            val mg = new MGSummary(k)
            prev.items.foreach { case (i, c) => mg.entries(i) = c }
            var n = prev.n
            it.foreach { w => mg.offer(w.word); n += 1 }
            state.update(MGState(mg.entries.toMap, n))
            state.setTimeoutTimestamp(winStart + windowMs)
            Iterator.empty
          }
      }
  }
}
