package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

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
}
