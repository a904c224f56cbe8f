package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Tables

/** Sessionization of the events stream: a session is a maximal run of a
  * user's events with gaps < `GapMs`.
  *
  * Two implementations with one semantics:
  *  - [[batch]]: lag + running-sum window functions — a declarative plan,
  *    one shuffle on user_id (oracle-checkable in SQL).
  *  - [[streaming]]: `flatMapGroupsWithState` with processing-time timeout —
  *    the unbounded form, emitting a session when its gap closes. State per
  *    user is O(1) (current session bounds), so executor memory is bounded
  *    by active users, not history.
  */
object Sessionize {

  val GapMs: Long = 30 * 60 * 1000L

  /** Session summaries: (user_id, session_id ordinal, start/end epoch ms,
    * n_events). Millisecond timestamps so batch results hash-match engines
    * with different sub-ms timestamp precision. */
  def batch(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"))
    val marked = ev
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull ||
          col("ts_ms") - col("prev_ms") > GapMs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
  }

  final case class Event(user_id: Long, ts_ms: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class Session(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Long)

  /** Event-time streaming sessionization: the watermark, not wall-clock,
    * closes idle sessions — late events inside the watermark still extend
    * their session, and a session is emitted exactly when the watermark
    * passes its end + gap. Requires an event-time column with a watermark
    * on the input. */
  def streamingEventTime(events: Dataset[EventT]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[EventT], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(st => Session(userId, st.start, st.end, st.n)).toList
            state.remove()
            out.iterator
          } else {
            var cur = state.getOption
            val closed = List.newBuilder[Session]
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val ms = e.ts.getTime
              cur match {
                case Some(st) if ms - st.end <= GapMs =>
                  cur = Some(st.copy(end = math.max(st.end, ms),
                    n = st.n + 1))
                case Some(st) =>
                  closed += Session(userId, st.start, st.end, st.n)
                  cur = Some(SessionState(ms, ms, 1))
                case None =>
                  cur = Some(SessionState(ms, ms, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // fire when the WATERMARK (event time) passes session end+gap
              state.setTimeoutTimestamp(st.end + GapMs)
            }
            closed.result().iterator
          }
      }
  }

  final case class EventT(user_id: Long, ts: java.sql.Timestamp)

  /** Streaming sessionization: per-user state holds only the open session;
    * events extend it or close it (emitting the finished session). Timeout
    * flushes idle sessions. */
  def streaming(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(st => Session(userId, st.start, st.end, st.n)).toList
            state.remove()
            out.iterator
          } else {
            var cur = state.getOption
            val closed = List.newBuilder[Session]
            it.toSeq.sortBy(_.ts_ms).foreach { e =>
              cur match {
                case Some(st) if e.ts_ms - st.end <= GapMs =>
                  cur = Some(st.copy(end = e.ts_ms, n = st.n + 1))
                case Some(st) =>
                  closed += Session(userId, st.start, st.end, st.n)
                  cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
                case None =>
                  cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
              }
            }
            cur.foreach(state.update)
            state.setTimeoutDuration(GapMs)
            closed.result().iterator
          }
      }
  }
}
