package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` schema
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference engine has no streaming layer (SURVEY §2.9 'absent
  * categories'); this module adds the standard stream-analytics operators a
  * production engine needs, Spark-first: event-time windows + watermarks,
  * session windows, and arbitrary keyed state via mapGroupsWithState.
  * All transforms are expressed on unbounded DataFrames — identical code
  * paths run in batch mode (same functions applied to a static frame).
  */
object EventStreams {

  /** Tumbling event-time window counts with a watermark for state expiry. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 minute",
                     watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Session windows per user: events separated by less than `gap` fuse. */
  def sessions(events: DataFrame, gap: String = "5 minutes",
               watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"), col("session_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom keyed state (KeyValueGroupedDataset.mapGroupsWithState):
    * running per-user event count + value total across micro-batches. */
  def runningTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout) {
        case (uid, batch, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val (n, tot) = batch.foldLeft((prev.n, prev.total)) {
            case ((c, s), e) => (c + 1, s + e.value)
          }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          next
      }
  }

  final case class OpenSession(start: Long, last: Long, n: Long, total: Double)
  final case class ClosedSession(user_id: Long, start_s: Long, end_s: Long,
                                 n_events: Long, total_value: Double)

  /** Custom sessionization via flatMapGroupsWithState (the 0..n-output
    * state API — mapGroupsWithState can't emit a variable number of closed
    * sessions per batch). Events more than `gapSec` apart close the open
    * session; closed sessions are EMITTED, the open one stays in state.
    * State per key is one small case class — bounded regardless of stream
    * length, the property that matters at production scale. */
  def sessionize(events: Dataset[Event], gapSec: Long = 300): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, batch, state: GroupState[OpenSession]) =>
          val sorted = batch.map(e => (e.ts.getTime / 1000, e.value))
            .toSeq.sortBy(_._1)
          var open = state.getOption
          val closed = scala.collection.mutable.ListBuffer.empty[ClosedSession]
          sorted.foreach { case (s, v) =>
            open match {
              case Some(o) if s - o.last <= gapSec =>
                // min/max guard: a late event from a later micro-batch may
                // precede the open session's bounds — it must widen them,
                // not drag `last` backwards (which would emit end < start
                // and mis-split subsequent events).
                open = Some(OpenSession(math.min(o.start, s),
                                        math.max(o.last, s),
                                        o.n + 1, o.total + v))
              case Some(o) =>
                closed += ClosedSession(uid, o.start, o.last, o.n, o.total)
                open = Some(OpenSession(s, s, 1L, v))
              case None =>
                open = Some(OpenSession(s, s, 1L, v))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
  }

  /** Streaming deduplication: drop repeated event_ids within the watermark
    * horizon — the streaming face of the pipeline dedup operators (state
    * bounded by the watermark). */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch-mode twin of [[windowedCounts]] — same expressions on a static
    * frame; used to cross-check streaming output in specs and to serve the
    * operator over the parquet testdata. */
  def windowedCountsBatch(events: DataFrame, windowLen: String = "1 minute"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("n"), col("sum_value"))
}
