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

  /** SLIDING event-time windows (length > slide ⇒ overlapping): each event
    * contributes to length/slide windows — the moving-average shape
    * (rate-over-last-10-min updated every minute). Same watermark state
    * contract as [[windowedCounts]]; state per key is bounded by the
    * window length + watermark horizon. */
  def slidingCounts(events: DataFrame, windowLen: String = "2 minutes",
                    slide: String = "1 minute",
                    watermark: String = "4 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Batch twin of [[slidingCounts]]. */
  def slidingCountsBatch(events: DataFrame, windowLen: String = "2 minutes",
                         slide: String = "1 minute"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
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
    * length, the property that matters at production scale.
    *
    * Late-event contract: an event within `gapSec` of the open session's
    * bounds widens them (min/max — never drags `last` backwards, which
    * would emit end < start and mis-split subsequent events). An event
    * OLDER than `start - gapSec` is out of scope for the open session —
    * merging it would produce a session violating the gap invariant — so
    * it is dropped (a production deployment would route it to a
    * side-output of late records instead).
    *
    * With `idleFlushMs` > 0, open sessions idle longer than that much
    * processing time are flushed via ProcessingTimeTimeout, so the final
    * session per user is eventually emitted even if the user never
    * returns. Default 0 = no flush (NoTimeout): ProcessingTimeTimeout
    * makes the micro-batch engine re-run batches continuously to check
    * timers — opt in only when the sink needs eventual completeness. */
  def sessionize(events: Dataset[Event], gapSec: Long = 300,
                 idleFlushMs: Long = 0L): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleFlushMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, timeoutConf) {
        case (uid, batch, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val flushed = state.getOption.map(o =>
              ClosedSession(uid, o.start, o.last, o.n, o.total)).iterator
            state.remove()
            flushed
          } else {
            val sorted = batch.map(e => (e.ts.getTime / 1000, e.value))
              .toSeq.sortBy(_._1)
            var open = state.getOption
            val closed = scala.collection.mutable.ListBuffer.empty[ClosedSession]
            sorted.foreach { case (s, v) =>
              open match {
                case Some(o) if s < o.start - gapSec =>
                  // too late to belong to the open session: drop
                case Some(o) if s - o.last <= gapSec =>
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
            open.foreach { o =>
              state.update(o)
              if (idleFlushMs > 0) state.setTimeoutDuration(idleFlushMs)
            }
            closed.iterator
          }
      }
  }

  /** Streaming deduplication: drop repeated event_ids within the watermark
    * horizon — the streaming face of the pipeline dedup operators (state
    * bounded by the watermark). */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each `leftType` event (e.g. click)
    * enriched with the same user's `rightType` events (e.g. views) from
    * the preceding `windowSec` seconds — the attribution/funnel join.
    * Both sides are unbounded; the time-bound condition is what makes it
    * runnable as a STREAMING join: with a watermark on both inputs, Spark
    * derives the state horizon from the bound and evicts right-side rows
    * older than `watermark + windowSec`, so state stays bounded no matter
    * how long the streams run. Use [[intervalJoinBatch]]'s expressions via
    * `events.withWatermark(...)` on both sides for the streaming form
    * (spec-covered); the batch twin aggregates to one row per left event:
    * (click_id, user_id, n_views, views_value). */
  def intervalJoinBatch(events: DataFrame, leftType: String = "click",
                        rightType: String = "view",
                        windowSec: Long = 300): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("event_id").as("click_id"), col("user_id"),
              col("ts").as("l_ts"))
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
              col("value").as("r_value"))
    l.join(r,
        col("user_id") === col("r_user") && col("r_ts") <= col("l_ts") &&
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL $windowSec SECONDS"),
        "left")
      .groupBy("click_id", "user_id")
      .agg(count(col("r_ts")).as("n_views"),
           round(coalesce(sum("r_value"), lit(0.0)), 4).as("views_value"))
  }

  /** Streaming form of [[intervalJoinBatch]] (pre-aggregation): watermarked
    * left-outer interval join emitting one row per (left event, matched
    * right event or null). Inner rows emit as matches arrive; unmatched
    * left rows emit once the watermark passes their join horizon. */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         windowSec: Long = 300,
                         watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
              col("ts").as("l_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
              col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") && col("r_ts") <= col("l_ts") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $windowSec SECONDS"),
      "leftOuter")
  }

  /** Conversion funnel: of the users with a `fromType` event, how many
    * reach a `toType` event within `windowSec` seconds AFTER one — the
    * product-analytics staple. One interval semi-join (equi on user +
    * time-range residual) and two tiny count aggregates; the event frame
    * never crosses a shuffle beyond the user-keyed join. Output: one row
    * (n_from_users, n_converted, conv_rate). */
  def funnel(events: DataFrame, fromType: String = "click",
             toType: String = "purchase", windowSec: Long = 600): DataFrame = {
    // Anonymous (NULL-user) events can't be attributed to a funnel and
    // would silently deflate the rate (COUNT over a distinct() keeps the
    // null group; SQL COUNT(DISTINCT ...) would not) — excluded.
    val from = events.filter(col("event_type") === fromType &&
                             col("user_id").isNotNull)
      .select(col("user_id"), col("ts").as("f_ts"))
    val to = events.filter(col("event_type") === toType &&
                           col("user_id").isNotNull)
      .select(col("user_id").as("t_user"), col("ts").as("t_ts"))
    val converted = from.join(to,
        col("user_id") === col("t_user") && col("t_ts") >= col("f_ts") &&
          col("t_ts") <= col("f_ts") + expr(s"INTERVAL $windowSec SECONDS"),
        "left_semi")
      .select("user_id").distinct()
    from.select("user_id").distinct().agg(count(lit(1)).as("n_from_users"))
      .crossJoin(broadcast(converted.agg(count(lit(1)).as("n_converted"))))
      .select(col("n_from_users"), col("n_converted"),
              // Guarded: with zero fromType users the rate is 0.0, not a
              // NULL/engine-dependent division-by-zero artifact.
              when(col("n_from_users") > 0,
                   round(col("n_converted") / col("n_from_users"), 6))
                .otherwise(lit(0.0)).as("conv_rate"))
  }

  /** Batch twin of [[dedupStream]]: plain key dedup on a static frame —
    * what the watermark-bounded streaming state converges to when every
    * duplicate arrives inside the horizon. */
  def dedupBatch(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Batch-mode twin of [[windowedCounts]] — same expressions on a static
    * frame; used to cross-check streaming output in specs and to serve the
    * operator over the parquet testdata. */
  def windowedCountsBatch(events: DataFrame, windowLen: String = "1 minute"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Daily resampling with gap fill and last-observation-carried-forward
    * (the time-series regularization operator): per user, one row per
    * calendar day between the user's first and last event — days with no
    * events are emitted with `n_events = 0`, `gap = 1`, and the previous
    * day's closing value carried forward. The "closing value" is the
    * value of the lexicographically-last (ts, event_id) event of the day
    * (deterministic under ties). Windows are PARTITIONED by user (never
    * global — PlanGuard-safe), the spine is `sequence(min_day, max_day)`
    * per user (no driver-side calendar), and input `ts` is the canonical
    * epoch-ns long from [[graft.model.KG.eventsNs]]. */
  def resampleDailyLocf(events: DataFrame): DataFrame = {
    val daily = events
      .withColumn("day", to_date(timestamp_micros(expr("ts div 1000"))))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"),
           max(struct(col("ts"), col("event_id"), col("value")))
             .as("last_ev"))
      .select(col("user_id"), col("day"), col("n_events"),
              col("last_ev.value").as("day_value"))
    val spine = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
              explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day").cast("string").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(last(col("day_value"), ignoreNulls = true).over(w), 6)
          .as("locf_value"),
        when(col("n_events").isNull, 1L).otherwise(0L).as("gap"))
  }

  /** Daily resampling with LINEAR interpolation across gaps (the other
    * standard series-regularization fill next to LOCF): interior gap
    * days get prev + (next − prev)·(day − prevDay)/(nextDay − prevDay)
    * over the per-user calendar spine; spine endpoints are observed
    * days by construction, so prev/next always exist. Same windowed
    * shape as [[resampleDailyLocf]] — partitioned Window, no driver
    * state, scales per user key. */
  def resampleDailyInterp(events: DataFrame): DataFrame = {
    val daily = events
      .withColumn("day", to_date(timestamp_micros(expr("ts div 1000"))))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"),
           max(struct(col("ts"), col("event_id"), col("value")))
             .as("last_ev"))
      .select(col("user_id"), col("day"), col("n_events"),
              col("last_ev.value").as("day_value"))
    val spine = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
              explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("user_id").orderBy("day")
    val wPrev = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    val wNext = w.rowsBetween(W.currentRow, W.unboundedFollowing)
    val obsDay = when(col("day_value").isNotNull, col("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_value"),
        last(col("day_value"), ignoreNulls = true).over(wPrev).as("pv"),
        last(obsDay, ignoreNulls = true).over(wPrev).as("pd"),
        first(col("day_value"), ignoreNulls = true).over(wNext).as("nv"),
        first(obsDay, ignoreNulls = true).over(wNext).as("nd"))
      .select(col("user_id"), col("day").cast("string").as("day"),
        col("n_events"),
        round(when(col("day_value").isNotNull, col("day_value"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            datediff(col("day"), col("pd")) /
            datediff(col("nd"), col("pd"))), 6).as("interp_value"),
        when(col("day_value").isNull, 1L).otherwise(0L).as("gap"))
  }
}
