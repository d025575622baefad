package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.KG
import graft.operators.Joins
import graft.streaming.EventStreams

/** Schema-drift regression guard (round-7 post-mortem): the driver's
  * testdata has shipped `events.ts` as BIGINT nanoseconds, parquet
  * TIMESTAMP(NANOS), and timestamp[us] (TIMESTAMP_NTZ) across
  * regenerations; the r7 drift to timestamp[us] silently broke all six
  * event-time queries. This spec writes one tiny events table in THREE
  * encodings (long-ns, TIMESTAMP, TIMESTAMP_NTZ), routes each through
  * [[KG.eventsNs]], and asserts every event-time operator returns
  * identical results on each — so the next regeneration cannot break
  * them without a red spec. */
class EventsTsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // Timestamps at whole-microsecond granularity (every encoding round-trips
  // exactly); layout exercises windows, sessions, funnel and range matches.
  private val rows = Seq(
    // (event_id, ts_sec offset from an arbitrary base, user, type, value)
    (1L, 10L, 1L, "click", 1.0),
    (2L, 25L, 1L, "view", 2.0),
    (3L, 40L, 1L, "purchase", 3.0),
    (4L, 70L, 1L, "error", 4.0),
    (5L, 75L, 1L, "click", 5.0),
    (6L, 10L, 2L, "view", 6.0),
    (7L, 500L, 2L, "click", 7.0),
    (8L, 1300L, 2L, "purchase", 8.0),
    (9L, 20L, 3L, "error", 9.0),
    (10L, 3700L, 3L, "click", 10.0))
  private val baseSec = 1704067200L // 2024-01-01T00:00:00Z

  private def nsDf: DataFrame =
    rows.toDF("event_id", "off", "user_id", "event_type", "value")
      .withColumn("ts", (col("off") + lit(baseSec)) * lit(1000000000L))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  private def writeEncodings(): (String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory("events_enc").toString
    val (dLong, dTs, dNtz) = (s"$base/long", s"$base/ts", s"$base/ntz")
    nsDf.coalesce(1).write.parquet(s"$dLong/events.parquet")
    nsDf.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .coalesce(1).write.parquet(s"$dTs/events.parquet")
    nsDf.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      .coalesce(1).write.parquet(s"$dNtz/events.parquet")
    (dLong, dTs, dNtz)
  }

  test("eventsNs yields identical canonical ns for all three encodings") {
    val (dLong, dTs, dNtz) = writeEncodings()
    def tsSet(dir: String) = KG.eventsNs(spark, dir)
      .select("event_id", "ts").as[(Long, Long)].collect().toSet
    val want = rows.map(r => (r._1, (r._2 + baseSec) * 1000000000L)).toSet
    assert(tsSet(dLong) == want)
    assert(tsSet(dTs) == want)
    assert(tsSet(dNtz) == want)
    // NTZ normalization must NOT depend on spark.sql.session.timeZone:
    // wall-clock values are UTC-naive by convention, and a library caller
    // in any session timezone must get the same epochs (r8 ADVICE).
    val savedTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      assert(tsSet(dNtz) == want)
    } finally spark.conf.set("spark.sql.session.timeZone", savedTz)
  }

  test("every event-time operator is encoding-invariant through eventsNs") {
    val (dLong, dTs, dNtz) = writeEncodings()

    def asTs(dir: String): DataFrame = KG.eventsNs(spark, dir)
      .withColumn("ts", timestamp_seconds(expr("ts div 1000000000")))

    // Each operator as its call site uses it; results collected to sorted
    // row-sets for cross-encoding comparison.
    val operators: Seq[(String, String => Set[String])] = Seq(
      "windowedCountsBatch" -> { d: String =>
        EventStreams.windowedCountsBatch(asTs(d))
          .select(unix_timestamp(col("win_start")), col("event_type"),
                  col("n"), col("sum_value"))
          .collect().map(_.toString).toSet },
      "slidingCountsBatch" -> { d: String =>
        EventStreams.slidingCountsBatch(asTs(d))
          .select(unix_timestamp(col("win_start")), col("event_type"),
                  col("n"), col("sum_value"))
          .collect().map(_.toString).toSet },
      "sessions" -> { d: String =>
        EventStreams.sessions(asTs(d))
          .select(col("user_id"), col("n_events"), col("session_value"))
          .collect().map(_.toString).toSet },
      "intervalJoinBatch" -> { d: String =>
        EventStreams.intervalJoinBatch(asTs(d))
          .collect().map(_.toString).toSet },
      "funnel" -> { d: String =>
        EventStreams.funnel(asTs(d)).collect().map(_.toString).toSet },
      "asOf" -> { d: String =>
        val ev = KG.eventsNs(spark, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
        Joins.asOf(clicks, purchases, Seq("user_id"), "ts", Seq("purchase_id"))
          .select("user_id", "click_id", "purchase_id")
          .collect().map(_.toString).toSet },
      "rangeBucketed" -> { d: String =>
        val ev = KG.eventsNs(spark, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id").as("error_id"))
        Joins.rangeBucketed(clicks, errors, Seq("user_id"), "ts", "ts",
            lower = 3600L * 1000 * 1000 * 1000, upper = 0L, Seq("error_id"))
          .select("user_id", "click_id", "error_id")
          .collect().map(_.toString).toSet })

    operators.foreach { case (name, run) =>
      val onLong = run(dLong)
      assert(onLong.nonEmpty, s"$name produced no rows — vacuous test")
      assert(run(dTs) == onLong, s"$name differs on TIMESTAMP encoding")
      assert(run(dNtz) == onLong, s"$name differs on TIMESTAMP_NTZ encoding")
    }
  }
}
