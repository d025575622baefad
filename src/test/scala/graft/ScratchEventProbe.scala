package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off probe: event-time operator wall time at 1× vs 10× events
  * (disjoint user/id copies — events AND keys scale 10×), recorded in
  * PLANS.md. All five operators are single-shuffle shapes (hash agg on
  * (window,type), session-window agg on user, bucketed equi-joins), so
  * the expectation is ~linear growth dominated by the scheduling floor. */
object ScratchEventProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import graft.streaming.EventStreams
    import graft.operators.Joins
    val base = graft.model.KG.eventsNs(spark, "/root/testdata/sf0.1")
    def rep(k: Int): DataFrame =
      (0 until k).map(i => base
        .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000L)))
        .reduce(_ unionAll _)
        .localCheckpoint(true)
    for (k <- Seq(1, 10)) {
      val ev = rep(k)
      ev.count()
      val asTs = ev.withColumn("ts",
        timestamp_seconds(expr("ts div 1000000000")))
      val ops: Seq[(String, () => Long)] = Seq(
        "windows" -> (() => EventStreams.windowedCountsBatch(asTs).count()),
        "sliding" -> (() => EventStreams.slidingCountsBatch(asTs).count()),
        "sessions" -> (() => EventStreams.sessions(asTs).count()),
        "interval_join" -> (() => EventStreams.intervalJoinBatch(asTs).count()),
        "funnel" -> (() => EventStreams.funnel(asTs).count()),
        "range_join" -> (() => {
          val clicks = ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
          val errors = ev.filter(col("event_type") === "error")
            .select(col("user_id"), col("ts"), col("event_id").as("error_id"))
          Joins.rangeBucketed(clicks, errors, Seq("user_id"), "ts", "ts",
            lower = 3600L * 1000 * 1000 * 1000, upper = 0L, Seq("error_id"))
            .count()
        }))
      ops.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        val n = f()
        println(f"PROBE ${k}x $name%-14s time=${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
