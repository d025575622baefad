package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, UserRunning}

/** Structured Streaming: windowed aggregation and keyed state, verified via
  * MemoryStream micro-batches against the batch twin. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000)

  val batch1 = Seq(
    Event(1, ts(10), 1, "click", 1.0),
    Event(2, ts(20), 1, "click", 2.0),
    Event(3, ts(70), 2, "view", 5.0))
  val batch2 = Seq(
    Event(4, ts(80), 1, "click", 3.0),
    Event(5, ts(130), 2, "view", 7.0))

  test("windowedCounts over a MemoryStream equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.windowedCounts(mem.toDF(), "1 minute", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select(unix_timestamp($"win_start").as("w"), $"event_type", $"n", $"sum_value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batchTwin = EventStreams.windowedCountsBatch(
        (batch1 ++ batch2).toDF(), "1 minute")
        .select(unix_timestamp($"win_start").as("w"), $"event_type", $"n", $"sum_value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed == batchTwin)
      assert(streamed.contains((0L, "click", 2L, 3.0)))
    } finally q.stop()
  }

  test("dedupStream drops repeated event ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupStream(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch1.head) // duplicate event_id 1 within watermark
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L, 4L, 5L)) // no duplicate 1
    } finally q.stop()
  }

  test("warcCorpus and cmSketch run unchanged over streams") {
    implicit val sqlCtx = spark.sqlContext
    // WARC ingestion is a stateless per-row flatMap — append mode, and
    // the streamed records must equal the batch twin's exactly.
    def shard(id: Long): (Long, Array[Byte]) = {
      val recs = (0 until 2).map(k =>
        ("response", s"http://s/$id/$k", s"body $id $k"))
      val raw = graft.pipeline.TextOps.warcBytes(recs)
      (id, if (id % 2 == 0) graft.pipeline.TextOps.gzip(raw) else raw)
    }
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = graft.pipeline.TextOps.warcCorpus(
        mem.toDF().toDF("shard_id", "payload"), "shard_id", "payload")
      .writeStream.format("memory").queryName("warc_out")
      .outputMode("append").start()
    try {
      mem.addData(shard(0), shard(1))
      q.processAllAvailable()
      mem.addData(shard(2))
      q.processAllAvailable()
      val streamed = spark.table("warc_out").collect().map(_.toSeq).toSet
      val batch = graft.pipeline.TextOps.warcCorpus(
          Seq(shard(0), shard(1), shard(2)).toDF("shard_id", "payload"),
          "shard_id", "payload")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch && streamed.size == 6)
    } finally q.stop()
    // The count-min sketch is a pure additive aggregate — the canonical
    // streaming sketch: complete-mode counters equal the batch build.
    val toks = MemoryStream[String]
    val q2 = graft.pipeline.Sketch.cmSketch(
        toks.toDF().toDF("tok"), "tok", 2, 16)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try {
      toks.addData("a", "b", "a"); q2.processAllAvailable()
      toks.addData("c", "a"); q2.processAllAvailable()
      val streamed = spark.table("cms_out").collect().map(_.toSeq).toSet
      val batch = graft.pipeline.Sketch.cmSketch(
          Seq("a", "b", "a", "c", "a").toDF("tok"), "tok", 2, 16)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q2.stop()
  }

  test("intervalJoinStream matches the batch twin's matched pairs") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    // leftOuter interval join: inner matches emit as they arrive.
    val q = EventStreams.intervalJoinStream(
        clicks.toDF(), views.toDF(), windowSec = 60, watermark = "2 minutes")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      views.addData(Event(10, ts(5), 1, "view", 5.0),
                    Event(11, ts(200), 1, "view", 7.0),
                    Event(12, ts(30), 2, "view", 9.0))
      clicks.addData(Event(1, ts(50), 1, "click", 1.0),   // matches view@5
                     Event(2, ts(210), 1, "click", 2.0),  // matches view@200
                     Event(3, ts(300), 2, "click", 3.0))  // view@30 too old
      q.processAllAvailable()
      val matched = spark.table("ij_out").filter($"r_ts".isNotNull)
        .select($"click_id", $"r_value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(matched == Set((1L, 5.0), (2L, 7.0)))
      // Batch twin agrees on the aggregate view (click 3: zero views).
      val all = (Seq(Event(1, ts(50), 1, "click", 1.0),
                     Event(2, ts(210), 1, "click", 2.0),
                     Event(3, ts(300), 2, "click", 3.0),
                     Event(10, ts(5), 1, "view", 5.0),
                     Event(11, ts(200), 1, "view", 7.0),
                     Event(12, ts(30), 2, "view", 9.0))).toDF()
      val twin = EventStreams.intervalJoinBatch(all, windowSec = 60)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
      assert(twin == Set((1L, 1L, 5.0), (2L, 1L, 7.0), (3L, 0L, 0.0)))
    } finally q.stop()
  }

  test("runningTotals keeps per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("run_out")
      .outputMode("update").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // last update per user reflects cumulative state
      val last = spark.table("run_out").as[UserRunning].collect()
        .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n) }
      assert(last(1L).n == 3 && math.abs(last(1L).total - 6.0) < 1e-9)
      assert(last(2L).n == 2 && math.abs(last(2L).total - 12.0) < 1e-9)
    } finally q.stop()
  }

  test("sessionize (flatMapGroupsWithState) emits closed sessions only") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapSec = 60)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: events at 10s and 20s fuse; the 200s event closes them.
      mem.addData(Event(1, ts(10), 1, "click", 1.0),
                  Event(2, ts(20), 1, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // session still open
      mem.addData(Event(3, ts(200), 1, "click", 4.0))
      q.processAllAvailable()
      val closed = spark.table("sess_out")
        .as[EventStreams.ClosedSession].collect()
      assert(closed.length == 1)
      val s0 = closed.head
      assert(s0.user_id == 1L && s0.start_s == 10L && s0.end_s == 20L &&
             s0.n_events == 2L && math.abs(s0.total_value - 3.0) < 1e-9)
      // state continues: closing the 200s session emits it with one event
      mem.addData(Event(4, ts(400), 1, "click", 8.0))
      q.processAllAvailable()
      val all = spark.table("sess_out").as[EventStreams.ClosedSession].collect()
      assert(all.length == 2 && all.exists(s =>
        s.start_s == 200L && s.n_events == 1L && s.total_value == 4.0))
    } finally q.stop()
  }

  test("TripleIngest: streamed triples land deduped + inverse-augmented " +
       "in a batch/rel-partitioned parquet store") {
    import graft.streaming.TripleIngest
    import graft.streaming.TripleIngest.TripleEvent
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("kgout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("kgckpt").toString
    val mem = MemoryStream[TripleEvent]
    val q = TripleIngest.ingest(mem.toDF(), out, ckpt)
    try {
      mem.addData(TripleEvent(ts(10), 0L, 4L, 2L),
                  TripleEvent(ts(11), 1L, 4L, 2L))
      q.processAllAvailable()
      // replayed duplicate within the watermark is dropped
      mem.addData(TripleEvent(ts(12), 0L, 4L, 2L),
                  TripleEvent(ts(13), 0L, 2L, 3L))
      q.processAllAvailable()
      // partition-column inference types rel=<dir> as INT; cast back
      val edges = spark.read.parquet(out)
        .select(col("src"), col("rel").cast("long"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(edges == Set(
        (0L, 4L, 2L), (1L, 4L, 2L), (0L, 2L, 3L),      // base
        (2L, 5L, 0L), (2L, 5L, 1L), (3L, 3L, 0L)))     // inverses rel^1
      // physical layout: batch=<id>/rel=<r> — rel pruning still applies
      val batchDirs = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("batch=")).sortBy(_.getName)
      assert(batchDirs.nonEmpty)
      val relDirs = batchDirs.flatMap(_.listFiles())
        .filter(_.getName.startsWith("rel=")).map(_.getName).toSet
      assert(relDirs == Set("rel=4", "rel=5", "rel=2", "rel=3"))
    } finally q.stop()
  }

  test("TripleIngest.writeBatch is idempotent under micro-batch replay") {
    import graft.streaming.TripleIngest
    val out = java.nio.file.Files.createTempDirectory("kgidem").toString
    val batch = Seq((0L, 4L, 2L), (1L, 4L, 2L)).toDF("src", "rel", "dst")
    TripleIngest.writeBatch(batch, 0L, out)
    val afterFirst = spark.read.parquet(out).count()
    // Spark re-executes the last micro-batch after failure/restart: the
    // same (batch, batchId) arrives again. The store must not grow.
    TripleIngest.writeBatch(batch, 0L, out)
    assert(spark.read.parquet(out).count() == afterFirst)
    assert(afterFirst == 4L) // 2 base + 2 inverse
    // a NEW batchId appends
    TripleIngest.writeBatch(Seq((0L, 2L, 3L)).toDF("src", "rel", "dst"), 1L, out)
    assert(spark.read.parquet(out).count() == afterFirst + 2)
  }

  test("sessionize: a late cross-batch event widens bounds, never shrinks") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapSec = 60)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(100), 7, "click", 1.0))
      q.processAllAvailable()
      // late event (t=50) from a later micro-batch merges backwards
      mem.addData(Event(2, ts(50), 7, "click", 2.0))
      q.processAllAvailable()
      // next event 70s after the TRUE last (100), within gap -> still open;
      // with the pre-fix state (last dragged to 50) it would have split.
      mem.addData(Event(3, ts(150), 7, "click", 4.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(500), 7, "click", 8.0)) // closes it
      q.processAllAvailable()
      val closed = spark.table("sess_late")
        .as[EventStreams.ClosedSession].collect()
      assert(closed.length == 1)
      val s0 = closed.head
      assert(s0.start_s == 50L && s0.end_s == 150L && s0.n_events == 3L &&
             math.abs(s0.total_value - 7.0) < 1e-9)
    } finally q.stop()
  }

  test("sessionize drops events older than start - gap (gap invariant)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapSec = 60)
      .writeStream.format("memory").queryName("sess_drop")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(1000), 9, "click", 1.0))
      q.processAllAvailable()
      // hours-late event: 1000 - 60 = 940 > 10 — merging would produce a
      // session whose span wildly violates the gap invariant. Dropped.
      mem.addData(Event(2, ts(10), 9, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(5000), 9, "click", 4.0)) // closes the open one
      q.processAllAvailable()
      val closed = spark.table("sess_drop")
        .as[EventStreams.ClosedSession].collect()
      assert(closed.length == 1)
      assert(closed.head.start_s == 1000L && closed.head.end_s == 1000L &&
             closed.head.n_events == 1L)
    } finally q.stop()
  }

  test("sessionize flushes an idle open session via processing-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapSec = 60, idleFlushMs = 500)
      .writeStream.format("memory").queryName("sess_flush")
      .outputMode("append").start()
    // ProcessingTimeTimeout re-runs micro-batches continuously to check
    // timers, so processAllAvailable never settles — poll the sink instead.
    def eventually(cond: => Boolean, deadlineMs: Long = 60000): Boolean = {
      val end = System.currentTimeMillis + deadlineMs
      while (System.currentTimeMillis < end && !cond) Thread.sleep(250)
      cond
    }
    try {
      mem.addData(Event(1, ts(10), 11, "click", 1.0))
      // the single-event session is flushed by the 500 ms idle timeout
      // without any further input arriving
      assert(eventually(spark.table("sess_flush")
        .as[EventStreams.ClosedSession].collect()
        .exists(s => s.user_id == 11L && s.n_events == 1L &&
                     s.start_s == 10L && s.end_s == 10L)))
    } finally q.stop()
  }
}
