package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.KG

/** Physical data-layout operators — the write-side half of 100 TB query
  * speed. Query operators can only be as fast as the layout lets them be:
  * a fact-to-fact join is shuffle-free only if both sides were bucketed by
  * the join key at write time; a selective scan is cheap only if the data
  * was clustered so file/partition statistics prune it. This module makes
  * those layout decisions first-class, testable operators:
  *
  *   - [[zorderCompare]]: Z-order (Morton-interleaved) clustering vs naive
  *     single-column clustering, measured by min/max-statistics pruning
  *     under a 2-D box predicate — the data-skipping layout for multi-
  *     dimensional selective scans (the technique behind clustered table
  *     layouts in modern lakehouse engines; Morton 1966).
  *   - [[bucketedTables]]: hash-bucketed, per-bucket-sorted persistent
  *     tables; joins between co-bucketed tables plan ZERO shuffle
  *     exchanges (asserted by BucketedJoinSpec / LayoutQuerySpec) — the
  *     shuffle is paid once at write time and amortized over every later
  *     join.
  *   - [[partitionedEvents]]: date-partitioned event log (Hive-style
  *     directory partitioning); predicate-on-partition-column scans read
  *     only the matching directories (partition pruning, asserted by
  *     LayoutQuerySpec).
  *   - [[snapshotDiff]] / [[applyChanges]]: snapshot CDC — diff two corpus
  *     snapshots into added/removed/changed rows by content fingerprint,
  *     and replay such a change set onto a base snapshot (upsert+delete
  *     merge). The incremental-ingest primitive for a continuously
  *     refreshed 100 TB corpus: touch only the changed rows, never rewrite
  *     the corpus.
  *
  * All operators are pure DataFrame plans (Catalyst-optimizable, AQE-
  * friendly); the only driver-side state is the idempotent one-time table
  * write, guarded per session+dir exactly like the minhash pair cache in
  * PipelineQueries.
  */
object DataLayout {

  private def suffix(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_")
  private def tmpBase: String = System.getProperty("java.io.tmpdir")

  // ---- Z-order clustering study --------------------------------------

  /** Morton-interleave two `bits`-bit non-negative ranks into one key:
    * bit i of `rx` lands at position 2i, bit i of `ry` at 2i+1. Unrolled
    * at plan-build time (no higher-order function), so the whole key is
    * one codegen'd long expression. */
  def interleaveBits(rx: Column, ry: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(rx, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ry, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Compare two physical layouts of the same table under min/max-
    * statistics pruning for the fixed 2-D box predicate
    * `rx ∈ [64,127] ∧ ry ∈ [128,191]` (a 1/16 region of rank space):
    *
    *   - `linear`: files clustered by the leading column only (the layout
    *     a plain `ORDER BY x` write produces) — y-statistics are useless,
    *     so ~all files overlap the box's y-range.
    *   - `zorder`: files clustered by the Morton key — both dimensions'
    *     statistics are tight, so only files near the box survive.
    *
    * Both layouts are modeled as 64 equal-width key-range buckets (the
    * deterministic analog of maxRecordsPerFile splitting — bucket = top 6
    * key bits, no global sort / no unpartitioned window). Emits one row
    * per layout: bucket count, buckets a stats-pruning scan must read,
    * rows in those buckets (the real I/O), and matching rows (identical
    * across layouts — layout changes cost, never results).
    *
    * Ranks are exact integer affine maps of the raw columns onto [0,256)
    * (`(x−min)·256 div (max−min+1)`), so the study is engine-portable and
    * oracle-exact. The min/max row is a broadcast 1-row join. */
  def zorderCompare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val stats = df.agg(
      min(col(xCol)).cast("long").as("mnx"), max(col(xCol)).cast("long").as("mxx"),
      min(col(yCol)).cast("long").as("mny"), max(col(yCol)).cast("long").as("mxy"))
    val ranked = df
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .crossJoin(broadcast(stats))
      .select(
        expr("(x - mnx) * 256 div (mxx - mnx + 1)").as("rx"),
        expr("(y - mny) * 256 div (mxy - mny + 1)").as("ry"))
    val withBuckets = ranked
      .withColumn("zb", shiftright(interleaveBits(col("rx"), col("ry"), 8), 10))
      .withColumn("lb", shiftright(col("rx"), 2))
      .withColumn("m",
        (col("rx") >= 64 && col("rx") <= 127 &&
         col("ry") >= 128 && col("ry") <= 191).cast("long"))

    def layout(bucketCol: String, name: String): DataFrame = {
      val scanned = !(col("mxrx") < 64 || col("mnrx") > 127 ||
                      col("mxry") < 128 || col("mnry") > 191)
      withBuckets
        .groupBy(col(bucketCol).as("bkt"))
        .agg(min("rx").as("mnrx"), max("rx").as("mxrx"),
             min("ry").as("mnry"), max("ry").as("mxry"),
             count(lit(1)).as("cnt"), sum("m").as("mm"))
        .agg(count(lit(1)).as("n_buckets"),
             sum(when(scanned, 1L).otherwise(0L)).as("n_scanned"),
             sum(when(scanned, col("cnt")).otherwise(0L)).as("rows_scanned"),
             sum("mm").as("rows_matched"))
        .select(lit(name).as("layout"), col("n_buckets"), col("n_scanned"),
                col("rows_scanned"), col("rows_matched"))
    }
    layout("lb", "linear").unionAll(layout("zb", "zorder"))
  }

  // ---- bucketed co-located join --------------------------------------

  /** Idempotent per-(session, dir) bucketed persistent tables: `orders`
    * and `customer` written hash-bucketed (8 buckets) and per-bucket
    * sorted on the join key. Returns the catalog-backed frames, whose
    * joins plan zero shuffle exchanges. External-path tables under the
    * JVM tmpdir; the write happens once per session (catalog check),
    * `overwrite` keeps re-runs correct across sessions. */
  def bucketedTables(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val sfx = suffix(dir)
    val ot = s"graft_orders_bucketed_$sfx"
    val ct = s"graft_customer_bucketed_$sfx"
    val base = s"$tmpBase/graft_bucketed_$sfx"
    s.synchronized {
      // guard on BOTH tables: a prior session that wrote `orders` but
      // died before `customer` must not make the skip permanent
      if (!s.catalog.tableExists(ot) || !s.catalog.tableExists(ct)) {
        KG.table(s, dir, "orders").write.mode("overwrite")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", s"$base/orders").saveAsTable(ot)
        KG.table(s, dir, "customer").write.mode("overwrite")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", s"$base/customer").saveAsTable(ct)
      }
    }
    (s.table(ot), s.table(ct))
  }

  /** Revenue per market segment through the bucketed join: the join
    * stage reads co-bucketed files and merges them locally — no exchange
    * on either side (the 100 TB fact-to-dim-at-scale shape where the dim
    * is too big to broadcast). Only the final 5-group aggregate
    * shuffles. */
  def bucketedRevenueBySegment(s: SparkSession, dir: String): DataFrame = {
    val (orders, customer) = bucketedTables(s, dir)
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           round(sum("o_totalprice"), 2).as("revenue"))
  }

  // ---- date-partitioned event log ------------------------------------

  /** Idempotent per-dir date-partitioned copy of the events table
    * (Hive-style `day=YYYY-MM-DD` directories). Day is derived from the
    * canonical epoch-ns `ts` under the UTC wall-clock convention
    * ([[KG.eventsNs]]), so the layout is timezone-independent. Guarded by
    * the `_SUCCESS` marker: content is a pure function of `dir`, so a
    * previous session's write is reusable. */
  def partitionedEvents(s: SparkSession, dir: String): DataFrame = {
    val path = s"$tmpBase/graft_events_day_${suffix(dir)}"
    s.synchronized {
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        KG.eventsNs(s, dir)
          .withColumn("day",
            date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd"))
          .write.mode("overwrite").partitionBy("day").parquet(path)
      }
    }
    s.read.parquet(path)
  }

  /** Daily event rollup over a one-week day range. The filter is on the
    * partition column, so the scan's partition pruning reads 7 of the ~30
    * day directories (asserted by LayoutQuerySpec) — at 100 TB this is
    * the difference between scanning a week and scanning the full log. */
  def eventsWeekRollup(s: SparkSession, dir: String,
                       from: String = "2024-01-08",
                       to: String = "2024-01-14"): DataFrame =
    partitionedEvents(s, dir)
      .filter(col("day") >= from && col("day") <= to)
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"),
           round(sum("value"), 6).as("sum_value"))

  // ---- snapshot CDC ---------------------------------------------------

  /** Diff two snapshots of an id-keyed table by a content fingerprint
    * column expression: emits one row per id whose state changed —
    * `added` (only in `cur`), `removed` (only in `base`), `changed` (in
    * both, fingerprints differ). Unchanged rows — the overwhelming bulk
    * at 100 TB — are dropped before anything downstream touches them.
    * One shuffle on the id (a plain full-outer equi-join; both sides
    * project to (id, fingerprint) first, so the join never carries
    * payloads). */
  def snapshotDiff(base: DataFrame, cur: DataFrame, idCol: String,
                   fingerprint: Column): DataFrame = {
    val b = base.select(col(idCol).as("id"), fingerprint.as("fp_base"))
    val c = cur.select(col(idCol).as("id"), fingerprint.as("fp_cur"))
    b.join(c, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("fp_base").isNull, "added")
          .when(col("fp_cur").isNull, "removed")
          .when(col("fp_base") =!= col("fp_cur"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
  }

  /** Slowly-changing-dimension type-2 history from two snapshots: one
    * row per (id, version) with a validity interval — `valid_from` 0
    * (base) or 1 (current), `valid_to` 1 where the base version was
    * superseded/removed at the current snapshot, −1 for rows still open.
    * Unchanged ids keep one open row; changed ids get a closed base row
    * plus an open current row. Two id-equi-joins over (id, fingerprint)
    * projections — payloads never move, so at 100 TB the history build
    * is change-set-sized, not corpus-sized. */
  def scd2(base: DataFrame, cur: DataFrame, idCol: String,
           fingerprint: Column): DataFrame = {
    val b = base.select(col(idCol).as("id"), fingerprint.as("fp"))
    val c = cur.select(col(idCol).as("id"), fingerprint.as("fp_cur"))
    val baseRows = b.join(c, Seq("id"), "left")
      .select(col("id"), col("fp"), lit(0L).as("valid_from"),
        when(col("fp_cur").isNull || col("fp") =!= col("fp_cur"), 1L)
          .otherwise(-1L).as("valid_to"))
    val newRows = c.join(b, Seq("id"), "left")
      .filter(col("fp").isNull || col("fp") =!= col("fp_cur"))
      .select(col("id"), col("fp_cur").as("fp"), lit(1L).as("valid_from"),
              lit(-1L).as("valid_to"))
    baseRows.unionByName(newRows)
  }

  /** Replay a change set onto a base snapshot: delete `removed` and
    * `changed` ids, then append the current payload rows for `added` and
    * `changed` ids. `changes` is the [[snapshotDiff]] output; `cur`
    * supplies the payloads (only the changed slice of it is read — the
    * join prunes to the change set before any payload moves). The result
    * is row-identical to `cur`; the point is that it was produced by
    * touching |changes| rows, not |cur|. */
  def applyChanges(base: DataFrame, changes: DataFrame, cur: DataFrame,
                   idCol: String): DataFrame = {
    val delIds = changes.filter(col("status").isin("removed", "changed"))
      .select(col("id").as(idCol))
    val upsIds = changes.filter(col("status").isin("added", "changed"))
      .select(col("id").as(idCol))
    val kept = base.join(broadcast(delIds), Seq(idCol), "left_anti")
    val incoming = cur.join(broadcast(upsIds), Seq(idCol), "left_semi")
    kept.unionByName(incoming)
  }
}
