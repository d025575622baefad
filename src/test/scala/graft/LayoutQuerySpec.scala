package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.operators.DataLayout

/** Physical-layout operator evidence (operators/DataLayout):
  *   - the Z-order layout's statistics pruning reads strictly less data
  *     than the linear layout for the 2-D box predicate, at identical
  *     matching rows;
  *   - the bucketed join stage plans zero shuffle exchanges;
  *   - the date-partitioned scan prunes to exactly the filtered day
  *     directories;
  *   - the replayed CDC change set reconstructs the current snapshot
  *     row-for-row. */
class LayoutQuerySpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("zorder layout prunes more than linear under the box predicate") {
    val rows = DataLayout.zorderCompare(
        graft.model.KG.table(spark, dir, "lineitem"),
        "l_orderkey", "l_partkey")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (lb, ls, lr, lm) = rows("linear")
    val (zb, zs, zr, zm) = rows("zorder")
    assert(lm == zm, "layout must never change matching rows")
    assert(zr < lr,
      s"zorder should scan fewer rows: zorder=$zr linear=$lr")
    assert(zs < ls || lb != zb,
      s"zorder should scan fewer buckets: zorder=$zs/$zb linear=$ls/$lb")
    // the linear layout cannot prune on the y-dimension at all: the box
    // spans the full x-range slice, so it reads ~1/4 of the data; the
    // z-order layout reads only buckets near the box.
    assert(zr.toDouble / lr.toDouble < 0.8,
      s"expected a real pruning win, got zorder=$zr vs linear=$lr")
  }

  test("bucketed join stage plans zero shuffle exchanges") {
    val (orders, customer) = DataLayout.bucketedTables(spark, dir)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = orders.join(customer,
        col("o_custkey") === col("c_custkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        "bucketed join planned exchanges:\n" +
          joined.queryExecution.executedPlan.toString.take(1500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("partitioned events scan prunes to the filtered day directories") {
    val all = DataLayout.partitionedEvents(spark, dir)
    val totalDays = all.select("day").distinct().count()
    val pruned = all.filter(col("day") >= "2024-01-08" &&
                            col("day") <= "2024-01-14")
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.selectedPartitions.partitionCount
    }
    assert(scans.nonEmpty, "expected a file scan in the plan")
    assert(scans.head == 7,
      s"expected 7 day partitions scanned, got ${scans.head} of $totalDays")
    assert(totalDays > 7)
  }

  test("replayed change set reconstructs the current snapshot exactly") {
    val docs = graft.model.KG.table(spark, dir, "documents")
    val base = docs.filter(col("doc_id") % 10 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [v1]")))
          .otherwise(col("text")))
    val cur = docs.filter(col("doc_id") % 13 =!= 5)
    val diff = DataLayout.snapshotDiff(base, cur, "doc_id", md5(col("text")))
    val merged = DataLayout.applyChanges(base, diff, cur, "doc_id")
    assert(merged.count() == cur.count())
    assert(merged.exceptAll(cur).isEmpty && cur.exceptAll(merged).isEmpty)
    // the diff itself is classified correctly
    val st = diff.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val added = cur.join(base, Seq("doc_id"), "left_anti").count()
    val removed = base.join(cur, Seq("doc_id"), "left_anti").count()
    assert(st.getOrElse("added", 0L) == added)
    assert(st.getOrElse("removed", 0L) == removed)
    assert(st.getOrElse("changed", 0L) > 0)

    // SCD-2 invariants: the open rows ARE the current snapshot, closed
    // rows = removed + superseded(changed) base versions.
    val hist = DataLayout.scd2(base, cur, "doc_id", md5(col("text")))
    val open = hist.filter(col("valid_to") === -1L)
      .select(col("id").as("doc_id"), col("fp"))
    val curFp = cur.select(col("doc_id"), md5(col("text")).as("fp"))
    assert(open.exceptAll(curFp).isEmpty && curFp.exceptAll(open).isEmpty)
    val closed = hist.filter(col("valid_to") =!= -1L).count()
    assert(closed == removed + st("changed"))
  }
}
