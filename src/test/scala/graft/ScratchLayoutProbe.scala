package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.DataLayout

/** Scale probe for the layout/CDC family: zorderCompare and snapshotDiff
  * at sf0.01 vs sf0.1 (10× rows). Both are two-narrow-shuffle plans
  * (group-by on ≤64 buckets / equi-join on id), so wall-clock should be
  * ~flat at these sizes and linear in the limit. Numbers recorded in
  * PLANS.md. */
class ScratchLayoutProbe extends AnyFunSuite {
  import SparkTestSession.spark

  private def time[A](what: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    info(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  test("zorder + cdc at 10x rows") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val li = graft.model.KG.table(spark, dir, "lineitem")
      val n = li.count()
      val z = time(s"zorderCompare $dir (n=$n)") {
        DataLayout.zorderCompare(li, "l_orderkey", "l_partkey").collect()
      }
      assert(z.length == 2)
      val docs = graft.model.KG.table(spark, dir, "documents")
      val base = docs.filter(col("doc_id") % 10 =!= 0)
      val cur = docs.filter(col("doc_id") % 13 =!= 5)
      val d = time(s"snapshotDiff $dir") {
        DataLayout.snapshotDiff(base, cur, "doc_id", md5(col("text"))).count()
      }
      assert(d > 0)
      val q = time(s"dqReport $dir") {
        graft.operators.DataQuality.testdataReport(spark, dir).collect()
      }
      assert(q.length == 8)
      val r = time(s"resampleDailyLocf $dir") {
        graft.streaming.EventStreams.resampleDailyLocf(
          graft.model.KG.eventsNs(spark, dir)).count()
      }
      assert(r > 0)
    }
  }
}
