package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Layout

/** Bucketed/partitioned physical layout: correctness of round-trip and the
  * no-shuffle bucketed-join property. */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("bucketed table round-trips and bucketed self-join avoids shuffle") {
    // clear any orphaned location from a previous interrupted run
    spark.sql("DROP TABLE IF EXISTS graft_edges_bucketed")
    val wh = new java.io.File("spark-warehouse/graft_edges_bucketed")
    if (wh.exists) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      rm(wh)
    }
    val edges = Seq.tabulate(200)(i =>
      (i.toLong % 40, (i % 4) * 2L, (i * 7).toLong % 40))
      .toDF("src", "rel", "dst")
    Layout.writeBucketed(edges, "graft_edges_bucketed", buckets = 4)
    val back = Layout.readBucketed(spark, "graft_edges_bucketed")
    assert(back.count() == 200)
    assert(back.select("src", "rel", "dst").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    assert(Layout.selfJoinAvoidsShuffle(spark, "graft_edges_bucketed"),
      "bucketed join should not need a shuffle")
  }
}
