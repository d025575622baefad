package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.eval.Workload

/** End-to-end EFO-1 workload evaluation over the sf0.001 testdata. */
class WorkloadSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val types = KGQueries.all.filter(t => Set("kg_1p", "kg_2i", "kg_2u").contains(t._1))

  test("train split drops both directions of an edge consistently") {
    val edges = graft.model.KG.edges(spark, "/root/testdata/sf0.001")
    val train = Workload.trainEdges(edges)
    // if (s, r, d) is in train, so is (d, r^1, s)
    import org.apache.spark.sql.functions._
    val fwd = train.filter(col("rel") % 2 === 0)
      .select(col("src"), col("rel"), col("dst"))
    val bwd = train.filter(col("rel") % 2 === 1)
      .select(col("dst").as("src"), (col("rel") - 1).as("rel"),
              col("src").as("dst"))
    assert(fwd.exceptAll(bwd).isEmpty && bwd.exceptAll(fwd).isEmpty)
    val (n, nt) = (edges.count(), train.count())
    assert(nt < n && nt > n / 2) // ~90% kept
  }

  test("evaluate: valid, monotonic, deterministic metrics per type") {
    val out = Workload.evaluate(spark, "/root/testdata/sf0.001", types)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
                           r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (t, mrr, h1, h3, h10, nHard) =>
      assert(nHard > 0)
      assert(mrr > 0 && mrr <= 1, s"$t mrr=$mrr")
      assert(h1 <= h3 && h3 <= h10 && h10 <= 1.0)
    }
    val again = Workload.evaluate(spark, "/root/testdata/sf0.001", types)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    out.foreach { case (t, mrr, _, _, _, _) => assert(again(t) == mrr) }
  }
}
