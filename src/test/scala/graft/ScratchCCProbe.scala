package graft

import org.apache.spark.sql.functions._

/** One-off probe (PLANS.md, round 9): minLabelComponents at 10× nodes and
  * on a pathological long chain. Supersteps are O(diameter) — flat-ish
  * wall time at 10× the nodes for constant-diameter graphs, linear in
  * depth for a chain (the known price of label propagation; GraphX CC
  * shares it). */
object ScratchCCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    for (n <- Seq(100000, 1000000)) {
      // star forests: n nodes in n/100 components of diameter 2
      val edges = spark.range(n)
        .select((lit(1000000000L) + (col("id") / 100).cast("long")).as("src"),
                lit(0L).as("rel"), col("id").as("dst"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val nc = graft.exec.GraphOps.minLabelComponents(edges)
        .select(countDistinct(col("component"))).head().getLong(0)
      println(f"PROBE cc stars n=$n%8d " +
        f"time=${(System.nanoTime() - t0) / 1e9}%6.2fs comps=$nc")
    }
    for (len <- Seq(16, 64)) { // chain: diameter = len
      val edges = spark.range(len - 1)
        .select(col("id").as("src"), lit(0L).as("rel"),
                (col("id") + 1).as("dst")).localCheckpoint(true)
      val t0 = System.nanoTime()
      val nc = graft.exec.GraphOps.minLabelComponents(edges, maxIters = 100)
        .select(countDistinct(col("component"))).head().getLong(0)
      println(f"PROBE cc chain len=$len%4d " +
        f"time=${(System.nanoTime() - t0) / 1e9}%6.2fs comps=$nc")
    }
    spark.stop()
  }
}
