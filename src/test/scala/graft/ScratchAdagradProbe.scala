package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off probe: AdaGrad step cost at 1× vs 10× the trained subgraph
  * (disjoint entity/edge copies — the PLANS.md trainer protocol), for the
  * round-8 PLANS entry. */
object ScratchAdagradProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import graft.model.KG
    import graft.score.Training
    val dir = "/root/testdata/sf0.1"
    val base = KG.edges(spark, dir)
      .filter(col("rel").isin(KG.REL_SUPP_NATION, KG.REL_NATION_REGION))
      .localCheckpoint(true)
    def rep(k: Int): DataFrame =
      (0 until k).map(i => base
        .withColumn("src", col("src") + lit(i.toLong * 1000000000L))
        .withColumn("dst", col("dst") + lit(i.toLong * 1000000000L)))
        .reduce(_ unionAll _).localCheckpoint(true)
    for (k <- Seq(1, 10)) {
      val edges = rep(k)
      val ents = edges.select(col("src").as("id"))
        .unionAll(edges.select(col("dst").as("id"))).distinct()
        .localCheckpoint(true)
      for (steps <- Seq(1, 2)) {
        val t0 = System.nanoTime()
        val n = Training.transeSgdAdagrad(ents, edges, dim = 8,
          entSeed = 0.3, relSeed = 1.7, steps = steps).count()
        println(f"PROBE ${k}x adagrad_steps$steps time=${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
