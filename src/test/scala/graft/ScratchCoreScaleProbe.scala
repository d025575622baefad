package graft

import org.apache.spark.sql.functions._

/** Core-count scaling probe (VERDICT r17 "Next round" #6): at sf0.1 every
  * 8-vs-32-core ratio in the driver's bench is ≈ 1 because the rows are
  * job-count/scheduling bound, so parallelism is unmeasurable there. This
  * probe blows the two biggest shuffle paths up to a synthetic 10× and
  * times them at the CALLER-CHOSEN core count (SPARK_GRAFT_CPUS), so two
  * runs (8 vs 32) record the actual core-scaling ratio:
  *   - the post-fix CQD frontier×universe crossing (cqd 2p, ConvE-style
  *     estimate-on-frontier scorer at 10⁶ entities, beam 16);
  *   - triangleCount over the k×-replicated local-trade subgraph
  *     (disjoint salted copies — triangles per copy preserved).
  * Usage: SPARK_GRAFT_CPUS=8|32 Test/runMain graft.ScratchCoreScaleProbe
  *        [k] [dir]; record both walls in PLANS.md.
  */
object ScratchCoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // beam 256 × 10⁶ candidates ≈ 2.6·10⁸ scored pairs — large enough
    // that the crossing (not scheduling) is the measured quantity.
    val beam = if (args.length > 2) args(2).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-core-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ArrayKernels.register(spark)
    import graft.score.Embeddings

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // --- CQD 2p crossing at 10⁶ entities, estimate-on-frontier scorer
    // (the ConvE class: forward pass per frontier row, dot per pair) ---
    val rels = Embeddings.deterministic(
      spark.range(16).toDF("id"), "id", 9, 1.7).localCheckpoint(true)
    val ents = Embeddings.deterministic(
      spark.range(1000000L).toDF("id"), "id", 9, 0.3).localCheckpoint(true)
    def cqd(): Long = graft.exec.CQDBeam.answer(
      "r1(s1,e1)&r2(e1,f)", Map("r1" -> 9L, "r2" -> 8L, "s1" -> 0L),
      ents, rels, graft.score.ConvE(dim = 9), beam = beam).count()
    cqd() // warm-up (codegen/JIT), excluded
    val t1 = time(cqd())
    println(f"CORESCALE cpus=$cpus cqd_2p_conve n=1000000 beam=$beam t=$t1%7.2fs")

    // --- triangleCount over the k×-replicated local-trade subgraph ---
    val e = graft.model.KG.edges(spark, dir).filter(col("rel").isin(
      graft.model.KG.REL_CUST_NATION, graft.model.KG.REL_SUPP_NATION,
      graft.model.KG.REL_CUST_SUPP))
    val kedges = e.crossJoin(spark.range(k).toDF("rep"))
      .select((col("src") * k + col("rep")).as("src"), col("rel"),
              (col("dst") * k + col("rep")).as("dst"))
      .localCheckpoint(true)
    println(s"CORESCALE edges=${kedges.count()} (base x $k)")
    graft.exec.GraphOps.triangleCount(kedges).count() // warm-up
    val t2 = time(graft.exec.GraphOps.triangleCount(kedges).count())
    println(f"CORESCALE cpus=$cpus q_triangles k=$k t=$t2%7.2fs")
    spark.stop()
  }
}
