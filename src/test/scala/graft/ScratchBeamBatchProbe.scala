package graft

import org.apache.spark.sql.functions._

/** One-off probe (PLANS.md, round 9): CQDBeamBatched at 1× vs 10× entity
  * universe, 16 batched 2p instances. Documents the frontier-broadcast
  * policy (CQDBeam.broadcastFrontierMaxRows): with beam = 8 the pruned e1
  * frontier is provably |instances| × beam = 128 rows → broadcast() hint;
  * with beam = 4096 the bound (4096 > 32768/16) fails → no hint, Catalyst
  * size estimates decide, and nothing driver-side materializes the
  * frontier. Expected wall time ~linear in |E| (per-edge scans dominate;
  * scoring rows = |frontier| × |E| with the frontier capped by the beam). */
object ScratchBeamBatchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    graft.functions.ArrayKernels.register(spark)
    val cq = graft.lang.Normalize.toDnf(
      graft.lang.Parser.parse("r1(s1,e1)&r2(e1,f)")).head
    val rels = graft.score.Embeddings.deterministic(
      spark.range(22).toDF("id"), "id", 8, 1.7).localCheckpoint(true)
    val instances = (0L until 16L).map(q =>
      q -> Map("r1" -> 9L, "r2" -> 8L, "s1" -> q))
    for (ne <- Seq(10000, 100000); beam <- Seq(8, 4096)) {
      val ents = graft.score.Embeddings.deterministic(
        spark.range(ne).toDF("id"), "id", 8, 0.3).localCheckpoint(true)
      val t0 = System.nanoTime()
      val out = graft.exec.CQDBeamBatched.answerBatch(
        spark, cq, instances, ents, rels, graft.score.NativeTransE,
        beam = beam)
      val n = out.count()
      println(f"PROBE ents=$ne%7d beam=$beam%5d qids=16 " +
        f"time=${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    spark.stop()
  }
}
