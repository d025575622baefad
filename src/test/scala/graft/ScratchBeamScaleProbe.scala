package graft

import org.apache.spark.sql.functions._

/** One-off probe (PLANS.md round 16; VERDICT_r15 task 6): the CQD
  * frontier×universe crossing MEASURED at 10⁶ synthetic entities — the
  * evidence behind PlanGuard's whitelist of the R6 ranking crossings.
  *
  * The claim: with a finite beam, each projection edge scores at most
  * beam·|E| pairs (the beam-pruned frontier × the candidate universe),
  * so 2p cost grows LINEARLY in |E| at fixed beam — not |E|² as the
  * unpruned frontier would. Measured three ways, 2p TransE chain
  * (r1(s1,e1) & r2(e1,f)), dim 8:
  *   1. |E| 10⁵ → 10⁶ at beam 16 — expect decade exponent ≈ 1 (linear);
  *   2. beam 16 → 64 at 10⁶ — the scored-pair count of the second edge
  *      grows 4×, bounding how intermediate size enters the cost;
  *   3. the unpruned control at 10⁵ only (beam = MaxValue ⇒ |E|·|E|
  *      pairs — at 10⁶ that is 10¹² scored rows, which is the point).
  * The beam bound is structural (row_number ≤ beam per conjunct), so the
  * probe measures TIME, the quantity the bound exists to protect. */
object ScratchBeamScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .appName("graft-beam-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.score.Embeddings

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val rels = Embeddings.deterministic(
      spark.range(16).toDF("id"), "id", 8, 1.7).localCheckpoint(true)
    def ents(n: Int) = Embeddings.deterministic(
      spark.range(n).toDF("id"), "id", 8, 0.3)

    graft.functions.ArrayKernels.register(spark)
    def run(n: Int, beam: Int): Double = {
      val e = ents(n).localCheckpoint(true)
      val t = time {
        graft.exec.CQDBeam.answer("r1(s1,e1)&r2(e1,f)",
          Map("r1" -> 9L, "r2" -> 8L, "s1" -> 0L), e, rels,
          graft.score.NativeTransE, beam = beam).count()
      }
      val beamStr = if (beam == Int.MaxValue) "inf" else beam.toString
      println(f"POINT16 cqd_2p n=$n%8d beam=$beamStr%4s t=$t%7.2fs")
      t
    }

    run(30000, 16) // warm-up (JIT/codegen; excluded from the record)
    val a = run(100000, 16)
    val b = run(1000000, 16)
    val c = run(1000000, 64)
    val u = run(100000, Int.MaxValue)
    println(f"PROBE16 cqd_2p beam16 decade exponent ${math.log10(b / a)}%5.2f; " +
      f"beam 16->64 at 1M: ${c / b}%4.1fx; " +
      f"unpruned 100k control ${u}%5.2fs vs pruned ${a}%5.2fs (${u / a}%4.1fx)")
    spark.stop()
  }
}
