package graft

import org.apache.spark.sql.functions._

/** One-off probe (PLANS.md, round 9): `Dedup.jaccardPairs` df cap on a
  * hot-shingle corpus. Every doc shares a boilerplate tail contributing 5
  * shingles with df = n, so the uncapped exact self-join materializes
  * Σ df² ≈ 5·C(n,2) candidate rows — quadratic in corpus size — while the
  * capped join drops the hot shingles up front and stays linear (the
  * winnowPairs/decontamination stop-shingle contract, now shared). */
object ScratchJaccardCapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val boiler = "all rights reserved contact us for details"
    for (n <- Seq(2000, 5000, 10000, 20000)) {
      val docs = spark.range(n).select(col("id").as("doc_id"),
        concat(lit("u"), col("id"), lit(" v"), col("id"), lit(" w"), col("id"),
               lit(" x"), col("id"), lit(" " + boiler)).as("text"))
        .localCheckpoint(true)
      def run(tag: String, cap: Long): Unit = {
        val t0 = System.nanoTime()
        val c = graft.pipeline.Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.3, maxDocFreq = cap).count()
        println(f"PROBE n=$n%6d $tag%-8s " +
          f"time=${(System.nanoTime() - t0) / 1e9}%7.2fs pairs=$c")
      }
      run("capped", 100)
      if (n <= 10000) run("uncapped", 0) // quadratic: don't run at 20k
    }
    spark.stop()
  }
}
