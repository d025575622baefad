package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 50k-doc minhash pair timing (fresh JVM): the scale-probe's minhash_lsh
  * stage in isolation (run via Test/runMain graft.ScratchProfile7 [k]). */
object ScratchProfile7 {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs = base.crossJoin(spark.range(k).toDF("rep"))
      .select((col("doc_id") * k + col("rep")).as("doc_id"),
              concat(lit("v"), col("rep"), lit(" "), col("text")).as("text"))
      .localCheckpoint(true)
    println(s"[p7] corpus ${docs.count()} docs")
    val t0 = System.nanoTime()
    val n = graft.pipeline.Dedup.minhashLshPairs(
      docs, "doc_id", "text", threshold = 0.8).count()
    println(f"[p7] minhash_lsh: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n pairs)")
    spark.stop()
  }
}
