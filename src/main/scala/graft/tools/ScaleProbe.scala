package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Dedup scale probe: replicate the documents corpus k× (salted ids,
  * mutated first token so replicas are near- not exact dups) and time the
  * near-dup operators — evidence that the LSH paths scale with corpus size,
  * not pairs. Usage: runMain graft.tools.ScaleProbe [k] [dir]. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.model.KG.table(spark, dir, "documents")
    val n0 = base.count()
    val docs = base.crossJoin(
        spark.range(k).toDF("rep"))
      .select((col("doc_id") * k + col("rep")).as("doc_id"),
              concat(lit("v"), col("rep"), lit(" "), col("text")).as("text"))
      .localCheckpoint(true)
    println(s"[scale] corpus: ${n0 * k} docs (base $n0 x $k)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time("minhash_lsh")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.8).count())
    time("simhash")(
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).count())
    time("exact")(Dedup.exactGroups(docs, "doc_id", "text").count())
    spark.stop()
  }
}
