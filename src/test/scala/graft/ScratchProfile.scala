package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for round-4 perf work (not a spec; run via Test/runMain). */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the scan

    // 1. shingle build alone (docs side) — shingleRows, the exact frame
    // contamination() consumes (shingleSets would eagerly localCheckpoint,
    // polluting both this timing and the ones after it).
    time("shingleRows(docs) n=4") {
      graft.pipeline.Dedup.shingleRows(docs, "doc_id", "text", 4).count()
    }
    // 2. full contamination, benched form (hashed keys + df cap)
    time("contamination benched") {
      graft.pipeline.Cluster.contamination(
        docs, docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", n = 4,
        maxDocFreq = 256).count()
    }
    // 3. contamination again (warm)
    time("contamination benched warm") {
      graft.pipeline.Cluster.contamination(
        docs, docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", n = 4,
        maxDocFreq = 256).count()
    }
    spark.stop()
  }
}
