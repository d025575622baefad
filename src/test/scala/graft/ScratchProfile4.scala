package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for round-6 dedup_clean_corpus cold-start work
  * (not a spec; run via Test/runMain). Stage-by-stage timing of the
  * portable minhash pair view that dominates the query's cold time. */
object ScratchProfile4 {
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

    // Stage 1: distinct shingle sets (the shared explode+distinct).
    val sets = graft.pipeline.Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("1 shingleSets")(sets.count())

    // Stage 2: md5 base hash projection over the set rows.
    val P = 2147483647L
    val withBase = sets.withColumn("_mh_base",
      pmod(graft.functions.PortableHash.md5Prefix60(col("sh")), lit(P)))
    time("2 md5 base projection")(withBase.count())

    // Stage 3: signature aggregation (32 affine mins).
    val sigAggs = (0 until 32).map(i =>
      min(pmod(col("_mh_base") * (2 * i + 1) + lit(i * 12582917L), lit(P))))
    time("3 signature agg")(
      withBase.groupBy("id").agg(array(sigAggs: _*).as("sig")).count())

    // Full pair view, cold then warm.
    time("4 full minhashLshPairs (cold-ish; sets cached)")(
      graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text",
        family = graft.pipeline.Dedup.PortableMd5).count())

    // Closure + drops, reusing a fresh pair computation (what the query does).
    time("5 clean_corpus end-to-end") {
      val pairs = graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text",
        family = graft.pipeline.Dedup.PortableMd5).localCheckpoint(true)
      val nearDrops = graft.pipeline.Dedup.dupGroups(pairs)
        .filter(col("id") =!= col("keep_id")).select(col("id").as("doc_id"))
      val exactDrops = graft.pipeline.Dedup.exactDropIds(docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"))
        .join(exactDrops, Seq("doc_id"), "left_anti")
        .join(nearDrops, Seq("doc_id"), "left_anti").count()
    }
    spark.stop()
  }
}
