package graft

import org.apache.spark.sql.SparkSession

/** Cold-start timing of a single registered query in a fresh JVM
  * (run via Test/runMain graft.ScratchProfile5 <query> [sfDir]). */
object ScratchProfile5 {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "dedup_clean_corpus"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.model.KG.table(spark, sfDir, "documents").count() // warm scan only
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(q)(spark, sfDir).count()
    println(f"PROFILE COLD $q: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    spark.stop()
  }
}
