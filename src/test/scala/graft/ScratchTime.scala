package graft

import org.apache.spark.sql.SparkSession

/** Generic named-query timer (not a spec; run via Test/runMain):
  * `Test/runMain graft.ScratchTime q1 q2 ...` times each SparkEntry query
  * twice (cold/warm) at SPARK_GRAFT_SF_DIR. */
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.model.KG.edges(spark, sfDir).count() // load phase, as in Bench
    val qs = SparkEntry.queries
    args.foreach { name =>
      val fn = qs(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"TIME $name#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
