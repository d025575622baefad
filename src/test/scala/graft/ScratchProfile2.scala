package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for round-5 perf work (not a spec; run via Test/runMain). */
object ScratchProfile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // The exact Bench load_sec measurement: one cold action.
    time("COLD edges persist+count (= Bench load_sec)") {
      graft.model.KG.edges(spark, sfDir).count()
    }

    // Workload eval phases
    val types = graft.KGQueries.all
      .filter(t => graft.OperatorQueries.EVAL_TYPES_BETAE.contains(t._1))
    time("eval_efo1_suite end-to-end") {
      graft.eval.Workload.evaluate(spark, sfDir, types).count()
    }
    time("eval_efo1_suite again (warm)") {
      graft.eval.Workload.evaluate(spark, sfDir, types).count()
    }
    spark.stop()
  }
}
