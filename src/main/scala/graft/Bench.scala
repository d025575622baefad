package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total","value":...,"queries":{...}}.
  *
  * The derived-KG edges view is materialized once up front (load phase,
  * reported as load_sec) — the analog of the reference's eager adjacency
  * index build at KG load (graph.py:30-51); per-query timings then measure
  * query execution, not shared ETL. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tLoad = System.nanoTime()
    graft.model.KG.edges(spark, sfDir).count()
    val loadSec = (System.nanoTime() - tLoad) / 1e9

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","load_sec":$loadSec}""")
    spark.stop()
    // A crashing query must fail the bench run, not just skew a timing.
    if (results.exists(!_._3)) sys.exit(1)
  }
}
