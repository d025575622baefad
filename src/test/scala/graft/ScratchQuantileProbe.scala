package graft

import org.apache.spark.sql.functions._

/** One-off probe (PLANS.md, round 13): ExactQuantiles at its WORST case
  * — a (nearly) all-distinct double column, where the frequency table
  * is data-sized and the two-level prefix sum does real work — at two
  * decades, against the built-in `percentile` aggregate on the same
  * frames. The built-in wins small-n local runs (no shuffles, one
  * in-heap buffer); the point of the operator is that its time is
  * SHUFFLE-bounded and its memory DISTINCT-PARTITION-bounded, while the
  * built-in's final merge is one task holding every value — the curve
  * that matters is ExactQuantiles' own decade exponent. */
object ScratchQuantileProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .appName("graft-quantile-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def frame(n: Long) = spark.range(n).select(
      (col("id") % 4).cast("string").as("g"),
      ((col("id") * 2654435761L % 1000000007L).cast("double") / 1000.0)
        .as("v")) // ~all-distinct doubles
    val specs = Seq(("v", "p50", 0.5), ("v", "p90", 0.9), ("v", "p99", 0.99))

    Seq(1000000L, 10000000L).foreach { n =>
      val df = frame(n)
      // warm the scan
      df.count()
      val tEq = time(graft.operators.ExactQuantiles
        .quantiles(df, Seq("g"), specs).collect())
      val tBuiltin = time(df.groupBy("g")
        .agg(expr("percentile(v, array(0.5D, 0.9D, 0.99D))")).collect())
      println(f"QPROBE n=$n%9d exact_quantiles=$tEq%7.2fs " +
        f"builtin_percentile=$tBuiltin%7.2fs")
    }
  }
}
