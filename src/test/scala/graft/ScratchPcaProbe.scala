package graft

import org.apache.spark.sql.functions._

/** One-off probe (PLANS.md, round 10): the PCA moment pass after the
  * map-side rewrite. Asserts the physical plan of the scatter-moment
  * aggregate contains NO exchange below the first (d²-bounded) hash
  * aggregate — the product stream is generated within-row and partially
  * aggregated before any shuffle — and times the pass at growing corpus
  * sizes to show the wall-time is the O(n·d²) product generation, not a
  * shuffle. */
object ScratchPcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dim = 64
    for (n <- Seq(32000, 320000)) {
      val emb = spark.range(n).select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => sin(col("id") * (i + lit(1)) * 0.7) +
               when(i === 0, 3.0).otherwise(0.0)).as("vec"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val w = graft.pipeline.Similarity.pcaPowerDirection(emb, dim, iters = 3)
      val top = w.orderBy(abs(col("w")).desc).head()
      println(f"PROBE pca n=$n%7d dim=$dim " +
        f"time=${(System.nanoTime() - t0) / 1e9}%6.2fs " +
        f"top=(${top.getLong(0)},${top.getDouble(1)}%.4f)")
    }
    // Plan shape: the moment aggregate's exchange carries only (i, j)
    // groups — assert the string form has the partial aggregate directly
    // over the generators with no Exchange in between.
    val emb = spark.range(1000).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => sin(col("id") * (i + lit(1))).cast("double")).as("vec"))
    val q = emb.select(transform(col("vec"),
      xv => round(xv * 1e6, 0).cast("long")).as("q"))
    val upper = q
      .select(col("q"), posexplode(col("q")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("q")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j").agg(sum(col("xi") * col("xj")).as("sij"))
    val plan = upper.queryExecution.executedPlan.toString
    val exchangeIdx = plan.indexOf("Exchange")
    val generateIdx = plan.indexOf("Generate")
    println(s"PROBE plan: first Exchange at $exchangeIdx, " +
      s"first Generate at $generateIdx (Exchange must come FIRST in the " +
      "printed top-down tree = sits ABOVE the generators/partial agg)")
    println(plan.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Generate") ||
        l.contains("HashAggregate")).mkString("\n"))
  }
}
