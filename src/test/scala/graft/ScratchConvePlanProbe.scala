package graft

/** One-off probe (round 10): where does the ConvE frontier estimate sit in
  * the physical plan — materialized once per frontier row below the
  * nested-loop join (the point of KGEModel.scoreOnFrontier), or collapsed
  * into the per-pair post-join projection? */
object ScratchConvePlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val df = SparkEntry.queries("cqd_2p_conve")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.foreach { l =>
      val t = l.take(150)
      if (t.contains("Join") || t.toLowerCase.contains("conve") ||
          t.contains("Project") || t.contains("Aggregate"))
        println(t)
    }
  }
}
