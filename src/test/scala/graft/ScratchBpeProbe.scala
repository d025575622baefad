package graft

/** One-off probe: Spark JOB COUNT and wall time of the iterative
  * per-merge-rank BPE encode vs the fused bpe_apply path, at growing
  * merge counts — evidence for the flat-job-count claim (r8). */
object ScratchBpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import graft.pipeline.TextOps
    val docs = graft.model.KG.table(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text")
    docs.cache().count()
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    for (m <- Seq(2, 4, 8)) {
      val merges = TextOps.bpeLearnMerges(docs, "doc_id", "text", m)
        .localCheckpoint(true)
      merges.count()
      for ((name, f) <- Seq(
        "iterative" -> (() => TextOps.bpeEncode(docs, "doc_id", "text", merges)),
        "fused" -> (() => TextOps.bpeEncodeFused(docs, "doc_id", "text", merges)))) {
        Thread.sleep(300)
        jobs = 0
        val t0 = System.nanoTime()
        val n = f().count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROBE merges=$m%2d $name%-9s jobs=$jobs%3d time=$dt%6.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
