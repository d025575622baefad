package graft

import org.apache.spark.sql.functions._

/** One-off probe (PLANS.md, round 9): scale shape of the new ingestion
  * and sketch operators. gunzip/WARC ingestion is a partition-local
  * codec map — time must scale ~linearly in shard count with ZERO
  * shuffles; the count-min sketch's counter table is fixed (d×w)
  * regardless of row count, so the build is one-shuffle linear and the
  * broadcast estimate join never grows a driver-side structure. */
object ScratchIngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    for (n <- Seq(2000, 20000)) {
      val shards = spark.range(n).mapPartitions(_.map { id =>
        val recs = (0 until 3).map(k =>
          ("response", s"http://x/$id/$k", ("tok " * 200) + id))
        (id, graft.pipeline.TextOps.gzip(
          graft.pipeline.TextOps.warcBytes(recs)))
      }).toDF("shard_id", "payload").localCheckpoint(true)
      val t1 = System.nanoTime()
      val nRecs = graft.pipeline.TextOps
        .warcCorpus(shards, "shard_id", "payload").count()
      println(f"PROBE warc n=$n%6d " +
        f"ingest=${(System.nanoTime() - t1) / 1e9}%6.2fs recs=$nRecs")
    }
    for (n <- Seq(100000, 1000000)) {
      val toks = spark.range(n)
        .select((col("id") % 997).cast("string").as("tok"))
        .localCheckpoint(true)
      for (w <- Seq(64, 65536)) {
        val t0 = System.nanoTime()
        val rows = graft.pipeline.Sketch.cmSketch(toks, "tok", 4, w).count()
        val t1 = System.nanoTime()
        val keys = graft.pipeline.Sketch.cmsEstimate(
          graft.pipeline.Sketch.cmSketch(toks, "tok", 4, w),
          toks.distinct(), "tok", 4, w).count()
        println(f"PROBE cms n=$n%8d w=$w%6d " +
          f"sketch=${(t1 - t0) / 1e9}%6.2fs rows=$rows " +
          f"est=${(System.nanoTime() - t1) / 1e9}%6.2fs keys=$keys")
      }
    }
    spark.stop()
  }
}
