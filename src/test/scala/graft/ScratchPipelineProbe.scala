package graft

import org.apache.spark.sql.functions._

/** One-off probe (PLANS.md round 15; VERDICT_r14 task 6): the COMPOSED
  * six-stage pipeline — WARC parse (half the shards gzipped) → MinHash/
  * LSH dedup → filter cascade → quality-weighted hash sampling → chunk →
  * pack — at three document decades, same library entry points as the
  * `pipeline_end_to_end` oracle row. The stage probes (round 10/13)
  * showed each stage individually sublinear; the composition could still
  * hide a super-linear seam (e.g. the dedup left_anti against a growing
  * pair set, or the pack window). Fixture notes: token space scales with
  * n (the round-13 saturation lesson — a fixed space collapses shingle
  * diversity and measures the fixture, not the operator); every 5th doc
  * is a planted dup of an earlier one, so the dedup join always has real
  * work; pack GROUPS scale with n (a real packer groups per output
  * shard — the oracle fixture's 2 fixed groups would turn the window
  * into two giant sorted partitions at 300k docs and measure that
  * fixture choice, not the operator). */
object ScratchPipelineProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .appName("graft-pipeline-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def run(nDocs: Int): Long = {
      val docsPerShard = 3
      val nShards = nDocs / docsPerShard
      val tokSpace = math.max(97, nDocs / 5)
      val shards = spark.range(nShards).map { sid =>
        val recs = (0 until docsPerShard).map { k =>
          val dk = sid * docsPerShard + k
          val tid = if (dk % 5 == 2 && dk >= 7) dk - 7 else dk
          val n = 24 + (tid % 7).toInt * 8
          val text = (0 until n).map { j =>
            if (j % 5 == 0) "the"
            else s"t${tid}x${(tid * 7 + j * 11) % tokSpace}"
          }.mkString(" ")
          ("response", s"http://ex.org/$sid/$k", text)
        }
        val raw = graft.pipeline.TextOps.warcBytes(recs)
        (sid, if (sid % 2 == 0) graft.pipeline.TextOps.gzip(raw) else raw)
      }.toDF("shard_id", "payload")
      val docs = graft.pipeline.TextOps
        .warcCorpus(shards, "shard_id", "payload")
        .filter(col("warc_type") === "response")
        .select((col("shard_id") * docsPerShard + col("rec_idx"))
                  .as("doc_key"),
                col("content").as("text"))
      val pairs = graft.pipeline.Dedup.minhashLshPairs(
        docs, "doc_key", "text", family = graft.pipeline.Dedup.PortableMd5)
      val surv = docs.join(
        pairs.select(col("j").as("doc_key")).distinct(),
        Seq("doc_key"), "left_anti")
      val kept = graft.pipeline.TextOps
        .filterCascade(surv, "doc_key", "text")
        .filter(col("keep"))
        .select(col("id").as("doc_key"))
        .join(surv, "doc_key")
      val sampled = kept
        .withColumn("quality",
          graft.pipeline.TextOps.qualityScore(col("text")))
        .filter(graft.pipeline.Sampling.hashBucket(col("doc_key"), "e2e")
                  < sqrt(col("quality")) * 1000000)
      val nGroups = math.max(2, nDocs / 1000)
      val chunks = graft.pipeline.TextOps
        .chunk(sampled, "doc_key", "text", window = 32, overlap = 0)
        .withColumn("grp", (col("id") % nGroups).cast("long"))
      graft.pipeline.TextOps
        .pack(chunks, "grp", "id", "chunk_idx", "chunk_tokens",
              budget = 128)
        .count()
    }

    val pts = Seq(3000, 30000, 300000).map { n =>
      val t = time(run(n))
      println(f"POINT15 pipeline n=$n%7d t=$t%8.2fs")
      (n, t)
    }
    val exps = pts.sliding(2).map { case Seq((_, t1), (_, t2)) =>
      f"${math.log10(t2 / t1)}%5.2f"
    }.mkString(", ")
    val body = pts.map { case (n, t) => f"n=$n%7d t=$t%8.2fs" }
      .mkString(" | ")
    println(s"PROBE15 pipeline $body | decade exponents: $exps")
    spark.stop()
  }
}
