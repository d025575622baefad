package graft

import org.apache.spark.sql.functions._

/** One-off probe (PLANS.md, round 10): one order-of-magnitude scale point
  * per heavy family — dedup, ANN, training, eval ranking — because sf0.1
  * medians cannot distinguish linear from n·log n from gently-n². Each
  * family runs the SAME library entry point at n and 10n synthetic rows
  * and prints both wall times; the per-family empirical exponent is
  * log10(t₁₀ₙ/tₙ) (1.0 = linear, ≤0 = scheduling-bound flat). */
object ScratchScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def report(fam: String, n1: Long, t1: Double, n2: Long, t2: Double): Unit =
      println(f"PROBE $fam%-9s n=$n1%8d t=$t1%7.2fs | n=$n2%9d " +
        f"t=$t2%7.2fs | exponent=${math.log10(t2 / t1)}%5.2f")

    // ---- Dedup: MinHash/LSH banding end-to-end (shingles → signatures →
    // bands → candidate join → exact-Jaccard verify), with planted dups.
    def docs(n: Int) = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(k =>
        concat(lit("w"), ((col("id") / lit(10)) * 7 + k * 13) % 997)): _*)
        .as("text"))
    val dedupTimes = Seq(5000, 50000).map { n =>
      (n.toLong, time(
        graft.pipeline.Dedup.minhashLshPairs(docs(n), "doc_id", "text")
          .count()))
    }
    report("dedup", dedupTimes(0)._1, dedupTimes(0)._2,
           dedupTimes(1)._1, dedupTimes(1)._2)

    // ---- ANN: IVF top-k (centroid cell assignment over the corpus,
    // per-cell candidate join against 64 queries).
    val dim = 16
    def vecs(n: Int, seed: Double) = spark.range(n).select(col("id"),
      graft.score.Embeddings.deterministicVec(col("id"), dim, seed).as("vec"))
    val annTimes = Seq(20000, 200000).map { n =>
      (n.toLong, time(
        graft.pipeline.Similarity.ivfTopK(vecs(n, 0.3), vecs(64, 1.1),
          k = 10, nCentroids = 16, dim = dim).count()))
    }
    report("ann_ivf", annTimes(0)._1, annTimes(0)._2,
           annTimes(1)._1, annTimes(1)._2)

    // ---- Training: two TransE SGD steps (edge-gradient scatter over
    // 3n edges, entity-state join per step).
    def ents(n: Int) = spark.range(n).toDF("id")
    def edges(n: Int) = spark.range(3L * n).select(
      (col("id") % n).as("src"), (col("id") % 7).as("rel"),
      ((col("id") * 31 + 5) % n).as("dst"))
    val trainTimes = Seq(2000, 20000).map { n =>
      (n.toLong, time(
        graft.score.Training.transeSgd(ents(n), edges(n), dim = 8,
          entSeed = 0.3, relSeed = 1.7, steps = 2).count()))
    }
    report("train", trainTimes(0)._1, trainTimes(0)._2,
           trainTimes(1)._1, trainTimes(1)._2)

    // ---- Eval ranking: exhaustive tail ranks of 100 eval edges against
    // the full entity pool (the |edges| × |entities| pair scan the eval
    // suites run per query type) on a one-step-trained state.
    val evalTimes = Seq(2000, 20000).map { n =>
      val params = graft.score.Training.transeSgd(ents(n), edges(n), dim = 8,
        entSeed = 0.3, relSeed = 1.7, steps = 1).localCheckpoint(true)
      val ev = edges(n).limit(100)
      (n.toLong, time(
        graft.score.Training.transeRanks(params, ev).count()))
    }
    report("eval_rank", evalTimes(0)._1, evalTimes(0)._2,
           evalTimes(1)._1, evalTimes(1)._2)
  }
}
