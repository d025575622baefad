package graft

import org.apache.spark.sql.functions._

/** One-off probe (PLANS.md, round 13): THREE scale decades per heavy
  * family — dedup, ANN, training — because the round-10 two-point probe
  * (n, 10n) distinguishes scheduling-floor-flat from linear but cannot
  * see an n·log n tail (r12 verdict stretch ask #8). With three points
  * the per-decade empirical exponents e₁ = log10(t₂/t₁) and
  * e₂ = log10(t₃/t₂) separate the regimes: both ≈1 ⇒ linear; e₂ > e₁
  * growing with n ⇒ super-linear tail; e₁ ≈ 0 ⇒ still under the
  * scheduling floor at that size. Synthetic inputs use the same
  * generators as ScratchScaleProbe so decades compose with the round-10
  * numbers. */
object ScratchScale13Probe {
  def main(args: Array[String]): Unit = {
    // own local[16] session: the 100×-decade points are compute-bound
    // and the shared local[4] test session underuses the box by 4×
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .appName("graft-scale13")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def point(fam: String, n: Long)(f: => Any): (Long, Double) = {
      val t = time(f)
      println(f"POINT13 $fam n=$n%9d t=$t%8.2fs")
      (n, t)
    }
    def report(fam: String, pts: Seq[(Long, Double)]): Unit = {
      val body = pts.map { case (n, t) => f"n=$n%9d t=$t%8.2fs" }
        .mkString(" | ")
      val exps = pts.sliding(2).map { case Seq((_, t1), (_, t2)) =>
        f"${math.log10(t2 / t1)}%5.2f"
      }.mkString(", ")
      println(s"PROBE13 ${fam.padTo(9, ' ')} $body | decade exponents: $exps")
    }

    // ---- Dedup: MinHash/LSH banding end-to-end, planted 10-way dups.
    // Token space SCALES with n (the round-10 fixture's fixed 997-token
    // space saturates at 500k docs: shingle diversity collapses, LSH
    // buckets merge across groups, and the probe would measure fixture
    // saturation, not the operator — observed as a >15-min 500k point).
    def docs(n: Int) = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(k =>
        concat(lit("w"), ((col("id") / lit(10)) * 7 + k * 13) % (n / 5))): _*)
        .as("text"))
    report("dedup", Seq(5000, 50000, 500000).map { n =>
      point("dedup", n)(
        graft.pipeline.Dedup.minhashLshPairs(docs(n), "doc_id", "text")
          .count())
    })

    // ---- ANN: IVF top-k over three corpus decades, 64 queries.
    val dim = 16
    def vecs(n: Int, seed: Double) = spark.range(n).select(col("id"),
      graft.score.Embeddings.deterministicVec(col("id"), dim, seed).as("vec"))
    report("ann_ivf", Seq(20000, 200000, 2000000).map { n =>
      point("ann_ivf", n)(
        graft.pipeline.Similarity.ivfTopK(vecs(n, 0.3), vecs(64, 1.1),
          k = 10, nCentroids = 16, dim = dim).count())
    })

    // ---- Training: two TransE SGD steps at three entity decades
    // (edges = 3n, so the edge-gradient scatter scales with n too).
    def ents(n: Int) = spark.range(n).toDF("id")
    def edges(n: Int) = spark.range(3L * n).select(
      (col("id") % n).as("src"), (col("id") % 7).as("rel"),
      ((col("id") * 31 + 5) % n).as("dst"))
    report("train", Seq(2000, 20000, 200000).map { n =>
      point("train", n)(
        graft.score.Training.transeSgd(ents(n), edges(n), dim = 8,
          entSeed = 0.3, relSeed = 1.7, steps = 2).count())
    })
  }
}
