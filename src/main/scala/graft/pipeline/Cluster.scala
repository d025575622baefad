package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ArrayKernels

/** Embedding clustering for training-data pipelines: fixed-iteration
  * Lloyd's k-means and SemDeDup-style semantic deduplication (Abbas et al.
  * 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication" — public paper: cluster the embedding space, then drop
  * near-duplicates WITHIN clusters, so the pairwise scan is |cluster|²
  * instead of |corpus|²).
  *
  * Scale design: centroids are tiny (k·dim doubles) and live driver-side
  * as broadcast literals — the standard Spark k-means shape. Each Lloyd
  * iteration is one scan (assignment expression over fused dot kernels)
  * plus one k×dim aggregation; nothing corpus-sized ever shuffles except
  * the per-cluster pair join, which the clustering exists to bound.
  *
  * Determinism: init centroids are the k corpus vectors with the smallest
  * portable md5 hash of their id (engine-reproducible sampling — any ANSI
  * engine replays it); per-dim means are ROUNDED to 6 dp each iteration so
  * the engine-portable oracle (DuckDB AVG, different float summation
  * order) lands on bit-identical centroids, making the discrete
  * assignment reproducible across engines.
  *
  * Data-dependent init matters for cost, not just quality: a fixed
  * synthetic (sin-seeded) init left ~90% of a replicated probe corpus in
  * ONE cell regardless of k, keeping the within-cluster pair scan
  * quadratic; sampled centroids let two Lloyd passes balance the cells so
  * Σ|cluster|² actually shrinks with k.
  */
object Cluster {

  /** Nearest-centroid id: argmin_j ‖v − c_j‖² = argmin_j (‖c_j‖² − 2·v·c_j),
    * ties to the smallest j (struct-min mirrors the oracle's ROW_NUMBER). */
  private def assignExpr(vec: Column, cents: IndexedSeq[IndexedSeq[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (cv, j) =>
      val cc = cv.map(x => x * x).sum
      struct((lit(cc) - ArrayKernels.arrayDot(vec, typedLit(cv)) * 2).as("score"),
             lit(j).as("cl"))
    }: _*)).getField("cl")

  /** Fixed-iteration Lloyd's k-means over an embedding column. `iters`
    * counts ASSIGNMENT passes: iters = 2 means assign with the sampled
    * init centroids, recompute (rounded) means, assign once more — exactly
    * the unrolled-CTE chain the oracle replays. Empty clusters keep their
    * previous centroid. Returns (id, vec, cluster). */
  def kmeansFixed(emb: DataFrame, k: Int, dim: Int, iters: Int,
                  idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    require(iters >= 1, "need at least one assignment pass")
    ArrayKernels.register(emb.sparkSession)
    // Init: the k rows with the smallest md5Prefix60(id) (ties by id) —
    // a TakeOrdered over the corpus, one cheap pass. Cluster j = j-th
    // smallest hash, matching the oracle's ROW_NUMBER() - 1.
    val initRows = emb
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .orderBy(graft.functions.PortableHash
                 .md5Prefix60(col("id").cast("string")).asc, col("id").asc)
      .limit(k).collect()
    require(initRows.length == k,
            s"k=$k exceeds corpus size ${initRows.length}")
    var cents: IndexedSeq[IndexedSeq[Double]] =
      initRows.map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    // The true vector width comes from the data (init centroids ARE corpus
    // rows); a mismatched `dim` must fail loudly, not silently truncate
    // the mean recomputation (the same hazard hyperplaneBucket had).
    val width = cents.head.length
    require(dim <= 0 || dim == width,
            s"dim=$dim but the vector column is $width-wide")
    def assigned = emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
                              assignExpr(col(vecCol), cents).as("cluster"))
    (2 to iters).foreach { _ =>
      val meanCols = (0 until width).map(i =>
        round(avg(col("vec").getItem(i)), 6).as(s"m$i"))
      val rows = assigned.groupBy("cluster")
        .agg(meanCols.head, meanCols.tail: _*).collect()
      val next = rows.map(r => r.getInt(0) ->
        IndexedSeq.tabulate(width)(i => r.getDouble(i + 1))).toMap
      cents = IndexedSeq.tabulate(k)(j => next.getOrElse(j, cents(j)))
    }
    assigned
  }

  /** SemDeDup-style semantic near-dup pairs: k-means buckets the corpus,
    * exact cosine verifies pairs WITHIN each cluster only. Output
    * (i, j, cos) with i < j and cos >= threshold. */
  def semanticPairs(emb: DataFrame, k: Int, dim: Int, iters: Int,
                    threshold: Double): DataFrame = {
    val cl = kmeansFixed(emb, k, dim, iters)
      .localCheckpoint(true) // both sides of the pair join read assignments
    cl.as("a")
      .join(cl.as("b"),
            col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
              ArrayKernels.arrayCosine(col("a.vec"), col("b.vec")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), round(col("cos"), 6).as("cos"))
  }

  /** Benchmark decontamination: flag training documents sharing at least
    * one word n-gram with a held-out benchmark set (the GPT-3-style 13-gram
    * overlap check, here parameterized). Returns one row per contaminated
    * doc: (id, n_bench_docs, n_shared_ngrams).
    *
    * Scale design: distinct (doc, shingle) sets on both sides, then an
    * equi-join on the shingle key — shuffle keyed by shingle, AQE
    * coalesced. The benchmark side is the small one by construction;
    * Catalyst broadcasts it when it fits.
    *
    * `maxDocFreq` is the scale guard: a shingle occurring in more than τ
    * training docs ("the end of the") multiplies |docs-containing| ×
    * |bench-containing| join rows — quadratic in the hot key as the corpus
    * grows, the classic skewed-equi-join killer. Shingles that common carry
    * no contamination signal, so they are dropped BEFORE the join via one
    * document-frequency aggregate (a stop-shingle cap; df > τ ⇒ out). The
    * cap is plain relational logic, so the DuckDB oracle replays it
    * exactly. After the cap the join fan-out per shingle is ≤ τ × |bench
    * docs sharing it|, which also bounds the double-distinct aggregate's
    * Expand. 0 disables the cap.
    *
    * With `hashShingles` (the default) every shingle key — df aggregate and
    * join alike — is xxhash64(ngram): an 8-byte shuffle key instead of
    * ~50-char strings. Collision odds ~|grams|²/2⁶⁴ are negligible for
    * flagging, and the oracle keeps raw strings (counts agree unless a
    * collision actually lands in the data). */
  def contamination(docs: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 8,
                    hashShingles: Boolean = true,
                    maxDocFreq: Long = 0): DataFrame = {
    def shingleSet(df: DataFrame, as: String) =
      Dedup.shingleRows(df, idCol, textCol, n, hashed = hashShingles)
        .select(col("id").as(as), col("sh")) // shared semantics
    val d = shingleSet(docs, "id")
    val benchSh = shingleSet(bench, "bid")
    val capped =
      if (maxDocFreq <= 0) d
      else {
        // The cap only matters for shingles that can reach the join, so the
        // document-frequency aggregate runs over the semi-joined candidates
        // (≤ |d| rows, no multiplication), not the whole corpus' shingles —
        // a shingle absent from the benchmark never joins regardless of df.
        // shingleRows is distinct per (id, sh), so count == document freq.
        val cand = d.join(benchSh.select("sh").distinct(), Seq("sh"),
                          "left_semi")
        val hot = cand.groupBy("sh").agg(count(lit(1)).as("_df"))
          .filter(col("_df") > maxDocFreq).select("sh")
        cand.join(hot, Seq("sh"), "left_anti")
      }
    capped
      .join(benchSh, "sh")
      .filter(col("id") =!= col("bid"))
      .groupBy("id")
      .agg(countDistinct("bid").as("n_bench_docs"),
           countDistinct("sh").as("n_shared_ngrams"))
  }
}
