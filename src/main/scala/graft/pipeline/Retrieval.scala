package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus retrieval operators for training-data pipelines: inverted index
  * construction and BM25 ranked retrieval (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond" — public paper).
  * Retrieval over the training corpus backs quality filtering (keep docs
  * relevant to a target domain), decontamination triage, and curriculum
  * selection.
  *
  * Scale design: both operators are explode → groupBy pipelines keyed by
  * token — the same shuffle shape as TF-IDF; no driver-side state beyond
  * the two scalar corpus constants (N, avgdl). The posting lists are
  * per-token rows (never a driver collect), and the BM25 score needs only
  * a |query-terms| sized join against the per-doc term frequencies, so the
  * shuffled volume is proportional to documents containing a query term,
  * not the corpus. */
object Retrieval {

  /** Inverted index: one row per distinct token with its document
    * frequency and the sorted posting list of containing doc ids.
    * Postings are arrays per token row — bounded by the token's df; a
    * pathological stop-word row is still one row, and consumers needing
    * boundedness should df-cap first (the contamination() pattern). */
  def invertedIndex(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
                explode(array_distinct(TextOps.tokens(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
           sort_array(collect_list(col("id"))).as("postings"))

  /** BM25 top-k retrieval for one query (a whitespace-tokenized string):
    * score(d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) — the standard Lucene/
    * Robertson formulation. Scores are ROUNDED to 6 dp BEFORE ranking with
    * a doc-id tie-break (cross-engine float-route safety, the tfidfTopK
    * lesson). Returns (id, score, rank), rank ≤ k. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: String, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = query.split(" ").filter(_.nonEmpty).distinct.toSeq
    // materialized: consumed three times (N+avgdl, df, tf)
    val toks = docs.select(col(idCol).cast("long").as("id"),
                           explode(TextOps.tokens(col(textCol))).as("t"))
      .localCheckpoint(true)
    val lens = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    val corpus = lens.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
      .collect()(0)
    val nDocs = corpus.getLong(0).toDouble
    val avgdl = corpus.getDouble(1)
    val qtoks = toks.filter(col("t").isin(qTerms: _*))
    val dfs = qtoks.select("id", "t").distinct()
      .groupBy("t").agg(count(lit(1)).as("df"))
    val tfs = qtoks.groupBy("id", "t").agg(count(lit(1)).as("tf"))
    // Literal arithmetic shapes mirror the oracle SQL exactly (e.g. k1+1 is
    // a Scala-side constant both engines parse identically) so the only
    // float divergence is last-ulp ln/summation, absorbed by the rounding.
    val scored = tfs.join(dfs, "t").join(lens, "id")
      .select(col("id"),
        (log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
          .as("s"))
      .groupBy("id").agg(round(sum(col("s")), 6).as("score"))
    // Global top-k as TakeOrdered (orderBy+limit), then join-count rank of
    // the k survivors — no single-partition WindowExec anywhere.
    val top = scored.orderBy(col("score").desc, col("id").asc).limit(k)
    graft.metric.Ranking.rankTopK(top, "score", "id")
      .select(col("id"), col("score"), col("rank").cast("long").as("rank"))
      .orderBy("rank")
  }
}
