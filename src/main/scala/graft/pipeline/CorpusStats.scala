package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-statistics operators for training-data pipelines: repetition
  * filters and TF-IDF keyword extraction.
  *
  * Scale design: everything is explode → groupBy on (doc, token/ngram) —
  * shuffles keyed by high-cardinality composites, AQE-coalesced; no
  * driver-side loops (the one `count()` in TF-IDF is a single aggregate
  * job). Documents never cross the shuffle whole — only their exploded
  * token rows do.
  */
object CorpusStats {

  /** Per-document repetition metrics, after the Gopher repetition-filter
    * family (Rae et al. 2021, public paper; adapted to occurrence
    * fractions):
    *  - dup_token_frac: 1 − |distinct tokens| / |tokens| — bulk repetition;
    *  - top_ngram_frac: occurrences of the most frequent word n-gram /
    *    total n-grams — loop/boilerplate detection.
    * Both are exact integer ratios, so the oracle comparison is float-safe. */
  def repetition(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 2): DataFrame = {
    // Tokens projected before any HOF lambda (shinglesOf perf contract).
    val base = docs.select(col(idCol).as("id"),
                           TextOps.tokens(col(textCol)).as("ts"))
    val toks = base.select(col("id"), explode(col("ts")).as("t"))
    val tokStats = toks.groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), countDistinct("t").as("n_distinct"))
    val gcounts = base
      .select(col("id"), explode(TextOps.shinglesOf(col("ts"), n)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
    val gstats = gcounts.groupBy("id")
      .agg(max("c").as("max_g"), sum("c").as("n_g"))
    tokStats.join(gstats, "id")
      .select(col("id"),
              round(lit(1.0) - col("n_distinct") / col("n_tokens"), 6)
                .as("dup_token_frac"),
              round(col("max_g") / col("n_g"), 6).as("top_ngram_frac"))
  }

  /** Per-document unigram language-model score — the classic
    * perplexity-style quality filter (score docs by how typical their
    * tokens are of the corpus; outliers in either direction are
    * boilerplate or noise). The corpus itself is the model:
    * p(t) = count(t) / total_tokens, and a document scores the mean token
    * log-probability Σ ln p(t_i) / |doc|. One explode + two aggregations +
    * one broadcast-joinable (|vocab|-sized) probability table — no
    * driver-side state beyond the scalar total. Output:
    * (id, avg_logp, n_tokens), avg_logp rounded to 6 dp. */
  def unigramLogProb(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    // materialized: consumed three times (total, probability table, join)
    val toks = docs.select(col(idCol).as("id"),
                           explode(TextOps.tokens(col(textCol))).as("t"))
      .localCheckpoint(true)
    val total = toks.count()
    val probs = toks.groupBy("t").agg(count(lit(1)).as("ct"))
      .select(col("t"), log(col("ct") / lit(total.toDouble)).as("logp"))
    toks.join(probs, "t")
      .groupBy("id")
      .agg(round(sum(col("logp")) / count(lit(1)), 6).as("avg_logp"),
           count(lit(1)).as("n_tokens"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, public paper):
    * split the corpus into head/middle/tail thirds by language-model score
    * — the standard quality-tier assignment before sampling. Thresholds are
    * the ⅓ and ⅔ quantiles of the per-doc [[unigramLogProb]] score
    * (rounded 6 dp), computed with EXACT interpolated percentiles so the
    * DuckDB oracle (quantile_cont) lands on identical cut points; docs
    * compare `<= t` against them (head = highest scores). Scale note: the
    * thresholds come from the frequency-table prefix-sum
    * ([[graft.operators.ExactQuantiles]] — bit-identical to the
    * `percentile` aggregate without its whole-column one-task buffer) and
    * reach the assignment by broadcasting ONE threshold row — no
    * driver-side collect; thresholds stay distributed. (The two
    * localCheckpoints below do run Spark jobs at construction time; what
    * was removed in round 13 is the driver-side value pull, not the
    * materialization.) Output: (id, avg_logp, bucket). */
  def perplexityBuckets(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val lp = unigramLogProb(docs, idCol, textCol)
      .select(col("id"), col("avg_logp"))
      .localCheckpoint(true) // consumed twice: thresholds + assignment
    val ts = graft.operators.ExactQuantiles.quantiles(lp, Seq.empty,
      Seq(("avg_logp", "_t1", 1.0 / 3.0), ("avg_logp", "_t2", 2.0 / 3.0)))
    lp.crossJoin(broadcast(ts))
      .select(col("id"), col("avg_logp"),
        when(col("avg_logp") <= col("_t1"), lit("tail"))
          .when(col("avg_logp") <= col("_t2"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))
  }

  /** Corpus-level top-k bigram collocations by pointwise mutual
    * information — the classic phrase-mining signal (Church & Hanks 1990):
    * PMI(x,y) = ln( p(xy) / (p(x)·p(y)) ) with p(x) from the unigram
    * distribution (count / total tokens) and p(xy) from the bigram
    * distribution (count / total bigrams). Bigrams rarer than `minCount`
    * are dropped first (PMI's low-frequency pathology). The score is
    * rounded to 6 dp BEFORE ranking so float-route ties break on the
    * bigram text identically across engines.
    *
    * Scale shape: two explode → groupBy passes (unigrams, bigrams) — both
    * keyed by high-cardinality token strings, AQE-coalesced — then the
    * bigram frame joins the (|vocab|-sized, broadcastable) unigram counts
    * twice and one global top-k (TakeOrdered, no full sort) ends the plan.
    * Output: (bigram, c_bigram, pmi, rank), rank 1..k. */
  def pmiTopK(docs: DataFrame, idCol: String, textCol: String,
              k: Int = 25, minCount: Long = 10): DataFrame = {
    // materialized: consumed twice (unigram totals, bigram build input)
    val toks = docs.select(col(idCol).as("id"),
                           TextOps.tokens(col(textCol)).as("ts"))
      .localCheckpoint(true)
    val uni = toks.select(explode(col("ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cu"))
      .localCheckpoint(true) // consumed twice (total + two join probes)
    // sum() of an empty frame is NULL; 1L keeps the (empty) plan NaN-free.
    val nTok = Option(uni.agg(sum("cu")).collect()(0).get(0))
      .map(_.asInstanceOf[Long]).getOrElse(1L)
    val bigAll = toks
      .select(explode(TextOps.shinglesOf(col("ts"), 2)).as("g"))
      .filter(size(split(col("g"), " ")) === 2) // single-token docs emit no bigram
      .groupBy("g").agg(count(lit(1)).as("cb"))
      .localCheckpoint(true) // consumed twice (total + scored)
    val nBig = Option(bigAll.agg(sum("cb")).collect()(0).get(0))
      .map(_.asInstanceOf[Long]).getOrElse(1L)
    val scored = bigAll
      .filter(col("cb") >= minCount)
      .withColumn("x", split(col("g"), " ")(0))
      .withColumn("y", split(col("g"), " ")(1))
      .join(uni.select(col("t").as("x"), col("cu").as("cx")), "x")
      .join(uni.select(col("t").as("y"), col("cu").as("cy")), "y")
      .select(col("g").as("bigram"), col("cb").as("c_bigram"),
        round(log((col("cb") / lit(nBig.toDouble)) /
          ((col("cx") / lit(nTok.toDouble)) * (col("cy") / lit(nTok.toDouble)))), 6)
          .as("pmi"))
    // Global top-k as TakeOrdered (orderBy + limit), THEN join-count rank
    // of the k survivors — the corpus-wide frame never single-partitions
    // and no WindowExec runs unpartitioned.
    graft.metric.Ranking.rankTopK(
        scored.orderBy(col("pmi").desc, col("bigram").asc).limit(k),
        "pmi", "bigram")
      .withColumn("rank", col("rank").cast("int"))
      .orderBy("rank")
  }

  /** Per-document bigram language-model score with Stupid Backoff
    * (Brants et al. 2007, "Large Language Models in Machine Translation"
    * — THE distributed n-gram LM: no normalization, no discounting, just
    * counts and a fixed backoff, chosen precisely because it runs as
    * map-reduce over corpus-scale count tables):
    *
    *   S(w_i | w_{i−1}) = c(w_{i−1} w_i) / c(w_{i−1})      if bigram seen
    *                    = 0.4 · c(w_i) / N                  otherwise
    *
    * scored as the mean ln S over the document's bigram transitions —
    * the sharper cousin of [[unigramLogProb]] for perplexity-style
    * filtering (catches scrambled word salad that unigram stats miss).
    *
    * The model counts come from `modelDocs` — typically a held-out train
    * split, never the scored corpus itself (self-scoring would make every
    * bigram "seen" and the backoff dead). Unigrams absent from the model
    * get a half-count floor (the minimal OOV convention; Stupid Backoff
    * itself leaves OOV undefined).
    *
    * Plan shape: one unigram and one bigram count table from the model
    * (explode → groupBy each), then the per-doc transition frame joins
    * both and aggregates per id. All equi-joins on token keys; the count
    * tables shuffle once and would bucket/broadcast by size tier at
    * 100 TB. Docs with fewer than 2 tokens have no transition and are
    * absent. Output: (id, n_big, avg_logs), 6 dp. */
  def bigramLogProb(docs: DataFrame, modelDocs: DataFrame, idCol: String,
                    textCol: String, backoff: Double = 0.4): DataFrame = {
    def toks(df: DataFrame) = df.select(col(idCol).as("id"),
                                        TextOps.tokens(col(textCol)).as("ts"))
    def trans(df: DataFrame) = toks(df)
      .select(col("id"), explode(TextOps.shinglesOf(col("ts"), 2)).as("g"))
      .filter(size(split(col("g"), " ")) === 2)
    val uni = toks(modelDocs).select(explode(col("ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cu"))
      .localCheckpoint(true) // total + two probe joins
    val nTok = Option(uni.agg(sum("cu")).collect()(0).get(0))
      .map(_.asInstanceOf[Long]).getOrElse(1L)
    val big = trans(modelDocs).groupBy("g").agg(count(lit(1)).as("cb"))
    // cb non-null ⇒ the bigram is in the model ⇒ cx non-null; only the
    // backoff branch can see an OOV y, floored at half a count.
    val logS = when(col("cb").isNotNull, log(col("cb") / col("cx")))
      .otherwise(log(lit(backoff) * coalesce(col("cy"), lit(0.5))
                       / lit(nTok.toDouble)))
    trans(docs)
      .withColumn("x", split(col("g"), " ")(0))
      .withColumn("y", split(col("g"), " ")(1))
      .join(big, Seq("g"), "left")
      .join(uni.select(col("t").as("x"), col("cu").as("cx")), Seq("x"), "left")
      .join(uni.select(col("t").as("y"), col("cu").as("cy")), Seq("y"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_big"), round(avg(logS), 6).as("avg_logs"))
  }

  /** Per-group KL divergence from the corpus unigram distribution —
    * corpus-QA for mixture design: a source/domain/language whose token
    * distribution diverges hard from the pool is boilerplate, spam, or a
    * mislabeled language. KL(group ‖ corpus) = Σ_{t ∈ group}
    * p_g(t) · ln(p_g(t) / p_c(t)) needs NO smoothing: the sum runs over
    * the group's own support, where p_g > 0 by construction and p_c > 0
    * because every group token is a corpus token — exact, and no
    * group × vocab cross frame.
    *
    * Plan shape: one explode → (group, token) counts, one token-keyed
    * join against the (|vocab|-sized, broadcastable) corpus counts, one
    * group aggregate. Shuffles keyed by token then group. Output:
    * (group, n_tokens, kl) with kl rounded 6 dp. */
  def sourceDivergence(docs: DataFrame, groupCol: String,
                       textCol: String): DataFrame = {
    // Materialized: consumed three times (corpus hist, totals, group hist).
    val toks = docs.select(col(groupCol).as("grp"),
                           explode(TextOps.tokens(col(textCol))).as("t"))
      .localCheckpoint(true)
    val nTok = toks.count().toDouble
    val corpus = toks.groupBy("t").agg(count(lit(1)).as("cc"))
    val grp = toks.groupBy("grp", "t").agg(count(lit(1)).as("cg"))
    val grpTotals = grp.groupBy("grp").agg(sum("cg").as("ng"))
    grp.join(corpus, "t")
      .join(broadcast(grpTotals), "grp")
      .groupBy(col("grp").as(groupCol))
      .agg(first(col("ng")).as("n_tokens"),
           round(sum((col("cg") / col("ng")) *
             log((col("cg") / col("ng")) / (col("cc") / nTok))), 6).as("kl"))
  }

  /** Per-group document-length profile: count plus exact interpolated
    * token-count percentiles (p50/p90/p99) — the shard-size / context-
    * budget planning report. Percentiles via the frequency-table
    * prefix-sum ([[graft.operators.ExactQuantiles]]): the per-group
    * `percentile` aggregate buffers a whole GROUP in one task (a skewed
    * source = a data-sized spool), this never holds more than a
    * distinct-length partition anywhere — and token counts have a tiny
    * distinct domain, so the frequency table is near-constant-sized. */
  def lengthProfile(docs: DataFrame, groupCol: String,
                    textCol: String): DataFrame = {
    val nt = docs.select(col(groupCol), TextOps.tokenCount(col(textCol)).as("nt"))
    val qs = graft.operators.ExactQuantiles.quantiles(nt, Seq(groupCol),
      Seq(("nt", "_p50", 0.5), ("nt", "_p90", 0.9), ("nt", "_p99", 0.99)))
    val counts = nt.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    // LEFT join per the ExactQuantiles contract: a group whose values are
    // all NULL has no frequency-table rows, so it must be re-attached here
    // to keep its n_docs row with NULL percentiles (the built-in
    // `percentile` aggregate's semantics).
    counts.alias("c").join(qs.alias("q"),
        col(s"c.$groupCol") <=> col(s"q.$groupCol"), "left")
      .select(col(s"c.$groupCol"), col("n_docs"),
              round(col("_p50"), 6).as("p50"),
              round(col("_p90"), 6).as("p90"),
              round(col("_p99"), 6).as("p99"))
  }

  /** Zipf rank-frequency slope over the top-N vocabulary — the corpus
    * health check (natural language sits near slope −1; templated or
    * machine-generated corpora bend hard away from it; Zipf 1949). Closed-
    * form OLS of ln(count) on ln(rank): slope = (NΣxy − ΣxΣy)/(NΣx² −
    * (Σx)²) — no iteration, no driver math beyond the final row. The
    * corpus-wide vocabulary count is one explode → groupBy; the top-N cut
    * is orderBy+limit (TakeOrdered — never a partitionless window over
    * the vocab), and the regression aggregates N scalars. Output: one row
    * (n_top, zipf_slope, intercept), 6 dp. */
  def zipfSlope(docs: DataFrame, textCol: String, topN: Int = 100): DataFrame = {
    require(topN > 1, s"need topN > 1 for a slope, got $topN")
    val counts = docs.select(explode(TextOps.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val top = counts.orderBy(col("c").desc, col("t").asc).limit(topN)
    val xy = graft.metric.Ranking.rankTopK(top, "c", "t")
      .select(log(col("rank")).as("x"), log(col("c")).as("y"))
    xy.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
           sum(col("x") * col("y")).as("sxy"),
           sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") >= 2) // a slope needs two points; empty corpus -> empty
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .select(col("n").as("n_top"),
              round(col("slope"), 6).as("zipf_slope"),
              round((col("sy") - col("slope") * col("sx")) / col("n"), 6)
                .as("intercept"))
  }

  /** Top-k TF-IDF keywords per document: score = tf · ln(N / df), ranked
    * per doc (score desc, token asc). The score is ROUNDED to 6 dp BEFORE
    * ranking: mathematically-tied scores reached through different
    * floating-point routes (e.g. 2·ln(10) vs ln(100)) can differ by an ulp
    * per engine — ranking the rounded value makes the tie-break land on
    * the token ordering identically everywhere. */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    // materialized: consumed twice (term frequencies, document frequencies)
    val toks = docs.select(col(idCol).as("id"),
                           explode(TextOps.tokens(col(textCol))).as("t"))
      .localCheckpoint(true)
    val nDocs = docs.count()
    val tf = toks.groupBy("id", "t").agg(count(lit(1)).as("tf"))
    val dfCounts = toks.select("id", "t").distinct()
      .groupBy("t").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfCounts, "t")
      .select(col("id"), col("t").as("token"),
              round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6)
                .as("score"))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("token"), col("rank"), col("score"))
  }
}
