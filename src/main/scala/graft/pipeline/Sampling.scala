package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Spark's `sample()`/`randomSplit()` are seed-based and partitioning-
  * dependent — rerunning on a repartitioned 100 TB corpus yields a
  * different sample, which breaks reproducibility audits and cross-engine
  * verification. These operators decide membership from a content hash of
  * a key column instead: the same row lands in the same sample/split on
  * any engine, any partitioning, any day (same portable md5-prefix hash
  * family as the dedup/eval-split operators).
  *
  * Scale notes: membership is a pure per-row expression (no shuffle, no
  * state); stratified sampling broadcasts only the per-stratum fraction
  * table. Skew-free by construction — hash buckets are uniform.
  */
object Sampling {

  private val BUCKETS = 1000000L // ppm resolution

  /** Uniform bucket in [0, BUCKETS) from the portable md5-prefix hash of
    * (salt, key). */
  def hashBucket(key: Column, salt: String): Column =
    pmod(graft.functions.PortableHash.md5Prefix60(
      concat(lit(salt), lit("|"), key.cast("string"))), lit(BUCKETS))

  /** DuckDB rendering of [[hashBucket]] for oracle SQL. */
  def hashBucketSql(keyExpr: String, salt: String): String =
    s"(${graft.functions.PortableHash.md5Prefix60Sql(
      s"'$salt' || '|' || CAST($keyExpr AS VARCHAR)")} % $BUCKETS)"

  /** Deterministic `fraction` sample: keeps rows whose hash bucket falls
    * below fraction·BUCKETS. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = "sample"): DataFrame =
    df.filter(hashBucket(col(keyCol), salt) < (fraction * BUCKETS).toLong)

  /** Per-domain document cap — the C4-style per-site limit: normalize
    * each document's URL ([[graft.pipeline.TextOps.urlNormalize]]),
    * group by registrable domain, and keep at most `k` documents per
    * domain, selected by the portable md5 hash of (domain, id) so the
    * survivors are an unbiased deterministic draw any ANSI engine
    * replays (not "the first k by id", which would bias toward old
    * documents). The per-domain rank is a PARTITIONED window — domain
    * cardinality is the parallelism, and no partition exceeds one
    * domain's documents, so the plan holds at 100 TB (hot mega-domains
    * are exactly the rows the cap discards anyway). Returns
    * (id, domain, rk ≤ k). */
  def domainCap(docs: DataFrame, idCol: String, urlCol: String,
                k: Int, salt: String = "domcap"): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    val dom = graft.pipeline.TextOps.urlNormalize(docs, idCol, urlCol)
      .select(col("id"), col("domain"))
    val h = graft.functions.PortableHash.md5Prefix60(
      concat(lit(salt), lit("|"), col("domain"), lit("|"),
             col("id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain")).orderBy(h.asc, col("id").asc)
    dom.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Deterministic WEIGHTED sample: keeps each row with probability equal
    * to `weight` (a per-row column in [0, 1]) — quality-proportional
    * corpus sampling, the pattern behind quality-bucketed pipeline
    * resampling. Membership = hashBucket(key) < weight·BUCKETS: still a
    * pure per-row expression (no shuffle), reproducible across engines
    * and partitionings, and monotone in the weight (raising a row's
    * weight can only add it to the sample, same salt). */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
                     salt: String = "wsample"): DataFrame =
    df.filter(hashBucket(col(keyCol), salt) < weight * BUCKETS)

  /** Fixed-size weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006, the A-ES one-pass scheme — public paper): each row
    * draws u ∈ (0, 1] from the portable hash and ranks by u^(1/w),
    * keeping the top k — equivalently by ln(u)/w, the monotone form used
    * here. The key is 6-dp-quantized BEFORE ranking with an id
    * tiebreak (the cross-engine round-before-rank discipline), so a SQL
    * oracle replays the exact membership. Plans as TakeOrderedAndProject:
    * per-partition top-k then a k-row merge — no global sort, no
    * full shuffle, the right shape at corpus scale. */
  def weightedSampleK(df: DataFrame, keyCol: String, weight: Column, k: Int,
                      salt: String = "aes"): DataFrame = {
    val u = (hashBucket(col(keyCol), salt) + lit(1.0)) / lit(BUCKETS + 1.0)
    df.withColumn("aes_key", round(log(u) / weight, 6))
      .orderBy(col("aes_key").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Stratified deterministic sample: per-stratum fractions (stratum value
    * -> fraction); strata absent from the map are dropped. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       salt: String = "strat"): DataFrame = {
    val thresh = fractions.foldLeft(lit(-1L)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit((f * BUCKETS).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt) < thresh)
  }

  /** Deterministic source-mixture balancing: downsample every group (e.g.
    * source/domain/language) to the size of the SMALLEST group — the
    * uniform-mixture special case of training-data mixture re-weighting.
    * Per-group keep fraction = min(count)/count(group), computed in-plan
    * (one tiny groupBy, broadcast back); membership is the same pure
    * hash-threshold expression as every sampler here, so the result is
    * engine- and partitioning-reproducible. The realized group sizes are
    * binomial around the target (hash sampling, not exact-k); exact-k
    * would need a per-group rank — a window the balance use-case doesn't
    * require. */
  def balancedSample(df: DataFrame, keyCol: String, groupCol: String,
                     salt: String = "mix"): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val target = counts.agg(min("_n")).collect()(0).getLong(0)
    df.join(broadcast(counts), groupCol)
      .filter(hashBucket(col(keyCol), salt) <
                (lit(target) * BUCKETS) / col("_n"))
      .drop("_n")
  }

  /** Temperature-flattened mixture sampling (Conneau & Lample 2019 /
    * XLM-R, mC4 — the multilingual-corpus standard): per-group sampling
    * probabilities q_i ∝ p_i^alpha flatten a skewed source/language
    * mixture (alpha < 1 boosts tail groups; alpha = 1 is proportional,
    * alpha → 0 approaches uniform). The realized frame keeps each row
    * with probability min(1, q_i·N/n_i) — groups whose flattened share
    * exceeds their natural share saturate at keep-all (upsampling beyond
    * 1× is a trainer-side repeat, not a sampler's job).
    *
    * Membership is the same pure hash-threshold expression as every
    * sampler here (engine/partitioning-reproducible); the per-group
    * thresholds need two scalars (Σ n^alpha, N) — one tiny groupBy
    * collected to the driver, the group-count frame broadcast back.
    * Thresholds are FLOORED to integer ppm on both engines (cast-to-
    * bigint ROUNDS in some engines — floor is the portable choice).
    * A NULL group is a group like any other (the threshold join is
    * null-safe): unlabeled docs participate in the mixture instead of
    * silently vanishing. */
  def temperatureSample(df: DataFrame, keyCol: String, groupCol: String,
                        alpha: Double = 0.5,
                        salt: String = "temp"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .withColumnRenamed(groupCol, "_g")
    val row = counts.agg(sum(pow(col("_n"), alpha)).as("z"),
                         sum("_n").as("nn")).collect()(0)
    if (row.isNullAt(0)) return df.limit(0) // empty corpus: nothing to keep
    val (z, nn) = (row.getDouble(0), row.getLong(1))
    val thresh = floor(least(lit(1.0),
      pow(col("_n"), alpha) / z * nn / col("_n")) * BUCKETS)
    df.join(broadcast(counts), df(groupCol) <=> counts("_g"))
      .filter(hashBucket(col(keyCol), salt) < thresh)
      .drop("_g", "_n")
  }

  /** DSIR-style hashed-feature importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling", public
    * paper): score every document by how target-domain-like it is,
    *
    *   log w(doc) = Σ_buckets count_doc(b) · ln( p_target(b) / p_raw(b) )
    *
    * where tokens hash into `buckets` features (the portable md5 family,
    * so the oracle replays the bucketing) and both distributions are
    * add-one-smoothed bucket unigram models — target over the rows
    * matching `targetPred`, raw over the whole corpus. High-weight docs
    * are the ones importance resampling keeps (pair with
    * [[weightedSample]] after squashing logw to [0,1]).
    *
    * Plan shape: ONE exploded (id, bucket) count frame feeds both
    * histograms and the scoring join; the histograms are at most
    * `buckets` rows — broadcast, never shuffled — and the per-doc sum is
    * one hash aggregate. At 100 TB: corpus scans once, shuffles once on
    * (id, bucket), once on id; the constant-size histograms are the only
    * driver state. Returns (id, n_tokens, logw), logw rounded 6 dp. */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
                     targetPred: Column, buckets: Int = 1024,
                     salt: String = "dsir"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = pmod(graft.functions.PortableHash.md5Prefix60(
      concat(lit(salt), lit("|"), col("t"))), lit(buckets.toLong))
    // Materialized: consumed three times (raw hist, target hist, scoring).
    val docBucket = docs
      .select(col(idCol).as("id"), targetPred.as("tgt"),
              explode(TextOps.tokens(col(textCol))).as("t"))
      .select(col("id"), col("tgt"), b.as("b"))
      .groupBy("id", "tgt", "b").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val rawHist = docBucket.groupBy("b").agg(sum("c").as("cr"))
    val tgtHist = docBucket.filter(col("tgt")).groupBy("b")
      .agg(sum("c").as("ct"))
    val totals = docBucket.agg(
      sum("c").as("nr"), sum(when(col("tgt"), col("c")).otherwise(0L)).as("nt"))
      .collect()(0)
    if (totals.isNullAt(0)) // empty/all-empty corpus: no tokens, no rows
      return docBucket.select(col("id"), lit(0L).as("n_tokens"),
                              lit(0.0).as("logw")).limit(0)
    val (nr, nt) = (totals.getLong(0), totals.getLong(1))
    // ln p_tgt(b) − ln p_raw(b), add-one smoothed; buckets absent from a
    // histogram still get their +1 mass via the coalesce.
    val logRatio =
      log((coalesce(col("ct"), lit(0L)) + 1.0) / (nt + buckets).toDouble) -
      log((coalesce(col("cr"), lit(0L)) + 1.0) / (nr + buckets).toDouble)
    docBucket
      .join(broadcast(rawHist), Seq("b"), "left")
      .join(broadcast(tgtHist), Seq("b"), "left")
      .groupBy("id")
      .agg(sum("c").as("n_tokens"),
           round(sum(col("c") * logRatio), 6).as("logw"))
  }

  /** DuckDB rendering of the [[dsirLogWeights]] bucket for oracle SQL. */
  def dsirBucketSql(tokExpr: String, buckets: Int, salt: String): String =
    s"(${graft.functions.PortableHash.md5Prefix60Sql(
      s"'$salt' || '|' || $tokExpr")} % $buckets)"

  /** Deterministic train/validation/test (or any n-way) split: appends a
    * `split` column chosen by cumulative weight over the hash bucket.
    * Weights need not sum to 1 — they are normalized. */
  def assignSplits(df: DataFrame, keyCol: String,
                   splits: Seq[(String, Double)],
                   salt: String = "split"): DataFrame = {
    val total = splits.map(_._2).sum
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
    val b = hashBucket(col(keyCol), salt)
    val expr = splits.zip(cum.sliding(2).toSeq).foldLeft(lit(null): Column) {
      case (acc, ((name, _), Seq(_, hi))) =>
        when(b < (hi * BUCKETS).toLong, coalesce(acc, lit(name))).otherwise(acc)
    }
    // coalesce guards the last bucket against float rounding of cum weights
    df.withColumn("split", coalesce(expr, lit(splits.last._1)))
  }
}
