package graft.metric

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ranking + retrieval metrics (SURVEY §2.5/O3-O5, §2.4/A6;
  * knovex/utils/metric.py:69-123).
  *
  * All long-form: `(qid, entity, score)` in, ranks out — the reference's
  * dense `[batch, num_entities]` matrices and NaN padding (cqd.py:420-431)
  * are unnecessary in relational form (SURVEY §7.5).
  */
object Ranking {

  /** O3 full ranking: rank(entity) = 0-based position by descending score
    * (double-argsort in the reference, metric.py:77-78). Deterministic
    * tie-break on entity id. */
  def rankAll(scores: DataFrame): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("entity").asc)
    scores.withColumn("rank", row_number().over(w) - 1)
  }

  /** O4 filtered ranking (metric.py:97-109): for each hard answer, subtract
    * the count of strictly-better-ranked easy answers and strictly-better-
    * ranked hard answers. `answers(qid, entity, is_hard)`.
    *
    * One window pass over the (hard ∪ easy) answer rows sorted by rank:
    * both "strictly better" counts are running sums over the preceding
    * frame (ranks are distinct within a qid, so rows-preceding ==
    * strictly-better). The naive formulation — a per-qid theta join
    * `easy.rank < hard.rank` — is O(|hard|·|easy|) per query and was the
    * bottleneck of the end-to-end workload eval; this is O(n log n). */
  def filteredRanks(ranks: DataFrame, answers: DataFrame): DataFrame = {
    val marked = ranks.join(answers, Seq("qid", "entity"))
      .select(col("qid"), col("entity"), col("rank"), col("is_hard"))
    val prev = Window.partitionBy("qid").orderBy(col("rank").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    marked
      .withColumn("n_easy_better",
        coalesce(sum(when(!col("is_hard"), 1L).otherwise(0L)).over(prev), lit(0L)))
      .withColumn("n_hard_better",
        coalesce(sum(when(col("is_hard"), 1L).otherwise(0L)).over(prev), lit(0L)))
      .filter(col("is_hard"))
      .withColumn("filtered_rank",
                  col("rank") - col("n_easy_better") - col("n_hard_better"))
      .select(col("qid"), col("entity"), col("rank"), col("filtered_rank"))
  }

  /** O5 MRR / Hits@k on filtered ranks: MRR = mean 1/(1+rank);
    * Hits@k = rate of rank < k (metric.py:113-121). */
  def mrrHits(filtered: DataFrame, groupCol: String = "qid"): DataFrame =
    filtered.groupBy(col(groupCol)).agg(
      avg(lit(1.0) / (col("filtered_rank") + 1)).as("mrr"),
      avg((col("filtered_rank") < 1).cast("double")).as("hits1"),
      avg((col("filtered_rank") < 3).cast("double")).as("hits3"),
      avg((col("filtered_rank") < 10).cast("double")).as("hits10"))

  /** A6 metric averaging over query-type buckets (metric.py:113-121). */
  def averageByType(perQuery: DataFrame, typeCol: String): DataFrame =
    perQuery.groupBy(col(typeCol)).agg(
      avg("mrr").as("mrr"), avg("hits1").as("hits1"),
      avg("hits3").as("hits3"), avg("hits10").as("hits10"))
}
