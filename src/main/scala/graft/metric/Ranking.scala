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

  /** Global 0-based index of each id in ascending order — the shared
    * "position in the sorted entity universe" every qid's binary ranking
    * reads. Built with a range-partitioned sort + RDD zipWithIndex (NOT a
    * no-partition window, which would funnel the whole universe through one
    * partition at scale). One sort of the entity dictionary, reused across
    * all query types. See [[globalIndexPacked]] for the materialized
    * variant the training loops use. */
  def globalIndex(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).orderBy(col(idCol).asc)
      .rdd.map(_.getLong(0)).zipWithIndex()
      .toDF(idCol, "uidx")
  }

  /** [[globalIndex]] MATERIALIZED: the sorted frame is checkpointed once
    * and uidx is a pure projection on top (no RDD round-trip, no extra
    * per-consumer stage) — measured faster where the index is small
    * relative to its consumers and re-read several times (the training
    * loops' cyclic-corruption map joins it twice per query). The
    * RDD-zip form above stays for the single-consumer universe-ranking
    * path, where it measured faster than paying the checkpoint write.
    * Same rows as [[globalIndex]]. */
  def globalIndexPacked(df: DataFrame, idCol: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    // _mid = (partitionId << 33) + row-position, assigned AFTER the
    // partition-local sort (nondeterministic expressions are never pushed
    // below the sort), then frozen by the checkpoint so every consumer
    // branch reads the SAME (partition, position) assignment.
    val sorted = df.select(col(idCol).cast("long").as(idCol))
      .repartitionByRange(p, col(idCol).asc)
      .sortWithinPartitions(col(idCol).asc)
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val pid = shiftright(col("_mid"), 33)
    // Exclusive prefix of the per-partition counts, collected once: ≤ p
    // rows (a CONFIG constant, the k-sized-result collect class — never
    // data-sized), inlined as a literal so consumers pay a pure
    // projection — no extra aggregate, join, or broadcast stage per use.
    val cnts = sorted.groupBy(pid.as("_pid")).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val offsets: Seq[Long] =
      (0L until p).scanLeft(0L)((acc, i) => acc + cnts.getOrElse(i, 0L)).init
    sorted.select(col(idCol),
      (element_at(typedLit(offsets), (pid + 1).cast("int")) +
        col("_mid").bitwiseAND(lit((1L << 33) - 1))).as("uidx"))
  }

  /** 1-based global rank of each row of a SMALL frame — one already cut to
    * k rows by orderBy+limit (TakeOrdered) — under (`valCol` DESC, `tieCol`
    * ASC): a join-count, rank(r) = 1 + #{r′ strictly before r}, instead of
    * a no-partition window. Quadratic in the input and therefore reserved
    * for k-bounded frames; with it, main source has ZERO single-partition
    * WindowExec nodes (the global top-k pattern is TakeOrdered → this).
    * Rows must be unique in `tieCol` (true for any id/token key). */
  def rankTopK(df: DataFrame, valCol: String, tieCol: String): DataFrame = {
    // Materialize the k survivors ONCE: without this the self-join re-runs
    // the whole upstream scoring pipeline for BOTH join sides (measured 8×
    // on BM25 over sf0.1 — the TakeOrdered cut is the expensive part, the
    // k-row rank join is free).
    val small = df.localCheckpoint(true)
    val right = small.select(col(valCol).as("_v2"), col(tieCol).as("_t2"))
    small.join(right,
            col("_v2") > col(valCol) ||
              (col("_v2") === col(valCol) && col("_t2") < col(tieCol)),
            "left")
      .groupBy(small.columns.map(col): _*)
      .agg((count(col("_t2")) + 1).as("rank"))
  }

  /** [[filteredRanks]] specialized to BINARY membership scores (easy = 1,
    * everything else = 0) — the hard-logic workload case. With binary
    * scores the full ranking is closed-form: every easy answer outranks
    * every non-easy entity, and among non-easy entities rank order is id
    * order. For a hard answer h,
    *   filtered_rank(h) = idx_univ(h) − n_easy_lt(h) − n_hard_lt(h)
    * (counts over answers of the same qid with smaller id). So the
    * qid × universe cross join and the per-qid universe-wide sort of the
    * generic path collapse to ONE shared universe index
    * ([[globalIndex]]) plus a window over the (small) answers frame.
    * Output matches [[filteredRanks]] ∘ [[rankAll]] row-for-row on
    * membership scores (spec-checked; the DuckDB oracle keeps the generic
    * formulation). */
  def filteredRanksBinary(univIdx: DataFrame, answers: DataFrame): DataFrame = {
    // Inner join ⇒ answers outside the universe are excluded, exactly as the
    // generic path's `ranks ⋈ answers` does. GATED broadcast of the answers
    // side: size estimates on the checkpointed index otherwise flip the
    // planner into shuffling the UNIVERSE (observed: dropping the hint
    // turns this into two SortMergeJoins — the universe index, 1e9 rows at
    // scale, crossing an exchange), but an UNconditional hint bypasses
    // autoBroadcastJoinThreshold and for high-fanout/negation formulas an
    // answer set can approach universe size — the driver-OOM hazard ADVICE
    // r17 flagged. The count gate is cheap by contract: callers pass a
    // materialized (checkpointed) answers frame. ~24 B/row ⇒ 400k rows ≈
    // the default 10 MB broadcast threshold.
    val answersSmall = answers.count() <= 400000L
    val marked = (if (answersSmall) broadcast(answers) else answers)
      .join(univIdx, Seq("entity"))
    val prev = Window.partitionBy("qid").orderBy(col("entity").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    marked
      .withColumn("n_easy_lt",
        coalesce(sum(when(!col("is_hard"), 1L).otherwise(0L)).over(prev), lit(0L)))
      .withColumn("n_hard_lt",
        coalesce(sum(when(col("is_hard"), 1L).otherwise(0L)).over(prev), lit(0L)))
      .filter(col("is_hard"))
      .withColumn("filtered_rank",
        col("uidx") - col("n_easy_lt") - col("n_hard_lt"))
      .select(col("qid"), col("entity"), col("filtered_rank"))
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
