package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.exec.HardExec
import graft.lang.Parser
import graft.lang.Binding.Binding
import graft.metric.Ranking
import graft.model.{KG, KGIndex}

/** End-to-end reference-style workload evaluation (SURVEY §3 lifecycle):
  * a train/full KG split defines easy (train-derivable) vs hard (held-out)
  * answers per query type — the standard KGE benchmark construction
  * (BetaE/EFO-1 suites) — then the engine answers each query on the train
  * KG, ranks the entity universe, and reports filtered MRR/Hits per type
  * (metric.py:69-123 semantics).
  *
  * Everything is a single lazy plan: per-type frames are unioned with a
  * `qtype` discriminator and one action computes all metrics (no per-type
  * driver loop at execution time).
  */
object Workload {

  /** Deterministic 90% train split, consistent across inverse pairs: the
    * canonical (even-relation) form of each edge decides membership for
    * both directions. */
  def trainEdges(edges: DataFrame, keepMod: Int = 10): DataFrame = {
    val canonSrc = when(col("rel") % 2 === 0, col("src")).otherwise(col("dst"))
    val canonDst = when(col("rel") % 2 === 0, col("dst")).otherwise(col("src"))
    val canonRel = col("rel").bitwiseAND(lit(~1L))
    edges.filter(pmod(xxhash64(canonSrc, canonRel, canonDst), lit(keepMod)) =!= 0)
  }

  /** Filtered-metric evaluation of `types` (name, lstr, binding) over the
    * train/full split. Score model: symbolic train-KG membership (1/0) —
    * the hard-logic baseline every KGE model is compared against.
    * Returns (qtype, mrr, hits1, hits3, hits10, n_hard). */
  def evaluate(spark: SparkSession, dir: String,
               types: Seq[(String, String, Binding)]): DataFrame = {
    val full = KG.edges(spark, dir)
    // Only the relations the workload touches need the train split
    // materialized (both directions of each used pair).
    val usedRels = types
      .flatMap { case (_, _, b) =>
        b.collect { case (name, id) if name.startsWith("r") => id }
      }
      .flatMap(r => Seq(r, r ^ 1L)).toSet.toSeq
    val train = trainEdges(full.filter(col("rel").isin(usedRels: _*)))
      .localCheckpoint(true)
    val universe = KGIndex.derivedEntityDict(spark, dir)
      .select(col("id").as("entity"))

    val perType = types.map { case (name, lstr, b) =>
      val f = Parser.parse(lstr)
      val easy = HardExec.evalFormula(train, f, b)
        .select(col("f").as("entity"))
      val fullAns = HardExec.evalFormula(full, f, b)
        .select(col("f").as("entity"))
      val hard = fullAns.join(easy, Seq("entity"), "left_anti")
      val answers = easy.withColumn("is_hard", lit(false))
        .unionAll(hard.withColumn("is_hard", lit(true)))
        .withColumn("qid", lit(name))
      val scores = universe
        .join(easy.withColumn("_easy", lit(1.0)), Seq("entity"), "left")
        .select(lit(name).as("qid"), col("entity"),
                coalesce(col("_easy"), lit(0.0)).as("score"))
      (scores, answers.select("qid", "entity", "is_hard"))
    }

    val scores = perType.map(_._1).reduce(_ unionAll _)
    val answers = perType.map(_._2).reduce(_ unionAll _)
    val filtered = Ranking.filteredRanks(Ranking.rankAll(scores), answers)
    Ranking.mrrHits(filtered)
      .join(answers.filter(col("is_hard")).groupBy("qid")
              .agg(count(lit(1)).as("n_hard")), "qid")
      .select(col("qid").as("qtype"), round(col("mrr"), 6).as("mrr"),
              round(col("hits1"), 6).as("hits1"),
              round(col("hits3"), 6).as("hits3"),
              round(col("hits10"), 6).as("hits10"), col("n_hard"))
  }
}
