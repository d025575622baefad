package graft.metric

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Training-loss surface (SURVEY §2.8 T1-T3) as relational aggregations —
  * inference-side evaluation only (the reference's training loop is out of
  * engine scope, matching its own division; SURVEY §7.2 step 6).
  *
  * Input: long-form logits `(qid, entity, score)` + positive labels.
  */
object Losses {

  /** T1: softmax cross-entropy over all entities per query
    * (utils/loss.py:5-16; duplicated lmpnn.py:275-288).
    * CE(q) = log Σ_e exp(s_e) − mean over positives of s_pos, computed with
    * the max-shift trick for stability. Returns (qid, loss). */
  def softmaxCE(scores: DataFrame, positives: DataFrame): DataFrame = {
    val stats = scores.groupBy("qid").agg(max("score").as("m"))
    val lse = scores.join(stats, "qid")
      .groupBy("qid", "m")
      .agg(sum(exp(col("score") - col("m"))).as("z"))
      .select(col("qid"), (log(col("z")) + col("m")).as("lse"))
    val pos = scores.join(positives.select("qid", "entity"), Seq("qid", "entity"))
      .groupBy("qid").agg(avg("score").as("pos_mean"))
    lse.join(pos, "qid")
      .select(col("qid"), (col("lse") - col("pos_mean")).as("loss"))
  }

  /** T2: InfoNCE with uniform negatives and temperature T
    * (lmpnn.py:218-273): -log( exp(s+/T) / (exp(s+/T) + Σ exp(s-/T)) ),
    * negatives = all non-positive entities. */
  def infoNCE(scores: DataFrame, positives: DataFrame,
              temperature: Double = 0.1): DataFrame = {
    val tagged = scores.join(
      positives.select(col("qid"), col("entity"), lit(true).as("is_pos")),
      Seq("qid", "entity"), "left")
      .withColumn("is_pos", coalesce(col("is_pos"), lit(false)))
      .withColumn("e", exp(col("score") / temperature))
    tagged.groupBy("qid").agg(
      sum(when(col("is_pos"), col("e")).otherwise(lit(0.0))).as("pos"),
      sum(col("e")).as("all"))
      .filter(col("pos") > 0) // loss undefined for queries with no positives
      .select(col("qid"), (-log(col("pos") / col("all"))).as("loss"))
  }

  /** T3: binary cross-entropy on the score matrix against 0/1 labels
    * (cqd.py:68-80), scores assumed already in (0,1). */
  def binaryCE(scores: DataFrame, positives: DataFrame): DataFrame = {
    val eps = 1e-12
    scores.join(
      positives.select(col("qid"), col("entity"), lit(1.0).as("y")),
      Seq("qid", "entity"), "left")
      .withColumn("y", coalesce(col("y"), lit(0.0)))
      .groupBy("qid")
      .agg((-avg(col("y") * log(col("score") + eps) +
                 (lit(1.0) - col("y")) * log(lit(1.0) - col("score") + eps)))
        .as("loss"))
  }
}
