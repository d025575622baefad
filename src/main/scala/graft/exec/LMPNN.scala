package graft.exec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.score._

/** LMPNN — logical message passing over batched query graphs
  * (SURVEY §3.3; knovex/reasoner/lmpnn.py:21-216), inference only.
  *
  * State is one long-form DataFrame `(qid, node, vec)` — the whole batch of
  * query instances advances in each superstep (the qid column is the Spark
  * replacement for PyG batching, SURVEY §1.1). Per round:
  *
  *   - G4 message: per (augmented) query edge, the relation-transformed
  *     source state with negation coefficient `1 − 2·neg`
  *     (lmpnn.py:44-53,77-86);
  *   - A4/G5 aggregate: element-wise vector sum of incoming messages per
  *     node, plus residual `0.1 · x` (lmpnn.py:25,55-61,88-94) — a pluggable
  *     update net can be applied on top;
  *   - G6 fixpoint: `T = max(num_vars)` rounds; each query reads its free
  *     variable's state at layer `num_vars − 1` (lmpnn.py:144-189).
  *
  * Scale design: each superstep is one join (edges × states, both keyed by
  * (qid, node)) plus one vector-sum aggregate; lineage is truncated by
  * localCheckpoint every few rounds (SURVEY §7.5 iterative-loop note).
  */
object LMPNN {

  /** Initial node states: constants get their entity embedding; existential
    * and free variables share one learned vector (the reference points both
    * at the same tensor, lmpnn.py:117-118,148-152). */
  def initStates(qnodes: DataFrame, ents: DataFrame, dim: Int,
                 varSeed: Double = 0.5): DataFrame = {
    val varVec = Embeddings.deterministicVec(lit(-1L), dim, varSeed)
    qnodes.join(ents, qnodes("entity") === ents("id"), "left")
      .select(col("qid"), col("node"),
              when(col("kind") === 0, col("vec")).otherwise(varVec).as("vec"))
  }

  /** One message-passing superstep. `qedges` must already contain inverse
    * edges (QueryGraph.addInverseEdges) so information flows both ways.
    * Update nets (G5): `useMlp` applies the seeded ReLU MLP
    * (layers/mlp.py:3-18); `biasNet = Some(ents)` applies the bias-only
    * entity-projection net (reasoner/lmpnn.py:21-42) instead. */
  def superstep(states: DataFrame, qedges: DataFrame, rels: DataFrame,
                model: KGEModel, residual: Double = 0.1,
                useMlp: Boolean = false, dim: Int = 8,
                biasNet: Option[DataFrame] = None,
                biasScale: Double = 0.05, biasBias: Double = 0.01): DataFrame = {
    val msgs = qedges.as("e")
      .join(states.as("x"),
            col("e.qid") === col("x.qid") && col("e.src") === col("x.node"))
      .join(broadcast(rels.select(col("id").as("_rid"), col("vec").as("_rvec"))),
            col("e.rel") === col("_rid"))
      .select(col("e.qid").as("qid"), col("e.dst").as("node"),
              VectorOps.scaleVec(
                model.estimateTail(col("x.vec"), col("_rvec")),
                when(col("e.neg"), lit(-1.0)).otherwise(lit(1.0))).as("mvec"))
    val aggr = VectorOps.vecSumByKey(msgs, Seq("qid", "node"), "mvec", "avec")
    val combined = states.as("x")
      .join(aggr.as("m"), Seq("qid", "node"), "left")
      .select(col("qid"), col("node"),
              when(col("m.avec").isNull,
                   VectorOps.scaleVec(col("x.vec"), lit(residual)))
                .otherwise(VectorOps.addVec(
                   VectorOps.scaleVec(col("x.vec"), lit(residual)),
                   col("m.avec"))).as("vec"))
    if (useMlp)
      combined.withColumn("vec", mlpUpdate(col("vec"), dim))
    else biasNet match {
      case Some(ents) => biasOnlyUpdate(combined, ents, biasScale, biasBias)
      case None => combined
    }
  }

  /** Bias-only update net (G5 second variant, `LMPLayerBiasOnly.update_net`,
    * reasoner/lmpnn.py:21-42): `out = relu((x·Eᵀ)·scale + bias)·E` over the
    * entity embedding matrix E — the state is projected onto every entity,
    * affine-transformed and rectified, and read back out as the score-
    * weighted sum of entity embeddings. `scale`/`bias` are the layer's two
    * learned scalars — pinned constants here (inference with fixed weights,
    * the same convention as [[mlpUpdate]]'s seeded matrix).
    *
    * Relational form: the x·Eᵀ projection is the SAME crossJoin shape as
    * the final cosine scoring in [[answer]] (states are a handful of rows
    * per query batch; Spark broadcasts the small side of the
    * nested-loop join), and the ·E read-back is one score-weighted
    * [[VectorOps.vecSumByKey]] — long-form, no whole-matrix shuffle, so
    * the plan survives an entity table too large to collect. */
  def biasOnlyUpdate(states: DataFrame, ents: DataFrame,
                     scale: Double = 0.05, bias: Double = 0.01): DataFrame = {
    val scored = states.crossJoin(
        ents.select(col("id").as("_e"), col("vec").as("_evec")))
      .select(col("qid"), col("node"),
              VectorOps.scaleVec(col("_evec"),
                greatest(lit(0.0),
                  VectorOps.dot(col("vec"), col("_evec")) * scale + bias))
                .as("_sv"))
    VectorOps.vecSumByKey(scored, Seq("qid", "node"), "_sv", "vec")
  }

  /** Update net (G5): one ReLU layer with a deterministic weight matrix
    * W[dim, dim] (the reference's learned MLP, layers/mlp.py:3-18, with
    * fixed seeded weights for inference reproducibility).
    * out[j] = relu(Σ_i v[i] · w(i,j)). */
  def mlpUpdate(vec: Column, dim: Int, seed: Double = 2.2): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      greatest(lit(0.0),
        aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0), (acc, i) =>
          acc + element_at(vec, i + 1) *
            sin((i * dim + j + 1).cast("double") * 0.013 + seed))))

  /** Run T supersteps and score every entity against each query's free-node
    * state by cosine similarity (lmpnn.py:191-216).
    *
    * Each query reads its free variable at *its own* layer `num_vars − 1`
    * (lmpnn.py:175-185): the state after `num_vars` supersteps, where
    * num_vars counts the query's variable (non-constant) nodes. Batches may
    * therefore mix query shapes with different variable counts — each qid is
    * gathered at the right round instead of all sharing the final one.
    * Queries with num_vars > rounds fall back to the last computed state.
    *
    * Returns `(qid, entity, score)`. */
  def answer(qnodes: DataFrame, qedges: DataFrame, ents: DataFrame,
             rels: DataFrame, model: KGEModel, rounds: Int,
             useMlp: Boolean = false, useBiasNet: Boolean = false): DataFrame = {
    require(rounds >= 1, s"LMPNN needs at least one superstep, got $rounds")
    val dim = 8 // states carry their own width; dim only seeds var vectors
    var x = initStates(qnodes, ents, dim)
    val edgesAug = graft.lang.QueryGraph.addInverseEdges(qedges)
    // (qid, node, _nv): the free node of each query + its variable count.
    val freeNodes = qnodes.filter(col("kind") === 2)
      .select(col("qid"), col("node"))
      .join(qnodes.filter(col("kind") =!= 0).groupBy("qid")
              .agg(countDistinct("node").cast("int").as("_nv")), "qid")
      .localCheckpoint(true) // tiny; read once per round
    val gathered = scala.collection.mutable.ListBuffer.empty[DataFrame]
    (1 to rounds).foreach { i =>
      x = superstep(x, edgesAug, rels, model, useMlp = useMlp, dim = dim,
                    biasNet = if (useBiasNet) Some(ents) else None)
      if (i % 3 == 0) x = x.localCheckpoint(true) // truncate lineage (G6)
      // After round i the stacked-layer index i-1 is current: gather queries
      // whose num_vars == i (plus, at the last round, any deeper stragglers).
      val due =
        if (i < rounds) freeNodes.filter(col("_nv") === i)
        else freeNodes.filter(col("_nv") >= i)
      gathered += x.join(due, Seq("qid", "node"))
        .select(col("qid"), col("vec").as("fvec"))
    }
    val freeStates = gathered.reduce(_ unionAll _)
    freeStates.crossJoin(ents.select(col("id").as("entity"), col("vec")))
      .select(col("qid"), col("entity"),
              VectorOps.cosine(col("fvec"), col("vec")).as("score"))
  }
}
