package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One SGD step of TransE training as pure DataFrame algebra — the inner
  * body of the reference's training loop (margin ranking loss over
  * corrupted triples; transe.py + the T1-T3 loss surfaces), closing the
  * declared scope gap relationally: an epoch at 100 TB is exactly this
  * plan — embedding-table equi-joins, a per-dimension posexplode, and one
  * map-side-combinable scatter-add (the A1 shape) per parameter table.
  *
  * Determinism contract (what makes the step ORACLE-CHECKABLE, which no
  * stochastic trainer is):
  *  - negatives are the cyclic next entity in id order, not a sample;
  *  - the norm is L1, so every gradient component is a SIGN (±1/0) and
  *    every accumulated update is an integer multiple of lr;
  *  - lr defaults to 2⁻⁵, so those multiples are exactly representable
  *    doubles: the scatter-add is order-independent and DuckDB reproduces
  *    the updated embeddings bit-for-bit (the only float-route exposure
  *    left is the 8-term hinge sum deciding margin violations).
  *
  * Margin loss per edge (h, r, t) with corrupted tail t′:
  *   L = max(0, γ + ‖h+r−t‖₁ − ‖h+r−t′‖₁)
  * Active-hinge gradients: ∂h = ∂r = s − s′, ∂t = −s, ∂t′ = +s′, where
  * s_i = sgn(h_i+r_i−t_i), s′_i = sgn(h_i+r_i−t′_i).
  *
  * The global entity index (cyclic corruption) is one small sorted window
  * over the DISTINCT entity ids — at cluster scale the precomputed
  * dictionary (Ranking.globalIndex / KGIndex) supplies it instead.
  *
  * Returns long-form updated parameters: (kind 'ent'|'rel', id, pos, x),
  * x rounded 6 dp. */
object Training {

  def transeSgdStep(entities: DataFrame, edges: DataFrame, dim: Int,
                    entSeed: Double, relSeed: Double,
                    gamma: Double = 1.0, lr: Double = 0.03125): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val ents = entities.select(col("id").cast("long").as("id")).distinct()
      .localCheckpoint(true) // index + base-embedding consumers
    val n = ents.count()
    val idx = ents.withColumn("i", row_number().over(Window.orderBy("id")))
    val nextMap = idx.as("a")
      .join(idx.as("b"), col("a.i") % n + 1 === col("b.i"))
      .select(col("a.id").as("dst"), col("b.id").as("neg"))

    // Vectors projected as attributes BEFORE any lambda consumes them
    // (the shinglesOf perf contract applies to these HOFs too).
    val withVecs = edges
      .select(col("src").cast("long").as("src"),
              col("rel").cast("long").as("rel"),
              col("dst").cast("long").as("dst"))
      .join(broadcast(nextMap), "dst")
      .withColumn("hv", Embeddings.deterministicVec(col("src"), dim, entSeed))
      .withColumn("rv", Embeddings.deterministicVec(col("rel"), dim, relSeed))
      .withColumn("tv", Embeddings.deterministicVec(col("dst"), dim, entSeed))
      .withColumn("nv", Embeddings.deterministicVec(col("neg"), dim, entSeed))
    def l1(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      aggregate(
        zip_with(col("hv"), zip_with(col("rv"), t, (r, x) => r - x),
                 (h, d) => h + d),
        lit(0.0), (acc, v) => acc + abs(v))
    val viol = withVecs
      .filter(lit(gamma) + l1(col("tv")) - l1(col("nv")) > 0)

    val dims = viol.select(col("src"), col("rel"), col("dst"), col("neg"),
        posexplode(arrays_zip(col("hv"), col("rv"), col("tv"), col("nv")))
          .as(Seq("pos", "z")))
      .select(col("src"), col("rel"), col("dst"), col("neg"), col("pos"),
              signum(col("z.hv") + col("z.rv") - col("z.tv")).as("s"),
              signum(col("z.hv") + col("z.rv") - col("z.nv")).as("sp"))
    val contrib = dims
      .select(lit("ent").as("kind"), col("src").as("id"), col("pos"),
              (col("s") - col("sp")).as("g"))
      .unionAll(dims.select(lit("ent").as("kind"), col("dst").as("id"),
                            col("pos"), (-col("s")).as("g")))
      .unionAll(dims.select(lit("ent").as("kind"), col("neg").as("id"),
                            col("pos"), col("sp").as("g")))
      .unionAll(dims.select(lit("rel").as("kind"), col("rel").as("id"),
                            col("pos"), (col("s") - col("sp")).as("g")))
    val grads = contrib.groupBy("kind", "id", "pos").agg(sum("g").as("g"))

    val rels = edges.select(col("rel").cast("long").as("id")).distinct()
    def base(ids: DataFrame, kind: String, seed: Double): DataFrame =
      ids.select(lit(kind).as("kind"), col("id"),
        posexplode(Embeddings.deterministicVec(col("id"), dim, seed))
          .as(Seq("pos", "x0")))
    base(ents, "ent", entSeed).unionAll(base(rels, "rel", relSeed))
      .join(grads, Seq("kind", "id", "pos"), "left")
      .select(col("kind"), col("id"), col("pos").cast("long").as("pos"),
              round(col("x0") - coalesce(col("g"), lit(0.0)) * lr, 6).as("x"))
  }
}
