package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-traversal operators (SURVEY §2.7 G1-G3) as iterative DataFrame
  * loops — the Pregel-style superstep pattern with driver-controlled
  * iteration, checkpointed to truncate lineage (SURVEY §7.5).
  *
  * The reference operates on dense boolean masks
  * (pyg_graph_functionals.py:27-117); the relational form keeps frontiers as
  * id sets, which is the sparse (and 100 TB-scalable) encoding: each hop is
  * one equi-join on `src` + distinct, shuffling only the frontier.
  */
object GraphOps {

  /** G1: one-hop frontier push src -> dst (mask_propagate,
    * pyg_graph_functionals.py:27-56). `reverse` walks dst -> src. */
  def propagate(edges: DataFrame, frontier: DataFrame,
                reverse: Boolean = false): DataFrame = {
    val (from, to) = if (reverse) ("dst", "src") else ("src", "dst")
    edges.join(frontier.select(col("id").as(from)), Seq(from), "left_semi")
      .select(col(to).as("id")).distinct()
  }

  /** G2: BFS layers with a visited set (bfs_layers,
    * pyg_graph_functionals.py:59-82). Returns (id, level), level 0 = seeds.
    * Driver loop; frontiers localCheckpoint every iteration (they shrink).
    * maxLevels bounds runaway graphs. */
  def bfsLevels(edges: DataFrame, seeds: DataFrame, maxLevels: Int = 20): DataFrame = {
    // Only per-level frontiers are checkpointed; the visited set is a union
    // *view* over already-materialized frontiers (re-checkpointing the
    // accumulated union each level would copy O(levels²) data).
    var frontier = seeds.select("id").distinct().localCheckpoint(true)
    val levelFrames = scala.collection.mutable.ListBuffer(
      frontier.select(col("id"), lit(0).as("level")))
    var visited = frontier
    var lv = 0
    var done = false
    while (!done && lv < maxLevels) {
      lv += 1
      // LAZY checkpoint + count: the count is the action that materializes
      // the frontier AND answers the emptiness probe — one job per level
      // instead of the eager-checkpoint-then-isEmpty pair (§2.4 / the
      // minLabelComponents carried-flag discipline).
      val next = propagate(edges, frontier)
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint(false)
      if (next.count() == 0) done = true
      else {
        levelFrames += next.select(col("id"), lit(lv).as("level"))
        visited = visited.unionAll(next)
        frontier = next
      }
    }
    levelFrames.reduce(_ unionAll _)
  }

  /** G3: Kahn-style topological levels of a DAG from its sources
    * (topological_ordering, pyg_graph_functionals.py:85-117). Relational
    * Kahn: repeatedly peel nodes whose remaining in-degree is zero. */
  def topologicalLevels(edges: DataFrame, maxLevels: Int = 100): DataFrame = {
    val nodes = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id"))).distinct()
    var remaining = edges.select("src", "dst").localCheckpoint(true)
    var frontier = nodes.join(remaining.select(col("dst").as("id")).distinct(),
        Seq("id"), "left_anti").localCheckpoint(true)
    val levelFrames = scala.collection.mutable.ListBuffer(
      frontier.select(col("id"), lit(0).as("level")))
    var visited = frontier
    var lv = 0
    var done = false
    while (!done && lv < maxLevels) {
      lv += 1
      remaining = remaining
        .join(frontier.select(col("id").as("src")), Seq("src"), "left_anti")
        .localCheckpoint(true)
      val next = nodes
        .join(visited, Seq("id"), "left_anti")
        .join(remaining.select(col("dst").as("id")).distinct(),
              Seq("id"), "left_anti")
        .localCheckpoint(false) // materialized by the count — one job
      if (next.count() == 0) done = true
      else {
        levelFrames += next.select(col("id"), lit(lv).as("level"))
        visited = visited.unionAll(next)
        frontier = next
      }
    }
    levelFrames.reduce(_ unionAll _)
  }

  /** Fixed-iteration PageRank as a relational superstep loop:
    * rank' = (1 − d) + d · Σ_{in-edges} rank(src) / outdeg(src), rank₀ = 1.
    * Dangling nodes keep the (1 − d) floor. The fixed iteration count (vs
    * GraphX's tol-based dynamic convergence in GraphXOps.pageRank) makes the
    * result a pure function of the graph — unroll-able as SQL CTEs for the
    * oracle.
    *
    * Lineage is truncated every `checkpointEvery` supersteps rather than
    * every superstep: an eager localCheckpoint materializes the whole rank
    * vector and cuts the DAG into separate jobs, so for shallow runs
    * (iters below the period) the entire loop now compiles into ONE
    * multi-stage job that AQE plans end-to-end — measured 10.2 s → per-step
    * checkpoint cost dominated the sf0.1 bench. Deep loops still truncate
    * periodically (plan growth is linear in steps since `nodes`/`linked`
    * are materialized once — the period only bounds plan size, not
    * correctness). `checkpointEvery` <= 0 means never truncate. */
  /** Triangle count via degree-ordered orientation — the node-iterator++
    * algorithm (Schank & Wagner 2005; the standard distributed variant,
    * e.g. Suri & Vassilvitskii 2011): orient every undirected edge from
    * its lower-(degree, id) endpoint to the higher one, join wedges at
    * the low endpoint, and close against the oriented edge set. Each
    * triangle is counted EXACTLY once (at its lowest-key corner), and the
    * wedge join is bounded by Σ outdeg² with outdeg ≤ O(√m) under this
    * orientation — the property that keeps hub nodes from exploding the
    * join at 100 TB (a raw id-ordered 3-join is Σ deg² on the hubs).
    * Input: any (src, dst) edge frame (direction/multiplicity ignored).
    * Output: one row (n_triangles). */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true) // degree frame + both orientation sides
    val deg = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    // Orient low-(deg, id) -> high-(deg, id); keep the head's key for the
    // wedge ordering below.
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
        when(lowFirst, col("a")).otherwise(col("b")).as("u"),
        when(lowFirst, col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint(true) // adjacency agg + both attach joins
    // Count per ORIENTED EDGE, not per wedge: each triangle u→v, u→w,
    // v→w is |N⁺(u) ∩ N⁺(v)| ∋ w, counted exactly once at edge (u, v).
    // The wedge formulation shuffled Σ outdeg² wedge rows through the
    // self-join AND the closing-edge semi join; here every exchange is
    // edge-sized (adjacency arrays ride along, each array ≤ O(√m) under
    // the orientation — the same bound that kept wedges from exploding).
    // Guide §2.3: aggregate (to adjacency sets) before the join, and
    // never materialize the wedge expansion at all. Edges whose head has
    // no out-neighbors contribute 0 and drop in the inner join.
    val adj = oriented.groupBy("u").agg(collect_list(col("v")).as("nu"))
    oriented
      .join(adj, Seq("u"))
      .join(adj.select(col("u").as("v"), col("nu").as("nv")), Seq("v"))
      .select(size(array_intersect(col("nu"), col("nv"))).as("t"))
      .agg(coalesce(sum(col("t")).cast("long"), lit(0L)).as("n_triangles"))
  }

  def pageRankFixed(edges: DataFrame, iters: Int,
                    damping: Double = 0.85,
                    checkpointEvery: Int = 8): DataFrame = {
    val nodes = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true) // joined every iteration; distinct once
    val outDeg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"))
    val linked = edges.join(outDeg, edges("src") === outDeg("id"))
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint(true) // read every iteration
    var rank = nodes.withColumn("rank", lit(1.0))
    (1 to iters).foreach { i =>
      val contrib = linked
        .join(rank.select(col("id").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("inflow"))
      rank = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
                (lit(1.0 - damping) +
                 lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        rank = rank.localCheckpoint(true)
    }
    rank
  }

  /** Connected components by relational min-label propagation: every node
    * starts labeled with its own id; each superstep takes the min over
    * neighbor labels (undirected closure) until fixpoint. The CONVERGED
    * state — min id per component — is schedule-independent, so it
    * cross-checks GraphX's `connectedComponents` (same contract) and a
    * recursive-CTE oracle exactly. O(diameter) supersteps, one
    * dst-keyed shuffle each; per-superstep localCheckpoint truncates
    * lineage (the BFS/pagerank loop discipline). Returns
    * (id, component). */
  def minLabelComponents(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true) // read every superstep
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbrMin = und
        .join(labels.select(col("id").as("dst"), col("label").as("nl")),
              Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nl")).as("nmin"))
      // Carry the changed flag THROUGH the checkpoint: the convergence
      // count is then a cheap scan of the already-materialized frame
      // instead of a second shuffled self-join per superstep (one fewer
      // join + exchange per iteration at any scale). LAZY checkpoint:
      // the filter-count below is the materializing action, so each
      // superstep is ONE job (eager ckpt + count was two).
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
                least(col("label"),
                      coalesce(col("nmin"), col("label"))).as("label"),
                (coalesce(col("nmin"), col("label")) < col("label"))
                  .as("_chg"))
        .localCheckpoint(false)
      changed = next.filter(col("_chg")).count()
      labels = next.drop("_chg")
      it += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }

  /** Synchronous label propagation for community detection (Raghavan et
    * al. 2007, public paper), FIXED rounds for determinism (the
    * pagerank_fixed discipline): every round each node adopts its
    * neighbors' plurality label, ties broken toward the SMALLEST label —
    * arg-max via a single `max(struct(count, −label))` aggregate, so the
    * whole round is one dst-keyed join + two narrow aggregates, no
    * windows. Per-round localCheckpoint truncates lineage. The vertex
    * set defaults to edge endpoints; pass `vertices` (an `id` column)
    * to include isolated nodes — they keep their own label (no
    * neighbors ⇒ the left join never overwrites them). */
  def labelPropagationFixed(edges: DataFrame, rounds: Int,
                            vertices: Option[DataFrame] = None): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = und.select(col("src").as("id"))
      .unionAll(vertices.map(_.select(col("id")))
        .getOrElse(und.limit(0).select(col("src").as("id"))))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val votes = und
        .join(labels.select(col("id").as("dst"), col("label").as("nl")),
              Seq("dst"))
        .groupBy(col("src").as("id"), col("nl"))
        .agg(count(lit(1)).as("cnt"))
      val winner = votes.groupBy("id")
        .agg(max(struct(col("cnt"), (-col("nl")).as("negl"))).as("w"))
        .select(col("id"), (-col("w.negl")).as("wl"))
      labels = labels.join(winner, Seq("id"), "left")
        .select(col("id"), coalesce(col("wl"), col("label")).as("label"))
        .localCheckpoint(true)
      r += 1
    }
    labels.select(col("id"), col("label").as("community"))
  }
}
