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
      val next = propagate(edges, frontier)
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint(true)
      if (next.isEmpty) done = true
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
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        levelFrames += next.select(col("id"), lit(lv).as("level"))
        visited = visited.unionAll(next)
        frontier = next
      }
    }
    levelFrames.reduce(_ unionAll _)
  }
}
