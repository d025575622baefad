package graft.exec

import org.apache.spark.graphx.{Edge, EdgeTriplet, Graph, VertexId, Pregel, EdgeDirection}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** GraphX/Pregel path for iterative whole-graph analytics (the
  * BASELINE.json north-star approach for analytics): superstep looping
  * beats unrolled DataFrame joins when the iteration count is data-dependent
  * and frontiers stay sparse (SURVEY §7.1 reserves GraphX for exactly the
  * BFS-layers / fixpoint cases G2/G6).
  *
  * The relational twins live in [[GraphOps]]; both operate on the same
  * `edges(src, rel, dst)` DataFrame. RDD boundary is one narrow map. */
object GraphXOps {

  def toGraph(edges: DataFrame): Graph[Long, Long] = {
    val edgeRdd = edges.select(col("src"), col("dst"), col("rel")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getLong(2)))
    Graph.fromEdges(edgeRdd, defaultValue = 0L,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  /** Pregel BFS: minimum hop distance from the seed set (G2 as a Pregel
    * fixpoint; the message is the candidate level, merged by min). */
  def bfs(edges: DataFrame, seeds: Set[VertexId], maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = toGraph(edges).mapVertices { (id, _) =>
      if (seeds.contains(id)) 0L else Long.MaxValue
    }
    val out = Pregel(g, Long.MaxValue, maxIterations = maxIter,
                     activeDirection = EdgeDirection.Out)(
      vprog = (_, attr, msg) => math.min(attr, msg),
      sendMsg = (t: EdgeTriplet[Long, Long]) =>
        if (t.srcAttr != Long.MaxValue && t.srcAttr + 1 < t.dstAttr)
          Iterator((t.dstId, t.srcAttr + 1))
        else Iterator.empty,
      mergeMsg = math.min)
    out.vertices.filter(_._2 != Long.MaxValue).toDF("id", "level")
  }

  /** Connected components (undirected reachability classes) — a capability
    * the relational path would need many self-joins for. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    toGraph(edges).connectedComponents().vertices.toDF("id", "component")
  }

  /** PageRank over the KG (entity centrality — a natural add-on analytic). */
  def pageRank(edges: DataFrame, tol: Double = 0.001): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    toGraph(edges).pageRank(tol).vertices.toDF("id", "rank")
  }
}
