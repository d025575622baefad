package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.exec.{GraphOps, GraphXOps}

/** GraphX/Pregel path agrees with the relational GraphOps twin. */
class GraphXSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val edges = Seq((0L, 0L, 1L), (1L, 0L, 2L), (2L, 0L, 3L), (0L, 2L, 2L),
                  (7L, 0L, 8L))
    .toDF("src", "rel", "dst")

  test("Pregel BFS levels match relational bfsLevels") {
    val pregel = GraphXOps.bfs(edges, Set(0L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seeds = Seq(Tuple1(0L)).toDF("id")
    val rel = GraphOps.bfsLevels(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(pregel == rel)
    assert(pregel == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("connected components split the two islands") {
    val cc = GraphXOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet.size == 2)
    assert(cc(0L) == cc(3L) && cc(7L) == cc(8L) && cc(0L) != cc(7L))
  }

  test("pageRank produces positive ranks for all vertices") {
    val pr = GraphXOps.pageRank(edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 6 && pr.values.forall(_ > 0))
    assert(pr(3L) > pr(1L)) // sink of the longer chain accumulates rank
  }
}
