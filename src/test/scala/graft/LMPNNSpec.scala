package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.exec.LMPNN
import graft.lang.{Parser, Normalize, QueryGraph}
import graft.score.{Embeddings, TransE}

class LMPNNSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val dim = 8

  test("superstep: message = estimateTail(x_src, r) * (1-2neg); residual 0.1x") {
    // Graph: node0 -> node1, rel 0, positive. TransE: msg = x0 + r0.
    val states = Seq((0L, 0, Seq(1.0, 2.0)), (0L, 1, Seq(10.0, 20.0)))
      .toDF("qid", "node", "vec")
    val qedges = Seq((0L, 0, 1, 0L, false)).toDF("qid", "src", "dst", "rel", "neg")
    val rels = Seq((0L, Seq(0.5, 0.5))).toDF("id", "vec")
    val out = LMPNN.superstep(states, qedges, rels, TransE(2))
      .collect().map(r => r.getInt(1) -> r.getSeq[Double](2)).toMap
    assert(out(0) == Seq(0.1, 0.2)) // no incoming: 0.1 * x
    assert(out(1) == Seq(10 * 0.1 + 1.0 + 0.5, 20 * 0.1 + 2.0 + 0.5))
  }

  test("negated edge flips the message coefficient (lmpnn.py:49-51)") {
    val states = Seq((0L, 0, Seq(1.0)), (0L, 1, Seq(0.0)))
      .toDF("qid", "node", "vec")
    val qedges = Seq((0L, 0, 1, 0L, true)).toDF("qid", "src", "dst", "rel", "neg")
    val rels = Seq((0L, Seq(2.0))).toDF("id", "vec")
    val out = LMPNN.superstep(states, qedges, rels, TransE(2))
      .collect().map(r => r.getInt(1) -> r.getSeq[Double](2)).toMap
    assert(out(1) == Seq(-(1.0 + 2.0))) // -(x0 + r)
  }

  test("end-to-end 2p batch: deterministic long-form (qid, entity, score)") {
    val cq = Normalize.toDnf(Parser.parse("r1(s1,e1)&r2(e1,f)")).head
    val b1 = Map("r1" -> 0L, "r2" -> 2L, "s1" -> 4L)
    val b2 = Map("r1" -> 1L, "r2" -> 3L, "s1" -> 2L)
    val (qnodes, qedges) = QueryGraph.compile(spark, Seq((cq, b1), (cq, b2)))
    val ents = Embeddings.deterministic(spark.range(6).toDF("id"), "id", dim, 0.3)
    val rels = Embeddings.deterministic(spark.range(4).toDF("id"), "id", dim, 1.7)
    val out = LMPNN.answer(qnodes, qedges, ents, rels, TransE(2), rounds = 2)
    val rows = out.collect()
    assert(rows.length == 12) // 2 queries x 6 entities
    val again = LMPNN.answer(qnodes, qedges, ents, rels, TransE(2), rounds = 2)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
           again.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
    // scores are finite cosines in [-1, 1]
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("mixed-shape batch: each query gathered at its own layer num_vars-1") {
    // 2p (num_vars=2) batched with 3p (num_vars=3), run 3 rounds: the 2p
    // query must read its free state after round 2 — identical to answering
    // it alone with rounds=2 (lmpnn.py:175-185 per-query layer gather).
    val cq2p = Normalize.toDnf(Parser.parse("r1(s1,e1)&r2(e1,f)")).head
    val cq3p = Normalize.toDnf(Parser.parse("r1(s1,e1)&r2(e1,e2)&r3(e2,f)")).head
    val b2 = Map("r1" -> 0L, "r2" -> 2L, "s1" -> 4L)
    val b3 = Map("r1" -> 1L, "r2" -> 3L, "r3" -> 0L, "s1" -> 2L)
    val ents = Embeddings.deterministic(spark.range(6).toDF("id"), "id", dim, 0.3)
    val rels = Embeddings.deterministic(spark.range(4).toDF("id"), "id", dim, 1.7)

    val (qnM, qeM) = QueryGraph.compile(spark, Seq((cq2p, b2), (cq3p, b3)))
    val mixed = LMPNN.answer(qnM, qeM, ents, rels, TransE(2), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val (qnS, qeS) = QueryGraph.compile(spark, Seq((cq2p, b2)))
    val solo = LMPNN.answer(qnS, qeS, ents, rels, TransE(2), rounds = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap

    assert(mixed.count(_._1._1 == 0L) == 6 && mixed.count(_._1._1 == 1L) == 6)
    solo.foreach { case (ent, sc) =>
      assert(math.abs(mixed((0L, ent)) - sc) < 1e-9, s"entity $ent")
    }
  }

  test("biasOnlyUpdate = relu(x·Eᵀ·scale + bias)·E (reasoner/lmpnn.py:21-42)") {
    // Hand-computable fixture: x = [1, 0], E = {e0: [1, 0], e1: [0, 2],
    // e2: [-1, 0]}, scale = 1, bias = 0.5.
    //   scores  = relu([1·1, 0, -1] + 0.5) = [1.5, 0.5, 0]
    //   out     = 1.5·[1,0] + 0.5·[0,2] + 0·[-1,0] = [1.5, 1.0]
    val states = Seq((0L, 0, Seq(1.0, 0.0))).toDF("qid", "node", "vec")
    val ents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 2.0)),
                   (2L, Seq(-1.0, 0.0))).toDF("id", "vec")
    val out = LMPNN.biasOnlyUpdate(states, ents, scale = 1.0, bias = 0.5)
      .collect().map(r => r.getInt(1) -> r.getSeq[Double](2)).toMap
    assert(out(0) == Seq(1.5, 1.0))
  }

  test("answer with useBiasNet differs from plain and stays a valid cosine") {
    val cq = Normalize.toDnf(Parser.parse("r1(s1,f)")).head
    val b = Map("r1" -> 0L, "s1" -> 4L)
    val (qn, qe) = QueryGraph.compile(spark, Seq((cq, b)))
    val ents = Embeddings.deterministic(spark.range(6).toDF("id"), "id", dim, 0.3)
    val rels = Embeddings.deterministic(spark.range(4).toDF("id"), "id", dim, 1.7)
    val plain = LMPNN.answer(qn, qe, ents, rels, TransE(2), rounds = 1)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val biased = LMPNN.answer(qn, qe, ents, rels, TransE(2), rounds = 1,
                              useBiasNet = true)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(biased.keySet == plain.keySet)
    biased.values.foreach(v => assert(math.abs(v) <= 1.0 + 1e-9))
    assert(biased != plain) // the projection net must actually transform
  }
}
