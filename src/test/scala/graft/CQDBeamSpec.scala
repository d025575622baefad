package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.exec.CQDBeam
import graft.score.{Embeddings, TransE}
import graft.lang.{Parser, Normalize, QueryGraph}

/** CQD beam search vs a plain-Scala reimplementation of the reference
  * max-sum semantics (cqd.py:319-355) on a tiny embedding space. */
class CQDBeamSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val nEnt = 6
  val nRel = 4
  val dim = 4
  val entSeed = 0.3
  val relSeed = 1.7

  def vec(id: Long, seed: Double): Array[Double] =
    Array.tabulate(dim)(i => math.sin((id % 9973 + 1) * (i + 1) * 0.017 + seed))

  def transe(h: Array[Double], r: Array[Double], t: Array[Double]): Double =
    -math.sqrt((0 until dim).map(i => math.pow(h(i) + r(i) - t(i), 2)).sum)

  lazy val ents = Embeddings.deterministic(
    spark.range(nEnt).toDF("id"), "id", dim, entSeed)
  lazy val rels = Embeddings.deterministic(
    spark.range(nRel).toDF("id"), "id", dim, relSeed)

  def spark2map(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  // Constant/leaf frontiers seed score 1.0, summed into edge scores
  // (cqd.py:160-162,184-188).
  def score1p(r1: Long, s1: Long)(f: Long): Double =
    1.0 + transe(vec(s1, entSeed), vec(r1, relSeed), vec(f, entSeed))

  test("1p: scores all entities like the reference formula") {
    val got = spark2map(CQDBeam.answer("r1(s1,f)",
      Map("r1" -> 1L, "s1" -> 2L), ents, rels, TransE(2), beam = 10))
    assert(got.size == nEnt)
    (0L until nEnt).foreach { f =>
      assert(math.abs(got(f) - score1p(1, 2)(f)) < 1e-9, s"f=$f")
    }
  }

  test("2p: existential max over intermediate + sum along path") {
    val got = spark2map(CQDBeam.answer("r1(s1,e1)&r2(e1,f)",
      Map("r1" -> 0L, "r2" -> 2L, "s1" -> 4L), ents, rels, TransE(2), beam = 10))
    (0L until nEnt).foreach { f =>
      val want = (0L until nEnt).map { e1 =>
        1.0 + transe(vec(4, entSeed), vec(0, relSeed), vec(e1, entSeed)) +
        transe(vec(e1, entSeed), vec(2, relSeed), vec(f, entSeed))
      }.max
      assert(math.abs(got(f) - want) < 1e-9, s"f=$f")
    }
  }

  test("2i: conjunction sums per-edge scores") {
    val got = spark2map(CQDBeam.answer("r1(s1,f)&r2(s2,f)",
      Map("r1" -> 0L, "r2" -> 1L, "s1" -> 0L, "s2" -> 1L),
      ents, rels, TransE(2), beam = 10))
    (0L until nEnt).foreach { f =>
      val want = (1.0 + transe(vec(0, entSeed), vec(0, relSeed), vec(f, entSeed))) +
                 (1.0 + transe(vec(1, entSeed), vec(1, relSeed), vec(f, entSeed)))
      assert(math.abs(got(f) - want) < 1e-9)
    }
  }

  test("2in: negated atom contributes flipped score") {
    val got = spark2map(CQDBeam.answer("r1(s1,f)&!r2(s2,f)",
      Map("r1" -> 0L, "r2" -> 1L, "s1" -> 0L, "s2" -> 1L),
      ents, rels, TransE(2), beam = 10))
    (0L until nEnt).foreach { f =>
      val want = (1.0 + transe(vec(0, entSeed), vec(0, relSeed), vec(f, entSeed))) +
                 (1.0 - transe(vec(1, entSeed), vec(1, relSeed), vec(f, entSeed)))
      assert(math.abs(got(f) - want) < 1e-9)
    }
  }

  test("2u: disjunction takes max over conjuncts") {
    val got = spark2map(CQDBeam.answer("r1(s1,f)|r2(s2,f)",
      Map("r1" -> 0L, "r2" -> 1L, "s1" -> 0L, "s2" -> 1L),
      ents, rels, TransE(2), beam = 10))
    (0L until nEnt).foreach { f =>
      val want = 1.0 + math.max(
        transe(vec(0, entSeed), vec(0, relSeed), vec(f, entSeed)),
        transe(vec(1, entSeed), vec(1, relSeed), vec(f, entSeed)))
      assert(math.abs(got(f) - want) < 1e-9)
    }
  }

  test("beam pruning restricts the intermediate frontier") {
    // beam=1: only the best e1 assignment survives (cqd.py:374-409).
    val got = spark2map(CQDBeam.answer("r1(s1,e1)&r2(e1,f)",
      Map("r1" -> 0L, "r2" -> 2L, "s1" -> 4L), ents, rels, TransE(2), beam = 1))
    val bestE1 = (0L until nEnt).maxBy(e1 =>
      transe(vec(4, entSeed), vec(0, relSeed), vec(e1, entSeed)))
    (0L until nEnt).foreach { f =>
      val want = 1.0 + transe(vec(4, entSeed), vec(0, relSeed), vec(bestE1, entSeed)) +
                 transe(vec(bestE1, entSeed), vec(2, relSeed), vec(f, entSeed))
      assert(math.abs(got(f) - want) < 1e-9)
    }
  }

  test("unbounded beam does not hint-broadcast the frontier (no OOM-shaped plan)") {
    // With autoBroadcast disabled, a broadcast() HINT is the only way a join
    // can plan as BroadcastNestedLoopJoin. beam = Int.MaxValue leaves the
    // e1 frontier unbounded, so its cross join with the candidates must NOT
    // carry the hint (it planfalls to CartesianProduct here); a small finite
    // beam proves the frontier ≤ beam rows and keeps the hint.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def planOf(beam: Int): String = {
        val df = CQDBeam.answer("r1(s1,e1)&r2(e1,f)",
          Map("r1" -> 0L, "r2" -> 2L, "s1" -> 4L), ents, rels, TransE(2), beam)
        df.collect()
        df.queryExecution.executedPlan.toString
      }
      assert(planOf(Int.MaxValue).contains("CartesianProduct"),
        "unbounded frontier should lose the broadcast hint")
      assert(!planOf(10).contains("CartesianProduct"),
        "beam-bounded frontier should keep the broadcast hint")
      // Semantics unchanged by the hint decision: beam >= |E| prunes nothing.
      val a = spark2map(CQDBeam.answer("r1(s1,e1)&r2(e1,f)",
        Map("r1" -> 0L, "r2" -> 2L, "s1" -> 4L), ents, rels, TransE(2),
        Int.MaxValue))
      val bb = spark2map(CQDBeam.answer("r1(s1,e1)&r2(e1,f)",
        Map("r1" -> 0L, "r2" -> 2L, "s1" -> 4L), ents, rels, TransE(2), 10))
      a.foreach { case (k, v) => assert(math.abs(v - bb(k)) < 1e-9) }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("varOrder schedules constants-adjacent first, free last, leaf-exists first") {
    val cq3c = Normalize.toDnf(Parser.parse(
      "((((r1(s1,e1))&(r2(e1,f)))&(r3(s2,e2)))&(r4(e2,f)))&(r5(e1,e2))")).head
    val ord = QueryGraph.varOrder(cq3c)
    assert(ord.last == "f" && ord.toSet == Set("e1", "e2", "f"))
    val cq2il = Normalize.toDnf(Parser.parse("(r1(s1,f))&(r2(e1,f))")).head
    assert(QueryGraph.varOrder(cq2il) == Seq("e1", "f"))
  }
}
