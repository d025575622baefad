package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.ExactQuantiles

/** Bit-equality of the frequency-table prefix-sum quantile operator
  * against Spark's own `percentile` aggregate (the single-task-buffer
  * built-in it replaces): same value multiset ⇒ same counts ⇒ same
  * ranks ⇒ the same `(higher−position)·vLo + (position−lower)·vHi`
  * formula on the same double operands, so results must be IDENTICAL
  * doubles (==, not tolerance). Covers grouped / ungrouped, null
  * values, NULL group keys, single-value and all-equal-value groups,
  * and multi-column multi-p specs. */
class ExactQuantilesSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)

  /** Reference: built-in percentile, one output column per (vc, p). */
  private def builtin(df: DataFrame, groupCols: Seq[String],
                      specs: Seq[(String, String, Double)]): DataFrame = {
    val aggs = specs.map { case (vc, nm, p) =>
      expr(s"percentile($vc, ${p.toString})").as(nm)
    }
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def assertBitEqual(df: DataFrame, groupCols: Seq[String],
                             specs: Seq[(String, String, Double)]): Unit = {
    val got = ExactQuantiles.quantiles(df, groupCols, specs)
    val want = builtin(df, groupCols, specs)
    val cols = groupCols ++ specs.map(_._2)
    def canon(d: DataFrame): Seq[Seq[Any]] =
      d.select(cols.map(col): _*).collect().toSeq
        .map(_.toSeq).sortBy(_.mkString(""))
    val (g, w) = (canon(got), canon(want))
    assert(g.size == w.size, s"row count: got ${g.size}, want ${w.size}")
    g.zip(w).foreach { case (gr, wr) =>
      gr.zip(wr).zip(cols).foreach { case ((gv, wv), c) =>
        (gv, wv) match {
          case (a: java.lang.Double, b: java.lang.Double) =>
            // bit equality, modulo the documented sign-of-zero contract:
            // the operator's groupBy normalizes -0.0 to 0.0 (SQL
            // equality semantics), the built-in's raw-bits hashmap
            // doesn't — so +0.0 is compared equal to -0.0 here.
            assert(java.lang.Double.doubleToLongBits(a + 0.0) ==
                   java.lang.Double.doubleToLongBits(b + 0.0),
              s"$c: got $a want $b (row $gr vs $wr)")
          case _ => assert(gv == wv, s"$c: got $gv want $wv")
        }
      }
    }
  }

  private def liSpecs(vc: String): Seq[(String, String, Double)] =
    ps.zipWithIndex.map { case (p, i) => (vc, s"q$i", p) }

  test("ungrouped: every p, bit-equal to built-in percentile") {
    val df = Seq(3.5, 1.0, 2.25, 9.75, 4.0, 4.0, -1.5, 0.0, 7.125, 2.25)
      .toDF("v")
    assertBitEqual(df, Seq.empty, liSpecs("v"))
  }

  test("grouped: every p, bit-equal per group") {
    val df = (1 to 500).map(i => (s"g${i % 7}", (i * 37 % 113) * 0.125))
      .toDF("g", "v")
    assertBitEqual(df, Seq("g"), liSpecs("v"))
  }

  test("null values are dropped exactly like the built-in") {
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", null), ("a", 3.0), ("b", null), ("b", 5.0),
      ("c", 2.0), ("c", 4.0), ("c", null), ("c", 8.0)).toDF("g", "v")
    assertBitEqual(df, Seq("g"), liSpecs("v"))
  }

  test("NULL group key forms its own group (null-safe joins)") {
    val df = Seq[(String, java.lang.Double)](
      (null, 1.0), (null, 2.0), (null, 4.5), ("x", 3.0), ("x", 6.0))
      .toDF("g", "v")
    assertBitEqual(df, Seq("g"), liSpecs("v"))
  }

  test("single-value and all-equal-value groups") {
    val df = Seq(("one", 42.5), ("eq", 7.0), ("eq", 7.0), ("eq", 7.0),
      ("mix", 7.0), ("mix", 7.0), ("mix", 9.0)).toDF("g", "v")
    assertBitEqual(df, Seq("g"), liSpecs("v"))
  }

  test("multi-column specs melt into one scan and stay exact") {
    val df = (1 to 300).map { i =>
      (s"g${i % 3}", (i * 13 % 47) * 0.5, (i * 29 % 31) * 1.25)
    }.toDF("g", "a", "b")
    val specs = Seq(("a", "a_med", 0.5), ("a", "a_p90", 0.9),
                    ("b", "b_q1", 0.25), ("b", "b_med", 0.5))
    assertBitEqual(df, Seq("g"), specs)
  }

  test("adversarial doubles: ties, negatives, denormal-ish spread") {
    val vs = Seq(1e-300, -1e-300, 0.0, -0.0, 1e300, -1e300, 3.3333333333,
      3.3333333333, math.Pi, math.E, 1.0 / 3.0, 2.0 / 3.0)
    assertBitEqual(vs.toDF("v"), Seq.empty, liSpecs("v"))
  }

  test("integer-typed column is cast like the built-in") {
    val df = (1 to 100).map(i => ("g" + i % 2, i * 37 % 41)).toDF("g", "v")
    assertBitEqual(df, Seq("g"), liSpecs("v"))
  }

  test("bucket fan-out does not change results (buckets=1 and 7)") {
    val df = (1 to 200).map(i => (i * 17 % 53) * 0.25).toDF("v")
    val specs = liSpecs("v")
    Seq(1, 7).foreach { b =>
      val got = ExactQuantiles.quantiles(df, Seq.empty, specs, buckets = b)
        .collect().head
      val want = builtin(df, Seq.empty, specs).collect().head
      specs.indices.foreach { i =>
        assert(got.getDouble(i) == want.getDouble(i),
          s"buckets=$b q$i: ${got.getDouble(i)} vs ${want.getDouble(i)}")
      }
    }
  }

  test("plan shape: no global window, no TypedImperativeAggregate spool") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{
      AggregateExpression, TypedImperativeAggregate}
    val df = (1 to 100).map(i => ("g" + i % 3, i * 0.5)).toDF("g", "v")
    val plan = ExactQuantiles.quantiles(df, Seq("g"),
      Seq(("v", "med", 0.5))).queryExecution.optimizedPlan
    val globalWindows = plan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, "operator must never plan a global window")
    val spools = plan.collect {
      case a: Aggregate => a.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression if ae.aggregateFunction
            .isInstanceOf[TypedImperativeAggregate[_]] => ae
      })
    }.flatten
    assert(spools.isEmpty, "operator must not fall back to an object aggregate")
  }
}
