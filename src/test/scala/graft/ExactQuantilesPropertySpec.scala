package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ExactQuantiles

/** Randomized equivalence sweep: ExactQuantiles ≡ built-in `percentile`
  * on random frames — random group counts (including a NULL group key),
  * random value multisets with ties and nulls, random p values (edge
  * p ∈ {0, 1} forced in), random bucket fan-outs. Complements the
  * directed cases in ExactQuantilesSpec with breadth: 12 random frames
  * × 5 p-values × every group, all compared bit-for-bit (modulo the
  * documented sign-of-zero normalization). */
class ExactQuantilesPropertySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(99)

  private def randomFrame(): org.apache.spark.sql.DataFrame = {
    val nGroups = 1 + rnd.nextInt(5)
    val n = 20 + rnd.nextInt(200)
    // small value domain → heavy ties; occasional nulls
    val rows = Seq.fill(n) {
      val g: java.lang.Long =
        if (rnd.nextInt(10) == 0) null else rnd.nextInt(nGroups).toLong
      val v: java.lang.Double =
        if (rnd.nextInt(12) == 0) null
        else (rnd.nextInt(40) - 20) * (1.0 + rnd.nextInt(4)) / 4.0
      (g, v)
    }
    rows.toDF("g", "v")
  }

  (1 to 12).foreach { iter =>
    test(s"random frame equivalence, iteration $iter") {
      val df = randomFrame()
      val ps = Seq(0.0, 1.0, rnd.nextDouble(), rnd.nextDouble(),
                   rnd.nextDouble())
      val specs = ps.zipWithIndex.map { case (p, i) => ("v", s"q$i", p) }
      val buckets = Seq(1, 3, 64, 1024)(rnd.nextInt(4))
      val got = ExactQuantiles.quantiles(df, Seq("g"), specs, buckets)
        .collect().map(r => Option(r.get(0)).map(_.toString).orNull ->
          specs.indices.map(i =>
            if (r.isNullAt(i + 1)) null else r.getDouble(i + 1))).toMap
      val aggs = specs.map { case (_, nm, p) =>
        expr(s"percentile(v, ${p.toString})").as(nm)
      }
      val want = df.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
        .collect().map(r => Option(r.get(0)).map(_.toString).orNull ->
          specs.indices.map(i =>
            if (r.isNullAt(i + 1)) null else r.getDouble(i + 1))).toMap
      // groups whose every value is NULL: percentile returns a row of
      // NULLs, ExactQuantiles drops the group (its melt filters null
      // values) — compare on the groups with data, assert the rest are
      // all-NULL rows.
      val (wantData, wantAllNull) = want.partition(_._2.exists(_ != null))
      assert(got.keySet == wantData.keySet,
        s"group sets differ: got ${got.keySet} want ${wantData.keySet} " +
          s"(all-null groups: ${wantAllNull.keySet})")
      wantData.foreach { case (gk, wvs) =>
        got(gk).zip(wvs).zipWithIndex.foreach { case ((gv, wv), i) =>
          (gv, wv) match {
            case (a: java.lang.Double, b: java.lang.Double) =>
              assert(java.lang.Double.doubleToLongBits(a + 0.0) ==
                     java.lang.Double.doubleToLongBits(b + 0.0),
                s"group $gk q$i (p=${ps(i)}): got $a want $b")
            case _ => assert(gv == wv, s"group $gk q$i: got $gv want $wv")
          }
        }
      }
    }
  }
}
