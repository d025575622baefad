package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.score._

/** F1-F16 scoring kernels vs hand calculations (SURVEY §5.5). */
class ScoreSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def one(cols: (String, Seq[Double])*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val row = cols.map(_._2)
    Seq(Tuple1(1)).toDF("dummy").select(
      cols.zipWithIndex.map { case ((n, v), _) =>
        array(v.map(lit): _*).as(n)
      }: _*)
  }

  private def eval(df: org.apache.spark.sql.DataFrame,
                   c: org.apache.spark.sql.Column): Double =
    df.select(c.cast("double").as("v")).collect()(0).getDouble(0)

  test("F1 TransE score -||h+r-t||_2") {
    val df = one("h" -> Seq(1.0, 2.0), "r" -> Seq(0.5, 0.5), "t" -> Seq(1.0, 1.0))
    val s = eval(df, TransE(2).score(col("h"), col("r"), col("t")))
    assert(math.abs(s - (-math.sqrt(2.5))) < 1e-12)
  }

  test("F2 TransE estimate tail h+r") {
    val df = one("h" -> Seq(1.0, 2.0), "r" -> Seq(0.5, 0.5))
    val out = df.select(TransE(2).estimateTail(col("h"), col("r")).as("v"))
      .collect()(0).getSeq[Double](0)
    assert(out == Seq(1.5, 2.5))
  }

  test("F3 DistMult score -sum(h*r*t)") {
    val df = one("h" -> Seq(1.0, 2.0), "r" -> Seq(3.0, 4.0), "t" -> Seq(5.0, 6.0))
    assert(eval(df, DistMult.score(col("h"), col("r"), col("t"))) == -63.0)
  }

  test("F4/F5 ComplEx estimate + pair score (re||im halves)") {
    val df = one("h" -> Seq(1.0, 2.0), "r" -> Seq(3.0, 4.0), "t" -> Seq(5.0, 6.0))
    val est = df.select(ComplEx.estimateTail(col("h"), col("r")).as("v"))
      .collect()(0).getSeq[Double](0)
    assert(est == Seq(1.0 * 3 - 2 * 4, 1.0 * 4 + 2 * 3)) // [-5, 10]
    assert(eval(df, ComplEx.score(col("h"), col("r"), col("t"))) == -5.0 * 5 + 10 * 6)
  }

  test("F7/F8 RotatE rotation and positive-norm pair score") {
    val df = one("h" -> Seq(1.0, 2.0), "r" -> Seq(math.Pi / 2), "t" -> Seq(0.0, 0.0))
    val s = eval(df, RotatE.score(col("h"), col("r"), col("t")))
    assert(math.abs(s - math.sqrt(5.0)) < 1e-12) // positive distance, rotate.py:104-106
  }

  test("F10 RESCAL bilinear h^T W t (intended semantics)") {
    val df = one("h" -> Seq(1.0, 2.0), "w" -> Seq(1.0, 2.0, 3.0, 4.0),
                 "t" -> Seq(1.0, 1.0))
    assert(eval(df, Rescal.score(col("h"), col("w"), col("t"))) == 17.0)
  }

  test("F11 SWTransE sliced-Wasserstein score") {
    // d=2, m=2: h=[[3,1],[0,2]], r=[1,-1], t=[[1,2],[3,4]]
    val df = one("h" -> Seq(3.0, 1.0, 0.0, 2.0), "r" -> Seq(1.0, -1.0),
                 "t" -> Seq(1.0, 2.0, 3.0, 4.0))
    val s = eval(df, SWTransE(particles = 2).score(col("h"), col("r"), col("t")))
    assert(math.abs(s - -(math.sqrt(5.0) + 5.0)) < 1e-12)
  }

  test("F13 negation flip / F14 inverse relation id") {
    import spark.implicits._
    val df = Seq((1.5, true, 6L), (1.5, false, 7L)).toDF("s", "neg", "rel")
    val out = df.select(KGE.negFlip(col("s"), col("neg")).as("f"),
                        KGE.inverseRel(col("rel")).as("ir"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.toSeq == Seq((-1.5, 7L), (1.5, 6L)))
  }

  test("F15 cosine similarity") {
    val df = one("a" -> Seq(1.0, 0.0), "b" -> Seq(1.0, 1.0))
    val s = eval(df, VectorOps.cosine(col("a"), col("b")))
    assert(math.abs(s - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("F16 t-norms: product and Godel + De Morgan disjunction") {
    import spark.implicits._
    val df = Seq((0.3, 0.6)).toDF("a", "b")
    def ev(c: org.apache.spark.sql.Column) =
      df.select(c.as("v")).collect()(0).getDouble(0)
    assert(math.abs(ev(ProductTNorm.conj(col("a"), col("b"))) - 0.18) < 1e-12)
    assert(math.abs(ev(ProductTNorm.disj(col("a"), col("b"))) - 0.72) < 1e-12)
    assert(ev(GodelTNorm.conj(col("a"), col("b"))) == 0.3)
    assert(ev(GodelTNorm.disj(col("a"), col("b"))) == 0.6)
  }

  test("F17 ComplEx N3 regularization") {
    val df = one("e" -> Seq(3.0, 4.0)) // re=3, im=4 -> norm 5 -> 125
    assert(eval(df, ComplEx.regularization(col("e"))) == 125.0)
  }

  test("vecSumByKey element-wise vector sum") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0)), (2L, Seq(5.0, 5.0)))
      .toDF("k", "v")
    val out = VectorOps.vecSumByKey(df, Seq("k"), "v", "s")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(out(1L) == Seq(4.0, 6.0) && out(2L) == Seq(5.0, 5.0))
  }

  test("T4 factory resolves every scorer by name") {
    Seq("transe", "distmult", "complex", "rotate", "rescal", "swtranse",
        "native_transe").foreach { n =>
      assert(graft.score.KGE.byName(n) != null, n)
    }
    intercept[IllegalArgumentException](graft.score.KGE.byName("nope"))
  }

  test("F9 randomInit: deterministic, right shape, ~N(0, std^2)") {
    val dim = 16
    val std = 1e-3
    val ids = spark.range(500).toDF("id")
    val rows = Embeddings.randomInit(ids, "id", dim, std)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.size == 500 && rows.values.forall(_.length == dim))
    val xs = rows.values.flatten.toArray
    val mean = xs.sum / xs.length
    val variance = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
    assert(math.abs(mean) < 3 * std / math.sqrt(xs.length.toDouble) * 5,
      s"mean $mean not ~0")
    assert(variance > 0.8 * std * std && variance < 1.2 * std * std,
      s"variance $variance not ~${std * std}")
    // element-wise reproducible across evaluations
    val again = Embeddings.randomInit(ids, "id", dim, std)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows == again)
  }

  test("F12 ConvE: fused kernel matches a plain-Scala forward pass") {
    // Independent reimplementation of conve.py:74-96 (inference, identity
    // BN/dropout) over the seeded parameters.
    val model = ConvE(dim = 9)
    val (hgt, wid, oc) = (2, 4, 32)
    val w = ConvE.weights(hgt, wid, oc)
    def refEst(h: Array[Double], r: Array[Double]): Array[Double] = {
      val convH = 2 * hgt - 2; val convW = wid - 2
      val flatN = oc * convH * convW; val d1 = hgt * wid
      def inp(y: Int, x: Int) =
        if (y < hgt) h(1 + y * wid + x) else r(1 + (y - hgt) * wid + x)
      val flat = for (c <- 0 until oc; oy <- 0 until convH; ox <- 0 until convW)
        yield math.max(w(oc * 9 + c) + (for (ky <- 0 until 3; kx <- 0 until 3)
          yield w(c * 9 + ky * 3 + kx) * inp(oy + ky, ox + kx)).sum, 0.0)
      1.0 +: Array.tabulate(d1) { j =>
        math.max(w(oc * 9 + oc + d1 * flatN + j) +
          (0 until flatN).map(i => w(oc * 9 + oc + j * flatN + i) * flat(i)).sum,
          0.0)
      }
    }
    val rnd = new scala.util.Random(7)
    val hs = Array.fill(9)(rnd.nextGaussian())
    val rs = Array.fill(9)(rnd.nextGaussian())
    val ts = Array.fill(9)(rnd.nextGaussian())
    val df = one("h" -> hs.toSeq, "r" -> rs.toSeq, "t" -> ts.toSeq)
    val est = df.select(model.estimateTail(col("h"), col("r")).as("v"))
      .collect()(0).getSeq[Double](0)
    val want = refEst(hs, rs)
    assert(est.length == 9)
    est.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    // score = est · t, and pairScore agrees
    val s = eval(df, model.score(col("h"), col("r"), col("t")))
    val wantS = want.zip(ts).map { case (a, b) => a * b }.sum
    assert(math.abs(s - wantS) < 1e-12)
  }
}
