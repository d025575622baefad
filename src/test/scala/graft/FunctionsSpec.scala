package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ArrayKernels
import graft.score.{TransE, VectorOps, NativeTransE}

/** Native Catalyst kernels vs the higher-order-function formulations. */
class FunctionsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  ArrayKernels.register(spark)

  val rnd = new scala.util.Random(11)
  val rows = Seq.fill(50)((Seq.fill(16)(rnd.nextGaussian()),
                           Seq.fill(16)(rnd.nextGaussian()),
                           Seq.fill(16)(rnd.nextGaussian())))
  lazy val df = rows.toDF("h", "r", "t")

  test("array_dot matches VectorOps.dot") {
    val out = df.select(
      ArrayKernels.arrayDot($"h", $"t").as("fast"),
      VectorOps.dot($"h", $"t").as("slow")).collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("array_cosine matches VectorOps.cosine") {
    val out = df.select(
      ArrayKernels.arrayCosine($"h", $"t").as("fast"),
      VectorOps.cosine($"h", $"t").as("slow")).collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("transe_score matches TransE(2).score and NativeTransE routes to it") {
    val out = df.select(
      ArrayKernels.transeScore($"h", $"r", $"t").as("fast"),
      TransE(2).score($"h", $"r", $"t").as("slow"),
      NativeTransE.score($"h", $"r", $"t").as("model")).collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(r.getDouble(0) == r.getDouble(2))
    }
  }

  test("kernels usable from SQL text") {
    df.createOrReplaceTempView("vecs")
    val n = spark.sql(
      "SELECT array_dot(h, t) d, array_cosine(h, t) c, transe_score(h, r, t) s FROM vecs")
      .collect()
    assert(n.length == 50 && n.forall(r => !r.isNullAt(0)))
  }

  test("null propagation") {
    val d = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(ArrayKernels.arrayDot($"a", $"b")).collect()
    assert(d(0).isNullAt(0))
  }

  test("FuseVectorKernels rewrites HOF dot/cosine to the native kernels") {
    // A range-derived frame: literal inputs would be constant-folded into a
    // LocalRelation before user-provided optimizer rules run.
    val vecs = spark.range(50).select(
      graft.score.Embeddings.deterministicVec(col("id"), 16, 0.3).as("h"),
      graft.score.Embeddings.deterministicVec(col("id") + 7, 16, 1.7).as("t"))
    def q = vecs.select(VectorOps.dot($"h", $"t").as("d"),
                        VectorOps.cosine($"h", $"t").as("c"))
    val before = spark.experimental.extraOptimizations
    try {
      // Baseline (no rule): HOF values + plan keeps the aggregate lambdas.
      val base = q.collect().map(r => (r.getDouble(0), r.getDouble(1)))
      assert(q.queryExecution.optimizedPlan.toString.contains("aggregate("))

      spark.experimental.extraOptimizations =
        before :+ graft.functions.FuseVectorKernels
      val fused = q
      val plan = fused.queryExecution.optimizedPlan.toString
      assert(plan.contains("arraydot") && plan.contains("arraycosine"),
        s"kernels not fused:\n$plan")
      val got = fused.collect().map(r => (r.getDouble(0), r.getDouble(1)))
      // identical fold order -> bit-equal results
      assert(got.toSeq == base.toSeq)
    } finally spark.experimental.extraOptimizations = before
  }

  test("pq kernels agree with the reference across (m, k, sub) configs " +
       "and are reachable from SQL") {
    for (m <- Seq(1, 2, 4); k <- Seq(2, 8); sub <- Seq(1, 5)) {
      val dim = m * sub
      val cb = (for { s <- 0 until m; c <- 0 until k; i <- 1 to sub }
        yield math.sin((s * k + c + 1) * i * 0.29)).toIndexedSeq
      val vecs = Seq.fill(8)(IndexedSeq.fill(dim)(rnd.nextGaussian()))
      def refEncode(v: IndexedSeq[Double]): Seq[Int] =
        (0 until m).map { s =>
          (0 until k).minBy { c =>
            val base = (s * k + c) * sub
            (0 until sub).map(i => cb(base + i) * cb(base + i)).sum -
              2 * (0 until sub).map(i => v(s * sub + i) * cb(base + i)).sum
          }
        }
      val df = vecs.map(v => Tuple1(v)).toDF("vec")
      df.createOrReplaceTempView("pq_prop_in")
      // SQL-registry path (same functions GraftExtensions injects)
      val out = spark.sql(
        s"""SELECT pq_encode(vec, array(${cb.mkString(",")}), $m, $k) AS codes,
           |       pq_adc(pq_lut(vec, array(${cb.mkString(",")}), $m, $k),
           |              pq_encode(vec, array(${cb.mkString(",")}), $m, $k),
           |              $k) AS adist
           |FROM pq_prop_in""".stripMargin).collect()
      out.zip(vecs).foreach { case (r, v) =>
        assert(r.getSeq[Int](0) == refEncode(v), s"m=$m k=$k sub=$sub")
        assert(r.getDouble(1) >= 0.0 - 1e-12) // squared distances sum
      }
    }
  }

  test("pq kernels: encode/lut/adc match a driver-side reference") {
    val m = 4; val k = 8; val sub = 4; val dim = m * sub
    val cb = (for { s <- 0 until m; c <- 0 until k; i <- 1 to sub }
      yield math.sin((s * k + c + 1) * i * 0.31)).toIndexedSeq
    val vecs = Seq.fill(20)(IndexedSeq.fill(dim)(rnd.nextGaussian()))
    // reference: per-subspace argmin of ||c||^2 - 2 sv.cv, LUT of exact d
    def refEncode(v: IndexedSeq[Double]): Seq[Int] =
      (0 until m).map { s =>
        (0 until k).minBy { c =>
          val base = (s * k + c) * sub
          (0 until sub).map(i => cb(base + i) * cb(base + i)).sum -
            2 * (0 until sub).map(i => v(s * sub + i) * cb(base + i)).sum
        }
      }
    def refLut(v: IndexedSeq[Double]): Seq[Double] =
      (for { s <- 0 until m; c <- 0 until k } yield {
        val base = (s * k + c) * sub
        (0 until sub).map(i => v(s * sub + i) * v(s * sub + i)).sum -
          2 * (0 until sub).map(i => v(s * sub + i) * cb(base + i)).sum +
          (0 until sub).map(i => cb(base + i) * cb(base + i)).sum
      })
    val cbLit = typedLit(cb)
    val df = vecs.map(v => Tuple1(v)).toDF("vec")
    val out = df.select(
      ArrayKernels.pqEncode($"vec", cbLit, m, k).as("codes"),
      ArrayKernels.pqLut($"vec", cbLit, m, k).as("lut"))
      .select($"codes", $"lut",
        ArrayKernels.pqAdc($"lut", $"codes", k).as("adist")).collect()
    out.zip(vecs).foreach { case (r, v) =>
      val codes = r.getSeq[Int](0)
      val lut = r.getSeq[Double](1)
      assert(codes == refEncode(v))
      lut.zip(refLut(v)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
      // adc = ordered sum of the chosen lut cells
      val want = (0 until m).map(s => lut(s * k + codes(s))).sum
      assert(r.getDouble(2) == want)
    }
  }
}
