package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions (with doGenCode) for the hot vector kernels
  * of SURVEY §2.6. The higher-order-function formulations in
  * [[graft.score.VectorOps]] are correct but allocate intermediate arrays
  * per row (`zip_with` materializes the product array before `aggregate`
  * folds it); these fused one-pass kernels run inside whole-stage codegen
  * with zero allocation — the (b)-level extension point of the design
  * (custom Expression beats UDF; SURVEY §4 'custom work needed').
  *
  * Registered as SQL functions `array_dot`, `array_cosine`, `transe_score`
  * by [[ArrayKernels.register]] or via [[graft.GraftExtensions]].
  */

/** Σ a[i]·b[i] — fused dot product. */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    var s = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Cosine similarity in one pass (dot and both norms fused). */
case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("d"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
         |  $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** TransE L2 score `-‖h + r − t‖₂` fused into one pass (F1) — the CQD hot
  * kernel, evaluated |entities| × beam × |query edges| times per query. */
case class TranseScore(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(h: Any, r: Any, t: Any): Any = {
    val (hv, rv, tv) = (h.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
                        t.asInstanceOf[ArrayData])
    var s = 0.0
    var i = 0
    val n = hv.numElements()
    while (i < n) {
      val d = hv.getDouble(i) + rv.getDouble(i) - tv.getDouble(i)
      s += d * d; i += 1
    }
    -math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, r, t) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = $h.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $h.getDouble($i) + $r.getDouble($i) - $t.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = -java.lang.Math.sqrt($s);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression) =
    copy(first = f, second = s, third = t)
}

object ArrayKernels {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "array_dot" -> (es => ArrayDot(es(0), es(1))),
    "array_cosine" -> (es => ArrayCosine(es(0), es(1))),
    "transe_score" -> (es => TranseScore(es(0), es(1), es(2))))

  /** Idempotent session-local registration (the non-extensions path). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }

  // Column API (resolves through the function registry).
  def arrayDot(a: Column, b: Column): Column = call_function("array_dot", a, b)
  def arrayCosine(a: Column, b: Column): Column = call_function("array_cosine", a, b)
  def transeScore(h: Column, r: Column, t: Column): Column =
    call_function("transe_score", h, r, t)
}
