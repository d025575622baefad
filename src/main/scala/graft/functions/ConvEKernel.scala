package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused ConvE tail-estimate kernel (F12; conve.py:74-96 forward pass,
  * inference mode).
  *
  * Reference semantics re-expressed: drop the bias dimension (index 0),
  * reshape head and relation embeddings to (hgt × wid), stack vertically
  * (2·hgt × wid), convolve with `oc` 3×3 filters (stride 1, no padding) +
  * bias, ReLU, flatten, linear projection back to hgt·wid dims + bias,
  * ReLU, and prepend the constant 1.0 bias dimension. Inference-mode
  * simplifications baked in: dropout = identity, and the affine-free
  * BatchNorm layers (conve.py:59-60) use unit running statistics (mean 0,
  * var 1) — i.e. identity — which is the declared fixed parameterization,
  * not an approximation of trained stats.
  *
  * `w` is the flattened parameter array, layout:
  *   [conv filters oc·9 (ky·3+kx minor)] [conv bias oc]
  *   [projection W (hgt·wid)·flatN row-major] [projection bias hgt·wid]
  * (flatN = oc·(2·hgt−2)·(wid−2)). One codegen'd static call per row; the
  * loops live in [[ConvEKernel.estimate]], outside the Janino method-size
  * limits. */
case class ConvEEst(first: Expression, second: Expression, third: Expression,
                    hgt: Int, wid: Int, oc: Int)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(h: Any, r: Any, w: Any): Any =
    ConvEKernel.estimate(h.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
                         w.asInstanceOf[ArrayData], hgt, wid, oc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, r, w) => {
      s"${ev.value} = graft.functions.ConvEKernel.estimate($h, $r, $w, $hgt, $wid, $oc);"
    })
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression) =
    copy(first = f, second = s, third = t)
}

object ConvEKernel {
  /** See [[ConvEEst]]. Returns an array of hgt·wid + 1 doubles. */
  def estimate(h: ArrayData, r: ArrayData, w: ArrayData,
               hgt: Int, wid: Int, oc: Int): ArrayData = {
    val convH = 2 * hgt - 2
    val convW = wid - 2
    val flatN = oc * convH * convW
    val d1 = hgt * wid
    val offConvB = oc * 9
    val offProjW = offConvB + oc
    val offProjB = offProjW + d1 * flatN

    def inp(y: Int, x: Int): Double =
      if (y < hgt) h.getDouble(1 + y * wid + x)
      else r.getDouble(1 + (y - hgt) * wid + x)

    val flat = new Array[Double](flatN)
    var c = 0
    while (c < oc) {
      var oy = 0
      while (oy < convH) {
        var ox = 0
        while (ox < convW) {
          var a = w.getDouble(offConvB + c)
          var ky = 0
          while (ky < 3) {
            var kx = 0
            while (kx < 3) {
              a += w.getDouble(c * 9 + ky * 3 + kx) * inp(oy + ky, ox + kx)
              kx += 1
            }
            ky += 1
          }
          flat(c * convH * convW + oy * convW + ox) = math.max(a, 0.0)
          ox += 1
        }
        oy += 1
      }
      c += 1
    }
    val out = new Array[Double](d1 + 1)
    out(0) = 1.0
    var j = 0
    while (j < d1) {
      var a = w.getDouble(offProjB + j)
      var i = 0
      while (i < flatN) {
        a += w.getDouble(offProjW + j * flatN + i) * flat(i)
        i += 1
      }
      out(j + 1) = math.max(a, 0.0)
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}
