package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ArrayKernels

/** SparkSessionExtensions injector: makes the graft native kernels available
  * to every session created with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`).
  * The registry path (ArrayKernels.register) does the same for an existing
  * session.
  *
  * [[graft.functions.FuseVectorKernels]] (HOF dot/cosine -> fused kernels)
  * is deliberately NOT injected here: it assumes the engine's dense-vector
  * convention (equal-length, null-free arrays), which a global extension
  * cannot guarantee for arbitrary user SQL. Opt in per session with
  * `spark.experimental.extraOptimizations :+= FuseVectorKernels`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ArrayKernels.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.ArrayKernels", name),
        (es: Seq[Expression]) => builder(es)))
    }
}
