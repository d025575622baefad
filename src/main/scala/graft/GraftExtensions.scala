package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayKernels, FuseVectorKernels}

/** SparkSessionExtensions injector: makes the graft native kernels available
  * to every session created with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`).
  * The registry path (ArrayKernels.register) does the same for an existing
  * session. Also injects [[FuseVectorKernels]], so HOF-style dot/cosine
  * expressions are rewritten to the fused kernels at optimization time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ArrayKernels.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.ArrayKernels", name),
        (es: Seq[Expression]) => builder(es)))
    }
    ext.injectOptimizerRule(_ => FuseVectorKernels)
  }
}
