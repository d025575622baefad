package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE merge application (the r7-verdict stretch item: collapse
  * [[graft.pipeline.TextOps.bpeEncode]]'s one-Spark-job-per-merge-rank
  * driver loop into a single native pass per document).
  *
  * Semantics are EXACTLY the iterative path's (hash-identity
  * spec-checked in PipelineSpec): for each merge rank in order, one
  * greedy left-to-right scan replaces adjacent (lhs, rhs) token pairs
  * with their concatenation — the same rewrite the relational
  * odd-parity-islands formulation performs, but with the whole merge
  * table applied inside one expression eval. A 30k-merge vocabulary
  * costs the same Spark job count as a 2-merge one; per-doc work is
  * O(ranks-with-candidates × doc_len) with a token-presence screen
  * skipping ranks whose lhs/rhs can't occur. */
object BpeKernel {

  /** Flat merge table [lhs0, rhs0, lhs1, rhs1, …] (rank order) packed to
    * [lhs, rhs, merged] triples so the scan never concatenates per row. */
  def pack(flat: ArrayData): Array[UTF8String] = {
    val n = flat.numElements()
    require(n % 2 == 0, s"merge table must be flat (lhs, rhs) pairs, got $n")
    val out = new Array[UTF8String](n / 2 * 3)
    var i = 0
    while (i < n / 2) {
      val lhs = flat.getUTF8String(2 * i)
      val rhs = flat.getUTF8String(2 * i + 1)
      out(3 * i) = lhs
      out(3 * i + 1) = rhs
      out(3 * i + 2) = UTF8String.concat(lhs, rhs)
      i += 1
    }
    out
  }

  /** Apply every packed merge in rank order, one greedy-leftmost pass
    * each, to one document's token array. */
  def applyMerges(toks: ArrayData, packed: Array[UTF8String]): ArrayData = {
    var n = toks.numElements()
    val cur = new Array[UTF8String](n)
    // Token-presence screen: a rank whose lhs or rhs never occurs in the
    // CURRENT tokens can't fire. Seeded with the input tokens; merged
    // outputs are added as they appear. (A set of this doc's distinct
    // tokens — small; saves the O(doc_len) scan for the vast majority of
    // ranks of a real vocabulary.)
    val present = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      cur(i) = toks.getUTF8String(i)
      present.add(cur(i))
      i += 1
    }
    var m = 0
    while (m < packed.length) {
      val lhs = packed(m); val rhs = packed(m + 1); val merged = packed(m + 2)
      if (present.contains(lhs) && present.contains(rhs)) {
        var r = 0; var w = 0
        var fired = false
        while (r < n) {
          if (r + 1 < n && lhs.equals(cur(r)) && rhs.equals(cur(r + 1))) {
            cur(w) = merged; r += 2; fired = true
          } else {
            cur(w) = cur(r); r += 1
          }
          w += 1
        }
        n = w
        if (fired) present.add(merged)
      }
      m += 3
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = cur(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** `bpe_apply(tokens, merges_flat)`: tokens re-written under the whole
  * merge table. `merges_flat` must be a FOLDABLE literal array
  * [lhs0, rhs0, lhs1, rhs1, …] in rank order — it is packed once per
  * expression instance, not per row. */
case class BpeApply(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  // Analysis-time validation instead of a constructor `require` — a
  // non-literal merge table reaching this expression through the SQL
  // function registry must surface as an AnalysisException, not a raw
  // IllegalArgumentException mid-construction (r8 ADVICE).
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!right.foldable)
      TypeCheckFailure("bpe_apply merge table must be a foldable literal array")
    else if (right.eval(null) == null)
      TypeCheckFailure("bpe_apply merge table must not be null")
    else TypeCheckSuccess
  }

  @transient private lazy val packed: Array[UTF8String] =
    BpeKernel.pack(right.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(toks: Any, mergesIgnored: Any): Any =
    BpeKernel.applyMerges(toks.asInstanceOf[ArrayData], packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpePacked", packed,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, (toks, _) =>
      s"${ev.value} = graft.functions.BpeKernel.applyMerges($toks, $ref);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
