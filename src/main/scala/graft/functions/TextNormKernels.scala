package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-normalization kernels — the standard pre-dedup /
  * pre-tokenization stage of a training-data pipeline (CCNet/C4-style
  * cleaning): canonical composition (NFC) and accent folding
  * (NFD + strip combining marks, the closed form of DuckDB's
  * `strip_accents`, exact-equal on Latin/Greek — property-checked in
  * FunctionsSpec). Native Catalyst expressions whose codegen is a single
  * static call, so they stay inside whole-stage codegen like any
  * built-in string function; no UDF registry, no Row boxing. */
object TextNorm {
  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  def stripAccents(s: UTF8String): UTF8String = {
    if (s == null) return null
    val nfd = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Canonical NFC normalization (Unicode UAX #15) of a string column. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextNorm.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Accent folding: NFD decomposition with all combining marks removed
  * (é → e, ü → u; base letters, including non-Latin scripts, pass
  * through). Matches DuckDB `strip_accents` on Latin/Greek exactly. */
case class StripAccents(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextNorm.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.stripAccents($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
