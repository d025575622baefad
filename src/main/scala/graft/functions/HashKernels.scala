package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 60-bit md5-prefix hash — the native kernel behind
  * [[PortableHash.md5Prefix60]].
  *
  * Semantically identical to `conv(substring(md5(s), 1, 15), 16, 10)` (the
  * first 15 hex chars of md5 as a non-negative BIGINT) but computed straight
  * from the digest bytes: no 32-char hex string materialized per row, no
  * substring copy, no base-16 string parse. The portable-hash family is on
  * the hot path of every dedup/sampling/split operator (one-to-many hashes
  * per row), so the string round-trip was measurable — see NOTES round-3
  * candidate #2. Runs inside whole-stage codegen via a static call. */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(s: Any): Any =
    Md5Prefix60.hash(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object Md5Prefix60 {
  // MessageDigest is stateful; one instance per executor thread (digest()
  // resets it after each use).
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 over the UTF-8 bytes, as a non-negative long:
    * bytes 0..6 in full (56 bits) then the high nibble of byte 7 — exactly
    * the value of the first 15 hex chars. */
  def hash(s: UTF8String): Long = {
    val d = md5.get().digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
}
