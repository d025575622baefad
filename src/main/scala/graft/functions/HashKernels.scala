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

/** Fused packed-bitset Bloom membership probe — the native kernel behind
  * [[graft.pipeline.Dedup.bloomProbe]] above its size threshold.
  *
  * Semantically identical to the portable column form
  * `AND_j array_contains(setBitPositions, pmod(md5Prefix60('bloom<j>|' ⧺ key), m))`
  * but evaluated as k digest+bit-test probes against an m-bit bitset packed
  * into `long[]`: no per-row position array scan (the portable form is
  * O(k·|setBits|) per row — fine for blocklist-sized filters, wrong shape
  * for a saturated multi-MB filter where |setBits| ≈ m/2), no hex-string
  * round trip, short-circuit on the first cleared bit. The filter words
  * ship once per expression instance via the codegen reference array, so a
  * broadcast-sized filter is shared by every row of a task, and the hash
  * is the engine's portable md5-prefix family — the DuckDB oracle rebuilds
  * the identical filter from the member set. Runs inside whole-stage
  * codegen via a static call. (Interpreted/fallback eval serializes the
  * words array with the expression tree per task — acceptable for the
  * broadcast-sized filters the bloomProbe contract allows; equality is
  * by filter CONTENT, see equals below, so identical probes canonicalize
  * and plan-level reuse works.) */
case class BloomBitsetProbe(child: Expression, words: Array[Long],
                            mBits: Long, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(mBits > 0 && words.length.toLong == (mBits + 63) / 64,
    s"bitset word count ${words.length} does not cover $mBits bits")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  // one prefix byte-array per hash index: md5 over (prefix ⧺ key bytes)
  // equals md5 of the concatenated string, so the two forms hash alike
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(j =>
      s"bloom$j|".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override protected def nullSafeEval(s: Any): Any =
    BloomBitsetProbe.probe(s.asInstanceOf[UTF8String], words, mBits, prefixes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    val p = ctx.addReferenceObj("bloomPrefixes", prefixes, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomBitsetProbe.probe($c, $w, ${mBits}L, $p)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)

  // The synthesized case-class equality on an Array field is reference
  // identity, which would make two identical probes never semanticEquals —
  // defeating canonicalization/subexpression elimination for any plan that
  // probes the same filter twice (round-16 advice). Compare by content:
  // the filter IS (words, mBits, k).
  override def equals(o: Any): Boolean = o match {
    case b: BloomBitsetProbe =>
      mBits == b.mBits && k == b.k && child == b.child &&
        java.util.Arrays.equals(words, b.words)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Long.box(mBits), Int.box(k),
      Int.box(if (words.length == 0) 0
              else java.lang.Long.hashCode(words(0) ^ words.length)))
}

object BloomBitsetProbe {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** k-fold probe: for each prefix, position = md5Prefix60(prefix ⧺ key)
    * mod m (the 60-bit value is non-negative, so % ≡ pmod), then test bit
    * position p at word p/64, bit p%64. False as soon as any bit is clear. */
  def probe(s: UTF8String, words: Array[Long], m: Long,
            prefixes: Array[Array[Byte]]): Boolean = {
    val keyBytes = s.getBytes
    var j = 0
    while (j < prefixes.length) {
      val md = md5.get()
      md.update(prefixes(j)); md.update(keyBytes)
      val d = md.digest()
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v = (v << 4) | ((d(7) >> 4) & 0xfL)
      val pos = v % m
      if (((words((pos >> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 0L)
        return false
      j += 1
    }
    true
  }

  /** Pack sorted set-bit positions (each in [0, m)) into the probe's
    * little-endian-within-word `long[]` bitset. */
  def pack(setBits: Array[Long], m: Long): Array[Long] = {
    val words = new Array[Long](((m + 63) / 64).toInt)
    var i = 0
    while (i < setBits.length) {
      val p = setBits(i)
      words((p >> 6).toInt) |= 1L << (p & 63L).toInt
      i += 1
    }
    words
  }
}
