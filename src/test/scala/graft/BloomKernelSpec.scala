package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** The packed-bitset Bloom probe kernel vs the portable array_contains
  * formulation: same hash family, same filter, bit-for-bit the same
  * answers — plus the saturated-filter scale shape (1M members) the
  * native kernel exists for. */
class BloomKernelSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("native bitset probe ≡ portable array_contains probe") {
    val members = (0 until 500).map(i => s"member_$i").toDF("mk")
    val corpus = ((0 until 500 by 7).map(i => s"member_$i") ++
      (0 until 800).map(i => s"other_$i")).toDF("key")
    // build one filter, probe it both ways over the same corpus
    val m = 64L * 75 // 4800 bits, ~10% load with k=3
    val setBits = members
      .select(explode(array((0 until 3).map(j =>
        Dedup.bloomPosition(col("mk"), j, m)): _*)).as("p"))
      .distinct().collect().map(_.getLong(0)).sorted
    val out = corpus.select(
      Dedup.bloomMaybeColumn(col("key"), setBits, m, 3, native = true)
        .as("nat"),
      Dedup.bloomMaybeColumn(col("key"), setBits, m, 3, native = false)
        .as("port"),
      col("key"))
      .collect()
    assert(out.length == 872)
    out.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1),
      s"probe forms disagree on ${r.getString(2)}"))
    // every true member answers true in both forms (no false negatives)
    val names = out.filter(_.getString(2).startsWith("member_"))
    assert(names.nonEmpty && names.forall(_.getBoolean(0)))
  }

  test("bitset packing covers every position and nothing else") {
    val m = 256L
    val bits = Array(0L, 1L, 63L, 64L, 127L, 200L, 255L)
    val words = graft.functions.BloomBitsetProbe.pack(bits, m)
    assert(words.length == 4)
    val set = (0L until m).filter(p =>
      ((words((p >> 6).toInt) >>> (p & 63L).toInt) & 1L) == 1L)
    assert(set == bits.toSeq)
  }

  test("bloomProbe end-to-end at 1M members routes to the native kernel") {
    // 1M members at the 1% default sizes the filter to ~9.6M bits —
    // far above nativeBitsetThresholdBits, so this is the saturated
    // shape the kernel exists for; the portable O(k·|setBits|) probe
    // would scan a ~290k-element position array per hash per row.
    val n = 1000000
    val members = spark.range(n).select(
      concat(lit("k"), col("id").cast("string")).as("mk"))
    val corpus = spark.range(2000).select(
      when(col("id") % 2 === 0,
        concat(lit("k"), (col("id") * 499).cast("string")))
        .otherwise(concat(lit("miss_"), col("id").cast("string")))
        .as("digest"))
    val probed = Dedup.bloomProbe(corpus, "digest", members, "mk")
      .select(col("digest"), col("maybe_member"), col("is_member"))
      .collect()
    assert(probed.length == 2000)
    // no false negatives: every exact member answers maybe = true
    probed.filter(_.getBoolean(2)).foreach(r =>
      assert(r.getBoolean(1), s"false negative on ${r.getString(0)}"))
    // the false-positive rate over the 1000 non-members is near the 1%
    // target (generous bound — this is a correctness probe, not a tuner)
    val nonMembers = probed.filter(!_.getBoolean(2))
    val fp = nonMembers.count(_.getBoolean(1))
    assert(fp.toDouble / nonMembers.length < 0.05,
      s"$fp false positives over ${nonMembers.length} non-members")
    // Plan-routing is asserted in the explicit-mBits test below — NOT
    // here: stringifying this plan renders is_member's isin over the 1M
    // collected member literals (~10 MB of plan text, slow analysis) and
    // measures the fixture, not the kernel (round-16 advice).
  }

  test("the default AUTO-sizing routes large member sets to the native kernel") {
    // 28k members at the 1% default sizes the filter to ~268k bits —
    // just over the 2^18 threshold through the auto-sizing arithmetic
    // itself (round-17 review #7: the explicit-mBits test alone can't
    // catch a sizing regression). The plan string carries the 28k-
    // literal isin (~300 KB) — bounded, unlike the 1M fixture.
    val members = spark.range(28000).select(
      concat(lit("am"), col("id").cast("string")).as("mk"))
    val corpus = (0 until 50).map(i => s"am$i").toDF("digest")
    val plan = Dedup.bloomProbe(corpus, "digest", members, "mk")
      .queryExecution.analyzed.toString.toLowerCase
    assert(plan.contains("bloombitsetprobe"))
  }

  test("filters sized above the bitset threshold route to the native kernel") {
    // A tiny member set with an EXPLICIT mBits just over the threshold:
    // routing is decided by filter size alone, so this pins the native
    // path without a megabyte plan string.
    val members = (0 until 200).map(i => s"m$i").toDF("mk")
    val corpus = (0 until 100).map(i => s"m$i").toDF("digest")
    val plan = Dedup.bloomProbe(corpus, "digest", members, "mk",
        mBits = (Dedup.nativeBitsetThresholdBits + 64).toInt)
      .queryExecution.analyzed.toString.toLowerCase
    assert(plan.contains("bloombitsetprobe"))
    assert(!plan.contains("array_contains"))
  }

  test("probe expressions over the same filter are equal by content") {
    // Content equality (not Array reference identity) is what lets two
    // probes of one filter canonicalize for subexpression elimination.
    // plain Catalyst literal child: pre-analysis Column-node wrappers
    // carry per-call-site origins, so content equality is what the
    // ANALYZED plan relies on (resolved children compare structurally)
    val child = org.apache.spark.sql.catalyst.expressions.Literal
      .create("x", org.apache.spark.sql.types.StringType)
    val bits = Array(3L, 64L, 127L)
    val m = 256L
    def mk() = graft.functions.BloomBitsetProbe(
      child, graft.functions.BloomBitsetProbe.pack(bits, m), m, 3)
    val (a, b) = (mk(), mk())
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    val c = graft.functions.BloomBitsetProbe(
      child, graft.functions.BloomBitsetProbe.pack(Array(3L, 64L), m), m, 3)
    assert(a != c)
  }

  test("small blocklist filters keep the portable plan") {
    val members = (0 until 50).map(i => s"m$i").toDF("mk")
    val corpus = (0 until 100).map(i => s"m$i").toDF("digest")
    val plan = Dedup.bloomProbe(corpus, "digest", members, "mk")
      .queryExecution.analyzed.toString.toLowerCase
    assert(plan.contains("array_contains"))
    assert(!plan.contains("bloombitsetprobe"))
  }
}
