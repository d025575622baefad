package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("asOf picks the latest right row at or before each left ts") {
    val clicks = Seq((1L, 100L, 10L), (1L, 250L, 11L), (2L, 50L, 12L))
      .toDF("user_id", "ts", "click_id")
    val purchases = Seq((1L, 100L, 90L), (1L, 200L, 91L), (2L, 60L, 92L))
      .toDF("user_id", "ts", "purchase_id")
    val out = Joins.asOf(clicks, purchases, Seq("user_id"), "ts",
      Seq("purchase_id"))
      .select("click_id", "purchase_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // click 10 @100 matches purchase 90 @100 (>=); click 11 @250 -> 91 @200;
    // click 12 @50 has no prior purchase -> dropped (inner)
    assert(out == Map(10L -> 90L, 11L -> 91L))
  }

  test("rangeBucketed equals the naive inequality join") {
    val rnd = new scala.util.Random(9)
    val left = Seq.tabulate(200)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = Seq.tabulate(200)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, (1000 + i).toLong))
      .toDF("k", "ts", "rid")
    val fast = Joins.rangeBucketed(left, right, Seq("k"), "ts", "ts",
      lower = 30L, upper = 20L, Seq("rid"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.ts" >= $"l.ts" - 30 && $"r.ts" <= $"l.ts" + 20)
      .select($"l.lid", $"r.rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive && naive.nonEmpty)
  }

  test("rangeBucketed: exact at negative and ns-epoch-magnitude timestamps") {
    // Negative ts exercises floor (truncating division mis-bucketed these);
    // the ~1.7e18 block exercises magnitudes where double division loses
    // integer precision (2^60 has a 256-unit double ulp).
    val base = 1700000000000000000L
    val rnd = new scala.util.Random(7)
    def rows(idBase: Long) = Seq.tabulate(150) { i =>
      val block = i % 3 match {
        case 0 => rnd.nextInt(2000).toLong - 1000L // straddles zero
        case 1 => base + rnd.nextInt(2000)         // ns-epoch magnitude
        case _ => rnd.nextInt(500).toLong
      }
      (rnd.nextInt(3).toLong, block, idBase + i)
    }
    val left = rows(0).toDF("k", "ts", "lid")
    val right = rows(10000).toDF("k", "ts", "rid")
    val fast = Joins.rangeBucketed(left, right, Seq("k"), "ts", "ts",
      lower = 700L, upper = 0L, Seq("rid"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.ts" >= $"l.ts" - 700 && $"r.ts" <= $"l.ts")
      .select($"l.lid", $"r.rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive && naive.nonEmpty)
  }

  test("salted join equals the plain join") {
    val probe = Seq.tabulate(300)(i => (i % 3L, i.toLong)).toDF("k", "pid")
    val build = Seq((0L, "a"), (1L, "b"), (2L, "c"), (2L, "c2")).toDF("k", "v")
    val fast = Joins.salted(probe, build, Seq("k"), "pid", salts = 4)
      .select("pid", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = probe.join(build, "k")
      .select("pid", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fast == plain && plain.size == 400)
  }
}
