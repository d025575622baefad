package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Dedup

/** Property check: Dedup.duplicatedSpans against a brute-force plain-Scala
  * model on random small corpora — the model-checker pattern used for the
  * EFO-1 evaluator (HardExecSpec). A tiny vocabulary forces heavy n-gram
  * collision, exercising merge, within-doc repeats, and cross-doc overlap
  * far more densely than the synthetic corpus does. */
class SpanPropertySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** Brute force: mark every duplicated n-gram's covered interval
    * [p, p+n), union overlapping/touching intervals per doc. */
  private def bruteSpans(docs: Seq[(Long, String)], n: Int)
      : Set[(Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, text) =>
      val ts = text.split(" ")
      if (ts.length < n) Seq.empty
      else (0 to ts.length - n).map(p => (id, p, ts.slice(p, p + n).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val dupPos = grams.filter(g => counts(g._3) > 1)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    dupPos.flatMap { case (id, ps) =>
      // union of [p, p+n) intervals: merge while the gap between starts
      // is at most n (overlap or touch)
      val runs = ps.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p - e <= n => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      runs.map { case (s, e) => (id, s.toLong, (e - s + n).toLong) }
    }.toSet
  }

  test("duplicatedSpans equals the brute-force model on 30 random corpora") {
    val rnd = new scala.util.Random(421)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 30) {
      val nDocs = 2 + rnd.nextInt(4)
      val n = 2 + rnd.nextInt(2) // n-gram length 2..3
      val docs = (1L to nDocs).map { id =>
        val len = 1 + rnd.nextInt(12)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val expected = bruteSpans(docs, n)
      val got = Dedup.duplicatedSpans(docs.toDF("doc_id", "text"),
                                      "doc_id", "text", n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected,
             s"trial $trial (n=$n) mismatch on corpus $docs")
    }
  }
}
