package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{CorpusStats, Similarity, TextOps}

/** Round-5 operators: winnowing fingerprints, PMI collocations,
  * hard-negative mining, kNN classification, label centroids. */
class Round5Spec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // --- winnowing ---------------------------------------------------------

  val winDocs = Seq(
    (1L, "a b c d e f g h i j k l m n o p"),
    (2L, "z y x w v a b c d e f g h i q r"), // shares "a b c d e f g h"
    (3L, "q q q q q q q q")                  // all-identical k-grams
  ).toDF("doc_id", "text")

  test("winnow: shared run >= w+k-1 tokens yields a shared fingerprint") {
    val fp = TextOps.winnow(winDocs, "doc_id", "text", k = 4, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Docs 1 and 2 share an 8-token run = w+k-1 = 7 guaranteed window.
    val h1 = fp.collect { case (1L, h) => h }
    val h2 = fp.collect { case (2L, h) => h }
    assert((h1 & h2).nonEmpty, "winnowing guarantee violated")
  }

  test("winnow: selects ~2/(w+1) of hashes and dedups identical grams") {
    val fp = TextOps.winnow(winDocs, "doc_id", "text", k = 4, w = 4)
    val perDoc = fp.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 13 k-grams in doc 1, window 4 -> far fewer selections than grams.
    assert(perDoc(1L) <= 7)
    // Doc 3: every k-gram identical -> ONE distinct (hash stays, positions
    // differ only when the window slides past; leftmost-min keeps pos 0
    // until the frame no longer contains it).
    assert(perDoc(3L) <= 2)
  }

  test("winnow: doc shorter than a window still emits one fingerprint") {
    val tiny = Seq((9L, "only three tokens")).toDF("doc_id", "text")
    val fp = TextOps.winnow(tiny, "doc_id", "text", k = 4, w = 4).collect()
    assert(fp.length == 1 && fp(0).getLong(2) == 0L)
  }

  test("winnow matches a plain-Scala reference implementation on random docs") {
    def ref(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val toks = text.split(" ")
      val grams =
        if (toks.length >= k) toks.sliding(k).map(_.mkString(" ")).toVector
        else Vector(toks.mkString(" "))
      val hashes = grams.map { g =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8"))
        java.lang.Long.parseLong(md.take(5).map("%02x".format(_)).mkString, 16)
      }
      val m = hashes.length
      (0 to math.max(m - w, 0)).map { i =>
        hashes.zipWithIndex.slice(i, math.min(i + w, m))
          .minBy { case (h, p) => (h, p) } // leftmost minimum
      }.map { case (h, p) => (h, p.toLong) }.toSet
    }
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "dd", "ee", "ff", "gg", "hh")
    val docs = (0 until 25).map(i => (i.toLong,
      Vector.fill(rnd.nextInt(30) + 1)(words(rnd.nextInt(words.size)))
        .mkString(" ")))
    val got = TextOps.winnow(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = docs.flatMap { case (id, t) =>
      ref(t, 3, 4).map { case (h, p) => (id, h, p) } }.toSet
    assert(got == want)
  }

  test("winnowPairs: near-dups pair, unrelated docs do not; cap drops hot fps") {
    import graft.pipeline.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight again"),
      (2L, "the quick brown fox jumps over the lazy dog tonight again"),
      (3L, "completely different words entirely unrelated to anything else here"),
      (4L, "another disjoint document with its own private vocabulary set")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // A df cap of 1 drops every shared fingerprint -> no pairs survive.
    val capped = Dedup.winnowPairs(docs, "doc_id", "text", minShared = 1,
                                   maxDocFreq = 1)
    assert(capped.count() == 0)
  }

  // --- PMI ---------------------------------------------------------------

  test("pmiTopK: perfectly-associated pair outranks independent pair") {
    // "alpha beta" always co-occur; "x"/"y" occur widely and independently.
    val docs = (0 until 30).map { i =>
      (i.toLong, if (i % 2 == 0) "alpha beta x y x y x y" else "x y y x x y")
    }.toDF("doc_id", "text")
    val top = CorpusStats.pmiTopK(docs, "doc_id", "text", k = 5, minCount = 5)
      .collect()
    assert(top.head.getString(0) == "alpha beta")
    // rank is dense 1..k and pmi is non-increasing
    val pmis = top.map(_.getDouble(2))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    assert(top.map(_.getInt(3)).toSeq == (1 to top.length))
  }

  test("pmiTopK: empty and single-token corpora yield empty results") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CorpusStats.pmiTopK(empty, "doc_id", "text").count() == 0)
    val singles = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
    assert(CorpusStats.pmiTopK(singles, "doc_id", "text").count() == 0)
  }

  test("pmiTopK: bigrams below minCount are dropped") {
    val docs = Seq((1L, "rare pair common common common common"),
                   (2L, "common common common common common common"))
      .toDF("doc_id", "text")
    val top = CorpusStats.pmiTopK(docs, "doc_id", "text", k = 10, minCount = 3)
    assert(!top.collect().exists(_.getString(0) == "rare pair"))
  }

  // --- embedding ops -----------------------------------------------------

  // Two well-separated clusters: label 0 near e1, label 1 near e2.
  val emb = (0 until 20).map { i =>
    val lab = i % 2
    val base = if (lab == 0) Seq(1.0, 0.0, 0.1) else Seq(0.0, 1.0, 0.1)
    (i.toLong, base.map(_ + i * 1e-4), lab)
  }.toDF("id", "vec", "label")

  test("hardNegatives: all neighbors have a different label, ranked by cos") {
    val hn = Similarity.hardNegatives(emb, emb.filter(col("id") < 4), k = 3)
      .collect()
    assert(hn.nonEmpty)
    assert(hn.forall(r => r.getInt(1) != r.getInt(3)), "same-label negative")
    val byQ = hn.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length == 3))
    byQ.values.foreach { rows =>
      val cs = rows.sortBy(_.getInt(4)).map(_.getDouble(5))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("knnClassify: separated clusters classify perfectly") {
    val pred = Similarity.knnClassify(emb, emb, k = 5).collect()
    assert(pred.length == 20)
    assert(pred.forall(r => r.getInt(1) == r.getInt(2)))
  }

  // --- pipeline facade ---------------------------------------------------

  test("GraftPipeline facade: corpus + vectors surfaces compose") {
    val c = GraftPipeline.corpus(winDocs)
    assert(c.stats().columns.toSeq ==
      Seq("id", "n_tokens", "n_chars", "lang_pred"))
    assert(c.quality().count() == 3)
    assert(c.filterCascade().columns.contains("keep"))
    val clean = c.cleanIds().collect().map(_.getLong(0)).toSet
    assert(clean.subsetOf(Set(1L, 2L, 3L)) && clean.nonEmpty)
    val v = GraftPipeline.vectors(emb)
    assert(v.classify(emb.filter(col("id") < 4)).count() == 4)
    assert(v.labelCentroids().count() == 6) // 2 labels x 3 dims
  }

  test("labelCentroids: long-form means match hand computation") {
    val two = Seq((1L, Seq(1.0, 3.0), 7), (2L, Seq(3.0, 5.0), 7),
                  (3L, Seq(10.0, 20.0), 8)).toDF("id", "vec", "label")
    val c = Similarity.labelCentroids(two).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getDouble(2), r.getLong(3))))
      .toMap
    assert(c((7, 0L)) == ((2.0, 2L)) && c((7, 1L)) == ((4.0, 2L)))
    assert(c((8, 0L)) == ((10.0, 1L)) && c((8, 1L)) == ((20.0, 1L)))
  }
}
