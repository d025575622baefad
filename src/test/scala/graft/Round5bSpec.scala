package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{CorpusStats, Dedup, Sampling, TextOps}

/** Round-5 second batch: substring-span dedup, Bloom blocklist probe,
  * DSIR importance weights, PII scrubbing, source-divergence QA. */
class Round5bSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // --- duplicated spans --------------------------------------------------

  // Docs 1 and 2 share the 6-token run "c1 c2 c3 c4 c5 c6" embedded in
  // otherwise-unique text; doc 3 is all-unique.
  val spanDocs = Seq(
    (1L, "a1 a2 a3 c1 c2 c3 c4 c5 c6 a4 a5 a6"),
    (2L, "b1 b2 c1 c2 c3 c4 c5 c6 b3 b4 b5 b6"),
    (3L, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 d11 d12")
  ).toDF("doc_id", "text")

  test("duplicatedSpans: shared region comes back as ONE maximal span per doc") {
    val spans = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // The shared 6-token run has three duplicated 4-gram starts in each
    // doc; gaps-and-islands merges them into one span of exactly 6 tokens.
    assert(spans == Set((1L, 3L, 6L), (2L, 2L, 6L)))
  }

  test("duplicatedSpans: within-doc repeats count as duplication") {
    val df = Seq((7L, "x1 x2 x3 x4 z1 z2 x1 x2 x3 x4")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((0L, 4L), (6L, 4L)))
  }

  test("duplicatedSpans: interleaved grams with a sub-n gap merge into ONE region") {
    // n=3: doc1 dup starts at 0 ('a b c') and 2 ('c X d') — start 1 is not
    // duplicated, but the covering intervals [0,3) and [2,5) overlap, so
    // the output must be one disjoint region of 5 tokens (not two
    // overlapping rows whose span_len sum overcounts).
    val df = Seq((1L, "a b c X d e f"), (2L, "a b c z c X d"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans.filter(_._1 == 1L) == Set((1L, 0L, 5L)))
  }

  test("duplicatedSpans: hashed keys produce identical spans") {
    val raw = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", n = 4)
      .collect().toSet
    val hashed = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", n = 4,
                                       hashed = true).collect().toSet
    assert(raw == hashed)
  }

  test("duplicatedSpans: docs shorter than n never appear") {
    val df = Seq((1L, "s1 s2"), (2L, "s1 s2")).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(df, "doc_id", "text", n = 4).count() == 0)
  }

  // --- incremental dedup ---------------------------------------------------

  test("incrementalDropIds: all three verdicts fire; base is never dropped") {
    val base = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8"),  // exact copy of base 1
      (11L, "y1 y2 y3 y4 y5 y6 y7 y8"),  // novel
      (12L, "y1 y2 y3 y4 y5 y6 y7 y8"),  // exact copy of fresh 11
      (13L, "x1 x2 x3 x4 x5 x6 x7 zz")   // near-dup of base 2
    ).toDF("doc_id", "text")
    val out = graft.pipeline.Dedup.incrementalDropIds(
        base, fresh, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out.contains((10L, "exact_base")))
    assert(out.contains((12L, "exact_new")))
    assert(out.contains((13L, "near")))
    // Novel fresh doc survives every tier; base ids never appear.
    assert(!out.exists(_._1 == 11L))
    assert(!out.exists(r => r._1 == 1L || r._1 == 2L))
    // The canonical copy of the within-fresh pair survives exact_new.
    assert(!out.contains((11L, "exact_new")))
  }

  test("incrementalDropIdsIndexed: persisted-index probe ≡ recompute path") {
    // Richer corpus than the 3-verdict test: multiple near-dup directions,
    // a fresh-fresh near pair, and docs with no partner at all.
    val base = (1L to 6L).map(i =>
      (i, s"b$i w1 w2 w3 w4 w5 w6 w7")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "b1 w1 w2 w3 w4 w5 w6 w7"),   // exact copy of base 1
      (11L, "n1 n2 n3 n4 n5 n6 n7 n8"),   // novel
      (12L, "n1 n2 n3 n4 n5 n6 n7 n8"),   // exact copy of fresh 11
      (13L, "b2 w1 w2 w3 w4 w5 w6 zz"),   // near-dup of base 2
      (14L, "n1 n2 n3 n4 n5 n6 n7 qq"),   // near-dup of fresh 11
      (15L, "totally unrelated content here about nothing at all")
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_incr_idx").toString
    Seq(Dedup.XxHash, Dedup.PortableMd5).foreach { fam =>
      Dedup.writeIncrementalIndex(base, "doc_id", "text", idx, family = fam)
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val recompute = norm(Dedup.incrementalDropIds(
        base, fresh, "doc_id", "text", threshold = 0.5, family = fam))
      val probed = norm(Dedup.incrementalDropIdsIndexed(
        base, fresh, "doc_id", "text", idx, threshold = 0.5, family = fam))
      assert(probed == recompute, s"family $fam diverged")
      assert(probed.exists(_._2 == "near") && probed.exists(_._2 == "exact_base")
             && probed.exists(_._2 == "exact_new"), s"family $fam: tier missing")
    }
  }

  // --- Bloom probe -------------------------------------------------------

  val bloomCorpus = (0L until 200L).map(i => (i, s"content-$i")).toDF("id", "key")

  test("bloomProbe: no false negatives, FP rate near target") {
    val members = bloomCorpus.filter(col("id") % 10 === 0).select(col("key"))
    val probed = Dedup.bloomProbe(bloomCorpus, "key", members, "key")
      .select(col("id"), col("maybe_member"), col("is_member"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    // Every true member must be caught (Bloom guarantees no false negs).
    assert(probed.filter(_._3).forall(_._2))
    // FPs exist in principle but must be rare (1% target; allow 5x slack).
    val nonMembers = probed.filterNot(_._3)
    val fps = nonMembers.count(_._2)
    assert(fps <= math.max(2, (nonMembers.length * 0.05).toInt),
           s"$fps false positives out of ${nonMembers.length}")
  }

  test("bloomProbe: empty member set matches nothing") {
    val members = bloomCorpus.filter(lit(false)).select(col("key"))
    val probed = Dedup.bloomProbe(bloomCorpus, "key", members, "key")
    assert(probed.filter(col("maybe_member") || col("is_member")).count() == 0)
  }

  test("bloomProbe: explicit mBits is honored and still has no false negatives") {
    val members = bloomCorpus.filter(col("id") < 3).select(col("key"))
    val probed = Dedup.bloomProbe(bloomCorpus, "key", members, "key",
                                  mBits = 64, k = 2)
    assert(probed.filter(col("is_member") && !col("maybe_member")).count() == 0)
  }

  // --- DSIR weights ------------------------------------------------------

  test("dsirLogWeights: target-like docs outrank raw-like docs") {
    // Target docs speak "alpha"; raw docs speak "beta"; one probe doc of
    // each dialect outside the target set.
    val docs = ((0 until 20).map(i => (i.toLong, "alpha" * 1 + s" alpha a$i", i < 10)) ++
      Seq((100L, "alpha alpha alpha", false), (101L, "beta beta beta", false)))
      .toDF("doc_id", "text", "is_tgt")
    val w = Sampling.dsirLogWeights(docs, "doc_id", "text", col("is_tgt"),
                                    buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(100L) > w(101L),
           s"alpha-dialect doc should outweigh beta-dialect: $w")
  }

  test("dsirLogWeights: weight sums are deterministic across partitionings") {
    val docs = (0 until 50).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 3} tok${i % 11} filler$i", i % 5 == 0))
      .toDF("doc_id", "text", "is_tgt")
    val a = Sampling.dsirLogWeights(docs, "doc_id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = Sampling.dsirLogWeights(docs.repartition(7), "doc_id", "text",
                                    col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  // --- temperature sampling ------------------------------------------------

  test("temperatureSample: tail groups keep everything, head downsamples") {
    val docs = ((0 until 900).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "small"))).toDF("id", "grp")
    val kept = graft.pipeline.Sampling.temperatureSample(docs, "id", "grp",
                                                         alpha = 0.5)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // q ∝ sqrt(n): small keeps min(1, (10/40)·1000/100) > 1 -> all 100;
    // big keeps (30/40)·1000/900 = 5/6 of its rows in expectation.
    assert(kept("small") == 100L)
    assert(kept("big") < 900L && kept("big") > 600L)
  }

  test("empty-corpus guards: temperature/dsir/zipf return empty, not NPE") {
    val empty = Seq.empty[(Long, String, String)].toDF("id", "text", "grp")
    assert(graft.pipeline.Sampling.temperatureSample(empty, "id", "grp")
      .count() == 0)
    assert(graft.pipeline.Sampling.dsirLogWeights(empty, "id", "text",
      col("grp") === "t").count() == 0)
    assert(CorpusStats.zipfSlope(empty, "text").count() == 0)
  }

  test("temperatureSample: alpha = 1 is proportional (keeps everything)") {
    val docs = ((0 until 90).map(i => (i.toLong, "a")) ++
      (100 until 110).map(i => (i.toLong, "b"))).toDF("id", "grp")
    // q_i·N/n_i = (n_i/N)·N/n_i = 1 for every group.
    assert(graft.pipeline.Sampling.temperatureSample(docs, "id", "grp",
             alpha = 1.0).count() == 100)
  }

  // --- PII scrubbing -----------------------------------------------------

  test("scrub: default PII rules redact emails, IPs, phone shapes in order") {
    val docs = Seq(
      (1L, "contact bob@example.com or 10.0.0.1 or +1 (415) 555-0199 now"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = TextOps.scrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._1 == "contact <EMAIL> or <IP> or +<PHONE> now")
    assert(out(1L)._2 == 3L)
    assert(out(2L) == ("no pii here at all", 0L))
  }

  test("scrub: rule order is semantic (IP before digit-run)") {
    val docs = Seq((1L, "ip 10.0.0.1 acct 12345678")).toDF("doc_id", "text")
    val out = TextOps.scrub(docs, "doc_id", "text",
      rules = Seq("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}" -> "<IP>",
                  "[0-9]{5,}" -> "<NUM>")).collect()(0)
    assert(out.getString(1) == "ip <IP> acct <NUM>")
    assert(out.getLong(2) == 2L)
  }

  // --- source divergence -------------------------------------------------

  test("sourceDivergence: corpus-identical group scores ~0, skewed group is positive") {
    val docs = (Seq.fill(10)("w1 w2 w3 w4").zipWithIndex.map { case (t, i) =>
      (s"balanced", t + s"")
    } ++ Seq.fill(10)(("skewed", "w1 w1 w1 w1"))).toDF("source", "text")
    val kl = CorpusStats.sourceDivergence(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl("skewed") > kl("balanced"))
    assert(kl("skewed") > 0.1)
    assert(kl("balanced") >= 0.0) // KL is non-negative
  }

  // --- span redaction ------------------------------------------------------

  test("redactSpans: duplicated region removed everywhere, remainder intact") {
    val out = Dedup.redactSpans(spanDocs, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("a1 a2 a3 a4 a5 a6", 6L))
    assert(out(2L) == ("b1 b2 b3 b4 b5 b6", 6L))
    assert(out(3L)._2 == 0L) // unique doc untouched
  }

  test("redactSpans: fully-duplicated doc comes back empty, not missing") {
    val df = Seq((1L, "p1 p2 p3 p4"), (2L, "p1 p2 p3 p4")).toDF("doc_id", "text")
    val out = Dedup.redactSpans(df, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ("", 4L), 2L -> ("", 4L)))
  }

  // --- ANN recall ----------------------------------------------------------

  test("annRecall: identical results give recall 1, disjoint give 0") {
    val t = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("qid", "nid")
    val same = graft.pipeline.Similarity.annRecall(t, t)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(same == Map(1L -> 1.0, 2L -> 1.0))
    val miss = Seq((1L, 99L), (2L, 98L)).toDF("qid", "nid")
    val zero = graft.pipeline.Similarity.annRecall(t, miss)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(zero == Map(1L -> 0.0, 2L -> 0.0))
  }

  test("annRecall: lsh recall over testdata is sane and brute self-recall is 1") {
    val emb = graft.score.Embeddings.fromParquet(
      spark, "/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("id") < 5)
    val truth = graft.pipeline.Similarity.bruteTopK(emb, q, 5)
    val r = graft.pipeline.Similarity.annRecall(truth, truth)
      .agg(min("recall")).collect()(0).getDouble(0)
    assert(r == 1.0)
  }

  // --- label outliers ------------------------------------------------------

  test("labelOutliers: the planted far vector ranks as the label's worst") {
    val good = (0 until 8).map(i => (i.toLong, 0, Seq(1.0, 0.1 * i, 0.0)))
    val bad = Seq((99L, 0, Seq(-1.0, 0.0, 0.0))) // anti-aligned outlier
    val emb = (good ++ bad).toDF("id", "label", "vec")
    val out = graft.pipeline.Similarity.labelOutliers(emb, k = 1)
      .collect()(0)
    assert(out.getLong(0) == 99L && out.getInt(3) == 1)
  }

  // --- Stupid Backoff bigram LM ---------------------------------------------

  test("bigramLogProb: seen bigrams score c(xy)/c(x); unseen back off") {
    val model = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // model: uni a=3,b=2,c=1 (N=6); bigrams: "a b"=2, "b a"=1, "a c"=1
    val probe = Seq((10L, "a b"),   // seen: ln(2/3)
                    (11L, "b c"),   // unseen bigram, seen y: ln(0.4·1/6)
                    (12L, "a z")    // unseen bigram, OOV y: ln(0.4·0.5/6)
      ).toDF("doc_id", "text")
    val out = graft.pipeline.CorpusStats.bigramLogProb(
        probe, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(10L) == r6(math.log(2.0 / 3.0)))
    assert(out(11L) == r6(math.log(0.4 * 1.0 / 6.0)))
    assert(out(12L) == r6(math.log(0.4 * 0.5 / 6.0)))
  }

  test("bigramLogProb: held-out docs score below in-model docs on average") {
    val docs = graft.model.KG.table(spark, "/root/testdata/sf0.001", "documents")
    val model = graft.pipeline.Sampling.hashSample(docs, "doc_id", 0.75)
    val scored = graft.pipeline.CorpusStats.bigramLogProb(
        docs, model, "doc_id", "text")
      .join(model.select(col("doc_id").as("id"), lit(true).as("in_model")),
            Seq("id"), "left")
    val avg = scored.groupBy(coalesce(col("in_model"), lit(false)).as("m"))
      .agg(org.apache.spark.sql.functions.avg("avg_logs").as("a"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false),
           s"in-model docs should score higher: $avg")
  }

  // --- linear quality classifier --------------------------------------------

  test("linearQualityScore: scores in (0,1), keep iff > 0.5, deterministic") {
    val docs = Seq((1L, "a b c d"), (2L, "e f g h"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val out = TextOps.linearQualityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    out.values.foreach { case (s, k) =>
      assert(s > 0.0 && s < 1.0)
      assert(k == (s > 0.5))
    }
    assert(out(1L) == out(3L)) // same text, same score
  }

  // --- langid eval / length profile ---------------------------------------

  test("langIdEval: confusion diagonal dominates on marker-bearing text") {
    val docs = Seq(
      ("en", "the cat and the dog of the house"),
      ("en", "a list of things to do in the morning"),
      ("de", "der hund und die katze ist nicht da"),
      ("fr", "le chat et la maison est une idee"),
      ("xx", "q9 z7 k3")) // no markers anywhere -> und
      .toDF("lang", "text")
    val m = graft.pipeline.TextOps.langIdEval(docs, "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("en", "en")) == 2L)
    assert(m(("de", "de")) == 1L)
    assert(m(("fr", "fr")) == 1L)
    assert(m(("xx", "und")) == 1L)
  }

  test("lengthProfile: percentiles bracket the group's lengths") {
    val docs = (1 to 100).map(i =>
      ("g", Seq.fill(i)("w").mkString(" "))).toDF("source", "text")
    val r = CorpusStats.lengthProfile(docs, "source", "text").collect()(0)
    assert(r.getLong(1) == 100L)
    val (p50, p90, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(p50 == 50.5 && p90 == 90.1 && p99 == 99.01)
  }

  // --- Zipf slope ----------------------------------------------------------

  test("zipfSlope: synthetic 1/r corpus recovers slope ~ -1") {
    // token t_r appears round(1000/r) times: ln c = ln 1000 - ln r.
    val rows = (1 to 50).flatMap(r =>
      Seq.fill(math.max(1000 / r, 1))(s"t$r%02d"))
    val docs = rows.grouped(100).map(_.mkString(" ")).toSeq.toDF("text")
    val out = CorpusStats.zipfSlope(docs, "text", topN = 50).collect()(0)
    val slope = out.getDouble(1)
    assert(math.abs(slope + 1.0) < 0.05, s"slope $slope should be ~ -1")
  }

  // --- triangles / funnel ---------------------------------------------------

  test("triangleCount: K4 has 4, square+diagonal has 2, orientation-proof") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("src", "dst")
    assert(graft.exec.GraphOps.triangleCount(k4).collect()(0).getLong(0) == 4L)
    // Square 1-2-3-4 plus diagonal 1-3: triangles (1,2,3) and (1,3,4).
    // Reversed/duplicated edges must not change the count.
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
                 (3L, 1L), (2L, 1L)).toDF("src", "dst")
    assert(graft.exec.GraphOps.triangleCount(sq).collect()(0).getLong(0) == 2L)
  }

  test("funnel: converts only within the window, counts users once") {
    def ev(id: Long, t: Long, u: Long, ty: String) =
      (id, new java.sql.Timestamp(t * 1000), u, ty, 1.0)
    val events = Seq(
      ev(1, 100, 1, "click"), ev(2, 400, 1, "purchase"),  // in window
      ev(3, 100, 2, "click"), ev(4, 800, 2, "purchase"),  // too late
      ev(5, 100, 3, "click"), ev(6, 50, 3, "purchase"),   // before click
      ev(7, 100, 4, "click"), ev(8, 150, 4, "purchase"),  // in window
      ev(9, 120, 4, "purchase"),                          // second conv, same user
      ev(10, 100, 5, "purchase")                          // never clicked
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.streaming.EventStreams.funnel(events, windowSec = 600)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (4L, 2L))
    assert(r.getDouble(2) == 0.5)
  }

  test("funnel: zero fromType users gives rate 0.0, not NULL") {
    val events = Seq(
      (1L, new java.sql.Timestamp(100000L), 1L, "purchase", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.streaming.EventStreams.funnel(events, windowSec = 600)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (0L, 0L))
    assert(!r.isNullAt(2) && r.getDouble(2) == 0.0)
  }

  test("temperatureSample: NULL-group rows participate as their own group") {
    import graft.pipeline.Sampling
    val df = (1L to 300L).map(i =>
      (i, if (i <= 280) "big" else null)).toDF("id", "g")
    val out = Sampling.temperatureSample(df, "id", "g", alpha = 0.5)
    // The tiny NULL group's flattened share saturates at keep-all: all 20
    // unlabeled rows survive instead of silently vanishing.
    assert(out.filter(col("g").isNull).count() == 20)
    assert(out.count() > 20) // and the big group still contributes rows
  }

  // --- streaming dedup batch twin -----------------------------------------

  test("dedupBatch: doubled input collapses to distinct event ids") {
    val ev = Seq((1L, "click", 1.0), (2L, "view", 2.0), (3L, "click", 3.0))
      .toDF("event_id", "event_type", "value")
    val out = graft.streaming.EventStreams.dedupBatch(ev.unionAll(ev))
    assert(out.count() == 3)
    assert(out.agg(sum("value")).collect()(0).getDouble(0) == 6.0)
  }
}
