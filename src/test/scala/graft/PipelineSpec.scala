package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Similarity, Sketch, TextOps}
import graft.score.Embeddings

class PipelineSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),   // near dup of 1
    (4L, "completely different content about spark engines here today"),
    (5L, "a b c")
  ).toDF("doc_id", "text")

  test("exactGroups collapses identical texts to min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length == 4)
    val dup = g.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L) // keep_id = min
    val drops = Dedup.exactDropIds(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(drops == Set(2L))
  }

  test("jaccardPairs finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical: jaccard 1.0
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccardPairs maxDocFreq caps hot shingles: boilerplate-only pairs " +
       "drop, true dups survive with exact jaccard over survivors") {
    // 10 distinct docs + 1 exact dup of doc 1, all sharing a boilerplate
    // tail that contributes 4 hot shingles (df = 11).
    val boiler = "subscribe to our newsletter today please"
    val corpus = ((1 to 10).map(i =>
      (i.toLong, s"unique$i words$i content$i $boiler")) :+
      ((11L, s"unique1 words1 content1 $boiler"))).toDF("doc_id", "text")
    // Uncapped: every pair shares the 4 boilerplate shingles
    // (jaccard 4/10 = 0.4) -> all 55 pairs report as near-dups.
    assert(Dedup.jaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.4).count() == 55)
    // Capped at df <= 5: boilerplate shingles drop; only the true dup
    // pair survives, with jaccard exactly 1.0 over surviving shingles.
    val capped = Dedup.jaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.4, maxDocFreq = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.toSeq == Seq((1L, 11L, 1.0)))
    // A cap at/above the corpus size is a no-op.
    assert(Dedup.jaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.4, maxDocFreq = 11).count() == 55)
  }

  test("minhashLshPairs recovers the same high-similarity pairs") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, bands = 8, rowsPerBand = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates are verified with exact jaccard -> subset relation,
    // and identical docs always collide in every band.
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((1L, 2L)))
    // The portable md5 family obeys the same contract (different candidate
    // sets are allowed; the exact-jaccard verification bounds both).
    val portable = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 3, bands = 8, rowsPerBand = 4, threshold = 0.5,
      family = Dedup.PortableMd5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(portable.subsetOf(exact))
    assert(portable.contains((1L, 2L)))
  }

  test("Sampling: deterministic under repartitioning; splits partition") {
    import graft.pipeline.Sampling
    val base = spark.range(2000).toDF("id")
    val s1 = Sampling.hashSample(base, "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(base.repartition(7), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // partitioning-independent membership
    assert(math.abs(s1.size / 2000.0 - 0.3) < 0.05)

    val splits = Sampling.assignSplits(base, "id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(splits.length == 2000) // exhaustive
    val byName = splits.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byName.keySet == Set("train", "valid", "test"))
    assert(math.abs(byName("train") / 2000.0 - 0.8) < 0.05)
  }

  test("portable simhash: identical texts collide; radius-0 pair set") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0,
                                   family = Dedup.PortableMd5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash: identical texts hash identically; near dups are close") {
    val sh = docs.select(col("doc_id"), Dedup.simhashExpr("text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(3L)) < hamming(sh(1L), sh(4L)))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("langId classifies marker-bearing text; und without markers") {
    val df = Seq(
      "the cat and the dog is in that house",
      "der hund und die katze ist nicht ein tier zu",
      "le chat et la maison est une que les des",
      "el gato y los perros es una por con para",
      "xyzzy qwerty").toDF("text")
    val got = df.select(TextOps.langId(col("text"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("token stats and shingles") {
    val df = Seq("a bb ccc dddd").toDF("text")
    val r = df.select(
      TextOps.tokenCount(col("text")),
      TextOps.avgTokenLen(col("text")),
      TextOps.shingles(col("text"), 2)).collect()(0)
    assert(r.getInt(0) == 4)
    assert(r.getDouble(1) == 2.5)
    assert(r.getSeq[String](2) == Seq("a bb", "bb ccc", "ccc dddd"))
  }

  test("BPE-ish regex tokenizer splits words, digits and punctuation") {
    val df = Seq("don't panic42!").toDF("text")
    val toks = df.select(TextOps.regexTokens(col("text")))
      .collect()(0).getSeq[String](0)
    assert(toks == Seq("don", "'", "t", "panic", "42", "!"))
  }

  test("rolling fingerprint is stable and shingle-sensitive") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, "a completely different sentence here")).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"),
        TextOps.rollingFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
  }

  test("qualityScore penalizes shouty punctuation-heavy text") {
    val df = Seq(
      ("good", "the engine is a fine piece of work and the tests pass in the end"),
      ("bad", "!!! ??? *** !!! ??? *** !!! ??? *** !!!")).toDF("k", "text")
    val q = df.select(col("k"), TextOps.qualityScore(col("text")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(q("good") > q("bad"))
    assert(q("bad") == 0.0)
  }

  test("bruteTopK: hand-checked nearest neighbours") {
    val emb = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(-1.0, 0.0))).toDF("id", "vec")
    val top = Similarity.bruteTopK(emb, emb.filter($"id" === 0L), k = 2)
      .collect().sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
    assert(top == Seq(1L, 2L)) // cos: 1 -> .994, 2 -> 0, 3 -> -1
  }

  test("lshTopK achieves reasonable recall vs brute force") {
    val ids = spark.range(200).toDF("id")
    val emb = Embeddings.deterministic(ids, "id", 16, 0.9)
    val queries = emb.filter($"id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteTopK(emb, queries, 5))
    val approx = pairs(Similarity.lshTopK(emb, queries, 5, planes = 4, probes = 3))
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall")
  }

  test("ivf multi-probe recall dominates single-cell recall") {
    val ids = spark.range(200).toDF("id")
    val emb = Embeddings.deterministic(ids, "id", 16, 0.9)
    val queries = emb.filter($"id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteTopK(emb, queries, 5))
    val one = pairs(Similarity.ivfTopK(emb, queries, 5, nCentroids = 8, dim = 16))
    val multi = pairs(Similarity.ivfTopKMultiProbe(emb, queries, 5,
      nCentroids = 8, dim = 16, probes = 3))
    def recall(s: Set[(Long, Long)]) = (brute & s).size.toDouble / brute.size
    assert(recall(multi) >= recall(one), s"${recall(multi)} < ${recall(one)}")
    assert(recall(multi) >= 0.3, s"multi-probe recall ${recall(multi)}")
  }

  test("pqTopK: exact duplicate ranks first; ADC recall vs exact L2 is sane") {
    val ids = spark.range(200).toDF("id")
    val emb = Embeddings.deterministic(ids, "id", 16, 0.9)
    val queries = emb.filter($"id" < 10)
    val pq = Similarity.pqTopK(emb, queries, 5, dim = 16, m = 4,
                               codebookSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // exact L2 top-5 computed driver-side as the ground truth
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (0L until 10L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (l2sq(vecs(q), vecs(n)), n)).take(5).map(q -> _)
    }.toSet
    val approx = pq.map(t => (t._1, t._2)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"ADC recall vs exact L2: $recall")
    // a corpus vector IDENTICAL to the query achieves the minimal possible
    // ADC distance (its codes are the argmin of the query's own LUT).
    // Many vectors can quantize to the SAME codes and tie exactly (ADC
    // cannot distinguish inside a cell), so rank the FULL corpus and assert
    // the duplicate attains the global minimum.
    val dup = Similarity.pqTopK(
      emb.unionAll(Seq((999L, vecs(0L).toSeq)).toDF("id", "vec")),
      queries.filter($"id" === 0L), k = 1000, dim = 16, m = 4,
      codebookSize = 16)
      .collect()
    val d999 = dup.find(_.getLong(1) == 999L)
    assert(d999.nonEmpty)
    assert(d999.get.getDouble(3) == dup.map(_.getDouble(3)).min)
  }

  test("kmeansFixed: valid cluster ids, identical vectors co-assigned, " +
       "and a second pass never raises within-cluster scatter") {
    import graft.pipeline.Cluster
    val ids = spark.range(100).toDF("id")
    val emb = Embeddings.deterministic(ids, "id", 16, 2.2)
      .unionAll(Seq((500L, Seq.fill(16)(0.25)), (501L, Seq.fill(16)(0.25)))
        .toDF("id", "vec"))
    val out = Cluster.kmeansFixed(emb, k = 4, dim = 16, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out.values.forall(c => c >= 0 && c < 4))
    assert(out(500L) == out(501L)) // identical vectors, identical argmin
    // Lloyd monotonicity: total within-cluster scatter after the 2nd
    // assignment pass <= after the 1st (means minimize squared distance)
    def wcss(iters: Int): Double = {
      val a = Cluster.kmeansFixed(emb, k = 4, dim = 16, iters = iters)
        .collect().map(r => (r.getSeq[Double](1).toArray, r.getInt(2)))
      val cents = a.groupBy(_._2).map { case (c, rows) =>
        c -> (0 until 16).map(i => rows.map(_._1(i)).sum / rows.size).toArray
      }
      a.map { case (v, c) =>
        v.zip(cents(c)).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum
    }
    assert(wcss(2) <= wcss(1) + 1e-9)
  }

  test("semanticPairs finds a planted duplicate pair within its cluster") {
    import graft.pipeline.Cluster
    val ids = spark.range(60).toDF("id")
    val emb = Embeddings.deterministic(ids, "id", 16, 2.2)
    val v0 = emb.filter($"id" === 7L).collect().head.getSeq[Double](1)
    val withDup = emb.unionAll(Seq((999L, v0)).toDF("id", "vec"))
    val pairs = Cluster.semanticPairs(withDup, k = 4, dim = 16, iters = 2,
                                      threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((7L, 999L)))
  }

  test("contamination flags docs sharing an n-gram with the benchmark set") {
    import graft.pipeline.Cluster
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "intro words alpha beta gamma delta epsilon zeta eta theta tail"),
      (2L, "completely different text with no overlap at all here now"))
      .toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 0L)
    val out = Cluster.contamination(docs, bench, "doc_id", "text", n = 8,
                                    hashShingles = false)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 shares the 8-grams "alpha..theta" window(s); doc 2 clean;
    // doc 0 never matches itself
    assert(out.keySet == Set(1L))
    assert(out(1L)._1 == 1L && out(1L)._2 >= 1L)
    // the 64-bit-hashed join key (the at-scale default) is equivalent
    val hashed = Cluster.contamination(docs, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hashed == out)
  }

  test("contamination df-cap drops stop-shingles before the join") {
    import graft.pipeline.Cluster
    // "common phrase here now" appears in EVERY doc (a stop-shingle at
    // n=4); only doc 1 shares a rare shingle with the benchmark doc 0.
    val docs = Seq(
      (0L, "rare alpha beta gamma delta common phrase here now"),
      (1L, "rare alpha beta gamma delta tail common phrase here now"),
      (2L, "unrelated words entirely common phrase here now"))
      .toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 0L)
    // Uncapped: docs 1 AND 2 are flagged (doc 2 only via the stop-shingle).
    val uncapped = Cluster.contamination(docs, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(uncapped == Set(1L, 2L))
    // df cap 2: the every-doc shingle is dropped, doc 2 is no longer
    // flagged; doc 1 still is, via the rare 4-grams.
    val capped = Cluster.contamination(docs, bench, "doc_id", "text", n = 4,
                                       maxDocFreq = 2)
      .collect().map(_.getLong(0)).toSet
    assert(capped == Set(1L))
  }

  test("chunk: fixed windows with overlap, partial tail kept") {
    import graft.pipeline.TextOps
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than window
      (3L, (1 to 4).map(i => s"x$i").mkString(" ")))  // exactly one window
      .toDF("doc_id", "text")
    val out = TextOps.chunk(docs, "doc_id", "text", window = 4, overlap = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    // doc 1: ceil((10-1)/3) = 3 chunks, stride 3: [1..4], [4..7], [7..10]
    assert(out((1L, 0L)) == (("w1 w2 w3 w4", 4L)))
    assert(out((1L, 1L)) == (("w4 w5 w6 w7", 4L)))
    assert(out((1L, 2L)) == (("w7 w8 w9 w10", 4L)))
    assert(out((2L, 0L)) == (("a b", 2L)))
    assert(out((3L, 0L)) == (("x1 x2 x3 x4", 4L)))
    assert(out.size == 5)
    // overlap invariant: consecutive chunks share `overlap` tokens
    assert(out((1L, 0L))._1.split(" ").last == out((1L, 1L))._1.split(" ").head)
  }

  test("invertedIndex: sorted postings and document frequencies") {
    import graft.pipeline.Retrieval
    val docs = Seq((3L, "b a b"), (1L, "a c"), (2L, "a"))
      .toDF("doc_id", "text")
    val out = Retrieval.invertedIndex(docs, "doc_id", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(out("a") == ((3L, Seq(1L, 2L, 3L)))) // sorted, duplicate-free
    assert(out("b") == ((1L, Seq(3L))))         // per-doc dup counted once
    assert(out("c") == ((1L, Seq(1L))))
  }

  test("bm25TopK: hand-checked single-term scoring and ranking") {
    import graft.pipeline.Retrieval
    // 3 docs, query term "q" in docs 1 (tf 2, len 4) and 2 (tf 1, len 2).
    val docs = Seq((1L, "q q x y"), (2L, "q z"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", "q", k = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val idf = math.log((3.0 - 2 + 0.5) / (2 + 0.5) + 1)
    val avgdl = 10.0 / 3
    def bm25(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(out.keySet == Set(1L, 2L)) // doc 3 has no query term
    assert(math.abs(out(1L)._1 - BigDecimal(bm25(2, 4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(2L)._1 - BigDecimal(bm25(1, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // higher tf in a similar-length doc ranks first
    assert(out(1L)._2 == 1L && out(2L)._2 == 2L)
  }

  test("perplexityBuckets: terciles ordered tail <= middle <= head") {
    import graft.pipeline.CorpusStats
    // 9 docs with distinct token distributions -> distinct avg_logp.
    val docs = (1L to 9L).map(i =>
      (i, (1L to i).map(j => s"t$j").mkString(" ") + " common common"))
      .toDF("doc_id", "text")
    val out = CorpusStats.perplexityBuckets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2)))
      .toMap
    assert(out.size == 9)
    val byBucket = out.values.groupBy(_._2).view
      .mapValues(_.map(_._1).toSeq).toMap
    assert(byBucket.keySet == Set("tail", "middle", "head"))
    assert(byBucket("tail").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("head").min)
  }

  test("filterCascade: rule firing, reason order, keep iff clean") {
    import graft.pipeline.TextOps
    val clean = (1 to 20).map(i => s"w$i").mkString(" ") + " the of"
    val docs = Seq(
      (1L, clean),                                  // passes every rule
      (2L, "short the of"),                         // too_short
      (3L, ("dup " * 30 + "the of and is in a to").trim), // repetitive
      (4L, (1 to 20).map(i => s"u$i").mkString(" ")), // low_stopword only
      (5L, ("a! b? c. d, e; " * 4 + "the of and is in a to").trim)) // high_punct
      .toDF("doc_id", "text")
    val out = TextOps.filterCascade(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getString(3)))
      .toMap
    assert(out(1L) == ((true, "")))
    assert(out(2L)._2.contains("too_short") && !out(2L)._1)
    assert(out(3L)._2.contains("repetitive") && !out(3L)._1)
    assert(out(4L) == ((false, "low_stopword")))
    assert(out(5L)._2.contains("high_punct") && !out(5L)._1)
    // fixed reason order: short doc with no stopwords lists both in order
    val multi = TextOps.filterCascade(
      Seq((9L, "zz yy xx")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0).getString(3)
    assert(multi == "too_short,low_stopword")
  }

  test("pack: offset-bucketed sequence assignment per group") {
    import graft.pipeline.TextOps
    val chunks = Seq(
      // group g1: chunk sizes 3, 3, 2 with budget 4:
      // starts 0, 3, 6 -> seqs 0, 0, 1; offsets 0, 3, 2
      (1L, 0L, "g1", 3L), (1L, 1L, "g1", 3L), (2L, 0L, "g1", 2L),
      // group g2 packs independently from offset 0
      (3L, 0L, "g2", 4L), (3L, 1L, "g2", 1L))
      .toDF("id", "chunk_idx", "source", "chunk_tokens")
    val out = TextOps.pack(chunks, "source", "id", "chunk_idx",
                           "chunk_tokens", budget = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"))).toMap
    assert(out((1L, 0L)) == ((0L, 0L)))
    assert(out((1L, 1L)) == ((0L, 3L))) // straddles the boundary, starts in seq 0
    assert(out((2L, 0L)) == ((1L, 2L)))
    assert(out((3L, 0L)) == ((0L, 0L)))
    assert(out((3L, 1L)) == ((1L, 0L)))
  }

  test("balancedSample: groups downsample toward the smallest group") {
    import graft.pipeline.Sampling
    // 400 docs in "big", 100 in "small" -> keep fraction 0.25 vs 1.0.
    val docs = (1L to 500L).map(i =>
      (i, if (i <= 400) "big" else "small")).toDF("doc_id", "source")
    val out = Sampling.balancedSample(docs, "doc_id", "source")
      .collect().map(_.getAs[String]("source")).groupBy(identity).view
      .mapValues(_.size).toMap
    // small keeps everything (threshold = BUCKETS); big is binomial(400, .25)
    assert(out("small") == 100)
    assert(out("big") > 60 && out("big") < 140, s"big kept ${out("big")}")
    // deterministic: same membership on re-evaluation
    val again = Sampling.balancedSample(docs, "doc_id", "source")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val first = Sampling.balancedSample(docs, "doc_id", "source")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == first)
  }

  test("repetition: hand-checked duplicate-token and top-ngram fractions") {
    import graft.pipeline.CorpusStats
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val r = CorpusStats.repetition(docs, "doc_id", "text", n = 2).collect().head
    // 4 tokens, 2 distinct -> 0.5; 2-grams (a a, a a, a b) -> 2/3
    assert(r.getDouble(1) == 0.5)
    assert(r.getDouble(2) == 0.666667)
  }

  test("weightedSample: weight 1 keeps all, 0 keeps none, monotone in w") {
    import graft.pipeline.Sampling
    val docs = spark.range(500).toDF("doc_id")
    def kept(w: Double): Set[Long] =
      Sampling.weightedSample(docs, "doc_id", lit(w))
        .collect().map(_.getLong(0)).toSet
    assert(kept(1.0).size == 500)
    assert(kept(0.0).isEmpty)
    val half = kept(0.5)
    // hash buckets are uniform: ~250 of 500 within a loose band
    assert(half.size > 175 && half.size < 325, s"kept ${half.size}")
    // monotone: a lower weight's sample is a subset of a higher weight's
    assert(kept(0.25).subsetOf(half) && half.subsetOf(kept(0.75)))
  }

  test("unigramLogProb: uniform corpus scores ln(1/V); rare tokens lower") {
    import graft.pipeline.CorpusStats
    // corpus of 4 equally-frequent tokens -> every doc scores ln(1/4)
    val uniform = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val u = CorpusStats.unigramLogProb(uniform, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = BigDecimal(math.log(0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(u(1L) == expect && u(2L) == expect)
    // a doc of rare tokens scores below a doc of the dominant token
    val skewed = Seq((1L, "the the the the the the"), (2L, "rare words"))
      .toDF("doc_id", "text")
    val s = CorpusStats.unigramLogProb(skewed, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(2L) < s(1L))
  }

  test("tfidfTopK ranks the doc-distinctive token first") {
    import graft.pipeline.CorpusStats
    val docs = Seq(
      (1L, "the zebra the the"),
      (2L, "the cat sat here"),
      (3L, "the dog ran far")).toDF("doc_id", "text")
    val top = CorpusStats.tfidfTopK(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "the" has df=3 -> idf=0; each doc's unique tokens win despite tf=3
    assert(top(1L) == "zebra")
  }

  test("dupGroups resolves transitive near-dup clusters to canonical ids") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("i", "j")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L)
    val fast = graft.pipeline.Dedup.dupGroups(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == expect)
    // force the distributed GraphX path; must agree
    val dist = graft.pipeline.Dedup.dupGroups(pairs, driverLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expect)
  }

  test("embeddingPairs finds planted duplicate vectors") {
    val emb = Seq(
      (0L, Seq(1.0, 2.0, 3.0)), (1L, Seq(1.0, 2.0, 3.0)),
      (2L, Seq(-3.0, 1.0, -2.0))).toDF("id", "vec")
    val pairs = Dedup.embeddingPairs(emb, "id", "vec", threshold = 0.99,
      planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("bpeLearnMerges: greedy leftmost application and re-counted second merge") {
    import graft.pipeline.TextOps
    // Round 1: (a,a) wins with freq 3 — "b a a a b" has overlapping matches
    // at pos 1,2 (one island: greedy keeps pos 1 only) and "a a" one more.
    // Rebuilt corpus: "b aa a b" and "aa". Round 2 pairs each have freq 1:
    // (b,aa), (aa,a), (a,b) — lexicographic tie-break picks (a,b).
    val docs = Seq((1L, "b a a a b"), (2L, "a a")).toDF("doc_id", "text")
    val out = TextOps.bpeLearnMerges(docs, "doc_id", "text", merges = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("a", "a", 3L)), s"round 1 got ${out(1L)}")
    assert(out(2L) == (("a", "b", 1L)), s"round 2 got ${out(2L)}")
    // An aaaa run merges as (aa)(aa): greedy parity, not all-pairs.
    val runs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val o2 = TextOps.bpeLearnMerges(runs, "doc_id", "text", merges = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(o2(1L) == (("a", "a", 3L)))
    assert(o2(2L) == (("aa", "aa", 1L)), s"round 2 on run got ${o2(2L)}")
  }

  test("bpeEncode: applies the learned table in rank order, greedy leftmost") {
    import graft.pipeline.TextOps
    val docs = Seq((1L, "b a a a b"), (2L, "a a")).toDF("doc_id", "text")
    def seqs(enc: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
      enc.collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getString(2)))
        .groupBy(_._1).map { case (id, rs) =>
          id -> rs.sortBy(_._2).map(_._3).toSeq }
    // Learned table: rank 1 = (a,a), rank 2 = (a,b). Applying both:
    // "b a a a b" -> "b aa a b" -> "b aa ab"; "a a" -> "aa".
    val merges = TextOps.bpeLearnMerges(docs, "doc_id", "text", merges = 2)
    val got = seqs(TextOps.bpeEncode(docs, "doc_id", "text", merges))
    assert(got == Map(1L -> Seq("b", "aa", "ab"), 2L -> Seq("aa")), s"got $got")
    // Empty merge table: encode is plain whitespace tokenization.
    val none = merges.filter(col("merge_rank") < 0)
    assert(seqs(TextOps.bpeEncode(docs, "doc_id", "text", none))
      == Map(1L -> Seq("b", "a", "a", "a", "b"), 2L -> Seq("a", "a")))
    // Fused train-then-tokenize ≡ learn then from-scratch encode.
    val (m2, toks) = TextOps.bpeTrainTokenize(docs, "doc_id", "text", merges = 2)
    assert(m2.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(seqs(toks) == got)
  }

  test("bpeEncodeFused: hash-identical to the iterative path (both orders)") {
    import graft.pipeline.TextOps
    def seqs(enc: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
      enc.collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getString(2)))
        .groupBy(_._1).map { case (id, rs) =>
          id -> rs.sortBy(_._2).map(_._3).toSeq }
    // Deterministic pseudo-random corpus over a 3-symbol alphabet: dense
    // in x=x runs and cascading merges (merged tokens re-matching later
    // ranks) — the cases where greedy-parity vs all-pairs semantics
    // diverge.
    val docs = (1L to 12L).map { id =>
      val syms = "abc"
      val txt = (0 until 24).map { j =>
        syms(((id * 31 + j * 17 + j * j) % 3).toInt).toString
      }.mkString(" ")
      (id, txt)
    }.toDF("doc_id", "text")
    val merges = TextOps.bpeLearnMerges(docs, "doc_id", "text", merges = 4)
    val iterative = seqs(TextOps.bpeEncode(docs, "doc_id", "text", merges))
    val fused = seqs(TextOps.bpeEncodeFused(docs, "doc_id", "text", merges))
    assert(fused == iterative)
    // Empty merge table degenerates to whitespace tokenization on both.
    val none = merges.filter(col("merge_rank") < 0)
    assert(seqs(TextOps.bpeEncodeFused(docs, "doc_id", "text", none))
      == seqs(TextOps.bpeEncode(docs, "doc_id", "text", none)))
  }

  test("gunzip round-trips single and multi-member streams; gunzipCorpus ingests") {
    import spark.implicits._
    val text = "the quick brown fox " * 50
    val single = TextOps.gzip(text.getBytes("UTF-8"))
    assert(TextOps.gunzip(single).map(new String(_, "UTF-8")) == Some(text))
    // multi-member concatenation (cat a.gz b.gz) decodes end-to-end
    val multi = TextOps.gzip("hello ".getBytes) ++ TextOps.gzip("world".getBytes)
    assert(TextOps.gunzip(multi).map(new String(_, "UTF-8")) == Some("hello world"))
    // non-gzip declines; truncated final member yields the surviving prefix
    assert(TextOps.gunzip("not gzip at all".getBytes) == None)
    val cut = TextOps.gunzip(single.dropRight(6))
    assert(cut.forall(b => text.startsWith(new String(b, "UTF-8"))))
    val df = Seq((1L, single), (2L, multi),
                 (3L, "junk!".getBytes)).toDF("doc_id", "gz")
    val rows = TextOps.gunzipCorpus(df, "doc_id", "gz")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(2)), r.getLong(3))).toMap
    assert(rows(1L) == (Some(text), text.length.toLong))
    assert(rows(2L) == (Some("hello world"), 11L))
    assert(rows(3L) == (None, -1L))
  }

  test("gunzipEx flags cap-truncated and mid-member-broken decodes") {
    import spark.implicits._
    val text = "abcdefgh" * 64 // 512 bytes decompressed
    val gz = TextOps.gzip(text.getBytes("UTF-8"))
    // complete decode under the cap: not truncated
    assert(TextOps.gunzipEx(gz).map(_._2) == Some(false))
    // cap smaller than the payload: flagged, prefix returned
    val Some((capped, flag)) = TextOps.gunzipEx(gz, maxBytes = 100)
    assert(flag && capped.length >= 100 &&
      text.startsWith(new String(capped, "UTF-8")))
    // cap exactly at the decompressed size: complete, not truncated
    val Some((exact, flagExact)) = TextOps.gunzipEx(gz, maxBytes = 512)
    assert(!flagExact && exact.length == 512)
    // mid-member break: surviving prefix carries the flag
    val cut = TextOps.gunzipEx(gz.dropRight(6))
    assert(cut.forall(_._2))
    // the corpus face surfaces the flag as a column
    val df = Seq((1L, gz)).toDF("doc_id", "gz")
    val r = TextOps.gunzipCorpus(df, "doc_id", "gz").collect()(0)
    assert(r.getAs[Boolean]("truncated") == false)
  }

  test("warcRecords walks Content-Length-framed records; tolerates malformed tails") {
    // content deliberately contains header-looking bytes — only a
    // length-driven walk survives this
    val tricky = "WARC/1.0\r\nContent-Length: 5\r\n\r\nfake"
    val shard = TextOps.warcBytes(Seq(
      ("response", "http://a/1", "hello"),
      ("metadata", "http://a/2", tricky),
      ("response", "http://a/3", "")))
    val recs = TextOps.warcRecords(shard)
    assert(recs.map(_.uri) == Seq("http://a/1", "http://a/2", "http://a/3"))
    assert(recs(1).content == tricky &&
           recs(1).content_length == tricky.getBytes("UTF-8").length)
    assert(recs(2).content == "" && recs(2).content_length == 0)
    // truncated final record: earlier records survive
    val cut = TextOps.warcRecords(shard.dropRight(12))
    assert(cut.length == 2)
    assert(TextOps.warcRecords("not a warc".getBytes).isEmpty)
  }

  test("pcaPowerDirection recovers a planted dominant direction") {
    import spark.implicits._
    // corpus = strong signal along u (alternating ±) + small index noise
    val dim = 8
    val u = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0 else -1.0)
    val rows = (0 until 200).map { r =>
      val a = if (r % 2 == 0) 0.4 else -0.4 // ± along u: mean ~0, var high
      (r.toLong, (0 until dim).map(i => a * u(i) + 0.01 * ((r + i) % 5 - 2)).toSeq)
    }
    val emb = rows.toDF("id", "vec")
    val w = Similarity.pcaPowerDirection(emb, dim, iters = 4)
      .collect().sortBy(_.getLong(0)).map(_.getDouble(1))
    // normalized by max|w|: exactly one coordinate at ±1, all in [-1, 1]
    assert(w.forall(v => v >= -1.0 && v <= 1.0))
    assert(w.map(math.abs).max == 1.0)
    // sign-canonical: first nonzero coordinate positive
    assert(w.find(_ != 0.0).exists(_ > 0))
    // aligns with the planted direction (cosine > 0.99 up to sign)
    val dot = w.zip(u).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(w.map(v => v * v).sum) * math.sqrt(u.map(v => v * v).sum))
    assert(cos > 0.99, s"cos $cos; w=${w.mkString(",")}")
  }

  test("deflated second component recovers the second planted direction") {
    import spark.implicits._
    // two orthogonal planted directions with distinct strengths
    val dim = 8
    val u1 = Array.tabulate(dim)(i => if (i < 4) 1.0 else 1.0)  // all-ones
    val u2 = Array.tabulate(dim)(i => if (i < 4) 1.0 else -1.0) // split
    val rows = (0 until 200).map { r =>
      val a = if (r % 2 == 0) 0.5 else -0.5   // strong along u1
      val b = if (r % 4 < 2) 0.15 else -0.15  // weaker along u2
      (r.toLong, (0 until dim).map(i =>
        a * u1(i) + b * u2(i) + 0.005 * ((r * 7 + i) % 5 - 2)).toSeq)
    }
    val emb = rows.toDF("id", "vec")
    def dirOf(df: org.apache.spark.sql.DataFrame): Array[Double] =
      df.collect().sortBy(_.getLong(0)).map(_.getDouble(1))
    def cosTo(w: Array[Double], u: Array[Double]): Double = {
      val d = w.zip(u).map { case (x, y) => x * y }.sum
      math.abs(d) / (math.sqrt(w.map(x => x * x).sum) *
                     math.sqrt(u.map(x => x * x).sum))
    }
    val w1 = dirOf(Similarity.pcaPowerDirection(emb, dim, iters = 4))
    assert(cosTo(w1, u1) > 0.99, s"top: ${w1.mkString(",")}")
    val proj = Similarity.removeTopDirection(emb, dim, iters = 4)
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("vp")))),
                     x => x.getField("vp")).as("vec"))
    val w2 = dirOf(Similarity.pcaPowerDirection(proj, dim, iters = 4))
    assert(cosTo(w2, u2) > 0.99, s"second: ${w2.mkString(",")}")
    assert(cosTo(w2, w1) < 0.05) // deflation leaves it ⊥ the top
  }

  test("removeTopDirection leaves residuals orthogonal to the direction") {
    import spark.implicits._
    val dim = 8
    val rows = (0 until 100).map { r =>
      (r.toLong, (0 until dim).map(i =>
        (if (r % 2 == 0) 0.3 else -0.3) + 0.02 * ((r * 3 + i) % 7 - 3)).toSeq)
    }
    val emb = rows.toDF("id", "vec")
    val w = Similarity.pcaPowerDirection(emb, dim, iters = 4)
      .collect().sortBy(_.getLong(0)).map(_.getDouble(1))
    val proj = Similarity.removeTopDirection(emb, dim, iters = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    // v'·w ≈ 0 for every vector (quantization leaves ~1e-6 residue)
    proj.foreach { case (id, vp) =>
      val d = vp.zip(w).map { case (a, b) => a * b }.sum
      assert(math.abs(d) < 1e-4, s"id $id residual dot $d")
    }
    // and the projection actually changed the vectors
    val orig = rows.toMap
    assert(proj.exists { case (id, vp) =>
      vp.zip(orig(id)).exists { case (a, b) => math.abs(a - b) > 0.01 } })
  }

  test("count-min sketch: est >= exact always, exact when collision-free") {
    import spark.implicits._
    val items = (Seq.fill(40)("hot") ++ (0 until 30).map(i => s"cold$i"))
      .toDF("tok")
    val exact = items.groupBy("tok").agg(count(lit(1)).as("n"))
    for (width <- Seq(8, 4096)) {
      val sk = Sketch.cmSketch(items, "tok", 4, width)
      val est = Sketch.cmsEstimate(sk, exact.select("tok"), "tok", 4, width)
      val joined = exact.join(est, "tok")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      joined.foreach { case (tk, n, e) =>
        assert(e >= n, s"$tk: est $e < exact $n")
      }
      // a 4096-wide table over 31 keys is almost surely collision-free
      if (width == 4096) joined.foreach { case (tk, n, e) =>
        assert(e == n, s"$tk: est $e != exact $n at width 4096")
      }
    }
    // absent keys estimate 0
    val ghost = Sketch.cmsEstimate(Sketch.cmSketch(items, "tok", 4, 64),
      Seq("nope").toDF("tok"), "tok", 4, 64)
      .collect().head.getLong(1)
    assert(ghost >= 0) // may collide upward, never negative
  }
}
