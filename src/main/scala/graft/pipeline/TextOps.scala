package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristic, fingerprinting.
  * All pure column expressions (codegen'd, no UDFs) so they run at
  * 100 TB scan speed and push down through Catalyst.
  */
object TextOps {

  /** Whitespace tokenization (documents in the testdata are single-space
    * separated; a BPE-ish regex splitter is provided separately). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish sub-word split: words plus digit runs plus punctuation as
    * separate tokens. */
  def regexTokens(text: Column): Column =
    filter(split(text,
        "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])"),
           t => t =!= "" && t =!= " ")

  /** Same sub-word split via a lookaround-free alternation pattern —
    * portable to RE2-based engines (DuckDB/Go/Hyperscan), so tokenizer
    * output is oracle-verifiable across engines. Caveat: Java regexes walk
    * UTF-16 code units while RE2 walks codepoints, so non-BMP characters
    * (emoji etc.) tokenize differently across engines; the portability
    * contract covers BMP text. */
  val portablePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def portableSubTokens(text: Column): Column =
    regexp_extract_all(text, lit(portablePattern), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))
  def charCount(text: Column): Column = length(text)

  def avgTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0), (acc, t) => acc + length(t))
      .cast("double") / tokenCount(text)

  def stopwordCount(text: Column, stops: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stops.map(lit): _*)))

  val defaultStops: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  def stopwordRatio(text: Column): Column =
    stopwordCount(text, defaultStops).cast("double") / tokenCount(text)

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
      .cast("double") / length(text)

  def upperRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", "")))
      .cast("double") / length(text)

  /** Heuristic quality score in [0,1]: prefers mid-length docs with a
    * healthy stopword ratio and low punctuation/uppercase noise —
    * the standard length/punct/stopword family of pipeline filters. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 64.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    val upperPenalty = greatest(lit(0.0), lit(1.0) - upperRatio(text) * 4.0)
    round((lenScore + stopScore) / 2 * punctPenalty * upperPenalty, 6)
  }

  /** Language-ID marker vocabularies (n-gram heuristic over the most
    * frequent function words per language). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "a", "in", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "que"),
    "es" -> Seq("el", "los", "y", "es", "una", "por", "con", "para"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Argmax language by marker-token hits; `und` (undetermined) when no
    * marker occurs. Pure expression: one pass per language over the token
    * array, then a greatest-of-structs argmax. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = langMarkers.map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isin(markers.map(lit): _*))).as("hits"),
             lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** fastText-style linear quality-classifier INFERENCE — the
    * "does this look like reference text" filter of the GPT-3/CCNet
    * pipeline family: score = σ( w · φ(doc) / |tokens| ) over hashed
    * unigram features, keep iff σ > 0.5. Weights are sin-seeded
    * stand-ins (no trained checkpoint ships in this container — the same
    * inference-only contract as the ConvE scorer); a trained model swaps
    * in via the weight expression, nothing else changes. The weight of
    * bucket b is sin(b·0.7 + seed), computed IN the expression — no
    * weight table, no join: the corpus scores in one scan plus one
    * per-doc aggregate. Output: (id, n_tokens, score, keep), 6 dp. */
  def linearQualityScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, buckets: Int = 256,
                         seed: Double = 5.1)
      : org.apache.spark.sql.DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = pmod(graft.functions.PortableHash.md5Prefix60(
      concat(lit("lqc|"), col("t"))), lit(buckets.toLong))
    docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
      .select(col("id"), sin(b * 0.7 + seed).as("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
           (sum("w") / count(lit(1))).as("_m"))
      .select(col("id"), col("n_tokens"),
              round(lit(1.0) / (lit(1.0) + exp(-col("_m"))), 6).as("score"),
              (lit(1.0) / (lit(1.0) + exp(-col("_m"))) > 0.5).as("keep"))
  }

  /** Language-ID confusion matrix against a ground-truth label column —
    * the accuracy report a heuristic classifier ships with (per-cell
    * counts; diagonal = agreement). One scan + one small groupBy. */
  def langIdEval(docs: org.apache.spark.sql.DataFrame, labelCol: String,
                 textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(labelCol).as("lang"), langId(col(textCol)).as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))

  /** Word n-gram shingles over an ALREADY-PROJECTED token-array column.
    *
    * PERF CONTRACT: pass an attribute (a column of a prior projection),
    * not a construction expression — higher-order-function lambdas
    * re-evaluate their captured expression trees PER ELEMENT, so
    * `shinglesOf(split(text), n)` re-tokenizes the document once per
    * shingle (O(tokens²); measured 7× on the winnow explode at sf0.1).
    * Catalyst will not re-inline the projection: CollapseProject leaves
    * non-cheap aliases referenced more than once in place. */
  def shinglesOf(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
                i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** Word n-gram shingles as an array column. Convenience form for
    * row-local use on SHORT texts; bulk corpus paths must project tokens
    * first and use [[shinglesOf]] (see its perf contract). */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  /** The corpus shingle frame `(id, pos, g)` — tokens projected as an
    * attribute BEFORE the shingle lambda, per the [[shinglesOf]] perf
    * contract. The shared bulk path for winnowing and n-gram statistics. */
  def shingleFrame(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
                tokens(col(textCol)).as("ts"))
      .select(col("id"), posexplode(shinglesOf(col("ts"), n)).as(Seq("pos", "g")))

  /** Document fingerprint: minimum md5 over the token set — a 1-hash
    * MinHash usable as a cheap near-dup blocking key, and exactly
    * reproducible in ANSI SQL for the oracle. */
  def fingerprint(text: Column): Column =
    array_min(transform(tokens(text), t => md5(t)))

  /** 64-bit rolling-hash fingerprint over shingles (xxhash64-based). */
  def rollingFingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => xxhash64(s)))

  /** Fixed-token-window document chunking with overlap — the training-prep
    * splitter (context-window packing, RAG indexing). Windows of `window`
    * tokens advance by `window − overlap`; the final partial window is kept
    * iff non-empty. Pure per-row expressions + posexplode: no shuffle, no
    * UDF — a 100 TB corpus chunks in one scan. Output: one row per chunk
    * `(… idCol, chunk_idx, chunk_text, chunk_tokens)`. */
  def chunk(docs: org.apache.spark.sql.DataFrame, idCol: String,
            textCol: String, window: Int, overlap: Int = 0)
      : org.apache.spark.sql.DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
            s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val step = window - overlap
    // Tokens projected as an attribute BEFORE the chunk lambda (the
    // shinglesOf perf contract: a captured split() re-tokenizes per chunk).
    val ts = col("ts")
    // number of chunks = ceil(max(size - overlap, 1) / step)
    val nChunks = ceil(greatest(size(ts) - overlap, lit(1)) / lit(step))
      .cast("int")
    docs.select(col(idCol).cast("long").as("id"),
                tokens(col(textCol)).as("ts"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(ts, i * step + 1, lit(window)))))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
              concat_ws(" ", col("col")).as("chunk_text"),
              size(col("col")).cast("long").as("chunk_tokens"))
  }

  /** Gopher-style quality-filter cascade (Rae et al. 2021 §A1.1, public
    * paper): every document is scored against the standard rule family —
    * length bounds, bulk repetition, stopword floor, punctuation ceiling —
    * and kept iff NO rule fires. Violated rules are reported in fixed
    * order as a CSV reason string, the shape pipeline audits consume
    * ("why was this dropped"). Pure per-row expressions (the repetition
    * test uses `array_distinct`, not a groupBy), so the cascade runs at
    * scan speed with zero shuffles and prunes to (id, text) at the reader.
    * Returns (id, n_tokens, keep, reasons). */
  def filterCascade(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String,
                    minTokens: Int = 16, maxTokens: Int = 4096,
                    maxDupTokenFrac: Double = 0.4,
                    minStopRatio: Double = 0.02,
                    maxPunctRatio: Double = 0.2)
      : org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val nTok = tokenCount(text)
    val dupFrac = lit(1.0) - size(array_distinct(tokens(text))).cast("double") / nTok
    val rules: Seq[(String, Column)] = Seq(
      "too_short" -> (nTok < minTokens),
      "too_long" -> (nTok > maxTokens),
      "repetitive" -> (dupFrac > maxDupTokenFrac),
      "low_stopword" -> (stopwordRatio(text) < minStopRatio),
      "high_punct" -> (punctRatio(text) > maxPunctRatio))
    val reasons = concat_ws(",",
      rules.map { case (name, cond) => when(cond, lit(name)) }: _*)
    docs.select(col(idCol).cast("long").as("id"),
                nTok.cast("long").as("n_tokens"),
                (reasons === "").as("keep"),
                reasons.as("reasons"))
  }

  /** Default PII redaction rules (pattern → replacement token), applied in
    * order: emails, IPv4 addresses, long digit runs (phone/account/SSN
    * shapes). All patterns are in the lookaround-free portable regex
    * subset (see [[portablePattern]]'s caveat), so scrubbed output is
    * oracle-verifiable across RE2-based engines. */
  val defaultPiiRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+" -> "<EMAIL>",
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}" -> "<IP>",
    "[0-9][0-9 ()+.-]{6,}[0-9]" -> "<PHONE>")

  /** RFC-3986-shaped URL regex: scheme :// host [:port] path [?query]
    * [#fragment]. Group numbers are stable (1 scheme, 2 host, 3 port,
    * 4 path, 5 query, 6 fragment) and the pattern is RE2-compatible so
    * the DuckDB oracle replays it verbatim. */
  val urlRegex: String =
    "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$"

  /** URL normalization + domain extraction — the C4/RefinedWeb-style
    * URL-dedup key stage: lowercase scheme and host, drop the default
    * port (80 for http, 443 for https), keep a non-default port, root
    * path `/` for an empty path, SORT query parameters (so
    * `?b=2&a=1` and `?a=1&b=2` collide), drop the fragment.
    * `domain` is the last two host labels (the registrable-domain
    * heuristic public corpora use for per-site caps). Pure per-row
    * regexp/sort expressions — one scan, no shuffle, no UDF; at 100 TB
    * this is the map-side key extraction in front of an exact
    * groupBy-dedup. Returns (id, scheme, host, domain, norm_url);
    * rows whose url does not parse keep null parts. */
  def urlNormalize(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   urlCol: String): org.apache.spark.sql.DataFrame = {
    val u = col(urlCol)
    def part(g: Int): Column = regexp_extract(u, urlRegex, g)
    val scheme = lower(part(1))
    val host = lower(part(2))
    val port = part(3)
    val path = when(part(4) === "", lit("/")).otherwise(part(4))
    val query = part(5)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val sortedQuery = concat_ws("&", array_sort(split(query, "&")))
    val parsed = part(1) =!= ""
    docs.select(col(idCol).as("id"),
      when(parsed, scheme).as("scheme"),
      when(parsed, host).as("host"),
      when(parsed, regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).as("domain"),
      when(parsed, concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(query =!= "", concat(lit("?"), sortedQuery)).otherwise(lit(""))))
        .as("norm_url"))
  }

  /** Pattern scrubbing / PII redaction: apply `rules` (regex →
    * replacement) in order and count total redactions — the
    * pre-training-time PII pass (emails, IPs, phone shapes scrubbed
    * before anything ships to a trainer). Pure per-row regexp
    * expressions: the corpus scrubs in one scan, no shuffle, no UDF.
    * Returns (id, scrubbed, n_redactions). Rule ORDER is semantic — an
    * IPv4 is also a digit-run, so the more specific pattern runs first
    * and later counts run on the already-scrubbed text. */
  def scrub(docs: org.apache.spark.sql.DataFrame, idCol: String,
            textCol: String,
            rules: Seq[(String, String)] = defaultPiiRules)
      : org.apache.spark.sql.DataFrame = {
    require(rules.nonEmpty, "need at least one (pattern, replacement) rule")
    val (scrubbed, nRed) = rules.foldLeft((col(textCol), lit(0L))) {
      case ((text, n), (pat, rep)) =>
        (regexp_replace(text, pat, rep),
         n + size(regexp_extract_all(text, lit(pat), lit(0))))
    }
    docs.select(col(idCol).as("id"), scrubbed.as("scrubbed"),
                nRed.cast("long").as("n_redactions"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash every
    * k-gram, then keep the minimum hash of each window of `w` consecutive
    * k-grams (leftmost minimum on ties, via a (hash, position)-composite
    * key). Guarantees a shared fingerprint for any match of length
    * >= w + k − 1 while storing ~2/(w+1) of the hashes — the standard
    * plagiarism/near-dup primitive that, unlike MinHash, localizes WHERE
    * the overlap is.
    *
    * Relational form: posexplode the k-gram hashes (long-form, one row per
    * position) and take the frame-min over a `ROWS BETWEEN CURRENT ROW AND
    * w−1 FOLLOWING` window, keeping only full-window starts. The window
    * partitions by document — per-doc token counts are pipeline-bounded
    * (docs over ~1M tokens are chunked upstream), so no partition outgrows
    * an executor at 100 TB.
    *
    * The hash is the 40-bit md5 prefix (portable: any engine with md5 can
    * replay it), packed as `hash · 2^20 + pos` so one BIGINT MIN gives
    * min-hash-then-min-position; pack and decode stay in integer
    * arithmetic throughout (the 60-bit key exceeds double precision).
    * `pos` must fit 20 bits — a doc beyond 2^20 k-grams would collide
    * keys, not error, hence the documented chunk-upstream contract.
    *
    * Output: one row per selected fingerprint, (id, fp_hash, fp_pos),
    * distinct. */
  def winnow(docs: org.apache.spark.sql.DataFrame, idCol: String,
             textCol: String, k: Int = 4, w: Int = 4)
      : org.apache.spark.sql.DataFrame = {
    require(k > 0 && w > 0, s"need k > 0 and w > 0, got k=$k w=$w")
    val grams = shingleFrame(docs, idCol, textCol, k)
      .select(col("id"), col("pos"),
        (conv(substring(md5(col("g")), 1, 10), 16, 10).cast("long") *
          lit(1048576L) + col("pos")).as("key"))
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    grams
      // min + count share ONE window spec -> one Window node, one sort.
      // Full windows have exactly w rows; the pos=0 escape keeps the
      // single whole-doc window of a shorter-than-w document.
      .withColumn("sel", min("key").over(frame))
      .withColumn("wn", count(lit(1)).over(frame))
      .filter(col("wn") === w || col("pos") === 0)
      // Decode in INTEGER arithmetic (shift/mask): the packed key reaches
      // 2^60, past double's 53-bit mantissa — a `/` here would corrupt
      // high hash bits.
      .select(col("id"), shiftright(col("sel"), 20).as("fp_hash"),
              col("sel").bitwiseAND(lit(1048575L)).as("fp_pos"))
      .distinct()
  }

  /** Sequence packing: assign chunks to fixed token-budget training
    * sequences, deterministically, per pack group. Chunks are laid out in
    * (id, chunk_idx) order within each `groupCol` value and a chunk's
    * sequence is the budget-bucket its START offset falls in —
    * `seq_id = floor((cumsum − tokens) / budget)` — the streaming
    * offset-bucketing packer (a chunk may straddle a boundary; trainers
    * that need hard boundaries re-split at `seq_offset`). One window over
    * the chunk frame, no driver state.
    *
    * Scale note: determinism is per group, so the window partitions by
    * `groupCol`. In production the pack group is a bounded shard (source ×
    * file-shard), keeping each window partition executor-sized; packing is
    * embarrassingly parallel across groups by construction. */
  def pack(chunks: org.apache.spark.sql.DataFrame, groupCol: String,
           idCol: String, idxCol: String, tokCol: String, budget: Int)
      : org.apache.spark.sql.DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol), col(idxCol))
    chunks.withColumn("_start", sum(col(tokCol)).over(w) - col(tokCol))
      .withColumn("seq_id", floor(col("_start") / lit(budget)).cast("long"))
      .withColumn("seq_offset", (col("_start") % budget).cast("long"))
      .drop("_start")
  }

  /** Learn the first `merges` BPE merges from the corpus (Sennrich et al.
    * 2016 §3.2, relationally): each round counts adjacent symbol pairs
    * corpus-wide, takes the single most frequent pair (ties broken
    * lexicographically), applies it greedily left-to-right, and
    * re-tokenizes for the next round. The sequential "greedy leftmost"
    * semantics is per-document gaps-and-islands: consecutive match
    * positions (only possible for an x=x pair run) form an island, and
    * keeping the odd row-numbers inside each island reproduces exactly
    * what the left-to-right scan merges. Every window is doc-partitioned;
    * the only global operation per round is the top-1 TakeOrdered and the
    * one-row broadcast back — the shape that holds at corpus scale (this
    * IS how distributed BPE trainers count merges). Returns one row per
    * learned merge: (merge_rank, lhs, rhs, freq), freq counted on the
    * corpus as re-tokenized by the previous merges. */
  def bpeLearnMerges(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, merges: Int = 2)
      : org.apache.spark.sql.DataFrame =
    bpeTrainTokenize(docs, idCol, textCol, merges)._1

  /** Learn `merges` merges AND return the corpus tokenized under the full
    * learned table — the fused train-then-tokenize pass real tokenizer
    * training wants (the trainer's last rebuilt corpus is one merge short
    * of the full table, so this costs ONE extra application round versus
    * [[bpeLearnMerges]], not a from-scratch [[bpeEncode]] replay of every
    * rank). Returns (merge table, (id, pos, t) token frame). */
  def bpeTrainTokenize(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, merges: Int = 2)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    require(merges > 0, s"merges must be positive, got $merges")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    var toks = docs.select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
      .localCheckpoint(true) // iterated state
    var out: org.apache.spark.sql.DataFrame = null
    for (m <- 1 to merges) {
      val pairs = toks
        .withColumn("tn", lead("t", 1).over(w))
        .filter(col("tn").isNotNull)
        .localCheckpoint(true) // pair-count + match-scan consumers
      val top = pairs.groupBy("t", "tn").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("t").asc, col("tn").asc).limit(1)
        .select(col("t").as("mx"), col("tn").as("my"), col("freq"))
        .localCheckpoint(true) // one row
      val row = top.select(lit(m).cast("long").as("merge_rank"),
        col("mx").as("lhs"), col("my").as("rhs"), col("freq"))
      out = if (out == null) row else out.unionAll(row)
      // The last learned merge is applied too, so the returned corpus is
      // tokenized under the COMPLETE table (learn-only callers never
      // evaluate this frame: laziness keeps the old cost for them).
      toks = if (m < merges) applyTopMerge(toks, pairs, top).localCheckpoint(true)
             else applyTopMerge(toks, pairs, top)
    }
    (out, toks)
  }

  /** Greedy leftmost application of ONE merge (mx, my) to the token frame:
    * the gaps-and-islands row-number-parity rewrite shared by the learn
    * loop and [[bpeEncode]]. `pairs` is `toks` with its lead-token column
    * (passed in so the learner's checkpointed pair frame is reused). */
  private def applyTopMerge(toks: org.apache.spark.sql.DataFrame,
                            pairs: org.apache.spark.sql.DataFrame,
                            top: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val sel = pairs
      .join(broadcast(top.select("mx", "my")),
            col("t") === col("mx") && col("tn") === col("my"))
      .withColumn("rn", row_number().over(w))
      .withColumn("isl", col("pos") - col("rn"))
      .withColumn("k", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id", "isl").orderBy("pos")))
      .filter(col("k") % 2 === 1)
      .select("id", "pos")
    val consumed = sel
      .unionAll(sel.select(col("id"), (col("pos") + 1).as("pos")))
    toks.join(consumed, Seq("id", "pos"), "left_anti")
      .unionAll(sel.crossJoin(broadcast(top.select("mx", "my")))
        .select(col("id"), col("pos"), concat(col("mx"), col("my")).as("t")))
      .withColumn("pos", row_number().over(w) - 1)
      .select("id", "pos", "t")
  }

  /** BPE ENCODE: tokenize the corpus under a learned merge table (as
    * returned by [[bpeLearnMerges]]), applying each merge greedily
    * leftmost in rank order — the standard apply-merges-in-priority-order
    * tokenizer semantics. One relational pass over the corpus per merge
    * rank; every window is doc-partitioned, and each round's only global
    * exchange is the one-row merge broadcast. Returns (id, pos, t): the
    * re-tokenized corpus in long form. */
  def bpeEncode(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, mergesDf: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val md = mergesDf.select(col("merge_rank").cast("long").as("merge_rank"),
        col("lhs"), col("rhs"))
      .localCheckpoint(true) // vocab-table-sized; read once per rank below
    // One scalar pull: the rank bound drives the driver-side loop (the
    // merge table itself stays a DataFrame; each round broadcasts 1 row).
    val n = md.agg(coalesce(max("merge_rank"), lit(0L)))
      .collect()(0).getLong(0)
    var toks = docs.select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
      .localCheckpoint(true) // iterated state
    for (m <- 1L to n) {
      val top = md.filter(col("merge_rank") === m)
        .select(col("lhs").as("mx"), col("rhs").as("my"))
      val pairs = toks
        .withColumn("tn", lead("t", 1).over(w))
        .filter(col("tn").isNotNull)
      toks = applyTopMerge(toks, pairs, top).localCheckpoint(true)
    }
    toks
  }

  /** BPE ENCODE, fused: semantics identical to [[bpeEncode]] (each merge
    * rank = one greedy-leftmost pass, ranks in order — hash-identity
    * spec-checked), but the whole merge table is applied inside ONE
    * native codegen'd expression ([[graft.functions.BpeApply]]) per
    * document. [[bpeEncode]]'s per-rank driver loop costs one Spark job
    * per merge — fine at a 2-merge demo vocabulary, a job-count wall at
    * a real 30k-merge one (r7 verdict); this path's job count is flat in
    * n_merges. The merge table is collected to the driver (vocab-sized,
    * contract-bounded — the blocklist-broadcast class) and shipped as one
    * literal inside the expression. */
  def bpeEncodeFused(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, mergesDf: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    graft.functions.ArrayKernels.register(docs.sparkSession)
    val flat: Seq[String] = mergesDf
      .orderBy(col("merge_rank").asc).select("lhs", "rhs")
      .collect().toSeq.flatMap(r => Seq(r.getString(0), r.getString(1)))
    docs.select(col(idCol).as("id"),
      posexplode(graft.functions.ArrayKernels.bpeApply(
        tokens(col(textCol)), typedLit(flat))).as(Seq("pos", "t")))
  }

  /** REAL gzip decompress of one payload (RFC 1952 via the JDK's
    * GZIPInputStream) — multi-member streams (plain `cat a.gz b.gz`
    * concatenation, the WET/WARC shard layout) decode end-to-end. None
    * for payloads that are not gzip or are corrupt past recovery; a
    * truncated final member yields the bytes that survive (partial-tail
    * honesty, matching the codec layer's contract). */
  def gunzip(bytes: Array[Byte], maxBytes: Int = 1 << 26): Option[Array[Byte]] =
    gunzipEx(bytes, maxBytes).map(_._1)

  /** [[gunzip]] plus an explicit incompleteness flag: `true` when the
    * decode stopped at the size cap with more compressed data remaining
    * (detected by attempting one extra read past the cap) OR when the
    * stream ended in a mid-member IOException (partial tail). A silent
    * cap would make a >cap shard indistinguishable from a complete
    * decode and lose tail records without any signal. */
  def gunzipEx(bytes: Array[Byte], maxBytes: Int = 1 << 26)
      : Option[(Array[Byte], Boolean)] = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f ||
        (bytes(1) & 0xff) != 0x8b) return None
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](8192)
      var capped = false
      var n = in.read(buf)
      while (n > 0 && !capped) {
        val room = maxBytes - out.size()
        if (n > room) { out.write(buf, 0, room); capped = true }
        else {
          out.write(buf, 0, n)
          n = in.read(buf)
          // Cap reached exactly: probe one read to distinguish
          // "exactly done" from "tail dropped".
          if (n > 0 && out.size() >= maxBytes) capped = true
        }
      }
      in.close()
      Some((out.toByteArray, capped))
    } catch {
      case _: java.io.IOException =>
        if (out.size() > 0) Some((out.toByteArray, true)) else None
    }
  }

  final case class WarcRecord(rec_idx: Int, warc_type: String, uri: String,
                              content_length: Int, content: String)

  /** REAL WARC record walk (ISO 28500 / WARC 1.0, public spec): a shard
    * is a concatenation of records, each `WARC/1.0\r\n`, header lines to
    * the first empty line, `Content-Length` octets of content, and a
    * two-CRLF record separator. Walks by declared Content-Length (the
    * only correct way — content may contain header-looking bytes),
    * returns records in shard order; stops at the first malformed
    * record (partial-tail honesty). Content is decoded as UTF-8 for the
    * text-pipeline face. */
  def warcRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var p = 0
    var idx = 0
    var ok = true
    def lineEnd(from: Int): Int = { // index of the \r of the next CRLF
      var i = from
      while (i + 1 < bytes.length &&
             !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    while (ok && p < bytes.length) {
      val e0 = lineEnd(p)
      if (e0 < 0 ||
          !new String(bytes, p, e0 - p, "US-ASCII").startsWith("WARC/")) {
        ok = false
      } else {
        var q = e0 + 2
        var warcType = ""; var uri = ""; var clen = -1
        var headersDone = false
        while (ok && !headersDone) {
          val e = lineEnd(q)
          if (e < 0) ok = false
          else if (e == q) { headersDone = true; q = e + 2 } // empty line
          else {
            val line = new String(bytes, q, e - q, "US-ASCII")
            val ci = line.indexOf(':')
            if (ci > 0) {
              val k = line.substring(0, ci).trim.toLowerCase
              val v = line.substring(ci + 1).trim
              k match {
                case "warc-type" => warcType = v
                case "warc-target-uri" => uri = v
                case "content-length" =>
                  clen = try v.toInt catch { case _: Exception => -1 }
                case _ => ()
              }
            }
            q = e + 2
          }
        }
        if (ok && (clen < 0 || q + clen > bytes.length)) ok = false
        if (ok) {
          out += WarcRecord(idx, warcType, uri, clen,
                            new String(bytes, q, clen, "UTF-8"))
          idx += 1
          p = q + clen
          // consume the record separator (two CRLFs), tolerating EOF
          (0 until 2).foreach { _ =>
            if (p + 1 < bytes.length && bytes(p) == '\r' &&
                bytes(p + 1) == '\n') p += 2
          }
        }
      }
    }
    out.result()
  }

  /** Build a real WARC shard from (type, uri, content) triples. */
  def warcBytes(records: Seq[(String, String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (typ, uri, content) =>
      val body = content.getBytes("UTF-8")
      val hdr = s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
        s"WARC-Target-URI: $uri\r\nContent-Length: ${body.length}\r\n\r\n"
      out.write(hdr.getBytes("US-ASCII"))
      out.write(body, 0, body.length)
      out.write("\r\n\r\n".getBytes("US-ASCII"))
    }
    out.toByteArray
  }

  /** WARC-shard ingestion: explode a BINARY column of (optionally
    * gzipped — the `.warc.gz` layout) WARC shards into one row per
    * record. Partition-local codec-seam Dataset map, no shuffle.
    * `shard_truncated` is true when the gzip decode hit the size cap or
    * a mid-member error — records past that point are lost, and the flag
    * is the signal that this shard's record list is a prefix. */
  def warcCorpus(shards: org.apache.spark.sql.DataFrame, idCol: String,
                 shardCol: String): org.apache.spark.sql.DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards.select(col(idCol).cast("long").as("shard_id"), col(shardCol).as("b"))
      .as[(Long, Array[Byte])]
      .flatMap { case (sid, b) =>
        val (raw, truncated) =
          if (b != null && b.length >= 2 && (b(0) & 0xff) == 0x1f &&
              (b(1) & 0xff) == 0x8b)
            gunzipEx(b).getOrElse((Array.empty[Byte], true))
          else (Option(b).getOrElse(Array.empty[Byte]), false)
        warcRecords(raw).map(r =>
          (sid, r.rec_idx.toLong, r.warc_type, r.uri,
           r.content_length.toLong, r.content, truncated))
      }
      .toDF("shard_id", "rec_idx", "warc_type", "uri", "content_length",
            "content", "shard_truncated")
  }

  /** gzip-compress one payload (single RFC 1952 member, JDK Deflater). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Compressed-corpus ingestion: decompress a gzip BINARY column into
    * UTF-8 text plus arrival stats — the first stage of a WET-shard-style
    * pipeline. Partition-local Dataset map (the codec-seam pattern of
    * [[Multimodal.decodeFeatures]], not a per-row UDF); no shuffle — a
    * 100 TB corpus decompresses embarrassingly parallel. Returns
    * (id, n_raw_bytes, text, n_bytes, n_chars, truncated) with text null
    * and sizes −1 when the payload is not gzip; `truncated` is true when
    * the decode stopped at the size cap or a mid-member error, so a
    * partial text is never mistaken for a complete one. */
  def gunzipCorpus(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   gzCol: String): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(gzCol).as("gz"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val dec = Option(b).flatMap(gunzipEx(_))
        val t = dec.map(d => new String(d._1, "UTF-8"))
        (id, if (b == null) -1L else b.length.toLong, t.orNull,
         t.map(_.getBytes("UTF-8").length.toLong).getOrElse(-1L),
         t.map(_.length.toLong).getOrElse(-1L),
         dec.exists(_._2))
      })
      .toDF("id", "n_raw_bytes", "text", "n_bytes", "n_chars", "truncated")
  }

  /** Block-level HTML tags: opening or closing one ends the current
    * text block (inline tags — `<a>`, `<b>`, `<span>`, … — do not). */
  private val htmlBlockTags: Set[String] = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "table", "tr", "td", "th", "section", "article", "header",
    "footer", "nav", "aside", "main", "blockquote", "pre", "title",
    "body", "head", "html", "hr", "form")

  /** HTML → text extraction (round 15): the boilerplate-removal stage a
    * WARC→training-data pipeline runs on every crawl response
    * (jusText/trafilatura-class heuristics, partition-local linear
    * scan — the codec-seam discipline, never throws on malformed
    * markup). Strips `<script>`/`<style>` payloads and comments,
    * decodes entities (amp/lt/gt/quot/apos/nbsp + decimal `&#NN;` and
    * hex `&#xHH;`), segments text into blocks at block-level tags
    * (inline tags like `<a>` keep flowing), captures `<title>`
    * separately, and per block counts EXACT INTEGER link/total chars —
    * the cross-engine contract: `linkChars` = decoded characters that
    * arrived inside `<a>…</a>`, `totalChars` = length of the
    * trimmed block text, `keep` = totalChars ≥ 20 ∧ 2·linkChars ≤
    * totalChars (the link-density boilerplate rule in exact integer
    * form — no float densities to wobble). */
  def htmlExtract(html: String)
      : (String, Seq[(String, Long, Long, Boolean)]) = {
    if (html == null) return ("", Seq.empty)
    val blocks = Seq.newBuilder[(String, Long, Long, Boolean)]
    val cur = new StringBuilder
    var curLink = 0L
    val titleSb = new StringBuilder
    var inTitle = false
    var inLink = false
    var i = 0
    val n = html.length
    def flush(): Unit = {
      val t = cur.toString.trim
      if (t.nonEmpty) {
        // code POINTS (DuckDB LENGTH semantics), and link chars clamped
        // to the trimmed total: whitespace at a block edge inside an
        // anchor is counted into curLink but trimmed out of t, and the
        // invariant linkChars <= totalChars is part of the contract
        val tot = t.codePointCount(0, t.length).toLong
        val lk = math.min(curLink, tot)
        blocks += ((t, tot, lk, tot >= 20 && 2 * lk <= tot))
      }
      cur.clear(); curLink = 0L
    }
    def lower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)
    // numeric character reference, astral-safe: reject <= 0, surrogates,
    // > U+10FFFF; emit via Character.toChars so U+1F600 stays an emoji
    // instead of being truncated to its low 16 bits
    def ncr(digits: String, radix: Int): Option[String] =
      try {
        val cp = Integer.parseInt(digits, radix)
        if (cp <= 0 || cp > 0x10ffff ||
            (cp >= 0xd800 && cp <= 0xdfff)) None
        else Some(new String(Character.toChars(cp)))
      } catch { case _: Exception => None }
    // case-insensitive close-tag scan over the ORIGINAL string —
    // lowercasing the whole document and reusing its indices is wrong
    // because locale-independent case mappings can change length
    // (U+0130 'İ' lowercases to two chars), misaligning every index
    // after such a character and corrupting block extraction
    def findCloseTag(from: Int, name: String): Int = {
      val pat = "</" + name
      var j = from
      val limit = n - pat.length
      while (j <= limit) {
        if (html.regionMatches(true, j, pat, 0, pat.length)) return j
        j += 1
      }
      -1
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val e = html.indexOf('>', i + 1)
          if (e < 0) { i = n } // unterminated tag: stop (fuzz-safe)
          else {
            val inner = html.substring(i + 1, e)
            val closing = inner.startsWith("/")
            val name = lower(inner.dropWhile(_ == '/')
              .takeWhile(ch => ch.isLetterOrDigit))
            i = e + 1
            if (!closing && (name == "script" || name == "style")) {
              val ci = findCloseTag(i, name)
              i = if (ci < 0) n
                  else math.max(i, html.indexOf('>', ci) match {
                    case -1 => n
                    case x  => x + 1
                  })
            } else if (name == "a") {
              inLink = !closing
            } else if (htmlBlockTags.contains(name)) {
              flush()
              // an unclosed <title> must not swallow the document: any
              // other block-level tag ends title capture
              inTitle = name == "title" && !closing
            }
          }
        }
      } else if (c == '&') {
        val e = html.indexOf(';', i + 1)
        val decoded: Option[String] =
          if (e < 0 || e - i > 10) None
          else {
            val ent = html.substring(i + 1, e)
            ent match {
              case "amp"  => Some("&")
              case "lt"   => Some("<")
              case "gt"   => Some(">")
              case "quot" => Some("\"")
              case "apos" => Some("'")
              case "nbsp" => Some(" ")
              case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
                ncr(ent.drop(2), 16)
              case _ if ent.startsWith("#") =>
                ncr(ent.drop(1), 10)
              case _ => None
            }
          }
        decoded match {
          case Some(d) =>
            if (inTitle) titleSb.append(d)
            else {
              cur.append(d)
              if (inLink) curLink += d.codePointCount(0, d.length)
            }
            i = e + 1
          case None =>
            if (inTitle) titleSb.append(c)
            else {
              cur.append(c)
              if (inLink && !Character.isLowSurrogate(c)) curLink += 1
            }
            i += 1
        }
      } else {
        if (inTitle) titleSb.append(c)
        else {
          cur.append(c)
          if (inLink && !Character.isLowSurrogate(c)) curLink += 1
        }
        i += 1
      }
    }
    flush()
    (titleSb.toString.trim, blocks.result())
  }

  /** One robots.txt rule: allow/disallow + path pattern (with `*`
    * wildcards and an optional `$` end anchor, RFC 9309 §2.2.3). */
  final case class RobotsRule(allow: Boolean, pattern: String)

  /** robots.txt parse (RFC 9309; round 15 — the crawl-compliance stage
    * of a pipeline that refreshes or audits a crawl): groups are runs
    * of consecutive `User-agent:` lines followed by their rules; keys
    * are case-insensitive; `#` starts a comment; unknown keys and
    * malformed lines are skipped (never throws). Returns one
    * (agentToken, rules) entry per user-agent token, rules in file
    * order; the token is lowercased. */
  def robotsParse(txt: String): Seq[(String, Seq[RobotsRule])] = {
    if (txt == null) return Seq.empty
    val groups = Seq.newBuilder[(Seq[String], Seq[RobotsRule])]
    var agents = List.empty[String]
    var rules = List.empty[RobotsRule]
    var collectingAgents = true
    def flush(): Unit = {
      if (agents.nonEmpty) groups += ((agents.reverse, rules.reverse))
      agents = Nil; rules = Nil
    }
    txt.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            if (!collectingAgents) { flush(); collectingAgents = true }
            agents ::= value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" if agents.nonEmpty =>
            collectingAgents = false
            // an empty Disallow means "allow everything" — RFC 9309
            // treats it as no rule. Patterns are stored in canonical
            // percent-encoded form (§2.2.2) so matching and the
            // longest-rule tiebreak both work on octets.
            if (value.nonEmpty)
              rules ::= RobotsRule(key == "allow", pctCanonical(value))
          case _ => () // sitemap/crawl-delay/unknown: ignored
        }
      }
    }
    flush()
    groups.result().flatMap { case (as, rs) => as.map(_ -> rs) }
  }

  /** RFC 9309 §2.2.2 canonical percent-encoded form, applied to both
    * rule patterns (at parse time) and request paths (once per
    * evaluation) so the match compares octets, not accidental
    * encodings: `%XX` hex is uppercased and decoded to the literal
    * character only when the octet is UNRESERVED (ALPHA / DIGIT /
    * `-._~`, RFC 3986 §2.3 — `%41` ≡ `A` but `%2F` stays `%2F`,
    * distinct from a path `/`); raw characters outside the URI-safe
    * set (non-ASCII, space, controls, `"<>{}|\^` + backtick) are
    * percent-encoded from their UTF-8 octets. `*` and `$` are legal
    * sub-delims and the rule metacharacters — they stay raw, so
    * canonicalizing a whole pattern never disturbs its wildcards. */
  private[graft] def pctCanonical(s: String): String = {
    def hexVal(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    def unreserved(v: Int): Boolean =
      (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' ||
      v == '~'
    def keepRaw(c: Char): Boolean =
      unreserved(c) || ":/?#[]@!$&'()*+,;=".indexOf(c) >= 0
    val hex = "0123456789ABCDEF"
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (unreserved(v)) sb.append(v.toChar)
        else sb.append('%').append(hex(v >> 4)).append(hex(v & 15))
        i += 3
      } else if (keepRaw(c)) {
        sb.append(c); i += 1
      } else {
        val cp = s.codePointAt(i)
        new String(Character.toChars(cp)).getBytes("UTF-8").foreach { b =>
          sb.append('%').append(hex((b >> 4) & 15)).append(hex(b & 15))
        }
        i += Character.charCount(cp)
      }
    }
    sb.toString
  }

  /** RFC 9309 path match: `*` matches any run (including empty), `$`
    * anchors the pattern end at the path end; otherwise a prefix
    * match. Linear greedy segment scan — no regex. Operands are
    * expected in [[pctCanonical]] form (patterns are canonicalized at
    * parse time, paths once in [[robotsAllowed]]). */
  private[graft] def robotsMatch(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val segs = pat.split("\\*", -1)
    // first segment: required prefix
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    val lastIdx = segs.length - 1
    // middle segments (and the last one when unanchored): earliest
    // occurrence is optimal for '*' matching — no backtracking needed
    var i = 1
    val stop = if (anchored) lastIdx else segs.length
    while (i < stop) {
      val at = path.indexOf(segs(i), pos)
      if (at < 0) return false
      pos = at + segs(i).length
      i += 1
    }
    if (!anchored) true
    else if (lastIdx == 0) pos == path.length // no '*': exact-end prefix
    else {
      val last = segs(lastIdx)
      // "...*$": the wildcard eats the rest; otherwise the final
      // segment must sit flush at the path END, at or after pos —
      // checked independently of the greedy middles (earliest-match
      // for the LAST anchored segment would wrongly reject
      // "/a*b$" vs "/axbyb")
      last.isEmpty ||
        (path.length - last.length >= pos && path.endsWith(last))
    }
  }

  /** RFC 9309 decision for one path under one group's rules: the
    * LONGEST matching pattern wins; on a length tie, allow wins; no
    * match → allowed. Returns (allowed, winningPatternLength). */
  def robotsAllowed(rules: Seq[RobotsRule], path: String)
      : (Boolean, Int) = {
    val canon = pctCanonical(path) // once per path, not per rule
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (robotsMatch(r.pattern, canon)) {
        val l = r.pattern.length
        if (l > bestLen || (l == bestLen && r.allow && !bestAllow)) {
          bestLen = l; bestAllow = r.allow
        }
      }
    }
    (if (bestLen < 0) true else bestAllow, math.max(bestLen, 0))
  }

  /** Group selection (RFC 9309 §2.2.1): the group whose user-agent
    * token equals the product token (case-insensitive) if present,
    * else the `*` group, else no rules. THE MATCHED GROUP IS EXCLUSIVE
    * — rules from `*` do NOT merge into a named group (the classic
    * implementation bug this op's fixture exercises). */
  def robotsGroup(groups: Seq[(String, Seq[RobotsRule])],
                  agent: String): Seq[RobotsRule] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    // RFC 9309 §2.2.1: ALL groups naming the same token combine into
    // one rule set (sites routinely append a second group for the same
    // crawler later in the file) — taking only the first group would
    // silently drop the later rules. Matching is exclusive on group
    // EXISTENCE, not on rule count: a named group with ZERO rules
    // (e.g. 'User-agent: graftbot' followed by an empty 'Disallow:' —
    // the common allow-everything exemption) still claims the agent
    // and means everything is allowed; falling back to '*' there
    // would over-block the exempted crawler.
    if (groups.exists(_._1 == a))
      groups.collect { case (t, rs) if t == a => rs }.flatten
    else groups.collect { case ("*", rs) => rs }.flatten
  }

  /** DataFrame face: evaluate every (domain, path) URL against its
    * domain's robots.txt for a crawler token. The robots side is
    * per-domain tiny — BROADCAST it; the URL side streams map-side
    * with zero shuffle, which is the 100 TB shape (robots.txt count =
    * domain count, always broadcastable). */
  def robotsFilter(urls: org.apache.spark.sql.DataFrame, idCol: String,
                   domainCol: String, pathCol: String,
                   robots: org.apache.spark.sql.DataFrame,
                   robotsDomainCol: String, robotsTxtCol: String,
                   agent: String): org.apache.spark.sql.DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val parsed = robots
      .select(col(robotsDomainCol).cast("string").as("domain"),
              col(robotsTxtCol).cast("string").as("txt"))
      .as[(String, String)]
      .map { case (d, t) =>
        val rs = robotsGroup(robotsParse(t), agent)
        (d, rs.map(r => (r.allow, r.pattern)))
      }
      .toDF("domain", "rules")
    urls.select(col(idCol).cast("long").as("id"),
                col(domainCol).cast("string").as("domain"),
                col(pathCol).cast("string").as("path"))
      .join(org.apache.spark.sql.functions.broadcast(parsed),
            Seq("domain"), "left")
      .as[(String, Long, String, Option[Seq[(Boolean, String)]])]
      .map { case (domain, id, path, rules) =>
        val rs = rules.getOrElse(Seq.empty)
          .map { case (a, p) => RobotsRule(a, p) }
        val (allowed, len) = robotsAllowed(rs, path)
        (id, domain, path, allowed, len.toLong)
      }
      .toDF("id", "domain", "path", "allowed", "rule_len")
  }

  /** sitemap.xml parse (round 15; the robots.txt companion a crawl
    * frontier consumes): both document kinds — `<urlset>` with
    * `<url><loc/><lastmod/><priority/></url>` entries and
    * `<sitemapindex>` with `<sitemap><loc/></sitemap>` entries — via a
    * linear tag scan (no XML library; never throws on malformed
    * input). `&amp;`/`&lt;`/`&gt;` in locs decode (query strings in
    * URLs are routinely entity-escaped); absent lastmod → empty
    * string, absent priority → -1. Returns
    * (kind, loc, lastmod, priority). */
  def sitemapEntries(xml: String): Seq[(String, String, String, Double)] = {
    if (xml == null) return Seq.empty
    def unesc(s: String): String =
      s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
    def nameChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.' || c == ':'
    // Real-world sitemap tags carry attributes and namespace prefixes —
    // '<url changefreq="daily">', '<sm:loc>' — so matching the exact
    // literal '<tag>' silently skips those entries. Match the LOCAL
    // name (prefix stripped) followed by '>', whitespace, or '/'.
    // Returns (tagStart, contentStart) of the next open tag whose local
    // name equals `tag`, or null; self-closing tags yield an empty
    // content span at the tag end.
    def findOpen(tag: String, from: Int): (Int, Int) = {
      var p = from
      while (true) {
        val o = xml.indexOf('<', p)
        if (o < 0 || o + 1 >= xml.length) return null
        val c1 = xml.charAt(o + 1)
        if (c1 == '/' || c1 == '!' || c1 == '?') { p = o + 1 }
        else {
          var k = o + 1
          while (k < xml.length && nameChar(xml.charAt(k))) k += 1
          val name = xml.substring(o + 1, k)
          val local = name.substring(name.lastIndexOf(':') + 1)
          val followOk = k < xml.length &&
            (xml.charAt(k) == '>' || xml.charAt(k) == '/' ||
             xml.charAt(k).isWhitespace)
          if (local == tag && name.nonEmpty && followOk) {
            val gt = xml.indexOf('>', k)
            if (gt < 0) return null // unterminated tag: fuzz-safe stop
            // '<tag .../>': self-closing, empty content
            if (xml.charAt(gt - 1) == '/') return (o, -(gt + 1))
            return (o, gt + 1)
          }
          p = o + 1
        }
      }
      null
    }
    // next '</tag>' (namespace-prefix tolerant) at/after `from`;
    // returns (closeStart, closeEnd) or null
    def findClose(tag: String, from: Int): (Int, Int) = {
      var p = from
      while (true) {
        val o = xml.indexOf("</", p)
        if (o < 0) return null
        var k = o + 2
        while (k < xml.length && nameChar(xml.charAt(k))) k += 1
        val name = xml.substring(o + 2, k)
        val local = name.substring(name.lastIndexOf(':') + 1)
        var e = k
        while (e < xml.length && xml.charAt(e).isWhitespace) e += 1
        if (local == tag && e < xml.length && xml.charAt(e) == '>')
          return (o, e + 1)
        p = o + 2
      }
      null
    }
    def inner(blockStart: Int, blockEnd: Int, tag: String)
        : Option[String] = {
      val o = findOpen(tag, blockStart)
      if (o == null || o._1 >= blockEnd) None
      else if (o._2 < 0) Some("") // self-closing
      else {
        val c = findClose(tag, o._2)
        if (c == null || c._1 > blockEnd) None
        else Some(xml.substring(o._2, c._1).trim)
      }
    }
    def entries(entryTag: String, kind: String)
        : Seq[(String, String, String, Double)] = {
      val out = Seq.newBuilder[(String, String, String, Double)]
      var p = 0
      var go = true
      while (go) {
        val o = findOpen(entryTag, p)
        if (o == null) go = false
        else if (o._2 < 0) { p = -o._2 } // self-closing entry: skip
        else {
          val c = findClose(entryTag, o._2)
          if (c == null) go = false
          else {
            inner(o._2, c._1, "loc").map(unesc).filter(_.nonEmpty)
              .foreach { loc =>
                val lastmod = inner(o._2, c._1, "lastmod").getOrElse("")
                val prio = inner(o._2, c._1, "priority")
                  .flatMap(v => scala.util.Try(v.toDouble).toOption)
                  .getOrElse(-1.0)
                out += ((kind, loc, lastmod, prio))
              }
            p = c._2
          }
        }
      }
      out.result()
    }
    if (findOpen("sitemapindex", 0) != null) entries("sitemap", "index")
    else if (findOpen("urlset", 0) != null) entries("url", "urlset")
    else Seq.empty
  }

  /** DataFrame face of [[sitemapEntries]]: one row per entry —
    * (id, kind, loc, lastmod, priority). Partition-local flatMap. */
  def sitemapUrls(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  xmlCol: String): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"),
                col(xmlCol).cast("string").as("x"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, x) =>
        sitemapEntries(x).map { case (k, l, m, pr) => (id, k, l, m, pr) }
      })
      .toDF("id", "kind", "loc", "lastmod", "priority")
  }

  /** Charset sniffing (round 15): the encoding stage a crawl pipeline
    * runs before any text op (ccnet/RefinedWeb shape — try strict
    * UTF-8, fall back to Latin-1). A STRICT UTF-8 validator
    * (RFC 3629 ranges: no overlongs, no surrogates, no > U+10FFFF —
    * `C0 80` and `ED A0 80` are invalid by construction) classifies
    * the bytes: `ascii` (no byte ≥ 0x80), `utf8` (valid non-ASCII), or
    * `latin1` (invalid UTF-8 → ISO-8859-1 decode, which maps byte k to
    * code point k exactly). `nBad` counts the bytes that are part of
    * no valid sequence — an exact integer both engines agree on.
    * Partition-local, never throws. */
  def utf8Sniff(bytes: Array[Byte]): (String, String, Long) = {
    if (bytes == null) return ("ascii", "", 0L)
    val n = bytes.length
    var i = 0
    var nBad = 0L
    var hasHigh = false
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) i += 1
      else {
        hasHigh = true
        val (need, lo, hi) =
          if (b >= 0xc2 && b <= 0xdf) (1, 0x80, 0xbf)
          else if (b == 0xe0) (2, 0xa0, 0xbf)
          else if (b >= 0xe1 && b <= 0xec) (2, 0x80, 0xbf)
          else if (b == 0xed) (2, 0x80, 0x9f) // no surrogates
          else if (b >= 0xee && b <= 0xef) (2, 0x80, 0xbf)
          else if (b == 0xf0) (3, 0x90, 0xbf)
          else if (b >= 0xf1 && b <= 0xf3) (3, 0x80, 0xbf)
          else if (b == 0xf4) (3, 0x80, 0x8f)
          else (-1, 0, 0) // 0x80..0xC1 leads and 0xF5+ are never valid
        if (need < 0) { nBad += 1; i += 1 }
        else {
          // first continuation must sit in the lead-specific range,
          // the rest in 0x80..0xBF; any break = the LEAD byte is bad,
          // rescan from the next byte (maximal-subpart resync)
          var okSeq = i + need < n
          if (okSeq) {
            val c1 = bytes(i + 1) & 0xff
            okSeq = c1 >= lo && c1 <= hi
            var j = 2
            while (okSeq && j <= need) {
              val cj = bytes(i + j) & 0xff
              okSeq = cj >= 0x80 && cj <= 0xbf
              j += 1
            }
          }
          if (okSeq) i += need + 1
          else { nBad += 1; i += 1 }
        }
      }
    }
    if (!hasHigh) ("ascii", new String(bytes, "US-ASCII"), 0L)
    else if (nBad == 0) ("utf8", new String(bytes, "UTF-8"), 0L)
    else ("latin1", new String(bytes, "ISO-8859-1"), nBad)
  }

  /** DataFrame face of [[utf8Sniff]]:
    * (id, mode, text, n_bytes, n_chars, n_bad). */
  def charsetSniff(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   bytesCol: String): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(bytesCol).as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val (mode, text, nBad) = utf8Sniff(b)
        // code POINTS, not UTF-16 units — astral chars are one char in
        // DuckDB's LENGTH and must be one here too
        (id, mode, text, if (b == null) 0L else b.length.toLong,
         text.codePointCount(0, text.length).toLong, nBad)
      })
      .toDF("id", "mode", "text", "n_bytes", "n_chars", "n_bad")
  }

  /** DataFrame face of [[htmlExtract]]: one row per text block —
    * (id, title, block_idx, block_text, n_chars, link_chars, keep).
    * Partition-local flatMap, no shuffle; at 100 TB this runs where the
    * WARC bytes already sit, exactly like [[warcCorpus]]. */
  def htmlBlocks(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 htmlCol: String): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"),
                col(htmlCol).cast("string").as("h"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, h) =>
        val (title, bs) = htmlExtract(h)
        bs.zipWithIndex.map { case ((t, tot, lk, keep), bi) =>
          (id, title, bi.toLong, t, tot, lk, keep)
        }
      })
      .toDF("id", "title", "block_idx", "block_text", "n_chars",
            "link_chars", "keep")
  }
}
