package graft.pipeline

/** ISO 11172-3 Table B.7 Huffman code tables — the REAL table data for
  * the Layer III big-values walker ([[Multimodal.L3Tables]]), shipped
  * under the repo's spec-table policy: a table is registered ONLY when
  * its recalled data passes BOTH structural closure checks that a
  * correct ISO code table must satisfy —
  *
  *   1. PREFIX-FREENESS: no codeword is a prefix of another, and
  *   2. KRAFT COMPLETENESS: Σ 2^(−hlen) == 1 exactly (every ISO B.7
  *      code table is a complete prefix code — verified here for each
  *      shipped table with exact integer arithmetic),
  *
  * plus v < 2^hlen per entry. `L3HuffTablesSpec` re-asserts all three
  * properties for every registered table on every build, and round-trips
  * each (x, y) entry through the decoder's codeword walk.
  *
  * Shipped: big-values tables 1, 2, 3, 5, 6, 7, 8, 9, 10, 12 and count1
  * table A (code data as published in ISO 11172-3 Table B.7 and in every
  * public decoder's tables, e.g. dist10 `huffdec` / ffmpeg
  * `mpegaudiotabs`). Table 8 carried a single-length ambiguity under the
  * closure checks — the Kraft/prefix constraints narrowed the recalled
  * layout to exactly two one-entry completions ((4,5) vs (5,3) at hlen
  * 9/10) and the second recollection (row layout `9,8,9,9,11,11`) plus
  * the cross-table length ordering (table 9 gives (5,3) the shorter
  * code) pin (5,3)=9, (4,5)=10.
  *
  * Table 12 shipped in round 15: its 64 code VALUES were recalled
  * identically in two separate sessions (64/64 agreement), and the
  * round-15 length recollection passes the full gate exactly (the
  * round-14 length recall — 7 entries different — failed Kraft at
  * 519/512, the gate doing its job). Closure caveat, recorded honestly:
  * the exact-tiling solver shows the lengths are NOT uniquely forced by
  * the codes — alternates exist that swap lengths between equal-code
  * entry pairs (e.g. (0,1)/(1,2), both code 6, at hlen 3/4) — so the
  * (x, y) attribution of ~7 entries rests on the gate-passing
  * recollection, the same evidence level as tables 1–7/9/10 (each
  * shipped on a single recollection that passed the gate outright).
  *
  * NOT shipped (still declared, `SURVEY.md` §2.10): table 11 (two
  * recollections of its code values disagree on 62/64 entries and
  * neither passes the gate — no ≤3-entry repair exists) and the 16×16
  * tables 13, 15, 16/24 (with their linbits families 17–23 / 25–31):
  * their 256-entry CODE arrays exceed reliable recall, and the table-12
  * solver result above proves lengths alone cannot reconstruct them
  * (multiple tilings exist even at 64 entries); the ESC/linbits
  * MACHINERY itself is proven through the synthetic slot-4 table
  * (`multimodal_mp3_linbits`).
  */
object L3IsoHuff {

  /** (dim, hlen row-major x·dim+y, hcod row-major). */
  private val raw: Map[Int, (Int, Array[Int], Array[Int])] = Map(
    1 -> ((2,
      Array(1, 3, 2, 3),
      Array(1, 1, 1, 0))),
    2 -> ((3,
      Array(1, 3, 6, 3, 3, 5, 5, 5, 6),
      Array(1, 2, 1, 3, 1, 1, 3, 2, 0))),
    3 -> ((3,
      Array(2, 2, 6, 3, 2, 5, 5, 5, 6),
      Array(3, 2, 1, 1, 1, 1, 3, 2, 0))),
    5 -> ((4,
      Array(1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8),
      Array(1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0))),
    6 -> ((4,
      Array(3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7),
      Array(7, 3, 5, 1, 6, 2, 3, 2, 5, 4, 4, 1, 3, 3, 2, 0))),
    7 -> ((6,
      Array(1, 3, 6, 8, 8, 9, 3, 4, 6, 7, 7, 8, 6, 5, 7, 8,
            8, 9, 7, 7, 8, 9, 9, 9, 7, 7, 8, 9, 9, 10, 8, 8,
            9, 10, 10, 10),
      Array(1, 2, 10, 19, 16, 10, 3, 3, 7, 10, 5, 3, 11, 4, 13, 17,
            8, 4, 12, 11, 18, 15, 11, 2, 7, 6, 9, 14, 3, 1, 6, 4,
            5, 3, 2, 0))),
    8 -> ((6,
      Array(2, 3, 6, 8, 8, 9, 3, 2, 4, 8, 8, 8, 6, 4, 6, 8,
            8, 9, 8, 8, 8, 9, 9, 10, 8, 7, 8, 9, 10, 10, 9, 8,
            9, 9, 11, 11),
      Array(3, 4, 6, 18, 12, 5, 5, 1, 2, 16, 9, 3, 7, 3, 5, 14,
            7, 3, 19, 17, 15, 13, 10, 4, 13, 5, 8, 11, 5, 1, 12, 4,
            4, 1, 1, 0))),
    9 -> ((6,
      Array(3, 3, 5, 6, 8, 9, 3, 3, 4, 5, 6, 8, 4, 4, 5, 6,
            7, 8, 6, 5, 6, 7, 7, 8, 7, 6, 7, 7, 8, 9, 8, 7,
            8, 8, 9, 9),
      Array(7, 5, 9, 14, 15, 7, 6, 4, 5, 5, 6, 7, 7, 6, 8, 8,
            8, 5, 15, 6, 9, 10, 5, 1, 11, 7, 9, 6, 4, 1, 14, 4,
            6, 2, 6, 0))),
    10 -> ((8,
      Array(1, 3, 6, 8, 9, 9, 9, 10, 3, 4, 6, 7, 8, 9, 8, 8,
            6, 6, 7, 8, 9, 10, 9, 9, 7, 7, 8, 9, 10, 10, 9, 10,
            8, 8, 9, 10, 10, 10, 10, 10, 9, 9, 10, 10, 11, 11, 10, 11,
            8, 8, 9, 10, 10, 10, 11, 11, 9, 8, 9, 10, 10, 11, 11, 11),
      Array(1, 2, 10, 23, 35, 30, 12, 17, 3, 3, 8, 12, 18, 21, 12, 7,
            11, 9, 15, 21, 32, 40, 19, 6, 14, 13, 22, 34, 46, 23, 18, 7,
            20, 19, 33, 47, 27, 22, 9, 3, 31, 22, 41, 26, 21, 20, 5, 3,
            14, 13, 10, 11, 16, 6, 5, 1, 9, 8, 7, 8, 4, 4, 2, 0))),
    12 -> ((8,
      Array(4, 3, 5, 7, 8, 9, 9, 9, 3, 3, 4, 5, 7, 7, 8, 8,
            5, 4, 5, 6, 7, 8, 7, 8, 6, 5, 6, 6, 7, 8, 8, 8,
            7, 6, 7, 7, 8, 8, 8, 9, 8, 7, 8, 8, 8, 9, 8, 9,
            8, 7, 7, 8, 8, 9, 9, 10, 9, 8, 8, 9, 9, 9, 9, 10),
      Array(9, 6, 16, 33, 41, 39, 38, 26, 7, 5, 6, 9, 23, 16, 26, 11,
            17, 7, 11, 14, 21, 30, 10, 7, 17, 10, 15, 12, 18, 28, 14, 5,
            32, 13, 22, 19, 18, 16, 9, 5, 40, 17, 31, 29, 17, 13, 4, 2,
            27, 12, 11, 15, 10, 7, 4, 1, 27, 12, 8, 12, 6, 3, 1, 0))))

  /** count1 table A (quad table, indexed v·8+w·4+x·2+y). Complete
    * (Kraft Σ = 1) and prefix-free; count1 table B is the closed-form
    * 4-bit complement code and lives directly in the decoder. */
  val quadABits: Array[Int] =
    Array(1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6)
  val quadACodes: Array[Int] =
    Array(1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1)

  private def codeword(v: Int, len: Int): String = {
    val s = v.toBinaryString
    "0" * (len - s.length) + s
  }

  /** Registered decode tables: table id → codeword → (x, y). */
  val tables: Map[Int, Multimodal.L3HuffTable] = raw.map {
    case (tid, (dim, bits, codes)) =>
      val m = (0 until dim * dim).map { i =>
        codeword(codes(i), bits(i)) -> ((i / dim, i % dim))
      }.toMap
      require(m.size == dim * dim, s"table $tid: duplicate codeword")
      tid -> Multimodal.L3HuffTable(m, 0, bits.max)
  }

  /** Encode direction for fixtures: table id → (x, y) → codeword. */
  val encode: Map[Int, Map[(Int, Int), String]] = tables.map {
    case (tid, t) => tid -> t.codes.map { case (w, xy) => xy -> w }
  }

  /** count1 table A decode: codeword → 4-bit (v,w,x,y) index. */
  val quadA: Map[String, Int] =
    quadACodes.indices.map(i => codeword(quadACodes(i), quadABits(i)) -> i).toMap
  val quadAMaxLen: Int = quadABits.max

  /** count1 table A encode: 4-bit index → codeword. */
  val quadAEncode: Array[String] =
    Array.tabulate(16)(i => codeword(quadACodes(i), quadABits(i)))

  /** Exact structural closure data for the spec: (hlen, hcod) pairs per
    * registered table (synthetic slot 4 is not in here by construction). */
  def entries(tid: Int): Seq[(Int, Int)] = {
    val (_, bits, codes) = raw(tid)
    bits.toSeq.zip(codes.toSeq)
  }
  def tableIds: Seq[Int] = raw.keys.toSeq.sorted

  // ---------------------------------------------------------------------
  // Runtime-loadable tables (round 16). The recall route for ISO tables
  // 11/13/15 and the 16/24 linbits families is exhausted (scaladoc
  // above); instead of remembering data we cannot verify, a user WHO HAS
  // THE SPEC mounts it at runtime: `load(path)` parses a plain-text
  // table file and admits each table only through the SAME structural
  // closure gate the shipped tables pass per build (L3HuffTablesSpec) —
  // exact Kraft completeness, prefix-freeness, per-entry v < 2^hlen.
  // Gate-failing data throws; nothing is registered partially. The
  // result feeds [[Multimodal.layer3DecodeFull]]'s `extraTables`
  // parameter (closure-captured, so it ships with Spark tasks).
  //
  // File format (comments with '#', blank lines ignored):
  //   table <tid> dim <d> linbits <n>
  //   <hlen> <hcod>            -- d*d entry lines, row-major x*d+y
  // ---------------------------------------------------------------------

  /** ISO big-values table dims: tables 1-15 are 2/3/4/6/8-dim; the
    * linbits families 16-31 are 16-dim. Loadable ids are the spec's
    * defined-but-unshipped slots only. */
  private val isoDims = Set(2, 3, 4, 6, 8, 16)

  /** Validate one candidate table through the closure gate; returns the
    * decode table or throws IllegalArgumentException with the failing
    * property named. */
  def gate(tid: Int, dim: Int, linbits: Int,
           bits: Array[Int], codes: Array[Int]): Multimodal.L3HuffTable = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"table $tid: $msg")
    if (tid < 1 || tid > 31) fail(s"table id out of range 1..31")
    if (Multimodal.L3Tables.contains(tid))
      fail("collides with a registered table (shipped ISO data and the " +
           "synthetic slot 4 cannot be overridden)")
    if (!isoDims.contains(dim)) fail(s"dim $dim not an ISO table dim")
    if (linbits < 0 || linbits > 13) fail(s"linbits $linbits out of 0..13")
    if (bits.length != dim * dim || codes.length != dim * dim)
      fail(s"expected ${dim * dim} entries, got ${bits.length}")
    bits.zip(codes).zipWithIndex.foreach { case ((len, v), i) =>
      if (len < 1 || len > 19) fail(s"entry $i hlen $len out of 1..19")
      if (v < 0 || v >= (1 << len)) fail(s"entry $i code $v !< 2^$len")
    }
    // Kraft completeness in exact integer arithmetic: Σ 2^(32-len) must
    // equal 2^32 — every ISO B.7 table is a COMPLETE prefix code
    val unit = 1L << 32
    val kraft = bits.map(l => unit >> l).sum
    if (kraft != unit)
      fail(s"not Kraft-complete (sum ${kraft}/2^32)")
    val words = bits.zip(codes).map { case (len, v) => codeword(v, len) }
    if (words.distinct.length != words.length) fail("duplicate codeword")
    val sorted = words.sorted
    sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
      if (b.startsWith(a)) fail(s"not prefix-free ($a prefixes $b)")
    }
    val m = words.zipWithIndex.map { case (w, i) =>
      w -> ((i / dim, i % dim))
    }.toMap
    Multimodal.L3HuffTable(m, linbits, bits.max)
  }

  /** Parse + gate a table file's text (see format above). */
  def parse(text: String): Map[Int, Multimodal.L3HuffTable] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"hufftable file: $msg")
    val lines = text.split("\n", -1).iterator
      .map(_.takeWhile(_ != '#').trim).filter(_.nonEmpty).toSeq
    val out = Map.newBuilder[Int, Multimodal.L3HuffTable]
    val seen = scala.collection.mutable.Set[Int]()
    var i = 0
    while (i < lines.length) {
      val hdr = lines(i).split("\\s+")
      if (hdr.length != 6 || hdr(0) != "table" || hdr(2) != "dim" ||
          hdr(4) != "linbits")
        fail(s"bad header line '${lines(i)}' (want: table <tid> dim <d> " +
             "linbits <n>)")
      val (tid, dim, lb) =
        try ((hdr(1).toInt, hdr(3).toInt, hdr(5).toInt))
        catch { case _: NumberFormatException =>
          fail(s"non-integer field in '${lines(i)}'") }
      if (!seen.add(tid)) fail(s"table $tid appears twice")
      // dim gates BEFORE the n = dim² allocation: an unvalidated header
      // dim must die as the documented gate failure, not as an
      // integer-overflow NegativeArraySizeException or a driver OOM
      // from a multi-GB allocation (round-16 review)
      if (!isoDims.contains(dim)) fail(s"dim $dim not an ISO table dim")
      val n = dim * dim
      val bits = new Array[Int](n)
      val codes = new Array[Int](n)
      var k = 0
      while (k < n) {
        if (i + 1 + k >= lines.length)
          fail(s"table $tid: truncated (need $n entry lines)")
        val e = lines(i + 1 + k).split("\\s+")
        if (e.length != 2) fail(s"table $tid entry $k: want '<hlen> <hcod>'")
        try { bits(k) = e(0).toInt; codes(k) = e(1).toInt }
        catch { case _: NumberFormatException =>
          fail(s"table $tid entry $k: non-integer") }
        k += 1
      }
      out += tid -> gate(tid, dim, lb, bits, codes)
      i += 1 + n
    }
    val r = out.result()
    if (r.isEmpty) fail("no tables found")
    r
  }

  /** Load + gate-validate big-values tables from a file; throws on any
    * structural failure, registers nothing partially. */
  def load(path: String): Map[Int, Multimodal.L3HuffTable] =
    parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8"))

  /** GRAFT-SYNTHETIC structured 16×16 fixture code for the loader row
    * and spec (NOT ISO data — it proves the load/gate/decode MECHANISM
    * a real spec-table file would travel): canonical code with 64
    * codewords of length 7, 64 of length 8, 128 of length 9 —
    * Kraft-exact (64/128 + 64/256 + 128/512 = 1) and prefix-free by
    * canonical construction. */
  def synthLoadLens: Array[Int] =
    Array.tabulate(256)(i => if (i < 64) 7 else if (i < 128) 8 else 9)
  def synthLoadCodes: Array[Int] = {
    val lens = synthLoadLens
    val out = new Array[Int](256)
    var c = 0
    var prev = lens(0)
    var i = 0
    while (i < 256) {
      c <<= (lens(i) - prev); prev = lens(i)
      out(i) = c; c += 1; i += 1
    }
    out
  }

  /** Render the synthetic fixture table file: the same data mounted at
    * each requested (tid, linbits). */
  def synthLoadFileText(slots: Seq[(Int, Int)]): String = {
    val lens = synthLoadLens
    val codes = synthLoadCodes
    val sb = new StringBuilder
    sb.append("# GRAFT-SYNTHETIC loadable big-values tables (mechanism " +
      "fixture, not ISO data)\n")
    slots.foreach { case (tid, lb) =>
      sb.append(s"table $tid dim 16 linbits $lb\n")
      var i = 0
      while (i < 256) {
        sb.append(lens(i)).append(' ').append(codes(i)).append('\n')
        i += 1
      }
    }
    sb.toString
  }

  /** Encode map for the synthetic loadable table (fixture direction). */
  def synthLoadEncode: Map[(Int, Int), String] = {
    val lens = synthLoadLens
    val codes = synthLoadCodes
    (0 until 256).map(i => (i / 16, i % 16) -> codeword(codes(i), lens(i)))
      .toMap
  }
}
