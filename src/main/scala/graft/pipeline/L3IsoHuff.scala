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
private[graft] object L3IsoHuff {

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
}
