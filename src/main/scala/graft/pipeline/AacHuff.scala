package graft.pipeline

/** AAC-LC Huffman codebooks under the repo's spec-table policy
  * (established by [[L3IsoHuff]] for the MP3 tables): the DECODE
  * MACHINERY is real and fully tested, but the per-codebook code data
  * published in ISO/IEC 13818-7 / 14496-3 Table 4.A (eleven spectral
  * codebooks + the scalefactor codebook — up to 289 codewords each) is
  * beyond reliable recall, so NO recalled ISO code data ships. Instead:
  *
  *   - GRAFT-SYNTHETIC canonical codebooks with the REAL dims/LAV/
  *     signedness layout of each ISO book (see [[spec]]) prove the
  *     decode mechanism end-to-end (the fixture generator encodes with
  *     them, the decoder decodes with them, both behind an explicit
  *     `allowSyntheticBooks` opt-in so a real AAC file can never be
  *     silently decoded against non-ISO tables), and
  *   - a user WHO HAS THE SPEC mounts the real tables at runtime via
  *     [[load]]: a plain-text file parsed and admitted only through the
  *     same structural closure gate the MP3 loader uses — exact Kraft
  *     completeness (every ISO AAC codebook is a complete Huffman code
  *     built from training frequencies), prefix-freeness, and per-entry
  *     `code < 2^len` — with nothing registered partially.
  *
  * Book ids: 0 = scalefactor book (121 entries, dpcm index −60..+60),
  * 1..11 = the spectral books. Spectral layout (ISO 14496-3 §4.6.3.3):
  * books 1/2 are signed 4-tuples LAV 1 (81 entries, index
  * ((w+1)·3+(x+1))·9+(y+1)·3+(z+1)), 3/4 unsigned 4-tuples LAV 2 (81,
  * w·27+x·9+y·3+z), 5/6 signed pairs LAV 4 (81, (y+4)·9+(z+4)), 7/8
  * unsigned pairs LAV 7 (64, y·8+z), 9/10 unsigned pairs LAV 12 (169,
  * y·13+z), 11 unsigned pairs LAV 16 with escapes (289, y·17+z).
  * Unsigned books transmit sign bits after the codeword, one per
  * nonzero value; book 11 values of 16 extend with an escape sequence.
  */
object AacHuff {

  /** One decode table: codeword (as a 0/1 string) → linear index. */
  final case class Book(decode: Map[String, Int], n: Int, maxLen: Int)

  /** Structural layout of each ISO book id: (entries, tupleSize, lav,
    * signed). Book 0 is the scalefactor book (tuple 1, dpcm −60..60). */
  val spec: Map[Int, (Int, Int, Int, Boolean)] = Map(
    0 -> ((121, 1, 60, true)),
    1 -> ((81, 4, 1, true)), 2 -> ((81, 4, 1, true)),
    3 -> ((81, 4, 2, false)), 4 -> ((81, 4, 2, false)),
    5 -> ((81, 2, 4, true)), 6 -> ((81, 2, 4, true)),
    7 -> ((64, 2, 7, false)), 8 -> ((64, 2, 7, false)),
    9 -> ((169, 2, 12, false)), 10 -> ((169, 2, 12, false)),
    11 -> ((289, 2, 16, false)))

  private def codeword(v: Int, len: Int): String = {
    val s = v.toBinaryString
    "0" * (len - s.length) + s
  }

  /** Canonical complete code over `n` symbols: `s` codewords of length
    * `l = ⌊log2 n⌋` and `n − s` of length `l + 1` with s solving Kraft
    * exactly (2s + (n − s) = 2^(l+1), so 0 < s ≤ n, = n iff n = 2^l),
    * assigned in index order. */
  private[pipeline] def canonicalLens(n: Int): Array[Int] = {
    val l = 31 - Integer.numberOfLeadingZeros(n) // floor(log2 n)
    val s = (1 << (l + 1)) - n                   // count at length l
    Array.tabulate(n)(i => if (i < s) l else l + 1)
  }

  private[pipeline] def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val out = new Array[Int](lens.length)
    var c = 0
    var prev = lens(0)
    var i = 0
    while (i < lens.length) {
      c <<= (lens(i) - prev); prev = lens(i)
      out(i) = c; c += 1; i += 1
    }
    out
  }

  /** GRAFT-SYNTHETIC books, one per ISO slot, with the slot's REAL
    * entry count. Index→codeword is canonical over a per-book rotation
    * of the index space (rotation seeded by the book id so two books of
    * equal size differ — a decode against the wrong book cannot
    * silently agree). */
  val synthetic: Map[Int, Book] = spec.map { case (bid, (n, _, _, _)) =>
    val lens = canonicalLens(n)
    val codes = canonicalCodes(lens)
    val rot = (bid * 37) % n
    val m = (0 until n).map { i =>
      codeword(codes(i), lens(i)) -> ((i + rot) % n)
    }.toMap
    bid -> Book(m, n, lens.max)
  }

  /** Encode direction of [[synthetic]] for the fixture generator. */
  val syntheticEncode: Map[Int, Map[Int, String]] = synthetic.map {
    case (bid, b) => bid -> b.decode.map { case (w, i) => i -> w }
  }

  /** Validate one candidate book through the closure gate; returns the
    * decode table or throws with the failing property named. */
  def gate(bid: Int, lens: Array[Int], codes: Array[Int]): Book = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"aac book $bid: $msg")
    val n = spec.getOrElse(bid,
      fail(s"unknown book id (want 0..11)"))._1
    if (lens.length != n || codes.length != n)
      fail(s"expected $n entries, got ${lens.length}")
    lens.zip(codes).zipWithIndex.foreach { case ((len, v), i) =>
      if (len < 1 || len > 19) fail(s"entry $i len $len out of 1..19")
      if (v < 0 || v >= (1 << len)) fail(s"entry $i code $v !< 2^$len")
    }
    val unit = 1L << 32
    val kraft = lens.map(l => unit >> l).sum
    if (kraft != unit) fail(s"not Kraft-complete (sum $kraft/2^32)")
    val words = lens.zip(codes).map { case (len, v) => codeword(v, len) }
    if (words.distinct.length != words.length) fail("duplicate codeword")
    val sorted = words.sorted
    sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
      if (b.startsWith(a)) fail(s"not prefix-free ($a prefixes $b)")
    }
    Book(words.zipWithIndex.toMap, n, lens.max)
  }

  /** Parse + gate a codebook file. Format (comments '#', blanks
    * ignored): `book <bid>` header then n entry lines `<len> <code>`
    * in linear-index order. */
  def parse(text: String): Map[Int, Book] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"aac codebook file: $msg")
    val lines = text.split("\n", -1).iterator
      .map(_.takeWhile(_ != '#').trim).filter(_.nonEmpty).toSeq
    val out = Map.newBuilder[Int, Book]
    val seen = scala.collection.mutable.Set[Int]()
    var i = 0
    while (i < lines.length) {
      val hdr = lines(i).split("\\s+")
      if (hdr.length != 2 || hdr(0) != "book")
        fail(s"bad header line '${lines(i)}' (want: book <bid>)")
      val bid =
        try hdr(1).toInt
        catch { case _: NumberFormatException =>
          fail(s"non-integer book id in '${lines(i)}'") }
      // entry count gates BEFORE allocation (the L3IsoHuff parse-time
      // dim lesson): an unknown id must die as the documented failure
      val n = spec.getOrElse(bid, fail(s"unknown book id $bid"))._1
      if (!seen.add(bid)) fail(s"book $bid appears twice")
      val lens = new Array[Int](n)
      val codes = new Array[Int](n)
      var k = 0
      while (k < n) {
        if (i + 1 + k >= lines.length)
          fail(s"book $bid: truncated (need $n entry lines)")
        val e = lines(i + 1 + k).split("\\s+")
        if (e.length != 2) fail(s"book $bid entry $k: want '<len> <code>'")
        try { lens(k) = e(0).toInt; codes(k) = e(1).toInt }
        catch { case _: NumberFormatException =>
          fail(s"book $bid entry $k: non-integer") }
        k += 1
      }
      out += bid -> gate(bid, lens, codes)
      i += 1 + n
    }
    val r = out.result()
    if (r.isEmpty) fail("no books found")
    r
  }

  /** Load + gate-validate codebooks from a file; throws on any
    * structural failure, registers nothing partially. */
  def load(path: String): Map[Int, Book] =
    parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8"))

  /** Render the synthetic books as a loadable file (the loader-row
    * fixture: proves the load/gate path a real spec file would travel). */
  def syntheticFileText(bids: Seq[Int]): String = {
    val sb = new StringBuilder
    sb.append("# GRAFT-SYNTHETIC AAC codebooks (mechanism fixture, " +
      "not ISO data)\n")
    bids.foreach { bid =>
      val n = spec(bid)._1
      val lens = canonicalLens(n)
      val codes = canonicalCodes(lens)
      val rot = (bid * 37) % n
      sb.append(s"book $bid\n")
      // entries in LINEAR-INDEX order: entry i carries the codeword
      // whose decode lands on i (the inverse of the rotation)
      val byIndex = new Array[(Int, Int)](n)
      var i = 0
      while (i < n) {
        byIndex((i + rot) % n) = (lens(i), codes(i)); i += 1
      }
      byIndex.foreach { case (l, c) =>
        sb.append(l).append(' ').append(c).append('\n')
      }
    }
    sb.toString
  }

  // ---- tuple <-> linear index maps (ISO §4.6.3.3 layout) ----

  /** Linear index of a spectral tuple in book `bid` (values already in
    * the book's signed/unsigned domain). */
  def tupleIndex(bid: Int, vs: Array[Int]): Int = {
    val (_, dim, lav, signed) = spec(bid)
    require(vs.length == dim, s"book $bid wants $dim-tuples")
    val off = if (signed) lav else 0
    val base = if (signed) 2 * lav + 1 else lav + 1
    var idx = 0
    var i = 0
    while (i < dim) {
      val v = vs(i) + off
      require(v >= 0 && v < base, s"book $bid value ${vs(i)} out of range")
      idx = idx * base + v; i += 1
    }
    idx
  }

  /** Inverse of [[tupleIndex]]. */
  def indexTuple(bid: Int, idx: Int): Array[Int] = {
    val (n, dim, lav, signed) = spec(bid)
    require(idx >= 0 && idx < n, s"book $bid index $idx out of range")
    val off = if (signed) lav else 0
    val base = if (signed) 2 * lav + 1 else lav + 1
    val out = new Array[Int](dim)
    var x = idx
    var i = dim - 1
    while (i >= 0) { out(i) = x % base - off; x /= base; i -= 1 }
    out
  }
}
