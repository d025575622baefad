package graft.pipeline

/** ISO 11172-3 synthesis-window (Table C.1) and scalefactor-band
  * (Table B.8) data — the round-14 drop-ins that turn the proven Layer
  * III transform/synthesis MACHINERY into conformant real-stream PCM.
  *
  * VERIFICATION (spec-table policy):
  *
  *   - Table C.1 ships as the 257 half-window integers (every value in
  *     C.1 is an exact multiple of 2^-16; the full 512-tap window
  *     follows from the published mirror symmetry |D[512-i]| = |D[i]|
  *     plus the ISO sign layout, which flips 32-tap blocks b ≡ 2, 3
  *     (mod 4)). The data is pinned FUNCTIONALLY: the analysis window
  *     is C = D/32 (published relation), and `L3IsoSynthSpec` runs the
  *     full §2.4.3.2 analysis→synthesis cascade, asserting
  *     reconstruction at the published 481-sample filterbank delay
  *     with relative error < 1e-6 (measured ≈ 5e-9, the filterbank's
  *     intrinsic near-PR floor — wrong window data lands orders of
  *     magnitude higher, as the spec demonstrates with a deliberately
  *     wrong window). Landmarks match the printed table: D[0] = 0,
  *     D[1] = -0.000015259, D[256] = +1.144989014.
  *
  *   - Table B.8 ships all three MPEG-1 sample rates, long and short
  *     columns, pinned by the published structural closure: each long
  *     list tiles 0..576 and each short list tiles 0..192 strictly
  *     monotonically, widths are even and nondecreasing across the
  *     scalefactor bands proper, and the 48 kHz long column equals the
  *     `L3Sfb48` array already proven through every long-block oracle
  *     row since round 12.
  */
object L3IsoSynth {

  /** Table C.1 half window × 65536 (indices 0..256). */
  private val EnwHalf: Array[Int] = Array(
       0,    -1,    -1,    -1,    -1,    -1,    -1,    -2,
      -2,    -2,    -2,    -3,    -3,    -4,    -4,    -5,
      -5,    -6,    -7,    -7,    -8,    -9,   -10,   -11,
     -13,   -14,   -16,   -17,   -19,   -21,   -24,   -26,
     -29,   -31,   -35,   -38,   -41,   -45,   -49,   -53,
     -58,   -63,   -68,   -73,   -79,   -85,   -91,   -97,
    -104,  -111,  -117,  -125,  -132,  -139,  -147,  -154,
    -161,  -169,  -176,  -183,  -190,  -196,  -202,  -208,
    -213,  -218,  -222,  -225,  -227,  -228,  -228,  -227,
    -224,  -221,  -215,  -208,  -200,  -189,  -177,  -163,
    -146,  -127,  -106,   -83,   -57,   -29,     2,    36,
      72,   111,   153,   197,   244,   294,   347,   401,
     459,   519,   581,   645,   711,   779,   848,   919,
     991,  1064,  1137,  1210,  1283,  1356,  1428,  1498,
    1567,  1634,  1698,  1759,  1817,  1870,  1919,  1962,
    2001,  2032,  2057,  2075,  2085,  2087,  2080,  2063,
    2037,  2000,  1952,  1893,  1822,  1739,  1644,  1535,
    1414,  1280,  1131,   970,   794,   605,   402,   185,
     -45,  -288,  -545,  -814, -1095, -1388, -1692, -2006,
   -2330, -2663, -3004, -3351, -3705, -4063, -4425, -4788,
   -5153, -5517, -5879, -6237, -6589, -6935, -7271, -7597,
   -7910, -8209, -8491, -8755, -8998, -9219, -9416, -9585,
   -9727, -9838, -9916, -9959, -9966, -9935, -9863, -9750,
   -9592, -9389, -9139, -8840, -8492, -8092, -7640, -7134,
   -6574, -5959, -5288, -4561, -3776, -2935, -2037, -1082,
     -70,   998,  2122,  3300,  4533,  5818,  7154,  8540,
    9975, 11455, 12980, 14548, 16155, 17799, 19478, 21189,
   22929, 24694, 26482, 28289, 30112, 31947, 33791, 35640,
   37489, 39336, 41176, 43006, 44821, 46617, 48390, 50137,
   51853, 53534, 55178, 56778, 58333, 59838, 61289, 62684,
   64019, 65290, 66494, 67629, 68692, 69679, 70590, 71420,
   72169, 72835, 73415, 73908, 74313, 74630, 74856, 74992,
   75038)

  /** The 512-tap ISO synthesis window D: plus-mirror of the half window
    * around tap 256, then the ISO sign layout (32-tap blocks b ≡ 2, 3
    * mod 4 negated). Values are exact multiples of 2^-16, hence exact
    * in binary floating point — no quantization step is needed for the
    * cross-engine oracle replay. */
  val winC1: Array[Double] = {
    val half = new Array[Double](512)
    var i = 0
    while (i <= 256) { half(i) = EnwHalf(i) / 65536.0; i += 1 }
    i = 257
    while (i < 512) { half(i) = EnwHalf(512 - i) / 65536.0; i += 1 }
    Array.tabulate(512) { j =>
      if ((j / 32) % 4 >= 2) -half(j) else half(j)
    }
  }

  /** GRAFT-SYNTHETIC long-block band geometry for the MPEG-2 LSF rates
    * (round 15): the LSF side-info/scalefactor MACHINERY (13818-3 one
    * granule per frame, 8-bit main_data_begin, 9-bit scalefac_compress
    * with the algorithmic slen/partition derivation) is real and
    * oracle-verified, but the ISO 13818-3 Annex B band TABLES for
    * 22.05/24/16 kHz did not pass the recall gate — so all three LSF
    * rates mount this one clearly-synthetic monotone even-width tiling
    * of 0..576 (the r13 synthetic-geometry precedent: machinery proven,
    * data declared). Swapping in real columns is a one-array drop-in. */
  private val lsfSyntheticLong: Array[Int] =
    Array(0, 6, 12, 18, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134, 162,
          196, 236, 282, 334, 392, 456, 526, 576)

  /** Table B.8 long-block scalefactor band starts (22 bands + end 576;
    * band 21 is the no-scalefactor region above the last band). MPEG-1
    * rates carry the REAL closure-verified columns; the LSF rates carry
    * [[lsfSyntheticLong]] (declared synthetic). */
  val sfbLong: Map[Int, Array[Int]] = Map(
    44100 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90,
                   110, 134, 162, 196, 238, 288, 342, 418, 576),
    48000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88,
                   106, 128, 156, 190, 230, 276, 330, 384, 576),
    32000 -> Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102,
                   126, 156, 194, 240, 296, 364, 448, 550, 576),
    22050 -> lsfSyntheticLong,
    24000 -> lsfSyntheticLong,
    16000 -> lsfSyntheticLong,
    11025 -> lsfSyntheticLong,
    12000 -> lsfSyntheticLong,
    8000 -> lsfSyntheticLong)

  /** Table B.8 short-block scalefactor band starts per window (13
    * bands + end 192; band 12 is the no-scalefactor region). */
  val sfbShort: Map[Int, Array[Int]] = Map(
    44100 -> Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000 -> Array(0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000 -> Array(0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192),
    // LSF rates: short/mixed blocks REFUSE at LSF (declared), so these
    // synthetic entries exist only so the rate lookup is total — the
    // geometry is never consulted on a decode path.
    22050 -> Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 110, 144, 192),
    24000 -> Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 110, 144, 192),
    16000 -> Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 110, 144, 192),
    11025 -> Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 110, 144, 192),
    12000 -> Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 110, 144, 192),
    8000 -> Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 110, 144, 192))

  /** Rates whose Table B.8 columns are REAL closure-verified ISO data;
    * every other rate (the LSF/V2.5 family) mounts declared
    * GRAFT-SYNTHETIC geometry and must not decode real-world input
    * silently — [[Multimodal.layer3DecodeFull]] refuses those rates
    * unless geometry is loaded ([[loadGeometry]]) or the caller opts
    * into the synthetic tiling explicitly. */
  val realGeometryRates: Set[Int] = Set(44100, 48000, 32000)

  private val lsfRates: Set[Int] =
    Set(22050, 24000, 16000, 11025, 12000, 8000)

  /** Monotone-tiling closure gate for one loaded band-geometry column
    * pair (the same structural properties the shipped MPEG-1 columns
    * satisfy): the long column has 23 entries tiling 0..576 strictly
    * monotonically with even widths; the short column 14 entries tiling
    * 0..192 the same way. Width NON-DECREASE is deliberately NOT
    * required — the published 13818-3 Annex B columns end in a
    * narrowing top band, and the gate must admit real spec data. Only
    * LSF/V2.5 rates are loadable: the MPEG-1 rates ship real verified
    * data that must not be silently overridden. */
  def gateGeometry(rate: Int, long: Array[Int], short: Array[Int])
      : (Array[Int], Array[Int]) = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"geometry $rate: $msg")
    if (realGeometryRates.contains(rate))
      fail("rate ships real verified ISO data (not overridable)")
    if (!lsfRates.contains(rate)) fail("not an MPEG sample rate")
    def check(col: Array[Int], n: Int, end: Int, what: String): Unit = {
      if (col.length != n) fail(s"$what column needs $n entries")
      if (col(0) != 0 || col(n - 1) != end)
        fail(s"$what column must tile 0..$end")
      var i = 1
      while (i < n) {
        val w = col(i) - col(i - 1)
        if (w <= 0) fail(s"$what column not strictly monotone at $i")
        if (w % 2 != 0) fail(s"$what column width at $i is odd")
        i += 1
      }
    }
    check(long, 23, 576, "long")
    check(short, 14, 192, "short")
    (long, short)
  }

  /** Parse + gate a band-geometry file: per rate a `geometry <rate>`
    * header followed by `long <23 ints>` and `short <14 ints>` lines;
    * '#' comments and blank lines ignored. Throws on any structural
    * failure; nothing registers partially. */
  def parseGeometry(text: String): Map[Int, (Array[Int], Array[Int])] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"geometry file: $msg")
    val lines = text.split("\n", -1).iterator
      .map(_.takeWhile(_ != '#').trim).filter(_.nonEmpty).toSeq
    if (lines.length % 3 != 0 || lines.isEmpty)
      fail("want triplets of: geometry <rate> / long <...> / short <...>")
    val out = Map.newBuilder[Int, (Array[Int], Array[Int])]
    val seen = scala.collection.mutable.Set[Int]()
    lines.grouped(3).foreach { g =>
      val h = g(0).split("\\s+")
      if (h.length != 2 || h(0) != "geometry")
        fail(s"bad header '${g(0)}'")
      val rate = try h(1).toInt
        catch { case _: NumberFormatException => fail(s"bad rate '${h(1)}'") }
      if (!seen.add(rate)) fail(s"rate $rate appears twice")
      def col(line: String, tag: String): Array[Int] = {
        val p = line.split("\\s+")
        if (p.isEmpty || p(0) != tag) fail(s"expected '$tag ...', got '$line'")
        try p.drop(1).map(_.toInt)
        catch { case _: NumberFormatException => fail(s"non-integer in '$line'") }
      }
      out += rate -> gateGeometry(rate, col(g(1), "long"), col(g(2), "short"))
    }
    out.result()
  }

  /** Load + gate-validate LSF/V2.5 band geometry from a file — the
    * drop-in seam for the real 13818-3 Annex B columns. The result
    * feeds [[Multimodal.layer3DecodeFull]]'s `extraGeometry`. */
  def loadGeometry(path: String): Map[Int, (Array[Int], Array[Int])] =
    parseGeometry(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8"))

  /** GRAFT-SYNTHETIC alternate tiling for the geometry-loader fixture
    * (NOT ISO data; deliberately different from [[lsfSyntheticLong]] so
    * a decode that consults the loaded columns produces different
    * values — the consultation proof). */
  val synthAltLong: Array[Int] =
    Array(0, 8, 14, 20, 26, 32, 38, 46, 54, 64, 76, 92, 112, 136, 164,
          198, 238, 284, 336, 394, 458, 528, 576)
  val synthAltShort: Array[Int] =
    Array(0, 6, 10, 14, 18, 24, 32, 42, 54, 68, 86, 112, 146, 192)

  /** Render the fixture geometry file (the same alt tiling at each
    * requested rate). */
  def synthGeometryFileText(rates: Seq[Int]): String = {
    val sb = new StringBuilder
    sb.append("# GRAFT-SYNTHETIC loadable band geometry (mechanism " +
      "fixture, not ISO data)\n")
    rates.foreach { r =>
      sb.append(s"geometry $r\n")
      sb.append("long ").append(synthAltLong.mkString(" ")).append('\n')
      sb.append("short ").append(synthAltShort.mkString(" ")).append('\n')
    }
    sb.toString
  }

  /** Short-geometry entropy-order position of entropy line `i`
    * (§2.4.3.4.5/§2.4.3.4.8): the entropy stream runs band-major with
    * the 3 windows grouped inside each band, so with band starts s_b
    * the band occupies entropy lines [3·s_b, 3·s_{b+1}) and within it
    * window w holds `width` consecutive lines. Returns (band, window,
    * spectral line l = s_b + freq); the §2.4.3.4.8 reorder then lands
    * the value at slot 3·l + w. */
  def shortPos(sfb: Array[Int], i: Int): (Int, Int, Int) = {
    var b = 0
    while (b + 1 < sfb.length && 3 * sfb(b + 1) <= i) b += 1
    val width = sfb(b + 1) - sfb(b)
    val off = i - 3 * sfb(b)
    (b, off / width, sfb(b) + off % width)
  }
}
