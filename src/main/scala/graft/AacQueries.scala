package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.{Aac, AacHuff}

/** AAC-LC payload oracle rows (round 17). Each row decodes synthetic
  * ADTS streams from [[Aac.aacLcBytes]] through the REAL payload
  * machinery ([[Aac.aacLcDecode]]: element loop, sections, dpcm
  * scalefactors, spectral Huffman + signs + escapes, dequant, M/S,
  * window sequences/shapes, IMDCT, overlap-add) and the DuckDB oracle
  * replays the generator's closed-form field formulas through the same
  * transform chain — every transcendental constant interpolated as the
  * decoder's own 1e-12-quantized literal (ONE π/4096 cosine lattice
  * covers all IMDCT bases and sine windows; KBD halves, scalefactor
  * gains 2^((sf−100)/4) and |q|^(4/3) get literal tables), every float
  * fold order-pinned, and the band stats 1e-6-integer-quantized — the
  * bit-identical-replay contract of the MP3 rows. */
object AacQueries {
  import PipelineQueries.QFn

  // ---- the decoder's quantized constants as DuckDB literals ----
  private val latLit = Aac.cosLattice.mkString("[", ", ", "]")
  private val kbdLLit = Aac.kbdLongHalf.mkString("[", ", ", "]")
  private val kbdSLit = Aac.kbdShortHalf.mkString("[", ", ", "]")
  private val gainsLit = (0 until 256).map(Aac.sfGain).mkString("[", ", ", "]")
  private val p43Lit = (0 to 31).map(Aac.pow43).mkString("[", ", ", "]")

  private val iscLit =
    (-60 to 60).map(Aac.isScale).mkString("[", ", ", "]")

  /** TNS reflection-coef sine dequant values, indexed
    * (resBits − 3)·16 + v + 8 (+1 for SQL): both resolutions, the full
    * signed index range. */
  private val tsinLit =
    (for (res <- 3 to 4; v <- -8 to 7) yield Aac.tnsCoef(res, v))
      .mkString("[", ", ", "]")

  private val constsCte =
    s"""co AS (SELECT $latLit AS lat, $kbdLLit AS kbdl, $kbdSLit AS kbds,
       |  $gainsLit AS gains, $p43Lit AS p43, $iscLit AS isc,
       |  $tsinLit AS tsin)""".stripMargin

  /** cos(π·m/4096) from the lattice (m any non-negative integer SQL
    * expression): fold by cosine symmetry into 0..4096, 1-based index. */
  private def latAt(m: String): String =
    s"co.lat[CAST(CASE WHEN ($m) % 8192 > 4096 THEN 8192 - ($m) % 8192 " +
      s"ELSE ($m) % 8192 END AS INT) + 1]"

  /** Long-window rise half value at sample `n` (0..1023) for shape
    * expression `sh` (0 sine / 1 KBD). */
  private def riseL(sh: String, n: String): String =
    s"(CASE WHEN ($sh) = 0 THEN ${latAt(s"2047 - 2*($n)")} " +
      s"ELSE co.kbdl[CAST($n AS INT) + 1] END)"

  /** Long fall half at m = n − 1024 (0..1023): rise(1023 − m). */
  private def fallL(sh: String, m: String): String =
    riseL(sh, s"1023 - ($m)")

  private def riseS(sh: String, n: String): String =
    s"(CASE WHEN ($sh) = 0 THEN ${latAt(s"8*(255 - 2*($n))")} " +
      s"ELSE co.kbds[CAST($n AS INT) + 1] END)"

  private def fallS(sh: String, m: String): String =
    riseS(sh, s"127 - ($m)")

  /** Spectral book of (id, f, scope s): [1,3,5,7,9,11][(id+f+2s) % 6]
    * — [[Aac.aacLcBytes]]'s cbSel. */
  private def cbSql(s: String): String =
    s"(CASE CAST((id + f + 2*($s)) % 6 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 3 " +
      s"WHEN 2 THEN 5 WHEN 3 THEN 7 WHEN 4 THEN 9 ELSE 11 END)"

  /** LAV magnitude modulus per book (min(lav, 12); book 11 handled by
    * the escape branch at call sites). */
  private val lavCase =
    "(CASE cb WHEN 1 THEN 1 WHEN 3 THEN 2 WHEN 5 THEN 4 WHEN 7 THEN 7 " +
      "ELSE 12 END)"

  /** The (id, f) frame grid shared by all rows: 24 media, nf frames. */
  private def frCte(nfExpr: String): String =
    s"""fr AS (SELECT r AS id, f FROM range(24) t(r), range(4) ff(f)
       |       WHERE f < $nfExpr)""".stripMargin

  /** Dequantized nonzero LINES of a LONG-content frame for channel
    * `ch` (an integer literal): k (spectral line) and x (dequantized
    * value). Emits CTEs `pr$ch` and `lx$ch`. */
  private def longLinesCte(ch: Int): String = {
    val c = ch.toString
    s"""pr$c AS (SELECT id, f, b,
       |    (id + f + $c) % 8 + 1 AS a,
       |    ${cbSql(c)} AS cb,
       |    130 + (id*5 + f*9 + $c*13) % 20
       |      + ((id*3 + f*5 + $c*17) % 21) - 10
       |      + CASE WHEN b = 1
       |          THEN ((id*3 + f*5 + 11 + $c*17) % 21) - 10 ELSE 0 END AS sf,
       |    CASE WHEN (id + f + b) % 2 = 1 THEN -1.0 ELSE 1.0 END AS sgn
       |  FROM fr, range(2) bb(b)),
       |pm$c AS (SELECT id, f, b, a, cb, sf, sgn,
       |    CASE WHEN cb IN (1, 3) THEN 4 ELSE 2 END AS dim,
       |    CASE WHEN cb = 11 THEN 16 + (id + f + b) % 8
       |         ELSE 1 + (id + f + b) % $lavCase END AS mag
       |  FROM pr$c),
       |lx$c AS (SELECT p.id, p.f,
       |    32*(p.a + p.b) + p.dim * ((p.id + 2*p.f + p.b) % (32 // p.dim))
       |      + (p.id + p.b) % p.dim AS k,
       |    p.sgn * co.p43[CAST(p.mag AS INT) + 1]
       |      * co.gains[CAST(p.sf AS INT) + 1] AS x
       |  FROM pm$c p CROSS JOIN co)""".stripMargin
  }

  /** Long-frame windowed buffer from a lines relation `src(id, f, k, x)`
    * (ONLY_LONG window), emitting `zw$tag(id, f, n, v)` over n 0..2047.
    * Shape-left uses the previous frame's transmitted shape. */
  private def longWindowCte(tag: String, src: String): String =
    s"""zz$tag AS (SELECT fr.id, fr.f, nn.n,
       |    COALESCE(list_sum(list(l.x *
       |      ${latAt("(2*nn.n + 1025) * (2*l.k + 1)")} ORDER BY l.k)), 0.0)
       |      / 1024.0 AS z
       |  FROM fr CROSS JOIN range(2048) nn(n)
       |  LEFT JOIN $src l ON l.id = fr.id AND l.f = fr.f
       |  CROSS JOIN co
       |  GROUP BY fr.id, fr.f, nn.n),
       |zw$tag AS (SELECT z.id, z.f, z.n,
       |    z.z * (CASE WHEN z.n < 1024
       |      THEN ${riseL("CASE WHEN z.f = 0 THEN 0 ELSE (z.id + z.f - 1) % 2 END", "z.n")}
       |      ELSE ${fallL("(z.id + z.f) % 2", "z.n - 1024")} END) AS v
       |  FROM zz$tag z CROSS JOIN co)""".stripMargin

  /** Band stats over the overlap-added output of `zwSrc(id, [key,] f,
    * n, v)`; `key` is an optional extra chain key (the channel column),
    * emitted as `channel` in the result. */
  private def bandsSelect(zwSrc: String, key: String = ""): String = {
    val kSel = if (key.isEmpty) "" else s"cur.$key AS $key, "
    val kJoin = if (key.isEmpty) "" else s"AND prv.$key = cur.$key "
    s"""ov AS (SELECT cur.id, ${kSel}cur.f, cur.n,
       |    cur.v + COALESCE(prv.v, 0.0) AS v
       |  FROM $zwSrc cur LEFT JOIN $zwSrc prv
       |    ON prv.id = cur.id AND prv.f = cur.f - 1
       |      AND prv.n = cur.n + 1024 $kJoin
       |  WHERE cur.n < 1024)
       |SELECT id AS media_id, CAST(f AS BIGINT) AS frame,
       |  ${if (key.isEmpty) "" else s"CAST($key AS BIGINT) AS channel,"}
       |  CAST(n // 128 AS BIGINT) AS band,
       |  SUM(CAST(ROUND(v * 1e6, 0) AS BIGINT)) / 1e6 + 0.0 AS s_sum,
       |  SUM(CAST(ROUND(v * v * 1e6, 0) AS BIGINT)) / 1e6 + 0.0 AS s_msq
       |FROM ov GROUP BY id, f, ${if (key.isEmpty) "" else s"$key,"} n // 128""".stripMargin
  }

  /** SHORT-content per-group line parameters + per-window spectra +
    * the composed 2048 windowed buffer `zwS(id, f, n, v)` (the
    * EIGHT_SHORT filterbank). `fSel` restricts which frames are short
    * (SQL bool over fr columns). */
  private def shortBufCtes(fSel: String): String =
    s"""sg AS (SELECT id, f, g,
       |    CASE WHEN g = 2 THEN 2 ELSE 3 END AS gsize, g * 3 AS winbase,
       |    (id + f + g) % 6 AS c,
       |    ${cbSql("g")} AS cb,
       |    130 + (id*5 + f*9) % 20
       |      + ((id*3 + f*5) % 21) - 10
       |      + CASE WHEN g >= 1 THEN ((id*3 + f*5 + 7) % 21) - 10 ELSE 0 END
       |      + CASE WHEN g >= 2 THEN ((id*3 + f*5 + 14) % 21) - 10 ELSE 0 END AS sf,
       |    CASE WHEN (id + f + g) % 2 = 1 THEN -1.0 ELSE 1.0 END AS sgn
       |  FROM fr, range(3) gg(g) WHERE $fSel),
       |sm AS (SELECT id, f, g, gsize, winbase, c, cb, sf, sgn,
       |    CASE WHEN cb IN (1, 3) THEN 4 ELSE 2 END AS dim,
       |    CASE WHEN cb = 11 THEN 16 + (id + f + g) % 8
       |         ELSE 1 + (id + f + g) % $lavCase END AS mag
       |  FROM sg),
       |sl AS (SELECT s.id, s.f, s.winbase + (s.id + s.g) % s.gsize AS w8,
       |    16*s.c + s.dim * ((s.id + 2*s.f + s.g) % (16 // s.dim))
       |      + (s.id + s.g) % s.dim AS k,
       |    s.sgn * co.p43[CAST(s.mag AS INT) + 1]
       |      * co.gains[CAST(s.sf AS INT) + 1] AS x
       |  FROM sm s CROSS JOIN co),
       |z8 AS (SELECT fr.id, fr.f, ww.w, nn.n,
       |    COALESCE(SUM(l.x *
       |      ${latAt("8*(2*nn.n + 129) * (2*l.k + 1)")}), 0.0) / 128.0 AS z
       |  FROM fr CROSS JOIN range(8) ww(w) CROSS JOIN range(256) nn(n)
       |  LEFT JOIN sl l ON l.id = fr.id AND l.f = fr.f AND l.w8 = ww.w
       |  CROSS JOIN co
       |  WHERE $fSel
       |  GROUP BY fr.id, fr.f, ww.w, nn.n),
       |z8w AS (SELECT z.id, z.f, 448 + 128*z.w + z.n AS nb,
       |    z.z * (CASE WHEN z.n < 128
       |      THEN ${riseS("CASE WHEN z.w = 0 THEN " +
                "(CASE WHEN z.f = 0 THEN 0 ELSE (z.id + z.f - 1) % 2 END) " +
                "ELSE (z.id + z.f) % 2 END", "z.n")}
       |      ELSE ${fallS("(z.id + z.f) % 2", "z.n - 128")} END) AS v
       |  FROM z8 z CROSS JOIN co),
       |sbuf AS (SELECT id, f, nb AS n, SUM(v) AS v
       |  FROM z8w GROUP BY id, f, nb),
       |zwS AS (SELECT fr.id, fr.f, nn.n, COALESCE(b.v, 0.0) AS v
       |  FROM fr CROSS JOIN range(2048) nn(n)
       |  LEFT JOIN sbuf b ON b.id = fr.id AND b.f = fr.f AND b.n = nn.n
       |  WHERE $fSel)""".stripMargin

  // ------------------------------------------------------------------

  private val sceLongOracle =
    s"""WITH $constsCte,
       |${frCte("r % 3 + 1")},
       |${longLinesCte(0)},
       |${longWindowCte("L", "lx0")},
       |${bandsSelect("zwL")}""".stripMargin

  private val shortOracle =
    s"""WITH $constsCte,
       |${frCte("r % 3 + 1")},
       |${shortBufCtes("TRUE")},
       |${bandsSelect("zwS")}""".stripMargin

  /** The window-sequence cycle: frames f = 0..nf−1 with sequence f
    * (ONLY_LONG → LONG_START → EIGHT_SHORT → LONG_STOP); long-content
    * formulas on f ≠ 2, short-content on f = 2; the long frames'
    * windows switch by sequence (START right half = flat 448 + short
    * fall + zeros; STOP left half = zeros 448 + short rise + flat). */
  private val cycleOracle =
    s"""WITH $constsCte,
       |${frCte("r % 3 + 2")},
       |${longLinesCte(0)},
       |zzC AS (SELECT fr.id, fr.f, nn.n,
       |    COALESCE(list_sum(list(l.x *
       |      ${latAt("(2*nn.n + 1025) * (2*l.k + 1)")} ORDER BY l.k)), 0.0)
       |      / 1024.0 AS z
       |  FROM fr CROSS JOIN range(2048) nn(n)
       |  LEFT JOIN lx0 l ON l.id = fr.id AND l.f = fr.f
       |  CROSS JOIN co
       |  WHERE fr.f <> 2
       |  GROUP BY fr.id, fr.f, nn.n),
       |zwC AS (SELECT z.id, z.f, z.n,
       |    z.z * (CASE
       |      WHEN z.f = 0 OR z.f = 1 THEN
       |        CASE WHEN z.n < 1024
       |          THEN ${riseL("CASE WHEN z.f = 0 THEN 0 ELSE (z.id + z.f - 1) % 2 END", "z.n")}
       |          WHEN z.f = 0 THEN ${fallL("(z.id + z.f) % 2", "z.n - 1024")}
       |          WHEN z.n < 1472 THEN 1.0
       |          WHEN z.n < 1600 THEN ${fallS("(z.id + z.f) % 2", "z.n - 1472")}
       |          ELSE 0.0 END
       |      ELSE -- f = 3: LONG_STOP
       |        CASE WHEN z.n < 448 THEN 0.0
       |          WHEN z.n < 576 THEN ${riseS("(z.id + z.f - 1) % 2", "z.n - 448")}
       |          WHEN z.n < 1024 THEN 1.0
       |          ELSE ${fallL("(z.id + z.f) % 2", "z.n - 1024")} END
       |      END) AS v
       |  FROM zzC z CROSS JOIN co),
       |${shortBufCtes("fr.f = 2")},
       |zwAll AS (SELECT * FROM zwC UNION ALL SELECT * FROM zwS),
       |${bandsSelect("zwAll")}""".stripMargin

  /** CPE + M/S: per-channel long-content lines (channel-offset
    * formulas), the mid/side reconstruction on the union of line
    * positions (ms_mask_present = (id+f) mod 3; mask 1 uses per-band
    * bits (id+f+sfb) odd), then each output channel through the
    * ONLY_LONG filterbank and its own overlap-add chain. */
  private val msOracle =
    s"""WITH $constsCte,
       |${frCte("2")},
       |${longLinesCte(0)},
       |${longLinesCte(1)},
       |allk AS (SELECT id, f, k FROM lx0 UNION SELECT id, f, k FROM lx1),
       |msd AS (SELECT a.id, a.f, a.k,
       |    COALESCE(m.x, 0.0) AS mx, COALESCE(s.x, 0.0) AS sx,
       |    CASE CAST((a.id + a.f) % 3 AS INT)
       |      WHEN 2 THEN TRUE
       |      WHEN 1 THEN (a.id + a.f + a.k // 32) % 2 = 1
       |      ELSE FALSE END AS used
       |  FROM allk a
       |  LEFT JOIN lx0 m ON m.id = a.id AND m.f = a.f AND m.k = a.k
       |  LEFT JOIN lx1 s ON s.id = a.id AND s.f = a.f AND s.k = a.k),
       |lout AS (
       |  SELECT id, f, k, 0 AS ch,
       |    CASE WHEN used THEN mx + sx ELSE mx END AS x FROM msd
       |  UNION ALL
       |  SELECT id, f, k, 1 AS ch,
       |    CASE WHEN used THEN mx - sx ELSE sx END AS x FROM msd),
       |zzM AS (SELECT fr.id, fr.f, cc.ch, nn.n,
       |    COALESCE(list_sum(list(l.x *
       |      ${latAt("(2*nn.n + 1025) * (2*l.k + 1)")} ORDER BY l.k)), 0.0)
       |      / 1024.0 AS z
       |  FROM fr CROSS JOIN range(2) cc(ch) CROSS JOIN range(2048) nn(n)
       |  LEFT JOIN lout l ON l.id = fr.id AND l.f = fr.f AND l.ch = cc.ch
       |  CROSS JOIN co
       |  GROUP BY fr.id, fr.f, cc.ch, nn.n),
       |zwM AS (SELECT z.id, z.f, z.ch, z.n,
       |    z.z * (CASE WHEN z.n < 1024
       |      THEN ${riseL("CASE WHEN z.f = 0 THEN 0 ELSE (z.id + z.f - 1) % 2 END", "z.n")}
       |      ELSE ${fallL("(z.id + z.f) % 2", "z.n - 1024")} END) AS v
       |  FROM zzM z CROSS JOIN co),
       |${bandsSelect("zwM", "ch")}""".stripMargin

  /** Pulse data: the long-content lines at the QUANTIZED level, the
    * transmitted pulse amplitudes added (|q| grows; a zero coefficient
    * becomes +amp), then dequant — the §4.6.3.3 order the decoder
    * implements. Pulses exist on (id+f)-even frames: 1 + (id mod 2) of
    * them starting at sfb a, offsets/amps from the generator formulas;
    * both pulse lines stay inside the two coded bands by construction
    * so every line has a scalefactor. */
  private val pulseOracle =
    s"""WITH $constsCte,
       |${frCte("r % 3 + 1")},
       |${longLinesCte(0)},
       |bl AS (SELECT p.id, p.f, p.b, p.a, p.sf,
       |    32*(p.a + p.b) + p.dim * ((p.id + 2*p.f + p.b) % (32 // p.dim))
       |      + (p.id + p.b) % p.dim AS k,
       |    CAST(p.sgn AS BIGINT) * p.mag AS q
       |  FROM pm0 p),
       |pp AS (SELECT DISTINCT id, f, a FROM pr0),
       |pl AS (SELECT pp.id, pp.f,
       |    32*pp.a + (pp.id*3 + pp.f*7) % 30
       |      + CASE WHEN jj.j = 1 THEN 1 + (pp.id*5 + pp.f) % 30
       |             ELSE 0 END AS k,
       |    1 + (pp.id + pp.f + 3*jj.j) % 8 AS amp
       |  FROM pp, range(2) jj(j)
       |  WHERE (pp.id + pp.f) % 2 = 0 AND jj.j <= pp.id % 2),
       |alk AS (SELECT id, f, k FROM bl UNION SELECT id, f, k FROM pl),
       |mq AS (SELECT a2.id, a2.f, a2.k, m.sf,
       |    COALESCE(b.q, 0) AS q, COALESCE(p.amp, 0) AS amp
       |  FROM alk a2
       |  JOIN pp ON pp.id = a2.id AND pp.f = a2.f
       |  JOIN pm0 m ON m.id = a2.id AND m.f = a2.f
       |    AND m.b = a2.k // 32 - pp.a
       |  LEFT JOIN bl b ON b.id = a2.id AND b.f = a2.f AND b.k = a2.k
       |  LEFT JOIN pl p ON p.id = a2.id AND p.f = a2.f AND p.k = a2.k),
       |lxP AS (SELECT t.id, t.f, t.k,
       |    CASE WHEN t.q2 < 0
       |      THEN -(co.p43[CAST(-t.q2 AS INT) + 1]
       |             * co.gains[CAST(t.sf AS INT) + 1])
       |      ELSE co.p43[CAST(t.q2 AS INT) + 1]
       |             * co.gains[CAST(t.sf AS INT) + 1] END AS x
       |  FROM (SELECT *, CASE WHEN q > 0 THEN q + amp
       |                       WHEN q < 0 THEN q - amp
       |                       ELSE amp END AS q2 FROM mq) t
       |  CROSS JOIN co),
       |${longWindowCte("P", "lxP")},
       |${bandsSelect("zwP")}""".stripMargin

  /** Intensity stereo: the right channel of the CPE carries NO spectra
    * — its two intensity bands (book 15/14 alternating by (id+f) mod 2)
    * rebuild right = ±left·0.5^(is_pos/4), phase inverted when book-14
    * XOR the band's ms_used bit; non-intensity ms_used bands give
    * right = mid − side = left (side is zero); everything else is
    * silent. Left passes through unchanged (side is zero everywhere). */
  private val isOracle = {
    val used =
      s"""(CASE CAST((l.id + l.f) % 3 AS INT)
         |  WHEN 2 THEN TRUE
         |  WHEN 1 THEN (l.id + l.f + l.k // 32) % 2 = 1
         |  ELSE FALSE END)""".stripMargin
    s"""WITH $constsCte,
       |${frCte("2")},
       |${longLinesCte(0)},
       |ip AS (SELECT id, f,
       |    (id + f + 1) % 8 + 1 AS ar,
       |    14 + (id + f) % 2 AS cbi,
       |    ((id*7 + f*3) % 25) - 12 AS d0,
       |    ((id*7 + f*3 + 5) % 25) - 12 AS d1
       |  FROM fr),
       |rl AS (SELECT l.id, l.f, l.k,
       |    CASE
       |      WHEN l.k // 32 >= ip.ar AND l.k // 32 < ip.ar + 2 THEN
       |        (CASE WHEN (ip.cbi = 14) <> $used THEN -1.0 ELSE 1.0 END)
       |        * (co.isc[CAST((CASE WHEN l.k // 32 = ip.ar THEN ip.d0
       |                             ELSE ip.d0 + ip.d1 END) + 60 AS INT) + 1]
       |           * l.x)
       |      WHEN $used THEN l.x
       |      ELSE 0.0 END AS x
       |  FROM lx0 l JOIN ip ON ip.id = l.id AND ip.f = l.f CROSS JOIN co),
       |lout AS (
       |  SELECT id, f, k, 0 AS ch, x FROM lx0
       |  UNION ALL SELECT id, f, k, 1 AS ch, x FROM rl),
       |zzI AS (SELECT fr.id, fr.f, cc.ch, nn.n,
       |    COALESCE(list_sum(list(l.x *
       |      ${latAt("(2*nn.n + 1025) * (2*l.k + 1)")} ORDER BY l.k)), 0.0)
       |      / 1024.0 AS z
       |  FROM fr CROSS JOIN range(2) cc(ch) CROSS JOIN range(2048) nn(n)
       |  LEFT JOIN lout l ON l.id = fr.id AND l.f = fr.f AND l.ch = cc.ch
       |  CROSS JOIN co
       |  GROUP BY fr.id, fr.f, cc.ch, nn.n),
       |zwI AS (SELECT z.id, z.f, z.ch, z.n,
       |    z.z * (CASE WHEN z.n < 1024
       |      THEN ${riseL("CASE WHEN z.f = 0 THEN 0 ELSE (z.id + z.f - 1) % 2 END", "z.n")}
       |      ELSE ${fallL("(z.id + z.f) % 2", "z.n - 1024")} END) AS v
       |  FROM zzI z CROSS JOIN co),
       |${bandsSelect("zwI", "ch")}""".stripMargin
  }

  /** TNS: the "tns" mode pins max_sfb = a+2 so the one top-anchored
    * filter region IS the two coded bands (64 lines). Reflection coefs
    * come from the formulaic sine dequant (tsin literal), the LPC
    * step-up is closed-formed per order 1..3, and the all-pole
    * recursion replays as a RECURSIVE CTE over the 64 region steps in
    * transmission direction, exactly the decoder's fold order
    * ((in − l1·x) − l2·x1) − l3·x2 with zero state at the edge. */
  private val tnsOracle =
    s"""WITH RECURSIVE $constsCte,
       |${frCte("r % 3 + 1")},
       |${longLinesCte(0)},
       |tp AS (SELECT id, f,
       |    (id + f) % 8 + 1 AS a,
       |    1 + (id + f) % 3 AS ord,
       |    id % 2 AS dir,
       |    (id + f) % 2 + 3 AS resbits,
       |    f % 2 AS compress
       |  FROM fr),
       |tvv AS (SELECT tp.id, tp.f, ii.i,
       |    (tp.id*3 + tp.f*7 + ii.i*5) % (1 << (tp.resbits - tp.compress))
       |      AS raw, tp.resbits, tp.resbits - tp.compress AS lenbits
       |  FROM tp, range(3) ii(i) WHERE ii.i < tp.ord),
       |tvs AS (SELECT id, f, i, resbits,
       |    CASE WHEN raw >= (1 << (lenbits - 1)) THEN raw - (1 << lenbits)
       |         ELSE raw END AS v
       |  FROM tvv),
       |tt AS (SELECT t.id, t.f,
       |    MAX(CASE WHEN t.i = 0 THEN
       |      co.tsin[CAST((t.resbits - 3)*16 + t.v + 8 AS INT) + 1] END)
       |      AS t0,
       |    COALESCE(MAX(CASE WHEN t.i = 1 THEN
       |      co.tsin[CAST((t.resbits - 3)*16 + t.v + 8 AS INT) + 1] END),
       |      0.0) AS t1,
       |    COALESCE(MAX(CASE WHEN t.i = 2 THEN
       |      co.tsin[CAST((t.resbits - 3)*16 + t.v + 8 AS INT) + 1] END),
       |      0.0) AS t2
       |  FROM tvs t CROSS JOIN co GROUP BY t.id, t.f),
       |lp AS (SELECT tp.id, tp.f, tp.a, tp.ord, tp.dir,
       |    CASE tp.ord WHEN 1 THEN tt.t0 WHEN 2 THEN tt.t0 + tt.t1*tt.t0
       |         ELSE (tt.t0 + tt.t1*tt.t0) + tt.t2*tt.t1 END AS l1,
       |    CASE tp.ord WHEN 1 THEN 0.0 WHEN 2 THEN tt.t1
       |         ELSE tt.t1 + tt.t2*(tt.t0 + tt.t1*tt.t0) END AS l2,
       |    CASE tp.ord WHEN 3 THEN tt.t2 ELSE 0.0 END AS l3
       |  FROM tp JOIN tt ON tt.id = tp.id AND tt.f = tp.f),
       |rin AS (SELECT lp.id, lp.f, ss.s,
       |    CASE WHEN lp.dir = 0 THEN 32*lp.a + ss.s
       |         ELSE 32*lp.a + 63 - ss.s END AS line
       |  FROM lp, range(64) ss(s)),
       |rin2 AS (SELECT r.id, r.f, r.s, r.line, COALESCE(l.x, 0.0) AS xin
       |  FROM rin r LEFT JOIN lx0 l
       |    ON l.id = r.id AND l.f = r.f AND l.k = r.line),
       |flt AS (
       |  SELECT id, f, s, line, xin AS x0,
       |    CAST(0.0 AS DOUBLE) AS x1, CAST(0.0 AS DOUBLE) AS x2
       |  FROM rin2 WHERE s = 0
       |  UNION ALL
       |  SELECT n.id, n.f, n.s, n.line,
       |    ((n.xin - lp.l1 * p.x0) - lp.l2 * p.x1) - lp.l3 * p.x2,
       |    p.x0, p.x1
       |  FROM flt p
       |  JOIN rin2 n ON n.id = p.id AND n.f = p.f AND n.s = p.s + 1
       |  JOIN lp ON lp.id = p.id AND lp.f = p.f),
       |lxT AS (SELECT id, f, line AS k, x0 AS x FROM flt),
       |${longWindowCte("T", "lxT")},
       |${bandsSelect("zwT")}""".stripMargin

  /** PNS: the noise band's vector replays through DuckDB's md5 (the
    * engine's portable hash family), energy-normalized to
    * 2^(noise_nrg/2) with IEEE-exact sqrt/divide; the noise_nrg chain
    * starts at gg − 90 and the first noise band arrives as a 9-bit
    * PCM dpcm. */
  private val pnsOracle =
    s"""WITH $constsCte,
       |${frCte("r % 3 + 1")},
       |pg AS (SELECT id, f,
       |    (id + f) % 8 + 1 AS a,
       |    ${cbSql("0")} AS cb,
       |    130 + (id*5 + f*9) % 20 AS gg
       |  FROM fr),
       |ps AS (SELECT id, f, a, cb, gg,
       |    CASE WHEN cb IN (1, 3) THEN 4 ELSE 2 END AS dim,
       |    CASE WHEN cb = 11 THEN 16 + (id + f) % 8
       |         ELSE 1 + (id + f) % $lavCase END AS mag,
       |    CASE WHEN (id + f) % 2 = 1 THEN -1.0 ELSE 1.0 END AS sgn,
       |    gg + ((id*3 + f*5) % 21) - 10 AS sf,
       |    gg - 180 + (id*11 + f*3) % 80 AS nrg
       |  FROM pg),
       |spl AS (SELECT p.id, p.f,
       |    32*p.a + p.dim*((p.id + 2*p.f) % (32 // p.dim))
       |      + p.id % p.dim AS k,
       |    p.sgn * co.p43[CAST(p.mag AS INT) + 1]
       |      * co.gains[CAST(p.sf AS INT) + 1] AS x
       |  FROM ps p CROSS JOIN co),
       |nl AS (SELECT p.id, p.f, 32*(p.a + 1) + ll.l AS k, p.nrg,
       |    (('0x' || substr(md5('aacpns|' || p.f || '|' ||
       |        (32*(p.a + 1) + ll.l)), 1, 15))::BIGINT % 2001 - 1000)
       |      / 1000.0 AS r
       |  FROM ps p, range(32) ll(l)),
       |ne AS (SELECT id, f, list_sum(list(r*r ORDER BY k)) AS energy
       |  FROM nl GROUP BY id, f),
       |nx AS (SELECT nl.id, nl.f, nl.k,
       |    nl.r * (CASE WHEN ne.energy = 0 THEN 0.0
       |      ELSE co.gains[CAST(nl.nrg + 100 AS INT) + 1] / sqrt(ne.energy)
       |      END) AS x
       |  FROM nl JOIN ne ON ne.id = nl.id AND ne.f = nl.f
       |  CROSS JOIN co
       |  WHERE nl.r <> 0),
       |lxN AS (SELECT id, f, k, x FROM spl
       |        UNION ALL SELECT id, f, k, x FROM nx),
       |${longWindowCte("N", "lxN")},
       |${bandsSelect("zwN")}""".stripMargin

  /** PNS in a CPE: both channels carry a noise band at the same sfb
    * (a2+1) plus their own spectral band at a2. ms_used on the noise
    * band → the right channel REUSES the left's noise vector scaled by
    * its own noise_nrg (§4.6.13.3 correlation); otherwise independent
    * noise from the right-channel key. ms_used on the spectral band
    * does ordinary mid/side. */
  private val pnsCpeOracle = {
    def used(k: String) =
      s"""(CASE CAST((id + f) % 3 AS INT)
         |  WHEN 2 THEN TRUE
         |  WHEN 1 THEN (id + f + ($k)) % 2 = 1
         |  ELSE FALSE END)""".stripMargin
    def noise(tag: String) =
      s"(('0x' || substr(md5('$tag' || f || '|' || k), 1, 15))::BIGINT " +
        "% 2001 - 1000) / 1000.0"
    s"""WITH $constsCte,
       |${frCte("2")},
       |pg AS (SELECT id, f, (id + f) % 8 + 1 AS a2 FROM fr),
       |sc AS (SELECT pg.id, pg.f, pg.a2, cc.ch,
       |    130 + (pg.id*5 + pg.f*9 + cc.ch*13) % 20 AS gg,
       |    CASE CAST((pg.id + pg.f + 2*cc.ch) % 6 AS INT)
       |      WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 5
       |      WHEN 3 THEN 7 WHEN 4 THEN 9 ELSE 11 END AS cb
       |  FROM pg CROSS JOIN range(2) cc(ch)),
       |sm AS (SELECT id, f, a2, ch, gg, cb,
       |    CASE WHEN cb IN (1, 3) THEN 4 ELSE 2 END AS dim,
       |    CASE WHEN cb = 11 THEN 16 + (id + f + ch) % 8
       |         ELSE 1 + (id + f + ch) % $lavCase END AS mag,
       |    CASE WHEN (id + f + ch) % 2 = 1 THEN -1.0 ELSE 1.0 END AS sgn,
       |    gg + ((id*3 + f*5 + ch*17) % 21) - 10 AS sf,
       |    gg - 180 + (id*11 + f*3 + ch*7) % 80 AS nrg
       |  FROM sc),
       |spl AS (SELECT m.id, m.f, m.ch,
       |    32*m.a2 + m.dim*((m.id + 2*m.f + m.ch) % (32 // m.dim))
       |      + (m.id + m.ch) % m.dim AS k,
       |    m.sgn * co.p43[CAST(m.mag AS INT) + 1]
       |      * co.gains[CAST(m.sf AS INT) + 1] AS x
       |  FROM sm m CROSS JOIN co),
       |allk AS (SELECT DISTINCT id, f, k FROM spl),
       |msd AS (SELECT a.id, a.f, a.k,
       |    COALESCE(m.x, 0.0) AS mx, COALESCE(s2.x, 0.0) AS sx
       |  FROM allk a
       |  LEFT JOIN spl m ON m.id = a.id AND m.f = a.f AND m.k = a.k
       |    AND m.ch = 0
       |  LEFT JOIN spl s2 ON s2.id = a.id AND s2.f = a.f AND s2.k = a.k
       |    AND s2.ch = 1),
       |sout AS (
       |  SELECT id, f, k, 0 AS ch,
       |    CASE WHEN ${used("k // 32")} THEN mx + sx ELSE mx END AS x
       |  FROM msd
       |  UNION ALL
       |  SELECT id, f, k, 1 AS ch,
       |    CASE WHEN ${used("k // 32")} THEN mx - sx ELSE sx END AS x
       |  FROM msd),
       |nl AS (SELECT m.id, m.f, m.ch, m.nrg, 32*(m.a2 + 1) + ll.l AS k
       |  FROM sm m, range(32) ll(l)),
       |nr AS (SELECT id, f, ch, nrg, k,
       |    CASE WHEN ch = 0 OR ${used("k // 32")}
       |      THEN ${noise("aacpns|")}
       |      ELSE ${noise("aacpnsr|")} END AS r
       |  FROM nl),
       |ne AS (SELECT id, f, ch, list_sum(list(r*r ORDER BY k)) AS energy
       |  FROM nr GROUP BY id, f, ch),
       |nx AS (SELECT nr.id, nr.f, nr.ch, nr.k,
       |    nr.r * (CASE WHEN ne.energy = 0 THEN 0.0
       |      ELSE co.gains[CAST(nr.nrg + 100 AS INT) + 1] / sqrt(ne.energy)
       |      END) AS x
       |  FROM nr JOIN ne ON ne.id = nr.id AND ne.f = nr.f
       |    AND ne.ch = nr.ch
       |  CROSS JOIN co
       |  WHERE nr.r <> 0),
       |lout AS (SELECT id, f, k, ch, x FROM sout
       |         UNION ALL SELECT id, f, k, ch, x FROM nx),
       |zzC2 AS (SELECT fr.id, fr.f, cc.ch, nn.n,
       |    COALESCE(list_sum(list(l.x *
       |      ${latAt("(2*nn.n + 1025) * (2*l.k + 1)")} ORDER BY l.k)), 0.0)
       |      / 1024.0 AS z
       |  FROM fr CROSS JOIN range(2) cc(ch) CROSS JOIN range(2048) nn(n)
       |  LEFT JOIN lout l ON l.id = fr.id AND l.f = fr.f AND l.ch = cc.ch
       |  CROSS JOIN co
       |  GROUP BY fr.id, fr.f, cc.ch, nn.n),
       |zwC2 AS (SELECT z.id, z.f, z.ch, z.n,
       |    z.z * (CASE WHEN z.n < 1024
       |      THEN ${riseL("CASE WHEN z.f = 0 THEN 0 ELSE (z.id + z.f - 1) % 2 END", "z.n")}
       |      ELSE ${fallL("(z.id + z.f) % 2", "z.n - 1024")} END) AS v
       |  FROM zzC2 z CROSS JOIN co),
       |${bandsSelect("zwC2", "ch")}""".stripMargin
  }

  /** Frame-level structural oracle for the cycle mode. */
  private val framesOracle =
    s"""WITH ${frCte("r % 3 + 2")}
       |SELECT id AS media_id, CAST(f AS BIGINT) AS frame,
       |  CAST(f AS BIGINT) AS wseq,
       |  CAST((id + f) % 2 AS BIGINT) AS wshape,
       |  CAST(CASE WHEN f = 2 THEN 8 ELSE 10 + id % 5 END AS BIGINT) AS max_sfb,
       |  CAST(CASE WHEN f = 2
       |    THEN 6 + CASE WHEN (id + f) % 6 > 0 THEN 1 ELSE 0 END
       |           + CASE WHEN (id + f + 1) % 6 > 0 THEN 1 ELSE 0 END
       |           + CASE WHEN (id + f + 2) % 6 > 0 THEN 1 ELSE 0 END
       |    ELSE 2 + CASE WHEN 10 + id % 5 - ((id + f) % 8 + 1) - 2 > 0
       |                  THEN 1 ELSE 0 END END AS BIGINT) AS n_sections,
       |  CAST(CASE WHEN f = 2 THEN 3 ELSE 2 END AS BIGINT) AS n_nonzero,
       |  CAST(130 + (id*5 + f*9) % 20 AS BIGINT) AS global_gain
       |FROM fr""".stripMargin

  // ------------------------------------------------------------------

  val entries: Seq[(String, QFn, Option[String])] = Seq(

    // Frame-level structure across the full window-sequence cycle:
    // proves the element walk, ics_info (both forms), sectioning with
    // short-form escape run lengths, and the nonzero accounting.
    ("multimodal_aac_frames",
      (s, dir) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val nf = (id % 3).toInt + 2
          val (_, frames, _) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, nf, "cycle"),
            allowSyntheticBooks = true,
            allowSyntheticGeometry = true).get
          frames.map(fr => (id, fr.frame.toLong, fr.windowSequence.toLong,
            fr.windowShape.toLong, fr.maxSfb.toLong, fr.nSections.toLong,
            fr.nNonzero.toLong, fr.globalGain.toLong))
        }.toDF("media_id", "frame", "wseq", "wshape", "max_sfb",
               "n_sections", "n_nonzero", "global_gain")
      },
      Some(framesOracle)),

    // ONLY_LONG SCE: the base filterbank chain — spectral Huffman (all
    // six book families incl. the book-11 escape), dpcm scalefactors,
    // dequant, IMDCT-2048 on the lattice, sine/KBD shape switching,
    // 50%-overlap-add; 8 output bands × 128 samples per frame.
    ("multimodal_aac_sce_long",
      (s, dir) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val nf = (id % 3).toInt + 1
          val (_, _, bands) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, nf, "long"),
            allowSyntheticBooks = true,
            allowSyntheticGeometry = true).get
          bands.map(b => (id, b.frame.toLong, b.band.toLong, b.sSum, b.sMsq))
        }.toDF("media_id", "frame", "band", "s_sum", "s_msq")
      },
      Some(sceLongOracle)),

    // EIGHT_SHORT SCE: grouping 1101101 → [3,3,2], per-group sections
    // with 3-bit escape run lengths, per-group scalefactor chain,
    // window-in-group spectral ordering, 8 IMDCT-256s composed at the
    // 448 + 128·w offsets with first-window shape switching.
    ("multimodal_aac_short",
      (s, dir) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val nf = (id % 3).toInt + 1
          val (_, _, bands) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, nf, "short"),
            allowSyntheticBooks = true,
            allowSyntheticGeometry = true).get
          bands.map(b => (id, b.frame.toLong, b.band.toLong, b.sSum, b.sMsq))
        }.toDF("media_id", "frame", "band", "s_sum", "s_msq")
      },
      Some(shortOracle)),

    // The full window-sequence cycle ONLY_LONG → LONG_START →
    // EIGHT_SHORT → LONG_STOP: start/stop window composition (flat
    // 448-sample shelves, embedded short halves) and the cross-
    // sequence overlap-adds long↔short frames.
    ("multimodal_aac_startstop",
      (s, dir) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val nf = (id % 3).toInt + 2
          val (_, _, bands) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, nf, "cycle"),
            allowSyntheticBooks = true,
            allowSyntheticGeometry = true).get
          bands.map(b => (id, b.frame.toLong, b.band.toLong, b.sSum, b.sMsq))
        }.toDF("media_id", "frame", "band", "s_sum", "s_msq")
      },
      Some(cycleOracle)),

    // CPE common_window + M/S: per-channel sections/scalefactors, the
    // three ms_mask_present forms (none / per-band bits / all), and
    // mid/side reconstruction on the dequantized spectra before each
    // channel's filterbank.
    ("multimodal_aac_ms",
      (s, dir) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val (_, _, bands) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, 2, "ms"),
            allowSyntheticBooks = true,
            allowSyntheticGeometry = true).get
          bands.map(b => (id, b.frame.toLong, b.channel.toLong,
            b.band.toLong, b.sSum, b.sMsq))
        }.toDF("media_id", "frame", "channel", "band", "s_sum", "s_msq")
      },
      Some(msOracle)),

    // PULSE data (§4.6.3.3): transmitted amplitudes added to the
    // QUANTIZED coefficients before dequant — the reason decode is
    // quantize-then-dequant; pulse frames alternate with plain ones.
    ("multimodal_aac_pulse",
      (s, dir) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val nf = (id % 3).toInt + 1
          val (_, _, bands) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, nf, "pulse"),
            allowSyntheticBooks = true,
            allowSyntheticGeometry = true).get
          bands.map(b => (id, b.frame.toLong, b.band.toLong, b.sSum, b.sMsq))
        }.toDF("media_id", "frame", "band", "s_sum", "s_msq")
      },
      Some(pulseOracle)),

    // INTENSITY stereo (books 14/15): the right channel's bands rebuild
    // from the LEFT spectra scaled by 0.5^(is_pos/4), is_pos on its own
    // dpcm chain from 0, phase = book-14 XOR ms_used — all three
    // ms_mask_present forms interact.
    ("multimodal_aac_intensity",
      (s, dir) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val (_, _, bands) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, 2, "is"),
            allowSyntheticBooks = true,
            allowSyntheticGeometry = true).get
          bands.map(b => (id, b.frame.toLong, b.channel.toLong,
            b.band.toLong, b.sSum, b.sMsq))
        }.toDF("media_id", "frame", "channel", "band", "s_sum", "s_msq")
      },
      Some(isOracle)),

    // TNS (§4.6.9): formulaic temporal noise shaping — sine-dequant
    // reflection coefs, LPC step-up, all-pole synthesis over the
    // filter region in transmitted direction (both directions, both
    // resolutions, orders 1..3, both compressions exercised).
    ("multimodal_aac_tns",
      (s, dir) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val nf = (id % 3).toInt + 1
          val (_, _, bands) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, nf, "tns"),
            allowSyntheticBooks = true,
            allowSyntheticGeometry = true).get
          bands.map(b => (id, b.frame.toLong, b.band.toLong, b.sSum, b.sMsq))
        }.toDF("media_id", "frame", "band", "s_sum", "s_msq")
      },
      Some(tnsOracle)),

    // PNS (§4.6.13): perceptual noise substitution — codebook-13 bands
    // fill with the engine's portable-hash noise vector normalized to
    // the transmitted noise energy (the PRNG is implementation-defined
    // by the spec; this one is chosen to be stateless and
    // oracle-replayable).
    ("multimodal_aac_pns",
      (s, dir) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val nf = (id % 3).toInt + 1
          val (_, _, bands) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, nf, "pns"),
            allowSyntheticBooks = true,
            allowSyntheticGeometry = true).get
          bands.map(b => (id, b.frame.toLong, b.band.toLong, b.sSum, b.sMsq))
        }.toDF("media_id", "frame", "band", "s_sum", "s_msq")
      },
      Some(pnsOracle)),

    // MULTI-RDB ADTS frames: number_of_raw_data_blocks > 0 packs
    // consecutive byte-aligned blocks into one container frame; the
    // oracle is the UNPACKED chain's verbatim (packing may change the
    // container walk, never the answer — same contract shape as
    // ann_ivf_pruned).
    ("multimodal_aac_multirdb",
      (s, dir) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val nf = (id % 3).toInt + 1
          val (_, _, bands) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, nf, "long", rdbGroup = nf),
            allowSyntheticBooks = true,
            allowSyntheticGeometry = true).get
          bands.map(b => (id, b.frame.toLong, b.band.toLong, b.sSum, b.sMsq))
        }.toDF("media_id", "frame", "band", "s_sum", "s_msq")
      },
      Some(sceLongOracle)),

    // PNS in CPE with the §4.6.13.3 correlation rule: ms_used on an
    // aligned noise-band pair makes the right channel reuse the left's
    // noise vector (scaled by its own nrg); spectral bands still M/S.
    ("multimodal_aac_pns_cpe",
      (s, dir) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val (_, _, bands) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, 2, "pns2"),
            allowSyntheticBooks = true,
            allowSyntheticGeometry = true).get
          bands.map(b => (id, b.frame.toLong, b.channel.toLong,
            b.band.toLong, b.sSum, b.sMsq))
        }.toDF("media_id", "frame", "channel", "band", "s_sum", "s_msq")
      },
      Some(pnsCpeOracle)),

    // The LOADER path (the user-pluggable spec-data mechanism, like
    // multimodal_mp3_hufftable_load): books and swb geometry mounted
    // from FILES through their closure gates, no synthetic opt-in —
    // rows must equal the opt-in decode's exactly (same fixture data
    // traveling the load/gate path a real ISO table file would).
    ("multimodal_aac_codebook_load",
      (s, dir) => {
        import s.implicits._
        val bookText = AacHuff.syntheticFileText(
          AacHuff.spec.keys.toSeq.sorted)
        val geoText =
          "swb 3 long 32\n" + (0 to 32).map(_ * 32).mkString("\n") +
            "\nswb 3 short 8\n" + (0 to 8).map(_ * 16).mkString("\n") + "\n"
        // FIXED path, overwritten each run — a fresh createTempDirectory
        // per invocation would leak one dir per bench repetition (the
        // round-16 IVF-index lesson; round-17 review #5). Content is
        // deterministic, so concurrent runs write identical bytes.
        val tmp = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), "graft_aac_load")
        java.nio.file.Files.createDirectories(tmp)
        val bp = tmp.resolve("books.txt"); val gp = tmp.resolve("geo.txt")
        java.nio.file.Files.write(bp, bookText.getBytes("UTF-8"))
        java.nio.file.Files.write(gp, geoText.getBytes("UTF-8"))
        val books = AacHuff.load(bp.toString)
        val geo = Aac.loadGeometry(gp.toString)
        s.range(24).flatMap { id =>
          val nf = (id % 3).toInt + 1
          val (_, _, bands) = Aac.aacLcDecode(
            Aac.aacLcBytes(id, nf, "long"),
            books = books, geometry = geo).get
          bands.map(b => (id, b.frame.toLong, b.band.toLong, b.sSum, b.sMsq))
        }.toDF("media_id", "frame", "band", "s_sum", "s_msq")
      },
      Some(sceLongOracle))
  )
}
