package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Multimodal

/** Generalized Layer III big-values walker: table registry structure
  * and linbits/ESC round-trip invariants. Value-level truth is proven
  * by the multimodal_mp3_linbits DuckDB oracle. */
class L3LinbitsSpec extends AnyFunSuite {

  test("table registry: ISO table 1 is prefix-free and complete") {
    val t1 = Multimodal.L3Tables(1)
    assert(t1.linbits == 0)
    assert(t1.codes == Map("1" -> ((0, 0)), "001" -> ((0, 1)),
      "01" -> ((1, 0)), "000" -> ((1, 1))))
    val mass = t1.codes.keys.toSeq.map(c => math.pow(2.0, -c.length)).sum
    assert(mass == 1.0) // complete: every bitstring decodes
  }

  test("synthetic linbits table sits at an ISO-unused slot and is uniform") {
    // ISO 11172-3 Table B.7 marks table_select 4 (and 14) "not used" —
    // mounting the synthetic table there makes the ISO/non-ISO boundary
    // structural: no conforming stream can select it.
    val t4 = Multimodal.L3Tables(4)
    assert(t4.linbits == 4)
    assert(t4.codes.size == 256 && t4.codes.keys.forall(_.length == 8))
    assert(t4.codes.values.toSet ==
      (for (x <- 0 until 16; y <- 0 until 16) yield (x, y)).toSet)
    // round 15: real ISO tables 1-3/5-10 + 12 are registered alongside
    // the synthetic slot; the remaining slots (11, 13, 15, 16-31) stay
    // out until their data passes the structural closure gate (L3IsoHuff)
    assert(Multimodal.L3Tables.keySet ==
      Set(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12))
  }

  test("pow43 magnitudes: exact at 0/1 (dyadic fixtures unaffected), " +
       "1e-12-quantized above") {
    assert(Multimodal.l3Pow43(0) == 0.0 && Multimodal.l3Pow43(1) == 1.0)
    assert(Multimodal.l3Pow43.length == 31)
    (2 to 30).foreach { v =>
      val q = Multimodal.l3Pow43(v)
      assert(math.abs(q - math.pow(v, 4.0 / 3.0)) < 1e-11)
      assert(math.rint(q * 1e12) / 1e12 == q) // idempotent quantization
    }
  }

  test("linbits fixture round-trips across seeds with exact bit accounts") {
    (0L until 24L).foreach { id =>
      val nf = (id % 3).toInt + 1
      val out = Multimodal.layer3DecodeFull(
        Multimodal.layer3LinbitsBytes(id, nf))
      assert(out.isDefined, s"seed $id failed to decode")
      val (meta, grans, _, _) = out.get
      assert(meta.nFrames == nf)
      assert(grans.size == nf * 2, s"seed $id granules ${grans.size}")
      // ESC values actually occur: some granule must carry a magnitude
      // >= 15 (the formulas hit 15..30 regularly), visible as xrMsq
      // dominated by pow43(v>=15) ~ 37+ per line
      assert(grans.forall(_.nNonzero > 0))
    }
  }

  test("ESC magnitudes land: decoded spectra exceed the table-1 range") {
    // With |is| <= 1 (table 1) every |xr| <= 2^5; linbits magnitudes up
    // to 30 requantize to pow43(30) ~ 93 * 2^k, so some granule's
    // energy must exceed any table-1-reachable bound at gain <= 230.
    val (_, grans, _, _) = Multimodal.layer3DecodeFull(
      Multimodal.layer3LinbitsBytes(7, 3)).get
    assert(grans.exists(_.xrMsq > 1000.0),
      s"max xrMsq ${grans.map(_.xrMsq).max} — ESC path apparently unused")
  }
}
