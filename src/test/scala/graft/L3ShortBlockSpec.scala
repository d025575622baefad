package graft

import graft.pipeline.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Short-block (window-switching) Layer III machinery behind
  * `multimodal_mp3_shortblock`: the §2.4.1.7 side-info form, 12×3 short
  * scalefactors, per-window subblock gains, the §2.4.3.4.8 stride-3
  * reorder, three 12-point IMDCTs per subband with the closed-form
  * short sine window, and the 6-offset overlap assembly. Short
  * scalefactor-band GEOMETRY is synthetic (uniform 12×16 — ISO Table
  * B.8 short columns stay declared); everything tested here is
  * geometry-independent structure or the declared synthetic layout. */
class L3ShortBlockSpec extends AnyFunSuite {

  test("short IMDCT constants are the n=12 closed form") {
    assert(Multimodal.l3Cos12.length == 72)
    for (i <- 0 until 12; k <- 0 until 6) {
      val e = math.rint(math.cos(math.Pi / 24.0 * (2 * i + 1 + 6) *
        (2 * k + 1)) * 1e12) / 1e12
      assert(Multimodal.l3Cos12(i * 6 + k) == e, s"cos12($i,$k)")
    }
    for (i <- 0 until 12) {
      val e = math.rint(math.sin(math.Pi / 12.0 * (i + 0.5)) * 1e12) / 1e12
      assert(Multimodal.l3Win12(i) == e, s"win12($i)")
    }
  }

  test("short-block fixture round-trips across 24 seeds") {
    var mdbNonzero = 0
    (0 until 24).foreach { id =>
      val nf = (id % 3) + 1
      val decoded = Multimodal.layer3DecodeFull(
        Multimodal.layer3ShortBytes(id.toLong, nf))
      assert(decoded.isDefined, s"id=$id short decode failed")
      val (_, grans, subs, pcms) = decoded.get
      assert(grans.size == nf * 2, s"id=$id grans=${grans.size}")
      assert(subs.size == nf * 2 * 32, s"id=$id subs=${subs.size}")
      assert(pcms.size == nf * 2, s"id=$id pcms=${pcms.size}")
      assert(grans.forall(_.nNonzero > 0))
      assert(subs.exists(_.sMsq > 0.0), s"id=$id all-silent subbands")
      mdbNonzero += grans.count(_.mainDataBegin > 0)
    }
    assert(mdbNonzero > 10, s"reservoir exercised: $mdbNonzero")
  }

  test("decode is bit-account-exact (part2_3_length gate passes)") {
    // layer3DecodeFull rejects any granule whose consumed bits differ
    // from part2_3_length, so a successful decode IS the account check;
    // corrupting the count1 region must break it.
    val bytes = Multimodal.layer3ShortBytes(5L, 2)
    assert(Multimodal.layer3DecodeFull(bytes).isDefined)
    val bad = bytes.clone()
    // frame 0's main data starts at byte 21 (4 header + 17 side info)
    // with granule 0's short scalefactors: flipping a bit there either
    // desyncs the bit account or changes decoded spectra
    bad(21) = (bad(21) ^ 0x80).toByte
    val out = Multimodal.layer3DecodeFull(bad)
    assert(out.isEmpty ||
      out.get._2.map(g => (g.xrSum, g.xrMsq)) !=
        Multimodal.layer3DecodeFull(bytes).get._2.map(g => (g.xrSum, g.xrMsq)))
  }

  test("overlap-add isolation: frame 0 rows agree between 1- and 2-frame streams") {
    val two = Multimodal.layer3DecodeFull(Multimodal.layer3ShortBytes(7L, 2)).get
    val one = Multimodal.layer3DecodeFull(Multimodal.layer3ShortBytes(7L, 1)).get
    assert(two._3.filter(_.frame == 0).map(s => (s.subband, s.sSum, s.sMsq)) ==
           one._3.filter(_.frame == 0).map(s => (s.subband, s.sSum, s.sMsq)))
  }

  test("stride-3 reorder: an isolated entropy line lands at 3·l + w") {
    // Structural identity on the synthetic geometry: entropy index e →
    // band e/48, window (e%48)/16, spectral line b·16 + e%16, transform
    // slot 3·line + window. Verify the mapping is a permutation of
    // 0..575 and window-w lines occupy exactly the slots ≡ w (mod 3).
    val slots = (0 until 576).map { e =>
      val b = e / 48; val w = (e % 48) / 16; val l = b * 16 + e % 16
      val t = 3 * l + w
      assert(t % 3 == w, s"e=$e")
      t
    }
    assert(slots.sorted == (0 until 576))
  }

  test("start/stop and mixed window forms stay declared (None)") {
    // Flip block_type 2 → 1 in the first granule's side info: decoder
    // must refuse (declared seam), not mis-decode. block_type bits sit
    // right after the ws flag of granule 0: header(32) + mdb(9) +
    // private(5) + scfsi(4) + part23(12) + bv(9) + gain(8) + scomp(4) +
    // ws(1) = bit 84, so block_type occupies bits 84-85.
    val bytes = Multimodal.layer3ShortBytes(3L, 1)
    val bad = bytes.clone()
    // bit 84 is in byte 10, mask 0x08; set block_type = 1 (bits 01):
    // clear bit 84, set bit 85
    bad(10) = ((bad(10) & ~0x08) | 0x04).toByte
    assert(Multimodal.layer3DecodeFull(bad).isEmpty)
  }
}
