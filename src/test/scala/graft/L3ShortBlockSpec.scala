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

  test("start/stop windows: closed-form pieces, time-reverse symmetry") {
    val sta = Multimodal.l3WinStart; val sto = Multimodal.l3WinStop
    assert(sta.length == 36 && sto.length == 36)
    // start's long rise IS the long window's rise
    assert(sta.take(18).toSeq == Multimodal.l3Win.take(18).toSeq)
    assert(sta.slice(18, 24).forall(_ == 1.0) && sta.drop(30).forall(_ == 0.0))
    assert(sto.take(6).forall(_ == 0.0) && sto.slice(12, 18).forall(_ == 1.0))
    // stop is start time-reversed (sine symmetry survives quantization)
    (0 until 36).foreach(i => assert(sto(i) == sta(35 - i), s"i=$i"))
    // the short fall matches the short window's fall
    (0 until 6).foreach(i =>
      assert(sta(24 + i) == Multimodal.l3Win12(6 + i), s"short fall $i"))
  }

  test("start/stop fixture round-trips across 24 seeds") {
    (0 until 24).foreach { id =>
      val nf = (id % 3) + 1
      val decoded = Multimodal.layer3DecodeFull(
        Multimodal.layer3StartStopBytes(id.toLong, nf))
      assert(decoded.isDefined, s"id=$id start/stop decode failed")
      val (_, grans, subs, _) = decoded.get
      assert(grans.size == nf * 2 && subs.size == nf * 2 * 32)
      assert(subs.exists(_.sMsq > 0.0))
    }
  }

  test("mixed-block fixture round-trips across 24 seeds") {
    (0 until 24).foreach { id =>
      val nf = (id % 3) + 1
      val decoded = Multimodal.layer3DecodeFull(
        Multimodal.layer3MixedBytes(id.toLong, nf))
      assert(decoded.isDefined, s"id=$id mixed decode failed")
      val (_, grans, subs, _) = decoded.get
      assert(grans.size == nf * 2 && subs.size == nf * 2 * 32)
      assert(grans.forall(_.nNonzero > 0))
      // both regions carry energy: the long subbands (0-1) and the
      // short ones (2+) — proof the split actually exercises both paths
      assert(subs.exists(s2 => s2.subband <= 1 && s2.sMsq > 0.0),
        s"id=$id long region silent")
      assert(subs.exists(s2 => s2.subband >= 2 && s2.sMsq > 0.0),
        s"id=$id short region silent")
    }
  }

  test("mixed reorder: long lines fixed, short slots ≥ 36, permutation") {
    val slots = (0 until 576).map { e =>
      if (e < 36) e
      else {
        val e2 = e - 36
        val b = 3 + e2 / 60; val w = (e2 % 60) / 20
        val l = 12 + 20 * (b - 3) + e2 % 20
        val t = 3 * l + w
        assert(t >= 36 && t % 3 == w, s"e=$e")
        t
      }
    }
    assert(slots.sorted == (0 until 576))
  }

  test("MS stereo over short blocks round-trips") {
    (0 until 16).foreach { id =>
      val nf = (id % 2) + 1
      val decoded = Multimodal.layer3DecodeFull(
        Multimodal.layer3StereoShortBytes(id.toLong, nf))
      assert(decoded.isDefined, s"id=$id MS-short decode failed")
      val (meta, grans, subs, _) = decoded.get
      assert(meta.channels == 2)
      assert(grans.size == nf * 2 * 2 && subs.size == nf * 2 * 2 * 32)
      assert(subs.exists(s2 => s2.channel == 1 && s2.sMsq > 0.0))
    }
  }

  test("intensity over short blocks decodes (round 14) and the mode " +
       "extension bit is load-bearing") {
    (0 until 16).foreach { id =>
      val nf = (id % 2) + 1
      val decoded = Multimodal.layer3DecodeFull(
        Multimodal.layer3StereoShortBytes(id.toLong, nf, intensity = true))
      assert(decoded.isDefined, s"id=$id intensity-short decode failed")
      val (meta, _, subs, _) = decoded.get
      assert(meta.channels == 2)
      // panning puts energy into the band-limited right channel's
      // intensity region (per-window bounds from the right channel's
      // own 9-pair band limit)
      assert(subs.exists(s2 => s2.channel == 1 && s2.sMsq > 0.0))
    }
    // same payload bits, MS vs intensity mode extension → different
    // stereo reconstruction (the bit selects a different §2.4.3.4.9
    // path, not a relabeling)
    val ib = Multimodal.layer3StereoShortBytes(3L, 1, intensity = true)
    val mb = ib.clone()
    mb(3) = ((mb(3) & ~0x30) | 0x20).toByte // mode_ext 01 → 10 (MS)
    val (_, _, iSubs, _) = Multimodal.layer3DecodeFull(ib).get
    val (_, _, mSubs, _) = Multimodal.layer3DecodeFull(mb).get
    assert(iSubs != mSubs)
  }

  test("intensity over MIXED blocks decodes (round 15), both §2.4.3.4.9.3 " +
       "regimes firing") {
    var evenPan = false // 9-pair regime: panning beyond the right spectrum
    var oddPan = false  // 21-pair regime: per-window panning above band 3
    (0 until 16).foreach { id =>
      val nf = (id % 2) + 1
      // plain MS over stereo mixed decodes too (line-wise recombination)
      assert(Multimodal.layer3DecodeFull(
        Multimodal.layer3MixedStereoBytes(id.toLong, nf)).isDefined,
        s"id=$id MS-mixed decode failed")
      val decoded = Multimodal.layer3DecodeFull(
        Multimodal.layer3MixedStereoBytes(id.toLong, nf, intensity = true))
      assert(decoded.isDefined, s"id=$id intensity-mixed decode failed")
      val (meta, _, subs, _) = decoded.get
      assert(meta.channels == 2)
      assert(subs.exists(s2 => s2.channel == 1 && s2.sMsq > 0.0))
      // Causality probes on granule (f0, g0) — no overlap-add history:
      // EVEN id = 9-pair regime, the right channel's own lines stop at
      // entropy line 17 (subband 0) and alias leakage of those reaches
      // subband 1 at most, so ch-1 energy in subbands ≥ 2 can only be
      // SHORT-band panning (reordered short lines start at t = 36).
      // ODD id = 21-pair regime, the right's own reordered lines stop
      // at t ≤ 46 (subband 2), so ch-1 energy in subbands ≥ 3 proves
      // the PER-WINDOW bound panned bands above its spectrum. The
      // long-band panning VALUES are proven bit-exactly by the
      // multimodal_mp3_intensity_mixed oracle row (its proc CTE pans
      // the long region independently); these are liveness probes.
      val g0 = subs.filter(s2 => s2.frame == 0 && s2.granule == 0 &&
                                 s2.channel == 1)
      if (id % 2 == 0) {
        if (g0.exists(s2 => s2.subband >= 2 && s2.sMsq > 0.0))
          evenPan = true
      } else {
        if (g0.exists(s2 => s2.subband >= 3 && s2.sMsq > 0.0))
          oddPan = true
      }
    }
    assert(evenPan, "short-band panning never fired in the 9-pair regime")
    assert(oddPan, "per-window panning never fired in the 21-pair regime")
  }

  test("nonzero scfsi with a short granule refuses (no empty-slot sharing)") {
    // scfsi sharing copies granule-0 LONG scalefactor bands; a short
    // granule populates none, so §2.4.2.7 forbids the combination —
    // setting the mono scfsi field (bits 46-49) on a short stream must
    // refuse, never mis-decode granule 1 from zeros.
    val bytes = Multimodal.layer3ShortBytes(3L, 1)
    val bad = bytes.clone()
    bad(5) = (bad(5) | 0x03).toByte  // scfsi bits 46-47
    bad(6) = (bad(6) | 0xc0).toByte  // scfsi bits 48-49
    assert(Multimodal.layer3DecodeFull(bad).isEmpty)
  }

  test("mixed flag on non-short block types stays declared (None)") {
    // Set mixed_block_flag on a block_type 1 granule: refuse, not
    // mis-decode. Flag = bit 86 → byte 10, mask 0x02 (after header 32 +
    // mdb 9 + private 5 + scfsi 4 + part23 12 + bv 9 + gain 8 +
    // scomp 4 + ws 1 + block_type 2).
    val bytes = Multimodal.layer3StartStopBytes(2L, 1) // seed 2: g0 is bt 1
    val bad = bytes.clone()
    bad(10) = (bad(10) | 0x02).toByte
    assert(Multimodal.layer3DecodeFull(bad).isEmpty)
  }
}
