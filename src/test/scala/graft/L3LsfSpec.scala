package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Multimodal

/** MPEG-2 LSF (ISO 13818-3) Layer III closure + round-trip coverage
  * (round 15). The LSF scalefactor layout is ALGORITHMIC — slens and
  * partition widths derive from the 9-bit scalefac_compress — so unlike
  * the Huffman/band tables there is no data to recall; what a spec can
  * pin is the structural closure the derivation must satisfy: in every
  * one of the 512 sfc values, the four partitions tile the 21 long
  * scalefactor bands EXACTLY (a partition mis-derivation would leave
  * bands unread or over-read and break every bit account), slens stay
  * in [0, 5), and preflag is exactly the sfc ≥ 500 class. */
class L3LsfSpec extends AnyFunSuite {

  test("all 512 scalefac_compress values: partitions tile 21 bands, " +
       "slens bounded, preflag class exact") {
    (0 until 512).foreach { sfc =>
      val (slens, parts) = Multimodal.lsfScaleLong(sfc)
      assert(parts.sum == 21, s"sfc=$sfc parts ${parts.mkString(",")}")
      assert(parts.forall(_ >= 0))
      assert(slens.forall(l => l >= 0 && l < 5),
        s"sfc=$sfc slens ${slens.mkString(",")}")
      // the three classes use the published partition rows
      val expected =
        if (sfc < 400) Seq(6, 5, 5, 5)
        else if (sfc < 500) Seq(6, 5, 7, 3)
        else Seq(11, 10, 0, 0)
      assert(parts.toSeq == expected, s"sfc=$sfc")
    }
  }

  test("short/mixed classes: all 512 sfc × btn tile 36/33 slots exactly") {
    (0 until 512).foreach { sfc =>
      val (slensS, partsS) = Multimodal.lsfScale(sfc, 1)
      val (slensM, partsM) = Multimodal.lsfScale(sfc, 2)
      assert(partsS.sum == 36, s"sfc=$sfc short ${partsS.mkString(",")}")
      assert(partsM.sum == 33, s"sfc=$sfc mixed ${partsM.mkString(",")}")
      assert(partsS.forall(_ >= 0) && partsM.forall(_ >= 0))
      // slens are class-derived, identical across btn (the btn changes
      // only the slot counts)
      assert(slensS.toSeq == Multimodal.lsfScaleLong(sfc)._1.toSeq)
      assert(slensM.toSeq == slensS.toSeq)
      // the mixed class's first slots cover exactly the 6 long bands:
      // every class row starts with a partition of ≥ 6 slots
      assert(partsM(0) >= 6, s"sfc=$sfc mixed p0 ${partsM(0)}")
    }
  }

  test("intensity classes: all isfc < 255 × btn tile 21/36/33; " +
       "isfc = 255 refuses; factor tables are io^k") {
    (0 until 255).foreach { isfc =>
      val sums = Seq(21, 36, 33)
      (0 to 2).foreach { btn =>
        val (slens, parts) = Multimodal.lsfScaleIntensity(isfc, btn)
        assert(parts.sum == sums(btn),
          s"isfc=$isfc btn=$btn ${parts.mkString(",")}")
        assert(parts.forall(_ >= 0))
        assert(slens.forall(l => l >= 0 && l <= 5),
          s"isfc=$isfc slens ${slens.mkString(",")}")
        assert(slens(3) == 0) // the intensity classes use three slens
      }
    }
    intercept[IllegalArgumentException] {
      Multimodal.lsfScaleIntensity(255, 0)
    }
    // factor pairs: position 0 is the identity; exactly one channel is
    // scaled elsewhere; factors are monotone non-increasing in k within
    // a parity; scale 1 (io = 2^-1/2) attenuates faster than scale 0
    (0 to 1).foreach { sc =>
      assert(Multimodal.l3LsfIsKl(sc)(0) == 1.0)
      assert(Multimodal.l3LsfIsKr(sc)(0) == 1.0)
      (1 until 32).foreach { p =>
        val kl = Multimodal.l3LsfIsKl(sc)(p)
        val kr = Multimodal.l3LsfIsKr(sc)(p)
        if (p % 2 == 1) assert(kl < 1.0 && kr == 1.0, s"sc=$sc p=$p")
        else assert(kl == 1.0 && kr < 1.0, s"sc=$sc p=$p")
      }
      // io^2 at scale 0 (2^-1/4 squared) = io at scale 1 (2^-1/2)
      assert(math.abs(Multimodal.l3LsfIsKr(0)(4) -
                      Multimodal.l3LsfIsKr(1)(2)) < 1e-11)
    }
  }

  test("LSF fixture round-trips: one granule per frame, all three " +
       "scalefactor classes carry energy") {
    (0 until 24).foreach { id =>
      val nf = (id % 3) + 1
      val decoded = Multimodal.layer3DecodeFull(
        Multimodal.layer3LsfBytes(id.toLong, nf),
        allowSyntheticGeometry = true)
      assert(decoded.isDefined, s"id=$id LSF decode failed")
      val (meta, grans, subs, _) = decoded.get
      assert(meta.sampleRate == 24000 && meta.channels == 1)
      // ONE granule per frame — the MPEG-1 count would be nf * 2
      assert(grans.size == nf, s"id=$id granules ${grans.size}")
      assert(subs.size == nf * 32)
      assert(grans.forall(_.nNonzero > 0))
      assert(subs.exists(_.sMsq > 0.0), s"id=$id all-silent")
    }
    // all three sfc classes occur across a 3-frame stream (f % 3 cycle)
    val (_, g3, _, _) = Multimodal.layer3DecodeFull(
      Multimodal.layer3LsfBytes(5L, 3), allowSyntheticGeometry = true).get
    assert(g3.size == 3)
  }

  test("LSF short/mixed fixtures round-trip (round 16): one granule " +
       "per frame, applied subblock gains, short slots carry energy") {
    (0 until 24).foreach { id =>
      val nf = (id % 3) + 1
      Seq(false, true).foreach { mx =>
        val d = Multimodal.layer3DecodeFull(
          Multimodal.layer3LsfShortBytes(id.toLong, nf, mixed = mx),
          allowSyntheticGeometry = true)
        assert(d.isDefined, s"id=$id mixed=$mx refused")
        val (meta, grans, subs, _) = d.get
        assert(meta.sampleRate == 24000 && meta.channels == 1)
        assert(grans.size == nf, s"id=$id mixed=$mx grans ${grans.size}")
        assert(grans.forall(_.nNonzero > 0))
        assert(subs.exists(_.sMsq > 0.0), s"id=$id mixed=$mx all-silent")
      }
      // pure-short and mixed layouts must decode DIFFERENTLY (btn
      // routes both the slot reads and the low-line banding)
      val a = Multimodal.layer3DecodeFull(
        Multimodal.layer3LsfShortBytes(id.toLong, nf),
        allowSyntheticGeometry = true).get._3
      val b = Multimodal.layer3DecodeFull(
        Multimodal.layer3LsfShortBytes(id.toLong, nf, mixed = true),
        allowSyntheticGeometry = true).get._3
      assert(a != b, s"id=$id short == mixed decode")
    }
    // mixed granules on NON-aligned loaded geometry refuse (the
    // synthAlt tiling has sfbL(6) = 38 ≠ 36): machinery guards the
    // band-boundary coherence instead of mis-banding
    val geom = Map(24000 ->
      (graft.pipeline.L3IsoSynth.synthAltLong,
       graft.pipeline.L3IsoSynth.synthAltShort))
    assert(Multimodal.layer3DecodeFull(
      Multimodal.layer3LsfShortBytes(3L, 1, mixed = true),
      extraGeometry = geom).isEmpty,
      "mixed on misaligned geometry must refuse")
    // ... while pure short on the same loaded geometry decodes
    assert(Multimodal.layer3DecodeFull(
      Multimodal.layer3LsfShortBytes(3L, 1),
      extraGeometry = geom).isDefined)
  }

  test("LSF intensity-stereo fixture round-trips (round 16): panning " +
       "reaches the right channel, illegal positions pass through") {
    var panned = 0
    (0 until 24).foreach { id =>
      val nf = (id % 3) + 1
      val d = Multimodal.layer3DecodeFull(
        Multimodal.layer3LsfIntensityBytes(id.toLong, nf),
        allowSyntheticGeometry = true)
      assert(d.isDefined, s"id=$id refused")
      val (meta, grans, subs, _) = d.get
      assert(meta.sampleRate == 24000 && meta.channels == 2)
      assert(grans.size == nf * 2, s"id=$id grans ${grans.size}")
      // the right channel must carry energy ABOVE its own transmitted
      // spectrum (lines < 16 ⊂ subbands 0) in some granule — only the
      // intensity pan can put it there
      if (subs.exists(b => b.channel == 1 && b.subband >= 1 &&
                           b.sMsq > 0.0)) panned += 1
    }
    assert(panned > 12, s"intensity panning reached only $panned/24 streams")
    // the scale bit matters: flipping intensity_scale (scomp LSB of the
    // right channel) must change the decode — k factors differ. Seed 7:
    // isfc = 21 → slens (0,3,3), so the upper partitions carry 3-bit
    // is_pos values ≥ 2 where the two io bases actually diverge (a
    // seed whose class yields only slen ≤ 1 slots has is_pos ∈
    // {0, illegal}, which are scale-invariant by construction)
    val base = Multimodal.layer3DecodeFull(
      Multimodal.layer3LsfIntensityBytes(7L, 1),
      allowSyntheticGeometry = true).get._3
    // right channel scomp LSB: side info bits 32+8+2+63 ch0, then ch1
    // part23(12) bv(9) gain(8) scomp(9) → LSB at bit 105+38 = offset
    // 32+8+2+63+12+9+8+8 = 142 from frame start
    val flip = Multimodal.layer3LsfIntensityBytes(7L, 1)
    val bitIdx = 32 + 8 + 2 + 63 + 12 + 9 + 8 + 8
    flip(bitIdx >> 3) = (flip(bitIdx >> 3) ^ (1 << (7 - (bitIdx & 7)))).toByte
    val flipped = Multimodal.layer3DecodeFull(flip,
      allowSyntheticGeometry = true)
    assert(flipped.isEmpty || flipped.get._3 != base,
      "intensity_scale flip must change the decode")
  }

  test("LSF intensity over SHORT blocks (round 16): per-window bound, " +
       "btn-1 intensity classes, panning reaches the right channel") {
    var panned = 0
    (0 until 24).foreach { id =>
      val nf = (id % 3) + 1
      val d = Multimodal.layer3DecodeFull(
        Multimodal.layer3LsfIntensityBytes(id.toLong, nf,
          shortBlocks = true),
        allowSyntheticGeometry = true)
      assert(d.isDefined, s"id=$id refused")
      val (meta, grans, subs, _) = d.get
      assert(meta.sampleRate == 24000 && meta.channels == 2)
      assert(grans.size == nf * 2)
      // the right channel's own short spectrum reorders to scattered
      // low spectral lines; energy in upper subbands can only arrive
      // via the per-window intensity pan
      if (subs.exists(b => b.channel == 1 && b.subband >= 2 &&
                           b.sMsq > 0.0)) panned += 1
    }
    assert(panned > 12,
      s"short-block intensity panned only $panned/24 streams")
    // and the short layout must differ from the long-block decode of
    // the same seeds (the btn routes both channels' slot layouts)
    val a = Multimodal.layer3DecodeFull(
      Multimodal.layer3LsfIntensityBytes(7L, 1),
      allowSyntheticGeometry = true).get._3
    val b = Multimodal.layer3DecodeFull(
      Multimodal.layer3LsfIntensityBytes(7L, 1, shortBlocks = true),
      allowSyntheticGeometry = true).get._3
    assert(a != b)
  }

  test("LSF refusals: short blocks, MPEG-2.5, and version mixing") {
    val ok = Multimodal.layer3LsfBytes(3L, 1)
    assert(Multimodal.layer3DecodeFull(ok,
      allowSyntheticGeometry = true).isDefined)
    // round 16 provenance guard: WITHOUT the opt-in (or loaded
    // geometry) the same LSF stream refuses — a real-world 24 kHz file
    // can never decode on the synthetic tiling silently
    assert(Multimodal.layer3DecodeFull(ok).isEmpty)
    // force block_type 2 (short) on the LSF granule: side info bit
    // layout 32 hdr + 8 mdb + 1 priv + 12 + 9 + 8 + 9 + 1 ws = 80,
    // block_type = bits 80-81 → byte 10 top two bits. Short blocks
    // DECODE since round 16 (lsfScale btn 1), so the flip no longer
    // refuses up front: the stream re-reads as a (garbage but
    // well-formed) short-block stream — either the bit account breaks,
    // or it reconciles by chance and the decode MUST differ from the
    // long-layout decode (btn actually routes the slot layout).
    val shortBt = ok.clone()
    shortBt(10) = ((shortBt(10) & 0x3f) | 0x80).toByte // bt 1/3 → 2
    val flipped = Multimodal.layer3DecodeFull(shortBt,
      allowSyntheticGeometry = true)
    val unflipped = Multimodal.layer3DecodeFull(ok,
      allowSyntheticGeometry = true)
    assert(flipped.isEmpty || flipped.get._3 != unflipped.get._3,
      "flipped block_type must not decode to the long-layout rows")
    // MPEG-2.5 (round 15): decodes, and the quarter-rate re-wrap of
    // the SAME granule payloads decodes to IDENTICAL rows — the
    // re-encode-equivalence check that lets multimodal_mp3_v25 share
    // multimodal_mp3_lsf's oracle verbatim
    (0 until 8).foreach { id =>
      val nf = (id % 3) + 1
      val a = Multimodal.layer3DecodeFull(
        Multimodal.layer3LsfBytes(id.toLong, nf),
        allowSyntheticGeometry = true)
      val b = Multimodal.layer3DecodeFull(
        Multimodal.layer3LsfBytes(id.toLong, nf, v25 = true),
        allowSyntheticGeometry = true)
      assert(b.isDefined, s"id=$id V2.5 decode failed")
      assert(b.get._1.sampleRate == 12000)
      assert(a.get._2 == b.get._2 && a.get._3 == b.get._3,
        s"id=$id V2/V2.5 decode mismatch")
    }
    // flipping the MONO fixture's header to joint stereo (round 16:
    // LSF intensity now decodes — see layer3LsfIntensityBytes) shifts
    // the expected side-info size 9 → 17 bytes, so the stream reads as
    // garbage and refuses on the side/bit account, not silently
    val intens = ok.clone()
    intens(3) = 0x50.toByte // joint stereo, mode_ext 01
    assert(Multimodal.layer3DecodeFull(intens,
      allowSyntheticGeometry = true).isEmpty)
    // reserved version bits 01 refuse
    val vres = ok.clone()
    vres(1) = ((vres(1) & ~0x18) | 0x08).toByte
    assert(Multimodal.layer3DecodeFull(vres).isEmpty)
    // a V1 frame following an LSF frame: the sample rates differ, so
    // the rate-wide-geometry refusal fires
    val mixed = Multimodal.layer3LsfBytes(3L, 1) ++
      Multimodal.layer3BytesFull(3L, 1)
    assert(Multimodal.layer3DecodeFull(mixed,
      allowSyntheticGeometry = true).isEmpty)
  }
}
