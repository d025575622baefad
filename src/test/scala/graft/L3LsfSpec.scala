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
    // block_type = bits 80-81 → byte 10 top two bits
    val shortBt = ok.clone()
    shortBt(10) = ((shortBt(10) & 0x3f) | 0x80).toByte // bt 1/3 → 2
    assert(Multimodal.layer3DecodeFull(shortBt,
        allowSyntheticGeometry = true).isEmpty,
      "LSF short block must refuse (declared)")
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
    // LSF joint-stereo INTENSITY refuses upfront (declared; 13818-3
    // intensity semantics differ from the MPEG-1 panning)
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
