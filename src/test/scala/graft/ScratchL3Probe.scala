package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

/** Scratch probe for the Layer III full chain (reservoir + count1 +
  * scalefactors + requant + IMDCT): round-trips the fixture encoder
  * through the decoder across seeds and prints representative values. */
class ScratchL3Probe extends AnyFunSuite {
  test("layer3 full round trip across 24 seeds") {
    var mdbNonzero = 0
    (0 until 24).foreach { id =>
      val nf = (id % 3) + 1
      val bytes = Multimodal.layer3BytesFull(id, nf)
      val decoded = Multimodal.layer3DecodeFull(bytes)
      assert(decoded.isDefined, s"id=$id decode failed")
      val (_, grans, subs, _) = decoded.get
      assert(grans.size == nf * 2, s"id=$id grans=${grans.size}")
      assert(subs.size == nf * 2 * 32, s"id=$id subs=${subs.size}")
      mdbNonzero += grans.count(_.mainDataBegin > 0)
      if (id < 3) {
        val g = grans.head
        info(s"id=$id f0g0: mdb=${g.mainDataBegin} pre=${g.preflag} " +
          s"nC1=${g.nCount1} nNz=${g.nNonzero} xrSum=${g.xrSum} " +
          s"xrMsq=${g.xrMsq}")
        val s0 = subs.head
        info(s"  sb0: sSum=${s0.sSum} sMsq=${s0.sMsq}")
      }
    }
    assert(mdbNonzero > 10, s"reservoir exercised: $mdbNonzero granules")
  }

  test("layer3 MS-stereo round trip across 16 seeds") {
    (0 until 16).foreach { id =>
      val nf = (id % 2) + 1
      val bytes = Multimodal.layer3StereoBytes(id, nf)
      val decoded = Multimodal.layer3DecodeFull(bytes)
      assert(decoded.isDefined, s"id=$id stereo decode failed")
      val (meta, grans, subs, _) = decoded.get
      assert(meta.channels == 2)
      assert(grans.size == nf * 2 * 2, s"id=$id grans=${grans.size}")
      assert(subs.size == nf * 2 * 2 * 32, s"id=$id subs=${subs.size}")
      assert(grans.exists(_.channel == 1))
      // MS recombination: channel sums differ unless M or S is silent
      if (id == 0) {
        val l = subs.filter(s => s.frame == 0 && s.granule == 0 &&
          s.channel == 0).map(_.sSum).sum
        val r = subs.filter(s => s.frame == 0 && s.granule == 0 &&
          s.channel == 1).map(_.sSum).sum
        info(s"id=0 f0g0: L-sum=$l R-sum=$r")
        assert(l != r)
      }
    }
    // mono streams still decode identically through the same entry
    val mono = Multimodal.layer3DecodeFull(Multimodal.layer3BytesFull(5, 2))
    assert(mono.get._1.channels == 1)
    assert(mono.get._2.forall(_.channel == 0))
  }

  test("layer3 intensity-stereo round trip across 16 seeds") {
    (0 until 16).foreach { id =>
      val nf = (id % 2) + 1
      val bytes = Multimodal.layer3StereoBytes(id, nf, intensity = true)
      val decoded = Multimodal.layer3DecodeFull(bytes)
      assert(decoded.isDefined, s"id=$id intensity decode failed")
      val (meta, grans, subs, _) = decoded.get
      assert(meta.channels == 2)
      assert(subs.size == nf * 2 * 2 * 32)
      // right channel must carry panned (nonzero) energy in subbands the
      // entropy layer gave it nothing in (bands above line 15 live in
      // subband 1+): proof the intensity panning actually ran.
      val rHigh = subs.filter(s => s.channel == 1 && s.subband >= 1)
        .map(_.sMsq).sum
      assert(rHigh > 0, s"id=$id right channel high subbands silent")
      if (id == 0) {
        val l0 = subs.filter(s => s.channel == 0).map(_.sMsq).sum
        val r0 = subs.filter(s => s.channel == 1).map(_.sMsq).sum
        info(s"id=0 energy L=$l0 R=$r0 rHigh=$rHigh")
      }
    }
  }
}
