package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

/** Scratch probe for the MPEG-1 I→P motion-compensation round trip. */
class ScratchMpegPProbe extends AnyFunSuite {
  test("mpeg1 I->P round trip across 24 seeds") {
    (0 until 24).foreach { id =>
      val bytes = Multimodal.mpeg1IPBytes(id)
      val decoded = Multimodal.mpeg1IPDecode(bytes)
      assert(decoded.isDefined, s"id=$id decode failed")
      val ((w, h), mbs) = decoded.get
      assert(w == 64 && h == 32)
      assert(mbs.size == 16, s"id=$id mbs=${mbs.size}")
      val p = mbs.filter(_.pic == 1)
      assert(p.map(_.kind) == Seq(0, 1, 1, 2, 1, 0, 1, 1),
        s"id=$id kinds=${p.map(_.kind)}")
      // MC vectors match the fixture closed forms
      Seq(1, 2, 4, 6, 7).foreach { m =>
        val (vx, vy) = Multimodal.mpeg1PVec(id, m)
        val r = p.find(_.mb == m).get
        assert(r.dx == vx && r.dy == vy,
          s"id=$id mb=$m got (${r.dx},${r.dy}) want ($vx,$vy)")
      }
      // skipped macroblock equals the co-located reference block
      val i3 = mbs.find(r => r.pic == 0 && r.mb == 3).get
      val p3 = p.find(_.mb == 3).get
      assert(p3.ySum == i3.ySum && p3.ySqSum == i3.ySqSum)
      // a zero-vector MC block also equals its reference block
      Seq(1, 2, 4, 6, 7).foreach { m =>
        val (vx, vy) = Multimodal.mpeg1PVec(id, m)
        if (vx == 0 && vy == 0) {
          val ir = mbs.find(r => r.pic == 0 && r.mb == m).get
          val pr = p.find(_.mb == m).get
          assert(pr.ySum == ir.ySum, s"id=$id mb=$m zero-MV mismatch")
        }
      }
      if (id < 2) {
        info(s"id=$id p-kinds=${p.map(_.kind)} " +
          s"v1=${Multimodal.mpeg1PVec(id, 1)} ySums=${p.map(_.ySum)}")
      }
    }
  }
}
