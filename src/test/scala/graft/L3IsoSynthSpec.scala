package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{L3IsoSynth, Multimodal}

/** Structural + functional closure proofs for the round-14 ISO data
  * drop-ins: Table B.8 scalefactor-band geometry (all three MPEG-1
  * sample rates) and the Table C.1 synthesis window.
  *
  * The window proof is FUNCTIONAL: the §2.4.3.2 analysis filterbank
  * (window C = D/32, the published relation) cascaded into the
  * §2.4.3.2.2 synthesis must reconstruct the input at the published
  * 481-sample filterbank delay to the near-PR floor (measured ≈ 5e-9
  * relative error power). Wrong window data cannot pass: the round-13
  * synthetic stand-in — a perfectly smooth closed-form window — misses
  * by ~7 orders of magnitude (negative control below). */
class L3IsoSynthSpec extends AnyFunSuite {

  test("Table B.8 long columns tile 0..576 with even nondecreasing widths") {
    assert(L3IsoSynth.sfbLong.keySet ==
      Set(32000, 44100, 48000, 22050, 24000, 16000, 11025, 12000, 8000))
    // the MPEG-1 columns are REAL closure-verified data; the three LSF
    // keys share one declared-synthetic array (round 15) and still must
    // satisfy the same structural closure
    L3IsoSynth.sfbLong.foreach { case (sr, b) =>
      assert(b.length == 23, s"$sr entries")
      assert(b.head == 0 && b.last == 576, s"$sr ends")
      b.sliding(2).foreach { case Array(x, y) => assert(x < y, s"$sr mono") }
      val widths = b.sliding(2).map { case Array(x, y) => y - x }.toSeq
      assert(widths.forall(_ % 2 == 0), s"$sr even")
      // nondecreasing across the scalefactor bands proper (0..20); the
      // implicit top region (band 21) is unconstrained (32 kHz: 26)
      widths.take(21).sliding(2).foreach {
        case Seq(a, c) => assert(a <= c, s"$sr width order")
        case _ =>
      }
    }
    // the 48 kHz column IS the array every long-block oracle row has
    // decoded against since round 12
    assert(L3IsoSynth.sfbLong(48000).sameElements(Multimodal.l3Sfb48))
  }

  test("Table B.8 short columns tile 0..192 with even nondecreasing widths") {
    assert(L3IsoSynth.sfbShort.keySet ==
      Set(32000, 44100, 48000, 22050, 24000, 16000, 11025, 12000, 8000))
    L3IsoSynth.sfbShort.foreach { case (sr, b) =>
      assert(b.length == 14, s"$sr entries")
      assert(b.head == 0 && b.last == 192, s"$sr ends")
      b.sliding(2).foreach { case Array(x, y) => assert(x < y, s"$sr mono") }
      val widths = b.sliding(2).map { case Array(x, y) => y - x }.toSeq
      assert(widths.forall(_ % 2 == 0), s"$sr even")
      widths.take(12).sliding(2).foreach {
        case Seq(a, c) => assert(a <= c, s"$sr width order")
        case _ =>
      }
    }
    assert(L3IsoSynth.sfbShort(48000).sameElements(Multimodal.l3SfbS48))
  }

  test("shortPos maps entropy lines to (band, window, line) bijectively") {
    val sfb = L3IsoSynth.sfbShort(48000)
    val seen = scala.collection.mutable.Set[Int]()
    (0 until 576).foreach { i =>
      val (b, w, l) = L3IsoSynth.shortPos(sfb, i)
      assert(b >= 0 && b <= 12 && w >= 0 && w < 3)
      assert(l >= sfb(b) && l < sfb(b + 1))
      val slot = 3 * l + w
      assert(slot >= 0 && slot < 576)
      assert(seen.add(slot), s"slot $slot hit twice (i=$i)")
    }
    assert(seen.size == 576) // the §2.4.3.4.8 reorder is a permutation
  }

  test("Table C.1 landmarks and exactness") {
    val d = L3IsoSynth.winC1
    assert(d.length == 512)
    assert(d(0) == 0.0)
    assert(d(1) == -1.0 / 65536.0)          // printed -0.000015259
    assert(d(256) == 75038.0 / 65536.0)     // printed  1.144989014
    assert(d.forall(x => x * 65536.0 == math.rint(x * 65536.0)))
    assert(d.forall(x => math.abs(x) <= 75038.0 / 65536.0))
    // published mirror: |D[i]| == |D[512-i]| for i = 1..255
    (1 until 256).foreach(i =>
      assert(math.abs(d(i)) == math.abs(d(512 - i)), s"mirror $i"))
  }

  /** Full §2.4.3.2 analysis→synthesis cascade with window D (synthesis)
    * and C = D/32 (analysis); returns relative error power of the
    * reconstruction against the input delayed by 481 samples. */
  private def cascadeErr(d: Array[Double]): Double = {
    val c = d.map(_ / 32.0)
    val n = 3072
    val x = Array.tabulate(n)(t =>
      math.sin(2 * math.Pi * 0.03 * t) +
        0.5 * math.sin(2 * math.Pi * 0.11 * t + 1.0))
    val ma = Array.tabulate(32, 64)((k, i) =>
      math.cos((2 * k + 1) * (i - 16) * math.Pi / 64.0))
    val xb = new Array[Double](512)
    val vv = new Array[Double](1024)
    val out = new Array[Double](n)
    var blk = 0
    while (blk < n / 32) {
      System.arraycopy(xb, 0, xb, 32, 480)
      var i = 0
      while (i < 32) { xb(i) = x(blk * 32 + 31 - i); i += 1 }
      val y = new Array[Double](64)
      i = 0
      while (i < 64) {
        var j = 0; var acc = 0.0
        while (j < 8) { acc += xb(i + 64 * j) * c(i + 64 * j); j += 1 }
        y(i) = acc; i += 1
      }
      val s = Array.tabulate(32) { k =>
        var acc = 0.0; var q = 0
        while (q < 64) { acc += ma(k)(q) * y(q); q += 1 }
        acc
      }
      // synthesis step with window d (same flow as l3SynthStep)
      var kk = 1023
      while (kk >= 64) { vv(kk) = vv(kk - 64); kk -= 1 }
      kk = 0
      while (kk < 64) {
        var acc = 0.0; var sb = 0
        while (sb < 32) {
          acc += s(sb) * Multimodal.l3SynthN(kk * 32 + sb); sb += 1
        }
        vv(kk) = acc; kk += 1
      }
      var i2 = 0
      while (i2 < 32) {
        var acc = 0.0; var b = 0
        while (b < 16) {
          val u = if (b % 2 == 0) vv((b / 2) * 128 + i2)
                  else vv((b / 2) * 128 + 96 + i2)
          acc += u * d(b * 32 + i2); b += 1
        }
        out(blk * 32 + i2) = acc; i2 += 1
      }
      blk += 1
    }
    var num = 0.0; var den = 0.0
    var t = 1000
    while (t < 2500) {
      val e = out(t) - x(t - 481)
      num += e * e; den += x(t - 481) * x(t - 481)
      t += 1
    }
    num / den
  }

  test("near-perfect reconstruction at the published 481-sample delay") {
    val err = cascadeErr(L3IsoSynth.winC1)
    assert(err < 1e-6, s"cascade err $err")
  }

  test("negative control: the synthetic window fails the PR bound") {
    val err = cascadeErr(Multimodal.l3SynthDSynthetic)
    assert(err > 1e-3, s"synthetic window unexpectedly reconstructs: $err")
  }
}
