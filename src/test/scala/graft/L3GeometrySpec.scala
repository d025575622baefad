package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{L3IsoSynth, Multimodal}

/** Runtime-loadable LSF/V2.5 band geometry (round 16,
  * [[L3IsoSynth.loadGeometry]]) and the provenance guard: the LSF rates
  * mount declared GRAFT-SYNTHETIC band tables, so a decode at such a
  * rate REFUSES unless the caller loads gate-validated geometry or opts
  * into the synthetic tiling by name — a real 22.05/24/16 kHz file can
  * never yield silently-wrong band boundaries. */
class L3GeometrySpec extends AnyFunSuite {

  private def fileText = L3IsoSynth.synthGeometryFileText(Seq(24000, 12000))

  test("loadGeometry round-trips a gate-clean file") {
    val tf = java.nio.file.Files.createTempFile("graft_geomtest", ".txt")
    try {
      java.nio.file.Files.write(tf, fileText.getBytes("UTF-8"))
      val g = L3IsoSynth.loadGeometry(tf.toString)
      assert(g.keySet == Set(24000, 12000))
      assert(g(24000)._1.toSeq == L3IsoSynth.synthAltLong.toSeq)
      assert(g(24000)._2.toSeq == L3IsoSynth.synthAltShort.toSeq)
    } finally java.nio.file.Files.deleteIfExists(tf)
  }

  test("the monotone-tiling gate refuses structurally bad columns") {
    def refuses(f: String => String): Unit =
      assertThrows[IllegalArgumentException](
        L3IsoSynth.parseGeometry(f(fileText)))
    // MPEG-1 rates ship real verified data — not overridable
    refuses(_.replace("geometry 24000", "geometry 44100"))
    // not a sample rate at all
    refuses(_.replace("geometry 24000", "geometry 23456"))
    // wrong endpoint / broken monotonicity / odd width
    refuses(_.replaceFirst("576", "574"))
    refuses(_.replaceFirst("(?m)^long 0 8 14", "long 0 14 8"))
    refuses(_.replaceFirst("(?m)^long 0 8 14", "long 0 7 14"))
    refuses(_.replaceFirst("(?m)^short 0 6 10", "short 0 5 10"))
    // wrong entry counts
    refuses(_.replaceFirst("(?m)^long 0 8 ", "long 0 "))
    refuses(_.replaceFirst("(?m)^short 0 6 ", "short 0 "))
    // duplicate rate, malformed header, truncation
    refuses(_.replace("geometry 12000", "geometry 24000"))
    refuses(_.replace("geometry 24000", "geom 24000"))
    refuses(t => t.substring(0, t.indexOf("short") + 3))
    // the pristine file still parses
    assert(L3IsoSynth.parseGeometry(fileText).keySet == Set(24000, 12000))
  }

  test("provenance guard: LSF decode refuses without loaded geometry " +
       "or the explicit synthetic opt-in") {
    val bytes = Multimodal.layer3LsfBytes(7L, 2)
    assert(Multimodal.layer3DecodeFull(bytes).isEmpty)
    assert(Multimodal.layer3DecodeFull(bytes,
      allowSyntheticGeometry = true).isDefined)
    val geom = L3IsoSynth.parseGeometry(
      L3IsoSynth.synthGeometryFileText(Seq(24000)))
    assert(Multimodal.layer3DecodeFull(bytes,
      extraGeometry = geom).isDefined)
    // MPEG-1 rates are unaffected by the guard (real shipped geometry)
    assert(Multimodal.layer3DecodeFull(
      Multimodal.layer3BytesFull(7L, 2)).isDefined)
  }

  test("loaded columns are actually consulted: values differ from the " +
       "synthetic tiling on the same stream") {
    // ids with a second frame: frame 1 carries a class-2
    // scalefac_compress with nonzero slens over the energetic bands, so
    // the band-index-dependent scalefactor exponent MUST move when the
    // tiling moves (id 0/3 decode a single slen-0 frame — geometry
    // cannot change those values, by construction)
    Seq(1L, 2L, 4L, 5L).foreach { id =>
      val nf = (id % 3).toInt + 1
      val bytes = Multimodal.layer3LsfBytes(id, nf)
      val geom = L3IsoSynth.parseGeometry(
        L3IsoSynth.synthGeometryFileText(Seq(24000)))
      val synth = Multimodal.layer3DecodeFull(bytes,
        allowSyntheticGeometry = true).get
      val loaded = Multimodal.layer3DecodeFull(bytes,
        extraGeometry = geom).get
      assert(synth._3.size == loaded._3.size)
      // band boundaries differ at nearly every band, so the requantized
      // energies must separate (the scalefactor exponent is a function
      // of the band index)
      assert(synth._3.map(b => (b.sSum, b.sMsq)) !=
             loaded._3.map(b => (b.sSum, b.sMsq)), s"id $id")
    }
  }
}
