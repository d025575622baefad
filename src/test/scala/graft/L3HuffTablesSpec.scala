package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{L3IsoHuff, Multimodal}

/** Structural closure proofs for the shipped ISO 11172-3 Table B.7
  * Huffman data (the round-14 spec-table-policy gate): every registered
  * real table must be a COMPLETE prefix code — prefix-freeness plus
  * Kraft Σ 2^(−hlen) == 1 in exact integer arithmetic — and every
  * codeword must round-trip through the decoder's walk. A wrong length
  * anywhere breaks completeness; a wrong code value breaks
  * prefix-freeness or uniqueness. */
class L3HuffTablesSpec extends AnyFunSuite {

  private def kraftExact(lens: Seq[Int]): Boolean = {
    val unit = 1L << 32
    lens.map(l => unit >> l).sum == unit
  }

  private def prefixFree(words: Seq[String]): Boolean = {
    val s = words.sorted
    s.zip(s.drop(1)).forall { case (a, b) => !b.startsWith(a) }
  }

  test("every shipped ISO big-values table is a complete prefix code") {
    assert(L3IsoHuff.tableIds == Seq(1, 2, 3, 5, 6, 7, 8, 9, 10, 12))
    L3IsoHuff.tableIds.foreach { tid =>
      val es = L3IsoHuff.entries(tid)
      es.foreach { case (len, v) =>
        assert(len >= 1 && len <= 13, s"table $tid hlen $len")
        assert(v >= 0 && v < (1 << len), s"table $tid code $v !< 2^$len")
      }
      assert(kraftExact(es.map(_._1)), s"table $tid is not Kraft-complete")
      val words = es.map { case (len, v) =>
        val s = v.toBinaryString; "0" * (len - s.length) + s
      }
      assert(words.distinct.size == words.size, s"table $tid dup codeword")
      assert(prefixFree(words), s"table $tid is not prefix-free")
    }
  }

  test("table 1 data equals the long-standing literal map") {
    assert(L3IsoHuff.tables(1).codes == Map(
      "1" -> ((0, 0)), "001" -> ((0, 1)), "01" -> ((1, 0)),
      "000" -> ((1, 1))))
  }

  test("count1 table A is a complete prefix code inverse to its encoder") {
    assert(kraftExact(L3IsoHuff.quadABits.toSeq))
    assert(prefixFree(L3IsoHuff.quadAEncode.toSeq))
    assert(L3IsoHuff.quadAEncode.toSeq.distinct.size == 16)
    (0 until 16).foreach { i =>
      assert(L3IsoHuff.quadA(L3IsoHuff.quadAEncode(i)) == i)
    }
  }

  test("every (x, y) entry round-trips through the registered walk") {
    L3IsoHuff.tableIds.foreach { tid =>
      val enc = L3IsoHuff.encode(tid)
      val dec = L3IsoHuff.tables(tid).codes
      enc.foreach { case (xy, w) => assert(dec(w) == xy, s"table $tid $xy") }
      assert(enc.size == dec.size)
    }
  }

  test("huffreal stream decodes with the exact formula counts") {
    (0L until 6L).foreach { id =>
      val nf = (id % 3).toInt + 1
      val out = Multimodal.layer3DecodeFull(
        Multimodal.layer3HuffRealBytes(id, nf))
      assert(out.isDefined, s"id $id refused")
      val (_, grans, _, _) = out.get
      assert(grans.size == nf * 2)
      grans.foreach { g =>
        assert(g.nCount1 == 4 + (id + g.frame * 2 + g.granule) % 5,
               s"id $id f ${g.frame} g ${g.granule}")
      }
    }
  }

  test("rate-general decode: 44.1 kHz with padding, 32 kHz, and a " +
       "mid-stream rate change refuses") {
    (0L until 6L).foreach { id =>
      val nf = (id % 3).toInt + 2
      val d44 = Multimodal.layer3DecodeFull(
        Multimodal.layer3Bytes44k(id, nf))
      assert(d44.isDefined, s"id $id 44.1 refused")
      assert(d44.get._1.sampleRate == 44100 && d44.get._1.nFrames == nf)
      val d32 = Multimodal.layer3DecodeFull(
        Multimodal.layer3Bytes44k(id, nf, sr32 = true))
      assert(d32.isDefined, s"id $id 32k refused")
      assert(d32.get._1.sampleRate == 32000 && d32.get._1.nFrames == nf)
      // the two Table B.8 columns separate in the VALUES: lines 52-53
      // sit in band 10 (44.1) vs band 9 (32k) under nonzero
      // scalefactors, so the granule energies differ
      assert(d44.get._2.map(g => (g.xrSum, g.xrMsq)) !=
             d32.get._2.map(g => (g.xrSum, g.xrMsq)), s"id $id")
    }
    // frame lengths: 626/627 alternating (44.1, padding) vs 864 (32k)
    assert(Multimodal.layer3Bytes44k(1, 2).length == 626 + 627)
    assert(Multimodal.layer3Bytes44k(1, 2, sr32 = true).length == 1728)
    // a stream whose second frame switches sample rate refuses: the
    // scalefactor-band geometry is rate-wide state
    val a = Multimodal.layer3Bytes44k(3, 1)
    val b = Multimodal.layer3Bytes44k(3, 1, sr32 = true)
    assert(Multimodal.layer3DecodeFull(a ++ b).isEmpty)
  }

  test("an unregistered table_select still refuses") {
    val bytes = Multimodal.layer3HuffRealBytes(1, 1)
    // granule 0 table_select region0 sits right after
    // 4(hdr)+9+5+4+12+9+8+4+1 bits = 32+52 bits into the frame: flip the
    // 5-bit field from 7 (00111) to 11 (01011) — an undefined slot.
    val bitOff = 32 + 52
    def setBits(v: Int): Unit = {
      var i = 0
      while (i < 5) {
        val p = bitOff + i
        val bit = (v >> (4 - i)) & 1
        val mask = 1 << (7 - (p & 7))
        bytes(p >> 3) =
          (if (bit == 1) bytes(p >> 3) | mask
           else bytes(p >> 3) & ~mask).toByte
        i += 1
      }
    }
    setBits(11)
    assert(Multimodal.layer3DecodeFull(bytes).isEmpty)
  }
}
