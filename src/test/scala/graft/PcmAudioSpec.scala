package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PcmAudio

/** AIFF + AU containers and G.711 expansion: pinned against published
  * reference values (the G.711 table endpoints; the canonical 80-bit
  * encoding of 44100 Hz found in real AIFF files), plus round trips and
  * refusal behavior. */
class PcmAudioSpec extends AnyFunSuite {

  test("G.711 expansion hits the published table endpoints") {
    // mu-law: 0xFF is digital zero, 0x00 is the negative extreme -32124,
    // 0x80 the positive extreme +32124 (sign bit clear after complement).
    assert(PcmAudio.mulawExpand(0xff) == 0)
    assert(PcmAudio.mulawExpand(0x00) == -32124)
    assert(PcmAudio.mulawExpand(0x80) == 32124)
    // A-law: 0x55 -> -8, 0xD5 -> +8 (the smallest magnitudes), 0x2A the
    // negative extreme -32256, 0xAA the positive extreme +32256.
    assert(PcmAudio.alawExpand(0x55) == -8)
    assert(PcmAudio.alawExpand(0xd5) == 8)
    assert(PcmAudio.alawExpand(0x2a) == -32256)
    assert(PcmAudio.alawExpand(0xaa) == 32256)
  }

  test("G.711 expansion is monotone within each sign") {
    // within the negative mu-law codes 0x00..0x7F magnitude decreases
    val mu = (0 to 0x7f).map(PcmAudio.mulawExpand)
    assert(mu == mu.sorted)
    val muPos = (0x80 to 0xff).map(PcmAudio.mulawExpand)
    assert(muPos == muPos.sorted.reverse)
  }

  test("80-bit extended rate: canonical 44100 encoding and round trips") {
    // the bytes every 44.1 kHz AIFF carries: 40 0E AC 44 00..
    assert(PcmAudio.extended80(44100).toSeq ==
      Seq(0x40, 0x0e, 0xac, 0x44, 0, 0, 0, 0, 0, 0).map(_.toByte))
    Seq(1L, 8000L, 11025L, 22050L, 44100L, 48000L, 96000L, 192000L)
      .foreach { r =>
        assert(PcmAudio.parseExtended80(PcmAudio.extended80(r), 0) == r,
          s"rate $r")
      }
    // negative sign / zero mantissa refuse
    val neg = PcmAudio.extended80(44100)
    neg(0) = (neg(0) | 0x80).toByte
    assert(PcmAudio.parseExtended80(neg, 0) == -1)
    assert(PcmAudio.parseExtended80(new Array[Byte](10), 0) == -1)
  }

  test("AIFF round-trips with SSND offsets and chunk padding") {
    val pcm = Array.tabulate(2)(c => Array.tabulate(25)(t => c * 1000 + t * 3 - 40))
    for (off <- Seq(0, 4)) {
      val bytes = PcmAudio.aiffBytes(11025, 2, 16, pcm, ssndOffset = off)
      val Some((info, s)) = PcmAudio.aiffDecode(bytes)
      assert(info.sampleRate == 11025 && info.channels == 2 &&
        info.nFrames == 25)
      assert(s(0).toSeq == pcm(0).toSeq && s(1).toSeq == pcm(1).toSeq)
    }
    // truncated SSND decodes nothing rather than misaligned samples
    val bytes = PcmAudio.aiffBytes(8000, 1, 16, Array(Array.tabulate(10)(identity)))
    assert(PcmAudio.aiffDecode(bytes.take(bytes.length - 1)).isEmpty)
    assert(PcmAudio.aiffDecode("FORMxxxxAIFC".getBytes("US-ASCII")).isEmpty)
  }

  test("extended WAV: 24-bit, float32, G.711 codes, extensible GUID, chunk walk") {
    // 24-bit PCM round trip incl. negative values
    val v24 = Array(-8388608, -1, 0, 1, 8388607, 123456, -654321)
    val p24 = new Array[Byte](v24.length * 3)
    v24.indices.foreach { i =>
      p24(3 * i) = (v24(i) & 0xff).toByte
      p24(3 * i + 1) = ((v24(i) >> 8) & 0xff).toByte
      p24(3 * i + 2) = ((v24(i) >> 16) & 0xff).toByte
    }
    val Some((i24, s24)) = PcmAudio.wavDecodeExt(
      PcmAudio.wavBytesExt(1, 48000, 1, 24, p24, extraChunk = 5))
    assert(i24.fmtCode == 1 && i24.bits == 24 && !i24.extensible)
    assert(s24.toSeq == v24.map(_.toDouble).toSeq)
    // float32 bit-exact incl. negatives and denormal-free dyadics
    val f32 = Array(0.0f, -1.5f, 0.25f, 1e10f, -3.375f)
    val pf = new Array[Byte](f32.length * 4)
    f32.indices.foreach { i =>
      val b = java.lang.Float.floatToIntBits(f32(i))
      (0 until 4).foreach(k => pf(4 * i + k) = ((b >> (8 * k)) & 0xff).toByte)
    }
    val Some((i3, s3)) = PcmAudio.wavDecodeExt(
      PcmAudio.wavBytesExt(3, 44100, 1, 32, pf))
    assert(i3.fmtCode == 3 && s3.toSeq == f32.map(_.toDouble).toSeq)
    // G.711 WAV codes route through the expanders
    val raw = Array.tabulate(8)(i => (i * 31).toByte)
    val Some((_, sa)) = PcmAudio.wavDecodeExt(
      PcmAudio.wavBytesExt(6, 8000, 1, 8, raw))
    assert(sa.toSeq == raw.map(b => PcmAudio.alawExpand(b & 0xff).toDouble).toSeq)
    // extensible wrapper resolves the inner code; corrupt GUID refuses
    val bytes = PcmAudio.wavBytesExt(7, 8000, 1, 8, raw, extensible = true)
    val Some((ie, se)) = PcmAudio.wavDecodeExt(bytes)
    assert(ie.fmtCode == 7 && ie.extensible &&
      se.toSeq == raw.map(b => PcmAudio.mulawExpand(b & 0xff).toDouble).toSeq)
    val badGuid = bytes.clone
    // GUID tail lives at absolute 48..59 (12 + 8 fmt hdr + 28 into fmt)
    badGuid(52) = (badGuid(52) ^ 1).toByte
    assert(PcmAudio.wavDecodeExt(badGuid).isEmpty)
    // unknown format code refuses
    assert(PcmAudio.wavDecodeExt(
      PcmAudio.wavBytesExt(99, 8000, 1, 8, raw)).isEmpty)
  }

  test("WAV LIST/INFO tags round-trip with padding; truncation refuses") {
    val tags = Seq("INAM" -> "odd", "IART" -> "ab", "ICMT" -> "")
    // splice into a minimal PCM16 WAV between fmt and data
    val base = PcmAudio.wavBytesExt(1, 8000, 1, 16, new Array[Byte](8))
    val info = PcmAudio.wavInfoChunk(tags)
    val out = base.take(36) ++ info ++ base.drop(36)
    val sz = out.length - 8
    out(4) = (sz & 0xff).toByte; out(5) = ((sz >> 8) & 0xff).toByte
    out(6) = ((sz >> 16) & 0xff).toByte; out(7) = ((sz >> 24) & 0xff).toByte
    assert(PcmAudio.wavInfoTags(out).contains(tags))
    assert(PcmAudio.wavDecodeExt(out).exists(_._2.length == 4))
    // no INFO chunk -> empty tag list, not a refusal
    assert(PcmAudio.wavInfoTags(base).contains(Seq()))
    // truncated tag value refuses
    assert(PcmAudio.wavInfoTags(out.take(out.length - 6)).isEmpty)
  }

  test("ID3v1 and v1.1 trailers round-trip; non-tags refuse") {
    val v11 = PcmAudio.Id3v1("A Title With Spaces", "Artist", "Album",
      "1999", "comment", 7, 42)
    val p11 = PcmAudio.id3v1Parse(Array.fill(64)(0xff.toByte) ++
      PcmAudio.id3v1Bytes(v11)).get
    assert(p11 == v11)
    val v10 = v11.copy(track = 0, comment = "a 30-byte-capable comment xx")
    val p10 = PcmAudio.id3v1Parse(PcmAudio.id3v1Bytes(v10)).get
    assert(p10 == v10)
    assert(PcmAudio.id3v1Parse(new Array[Byte](128)).isEmpty)
    assert(PcmAudio.id3v1Parse(new Array[Byte](100)).isEmpty)
  }

  test("AIFF-C: NONE is big-endian, sowt is little-endian, others refuse") {
    val pcm = Array(Array(0x0102, -0x0102, 300, -300, 0, 32767, -32768))
    for (comp <- Seq("NONE", "sowt")) {
      val bytes = PcmAudio.aiffBytes(44100, 1, 16, pcm, compression = comp)
      val Some((info, out)) = PcmAudio.aiffDecode(bytes)
      assert(out(0).toSeq == pcm(0).toSeq, comp)
      // the two encodings must differ on the wire (0x0102 byte-swaps)
      if (comp == "sowt") {
        val none = PcmAudio.aiffBytes(44100, 1, 16, pcm, compression = "NONE")
        assert(!bytes.sameElements(none.patch(8, "AIFC".getBytes, 4)))
      }
    }
    // a compressed type refuses rather than misdecoding
    val ima = PcmAudio.aiffBytes(44100, 1, 16, pcm, compression = "NONE")
    val patched = ima.clone
    "ima4".getBytes("US-ASCII").copyToArray(patched,
      ima.indexOfSlice("NONE".getBytes("US-ASCII")))
    assert(PcmAudio.aiffDecode(patched).isEmpty)
  }

  test("N-Triples: escapes, langtags, datatypes, refusal classes") {
    import graft.pipeline.NTriples
    val Right(Some(t)) = NTriples.parseLine(
      """<http://a> <http://p> "x\ty \"z\" é \U0001F600"@en-US .""")
    assert(t.obj.value == "x\ty \"z\" é 😀")
    assert(t.obj.lang == "@en-US")
    val Right(Some(t2)) = NTriples.parseLine(
      """_:n1 <http://p> "5"^^<http://www.w3.org/2001/XMLSchema#int> .""")
    assert(t2.subject == NTriples.Term("blank", "n1", "") &&
      t2.obj.lang == "^^http://www.w3.org/2001/XMLSchema#int")
    assert(NTriples.parseLine("  # just a comment") == Right(None))
    assert(NTriples.parseLine("") == Right(None))
    assert(NTriples.parseLine("""<http://a> <http://p> "x" """).isLeft)
    assert(NTriples.parseLine("""<http://a> "lit" <http://o> .""").isLeft)
    assert(NTriples.parseLine("""<http://a> <http://p> "x\q" .""")
      == Left("bad-escape"))
    assert(NTriples.parseLine("""<http://a> <http://p> <http://o> . x""")
      == Left("trailing-garbage"))
  }

  test("AU round-trips all four encodings and refuses unknown ones") {
    val lin = Array.tabulate(20)(t => t * 37 - 300)
    val be = new Array[Byte](40)
    lin.indices.foreach { i =>
      be(2 * i) = ((lin(i) >> 8) & 0xff).toByte
      be(2 * i + 1) = (lin(i) & 0xff).toByte
    }
    val Some((i3, s3)) = PcmAudio.auDecode(PcmAudio.auBytes(3, 16000, 1, be))
    assert(i3 == PcmAudio.AuInfo(3, 16000, 1) && s3.toSeq == lin.toSeq)
    val raw = Array.tabulate(16)(i => (i * 17).toByte)
    val Some((_, s1)) = PcmAudio.auDecode(PcmAudio.auBytes(1, 8000, 1, raw))
    assert(s1.toSeq == raw.map(b => PcmAudio.mulawExpand(b & 0xff)).toSeq)
    val Some((_, s27)) = PcmAudio.auDecode(PcmAudio.auBytes(27, 8000, 1, raw))
    assert(s27.toSeq == raw.map(b => PcmAudio.alawExpand(b & 0xff)).toSeq)
    val Some((_, s2)) = PcmAudio.auDecode(PcmAudio.auBytes(2, 8000, 1, raw))
    assert(s2.toSeq == raw.map(_.toInt).toSeq)
    assert(PcmAudio.auDecode(PcmAudio.auBytes(99, 8000, 1, raw)).isEmpty)
    // annotation padding before the data offset is skipped
    val Some((_, sOff)) =
      PcmAudio.auDecode(PcmAudio.auBytes(1, 8000, 1, raw, dataOffset = 32))
    assert(sOff.toSeq == s1.toSeq)
  }
}
