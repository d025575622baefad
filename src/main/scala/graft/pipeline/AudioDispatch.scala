package graft.pipeline

/** Unified audio ingest: sniff the container from its magic bytes and
  * route to the matching REAL decoder — the composition surface a
  * mixed-format corpus needs (a crawl's audio column is never one
  * format). Returns (format, sample_rate, channels, frames) where
  * `frames` is the container's natural unit count (WAV: complete
  * interleaved samples; FLAC/MPEG/AAC: frames), or a refusal class.
  *
  * Sniff rules (all from the public specs):
  *  - `RIFF....WAVE`            → WAV PCM ([[Multimodal.wavSampleStats]])
  *  - `fLaC`                    → FLAC ([[Flac.decode]])
  *  - 0xFFF sync, 2-bit layer   → 00 ADTS AAC ([[Aac.aacLcDecode]]),
  *    01 Layer III, 10 Layer II, 11 Layer I ([[Multimodal]] decoders)
  *  - `FORM....AIFF`            → AIFF ([[PcmAudio.aiffDecode]])
  *  - `.snd`                    → Sun AU ([[PcmAudio.auDecode]])
  *  - `ID3`                     → skip the ID3v2 tag (syncsafe 28-bit
  *    size) and re-sniff the remainder
  */
object AudioDispatch {

  def dispatch(bytes: Array[Byte], allowSyntheticAac: Boolean = false)
      : Either[String, (String, Int, Int, Long)] = {
    def tag(o: Int, s: String): Boolean =
      bytes.length >= o + s.length &&
        new String(bytes.slice(o, o + s.length), "US-ASCII") == s
    if (tag(0, "RIFF") && tag(8, "WAVE"))
      Multimodal.wavSampleStats(bytes)
        .map { case (m, n, _, _, _, _) =>
          ("wav", m.sampleRate, m.channels, n)
        }.toRight("wav-parse")
    else if (tag(0, "fLaC"))
      for {
        meta <- Multimodal.flacMeta(bytes).toRight("flac-meta")
        frames <- Flac.decode(bytes)
      } yield ("flac", meta._1.sampleRate, meta._1.channels,
        frames.length.toLong)
    else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
             (bytes(1) & 0xe0) == 0xe0)
      ((bytes(1) >> 1) & 0x3) match {
        case 0 =>
          Aac.aacLcDecode(bytes, allowSyntheticBooks = allowSyntheticAac,
              allowSyntheticGeometry = allowSyntheticAac)
            .map { case (m, frames, _) =>
              ("aac", m.sampleRate, frames.map(_.channels).max,
               frames.length.toLong)
            }.toRight("aac-parse")
        case 1 =>
          Multimodal.layer3Decode(bytes)
            .map { case (m, gr) =>
              ("mp3", m.sampleRate, m.channels,
               gr.map(_.frame).distinct.length.toLong)
            }.toRight("mp3-parse")
        case 2 =>
          Multimodal.layer2Decode(bytes)
            .map { case (m, blocks) =>
              ("mp2", m.sampleRate, m.channels,
               blocks.map(_.frame).distinct.length.toLong)
            }.toRight("mp2-parse")
        case _ =>
          Multimodal.layer1Decode(bytes)
            .map { case (m, blocks) =>
              ("mp1", m.sampleRate, m.channels,
               blocks.map(_.frame).distinct.length.toLong)
            }.toRight("mp1-parse")
      }
    else if (tag(0, "FORM") && (tag(8, "AIFF") || tag(8, "AIFC")))
      PcmAudio.aiffDecode(bytes)
        .map { case (i, _) =>
          ("aiff", i.sampleRate.toInt, i.channels, i.nFrames)
        }.toRight("aiff-parse")
    else if (tag(0, ".snd"))
      PcmAudio.auDecode(bytes)
        .map { case (i, s) =>
          ("au", i.sampleRate, i.channels, s.length.toLong)
        }.toRight("au-parse")
    else if (tag(0, "ID3")) {
      if (bytes.length < 10) Left("id3-truncated")
      else {
        val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
          ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
        if (10 + sz >= bytes.length) Left("id3-truncated")
        else dispatch(bytes.drop(10 + sz), allowSyntheticAac)
      }
    } else Left("unknown-format")
  }
}
