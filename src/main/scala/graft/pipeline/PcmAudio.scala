package graft.pipeline

/** REAL AIFF and Sun AU (.snd) audio containers + G.711 companding —
  * the remaining standard PCM-family corpus formats next to WAV.
  *
  * AIFF (EA IFF 85 / Apple AIFF 1.3, public spec): FORM/AIFF chunk
  * walk, COMM (channels, sample frames, bits, and the 80-bit IEEE 754
  * extended-precision sample rate — sign(1)/exp(15)/explicit-integer-
  * bit mantissa(64)), SSND with offset/blockSize, big-endian signed
  * interleaved samples.
  *
  * AU (Sun/NeXT .snd, public spec): big-endian header (magic, data
  * offset, data size, encoding, rate, channels) with encodings 1
  * (G.711 mu-law), 2 (8-bit linear), 3 (16-bit linear BE), 27 (G.711
  * A-law).
  *
  * G.711 expansion is the classic segmented closed form (the Sun
  * reference implementation's arithmetic, not a table): mu-law
  * complements the byte, then mag = ((mant<<3) + 132) << exp, minus
  * the bias, sign bit set = negative; A-law XORs 0x55, seg 0 adds 8,
  * higher segs add 0x108 then shift, sign bit set = POSITIVE (the two
  * laws disagree on sign polarity — preserved exactly). Both are pure
  * integer formulas, replayable in SQL.
  */
object PcmAudio {

  // ------------------------------------------------------------------
  // G.711
  // ------------------------------------------------------------------

  def mulawExpand(b: Int): Int = {
    val u = ~b & 0xff
    val exp = (u >> 4) & 0x7
    val mant = u & 0xf
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  def alawExpand(b: Int): Int = {
    val a = (b ^ 0x55) & 0xff
    val seg = (a >> 4) & 0x7
    val mant = a & 0xf
    val mag =
      if (seg == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  // ------------------------------------------------------------------
  // 80-bit extended-precision sample rate (AIFF COMM)
  // ------------------------------------------------------------------

  /** Encode a positive integer rate: exp = 16383 + floor(log2 r),
    * mantissa left-aligned with the explicit integer bit. */
  def extended80(rate: Long): Array[Byte] = {
    require(rate > 0)
    val top = 63 - java.lang.Long.numberOfLeadingZeros(rate)
    val exp = 16383 + top
    val mant = rate << (63 - top)
    val out = new Array[Byte](10)
    out(0) = ((exp >> 8) & 0x7f).toByte // sign 0
    out(1) = (exp & 0xff).toByte
    (0 until 8).foreach(i => out(2 + i) = ((mant >>> (8 * (7 - i))) & 0xff).toByte)
    out
  }

  /** Decode to the nearest integer rate (negative/zero/NaN forms → -1). */
  def parseExtended80(d: Array[Byte], off: Int): Long = {
    if (off + 10 > d.length) return -1
    val sign = (d(off) & 0x80) != 0
    val exp = ((d(off) & 0x7f) << 8) | (d(off + 1) & 0xff)
    var mant = 0L
    (0 until 8).foreach(i => mant = (mant << 8) | (d(off + 2 + i) & 0xffL))
    if (sign || exp == 0 || exp == 0x7fff || mant == 0) return -1
    val shift = 16383 + 63 - exp
    if (shift < 0 || shift > 63) return -1
    // round to nearest on the dropped bits
    val v = mant >>> shift
    val rnd = if (shift > 0 && ((mant >>> (shift - 1)) & 1L) == 1L) 1L else 0L
    v + rnd
  }

  // ------------------------------------------------------------------
  // AIFF
  // ------------------------------------------------------------------

  final case class AiffInfo(sampleRate: Long, channels: Int, bits: Int,
                            nFrames: Long)

  /** `compression`: "" = classic AIFF; "NONE"/"sowt" = AIFF-C ("sowt"
    * stores the 16-bit samples LITTLE-endian — the classic Mac CD-rip
    * artifact; "NONE" is big-endian like AIFF). AIFF-C adds the FVER
    * chunk and the COMM compression fourCC + pascal-string name. */
  def aiffBytes(rate: Long, channels: Int, bits: Int,
                samples: Array[Array[Int]], ssndOffset: Int = 0,
                compression: String = ""): Array[Byte] = {
    require(bits == 16, "generator emits 16-bit AIFF")
    require(compression.isEmpty || compression == "NONE" ||
            compression == "sowt")
    val nFrames = samples(0).length
    val dataLen = nFrames * channels * 2
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = { out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val aifc = compression.nonEmpty
    // AIFF-C COMM: 18 base + 4 fourCC + pascal name "" (len byte + pad)
    val commLen = if (aifc) 18 + 4 + 2 else 18
    val fverLen = if (aifc) 8 + 4 else 0
    val formLen = 4 + fverLen + (8 + commLen) + (8 + 8 + ssndOffset + dataLen)
    tag("FORM"); be32(formLen); tag(if (aifc) "AIFC" else "AIFF")
    if (aifc) { tag("FVER"); be32(4); be32(0xa2805140) }
    tag("COMM"); be32(commLen)
    be16(channels); be32(nFrames); be16(bits)
    out.write(extended80(rate))
    if (aifc) { tag(compression); out.write(0); out.write(0) }
    tag("SSND"); be32(8 + ssndOffset + dataLen)
    be32(ssndOffset); be32(0)
    (0 until ssndOffset).foreach(_ => out.write(0))
    val le = compression == "sowt"
    (0 until nFrames).foreach { t =>
      (0 until channels).foreach { ch =>
        val v = samples(ch)(t)
        if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
        else be16(v)
      }
    }
    out.toByteArray
  }

  /** Parse + decode 16-bit AIFF. Returns (info, samples[ch][t]); None
    * on wrong magic, missing chunks, truncation, or non-16-bit data. */
  def aiffDecode(bytes: Array[Byte]): Option[(AiffInfo, Array[Array[Int]])] = {
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def be16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def tag(o: Int, s: String): Boolean =
      o + s.length <= bytes.length &&
        new String(bytes.slice(o, o + s.length), "US-ASCII") == s
    if (bytes.length < 12 || !tag(0, "FORM") ||
        !(tag(8, "AIFF") || tag(8, "AIFC"))) return None
    val aifc = tag(8, "AIFC")
    var littleEndian = false
    var p = 12
    var info: Option[AiffInfo] = None
    var data: Option[Array[Array[Int]]] = None
    var pendingSsnd: Option[(Int, Int)] = None // (dataStart, dataLen)
    while (p + 8 <= bytes.length) {
      val ck = new String(bytes.slice(p, p + 4), "US-ASCII")
      val len = be32(p + 4).toInt
      if (p + 8 + len > bytes.length) return None
      ck match {
        case "COMM" if len >= 18 =>
          val ch = be16(p + 8)
          val nf = be32(p + 10)
          val bits = be16(p + 14)
          val rate = parseExtended80(bytes, p + 16)
          if (ch <= 0 || bits != 16 || rate <= 0) return None
          if (aifc) { // compression fourCC follows the rate
            if (len < 22) return None
            val comp = new String(bytes.slice(p + 26, p + 30), "US-ASCII")
            comp match {
              case "NONE" => ()
              case "sowt" => littleEndian = true
              case _      => return None // compressed AIFF-C: out of scope
            }
          }
          info = Some(AiffInfo(rate, ch, bits, nf))
        case "SSND" if len >= 8 =>
          val off = be32(p + 8).toInt
          pendingSsnd = Some((p + 16 + off, len - 8 - off))
        case _ => ()
      }
      p += 8 + len + (len & 1) // IFF chunks pad to even length
    }
    for {
      i <- info
      (start, dlen) <- pendingSsnd
    } yield {
      val nf = math.min(i.nFrames, dlen / (2L * i.channels)).toInt
      val s = Array.ofDim[Int](i.channels, nf)
      var t = 0
      while (t < nf) {
        var ch = 0
        while (ch < i.channels) {
          val o = start + 2 * (t * i.channels + ch)
          val v =
            if (littleEndian) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
            else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
          s(ch)(t) = if (v >= 0x8000) v - 0x10000 else v
          ch += 1
        }
        t += 1
      }
      (i.copy(nFrames = nf), s)
    }
  }

  // ------------------------------------------------------------------
  // Extended WAV (the non-canonical real world): proper RIFF chunk
  // walk (LIST/fact chunks skipped, odd-length padding), format codes
  // 1 (PCM incl. 24-bit), 3 (IEEE float32), 6 (A-law), 7 (mu-law),
  // and 0xFFFE WAVE_FORMAT_EXTENSIBLE whose SubFormat GUID carries the
  // actual code in its first two bytes.
  // ------------------------------------------------------------------

  /** The fixed tail of the Microsoft SubFormat GUID (bytes 2..15). */
  private val ksDataFormatGuidTail = Array[Int](
    0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xaa,
    0x00, 0x38, 0x9b, 0x71).map(_.toByte)

  final case class WavExtInfo(fmtCode: Int, sampleRate: Int, channels: Int,
                              bits: Int, extensible: Boolean)

  /** Build a WAV with the given format code; `extensible` wraps it in
    * WAVE_FORMAT_EXTENSIBLE. `extraChunk` inserts a LIST chunk between
    * fmt and data to exercise the walk (odd lengths pad per RIFF). */
  def wavBytesExt(fmtCode: Int, rate: Int, channels: Int, bits: Int,
                  payload: Array[Byte], extensible: Boolean = false,
                  extraChunk: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v); le16(v >> 16) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val fmtLen = if (extensible) 40 else if (fmtCode == 1) 16 else 18
    val extraLen = if (extraChunk > 0) 8 + extraChunk + (extraChunk & 1) else 0
    tag("RIFF")
    le32(4 + 8 + fmtLen + extraLen + 8 + payload.length + (payload.length & 1))
    tag("WAVE")
    tag("fmt "); le32(fmtLen)
    le16(if (extensible) 0xfffe else fmtCode)
    le16(channels); le32(rate)
    le32(rate * channels * bits / 8)
    le16(channels * bits / 8); le16(bits)
    if (extensible) {
      le16(22)        // cbSize
      le16(bits)      // valid bits
      le32(0x3)       // channel mask (FL|FR)
      le16(fmtCode); le16(0) // SubFormat GUID data1 (LE32) = the code
      out.write(ksDataFormatGuidTail)
    } else if (fmtCode != 1) le16(0) // cbSize 0
    if (extraChunk > 0) {
      tag("LIST"); le32(extraChunk)
      (0 until extraChunk).foreach(i => out.write(i & 0xff))
      if ((extraChunk & 1) == 1) out.write(0)
    }
    tag("data"); le32(payload.length)
    out.write(payload)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Build a RIFF LIST/INFO chunk from (fourCC, value) tags: each value
    * NUL-terminated and padded to even length per RIFF. */
  def wavInfoChunk(tags: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    val body = new java.io.ByteArrayOutputStream()
    body.write("INFO".getBytes("US-ASCII"))
    tags.foreach { case (cc, v) =>
      require(cc.length == 4)
      val vb = v.getBytes("UTF-8") :+ 0.toByte
      body.write(cc.getBytes("US-ASCII"))
      val b = new Array[Byte](4)
      b(0) = vb.length.toByte; b(1) = (vb.length >> 8).toByte
      b(2) = (vb.length >> 16).toByte; b(3) = (vb.length >> 24).toByte
      body.write(b)
      body.write(vb)
      if ((vb.length & 1) == 1) body.write(0)
    }
    out.write("LIST".getBytes("US-ASCII"))
    le32(body.size())
    body.writeTo(out)
    out.toByteArray
  }

  /** Parse LIST/INFO tags out of a WAV: chunk walk to LIST chunks of
    * type INFO, sub-chunk walk with NUL-trim and even padding. Returns
    * the (fourCC, value) pairs in stream order (empty when absent). */
  def wavInfoTags(bytes: Array[Byte]): Option[Seq[(String, String)]] = {
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tagAt(o: Int, s: String): Boolean =
      o + s.length <= bytes.length &&
        new String(bytes.slice(o, o + s.length), "US-ASCII") == s
    if (bytes.length < 12 || !tagAt(0, "RIFF") || !tagAt(8, "WAVE"))
      return None
    val out = Seq.newBuilder[(String, String)]
    var p = 12
    while (p + 8 <= bytes.length) {
      val ck = new String(bytes.slice(p, p + 4), "US-ASCII")
      val len = u32(p + 4).toInt
      if (p + 8 + len > bytes.length) return None
      if (ck == "LIST" && len >= 4 && tagAt(p + 8, "INFO")) {
        var q = p + 12
        val end = p + 8 + len
        while (q + 8 <= end) {
          val cc = new String(bytes.slice(q, q + 4), "US-ASCII")
          val vLen = u32(q + 4).toInt
          if (q + 8 + vLen > end) return None
          var realLen = vLen
          while (realLen > 0 && bytes(q + 8 + realLen - 1) == 0) realLen -= 1
          out += ((cc, new String(bytes, q + 8, realLen, "UTF-8")))
          q += 8 + vLen + (vLen & 1)
        }
      }
      p += 8 + len + (len & 1)
    }
    Some(out.result())
  }

  /** Chunk-walking decode of the extended formats to per-sample DOUBLE
    * values (PCM 24-bit exact integers; float32 bit-exact; G.711
    * expanded integers; 8-bit unsigned centered, 16-bit signed).
    * None on unknown codes, missing chunks, or a malformed GUID. */
  def wavDecodeExt(bytes: Array[Byte])
      : Option[(WavExtInfo, Array[Double])] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (u16(o) & 0xffffL) | ((u16(o + 2) & 0xffffL) << 16)
    def tagAt(o: Int, s: String): Boolean =
      o + s.length <= bytes.length &&
        new String(bytes.slice(o, o + s.length), "US-ASCII") == s
    if (bytes.length < 12 || !tagAt(0, "RIFF") || !tagAt(8, "WAVE"))
      return None
    var p = 12
    var info: Option[WavExtInfo] = None
    var data: Option[(Int, Int)] = None
    while (p + 8 <= bytes.length && (info.isEmpty || data.isEmpty)) {
      val ck = new String(bytes.slice(p, p + 4), "US-ASCII")
      val len = u32(p + 4).toInt
      if (p + 8 + len > bytes.length) return None
      ck match {
        case "fmt " if len >= 16 =>
          var code = u16(p + 8)
          val ch = u16(p + 10)
          val rate = u32(p + 12).toInt
          val bits = u16(p + 22)
          val extensible = code == 0xfffe
          if (extensible) {
            if (len < 40) return None
            code = u16(p + 32) // SubFormat GUID data1 (LE32) low half
            if (u16(p + 34) != 0 ||
                !bytes.slice(p + 36, p + 48)
                  .sameElements(ksDataFormatGuidTail))
              return None
          }
          if (ch <= 0 || rate <= 0) return None
          info = Some(WavExtInfo(code, rate, ch, bits, extensible))
        case "data" => data = Some((p + 8, len))
        case _      => ()
      }
      p += 8 + len + (len & 1) // RIFF pads odd chunks
    }
    for {
      i <- info
      (off, dlen) <- data
      out <- decodeSamples(bytes, off, dlen, i)
    } yield (i, out)
  }

  private def decodeSamples(bytes: Array[Byte], off: Int, dlen: Int,
                            i: WavExtInfo): Option[Array[Double]] =
    (i.fmtCode, i.bits) match {
      case (1, 8) =>
        Some(Array.tabulate(dlen)(k => ((bytes(off + k) & 0xff) - 128).toDouble))
      case (1, 16) =>
        Some(Array.tabulate(dlen / 2) { k =>
          val v = (bytes(off + 2 * k) & 0xff) |
            ((bytes(off + 2 * k + 1) & 0xff) << 8)
          (if (v >= 0x8000) v - 0x10000 else v).toDouble
        })
      case (1, 24) =>
        Some(Array.tabulate(dlen / 3) { k =>
          val v = (bytes(off + 3 * k) & 0xff) |
            ((bytes(off + 3 * k + 1) & 0xff) << 8) |
            ((bytes(off + 3 * k + 2) & 0xff) << 16)
          (if (v >= 0x800000) v - 0x1000000 else v).toDouble
        })
      case (3, 32) =>
        Some(Array.tabulate(dlen / 4) { k =>
          val b = (bytes(off + 4 * k) & 0xff) |
            ((bytes(off + 4 * k + 1) & 0xff) << 8) |
            ((bytes(off + 4 * k + 2) & 0xff) << 16) |
            ((bytes(off + 4 * k + 3) & 0xff) << 24)
          java.lang.Float.intBitsToFloat(b).toDouble
        })
      case (6, 8) =>
        Some(Array.tabulate(dlen)(k => alawExpand(bytes(off + k) & 0xff).toDouble))
      case (7, 8) =>
        Some(Array.tabulate(dlen)(k => mulawExpand(bytes(off + k) & 0xff).toDouble))
      case _ => None
    }

  // ------------------------------------------------------------------
  // ID3v1 / ID3v1.1 trailer (the fixed 128-byte tag at stream end —
  // the other ID3 form next to the v2 header Multimodal already walks)
  // ------------------------------------------------------------------

  final case class Id3v1(title: String, artist: String, album: String,
                         year: String, comment: String, track: Int,
                         genre: Int)

  def id3v1Bytes(t: Id3v1): Array[Byte] = {
    val out = new Array[Byte](128)
    def put(off: Int, s: String, len: Int): Unit = {
      val b = s.getBytes("ISO-8859-1")
      System.arraycopy(b, 0, out, off, math.min(b.length, len))
    }
    put(0, "TAG", 3)
    put(3, t.title, 30); put(33, t.artist, 30); put(63, t.album, 30)
    put(93, t.year, 4)
    if (t.track > 0) { // v1.1: 28-byte comment + zero + track
      put(97, t.comment, 28)
      out(126) = t.track.toByte
    } else put(97, t.comment, 30)
    out(127) = t.genre.toByte
    out
  }

  /** Parse the trailing 128 bytes; v1.1 track detected by the zero byte
    * at offset 125 with a nonzero track at 126. Fields trimmed of the
    * NUL/space padding. None without the TAG magic. */
  def id3v1Parse(bytes: Array[Byte]): Option[Id3v1] = {
    if (bytes.length < 128) return None
    val o = bytes.length - 128
    if (bytes(o) != 'T' || bytes(o + 1) != 'A' || bytes(o + 2) != 'G')
      return None
    def str(off: Int, len: Int): String =
      new String(bytes, o + off, len, "ISO-8859-1")
        .takeWhile(_ != '\u0000').reverse.dropWhile(_ == ' ').reverse
    val v11 = bytes(o + 125) == 0 && bytes(o + 126) != 0
    Some(Id3v1(str(3, 30), str(33, 30), str(63, 30), str(93, 4),
      if (v11) str(97, 28) else str(97, 30),
      if (v11) bytes(o + 126) & 0xff else 0,
      bytes(o + 127) & 0xff))
  }

  // ------------------------------------------------------------------
  // Sun AU
  // ------------------------------------------------------------------

  final case class AuInfo(encoding: Int, sampleRate: Int, channels: Int)

  def auBytes(encoding: Int, rate: Int, channels: Int,
              payload: Array[Byte], dataOffset: Int = 24): Array[Byte] = {
    require(dataOffset >= 24)
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = { out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    out.write(".snd".getBytes("US-ASCII"))
    be32(dataOffset); be32(payload.length); be32(encoding)
    be32(rate); be32(channels)
    (24 until dataOffset).foreach(_ => out.write(0))
    out.write(payload)
    out.toByteArray
  }

  /** Parse + decode AU to linear 16-bit samples (flat, interleaved).
    * Encodings: 1 mu-law, 2 linear-8 (signed), 3 linear-16 BE,
    * 27 A-law. None otherwise. */
  def auDecode(bytes: Array[Byte]): Option[(AuInfo, Array[Int])] = {
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    if (bytes.length < 24 ||
        new String(bytes.slice(0, 4), "US-ASCII") != ".snd") return None
    val off = be32(4).toInt
    val dataSize = be32(8)
    val enc = be32(12).toInt
    val rate = be32(16).toInt
    val ch = be32(20).toInt
    if (off < 24 || off > bytes.length || rate <= 0 || ch <= 0) return None
    val end =
      if (dataSize == 0xffffffffL) bytes.length
      else math.min(bytes.length.toLong, off + dataSize).toInt
    val n = end - off
    val samples: Array[Int] = enc match {
      case 1 => Array.tabulate(n)(i => mulawExpand(bytes(off + i) & 0xff))
      case 27 => Array.tabulate(n)(i => alawExpand(bytes(off + i) & 0xff))
      case 2 => Array.tabulate(n)(i => bytes(off + i).toInt) // signed 8-bit
      case 3 =>
        Array.tabulate(n / 2) { i =>
          val v = ((bytes(off + 2 * i) & 0xff) << 8) | (bytes(off + 2 * i + 1) & 0xff)
          if (v >= 0x8000) v - 0x10000 else v
        }
      case _ => return None
    }
    Some((AuInfo(enc, rate, ch), samples))
  }
}
