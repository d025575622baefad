package graft.pipeline

/** REAL TIFF raster decode (TIFF 6.0, public spec) — the pixel layer
  * under the container walk [[Multimodal.tiffMeta]] already provides.
  *
  * Scope: baseline grayscale (Photometric 1) and RGB (Photometric 2)
  * at 8 bits per sample, BOTH byte orders, strip organization
  * (RowsPerStrip < height, short final strip, StripOffsets /
  * StripByteCounts arrays), inline-vs-offset IFD value encoding (a
  * SHORT count ≤ 2 and LONG count 1 live left-justified in the value
  * field, larger arrays behind offsets), Compression 1 (none) and
  * 32773 (PackBits — the byte-oriented RLE: control n in 0..127 copies
  * n+1 literals, 129..255 repeats the next byte 257−n times, 128 is a
  * no-op). Everything integer-exact; the oracle replays the generator's
  * pixel formula, and losslessness makes a wrong PackBits walk or strip
  * account mismatch.
  */
object TiffRaster {

  // ------------------------------------------------------------------
  // PackBits
  // ------------------------------------------------------------------

  def packBitsEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      // measure the run at i
      var run = 1
      while (i + run < data.length && run < 128 && data(i + run) == data(i))
        run += 1
      if (run >= 3) {
        out.write(257 - run) // -(run-1) as unsigned
        out.write(data(i))
        i += run
      } else {
        // literal segment: up to the next run of >= 3 (or 128 bytes)
        var lit = run
        while (i + lit < data.length && lit < 128) {
          var r2 = 1
          while (i + lit + r2 < data.length && r2 < 3 &&
                 data(i + lit + r2) == data(i + lit)) r2 += 1
          if (r2 >= 3) lit = 128 // force stop
          else lit += 1
        }
        val n = math.min(lit, math.min(128, data.length - i))
        out.write(n - 1)
        out.write(data, i, n)
        i += n
      }
    }
    out.toByteArray
  }

  /** Decode exactly `expected` bytes; None on overrun/underrun. */
  def packBitsDecode(data: Array[Byte], from: Int, until: Int,
                     expected: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expected)
    var o = 0
    var i = from
    while (i < until && o < expected) {
      val n = data(i) & 0xff
      i += 1
      if (n < 128) {
        if (i + n + 1 > until || o + n + 1 > expected) return None
        System.arraycopy(data, i, out, o, n + 1)
        i += n + 1
        o += n + 1
      } else if (n > 128) {
        if (i >= until || o + (257 - n) > expected) return None
        java.util.Arrays.fill(out, o, o + 257 - n, data(i))
        i += 1
        o += 257 - n
      } // 128: no-op
    }
    if (o == expected) Some(out) else None
  }

  // ------------------------------------------------------------------
  // Writer
  // ------------------------------------------------------------------

  /** Build a TIFF with real strip data. `pixels` is interleaved
    * row-major (len = w*h*spp); photometric 1 (spp 1) or 2 (spp 3). */
  def tiffRasterBytes(w: Int, h: Int, spp: Int, pixels: Array[Byte],
                      rowsPerStrip: Int, packBits: Boolean,
                      littleEndian: Boolean): Array[Byte] = {
    require(pixels.length == w * h * spp)
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
      val raw = java.util.Arrays.copyOfRange(pixels,
        s * rowsPerStrip * w * spp, (s * rowsPerStrip + rows) * w * spp)
      if (packBits) packBitsEncode(raw) else raw
    }
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (littleEndian) { u8(v); u8(v >> 8) } else { u8(v >> 8); u8(v) }
    def w32(v: Int): Unit =
      if (littleEndian) { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }
      else { u8(v >> 24); u8(v >> 16); u8(v >> 8); u8(v) }

    val nTags = 10
    // layout: header(8) | IFD(2 + 12*nTags + 4) | extra arrays | strips
    val ifdStart = 8
    val extraStart = ifdStart + 2 + 12 * nTags + 4
    // extra arrays: BitsPerSample (if spp==3: 3 shorts = 6 bytes),
    // StripOffsets (nStrips longs if > 1), StripByteCounts (same)
    val bpsExtra = if (spp == 3) 6 else 0
    val stripArr = if (nStrips > 1) 4 * nStrips else 0
    val offArrPos = extraStart + bpsExtra
    val cntArrPos = offArrPos + stripArr
    val dataStart = cntArrPos + stripArr
    val stripOffsets = strips.scanLeft(dataStart)((p, s) => p + s.length)

    out.write((if (littleEndian) "II" else "MM").getBytes("US-ASCII"))
    w16(42); w32(ifdStart)
    w16(nTags)
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
      w16(id); w16(typ); w32(count)
      // inline values are left-justified in the 4-byte field
      if (typ == 3 && count == 1) { w16(value); w16(0) } else w32(value)
    }
    tag(256, 3, 1, w)                     // ImageWidth
    tag(257, 3, 1, h)                     // ImageLength
    if (spp == 3) tag(258, 3, 3, extraStart)
    else tag(258, 3, 1, 8)                // BitsPerSample
    tag(259, 3, 1, if (packBits) 32773 else 1) // Compression
    tag(262, 3, 1, if (spp == 3) 2 else 1)     // Photometric
    if (nStrips > 1) tag(273, 4, nStrips, offArrPos)
    else tag(273, 4, 1, stripOffsets(0))  // StripOffsets
    tag(277, 3, 1, spp)                   // SamplesPerPixel
    tag(278, 3, 1, rowsPerStrip)          // RowsPerStrip
    if (nStrips > 1) tag(279, 4, nStrips, cntArrPos)
    else tag(279, 4, 1, strips(0).length) // StripByteCounts
    tag(305, 2, 1, 0)                     // Software (empty ASCII)
    w32(0)                                // next IFD
    if (spp == 3) { w16(8); w16(8); w16(8) }
    if (nStrips > 1) {
      (0 until nStrips).foreach(s => w32(stripOffsets(s)))
      (0 until nStrips).foreach(s => w32(strips(s).length))
    }
    strips.foreach(out.write)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  final case class TiffRasterInfo(width: Int, height: Int, spp: Int,
                                  compression: Int, nStrips: Int)

  /** Decode the first IFD's raster to interleaved bytes. None on wrong
    * magic, unsupported bits/photometric/compression, strip accounting
    * that doesn't tile the image, or PackBits overrun. */
  def tiffRasterDecode(bytes: Array[Byte])
      : Option[(TiffRasterInfo, Array[Byte])] = {
    if (bytes.length < 8) return None
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    if (!le && !be) return None
    def u16(o: Int): Int =
      if (le) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def u32(o: Int): Int =
      if (le) u16(o) | (u16(o + 2) << 16) else (u16(o) << 16) | u16(o + 2)
    if (u16(2) != 42) return None
    try {
      val ifd = u32(4)
      val n = u16(ifd)
      var w = -1; var h = -1; var spp = 1; var comp = 1; var photo = -1
      var rps = Int.MaxValue; var bpsOk = true
      var offTag: Option[(Int, Int)] = None // (count, valueOrOffset)
      var cntTag: Option[(Int, Int)] = None
      (0 until n).foreach { i =>
        val e = ifd + 2 + 12 * i
        val id = u16(e); val typ = u16(e + 2); val count = u32(e + 4)
        def inlineShort = u16(e + 8)
        def value = if (typ == 3 && count == 1) inlineShort else u32(e + 8)
        id match {
          case 256 => w = value
          case 257 => h = value
          case 258 =>
            bpsOk =
              if (count == 1) value == 8
              else (0 until count).forall(j => u16(u32(e + 8) + 2 * j) == 8)
          case 259 => comp = value
          case 262 => photo = value
          case 273 => offTag = Some((count, u32(e + 8)))
          case 277 => spp = value
          case 278 => rps = value
          case 279 => cntTag = Some((count, u32(e + 8)))
          case _   => ()
        }
      }
      if (w <= 0 || h <= 0 || !bpsOk) return None
      if (!(photo == 1 && spp == 1) && !(photo == 2 && spp == 3)) return None
      if (comp != 1 && comp != 32773) return None
      val (nOff, offV) = offTag.getOrElse(return None)
      val (nCnt, cntV) = cntTag.getOrElse(return None)
      if (nOff != nCnt) return None
      val offs = if (nOff == 1) Array(offV)
                 else Array.tabulate(nOff)(j => u32(offV + 4 * j))
      val cnts = if (nCnt == 1) Array(cntV)
                 else Array.tabulate(nCnt)(j => u32(cntV + 4 * j))
      val rowsPer = math.min(rps, h)
      if ((h + rowsPer - 1) / rowsPer != nOff) return None
      val out = new Array[Byte](w * h * spp)
      var strip = 0
      while (strip < nOff) {
        val rows = math.min(rowsPer, h - strip * rowsPer)
        val expect = rows * w * spp
        val dst = strip * rowsPer * w * spp
        if (offs(strip) + cnts(strip) > bytes.length) return None
        if (comp == 1) {
          if (cnts(strip) != expect) return None
          System.arraycopy(bytes, offs(strip), out, dst, expect)
        } else {
          packBitsDecode(bytes, offs(strip), offs(strip) + cnts(strip),
              expect) match {
            case Some(raw) => System.arraycopy(raw, 0, out, dst, expect)
            case None      => return None
          }
        }
        strip += 1
      }
      Some((TiffRasterInfo(w, h, spp, comp, nOff), out))
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }
}
