package graft.pipeline

/** REAL sub-byte PNG (depths 1/2/4 — the document-scan and icon
  * layouts [[Multimodal.pngChannelStats]] declares out of scope):
  * grayscale (color 0) and palette (color 3), MSB-first bit packing
  * with zero pad bits in the partial trailing byte, all five filters
  * over the PACKED row bytes at the spec's bpp = 1 left distance
  * (RFC 2083 §6.2: filters operate on bytes, not samples, below 8
  * bits), zlib scanline stream, chunk CRCs. No interlace (declared —
  * Adam7 at sub-byte packs per-pass rows; the 8/16-bit Adam7 path
  * lives in pngChannelStats). Decode returns the SAMPLES, so the
  * oracle replays the generator formula value-for-value; the encoder
  * is additionally ImageIO-pinned in PngDepthsSpec. */
object PngDepths {

  private def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val tb = tag.getBytes("US-ASCII")
    crc.update(tb); crc.update(body)
    val len = body.length
    Array((len >> 24).toByte, (len >> 16).toByte, (len >> 8).toByte,
          len.toByte) ++ tb ++ body ++ {
      val v = crc.getValue
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    }
  }

  /** Pack one row of samples (0..2^depth−1) MSB-first; pad bits zero. */
  private def packRow(samples: Array[Int], y: Int, w: Int,
                      depth: Int): Array[Byte] = {
    val stride = (w * depth + 7) / 8
    val out = new Array[Byte](stride)
    var x = 0
    while (x < w) {
      val v = samples(y * w + x) & ((1 << depth) - 1)
      val bit = x * depth
      out(bit >> 3) = (out(bit >> 3) |
        (v << (8 - depth - (bit & 7)))).toByte
      x += 1
    }
    out
  }

  /** Build a complete sub-byte PNG. `palette` (RGB ints) selects color
    * type 3; absent = grayscale color type 0. `filterOf(row)` picks the
    * per-row filter 0..4 (applied over packed bytes, bpp = 1). */
  def pngBytesSubByte(w: Int, h: Int, depth: Int, samples: Array[Int],
                      palette: Option[Array[Int]] = None,
                      filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(depth == 1 || depth == 2 || depth == 4)
    require(samples.length == w * h)
    val stride = (w * depth + 7) / 8
    val rawB = new java.io.ByteArrayOutputStream()
    val up = new Array[Int](stride)
    var r = 0
    while (r < h) {
      val cur = packRow(samples, r, w, depth).map(_ & 0xff)
      val ft = filterOf(r)
      rawB.write(ft)
      var i = 0
      while (i < stride) {
        val x = cur(i)
        val a = if (i >= 1) cur(i - 1) else 0
        val b = if (r > 0) up(i) else 0
        val c = if (r > 0 && i >= 1) up(i - 1) else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        rawB.write(f & 0xff)
        i += 1
      }
      System.arraycopy(cur, 0, up, 0, stride)
      r += 1
    }
    val deflater = new java.util.zip.Deflater()
    val raw = rawB.toByteArray
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val z = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val colorType = if (palette.isDefined) 3 else 0
    val ihdr = Array((w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte,
      w.toByte, (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte,
      h.toByte, depth.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)
    val plteChunk = palette.map { pal =>
      chunk("PLTE", pal.flatMap(rgb => Array(((rgb >> 16) & 0xff).toByte,
        ((rgb >> 8) & 0xff).toByte, (rgb & 0xff).toByte)))
    }.getOrElse(Array.empty[Byte])
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ plteChunk ++
      chunk("IDAT", z.toByteArray) ++ chunk("IEND", Array.empty[Byte])
  }

  final case class SubByteInfo(width: Int, height: Int, depth: Int,
                               colorType: Int, palette: Array[Int])

  /** Decode a depth-1/2/4 non-interlaced PNG to its SAMPLE values
    * (palette indices for color 3, gray levels for color 0). None for
    * other layouts, short IDAT, or bad magic. */
  def pngSubByteDecode(bytes: Array[Byte])
      : Option[(SubByteInfo, Array[Int])] = {
    val magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (bytes.length < 33 ||
        !(0 until 8).forall(i => (bytes(i) & 0xff) == magic(i))) return None
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    val w = be32(16); val h = be32(20)
    val depth = bytes(24) & 0xff
    val colorType = bytes(25) & 0xff
    val interlace = bytes(28) & 0xff
    if (depth != 1 && depth != 2 && depth != 4) return None
    if (colorType != 0 && colorType != 3) return None
    if (interlace != 0 || w <= 0 || h <= 0) return None
    val idat = new java.io.ByteArrayOutputStream()
    var pal: Array[Int] = Array.empty
    var off = 33
    var halted = false
    while (!halted && off + 8 <= bytes.length) {
      val len = be32(off)
      val tag = new String(bytes.slice(off + 4, off + 8), "US-ASCII")
      if (tag == "IEND" || len < 0) halted = true
      else {
        if (tag == "IDAT" && off + 8 + len <= bytes.length)
          idat.write(bytes, off + 8, len)
        else if (tag == "PLTE" && off + 8 + len <= bytes.length)
          pal = Array.tabulate(len / 3)(i =>
            ((bytes(off + 8 + 3 * i) & 0xff) << 16) |
              ((bytes(off + 8 + 3 * i + 1) & 0xff) << 8) |
              (bytes(off + 8 + 3 * i + 2) & 0xff))
        off += 12 + len
      }
    }
    if (colorType == 3 && pal.isEmpty) return None
    val stride = (w * depth + 7) / 8
    val expect = h * (stride + 1)
    val raw = new Array[Byte](expect)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      var n = -1
      while (got < expect && !inflater.finished() && n != 0) {
        n = inflater.inflate(raw, got, expect - got)
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (got < expect) return None
    val samples = new Array[Int](w * h)
    var base = 0
    var r = 0
    while (r < h) {
      val ft = raw(base) & 0xff
      if (ft > 4) return None
      var i = 0
      while (i < stride) {
        val f = raw(base + 1 + i) & 0xff
        val a = if (i >= 1) raw(base + i) & 0xff else 0
        val b = if (r > 0) raw(base - stride + i) & 0xff else 0
        val c = if (r > 0 && i >= 1) raw(base - stride + i - 1) & 0xff else 0
        val x = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            f + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(base + 1 + i) = x.toByte
        i += 1
      }
      var xPix = 0
      while (xPix < w) {
        val bit = xPix * depth
        val v = ((raw(base + 1 + (bit >> 3)) & 0xff) >>
          (8 - depth - (bit & 7))) & ((1 << depth) - 1)
        samples(r * w + xPix) = v
        xPix += 1
      }
      base += stride + 1
      r += 1
    }
    Some((SubByteInfo(w, h, depth, colorType, pal), samples))
  }
}
