package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, plus decode / feature-extraction / resize /
  * frame-sampling operators.
  *
  * Decode is REAL end-to-end for all three self-contained formats:
  * BMP pixels ([[bmpChannelStats]] — uncompressed, row padding, BGR),
  * PNG pixels ([[pngChannelStats]] — full zlib inflate via the JDK
  * Inflater plus scanline unfiltering, all five filter types), and PCM
  * WAV samples ([[wavSampleStats]] — signed 16-bit LE / unsigned 8-bit),
  * with zero external codec dependency; [[imageMeta]]/[[audioMeta]] parse
  * the container headers. Only formats that genuinely require external
  * codec libraries (JPEG, MP3/AAC, video bitstreams) remain a
  * clearly-marked STUB: [[decodeFeatures]] falls back to deterministic
  * byte-moment features there. The Spark-side plumbing — schema, batch
  * shape, partition-parallel mapPartitions, expression-level chunking —
  * is identical for real and stub paths; swapping a stub for a JNI/codec
  * call changes one function.
  *
  * Scale notes: media blobs stay opaque through shuffles (never parsed by
  * Catalyst); feature extraction is mapPartitions (one codec init per
  * partition, the Scala analog of a Pandas-UDF batch); frame sampling is a
  * pure expression, so it pushes through column pruning.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte],
                            width: Int, height: Int, sample_rate: Int)
  /** width/height/channels are parsed from the payload for PNG/BMP images
    * (channels also for WAV audio), sample_rate for WAV audio; −1 when the
    * container is unrecognized or the kind has no such dimension. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 width: Int, height: Int, channels: Int,
                                 sample_rate: Int, features: Seq[Double])

  final case class ImageMeta(width: Int, height: Int, channels: Int,
                             format: String)

  final case class AudioMeta(sampleRate: Int, channels: Int,
                             bitsPerSample: Int, nFrames: Int)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Header-only image metadata for PNG (signature + IHDR, spec: RFC 2083
    * §3.1/§4.1.1) and BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 40-byte DIB).
    * Returns None for anything else — the honest "unknown container" path. */
  def imageMeta(bytes: Array[Byte]): Option[ImageMeta] = {
    val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    if (bytes.length >= 29 && bytes.startsWith(PngSig) &&
        new String(bytes.slice(12, 16), "US-ASCII") == "IHDR") {
      val w = be32(bytes, 16); val h = be32(bytes, 20)
      val channels = bytes(25) match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolor + alpha
        case _ => -1
      }
      if (w > 0 && h > 0 && channels > 0) Some(ImageMeta(w, h, channels, "png"))
      else None
    } else if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M' &&
               le32(bytes, 14) == 40) { // BITMAPINFOHEADER only
      val w = le32(bytes, 18)
      val h = math.abs(le32(bytes, 22)) // negative = top-down rows
      val channels = le16(bytes, 28) / 8 // 8→1, 24→3, 32→4
      if (w > 0 && h > 0 && channels > 0) Some(ImageMeta(w, h, channels, "bmp"))
      else None
    } else None
  }

  /** Header-only audio metadata for canonical WAV (RIFF/WAVE with a 16-byte
    * PCM fmt chunk at offset 12 and the data chunk right after — the layout
    * every encoder emits for plain PCM). Frame count = data length /
    * block align. Returns None for anything else. */
  def audioMeta(bytes: Array[Byte]): Option[AudioMeta] = {
    def tag(off: Int, s: String) =
      bytes.length >= off + 4 &&
        new String(bytes.slice(off, off + 4), "US-ASCII") == s
    if (bytes.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE") &&
        tag(12, "fmt ") && le32(bytes, 16) == 16 && tag(36, "data")) {
      val channels = le16(bytes, 22)
      val sampleRate = le32(bytes, 24)
      val bps = le16(bytes, 34)
      val blockAlign = le16(bytes, 32)
      val dataLen = le32(bytes, 40)
      if (channels > 0 && sampleRate > 0 && bps > 0 && blockAlign > 0)
        Some(AudioMeta(sampleRate, channels, bps, dataLen / blockAlign))
      else None
    } else None
  }

  /** REAL BMP pixel decode — per-channel mean and mean-square (bytes
    * scaled to [0,1]) over every complete pixel present in the payload.
    * Honors the header's pixel-data offset, 4-byte row alignment, and
    * channel count (8/24/32 bpp); bottom-up vs top-down row order is
    * irrelevant to the statistics. A truncated pixel array (synthetic
    * corpora, partial fetches) decodes the available prefix honestly —
    * only pixels whose bytes are all present count. Returns
    * (meta, nPixels, perChannelMean, perChannelMeanSq); None when the
    * container isn't BMP. */
  def bmpChannelStats(bytes: Array[Byte])
      : Option[(ImageMeta, Long, Array[Double], Array[Double])] =
    imageMeta(bytes) match {
      case Some(meta) if meta.format == "bmp" =>
        val off = le32(bytes, 10)
        val ch = meta.channels
        val stride = ((meta.width * ch + 3) / 4) * 4
        val sums = new Array[Double](ch)
        val sqs = new Array[Double](ch)
        var n = 0L
        var r = 0
        while (r < meta.height) {
          val rowBase = off.toLong + r.toLong * stride
          var x = 0
          while (x < meta.width) {
            val base = rowBase + x.toLong * ch
            if (base >= 0 && base + ch <= bytes.length) {
              var c = 0
              while (c < ch) {
                val v = (bytes((base + c).toInt) & 0xff) / 255.0
                sums(c) += v; sqs(c) += v * v
                c += 1
              }
              n += 1
            }
            x += 1
          }
          r += 1
        }
        Some((meta, n, sums, sqs))
      case _ => None
    }

  /** REAL WAV PCM sample decode — 16-bit little-endian signed samples
    * (the canonical PCM encoding; 8-bit unsigned also handled) normalized
    * to [−1, 1). Returns (meta, nSamples, mean, meanSquare, peakAbs,
    * zeroCrossings) over every COMPLETE sample present in the payload —
    * a truncated data chunk (synthetic corpora, partial fetches) decodes
    * the available prefix honestly, like [[bmpChannelStats]]. Channels are
    * interleaved per the WAV spec; the statistics here pool channels
    * (per-channel splits are a grouping away in the caller). None when the
    * container isn't canonical PCM WAV or the bit depth is unsupported. */
  def wavSampleStats(bytes: Array[Byte])
      : Option[(AudioMeta, Long, Double, Double, Double, Long)] =
    audioMeta(bytes).collect {
      case meta if meta.bitsPerSample == 16 || meta.bitsPerSample == 8 =>
        val bps = meta.bitsPerSample / 8
        val declared = le32(bytes, 40)
        val end = math.min(bytes.length.toLong, 44L + declared)
        var off = 44L
        var n = 0L; var sum = 0.0; var sq = 0.0; var peak = 0.0
        var crossings = 0L; var prevSign = 0
        while (off + bps <= end) {
          val v =
            if (bps == 2) // 16-bit LE signed
              (((bytes((off + 1).toInt) & 0xff) << 8) |
                (bytes(off.toInt) & 0xff)).toShort / 32768.0
            else // 8-bit WAV is unsigned, midpoint 128
              ((bytes(off.toInt) & 0xff) - 128) / 128.0
          sum += v; sq += v * v
          val a = math.abs(v); if (a > peak) peak = a
          val sign = if (v > 0) 1 else if (v < 0) -1 else 0
          if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
          if (sign != 0) prevSign = sign
          n += 1; off += bps
        }
        (meta, n, if (n > 0) sum / n else 0.0,
         if (n > 0) sq / n else 0.0, peak, crossings)
    }

  /** A minimal canonical WAV header + payload (PCM, 16-byte fmt chunk).
    * `declaredLen` overrides the data-chunk length field when the payload
    * is appended separately (the synthetic-corpus path); −1 = payload
    * length. */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
               payload: Array[Byte], declaredLen: Int = -1): Array[Byte] = {
    val dataLen = if (declaredLen >= 0) declaredLen else payload.length
    val out = new Array[Byte](44 + payload.length)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    def putTag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    putTag(0, "RIFF"); putLe32(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16); putLe16(20, 1) // PCM
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * bitsPerSample / 8)
    putLe16(32, channels * bitsPerSample / 8); putLe16(34, bitsPerSample)
    putTag(36, "data"); putLe32(40, dataLen)
    System.arraycopy(payload, 0, out, 44, payload.length)
    out
  }

  /** A minimal well-formed BMP (54-byte header + raw payload as pixel data)
    * — lets synthetic corpora carry REAL parseable image containers. The
    * payload is not padded to BMP row alignment; [[imageMeta]] only reads
    * the header, and the stub moments hash whatever bytes follow. */
  def bmpBytes(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](54 + payload.length)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, out.length) // file size
    putLe32(10, 54)        // pixel-data offset
    putLe32(14, 40)        // BITMAPINFOHEADER size
    putLe32(18, width)
    putLe32(22, height)
    out(26) = 1            // planes
    out(28) = 24           // bits per pixel (3 channels)
    putLe32(34, payload.length)
    System.arraycopy(payload, 0, out, 54, payload.length)
    out
  }

  /** Deterministic synthetic media table (id, kind, media BINARY, meta).
    * Image rows carry a REAL parseable BMP container (64×64×3 header +
    * digest-derived pixel payload); audio rows a REAL canonical WAV header
    * (16 kHz mono 16-bit PCM + digest 'samples'); video stays opaque
    * digest bytes. Every kind is exactly `bytesPerRow` long. */
  def syntheticMedia(spark: SparkSession, n: Int, bytesPerRow: Int = 256): DataFrame = {
    val bmpHdr = bmpBytes(64, 64, Array.empty)
    val wavHdr = wavBytes(16000, 1, 16, Array.empty,
                          declaredLen = bytesPerRow - 44)
    val payload = substring(
      to_binary(repeat(sha2(col("media_id").cast("string"), 256),
                       bytesPerRow / 16), lit("hex")),
      1, bytesPerRow)
    spark.range(n).toDF("media_id")
      .withColumn("kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
                   (col("media_id") % 3 + 1).cast("int")))
      .select(
        col("media_id"), col("kind"),
        when(col("kind") === "image",
             concat(lit(bmpHdr), substring(payload, 1, bytesPerRow - bmpHdr.length)))
          .when(col("kind") === "audio",
             concat(lit(wavHdr), substring(payload, 1, bytesPerRow - wavHdr.length)))
          .otherwise(payload).as("media"),
        lit(64).as("width"), lit(64).as("height"), lit(16000).as("sample_rate"))
  }

  /** Decode + feature extraction over partition-local batches. Container
    * metadata is REAL: width/height/channels for PNG/BMP via [[imageMeta]],
    * sample_rate/channels for WAV via [[audioMeta]]; −1 for unrecognized
    * containers. Features:
    *  - BMP and PNG rows: REAL pixel statistics via [[bmpChannelStats]] /
    *    [[pngChannelStats]] (the latter a full JDK-Inflater zlib decode +
    *    scanline unfilter) — [mean_c per channel, mean-square_c per
    *    channel, decoded-pixel fraction, 0-padding] truncated/padded to
    *    `dim` (24bpp BMP is BGR so f0 is the blue mean; PNG truecolor is
    *    RGB so f0 is the red mean);
    *  - PCM WAV rows: REAL sample statistics via [[wavSampleStats]] —
    *    [mean, mean-square, peak, zero-crossing rate, decoded-sample
    *    fraction, 0-padding];
    *  - everything else (video, unknown containers): the declared STUB —
    *    `dim` deterministic byte-derived moments, so downstream operators
    *    (dedup, ANN) are exercised end-to-end either way. */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one 'codec init' per partition happens here
      rows.map { r =>
        val bytes = r.media
        val imeta = imageMeta(bytes)
        val ameta = audioMeta(bytes)
        val pixelStats = bmpChannelStats(bytes).orElse(pngChannelStats(bytes))
        val feats = (pixelStats, wavSampleStats(bytes)) match {
          case (Some((meta, n, sums, sqs)), _) if n > 0 =>
            val ch = meta.channels
            Array.tabulate(dim) { i =>
              if (i < ch) sums(i) / n
              else if (i < 2 * ch) sqs(i - ch) / n
              else if (i == 2 * ch)
                n.toDouble / (meta.width.toLong * meta.height)
              else 0.0
            }
          case (_, Some((meta, n, mean, meanSq, peak, crossings))) if n > 0 =>
            Array.tabulate(dim) {
              case 0 => mean
              case 1 => meanSq
              case 2 => peak
              case 3 => crossings.toDouble / math.max(1L, n - 1)
              case 4 => n.toDouble / math.max(1L, meta.nFrames.toLong * meta.channels)
              case _ => 0.0
            }
          case _ =>
            Array.tabulate(dim) { i =>
              if (bytes.isEmpty) 0.0
              else {
                var acc = 0.0
                var j = i
                while (j < bytes.length) { acc += (bytes(j) & 0xFF) / 255.0; j += dim }
                acc / math.max(1, (bytes.length + dim - 1 - i) / dim)
              }
            }
        }
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong,
                      imeta.map(_.width).getOrElse(-1),
                      imeta.map(_.height).getOrElse(-1),
                      imeta.map(_.channels)
                        .orElse(ameta.map(_.channels)).getOrElse(-1),
                      ameta.map(_.sampleRate).getOrElse(-1),
                      feats.toSeq)
      }
    }
  }

  // ---- REAL PNG codec (JDK-only: java.util.zip Deflater/Inflater/CRC32) --

  /** Build a real, spec-conformant PNG (RFC 2083): signature, IHDR, one
    * IDAT with zlib-compressed filtered scanlines, IEND — all chunk CRCs
    * genuine. `pixels` is the raw row-major channel-interleaved byte
    * stream (length = width × height × channels); `filterOf` picks the
    * per-row filter type 0–4 (None/Sub/Up/Average/Paeth), letting tests
    * and corpora exercise every decode path. Bit depth 8; channels
    * 1 (grey), 3 (truecolor), or 4 (RGBA). */
  def pngBytes(width: Int, height: Int, channels: Int,
               pixels: Array[Byte], filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(pixels.length == width * height * channels, "pixel stream size")
    val colorType = channels match {
      case 1 => 0
      case 3 => 2
      case 4 => 6
      case c => throw new IllegalArgumentException(s"channels $c")
    }
    val stride = width * channels
    // Filtered scanlines: each row = filter byte + transformed bytes.
    val raw = new Array[Byte](height * (stride + 1))
    def px(r: Int, i: Int): Int = pixels(r * stride + i) & 0xff
    var r = 0
    while (r < height) {
      val ft = filterOf(r)
      raw(r * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = px(r, i)
        val a = if (i >= channels) px(r, i - channels) else 0 // left
        val b = if (r > 0) px(r - 1, i) else 0                // up
        val c = if (r > 0 && i >= channels) px(r - 1, i - channels) else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => // Paeth predictor (RFC 2083 §6.6)
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            x - pred
          case t => throw new IllegalArgumentException(s"filter $t")
        }
        raw(r * (stride + 1) + 1 + i) = f.toByte
        i += 1
      }
      r += 1
    }
    // zlib-compress the scanline stream.
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished())
      out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = out.toByteArray
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
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
    val ihdr = Array((width >> 24).toByte, (width >> 16).toByte,
      (width >> 8).toByte, width.toByte, (height >> 24).toByte,
      (height >> 16).toByte, (height >> 8).toByte, height.toByte,
      8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** REAL PNG pixel decode — walks the chunk stream (multiple IDATs
    * concatenate per the spec; ancillary chunks skipped), inflates the
    * zlib scanline stream with the JDK Inflater, reverses the per-row
    * filter (all five types), and returns the same per-channel statistics
    * shape as [[bmpChannelStats]]: (meta, nPixels, perChannelSum,
    * perChannelSumSq) with bytes scaled to [0,1]. A truncated or
    * corrupt IDAT decodes the complete rows that survive inflation —
    * partial-tail honesty like the BMP path. Chunk CRCs are not
    * re-verified (decode-what's-there policy; the builder writes real
    * CRCs). None for non-PNG containers or unsupported layouts
    * (interlace, bit depth ≠ 8, palette). */
  def pngChannelStats(bytes: Array[Byte])
      : Option[(ImageMeta, Long, Array[Double], Array[Double])] =
    imageMeta(bytes) match {
      case Some(meta) if meta.format == "png" &&
          bytes(24) == 8 && bytes(25) != 3 && bytes(28) == 0 =>
        // Concatenate IDAT chunk bodies.
        val idat = new java.io.ByteArrayOutputStream()
        var off = 33 // after signature + IHDR chunk
        var halted = false
        while (!halted && off + 8 <= bytes.length) {
          val len = be32(bytes, off)
          val tag = new String(bytes.slice(off + 4, off + 8), "US-ASCII")
          if (tag == "IEND" || len < 0) halted = true
          else {
            if (tag == "IDAT") {
              val end = math.min(bytes.length.toLong, off + 8L + len).toInt
              if (end > off + 8) idat.write(bytes, off + 8, end - (off + 8))
            }
            off += 12 + len // len + tag + body + crc
          }
        }
        val ch = meta.channels
        val stride = meta.width * ch
        val expect = meta.height * (stride + 1)
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
        } catch { case _: java.util.zip.DataFormatException => () }
        finally inflater.end()
        val rows = got / (stride + 1) // complete rows only
        // Unfilter in place (row r depends on unfiltered row r-1).
        val sums = new Array[Double](ch)
        val sqs = new Array[Double](ch)
        var r = 0
        while (r < rows) {
          val base = r * (stride + 1)
          val ft = raw(base) & 0xff
          var i = 0
          while (i < stride) {
            val f = raw(base + 1 + i) & 0xff
            val a = if (i >= ch) raw(base + 1 + i - ch) & 0xff else 0
            val b = if (r > 0) raw(base - stride + i) & 0xff else 0
            val c = if (r > 0 && i >= ch) raw(base - stride + i - ch) & 0xff
                    else 0
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
              case _ => f // unknown filter: pass through, stay honest below
            }
            raw(base + 1 + i) = x.toByte
            val v = (x & 0xff) / 255.0
            sums(i % ch) += v; sqs(i % ch) += v * v
            i += 1
          }
          r += 1
        }
        Some((meta, rows.toLong * meta.width, sums, sqs))
      case _ => None
    }

  /** Frame sampling: split the payload into fixed-size chunks and keep every
    * `stride`-th — pure expression (binary substring), no UDF. */
  def sampleFrames(df: DataFrame, mediaCol: String, frameBytes: Int,
                   stride: Int): DataFrame =
    df.withColumn("frames", expr(
      s"""transform(
         |  filter(sequence(0, cast(length($mediaCol) / $frameBytes as int) - 1),
         |         i -> i % $stride = 0),
         |  i -> substring($mediaCol, cast(i * $frameBytes + 1 as int), $frameBytes))"""
        .stripMargin))

  /** 'Resize' stub: truncate/pad payload to a target byte budget (stands in
    * for a real resample; keeps schema + sizes honest). */
  def resizeStub(df: DataFrame, mediaCol: String, targetBytes: Int): DataFrame =
    df.withColumn(mediaCol,
      substring(col(mediaCol), 1, targetBytes))
      .withColumn("resized_bytes", length(col(mediaCol)).cast("long"))
}
