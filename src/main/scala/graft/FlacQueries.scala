package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, element_at, split}

import graft.pipeline.{AudioDispatch, Flac}
import graft.pipeline.Flac._

/** FLAC payload oracle rows (round 17, continuation session). Each row
  * builds genuine FLAC streams from closed-form PCM via
  * [[Flac.frameBytes]], decodes them through the REAL payload machinery
  * ([[Flac.decode]]: sync + header codes, UTF-8 coded numbers, CRC-8,
  * subframe types CONSTANT/VERBATIM/FIXED/LPC, wasted bits, partitioned
  * Rice/Rice2 residuals with escapes, stereo decorrelation, CRC-16),
  * and the DuckDB oracle recomputes the INPUT signal in pure integer
  * SQL — FLAC is lossless, so decoded PCM must equal the generator's
  * closed form bit-for-bit, with no codec replay in the oracle at all.
  * A wrong predictor, zigzag, shift, or stereo fold cannot match. */
object FlacQueries {
  import PipelineQueries.QFn

  /** The shared pseudo-signal: integer, non-negative before centering,
    * identical term-for-term in Scala and DuckDB. */
  private def base(id: Long, f: Long, ch: Long, t: Long): Long =
    (id * 37 + f * 59 + ch * 101 + t * 13 + ((t * t) % 251) * 7 +
      ((id + t) % 17) * 29) % 200 - 100

  private val baseSql =
    "((r*37 + f*59 + c*101 + t*13 + ((t*t)%251)*7 + ((r+t)%17)*29) % 200 - 100)"

  private def bpsCodeOf(bps: Int): Int = bps match {
    case 8 => 1; case 12 => 2; case 16 => 4
    case 20 => 5; case 24 => 6; case 32 => 7
  }

  def entries: Seq[(String, QFn, Option[String])] = Seq(

    // ------------------------------------------------------------------
    // The mixed matrix: every stereo mode, every subframe type, both
    // residual methods, partition orders 0-2, escape partitions, all six
    // bit depths, explicit and from-STREAMINFO header codes, both
    // blocking strategies. 24 media x 2 frames x 2 ch x 48 samples.
    // ------------------------------------------------------------------
    ("multimodal_flac_decode",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val bps = Array(8, 12, 16, 20, 24, 32)((id % 6).toInt)
          val bs = 48
          val frames = (0L to 1L).map { f =>
            val modeIdx = ((id + f) % 4).toInt
            val chAssign = Array(1, 8, 9, 10)(modeIdx)
            val pcm = Array.tabulate(2) { ch =>
              Array.tabulate(bs) { t =>
                if (modeIdx == 0 && ch == 0) (id * 37 + f * 59) % 200 - 100
                else base(id, f, ch, t)
              }
            }
            val plans = Array.tabulate(2) { ch =>
              val sel = ((id + f + ch) % 4).toInt
              val sub: SubPlan = sel match {
                case 0 if chAssign <= 7 => PlanConstant
                case 0 | 1              => PlanVerbatim
                case 2                  => PlanFixed(((id + ch) % 5).toInt)
                case 3 =>
                  val order = 2 + ((id + ch) % 4).toInt
                  PlanLpc(order, precision = 6 + ch, shift = 3,
                    coefs = Array.tabulate(order)(j => (j * 5 - 7).toLong))
              }
              ChannelPlan(sub, 0,
                ResidualPlan(((id + f) % 2).toInt, ((id + ch) % 3).toInt,
                  p => (p + id) % 4 == 0))
            }
            val strategy = (id % 2).toInt
            Flac.frameBytes(pcm, chAssign, bps, 44100,
              FrameHeaderPlan(blockSizeCode = 6,
                rateCode = if (id % 2 == 0) 9 else 0,
                bpsCode = if (id % 5 == 0) 0 else bpsCodeOf(bps),
                strategy = strategy,
                codedNumber = if (strategy == 0) f else f * bs),
              plans)
          }
          val stream = Flac.streamBytes(44100, 2, bps, 2L * bs, frames)
          Flac.decode(stream) match {
            case Right(fs) =>
              for {
                fr <- fs
                ch <- 0 until 2
                t <- 0 until bs
              } yield (id, fr.info.index.toLong, ch.toLong, t.toLong,
                fr.samples(ch)(t))
            case Left(err) => throw new IllegalStateException(err)
          }
        }.toDF("media_id", "frame", "ch", "t", "sample")
      }): QFn,
      Some("""SELECT r AS media_id, f AS frame, c AS ch, t,
            |  CAST(CASE WHEN (r+f)%4 = 0 AND c = 0
            |            THEN (r*37 + f*59) % 200 - 100
            |            ELSE """.stripMargin + baseSql + """ END AS BIGINT) AS sample
            |FROM range(24) t0(r), range(2) t1(f), range(2) t2(c), range(48) t3(t)""".stripMargin)),

    // ------------------------------------------------------------------
    // Header-field sweep: all common blocksize codes + 8/16-bit explicit
    // fields, rate codes incl. the kHz / Hz / tens-of-Hz trailing fields
    // and from-STREAMINFO, every bit-depth code, both strategies with
    // multi-byte coded sample numbers, wasted-bits on CONSTANT frames.
    // ------------------------------------------------------------------
    ("multimodal_flac_header",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val frames = (0L to 1L).map { f =>
            val (bsCode, bs) = (((id + f) % 7).toInt: @unchecked) match {
              case 0 => (1, 192); case 1 => (2, 576); case 2 => (3, 1152)
              case 3 => (8, 256); case 4 => (9, 512)
              case 5 => (6, 48 + id.toInt); case 6 => (7, 300 + id.toInt * 7)
            }
            val (rateCode, rate) = (((id + f) % 6).toInt: @unchecked) match {
              case 0 => (9, 44100); case 1 => (10, 48000); case 2 => (0, 32000)
              case 3 => (12, 8000); case 4 => (13, 22050); case 5 => (14, 44100)
            }
            val (bpsCode, bps) = (((id + f) % 7).toInt: @unchecked) match {
              case 0 => (1, 8); case 1 => (2, 12); case 2 => (4, 16)
              case 3 => (5, 20); case 4 => (6, 24); case 5 => (7, 32)
              case 6 => (0, 16)
            }
            val strategy = (id % 2).toInt
            val coded =
              if (strategy == 0) f else (id * 97 + f) * 131071L
            val w = ((id + f) % 3).toInt
            val cval = (((id * 13 + f * 29) % 50) - 25) << w
            Flac.frameBytes(Array(Array.fill(bs)(cval)), 0, bps, rate,
              FrameHeaderPlan(bsCode, rateCode, bpsCode, strategy, coded),
              Array(ChannelPlan(PlanConstant, w, ResidualPlan(0, 0))))
          }
          val stream = Flac.streamBytes(32000, 1, 16, 0L, frames)
          Flac.decode(stream) match {
            case Right(fs) =>
              fs.map { fr =>
                (id, fr.info.index.toLong, fr.info.blockSize.toLong,
                 fr.info.sampleRate.toLong, fr.info.bps.toLong,
                 fr.info.strategy.toLong, fr.info.codedNumber,
                 fr.info.subTypes(0).toLong, fr.info.wasted(0).toLong,
                 fr.samples(0)(0))
              }
            case Left(err) => throw new IllegalStateException(err)
          }
        }.toDF("media_id", "frame", "block_size", "sample_rate", "bits",
               "strategy", "coded_number", "sub_type", "wasted", "const_val")
      }): QFn,
      Some("""SELECT r AS media_id, f AS frame,
            |  CAST(CASE (r+f)%7 WHEN 0 THEN 192 WHEN 1 THEN 576 WHEN 2 THEN 1152
            |       WHEN 3 THEN 256 WHEN 4 THEN 512 WHEN 5 THEN 48 + r
            |       ELSE 300 + r*7 END AS BIGINT) AS block_size,
            |  CAST(CASE (r+f)%6 WHEN 0 THEN 44100 WHEN 1 THEN 48000
            |       WHEN 2 THEN 32000 WHEN 3 THEN 8000 WHEN 4 THEN 22050
            |       ELSE 44100 END AS BIGINT) AS sample_rate,
            |  CAST(CASE (r+f)%7 WHEN 0 THEN 8 WHEN 1 THEN 12 WHEN 2 THEN 16
            |       WHEN 3 THEN 20 WHEN 4 THEN 24 WHEN 5 THEN 32
            |       ELSE 16 END AS BIGINT) AS bits,
            |  CAST(r%2 AS BIGINT) AS strategy,
            |  CAST(CASE WHEN r%2 = 0 THEN f ELSE (r*97 + f) * 131071 END AS BIGINT)
            |    AS coded_number,
            |  CAST(0 AS BIGINT) AS sub_type,
            |  CAST((r+f)%3 AS BIGINT) AS wasted,
            |  CAST((((r*13 + f*29) % 50) - 25)
            |       * (CASE (r+f)%3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END)
            |       AS BIGINT) AS const_val
            |FROM range(24) t0(r), range(2) t1(f)""".stripMargin)),

    // ------------------------------------------------------------------
    // LPC sweep: orders 1-8, precisions 5-12, shifts 0-7, signed
    // coefficients — integer prediction with the arithmetic right shift
    // of the signed accumulator, exact by losslessness.
    // ------------------------------------------------------------------
    ("multimodal_flac_lpc",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val bs = 32
          val frames = (0L to 2L).map { f =>
            val order = 1 + ((id + f) % 8).toInt
            Flac.frameBytes(
              Array(Array.tabulate(bs)(t => base(id, f, 0, t))), 0, 16, 44100,
              FrameHeaderPlan(6, 9, 4, 0, f),
              Array(ChannelPlan(
                PlanLpc(order, precision = 5 + (id % 8).toInt,
                  shift = ((id + f) % 8).toInt,
                  coefs = Array.tabulate(order)(j => (id + j * 7) % 13 - 6)),
                0, ResidualPlan(0, (f % 2).toInt))))
          }
          val stream = Flac.streamBytes(44100, 1, 16, 3L * bs, frames)
          Flac.decode(stream) match {
            case Right(fs) =>
              for { fr <- fs; t <- 0 until bs }
                yield (id, fr.info.index.toLong, t.toLong, fr.samples(0)(t))
            case Left(err) => throw new IllegalStateException(err)
          }
        }.toDF("media_id", "frame", "t", "sample")
      }): QFn,
      Some("""SELECT r AS media_id, f AS frame, t,
            |  CAST((r*37 + f*59 + t*13 + ((t*t)%251)*7 + ((r+t)%17)*29) % 200 - 100
            |       AS BIGINT) AS sample
            |FROM range(24) t0(r), range(3) t1(f), range(32) t3(t)""".stripMargin)),

    // ------------------------------------------------------------------
    // Residual plumbing: both Rice methods, partition orders 0-3, escape
    // partitions (incl. the 0-bit all-zero escape on constant signals),
    // grouped integer stats.
    // ------------------------------------------------------------------
    ("multimodal_flac_rice",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val bs = 64
          val frames = (0L to 1L).map { f =>
            val pcm = Array.tabulate(bs) { t =>
              if (id % 6 == 5) (id * 13) % 50 - 25 else base(id, f, 0, t)
            }
            Flac.frameBytes(Array(pcm), 0, 16, 44100,
              FrameHeaderPlan(6, 9, 4, 0, f),
              Array(ChannelPlan(PlanFixed(((id + f) % 3).toInt), 0,
                ResidualPlan(((id + f) % 2).toInt, (id % 4).toInt,
                  p => (p + f) % 3 == 0))))
          }
          val stream = Flac.streamBytes(44100, 1, 16, 2L * bs, frames)
          Flac.decode(stream) match {
            case Right(fs) =>
              fs.map { fr =>
                val v = fr.samples(0)
                (id, fr.info.index.toLong, v.length.toLong, v.sum,
                 v.map(math.abs).sum, v.min, v.max)
              }
            case Left(err) => throw new IllegalStateException(err)
          }
        }.toDF("media_id", "frame", "n", "sum_v", "sum_abs", "min_v", "max_v")
      }): QFn,
      Some("""WITH sv AS (SELECT r, f, t,
            |    CASE WHEN r%6 = 5 THEN (r*13)%50 - 25
            |         ELSE (r*37 + f*59 + t*13 + ((t*t)%251)*7 + ((r+t)%17)*29) % 200 - 100
            |    END AS v
            |  FROM range(24) t0(r), range(2) t1(f), range(64) t2(t))
            |SELECT r AS media_id, f AS frame,
            |  CAST(COUNT(*) AS BIGINT) AS n,
            |  CAST(SUM(v) AS BIGINT) AS sum_v,
            |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
            |  CAST(MIN(v) AS BIGINT) AS min_v,
            |  CAST(MAX(v) AS BIGINT) AS max_v
            |FROM sv GROUP BY r, f""".stripMargin)),

    // ------------------------------------------------------------------
    // Stereo decorrelation: correlated channels (R = L − small delta) —
    // the case the side transforms exist for — through all four channel
    // assignments; the mid/side parity fold is exact by losslessness.
    // ------------------------------------------------------------------
    ("multimodal_flac_stereo",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val bs = 32
          val frames = (0L to 1L).map { f =>
            val l = Array.tabulate(bs)(t => base(id, f, 0, t))
            val rr = Array.tabulate(bs)(t =>
              l(t) - ((t % 5) + (id % 7) - 3))
            val chAssign = Array(1, 8, 9, 10)(((id + f) % 4).toInt)
            Flac.frameBytes(Array(l, rr), chAssign, 16, 44100,
              FrameHeaderPlan(6, 9, 4, 0, f),
              Array.fill(2)(ChannelPlan(PlanFixed(2), 0,
                ResidualPlan((f % 2).toInt, 1))))
          }
          val stream = Flac.streamBytes(44100, 2, 16, 2L * bs, frames)
          Flac.decode(stream) match {
            case Right(fs) =>
              for { fr <- fs; ch <- 0 until 2; t <- 0 until bs }
                yield (id, fr.info.index.toLong, ch.toLong, t.toLong,
                  fr.samples(ch)(t))
            case Left(err) => throw new IllegalStateException(err)
          }
        }.toDF("media_id", "frame", "ch", "t", "sample")
      }): QFn,
      Some("""SELECT r AS media_id, f AS frame, c AS ch, t,
            |  CAST((r*37 + f*59 + t*13 + ((t*t)%251)*7 + ((r+t)%17)*29) % 200 - 100
            |       - CASE WHEN c = 1 THEN (t%5) + (r%7) - 3 ELSE 0 END
            |       AS BIGINT) AS sample
            |FROM range(24) t0(r), range(2) t1(f), range(2) t2(c), range(32) t3(t)""".stripMargin)),

    // ------------------------------------------------------------------
    // Wasted bits: samples divisible by 2^w, signalled by the unary
    // prefix, decoded back through the left shift.
    // ------------------------------------------------------------------
    ("multimodal_flac_wasted",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val bs = 32
          val pcm = Array.tabulate(2) { ch =>
            val w = 1 + ((id + ch) % 3).toInt
            Array.tabulate(bs)(t => base(id, 0, ch, t) << w)
          }
          val plans = Array.tabulate(2) { ch =>
            ChannelPlan(PlanFixed(((id + ch) % 5).toInt),
              1 + ((id + ch) % 3).toInt, ResidualPlan(0, 1))
          }
          val frame = Flac.frameBytes(pcm, 1, 16, 44100,
            FrameHeaderPlan(6, 9, 4, 0, 0), plans)
          val stream = Flac.streamBytes(44100, 2, 16, bs.toLong, Seq(frame))
          Flac.decode(stream) match {
            case Right(fs) =>
              for { fr <- fs; ch <- 0 until 2; t <- 0 until bs }
                yield (id, ch.toLong, t.toLong, fr.samples(ch)(t),
                  fr.info.wasted(ch).toLong)
            case Left(err) => throw new IllegalStateException(err)
          }
        }.toDF("media_id", "ch", "t", "sample", "wasted")
      }): QFn,
      Some("""SELECT r AS media_id, c AS ch, t,
            |  CAST(((r*37 + c*101 + t*13 + ((t*t)%251)*7 + ((r+t)%17)*29) % 200 - 100)
            |       * (CASE (r+c)%3 WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 8 END)
            |       AS BIGINT) AS sample,
            |  CAST(1 + (r+c)%3 AS BIGINT) AS wasted
            |FROM range(24) t0(r), range(2) t2(c), range(32) t3(t)""".stripMargin)),

    // ------------------------------------------------------------------
    // Unified ingest: a mixed-format audio corpus (WAV / FLAC / MP3 /
    // ADTS AAC / Layer I / Layer II, some behind ID3v2 tags) routed by
    // magic-byte sniff to the matching real decoder — the composition
    // surface a crawl's audio column actually needs.
    // ------------------------------------------------------------------
    ("multimodal_audio_dispatch",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).map { id =>
          val bytes = ((id % 8).toInt: @unchecked) match {
            case 0 =>
              val ch = (id % 2).toInt + 1
              graft.pipeline.Multimodal.wavBytes(44100, ch, 16,
                new Array[Byte](200 * ch))
            case 1 =>
              val bs = 48
              val frames = (0L to 1L).map { f =>
                Flac.frameBytes(
                  Array(Array.tabulate(bs)(t => base(id, f, 0, t)),
                        Array.tabulate(bs)(t => base(id, f, 1, t))),
                  1, 16, 44100, FrameHeaderPlan(6, 9, 4, 0, f),
                  Array.fill(2)(ChannelPlan(PlanFixed(2), 0,
                    ResidualPlan(0, 0))))
              }
              Flac.streamBytes(44100, 2, 16, 96L, frames)
            case 2 => graft.pipeline.Multimodal.layer3Bytes(id, 3)
            case 3 => graft.pipeline.Aac.aacLcBytes(id, 2, "long")
            case 4 => graft.pipeline.Multimodal.layer1Bytes(id, 2)
            case 5 => graft.pipeline.Multimodal.layer2Bytes(id, 3)
            case 6 =>
              graft.pipeline.PcmAudio.aiffBytes(22050, 1, 16,
                Array(Array.tabulate(30)(t => (t * 7 + id.toInt) % 100)))
            case 7 =>
              graft.pipeline.PcmAudio.auBytes(1, 8000, 1,
                Array.tabulate(50)(t => ((id * 7 + t) % 256).toByte))
          }
          // every third MPEG-family media hides behind an ID3v2 tag
          // (RIFF/fLaC/FORM/.snd magics are position-zero by spec)
          val wrapped =
            if (id % 3 == 0 && id % 8 >= 2 && id % 8 <= 5) {
              val pad = 6 + (id % 5).toInt
              Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0,
                ((pad >> 7) & 0x7f).toByte, (pad & 0x7f).toByte) ++
                new Array[Byte](pad) ++ bytes
            } else bytes
          AudioDispatch.dispatch(wrapped, allowSyntheticAac = true) match {
            case Right((fmt, rate, ch, units)) =>
              (id, fmt, rate.toLong, ch.toLong, units)
            case Left(err) => (id, "refused:" + err, -1L, -1L, -1L)
          }
        }.toDF("media_id", "format", "sample_rate", "channels", "units")
      }): QFn,
      Some("""SELECT r AS media_id,
            |  CASE r%8 WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' WHEN 2 THEN 'mp3'
            |       WHEN 3 THEN 'aac' WHEN 4 THEN 'mp1' WHEN 5 THEN 'mp2'
            |       WHEN 6 THEN 'aiff' ELSE 'au' END AS format,
            |  CAST(CASE r%8 WHEN 0 THEN 44100 WHEN 1 THEN 44100 WHEN 2 THEN 48000
            |       WHEN 3 THEN 48000 WHEN 4 THEN 32000 WHEN 5 THEN 48000
            |       WHEN 6 THEN 22050 ELSE 8000 END AS BIGINT)
            |    AS sample_rate,
            |  CAST(CASE WHEN r%8 = 0 THEN r%2 + 1 WHEN r%8 = 1 THEN 2
            |       ELSE 1 END AS BIGINT) AS channels,
            |  CAST(CASE r%8 WHEN 0 THEN 100 * (r%2 + 1) WHEN 1 THEN 2
            |       WHEN 2 THEN 3 WHEN 3 THEN 2 WHEN 4 THEN 2 WHEN 5 THEN 3
            |       WHEN 6 THEN 30 ELSE 50 END AS BIGINT)
            |    AS units
            |FROM range(24) t(r)""".stripMargin)),

    // ------------------------------------------------------------------
    // REAL image resize over REAL decoded pixels (replaces the former
    // byte-truncate stub): GIF decode -> nearest-neighbor to a
    // non-integer ratio (floor source mapping) and integer box-mean
    // downscale, both exact-integer and replayed per pixel in SQL.
    // ------------------------------------------------------------------
    ("multimodal_resize",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        val (w, h) = (24, 16)
        s.range(24).flatMap { id =>
          val pixels = Array.tabulate(w * h) { i =>
            val x = i % w; val y = i / w
            ((id * 7 + x * 3 + y * 11) % 256).toByte
          }
          val bytes = graft.pipeline.Multimodal.gifBytes(w, h, pixels)
          val (meta, idx, pal) =
            graft.pipeline.Multimodal.gifDecode(bytes).get
          // red channel of the decoded raster (identity-gray palette)
          val red = idx.map(b => (pal(b & 0xff) >> 16) & 0xff)
          val nn = graft.pipeline.Multimodal.resizeNearest(red, w, h, 10, 7)
          val box = graft.pipeline.Multimodal.resizeBoxMean(red, w, h, 2, 2)
          val nnRows = for (y <- 0 until 7; x <- 0 until 10)
            yield (id, "nn", x.toLong, y.toLong, nn(y * 10 + x).toLong)
          val boxRows = for (y <- 0 until 8; x <- 0 until 12)
            yield (id, "box", x.toLong, y.toLong, box(y * 12 + x).toLong)
          (nnRows ++ boxRows).toSeq
        }.toDF("media_id", "op", "x", "y", "v")
      }): QFn,
      Some("""WITH nn AS (SELECT r, x, y,
            |    (r*7 + ((x*24)//10)*3 + ((y*16)//7)*11) % 256 AS v
            |  FROM range(24) t0(r), range(10) t1(x), range(7) t2(y)),
            |box AS (SELECT r, x, y,
            |    (  (r*7 + (2*x)*3   + (2*y)*11) % 256
            |     + (r*7 + (2*x+1)*3 + (2*y)*11) % 256
            |     + (r*7 + (2*x)*3   + (2*y+1)*11) % 256
            |     + (r*7 + (2*x+1)*3 + (2*y+1)*11) % 256) // 4 AS v
            |  FROM range(24) t0(r), range(12) t1(x), range(8) t2(y))
            |SELECT r AS media_id, 'nn' AS op, x, y, CAST(v AS BIGINT) AS v FROM nn
            |UNION ALL
            |SELECT r, 'box', x, y, CAST(v AS BIGINT) FROM box""".stripMargin)),

    // ------------------------------------------------------------------
    // AIFF: FORM/AIFF chunk walk, COMM with the 80-bit extended-float
    // sample rate (incl. non-power-of-two rates), SSND offsets, even-
    // length chunk padding, big-endian interleaved samples.
    // ------------------------------------------------------------------
    ("multimodal_aiff_decode",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val rate = Array(44100L, 22050L, 48000L, 8000L, 96000L, 11025L)((id % 6).toInt)
          val ch = (id % 2).toInt + 1
          val nf = 40
          val pcm = Array.tabulate(ch)(c => Array.tabulate(nf)(t =>
            (((id * 37 + c * 101 + t * 13 + ((t.toLong * t) % 251) * 7) % 4000) - 2000).toInt))
          val bytes = graft.pipeline.PcmAudio.aiffBytes(rate, ch, 16, pcm,
            ssndOffset = (id % 3).toInt * 4)
          graft.pipeline.PcmAudio.aiffDecode(bytes) match {
            case Some((info, samples)) =>
              for { c <- 0 until info.channels; t <- 0 until nf }
                yield (id, info.sampleRate, info.channels.toLong, c.toLong,
                  t.toLong, samples(c)(t).toLong)
            case None => throw new IllegalStateException("aiff refused")
          }
        }.toDF("media_id", "sample_rate", "channels", "ch", "t", "sample")
      }): QFn,
      Some("""SELECT r AS media_id,
            |  CAST(CASE r%6 WHEN 0 THEN 44100 WHEN 1 THEN 22050 WHEN 2 THEN 48000
            |       WHEN 3 THEN 8000 WHEN 4 THEN 96000 ELSE 11025 END AS BIGINT)
            |    AS sample_rate,
            |  CAST(r%2 + 1 AS BIGINT) AS channels, c AS ch, t,
            |  CAST((r*37 + c*101 + t*13 + ((t*t)%251)*7) % 4000 - 2000 AS BIGINT)
            |    AS sample
            |FROM range(24) t0(r), range(2) t1(c), range(40) t2(t)
            |WHERE c <= r%2""".stripMargin)),

    // ------------------------------------------------------------------
    // Sun AU + G.711: mu-law and A-law bytes expanded through the
    // segmented closed forms (complement vs XOR-0x55, opposite sign
    // polarity — preserved exactly), next to 16-bit linear BE; the
    // oracle replays the expansion arithmetic in integer SQL.
    // ------------------------------------------------------------------
    ("multimodal_au_g711",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).flatMap { id =>
          val enc = Array(1, 27, 3)((id % 3).toInt)
          val n = 64
          val payload: Array[Byte] = enc match {
            case 3 =>
              val out = new Array[Byte](2 * n)
              (0 until n).foreach { t =>
                val v = (((id * 37 + t * 13 + ((t.toLong * t) % 251) * 7) % 4096) - 2048).toInt
                out(2 * t) = ((v >> 8) & 0xff).toByte
                out(2 * t + 1) = (v & 0xff).toByte
              }
              out
            case _ =>
              Array.tabulate(n)(t =>
                (((id * 7 + t * 13 + (t.toLong * t) % 31) % 256)).toByte)
          }
          val bytes = graft.pipeline.PcmAudio.auBytes(enc, 8000, 1, payload,
            dataOffset = 24 + (id % 3).toInt * 4)
          graft.pipeline.PcmAudio.auDecode(bytes) match {
            case Some((info, samples)) =>
              samples.zipWithIndex.map { case (v, t) =>
                (id, info.encoding.toLong, t.toLong, v.toLong)
              }.toSeq
            case None => throw new IllegalStateException("au refused")
          }
        }.toDF("media_id", "enc", "t", "sample")
      }): QFn,
      Some("""WITH b AS (SELECT r, t,
            |    (r*7 + t*13 + (t*t)%31) % 256 AS bv,
            |    (r*37 + t*13 + ((t*t)%251)*7) % 4096 - 2048 AS lin
            |  FROM range(24) t0(r), range(64) t1(t)),
            |g AS (SELECT r, t, bv, lin,
            |    255 - bv AS u, xor(bv, 85) AS a FROM b)
            |SELECT r AS media_id,
            |  CAST(CASE r%3 WHEN 0 THEN 1 WHEN 1 THEN 27 ELSE 3 END AS BIGINT) AS enc,
            |  t,
            |  CAST(CASE r%3
            |    WHEN 0 THEN (CASE WHEN u >= 128 THEN -1 ELSE 1 END)
            |      * (((u%16)*8 + 132) * (1 << ((u//16)%8)) - 132)
            |    WHEN 1 THEN (CASE WHEN a >= 128 THEN 1 ELSE -1 END)
            |      * (CASE WHEN (a//16)%8 = 0 THEN (a%16)*16 + 8
            |              ELSE ((a%16)*16 + 264) * (1 << ((a//16)%8 - 1)) END)
            |    ELSE lin END AS BIGINT) AS sample
            |FROM g""".stripMargin)),

    // ------------------------------------------------------------------
    // Metadata blocks beyond STREAMINFO: VORBIS_COMMENT (the format's
    // only little-endian section, incl. non-ASCII UTF-8 values),
    // SEEKTABLE (big-endian 18-byte points), PICTURE (big-endian
    // lengths/dimensions) — the chain walked and parsed for real.
    // ------------------------------------------------------------------
    ("multimodal_flac_tags",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).map { id =>
          val comments =
            Seq("TITLE" -> s"Trâck $id", "ARTIST" -> s"Artist ${id % 5}") ++
              (0L until id % 3).map(k => "GENRE" -> s"genre$k")
          val seeks = (0L to id % 4).map(k => (k * 4096, k * 1000 + id, 4096))
          val pic =
            if (id % 2 == 0)
              Some(Flac.FlacPicture(3, "image/png", s"cover é",
                16 * (id % 7 + 1).toInt, 16 * (id % 5 + 1).toInt, 24, 0,
                (id % 50 + 10).toInt))
            else None
          val blocks =
            Seq(4 -> Flac.vorbisCommentBytes(s"graft-$id", comments),
                3 -> Flac.seekTableBytes(seeks)) ++
              pic.map(p => 6 -> Flac.pictureBytes(p,
                Array.fill(p.dataLen)((id % 251).toByte)))
          val stream = Flac.streamBytesWithMeta(44100, 2, 16, 0L, blocks)
          val tags = Flac.parseTags(stream).get
          val title = tags.comments.find(_._1 == "TITLE").map(_._2).getOrElse("")
          val artist = tags.comments.find(_._1 == "ARTIST").map(_._2).getOrElse("")
          (id, tags.vendor, title, artist, tags.comments.length.toLong,
           tags.seekpoints.length.toLong, tags.seekpoints.last._1,
           tags.seekpoints.last._2,
           tags.picture.map(_ => 1L).getOrElse(0L),
           tags.picture.map(_.mime).getOrElse(""),
           tags.picture.map(_.width.toLong).getOrElse(-1L),
           tags.picture.map(_.height.toLong).getOrElse(-1L),
           tags.picture.map(_.dataLen.toLong).getOrElse(-1L))
        }.toDF("media_id", "vendor", "title", "artist", "n_comments",
               "n_seek", "last_seek_sample", "last_seek_off", "has_pic",
               "pic_mime", "pic_w", "pic_h", "pic_len")
      }): QFn,
      Some("""SELECT r AS media_id,
            |  'graft-' || r AS vendor,
            |  'Tr' || chr(226) || 'ck ' || r AS title,
            |  'Artist ' || (r % 5) AS artist,
            |  CAST(2 + r % 3 AS BIGINT) AS n_comments,
            |  CAST(1 + r % 4 AS BIGINT) AS n_seek,
            |  CAST((r % 4) * 4096 AS BIGINT) AS last_seek_sample,
            |  CAST((r % 4) * 1000 + r AS BIGINT) AS last_seek_off,
            |  CAST(CASE WHEN r % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS has_pic,
            |  CASE WHEN r % 2 = 0 THEN 'image/png' ELSE '' END AS pic_mime,
            |  CAST(CASE WHEN r % 2 = 0 THEN 16 * (r % 7 + 1) ELSE -1 END AS BIGINT) AS pic_w,
            |  CAST(CASE WHEN r % 2 = 0 THEN 16 * (r % 5 + 1) ELSE -1 END AS BIGINT) AS pic_h,
            |  CAST(CASE WHEN r % 2 = 0 THEN r % 50 + 10 ELSE -1 END AS BIGINT) AS pic_len
            |FROM range(24) t(r)""".stripMargin)),

    // ------------------------------------------------------------------
    // WAV LIST/INFO tags (INAM/IART/ICRD/ICMT...): sub-chunk walk with
    // NUL trim and even padding, spliced between fmt and data — sample
    // decode must keep working around the metadata.
    // ------------------------------------------------------------------
    ("multimodal_wav_info",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).map { id =>
          val n = 30
          val payload = new Array[Byte](2 * n)
          (0 until n).foreach { t =>
            val v = ((id * 37 + t * 13) % 4096 - 2048).toInt
            payload(2 * t) = (v & 0xff).toByte
            payload(2 * t + 1) = ((v >> 8) & 0xff).toByte
          }
          val tags = Seq("INAM" -> s"Näme $id", "IART" -> s"Artist ${id % 5}",
            "ICRD" -> (1990 + id % 30).toString) ++
            (if (id % 2 == 0) Seq("ICMT" -> ("c" * (1 + (id % 4)).toInt))
             else Nil)
          val base = graft.pipeline.PcmAudio.wavBytesExt(1, 44100, 1, 16,
            payload)
          val info = graft.pipeline.PcmAudio.wavInfoChunk(tags)
          val out = base.take(36) ++ info ++ base.drop(36)
          val sz = out.length - 8
          out(4) = (sz & 0xff).toByte; out(5) = ((sz >> 8) & 0xff).toByte
          out(6) = ((sz >> 16) & 0xff).toByte; out(7) = ((sz >> 24) & 0xff).toByte
          val parsed = graft.pipeline.PcmAudio.wavInfoTags(out).get
          val samples = graft.pipeline.PcmAudio.wavDecodeExt(out).get._2
          (id, parsed.length.toLong,
           parsed.find(_._1 == "INAM").map(_._2).getOrElse(""),
           parsed.find(_._1 == "IART").map(_._2).getOrElse(""),
           parsed.find(_._1 == "ICRD").map(_._2).getOrElse(""),
           parsed.find(_._1 == "ICMT").map(_._2).getOrElse(""),
           samples.length.toLong, samples.map(math.abs).sum.toLong)
        }.toDF("media_id", "n_tags", "inam", "iart", "icrd", "icmt",
               "n_samples", "sum_abs")
      }): QFn,
      Some("""SELECT r AS media_id,
            |  CAST(3 + CASE WHEN r % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_tags,
            |  'N' || chr(228) || 'me ' || r AS inam,
            |  'Artist ' || (r % 5) AS iart,
            |  CAST(1990 + r % 30 AS VARCHAR) AS icrd,
            |  CASE WHEN r % 2 = 0 THEN repeat('c', 1 + r % 4) ELSE '' END AS icmt,
            |  CAST(30 AS BIGINT) AS n_samples,
            |  CAST((SELECT SUM(ABS((r*37 + t*13) % 4096 - 2048))
            |        FROM range(30) tt(t)) AS BIGINT) AS sum_abs
            |FROM range(24) t(r)""".stripMargin)),

    // ------------------------------------------------------------------
    // AIFF-C: the FVER chunk, COMM compression fourCC + pascal name,
    // 'NONE' (big-endian like AIFF) vs 'sowt' (LITTLE-endian 16-bit —
    // the classic Mac CD-rip artifact); compressed types refuse.
    // ------------------------------------------------------------------
    ("multimodal_aifc_sowt",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        val (nf, nch) = (24, 2)
        s.range(24).flatMap { id =>
          val comp = if (id % 2 == 0) "NONE" else "sowt"
          val pcm = Array.tabulate(nch)(ch => Array.tabulate(nf)(t =>
            (((id * 37 + ch * 101 + t * 263) % 4000) - 2000).toInt))
          val bytes = graft.pipeline.PcmAudio.aiffBytes(22050, nch, 16, pcm,
            compression = comp)
          val (info, out) = graft.pipeline.PcmAudio.aiffDecode(bytes).get
          require(info.nFrames == nf)
          for { ch <- 0 until nch; t <- 0 until nf }
            yield (id, comp, ch.toLong, t.toLong, out(ch)(t).toLong)
        }.toDF("media_id", "compression", "ch", "t", "sample")
      }): QFn,
      Some("""SELECT r AS media_id,
            |  CASE WHEN r % 2 = 0 THEN 'NONE' ELSE 'sowt' END AS compression,
            |  c AS ch, t,
            |  CAST((r*37 + c*101 + t*263) % 4000 - 2000 AS BIGINT) AS sample
            |FROM range(24) t0(r), range(2) t1(c), range(24) t2(t)""".stripMargin)),

    // ------------------------------------------------------------------
    // N-Triples (W3C RDF 1.1): IRIs, blank nodes, plain/langtag/typed
    // literals with the full escape family, comment and blank lines,
    // and malformed lines REPORTED with an error class — corpus hygiene
    // as a measurable column, the KG-interchange ingest next to the
    // reference's integer TSV.
    // ------------------------------------------------------------------
    ("text_ntriples_parse",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(40).map { i =>
          val line = (i % 8) match {
            case 0 => s"<http://ex/s$i> <http://ex/p> <http://ex/o${i % 7}> ."
            case 1 => s"""_:b$i <http://ex/p> "lit $i" ."""
            case 2 => s"""<http://ex/s$i> <http://ex/p> "v$i"@en-US ."""
            case 3 => s"""<http://ex/s$i> <http://ex/p> "$i"^^<http://www.w3.org/2001/XMLSchema#integer> ."""
            case 4 => s"""<http://ex/s$i> <http://ex/p> "tab\\there \\"q\\" u\\u00e9" ."""
            case 5 => s"# comment $i"
            case 6 => ""
            case 7 => s"<http://ex/s$i <p> ."
          }
          graft.pipeline.NTriples.parseLine(line) match {
            case Right(Some(t)) =>
              (i, "triple", t.subject.kind, t.subject.value, t.predicate.value,
               t.obj.kind, t.obj.value, t.obj.lang)
            case Right(None) => (i, "none", "", "", "", "", "", "")
            case Left(err)   => (i, "err:" + err, "", "", "", "", "", "")
          }
        }.toDF("line_id", "status", "s_kind", "s_val", "p_val",
               "o_kind", "o_val", "o_lang")
      }): QFn,
      Some("""SELECT r AS line_id,
            |  CASE r%8 WHEN 5 THEN 'none' WHEN 6 THEN 'none'
            |       WHEN 7 THEN 'err:bad-iri-char' ELSE 'triple' END AS status,
            |  CASE WHEN r%8 IN (5,6,7) THEN ''
            |       WHEN r%8 = 1 THEN 'blank' ELSE 'iri' END AS s_kind,
            |  CASE WHEN r%8 IN (5,6,7) THEN ''
            |       WHEN r%8 = 1 THEN 'b' || r ELSE 'http://ex/s' || r END AS s_val,
            |  CASE WHEN r%8 IN (5,6,7) THEN '' ELSE 'http://ex/p' END AS p_val,
            |  CASE r%8 WHEN 0 THEN 'iri' WHEN 5 THEN '' WHEN 6 THEN ''
            |       WHEN 7 THEN '' ELSE 'literal' END AS o_kind,
            |  CASE r%8 WHEN 0 THEN 'http://ex/o' || (r%7)
            |       WHEN 1 THEN 'lit ' || r WHEN 2 THEN 'v' || r
            |       WHEN 3 THEN CAST(r AS VARCHAR)
            |       WHEN 4 THEN 'tab' || chr(9) || 'here "q" u' || chr(233)
            |       ELSE '' END AS o_val,
            |  CASE r%8 WHEN 2 THEN '@en-US'
            |       WHEN 3 THEN '^^http://www.w3.org/2001/XMLSchema#integer'
            |       ELSE '' END AS o_lang
            |FROM range(40) t(r)""".stripMargin)),

    // ------------------------------------------------------------------
    // Extended WAV (the non-canonical real world): 24-bit PCM, IEEE
    // float32, A-law/mu-law format codes, WAVE_FORMAT_EXTENSIBLE with
    // the SubFormat GUID, and a proper chunk walk past LIST chunks
    // with odd-length padding. Float fixtures are dyadic => per-sample
    // DOUBLE equality is exact.
    // ------------------------------------------------------------------
    ("multimodal_wav_ext",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        val n = 40
        s.range(24).flatMap { id =>
          val sel = (id % 5).toInt
          val (fmtCode, bits, ext, payload) = sel match {
            case 0 =>
              val p = new Array[Byte](3 * n)
              (0 until n).foreach { t =>
                val v = ((id * 1000 + t * 777) * 9 - 4000000).toInt
                p(3 * t) = (v & 0xff).toByte
                p(3 * t + 1) = ((v >> 8) & 0xff).toByte
                p(3 * t + 2) = ((v >> 16) & 0xff).toByte
              }
              (1, 24, false, p)
            case 1 =>
              val p = new Array[Byte](4 * n)
              (0 until n).foreach { t =>
                val b = java.lang.Float.floatToIntBits(
                  ((id * 16 + t).toFloat / 256.0f) - 1.5f)
                p(4 * t) = (b & 0xff).toByte
                p(4 * t + 1) = ((b >> 8) & 0xff).toByte
                p(4 * t + 2) = ((b >> 16) & 0xff).toByte
                p(4 * t + 3) = ((b >> 24) & 0xff).toByte
              }
              (3, 32, false, p)
            case 2 =>
              (6, 8, false,
               Array.tabulate(n)(t => ((id * 7 + t * 13) % 256).toByte))
            case 3 =>
              (7, 8, false,
               Array.tabulate(n)(t => ((id * 7 + t * 13) % 256).toByte))
            case 4 =>
              val p = new Array[Byte](2 * n)
              (0 until n).foreach { t =>
                val v = ((id * 37 + t * 13) % 4096 - 2048).toInt
                p(2 * t) = (v & 0xff).toByte
                p(2 * t + 1) = ((v >> 8) & 0xff).toByte
              }
              (1, 16, true, p)
          }
          val bytes = graft.pipeline.PcmAudio.wavBytesExt(fmtCode, 44100, 1,
            bits, payload, extensible = ext, extraChunk = (id % 3).toInt * 7)
          graft.pipeline.PcmAudio.wavDecodeExt(bytes) match {
            case Some((info, samples)) =>
              require(info.fmtCode == fmtCode && info.extensible == ext)
              samples.zipWithIndex.map { case (v, t) =>
                (id, fmtCode.toLong, if (ext) 1L else 0L, t.toLong, v)
              }.toSeq
            case None => throw new IllegalStateException("wav refused")
          }
        }.toDF("media_id", "fmt", "extensible", "t", "v")
      }): QFn,
      Some("""WITH b AS (SELECT r, t, (r*7 + t*13) % 256 AS bv
            |  FROM range(24) t0(r), range(40) t1(t)),
            |g AS (SELECT r, t, bv, 255 - bv AS u, xor(bv, 85) AS a FROM b)
            |SELECT r AS media_id,
            |  CAST(CASE r%5 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 6
            |       WHEN 3 THEN 7 ELSE 1 END AS BIGINT) AS fmt,
            |  CAST(CASE WHEN r%5 = 4 THEN 1 ELSE 0 END AS BIGINT) AS extensible,
            |  t,
            |  CAST(CASE r%5
            |    WHEN 0 THEN (r*1000 + t*777) * 9 - 4000000
            |    WHEN 1 THEN (r*16 + t) / 256.0 - 1.5
            |    WHEN 2 THEN (CASE WHEN a >= 128 THEN 1 ELSE -1 END)
            |      * (CASE WHEN (a//16)%8 = 0 THEN (a%16)*16 + 8
            |              ELSE ((a%16)*16 + 264) * (1 << ((a//16)%8 - 1)) END)
            |    WHEN 3 THEN (CASE WHEN u >= 128 THEN -1 ELSE 1 END)
            |      * (((u%16)*8 + 132) * (1 << ((u//16)%8)) - 132)
            |    ELSE (r*37 + t*13) % 4096 - 2048 END AS DOUBLE) AS v
            |FROM g""".stripMargin)),

    // ------------------------------------------------------------------
    // Ogg comment packets: OpusTags and the Vorbis type-3 header
    // (framing bit verified) around the shared little-endian comment
    // structure, reassembled from CRC-verified pages.
    // ------------------------------------------------------------------
    ("multimodal_ogg_tags",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).map { id =>
          val codec = if (id % 2 == 0) "opus" else "vorbis"
          val comments =
            Seq("TITLE" -> s"Sông $id", "ARTIST" -> s"Artist ${id % 5}") ++
              (0L until id % 3).map(k => "GENRE" -> s"g$k")
          val bytes = graft.pipeline.Multimodal.oggBytes(codec, 2, 48000,
            312, 2, 960, oggVendor = s"graft-$id", oggComments = comments)
          val (c, vendor, parsed) =
            graft.pipeline.Multimodal.oggTags(bytes).get
          (id, c, vendor, parsed.length.toLong,
           parsed.find(_._1 == "TITLE").map(_._2).getOrElse(""),
           parsed.find(_._1 == "ARTIST").map(_._2).getOrElse(""))
        }.toDF("media_id", "codec", "vendor", "n_comments", "title", "artist")
      }): QFn,
      Some("""SELECT r AS media_id,
            |  CASE WHEN r % 2 = 0 THEN 'opus' ELSE 'vorbis' END AS codec,
            |  'graft-' || r AS vendor,
            |  CAST(2 + r % 3 AS BIGINT) AS n_comments,
            |  'S' || chr(244) || 'ng ' || r AS title,
            |  'Artist ' || (r % 5) AS artist
            |FROM range(24) t(r)""".stripMargin)),

    // ------------------------------------------------------------------
    // BI_RLE4 BMP (the nibble RLE next to the RLE8 row): encoded-mode
    // runs whose data byte's two nibbles ALTERNATE across the run,
    // absolute chunks of packed nibbles with WORD pads; plateau pixels
    // exercise runs, odd storage rows go through absolute mode.
    // ------------------------------------------------------------------
    ("multimodal_bmp_rle4",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        val (w, h) = (24, 10)
        s.range(48).map { id =>
          val pixels = Array.tabulate(w * h)(i =>
            ((id * 5 + (i / 4).toLong * 3) % 16).toByte)
          val st = graft.pipeline.Multimodal.bmpRle4Stats(
            graft.pipeline.Multimodal.bmpBytesRle4(w, h, pixels))
          val (meta, n, sums, sqs) = st.get
          (id, meta.width.toLong, meta.height.toLong, meta.channels.toLong,
           n, math.floor(sums(0) / n * 1e6 + 0.5) / 1e6, // half-away, as
           math.floor(sqs(0) / n * 1e6 + 0.5) / 1e6)     // DuckDB ROUND does
        }.toDF("media_id", "width", "height", "channels", "n_pixels",
               "mean_r", "msq_r")
      }): QFn,
      Some("""WITH px AS (SELECT r AS media_id, generate_series(0, 239) AS ps
            |  FROM range(48) t(r))
            |SELECT media_id,
            |  CAST(24 AS BIGINT) AS width, CAST(10 AS BIGINT) AS height,
            |  CAST(3 AS BIGINT) AS channels, CAST(240 AS BIGINT) AS n_pixels,
            |  ROUND(list_sum(list_transform(ps,
            |    p -> ((media_id * 5 + (p // 4) * 3) % 16) * 17 / 255.0)) / 240, 6)
            |    AS mean_r,
            |  ROUND(list_sum(list_transform(ps,
            |    p -> pow(((media_id * 5 + (p // 4) * 3) % 16) * 17 / 255.0, 2))) / 240, 6)
            |    AS msq_r
            |FROM px""".stripMargin)),

    // ------------------------------------------------------------------
    // Sub-byte PNG depths (1/2/4 — document scans and icons): MSB-first
    // bit packing with zero pad bits in the partial trailing byte
    // (w = 13 is deliberately non-byte-aligned), all five filters over
    // PACKED bytes at bpp = 1, gray levels scaled by the exact integer
    // 255/(2^d − 1).
    // ------------------------------------------------------------------
    ("multimodal_png_depth124",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        val (w, h) = (13, 8)
        s.range(24).flatMap { id =>
          val d = Array(1, 2, 4)((id % 3).toInt)
          val m = 1 << d
          val samples = Array.tabulate(w * h) { i =>
            val x = i % w; val y = i / w
            ((id * 3 + x * 5 + y * 7) % m).toInt
          }
          val bytes = graft.pipeline.PngDepths.pngBytesSubByte(
            w, h, d, samples, filterOf = r => ((id + r) % 5).toInt)
          graft.pipeline.PngDepths.pngSubByteDecode(bytes) match {
            case Some((info, out)) =>
              require(info.depth == d && info.colorType == 0)
              for (y <- 0 until h; x <- 0 until w) yield
                (id, x.toLong, y.toLong, out(y * w + x).toLong,
                 (out(y * w + x) * (255 / (m - 1))).toLong)
            case None => throw new IllegalStateException("png refused")
          }
        }.toDF("media_id", "x", "y", "v", "gray8")
      }): QFn,
      Some("""SELECT r AS media_id, x, y,
            |  CAST((r*3 + x*5 + y*7) %
            |    (CASE r%3 WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 16 END) AS BIGINT) AS v,
            |  CAST(((r*3 + x*5 + y*7) %
            |     (CASE r%3 WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 16 END))
            |    * (CASE r%3 WHEN 0 THEN 255 WHEN 1 THEN 85 ELSE 17 END)
            |    AS BIGINT) AS gray8
            |FROM range(24) t0(r), range(13) t1(x), range(8) t2(y)""".stripMargin)),

    ("multimodal_png_pal_subbyte",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        val (w, h) = (13, 8)
        s.range(24).flatMap { id =>
          val d = Array(2, 4)((id % 2).toInt)
          val m = 1 << d
          val pal = Array.tabulate(m)(i =>
            (((i * 37 + id.toInt) % 256) << 16) | (((i * 59) % 256) << 8) |
              ((i * 83 + 7) % 256))
          val samples = Array.tabulate(w * h) { i =>
            val x = i % w; val y = i / w
            ((id + x * 3 + y * 5) % m).toInt
          }
          val bytes = graft.pipeline.PngDepths.pngBytesSubByte(
            w, h, d, samples, palette = Some(pal),
            filterOf = r => ((id + r + 2) % 5).toInt)
          graft.pipeline.PngDepths.pngSubByteDecode(bytes) match {
            case Some((info, out)) =>
              require(info.colorType == 3 && info.palette.length == m)
              for (y <- 0 until h; x <- 0 until w) yield {
                val idx = out(y * w + x)
                val rgb = info.palette(idx)
                (id, x.toLong, y.toLong, idx.toLong,
                 ((rgb >> 16) & 0xff).toLong, ((rgb >> 8) & 0xff).toLong,
                 (rgb & 0xff).toLong)
              }
            case None => throw new IllegalStateException("png refused")
          }
        }.toDF("media_id", "x", "y", "idx", "pr", "pg", "pb")
      }): QFn,
      Some("""WITH px AS (SELECT r, x, y,
            |    (r + x*3 + y*5) % (CASE r%2 WHEN 0 THEN 4 ELSE 16 END) AS idx
            |  FROM range(24) t0(r), range(13) t1(x), range(8) t2(y))
            |SELECT r AS media_id, x, y, CAST(idx AS BIGINT) AS idx,
            |  CAST((idx*37 + r) % 256 AS BIGINT) AS pr,
            |  CAST((idx*59) % 256 AS BIGINT) AS pg,
            |  CAST((idx*83 + 7) % 256 AS BIGINT) AS pb
            |FROM px""".stripMargin)),

    // ------------------------------------------------------------------
    // ID3v1 / ID3v1.1 trailers: the fixed 128-byte end tag (v1.1 track
    // detection via the zero byte at offset 125), fields unpadded; the
    // MP3 frames before the trailer must still decode.
    // ------------------------------------------------------------------
    ("multimodal_id3v1",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).map { id =>
          val v11 = id % 2 == 0
          val tag = graft.pipeline.PcmAudio.Id3v1(
            s"Title $id", s"Artist ${id % 5}", s"Album ${id % 3}",
            (1990 + id % 30).toString, s"c$id",
            if (v11) (id % 20 + 1).toInt else 0, (id % 80).toInt)
          val stream = graft.pipeline.Multimodal.layer3Bytes(id, 2) ++
            graft.pipeline.PcmAudio.id3v1Bytes(tag)
          val p = graft.pipeline.PcmAudio.id3v1Parse(stream).get
          val nFrames = graft.pipeline.Multimodal.layer3Decode(stream)
            .map(_._2.map(_.frame).distinct.length.toLong).getOrElse(-1L)
          (id, p.title, p.artist, p.album, p.year, p.comment,
           p.track.toLong, p.genre.toLong, nFrames)
        }.toDF("media_id", "title", "artist", "album", "year", "comment",
               "track", "genre", "n_frames")
      }): QFn,
      Some("""SELECT r AS media_id,
            |  'Title ' || r AS title, 'Artist ' || (r % 5) AS artist,
            |  'Album ' || (r % 3) AS album,
            |  CAST(1990 + r % 30 AS VARCHAR) AS year,
            |  'c' || r AS comment,
            |  CAST(CASE WHEN r % 2 = 0 THEN r % 20 + 1 ELSE 0 END AS BIGINT)
            |    AS track,
            |  CAST(r % 80 AS BIGINT) AS genre,
            |  CAST(2 AS BIGINT) AS n_frames
            |FROM range(24) t(r)""".stripMargin)),

    // ------------------------------------------------------------------
    // binaryFile source ingest: the standard Spark pattern for media
    // corpora at scale — one file per media object, read as
    // (path, length, content), routed through the dispatcher. The sink
    // dir is md5-keyed on the data dir; modificationTime is excluded
    // (nondeterministic by nature).
    // ------------------------------------------------------------------
    ("pipeline_binaryfile_ingest",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        val key = java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        val root = new java.io.File(s"/tmp/graft_binmedia_$key")
        root.mkdirs()
        // clear stale members so a fixture change never leaves extras
        Option(root.listFiles).foreach(_.foreach(_.delete()))
        (0 until 18).foreach { i =>
          val (ext, bytes) = (i % 3) match {
            case 0 => ("wav", graft.pipeline.Multimodal.wavBytes(
              44100, 1, 16, new Array[Byte](2 * (40 + i))))
            case 1 =>
              val frame = Flac.frameBytes(
                Array(Array.tabulate(48)(t => base(i, 0, 0, t))), 0, 16,
                44100, FrameHeaderPlan(6, 9, 4, 0, 0),
                Array(ChannelPlan(PlanFixed(2), 0, ResidualPlan(0, 0))))
              ("flac", Flac.streamBytes(44100, 1, 16, 48L, Seq(frame)))
            case 2 => ("au", graft.pipeline.PcmAudio.auBytes(27, 8000, 1,
              Array.tabulate(30 + i)(t => ((i * 3 + t) % 256).toByte)))
          }
          val f = new java.io.FileOutputStream(
            new java.io.File(root, f"media_$i%03d.$ext"))
          f.write(bytes); f.close()
        }
        s.read.format("binaryFile").load(root.getAbsolutePath)
          .select(
            element_at(split(col("path"), "/"), -1).as("name"),
            col("length"), col("content"))
          .as[(String, Long, Array[Byte])]
          .map { case (name, len, content) =>
            // FLAC stream length depends on the Rice coding — not a
            // closed form; the wav/au headers make length exact.
            val lenOut = if (name.endsWith(".flac")) -1L else len
            AudioDispatch.dispatch(content) match {
              case Right((fmt, rate, _, units)) => (name, lenOut, fmt, units)
              case Left(e) => (name, lenOut, "refused:" + e, -1L)
            }
          }.toDF("name", "length", "format", "units")
      }): QFn,
      Some("""SELECT 'media_' || lpad(CAST(r AS VARCHAR), 3, '0') || '.' ||
            |    (CASE r%3 WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' ELSE 'au' END)
            |    AS name,
            |  CAST(CASE r%3 WHEN 0 THEN 44 + 2*(40 + r)
            |       WHEN 2 THEN 24 + 30 + r ELSE -1 END AS BIGINT) AS length,
            |  CASE r%3 WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' ELSE 'au' END
            |    AS format,
            |  CAST(CASE r%3 WHEN 0 THEN 40 + r WHEN 1 THEN 1
            |       ELSE 30 + r END AS BIGINT) AS units
            |FROM range(18) t(r)""".stripMargin)),

    // ------------------------------------------------------------------
    // G.711 as a NATIVE SQL function: the codegen expression
    // g711_expand(payload [, law]) over a binary column — the
    // whole-stage-codegen path for telephony-corpus PCM, no UDF, no
    // per-row decoder object; the oracle replays the segmented
    // arithmetic per byte.
    // ------------------------------------------------------------------
    ("multimodal_g711_sql",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        graft.functions.ArrayKernels.register(s)
        val df = s.range(24).map { id =>
          (id, Array.tabulate(48)(t =>
            ((id * 11 + t * 7 + (t.toLong * t) % 53) % 256).toByte))
        }.toDF("media_id", "payload")
        val mu = df.selectExpr("media_id", "'mulaw' AS law",
          "posexplode(g711_expand(payload)) AS (t, sample)")
        val al = df.selectExpr("media_id", "'alaw' AS law",
          "posexplode(g711_expand(payload, 'alaw')) AS (t, sample)")
        mu.unionByName(al)
          .select(col("media_id"), col("law"),
            col("t").cast("long").as("t"),
            col("sample").cast("long").as("sample"))
      }): QFn,
      Some("""WITH b AS (SELECT r, t, (r*11 + t*7 + (t*t)%53) % 256 AS bv
            |  FROM range(24) t0(r), range(48) t1(t)),
            |g AS (SELECT r, t, 255 - bv AS u, xor(bv, 85) AS a FROM b)
            |SELECT r AS media_id, 'mulaw' AS law, t,
            |  CAST((CASE WHEN u >= 128 THEN -1 ELSE 1 END)
            |    * (((u%16)*8 + 132) * (1 << ((u//16)%8)) - 132) AS BIGINT) AS sample
            |FROM g
            |UNION ALL
            |SELECT r, 'alaw', t,
            |  CAST((CASE WHEN a >= 128 THEN 1 ELSE -1 END)
            |    * (CASE WHEN (a//16)%8 = 0 THEN (a%16)*16 + 8
            |            ELSE ((a%16)*16 + 264) * (1 << ((a//16)%8 - 1)) END) AS BIGINT)
            |FROM g""".stripMargin)),

    // ------------------------------------------------------------------
    // REAL TIFF raster decode: strip organization (multi-strip with a
    // short final strip vs single-strip inline tags), both byte orders,
    // gray and RGB, inline-vs-offset IFD value encoding; uncompressed
    // strips must tile the image exactly.
    // ------------------------------------------------------------------
    ("multimodal_tiff_decode",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        val (w, h) = (12, 8)
        s.range(24).flatMap { id =>
          val spp = if (id % 2 == 0) 1 else 3
          val n = w * h * spp
          val px = Array.tabulate(n)(i =>
            ((id * 7 + i * 3 + (i.toLong * i) % 97) % 256).toByte)
          val bytes = graft.pipeline.TiffRaster.tiffRasterBytes(
            w, h, spp, px, rowsPerStrip = Array(3, 4, 10)((id % 3).toInt),
            packBits = false, littleEndian = id % 4 < 2)
          graft.pipeline.TiffRaster.tiffRasterDecode(bytes) match {
            case Some((info, out)) =>
              require(info.width == w && info.height == h && info.spp == spp)
              out.zipWithIndex.map { case (v, i) =>
                (id, i.toLong, (v & 0xff).toLong)
              }.toSeq
            case None => throw new IllegalStateException("tiff refused")
          }
        }.toDF("media_id", "i", "v")
      }): QFn,
      Some("""SELECT r AS media_id, i,
            |  CAST((r*7 + i*3 + (i*i)%97) % 256 AS BIGINT) AS v
            |FROM range(24) t0(r), range(288) t1(i)
            |WHERE i < CASE WHEN r%2 = 0 THEN 96 ELSE 288 END""".stripMargin)),

    // ------------------------------------------------------------------
    // REAL TIFF PackBits strips (Compression 32773): run packets,
    // literal packets, run/literal interleave from a plateau formula;
    // decode must produce exactly the strip's expected byte count.
    // ------------------------------------------------------------------
    ("multimodal_tiff_packbits",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        val (w, h) = (12, 8)
        s.range(24).flatMap { id =>
          val spp = if (id % 2 == 0) 1 else 3
          val n = w * h * spp
          val px = Array.tabulate(n) { i =>
            (if (i % 31 < 3) (i * 11 + id) % 256
             else ((i / 5) * 13 + id * 7) % 256).toByte
          }
          val bytes = graft.pipeline.TiffRaster.tiffRasterBytes(
            w, h, spp, px, rowsPerStrip = Array(3, 4, 10)((id % 3).toInt),
            packBits = true, littleEndian = id % 4 >= 2)
          graft.pipeline.TiffRaster.tiffRasterDecode(bytes) match {
            case Some((info, out)) =>
              require(info.compression == 32773)
              out.zipWithIndex.map { case (v, i) =>
                (id, i.toLong, (v & 0xff).toLong)
              }.toSeq
            case None => throw new IllegalStateException("tiff refused")
          }
        }.toDF("media_id", "i", "v")
      }): QFn,
      Some("""SELECT r AS media_id, i,
            |  CAST(CASE WHEN i % 31 < 3 THEN (i*11 + r) % 256
            |       ELSE ((i//5)*13 + r*7) % 256 END AS BIGINT) AS v
            |FROM range(24) t0(r), range(288) t1(i)
            |WHERE i < CASE WHEN r%2 = 0 THEN 96 ELSE 288 END""".stripMargin)),

    // ------------------------------------------------------------------
    // COMPOSED audio-corpus ingest: tar shards (the WebDataset layout)
    // holding six audio formats -> real ustar walk -> magic-byte
    // dispatch -> per-member routed decode, one DataFrame chain; the
    // oracle regenerates every member's identity from the closed form.
    // ------------------------------------------------------------------
    ("pipeline_audio_ingest",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(8).flatMap { sid =>
          val members = (0 until 6).map { k =>
            val id = sid * 6 + k
            val (ext, bytes) = (k: @unchecked) match {
              case 0 => ("wav", graft.pipeline.Multimodal.wavBytes(
                44100, 1, 16, new Array[Byte](120)))
              case 1 =>
                val frame = Flac.frameBytes(
                  Array(Array.tabulate(48)(t => base(id, 0, 0, t))), 0, 16,
                  44100, FrameHeaderPlan(6, 9, 4, 0, 0),
                  Array(ChannelPlan(PlanFixed(2), 0, ResidualPlan(0, 0))))
                ("flac", Flac.streamBytes(44100, 1, 16, 48L, Seq(frame)))
              case 2 => ("mp3", graft.pipeline.Multimodal.layer3Bytes(id, 2))
              case 3 => ("aac", graft.pipeline.Aac.aacLcBytes(id, 2, "long"))
              case 4 => ("au", graft.pipeline.PcmAudio.auBytes(1, 8000, 1,
                Array.tabulate(40)(t => ((id * 7 + t) % 256).toByte)))
              case 5 => ("aiff", graft.pipeline.PcmAudio.aiffBytes(22050, 1,
                16, Array(Array.tabulate(20)(t => (t * 9 + id.toInt) % 500))))
            }
            (s"m$id.$ext", bytes)
          }
          val tar = graft.pipeline.Multimodal.tarBytes(members)
          graft.pipeline.Multimodal.tarEntries(tar).map { case (nm, b) =>
            AudioDispatch.dispatch(b, allowSyntheticAac = true) match {
              case Right((fmt, rate, _, units)) =>
                (sid, nm, fmt, rate.toLong, units)
              case Left(e) => (sid, nm, "refused:" + e, -1L, -1L)
            }
          }
        }.toDF("shard_id", "name", "format", "sample_rate", "units")
      }): QFn,
      Some("""SELECT r AS shard_id,
            |  'm' || (r*6 + k) || '.' ||
            |    (CASE k WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' WHEN 2 THEN 'mp3'
            |            WHEN 3 THEN 'aac' WHEN 4 THEN 'au' ELSE 'aiff' END) AS name,
            |  CASE k WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' WHEN 2 THEN 'mp3'
            |       WHEN 3 THEN 'aac' WHEN 4 THEN 'au' ELSE 'aiff' END AS format,
            |  CAST(CASE k WHEN 0 THEN 44100 WHEN 1 THEN 44100 WHEN 2 THEN 48000
            |       WHEN 3 THEN 48000 WHEN 4 THEN 8000 ELSE 22050 END AS BIGINT)
            |    AS sample_rate,
            |  CAST(CASE k WHEN 0 THEN 60 WHEN 1 THEN 1 WHEN 2 THEN 2
            |       WHEN 3 THEN 2 WHEN 4 THEN 40 ELSE 20 END AS BIGINT) AS units
            |FROM range(8) t0(r), range(6) t1(k)""".stripMargin)),

    // ------------------------------------------------------------------
    // Corruption refusal: pristine streams decode; a flipped strategy
    // bit refuses at CRC-8, a flipped CRC-16 bit refuses at CRC-16, a
    // broken sync byte refuses at sync — never a silently-wrong PCM.
    // ------------------------------------------------------------------
    ("multimodal_flac_crc",
      ((s: SparkSession, dir: String) => {
        import s.implicits._
        s.range(24).map { id =>
          val bs = 48
          val frames = (0L to 1L).map { f =>
            Flac.frameBytes(
              Array(Array.tabulate(bs)(t => base(id, f, 0, t))), 0, 16, 44100,
              FrameHeaderPlan(6, 9, 4, 0, f),
              Array(ChannelPlan(PlanFixed(2), 0, ResidualPlan(0, 0))))
          }
          val stream = Flac.streamBytes(44100, 1, 16, 2L * bs, frames)
          val frameStart = stream.length - frames.map(_.length).sum
          val mutated = stream.clone
          (id % 4) match {
            case 0 => ()
            case 1 => // strategy-bit flip: header parses, CRC-8 refuses
              mutated(frameStart + 1) = (mutated(frameStart + 1) ^ 0x01).toByte
            case 2 => // last CRC-16 byte flip
              mutated(mutated.length - 1) =
                (mutated(mutated.length - 1) ^ 0x01).toByte
            case 3 => // sync break
              mutated(frameStart) = (mutated(frameStart) ^ 0x80).toByte
          }
          Flac.decode(mutated) match {
            case Right(fs) => (id, 1L, "", fs.length.toLong)
            case Left(err) => (id, 0L, err, 0L)
          }
        }.toDF("media_id", "ok", "err", "n_frames")
      }): QFn,
      Some("""SELECT r AS media_id,
            |  CAST(CASE WHEN r%4 = 0 THEN 1 ELSE 0 END AS BIGINT) AS ok,
            |  CASE r%4 WHEN 0 THEN '' WHEN 1 THEN 'crc8' WHEN 2 THEN 'crc16'
            |       ELSE 'sync' END AS err,
            |  CAST(CASE WHEN r%4 = 0 THEN 2 ELSE 0 END AS BIGINT) AS n_frames
            |FROM range(24) t(r)""".stripMargin))
  )
}
