package graft

import graft.pipeline.Flac
import graft.pipeline.Flac._

/** One-off probe (PLANS.md round 17, continuation): the FLAC decode
  * path's scale shape, mirroring ScratchAacProbe — decode is a pure
  * per-row map (Dataset.flatMap, no shuffle, no driver state), so
  * corpus cost must be linear in media count and work must divide
  * across partitions. Streams vary per media id across the stereo
  * modes, subframe types, and residual methods (4 frames × 2 ch ×
  * 192 samples each — a real multi-KB stream per row). */
object ScratchFlacProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .appName("graft-flac-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def mkStream(id: Long): Array[Byte] = {
      val bs = 192
      val frames = (0L until 4L).map { f =>
        val chAssign = Array(1, 8, 9, 10)(((id + f) % 4).toInt)
        val pcm = Array.tabulate(2)(ch => Array.tabulate(bs)(t =>
          (id * 37 + f * 59 + ch * 101 + t * 13 + ((t.toLong * t) % 251) * 7) % 200 - 100))
        val plans = Array.tabulate(2) { ch =>
          val sub: SubPlan = (((id + f + ch) % 3).toInt: @unchecked) match {
            case 0 => PlanVerbatim
            case 1 => PlanFixed(((id + ch) % 5).toInt)
            case 2 =>
              val o = 2 + ((id + ch) % 4).toInt
              PlanLpc(o, 6, 3, Array.tabulate(o)(j => (j * 5 - 7).toLong))
          }
          ChannelPlan(sub, 0, ResidualPlan(((id + f) % 2).toInt,
            ((id + ch) % 3).toInt, p => (p + id) % 4 == 0))
        }
        Flac.frameBytes(pcm, chAssign, 16, 44100,
          FrameHeaderPlan(1, 9, 4, 0, f), plans)
      }
      Flac.streamBytes(44100, 2, 16, 4L * bs, frames)
    }
    def run(n: Int, parts: Int): Double = {
      val t = time {
        val total = spark.range(n).repartition(parts).map { id =>
          Flac.decode(mkStream(id)) match {
            case Right(fs) => fs.map(_.samples(0).sum).sum
            case Left(err) => throw new IllegalStateException(err)
          }
        }.reduce(_ + _)
        require(total != Long.MaxValue)
      }
      println(f"POINT17 flac_decode n=$n%6d parts=$parts%3d t=$t%7.2fs " +
        f"rate=${n / t}%8.1f media/s")
      t
    }

    run(300, 16) // warm-up: JIT + codegen, discarded
    val t3k = run(3000, 16)
    val t30k = run(30000, 16)
    val t30kWide = run(30000, 64)
    val exp = math.log(t30k / t3k) / math.log(10.0)
    println(f"DECADE17 flac_decode exponent=$exp%5.2f " +
      f"wide64_ratio=${t30kWide / t30k}%5.2f")
    spark.stop()
  }
}
