package graft

import org.apache.spark.sql.functions.col

import graft.pipeline.Aac

/** One-off probe (PLANS.md round 17): the multimodal DECODE family's
  * scale shape measured — media decode is a pure per-row map
  * (Dataset.flatMap, no shuffle, no driver state), so corpus cost must
  * be linear in media count and the 100 TB path is "add executors".
  * Two measurements over synthetic AAC streams (the round-17 chain —
  * the heaviest per-row decode in the family):
  *
  *   1. media-count decade 3k → 30k at fixed parallelism — expect
  *      exponent ~1 (per-row work, nothing superlinear hiding in the
  *      chain: no cross-media state, no driver collection);
  *   2. the same 30k at 4× the partitions — expect near-flat wall time
  *      per core (the parallelism control: work divides).
  *
  * Streams vary per media id (mode cycles long/short/cycle/tns/pns so
  * the probe exercises the whole decode surface, 2 frames each). */
object ScratchAacProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .appName("graft-aac-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val modes = Array("long", "short", "cycle", "tns", "pns")
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(n: Int, parts: Int): Double = {
      val t = time {
        val total = spark.range(n).repartition(parts).flatMap { id =>
          val mode = modes((id % modes.length).toInt)
          val nf = if (mode == "cycle") 4 else 2
          Aac.aacLcDecode(Aac.aacLcBytes(id, nf, mode),
              allowSyntheticBooks = true,
              allowSyntheticGeometry = true)
            .map(_._3.map(_.sMsq).sum).toSeq
        }.reduce(_ + _)
        require(total > 0.0)
      }
      println(f"POINT17 aac_decode n=$n%6d parts=$parts%3d t=$t%7.2fs " +
        f"rate=${n / t}%8.1f media/s")
      t
    }

    run(300, 16) // warm-up: JIT + codegen, discarded
    val t3k = run(3000, 16)
    val t30k = run(30000, 16)
    val t30kWide = run(30000, 64)
    val exp = math.log(t30k / t3k) / math.log(10.0)
    println(f"DECADE17 aac_decode exponent=$exp%5.2f " +
      f"wide64_ratio=${t30kWide / t30k}%5.2f")
    spark.stop()
  }
}
