package graft

import org.apache.spark.sql.functions._

/** One-off probe (PLANS.md, round 10): the full real-decode feature
  * extraction (decodeFeatures routing BMP pixels, MPEG-1 Layer I/II
  * subbands, MP3 frequency lines, MPEG-1 I-frame video through their
  * REAL decoders) at n and 10n media blobs. The op is a partition-local
  * mapPartitions with zero shuffles, so wall time should track the
  * decode work linearly with no super-linear term. */
object ScratchCodecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.pipeline.Multimodal
    for (n <- Seq(800, 8000)) {
      val media = spark.range(n).map { id =>
        val k = id % 4
        val payload: Array[Byte] =
          if (k == 0) Multimodal.bmpBytes(16, 16,
            Array.fill(16 * 16 * 3)((id % 251).toByte))
          else if (k == 1) Multimodal.layer2Bytes(id, 2)
          else if (k == 2) Multimodal.layer3Bytes(id, 2)
          else Multimodal.mpeg1IFrameBytes(id, nPictures = 2)
        Multimodal.MediaRow(id, if (k == 0) "image"
          else if (k == 3) "video" else "audio", payload, -1, -1, -1)
      }.localCheckpoint(true) // isolate decode cost from fixture synthesis
      val t0 = System.nanoTime()
      val agg = Multimodal.decodeFeatures(media).toDF()
        .agg(sum(element_at(col("features"), 1))).head().getDouble(0)
      println(f"PROBE codecs n=$n%6d " +
        f"time=${(System.nanoTime() - t0) / 1e9}%6.2fs f0sum=$agg%12.4f")
    }
  }
}
