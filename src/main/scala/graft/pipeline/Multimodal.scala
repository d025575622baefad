package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, plus decode / feature-extraction / resize /
  * frame-sampling operators.
  *
  * The decode step is a clearly-marked STUB (this container ships no
  * image/audio codecs): [[decodeFeatures]] derives deterministic fake
  * features from the bytes. The Spark-side plumbing — schema, batch shape,
  * partition-parallel mapPartitions, expression-level chunking — is real and
  * tested; swapping the stub for a JNI/codec call changes one function.
  *
  * Scale notes: media blobs stay opaque through shuffles (never parsed by
  * Catalyst); feature extraction is mapPartitions (one codec init per
  * partition, the Scala analog of a Pandas-UDF batch); frame sampling is a
  * pure expression, so it pushes through column pruning.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte],
                            width: Int, height: Int, sample_rate: Int)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 features: Seq[Double])

  /** Deterministic synthetic media table (id, kind, media BINARY, meta). */
  def syntheticMedia(spark: SparkSession, n: Int, bytesPerRow: Int = 256): DataFrame =
    spark.range(n).toDF("media_id").select(
      col("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
                 (col("media_id") % 3 + 1).cast("int")).as("kind"),
      // opaque payload: repeated sha2 of the id, truncated to bytesPerRow
      substring(to_binary(repeat(sha2(col("media_id").cast("string"), 256),
                                 bytesPerRow / 16), lit("hex")),
                1, bytesPerRow).as("media"),
      lit(64).as("width"), lit(64).as("height"), lit(16000).as("sample_rate"))

  /** STUB decode + feature extraction over partition-local batches.
    * Real implementation would decode `media` with a codec; the stub emits
    * `dim` deterministic byte-derived moments so downstream operators
    * (dedup, ANN) are exercised end-to-end. */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one 'codec init' per partition happens here
      rows.map { r =>
        val bytes = r.media
        val feats = Array.tabulate(dim) { i =>
          if (bytes.isEmpty) 0.0
          else {
            var acc = 0.0
            var j = i
            while (j < bytes.length) { acc += (bytes(j) & 0xFF) / 255.0; j += dim }
            acc / math.max(1, (bytes.length + dim - 1 - i) / dim)
          }
        }
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong, feats.toSeq)
      }
    }
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
