package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming KG ingestion: an unbounded stream of timestamped triples
  * becomes (part of) the edges store.
  *
  *  - watermarked dedup drops replayed triples (at-least-once upstreams are
  *    the norm; state is bounded by the watermark horizon);
  *  - inverse edges are added with `rel ^ 1` per the reference convention
  *    (S11, dataloader.py:16-61) so the store always holds both directions;
  *  - foreachBatch appends to a parquet directory PARTITIONED BY rel — the
  *    same physical layout the batch engine reads (Layout.writeBucketed's
  *    partitioning axis), so partition pruning applies to freshly-streamed
  *    edges immediately.
  *
  * The reference has no streaming layer (SURVEY §2.9); this is the
  * ingestion face a production KG engine needs.
  */
object TripleIngest {

  final case class TripleEvent(ts: java.sql.Timestamp, src: Long, rel: Long,
                               dst: Long)

  /** Start the ingestion query. `triples` must be a streaming DataFrame
    * with columns (ts TIMESTAMP, src, rel, dst). */
  def ingest(triples: DataFrame, outDir: String, checkpoint: String,
             watermark: String = "10 minutes"): StreamingQuery =
    triples
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("src", "rel", "dst")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val base = batch.select(col("src"), col("rel"), col("dst"))
        val aug = base.unionAll(base.select(
          col("dst").as("src"),
          col("rel").bitwiseXOR(lit(1L)).as("rel"),
          col("src").as("dst")))
        aug.write.mode("append").partitionBy("rel").parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
