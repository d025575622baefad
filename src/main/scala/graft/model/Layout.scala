package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB physical layout, made concrete: the edges table written as a
  * catalog table partitioned by `rel` and bucketed by `src`.
  *
  *  - partition pruning: an atom scan `rel = k` reads one directory;
  *  - bucketing: joins keyed on `src` between co-bucketed tables need no
  *    shuffle (Spark reuses the bucket hash as the exchange);
  *  - the local in-memory cache (`KG.edges` repartition-by-rel) emulates
  *    exactly this layout for the test harness.
  */
object Layout {

  /** Write edges as a bucketed, partitioned catalog table. */
  def writeBucketed(edges: DataFrame, table: String, buckets: Int = 32): Unit =
    edges.write
      .mode("overwrite")
      .partitionBy("rel")
      .bucketBy(buckets, "src")
      .sortBy("src")
      .format("parquet")
      .saveAsTable(table)

  /** Read the bucketed table back. */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True if a self-join of the bucketed table on `src` plans without a
    * shuffle on the bucketed side (evidence for the layout claim). */
  def selfJoinAvoidsShuffle(spark: SparkSession, table: String): Boolean = {
    val t1 = spark.table(table).filter(col("rel") === 0)
      .select(col("src"), col("dst").as("d1"))
    val t2 = spark.table(table).filter(col("rel") === 2)
      .select(col("src"), col("dst").as("d2"))
    val plan = t1.join(t2, "src").queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning")
  }
}
