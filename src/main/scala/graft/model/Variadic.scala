package graft.model

import org.apache.spark.sql.{DataFrame, Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** The reference's ragged-matrix runtime container re-expressed relationally
  * (SURVEY §1.1, §2.3 R11-R22): a `VariadicMatrix(data, row_index)`
  * (utils/data.py:112-396) IS a `(row, value)` DataFrame; every op below is
  * the relational equivalent of one VariadicMatrix method, so downstream
  * code composes them as ordinary joins/aggregations that Catalyst plans.
  *
  * Convention: `row` LONG group key, `value` LONG payload, optional extra
  * columns ride along.
  */
object Variadic {

  /** R21/R22: build from nested lists (input normalization data.py:34-66,
    * 185-195). */
  def fromLists(spark: org.apache.spark.sql.SparkSession,
                lists: Seq[Seq[Long]]): DataFrame = {
    import spark.implicits._
    lists.zipWithIndex
      .flatMap { case (vs, r) => vs.map(v => (r.toLong, v)) }
      .toDF("row", "value")
  }

  /** R11: per-group cartesian product of two ragged relations
    * (data.py:283-310) — a group-keyed equi-join. */
  def cartesian(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("row"), col("value").as("a"))
      .join(b.select(col("row"), col("value").as("b")), "row")

  /** R12: broadcast-expand — align a 1-element-per-row relation with a
    * ragged one (row_expand_as_, data.py:312-323). */
  def expandAs(single: DataFrame, ragged: DataFrame): DataFrame =
    ragged.select(col("row"), col("value"))
      .join(broadcast(single.select(col("row"), col("value").as("expanded"))),
            "row")

  /** R13: per-group sort + dedup, keeping the best score per (row, value)
    * (unique with score reindex, data.py:220-260; used cqd.py:214-217). */
  def dedup(df: DataFrame, scoreCol: String = "score"): DataFrame =
    df.groupBy("row", "value").agg(max(col(scoreCol)).as(scoreCol))

  /** R14: duplicate extraction — values appearing more than once per group
    * (data.py:262-281). */
  def duplicates(df: DataFrame): DataFrame =
    df.groupBy("row", "value").agg(count(lit(1)).as("n")).filter(col("n") > 1)

  /** 0-based dense index of the DISTINCT (non-null) `keyCols` tuples in
    * ascending lexicographic order — the output of a global `dense_rank`,
    * built scale-safely: range-partitioned sort + RDD zipWithIndex (the
    * [[graft.metric.Ranking.globalIndex]] pattern generalized to composite
    * keys), then joined back. No no-partition window anywhere. */
  private def denseKeyIndex(df: DataFrame, keyCols: Seq[String],
                            outCol: String): DataFrame = {
    val spark = df.sparkSession
    val keys = df.select(keyCols.map(col): _*).distinct()
      .orderBy(keyCols.map(c => col(c).asc): _*)
    val schema = keys.schema.add(outCol, LongType, nullable = false)
    spark.createDataFrame(
      keys.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** R15: row-subset selection by key list with optional dense re-key
    * (data.py:339-368) — a semi-join, plus a dense re-key via
    * [[denseKeyIndex]] (equivalent to a global dense_rank without the
    * single-partition window). */
  def selectRows(df: DataFrame, rows: DataFrame, reindex: Boolean): DataFrame = {
    val kept = df.join(rows.select(col("row")).distinct(), Seq("row"), "left_semi")
    if (!reindex) kept
    else kept.join(denseKeyIndex(kept, Seq("row"), "__rk"), Seq("row"))
      .withColumn("row", col("__rk")).drop("__rk")
      .select(kept.columns.map(col): _*)
  }

  /** R16: union/append (data.py:370-375). */
  def append(a: DataFrame, b: DataFrame): DataFrame = a.unionAll(b)

  /** R17: key compaction — re-densify (possibly composite, non-null) group
    * keys (data.py:387-396, refine_index data.py:91-109). Dense ids come
    * from [[denseKeyIndex]] — same output as a global dense_rank, no
    * single-partition window. */
  def compactKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.join(denseKeyIndex(df, keyCols, "key_id"), keyCols)
      .select((df.columns.map(col) :+ col("key_id")): _*)

  /** R18: interleaved range explode (interleave_arange, data.py:69-88). */
  def rangeExplode(bounds: DataFrame, startCol: String, endCol: String): DataFrame =
    bounds.filter(col(endCol) > col(startCol))
      .select(col("*"),
        explode(sequence(col(startCol), col(endCol) - 1)).as("i"))

  /** R19: first index of each unique value
    * (pyg_graph_functionals.py:11-24). */
  def firstPerValue(df: DataFrame, idxCol: String): DataFrame =
    df.groupBy("value").agg(min(col(idxCol)).as("first_idx"))

  /** R20: ragged -> dense list form (padding-free: Spark arrays are
    * naturally variable-length; data.py:157-183's sentinel padding is
    * unnecessary). Sorted for determinism. */
  def toLists(df: DataFrame): DataFrame =
    df.groupBy("row").agg(array_sort(collect_list("value")).as("values"))

  /** R20 inverse: dense list form -> ragged. */
  def fromListColumn(df: DataFrame): DataFrame =
    df.select(col("row"), explode(col("values")).as("value"))

  /** A1: grouped scatter-reduce with a pluggable reduction
    * (aggregation(), data.py:399-426). */
  def scatterReduce(df: DataFrame, reduceOp: String,
                    scoreCol: String = "value"): DataFrame = {
    val agg: Column = reduceOp match {
      case "sum"  => sum(col(scoreCol))
      case "max"  => max(col(scoreCol))
      case "min"  => min(col(scoreCol))
      case "mean" => avg(col(scoreCol))
      case other  => throw new IllegalArgumentException(s"unknown reduce $other")
    }
    df.groupBy("row").agg(agg.as(reduceOp))
  }

  /** O1/O2: grouped sort and grouped top-k by score (data.py:220-235,
    * 325-337; dense variant cqd.py:374-409). Rank-limit pushes down via
    * WindowGroupLimit in Spark >= 3.5. */
  def topK(df: DataFrame, k: Int, scoreCol: String = "score"): DataFrame = {
    val w = Window.partitionBy("row")
      .orderBy(col(scoreCol).desc, col("value").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }
}
