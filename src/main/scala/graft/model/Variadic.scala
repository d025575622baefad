package graft.model

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** R15: row-subset selection by key list with optional dense re-key
    * (data.py:339-368) — a semi-join, plus dense_rank re-key. */
  def selectRows(df: DataFrame, rows: DataFrame, reindex: Boolean): DataFrame = {
    val kept = df.join(rows.select(col("row")).distinct(), Seq("row"), "left_semi")
    if (!reindex) kept
    else kept.withColumn("row",
      dense_rank().over(Window.orderBy("row")).cast("long") - 1)
  }

  /** R16: union/append (data.py:370-375). */
  def append(a: DataFrame, b: DataFrame): DataFrame = a.unionAll(b)

  /** R17: key compaction — re-densify (possibly composite) group keys
    * (data.py:387-396, refine_index data.py:91-109). */
  def compactKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.withColumn("key_id",
      dense_rank().over(Window.orderBy(keyCols.map(col): _*)).cast("long") - 1)

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
