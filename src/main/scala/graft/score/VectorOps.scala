package graft.score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector algebra over `ARRAY<DOUBLE>` columns using Spark SQL higher-order
  * functions (`zip_with` / `transform` / `aggregate`) — everything stays
  * inside Catalyst codegen; no UDFs on the hot path.
  *
  * These are the Spark expressions for the reference's dense tensor ops
  * (SURVEY §2.6): dot products, Lp distances, element-wise arithmetic.
  */
object VectorOps {

  def addVec(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)
  def subVec(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)
  def mulVec(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x * y)
  def scaleVec(a: Column, s: Column): Column = transform(a, x => x * s)

  def sumArr(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column = sumArr(mulVec(a, b))

  /** Lp distance ‖a − b‖_p. */
  def lpDist(a: Column, b: Column, p: Double): Column =
    if (p == 1.0) sumArr(zip_with(a, b, (x, y) => abs(x - y)))
    else if (p == 2.0) sqrt(sumArr(zip_with(a, b, (x, y) => (x - y) * (x - y))))
    else pow(sumArr(zip_with(a, b, (x, y) => pow(abs(x - y), p))), 1.0 / p)

  def l2Norm(a: Column): Column = sqrt(sumArr(mulVec(a, a)))

  /** Cosine similarity (F15, lmpnn.py:211,257-263). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** First / second half of a 2d-split complex embedding
    * (re‖im convention, complex.py:99-115, rotate.py:51-64). */
  def firstHalf(a: Column): Column = slice(a, lit(1), size(a) / 2)
  def secondHalf(a: Column): Column = slice(a, size(a) / 2 + 1, size(a) / 2)

  /** Element-wise vector-sum aggregate (A4/G5 message aggregation — Spark
    * has no built-in array-vector sum; SURVEY §7.4).
    *
    * Relational formulation that scales to any fan-in: posexplode each
    * vector, sum per (group, position), re-assemble ordered by position.
    * One shuffle on (groupCols, pos); the reassembly `collect_list` groups
    * at most `dim` scalars per key.
    *
    * @return DataFrame with `groupCols` and an `outCol` ARRAY<DOUBLE>.
    */
  def vecSumByKey(df: DataFrame, groupCols: Seq[String], vecCol: String,
                  outCol: String): DataFrame = {
    val exploded = df.select(
      groupCols.map(col) :+ posexplode(col(vecCol)).as(Seq("pos", "v")): _*)
    exploded
      .groupBy((groupCols :+ "pos").map(col): _*)
      .agg(sum(col("v")).as("v"))
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pairs"))
      .withColumn(outCol, transform(col("pairs"), p => p.getField("v")))
      .drop("pairs")
  }
}
