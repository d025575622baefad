package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join operators Spark lacks as built-ins, composed from existing ops per
  * the preference order (compose > custom Expression > custom SparkPlan —
  * these semantics are fully expressible with public operators, so (a)
  * applies; no SparkStrategy needed).
  *
  *  - [[asOf]]: most-recent-match join — one shuffle + one window pass over
  *    the tagged union (no per-row range probe, no |L|×|R| blowup).
  *  - [[rangeBucketed]]: interval join by bucketing time into
  *    window-width buckets, exploding each probe row into the (at most 2)
  *    candidate buckets, equi-joining, then applying the exact predicate —
  *    turns an inequality join (cartesian at scale) into a shuffle join.
  *  - [[salted]]: skew-safe equi-join — replicate the build side `s` times,
  *    deterministically salt the probe side, join on (key, salt).
  */
object Joins {

  /** As-of join: for each left row, the latest right row with the same key
    * and `right.ts <= left.ts` (ties: right row sorts first, so an
    * equal-timestamp right row matches). Right must be unique per
    * (key, ts) — pre-aggregate if needed. Inner semantics: left rows with
    * no prior right row are dropped.
    *
    * @param valueCols right-side columns to carry (must not clash with left)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged =
      left.select((keyCols :+ tsCol).map(col) ++
          leftCols.filterNot((keyCols :+ tsCol).contains).map(col) ++
          valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
          lit(1).as("_side"): _*)
        .unionByName(
          right.select((keyCols :+ tsCol).map(col) ++
            leftCols.filterNot((keyCols :+ tsCol).contains)
              .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
            valueCols.map(col) :+ lit(0).as("_side"): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .filter(valueCols.map(col(_).isNotNull).reduce(_ && _))
      .drop("_side")
  }

  /** Interval join: pairs (l, r) with equal keys and
    * `r.ts ∈ [l.ts - lower, l.ts + upper]`. Bucket width = lower + upper,
    * so each right row lands in one bucket and each left row probes at most
    * two buckets. Output: all left columns + `valueCols` from right. */
  def rangeBucketed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                    tsL: String, tsR: String, lower: Long, upper: Long,
                    valueCols: Seq[String]): DataFrame = {
    require(lower + upper > 0, "window must have positive span")
    val width = lower + upper
    // Exact floor-bucketing in pure long arithmetic: the bucket id is the
    // bucket's START value `x - pmod(x, width)` (pmod is non-negative, so
    // this floors for negative x too). No division — double-rounding at
    // ns-epoch magnitudes (~1.7e18, 256 ns ulp) would mis-bucket
    // boundary-adjacent rows and silently drop matches.
    def bucketOf(x: Column): Column = x - pmod(x, lit(width))
    val r = right.select((keyCols.map(col) :+
        bucketOf(col(tsR).cast("long")).as("_bucket")) ++
        (col(tsR).cast("long").as("_rts") +: valueCols.map(col)): _*)
    val probe = left.withColumn("_bucket",
      explode(array_distinct(array(
        bucketOf(col(tsL).cast("long") - lower),
        bucketOf(col(tsL).cast("long") + upper)))))
    probe.join(r, keyCols :+ "_bucket")
      .filter(col("_rts") >= col(tsL).cast("long") - lower &&
              col("_rts") <= col(tsL).cast("long") + upper)
      .drop("_bucket", "_rts")
  }

  /** Skew-safe equi-join: probe rows get a deterministic salt from a
    * uniqueness column; build rows are replicated across all salts. The
    * result equals the plain inner join; the shuffle key (key, salt) splits
    * hot keys across `salts` reducers. */
  def salted(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
             probeUniqueCol: String, salts: Int = 8): DataFrame = {
    val saltedProbe = probe.withColumn("_salt",
      pmod(xxhash64(col(probeUniqueCol)), lit(salts)).cast("int"))
    val saltedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe.join(saltedBuild, keyCols :+ "_salt").drop("_salt")
  }
}
