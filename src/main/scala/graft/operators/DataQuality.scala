package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.KG

/** Declarative data-quality constraint checking (the Deequ/dbt-test
  * operator class): each constraint compiles to one aggregate plan over
  * the checked table, and the report is the union of tiny 1-row results —
  * violations are COUNTED, never collected, so a 100 TB audit is a scan
  * per table (Catalyst shares scans across same-table constraints via
  * common subexpression reuse where possible; the expensive FK checks
  * broadcast the key side).
  *
  * Constraint kinds:
  *   - [[notNull]] / [[unique]] / [[inRange]] / [[matches]]: single-table
  *     aggregates;
  *   - [[foreignKey]]: referential integrity via a left-anti join against
  *     the (broadcast) referenced key set.
  *
  * Each check yields (check_name, n_violations, n_checked). */
object DataQuality {

  final case class Check(name: String, frame: DataFrame,
                         violation: Column)

  def notNull(name: String, df: DataFrame, c: String): Check =
    Check(name, df, col(c).isNull)

  def inRange(name: String, df: DataFrame, c: String, lo: Double,
              hi: Double): Check =
    Check(name, df, col(c) < lo || col(c) > hi)

  def matches(name: String, df: DataFrame, c: String, re: String): Check =
    Check(name, df, !col(c).rlike(re))

  /** Duplicate-key rows (rows beyond the first per key value). */
  def unique(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_violations"),
           coalesce(sum(col("n")), lit(0L)).as("n_checked"))
      .select(lit(name).as("check_name"), col("n_violations"),
              col("n_checked"))

  /** Referential integrity: child rows whose key has no parent. */
  def foreignKey(name: String, child: DataFrame, childKey: String,
                 parent: DataFrame, parentKey: String): DataFrame = {
    val parents = parent.select(col(parentKey).as(childKey)).distinct()
    val nViol = child.select(col(childKey))
      .join(broadcast(parents), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val nAll = child.agg(count(lit(1)).as("n_checked"))
    nViol.crossJoin(broadcast(nAll))
      .select(lit(name).as("check_name"), col("n_violations"),
              col("n_checked"))
  }

  private def run(c: Check): DataFrame =
    c.frame.agg(
        coalesce(sum(when(c.violation, 1L).otherwise(0L)), lit(0L))
          .as("n_violations"),
        count(lit(1)).as("n_checked"))
      .select(lit(c.name).as("check_name"), col("n_violations"),
              col("n_checked"))

  /** Assemble a report from simple checks + prebuilt report rows. */
  def report(checks: Seq[Check], extra: Seq[DataFrame] = Nil): DataFrame =
    (checks.map(run) ++ extra).reduce(_ unionAll _)

  /** Per-column profile of a table (the data-profiler op that feeds
    * constraint suggestions): one output row per profiled numeric
    * column — null count, exact distinct count, min/max/mean — all from
    * ONE aggregate pass over the table per column batch (profiles are
    * long-form, so adding columns never widens a row). */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame =
    columns.map { c =>
      df.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          round(min(col(c)).cast("double"), 6).as("min_val"),
          round(max(col(c)).cast("double"), 6).as("max_val"),
          // order-independent mean: exact DECIMAL(18,6) sum, then ONE
          // correctly-rounded double division — float-summation-order
          // ties (the NOTES round-6 class) cannot occur. Denominator is
          // the NON-NULL count (count(col)) — dividing by n_rows would
          // silently treat NULLs as zeros.
          round(sum(col(c).cast("decimal(18,6)")).cast("double") /
                count(col(c)), 6).as("mean_val"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
                col("n_distinct"), col("min_val"), col("max_val"),
                col("mean_val"))
    }.reduce(_ unionAll _)

  /** The standard audit of the driver testdata star schema. */
  def testdataReport(s: SparkSession, dir: String): DataFrame = {
    def t(n: String) = KG.table(s, dir, n)
    report(
      Seq(
        notNull("documents_text_not_null", t("documents"), "text"),
        inRange("lineitem_quantity_1_45", t("lineitem"), "l_quantity",
                1, 45),
        inRange("customer_acctbal_range", t("customer"), "c_acctbal",
                -500, 9000),
        matches("orders_status_domain", t("orders"), "o_orderstatus",
                "^[OFP]$")),
      Seq(
        unique("customer_key_unique", t("customer"), Seq("c_custkey")),
        unique("lineitem_line_unique", t("lineitem"),
               Seq("l_orderkey", "l_linenumber")),
        foreignKey("orders_custkey_fk", t("orders"), "o_custkey",
                   t("customer"), "c_custkey"),
        foreignKey("lineitem_orderkey_fk", t("lineitem"), "l_orderkey",
                   t("orders"), "o_orderkey")))
  }
}
