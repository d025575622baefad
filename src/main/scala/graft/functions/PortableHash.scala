package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's portable hash family: a 60-bit non-negative integer from
  * the first 15 md5 hex chars. md5 is identical in every ANSI engine, and
  * 15 hex digits fit a signed BIGINT, so the value is bit-reproducible in
  * Spark, DuckDB, or any SQL oracle — the property behind the verifiable
  * minhash/simhash families, the train/test split, and the deterministic
  * samplers. ONE definition on each side; Spark and SQL renderings must
  * stay in lock-step. */
object PortableHash {

  /** Spark rendering: the fused [[Md5Prefix60]] codegen kernel —
    * bit-identical to `conv(substring(md5(c), 1, 15), 16, 10)` (spec-checked
    * property) without the per-row hex-string round trip. */
  def md5Prefix60(c: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      Md5Prefix60(org.apache.spark.sql.GraftColumn.expr(c)))

  /** DuckDB rendering of [[md5Prefix60]] for oracle SQL. */
  def md5Prefix60Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"
}
