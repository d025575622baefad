package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Scale-evidence spec for the bucketed co-located join path (the brief's
  * "repartition/bucketing for co-located joins"): two tables written
  * bucketed by the join key join WITHOUT any shuffle exchange — the plan
  * a 100 TB fact-to-fact join needs (each bucket pair joins locally;
  * shuffle cost paid once at write time, amortized over every later
  * join). The local warehouse emulates the cluster layout. */
class BucketedJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.size

  test("bucketed tables join with zero shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.model.KG.table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.model.KG.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val bo = spark.table("b_orders")
    val bl = spark.table("b_lineitem")
    val joined = bl.join(bo, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))

    // The baseline (unbucketed) plan shuffles both sides; the bucketed
    // plan must shuffle NEITHER side of the join (broadcast is disabled
    // to force the sort-merge path the bucketing serves). The aggregate
    // reuses the same bucket partitioning, so the whole query plans
    // zero exchanges.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE wraps the plan in AdaptiveSparkPlanExec, hiding exchanges
      // until execution — disable it so the static plan is inspectable.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plain = lineitem.join(orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      assert(shuffles(plain) >= 2, "baseline should shuffle both sides")
      assert(shuffles(joined) == 0,
        s"bucketed join planned ${shuffles(joined)} exchanges:\n" +
          joined.queryExecution.executedPlan.toString.take(2000))
      // And the result is identical to the unbucketed join.
      val a = joined.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val b = plain.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
