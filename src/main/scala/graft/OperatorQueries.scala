package graft

import org.apache.spark.sql.functions._

import graft.model.KG
import graft.operators.Joins

/** Custom-join operator demos: as-of, bucketed range join, salted skew
  * join — each oracle-checked (DuckDB has native ASOF JOIN; range and
  * salted joins compare against the naive formulations). */
object OperatorQueries {
  import PipelineQueries.QFn

  // 1 hour in ns: the current testdata's events are ~1 per user per 10 h,
  // so a 60 s window matches ZERO pairs at the verify SF (a vacuous green);
  // an hour window exercises the join at every SF (5/34/384 matches at
  // sf0.001/0.01/0.1).
  private val HOUR_NS = 3600L * 1000 * 1000 * 1000

  /** Entity universe of the KG as oracle SQL (one branch per key tag). */
  private val UNIV_SQL = Seq(
    "SELECT CAST(100000000 + c_custkey AS BIGINT) AS id FROM customer",
    "SELECT CAST(200000000 + n_nationkey AS BIGINT) FROM nation",
    "SELECT CAST(300000000 + r_regionkey AS BIGINT) FROM region",
    "SELECT CAST(400000000 + s_suppkey AS BIGINT) FROM supplier",
    "SELECT CAST(500000000 + p_partkey AS BIGINT) FROM part",
    "SELECT CAST(600000000 + o_orderkey AS BIGINT) FROM orders")
    .mkString(" UNION ALL ")

  /** The end-to-end workload eval covers ALL 25 declared query types
    * (metric.py:6-66 — the reference's de-facto conformance suite), split
    * into two suite queries so neither DuckDB oracle statement grows
    * unwieldy: the 15 BetaE types and the 10 EFO-1 extended types. */
  private[graft] val EVAL_TYPES_BETAE = Set(
    "kg_1p", "kg_2p", "kg_3p", "kg_2i", "kg_3i", "kg_ip", "kg_pi",
    "kg_2in", "kg_3in", "kg_inp", "kg_pin", "kg_pni",
    "kg_2u", "kg_up", "kg_up_dnf")
  private[graft] val EVAL_TYPES_EFOX = Set(
    "kg_2m", "kg_2nm", "kg_3mp", "kg_3pm", "kg_im",
    "kg_2il", "kg_3il", "kg_3c", "kg_3cm", "kg_3pcp")

  val entries: Seq[(String, QFn, Option[String])] = Seq(

    // As-of join: each click matched to the user's latest prior purchase.
    ("q_asof_join",
      (s, dir) => {
        // eventsNs: any monotone ts encoding works for as-of ordering, but
        // routing through the normalizer keeps every event-time site behind
        // the one schema-drift seam.
        val ev = KG.eventsNs(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
        Joins.asOf(clicks, purchases, Seq("user_id"), "ts", Seq("purchase_id"))
          .select("user_id", "click_id", "purchase_id")
      },
      Some("""WITH c AS (SELECT user_id, epoch_ns(ts) AS ts, event_id AS click_id
             |          FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, epoch_ns(ts) AS ts, MAX(event_id) AS purchase_id
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT c.user_id, c.click_id, p.purchase_id
             |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin)),

    // Range join: errors within 1h before each click, same user.
    ("q_range_join",
      (s, dir) => {
        // eventsNs is REQUIRED here: rangeBucketed's long bounds are in ns
        // (HOUR_NS) — a raw timestamp column would cast to SECONDS.
        val ev = KG.eventsNs(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id").as("error_id"))
        Joins.rangeBucketed(clicks, errors, Seq("user_id"), "ts", "ts",
                            lower = HOUR_NS, upper = 0L, Seq("error_id"))
          .select("user_id", "click_id", "error_id")
      },
      Some("SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id " +
           "FROM events c JOIN events e ON c.user_id = e.user_id " +
           "AND c.event_type = 'click' AND e.event_type = 'error' " +
           s"AND epoch_ns(e.ts) BETWEEN epoch_ns(c.ts) - $HOUR_NS AND epoch_ns(c.ts)")),

    // End-to-end workload evaluation: train/held-out split, filtered
    // MRR/Hits per query type (reference lifecycle SURVEY §3), covering
    // ALL 25 declared types across two suite queries. The oracle
    // re-derives the whole pipeline in SQL: md5 train split, each formula
    // over both edge sets, membership-score ranking, filtered metrics.
    ("eval_efo1_suite",
      (s, dir) => {
        graft.eval.Workload.evaluate(s, dir,
          KGQueries.all.filter(t => EVAL_TYPES_BETAE.contains(t._1)))
      },
      Some(graft.eval.Workload.evaluateSql(
        KGQueries.all.filter(t => EVAL_TYPES_BETAE.contains(t._1)),
        UNIV_SQL))),

    ("eval_efox_suite",
      (s, dir) => {
        graft.eval.Workload.evaluate(s, dir,
          KGQueries.all.filter(t => EVAL_TYPES_EFOX.contains(t._1)))
      },
      Some(graft.eval.Workload.evaluateSql(
        KGQueries.all.filter(t => EVAL_TYPES_EFOX.contains(t._1)),
        UNIV_SQL))),

    // Salted join: result identical to the plain equi-join.
    ("q_salted_join",
      (s, dir) => {
        val li = KG.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
                  col("l_suppkey").as("s_suppkey"))
        val supp = KG.table(s, dir, "supplier").select("s_suppkey", "s_name")
        Joins.salted(li, supp, Seq("s_suppkey"), "l_orderkey", salts = 8)
          .select("l_orderkey", "l_linenumber", "s_suppkey", "s_name")
      },
      Some("SELECT l_orderkey, l_linenumber, l_suppkey AS s_suppkey, s_name " +
           "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey"))
  )
}
