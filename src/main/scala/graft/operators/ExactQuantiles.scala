package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT interpolated quantiles without the single-task whole-column
  * buffer of Spark's `percentile` aggregate (whose final merge holds
  * every value of the column in ONE task — the OOM-shaped plan class
  * the PlanGuard exists to keep out).
  *
  * Shape: `groupBy(value).count` collapses the data-sized input to a
  * DISTINCT-VALUE-sized frequency table; an ordered prefix-sum over
  * that table (two-level: a partitioned within-range-bucket running
  * sum + a broadcast exclusive prefix of the ≤`buckets` per-bucket
  * totals) yields exact cumulative ranks; the target ranks
  * `floor/ceil((n−1)·p)` are then a broadcast range-join away. Every
  * stage is shuffle-bounded by the distinct-value count — nothing
  * ever funnels the column through one task, and the only
  * single-partition window runs over the per-bucket totals (≤
  * `buckets` rows per group, a CONSTANT independent of data size).
  *
  * Bit-exactness: the interpolation mirrors Spark's own
  * `Percentile.getPercentile` —
  * `(higher − position)·v_lo + (position − lower)·v_hi` with
  * `position = (n−1)·p`, the `higher == lower` and `v_hi == v_lo`
  * short-circuits included — so the result is the IDENTICAL double the
  * built-in aggregate returns (same value multiset ⇒ same counts ⇒
  * same ranks ⇒ same formula on the same operands), verified
  * bit-for-bit in ExactQuantilesSpec. One documented exception: the
  * frequency `groupBy(_v)` goes through Spark's
  * NormalizeFloatingNumbers, so `-0.0` and `0.0` collapse into one
  * value row (SQL equality semantics — Spark itself normalizes them in
  * every grouping/join key); an exactly-zero result therefore always
  * carries a positive sign, where the built-in's raw-bits hashmap can
  * return `-0.0`. Numerically equal; only the zero's sign bit differs.
  *
  * Reference semantics: SURVEY §2.10 classic-SQL surface (exact
  * quantile boundaries / binning); VERDICT r11 "What's wrong" #1. */
object ExactQuantiles {

  /** Exact quantiles of possibly many value columns, per group.
    *
    * @param df        input
    * @param groupCols grouping columns (empty ⇒ one global row)
    * @param specs     (valueCol, outputName, p) triples; output names
    *                  must be unique — each becomes a double column
    * @param buckets   range-bucket fan-out for the two-level prefix sum
    * @return one row per group: groupCols ++ one double column per spec.
    *         Contract note (ExactQuantilesPropertySpec): a group whose
    *         values are ALL null yields no row here, where the built-in
    *         `percentile` yields a NULL-valued row — the melt drops
    *         null values before grouping. Callers needing the empty
    *         groups re-attach them with a left join from the group
    *         universe.
    */
  /** Distinct-value FREQUENCY table of the melted value columns —
    * `groupCols ++ (_vc, _v, _c)`, checkpointed. This is the operator's
    * one data-sized pass; [[quantilesOfFreq]] computes the quantiles
    * from it, and callers that need further value-distribution work
    * (binning, histogram counts — q_quantile_bins) reuse the SAME table
    * instead of re-scanning the data-sized input: Σ_c / min / max over
    * the frequency rows are exactly the count / min / max over the raw
    * rows. NULLs are dropped per column, matching `percentile`'s
    * semantics (each column's n counts only its own non-null rows);
    * `groupBy(_v)` normalizes -0.0/0.0 (documented above). */
  def frequencies(df: DataFrame, groupCols: Seq[String],
                  valueCols: Seq[String]): DataFrame = {
    val gcols = if (groupCols.isEmpty) Seq("_g") else groupCols
    val melted = df
      .select(groupCols.map(col) :+ explode(array(valueCols.distinct.map(vc =>
        struct(lit(vc).as("_vc"), col(vc).cast("double").as("_v"))): _*))
        .as("_m"): _*)
      .select((groupCols.map(col) :+ col("_m._vc").as("_vc") :+
        col("_m._v").as("_v")): _*)
      .filter(col("_v").isNotNull)
    val base =
      if (groupCols.isEmpty) melted.withColumn("_g", lit(1)) else melted
    // Data-sized input → distinct-value-sized frequency table. This is
    // the ONLY data-sized stage; everything downstream is bounded by the
    // distinct-value count. MATERIALIZED (localCheckpoint, eager): the
    // table feeds four downstream branches (stats, bucketed counts,
    // per-bucket totals, target ranks) — without the checkpoint each
    // branch re-derives it, i.e. re-SCANS the data-sized input
    // (measured: 10 parquet scans in q_exact_median's plan). One scan
    // of the input, once, is the whole point of the operator.
    base.groupBy((gcols.map(col) :+ col("_vc")) :+ col("_v"): _*)
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint(true)
  }

  def quantiles(df: DataFrame, groupCols: Seq[String],
                specs: Seq[(String, String, Double)],
                buckets: Int = 1024): DataFrame =
    quantilesOfFreq(frequencies(df, groupCols, specs.map(_._1).distinct),
                    groupCols, specs, buckets)

  /** [[quantiles]] over a prebuilt [[frequencies]] table (same groupCols;
    * the freq table must cover every spec's value column). */
  def quantilesOfFreq(freq: DataFrame, groupCols: Seq[String],
                      specs: Seq[(String, String, Double)],
                      buckets: Int = 1024): DataFrame = {
    require(specs.nonEmpty, "at least one quantile spec")
    require(specs.map(_._2).distinct.size == specs.size,
            "quantile output names must be unique")
    val gcols = if (groupCols.isEmpty) Seq("_g") else groupCols
    val gc = gcols.map(col)
    val kc = gc :+ col("_vc") // full key: group × value-column

    // Per-key stats (fixed-size sum/min/max buffers only).
    val stats = freq.groupBy(kc: _*)
      .agg(sum("_c").as("_n"), min("_v").as("_vmin"), max("_v").as("_vmax"))

    // Null-safe group-key equality everywhere a join re-attaches
    // per-key info: `percentile` keeps a NULL-keyed group (NULL is a
    // legal groupBy key), so `===`/USING joins would silently drop it.
    def keyEq(l: String, r: String): Column =
      (gcols.map(g => col(s"$l.$g") <=> col(s"$r.$g")) :+
        (col(s"$l._vc") === col(s"$r._vc"))).reduce(_ && _)

    // Monotone range bucket: floor((v−vmin)/w) is non-decreasing in v
    // (FP subtraction and division by a positive constant are monotone),
    // so bucket order extends value order and the two-level prefix sum
    // is a true ordered prefix.
    val withB = freq.alias("f").join(broadcast(stats.alias("s")), keyEq("f", "s"))
      .select(((gcols :+ "_vc").map(n => col(s"f.$n")) ++
        Seq(col("f._v"), col("f._c"), col("s._vmin"), col("s._vmax"))): _*)
      .withColumn("_bkt",
        when(col("_vmax") === col("_vmin"), lit(0L))
          .otherwise(least(
            floor((col("_v") - col("_vmin")) /
              ((col("_vmax") - col("_vmin")) / buckets)).cast("long"),
            lit(buckets - 1L))))

    // Within-bucket running count: Window PARTITIONED by (key, bucket)
    // — never global, each partition holds only one bucket's distinct
    // values.
    val wIn = Window.partitionBy(kc :+ col("_bkt"): _*).orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumIn = withB.withColumn("_cumb", sum("_c").over(wIn))

    // Exclusive prefix of the per-bucket totals: ≤ `buckets` rows per
    // key — a constant-bounded table, so the per-key ordered window
    // over it is safe at any data size (documented PlanGuard shape:
    // partitionSpec is the key, frame ≤ `buckets` rows).
    val wB = Window.partitionBy(kc: _*).orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bPrefix = withB.groupBy(kc :+ col("_bkt"): _*)
      .agg(sum("_c").as("_bc"))
      .withColumn("_bpre", coalesce(sum("_bc").over(wB), lit(0L)))
      .select(kc :+ col("_bkt") :+ col("_bpre"): _*)

    val cum = cumIn.alias("c").join(broadcast(bPrefix.alias("b")),
        keyEq("c", "b") && col("c._bkt") === col("b._bkt"))
      .select(((gcols :+ "_vc").map(n => col(s"c.$n")) ++
        Seq(col("c._v"), col("c._c"), col("c._cumb"), col("b._bpre"))): _*)
      .withColumn("_cum_hi", col("_bpre") + col("_cumb"))
      .withColumn("_cum_lo", col("_cum_hi") - col("_c"))

    // Target ranks: position = (n−1)·p exactly as Spark's Percentile
    // computes it (long n−1 widened to double, times the double p).
    val specArr = array(specs.map { case (vc, nm, p) =>
      struct(lit(vc).as("_svc"), lit(nm).as("_q"), lit(p).as("_p"))
    }: _*)
    val targets = stats
      .select(kc ++ Seq(col("_n"), explode(specArr).as("_s")): _*)
      .filter(col("_s._svc") === col("_vc"))
      .select(kc :+ col("_s._q").as("_q") :+
        ((col("_n") - 1).cast("double") * col("_s._p")).as("_pos"): _*)
      .withColumn("_lo", floor(col("_pos")).cast("long"))
      .withColumn("_hi", ceil(col("_pos")).cast("long"))
    val ranks = targets.select(kc ++ Seq(col("_q"), col("_pos"), col("_lo"),
      col("_hi"), explode(array(
        struct(lit("lo").as("_k"), col("_lo").as("_r")),
        struct(lit("hi").as("_k"), col("_hi").as("_r")))).as("_kr")): _*)
      .select(kc ++ Seq(col("_q"), col("_pos"), col("_lo"), col("_hi"),
        col("_kr._k").as("_k"), col("_kr._r").as("_r")): _*)

    // Each (key, quantile, lo|hi) rank lands in exactly one frequency
    // row: cum_lo ≤ r < cum_hi. The rank side is O(groups·specs) —
    // broadcast.
    val hit = cum.alias("f").join(broadcast(ranks.alias("t")),
      keyEq("f", "t") &&
        col("t._r") >= col("f._cum_lo") && col("t._r") < col("f._cum_hi"))
      .select(gcols.map(g => col(s"f.$g")) ++ Seq(col("t._q").as("_q"),
        col("t._pos").as("_pos"), col("t._lo").as("_lo"),
        col("t._hi").as("_hi"), col("t._k").as("_k"),
        col("f._v").as("_v")): _*)

    // Spark Percentile.getPercentile, verbatim in Column form:
    //   if (higher == lower)        lowerValue
    //   else if (vHi == vLo)        lowerValue
    //   else (higher−position)·vLo + (position−lower)·vHi
    // ONE tiny groupBy (was two chained): per-spec max(when) aggregates
    // pull each quantile's (vlo, vhi, pos, lo, hi) out of the ≤ 2 hit
    // rows per spec, and the interpolation runs as a projection — one
    // fewer exchange + scheduled stage per call (§2.4), same values.
    def pick(nm: String, c: Column): Column = max(when(col("_q") === nm, c))
    val qCols = specs.flatMap { case (_, nm, _) =>
      Seq(pick(nm, when(col("_k") === "lo", col("_v"))).as(s"_vlo_$nm"),
          pick(nm, when(col("_k") === "hi", col("_v"))).as(s"_vhi_$nm"),
          pick(nm, col("_pos")).as(s"_pos_$nm"),
          pick(nm, col("_lo").cast("double")).as(s"_lo_$nm"),
          pick(nm, col("_hi").cast("double")).as(s"_hi_$nm"))
    }
    val agg = hit.groupBy(gc: _*).agg(qCols.head, qCols.tail: _*)
    val outCols = gc ++ specs.map { case (_, nm, _) =>
      when(col(s"_hi_$nm") === col(s"_lo_$nm")
             || col(s"_vhi_$nm") === col(s"_vlo_$nm"), col(s"_vlo_$nm"))
        .otherwise((col(s"_hi_$nm") - col(s"_pos_$nm")) * col(s"_vlo_$nm") +
                   (col(s"_pos_$nm") - col(s"_lo_$nm")) * col(s"_vhi_$nm"))
        .as(nm)
    }
    val out = agg.select(outCols: _*)
    if (groupCols.isEmpty) out.drop("_g") else out
  }
}
