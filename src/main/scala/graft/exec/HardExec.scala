package graft.exec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lang._
import graft.lang.Binding.Binding
import graft.model.KG

/** Hard-logic (0/1-score) EFO-1 evaluator.
  *
  * With hard scores the reference's soft semantics reduce to relational
  * algebra (SURVEY §2.3): atom = indexed scan (R1), conjunction on a shared
  * variable = equi-join (R2), disjunction = union (R3), negated atom =
  * anti-join (R4), existential elimination = project+distinct (R5).
  * This evaluator compiles a DNF'd formula into exactly that DataFrame plan,
  * and [[OracleSql]] emits the equivalent ANSI SQL from the same structure so
  * the two can never drift.
  *
  * Scale design: every atom is a filter on `rel` (+ constant endpoint) over
  * the edges table — Catalyst pushes both into the parquet/cached scan.
  * Joins are equi-joins on entity-id columns; the accumulated binding
  * relation stays narrow (one BIGINT column per variable). Join order is
  * chosen greedily most-constants-first so the most selective atoms anchor
  * the plan, and AQE re-plans broadcast/skew at runtime.
  */
object HardExec {

  /** DataFrame of an atom's variable bindings: one column per distinct
    * variable in the atom (R1: atom lookup).
    *
    * No per-atom `distinct()`: the edges relation is a *set* (KG.edges is
    * duplicate-free by construction), so each projection here is already
    * duplicate-free — and even with a duplicated input, the final
    * free-variable projection dedups, so results are unchanged; only join
    * multiplicity (perf) would suffer. Dropping it removes one shuffle per
    * atom. */
  private def atomFrame(edges: DataFrame, a: Atomic, b: Binding): DataFrame = {
    val relId = b.getOrElse(a.rel,
      throw new IllegalArgumentException(s"unbound relation ${a.rel}"))
    val df = edges.filter(col("rel") === relId)
    (a.head.isConst, a.tail.isConst) match {
      case (true, true) =>
        df.filter(col("src") === b(a.head.name) && col("dst") === b(a.tail.name))
          .select(lit(1L).as("_const_hit")).limit(1)
      case (true, false) =>
        df.filter(col("src") === b(a.head.name))
          .select(col("dst").as(a.tail.name))
      case (false, true) =>
        df.filter(col("dst") === b(a.tail.name))
          .select(col("src").as(a.head.name))
      case (false, false) =>
        if (a.head.name == a.tail.name)
          df.filter(col("src") === col("dst"))
            .select(col("src").as(a.head.name))
        else
          df.select(col("src").as(a.head.name), col("dst").as(a.tail.name))
    }
  }

  /** Evaluate one conjunct: returns the relation of satisfying assignments,
    * one BIGINT column per variable of the conjunct.
    *
    * Join order (the driver-side planner of SURVEY §4 — semantic DAG order
    * is ours to pick, Catalyst only reorders by stats it can see):
    * constant-anchored atoms first; then, among atoms connected to the
    * accumulated binding relation, any atom whose variables are ALL already
    * bound (a pure filter — it can only shrink the frontier) before atoms
    * that introduce a new variable (joins that can grow it); ties by
    * smallest relation cardinality (`relStats`, one cached 22-row aggregate
    * per KG). Cyclic shapes (3c/3cm/3pcp) benefit most: the cycle-closing
    * edge lands right after its endpoints bind instead of after another
    * expansion. Result sets are order-independent; only intermediate sizes
    * change. */
  def evalCQ(edges: DataFrame, cq: CQ, b: Binding,
             relStats: Map[Long, Long] = Map.empty): DataFrame = {
    require(cq.pos.nonEmpty, "conjunct needs at least one positive atom")
    def card(a: Atomic): Long = relStats.getOrElse(b(a.rel), Long.MaxValue)
    val remaining = scala.collection.mutable.ListBuffer(
      cq.pos.sortBy(a => (-Seq(a.head, a.tail).count(_.isConst), card(a))): _*)
    var acc = atomFrame(edges, remaining.remove(0), b)
    while (remaining.nonEmpty) {
      val accCols = acc.columns.toSet
      val connected = remaining.zipWithIndex.filter { case (a, _) =>
        Seq(a.head, a.tail).exists(t => t.isVar && accCols.contains(t.name))
      }
      val fullyBound = connected.filter { case (a, _) =>
        Seq(a.head, a.tail).forall(t => !t.isVar || accCols.contains(t.name))
      }
      val idx =
        if (fullyBound.nonEmpty) fullyBound.minBy { case (a, _) => card(a) }._2
        else if (connected.nonEmpty) connected.minBy { case (a, _) => card(a) }._2
        else 0
      val next = remaining.remove(idx)
      val frame = atomFrame(edges, next, b)
      val shared = frame.columns.filter(accCols.contains).toSeq
      acc =
        if (shared.nonEmpty) acc.join(frame, shared)
        else {
          // Disconnected atom: broadcast it rather than let a
          // CartesianProduct re-scan both sides per partition pair — but
          // only when it is constant-anchored (one entity's adjacency list,
          // bounded by max degree; the case in every declared query type).
          // An unanchored disconnected atom is a full relation: broadcasting
          // that would blow the driver at scale, so it stays a plain cross
          // join and AQE picks the physical strategy.
          val anchored = Seq(next.head, next.tail).exists(_.isConst)
          acc.crossJoin(if (anchored) broadcast(frame) else frame)
        }
    }
    // Negated atoms: anti-join on the atom's (bound) variables (R4).
    cq.neg.foreach { a =>
      val frame = atomFrame(edges, a, b)
      val accCols = acc.columns.toSet
      val cols = frame.columns.toSeq
      require(cols.forall(accCols.contains),
        s"negated atom ${a.lstr} has variables unbound by positive atoms")
      acc = acc.join(frame, cols, "left_anti")
    }
    acc.drop("_const_hit")
  }

  /** Evaluate a full formula: DNF -> per-conjunct eval -> union -> distinct
    * projection onto the free variable, output column `f`. */
  def evalFormula(edges: DataFrame, f: Formula, b: Binding,
                  relStats: Map[Long, Long] = Map.empty): DataFrame = {
    val cqs = Normalize.toDnf(f)
    val free = cqs.head.freeVar.name
    cqs.map(cq => evalCQ(edges, cq, b, relStats)
         .select(col(free).cast("long").as("f")))
       .reduce(_ unionAll _)
       .distinct()
  }

  /** End-to-end: derive the KG edges from `dir` and answer the lstr query,
    * with cached relation-cardinality stats driving the atom order. */
  def run(spark: SparkSession, dir: String, lstr: String, b: Binding): DataFrame =
    evalFormula(KG.edges(spark, dir), Parser.parse(lstr), b,
                KG.relStats(spark, dir))

  // ---- tagged train/full split evaluation (one pass for two KGs) -------

  /** [[atomFrame]] over a tagged edge relation `(src, rel, dst, _tr)`,
    * keeping the train flag as column `trAs`. Per-atom frames remain
    * duplicate-free on their variable columns (edges is a set), so `_tr`
    * is well-defined per assignment. */
  private def atomFrameT(edges: DataFrame, a: Atomic, b: Binding,
                         trAs: String): DataFrame = {
    val relId = b.getOrElse(a.rel,
      throw new IllegalArgumentException(s"unbound relation ${a.rel}"))
    val df = edges.filter(col("rel") === relId)
    (a.head.isConst, a.tail.isConst) match {
      case (true, true) =>
        // Zero-or-one row: groupBy over the matches (empty input ⇒ empty
        // frame ⇒ the conjunct fails, like the untagged limit(1)).
        df.filter(col("src") === b(a.head.name) && col("dst") === b(a.tail.name))
          .groupBy(lit(1L).as("_const_hit"))
          .agg(max(col("_tr")).as(trAs))
      case (true, false) =>
        df.filter(col("src") === b(a.head.name))
          .select(col("dst").as(a.tail.name), col("_tr").as(trAs))
      case (false, true) =>
        df.filter(col("dst") === b(a.tail.name))
          .select(col("src").as(a.head.name), col("_tr").as(trAs))
      case (false, false) =>
        if (a.head.name == a.tail.name)
          df.filter(col("src") === col("dst"))
            .select(col("src").as(a.head.name), col("_tr").as(trAs))
        else
          df.select(col("src").as(a.head.name), col("dst").as(a.tail.name),
                    col("_tr").as(trAs))
    }
  }

  /** Evaluate one conjunct over tagged edges and report, per free-variable
    * answer `f`, membership in the FULL-KG answer set and in the TRAIN-KG
    * answer set — ONE join pipeline instead of two evaluations. An
    * assignment is train-derivable iff every positive atom's edge is a
    * train edge AND no negated atom matches a train edge; it is a full
    * answer iff no negated atom matches any edge. (Note train answers are
    * NOT a subset of full answers under negation: removing train edges can
    * admit new answers — both memberships are computed independently.)
    * Join ordering is identical to [[evalCQ]]. Returns
    * `(f, _in_full ∈ {0,1}, _in_easy ∈ {0,1})` with one row per
    * satisfying assignment (callers aggregate by `f`). */
  def evalCQTagged(edgesT: DataFrame, cq: CQ, b: Binding,
                   relStats: Map[Long, Long] = Map.empty): DataFrame = {
    require(cq.pos.nonEmpty, "conjunct needs at least one positive atom")
    def card(a: Atomic): Long = relStats.getOrElse(b(a.rel), Long.MaxValue)
    var trIdx = 0
    def freshTr(): String = { trIdx += 1; s"_tr$trIdx" }
    val trCols = scala.collection.mutable.ListBuffer.empty[String]

    val remaining = scala.collection.mutable.ListBuffer(
      cq.pos.sortBy(a => (-Seq(a.head, a.tail).count(_.isConst), card(a))): _*)
    var acc = {
      val c = freshTr(); trCols += c
      atomFrameT(edgesT, remaining.remove(0), b, c)
    }
    while (remaining.nonEmpty) {
      val accCols = acc.columns.toSet
      val connected = remaining.zipWithIndex.filter { case (a, _) =>
        Seq(a.head, a.tail).exists(t => t.isVar && accCols.contains(t.name))
      }
      val fullyBound = connected.filter { case (a, _) =>
        Seq(a.head, a.tail).forall(t => !t.isVar || accCols.contains(t.name))
      }
      val idx =
        if (fullyBound.nonEmpty) fullyBound.minBy { case (a, _) => card(a) }._2
        else if (connected.nonEmpty) connected.minBy { case (a, _) => card(a) }._2
        else 0
      val next = remaining.remove(idx)
      val c = freshTr(); trCols += c
      val frame = atomFrameT(edgesT, next, b, c)
      val shared = frame.columns.filter(x => x != c && accCols.contains(x)).toSeq
      acc =
        if (shared.nonEmpty) acc.join(frame, shared)
        else {
          val anchored = Seq(next.head, next.tail).exists(_.isConst)
          acc.crossJoin(if (anchored) broadcast(frame) else frame)
        }
    }
    // Negated atoms: left join against the per-key (exists, any-train)
    // aggregate — the tagged twin of the anti-join.
    val negChecks = scala.collection.mutable.ListBuffer.empty[(String, String)]
    cq.neg.foreach { a =>
      val trc = freshTr()
      val exc = trc + "_ex"
      val frame0 = atomFrameT(edgesT, a, b, trc)
      val keys = frame0.columns.filterNot(_ == trc).toSeq
      val accCols = acc.columns.toSet
      require(keys.forall(accCols.contains),
        s"negated atom ${a.lstr} has variables unbound by positive atoms")
      val frame = frame0.groupBy(keys.map(col): _*)
        .agg(max(col(trc)).as(trc)).withColumn(exc, lit(1))
      acc = acc.join(frame, keys, "left")
      negChecks += ((exc, trc))
    }
    val inFull = negChecks
      .map { case (exc, _) => col(exc).isNull }
      .foldLeft(lit(true))(_ && _)
    val inEasy = negChecks
      .map { case (_, trc) => coalesce(col(trc), lit(0)) === 0 }
      .foldLeft(trCols.map(c => col(c) === 1).reduce(_ && _))(_ && _)
    acc.select(col(cq.freeVar.name).cast("long").as("f"),
               inFull.cast("int").as("_in_full"),
               inEasy.cast("int").as("_in_easy"))
  }

  /** Full-formula tagged evaluation: DNF → per-conjunct tagged eval →
    * union → per-answer max of both memberships. Returns
    * `(f, in_full ∈ {0,1}, in_easy ∈ {0,1})`, one row per entity that is
    * an answer in EITHER KG. */
  def evalFormulaTagged(edgesT: DataFrame, f: Formula, b: Binding,
                        relStats: Map[Long, Long] = Map.empty): DataFrame = {
    val cqs = Normalize.toDnf(f)
    cqs.map(evalCQTagged(edgesT, _, b, relStats))
      .reduce(_ unionAll _)
      .groupBy("f")
      .agg(max(col("_in_full")).as("in_full"),
           max(col("_in_easy")).as("in_easy"))
      .filter(col("in_full") === 1 || col("in_easy") === 1)
  }
}

/** ANSI-SQL generator mirroring [[HardExec]] for the DuckDB oracle. */
object OracleSql {

  /** SQL for one conjunct: positive atoms as a self-join of `relName`,
    * negated atoms as correlated NOT EXISTS. */
  def cqSql(cq: CQ, b: Binding, relName: String = "edges"): String = {
    val varCol = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val conds = scala.collection.mutable.ListBuffer.empty[String]
    cq.pos.zipWithIndex.foreach { case (a, i) =>
      val al = s"a$i"
      conds += s"$al.rel = ${b(a.rel)}"
      def endpoint(t: Term, c: String): Unit =
        if (t.isConst) conds += s"$al.$c = ${b(t.name)}"
        else varCol.get(t.name) match {
          case Some(prev) => conds += s"$al.$c = $prev"
          case None       => varCol(t.name) = s"$al.$c"
        }
      endpoint(a.head, "src")
      endpoint(a.tail, "dst")
    }
    cq.neg.foreach { a =>
      def ep(t: Term, c: String): String =
        if (t.isConst) s"n.$c = ${b(t.name)}" else s"n.$c = ${varCol(t.name)}"
      conds += s"NOT EXISTS (SELECT 1 FROM $relName n WHERE n.rel = ${b(a.rel)} " +
        s"AND ${ep(a.head, "src")} AND ${ep(a.tail, "dst")})"
    }
    val free = cq.freeVar.name
    val from = cq.pos.indices.map(i => s"$relName a$i").mkString(", ")
    s"SELECT DISTINCT CAST(${varCol(free)} AS BIGINT) AS f FROM $from WHERE ${conds.mkString(" AND ")}"
  }

  /** Full-formula SQL (UNION dedups across conjuncts), with the KG CTE. */
  def formulaSql(lstr: String, b: Binding): String = {
    val cqs = Normalize.toDnf(Parser.parse(lstr))
    KG.edgesCte + cqs.map(cqSql(_, b)).mkString(" UNION ")
  }

  /** Formula SQL over an arbitrary edges-shaped relation, no CTE prefix —
    * building block for composed oracles (e.g. train/full workload eval). */
  def formulaSqlOver(lstr: String, b: Binding, relName: String): String =
    Normalize.toDnf(Parser.parse(lstr))
      .map(cqSql(_, b, relName)).mkString(" UNION ")
}
