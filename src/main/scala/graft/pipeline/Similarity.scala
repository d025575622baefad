package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.ArrayKernels
import graft.score.{Embeddings, VectorOps}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteTopK]] — exact cosine top-k; the correctness baseline. The
  *    query side is broadcast; the corpus scan stays partition-parallel, and
  *    the per-query top-k is a WindowGroupLimit (rank pushdown, no full sort).
  *  - [[lshTopK]] — random-hyperplane LSH: corpus bucketed by sign
  *    signature; queries probe their bucket only. At 100 TB the bucket join
  *    replaces the |Q|×|corpus| cross product with |Q|×(corpus/2^planes)
  *    on average; multi-probe unions p independent tables to recover recall.
  */
object Similarity {

  /** Exact cosine top-k for each query id. Output: (query_id, neighbor_id,
    * rank, cos). Self-matches excluded. Scoring runs on the fused
    * [[ArrayKernels.arrayCosine]] codegen kernel — the |Q|×|corpus| scan is
    * the hot loop, and interpreted higher-order-function lambdas cost ~100×
    * per element. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    ArrayKernels.register(corpus.sparkSession)
    val scored = corpus.select(col("id").as("nid"), col("vec").as("nvec"))
      .crossJoin(broadcast(
        queries.select(col("id").as("qid"), col("vec").as("qvec"))))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
              ArrayKernels.arrayCosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"),
              round(col("cos"), 6).as("cos"))
  }

  /** Sign-signature bucket from `planes` deterministic random hyperplanes:
    * bit j = sign(dot(vec, plane_j)).
    *
    * Planes are materialized driver-side as array literals (plane_j[i] =
    * sin((j·131 + i + 1)·0.7 + seed), identical values to the former
    * in-plan formulation — Spark's `sin` is java.lang.Math.sin) and dotted
    * with the fused native kernel: whole-stage codegen, no per-element
    * lambda interpretation, no index-array allocation per row. `dim` must
    * be >= the vector width — the kernel truncates to the shorter side, so
    * a narrower plane would silently bucket on a vector prefix. The
    * default (512) gives headroom over any embedding width in use; pass
    * the real width explicitly for wider spaces. Callers must have
    * [[ArrayKernels]] registered. */
  def hyperplaneBucket(vec: Column, planes: Int, seed: Double,
                       dim: Int = 512): Column =
    (0 until planes).map { j =>
      val plane = typedLit(
        (0 until dim).map(i => math.sin((j * 131 + i + 1) * 0.7 + seed)))
      when(ArrayKernels.arrayDot(vec, plane) > 0,
           lit(1L << (planes - 1 - j))).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k with `probes` independent hash tables.
    * Same output shape as [[bruteTopK]]; recall < 1 by construction. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8, probes: Int = 2, seed: Double = 4.2): DataFrame = {
    ArrayKernels.register(corpus.sparkSession)
    val tables = (0 until probes).map { p =>
      val s = seed + p * 17.31
      val c = corpus.select(col("id").as("nid"), col("vec").as("nvec"),
                            hyperplaneBucket(col("vec"), planes, s).as("bucket"))
      val q = queries.select(col("id").as("qid"), col("vec").as("qvec"),
                             hyperplaneBucket(col("vec"), planes, s).as("bucket"))
      c.join(broadcast(q), "bucket").filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"), col("qvec"), col("nvec"))
    }
    val cands = tables.reduce(_ unionAll _).distinct()
      .select(col("qid"), col("nid"),
              ArrayKernels.arrayCosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"),
              round(col("cos"), 6).as("cos"))
  }

  /** IVF-style coarse quantization: assign each vector to the nearest of
    * `nCentroids` deterministic centroids (sin-seeded), search only the
    * query's cell (± none — single-cell for simplicity; multi-cell probing
    * unions like lshTopK). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, dim: Int, seed: Double = 2.7): DataFrame = {
    ArrayKernels.register(corpus.sparkSession)
    def cellOf(vec: Column): Column = {
      // Centroids as driver-side literals (same sin-seeded values as
      // Embeddings.deterministicVec) + fused native dots; argmin via the
      // same (neg-dot, cell) struct min as before.
      val scored = (0 until nCentroids).map { c =>
        val cvec = typedLit(
          (1 to dim).map(i => math.sin((c % 9973 + 1) * i * 0.017 + seed)))
        struct((-ArrayKernels.arrayDot(vec, cvec)).as("negdot"),
               lit(c).as("cell"))
      }
      array_min(array(scored: _*)).getField("cell")
    }
    val c = corpus.select(col("id").as("nid"), col("vec").as("nvec"),
                          cellOf(col("vec")).as("cell"))
    val q = queries.select(col("id").as("qid"), col("vec").as("qvec"),
                           cellOf(col("vec")).as("cell"))
    val cands = c.join(broadcast(q), "cell").filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
              ArrayKernels.arrayCosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"),
              round(col("cos"), 6).as("cos"))
  }

  /** Multi-probe IVF: the corpus is quantized to its single nearest cell;
    * each query probes its `probes` nearest cells — the standard
    * recall/cost knob (recall grows with probed cells, scan cost stays
    * |corpus|·probes/nCentroids on average). A neighbor can match at most
    * once (one corpus cell, distinct probe cells), so no dedup is needed. */
  def ivfTopKMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int,
                        nCentroids: Int = 16, dim: Int, probes: Int = 2,
                        seed: Double = 2.7): DataFrame = {
    ArrayKernels.register(corpus.sparkSession)
    def cellScores(vec: Column): Column = array((0 until nCentroids).map { c =>
      val cvec = typedLit(
        (1 to dim).map(i => math.sin((c % 9973 + 1) * i * 0.017 + seed)))
      struct((-ArrayKernels.arrayDot(vec, cvec)).as("negdot"),
             lit(c).as("cell"))
    }: _*)
    val c = corpus.select(col("id").as("nid"), col("vec").as("nvec"),
                          array_min(cellScores(col("vec"))).getField("cell").as("cell"))
    val q = queries.select(col("id").as("qid"), col("vec").as("qvec"),
        explode(slice(array_sort(cellScores(col("vec"))), 1, probes)).as("sc"))
      .select(col("qid"), col("qvec"), col("sc.cell").as("cell"))
    val cands = c.join(broadcast(q), "cell").filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
              ArrayKernels.arrayCosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"),
              round(col("cos"), 6).as("cos"))
  }
}
