package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    * rank, cos). Self-matches excluded. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.select(col("id").as("nid"), col("vec").as("nvec"))
      .crossJoin(broadcast(
        queries.select(col("id").as("qid"), col("vec").as("qvec"))))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
              VectorOps.cosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"),
              round(col("cos"), 6).as("cos"))
  }

  /** Sign-signature bucket from `planes` deterministic random hyperplanes:
    * bit j = sign(dot(vec, plane_j)). */
  def hyperplaneBucket(vec: Column, planes: Int, seed: Double): Column =
    aggregate(sequence(lit(0), lit(planes - 1)), lit(0L), (acc, j) => {
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
                 (x, i) => x * sin((j * 131 + i + 1) * 0.7 + seed)),
        lit(0.0), (a, x) => a + x)
      acc * 2 + when(d > 0, 1L).otherwise(0L)
    })

  /** LSH-bucketed approximate top-k with `probes` independent hash tables.
    * Same output shape as [[bruteTopK]]; recall < 1 by construction. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8, probes: Int = 2, seed: Double = 4.2): DataFrame = {
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
              VectorOps.cosine(col("qvec"), col("nvec")).as("cos"))
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
    def cellOf(vec: Column): Column = {
      val scored = transform(sequence(lit(0), lit(nCentroids - 1)), c => {
        val cvec = Embeddings.deterministicVec(c.cast("long"), dim, seed)
        struct((-VectorOps.dot(vec, cvec)).as("negdot"), c.as("cell"))
      })
      array_min(scored).getField("cell")
    }
    val c = corpus.select(col("id").as("nid"), col("vec").as("nvec"),
                          cellOf(col("vec")).as("cell"))
    val q = queries.select(col("id").as("qid"), col("vec").as("qvec"),
                           cellOf(col("vec")).as("cell"))
    val cands = c.join(broadcast(q), "cell").filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
              VectorOps.cosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"),
              round(col("cos"), 6).as("cos"))
  }
}
