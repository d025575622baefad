package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, exact through
  * approximate:
  *
  *  - exact: hash-groupBy on content digest;
  *  - n-gram Jaccard: exact set similarity via a shingle equi-join;
  *  - MinHash + LSH banding: shingle → k minhashes → b bands → bucket join,
  *    then exact-Jaccard verification of candidates only;
  *  - SimHash: 64-bit signature + banded blocking + Hamming filter;
  *  - embedding near-dup: cosine over an `ARRAY<DOUBLE>` column, LSH-bucketed.
  *
  * Scale design: every op is (narrow map) → (equi-join on a compact key) →
  * (aggregate); no cross joins. The LSH paths bound the candidate set so the
  * expensive verification join is proportional to true-near-dup density, not
  * |docs|². Bucket joins shuffle on the band/bucket hash — high-cardinality
  * keys, AQE-coalesced.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content digest with the
    * canonical (minimum) id and the copy count. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Ids to drop under exact dedup (everything but the canonical id). */
  def exactDropIds(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), md5(col(textCol)).as("digest"))
      .join(exactGroups(df, idCol, textCol), "digest")
      .filter(col("id") =!= col("keep_id"))
      .select(col("id"))

  /** Distinct (id, shingle) pairs — the exploded set representation. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
              explode(TextOps.shingles(col(textCol), n)).as("sh"))
      .distinct()

  /** Exact n-gram Jaccard near-dup pairs (i < j, jaccard >= threshold).
    * Set-similarity join: shingle equi-join counts intersections; per-doc
    * set sizes provide the union via inclusion-exclusion. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, n)
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = sets.as("a")
      .join(sets.as("b"),
            col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("id").as("i"), col("sz").as("szi")), "i")
      .join(sizes.select(col("id").as("j"), col("sz").as("szj")), "j")
      .withColumn("jaccard", col("c") / (col("szi") + col("szj") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signature: sig[i] = min over shingles of xxhash64(i, shingle).
    * Pure expression — no shuffle to build signatures. */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
              i => array_min(transform(shingleArr, s => xxhash64(i, s))))

  /** MinHash+LSH candidate pairs, verified with exact Jaccard.
    * numHashes = bands * rowsPerBand. Candidates are pairs sharing at least
    * one band hash (shingle→minhash→band→bucket-join). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = df.select(
      col(idCol).as("id"),
      minhashSignature(TextOps.shingles(col(textCol), shingleN), numHashes).as("sig"))
    val banded = sig.select(
      col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        j => xxhash64(slice(col("sig"), j * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("band", "bh")))
    val cands = banded.as("a")
      .join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
    // Verify candidates with exact Jaccard on the shingle sets.
    val sets = shingleSets(df, idCol, textCol, shingleN)
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("sz"))
    cands
      .join(sets.as("sa"), col("i") === col("sa.id"))
      .join(sets.as("sb"),
            col("j") === col("sb.id") && col("sa.sh") === col("sb.sh"))
      .groupBy("i", "j").agg(count(lit(1)).as("c"))
      .join(sizes.select(col("id").as("i"), col("sz").as("szi")), "i")
      .join(sizes.select(col("id").as("j"), col("sz").as("szj")), "j")
      .withColumn("jaccard", col("c") / (col("szi") + col("szj") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup pairs within a Hamming radius, blocked on 4×16-bit
    * bands (pigeonhole: pairs at distance <= 3 share at least one band). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
                       simhashExpr(textCol).as("sim"))
    val banded = sh.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(j =>
        shiftrightunsigned(col("sim"), j * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bh")))
    banded.as("a")
      .join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
              bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** 64-bit SimHash over the token multiset: bit i is the sign of the sum
    * of ±1 contributions of each token's xxhash64 bit i. Expressed via the
    * SQL parser (shiftleft with a column shift amount is only reachable
    * there, not through the Scala functions API). Expression-only — no
    * shuffle; for very long documents an exploded formulation that hashes
    * each token once is preferable. */
  def simhashExpr(textColName: String): Column = {
    val toksSql = s"split($textColName, ' ')"
    expr(
      s"""aggregate(sequence(0, 63), 0L, (acc, i) -> acc |
         |  IF(aggregate($toksSql, 0L,
         |       (a, t) -> a + (shiftright(xxhash64(t), CAST(i AS INT)) & 1L) * 2 - 1) > 0,
         |     shiftleft(1L, CAST(i AS INT)), 0L))""".stripMargin)
  }

  /** Embedding-cosine near-dup pairs via random-hyperplane LSH buckets +
    * exact cosine verification (see Similarity.hyperplaneBucket). */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.95, planes: Int = 12,
                     seed: Double = 4.2): DataFrame = {
    val bucketed = emb.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      Similarity.hyperplaneBucket(col(vecCol), planes, seed).as("bucket"))
    bucketed.as("a")
      .join(bucketed.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
              graft.score.VectorOps.cosine(col("a.vec"), col("b.vec")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), round(col("cos"), 6).as("cos"))
  }
}
