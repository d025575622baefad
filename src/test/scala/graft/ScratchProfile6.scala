package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold stage-by-stage breakdown of dedup_clean_corpus in execution order,
  * fresh JVM (run via Test/runMain graft.ScratchProfile6). */
object ScratchProfile6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Dedup

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm scan

    val P = 2147483647L
    val sets0 = time("a shingleSets (checkpoint)")(
      Dedup.shingleSets(docs, "doc_id", "text", 3))
    val sets = sets0.withColumn("_mh_base",
      pmod(graft.functions.PortableHash.md5Prefix60(col("sh")), lit(P)))
    val sigAggs = (0 until 32).map(i =>
      min(pmod(col("_mh_base") * (2 * i + 1) + lit(i * 12582917L), lit(P))))
    val sig = sets.groupBy("id").agg(array(sigAggs: _*).as("sig"))
    def bandHash(j: Int) = md5(concat_ws("|", slice(col("sig"), j * 4 + 1, 4)))
    val banded = time("b sig+banding (checkpoint)")(
      sig.select(col("id"),
        posexplode(array((0 until 8).map(bandHash): _*)).as(Seq("band", "bh")))
        .localCheckpoint(true))
    val cands = time("c candidates (checkpoint)")(
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("i"), col("b.id").as("j"))
        .distinct().localCheckpoint(true))
    val candIds = cands.select(col("i").as("id"))
      .unionAll(cands.select(col("j").as("id"))).distinct()
    val candSets = sets0.join(broadcast(candIds), "id").select(col("id"), col("sh"))
    val sizes = candSets.groupBy("id").agg(count(lit(1)).as("sz"))
    val pairs = time("d verify (checkpoint)")(
      cands.join(candSets.as("sa"), col("i") === col("sa.id"))
        .join(candSets.as("sb"),
              col("j") === col("sb.id") && col("sa.sh") === col("sb.sh"))
        .groupBy("i", "j").agg(count(lit(1)).as("c"))
        .join(sizes.select(col("id").as("i"), col("sz").as("szi")), "i")
        .join(sizes.select(col("id").as("j"), col("sz").as("szj")), "j")
        .withColumn("jaccard", col("c") / (col("szi") + col("szj") - col("c")))
        .filter(col("jaccard") >= 0.5)
        .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
        .localCheckpoint(true))
    val nearDrops = time("e dupGroups")(
      Dedup.dupGroups(pairs).filter(col("id") =!= col("keep_id"))
        .select(col("id").as("doc_id")).localCheckpoint(true))
    time("f exact + anti-joins") {
      val exactDrops = Dedup.exactDropIds(docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"))
        .join(exactDrops, Seq("doc_id"), "left_anti")
        .join(nearDrops, Seq("doc_id"), "left_anti").count()
    }
    spark.stop()
  }
}
