package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.TextOps

class ScratchProfile3 extends AnyFunSuite {
  import SparkTestSession.spark

  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[p5] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  test("bisect winnow after fix", org.scalatest.Tag("graft.Manual")) {
    val dir = "/root/testdata/sf0.1"
    val docs = graft.model.KG.table(spark, dir, "documents")
    docs.count()
    val sf = TextOps.shingleFrame(docs, "doc_id", "text", 4)
    time("shingleFrame")(sf.count())
    time("shingleFrame2")(sf.count())
    println(sf.queryExecution.optimizedPlan.treeString.take(1200))
    time("winnow")(TextOps.winnow(docs, "doc_id", "text").count())
    time("winnow2")(TextOps.winnow(docs, "doc_id", "text").count())
    time("pmi")(graft.pipeline.CorpusStats.pmiTopK(docs, "doc_id", "text").count())
    time("repetition")(graft.pipeline.CorpusStats.repetition(docs, "doc_id", "text").count())
    time("jaccard")(graft.pipeline.Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5).count())
  }
}
