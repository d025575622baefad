package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.DataLayout

/** Property sweep for the CDC operators over RANDOM snapshot pairs:
  * whatever subset of ids is dropped/added and whatever payloads are
  * edited, (a) applyChanges(base, diff, cur) must equal cur row-for-row,
  * (b) scd2's open rows must equal cur and its closed-row count must be
  * removed + changed, (c) the diff statuses must partition correctly.
  * 40 random seeds over a 200-row id space. */
class CdcPropertySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("cdc diff/apply/scd2 invariants hold over random snapshot pairs") {
    val rnd = new scala.util.Random(29)
    (0 until 40).foreach { trial =>
      val n = 50 + rnd.nextInt(150)
      val pDrop = rnd.nextDouble() * 0.4
      val pAdd = rnd.nextDouble() * 0.4
      val pEdit = rnd.nextDouble() * 0.5
      // base/cur membership + payload edits drawn per id
      val rows = (0 until n).map { id =>
        val inBase = rnd.nextDouble() >= pAdd   // absent from base = added
        val inCur = rnd.nextDouble() >= pDrop   // absent from cur = removed
        val edited = rnd.nextDouble() < pEdit
        (id.toLong, inBase, inCur, edited, s"payload-$trial-$id")
      }
      val base = rows.collect { case (id, true, _, e, p) =>
        (id, if (e) p + "-v1" else p)
      }.toDF("doc_id", "text")
      val cur = rows.collect { case (id, _, true, _, p) => (id, p) }
        .toDF("doc_id", "text")

      val diff = DataLayout.snapshotDiff(base, cur, "doc_id",
                                         md5(col("text")))
      val st = diff.groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
      val expAdded = rows.count(r => !r._2 && r._3)
      val expRemoved = rows.count(r => r._2 && !r._3)
      val expChanged = rows.count(r => r._2 && r._3 && r._4)
      assert(st("added") == expAdded, s"trial=$trial added")
      assert(st("removed") == expRemoved, s"trial=$trial removed")
      assert(st("changed") == expChanged, s"trial=$trial changed")

      val merged = DataLayout.applyChanges(base, diff, cur, "doc_id")
      assert(merged.exceptAll(cur).isEmpty && cur.exceptAll(merged).isEmpty,
        s"trial=$trial applyChanges != cur")

      val hist = DataLayout.scd2(base, cur, "doc_id", md5(col("text")))
      val open = hist.filter(col("valid_to") === -1L)
        .select(col("id").as("doc_id"), col("fp"))
      val curFp = cur.select(col("doc_id"), md5(col("text")).as("fp"))
      assert(open.exceptAll(curFp).isEmpty && curFp.exceptAll(open).isEmpty,
        s"trial=$trial scd2 open rows != cur")
      assert(hist.filter(col("valid_to") =!= -1L).count() ==
        expRemoved + expChanged, s"trial=$trial scd2 closed rows")
    }
  }
}
