package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Variadic

/** VariadicMatrix-op ≡ DataFrame-op equivalences on random ragged data
  * (SURVEY §5.3): each relational op is checked against a plain-Scala
  * reference on lists-of-lists. */
class VariadicPropertySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val rnd = new scala.util.Random(21)
  def randomLists(): Seq[Seq[Long]] =
    Seq.fill(6)(Seq.fill(rnd.nextInt(5))(rnd.nextInt(8).toLong))

  (1 to 5).foreach { iter =>
    test(s"random ragged equivalences, iteration $iter") {
      val la = randomLists()
      val lb = randomLists()
      val a = Variadic.fromLists(spark, la)
      val b = Variadic.fromLists(spark, lb)

      // R11 cartesian
      val cart = Variadic.cartesian(a, b).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val cartRef = la.indices.flatMap(i =>
        for (x <- la(i); y <- lb(i)) yield (i.toLong, x, y)).sorted
      assert(cart.toSeq == cartRef)

      // R14 duplicates
      val dups = Variadic.duplicates(a).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dupsRef = la.indices.flatMap { i =>
        la(i).groupBy(identity).collect { case (v, occ) if occ.size > 1 =>
          (i.toLong, v)
        }
      }.toSet
      assert(dups == dupsRef)

      // R16 append preserves the multiset
      val app = Variadic.append(a, b).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val appRef = (la.indices.flatMap(i => la(i).map((i.toLong, _))) ++
                    lb.indices.flatMap(i => lb(i).map((i.toLong, _)))).sorted
      assert(app.toSeq == appRef)

      // R18 range explode
      val bounds = Seq((0L, 3L), (2L, 2L), (5L, 8L)).toDF("s", "e")
      val re = Variadic.rangeExplode(bounds, "s", "e").select("s", "i")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val reRef = Seq((0L, 3L), (5L, 8L))
        .flatMap { case (s, e) => (s until e).map((s, _)) }.sorted
      assert(re.toSeq == reRef)

      // R19 first per value
      val idx = la.indices.flatMap(i => la(i).map((i.toLong, _)))
        .zipWithIndex.map { case ((r, v), j) => (r, v, j.toLong) }
      val fdf = idx.toDF("row", "value", "idx")
      val first = Variadic.firstPerValue(fdf, "idx").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val firstRef = idx.groupBy(_._2).map { case (v, xs) =>
        v -> xs.map(_._3).min
      }
      assert(first == firstRef)

      // R15 reindex: dense re-key == rank of the kept row key among kept
      // distinct keys (the dense_rank semantics, built without a window)
      val keepRows = la.indices.filter(_ % 2 == 0).map(_.toLong)
      val keptKeys = keepRows.filter(r => la(r.toInt).nonEmpty).sorted
      val r15 = Variadic.selectRows(a, keepRows.toDF("row"), reindex = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val r15Ref = keptKeys.flatMap(r =>
        la(r.toInt).map(v => (keptKeys.indexOf(r).toLong, v))).sorted
      assert(r15.toSeq == r15Ref)

      // R17 compactKeys: key_id == dense_rank over (row, value) - 1
      val allKeys = la.indices.flatMap(i => la(i).map((i.toLong, _)))
        .distinct.sorted
      val r17 = Variadic.compactKeys(a, Seq("row", "value")).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      allKeys.zipWithIndex.foreach { case (k, i) =>
        assert(r17(k) == i.toLong, s"compact key $k")
      }

      // A1 scatter-reduce (all four reductions)
      Seq("sum", "max", "min", "mean").foreach { op =>
        val out = Variadic.scatterReduce(a, op).collect()
          .map(r => r.getLong(0) -> r.get(1)).toMap
        la.indices.filter(la(_).nonEmpty).foreach { i =>
          val vs = la(i)
          val expect: Double = op match {
            case "sum"  => vs.sum.toDouble
            case "max"  => vs.max.toDouble
            case "min"  => vs.min.toDouble
            case "mean" => vs.sum.toDouble / vs.size
          }
          val got = out(i.toLong) match {
            case l: java.lang.Long   => l.toDouble
            case d: java.lang.Double => d.doubleValue
          }
          assert(math.abs(got - expect) < 1e-9, s"$op row $i")
        }
      }
    }
  }
}
