package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lang._
import graft.lang.Binding.Binding
import graft.exec.HardExec

/** HardExec vs a brute-force EFO-1 model checker on a random tiny KG.
  * Covers R1-R5 (scan/join/union/anti-join/projection) for all 25 declared
  * query shapes with three different bindings each. */
class HardExecSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // Deterministic random KG: 30 entities, 6 relations (3 inverse pairs).
  val rnd = new scala.util.Random(7)
  val nEnt = 30
  val baseTriples: Set[(Long, Long, Long)] =
    (0 until 220).map { _ =>
      (rnd.nextInt(nEnt).toLong, 2L * rnd.nextInt(3), rnd.nextInt(nEnt).toLong)
    }.toSet
  val triples: Set[(Long, Long, Long)] =
    baseTriples ++ baseTriples.map { case (h, r, t) => (t, r ^ 1, h) }

  lazy val edgesDf = triples.toSeq.toDF("src", "rel", "dst")

  def bruteForce(f: Formula, b: Binding): Set[Long] = {
    val entities = (0L until nEnt).toSet
    def sat(g: Formula, asg: Map[String, Long]): Boolean = g match {
      case Atomic(r, h, t) =>
        val hv = if (h.isConst) b(h.name) else asg(h.name)
        val tv = if (t.isConst) b(t.name) else asg(t.name)
        triples.contains((hv, b(r), tv))
      case Not(g0)   => !sat(g0, asg)
      case And(l, r) => sat(l, asg) && sat(r, asg)
      case Or(l, r)  => sat(l, asg) || sat(r, asg)
    }
    val vars = f.terms.filter(_.isVar).map(_.name).distinct
    val exVars = vars.filterNot(_ == "f")
    def anyAssign(remaining: List[String], asg: Map[String, Long]): Boolean =
      remaining match {
        case Nil => sat(f, asg)
        case v :: rest => entities.exists(e => anyAssign(rest, asg + (v -> e)))
      }
    entities.filter(c => anyAssign(exVars.toList, Map("f" -> c)))
  }

  def randomBinding(f: Formula, seed: Int): Binding = {
    val r = new scala.util.Random(seed)
    val names = (f.atoms.map(_.rel) ++ f.terms.filter(_.isConst).map(_.name)).distinct
    names.map { n =>
      if (n.startsWith("r")) n -> (2L * r.nextInt(3) + r.nextInt(2))
      else n -> rnd.nextInt(nEnt).toLong
    }.toMap
  }

  test("stats-driven atom ordering does not change results") {
    val stats = triples.groupBy(_._2).map { case (r, ts) => r -> ts.size.toLong }
    Seq("r1(s1,e1)&r2(e1,e2)&r3(e2,f)",
        "((((r1(s1,e1))&(r2(e1,f)))&(r3(s2,e2)))&(r4(e2,f)))&(r5(e1,e2))")
      .foreach { lstr =>
        val f = Parser.parse(lstr)
        val b = randomBinding(f, 77)
        val plain = HardExec.evalFormula(edgesDf, f, b)
          .collect().map(_.getLong(0)).toSet
        val ordered = HardExec.evalFormula(edgesDf, f, b, stats)
          .collect().map(_.getLong(0)).toSet
        assert(plain == ordered)
      }
  }

  test("disconnected components: anchored and unanchored cross joins") {
    // The unanchored disconnected atom r2(e1,e2) exercises the plain
    // (non-broadcast) cross-join branch; the anchored variant r2(s2,e1)
    // exercises the broadcast branch. Both against brute force.
    Seq("r1(s1,f)&r2(e1,e2)", "r1(s1,f)&r2(s2,e1)").foreach { lstr =>
      val f = Parser.parse(lstr)
      (1 to 2).foreach { seed =>
        val b = randomBinding(f, seed * 17 + lstr.hashCode)
        val got = HardExec.evalFormula(edgesDf, f, b)
          .collect().map(_.getLong(0)).toSet
        assert(got == bruteForce(f, b), s"$lstr binding=$b")
      }
    }
  }

  KGQueries.all.foreach { case (name, lstr, _) =>
    test(s"$name matches brute force on random KG") {
      val f = Parser.parse(lstr)
      (1 to 3).foreach { seed =>
        val b = randomBinding(f, seed * 31 + name.hashCode)
        val got = HardExec.evalFormula(edgesDf, f, b)
          .collect().map(_.getLong(0)).toSet
        val want = bruteForce(f, b)
        assert(got == want, s"binding=$b")
      }
    }
  }
}
