package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lang._

class LangSpec extends AnyFunSuite {

  val allLstrs: Seq[String] = KGQueries.all.map(_._2)

  test("parser round-trip: parse(f.lstr) == f for all 25 declared types") {
    allLstrs.foreach { s =>
      val f = Parser.parse(s)
      assert(Parser.parse(f.lstr) == f, s"round-trip failed for $s")
    }
  }

  test("term kinds by prefix") {
    assert(Term("s1").kind == 0)
    assert(Term("e2").kind == 1)
    assert(Term("f").kind == 2)
  }

  test("nnf pushes negation to atoms") {
    val f = Parser.parse("!((r1(s1,f))&(!(r2(s2,f))))")
    val n = Normalize.nnf(f)
    def ok(g: Formula): Boolean = g match {
      case _: Atomic      => true
      case Not(_: Atomic) => true
      case Not(_)         => false
      case And(l, r)      => ok(l) && ok(r)
      case Or(l, r)       => ok(l) && ok(r)
    }
    assert(ok(n))
    assert(n == Or(Not(Atomic("r1", Term("s1"), Term("f"))),
                   Atomic("r2", Term("s2"), Term("f"))))
  }

  test("dnf of up: (r1|r2)&r3 -> two conjuncts each containing r3") {
    val cqs = Normalize.toDnf(Parser.parse("(r1(s1,e1)|r2(s2,e1))&r3(e1,f)"))
    assert(cqs.size == 2)
    assert(cqs.forall(_.pos.exists(_.rel == "r3")))
    assert(cqs(0).pos.exists(_.rel == "r1") && cqs(1).pos.exists(_.rel == "r2"))
  }

  test("dnf splits negation correctly (2nm keeps neg atom in conjunct)") {
    val cqs = Normalize.toDnf(Parser.parse("((r1(s1,e1))&(r2(e1,f)))&(!(r3(e1,f)))"))
    assert(cqs.size == 1)
    assert(cqs.head.pos.map(_.rel).sorted == Vector("r1", "r2"))
    assert(cqs.head.neg.map(_.rel) == Vector("r3"))
  }

  test("every declared type has exactly one free variable per conjunct") {
    allLstrs.foreach { s =>
      Normalize.toDnf(Parser.parse(s)).foreach(cq => assert(cq.freeVar.name == "f"))
    }
  }
}
