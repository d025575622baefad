package graft

import graft.lang.Binding.Binding
import graft.model.KG
import graft.model.KG._

/** The reference's declared query workload — 15 BetaE types + 11 EFO-1
  * extended types (knovex/utils/metric.py:6-66) — each with a concrete
  * partial interpretation over the KG derived from the driver testdata
  * (see [[graft.model.KG]] for the relation vocabulary).
  */
object KGQueries {
  private val N1 = ent(TAG_NATION, 1)
  private val N2 = ent(TAG_NATION, 2)
  private val R0 = ent(TAG_REGION, 0)
  private val S0 = ent(TAG_SUPPLIER, 0)
  private val S1 = ent(TAG_SUPPLIER, 1)
  private val S2 = ent(TAG_SUPPLIER, 2)
  private val G1 = ent(TAG_SEGMENT, 1) // BUILDING

  private val invNC = inverse(REL_CUST_NATION)    // 1: nation -> customer
  private val invNS = inverse(REL_SUPP_NATION)    // 3: nation -> supplier
  private val invRN = inverse(REL_NATION_REGION)  // 5: region -> nation
  private val invCO = inverse(REL_ORDER_CUST)     // 7: customer -> order
  private val invSP = inverse(REL_PART_SUPP)      // 9: supplier -> part
  private val invGC = inverse(REL_CUST_SEGMENT)   // 11: segment -> customer
  private val invPC = inverse(REL_CUST_PART)      // 15: part -> customer
  private val invPCB = inverse(REL_CUST_PART_BULK) // 19: part -> bulk buyer

  /** (name, lstr, binding) — lstrs verbatim from metric.py:6-66. */
  val all: Seq[(String, String, Binding)] = Seq(
    ("kg_1p", "r1(s1,f)",
      Map("r1" -> invNC, "s1" -> N1)),
    ("kg_2p", "r1(s1,e1)&r2(e1,f)",
      Map("r1" -> invRN, "r2" -> invNC, "s1" -> R0)),
    ("kg_3p", "r1(s1,e1)&r2(e1,e2)&r3(e2,f)",
      Map("r1" -> invRN, "r2" -> invNC, "r3" -> invCO, "s1" -> R0)),
    ("kg_2i", "r1(s1,f)&r2(s2,f)",
      Map("r1" -> invSP, "r2" -> invSP, "s1" -> S0, "s2" -> S1)),
    ("kg_3i", "r1(s1,f)&r2(s2,f)&r3(s3,f)",
      Map("r1" -> invSP, "r2" -> invSP, "r3" -> invSP,
          "s1" -> S0, "s2" -> S1, "s3" -> S2)),
    // ip/inp/up bindings route the final hop through customer->order
    // (support-1 edges): the old part->supplier final hop left every
    // answer multiply-supported, so the train split produced ZERO
    // held-out (hard) answers and the workload-eval row was vacuous.
    ("kg_ip", "r1(s1,e1)&r2(s2,e1)&r3(e1,f)",
      Map("r1" -> invNC, "r2" -> invGC, "r3" -> invCO,
          "s1" -> N1, "s2" -> G1)),
    ("kg_pi", "r1(s1,e1)&r2(e1,f)&r3(s2,f)",
      Map("r1" -> invRN, "r2" -> invNC, "r3" -> invGC,
          "s1" -> R0, "s2" -> G1)),
    ("kg_2in", "r1(s1,f)&!r2(s2,f)",
      Map("r1" -> invSP, "r2" -> invSP, "s1" -> S0, "s2" -> S1)),
    ("kg_3in", "r1(s1,f)&r2(s2,f)&!r3(s3,f)",
      Map("r1" -> invSP, "r2" -> invSP, "r3" -> invSP,
          "s1" -> S0, "s2" -> S1, "s3" -> S2)),
    ("kg_inp", "r1(s1,e1)&!r2(s2,e1)&r3(e1,f)",
      Map("r1" -> invNC, "r2" -> invGC, "r3" -> invCO,
          "s1" -> N1, "s2" -> G1)),
    ("kg_pin", "r1(s1,e1)&r2(e1,f)&!r3(s2,f)",
      Map("r1" -> invRN, "r2" -> invNC, "r3" -> invGC,
          "s1" -> R0, "s2" -> G1)),
    ("kg_pni", "r1(s1,e1)&!r2(e1,f)&r3(s2,f)",
      Map("r1" -> invRN, "r2" -> invNC, "r3" -> invGC,
          "s1" -> R0, "s2" -> G1)),
    ("kg_2u", "r1(s1,f)|r2(s2,f)",
      Map("r1" -> invSP, "r2" -> invSP, "s1" -> S0, "s2" -> S1)),
    ("kg_up", "(r1(s1,e1)|r2(s2,e1))&r3(e1,f)",
      Map("r1" -> invNC, "r2" -> invGC, "r3" -> invCO,
          "s1" -> N1, "s2" -> G1)),
    ("kg_up_dnf", "(r1(s1,e1)&r3(e1,f))|(r2(s2,e1)&r3(e1,f))",
      Map("r1" -> invNC, "r2" -> invGC, "r3" -> invCO,
          "s1" -> N1, "s2" -> G1)),
    // EFO-1 extended types (metric.py:48-63)
    ("kg_2m", "((r1(s1,e1))&(r2(e1,f)))&(r3(e1,f))",
      Map("r1" -> invNC, "r2" -> REL_CUST_PART, "r3" -> REL_CUST_PART_BULK,
          "s1" -> N1)),
    ("kg_2nm", "((r1(s1,e1))&(r2(e1,f)))&(!(r3(e1,f)))",
      Map("r1" -> invNC, "r2" -> REL_CUST_PART, "r3" -> REL_CUST_PART_BULK,
          "s1" -> N1)),
    // 3mp/3pm/3pcp: final hop lands on bulk-buyer customers (3mp/3pcp)
    // or dual-edge cust->part pairs (3pm) — sparse support, so the train
    // split yields nonempty held-out answers (the old part->supplier
    // final hop was too redundantly supported to ever lose an answer).
    ("kg_3mp", "(((r1(s1,e1))&(r2(e1,e2)))&(r3(e2,f)))&(r4(e1,e2))",
      Map("r1" -> invNC, "r2" -> REL_CUST_PART, "r3" -> invPCB,
          "r4" -> REL_CUST_PART_BULK, "s1" -> N1)),
    ("kg_3pm", "(((r1(s1,e1))&(r2(e1,e2)))&(r3(e2,f)))&(r4(e2,f))",
      Map("r1" -> invRN, "r2" -> invNC, "r3" -> REL_CUST_PART,
          "r4" -> REL_CUST_PART_BULK, "s1" -> R0)),
    ("kg_im", "(((r1(s1,e1))&(r2(s2,e1)))&(r3(e1,f)))&(r4(e1,f))",
      Map("r1" -> invSP, "r2" -> invSP, "r3" -> invPC, "r4" -> invPCB,
          "s1" -> S0, "s2" -> S1)),
    ("kg_2il", "(r1(s1,f))&(r2(e1,f))",
      Map("r1" -> invSP, "r2" -> REL_CUST_PART_BULK, "s1" -> S0)),
    ("kg_3il", "((r1(s1,f))&(r2(s2,f)))&(r3(e1,f))",
      Map("r1" -> invSP, "r2" -> invSP, "r3" -> REL_CUST_PART_BULK,
          "s1" -> S0, "s2" -> S1)),
    ("kg_3c", "((((r1(s1,e1))&(r2(e1,f)))&(r3(s2,e2)))&(r4(e2,f)))&(r5(e1,e2))",
      Map("r1" -> invNC, "r2" -> REL_CUST_PART, "r3" -> invNS,
          "r4" -> invSP, "r5" -> REL_CUST_SUPP, "s1" -> N1, "s2" -> N2)),
    ("kg_3cm", "(((((r1(s1,e1))&(r2(e1,f)))&(r3(s2,e2)))&(r4(e2,f)))&(r5(e1,e2)))&(r6(e1,f))",
      Map("r1" -> invNC, "r2" -> REL_CUST_PART, "r3" -> invNS,
          "r4" -> invSP, "r5" -> REL_CUST_SUPP, "r6" -> REL_CUST_PART_BULK,
          "s1" -> N1, "s2" -> N2)),
    ("kg_3pcp", "(((((r1(s1,e1))&(r2(e1,e3)))&(r3(s2,e2)))&(r4(e2,e3)))&(r5(e1,e2)))&(r6(e3,f))",
      Map("r1" -> invNC, "r2" -> REL_CUST_PART, "r3" -> invNS,
          "r4" -> invSP, "r5" -> REL_CUST_SUPP, "r6" -> invPCB,
          "s1" -> N1, "s2" -> N2))
  )
}
