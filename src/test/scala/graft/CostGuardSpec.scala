package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plan.CostGuard

/** The cost/timeout kill-switch: budget parsing per graphd-cost.c,
  * request-scoped job cancellation, and cost reporting.
  */
class CostGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cost strings parse per the reference: unknown keys reject all") {
    // cost2.sh: the six runtime-addressable keys parse and render in
    // graphd_cost_limit_to_string member order
    val ok = CostGuard.parseCostLimit("dr=1 tu=3 ts=5 ir=7 in=9 pr=11")
    assert(ok.isRight)
    assert(CostGuard.renderCost(ok.toOption.get) ==
      "ts=5 tu=3 pr=11 dr=1 ir=7 in=9")
    // cost1.sh: mm/mt are config-file-only — the whole string fails
    val bad = CostGuard.parseCostLimit(
      "dr=1 tu=3 ts=5 ir=7 in=9 pr=11 mm=13 mt=15")
    assert(bad == Left(
      "cannot parse cost string \"dr=1 tu=3 ts=5 ir=7 in=9 pr=11 mm=13 mt=15\""))
    assert(CostGuard.parseCostLimit("falafel=$3.50").isLeft)
    // budget = tightest of tr/te/tu
    assert(CostGuard.budgetMillis(Map("tu" -> 300L, "tr" -> 100L)) ==
      Some(100L))
    assert(CostGuard.budgetMillis(Map("dr" -> 5L)).isEmpty)
  }

  test("a request past its budget is killed; the session survives") {
    val slow = spark.range(1000000L).toDF("a")
      .crossJoin(spark.range(1000000L).toDF("b"))
    val e = intercept[CostGuard.CostLimitExceeded] {
      CostGuard.run(spark, Some(300L))(slow.count())
    }
    assert(e.budgetMillis == 300L)
    // the engine is still healthy: the next request runs normally
    val (n, report) = CostGuard.run(spark, Some(60000L))(
      spark.range(100L).count())
    assert(n == 100L)
    assert(report.contains("tr=") && report.contains("tu="))
  }

  test("collectWithCost: timeout= modifier enforced, cost report returned") {
    import graft.model.Primitive.node
    val st = graft.store.GraphStore.fromSeq(spark, Seq(
      node(1, name = Some("t"), value = Some("v1")),
      node(2, value = Some("v2")), node(3, value = Some("v3"))))
    val (rows, report) = graft.plan.ReadPlanner.collectWithCost(st,
      """read (timeout=60 cost="tu=600000" value!=null result=((value)))""")
    assert(rows.length == 3)
    assert(report.startsWith("tr=") && report.contains("tu="))
  }

  test("parser rejects malformed cost strings with SEMANTICS") {
    val e = intercept[graft.gql.Parser.ParseError] {
      graft.gql.Parser.parseRead("""read (cost="falafel=$3.50" any)""")
    }
    assert(e.getMessage.contains("cannot parse cost string"))
  }
}
