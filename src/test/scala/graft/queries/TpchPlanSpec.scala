package graft.queries

import graft.SparkSpec
import graft.tools.PlanGate

/** Plan-shape pins for the TPC-H block: the value of these gates is
  * the OPERATOR shapes, so the physical strategies that make them
  * scale are asserted, not assumed — semi/anti joins stay joins (no
  * row-exploding rewrite), dimension joins broadcast, scan-only
  * aggregates push their predicates and prune their columns, and no
  * gate plans a global window or a cartesian product.
  */
class TpchPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    TpchQueries.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("EXISTS/NOT-EXISTS shapes plan as semi/anti joins") {
    assert(plan("q4_priority").contains("LeftSemi"), "q4 must semi-join")
    assert(plan("q22_opportunity").contains("LeftAnti"), "q22 must anti-join")
    assert(plan("q16_counts").contains("LeftAnti"),
      "q16's NOT-IN supplier exclusion must anti-join")
  }

  test("dimension joins broadcast") {
    for (q <- Seq("q2_mincost", "q9_profit", "q14_promo", "q19_disjunct"))
      assert(plan(q).contains("BroadcastHashJoin"), s"$q must broadcast its dims")
  }

  test("Q6 pushes every predicate to the scan and prunes columns") {
    val p = plan("q6_forecast")
    // the executedPlan string ELIDES long filter lists ("l_shipda…"),
    // so assert on the head of the pushed list, not a full predicate
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(3000))
    // the scan must read only the 4 referenced columns, not all 11
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("l_shipdate") && read.contains("l_discount") &&
      read.contains("l_quantity") && read.contains("l_extendedprice"), read)
    assert(!read.contains("l_partkey") && !read.contains("l_returnflag"), read)
  }

  test("no TPC-H gate plans a global window or cartesian product") {
    val violations = TpchQueries.queries.keys.toSeq.sorted.flatMap { name =>
      PlanGate.planViolations(name, TpchQueries.queries(name)(spark, sfDir))
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
