package graft.operators

import graft.SparkTestBase

import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-shape audit for the composite TPC-H-style keys: correctness is
 * the oracle's job; these tests pin the 100-TB-relevant physical
 * choices — dimension sides broadcast, fact aggregates run partial →
 * final, top-k never global-sorts, and no join degenerates into a
 * cartesian product.
 */
class ComplexQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def plan(key: String): String = {
    val df = QueryRegistry.queries(key)(spark, dir)
    df.collect() // under AQE the final plan materializes only after an action
    df.queryExecution.executedPlan.toString
  }

  test("q5: all five dimension joins broadcast; no cartesian product") {
    val p = plan("q_tpch_q5")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // lineitem joins orders/supplier/customer/nation(+region): every
    // non-fact side is broadcast — the only shuffle is the final groupBy
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 4, s"expected >=4 broadcast joins, got $bhj\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q1: aggregate is partial then final (map-side combine crosses the shuffle)") {
    val p = plan("q_tpch_q1")
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs\n${p.take(2000)}")
  }

  test("q3 and q10: top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("q_tpch_q3").contains("TakeOrderedAndProject"))
    assert(plan("q_tpch_q10").contains("TakeOrderedAndProject"))
  }

  test("q6: both filters reach the parquet scan") {
    val p = plan("q_tpch_q6")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate") &&
      p.contains("GreaterThanOrEqual"), p.take(2500))
  }

  test("q4/q16/q22: EXISTS and NOT IN compile to semi/anti joins, no cartesian") {
    val p4 = plan("q_tpch_q4")
    assert(p4.contains("LeftSemi"), p4.take(2000))
    assert(!p4.contains("CartesianProduct"))
    val p16 = plan("q_tpch_q16")
    assert(p16.contains("LeftAnti"), p16.take(2000))
    assert(!p16.contains("CartesianProduct"))
    val p22 = plan("q_tpch_q22")
    assert(p22.contains("LeftAnti"), p22.take(2000))
    // the 1-row average broadcasts; the anti join keys on o_custkey
    assert(p22.contains("BroadcastNestedLoopJoin") || p22.contains("BroadcastHashJoin"))
  }

  test("q17: correlated-average join stays equi (no cartesian, no nested loop)") {
    val p = plan("q_tpch_q17")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoop"), p.take(2000))
  }

  test("q2/q11/q20: derived-partsupp joins broadcast their dimensions, no cartesian") {
    val p2 = plan("q_tpch_q2")
    // region-filtered supplier+nation, filtered part, AND the per-part
    // min-cost aggregate (bounded by the part dimension) all broadcast
    assert("BroadcastHashJoin".r.findAllIn(p2).length >= 5, p2.take(2500))
    assert(!p2.contains("CartesianProduct"))
    val p11 = plan("q_tpch_q11")
    assert(p11.contains("BroadcastHashJoin"), p11.take(2000))
    assert(!p11.contains("CartesianProduct"))
    val p20 = plan("q_tpch_q20")
    assert(p20.contains("BroadcastHashJoin"), p20.take(2000))
    assert(!p20.contains("CartesianProduct"))
  }

  test("q21: EXISTS / NOT EXISTS fold into ONE per-order aggregate (no semi/anti fact joins)") {
    // both EXISTS tests are per-order set predicates, re-spelled as
    // min/max aggregates joined once — the plan must carry NO
    // semi/anti join (each would re-shuffle the full fact) and a
    // partial_min/partial_max aggregate on the fact side
    val p = plan("q_tpch_q21")
    assert(!p.contains("LeftSemi"), p.take(2000))
    assert(!p.contains("LeftAnti"), p.take(2000))
    assert(p.contains("partial_min") || p.contains("min("), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q12: shipmode/date filters cut lineitem before the orderkey join") {
    val p = plan("q_tpch_q12")
    assert(!p.contains("CartesianProduct"))
    // the derived-column filters are expression-level (not scan-pushed —
    // they are computed columns), but they must sit BELOW the join
    val joinIdx = p.indexOf("Join")
    val filterIdx = p.indexOf("Filter")
    assert(joinIdx >= 0 && filterIdx > joinIdx, // executedPlan prints top-down
      s"expected Filter below the join\n${p.take(2500)}")
  }

  test("retention cohort counts are internally consistent") {
    val r = QueryRegistry.queries("q_agg_retention")(spark, dir).collect()(0)
    val (v, vc, vp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= vc && v >= vp, s"view cohort must dominate: $v, $vc, $vp")
    assert(v > 0)
  }

  test("ch-dialect query equals its ANSI spelling on the same session") {
    val chd = QueryRegistry.queries("q_ch_dialect")(spark, dir)
    val ansi = Q.t(spark, dir, "orders").selectExpr(
      "o_orderkey",
      "year(o_orderdate) * 100 + month(o_orderdate) AS yyyymm",
      "trunc(o_orderdate, 'month') AS month_start",
      "weekday(o_orderdate) + 1 AS dow",
      "CAST(o_totalprice AS BIGINT) AS price_int",
      "CASE WHEN o_totalprice > 300000.0 THEN 'high' WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'low' END AS tier",
      "array_join(sort_array(split(lower(o_orderpriority), '-')), '_') AS prio_norm")
    assert(chd.exceptAll(ansi).isEmpty && ansi.exceptAll(chd).isEmpty)
  }
}
