package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale contract lives in the physical
  * plan (pushdown, pruned reads, broadcast dims, codegen) — these assertions
  * keep a refactor from silently trading it away.
  */
class PlanShapeSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q6: filters reach the parquet scan, read schema is pruned to 3 columns") {
    val p = planOf("q6_forecast_revenue")
    assert(p.contains("PushedFilters:") && p.contains("LessThan(l_quantity,24.0)"), p.take(800))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double>"))
  }

  test("q2: dimension joins are broadcast hash joins with pruned scans") {
    val p = planOf("q2_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("ReadSchema: struct<n_nationkey:int,n_name:string>")) // nation pruned
  }

  test("q1: aggregation is partial (map-side combine) inside codegen") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_sum"), p.take(1200))
    // note: whole-stage-codegen markers only appear in the AQE final plan
    // (isFinalPlan=true, post-execution), so they are not asserted here
  }

  test("s1: codegen'd fdot expression is in the plan (no higher-order lambda)") {
    val p = planOf("s1_ann_brute")
    assert(p.contains("graft_fdot"), p.take(1200))
    assert(!p.contains("zip_with"))
  }

  test("q3: global top-K compiles to TakeOrderedAndProject (no full sort)") {
    val p = planOf("q3_top_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }
}
