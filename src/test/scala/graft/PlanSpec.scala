package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Olap
import graft.imaging.ImagingOps

/** Plan-shape audits: the properties that matter at 100 TB must be
  * visible in the optimized plan, not assumed.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("dataset search pushes its filters into the parquet scan") {
    val plan = planOf(ImagingOps.datasetSearch(spark, sfDir))
    assert(plan.contains("PushedFilters: ["),
      s"no pushed filters in:\n$plan")
    // the status filter on orders is a plain column predicate → pushable
    assert(plan.contains("o_orderpriority"), plan)
  }

  test("q1 reads only the columns it needs") {
    val plan = planOf(Olap.q1Pricing(spark, sfDir))
    assert(!plan.contains("l_suppkey") && !plan.contains("l_partkey"),
      s"scan not pruned:\n$plan")
  }

  test("frames subset broadcasts the dataset dimension") {
    val plan = planOf(ImagingOps.framesSubset(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"no broadcast join in:\n$plan")
  }

  test("q1 stays inside whole-stage codegen") {
    // AQE hides the physical plan until execution; run it, then read
    // the finalized plan
    val df = Olap.q1Pricing(spark, sfDir)
    df.collect()
    // codegen stages print as "*(n) Operator" in the finalized plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan)
  }
}
