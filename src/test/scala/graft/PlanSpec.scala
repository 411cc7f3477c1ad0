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

  test("custom expressions survive CODEGEN_ONLY (doGenCode is real)") {
    // force codegen with no interpreted fallback: a broken doGenCode
    // in WordNGrams/HyperplaneBits fails here instead of silently
    // falling back to the interpreted path
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val sh = graft.functions.TextExpressions
        .wordNGrams(org.apache.spark.sql.functions.lit("a b c d e"), 3)
      val row = spark.range(1).select(sh.as("g"),
        graft.functions.HyperplaneBits.bits(
          org.apache.spark.sql.functions.expr(
            "array_repeat(cast(1.0 as float), 64)")).as("fp"))
        .head()
      assert(row.getSeq[String](0) === Seq("a b c", "b c d", "c d e"))
      assert(row.getLong(1) !== 0L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
