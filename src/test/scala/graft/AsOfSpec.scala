package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps
import graft.plans.AsOf

class AsOfSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("as-of join picks the latest right row at or before each left") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 50L), (4L, 20L, 500L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 100L), (10L, 200L), (30L, 1L))
      .toDF("s_user", "signup_ts")
    val got = AsOf.asofJoin(left, right, "user_id", "s_user", "ts", "signup_ts")
      .select("event_id", "signup_ts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // event 1 at t=100 -> signup 100 (inclusive); event 2 at 205 -> 200;
    // event 3 at 50 -> none (dropped); event 4 user 20 -> none
    assert(got === Map(1L -> 100L, 2L -> 200L))
  }

  test("events_asof runs on the custom physical operator") {
    val df = EventOps.eventsAsof(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // physical nodes print without the Exec suffix
    assert(plan.contains("AsOfJoin"), plan)
    // sanity: lag is never negative and every joined user had a signup
    assert(df.filter(col("lag_sec") < 0).count() === 0)
  }
}
