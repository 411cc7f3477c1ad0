package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{RangeJoinExec, RangeJoinOp}

class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def intervals = Seq(
    // overlapping, unordered, with a gap at [40, 50)
    (0L, 10L, 20L), (1L, 0L, 15L), (2L, 30L, 40L), (3L, 12L, 13L),
    (4L, 50L, 60L)
  ).toDF("iid", "start_ns", "end_ns")

  private def points = (0L to 70L by 5).map(t => (t, t)).toDF("pid", "ts")

  test("range join matches the nested-loop reference join") {
    val custom = RangeJoinOp
      .rangeJoin(points, intervals, "ts", "start_ns", "end_ns")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val reference = points.join(intervals,
        col("ts") >= col("start_ns") && col("ts") < col("end_ns"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(custom === reference)
    assert(custom.nonEmpty)
    // spot semantics: t=10 is inside [10,20) and [0,15); t=40 is in
    // NOTHING ([30,40) is half-open, [50,60) starts later); t=35 only
    // in [30,40)
    assert(custom.filter(_._1 == 10L).map(_._2) === Set(0L, 1L))
    assert(!custom.exists(_._1 == 40L))
    assert(custom.filter(_._1 == 35L).map(_._2) === Set(2L))
  }

  test("the plan runs RangeJoinExec, not a nested loop") {
    val plan = RangeJoinOp
      .rangeJoin(points, intervals, "ts", "start_ns", "end_ns")
      .queryExecution.executedPlan
    assert(plan.collectFirst { case e: RangeJoinExec => e }.isDefined,
      s"no RangeJoinExec in:\n$plan")
    assert(!plan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("an oversized interval side fails loudly instead of OOMing the driver") {
    spark.conf.set(RangeJoinExec.MaxBuildRowsKey, "3")
    try {
      val e = intercept[Exception] {
        RangeJoinOp.rangeJoin(points, intervals, "ts", "start_ns", "end_ns")
          .collect()
      }
      // the guard fires driver-side in doExecute; depending on the
      // execution path it may arrive bare or wrapped once
      val msg = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msg.contains("broadcasts the interval side")
          && msg.contains(RangeJoinExec.MaxBuildRowsKey),
        s"guard message unhelpful: $msg")
    } finally spark.conf.unset(RangeJoinExec.MaxBuildRowsKey)
    // and with the default cap the same query still runs
    assert(RangeJoinOp.rangeJoin(points, intervals, "ts", "start_ns", "end_ns")
      .count() > 0)
  }

  test("empty interval side yields empty output, not an error") {
    val out = RangeJoinOp.rangeJoin(points, intervals.filter(lit(false)),
      "ts", "start_ns", "end_ns")
    assert(out.count() === 0)
  }
}
