package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Broadcast range (interval) join as a first-class operator — the
  * second custom physical operator after [[AsOfJoin]].
  *
  * Semantics: every left row (point time `t`, BIGINT) paired with
  * every right interval `[start, end)` containing it (inner join —
  * uncovered points drop out). Spark's native plan for
  * `l.t >= r.start && l.t < r.end` is a BroadcastNestedLoopJoin:
  * O(|L|·|R|) condition evaluations, a scale killer the moment the
  * interval table grows past a handful of rows.
  *
  * Physical strategy: the interval side (declared broadcast-small, the
  * way a calendar/maintenance-window/session-boundary table is) is
  * collected once, sorted by start, and shipped with a running
  * max-end prefix. Each left row then pays one binary search for the
  * last interval starting at-or-before `t`, plus a backward walk that
  * the max-end prefix cuts off as soon as no earlier interval can
  * still cover `t` — O(log |R| + overlap_depth) per row instead of
  * O(|R|). The left side is never shuffled at all.
  */
case class RangeJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftTime: Expression, rightStart: Expression, rightEnd: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}

case class RangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftTime: Expression, rightStart: Expression, rightEnd: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def doExecute(): RDD[InternalRow] = {
    val rStart = BindReferences.bindReference(rightStart, right.output)
    val rEnd = BindReferences.bindReference(rightEnd, right.output)
    // build-side contract enforcement: the interval side is collected
    // onto the driver, so a caller mistakenly passing a fact table must
    // fail LOUDLY, not OOM the driver. executeTake(cap + 1) pulls at
    // most cap+1 rows (incremental partition fetch), so even the
    // over-limit case never materializes the whole side.
    val cap = conf.getConfString(
      RangeJoinExec.MaxBuildRowsKey, "5000000").toInt
    val taken = right.executeTake(cap + 1)
    if (taken.length > cap) {
      throw new IllegalStateException(
        s"RangeJoin build (interval) side exceeds $cap rows — this " +
          "operator broadcasts the interval side and requires it to be " +
          "driver-small (a calendar/maintenance-window table, not a " +
          s"fact table). Raise ${RangeJoinExec.MaxBuildRowsKey} only " +
          "if the driver can really hold it.")
    }
    // sort the interval side once on the driver, then broadcast the
    // sorted arrays. NULL bounds match nothing (standard join
    // semantics) — without the guard a null would unbox to 0L and
    // fabricate [0, 0) rows
    val sorted = taken.flatMap { r =>
      val s = rStart.eval(r)
      val e = rEnd.eval(r)
      if (s == null || e == null) None
      else Some((s.asInstanceOf[Long], e.asInstanceOf[Long], r.copy()))
    }.sortBy(_._1)
    val starts = sorted.map(_._1)
    val ends = sorted.map(_._2)
    val rows = sorted.map(_._3)
    val maxEnd = new Array[Long](ends.length)
    var m = Long.MinValue
    var i = 0
    while (i < ends.length) {
      if (ends(i) > m) m = ends(i)
      maxEnd(i) = m
      i += 1
    }
    val bc = sparkContext.broadcast((starts, ends, rows, maxEnd))
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val outputAttrs = output
    left.execute().mapPartitions { lIter =>
      val (bStarts, bEnds, bRows, bMaxEnd) = bc.value
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      lIter.flatMap { lRow =>
        val tv = lTime.eval(lRow)
        if (tv == null) Iterator.empty else {
        val t = tv.asInstanceOf[Long]
        // last interval with start <= t
        var lo = 0
        var hi = bStarts.length - 1
        var idx = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (bStarts(mid) <= t) { idx = mid; lo = mid + 1 }
          else hi = mid - 1
        }
        if (idx < 0) Iterator.empty
        else {
          // multiple intervals can cover t; buffered output → each
          // projected row must be copied out of the reused buffer
          val out = Seq.newBuilder[InternalRow]
          var j = idx
          while (j >= 0 && bMaxEnd(j) > t) {
            if (bEnds(j) > t) out += proj(joined(lRow, bRows(j))).copy()
            j -= 1
          }
          out.result().iterator
        }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

object RangeJoinExec {
  /** Session conf capping the driver-collected interval side. */
  val MaxBuildRowsKey = "spark.graft.rangeJoin.maxBuildRows"
}

object RangeJoinOp {
  /** Range-join `left` (point rows) against `right` (interval rows) on
    * BIGINT time columns: rows where `start <= t < end`. The right
    * side must be broadcast-small; right columns keep their names.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
      leftTime: String, rightStart: String, rightEnd: String): DataFrame = {
    val spark = left.sparkSession
    GraftStrategies.ensureRegistered(spark)
    val node = RangeJoin(
      GraftSqlBridge.analyzedPlan(left), GraftSqlBridge.analyzedPlan(right),
      GraftSqlBridge.expression(left(leftTime)),
      GraftSqlBridge.expression(right(rightStart)),
      GraftSqlBridge.expression(right(rightEnd)))
    GraftSqlBridge.ofRows(spark, node)
  }
}
