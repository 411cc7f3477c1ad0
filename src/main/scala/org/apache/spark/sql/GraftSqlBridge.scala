package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Rollup => CatalystRollup}
import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
import org.apache.spark.sql.catalyst.plans.logical.Aggregate

/** Bridge into the sql-private Column↔Expression converters (Spark 4
  * moved the public `new Column(expr)` constructor behind
  * classic.ExpressionUtils, which is private[sql]).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def analyzedPlan(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** `GROUP BY ROLLUP(groupCols) ... sum(c) AS alias` built directly as
    * a catalyst Aggregate over `df`'s analyzed plan. Exists because
    * Spark 4.1's Dataset-API `rollup()` trips DetectAmbiguousSelfJoin
    * whenever the child plan legitimately re-reads a relation already
    * in its subtree (aliases don't pacify the check — it keys on
    * Dataset-lineage plan tags, which a hand-built node never carries).
    * The analyzer expands the Rollup marker through
    * ResolveGroupingAnalytics into the identical Expand+Aggregate the
    * SQL `ROLLUP` path produces — without the per-call temp-view
    * registration + re-resolution that path costs.
    */
  def rollupSums(df: Dataset[_], groupCols: Seq[String],
      sums: Seq[(String, String)]): DataFrame = {
    val groups = groupCols.map(UnresolvedAttribute(_))
    val aggs = groups ++ sums.map { case (src, alias) =>
      Alias(Sum(UnresolvedAttribute(src)).toAggregateExpression(), alias)()
    }
    ofRows(df.sparkSession,
      Aggregate(Seq(CatalystRollup(groups.map(Seq(_)))), aggs,
        analyzedPlan(df)))
  }
}
