package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan audit (guide §7.2): for every declared query, count
  * how many times each base parquet table is scanned in the physical
  * plan — a scan count ≥ 2 of the same table means a shared subtree
  * is recomputed per consumer branch (the r14 tokenize-once finding,
  * mechanically). Plans only; nothing is executed beyond whatever
  * eager materialization a query's own construction performs.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [minCount]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val minCount = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = graft.tables.Tables.names
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val counts = tables.map(t =>
          t -> s"$t\\.parquet".r.findAllIn(plan).length)
          .filter(_._2 >= minCount)
        if (counts.nonEmpty)
          println(s"[audit] $name: " +
            counts.map { case (t, n) => s"$t=$n" }.mkString(" "))
      } catch { case e: Throwable =>
        println(s"[audit] $name: ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
