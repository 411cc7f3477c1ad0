package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-shuffled storage so fact-fact joins run with NO
  * exchange at read time — the layout strategy that amortizes the big
  * join's shuffle once at write time instead of every query. This is
  * the 100 TB answer for the lineitem⋈orders class of joins that can
  * never broadcast.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("co-bucketed tables sort-merge join with zero exchanges") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_buckets").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bdemo LOCATION '$tmp'")
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBcast = spark.conf.get(bcastKey)
    try {
      graft.tables.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("graft_bdemo.li_b")
      graft.tables.Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderstatus")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("graft_bdemo.ord_b")
      // disable broadcast so the join must co-locate on the buckets
      spark.conf.set(bcastKey, "-1")
      val joined = spark.table("graft_bdemo.li_b")
        .join(spark.table("graft_bdemo.ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still computes the right thing
      val expected = graft.tables.Tables.lineitem(spark, sfDir).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set(bcastKey, prevBcast)
      spark.sql("DROP TABLE IF EXISTS graft_bdemo.li_b")
      spark.sql("DROP TABLE IF EXISTS graft_bdemo.ord_b")
      spark.sql("DROP DATABASE IF EXISTS graft_bdemo")
    }
  }
}
