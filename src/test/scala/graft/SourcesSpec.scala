package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.VectorOps
import graft.plans.GraftExtensions
import graft.sources.ImagingStore

class SourcesSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("partitioned store round-trips and prunes partitions") {
    val out = Files.createTempDirectory("graft_store").toString
    ImagingStore.writeFrames(spark, sfDir, out)
    val prj = ImagingStore.readProject(spark, out, "PRJ1")
    assert(prj.count() > 0)
    assert(prj.filter(col("project") =!= "PRJ1").count() === 0)
    // partition pruning must show up in the scan, not as a post-filter
    val plan = prj.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(project"), plan)
  }

  test("word_ngrams is callable from SQL once extensions install") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      "SELECT word_ngrams('a b c d', 3) AS g, word_ngrams('a b') AS short")
      .head()
    assert(row.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(row.getSeq[String](1) === Seq("a b"))
  }

  test("embedding near-dup recovers the planted copies") {
    val planted = VectorOps.embNearDup(spark, sfDir)
      .filter(col("v2") === col("v1") + 1000000L)
    assert(planted.count() ===
      graft.tables.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") % 50 === 0).count())
    assert(planted.filter(col("cos") < 0.999999).count() === 0)
  }
}
