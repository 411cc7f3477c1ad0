package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DocumentStore

/** The bucketed document store: dedup census queries must consume the
  * bucket layout with ZERO exchanges, and produce byte-identical
  * results to the shuffle-based operators they amortize.
  */
class DocumentStoreSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  private def plantedCorpus = {
    // documents ∪ a re-keyed copy of every 5th doc — the same planted
    // duplicate corpus DedupOps queries run on
    val d = graft.tables.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "source", "lang")
    d.unionByName(d.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  test("dedup census over the bucketed store runs with zero exchanges") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_docstore").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_docs LOCATION '$tmp'")
    try {
      DocumentStore.write(plantedCorpus, "graft_docs.corpus_b", nBuckets = 8)

      for ((name, df) <- Seq(
          "dupGroups" -> DocumentStore.dupGroups(spark, "graft_docs.corpus_b"),
          "digestGroups" -> DocumentStore.digestGroups(spark, "graft_docs.corpus_b"))) {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"$name must ride the bucket layout, not shuffle:\n$plan")
      }

      // same duplicate groups as the shuffle-based operator
      val stored = DocumentStore.dupGroups(spark, "graft_docs.corpus_b")
        .orderBy("h").collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2)))
      val direct = graft.ops.DedupOps.exactDedup(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(stored.nonEmpty)
      assert(stored.toSeq === direct.toSeq)

      // keeper election parity with the pipeline's rep selection
      val keepers = DocumentStore.digestGroups(spark, "graft_docs.corpus_b")
      val expected = graft.ops.DedupOps.digestGroups(
        plantedCorpus.select(col("doc_id"),
          md5(lower(trim(col("text")))).as("h")))
      assert(keepers.except(expected).count() === 0)
      assert(expected.except(keepers).count() === 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_docs.corpus_b")
      spark.sql("DROP DATABASE IF EXISTS graft_docs")
    }
  }
}
