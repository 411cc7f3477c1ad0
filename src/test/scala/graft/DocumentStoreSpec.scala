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

  test("dupGroupsFor builds once per JVM and matches the inline operator") {
    // the driver-checked store twin: same rows as doc_exact_dedup,
    // build amortized (second call must reuse the table, not rewrite)
    val first = DocumentStore.dupGroupsFor(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val table = DocumentStore.ensureBuilt(spark, sfDir)
    val again = DocumentStore.dupGroupsFor(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(DocumentStore.ensureBuilt(spark, sfDir) == table)
    val inline = graft.ops.DedupOps.exactDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(first.toSeq === inline.toSeq)
    assert(again.toSeq === inline.toSeq)
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

  test("incremental census absorbs a batch with zero exchanges") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_docstore_inc").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_inc LOCATION '$tmp'")
    try {
      // day 0: first half of the corpus + its census
      val full = plantedCorpus
      val day0 = full.filter(col("doc_id") % 2 === 0)
      val batch = full.filter(col("doc_id") % 2 =!= 0)
      DocumentStore.write(day0, "graft_inc.docs", nBuckets = 8)
      DocumentStore.writeCensus(spark, "graft_inc.docs",
        "graft_inc.census", nBuckets = 8)

      // day 1: batch arrives — append in layout, census it alone
      DocumentStore.append(batch, "graft_inc.docs", nBuckets = 8)
      DocumentStore.write(batch, "graft_inc.batch", nBuckets = 8)
      DocumentStore.writeCensus(spark, "graft_inc.batch",
        "graft_inc.batch_census", nBuckets = 8)

      val merged = DocumentStore.mergedCensus(spark,
        "graft_inc.census", "graft_inc.batch_census")
      // the merge must ride both bucket layouts — no Exchange anywhere
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"incremental census merge must not shuffle:\n$plan")

      // parity: merged incremental state == full recompute over the
      // appended store
      val fromScratch = DocumentStore.read(spark, "graft_inc.docs")
        .groupBy("h")
        .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
      assert(merged.except(fromScratch).count() === 0)
      assert(fromScratch.except(merged).count() === 0)
      // and the appended store kept its bucket layout: census over it
      // still runs exchange-free
      val censusPlan = DocumentStore.dupGroups(spark, "graft_inc.docs")
        .queryExecution.executedPlan.toString
      assert(!censusPlan.contains("Exchange"),
        s"appended store lost its bucket layout:\n$censusPlan")
    } finally {
      Seq("docs", "census", "batch", "batch_census").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_inc.$t"))
      spark.sql("DROP DATABASE IF EXISTS graft_inc")
    }
  }
}
