package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DocumentStore
import graft.streaming.DocsStream

class DocsStreamSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  private def censusOf(base: String) = spark.table(
    DocsStream.currentCensus(base).getOrElse(fail(s"no census for $base")))

  test("streaming ingest keeps the dedup census equal to the batch " +
      "census of everything ingested") {
    val src = Files.createTempDirectory("graft_docsrc").toString
    val ckpt = Files.createTempDirectory("graft_docckpt").toString
    val docTable = "graft_stream_docs"
    val censusBase = "graft_stream_census"
    DocsStream.reset(censusBase)
    for (t <- Seq(docTable, censusBase + "_batch", censusBase + "_v0",
        censusBase + "_v1")) DocumentStore.clearStale(spark, t)

    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    // batch 1: the first half of the corpus; batch 2: the second half
    // PLUS re-keyed copies of some batch-1 docs — cross-batch
    // duplicates only the census merge can see
    docs.filter(col("doc_id") < 250).coalesce(1)
      .write.parquet(src + "/f1.parquet")
    docs.filter(col("doc_id") >= 250)
      .unionByName(docs.filter(col("doc_id") < 250 && col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 9000000L))
      .coalesce(1).write.parquet(src + "/f2.parquet")

    val source = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1") // force ≥2 micro-batches
      .parquet(src + "/*.parquet")
    val q = DocsStream.ingestDedup(spark, source, docTable, censusBase,
      ckpt)
    q.awaitTermination()

    // expected: the census computed directly over everything ingested
    val ingested = docs.unionByName(
      docs.filter(col("doc_id") < 250 && col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 9000000L))
    val expected = ingested
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val got = censusOf(censusBase)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === expected)

    // the cross-batch duplicates are visible with batch-1 keepers
    val dups = censusOf(censusBase).filter(col("n") >= 2)
      .filter(col("keeper") < 250)
    assert(dups.count() > 0, "cross-batch duplicate groups missing")

    // the doc store itself holds every ingested row in bucket layout
    assert(spark.table(docTable).count() === ingested.count())
  }

  test("a replayed micro-batch is a no-op (at-least-once safety)") {
    val docTable = "graft_replay_docs"
    val censusBase = "graft_replay_census"
    DocsStream.reset(censusBase)
    for (t <- Seq(docTable, censusBase + "_batch", censusBase + "_v0",
        censusBase + "_v1")) DocumentStore.clearStale(spark, t)
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select("doc_id", "text").filter(col("doc_id") < 100)

    DocsStream.absorbBatch(spark, docs, docTable, censusBase, 0L)
    val after1 = censusOf(censusBase).agg(
      count(lit(1)), sum("n")).collect().head
    val stored1 = spark.table(docTable).count()
    // foreachBatch redelivers the SAME batchId after a failure —
    // the second application must change nothing
    DocsStream.absorbBatch(spark, docs, docTable, censusBase, 0L)
    val after2 = censusOf(censusBase).agg(
      count(lit(1)), sum("n")).collect().head
    assert(after2 === after1, "replay double-counted the census")
    assert(spark.table(docTable).count() === stored1,
      "replay re-appended the doc store")
  }
}
