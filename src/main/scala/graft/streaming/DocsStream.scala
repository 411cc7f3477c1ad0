package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.DocumentStore

/** Streaming document ingest wired into the incremental dedup state —
  * the loop a growing 100 TB corpus actually runs: micro-batches of
  * new documents land in the bucketed [[DocumentStore]] layout and the
  * persistent digest census absorbs each batch with the zero-exchange
  * full-outer merge ([[DocumentStore.mergedCensus]]). Per micro-batch
  * cost is O(batch + census) — stored text is NEVER rescanned, which
  * is the whole contract: dedup state stays current at ingest rate,
  * not at corpus-rescan rate.
  *
  * The stream side is `foreachBatch`: the dedup merge is a batch plan
  * over bucketed tables (exactly the right tool — none of the
  * stateful-operator machinery fits a saveAsTable sink), and
  * `Trigger.AvailableNow` drains and terminates, so the same entry
  * point serves continuous ingest and catch-up backfill.
  */
object DocsStream {

  /** Start the ingest loop over a streaming `source` of documents
    * (any plan with `doc_id` and `text` columns). Each micro-batch:
    *  1. appends to the bucketed doc store (digest computed at write
    *     time, co-located with existing buckets);
    *  2. collapses to a batch census (one batch-sized shuffle — the
    *     only exchange in the loop);
    *  3. absorbs it into the persistent census via the zero-exchange
    *     bucketed merge, then atomically swaps the census table name
    *     (single-writer pipeline: drop + rename, the managed-table
    *     equivalent of a pointer swap).
    */
  def ingestDedup(spark: SparkSession, source: DataFrame,
      docTable: String, censusTable: String,
      checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        absorbBatch(spark, batch, docTable, censusTable)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** One ingest step — also the batch-mode entry (a backfill driver
    * can call it directly with a static DataFrame).
    */
  def absorbBatch(spark: SparkSession, batch: DataFrame,
      docTable: String, censusTable: String): Unit = {
    DocumentStore.append(batch, docTable)
    val batchCensus = censusTable + "_batch"
    batch
      .withColumn("h", md5(lower(trim(col("text")))))
      .groupBy("h")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
      .write.bucketBy(DocumentStore.DefaultBuckets, "h").sortBy("h")
      .mode("overwrite").saveAsTable(batchCensus)
    if (!spark.catalog.tableExists(censusTable)) {
      // bootstrap: the first batch's census IS the state
      spark.sql(s"ALTER TABLE $batchCensus RENAME TO $censusTable")
    } else {
      val staging = censusTable + "_staging"
      DocumentStore.clearStale(spark, staging)
      DocumentStore.mergedCensus(spark, censusTable, batchCensus)
        .write.bucketBy(DocumentStore.DefaultBuckets, "h").sortBy("h")
        .mode("overwrite").saveAsTable(staging)
      spark.sql(s"DROP TABLE $censusTable")
      spark.sql(s"ALTER TABLE $staging RENAME TO $censusTable")
    }
  }
}
