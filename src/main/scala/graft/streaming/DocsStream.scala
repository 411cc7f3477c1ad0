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
  * Failure discipline (foreachBatch is at-least-once):
  *  - the census is VERSIONED — batch N merges `<base>_v<prevId>`
  *    into a fresh `<base>_v<batchId>`; no table is ever dropped or
  *    renamed before its successor exists, so there is no crash
  *    window in which the accumulated state is lost;
  *  - a replayed micro-batch (same batchId) is skipped outright via
  *    the applied-batch registry, so the census never double-counts;
  *  - the doc-store append itself remains at-least-once: a crash
  *    between the append and the census commit can leave a replayed
  *    batch's rows twice in the STORE (never in the census, which is
  *    rebuilt from the batch DataFrame, not the store). The census is
  *    the authoritative dedup state; duplicate store files are the
  *    standard at-least-once sink debt, settled by compaction.
  *  - the registry is JVM-scoped like [[DocumentStore.ensureBuilt]]'s
  *    build guard — the in-memory catalog cannot resurrect tables
  *    across JVMs; a metastore-backed catalog would extend exactly
  *    this registry into durable cross-restart recovery.
  *
  * The stream side is `foreachBatch`: the dedup merge is a batch plan
  * over bucketed tables (none of the stateful-operator machinery fits
  * a saveAsTable sink), and `Trigger.AvailableNow` drains and
  * terminates, so the same entry point serves continuous ingest and
  * catch-up backfill.
  */
object DocsStream {

  /** censusBase → (last applied batchId, current census table). */
  private val applied =
    scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** The current census table for a base, if any batch has landed. */
  def currentCensus(censusBase: String): Option[String] =
    applied.get(censusBase).map(_._2)

  /** Drop registry state for a base (test isolation). */
  private[graft] def reset(censusBase: String): Unit =
    applied.remove(censusBase)

  /** Start the ingest loop over a streaming `source` of documents
    * (any plan with `doc_id` and `text` columns). Each micro-batch:
    *  1. appends to the bucketed doc store (digest computed at write
    *     time, co-located with existing buckets);
    *  2. collapses to a batch census (one batch-sized shuffle — the
    *     only exchange in the loop);
    *  3. merges it with the current census version into
    *     `<base>_v<batchId>` (zero-exchange bucketed merge), then
    *     advances the registry and prunes the superseded version.
    */
  def ingestDedup(spark: SparkSession, source: DataFrame,
      docTable: String, censusBase: String,
      checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        absorbBatch(spark, batch, docTable, censusBase, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** One ingest step — also the batch-mode entry (a backfill driver
    * can call it directly, supplying its own monotonic batch ids).
    * Replay-idempotent: a batchId at or below the last applied one is
    * a no-op.
    */
  def absorbBatch(spark: SparkSession, batch: DataFrame,
      docTable: String, censusBase: String, batchId: Long): Unit =
    applied.synchronized {
      val prev = applied.get(censusBase)
      if (prev.exists(batchId <= _._1)) return // replayed batch
      DocumentStore.append(batch, docTable)
      val batchCensus = s"${censusBase}_batch"
      DocumentStore.clearStale(spark, batchCensus)
      batch
        .withColumn("h", md5(lower(trim(col("text")))))
        .groupBy("h")
        .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
        .write.bucketBy(DocumentStore.DefaultBuckets, "h").sortBy("h")
        .mode("overwrite").saveAsTable(batchCensus)
      val target = s"${censusBase}_v$batchId"
      DocumentStore.clearStale(spark, target)
      prev match {
        case None =>
          // bootstrap: the first batch's census IS the state (rename,
          // not copy — batchCensus is rebuilt from scratch next batch)
          spark.sql(s"ALTER TABLE $batchCensus RENAME TO $target")
        case Some((_, cur)) =>
          DocumentStore.mergedCensus(spark, cur, batchCensus)
            .write.bucketBy(DocumentStore.DefaultBuckets, "h").sortBy("h")
            .mode("overwrite").saveAsTable(target)
      }
      applied.update(censusBase, (batchId, target))
      // prune ONLY after the registry points at the successor
      prev.foreach { case (_, old) =>
        spark.sql(s"DROP TABLE IF EXISTS $old")
      }
    }
}
