package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Bucketed MinHash-LSH band index with incremental NEAR-dup at
  * ingest — the text-side twin of [[SemDedupStore]]: a growing corpus
  * must not re-run near-dup detection over everything it already
  * accepted, so the store keeps
  *
  *  - `<table>` — the accepted documents (doc_id, text), bucketed by
  *    doc_id: candidate-verification text lookups shuffle only the
  *    (tiny) candidate side;
  *  - `<table>_bands` — the LSH band index (doc_id, kb), 16 band keys
  *    per stored doc, bucketed by kb: the per-batch probe join never
  *    re-shuffles the stored side.
  *
  * An arriving batch pays one batch-sized signature pass (the shared
  * 64-perm MinHash aggregate), one probe join against the SKINNY band
  * index (two longs + a short string per row — at 100 TB of text this
  * is the ~1% index read every LSH system pays; stored TEXT is never
  * rescanned), exact-Jaccard verification on only the capped candidate
  * pairs, and one bucket-layout append of the survivors to both
  * tables.
  *
  * Drop policy mirrors [[SemDedupStore]]: stored docs always win
  * (keep-STORED-first — an accepted document is never retroactively
  * evicted), in-batch pairs keep the smaller doc_id, and both checks
  * confirm at exact Jaccard ≥ `jmin` so band collisions alone never
  * drop anything. Hot band keys (> `maxBucket` stored members) are
  * skipped from the probe and REPORTED in the stats — the
  * no-silent-caps discipline; the production response is widening the
  * bands, as in [[graft.ops.DedupOps.minhashPairsOf]].
  *
  * Crash discipline (the stream wrapper's foreachBatch is
  * at-least-once): replay idempotency is ID-BASED with no registry —
  * doc_ids are unique by contract, a survivor lands in the doc table
  * under its own id, and the appends are job-atomic, so a re-delivered
  * batch finds its own earlier survivors by id and skips them; dropped
  * rows re-drop by the same deterministic rules. The doc append
  * commits BEFORE the band append, so a crash between the two leaves a
  * doc whose band rows are missing — the replay's id-skip would then
  * leave the index permanently short, which is why [[ingest]] re-derives
  * band rows for replayed survivors and anti-joins the band table
  * itself: band repair is idempotent too.
  */
object MinHashStore {

  val JaccardMin = 0.7
  val MaxBucket = 1000

  private def bandsTable(table: String): String = table + "_bands"

  /** (doc_id, kb) band keys of a (doc_id, text) frame — band id and
    * 4-row signature slice folded into ONE join key, so the probe
    * join has a single equi-key that matches the band table's bucket
    * layout.
    */
  private def bandKeysOf(docs: DataFrame): DataFrame =
    DedupOps.minhashBuckets(docs.select("doc_id", "text"))
      .select(col("doc_id"),
        concat_ws(":", col("band"), col("bh")).as("kb"))

  /** One-time build: keep-first near-dup survivors of the corpus
    * (exactly [[graft.ops.DedupOps.minhashPairsOf]]'s pairs, larger id
    * drops) stored in both bucket layouts.
    */
  def build(spark: SparkSession, dir: String, table: String): Unit = {
    val corpus = DedupOps.corpus(spark, dir).select("doc_id", "text")
    val drops = DedupOps.minhashPairsOf(corpus)
      .select(greatest(col("doc1"), col("doc2")).as("doc_id")).distinct()
    val keep = corpus.join(drops, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    keep.write.bucketBy(DocumentStore.DefaultBuckets, "doc_id")
      .sortBy("doc_id").mode("overwrite").saveAsTable(table)
    bandKeysOf(keep)
      .write.bucketBy(DocumentStore.DefaultBuckets, "kb")
      .sortBy("kb").mode("overwrite").saveAsTable(bandsTable(table))
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  def clear(spark: SparkSession, table: String): Unit = {
    DocumentStore.clearStale(spark, table)
    DocumentStore.clearStale(spark, bandsTable(table))
  }

  /** Small-file settlement for both index layouts: every ingest batch
    * appends one-plus part files per bucket, so a long-running drain
    * degrades the probe join's stored-side read through file listing
    * and per-file opens. One writer per bucket rewrites each table in
    * place ([[DocumentStore.compactBucketed]] — layout preserved, so
    * the zero-exchange probe and text-lookup joins survive).
    */
  def compact(spark: SparkSession, table: String): Unit = {
    DocumentStore.compactBucketed(spark, table, "doc_id")
    DocumentStore.compactBucketed(spark, bandsTable(table), "kb")
  }

  /** Takedown across both layouts — the right-to-be-forgotten pass
    * for the near-dup store. The victims' BAND keys re-derive from
    * their stored text BEFORE the doc rows leave (one id-semi-joined
    * read of the doc table — the candidate-verification read shape),
    * so the band-table pass knows exactly which kb buckets hold
    * victim rows without scanning the index: affected band buckets
    * come from the derived keys, affected doc buckets from the victim
    * ids themselves (doc_id IS that table's bucket key). Both rewrite
    * through [[DocumentStore.rewriteAffectedBuckets]] — untouched
    * buckets' files are never opened.
    *
    * Semantics: the store holds near-dup SURVIVORS, so deleting a
    * survivor yields exactly the from-scratch build of (stored minus
    * victims) — the remaining docs were already mutually non-dup, and
    * a document once dropped against a victim is gone from the store
    * by construction (an ingest-time drop is not an index row). Order:
    * the BAND rows rewrite first and the doc rows leave LAST, because
    * the band-side locate derives its keys from the victims' stored
    * text — deleting the doc rows first would orphan band rows with no
    * way to find them. A crash between the two rewrites therefore
    * leaves victim DOC rows present with their band rows already gone:
    * no search can return the victim's bands, but the victim also no
    * longer GUARDS its text — an [[ingest]] batch carrying a near-dup
    * of the victim in that window finds no band candidates and admits
    * it as a fresh survivor beside the still-stored victim row, a
    * state a from-scratch build of (stored minus victims) never
    * produces. A re-run of the same delete completes the cleanup
    * (the doc-side pass is idempotent); callers for whom the window
    * matters should quiesce ingest across the delete, exactly as a
    * FAISS deployment quiesces adds across remove_ids.
    */
  final case class DeleteStats(docs: DocumentStore.DeleteStats,
    bandBuckets: Seq[Int], bandRowsRemoved: Long)

  def deleteDocs(spark: SparkSession, table: String,
      ids: DataFrame): DeleteStats = {
    val n = DocumentStore.DefaultBuckets
    val victims = ids.select("doc_id")
    val victimKeys = bandKeysOf(
      read(spark, table).select("doc_id", "text")
        .join(victims, Seq("doc_id"), "left_semi"))
      .localCheckpoint(false)
    val bt = bandsTable(table)
    val bucketOfKb = pmod(hash(col("kb")), lit(n))
    // ≤ nBuckets — the derived keys bound the band-side locate, no
    // index scan (a superset is fine: a crash-window victim with
    // missing band rows just yields an empty rewrite there)
    val affectedKb = victimKeys.select(bucketOfKb.as("b")).distinct()
      .collect().map(_.getInt(0)).sorted
    val bandRemoved =
      if (affectedKb.isEmpty) 0L
      else {
        val (b0, b1) = DocumentStore.rewriteAffectedBuckets(spark, bt,
          "kb", affectedKb.toSeq,
          spark.table(bt)
            .filter(bucketOfKb.isin(affectedKb.toIndexedSeq: _*))
            .join(victims, Seq("doc_id"), "left_anti"),
          n)
        b0 - b1
      }
    DeleteStats(
      DocumentStore.deleteByIdKeyed(spark, table, "doc_id", "doc_id",
        victims, n),
      affectedKb.toSeq, bandRemoved)
  }

  /** Per-ingest report: batch size, replayed ids skipped, drops
    * against the stored state, in-batch keep-first drops (the sets
    * can overlap), survivors appended, and the capped-probe evidence
    * (hot stored band keys skipped — each one is a degenerate key the
    * banding operating point should absorb, never a silent miss).
    */
  final case class IngestStats(nBatch: Long, nReplayed: Long,
    nDroppedVsStore: Long, nDroppedInBatch: Long, nAppended: Long,
    nHotKeysSkipped: Long)

  /** Absorb one batch of (doc_id, text) rows: signature + band keys,
    * probe the stored band index, confirm candidates at exact Jaccard,
    * drop (stored-first, then in-batch keep-first), append survivors
    * to both bucket layouts.
    */
  def ingest(spark: SparkSession, batch: DataFrame, table: String,
      jmin: Double = JaccardMin,
      maxBucket: Int = MaxBucket): IngestStats = {
    val bt = bandsTable(table)
    val docs = batch.select("doc_id", "text").localCheckpoint(false)
    // batch-sized: feeds the probe, the in-batch pass, and the append
    val keys = bandKeysOf(docs).localCheckpoint(false)
    // replay idempotency by id: the stored doc read prunes to the
    // doc_id column (never text)
    val replays = docs.select("doc_id")
      .join(read(spark, table).select("doc_id"), Seq("doc_id"),
        "left_semi")
      .localCheckpoint(false)
    // stored-side probe: batch keys semi-filter the band index (the
    // stored side rides its kb bucket layout — no exchange), then the
    // per-key stored membership is capped BEFORE pair expansion
    val storedHits = spark.table(bt)
      .join(keys.select("kb").distinct(), Seq("kb"), "left_semi")
      .groupBy("kb")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .localCheckpoint(false)
    val hotKeys = storedHits.filter(size(col("ids")) > maxBucket)
      .count()
    val cand = storedHits.filter(size(col("ids")) <= maxBucket)
      .join(keys, Seq("kb"))
      .select(col("doc_id").as("new_id"),
        explode(col("ids")).as("stored_id"))
      .filter(col("new_id") =!= col("stored_id"))
      .distinct()
    // exact-Jaccard confirmation: stored text fetched by id (the
    // doc_id bucket layout keeps the stored side exchange-free), new
    // text from the batch
    val s1 = DedupOps.shingleExpr("text1")
    val s2 = DedupOps.shingleExpr("text2")
    val confirmed = cand
      .join(docs.select(col("doc_id").as("new_id"),
        col("text").as("text1")), "new_id")
      .join(read(spark, table).select(col("doc_id").as("stored_id"),
        col("text").as("text2")), "stored_id")
      // round-to-4 BEFORE the threshold — the exact comparison
      // discipline of [[graft.ops.DedupOps.minhashPairsOf]], so the
      // store check and the in-batch check confirm identically
      .filter(round(size(array_intersect(s1, s2)).cast("double")
        / size(array_union(s1, s2)), 4) >= jmin)
    val vsStore = confirmed.select(col("new_id").as("doc_id")).distinct()
      .join(replays, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    // in-batch keep-first: larger id of every confirmed pair drops.
    // Candidates come off the SAME band keys as the store probe (one
    // signature pass per ingest, not two — measured ~2x the drain
    // otherwise), then the identical exact-Jaccard confirmation:
    // semantically [[graft.ops.DedupOps.minhashPairsOf]] verbatim
    // (kb = band:bh groups exactly as (band, bh) does)
    val inBatchCand = keys.groupBy("kb")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(DedupOps.bucketPairs("ids").as("p"))
      .select(col("p.a").as("doc1"), col("p.b").as("doc2"))
      .distinct()
    val inBatch = inBatchCand
      .join(docs.select(col("doc_id").as("doc1"),
        col("text").as("text1")), "doc1")
      .join(docs.select(col("doc_id").as("doc2"),
        col("text").as("text2")), "doc2")
      .filter(round(size(array_intersect(s1, s2)).cast("double")
        / size(array_union(s1, s2)), 4) >= jmin)
      .select(greatest(col("doc1"), col("doc2")).as("doc_id")).distinct()
      .localCheckpoint(false)
    val drops = vsStore.unionByName(inBatch).unionByName(replays)
      .distinct()
    val keep = docs.join(drops, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    // r15 (guide §1.2, fewer sequential actions): the five stats were
    // five separate ~20 ms count jobs over already-checkpointed frames
    // — at 4+ micro-batches per drain that is pure per-batch driver
    // latency. ONE flag-join aggregate over the checkpointed frames
    // yields all five numbers in a single job. Semantics preserved
    // exactly, including a batch that repeats a doc_id: the flag
    // frames join as DISTINCT id sets (so no row duplication),
    // per-row counts keep docs' multiplicity (nBatch / nReplayed /
    // nAppended counted rows before), and the two drop censuses count
    // distinct ids (vsStore / inBatch were distinct frames before).
    val statsRow = docs.select("doc_id")
      .join(replays.select("doc_id").distinct()
        .withColumn("r", lit(1)), Seq("doc_id"), "left")
      .join(vsStore.select("doc_id").distinct()
        .withColumn("v", lit(1)), Seq("doc_id"), "left")
      .join(inBatch.select("doc_id").distinct()
        .withColumn("b", lit(1)), Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n"),
        count(col("r")).as("nr"),
        countDistinct(when(col("v") === 1, col("doc_id"))).as("nv"),
        countDistinct(when(col("b") === 1, col("doc_id"))).as("nb"),
        sum(when(col("r").isNull && col("v").isNull && col("b").isNull,
          1L).otherwise(0L)).as("nk"))
      .head()
    val stats = IngestStats(
      nBatch = statsRow.getLong(0),
      nReplayed = statsRow.getLong(1),
      nDroppedVsStore = statsRow.getLong(2),
      nDroppedInBatch = statsRow.getLong(3),
      nAppended = if (statsRow.isNullAt(4)) 0L else statsRow.getLong(4),
      nHotKeysSkipped = hotKeys)
    keep.write.bucketBy(DocumentStore.DefaultBuckets, "doc_id")
      .sortBy("doc_id").mode("append").saveAsTable(table)
    // band repair is part of replay idempotency: a replayed id's band
    // rows might be missing (crash between the two appends), so its
    // keys re-derive and append through an anti-join against the
    // index. A fresh survivor CANNOT already have band rows (the doc
    // append commits first), so when the batch carries no replays the
    // anti-join — a second full band-index scan — is skipped
    val freshKeys = keys.join(keep.select("doc_id"), Seq("doc_id"),
      "left_semi")
    val bandAppend =
      if (stats.nReplayed == 0) freshKeys
      else freshKeys.unionByName(
        keys.join(replays, Seq("doc_id"), "left_semi")
          .join(spark.table(bt), Seq("doc_id", "kb"), "left_anti"))
    bandAppend
      .write.bucketBy(DocumentStore.DefaultBuckets, "kb")
      .sortBy("kb").mode("append").saveAsTable(bt)
    spark.sql(s"REFRESH TABLE $table")
    spark.sql(s"REFRESH TABLE $bt")
    stats
  }
}
