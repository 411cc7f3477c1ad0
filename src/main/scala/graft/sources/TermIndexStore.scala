package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Persisted BM25 inverted index — the tokenize-once twin of the
  * retrieval family, completing the store ladder ([[DocumentStore]] /
  * [[VectorIndex]] / [[FrameStats]] / [[SemDedupStore]] /
  * [[MinHashStore]]) on the text-retrieval side: the inline
  * `doc_bm25_*` operators re-tokenize the WHOLE corpus per query — at
  * 100 TB the tokenize+tf shuffle is the dominant cost and a serving
  * system pays it once at indexing time, never per query. The store
  * keeps exactly two tables:
  *
  *  - `<table>` — the postings (tok, doc_id, tf), bucketed AND sorted
  *    by `tok`: per-term aggregations (document frequency, impact
  *    caps) and the query-term probe ride the bucket layout with zero
  *    exchanges;
  *  - `<table>_doclen` — (doc_id, dl) document lengths, bucketed by
  *    `doc_id`: the per-doc normalization join side, and the
  *    AUTHORITATIVE membership list (a doc is indexed iff its length
  *    row committed).
  *
  * Document frequency is NOT a third table: df(tok) is a bucket-local
  * `groupBy(tok).count` over the skinny (tok, doc_id) projection of
  * the postings — zero-exchange under the bucket layout — and a
  * separately-maintained census would re-introduce the unkeyed
  * increment-append crash window ([[MinHashStore]]'s band rows heal by
  * (doc_id, kb) anti-join; a bare (tok, +n) row has no key to heal
  * by).
  *
  * Crash discipline (the stream wrapper's foreachBatch is
  * at-least-once): replay idempotency is id-based against the doclen
  * table. The doclen append commits FIRST, so a crash between the two
  * appends leaves a member doc with missing postings — the replay
  * re-derives the doc's postings and anti-joins the postings table
  * itself by (doc_id, tok), exactly the [[MinHashStore]] band-repair
  * rule; when a batch carries no replays the repair scan is skipped.
  * A fresh doc cannot double-append postings because fresh is defined
  * by doclen absence and doclen commits before its postings do.
  */
object TermIndexStore {

  private def doclenTable(table: String): String = table + "_doclen"
  private def cappedTable(table: String): String = table + "_capped"
  private def boundsTable(table: String): String = table + "_bounds"

  /** The impact cap M is a LAYOUT PROPERTY of a built store, recorded
    * as a `_graft_m` marker file in the postings table's directory
    * (the [[TrainingExport]] `_graft_nshards` discipline): a store
    * built at one M must keep serving that M even if the compile-time
    * default ([[graft.ops.TextOps.Bm25M]]) moves — otherwise the
    * materialized caps silently stop being served (the cost
    * optimization evaporates unannounced) or, worse, a differently-
    * capped companion is trusted. The marker lives in the POSTINGS
    * dir (not the capped table's, which [[ingest]] drops wholesale)
    * and survives both appends and [[compact]]'s part-file swap.
    */
  private val MMarker = "_graft_m"

  private def writeMMarker(spark: SparkSession, table: String,
      m: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(
      DocumentStore.tableDir(spark, table), MMarker)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(m.toString.getBytes("UTF-8")) finally os.close()
  }

  /** The impact cap this store's capped companion was materialized
    * at, if recorded (pre-marker stores fall back to the compile-time
    * default).
    */
  def recordedM(spark: SparkSession, table: String): Option[Int] = {
    if (!spark.catalog.tableExists(table)) return None
    val p = new org.apache.hadoop.fs.Path(
      DocumentStore.tableDir(spark, table), MMarker)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        // read to EOF, never a single read(): InputStream.read may
        // legally return a short read (e.g. "2" of "256"), which would
        // misparse M and silently serve a wrong cap — the marker is
        // <32 bytes, so loop until the stream is drained
        val buf = new Array[Byte](32)
        var off = 0
        var r = in.read(buf, off, buf.length - off)
        while (r > 0 && off + r < buf.length) {
          off += r
          r = in.read(buf, off, buf.length - off)
        }
        if (r > 0) off += r
        val text = new String(buf, 0, off, "UTF-8").trim
        // a corrupt marker must fail LOUDLY, not throw a bare
        // NumberFormatException three frames deep or fall back to a
        // default that silently diverges from the materialized caps
        scala.util.Try(text.toInt).toOption match {
          case some @ Some(_) => some
          case None => throw new IllegalStateException(
            s"corrupt $MMarker marker for $table: '$text' is not an " +
              "int — the capped companion's layout M is unknowable; " +
              "rebuild the store or restore the marker")
        }
      } finally in.close()
    }
  }

  private def layoutM(spark: SparkSession, table: String): Int =
    recordedM(spark, table).getOrElse(graft.ops.TextOps.Bm25M)

  /** (doc_id, tok, tf) postings of a (doc_id, text) frame — the same
    * tokenization as the inline BM25 operators (lowercase,
    * split-on-space, empty tokens dropped).
    */
  private[graft] def tfOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))

  /** One-time build: tokenize the corpus ONCE, persist both bucket
    * layouts. The doclen write goes first (membership commits before
    * postings, the same order [[ingest]] relies on).
    */
  def build(spark: SparkSession, dir: String, table: String,
      m: Int = graft.ops.TextOps.Bm25M): Unit = {
    val tf = tfOf(Tables.documents(spark, dir).select("doc_id", "text"))
      .localCheckpoint(false)
    tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      .write.bucketBy(DocumentStore.DefaultBuckets, "doc_id")
      .sortBy("doc_id").mode("overwrite").saveAsTable(doclenTable(table))
    tf.write.bucketBy(DocumentStore.DefaultBuckets, "tok")
      .sortBy("tok").mode("overwrite").saveAsTable(table)
    writeMMarker(spark, table, m)
    materializeCapped(spark, table, m)
  }

  /** Materialize the impact-capped posting lists — each term's top-M
    * postings by (per-posting BM25 impact DESC, doc_id) with the raw
    * tf carried as the payload tag, M from the store's recorded
    * layout marker — as a companion table in the same tok-bucket
    * layout: the pruned serving path reads M·|vocab| rows off this
    * SKINNY table instead of re-capping the full postings per query
    * (an impact-sorted index pays the ordering once, at indexing
    * time). Derived at [[build]] and re-derived by [[compact]];
    * [[ingest]] DROPS it (postings appends invalidate the caps, and
    * per-batch surgical cap maintenance would need per-term deletes
    * the append-only layout can't express), so between an ingest and
    * the next compaction the pruned search falls back to read-time
    * capping — same results either way, the companion table is purely
    * a cost optimization.
    */
  private def materializeCapped(spark: SparkSession,
      table: String, m: Int): Unit = {
    graft.ops.TextOps.cappedPostings(
        postings(spark, table).select("doc_id", "tok", "tf"),
        docLens(spark, table), m)
      .select("tok", "doc_id", "tf")
      .write.bucketBy(DocumentStore.DefaultBuckets, "tok")
      .sortBy("tok").mode("overwrite").saveAsTable(cappedTable(table))
    materializeBounds(spark, table)
  }

  /** Materialize the per-term MaxScore upper bounds (tok, ub) — the
    * scaladoc claim "in a serving deployment the bound is a stored
    * companion next to the impact caps" as an actual table (r15):
    * derived from the just-written capped companion (whose per-term
    * max contribution equals the full list's — see
    * [[graft.ops.TextOps.termBounds]]), so the corpus-axis df/dl/avgdl
    * joins the MaxScore serving path used to re-run per query now run
    * once, here. Lifecycle is the capped table's exactly: written at
    * [[build]]/[[compact]], dropped by [[ingest]] and [[deleteDocs]]
    * (an append/delete changes df/dl/N, which the bounds bake in), at
    * which point MaxScore serving falls back to matched-frame bounds —
    * same results either way, the companion is purely a cost
    * optimization.
    */
  private def materializeBounds(spark: SparkSession,
      table: String): Unit =
    graft.ops.TextOps.termBounds(
        spark.table(cappedTable(table)).select("doc_id", "tok", "tf"),
        dfCensus(spark, table), docLens(spark, table))
      .write.bucketBy(DocumentStore.DefaultBuckets, "tok")
      .sortBy("tok").mode("overwrite").saveAsTable(boundsTable(table))

  /** Small-file settlement: one writer per bucket for both index
    * layouts ([[DocumentStore.compactBucketed]]), then the capped
    * companion re-materializes off the compacted postings — the
    * vacuum-style pass that restores both the file counts an ingest
    * loop degrades AND the pruned path's skinny serving table.
    */
  def compact(spark: SparkSession, table: String): Unit = {
    DocumentStore.compactBucketed(spark, table, "tok")
    DocumentStore.compactBucketed(spark, doclenTable(table), "doc_id")
    // re-materialize at the store's OWN recorded M, never the
    // compile-time default — a store built at one M keeps its layout
    materializeCapped(spark, table, layoutM(spark, table))
  }

  def postings(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  def docLens(spark: SparkSession, table: String): DataFrame =
    spark.table(doclenTable(table))

  /** df census derived on read: a zero-exchange bucket-local count
    * over the (tok, doc_id) projection of the postings.
    */
  def dfCensus(spark: SparkSession, table: String): DataFrame =
    postings(spark, table).groupBy("tok").agg(count(lit(1)).as("df"))

  def clear(spark: SparkSession, table: String): Unit = {
    DocumentStore.clearStale(spark, table)
    DocumentStore.clearStale(spark, doclenTable(table))
    DocumentStore.clearStale(spark, cappedTable(table))
    DocumentStore.clearStale(spark, boundsTable(table))
  }

  /** Takedown across all three layouts — the right-to-be-forgotten
    * pass for the retrieval index. Order is serve-stops-first:
    *
    *  1. the capped companion DROPS (victim postings live in it and a
    *     victim's removal must re-promote each term's M+1-th posting —
    *     per-term surgery the append-only layout can't express; the
    *     [[ingest]] discipline: read-time capping until [[compact]]
    *     re-materializes, same results throughout);
    *  2. the doclen rows leave (doc_id IS that table's bucket key, so
    *     the locate is the victims' own hash) — membership is
    *     authoritative, so from here the victim scores in NO search
    *     (the per-doc normalization join is inner);
    *  3. the postings rows leave through the generic locate-by-
    *     projection pass (victims' tok buckets found by one
    *     column-pruned (doc_id, tok) scan, rewrite O(affected
    *     buckets)) — df is DERIVED from postings, so document
    *     frequencies self-heal the moment this completes.
    *
    * A crash between 2 and 3 leaves orphaned postings that no search
    * can score (no doclen row) but that still inflate the derived df
    * until a re-run of the same delete — which is a no-op on the
    * doclen side and completes the postings side — finishes the job.
    */
  final case class DeleteStats(doclen: DocumentStore.DeleteStats,
    postings: DocumentStore.DeleteStats)

  def deleteDocs(spark: SparkSession, table: String,
      ids: DataFrame): DeleteStats = {
    DocumentStore.clearStale(spark, cappedTable(table))
    // the bounds bake in df/dl/N, which the delete changes — same
    // drop-then-recompact lifecycle as the capped companion
    DocumentStore.clearStale(spark, boundsTable(table))
    DeleteStats(
      DocumentStore.deleteByIdKeyed(spark, doclenTable(table), "doc_id",
        "doc_id", ids),
      DocumentStore.deleteByIdKeyed(spark, table, "tok", "doc_id", ids))
  }

  /** Per-ingest report: batch size, replayed ids (skipped or healed),
    * docs and postings appended, postings repaired into replayed
    * members (non-zero only after a doclen/postings crash window),
    * and zero-token docs skipped — they have no doclen row (the
    * inline operators' universe is tokenized docs) so they must be
    * reported, never silently re-counted as "appended" on replay.
    */
  final case class IngestStats(nBatch: Long, nReplayed: Long,
    nDocsAppended: Long, nPostingsAppended: Long, nRepaired: Long,
    nEmptySkipped: Long)

  /** Absorb one batch of (doc_id, text) rows: tokenize the BATCH
    * once, skip replayed members (classified among TOKENIZED docs —
    * a zero-token doc can never become a member, so it is reported
    * in `nEmptySkipped` instead of re-"appending" forever under
    * at-least-once delivery), append doclen then postings in bucket
    * layout, and heal any replayed member whose postings went missing
    * in a crash window.
    */
  def ingest(spark: SparkSession, batch: DataFrame,
      table: String): IngestStats = {
    // the appends below invalidate the materialized impact caps, so
    // the companion drops FIRST: a crash anywhere inside this ingest
    // then leaves the read-time-capping fallback active for the whole
    // vulnerable window — dropping it only after the appends would
    // let a crash strand a stale capped table that search(cap=m)
    // silently trusts, omitting the ingested docs from pruned results
    DocumentStore.clearStale(spark, cappedTable(table))
    // bounds bake in df/dl/N — stale bounds after an append could sit
    // BELOW a term's true max contribution and mis-prune, so they drop
    // in the same pre-append window
    DocumentStore.clearStale(spark, boundsTable(table))
    // dedupe WITHIN the batch: a doc_id repeated in one micro-batch
    // would otherwise be merged by tfOf's groupBy, doubling its tf
    // and dl and silently corrupting the index relative to the
    // inline operators (which see each doc once); `nBatch` counts
    // distinct docs, matching the membership semantics downstream.
    // The winner is DETERMINISTIC (min text) — dropDuplicates keeps
    // an arbitrary row, so a batch carrying two different texts for
    // one doc_id would index a run-dependent text
    val docs = batch.select("doc_id", "text")
      .groupBy("doc_id").agg(min("text").as("text"))
      .localCheckpoint(false)
    val nBatch = docs.count()
    // one batch tokenize feeds membership, the append AND the repair
    val tfBatch = tfOf(docs).localCheckpoint(false)
    val tokenized = tfBatch.select("doc_id").distinct()
    val replays = tokenized
      .join(docLens(spark, table).select("doc_id"), Seq("doc_id"),
        "left_semi")
      .localCheckpoint(false)
    // r15: one flag-join aggregate instead of two sequential count
    // jobs (per-batch driver latency — guide §1.2); replays ⊆
    // tokenized and both are distinct id sets, so the counts are
    // identical by construction
    val tokRow = tokenized
      .join(replays.withColumn("r", lit(1)), Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n"), count(col("r")).as("nr")).head()
    val nTokenized = tokRow.getLong(0)
    val nReplayed = tokRow.getLong(1)
    val tfFresh = tfBatch.join(replays, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    // membership first: doclen is the commit marker
    tfFresh.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      .write.bucketBy(DocumentStore.DefaultBuckets, "doc_id")
      .sortBy("doc_id").mode("append").saveAsTable(doclenTable(table))
    // postings repair rides replay only: a second postings scan is
    // the price of healing, skipped on the no-replay fast path
    val repaired =
      if (nReplayed == 0) 0L
      else {
        val repair = tfBatch.join(replays, Seq("doc_id"), "left_semi")
          .join(postings(spark, table), Seq("doc_id", "tok"),
            "left_anti")
          .localCheckpoint(false)
        val n = repair.count()
        if (n > 0)
          repair.write.bucketBy(DocumentStore.DefaultBuckets, "tok")
            .sortBy("tok").mode("append").saveAsTable(table)
        n
      }
    tfFresh.write.bucketBy(DocumentStore.DefaultBuckets, "tok")
      .sortBy("tok").mode("append").saveAsTable(table)
    spark.sql(s"REFRESH TABLE $table")
    spark.sql(s"REFRESH TABLE ${doclenTable(table)}")
    IngestStats(
      nBatch = nBatch,
      nReplayed = nReplayed,
      nDocsAppended = nTokenized - nReplayed,
      nPostingsAppended = tfFresh.count(),
      nRepaired = repaired,
      nEmptySkipped = nBatch - nTokenized)
  }

  /** BM25 top-5 off the stored index: the exact
    * [[graft.ops.TextOps.bm25From]] scoring tail — same anchor-query
    * derivation, same math, hash-matching the inline oracle — with tf
    * / df / dl read from the bucketed index instead of re-tokenizing
    * the corpus.
    */
  def search(spark: SparkSession, table: String,
      cap: Option[Int] = None): DataFrame = {
    val full = postings(spark, table).select("doc_id", "tok", "tf")
    val df_ = dfCensus(spark, table)
    val dl = docLens(spark, table)
    cap match {
      case Some(m) if recordedM(spark, table).contains(m)
          && spark.catalog.tableExists(cappedTable(table)) =>
        // serve off the MATERIALIZED impact-capped lists: the scoring
        // side scans M·|vocab| rows from the skinny companion table;
        // anchors and global stats still derive from the full index
        // (same oracle, same hashes — only the read cost changes).
        // MARKER-gated: the companion is trusted only when it was
        // materialized at exactly the requested cap — a moved default
        // falls back to read-time capping, never a silently-wrong M
        graft.ops.TextOps.bm25Serve(full,
          spark.table(cappedTable(table)).select("doc_id", "tok", "tf"),
          df_, dl)
      case _ =>
        graft.ops.TextOps.bm25From(full, df_, dl, cap)
    }
  }

  /** [[build]] with the impact cap picked FROM the measured recall
    * curve on the corpus being indexed ([[graft.ops.TextOps.bm25MFor]]
    * — smallest sweep level meeting `minRecall`, the grid's largest
    * as the honest fallback): the RECALL_r14 finding made concrete —
    * M is scale-dependent, so a store built over a NEW corpus size
    * should measure its own curve rather than inherit a default
    * tuned at another scale. The picked M lands in the `_graft_m`
    * marker like any other build, so everything downstream (capped
    * companion trust, compaction, pruned serving) follows the
    * measured choice automatically. Returns the picked M.
    */
  def buildTuned(spark: SparkSession, dir: String, table: String,
      minRecall: Double = 0.9): Int = {
    val m = graft.ops.TextOps.bm25MFor(spark, dir, minRecall)
    build(spark, dir, table, m)
    m
  }

  /** FREE-TEXT search off the stored index — the parameterized face
    * [[search]]'s anchor-audited path doesn't have: any query string,
    * tokenized with the store's own tokenizer, scored at the store's
    * recorded impact cap. Serving preference mirrors [[search]]:
    * the MATERIALIZED capped companion when its marker matches the
    * layout M, read-time capping as the post-ingest fallback — same
    * results either way, global stats always from the full index.
    */
  def searchText(spark: SparkSession, table: String, queryText: String,
      k: Int = 5): DataFrame = {
    val full = postings(spark, table).select("doc_id", "tok", "tf")
    val df_ = dfCensus(spark, table)
    val dl = docLens(spark, table)
    val m = layoutM(spark, table)
    val capped =
      if (recordedM(spark, table).contains(m)
          && spark.catalog.tableExists(cappedTable(table)))
        spark.table(cappedTable(table)).select("doc_id", "tok", "tf")
      else graft.ops.TextOps.cappedPostings(full, dl, m)
    graft.ops.TextOps.bm25SearchText(capped, df_, dl, queryText, k)
  }

  /** Build-once guard, session-scoped like [[FrameStats]]'s: a stale
    * table from a previous JVM is rebuilt, never trusted.
    */
  private val built = scala.collection.concurrent.TrieMap.empty[String, Unit]

  def ensureBuilt(spark: SparkSession, dir: String): String = {
    val table = DocumentStore.tableName("graft_termidx", dir)
    built.synchronized {
      if (!built.contains(table)) {
        clear(spark, table)
        build(spark, dir, table)
        built.put(table, ())
      }
    }
    table
  }

  /** The `doc_bm25_topk_stored` query twin: identical results (and
    * oracle) to the inline `doc_bm25_topk`, corpus side off the
    * persisted index.
    */
  def searchFor(spark: SparkSession, dir: String): DataFrame =
    search(spark, ensureBuilt(spark, dir))

  /** The `doc_bm25_pruned_stored` twin: served off the MATERIALIZED
    * impact-capped companion table ([[build]]/[[compact]] write it),
    * so the scoring side reads M·|vocab| skinny rows instead of the
    * full postings; scoring semantics are exactly the inline
    * operator's ([[graft.ops.TextOps.bm25Pruned]]) and hash-match its
    * oracle. M comes from the store's OWN recorded layout marker
    * (the shipped default is the recall curve's operating point).
    * Falls back to read-time capping only between an ingest and the
    * next compaction.
    */
  def searchPrunedFor(spark: SparkSession, dir: String): DataFrame = {
    val table = ensureBuilt(spark, dir)
    search(spark, table, cap = Some(layoutM(spark, table)))
  }

  /** The `doc_bm25_maxscore_stored` twin: EXACT top-5 via MaxScore
    * upper-bound pruning served off the persisted layouts — the
    * scaladoc claim "in a serving deployment the bound is a stored
    * companion next to the impact caps" made literal: the per-term
    * upper bounds are read from the MATERIALIZED bounds companion
    * (derived at build/compaction from the impact-capped table, whose
    * top-M by impact necessarily contains each term's max-contribution
    * posting — idf is constant within a term), so the bound is a
    * ≤|query terms| row lookup with zero corpus-axis work at serving
    * time; seeds and survivor scoring read the full postings (MaxScore
    * is exact — pruning changes WORK, never the answer). Marker-gated
    * like [[search]]: between an ingest and the next compaction the
    * companions are absent and bounds fall back to the matched frame.
    */
  def searchMaxScoreFor(spark: SparkSession, dir: String): DataFrame = {
    val table = ensureBuilt(spark, dir)
    graft.ops.TextOps.bm25MaxScoreFrom(
      postings(spark, table).select("doc_id", "tok", "tf"),
      dfCensus(spark, table), docLens(spark, table),
      companionBounds(spark, table))
  }

  /** The marker-gated (tok, ub) bounds source for MaxScore serving
    * (None between an ingest and the next compaction, when the
    * companions are dropped): preferably the MATERIALIZED bounds table
    * — a bounded lookup, zero corpus-axis work per query — falling
    * back to a read-time derivation off the capped companion for
    * stores built before the bounds table existed.
    */
  private def companionBounds(spark: SparkSession,
      table: String): Option[DataFrame] =
    if (!recordedM(spark, table).contains(layoutM(spark, table))) None
    else if (spark.catalog.tableExists(boundsTable(table)))
      Some(spark.table(boundsTable(table)).select("tok", "ub"))
    else if (spark.catalog.tableExists(cappedTable(table)))
      Some(graft.ops.TextOps.termBounds(
        spark.table(cappedTable(table)).select("doc_id", "tok", "tf"),
        dfCensus(spark, table), docLens(spark, table)))
    else None

  /** FREE-TEXT EXACT search — [[searchText]]'s capped ranking is the
    * recorded-M approximation; this is the same query contract served
    * EXACTLY via MaxScore upper-bound pruning (bounds off the capped
    * companion, seeds + survivors off the full postings).
    */
  def searchTextExact(spark: SparkSession, table: String,
      queryText: String, k: Int = 5): DataFrame =
    graft.ops.TextOps.bm25MaxScoreText(
      postings(spark, table).select("doc_id", "tok", "tf"),
      dfCensus(spark, table), docLens(spark, table), queryText, k,
      companionBounds(spark, table))
}
