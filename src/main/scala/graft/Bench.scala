package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

object Bench {

  /** The events table as a file-stream source with the ns-long ts
    * converted to a proper timestamp — shared by both stream benches.
    * The source handles BOTH physical layouts, because each one fails
    * silently under the other's configuration: a directory-layout
    * table (the ScaleGen replicas) must be the source path itself — a
    * `pathGlobFilter=events.parquet` on the parent matches no leaf
    * part files and drains an EMPTY stream (which made every prior
    * round's 10× stream numbers vacuous); a single-file table (the
    * driver-generated sf dirs) can't BE the source path — the file
    * stream source wants a directory, the run errors out, and minOk
    * silently drops the entry.
    */
  private def streamingEvents(spark: SparkSession, sfDir: String) = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // layout probe through Hadoop's FileSystem, not java.io.File — a
    // java.io probe is always false for hdfs://-s3a://-style URIs, so
    // a remote directory layout would silently fall into the glob
    // branch and drain empty
    val hp = new org.apache.hadoop.fs.Path(path)
    val isDir = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(hp).isDirectory
    val src =
      if (isDir) spark.readStream.schema(schema).parquet(path)
      else
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    // ts arrives as ns-long (timestamp[ns] under nanosAsLong) or as a
    // real timestamp (timestamp[us] layout, tz'd or NTZ); the stream
    // needs TimestampType
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    schema("ts").dataType match {
      case TimestampType => src
      case TimestampNTZType =>
        src.withColumn("ts", col("ts").cast(TimestampType))
      case _ => src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  }

  /** End-to-end Structured Streaming throughput: the windowed
    * aggregation consuming the whole events table as a file stream
    * (AvailableNow = drain everything, then stop). Times source
    * discovery + micro-batch execution + state store, the full
    * streaming path a production job runs.
    */
  private def streamBench(spark: SparkSession, sfDir: String,
      run: Int): (Double, Long, Long) = {
    val t0 = System.nanoTime()
    val q = graft.streaming.EventsStream
      .windowedCounts(streamingEvents(spark, sfDir))
      .writeStream.format("memory").queryName(s"bench_stream_$run")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    // bounded wait: a wedged stream must fail this entry, not hang the
    // whole bench run
    if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
    val dt = (System.nanoTime() - t0) / 1e9
    val st = stateMetrics(q)
    spark.catalog.dropTempView(s"bench_stream_$run")
    (dt, st._1, st._2)
  }

  /** Sliding-window (10 min / 5 min) streaming agg over the full
    * events stream — the overlapping-window counterpart of
    * [[streamBench]]: twice the window keys per event, state still
    * volume-independent.
    */
  private def streamSlidingBench(spark: SparkSession, sfDir: String,
      run: Int): (Double, Long, Long) = {
    val t0 = System.nanoTime()
    val q = graft.streaming.EventsStream
      .slidingCounts(streamingEvents(spark, sfDir))
      .writeStream.format("memory").queryName(s"bench_slide_$run")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
    val dt = (System.nanoTime() - t0) / 1e9
    val st = stateMetrics(q)
    spark.catalog.dropTempView(s"bench_slide_$run")
    (dt, st._1, st._2)
  }

  /** Total state rows + bytes from the last progress that reported
    * state operators — the 100 TB risk a wall-clock number hides:
    * state that grows with the stream instead of the watermark.
    * (-1, -1) when NO progress carried state operators (a stateless
    * pipeline, e.g. a foreachBatch export): emitted as null in the
    * artifact so "stateless by construction" never reads as
    * "measured zero".
    */
  private def stateMetrics(q: StreamingQuery): (Long, Long) =
    q.recentProgress.reverse.find(_.stateOperators.nonEmpty).map { pr =>
      (pr.stateOperators.map(_.numRowsTotal).sum,
        pr.stateOperators.map(_.memoryUsedBytes).sum)
    }.getOrElse((-1L, -1L))

  /** Stateful-streaming throughput: watermark + dropDuplicates over
    * the full events stream into a noop sink — times the dedup state
    * store path end to end.
    */
  private def streamDedupBench(spark: SparkSession, sfDir: String): (Double, Long, Long) = {
    val t0 = System.nanoTime()
    val q = graft.streaming.EventsStream
      .dedupedEvents(streamingEvents(spark, sfDir))
      .writeStream.format("noop")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
    val dt = (System.nanoTime() - t0) / 1e9
    val st = stateMetrics(q)
    (dt, st._1, st._2)
  }

  /** Stateful-sessionizer throughput: the DRAIN-SAFE event-time
    * sessionizer (watermark-driven timeouts, terminates under
    * AvailableNow — the processing-time variant would hang this bench)
    * over the full events stream into a noop sink.
    */
  private def streamSessionsBench(spark: SparkSession, sfDir: String): (Double, Long, Long) = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val src = streamingEvents(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "30 minutes")
      .as[graft.streaming.EventsStream.Event]
    val q = graft.streaming.EventsStream.sessionizeEventTime(spark, src)
      .writeStream.format("noop")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
    val dt = (System.nanoTime() - t0) / 1e9
    val st = stateMetrics(q)
    (dt, st._1, st._2)
  }

  /** Stream-stream join throughput: the watermarked signup-enrichment
    * inner join (state bounded by the 30-day range condition) over the
    * full events stream into a noop sink.
    */
  private def streamEnrichBench(spark: SparkSession, sfDir: String): (Double, Long, Long) = {
    val t0 = System.nanoTime()
    val q = graft.streaming.EventsStream
      .enrichedWithSignup(streamingEvents(spark, sfDir))
      .writeStream.format("noop")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
    val dt = (System.nanoTime() - t0) / 1e9
    val st = stateMetrics(q)
    (dt, st._1, st._2)
  }

  /** transformWithState sessionizer throughput: the arbitrary-stateful
    * API (typed ValueState + event-time timers as custom eviction)
    * over the full events stream into a noop sink. Event-time timers
    * fire on watermark advancement, so the drain terminates under
    * AvailableNow. Requires the RocksDB state store provider — set for
    * this query and restored after.
    */
  private def streamTwsBench(spark: SparkSession, sfDir: String): (Double, Long, Long) = {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val t0 = System.nanoTime()
      val src = streamingEvents(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withWatermark("ts", "30 minutes")
        .as[graft.streaming.EventsStream.Event]
      val q = graft.streaming.EventsStream.sessionizeTws(spark, src)
        .writeStream.format("noop")
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
      val dt = (System.nanoTime() - t0) / 1e9
      val st = stateMetrics(q)
      (dt, st._1, st._2)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Full drain of the ListState/MapState journey digest — the
    * composite-state transformWithState path under bench load (same
    * drain-safety contract as the tws sessionizer: event-time timers
    * only, so AvailableNow terminates).
    */
  private def streamDigestBench(spark: SparkSession, sfDir: String): (Double, Long, Long) = {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val t0 = System.nanoTime()
      val src = streamingEvents(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withWatermark("ts", "30 minutes")
        .as[graft.streaming.EventsStream.Event]
      val q = graft.streaming.EventsStream.journeyDigest(spark, src)
        .writeStream.format("noop")
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
      val dt = (System.nanoTime() - t0) / 1e9
      val st = stateMetrics(q)
      (dt, st._1, st._2)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** The MapState top-k-evidence drain — state bounded by
    * users × (k map entries + bounds), the point-op diff discipline
    * under bench volume (RocksDB, like the digest entry).
    */
  private def streamTopkBench(spark: SparkSession, sfDir: String): (Double, Long, Long) = {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val t0 = System.nanoTime()
      val src = streamingEvents(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withWatermark("ts", "30 minutes")
        .as[graft.streaming.EventsStream.Event]
      val q = graft.streaming.EventsStream.sessionTopk(spark, src)
        .writeStream.format("noop")
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
      val dt = (System.nanoTime() - t0) / 1e9
      val st = stateMetrics(q)
      (dt, st._1, st._2)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Streaming vector-index ingest throughput: the embeddings corpus
    * drained through [[graft.streaming.VecStream.ingestIndex]] in four
    * micro-batches (route + PQ-encode against the frozen codebooks,
    * cell-bucket append, registry version per batch) — the FAISS
    * `index.add()` loop end to end, including the bootstrap settle.
    * foreachBatch sink → stateless by construction (null state in the
    * artifact). Source-file layout is setup, not timed.
    */
  /** Streaming SEMANTIC-dedup ingest throughput: a pre-built
    * cell-partitioned [[graft.sources.SemDedupStore]] absorbs four
    * micro-batches in which every stored vector arrives again under a
    * new id (even base ids — must drop against the store) or negated
    * (odd — genuinely new, must append unless an in-batch replica
    * twin collapses it first). Times the drain only; the store build
    * is setup, like the other persisted-store entries.
    */
  private def streamSemDedupBench(spark: SparkSession,
      sfDir: String): (Double, Long, Long) = {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_bench_sdd")
    val run = java.lang.Long.toHexString(System.nanoTime())
    val table = s"graft_bench_sdstore_$run"
    try {
      graft.sources.SemDedupStore.build(spark, sfDir, table)
      val src = base.resolve("src").toString
      val ckpt = base.resolve("ckpt").toString
      val e = graft.tables.Tables.embeddings(spark, sfDir)
      val n = e.count()
      val batch = e.select(
        (col("vec_id") + 5000000L).as("vec_id"),
        when(col("vec_id") % 2 === 0, col("embedding"))
          .otherwise(transform(col("embedding"), x => -x))
          .as("embedding"))
      (0 until 4).foreach(i => batch.filter(col("vec_id") % 4 === i)
        .coalesce(1).write.parquet(s"$src/f$i.parquet"))
      val t0 = System.nanoTime()
      val source = spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
      val q = graft.streaming.VecStream
        .ingestDedup(spark, source, table, sfDir, ckpt)
      if (!q.awaitTermination(300000L)) {
        q.stop(); sys.error("stream timeout")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val total = spark.table(table).count()
      require(total > n && total < 2 * n,
        s"dedup ingest landed $total rows against a base of $n")
      val st = stateMetrics(q)
      (dt, st._1, st._2)
    } finally {
      graft.sources.DocumentStore.clearStale(spark, table)
    }
  }

  /** Streaming NEAR-dup ingest throughput (text side): a pre-built
    * [[graft.sources.MinHashStore]] absorbs four micro-batches in
    * which every stored document arrives again under a new id — even
    * base ids verbatim (must drop against the band index + exact
    * Jaccard), odd ids with token-unique fresh text (must append).
    * Times the drain only; the store build is setup.
    */
  private def streamNearDedupBench(spark: SparkSession,
      sfDir: String): (Double, Long, Long) = {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_bench_mhd")
    val run = java.lang.Long.toHexString(System.nanoTime())
    val table = s"graft_bench_mhstore_$run"
    try {
      graft.sources.MinHashStore.build(spark, sfDir, table)
      val src = base.resolve("src").toString
      val ckpt = base.resolve("ckpt").toString
      val stored0 = spark.table(table).count()
      val batch = spark.table(table).select(
        (col("doc_id") + 5000000L).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(expr("""concat('qa', doc_id, ' qb', doc_id,
            ' qc', doc_id, ' qd', doc_id, ' qe', doc_id)"""))
          .as("text"))
      (0 until 4).foreach(i => batch.filter(col("doc_id") % 4 === i)
        .coalesce(1).write.parquet(s"$src/f$i.parquet"))
      val t0 = System.nanoTime()
      val source = spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
      val q = graft.streaming.DocsStream
        .ingestNearDedup(spark, source, table, ckpt)
      if (!q.awaitTermination(300000L)) {
        q.stop(); sys.error("stream timeout")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val total = spark.table(table).count()
      require(total > stored0 && total < 2 * stored0,
        s"near-dup ingest landed $total rows against a base of $stored0")
      val st = stateMetrics(q)
      (dt, st._1, st._2)
    } finally {
      graft.sources.MinHashStore.clear(spark, table)
    }
  }

  /** Streaming BM25-index ingest drain: build the inverted index on
    * the corpus, then absorb a 4-micro-batch stream of NEW documents
    * (fresh ids, mixed repeated/novel vocabulary) through
    * [[graft.streaming.DocsStream.ingestTermIndex]] — tokenize is
    * batch-sized, appends ride both bucket layouts.
    */
  private def streamTermIndexBench(spark: SparkSession,
      sfDir: String): (Double, Long, Long) = {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_bench_tix")
    val run = java.lang.Long.toHexString(System.nanoTime())
    val table = s"graft_bench_tistore_$run"
    try {
      graft.sources.TermIndexStore.build(spark, sfDir, table)
      val src = base.resolve("src").toString
      val ckpt = base.resolve("ckpt").toString
      val docs0 = graft.sources.TermIndexStore.docLens(spark, table)
        .count()
      val batch = graft.tables.Tables.documents(spark, sfDir).select(
        (col("doc_id") + 5000000L).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(expr("""concat(text, ' xq', doc_id % 97)"""))
          .as("text"))
      (0 until 4).foreach(i => batch.filter(col("doc_id") % 4 === i)
        .coalesce(1).write.parquet(s"$src/f$i.parquet"))
      // expected membership growth = the batch's TOKENIZED distinct
      // ids (a whitespace-only doc never lands a doclen row), not a
      // bare 2x assumption on the corpus shape
      val expected = docs0 + graft.sources.TermIndexStore.tfOf(batch)
        .select("doc_id").distinct().count()
      val t0 = System.nanoTime()
      val source = spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
      val q = graft.streaming.DocsStream
        .ingestTermIndex(spark, source, table, ckpt)
      if (!q.awaitTermination(300000L)) {
        q.stop(); sys.error("stream timeout")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val total = graft.sources.TermIndexStore.docLens(spark, table)
        .count()
      require(total == expected,
        s"index ingest landed $total member docs, expected $expected")
      val st = stateMetrics(q)
      (dt, st._1, st._2)
    } finally {
      graft.sources.TermIndexStore.clear(spark, table)
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  private def streamVecIngestBench(spark: SparkSession,
      sfDir: String): (Double, Long, Long) = {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_bench_vec")
    // UNIQUE names per run: the registry is durable BY NAME in the
    // warehouse (that's its crash contract), so a reused base from an
    // earlier run/JVM would be "recovered" and turn every batch into
    // a replayed no-op
    val run = java.lang.Long.toHexString(System.nanoTime())
    val table = s"graft_bench_vecindex_$run"
    val reg = s"graft_bench_vecreg_$run"
    graft.streaming.VecStream.reset(reg)
    try {
      val src = base.resolve("src").toString
      val ckpt = base.resolve("ckpt").toString
      val e = graft.tables.Tables.embeddings(spark, sfDir)
      val n = e.count()
      (0 until 4).foreach(i => e.filter(col("vec_id") % 4 === i)
        .coalesce(1).write.parquet(s"$src/f$i.parquet"))
      val t0 = System.nanoTime()
      val source = spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
      val q = graft.streaming.VecStream
        .ingestIndex(spark, source, table, reg, sfDir, ckpt)
      if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
      val dt = (System.nanoTime() - t0) / 1e9
      require(graft.sources.VectorIndex.read(spark, table).count() == n,
        "streamed index dropped rows")
      val st = stateMetrics(q)
      (dt, st._1, st._2)
    } finally {
      // drop the index and EVERY registry version (batchIds are in the
      // table names; leaving any version leaks warehouse dirs) —
      // enumerated from the warehouse, not a hardcoded range, so a
      // run with more micro-batches than expected still cleans up
      val versions = {
        val wh = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"))
        val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val prefix = s"${reg.toLowerCase}_v"
        if (fs.exists(wh))
          fs.listStatus(wh).toSeq.map(_.getPath.getName)
            .filter(n => n.startsWith(prefix)
              && n.drop(prefix.length).forall(_.isDigit))
        else Seq.empty
      }
      (table +: versions).foreach(t =>
        scala.util.Try(graft.sources.DocumentStore.clearStale(spark, t)))
      graft.streaming.VecStream.reset(reg)
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
      ()
    }
  }

  /** Streaming decode-once AUDIO stats ingest throughput: the clip
    * corpus drained through [[graft.streaming.AudStream.ingestStats]]
    * in four micro-batches — each clip pays its ONE fused WAV decode
    * at arrival and lands as [[graft.sources.AudioStats]] moments in
    * batch-scoped parquet. Source files carry the encoded payloads
    * (clips arrive as bytes from the recorder); encoding them is
    * setup, not timed.
    */
  private def streamAudioStatsBench(spark: SparkSession,
      sfDir: String): (Double, Long, Long) = {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_bench_aui")
    try {
      val src = base.resolve("src").toString
      val ckpt = base.resolve("ckpt").toString
      val store = base.resolve("st").toString
      val c = graft.multimodal.BinaryAudio.withAudioPayload(spark, sfDir)
      val n = c.count()
      (0 until 4).foreach(i => c.filter(col("clip_id") % 4 === i)
        .coalesce(1).write.parquet(s"$src/c$i.parquet"))
      val t0 = System.nanoTime()
      val source = spark.readStream.schema(c.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
      val q = graft.streaming.AudStream
        .ingestStats(spark, source, store, ckpt)
      if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
      val dt = (System.nanoTime() - t0) / 1e9
      require(
        graft.streaming.AudStream.readStats(spark, store).count() == n,
        "streamed audio stats dropped rows")
      val st = stateMetrics(q)
      (dt, st._1, st._2)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
      ()
    }
  }

  /** Streaming decode-once stats ingest throughput: the frame corpus
    * drained through [[graft.streaming.ImgStream.ingestStats]] in
    * four micro-batches — each frame pays its PNG decode exactly once
    * at arrival and lands as [[graft.sources.FrameStats]] sufficient
    * statistics in batch-scoped parquet (every later QC read is
    * decode-free). foreachBatch sink → stateless by construction.
    * Source-file layout is setup, not timed.
    */
  private def streamFrameStatsBench(spark: SparkSession,
      sfDir: String): (Double, Long, Long) = {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_bench_fsi")
    try {
      val src = base.resolve("src").toString
      val ckpt = base.resolve("ckpt").toString
      val store = base.resolve("st").toString
      val f = graft.imaging.ImagingModel.frames(spark, sfDir)
      val n = f.count()
      (0 until 4).foreach(i => f.filter(col("id") % 4 === i)
        .coalesce(1).write.parquet(s"$src/f$i.parquet"))
      val t0 = System.nanoTime()
      val source = spark.readStream.schema(f.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
      val q = graft.streaming.ImgStream
        .ingestStats(spark, source, store, ckpt)
      if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
      val dt = (System.nanoTime() - t0) / 1e9
      require(
        graft.streaming.ImgStream.readStats(spark, store).count() == n,
        "streamed stats dropped rows")
      val st = stateMetrics(q)
      (dt, st._1, st._2)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
      ()
    }
  }

  /** Streaming training-export sink throughput: the whole documents
    * table drained through [[graft.streaming.DocsStream.ingestExport]]
    * into a fresh batch-scoped sharded layout — times the
    * exactly-once overwrite path end to end (source discovery,
    * micro-batch shard shuffle, sorted sharded write, marker).
    */
  private def streamDocExportBench(spark: SparkSession,
      sfDir: String): (Double, Long, Long) = {
    val path = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val hp = new org.apache.hadoop.fs.Path(path)
    val isDir = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(hp).isDirectory
    val src =
      if (isDir) spark.readStream.schema(schema).parquet(path)
      else spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_bench_export")
    try {
      val out = base.resolve("ex").toString
      val ckpt = base.resolve("ckpt").toString
      val t0 = System.nanoTime()
      val q = graft.streaming.DocsStream.ingestExport(spark, src, out, ckpt)
      if (!q.awaitTermination(300000L)) { q.stop(); sys.error("stream timeout") }
      val dt = (System.nanoTime() - t0) / 1e9
      // an empty drain must fail the entry, not commit a vacuous number
      require(
        graft.sources.TrainingExport.readStreamed(spark, out).count() > 0,
        "streaming export drained no rows")
      // measured from query progress like every other stream entry;
      // a foreachBatch export has no state operators, so this yields
      // the explicit stateless sentinel rather than a fake zero
      val st = stateMetrics(q)
      (dt, st._1, st._2)
    } finally {
      // each run writes a full corpus copy + checkpoint; at the 30x
      // dirs leaving them would leak GBs of /tmp per artifact refresh
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
      ()
    }
  }

  /** Object-store read path under bench load (VERDICT r5 #6): a 5%
    * frame slice is uploaded ONCE per scale dir into the emulated
    * S3 bucket (amortized like the persisted-store builds — upload is
    * the write side the storage specs already time-box), then the
    * timed body runs the DISTRIBUTED read a download does: binaryFile
    * scan over the bucket → per-partition PNG decode → pixel-stat
    * aggregate. On a real deployment the same code reads s3a:// keys.
    */
  /** The decode-once FrameStats build, end to end (full-corpus gray +
    * RGB PNG round trips into the bucketed stats table) — written to a
    * run-unique name so the timed build never collides with the warmed
    * store the `*_stored` read entries measure against.
    */
  private def frameStatsBuildBench(spark: SparkSession,
      sfDir: String): Double = {
    val run = java.lang.Long.toHexString(System.nanoTime())
    val table = s"graft_bench_framestats_$run"
    try {
      val t0 = System.nanoTime()
      graft.sources.FrameStats.write(spark, sfDir, table)
      (System.nanoTime() - t0) / 1e9
    } finally {
      scala.util.Try(graft.sources.DocumentStore.clearStale(spark, table))
      ()
    }
  }

  private def audioStatsBuildBench(spark: SparkSession,
      sfDir: String): Double = {
    val run = java.lang.Long.toHexString(System.nanoTime())
    val table = s"graft_bench_audiostats_$run"
    try {
      val t0 = System.nanoTime()
      graft.sources.AudioStats.write(spark, sfDir, table)
      (System.nanoTime() - t0) / 1e9
    } finally {
      scala.util.Try(graft.sources.DocumentStore.clearStale(spark, table))
      ()
    }
  }

  private def s3FramesBench(spark: SparkSession, sfDir: String): Double = {
    import org.apache.spark.sql.functions.xxhash64
    val base = sfDir.reverse.takeWhile(_ != '/').reverse
    val bucket = s"/tmp/graft_s3_bench_$base"
    new java.io.File(bucket).mkdirs()
    val storage = new graft.sources.S3FrameStorage(bucket, "raw_frames/bench")
    val marker = new java.io.File(s"$bucket/_graft_uploaded")
    if (!marker.exists()) {
      val framed = graft.multimodal.BinaryFrames.withPayload(spark, sfDir)
        .filter(expr("(frame_id div 10) % 20 = 0"))
      storage.uploadFrames(framed)
      marker.createNewFile()
    }
    val t0 = System.nanoTime()
    graft.multimodal.BinaryFrames.decodeFrames(spark,
        storage.readFrames(spark)
          .select(xxhash64(col("file_name")).as("frame_id"),
            col("payload")))
      .toDF()
      .agg(count(lit(1)).as("n"), sum("sum_px").as("sum_px"),
        max("max_px").as("max_px"))
      .collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Min of the runs that succeeded; None if every run failed — a
    * failed stream bench must drop out of the report, not poison the
    * total with a sentinel.
    */
  private def minOk(runs: Seq[() => (Double, Long, Long)])
      : Option[(Double, Long, Long)] = {
    val ok = runs.flatMap(r => scala.util.Try(r()).toOption)
    if (ok.isEmpty) None else Some(ok.minBy(_._1))
  }

  /** Per-query seconds from a previous committed bench artifact, IF it
    * measured the same scale directory (matched by basename — the same
    * table set lives under different roots across rounds/replicas).
    * The within-run canary is blind to UNIFORM contention: when the
    * whole box is loaded, both timing runs slow down together, agree
    * with each other, and a corrupted number ships silently (round 4's
    * driver artifact ran 2-6× its isolated twin with `noisy` empty).
    * The only reference that catches that is a DIFFERENT run on a
    * different day — the previous round's committed artifact.
    */
  private def priorBench(sfDir: String): Map[String, Double] = {
    val path = sys.env.getOrElse("SPARK_GRAFT_PREV_BENCH", "BENCH_PREV.json")
    val f = new java.io.File(path)
    if (!f.isFile) return Map.empty
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(f)
      val priorSf = Option(root.get("sf")).map(_.asText("")).getOrElse("")
      def base(p: String) = p.reverse.takeWhile(_ != '/').reverse
      if (base(priorSf) != base(sfDir)) return Map.empty
      val qs = root.get("queries")
      if (qs == null) return Map.empty
      // minima aging (the cross-round ratchet fix): minmerge stamps
      // each minimum with the date its value was last REPRODUCED; a
      // stamp older than 14 days (or an unstamped pre-policy
      // artifact entry) is a historical best today's box may simply
      // not reach, so its canary bar relaxes from 2x to 3x — encoded
      // here by inflating the prior by 1.5 (callers keep the 2x
      // comparison). A fresh minimum keeps the strict bar.
      val stamps = Option(root.get("stamps"))
      val staleBefore = java.time.LocalDate.now().minusDays(14)
      def ageFactor(q: String): Double = {
        val stamp = stamps.flatMap(s => Option(s.get(q))).map(_.asText(""))
        stamp.filter(_.nonEmpty)
          .flatMap(d => scala.util.Try(java.time.LocalDate.parse(d)).toOption)
          match {
            case Some(d) if !d.isBefore(staleBefore) => 1.0
            case _ => 1.5
          }
      }
      val it = qs.fields()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> e.getValue.asDouble() * ageFactor(e.getKey)
      }
      b.result()
    } catch { case _: Exception => Map.empty }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session once (executor threads, codegen compiler,
    // parquet footers) so per-query numbers measure the queries.
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.tables.Tables.names.foreach { t =>
      graft.tables.Tables.load(spark, sfDir, t).schema
    }
    // persisted-store entries measure the READ side: build the stores
    // here, outside any timed run (the build is the one shuffle the
    // bucket layout amortizes across every later query)
    graft.sources.DocumentStore.ensureBuilt(spark, sfDir)
    graft.sources.VectorIndex.ensureBuilt(spark, sfDir)
    graft.sources.VectorIndex.ensureBuiltRotated(spark, sfDir)
    graft.sources.FrameStats.ensureBuilt(spark, sfDir)
    graft.sources.AudioStats.ensureBuilt(spark, sfDir)
    graft.sources.TermIndexStore.ensureBuilt(spark, sfDir)
    graft.streaming.ImgStream.ensureStreamedStats(spark, sfDir)
    // min of two runs per query: the first run pays JIT/codegen
    // compilation, the second is the steady-state number a long-running
    // cluster job sees. Load canary: on a contended box the two runs
    // diverge wildly (round 3's sf0.1 artifact carried 7-8x noise that
    // would mask a real regression) — re-run until the two fastest
    // agree within 2x, and past 4 attempts mark the entry `noisy` in
    // the artifact instead of silently committing a corrupted min.
    val noisy = scala.collection.mutable.ArrayBuffer.empty[String]
    // a query that THROWS must never commit its (fast) failure time as
    // a min — a 50 ms crash would "improve" the artifact. Errored
    // entries drop out of `queries`/totals/canaries entirely and
    // surface under a visible "errors" field instead.
    val errors =
      scala.collection.mutable.LinkedHashMap.empty[String, String]
    // cross-run canary reference: the previous round's committed
    // artifact (same scale dir only). Contention only ever ADDS time,
    // so "this run is >2x the last committed run" is evidence the box
    // is loaded even when the two within-run timings agree.
    val prior = priorBench(sfDir)
    val regressed =
      scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
    // dev-only subset filter (comma-separated names); unset for the
    // driver's full runs — stream entries still run unless filtered to
    // batch names only, which is the point of a quick isolation check
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .flatMap { case (name, fn) =>
      def run(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case t: Throwable =>
          errors(name) = (t.getClass.getName + ": " +
            String.valueOf(t.getMessage))
            .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
          None
        }
      }
      var times = List(run(), run()).flatten
      if (times.isEmpty) None
      else {
        def best2 = times.sorted.take(2)
        while (times.length >= 2 && best2(1) > best2(0) * 2 &&
            times.length < 4) times = run().toList ::: times
        if (times.length >= 2 && best2(1) > best2(0) * 2) noisy += name
        // cross-run canary: an entry past 2x its previous committed
        // value gets fresh attempts; a persistent delta is flagged
        // `regressed` (real plan change or sustained contention —
        // either way the number can't be silently trusted).
        // Sub-half-second entries are noise-band and exempt.
        for (p <- prior.get(name) if p > 0) {
          var extra = 0
          while (times.min > p * 2 && times.min > 0.5 && extra < 2) {
            times = run().toList ::: times; extra += 1
          }
          if (times.min > p * 2 && times.min > 0.5)
            regressed += ((name, p, times.min))
        }
        Some(name -> times.min)
      }
    }
    def ifOn(name: String)(t: => Option[(Double, Long, Long)]) =
      if (only.forall(_.contains(name))) t else None
    val streamTime = ifOn("stream_events_window") {
      minOk((1 to 2).map(r => () => streamBench(spark, sfDir, r))) }
    val dedupTime = ifOn("stream_dedup") {
      minOk((1 to 2).map(_ => () => streamDedupBench(spark, sfDir))) }
    val sessTime = ifOn("stream_sessions") {
      minOk((1 to 2).map(_ => () => streamSessionsBench(spark, sfDir))) }
    val enrichTime = ifOn("stream_enrich") {
      minOk((1 to 2).map(_ => () => streamEnrichBench(spark, sfDir))) }
    val twsTime = ifOn("stream_tws_sessions") {
      minOk((1 to 2).map(_ => () => streamTwsBench(spark, sfDir))) }
    val digestTime = ifOn("stream_journey_digest") {
      minOk((1 to 2).map(_ => () => streamDigestBench(spark, sfDir))) }
    val slidingTime = ifOn("stream_sliding") {
      minOk((1 to 2).map(r => () => streamSlidingBench(spark, sfDir, r))) }
    val docExportTime = ifOn("stream_doc_export") {
      minOk((1 to 2).map(_ => () => streamDocExportBench(spark, sfDir))) }
    val topkTime = ifOn("stream_topk_evidence") {
      minOk((1 to 2).map(_ => () => streamTopkBench(spark, sfDir))) }
    val vecIngestTime = ifOn("stream_vec_ingest") {
      minOk((1 to 2).map(_ => () => streamVecIngestBench(spark, sfDir))) }
    val semDedupIngestTime = ifOn("stream_semdedup_ingest") {
      minOk((1 to 2).map(_ => () => streamSemDedupBench(spark, sfDir))) }
    val nearDedupIngestTime = ifOn("stream_neardedup_ingest") {
      minOk((1 to 2).map(_ => () => streamNearDedupBench(spark, sfDir))) }
    val termIndexIngestTime = ifOn("stream_bm25_ingest") {
      minOk((1 to 2).map(_ => () => streamTermIndexBench(spark, sfDir))) }
    val fsIngestTime = ifOn("stream_framestats_ingest") {
      minOk((1 to 2).map(_ => () => streamFrameStatsBench(spark, sfDir))) }
    val auIngestTime = ifOn("stream_audiostats_ingest") {
      minOk((1 to 2).map(_ => () => streamAudioStatsBench(spark, sfDir))) }
    val streams = Seq(
      "stream_events_window" -> streamTime,
      "stream_sliding" -> slidingTime,
      "stream_topk_evidence" -> topkTime,
      "stream_dedup" -> dedupTime,
      "stream_sessions" -> sessTime,
      "stream_enrich" -> enrichTime,
      "stream_tws_sessions" -> twsTime,
      "stream_journey_digest" -> digestTime,
      "stream_doc_export" -> docExportTime,
      "stream_vec_ingest" -> vecIngestTime,
      "stream_semdedup_ingest" -> semDedupIngestTime,
      "stream_neardedup_ingest" -> nearDedupIngestTime,
      "stream_bm25_ingest" -> termIndexIngestTime,
      "stream_framestats_ingest" -> fsIngestTime,
      "stream_audiostats_ingest" -> auIngestTime)
      .collect { case (k, Some(v)) => k -> v }
    // stream entries already take min-of-2 full drains (expensive); the
    // cross-run canary flags them without extra re-runs
    streams.foreach { case (k, (v, _, _)) =>
      for (p <- prior.get(k) if p > 0 && v > p * 2 && v > 0.5)
        regressed += ((k, p, v))
    }
    // the decode-once build itself, timed explicitly: the number that
    // amortizes the QC family's former 8 full-corpus decode passes
    val frameStatsTime =
      if (!only.forall(_.contains("frame_stats_build"))) None
      else scala.util.Try(
        Seq(frameStatsBuildBench(spark, sfDir),
          frameStatsBuildBench(spark, sfDir)).min).toOption
    frameStatsTime.foreach { v =>
      for (p <- prior.get("frame_stats_build") if p > 0 && v > p * 2
          && v > 0.5)
        regressed += (("frame_stats_build", p, v))
    }
    // the audio decode-once build, timed explicitly — the one fused
    // decode the two aud_*_stored reads amortize
    val audioStatsTime =
      if (!only.forall(_.contains("audio_stats_build"))) None
      else scala.util.Try(
        Seq(audioStatsBuildBench(spark, sfDir),
          audioStatsBuildBench(spark, sfDir)).min).toOption
    audioStatsTime.foreach { v =>
      for (p <- prior.get("audio_stats_build") if p > 0 && v > p * 2
          && v > 0.5)
        regressed += (("audio_stats_build", p, v))
    }
    val s3Time =
      if (!only.forall(_.contains("s3_frames_read"))) None
      else scala.util.Try(
        Seq(s3FramesBench(spark, sfDir), s3FramesBench(spark, sfDir)).min
      ).toOption
    s3Time.foreach { v =>
      for (p <- prior.get("s3_frames_read") if p > 0 && v > p * 2 && v > 0.5)
        regressed += (("s3_frames_read", p, v))
    }
    val all = results ++ streams.map { case (k, v) => k -> v._1 } ++
      s3Time.map("s3_frames_read" -> _) ++
      frameStatsTime.map("frame_stats_build" -> _) ++
      audioStatsTime.map("audio_stats_build" -> _)
    val qs = all.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // bounded-state evidence per stream entry: total state rows and
    // state memory from the final progress of the best run
    val st = streams.map { case (k, (_, rows, bytes)) =>
      val r = if (rows < 0) "null" else rows.toString
      val b = if (bytes < 0) "null" else bytes.toString
      s"\"" + k + "\":{\"state_rows\":" + r +
        ",\"state_bytes\":" + b + "}"
    }.mkString("{", ",", "}")
    val total = if (all.nonEmpty) all.map(_._2).sum else 0.0
    val noisyJson = noisy.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val regJson = regressed.sortBy(_._1).map { case (k, p, v) =>
      s"\"" + k + "\":{\"prior\":" + p + ",\"now\":" + v + "}"
    }.mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1).map { case (k, m) =>
      s"\"" + k + "\":\"" + m + "\""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"stream_state":$st,"noisy":$noisyJson,"regressed":$regJson,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // Belt-and-braces for the stdout contract: any log decoration a
    // launcher wraps around stdout (sbt's forked-run logger prefixed
    // every line with "[info] " until r15) must not blind the consumer,
    // so the same line is mirrored to a well-known file in the cwd.
    try {
      val w = new java.io.PrintWriter("BENCH_SELF.json", "UTF-8")
      try w.println(line) finally w.close()
    } catch { case _: Exception => () }
    spark.stop()
  }
}
