package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextOps
import graft.tables.Tables

/** Sharded training-data export — the terminal operator of the
  * dedup → filter → sample pipeline: lay the corpus out as
  * hash-sharded parquet a trainer streams shard by shard.
  *
  * 100 TB design:
  *  - shard = the deterministic md5 bucket of the doc key
  *    ([[graft.ops.TextOps.shardCol]]) — reproducible across runs,
  *    engines and cluster sizes, unlike `pmod(hash(...))` whose seed
  *    and algorithm are engine-private. [[graft.ops.TextOps.shardStats]]
  *    is the pre-flight audit of exactly this assignment;
  *  - ONE exchange: a repartition on the shard key so writer tasks own
  *    whole shards, then `partitionBy(shard)` lays out `shard=N`
  *    directories. A trainer (or [[readShard]]) reads one directory,
  *    partition-pruned at the source — scanning 1/nShards of the
  *    corpus to read one shard is the contract;
  *  - rows inside a writer task sort by the md5 stream order
  *    ([[graft.ops.TextOps.ordCol]]), so a shard file IS the
  *    [[graft.ops.TextOps.packStats]] packing stream: a sequential
  *    reader sees docs in the audited concat-then-cut order;
  *  - nShards is configuration: at 100 TB it scales with the corpus
  *    (keeping shard files at a fixed target size) while every plan
  *    here is unchanged.
  */
object TrainingExport {

  /** Write the documents table as a sharded training export. */
  def export(spark: SparkSession, dir: String, out: String,
      nShards: Int = 64): Unit =
    exportCorpus(Tables.documents(spark, dir), out, nShards)

  /** Write any corpus with a `doc_id` column as a sharded export. */
  def exportCorpus(corpus: DataFrame, out: String, nShards: Int): Unit =
    corpus
      .withColumn("shard", TextOps.shardCol(nShards))
      .withColumn("ord", TextOps.ordCol)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "ord", "doc_id")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard").parquet(out)

  /** Append a new document batch into an existing export: the
    * deterministic shard assignment routes batch rows into their
    * existing `shard=N` directories (new files per batch — the
    * append-compaction trade [[ImagingStore.compact]] documents).
    * O(batch) work regardless of export size: nothing existing is
    * read or rewritten, which is what makes the sink incremental the
    * way [[DocumentStore.append]] is.
    */
  def appendCorpus(batch: DataFrame, out: String, nShards: Int): Unit =
    batch
      .withColumn("shard", TextOps.shardCol(nShards))
      .withColumn("ord", TextOps.ordCol)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "ord", "doc_id")
      .write.mode(SaveMode.Append)
      .partitionBy("shard").parquet(out)

  /** One shard, partition-pruned: the scan must read only the
    * `shard=N` directory (TrainingExportSpec asserts the
    * PartitionFilters), never list-and-filter the whole export.
    */
  def readShard(spark: SparkSession, out: String, shard: Int): DataFrame =
    spark.read.parquet(out).filter(col("shard") === shard)

  /** Compact an export that has accrued append debt: each
    * [[appendCorpus]] lands one file batch per shard directory, and a
    * trainer streaming a shard pays per-file open/seek overhead — the
    * same small-files debt [[ImagingStore.compact]] settles for the
    * frame store. One repartition exchange rebuilds one writer task
    * per shard and re-sorts the merged rows into the packing stream
    * order, so the compacted shard file is byte-for-byte the layout a
    * fresh [[exportCorpus]] of the combined corpus would have written.
    */
  def compactShards(spark: SparkSession, in: String, out: String,
      nShards: Int = 64): Unit =
    spark.read.parquet(in)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "ord", "doc_id")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard").parquet(out)

  /** Targeted document deletion — the takedown / right-to-be-forgotten
    * pass a training corpus must support. The deterministic shard
    * assignment locates every victim's directory WITHOUT scanning the
    * export: only the ≤ nShards affected `shard=N` directories are
    * read, anti-joined and rewritten (staged, then swapped per
    * directory); every other shard's files are never opened, let
    * alone rewritten — O(affected shards), not O(corpus), which at
    * 100 TB is the difference between a minutes-long surgical pass
    * and a full-corpus rewrite. The rewrite re-sorts the survivors,
    * so affected shards keep the packing stream order.
    *
    * The affected-shard collect is bounded by nShards (a layout
    * constant), never by corpus or victim count.
    */
  def deleteDocs(spark: SparkSession, out: String, ids: DataFrame,
      nShards: Int = 64): Unit = {
    val victims = ids.select(col("doc_id"))
      .withColumn("shard", TextOps.shardCol(nShards))
    val affected = victims.select("shard").distinct()
      .collect().map(_.getLong(0)).sorted
    if (affected.isEmpty) return
    val tmp = out + "_delete_staging"
    spark.read.parquet(out)
      .filter(col("shard").isin(affected: _*))
      .join(victims.select("doc_id"), Seq("doc_id"), "left_anti")
      .repartition(affected.length, col("shard"))
      .sortWithinPartitions("shard", "ord", "doc_id")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val outRoot = new org.apache.hadoop.fs.Path(out)
    val fs = outRoot.getFileSystem(conf)
    for (s <- affected) {
      val live = new org.apache.hadoop.fs.Path(out, s"shard=$s")
      val staged = new org.apache.hadoop.fs.Path(tmp, s"shard=$s")
      if (fs.exists(live)) fs.delete(live, true)
      // a shard emptied by the delete has no staged directory — the
      // live directory simply goes away (rename reports failure as
      // false, so guard + require: silently losing the swap would
      // drop a whole shard)
      if (fs.exists(staged))
        require(fs.rename(staged, live), s"shard swap failed: $staged")
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** Post-write manifest: per-shard row counts straight off the
    * export's own partition column — the check a downstream trainer
    * runs against [[graft.ops.TextOps.shardStats]] before consuming.
    */
  def manifest(spark: SparkSession, out: String): DataFrame =
    spark.read.parquet(out)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("shard")
}
