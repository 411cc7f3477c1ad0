package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Retire-aside-then-swap for DIRECTORY-partitioned parquet roots —
  * the [[TrainingExport.deleteDocs]] shard-swap discipline factored
  * out for arbitrary partition paths (`project=P`,
  * `batch=3/project=P`), so the imaging-side takedown family
  * ([[ImagingStore.deleteDatasets]],
  * [[graft.streaming.ImgStream.deleteDatasets]]) shares one
  * crash-safety argument with the text-side stores instead of
  * re-deriving it per layout:
  *
  *  - the caller stages the affected partitions' SURVIVORS under
  *    `staging/<relpath>` (same partition directory names the live
  *    root uses), then calls [[swap]];
  *  - each live partition renames ASIDE under `staging/retired/
  *    <relpath>` (never delete-before-replace), the staged survivors
  *    move in, and only then is the staging root dropped — at no
  *    instant is a partition's data absent from disk;
  *  - a partition emptied by the delete simply has no staged
  *    directory: the retired copy is not replaced and the partition
  *    vanishes from the root (the [[TrainingExport]] emptied-shard
  *    case);
  *  - an interrupted pass leaves the retired copy recoverable:
  *    [[recover]] restores any retired partition whose live directory
  *    is missing (the crash happened between the two renames, so the
  *    retired copy is that partition's ONLY copy) and then clears the
  *    staging root — run it before every pass, exactly like
  *    [[TrainingExport.recoverStaging]].
  */
private[graft] object PartitionSwap {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Swap exactly `partDirs` (root-relative partition paths) from
    * `staging` into `root`, retiring the live copies aside first.
    * Every rename reports failure as false — a silent false would
    * either drop a partition or leave victims live, so each step
    * requires.
    */
  def swap(spark: SparkSession, root: String, staging: String,
      partDirs: Seq[String]): Unit = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val retired = new Path(staging, "retired")
    for (d <- partDirs) {
      val live = new Path(rootP, d)
      val staged = new Path(staging, d)
      val aside = new Path(retired, d)
      fs.mkdirs(aside.getParent)
      if (fs.exists(live))
        require(fs.rename(live, aside), s"partition retire failed: $live")
      if (fs.exists(staged))
        require(fs.rename(staged, live), s"partition swap failed: $staged")
    }
    fs.delete(new Path(staging), true)
    // the session-level FileStatusCache still holds the PRE-swap
    // listing for this root — a later read would chase retired part
    // files (FAILED_READ_FILE) or silently miss the swapped-in ones
    spark.catalog.refreshByPath(root)
  }

  /** Recovery sweep for an interrupted [[swap]]: every retired
    * partition directory (a dir under `staging/retired` that directly
    * holds files — partition LEAVES, at any nesting depth) whose live
    * twin is absent is renamed back into the root; retired copies
    * whose live directory exists were superseded by a completed swap
    * and drop with the rest of the staging root. Idempotent; no-op
    * when no staging root exists.
    */
  def recover(spark: SparkSession, root: String, staging: String): Unit = {
    val stagingP = new Path(staging)
    val fs = fsOf(spark, stagingP)
    if (!fs.exists(stagingP)) return
    val retired = new Path(stagingP, "retired")
    if (fs.exists(retired)) {
      def leaves(p: Path): Seq[Path] = {
        val st = fs.listStatus(p)
        val hasFiles = st.exists(_.isFile)
        if (hasFiles) Seq(p)
        else st.filter(_.isDirectory).toSeq.flatMap(s => leaves(s.getPath))
      }
      val retiredUri = retired.toUri.getPath
      for (leaf <- leaves(retired)) {
        val rel = leaf.toUri.getPath.stripPrefix(retiredUri)
          .stripPrefix("/")
        val live = new Path(root, rel)
        if (!fs.exists(live)) {
          fs.mkdirs(live.getParent)
          require(fs.rename(leaf, live), s"partition recover failed: $live")
        }
      }
    }
    fs.delete(stagingP, true)
    spark.catalog.refreshByPath(root)
  }
}
