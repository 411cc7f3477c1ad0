package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.ImageCodec

/** The storage contract the reference's DataStorage base class defines
  * (data_storage.py:9-264) with the DISTRIBUTED transfer paths shared
  * across backends: the reference parallelizes uploads/downloads with a
  * per-dataset process/thread pool (data_storage.py:161,
  * s3_storage.py:102); here the same role is played by executor
  * parallelism — uploads are a `mapPartitions` writer loop over the
  * frame DataFrame and reads come back through Spark's `binaryFile`
  * source, so a 1000-executor cluster moves 1000 frames at a time with
  * no coordinator loop, identically for every backend.
  *
  * Backends supply only the reference's true per-backend seams:
  * existence semantics (directory checks for local_storage.py,
  * key-prefix listings for s3_storage.py), the conditional-create
  * primitive, and the visibility check a task runs before writing.
  */
trait FrameStorageApi extends Serializable {

  /** Backend root + raw_frames|raw_files + dataset ID — the base every
    * stored frame of this dataset lives under, readable both by
    * Spark's sources and by the single-file nio paths.
    */
  def idStoragePath: String

  /** A dataset ID may enter storage once (local_storage.py:49-56 /
    * s3_storage.py:34-45).
    */
  def assertUniqueId(): Unit

  /** True iff the storage path is free to write (local_storage.py:58-69
    * / s3_storage.py:47-61).
    */
  def nonexistentStoragePath(storagePath: String): Boolean

  def getStoragePath(fileName: String): String =
    s"$idStoragePath/$fileName"

  /** Driver-side preparation before a distributed write (local: create
    * the dataset directory; bucket-shaped stores have no directories —
    * the emulation materializes the prefix).
    */
  protected def prepareUpload(): Unit

  /** Executor-side ATOMIC conditional create: write `fileName` iff no
    * object holds that name yet; false (skip) otherwise. The
    * reference's check-then-write (local_storage.py:116-118,
    * s3_storage.py:91-104) races when two workers carry the same name —
    * an atomic create can't double-write.
    */
  protected def putNew(fileName: String, bytes: Array[Byte]): Boolean

  /** Executor-side visibility check, run once per partition before any
    * write: a task that can't see the storage root is on a node where
    * the mount/bucket isn't shared — fail loudly rather than write to
    * a local disk nobody will read.
    */
  protected def checkVisible(): Unit

  /** Executor-side delete primitive: remove the named object under
    * the dataset base iff present; true when something was deleted
    * (local: unlink the file; object store: DeleteObject on the key —
    * both idempotent, a missing name is false, never an error).
    */
  protected def deleteObject(fileName: String): Boolean =
    Files.deleteIfExists(Paths.get(getStoragePath(fileName)))

  /** Distributed frame upload (upload_frames, local_storage.py:85-106 /
    * s3_storage.py:72-104): every (file_name, payload) row lands as a
    * real object under the dataset base; existing names are skipped per
    * the reference's overwrite guard. Returns (written, skipped) —
    * the reference prints skips; a Spark job surfaces them as data.
    */
  def uploadFrames(framed: DataFrame): (Long, Long) = {
    prepareUpload()
    val self = this
    val spark = framed.sparkSession
    import spark.implicits._
    val flags = framed.select(col("file_name"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        self.checkVisible()
        rows.map { case (name, bytes) => self.putNew(name, bytes) }
      }
      .toDF("written")
      .agg(
        coalesce(sum(when(col("written"), 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("written"), 0L).otherwise(1L)), lit(0L)))
      .head()
    (flags.getLong(0), flags.getLong(1))
  }

  /** Single-image upload with the overwrite guard (upload_im,
    * local_storage.py:122-136 / s3_storage.py:123-145). True if written.
    */
  def uploadIm(imName: String, png: Array[Byte]): Boolean = {
    prepareUpload()
    putNew(imName, png)
  }

  /** raw_files branch: register a file into storage unopened
    * (upload_file, local_storage.py:138-151 / s3_storage.py:147-161).
    */
  def uploadFile(filePath: String): Unit = {
    assertUniqueId()
    prepareUpload()
    val name = Paths.get(filePath).getFileName.toString
    Files.copy(Paths.get(filePath), Paths.get(getStoragePath(name)),
      StandardCopyOption.COPY_ATTRIBUTES)
  }

  /** Fetch one frame's pixels (get_im, local_storage.py:153-164 /
    * s3_storage.py:163-176 — IMREAD_ANYDEPTH parity via
    * [[ImageCodec.decodeGray]]).
    */
  def getIm(fileName: String): (Int, Int, Array[Int]) =
    ImageCodec.decodeGray(
      Files.readAllBytes(Paths.get(getStoragePath(fileName))))

  /** The whole dataset's stored bytes as a DataFrame — Spark's
    * binaryFile source: a DISTRIBUTED scan with path pruning, the
    * cluster-shaped replacement for the reference's thread-pool
    * `get_stack` loop (data_storage.py:150-168). On a real object
    * store the same code reads `s3a://bucket/...` — the source speaks
    * any Hadoop filesystem. Columns: file_name, payload.
    */
  def readFrames(spark: SparkSession): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(idStoragePath)
      .select(
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("content").as("payload"))

  /** Download-path stack assembly from REAL stored bytes
    * (get_stack_from_meta, data_storage.py:198-241): stored frames
    * join their c/z/t/p indices from `framesMeta`, then the ordered
    * per-dataset stack + squeeze dim-order come from the same
    * aggregate the metadata path proves
    * ([[graft.multimodal.BinaryFrames.assembleStacksOf]]).
    *
    * `framesMeta` needs (dataset_id, file_name, channel_idx,
    * slice_idx, time_idx, pos_idx); `geometry` per-dataset
    * (dataset_id, im_height, im_width, im_colors).
    */
  def stackFromStorage(spark: SparkSession, framesMeta: DataFrame,
      geometry: DataFrame): DataFrame =
    graft.multimodal.BinaryFrames.assembleStacksOf(
      readFrames(spark).join(framesMeta, Seq("file_name"))
        .select(col("dataset_id"), col("channel_idx"), col("slice_idx"),
          col("time_idx"), col("pos_idx"), col("payload")),
      geometry)

  /** Distributed byte download (download_files, data_storage.py:243-253):
    * copy the named files from storage into `destDir` without opening
    * them — a binaryFile scan + per-partition write loop. Returns
    * files copied.
    */
  def downloadFiles(spark: SparkSession, fileNames: Seq[String],
      destDir: String): Long = {
    if (fileNames.isEmpty) return 0L
    Files.createDirectories(Paths.get(destDir))
    val wanted = fileNames.toSet
    import spark.implicits._
    readFrames(spark)
      .filter(col("file_name").isInCollection(wanted))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        FrameStorage.assertMounted(destDir)
        rows.map { case (name, bytes) =>
          Files.write(Paths.get(destDir, name), bytes)
          1L
        }
      }
      .toDF("n")
      .agg(coalesce(sum("n"), lit(0L)))
      .head().getLong(0)
  }

  /** Manifest-driven download with NO driver-side file list: the
    * stored frames semi-join the manifest DataFrame on file_name and
    * each match copies inside its partition — scaling to manifests a
    * driver couldn't hold. Returns files copied.
    */
  def downloadManifest(spark: SparkSession, manifest: DataFrame,
      destDir: String): Long = {
    Files.createDirectories(Paths.get(destDir))
    import spark.implicits._
    readFrames(spark)
      .join(broadcast(manifest.select("file_name").distinct()),
        Seq("file_name"), "left_semi")
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        FrameStorage.assertMounted(destDir)
        rows.map { case (name, bytes) =>
          Files.write(Paths.get(destDir, name), bytes)
          1L
        }
      }
      .toDF("n")
      .agg(coalesce(sum("n"), lit(0L)))
      .head().getLong(0)
  }

  /** Single-file download, unopened (download_file,
    * local_storage.py:166-176 / s3_storage.py:178-195).
    */
  def downloadFile(fileName: String, destDir: String): Unit = {
    Files.createDirectories(Paths.get(destDir))
    Files.copy(Paths.get(getStoragePath(fileName)),
      Paths.get(destDir, fileName), StandardCopyOption.REPLACE_EXISTING)
  }

  /** Stored frame NAMES as a DataFrame — the listing-only projection
    * of [[readFrames]]: the binaryFile source prunes the `content`
    * column when it isn't selected, so this is a distributed file
    * LISTING, no payload bytes move. The delete path reads this, not
    * [[readFrames]] — downloading a frame to delete it would be
    * paying the takedown's dominant cost for nothing.
    */
  def listFrames(spark: SparkSession): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(idStoragePath)
      .select(element_at(split(col("path"), "/"), -1).as("file_name"))

  /** Manifest-driven distributed blob delete — [[downloadManifest]]'s
    * shape in reverse, and the piece a takedown legally targets: the
    * stored PNG BYTES of the victim frames. The stored names semi-join
    * the manifest on file_name and each match unlinks inside its
    * partition — no driver-side file list, scaling to manifests a
    * driver couldn't hold (a victim dataset's frame roster comes
    * straight off the metadata store as a DataFrame). Idempotent:
    * already-gone names count zero. Returns blobs deleted.
    */
  def deleteManifest(spark: SparkSession, manifest: DataFrame): Long = {
    val self = this
    import spark.implicits._
    listFrames(spark)
      .join(broadcast(manifest.select("file_name").distinct()),
        Seq("file_name"), "left_semi")
      .as[String]
      .mapPartitions { rows =>
        self.checkVisible()
        rows.map(name => if (self.deleteObject(name)) 1L else 0L)
      }
      .toDF("n")
      .agg(coalesce(sum("n"), lit(0L)))
      .head().getLong(0)
  }

  /** Bulk dataset takedown: remove EVERY stored object under the
    * dataset base — the whole-prefix delete a compliance pass runs
    * when the dataset itself is the victim (local: remove the dataset
    * directory, local_storage.py's unit of existence; object store:
    * delete every key under the prefix, the batched DeleteObjects
    * idiom). Driver-side walk on purpose: one dataset's blob roster
    * is the unit of acquisition, and the surgical frame-level path
    * ([[deleteManifest]]) is the distributed one. Returns objects
    * removed; 0 when the dataset was never stored.
    */
  def deleteDatasetBlobs(): Long = {
    val root = Paths.get(idStoragePath)
    if (!Files.exists(root)) return 0L
    var n = 0L
    val stream = Files.walk(root)
    try {
      // children before parents (reverse path order), files counted,
      // the emulation's materialized prefix directories just removed
      stream.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach { p =>
          if (Files.isRegularFile(p)) { Files.delete(p); n += 1 }
          else Files.delete(p)
        }
    } finally stream.close()
    n
  }
}
