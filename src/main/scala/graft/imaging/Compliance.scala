package graft.imaging

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{AudioStats, FrameStats, FrameStorageApi,
  ImagingStore}
import graft.streaming.{AudStream, ImgStream}

/** The dataset-level compliance orchestrator — ONE entry point for
  * the right-to-be-forgotten request a facility actually receives:
  * "delete dataset X", where X is the reference's unit of ownership
  * (db_operations.py:145-166 `get_datasets`). r13/r14 gave every
  * store its own surgical takedown pass; this composes them so a
  * compliance officer calls one method and gets one report, instead
  * of knowing the store topology by heart (and missing the streamed
  * landing dirs, the classic leak).
  *
  * Deletion ORDER is serve-stops-first, the [[graft.sources
  * .TermIndexStore.deleteDocs]] discipline lifted to the modality
  * stores: the metadata/QC layers that make a dataset FINDABLE go
  * first (canonical frame store, then the decode-once stat tables,
  * then the streamed landing dirs), the blob bytes last — a crash
  * mid-pass leaves orphaned bytes nothing can locate through the
  * serving paths, never a findable dataset whose bytes were already
  * promised gone. Every underlying pass is idempotent, so re-running
  * the same request completes whatever a crash interrupted.
  *
  * Each store is optional: a deployment names the pieces it actually
  * runs. Blob storages are per-dataset handles (the
  * [[FrameStorageApi]] construction unit — mount/bucket + the
  * dataset's own prefix), so callers pass one handle per victim
  * dataset; [[DatasetStores.blobManifest]] is the alternative for
  * frame-granular deletes driven by a metadata roster.
  */
object Compliance {

  /** The store topology one logical dataset collection spans. */
  final case class DatasetStores(
      imagingStore: Option[String] = None,
      frameStatsTable: Option[String] = None,
      audioStatsTable: Option[String] = None,
      imgStreamStore: Option[String] = None,
      imgStatsStore: Option[String] = None,
      audStatsStore: Option[String] = None,
      blobStorages: Seq[FrameStorageApi] = Nil,
      blobManifest: Option[DataFrame] = None)

  /** What left each layer — one row per store touched, so the report
    * doubles as the audit record a compliance pass must produce.
    */
  final case class DeleteReport(
      imagingRows: Long, frameStatRows: Long, audioStatRows: Long,
      imgStreamRows: Long, imgStatsRows: Long, audStatsRows: Long,
      blobObjects: Long)

  /** Delete the given dataset ids (`ids(dataset_id)`) from every
    * configured store, serve-stops-first. Idempotent end to end.
    */
  def deleteDatasets(spark: SparkSession, ids: DataFrame,
      stores: DatasetStores): DeleteReport = {
    val victims = ids.select("dataset_id").localCheckpoint(true)
    // 1. the canonical serving layer: metadata frame store first —
    //    after this the dataset is unfindable through readProject
    val img = stores.imagingStore.fold(0L)(
      ImagingStore.deleteDatasets(spark, _, victims))
    // 2. derived QC moments (they reconstruct per-frame facts)
    val fs = stores.frameStatsTable.fold(0L)(t =>
      FrameStats.deleteDatasets(spark, t, victims).removedRows)
    val as = stores.audioStatsTable.fold(0L)(t =>
      AudioStats.deleteDatasets(spark, t, victims).removedRows)
    // 3. the streamed landing dirs — the leak a per-store checklist
    //    forgets
    val ims = stores.imgStreamStore.fold(0L)(
      ImgStream.deleteDatasets(spark, _, victims))
    val imq = stores.imgStatsStore.fold(0L)(
      ImgStream.deleteStatsDatasets(spark, _, victims))
    val auq = stores.audStatsStore.fold(0L)(
      AudStream.deleteStatsDatasets(spark, _, victims))
    // 4. the bytes themselves, last: frame-granular when a roster is
    //    given (the manifest sweeps every handle — a name absent in a
    //    storage deletes nothing there), whole-prefix otherwise
    val blobs = stores.blobManifest match {
      case Some(m) =>
        require(stores.blobStorages.nonEmpty,
          "blobManifest needs at least one storage handle to sweep")
        stores.blobStorages.map(_.deleteManifest(spark, m)).sum
      case None =>
        stores.blobStorages.map(_.deleteDatasetBlobs()).sum
    }
    DeleteReport(img, fs, as, ims, imq, auq, blobs)
  }
}
