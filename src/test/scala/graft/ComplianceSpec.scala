package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.imaging.{Compliance, ImagingModel}
import graft.multimodal.{BinaryAudio, BinaryFrames}
import graft.sources.{AudioStats, FrameStats, FrameStorage,
  ImagingStore}
import graft.streaming.{AudStream, ImgStream}

/** The one-call compliance pass: deleting a dataset through
  * [[Compliance.deleteDatasets]] must leave NO trace of it in any
  * configured layer — canonical store, QC moment tables, streamed
  * landing dirs, blob bytes — and a re-run must be a no-op.
  */
class ComplianceSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("one call purges a dataset from every configured store; " +
      "re-running is a no-op") {
    val base = Files.createTempDirectory("graft_compliance")
    val imgStore = base.resolve("img").toString
    val imsStore = base.resolve("ims").toString
    val imqStore = base.resolve("imq").toString
    val auqStore = base.resolve("auq").toString
    val mount = base.resolve("mount").toString
    Files.createDirectories(java.nio.file.Paths.get(mount))
    val tmp = Files.createTempDirectory("graft_compliance_db").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_cmp LOCATION '$tmp'")
    val fsT = "graft_cmp.framestats"
    val asT = "graft_cmp.audiostats"
    try {
      // build every layer from the same corpus
      ImagingStore.writeFrames(spark, sfDir, imgStore)
      FrameStats.write(spark, sfDir, fsT)
      AudioStats.write(spark, sfDir, asT)
      val d = ImagingModel.dataSet(spark, sfDir)
        .select(col("id").as("ds_id"),
          expr("split_part(dataset_serial, '-', 1)").as("project"))
      val frames = ImagingModel.frames(spark, sfDir)
        .join(broadcast(d), col("frames_global_id") === col("ds_id"))
        .drop("ds_id")
      ImgStream.landBatch(spark, frames, imsStore, 0L)
      ImgStream.landStats(spark, ImagingModel.frames(spark, sfDir),
        imqStore, 0L)
      AudStream.landStats(spark,
        BinaryAudio.withAudioPayload(spark, sfDir), auqStore, 0L)

      // the victim: a dataset that exists in every layer, with its
      // blobs uploaded under its own per-dataset handle
      val victim = spark.table(fsT).agg(min("dataset_id"))
        .head().getLong(0)
      val blobs = new FrameStorage(mount, s"raw_frames/$victim")
      blobs.uploadFrames(BinaryFrames.withPayload(spark, sfDir)
        .filter(expr("frame_id div 10") === victim))
      assert(blobs.listFrames(spark).count() > 0)

      import spark.implicits._
      val ids = Seq(victim).toDF("dataset_id")
      val stores = Compliance.DatasetStores(
        imagingStore = Some(imgStore),
        frameStatsTable = Some(fsT),
        audioStatsTable = Some(asT),
        imgStreamStore = Some(imsStore),
        imgStatsStore = Some(imqStore),
        audStatsStore = Some(auqStore),
        blobStorages = Seq(blobs))
      val rep = Compliance.deleteDatasets(spark, ids, stores)
      assert(rep.imagingRows > 0 && rep.frameStatRows > 0
        && rep.audioStatRows > 0 && rep.imgStreamRows > 0
        && rep.imgStatsRows > 0 && rep.audStatsRows > 0
        && rep.blobObjects > 0, s"every layer must report removals: $rep")

      // no trace anywhere
      assert(spark.read.parquet(imgStore)
        .filter(col("frames_global_id") === victim).count() === 0)
      assert(spark.table(fsT)
        .filter(col("dataset_id") === victim).count() === 0)
      assert(spark.table(asT)
        .filter(col("dataset_id") === victim).count() === 0)
      assert(ImgStream.readStreamed(spark, imsStore)
        .filter(col("frames_global_id") === victim).count() === 0)
      assert(ImgStream.readStats(spark, imqStore)
        .filter(col("dataset_id") === victim).count() === 0)
      assert(AudStream.readStats(spark, auqStore)
        .filter(col("dataset_id") === victim).count() === 0)
      assert(!Files.exists(
        java.nio.file.Paths.get(blobs.idStoragePath)))

      // end-to-end idempotency
      val again = Compliance.deleteDatasets(spark, ids, stores)
      assert(again === Compliance.DeleteReport(0, 0, 0, 0, 0, 0, 0),
        s"re-run must be a no-op: $again")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $fsT")
      spark.sql(s"DROP TABLE IF EXISTS $asT")
      spark.sql("DROP DATABASE IF EXISTS graft_cmp")
    }
  }
}
