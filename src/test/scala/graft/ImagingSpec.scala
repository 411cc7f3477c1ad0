package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.imaging.{ImagingModel, ImagingOps, SplitterIngest}

class ImagingSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("dataset serial round-trips through the reference parse") {
    val bad = ImagingOps.serialDatetime(spark, sfDir)
      .filter(col("consistent") =!= 1).count()
    assert(bad === 0)
  }

  test("frames subset honors every slicing dimension") {
    val rows = ImagingOps.framesSubset(spark, sfDir)
    assert(rows.count() > 0)
    assert(rows.filter(!col("channel_name").isin("DAPI", "Cy3")).count() === 0)
    assert(rows.filter(col("slice_idx") > 3).count() === 0)
    assert(rows.filter(col("time_idx") > 2).count() === 0)
  }

  test("global meta is consistent with raw frames") {
    val g = ImagingOps.globalMeta(spark, sfDir)
    val total = g.agg(sum("nbr_frames")).head().getLong(0)
    assert(total === ImagingModel.frames(spark, sfDir).count())
    assert(g.filter(col("nbr_channels") > 4).count() === 0)
    assert(g.filter(col("nbr_slices") > 8).count() === 0)
  }

  test("sha dedup only reports real duplicate groups") {
    val d = ImagingOps.shaDedup(spark, sfDir)
    assert(d.count() > 0)
    assert(d.filter(col("n_frames") <= 1).count() === 0)
  }

  test("splitter ingest round-trips the frame indices") {
    // carry the original indices alongside so no self-join is needed
    // ((orderkey, linenumber) is not unique in this data, so file_name
    // is not a join key)
    val d = ImagingModel.dataSet(spark, sfDir)
      .select(col("id").as("ds_id"), col("dataset_serial"))
    val listing = ImagingModel.frames(spark, sfDir)
      .join(d, col("frames_global_id") === col("ds_id"))
      .select(col("dataset_serial"), col("file_name"),
        col("channel_idx").as("c0"), col("slice_idx").as("z0"),
        col("time_idx").as("t0"), col("pos_idx").as("p0"))
    val parsed = SplitterIngest.parseIndices(listing)
    assert(parsed.count() === listing.count())
    assert(parsed.filter(col("c0") =!= col("channel_idx")
      || col("z0") =!= col("slice_idx")
      || col("t0") =!= col("time_idx")
      || col("p0") =!= col("pos_idx")).count() === 0)
  }

  test("metadata ingest twin matches the filename-parse path") {
    // the OME-TIFF path derives indices + channel name from each
    // page's MicroManagerMetadata JSON; restrict to frames whose
    // planted metadata is conformant (the audit's violation rows
    // would parse to nulls by design)
    val f = ImagingModel.frames(spark, sfDir)
      .filter(col("id") % 7 =!= 0 && col("id") % 11 =!= 0
        && col("id") % 13 =!= 0)
    val listing = f.select(
      col("frames_global_id").cast("string").as("dataset_serial"),
      col("metadata_json"),
      col("channel_idx").as("c0"), col("slice_idx").as("z0"),
      col("time_idx").as("t0"), col("pos_idx").as("p0"),
      col("channel_name").as("n0"))
    val parsed = SplitterIngest.parseMetadata(listing)
    assert(parsed.count() === listing.count())
    // JSON-derived indices and channel NAME equal the stored truth
    assert(parsed.filter(col("c0") =!= col("channel_idx")
      || col("z0") =!= col("slice_idx")
      || col("t0") =!= col("time_idx")
      || col("p0") =!= col("pos_idx")
      || col("n0") =!= col("channel_name")).count() === 0)
    // generated names follow the im_c###_z###_t###_p### convention
    assert(parsed.filter(!col("file_name")
      .rlike("^im_c\\d{3}_z\\d{3}_t\\d{3}_p\\d{3}\\.png$")).count() === 0)
    // both ingest paths assemble identical global metadata
    val gMeta = SplitterIngest.globalMetaFromFrames(parsed)
    val gName = SplitterIngest.globalMetaFromFrames(
      SplitterIngest.parseIndices(
        parsed.select("dataset_serial", "file_name")))
    assert(gMeta.except(gName).count() === 0)
    assert(gName.except(gMeta).count() === 0)
  }

  test("meta audit counts exactly the planted violation rates") {
    val f = ImagingModel.frames(spark, sfDir)
    val expectedMissing = f.filter(col("id") % 7 === 0).count()
    val expectedBadType = f.filter(col("id") % 11 === 0
      || col("id") % 13 === 0).count()
    val audit = ImagingOps.metaValidate(spark, sfDir)
      .agg(sum("n_missing_key"), sum("n_type_mismatch"), sum("n_frames"),
        sum("n_valid")).head()
    assert(audit.getLong(0) === expectedMissing)
    assert(audit.getLong(1) === expectedBadType)
    // every frame is either valid or flagged (flags can overlap)
    assert(audit.getLong(3) <= audit.getLong(2))
    assert(audit.getLong(3) >=
      audit.getLong(2) - expectedMissing - expectedBadType)
  }

  test("needle queries return empty, not errors, for unknown serials") {
    import graft.imaging.ImagingDb
    val none = "NOPE-2099-01-01-00-00-00-9999"
    assert(ImagingDb.getFramesSubset(spark, sfDir, none).count() === 0)
    assert(ImagingDb.getFramesMeta(spark, sfDir, none).count() === 0)
    assert(ImagingDb.getFilenames(spark, sfDir, none).count() === 0)
  }

  test("ingest flags already-registered datasets") {
    val listing = ImagingModel.frames(spark, sfDir).limit(100)
      .select(lit("NEW-2026-01-01-00-00-00-1").as("dataset_serial"),
        col("file_name"))
    val registered = ImagingModel.dataSet(spark, sfDir)
    val out = SplitterIngest.ingest(listing, registered)
    assert(out.filter(col("already_registered")).count() === 0)
    val dupListing = listing
      .withColumn("dataset_serial",
        lit(registered.select("dataset_serial").head().getString(0)))
    assert(SplitterIngest.ingest(dupListing, registered)
      .filter(!col("already_registered")).count() === 0)
  }
}
