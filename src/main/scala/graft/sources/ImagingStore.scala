package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.imaging.ImagingModel

/** Parquet-backed imaging store (SURVEY.md §2.5 sink): the Spark
  * counterpart of the reference's filestorage layer (s3_storage.py /
  * local_storage.py) plus the metadata DB, as one partitioned layout.
  *
  * Layout: frames partitioned by project — at 100 TB partition pruning
  * turns any per-project/per-dataset query into a partial scan, and
  * writes are append-only per dataset (the reference's
  * assert_unique_id-then-upload discipline maps to idempotent
  * dataset-partition overwrite).
  */
object ImagingStore {

  /** Write the frames fact partitioned by project. */
  def writeFrames(spark: SparkSession, dir: String, out: String): Unit = {
    val d = ImagingModel.dataSet(spark, dir)
      .select(col("id").as("ds_id"),
        expr("split_part(dataset_serial, '-', 1)").as("project"))
    ImagingModel.frames(spark, dir)
      .join(broadcast(d), col("frames_global_id") === col("ds_id"))
      .drop("ds_id")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("project")
      .parquet(out)
  }

  /** Read back one project's frames — must hit only that partition
    * (verified by the spec via the plan's partition filters).
    */
  def readProject(spark: SparkSession, store: String, project: String): DataFrame =
    spark.read.parquet(store).filter(col("project") === project)
}
