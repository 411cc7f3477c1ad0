package graft.imaging

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Upload-path twin (SURVEY.md §2.5): the reference's splitter pipeline
  * (file_splitter.py + filename_parsers.py) as one distributed batch
  * job — from a listing of frame file names to registered frames rows
  * plus per-dataset global metadata, the two tables insert_frames
  * (db_operations.py:145-215) writes.
  *
  * At 100 TB this is the ingest shape: the listing is a dataframe (from
  * object-store inventory), parsing is pure column work, and the only
  * shuffle is the per-dataset metadata aggregate.
  */
object SplitterIngest {

  /** parse_idx_from_name (filename_parsers.py:83-117): extract the four
    * c/z/t/p integers from `im_c###_z###_t###_p###*.ext` names.
    * Input: (dataset_serial, file_name). Output adds channel_idx,
    * slice_idx, time_idx, pos_idx, channel_name.
    */
  def parseIndices(listing: DataFrame): DataFrame =
    listing
      .withColumn("channel_idx",
        expr("cast(substr(split_part(file_name, '_', 2), 2) as int)"))
      .withColumn("slice_idx",
        expr("cast(substr(split_part(file_name, '_', 3), 2) as int)"))
      .withColumn("time_idx",
        expr("cast(substr(split_part(file_name, '_', 4), 2) as int)"))
      .withColumn("pos_idx",
        expr("cast(substr(split_part(file_name, '_', 5), 2) as int)"))
      .withColumn("channel_name", col("channel_idx").cast("string"))

  /** The global metadata the splitter assembles per dataset
    * (file_splitter.py set_global_meta): frame counts and per-dimension
    * cardinalities, validated the way meta_utils.validate_global_meta
    * requires every field present.
    */
  def globalMetaFromFrames(parsed: DataFrame): DataFrame =
    parsed.groupBy("dataset_serial")
      .agg(
        count(lit(1)).as("nbr_frames"),
        countDistinct(col("slice_idx")).as("nbr_slices"),
        countDistinct(col("channel_idx")).as("nbr_channels"),
        countDistinct(col("time_idx")).as("nbr_timepoints"),
        countDistinct(col("pos_idx")).as("nbr_positions"))

  /** Full ingest: listing → parsed frames + global meta, with the
    * insert-time uniqueness check (assert_unique_id) as an audit
    * column: datasets already registered are flagged, not inserted.
    */
  def ingest(listing: DataFrame, registered: DataFrame): DataFrame = {
    val parsed = parseIndices(listing)
    val existing = registered.select(col("dataset_serial").as("reg_serial"))
      .distinct()
    parsed.join(broadcast(existing),
        col("dataset_serial") === col("reg_serial"), "left")
      .withColumn("already_registered", col("reg_serial").isNotNull)
      .drop("reg_serial")
  }
}
