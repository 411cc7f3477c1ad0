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
      // digit-RUN extraction per token, like the reference's
      // re.findall(r'\d+') — robust to the extension riding on the
      // last token (`p003.png`) and to suffixed names alike
      .withColumn("channel_idx",
        expr("cast(regexp_extract(split_part(file_name, '_', 2), '[0-9]+', 0) as int)"))
      .withColumn("slice_idx",
        expr("cast(regexp_extract(split_part(file_name, '_', 3), '[0-9]+', 0) as int)"))
      .withColumn("time_idx",
        expr("cast(regexp_extract(split_part(file_name, '_', 4), '[0-9]+', 0) as int)"))
      .withColumn("pos_idx",
        expr("cast(regexp_extract(split_part(file_name, '_', 5), '[0-9]+', 0) as int)"))
      .withColumn("channel_name", col("channel_idx").cast("string"))

  /** OME-TIFF ingest twin — ometif_splitter.py split_file +
    * json_operations.py get_metadata_from_tags: the four indices and
    * the channel NAME come from each page's embedded
    * MicroManagerMetadata JSON (schema-driven field pull), not from
    * the file name; the frame file name is then GENERATED in the
    * `im_c###_z###_t###_p###` convention (file_splitter.py
    * _get_imname), exactly the reverse of [[parseIndices]].
    * Input: (dataset_serial, metadata_json). Output matches
    * [[parseIndices]]' column set plus the generated file_name, so
    * [[globalMetaFromFrames]] and [[ingest]]'s uniqueness audit are
    * shared verbatim between the filename-parse and metadata ingest
    * paths. All JSON-path extraction is per-row column work — the
    * listing never shuffles.
    */
  def parseMetadata(listing: DataFrame): DataFrame = {
    def fld(k: String) =
      get_json_object(col("metadata_json"), s"$$.MicroManagerMetadata.$k")
    listing
      .withColumn("channel_idx", fld("ChannelIndex").cast("int"))
      .withColumn("slice_idx", fld("Slice").cast("int"))
      .withColumn("time_idx", fld("FrameIndex").cast("int"))
      .withColumn("pos_idx", fld("PositionIndex").cast("int"))
      .withColumn("channel_name", fld("Channel"))
      .withColumn("file_name", concat(
        lit("im_c"), lpad(col("channel_idx").cast("string"), 3, "0"),
        lit("_z"), lpad(col("slice_idx").cast("string"), 3, "0"),
        lit("_t"), lpad(col("time_idx").cast("string"), 3, "0"),
        lit("_p"), lpad(col("pos_idx").cast("string"), 3, "0"),
        lit(".png")))
  }

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
