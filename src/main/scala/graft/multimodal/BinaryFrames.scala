package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.imaging.ImagingModel

/** Multimodal column plumbing (SURVEY.md §2.5): images as opaque
  * `binary` columns with typed metadata, the way the reference ships
  * serialized frames to object storage (image_utils.py serialize_im /
  * deserialize_im) while the DB carries the metadata.
  *
  * The Spark-side plumbing — schema, batched per-partition decode
  * loop, partitioning — is real and tested. The pixel codec itself is
  * STUBBED (no image libraries in this environment): payloads are
  * deterministic bytes derived from each frame's sha256, and
  * `decodeStub` computes byte-level statistics where a real deployment
  * would decode PNG/TIFF. Swap `decodeBytes` for an actual codec and
  * nothing else changes.
  */
object BinaryFrames {

  case class FrameFeature(frame_id: Long, width: Int, height: Int,
    n_bytes: Int, sum_bytes: Long, mean_byte: Double, max_byte: Int)

  /** Frames with a deterministic fake binary payload (64 bytes derived
    * from the sha256 hex — 2 bytes per hex char via unhex+repeat).
    */
  def withPayload(spark: SparkSession, dir: String): DataFrame =
    ImagingModel.frames(spark, dir)
      .select(col("id").as("frame_id"), col("file_name"),
        expr("concat(unhex(sha256), unhex(sha256))").as("payload"),
        struct(lit(2048).as("width"), lit(2048).as("height"),
          lit("uint16").as("bit_depth")).as("meta"))

  /** STUB decode: byte statistics standing in for pixel decode.
    * Replace with a real codec (cv2.imdecode equivalent) off-cluster.
    */
  private def decodeBytes(payload: Array[Byte]): (Long, Int) = {
    // ??? real codec goes here — deterministic byte stats until then
    var sum = 0L
    var max = 0
    var i = 0
    while (i < payload.length) {
      val v = payload(i) & 0xff
      sum += v
      if (v > max) max = v
      i += 1
    }
    (sum, max)
  }

  /** Per-partition batched "decode": the exact shape a mapInPandas /
    * mapPartitions image pipeline has at scale — one codec init per
    * partition, streaming over rows, typed output schema.
    */
  def decodeStub(spark: SparkSession, framed: DataFrame): Dataset[FrameFeature] = {
    import spark.implicits._
    framed.select("frame_id", "payload", "meta.width", "meta.height")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // codec/session init would happen once per partition here
        rows.map { case (id, payload, w, h) =>
          val (sum, max) = decodeBytes(payload)
          val mean = if (payload.length == 0) 0.0
            else sum.toDouble / payload.length
          FrameFeature(id, w, h, payload.length, sum, mean, max)
        }
      }
  }

  /** Per-dataset payload statistics THROUGH the binary decode path —
    * the driver-checked query that proves the multimodal plumbing end
    * to end: real binary payloads flow through the typed mapPartitions
    * decode, and the per-dataset roll-up (frame count, byte volume,
    * exact byte-value sums, max byte) hash-matches a DuckDB oracle
    * that recomputes the same bytes from the sha256 hex with integer
    * arithmetic. Everything aggregated is an exact integer, so the
    * parity is bit-level. frame_id div 10 recovers the dataset key
    * (id = orderkey*10 + linenumber, linenumber ≤ 7 by §3).
    */
  def payloadStats(spark: SparkSession, dir: String): DataFrame = {
    val feats = decodeStub(spark, withPayload(spark, dir)).toDF()
      .withColumn("dataset_id", expr("frame_id div 10"))
    feats
      .join(broadcast(ImagingModel.dataSet(spark, dir)
        .select(col("id").as("ds_id"), col("dataset_serial"))),
        col("dataset_id") === col("ds_id"))
      .groupBy("dataset_serial")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("n_bytes").cast("bigint")).as("total_bytes"),
        sum(col("sum_bytes")).as("sum_byte_values"),
        max(col("max_byte")).as("max_byte"))
      .orderBy("dataset_serial")
  }

  /** Stack reassembly — the download path of the reference
    * (data_storage.py make_stack_from_meta): collect each dataset's
    * frame payloads into one array ordered by (channel, slice, time,
    * position). One shuffle on the dataset key; `sort_array` orders
    * within the group by the struct's leading index fields, so no
    * global sort and no window. At 100 TB each group is one stack
    * (bounded by stack geometry), so collect_list state is bounded.
    */
  def assembleStacks(spark: SparkSession, dir: String): DataFrame =
    assembleStacksOf(
      ImagingModel.frames(spark, dir)
        .select(col("frames_global_id").as("dataset_id"),
          col("channel_idx"), col("slice_idx"), col("time_idx"),
          col("pos_idx"),
          expr("concat(unhex(sha256), unhex(sha256))").as("payload")),
      ImagingModel.framesGlobal(spark, dir)
        .select(col("dataset_id"), col("im_height"), col("im_width"),
          col("im_colors")))

  /** The reassembly core plus the squeeze metadata of
    * data_storage.py:69-86 (`squeeze_stack`): alongside each stack, the
    * "XYGZCTP" dim-order string with singleton dimensions dropped —
    * X/Y/G from the dataset's geometry (im_height, im_width,
    * im_colors), Z/C/T/P from the observed per-dimension cardinalities.
    * A dataset imaged at one z with one channel over time squeezes to
    * "XYTP", etc. Cardinalities use the 64-bit-bitmap exact distinct
    * (grid indices < 64 by the data model, §3) so the group-by stays
    * one codegen'd partial-agg pass — no RewriteDistinctAggregates
    * Expand multiplying the frame rows by four.
    *
    * `framesDf`: (dataset_id, channel_idx, slice_idx, time_idx,
    * pos_idx, payload); `geometry`: per-dataset (dataset_id,
    * im_height, im_width, im_colors).
    */
  def assembleStacksOf(framesDf: DataFrame, geometry: DataFrame): DataFrame = {
    def card(c: String) =
      expr(s"cast(bit_count(bit_or(shiftleft(1L, $c))) as bigint)")
    def dim(letter: String, nonSingleton: org.apache.spark.sql.Column) =
      when(nonSingleton, lit(letter)).otherwise(lit(""))
    framesDf
      .select(col("dataset_id"), col("channel_idx"), col("slice_idx"),
        col("time_idx"), col("pos_idx"),
        struct(col("channel_idx"), col("slice_idx"), col("time_idx"),
          col("pos_idx"), col("payload")).as("fr"))
      .groupBy("dataset_id")
      .agg(sort_array(collect_list(col("fr"))).as("stack"),
        count(lit(1)).as("n_frames"),
        card("slice_idx").as("n_slices"),
        card("channel_idx").as("n_channels"),
        card("time_idx").as("n_times"),
        card("pos_idx").as("n_pos"))
      .join(broadcast(geometry), Seq("dataset_id"), "left")
      .withColumn("dim_order", concat(
        dim("X", coalesce(col("im_height"), lit(1)) > 1),
        dim("Y", coalesce(col("im_width"), lit(1)) > 1),
        dim("G", coalesce(col("im_colors"), lit(1)) > 1),
        dim("Z", col("n_slices") > 1),
        dim("C", col("n_channels") > 1),
        dim("T", col("n_times") > 1),
        dim("P", col("n_pos") > 1)))
      .drop("im_height", "im_width", "im_colors")
  }

  /** STUB resize: the metadata transform is real (scaled dims in the
    * typed meta struct), the pixel resample is stood in by truncating
    * the payload proportionally — swap for a real resampler with the
    * codec. Shape matches a production thumbnail pass: pure per-row
    * column work, no shuffle.
    */
  def resizeStub(framed: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    framed
      .withColumn("payload",
        expr(s"substring(payload, 1, greatest(1, int(length(payload) / ${factor.toLong * factor})))"))
      .withColumn("meta", struct(
        (col("meta.width") / factor).cast("int").as("width"),
        (col("meta.height") / factor).cast("int").as("height"),
        col("meta.bit_depth")))
  }

  /** Deterministic 1-in-`rate` frame sampling by id — the frame-sample
    * operator of a video/stack pipeline (pure filter: no shuffle, full
    * pushdown above the payload fetch).
    */
  def sampleFrames(framed: DataFrame, rate: Int): DataFrame =
    framed.filter(pmod(xxhash64(col("frame_id")), lit(rate)) === 0)
}
