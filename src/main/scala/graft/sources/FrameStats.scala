package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.imaging.ImagingModel
import graft.multimodal.{BinaryFrames, ImageCodec}

/** Persisted decode-once frame statistics — the [[DocumentStore]] /
  * [[VectorIndex]] build/read discipline applied to the imaging-QC
  * family: the reference's QC queries (intensity drift, focus triage,
  * exposure histogram, clipping, z-profile, crosstalk, scene cuts)
  * each re-decoded the WHOLE frame corpus per run — at 100 TB the
  * decode is the dominant cost and it was paid eight times for the
  * same bytes. Here ONE typed mapPartitions pass decodes every
  * frame's gray AND RGB payloads (real PNG round trips — the same
  * payload bytes the inline operators decode, via the shared
  * [[BinaryFrames.rgbSamplesOf]] transform) and persists the
  * sufficient statistics every QC operator needs:
  *
  *  - grid indices (channel/slice/time/pos) for the series queries,
  *  - exact integer gray moments (n, Σpx, Σpx², max),
  *  - the 16-bin intensity histogram (bin width = 1/16 of the frame's
  *    own depth range, the [[BinaryFrames.decodeHist16]] rule),
  *  - exact per-channel RGB sums/maxima and cross-moments.
  *
  * The table is bucketed by the long dataset key, so every per-dataset
  * roll-up (and the per-(dataset, secondary) ones — hash clustering on
  * a subset key satisfies them) reads with ZERO exchanges; the
  * `*_stored` query twins reuse the inline operators' tail code
  * verbatim and hash-match the same DuckDB oracles.
  */
object FrameStats {

  val DefaultBuckets = 32

  /** One frame's persisted sufficient statistics (gray + RGB). */
  case class FrameStatRow(frame_id: Long, dataset_id: Long,
    channel_idx: Int, slice_idx: Int, time_idx: Int, pos_idx: Int,
    n_px: Int, sum_px: Long, sum_sq: Long, max_px: Int,
    bins: Array[Long],
    sum_r: Long, sum_g: Long, sum_b: Long,
    max_r: Int, max_g: Int, max_b: Int,
    sum_rr: Long, sum_gg: Long, sum_bb: Long,
    sum_rg: Long, sum_gb: Long, sum_rb: Long)

  /** Build-once guard, session-scoped like [[DocumentStore]]'s: a
    * stale table from a previous JVM must be rebuilt, never trusted.
    */
  private val built = scala.collection.concurrent.TrieMap.empty[String, Unit]

  def ensureBuilt(spark: SparkSession, dir: String): String = {
    val table = DocumentStore.tableName("graft_framestats", dir)
    built.synchronized {
      if (!built.contains(table)) {
        DocumentStore.clearStale(spark, table)
        write(spark, dir, table)
        built.put(table, ())
      }
    }
    table
  }

  /** The one decode pass: every frame's gray and RGB payloads encoded
    * from the planted sha bytes (generation) and decoded back through
    * the REAL PNG codec (the work this table amortizes), emitting the
    * per-frame sufficient statistics. Same row-spreading repartition
    * rationale as [[BinaryFrames.withPayload]]: metadata rows are
    * byte-small, the codec work is not.
    */
  def decodeOnce(spark: SparkSession, dir: String): DataFrame =
    decodeFrames(spark, ImagingModel.frames(spark, dir)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt))

  /** The decode kernel over any frame-row set (`id`, grid indices,
    * `sha256`) — shared by the batch build above and the streaming
    * decode-on-arrival path ([[graft.streaming.ImgStream.landStats]]),
    * so "one decode per frame, ever" has exactly one implementation.
    */
  def decodeFrames(spark: SparkSession, frames: DataFrame): DataFrame = {
    import spark.implicits._
    frames
      .select(col("id"), col("channel_idx"), col("slice_idx"),
        col("time_idx"), col("pos_idx"), col("sha256"))
      .as[(Long, Int, Int, Int, Int, String)]
      .mapPartitions { rows =>
        // codec/session init would happen once per partition here
        rows.map { case (id, c, z, t, p, sha) =>
          val b = ImageCodec.hexBytes(sha)
          // gray round trip + moments + 16-bin histogram
          val d = ImageCodec.decodeImage(
            ImageCodec.encodeGray8(b ++ b, 8, 8))
          val px = d.samples
          val shift = d.bitDepth - 4
          val bins = new Array[Long](16)
          var sum = 0L; var sumSq = 0L; var max = 0
          var i = 0
          while (i < px.length) {
            sum += px(i)
            sumSq += px(i).toLong * px(i)
            if (px(i) > max) max = px(i)
            bins(px(i) >> shift) += 1L
            i += 1
          }
          // RGB round trip + per-channel sums/maxima + cross-moments
          val (_, _, s) = ImageCodec.decodeRgb(
            ImageCodec.encodeRgb8(BinaryFrames.rgbSamplesOf(sha), 8, 8))
          val sums = new Array[Long](3)
          val maxs = new Array[Int](3)
          var rr, gg, bb, rg, gb, rb = 0L
          i = 0
          while (i < s.length) {
            val ch = i % 3
            sums(ch) += s(i)
            if (s(i) > maxs(ch)) maxs(ch) = s(i)
            if (ch == 2) {
              val r = s(i - 2).toLong; val g = s(i - 1).toLong
              val bl = s(i).toLong
              rr += r * r; gg += g * g; bb += bl * bl
              rg += r * g; gb += g * bl; rb += r * bl
            }
            i += 1
          }
          FrameStatRow(id, id / 10, c, z, t, p,
            px.length, sum, sumSq, max, bins,
            sums(0), sums(1), sums(2), maxs(0), maxs(1), maxs(2),
            rr, gg, bb, rg, gb, rb)
        }
      }
      .toDF()
  }

  def write(spark: SparkSession, dir: String, table: String,
      nBuckets: Int = DefaultBuckets): Unit =
    decodeOnce(spark, dir)
      .write.bucketBy(nBuckets, "dataset_id").sortBy("dataset_id")
      .mode("overwrite").saveAsTable(table)

  /** O(batch) incremental append — the [[DocumentStore.append]]
    * discipline for the stats table: a new acquisition's frames decode
    * ONCE (only the batch pays codec work, the table is never
    * rescanned) and land as additional bucket files under the same
    * spec, so every zero-exchange roll-up property survives the
    * append unchanged (Spark enforces the matching bucket layout).
    * Stats rows are deterministic per frame, so re-appending a frame
    * is the caller's idempotency bug to avoid — use
    * [[graft.streaming.ImgStream.ingestStats]] when replay safety
    * must come from the pipeline.
    */
  def append(spark: SparkSession, table: String, newFrames: DataFrame,
      nBuckets: Int = DefaultBuckets): Unit =
    decodeFrames(spark, newFrames.repartition(
        spark.conf.get("spark.sql.shuffle.partitions").toInt))
      .write.bucketBy(nBuckets, "dataset_id").sortBy("dataset_id")
      .mode("append").saveAsTable(table)

  /** Bucket-granular duplicate settlement — the [[append]]
    * discipline's repair path when an acquisition IS re-appended
    * (crash between decode and the caller's ledger, a re-run
    * splitter): stats rows are deterministic per frame, so a
    * re-append lands bit-identical rows and the fix is
    * [[DocumentStore.vacuumKeyed]]'s census-guided rewrite — only
    * buckets whose row count disagrees with the distinct-frame census
    * are rebuilt, the rest of the table is untouched.
    */
  def vacuum(spark: SparkSession, table: String,
      nBuckets: Int = DefaultBuckets): Unit = {
    val bucketOf = pmod(hash(col("dataset_id")), lit(nBuckets))
    val expected = spark.table(table).dropDuplicates("frame_id")
      .groupBy(bucketOf.as("b")).agg(count(lit(1)).as("census_n"))
    DocumentStore.vacuumKeyed(spark, table, "dataset_id", expected,
      nBuckets)
    ()
  }

  /** Dataset takedown for the stats table — the EASY case of the
    * [[DocumentStore.deleteByIdKeyed]] family: dataset_id IS the
    * bucket key, so the locate step is the victims' own hash (no
    * column-pruned projection scan needed) and the rewrite touches
    * only the victims' buckets; untouched buckets' files are never
    * opened. Stats rows are derived data, but a takedown must remove
    * them too: the sufficient statistics reconstruct per-frame
    * exposure/mean/histogram facts about the deleted dataset, which
    * is exactly what a right-to-be-forgotten pass forgets. Idempotent.
    */
  def deleteDatasets(spark: SparkSession, table: String, ids: DataFrame,
      nBuckets: Int = DefaultBuckets): DocumentStore.DeleteStats =
    DocumentStore.deleteByIdKeyed(spark, table, "dataset_id",
      "dataset_id", ids.select("dataset_id"), nBuckets)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  def statsFor(spark: SparkSession, dir: String): DataFrame =
    read(spark, ensureBuilt(spark, dir))

  // ---- stored query twins --------------------------------------------
  //
  // Each reuses the inline operator's tail verbatim over the persisted
  // stats (column pruning trims the wide row to what the tail reads),
  // so results — and oracle SQL — are identical by construction; what
  // changes is the cost: no decode, and the dataset-key aggregate
  // rides the bucket layout with zero exchange.

  def payloadStatsStored(spark: SparkSession, dir: String): DataFrame =
    BinaryFrames.payloadStatsTail(spark, dir, statsFor(spark, dir))

  def intensityDriftStored(spark: SparkSession, dir: String): DataFrame =
    BinaryFrames.intensityDriftTail(spark, dir, statsFor(spark, dir))

  def focusRankStored(spark: SparkSession, dir: String): DataFrame =
    BinaryFrames.focusRankTail(spark, dir, statsFor(spark, dir))

  def pixelHistogramStored(spark: SparkSession, dir: String): DataFrame =
    BinaryFrames.pixelHistogramTail(spark, dir, statsFor(spark, dir))

  def saturationQcStored(spark: SparkSession, dir: String): DataFrame =
    BinaryFrames.saturationQcTail(spark, dir, statsFor(spark, dir))

  def zProfileStored(spark: SparkSession, dir: String): DataFrame =
    BinaryFrames.zProfileTail(spark, dir, statsFor(spark, dir))

  def payloadStatsRgbStored(spark: SparkSession, dir: String): DataFrame =
    BinaryFrames.payloadStatsRgbTail(spark, dir, statsFor(spark, dir))

  def channelCrosstalkStored(spark: SparkSession, dir: String): DataFrame =
    BinaryFrames.channelCrosstalkTail(spark, dir, statsFor(spark, dir))

  def keyframesStored(spark: SparkSession, dir: String): DataFrame =
    BinaryFrames.keyframesTail(spark, dir, statsFor(spark, dir)
      .select(col("frame_id"), col("dataset_id"),
        col("channel_idx").as("c"), col("slice_idx").as("z"),
        col("time_idx").as("t"), col("pos_idx").as("p"),
        col("n_px"), col("sum_px"), col("sum_sq")))

  def sceneCutsStored(spark: SparkSession, dir: String): DataFrame =
    BinaryFrames.sceneCutsTail(spark, dir, statsFor(spark, dir)
      .select(col("frame_id"), col("dataset_id"),
        col("channel_idx").as("c"), col("slice_idx").as("z"),
        col("time_idx").as("t"), col("pos_idx").as("p"),
        // n_px is 64 (a power of two), so the mean is EXACT in double
        // — bit-identical to the inline decode's sum/length
        (col("sum_px").cast("double") / col("n_px")).as("mean_px")))

  /** The per-dataset composite QC report — the one-table acquisition
    * summary a facility reads per dataset, and the clearest payoff of
    * the decode-once table: FIVE exposure metrics (mean, pixel
    * variance, clipping at both ends, 16-bin histogram entropy) from
    * ONE stored read, where the inline QC family pays one full-corpus
    * decode PER metric. All moments are exact integers off the store;
    * each metric divides once at the edge in IEEE double
    * (engine-identical), and the entropy terms are DECIMAL-cast per
    * bin so the 16-term fold is order-independent — the
    * token-entropy discipline on the pixel side.
    *
    * Scale shape: the one aggregate rides the dataset_id bucket
    * layout (zero hash exchange); the serial dimension broadcasts
    * onto the ≤|datasets| census after the roll-up.
    */
  def datasetQcSummary(spark: SparkSession, dir: String): DataFrame = {
    val binSums = (0 until 16).map(i =>
      sum(element_at(col("bins"), i + 1)).as(s"b$i"))
    val aggCols = Seq(
      count(lit(1)).as("n_frames"),
      sum(col("n_px").cast("bigint")).as("tot"),
      sum(col("sum_px")).as("s"),
      sum(col("sum_sq")).as("ss")) ++ binSums
    val ds = statsFor(spark, dir)
      .groupBy("dataset_id")
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("binsv",
        array((0 until 16).map(i => col(s"b$i")): _*))
    val meanD = col("s").cast("double") / col("tot")
    ds
      .withColumn("esum", expr(
        """aggregate(filter(binsv, x -> x > 0L),
             cast(0 as decimal(30,10)),
             (acc, x) -> cast(acc + cast(
               (cast(x as double) / tot) * ln(cast(x as double) / tot)
               as decimal(30,10)) as decimal(30,10)))"""))
      .join(broadcast(ImagingModel.dataSet(spark, dir)
        .select(col("id").as("ds_id"), col("dataset_serial"))),
        col("dataset_id") === col("ds_id"))
      .select(col("dataset_serial"),
        col("n_frames"),
        col("tot").as("total_px"),
        round(meanD, 6).as("mean_px"),
        round(col("ss").cast("double") / col("tot") - meanD * meanD, 6)
          .as("var_px"),
        round(element_at(col("binsv"), 16).cast("double") / col("tot"), 6)
          .as("sat_pct"),
        round(element_at(col("binsv"), 1).cast("double") / col("tot"), 6)
          .as("dark_pct"),
        round((-col("esum")).cast("double"), 6).as("entropy_nats"))
      .orderBy("dataset_serial")
  }
}
