package graft

/** DuckDB oracle SQL for every [O]-checked query in SURVEY.md §2.
  *
  * The imaging-model derivation (SURVEY.md §3) is inlined as a CTE so
  * the oracle sees the identical imaging-shaped tables that
  * [[graft.imaging.ImagingModel]] builds — the two derivations must
  * stay in lockstep column for column.
  *
  * Conventions for hash-parity with the Spark results:
  *  - timestamps are emitted as formatted strings or epoch bigints,
  *    never raw timestamp values (Spark µs / DuckDB ns differ);
  *  - money math is done in DECIMAL (exact, order-independent) and
  *    only cast to DOUBLE on output;
  *  - counts are CAST to BIGINT (DuckDB sums promote to HUGEINT);
  *  - every ORDER BY is a total order (includes a unique key);
  *  - booleans are emitted as INT flags.
  */
object Oracles {

  /** DuckDB twin of [[graft.imaging.ImagingModel]]. */
  val imagingCte: String = """WITH data_set AS (
  SELECT
    o_orderkey AS id,
    concat('PRJ', CAST(o_custkey % 7 AS VARCHAR), '-',
      lpad(CAST(year(o_orderdate) AS VARCHAR), 4, '0'), '-',
      lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0'), '-',
      lpad(CAST(day(o_orderdate) AS VARCHAR), 2, '0'), '-',
      lpad(CAST(o_orderkey % 24 AS VARCHAR), 2, '0'), '-',
      lpad(CAST(o_custkey % 60 AS VARCHAR), 2, '0'), '-',
      lpad(CAST((o_orderkey * 7) % 60 AS VARCHAR), 2, '0'), '-',
      CAST(o_orderkey AS VARCHAR)) AS dataset_serial,
    o_orderpriority AS description,
    concat('scope-', CAST(o_custkey % 5 AS VARCHAR)) AS microscope,
    (o_orderstatus <> 'O') AS frames,
    make_timestamp(year(o_orderdate), month(o_orderdate), day(o_orderdate),
      o_orderkey % 24, o_custkey % 60,
      CAST((o_orderkey * 7) % 60 AS DOUBLE)) AS date_time,
    CASE WHEN o_orderkey % 32 = 0 AND o_orderkey >= 32
         THEN o_orderkey // 32 ELSE NULL END AS parent_id
  FROM orders
), frames AS (
  SELECT
    l_orderkey * 10 + l_linenumber AS id,
    CAST(l_suppkey % 4 AS INT) AS channel_idx,
    CASE CAST(l_suppkey % 4 AS INT) WHEN 0 THEN 'DAPI' WHEN 1 THEN 'GFP'
         WHEN 2 THEN 'Cy3' ELSE 'TxRed' END AS channel_name,
    CAST(l_partkey % 8 AS INT) AS slice_idx,
    CAST(l_linenumber - 1 AS INT) AS time_idx,
    CAST(l_orderkey % 6 AS INT) AS pos_idx,
    concat('im_c', lpad(CAST(l_suppkey % 4 AS VARCHAR), 3, '0'),
      '_z', lpad(CAST(l_partkey % 8 AS VARCHAR), 3, '0'),
      '_t', lpad(CAST(l_linenumber - 1 AS VARCHAR), 3, '0'),
      '_p', lpad(CAST(l_orderkey % 6 AS VARCHAR), 3, '0'),
      '_', CAST(l_orderkey AS VARCHAR), '_', CAST(l_linenumber AS VARCHAR),
      '.png') AS file_name,
    sha256(concat(CAST(l_partkey AS VARCHAR), '-',
      CAST(l_suppkey AS VARCHAR))) AS sha256,
    l_orderkey AS frames_global_id
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus <> 'O'
), frames_global AS (
  SELECT
    f.frames_global_id AS id,
    CAST(count(*) AS BIGINT) AS nbr_frames,
    2048 AS im_width, 2048 AS im_height,
    CAST(count(DISTINCT f.slice_idx) AS BIGINT) AS nbr_slices,
    CAST(count(DISTINCT f.channel_idx) AS BIGINT) AS nbr_channels,
    1 AS im_colors,
    CAST(count(DISTINCT f.time_idx) AS BIGINT) AS nbr_timepoints,
    CAST(count(DISTINCT f.pos_idx) AS BIGINT) AS nbr_positions,
    'uint16' AS bit_depth,
    concat('raw_frames/', d.dataset_serial) AS storage_dir,
    f.frames_global_id AS dataset_id
  FROM frames f JOIN data_set d ON f.frames_global_id = d.id
  GROUP BY f.frames_global_id, d.dataset_serial
), file_global AS (
  SELECT id, concat('raw_files/', dataset_serial) AS storage_dir,
    concat(dataset_serial, '.tif') AS file_name,
    sha256(dataset_serial) AS sha256, id AS dataset_id
  FROM data_set WHERE NOT frames
)
"""

  val imgDatasetSearch: String = imagingCte + """
SELECT dataset_serial, description, microscope,
  strftime(date_time, '%Y-%m-%d %H:%M:%S') AS date_str,
  CAST(frames AS INT) AS frames_flag
FROM data_set
WHERE dataset_serial LIKE '%PRJ3%'
  AND microscope LIKE '%scope-2%'
  AND date_time >= TIMESTAMP '1994-01-01 00:00:00'
  AND date_time <= TIMESTAMP '1996-12-31 23:59:59'
  AND description LIKE '%URGENT%'
ORDER BY dataset_serial"""

  val imgSerialDatetime: String = imagingCte + """
SELECT dataset_serial, project, parsed_str,
  CAST(parsed_str = strftime(date_time, '%Y-%m-%d %H:%M:%S') AS INT)
    AS consistent
FROM (
  SELECT dataset_serial, date_time,
    split_part(dataset_serial, '-', 1) AS project,
    strftime(make_timestamp(
      CAST(split_part(dataset_serial, '-', 2) AS INT),
      CAST(split_part(dataset_serial, '-', 3) AS INT),
      CAST(split_part(dataset_serial, '-', 4) AS INT),
      CAST(split_part(dataset_serial, '-', 5) AS INT),
      CAST(split_part(dataset_serial, '-', 6) AS INT),
      CAST(split_part(dataset_serial, '-', 7) AS DOUBLE)),
      '%Y-%m-%d %H:%M:%S') AS parsed_str
  FROM data_set)
ORDER BY dataset_serial"""

  val imgFramesSubset: String = imagingCte + """
SELECT d.dataset_serial, f.channel_idx, f.slice_idx, f.time_idx,
  f.pos_idx, f.channel_name, f.file_name, f.sha256
FROM frames f
JOIN data_set d ON f.frames_global_id = d.id
WHERE d.microscope = 'scope-1'
  AND f.channel_name IN ('DAPI', 'Cy3')
  AND f.slice_idx IN (0, 1, 2, 3)
  AND f.time_idx IN (0, 1, 2)
ORDER BY d.dataset_serial, f.file_name"""

  val imgFramesMeta: String = imagingCte + """
SELECT d.dataset_serial, f.file_name, f.channel_idx, f.channel_name,
  f.slice_idx, f.time_idx, f.pos_idx, f.sha256, g.nbr_frames,
  g.im_width, g.im_height, g.nbr_slices, g.nbr_channels, g.im_colors,
  g.nbr_timepoints, g.nbr_positions, g.bit_depth, g.storage_dir
FROM frames f
JOIN data_set d ON f.frames_global_id = d.id
JOIN frames_global g ON f.frames_global_id = g.dataset_id
WHERE d.dataset_serial = (
  SELECT min(d2.dataset_serial) FROM data_set d2
  JOIN frames f2 ON f2.frames_global_id = d2.id)
ORDER BY f.file_name"""

  val imgFilenames: String = imagingCte + """
SELECT dataset_serial, storage_dir, file_name FROM (
  SELECT d.dataset_serial, g.storage_dir, f.file_name
  FROM frames f
  JOIN data_set d ON f.frames_global_id = d.id
  JOIN frames_global g ON f.frames_global_id = g.dataset_id
  WHERE d.dataset_serial LIKE 'PRJ2%'
  UNION ALL
  SELECT d.dataset_serial, fg.storage_dir, fg.file_name
  FROM file_global fg
  JOIN data_set d ON fg.dataset_id = d.id
  WHERE d.dataset_serial LIKE 'PRJ2%')
ORDER BY dataset_serial, storage_dir, file_name"""

  val imgGlobalMeta: String = imagingCte + """
SELECT d.dataset_serial, g.nbr_frames, g.im_width, g.im_height,
  g.nbr_slices, g.nbr_channels, g.im_colors, g.nbr_timepoints,
  g.nbr_positions, g.bit_depth, g.storage_dir
FROM frames_global g JOIN data_set d ON g.dataset_id = d.id
ORDER BY d.dataset_serial"""

  val imgUniqueness: String = imagingCte + """
SELECT project, n_datasets, n_serials,
  n_datasets - n_serials AS dup_serials
FROM (
  SELECT split_part(dataset_serial, '-', 1) AS project,
    CAST(count(*) AS BIGINT) AS n_datasets,
    CAST(count(DISTINCT dataset_serial) AS BIGINT) AS n_serials
  FROM data_set GROUP BY 1)
ORDER BY project"""

  val imgLineage: String = imagingCte + """
SELECT p.dataset_serial AS parent_serial,
  CAST(count(*) AS BIGINT) AS n_children,
  min(c.dataset_serial) AS first_child
FROM data_set c JOIN data_set p ON c.parent_id = p.id
GROUP BY p.dataset_serial
ORDER BY parent_serial"""

  val imgShaDedup: String = imagingCte + """
SELECT sha256, n_frames, n_datasets, first_file FROM (
  SELECT sha256, CAST(count(*) AS BIGINT) AS n_frames,
    CAST(count(DISTINCT frames_global_id) AS BIGINT) AS n_datasets,
    min(file_name) AS first_file
  FROM frames GROUP BY sha256)
WHERE n_frames > 1
ORDER BY n_frames DESC, sha256
LIMIT 200"""

  val imgFrameGaps: String = imagingCte + """
SELECT dataset_serial, nbr_frames, grid_size,
  grid_size - nbr_frames AS missing
FROM (
  SELECT d.dataset_serial, g.nbr_frames,
    g.nbr_slices * g.nbr_channels * g.nbr_timepoints * g.nbr_positions
      AS grid_size
  FROM frames_global g JOIN data_set d ON g.dataset_id = d.id)
WHERE grid_size <> nbr_frames
ORDER BY dataset_serial"""

  val imgParseSmsName: String = imagingCte + """
SELECT file_name, c_parsed, z_parsed, t_parsed, p_parsed,
  CAST(c_parsed = channel_idx AND z_parsed = slice_idx
    AND t_parsed = time_idx AND p_parsed = pos_idx AS INT) AS consistent
FROM (
  SELECT file_name, channel_idx, slice_idx, time_idx, pos_idx,
    CAST(substr(split_part(file_name, '_', 2), 2) AS INT) AS c_parsed,
    CAST(substr(split_part(file_name, '_', 3), 2) AS INT) AS z_parsed,
    CAST(substr(split_part(file_name, '_', 4), 2) AS INT) AS t_parsed,
    CAST(substr(split_part(file_name, '_', 5), 2) AS INT) AS p_parsed
  FROM frames WHERE frames_global_id % 50 = 0)
ORDER BY file_name"""

  val imgStorageReport: String = imagingCte + """
SELECT split_part(d.dataset_serial, '-', 1) AS project,
  CAST(count(*) AS BIGINT) AS n_datasets,
  CAST(sum(g.nbr_frames) AS BIGINT) AS total_frames,
  CAST(sum(g.nbr_frames * 2048 * 2048 * 2) AS BIGINT) AS est_bytes
FROM frames_global g JOIN data_set d ON g.dataset_id = d.id
GROUP BY 1
ORDER BY project"""

  /** Every oracle, keyed like SparkEntry.queries. */
  def all: Map[String, String] = Map(
    "img_dataset_search" -> imgDatasetSearch,
    "img_serial_datetime" -> imgSerialDatetime,
    "img_frames_subset" -> imgFramesSubset,
    "img_frames_meta" -> imgFramesMeta,
    "img_filenames" -> imgFilenames,
    "img_global_meta" -> imgGlobalMeta,
    "img_uniqueness" -> imgUniqueness,
    "img_lineage" -> imgLineage,
    "img_sha_dedup" -> imgShaDedup,
    "img_frame_gaps" -> imgFrameGaps,
    "img_parse_sms_name" -> imgParseSmsName,
    "img_storage_report" -> imgStorageReport,
  )
}
