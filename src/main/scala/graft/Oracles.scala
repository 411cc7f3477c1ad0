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
    concat('{"MicroManagerMetadata":{"ChannelIndex":',
      CASE WHEN (l_orderkey * 10 + l_linenumber) % 13 = 0
           THEN concat('"', CAST(l_suppkey % 4 AS VARCHAR), '"')
           ELSE CAST(l_suppkey % 4 AS VARCHAR) END,
      CASE WHEN (l_orderkey * 10 + l_linenumber) % 7 = 0 THEN ''
           ELSE concat(',"Slice":', CAST(l_partkey % 8 AS VARCHAR)) END,
      ',"FrameIndex":', CAST(l_linenumber - 1 AS VARCHAR),
      ',"PositionIndex":', CAST(l_orderkey % 6 AS VARCHAR),
      ',"Channel":',
      CASE WHEN (l_orderkey * 10 + l_linenumber) % 11 = 0
           THEN CAST(l_suppkey % 4 AS VARCHAR)
           ELSE concat('"',
             CASE CAST(l_suppkey % 4 AS INT) WHEN 0 THEN 'DAPI'
                  WHEN 1 THEN 'GFP' WHEN 2 THEN 'Cy3' ELSE 'TxRed' END,
             '"') END,
      ',"Exposure-ms":',
      CAST((l_orderkey * 10 + l_linenumber) % 90 + 10 AS VARCHAR),
      '}}') AS metadata_json,
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
    concat('{"protein_name":"',
      list_extract(['TOPOR','LMNB1','SEC61B','TOMM20','ACTB','TUBA1B',
        'CANX','FBL','GAPDH','HIST1H2BJ','MYH10','VIM'],
        CAST(f.frames_global_id % 12 AS INT) + 1),
      '","well":"',
      substring('ABCDEFGH', CAST(f.frames_global_id % 8 AS INT) + 1, 1),
      CAST(f.frames_global_id % 12 + 1 AS VARCHAR),
      '"}') AS metadata_json,
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
  AND date_time >= TIMESTAMP '1997-01-01 00:00:00'
  AND date_time <= TIMESTAMP '1998-12-31 23:59:59'
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
ORDER BY d.dataset_serial, f.file_name, f.sha256"""

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
ORDER BY f.file_name, f.sha256"""

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

  /** Twin of [[graft.ops.ImagingOps.metaSearch]] — the notebook's
    * JSONB containment query (jsonb_queries.ipynb cell 4).
    */
  val imgMetaSearch: String = imagingCte + """
SELECT d.dataset_serial,
  json_extract_string(g.metadata_json, '$.protein_name') AS protein_name,
  g.nbr_frames
FROM frames_global g JOIN data_set d ON g.dataset_id = d.id
WHERE json_extract_string(g.metadata_json, '$.protein_name') = 'TOPOR'
ORDER BY d.dataset_serial"""

  /** Twin of [[graft.ops.ImagingOps.metaValues]] — the notebook's
    * distinct-JSONB-values listing (jsonb_queries.ipynb cell 6).
    */
  val imgMetaValues: String = imagingCte + """
SELECT DISTINCT json_extract_string(metadata_json, '$.protein_name')
  AS protein_name
FROM frames_global
ORDER BY protein_name"""

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

  private val rev =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  val q1Pricing: String = s"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
    AS sum_base_price,
  CAST(SUM($rev) AS DOUBLE) AS sum_disc_price,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""

  val q3Topk: String = s"""
SELECT o_orderkey, CAST(SUM($rev) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10"""

  val qCorr: String = """
WITH mom AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
    sum(CAST(l_quantity AS DECIMAL(38,6))) AS sx,
    sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS sy,
    sum(CAST(l_quantity AS DECIMAL(38,6))
      * CAST(l_extendedprice AS DECIMAL(38,6))) AS sxy,
    sum(CAST(l_quantity AS DECIMAL(38,6))
      * CAST(l_quantity AS DECIMAL(38,6))) AS sxx,
    sum(CAST(l_extendedprice AS DECIMAL(38,6))
      * CAST(l_extendedprice AS DECIMAL(38,6))) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  CAST(round(
    (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (sqrt(n * CAST(sxx AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      * sqrt(n * CAST(syy AS DOUBLE)
        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS DOUBLE)
    AS corr_qty_price
FROM mom
ORDER BY l_returnflag"""

  val winMovingRange: String = """
WITH daily AS (
  SELECT l_suppkey,
    date_diff('day', DATE '1970-01-01', l_shipdate) AS ship_day,
    sum(CAST(l_quantity AS DECIMAL(18,2))) AS day_qty
  FROM lineitem WHERE l_suppkey < 20
  GROUP BY l_suppkey, ship_day
)
SELECT l_suppkey, ship_day, CAST(day_qty AS DOUBLE) AS day_qty,
  CAST(sum(day_qty) OVER (
    PARTITION BY l_suppkey ORDER BY ship_day
    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mv7_qty
FROM daily
ORDER BY l_suppkey, ship_day"""

  val q10Returns: String = s"""
SELECT c_custkey, c_name, n_name, CAST(SUM($rev) AS DOUBLE) AS revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20"""

  val q5RegionJoin: String = s"""
SELECT n_name, CAST(SUM($rev) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY n_name"""

  val winRunning: String = """
SELECT l_suppkey, l_orderkey, l_linenumber,
  strftime(l_shipdate, '%Y-%m-%d') AS ship_str,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_qty,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    AS BIGINT) AS rn
FROM lineitem WHERE l_suppkey < 10
ORDER BY l_suppkey, rn"""

  val eventsWindow: String = """
SELECT (epoch_ns(ts) // 300000000000) * 300 AS win_start_epoch,
  event_type, CAST(count(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY win_start_epoch, event_type"""

  /** Sliding-window twin of [[graft.ops.EventOps.eventsSliding]]:
    * each event lands in its two covering 10-minute windows (starts =
    * floor-to-5-min and that minus 5 min), cents fixed-pointed with
    * the engine-identical floor(value·100 + 0.5).
    */
  val eventsSliding: String = """
WITH e AS (
  SELECT event_type,
    (epoch_ns(ts) // 300000000000) * 300000000000 AS base,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT event_type, cents, base - s.s AS ws
  FROM e, unnest([0::BIGINT, 300000000000::BIGINT]) AS s(s)
)
SELECT ws // 1000000000 AS win_start_epoch, event_type,
  CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
FROM w
GROUP BY 1, 2
ORDER BY win_start_epoch, event_type"""

  val eventsSessions: String = """
WITH e AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           IS NULL
         OR epoch_ns(ts) - epoch_ns(lag(ts) OVER (
              PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT user_id, ts, event_id,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM e
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
  CAST(count(*) AS BIGINT) AS n_events,
  epoch_ns(min(ts)) // 1000000000 AS start_epoch
FROM s GROUP BY user_id, session_idx
ORDER BY user_id, session_idx"""

  val docExactDedup: String = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
)
SELECT h, n, keeper FROM (
  SELECT md5(lower(trim(text))) AS h, CAST(count(*) AS BIGINT) AS n,
    min(doc_id) AS keeper
  FROM corpus GROUP BY 1)
WHERE n > 1
ORDER BY h"""

  /** Passage-dedup twin of [[graft.ops.DedupOps.chunkDedup]]: same
    * planted corpus, same tumbling 20-word chunks (DuckDB's 1-based
    * clamping list slice mirrors Spark's `slice(toks, start, 20)`),
    * same md5 digests, total-order LIMIT.
    */
  val docChunkDedup: String = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
toks AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM corpus),
chunks AS (
  SELECT doc_id,
    md5(array_to_string(ws[(20 * i + 1):(20 * i + 20)], ' ')) AS h
  FROM toks,
    unnest(range(0, CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS t(i))
SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_occ
FROM chunks
GROUP BY h
HAVING count(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occ DESC, h
LIMIT 200"""

  /** Bloom-probe twin of [[graft.ops.DedupOps.bloomDedup]]: identical
    * 28-bit md5 bases, identical affine position family folded into
    * m = 1024 bits, identical all-positions-set flag rule and exact
    * true-membership audit — the filter is pure integer arithmetic on
    * both engines, which is what makes a Bloom filter hash-checkable
    * here when a library one never is.
    */
  val docBloomDedup: String = """
WITH hist AS (
  SELECT md5(lower(trim(text))) AS dg FROM documents WHERE doc_id < 250),
histd AS (SELECT DISTINCT dg FROM hist),
bits AS (
  SELECT DISTINCT
    ((((1000003 * j.j + 12345) % 2147483647)
        * ('0x' || substr(dg, 1, 7))::BIGINT
      + ((998244353 * (j.j + 1) + 7) % 2147483647))
     % 2147483647) % 1024 AS pos
  FROM hist, (SELECT unnest(range(4)) AS j) j),
incoming AS (
  SELECT doc_id, source, md5(lower(trim(text))) AS dg
  FROM documents WHERE doc_id >= 250
  UNION ALL
  SELECT doc_id + 2000000, source, md5(lower(trim(text)))
  FROM documents WHERE doc_id < 250 AND doc_id % 10 = 0),
ipos AS (
  SELECT doc_id, source, dg,
    ((((1000003 * j.j + 12345) % 2147483647)
        * ('0x' || substr(dg, 1, 7))::BIGINT
      + ((998244353 * (j.j + 1) + 7) % 2147483647))
     % 2147483647) % 1024 AS pos
  FROM incoming, (SELECT unnest(range(4)) AS j) j),
probe AS (
  SELECT i.doc_id, i.source, i.dg,
    min(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS all_set
  FROM ipos i LEFT JOIN bits b ON i.pos = b.pos
  GROUP BY i.doc_id, i.source, i.dg)
SELECT source, CAST(count(*) AS BIGINT) AS n_probed,
  CAST(sum(all_set) AS BIGINT) AS n_flagged,
  CAST(sum(CASE WHEN h.dg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_true_dup,
  CAST(sum(CASE WHEN all_set = 1 AND h.dg IS NULL THEN 1 ELSE 0 END)
    AS BIGINT) AS n_false_pos
FROM probe p LEFT JOIN histd h ON p.dg = h.dg
GROUP BY source
ORDER BY source"""

  /** Duplicated-span twin of [[graft.ops.DedupOps.spanDedup]]: the
    * same positional 10-word windows (1-based list slices here vs
    * 0-based posexplode there — the difference cancels in every gap
    * and span expression), the same ≥2-occurrences duplication rule,
    * and the same lag/running-sum island merge.
    */
  val docSpanDedup: String = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
toks AS (
  SELECT doc_id,
    list_filter(string_split(lower(text), ' '), t -> t <> '') AS ws
  FROM corpus),
pos AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, ws, t.i AS i
  FROM toks, unnest(range(1, len(ws) - 8)) AS t(i)),
dig AS (
  SELECT doc_id, n_words, i,
    substr(md5(array_to_string(ws[i:i+9], ' ')), 1, 16) AS dg
  FROM pos),
occ AS (SELECT dg FROM dig GROUP BY dg HAVING count(*) >= 2),
dup AS (
  SELECT d.doc_id, d.n_words, d.i
  FROM dig d JOIN occ USING (dg)),
brk AS (
  SELECT doc_id, n_words, i,
    CASE WHEN lag(i) OVER w IS NULL
           OR i - lag(i) OVER w > 10 THEN 1 ELSE 0 END AS b
  FROM dup
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
runs AS (
  SELECT doc_id, n_words, i,
    sum(b) OVER (PARTITION BY doc_id ORDER BY i
      ROWS UNBOUNDED PRECEDING) AS run
  FROM brk),
spans AS (
  SELECT doc_id, n_words, run, max(i) - min(i) + 10 AS span_words
  FROM runs GROUP BY doc_id, n_words, run)
SELECT doc_id, n_words, CAST(count(*) AS BIGINT) AS n_spans,
  CAST(max(span_words) AS BIGINT) AS longest_span,
  CAST(sum(span_words) AS BIGINT) AS dup_words
FROM spans
GROUP BY doc_id, n_words
ORDER BY dup_words DESC, doc_id
LIMIT 100"""

  /** Winnowing twin of [[graft.ops.TextOps.winnow]]: same 28-bit md5
    * 4-gram hashes, same 4-hash windows, same rightmost-min selection
    * (row_number ordered (h, p DESC) mirrors Spark's min on
    * struct(h, −p)). Spark's 0-based posexplode positions map to the
    * 1-based slice starts here as p = i − 1, which cancels in every
    * window-membership bound.
    */
  /** The winnowing selection chain from a `(doc_id, text)` relation
    * to a `fps` CTE member — shared by the density census and the
    * cross-doc overlap, like [[minhashChain]].
    */
  private def winnowChain(corpusRel: String): String = s"""toks AS (
  SELECT doc_id,
    list_filter(string_split(lower(text), ' '), t -> t <> '') AS ws
  FROM $corpusRel),
grams AS (
  SELECT doc_id, CAST(len(ws) - 3 AS BIGINT) AS m, t.i - 1 AS p,
    ('0x' || substr(md5(array_to_string(ws[t.i:t.i+3], ' ')), 1, 7))::BIGINT
      AS h
  FROM toks, unnest(range(1, len(ws) - 2)) AS t(i)
  WHERE len(ws) - 3 >= 4),
wins AS (
  SELECT doc_id, m, p, h, s.s AS s
  FROM grams, unnest(range(greatest(p - 3, 0), least(p, m - 4) + 1))
    AS s(s)),
sel AS (
  SELECT doc_id, m, p, h FROM (
    SELECT doc_id, m, p, h,
      row_number() OVER (PARTITION BY doc_id, s ORDER BY h, p DESC) AS rk
    FROM wins)
  WHERE rk = 1),
fps AS (SELECT DISTINCT doc_id, m, p, h FROM sel)
"""

  val docWinnow: String = "WITH " + winnowChain("documents") + """
SELECT doc_id, m AS n_hashes, CAST(count(*) AS BIGINT) AS n_fps
FROM fps
GROUP BY doc_id, m
ORDER BY n_fps DESC, doc_id
LIMIT 100"""

  /** Overlap twin of [[graft.ops.TextOps.winnowOverlap]]: same
    * selection chain over the planted corpus, same 2..1000 bucket cap
    * on the per-hash doc count, same shared-count ranking.
    */
  val docWinnowOverlap: String = """
WITH wcorpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
""" + winnowChain("wcorpus") + """,
fpv AS (SELECT DISTINCT doc_id, h FROM fps),
bsz AS (SELECT h, count(*) AS n FROM fpv GROUP BY h),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2,
    CAST(count(*) AS BIGINT) AS n_shared
  FROM fpv a
  JOIN fpv b ON a.h = b.h AND a.doc_id < b.doc_id
  JOIN bsz ON bsz.h = a.h
  WHERE bsz.n BETWEEN 2 AND 1000
  GROUP BY a.doc_id, b.doc_id),
cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf FROM fpv
  GROUP BY doc_id)
SELECT doc1, doc2, n_shared, c1.nf AS n1, c2.nf AS n2
FROM pairs
JOIN cnt c1 ON doc1 = c1.doc_id
JOIN cnt c2 ON doc2 = c2.doc_id
ORDER BY n_shared DESC, doc1, doc2
LIMIT 50"""

  /** Shard-census twin of [[graft.ops.TextOps.shardStats]]: identical
    * md5-prefix bucket arithmetic (the docHashSample convention).
    */
  val docShardStats: String = """
SELECT
  ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
    % 64 AS shard,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
  CAST(sum(n_chars) AS BIGINT) AS n_bytes,
  CAST(max(len(string_split(trim(text), ' '))) AS BIGINT)
    AS max_doc_tokens
FROM documents
GROUP BY shard
ORDER BY shard"""

  /** Packing-layout twin of [[graft.ops.TextOps.packStats]]: the same
    * md5 stream order per shard, ROWS cumulative window (Spark's
    * default RANGE frame equals ROWS here — the (ord, doc_id) order
    * is tie-free), integer `//` bin arithmetic.
    */
  val docPackStats: String = """
WITH base AS (
  SELECT doc_id,
    ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
      % 64 AS shard,
    md5('ord:' || CAST(doc_id AS VARCHAR)) AS ord,
    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS toks
  FROM documents),
packed AS (
  SELECT shard, toks,
    sum(toks) OVER (PARTITION BY shard ORDER BY ord, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM base)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT (cum - toks) // 512) AS BIGINT) AS n_bins,
  CAST(sum(toks) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN (cum - 1) // 512 > (cum - toks) // 512
           THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
  round(sum(toks) * 100.0
    / (count(DISTINCT (cum - toks) // 512) * 512), 2) AS fill_pct
FROM packed
GROUP BY shard
ORDER BY shard"""

  val docTextStats: String = """
SELECT source, n_docs, sum_tokens, sum_the, sum_chars,
  CAST(round(CAST(sum_tokens AS DOUBLE) / n_docs, 4) AS DOUBLE)
    AS avg_tokens
FROM (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
      END) AS BIGINT) AS sum_tokens,
    CAST(SUM((length(text) - length(replace(text, 'the', ''))) // 3)
      AS BIGINT) AS sum_the,
    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY source)
ORDER BY source"""

  val docFingerprint: String = """
SELECT doc_id,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(string_split(text, ''),
      c -> CAST(ascii(c) AS BIGINT))),
    (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
FROM documents
ORDER BY doc_id"""

  val embNormStats: String = """
SELECT label, CAST(count(*) AS BIGINT) AS n,
  CAST(round(SUM(sqrt(list_sum(list_transform(embedding,
    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) / count(*), 6)
    AS DOUBLE) AS avg_norm,
  CAST(round(SUM(list_sum(list_transform(embedding,
    x -> CAST(x AS DOUBLE)))) / count(*), 6) AS DOUBLE) AS avg_sum
FROM embeddings GROUP BY label ORDER BY label"""

  val docVecIntegrity: String = """
SELECT CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL
            THEN 'matched'
            WHEN e.vec_id IS NULL THEN 'doc_only'
            ELSE 'vec_only' END AS status,
       COALESCE(d.source, '(none)') AS source,
       CAST(count(*) AS BIGINT) AS n
FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY 1, 2 ORDER BY status, source"""

  val imgValidateId: String = imagingCte + """
SELECT project, n_valid, n_invalid FROM (
  SELECT split_part(dataset_serial, '-', 1) AS project,
    CAST(SUM(v) AS BIGINT) AS n_valid,
    CAST(SUM(1 - v) AS BIGINT) AS n_invalid
  FROM (
    SELECT dataset_serial,
      CAST(len(string_split(dataset_serial, '-')) = 8
        AND length(split_part(dataset_serial, '-', 2)) = 4
        AND length(split_part(dataset_serial, '-', 3)) = 2
        AND length(split_part(dataset_serial, '-', 4)) = 2
        AND length(split_part(dataset_serial, '-', 5)) = 2
        AND length(split_part(dataset_serial, '-', 6)) = 2
        AND length(split_part(dataset_serial, '-', 7)) = 2
        AND length(split_part(dataset_serial, '-', 8)) = 4 AS INT) AS v
    FROM data_set)
  GROUP BY 1)
ORDER BY project"""

  val imgStackPositions: String = imagingCte + """
SELECT d.dataset_serial, f.file_name, f.sha256,
  CAST(dense_rank() OVER (PARTITION BY d.dataset_serial
    ORDER BY f.slice_idx) - 1 AS INT) AS z_pos,
  CAST(dense_rank() OVER (PARTITION BY d.dataset_serial
    ORDER BY f.channel_idx) - 1 AS INT) AS c_pos,
  CAST(dense_rank() OVER (PARTITION BY d.dataset_serial
    ORDER BY f.time_idx) - 1 AS INT) AS t_pos,
  CAST(dense_rank() OVER (PARTITION BY d.dataset_serial
    ORDER BY f.pos_idx) - 1 AS INT) AS p_pos
FROM frames f JOIN data_set d ON f.frames_global_id = d.id
WHERE d.microscope = 'scope-3'
ORDER BY d.dataset_serial, f.file_name, f.sha256"""

  val imgParseMlName: String = """
SELECT plate_id, CAST(count(*) AS BIGINT) AS n_files,
  CAST(count(DISTINCT protein_name) AS BIGINT) AS n_proteins,
  min(stack_nbr) AS min_stack
FROM (
  SELECT split_part(file_name, '_', 1) AS plate_id,
    CAST(split_part(file_name, '_', 2) AS BIGINT) AS stack_nbr,
    split_part(file_name, '_', 3) AS protein_name
  FROM (
    SELECT concat_ws('_', replace(p_brand, ' ', ''),
      CAST(p_partkey AS VARCHAR), replace(p_type, ' ', '-'),
      'PyProcessed.tif') AS file_name
    FROM part))
GROUP BY plate_id
ORDER BY plate_id"""

  val eventsPropsJson: String = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
  CAST(SUM(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
FROM (
  SELECT event_type,
    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
GROUP BY event_type
ORDER BY event_type"""

  /** Twin of [[graft.ops.TextOps.fertility]]: identical regex runs
    * and integer ⌈len/4⌉ piece fold per doc, census roll-up, one
    * double division per ratio at the edge.
    */
  val docFertility: String = """
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(ws) AS BIGINT) AS ws_tokens,
  CAST(sum(sub) AS BIGINT) AS subword_tokens,
  CAST(sum(nb) AS BIGINT) AS n_bytes,
  round(CAST(sum(sub) AS DOUBLE) / sum(ws), 4) AS fertility,
  round(CAST(sum(nb) AS DOUBLE) / sum(sub), 4) AS bytes_per_subword
FROM (
  SELECT source, lang,
    len(list_filter(string_split(text, ' '), t -> t <> '')) AS ws,
    coalesce(list_sum(list_transform(
      regexp_extract_all(lower(text), '[a-z]+'),
      w -> (len(w) + 3) // 4)), 0)
      + len(regexp_extract_all(text, '[0-9]+')) AS sub,
    strlen(text) AS nb
  FROM documents)
GROUP BY source, lang
ORDER BY source, lang"""

  val docTokenRegex: String = """
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+'))) AS BIGINT)
    AS sum_alpha,
  CAST(SUM(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT)
    AS sum_digit
FROM documents
GROUP BY source, lang
ORDER BY source, lang"""

  val q6Forecast: String = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24"""

  /** Built from the same marker table as TextOps.langId so the two
    * engines score identically (replace-arithmetic occurrence counts,
    * argmax via struct comparison with lexicographic tie-break).
    */
  val docLangId: String = {
    val structs = graft.ops.TextOps.langMarkers.map { case (lang, words) =>
      val terms = words.map(w =>
        s"(length(padded) - length(replace(padded, '$w', ''))) / ${w.length}")
        .mkString(" + ")
      s"{'score': CAST($terms AS BIGINT), 'lang': '$lang'}"
    }.mkString(",\n      ")
    s"""
SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT lang, list_max([
      $structs]).lang AS predicted
  FROM (SELECT lang, concat(' ', lower(text), ' ') AS padded
        FROM documents))
GROUP BY lang, predicted
ORDER BY lang, predicted"""
  }

  val eventsAsof: String = """
WITH signups AS (
  SELECT DISTINCT user_id AS s_user, ts AS signup_ts
  FROM events WHERE event_type = 'signup')
SELECT e.event_id, e.user_id,
  epoch_ns(e.ts) // 1000000000 AS event_epoch,
  epoch_ns(s.signup_ts) // 1000000000 AS signup_epoch,
  (epoch_ns(e.ts) - epoch_ns(s.signup_ts)) // 1000000000 AS lag_sec
FROM events e
ASOF JOIN signups s ON e.user_id = s.s_user AND e.ts >= s.signup_ts
ORDER BY e.event_id"""

  /** Shared corpus CTE for dedup oracles (documents + planted dups). */
  private val plantedCorpusSql = """SELECT doc_id, text, source, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, source, lang FROM documents
  WHERE doc_id % 5 = 0"""

  private def corpusCteOf(corpusSql: String) = s"""WITH corpus AS (
  $corpusSql
), sh AS (
  SELECT doc_id, source, lang,
    CAST(floor(length(text) / 64.0) AS INT) AS lenband,
    list_distinct(CASE WHEN len(toks) >= 3 THEN
      list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      ELSE [text] END) AS shset
  FROM (
    SELECT doc_id, text, source, lang,
      list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM corpus)
)
"""

  private val corpusCte = corpusCteOf(plantedCorpusSql)

  /** Twin of [[graft.ops.TextOps.qualityVsDup]]: same keep rule over
    * the planted-dup corpus, (digest, source, keep) census joined to
    * the per-digest totals, per-(source, kept) dup share.
    */
  val docQualityVsDup: String = s"""
WITH corpus AS (
  SELECT doc_id, text, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, source, n_chars FROM documents
  WHERE doc_id % 5 = 0),
flagged AS (
  SELECT source,
    CASE WHEN n_chars >= 100
      AND len(list_filter(string_split(lower(text), ' '),
        x -> x <> '')) >= 20
      AND NOT (2 * len(list_filter(string_split(lower(text), ' '),
        x -> x = 'the' OR x = 'a'))
        > len(list_filter(string_split(lower(text), ' '),
          x -> x <> ''))) THEN 1 ELSE 0 END AS keep,
    md5(lower(trim(text))) AS h
  FROM corpus),
lvl1 AS (
  SELECT h, source, keep, count(*) AS nl FROM flagged GROUP BY 1, 2, 3),
tot AS (SELECT h, sum(nl) AS nt FROM lvl1 GROUP BY h)
SELECT l.source, CAST(l.keep AS BIGINT) AS kept,
  CAST(sum(nl) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN nt > 1 THEN nl ELSE 0 END) AS BIGINT) AS n_dup,
  round(sum(CASE WHEN nt > 1 THEN nl ELSE 0 END) * 100.0 / sum(nl), 4)
    AS dup_pct
FROM lvl1 l JOIN tot USING (h)
GROUP BY 1, 2
ORDER BY source, kept"""


  /** [[docNgramProbe]]'s corpus: the planted-mirror corpus under the
    * probe's deterministic 1-in-4 md5 audit sample (the sample runs
    * on the FINAL doc_id, mirrors included — identical to the Spark
    * side's filter over the planted corpus).
    */
  private val probeCorpusCte = corpusCteOf(s"""SELECT * FROM (
  $plantedCorpusSql)
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
    % 4 = 0""")

  /** Twin of [[graft.ops.DedupOps.ngramJaccardCensus]]: the same
    * (source, lang, lenband) block sizes, dropped-block roll-up at
    * the test-scale maxBlock = 5.
    */
  val docNgramBlockCensus: String = corpusCte + """
SELECT CAST(count(*) AS BIGINT) AS n_blocks,
  CAST(sum(CASE WHEN bn > 5 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dropped_blocks,
  CAST(sum(CASE WHEN bn > 5 THEN bn ELSE 0 END) AS BIGINT)
    AS n_dropped_docs,
  CAST(coalesce(max(CASE WHEN bn > 5 THEN bn END), 0) AS BIGINT)
    AS largest_dropped,
  CAST(sum(CASE WHEN bn > 5 THEN bn * (bn - 1) // 2 ELSE 0 END)
    AS BIGINT) AS pairs_avoided
FROM (
  SELECT source, lang, CAST(floor(length(text) / 64.0) AS INT)
    AS lenband, count(*) AS bn
  FROM corpus GROUP BY 1, 2, 3)"""

  /** [[graft.ops.DedupOps.containmentCorpus]]'s twin collapsed to its
    * exact-dedup representatives (min doc_id per normalized digest —
    * the production-order collapse the Spark side applies via
    * dedupReps): the planted-dup corpus plus the truncated
    * first-half-of-tokens copy of every 7th doc under ids +2e6 (the
    * quote-and-expand fragment whose shingles are a strict subset of
    * its original's).
    */
  private val containCorpusCte = corpusCteOf(s"""SELECT doc_id, text, source, lang FROM (
    SELECT doc_id, text, source, lang,
      row_number() OVER (PARTITION BY md5(lower(trim(text)))
        ORDER BY doc_id) AS rn
    FROM (
      $plantedCorpusSql
      UNION ALL
      SELECT doc_id + 2000000,
        array_to_string(list_slice(string_split(text, ' '), 1,
          CAST(greatest(4, len(string_split(text, ' ')) // 2) AS INT)),
          ' '),
        source, lang
      FROM documents WHERE doc_id % 7 = 0))
  WHERE rn = 1""")

  /** Twin of [[graft.ops.DedupOps.containmentPairs]]: the same
    * inverted-index candidates (shingle buckets of 2..64 docs), exact
    * shingle-set containment/Jaccard per candidate pair, the same
    * rounded ≥0.8 gate and (containment desc, doc1, doc2) top-100.
    */
  val docContainment: String = containSql(residue = false)

  /** Twin of [[graft.ops.DedupOps.containmentResidue]]: the same
    * confirmed pairs restricted to Jaccard < 0.7 — what neither the
    * exact pass nor the LSH operating point can flag.
    */
  val docContainmentResidue: String = containSql(residue = true)

  /** Twin of [[graft.ops.DedupOps.containmentKeepBest]]: the full
    * containment corpus, exact-star edges over it, the LSH minhash
    * chain AND the capped containment index over the exact-collapse
    * representatives, all three edge sets into one recursive
    * reachability, keep-best survivor by (n_tokens desc, doc_id),
    * fragment band (ids ≥ 2e6) censused explicitly.
    */
  val docContainmentKeepBest: String = s"""WITH RECURSIVE corpus AS (
  $plantedCorpusSql
  UNION ALL
  SELECT doc_id + 2000000,
    array_to_string(list_slice(string_split(text, ' '), 1,
      CAST(greatest(4, len(string_split(text, ' ')) // 2) AS INT)),
      ' '),
    source, lang
  FROM documents WHERE doc_id % 7 = 0
), reps AS (
  SELECT doc_id, text, source, lang FROM (
    SELECT doc_id, text, source, lang,
      row_number() OVER (PARTITION BY md5(lower(trim(text)))
        ORDER BY doc_id) AS rn
    FROM corpus)
  WHERE rn = 1
), sh AS (
  SELECT doc_id, source, lang,
    CAST(floor(length(text) / 64.0) AS INT) AS lenband,
    list_distinct(CASE WHEN len(toks) >= 3 THEN
      list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      ELSE [text] END) AS shset
  FROM (
    SELECT doc_id, text, source, lang,
      list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM reps)
)""" + minhashChain("sh") + """, ev AS (
  SELECT doc_id, unnest(shset) AS shg FROM sh
), idx AS (SELECT shg, count(*) AS n FROM ev GROUP BY shg),
candc AS (
  SELECT e1.doc_id AS doc1, e2.doc_id AS doc2
  FROM ev e1 JOIN ev e2 ON e1.shg = e2.shg AND e1.doc_id < e2.doc_id
  JOIN idx ON idx.shg = e1.shg AND idx.n BETWEEN 2 AND 64
  GROUP BY 1, 2
  HAVING count(*) >= 4
), contedges AS (
  SELECT doc1, doc2 FROM (
    SELECT c.doc1, c.doc2,
      CAST(len(list_intersect(x.shset, y.shset)) AS BIGINT) AS n_shared,
      CAST(len(x.shset) AS BIGINT) AS n_sh1,
      CAST(len(y.shset) AS BIGINT) AS n_sh2
    FROM candc c
    JOIN sh x ON x.doc_id = c.doc1
    JOIN sh y ON y.doc_id = c.doc2)
  WHERE round(CAST(n_shared AS DOUBLE) / least(n_sh1, n_sh2), 4) >= 0.8
), exact_star AS (
  SELECT g.keeper AS src, c.doc_id AS dst
  FROM (
    SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keeper,
      count(*) AS n
    FROM corpus GROUP BY 1) g
  JOIN (SELECT doc_id, md5(lower(trim(text))) AS h FROM corpus) c
    ON g.h = c.h
  WHERE g.n > 1 AND c.doc_id <> g.keeper
), edges AS (
  SELECT src, dst FROM exact_star
  UNION
  SELECT doc1, doc2 FROM pairs
  UNION
  SELECT doc1, doc2 FROM contedges
), eb AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
), nodes AS (
  SELECT DISTINCT src AS id FROM eb
), reach AS (
  SELECT id, id AS lbl FROM nodes
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN eb e ON e.src = r.id
), final AS (
  SELECT id, min(lbl) AS lbl FROM reach GROUP BY id
), toks2 AS (
  SELECT doc_id, source,
    CASE WHEN length(trim(text)) = 0 THEN 0
      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
    END AS n_tokens
  FROM corpus
), clustered AS (
  SELECT t.doc_id, t.source, t.n_tokens,
    coalesce(f.lbl, t.doc_id) AS cluster
  FROM toks2 t LEFT JOIN final f ON t.doc_id = f.id
), wbest AS (
  SELECT cluster, doc_id AS best_id FROM (
    SELECT cluster, doc_id,
      row_number() OVER (PARTITION BY cluster
        ORDER BY n_tokens DESC, doc_id) AS rn
    FROM clustered) WHERE rn = 1
)
SELECT c.source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN c.doc_id = w.best_id THEN 1 ELSE 0 END) AS BIGINT)
    AS n_kept,
  CAST(count(*) - sum(CASE WHEN c.doc_id = w.best_id THEN 1 ELSE 0 END)
    AS BIGINT) AS n_dropped,
  CAST(sum(CASE WHEN c.doc_id >= 2000000 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_frag_docs,
  CAST(sum(CASE WHEN c.doc_id >= 2000000 AND c.doc_id <> w.best_id
    THEN 1 ELSE 0 END) AS BIGINT) AS n_frag_dropped
FROM clustered c JOIN wbest w USING (cluster)
GROUP BY c.source
ORDER BY c.source"""

  private def containSql(residue: Boolean): String = {
    val extra = if (residue)
      "\n  AND round(CAST(n_shared AS DOUBLE)" +
        " / (n_sh1 + n_sh2 - n_shared), 4) < 0.7"
    else ""
    containCorpusCte + s""",
ev AS (SELECT doc_id, unnest(shset) AS shg FROM sh),
idx AS (SELECT shg, count(*) AS n FROM ev GROUP BY shg),
cand AS (
  SELECT e1.doc_id AS doc1, e2.doc_id AS doc2
  FROM ev e1 JOIN ev e2 ON e1.shg = e2.shg AND e1.doc_id < e2.doc_id
  JOIN idx ON idx.shg = e1.shg AND idx.n BETWEEN 2 AND 64
  GROUP BY 1, 2
  HAVING count(*) >= 4),
scored AS (
  SELECT c.doc1, c.doc2,
    CAST(len(x.shset) AS BIGINT) AS n_sh1,
    CAST(len(y.shset) AS BIGINT) AS n_sh2,
    CAST(len(list_intersect(x.shset, y.shset)) AS BIGINT) AS n_shared
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc1
  JOIN sh y ON y.doc_id = c.doc2)
SELECT doc1, doc2, n_sh1, n_sh2, n_shared,
  CAST(round(CAST(n_shared AS DOUBLE) / least(n_sh1, n_sh2), 4)
    AS DOUBLE) AS containment,
  CAST(round(CAST(n_shared AS DOUBLE) / (n_sh1 + n_sh2 - n_shared), 4)
    AS DOUBLE) AS jaccard
FROM scored
WHERE round(CAST(n_shared AS DOUBLE) / least(n_sh1, n_sh2), 4) >= 0.8$extra
ORDER BY containment DESC, doc1, doc2
LIMIT 100"""
  }

  /** Twin of [[graft.ops.DedupOps.containmentHealth]]: bucket-size
    * census over the same inverted index at the same cap.
    */
  val docContainmentHealth: String = containCorpusCte + """,
ev AS (SELECT doc_id, unnest(shset) AS shg FROM sh),
bux AS (SELECT count(*) AS n FROM ev GROUP BY shg)
SELECT CAST(count(*) AS BIGINT) AS n_shingles,
  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_singleton,
  CAST(sum(CASE WHEN n BETWEEN 2 AND 64 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_pairing,
  CAST(sum(CASE WHEN n > 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
  CAST(coalesce(max(CASE WHEN n > 64 THEN n END), 0) AS BIGINT)
    AS largest_capped,
  CAST(sum(CASE WHEN n BETWEEN 2 AND 64 THEN n * (n - 1) // 2
    ELSE 0 END) AS BIGINT) AS n_cand_pairs
FROM bux"""

  val docNgramJaccard: String = corpusCte + """
SELECT doc1, doc2, jaccard FROM (
  SELECT x.doc_id AS doc1, y.doc_id AS doc2,
    CAST(round(CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
      / len(list_distinct(x.shset || y.shset)), 4) AS DOUBLE) AS jaccard
  FROM sh x JOIN sh y
    ON x.source = y.source AND x.lang = y.lang
    AND x.lenband = y.lenband AND x.doc_id < y.doc_id)
ORDER BY jaccard DESC, doc1, doc2
LIMIT 100"""

  val embKnnBrute: String = """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
), scored AS (
  SELECT qid, e.vec_id,
    list_sum(list_transform(list_zip(q.qv, e.embedding),
      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(q.qv,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      * sqrt(list_sum(list_transform(e.embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
  FROM embeddings e JOIN q ON e.vec_id <> q.qid
)
SELECT qid, vec_id AS neighbor, CAST(round(sim, 6) AS DOUBLE) AS sim,
  rank
FROM (
  SELECT qid, vec_id, sim,
    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
      AS BIGINT) AS rank
  FROM scored)
WHERE rank <= 5
ORDER BY qid, rank"""

  /** Exact-first dedup pipeline twin of
    * [[graft.ops.DedupOps.dedupPipeline]]: collapse exact-dup groups
    * to representatives, then run the identical MinHash chain over the
    * representatives only.
    */
  val docDedupPipeline: String = """WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
), hashed AS (
  SELECT doc_id, text, md5(lower(trim(text))) AS h FROM corpus
), reps AS (
  SELECT h, min(doc_id) AS rep_id, CAST(count(*) AS BIGINT) AS group_n
  FROM hashed GROUP BY h
), repdocs AS (
  SELECT hd.doc_id, hd.text, r.group_n
  FROM hashed hd JOIN reps r ON hd.doc_id = r.rep_id
), rsh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(toks) >= 3 THEN
      list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      ELSE [text] END) AS shset
  FROM (
    SELECT doc_id, text,
      list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM repdocs)
)""" + minhashChain("rsh") + """
SELECT p.doc1, p.doc2, p.jaccard, a.group_n AS n1, b.group_n AS n2
FROM pairs p JOIN repdocs a ON p.doc1 = a.doc_id
JOIN repdocs b ON p.doc2 = b.doc_id
ORDER BY p.doc1, p.doc2"""

  /** SimHash twin of [[graft.ops.DedupOps.simhash]]: 60-bit md5 token
    * hashes make every fingerprint bit engine-portable. The 60 vote
    * columns are generated, not hand-written.
    */
  val docSimhash: String = {
    val bits = 60
    val votes = (0 until bits)
      .map(j => s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val fpExpr = (0 until bits)
      .map(j => s"(CASE WHEN s$j > 0 THEN 1::BIGINT << $j ELSE 0::BIGINT END)")
      .mkString(" | ")
    s"""WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
), th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
  FROM (
    SELECT doc_id,
      unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        AS tok
    FROM corpus)
), votes AS (
  SELECT doc_id, $votes FROM th GROUP BY doc_id
), fp AS (
  SELECT doc_id, $fpExpr AS fp FROM votes
), bands AS (
  SELECT doc_id, fp, b.band, (fp >> (15 * b.band)) & 32767 AS bh
  FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
)
SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2,
  CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming
FROM bands x JOIN bands y
  ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.fp, y.fp)) <= 3
ORDER BY doc1, doc2"""
  }

  /** MinHash-LSH twin of [[graft.ops.DedupOps.minhashLsh]]: 28-bit md5
    * base hashes + the same affine permutations (a_i b_i constants of
    * [[graft.functions.MinHashSig]]) reproduce signatures, band keys,
    * the bucket-size cap and the exact-Jaccard confirmation.
    */
  /** The MinHash-LSH chain from a shingle-set CTE (`doc_id, shset`)
    * to a `pairs` member — parameterized on the source CTE so the
    * planted-dup query, the cluster oracle and the exact-first
    * pipeline all share one definition.
    */
  private def minhashChain(shCte: String,
      minJaccard: Double = 0.7, bandRows: Int = 4): String = s""", shx AS (
  SELECT doc_id, unnest(shset) AS s FROM $shCte
), base AS (
  SELECT doc_id, ('0x' || substr(md5(s), 1, 7))::BIGINT AS base FROM shx
), mins AS (
  SELECT doc_id, p.p AS p,
    min((((1000003 * p.p + 12345) % 2147483647) * base
         + ((998244353 * (p.p + 1) + 7) % 2147483647)) % 2147483647) AS mh
  FROM base CROSS JOIN (SELECT unnest(range(64)) AS p) p
  GROUP BY doc_id, p.p
), bandkeys AS (
  SELECT doc_id, p // $bandRows AS band,
    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY p) AS bh
  FROM mins GROUP BY doc_id, p // $bandRows
), bsz AS (
  SELECT band, bh, count(DISTINCT doc_id) AS n
  FROM bandkeys GROUP BY band, bh
), cand AS (
  SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
  FROM bandkeys x
  JOIN bandkeys y ON x.band = y.band AND x.bh = y.bh
    AND x.doc_id < y.doc_id
  JOIN bsz ON bsz.band = x.band AND bsz.bh = x.bh
  WHERE bsz.n BETWEEN 2 AND 1000
), pairs AS (
  SELECT doc1, doc2, jaccard FROM (
    SELECT doc1, doc2,
      CAST(round(CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
        / len(list_distinct(a.shset || b.shset)), 4) AS DOUBLE) AS jaccard
    FROM cand JOIN $shCte a ON cand.doc1 = a.doc_id
    JOIN $shCte b ON cand.doc2 = b.doc_id)
  WHERE jaccard >= $minJaccard
)
"""

  private val minhashPairsCte: String = corpusCte + minhashChain("sh")

  val docMinhashRecall: String = minhashPairsCte + """
, expected AS (
  SELECT doc_id AS doc1, doc_id + 1000000 AS doc2
  FROM documents WHERE doc_id % 5 = 0
), found AS (
  SELECT e.doc1, e.doc2 FROM expected e
  WHERE EXISTS (SELECT 1 FROM pairs p
    WHERE p.doc1 = e.doc1 AND p.doc2 = e.doc2)
)
SELECT CAST((SELECT count(*) FROM expected) AS BIGINT) AS n_expected,
  CAST(count(*) AS BIGINT) AS n_found,
  CAST(round(count(*) * 100.0
    / (SELECT count(*) FROM expected), 2) AS DOUBLE) AS recall_pct
FROM found"""

  val docMinhashLsh: String = minhashPairsCte + """
SELECT doc1, doc2, jaccard FROM pairs
ORDER BY doc1, doc2"""

  /** Twin of [[graft.ops.DedupOps.ngramJaccardBanded]]: the minhash
    * chain with the confirmation threshold dropped to 0, top-100 by
    * (jaccard desc, doc1, doc2) — at the RANKER's recorded r=8
    * operating point (DedupOps.RankerBandRows, the band-tune curve's
    * answer; the ≥0.7 confirm-path oracles stay at r=4 with it).
    */
  val docNgramBanded: String =
    corpusCte + minhashChain("sh", 0.0, bandRows = 8) + """
SELECT doc1, doc2, jaccard FROM pairs
ORDER BY jaccard DESC, doc1, doc2
LIMIT 100"""

  /** Twin of [[graft.ops.DedupOps.ngramBandedProbe]]: the blocked
    * exact top-100 probed against the LSH candidate set, recall split
    * at the 0.7 operating point — both sides over the 1-in-4 md5
    * audit sample ([[probeCorpusCte]]), the bounded-exact-side
    * discipline the IVF recall audits use.
    */
  val docNgramProbe: String = probeCorpusCte + minhashChain("sh") + """
, exact100 AS (
  SELECT doc1, doc2, jaccard FROM (
    SELECT x.doc_id AS doc1, y.doc_id AS doc2,
      CAST(round(CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
        / len(list_distinct(x.shset || y.shset)), 4) AS DOUBLE) AS jaccard
    FROM sh x JOIN sh y
      ON x.source = y.source AND x.lang = y.lang
      AND x.lenband = y.lenband AND x.doc_id < y.doc_id)
  ORDER BY jaccard DESC, doc1, doc2
  LIMIT 100
), probed AS (
  SELECT CAST(CASE WHEN e.jaccard >= 0.7 THEN 1 ELSE 0 END AS BIGINT)
      AS high_band,
    CASE WHEN EXISTS (SELECT 1 FROM cand c
      WHERE c.doc1 = e.doc1 AND c.doc2 = e.doc2) THEN 1 ELSE 0 END AS hit
  FROM exact100 e)
SELECT high_band, CAST(count(*) AS BIGINT) AS n_exact,
  CAST(sum(hit) AS BIGINT) AS n_recovered,
  CAST(round(sum(hit) * 100.0 / count(*), 2) AS DOUBLE) AS recall_pct
FROM probed GROUP BY high_band ORDER BY high_band"""

  /** The shared recursive-CTE chain to the converged per-doc cluster
    * label (`final(id, lbl)` — min reachable id per node): the oracle
    * core for the distributed label propagation behind
    * [[graft.ops.DedupOps.dupClusters]] and
    * [[graft.ops.DedupOps.dedupKeepBest]].
    */
  private val dupLabelsCte: String =
    minhashPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """
, exact_star AS (
  SELECT g.keeper AS src, c.doc_id AS dst
  FROM (
    SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keeper,
      count(*) AS n
    FROM corpus GROUP BY 1) g
  JOIN (SELECT doc_id, md5(lower(trim(text))) AS h FROM corpus) c
    ON g.h = c.h
  WHERE g.n > 1 AND c.doc_id <> g.keeper
), edges AS (
  SELECT src, dst FROM exact_star
  UNION
  SELECT doc1, doc2 FROM pairs
), eb AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
), nodes AS (
  SELECT DISTINCT src AS id FROM eb
), reach AS (
  SELECT id, id AS lbl FROM nodes
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN eb e ON e.src = r.id
), final AS (
  SELECT id, min(lbl) AS lbl FROM reach GROUP BY id
)"""

  /** Connected components over the dup-edge graph via a recursive CTE
    * (min reachable id per node) — the oracle for the distributed
    * label-propagation in [[graft.ops.DedupOps.dupClusters]].
    */
  val docDupClusters: String = dupLabelsCte + """
SELECT lbl AS cluster, CAST(count(*) AS BIGINT) AS n_members,
  min(id) AS min_doc, max(id) AS max_doc
FROM final GROUP BY lbl
ORDER BY cluster"""

  /** Twin of [[graft.ops.DedupOps.dedupKeepBest]]: the same cluster
    * labels, survivor by row_number (n_tokens DESC, doc_id) — the
    * min-struct's (−tokens, id) order — and the keep-first
    * comparison against the cluster label (the min id).
    */
  val docDedupKeepBest: String = dupLabelsCte + """
, toks AS (
  SELECT doc_id, source,
    CASE WHEN length(trim(text)) = 0 THEN 0
      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
    END AS n_tokens
  FROM corpus),
clustered AS (
  SELECT t.doc_id, t.source, t.n_tokens,
    coalesce(f.lbl, t.doc_id) AS cluster
  FROM toks t LEFT JOIN final f ON t.doc_id = f.id),
wsz AS (SELECT cluster, count(*) AS n FROM clustered GROUP BY cluster),
wbest AS (
  SELECT cluster, doc_id AS best_id, source AS best_source FROM (
    SELECT cluster, doc_id, source,
      row_number() OVER (PARTITION BY cluster
        ORDER BY n_tokens DESC, doc_id) AS rn
    FROM clustered) WHERE rn = 1),
perdoc AS (
  SELECT c.source, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(CASE WHEN c.doc_id = w.best_id THEN 1 ELSE 0 END)
      AS BIGINT) AS n_kept
  FROM clustered c JOIN wbest w USING (cluster) GROUP BY c.source),
perwin AS (
  SELECT w.best_source AS source,
    CAST(count(*) AS BIGINT) AS n_clusters_won,
    CAST(sum(CASE WHEN w.best_id <> w.cluster THEN 1 ELSE 0 END)
      AS BIGINT) AS n_policy_diff
  FROM wbest w JOIN wsz s USING (cluster) WHERE s.n > 1 GROUP BY 1)
SELECT p.source, p.n_docs, p.n_kept,
  p.n_docs - p.n_kept AS n_dropped,
  CAST(coalesce(pw.n_clusters_won, 0) AS BIGINT) AS n_clusters_won,
  CAST(coalesce(pw.n_policy_diff, 0) AS BIGINT) AS n_policy_diff
FROM perdoc p LEFT JOIN perwin pw USING (source)
ORDER BY p.source"""

  /** DuckDB cosine between two FLOAT[] columns — the sequential
    * list fold mirrors Spark's aggregate(zip_with(...)) order exactly,
    * so unrounded doubles match bit for bit.
    */
  private def duckCos(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b),
      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
    / (sqrt(list_sum(list_transform($a,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      * sqrt(list_sum(list_transform($b,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))"""

  /** IVF twin of [[graft.ops.VectorOps.knnIvf]]: same fixed centroids,
    * same nearest-cell assignment tie-break, same 4-probe search.
    */
  val embKnnIvf: String = s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1
), probes AS (
  SELECT qid, qv, cell FROM (
    SELECT e.vec_id AS qid, e.embedding AS qv, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 10)
  WHERE crank <= 4
), scored AS (
  SELECT p.qid, a.vec_id, ${duckCos("p.qv", "a.embedding")} AS sim
  FROM probes p JOIN assigned a ON p.cell = a.cell AND p.qid <> a.vec_id
)
SELECT qid, vec_id AS neighbor, CAST(round(sim, 6) AS DOUBLE) AS sim, rank
FROM (
  SELECT qid, vec_id, sim,
    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
      AS BIGINT) AS rank
  FROM scored)
WHERE rank <= 5
ORDER BY qid, rank"""

  /** Near-dup twin of [[graft.ops.VectorOps.embNearDup]]: the identical
    * ±1 hyperplane literals ([[graft.functions.Hyperplanes]]) are
    * inlined, and the per-plane vote is the same sequential list fold.
    */
  /** The 64-hyperplane fingerprint expression over an `embedding`
    * column — shared by [[embNearDup]] and the multi-probe twins.
    */
  private lazy val hyperplaneFpExpr: String = {
    import graft.functions.Hyperplanes.signs
    def vote(j: Int): String =
      s"""list_sum(list_transform(
        list_zip(embedding, [${signs(j).mkString(", ")}]),
        p -> CAST(p[1] AS DOUBLE) * p[2]))"""
    // DuckDB's checked shift rejects 1::BIGINT << 63; the sign bit
    // needs the min-long literal
    def bitLit(j: Int): String =
      if (j == 63) "(-9223372036854775807 - 1)::BIGINT"
      else s"1::BIGINT << $j"
    (0 until 64)
      .map(j => s"(CASE WHEN ${vote(j)} > 0 THEN ${bitLit(j)} ELSE 0::BIGINT END)")
      .mkString("\n    | ")
  }

  val embNearDup: String = {
    val fpExpr = hyperplaneFpExpr
    s"""WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 50 = 0
), fp AS (
  SELECT vec_id, embedding, $fpExpr AS fp FROM corpus
), bands AS (
  SELECT vec_id, fp, b.band, (fp >> (16 * b.band)) & 65535 AS bh
  FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
), cand AS (
  SELECT DISTINCT x.vec_id AS v1, y.vec_id AS v2
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bh = y.bh AND x.vec_id < y.vec_id
)
SELECT v1, v2, cos FROM (
  SELECT v1, v2,
    CAST(round(${duckCos("a.embedding", "b.embedding")}, 6) AS DOUBLE) AS cos
  FROM cand JOIN corpus a ON cand.v1 = a.vec_id
  JOIN corpus b ON cand.v2 = b.vec_id)
WHERE cos >= 0.9
ORDER BY v1, v2"""
  }

  /** The multi-probe near-dup CTE set for a given flip list — mirror
    * of [[graft.ops.VectorOps.multiProbePairs]] over the
    * near-boundary planted corpus (every 25th vector duplicated with
    * dimension vec_id % 64 negated).
    */
  private def multiProbeCte(flips: Seq[Long]): String = s"""
corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
    list_transform(range(64), k ->
      CASE WHEN k = vec_id % 64 THEN -embedding[k + 1]
           ELSE embedding[k + 1] END) AS embedding
  FROM embeddings WHERE vec_id % 25 = 0
), fp AS (
  SELECT vec_id, embedding, $hyperplaneFpExpr AS fp FROM corpus
), bands AS (
  SELECT vec_id, (fp >> (16 * b.band)) & 65535 AS bh, b.band
  FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
), sizes AS (
  SELECT band, bh, count(*) AS n FROM bands GROUP BY 1, 2
), bucket AS (
  SELECT b.vec_id, b.band, b.bh FROM bands b
  JOIN sizes s ON b.band = s.band AND b.bh = s.bh AND s.n <= 1000
), probes AS (
  SELECT vec_id AS pv, band, xor(bh, f.f) AS pbh
  FROM bands CROSS JOIN (SELECT unnest([${flips.mkString(", ")}]) AS f) f
), cand AS (
  SELECT DISTINCT p.pv AS v1, b.vec_id AS v2
  FROM probes p JOIN bucket b
    ON p.band = b.band AND p.pbh = b.bh AND p.pv < b.vec_id
)"""

  private def probeFlips(flipBits: Int): Seq[Long] =
    0L +: (0 until flipBits).map(b => 1L << b)

  /** Twin of [[graft.ops.VectorOps.embNearDupMultiProbe]]. */
  val embNearDupMultiProbe: String = s"""
WITH ${multiProbeCte(probeFlips(16))}
SELECT v1, v2, cos FROM (
  SELECT v1, v2,
    CAST(round(${duckCos("a.embedding", "b.embedding")}, 6) AS DOUBLE) AS cos
  FROM cand JOIN corpus a ON cand.v1 = a.vec_id
  JOIN corpus b ON cand.v2 = b.vec_id)
WHERE cos >= 0.9
ORDER BY v1, v2"""

  /** Twin of [[graft.ops.VectorOps.embNearDupProbeCurve]]: one block
    * per probe level, unioned.
    */
  val embNearDupProbeCurve: String = {
    def level(fb: Int): String = s"""
SELECT $fb AS probe_bits,
  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(CASE WHEN v2 = v1 + 1000000 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_planted_found,
  round(sum(CASE WHEN v2 = v1 + 1000000 THEN 1 ELSE 0 END) * 100.0
    / CAST((SELECT count(*) FROM embeddings WHERE vec_id % 25 = 0)
        AS DOUBLE), 2) AS planted_recall_pct
FROM (
  SELECT v1, v2 FROM (
    SELECT v1, v2,
      round(${duckCos("a.embedding", "b.embedding")}, 6) AS cos
    FROM cand JOIN corpus a ON cand.v1 = a.vec_id
    JOIN corpus b ON cand.v2 = b.vec_id)
  WHERE cos >= 0.9)"""
    Seq(0, 4, 16).map(fb =>
      s"SELECT * FROM (WITH ${multiProbeCte(probeFlips(fb))}${level(fb)})")
      .mkString("", "\nUNION ALL\n", "\nORDER BY probe_bits")
  }

  /** SemDeDup twin of [[graft.ops.VectorOps.semDedup]]: the same
    * planted-dup corpus, the same fixed-centroid assignment tie-break
    * as [[embKnnIvf]], the same keep-first within-cell drop rule on
    * the bit-identical sequential-fold cosine.
    */
  val embSemDedup: String = s"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 50 = 0
), cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (SELECT greatest(16,
    CAST(ceil(count(*) / 128.0) AS BIGINT)) FROM corpus)
), assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM corpus e CROSS JOIN cents c)
  WHERE crank <= 1
), dropped AS (
  SELECT DISTINCT a.cell, b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ${duckCos("a.embedding", "b.embedding")} >= 0.85
), tot AS (SELECT cell, count(*) AS n_vecs FROM assigned GROUP BY cell),
drp AS (SELECT cell, count(*) AS n_dropped FROM dropped GROUP BY cell)
SELECT t.cell, CAST(t.n_vecs AS BIGINT) AS n_vecs,
  CAST(coalesce(d.n_dropped, 0) AS BIGINT) AS n_dropped,
  CAST(t.n_vecs - coalesce(d.n_dropped, 0) AS BIGINT) AS n_kept
FROM tot t LEFT JOIN drp d USING (cell)
ORDER BY t.cell"""

  /** kNN-graph twin of [[graft.ops.VectorOps.knnGraph]]: the same
    * k ∝ N assignment tie-break, per-vector argmax over the in-cell
    * pairs as a row_number on (sim desc, nn asc), rounded at the
    * edge.
    */
  val embKnnGraph: String = s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (SELECT greatest(16,
    CAST(ceil(count(*) / 128.0) AS BIGINT)) FROM embeddings)
), assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1
)
SELECT cell, vec_id, nn_id, CAST(round(sim, 6) AS DOUBLE) AS sim
FROM (
  SELECT a.cell, a.vec_id, b.vec_id AS nn_id,
    ${duckCos("a.embedding", "b.embedding")} AS sim,
    row_number() OVER (PARTITION BY a.vec_id
      ORDER BY ${duckCos("a.embedding", "b.embedding")} DESC, b.vec_id)
      AS rk
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id <> b.vec_id)
WHERE rk = 1
ORDER BY vec_id"""

  /** Boundary-probe twin of [[graft.ops.VectorOps.semDedupProbe]]:
    * the same planted corpus and assignment tie-break, prober side at
    * crank ≤ 2, stored side at crank = 1, keep-first drops over the
    * unordered pair set, census keyed by the primary cell.
    */
  val embSemDedupProbe: String = s"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 50 = 0
), cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (SELECT greatest(16,
    CAST(ceil(count(*) / 128.0) AS BIGINT)) FROM corpus)
), ranked AS (
  SELECT vec_id, embedding, cell, crank FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM corpus e CROSS JOIN cents c)
  WHERE crank <= 2
), prim AS (
  SELECT vec_id, embedding, cell FROM ranked WHERE crank = 1
), drops AS (
  SELECT DISTINCT greatest(p.vec_id, s.vec_id) AS vec_id
  FROM ranked p JOIN prim s ON p.cell = s.cell
    AND p.vec_id <> s.vec_id
  WHERE ${duckCos("p.embedding", "s.embedding")} >= 0.85
)
SELECT pr.cell, CAST(count(*) AS BIGINT) AS n_vecs,
  CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dropped,
  CAST(count(*) - sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)
    AS BIGINT) AS n_kept
FROM prim pr LEFT JOIN drops d USING (vec_id)
GROUP BY pr.cell
ORDER BY pr.cell"""

  /** Twin of [[graft.ops.VectorOps.semDedupClusters]]: the probe2
    * tau-pair set into a recursive min-reachable-id component census.
    */
  val embSemDedupClusters: String = s"""
WITH RECURSIVE corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 50 = 0
), cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (SELECT greatest(16,
    CAST(ceil(count(*) / 128.0) AS BIGINT)) FROM corpus)
), ranked AS (
  SELECT vec_id, embedding, cell, crank FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM corpus e CROSS JOIN cents c)
  WHERE crank <= 2
), prim AS (
  SELECT vec_id, embedding, cell FROM ranked WHERE crank = 1
), pairs AS (
  SELECT DISTINCT least(p.vec_id, s.vec_id) AS src,
    greatest(p.vec_id, s.vec_id) AS dst
  FROM ranked p JOIN prim s ON p.cell = s.cell AND p.vec_id <> s.vec_id
  WHERE ${duckCos("p.embedding", "s.embedding")} >= 0.85
), eb AS (
  SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
), nodes AS (
  SELECT DISTINCT src AS id FROM eb
), reach AS (
  SELECT id, id AS lbl FROM nodes
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN eb e ON e.src = r.id
), final AS (
  SELECT id, min(lbl) AS lbl FROM reach GROUP BY id
)
SELECT lbl AS cluster, CAST(count(*) AS BIGINT) AS n_members,
  min(id) AS min_vec, max(id) AS max_vec
FROM final GROUP BY lbl
ORDER BY cluster"""

  /** Twin of [[graft.ops.VectorOps.semDedupRecall]]: the same planted
    * corpus and probed assignment, 1-in-64 md5 anchors, exact
    * tau-neighbor ground truth, cell-local and 2-probe caught sets
    * via the same pair geometries.
    */
  val embSemDedupRecall: String = s"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 50 = 0
), cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (SELECT greatest(16,
    CAST(ceil(count(*) / 128.0) AS BIGINT)) FROM corpus)
), ranked AS (
  SELECT vec_id, embedding, cell, crank FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM corpus e CROSS JOIN cents c)
  WHERE crank <= 2
), prim AS (
  SELECT vec_id, embedding, cell FROM ranked WHERE crank = 1
), anchors AS (
  SELECT vec_id AS aid FROM corpus
  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 7))::BIGINT
    % 64 = 0 OR vec_id >= 1000000
), aprim AS (
  SELECT a.aid, p.cell AS acell, p.embedding AS av
  FROM anchors a JOIN prim p ON p.vec_id = a.aid
), aprobes AS (
  SELECT a.aid, r.cell AS acell, r.embedding AS av
  FROM anchors a JOIN ranked r ON r.vec_id = a.aid
), droppable AS (
  SELECT DISTINCT a.aid FROM corpus u JOIN aprim a ON u.vec_id < a.aid
  WHERE ${duckCos("u.embedding", "a.av")} >= 0.85
), lcl AS (
  SELECT DISTINCT a.aid FROM prim u JOIN aprim a
    ON u.cell = a.acell AND u.vec_id < a.aid
  WHERE ${duckCos("u.embedding", "a.av")} >= 0.85
), pr2 AS (
  SELECT DISTINCT aid FROM (
    SELECT a.aid, u.embedding AS ue, a.av FROM prim u JOIN aprobes a
      ON u.cell = a.acell AND u.vec_id < a.aid
    UNION ALL
    SELECT a.aid, u.embedding AS ue, a.av FROM ranked u JOIN aprim a
      ON u.cell = a.acell AND u.vec_id < a.aid)
  WHERE ${duckCos("ue", "av")} >= 0.85
), r1 AS (
  SELECT 'cell_local' AS method,
    CAST(count(*) AS BIGINT) AS n_anchors,
    CAST(count(d.aid) AS BIGINT) AS n_droppable,
    CAST(count(l.aid) AS BIGINT) AS n_caught,
    CASE WHEN count(d.aid) > 0 THEN
      round(CAST(count(l.aid) AS DOUBLE) / count(d.aid), 4)
    END AS drop_recall
  FROM anchors a
  LEFT JOIN droppable d ON d.aid = a.aid
  LEFT JOIN lcl l ON l.aid = a.aid
), r2 AS (
  SELECT 'probe2' AS method,
    CAST(count(*) AS BIGINT) AS n_anchors,
    CAST(count(d.aid) AS BIGINT) AS n_droppable,
    CAST(count(p.aid) AS BIGINT) AS n_caught,
    CASE WHEN count(d.aid) > 0 THEN
      round(CAST(count(p.aid) AS DOUBLE) / count(d.aid), 4)
    END AS drop_recall
  FROM anchors a
  LEFT JOIN droppable d ON d.aid = a.aid
  LEFT JOIN pr2 p ON p.aid = a.aid
)
SELECT * FROM r1 UNION ALL SELECT * FROM r2 ORDER BY method"""

  /** Boundary-probe twin of [[graft.ops.VectorOps.knnGraphProbe]]:
    * prober at crank ≤ 2, candidates at crank = 1, per-prober argmax
    * as row_number on (sim desc, nn asc), edge keyed by the prober's
    * primary cell.
    */
  val embKnnGraphProbe: String = s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (SELECT greatest(16,
    CAST(ceil(count(*) / 128.0) AS BIGINT)) FROM embeddings)
), ranked AS (
  SELECT vec_id, embedding, cell, crank FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 2
), prim AS (
  SELECT vec_id, embedding, cell FROM ranked WHERE crank = 1
), edges AS (
  SELECT p.vec_id AS v1, s.vec_id AS v2,
    ${duckCos("p.embedding", "s.embedding")} AS sim
  FROM ranked p JOIN prim s ON p.cell = s.cell AND p.vec_id <> s.vec_id
)
SELECT pr.cell, e.v1 AS vec_id, e.v2 AS nn_id,
  CAST(round(e.sim, 6) AS DOUBLE) AS sim
FROM (
  SELECT v1, v2, sim,
    row_number() OVER (PARTITION BY v1 ORDER BY sim DESC, v2) AS rk
  FROM edges) e
JOIN prim pr ON pr.vec_id = e.v1
WHERE e.rk = 1
ORDER BY vec_id"""

  /** Twin of [[graft.ops.VectorOps.knnGraphTopK]]: same probed
    * geometry, per-prober top-5 as row_number on (sim desc, v2),
    * edge keyed by the prober's primary cell.
    */
  val embKnnGraphTopk: String = s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (SELECT greatest(16,
    CAST(ceil(count(*) / 128.0) AS BIGINT)) FROM embeddings)
), ranked AS (
  SELECT vec_id, embedding, cell, crank FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 2
), prim AS (
  SELECT vec_id, embedding, cell FROM ranked WHERE crank = 1
), edges AS (
  SELECT p.vec_id AS v1, s.vec_id AS v2,
    ${duckCos("p.embedding", "s.embedding")} AS sim
  FROM ranked p JOIN prim s ON p.cell = s.cell AND p.vec_id <> s.vec_id
)
SELECT pr.cell, e.v1 AS vec_id, CAST(e.rk AS INT) AS rank,
  e.v2 AS nn_id, CAST(round(e.sim, 6) AS DOUBLE) AS sim
FROM (
  SELECT v1, v2, sim,
    row_number() OVER (PARTITION BY v1 ORDER BY sim DESC, v2) AS rk
  FROM edges) e
JOIN prim pr ON pr.vec_id = e.v1
WHERE e.rk <= 5
ORDER BY vec_id, rank"""

  /** Twin of [[graft.ops.VectorOps.knnGraphRecall]]: 1-in-64 md5
    * anchor sample, exact NN as the ground truth, cell-local and
    * 2-probe graph edges via the same (sim desc, id) argmax, per-row
    * DECIMAL(20,10) sim ratios so the mean is order-exact.
    */
  val embKnnGraphRecall: String = s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (SELECT greatest(16,
    CAST(ceil(count(*) / 128.0) AS BIGINT)) FROM embeddings)
), anchors AS (
  SELECT vec_id AS aid, embedding AS av FROM embeddings
  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 7))::BIGINT
    % 64 = 0
), truth AS (
  SELECT aid, vec_id AS true_nn, sim AS true_sim FROM (
    SELECT a.aid, e.vec_id, ${duckCos("a.av", "e.embedding")} AS sim,
      row_number() OVER (PARTITION BY a.aid
        ORDER BY ${duckCos("a.av", "e.embedding")} DESC, e.vec_id) AS rk
    FROM embeddings e JOIN anchors a ON e.vec_id <> a.aid)
  WHERE rk = 1
), ranked AS (
  SELECT vec_id, embedding, cell, crank FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 2
), prim AS (
  SELECT vec_id, embedding, cell FROM ranked WHERE crank = 1
), edges AS (
  SELECT p.vec_id AS v1, p.crank, s.vec_id AS v2,
    ${duckCos("p.embedding", "s.embedding")} AS sim
  FROM ranked p JOIN prim s ON p.cell = s.cell AND p.vec_id <> s.vec_id
  WHERE p.vec_id IN (SELECT aid FROM anchors)
), g1 AS (
  SELECT v1 AS gaid, v2 AS graph_nn, sim AS graph_sim FROM (
    SELECT v1, v2, sim,
      row_number() OVER (PARTITION BY v1 ORDER BY sim DESC, v2) AS rk
    FROM edges WHERE crank = 1) WHERE rk = 1
), g2 AS (
  SELECT v1 AS gaid, v2 AS graph_nn, sim AS graph_sim FROM (
    SELECT v1, v2, sim,
      row_number() OVER (PARTITION BY v1 ORDER BY sim DESC, v2) AS rk
    FROM edges) WHERE rk = 1
), r1 AS (
  SELECT 'cell_local' AS method,
    CAST(count(*) AS BIGINT) AS n_anchors,
    CAST(count(g.graph_nn) AS BIGINT) AS n_edged,
    CAST(sum(CASE WHEN g.graph_nn = t.true_nn THEN 1 ELSE 0 END)
      AS BIGINT) AS n_nn_match,
    round(CAST(sum(CASE WHEN g.graph_nn = t.true_nn THEN 1 ELSE 0 END)
      AS DOUBLE) / count(*), 4) AS nn_recall,
    round(CAST(sum(CAST(coalesce(g.graph_sim / t.true_sim, 0)
      AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS mean_sim_ratio
  FROM truth t LEFT JOIN g1 g ON g.gaid = t.aid
), r2 AS (
  SELECT 'probe2' AS method,
    CAST(count(*) AS BIGINT) AS n_anchors,
    CAST(count(g.graph_nn) AS BIGINT) AS n_edged,
    CAST(sum(CASE WHEN g.graph_nn = t.true_nn THEN 1 ELSE 0 END)
      AS BIGINT) AS n_nn_match,
    round(CAST(sum(CASE WHEN g.graph_nn = t.true_nn THEN 1 ELSE 0 END)
      AS DOUBLE) / count(*), 4) AS nn_recall,
    round(CAST(sum(CAST(coalesce(g.graph_sim / t.true_sim, 0)
      AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS mean_sim_ratio
  FROM truth t LEFT JOIN g2 g ON g.gaid = t.aid
)
SELECT * FROM r1 UNION ALL SELECT * FROM r2 ORDER BY method"""

  /** Twin of [[graft.ops.VectorOps.knnGraphProbeCurve]]: the recall
    * audit at probe depths 1/2/4 off one crank ≤ 4 ranking.
    */
  val embKnnGraphProbeCurve: String = {
    def rollupAt(n: Int): String = s"""
  SELECT $n AS nprobe,
    CAST(count(*) AS BIGINT) AS n_anchors,
    CAST(count(g.graph_nn) AS BIGINT) AS n_edged,
    CAST(sum(CASE WHEN g.graph_nn = t.true_nn THEN 1 ELSE 0 END)
      AS BIGINT) AS n_nn_match,
    round(CAST(sum(CASE WHEN g.graph_nn = t.true_nn THEN 1 ELSE 0 END)
      AS DOUBLE) / count(*), 4) AS nn_recall,
    round(CAST(sum(CAST(coalesce(g.graph_sim / t.true_sim, 0)
      AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS mean_sim_ratio
  FROM truth t LEFT JOIN (
    SELECT v1 AS gaid, v2 AS graph_nn, sim AS graph_sim FROM (
      SELECT v1, v2, sim,
        row_number() OVER (PARTITION BY v1 ORDER BY sim DESC, v2) AS rk
      FROM edges WHERE crank <= $n) WHERE rk = 1
  ) g ON g.gaid = t.aid"""
    s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (SELECT greatest(16,
    CAST(ceil(count(*) / 128.0) AS BIGINT)) FROM embeddings)
), anchors AS (
  SELECT vec_id AS aid, embedding AS av FROM embeddings
  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 7))::BIGINT
    % 64 = 0
), truth AS (
  SELECT aid, vec_id AS true_nn, sim AS true_sim FROM (
    SELECT a.aid, e.vec_id, ${duckCos("a.av", "e.embedding")} AS sim,
      row_number() OVER (PARTITION BY a.aid
        ORDER BY ${duckCos("a.av", "e.embedding")} DESC, e.vec_id) AS rk
    FROM embeddings e JOIN anchors a ON e.vec_id <> a.aid)
  WHERE rk = 1
), ranked AS (
  SELECT vec_id, embedding, cell, crank FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 4
), prim AS (
  SELECT vec_id, embedding, cell FROM ranked WHERE crank = 1
), edges AS (
  SELECT p.vec_id AS v1, p.crank, s.vec_id AS v2,
    ${duckCos("p.embedding", "s.embedding")} AS sim
  FROM ranked p JOIN prim s ON p.cell = s.cell AND p.vec_id <> s.vec_id
  WHERE p.vec_id IN (SELECT aid FROM anchors)
)
SELECT * FROM (${rollupAt(1)}
UNION ALL${rollupAt(2)}
UNION ALL${rollupAt(4)})
ORDER BY nprobe"""
  }

  /** Twin of [[graft.ops.VectorOps.knnClassify]]: same anchor sample,
    * row_number top-5 matching the bounded aggregate's (sim desc, id)
    * order, majority/confusion tie-breaks (count desc, label asc).
    */
  val embKnnClassify: String = s"""
WITH a AS (
  SELECT vec_id AS aid, label AS alabel, embedding AS av FROM embeddings
  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 7))::BIGINT
    % 8 = 0),
scored AS (
  SELECT aid, alabel, e.vec_id, ${duckCos("a.av", "e.embedding")} AS sim
  FROM embeddings e JOIN a ON e.vec_id <> a.aid),
top5 AS (
  SELECT aid, alabel, vec_id FROM (
    SELECT aid, alabel, vec_id,
      row_number() OVER (PARTITION BY aid ORDER BY sim DESC, vec_id)
        AS rn
    FROM scored) WHERE rn <= 5),
votes AS (
  SELECT aid, alabel, e.label AS nlabel, count(*) AS cnt
  FROM top5 JOIN embeddings e ON top5.vec_id = e.vec_id
  GROUP BY 1, 2, 3),
pred AS (
  SELECT aid, alabel, nlabel AS pred FROM (
    SELECT aid, alabel, nlabel,
      row_number() OVER (PARTITION BY aid ORDER BY cnt DESC, nlabel)
        AS rn
    FROM votes) WHERE rn = 1),
base AS (
  SELECT alabel, count(*) AS n_anchors,
    sum(CASE WHEN pred = alabel THEN 1 ELSE 0 END) AS n_correct
  FROM pred GROUP BY alabel),
wrongs AS (
  SELECT alabel, pred, count(*) AS cnt FROM pred
  WHERE pred <> alabel GROUP BY alabel, pred),
conf AS (
  SELECT alabel, pred AS top_confusion FROM (
    SELECT alabel, pred,
      row_number() OVER (PARTITION BY alabel ORDER BY cnt DESC, pred)
        AS rn
    FROM wrongs) WHERE rn = 1)
SELECT b.alabel AS label, CAST(b.n_anchors AS BIGINT) AS n_anchors,
  CAST(b.n_correct AS BIGINT) AS n_correct,
  round(b.n_correct * 100.0 / b.n_anchors, 2) AS acc_pct,
  coalesce(c.top_confusion, -1) AS top_confusion
FROM base b LEFT JOIN conf c USING (alabel)
ORDER BY label"""

  /** The k ∝ N cell-count scalar ([[graft.ops.VectorOps.derivedK]]
    * twin): greatest(floor, ceil(N / targetCell)) over `table`.
    */
  private def kCellsSql(table: String, targetCell: Int,
      floor: Int): String =
    s"""SELECT greatest($floor,
      CAST(ceil(count(*) / $targetCell.0) AS BIGINT)) FROM $table"""

  /** In-cell top-50 pair mining for a given centroid predicate —
    * shared by the fixed-16 baseline and the k ∝ N twin; yields
    * (cell, v1, v2, sim) pre-annotation.
    */
  private def docParaphrasePairsSql(centsWhere: String,
      corpusWhere: String = "TRUE"): String = s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE $centsWhere),
assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c
    WHERE $corpusWhere)
  WHERE crank <= 1),
pairs AS (
  SELECT a.cell, a.vec_id AS v1, b.vec_id AS v2,
    ${duckCos("a.embedding", "b.embedding")} AS sim
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id)
SELECT cell, v1, v2, sim FROM pairs
ORDER BY sim DESC, v1, v2 LIMIT 50"""

  /** Document annotation of a mined top-50 pair set (after the cut). */
  private def docParaphraseSql(centsWhere: String): String = s"""
WITH top AS (${docParaphrasePairsSql(centsWhere)})
SELECT t.cell, t.v1, t.v2, CAST(round(t.sim, 6) AS DOUBLE) AS sim,
  d1.source AS src1, d2.source AS src2,
  (md5(d1.text) = md5(d2.text)) AS same_text
FROM top t JOIN documents d1 ON t.v1 = d1.doc_id
JOIN documents d2 ON t.v2 = d2.doc_id
ORDER BY sim DESC, v1, v2"""

  /** Twin of [[graft.ops.VectorOps.paraphraseCandidates]]: the shared
    * cell assignment, in-cell pairs, rounded-sim top-50, document
    * annotation after the cut.
    */
  val docParaphraseMining: String = docParaphraseSql("vec_id < 16")

  /** Twin of [[graft.ops.VectorOps.paraphraseCandidatesIvf]]: same
    * mining over the k ∝ N codebook (floor 32, target cell 64).
    */
  val docParaphraseMiningIvf: String =
    docParaphraseSql(s"vec_id < (${kCellsSql("embeddings", 64, 32)})")

  /** Twin of [[graft.ops.VectorOps.domainClusters]]: the k ∝ N
    * assignment (same crank tie-break), document join on the id key,
    * per-(cell, source) partials, dominant source via row_number
    * (n DESC, source).
    */
  val docDomainClusters: String = s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (${kCellsSql("embeddings", 128, 16)})),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1),
docs AS (
  SELECT doc_id AS vec_id, source,
    CASE WHEN length(trim(text)) = 0 THEN 0
      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
    END AS n_tokens
  FROM documents),
ps AS (
  SELECT cell, source, count(*) AS n, sum(n_tokens) AS tok
  FROM assigned JOIN docs USING (vec_id) GROUP BY 1, 2),
dom AS (
  SELECT cell, source AS dominant_source FROM (
    SELECT cell, source,
      row_number() OVER (PARTITION BY cell ORDER BY n DESC, source) AS rn
    FROM ps) WHERE rn = 1),
pc AS (
  SELECT cell, CAST(sum(n) AS BIGINT) AS n_docs,
    CAST(count(*) AS BIGINT) AS n_sources,
    CAST(sum(tok) AS BIGINT) AS sum_tokens
  FROM ps GROUP BY 1),
tot AS (SELECT sum(n_docs) AS total_docs FROM pc)
SELECT pc.cell, pc.n_docs,
  round(pc.n_docs * 100.0 / tot.total_docs, 4) AS pct,
  pc.n_sources, d.dominant_source,
  round(CAST(pc.sum_tokens AS DOUBLE) / pc.n_docs, 4) AS avg_tokens
FROM pc JOIN dom d USING (cell) CROSS JOIN tot
ORDER BY pc.cell"""

  /** The pruning-manifest CTE shared by [[docPruningManifest]] and
    * [[docPruningCensus]] — mirror of
    * [[graft.ops.VectorOps.pruningManifestRaw]]: the k ∝ N assignment
    * (docDomainClusters' crank tie-break), per-cell doc counts, the
    * 4×-uniform drop rule and the clipped inverse-propensity weight,
    * all on the raw pct double.
    */
  private val pruningCte: String = s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (${kCellsSql("embeddings", 128, 16)})),
kk AS (
  SELECT CAST((${kCellsSql("embeddings", 128, 16)}) AS DOUBLE) AS k),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1),
docs AS (SELECT doc_id AS vec_id, source FROM documents),
percell AS (
  SELECT cell, count(*) AS n_docs
  FROM assigned JOIN docs USING (vec_id) GROUP BY 1),
tot AS (SELECT sum(n_docs) AS total_docs FROM percell),
manifest AS (
  SELECT cell, n_docs, pct_raw,
    CASE WHEN pct_raw > (100.0 / k) * 4.0 THEN 'drop'
         ELSE 'keep' END AS action,
    CASE WHEN pct_raw > (100.0 / k) * 4.0 THEN 0.0
         ELSE least(2.0, greatest(0.5, (100.0 / k) / pct_raw))
    END AS weight_raw
  FROM (
    SELECT cell, n_docs, n_docs * 100.0 / tot.total_docs AS pct_raw, kk.k
    FROM percell CROSS JOIN tot CROSS JOIN kk))
"""

  /** Twin of [[graft.ops.VectorOps.pruningManifest]]. */
  val docPruningManifest: String = pruningCte + """
SELECT cell, CAST(n_docs AS BIGINT) AS n_docs,
  round(pct_raw, 4) AS pct, action,
  round(weight_raw, 6) AS weight
FROM manifest ORDER BY cell"""

  /** Twin of [[graft.ops.VectorOps.pruningCensus]]: per-source
    * kept/dropped split, weights summed in DECIMAL.
    */
  val docPruningCensus: String = pruningCte + """
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN m.action = 'drop' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dropped,
  CAST(sum(CASE WHEN m.action <> 'drop' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_kept,
  round(CAST(sum(CASE WHEN m.action <> 'drop'
      THEN CAST(m.weight_raw AS DECIMAL(20,10))
      ELSE CAST(0.0 AS DECIMAL(20,10)) END) AS DOUBLE), 6)
    AS kept_weight_sum
FROM docs d
JOIN assigned a USING (vec_id)
JOIN manifest m USING (cell)
GROUP BY d.source
ORDER BY d.source"""

  /** Twin of [[graft.ops.VectorOps.pruningQuality]]: the pruning CTE's
    * assignment joined with the per-doc quality gate
    * ([[docQualityGate]]'s flag arithmetic, integer cross-multiplied),
    * density rule first, then the qk*2 < n low-quality rule, kept
    * weights scaled by the exact-rational keep-rate.
    */
  val docPruningQuality: String = pruningCte.replace(
    "docs AS (SELECT doc_id AS vec_id, source FROM documents),",
    """docs AS (
  SELECT doc_id AS vec_id,
    CASE WHEN n_chars >= 100
      AND len(list_filter(string_split(lower(text), ' '),
        x -> x <> '')) >= 20
      AND len(list_filter(string_split(lower(text), ' '),
        x -> x = 'the' OR x = 'a')) * 2
        <= len(list_filter(string_split(lower(text), ' '),
          x -> x <> ''))
    THEN 1 ELSE 0 END AS keep
  FROM documents),
qcell AS (
  SELECT cell, CAST(sum(keep) AS BIGINT) AS qk
  FROM assigned JOIN docs USING (vec_id) GROUP BY 1),""") + """
SELECT m.cell, CAST(m.n_docs AS BIGINT) AS n_docs,
  q.qk AS n_quality_keep,
  round(m.pct_raw, 4) AS pct,
  CASE WHEN m.action = 'drop' THEN 'drop_dense'
       WHEN q.qk * 2 < m.n_docs THEN 'drop_lowq'
       ELSE 'keep' END AS action,
  round(CASE WHEN m.action = 'drop' OR q.qk * 2 < m.n_docs THEN 0.0
    ELSE m.weight_raw * (CAST(q.qk AS DOUBLE) / m.n_docs) END, 6)
    AS weight
FROM manifest m JOIN qcell q USING (cell)
ORDER BY m.cell"""

  /** Twin of [[graft.ops.VectorOps.paraphraseRecall]]: top-50 pair
    * overlap of the baseline and the k ∝ N twin, both mined over the
    * 1-in-2 md5 audit sample of the corpus with the miners' own
    * (full-corpus) centroids.
    */
  private val paraphraseAuditWhere: String =
    """('0x' || substr(md5(CAST(e.vec_id AS VARCHAR)), 1, 7))::BIGINT
      % 2 = 0"""

  val docParaphraseIvfRecall: String = s"""
WITH x AS (${docParaphrasePairsSql("vec_id < 16", paraphraseAuditWhere)}),
y AS (${docParaphrasePairsSql(
      s"vec_id < (${kCellsSql("embeddings", 64, 32)})",
      paraphraseAuditWhere)})
SELECT CAST(count(*) AS BIGINT) AS n_exact,
  CAST(count(y.v1) AS BIGINT) AS n_common,
  CASE WHEN count(*) > 0
    THEN round(count(y.v1) * 100.0 / count(*), 2) END AS common_pct
FROM x LEFT JOIN y ON x.v1 = y.v1 AND x.v2 = y.v2"""

  /** Twin of [[graft.ops.ImagingOps.datasetOverlap]]: same 2..20
    * shareable band, same two-stage (cut on ids, present by serial)
    * ordering.
    */
  val imgDatasetOverlap: String = imagingCte + """
, sd AS (SELECT DISTINCT
    ('0x' || substr(sha256, 1, 15))::BIGINT AS h,
    frames_global_id AS ds
    FROM frames),
shareable AS (
  SELECT h FROM (SELECT h, count(*) AS c FROM sd GROUP BY h)
  WHERE c BETWEEN 2 AND 20),
pool AS (SELECT sd.h, sd.ds FROM sd JOIN shareable USING (h)),
top AS (
  SELECT a.ds AS d1, b.ds AS d2, CAST(count(*) AS BIGINT)
    AS shared_digests
  FROM pool a JOIN pool b ON a.h = b.h AND a.ds < b.ds
  GROUP BY 1, 2 ORDER BY shared_digests DESC, d1, d2 LIMIT 50)
SELECT s1.dataset_serial AS serial1, s2.dataset_serial AS serial2,
  shared_digests
FROM top JOIN data_set s1 ON d1 = s1.id JOIN data_set s2 ON d2 = s2.id
ORDER BY shared_digests DESC, serial1, serial2"""

  /** Twin of [[graft.ops.EventOps.eventsForecastEval]]: identical
    * integer regression moments, double slope/intercept, DECIMAL
    * held-out errors.
    */
  val eventsForecastEval: String = """
WITH daily AS (
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
    count(*) AS n
  FROM events GROUP BY 1, 2),
d0 AS (SELECT min(day) AS d0 FROM daily),
t AS (SELECT event_type, day - d0 AS t, n FROM daily, d0),
fit AS (
  SELECT event_type, count(*) AS k, sum(t) AS st, sum(n) AS sy,
    sum(t * n) AS sty, sum(t * t) AS stt
  FROM t WHERE t < 21 GROUP BY event_type
  HAVING count(*) >= 2),
fit2 AS (
  SELECT event_type, k AS n_train,
    CAST(k * sty - st * sy AS DOUBLE) / (k * stt - st * st) AS slope,
    st, sy, k
  FROM fit),
fit3 AS (
  SELECT event_type, n_train, slope,
    (sy - slope * st) / k AS intercept
  FROM fit2),
ev AS (
  SELECT t.event_type, n_train, slope, intercept,
    CAST(abs(n - (intercept + slope * t.t)) AS DECIMAL(20,10)) AS err
  FROM t JOIN fit3 USING (event_type) WHERE t.t >= 21)
SELECT event_type, CAST(n_train AS BIGINT) AS n_train,
  CAST(count(*) AS BIGINT) AS n_test,
  CAST(round(slope, 6) AS DOUBLE) AS slope,
  CAST(round(intercept, 4) AS DOUBLE) AS intercept,
  round(CAST(sum(err) AS DOUBLE) / count(*), 4) AS mae
FROM ev GROUP BY event_type, n_train, slope, intercept
ORDER BY event_type"""

  val imgLineageDepth: String =
    imagingCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """
, anc AS (
  SELECT id, id AS root, CAST(0 AS BIGINT) AS depth
  FROM data_set WHERE parent_id IS NULL
  UNION ALL
  SELECT c.id, a.root, a.depth + 1
  FROM data_set c JOIN anc a ON c.parent_id = a.id
)
SELECT d.dataset_serial, r.dataset_serial AS root_serial, a.depth
FROM anc a
JOIN data_set d ON a.id = d.id
JOIN data_set r ON a.root = r.id
WHERE a.depth > 0
ORDER BY d.dataset_serial"""

  val imgChannelOverlap: String = imagingCte + """
SELECT project, CAST(count(*) AS BIGINT) AS n_both FROM (
  SELECT split_part(d.dataset_serial, '-', 1) AS project
  FROM (
    SELECT frames_global_id FROM frames WHERE channel_name = 'DAPI'
    INTERSECT
    SELECT frames_global_id FROM frames WHERE channel_name = 'TxRed') b
  JOIN data_set d ON b.frames_global_id = d.id)
GROUP BY project
ORDER BY project"""

  val embPqCodes: String = """
WITH subq AS (
  SELECT vec_id, label, m.m AS m, embedding[m.m * 8 + 1 : m.m * 8 + 8] AS sub
  FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS m) m
), subc AS (
  SELECT vec_id AS cid, m.m AS m,
    embedding[m.m * 8 + 1 : m.m * 8 + 8] AS csub
  FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS m) m
  WHERE vec_id < 16
), scored AS (
  SELECT q.vec_id, q.label, q.m, c.cid,
    list_sum(list_transform(list_zip(q.sub, c.csub),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
  FROM subq q JOIN subc c ON q.m = c.m
), assigned AS (
  SELECT vec_id, label, m, cid FROM (
    SELECT vec_id, label, m, cid,
      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) AS rk
    FROM scored)
  WHERE rk = 1
)
SELECT label, m AS subspace, cid AS code,
  CAST(count(*) AS BIGINT) AS n_vecs
FROM assigned
GROUP BY label, m, cid
ORDER BY label, subspace, code"""

  val embKnnPq: String = """
WITH subq AS (
  SELECT vec_id, label, m.m AS m, embedding[m.m * 8 + 1 : m.m * 8 + 8] AS sub
  FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS m) m
), subc AS (
  SELECT vec_id AS cid, m.m AS m,
    embedding[m.m * 8 + 1 : m.m * 8 + 8] AS csub
  FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS m) m
  WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, m, cid FROM (
    SELECT q.vec_id, q.m, c.cid,
      row_number() OVER (PARTITION BY q.vec_id, q.m ORDER BY
        list_sum(list_transform(list_zip(q.sub, c.csub),
          p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
             * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), c.cid)
        AS rk
    FROM subq q JOIN subc c ON q.m = c.m)
  WHERE rk = 1
), dtab AS (
  SELECT q.vec_id AS qid, q.m, c.cid,
    list_sum(list_transform(list_zip(q.sub, c.csub),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
  FROM subq q JOIN subc c ON q.m = c.m
  WHERE q.vec_id < 10
), adc AS (
  SELECT d.qid, a.vec_id,
    CAST(round(sum(d.dist), 6) AS DOUBLE) AS adc_dist
  FROM assigned a JOIN dtab d ON a.m = d.m AND a.cid = d.cid
  WHERE d.qid <> a.vec_id
  GROUP BY d.qid, a.vec_id
)
SELECT qid, vec_id AS neighbor, adc_dist, rank FROM (
  SELECT qid, vec_id, adc_dist,
    CAST(row_number() OVER (
      PARTITION BY qid ORDER BY adc_dist, vec_id) AS BIGINT) AS rank
  FROM adc)
WHERE rank <= 5
ORDER BY qid, rank"""

  val qPercentiles: String = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
  quantile_cont(l_quantity, 0.5) AS p50_qty,
  quantile_cont(l_quantity, 0.9) AS p90_qty,
  quantile_cont(l_extendedprice, 0.99) AS p99_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag"""

  val imgStorageRollup: String = imagingCte + """
SELECT coalesce(project, 'ALL') AS project_g,
  coalesce(microscope, 'ALL') AS microscope_g,
  CAST(count(*) AS BIGINT) AS n_datasets,
  CAST(sum(nbr_frames) AS BIGINT) AS total_frames
FROM (
  SELECT split_part(d.dataset_serial, '-', 1) AS project,
    d.microscope, g.nbr_frames
  FROM frames_global g JOIN data_set d ON g.dataset_id = d.id)
GROUP BY ROLLUP(project, microscope)
ORDER BY project_g, microscope_g"""

  /** Twin of [[graft.ops.EventOps.eventsMarkovStationary]]: the same
    * lag-bigram matrix, P and v₀ cast from exact IEEE doubles to
    * DECIMAL(18,12) (half-up, engine-identical), and the 12 power
    * iterations UNROLLED as chained CTEs — each step's products and
    * sums are exact decimal arithmetic rounded back to 12 dp, so the
    * iterates match Spark's bit for bit.
    */
  val eventsMarkovStationary: String = {
    val iters = (1 to 12).map { k =>
      s"""v$k AS (
  SELECT p.dst AS src,
    CAST(round(sum(v.pi * p.p), 12) AS DECIMAL(18,12)) AS pi
  FROM v${k - 1} v JOIN pmat p ON v.src = p.src
  GROUP BY p.dst)"""
    }.mkString(",\n")
    s"""
WITH seq AS (
  SELECT event_type,
    lag(event_type) OVER (
      PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
      AS prev_type
  FROM events),
trans AS (
  SELECT prev_type AS src, event_type AS dst, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
totals AS (SELECT src, sum(n) AS tot FROM trans GROUP BY src),
pmat AS (
  SELECT t.src, t.dst,
    CAST(CAST(t.n AS DOUBLE) / tot AS DECIMAL(18,12)) AS p
  FROM trans t JOIN totals USING (src)),
nt AS (SELECT count(DISTINCT src) AS t FROM pmat),
v0 AS (
  SELECT DISTINCT src,
    CAST(CAST(1.0 AS DOUBLE) / (SELECT t FROM nt) AS DECIMAL(18,12))
      AS pi
  FROM pmat),
$iters
SELECT v.src AS event_type, CAST(tot AS BIGINT) AS n_out,
  round(CAST(v.pi AS DOUBLE), 10) AS pi
FROM v12 v JOIN totals ON totals.src = v.src
ORDER BY event_type"""
  }

  val eventsTransitions: String = """
SELECT prev_type, curr_type, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT lag(event_type) OVER (
      PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_type,
    event_type AS curr_type
  FROM events)
WHERE prev_type IS NOT NULL
GROUP BY prev_type, curr_type
ORDER BY prev_type, curr_type"""

  val docZipf: String = """
SELECT rank, tok, n FROM (
  SELECT tok, n,
    CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rank
  FROM (
    SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
        x -> x <> '')) AS tok
      FROM documents)
    GROUP BY tok))
WHERE rank <= 50
ORDER BY rank"""

  val eventsDauWau: String = """
WITH active AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
  FROM events
), span AS (
  SELECT min(day) AS d0, max(day) AS d1 FROM active
), dau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM active GROUP BY day
), wau AS (
  SELECT c.cover AS day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
  FROM active a, span s,
    LATERAL (SELECT unnest(range(a.day, least(a.day + 7, s.d1 + 1)))
      AS cover) c
  WHERE c.cover >= s.d0 + 6
  GROUP BY c.cover
)
SELECT d.day, d.dau, w.wau,
  CAST(round(d.dau * 100.0 / w.wau, 2) AS DOUBLE) AS stickiness_pct
FROM dau d JOIN wau w ON d.day = w.day
ORDER BY d.day"""

  val eventsResample: String = """
WITH daily AS (
  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM events WHERE user_id < 20
  GROUP BY user_id, day
), span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1
  FROM daily GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM span
)
SELECT g.user_id, g.day,
  coalesce(d.n, 0) AS n,
  coalesce(d.sum_value, 0.0) AS sum_value,
  last_value(CASE WHEN d.n IS NOT NULL THEN g.day END IGNORE NULLS)
    OVER (PARTITION BY g.user_id ORDER BY g.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS last_seen_day
FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
ORDER BY g.user_id, g.day"""

  val eventsFunnel: String = """
SELECT CAST(count(tv) AS BIGINT) AS n_view,
  CAST(count(*) FILTER (WHERE tc > tv) AS BIGINT) AS n_view_click,
  CAST(count(*) FILTER (WHERE tc > tv AND tp > tc) AS BIGINT)
    AS n_full_funnel
FROM (
  SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS tv,
    min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS tc,
    min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS tp
  FROM events GROUP BY user_id)"""

  /** Windowed-funnel twin of
    * [[graft.ops.EventOps.eventsWindowFunnel]]: identical 24 h
    * step-window joins on exact epoch-nanos, depth census over the
    * distinct-user base.
    */
  val eventsWindowFunnel: String = """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (
  SELECT user_id, min(epoch_ns(ts)) AS tv FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS tc
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click'
    AND epoch_ns(e.ts) > v.tv
    AND epoch_ns(e.ts) <= v.tv + 86400000000000
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS tp
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_ns(e.ts) > c.tc
    AND epoch_ns(e.ts) <= c.tc + 86400000000000
  GROUP BY e.user_id)
SELECT funnel_depth, CAST(count(*) AS BIGINT) AS n_users FROM (
  SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
              WHEN c.user_id IS NOT NULL THEN 2
              WHEN v.user_id IS NOT NULL THEN 1
              ELSE 0 END AS funnel_depth
  FROM u
  LEFT JOIN v ON u.user_id = v.user_id
  LEFT JOIN c ON u.user_id = c.user_id
  LEFT JOIN p ON u.user_id = p.user_id)
GROUP BY funnel_depth
ORDER BY funnel_depth"""

  val eventsRetention: String = """
WITH ev AS (
  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM ev e JOIN cohort c ON e.user_id = c.user_id
WHERE e.day - c.cohort_day <= 7
GROUP BY 1, 2
ORDER BY 1, 2"""

  val eventsDropoff: String = """
WITH ev AS (
  SELECT user_id, event_type,
    epoch_ns(ts) // 86400000000000 AS day FROM events)
SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_views
FROM ev v
WHERE event_type = 'view'
  AND NOT EXISTS (
    SELECT 1 FROM ev b WHERE b.event_type = 'purchase'
      AND b.user_id = v.user_id AND b.day = v.day)
GROUP BY user_id, day
ORDER BY user_id, day"""

  val imgChannelPivot: String = imagingCte + """
SELECT d.dataset_serial,
  CAST(count(*) FILTER (WHERE channel_name = 'DAPI') AS BIGINT) AS n_dapi,
  CAST(count(*) FILTER (WHERE channel_name = 'GFP') AS BIGINT) AS n_gfp,
  CAST(count(*) FILTER (WHERE channel_name = 'Cy3') AS BIGINT) AS n_cy3,
  CAST(count(*) FILTER (WHERE channel_name = 'TxRed') AS BIGINT) AS n_txred
FROM frames f JOIN data_set d ON f.frames_global_id = d.id
GROUP BY d.dataset_serial
ORDER BY d.dataset_serial"""

  val docStratifiedSample: String = """
SELECT doc_id, source, rn
FROM (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
    count(*) OVER (PARTITION BY source) AS n_src
  FROM documents)
WHERE rn <= ceil(n_src * 0.1)
ORDER BY doc_id"""

  val docLenHistogram: String = """
SELECT least(n_chars // 50, 11) AS bucket,
  least(n_chars // 50, 11) * 50 AS lo_chars,
  CAST(count(*) AS BIGINT) AS n_docs,
  min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents
GROUP BY 1
ORDER BY 1"""

  val docTfidf: String = """
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
    CAST(round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS DOUBLE)
      AS tfidf
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
)
SELECT doc_id, rnk, tok, tf, df, tfidf FROM (
  SELECT doc_id, tok, tf, df, tfidf,
    CAST(row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS BIGINT) AS rnk
  FROM scored)
WHERE rnk <= 5
ORDER BY doc_id, rnk"""

  val docQualityGate: String = """
WITH feats AS (
  SELECT source,
    CAST(len(list_filter(string_split(lower(text), ' '),
      x -> x <> '')) AS BIGINT) AS n_tokens,
    CAST(len(list_filter(string_split(lower(text), ' '),
      x -> x = 'the' OR x = 'a')) AS BIGINT) AS stop_n,
    n_chars
  FROM documents
), flagged AS (
  SELECT source,
    CAST(n_chars < 100 AS INT) AS flag_short,
    CAST(n_tokens < 20 AS INT) AS flag_few,
    CAST(stop_n * 2 > n_tokens AS INT) AS flag_stop
  FROM feats
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN flag_short = 0 AND flag_few = 0 AND flag_stop = 0
    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
  CAST(sum(flag_short) AS BIGINT) AS n_short,
  CAST(sum(flag_few) AS BIGINT) AS n_few_tokens,
  CAST(sum(flag_stop) AS BIGINT) AS n_stopword_heavy
FROM flagged
GROUP BY source
ORDER BY source"""

  val docTopPerSource: String = """
SELECT source, rnk, doc_id, n_chars
FROM (
  SELECT source, doc_id, n_chars,
    row_number() OVER (
      PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents)
WHERE rnk <= 3
ORDER BY source, rnk"""

  /** True-SMS-parser twin of
    * [[graft.imaging.ImagingOps.parseSmsChannel]]: same synthesized
    * names, same tail-token matching, same first-seen channel ranking.
    */
  val imgParseSmsChannel: String = imagingCte + """
, sms AS (
  SELECT frames_global_id AS ds_id, id, slice_idx, time_idx, pos_idx,
    CASE channel_idx WHEN 0 THEN 'DAPI' WHEN 1 THEN 'GFP_high'
         WHEN 2 THEN 'Cy3' ELSE 'Tx_Red' END AS sms_channel,
    concat('t', lpad(CAST(time_idx AS VARCHAR), 3, '0')) AS tt,
    concat('p', lpad(CAST(pos_idx AS VARCHAR), 3, '0')) AS pt,
    concat('z', lpad(CAST(slice_idx AS VARCHAR), 3, '0')) AS zt
  FROM frames WHERE frames_global_id % 25 = 0
), named AS (
  SELECT ds_id, slice_idx, time_idx, pos_idx,
    concat('img_', sms_channel, '_',
      CASE CAST(id % 3 AS INT)
        WHEN 0 THEN concat(tt, '_', pt, '_', zt)
        WHEN 1 THEN concat(zt, '_', tt, '_', pt)
        ELSE concat(pt, '_', zt, '_', tt) END, '.tif') AS file_name
  FROM sms
), parsed AS (
  SELECT ds_id, file_name, slice_idx, time_idx, pos_idx,
    string_split(substr(file_name, 1, length(file_name) - 4), '_')[2:]
      AS parts
  FROM named
), fields AS (
  SELECT ds_id, file_name, slice_idx, time_idx, pos_idx,
    array_to_string(parts[1:len(parts) - 3], '_') AS channel_parsed,
    parts[len(parts) - 2] AS l1, parts[len(parts) - 1] AS l2,
    parts[len(parts)] AS l3
  FROM parsed
), got AS (
  SELECT ds_id, file_name, channel_parsed,
    CAST(substr(CASE WHEN left(l1, 1) = 't' AND length(l1) = 4 THEN l1
                     WHEN left(l2, 1) = 't' AND length(l2) = 4 THEN l2
                     WHEN left(l3, 1) = 't' AND length(l3) = 4 THEN l3
                END, 2) AS INT) AS time_parsed,
    CAST(substr(CASE WHEN left(l1, 1) = 'p' AND length(l1) = 4 THEN l1
                     WHEN left(l2, 1) = 'p' AND length(l2) = 4 THEN l2
                     WHEN left(l3, 1) = 'p' AND length(l3) = 4 THEN l3
                END, 2) AS INT) AS pos_parsed,
    CAST(substr(CASE WHEN left(l1, 1) = 'z' AND length(l1) = 4 THEN l1
                     WHEN left(l2, 1) = 'z' AND length(l2) = 4 THEN l2
                     WHEN left(l3, 1) = 'z' AND length(l3) = 4 THEN l3
                END, 2) AS INT) AS slice_parsed,
    slice_idx, time_idx, pos_idx
  FROM fields
), census AS (
  SELECT ds_id, channel_parsed, min(file_name) AS first_file
  FROM got GROUP BY 1, 2
), ranked AS (
  SELECT ds_id, channel_parsed,
    CAST(dense_rank() OVER (PARTITION BY ds_id ORDER BY first_file) - 1
      AS INT) AS channel_idx_assigned
  FROM census
)
SELECT g.ds_id, g.file_name, g.channel_parsed, r.channel_idx_assigned,
  g.time_parsed, g.pos_parsed, g.slice_parsed,
  CAST(g.time_parsed = g.time_idx AND g.pos_parsed = g.pos_idx
    AND g.slice_parsed = g.slice_idx AS INT) AS consistent
FROM got g JOIN ranked r ON g.ds_id = r.ds_id
  AND g.channel_parsed = r.channel_parsed
ORDER BY g.ds_id, g.file_name"""

  /** Conformance-audit twin of
    * [[graft.imaging.ImagingOps.metaValidate]]: DuckDB uses its real
    * JSON type introspection (json_type) where Spark detects the
    * quoted-string shape on the compact generated JSON — both must
    * agree violation for violation.
    */
  val imgMetaValidate: String = imagingCte + """
, audit AS (
  SELECT frames_global_id,
    (CASE WHEN json_extract(metadata_json,
        '$.MicroManagerMetadata.ChannelIndex') IS NULL THEN 1 ELSE 0 END
     + CASE WHEN json_extract(metadata_json,
        '$.MicroManagerMetadata.Slice') IS NULL THEN 1 ELSE 0 END
     + CASE WHEN json_extract(metadata_json,
        '$.MicroManagerMetadata.FrameIndex') IS NULL THEN 1 ELSE 0 END
     + CASE WHEN json_extract(metadata_json,
        '$.MicroManagerMetadata.PositionIndex') IS NULL THEN 1 ELSE 0 END
     + CASE WHEN json_extract(metadata_json,
        '$.MicroManagerMetadata.Channel') IS NULL THEN 1 ELSE 0 END) AS nm,
    (CASE WHEN json_type(metadata_json,
        '$.MicroManagerMetadata.ChannelIndex') = 'VARCHAR' THEN 1 ELSE 0 END
     + CASE WHEN json_type(metadata_json,
        '$.MicroManagerMetadata.Slice') = 'VARCHAR' THEN 1 ELSE 0 END
     + CASE WHEN json_type(metadata_json,
        '$.MicroManagerMetadata.FrameIndex') = 'VARCHAR' THEN 1 ELSE 0 END
     + CASE WHEN json_type(metadata_json,
        '$.MicroManagerMetadata.PositionIndex') = 'VARCHAR' THEN 1 ELSE 0 END
     + CASE WHEN json_type(metadata_json,
          '$.MicroManagerMetadata.Channel') IS NOT NULL
        AND json_type(metadata_json,
          '$.MicroManagerMetadata.Channel') <> 'VARCHAR'
        THEN 1 ELSE 0 END) AS nb
  FROM frames
)
SELECT d.dataset_serial,
  CAST(count(*) AS BIGINT) AS n_frames,
  CAST(sum(CASE WHEN a.nm > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_missing_key,
  CAST(sum(CASE WHEN a.nb > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_type_mismatch,
  CAST(sum(CASE WHEN a.nm = 0 AND a.nb = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_valid
FROM audit a JOIN data_set d ON a.frames_global_id = d.id
GROUP BY d.dataset_serial
ORDER BY d.dataset_serial"""

  /** Decontamination twin of
    * [[graft.ops.DedupOps.decontaminate]]: same shingle derivation as
    * the dedup oracles, eval set = doc_id < 10.
    */
  val docDecontaminate: String = """
WITH shd AS (
  SELECT doc_id, source,
    list_distinct(CASE WHEN len(toks) >= 3 THEN
      list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      ELSE [text] END) AS shset
  FROM (
    SELECT doc_id, text, source,
      list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM documents)
), ev AS (
  SELECT DISTINCT unnest(shset) AS sh FROM shd WHERE doc_id < 10
), tr AS (
  SELECT doc_id, source, unnest(shset) AS sh FROM shd WHERE doc_id >= 10
), hits AS (
  SELECT t.doc_id, t.source, count(*) AS n_hits
  FROM tr t JOIN ev ON t.sh = ev.sh
  GROUP BY t.doc_id, t.source
), agg AS (
  SELECT source, count(*) AS n_contaminated, sum(n_hits) AS sum_hits
  FROM hits GROUP BY source
)
SELECT p.source, p.n_docs,
  CAST(coalesce(a.n_contaminated, 0) AS BIGINT) AS n_contaminated,
  CAST(coalesce(a.sum_hits, 0) AS BIGINT) AS sum_hits
FROM (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents WHERE doc_id >= 10 GROUP BY source) p
LEFT JOIN agg a ON p.source = a.source
ORDER BY p.source"""

  /** Lloyd-step twin of [[graft.ops.VectorOps.kmeansStep]]. Floats
    * expand through DOUBLE before the DECIMAL cast (a direct
    * REAL→DECIMAL cast goes through the shortest repr and diverges
    * from Spark); the two unnests in `comps` zip positionally.
    */
  val embKmeansStep: String = """
WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16
), scored AS (
  SELECT e.vec_id, c.cid, e.embedding,
    list_sum(list_transform(list_zip(e.embedding, c.cv),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
  FROM embeddings e CROSS JOIN c
), assigned AS (
  SELECT cid, embedding FROM (
    SELECT cid, embedding,
      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM scored)
  WHERE rk = 1
), comps AS (
  SELECT cid, unnest(range(len(embedding))) AS dim,
    unnest(embedding) AS v
  FROM assigned
)
SELECT cid, CAST(dim AS INT) AS dim,
  CAST(count(*) AS BIGINT) AS n_members,
  round(CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE)
    / count(*), 6) AS centroid_val
FROM comps GROUP BY cid, dim
ORDER BY cid, dim"""

  /** Volume-anomaly twin of [[graft.ops.EventOps.eventsAnomaly]]:
    * identical double expression tree over exact integer moments.
    */
  val eventsAnomaly: String = """
WITH daily AS (
  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
    CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(n) AS BIGINT) AS sum_n, CAST(sum(n * n) AS BIGINT) AS sum_n2
  FROM daily GROUP BY event_type
  HAVING count(*) > 1
), zed AS (
  SELECT d.event_type, d.day, d.n,
    CASE WHEN (CAST(s.sum_n2 AS DOUBLE)
        - s.n_days * (CAST(s.sum_n AS DOUBLE) / s.n_days)
                   * (CAST(s.sum_n AS DOUBLE) / s.n_days))
        / (s.n_days - 1) <= 0
      THEN 0.0
      ELSE round((d.n - CAST(s.sum_n AS DOUBLE) / s.n_days)
        / sqrt((CAST(s.sum_n2 AS DOUBLE)
            - s.n_days * (CAST(s.sum_n AS DOUBLE) / s.n_days)
                       * (CAST(s.sum_n AS DOUBLE) / s.n_days))
            / (s.n_days - 1)), 4) END AS z
  FROM daily d JOIN stats s ON d.event_type = s.event_type
)
SELECT event_type, day, n, z, CAST(abs(z) > 2 AS INT) AS is_anomaly
FROM zed
ORDER BY event_type, day"""

  /** Repetition-filter twin of [[graft.ops.TextOps.repetition]]. */
  val docRepetition: String = """
WITH d AS (
  SELECT doc_id, source,
    list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
  FROM documents
), feat AS (
  SELECT doc_id, source,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n3_total,
    CASE WHEN len(toks) >= 3 THEN CAST(len(list_distinct(
        list_transform(range(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
        AS BIGINT)
      ELSE 0 END AS n3_distinct
  FROM d
), frac AS (
  SELECT doc_id, source, n_tokens,
    CASE WHEN n3_total > 0
      THEN round(1.0 - CAST(n3_distinct AS DOUBLE) / n3_total, 4)
      ELSE 0.0 END AS dup3_frac
  FROM feat
), top AS (
  SELECT doc_id, max(c) AS max_tok FROM (
    SELECT doc_id, tok, count(*) AS c FROM (
      SELECT doc_id, unnest(toks) AS tok FROM d)
    GROUP BY doc_id, tok)
  GROUP BY doc_id
), perdoc AS (
  SELECT f.source, f.dup3_frac,
    CASE WHEN f.n_tokens > 0
      THEN round(CAST(coalesce(t.max_tok, 0) AS DOUBLE) / f.n_tokens, 4)
      ELSE 0.0 END AS toptok_frac
  FROM frac f LEFT JOIN top t ON f.doc_id = t.doc_id
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN dup3_frac > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_rep_3gram,
  CAST(sum(CASE WHEN toptok_frac > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_rep_token,
  round(CAST(sum(CAST(dup3_frac AS DECIMAL(14,4))) AS DOUBLE)
    / count(*), 4) AS avg_dup3,
  round(CAST(sum(CAST(toptok_frac AS DECIMAL(14,4))) AS DOUBLE)
    / count(*), 4) AS avg_toptok
FROM perdoc
GROUP BY source
ORDER BY source"""

  /** Pixel-exact twin of
    * [[graft.multimodal.BinaryFrames.payloadStats]]: the planted 8×8
    * frame pixels are unhex(sha256)×2, PNG losslessness guarantees the
    * Spark side decodes those exact values back, so every pixel is
    * recomputed here from the hex string with strpos integer
    * arithmetic — the oracle never needs to touch a PNG byte.
    */
  /** Drift twin of [[graft.multimodal.BinaryFrames.intensityDrift]]:
    * per-(dataset, time) means from the planted hex bytes (each byte
    * appears twice in the 8×8 frame), drift between two ROUNDED
    * means — the oracle never sees a PNG byte.
    */
  val imgIntensityDrift: String = imagingCte + """
, pb AS (
  SELECT frames_global_id AS dataset_id,
    CAST((id % 10) - 1 AS INT) AS time_idx,
    list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
      AS px
  FROM frames
), bt AS (
  SELECT d.dataset_serial, time_idx,
    CAST(count(*) AS BIGINT) AS n_frames,
    round(CAST(sum(2 * list_sum(px)) AS DOUBLE) / sum(64), 6) AS mean_px
  FROM pb JOIN data_set d ON pb.dataset_id = d.id
  GROUP BY d.dataset_serial, time_idx
), t0 AS (
  SELECT dataset_serial, mean_px AS mean_t0 FROM bt WHERE time_idx = 0)
SELECT b.dataset_serial, b.time_idx, b.n_frames, b.mean_px,
  round((b.mean_px - t.mean_t0) * 100.0 / t.mean_t0, 4) AS drift_pct
FROM bt b JOIN t0 t ON b.dataset_serial = t.dataset_serial
ORDER BY b.dataset_serial, b.time_idx"""

  /** Focus twin of [[graft.multimodal.BinaryFrames.focusRank]]:
    * variance from the exact integer moments of the planted bytes,
    * rounded before the per-dataset rank.
    */
  val imgFocusRank: String = imagingCte + """
, pb AS (
  SELECT frames_global_id AS dataset_id, id AS frame_id,
    list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
      AS px
  FROM frames
), fv AS (
  SELECT d.dataset_serial, frame_id,
    round(CAST(2 * list_sum(list_transform(px, x -> x * x)) AS DOUBLE) / 64
      - (CAST(2 * list_sum(px) AS DOUBLE) / 64)
      * (CAST(2 * list_sum(px) AS DOUBLE) / 64), 6) AS variance
  FROM pb JOIN data_set d ON pb.dataset_id = d.id
)
SELECT dataset_serial, rank, frame_id, variance FROM (
  SELECT dataset_serial, frame_id, variance,
    CAST(row_number() OVER (PARTITION BY dataset_serial
      ORDER BY variance, frame_id) AS BIGINT) AS rank
  FROM fv)
WHERE rank <= 5
ORDER BY dataset_serial, rank"""

  /** Cross-talk twin of
    * [[graft.multimodal.BinaryFrames.channelCrosstalk]]: channel
    * moments as exact integer sums over the planted transforms
    * (R = raw byte, G = 255−raw, B = (3·raw+7) mod 256, each byte
    * twice), one double correlation formula at the end.
    */
  val imgChannelCrosstalk: String = imagingCte + """
, pb AS (
  SELECT frames_global_id AS dataset_id,
    list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
      AS px
  FROM frames
), fm AS (
  SELECT dataset_id, 64 AS n,
    2 * list_sum(px) AS sr,
    2 * list_sum(list_transform(px, x -> 255 - x)) AS sg,
    2 * list_sum(list_transform(px, x -> (3 * x + 7) % 256)) AS sb,
    2 * list_sum(list_transform(px, x -> x * x)) AS srr,
    2 * list_sum(list_transform(px, x -> (255 - x) * (255 - x))) AS sgg,
    2 * list_sum(list_transform(px,
      x -> ((3 * x + 7) % 256) * ((3 * x + 7) % 256))) AS sbb,
    2 * list_sum(list_transform(px, x -> x * (255 - x))) AS srg,
    2 * list_sum(list_transform(px,
      x -> (255 - x) * ((3 * x + 7) % 256))) AS sgb,
    2 * list_sum(list_transform(px, x -> x * ((3 * x + 7) % 256))) AS srb
  FROM pb
), ag AS (
  SELECT d.dataset_serial, CAST(count(*) AS BIGINT) AS n_frames,
    sum(n) AS n, sum(sr) AS sr, sum(sg) AS sg, sum(sb) AS sb,
    sum(srr) AS srr, sum(sgg) AS sgg, sum(sbb) AS sbb,
    sum(srg) AS srg, sum(sgb) AS sgb, sum(srb) AS srb
  FROM fm JOIN data_set d ON fm.dataset_id = d.id
  GROUP BY d.dataset_serial
)
SELECT dataset_serial, n_frames,
  round(CAST(n * srg - sr * sg AS DOUBLE)
    / (sqrt(CAST(n * srr - sr * sr AS DOUBLE))
     * sqrt(CAST(n * sgg - sg * sg AS DOUBLE))), 6) AS corr_rg,
  round(CAST(n * sgb - sg * sb AS DOUBLE)
    / (sqrt(CAST(n * sgg - sg * sg AS DOUBLE))
     * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6) AS corr_gb,
  round(CAST(n * srb - sr * sb AS DOUBLE)
    / (sqrt(CAST(n * srr - sr * sr AS DOUBLE))
     * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6) AS corr_rb
FROM ag
ORDER BY dataset_serial"""

  val imgPayloadStats: String = imagingCte + """
, pb AS (
  SELECT frames_global_id AS dataset_id,
    list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
      AS px
  FROM frames
)
SELECT d.dataset_serial,
  CAST(count(*) AS BIGINT) AS n_frames,
  CAST(sum(64) AS BIGINT) AS total_px,
  CAST(sum(2 * list_sum(px)) AS BIGINT) AS sum_px_values,
  CAST(max(list_max(px)) AS INT) AS max_px
FROM pb JOIN data_set d ON pb.dataset_id = d.id
GROUP BY d.dataset_serial
ORDER BY d.dataset_serial"""

  /** Per-channel twin of [[imgPayloadStats]] for the RGB payload path
    * ([[graft.multimodal.BinaryFrames.payloadStatsRgb]]): the planted
    * interleaved channels are R = raw sha byte, G = 255−raw,
    * B = (3·raw+7) mod 256, each byte used twice per channel (64 px
    * from 32 bytes), so every channel statistic is integer arithmetic
    * over the hex string — the oracle never sees a PNG byte, and a
    * channel-order/stride bug on the Spark side cannot hash-match.
    */
  val imgPayloadStatsRgb: String = imagingCte + """
, pb AS (
  SELECT frames_global_id AS dataset_id,
    list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
      AS px
  FROM frames
)
SELECT d.dataset_serial,
  CAST(count(*) AS BIGINT) AS n_frames,
  CAST(sum(64) AS BIGINT) AS total_px,
  CAST(sum(2 * list_sum(px)) AS BIGINT) AS sum_r_values,
  CAST(sum(2 * list_sum(list_transform(px, v -> 255 - v))) AS BIGINT)
    AS sum_g_values,
  CAST(sum(2 * list_sum(list_transform(px, v -> (3 * v + 7) % 256)))
    AS BIGINT) AS sum_b_values,
  CAST(max(list_max(px)) AS INT) AS max_r,
  CAST(max(list_max(list_transform(px, v -> 255 - v))) AS INT) AS max_g,
  CAST(max(list_max(list_transform(px, v -> (3 * v + 7) % 256))) AS INT)
    AS max_b
FROM pb JOIN data_set d ON pb.dataset_id = d.id
GROUP BY d.dataset_serial
ORDER BY d.dataset_serial"""

  /** Hex-arithmetic twin of
    * [[graft.multimodal.BinaryFrames.pixelHistogram]]: the planted
    * pixels are the 32 sha bytes each used twice, so every bin count
    * is `2 * count` over the hex-decoded list — no PNG byte is ever
    * decoded on the oracle side. Zero bins are absent on both engines.
    */
  val imgPixelHistogram: String = imagingCte + """
, pb AS (
  SELECT frames_global_id AS dataset_id,
    list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
      AS px
  FROM frames
), pxv AS (
  SELECT dataset_id, unnest(px) AS v FROM pb
), bins AS (
  SELECT d.dataset_serial, CAST(v // 16 AS INT) AS bin,
    CAST(2 * count(*) AS BIGINT) AS n_px
  FROM pxv JOIN data_set d ON pxv.dataset_id = d.id
  GROUP BY d.dataset_serial, v // 16
)
SELECT dataset_serial, bin, n_px,
  round(CAST(n_px AS DOUBLE)
    / sum(n_px) OVER (PARTITION BY dataset_serial), 6) AS pct
FROM bins
ORDER BY dataset_serial, bin"""

  /** Twin of [[graft.sources.FrameStats.datasetQcSummary]]: the same
    * planted-pixel hex arithmetic as [[imgPayloadStats]] /
    * [[imgSaturation]] / [[imgPixelHistogram]], rolled into the
    * five-metric per-dataset summary — exact integer moments, one
    * IEEE-double division per metric at the edge, entropy terms
    * DECIMAL-cast per bin (order-independent exact sum).
    */
  val imgDatasetQcSummary: String = imagingCte + """
, pb AS (
  SELECT frames_global_id AS dataset_id,
    list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
      AS px
  FROM frames
), ds AS (
  SELECT dataset_id,
    count(*) AS n_frames,
    sum(64) AS tot,
    sum(2 * list_sum(px)) AS s,
    sum(2 * list_sum(list_transform(px, v -> v * v))) AS ss,
    sum(2 * len(list_filter(px, v -> v >= 240))) AS nsat,
    sum(2 * len(list_filter(px, v -> v < 16))) AS ndark
  FROM pb GROUP BY dataset_id
), bins AS (
  SELECT dataset_id, v // 16 AS bin, 2 * count(*) AS nb
  FROM (SELECT dataset_id, unnest(px) AS v FROM pb)
  GROUP BY 1, 2
), entt AS (
  SELECT b.dataset_id,
    sum(CAST((CAST(nb AS DOUBLE) / ds.tot)
      * ln(CAST(nb AS DOUBLE) / ds.tot) AS DECIMAL(30,10))) AS esum
  FROM bins b JOIN ds ON b.dataset_id = ds.dataset_id
  GROUP BY b.dataset_id
)
SELECT d.dataset_serial,
  CAST(ds.n_frames AS BIGINT) AS n_frames,
  CAST(ds.tot AS BIGINT) AS total_px,
  round(CAST(ds.s AS DOUBLE) / ds.tot, 6) AS mean_px,
  round(CAST(ds.ss AS DOUBLE) / ds.tot
    - (CAST(ds.s AS DOUBLE) / ds.tot)
      * (CAST(ds.s AS DOUBLE) / ds.tot), 6) AS var_px,
  round(CAST(ds.nsat AS DOUBLE) / ds.tot, 6) AS sat_pct,
  round(CAST(ds.ndark AS DOUBLE) / ds.tot, 6) AS dark_pct,
  round(CAST(-entt.esum AS DOUBLE), 6) AS entropy_nats
FROM ds
JOIN entt ON entt.dataset_id = ds.dataset_id
JOIN data_set d ON ds.dataset_id = d.id
ORDER BY d.dataset_serial"""

  /** Hex-arithmetic twin of
    * [[graft.multimodal.BinaryFrames.saturationQc]] — top decode bin
    * [240,255] and bottom bin [0,15] counted straight off the sha
    * bytes (each byte twice), fractions rounded identically.
    */
  val imgSaturation: String = imagingCte + """
, pb AS (
  SELECT frames_global_id AS dataset_id,
    list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
      AS px
  FROM frames
)
SELECT d.dataset_serial,
  CAST(count(*) AS BIGINT) AS n_frames,
  CAST(sum(64) AS BIGINT) AS total_px,
  CAST(sum(2 * len(list_filter(px, v -> v >= 240))) AS BIGINT) AS n_sat,
  CAST(sum(2 * len(list_filter(px, v -> v < 16))) AS BIGINT) AS n_dark,
  round(CAST(sum(2 * len(list_filter(px, v -> v >= 240))) AS DOUBLE)
    / sum(64), 6) AS sat_pct,
  round(CAST(sum(2 * len(list_filter(px, v -> v < 16))) AS DOUBLE)
    / sum(64), 6) AS dark_pct
FROM pb JOIN data_set d ON pb.dataset_id = d.id
GROUP BY d.dataset_serial
ORDER BY d.dataset_serial"""

  /** Twin of [[graft.multimodal.BinaryAudio.waveformStats]]: the
    * planted PCM16 samples are s_i = ((b(i mod 32)·257 + i·131) mod
    * 65536) − 32768 over the hex-decoded sha bytes — every moment is
    * integer arithmetic on the hex string, no WAV byte decoded.
    */
  val audWaveformStats: String = imagingCte + """
, pb AS (
  SELECT frames_global_id AS dataset_id,
    list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
      AS bv
  FROM frames
), smp AS (
  SELECT dataset_id,
    list_transform(range(0, 256),
      i -> ((bv[(i % 32) + 1] * 257 + i * 131) % 65536) - 32768) AS s
  FROM pb
)
SELECT d.dataset_serial,
  CAST(count(*) AS BIGINT) AS n_clips,
  CAST(sum(256) AS BIGINT) AS total_samples,
  round(sqrt(CAST(sum(list_sum(list_transform(s, x -> x * x)))
    AS DOUBLE) / sum(256)), 4) AS rms,
  CAST(max(list_max(list_transform(s, x -> abs(x)))) AS INT) AS peak,
  round(CAST(sum(len(list_filter(s, x -> abs(x) >= 32700))) AS DOUBLE)
    / sum(256), 6) AS clip_pct
FROM smp JOIN data_set d ON smp.dataset_id = d.id
GROUP BY d.dataset_serial
ORDER BY d.dataset_serial"""

  /** Twin of [[graft.multimodal.BinaryFrames.keyframes]]: the
    * [[vidSceneCuts]] series window and jump rule, a running cut
    * count as the segment id, per-segment sharpest frame by
    * (rounded variance DESC, id) — [[imgFocusRank]]'s variance
    * expression verbatim.
    */
  val vidKeyframes: String = imagingCte + """
, pb AS (
  SELECT id, frames_global_id AS dataset_id, channel_idx AS c,
    slice_idx AS z, time_idx AS t, pos_idx AS p,
    CAST(2 * list_sum(px) AS DOUBLE) / 64 AS mean_px,
    round(CAST(2 * list_sum(list_transform(px, x -> x * x)) AS DOUBLE)
        / 64
      - (CAST(2 * list_sum(px) AS DOUBLE) / 64)
      * (CAST(2 * list_sum(px) AS DOUBLE) / 64), 6) AS variance
  FROM (
    SELECT id, frames_global_id, channel_idx, slice_idx, time_idx,
      pos_idx,
      list_transform(range(0, 32),
        i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1)
           * 16
           + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
        AS px
    FROM frames)
), lagged AS (
  SELECT *, lag(mean_px) OVER (PARTITION BY dataset_id, c, z, p
    ORDER BY t, id, mean_px) AS prev
  FROM pb
), segd AS (
  SELECT *, sum(CASE WHEN prev IS NOT NULL
      AND abs(mean_px - prev) > 25.0 THEN 1 ELSE 0 END)
    OVER (PARTITION BY dataset_id, c, z, p ORDER BY t, id, mean_px
      ROWS UNBOUNDED PRECEDING) AS seg
  FROM lagged
), ranked AS (
  SELECT dataset_id, c, z, p, seg, id, variance,
    CAST(count(*) OVER w AS BIGINT) AS n_frames,
    row_number() OVER (PARTITION BY dataset_id, c, z, p, seg
      ORDER BY variance DESC, id) AS rk
  FROM segd
  WINDOW w AS (PARTITION BY dataset_id, c, z, p, seg)
)
SELECT d.dataset_serial, c, z, p, CAST(seg AS BIGINT) AS seg,
  n_frames, ranked.id AS keyframe_id,
  CAST(variance AS DOUBLE) AS variance
FROM ranked JOIN data_set d ON ranked.dataset_id = d.id
WHERE rk = 1
ORDER BY d.dataset_serial, c, z, p, seg"""

  /** Twin of [[graft.multimodal.BinaryAudio.activityWindows]]: the
    * same sha-derived sample expansion as [[audWaveformStats]], framed
    * into 8×32-sample windows; quiet = window Σs²·8 strictly below the
    * clip total (below-mean), per-clip dynamic range summed as exact
    * DECIMAL before the dataset mean.
    */
  val audActivityWindows: String = imagingCte + """
, pb AS (
  SELECT frames_global_id AS dataset_id,
    list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
      AS bv
  FROM frames
), smp AS (
  SELECT dataset_id,
    list_transform(range(0, 256),
      i -> ((bv[(i % 32) + 1] * 257 + i * 131) % 65536) - 32768) AS s
  FROM pb
), win AS (
  SELECT dataset_id,
    list_transform(range(0, 8),
      j -> list_sum(list_transform(range(0, 32),
        i -> CAST(s[j*32 + i + 1] AS BIGINT) * s[j*32 + i + 1]))) AS w,
    list_sum(list_transform(s, x -> CAST(x AS BIGINT))) AS sum_s
  FROM smp
), clip AS (
  SELECT dataset_id, sum_s,
    list_min(w) AS wmin, list_max(w) AS wmax,
    len(list_filter(w, x -> x * 8 < list_sum(w))) AS n_quiet
  FROM win
)
SELECT d.dataset_serial,
  CAST(count(*) AS BIGINT) AS n_clips,
  CAST(count(*) * 8 AS BIGINT) AS n_windows,
  CAST(sum(n_quiet) AS BIGINT) AS n_quiet,
  round(CAST(sum(n_quiet) AS DOUBLE) / (count(*) * 8), 6) AS quiet_pct,
  round(CAST(sum(CAST(sqrt(CAST(wmax AS DOUBLE) / greatest(wmin, 1))
    AS DECIMAL(28,12))) AS DOUBLE) / count(*), 4) AS avg_dyn_range,
  round(CAST(sum(sum_s) AS DOUBLE) / (count(*) * 256), 4) AS dc_offset
FROM clip JOIN data_set d ON clip.dataset_id = d.id
GROUP BY d.dataset_serial
ORDER BY d.dataset_serial"""

  /** Twin of [[graft.streaming.ImgStream.statsDriftFor]]: the arrival
    * waves are `batch = frame id % 3` by construction, each frame's
    * 64 gray pixels are the 32 sha bytes used twice, so per-(dataset,
    * batch) means and the cumulative prior-batch window are pure
    * integer/window arithmetic over the hex string — identical
    * round-at-the-edge discipline (means to 6 places first, drift to
    * 4 from the rounded means). First batch of a dataset has no
    * prior: drift and flag are NULL.
    */
  val imgStatsDrift: String = imagingCte + """
, px AS (
  SELECT frames_global_id AS dataset_id,
    CAST(id % 3 AS BIGINT) AS batch,
    2 * list_sum(list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1)))
      AS sum_px
  FROM frames
), pb AS (
  SELECT dataset_id, batch,
    CAST(count(*) AS BIGINT) AS n_frames,
    CAST(sum(64) AS BIGINT) AS n_px,
    sum(sum_px) AS s_px
  FROM px GROUP BY 1, 2
), wd AS (
  SELECT dataset_id, batch, n_frames,
    round(CAST(s_px AS DOUBLE) / n_px, 6) AS mean_px,
    sum(n_px) OVER w AS prior_n,
    sum(s_px) OVER w AS prior_s
  FROM pb
  WINDOW w AS (PARTITION BY dataset_id ORDER BY batch
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), wm AS (
  SELECT dataset_id, batch, n_frames, mean_px,
    round(CAST(prior_s AS DOUBLE) / prior_n, 6) AS prior_mean
  FROM wd
)
SELECT dataset_id, batch, n_frames, mean_px, prior_mean,
  round((mean_px - prior_mean) * 100.0 / prior_mean, 4) AS drift_pct,
  CAST(abs(round((mean_px - prior_mean) * 100.0 / prior_mean, 4)) > 10.0
    AS INT) AS flag_drift
FROM wm
ORDER BY dataset_id, batch"""

  /** Twin of [[graft.multimodal.BinaryFrames.sceneCuts]]: exact
    * means (integer sum / 64), identical series partition and
    * tie-broken lag order, same 25-unit cut threshold.
    */
  val vidSceneCuts: String = imagingCte + """
, pb AS (
  SELECT id, frames_global_id AS dataset_id, channel_idx AS c,
    slice_idx AS z, time_idx AS t, pos_idx AS p,
    CAST(2 * list_sum(list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1)))
      AS DOUBLE) / 64 AS mean_px
  FROM frames
), lagged AS (
  SELECT dataset_id, mean_px,
    lag(mean_px) OVER (PARTITION BY dataset_id, c, z, p
      ORDER BY t, id, mean_px) AS prev
  FROM pb
), agg AS (
  SELECT dataset_id,
    CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_series,
    CAST(sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_transitions,
    CAST(sum(CASE WHEN abs(mean_px - prev) > 25.0 THEN 1 ELSE 0 END)
      AS BIGINT) AS n_cuts,
    CAST(round(max(abs(mean_px - prev)), 4) AS DOUBLE) AS max_jump
  FROM lagged GROUP BY dataset_id
)
SELECT d.dataset_serial, n_series, n_transitions, n_cuts, max_jump
FROM agg JOIN data_set d ON agg.dataset_id = d.id
ORDER BY d.dataset_serial"""

  /** Twin of [[graft.multimodal.BinaryFrames.zProfile]]: slice index
    * from the data model (the filename `_z###_` token round-trips
    * l_partkey % 8), hex-arithmetic pixel sums, rounded means on both
    * sides of the deviation.
    */
  val imgZProfile: String = imagingCte + """
, pb AS (
  SELECT frames_global_id AS dataset_id, slice_idx,
    list_transform(range(0, 32),
      i -> (strpos('0123456789abcdef', substr(sha256, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(sha256, 2*i + 2, 1)) - 1))
      AS px
  FROM frames
), byz AS (
  SELECT d.dataset_serial, pb.slice_idx,
    CAST(count(*) AS BIGINT) AS n_frames,
    sum(2 * list_sum(px)) AS spx, sum(64) AS npx
  FROM pb JOIN data_set d ON pb.dataset_id = d.id
  GROUP BY 1, 2)
SELECT dataset_serial, slice_idx, n_frames,
  CAST(round(CAST(spx AS DOUBLE) / npx, 6) AS DOUBLE) AS mean_px,
  CAST(round((round(CAST(spx AS DOUBLE) / npx, 6) - dm) * 100.0 / dm, 4)
    AS DOUBLE) AS dev_pct
FROM (
  SELECT dataset_serial, slice_idx, n_frames, spx, npx,
    round(CAST(sum(spx) OVER (PARTITION BY dataset_serial) AS DOUBLE)
      / sum(npx) OVER (PARTITION BY dataset_serial), 6) AS dm
  FROM byz)
ORDER BY dataset_serial, slice_idx"""

  val q4Priority: String = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""

  val q7Volume: String = s"""
SELECT supp_nation, cust_nation, l_year,
  CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS INT) AS l_year, $rev AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
    AND (n1.n_nationkey < 3 OR n2.n_nationkey < 3))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year"""

  val q18Large: String = """
SELECT c_name, c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str,
  o_totalprice, CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100"""

  /** Inter-arrival twin of
    * [[graft.ops.EventOps.eventsInterArrival]]: same (user, type) lag
    * window, same double gap conversion, quantile_cont ↔ percentile.
    */
  val eventsInterArrival: String = """
WITH gaps AS (
  SELECT event_type,
    CAST(epoch_ns(ts) - epoch_ns(lag(ts) OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id))
      AS DOUBLE) / 1000000000 AS gap_sec
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
  round(quantile_cont(gap_sec, 0.5), 4) AS p50_gap_sec,
  round(quantile_cont(gap_sec, 0.9), 4) AS p90_gap_sec
FROM gaps
WHERE gap_sec IS NOT NULL
GROUP BY event_type
ORDER BY event_type"""

  /** Journey-digest twin of [[graft.ops.EventOps.eventsJourneyDigest]]
    * (and semantically of the streaming
    * [[graft.streaming.EventsStream.journeyDigest]]): same gap
    * sessionization as [[eventsSessions]], then per-session digests.
    * Cents fixed-point with floor(value·100 + 0.5) — identical IEEE
    * double arithmetic on both engines; dominant type via
    * row_number ordered (n DESC, type); top-3 sum is a multiset so
    * the row_number tie-break cannot change it.
    */
  val eventsJourneyDigest: String = """
WITH ev AS (
  SELECT user_id, epoch_ns(ts) AS tns, event_id, event_type,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
s AS (
  SELECT *, CASE WHEN
      lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) IS NULL
      OR tns - lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id)
        > 1800000000000
    THEN 1 ELSE 0 END AS new_s
  FROM ev),
s2 AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns, event_id
    ROWS UNBOUNDED PRECEDING) AS sess
  FROM s),
tc AS (
  SELECT user_id, sess, event_type, CAST(count(*) AS BIGINT) AS n
  FROM s2 GROUP BY 1, 2, 3),
dom AS (
  SELECT user_id, sess, event_type AS dominant_type FROM (
    SELECT user_id, sess, event_type,
      row_number() OVER (PARTITION BY user_id, sess
        ORDER BY n DESC, event_type) AS rn
    FROM tc) WHERE rn = 1),
top AS (
  SELECT user_id, sess, CAST(sum(cents) AS BIGINT) AS topk_cents FROM (
    SELECT user_id, sess, cents,
      row_number() OVER (PARTITION BY user_id, sess
        ORDER BY cents DESC, event_id) AS rn
    FROM s2) t WHERE rn <= 3 GROUP BY 1, 2),
agg AS (
  SELECT user_id, sess, CAST(count(*) AS BIGINT) AS n_events,
    CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
    min(tns) // 1000000000 AS start_epoch,
    (max(tns) - min(tns)) // 1000000000 AS duration_sec
  FROM s2 GROUP BY 1, 2)
SELECT a.user_id, a.n_events, a.n_types, d.dominant_type, t.topk_cents,
  a.start_epoch, a.duration_sec
FROM agg a
JOIN dom d ON a.user_id = d.user_id AND a.sess = d.sess
JOIN top t ON a.user_id = t.user_id AND a.sess = t.sess
ORDER BY a.user_id, a.start_epoch"""

  /** Top-k-evidence twin of
    * [[graft.ops.EventOps.eventsSessionTopk]]: the shared gap
    * sessionization, then row_number (cents DESC, event_id) ≤ 3 —
    * the bounded aggregate's exact ordering.
    */
  val eventsSessionTopk: String = """
WITH ev AS (
  SELECT user_id, epoch_ns(ts) AS tns, event_id,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
s AS (
  SELECT *, CASE WHEN
      lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) IS NULL
      OR tns - lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id)
        > 1800000000000
    THEN 1 ELSE 0 END AS new_s
  FROM ev),
s2 AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns, event_id
    ROWS UNBOUNDED PRECEDING) AS sess
  FROM s),
st AS (
  SELECT user_id, sess, min(tns) // 1000000000 AS start_epoch
  FROM s2 GROUP BY 1, 2)
SELECT s2.user_id, st.start_epoch, CAST(rn AS BIGINT) AS rank,
  event_id, cents
FROM (
  SELECT user_id, sess, event_id, cents,
    row_number() OVER (PARTITION BY user_id, sess
      ORDER BY cents DESC, event_id) AS rn
  FROM s2) s2
JOIN st ON s2.user_id = st.user_id AND s2.sess = st.sess
WHERE rn <= 3
ORDER BY s2.user_id, st.start_epoch, rank"""

  /** Range-join twin of [[graft.ops.EventOps.eventsRangeJoin]]: the
    * same synthesized windows, joined by a plain containment predicate
    * (DuckDB plans its own inequality join — only the RESULT must
    * match the custom operator's).
    */
  val eventsRangeJoin: String = """
WITH windows AS (
  SELECT i AS window_id,
    1704067200000000000 + i * 10800000000000 AS start_ns,
    1704067200000000000 + i * 10800000000000
      + (2 + i % 5) * 3600000000000 AS end_ns
  FROM range(240) t(i)
)
SELECT window_id, CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events e JOIN windows w
  ON epoch_ns(e.ts) >= w.start_ns AND epoch_ns(e.ts) < w.end_ns
GROUP BY window_id
ORDER BY window_id"""

  /** Hash-sample twin of [[graft.ops.TextOps.hashSample]] — identical
    * md5-prefix bucket arithmetic.
    */
  val docHashSample: String = """
WITH b AS (
  SELECT doc_id, source,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
      % 100 AS bucket
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN bucket < 10 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_sampled,
  round(sum(CASE WHEN bucket < 10 THEN 1 ELSE 0 END) * 100.0
    / count(*), 2) AS pct,
  min(CASE WHEN bucket < 10 THEN doc_id END) AS first_sampled
FROM b
GROUP BY source
ORDER BY source"""

  /** Cell-occupancy twin of [[graft.ops.VectorOps.ivfBalance]]: same
    * centroids, same nearest-cell tie-break, same uniform-share
    * arithmetic.
    */
  val embIvfBalance: String = s"""
WITH cents AS (
  SELECT vec_id AS ccid, embedding AS ccv FROM embeddings WHERE vec_id < 16
), cellof AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.ccid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.ccv")}, c.ccid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1
), counts AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs
  FROM cellof GROUP BY cell
), t AS (
  SELECT CAST(sum(n_vecs) AS BIGINT) AS total,
    CAST(count(*) AS BIGINT) AS n_cells
  FROM counts)
SELECT cell, n_vecs,
  round(n_vecs * 100.0 / total, 4) AS pct,
  round(n_vecs * n_cells / CAST(total AS DOUBLE), 4) AS load_factor
FROM counts, t
ORDER BY cell"""

  /** IVF+PQ twin of [[graft.ops.VectorOps.knnIvfPq]]: the coarse
    * cosine routing of embKnnIvf composed with embKnnPq's
    * code-assignment + ADC tables, ADC restricted to probed cells.
    */
  /** The IVF+PQ ADC CTE chain (routing, probes, PQ codes, distance
    * tables, per-candidate ADC sums) — shared by [[embKnnIvfPq]] and
    * the refined-search twin [[embKnnRefine]].
    */
  private lazy val ivfPqAdcCte: String = s"""
WITH cents AS (
  SELECT vec_id AS ccid, embedding AS ccv FROM embeddings WHERE vec_id < 16
), cellof AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.ccid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.ccv")}, c.ccid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1
), probes AS (
  SELECT qid, cell FROM (
    SELECT e.vec_id AS qid, c.ccid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.ccv")}, c.ccid) AS crank
    FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 10)
  WHERE crank <= 4
), subq AS (
  SELECT vec_id, m.m AS m, embedding[m.m * 8 + 1 : m.m * 8 + 8] AS sub
  FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS m) m
), subc AS (
  SELECT vec_id AS cid, m.m AS m,
    embedding[m.m * 8 + 1 : m.m * 8 + 8] AS csub
  FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS m) m
  WHERE vec_id < 16
), codes AS (
  SELECT vec_id, m, cid FROM (
    SELECT q.vec_id, q.m, c.cid,
      row_number() OVER (PARTITION BY q.vec_id, q.m ORDER BY
        list_sum(list_transform(list_zip(q.sub, c.csub),
          p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
             * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), c.cid)
        AS rk
    FROM subq q JOIN subc c ON q.m = c.m)
  WHERE rk = 1
), dtab AS (
  SELECT q.vec_id AS qid, q.m, c.cid,
    list_sum(list_transform(list_zip(q.sub, c.csub),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
  FROM subq q JOIN subc c ON q.m = c.m
  WHERE q.vec_id < 10
), adc AS (
  SELECT d.qid, a.vec_id,
    CAST(round(sum(d.dist), 6) AS DOUBLE) AS adc_dist
  FROM codes a
  JOIN cellof cf ON a.vec_id = cf.vec_id
  JOIN probes p ON cf.cell = p.cell
  JOIN dtab d ON a.m = d.m AND a.cid = d.cid AND d.qid = p.qid
  WHERE d.qid <> a.vec_id
  GROUP BY d.qid, a.vec_id
)
"""

  val embKnnIvfPq: String = s"""$ivfPqAdcCte
SELECT qid, vec_id AS neighbor, adc_dist, rank FROM (
  SELECT qid, vec_id, adc_dist,
    CAST(row_number() OVER (
      PARTITION BY qid ORDER BY adc_dist, vec_id) AS BIGINT) AS rank
  FROM adc)
WHERE rank <= 5
ORDER BY qid, rank"""

  /** Refined-search twin of [[graft.ops.VectorOps.knnRefine]]: the
    * same ADC chain over-fetches top-20 candidates, exact cosine over
    * the full vectors re-ranks the final top-5 (unrounded ordering,
    * rounded output — the [[embKnnIvf]] discipline).
    */
  val embKnnRefine: String = s"""$ivfPqAdcCte, cand AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
      row_number() OVER (PARTITION BY qid ORDER BY adc_dist, vec_id)
        AS rk
    FROM adc)
  WHERE rk <= 20
), rescored AS (
  SELECT c.qid, c.vec_id,
    ${duckCos("q.embedding", "e.embedding")} AS sim
  FROM cand c
  JOIN embeddings q ON c.qid = q.vec_id
  JOIN embeddings e ON c.vec_id = e.vec_id
)
SELECT qid, vec_id AS neighbor, CAST(round(sim, 6) AS DOUBLE) AS sim,
  rank
FROM (
  SELECT qid, vec_id, sim,
    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
      AS BIGINT) AS rank
  FROM rescored)
WHERE rank <= 5
ORDER BY qid, rank"""

  /** Depth-curve twin of
    * [[graft.ops.VectorOps.refineDepthCurve]]: one top-40 candidate
    * prefix off the shared ADC chain, exact-cosine rescoring, depth-d
    * refinement as the rk ≤ d prefix re-ranked, recall vs the brute
    * truth per depth.
    */
  val embRefineDepthCurve: String = s"""$ivfPqAdcCte, cand AS (
  SELECT qid, vec_id, rk FROM (
    SELECT qid, vec_id,
      row_number() OVER (PARTITION BY qid ORDER BY adc_dist, vec_id)
        AS rk
    FROM adc)
  WHERE rk <= 40
), rescored AS (
  SELECT c.qid, c.vec_id, c.rk,
    ${duckCos("q.embedding", "e.embedding")} AS sim
  FROM cand c
  JOIN embeddings q ON c.qid = q.vec_id
  JOIN embeddings e ON c.vec_id = e.vec_id
), truth AS (SELECT qid, neighbor FROM ($embKnnBrute) tb),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM truth),
pick AS (
  SELECT depth, qid, vec_id FROM (
    SELECT d.depth, r.qid, r.vec_id,
      row_number() OVER (PARTITION BY d.depth, r.qid
        ORDER BY r.sim DESC, r.vec_id) AS prk
    FROM (SELECT unnest([5, 10, 20, 40]) AS depth) d
    JOIN rescored r ON r.rk <= d.depth)
  WHERE prk <= 5
)
SELECT CAST(depth AS BIGINT) AS depth,
  CAST(count(t.neighbor) AS BIGINT) AS n_hits,
  (SELECT n FROM nt) AS n_truth,
  round(CAST(count(t.neighbor) AS DOUBLE) / (SELECT n FROM nt), 4)
    AS recall
FROM pick p
LEFT JOIN truth t ON p.qid = t.qid AND p.vec_id = t.neighbor
GROUP BY depth
ORDER BY depth"""

  /** Recall twin of [[graft.ops.VectorOps.refineRecall]]: composes
    * the brute-force and refined oracles, counts per-query overlap.
    */
  val embRefineRecall: String = s"""
WITH brute AS (SELECT * FROM ($embKnnBrute) b),
refined AS (SELECT * FROM ($embKnnRefine) a)
SELECT brute.qid,
  CAST(count(refined.neighbor) AS BIGINT) AS n_hits,
  CAST(count(*) AS BIGINT) AS k,
  round(CAST(count(refined.neighbor) AS DOUBLE) / count(*), 4) AS recall
FROM brute
LEFT JOIN refined
  ON brute.qid = refined.qid AND brute.neighbor = refined.neighbor
GROUP BY brute.qid
ORDER BY brute.qid"""

  /** Recall twin of [[graft.ops.VectorOps.annRecall]]: composes the
    * brute-force and IVF+PQ oracles (already hash-verified on their
    * own) and counts the overlap per query.
    */
  val embAnnRecall: String = s"""
WITH brute AS (SELECT * FROM ($embKnnBrute) b),
approx AS (SELECT * FROM ($embKnnIvfPq) a)
SELECT brute.qid,
  CAST(count(approx.neighbor) AS BIGINT) AS n_hits,
  CAST(count(*) AS BIGINT) AS k,
  round(CAST(count(approx.neighbor) AS DOUBLE) / count(*), 4) AS recall
FROM brute
LEFT JOIN approx
  ON brute.qid = approx.qid AND brute.neighbor = approx.neighbor
GROUP BY brute.qid
ORDER BY brute.qid"""

  /** Market-share twin of [[graft.analytics.Olap.q8Share]]: same
    * PROMO/AMERICA/NATION_5 slice, DECIMAL year sums, double division
    * only at the edge.
    */
  val q8Share: String = """
WITH amer AS (
  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA')
SELECT year(o_orderdate) AS o_year,
  round(CAST(sum(CASE WHEN n_name = 'NATION_5' THEN vol
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share,
  CAST(sum(vol) AS DOUBLE) AS total_vol
FROM (SELECT l_orderkey, l_suppkey,
        CAST(l_extendedprice AS DECIMAL(18,2))
          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          AS vol
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO') l
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN amer ON c_nationkey = amer.n_nationkey
GROUP BY 1 ORDER BY 1"""

  /** Product-line profit twin of [[graft.analytics.Olap.q9Profit]]. */
  val q9Profit: String = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
  CAST(sum(amount) AS DOUBLE) AS sum_profit
FROM (SELECT l_orderkey, l_suppkey,
        CAST(l_extendedprice AS DECIMAL(18,2))
          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          AS amount
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%red%') l
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2 ORDER BY nation, o_year DESC"""

  /** Ship-latency twin of [[graft.analytics.Olap.q12Latency]]. */
  val q12Latency: String = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
            THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1"""

  /** Waiting-supplier twin of [[graft.analytics.Olap.q21Waiting]]:
    * same per-(order, supplier) late flags, same exactly-one-late
    * census, ties in numwait broken by the unique s_name so the
    * LIMIT cuts a total order.
    */
  val q21Waiting: String = """
WITH per_supp AS (
  SELECT l_orderkey AS okey, l_suppkey AS skey,
    max(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
             THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
blamed AS (
  SELECT okey FROM per_supp
  GROUP BY okey
  HAVING count(*) >= 2 AND sum(late) = 1)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_supp
JOIN blamed USING (okey)
JOIN supplier ON skey = s_suppkey
WHERE late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100"""

  /** Min-cost-supplier twin of [[graft.analytics.Olap.q2MinCost]]:
    * identical unit-cost derivation (min extendedprice/quantity per
    * pair — same IEEE division both engines), equality join on the
    * per-part min, LIMIT over a total order.
    */
  val q2MinCost: String = """
WITH eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
slice AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_type = 'LARGE' AND p_size BETWEEN 1 AND 15),
pairs AS (
  SELECT l_partkey, l_suppkey,
    min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem JOIN slice ON l_partkey = p_partkey
  GROUP BY l_partkey, l_suppkey),
ec AS (
  SELECT p.l_partkey, p.unit_cost, e.s_name, e.s_acctbal, e.n_name
  FROM pairs p JOIN eur e ON p.l_suppkey = e.s_suppkey),
mn AS (
  SELECT l_partkey AS m_partkey, min(unit_cost) AS min_cost
  FROM ec GROUP BY l_partkey)
SELECT e.s_acctbal, e.s_name, e.n_name, s.p_partkey, s.p_name,
  round(e.unit_cost, 6) AS unit_cost
FROM ec e
JOIN mn ON e.l_partkey = m_partkey AND e.unit_cost = min_cost
JOIN slice s ON e.l_partkey = s.p_partkey
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, s.p_partkey
LIMIT 100"""

  /** Important-value twin of
    * [[graft.analytics.Olap.q11ImportantValue]]: DECIMAL value sums,
    * cross-multiplied threshold, DOUBLE only on output.
    */
  val q11ImportantValue: String = """
WITH val AS (
  SELECT l_partkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      AS value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY l_partkey)
SELECT l_partkey AS partkey, CAST(value AS DOUBLE) AS value
FROM val, (SELECT sum(value) AS total FROM val)
WHERE value * 1000 > total
ORDER BY value DESC, partkey"""

  /** Supplier-breadth twin of
    * [[graft.analytics.Olap.q16SupplierCnt]]: NOT IN realizes the
    * anti-join (flagged keys are non-null by construction).
    */
  val q16SupplierCnt: String = """
SELECT p_brand, p_type, p_size,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#21' AND p_type <> 'PROMO' AND p_size <= 20
  AND l_suppkey NOT IN
    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Dominant-supplier twin of
    * [[graft.analytics.Olap.q20DominantSupplier]]: the correlated
    * half-of-volume test cross-multiplied, IN realizes the
    * semi-join.
    */
  val q20DominantSupplier: String = """
WITH sq AS (
  SELECT l_partkey, l_suppkey,
    sum(CAST(l_quantity AS DECIMAL(18,2))) AS s_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small %'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey),
tot AS (
  SELECT l_partkey AS t_partkey, sum(s_qty) AS t_qty
  FROM sq GROUP BY l_partkey)
SELECT s_name, round(CAST(s_acctbal AS DOUBLE), 2) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA' AND s_suppkey IN (
  SELECT l_suppkey FROM sq JOIN tot ON l_partkey = t_partkey
  WHERE s_qty * 2 > t_qty)
ORDER BY s_name"""

  /** Order-count distribution twin of
    * [[graft.analytics.Olap.q13CustDist]].
    */
  val q13CustDist: String = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(coalesce(cnt, 0) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders
                 WHERE o_orderpriority <> '1-URGENT'
                 GROUP BY o_custkey) oc
        ON c_custkey = oc.o_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC"""

  /** Promo-share twin of [[graft.analytics.Olap.q14Promo]]. */
  val q14Promo: String = """
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
                                   ELSE CAST(0 AS DECIMAL(18,2)) END)
                     AS DOUBLE)
    / CAST(sum(rev) AS DOUBLE), 6) AS promo_share,
  CAST(sum(rev) AS DOUBLE) AS total_rev
FROM (SELECT l_partkey,
        CAST(l_extendedprice AS DECIMAL(18,2))
          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        AND l_shipdate < TIMESTAMP '1997-10-01') l
JOIN part ON l_partkey = p_partkey"""

  /** Top-supplier twin of [[graft.analytics.Olap.q15TopSupplier]]. */
  val q15TopSupplier: String = """
WITH rev AS (
  SELECT l_suppkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey"""

  /** Small-quantity twin of [[graft.analytics.Olap.q17SmallQty]]: the
    * 0.2×avg threshold cross-multiplied (5·qty·n < Σqty) exactly as
    * the Spark side does, so no division enters the predicate.
    */
  val q17SmallQty: String = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'),
per_part AS (
  SELECT l_partkey AS t_partkey,
    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
    count(*) AS n_li
  FROM li GROUP BY l_partkey)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
    / 7.0, 6) AS avg_yearly,
  CAST(count(*) AS BIGINT) AS n_small
FROM li JOIN per_part ON l_partkey = t_partkey
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_li < sum_qty"""

  /** Disjunctive-bundle twin of
    * [[graft.analytics.Olap.q19Disjunction]].
    */
  val q19Disjunction: String = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
    AS DOUBLE) AS revenue,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
        AND l_quantity BETWEEN 20 AND 30)"""

  /** Idle-customer twin of [[graft.analytics.Olap.q22Idle]]: the
    * above-average test cross-multiplied (bal·n > Σbal), anti-join as
    * NOT EXISTS.
    */
  val q22Idle: String = """
WITH census AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal,
    count(*) AS n_pos
  FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, census
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment"""

  /** Overlap-matrix twin of [[graft.ops.DedupOps.sourceOverlap]]: the
    * theta sketches run in their exact regime (k ≥ per-source
    * distincts), so plain DISTINCT set arithmetic is the oracle. Same
    * planted "mirror" source, |A∪B| by inclusion-exclusion.
    */
  val docSourceOverlap: String = """
WITH docs2 AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror' AS source, text FROM documents WHERE doc_id % 5 = 0),
d AS (SELECT DISTINCT source, md5(lower(trim(text))) AS h FROM docs2),
cnt AS (SELECT source, count(*) AS n FROM d GROUP BY source),
pairs AS (SELECT a.source AS source_a, b.source AS source_b,
            a.n AS n_a, b.n AS n_b
          FROM cnt a JOIN cnt b ON a.source < b.source),
common AS (SELECT x.source AS source_a, y.source AS source_b,
             count(*) AS n_common
           FROM d x JOIN d y ON x.h = y.h AND x.source < y.source
           GROUP BY 1, 2)
SELECT p.source_a, p.source_b,
  CAST(p.n_a AS BIGINT) AS n_a, CAST(p.n_b AS BIGINT) AS n_b,
  CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
  CAST(p.n_a + p.n_b - coalesce(c.n_common, 0) AS BIGINT) AS n_union,
  round(CAST(coalesce(c.n_common, 0) AS DOUBLE)
    / (p.n_a + p.n_b - coalesce(c.n_common, 0)), 6) AS jaccard
FROM pairs p LEFT JOIN common c
  ON c.source_a = p.source_a AND c.source_b = p.source_b
ORDER BY 1, 2"""

  /** Audit twin of [[graft.ops.DedupOps.hashCollisionAudit]]: the
    * same 28-bit md5 base as the signature chain over the distinct
    * shingle set.
    */
  val docHashCollisionAudit: String = corpusCte + """, shx AS (
  SELECT DISTINCT unnest(shset) AS s FROM sh
), bases AS (
  SELECT ('0x' || substr(md5(s), 1, 7))::BIGINT AS base FROM shx
), per AS (
  SELECT base, count(*) AS cnt FROM bases GROUP BY base)
SELECT CAST(sum(cnt) AS BIGINT) AS n_shingles,
  CAST(count(*) AS BIGINT) AS n_bases,
  CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_colliding_bases,
  CAST(max(cnt) AS BIGINT) AS max_per_base,
  round((sum(cnt) - count(*)) * 100.0 / sum(cnt), 6) AS collision_pct
FROM per"""

  /** Sweep twin of [[graft.ops.DedupOps.minhashBandTune]]: the same
    * md5-affine signature chain as [[docMinhashLsh]], banded three
    * ways by a cross join on r; pair load is integer arithmetic on
    * bucket sizes, the threshold formula exp(ln(r/64)/r) matches the
    * Spark expression shape exactly.
    */
  val docMinhashBandTune: String = corpusCte + """, shx AS (
  SELECT doc_id, unnest(shset) AS s FROM sh
), base AS (
  SELECT doc_id, ('0x' || substr(md5(s), 1, 7))::BIGINT AS base FROM shx
), mins AS (
  SELECT doc_id, p.p AS p,
    min((((1000003 * p.p + 12345) % 2147483647) * base
         + ((998244353 * (p.p + 1) + 7) % 2147483647)) % 2147483647) AS mh
  FROM base CROSS JOIN (SELECT unnest(range(64)) AS p) p
  GROUP BY doc_id, p.p
), bandkeys AS (
  SELECT doc_id, r.r AS rcfg, p // r.r AS band,
    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY p) AS bh
  FROM mins CROSS JOIN (SELECT unnest([8, 4, 2]) AS r) r
  GROUP BY doc_id, r.r, p // r.r
), bsz AS (
  SELECT rcfg, band, bh, count(*) AS n
  FROM bandkeys GROUP BY rcfg, band, bh
), lo AS (
  SELECT rcfg, CAST(count(*) AS BIGINT) AS n_buckets,
    CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_colliding,
    CAST(max(n) AS BIGINT) AS max_bucket,
    CAST(sum(n * (n - 1) // 2) AS BIGINT) AS cand_pairs
  FROM bsz GROUP BY rcfg
), matched AS (
  SELECT DISTINCT x.rcfg, x.doc_id
  FROM bandkeys x JOIN bandkeys y
    ON x.rcfg = y.rcfg AND x.band = y.band AND x.bh = y.bh
   AND y.doc_id = x.doc_id + 1000000
  WHERE x.doc_id % 5 = 0 AND x.doc_id < 1000000
), found AS (
  SELECT rcfg, count(*) AS n_found FROM matched GROUP BY rcfg
), tot AS (
  SELECT count(*) AS n_planted FROM corpus
  WHERE doc_id % 5 = 0 AND doc_id < 1000000)
SELECT CAST(l.rcfg AS BIGINT) AS rows_per_band,
  CAST(64 // l.rcfg AS BIGINT) AS n_bands,
  round(exp(ln(l.rcfg / 64.0) / l.rcfg), 6) AS threshold,
  l.n_buckets, l.n_colliding, l.max_bucket, l.cand_pairs,
  round(coalesce(f.n_found, 0) * 100.0 / t.n_planted, 2) AS recall_pct
FROM lo l LEFT JOIN found f ON l.rcfg = f.rcfg, tot t
ORDER BY rows_per_band"""

  /** Triage twin of [[graft.ops.TextOps.perplexityOutliers]]: scores
    * rounded to 6 dp before ranking on both engines, (score, doc_id)
    * tie-break.
    */
  val docPerplexityOutliers: String = """
WITH toks AS (
  SELECT doc_id, source,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
total AS (SELECT count(*) AS tot FROM toks),
lp AS (
  SELECT tok,
    CAST(ln(CAST(cnt AS DOUBLE) / tot) AS DECIMAL(20,10)) AS lp
  FROM vocab, total),
perdoc AS (
  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_toks,
    round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS score
  FROM toks JOIN lp USING (tok)
  GROUP BY doc_id, source)
SELECT CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT)
    AS rank,
  doc_id, source, n_toks, score
FROM perdoc
ORDER BY score, doc_id
LIMIT 20"""

  /** Triage twin of [[graft.ops.VectorOps.normOutliers]]: the same
    * sequential-fold norm rounded to 6 dp before ranking, both ends.
    */
  val embNormOutliers: String = """
WITH scored AS (
  SELECT vec_id, label,
    round(sqrt(list_sum(list_transform(embedding,
      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
  FROM embeddings),
hi AS (
  SELECT 'high' AS "end",
    CAST(row_number() OVER (ORDER BY nrm DESC, vec_id) AS BIGINT)
      AS rank,
    vec_id, label, nrm
  FROM scored ORDER BY nrm DESC, vec_id LIMIT 10),
lo AS (
  SELECT 'low' AS "end",
    CAST(row_number() OVER (ORDER BY nrm, vec_id) AS BIGINT) AS rank,
    vec_id, label, nrm
  FROM scored ORDER BY nrm, vec_id LIMIT 10)
SELECT * FROM hi UNION ALL SELECT * FROM lo
ORDER BY "end", rank"""

  /** Twin of [[graft.ops.VectorOps.oodOutliers]]: same assignment
    * tie-break, rounded cosines ranked (asc, vec_id).
    */
  val embOodOutliers: String = s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < 16),
assigned AS (
  SELECT vec_id, label, cell, round(cosv, 6) AS cos_c FROM (
    SELECT e.vec_id, e.label, c.cid AS cell,
      ${duckCos("e.embedding", "c.cv")} AS cosv,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1)
SELECT CAST(row_number() OVER (ORDER BY cos_c, vec_id) AS BIGINT)
    AS rank,
  vec_id, label, cell, CAST(cos_c AS DOUBLE) AS cos_to_centroid
FROM assigned ORDER BY cos_c, vec_id LIMIT 20"""

  /** Twin of [[graft.ops.EventOps.eventsUserLifecycle]]: the same
    * distinct (user, week) base; states via a left self-join on
    * week−1 (Spark classifies against the per-user week ARRAY — set
    * semantics are identical), churn events at gap starts bounded by
    * the global max week.
    */
  val eventsUserLifecycle: String = """
WITH uw AS (
  SELECT DISTINCT user_id,
    epoch_ns(ts) // 604800000000000 AS week
  FROM events),
fw AS (SELECT user_id, min(week) AS fw FROM uw GROUP BY user_id),
mw AS (SELECT max(week) AS mw FROM uw),
states AS (
  SELECT u.week,
    CASE WHEN u.week = f.fw THEN 'new'
         WHEN p.user_id IS NOT NULL THEN 'retained'
         ELSE 'resurrected' END AS state
  FROM uw u
  JOIN fw f USING (user_id)
  LEFT JOIN uw p ON p.user_id = u.user_id AND p.week = u.week - 1),
churned AS (
  SELECT u.week + 1 AS week, 'churned' AS state
  FROM uw u
  LEFT JOIN uw nx ON nx.user_id = u.user_id AND nx.week = u.week + 1
  CROSS JOIN mw
  WHERE nx.user_id IS NULL AND u.week + 1 <= mw.mw),
allst AS (
  SELECT week, state FROM states
  UNION ALL SELECT week, state FROM churned)
SELECT CAST(week AS BIGINT) AS week,
  CAST(sum(CASE WHEN state IN ('new', 'retained', 'resurrected')
    THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
  CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_new,
  CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_retained,
  CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
    AS BIGINT) AS n_resurrected,
  CAST(sum(CASE WHEN state = 'churned' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_churned,
  CAST(sum(CASE WHEN state = 'new' THEN 1
           WHEN state = 'resurrected' THEN 1
           WHEN state = 'churned' THEN -1 ELSE 0 END) AS BIGINT)
    AS net_growth
FROM allst
GROUP BY week
ORDER BY week"""

  /** Growth-accounting twin of
    * [[graft.ops.EventOps.eventsNewVsReturning]]: distinct
    * (user, week), first week per user, per-week new/returning split.
    */
  val eventsNewVsReturning: String = """
WITH uw AS (
  SELECT DISTINCT user_id,
    epoch_ns(ts) // 604800000000000 AS week
  FROM events),
fw AS (SELECT user_id, min(week) AS fw FROM uw GROUP BY user_id)
SELECT u.week, CAST(count(*) AS BIGINT) AS n_active,
  CAST(sum(CASE WHEN u.week = f.fw THEN 1 ELSE 0 END) AS BIGINT)
    AS n_new,
  CAST(count(*) - sum(CASE WHEN u.week = f.fw THEN 1 ELSE 0 END)
    AS BIGINT) AS n_returning,
  round(sum(CASE WHEN u.week = f.fw THEN 1 ELSE 0 END) * 100.0
    / count(*), 4) AS pct_new
FROM uw u JOIN fw f USING (user_id)
GROUP BY u.week
ORDER BY week"""

  /** Inflation twin of [[graft.ops.DedupOps.dedupInflation]]: the
    * same planted-duplicate corpus union, digest grouping on
    * md5(lower(trim(text))), token counts riding the digest rows.
    */
  val docDedupInflation: String = """
WITH corpus AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT source, text FROM documents WHERE doc_id % 5 = 0),
dg AS (
  SELECT source, md5(lower(trim(text))) AS h, count(*) AS cnt,
    max(len(list_filter(string_split(lower(text), ' '), x -> x <> '')))
      AS toks
  FROM corpus GROUP BY source, md5(lower(trim(text))))
SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_unique,
  CAST(sum(cnt * toks) AS BIGINT) AS tokens_raw,
  CAST(sum(toks) AS BIGINT) AS tokens_unique,
  round(CAST(sum(cnt * toks) AS DOUBLE) / sum(toks), 4) AS inflation
FROM dg GROUP BY source ORDER BY source"""

  /** Hill-estimator twin of [[graft.ops.EventOps.eventsPowerLaw]]:
    * identical (count desc, user_id) order statistics, per-row log
    * ratios in DECIMAL, the k/Σ division once in double.
    */
  val eventsPowerLaw: String = """
WITH pu AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
top AS (
  SELECT user_id, n_events FROM pu
  ORDER BY n_events DESC, user_id LIMIT 101),
ranked AS (
  SELECT n_events,
    row_number() OVER (ORDER BY n_events DESC, user_id) AS rk
  FROM top),
b AS (SELECT rk AS krk, n_events AS x_kp1 FROM ranked
      ORDER BY rk DESC LIMIT 1)
SELECT CAST(count(*) AS BIGINT) AS k_used,
  CAST(max(x_kp1) AS BIGINT) AS x_kp1,
  CASE WHEN sum(lx) > CAST(0 AS DECIMAL(20,10))
    THEN round(count(*) / CAST(sum(lx) AS DOUBLE), 6) END AS alpha
FROM (
  SELECT r.n_events, b.x_kp1,
    CAST(ln(CAST(r.n_events AS DOUBLE) / b.x_kp1) AS DECIMAL(20,10))
      AS lx
  FROM ranked r, b WHERE r.rk < b.krk)"""

  /** Shift twin of [[graft.ops.VectorOps.centroidShift]]: the
    * [[embKmeansStep]] assignment and moment CTEs, per-dim squared
    * deltas in DECIMAL, sqrt once per cell.
    */
  val embCentroidShift: String = """
WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16
), scored AS (
  SELECT e.vec_id, c.cid, e.embedding,
    list_sum(list_transform(list_zip(e.embedding, c.cv),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
  FROM embeddings e CROSS JOIN c
), assigned AS (
  SELECT cid, embedding FROM (
    SELECT cid, embedding,
      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM scored)
  WHERE rk = 1
), comps AS (
  SELECT cid, unnest(range(len(embedding))) AS dim,
    unnest(embedding) AS v
  FROM assigned
), mo AS (
  SELECT cid, dim, count(*) AS n_members,
    sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10))) AS s
  FROM comps GROUP BY cid, dim
), seeds AS (
  SELECT vec_id AS cid, unnest(range(len(embedding))) AS dim,
    unnest(embedding) AS sv
  FROM embeddings WHERE vec_id < 16
), d2 AS (
  SELECT m.cid, m.n_members,
    CAST((CAST(m.s AS DOUBLE) / m.n_members - CAST(s.sv AS DOUBLE))
       * (CAST(m.s AS DOUBLE) / m.n_members - CAST(s.sv AS DOUBLE))
      AS DECIMAL(20,10)) AS d2
  FROM mo m JOIN seeds s ON m.cid = s.cid AND m.dim = s.dim)
SELECT cid, CAST(max(n_members) AS BIGINT) AS n_members,
  round(sqrt(CAST(sum(d2) AS DOUBLE)), 6) AS shift
FROM d2 GROUP BY cid ORDER BY cid"""

  /** Lag-histogram twin of [[graft.ops.EventOps.eventsConversionLag]]:
    * both firsts from one conditional-min aggregate on epoch nanos,
    * integer day buckets, shares via the proven n*100.0/total shape.
    */
  val eventsConversionLag: String = """
WITH pu AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'signup' THEN epoch_ns(ts) END) AS s_ts,
    min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS p_ts
  FROM events GROUP BY user_id),
lags AS (
  SELECT least((p_ts - s_ts) // 86400000000000, 14) AS lag_days
  FROM pu WHERE p_ts >= s_ts),
counts AS (
  SELECT lag_days, CAST(count(*) AS BIGINT) AS n_users
  FROM lags GROUP BY lag_days),
total AS (SELECT sum(n_users) AS tot FROM counts)
SELECT CAST(lag_days AS BIGINT) AS lag_days, n_users,
  round(n_users * 100.0 / tot, 4) AS pct,
  round(sum(n_users) OVER (ORDER BY lag_days) * 100.0 / tot, 4)
    AS cum_pct
FROM counts, total
ORDER BY lag_days"""

  /** Coverage twin of [[graft.ops.DedupOps.ngramCoverage]]: the same
    * word-3-gram shingle construction as [[docDecontaminate]], the
    * covered set intersected once, per-eval-doc roll-up.
    */
  val docNgramCoverage: String = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 5 = 0),
shd AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(toks) >= 3 THEN
      list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      ELSE [text] END) AS shset
  FROM (
    SELECT doc_id, text,
      list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM corpus)),
ev AS (SELECT doc_id, unnest(shset) AS sh FROM shd WHERE doc_id < 10),
evd AS (SELECT DISTINCT sh FROM ev),
cov AS (
  SELECT DISTINCT t.sh FROM
    (SELECT unnest(shset) AS sh FROM shd WHERE doc_id >= 10) t
    JOIN evd ON t.sh = evd.sh)
SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
  CAST(sum(CASE WHEN c.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_covered,
  round(sum(CASE WHEN c.sh IS NOT NULL THEN 1 ELSE 0 END) * 100.0
    / count(*), 4) AS coverage_pct
FROM ev e LEFT JOIN cov c ON e.sh = c.sh
GROUP BY e.doc_id
ORDER BY e.doc_id"""

  /** Separation twin of [[graft.ops.VectorOps.labelMargin]]:
    * per-(label, dim) DECIMAL sums, means divided once in double,
    * ordered-list centroids, sequential-fold cosine per pair.
    */
  val embLabelMargin: String = """
WITH el AS (
  SELECT label, i.i - 1 AS dim, CAST(embedding[i.i] AS DOUBLE) AS xd
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i),
cd AS (
  SELECT label, dim, sum(CAST(xd AS DECIMAL(20,10))) AS s, count(*) AS n
  FROM el GROUP BY label, dim),
cents AS (
  SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
    list(CAST(s AS DOUBLE) / n ORDER BY dim) AS cv
  FROM cd GROUP BY label)
SELECT a.label AS label_a, b.label AS label_b,
  a.n_vecs AS n_a, b.n_vecs AS n_b,
  CAST(round(list_sum(list_transform(list_zip(a.cv, b.cv),
      p -> p[1] * p[2]))
    / (sqrt(list_sum(list_transform(a.cv, x -> x * x)))
     * sqrt(list_sum(list_transform(b.cv, x -> x * x)))), 6) AS DOUBLE)
    AS cosine
FROM cents a JOIN cents b ON a.label < b.label
ORDER BY label_a, label_b"""

  /** Zipf-fit twin of [[graft.ops.TextOps.zipfSlope]]: each point's
    * log10 values and products cast to DECIMAL per row, so the
    * regression moments are exact on both engines; the slope division
    * happens once in double.
    */
  val docZipfSlope: String = """
WITH counts AS (
  SELECT tok, count(*) AS n FROM (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
      x -> x <> '')) AS tok
    FROM documents)
  GROUP BY tok),
top AS (SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT 100),
pts AS (
  SELECT
    CAST(log10(CAST(rank AS DOUBLE)) AS DECIMAL(20,10)) AS x,
    CAST(log10(CAST(n AS DOUBLE)) AS DECIMAL(20,10)) AS y,
    CAST(log10(CAST(rank AS DOUBLE)) * log10(CAST(rank AS DOUBLE))
      AS DECIMAL(20,10)) AS xx,
    CAST(log10(CAST(rank AS DOUBLE)) * log10(CAST(n AS DOUBLE))
      AS DECIMAL(20,10)) AS xy
  FROM (SELECT n,
      row_number() OVER (ORDER BY n DESC, tok) AS rank FROM top)),
mo AS (
  SELECT count(*) AS n_ranks, sum(x) AS sx, sum(y) AS sy,
    sum(xx) AS sxx, sum(xy) AS sxy FROM pts)
SELECT CAST(n_ranks AS BIGINT) AS n_ranks,
  round(CAST(n_ranks * sxy - sx * sy AS DOUBLE)
    / CAST(n_ranks * sxx - sx * sx AS DOUBLE), 6) AS slope,
  round((CAST(sy AS DOUBLE) - (CAST(n_ranks * sxy - sx * sy AS DOUBLE)
    / CAST(n_ranks * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
    / n_ranks, 6) AS intercept
FROM mo"""

  /** Bigram-LM twin of [[graft.ops.TextOps.bigramLogprob]]: bigrams
    * built positionally from the token list (range join on list
    * indices — same pairs as Spark's zip_with-of-slices), the
    * interpolated log evaluated once per bigram type and cast to
    * DECIMAL, sums exact, threshold cross-multiplied.
    */
  val docBigramLogprob: String = """
WITH docs AS (
  SELECT doc_id, source,
    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents),
bi AS (
  SELECT doc_id, source,
    unnest(list_transform(range(1, greatest(len(toks), 1)),
      i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM docs),
cb AS (
  SELECT bg, split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
    count(*) AS cb
  FROM bi GROUP BY bg),
ctx AS (SELECT w1, sum(cb) AS cctx FROM cb GROUP BY w1),
toks AS (
  SELECT unnest(toks) AS tok FROM docs),
uni AS (SELECT tok AS w2, count(*) AS cu FROM toks GROUP BY tok),
total AS (SELECT count(*) AS tot FROM toks),
lp AS (
  SELECT bg,
    CAST(ln(0.7 * (CAST(cb AS DOUBLE) / cctx)
          + 0.3 * (CAST(cu AS DOUBLE) / tot)) AS DECIMAL(20,10)) AS lp
  FROM cb JOIN ctx USING (w1) JOIN uni USING (w2), total),
perdoc AS (
  SELECT doc_id, source, sum(lp) AS s, count(*) AS n_bi
  FROM bi JOIN lp USING (bg)
  GROUP BY doc_id, source)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN s < CAST(-4.0 AS DECIMAL(20,10)) * n_bi
                THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
  round(CAST(sum(s) AS DOUBLE) / sum(n_bi), 4) AS avg_bigram_logprob
FROM perdoc
GROUP BY source
ORDER BY source"""

  /** DSIR twin of [[graft.ops.TextOps.dsirWeights]]: both smoothed
    * log terms evaluate once per vocabulary type, land in DECIMAL,
    * sums exact; the target slice is the lang='en' conditional sum
    * off the same scan.
    */
  val docDsirWeights: String = """
WITH toks AS (
  SELECT doc_id, source, lang,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents),
vocab AS (
  SELECT tok, count(*) AS craw,
    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ctgt
  FROM toks GROUP BY tok),
totals AS (
  SELECT sum(craw) AS traw, sum(ctgt) AS ttgt, count(*) AS v FROM vocab),
lp AS (
  SELECT tok,
    CAST(ln((ctgt + 1.0) / (ttgt + v))
       - ln((craw + 1.0) / (traw + v)) AS DECIMAL(20,10)) AS dlp
  FROM vocab, totals),
perdoc AS (
  SELECT doc_id, source, sum(dlp) AS w
  FROM toks JOIN lp USING (tok)
  GROUP BY doc_id, source)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN w > CAST(0 AS DECIMAL(20,10)) THEN 1 ELSE 0 END)
    AS BIGINT) AS n_upweighted,
  round(CAST(sum(w) AS DOUBLE) / count(*), 4) AS avg_weight
FROM perdoc
GROUP BY source
ORDER BY source"""

  /** Twin of [[graft.ops.TextOps.sourceKl]]: identical join shape off
    * one token explode, KL terms as double p·(ln p − ln q) cast to
    * DECIMAL(20,10) before the per-source sum.
    */
  val docSourceKl: String = """
WITH toks AS (
  SELECT source,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents),
st AS (SELECT source, tok, count(*) AS cs FROM toks GROUP BY 1, 2),
ct AS (SELECT tok, sum(cs) AS c FROM st GROUP BY 1),
stot AS (SELECT source, sum(cs) AS ns, count(*) AS vocab_src
  FROM st GROUP BY 1),
ntot AS (SELECT sum(c) AS n FROM ct)
SELECT source, CAST(ns AS BIGINT) AS n_tokens,
  CAST(vocab_src AS BIGINT) AS vocab_size,
  round(CAST(sum(CAST((CAST(cs AS DOUBLE) / ns)
    * (ln(CAST(cs AS DOUBLE) / ns) - ln(CAST(c AS DOUBLE) / n))
    AS DECIMAL(20,10))) AS DOUBLE), 6) AS kl_vs_corpus
FROM st JOIN ct USING (tok) JOIN stot USING (source), ntot
GROUP BY source, ns, vocab_src
ORDER BY source"""

  /** Twin of [[graft.ops.EventOps.eventsTypeEntropy]]: per-user
    * entropy terms cast to DECIMAL before the sum, identical bin
    * arithmetic.
    */
  val eventsTypeEntropy: String = """
WITH ut AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
wt AS (
  SELECT user_id, n, sum(n) OVER (PARTITION BY user_id) AS tot FROM ut),
pu AS (
  SELECT user_id, tot,
    sum(CAST(-(CAST(n AS DOUBLE) / tot) * ln(CAST(n AS DOUBLE) / tot)
      AS DECIMAL(20,10))) AS h
  FROM wt GROUP BY user_id, tot),
bins AS (
  SELECT tot, CAST(least(floor(CAST(h AS DOUBLE) / 0.2), 8) AS INT) AS bin
  FROM pu)
SELECT bin, CAST(round(bin * 0.2, 1) AS DOUBLE) AS lo_nats,
  CAST(count(*) AS BIGINT) AS n_users,
  CAST(round(avg(tot), 2) AS DOUBLE) AS avg_events
FROM bins GROUP BY bin ORDER BY bin"""

  /** Twin of [[graft.ops.VectorOps.hardNegatives]]: the same md5
    * anchor sample, sequential-fold cosine, NULL-dropping maxima and
    * DECIMAL margins.
    */
  val embHardNegatives: String = """
WITH a AS (
  SELECT vec_id AS aid, label AS alabel, embedding AS av
  FROM embeddings
  WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 7))::BIGINT
    % 8 = 0),
scored AS (
  SELECT aid, alabel, (e.label = alabel) AS same,
    list_sum(list_transform(list_zip(a.av, e.embedding),
      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(a.av,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      * sqrt(list_sum(list_transform(e.embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
  FROM embeddings e JOIN a ON e.vec_id <> a.aid),
pa AS (
  SELECT aid, alabel,
    max(CASE WHEN same THEN sim END) AS best_pos,
    max(CASE WHEN NOT same THEN sim END) AS best_neg
  FROM scored GROUP BY aid, alabel),
pm AS (
  SELECT aid, alabel,
    CAST(best_pos - best_neg AS DECIMAL(20,10)) AS margin
  FROM pa WHERE best_pos IS NOT NULL AND best_neg IS NOT NULL)
SELECT alabel AS label, CAST(count(*) AS BIGINT) AS n_anchors,
  CAST(sum(CASE WHEN margin < CAST(0 AS DECIMAL(20,10)) THEN 1 ELSE 0 END)
    AS BIGINT) AS n_hard,
  round(CAST(sum(margin) AS DOUBLE) / count(*), 4) AS avg_margin,
  CAST(round(CAST(min(margin) AS DOUBLE), 4) AS DOUBLE) AS min_margin
FROM pm GROUP BY alabel ORDER BY label"""

  /** The 1-in-`every` md5 anchor sample shared by the mining audits
    * and their IVF-probe twins ([[graft.ops.VectorOps]]
    * anchorSample): miners at 1-in-8, the recall audits at the
    * bounded 1-in-64 audit rate (VectorOps.AuditEvery).
    */
  private def hnAnchorsSql(every: Int = 8): String = s"""
SELECT vec_id AS aid, label AS alabel, embedding AS av
FROM embeddings
WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 7))::BIGINT
  % $every = 0"""

  /** Exact anchor-candidate scores: (aid, alabel, vec_id, label,
    * sim) over the full corpus, self excluded.
    */
  private def hnScoredExactSql(every: Int = 8): String = s"""
SELECT aid, alabel, e.vec_id, e.label,
  ${duckCos("a.av", "e.embedding")} AS sim
FROM embeddings e JOIN (${hnAnchorsSql(every)}) a ON e.vec_id <> a.aid"""

  /** IVF-probed anchor-candidate scores — twin of
    * [[graft.ops.VectorOps]] probedScored: corpus routed to k ∝ N
    * cells (crank = 1 assignment, the shared tie-break), anchors
    * probe their 4 nearest cells (crank <= 4 — the bounded
    * ascending top-k's (cdist, cid) order), candidates restricted to
    * the probed cells.
    */
  private def hnScoredProbeSql(every: Int = 8): String = s"""
WITH a AS (${hnAnchorsSql(every)}),
cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (${kCellsSql("embeddings", 128, 16)})),
assigned AS (
  SELECT vec_id, label, embedding, cell FROM (
    SELECT e.vec_id, e.label, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1),
probes AS (
  SELECT aid, cell FROM (
    SELECT a.aid, c.cid AS cell,
      row_number() OVER (PARTITION BY a.aid
        ORDER BY -${duckCos("a.av", "c.cv")}, c.cid) AS crank
    FROM a CROSS JOIN cents c)
  WHERE crank <= 4)
SELECT p.aid, a.alabel, s.vec_id, s.label,
  ${duckCos("a.av", "s.embedding")} AS sim
FROM probes p JOIN a USING (aid)
JOIN assigned s ON s.cell = p.cell AND s.vec_id <> p.aid"""

  /** Per-anchor triplet margin over any scored pair set. */
  private def hnMarginSql(scored: String): String = s"""
SELECT aid, alabel, CAST(best_pos - best_neg AS DECIMAL(20,10)) AS margin
FROM (
  SELECT aid, alabel,
    max(CASE WHEN label = alabel THEN sim END) AS best_pos,
    max(CASE WHEN label <> alabel THEN sim END) AS best_neg
  FROM ($scored) GROUP BY aid, alabel)
WHERE best_pos IS NOT NULL AND best_neg IS NOT NULL"""

  /** Per-label margin roll-up (the embHardNegatives tail). */
  private def hnRollupSql(margin: String): String = s"""
SELECT alabel AS label, CAST(count(*) AS BIGINT) AS n_anchors,
  CAST(sum(CASE WHEN margin < CAST(0 AS DECIMAL(20,10)) THEN 1 ELSE 0 END)
    AS BIGINT) AS n_hard,
  round(CAST(sum(margin) AS DOUBLE) / count(*), 4) AS avg_margin,
  CAST(round(CAST(min(margin) AS DOUBLE), 4) AS DOUBLE) AS min_margin
FROM (${margin}) GROUP BY alabel ORDER BY label"""

  /** Twin of [[graft.ops.VectorOps.hardNegativesIvf]]. */
  val embHardNegativesIvf: String =
    hnRollupSql(hnMarginSql(hnScoredProbeSql()))

  /** Twin of [[graft.ops.VectorOps.hardNegativesRecall]]: exact vs
    * probed per-anchor margins, left-joined on the anchor.
    */
  val embHnIvfRecall: String = s"""
WITH x AS (${hnMarginSql(hnScoredExactSql(64))}),
y AS (${hnMarginSql(hnScoredProbeSql(64))})
SELECT CAST(count(*) AS BIGINT) AS n_anchors,
  CAST(count(y.aid) AS BIGINT) AS n_probed,
  CAST(sum(CASE WHEN x.margin < 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hard_exact,
  CAST(sum(CASE WHEN x.margin < 0 AND y.margin < 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_hard_agree,
  CASE WHEN sum(CASE WHEN x.margin < 0 THEN 1 ELSE 0 END) > 0
    THEN round(sum(CASE WHEN x.margin < 0 AND y.margin < 0
        THEN 1 ELSE 0 END) * 100.0
      / sum(CASE WHEN x.margin < 0 THEN 1 ELSE 0 END), 2)
  END AS hard_recall_pct,
  CASE WHEN count(y.aid) > 0
    THEN round(CAST(sum(y.margin - x.margin) AS DOUBLE)
      / count(y.aid), 6)
  END AS avg_margin_gap
FROM x LEFT JOIN y ON x.aid = y.aid"""

  /** Per-anchor 5-NN majority-vote prediction over any scored set:
    * row_number top-5 matching the bounded aggregate's (sim desc,
    * id) order, vote tie-break (count desc, label asc).
    */
  private def classifyPredSql(scored: String): String = s"""
SELECT aid, alabel, nlabel AS pred FROM (
  SELECT aid, alabel, nlabel,
    row_number() OVER (PARTITION BY aid ORDER BY cnt DESC, nlabel) AS rn
  FROM (
    SELECT t.aid, t.alabel, e.label AS nlabel, count(*) AS cnt
    FROM (
      SELECT aid, alabel, vec_id FROM (
        SELECT aid, alabel, vec_id,
          row_number() OVER (PARTITION BY aid
            ORDER BY sim DESC, vec_id) AS rn5
        FROM ($scored)) WHERE rn5 <= 5) t
    JOIN embeddings e ON t.vec_id = e.vec_id
    GROUP BY 1, 2, 3))
WHERE rn = 1"""

  /** Per-label accuracy/confusion report (the embKnnClassify tail). */
  private def classifyReportSql(pred: String): String = s"""
WITH pred AS ($pred),
base AS (
  SELECT alabel, count(*) AS n_anchors,
    sum(CASE WHEN pred = alabel THEN 1 ELSE 0 END) AS n_correct
  FROM pred GROUP BY alabel),
wrongs AS (
  SELECT alabel, pred, count(*) AS cnt FROM pred
  WHERE pred <> alabel GROUP BY alabel, pred),
conf AS (
  SELECT alabel, pred AS top_confusion FROM (
    SELECT alabel, pred,
      row_number() OVER (PARTITION BY alabel ORDER BY cnt DESC, pred)
        AS rn
    FROM wrongs) WHERE rn = 1)
SELECT b.alabel AS label, CAST(b.n_anchors AS BIGINT) AS n_anchors,
  CAST(b.n_correct AS BIGINT) AS n_correct,
  round(b.n_correct * 100.0 / b.n_anchors, 2) AS acc_pct,
  coalesce(c.top_confusion, -1) AS top_confusion
FROM base b LEFT JOIN conf c USING (alabel)
ORDER BY label"""

  /** Twin of [[graft.ops.VectorOps.knnClassifyIvf]]. */
  val embKnnClassifyIvf: String =
    classifyReportSql(classifyPredSql(hnScoredProbeSql()))

  /** Twin of [[graft.ops.VectorOps.knnClassifyRecall]]: exact vs
    * probed per-anchor predictions, left-joined on the anchor.
    */
  val embClassifyIvfRecall: String = s"""
WITH x AS (${classifyPredSql(hnScoredExactSql(64))}),
y AS (${classifyPredSql(hnScoredProbeSql(64))})
SELECT CAST(count(*) AS BIGINT) AS n_anchors,
  CAST(count(y.aid) AS BIGINT) AS n_probed,
  CAST(sum(CASE WHEN x.pred = y.pred THEN 1 ELSE 0 END) AS BIGINT)
    AS n_agree,
  CASE WHEN count(*) > 0
    THEN round(sum(CASE WHEN x.pred = y.pred THEN 1 ELSE 0 END)
      * 100.0 / count(*), 2)
  END AS agree_pct,
  CAST(sum(CASE WHEN x.pred = x.alabel THEN 1 ELSE 0 END) AS BIGINT)
    AS n_correct_exact,
  CAST(sum(CASE WHEN y.pred = x.alabel THEN 1 ELSE 0 END) AS BIGINT)
    AS n_correct_probe
FROM x LEFT JOIN y ON x.aid = y.aid"""

  /** Distortion twin of [[graft.ops.VectorOps.pqDistortion]]: the
    * same sequential-fold squared L2 as [[embPqCodes]], the min dist
    * cast to DECIMAL per (vec, subspace) row, codes-used as the same
    * 16-bit membership bitmap.
    */
  val embPqDistortion: String = """
WITH subq AS (
  SELECT vec_id, m.m AS m,
    embedding[m.m * 8 + 1 : m.m * 8 + 8] AS sub
  FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS m) m),
subc AS (
  SELECT vec_id AS cid, m.m AS m,
    embedding[m.m * 8 + 1 : m.m * 8 + 8] AS csub
  FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS m) m
  WHERE vec_id < 16),
scored AS (
  SELECT q.vec_id, q.m, c.cid,
    list_sum(list_transform(list_zip(q.sub, c.csub),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
  FROM subq q JOIN subc c ON q.m = c.m),
assigned AS (
  SELECT m, CAST(dist AS DECIMAL(20,10)) AS d, cid FROM (
    SELECT vec_id, m, cid, dist,
      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) AS rk
    FROM scored)
  WHERE rk = 1)
SELECT m AS subspace, CAST(count(*) AS BIGINT) AS n_vecs,
  round(CAST(sum(d) AS DOUBLE) / count(*), 6) AS mse,
  round(CAST(max(d) AS DOUBLE), 6) AS max_sq_err,
  CAST(bit_count(bit_or(1::BIGINT << cid)) AS BIGINT) AS codes_used
FROM assigned
GROUP BY m
ORDER BY subspace"""

  /** Moment twin of [[graft.ops.VectorOps.dimStats]]: per-row values
    * and squares in DECIMAL (float→double exact, one deterministic
    * rounding for the square), min/max exact doubles.
    */
  val embDimStats: String = """
WITH el AS (
  SELECT i.i - 1 AS dim, CAST(embedding[i.i] AS DOUBLE) AS xd
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i),
dd AS (
  SELECT dim, xd,
    CAST(xd AS DECIMAL(20,10)) AS x1,
    CAST(xd * xd AS DECIMAL(20,10)) AS x2
  FROM el)
SELECT CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n,
  round(CAST(sum(x1) AS DOUBLE) / count(*), 6) AS mean,
  round(CAST(sum(x2) AS DOUBLE) / count(*)
    - (CAST(sum(x1) AS DOUBLE) / count(*))
    * (CAST(sum(x1) AS DOUBLE) / count(*)), 6) AS variance,
  min(xd) AS min_v, max(xd) AS max_v
FROM dd
GROUP BY dim
ORDER BY dim"""

  /** Twin of [[graft.ops.VectorOps.dimCorr]]: the same DECIMAL-exact
    * cross-moments via an el self-join, raw-|corr| top-20 cut,
    * key-ordered output.
    */
  val embDimCorr: String = """
WITH el AS (
  SELECT vec_id, i.i - 1 AS i, CAST(embedding[i.i] AS DOUBLE) AS xd
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i),
pairs AS (
  SELECT a.i AS i, b.i AS j, count(*) AS n,
    sum(CAST(a.xd * b.xd AS DECIMAL(20,10))) AS sxy
  FROM el a JOIN el b ON a.vec_id = b.vec_id AND b.i >= a.i
  GROUP BY 1, 2),
firsts AS (
  SELECT i, sum(CAST(xd AS DECIMAL(20,10))) AS sx FROM el GROUP BY i),
corr AS (
  SELECT p.i, p.j,
    (CAST(p.sxy AS DOUBLE) / p.n
      - (CAST(fi.sx AS DOUBLE) / p.n) * (CAST(fj.sx AS DOUBLE) / p.n))
    / (sqrt(CAST(di.sxy AS DOUBLE) / p.n
        - (CAST(fi.sx AS DOUBLE) / p.n) * (CAST(fi.sx AS DOUBLE) / p.n))
      * sqrt(CAST(dj.sxy AS DOUBLE) / p.n
        - (CAST(fj.sx AS DOUBLE) / p.n) * (CAST(fj.sx AS DOUBLE) / p.n)))
      AS corr
  FROM pairs p
  JOIN firsts fi ON fi.i = p.i
  JOIN firsts fj ON fj.i = p.j
  JOIN pairs di ON di.i = p.i AND di.j = p.i
  JOIN pairs dj ON dj.i = p.j AND dj.j = p.j
  WHERE p.j > p.i
    AND CAST(di.sxy AS DOUBLE) / p.n
      - (CAST(fi.sx AS DOUBLE) / p.n) * (CAST(fi.sx AS DOUBLE) / p.n) > 0
    AND CAST(dj.sxy AS DOUBLE) / p.n
      - (CAST(fj.sx AS DOUBLE) / p.n) * (CAST(fj.sx AS DOUBLE) / p.n) > 0)
SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j,
  CAST(round(corr, 6) AS DOUBLE) AS corr
FROM (SELECT * FROM corr ORDER BY abs(corr) DESC, i, j LIMIT 20)
ORDER BY dim_i, dim_j"""

  /** The OPQ-lite rotation CTE shared by [[embOpqRotations]] and
    * [[embOpqDistortion]] — mirror of
    * [[graft.ops.VectorOps.opqRotationsRaw]]: the dimCorr moment
    * census, mutual-best |corr| partner selection (row_number ↔ the
    * lexicographic max-struct), and the sqrt-only Jacobi (c, s). The
    * moment→double divisions and the τ/t/c/s chain copy the Spark
    * expression shapes operation for operation (a/b vs a·(1/b)
    * differ in IEEE — s must be t·c, not t/sqrt).
    */
  private val opqRotCte: String = s"""
WITH el AS (
  SELECT vec_id, i.i - 1 AS i, CAST(embedding[i.i] AS DOUBLE) AS xd
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i),
pairs AS (
  SELECT a.i AS i, b.i AS j, count(*) AS n,
    sum(CAST(a.xd * b.xd AS DECIMAL(20,10))) AS sxy
  FROM el a JOIN el b ON a.vec_id = b.vec_id AND b.i >= a.i
  GROUP BY 1, 2),
firsts AS (
  SELECT i, sum(CAST(xd AS DECIMAL(20,10))) AS sx FROM el GROUP BY i),
mom AS (
  SELECT p.i, p.j,
    CAST(p.sxy AS DOUBLE) / p.n AS mxy,
    CAST(fi.sx AS DOUBLE) / p.n AS mx_i,
    CAST(fj.sx AS DOUBLE) / p.n AS mx_j,
    CAST(di.sxy AS DOUBLE) / p.n AS mxx_i,
    CAST(dj.sxy AS DOUBLE) / p.n AS mxx_j
  FROM pairs p
  JOIN firsts fi ON fi.i = p.i
  JOIN firsts fj ON fj.i = p.j
  JOIN pairs di ON di.i = p.i AND di.j = p.i
  JOIN pairs dj ON dj.i = p.j AND dj.j = p.j
  WHERE p.j > p.i),
base AS (
  SELECT i, j,
    mxy - mx_i * mx_j AS cov,
    mxx_i - mx_i * mx_i AS var_i,
    mxx_j - mx_j * mx_j AS var_j,
    (mxy - mx_i * mx_j)
      / (sqrt(mxx_i - mx_i * mx_i) * sqrt(mxx_j - mx_j * mx_j)) AS corr
  FROM mom
  WHERE mxx_i - mx_i * mx_i > 0 AND mxx_j - mx_j * mx_j > 0
    AND mxy - mx_i * mx_j <> 0),
sym AS (
  SELECT i AS a, j AS b, corr FROM base
  UNION ALL
  SELECT j AS a, i AS b, corr FROM base),
best AS (
  SELECT a, b AS p FROM (
    SELECT a, b,
      row_number() OVER (PARTITION BY a ORDER BY abs(corr) DESC, b) AS rn
    FROM sym) WHERE rn = 1),
mutual AS (
  SELECT x.a AS i, x.p AS j FROM best x
  JOIN best y ON x.p = y.a AND y.p = x.a AND x.a < x.p),
rot AS (
  SELECT i, j, cov, var_i, var_j, corr, c, t * c AS s FROM (
    SELECT *, 1.0 / sqrt(1.0 + t * t) AS c FROM (
      SELECT *,
        CASE WHEN tau >= 0
          THEN 1.0 / (tau + sqrt(1.0 + tau * tau))
          ELSE 1.0 / (tau - sqrt(1.0 + tau * tau)) END AS t
      FROM (
        SELECT b2.*, (var_j - var_i) / (2.0 * cov) AS tau
        FROM base b2 JOIN mutual USING (i, j)))))
"""

  /** Twin of [[graft.ops.VectorOps.opqRotations]]. */
  val embOpqRotations: String = opqRotCte + """
SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j,
  CAST(round(corr, 6) AS DOUBLE) AS corr,
  CAST(round(c, 6) AS DOUBLE) AS c,
  CAST(round(s, 6) AS DOUBLE) AS s
FROM rot ORDER BY dim_i"""

  /** The rotation-application clauses (identity default, pair dims
    * override, rotated element lists in dim order) shared by
    * [[embOpqDistortion]] and [[embKnnOpq]].
    */
  private val opqApplyCte: String = """,
plan AS (
  SELECT k.k AS k,
    coalesce(r.oth, k.k) AS oth,
    coalesce(r.wself, 1.0) AS wself,
    coalesce(r.wother, 0.0) AS wother
  FROM (SELECT unnest(range(64)) AS k) k
  LEFT JOIN (
    SELECT i AS k, j AS oth, c AS wself, -s AS wother FROM rot
    UNION ALL
    SELECT j AS k, i AS oth, c AS wself, s AS wother FROM rot) r
  ON r.k = k.k),
rel AS (
  SELECT e.vec_id, p.k,
    p.wself * CAST(e.embedding[p.k + 1] AS DOUBLE)
      + p.wother * CAST(e.embedding[p.oth + 1] AS DOUBLE) AS x
  FROM embeddings e CROSS JOIN plan p),
rvec AS (
  SELECT vec_id, list(x ORDER BY k) AS rvec FROM rel GROUP BY vec_id)"""

  /** Twin of [[graft.ops.VectorOps.knnOpq]]: the rotation chain, then
    * [[embKnnPq]]'s ADC body verbatim over the rotated vectors.
    */
  val embKnnOpq: String = opqRotCte + opqApplyCte + """,
subq AS (
  SELECT vec_id, m.m AS m, rvec[m.m * 8 + 1 : m.m * 8 + 8] AS sub
  FROM rvec CROSS JOIN (SELECT unnest(range(8)) AS m) m),
subc AS (
  SELECT vec_id AS cid, m.m AS m,
    rvec[m.m * 8 + 1 : m.m * 8 + 8] AS csub
  FROM rvec CROSS JOIN (SELECT unnest(range(8)) AS m) m
  WHERE vec_id < 16),
assigned AS (
  SELECT vec_id, m, cid FROM (
    SELECT q.vec_id, q.m, c.cid,
      row_number() OVER (PARTITION BY q.vec_id, q.m ORDER BY
        list_sum(list_transform(list_zip(q.sub, c.csub),
          p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rk
    FROM subq q JOIN subc c ON q.m = c.m)
  WHERE rk = 1),
dtab AS (
  SELECT q.vec_id AS qid, q.m, c.cid,
    list_sum(list_transform(list_zip(q.sub, c.csub),
      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
  FROM subq q JOIN subc c ON q.m = c.m
  WHERE q.vec_id < 10),
adc AS (
  SELECT d.qid, a.vec_id,
    CAST(round(sum(d.dist), 6) AS DOUBLE) AS adc_dist
  FROM assigned a JOIN dtab d ON a.m = d.m AND a.cid = d.cid
  WHERE d.qid <> a.vec_id
  GROUP BY d.qid, a.vec_id)
SELECT qid, vec_id AS neighbor, adc_dist, rank FROM (
  SELECT qid, vec_id, adc_dist,
    CAST(row_number() OVER (
      PARTITION BY qid ORDER BY adc_dist, vec_id) AS BIGINT) AS rank
  FROM adc)
WHERE rank <= 5
ORDER BY qid, rank"""

  /** Twin of [[graft.sources.VectorIndex.searchForRotated]]
    * (`emb_knn_opq_indexed`): the rotation chain, then
    * [[embKnnIvfPq]]'s body verbatim over the rotated vectors —
    * coarse cells, 4-probe routing, PQ codes and the ADC tables all
    * derived in the rotated space, exactly what the persisted
    * OPQ+IVF+PQ index stores. The store itself is a materialization
    * detail (VectorIndexSpec proves the frozen-plan contract); the
    * SQL derives everything inline from the same frozen arithmetic.
    */
  val embKnnOpqIndexed: String = opqRotCte + opqApplyCte + s""",
cents AS (
  SELECT vec_id AS ccid, rvec AS ccv FROM rvec WHERE vec_id < 16),
cellof AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.ccid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.rvec", "c.ccv")}, c.ccid) AS crank
    FROM rvec e CROSS JOIN cents c)
  WHERE crank <= 1),
probes AS (
  SELECT qid, cell FROM (
    SELECT e.vec_id AS qid, c.ccid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.rvec", "c.ccv")}, c.ccid) AS crank
    FROM rvec e CROSS JOIN cents c WHERE e.vec_id < 10)
  WHERE crank <= 4),
subq AS (
  SELECT vec_id, m.m AS m, rvec[m.m * 8 + 1 : m.m * 8 + 8] AS sub
  FROM rvec CROSS JOIN (SELECT unnest(range(8)) AS m) m),
subc AS (
  SELECT vec_id AS cid, m.m AS m,
    rvec[m.m * 8 + 1 : m.m * 8 + 8] AS csub
  FROM rvec CROSS JOIN (SELECT unnest(range(8)) AS m) m
  WHERE vec_id < 16),
codes AS (
  SELECT vec_id, m, cid FROM (
    SELECT q.vec_id, q.m, c.cid,
      row_number() OVER (PARTITION BY q.vec_id, q.m ORDER BY
        list_sum(list_transform(list_zip(q.sub, c.csub),
          p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rk
    FROM subq q JOIN subc c ON q.m = c.m)
  WHERE rk = 1),
dtab AS (
  SELECT q.vec_id AS qid, q.m, c.cid,
    list_sum(list_transform(list_zip(q.sub, c.csub),
      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
  FROM subq q JOIN subc c ON q.m = c.m
  WHERE q.vec_id < 10),
adc AS (
  SELECT d.qid, a.vec_id,
    CAST(round(sum(d.dist), 6) AS DOUBLE) AS adc_dist
  FROM codes a
  JOIN cellof cf ON a.vec_id = cf.vec_id
  JOIN probes p ON cf.cell = p.cell
  JOIN dtab d ON a.m = d.m AND a.cid = d.cid AND d.qid = p.qid
  WHERE d.qid <> a.vec_id
  GROUP BY d.qid, a.vec_id)
SELECT qid, vec_id AS neighbor, adc_dist, rank FROM (
  SELECT qid, vec_id, adc_dist,
    CAST(row_number() OVER (
      PARTITION BY qid ORDER BY adc_dist, vec_id) AS BIGINT) AS rank
  FROM adc)
WHERE rank <= 5
ORDER BY qid, rank"""

  /** Twin of [[graft.ops.VectorOps.opqDistortion]]: the rotation plan
    * (identity default, pair dims override), rotated element lists in
    * dim order, then the [[embPqDistortion]] body verbatim over the
    * rotated vectors.
    */
  val embOpqDistortion: String = opqRotCte + """,
plan AS (
  SELECT k.k AS k,
    coalesce(r.oth, k.k) AS oth,
    coalesce(r.wself, 1.0) AS wself,
    coalesce(r.wother, 0.0) AS wother
  FROM (SELECT unnest(range(64)) AS k) k
  LEFT JOIN (
    SELECT i AS k, j AS oth, c AS wself, -s AS wother FROM rot
    UNION ALL
    SELECT j AS k, i AS oth, c AS wself, s AS wother FROM rot) r
  ON r.k = k.k),
rel AS (
  SELECT e.vec_id, p.k,
    p.wself * CAST(e.embedding[p.k + 1] AS DOUBLE)
      + p.wother * CAST(e.embedding[p.oth + 1] AS DOUBLE) AS x
  FROM embeddings e CROSS JOIN plan p),
rvec AS (
  SELECT vec_id, list(x ORDER BY k) AS rvec FROM rel GROUP BY vec_id),
subq AS (
  SELECT vec_id, m.m AS m,
    rvec[m.m * 8 + 1 : m.m * 8 + 8] AS sub
  FROM rvec CROSS JOIN (SELECT unnest(range(8)) AS m) m),
subc AS (
  SELECT vec_id AS cid, m.m AS m,
    rvec[m.m * 8 + 1 : m.m * 8 + 8] AS csub
  FROM rvec CROSS JOIN (SELECT unnest(range(8)) AS m) m
  WHERE vec_id < 16),
scored AS (
  SELECT q.vec_id, q.m, c.cid,
    list_sum(list_transform(list_zip(q.sub, c.csub),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
  FROM subq q JOIN subc c ON q.m = c.m),
assigned AS (
  SELECT m, CAST(dist AS DECIMAL(20,10)) AS d, cid FROM (
    SELECT vec_id, m, cid, dist,
      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) AS rk
    FROM scored)
  WHERE rk = 1)
SELECT m AS subspace, CAST(count(*) AS BIGINT) AS n_vecs,
  round(CAST(sum(d) AS DOUBLE) / count(*), 6) AS mse,
  round(CAST(max(d) AS DOUBLE), 6) AS max_sq_err,
  CAST(bit_count(bit_or(1::BIGINT << cid)) AS BIGINT) AS codes_used
FROM assigned
GROUP BY m
ORDER BY subspace"""

  /** One full OPQ-lite chain (moment census → pair base → mutual-best
    * → Jacobi rot) over `$src`, every CTE suffixed `$sfx` so two
    * rounds coexist in one query — [[opqRotCte]]'s clauses,
    * generated, for [[embOpqSweep]].
    */
  private def opqChainCtes(src: String, sfx: String): String = s"""
el$sfx AS (
  SELECT vec_id, i.i - 1 AS i, CAST(embedding[i.i] AS DOUBLE) AS xd
  FROM $src CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i),
pairs$sfx AS (
  SELECT a.i AS i, b.i AS j, count(*) AS n,
    sum(CAST(a.xd * b.xd AS DECIMAL(20,10))) AS sxy
  FROM el$sfx a JOIN el$sfx b ON a.vec_id = b.vec_id AND b.i >= a.i
  GROUP BY 1, 2),
firsts$sfx AS (
  SELECT i, sum(CAST(xd AS DECIMAL(20,10))) AS sx FROM el$sfx GROUP BY i),
mom$sfx AS (
  SELECT p.i, p.j,
    CAST(p.sxy AS DOUBLE) / p.n AS mxy,
    CAST(fi.sx AS DOUBLE) / p.n AS mx_i,
    CAST(fj.sx AS DOUBLE) / p.n AS mx_j,
    CAST(di.sxy AS DOUBLE) / p.n AS mxx_i,
    CAST(dj.sxy AS DOUBLE) / p.n AS mxx_j
  FROM pairs$sfx p
  JOIN firsts$sfx fi ON fi.i = p.i
  JOIN firsts$sfx fj ON fj.i = p.j
  JOIN pairs$sfx di ON di.i = p.i AND di.j = p.i
  JOIN pairs$sfx dj ON dj.i = p.j AND dj.j = p.j
  WHERE p.j > p.i),
base$sfx AS (
  SELECT i, j,
    mxy - mx_i * mx_j AS cov,
    mxx_i - mx_i * mx_i AS var_i,
    mxx_j - mx_j * mx_j AS var_j,
    (mxy - mx_i * mx_j)
      / (sqrt(mxx_i - mx_i * mx_i) * sqrt(mxx_j - mx_j * mx_j)) AS corr
  FROM mom$sfx
  WHERE mxx_i - mx_i * mx_i > 0 AND mxx_j - mx_j * mx_j > 0
    AND mxy - mx_i * mx_j <> 0),
sym$sfx AS (
  SELECT i AS a, j AS b, corr FROM base$sfx
  UNION ALL
  SELECT j AS a, i AS b, corr FROM base$sfx),
best$sfx AS (
  SELECT a, b AS p FROM (
    SELECT a, b,
      row_number() OVER (PARTITION BY a ORDER BY abs(corr) DESC, b) AS rn
    FROM sym$sfx) WHERE rn = 1),
mutual$sfx AS (
  SELECT x.a AS i, x.p AS j FROM best$sfx x
  JOIN best$sfx y ON x.p = y.a AND y.p = x.a AND x.a < x.p),
rot$sfx AS (
  SELECT i, j, cov, var_i, var_j, corr, c, t * c AS s FROM (
    SELECT *, 1.0 / sqrt(1.0 + t * t) AS c FROM (
      SELECT *,
        CASE WHEN tau >= 0
          THEN 1.0 / (tau + sqrt(1.0 + tau * tau))
          ELSE 1.0 / (tau - sqrt(1.0 + tau * tau)) END AS t
      FROM (
        SELECT b2.*, (var_j - var_i) / (2.0 * cov) AS tau
        FROM base$sfx b2 JOIN mutual$sfx USING (i, j)))))"""

  /** Rotation application CTEs (identity default, pair dims override)
    * from `rot$sfx` onto `$src` — [[embOpqDistortion]]'s plan/rel/rvec
    * clauses, generated and suffixed.
    */
  private def opqApplyCtes(src: String, sfx: String): String = s"""
plan$sfx AS (
  SELECT k.k AS k,
    coalesce(r.oth, k.k) AS oth,
    coalesce(r.wself, 1.0) AS wself,
    coalesce(r.wother, 0.0) AS wother
  FROM (SELECT unnest(range(64)) AS k) k
  LEFT JOIN (
    SELECT i AS k, j AS oth, c AS wself, -s AS wother FROM rot$sfx
    UNION ALL
    SELECT j AS k, i AS oth, c AS wself, s AS wother FROM rot$sfx) r
  ON r.k = k.k),
rel$sfx AS (
  SELECT e.vec_id, p.k,
    p.wself * CAST(e.embedding[p.k + 1] AS DOUBLE)
      + p.wother * CAST(e.embedding[p.oth + 1] AS DOUBLE) AS x
  FROM $src e CROSS JOIN plan$sfx p),
rvec$sfx AS (
  SELECT vec_id, list(x ORDER BY k) AS rvec FROM rel$sfx GROUP BY vec_id)"""

  /** Twin of [[graft.ops.VectorOps.opqSweep]]: round 1's chain over
    * the raw embeddings, round 1's rotation applied, round 2's chain
    * over the rotated vectors, one stats row per round.
    */
  val embOpqSweep: String = {
    def statsRow(rnd: Int, sfx: String): String = s"""
  SELECT CAST($rnd AS BIGINT) AS round,
    CAST(count(*) AS BIGINT) AS n_pairs,
    (SELECT CAST(count(*) AS BIGINT) FROM rot$sfx) AS n_rotated,
    CAST(round(max(abs(corr)), 6) AS DOUBLE) AS max_abs_corr,
    CAST(round(CAST(sum(CAST(abs(corr) AS DECIMAL(20,10))) AS DOUBLE),
      6) AS DOUBLE) AS sum_abs_corr
  FROM base$sfx"""
    "WITH " + opqChainCtes("embeddings", "1") + "," +
      opqApplyCtes("embeddings", "1") + """,
r2 AS (SELECT vec_id, rvec AS embedding FROM rvec1),
""" + opqChainCtes("r2", "2") + """,
s1 AS (""" + statsRow(1, "1") + """),
s2 AS (""" + statsRow(2, "2") + """)
SELECT * FROM s1 UNION ALL SELECT * FROM s2 ORDER BY round"""
  }

  /** Unigram-LM twin of [[graft.ops.TextOps.unigramLogprob]]: ln cast
    * to DECIMAL(20,10) at the vocabulary level on both engines, sums
    * exact, threshold cross-multiplied.
    */
  val docUnigramLogprob: String = """
WITH toks AS (
  SELECT doc_id, source,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
total AS (SELECT count(*) AS tot FROM toks),
lp AS (
  SELECT tok,
    CAST(ln(CAST(cnt AS DOUBLE) / tot) AS DECIMAL(20,10)) AS lp
  FROM vocab, total),
perdoc AS (
  SELECT doc_id, source, sum(lp) AS s, count(*) AS n_toks
  FROM toks JOIN lp USING (tok)
  GROUP BY doc_id, source)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN s < CAST(-3.5 AS DECIMAL(20,10)) * n_toks
                THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
  round(CAST(sum(s) AS DOUBLE) / sum(n_toks), 4) AS avg_token_logprob
FROM perdoc
GROUP BY source
ORDER BY source"""

  /** Exact-regime KLL twin of
    * [[graft.analytics.Olap.qSketchQuantile]]: with no compaction the
    * sketch's quantile is the element at rank ⌊q·n⌋ (capped n−1) of
    * the sorted values, read here off a sorted list; the Spark side's
    * union row is the same multiset, so one list over all rows twins
    * it.
    */
  val qSketchQuantile: String = """
WITH vals AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS DOUBLE) AS v
  FROM lineitem),
per AS (
  SELECT flag, CAST(count(*) AS BIGINT) AS n, list_sort(list(v)) AS lv
  FROM vals GROUP BY flag),
allrow AS (
  SELECT 'ALL' AS flag, CAST(count(*) AS BIGINT) AS n,
    list_sort(list(v)) AS lv
  FROM vals),
u AS (SELECT * FROM per UNION ALL SELECT * FROM allrow)
SELECT flag, n,
  round(lv[CAST(least(floor(0.5 * n), n - 1) AS BIGINT) + 1], 6) AS p50,
  round(lv[CAST(least(floor(0.9 * n), n - 1) AS BIGINT) + 1], 6) AS p90
FROM u ORDER BY flag"""

  /** Cube twin of [[graft.analytics.Olap.qCube]]: DuckDB GROUPING()
    * bits recompose Spark's grouping_id (flag bit 1, status bit 0).
    */
  val qCube: String = """
SELECT coalesce(l_returnflag, 'ALL') AS flag,
  coalesce(l_linestatus, 'ALL') AS status,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
    AS gid,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
    AS sum_price,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY gid, flag, status"""

  /** Concentration twin of [[graft.ops.EventOps.eventsPareto]]: the
    * p99 cut read off the sorted per-user counts at the KLL
    * exact-regime rank convention (least(floor(q·n), n−1)).
    */
  val eventsPareto: String = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
    list_sort(list(CAST(n AS DOUBLE))) AS lv
  FROM per),
cut AS (
  SELECT n_users,
    lv[CAST(least(floor(0.99 * n_users), n_users - 1) AS BIGINT) + 1]
      AS p99
  FROM s)
SELECT n_users, CAST(sum(n) AS BIGINT) AS n_events,
  round(p99, 6) AS p99_cut,
  CAST(sum(CASE WHEN n >= p99 THEN 1 ELSE 0 END) AS BIGINT)
    AS top_users,
  CAST(sum(CASE WHEN n >= p99 THEN n ELSE 0 END) AS BIGINT)
    AS top_events,
  round(sum(CASE WHEN n >= p99 THEN n ELSE 0 END) * 100.0 / sum(n), 4)
    AS top_share_pct
FROM per, cut
GROUP BY n_users, p99"""

  /** Cohort-LTV twin of [[graft.ops.EventOps.eventsCohortLtv]]: same
    * epoch-nanos week division, DECIMAL revenue.
    */
  val eventsCohortLtv: String = """
WITH first_seen AS (
  SELECT user_id, min(epoch_ns(ts)) AS first_ns
  FROM events GROUP BY user_id)
SELECT first_ns // 604800000000000 AS cohort_week,
  (epoch_ns(e.ts) - first_ns) // 604800000000000 AS age_week,
  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_buyers,
  CAST(count(*) AS BIGINT) AS n_purchases,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM events e JOIN first_seen USING (user_id)
WHERE event_type = 'purchase'
GROUP BY 1, 2
ORDER BY 1, 2"""

  /** PII-scrub twin of [[graft.ops.TextOps.piiScrub]]: same planted
    * contacts, same RE2 patterns, 'g' flag mirrors Spark's
    * replace-all.
    */
  val docPiiScrub: String = """
WITH planted AS (
  SELECT source,
    CASE WHEN doc_id % 7 = 0
           THEN concat(text, ' contact alice@example.com or 555-123-4567')
         WHEN doc_id % 11 = 0 THEN concat(text, ' mail bob@test.org')
         ELSE text END AS text2
  FROM documents),
scored AS (
  SELECT source,
    len(regexp_extract_all(text2,
      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
    len(regexp_extract_all(text2, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))
      AS n_phones,
    length(regexp_replace(regexp_replace(text2,
      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_len
  FROM planted)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_pii_docs,
  CAST(sum(n_emails) AS BIGINT) AS n_emails,
  CAST(sum(n_phones) AS BIGINT) AS n_phones,
  CAST(sum(redacted_len) AS BIGINT) AS redacted_chars
FROM scored
GROUP BY source
ORDER BY source"""

  /** LSH-health twin of [[graft.ops.DedupOps.lshHealth]]: per-band
    * bucket statistics off the shared signature chain's `bsz` CTE.
    */
  val docLshHealth: String = minhashPairsCte + """
SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singleton,
  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_colliding,
  CAST(max(n) AS BIGINT) AS max_bucket,
  CAST(sum(CASE WHEN n > 1 THEN n * (n - 1) // 2 ELSE 0 END) AS BIGINT)
    AS n_cand_pairs
FROM bsz
GROUP BY band
ORDER BY band"""

  /** Unique-census twin of [[graft.ops.DedupOps.sourceUnique]]: the
    * theta A-NOT-B runs exact, so "in no other source" is a NOT
    * EXISTS.
    */
  val docSourceUnique: String = """
WITH docs2 AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror' AS source, text FROM documents WHERE doc_id % 5 = 0),
d AS (SELECT DISTINCT source, md5(lower(trim(text))) AS h FROM docs2),
cnt AS (SELECT source, count(*) AS n FROM d GROUP BY source),
uniq AS (
  SELECT source, count(*) AS nu
  FROM d x
  WHERE NOT EXISTS (SELECT 1 FROM d y
                    WHERE y.h = x.h AND y.source <> x.source)
  GROUP BY source)
SELECT c.source, CAST(c.n AS BIGINT) AS n_digests,
  CAST(coalesce(u.nu, 0) AS BIGINT) AS n_unique,
  round(coalesce(u.nu, 0) * 100.0 / c.n, 2) AS uniq_pct
FROM cnt c LEFT JOIN uniq u USING (source)
ORDER BY c.source"""

  /** Gram-power twin of [[graft.ops.VectorOps.gramPower]]: identical
    * double products cast to DECIMAL(27,12), exact sums, ordered-list
    * sequential norm fold.
    */
  val embGramPower: String = """
WITH cells AS (
  SELECT i.i AS i, j.j AS j,
    sum(CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE)
      * CAST(embedding[j.j + 1] AS DOUBLE) * 1e12 + 0.5)
      AS DECIMAL(38,0))) AS g
  FROM embeddings, range(64) i(i), range(64) j(j)
  GROUP BY 1, 2),
gv AS (SELECT i, CAST(sum(g) AS DOUBLE) / 1e12 AS v FROM cells GROUP BY i),
arr AS (SELECT list(v ORDER BY i) AS a FROM gv),
n AS (SELECT a,
  sqrt(list_sum(list_transform(a, x -> x * x))) AS nrm FROM arr)
SELECT CAST(i.i AS INT) AS dim, round(a[i.i + 1] / nrm, 6) AS component
FROM n, range(64) i(i)
ORDER BY dim"""

  /** Attribution twin of [[graft.ops.EventOps.eventsAttribution]]:
    * DuckDB's native ASOF JOIN against the custom AsOfJoinExec.
    */
  val eventsAttribution: String = """
WITH views AS (
  SELECT DISTINCT user_id AS v_user, ts AS view_ts
  FROM events WHERE event_type = 'view'),
attributed AS (
  SELECT p.event_id, p.value,
    (epoch_ns(p.ts) - epoch_ns(v.view_ts)) // 1000000000 AS lag_sec
  FROM (SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase') p
  ASOF JOIN views v ON p.user_id = v.v_user AND p.ts >= v.view_ts)
SELECT CASE WHEN lag_sec <= 1800 THEN 'session'
            WHEN lag_sec <= 86400 THEN 'day'
            ELSE 'older' END AS bucket,
  CAST(count(*) AS BIGINT) AS n_purchases,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  round(CAST(sum(lag_sec) AS DOUBLE) / count(*), 2) AS avg_lag_sec
FROM attributed
GROUP BY 1
ORDER BY bucket"""

  /** CCNet-tier twin of [[graft.ops.TextOps.ccnetBuckets]]: identical
    * tercile cuts (percentile ↔ quantile_cont), DECIMAL tier sums.
    */
  val docCcnetBuckets: String = """
WITH toks AS (
  SELECT doc_id, source,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
total AS (SELECT count(*) AS tot FROM toks),
lp AS (
  SELECT tok,
    CAST(ln(CAST(cnt AS DOUBLE) / tot) AS DECIMAL(20,10)) AS lp
  FROM vocab, total),
perdoc AS (
  SELECT doc_id, source,
    CAST(sum(lp) AS DOUBLE) / count(*) AS score
  FROM toks JOIN lp USING (tok)
  GROUP BY doc_id, source),
cuts AS (
  SELECT quantile_cont(score, 0.3333333333333333) AS t1,
    quantile_cont(score, 0.6666666666666666) AS t2
  FROM perdoc)
SELECT source,
  CASE WHEN score >= t2 THEN 'head'
       WHEN score >= t1 THEN 'middle'
       ELSE 'tail' END AS tier,
  CAST(count(*) AS BIGINT) AS n_docs,
  round(CAST(sum(CAST(score AS DECIMAL(20,10))) AS DOUBLE) / count(*), 4)
    AS avg_score
FROM perdoc, cuts
GROUP BY 1, 2
ORDER BY source, tier"""

  /** Exact-regime KLL twin of
    * [[graft.ops.TextOps.ccnetBucketsSketched]] at k above the doc
    * count: like [[docCcnetBuckets]] but the tercile cuts are the
    * sorted-rank elements at ⌊q·n⌋ (capped n−1) — exactly what the
    * uncompacted sketch returns (the `q_sketch_quantile` rank math,
    * with q = the IEEE doubles 1/3 and 2/3 both engines compute from
    * the same division).
    */
  val docCcnetSketched: String = """
WITH toks AS (
  SELECT doc_id, source,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents),
vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
total AS (SELECT count(*) AS tot FROM toks),
lp AS (
  SELECT tok,
    CAST(ln(CAST(cnt AS DOUBLE) / tot) AS DECIMAL(20,10)) AS lp
  FROM vocab, total),
perdoc AS (
  SELECT doc_id, source,
    CAST(sum(lp) AS DOUBLE) / count(*) AS score
  FROM toks JOIN lp USING (tok)
  GROUP BY doc_id, source),
ranked AS (
  SELECT CAST(count(*) AS BIGINT) AS n, list_sort(list(score)) AS lv
  FROM perdoc),
cuts AS (
  SELECT
    lv[CAST(least(floor((CAST(1 AS DOUBLE) / 3) * n), n - 1) AS BIGINT)
       + 1] AS t1,
    lv[CAST(least(floor((CAST(2 AS DOUBLE) / 3) * n), n - 1) AS BIGINT)
       + 1] AS t2
  FROM ranked)
SELECT source,
  CASE WHEN score >= t2 THEN 'head'
       WHEN score >= t1 THEN 'middle'
       ELSE 'tail' END AS tier,
  CAST(count(*) AS BIGINT) AS n_docs,
  round(CAST(sum(CAST(score AS DECIMAL(20,10))) AS DOUBLE) / count(*), 4)
    AS avg_score
FROM perdoc, cuts
GROUP BY 1, 2
ORDER BY source, tier"""

  /** Growth twin of [[graft.imaging.ImagingOps.datasetGrowth]]. */
  val imgDatasetGrowth: String = imagingCte + """
, monthly AS (
  SELECT strftime(d.date_time, '%Y-%m') AS month,
    CAST(count(*) AS BIGINT) AS n_datasets,
    CAST(sum(g.nbr_frames) AS BIGINT) AS month_frames
  FROM frames_global g JOIN data_set d ON g.dataset_id = d.id
  GROUP BY 1)
SELECT month, n_datasets, month_frames,
  CAST(sum(month_frames) OVER (ORDER BY month
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_frames,
  CAST(sum(month_frames) OVER (ORDER BY month
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    * 8388608 AS BIGINT) AS cum_bytes
FROM monthly
ORDER BY month"""

  /** Seasonality twin of
    * [[graft.ops.EventOps.eventsSeasonality]]: same epoch-integer
    * bucketing.
    */
  val eventsSeasonality: String = """
SELECT (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
  (epoch_ns(ts) // 3600000000000) % 24 AS hour,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY dow, hour"""

  /** Entropy twin of [[graft.ops.TextOps.tokenEntropy]]: identical
    * c·ln(c) DECIMAL(20,10) terms, per-doc rounding, DECIMAL roll-up.
    */
  val docTokenEntropy: String = """
WITH toks AS (
  SELECT doc_id, source,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents),
cnts AS (
  SELECT doc_id, source, tok, count(*) AS c
  FROM toks GROUP BY doc_id, source, tok),
perdoc AS (
  SELECT doc_id, source, sum(c) AS n, count(*) AS n_types,
    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax,
    sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
      AS DECIMAL(20,10))) AS s
  FROM cnts GROUP BY doc_id, source),
feat AS (
  SELECT source, n_hapax,
    round(ln(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / n, 4) AS entropy,
    round(CAST(n_types AS DOUBLE) / n, 4) AS ttr
  FROM perdoc)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN entropy < 3.2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_low_entropy,
  round(CAST(sum(CAST(entropy AS DECIMAL(14,4))) AS DOUBLE) / count(*),
    4) AS avg_entropy,
  round(CAST(sum(CAST(ttr AS DECIMAL(14,4))) AS DOUBLE) / count(*), 4)
    AS avg_ttr,
  CAST(sum(n_hapax) AS BIGINT) AS hapax_total
FROM feat
GROUP BY source
ORDER BY source"""

  /** RFM twin of [[graft.ops.EventOps.eventsRfm]]: integer day/cent
    * arithmetic, ntile(4) with the same user_id tie-break.
    */
  val eventsRfm: String = """
WITH per AS (
  SELECT user_id, max(epoch_ns(ts)) AS last_ts,
    CAST(count(*) AS BIGINT) AS freq,
    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS cents
  FROM events GROUP BY user_id),
ref AS (SELECT max(last_ts) AS ref_ts FROM per),
scored AS (
  SELECT cents,
    CAST(ntile(4) OVER (ORDER BY
      (ref_ts - last_ts) // 86400000000000, user_id) AS BIGINT)
      AS r_score,
    CAST(ntile(4) OVER (ORDER BY freq DESC, user_id) AS BIGINT)
      AS f_score,
    CAST(ntile(4) OVER (ORDER BY cents DESC, user_id) AS BIGINT)
      AS m_score
  FROM per, ref)
SELECT r_score, f_score, m_score,
  CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(cents) AS BIGINT) AS sum_cents
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score"""

  /** SQ8 twin of [[graft.ops.VectorOps.knnSq8]]: identical per-dim
    * [min,max] census, byte quantization with the same double
    * operation order, pure-BIGINT distance ranking.
    */
  val embKnnSq8: String = """
WITH dims AS (
  SELECT dd.d AS d,
    min(CAST(embedding[dd.d + 1] AS DOUBLE)) AS lo,
    max(CAST(embedding[dd.d + 1] AS DOUBLE)) AS hi
  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS d) dd
  GROUP BY dd.d),
codes AS (
  SELECT vec_id,
    list(CAST(greatest(0, least(255,
      floor((CAST(embedding[dd.d + 1] AS DOUBLE) - lo) * 255.0
        / ((CASE WHEN hi = lo THEN lo + 1.0 ELSE hi END) - lo)
        + 0.5))) AS BIGINT) ORDER BY dd.d) AS code
  FROM embeddings
  CROSS JOIN (SELECT unnest(range(64)) AS d) dd
  JOIN dims ON dims.d = dd.d
  GROUP BY vec_id),
q AS (SELECT vec_id AS qid, code AS qcode FROM codes WHERE vec_id < 10),
scored AS (
  SELECT qid, c.vec_id,
    CAST(list_sum(list_transform(list_zip(q.qcode, c.code),
      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS idist
  FROM codes c JOIN q ON c.vec_id <> q.qid)
SELECT qid, vec_id AS neighbor, idist, rank
FROM (
  SELECT qid, vec_id, idist,
    CAST(row_number() OVER (PARTITION BY qid ORDER BY idist, vec_id)
      AS BIGINT) AS rank
  FROM scored)
WHERE rank <= 5
ORDER BY qid, rank"""

  /** Path-analysis twin of [[graft.ops.EventOps.eventsPaths]]. */
  val eventsPaths: String = """
WITH seq AS (
  SELECT event_type AS t1,
    lead(event_type, 1) OVER (PARTITION BY user_id
      ORDER BY epoch_ns(ts), event_id) AS t2,
    lead(event_type, 2) OVER (PARTITION BY user_id
      ORDER BY epoch_ns(ts), event_id) AS t3
  FROM events)
SELECT t1 || '>' || t2 || '>' || t3 AS path,
  CAST(count(*) AS BIGINT) AS n
FROM seq
WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT 20"""

  /** Mixture twin of [[graft.ops.TextOps.mixWeights]]: identical token
    * length arithmetic and DECIMAL Zipf normalizer.
    */
  val docMixWeights: String = """
WITH per0 AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
      END) AS BIGINT) AS tokens
  FROM documents GROUP BY source),
per AS (
  SELECT *, CAST(1.0 / (CAST(substr(source, 4) AS INTEGER) + 1)
    AS DECIMAL(20,10)) AS raw_w
  FROM per0),
tot AS (SELECT sum(tokens) AS tot_tokens, sum(raw_w) AS tot_w FROM per),
shares AS (
  SELECT source, n_docs, tokens,
    round(CAST(tokens AS DOUBLE) / tot_tokens, 6) AS actual_share,
    round(CAST(raw_w AS DOUBLE) / CAST(tot_w AS DOUBLE), 6)
      AS target_share
  FROM per, tot)
SELECT source, n_docs, tokens, actual_share, target_share,
  round(target_share / actual_share, 4) AS sampling_weight
FROM shares
ORDER BY source"""

  /** nprobe-sweep twin of [[graft.ops.VectorOps.nprobeCurve]]: one
    * max-nprobe candidate scan carrying its probe rank, filtered per
    * level, ranked per (level, query), recalled against the brute
    * truth.
    */
  val embNprobeCurve: String = s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1
), probes AS (
  SELECT qid, qv, cell, crank FROM (
    SELECT e.vec_id AS qid, e.embedding AS qv, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 10)
  WHERE crank <= 8
), scored AS (
  SELECT p.qid, p.crank, a.vec_id,
    ${duckCos("p.qv", "a.embedding")} AS sim
  FROM probes p JOIN assigned a ON p.cell = a.cell AND p.qid <> a.vec_id
), levels AS (SELECT unnest([1, 2, 4, 8]) AS np),
top AS (
  SELECT np, qid, vec_id AS neighbor FROM (
    SELECT l.np, s.qid, s.vec_id,
      row_number() OVER (PARTITION BY l.np, s.qid
        ORDER BY s.sim DESC, s.vec_id) AS rk
    FROM scored s JOIN levels l ON s.crank <= l.np)
  WHERE rk <= 5
), truth AS (
  SELECT l.np, b.qid, b.neighbor
  FROM ($embKnnBrute) b CROSS JOIN levels l)
SELECT CAST(t.np AS BIGINT) AS nprobe,
  CAST(count(tp.neighbor) AS BIGINT) AS n_hits,
  CAST(count(*) AS BIGINT) AS n_truth,
  round(CAST(count(tp.neighbor) AS DOUBLE) / count(*), 4) AS recall
FROM truth t
LEFT JOIN top tp
  ON t.np = tp.np AND t.qid = tp.qid AND t.neighbor = tp.neighbor
GROUP BY t.np
ORDER BY nprobe"""

  /** nlist-sweep twin of [[graft.ops.VectorOps.ivfNlistSweep]]: per
    * codebook size a full assignment/probe/search replica (the
    * embKnnIvf shape parameterized by the `vec_id < k` seed prefix),
    * occupancy census + recall against the shared brute truth.
    */
  val embIvfNlistSweep: String = {
    def perK(k: Int) = s"""
cents$k AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < $k),
assigned$k AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents$k c)
  WHERE crank <= 1),
occ$k AS (
  SELECT count(*) AS used, max(n) AS maxc FROM (
    SELECT cell, count(*) AS n FROM assigned$k GROUP BY cell)),
probes$k AS (
  SELECT qid, qv, cell FROM (
    SELECT e.vec_id AS qid, e.embedding AS qv, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents$k c WHERE e.vec_id < 10)
  WHERE crank <= 4),
top$k AS (
  SELECT qid, vec_id FROM (
    SELECT s.qid, s.vec_id,
      row_number() OVER (PARTITION BY s.qid
        ORDER BY s.sim DESC, s.vec_id) AS rank
    FROM (
      SELECT p.qid, a.vec_id, ${duckCos("p.qv", "a.embedding")} AS sim
      FROM probes$k p JOIN assigned$k a
        ON p.cell = a.cell AND p.qid <> a.vec_id) s)
  WHERE rank <= 5),
hits$k AS (
  SELECT count(*) AS h FROM truth t
  JOIN top$k m ON t.qid = m.qid AND t.neighbor = m.vec_id)"""
    def row(k: Int) = s"""
  SELECT CAST($k AS BIGINT) AS nlist,
    (SELECT CAST(used AS BIGINT) FROM occ$k) AS n_cells_used,
    (SELECT CAST(maxc AS BIGINT) FROM occ$k) AS max_cell,
    (SELECT CAST(h AS BIGINT) FROM hits$k) AS n_hits,
    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth"""
    s"""WITH truth AS (SELECT qid, neighbor FROM ($embKnnBrute) tb),${
      Seq(8, 16, 32).map(perK).mkString(",")}
SELECT nlist, n_cells_used, max_cell, n_hits, n_truth,
  round(CAST(n_hits AS DOUBLE) / n_truth, 4) AS recall
FROM (${Seq(8, 16, 32).map(row).mkString("\n  UNION ALL")}
)
ORDER BY nlist"""
  }

  /** Funnel twin of [[graft.ops.DedupOps.survivalFunnel]]: identical
    * stage predicates — digest keeper, the shared minhashChain pair
    * derivation over the exact-dedup representatives, the quality-gate
    * flags on text length, and the eval-shingle semi-join.
    */
  /** Twin of [[graft.ops.DedupOps.domainCensus]]: the identical
    * deterministic domain derivation (base-id 37-bucket, tld by
    * bucket, blocklist at bkt % 11 == 3) over the planted-dup corpus,
    * digest partials then the per-domain census.
    */
  val docDomainCensus: String = """WITH corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 5 = 0
), dom AS (
  SELECT source || '-' || CAST(bkt AS VARCHAR) ||
      CASE bkt % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.org' ELSE '.net' END
      AS domain,
    (bkt % 11 = 3) AS blocked,
    md5(lower(trim(text))) AS h
  FROM (SELECT doc_id, text, source,
      CAST(doc_id % 1000000 % 37 AS INT) AS bkt FROM corpus)
), dg AS (
  SELECT domain, blocked, h, count(*) AS nh FROM dom GROUP BY 1, 2, 3)
SELECT domain, blocked, CAST(sum(nh) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_unique,
  round(CAST(sum(nh) AS DOUBLE) / count(*), 4) AS dup_ratio
FROM dg GROUP BY domain, blocked
ORDER BY domain"""

  private val funnelPrefix: String = """WITH stage0 AS (
  SELECT doc_id, source, lang, text,
    (CAST(doc_id % 1000000 % 37 AS INT) % 11 = 3) AS blocked
  FROM (
    SELECT doc_id, source, lang, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, source, lang, text
    FROM documents
    WHERE doc_id % 5 = 0)
  WHERE doc_id >= 10
), hashed AS (
  SELECT doc_id, source, text, NOT blocked AS surv0,
    md5(lower(trim(text))) AS h FROM stage0
), keep1 AS (
  SELECT h, min(doc_id) AS keeper FROM hashed WHERE surv0 GROUP BY h),
s1 AS (
  SELECT hashed.doc_id, hashed.source, hashed.text, hashed.surv0,
    (hashed.surv0 AND coalesce(hashed.doc_id = keep1.keeper, false))
      AS surv1
  FROM hashed LEFT JOIN keep1 ON hashed.h = keep1.h
), repdocs AS (SELECT doc_id, text FROM s1 WHERE surv1),
sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(toks) >= 3 THEN
      list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      ELSE [text] END) AS shset
  FROM (
    SELECT doc_id, text,
      list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM repdocs)
)""" + minhashChain("sh") + """
, neardrop AS (SELECT DISTINCT doc2 AS doc_id FROM pairs),
sh0 AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(toks) >= 3 THEN
      list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      ELSE [text] END) AS shset
  FROM (
    SELECT doc_id, text,
      list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM stage0)
), evalsh AS (
  SELECT DISTINCT unnest(shset) AS s FROM (
    SELECT list_distinct(CASE WHEN len(toks) >= 3 THEN
        list_transform(range(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        ELSE [text] END) AS shset
    FROM (
      SELECT text,
        list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
      FROM documents WHERE doc_id < 10))
), contam AS (
  SELECT DISTINCT x.doc_id FROM (
    SELECT doc_id, unnest(shset) AS s FROM sh0) x
  JOIN evalsh e ON x.s = e.s
), nbtoks AS (
  SELECT doc_id, lang,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents
), nbmodel AS (
  SELECT tok, lang AS c, CAST(count(*) AS BIGINT) AS cnt
  FROM nbtoks GROUP BY tok, lang
), nbg AS (
  SELECT count(DISTINCT tok) AS v FROM nbtoks
), nbclasses AS (
  SELECT lang AS c,
    CAST(ln(CAST(count(DISTINCT doc_id) AS DOUBLE)
      / (SELECT count(*) FROM documents)) AS DECIMAL(20,10)) AS prior,
    ln(CAST(count(*) + (SELECT v FROM nbg) AS DOUBLE)) AS lnzd
  FROM nbtoks GROUP BY lang
), ftoks AS (
  SELECT doc_id, lang,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM stage0
), ftf AS (
  SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS tf
  FROM ftoks GROUP BY doc_id, lang, tok
), fevidence AS (
  SELECT doc_id, c,
    sum(CAST(ln(CAST(cnt + 1 AS DOUBLE)) * tf AS DECIMAL(28,10)))
      AS ev
  FROM ftf JOIN nbmodel USING (tok)
  GROUP BY doc_id, c
), fperdoc AS (
  SELECT doc_id, lang, sum(tf) AS n_toks FROM ftf
  GROUP BY doc_id, lang
), fscores AS (
  SELECT p.doc_id, p.lang, cl.c,
    cl.prior + coalesce(e.ev, CAST(0 AS DECIMAL(28,10)))
      - CAST(p.n_toks * cl.lnzd AS DECIMAL(28,10)) AS score
  FROM fperdoc p CROSS JOIN nbclasses cl
  LEFT JOIN fevidence e ON e.doc_id = p.doc_id AND e.c = cl.c
), fpred AS (
  SELECT doc_id, (c = lang) AS lang_ok FROM (
    SELECT doc_id, lang, c,
      row_number() OVER (PARTITION BY doc_id
        ORDER BY score DESC, c) AS rnk
    FROM fscores)
  WHERE rnk = 1
), flags AS (
  SELECT s1.source, s1.surv0, s1.surv1,
    (s1.surv1 AND nd.doc_id IS NULL) AS surv2,
    (length(s1.text) >= 100
      AND len(list_filter(string_split(lower(s1.text), ' '),
        x -> x <> '')) >= 20
      AND NOT (2 * len(list_filter(string_split(lower(s1.text), ' '),
        x -> x = 'the' OR x = 'a'))
        > len(list_filter(string_split(lower(s1.text), ' '),
          x -> x <> '')))) AS quality,
    (c.doc_id IS NULL) AS clean,
    coalesce(fp.lang_ok, false) AS lang_ok,
    CAST(len(list_filter(string_split(lower(s1.text), ' '),
      x -> x <> '')) AS BIGINT) AS n_tokens
  FROM s1
  LEFT JOIN neardrop nd ON s1.doc_id = nd.doc_id
  LEFT JOIN contam c ON s1.doc_id = c.doc_id
  LEFT JOIN fpred fp ON s1.doc_id = fp.doc_id)"""

  val docSurvivalFunnel: String = funnelPrefix + """
SELECT source,
  CAST(count(*) AS BIGINT) AS n_raw,
  CAST(sum(CASE WHEN surv0 THEN 1 ELSE 0 END) AS BIGINT) AS n_domain,
  CAST(sum(CASE WHEN surv1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
  CAST(sum(CASE WHEN surv2 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
  CAST(sum(CASE WHEN surv2 AND quality THEN 1 ELSE 0 END) AS BIGINT)
    AS n_quality,
  CAST(sum(CASE WHEN surv2 AND quality AND clean THEN 1 ELSE 0 END)
    AS BIGINT) AS n_clean,
  CAST(sum(CASE WHEN surv2 AND quality AND clean AND lang_ok
    THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
  round(CAST(sum(CASE WHEN surv2 AND quality AND clean AND lang_ok
    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS retention
FROM flags
GROUP BY source
ORDER BY source"""

  /** Token-mass twin of [[graft.ops.DedupOps.funnelTokens]]: the same
    * gate chain aggregated over per-doc whitespace token counts.
    */
  val docFunnelTokens: String = funnelPrefix + """
SELECT source,
  CAST(sum(n_tokens) AS BIGINT) AS t_raw,
  CAST(sum(CASE WHEN surv0 THEN n_tokens ELSE 0 END) AS BIGINT)
    AS t_domain,
  CAST(sum(CASE WHEN surv1 THEN n_tokens ELSE 0 END) AS BIGINT)
    AS t_exact,
  CAST(sum(CASE WHEN surv2 THEN n_tokens ELSE 0 END) AS BIGINT)
    AS t_near,
  CAST(sum(CASE WHEN surv2 AND quality THEN n_tokens ELSE 0 END)
    AS BIGINT) AS t_quality,
  CAST(sum(CASE WHEN surv2 AND quality AND clean THEN n_tokens
    ELSE 0 END) AS BIGINT) AS t_clean,
  CAST(sum(CASE WHEN surv2 AND quality AND clean AND lang_ok
    THEN n_tokens ELSE 0 END) AS BIGINT) AS t_lang,
  round(CAST(sum(CASE WHEN surv2 AND quality AND clean AND lang_ok
    THEN n_tokens ELSE 0 END) AS DOUBLE) / sum(n_tokens), 4)
    AS token_retention
FROM flags
GROUP BY source
ORDER BY source"""

  /** Every oracle, keyed like SparkEntry.queries. */
  /** Purity twin of [[graft.ops.VectorOps.cellPurity]]: the
    * [[embIvfBalance]] assignment with the label carried, majority
    * with (count desc, label) tie-break.
    */
  val embCellPurity: String = s"""
WITH cents AS (
  SELECT vec_id AS ccid, embedding AS ccv FROM embeddings WHERE vec_id < 16
), cellof AS (
  SELECT cell, label FROM (
    SELECT e.label, c.ccid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.ccv")}, c.ccid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1
), counts AS (
  SELECT cell, label, count(*) AS n FROM cellof GROUP BY cell, label
), per AS (
  SELECT cell, label, n,
    row_number() OVER (PARTITION BY cell ORDER BY n DESC, label) AS rk,
    sum(n) OVER (PARTITION BY cell) AS n_vecs,
    count(*) OVER (PARTITION BY cell) AS n_labels
  FROM counts)
SELECT cell, CAST(n_vecs AS BIGINT) AS n_vecs,
  CAST(n_labels AS BIGINT) AS n_labels,
  CAST(label AS INT) AS majority_label, CAST(n AS BIGINT) AS majority_n,
  round(n * 100.0 / n_vecs, 4) AS purity_pct
FROM per WHERE rk = 1 ORDER BY cell"""

  /** Ladder twin of [[graft.ops.VectorOps.recallLadder]]: each rung's
    * full oracle query nests as a derived table (CTE names scope to
    * the parentheses), truth joined per method — the ladder is
    * literally the composition of the four oracle-checked searches.
    */
  val embRecallLadder: String = ladderSqlOf(withOpq = false)

  /** Five-rung twin of [[graft.ops.VectorOps.recallLadderOpq]]: the
    * same composition plus the `opq8` rung nesting [[embKnnOpq]].
    */
  val embRecallLadderOpq: String = ladderSqlOf(withOpq = true)

  private def ladderSqlOf(withOpq: Boolean): String = {
    def sub(q: String) = "(" + q + ") "
    def hit(m: String) =
      s"""CAST((SELECT count(*) FROM truth t JOIN ${sub(m)} m
        ON t.qid = m.qid AND t.neighbor = m.neighbor) AS BIGINT)"""
    val opqRung = if (withOpq) s"""
  UNION ALL
  SELECT 'opq8', CAST(8 AS BIGINT), ${hit(embKnnOpq)},
    (SELECT n FROM nt)""" else ""
    s"""WITH truth AS (SELECT qid, neighbor FROM ${sub(embKnnBrute)} tb),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM truth)
SELECT method, bytes_per_vec, n_hits, n_truth,
  round(CAST(n_hits AS DOUBLE) / n_truth, 4) AS recall
FROM (
  SELECT 'float32' AS method, CAST(256 AS BIGINT) AS bytes_per_vec,
    (SELECT n FROM nt) AS n_hits, (SELECT n FROM nt) AS n_truth
  UNION ALL
  SELECT 'sq8', CAST(64 AS BIGINT), ${hit(embKnnSq8)},
    (SELECT n FROM nt)
  UNION ALL
  SELECT 'pq8', CAST(8 AS BIGINT), ${hit(embKnnPq)},
    (SELECT n FROM nt)
  UNION ALL
  SELECT 'ivfpq', CAST(8 AS BIGINT), ${hit(embKnnIvfPq)},
    (SELECT n FROM nt)$opqRung
)
ORDER BY method"""
  }

  /** BM25 twin of [[graft.ops.TextOps.bm25TopK]]: anchor queries are
    * each doc_id < 8's top-3 tf-idf terms (the [[docTfidf]] ranking
    * contract verbatim), scoring is Robertson BM25 at k1=1.2 b=0.75
    * with per-term contributions cast to DECIMAL(28,10) before the
    * sum (order-independent), rank ties (score DESC, doc_id).
    */
  private def bm25SqlOf(cap: Option[Int]): String = {
    // impact capping orders by the per-posting BM25 contribution with
    // the per-term idf factor dropped (constant within a term) — the
    // r14 score-quantized ordering; every operand is forced DOUBLE so
    // DuckDB's decimal-literal arithmetic cannot diverge from Spark's
    val postings = cap.fold("SELECT tok, doc_id, tf FROM tf")(m => s"""
  SELECT tok, doc_id, tf FROM (
    SELECT t.tok, t.doc_id, t.tf,
      row_number() OVER (PARTITION BY t.tok ORDER BY
        CAST(t.tf AS DOUBLE) * 2.2 / (CAST(t.tf AS DOUBLE)
          + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / g.avgdl))
        DESC, t.doc_id) AS prnk
    FROM tf t JOIN dl ON t.doc_id = dl.doc_id CROSS JOIN gstats g)
  WHERE prnk <= $m""")
    s"""
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
  FROM toks GROUP BY doc_id
), gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
), qscored AS (
  SELECT tf.doc_id AS qid, tf.tok,
    CAST(round(tf.tf * ln((g.n_docs + 1.0) / (df.df + 1.0)), 6)
      AS DOUBLE) AS tfidf
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN gstats g
  WHERE tf.doc_id < 8
), qterms AS (
  SELECT qid, tok FROM (
    SELECT qid, tok,
      row_number() OVER (PARTITION BY qid ORDER BY tfidf DESC, tok)
        AS rnk
    FROM qscored)
  WHERE rnk <= 3
), postings AS ($postings
), scored AS (
  SELECT q.qid, p.doc_id,
    sum(CAST(
      ln(1.0 + (g.n_docs - df.df + 0.5) / (df.df + 0.5))
        * (p.tf * 2.2)
        / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / g.avgdl))
      AS DECIMAL(28,10))) AS s
  FROM postings p JOIN qterms q ON p.tok = q.tok AND p.doc_id <> q.qid
  JOIN df ON p.tok = df.tok
  JOIN dl ON p.doc_id = dl.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, p.doc_id
)
SELECT qid, rank, doc_id,
  CAST(round(CAST(s AS DOUBLE), 6) AS DOUBLE) AS score
FROM (
  SELECT qid, doc_id, s,
    CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, doc_id)
      AS BIGINT) AS rank
  FROM scored)
WHERE rank <= 5
ORDER BY qid, rank"""
  }

  val docBm25TopK: String = bm25SqlOf(None)

  /** Impact-capped twin of [[graft.ops.TextOps.bm25Pruned]]: postings
    * per term capped at the top-256 by (per-posting BM25 impact DESC,
    * doc_id) — the r14 score-quantized impact order; global
    * statistics exact.
    */
  val docBm25Pruned: String = bm25SqlOf(Some(256))

  /** Recall twin of [[graft.ops.TextOps.bm25Recall]]: composes the
    * full and impact-capped oracles and counts the per-query overlap.
    */
  val docBm25Recall: String = s"""
WITH base AS (SELECT qid, doc_id FROM (${bm25SqlOf(None)}) b),
pr AS (SELECT qid, doc_id FROM (${bm25SqlOf(Some(256))}) p)
SELECT base.qid,
  CAST(count(pr.doc_id) AS BIGINT) AS n_hits,
  CAST(count(*) AS BIGINT) AS k,
  round(CAST(count(pr.doc_id) AS DOUBLE) / count(*), 4) AS recall
FROM base
LEFT JOIN pr ON base.qid = pr.qid AND base.doc_id = pr.doc_id
GROUP BY base.qid
ORDER BY base.qid"""

  /** Recall-curve twin of [[graft.ops.TextOps.bm25RecallCurve]]:
    * the capped oracle evaluated at each M ∈ {16, 64, 256} (the
    * row_number cap with the same (tf DESC, doc_id) ordering is
    * exactly the engine's top-256 prefix at each M), graded against
    * the full top-5 per query.
    */
  val docBm25RecallCurve: String = s"""
WITH base AS (SELECT qid, doc_id FROM (${bm25SqlOf(None)}) b),
levels AS (SELECT CAST(unnest([16, 64, 256]) AS BIGINT) AS m),
pr AS (
  SELECT CAST(16 AS BIGINT) AS m, qid, doc_id
    FROM (${bm25SqlOf(Some(16))}) a
  UNION ALL
  SELECT CAST(64 AS BIGINT) AS m, qid, doc_id
    FROM (${bm25SqlOf(Some(64))}) c
  UNION ALL
  SELECT CAST(256 AS BIGINT) AS m, qid, doc_id
    FROM (${bm25SqlOf(Some(256))}) d)
SELECT base.qid, l.m,
  CAST(count(pr.doc_id) AS BIGINT) AS n_hits,
  CAST(count(*) AS BIGINT) AS k,
  round(CAST(count(pr.doc_id) AS DOUBLE) / count(*), 4) AS recall
FROM base CROSS JOIN levels l
LEFT JOIN pr ON pr.m = l.m AND base.qid = pr.qid
  AND base.doc_id = pr.doc_id
GROUP BY base.qid, l.m
ORDER BY base.qid, l.m"""

  /** Hybrid-retrieval twin of [[graft.ops.TextOps.hybridTopK]]:
    * composes the two existing engine oracles as derived tables (the
    * emb_recall_ladder precedent) and fuses on exact INTEGER
    * reciprocal-rank arithmetic — lcm(61..65) = 495593280 divided by
    * (60 + rank) is an exact BIGINT on both engines, so there is no
    * float sum to disagree about.
    */
  private def hybridSqlOf(bmSql: String, knSql: String): String = s"""
WITH bm AS (SELECT qid, doc_id, rank AS br FROM ($bmSql) x),
kn AS (
  SELECT qid, neighbor AS doc_id, rank AS kr
  FROM ($knSql) y WHERE qid < 8),
fused AS (
  SELECT COALESCE(bm.qid, kn.qid) AS qid,
    COALESCE(bm.doc_id, kn.doc_id) AS doc_id,
    COALESCE(495593280 // (60 + bm.br), 0)
      + COALESCE(495593280 // (60 + kn.kr), 0) AS rrf,
    bm.br, kn.kr
  FROM bm FULL OUTER JOIN kn
    ON bm.qid = kn.qid AND bm.doc_id = kn.doc_id)
SELECT qid, rank, doc_id, CAST(rrf AS BIGINT) AS rrf_scaled,
  br AS bm25_rank, kr AS knn_rank
FROM (
  SELECT qid, doc_id, rrf, br, kr,
    CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id)
      AS BIGINT) AS rank
  FROM fused)
WHERE rank <= 5
ORDER BY qid, rank"""

  val docHybridTopK: String = hybridSqlOf(bm25SqlOf(None), embKnnBrute)

  /** The scale-path hybrid: both engine oracles swapped for their
    * approximations (impact-capped BM25 at the recorded M=256, the
    * 4-probe IVF kNN) under the identical fusion SQL.
    */
  val docHybridIvf: String =
    hybridSqlOf(bm25SqlOf(Some(256)), embKnnIvf)

  /** The stored-engine hybrid twin of
    * [[graft.ops.TextOps.hybridTopKStored]]: the same fusion SQL over
    * the two persisted engines' oracles — the capped BM25 at the
    * recorded M=256 (what the TermIndexStore companion serves) and
    * the IVF+PQ ADC search (what the VectorIndex codes table serves).
    */
  val docHybridStored: String =
    hybridSqlOf(bm25SqlOf(Some(256)), embKnnIvfPq)

  /** The exact-lexical stored hybrid
    * ([[graft.ops.TextOps.hybridTopKExactStored]]): MaxScore serves
    * the EXACT BM25 ranking, so the lexical side is the uncapped
    * oracle; the vector side stays the stored IVF+PQ oracle.
    */
  val docHybridExactStored: String =
    hybridSqlOf(bm25SqlOf(None), embKnnIvfPq)

  /** The ceiling-lifted corner
    * ([[graft.ops.TextOps.hybridTopKRefinedStored]]): exact BM25 ×
    * the REFINED stored vector engine (over-fetch + exact rescore).
    */
  val docHybridRefinedStored: String =
    hybridSqlOf(bm25SqlOf(None), embKnnRefine)

  /** Fused-list recall twin of [[graft.ops.TextOps.hybridRecall]]. */
  val docHybridRecall: String = s"""
WITH base AS (SELECT qid, doc_id FROM ($docHybridTopK) b),
pr AS (SELECT qid, doc_id FROM ($docHybridIvf) p)
SELECT base.qid,
  CAST(count(pr.doc_id) AS BIGINT) AS n_hits,
  CAST(count(*) AS BIGINT) AS k,
  round(CAST(count(pr.doc_id) AS DOUBLE) / count(*), 4) AS recall
FROM base
LEFT JOIN pr ON base.qid = pr.qid AND base.doc_id = pr.doc_id
GROUP BY base.qid
ORDER BY base.qid"""

  /** BPE first-merge twin of [[graft.ops.TextOps.bpePairs]]: the same
    * vocabulary-census-first expansion (pair work is vocab-sized),
    * weighted pair counts, top-50 by (weight DESC, pair).
    */
  val docBpePairs: String = """
WITH vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
      x -> x <> '')) AS tok
    FROM documents)
  GROUP BY tok
  HAVING length(tok) >= 2
), expanded AS (
  SELECT tok, n,
    unnest(generate_series(1, length(tok) - 1)) AS i
  FROM vocab
), occ AS (
  SELECT tok, substr(tok, i, 2) AS pair, any_value(n) AS n,
    CAST(count(*) AS BIGINT) AS occ
  FROM expanded GROUP BY tok, pair
), top AS (
  SELECT pair, CAST(sum(n * occ) AS BIGINT) AS n_weighted,
    CAST(count(*) AS BIGINT) AS n_types
  FROM occ GROUP BY pair
  ORDER BY n_weighted DESC, pair LIMIT 50
)
SELECT
  CAST(row_number() OVER (ORDER BY n_weighted DESC, pair) AS BIGINT)
    AS rank,
  pair, n_weighted, n_types
FROM top
ORDER BY rank"""

  /** BPE-iteration-2 twin of [[graft.ops.TextOps.bpeMergeStep]]: the
    * same winner selection (weight DESC, pair), leftmost-greedy
    * `replace` into the chr(1) sentinel, and pair census over the
    * symbol stream with the merged symbol displayed as `[xy]`.
    */
  val docBpeMergeStep: String = """
WITH vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
      x -> x <> '')) AS tok
    FROM documents)
  GROUP BY tok
  HAVING length(tok) >= 2
), occ1 AS (
  SELECT tok, substr(tok, i, 2) AS pair, any_value(n) AS n,
    CAST(count(*) AS BIGINT) AS occ
  FROM (
    SELECT tok, n, unnest(generate_series(1, length(tok) - 1)) AS i
    FROM vocab)
  GROUP BY tok, pair
), winner AS (
  SELECT pair AS mp FROM (
    SELECT pair, sum(n * occ) AS w FROM occ1 GROUP BY pair
    ORDER BY w DESC, pair LIMIT 1)
), merged AS (
  SELECT n, mp, replace(tok, mp, chr(1)) AS sym
  FROM vocab CROSS JOIN winner
  WHERE length(replace(tok, mp, chr(1))) >= 2
), expanded AS (
  SELECT sym, n, mp,
    unnest(generate_series(1, length(sym) - 1)) AS i
  FROM merged
), occ2 AS (
  SELECT sym,
    concat(
      CASE WHEN substr(sym, i, 1) = chr(1)
        THEN concat('[', mp, ']') ELSE substr(sym, i, 1) END,
      '+',
      CASE WHEN substr(sym, i + 1, 1) = chr(1)
        THEN concat('[', mp, ']') ELSE substr(sym, i + 1, 1) END)
      AS pair,
    any_value(n) AS n, CAST(count(*) AS BIGINT) AS occ
  FROM expanded GROUP BY sym, pair
), top AS (
  SELECT pair, CAST(sum(n * occ) AS BIGINT) AS n_weighted,
    CAST(count(*) AS BIGINT) AS n_types
  FROM occ2 GROUP BY pair
  ORDER BY n_weighted DESC, pair LIMIT 20
)
SELECT
  CAST(row_number() OVER (ORDER BY n_weighted DESC, pair) AS BIGINT)
    AS rank,
  pair, n_weighted, n_types
FROM top
ORDER BY rank"""

  /** Prototype-pruning twin of
    * [[graft.ops.VectorOps.prototypePrune]]: the k ∝ N nearest-cell
    * assignment (the [[embKnnGraph]] codebook expression), per-cell
    * hardness rank (cosine ASC, vec_id), keep the hardest ceil(n/2),
    * DECIMAL mean cosines.
    */
  val embPrototypePrune: String = s"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < (SELECT greatest(16,
    CAST(ceil(count(*) / 128.0) AS BIGINT)) FROM embeddings)
), cellof AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY -${duckCos("e.embedding", "c.cv")}, c.cid) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1
), h AS (
  SELECT a.vec_id, a.cell,
    ${duckCos("e.embedding", "c.cv")} AS hcos
  FROM cellof a
  JOIN embeddings e ON a.vec_id = e.vec_id
  JOIN cents c ON a.cell = c.cid
), r AS (
  SELECT cell, hcos,
    row_number() OVER (PARTITION BY cell ORDER BY hcos ASC, vec_id)
      AS rnk,
    count(*) OVER (PARTITION BY cell) AS nc
  FROM h
), k AS (
  SELECT cell, hcos, (rnk <= (nc + 1) // 2) AS kept FROM r
)
SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(round(max(CASE WHEN kept THEN hcos END), 6) AS DOUBLE)
    AS cut_cos,
  CAST(round(
    CAST(sum(CASE WHEN kept THEN CAST(hcos AS DECIMAL(28,12)) END)
      AS DOUBLE)
    / sum(CASE WHEN kept THEN 1 ELSE 0 END), 6) AS DOUBLE)
    AS kept_mean_cos,
  CAST(round(
    CAST(sum(CASE WHEN NOT kept THEN CAST(hcos AS DECIMAL(28,12)) END)
      AS DOUBLE)
    / sum(CASE WHEN NOT kept THEN 1 ELSE 0 END), 6) AS DOUBLE)
    AS drop_mean_cos
FROM k GROUP BY cell ORDER BY cell"""

  /** One BPE round for [[docBpeTrain]]: pair census over the previous
    * symbol table, (weight DESC, pair) winner, leftmost-greedy merge
    * into chr(k), post-merge corpus symbol count. Every CTE is
    * MATERIALIZED — each round references the previous round twice
    * (census + merge), so DuckDB's default inlining would expand the
    * 8-round chain exponentially (measured: minutes vs 0.2 s).
    */
  private def bpeRoundCtes(k: Int): String = s"""
occ$k AS MATERIALIZED (
  SELECT sym, substr(sym, i, 2) AS pair, any_value(n) AS n,
    CAST(count(*) AS BIGINT) AS occ
  FROM (SELECT sym, n,
          unnest(generate_series(1, length(sym) - 1)) AS i
        FROM v${k - 1} WHERE length(sym) >= 2)
  GROUP BY sym, pair),
w$k AS MATERIALIZED (
  SELECT pair AS p$k, CAST(sum(n * occ) AS BIGINT) AS w$k
  FROM occ$k GROUP BY pair
  ORDER BY w$k DESC, p$k LIMIT 1),
v$k AS MATERIALIZED (
  SELECT replace(sym, (SELECT p$k FROM w$k), chr($k)) AS sym, n
  FROM v${k - 1}),
s$k AS MATERIALIZED (
  SELECT CAST(sum(n * length(sym)) AS BIGINT) AS ts$k FROM v$k)"""

  /** Eight-round training-chain twin of
    * [[graft.ops.TextOps.bpeTrain]]: the [[docBpeMergeStep]] cycle
    * run eight times, winners displayed with nested bracket
    * expansion, per-round post-merge symbol totals.
    */
  val docBpeTrain: String = {
    val rounds = 8
    val joinAll = ((1 to rounds).map(k => s"w$k")
      ++ (1 to rounds).map(k => s"s$k")).mkString(", ")
    val dispCtes = (1 to rounds).map { k =>
      val expanded = (1 until k).foldLeft(s"p$k") { (e, j) =>
        s"replace($e, chr($j), d$j)"
      }
      s"dx$k AS (SELECT *, '[' || $expanded || ']' AS d$k FROM dx${k - 1})"
    }.mkString(",\n")
    val unions = (1 to rounds).map(k =>
      s"  SELECT CAST($k AS BIGINT) AS round, d$k AS merge_display," +
        s" w$k AS n_weighted, ts$k AS total_symbols FROM dx$rounds")
      .mkString("\n  UNION ALL\n")
    s"""
WITH v0 AS MATERIALIZED (
  SELECT tok AS sym, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
      x -> x <> '')) AS tok
    FROM documents)
  GROUP BY tok
  HAVING length(tok) >= 2),
${(1 to rounds).map(bpeRoundCtes).mkString(",\n")},
dx0 AS (SELECT * FROM $joinAll),
$dispCtes
SELECT round, merge_display, n_weighted, total_symbols FROM (
$unions)
ORDER BY round"""
  }

  /** Trained-vocabulary twin of [[graft.ops.TextOps.bpeVocab]]: the
    * same eight-round chain, final symbol stream censused per symbol
    * (vocab mass × within-token occurrences), top-50 by (mass DESC,
    * raw symbol), sentinels displayed with the nested bracket
    * expansion.
    */
  val docBpeVocab: String = {
    val rounds = 8
    val joinAll = (1 to rounds).map(k => s"w$k").mkString(", ")
    val dispCtes = (1 to rounds).map { k =>
      val expanded = (1 until k).foldLeft(s"p$k") { (e, j) =>
        s"replace($e, chr($j), d$j)"
      }
      s"dx$k AS (SELECT *, '[' || $expanded || ']' AS d$k FROM dx${k - 1})"
    }.mkString(",\n")
    val dispCase = (1 to rounds)
      .map(k => s"WHEN s = chr($k) THEN (SELECT d$k FROM dx$rounds)")
      .mkString(" ")
    s"""
WITH v0 AS MATERIALIZED (
  SELECT tok AS sym, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
      x -> x <> '')) AS tok
    FROM documents)
  GROUP BY tok
  HAVING length(tok) >= 2),
${(1 to rounds).map(bpeRoundCtes).mkString(",\n")},
dx0 AS (SELECT * FROM $joinAll),
$dispCtes,
symb AS (
  SELECT sym, substr(sym, i, 1) AS s, any_value(n) AS n,
    CAST(count(*) AS BIGINT) AS occ
  FROM (SELECT sym, n, unnest(generate_series(1, length(sym))) AS i
        FROM v$rounds)
  GROUP BY sym, s),
top AS (
  SELECT s, CAST(sum(n * occ) AS BIGINT) AS n_weighted,
    CAST(count(*) AS BIGINT) AS n_types
  FROM symb GROUP BY s
  ORDER BY n_weighted DESC, s LIMIT 50)
SELECT
  CAST(row_number() OVER (ORDER BY n_weighted DESC, s) AS BIGINT)
    AS rank,
  CASE $dispCase ELSE s END AS symbol,
  n_weighted, n_types
FROM top
ORDER BY rank"""
  }

  /** Trained-fertility twin of
    * [[graft.ops.TextOps.fertilityTrained]]: replays the SAME
    * eight-round merge chain ([[bpeRoundCtes]]), then applies the
    * winners in training order (leftmost-greedy `replace` into
    * chr(k)) over the (source × lang × token) vocabulary census and
    * aggregates real-subword fertility per stratum.
    */
  val docFertilityTrained: String = {
    val rounds = 8
    val joinAll = (1 to rounds).map(k => s"w$k").mkString(", ")
    val applied = (1 to rounds).foldLeft("tok") { (e, k) =>
      s"replace($e, p$k, chr($k))"
    }
    s"""
WITH v0 AS MATERIALIZED (
  SELECT tok AS sym, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(list_filter(string_split(lower(text), ' '),
      x -> x <> '')) AS tok
    FROM documents)
  GROUP BY tok
  HAVING length(tok) >= 2),
${(1 to rounds).map(bpeRoundCtes).mkString(",\n")},
merges AS (SELECT * FROM $joinAll),
census AS MATERIALIZED (
  SELECT source, lang, tok, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT source, lang,
      unnest(list_filter(string_split(lower(text), ' '),
        x -> x <> '')) AS tok
    FROM documents)
  GROUP BY source, lang, tok),
applied AS (
  SELECT source, lang, n,
    CAST(length(tok) AS BIGINT) AS len0,
    CAST(length($applied) AS BIGINT) AS len1
  FROM census CROSS JOIN merges)
SELECT source, lang,
  CAST(sum(n) AS BIGINT) AS ws_tokens,
  CAST(sum(n * len1) AS BIGINT) AS subword_tokens,
  CAST(sum(n * (len0 - len1)) AS BIGINT) AS merged_occurrences,
  CAST(round(CAST(sum(n * len1) AS DOUBLE) / sum(n), 4) AS DOUBLE)
    AS fertility
FROM applied
GROUP BY source, lang
ORDER BY source, lang"""
  }

  /** Matryoshka two-stage twin of
    * [[graft.ops.VectorOps.knnTruncated]]: 16-dim prefix prefilter to
    * 40 candidates (rank by truncated cosine, ties to vec_id), exact
    * full-dimension rescore, top-5.
    */
  val embKnnTruncated: String = s"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv, embedding[1:16] AS qt
  FROM embeddings WHERE vec_id < 10
), cand AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
      row_number() OVER (PARTITION BY q.qid
        ORDER BY ${duckCos("q.qt", "e.embedding[1:16]")} DESC,
          e.vec_id) AS rk
    FROM embeddings e JOIN q ON e.vec_id <> q.qid)
  WHERE rk <= 40
), scored AS (
  SELECT c.qid, c.vec_id, ${duckCos("q.qv", "e.embedding")} AS sim
  FROM cand c
  JOIN embeddings e ON c.vec_id = e.vec_id
  JOIN q ON c.qid = q.qid
)
SELECT qid, vec_id AS neighbor, CAST(round(sim, 6) AS DOUBLE) AS sim,
  rank
FROM (
  SELECT qid, vec_id, sim,
    CAST(row_number() OVER (PARTITION BY qid
      ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
  FROM scored)
WHERE rank <= 5
ORDER BY qid, rank"""

  /** Truncation-curve twin of
    * [[graft.ops.VectorOps.truncateCurve]]: per prefix length, the
    * top-5 by truncated cosine vs the full-dimension brute truth.
    */
  val embTruncateCurve: String = {
    val rung = (d: Int) => s"""
  SELECT CAST($d AS BIGINT) AS dims, qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
      row_number() OVER (PARTITION BY q.qid
        ORDER BY ${duckCos(s"q.qv[1:$d]", s"e.embedding[1:$d]")} DESC,
          e.vec_id) AS rk
    FROM embeddings e JOIN q ON e.vec_id <> q.qid)
  WHERE rk <= 5"""
    s"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings
  WHERE vec_id < 10
), truth AS (
  SELECT qid, vec_id AS neighbor FROM (
    SELECT q.qid, e.vec_id,
      row_number() OVER (PARTITION BY q.qid
        ORDER BY ${duckCos("q.qv", "e.embedding")} DESC, e.vec_id)
        AS rk
    FROM embeddings e JOIN q ON e.vec_id <> q.qid)
  WHERE rk <= 5
), picks AS (${Seq(8, 16, 32, 64).map(rung).mkString("\n  UNION ALL")}
), nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
SELECT dims, CAST(count(t.neighbor) AS BIGINT) AS n_hits,
  nt.n_truth,
  round(CAST(count(t.neighbor) AS DOUBLE) / nt.n_truth, 4) AS recall
FROM picks p
LEFT JOIN truth t ON p.qid = t.qid AND p.vec_id = t.neighbor
CROSS JOIN nt
GROUP BY dims, nt.n_truth
ORDER BY dims"""
  }

  /** Recall-audit twin of
    * [[graft.ops.VectorOps.truncatedRecall]]: per query, overlap of
    * the two-stage truncated search with the brute truth.
    */
  val embTruncatedRecall: String = s"""
WITH base AS (SELECT qid, neighbor FROM ($embKnnBrute) b),
ap AS (SELECT qid AS aqid, neighbor AS aneighbor
  FROM ($embKnnTruncated) a)
SELECT base.qid, CAST(count(ap.aneighbor) AS BIGINT) AS n_hits,
  CAST(count(*) AS BIGINT) AS k,
  round(CAST(count(ap.aneighbor) AS DOUBLE) / count(*), 4) AS recall
FROM base
LEFT JOIN ap ON base.qid = ap.aqid AND base.neighbor = ap.aneighbor
GROUP BY base.qid
ORDER BY base.qid"""

  /** One Lloyd-iteration CTE block for [[embKmeansTrain]]: score
    * against `prevCents` (cid, cv list) with the same sequential-fold
    * squared-L2 as [[embKmeansStep]], assign by (dist, cid), reduce to
    * DECIMAL moments, round components to 6 decimals, reassemble the
    * centroid lists in dim order.
    */
  private def kmIterCtes(i: Int, prevCents: String): String = s"""
scored$i AS (
  SELECT e.vec_id, c.cid, e.embedding,
    list_sum(list_transform(list_zip(e.embedding, c.cv),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
  FROM embeddings e CROSS JOIN $prevCents c),
assigned$i AS (
  SELECT cid, embedding FROM (
    SELECT cid, embedding,
      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM scored$i)
  WHERE rk = 1),
mom$i AS (
  SELECT cid, CAST(dim AS INT) AS dim,
    CAST(count(*) AS BIGINT) AS n_members,
    round(CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10)))
      AS DOUBLE) / count(*), 6) AS cval
  FROM (SELECT cid, unnest(range(len(embedding))) AS dim,
          unnest(embedding) AS v
        FROM assigned$i)
  GROUP BY cid, dim),
cents$i AS (
  SELECT cid, list(cval ORDER BY dim) AS cv FROM mom$i GROUP BY cid)"""

  /** Per-cell centroid movement of iteration `i` against the previous
    * components `prevMom` (cid, dim, cval): DECIMAL per-dim squared
    * deltas, exact sums, rounded sqrt.
    */
  private def kmShiftCte(i: Int, prevMom: String): String = s"""
shift$i AS (
  SELECT CAST($i AS INT) AS iter, m.cid,
    max(m.n_members) AS n_members,
    round(sqrt(CAST(sum(CAST((m.cval - p.cval) * (m.cval - p.cval)
      AS DECIMAL(20,10))) AS DOUBLE)), 6) AS shift
  FROM mom$i m JOIN $prevMom p ON m.cid = p.cid AND m.dim = p.dim
  GROUP BY m.cid)"""

  /** Training-loop twin of [[graft.ops.VectorOps.kmeansTrain]]: three
    * chained Lloyd iterations with 6-decimal component rounding at
    * every boundary, emitting the per-iteration per-cell movement.
    */
  val embKmeansTrain: String = s"""
WITH seedmom AS (
  SELECT vec_id AS cid, CAST(dim AS INT) AS dim,
    CAST(v AS DOUBLE) AS cval
  FROM (SELECT vec_id, unnest(range(len(embedding))) AS dim,
          unnest(embedding) AS v
        FROM embeddings WHERE vec_id < 16)),
cents0 AS (
  SELECT vec_id AS cid,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE vec_id < 16),
${kmIterCtes(1, "cents0")},
${kmIterCtes(2, "cents1")},
${kmIterCtes(3, "cents2")},
${kmShiftCte(1, "seedmom")},
${kmShiftCte(2, "mom1")},
${kmShiftCte(3, "mom2")}
SELECT iter, cid, n_members, shift FROM (
  SELECT * FROM shift1
  UNION ALL SELECT * FROM shift2
  UNION ALL SELECT * FROM shift3)
ORDER BY iter, cid"""

  private def duckL2(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""

  /** L2-routed 4-probe IVF search blocks against the `cents` CTE —
    * corpus routing (rk=1), query probes (rk<=4), cosine rescore of
    * probed-cell members — shared by the seed/trained rungs of
    * [[embCodebookRecall]] and by [[embKnnTrained]].
    */
  private def ivfL2SearchSql(cents: String, p: String): String = s"""
${p}sr AS (
  SELECT cid AS cell, vec_id, embedding FROM (
    SELECT e.vec_id, c.cid, e.embedding,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY ${duckL2("e.embedding", "c.cv")}, c.cid) AS rk
    FROM embeddings e CROSS JOIN $cents c)
  WHERE rk = 1),
${p}qp AS (
  SELECT qid, qv, cell FROM (
    SELECT q.vec_id AS qid, q.embedding AS qv, c.cid AS cell,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY ${duckL2("q.embedding", "c.cv")}, c.cid) AS rk
    FROM embeddings q CROSS JOIN $cents c WHERE q.vec_id < 10)
  WHERE rk <= 4),
${p}res AS (
  SELECT qid, vec_id AS neighbor, CAST(round(sim, 6) AS DOUBLE) AS sim,
    rank
  FROM (
    SELECT qid, vec_id, sim,
      CAST(row_number() OVER (PARTITION BY qid
        ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
    FROM (SELECT p.qid, s.vec_id,
            ${duckCos("p.qv", "s.embedding")} AS sim
          FROM ${p}sr s
          JOIN ${p}qp p ON s.cell = p.cell AND s.vec_id <> p.qid))
  WHERE rank <= 5)"""

  /** Trained-codebook search twin of
    * [[graft.ops.VectorOps.knnTrained]]: the three-iteration chain to
    * cents3, then the L2-routed 4-probe search.
    */
  val embKnnTrained: String = s"""
WITH cents0 AS (
  SELECT vec_id AS cid,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE vec_id < 16),
${kmIterCtes(1, "cents0")},
${kmIterCtes(2, "cents1")},
${kmIterCtes(3, "cents2")},
${ivfL2SearchSql("cents3", "t")}
SELECT qid, neighbor, sim, rank FROM tres
ORDER BY qid, rank"""

  /** Codebook-gain twin of
    * [[graft.ops.VectorOps.codebookRecall]]: the same search under
    * the seed and trained codebooks, each graded against the brute
    * truth.
    */
  val embCodebookRecall: String = s"""
WITH cents0 AS (
  SELECT vec_id AS cid,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE vec_id < 16),
${kmIterCtes(1, "cents0")},
${kmIterCtes(2, "cents1")},
${kmIterCtes(3, "cents2")},
${ivfL2SearchSql("cents0", "s")},
${ivfL2SearchSql("cents3", "t")},
truth AS (
  SELECT qid, vec_id AS neighbor FROM (
    SELECT q.vec_id AS qid, e.vec_id,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY ${duckCos("q.embedding", "e.embedding")} DESC,
          e.vec_id) AS rk
    FROM embeddings e
    JOIN embeddings q ON q.vec_id < 10 AND e.vec_id <> q.vec_id)
  WHERE rk <= 5),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
hits AS (
  SELECT 'seed' AS codebook,
    CAST(count(tr.neighbor) AS BIGINT) AS n_hits
  FROM sres p
  LEFT JOIN truth tr ON p.qid = tr.qid AND p.neighbor = tr.neighbor
  UNION ALL
  SELECT 'trained' AS codebook,
    CAST(count(tr.neighbor) AS BIGINT) AS n_hits
  FROM tres p
  LEFT JOIN truth tr ON p.qid = tr.qid AND p.neighbor = tr.neighbor)
SELECT codebook, n_hits, nt.n_truth,
  round(CAST(n_hits AS DOUBLE) / nt.n_truth, 4) AS recall
FROM hits, nt
ORDER BY codebook"""

  /** Per-iteration inertia CTE for [[embKmeansInertia]]: the sum of
    * rk=1 squared distances off iteration `i`'s scored frame, each
    * rounded once to exact DECIMAL before the corpus sum.
    */
  private def kmInertiaCte(i: Int): String = s"""
in$i AS (
  SELECT CAST($i AS INT) AS iter, CAST(count(*) AS BIGINT) AS n_vecs,
    round(CAST(sum(CAST(dist AS DECIMAL(28,10))) AS DOUBLE), 6)
      AS inertia
  FROM (SELECT vec_id, dist,
          row_number() OVER (PARTITION BY vec_id
            ORDER BY dist, cid) AS rk
        FROM scored$i)
  WHERE rk = 1)"""

  /** Objective-curve twin of
    * [[graft.ops.VectorOps.kmeansInertia]]: the same three chained
    * Lloyd iterations, reporting the assignment-time inertia.
    */
  val embKmeansInertia: String = s"""
WITH cents0 AS (
  SELECT vec_id AS cid,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE vec_id < 16),
${kmIterCtes(1, "cents0")},
${kmIterCtes(2, "cents1")},
${kmIterCtes(3, "cents2")},
${kmInertiaCte(1)},
${kmInertiaCte(2)},
${kmInertiaCte(3)}
SELECT iter, n_vecs, inertia FROM (
  SELECT * FROM in1
  UNION ALL SELECT * FROM in2
  UNION ALL SELECT * FROM in3)
ORDER BY iter"""

  /** Shared CTE prefix for the Naive-Bayes family — the same
    * tokenization, per-doc term frequencies, class-conditional count
    * model, and per-class Laplace constants as
    * [[graft.ops.TextOps.nbParts]], with every summed term (the
    * tf·ln(cnt+1) evidence products, the n_toks·lnZ normalizer)
    * rounded once from double to an exact DECIMAL before aggregation
    * (order-independent adds on both engines).
    */
  private val nbCtes: String = """
toks AS (
  SELECT doc_id, lang,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents),
tf AS (
  SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, lang, tok),
model AS (
  SELECT tok, lang AS c, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY tok, lang),
gstats AS (
  SELECT count(DISTINCT tok) AS v, count(*) AS tot FROM toks),
classes AS (
  SELECT lang AS c,
    CAST(ln(CAST(count(DISTINCT doc_id) AS DOUBLE)
      / (SELECT count(*) FROM documents)) AS DECIMAL(20,10)) AS prior,
    ln(CAST(count(*) + (SELECT v FROM gstats) AS DOUBLE)) AS lnzd
  FROM toks GROUP BY lang),
evidence AS (
  SELECT doc_id, c,
    sum(CAST(ln(CAST(cnt + 1 AS DOUBLE)) * tf AS DECIMAL(28,10)))
      AS ev
  FROM tf JOIN model USING (tok)
  GROUP BY doc_id, c),
perdoc AS (
  SELECT doc_id, lang, sum(tf) AS n_toks FROM tf
  GROUP BY doc_id, lang),
scores AS (
  SELECT p.doc_id, p.lang, cl.c,
    cl.prior + coalesce(e.ev, CAST(0 AS DECIMAL(28,10)))
      - CAST(p.n_toks * cl.lnzd AS DECIMAL(28,10)) AS score
  FROM perdoc p CROSS JOIN classes cl
  LEFT JOIN evidence e ON e.doc_id = p.doc_id AND e.c = cl.c),
ranked AS (
  SELECT doc_id, lang, c, score,
    row_number() OVER (PARTITION BY doc_id
      ORDER BY score DESC, c) AS rnk
  FROM scores)"""

  /** Confusion-matrix twin of [[graft.ops.TextOps.nbLang]]: the
    * Laplace-smoothed multinomial NB argmax per doc (score DESC,
    * class ASC tie-break) rolled up to (true, predicted) counts.
    */
  val docNbLang: String = s"""
WITH $nbCtes
SELECT lang, c AS predicted, CAST(count(*) AS BIGINT) AS n_docs
FROM ranked WHERE rnk = 1
GROUP BY lang, c
ORDER BY lang, predicted"""

  /** Accuracy/margin twin of [[graft.ops.TextOps.nbMargin]]: per true
    * class, argmax accuracy and the mean winner-minus-runner-up
    * decision margin.
    */
  val docNbMargin: String = s"""
WITH $nbCtes,
top2 AS (
  SELECT doc_id, lang,
    max(CASE WHEN rnk = 1 THEN c END) AS predicted,
    max(CASE WHEN rnk = 1 THEN score END)
      - max(CASE WHEN rnk = 2 THEN score END) AS margin
  FROM ranked WHERE rnk <= 2
  GROUP BY doc_id, lang)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END) AS BIGINT)
    AS n_correct,
  round(CAST(sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END)
    AS DOUBLE) / count(*), 4) AS accuracy,
  round(CAST(sum(margin) AS DOUBLE) / count(*), 4) AS avg_margin
FROM top2
GROUP BY lang
ORDER BY lang"""

  /** Feature-dump twin of [[graft.ops.TextOps.nbFeatures]]: top-5
    * tokens per class by smoothed log-odds, ranked on the ROUNDED
    * odds with a token tie-break.
    */
  val docNbFeatures: String = """
WITH toks AS (
  SELECT lang,
    unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
      AS tok
  FROM documents),
model AS (
  SELECT tok, lang AS c, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY tok, lang),
toktot AS (SELECT tok, sum(cnt) AS tot FROM model GROUP BY tok),
ctoks AS (SELECT c, sum(cnt) AS ctoks FROM model GROUP BY c),
gstats AS (
  SELECT count(DISTINCT tok) AS v, sum(cnt) AS alltoks FROM model),
odds AS (
  SELECT k.c, s.tok, CAST(coalesce(m.cnt, 0) AS BIGINT) AS cnt,
    round(ln(CAST(coalesce(m.cnt, 0) + 1 AS DOUBLE)
        / (k.ctoks + g.v))
      - ln(CAST(s.tot - coalesce(m.cnt, 0) + 1 AS DOUBLE)
        / (g.alltoks - k.ctoks + g.v)), 6) AS log_odds
  FROM toktot s CROSS JOIN ctoks k CROSS JOIN gstats g
  LEFT JOIN model m ON m.tok = s.tok AND m.c = k.c),
r AS (
  SELECT c, tok, cnt, log_odds,
    CAST(row_number() OVER (PARTITION BY c
      ORDER BY log_odds DESC, tok) AS BIGINT) AS rank
  FROM odds)
SELECT c, rank, tok, cnt, log_odds
FROM r WHERE rank <= 5
ORDER BY c, rank"""

  def all: Map[String, String] = Map(
    "emb_kmeans_train" -> embKmeansTrain,
    "emb_kmeans_inertia" -> embKmeansInertia,
    "emb_knn_trained" -> embKnnTrained,
    "emb_codebook_recall" -> embCodebookRecall,
    "doc_bpe_train" -> docBpeTrain,
    "doc_fertility_trained" -> docFertilityTrained,
    "doc_bpe_vocab" -> docBpeVocab,
    "emb_knn_truncated" -> embKnnTruncated,
    "emb_truncate_curve" -> embTruncateCurve,
    "emb_truncated_recall" -> embTruncatedRecall,
    "doc_nb_lang" -> docNbLang,
    "doc_nb_margin" -> docNbMargin,
    "doc_nb_features" -> docNbFeatures,
    "doc_bm25_topk" -> docBm25TopK,
    // MaxScore prunes WORK, never the answer: its oracle IS the
    // exact full-index top-5
    "doc_bm25_maxscore" -> docBm25TopK,
    "doc_bm25_maxscore_stored" -> docBm25TopK,
    "doc_bm25_pruned" -> docBm25Pruned,
    "doc_bm25_recall" -> docBm25Recall,
    "doc_bm25_recall_curve" -> docBm25RecallCurve,
    "doc_hybrid_topk" -> docHybridTopK,
    "doc_hybrid_ivf" -> docHybridIvf,
    "doc_hybrid_stored" -> docHybridStored,
    "doc_hybrid_exact_stored" -> docHybridExactStored,
    "doc_hybrid_refined_stored" -> docHybridRefinedStored,
    "doc_hybrid_recall" -> docHybridRecall,
    "doc_bpe_pairs" -> docBpePairs,
    "doc_bpe_merge_step" -> docBpeMergeStep,
    "emb_prototype_prune" -> embPrototypePrune,
    "doc_survival_funnel" -> docSurvivalFunnel,
    "doc_funnel_tokens" -> docFunnelTokens,
    "doc_domain_census" -> docDomainCensus,
    "doc_zipf_slope" -> docZipfSlope,
    "events_conversion_lag" -> eventsConversionLag,
    "doc_dedup_inflation" -> docDedupInflation,
    "doc_minhash_band_tune" -> docMinhashBandTune,
    "doc_perplexity_outliers" -> docPerplexityOutliers,
    "img_intensity_drift" -> imgIntensityDrift,
    "img_focus_rank" -> imgFocusRank,
    "img_channel_crosstalk" -> imgChannelCrosstalk,
    "emb_recall_ladder" -> embRecallLadder,
    "emb_recall_ladder_opq" -> embRecallLadderOpq,
    "doc_hash_collision_audit" -> docHashCollisionAudit,
    "emb_cell_purity" -> embCellPurity,
    "emb_norm_outliers" -> embNormOutliers,
    "events_new_vs_returning" -> eventsNewVsReturning,
    "events_user_lifecycle" -> eventsUserLifecycle,
    "events_power_law" -> eventsPowerLaw,
    "emb_centroid_shift" -> embCentroidShift,
    "doc_ngram_coverage" -> docNgramCoverage,
    "emb_label_margin" -> embLabelMargin,
    "doc_bigram_logprob" -> docBigramLogprob,
    "doc_dsir_weights" -> docDsirWeights,
    "emb_pq_distortion" -> embPqDistortion,
    "emb_dim_stats" -> embDimStats,
    "emb_dim_corr" -> embDimCorr,
    "emb_opq_rotation" -> embOpqRotations,
    "doc_pruning_manifest" -> docPruningManifest,
    "doc_pruning_census" -> docPruningCensus,
    "doc_pruning_quality" -> docPruningQuality,
    "emb_opq_distortion" -> embOpqDistortion,
    "emb_opq_sweep" -> embOpqSweep,
    "emb_knn_opq" -> embKnnOpq,
    "emb_knn_opq_indexed" -> embKnnOpqIndexed,
    "events_paths" -> eventsPaths,
    "doc_mix_weights" -> docMixWeights,
    "emb_nprobe_curve" -> embNprobeCurve,
    "emb_ivf_nlist_sweep" -> embIvfNlistSweep,
    "doc_token_entropy" -> docTokenEntropy,
    "events_rfm" -> eventsRfm,
    "emb_knn_sq8" -> embKnnSq8,
    "img_dataset_growth" -> imgDatasetGrowth,
    "events_seasonality" -> eventsSeasonality,
    "events_attribution" -> eventsAttribution,
    "doc_ccnet_buckets" -> docCcnetBuckets,
    "doc_ccnet_sketched" -> docCcnetSketched,
    // store twins: result-identical to their inline operators by
    // construction, so they share the oracle SQL verbatim
    "doc_exact_dedup_bucketed" -> docExactDedup,
    "doc_bm25_topk_stored" -> docBm25TopK,
    "doc_bm25_pruned_stored" -> docBm25Pruned,
    "img_payload_stats_stored" -> imgPayloadStats,
    "img_intensity_drift_stored" -> imgIntensityDrift,
    "img_focus_rank_stored" -> imgFocusRank,
    "img_channel_crosstalk_stored" -> imgChannelCrosstalk,
    "img_payload_stats_rgb_stored" -> imgPayloadStatsRgb,
    "img_pixel_histogram_stored" -> imgPixelHistogram,
    "img_saturation_stored" -> imgSaturation,
    "img_z_profile_stored" -> imgZProfile,
    "vid_scene_cuts_stored" -> vidSceneCuts,
    "vid_keyframes_stored" -> vidKeyframes,
    "img_stats_drift" -> imgStatsDrift,
    "img_dataset_qc_summary" -> imgDatasetQcSummary,
    "emb_knn_ivfpq_indexed" -> embKnnIvfPq,
    "emb_gram_power" -> embGramPower,
    "doc_source_unique" -> docSourceUnique,
    "doc_lsh_health" -> docLshHealth,
    "events_cohort_ltv" -> eventsCohortLtv,
    "doc_pii_scrub" -> docPiiScrub,
    "q_sketch_quantile" -> qSketchQuantile,
    "doc_unigram_logprob" -> docUnigramLogprob,
    "emb_knn_ivfpq" -> embKnnIvfPq,
    "emb_knn_refine" -> embKnnRefine,
    // the indexed refine is hash-identical to the inline refine (the
    // indexed ADC already proves parity via emb_knn_ivfpq_indexed)
    "emb_knn_refine_indexed" -> embKnnRefine,
    "emb_refine_recall" -> embRefineRecall,
    "emb_refine_depth_curve" -> embRefineDepthCurve,
    "emb_ivf_balance" -> embIvfBalance,
    "emb_ann_recall" -> embAnnRecall,
    "doc_source_overlap" -> docSourceOverlap,
    "q8_share" -> q8Share,
    "q9_profit" -> q9Profit,
    "q12_latency" -> q12Latency,
    "q13_cust_dist" -> q13CustDist,
    "q21_waiting" -> q21Waiting,
    "q2_min_cost" -> q2MinCost,
    "q11_important_value" -> q11ImportantValue,
    "q16_supplier_cnt" -> q16SupplierCnt,
    "q20_dominant_supplier" -> q20DominantSupplier,
    "q_cube" -> qCube,
    "events_pareto" -> eventsPareto,
    "q14_promo" -> q14Promo,
    "q15_top_supplier" -> q15TopSupplier,
    "q17_small_qty" -> q17SmallQty,
    "q19_disjunction" -> q19Disjunction,
    "q22_idle" -> q22Idle,
    "doc_repetition" -> docRepetition,
    "doc_hash_sample" -> docHashSample,
    "doc_chunk_dedup" -> docChunkDedup,
    "doc_span_dedup" -> docSpanDedup,
    "doc_winnow" -> docWinnow,
    "doc_bloom_dedup" -> docBloomDedup,
    "doc_winnow_overlap" -> docWinnowOverlap,
    "emb_semdedup" -> embSemDedup,
    "emb_knn_graph" -> embKnnGraph,
    "emb_semdedup_probe" -> embSemDedupProbe,
    "emb_semdedup_recall" -> embSemDedupRecall,
    "emb_semdedup_clusters" -> embSemDedupClusters,
    "emb_knn_graph_probe" -> embKnnGraphProbe,
    "emb_knn_graph_topk" -> embKnnGraphTopk,
    "emb_knn_graph_recall" -> embKnnGraphRecall,
    "emb_knn_graph_probe_curve" -> embKnnGraphProbeCurve,
    "events_sliding" -> eventsSliding,
    "doc_shard_stats" -> docShardStats,
    "doc_pack_stats" -> docPackStats,
    "events_inter_arrival" -> eventsInterArrival,
    "events_range_join" -> eventsRangeJoin,
    "events_journey_digest" -> eventsJourneyDigest,
    "events_session_topk" -> eventsSessionTopk,
    "q4_priority" -> q4Priority,
    "q7_volume" -> q7Volume,
    "q18_large" -> q18Large,
    "img_payload_stats" -> imgPayloadStats,
    "img_payload_stats_rgb" -> imgPayloadStatsRgb,
    "img_pixel_histogram" -> imgPixelHistogram,
    "img_saturation" -> imgSaturation,
    "img_z_profile" -> imgZProfile,
    "aud_waveform_stats" -> audWaveformStats,
    "aud_activity_windows" -> audActivityWindows,
    // decode-once AudioStats twins: identical results (and oracles)
    // to their inline operators, off the persisted integer moments
    "aud_waveform_stats_stored" -> audWaveformStats,
    "aud_activity_windows_stored" -> audActivityWindows,
    "vid_keyframes" -> vidKeyframes,
    "vid_scene_cuts" -> vidSceneCuts,
    "emb_ood_outliers" -> embOodOutliers,
    "doc_source_kl" -> docSourceKl,
    "events_type_entropy" -> eventsTypeEntropy,
    "emb_hard_negatives" -> embHardNegatives,
    "emb_hard_negatives_ivf" -> embHardNegativesIvf,
    "emb_hn_ivf_recall" -> embHnIvfRecall,
    "emb_knn_classify" -> embKnnClassify,
    "emb_knn_classify_ivf" -> embKnnClassifyIvf,
    "emb_classify_ivf_recall" -> embClassifyIvfRecall,
    "doc_paraphrase_mining" -> docParaphraseMining,
    "doc_paraphrase_mining_ivf" -> docParaphraseMiningIvf,
    "doc_domain_clusters" -> docDomainClusters,
    "doc_dedup_keep_best" -> docDedupKeepBest,
    "doc_paraphrase_ivf_recall" -> docParaphraseIvfRecall,
    "img_dataset_overlap" -> imgDatasetOverlap,
    "events_forecast_eval" -> eventsForecastEval,
    "img_parse_sms_channel" -> imgParseSmsChannel,
    "img_meta_validate" -> imgMetaValidate,
    "doc_decontaminate" -> docDecontaminate,
    "emb_kmeans_step" -> embKmeansStep,
    "events_anomaly" -> eventsAnomaly,
    "events_funnel" -> eventsFunnel,
    "events_window_funnel" -> eventsWindowFunnel,
    "events_resample" -> eventsResample,
    "events_dau_wau" -> eventsDauWau,
    "events_transitions" -> eventsTransitions,
    "events_markov_stationary" -> eventsMarkovStationary,
    "doc_zipf" -> docZipf,
    "events_retention" -> eventsRetention,
    "events_dropoff" -> eventsDropoff,
    "img_channel_pivot" -> imgChannelPivot,
    "doc_stratified_sample" -> docStratifiedSample,
    "doc_len_histogram" -> docLenHistogram,
    "doc_top_per_source" -> docTopPerSource,
    "doc_quality_gate" -> docQualityGate,
    "doc_tfidf" -> docTfidf,
    "doc_dup_clusters" -> docDupClusters,
    "doc_simhash" -> docSimhash,
    "doc_minhash_lsh" -> docMinhashLsh,
    "doc_dedup_pipeline" -> docDedupPipeline,
    "doc_minhash_recall" -> docMinhashRecall,
    "emb_knn_ivf" -> embKnnIvf,
    "emb_near_dup" -> embNearDup,
    "emb_near_dup_multiprobe" -> embNearDupMultiProbe,
    "emb_near_dup_probe_curve" -> embNearDupProbeCurve,
    "emb_pq_codes" -> embPqCodes,
    "emb_knn_pq" -> embKnnPq,
    "q_percentiles" -> qPercentiles,
    "q10_returns" -> q10Returns,
    "win_moving_range" -> winMovingRange,
    "q_corr" -> qCorr,
    "img_channel_overlap" -> imgChannelOverlap,
    "img_lineage_depth" -> imgLineageDepth,
    "img_storage_rollup" -> imgStorageRollup,
    "doc_ngram_jaccard" -> docNgramJaccard,
    "doc_ngram_block_census" -> docNgramBlockCensus,
    "doc_ngram_banded" -> docNgramBanded,
    "doc_ngram_probe" -> docNgramProbe,
    "doc_containment" -> docContainment,
    "doc_containment_residue" -> docContainmentResidue,
    "doc_containment_keep_best" -> docContainmentKeepBest,
    "doc_containment_health" -> docContainmentHealth,
    "emb_knn_brute" -> embKnnBrute,
    "events_asof" -> eventsAsof,
    "q6_forecast" -> q6Forecast,
    "doc_lang_id" -> docLangId,
    "img_validate_id" -> imgValidateId,
    "img_stack_positions" -> imgStackPositions,
    "img_parse_ml_name" -> imgParseMlName,
    "events_props_json" -> eventsPropsJson,
    "doc_token_regex" -> docTokenRegex,
    "doc_fertility" -> docFertility,
    "doc_quality_vs_dup" -> docQualityVsDup,
    "q1_pricing" -> q1Pricing,
    "q3_topk" -> q3Topk,
    "q5_region_join" -> q5RegionJoin,
    "win_running" -> winRunning,
    "events_window" -> eventsWindow,
    "events_sessions" -> eventsSessions,
    "doc_exact_dedup" -> docExactDedup,
    "doc_text_stats" -> docTextStats,
    "doc_fingerprint" -> docFingerprint,
    "emb_norm_stats" -> embNormStats,
    "doc_vec_integrity" -> docVecIntegrity,
    "img_dataset_search" -> imgDatasetSearch,
    "img_serial_datetime" -> imgSerialDatetime,
    "img_frames_subset" -> imgFramesSubset,
    "img_frames_meta" -> imgFramesMeta,
    "img_filenames" -> imgFilenames,
    "img_global_meta" -> imgGlobalMeta,
    "img_meta_search" -> imgMetaSearch,
    "img_meta_values" -> imgMetaValues,
    "img_uniqueness" -> imgUniqueness,
    "img_lineage" -> imgLineage,
    "img_sha_dedup" -> imgShaDedup,
    "img_frame_gaps" -> imgFrameGaps,
    "img_parse_sms_name" -> imgParseSmsName,
    "img_storage_report" -> imgStorageReport,
  )
}
