package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{TextOps, VectorOps}
import graft.tables.Tables

/** The user-facing retrieval facade — the [[graft.imaging.ImagingDb]]
  * of the RAG side (VERDICT r13 missing #5): every oracle-checked
  * retrieval key fixes its queries to corpus-derived anchors for
  * driver determinism, but a caller has a QUERY, not an anchor id.
  * This object composes the pieces that already exist behind an API a
  * RAG service actually invokes:
  *
  *  - [[searchText]] — free-text lexical search: the query string
  *    tokenizes with the store's own tokenizer and scores BM25 over
  *    the [[TermIndexStore]] capped companion at the store's recorded
  *    M (read-time capping between ingest and compaction — same
  *    results either way);
  *  - [[searchVec]] — embedded-query ANN: the caller's query vector
  *    (a RAG stack embeds the query text; this library's multimodal
  *    contract keeps model inference outside) probes the persisted
  *    [[VectorIndex]] through the same 4-cell IVF + PQ-ADC plan the
  *    anchor-audited `emb_knn_ivfpq_indexed` runs;
  *  - [[search]] — the hybrid: both engines' top-5 fused with the
  *    exact-integer RRF tail `doc_hybrid_stored` hash-checks.
  *
  * Everything reads the PERSISTED layouts — no query re-tokenizes the
  * corpus or re-encodes a vector; per-query cost is a broadcast probe
  * against bucketed index scans, the serving shape a deployment runs.
  * RetrievalSpec proves parity with the oracle-checked anchor keys on
  * anchor-shaped queries.
  */
object Retrieval {

  /** Free-text BM25 top-`k` (doc_id, rank, score) over the persisted
    * term index. An all-unknown query returns zero rows.
    */
  def searchText(spark: SparkSession, dir: String, queryText: String,
      k: Int = 5): DataFrame =
    TermIndexStore.searchText(spark,
      TermIndexStore.ensureBuilt(spark, dir), queryText, k)
      .select("rank", "doc_id", "score")

  /** Free-text EXACT BM25 top-`k` — [[searchText]] serves the
    * recorded-M capped approximation (cheapest read); this serves the
    * exact ranking at any corpus scale via MaxScore upper-bound
    * pruning over the same persisted layouts (bounds census off the
    * capped companion, exact scoring only for the threshold
    * survivors). The choice is the deployment's quality/cost knob —
    * both faces answer arbitrary query strings.
    */
  def searchTextExact(spark: SparkSession, dir: String,
      queryText: String, k: Int = 5): DataFrame =
    TermIndexStore.searchTextExact(spark,
      TermIndexStore.ensureBuilt(spark, dir), queryText, k)
      .select("rank", "doc_id", "score")

  /** Embedded-query top-`k` nearest neighbors (neighbor, rank,
    * adc_dist) off the persisted IVF+PQ index. The query vector must
    * have the corpus dimensionality.
    */
  def searchVec(spark: SparkSession, dir: String,
      queryVec: Array[Float], k: Int = 5): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val queries = Seq((-1L, queryVec.toSeq)).toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<float>").as("qv"))
    VectorOps.searchIndexQueries(queries,
        Tables.embeddings(spark, dir),
        VectorIndex.read(spark, VectorIndex.ensureBuilt(spark, dir)), k)
      .select("rank", "neighbor", "adc_dist")
  }

  /** [[searchVec]] with the two-stage refine tail — ADC top-20
    * over-fetch off the persisted codes, exact-cosine rescore for
    * those candidates only (the free-query face of
    * `emb_knn_refine_indexed`, the rung RECALL_r14 measured lifting
    * the stored engine's recall from 0.18/0.56/0.2 to 0.38/1.0/0.7).
    */
  def searchVecRefined(spark: SparkSession, dir: String,
      queryVec: Array[Float], k: Int = 5): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val queries = Seq((-1L, queryVec.toSeq)).toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<float>").as("qv"))
    VectorOps.searchIndexQueriesRefined(queries,
        Tables.embeddings(spark, dir),
        VectorIndex.read(spark, VectorIndex.ensureBuilt(spark, dir)), k)
      .select("rank", "neighbor", "sim")
  }

  /** Hybrid free-query search: BM25 over the stored term index ×
    * ANN over the stored vector index, fused with the exact-integer
    * RRF tail (rank ≤ 5 per engine — the lcm(61..65) scaling that
    * makes the fused score a plain BIGINT is exact for exactly those
    * ranks, so the fusion depth is part of the operating point, not a
    * tunable). Returns up to `k` ≤ 5 rows: (rank, doc_id, rrf_scaled,
    * bm25_rank, knn_rank).
    */
  def search(spark: SparkSession, dir: String, queryText: String,
      queryVec: Array[Float], k: Int = 5): DataFrame =
    hybridOf(spark, dir, searchText(spark, dir, queryText, 5),
      queryVec, k)

  /** The facade face of `doc_hybrid_refined_stored` — the measured
    * ladder's top rung: exact lexical ([[searchTextExact]]) fused
    * with the refined stored vector engine ([[searchVecRefined]]).
    */
  def searchRefined(spark: SparkSession, dir: String,
      queryText: String, queryVec: Array[Float],
      k: Int = 5): DataFrame =
    hybridWith(searchTextExact(spark, dir, queryText, 5),
      searchVecRefined(spark, dir, queryVec, 5), k)

  /** [[search]] with the lexical engine swapped to the EXACT face
    * ([[searchTextExact]], MaxScore off the same persisted layouts) —
    * the facade twin of the oracle-checked `doc_hybrid_exact_stored`
    * corner: RECALL_r14 measured the fused list's degradation to be
    * entirely lexical, so this is the knob a deployment turns when
    * fused recall matters more than the capped read's cost.
    */
  def searchExact(spark: SparkSession, dir: String, queryText: String,
      queryVec: Array[Float], k: Int = 5): DataFrame =
    hybridOf(spark, dir, searchTextExact(spark, dir, queryText, 5),
      queryVec, k)

  private def hybridOf(spark: SparkSession, dir: String,
      lexical: DataFrame, queryVec: Array[Float], k: Int): DataFrame =
    hybridWith(lexical, searchVec(spark, dir, queryVec, 5), k)

  private def hybridWith(lexical: DataFrame, vector: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 5,
      s"hybrid k must be in [1, 5] (exact-integer RRF covers ranks " +
        s"<= 5), got $k")
    val lex = lexical
      .select(lit(-1L).as("qid"), col("doc_id"), col("rank").as("br"))
    val vec = vector
      .select(lit(-1L).as("qid"), col("neighbor").as("doc_id"),
        col("rank").as("kr"))
    TextOps.rrfFuse(lex, vec)
      .filter(col("rank") <= k)
      .select("rank", "doc_id", "rrf_scaled", "bm25_rank", "knn_rank")
  }
}
