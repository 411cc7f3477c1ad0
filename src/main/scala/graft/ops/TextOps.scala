package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Text-analysis operators for training-data pipelines (SURVEY.md
  * §2.3): token counting, quality features, language ID, document
  * fingerprinting. All pure column expressions (whole-stage codegen),
  * no UDFs — the per-doc feature extraction is embarrassingly parallel
  * and never shuffles; only the final roll-ups do.
  */
object TextOps {

  /** Marker words per candidate language for the lang-ID heuristic —
    * shared with the DuckDB oracle so both engines score identically.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " fast ", " key "),
    "es" -> Seq(" el ", " data ", " sort "),
    "de" -> Seq(" der ", " group ", " merge "),
    "fr" -> Seq(" le ", " join ", " row "),
    "zh" -> Seq(" spark ", " query ", " scan "))

  /** Occurrences of `needle` in `hay` via length arithmetic — portable
    * to the DuckDB oracle and codegen-friendly.
    */
  private def occurrences(hay: Column, needle: String): Column =
    ((length(hay) - length(expr(s"replace(text, '$needle', '')")))
      / needle.length).cast("bigint")

  /** Per-doc features → per-source quality roll-up: token counts,
    * stopword ('the') counts, char volume, avg tokens.
    */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("t", trim(col("text")))
      .withColumn("n_tokens",
        when(length(col("t")) === 0, lit(0L)).otherwise(
          (length(col("t")) - length(expr("replace(t, ' ', '')")) + 1)
            .cast("bigint")))
      .withColumn("the_cnt", occurrences(col("text"), "the"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("the_cnt")).as("sum_the"),
        sum(col("n_chars")).as("sum_chars"))
      .select(col("source"), col("n_docs"), col("sum_tokens"),
        col("sum_the"), col("sum_chars"),
        round(col("sum_tokens").cast("double") / col("n_docs"), 4)
          .as("avg_tokens"))
      .orderBy("source")

  /** Marker-word language-ID heuristic vs the labeled `lang` column:
    * score each candidate language by marker hits, pick the max
    * (ties broken lexicographically via struct max), emit the
    * confusion matrix. Oracle-checked: DuckDB scores the same markers
    * with the same replace-arithmetic and list_max over structs.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.langMarkers.map { case (lang, words) =>
      val score = words.map(w =>
        (length(col("padded")) - length(regexp_replace(col("padded"),
          lit(w), lit("")))) / w.length).reduce(_ + _)
      struct(score.cast("bigint").as("score"), lit(lang).as("lang"))
    }
    Tables.documents(spark, dir)
      .withColumn("padded", concat(lit(" "), lower(col("text")), lit(" ")))
      .withColumn("best", array_max(array(scored: _*)))
      .select(col("lang"), col("best.lang").as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  /** Regex tokenizer stats (the BPE-ish counterpart of the whitespace
    * counts in textStats): alpha runs and digit runs counted per doc
    * via regexp_count, rolled up per (source, lang).
    */
  def tokenRegex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        regexp_count(lower(col("text")), lit("[a-z]+")).as("alpha_toks"),
        regexp_count(col("text"), lit("[0-9]+")).as("digit_toks"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("alpha_toks")).as("sum_alpha"),
        sum(col("digit_toks")).as("sum_digit"))
      .orderBy("source", "lang")

  /** Tokenizer-fertility census — the table a token-budget plan reads
    * before committing a mixture (fertility = subword tokens per
    * whitespace word; bytes/subword = how much raw corpus one training
    * token buys, both per source × lang — the numbers that decide how
    * many DOCUMENT bytes a fixed token budget consumes per domain).
    * The subword count is a deterministic BPE-shaped proxy: every
    * lowercase alpha run contributes ⌈len/4⌉ pieces (pure integer
    * (len+3) div 4 — no float), every digit run one piece; both
    * engines evaluate the identical regex + integer fold, so the
    * census is hash-exact. One scan, one ≤(sources×langs) partial
    * agg; the per-doc fold is scan-side codegen, nothing but the
    * census shuffles.
    */
  def fertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("bigint").as("ws_toks"),
        (expr("""aggregate(regexp_extract_all(lower(text), '[a-z]+', 0),
             0L, (acc, w) -> acc + (length(w) + 3) div 4)""")
          + regexp_count(col("text"), lit("[0-9]+")).cast("bigint"))
          .as("sub_toks"),
        octet_length(col("text")).cast("bigint").as("n_bytes"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_toks")).as("ws_tokens"),
        sum(col("sub_toks")).as("subword_tokens"),
        sum(col("n_bytes")).as("n_bytes"))
      .select(col("source"), col("lang"), col("n_docs"),
        col("ws_tokens"), col("subword_tokens"), col("n_bytes"),
        round(col("subword_tokens").cast("double") / col("ws_tokens"), 4)
          .as("fertility"),
        round(col("n_bytes").cast("double") / col("subword_tokens"), 4)
          .as("bytes_per_subword"))
      .orderBy("source", "lang")

  /** Rolling polynomial hash fingerprint over the characters of each
    * document (mod 2^31-1), computed as a codegen'd fold — no UDF, no
    * shuffle at all.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("""aggregate(filter(split(text, ''), c -> c <> ''),
                0L, (acc, c) -> (acc * 31 + ascii(c)) % 2147483647)""")
          .as("fp"))
      .orderBy("doc_id")

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
    * algorithm): hash every word 4-gram, slide a 4-hash window, and
    * select each window's minimal hash with RIGHTMOST tie-break; the
    * distinct selected (position, hash) pairs are the document's
    * fingerprints — guaranteed to catch any shared run of ≥ w+k−1
    * words while storing only ~2/(w+1) of the hashes, the
    * position-robust alternative to [[fingerprint]]'s whole-doc hash.
    * Output: the 100 densest docs by fingerprint count.
    *
    * Relational formulation: a gram joins the ≤ w windows covering it
    * (constant-factor explode), per-window argmin is a map-side
    * lexicographic-min aggregate on struct(hash, −pos) — the
    * [[graft.ops.VectorOps]] assignCells pattern, so the shuffle
    * carries one row per (doc, window), and nothing text-valued ever
    * shuffles. Per-doc work is bounded by doc length; the final
    * ranking is a bounded TakeOrdered top-100.
    */
  /** The winnowing selection over any (doc_id, text) frame: distinct
    * selected (position, hash) fingerprints plus the per-doc gram
    * count `m`. Shared by the density census [[winnow]] and the
    * cross-doc overlap [[winnowOverlap]].
    */
  private[ops] def winnowSelected(docs: DataFrame,
      K: Int = 4, W: Int = 4): DataFrame = {
    import graft.functions.TextExpressions.wordNGramsPos
    docs
      .select(col("doc_id"), wordNGramsPos(col("text"), K).as("arr"))
      .select(col("doc_id"), size(col("arr")).as("m"),
        posexplode(col("arr")).as(Seq("p", "g")))
      .filter(col("m") >= W)
      .select(col("doc_id"), col("m"), col("p"),
        expr("cast(conv(substring(md5(g), 1, 7), 16, 10) as bigint)")
          .as("h"))
      .select(col("doc_id"), col("m"), col("p"), col("h"),
        explode(sequence(greatest(col("p") - (W - 1), lit(0)),
          least(col("p"), col("m") - W))).as("s"))
      .groupBy("doc_id", "m", "s")
      .agg(min(struct(col("h"), (-col("p")).as("np"))).as("sel"))
      .select(col("doc_id"), col("m"),
        (-col("sel.np")).as("p"), col("sel.h").as("h"))
      .distinct()
  }

  def winnow(spark: SparkSession, dir: String): DataFrame = {
    winnowSelected(Tables.documents(spark, dir).select("doc_id", "text"))
      .groupBy("doc_id", "m")
      .agg(count(lit(1)).as("n_fps"))
      .select(col("doc_id"), col("m").cast("long").as("n_hashes"),
        col("n_fps"))
      .orderBy(col("n_fps").desc, col("doc_id"))
      .limit(100)
  }

  /** Cross-document winnowing overlap — MOSS's actual output: doc
    * pairs ranked by SHARED fingerprints, over the planted-dup corpus
    * (full copies share every fingerprint, so the planted pairs top
    * the list; partially-overlapping docs surface by their shared
    * coverage). A shared fingerprint survives word REPOSITIONING
    * (insertions/deletions around the copied run) that would break
    * whole-doc hashing — what winnowing buys over [[fingerprint]].
    *
    * 100 TB: pairs meet through per-hash buckets CAPPED like every
    * LSH path here (a hash shared by >maxBucket docs is boilerplate,
    * not plagiarism signal — dropped, bounded pair expansion); the
    * per-doc fingerprint counts join back on the unique doc_id
    * (key-uniform). Bounded top-50 ranking.
    */
  def winnowOverlap(spark: SparkSession, dir: String,
      maxBucket: Int = 1000): DataFrame = {
    val fps = winnowSelected(
      graft.ops.DedupOps.corpus(spark, dir).select("doc_id", "text"))
      .select("doc_id", "h").distinct()
    val pairs = fps.groupBy("h")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(graft.ops.DedupOps.bucketPairs("ids").as("pr"))
      .select(col("pr.a").as("doc1"), col("pr.b").as("doc2"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("n_shared"))
    val cnt = fps.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    pairs
      .join(cnt.select(col("doc_id").as("doc1"), col("nf").as("n1")), "doc1")
      .join(cnt.select(col("doc_id").as("doc2"), col("nf").as("n2")), "doc2")
      .select("doc1", "doc2", "n_shared", "n1", "n2")
      .orderBy(col("n_shared").desc, col("doc1"), col("doc2"))
      .limit(50)
  }

  /** Deterministic exact-fraction stratified sample: the first
    * ceil(10%) of each source stratum in doc_id order. Deterministic
    * by construction — reproducible sampling is what a training-data
    * pipeline needs for re-runs.
    *
    * Shape: a tiny per-source census (one row per stratum) sizes k =
    * the largest stratum's keep-count, then ONE bounded
    * [[graft.functions.TopKByScore]] aggregate takes each stratum's
    * first-k doc ids — map-side partials cap every task at k rows per
    * source, so no reducer ever owns a whole stratum. The earlier
    * row_number window hashed the WHOLE corpus one-partition-per-source
    * (a handful of reducers own 100 TB). The census max is a bounded
    * driver scalar (rows = #sources); ranks come from posexplode over
    * the k-bounded array, and the census joins back broadcast to trim
    * each stratum to its exact ceil(10%).
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val census = docs.groupBy("source")
      .agg(ceil(count(lit(1)) * 0.1).cast("bigint").as("keep_n"))
    val kLong = census.agg(max("keep_n")).head().getLong(0).max(1L)
    // k = ceil(10% of the largest stratum) GROWS WITH THE CORPUS — the
    // per-task top-k heaps are k rows each, so past this cap the heaps
    // ARE the stratum and exact-fraction sampling is the wrong tool.
    // Fail loudly (the RangeJoinExec build-cap pattern) instead of
    // OOMing an executor: the declared 100 TB path is hashSample.
    // the heap size is an Int downstream, so the cap itself is capped:
    // an operator raising maxK past Int.MaxValue would otherwise slip
    // through the guard and hand TopKByScore a wrapped-negative k
    val cap = spark.conf.getOption("spark.graft.stratifiedSample.maxK")
      .map(_.toLong).getOrElse(10000000L).min(Int.MaxValue.toLong)
    if (kLong > cap) {
      throw new IllegalStateException(
        s"stratifiedSample keep-count $kLong exceeds $cap rows per " +
          "task heap — exact-fraction sampling holds k rows per " +
          "partial aggregate, which no longer fits at this stratum " +
          "size. Use hashSample (the hash-Bernoulli 100 TB path) or " +
          "raise spark.graft.stratifiedSample.maxK if executors can " +
          "really hold it.")
    }
    val k = kLong.toInt
    docs.groupBy("source")
      .agg(graft.functions.TopKByScore
        .topkAsc(col("doc_id").cast("double"), col("doc_id"), k).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("t.id").as("doc_id"), col("source"),
        (col("p") + 1).cast("bigint").as("rn"))
      .join(broadcast(census), Seq("source"))
      .filter(col("rn") <= col("keep_n"))
      .select("doc_id", "source", "rn")
      .orderBy("doc_id")
  }

  /** Deterministic hash-Bernoulli sample — the 100 TB sampling shape:
    * a doc is kept iff md5(doc_id) mod 100 < 10, a pure per-row
    * filter with NO window and NO shuffle before the audit roll-up.
    * Re-runs (and either engine) select the identical rows, which is
    * what [[stratifiedSample]]'s per-source ordering buys at small
    * scale; this is its scale path (the rate is ~10% per source by
    * hash uniformity rather than exactly ceil(10%)). Output audits
    * the per-source realized rates.
    */
  def hashSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = expr(
      """cast(conv(substring(md5(cast(doc_id as string)), 1, 7), 16, 10)
         as bigint) % 100""")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), bucket.as("bucket"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("bucket") < 10).cast("int")).as("n_sampled"),
        min(when(col("bucket") < 10, col("doc_id"))).as("first_sampled"))
      .select(col("source"), col("n_docs"), col("n_sampled"),
        round(col("n_sampled") * 100.0 / col("n_docs"), 2).as("pct"),
        col("first_sampled"))
      .orderBy("source")
  }

  /** Document-length histogram: fixed-width 50-char buckets (capped at
    * bucket 11) — a single partial-agg shuffle on at most 12 keys, the
    * distribution profile a corpus QA pass starts from.
    */
  def lenHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(expr("least(n_chars div 50, 11)").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .withColumn("lo_chars", col("bucket") * 50)
      .select("bucket", "lo_chars", "n_docs", "min_chars", "max_chars")
      .orderBy("bucket")

  /** TF-IDF top-5 terms per document (smoothed idf, natural log).
    * Shuffle shape: one exchange on (doc, term) for term frequencies,
    * one on term for document frequencies (both map-side combined),
    * the corpus size N broadcast as a single-row cross join, and the
    * final per-doc top-k as a partitioned window — no global sort.
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .withColumn("tok",
        explode(expr("filter(split(lower(text), ' '), x -> x <> '')")))
      .select("doc_id", "tok")
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df_, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("tok"))
    scored
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= 5)
      .select("doc_id", "rnk", "tok", "tf", "df", "tfidf")
      .orderBy("doc_id", "rnk")
  }

  /** Zipf profile: the corpus's 50 most frequent tokens with rank —
    * the sanity curve every corpus build plots. Token counting is one
    * partial-agg shuffle; the top-50 then goes through orderBy+limit,
    * which Spark compiles to TakeOrderedAndProject (per-partition
    * partial top-k, driver merge of 50-row heaps) — NOT a global
    * ranking window, which would sort the whole vocabulary in one
    * task (a 100 TB web corpus's raw token vocabulary is billions of
    * rows). The rank window then runs over the ≤50 surviving rows
    * with the same (n desc, tok) tie-break, so the answer is
    * identical.
    */
  def zipfTokens(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(explode(
        expr("filter(split(lower(text), ' '), x -> x <> '')")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
    val top = counts.orderBy(col("n").desc, col("tok")).limit(50)
    val w = Window.orderBy(col("n").desc, col("tok"))
    top
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select("rank", "tok", "n")
      .orderBy("rank")
  }

  /** Per-doc quality flags — [[qualityGate]]'s gate decomposed to one
    * row per document, shared with the joint pruning policy
    * ([[graft.ops.VectorOps.pruningQuality]]): identical flag
    * arithmetic (ratio thresholds compare via integer
    * cross-multiplication, stop_n*2 > n_tokens, so the gate is exact
    * and engine-portable — no float boundary cases).
    */
  private[graft] def qualityFlags(spark: SparkSession,
      dir: String): DataFrame =
    qualityFlagsOf(Tables.documents(spark, dir))

  /** The keep rule over any frame carrying (text, n_chars) — ONE
    * definition shared by [[qualityGate]] and [[qualityVsDup]] so the
    * two reports can never gate by silently different rules.
    */
  private def qualityFlagsOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens",
        expr("size(filter(split(lower(text), ' '), x -> x <> ''))")
          .cast("bigint"))
      .withColumn("stop_n",
        expr("size(filter(split(lower(text), ' '), " +
          "x -> x = 'the' or x = 'a'))").cast("bigint"))
      .withColumn("flag_short", (col("n_chars") < 100).cast("int"))
      .withColumn("flag_few", (col("n_tokens") < 20).cast("int"))
      .withColumn("flag_stop",
        (col("stop_n") * 2 > col("n_tokens")).cast("int"))
      .withColumn("keep",
        (col("flag_short") === 0 && col("flag_few") === 0
          && col("flag_stop") === 0).cast("int"))

  /** Quality gate — the filtering stage of a training-data pipeline:
    * per-doc keep/drop with reason flags (too short, too few tokens,
    * stopword-heavy), rolled up per source.
    */
  def qualityGate(spark: SparkSession, dir: String): DataFrame =
    qualityFlags(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep")).as("n_keep"),
        sum(col("flag_short")).as("n_short"),
        sum(col("flag_few")).as("n_few_tokens"),
        sum(col("flag_stop")).as("n_stopword_heavy"))
      .orderBy("source")

  /** Quality × duplication cross-census — the question a curation
    * review asks after running both gates separately: are the docs
    * the quality gate drops ALSO the duplicated ones (cheap junk gets
    * copied), or is duplication orthogonal to quality (dedup and
    * gating both earn their keep)? Per (source, kept): docs, docs
    * whose normalized digest appears more than once in the planted
    * corpus, and the dup share. The keep rule IS [[qualityGate]]'s —
    * both call the shared [[qualityFlagsOf]] over frames carrying the
    * stored n_chars column.
    *
    * 100 TB shape: doc rows collapse map-side into a
    * (digest, source, keep) census FIRST; the group-size lookup is a
    * census⋈census join on the digest key (key-uniform — never a
    * window over a hot digest, never a second doc scan); output is
    * ≤ 2·sources rows.
    */
  def qualityVsDup(spark: SparkSession, dir: String): DataFrame = {
    // the planted-dup corpus WITH the stored n_chars column, so the
    // shared keep rule gates exactly as qualityGate does
    val d = Tables.documents(spark, dir)
      .select("doc_id", "text", "source", "n_chars")
    val planted = d.unionByName(
      d.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val flagged = qualityFlagsOf(planted)
      .select(col("source"), col("keep"),
        md5(lower(trim(col("text")))).as("h"))
    val lvl1 = flagged.groupBy("h", "source", "keep")
      .agg(count(lit(1)).as("nl"))
    val tot = lvl1.groupBy("h").agg(sum("nl").as("nt"))
    lvl1.join(tot, "h")
      .groupBy("source", "keep")
      .agg(sum(col("nl")).as("n_docs"),
        sum(when(col("nt") > 1, col("nl")).otherwise(0L)).as("n_dup"))
      .select(col("source"), col("keep").cast("bigint").as("kept"),
        col("n_docs"), col("n_dup"),
        round(col("n_dup") * 100.0 / col("n_docs"), 4).as("dup_pct"))
      .orderBy("source", "kept")
  }

  /** Repetition filter (the Gopher-rules shape): per-doc duplicate
    * 3-gram fraction (1 − distinct/total) and top-token mass fraction,
    * thresholded and rolled up per source — the "remove degenerate
    * repetitive documents" gate of a training-data pipeline.
    *
    * Determinism: per-doc fractions are exact-rational double
    * divisions; the per-source averages accumulate the ROUNDED per-doc
    * values as DECIMAL so the sum is order-independent. Shuffle shape:
    * one exchange on (doc, token) for the token mode (map-side
    * combined), one window sharing nothing further, one final
    * partial-agg on source.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("toks",
        expr("filter(split(lower(text), ' '), x -> x <> '')"))
      .withColumn("n_tokens", size(col("toks")).cast("bigint"))
      .withColumn("n3_total",
        greatest(col("n_tokens") - 2, lit(0L)))
      .withColumn("n3_distinct",
        when(col("n_tokens") >= 3,
          size(graft.functions.TextExpressions.wordNGrams(col("text"), 3))
            .cast("bigint"))
          .otherwise(lit(0L)))
      .withColumn("dup3_frac",
        when(col("n3_total") > 0,
          round(lit(1.0) - col("n3_distinct").cast("double")
            / col("n3_total"), 4))
          .otherwise(lit(0.0)))
      .select("doc_id", "source", "toks", "n_tokens", "dup3_frac")
    // top-token mass: the count of the most frequent token per doc
    val topTok = docs
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("max_tok"))
    docs.join(topTok, Seq("doc_id"), "left")
      .withColumn("toptok_frac",
        when(col("n_tokens") > 0,
          round(coalesce(col("max_tok"), lit(0L)).cast("double")
            / col("n_tokens"), 4))
          .otherwise(lit(0.0)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("dup3_frac") > 0.2).cast("int")).as("n_rep_3gram"),
        sum((col("toptok_frac") > 0.2).cast("int")).as("n_rep_token"),
        // exact decimal SUM cast to double BEFORE the division — a
        // decimal division's result scale differs across engines
        round(sum(col("dup3_frac").cast("decimal(14,4)")).cast("double")
          / count(lit(1)), 4).as("avg_dup3"),
        round(sum(col("toptok_frac").cast("decimal(14,4)")).cast("double")
          / count(lit(1)), 4).as("avg_toptok"))
      .orderBy("source")
  }

  /** Data-mixture sampling weights (the DoReMi/Pile-style "domain
    * reweighting" audit a training run does before sampling): actual
    * token share per source vs a Zipf target mixture (raw weight
    * 1/(idx+1) over the OBSERVED sources — no hardcoded source list),
    * and the per-source sampling weight target/actual; weight > 1
    * means the source must be oversampled (epochs repeated) to hit
    * the target mix.
    *
    * Determinism: token counts are whitespace length arithmetic
    * (exact integers); the Zipf normalizer sums DECIMAL(20,10)-cast
    * raw weights so the ≤S-row reduction is order-independent.
    * Shuffle shape: one map-combined partial agg to S source rows,
    * one one-row census broadcast back — nothing else.
    */
  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .withColumn("t", trim(col("text")))
      .withColumn("n_tokens",
        when(length(col("t")) === 0, lit(0L)).otherwise(
          (length(col("t")) - length(expr("replace(t, ' ', '')")) + 1)
            .cast("bigint")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
      .withColumn("raw_w",
        (lit(1.0) / (expr("cast(substring(source, 4) as int)") + 1))
          .cast("decimal(20,10)"))
    val totals = perSource.agg(sum(col("tokens")).as("tot_tokens"),
      sum(col("raw_w")).as("tot_w"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") / col("tot_tokens"), 6)
          .as("actual_share"),
        round(col("raw_w").cast("double") / col("tot_w").cast("double"), 6)
          .as("target_share"))
      .withColumn("sampling_weight",
        round(col("target_share") / col("actual_share"), 4))
      .orderBy("source")
  }

  /** Lexical-diversity audit: per-doc unigram Shannon entropy,
    * type-token ratio and hapax count, rolled up per source — the
    * low-diversity signal orthogonal to [[repetition]]'s duplicate-span
    * gate (a doc cycling two tokens fools 3-gram distinctness far less
    * than it fools entropy). Docs with ≥1 token participate; the
    * synthetic corpus has no empty docs.
    *
    * Determinism: H = ln(n) − Σ c·ln(c)/n; each c·ln(c) term is cast
    * to DECIMAL(20,10) before the per-doc sum (order-independent — the
    * [[unigramLogprob]] trick), per-doc H and TTR round to 4 places,
    * and the per-source averages sum those rounded values as DECIMAL.
    * Shuffle shape: one exchange on (doc, token) with map-side
    * combine, then a partial-agg on source — nothing corpus-global.
    */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .as("tok"))
    val perDoc = toks
      .groupBy("doc_id", "source", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "source")
      .agg(sum("c").as("n"),
        count(lit(1)).as("n_types"),
        sum((col("c") === 1).cast("long")).as("n_hapax"),
        sum((col("c").cast("double") * log(col("c").cast("double")))
          .cast(LpDec)).as("s"))
      .select(col("source"), col("n_hapax"),
        round(log(col("n").cast("double"))
          - col("s").cast("double") / col("n"), 4).as("entropy"),
        round(col("n_types").cast("double") / col("n"), 4).as("ttr"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("entropy") < 3.2).cast("long")).as("n_low_entropy"),
        round(sum(col("entropy").cast("decimal(14,4)")).cast("double")
          / count(lit(1)), 4).as("avg_entropy"),
        round(sum(col("ttr").cast("decimal(14,4)")).cast("double")
          / count(lit(1)), 4).as("avg_ttr"),
        sum(col("n_hapax")).as("hapax_total"))
      .orderBy("source")
  }

  /** Top-3 longest documents per source via the bounded
    * [[graft.functions.TopKByScore]] aggregate. A per-source
    * row_number window would hash the WHOLE corpus into
    * one-partition-per-source (a handful of reducers own 100 TB —
    * the straggler shape); the aggregate's map-side partials cap each
    * task at 3 rows per source, so the exchange is trivial at any
    * scale. n_chars round-trips exactly through the double score
    * (< 2^53).
    */
  def topPerSource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .groupBy("source")
      .agg(graft.functions.TopKByScore
        .topk(col("n_chars").cast("double"), col("doc_id"), 3).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("source"), (col("p") + 1).cast("bigint").as("rnk"),
        col("t.id").as("doc_id"), col("t.score").cast("bigint").as("n_chars"))
      .orderBy("source", "rnk")

  /** PII scrub audit — the redaction pass a training corpus runs
    * before anything else: detect emails and phone numbers, count
    * them, and measure the redacted output. The synthetic corpus has
    * no natural PII, so deterministic contact strings are planted on
    * every 7th/11th document (the established planting pattern —
    * results non-trivial, oracle identical).
    *
    * Per-row regex work only (scan-side, codegen'd), one per-source
    * partial agg; `redacted_chars` proves the replacement actually
    * ran (width change), without shipping any text to the driver.
    * Regexes are RE2-compatible so both engines match identically;
    * DuckDB needs the 'g' flag to mirror Spark's replace-all.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val planted = Tables.documents(spark, dir)
      .withColumn("text2",
        when(col("doc_id") % 7 === 0,
          concat(col("text"),
            lit(" contact alice@example.com or 555-123-4567")))
          .when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" mail bob@test.org")))
          .otherwise(col("text")))
    planted
      .withColumn("n_emails", regexp_count(col("text2"), lit(emailRe)))
      .withColumn("n_phones", regexp_count(col("text2"), lit(phoneRe)))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("text2"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n_emails") + col("n_phones") > 0).cast("bigint"))
          .as("n_pii_docs"),
        sum(col("n_emails")).cast("bigint").as("n_emails"),
        sum(col("n_phones")).cast("bigint").as("n_phones"),
        sum(length(col("redacted"))).cast("bigint").as("redacted_chars"))
      .orderBy("source")
  }

  /** Unigram language-model score — the perplexity-proxy quality
    * signal real corpus pipelines gate on (CCNet/Gopher use an LM
    * score; the self-trained unigram model is its distributed
    * baseline): corpus token frequencies become per-token log
    * probabilities, each document scores its mean token log-prob, and
    * sources roll up with a low-score tail count (avg < −3.5).
    *
    * Determinism/parity: ln() doubles are cast to DECIMAL(20,10)
    * once per VOCABULARY entry (deterministic per token), so all
    * per-doc and per-source sums are exact and order-independent;
    * the low-score test cross-multiplies (s < −3.5·n) instead of
    * dividing; doubles reappear only in the final rounded outputs.
    *
    * Shuffle shape at 100 TB: token counts are one map-combined
    * exchange on tok; the score join is a second exchange on tok
    * (vocabulary-sized build side — NOT broadcast: a web corpus's
    * vocabulary is billions of n-grams); per-doc and per-source
    * partial-aggs follow. No windows, no driver collection.
    */
  private val LpDec = "decimal(20,10)"

  /** Per-doc unigram log-prob state (Σ log p(tok) as exact DECIMAL +
    * token count) — shared by [[unigramLogprob]] and the CCNet-style
    * tier split [[ccnetBuckets]].
    */
  private def perDocLogprob(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("tot"))
    val lp = vocab.crossJoin(broadcast(total))
      .select(col("tok"),
        log(col("cnt").cast("double") / col("tot")).cast(LpDec).as("lp"))
    toks.join(lp, "tok")
      .groupBy("doc_id", "source")
      .agg(sum(col("lp")).as("s"), count(lit(1)).as("n_toks"))
  }

  def unigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val dec = LpDec
    val perDoc = perDocLogprob(spark, dir)
    perDoc
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s") < lit(-3.5).cast(dec) * col("n_toks"), 1L)
          .otherwise(0L)).as("n_low"),
        sum(col("s")).as("s_all"), sum(col("n_toks")).as("toks_all"))
      .select(col("source"), col("n_docs"), col("n_low"),
        round(col("s_all").cast("double") / col("toks_all"), 4)
          .as("avg_token_logprob"))
      .orderBy("source")
  }

  /** Worst-document triage list: the bottom-20 docs by mean unigram
    * log-prob — the "eyeball the tail" report a quality engineer pulls
    * after [[unigramLogprob]] flags a source (CCNet-style pipelines
    * human-review exactly this list before tuning thresholds). Scores
    * round to 6 dp BEFORE ranking so the order is engine-identical;
    * ranking rides the bounded TopKByScore aggregate (k-row map-side
    * partials — never a global doc sort), and the 20 survivors join
    * text stats back via broadcast.
    */
  def perplexityOutliers(spark: SparkSession, dir: String): DataFrame = {
    val scored = perDocLogprob(spark, dir)
      .select(col("doc_id"), col("source"), col("n_toks"),
        round(col("s").cast("double") / col("n_toks"), 6).as("score"))
    val worst = scored
      .agg(graft.functions.TopKByScore
        .topkAsc(col("score"), col("doc_id"), 20).as("top"))
      .select(posexplode(col("top")).as(Seq("p", "t")))
      .select(col("t.id").as("doc_id"),
        (col("p") + 1).cast("bigint").as("rank"))
    scored.join(broadcast(worst), Seq("doc_id"))
      .select(col("rank"), col("doc_id"), col("source"), col("n_toks"),
        col("score"))
      .orderBy("rank")
  }

  /** CCNet-style quality tiers: documents split into head / middle /
    * tail at the global terciles of the per-doc mean token log-prob —
    * the bucketing CCNet applies before sampling training data
    * preferentially from the head. The tercile row broadcasts back
    * (no global sort of the corpus), and per-tier mean scores sum in
    * DECIMAL so the roll-up is order-independent.
    *
    * Scale honesty: the cut uses Spark's EXACT percentile, whose
    * final aggregation buffers every distinct (score, count) pair in
    * one task — fine at verify/bench scale and required for oracle
    * hash-parity, but corpus-sized state at billions of docs. The
    * 100 TB variant swaps exactly one line: cut the terciles with
    * [[graft.functions.QuantileSketch]] (bounded O(k log n) state,
    * same broadcast-back shape) at the cost of sketch-rank error on
    * the tier boundaries.
    */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val scored = perDocLogprob(spark, dir)
      .select(col("doc_id"), col("source"),
        (col("s").cast("double") / col("n_toks")).as("score"))
    val cuts = scored.agg(
      expr("percentile(score, 0.3333333333333333d)").as("t1"),
      expr("percentile(score, 0.6666666666666666d)").as("t2"))
    tierRollup(scored, cuts)
  }

  /** The 100 TB variant of [[ccnetBuckets]]: identical pipeline, but
    * the tercile cut comes from a KLL sketch
    * ([[graft.functions.QuantileSketch]]) — bounded O(k log n)
    * aggregation state where the exact percentile buffers every
    * distinct score in one task.
    *
    * Two checked regimes, selected by k (the same split
    * `q_sketch_quantile` proves for the KLL family): with the default
    * k the sketch compacts and tier counts are ApproxSpec-bounded
    * against the exact split; with k above the corpus doc count
    * (`doc_ccnet_sketched` passes 2¹⁷) no compaction fires, the sketch
    * quantile IS the sorted-rank element at ⌊q·n⌋ (capped n−1), and
    * the whole query hash-matches a DuckDB twin that reads the same
    * rank off a sorted list — the declared 100 TB path itself under
    * the oracle, with no exact `percentile` anywhere in the plan.
    */
  def ccnetBucketsSketched(spark: SparkSession, dir: String,
      k: Int = 256): DataFrame = {
    import graft.functions.QuantileSketch
    val scored = perDocLogprob(spark, dir)
      .select(col("doc_id"), col("source"),
        (col("s").cast("double") / col("n_toks")).as("score"))
    val cuts = scored
      .agg(QuantileSketch.sketchAgg(col("score"), k).as("sk"))
      .select(
        QuantileSketch.estimate(col("sk"), 1.0 / 3).as("t1"),
        QuantileSketch.estimate(col("sk"), 2.0 / 3).as("t2"))
    tierRollup(scored, cuts)
  }

  /** Shared head/middle/tail roll-up given the (t1, t2) cut row. */
  private def tierRollup(scored: DataFrame, cuts: DataFrame): DataFrame =
    scored.crossJoin(broadcast(cuts))
      .withColumn("tier",
        when(col("score") >= col("t2"), "head")
          .when(col("score") >= col("t1"), "middle")
          .otherwise("tail"))
      .groupBy("source", "tier")
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("score").cast(LpDec)).cast("double")
          / count(lit(1)), 4).as("avg_score"))
      .orderBy("source", "tier")

  /** Deterministic shard id for training-data export: an md5 bucket of
    * the doc key (the [[hashSample]] trick), so the assignment is
    * reproducible across runs, engines and cluster sizes — unlike
    * `pmod(hash(...))` whose seed is engine-private. Pure per-row
    * column work, no shuffle.
    */
  private[graft] def shardCol(nShards: Int): Column = expr(
    s"""cast(conv(substring(md5(concat('shard:',
        cast(doc_id as string))), 1, 7), 16, 10) as bigint) % $nShards""")

  /** Deterministic within-shard stream order (a pseudo-random shuffle
    * decorrelating neighbouring doc_ids) — shared by [[packStats]]
    * and [[graft.sources.TrainingExport]] so the exported shard files
    * carry exactly the audited packing stream.
    */
  private[graft] def ordCol: Column =
    md5(concat(lit("ord:"), col("doc_id").cast("string")))

  /** Shard-balance census for training-data export: docs, tokens and
    * bytes per deterministic hash shard. The audit a sharded-export
    * job runs FIRST — a skewed shard means a straggling writer and an
    * oversized training file. One partial-agg shuffle on ≤ nShards
    * keys; token counting rides the same scan (no second pass).
    * Shard count is configuration — at 100 TB it scales with the
    * corpus while this plan shape is unchanged.
    */
  def shardStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(shardCol(64).as("shard"), col("n_chars"),
        size(split(trim(col("text")), " ")).as("toks"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks").cast("bigint")).as("n_tokens"),
        sum(col("n_chars")).as("n_bytes"),
        max(col("toks").cast("bigint")).as("max_doc_tokens"))
      .orderBy("shard")

  /** Sequence-packing layout audit: greedy concat-then-cut packing of
    * documents into fixed token-budget training sequences, laid out
    * per hash shard. Within a shard, docs stream in md5 order (a
    * deterministic pseudo-random shuffle — neighbouring doc_ids do
    * NOT land in the same sequence, which is the point: packing
    * correlated docs into one context window biases training). Each
    * doc starts in bin floor(tokens_before / budget); docs straddle
    * bin boundaries (the standard concat-and-chunk regime), counted
    * as `n_straddlers`. Fill percentage can exceed 100 for a shard
    * whose straddlers spill past the last cut — that is a property of
    * the layout, not an error.
    *
    * Scale: the only window runs INSIDE a shard partition — shard
    * cardinality is configuration, each holds corpus/nShards docs by
    * hash uniformity, so partitions stay bounded and uniform at any
    * corpus size (the [[doc_tfidf]]-style "uniform high-cardinality
    * key" window, never a global sort). Everything after the window
    * is integer arithmetic and two tiny aggregates.
    */
  def packStats(spark: SparkSession, dir: String): DataFrame = {
    val budget = 512 // tokens per packed training sequence
    val w = Window.partitionBy("shard").orderBy("ord", "doc_id")
    val packed = Tables.documents(spark, dir)
      .select(col("doc_id"), shardCol(64).as("shard"), ordCol.as("ord"),
        size(split(trim(col("text")), " ")).cast("bigint").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .select(col("shard"), col("toks"),
        expr(s"(cum - toks) div $budget").as("bin"),
        expr(s"""case when (cum - 1) div $budget > (cum - toks) div $budget
                 then 1 else 0 end""").as("straddles"))
    packed
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("bin")).as("n_bins"),
        sum(col("toks")).as("n_tokens"),
        sum(col("straddles")).as("n_straddlers"))
      .withColumn("fill_pct",
        round(col("n_tokens") * 100.0 / (col("n_bins") * budget), 2))
      .orderBy("shard")
  }

  /** Zipf-law fit: OLS regression of log10(frequency) on log10(rank)
    * over the corpus's top-100 tokens — the one-number summary of
    * [[zipfTokens]]'s curve (a natural corpus sits near slope −1;
    * boilerplate-heavy or deduplicated corpora drift off it, which is
    * why corpus builds track the slope across versions).
    *
    * Determinism: each point's log10 values and their products are
    * computed per ROW in double (identical on both engines) and cast
    * to DECIMAL before the sums, so the regression moments are exact
    * and order-independent; doubles reappear only in the final
    * slope/intercept division. Scale: token counting is one
    * map-combined exchange, the top-100 is TakeOrderedAndProject
    * (never a global vocabulary sort), and the regression itself runs
    * over ≤100 rows.
    */
  def zipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val dec = LpDec
    val counts = Tables.documents(spark, dir)
      .select(explode(
        expr("filter(split(lower(text), ' '), x -> x <> '')")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
    val top = counts.orderBy(col("n").desc, col("tok")).limit(100)
    val w = Window.orderBy(col("n").desc, col("tok"))
    val pts = top
      .withColumn("rank", row_number().over(w).cast("double"))
      .select(
        log10(col("rank")).cast(dec).as("x"),
        log10(col("n").cast("double")).cast(dec).as("y"),
        (log10(col("rank")) * log10(col("rank"))).cast(dec).as("xx"),
        (log10(col("rank")) * log10(col("n").cast("double")))
          .cast(dec).as("xy"))
    pts.agg(count(lit(1)).as("n_ranks"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum("xx").as("sxx"), sum("xy").as("sxy"))
      .select(col("n_ranks"),
        round((col("n_ranks") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n_ranks") * col("sxx") - col("sx") * col("sx"))
            .cast("double"), 6).as("slope"),
        round((col("sy") - ((col("n_ranks") * col("sxy")
            - col("sx") * col("sy")).cast("double")
          / (col("n_ranks") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) * col("sx")).cast("double")
          / col("n_ranks"), 6).as("intercept"))
  }

  /** Interpolated bigram language-model score per source — the
    * next rung above [[unigramLogprob]] on the perplexity-filtering
    * ladder (CCNet proper scores with a 5-gram KenLM; a bigram model
    * is the honest in-engine version with the same plan shape). Each
    * token scores log(λ·P(w|prev) + (1−λ)·P(w)), λ = 0.7, where
    * P(w|prev) is the bigram MLE and the unigram term is the backoff
    * mass that keeps unseen continuations finite.
    *
    * Determinism: the log is evaluated once per bigram TYPE
    * (deterministic per row) and cast to DECIMAL, so the per-doc and
    * per-source sums are exact in any order; the low-score flag
    * cross-multiplies instead of dividing.
    *
    * 100 TB shuffle shape: bigram construction is pure map work
    * (zip_with over the token array — no positional self-join);
    * bigram/context/unigram counts are map-combined exchanges on
    * vocabulary keys, NEVER broadcast (a web corpus's bigram
    * vocabulary is billions of rows); the score joins back on the
    * same keys; one corpus-total row broadcasts.
    */
  def bigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val dec = LpDec
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("toks"))
    val bi = docs
      .select(col("doc_id"), col("source"), explode(expr(
        """zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),
                    slice(toks, 2, greatest(size(toks) - 1, 0)),
                    (a, b) -> concat(a, ' ', b))""")).as("bg"))
    val cb = bi.groupBy("bg").agg(count(lit(1)).as("cb"))
      .withColumn("w1", expr("substring_index(bg, ' ', 1)"))
      .withColumn("w2", expr("substring_index(bg, ' ', -1)"))
    val ctx = cb.groupBy("w1").agg(sum("cb").as("cctx"))
    val toks = docs.select(explode(col("toks")).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("cu"))
    val total = toks.agg(count(lit(1)).as("tot"))
    val lp = cb.join(ctx, "w1")
      .join(uni.withColumnRenamed("tok", "w2"), "w2")
      .crossJoin(broadcast(total))
      .select(col("bg"),
        log(lit(0.7) * (col("cb").cast("double") / col("cctx"))
          + lit(0.3) * (col("cu").cast("double") / col("tot")))
          .cast(dec).as("lp"))
    bi.join(lp, "bg")
      .groupBy("doc_id", "source")
      .agg(sum(col("lp")).as("s"), count(lit(1)).as("n_bi"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s") < lit(-4.0).cast(dec) * col("n_bi"), 1L)
          .otherwise(0L)).as("n_low"),
        sum(col("s")).as("s_all"), sum(col("n_bi")).as("bi_all"))
      .select(col("source"), col("n_docs"), col("n_low"),
        round(col("s_all").cast("double") / col("bi_all"), 4)
          .as("avg_bigram_logprob"))
      .orderBy("source")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much more likely its tokens are under a TARGET
    * distribution (here the `lang = 'en'` slice — the stand-in for
    * "high-quality domain") than under the RAW corpus, w(doc) =
    * Σ_tok [log p_target(tok) − log p_raw(tok)], with add-one
    * smoothing over the shared corpus vocabulary so unseen-in-target
    * tokens stay finite. Positive-weight docs are the ones importance
    * resampling would up-sample into the training mix.
    *
    * Same determinism contract as [[unigramLogprob]]: both log terms
    * evaluate once per vocabulary TYPE, land in DECIMAL, and all
    * sums are exact; outputs round at the end. Shuffle shape: two
    * map-combined vocabulary aggregates off one scan (target counts
    * ride a conditional sum — no second pass), a join back on tok,
    * and per-doc/per-source partials; the two scalar totals broadcast
    * as one row.
    */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val dec = LpDec
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        explode(expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .as("tok"))
    val vocab = toks.groupBy("tok")
      .agg(count(lit(1)).as("craw"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ctgt"))
    val totals = vocab.agg(sum("craw").as("traw"), sum("ctgt").as("ttgt"),
      count(lit(1)).as("v"))
    val lp = vocab.crossJoin(broadcast(totals))
      .select(col("tok"),
        (log((col("ctgt") + 1.0) / (col("ttgt") + col("v")))
          - log((col("craw") + 1.0) / (col("traw") + col("v"))))
          .cast(dec).as("dlp"))
    toks.join(lp, "tok")
      .groupBy("doc_id", "source")
      .agg(sum(col("dlp")).as("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("w") > lit(0).cast(dec), 1L).otherwise(0L))
          .as("n_upweighted"),
        sum(col("w")).as("w_all"))
      .select(col("source"), col("n_docs"), col("n_upweighted"),
        round(col("w_all").cast("double") / col("n_docs"), 4)
          .as("avg_weight"))
      .orderBy("source")
  }

  /** Per-source distribution shift — KL(source ‖ corpus) over unigram
    * distributions, the domain-shift metric a mixture-balancing pass
    * ranks sources by before reweighting (a source whose vocabulary
    * usage diverges from the corpus carries distinct — or broken —
    * content). One token-explode pass feeds all three aggregates: the
    * (source, token) counts, the corpus per-token counts (rolled up
    * FROM the source counts, never a second scan), and the per-source
    * totals census. The only corpus-axis join is (source, token) ⋈
    * token — vocabulary-scale on a high-cardinality key, the
    * [[dsirWeights]] shape; totals broadcast (S rows / one row). KL
    * terms are p·(ln p − ln q) computed in double and summed as exact
    * DECIMAL, so the per-source sum is partition-order independent
    * and the oracle matches bit for bit.
    */
  def sourceKl(spark: SparkSession, dir: String): DataFrame = {
    val dec = LpDec
    val toks = Tables.documents(spark, dir)
      .select(col("source"),
        explode(expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .as("tok"))
    val st = toks.groupBy("source", "tok").agg(count(lit(1)).as("cs"))
    val ct = st.groupBy("tok").agg(sum("cs").as("c"))
    val stot = st.groupBy("source")
      .agg(sum("cs").as("ns"), count(lit(1)).as("vocab_src"))
    val ntot = ct.agg(sum("c").as("n"))
    val p = col("cs").cast("double") / col("ns")
    val q = col("c").cast("double") / col("n")
    st.join(ct, "tok")
      .join(broadcast(stot), "source")
      .crossJoin(broadcast(ntot))
      .select(col("source"), col("ns"), col("vocab_src"),
        (p * (log(p) - log(q))).cast(dec).as("term"))
      .groupBy("source", "ns", "vocab_src")
      .agg(round(sum(col("term")).cast("double"), 6).as("kl_vs_corpus"))
      .select(col("source"), col("ns").as("n_tokens"),
        col("vocab_src").as("vocab_size"), col("kl_vs_corpus"))
      .orderBy("source")
  }

  /** BM25 top-5 retrieval for 8 anchor-doc queries — the ranked-
    * retrieval shape [[tfidf]]'s per-doc keyword report lacks (the
    * decontamination / RAG-audit primitive: "which corpus docs does
    * this query pull?"). Each anchor's query is its own top-3 tf-idf
    * terms; every doc holding any query term is scored with
    * Robertson/Sparck-Jones BM25 (k1=1.2, b=0.75, the classic
    * operating point). Scale shape: tf/df/dl are the one-scan linear
    * censuses every text op here shares; the query-term set is ≤24
    * rows and BROADCAST, so scoring is a semi-join-shaped scan of the
    * tf census — no corpus-axis shuffle beyond the censuses
    * themselves — and the top-5 rides a per-qid window over only the
    * matched postings. Per-term contributions are computed in double
    * and summed as exact DECIMAL, so the score is partition-order
    * independent and rank ties (score, doc_id) match the oracle.
    */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    bm25Of(spark, dir, cap = None)

  /** Impact-ordered-index BM25 — the retrieval SCALE path: candidate
    * enumeration reads only each term's top-[[Bm25M]] postings by
    * (per-posting BM25 impact DESC, doc_id) — see [[bm25ImpactCol]]
    * for why the impact, not raw tf, is the ordering (the r14
    * RECALL_r14 finding) — the classic impact-sorted-list pruning
    * (Anh & Moffat, SIGIR 2006 family) that bounds per-term scoring
    * work regardless of how hot the term is. The cap rides the
    * bounded TopKByScore aggregate (k-row map-side partials), never a
    * per-term rank window — a stopword's corpus-sized posting list is
    * exactly the partition such a window could not split. Global
    * statistics (df, dl, avgdl, N) stay EXACT — pruning changes which
    * documents are scored, never how. [[bm25Recall]] grades the loss.
    */
  def bm25Pruned(spark: SparkSession, dir: String): DataFrame =
    bm25Of(spark, dir, cap = Some(Bm25M))

  /** Recall audit of the impact-capped index vs full BM25: per query,
    * how many of the true top-5 the pruned index reproduces — the
    * emb_ann_recall discipline applied to text retrieval.
    */
  def bm25Recall(spark: SparkSession, dir: String): DataFrame = {
    val full = bm25TopK(spark, dir).select(col("qid"), col("doc_id"))
    val pruned = bm25Pruned(spark, dir)
      .select(col("qid").as("pqid"), col("doc_id").as("pdoc"))
    full.join(pruned,
        col("qid") === col("pqid") && col("doc_id") === col("pdoc"),
        "left")
      .groupBy("qid")
      .agg(count(col("pdoc")).as("n_hits"), count(lit(1)).as("k"))
      .select(col("qid"), col("n_hits"), col("k"),
        round(col("n_hits").cast("double") / col("k"), 4).as("recall"))
      .orderBy("qid")
  }

  /** Recall OPERATING CURVE of the impact-capped index over
    * M ∈ {16, 64, 256} — the emb_nprobe_curve discipline applied to
    * text retrieval, so the single-point recall number becomes a
    * curve a deployment can pick M from. ONE bounded postings pass
    * feeds all three caps: [[graft.functions.TopKByScore]] keeps its
    * buffer best-first sorted, so the top-M posting list at a coarser
    * cap is exactly the length-M PREFIX of the top-256 array
    * (`slice`, no re-aggregation) — prefix-stable by construction,
    * the way a real impact-sorted index serves any cap from one
    * materialized ordering. Each cap's top-5 is then graded against
    * the exact top-5 per query.
    */
  def bm25RecallCurve(spark: SparkSession, dir: String): DataFrame = {
    val (tf, df_, dl) = bm25Parts(spark, dir)
    val glob = bm25Glob(dl)
    val qterms = bm25QTerms(tf, df_, glob)
    val levels = Bm25CurveLevels
    val topMax = tf.join(dl, "doc_id")
      .crossJoin(broadcast(glob.select("avgdl")))
      .groupBy("tok")
      .agg(graft.functions.TopKByScore
        .topkTagged(bm25ImpactCol, col("doc_id"), col("tf"), levels.max)
        .as("top"))
    val pruned = levels.map { m =>
      topMax.select(lit(m.toLong).as("m"), col("tok"),
          explode(expr(s"slice(top, 1, $m)")).as("t"))
        .select(col("m"), col("tok"), col("t.id").as("doc_id"),
          col("t.tag").as("tf"))
    }.reduce(_ unionByName _)
    val prunedTop5 = bm25ScoredFrom(pruned, qterms, df_, dl, glob,
        Seq("m", "qid", "doc_id"))
      .groupBy("m", "qid")
      .agg(graft.functions.TopKByScore
        .topk(col("s").cast("double"), col("doc_id"), 5).as("top"))
      .select(col("m"), col("qid"),
        explode(expr("transform(top, t -> t.id)")).as("pdoc"))
    val full5 = bm25ScoredFrom(tf, qterms, df_, dl, glob,
        Seq("qid", "doc_id"))
      .groupBy("qid")
      .agg(graft.functions.TopKByScore
        .topk(col("s").cast("double"), col("doc_id"), 5).as("top"))
      .select(col("qid"),
        explode(expr("transform(top, t -> t.id)")).as("doc_id"))
    // truth × levels is |Q|×5×3 rows; the graded side is |Q|×5×3 —
    // both tiny, the join broadcasts
    val expanded = full5.select(col("qid"), col("doc_id"),
      explode(array(levels.map(m => lit(m.toLong)): _*)).as("m"))
    expanded.as("f")
      .join(broadcast(prunedTop5).as("p"),
        col("f.m") === col("p.m") && col("f.qid") === col("p.qid")
          && col("f.doc_id") === col("p.pdoc"), "left")
      .groupBy(col("f.qid"), col("f.m"))
      .agg(count(col("p.pdoc")).as("n_hits"), count(lit(1)).as("k"))
      .select(col("qid"), col("m"), col("n_hits"), col("k"),
        round(col("n_hits").cast("double") / col("k"), 4).as("recall"))
      .orderBy("qid", "m")
  }

  /** Hybrid retrieval — reciprocal-rank fusion (Cormack et al.'s RRF,
    * the k=60 convention) of the two ranking engines this library
    * already serves: lexical BM25 ([[bm25TopK]]) and embedding
    * cosine kNN ([[VectorOps.knnBrute]]), over the shared anchor
    * queries qid < 8 (the corpus's parallel id space: documents
    * doc_id ≡ embeddings vec_id). This is the standard RAG-serving
    * shape: neither engine's scores are comparable, so fusion runs on
    * RANKS alone — each engine contributes 1/(60+rank) for the docs
    * it returned, summed where both agree.
    *
    * Exactness: the fraction sum is carried as INTEGER arithmetic —
    * both contributions scale by lcm(61..65) = 495593280, so
    * 495593280 div (60+rank) is exact for every rank ≤ 5 and the
    * fused score is a plain BIGINT both engines order identically
    * (no float summation anywhere). Scale shape: inputs are the two
    * engines' top-5 lists (≤ 2·5·|Q| rows by construction — the
    * expensive work happened inside each engine, which is the point
    * of fusion), so the full-outer merge and the final per-qid cut
    * are driver-trivial at any corpus size.
    */
  def hybridTopK(spark: SparkSession, dir: String): DataFrame =
    rrfFuse(
      bm25TopK(spark, dir)
        .select(col("qid"), col("doc_id"), col("rank").as("br")),
      VectorOps.knnBrute(spark, dir)
        .filter(col("qid") < 8)
        .select(col("qid"), col("neighbor").as("doc_id"),
          col("rank").as("kr")))

  /** The 100 TB SERVING twin of [[hybridTopK]] — both engines swapped
    * for their committed scale paths: impact-capped BM25
    * ([[bm25Pruned]], the M=256 operating point; in a deployment this
    * side reads the [[graft.sources.TermIndexStore]] capped
    * companion) and IVF-probed kNN ([[VectorOps.knnIvf]], 4-cell
    * probe instead of the N-scan). Fusion itself is unchanged — RRF
    * only sees ranks, which is exactly why swapping engines under it
    * is safe; [[hybridRecall]] grades what the two approximations
    * cost the FUSED list.
    */
  def hybridTopKIvf(spark: SparkSession, dir: String): DataFrame =
    rrfFuse(
      bm25Pruned(spark, dir)
        .select(col("qid"), col("doc_id"), col("rank").as("br")),
      VectorOps.knnIvf(spark, dir)
        .filter(col("qid") < 8)
        .select(col("qid"), col("neighbor").as("doc_id"),
          col("rank").as("kr")))

  /** Recall audit of the scale-path hybrid vs the exact hybrid per
    * query — the emb_ann_recall / bm25_recall discipline applied to
    * the FUSED list (the number a RAG deployment actually serves):
    * of the exact top-5 fusion, how many the pruned+probed fusion
    * reproduces.
    */
  def hybridRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = hybridTopK(spark, dir).select(col("qid"), col("doc_id"))
    val approx = hybridTopKIvf(spark, dir)
      .select(col("qid").as("pqid"), col("doc_id").as("pdoc"))
    exact.join(approx,
        col("qid") === col("pqid") && col("doc_id") === col("pdoc"),
        "left")
      .groupBy("qid")
      .agg(count(col("pdoc")).as("n_hits"), count(lit(1)).as("k"))
      .select(col("qid"), col("n_hits"), col("k"),
        round(col("n_hits").cast("double") / col("k"), 4).as("recall"))
      .orderBy("qid")
  }

  /** The DEPLOYMENT hybrid — [[hybridTopKIvf]]'s fusion served off
    * the two PERSISTED engines: impact-capped BM25 read from the
    * [[graft.sources.TermIndexStore]] capped companion (at the
    * store's own recorded M) and IVF+PQ kNN read from the
    * [[graft.sources.VectorIndex]] codes table. This is the path a
    * RAG service actually runs — no query re-tokenizes the corpus, no
    * query re-routes or re-encodes a vector; both engine reads are
    * bucketed index scans and the corpus-sized work happened once, at
    * build time. Fusion is the identical [[rrfFuse]] tail (exact
    * integer RRF), so swapping the lexical engine's serving layout
    * changes nothing about the fused semantics, and the vector side's
    * PQ approximation is priced exactly where the per-engine audits
    * (`emb_ann_recall`, `doc_bm25_recall`) already measure it.
    */
  def hybridTopKStored(spark: SparkSession, dir: String): DataFrame =
    rrfFuse(
      graft.sources.TermIndexStore.searchPrunedFor(spark, dir)
        .select(col("qid"), col("doc_id"), col("rank").as("br")),
      graft.sources.VectorIndex.searchFor(spark, dir)
        .filter(col("qid") < 8)
        .select(col("qid"), col("neighbor").as("doc_id"),
          col("rank").as("kr")))

  /** The serving matrix's fourth corner — EXACT-LEXICAL stored
    * hybrid: [[hybridTopKStored]] with the lexical engine swapped
    * from the capped companion to MaxScore
    * ([[graft.sources.TermIndexStore.searchMaxScoreFor]] — exact at
    * any scale, bounds census off the same companion), vector side
    * unchanged (IVF+PQ off the [[graft.sources.VectorIndex]] codes).
    * The point is RECALL_r14's own finding: the fused list's
    * degradation at scale is ENTIRELY lexical (bm25-pruned recall
    * 0.225/0.0 at 10×/30× while knn-IVF holds 1.0) — so a deployment
    * that pays the MaxScore read on the lexical side recovers the
    * fused recall the fixed-M companion loses, without touching the
    * fusion or the vector engine. Same exact-integer [[rrfFuse]]
    * tail; oracle composes the exact BM25 oracle with the stored
    * IVF+PQ oracle.
    */
  def hybridTopKExactStored(spark: SparkSession,
      dir: String): DataFrame =
    rrfFuse(
      graft.sources.TermIndexStore.searchMaxScoreFor(spark, dir)
        .select(col("qid"), col("doc_id"), col("rank").as("br")),
      graft.sources.VectorIndex.searchFor(spark, dir)
        .filter(col("qid") < 8)
        .select(col("qid"), col("neighbor").as("doc_id"),
          col("rank").as("kr")))

  /** The ceiling-lifted stored hybrid: [[hybridTopKExactStored]]'s
    * exact lexical engine fused with the REFINED stored vector engine
    * ([[graft.sources.VectorIndex.searchRefineFor]] — ADC over-fetch
    * + exact-cosine rescore off the persisted codes). RECALL_r14's
    * exact-lex measurement left the PQ quantization as the stored
    * corners' binding recall constraint; this corner pays one bounded
    * rescore join to remove it. Oracle: exact BM25 × the refined
    * stored-vector oracle under the same fusion SQL.
    */
  def hybridTopKRefinedStored(spark: SparkSession,
      dir: String): DataFrame =
    rrfFuse(
      graft.sources.TermIndexStore.searchMaxScoreFor(spark, dir)
        .select(col("qid"), col("doc_id"), col("rank").as("br")),
      graft.sources.VectorIndex.searchRefineFor(spark, dir)
        .filter(col("qid") < 8)
        .select(col("qid"), col("neighbor").as("doc_id"),
          col("rank").as("kr")))

  /** The RRF fusion tail shared by the exact and scale-path hybrids:
    * full-outer merge of the two engines' (qid, doc_id, rank) lists,
    * exact-integer 1/(60+rank) sum, top-5 by (rrf DESC, doc_id). The
    * candidate set is bounded (≤ 10 per qid) by construction, so the
    * rank window is partition-safe at any corpus scale — the
    * corpus-sized ranking already happened inside each engine.
    */
  private[graft] def rrfFuse(bm: DataFrame, kn: DataFrame): DataFrame = {
    val fused = bm.join(kn, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"),
        (coalesce(expr("495593280 div (60 + br)"), lit(0L))
          + coalesce(expr("495593280 div (60 + kr)"), lit(0L)))
          .as("rrf"),
        col("br"), col("kr"))
    val w = Window.partitionBy("qid")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("doc_id"),
        col("rrf").as("rrf_scaled"),
        col("br").as("bm25_rank"), col("kr").as("knn_rank"))
      .orderBy("qid", "rank")
  }

  /** The shipped impact-cap operating point, picked FROM the measured
    * [[bm25RecallCurve]] on this corpus (M=256 reads 0.95 recall of
    * the exact top-5 under the r14 score-quantized impact order; the
    * former M=64 sits at 0.475 — machinery right, knob wrong).
    * Persisted stores record their own M as a layout marker
    * ([[graft.sources.TermIndexStore]]'s `_graft_m`), so this default
    * moving never silently changes what an existing store serves.
    * The knob is SCALE-DEPENDENT (RECALL_r14): a fixed M over a
    * growing near-uniform-tf corpus decays toward tie-noise — a
    * deployment re-picks M from the curve measured at ITS corpus
    * size (M ∝ N), which the recorded-marker discipline exists to
    * make safe.
    */
  private[graft] val Bm25M = 256

  /** The recall curve's sweep grid — one materialized top-max pass
    * serves every level as a prefix (see [[bm25RecallCurve]]).
    */
  private[graft] val Bm25CurveLevels = Seq(16, 64, 256)

  /** Pick the impact cap FROM the measured curve on THIS corpus: the
    * smallest sweep level whose mean recall of the exact top-5 meets
    * `minRecall`, falling back to the grid's largest level when none
    * does (the largest is the best the grid measured — a deployment
    * whose corpus outgrows it extends [[Bm25CurveLevels]] and
    * re-measures, which is the honest move the RECALL_r14 fixed-M
    * finding demands; it is exactly how M=256 itself was picked).
    * This is the r13 "machinery right, knob wrong" lesson as CODE:
    * the knob is scale-dependent, so the picker ships next to the
    * knob.
    */
  def bm25MFor(spark: SparkSession, dir: String,
      minRecall: Double): Int = {
    val meeting = bm25RecallCurve(spark, dir)
      .groupBy("m").agg(avg(col("recall")).as("r"))
      .filter(col("r") >= minRecall)
      .agg(min(col("m"))).head()
    if (meeting.isNullAt(0)) Bm25CurveLevels.max
    else meeting.getLong(0).toInt
  }

  private def bm25Of(spark: SparkSession, dir: String,
      cap: Option[Int]): DataFrame = {
    val (tf, df_, dl) = bm25Parts(spark, dir)
    bm25From(tf, df_, dl, cap)
  }

  /** The three index parts every BM25 rung derives from one corpus
    * tokenize: (doc_id, tok, tf) postings, (tok, df) document
    * frequencies, (doc_id, dl) lengths.
    */
  private def bm25Parts(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select(col("doc_id"),
        explode(expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .as("tok"))
    // r14: tokenize ONCE per query. tf/df/dl are three aggregates of
    // the same token explode, and every BM25 consumer references all
    // three — without materialization the corpus tokenize subtree
    // recomputes once per reference (doc_bm25_maxscore's plan carried
    // 5-6 copies, measured as repeated 0.8 s single-task stages). tf
    // is the smallest frame that still derives the other two exactly:
    // df = tf's per-token row count, dl = Σ tf per doc (identical to
    // the token count by definition). At 100 TB "materialize the
    // postings once" IS the TermIndexStore; the inline operator now
    // does per-query what the store does per-corpus.
    // r15: LAZY checkpoint — the plan truncation (tokenize once, every
    // consumer reads the materialized tf) is identical, but the
    // materialization now rides the query's own first action instead
    // of a separate up-front job (guide §1.2: per-query sequential
    // actions are the bench-scale cost; one job fewer per BM25 rung)
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    (tf, df_, dl)
  }

  /** The BM25 scoring tail over already-materialized index parts —
    * shared verbatim by the inline operators above (which derive the
    * parts by re-tokenizing the corpus) and the persisted
    * [[graft.sources.TermIndexStore]] twin (which reads them off the
    * bucketed inverted index), so "same math, different source table"
    * has exactly one implementation.
    *
    * @param tf  (doc_id, tok, tf) term frequencies (= the postings)
    * @param df_ (tok, df) document frequencies
    * @param dl  (doc_id, dl) document lengths
    */
  private def bm25Glob(dl: DataFrame): DataFrame =
    dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

  /** Anchor queries: top-3 tf-idf terms of doc_id < 8, ranked on the
    * ROUNDED tf-idf (ties then break on tok) — the [[tfidf]] contract.
    */
  private def bm25QTerms(tf: DataFrame, df_ : DataFrame,
      glob: DataFrame): DataFrame = {
    val qw = Window.partitionBy("qid")
      .orderBy(col("tfidf").desc, col("tok"))
    tf.filter(col("doc_id") < 8)
      .join(df_, "tok").crossJoin(glob.select("n_docs"))
      .select(col("doc_id").as("qid"), col("tok"),
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)),
          6).as("tfidf"))
      .withColumn("rnk", row_number().over(qw))
      .filter(col("rnk") <= 3)
      .select("qid", "tok")
  }

  /** The Okapi BM25 per-posting contribution (k1 = 1.2, b = 0.75)
    * over columns (tf, df, dl, n_docs, avgdl) — ONE definition for
    * every rung of the family.
    */
  private def bm25ContribCol: Column = {
    val k1 = 1.2
    val b = 0.75
    log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
      (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl")
        / col("avgdl")))
  }

  /** Score a postings set against the anchor queries: each posting's
    * DECIMAL-exact contribution summed per `keys` (qid, doc_id — plus
    * a leading sweep column for the recall curve).
    */
  private def bm25ScoredFrom(postings: DataFrame, qterms: DataFrame,
      df_ : DataFrame, dl: DataFrame, glob: DataFrame,
      keys: Seq[String]): DataFrame =
    postings.join(broadcast(qterms), "tok")
      .filter(col("doc_id") =!= col("qid"))
      .join(df_, "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(glob))
      .select(keys.map(col) :+
        bm25ContribCol.cast("decimal(28,10)").as("c"): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("c")).as("s"))

  /** The within-term ranking quantity of the impact order: each
    * posting's own BM25 contribution with the per-term idf factor
    * dropped (constant within a term, so it cannot change the order)
    * — tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) over (tf, dl, avgdl).
    *
    * SCORE-quantized, not tf-quantized, on purpose (r14): ordering by
    * raw tf is blind to document length, and the RECALL_r14
    * measurement showed exactly that failure at scale — near-dup
    * replica families tie on tf, the (tf DESC, doc_id) tie-break
    * keeps arbitrary low ids, and the pruned recall read 0.1 with a
    * FLAT M-curve (no cap size can fix an ordering that can't see
    * dl). Ranking by the contribution itself is the Anh & Moffat
    * impact discipline done right: the docs a query scores highest
    * are, per term, exactly the top of this order.
    */
  private def bm25ImpactCol: Column =
    col("tf") * 2.2 / (col("tf")
      + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))

  /** Read-time impact capping: each term's top-`m` postings by
    * (impact DESC, doc_id) off the bounded payload-tagged top-k
    * aggregate (the raw tf rides as the tag — impact is not
    * invertible without dl) — the fallback the stored index uses
    * between an ingest and the next compaction, and the cap
    * [[bm25From]] applies inline. The tf⋈dl join is corpus-axis but
    * runs at INDEX BUILD time (or the post-ingest fallback), never
    * per query.
    */
  private[graft] def cappedPostings(tf: DataFrame, dl: DataFrame,
      m: Int): DataFrame =
    tf.join(dl, "doc_id")
      .crossJoin(broadcast(bm25Glob(dl).select("avgdl")))
      .groupBy("tok")
      .agg(graft.functions.TopKByScore
        .topkTagged(bm25ImpactCol, col("doc_id"), col("tf"), m)
        .as("top"))
      .select(col("tok"), explode(col("top")).as("t"))
      .select(col("tok"), col("t.id").as("doc_id"),
        col("t.tag").as("tf"))

  /** Per-term MaxScore upper bounds (tok, ub) of a postings frame:
    * each term's max per-posting BM25 contribution, in the same
    * DECIMAL(28,10) the matched frame scores in. Over the impact-capped
    * companion this equals the FULL list's bound (the companion keeps
    * each term's top-M by impact; idf is constant within a term), so a
    * store can materialize this census once at build/compaction time —
    * the corpus-axis df/dl joins run at INDEX BUILD time, never per
    * query ([[cappedPostings]]' own discipline applied to the bounds).
    */
  private[graft] def termBounds(postings: DataFrame, df_ : DataFrame,
      dl: DataFrame): DataFrame =
    postings
      .join(df_, "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(bm25Glob(dl)))
      .groupBy("tok")
      .agg(max(bm25ContribCol.cast("decimal(28,10)")).as("ub"))

  private[graft] def bm25From(tf: DataFrame, df_ : DataFrame,
      dl: DataFrame, cap: Option[Int]): DataFrame =
    bm25Serve(tf, cap.fold(tf)(m => cappedPostings(tf, dl, m)), df_, dl)

  /** EXACT BM25 top-5 via MaxScore-style upper-bound pruning (Turtle
    * & Flood's MaxScore family) — the per-QUERY answer to the
    * RECALL_r14 fixed-M finding: a static per-term cap decays as the
    * corpus grows, but upper-bound pruning is exact at ANY scale
    * because the bound adapts to the query. Same oracle as
    * [[bm25TopK]] — the output is the exact top-5 by construction:
    *
    *  1. per (query, term) upper bound: the max per-posting
    *     contribution over that term's matched postings (a ≤|Q|·3-row
    *     census — in a serving deployment this is a stored companion
    *     next to the impact caps);
    *  2. seed threshold θ: exact-score only the docs matching the
    *     query's RAREST term (min df — the smallest posting list) and
    *     take the 5th score; fewer than 5 seeds → θ = −∞;
    *  3. prune: a doc's score is ≤ the sum of its matched terms'
    *     bounds, so any doc with Σ UB(matched) < θ cannot enter the
    *     top-5 — only the survivors pay the DECIMAL-exact scoring
    *     pass (at real corpus scale the survivors are the handful of
    *     docs matching the query's rare terms well, not every doc
    *     sharing one stopword).
    *
    * Exactness argument: θ comes from a SUBSET of candidates, so the
    * true 5th-best ≥ θ; every true-top-5 doc d has score(d) ≥ θ and
    * Σ UB(matched(d)) ≥ score(d), so d always survives the filter;
    * double casts of the exact DECIMAL sums are monotone, so the θ
    * comparison cannot mis-exclude a tie. The matched frame is
    * checkpointed once and feeds the bound census, the seed pass and
    * the survivor pass — one tokenize, three bounded aggregates.
    */
  def bm25MaxScore(spark: SparkSession, dir: String): DataFrame = {
    val (tf, df_, dl) = bm25Parts(spark, dir)
    bm25MaxScoreFrom(tf, df_, dl, None)
  }

  /** The MaxScore tail over already-materialized index parts (the
    * [[bm25From]] discipline: one implementation, two sources).
    *
    * @param boundsSrc optional precomputed per-term upper bounds
    *   (tok, ub) to use INSTEAD of deriving them from the matched
    *   frame — [[termBounds]] over the persisted impact-capped
    *   companion qualifies exactly: the companion keeps each term's
    *   top-M postings BY IMPACT, and contribution = idf(term) · impact
    *   with idf constant within a term, so the companion's max
    *   contribution IS the full list's max. A bound source without the
    *   matched frame's self-exclusion (qid ≠ doc_id) only LOOSENS the
    *   bound — exactness is preserved, pruning just gets (negligibly)
    *   weaker. r15: the bounds arrive as a census, not as postings, so
    *   a store can materialize them ONCE at build/compaction and the
    *   serving plan carries no corpus-axis aggregate for the bound —
    *   the scaladoc's "stored companion" made literal.
    */
  private[graft] def bm25MaxScoreFrom(tf: DataFrame, df_ : DataFrame,
      dl: DataFrame, boundsSrc: Option[DataFrame]): DataFrame = {
    val glob = bm25Glob(dl)
    val qterms = bm25QTerms(tf, df_, glob)
    bm25MaxScoreRanked(tf, qterms, df_, dl, glob, boundsSrc, 5)
      .orderBy("qid", "rank")
  }

  /** FREE-TEXT MaxScore — the EXACT face of the retrieval facade
    * ([[bm25SearchText]] serves the capped approximation at the
    * store's recorded M; this serves the exact top-`k` at serving
    * cost, the per-query pruning adapting where the fixed cap
    * cannot). Same tokenizer, same qid = -1 no-self-exclusion
    * contract, zero rows for an all-unknown query.
    */
  private[graft] def bm25MaxScoreText(tf: DataFrame, df_ : DataFrame,
      dl: DataFrame, queryText: String, k: Int,
      boundsSrc: Option[DataFrame]): DataFrame = {
    val spark = tf.sparkSession
    import spark.implicits._
    val toks = queryText.toLowerCase.split(' ').toSeq
      .filter(_.nonEmpty).distinct
    val qterms = toks.map(t => (-1L, t)).toDF("qid", "tok")
    bm25MaxScoreRanked(tf, qterms, df_, dl, bm25Glob(dl), boundsSrc, k)
      .orderBy("rank")
  }

  /** The MaxScore core over an arbitrary (qid, tok) query frame:
    * matched census → per-term bounds → rarest-term seed θ →
    * survivor filter → exact scoring of survivors, emitting
    * (qid, rank, doc_id, score) unordered (callers order).
    */
  private def bm25MaxScoreRanked(tf: DataFrame, qterms: DataFrame,
      df_ : DataFrame, dl: DataFrame, glob: DataFrame,
      boundsSrc: Option[DataFrame], k: Int): DataFrame = {
    val (matched, survivors) =
      bm25MaxScoreCore(tf, qterms, df_, dl, glob, boundsSrc, k)
    matched.join(survivors, Seq("qid", "doc_id"), "left_semi")
      .groupBy("qid", "doc_id").agg(sum("c").as("s"))
      .groupBy("qid")
      .agg(graft.functions.TopKByScore
        .topk(col("s").cast("double"), col("doc_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("qid"), (col("p") + 1).cast("bigint").as("rank"),
        col("t.id").as("doc_id"),
        round(col("t.score"), 6).as("score"))
  }

  /** Pruning-effectiveness diagnostic: per query, how many matched
    * docs there were and how many survived the θ filter (= paid the
    * exact scoring pass). The MaxScorePruningSpec's teeth: the oracle
    * proves EXACTNESS, this proves the pruning actually PRUNES when
    * the corpus is skewed (on near-uniform tf every bound ≈ θ and the
    * filter keeps ~everything — the honest verify-corpus regime).
    */
  private[graft] def bm25MaxScorePruneStats(tf: DataFrame,
      df_ : DataFrame, dl: DataFrame,
      boundsSrc: Option[DataFrame]): DataFrame = {
    val glob = bm25Glob(dl)
    val qterms = bm25QTerms(tf, df_, glob)
    val (matched, survivors) =
      bm25MaxScoreCore(tf, qterms, df_, dl, glob, boundsSrc, 5)
    matched.select("qid", "doc_id").distinct()
      .groupBy("qid").agg(count(lit(1)).as("n_matched"))
      .join(survivors.groupBy("qid").agg(count(lit(1)).as("n_survivors")),
        Seq("qid"))
      .orderBy("qid")
  }

  /** Builds the (matched-with-contribution, survivor) frame pair the
    * ranked tail and the prune-stats diagnostic both read.
    */
  private def bm25MaxScoreCore(tf: DataFrame, qterms: DataFrame,
      df_ : DataFrame, dl: DataFrame, glob: DataFrame,
      boundsSrc: Option[DataFrame],
      k: Int): (DataFrame, DataFrame) = {
    val matched = tf.join(broadcast(qterms), "tok")
      .filter(col("doc_id") =!= col("qid"))
      .join(df_, "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(glob))
      .select(col("qid"), col("doc_id"), col("tok"),
        bm25ContribCol.cast("decimal(28,10)").as("c"))
      // lazy for the same reason as bm25Parts' tf: one shared
      // materialization, no standalone up-front job
      .localCheckpoint(false)
    val bounds = boundsSrc match {
      case None =>
        matched.groupBy("qid", "tok").agg(max("c").as("ub"))
      case Some(src) =>
        // (tok, ub) census expanded to (qid, tok) through the
        // broadcast query frame — a bounded lookup, no corpus joins
        src.join(broadcast(qterms), "tok")
          .select("qid", "tok", "ub")
    }
    val rarest = qterms.join(df_, "tok")
      .groupBy("qid")
      .agg(min(struct(col("df"), col("tok"))).as("m"))
      .select(col("qid"), col("m.tok").as("tok"))
    val seedDocs = matched
      .join(broadcast(rarest), Seq("qid", "tok"), "left_semi")
      .select("qid", "doc_id").distinct()
    val seedScores = matched
      .join(seedDocs, Seq("qid", "doc_id"), "left_semi")
      .groupBy("qid", "doc_id").agg(sum("c").as("s"))
    val theta = seedScores.groupBy("qid")
      .agg(graft.functions.TopKByScore
        .topk(col("s").cast("double"), col("doc_id"), k).as("top"))
      .select(col("qid"),
        when(size(col("top")) < k, lit(Double.NegativeInfinity))
          .otherwise(element_at(col("top"), k).getField("score"))
          .as("theta"))
    val survivors = matched.join(broadcast(bounds), Seq("qid", "tok"))
      .groupBy("qid", "doc_id").agg(sum("ub").as("ub_sum"))
      .join(broadcast(theta), Seq("qid"))
      .filter(col("ub_sum").cast("double") >= col("theta"))
      .select("qid", "doc_id")
    (matched, survivors)
  }

  /** The serving tail split from the cap: anchor queries derive from
    * `tfAnchors` (the FULL postings — the oracle's anchor definition)
    * while scoring enumerates `postings`, which may be an already-
    * MATERIALIZED impact-capped list (the stored index's companion
    * table) instead of a cap applied on read. Global stats (df, dl,
    * avgdl, N) always come from the full index — pruning changes
    * which documents are scored, never how.
    */
  private[graft] def bm25Serve(tfAnchors: DataFrame,
      postings: DataFrame, df_ : DataFrame, dl: DataFrame): DataFrame = {
    val glob = bm25Glob(dl)
    val qterms = bm25QTerms(tfAnchors, df_, glob)
    val scored = bm25ScoredFrom(postings, qterms, df_, dl, glob,
      Seq("qid", "doc_id"))
    // final ranking rides the bounded TopKByScore aggregate, NOT a
    // per-qid rank window: with a corpus-hot query term one qid
    // partition is corpus-sized — exactly the shape the aggregate's
    // k-row map-side partials exist to split. Ordering is (s DESC,
    // doc_id), identical to the oracle's row_number: the DECIMAL sum
    // casts to double losslessly for ordering purposes here (score
    // magnitudes are O(10) with >= 1e-10 separation, far above the
    // ~4e-16 double spacing), and the emitted score is the same
    // round(double, 6) either way.
    scored
      .groupBy("qid")
      .agg(graft.functions.TopKByScore
        .topk(col("s").cast("double"), col("doc_id"), 5).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("qid"), (col("p") + 1).cast("bigint").as("rank"),
        col("t.id").as("doc_id"),
        round(col("t.score"), 6).as("score"))
      .orderBy("qid", "rank")
  }

  /** FREE-TEXT BM25 over already-materialized index parts — the
    * scoring face of [[graft.sources.Retrieval]]: the query is an
    * arbitrary string, tokenized with the store's OWN tokenizer
    * (lowercase, split-on-space, empties dropped — parity with
    * [[graft.sources.TermIndexStore.tfOf]] is what makes facade
    * results comparable to the anchor-audited family), deduplicated
    * into a broadcast (qid = -1, tok) frame, and scored through the
    * shared [[bm25ScoredFrom]] chain (same Okapi contribution, same
    * DECIMAL-exact sum). qid = -1 so the anchor path's self-exclusion
    * can never fire — a free query has no corpus identity to exclude.
    * Ranking rides the bounded top-k aggregate. An all-unknown (or
    * empty) query returns zero rows, the inverted index's honest
    * answer.
    */
  private[graft] def bm25SearchText(postings: DataFrame,
      df_ : DataFrame, dl: DataFrame, queryText: String,
      k: Int): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val toks = queryText.toLowerCase.split(' ').toSeq
      .filter(_.nonEmpty).distinct
    val qterms = toks.map(t => (-1L, t)).toDF("qid", "tok")
    val glob = bm25Glob(dl)
    val scored = bm25ScoredFrom(postings, qterms, df_, dl, glob,
      Seq("qid", "doc_id"))
    scored
      .groupBy("qid")
      .agg(graft.functions.TopKByScore
        .topk(col("s").cast("double"), col("doc_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("qid"), (col("p") + 1).cast("bigint").as("rank"),
        col("t.id").as("doc_id"), round(col("t.score"), 6).as("score"))
      .orderBy("rank")
  }

  /** The anchor queries' term sets off the inline index parts —
    * exposed for the facade spec, which proves [[bm25SearchText]] on
    * an anchor's own terms reproduces the anchor-audited ranking.
    */
  private[graft] def bm25AnchorTerms(spark: SparkSession,
      dir: String): DataFrame = {
    val (tf, df_, dl) = bm25Parts(spark, dir)
    bm25QTerms(tf, df_, bm25Glob(dl))
  }

  /** BPE iteration 2 — the census AFTER applying the first merge,
    * proving the training loop (merge → re-census) is expressible as
    * a plan, not a driver loop: the winning pair from [[bpePairs]]
    * (weight DESC, pair tie-break) is merged into one symbol via
    * leftmost-greedy non-overlapping `replace` (exactly BPE's merge
    * order; a control sentinel stands in for the merged symbol — the
    * corpus alphabet is printable), and the pair census re-runs over
    * the SYMBOL stream, so pairs straddling the merged symbol (e.g.
    * `e+[th]`) now exist and pairs consumed by it lose their mass.
    * Same vocabulary-census-first discipline: both passes are
    * vocab-sized, the winning pair is a one-row broadcast.
    */
  def bpeMergeStep(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(
        expr("filter(split(lower(text), ' '), x -> x <> '')")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(length(col("tok")) >= 2)
    val occ1 = vocab
      .select(col("tok"), col("n"),
        explode(expr("sequence(1, length(tok) - 1)")).as("i"))
      .select(col("tok"), col("n"),
        expr("substring(tok, i, 2)").as("pair"))
      .groupBy("tok", "pair")
      .agg(first(col("n")).as("n"), count(lit(1)).as("occ"))
    val winner = occ1.groupBy("pair")
      .agg(sum(col("n") * col("occ")).as("w"))
      .orderBy(col("w").desc, col("pair")).limit(1)
      .select(col("pair").as("mp"))
    val merged = vocab.crossJoin(broadcast(winner))
      .select(col("n"), col("mp"),
        expr("replace(tok, mp, chr(1))").as("sym"))
      .filter(length(col("sym")) >= 2)
    val sub = (c: String) =>
      expr(s"""CASE WHEN $c = chr(1) THEN concat('[', mp, ']')
               ELSE $c END""")
    val occ2 = merged
      .select(col("sym"), col("n"), col("mp"),
        explode(expr("sequence(1, length(sym) - 1)")).as("i"))
      .select(col("sym"), col("n"),
        concat(sub("substring(sym, i, 1)"), lit("+"),
          sub("substring(sym, i + 1, 1)")).as("pair"))
      .groupBy("sym", "pair")
      .agg(first(col("n")).as("n"), count(lit(1)).as("occ"))
    val top = occ2.groupBy("pair")
      .agg(sum(col("n") * col("occ")).as("n_weighted"),
        count(lit(1)).as("n_types"))
      .orderBy(col("n_weighted").desc, col("pair"))
      .limit(20)
    val w = Window.orderBy(col("n_weighted").desc, col("pair"))
    top.withColumn("rank", row_number().over(w).cast("bigint"))
      .select("rank", "pair", "n_weighted", "n_types")
      .orderBy("rank")
  }

  /** BPE first-merge census: the 50 most frequent within-token
    * adjacent character pairs — iteration 0 of byte-pair-encoding
    * tokenizer training, and the standard "is this corpus's character
    * distribution sane" probe. The scale discipline IS the published
    * BPE trick: collapse the corpus to its (token, count) vocabulary
    * census FIRST, then expand character bigrams over the DISTINCT
    * vocabulary only — pair work is vocabulary-sized (sub-linear in
    * the corpus), never corpus-sized; occurrence weights multiply
    * through. The top-50 goes through orderBy+limit
    * (TakeOrderedAndProject: per-partition 50-row heaps, driver
    * merge), never a global rank window over the pair vocabulary.
    */
  def bpePairs(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(
        expr("filter(split(lower(text), ' '), x -> x <> '')")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(length(col("tok")) >= 2)
    // per (token, pair) occurrence census before the global roll-up:
    // n_types is then a plain count(*), no countDistinct Expand
    val occ = vocab
      .select(col("tok"), col("n"),
        explode(expr("sequence(1, length(tok) - 1)")).as("i"))
      .select(col("tok"), col("n"),
        expr("substring(tok, i, 2)").as("pair"))
      .groupBy("tok", "pair")
      .agg(first(col("n")).as("n"), count(lit(1)).as("occ"))
    val top = occ.groupBy("pair")
      .agg(sum(col("n") * col("occ")).as("n_weighted"),
        count(lit(1)).as("n_types"))
      .orderBy(col("n_weighted").desc, col("pair"))
      .limit(50)
    val w = Window.orderBy(col("n_weighted").desc, col("pair"))
    top.withColumn("rank", row_number().over(w).cast("bigint"))
      .select("rank", "pair", "n_weighted", "n_types")
      .orderBy("rank")
  }

  /** Eight BPE merges as ONE plan — the tokenizer training LOOP at
    * depth (where [[bpePairs]] is iteration 0 and [[bpeMergeStep]]
    * proves iteration 2 is expressible, this runs the merge →
    * re-census cycle eight times): each round censuses adjacent
    * symbol pairs over the (vocabulary-sized) symbol stream, picks
    * the winner by (weight DESC, pair) and merges it leftmost-greedy
    * non-overlapping into a fresh sentinel symbol chr(k). Per round
    * it emits the winner (sentinels expanded to the nested bracket
    * display, e.g. `[[th]e]`), its weighted occurrence census, and
    * the corpus symbol count AFTER the merge — the compression curve
    * a tokenizer build actually watches (total symbols strictly falls
    * every round: the winner has at least one merged occurrence).
    *
    * Scale discipline unchanged from the single step: every census is
    * vocabulary-sized, winners are one-row broadcasts, and each
    * round's symbol table is eagerly pinned ([[graft.ops.VectorOps
    * .kmeansTrain]]'s moment discipline) so the 8-deep chain plans
    * flat instead of exponentially re-deriving round k-1.
    */
  /** The BPE merge → re-census cycle run `rounds` times over the
    * corpus vocabulary — the shared training loop behind [[bpeTrain]]
    * (which reports the chain) and [[bpeMerges]] (which exposes the
    * learned merge table for the APPLY path). Per round: (post-merge
    * vocab, winner 1-row frame (p_k, w_k), post-merge symbol total).
    */
  private def bpeRounds(spark: SparkSession, dir: String,
      rounds: Int): Seq[(DataFrame, DataFrame, DataFrame)] = {
    val v0 = Tables.documents(spark, dir)
      .select(explode(
        expr("filter(split(lower(text), ' '), x -> x <> '')")).as("sym"))
      .groupBy("sym").agg(count(lit(1)).as("n"))
      .filter(length(col("sym")) >= 2)
      .localCheckpoint(false)
    (1 to rounds).scanLeft(
        (v0, Option.empty[DataFrame], Option.empty[DataFrame])) {
      case ((v, _, _), k) =>
        val occ = v
          .filter(length(col("sym")) >= 2)
          .select(col("sym"), col("n"),
            explode(expr("sequence(1, length(sym) - 1)")).as("i"))
          .select(col("sym"), col("n"),
            expr("substring(sym, i, 2)").as("pair"))
          .groupBy("sym", "pair")
          .agg(first(col("n")).as("n"), count(lit(1)).as("occ"))
        val winner = occ.groupBy("pair")
          .agg(sum(col("n") * col("occ")).as("w"))
          .orderBy(col("w").desc, col("pair")).limit(1)
          .select(col("pair").as(s"p$k"), col("w").as(s"w$k"))
          .localCheckpoint(false)
        val merged = v.crossJoin(broadcast(winner))
          .select(col("n"),
            expr(s"replace(sym, p$k, chr($k))").as("sym"))
          .localCheckpoint(false)
        val stats = merged
          .agg(sum(col("n") * length(col("sym")))
            .as(s"total_symbols$k"))
        (merged, Some(winner), Some(stats))
    }.drop(1).map { case (v, w, s) => (v, w.get, s.get) }
  }

  /** The number of merges every trained-BPE rung in this file runs. */
  private[graft] val BpeRounds = 8

  /** The TRAINED MERGE TABLE: one row, columns (p1, w1, …, p8, w8) —
    * round-k's winning pair (which may contain the sentinel symbols
    * chr(1..k-1) of earlier merges) and its weighted occurrence count.
    * This is the persistable model artifact the serve path consumes:
    * write it anywhere (it is one row), read it back, and
    * [[fertilityTrainedFrom]] tokenizes the corpus with it.
    */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeRounds(spark, dir, BpeRounds).map(_._2)
      .reduce((a, b) => a.crossJoin(broadcast(b)))

  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val rounds = BpeRounds
    val perRound = bpeRounds(spark, dir, rounds)
      .map { case (v, w, s) => (v, Some(w), Some(s)) }
    // one row carrying every winner + census: the display expansion
    // needs all earlier winners, so fold the 8 one-row frames together
    val folded = perRound
      .flatMap { case (_, w, s) => Seq(w.get, s.get) }
      .reduce((a, b) => a.crossJoin(broadcast(b)))
    // nested bracket display: expand sentinels in ascending round
    // order, so d_k's expansion only ever meets already-expanded text
    val withDisp = (1 to rounds).foldLeft(folded) { (df, k) =>
      val expanded = (1 until k).foldLeft(s"p$k") { (e, j) =>
        s"replace($e, chr($j), d$j)"
      }
      df.withColumn(s"d$k", expr(s"concat('[', $expanded, ']')"))
    }
    val stacked = (1 to rounds).map(k =>
      s"${k}L, d$k, w$k, total_symbols$k").mkString(", ")
    withDisp
      .select(expr(s"stack($rounds, $stacked) " +
        "as (round, merge_display, n_weighted, total_symbols)"))
      .orderBy("round")
  }

  /** The trained SUBWORD VOCABULARY census — what the tokenizer
    * actually ships after training: run the corpus vocabulary through
    * all eight merges, census the resulting symbol stream (single
    * characters plus the learned multi-character subwords), and rank
    * the top 50 by total corpus mass. Each learned subword displays
    * with the nested-bracket expansion (`[[th]e]`), so the table
    * reads as the merge tree it is. n_weighted = corpus occurrences
    * of the symbol (vocab count × within-token occurrences);
    * n_types = distinct vocabulary tokens containing it. All passes
    * are vocabulary-sized; the one-row winner frame broadcasts; the
    * top-50 is orderBy+limit (TakeOrderedAndProject), never a global
    * window.
    */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame = {
    val rounds = BpeRounds
    val perRound = bpeRounds(spark, dir, rounds)
    val vFinal = perRound.last._1
    val folded = perRound.map(_._2)
      .reduce((a, b) => a.crossJoin(broadcast(b)))
    val withDisp = (1 to rounds).foldLeft(folded) { (df, k) =>
      val expanded = (1 until k).foldLeft(s"p$k") { (e, j) =>
        s"replace($e, chr($j), d$j)"
      }
      df.withColumn(s"d$k", expr(s"concat('[', $expanded, ']')"))
    }
    val dispCase = (1 to rounds)
      .map(k => s"WHEN s = chr($k) THEN d$k").mkString(" ")
    val top = vFinal
      .select(col("n"),
        explode(expr("sequence(1, length(sym))")).as("i"),
        col("sym"))
      .select(col("sym"), col("n"), expr("substring(sym, i, 1)").as("s"))
      .groupBy("sym", "s")
      .agg(first(col("n")).as("n"), count(lit(1)).as("occ"))
      .groupBy("s")
      .agg(sum(col("n") * col("occ")).as("n_weighted"),
        count(lit(1)).as("n_types"))
      .orderBy(col("n_weighted").desc, col("s"))
      .limit(50)
    val w = Window.orderBy(col("n_weighted").desc, col("s"))
    top.withColumn("rank", row_number().over(w).cast("bigint"))
      .crossJoin(broadcast(withDisp))
      .select(col("rank"),
        expr(s"CASE $dispCase ELSE s END").as("symbol"),
        col("n_weighted"), col("n_types"))
      .orderBy("rank")
  }

  /** Train → SERVE closure for the BPE family (the kmeans
    * `emb_knn_trained` precedent on text): tokenize the corpus with
    * the LEARNED merge table and re-run the fertility census on REAL
    * subwords instead of [[fertility]]'s ⌈len/4⌉ proxy. Apply
    * semantics are exactly the training loop's own: for k in 1..8,
    * leftmost-greedy non-overlapping `replace` of round-k's winning
    * pair into the sentinel chr(k) — so a token's subword count is
    * the length of its fully-merged symbol string, and
    * `merged_occurrences` (len0 − len1, each merge removes exactly
    * one symbol) counts how often the learned vocabulary fired per
    * stratum. Scale discipline: the merges apply over the (source ×
    * lang × token) VOCABULARY census, never per corpus token — the
    * apply work is vocabulary-sized (sub-linear in the corpus), the
    * one-row merge table broadcasts, and only the ≤(sources×langs)
    * census shuffles.
    */
  def fertilityTrained(spark: SparkSession, dir: String): DataFrame =
    fertilityTrainedFrom(spark, dir, bpeMerges(spark, dir))

  /** The serve path off an already-TRAINED (possibly persisted and
    * re-loaded) merge table — one row, columns p1..p8.
    */
  def fertilityTrainedFrom(spark: SparkSession, dir: String,
      merges: DataFrame): DataFrame = {
    val census = Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        explode(expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .as("tok"))
      .groupBy("source", "lang", "tok")
      .agg(count(lit(1)).as("n"))
    val appliedExpr = (1 to BpeRounds).foldLeft("tok") { (e, k) =>
      s"replace($e, p$k, chr($k))"
    }
    census.crossJoin(broadcast(merges))
      .select(col("source"), col("lang"), col("n"),
        length(col("tok")).cast("bigint").as("len0"),
        expr(s"length($appliedExpr)").cast("bigint").as("len1"))
      .groupBy("source", "lang")
      .agg(sum(col("n")).as("ws_tokens"),
        sum(col("n") * col("len1")).as("subword_tokens"),
        sum(col("n") * (col("len0") - col("len1")))
          .as("merged_occurrences"))
      .select(col("source"), col("lang"), col("ws_tokens"),
        col("subword_tokens"), col("merged_occurrences"),
        round(col("subword_tokens").cast("double") / col("ws_tokens"), 4)
          .as("fertility"))
      .orderBy("source", "lang")
  }

  /** Shared training pass for the multinomial Naive-Bayes language
    * classifier — the pipeline's trainable quality/routing classifier
    * stage (fastText-style supervised filtering, e.g. CCNet's LM
    * filter or the GPT-3 WebText quality classifier), expressed as
    * pure counting plans: the "model" is a vocabulary-sized census,
    * training is one groupBy, and nothing corpus-sized ever
    * broadcasts or collects.
    *
    * Returns (tf, model, classes) where
    *  - `tf`      = (doc_id, lang, tok, tf) per-doc term frequencies;
    *  - `model`   = (tok, c, cnt) class-conditional token counts over
    *    the (tok x class) census — absent pairs count 0 and,
    *    because score terms are ln(cnt+1), contribute EXACTLY 0 to a
    *    sum, so the scoring join below can stay INNER on the census;
    *  - `classes` = (c, prior, lnzd) per-class constants: ln prior
    *    (decimal) and ln(class token total + |V|), the Laplace
    *    denominator, kept as a raw double — its per-doc product is
    *    rounded once to decimal at score time.
    * Every summed term is a double rounded ONCE to an exact decimal
    * before aggregation, so both engines add the same exact decimals
    * in any order.
    */
  private def nbParts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val dec = LpDec
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .as("tok"))
    val tf = toks.groupBy("doc_id", "lang", "tok")
      .agg(count(lit(1)).as("tf"))
    val model = toks.groupBy(col("tok"), col("lang").as("c"))
      .agg(count(lit(1)).as("cnt"))
    val vsize = toks.agg(countDistinct(col("tok")).as("v"),
      count(lit(1)).as("tot"))
    val classes = toks.groupBy(col("lang").as("c"))
      .agg(count(lit(1)).as("ctoks"),
        countDistinct(col("doc_id")).as("cdocs"))
      .crossJoin(broadcast(vsize))
      .crossJoin(broadcast(Tables.documents(spark, dir)
        .agg(count(lit(1)).as("ndocs"))))
      .select(col("c"),
        log(col("cdocs").cast("double") / col("ndocs")).cast(dec)
          .as("prior"),
        log((col("ctoks") + col("v")).cast("double")).as("lnzd"))
    (tf, model, classes)
  }

  /** Per-doc NB scores against every candidate class: the (doc x
    * class) spine (a 5-row broadcast against per-doc stats) left-joins
    * the class-conditional evidence sums, so a class sharing no token
    * with a doc still scores (its evidence is 0, the ln(0+1) limit).
    * score(d,c) = ln P(c) + sum_tok tf * ln(cnt+1) - n_toks * ln(Z_c),
    * the standard Laplace-smoothed multinomial NB decision function
    * with the per-class constants factored out of the join.
    */
  private def nbScores(spark: SparkSession, dir: String): DataFrame = {
    val (tf, model, classes) = nbParts(spark, dir)
    nbScoresOf(tf, model, classes)
  }

  /** The scoring join itself, over an arbitrary per-doc tf frame —
    * shared by the corpus-self scoring above and the funnel's
    * classifier gate (which scores the funnel's replica-bearing
    * universe against the SAME corpus-trained model).
    */
  private def nbScoresOf(tf: DataFrame, model: DataFrame,
      classes: DataFrame): DataFrame = {
    val dec = "decimal(28,10)"
    // vocabulary-keyed shuffle join (never a corpus broadcast): each
    // evidence term tf * ln(cnt+1) is a double product rounded once
    // to an exact decimal, so the sum is order-independent
    val evidence = tf.join(model, "tok")
      .groupBy("doc_id", "c")
      .agg(sum((log((col("cnt") + 1).cast("double")) * col("tf"))
        .cast(dec)).as("ev"))
    val perDoc = tf.groupBy("doc_id", "lang")
      .agg(sum(col("tf")).as("n_toks"))
    perDoc.crossJoin(broadcast(classes))
      .join(evidence, Seq("doc_id", "c"), "left")
      .select(col("doc_id"), col("lang"), col("c"),
        (col("prior") + coalesce(col("ev"), lit(0).cast(dec))
          - (col("n_toks") * col("lnzd")).cast(dec)).as("score"))
  }

  /** NB argmax predictions for an arbitrary (doc_id, lang, text)
    * frame against the CORPUS-trained model — the serve half the
    * survival funnel's classifier gate consumes (the CCNet
    * classifier-filter position: a model trained on the labeled
    * corpus routes an arbitrary candidate universe). A doc with zero
    * tokens has no prediction row — the caller's gate must treat
    * absence as a drop, exactly the inline operators' tokenized-docs
    * universe convention.
    */
  private[graft] def nbPredictionsFor(spark: SparkSession, dir: String,
      docs: DataFrame): DataFrame = {
    val (_, model, classes) = nbParts(spark, dir)
    val tf = docs
      .select(col("doc_id"), col("lang"),
        explode(expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .as("tok"))
      .groupBy("doc_id", "lang", "tok")
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("c"))
    nbScoresOf(tf, model, classes)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("lang"), col("c").as("predicted"))
  }

  /** Naive-Bayes language confusion matrix: train on the labeled
    * `lang` column, score every doc, argmax per doc (score DESC, class
    * ASC — a deterministic tie-break both engines share), and roll up
    * (true, predicted) counts. The supervised twin of the marker
    * heuristic [[langId]]: same output shape, learned evidence instead
    * of hand-picked markers. Scale: train is one vocab-sized census;
    * scoring is one vocabulary-keyed join plus a per-doc reduce —
    * linear, two shuffles, nothing corpus-sized on the driver.
    */
  def nbLang(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("c"))
    nbScores(spark, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .groupBy(col("lang"), col("c").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")
  }

  /** Per-class accuracy + decision margin for the NB classifier: the
    * calibration readout a filtering deployment actually tunes on —
    * how often the argmax matches the label, and how far the winner
    * sits above the runner-up (avg over the class's docs). Margins
    * near 0 mean the class is not separable at this feature set.
    */
  def nbMargin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("c"))
    val ranked = nbScores(spark, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
    ranked.groupBy("doc_id", "lang")
      .agg(max(when(col("rnk") === 1, col("c"))).as("predicted"),
        (max(when(col("rnk") === 1, col("score")))
          - max(when(col("rnk") === 2, col("score")))).as("margin"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("predicted") === col("lang"), 1L).otherwise(0L))
          .as("n_correct"),
        // sum the EXACT decimal margins, divide once — an avg over
        // doubles would add in partition order (the parity discipline
        // of every hash-compared mean in this repo)
        round(sum(col("margin")).cast("double") / count(lit(1)), 4)
          .as("avg_margin"))
      .select(col("lang"), col("n_docs"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n_docs"), 4)
          .as("accuracy"),
        col("avg_margin"))
      .orderBy("lang")
  }

  /** Top-5 NB features per class by smoothed log-odds
    * ln((cnt_c+1)/Z_c) - ln((rest+1)/Z_rest) — the interpretable
    * model dump (which tokens make the classifier call a doc `de`).
    * Ranked on the ROUNDED log-odds with a token tie-break so both
    * engines agree at equal evidence. Census-sized end to end: the
    * corpus is touched once for the counts, the odds math runs over
    * the (tok x class) census only.
    */
  def nbFeatures(spark: SparkSession, dir: String): DataFrame = {
    val (_, model, _) = nbParts(spark, dir)
    // (tok x class) spine so zero counts participate in the rest side
    val toktot = model.groupBy("tok").agg(sum(col("cnt")).as("tot"))
    val ctoks = model.groupBy("c").agg(sum(col("cnt")).as("ctoks"))
    val glob = model.agg(countDistinct(col("tok")).as("v"),
      sum(col("cnt")).as("alltoks"))
    val spine = toktot.crossJoin(broadcast(ctoks))
      .crossJoin(broadcast(glob))
    val odds = spine
      .join(model, Seq("tok", "c"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .select(col("c"), col("tok"), col("cnt"),
        round(
          log((col("cnt") + 1).cast("double")
            / (col("ctoks") + col("v")))
            - log((col("tot") - col("cnt") + 1).cast("double")
              / (col("alltoks") - col("ctoks") + col("v"))),
          6).as("log_odds"))
    val w = Window.partitionBy("c")
      .orderBy(col("log_odds").desc, col("tok"))
    odds.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 5)
      .select(col("c"), col("rank"), col("tok"), col("cnt"),
        col("log_odds"))
      .orderBy("c", "rank")
  }
}
