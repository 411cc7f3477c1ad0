package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Deduplication operators for training-data pipelines (SURVEY.md
  * §2.3): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * The test corpus has no natural duplicates, so every operator runs
  * over `corpus(docs)` = documents ∪ a re-keyed copy of every 5th
  * document — planted duplicates with known ids, the standard dedup
  * test harness. Results are therefore non-trivial and deterministic.
  *
  * 100 TB design notes:
  *  - exact dedup shuffles only a 128-bit digest per doc, never text;
  *  - MinHash signatures are 64 longs/doc; the LSH shuffle carries
  *    (band_hash, doc_id) pairs only — candidate verification joins
  *    text back for the tiny candidate set;
  *  - SimHash pairs meet via 16-bit band buckets; the Hamming check is
  *    codegen'd bit_count(a^b);
  *  - all signature computation is per-partition column work
  *    (explode → hash → min/sum aggregates with map-side combine).
  */
object DedupOps {

  private val P = 2147483647L // 2^31 - 1
  private val NumPerm = 64
  private val BandRows = 4   // 16 bands × 4 rows

  /** All unordered in-bucket pairs of a sorted array column `arr` as
    * struct(a, b), preserving array order (a strictly before b). The
    * bucket array is size-capped upstream, so the expansion is bounded
    * at cap²/2 pairs per bucket — never corpus-quadratic.
    */
  private[graft] def bucketPairs(arr: String): Column =
    explode(expr(
      s"""flatten(transform(sequence(1, size($arr) - 1),
            i -> transform(sequence(0, i - 1),
              j -> struct(element_at($arr, j + 1) AS a,
                          element_at($arr, i + 1) AS b))))"""))

  /** documents plus a re-keyed copy of every 5th doc (planted dups).
    * `private[graft]`: [[graft.sources.DocumentStore.dupGroupsFor]]
    * builds its bucketed store from the same corpus so the store twin
    * and the inline operator stay result-identical.
    */
  private[graft] def corpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select("doc_id", "text", "source", "lang")
    // r15 note: a §2.5 parallelism floor ([[Spread.floor]]) was tried
    // here and REVERTED on measurement — tokenize/md5 per-row work is
    // so small at bench scale that 32-way task-setup overhead swamped
    // it (doc_nb_margin 1.9×, doc_dup_clusters 1.3× SLOWER; 14.6 s of
    // task CPU where the 1-task stages paid ~1 s). The floor only pays
    // when per-partition work is heavy, which is the vector census
    // (spreadVecs), not the text pipelines.
    d.unionByName(
      d.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  /** Exact dedup: normalize → md5 → group on the digest. Emits the
    * duplicate groups (digest, group size, keeper id).
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
      .filter(col("n") > 1)
      .orderBy("h")

  /** Quality-aware dedup collapse — the keep-BEST policy a production
    * pipeline applies to near-dup CLUSTERS instead of keep-first
    * (practical curation keeps the longest/highest-quality member, so
    * a truncated or boilerplate-wrapped near-copy loses to the full
    * document): over the same connected components as
    * [[dupClusters]], each cluster's survivor maximizes (token count,
    * then smallest id). Per-source census: docs/kept/dropped, the
    * clusters this source WINS, and — the policy's actual effect —
    * how many wins differ from the keep-first (min-id) choice.
    *
    * Scale shape: the cluster labels come from the shared
    * exact-collapse + LSH label propagation (digests and ids shuffle,
    * never text); docs⋈labels and docs⋈winners ride the unique
    * doc_id / cluster keys (corpus-scale both sides — whitelisted);
    * both censuses are ≤|sources| and the winners census broadcasts.
    */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val docs = corpus(spark, dir)
      .withColumn("t", trim(col("text")))
      .select(col("doc_id"), col("source"),
        when(length(col("t")) === 0, lit(0L)).otherwise(
          (length(col("t")) - length(expr("replace(t, ' ', '')")) + 1)
            .cast("bigint")).as("n_tokens"))
    val labels = dupLabelsOf(corpus(spark, dir))
    // singletons (no dup edge) are their own cluster; the propagated
    // label is the cluster's MIN id, i.e. exactly the keep-first choice
    val clustered = docs
      .join(labels.select(col("id").as("doc_id"), col("lbl")),
        Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("lbl"), col("doc_id")))
    val winners = clustered.groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        min(struct((-col("n_tokens")).as("neg"), col("doc_id"),
          col("source"))).as("b"))
      .select(col("cluster"), col("n"), col("b.doc_id").as("best_id"),
        col("b.source").as("best_source"))
    val perDoc = clustered.join(winners.select("cluster", "best_id"),
        "cluster")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("doc_id") === col("best_id")).cast("long")).as("n_kept"))
    val perWin = winners.filter(col("n") > 1)
      .groupBy(col("best_source").as("source"))
      .agg(count(lit(1)).as("n_clusters_won"),
        sum((col("best_id") =!= col("cluster")).cast("long"))
          .as("n_policy_diff"))
    perDoc.join(broadcast(perWin), Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("n_docs") - col("n_kept")).as("n_dropped"),
        coalesce(col("n_clusters_won"), lit(0L)).as("n_clusters_won"),
        coalesce(col("n_policy_diff"), lit(0L)).as("n_policy_diff"))
      .orderBy("source")
  }

  /** Distinct word-3-gram shingle set per doc (single-shingle fallback
    * for short docs). Single-pass custom expression — see
    * [[graft.functions.WordNGrams]] for why HOFs are the wrong tool.
    */
  private def withShingles(df: DataFrame): DataFrame =
    df.withColumn("shset",
      graft.functions.TextExpressions.wordNGrams(col("text"), 3))

  /** MinHash + LSH near-dup pairs: shingle → 64-perm signature →
    * 16 LSH bands → bucket self-join → exact-Jaccard confirmation at
    * ≥ 0.7. Output: (doc1, doc2, jaccard).
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashPairs(spark, dir).orderBy("doc1", "doc2")

  /** The unordered confirmed near-dup pairs over the planted-dup
    * corpus — shared by the driver-checked query above and the
    * dup-cluster roll-up.
    */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    minhashPairsOf(corpus(spark, dir))

  /** MinHash-LSH near-dup pairs over any (doc_id, text) set.
    *
    * Tunables (defaults = the driver-checked configuration):
    *  - `jaccardMin`: confirmation threshold; raise band count (lower
    *    `bandRows`) when lowering it, or recall drops;
    *  - `maxBucket`: the skew cap — at larger corpora raise band
    *    WIDTH (via `bandRows`) rather than the cap, so buckets stay
    *    small instead of being dropped.
    */
  /** The (doc_id, band, bh) LSH bucket membership of a (doc_id, text)
    * set — the shared banding front half of [[minhashPairsOf]] and the
    * [[lshHealth]] audit.
    */
  /** Per-doc 64-perm MinHash signature: base shingle hash = top 28
    * bits of md5 (engine-portable — the DuckDB oracle computes the
    * identical value, already < P so the affine permutations
    * (a*base + b) % P never overflow a long), then one
    * typed-imperative aggregate builds the whole signature (map-side
    * partials, elementwise-min merge) — see MinHashSig. Shared by the
    * LSH bucket path and the band-tuning sweep.
    */
  private def minhashSignatures(source: DataFrame): DataFrame =
    withShingles(source).select("doc_id", "shset")
      .select(col("doc_id"), explode(col("shset")).as("sh"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(sh), 1, 7), 16, 10) as bigint)")
          .as("base"))
      .groupBy("doc_id")
      .agg(graft.functions.MinHashSig.minhashSig(col("base"), NumPerm)
        .as("sig"))

  /** (doc_id, band, bh) band keys off a signature frame for `r`
    * signature rows per band — the key is the r values joined as a
    * string (no second hash, so the DuckDB oracle reproduces it
    * verbatim).
    */
  private def bandKeys(sig: DataFrame, r: Int): DataFrame = {
    val bands = (0 until NumPerm / r).map { j =>
      struct(lit(j).as("band"),
        concat_ws(",",
          (0 until r).map(k => element_at(col("sig"), r * j + k + 1)): _*)
          .as("bh"))
    }
    sig
      .select(col("doc_id"), explode(array(bands: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  private[graft] def minhashBuckets(source: DataFrame,
      bandRows: Int = BandRows): DataFrame =
    bandKeys(minhashSignatures(source), bandRows)

  /** The distinct LSH candidate pairs (bucket-capped) — the banded
    * front half shared by [[minhashPairsOf]] and the
    * [[ngramBandedProbe]] recall probe: one pass over the buckets
    * (group → in-bucket pair expansion — avoids a self-join that
    * would run the signature pipeline twice), capped (skew guard): a
    * degenerate bucket of B docs would otherwise emit B² pairs.
    */
  private[graft] def minhashCandidates(source: DataFrame,
      maxBucket: Int = 1000, bandRows: Int = BandRows): DataFrame =
    minhashBuckets(source, bandRows).groupBy("band", "bh")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(bucketPairs("ids").as("p"))
      .select(col("p.a").as("doc1"), col("p.b").as("doc2"))
      .distinct()

  def minhashPairsOf(source: DataFrame, jaccardMin: Double = 0.7,
      maxBucket: Int = 1000, bandRows: Int = BandRows): DataFrame = {
    val cand = minhashCandidates(source, maxBucket, bandRows)
    // verification re-derives shingles for the tiny candidate set from
    // raw text instead of shuffling every doc's shingle array through
    // two joins — at 100 TB the full shset join would dominate the job.
    // (Measured alternative, r10: shingling each candidate doc ONCE
    // and joining the shset arrays back by id was 2× SLOWER at 10×
    // and a wash at 30× — a distinct word-3-gram set serializes ~3×
    // the raw text bytes, so the array exchange outweighs repeated
    // in-place shingling; this family's 30× growth is candidate-pair
    // count at a fixed banding operating point, not re-shingle work.)
    val texts = source.select("doc_id", "text")
    val candTexts = cand
      .join(texts.select(col("doc_id").as("doc1"), col("text").as("text1")), "doc1")
      .join(texts.select(col("doc_id").as("doc2"), col("text").as("text2")), "doc2")
    val s1 = shingleExpr("text1")
    val s2 = shingleExpr("text2")
    candTexts
      .withColumn("jaccard", round(
        size(array_intersect(s1, s2)).cast("double")
          / size(array_union(s1, s2)), 4))
      .filter(col("jaccard") >= jaccardMin)
      .select("doc1", "doc2", "jaccard")
  }

  /** Distinct word-3-gram shingles of a text column, as one expression. */
  private[graft] def shingleExpr(textCol: String): Column =
    graft.functions.TextExpressions.wordNGrams(col(textCol), 3)

  /** The dedup pipeline in production order: exact-dedup to one
    * representative per digest FIRST, then MinHash near-dup over the
    * representatives only. On a high-duplicate corpus this is the
    * difference between quadratic and linear LSH cost — identical
    * copies collapse before any bucket can expand pairs over them
    * (the 30× scale experiment's blowup is exactly what this avoids).
    * Output: near-dup representative pairs with their exact-group
    * sizes.
    */
  def dedupPipeline(spark: SparkSession, dir: String): DataFrame =
    dedupPipelineOf(corpus(spark, dir)).orderBy("doc1", "doc2")

  /** Normalized digest column shared by every exact-dedup consumer. */
  private def withDigest(source: DataFrame): DataFrame =
    source.select(col("doc_id"), col("text"),
      md5(lower(trim(col("text")))).as("h"))

  /** Keeper + group size per digest as a map-side-combined aggregate
    * over (h, doc_id) ONLY — text never enters the digest exchange,
    * and a hot duplicate group (boilerplate duplicated millions of
    * times in a real corpus) collapses in the partial aggregate
    * instead of landing on one reducer. This is deliberately NOT a
    * window over the digest: `row_number().over(partitionBy("h"))`
    * sorts every copy of a hot digest — full text in flight — on a
    * single reducer's window partition, the 100 TB straggler.
    */
  private[graft] def digestGroups(hashed: DataFrame): DataFrame =
    hashed.select("doc_id", "h").groupBy("h")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("group_n"))

  /** Representatives with text: the keeper set joined back to the
    * corpus on the UNIQUE doc_id — a uniform shuffle (no hot key is
    * possible on a unique column), fetching only the keepers' text.
    */
  private[graft] def dedupReps(source: DataFrame): DataFrame = {
    val hashed = withDigest(source)
    digestGroups(hashed).select("doc_id", "group_n")
      .join(hashed.select("doc_id", "text"), Seq("doc_id"))
      .select("doc_id", "text", "group_n")
  }

  /** The pipeline core over any (doc_id, text) set — see
    * [[dedupPipeline]] for the production-order rationale.
    */
  def dedupPipelineOf(source: DataFrame): DataFrame = {
    val repDocs = dedupReps(source)
    val sizes = repDocs.select(col("doc_id"), col("group_n"))
    // the confirmed pair set is LSH-cap bounded → broadcast it into the
    // size lookups rather than shuffling the full representative table
    broadcast(minhashPairsOf(repDocs.select("doc_id", "text")))
      .join(sizes.select(col("doc_id").as("doc1"), col("group_n").as("n1")),
        "doc1")
      .join(sizes.select(col("doc_id").as("doc2"), col("group_n").as("n2")),
        "doc2")
      .select("doc1", "doc2", "jaccard", "n1", "n2")
  }

  /** Recall audit of the LSH path as a driver-checked metric: every
    * planted duplicate pair (x, x+1e6) has Jaccard 1.0 and MUST be
    * recovered by the banded candidate generation — a recall drop
    * here means a band/bucket regression, caught by the oracle gate
    * rather than a human reading bench output.
    */
  def minhashRecall(spark: SparkSession, dir: String): DataFrame = {
    val expected = Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("doc1"),
        (col("doc_id") + 1000000L).as("doc2"))
    // LSH-cap-bounded pair set → broadcast; one left join + one
    // aggregate produce both totals without a second pass
    val found = minhashPairs(spark, dir)
      .select(col("doc1"), col("doc2"), lit(1L).as("hit"))
    expected
      .join(broadcast(found), Seq("doc1", "doc2"), "left")
      .agg(count(lit(1)).as("n_expected"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .select(col("n_expected"), col("n_found"),
        round(col("n_found") * 100.0 / col("n_expected"), 2)
          .as("recall_pct"))
  }

  /** Duplicate clusters: connected components over the dup-edge graph
    * (exact-dup star edges ∪ confirmed MinHash near-dup pairs), the
    * roll-up a dedup pipeline keeps one representative per cluster
    * from.
    *
    * Components via distributed min-label propagation — the GraphX/
    * Pregel shape on plain DataFrames: each round joins labels across
    * edges and takes the elementwise min; rounds = graph diameter
    * (tiny for dup clusters). `localCheckpoint` truncates the plan per
    * round so lineage doesn't grow with iterations; every round is a
    * distributed join+agg, the driver only checks the converged flag.
    */
  def dupClusters(spark: SparkSession, dir: String): DataFrame =
    dupClustersOf(corpus(spark, dir))

  /** Exact-dup star edges (keeper → member) via the digest aggregate +
    * an (h, doc_id)-only join back — no text in flight, and the hot-h
    * join partition is AQE-skew-splittable where the old
    * `min().over(Window.partitionBy("h"))` hot window partition was
    * not (a window partition cannot be split across tasks; a skewed
    * shuffle-join partition can).
    */
  private[graft] def dedupStarEdges(source: DataFrame): DataFrame = {
    val ids = withDigest(source).select("doc_id", "h")
    ids.join(digestGroups(ids).select(col("h"), col("doc_id").as("keeper")),
        "h")
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("keeper").as("src"), col("doc_id").as("dst"))
  }

  /** The cluster core over any (doc_id, text) set. */
  def dupClustersOf(source: DataFrame): DataFrame =
    dupLabelsOf(source)
      .groupBy("lbl")
      .agg(count(lit(1)).as("n_members"),
        min("id").as("min_doc"), max("id").as("max_doc"))
      .select(col("lbl").as("cluster"), col("n_members"),
        col("min_doc"), col("max_doc"))
      .orderBy("cluster")

  /** Converged per-doc cluster labels (id → min reachable id) over
    * the exact-star + near-dup edge graph — the table [[dupClustersOf]]
    * censuses and [[dedupKeepBest]] picks survivors from. Only
    * edge-connected docs appear; singletons are implicit.
    */
  private[graft] def dupLabelsOf(source: DataFrame): DataFrame =
    dupLabelsWith(source, None)

  /** [[dupLabelsOf]] with an optional extra edge set folded into the
    * graph BEFORE propagation — the hook [[containmentKeepBest]] uses
    * to hand the stage-3 containment work list to the same connected
    * components the exact/LSH stages feed. Extra edges must be
    * (src, dst) doc-id pairs over the same id space.
    */
  private[graft] def dupLabelsWith(source: DataFrame,
      extraEdges: Option[DataFrame]): DataFrame = {
    // exact-collapse FIRST (the dedupPipeline production order): the
    // digest aggregate yields both the star edges (member → keeper)
    // and the representative set; near-dup LSH then runs over
    // representatives only. On a high-duplicate corpus the LSH bucket
    // sizes stay small where the full-corpus variant grows them with
    // duplicate multiplicity — the connected components are IDENTICAL
    // (an exact-dup member reaches everything its keeper reaches), so
    // the oracle is unchanged.
    val star = dedupStarEdges(source)
    val near = minhashPairsOf(dedupReps(source).select("doc_id", "text"))
      .select(col("doc1").as("src"), col("doc2").as("dst"))
    val edges = extraEdges
      .foldLeft(star.unionByName(near))(_ unionByName _).distinct()
    GraphOps.propagateMinLabels(edges)
  }

  /** 60-bit SimHash per doc (token-hash bit votes), near-dup pairs by
    * Hamming ≤ 3 via 15-bit band buckets + codegen'd bit_count(xor).
    * Token hashes are the top 60 bits of md5, so the DuckDB oracle
    * reproduces every fingerprint bit for bit.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashOf(corpus(spark, dir))

  /** SimHash near-dup pairs over any (doc_id, text) set, with the
    * band buckets CAPPED at `maxBucket` members — the same skew guard
    * as [[minhashPairsOf]]. Without it a degenerate hot bucket (e.g.
    * near-empty docs that all collapse to fingerprint 0) emits B²
    * pairs, the 100 TB job killer. Oversized buckets are dropped
    * (policy: a bucket past the cap carries no near-dup signal, only
    * hash collapse). The 8-byte fingerprint travels WITH the doc id
    * into the bucket, so the Hamming check needs no join back and the
    * fingerprint pipeline runs exactly once — the old band self-join
    * evaluated it twice.
    */
  def simhashOf(source: DataFrame, maxBucket: Int = 1000): DataFrame = {
    val Bits = 60
    val BandBits = 15
    val tokens = source
      .withColumn("toks", expr("filter(split(lower(text), ' '), x -> x <> '')"))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)")
          .as("h"))
    // one typed-imperative aggregate folds all 60 bit votes per row —
    // same fingerprint as 60 sum-CASE columns (oracle unchanged), one
    // buffer walk instead of 60 aggregate expression evaluations
    val fp = tokens.groupBy("doc_id")
      .agg(graft.functions.SimHashVotes.simhashFp(col("h"), Bits)
        .as("fp"))
    val bands = fp.select(col("doc_id"), col("fp"),
      explode(array((0 until Bits / BandBits).map(j =>
        struct(lit(j).as("band"),
          shiftright(col("fp"), BandBits * j).bitwiseAND(0x7FFFL).as("bh"))): _*))
        .as("b"))
      .select(col("doc_id"), col("fp"), col("b.band").as("band"),
        col("b.bh").as("bh"))
    // sort_array over (doc_id, fp) structs orders by doc_id (unique),
    // so pair expansion yields doc1 < doc2 with both fingerprints in
    // hand — Hamming is computed inline, codegen'd bit_count(xor)
    bands.groupBy("band", "bh")
      .agg(sort_array(collect_set(struct(col("doc_id"), col("fp")))).as("ms"))
      .filter(size(col("ms")).between(2, maxBucket))
      .select(bucketPairs("ms").as("p"))
      .select(col("p.a.doc_id").as("doc1"), col("p.b.doc_id").as("doc2"),
        bit_count(col("p.a.fp").bitwiseXOR(col("p.b.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc1", "doc2")
  }

  /** Deterministic domain column — the SURVEY §3 derivation
    * discipline applied to the url field the synthetic corpus lacks:
    * every doc maps to `<source>-<bkt>.<tld>` where bkt is the BASE
    * id's 37-bucket (mod 1e6 first, so a planted duplicate shares its
    * original's domain — a site hosting the same content twice, the
    * realistic mirror case) and the tld follows the bucket. The
    * blocklist rule (bkt % 11 == 3, ~11% of docs) is likewise
    * deterministic — both engines derive the identical list, standing
    * in for the external domain blocklist a CCNet/Dolma pipeline
    * loads.
    */
  private def withDomain(df: DataFrame): DataFrame = df
    .withColumn("bkt", (col("doc_id") % 1000000L % 37L).cast("int"))
    .withColumn("domain", concat(col("source"), lit("-"),
      col("bkt").cast("string"),
      element_at(array(lit(".com"), lit(".org"), lit(".net")),
        (col("bkt") % 3 + 1).cast("int"))))
    .withColumn("blocked", col("bkt") % 11 === 3)

  /** Domain-level curation census — the stage-0 report a URL-curated
    * pipeline ships before any content pass: per derived domain, doc
    * volume, exact-digest uniques and the dup ratio (a domain serving
    * the same page under many ids is a crawl trap), plus the
    * blocklist flag the survival funnel's stage 0 gates on.
    *
    * 100 TB shape: two-level aggregate — (domain, digest) partials
    * collapse map-side, then the ≤|domains| census; only (domain,
    * digest) pairs ever shuffle, never text, and no countDistinct
    * Expand appears in the plan.
    */
  def domainCensus(spark: SparkSession, dir: String): DataFrame =
    withDomain(corpus(spark, dir))
      .select(col("domain"), col("blocked"),
        md5(lower(trim(col("text")))).as("h"))
      .groupBy("domain", "blocked", "h")
      .agg(count(lit(1)).as("nh"))
      .groupBy("domain", "blocked")
      .agg(sum("nh").as("n_docs"), count(lit(1)).as("n_unique"))
      .select(col("domain"), col("blocked"), col("n_docs"),
        col("n_unique"),
        round(col("n_docs").cast("double") / col("n_unique"), 4)
          .as("dup_ratio"))
      .orderBy("domain")

  /** Pipeline survival funnel — the headline data-funnel report of a
    * training-corpus build: how many documents per source survive
    * each cleaning stage, CUMULATIVELY — raw → domain blocklist
    * (stage 0, [[withDomain]]'s deterministic gate in the
    * CCNet/Dolma position: URL-level curation before any content
    * pass) → exact dedup (digest keeper, computed among stage-0
    * survivors) → near-dup dedup (LSH-confirmed pairs,
    * keep-lower-id) → quality gate (length/token/stopword) → eval
    * decontamination (shared 3-gram shingle with the held-out set).
    * Eval originals
    * (doc_id < 10) are excluded up front; their PLANTED copies stay
    * in — exact dedup cannot see them (the originals are gone) but
    * the decontamination stage catches the leaked text, which is
    * precisely the leak story this report exists to tell.
    *
    * 100 TB shape: stage flags are per-doc booleans folded in ONE
    * final per-source partial agg. The digest keeper join-back and
    * the contamination flag join-back ride UNIQUE keys (digest /
    * doc_id — uniform shuffles, whitelisted like doc_dedup_pipeline);
    * the near-dup drop set is LSH-cap bounded and broadcasts; eval
    * shingles broadcast by definition. No stage rescans text it
    * doesn't need.
    */
  def survivalFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelFlags(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_raw"),
        sum(col("surv0").cast("long")).as("n_domain"),
        sum(col("surv1").cast("long")).as("n_exact"),
        sum(col("surv2").cast("long")).as("n_near"),
        sum(col("surv3").cast("long")).as("n_quality"),
        sum(col("surv4").cast("long")).as("n_clean"),
        sum(col("surv5").cast("long")).as("n_lang"))
      .withColumn("retention",
        round(col("n_lang").cast("double") / col("n_raw"), 4))
      .orderBy("source")

  /** TOKEN-mass funnel — the same six gates reported in the unit a
    * training budget is actually written in: tokens, not documents.
    * A stage that drops few docs can still drop a large token mass
    * (near-dup clusters are long-doc-heavy; the quality gate kills
    * short docs with little mass), so a token budget planned off the
    * doc funnel misallocates — this is the table the mixture planner
    * reads next to [[graft.ops.TextOps.mixWeights]]. Same per-doc
    * flags frame as [[survivalFunnel]] (shared plan, one derivation),
    * aggregated over each doc's whitespace token count.
    */
  def funnelTokens(spark: SparkSession, dir: String): DataFrame =
    funnelFlags(spark, dir)
      .groupBy("source")
      .agg(sum(col("n_tokens")).as("t_raw"),
        sum(when(col("surv0"), col("n_tokens")).otherwise(0L))
          .as("t_domain"),
        sum(when(col("surv1"), col("n_tokens")).otherwise(0L))
          .as("t_exact"),
        sum(when(col("surv2"), col("n_tokens")).otherwise(0L))
          .as("t_near"),
        sum(when(col("surv3"), col("n_tokens")).otherwise(0L))
          .as("t_quality"),
        sum(when(col("surv4"), col("n_tokens")).otherwise(0L))
          .as("t_clean"),
        sum(when(col("surv5"), col("n_tokens")).otherwise(0L))
          .as("t_lang"))
      .withColumn("token_retention",
        round(col("t_lang").cast("double") / col("t_raw"), 4))
      .orderBy("source")

  /** The shared per-doc survival-flags frame behind both funnels:
    * (doc_id, source, n_tokens, surv0..surv5) with every gate's
    * cumulative verdict.
    */
  private def funnelFlags(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val stage0 = withDomain(corpus(spark, dir).filter(col("doc_id") >= 10))
      .select("doc_id", "source", "lang", "text", "blocked")
    // stage 0 — URL/domain curation BEFORE any content pass (the
    // CCNet/Dolma production order): the deterministic domain
    // blocklist gate. Blocked docs never reach the digest, LSH or
    // quality stages, so the keeper set is computed among survivors
    // only — exactly what a pipeline that gates at the crawl frontier
    // produces.
    val s0 = stage0.withColumn("surv0", !col("blocked"))
    val hashed = s0.withColumn("h", md5(lower(trim(col("text")))))
    val keepers = hashed.filter(col("surv0")).select("doc_id", "h")
      .groupBy("h").agg(min("doc_id").as("keeper"))
    val s1 = hashed.join(keepers, Seq("h"), "left")
      .withColumn("surv1", col("surv0")
        && coalesce(col("doc_id") === col("keeper"), lit(false)))
    val reps = s1.filter(col("surv1")).select("doc_id", "text")
    val nearDrop = minhashPairsOf(reps)
      .select(col("doc2").as("doc_id")).distinct()
      .withColumn("near_dup", lit(1))
    val evalSh = withShingles(docs.filter(col("doc_id") < 10))
      .select(explode(col("shset")).as("sh")).distinct()
    val contaminated = withShingles(stage0.select("doc_id", "text"))
      .select(col("doc_id"), explode(col("shset")).as("sh"))
      .join(broadcast(evalSh), "sh")
      .select("doc_id").distinct().withColumn("contam", lit(1))
    // stage 5 — the TRAINED classifier gate (CCNet's classifier-filter
    // position): the corpus-trained multinomial NB routes every funnel
    // doc, and only docs whose argmax class agrees with their label
    // survive — the funnel stage that actually CONSUMES doc_nb_lang's
    // model instead of merely auditing it. A zero-token doc has no
    // prediction row and drops (the tokenized-docs universe rule).
    val nbOk = graft.ops.TextOps
      .nbPredictionsFor(spark, dir, stage0.select("doc_id", "lang", "text"))
      .select(col("doc_id"),
        (col("predicted") === col("lang")).as("lang_ok"))
    s1
      .withColumn("n_tokens",
        expr("size(filter(split(lower(text), ' '), x -> x <> ''))")
          .cast("bigint"))
      .withColumn("stop_n",
        expr("size(filter(split(lower(text), ' '), " +
          "x -> x = 'the' or x = 'a'))").cast("bigint"))
      .withColumn("quality",
        length(col("text")) >= 100 && col("n_tokens") >= 20 &&
          !(col("stop_n") * 2 > col("n_tokens")))
      .join(broadcast(nearDrop), Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .join(nbOk, Seq("doc_id"), "left")
      .withColumn("surv2", col("surv1") && col("near_dup").isNull)
      .withColumn("surv3", col("surv2") && col("quality"))
      .withColumn("surv4", col("surv3") && col("contam").isNull)
      .withColumn("surv5", col("surv4")
        && coalesce(col("lang_ok"), lit(false)))
  }

  /** Export-ready curated corpus — the text funnel's terminal view,
    * closing the loop the embedding side already closed
    * ([[graft.ops.VectorOps.prunedCorpus]] ships the pruning
    * manifest's survivors): one row per funnel document carrying its
    * final keep verdict (stage-5 survival, exactly
    * [[survivalFunnel]]'s `n_lang` universe), its token mass, and its
    * source's sampling weight from the mixture plan
    * ([[graft.ops.TextOps.mixWeights]]) — everything
    * [[graft.sources.TrainingExport.exportCorpus]] needs to lay the
    * curated corpus out for a trainer, and everything an auditor
    * needs to tie the export back to the funnel row-for-row
    * (FunnelExportSpec does exactly that). The weight join is a
    * broadcast of the ≤|sources| mixture census; no stage is added to
    * the funnel plan itself.
    */
  def funnelCorpus(spark: SparkSession, dir: String): DataFrame =
    funnelFlags(spark, dir)
      .join(broadcast(graft.ops.TextOps.mixWeights(spark, dir)
        .select(col("source").as("src"), col("sampling_weight"))),
        col("source") === col("src"))
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        col("n_tokens"), col("surv5").as("keep"),
        col("sampling_weight"))

  /** Benchmark decontamination — the eval-set leakage scan every LLM
    * training corpus runs before release: which training docs share
    * any word-3-gram shingle with the held-out eval set (doc_id < 10
    * here), rolled up per source with hit volumes.
    *
    * 100 TB shape: the eval shingle set is tiny by definition and
    * BROADCAST; the training side explodes its shingles once,
    * hash-joins against the broadcast set (map-side, no shuffle of
    * text), and only the per-doc hit counts aggregate. The corpus is
    * never self-joined and never shuffled whole.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text", "source")
    val evalSet = docs.filter(col("doc_id") < 10)
    val train = docs.filter(col("doc_id") >= 10)
    val evalSh = withShingles(evalSet)
      .select(explode(col("shset")).as("sh")).distinct()
    val hits = withShingles(train)
      .select(col("doc_id"), col("source"), explode(col("shset")).as("sh"))
      .join(broadcast(evalSh), "sh")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_hits"))
    train.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(broadcast(hits.groupBy("source")
        .agg(count(lit(1)).as("n_contaminated"),
          sum("n_hits").as("sum_hits"))),
        Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        coalesce(col("sum_hits"), lit(0L)).as("sum_hits"))
      .orderBy("source")
  }

  /** Base-hash collision audit — the "is 28 bits enough" birthday
    * check under the MinHash machinery: every signature in
    * [[minhashSignatures]] starts from a 28-bit md5 prefix per
    * shingle, and colliding bases make distinct shingles
    * indistinguishable to every permutation at once (a silent recall
    * ceiling no band setting can recover). Reports the distinct
    * shingle count, distinct base count, colliding bases and the
    * observed collision share. One distinct pass + one map-combined
    * aggregate on the base key — no Expand, nothing text-valued past
    * the first exchange.
    */
  def hashCollisionAudit(spark: SparkSession, dir: String): DataFrame =
    withShingles(corpus(spark, dir))
      .select(explode(col("shset")).as("sh")).distinct()
      .select(expr(
        "cast(conv(substring(md5(sh), 1, 7), 16, 10) as bigint)")
        .as("base"))
      .groupBy("base")
      .agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("n_shingles"),
        count(lit(1)).as("n_bases"),
        sum(when(col("cnt") >= 2, 1L).otherwise(0L))
          .as("n_colliding_bases"),
        max(col("cnt")).as("max_per_base"))
      .select(col("n_shingles"), col("n_bases"),
        col("n_colliding_bases"), col("max_per_base"),
        round((col("n_shingles") - col("n_bases")) * 100.0
          / col("n_shingles"), 6).as("collision_pct"))

  /** LSH band-tuning sweep — the operating-point table a dedup
    * deployment reads before fixing (bands × rows): for each banding
    * of the SAME 64-perm signature (8×8 strict, 16×4 production, 32×2
    * loose), the S-curve threshold (1/b)^(1/r), the realized bucket
    * census (buckets, colliding buckets, max bucket), the implied
    * candidate-pair load Σ s(s−1)/2 — the cost axis — and the planted
    * -pair recall — the quality axis. The text twin of
    * [[graft.ops.VectorOps.nprobeCurve]]: one signature pass feeds
    * every configuration.
    *
    * Scale shape: signatures compute once (map-combined min
    * aggregate); the three band expansions are constant factors; the
    * bucket census is map-combined on (cfg, band, key); pair load is
    * integer arithmetic on bucket SIZES (no pair materialization —
    * the sweep costs counts, not joins); the recall probe joins only
    * the planted slice (labeled pairs), broadcast.
    */
  def minhashBandTune(spark: SparkSession, dir: String): DataFrame = {
    val src = corpus(spark, dir)
    val sig = minhashSignatures(src)
    val bandRows = Seq(8, 4, 2).map { r =>
      bandKeys(sig, r).withColumn("rcfg", lit(r.toLong))
    }.reduce(_ unionByName _)
    val load = bandRows.groupBy("rcfg", "band", "bh")
      .agg(count(lit(1)).as("n"))
      .groupBy("rcfg")
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_colliding"),
        max(col("n")).as("max_bucket"),
        sum(expr("n * (n - 1) div 2")).as("cand_pairs"))
    val left = bandRows
      .filter(col("doc_id") % 5 === 0 && col("doc_id") < 1000000L)
    val right = bandRows.filter(col("doc_id") >= 1000000L)
      .select(col("doc_id").as("doc2"), col("rcfg"), col("band"),
        col("bh"))
    val matched = left.join(broadcast(right), Seq("rcfg", "band", "bh"))
      .filter(col("doc2") === col("doc_id") + 1000000L)
      .select("rcfg", "doc_id").distinct()
      .groupBy("rcfg").agg(count(lit(1)).as("n_found"))
    val tot = src.filter(col("doc_id") % 5 === 0
        && col("doc_id") < 1000000L)
      .agg(count(lit(1)).as("n_planted"))
    load.join(broadcast(matched), Seq("rcfg"), "left")
      .crossJoin(broadcast(tot))
      .select(col("rcfg").as("rows_per_band"),
        (lit(NumPerm.toLong) / col("rcfg")).cast("bigint").as("n_bands"),
        round(exp(log(col("rcfg") / lit(NumPerm.toDouble)) / col("rcfg")),
          6).as("threshold"),
        col("n_buckets"), col("n_colliding"), col("max_bucket"),
        col("cand_pairs"),
        round(coalesce(col("n_found"), lit(0L)) * 100.0
          / col("n_planted"), 2).as("recall_pct"))
      .orderBy("rows_per_band")
  }

  /** Token-inflation census (the headline number of Lee et al. 2022's
    * dedup case: how many times over the corpus pays for its
    * duplicated text): per source, raw vs digest-unique doc and token
    * counts and the inflation factor raw_tokens/unique_tokens — the
    * multiplier a training run wastes on repeats if it skips dedup.
    *
    * One map-combined exchange on (source, digest) — token counts
    * ride the digest rows (identical text ⇒ identical count), so the
    * corpus text never shuffles and a hot duplicate group collapses
    * in the partial aggregate; the per-source roll-up is S keys.
    */
  def dedupInflation(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .select(col("source"), md5(lower(trim(col("text")))).as("h"),
        expr("size(filter(split(lower(text), ' '), x -> x <> ''))")
          .cast("bigint").as("toks"))
      .groupBy("source", "h")
      .agg(count(lit(1)).as("cnt"), max("toks").as("toks"))
      .groupBy("source")
      .agg(sum(col("cnt")).as("n_docs"),
        count(lit(1)).as("n_unique"),
        sum(col("cnt") * col("toks")).as("tokens_raw"),
        sum(col("toks")).as("tokens_unique"))
      .select(col("source"), col("n_docs"), col("n_unique"),
        col("tokens_raw"), col("tokens_unique"),
        round(col("tokens_raw").cast("double") / col("tokens_unique"), 4)
          .as("inflation"))
      .orderBy("source")

  /** Eval-set n-gram coverage — the flip side of [[decontaminate]]:
    * instead of flagging TRAIN docs that leak eval shingles, measure
    * per EVAL doc how much of it the training corpus already contains
    * (a benchmark whose shingles are fully covered can be memorized,
    * not solved). Output: per eval doc, its distinct shingle count,
    * how many appear anywhere in the training split, and the
    * coverage share.
    *
    * 100 TB shape: the eval shingle set is tiny and broadcasts BOTH
    * ways — the corpus-side scan semi-joins against it (never the
    * reverse), the surviving covered set is ≤ eval-sized, and the
    * final per-doc roll-up touches only eval rows. One corpus scan,
    * nothing corpus-proportional shuffles.
    */
  def ngramCoverage(spark: SparkSession, dir: String): DataFrame = {
    val docs = corpus(spark, dir).select("doc_id", "text")
    val evalSh = withShingles(docs.filter(col("doc_id") < 10))
      .select(col("doc_id"), explode(col("shset")).as("sh"))
    val evalDistinct = evalSh.select("sh").distinct()
    val covered = withShingles(docs.filter(col("doc_id") >= 10))
      .select(explode(col("shset")).as("sh"))
      .join(broadcast(evalDistinct), "sh")
      .distinct()
      .withColumn("cov", lit(1L))
    evalSh.join(broadcast(covered), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("cov"), lit(0L))).as("n_covered"))
      .select(col("doc_id"), col("n_shingles"), col("n_covered"),
        round(col("n_covered") * 100.0 / col("n_shingles"), 4)
          .as("coverage_pct"))
      .orderBy("doc_id")
  }

  /** Exact word-3-gram Jaccard over blocked candidate pairs (same
    * source+lang block), top-100 most similar.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardOf(corpus(spark, dir))

  /** The (source, lang, length-band) blocking key shared by
    * [[ngramJaccardOf]] and [[ngramBlockCensus]]: candidates must be
    * near-equal length to reach high Jaccard, so the band predicate
    * prunes the quadratic pair space without losing top-k.
    */
  private def ngramBlocked(source: DataFrame): DataFrame =
    source.withColumn("lenband", (length(col("text")) / 64).cast("int"))

  /** One row per block key with its size — the tiny census both the
    * size guard's semi-join and the dropped-block report read.
    */
  private def ngramBlockSizes(keyed: DataFrame): DataFrame =
    keyed.groupBy("source", "lang", "lenband")
      .agg(count(lit(1)).as("bn"))

  /** Dropped-block census for [[ngramJaccardOf]]'s size guard — the
    * "no silent caps" companion (the [[lshHealth]] discipline applied
    * to the exact baseline): one row reporting how many blocks the
    * guard removed, the docs they carried, the largest one, and the
    * quadratic pair load the drop avoided. A top-100 Jaccard list
    * that excluded the densest blocks must never read as complete —
    * a run checks this census first.
    */
  def ngramBlockCensus(source: DataFrame,
      maxBlock: Int = 10000): DataFrame = {
    val dropped = col("bn") > maxBlock
    ngramBlockSizes(ngramBlocked(source))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(dropped, 1L).otherwise(0L)).as("n_dropped_blocks"),
        sum(when(dropped, col("bn")).otherwise(0L)).as("n_dropped_docs"),
        coalesce(max(when(dropped, col("bn"))), lit(0L))
          .as("largest_dropped"),
        // `div`, not `/`: Spark's `/` on bigints returns DOUBLE
        sum(when(dropped, expr("bn * (bn - 1) div 2")).otherwise(0L))
          .as("pairs_avoided"))
  }

  /** Driver-checked census entry: the guard exercised for real at
    * test scale (maxBlock 5 — the natural blocks run up to ~8 docs),
    * so the report path that matters at 100 TB is the one the oracle
    * hashes, not a degenerate all-zeros row.
    */
  def ngramJaccardCensus(spark: SparkSession, dir: String): DataFrame =
    ngramBlockCensus(corpus(spark, dir), maxBlock = 5)

  /** The exact blocked-Jaccard core with a per-block size guard:
    * block sizes grow linearly with the corpus, so in-block pairs grow
    * quadratically — acceptable as a correctness baseline (the scale
    * path IS [[minhashPairsOf]]), but without a cap an accidental run
    * at full scale detonates. Blocks past `maxBlock` docs are dropped
    * via a tiny block-census semi-join (one row per block key), so the
    * worst case is bounded at maxBlock²/2 pairs per block — and the
    * drop is REPORTED, not silent: [[ngramBlockCensus]] publishes the
    * dropped-block count/size census for the same key space.
    */
  def ngramJaccardOf(source: DataFrame, maxBlock: Int = 10000): DataFrame = {
    val keyed = ngramBlocked(source)
    val okBlocks = ngramBlockSizes(keyed)
      .filter(col("bn") <= maxBlock)
      .select("source", "lang", "lenband")
    // guard BEFORE shingling: dropped blocks never pay the n-gram cost
    val docs = withShingles(
      keyed.join(broadcast(okBlocks),
        Seq("source", "lang", "lenband"), "left_semi"))
      .select(col("doc_id"), col("source"), col("lang"), col("lenband"),
        col("shset"))
    docs.as("x").join(docs.as("y"),
        col("x.source") === col("y.source") && col("x.lang") === col("y.lang")
          && col("x.lenband") === col("y.lenband")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"),
        round(size(array_intersect(col("x.shset"), col("y.shset")))
          .cast("double")
          / size(array_union(col("x.shset"), col("y.shset"))), 4)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc1"), col("doc2"))
      .limit(100)
  }

  /** The banded RANKER's recorded operating point — (b, r, cap) =
    * (8 bands, 8 rows/band, bucket cap 1000), picked FROM the
    * measured [[minhashBandTune]] curve on the r14 perturbed 10×/30×
    * replicas (the `_graft_m` discipline: the constant lives where
    * the repo's own audit says, not where a default happened to be):
    *
    *  - candidate load at 30×: r=4 carries 31.13M candidate pairs,
    *    r=8 carries 9.39M — 3.3× less verification work at the scale
    *    where this family's growth was the repo's steepest (r13's
    *    4.2× on 3× data was in-family d² pair growth at r=4);
    *  - max bucket at 30×: 354 (r=8) vs 441 (r=4), both far under
    *    the 1000 cap — the cap is a skew BACKSTOP at the measured
    *    scale, not an active drop (zero dropped buckets);
    *  - recall: the tune's planted-pair recall reads 100.0 at every
    *    r (exact copies have identical signatures — they collide
    *    under any banding), and jaccard-1.0 pairs are banding-
    *    invariant generally, so the ranked list's head cannot move;
    *    the top-100 agreement audit (RECALL_r14) measures the tail:
    *    r=8's S-curve threshold 0.77 vs r=4's 0.50 only reorders
    *    below-threshold tail pairs the 0.7-dedup path never acts on.
    *
    * The ≥0.7 CONFIRM path ([[minhashPairsOf]]'s default) stays at
    * r=4: its operating point is recall at jaccard 0.7, where the
    * 0.77-threshold S-curve genuinely loses pairs — load is bounded
    * there by the confirm threshold instead.
    */
  private[graft] val RankerBandRows = 8

  /** Scalable banded twin of [[ngramJaccard]] — the probe path
    * beyond thresholded LSH dedup: the SAME exact word-3-gram Jaccard
    * verification, but over LSH candidate pairs instead of the
    * blocked quadratic, ranked top-100. The blocked-exact baseline is
    * size-guarded at scale (its densest blocks drop, reported by
    * [[ngramBlockCensus]]); this twin's pair load is bucket-cap
    * bounded regardless of block shape — candidate generation linear
    * in the corpus, verification linear in candidates — so it IS the
    * "most similar pairs" report that still runs at 100 TB. The
    * top-100 cut compiles to a distributed TakeOrdered, never a
    * global sort. Runs at the RANKER's recorded operating point
    * ([[RankerBandRows]] — the measured curve's answer, see there).
    */
  def ngramJaccardBanded(spark: SparkSession, dir: String): DataFrame =
    minhashPairsOf(corpus(spark, dir), jaccardMin = 0.0,
        bandRows = RankerBandRows)
      .orderBy(col("jaccard").desc, col("doc1"), col("doc2"))
      .limit(100)

  /** Banded-vs-exact probe: of the exact blocked top-100 (the
    * [[ngramJaccard]] report), how many pairs the LSH candidate stage
    * recovers — split at the 0.7 operating point the 16×4 bands are
    * tuned for. High-band recall must hold ≈100% (those are the pairs
    * the dedup path acts on); low-band recall is EXPECTED to decay
    * with the S-curve — the probe quantifies the cliff instead of
    * leaving it to folklore.
    *
    * BOTH sides run over a deterministic 1-in-`auditMod` md5 corpus
    * sample — the recall-audit discipline the IVF audits use: the
    * exact side's quadratic block load shrinks auditMod² (the probe's
    * ground truth would otherwise inherit [[ngramJaccardOf]]'s full
    * blocked-pair cost, the dominant term at corpus scale), while the
    * recall estimate stays unbiased — banding treats in-sample and
    * out-of-sample docs identically. The exact top-100 is ≤100 rows →
    * broadcast; the candidate set is bucket-cap bounded and
    * semi-joined down to ≤100 rows before the final left join, so
    * nothing corpus-proportional shuffles past candidate generation.
    */
  def ngramBandedProbe(spark: SparkSession, dir: String,
      auditMod: Int = 4): DataFrame = {
    val c = corpus(spark, dir).filter(
      expr("""cast(conv(substring(md5(cast(doc_id as string)), 1, 7),
        16, 10) as bigint)""") % auditMod === 0)
    val exact = ngramJaccardOf(c)
    val hits = minhashCandidates(c)
      .join(broadcast(exact.select("doc1", "doc2")),
        Seq("doc1", "doc2"), "left_semi")
      .withColumn("hit", lit(1L))
    exact.join(broadcast(hits), Seq("doc1", "doc2"), "left")
      .groupBy((col("jaccard") >= 0.7).cast("long").as("high_band"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_recovered"),
        round(sum(coalesce(col("hit"), lit(0L))) * 100.0
          / count(lit(1)), 2).as("recall_pct"))
      .orderBy("high_band")
  }

  /** The containment corpus: the planted-dup corpus plus a TRUNCATED
    * copy (first half of the tokens, ≥4) of every 7th document under
    * ids +2e6 — the quote-and-expand / truncation case real pipelines
    * hit: the fragment's shingle set is a strict SUBSET of its
    * original's, so containment is exactly 1.0 while Jaccard sits
    * near 0.5 — below every near-dup threshold, structurally
    * invisible to MinHash-over-Jaccard banding.
    */
  private[graft] def containmentCorpus(spark: SparkSession,
      dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select("doc_id", "text", "source", "lang")
    val frag = d.filter(col("doc_id") % 7 === 0)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("text", concat_ws(" ", expr(
        "slice(toks, 1, int(greatest(4L, size(toks) div 2)))")))
      .drop("toks")
      .withColumn("doc_id", col("doc_id") + 2000000L)
    corpus(spark, dir).unionByName(frag)
  }

  /** Hot shingles dropped by [[containmentPairs]]' inverted-index
    * candidate stage (the boilerplate "stop-shingle" discipline). */
  private val ContainMaxDocs = 64

  /** Candidate gate: a pair must share at least this many non-hot
    * shingles before its text is ever touched. A template-heavy
    * corpus saturates the shingle space (the sf0.1 census: 27k
    * distinct shingles over 5.7k reps — average bucket ~22 docs), so
    * single-shingle coincidences alone produce ~1.5M candidate rows;
    * a true containment-≥0.8 pair whose smaller side has ≥5 shingles
    * necessarily shares ≥4, so the gate only drops pairs below the
    * operating floor (measured: 25.3 s → 3.6 s at sf0.1, identical
    * top-100).
    */
  private val MinSharedShingles = 4

  /** Exact-dedup representatives of the containment corpus — the
    * [[dedupPipelineOf]] production order applied here too: identical
    * copies collapse to their min-id keeper BEFORE the inverted index,
    * so a d-fold duplicated corpus (the 30× stress replica is ~97%
    * exact copies) never pays d² in-bucket pairs for content the
    * exact pass already handles; what reaches the containment stage
    * is exactly the residue only containment can catch.
    */
  private def containmentReps(spark: SparkSession,
      dir: String): DataFrame =
    dedupReps(containmentCorpus(spark, dir)).select("doc_id", "text")

  /** Shingle → sorted distinct doc list, the inverted index both
    * containment queries read: one row per distinct shingle with the
    * docs that carry it.
    */
  private def containmentIndex(src: DataFrame): DataFrame =
    withShingles(src)
      .select(col("doc_id"), explode(col("shset")).as("sh"))
      .groupBy("sh")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))

  /** Asymmetric-containment near-dup detection — the duplicates
    * Jaccard-threshold dedup structurally misses: a document quoted,
    * truncated or wrapped inside a larger one has containment
    * |A∩B|/min(|A|,|B|) ≈ 1 but Jaccard |A∩B|/|A∪B| ≈ |A|/|B|, far
    * below any LSH operating point (MinHash estimates Jaccard, so no
    * band setting recovers these pairs — a different candidate
    * generator is required, not a tuning change). Runs in production
    * order over [[containmentReps]] — exact copies collapse first, so
    * the pair stage sees only the residue exact dedup can't catch.
    * Candidates come
    * from a shingle INVERTED INDEX: docs pair up through shared
    * non-hot shingles (buckets past [[ContainMaxDocs]] docs are
    * boilerplate stop-shingles and drop — the LSH hot-bucket
    * discipline, audited by [[containmentHealth]]) and must share at
    * least [[MinSharedShingles]] of them; confirmation recomputes
    * exact shingle
    * sets from raw text for the candidate set only (the
    * [[minhashPairsOf]] verification discipline). Reported: top-100
    * pairs at containment ≥ 0.8 with both metrics — the planted
    * fragments surface at containment 1.0 / Jaccard ≈ 0.5, exactly
    * the band a Jaccard report never shows.
    *
    * 100 TB shape: the index pass shuffles (shingle, doc_id) pairs
    * only (never text); per-shingle pair expansion is bounded at
    * cap²/2; the candidate set joins text back on the unique doc_id
    * key; the top-100 cut compiles to TakeOrderedAndProject.
    */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    containmentScored(spark, dir)
      .orderBy(col("containment").desc, col("doc1"), col("doc2"))
      .limit(100)

  /** The pair list ONLY the containment stage catches — the
    * actionable residue a pipeline's stage 3 acts on after exact
    * collapse (stage 1) and Jaccard-LSH near-dup (stage 2): confirmed
    * containment ≥ 0.8 pairs whose Jaccard sits BELOW the 0.7 LSH
    * operating point, i.e. pairs neither earlier stage can flag.
    * [[containmentPairs]] ranks everything the index surfaces (useful
    * as the full report); this key is the work list stage 3 hands to
    * a keep-best collapse.
    */
  def containmentResidue(spark: SparkSession, dir: String): DataFrame =
    containmentScored(spark, dir)
      .filter(col("jaccard") < 0.7)
      .orderBy(col("containment").desc, col("doc1"), col("doc2"))
      .limit(100)

  /** Confirmed (containment ≥ 0.8) scored pairs shared by the full
    * report and the stage-3 residue list.
    */
  private def containmentScored(spark: SparkSession,
      dir: String): DataFrame = {
    val src = containmentReps(spark, dir)
    val cand = containmentIndex(src)
      .filter(size(col("ids")).between(2, ContainMaxDocs))
      .select(bucketPairs("ids").as("p"))
      .select(col("p.a").as("doc1"), col("p.b").as("doc2"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("nsh"))
      .filter(col("nsh") >= MinSharedShingles)
      .select("doc1", "doc2")
    val texts = src.select("doc_id", "text")
    val s1 = shingleExpr("text1")
    val s2 = shingleExpr("text2")
    cand
      .join(texts.select(col("doc_id").as("doc1"),
        col("text").as("text1")), "doc1")
      .join(texts.select(col("doc_id").as("doc2"),
        col("text").as("text2")), "doc2")
      .withColumn("n_sh1", size(s1).cast("bigint"))
      .withColumn("n_sh2", size(s2).cast("bigint"))
      .withColumn("n_shared",
        size(array_intersect(s1, s2)).cast("bigint"))
      .withColumn("containment", round(col("n_shared").cast("double")
        / least(col("n_sh1"), col("n_sh2")), 4))
      .withColumn("jaccard", round(col("n_shared").cast("double")
        / (col("n_sh1") + col("n_sh2") - col("n_shared")), 4))
      .filter(col("containment") >= 0.8)
      .select("doc1", "doc2", "n_sh1", "n_sh2", "n_shared",
        "containment", "jaccard")
  }

  /** Stop-shingle census for [[containmentPairs]] — the "no silent
    * caps" companion ([[lshHealth]] / [[ngramBlockCensus]]
    * discipline): how many inverted-index buckets exist, how many are
    * singletons (no pair signal), how many pair up, how many the
    * hot-shingle cap DROPPED (with the largest), and the bounded
    * candidate-pair load the surviving buckets imply. A containment
    * report whose densest shingles were capped must never read as
    * complete — a run checks this row first.
    */
  def containmentHealth(spark: SparkSession, dir: String): DataFrame = {
    val dropped = col("n") > ContainMaxDocs
    containmentIndex(containmentReps(spark, dir))
      .select(size(col("ids")).cast("bigint").as("n"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_singleton"),
        sum(when(col("n").between(2, ContainMaxDocs), 1L).otherwise(0L))
          .as("n_pairing"),
        sum(when(dropped, 1L).otherwise(0L)).as("n_capped"),
        coalesce(max(when(dropped, col("n"))), lit(0L))
          .as("largest_capped"),
        // `div`, not `/`: Spark's `/` on bigints returns DOUBLE
        sum(when(col("n").between(2, ContainMaxDocs),
          expr("n * (n - 1) div 2")).otherwise(0L)).as("n_cand_pairs"))
  }

  /** Stage-3 collapse — the consumer [[containmentResidue]]'s work
    * list previously lacked: the confirmed containment pairs join the
    * exact-star ∪ LSH edge graph as first-class dup edges, so a
    * truncated or quote-wrapped copy lands in its original's
    * connected component and LOSES the keep-best vote (fewest tokens
    * — exactly the asymmetry containment detects). Census per source
    * with the fragment band (ids ≥ 2e6, the planted truncations)
    * reported explicitly: without the containment edges those
    * fragments are singletons (no exact digest match, Jaccard ≈ 0.5
    * below every LSH operating point) and provably survive both
    * earlier stages; here their drops are visible per source.
    *
    * 100 TB shape: inherits the [[dupLabelsOf]] propagation (ids
    * only, census-sized label table) and [[containmentPairs]]'
    * capped inverted index; the keep-best tail shuffles (id, tokens)
    * pairs on the unique doc_id / cluster keys, never text.
    */
  def containmentKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val src = containmentCorpus(spark, dir)
    val contEdges = containmentScored(spark, dir)
      .select(col("doc1").as("src"), col("doc2").as("dst"))
    val labels = dupLabelsWith(src, Some(contEdges))
    val docs = src
      .withColumn("t", trim(col("text")))
      .select(col("doc_id"), col("source"),
        when(length(col("t")) === 0, lit(0L)).otherwise(
          (length(col("t")) - length(expr("replace(t, ' ', '')")) + 1)
            .cast("bigint")).as("n_tokens"))
    val clustered = docs
      .join(labels.select(col("id").as("doc_id"), col("lbl")),
        Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("lbl"), col("doc_id")))
    val winners = clustered.groupBy("cluster")
      .agg(min(struct((-col("n_tokens")).as("neg"), col("doc_id")))
        .as("b"))
      .select(col("cluster"), col("b.doc_id").as("best_id"))
    clustered.join(winners, "cluster")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("doc_id") === col("best_id")).cast("long")).as("n_kept"),
        sum((col("doc_id") >= 2000000L).cast("long")).as("n_frag_docs"),
        sum((col("doc_id") >= 2000000L
          && col("doc_id") =!= col("best_id")).cast("long"))
          .as("n_frag_dropped"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("n_docs") - col("n_kept")).as("n_dropped"),
        col("n_frag_docs"), col("n_frag_dropped"))
      .orderBy("source")
  }

  /** LSH index health — the observability query a production dedup
    * service watches (the dedup counterpart of [[graft.ops.VectorOps
    * .pqCodes]]' codebook-balance histogram): per band, how many
    * buckets exist, how many are singletons (no candidate signal),
    * how many collide, the largest bucket (the skew guard's input —
    * when max_bucket approaches the cap it's time to widen bands),
    * and the candidate-pair load Σ n·(n−1)/2 the bucket distribution
    * implies. One banding pass + two partial aggs; nothing touches
    * text.
    */
  def lshHealth(spark: SparkSession, dir: String): DataFrame =
    minhashBuckets(corpus(spark, dir))
      .groupBy("band", "bh")
      .agg(count(lit(1)).as("n"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_singleton"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_colliding"),
        max(col("n")).as("max_bucket"),
        // `div`, not `/`: Spark's `/` on bigints returns DOUBLE
        sum(when(col("n") > 1, expr("n * (n - 1) div 2"))
          .otherwise(0L)).as("n_cand_pairs"))
      .orderBy("band")

  /** The per-source digest sketches both theta census queries consume
    * (planted "mirror" source included — the natural corpus has no
    * cross-source duplicate): one corpus scan, one sketch row per
    * source. k is sized for [[sourceUnique]]'s stricter exactness
    * condition (see there).
    */
  private def perSourceSketch(spark: SparkSession, dir: String,
      k: Int): DataFrame = {
    val d = Tables.documents(spark, dir).select("doc_id", "text", "source")
    val planted = d.unionByName(
      d.filter(col("doc_id") % 5 === 0).withColumn("source", lit("mirror")))
    planted
      .select(col("source"), md5(lower(trim(col("text")))).as("h"))
      .groupBy("source")
      .agg(graft.functions.ThetaSketch.sketchAgg(col("h"), k).as("sk"))
  }

  /** Per-source unique-content census via theta A-NOT-B — the
    * set-algebra completion of [[sourceOverlap]] (which exercises
    * union/intersect): for every source, how many distinct digests
    * appear in NO other source. Each source's sketch subtracts the
    * union of all the others' sketches — S² sketch-pair rows, one
    * corpus scan, text never re-read.
    *
    * Exactness condition — STRICTER than sourceOverlap's pairwise one:
    * the subtracted side unions S−1 sketches, so exact results need
    * k ≥ the TOTAL distinct digests across all sources (a union past
    * k trims its reservoir and tightens theta, silently switching the
    * whole query to estimates). k = 2¹⁸ holds that bound through the
    * 30× stress corpus (~150 k distinct); past it the query degrades
    * to the ThetaSpec-bounded estimating regime by design.
    */
  def sourceUnique(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ThetaSketch
    val sk = perSourceSketch(spark, dir, 1 << 18)
    val a = sk.select(col("source").as("src"), col("sk").as("sk_a"))
    val b = sk.select(col("source").as("other"), col("sk").as("sk_b"))
    // union of every OTHER source's sketch, then A \ others (sk_a is
    // functionally dependent on src, so first() is deterministic).
    // LEFT join: a source with no counterpart (single-source corpus)
    // must still emit a row — its sk_rest unions over zero sketches,
    // i.e. the empty sketch, so A \ ∅ = A and n_unique = n_digests,
    // matching the oracle's NOT EXISTS semantics.
    val others = a.join(b, col("src") =!= col("other"), "left")
      .groupBy("src")
      .agg(first(col("sk_a")).as("sk_a"),
        ThetaSketch.unionAgg(col("sk_b")).as("sk_rest"))
    others
      .select(col("src").as("source"),
        ThetaSketch.estimate(col("sk_a")).cast("bigint").as("n_digests"),
        ThetaSketch.estimate(ThetaSketch.aNotB(col("sk_a"), col("sk_rest")))
          .cast("bigint").as("n_unique"))
      .withColumn("uniq_pct",
        round(col("n_unique") * 100.0 / col("n_digests"), 2))
      .orderBy("source")
  }

  /** Cross-source duplicate-overlap matrix via theta sketches
    * ([[graft.functions.ThetaSketch]]): per-source sketches of the
    * content digest, then pairwise set algebra (|A|, |B|, |A∩B|,
    * |A∪B|, Jaccard) on the SKETCH values — the corpus is scanned
    * once, the pairwise work touches only S per-source sketches, never
    * documents. At 100 TB the same plan holds: the scan+partial-agg is
    * the only fact pass, the pair join is S², and k bounds every
    * sketch at a fixed byte size. With k = 2¹⁶ ≥ per-source distincts
    * the sketch is in its exact regime, so this query hash-matches the
    * exact DuckDB set arithmetic (the estimating regime is
    * ThetaSpec's job). A planted "mirror" source (every 5th doc
    * re-sourced) makes the overlap non-trivial: the natural corpus has
    * no cross-source duplicate.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ThetaSketch
    val sk = perSourceSketch(spark, dir, 1 << 16)
    val a = sk.select(col("source").as("source_a"), col("sk").as("sk_a"))
    val b = sk.select(col("source").as("source_b"), col("sk").as("sk_b"))
    val inter =
      ThetaSketch.estimate(ThetaSketch.intersect(col("sk_a"), col("sk_b")))
    val uni =
      ThetaSketch.estimate(ThetaSketch.union(col("sk_a"), col("sk_b")))
    a.join(b, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        ThetaSketch.estimate(col("sk_a")).cast("bigint").as("n_a"),
        ThetaSketch.estimate(col("sk_b")).cast("bigint").as("n_b"),
        inter.cast("bigint").as("n_common"),
        uni.cast("bigint").as("n_union"),
        round(inter / uni, 6).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Passage-level dedup: tumbling 20-word chunks, digested ENTIRELY
    * map-side inside one higher-order `transform` over the token
    * array — only the 32-hex digests ever reach the exchange, never
    * chunk text. The duplicated-passage census is the sub-document
    * complement of [[exactDedup]] (whole-doc digests): boilerplate
    * headers, license blocks and template paragraphs shared across
    * otherwise-distinct documents surface here and would be invisible
    * to whole-document hashing.
    *
    * 100 TB: per-doc chunking is embarrassingly parallel; the single
    * shuffle carries (digest, doc_id) pairs with map-side combine,
    * and the output is a bounded TakeOrdered top-200 — no full-result
    * sort or driver collect. Tumbling (stride = width) keeps the
    * expansion at size/20 digests per doc vs the ~size sliding
    * shingles of [[minHashLsh]] — this is a census, not a recall
    * search, so the cheaper chunking is the right trade.
    */
  /** Bloom-filter membership dedup (the one-sided probe pass of
    * Dolma-style incremental pipelines), expressed RELATIONALLY so it
    * is exactly reproducible — and therefore oracle-checkable, which
    * a library Bloom filter never is: the filter over the historical
    * corpus is the DISTINCT SET of md5-affine bit positions (k = 4
    * hashes into m = 1024 bits — m deliberately small so the
    * false-positive audit has signal at test scale; production sizes
    * m to the element budget), materialized as a ≤m-row table. An
    * incoming doc is flagged iff every one of its positions is set —
    * no false negatives by construction, false positives counted
    * exactly against the true digest membership. Output: per-source
    * probe census (probed / flagged / true dups / false positives).
    *
    * 100 TB: the filter table is ≤m rows NO MATTER the historical
    * corpus size (the point of a Bloom filter) and broadcasts; probes
    * are one scan + a broadcast join + a per-doc k-row agg. The
    * true-membership audit join is exact only because the historical
    * slice here is fixed-size; at scale that audit samples.
    */
  def bloomDedup(spark: SparkSession, dir: String): DataFrame = {
    val M = 1024
    val K = 4
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
    val hist = docs.filter(col("doc_id") < 250)
    val incoming = docs.filter(col("doc_id") >= 250)
      .unionByName(hist.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 2000000L))
    def digest(c: Column) = md5(lower(trim(c)))
    // 28-bit md5 base + the minhash affine family, folded into [0, M)
    val baseExpr =
      expr("cast(conv(substring(dg, 1, 7), 16, 10) as bigint)")
    def positions(df: DataFrame): DataFrame = df
      .withColumn("b", baseExpr)
      .select(df.columns.map(col) :+
        explode(array((0 until K).map { j =>
          val a = (1000003L * j + 12345L) % P
          val c = (998244353L * (j + 1) + 7L) % P
          ((lit(a) * col("b") + lit(c)) % P) % M
        }: _*)).as("pos"): _*)
    val bits = positions(hist.select(digest(col("text")).as("dg")))
      .select("pos").distinct()
    val truth = hist.select(digest(col("text")).as("dg")).distinct()
      .withColumn("is_dup", lit(1L))
    val probed = positions(
      incoming.select(col("doc_id"), col("source"),
        digest(col("text")).as("dg")))
      .join(broadcast(bits.withColumn("hit", lit(1))), Seq("pos"), "left")
      .groupBy("doc_id", "source", "dg")
      .agg(min(coalesce(col("hit"), lit(0))).as("all_set"))
    probed
      .join(broadcast(truth), Seq("dg"), "left")
      .select(col("source"), col("all_set"),
        coalesce(col("is_dup"), lit(0L)).as("is_dup"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_probed"),
        sum(col("all_set").cast("long")).as("n_flagged"),
        sum(col("is_dup")).as("n_true_dup"),
        sum(when(col("all_set") === 1 && col("is_dup") === 0L, 1L)
          .otherwise(0L)).as("n_false_pos"))
      .orderBy("source")
  }

  /** Duplicated-SPAN detector (the substring-level dedup of Lee et
    * al.'s "Deduplicating Training Data Makes Language Models Better",
    * re-expressed relationally): every 10-word window of every doc is
    * digested at its word position; windows whose digest occurs ≥ 2
    * times anywhere in the corpus (cross-doc boilerplate AND in-doc
    * repetition both count, as in the suffix-array formulation) are
    * duplicated; per doc, overlapping/adjacent duplicated windows
    * merge into MAXIMAL spans (positions p, p' are one span iff
    * p' − p ≤ W, which makes span coverage max−min+W exact, not an
    * overcount). Output: the 100 most duplicated docs by covered
    * words, with span count / longest span / coverage.
    *
    * 100 TB: the explode is ~n_words rows/doc (the same expansion
    * class as [[minHashLsh]]'s shingles) but only (digest, doc, pos)
    * triples ever shuffle, never text; the occurrence census is a
    * map-side-combined agg on the digest; the join-back is digest ⋈
    * digest co-partitioned (the dup-digest side is unbounded — a hot
    * boilerplate 10-gram at corpus scale — so it can NEVER broadcast:
    * an intentional shuffle join, sweep-whitelisted); the island
    * windows run per-doc, bounded by document length; the final
    * ranking is a bounded TakeOrdered top-100.
    */
  def spanDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextExpressions.wordNGramsPos
    val W = 10
    val dig = corpus(spark, dir)
      .select(col("doc_id"),
        size(filter(split(lower(col("text")), " "), t => t =!= ""))
          .cast("long").as("n_words"),
        posexplode(wordNGramsPos(col("text"), W)).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("n_words"), col("pos"),
        // 64-bit digest prefix: half the shuffle bytes of a full md5,
        // collision-safe at any realistic shingle cardinality
        substring(md5(col("sh")), 1, 16).as("dg"))
    val dupDigests = dig.groupBy("dg").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    dig.join(dupDigests, "dg")
      .select(col("doc_id"), col("n_words"), col("pos"))
      .withColumn("gap", col("pos") - lag(col("pos"), 1).over(byDoc))
      .withColumn("brk",
        when(col("gap").isNull || col("gap") > W, 1).otherwise(0))
      .withColumn("run", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "n_words", "run")
      .agg((max(col("pos")) - min(col("pos")) + W).cast("long").as("span_words"))
      .groupBy("doc_id", "n_words")
      .agg(count(lit(1)).as("n_spans"),
        max(col("span_words")).as("longest_span"),
        sum(col("span_words")).as("dup_words"))
      .orderBy(col("dup_words").desc, col("doc_id"))
      .limit(100)
  }

  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val W = 20 // words per chunk
    corpus(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        s"""transform(
              sequence(0, cast(ceil(size(toks) / $W.0) as int) - 1),
              i -> md5(concat_ws(' ', slice(toks, i * $W + 1, $W))))"""))
        .as("h"))
      .groupBy("h")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("h"))
      .limit(200)
  }
}
