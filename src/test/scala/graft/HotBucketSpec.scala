package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, VectorOps}

/** The skew guards that keep LSH banding safe at 100 TB: a degenerate
  * hot bucket/block (every member collapsing to one fingerprint or
  * block key) must be DROPPED at the cap, never expanded into B²
  * pairs. Each test plants a hot group larger than the cap plus a
  * small control group, and asserts the hot group vanishes while the
  * control group's pairs survive — then re-runs with the cap raised to
  * prove the guard (not an unrelated bug) removed them.
  */
class HotBucketSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("simhash drops a hot band bucket past the cap") {
    val hot = (0 until 50).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
    val ctl = (100 until 105).map(i =>
      (i.toLong, "quick brown foxes jump over many lazy dogs"))
    val docs = (hot ++ ctl).toDF("doc_id", "text")
    val capped = DedupOps.simhashOf(docs, maxBucket = 20).collect()
    assert(capped.length === 10,
      s"expected only C(5,2) control pairs, got ${capped.length}")
    assert(capped.forall(_.getLong(0) >= 100L),
      "a hot-bucket doc leaked past the cap")
    val raised = DedupOps.simhashOf(docs, maxBucket = 100).count()
    assert(raised === 50L * 49 / 2 + 10)
  }

  test("embedding LSH drops a hot band bucket past the cap") {
    val vHot = Array.tabulate(64)(k => if (k % 2 == 0) 1.0f else -0.5f)
    // exact negation: cosine -1 (never confirmed) and complementary
    // sign bits (never shares a band bucket with the hot group)
    val vCtl = vHot.map(x => -x)
    val rows = (0 until 50).map(i => (i.toLong, vHot)) ++
      (100 until 105).map(i => (i.toLong, vCtl))
    val corpus = rows.toDF("vec_id", "embedding")
    val capped = VectorOps.embNearDupOf(corpus, maxBucket = 20).collect()
    assert(capped.length === 10,
      s"expected only C(5,2) control pairs, got ${capped.length}")
    assert(capped.forall(_.getLong(0) >= 100L),
      "a hot-bucket vector leaked past the cap")
    val raised = VectorOps.embNearDupOf(corpus, maxBucket = 100).count()
    assert(raised === 50L * 49 / 2 + 10)
  }

  test("ngram jaccard reports a dropped oversized block, never silently") {
    // a planted block past maxBlock must (a) vanish from the pair
    // list — the quadratic guard — and (b) show up in the census with
    // its size and avoided pair load: dropped, not silent
    val hot = (0 until 50).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta",
        "web", "en"))
    val ctl = (100 until 105).map(i =>
      (i.toLong, "quick brown foxes jump over many lazy dogs today",
        "wiki", "en"))
    val docs = (hot ++ ctl).toDF("doc_id", "text", "source", "lang")
    val capped = DedupOps.ngramJaccardOf(docs, maxBlock = 20).collect()
    assert(capped.forall(_.getLong(0) >= 100L),
      "a dropped-block doc leaked into the pair list")
    assert(capped.length === 10)
    val census = DedupOps.ngramBlockCensus(docs, maxBlock = 20).head()
    assert(census.getLong(0) === 2L, "two blocks total")
    assert(census.getLong(1) === 1L, "one block dropped")
    assert(census.getLong(2) === 50L, "dropped docs counted")
    assert(census.getLong(3) === 50L, "largest dropped block reported")
    assert(census.getLong(4) === 50L * 49 / 2, "avoided pair load")
    // raising the cap re-admits the block AND zeroes the census
    val raised = DedupOps.ngramBlockCensus(docs, maxBlock = 100).head()
    assert(raised.getLong(1) === 0L && raised.getLong(3) === 0L)
    assert(DedupOps.ngramJaccardOf(docs, maxBlock = 100).count() === 100)
  }

  test("dedup rep selection survives a hot digest with no window") {
    import org.apache.spark.sql.functions._
    // one digest duplicated 12,000× (the boilerplate-page shape) plus a
    // near-dup pair: under the old row_number/min window every hot copy
    // — text included — landed on ONE reducer's window partition; the
    // aggregate+join-back shape collapses it map-side
    val hot = spark.range(12000).select(col("id").as("doc_id"),
      lit("common boilerplate page repeated everywhere verbatim").as("text"))
    val a = Seq((20000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (20001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"))
      .toDF("doc_id", "text")
    val docs = hot.unionByName(a)

    // no Window node may appear anywhere in the rep-selection plans
    for ((name, df) <- Seq(
        "dedupReps" -> DedupOps.dedupReps(docs),
        "dedupStarEdges" -> DedupOps.dedupStarEdges(docs),
        "dedupPipelineOf" -> DedupOps.dedupPipelineOf(docs))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name plan contains a Window over the digest:\n$plan")
    }

    val reps = DedupOps.dedupReps(docs).collect()
    assert(reps.length === 3)
    val hotRep = reps.find(_.getLong(0) == 0L).get
    assert(hotRep.getLong(2) === 12000L, "hot group size wrong")

    val pairs = DedupOps.dedupPipelineOf(docs).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((20000L, 20001L)))

    val clusters = DedupOps.dupClustersOf(docs)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(clusters === Set((12000L, 0L, 11999L), (2L, 20000L, 20001L)),
      s"unexpected clusters: $clusters")
  }

  test("stratified sample fails loudly past the k cap") {
    // the RangeJoinExec build-cap pattern: exact-fraction sampling
    // holds k rows per task heap, and k grows with the corpus — past
    // the configured cap the operator must refuse (pointing at the
    // hash-Bernoulli scale path), not OOM an executor
    spark.conf.set("spark.graft.stratifiedSample.maxK", "1")
    try {
      val e = intercept[IllegalStateException] {
        graft.ops.TextOps.stratifiedSample(spark, TestSpark.sfDir)
      }
      assert(e.getMessage.contains("hashSample"))
    } finally spark.conf.unset("spark.graft.stratifiedSample.maxK")
    // below the cap the sample is unchanged
    assert(graft.ops.TextOps.stratifiedSample(spark, TestSpark.sfDir)
      .count() > 0)
  }

  test("ngram jaccard drops a hot block past the cap") {
    val hot = (0 until 50).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta", "web", "en"))
    val ctl = (100 until 105).map(i =>
      (i.toLong, "quick brown foxes jump over many lazy dogs", "books", "en"))
    val docs = (hot ++ ctl).toDF("doc_id", "text", "source", "lang")
    val capped = DedupOps.ngramJaccardOf(docs, maxBlock = 20).collect()
    assert(capped.length === 10,
      s"expected only C(5,2) control pairs, got ${capped.length}")
    assert(capped.forall(_.getLong(0) >= 100L),
      "a hot-block doc leaked past the cap")
    val raised = DedupOps.ngramJaccardOf(docs, maxBlock = 100).count()
    // top-100 limit bounds the raised run, which would otherwise be
    // C(50,2) + C(5,2) pairs
    assert(raised === 100)
  }
}
