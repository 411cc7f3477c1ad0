package graft

import org.scalatest.funsuite.AnyFunSuite

/** Join-strategy audit across the whole query surface: catches a
  * dimension join silently degrading to sort-merge (lost broadcast
  * hint, size estimate gone) or an accidental cartesian product — the
  * regressions that stay invisible at test scale and hurt at 100 TB.
  */
class PlanSweepSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir

  // joins that are MEANT to be non-broadcast at scale
  private val smjAllowed = Set(
    "doc_bm25_topk",       // tf ⋈ df on token, tf ⋈ dl on doc_id:
                           // vocabulary/corpus-scale censuses both
                           // sides (the dsir shape) — never broadcast;
                           // the ≤24-row query-term side DOES broadcast
    "doc_bm25_pruned",     // same censuses over the impact-capped
                           // posting lists
    "doc_bm25_maxscore",   // the same tf⋈df⋈dl census joins feeding
                           // the matched frame; the seed/survivor
                           // passes are bounded semi-joins on it
    "doc_bm25_maxscore_stored", // same shape off the bucketed index;
                           // bounds census reads the capped companion
    "doc_bm25_recall",     // composes full + pruned, inherits both
    "doc_bm25_recall_curve", // composes full + three capped prefixes,
                           // inherits the same census joins
    "doc_bm25_topk_stored", // same censuses off the bucketed index:
                           // the layout removes the exchanges, the
                           // join strategy still prints as SMJ
    "doc_bm25_pruned_stored", // the impact-capped read, same layout
    "doc_hybrid_topk",     // inherits the bm25 census joins; the RRF
                           // full-outer merge of the two ≤5·|Q|-row
                           // engine outputs is also SMJ (full outer
                           // cannot broadcast) — bounded by
                           // construction, never corpus-sized
    "doc_hybrid_ivf",      // the scale-path hybrid inherits the same
                           // pruned-bm25 censuses + bounded RRF merge
    "doc_hybrid_stored",   // the deployment hybrid: stored-bm25's
                           // bucketed-layout censuses (SMJ strategy,
                           // zero exchanges) + the bounded RRF merge
    "doc_hybrid_exact_stored", // same stored layouts with the
                           // lexical side's MaxScore census joins
    "doc_hybrid_refined_stored", // exact-lex stored + the indexed
                           // refine's corpus-axis rescore join
    "doc_hybrid_recall",   // composes both hybrids, inherits both
    "doc_vec_integrity",   // full-outer on the unique id axis (a
                           // full outer cannot broadcast): id-keyed
                           // uniform shuffle, linear, bucketable
    "doc_nb_lang",         // tf ⋈ model on token (vocabulary-keyed
                           // censuses both sides, the bm25/dsir shape)
                           // and spine ⋈ evidence on (doc_id, class):
                           // both corpus-scale, unique keys → uniform
    "doc_nb_margin",       // same shared NB scoring chain
    "q5_region_join",      // orders x lineitem: genuinely large-large
    "q4_priority",         // orders semi lineitem keys: large-large
    "q7_volume",           // lineitem x orders, orders x customer
    "q8_share",            // lineitem x orders, orders x customer:
                           // same large-large chain as q7
    "q18_large",           // orders x HAVING-filtered lineitem agg
    "q21_waiting",         // lineitem x orders + census join-back:
                           // both sides fact-derived, key-uniform
    "img_channel_overlap", // INTERSECT of two dataset-key sets: both
                           // sides are fact-derived, shuffle semi join
                           // is the right strategy
    "doc_dedup_pipeline",  // keeper set ⋈ corpus text on the unique
                           // doc_id: both sides corpus-scale by design
                           // (the join replaced the hot-digest window;
                           // unique keys → uniform shuffle)
    "emb_knn_ivfpq",       // PQ codes ⋈ cell routing on vec_id: both
                           // corpus-scale — stands in for the persisted
                           // co-bucketed IVFPQ index read (unique keys
                           // → uniform shuffle)
    "emb_ann_recall",      // composes knn_brute + knn_ivfpq, inherits
                           // the ivfpq corpus-axis join
    "emb_knn_refine",      // the ivfpq candidate stage, same inherited
                           // corpus-axis join
    "emb_knn_refine_indexed", // same refine tail; the candidate stage
                           // reads the bucketed index instead
    "emb_refine_recall",   // composes brute + refine, inherits both
    "emb_refine_depth_curve", // same composed shape at four depths
                           // off one rescored candidate prefix
    "emb_recall_ladder",   // composes all four search rungs, inherits
                           // the ivfpq corpus-axis join
    "emb_recall_ladder_opq", // the five-rung ladder: same inherited
                           // ivfpq corpus-axis join
    "emb_ivf_nlist_sweep", // per-level candidates join vectors back
                           // on the unique vec_id key (corpus-scale
                           // both sides — the assignCells join-back
                           // discipline)
    "doc_quality_vs_dup",  // (digest, source, keep) census ⋈ per-
                           // digest totals on the digest key: both
                           // sides corpus-scale censuses, key-uniform
    "doc_containment",     // inverted-index candidates ⋈ corpus text
                           // on the unique doc1/doc2 keys: candidate
                           // volume is cap-bounded but corpus-
                           // proportional, text side is the corpus —
                           // key-uniform shuffle join by design
    "doc_containment_residue", // the same scored chain, stage-3 cut
    "q2_min_cost",         // pair-cost ⋈ per-part min join-back: both
                           // sides fact-derived aggregates keyed on
                           // partkey — co-partitioned shuffle join is
                           // the 100 TB plan (part scales with the
                           // corpus, so the min side can't broadcast)
    "q20_dominant_supplier", // per-pair qty ⋈ per-part total join-back:
                           // same fact-derived-both-sides shape
    "doc_survival_funnel", // digest keeper join-back + per-doc contam
                           // flag join-back: both sides corpus-scale on
                           // UNIQUE keys (digest / doc_id) — uniform
                           // shuffles, the doc_dedup_pipeline shape
    "doc_funnel_tokens",   // the same shared flags frame, token tail
    "doc_bigram_logprob",  // bigram occurrences ⋈ per-type score on the
                           // bigram key: both sides vocabulary/corpus
                           // scale by design (a web corpus's bigram
                           // vocabulary is billions of rows — never
                           // broadcast); uniform high-cardinality keys
    "doc_dsir_weights",    // token occurrences ⋈ per-type weight on the
                           // token key: same vocabulary-scale shape
    "doc_source_kl",       // (source, token) counts ⋈ corpus token
                           // counts on the token key: vocabulary-scale
                           // both sides, the dsir shape
    "img_dataset_overlap", // digest-keyed self-join + shareable-band
                           // semi-join: both sides corpus-scale on the
                           // sha key (the LSH-bucket discipline) —
                           // co-partitioned shuffles; serial joins run
                           // after the top-50 cut and broadcast
    "doc_paraphrase_mining", // cell-co-partitioned self-join (the
                           // emb_semdedup shape below); the document
                           // annotation joins run AFTER the top-50
                           // cut and broadcast. Baseline for
                           // doc_paraphrase_mining_ivf (the k ∝ N twin)
    "doc_paraphrase_mining_ivf", // same cell-co-partitioned self-join
                           // over the k ∝ N codebook — bounded cell
                           // size by construction
    "doc_paraphrase_ivf_recall", // composes both miners, inherits the
                           // pair-stage self-joins
    "doc_domain_clusters", // cell assignment ⋈ documents on the unique
                           // vec_id/doc_id key: both sides corpus-scale
                           // by design — uniform shuffle join
    "doc_pruning_census",  // the same assignment ⋈ documents shuffle
                           // join (shares doc_domain_clusters' census)
    "doc_pruning_quality", // the same assignment ⋈ documents shuffle
                           // join, twice (census + per-doc quality
                           // flags); the policy join itself is k × k
    "doc_containment_keep_best", // the doc_dedup_keep_best joins plus
                           // the capped containment-index pair stage
                           // (the doc_containment shape) feeding the
                           // same label propagation
    "doc_dedup_keep_best", // docs ⋈ cluster labels on doc_id and
                           // docs ⋈ cluster winners on the cluster key:
                           // corpus-scale both sides (the dup_clusters
                           // label table), unique keys — uniform
                           // shuffle joins
    "emb_hard_negatives_ivf", // probe-path joins: anchors⋈probes on the
                           // unique aid and probes⋈assignment on the
                           // k-cardinality cell key — both sides
                           // corpus-proportional on the 100 TB path,
                           // so neither may broadcast by design
    "emb_knn_classify_ivf", // same probe-path joins + the ≤5·|A| winner
                           // rows ⋈ labels on the unique vec_id (the
                           // |A|-proportional set that must NOT
                           // broadcast at scale)
    "emb_hn_ivf_recall",   // composes the exact + probed miners,
                           // inherits the probe-path joins
    "emb_classify_ivf_recall", // composes the exact + probed
                           // classifiers, inherits the probe-path joins
    "emb_knn_graph",       // the same cell-co-partitioned self-join
                           // shape as emb_semdedup (corpus both sides)
    "emb_semdedup",        // cell-co-partitioned self-join: both sides
                           // are the corpus-sized assignment — pair
                           // work is quadratic in CELL size only, and
                           // the cluster count is the WIRED scale
                           // knob (k ∝ N via derivedK), so neither
                           // side ever broadcasts by design
    "emb_semdedup_probe",  // same cell-co-partitioned self-join with
                           // the prober side doubled (2-probe) — still
                           // corpus-scale both sides
    "emb_semdedup_recall", // anchor-side pair geometries ⋈ primary /
                           // probed assignment on cell — the
                           // emb_knn_graph_recall audit shape
    "emb_semdedup_clusters", // the probe2 pair stage feeding the
                           // min-label propagation (the
                           // doc_dup_clusters shape on vectors)
    "emb_knn_graph_probe", // same shape, prober at 2 probes
    "emb_knn_graph_topk",  // same shape, bounded top-k edge select
    "emb_knn_graph_recall", // anchor-side prober ⋈ primary assignment
                           // on cell: anchor volume is
                           // corpus-proportional (1-in-64), so it must
                           // not broadcast at scale
    "emb_knn_graph_probe_curve" // the same audit shape at three
                           // probe depths off one 4-probe routing
  )
  // intended broadcast-nested-loop joins (non-equi or single-row sides)
  private val bnlAllowed = Set(
    "doc_bpe_merge_step", // one-row winning-pair census cross join
    "doc_bpe_train",  // eight chained one-row winner cross joins
    "doc_fertility_trained", // the same chained winner cross joins +
                      // the one-row merge table against the census
    "doc_bm25_topk",  // one-row (n_docs, avgdl) census cross joins
    "doc_bm25_pruned", // same one-row census cross joins
    "doc_bm25_recall", // composes full + pruned, inherits both
    "doc_bm25_recall_curve", // the same one-row census cross joins
                      // across the three prefix caps
    "emb_prototype_prune", // 16-centroid assignment cross join (the
                      // shared assignCells coarse step)
    "doc_bm25_topk_stored", // inherits doc_bm25_topk's one-row
                      // (n_docs, avgdl) census cross joins
    "doc_bm25_pruned_stored", // same inherited census cross joins
    "doc_bm25_maxscore", // one-row (n_docs, avgdl) census cross join
                      // in the matched frame, theta broadcast
    "doc_bm25_maxscore_stored", // same census cross joins off the
                      // stored index + the bounds census's one
    "doc_hybrid_topk", // inherits doc_bm25_topk's one-row census
                      // cross joins and emb_knn_brute's tiny-query
                      // <> scan — fusion adds no join of its own
                      // beyond the bounded full-outer rank merge
    "doc_hybrid_ivf", // the scale-path twin inherits doc_bm25_pruned
                      // + emb_knn_ivf's centroid cross joins
    "doc_hybrid_stored", // the deployment twin inherits the stored
                      // bm25 census cross joins + the indexed-ivfpq
                      // probe-side routing cross joins
    "doc_hybrid_exact_stored", // the exact-lexical corner inherits
                      // the stored maxscore census cross joins + the
                      // indexed-ivfpq routing cross joins
    "doc_hybrid_refined_stored", // same + the indexed refine's
                      // routing cross joins
    "doc_hybrid_recall", // composes both hybrids, inherits both
    "doc_nb_lang",    // class-census (5-row) + one-row vocab-total
                      // cross joins in the NB constants
    "doc_survival_funnel", // the r12 classifier gate inherits
                      // doc_nb_lang's NB-constants cross joins
    "doc_funnel_tokens", // same shared flags frame, token tail
    "doc_bpe_vocab",  // chained one-row winner cross joins + the
                      // one-row display frame against the top-50
    "doc_nb_margin",  // same NB constants cross joins
    "doc_nb_features", // (tok x class) spine: vocab census x 5-row
                      // class census x one-row global census
    "doc_tfidf",      // corpus-size single row cross join
    "doc_unigram_logprob", // vocabulary x single-row total cross join
    "doc_ccnet_buckets",   // same, plus the single-row tercile cuts
    "doc_ccnet_sketched",  // same shape, KLL cut row instead of exact
    "emb_knn_brute",  // tiny query side, <> condition
    "emb_knn_truncated", // same tiny-query <> scan, prefix stage
    "emb_truncate_curve", // four prefix rungs of the same scan shape
    "emb_truncated_recall", // composes brute + truncated, inherits both
    "emb_knn_ivf",    // centroid cross joins + tiny probe side
    "emb_kmeans_step", // 16-centroid broadcast cross join (assignment)
    "emb_kmeans_train", // three chained centroid-broadcast cross joins
    "emb_kmeans_inertia", // same chained assignment cross joins
    "emb_knn_trained", // trained-codebook routing cross joins
    "emb_codebook_recall", // composes both searches + brute, inherits
    "emb_knn_ivfpq",  // 16-centroid routing cross joins (IVF coarse step)
    "emb_knn_ivfpq_indexed", // same probe-side routing cross joins —
                             // the corpus side reads the bucketed index
    "emb_ann_recall", // composes knn_brute + knn_ivfpq, inherits both
    "emb_knn_refine", // the ivfpq routing cross joins + the tiny
                      // candidate/query broadcast joins
    "emb_knn_refine_indexed", // probe-side routing cross joins off
                      // the stored index + the same refine tail
    "emb_refine_recall", // composes brute + refine, inherits both
    "emb_refine_depth_curve", // same composed shape, four depths off
                      // one rescored prefix
    "emb_recall_ladder", // composes brute/sq8/pq/ivfpq, inherits all
    "emb_recall_ladder_opq", // adds the opq rung: inherits all of the
                      // above plus emb_knn_opq's one-row rotation-plan
                      // census cross join
    "doc_source_overlap", // S-row sketch pairs, < condition (S = sources)
    "doc_source_unique",  // S-row sketch pairs, <> condition
    "q22_idle",       // one-row balance census cross join
    "q11_important_value", // one-row value-total census cross join
    "events_pareto",  // one-row p99 sketch census cross join
    "events_user_lifecycle", // one-row max-week census cross join
    "emb_ivf_balance", // 16-centroid assignment cross join + one-row
                      // total census cross join
    "emb_knn_graph",  // the same k ∝ N assignment cross join
    "emb_semdedup",   // 16-centroid assignment cross join (the shared
                      // assignCells coarse step)
    "emb_semdedup_probe",  // the probed-assignment cross join (the
                      // assignCellsProbed coarse step)
    "emb_knn_graph_probe", // same probed-assignment cross join
    "emb_knn_graph_topk",  // same probed-assignment cross join
    "emb_knn_graph_recall", // probed-assignment cross join + the
                      // broadcast-anchor <> join of the exact
                      // ground-truth side
    "emb_semdedup_recall", // probed-assignment cross join + the
                      // broadcast-anchor < join of the exact
                      // droppable side
    "emb_knn_graph_probe_curve", // probed-assignment cross join + the
                      // broadcast-anchor <> exact-truth join
    "emb_semdedup_clusters", // the probed-assignment cross join (the
                      // shared assignCellsProbed coarse step)
    "events_rfm",     // one-row reference-date census cross join
    "emb_knn_sq8",    // one-row [min,max]-range census cross join +
                      // tiny quantized query side, <> condition
    "doc_mix_weights", // one-row token/weight-total census cross join
    "doc_bigram_logprob", // one-row token-total census cross join
    "doc_dsir_weights",   // one-row corpus-totals census cross join
    "events_conversion_lag", // one-row converter-total census cross join
    "emb_label_margin",   // |L|-row centroid census self-join on <
    "events_power_law",   // one-row order-stat boundary cross join
    "emb_centroid_shift", // 16-centroid broadcast cross join (the
                          // shared kmeansMoments assignment)
    "doc_minhash_band_tune", // one-row planted-total census cross join
    "emb_cell_purity",    // 16-centroid broadcast cross join (the
                          // shared assignment shape)
    "emb_ood_outliers",   // 16-centroid broadcast cross join (the
                          // shared assignment shape)
    "doc_perplexity_outliers", // vocabulary x one-row total cross join
                               // (the shared perDocLogprob shape)
    "emb_ivf_nlist_sweep", // 32-seed routing cross joins (corpus and
                      // probe sides) + the brute-truth composition
    "emb_nprobe_curve", // 16-centroid routing cross joins + brute-truth
                       // composition (inherits emb_knn_brute's shape)
    "doc_source_kl",   // one-row corpus-total census cross join
    "events_forecast_eval", // one-row day-origin census cross join
    "emb_hard_negatives", // hash-bounded anchor sample broadcast with a
                         // <> condition (the knn_brute query-side
                         // shape); exact baseline for
                         // emb_hard_negatives_ivf
    "emb_knn_classify", // same anchor-sample <> broadcast shape; exact
                        // baseline for emb_knn_classify_ivf
    "emb_hard_negatives_ivf", // k ∝ N centroid broadcast cross joins
                        // (corpus routing + anchor probing)
    "emb_knn_classify_ivf",   // same probe-side centroid cross joins
    "emb_hn_ivf_recall",      // composes exact + probe, inherits both
    "emb_classify_ivf_recall", // composes exact + probe, inherits both
    "doc_paraphrase_mining", // 16-centroid assignment cross join (the
                            // shared assignCells coarse step)
    "doc_paraphrase_mining_ivf", // k ∝ N centroid assignment cross join
    "doc_paraphrase_ivf_recall", // composes both miners, inherits the
                                 // assignment cross joins
    "doc_domain_clusters", // k ∝ N centroid assignment cross join +
                           // one-row corpus-total census cross join
    "emb_opq_distortion",  // one-row rotation-plan census cross join
                           // (three 64-long arrays broadcast onto the
                           // corpus scan)
    "doc_pruning_manifest", // k ∝ N centroid assignment cross join +
                           // one-row corpus-total census cross join
                           // (the doc_domain_clusters shape)
    "doc_pruning_census",  // same shapes via the shared census
    "doc_pruning_quality", // same shapes via the shared census
    "emb_near_dup_probe_curve", // one-row candidate/confirm census
                           // cross joins per probe level (the sweep
                           // composes three one-row aggregates)
    "emb_opq_sweep",       // the emb_opq_distortion rotation-plan
                           // census cross join, twice (round 2 rotates
                           // through round 1's plan), + one-row
                           // stats × n_rotated census cross joins
    "emb_knn_opq",         // the same one-row rotation-plan census
                           // cross join ahead of the knn_pq ADC shape
    "emb_knn_opq_indexed"  // the stored rotation plan's one-row census
                           // cross join rotating the 16 seed rows; the
                           // corpus side is the bucketed index scan
  )

  test("doc_zipf ranks via distributed top-k, not a global window sort") {
    val qe = graft.ops.TextOps.zipfTokens(spark, sfDir).queryExecution
    // string-based check on the printed tree: plan.collect can't see
    // through AdaptiveSparkPlanExec (a leaf to collect), which made a
    // node-based assertion vacuously true under AQE
    val s = qe.executedPlan.toString
    info(s)
    val takeIdx = s.indexOf("TakeOrderedAndProject")
    val winIdx = s.indexOf("Window")
    assert(takeIdx >= 0,
      "zipf top-50 must compile to TakeOrderedAndProject " +
        "(distributed partial top-k), not a global sort")
    assert(winIdx >= 0, "rank window missing from the zipf plan")
    // parents print before children: the rank window must sit ABOVE
    // the TakeOrdered (over its ≤50 survivors), never below it over
    // the full vocabulary table
    assert(winIdx < takeIdx,
      "rank window must sit above the TakeOrdered, not the full count table")
  }

  test("doc_stratified_sample ranks via the bounded aggregate, not a window") {
    val s = graft.ops.TextOps.stratifiedSample(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!s.contains("Window"),
      s"stratified sample must not own whole strata in window partitions:\n$s")
    assert(s.contains("topk_by_score"),
      s"bounded top-k aggregate missing from the plan:\n$s")
  }

  test("bm25 final ranking rides the bounded aggregate, not a " +
      "corpus-partition window") {
    // with a corpus-hot query term, a per-qid rank window owns a
    // corpus-sized partition; the final top-5 must be the k-row
    // map-side-partial TopKByScore aggregate. The ONE remaining
    // window is the anchor-query term derivation, whose input is the
    // pushed-down doc_id < 8 slice — never corpus-sized.
    Seq("full" -> graft.ops.TextOps.bm25TopK(spark, sfDir),
        "pruned" -> graft.ops.TextOps.bm25Pruned(spark, sfDir))
      .foreach { case (name, df) =>
        val s = df.queryExecution.executedPlan.toString
        // "Window [" is the Window exec itself; the rank-limit
        // pushdown nodes print as "WindowGroupLimit [" and don't match
        val nWin = s.sliding("Window [".length).count(_ == "Window [")
        assert(nWin == 1,
          s"$name bm25 plan must keep only the anchor-term window, " +
            s"found $nWin:\n$s")
        assert(s.contains("topk_by_score"),
          s"bounded top-k aggregate missing from the $name bm25 plan:\n$s")
      }
  }

  test("doc_ccnet_sketched cuts via the KLL sketch, no exact percentile") {
    // the driver-checked 100 TB CCNet path: the tercile cut must be
    // the bounded-state sketch aggregate — an exact `percentile` here
    // would buffer every distinct score in one task at corpus scale
    val s = graft.ops.TextOps.ccnetBucketsSketched(spark, sfDir, 1 << 17)
      .queryExecution.executedPlan.toString
    assert(!s.toLowerCase.contains("percentile"),
      s"ccnet sketched variant must not use the exact percentile:\n$s")
    assert(s.contains("quantile_sketch_agg"),
      s"KLL sketch aggregate missing from the plan:\n$s")
  }

  test("cell-co-partitioned self-joins run the corpus routing pass " +
      "once (AQE ReusedExchange)") {
    // the N×k argmin/topk routing pass feeds BOTH self-join sides
    // (and the census) in the SemDeDup/kNN-graph family. The plans
    // stay declarative — no eager localCheckpoint pinning corpus
    // payload in executor storage — so the single-pass guarantee
    // rests on AQE's exchange reuse. Assert it on the EXECUTED plan
    // (reuse only materializes at runtime under AQE).
    val fam = Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)](
      "emb_semdedup" -> (graft.ops.VectorOps.semDedup(_, _)),
      "emb_knn_graph" -> (graft.ops.VectorOps.knnGraph(_, _)),
      "emb_semdedup_probe" -> (graft.ops.VectorOps.semDedupProbe(_, _)),
      "emb_knn_graph_probe" -> (graft.ops.VectorOps.knnGraphProbe(_, _)),
      // the Lloyd objective: each iteration's assignment shuffle
      // feeds both the inertia and the moment aggregates
      "emb_kmeans_inertia" -> (graft.ops.VectorOps.kmeansInertia(_, _)))
    for ((name, fn) <- fam) {
      val df = fn(spark, sfDir)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("ReusedExchange"),
        s"$name: routing exchange not reused — the corpus-sized " +
          s"assignment pass would run per join side:\n$s")
    }
  }

  test("no query plan has an accidental join strategy") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val issues = Seq.newBuilder[String]
        if (plan.contains("CartesianProduct"))
          issues += s"$name: CartesianProduct"
        if (plan.contains("SortMergeJoin") && !smjAllowed(name))
          issues += s"$name: unexpected SortMergeJoin"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnlAllowed(name))
          issues += s"$name: unexpected BroadcastNestedLoopJoin"
        issues.result()
    }
    assert(bad.isEmpty, s"plan regressions:\n${bad.mkString("\n")}")
  }
}
