package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, TextOps, VectorOps}

class DedupSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  private lazy val nPlanted = graft.tables.Tables
    .documents(spark, sfDir).filter(col("doc_id") % 5 === 0).count()

  test("exact dedup finds exactly the planted duplicates") {
    val groups = DedupOps.exactDedup(spark, sfDir)
    assert(groups.count() === nPlanted)
    assert(groups.filter(col("n") =!= 2).count() === 0)
  }

  test("minhash LSH recovers every planted pair at jaccard 1.0") {
    val pairs = DedupOps.minhashLsh(spark, sfDir)
    val planted = pairs.filter(col("doc2") === col("doc1") + 1000000L)
    assert(planted.count() === nPlanted)
    assert(planted.filter(col("jaccard") < 1.0).count() === 0)
  }

  test("simhash gives planted pairs hamming distance 0") {
    val pairs = DedupOps.simhash(spark, sfDir)
    val planted = pairs.filter(col("doc2") === col("doc1") + 1000000L)
    assert(planted.count() === nPlanted)
    assert(planted.filter(col("hamming") =!= 0).count() === 0)
  }

  test("ngram jaccard ranks planted pairs on top") {
    val top = DedupOps.ngramJaccard(spark, sfDir).limit(10)
    assert(top.filter(col("jaccard") === 1.0).count() === 10)
  }

  test("fingerprint is deterministic and within the modulus") {
    val a = TextOps.fingerprint(spark, sfDir).collect()
    val b = TextOps.fingerprint(spark, sfDir).collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 2147483647L))
  }

  test("knn returns k neighbors per query with sims in [-1,1]") {
    val knn = VectorOps.knnBrute(spark, sfDir)
    val perQuery = knn.groupBy("qid").count()
    assert(perQuery.filter(col("count") =!= 5).count() === 0)
    assert(knn.filter(col("sim") > 1.0001 || col("sim") < -1.0001)
      .count() === 0)
  }

  test("IVF candidates agree with brute force on their cells") {
    val brute = VectorOps.knnBrute(spark, sfDir)
      .select(col("qid"), col("neighbor"))
    val ivf = VectorOps.knnIvf(spark, sfDir)
      .select(col("qid"), col("neighbor"))
    // IVF searches 4 of 16 cells: expect meaningful overlap, not parity
    val overlap = ivf.intersect(brute).count()
    assert(overlap >= 10, s"IVF∩brute=$overlap of 50 — recall collapsed")
  }

  test("PQ search retains recall against brute force") {
    // ADC distances are lossy (16 sub-centroids per subspace), so
    // expect overlap with the exact top-5, not parity — a collapse to
    // near-zero overlap means the codebook or table lookup broke
    val brute = VectorOps.knnBrute(spark, sfDir)
      .select(col("qid"), col("neighbor"))
    val pq = VectorOps.knnPq(spark, sfDir)
      .select(col("qid"), col("neighbor"))
    val overlap = pq.intersect(brute).count()
    assert(overlap >= 5, s"PQ∩brute=$overlap of 50 — recall collapsed")
    // every query answered with a full top-5
    assert(pq.groupBy("qid").count().filter(col("count") =!= 5)
      .count() === 0)
  }

  test("chunk dedup sees every planted doc's passages exactly twice") {
    // every chunk of a planted-dup doc exists in both copies, so each
    // surviving digest must report n_docs = n_occ = 2 unless the same
    // passage also occurs elsewhere (n_docs > 2 is possible, < 2 is
    // not — the filter guarantees it); and a planted doc's FIRST
    // chunk digest must be among the survivors
    val out = DedupOps.chunkDedup(spark, sfDir)
    assert(out.count() > 0)
    assert(out.filter(col("n_docs") < 2).count() === 0)
    assert(out.filter(col("n_occ") < col("n_docs")).count() === 0)
    // a planted doc's first passage digests identically here and in
    // the operator, and it IS one of the duplicated digests (whether
    // it survives the top-200 cut depends on h-order among the
    // n_docs=2 ties, so assert against the unlimited candidate set)
    val firstChunk = graft.tables.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0)
      .select(md5(concat_ws(" ",
        slice(split(trim(col("text")), " "), 1, 20))).as("h"))
      .limit(1).collect().head.getString(0)
    val dupDigests = DedupOps.corpus(spark, sfDir)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0,
             cast(ceil(size(split(trim(text), ' ')) / 20.0) as int) - 1),
             i -> md5(concat_ws(' ',
               slice(split(trim(text), ' '), i * 20 + 1, 20))))"""))
        .as("h"))
      .groupBy("h").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2)
    assert(dupDigests.filter(col("h") === firstChunk).count() === 1)
  }

  test("span dedup: coverage invariants hold and planted copies are " +
      "fully covered") {
    val out = DedupOps.spanDedup(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // spans are maximal and non-overlapping by construction, so the
    // covered-word total can never exceed the document
    assert(out.filter(col("dup_words") > col("n_words")).count() === 0)
    assert(out.filter(col("longest_span") > col("dup_words")).count() === 0)
    assert(out.filter(col("n_spans") < 1).count() === 0)
    // a planted full copy duplicates EVERY 10-word window of its
    // source, so some doc must show full coverage (dup_words ==
    // n_words) — and the top-ranked docs are exactly such docs
    assert(rows.exists(r => r.getLong(4) === r.getLong(1)))
  }

  test("bloom probe: zero false negatives, bounded false positives") {
    val rows = DedupOps.bloomDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // a Bloom filter can NEVER miss a true member, so every true dup
    // is flagged: flagged − false_pos == true_dup in every stratum
    rows.foreach { r =>
      val (flagged, trueDup, falsePos) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(flagged - falsePos === trueDup,
        s"false negative in ${r.getString(0)}")
    }
    val probed = rows.map(_.getLong(1)).sum
    val fp = rows.map(_.getLong(4)).sum
    assert(fp.toDouble / probed < 0.5,
      s"false-positive rate ${fp.toDouble / probed} implausibly high")
    // and the planted copies guarantee the true-dup signal exists
    assert(rows.map(_.getLong(3)).sum > 0)
  }

  test("winnowing density sits in the guaranteed band") {
    val rows = TextOps.winnow(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // each selection serves at most w windows, so density ≥ ~1/w even
    // on degenerate text, and ≤ 1 by construction; random hashes give
    // the classic 2/(w+1) = 0.4 expectation
    rows.foreach { r =>
      val (m, fps) = (r.getLong(1), r.getLong(2))
      assert(fps >= 1 && fps <= m)
    }
    val density = rows.map(_.getLong(2)).sum.toDouble /
      rows.map(_.getLong(1)).sum
    assert(density > 0.2 && density < 0.75,
      s"winnowing density $density outside the plausible band")
  }

  test("winnowing overlap ranks planted full copies with complete " +
      "fingerprint agreement") {
    val rows = TextOps.winnowOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // shared fingerprints can never exceed either side's count
    rows.foreach { r =>
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
    }
    // a planted full copy shares its source's entire fingerprint set
    val planted = rows.filter(r => r.getLong(1) === r.getLong(0) + 1000000L)
    assert(planted.nonEmpty, "no planted pair surfaced in the top-50")
    planted.foreach { r =>
      assert(r.getLong(2) === r.getLong(3) && r.getLong(3) === r.getLong(4))
    }
  }

  test("semdedup drops every planted exact copy, keep-first") {
    val out = VectorOps.semDedup(spark, sfDir)
    val rows = out.collect()
    assert(rows.length <= 16)
    // census arithmetic: kept + dropped == total per cell
    assert(out.filter(col("n_kept") + col("n_dropped") =!= col("n_vecs"))
      .count() === 0)
    // every planted copy (vec_id + 1e6) shares its source's embedding:
    // same cell, cosine 1.0, higher id — all must be dropped
    val nPlantedVecs = graft.tables.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 50 === 0).count()
    val totalDropped = rows.map(_.getLong(2)).sum
    assert(totalDropped >= nPlantedVecs)
    // corpus conservation: cells partition the corpus
    val corpusSize = graft.tables.Tables.embeddings(spark, sfDir).count() +
      nPlantedVecs
    assert(rows.map(_.getLong(1)).sum === corpusSize)
  }

  test("containment keep-best collapses the planted fragments that " +
      "survive exact + LSH") {
    val rows = DedupOps.containmentKeepBest(spark, sfDir).collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2) + r.getLong(3),
      s"census arithmetic broken: $r"))
    val frag = rows.map(_.getLong(4)).sum
    val dropped = rows.map(_.getLong(5)).sum
    assert(frag > 0, "no planted fragments in the corpus")
    // stage 3 must collapse (nearly) all of them — the stragglers are
    // short docs below the MinSharedShingles candidate gate
    assert(dropped >= frag * 9 / 10,
      s"only $dropped of $frag planted fragments collapsed")
    // and WITHOUT the containment edges they are structurally
    // invisible: no exact digest match, Jaccard ≈ 0.5 under every LSH
    // operating point — the stage-1+2 graph connects almost none
    val reachable = DedupOps.dupLabelsOf(
        DedupOps.containmentCorpus(spark, sfDir))
      .filter(col("id") >= 2000000L).count()
    assert(reachable <= frag / 4,
      s"$reachable of $frag fragments already connected without stage 3")
  }

  test("semdedup boundary probe: drops a superset of the cell-local " +
      "pass, census arithmetic intact") {
    val local = VectorOps.semDedup(spark, sfDir).collect()
    val out = VectorOps.semDedupProbe(spark, sfDir)
    val rows = out.collect()
    // same census frame: primary cells partition the corpus
    assert(rows.map(_.getLong(0)).toSeq === local.map(_.getLong(0)).toSeq)
    assert(rows.map(_.getLong(1)).toSeq === local.map(_.getLong(1)).toSeq,
      "probe census must stay keyed by the primary assignment")
    assert(out.filter(col("n_kept") + col("n_dropped") =!= col("n_vecs"))
      .count() === 0)
    // the probed candidate set contains the cell-local one, so drops
    // can only grow — the boundary gain is the delta
    assert(rows.map(_.getLong(2)).sum >= local.map(_.getLong(2)).sum,
      "2-probe pass dropped fewer vectors than the cell-local pass")
    // planted exact copies still all drop (same cell, cosine 1)
    val nPlanted = graft.tables.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 50 === 0).count()
    assert(rows.map(_.getLong(2)).sum >= nPlanted)
  }

  test("semdedup clusters: component arithmetic brackets the " +
      "pairwise drops, planted copies all co-cluster") {
    val rows = VectorOps.semDedupClusters(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, s"singleton component emitted: $r")
      assert(r.getLong(0) === r.getLong(2),
        s"cluster label must be the component min: $r")
      assert(r.getLong(2) < r.getLong(3))
    }
    // disjoint components: every planted (v, v+1e6) exact pair is
    // edge-connected (cosine 1 in the shared cell), so total
    // membership covers at least both ends of every planted pair
    val nPlanted = graft.tables.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 50 === 0).count()
    assert(rows.map(_.getLong(1)).sum >= 2 * nPlanted)
    // bracket the pairwise drop census: each component drops at most
    // size-1 (keep-first) and at least 1 (its max member always has a
    // lower-id tau-neighbor)
    val drops = VectorOps.semDedupProbe(spark, sfDir).collect()
      .map(_.getLong(2)).sum
    assert(drops <= rows.map(_.getLong(1) - 1).sum,
      "more pairwise drops than non-min component members")
    assert(drops >= rows.length,
      "fewer drops than components — some component dropped nothing")
  }

  test("knn graph probe: full coverage, edges never worse than the " +
      "cell-local graph") {
    val local = VectorOps.knnGraph(spark, sfDir).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val g = VectorOps.knnGraphProbe(spark, sfDir).collect()
    assert(g.map(_.getLong(1)).distinct.length === g.length)
    g.foreach { r =>
      assert(r.getLong(1) !== r.getLong(2), s"self loop: $r")
      assert(r.getDouble(3) >= -1.0001 && r.getDouble(3) <= 1.0001)
      // candidates(2-probe) ⊇ candidates(local): the argmax sim can
      // only improve for any vector covered by both graphs
      for (ls <- local.get(r.getLong(1)))
        assert(r.getDouble(3) >= ls,
          s"probe edge worse than local for ${r.getLong(1)}: $r vs $ls")
    }
    assert(g.length >= local.size,
      "probing a second cell cannot un-cover a vector")
  }

  test("semdedup drop-recall audit: planted ground truth caught in " +
      "full, probe2 dominates") {
    val rows = VectorOps.semDedupRecall(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("cell_local", "probe2"))
    val Array(lo, pr) = rows
    val nPlanted = graft.tables.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 50 === 0).count()
    // the planted copies anchor the denominator at every scale
    assert(lo.getLong(2) >= nPlanted, s"droppable below planted: $lo")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "caught must be ⊆ droppable")
      assert(r.getLong(2) <= r.getLong(1))
    }
    // an exact copy shares its original's cell by the deterministic
    // tie-break — a recall below 1.0 on the planted set means the
    // routing regressed into splitting dup pairs across cells
    assert(lo.getDouble(4) === 1.0,
      s"cell-local pass lost planted exact dups: $lo")
    assert(pr.getLong(3) >= lo.getLong(3))
    assert(pr.getDouble(4) >= lo.getDouble(4))
  }

  test("k-edge knn graph: contiguous ranks, sims non-increasing, " +
      "rank-1 equals the single-edge graph") {
    val g = VectorOps.knnGraphTopK(spark, sfDir).collect()
    val single = VectorOps.knnGraphProbe(spark, sfDir).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    val byVec = g.groupBy(_.getLong(1))
    assert(byVec.nonEmpty)
    byVec.foreach { case (v, rows) =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq === (1 to rows.length),
        s"ranks not contiguous for $v")
      assert(rows.length <= 5)
      val sims = sorted.map(_.getDouble(4))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"sims increase along ranks for $v")
      // the k-edge graph's best edge IS the single-edge graph's edge
      assert(single(v) === ((sorted.head.getLong(3),
        sorted.head.getDouble(4))), s"rank-1 edge diverges for $v")
    }
  }

  test("knn graph recall audit: probe2 dominates cell_local on every " +
      "metric") {
    val rows = VectorOps.knnGraphRecall(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("cell_local", "probe2"))
    val Array(lo, pr) = rows
    assert(lo.getLong(1) === pr.getLong(1), "same anchor set")
    assert(lo.getLong(1) > 0, "anchor sample must be non-empty")
    // superset candidates: edge coverage, NN hits, recall and the
    // kept-similarity fraction are all monotone under the 2nd probe
    assert(pr.getLong(2) >= lo.getLong(2))
    assert(pr.getLong(3) >= lo.getLong(3))
    assert(pr.getDouble(4) >= lo.getDouble(4))
    assert(pr.getDouble(5) >= lo.getDouble(5))
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "more NN hits than edges")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) <= 1.000001,
        "an edge cannot beat the exact nearest neighbor")
    }
  }

  test("graph probe curve: metrics monotone in depth, rows 1/2 equal " +
      "the recall audit's") {
    val curve = VectorOps.knnGraphProbeCurve(spark, sfDir).collect()
    assert(curve.map(_.getInt(0)).toSeq === Seq(1, 2, 4))
    // superset candidates at every deeper probe: all metrics monotone
    for (Array(a, b) <- curve.sliding(2)) {
      assert(b.getLong(2) >= a.getLong(2))
      assert(b.getLong(3) >= a.getLong(3))
      assert(b.getDouble(4) >= a.getDouble(4))
      assert(b.getDouble(5) >= a.getDouble(5))
    }
    // depths 1 and 2 ARE the recall audit's cell_local/probe2 rows
    val audit = VectorOps.knnGraphRecall(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val c12 = curve.take(2)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(c12.toSeq === audit.toSeq,
      "curve depths 1/2 diverge from the recall audit")
  }

  test("token entropy bounds: 0 ≤ H ≤ ln(n), 0 < TTR ≤ 1, full census") {
    val rows = TextOps.tokenEntropy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (avgH, avgTtr) = (r.getDouble(3), r.getDouble(4))
      // vocab is a few dozen tokens → ln(vocab) < 6 bounds any doc
      assert(avgH >= 0.0 && avgH < 6.0, s"entropy $avgH out of range")
      assert(avgTtr > 0.0 && avgTtr <= 1.0, s"ttr $avgTtr out of range")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
    }
    // every document carries ≥1 token, so the census is complete
    val nDocs = graft.tables.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
  }

  test("RFM segments partition the user census with scores in 1..4") {
    import graft.ops.EventOps
    val rows = EventOps.eventsRfm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(r.getLong(0), r.getLong(1), r.getLong(2)).foreach(s =>
        assert(s >= 1 && s <= 4, s"score $s outside 1..4"))
    }
    val ev = graft.tables.Tables.events(spark, sfDir)
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(3)).sum === nUsers)
    // exact cents conservation across segments
    val totalCents = ev
      .select(floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .agg(sum("c")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(4)).sum === totalCents)
  }

  test("SQ8 kNN: 5 ranked neighbors per query, distances monotone, " +
      "and high recall vs exact L2") {
    val rows = VectorOps.knnSq8(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === 10 && byQ.values.forall(_.length === 5))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq === (1L to 5L))
      val dists = sorted.map(_.getLong(2))
      assert(dists.forall(_ >= 0))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b },
        "idist not monotone in rank")
    }
    // 8-bit scalar quantization preserves L2 geometry almost exactly:
    // the exact-L2 top-5 (same tie-break) must overlap strongly
    import org.apache.spark.sql.expressions.Window
    val e = graft.tables.Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("l2"), col("vec_id"))
    val exact = e.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        expr("aggregate(zip_with(qv, embedding, (x, y) -> " +
          "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
          "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, " +
          "(acc, v) -> acc + v)").as("l2"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"SQ8 recall vs exact L2 only $recall")
  }

  test("survival funnel: stages monotone, exact stage counts planted " +
      "dups, leaked eval copies die at decontamination") {
    val rows = DedupOps.survivalFunnel(spark, sfDir).collect()
    val docs = graft.tables.Tables.documents(spark, sfDir)
    // per source, every stage (domain gate and the r12 classifier
    // gate included) can only shrink
    rows.foreach { r =>
      val chain = (1 to 7).map(r.getLong)
      assert(chain.zip(chain.tail).forall { case (a, b) => a >= b },
        s"non-monotone funnel for ${r.getString(0)}: $chain")
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0)
    }
    // stage 0 drops exactly the blocklisted-bucket docs
    val blocked = expr("cast(doc_id % 1000000 % 37 as int) % 11 = 3")
    val corpus0 = DedupOps.corpus(spark, sfDir)
      .filter(col("doc_id") >= 10)
    assert(rows.map(r => r.getLong(1) - r.getLong(2)).sum
      === corpus0.filter(blocked).count())
    // exact stage drops exactly the planted copies whose original
    // also survived stage 0 (same derived domain, so same verdict)
    val plantedWithOriginal = docs
      .filter(col("doc_id") % 5 === 0 && col("doc_id") >= 10 && !blocked)
      .count()
    assert(rows.map(r => r.getLong(2) - r.getLong(3)).sum
      === plantedWithOriginal)
    // the two leaked eval copies (planted ids 1000000/1000005) slip
    // past exact dedup (originals excluded) but must die by the
    // decontamination stage: clean strictly below quality overall
    assert(rows.map(_.getLong(6)).sum < rows.map(_.getLong(5)).sum)
  }

  test("token funnel: same gates as the doc funnel, token mass " +
      "conserved at the raw stage, stages monotone") {
    val tok = DedupOps.funnelTokens(spark, sfDir).collect()
    val doc = DedupOps.survivalFunnel(spark, sfDir).collect()
    assert(tok.map(_.getString(0)).toSeq ===
      doc.map(_.getString(0)).toSeq, "same source universe")
    tok.foreach { r =>
      val chain = (1 to 7).map(r.getLong)
      assert(chain.zip(chain.tail).forall { case (a, b) => a >= b },
        s"non-monotone token funnel for ${r.getString(0)}: $chain")
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0)
    }
    // raw token mass ties out against a direct corpus census
    val direct = DedupOps.corpus(spark, sfDir)
      .filter(col("doc_id") >= 10)
      .groupBy("source")
      .agg(sum(expr(
        "size(filter(split(lower(text), ' '), x -> x <> ''))")
        .cast("bigint")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    tok.foreach(r => assert(r.getLong(1) === direct(r.getString(0)),
      s"raw token mass diverges for ${r.getString(0)}"))
  }

  test("bpe vocab: full-census mass conserves bpe_train's final " +
      "symbol total and the last winner ships as a symbol") {
    import graft.ops.TextOps
    val vocab = TextOps.bpeVocab(spark, sfDir).collect()
    assert(vocab.map(_.getLong(0)).toSeq ===
      (1L to vocab.length).toSeq, "ranks contiguous")
    val train = TextOps.bpeTrain(spark, sfDir).collect()
    // the round-8 sentinel cannot be consumed by a later merge, so
    // the final winner's display must ship as a vocabulary symbol
    val lastDisp = train.last.getString(1)
    assert(vocab.exists(_.getString(1) === lastDisp),
      s"final merge $lastDisp missing from the shipped vocabulary")
    // when the symbol alphabet fits inside the top-50 the census is
    // COMPLETE, and total mass must equal the training loop's
    // post-merge symbol count (theorem: both count the same stream)
    if (vocab.length < 50) {
      assert(vocab.map(_.getLong(2)).sum === train.last.getLong(3),
        "vocabulary mass must equal bpe_train's final total_symbols")
    }
  }

  test("funnel classifier gate consumes doc_nb_lang's model: the " +
      "gate's per-doc verdicts reproduce the confusion diagonal") {
    import graft.ops.TextOps
    val docs = graft.tables.Tables.documents(spark, sfDir)
    // the SAME serve path the funnel's stage 5 calls, run over the
    // classifier's own training corpus, must reproduce doc_nb_lang's
    // confusion matrix cell for cell — proving the funnel gate and
    // the audit share one model and one argmax rule
    val viaGate = TextOps
      .nbPredictionsFor(spark, sfDir,
        docs.select("doc_id", "lang", "text"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")
      .collect().toSeq
    val confusion = TextOps.nbLang(spark, sfDir).collect().toSeq
    assert(viaGate === confusion,
      "funnel gate predictions diverge from the nb_lang confusion matrix")
    // and the funnel's classifier stage is a real filter on this
    // corpus: it keeps most of stage-4 but not all of it (the NB
    // accuracy is < 1.0, so SOME surviving doc must be re-routed)
    val rows = graft.ops.DedupOps.survivalFunnel(spark, sfDir).collect()
    val clean = rows.map(_.getLong(6)).sum
    val lang = rows.map(_.getLong(7)).sum
    assert(lang <= clean, "gate must only shrink")
    val diagAcc = {
      val tot = confusion.map(_.getLong(2)).sum.toDouble
      val diag = confusion.filter(r => r.getString(0) == r.getString(1))
        .map(_.getLong(2)).sum.toDouble
      diag / tot
    }
    if (diagAcc < 1.0)
      assert(lang < clean,
        s"NB accuracy is $diagAcc yet the funnel gate dropped nothing")
  }

  test("domain census: deterministic derivation, blocklist share " +
      "near 4/37, dup ratios >= 1") {
    val rows = DedupOps.domainCensus(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).matches(".+-\\d+\\.(com|org|net)"),
        s"malformed domain: $r")
      assert(r.getLong(2) >= r.getLong(3), s"more uniques than docs: $r")
      assert(r.getDouble(4) >= 1.0)
    }
    // census conserves the corpus
    val n = DedupOps.corpus(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum === n)
    // the blocklist rule hits 4 of the 37 buckets — the blocked doc
    // share must sit near 4/37 (exact share depends on id spacing)
    val bShare = rows.filter(_.getBoolean(1)).map(_.getLong(2)).sum.toDouble / n
    assert(bShare > 0.04 && bShare < 0.2, s"blocklist share $bShare")
  }

  test("path analysis: well-formed trigrams ranked by count") {
    import graft.ops.EventOps
    val rows = EventOps.eventsPaths(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getString(0).count(_ == '>') === 2,
        s"malformed path ${r.getString(0)}")
      assert(r.getLong(1) > 0)
    }
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      "counts not ranked descending")
  }

  test("mixture weights: shares each sum to ~1, weights consistent") {
    val rows = TextOps.mixWeights(spark, sfDir).collect()
    val nSources = graft.tables.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(rows.length === nSources)
    val actual = rows.map(_.getDouble(3)).sum
    val target = rows.map(_.getDouble(4)).sum
    assert(math.abs(actual - 1.0) < 1e-3, s"actual shares sum $actual")
    assert(math.abs(target - 1.0) < 1e-3, s"target shares sum $target")
    rows.foreach { r =>
      assert(r.getDouble(5) > 0)
      // weight is the ratio of the two rounded shares
      assert(math.abs(r.getDouble(5)
        - r.getDouble(4) / r.getDouble(3)) < 1e-3)
    }
  }

  test("zipf slope: negative power-law fit over the top ranks") {
    val r = TextOps.zipfSlope(spark, sfDir).collect()
    assert(r.length === 1)
    // the fit covers min(vocabulary, 100) ranks — the test corpus's
    // word-soup vocabulary is tiny
    assert(r(0).getLong(0) >= 10L && r(0).getLong(0) <= 100L)
    val slope = r(0).getDouble(1)
    // frequency must FALL with rank; the synthetic word-soup corpus is
    // flatter than a natural −1 but the sign is structural
    assert(slope < 0, s"zipf slope must be negative, got $slope")
    assert(slope > -3, s"implausible slope $slope")
  }

  test("bm25: 8 anchor queries, self-excluded, scores positive and " +
      "non-increasing within each query") {
    val rows = TextOps.bm25TopK(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 8L).toSet)
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq ===
        (1L to sorted.length).toSeq, s"ranks not contiguous for $qid")
      assert(sorted.length <= 5)
      sorted.foreach { r =>
        assert(r.getLong(2) !== qid, "self-retrieval must be excluded")
        assert(r.getDouble(3) > 0, s"BM25 score must be positive: $r")
      }
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"scores not non-increasing for $qid")
    }
  }

  test("bm25 impact cap: pruned scores never exceed full scores on " +
      "shared pairs, recall audit well-formed") {
    val full = TextOps.bm25TopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val pruned = TextOps.bm25Pruned(spark, sfDir).collect()
    pruned.foreach { r =>
      full.get((r.getLong(0), r.getLong(2))).foreach { fs =>
        // a doc surviving the cap on every matched term scores
        // identically; a partially-capped doc can only score LOWER
        assert(r.getDouble(3) <= fs + 1e-9,
          s"pruned score above full for $r (full $fs)")
      }
    }
    val rec = TextOps.bm25Recall(spark, sfDir).collect()
    assert(rec.map(_.getLong(0)).toSet === (0L until 8L).toSet)
    rec.foreach { r =>
      val (hits, k) = (r.getLong(1), r.getLong(2))
      assert(k === 5 && hits >= 0 && hits <= k)
      assert(r.getDouble(3) === math.rint(hits * 10000.0 / k) / 10000.0)
    }
  }

  test("bpe pairs: 50 two-char pairs, weights non-increasing, " +
      "every weight covers its type count") {
    val rows = TextOps.bpePairs(spark, sfDir).collect()
    assert(rows.length === 50)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 50L).toSeq)
    val ws = rows.map(_.getLong(2))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getString(1).length === 2, s"not a char pair: $r")
      // each contributing token type occurs ≥1 time with count ≥1
      assert(r.getLong(2) >= r.getLong(3), s"weight < type count: $r")
      assert(r.getLong(3) >= 1)
    }
  }

  test("bpe merge step: the winning pair is fully consumed and " +
      "merged-symbol pairs appear") {
    val first = TextOps.bpePairs(spark, sfDir).collect()
    val winner = first.head.getString(1) // rank 1 = (weight desc, pair)
    val second = TextOps.bpeMergeStep(spark, sfDir).collect()
    assert(second.length === 20)
    assert(second.map(_.getLong(0)).toSeq === (1L to 20L).toSeq)
    val pairs = second.map(_.getString(1))
    // replace() removes every non-overlapping occurrence and the
    // sentinel can't spell the pair by juxtaposition, so the winner
    // must be gone as a plain character pair
    assert(!pairs.contains(s"${winner(0)}+${winner(1)}"),
      s"winner $winner survived its own merge")
    assert(pairs.exists(_.contains(s"[$winner]")),
      "no pair involves the merged symbol")
    val ws = second.map(_.getLong(2))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }

  test("refined search dominates raw IVF+PQ recall on every query") {
    val raw = VectorOps.annRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = VectorOps.refineRecall(spark, sfDir).collect()
    assert(ref.length === raw.size)
    ref.foreach { r =>
      // a true top-5 neighbor inside the 20-candidate set can only be
      // displaced by a globally-nearer vector, so per-query refined
      // hits >= raw hits is an invariant, not a tendency
      assert(r.getLong(1) >= raw(r.getLong(0)),
        s"refine lost a hit ivfpq had: $r vs raw ${raw(r.getLong(0))}")
    }
    // the refined top-5 comes from the candidate set with exact
    // cosine, so its rows carry sims in [-1, 1]
    VectorOps.knnRefine(spark, sfDir).collect().foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9, s"bad sim: $r")
    }
    // the depth curve: recall non-decreasing in depth, depth-20 row
    // equals the refine audit's total by construction
    val curve = VectorOps.refineDepthCurve(spark, sfDir).collect()
    assert(curve.map(_.getLong(0)).toSeq === Seq(5L, 10L, 20L, 40L))
    val recalls = curve.map(_.getDouble(3))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in depth: ${recalls.toSeq}")
    assert(curve(2).getLong(1) === ref.map(_.getLong(1)).sum,
      "depth-20 hits must equal the refine audit's total")
  }

  test("prototype prune: keeps exactly the hardest ceil(n/2) per " +
      "cell, kept strictly harder than dropped on average") {
    val rows = VectorOps.prototypePrune(spark, sfDir).collect()
    val n = graft.tables.Tables.embeddings(spark, sfDir).count()
    val k = VectorOps.derivedK(n)
    assert(rows.map(_.getLong(0)).forall(c => c >= 0 && c < k),
      s"cells must come from the k ∝ N codebook (k=$k)")
    assert(rows.map(_.getLong(1)).sum === n,
      "cells must partition the corpus")
    rows.foreach { r =>
      val (nv, nk) = (r.getLong(1), r.getLong(2))
      assert(nk === (nv + 1) / 2, s"keep quota violated: $r")
      val cut = r.getDouble(3)
      val keptMean = r.getDouble(4)
      // kept side ranks cosine ASC (hardest first): its mean sits at
      // or below the boundary cosine
      assert(keptMean <= cut + 1e-6, s"kept mean above the cut: $r")
      if (!r.isNullAt(5)) {
        val dropMean = r.getDouble(5)
        assert(dropMean >= cut - 1e-6, s"drop mean below the cut: $r")
        assert(keptMean < dropMean,
          s"kept must be harder (lower cos) than dropped: $r")
      }
    }
  }

  test("bigram logprob: per-source averages bounded by the model") {
    val rows = TextOps.bigramLogprob(spark, sfDir).collect()
    val nSources = graft.tables.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(rows.length === nSources)
    rows.foreach { r =>
      val avg = r.getDouble(3)
      // interpolated probability is ≤1 and ≥0.3·min unigram mass, so
      // the per-token average sits strictly inside (−ln(tot/0.3), 0)
      assert(avg < 0, s"avg bigram logprob must be negative: $r")
      assert(avg > -20, s"implausible logprob: $r")
    }
  }

  test("dsir weights: en-slice target upweights en docs vs the corpus") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val perDocAvg = TextOps.dsirWeights(spark, sfDir).collect()
    assert(perDocAvg.length ===
      docs.select("source").distinct().count())
    // upweighted counts are bounded by source size
    perDocAvg.foreach(r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)))
  }

  test("pq distortion: 8 subspaces, centroids reconstruct themselves") {
    val rows = VectorOps.pqDistortion(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq === (0 to 7))
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= r.getDouble(3),
        s"mse must sit in [0, max]: $r")
      assert(r.getLong(4) >= 1 && r.getLong(4) <= 16, s"codes_used: $r")
    }
    // every vector's min distance is ≤ its distance to centroid 0, and
    // the 16 codebook vectors themselves have distance exactly 0 — so
    // each subspace's mse is strictly below the corpus variance scale
    assert(rows.map(_.getDouble(2)).max < 10.0)
  }

  test("dim stats: 64 dims, variance nonnegative, range brackets mean") {
    val rows = VectorOps.dimStats(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 63L))
    val n = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) === n, "every dim sees every vector")
      assert(r.getDouble(3) >= 0, s"negative variance: $r")
      assert(r.getDouble(4) <= r.getDouble(2) &&
        r.getDouble(2) <= r.getDouble(5),
        s"mean outside [min,max]: $r")
    }
  }

  test("dim corr: a planted constant dimension cannot flood the top-20") {
    // a zero-variance dimension has no defined correlation (0/0 →
    // NaN, which sorts ABOVE every real |corr|); the guard must drop
    // its pairs entirely rather than rank them
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dimcorr").toString
    val rnd = new scala.util.Random(7)
    (0L until 40L).map { id =>
      val v = Array.tabulate(6)(d =>
        if (d == 3) 2.5f else rnd.nextFloat())
      (id, v, (id % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val rows = VectorOps.dimCorr(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) != 3L && r.getLong(1) != 3L,
        s"constant dim 3 must not appear: $r")
      assert(!r.getDouble(2).isNaN, s"NaN corr leaked: $r")
    }
    // 6 dims minus the constant one → C(5,2)=10 pairs survive
    assert(rows.length === 10)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  test("conversion lag: buckets in range, shares sum to 100") {
    val rows = graft.ops.EventOps.eventsConversionLag(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 14, s"bucket: $r")
      assert(r.getLong(1) > 0)
    }
    assert(math.abs(rows.map(_.getDouble(2)).sum - 100.0) < 0.01,
      "per-bucket shares must sum to 100%")
    assert(math.abs(rows.last.getDouble(3) - 100.0) < 0.01,
      "cumulative share must end at 100%")
    val cums = rows.map(_.getDouble(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b },
      "cumulative share must be monotone")
  }

  test("ngram coverage: planted-duplicate eval docs are fully covered") {
    val rows = DedupOps.ngramCoverage(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"covered > total: $r")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 100)
    }
    // every doc_id % 5 == 0 has a verbatim copy planted at
    // doc_id + 1000000 in the training split, so eval docs 0 and 5
    // must be 100% covered
    rows.filter(r => r.getLong(0) % 5 == 0).foreach(r =>
      assert(r.getDouble(3) === 100.0,
        s"planted-copy eval doc not fully covered: $r"))
  }

  test("label margin: one row per label pair, cosines in [-1,1]") {
    val rows = VectorOps.labelMargin(spark, sfDir).collect()
    val labels = graft.tables.Tables.embeddings(spark, sfDir)
      .select("label").distinct().count().toInt
    assert(rows.length === labels * (labels - 1) / 2)
    rows.foreach { r =>
      assert(r.getInt(0) < r.getInt(1), s"unordered pair: $r")
      val c = r.getDouble(4)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cosine range: $r")
      assert(r.getLong(2) > 0 && r.getLong(3) > 0)
    }
  }

  test("dedup inflation: planted duplicates inflate every fifth source") {
    val rows = DedupOps.dedupInflation(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"unique > raw docs: $r")
      assert(r.getLong(4) <= r.getLong(3), s"unique > raw tokens: $r")
      assert(r.getDouble(5) >= 1.0, s"inflation below 1: $r")
    }
    // the corpus() union duplicates every doc_id % 5 == 0, so at
    // least one source must show inflation strictly above 1
    assert(rows.exists(_.getDouble(5) > 1.0), "no inflation anywhere")
  }

  test("power law: one-row Hill estimate over at most 100 exceedances") {
    val r = graft.ops.EventOps.eventsPowerLaw(spark, sfDir).collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) >= 1 && r(0).getLong(0) <= 100)
    assert(r(0).getLong(1) >= 1)
    if (!r(0).isNullAt(2)) assert(r(0).getDouble(2) > 0)
  }

  test("centroid shift: 16 cells partition the corpus, shifts finite") {
    val rows = VectorOps.centroidShift(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 15L))
    val n = graft.tables.Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum === n,
      "cell members must partition the corpus exactly")
    rows.foreach(r => assert(r.getDouble(2) >= 0 && r.getDouble(2) < 10,
      s"implausible shift: $r"))
  }

  test("kmeans train: three iterations partition the corpus and " +
      "iteration-1 movement matches the one-step census") {
    val rows = VectorOps.kmeansTrain(spark, sfDir).collect()
    val n = graft.tables.Tables.embeddings(spark, sfDir).count()
    val byIter = rows.groupBy(_.getInt(0))
    assert(byIter.keySet === Set(1, 2, 3))
    byIter.foreach { case (it, rs) =>
      assert(rs.map(_.getLong(2)).sum === n,
        s"iteration $it members must partition the corpus")
      rs.foreach(r => assert(r.getDouble(3) >= 0 && r.getDouble(3) < 10,
        s"implausible shift: $r"))
    }
    // iteration 1 IS centroidShift's census (same seeds, same update):
    // the training loop's first rung ties out with the one-step op.
    // Memberships match exactly; shifts to 1e-5 (the loop rounds
    // components at the iteration boundary, the one-step op doesn't)
    val one = VectorOps.centroidShift(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val it1 = byIter(1)
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(it1.keySet === one.keySet)
    it1.foreach { case (cid, (nm, sh)) =>
      assert(nm === one(cid)._1, s"members diverge at cell $cid")
      assert(math.abs(sh - one(cid)._2) <= 1e-5,
        s"iteration-1 shift diverges from centroid_shift at cell $cid")
    }
    // Lloyd guarantees the OBJECTIVE is non-increasing (covered by
    // the inertia test), not per-iteration movement mass — movement
    // monotonicity is empirical on this corpus, so assert it loosely
    // (<= + eps) rather than strictly, to survive a regenerated
    // corpus or seed change with no code bug
    val tot = (i: Int) => byIter(i).map(_.getDouble(3)).sum
    assert(tot(3) <= tot(1) + 1e-9,
      s"codebook must settle: ${tot(1)} -> ${tot(2)} -> ${tot(3)}")
  }

  test("codebook recall: both rungs grade the same truth and the " +
      "trained search is a valid ranked result") {
    val rows = VectorOps.codebookRecall(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("seed", "trained"))
    rows.foreach { r =>
      assert(r.getLong(2) === 50L, "10 queries x 5 truth rows")
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 50)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // no direction assertion: on isotropic data Lloyd BALANCES cells,
    // which can shrink the corpus fraction 4 probes reach — the audit
    // measures the tradeoff, it doesn't presume a winner
    val ts = VectorOps.knnTrained(spark, sfDir).collect()
    val byQ = ts.groupBy(_.getLong(0))
    assert(byQ.size === 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 5, s"query $q")
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      sims.sliding(2).foreach(p => assert(p(0) >= p(1), s"order in $q"))
    }
  }

  test("kmeans inertia: the Lloyd objective never increases across " +
      "iterations") {
    val rows = VectorOps.kmeansInertia(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    val n = graft.tables.Tables.embeddings(spark, sfDir).count()
    rows.foreach(r => assert(r.getLong(1) === n,
      "every vector is assigned every iteration"))
    // Lloyd's monotonicity theorem, with slack for the 6-decimal
    // centroid rounding at iteration boundaries (perturbs distances
    // by ~1e-6 per dim; a real regression moves inertia by whole
    // units on this corpus)
    val in = rows.map(_.getDouble(2))
    in.sliding(2).foreach(p => assert(p(1) <= p(0) + 1e-3,
      s"objective rose: ${in.mkString(" -> ")}"))
    assert(in.last < in.head, "three iterations must make progress")
  }

  test("bpe train: eight rounds compress monotonically and round 1 " +
      "is bpe_pairs' winner") {
    val rows = graft.ops.TextOps.bpeTrain(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 8L))
    // THEOREM: the winner merges at least one occurrence per round,
    // so the corpus symbol count strictly falls every round
    val totals = rows.map(_.getLong(3))
    totals.sliding(2).foreach(p =>
      assert(p(0) > p(1), s"no compression: ${totals.mkString(",")}"))
    rows.foreach(r => assert(r.getLong(2) > 0, s"empty winner: $r"))
    // round 1 ties out with the iteration-0 census' top pair
    val first = graft.ops.TextOps.bpePairs(spark, sfDir).collect()
      .minBy(_.getLong(0))
    assert(rows.head.getString(1) === "[" + first.getString(1) + "]",
      "round-1 merge must be the bpe_pairs winner")
    assert(rows.head.getLong(2) === first.getLong(2),
      "round-1 weight must match the census")
  }

  test("bpe train -> serve: the persisted merge table reloads and " +
      "tokenizes identically, and real subwords beat the proxy") {
    import graft.ops.TextOps
    // persist the trained model (one row) and serve off the RELOADED
    // copy — the train-to-serve closure the kmeans family set
    val merges = TextOps.bpeMerges(spark, sfDir)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bpe_model").toString
    merges.write.mode("overwrite").parquet(tmp)
    val inline = TextOps.fertilityTrained(spark, sfDir).collect().toSeq
    val served = TextOps.fertilityTrainedFrom(spark, sfDir,
      spark.read.parquet(tmp)).collect().toSeq
    assert(served === inline,
      "serving off the persisted model must match inline training")
    // the learned vocabulary actually fires: every stratum merged at
    // least once, and subwords per token sit in (1, len) — strictly
    // fewer symbols than characters, at least one per word
    inline.foreach { r =>
      assert(r.getLong(4) > 0, s"no merges fired in $r")
      assert(r.getDouble(5) >= 1.0, s"fertility below 1: $r")
    }
    // conservation: subword_tokens + merged_occurrences = total
    // characters (each merge removes exactly one symbol) — tie the
    // served census out against a direct character count
    val chars = graft.tables.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.expr(
          "aggregate(filter(split(lower(text), ' '), x -> x <> '')," +
            " 0L, (a, w) -> a + length(w))").as("nc"))
      .groupBy("source", "lang")
      .agg(org.apache.spark.sql.functions.sum("nc").as("nc"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    inline.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(3) + r.getLong(4) === chars(key),
        s"symbol conservation broken for $key")
    }
  }

  test("matryoshka truncation: full-prefix rung is exact, two-stage " +
      "rescore is a valid ranked result") {
    val curve = VectorOps.truncateCurve(spark, sfDir).collect()
    assert(curve.map(_.getLong(0)).toSeq === Seq(8L, 16L, 32L, 64L))
    curve.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) === 50L, "10 queries x 5 truth rows")
    }
    // THEOREM rung: the 64-dim prefix IS the full embedding, so its
    // top-5 is the brute truth exactly (recall 1.0 by construction)
    assert(curve.last.getDouble(3) === 1.0,
      s"full-prefix rung must be exact: ${curve.last}")
    // two-stage result: 5 ranked rows per query, sims non-increasing
    val ts = VectorOps.knnTruncated(spark, sfDir).collect()
    val byQ = ts.groupBy(_.getLong(0))
    assert(byQ.size === 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 5, s"query $q")
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      sims.sliding(2).foreach(p => assert(p(0) >= p(1), s"order in $q"))
    }
    // and the audit joins 5 truth rows per query
    val rec = VectorOps.truncatedRecall(spark, sfDir).collect()
    assert(rec.length === 10)
    rec.foreach(r => assert(r.getLong(2) === 5L
      && r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("band tune: stricter banding costs fewer pairs, full recall") {
    val rows = DedupOps.minhashBandTune(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 4L, 8L))
    // candidate-pair load falls as rows-per-band rises (stricter);
    // the S-curve threshold rises with it
    val pairs = rows.map(_.getLong(6))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      s"pair load must fall with strictness: ${pairs.mkString(",")}")
    val th = rows.map(_.getDouble(2))
    assert(th.zip(th.tail).forall { case (a, b) => a < b },
      s"threshold must rise with rows per band: ${th.mkString(",")}")
    // planted copies are verbatim → identical signatures → every
    // config catches every planted pair
    rows.foreach(r => assert(r.getDouble(7) === 100.0, s"recall: $r"))
  }

  test("perplexity outliers: 20 worst docs, scores ranked ascending") {
    val rows = TextOps.perplexityOutliers(spark, sfDir).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 20L))
    val scores = rows.map(_.getDouble(4))
    assert(scores.zip(scores.tail).forall { case (a, b) => a <= b },
      "outlier list must rank worst-first")
    scores.foreach(s => assert(s < 0, "log-probs are negative"))
  }

  test("norm outliers: high end dominates low end") {
    val rows = VectorOps.normOutliers(spark, sfDir).collect()
    assert(rows.length === 20)
    val hi = rows.filter(_.getString(0) == "high").map(_.getDouble(4))
    val lo = rows.filter(_.getString(0) == "low").map(_.getDouble(4))
    assert(hi.length === 10 && lo.length === 10)
    assert(hi.min >= lo.max,
      s"extreme ends must not overlap: hi.min=${hi.min} lo.max=${lo.max}")
  }

  test("new vs returning: week one all new, users conserved") {
    val rows = graft.ops.EventOps.eventsNewVsReturning(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.head.getDouble(4) === 100.0,
      "the first week has no returning users")
    rows.foreach(r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3), s"split: $r"))
    val users = graft.tables.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === users,
      "every user is new exactly once")
  }

  test("recall ladder: float32 rung is exact, every rung bounded") {
    val rows = VectorOps.recallLadder(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      Seq("float32", "ivfpq", "pq8", "sq8"))
    val byM = rows.map(r => r.getString(0) -> r).toMap
    assert(byM("float32").getDouble(4) === 1.0,
      "exact search must have perfect recall by definition")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), s"hits > truth: $r")
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
    }
    // coarser quantization cannot beat the finer rung's cost point:
    // sq8 (64 B) must hold at least pq8's (8 B) recall
    assert(byM("sq8").getDouble(4) >= byM("pq8").getDouble(4))
  }

  test("hash collision audit: bases bounded by shingles, pct consistent") {
    val r = DedupOps.hashCollisionAudit(spark, sfDir).collect()
    assert(r.length === 1)
    val (nSh, nBase, nColl, mx) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    assert(nBase <= nSh)
    assert(nColl <= nBase)
    assert(mx >= 1 && (nColl > 0) == (mx >= 2))
    assert(math.abs(r(0).getDouble(4)
      - (nSh - nBase) * 100.0 / nSh) < 1e-4)
  }

  test("cell purity: cells partition the corpus, majority consistent") {
    val rows = VectorOps.cellPurity(spark, sfDir).collect()
    val n = graft.tables.Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum === n,
      "cell members must partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1), s"majority > total: $r")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 10, s"label count: $r")
      assert(r.getDouble(5) >= 100.0 / 10 - 1e-9,
        s"majority share below uniform floor: $r")
    }
  }

  test("banded ngram twin: distributed top-k plan, planted pairs on " +
      "top, probe census consistent") {
    // the scale path must cut its top-100 with a distributed
    // TakeOrdered, never a global sort of the candidate set
    val banded = DedupOps.ngramJaccardBanded(spark, sfDir)
    val plan = banded.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"banded top-100 must be a distributed TakeOrdered:\n$plan")
    val top = banded.collect()
    assert(top.length > 0 && top.head.getDouble(2) === 1.0,
      "planted duplicates (jaccard 1.0) must rank on top")
    // probe: partitions the exact top-100 OF THE 1-in-4 AUDIT SAMPLE
    // (bounded ≤100, non-empty at test scale), recovered ≤ exact, and
    // the ≥0.7 stratum (the bands' operating point) recovers most
    // pairs; the unsampled probe still fills the full 100 cut
    val probe = DedupOps.ngramBandedProbe(spark, sfDir).collect()
    val nExact = probe.map(_.getLong(1)).sum
    assert(nExact > 0L && nExact <= 100L, s"sampled pool size: $nExact")
    assert(DedupOps.ngramBandedProbe(spark, sfDir, auditMod = 1)
      .collect().map(_.getLong(1)).sum === 100L)
    probe.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"recovered > exact: $r")
    }
    val high = probe.find(_.getLong(0) === 1L)
    assert(high.exists(_.getDouble(3) >= 80.0),
      s"high-band recall collapsed: ${probe.mkString(";")}")
  }

  test("opq sweep: two rounds, round 2 strictly less correlated mass") {
    val rows = VectorOps.opqSweep(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) >= 0
        && r.getLong(2) * 2 <= 64, s"implausible sweep row: $r")
    }
    // each round-1 Jacobi zeroes its pair's covariance exactly — the
    // rotated pairs leave the census (cov ≠ 0 filter) or re-enter
    // with fp-noise corr, so round 2's strongest |corr| must drop
    assert(rows(1).getDouble(3) <= rows(0).getDouble(3) + 1e-9,
      s"max |corr| did not shrink: ${rows.mkString(";")}")
  }

  test("opq knn: full top-5 per query, distances ranked, same query " +
      "set as the unrotated rung") {
    val opq = VectorOps.knnOpq(spark, sfDir).collect()
    val byQ = opq.groupBy(_.getLong(0))
    assert(byQ.size === 10 && byQ.values.forall(_.length == 5))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq === (1L to 5L))
      val d = sorted.map(_.getDouble(2))
      assert(d.forall(_ >= 0.0)
        && d.zip(d.tail).forall { case (a, b) => a <= b },
        s"adc distances not ascending: ${d.mkString(",")}")
    }
  }

  test("nprobe curve: recall monotone in nprobe, full truth coverage") {
    val rows = VectorOps.nprobeCurve(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 8L))
    rows.foreach(r => assert(r.getLong(2) === 50, "truth must be 10×5"))
    val recalls = rows.map(_.getDouble(3))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in nprobe: ${recalls.mkString(",")}")
    assert(recalls.last > 0.5, "probing half the cells should recall >0.5")
  }

  test("knn graph: one in-cell edge per vector, no self loops, " +
      "sims in range") {
    val n = graft.tables.Tables.embeddings(spark, sfDir).count()
    val g = VectorOps.knnGraph(spark, sfDir).collect()
    // singleton cells emit no edge; everything else must be covered
    assert(g.length <= n && g.length > n * 9 / 10,
      s"graph covers ${g.length} of $n vectors")
    assert(g.map(_.getLong(1)).distinct.length === g.length,
      "a vector must have exactly one nearest-neighbor edge")
    g.foreach { r =>
      assert(r.getLong(1) !== r.getLong(2), s"self loop: $r")
      assert(r.getDouble(3) >= -1.0001 && r.getDouble(3) <= 1.0001)
    }
  }

  test("nlist sweep: one row per codebook size, occupancy within " +
      "bounds, full truth coverage") {
    val rows = VectorOps.ivfNlistSweep(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(8L, 16L, 32L))
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0),
        s"more cells used than the codebook has: $r")
      assert(r.getLong(2) >= 1, s"empty hottest cell: $r")
      assert(r.getLong(4) === 50, s"truth must be 10×5: $r")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
    // cross-codebook max_cell comparisons are a property of THIS
    // corpus, not an invariant (prefix codebooks can consolidate a
    // dense region a coarser book split) — assert only the
    // theorem-backed pigeonhole bound: the hottest cell of an nlist
    // codebook holds at least ceil(N / nlist) members
    val n = graft.tables.Tables.embeddings(spark, sfDir).count()
    rows.foreach { r =>
      val lower = (n + r.getLong(0) - 1) / r.getLong(0)
      assert(r.getLong(2) >= lower,
        s"max_cell below the pigeonhole bound ceil($n/${r.getLong(0)}): $r")
    }
  }

  test("containment surfaces the planted fragments the Jaccard LSH " +
      "path structurally misses") {
    val pairs = DedupOps.containmentPairs(spark, sfDir)
    // every planted fragment (doc, doc+2e6) has a strict-subset
    // shingle set: containment exactly 1.0 but Jaccard ≈ |A|/|B|
    val frag = pairs.filter(col("doc2") === col("doc1") + 2000000L)
      .collect()
    assert(frag.nonEmpty, "no planted fragment pair surfaced")
    frag.foreach { r =>
      assert(r.getDouble(5) === 1.0, s"fragment containment != 1: $r")
      assert(r.getDouble(6) < 0.7, s"fragment jaccard not low: $r")
    }
    // ...and the MinHash-over-Jaccard path must NOT confirm those
    // pairs (they sit far below its 0.7 operating point) — run it
    // over the SAME fragment-bearing corpus, or the check is vacuous
    val viaLsh = DedupOps.minhashPairsOf(
        DedupOps.containmentCorpus(spark, sfDir)
          .select("doc_id", "text"))
      .filter(col("doc2") === col("doc1") + 2000000L).count()
    assert(viaLsh === 0, s"LSH recovered $viaLsh fragment pairs")
  }

  test("containment residue carries every planted fragment and " +
      "nothing LSH could flag") {
    val res = DedupOps.containmentResidue(spark, sfDir).collect()
    assert(res.nonEmpty)
    // stage-3 contract: everything here sits below the LSH operating
    // point — a pair at jaccard >= 0.7 belongs to stage 2
    res.foreach(r => assert(r.getDouble(6) < 0.7, s"stage-2 pair: $r"))
    // every planted fragment pair in the full report must survive the
    // residue cut (fragment jaccard ~ 0.5 is below the 0.7 point)
    val fullFrags = DedupOps.containmentPairs(spark, sfDir)
      .filter(col("doc2") === col("doc1") + 2000000L).count()
    // the residue competes over a SUBSET of the full report's rows,
    // so a fragment can only keep or improve its top-100 rank
    val resFrags = res.count(r => r.getLong(1) == r.getLong(0) + 2000000L)
    assert(resFrags >= fullFrags,
      s"fragments lost at the residue cut: $resFrags < $fullFrags")
  }

  test("containment health reports the hot-shingle cap census") {
    val h = DedupOps.containmentHealth(spark, sfDir).collect()
    assert(h.length === 1)
    val r = h.head
    val (nSh, single, pairing, capped) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nSh === single + pairing + capped,
      s"bucket census does not partition: $r")
    assert(pairing > 0 && r.getLong(5) > 0,
      "planted dups must produce pairing buckets")
  }

  test("opq recall ladder: five rungs, the rotated rung at PQ's byte " +
      "cost, recall in [0,1] with float32 exact") {
    val rows = VectorOps.recallLadderOpq(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("float32", "ivfpq", "opq8", "pq8", "sq8"))
    val byM = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(4))).toMap
    assert(byM("float32")._2 === 1.0)
    assert(byM("opq8")._1 === 8L && byM("pq8")._1 === 8L,
      "opq8 must cost exactly PQ's 8 bytes/vector")
    rows.foreach(r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("user lifecycle: growth-accounting identity holds every week") {
    val rows = graft.ops.EventOps
      .eventsUserLifecycle(spark, sfDir).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"active must partition into new/retained/resurrected: $r")
    }
    // the ledger identity: Δactive = new + resurrected − churned
    // (between consecutive weeks — a fully-silent week has no row)
    rows.sliding(2).foreach {
      case Array(prev, cur) if cur.getLong(0) == prev.getLong(0) + 1 =>
        assert(cur.getLong(1) - prev.getLong(1) === cur.getLong(6),
          s"net_growth != Δactive between $prev and $cur")
      case _ => ()
    }
    // first week is all-new, nothing churned
    assert(rows.head.getLong(2) === rows.head.getLong(1)
      && rows.head.getLong(5) === 0L)
  }

  test("user lifecycle: planted gap pattern classifies churn and " +
      "resurrection correctly") {
    import spark.implicits._
    // user 1 active weeks 1,2,4 (churns at 3, resurrects at 4);
    // user 2 active week 2 only (churns at 3, never returns)
    val planted = Seq((1L, 1L), (1L, 2L), (1L, 4L), (2L, 2L))
      .toDF("user_id", "week")
    val rows = graft.ops.EventOps.lifecycleOf(planted)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // (n_active, n_new, n_retained, n_resurrected, n_churned)
    assert(rows(1L) === ((1L, 1L, 0L, 0L, 0L)))
    assert(rows(2L) === ((2L, 1L, 1L, 0L, 0L)))
    assert(rows(3L) === ((0L, 0L, 0L, 0L, 2L)))
    assert(rows(4L) === ((1L, 0L, 0L, 1L, 0L)))
    // nothing churns past the horizon: no week-5 row
    assert(!rows.contains(5L))
  }

  test("markov stationary: a probability vector over the source types") {
    val rows = graft.ops.EventOps
      .eventsMarkovStationary(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getDouble(2)).sum
    // 12 rounded iterations leak at most ~1e-9 of mass; a real break
    // (dropped type, double-counted edge) moves this by whole percents
    assert(math.abs(mass - 1.0) < 1e-6, s"stationary mass $mass")
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0)
      assert(r.getLong(1) > 0)
    }
  }

  test("naive bayes: confusion matrix ties out with the margin report") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val langCounts = docs
      .filter(expr("length(trim(text)) > 0"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val conf = graft.ops.TextOps.nbLang(spark, sfDir).collect()
    // every doc with at least one token is classified exactly once
    val rowSums = conf.groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getLong(2)).sum }
    assert(rowSums === langCounts)
    // labels stay inside the label set (the classifier can't invent a
    // class: the spine is the trained class census)
    val langs = langCounts.keySet
    conf.foreach(r => assert(langs.contains(r.getString(1))))
    // the margin report's n_correct IS the confusion diagonal
    val diag = conf.filter(r => r.getString(0) == r.getString(1))
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val margin = graft.ops.TextOps.nbMargin(spark, sfDir).collect()
    margin.foreach { r =>
      val l = r.getString(0)
      assert(r.getLong(2) === diag.getOrElse(l, 0L), s"diag $l")
      val acc = r.getDouble(3)
      assert(acc >= 0.0 && acc <= 1.0)
      // winner minus runner-up is non-negative by construction
      assert(r.getDouble(4) >= 0.0, s"negative margin for $l")
    }
  }

  test("naive bayes: feature dump is 5 ranked log-odds rows per class") {
    val rows = graft.ops.TextOps.nbFeatures(spark, sfDir).collect()
    val byClass = rows.groupBy(_.getString(0))
    assert(byClass.nonEmpty)
    byClass.foreach { case (c, rs) =>
      assert(rs.length === 5, s"class $c")
      assert(rs.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      // ranked on the rounded odds: non-increasing down the rank
      val odds = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      odds.sliding(2).foreach(p => assert(p(0) >= p(1), s"order in $c"))
    }
  }
}
