package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{TextOps, VectorOps}
import graft.sources.{Retrieval, TermIndexStore, VectorIndex}
import graft.tables.Tables

/** The free-query retrieval facade must be the SAME engines the
  * oracle-checked anchor keys audit — proved by running the facade on
  * anchor-shaped queries (an anchor's own term text / own embedding)
  * and requiring the anchor-audited rankings back, modulo the one
  * semantic difference: a free query has no corpus identity, so
  * nothing is self-excluded.
  */
class RetrievalSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("free-text lexical search on an anchor's terms reproduces " +
      "the stored pruned ranking") {
    val anchorTerms = TextOps.bm25AnchorTerms(spark, sfDir)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).sorted.toSeq).toMap
    val expected = TermIndexStore.searchPrunedFor(spark, sfDir)
      .collect().groupBy(_.getLong(0))
    for (q <- Seq(0L, 3L, 7L)) {
      val text = anchorTerms(q).mkString(" ")
      // k = 6: the free query may rank the anchor doc itself (the
      // anchor path self-excludes; a free query has no self)
      val got = Retrieval.searchText(spark, sfDir, text, 6)
        .collect().filter(_.getLong(1) != q).take(5)
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      // anchor rows are (qid, rank, doc_id, score) — compare in rank order
      val wantPairs = expected(q).sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      assert(wantPairs.nonEmpty)
      assert(got === wantPairs, s"lexical facade drifted for anchor $q")
    }
  }

  test("free-text EXACT search on an anchor's terms reproduces the " +
      "exact stored ranking (MaxScore prunes work, never the answer)") {
    val anchorTerms = TextOps.bm25AnchorTerms(spark, sfDir)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).sorted.toSeq).toMap
    // the EXACT engine's anchor rankings (full postings, no cap)
    val expected = TermIndexStore.searchFor(spark, sfDir)
      .collect().groupBy(_.getLong(0))
    for (q <- Seq(0L, 5L)) {
      val text = anchorTerms(q).mkString(" ")
      val got = Retrieval.searchTextExact(spark, sfDir, text, 6)
        .collect().filter(_.getLong(1) != q).take(5)
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      val wantPairs = expected(q).sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      assert(wantPairs.nonEmpty)
      assert(got === wantPairs, s"exact facade drifted for anchor $q")
    }
    // all-unknown query: the index's honest empty answer
    assert(Retrieval.searchTextExact(spark, sfDir,
      "zzzz-not-a-token").count() === 0)
  }

  test("embedded-query ANN through the persisted index reproduces " +
      "the indexed ivfpq ranking; an unknown query returns its true " +
      "neighbors") {
    // anchor-shaped queries: same ids, same vectors → self-exclusion
    // fires identically and parity is exact
    val e = Tables.embeddings(spark, sfDir)
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val idx = VectorIndex.read(spark,
      VectorIndex.ensureBuilt(spark, sfDir))
    val got = VectorOps.searchIndexQueries(queries, e, idx, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = VectorIndex.searchFor(spark, sfDir)
      .filter(col("qid") < 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === want.toSeq,
      "anchor-shaped free queries drifted from emb_knn_ivfpq_indexed")

    // a FREE query carrying anchor 0's embedding: no self-exclusion,
    // so vec 0 itself may enter the list — dropping it must leave
    // exactly anchor 0's audited neighbors, in order
    val vec0 = e.filter(col("vec_id") === 0)
      .head().getSeq[Float](1).toArray
    val free = Retrieval.searchVec(spark, sfDir, vec0, 6)
      .collect().filter(_.getLong(1) != 0L).take(5)
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val anchor0 = want.filter(_._1 == 0L).map(t => (t._2, t._3)).toSeq
    assert(free === anchor0, "free-vector facade drifted for anchor 0")

    // the REFINED free-vector face: anchor 0's embedding through the
    // over-fetch + exact-rescore path must reproduce the indexed
    // refine's audited ranking once the self row is dropped
    val freeR = Retrieval.searchVecRefined(spark, sfDir, vec0, 6)
      .collect().filter(_.getLong(1) != 0L).take(5)
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val anchor0R = VectorIndex.searchRefineFor(spark, sfDir)
      .filter(col("qid") === 0)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(anchor0R.nonEmpty)
    assert(freeR === anchor0R,
      "refined free-vector facade drifted for anchor 0")
  }

  test("the hybrid facade fuses its own two engine lists with the " +
      "exact-integer RRF the stored hybrid hash-checks") {
    val anchorTerms = TextOps.bm25AnchorTerms(spark, sfDir)
      .filter(col("qid") === 0).collect().map(_.getString(1)).sorted
    val text = anchorTerms.mkString(" ")
    val vec0 = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0).head().getSeq[Float](1).toArray

    val lex = Retrieval.searchText(spark, sfDir, text, 5)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val vec = Retrieval.searchVec(spark, sfDir, vec0, 5)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    // driver-side expectation over <= 10 rows: the documented integer
    // arithmetic, then (rrf DESC, doc_id) top-5
    def contrib(rank: Option[Long]): Long =
      rank.fold(0L)(r => 495593280L / (60L + r))
    val expected = (lex.keySet ++ vec.keySet).toSeq
      .map(d => (d, contrib(lex.get(d)) + contrib(vec.get(d)),
        lex.get(d), vec.get(d)))
      .sortBy { case (d, s, _, _) => (-s, d) }
      .take(5).zipWithIndex
      .map { case ((d, s, br, kr), i) => (i + 1L, d, s, br, kr) }
    val got = Retrieval.search(spark, sfDir, text, vec0, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === expected,
      "hybrid facade fusion drifted from the documented RRF arithmetic")
    // the exact-lexical hybrid face: same fusion arithmetic over the
    // searchTextExact list
    val lexE = Retrieval.searchTextExact(spark, sfDir, text, 5)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val expectedE = (lexE.keySet ++ vec.keySet).toSeq
      .map(d => (d, contrib(lexE.get(d)) + contrib(vec.get(d)),
        lexE.get(d), vec.get(d)))
      .sortBy { case (d, s, _, _) => (-s, d) }
      .take(5).zipWithIndex
      .map { case ((d, s, br, kr), i) => (i + 1L, d, s, br, kr) }
    val gotE = Retrieval.searchExact(spark, sfDir, text, vec0, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(gotE.toSeq === expectedE,
      "exact hybrid facade drifted from the documented RRF arithmetic")
    // the refined hybrid face: exact lexical × refined vector under
    // the same arithmetic
    val vecR = Retrieval.searchVecRefined(spark, sfDir, vec0, 5)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val expectedR = (lexE.keySet ++ vecR.keySet).toSeq
      .map(d => (d, contrib(lexE.get(d)) + contrib(vecR.get(d))))
      .sortBy { case (d, s) => (-s, d) }
      .take(5).map(_._1)
    val gotR = Retrieval.searchRefined(spark, sfDir, text, vec0, 5)
      .collect().map(_.getLong(1))
    assert(gotR.toSeq === expectedR,
      "refined hybrid facade drifted from the documented RRF arithmetic")
    // k clamps and guards
    assert(Retrieval.search(spark, sfDir, text, vec0, 3).count() === 3)
    intercept[IllegalArgumentException] {
      Retrieval.search(spark, sfDir, text, vec0, 6)
    }
    // an all-unknown text query degrades to the vector engine alone
    val vecOnly = Retrieval.search(spark, sfDir,
      "zzzz-not-a-token qqqq-nope", vec0, 5).collect()
    assert(vecOnly.forall(r => r.isNullAt(3)) && vecOnly.length === 5)
  }
}
