package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.VectorOps

/** The id-space integrity census must DETECT a broken parallel id
  * space, not just read 'matched' on the clean verify tables — so
  * this spec plants orphans on both sides: a doc with no vector (the
  * ANN-unsearchable case) and a vector with no doc (the
  * partial-takedown residue case).
  */
class IntegritySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("orphans on either side are reported per (status, source); " +
      "clean data reads matched-only") {
    val docs = Seq(
      (0L, "web"), (1L, "web"), (2L, "books"), (3L, "books")
    ).toDF("doc_id", "source")
    val vecs = Seq(0L, 1L, 2L, 9L).toDF("vec_id")
    val got = VectorOps.docVecIntegrityFrom(docs, vecs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("doc_only", "books", 1L),
      ("matched", "books", 1L),
      ("matched", "web", 2L),
      ("vec_only", "(none)", 1L)))

    // clean id space: exactly one row per source, all matched
    val clean = VectorOps.docVecIntegrityFrom(
      docs, Seq(0L, 1L, 2L, 3L).toDF("vec_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(clean.toSeq === Seq(
      ("matched", "books", 2L), ("matched", "web", 2L)))
  }
}
