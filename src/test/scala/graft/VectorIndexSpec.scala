package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VectorIndex

/** The persisted IVF+PQ index: build once, search many — results must
  * match the inline operator exactly, and the search plan must not
  * recompute routing/codes or join on the corpus axis.
  */
class VectorIndexSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("index search matches the inline IVF+PQ operator exactly") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_vecidx").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_vec LOCATION '$tmp'")
    try {
      VectorIndex.build(spark, sfDir, "graft_vec.idx", nBuckets = 8)

      val fromIndex = VectorIndex.search(spark, sfDir, "graft_vec.idx")
      val inline = graft.ops.VectorOps.knnIvfPq(spark, sfDir)
      assert(fromIndex.collect().map(_.toString).toSeq
        === inline.collect().map(_.toString).toSeq)

      // the search plan reads the index — the corpus-axis SortMergeJoin
      // the inline operator pays (codes ⋈ routing on vec_id) must be
      // gone, and no embedding decode may appear on the index side
      val plan = fromIndex.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"index search must not join on the corpus axis:\n$plan")

      // the index persisted one row per vector with its cell + 8 codes
      val idx = VectorIndex.read(spark, "graft_vec.idx")
      val nVecs = graft.tables.Tables.embeddings(spark, sfDir).count()
      assert(idx.count() === nVecs)
      assert(idx.filter(org.apache.spark.sql.functions
        .size(org.apache.spark.sql.functions.col("codes")) =!= 8)
        .count() === 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_vec.idx")
      spark.sql("DROP DATABASE IF EXISTS graft_vec")
    }
  }

  test("searchFor builds once per JVM and matches inline results") {
    // the driver-checked store twin (emb_knn_ivfpq_indexed): build
    // amortized behind ensureBuilt, second call reuses the table
    val first = VectorIndex.searchFor(spark, sfDir).collect()
      .map(_.toString).toSeq
    val table = VectorIndex.ensureBuilt(spark, sfDir)
    assert(VectorIndex.ensureBuilt(spark, sfDir) == table)
    val inline = graft.ops.VectorOps.knnIvfPq(spark, sfDir).collect()
      .map(_.toString).toSeq
    assert(first === inline)
  }
}
