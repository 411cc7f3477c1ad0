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

  test("rotated index freezes its OPQ plan: appends encode under the " +
      "stored rotation, search never joins the corpus axis") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_vecidx_opq").toString
    spark.sql(
      s"CREATE DATABASE IF NOT EXISTS graft_vopq LOCATION '$tmp'")
    try {
      VectorIndex.buildRotated(spark, sfDir, "graft_vopq.idx",
        nBuckets = 8)

      // the plan table IS the index's rotation: ≤32 mutual-best pairs
      val plan = spark.table("graft_vopq.idx_plan")
      assert(plan.count() > 0 && plan.count() <= 32)

      // one row per vector, 8 codes each, same as the unrotated store
      val e = graft.tables.Tables.embeddings(spark, sfDir)
      val idx = VectorIndex.read(spark, "graft_vopq.idx")
      assert(idx.count() === e.count())
      assert(idx.filter(size(col("codes")) =!= 8).count() === 0)

      // search: full top-5 per query, ascending ADC, no corpus-axis
      // join (the index is the one corpus-sized input)
      val res = VectorIndex.searchRotated(spark, sfDir, "graft_vopq.idx")
      val plan2 = res.queryExecution.executedPlan.toString
      assert(!plan2.contains("SortMergeJoin"),
        s"rotated index search must not join on the corpus axis:\n$plan2")
      val rows = res.collect()
      val byQ = rows.groupBy(_.getLong(0))
      assert(byQ.size === 10 && byQ.values.forall(_.length == 5))
      byQ.values.foreach { rs =>
        val d = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
        assert(d.zip(d.tail).forall { case (a, b) => a <= b })
      }

      // FROZEN-plan contract: re-append 10 existing corpus vectors
      // under shifted ids. Their build-time rows were encoded under
      // the stored plan — if append retrained the rotation or the
      // codebooks on the 10-row batch, cells/codes would diverge.
      val batch = e.filter(col("vec_id") >= 16 && col("vec_id") < 26)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      VectorIndex.appendRotated(spark, batch, "graft_vopq.idx", sfDir,
        nBuckets = 8)
      val after = VectorIndex.read(spark, "graft_vopq.idx")
      assert(after.count() === e.count() + 10)
      val mismatch = after.filter(col("vec_id") >= 100000L)
        .select((col("vec_id") - 100000L).as("vec_id"),
          col("cell").as("acell"),
          col("codes").cast("string").as("acodes"))
        .join(idx, "vec_id")
        .filter(col("acell") =!= col("cell")
          || col("acodes") =!= col("codes").cast("string"))
      assert(mismatch.count() === 0,
        "appended rows must encode under the index's stored plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_vopq.idx")
      spark.sql("DROP TABLE IF EXISTS graft_vopq.idx_plan")
      spark.sql("DROP DATABASE IF EXISTS graft_vopq")
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
