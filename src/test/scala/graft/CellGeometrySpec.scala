package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The k ∝ N knob under growth: SemDeDup's and the probe twins'
  * quadratic-in-cell-size bound only holds if the derived cell count
  * actually keeps cells bounded on a GROWN corpus — the claim a fixed
  * 16-cell codebook breaks. Inflates the test corpus 30× with the
  * ScaleGen id scheme (vec_id + copy·10000 — the same layout as the
  * driver's /tmp replicas), derives k, assigns every vector to its
  * nearest centroid by the shared argmin shape, and checks the pair
  * work Σ cell² stays linear-in-N (within a constant factor of
  * N·targetCell) instead of the N²/16 a frozen codebook gives.
  */
class CellGeometrySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import graft.ops.VectorOps

  test("derivedK follows the k ∝ N rule with the test-scale floor") {
    assert(VectorOps.derivedK(500) === 16)      // sf0.01: floor wins
    assert(VectorOps.derivedK(2040) === 16)     // sf0.1 semdedup corpus
    assert(VectorOps.derivedK(20000) === 157)   // 10x replica
    assert(VectorOps.derivedK(61200) === 479)   // 30x semdedup corpus
    assert(VectorOps.derivedK(1000000) === 7813)
  }

  test("derived k keeps pair work linear on a 30x-inflated corpus") {
    val e = graft.tables.Tables.embeddings(spark, TestSpark.sfDir)
      .select(col("vec_id"), col("embedding"))
    val copies = spark.range(0, 30).select(col("id").as("copy"))
    val corpus = e.crossJoin(broadcast(copies))
      .select((col("vec_id") + col("copy") * 10000L).as("vec_id"),
        col("embedding"))
    val n = corpus.count()
    assert(n === 15000L)
    val k = VectorOps.derivedK(n)
    assert(k === 118, "k must derive from the corpus count")
    val cents = corpus.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val cos = graft.functions.VecDot.dot(col("embedding"), col("cv")) /
      (sqrt(graft.functions.VecDot.dot(col("embedding"), col("embedding"))) *
        sqrt(graft.functions.VecDot.dot(col("cv"), col("cv"))))
    val cells = corpus
      .join(broadcast(cents), col("cid") =!= lit(-1))
      .withColumn("cdist", -cos)
      .groupBy("vec_id")
      .agg(min(struct(col("cdist"), col("cid"))).as("m"))
      .groupBy(col("m.cid")).agg(count(lit(1)).as("sz"))
    val stats = cells.agg(count(lit(1)).as("n_cells"),
      max(col("sz")).as("max_cell"),
      sum(col("sz") * col("sz")).as("pair_work")).head()
    val (nCells, maxCell, pairWork) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    info(s"n=$n k=$k cells=$nCells max_cell=$maxCell pair_work=$pairWork")
    // the fixed-16 codebook on this corpus gives >= (n/16)^2 * spread;
    // the derived k must keep total pair work within a small constant
    // of the N*targetCell linear bound (cells skew, but boundedly)
    assert(pairWork <= 8L * n * 128,
      s"pair work $pairWork exceeds 8x the linear bound ${8L * n * 128}")
    assert(maxCell < n / 16,
      "a single cell holding 1/16th of the corpus means the derived " +
        "codebook collapsed to the fixed-16 behavior")
  }
}
