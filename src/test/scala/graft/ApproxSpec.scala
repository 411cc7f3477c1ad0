package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Olap

class ApproxSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir

  test("HLL sketches merge across slices like an incremental rollup") {
    // the 100 TB stats path: per-slice sketches built independently
    // (per ingest batch / per partition), UNIONED later — estimate
    // must match a direct global sketch, which is what makes distinct
    // counts maintainable without rescanning history
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
    val perSource = docs.groupBy("source")
      .agg(hll_sketch_agg(col("doc_id")).as("sk"))
    val merged = perSource
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = docs
      .agg(hll_sketch_estimate(hll_sketch_agg(col("doc_id"))).as("est"))
      .head().getLong(0)
    val exact = docs.select(countDistinct(col("doc_id"))).head().getLong(0)
    // sparse-mode handling can differ slightly between one direct
    // sketch and a union of slice sketches — both must stay within the
    // sketch's error envelope of the truth, which is the property the
    // incremental path relies on
    assert(math.abs(merged - exact) <= math.max(2.0, exact * 0.05),
      s"HLL union estimate $merged too far from exact $exact")
    assert(math.abs(direct - exact) <= math.max(2.0, exact * 0.05),
      s"direct HLL estimate $direct too far from exact $exact")
  }

  test("sketch aggregates land within their error bounds") {
    val rows = Olap.approxStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approxOrders = r.getAs[Long]("approx_orders").toDouble
      val exactOrders = r.getAs[Long]("exact_orders").toDouble
      // rsd 0.02 → allow 5 sigma
      assert(math.abs(approxOrders - exactOrders) <= exactOrders * 0.10,
        s"HLL off: $approxOrders vs $exactOrders")
      val approxP50 = r.getAs[Double]("approx_p50")
      val exactP50 = r.getAs[Double]("exact_p50")
      // accuracy 1000 → rank error 1/1000; quantity domain is small
      assert(math.abs(approxP50 - exactP50) <= math.max(1.0, exactP50 * 0.05),
        s"p50 off: $approxP50 vs $exactP50")
    }
  }
}
