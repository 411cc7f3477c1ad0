package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Olap

class ApproxSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir

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
