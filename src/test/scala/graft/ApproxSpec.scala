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

  test("KLL quantile sketches union across slices within rank error") {
    import graft.functions.QuantileSketch
    // same incremental-rollup contract as the HLL test, for quantiles:
    // per-source sketches built independently, persisted as binary,
    // unioned later — the merged estimate must sit within the sketch's
    // rank-error envelope of the exact quantile, at BOTH granularities
    // (direct whole-corpus sketch and union-of-slices)
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select(col("source"), length(col("text")).cast("double").as("len"))
    val perSource = docs.groupBy("source")
      .agg(QuantileSketch.sketchAgg(col("len")).as("sk"))
    val exactN = docs.count()
    val lens = docs.select("len").collect().map(_.getDouble(0)).sorted
    def exactRank(v: Double): Long = lens.count(_ <= v).toLong
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val merged = perSource
        .agg(QuantileSketch.estimate(
          QuantileSketch.unionAgg(col("sk")), q).as("est"))
        .head().getDouble(0)
      val direct = docs
        .agg(QuantileSketch.estimate(
          QuantileSketch.sketchAgg(col("len")), q).as("est"))
        .head().getDouble(0)
      // k=256 gives rank error well under 2%; assert 3% for slack
      val tol = math.max(2L, (exactN * 0.03).toLong)
      assert(math.abs(exactRank(merged) - q * exactN) <= tol,
        s"union estimate $merged at q=$q has rank ${exactRank(merged)}" +
          s" vs target ${(q * exactN).toLong} (n=$exactN)")
      assert(math.abs(exactRank(direct) - q * exactN) <= tol,
        s"direct estimate $direct at q=$q has rank ${exactRank(direct)}" +
          s" vs target ${(q * exactN).toLong} (n=$exactN)")
    }
  }

  test("KLL sketch works from plain SQL via GraftExtensions") {
    graft.plans.GraftExtensions.install(spark)
    graft.tables.Tables.documents(spark, sfDir)
      .selectExpr("source", "cast(length(text) as double) as len")
      .createOrReplaceTempView("kll_docs")
    val est = spark.sql(
      """SELECT quantile_sketch_estimate(
        |         quantile_sketch_union(sk), 0.5d) AS p50
        |FROM (SELECT source, quantile_sketch_agg(len, 128) AS sk
        |      FROM kll_docs GROUP BY source)""".stripMargin)
      .head().getDouble(0)
    val exact = spark.sql(
      "SELECT percentile(len, 0.5d) FROM kll_docs").head().getDouble(0)
    assert(math.abs(est - exact) <= math.max(5.0, exact * 0.10),
      s"SQL-path p50 $est too far from exact $exact")
    spark.catalog.dropTempView("kll_docs")
  }

  test("sketched ccnet tiers track the exact tiers within rank error") {
    // the declared 100 TB variant: tercile cuts from the KLL sketch
    // instead of the exact percentile — only BOUNDARY docs may change
    // tier, so per-tier global counts must sit within the sketch's
    // rank-error envelope of the exact split
    val exact = graft.ops.TextOps.ccnetBuckets(spark, sfDir)
      .groupBy("tier").agg(sum(col("n_docs")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketched = graft.ops.TextOps.ccnetBucketsSketched(spark, sfDir)
      .groupBy("tier").agg(sum(col("n_docs")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    assert(sketched.values.sum == total)
    for ((tier, n) <- exact) {
      val s = sketched.getOrElse(tier, 0L)
      // k=256 → rank error well under 2% of n; allow 3% of the corpus
      assert(math.abs(s - n) <= math.max(2L, (total * 0.03).toLong),
        s"tier $tier: sketched $s vs exact $n (total $total)")
    }
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
