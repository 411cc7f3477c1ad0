package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ThetaSketch, ThetaState}

class ThetaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("exact regime: set algebra matches exact set arithmetic") {
    import spark.implicits._
    // two overlapping id ranges, well under k → sketches retain
    // everything and every estimate must be exactly right
    val a = (0L until 500L).toDF("v").agg(
      ThetaSketch.sketchAgg(col("v"), 1024).as("sk"))
    val b = (300L until 900L).toDF("v").agg(
      ThetaSketch.sketchAgg(col("v"), 1024).as("sk"))
    val pair = a.select(col("sk").as("sa"))
      .crossJoin(b.select(col("sk").as("sb")))
    val row = pair.select(
      ThetaSketch.estimate(col("sa")).as("na"),
      ThetaSketch.estimate(col("sb")).as("nb"),
      ThetaSketch.estimate(ThetaSketch.union(col("sa"), col("sb")))
        .as("nu"),
      ThetaSketch.estimate(ThetaSketch.intersect(col("sa"), col("sb")))
        .as("ni"),
      ThetaSketch.estimate(ThetaSketch.aNotB(col("sa"), col("sb")))
        .as("nab")).head()
    assert(row.getDouble(0) == 500.0)
    assert(row.getDouble(1) == 600.0)
    assert(row.getDouble(2) == 900.0)  // |0..900|
    assert(row.getDouble(3) == 200.0)  // |300..500|
    assert(row.getDouble(4) == 300.0)  // |0..300|
  }

  test("estimating regime: estimate stays within the KMV error envelope") {
    import spark.implicits._
    val n = 100000L
    val k = 256
    val est = (0L until n).toDF("v")
      .repartition(8) // force multi-partition partials + merge
      .agg(ThetaSketch.estimate(
        ThetaSketch.sketchAgg(col("v"), k)).as("est"))
      .head().getDouble(0)
    // KMV relative standard error ≈ 1/sqrt(k-2) ≈ 6.3%; allow 5σ
    assert(math.abs(est - n) <= n * 5.0 / math.sqrt(k - 2.0),
      s"theta estimate $est too far from $n at k=$k")
  }

  test("union-agg of per-slice sketches matches a direct global sketch") {
    import spark.implicits._
    // the incremental-rollup contract: slice sketches built
    // independently union into the same state as one global pass
    // (deterministic hash + same k → identical retained sets)
    val df = (0L until 20000L).map(v => (v % 7, v)).toDF("slice", "v")
    val perSlice = df.groupBy("slice")
      .agg(ThetaSketch.sketchAgg(col("v"), 512).as("sk"))
    val merged = perSlice
      .agg(ThetaSketch.estimate(ThetaSketch.unionAgg(col("sk"))).as("e"))
      .head().getDouble(0)
    val direct = df
      .agg(ThetaSketch.estimate(
        ThetaSketch.sketchAgg(col("v"), 512)).as("e"))
      .head().getDouble(0)
    assert(merged == direct,
      s"union-of-slices $merged != direct sketch $direct")
    assert(math.abs(merged - 20000.0) <= 20000.0 * 5.0 / math.sqrt(510.0))
  }

  test("theta functions work from plain SQL via GraftExtensions") {
    graft.plans.GraftExtensions.install(spark)
    import spark.implicits._
    (0L until 1000L).map(v => (v % 2, v)).toDF("g", "v")
      .createOrReplaceTempView("theta_vals")
    val row = spark.sql(
      """SELECT theta_estimate(theta_union_agg(sk)) AS total,
        |  theta_estimate(theta_set_op(min(sk), max(sk), 'intersect'))
        |    AS common
        |FROM (SELECT g, theta_sketch_agg(v, 2048) AS sk
        |      FROM theta_vals GROUP BY g)""".stripMargin)
    val r = row.head()
    assert(r.getDouble(0) == 1000.0)
    assert(r.getDouble(1) == 0.0) // even and odd ids never intersect
    spark.catalog.dropTempView("theta_vals")
  }

  test("sourceUnique emits a row for a source with no counterpart") {
    // single-source corpus, doc_ids never % 5 == 0 so the planted
    // mirror source is empty too: the pair expansion finds no "other"
    // row, and the left join must still carry the source through with
    // n_unique = n_digests (the oracle's NOT EXISTS lists it)
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_single_src").toString
    Seq((1L, "alpha beta", "solo", "en"), (2L, "gamma delta", "solo", "en"),
        (3L, "epsilon zeta", "solo", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = graft.ops.DedupOps.sourceUnique(spark, tmp).collect()
    assert(rows.length == 1, s"expected the solo source row, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getString(0) == "solo")
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L,
      s"unique census must equal the digest census: $r")
  }

  test("serialization round-trips the full sketch state") {
    val st = new ThetaState(64)
    (0L until 10000L).foreach(v => st.updateHash(v * 2654435761L))
    val back = ThetaState.deserialize(st.serialize())
    assert(back.k == st.k)
    assert(back.theta == st.theta)
    assert(back.set == st.set)
    assert(back.estimate == st.estimate)
  }
}
