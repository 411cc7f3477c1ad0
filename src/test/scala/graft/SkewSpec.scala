package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows on one hot key — the shape that straggles a plain
  // groupBy/join at scale
  private def skewed = {
    val n = 10000
    spark.range(n)
      .select(
        when(col("id") % 10 =!= 0, lit(42L)).otherwise(col("id")).as("k"),
        (col("id") % 97).cast("double").as("v"))
  }

  test("salted aggregation matches the plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("k").collect()
    val salted = Skew.saltedAgg(skewed, "k", "v", salts = 8)
      .orderBy("k").collect()
    assert(salted.length === plain.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getLong(0) === s.getLong(0))
      assert(p.getLong(1) === s.getLong(1))
      assert(math.abs(p.getDouble(2) - s.getDouble(2)) < 1e-6)
    }
  }

  test("salted agg spreads the hot key over salt shards") {
    val shards = skewed
      .withColumn("_salt", pmod(xxhash64(col("k"), col("v")), lit(8)))
      .filter(col("k") === 42L)
      .select("_salt").distinct().count()
    assert(shards > 1, s"expected the hot key on >1 shard, got $shards")
  }

  test("salted agg survives a 50% hot user on real events") {
    // plant realistic 80/20-gone-bad skew: HALF of all events belong
    // to one user — the shape where a plain per-user aggregation makes
    // one reducer process half the 100 TB fact
    val salts = 16
    val ev = graft.tables.Tables.events(spark, TestSpark.sfDir)
      .select(
        when(col("event_id") % 2 === 0, lit(777L))
          .otherwise(col("user_id") + 1000L).as("user_id"),
        col("value"))
    // correctness parity under skew
    val plainRows = ev.withColumnRenamed("value", "v2")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("v2").as("sum_v"))
      .orderBy("user_id").collect()
    val saltedRows = Skew.saltedAgg(
        ev.withColumnRenamed("value", "v2"), "user_id", "v2", salts)
      .orderBy("user_id").collect()
    assert(saltedRows.length === plainRows.length)
    plainRows.zip(saltedRows).foreach { case (p, s) =>
      assert(p.getLong(0) === s.getLong(0))
      assert(p.getLong(1) === s.getLong(1))
      assert(math.abs(p.getDouble(2) - s.getDouble(2)) < 1e-6)
    }
    // structural skew relief: the hot user's partial rows spread over
    // most salt shards, and no shard carries more than 3x its fair
    // share — the straggler is gone by construction, independent of
    // wall-clock noise
    val hotShards = ev
      .withColumn("_salt",
        pmod(xxhash64(col("user_id"), col("value")), lit(salts)))
      .filter(col("user_id") === 777L)
      .groupBy("_salt").count().collect()
    val hotTotal = hotShards.map(_.getLong(1)).sum
    assert(hotShards.length >= salts / 2,
      s"hot user only on ${hotShards.length} of $salts shards")
    assert(hotShards.map(_.getLong(1)).max <= 3L * hotTotal / salts,
      "a salt shard still carries a straggler share of the hot user")
    // plan shape: the partial-agg exchange partitions on (key, salt),
    // not the key alone
    val plan = Skew.saltedAgg(
        ev.withColumnRenamed("value", "v2"), "user_id", "v2", salts)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"),
      "salted agg plan lost its salt column in the exchange")
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    // prove the OTHER half of the skew story: for sort-merge joins AQE
    // itself splits the oversized partition (no salt needed). Plant a
    // 90%-hot key with a fat payload, force SMJ, lower the skew
    // thresholds so test-scale data trips them, and assert the final
    // adaptive plan marked the join skewed.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384")
    val saved = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(200000)
        .select(
          when(col("id") % 10 =!= 0, lit(42L)).otherwise(col("id")).as("k"),
          concat(lit("x"), lpad(col("id").cast("string"), 64, "0"))
            .as("payload"))
      val dim = spark.range(2000).select(col("id").as("k"),
        concat(lit("d"), col("id").cast("string")).as("label"))
      // global aggregate above the join: a groupBy(k) there would
      // REQUIRE hashpartitioning(k) and AQE would refuse to split the
      // skewed partition (the split breaks that distribution); the
      // payload length keeps the fat column un-pruned so the hot
      // partition actually exceeds the threshold
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"),
          sum(length(col("payload"))).as("bytes"))
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join matches the plain join") {
    val dim = Seq((42L, "hot"), (10L, "ten"), (20L, "twenty"))
      .toDF("k", "label")
    val plain = skewed.join(dim, "k")
      .groupBy("k", "label").count().orderBy("k").collect()
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .groupBy("k", "label").count().orderBy("k").collect()
    assert(plain.map(_.toString).toSeq === salted.map(_.toString).toSeq)
  }
}
