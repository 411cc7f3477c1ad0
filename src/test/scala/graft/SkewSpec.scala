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
