package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for 100 TB keys that AQE alone
  * can't always save (SURVEY.md §5).
  *
  * AQE's skew-join split handles sort-merge joins whose partitions are
  * detectably oversized at runtime; these helpers cover the two other
  * hot-key shapes:
  *  - a grouped aggregation where one key dominates (salting spreads
  *    the partial aggregation over `salts` reducers, then a second
  *    cheap agg merges the salt shards — both phases map-side
  *    combined);
  *  - a join against a small-but-not-tiny dimension with a few hot
  *    fact keys (the dimension is replicated `salts` times so the hot
  *    key's rows land on `salts` different reducers).
  *
  * The salt is a hash of the whole row (xxhash64 over a stable column
  * set), so it is deterministic — re-running the job re-produces the
  * same shards, which keeps retries and speculative tasks consistent.
  */
object Skew {

  private def saltCol(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts))

  /** groupBy(key).agg(count, sum(valueCol)) with an intermediate salt
    * shard: groupBy(key, salt) partial → groupBy(key) merge. Output
    * columns: key, n, sum_v.
    */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    df.withColumn("_salt", saltCol(df, salts))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("pn"), sum(col(valueCol)).as("ps"))
      .groupBy(col(key))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("sum_v"))
  }

  /** Inner equi-join of a skewed fact against a dimension, hot-key
    * safe: the fact side gets a row-hash salt in [0, salts), the
    * dimension side is exploded once per salt value, and the join key
    * becomes (key, salt) — so a hot key's rows spread over `salts`
    * reducers instead of one straggler.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedFact = fact.withColumn("_salt", saltCol(fact, salts))
    val saltedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("bigint"))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
