package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Core OLAP surface (SURVEY.md §2.2): the bulk-analytics query shapes
  * the reference's metadata DB answers with Postgres, re-expressed as
  * distributed scan→join→agg plans.
  *
  * Oracle-parity conventions: money math in DECIMAL (exact and
  * order-independent so the DuckDB hash compare can't be broken by
  * float summation order), DOUBLE only on output; dates emitted as
  * strings; every sort a total order.
  *
  * Scale notes: filters sit directly on the scans so parquet pushdown
  * applies; region/nation joins broadcast; the lineitem⋈orders⋈customer
  * joins shuffle on their keys and AQE handles runtime sizing/skew.
  */
object Olap {

  private val dec = "decimal(18,2)"

  /** TPC-H Q1-style pricing summary: single scan, partial-agg shuffle
    * on a 6-value group key.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double")
          .as("sum_base_price"),
        sum(col("l_extendedprice").cast(dec)
          * (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style shipping priority: selective filters pushed to all
    * three scans, then join → group → top-10.
    */
  def q3Topk(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1996-03-15 00:00:00").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(dec)
          * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_str"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-style priority count with an EXISTS semi join: orders of
    * one quarter having at least one returned lineitem, counted per
    * priority. Semi join is the right 100 TB shape — lineitem never
    * projects past its key, dedup is inherent (no pre-distinct
    * exchange), and the returnflag filter lands in the parquet scan.
    */
  def q4Priority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate")
        >= lit("1995-01-01 00:00:00").cast("timestamp"))
      .filter(col("o_orderdate")
        < lit("1995-04-01 00:00:00").cast("timestamp"))
      .join(Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o_orderkey")),
        Seq("o_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** TPC-H Q7-style two-nation volume: revenue between different
    * nations (either side in nations 0-2) per supplier nation,
    * customer nation and ship year. The nation dimension broadcasts
    * twice under distinct aliases and supplier broadcasts; the only
    * fact shuffles are the orderkey and custkey joins, which AQE
    * sizes at runtime.
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"),
      col("l_suppkey"), year(col("l_shipdate")).as("l_year"),
      (col("l_extendedprice").cast(dec)
        * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("volume"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation")
        && (col("s_nk") < 3 || col("c_nk") < 3))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(col("volume")).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q18-style large-volume customers: orders whose total
    * quantity exceeds 250 joined back to orders and customer, top-100
    * by total price. The HAVING filter collapses lineitem to
    * qualifying orderkeys BEFORE any join — one partial-agg shuffle
    * over the fact, then a key join whose right side has already
    * shrunk by orders of magnitude.
    */
  def q18Large(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast(dec)).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    // qualifying orders are HAVING-bounded (rare at any scale), so THEY
    // broadcast into the customer join — broadcasting customer itself
    // would ship a 100 TB deployment's whole customer dimension
    val qualified = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .join(big, col("o_orderkey") === col("l_orderkey"))
    broadcast(qualified)
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_str"),
        col("o_totalprice"),
        col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q10-style returned-item report: customers ranked by revenue
    * of returned lineitems. The returnflag filter lands in the parquet
    * scan; customer/nation are the broadcast dimensions; the only fact
    * shuffles are the orderkey join and the per-customer aggregate.
    */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast(dec)
          * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("rev"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    // nation is always tiny → hinted broadcast; customer grows with SF
    // so its join strategy is left to stats (broadcast at small SF,
    // shuffle join once it outgrows the threshold)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q5-style local-supplier volume: 6-table join; region→nation
    * broadcast down the dimension chain, facts shuffle on join keys.
    */
  def q5RegionJoin(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(dec)
          * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("rev"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy("n_name")
  }

  /** TPC-H Q6-style revenue forecast: the pushdown showcase — every
    * predicate reaches the parquet scan, then a single global sum (one
    * partial-agg per partition, one-row shuffle).
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_discount").between(0.05, 0.07))
      .filter(col("l_quantity") < 24)
      .agg(
        sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))

  /** Exact percentiles per group (Spark `percentile` ↔ DuckDB
    * `quantile_cont`, same linear interpolation).
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_extendedprice, 0.99)").as("p99_price"))
      .orderBy("l_returnflag")

  /** KLL quantile sketches in their exact regime, oracle-checked — the
    * sketch twin of [[qPercentiles]] and the KLL counterpart of
    * `doc_source_overlap`'s exact-regime theta check: per-returnflag
    * sketches of l_quantity estimate p50/p90, and a global "ALL" row
    * comes from the UNION of the per-flag sketches — the incremental
    * roll-up path itself under the oracle hash. With k = 2¹⁷ above
    * the sf0.01 row count no compaction ever fires, so every estimate
    * is exactly the element at rank ⌊q·n⌋ (capped n−1) of the sorted
    * column — which the DuckDB twin reads off a sorted list directly.
    * At bench scale (600 k rows > k) the same query runs estimating —
    * the regime ApproxSpec bounds. The exchange carries sketches
    * (O(k) doubles per group), never row values.
    */
  def qSketchQuantile(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.QuantileSketch
    val k = 1 << 17
    val per = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(QuantileSketch.sketchAgg(
          col("l_quantity").cast("double"), k).as("sk"),
        count(lit(1)).as("n"))
    val glob = per.agg(
        QuantileSketch.unionAgg(col("sk")).as("sk"), sum(col("n")).as("n"))
      .select(lit("ALL").as("flag"), col("sk"), col("n"))
    per.select(col("l_returnflag").as("flag"), col("sk"), col("n"))
      .unionByName(glob)
      .select(col("flag"), col("n"),
        round(QuantileSketch.estimate(col("sk"), 0.5), 6).as("p50"),
        round(QuantileSketch.estimate(col("sk"), 0.9), 6).as("p90"))
      .orderBy("flag")
  }

  /** Sketch-based statistics — the 100 TB twin of q_percentiles /
    * countDistinct: HyperLogLog++ distinct counts and quantile sketches
    * have constant-size partial state per group, so the shuffle carries
    * sketches instead of values. Exactness is spec-checked against the
    * exact aggregates within the documented error bounds (not
    * oracle-hashed: sketch internals are engine-specific by design).
    */
  def approxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02)
          .as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx_p50"),
        expr("percentile(l_quantity, 0.5)").as("exact_p50"))
      .orderBy("l_returnflag")

  /** Pearson correlation of (quantity, extendedprice) per return flag,
    * computed from DECIMAL-exact moment sums — native corr() folds
    * doubles in partition order and can't hash-match across engines;
    * exact Σx, Σy, Σxy, Σx², Σy² are order-independent, and the final
    * double formula is a fixed expression both engines evaluate
    * identically.
    */
  def qCorr(spark: SparkSession, dir: String): DataFrame = {
    val bigDec = "decimal(38,6)"
    val x = col("l_quantity").cast(bigDec)
    val y = col("l_extendedprice").cast(bigDec)
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round(
          (col("n") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
          / (sqrt(col("n") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
            * sqrt(col("n") * col("syy").cast("double")
              - col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** RANGE-frame moving window: per-supplier 7-day moving quantity
    * over ship days. Pre-aggregates to one row per (supplier, day)
    * first — the range frame then slides over the small daily series,
    * not the raw fact; both the agg and the window hash on suppkey so
    * the exchange is reused.
    */
  def winMovingRange(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") < 20)
      .select(col("l_suppkey"),
        datediff(col("l_shipdate"), lit("1970-01-01").cast("date"))
          .as("ship_day"),
        col("l_quantity"))
      .groupBy("l_suppkey", "ship_day")
      .agg(sum(col("l_quantity").cast(dec)).as("day_qty"))
    val w = Window.partitionBy("l_suppkey").orderBy("ship_day")
      .rangeBetween(-6, Window.currentRow)
    daily
      .withColumn("mv7_qty", sum(col("day_qty")).over(w).cast("double"))
      .select(col("l_suppkey"), col("ship_day"),
        col("day_qty").cast("double").as("day_qty"), col("mv7_qty"))
      .orderBy("l_suppkey", "ship_day")
  }

  /** TPC-H Q8-style market share: of the PROMO-part revenue sold to
    * AMERICA-region customers, the fraction supplied from NATION_5,
    * per order year. Part keys (type-filtered), supplier→nation and
    * the customer-side nation⋈region chain all broadcast; the only
    * fact shuffles are the orderkey and custkey joins. The share
    * division happens on exact DECIMAL year sums, cast to double only
    * at the edge.
    */
  def q8Share(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val sn = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val amer = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(amer), col("c_nationkey") === col("c_nk"))
      .select("c_custkey")
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(dec)
          * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("volume"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === "NATION_5", col("volume"))
          .otherwise(lit(0).cast(dec))).as("nation_vol"),
        sum(col("volume")).as("total_vol"))
      .select(col("o_year"),
        round(col("nation_vol").cast("double")
          / col("total_vol").cast("double"), 6).as("mkt_share"),
        col("total_vol").cast("double").as("total_vol"))
      .orderBy("o_year")
  }

  /** TPC-H Q9-style product-line profit (adapted: no partsupp table in
    * this schema, so profit = discounted revenue): parts matching a
    * name pattern, revenue per supplier nation per order year. The
    * part filter can't push to parquet as a range but the LIKE still
    * evaluates scan-side; matching part keys and supplier→nation
    * broadcast, facts shuffle on their join keys only.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").contains("red")).select("p_partkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(dec)
          * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("amount"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(col("amount")).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q12-style shipping-latency audit (adapted: this lineitem
    * has no shipmode/commitdate, so the bucket is ship lag vs the
    * order date): one year of lineitems bucketed LATE (>60 days from
    * order to ship) vs ONTIME, counting high- vs low-priority orders
    * in each bucket. The year filter pushes to the lineitem scan; one
    * orderkey join; the case-sums collapse map-side to a 2-row result.
    */
  def q12Latency(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate")
        >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate")
        < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("l_orderkey", "l_shipdate")
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("ship_bucket",
        when(datediff(col("l_shipdate"), col("o_orderdate")) > 60,
          lit("LATE")).otherwise(lit("ONTIME")))
      .groupBy("ship_bucket")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("ship_bucket")

  }

  /** TPC-H Q21-style waiting-supplier audit (adapted: no commitdate,
    * so "late" is [[q12Latency]]'s definition — shipped more than 60
    * days after the order date): among finished multi-supplier
    * orders, the suppliers who were the ONLY late one. The classic
    * double EXISTS/NOT EXISTS collapses into one derivation: per-
    * (order, supplier) late flags (map-side-combined — the exchange
    * carries one row per pair, never per lineitem), a per-order
    * census filtered to exactly-one-late multi-supplier orders, and a
    * blame join back on the orderkey. Both census sides are
    * fact-derived and key-uniform, so the shuffle joins are the right
    * strategy; supplier names broadcast at the end and the final
    * ranking is a bounded TakeOrdered, not a global sort.
    */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val perSupp = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(
        when(datediff(col("l_shipdate"), col("o_orderdate")) > 60, 1)
          .otherwise(0)).as("late"))
    val blamed = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .select("l_orderkey")
    perSupp.filter(col("late") === 1)
      .join(blamed, "l_orderkey")
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** TPC-H Q13-style customer order-count distribution: how many
    * customers placed N non-urgent orders, including N=0. Orders
    * collapse to a per-custkey count BEFORE touching customer (the
    * fact shrinks ~10× ahead of the join), then the left join keeps
    * order-less customers and the distribution is a second tiny agg.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"))
    Tables.customer(spark, dir).select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14-style promo revenue share: fraction of one month's
    * revenue from PROMO-type parts. The month filter pushes to the
    * lineitem scan, part broadcasts, and both case-sums stay DECIMAL
    * until the output division.
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate")
        >= lit("1997-09-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate")
        < lit("1997-10-01 00:00:00").cast("timestamp"))
      .select(col("l_partkey"),
        (col("l_extendedprice").cast(dec)
          * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("rev"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev"))
          .otherwise(lit(0).cast(dec))).as("promo_rev"),
        sum(col("rev")).as("total_rev"))
      .select(
        round(lit(100.0) * col("promo_rev").cast("double")
          / col("total_rev").cast("double"), 6).as("promo_share"),
        col("total_rev").cast("double").as("total_rev"))
  }

  /** TPC-H Q15-style top supplier: the supplier(s) with maximum
    * quarterly revenue. Revenue per supplier is one partial-agg
    * shuffle; the global max is a one-row aggregate broadcast back
    * into the (already tiny) per-supplier result — no window over the
    * fact, no second fact scan. Ties all surface (ordered by key).
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate")
        >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate")
        < lit("1997-04-01 00:00:00").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast(dec)
        * (lit(1).cast(dec) - col("l_discount").cast(dec)))
        .as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.join(broadcast(top),
        col("total_revenue") === col("max_revenue"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17-style small-quantity revenue: average yearly revenue
    * lost if one brand's small orders (< 20% of that part's mean
    * quantity) were dropped. Brand part keys broadcast into the scan;
    * the per-part mean and the qualifying rows come from the SAME
    * brand-filtered slice (two passes over ~1/25th of the fact, never
    * the whole table); the 0.2×avg comparison cross-multiplies
    * (5·qty·n < Σqty) so everything stays integer/DECIMAL-exact — no
    * engine-specific division or float rounding in the predicate.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#23").select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val perPart = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("l_quantity").cast(dec)).as("sum_qty"),
        count(lit(1)).as("n_li"))
    li.join(broadcast(perPart), col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity").cast(dec) * 5 * col("n_li")
        < col("sum_qty"))
      .agg(sum(col("l_extendedprice").cast(dec)).as("small_rev"),
        count(lit(1)).as("n_small"))
      .select(
        round(col("small_rev").cast("double") / 7.0, 6).as("avg_yearly"),
        col("n_small"))
  }

  /** TPC-H Q19-style disjunctive-predicate revenue: three OR'd
    * (brand, size-range, quantity-range) bundles. The join stays a
    * single broadcast hash join on partkey with the disjunction as a
    * post-join filter — Catalyst must not fall back to a nested-loop
    * join just because the residual predicate is an OR (PlanSweepSpec
    * would catch that).
    */
  def q19Disjunction(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val qty = col("l_quantity")
    val bundle =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)
        && qty.between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)
        && qty.between(10, 20)) ||
      (col("p_brand") === "Brand#4" && col("p_size").between(1, 35)
        && qty.between(20, 30))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), qty,
        (col("l_extendedprice").cast(dec)
          * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("rev"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(bundle)
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q22-style idle high-balance customers: per market segment,
    * customers whose balance beats the positive-balance average but
    * who have never ordered. The average is a one-row census
    * cross-joined back (broadcast by construction); the threshold
    * cross-multiplies (bal·n > Σbal) to stay DECIMAL-exact; the
    * no-orders test is a left-anti join on custkey — no distinct, no
    * subquery re-scan.
    */
  def q22Idle(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val census = cust.filter(col("c_acctbal") > 0)
      .agg(sum(col("c_acctbal").cast(dec)).as("sum_bal"),
        count(lit(1)).as("n_pos"))
    cust.crossJoin(broadcast(census))
      .filter(col("c_acctbal").cast(dec) * col("n_pos") > col("sum_bal"))
      .join(Tables.orders(spark, dir).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(dec)).cast("double").as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q2-style min-cost supplier: for a part slice (type+size),
    * the European supplier(s) offering the lowest unit price. The
    * testdata has no `partsupp` table, so the supply relation derives
    * from lineitem: unit cost = min(extendedprice/quantity) per
    * (part, supplier) pair — the same correlated-min shape as Q2's
    * `ps_supplycost = (SELECT min ...)`.
    *
    * Scale: both dimension slices broadcast into the fact scan (part
    * slice prunes ~95% of lineitems BEFORE the pair aggregation, the
    * region-filtered supplier side prunes ~80%), the pair agg is one
    * map-side-combined shuffle, and the per-part min is an aggregate
    * + equality join-back on partkey — the q15 pattern, no window
    * over the pairs.
    */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame = {
    val slice = Tables.part(spark, dir)
      .filter(col("p_type") === "LARGE" && col("p_size").between(1, 15))
      .select("p_partkey", "p_name")
    val eur = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val pairs = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(broadcast(slice.select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
    val mn = pairs.groupBy(col("l_partkey").as("m_partkey"))
      .agg(min(col("unit_cost")).as("min_cost"))
    pairs.join(mn, col("l_partkey") === col("m_partkey")
        && col("unit_cost") === col("min_cost"))
      .join(broadcast(slice), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        round(col("unit_cost"), 6).as("unit_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q11-style important-value parts: parts whose revenue
    * through one region's suppliers exceeds a fixed fraction of that
    * region's total. `partsupp.availqty*supplycost` becomes
    * lineitem-derived revenue (same grouped-value-vs-global-total
    * shape). The global total is a one-row aggregate broadcast back;
    * the threshold cross-multiplies (value·1000 > total) so the
    * comparison stays DECIMAL-exact — no division anywhere.
    */
  def q11ImportantValue(spark: SparkSession, dir: String): DataFrame = {
    val asiaSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val value = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(dec)
          * (lit(1).cast(dec) - col("l_discount").cast(dec))).as("rev"))
      .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(col("rev")).as("value"))
    val total = value.agg(sum(col("value")).as("total"))
    value.crossJoin(broadcast(total))
      .filter(col("value") * 1000 > col("total"))
      .select(col("l_partkey").as("partkey"),
        col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("partkey"))
  }

  /** TPC-H Q16-style supplier breadth: distinct supplier count per
    * (brand, type, size) over a negated part slice, excluding
    * flagged suppliers (negative balance stands in for Q16's
    * complaint filter). The exclusion is a broadcast left-anti on the
    * fact scan, the part slice broadcasts, and count(DISTINCT)
    * expands to Spark's two-phase partial-distinct aggregate — no
    * pre-shuffle of raw (group, suppkey) duplicates survives the
    * map side.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val pslice = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#21" && col("p_type") =!= "PROMO"
        && col("p_size") <= 20)
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val flagged = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(pslice), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20-style dominant supplier: suppliers in one region who
    * shipped more than half of a name-sliced part's 1997 volume.
    * Q20's `ps_availqty > 0.5 * sum(l_quantity)` correlated test
    * becomes share-of-part dominance: per-pair quantity vs per-part
    * total, cross-multiplied (2·s_qty > t_qty, DECIMAL-exact). The
    * dominance set is a distinct-suppkey semi-join into the supplier
    * dimension — the fact is scanned once, name+date filters pushed.
    */
  def q20DominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    val pn = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("small "))
      .select("p_partkey")
    val sq = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate")
        >= lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate")
        < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(pn), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast(dec)).as("s_qty"))
    val tot = sq.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("s_qty")).as("t_qty"))
    val dominant = sq.join(tot, col("l_partkey") === col("t_partkey"))
      .filter(col("s_qty") * 2 > col("t_qty"))
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), round(col("s_acctbal"), 2).as("s_acctbal"))
      .orderBy("s_name")
  }

  /** CUBE over (returnflag, linestatus): all four grouping sets —
    * detail, two marginals, grand total — in ONE pass with map-side
    * partial aggregation (Spark Expand + hash agg; never four scans).
    * `grouping_id` disambiguates a real value from a rolled-up NULL.
    * Single-table cube, so Spark 4.1's DetectAmbiguousSelfJoin
    * rollup/cube trap (see ImagingOps.storageRollup) doesn't apply.
    */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping_id(col("l_returnflag"), col("l_linestatus"))
          .cast("bigint").as("gid"),
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double")
          .as("sum_price"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("gid"), col("sum_qty"), col("sum_price"), col("n"))
      .orderBy("gid", "flag", "status")

  /** Window functions: per-supplier running quantity + row rank over a
    * total order (ties broken by the unique (orderkey, linenumber)).
    */
  def winRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") < 10)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_quantity").cast(dec).as("qty"))
      .withColumn("running_qty",
        sum(col("qty")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("double"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_str"),
        col("running_qty"), col("rn"))
      .orderBy("l_suppkey", "rn")
  }
}
