package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The inherited relational surface (SURVEY §2 "inherited relational
  * surface"): the reference delegates every relational operation to
  * `spark.sql(query)` (reference: box_export.py:36). These queries pin that
  * surface down operator family by operator family — scan, filter,
  * hash/broadcast join, semi/anti join, partial+final aggregation, window,
  * rollup, set ops, top-k, scalar functions, JSON access, as-of join — each
  * with a DuckDB oracle.
  *
  * Numeric-parity convention: double aggregates go through
  * DECIMAL(18,s) per-row casts in BOTH engines, so sums are exact and
  * order-independent (a plain double sum is partial-aggregation-order-
  * dependent and can't hash-match an oracle) — then the FINAL value is
  * cast to DOUBLE on both sides. The final double cast matters for the
  * harness: Spark-written parquet decimals surface as java/python Decimal
  * objects that keep trailing zeros ("254462.00") while DuckDB decimals
  * surface as float64 ("254462.0"), so a decimal-typed output column
  * string-mismatches whenever a value ends in a zero digit. A
  * decimal→double conversion is correctly rounded in both engines
  * (unscaled values stay < 2^53 at oracle scale), so doubles compare
  * bit-identically. Integer-ish results are cast to BIGINT on both sides
  * (DuckDB widens integer sums to HUGEINT; Spark's count/length/year
  * differ in width).
  */
object Relational {

  /** Exact, order-independent sum of a double expression; final value as
    * DOUBLE (see numeric-parity convention above). Implementation: the
    * per-row decimal quantization runs as the codegen'd DoubleScaled
    * (round(c·10^s) → unscaled long, DuckDB-rounding — see its scaladoc),
    * so the sum stays on Spark Decimal's compact long-backed fast path;
    * summing CAST(c AS DECIMAL(18,s)) directly costs a Double.toString
    * per value, ~10× this plan's CPU, for identical results on decimal
    * inputs. The unscaled sum is re-scaled exactly in decimal, then cast
    * to double. */
  private[queries] def dsum(c: Column, scale: Int = 2): Column =
    (sum(graft.functions.GraftFunctions.doubleScaled(c, scale)
        .cast(DecimalType(18, 0)))
      / lit(math.pow(10, scale).toLong))
      .cast(DoubleType)

  private def ts(s: String): Column = to_timestamp(lit(s))

  // ---------------------------------------------------------------- q1
  /** Full-scan partial+final aggregation (TPC-H Q1 shape). At scale: one
    * shuffle on the 2 low-cardinality group keys; map-side combine does
    * nearly all the work; scan reads only the 7 referenced columns.
    */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        // price/discount/tax carry 2 decimals → their products are exact at
        // scale 4 (two factors) / 6 (three): no round-half ties across engines
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Oracle =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      | CAST(sum(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      | count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  /** Global top-k: planner emits TakeOrderedAndProject — per-partition
    * top-k then a k-row merge on the driver; no full sort at any scale.
    */
  def q2TopOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  private val q2Oracle =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q3
  /** 3-way join + agg + top-k (TPC-H Q3 shape). customer is the small
    * side → broadcast; orders⋈lineitem shuffles on orderkey only.
    */
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cutoff = ts("1998-06-01 00:00:00")
    val c = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).where(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(s, d).where(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(10)
  }

  private val q3Oracle =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      | CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      | AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00' AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q4
  /** EXISTS → left-semi join with a non-equi conjunct; aggregation after. */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q4Oracle =
    """SELECT o_orderpriority, count(*) AS order_count FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q5
  /** 6-way star join (TPC-H Q5 shape). region/nation/supplier/customer are
    * dimensions → broadcast; only orders⋈lineitem is a shuffled join at
    * 100 TB. Filters reach the scans (partition-prunable on o_orderdate).
    */
  def q5LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).where(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
             col("o_orderdate") < ts("1999-01-01 00:00:00"))
    val l = Tables.lineitem(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c),
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy("n_name")
  }

  private val q5Oracle =
    """SELECT n_name,
      | CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      | AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      | AND r_name = 'ASIA'
      | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q6
  /** Scan + range predicates + scalar agg (TPC-H Q6 shape): all three
    * predicates push to the parquet reader; no shuffle beyond the 1-row
    * final agg.
    */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
             col("l_shipdate") < ts("1998-01-01 00:00:00") &&
             col("l_discount").between(0.02, 0.04) &&
             col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))

  private val q6Oracle =
    """SELECT CAST(sum(CAST(l_extendedprice*l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      | AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24.0""".stripMargin

  // ---------------------------------------------------------------- q7
  /** Ranking window: top-2 orders per customer. One shuffle on the
    * partition key; rank pushdown (WindowGroupLimit) keeps per-key state
    * at 2 rows before the filter at scale.
    */
  def q7TopOrdersPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .where(col("rn") <= 2)
      .orderBy("o_custkey", "rn")
  }

  private val q7Oracle =
    """SELECT * FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      | FROM orders) t
      |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q8
  /** NOT EXISTS → left-anti join (broadcast the filtered orders side). */
  def q8QuietCustomers(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val bigOrders = Tables.orders(s, d).where(col("o_totalprice") > 300000.0)
      .select("o_custkey")
    c.join(bigOrders, col("o_custkey") === col("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  private val q8Oracle =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q9
  /** Set operations: (UNION ∩ INTERSECT) \ EXCEPT, all distinct-set
    * semantics (Spark `.union.distinct`, `.intersect`, `.except`).
    */
  def q9SetOps(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val a = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val b = o.where(col("o_totalprice") > 250000.0).select(col("o_custkey").as("c_custkey"))
    val i = c.where(col("c_acctbal") > 1000.0).select(col("c_custkey"))
    val e = c.where(col("c_nationkey") < 5).select(col("c_custkey"))
    a.union(b).distinct().intersect(i).except(e).orderBy("c_custkey")
  }

  private val q9Oracle =
    """SELECT * FROM (
      | SELECT c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION
      |  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 250000.0) u
      | INTERSECT
      | SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0
      |) t
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_nationkey < 5
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q10
  /** ROLLUP grouping sets; NULLS FIRST pinned on both sides (Spark ASC
    * default is nulls-first, DuckDB's is nulls-last).
    */
  def q10Rollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q10Oracle =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Scalar string/math functions — all codegen'd, no UDFs. */
  def q11ScalarFns(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      length(col("p_name")).cast(LongType).as("name_len"),
      substring(col("p_type"), 1, 5).as("type5"),
      concat_ws("-", col("p_brand"), col("p_size").cast(StringType)).as("brand_size"),
      floor(col("p_retailprice")).cast(LongType).as("price_floor"),
      abs(col("p_retailprice") - 1000.0).as("price_diff"))
      .orderBy("p_partkey")

  private val q11Oracle =
    """SELECT p_partkey, upper(p_brand) AS brand_u, CAST(length(p_name) AS BIGINT) AS name_len,
      | substr(p_type, 1, 5) AS type5,
      | concat_ws('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
      | CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      | abs(p_retailprice - 1000.0) AS price_diff
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Date-part extraction + aggregation. */
  def q12MonthlyOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("yr", "mo")

  private val q12Oracle =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo,
      | count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Tumbling-window aggregation over the event stream, batch form. The
    * streaming twin (graft.streaming.EventStream) runs the same plan with
    * `readStream` + watermark; date_trunc == window(ts, '1 hour').start.
    */
  def q13EventsHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("hour", "event_type")

  private val q13Oracle =
    """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Semi-structured access: JSON field extraction from a string column. */
  def q14JsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .orderBy("event_id")

  private val q14Oracle =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q15
  /** As-of join (latest signup at-or-before each purchase, per user).
    * Spark has no ASOF JOIN; the scalable form is NOT a range self-join
    * (quadratic per user) but a single shuffle: union both sides, one
    * window sorted by (ts, side), carry the last signup ts forward.
    * Oracle uses DuckDB's native ASOF LEFT JOIN.
    */
  def q15AsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = e.where(col("event_type") === "signup")
      .select("user_id", "ts", "event_id")
    graft.ext.Joins.asofBackward(
      purchases, signups, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "ts", tiebreak = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_match.ts").as("signup_ts"))
      .orderBy("event_id")
  }

  private val q15Oracle =
    """SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      | ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY p.event_id""".stripMargin

  /** q15 with a merge_asof-style tolerance: a signup more than 7 days
    * before the purchase no longer attributes (the match nulls out).
    * DuckDB's ASOF has no tolerance knob, so the oracle post-filters the
    * matched timestamp with the same inequality. */
  def q51AsofTolerance(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = e.where(col("event_type") === "signup")
      .select("user_id", "ts", "event_id")
    graft.ext.Joins.asofBackward(
      purchases, signups, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "ts", tiebreak = Seq("event_id"),
      tolerance = Some(expr("INTERVAL 7 DAYS")))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_match.ts").as("signup_ts"))
      .orderBy("event_id")
  }

  private val q51Oracle =
    """SELECT p.event_id, p.user_id, p.ts,
      | CASE WHEN p.ts <= s.ts + INTERVAL 7 DAYS THEN s.ts END AS signup_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      | ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Distinct aggregation (expands to two-phase distinct agg). */
  def q16DistinctCounts(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  private val q16Oracle =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
      | count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Correlated scalar-subquery shape: orders above their customer's
    * average order value — expressed as join against a pre-aggregate
    * (the scalable plan Catalyst would rewrite the subquery into).
    * "price > avg" is compared as "price * n > sum" so the whole predicate
    * stays in exact decimal arithmetic (decimal division rounds at
    * engine-specific scales and can't hash-match across engines).
    */
  def q17AboveCustomerAvg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val aggByCust = o.groupBy(col("o_custkey").as("ac_custkey"))
      .agg(
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("sum_price"),
        count(lit(1)).as("n_orders"))
    o.join(aggByCust, col("o_custkey") === col("ac_custkey"))
      .where(col("o_totalprice").cast(DecimalType(18, 2)) * col("n_orders") > col("sum_price"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  private val q17Oracle =
    """SELECT o_orderstatus, count(*) AS n
      |FROM orders o
      |JOIN (SELECT o_custkey AS ac_custkey,
      |        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_price, count(*) AS n_orders
      |      FROM orders GROUP BY 1) a
      | ON o.o_custkey = a.ac_custkey
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n_orders > sum_price
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing_summary", q1PricingSummary, Some(q1Oracle), bench = true),
    QueryDef("q2_top_orders", q2TopOrders, Some(q2Oracle)),
    QueryDef("q3_shipping_priority", q3ShippingPriority, Some(q3Oracle), bench = true),
    QueryDef("q4_order_priority", q4OrderPriority, Some(q4Oracle), bench = true),
    QueryDef("q5_local_supplier", q5LocalSupplier, Some(q5Oracle), bench = true),
    QueryDef("q6_forecast_revenue", q6ForecastRevenue, Some(q6Oracle), bench = true),
    QueryDef("q7_top_orders_per_customer", q7TopOrdersPerCustomer, Some(q7Oracle), bench = true),
    QueryDef("q8_quiet_customers", q8QuietCustomers, Some(q8Oracle)),
    QueryDef("q9_set_ops", q9SetOps, Some(q9Oracle)),
    QueryDef("q10_rollup", q10Rollup, Some(q10Oracle)),
    QueryDef("q11_scalar_fns", q11ScalarFns, Some(q11Oracle)),
    QueryDef("q12_monthly_orders", q12MonthlyOrders, Some(q12Oracle)),
    QueryDef("q13_events_hourly", q13EventsHourly, Some(q13Oracle), bench = true),
    QueryDef("q14_json_extract", q14JsonExtract, Some(q14Oracle)),
    QueryDef("q15_asof_join", q15AsofJoin, Some(q15Oracle), bench = true),
    QueryDef("q51_asof_tolerance", q51AsofTolerance, Some(q51Oracle)),
    QueryDef("q16_distinct_counts", q16DistinctCounts, Some(q16Oracle)),
    QueryDef("q17_above_customer_avg", q17AboveCustomerAvg, Some(q17Oracle)))
}
