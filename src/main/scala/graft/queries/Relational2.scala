package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second tranche of the inherited relational surface (SURVEY §2): SQL
  * text execution (O25 — the reference's only query path,
  * box_export.py:36), CUBE grouping sets, full outer join, pivot, exact
  * percentiles, array functions, conditional aggregation, and running
  * window frames. Same numeric-parity conventions as Relational.scala.
  */
object Relational2 {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    Relational.dsum(c, scale) // compact-decimal fast path; see Relational

  // ---------------------------------------------------------------- q18
  /** O25: a literal SQL string through spark.sql — THE reference query
    * path. The very same text runs on DuckDB as the oracle (ANSI SQL,
    * CTE + window + join + agg). */
  private val q18Sql =
    """WITH cust_orders AS (
      | SELECT c_custkey, c_nationkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY c_custkey
      |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM customer JOIN orders ON o_custkey = c_custkey)
      |SELECT n_name, count(*) AS n_top,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS top_value
      |FROM cust_orders JOIN nation ON n_nationkey = c_nationkey
      |WHERE rn <= 3
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  def q18SqlText(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    s.sql(q18Sql)
  }

  // ---------------------------------------------------------------- q19
  /** CUBE grouping sets (2^2 groupings in one shuffle via Expand). */
  def q19Cube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q19Oracle =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q20
  /** Full outer join of two sparse aggregates (nations present on only
    * one side surface as NULL counts). */
  def q20FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).where(col("c_acctbal") > 9000.0)
      .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, d).where(col("s_acctbal") > 9000.0)
      .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("nk_c") === col("nk_s"), "full_outer")
      .select(
        coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        col("n_cust"), col("n_supp"))
      .orderBy("nationkey")
  }

  private val q20Oracle =
    """SELECT coalesce(c.nk_c, s.nk_s) AS nationkey, c.n_cust, s.n_supp
      |FROM (SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer
      |      WHERE c_acctbal > 9000.0 GROUP BY 1) c
      |FULL JOIN (SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier
      |           WHERE s_acctbal > 9000.0 GROUP BY 1) s ON c.nk_c = s.nk_s
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Pivot (orders by year × status). Spark emits a single pass with
    * conditional aggregates — identical to the CASE-FILTER oracle form. */
  def q21Pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast(LongType).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum(col("o_totalprice")))
      .select(col("yr"), col("F").as("total_f"), col("O").as("total_o"),
        col("P").as("total_p"))
      .orderBy("yr")

  private val q21Oracle =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS total_f,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS total_o,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS total_p
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Exact interpolated percentiles of an integer-valued measure —
    * quartile values land on .25 steps, exact in double, so they
    * hash-match across engines with no rounding tie risk. */
  def q22Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("q50"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        min(col("l_quantity")).as("qmin"),
        max(col("l_quantity")).as("qmax"))
      .orderBy("l_returnflag")

  private val q22Oracle =
    """SELECT l_returnflag,
      | quantile_cont(l_quantity, 0.25) AS q25,
      | quantile_cont(l_quantity, 0.5) AS q50,
      | quantile_cont(l_quantity, 0.75) AS q75,
      | min(l_quantity) AS qmin, max(l_quantity) AS qmax
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Array aggregation + array functions: per-nation sorted distinct
    * segment list (collect_set is unordered — array_sort pins it). The
    * list itself is emitted array_join'd to a string: the harness compare
    * loads results into pandas, which can't sort/hash raw array cells. */
  def q23ArrayAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(
        array_sort(collect_set(col("c_mktsegment"))).as("seg_arr"),
        countDistinct(col("c_mktsegment")).as("n_segments"))
      .select(
        col("c_nationkey"),
        array_join(col("seg_arr"), ",").as("segments"),
        col("n_segments"),
        element_at(col("seg_arr"), 1).as("first_segment"),
        array_contains(col("seg_arr"), "BUILDING").as("has_building"))
      .orderBy("c_nationkey")

  private val q23Oracle =
    """SELECT c_nationkey,
      | array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
      | count(DISTINCT c_mktsegment) AS n_segments,
      | list_sort(list(DISTINCT c_mktsegment))[1] AS first_segment,
      | list_contains(list(DISTINCT c_mktsegment), 'BUILDING') AS has_building
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Split/array scalar functions over strings (tokenize without UDFs). */
  def q24ArrayFns(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("p_name"), " ")
    Tables.part(s, d).select(
      col("p_partkey"),
      size(toks).cast(LongType).as("n_tokens"),
      element_at(toks, 1).as("first_token"),
      array_join(array_sort(toks), ",").as("sorted_tokens"),
      array_join(slice(array_sort(toks), 1, 2), "_").as("first2"))
      .orderBy("p_partkey")
  }

  private val q24Oracle =
    """SELECT p_partkey,
      | CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
      | string_split(p_name, ' ')[1] AS first_token,
      | array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_tokens,
      | array_to_string(list_sort(string_split(p_name, ' '))[1:2], '_') AS first2
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q25
  /** Conditional aggregation: FILTER / count_if / sum(CASE WHEN). */
  def q25ConditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count_if(col("value") > 50.0).as("n_high"),
        dsum(when(col("value") > 50.0, col("value"))).as("high_total"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
      .orderBy("event_type")

  private val q25Oracle =
    """SELECT event_type, count(*) AS n,
      | count(*) FILTER (value > 50.0) AS n_high,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (value > 50.0) AS DOUBLE) AS high_total,
      | min(ts) AS first_ts, max(ts) AS last_ts
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Analytic window frames: running total, lag/lead, moving average —
    * one shuffle on the partition key, sorted once, all frames share it. */
  def q26RunningWindows(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val price = col("o_totalprice").cast(DecimalType(18, 2))
    Tables.orders(s, d)
      .where(col("o_custkey") < 100)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(price).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_total"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        sum(price).over(w.rowsBetween(-2, 0))
          .cast(DoubleType).as("last3_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val q26Oracle =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_run AS DOUBLE) AS running_total,
      | lag(o_orderkey, 1) OVER w AS prev_order,
      | lead(o_orderkey, 1) OVER w AS next_order,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_3 AS DOUBLE) AS last3_total
      |FROM orders WHERE o_custkey < 100
      |WINDOW
      | w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      | w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      | w_3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Explicit GROUPING SETS (not derivable from cube/rollup) plus
    * grouping() disambiguation of the super-aggregate NULLs, through the
    * SQL-text surface. */
  def q27GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q27")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        | CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        | CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        | count(*) AS n
        |FROM lineitem_q27
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, g_rf, g_ls
        |""".stripMargin)
  }

  private val q27Oracle =
    """SELECT l_returnflag, l_linestatus,
      | CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      | CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
      | count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, g_rf, g_ls""".stripMargin

  // ---------------------------------------------------------------- q28
  /** Left and right outer joins with unmatched-side handling (q20 covers
    * full outer): orders per nation INCLUDING nations with no customers. */
  def q28OuterJoins(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    n.join(c, col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"))
      .orderBy("n_name")
  }

  private val q28Oracle =
    """SELECT n_name, count(c_custkey) AS n_customers
      |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q29
  /** Bucketed range join (purchase attribution, batch): every purchase
    * paired with every signup by the same user in the preceding hour.
    * A bare range predicate plans as a nested-loop join — O(n·m) per
    * user; ext.Joins.rangeJoin coarsens time into interval-width buckets
    * so the planner sees an EQUI join on (bucket, user) refined by the
    * exact predicate (PlanSpec asserts no BNLJ/cartesian). Same output
    * as the st5 stream-stream twin, via the batch operator. */
  def q29RangeJoin(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val e = Tables.events(s, d)
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"),
        unix_micros(col("ts")).as("p_t"))
    val iv = e.where(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("s_id"), col("ts").as("s_ts"),
        unix_micros(col("ts")).as("lo"),
        (unix_micros(col("ts")) + hourUs).as("hi"))
    graft.ext.Joins.rangeJoin(p, iv, "p_t", "lo", "hi",
        bucketWidth = hourUs, keys = Seq("user_id"))
      .select(col("user_id"), col("p_id"), col("p_ts"), col("s_id"), col("s_ts"))
      .orderBy("p_id", "s_id")
  }

  private val q29Oracle =
    """SELECT p.user_id, p.event_id AS p_id, p.ts AS p_ts,
      | s.event_id AS s_id, s.ts AS s_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      | ON p.user_id = s.user_id
      | AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 60 MINUTES
      |ORDER BY p_id, s_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q18_sql_text", q18SqlText, Some(q18Sql)),
    QueryDef("q29_range_join", q29RangeJoin, Some(q29Oracle)),
    QueryDef("q27_grouping_sets", q27GroupingSets, Some(q27Oracle)),
    QueryDef("q28_outer_join_agg", q28OuterJoins, Some(q28Oracle)),
    QueryDef("q19_cube", q19Cube, Some(q19Oracle)),
    QueryDef("q20_full_outer", q20FullOuter, Some(q20Oracle)),
    QueryDef("q21_pivot", q21Pivot, Some(q21Oracle)),
    QueryDef("q22_percentiles", q22Percentiles, Some(q22Oracle)),
    QueryDef("q23_array_agg", q23ArrayAgg, Some(q23Oracle)),
    QueryDef("q24_array_fns", q24ArrayFns, Some(q24Oracle)),
    QueryDef("q25_conditional_agg", q25ConditionalAgg, Some(q25Oracle)),
    QueryDef("q26_running_windows", q26RunningWindows, Some(q26Oracle)))
}
