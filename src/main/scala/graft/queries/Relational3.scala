package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third tranche of the inherited relational surface: correlated
  * subqueries (scalar + EXISTS/NOT EXISTS — Catalyst's decorrelation
  * rewrites them to aggregated outer joins and semi/anti joins, the plan
  * a user of the reference's raw-SQL path, box_export.py:36, gets for
  * free) and the lateral/generator surface (posexplode, explode +
  * aggregate). Counts are used for every correlated comparison so no
  * cross-engine floating-point boundary exists.
  */
object Relational3 {

  // ---------------------------------------------------------------- q30
  /** Correlated scalar COUNT subqueries + EXISTS + NOT EXISTS in one SQL
    * text (the reference's O25 path). Catalyst decorrelates: the scalar
    * counts become left outer joins onto per-key aggregates, EXISTS a
    * left semi join, NOT EXISTS a left anti join — all equi-joins on
    * o_custkey, shuffle-partitioned once and reused. Integer-only
    * comparisons: no float threshold can diverge between engines. */
  private val q30Sql =
    """SELECT c_custkey,
      | (SELECT count(*) FROM orders o
      |  WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE (SELECT count(*) FROM orders o
      |       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000) >= 2
      |  AND EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  def q30CorrelatedSubqueries(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(q30Sql)
  }

  // ---------------------------------------------------------------- q31
  /** Lateral position-aware explode: first five tokens of each document
    * with their positions (posexplode — Spark's Generate operator). */
  def q31LateralPosexplode(s: SparkSession, d: String): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    Tables.documents(s, d)
      .where(col("doc_id") < 10)
      .select(col("doc_id"), posexplode(slice(toks, 1, 5)))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
        col("col").as("tok"))
      .orderBy("doc_id", "pos")
  }

  private val q31Oracle =
    """WITH toks AS (
      | SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS ts
      | FROM documents WHERE doc_id < 10),
      |px AS (
      | SELECT doc_id, unnest(list_transform(
      |   range(1, least(len(ts), 5) + 1),
      |   i -> {'pos': i - 1, 'tok': ts[i]})) AS u
      | FROM toks)
      |SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.tok AS tok
      |FROM px ORDER BY doc_id, pos""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Explode + aggregate + top-k: corpus-wide token frequencies. The
    * explode is a narrow Generate; the count aggregates partially before
    * its one shuffle; the top-20 plans as TakeOrderedAndProject (never a
    * global sort). Ties broken by token for determinism. */
  def q32TokenFrequencies(s: SparkSession, d: String): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    Tables.documents(s, d)
      .select(explode(toks).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)
  }

  private val q32Oracle =
    """SELECT tok, count(*) AS n FROM (
      | SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |   t -> len(t) > 0)) AS tok
      | FROM documents) t
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q33
  private def purchases(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")

  private def signups(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).where(col("event_type") === "signup")
      .select("user_id", "ts", "event_id")

  /** Forward as-of: earliest signup at-or-after each purchase (the
    * mirror of q15; same one-shuffle union-and-carry plan, descending). */
  def q33AsofForward(s: SparkSession, d: String): DataFrame =
    graft.ext.Joins.asofForward(
        purchases(s, d), signups(s, d), keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", tiebreak = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_match.ts").as("next_signup_ts"))
      .orderBy("event_id")

  private val q33Oracle =
    """SELECT p.event_id, p.user_id, p.ts, s.ts AS next_signup_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      | ON p.user_id = s.user_id AND p.ts <= s.ts
      |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Nearest as-of: the signup closest in time to each purchase in
    * either direction, backward winning distance ties (pandas
    * merge_asof direction='nearest'). One shuffle, two in-partition
    * window sorts, zero joins; the oracle composes DuckDB's two
    * directional ASOF joins with the same tie rule. */
  def q34AsofNearest(s: SparkSession, d: String): DataFrame =
    graft.ext.Joins.asofNearest(
        purchases(s, d), signups(s, d), keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", tiebreak = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_match.ts").as("nearest_signup_ts"))
      .orderBy("event_id")

  private val q34Oracle =
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT * FROM events WHERE event_type = 'signup'),
      |b AS (SELECT p.event_id, s.ts AS b_ts FROM p
      |      ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts),
      |f AS (SELECT p.event_id, s.ts AS f_ts FROM p
      |      ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts <= s.ts)
      |SELECT p.event_id, p.user_id, p.ts,
      | CASE WHEN b_ts IS NULL THEN f_ts
      |      WHEN f_ts IS NULL THEN b_ts
      |      WHEN p.ts - b_ts <= f_ts - p.ts THEN b_ts ELSE f_ts END
      |   AS nearest_signup_ts
      |FROM p JOIN b USING (event_id) JOIN f USING (event_id)
      |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------- q35
  /** The remaining analytic-window family in one gate: lead/lag (offset
    * functions), ntile (bucketing), percent_rank and cume_dist (both are
    * single divisions of small integers — exactly rounded IEEE in any
    * engine, so the doubles hash-match). Partitioned by customer over
    * order history. */
  def q35WindowSuite(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .where(col("o_custkey") % 100 === 0)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val q35Oracle =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      | lag(o_totalprice, 1) OVER w AS prev_price,
      | lead(o_totalprice, 1) OVER w AS next_price,
      | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      | percent_rank() OVER w AS pr,
      | cume_dist() OVER w AS cd
      |FROM orders WHERE o_custkey % 100 = 0
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q35_window_suite", q35WindowSuite, Some(q35Oracle)),
    QueryDef("q30_correlated_subqueries", q30CorrelatedSubqueries, Some(q30Sql)),
    QueryDef("q31_lateral_posexplode", q31LateralPosexplode, Some(q31Oracle)),
    QueryDef("q32_token_frequencies", q32TokenFrequencies, Some(q32Oracle)),
    QueryDef("q33_asof_forward", q33AsofForward, Some(q33Oracle)),
    QueryDef("q34_asof_nearest", q34AsofNearest, Some(q34Oracle)))
}
