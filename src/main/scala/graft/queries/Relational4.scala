package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fourth tranche of the inherited relational surface: the statistical
  * aggregate family (corr / covariance / variance / stddev / linear
  * regression), time-series resampling with gap fill, threshold fuzzy
  * joins, and trailing time-range window aggregation — the analytics a
  * user of the reference's raw-SQL path (box_export.py:36) reaches for
  * next after the plain aggregate/window families.
  */
object Relational4 {

  // ---------------------------------------------------------------- q36
  /** Statistical aggregates via EXACT integer moments.
    *
    * Spark's built-in `corr`/`stddev_samp`/`covar_samp` stream doubles
    * through a merge formula whose result depends on partition order —
    * correct to ~1 ulp but not bit-stable across engines, so they can
    * never hash-match an oracle. Instead: quantities and prices are
    * scaled to exact integers (cents), the five moments (n, Σx, Σy, Σxy,
    * Σx², Σy²) are summed in DecimalType(38,0) — exact, order-independent,
    * and still exact at 100 TB (Σy² ≈ 1e14/row → 1e38 capacity ≈ 1e24
    * rows of headroom) — and each statistic is derived in the final
    * projection as a SINGLE double division (or sqrt/mul/div chain of
    * individually-rounded IEEE ops) over double-cast exact numerators:
    *   var_samp  = (nΣx² − (Σx)²) / (n(n−1))
    *   covar     = (nΣxy − ΣxΣy) / (n(n−1))
    *   corr      = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))
    *   slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)
    * The numerator/denominator arithmetic is exact (decimal in Spark,
    * HUGEINT in the DuckDB oracle); the double ops are identical
    * expression trees in both engines, hence bit-identical results.
    * One partial-aggregated shuffle, integer math in codegen — this is
    * also FASTER than the built-ins' double merge path at scale.
    */
  def q36StatSuite(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val x = col("l_quantity").cast(LongType).cast(dec)
    val y = round(col("l_extendedprice") * 100).cast(LongType).cast(dec)
    val g = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val n   = col("n").cast(dec)
    val d1  = (n * col("sxx") - col("sx") * col("sx")).cast(DoubleType)
    val d2  = (n * col("syy") - col("sy") * col("sy")).cast(DoubleType)
    val num = (n * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
    val nn1 = (n * (n - 1)).cast(DoubleType) // decimal: no n² long overflow
    val inum = (col("sy") * col("sxx") - col("sx") * col("sxy"))
      .cast(DoubleType)
    g.select(
        col("l_returnflag"), col("n"),
        (d1 / nn1).as("var_qty"),
        sqrt(d1 / nn1).as("stddev_qty"),
        (num / nn1).as("covar_qty_cents"),
        (num / (sqrt(d1) * sqrt(d2))).as("corr_qty_price"),
        (num / d1).as("slope_cents_per_qty"),
        (inum / d1).as("intercept_cents"))
      .orderBy("l_returnflag")
  }

  private val q36Oracle =
    """WITH m AS (
      | SELECT l_returnflag, count(*) AS n,
      |  sum(x) AS sx, sum(y) AS sy,
      |  sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
      | FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |        CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |       FROM lineitem)
      | GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      | CAST(n*sxx - sx*sx AS DOUBLE) / CAST(CAST(n AS HUGEINT)*(n-1) AS DOUBLE)
      |   AS var_qty,
      | sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
      |      / CAST(CAST(n AS HUGEINT)*(n-1) AS DOUBLE)) AS stddev_qty,
      | CAST(n*sxy - sx*sy AS DOUBLE) / CAST(CAST(n AS HUGEINT)*(n-1) AS DOUBLE)
      |   AS covar_qty_cents,
      | CAST(n*sxy - sx*sy AS DOUBLE)
      |   / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
      |      * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr_qty_price,
      | CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
      |   AS slope_cents_per_qty,
      | CAST(sy*sxx - sx*sxy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
      |   AS intercept_cents
      |FROM m ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Hourly resample + forward fill over the event stream (ext
    * TimeSeries.resampleFill — see its scaladoc for the plan audit:
    * distributed grid explode, co-partitioned grid⋈obs join, one carry
    * window per key). Gate slice: users 0-9, one month of hourly grid. */
  def q37ResampleGapfill(s: SparkSession, d: String): DataFrame =
    graft.ext.TimeSeries.resampleFill(
        Tables.events(s, d).where(col("user_id") < 10),
        keys = Seq("user_id"), tsCol = "ts", valCol = "value",
        unit = "hour", step = expr("INTERVAL 1 HOUR"),
        tiebreak = Seq("event_id"))
      .orderBy("user_id", "bucket")

  private val q37Oracle =
    """WITH ev AS (SELECT * FROM events WHERE user_id < 10),
      |hourly AS (
      | SELECT user_id, bucket, n_obs, v FROM (
      |  SELECT user_id, date_trunc('hour', ts) AS bucket, value AS v,
      |   count(*) OVER (PARTITION BY user_id, date_trunc('hour', ts))
      |     AS n_obs,
      |   row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
      |     ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM ev) WHERE rn = 1),
      |grid AS (
      | SELECT user_id,
      |   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      | FROM (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
      |       FROM hourly GROUP BY user_id))
      |SELECT g.user_id, g.bucket, coalesce(h.n_obs, 0) AS n_obs,
      | last_value(h.v IGNORE NULLS) OVER (PARTITION BY g.user_id
      |   ORDER BY g.bucket
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
      |FROM grid g LEFT JOIN hourly h USING (user_id, bucket)
      |ORDER BY user_id, bucket""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Entity-resolution fuzzy join (ext Joins.fuzzyJoin): customer ↔
    * supplier names within a nation at edit distance <= 5 — the
    * "Customer#NNN"/"Supplier#NNN" prefixes are exactly 5 edits apart,
    * so this finds same-number pairs and any closer digit typos.
    * Blocking on nationkey keeps the candidate set an equi-join. */
  def q38FuzzyJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_nationkey")
    val p = Tables.supplier(s, d)
      .select("s_suppkey", "s_name", "s_nationkey")
    graft.ext.Joins.fuzzyJoin(c, p, "c_name", "s_name", maxDist = 5,
        blockKeys = Seq("c_nationkey" -> "s_nationkey"))
      .select("c_custkey", "s_suppkey", "c_name", "s_name", "edit_dist")
      .orderBy("c_custkey", "s_suppkey")
  }

  private val q38Oracle =
    """SELECT c_custkey, s_suppkey, c_name, s_name,
      | CAST(levenshtein(c_name, s_name) AS BIGINT) AS edit_dist
      |FROM customer JOIN supplier ON c_nationkey = s_nationkey
      |WHERE levenshtein(c_name, s_name) <= 5
      |ORDER BY c_custkey, s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Trailing one-hour per-user activity via a TIME-RANGE window frame
    * (rangeBetween over epoch micros) — count and exact integer-cents
    * sum of the last hour's events at every event. Range frames keep
    * the computation one sort per key with a sliding frame pointer (no
    * self-join, no per-row subquery — the forms that die at scale).
    * Cents stay integral end-to-end: double sums would be
    * association-order-dependent and could never cross-engine match. */
  def q39RollingHour(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).where(col("user_id") < 50)
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast(LongType).as("cents"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3599999999L, 0L) // (t-1h, t] in micros, inclusive
    ev.select(
        col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("cents")).over(w).as("cents_1h"))
      .orderBy("event_id")
  }

  private val q39Oracle =
    """SELECT event_id, user_id, ts,
      | count(*) OVER w AS n_1h,
      | CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
      |FROM (SELECT event_id, user_id, ts,
      |       CAST(round(value * 100) AS BIGINT) AS cents
      |      FROM events WHERE user_id < 50)
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      | RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q40
  /** Hourly resample + LINEAR interpolation over the event stream (ext
    * TimeSeries.resampleInterpolate — same grid/join plan as q37, one
    * extra shared-sort window pass; values in exact fixed-point e6 so
    * the interpolation arithmetic replays bit-identically). */
  def q40Interpolate(s: SparkSession, d: String): DataFrame =
    graft.ext.TimeSeries.resampleInterpolate(
        Tables.events(s, d).where(col("user_id") < 10),
        keys = Seq("user_id"), tsCol = "ts", valCol = "value",
        unit = "hour", step = expr("INTERVAL 1 HOUR"), stepSeconds = 3600L,
        scale = 6, tiebreak = Seq("event_id"))
      .orderBy("user_id", "bucket")

  private val q40Oracle =
    """WITH ev AS (SELECT * FROM events WHERE user_id < 10),
      |hourly AS (
      | SELECT user_id, bucket, n_obs, v FROM (
      |  SELECT user_id, date_trunc('hour', ts) AS bucket,
      |   CAST(floor(value * 1000000) AS BIGINT) AS v,
      |   count(*) OVER (PARTITION BY user_id, date_trunc('hour', ts))
      |     AS n_obs,
      |   row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
      |     ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM ev) WHERE rn = 1),
      |grid AS (
      | SELECT user_id,
      |   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      | FROM (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
      |       FROM hourly GROUP BY user_id)),
      |j AS (
      | SELECT g.user_id, g.bucket, CAST(epoch(g.bucket) AS BIGINT) AS bs,
      |        h.n_obs, h.v
      | FROM grid g LEFT JOIN hourly h USING (user_id, bucket)),
      |a AS (
      | SELECT user_id, bucket, bs, coalesce(n_obs, 0) AS n_obs,
      |  last_value(v IGNORE NULLS) OVER wp AS pv,
      |  last_value(CASE WHEN v IS NOT NULL THEN bs END IGNORE NULLS)
      |    OVER wp AS pt,
      |  first_value(v IGNORE NULLS) OVER wn AS nv,
      |  first_value(CASE WHEN v IS NOT NULL THEN bs END IGNORE NULLS)
      |    OVER wn AS nt
      | FROM j
      | WINDOW wp AS (PARTITION BY user_id ORDER BY bucket
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wn AS (PARTITION BY user_id ORDER BY bucket
      |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, bucket, n_obs,
      | CASE WHEN nt = pt THEN pv ELSE pv + CAST(
      |  ((nv - pv) * ((bs - pt) // 3600)
      |    - ((nv - pv) * ((bs - pt) // 3600)) % ((nt - pt) // 3600))
      |   / ((nt - pt) // 3600) AS BIGINT) END AS v_e6
      |FROM a ORDER BY user_id, bucket""".stripMargin

  // ---------------------------------------------------------------- q47
  /** Numeric band join (ext Joins.bandJoin): customer and supplier
    * account balances within 10 dollars of each other, planned as a
    * bucket ±1 EQUI-join instead of the BNLJ a theta |a-b| condition
    * produces (JoinsSpec asserts the plan). */
  def q47BandJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey"),
      floor(col("c_acctbal") * 100).cast("long").as("c_cents"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"),
      floor(col("s_acctbal") * 100).cast("long").as("s_cents"))
    graft.ext.Joins.bandJoin(c, sup, "c_cents", "s_cents", tol = 1000L)
      .select("c_custkey", "s_suppkey", "c_cents", "s_cents")
      .orderBy("c_custkey", "s_suppkey")
  }

  private val q47Oracle =
    """SELECT c_custkey, s_suppkey,
      | CAST(floor(c_acctbal * 100) AS BIGINT) AS c_cents,
      | CAST(floor(s_acctbal * 100) AS BIGINT) AS s_cents
      |FROM customer, supplier
      |WHERE abs(floor(c_acctbal * 100) - floor(s_acctbal * 100)) <= 1000
      |ORDER BY c_custkey, s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q48
  /** Interval OVERLAP join (ext Joins.intervalJoin): order fulfilment
    * windows × customer campaign windows, in epoch days — planned as a
    * bucket equi-join with single-emission at the intersection's left
    * edge (no distinct), not the BNLJ a bare overlap predicate gets. */
  def q48IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val l = Tables.orders(s, d).where(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), epoch).cast("long").as("l_s"))
      .withColumn("l_e", col("l_s") + col("o_orderkey") % 7)
    val base = datediff(lit("1995-01-01").cast("date"), epoch).cast("long")
    val r = Tables.customer(s, d)
      .select(col("c_custkey"), (base + col("c_custkey") % 365).as("c_s"))
      .withColumn("c_e", col("c_s") + 30)
    graft.ext.Joins.intervalJoin(l, r, "l_s", "l_e", "c_s", "c_e",
        bucketWidth = 30L)
      .select("o_orderkey", "c_custkey", "l_s", "l_e", "c_s", "c_e")
      .orderBy("o_orderkey", "c_custkey")
  }

  private val q48Oracle =
    """WITH l AS (
      | SELECT o_orderkey,
      |  datediff('day', DATE '1970-01-01', o_orderdate)::BIGINT AS l_s,
      |  datediff('day', DATE '1970-01-01', o_orderdate)::BIGINT
      |   + o_orderkey % 7 AS l_e
      | FROM orders WHERE o_orderkey % 100 = 0),
      |r AS (
      | SELECT c_custkey,
      |  datediff('day', DATE '1970-01-01', DATE '1995-01-01')::BIGINT
      |   + c_custkey % 365 AS c_s,
      |  datediff('day', DATE '1970-01-01', DATE '1995-01-01')::BIGINT
      |   + c_custkey % 365 + 30 AS c_e
      | FROM customer)
      |SELECT o_orderkey, c_custkey, l_s, l_e, c_s, c_e
      |FROM l, r WHERE l_s <= c_e AND c_s <= l_e
      |ORDER BY o_orderkey, c_custkey""".stripMargin

  // ---------------------------------------------------------------- q50
  /** TPC-H Q19 shape: a disjunction of brand/size/quantity conjunctions
    * over the part⋈lineitem join — the predicate form that exercises
    * OR-tree pushdown and constraint propagation (each disjunct's part
    * filters still prune the build side; the revenue sum is the exact
    * decimal-cents pattern from q1/q6). */
  def q50DisjunctiveJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    val j = li.join(p, col("l_partkey") === col("p_partkey"))
    val arm = (brand: String, sizeHi: Int, qLo: Int, qHi: Int) =>
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    j.where(arm("Brand#12", 20, 1, 15) || arm("Brand#23", 25, 10, 25) ||
        arm("Brand#34", 30, 20, 35))
      .agg(
        Relational.dsum(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val q50Oracle =
    """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |  AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      | count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 20
      |        AND l_quantity BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |        AND l_quantity BETWEEN 10 AND 25)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 30
      |        AND l_quantity BETWEEN 20 AND 35)""".stripMargin

  // ---------------------------------------------------------------- q53
  /** UNPIVOT (melt): the inverse of q21's pivot — a wide
    * status-per-column frame stacks back to (priority, status, n) long
    * form via the codegen'd `stack` generator; absent combinations
    * (null cells) drop, so the round trip equals the plain group-by the
    * oracle runs. The pandas melt / SQL UNPIVOT surface. */
  def q53Unpivot(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
    wide.select(col("o_orderpriority"),
        expr("stack(3, 'F', `F`, 'O', `O`, 'P', `P`) " +
          "AS (o_orderstatus, n)"))
      .where(col("n").isNotNull)
      .orderBy("o_orderpriority", "o_orderstatus")
  }

  private val q53Oracle =
    """SELECT o_orderpriority, o_orderstatus, count(*) AS n
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q47_band_join", q47BandJoin, Some(q47Oracle)),
    QueryDef("q48_interval_join", q48IntervalJoin, Some(q48Oracle)),
    QueryDef("q50_disjunctive_join", q50DisjunctiveJoin, Some(q50Oracle)),
    QueryDef("q53_unpivot", q53Unpivot, Some(q53Oracle)),
    QueryDef("q36_stat_suite", q36StatSuite, Some(q36Oracle)),
    QueryDef("q37_resample_gapfill", q37ResampleGapfill, Some(q37Oracle)),
    QueryDef("q38_fuzzy_join", q38FuzzyJoin, Some(q38Oracle)),
    QueryDef("q39_rolling_hour", q39RollingHour, Some(q39Oracle)),
    QueryDef("q40_interpolate", q40Interpolate, Some(q40Oracle)))
}
