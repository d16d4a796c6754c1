package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: regularize an irregular event stream onto a
  * fixed grid (per key), filling gaps by carrying the last observation
  * forward — the `pandas.resample(...).last().ffill()` /
  * `GROUP BY time_bucket + gap fill` operation every metrics or
  * feature-engineering pipeline needs before windowed training data can
  * be cut.
  *
  * Plan shape (scale audit): one partial-aggregated shuffle to the
  * per-(key, bucket) last-observation aggregate; the dense grid is
  * EXPLODED DISTRIBUTED from each key's [min, max] bucket bounds (never
  * driver-materialized — `sequence` + `explode` is a narrow Generate);
  * grid and observations then equi-join on (key, bucket) — both sides
  * hash-partition the same way, one shuffle each; the forward fill is
  * one `last(ignoreNulls)` running window per key. Nothing is
  * quadratic; per-key work is O(span/step). A key idle for the whole
  * horizon costs span/step grid rows — bound the horizon upstream if
  * keys can be years-idle.
  */
object TimeSeries {

  /** Resample `df` onto a `step` grid per `keys`, carrying the last
    * value of `valCol` (chosen by (tsCol, tiebreak) order within each
    * bucket) forward across empty buckets. Emits one row per key per
    * grid bucket between that key's first and last observation:
    * keys..., `bucket`, `n_obs` (0 on gap rows), `v` (carried).
    *
    * @param step a Catalyst interval expression, e.g. `expr("INTERVAL 1
    *             HOUR")`; buckets are `date_trunc(unit, ts)` aligned
    * @param unit the date_trunc unit matching `step` ("hour", "day", …)
    */
  def resampleFill(
      df: DataFrame, keys: Seq[String], tsCol: String, valCol: String,
      unit: String, step: Column, tiebreak: Seq[String] = Nil): DataFrame = {
    val k = keys.map(col)
    val bucket = date_trunc(unit, col(tsCol)).as("bucket")
    val tie = struct((col(tsCol) +: tiebreak.map(col)): _*)
    // Last observation per (key, bucket): max_by keeps ONE candidate per
    // partition per group ahead of the shuffle (vs a window form that
    // shuffles every raw event row).
    val hourly = df
      .groupBy((k :+ bucket): _*)
      .agg(max_by(col(valCol), tie).as("__v"), count(lit(1)).as("n_obs"))
    // Dense grid from per-key bounds; explode keeps it distributed.
    val grid = hourly
      .groupBy(k: _*)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select((k :+ explode(sequence(col("__lo"), col("__hi"), step))
        .as("bucket")): _*)
    val joined = grid.join(hourly, keys :+ "bucket", "left")
    val w = Window.partitionBy(k: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      (k ++ Seq(
        col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("__v"), ignoreNulls = true).over(w).as("v"))): _*)
  }

  /** Resample onto a `step` grid per `keys`, LINEARLY INTERPOLATING gap
    * buckets between the surrounding observations (vs resampleFill's
    * step-function carry-forward) — `pandas.resample(...).interpolate(
    * 'linear')`. Emits keys..., `bucket`, `n_obs`, and `v_e6`: the value
    * in fixed-point 10^-scale units (floor(value·10^scale) at the
    * anchors). Fixed-point because the interpolated value is computed
    * EXACTLY in integer arithmetic — a double formula's rounding would
    * be engine- and association-order-dependent, the same reason
    * tfidfTopTerms scores in exact integers. Caller divides by 10^scale
    * at the boundary if a double is wanted.
    *
    * Interpolation weight is the GRID INDEX between anchors (j of m
    * steps), not raw epoch deltas, keeping every product under ~2^50 for
    * realistic gaps so the (a - a % b) / b truncating division stays
    * bit-exact. Anchored rows fall out naturally: their previous anchor
    * is themselves (j = 0), so no special case.
    *
    * Plan shape: identical to resampleFill (one partial-agg shuffle,
    * distributed grid explode, co-partitioned join) plus ONE extra
    * window pass — the forward and backward anchor scans share the same
    * partitioning and ordering, so the second pass reuses the sort.
    *
    * @param stepSeconds exact length of `step` in seconds (grid is
    *                    date_trunc-aligned so every bucket delta is a
    *                    multiple of it)
    */
  def resampleInterpolate(
      df: DataFrame, keys: Seq[String], tsCol: String, valCol: String,
      unit: String, step: Column, stepSeconds: Long,
      scale: Int = 6, tiebreak: Seq[String] = Nil): DataFrame = {
    val k = keys.map(col)
    val bucket = date_trunc(unit, col(tsCol)).as("bucket")
    val tie = struct((col(tsCol) +: tiebreak.map(col)): _*)
    val ve = floor(col(valCol) * lit(math.pow(10, scale))).cast("long")
    val hourly = df
      .groupBy((k :+ bucket): _*)
      .agg(max_by(ve, tie).as("__v"), count(lit(1)).as("n_obs"))
    val grid = hourly
      .groupBy(k: _*)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select((k :+ explode(sequence(col("__lo"), col("__hi"), step))
        .as("bucket")): _*)
    val joined = grid.join(hourly, keys :+ "bucket", "left")
      .withColumn("__bs", col("bucket").cast("long"))
    val wb = Window.partitionBy(k: _*).orderBy(col("bucket"))
    val wPrev = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = wb.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val anchorTs = when(col("__v").isNotNull, col("__bs"))
    val anchored = joined.select(
      (k ++ Seq(
        col("bucket"), col("__bs"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("__v"), ignoreNulls = true).over(wPrev).as("__pv"),
        last(anchorTs, ignoreNulls = true).over(wPrev).as("__pt"),
        first(col("__v"), ignoreNulls = true).over(wNext).as("__nv"),
        first(anchorTs, ignoreNulls = true).over(wNext).as("__nt"))): _*)
    // j of m grid steps between anchors; truncating integer division
    // replicated as (a - a % b) / b — remainder semantics (trunc, sign
    // of dividend) are portable where `div`/`//` floor-vs-trunc is not.
    val j = ((col("__bs") - col("__pt")) / stepSeconds).cast("long")
    val m = ((col("__nt") - col("__pt")) / stepSeconds).cast("long")
    val num = (col("__nv") - col("__pv")) * j
    val interp = when(col("__nt") === col("__pt"), col("__pv"))
      .otherwise(col("__pv") + ((num - num % m) / m).cast("long"))
    anchored.select(
      (k ++ Seq(col("bucket"), col("n_obs"), interp.as("v_e6"))): _*)
  }

  /** Rolling z-score anomaly flags: each observation is compared against
    * the mean/stddev of its `nPrior` PRECEDING observations per key
    * (trailing frame excludes the current row, so an outlier never
    * dilutes its own baseline) and flagged when |x - mean| > k·stddev.
    *
    * The test is evaluated in EXACT integer algebra — the inequality
    * (c·x - s)² > k²·(c·q - s²) with s = Σx, q = Σx², c = count over
    * the frame, all in fixed-point 10^-scale units held as decimal(38,0)
    * — because a floating mean/stddev comparison flips on rounding at
    * the boundary and can never replay across engines. Headroom: with
    * e6 values ≤ 10^9 and frames ≤ 10^3 rows the largest term is ~10^24,
    * far under decimal(38)'s 10^38.
    *
    * Plan shape: one shuffle on the keys, one sort, three frame
    * aggregates riding the same window — identical cost to a plain
    * moving average; no self-join, no per-row subquery.
    *
    * Emits keys..., tsCol, tiebreak..., `x_e6`, `n_prior` (frame count),
    * `is_anomaly` (false until `minObs` observations precede).
    */
  def rollingAnomaly(
      df: DataFrame, keys: Seq[String], tsCol: String, valCol: String,
      nPrior: Int, k: Int, minObs: Int = 8, scale: Int = 6,
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(nPrior >= minObs && minObs >= 2, "need nPrior >= minObs >= 2")
    val kc = keys.map(col)
    val ord = col(tsCol) +: tiebreak.map(col)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(
      (kc ++ ord :+ floor(col(valCol) * lit(math.pow(10, scale)))
        .cast("long").as("x_e6")): _*)
    val w = Window.partitionBy(kc: _*).orderBy(ord: _*)
      .rowsBetween(-nPrior, -1)
    val xd = col("x_e6").cast(dec)
    val s = sum(xd).over(w)
    val q = sum(xd * xd).over(w)
    val c = count(col("x_e6")).over(w)
    val stats = base
      .withColumn("__s", s).withColumn("__q", q).withColumn("n_prior", c)
    val cd = col("n_prior").cast(dec)
    val lhs = cd * xd - col("__s")
    val rhs = lit(k.toLong * k).cast(dec) *
      (cd * col("__q") - col("__s") * col("__s"))
    stats
      .withColumn("is_anomaly",
        when(col("n_prior") >= minObs, lhs * lhs > rhs).otherwise(lit(false)))
      .drop("__s", "__q")
  }
}
