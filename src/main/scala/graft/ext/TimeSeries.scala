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
}
