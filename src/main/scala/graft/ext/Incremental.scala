package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental aggregate maintenance: keep a materialized aggregate
  * fresh by merging each new batch's PARTIAL aggregates into a compact
  * state table instead of recomputing over all history — the pattern
  * that turns a daily 100 TB full scan into a scan of the new day
  * plus a merge of two small state tables.
  *
  * Works because the tracked moments (count, sum) are commutative
  * monoids: state ⊕ partial(batch) == partial(all data). Sums are
  * carried as exact integers (cents in DecimalType(38,0)) so the merge
  * is bit-deterministic regardless of batch split or partition order —
  * the invariant the gate (c4) proves by comparing an
  * incrementally-maintained state against a from-scratch recompute in
  * another engine. Derived metrics (avg) are NOT stored — they are
  * finalized at read time as one double division from exact moments
  * (non-decomposable forms like avg-of-avg would drift; avg from
  * merged sums cannot).
  */
object Incremental {

  /** Per-(keys) partial aggregate of one batch: n + exact cents sum. */
  def partials(batch: DataFrame, keys: Seq[String], valCents: Column)
      : DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(valCents.cast(DecimalType(38, 0))).as("sum_cents"))

  /** Merge any number of state/partial tables (same schema) into one. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))

  /** Partials carrying the extremes as well — min/max are monoids too
    * (merge = min of mins / max of maxes), so watermark-style "highest
    * value seen per key" dashboards maintain incrementally like sums.
    * Extremes stay LongType: unlike the sum they never accumulate, so
    * a cents value that fits a long in the batch fits forever. */
  def partialsMinMax(batch: DataFrame, keys: Seq[String], valCents: Column)
      : DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(valCents.cast(DecimalType(38, 0))).as("sum_cents"),
        min(valCents.cast(LongType)).as("min_cents"),
        max(valCents.cast(LongType)).as("max_cents"))

  /** Merge partialsMinMax states: sums add, extremes fold. */
  def mergeMinMax(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))

  /** Finalize read-time metrics from exact state moments. The BIGINT
    * projection of sum_cents guards the narrowing: the decimal(38,0)
    * state stays exact far past Long range, and the non-ANSI cast would
    * otherwise WRAP silently past ±9.2e18 cents — so out-of-range states
    * raise here instead of publishing a corrupted sum. */
  def finalizeAvg(state: DataFrame, keys: Seq[String]): DataFrame = {
    val longMax = lit(Long.MaxValue).cast(DecimalType(38, 0))
    val longMin = lit(Long.MinValue).cast(DecimalType(38, 0))
    val sumAsLong =
      when(col("sum_cents").between(longMin, longMax),
        col("sum_cents").cast(LongType))
      .otherwise(raise_error(concat(
        lit("finalizeAvg: sum_cents overflows BIGINT: "),
        col("sum_cents").cast(StringType))))
    state.select(keys.map(col) ++ Seq(
      col("n"),
      sumAsLong.as("sum_cents"),
      (col("sum_cents").cast(DoubleType) / col("n").cast(DoubleType))
        .as("avg_cents")): _*)
  }
}
