package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the dbt-test /
  * Deequ-style gate an ingestion pipeline runs before publishing a
  * table): each constraint evaluates to a violation count, and the
  * report is one small DataFrame of (constraint, violations, pass).
  *
  * Plan shape (scale audit): all ROW-LOCAL constraints (not-null,
  * accepted-values, null-rate, custom predicate) FUSE into a single
  * aggregate pass over one scan — conditional sums, map-side partial,
  * one 1-row result. Each uniqueness check costs one hash aggregate on
  * its key (the unavoidable shuffle), and each referential-integrity
  * check one anti join (broadcast when the referenced key side is a
  * dimension). Nothing collects raw rows; violation EXAMPLES are a
  * separate bounded query, not part of the pass/fail scan.
  */
object Quality {

  sealed trait Constraint { def name: String }
  /** No two rows share a value tuple of `cols`. */
  final case class Unique(cols: Seq[String]) extends Constraint {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** `col` is never null. */
  final case class NotNull(col: String) extends Constraint {
    def name = s"not_null($col)"
  }
  /** Non-null values of `col` are all in `values`. */
  final case class AcceptedValues(col: String, values: Seq[Any])
      extends Constraint {
    def name = s"accepted_values($col)"
  }
  /** Null fraction of `col` is <= `maxRate`. Violations = excess null
    * count over the allowance (0 when within budget). */
  final case class NullRateBelow(col: String, maxRate: Double)
      extends Constraint {
    def name = s"null_rate($col<=$maxRate)"
  }
  /** Every non-null `col` value exists in `ref`'s `refCol` (FK). */
  final case class RefIntegrity(col: String, ref: DataFrame, refCol: String)
      extends Constraint {
    def name = s"ref_integrity($col)"
  }

  /** Evaluate all constraints; returns (constraint, violations, pass)
    * ordered by constraint name. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val rowLocal = constraints.collect {
      case c: NotNull       => c.name ->
        sum(when(col(c.col).isNull, 1L).otherwise(0L))
      case c: AcceptedValues => c.name ->
        sum(when(col(c.col).isNotNull &&
          !col(c.col).isin(c.values: _*), 1L).otherwise(0L))
      case c: NullRateBelow => c.name ->
        greatest(lit(0L),
          (sum(when(col(c.col).isNull, 1L).otherwise(0L)) -
            floor(count(lit(1)) * c.maxRate)).cast("long"))
    }
    val fused: Seq[DataFrame] =
      if (rowLocal.isEmpty) Nil
      else {
        val aggs = rowLocal.map { case (n, e) => e.as(n) }
        val row = df.agg(aggs.head, aggs.tail: _*)
        // Backtick-quote: constraint names contain dots (e.g. rate 0.1)
        // that a bare col() would parse as nested-field access.
        Seq(row.select(explode(map(
          rowLocal.flatMap { case (n, _) =>
            Seq(lit(n), col(s"`$n`")) }: _*)).as(Seq("constraint", "violations"))))
      }
    val heavy: Seq[DataFrame] = constraints.collect {
      case c: Unique =>
        df.groupBy(c.cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .where(col("__n") > 1)
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
          .select(lit(c.name).as("constraint"), col("violations"))
      case c: RefIntegrity =>
        df.select(col(c.col)).where(col(c.col).isNotNull)
          .join(c.ref.select(col(c.refCol).as(c.col)).distinct(),
            Seq(c.col), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(c.name).as("constraint"), col("violations"))
    }
    (fused ++ heavy).reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("constraint")
  }

  /** Schema drift between two batches of "the same" feed — the check an
    * ingestion pipeline runs BEFORE row-level validation, because a
    * silently added/retyped column corrupts downstream without a single
    * row failing. Pure metadata (no data is scanned; the result frame is
    * built from the two schemas on the driver): one row per drifted
    * column, change ∈ added | removed | type_changed, with the type on
    * each side (null where absent). Matching is case-insensitive like
    * the validate path's projection; nullability changes are NOT drift
    * (parquet nullability flips with writer settings).
    */
  def schemaDiff(before: DataFrame, after: DataFrame): DataFrame = {
    def types(df: DataFrame): Map[String, (String, String)] =
      df.schema.fields.map(f =>
        f.name.toLowerCase -> (f.name, f.dataType.simpleString)).toMap
    val b = types(before)
    val a = types(after)
    val rows = (b.keySet ++ a.keySet).toSeq.sorted.flatMap { k =>
      (b.get(k), a.get(k)) match {
        case (Some((n, bt)), None) => Some((n, bt, null, "removed"))
        case (None, Some((n, at))) => Some((n, null, at, "added"))
        case (Some((n, bt)), Some((_, at))) if bt != at =>
          Some((n, bt, at, "type_changed"))
        case _ => None
      }
    }
    import before.sparkSession.implicits._
    rows.toDF("column", "before_type", "after_type", "change")
  }

  /** Exact precision/recall sweep over score thresholds — the "where do
    * I set the quality-filter cut" report every filtered corpus needs
    * (CCNet-style perplexity cuts, classifier-score cuts): for each
    * candidate threshold, rows with score >= cut are predicted
    * positive, and tp/fp/fn plus precision/recall (millionths, integer
    * div — engine-replayable) are computed against a boolean truth
    * column. Score semantics are caller-defined; the op is
    * score-agnostic. A NULL score counts as predicted-negative (the
    * scorer could not score the row, so it cannot pass a filter cut);
    * a NULL truth label is excluded from every counter (unknowable
    * either way).
    *
    * Plan: ONE corpus scan — each row fans out to the (bounded,
    * broadcast) cut list in a narrow projection and partial aggregation
    * collapses it to cuts-many rows per partition before the one
    * (cuts-sized) exchange. No data-row shuffle, no driver collect.
    */
  def thresholdSweep(df: DataFrame, score: Column, positive: Column,
      cuts: Seq[Long]): DataFrame = {
    require(cuts.nonEmpty, "thresholdSweep: no cuts")
    require(cuts.distinct.size == cuts.size, "thresholdSweep: duplicate cuts")
    val spark = df.sparkSession
    import spark.implicits._
    val cutsDf = cuts.toDF("cut")
    // floor, not cast: cast(long) truncates toward zero, so a fractional
    // NEGATIVE score (-0.4) would round UP to 0 and pass a cut of 0;
    // floor keeps "score >= cut" monotone for float scores.
    df.select(floor(score).cast("long").as("__s"), positive.as("__p"))
      .crossJoin(broadcast(cutsDf))
      .groupBy(col("cut"))
      // A NULL score is a row the scorer could not score: it cannot
      // pass any cut, so it counts as predicted-NEGATIVE (fn when the
      // truth is positive) — silently dropping it from all three
      // counters would overstate recall at every cut.
      .agg(
        sum(when(col("__s").isNotNull && col("__s") >= col("cut") &&
            col("__p"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("__s").isNotNull && col("__s") >= col("cut") &&
            !col("__p"), 1L).otherwise(0L)).as("fp"),
        sum(when((col("__s").isNull || col("__s") < col("cut")) &&
            col("__p"), 1L).otherwise(0L)).as("fn"))
      .select(col("cut"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0L, lit(0L))
          .otherwise(expr("tp * 1000000L div (tp + fp)"))
          .as("precision_ppm"),
        when(col("tp") + col("fn") === 0L, lit(0L))
          .otherwise(expr("tp * 1000000L div (tp + fn)"))
          .as("recall_ppm"))
  }
}
