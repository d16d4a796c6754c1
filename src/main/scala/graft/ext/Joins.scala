package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join operators Spark lacks as built-ins, shaped for scale.
  *
  * As-of (backward) join: for every left row, the single most recent
  * right row with the same key and right.ts <= left.ts. The classic
  * formulations — a range theta-join (O(n·m) per key) or a per-left-row
  * subquery — do not survive large inputs; this plan is the
  * union-and-carry-forward form: tag both sides, union them, and run one
  * `last(_, ignoreNulls)` window per key over event order. ONE shuffle
  * on the key, one sort, zero joins — the same shape a backfill over
  * 100 TB of events wants. (DuckDB/Pandas expose this as ASOF JOIN /
  * merge_asof; the oracle for q15 replays it with DuckDB's ASOF.)
  */
object Joins {

  /** Backward as-of join.
    *
    * Output: every left row (left columns, unchanged names) plus the
    * matched right row's non-key columns as a struct column `matchCol`
    * (NULL when no right row precedes the left row) — a left outer
    * as-of. Ties on right timestamp resolve to the row latest in
    * `tiebreak` order (pass e.g. the right id column for determinism).
    *
    * @param keys     equi-join key columns (present in both sides)
    * @param leftTs   left ordering column name
    * @param rightTs  right ordering column name
    * @param tolerance optional maximum allowed left.ts - right.ts, as a
    *                  Catalyst interval/duration expression compared via
    *                  `leftTs <= rightTs + tolerance`; matches farther
    *                  back become NULL
    */
  /** Both sides tagged and unioned for the carry windows: right rows sort
    * BEFORE left rows at equal ts (=> inclusive matches in either
    * direction); tiebreak columns order equal-ts right rows
    * deterministically. */
  private def taggedUnion(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tiebreak: Seq[String]): DataFrame = {
    val rightPayloadFields = right.columns.filterNot(keys.contains)
    val rightStruct = struct(rightPayloadFields.map(col): _*)
    val rightStructType = StructType(
      right.schema.fields.filterNot(f => keys.contains(f.name)))
    val leftStruct = struct(left.columns.map(col): _*)
    val leftStructType = StructType(left.schema.fields)
    val rightTie: Column =
      if (tiebreak.isEmpty) lit(0L) else struct(tiebreak.map(col): _*)
    val leftTie: Column =
      if (tiebreak.isEmpty) lit(0L)
      else lit(null).cast(StructType(tiebreak.map(n => right.schema(n))))

    right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        rightTie.as("__tie"),
        lit(null).cast(leftStructType).as("__l"),
        rightStruct.as("__r")): _*)
      .unionByName(left.select(
        keys.map(col) ++ Seq(
          col(leftTs).as("__ts"),
          lit(1).as("__side"),
          leftTie.as("__tie"),
          leftStruct.as("__l"),
          lit(null).cast(rightStructType).as("__r")): _*),
        allowMissingColumns = false)
  }

  private def selectOut(matched: DataFrame, left: DataFrame,
      matchCol: String): DataFrame =
    matched.select(
      left.columns.map(c => col(s"__l.`$c`").as(c)) :+
        col("__match").as(matchCol): _*)

  def asofBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      matchCol: String = "asof_match",
      tiebreak: Seq[String] = Nil,
      tolerance: Option[Column] = None): DataFrame = {
    val tagged = taggedUnion(left, right, keys, leftTs, rightTs, tiebreak)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = tagged
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val withTol = tolerance match {
      case Some(tol) =>
        matched.withColumn("__match",
          when(col("__ts") <= col(s"__match.$rightTs") + tol, col("__match")))
      case None => matched
    }
    selectOut(withTol, left, matchCol)
  }

  /** Forward as-of join: for every left row, the single EARLIEST right
    * row with the same key and right.ts >= left.ts (the mirror of
    * [[asofBackward]], same one-shuffle/one-sort/zero-join plan — the
    * carry window just runs in descending event order). `tolerance`
    * bounds how far ahead: matches with right.ts > left.ts + tolerance
    * become NULL. Ties on right ts resolve like asofBackward (the row
    * latest in `tiebreak` order). */
  def asofForward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      matchCol: String = "asof_match",
      tiebreak: Seq[String] = Nil,
      tolerance: Option[Column] = None): DataFrame = {
    val tagged = taggedUnion(left, right, keys, leftTs, rightTs, tiebreak)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = tagged
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val withTol = tolerance match {
      case Some(tol) =>
        matched.withColumn("__match",
          when(col("__ts") >= col(s"__match.$rightTs") - tol, col("__match")))
      case None => matched
    }
    selectOut(withTol, left, matchCol)
  }

  /** Nearest as-of join: the right row minimizing |right.ts − left.ts|
    * within the key; the backward candidate wins exact distance ties
    * (pandas merge_asof direction='nearest' semantics). Both direction
    * candidates come from TWO windows over the SAME tagged union — same
    * partitioning, so the plan pays ONE shuffle and two in-partition
    * sorts, still zero joins. `tolerance` bounds the distance on both
    * sides. */
  def asofNearest(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      matchCol: String = "asof_match",
      tiebreak: Seq[String] = Nil,
      tolerance: Option[Column] = None): DataFrame = {
    val tagged = taggedUnion(left, right, keys, leftTs, rightTs, tiebreak)
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = tagged
      .withColumn("__back", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__fwd", last(col("__r"), ignoreNulls = true).over(wf))
      .where(col("__side") === 1)

    val bounded = tolerance match {
      case Some(tol) => matched
        .withColumn("__back",
          when(col("__ts") <= col(s"__back.$rightTs") + tol, col("__back")))
        .withColumn("__fwd",
          when(col("__ts") >= col(s"__fwd.$rightTs") - tol, col("__fwd")))
      case None => matched
    }
    val backDist = col("__ts") - col(s"__back.$rightTs")
    val fwdDist = col(s"__fwd.$rightTs") - col("__ts")
    val nearest = bounded.withColumn("__match",
      when(col("__back").isNull, col("__fwd"))
        .when(col("__fwd").isNull, col("__back"))
        .when(backDist <= fwdDist, col("__back"))
        .otherwise(col("__fwd")))
    selectOut(nearest, left, matchCol)
  }

  /** Bucketed points-in-intervals range join: pairs every point row with
    * every interval row of the same `keys` whose `[loCol, hiCol]`
    * (inclusive) contains `pointCol`. All three bound columns must be
    * numeric in the same unit (timestamps: `unix_micros` them first).
    *
    * Spark plans a bare range predicate as BroadcastNestedLoopJoin — or
    * CartesianProduct once neither side broadcasts — i.e. O(n·m) row
    * comparisons per key. This form coarsens the range dimension into
    * buckets of `bucketWidth`: points take their containing bucket,
    * intervals EXPLODE across every bucket they touch, and the join
    * becomes an EQUI join on (bucket, keys) refined by the exact
    * predicate — shuffled hash/merge machinery, AQE skew handling, the
    * works. Interval fan-out is span/bucketWidth + 1 rows, so pick
    * bucketWidth near the TYPICAL interval span: ~2× row fan-out on the
    * interval side buys candidate sets ~span/width of the range instead
    * of everything sharing the key. Intervals with hi < lo are dropped
    * (they can contain no point; `sequence` would also walk backwards).
    */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth")
    val w = lit(bucketWidth)
    val p = points.withColumn("__bucket", floor(col(pointCol) / w))
    val iv = intervals
      .where(col(hiCol) >= col(loCol))
      .withColumn("__bucket",
        explode(sequence(floor(col(loCol) / w), floor(col(hiCol) / w))))
    p.join(iv, ("__bucket" +: keys).toSeq)
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval OVERLAP join — the interval-interval sibling of
    * [[rangeJoin]]: all pairs whose closed intervals `[lStart, lEnd]`
    * and `[rStart, rEnd]` intersect (sessions × campaigns, genomic
    * ranges, outage windows × SLAs). Bound columns must be
    * integer-valued in the same unit.
    *
    * Both sides explode across the `bucketWidth`-sized buckets their
    * interval touches and the join is an EQUI join on (bucket, keys)
    * refined by the exact `l.s <= r.e && r.s <= l.e` predicate. An
    * overlapping pair shares every bucket in its intersection — to emit
    * it ONCE without a distinct (which would re-shuffle the whole
    * output), a pair counts only in the bucket containing the
    * intersection's left edge, `greatest(lStart, rStart)` — a bucket
    * both sides provably cover. Fan-out is span/bucketWidth + 1 per
    * row: pick bucketWidth near the typical span (the [[rangeJoin]]
    * discipline); degenerate hi < lo intervals are dropped.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth")
    val w = lit(bucketWidth)
    def exploded(df: DataFrame, s: String, e: String) = df
      .where(col(e) >= col(s))
      .withColumn("__bucket",
        explode(sequence(floor(col(s) / w), floor(col(e) / w))))
    val l = exploded(left, lStart, lEnd)
    val r = exploded(right, rStart, rEnd)
    l.join(r, ("__bucket" +: keys).toSeq)
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bucket") === floor(greatest(col(lStart), col(rStart)) / w))
      .drop("__bucket")
  }

  /** Threshold fuzzy join (entity resolution): pairs whose `leftText` /
    * `rightText` edit distance is <= `maxDist`, restricted to equal
    * `blockKeys`.
    *
    * Scale shape: levenshtein is O(len²) per comparison, so the plan
    * must bound COMPARISONS, not speed them up. Blocking keys turn the
    * cross product into an equi-join (one shuffle, AQE-skew-splittable);
    * within a block, the length-band prefilter
    * `abs(len(l) - len(r)) <= maxDist` — a NECESSARY condition for edit
    * distance, since each edit changes length by at most 1 — discards
    * most candidates before the quadratic distance runs. Both the
    * band predicate and `levenshtein` are codegen'd built-ins. At 100 TB
    * add a second blocking pass (first-k-chars or phonetic key) exactly
    * like any ER blocking scheme; the operator composes — pass the
    * extra key through `blockKeys`.
    */
  def fuzzyJoin(
      left: DataFrame, right: DataFrame,
      leftText: String, rightText: String, maxDist: Int,
      blockKeys: Seq[(String, String)]): DataFrame = {
    require(maxDist >= 0, s"maxDist=$maxDist")
    val blockCond = blockKeys
      .map { case (l, r) => left(l) === right(r) }
      .reduceOption(_ && _).getOrElse(lit(true))
    val band =
      abs(length(left(leftText)) - length(right(rightText))) <= maxDist
    left.join(right, blockCond && band)
      .withColumn("edit_dist",
        levenshtein(left(leftText), right(rightText)).cast("long"))
      .where(col("edit_dist") <= maxDist)
  }

  /** Numeric band join: pairs with |leftVal − rightVal| <= tol, as an
    * EQUI-join — the tolerance-matching join (price reconciliation,
    * sensor alignment, entity resolution on amounts) that a naive
    * `abs(a-b) <= tol` condition plans as a broadcast-nested-loop /
    * cartesian and dies at scale.
    *
    * Values must be INTEGER-VALUED (cents / fixed-point). Each side
    * buckets by floor-division tol; a pair within tol is at most one
    * bucket apart, so the right side expands to its bucket ±1 (3 rows)
    * and the join runs on the bucket key, then the exact |Δ| <= tol
    * filter prunes the corner cases. Shuffle carries 3× the right side
    * and 1× the left — linear, skew-safe when values spread across
    * buckets; a single hot bucket means tol spans a value spike and
    * wants a smaller tol or salting (same discipline as saltedJoin).
    */
  def bandJoin(
      left: DataFrame, right: DataFrame,
      leftVal: String, rightVal: String, tol: Long): DataFrame = {
    require(tol > 0, "tol must be positive")
    // floor division portable for negatives: (x - pmod(x, tol)) / tol
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(tol))) / tol).cast("long")
    val l = left.withColumn("__bk", bucketOf(col(leftVal)))
    val r = right.withColumn("__bk0", bucketOf(col(rightVal)))
      .withColumn("__bk", explode(array(
        col("__bk0") - 1, col("__bk0"), col("__bk0") + 1)))
      .drop("__bk0")
    l.join(r, Seq("__bk"))
      .where(abs(col(leftVal) - col(rightVal)) <= tol)
      .drop("__bk")
  }
}
