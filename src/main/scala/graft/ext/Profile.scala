package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiling for data-quality triage: per column, row
  * count, null count, distinct count, and min/max. Everything is
  * computed in a SINGLE aggregation over one scan (the per-column
  * aggregates all ride the same partial+final hash aggregate), then the
  * one result row pivots into a row per column — so profiling a 100 TB
  * table costs exactly one pass, not one pass per column.
  *
  * Numeric min/max surface as DOUBLE and string min/max as STRING in
  * separate columns: casting numerics to display strings is engine-
  * dependent formatting (Java prints 1.0E7 where SQL engines print
  * 10000000.0) and has no place in a comparable profile.
  *
  * `exact = false` swaps COUNT(DISTINCT) for approx_count_distinct —
  * at scale the exact form costs a per-column distinct expansion, the
  * approximate one a constant-size HLL sketch per column (±5%); the
  * plan shape is otherwise identical.
  */
object Profile {

  def describe(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields.toSeq
    def distinctOf(c: String) =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    val aggs = fields.flatMap { f =>
      val c = f.name
      val isNum = f.dataType.isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"__cnt_$c"), // non-null count
        distinctOf(c).as(s"__nd_$c"),
        (if (isNum) min(col(c)).cast(DoubleType) else lit(null).cast(DoubleType))
          .as(s"__minn_$c"),
        (if (isNum) max(col(c)).cast(DoubleType) else lit(null).cast(DoubleType))
          .as(s"__maxn_$c"),
        (if (isNum) lit(null).cast(StringType) else min(col(c)).cast(StringType))
          .as(s"__mins_$c"),
        (if (isNum) lit(null).cast(StringType) else max(col(c)).cast(StringType))
          .as(s"__maxs_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = fields.map { f =>
      val c = f.name
      struct(
        lit(c).as("column"),
        col("__n").as("n"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__minn_$c").as("min_num"),
        col(s"__maxn_$c").as("max_num"),
        col(s"__mins_$c").as("min_str"),
        col(s"__maxs_$c").as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Exact equi-width histogram of an INTEGER-VALUED column (pass cents
    * / fixed-point for decimals): `nbins` bins over [min, max], emitting
    * one row per NON-EMPTY bin with its count and the observed in-bin
    * lo/hi. Bin index is computed in exact integer arithmetic —
    * ((x-min)·nbins) truncating-div (max-min+1) — so bucket boundaries
    * are engine-portable where a double `width_bucket` would round-tie;
    * the index lands in [0, nbins-1] with no clamp by construction.
    *
    * Plan shape: one min/max aggregate (1 row, broadcast back via
    * crossJoin), one narrow bin projection, one linear groupBy — two
    * passes over the column, no sort, no driver data. Empty bins are
    * simply absent (join a `sequence(0, nbins-1)` grid downstream if a
    * dense histogram is wanted — same explode pattern as
    * TimeSeries.resampleFill's grid).
    */
  def histogram(df: DataFrame, c: Column, nbins: Int): DataFrame = {
    require(nbins > 0, "nbins must be positive")
    val mm = df.agg(min(c).cast("long").as("__mn"), max(c).cast("long").as("__mx"))
    val num = (col("__x") - col("__mn")) * nbins
    df.select(c.cast("long").as("__x"))
      .where(col("__x").isNotNull)
      .crossJoin(broadcast(mm))
      .withColumn("__span", col("__mx") - col("__mn") + 1)
      .withColumn("bin",
        ((num - num % col("__span")) / col("__span")).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), min(col("__x")).as("lo"),
        max(col("__x")).as("hi"))
  }

  /** Per-group winsorization: clip an INTEGER-VALUED column (cents /
    * fixed-point) to its group's [pLoPct, pHiPct] percentile values —
    * the robust-outlier clamp run before feature scaling or reward
    * normalization. Percentiles are EXACT discrete order statistics
    * (value at rank ceil(n·p/100), lower-value method), computed with
    * pure integer arithmetic so boundary rows replay identically across
    * engines — interpolated `percentile_cont` in doubles cannot.
    *
    * Adds `x_e` (the cast input), `win_lo`, `win_hi`, and `out`
    * (clipped value). Ties are value-stable: equal inputs yield the
    * same order statistic whatever their internal rank order.
    *
    * Plan shape: one shuffle on the group keys; the row_number sort and
    * the three unordered partition aggregates share that partitioning
    * (one sort total). No joins, no per-group collect — group
    * cardinality is unbounded, per-row state is constant. LOW-
    * CARDINALITY HAZARD: each group sorts in one window task; use
    * [[winsorizeDist]] when keys are few.
    */
  /** Per-group equi-DEPTH bucketing (quantile binning): each row gets a
    * bucket in [0, k-1] holding ~n/k rows — the feature-binning /
    * percentile-cohort transform ([[histogram]] is the equi-WIDTH
    * sibling). The assignment is the pinned integer formula
    * `bucket = (rn − 1)·k div n` over `rn = row_number` ordered by
    * (x, tiebreak...) — NOT `ntile`, whose tie placement follows
    * physical row order and is therefore not replayable across engines.
    * `tiebreak` must make the sort total (a key column); with it the
    * bucket of every row, including value ties straddling a boundary,
    * is bit-deterministic under any partitioning.
    *
    * Plan shape: one shuffle on the group keys; row_number and the
    * count window share the sort (cf. [[winsorize]]). No joins, no
    * per-group collect. LOW-CARDINALITY HAZARD: the window's required
    * clustering sorts each group in ONE task — right for the
    * high-cardinality keys the gates exercise, a single-task sort when
    * keys are few (or the call is whole-table); use
    * [[equiDepthBucketsDist]] there.
    */
  def equiDepthBuckets(
      df: DataFrame, keys: Seq[String], x: Column, k: Int,
      tiebreak: Seq[String], out: String = "bucket"): DataFrame = {
    require(k > 0, "k must be positive")
    require(tiebreak.nonEmpty, "need a tiebreak column for a total order")
    val kc = keys.map(col)
    val wAll = Window.partitionBy(kc: _*)
    val wOrd = wAll.orderBy(x +: tiebreak.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn(out,
        expr(s"((cast(__rn AS BIGINT) - 1) * $k) div __n").cast("int"))
      .drop("__n", "__rn")
  }

  /** Per-group median absolute deviation — the robust spread measure
    * ([[winsorize]]'s diagnostic sibling: MAD tells you WHETHER a
    * column needs clipping; winsorize does it). Both the median and the
    * MAD are EXACT discrete order statistics (value at rank ⌈n/2⌉,
    * lower-median) over an INTEGER-VALUED column, so the result replays
    * bit-identically across engines — interpolated medians in doubles
    * cannot, and MAD's inner subtraction amplifies any drift.
    *
    * Plan shape: one shuffle on the group keys; two sorts under the
    * same partitioning (by value, then by deviation — MAD's nested
    * order statistic needs both), each the winsorize rank-pick pattern;
    * final one-row-per-group aggregate. No joins, no per-group collect.
    * LOW-CARDINALITY HAZARD: each group sorts in one window task (twice
    * here); use [[madDist]] when keys are few.
    * NULL values of `x` are excluded: `n`, the median and the MAD are
    * statistics of the non-null rows only.
    */
  def mad(df: DataFrame, keys: Seq[String], x: Column): DataFrame = {
    val kc = keys.map(col)
    val wAll = Window.partitionBy(kc: _*)
    def rankAt50(n: Column): Column = {
      val num = n * 50 + 99
      greatest(((num - num % 100) / 100).cast("long"), lit(1L))
    }
    val base = df.withColumn("__x", x.cast("long"))
      // NULLs would sort first under row_number yet be skipped by
      // count(__x), shifting the rank pick — drop them so both the
      // count and the ranks see the same non-null rows.
      .where(col("__x").isNotNull)
      .withColumn("__n", count(col("__x")).over(wAll))
      .withColumn("__rn", row_number().over(wAll.orderBy(col("__x"))))
      .withColumn("__med",
        max(when(col("__rn") === rankAt50(col("__n")), col("__x"))).over(wAll))
      .withColumn("__dev", abs(col("__x") - col("__med")))
    val withMad = base
      .withColumn("__rn2", row_number().over(wAll.orderBy(col("__dev"))))
      .withColumn("__mad",
        max(when(col("__rn2") === rankAt50(col("__n")), col("__dev"))).over(wAll))
    withMad.groupBy(kc: _*)
      .agg(max(col("__n")).as("n"), max(col("__med")).as("median"),
        max(col("__mad")).as("mad"))
  }

  /** ceil(n·pct/100) clamped to ≥ 1, in portable integer arithmetic —
    * the discrete order-statistic rank shared by [[winsorize]]/
    * [[winsorizeDist]]/[[mad]]/[[madDist]]. */
  private def rankAtPct(n: Column, pct: Int): Column = {
    val num = n * pct + 99
    greatest(((num - num % 100) / 100).cast("long"), lit(1L))
  }

  /** [[equiDepthBuckets]] on [[Packing.groupRank]]'s distributed rank —
    * for LOW-cardinality group keys, where the windowed form's required
    * clustering puts every row of a group in ONE task (the whole-table
    * `keys = Seq(constant)` or per-language call is a single-task sort
    * at corpus scale; fine when keys are high-cardinality, which is
    * what the windowed form's gates exercise). Bit-identical buckets:
    * the pinned `(rn − 1)·k div n` formula is a pure function of the
    * same total (x, tiebreak) order. */
  def equiDepthBucketsDist(
      df: DataFrame, keys: Seq[String], x: Column, k: Int,
      tiebreak: Seq[String], out: String = "bucket"): DataFrame = {
    require(k > 0, "k must be positive")
    require(tiebreak.nonEmpty, "need a tiebreak column for a total order")
    Packing.groupRank(df, keys, x +: tiebreak.map(col))
      .withColumn(out,
        expr(s"((gr_rank - 1) * $k) div gr_n").cast("int"))
      .drop("gr_rank", "gr_n")
  }

  /** [[winsorize]] on the distributed rank — same low-cardinality
    * rationale as [[equiDepthBucketsDist]]. The percentile picks become
    * a per-group aggregate over the ranked frame (value at the pinned
    * rank), broadcast-joined back (groups are few by premise). NULL
    * `x` rows are DROPPED here (the windowed original ranks nulls
    * first, which silently shifts its picks — the [[mad]] fix applied;
    * filter upstream if null passthrough is wanted). Clipped values of
    * surviving rows match the original wherever the original's input
    * has no nulls. */
  def winsorizeDist(
      df: DataFrame, keys: Seq[String], x: Column,
      pLoPct: Int, pHiPct: Int, out: String = "clipped"): DataFrame = {
    require(0 <= pLoPct && pLoPct <= pHiPct && pHiPct <= 100,
      "need 0 <= pLoPct <= pHiPct <= 100")
    val base = df.withColumn("x_e", x.cast("long"))
      .where(col("x_e").isNotNull)
    val ranked = Packing.groupRank(base, keys, Seq(col("x_e")))
    val picks = ranked.groupBy(keys.map(col): _*)
      .agg(max(when(col("gr_rank") === rankAtPct(col("gr_n"), pLoPct),
          col("x_e"))).as("win_lo"),
        max(when(col("gr_rank") === rankAtPct(col("gr_n"), pHiPct),
          col("x_e"))).as("win_hi"))
    joinOnKeysNullSafe(ranked.drop("gr_rank", "gr_n"), picks, keys)
      .withColumn(out,
        least(greatest(col("x_e"), col("win_lo")), col("win_hi")))
  }

  /** [[mad]] on the distributed rank — same low-cardinality rationale
    * as [[equiDepthBucketsDist]]: two groupRank passes (value order,
    * then deviation order), each with its order-stat pick as a
    * broadcast-joined per-group aggregate. NULL `x` excluded, exactly
    * as in [[mad]]. Output: (keys…, n, median, mad), one row/group. */
  def madDist(df: DataFrame, keys: Seq[String], x: Column): DataFrame = {
    val base = df.select(keys.map(col) :+ x.cast("long").as("__x"): _*)
      .where(col("__x").isNotNull)
    val r1 = Packing.groupRank(base, keys, Seq(col("__x")))
    val med = r1.groupBy(keys.map(col): _*)
      .agg(max(col("gr_n")).as("n"),
        max(when(col("gr_rank") === rankAtPct(col("gr_n"), 50),
          col("__x"))).as("median"))
    val withDev = joinOnKeysNullSafe(r1.drop("gr_rank", "gr_n"), med, keys)
      .withColumn("__dev", abs(col("__x") - col("median")))
    val r2 = Packing.groupRank(
      withDev.select(keys.map(col) :+ col("__dev"): _*), keys,
      Seq(col("__dev")))
    val mads = r2.groupBy(keys.map(col): _*)
      .agg(max(when(col("gr_rank") === rankAtPct(col("gr_n"), 50),
        col("__dev"))).as("mad"))
    joinOnKeysNullSafe(med, mads, keys)
      .select(keys.map(col) :+ col("n") :+ col("median") :+ col("mad"): _*)
  }

  /** Broadcast-join `small` onto `big` on `keys` with NULL-SAFE
    * equality (a null group key is a group like any other for the
    * order statistics; plain === would silently drop its rows). */
  private def joinOnKeysNullSafe(big: DataFrame, small: DataFrame,
      keys: Seq[String]): DataFrame = {
    val renamed = keys.foldLeft(small)((d, k) =>
      d.withColumnRenamed(k, s"__jk_$k"))
    val cond = keys.map(k => col(k) <=> col(s"__jk_$k")).reduce(_ && _)
    big.join(broadcast(renamed), cond)
      .drop(keys.map(k => s"__jk_$k"): _*)
  }

  def winsorize(
      df: DataFrame, keys: Seq[String], x: Column,
      pLoPct: Int, pHiPct: Int, out: String = "clipped"): DataFrame = {
    require(0 <= pLoPct && pLoPct <= pHiPct && pHiPct <= 100,
      "need 0 <= pLoPct <= pHiPct <= 100")
    val kc = keys.map(col)
    val wAll = Window.partitionBy(kc: _*)
    val wOrd = wAll.orderBy(col("x_e"))
    val base = df.withColumn("x_e", x.cast("long"))
      .withColumn("__n", count(col("x_e")).over(wAll))
      .withColumn("__rn", row_number().over(wOrd))
    // ceil(n*pct/100) in portable integer arithmetic, clamped to rank 1
    def kAt(pct: Int): Column = {
      val num = col("__n") * pct + 99
      greatest(((num - num % 100) / 100).cast("long"), lit(1L))
    }
    base
      .withColumn("win_lo",
        max(when(col("__rn") === kAt(pLoPct), col("x_e"))).over(wAll))
      .withColumn("win_hi",
        max(when(col("__rn") === kAt(pHiPct), col("x_e"))).over(wAll))
      .withColumn(out,
        least(greatest(col("x_e"), col("win_lo")), col("win_hi")))
      .drop("__n", "__rn")
  }
}
