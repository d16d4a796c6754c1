package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics: funnel conversion and cohort retention —
  * the two aggregate shapes every product/metrics pipeline runs over an
  * event stream (reference analogue: none; its export path just hands
  * SQL text to Spark, box_export.py:36 — these are the canned plans a
  * user of that surface would otherwise hand-write).
  *
  * Scale shape: both operators reduce each user's event history to a
  * fixed-width row of per-step/per-period firsts BEFORE the final small
  * aggregate. Nothing is quadratic in events, there is no self-join of
  * the raw event table against itself, and no window runs over the raw
  * stream.
  */
object Analytics {

  /** Ordered-funnel conversion: n_users who reached step 1, then step 2
    * at-or-after their step-1 time, then step 3 after that, …, each
    * within `windowSeconds` of the step-1 entry (0 = unbounded). A
    * user's step-k time is the EARLIEST `steps(k)` event >= their
    * step-(k-1) time. Emits one row per step: (step, event_type,
    * n_users), step 1-based.
    *
    * Plan: the event table is hash-partitioned ONCE on the user; each
    * step then runs one probe pass — filter to that step's type, join
    * the (one row per user) chain frame on the user key (co-partitioned
    * with the events, so no re-shuffle of either side), min-aggregate
    * the qualifying times. Funnels are 3-7 steps deep, so this is a
    * handful of linear, join-key-aligned passes; per-user state is one
    * fixed-width row throughout (never a collected event list, which is
    * the unbounded-skew form). The final count is a single global
    * aggregate over one row per step-1 user.
    */
  def funnel(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], windowSeconds: Long = 0L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol)
    val ev = events
      .select(u, col(typeCol).as("__t"), col(tsCol).as("__ts"))
      .repartition(u)
    var acc = ev.where(col("__t") === steps.head)
      .groupBy(u).agg(min(col("__ts")).as("__s1"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = col(s"__s$i")
      val inWindow =
        if (windowSeconds > 0)
          col("__ts") <= col("__s1") + expr(s"INTERVAL $windowSeconds SECONDS")
        else lit(true)
      val cand = ev.where(col("__t") === st)
        .join(acc.select(u, col("__s1"), prev), Seq(userCol))
        .where(col("__ts") >= prev && inWindow)
        .groupBy(u).agg(min(col("__ts")).as(s"__s${i + 1}"))
      acc = acc.join(cand, Seq(userCol), "left")
    }
    val counts = acc.agg(
      count(col("__s1")).as("__n1"),
      steps.indices.drop(1)
        .map(i => count(col(s"__s${i + 1}")).as(s"__n${i + 1}")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("step"), lit(st).as("event_type"),
        col(s"__n${i + 1}").as("n_users"))
    }: _*)).as("r")).select(col("r.*"))
  }

  /** Cohort retention: users grouped by the period of their FIRST event
    * (their cohort), counted as active in each later period offset.
    * Emits (cohort, period_offset, n_active, cohort_size); offset 0 is
    * the cohort itself, so n_active = cohort_size there.
    *
    * @param unit date_trunc unit for the period grid ("week", "day", …)
    * @param periodSeconds exact period length in seconds for the
    *        integer offset ((period - cohort) / periodSeconds) — exact
    *        for fixed-length units (hour/day/week), which is what
    *        retention grids use
    *
    * Plan: distinct (user, period) — one linear shuffle with partial
    * agg; the per-user min-period window reuses that hash partitioning;
    * the final groupBy runs over one row per user-period. cohort_size
    * joins back from the offset-0 slice, one row per cohort
    * (broadcast-small).
    */
  def retention(
      events: DataFrame, userCol: String, tsCol: String,
      unit: String, periodSeconds: Long): DataFrame = {
    val u = col(userCol)
    val up = events
      .select(u, date_trunc(unit, col(tsCol)).as("__p"))
      .distinct()
    val withCohort = up
      .withColumn("cohort", min(col("__p")).over(Window.partitionBy(u)))
      .withColumn("period_offset",
        ((col("__p").cast("long") - col("cohort").cast("long")) /
          periodSeconds).cast("long"))
    val active = withCohort
      .groupBy(col("cohort"), col("period_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = active.where(col("period_offset") === 0)
      .select(col("cohort"), col("n_active").as("cohort_size"))
    active.join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("period_offset"), col("n_active"),
        col("cohort_size"))
  }

  /** Pairwise co-occurrence mining (market-basket): the `topK` item
    * pairs appearing together in the most groups. Emits (item_a,
    * item_b, n_groups) with item_a < item_b, ordered by count desc then
    * pair (fully deterministic through the limit).
    *
    * Scale guard: the within-group self-join is O(m²) per group, so
    * groups larger than `maxItemsPerGroup` are EXCLUDED before pairing
    * (same df-cap discipline as Dedup's maxDocsPerGram — one
    * pathological basket must not produce a cross-join). The join is
    * co-partitioned on the group key; the pair count is one linear
    * groupBy; the top-k is TakeOrderedAndProject, never a global sort.
    */
  def cooccurrence(
      df: DataFrame, groupCol: String, itemCol: String, topK: Int,
      maxItemsPerGroup: Int = 1000): DataFrame = {
    val gi = df.select(col(groupCol).as("__g"), col(itemCol).as("__i"))
      .distinct()
    val sized = gi
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__g"))))
      .where(col("__n") <= maxItemsPerGroup)
      .drop("__n")
    val a = sized.select(col("__g"), col("__i").as("item_a"))
    val b = sized.select(col("__g"), col("__i").as("item_b"))
    a.join(b, Seq("__g"))
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_groups"))
      .orderBy(desc("n_groups"), col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for each (from, to) adjacent pair in a user's
    * time-ordered history, the count and the row-normalized probability
    * as an exact integer in millionths (n·10⁶ div n_from) — where a
    * user goes NEXT, the input to session-flow analysis, prefetching,
    * and anomalous-path detection. `tiebreak` columns must make the
    * per-user order total (same discipline as
    * [[Profile.equiDepthBuckets]]: a lead() over a non-total sort is
    * not replayable across engines).
    *
    * Plan: ONE shuffle on the user key; lead() shares that partitioning
    * and one sort; the pair aggregate is partial-aggregated and the
    * from-totals ride a count window over the (already small)
    * transition matrix, not the event stream. Nothing is quadratic in
    * events and no event list is ever collected per user.
    */
  def transitions(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      tiebreak: Seq[String]): DataFrame = {
    require(tiebreak.nonEmpty, "need a tiebreak column for a total order")
    val w = Window.partitionBy(col(userCol))
      .orderBy((col(tsCol) +: tiebreak.map(col)): _*)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("p_e6", expr("n * 1000000L div n_from"))
  }

  /** Item-item collaborative-filtering similarity over binary
    * interactions: for item pairs sharing >= `minCo` users, the squared
    * cosine of their user-incidence vectors — co² / (na·nb) — as an
    * EXACT integer in millionths (`score_e6`). Squaring keeps the score
    * rational: cosine itself needs a square root, whose floating-point
    * value is not replayable across engines; the squared form preserves
    * the ranking exactly (x² is monotone on [0,1]).
    *
    * Scale shape (the same discipline as [[cooccurrence]]): one
    * distinct pass, a count window for per-item user counts sharing the
    * item partitioning, pair expansion via ONE equi-join on the user
    * key with baskets capped at `maxItemsPerUser` (a user interacting
    * with everything contributes B²/2 pairs — cap and move on; such
    * baskets carry no similarity signal), then one pair aggregate. The
    * `minCo` floor prunes the long tail of coincidental pairs BEFORE
    * the score projection. Overflow bound: co²·10^6 needs co <= 3·10^6
    * in BIGINT — beyond that, shard users or raise minCo.
    *
    * Output: (item_a, item_b, co, na, nb, score_e6), top `topK` by
    * (score_e6 desc, item_a, item_b) — or all pairs when topK = 0.
    */
  def itemSimilarity(
      df: DataFrame, userCol: String, itemCol: String,
      minCo: Long = 2L, topK: Int = 0,
      maxItemsPerUser: Int = 1000): DataFrame = {
    val ui = df.select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .distinct()
      .withColumn("__ni", count(lit(1)).over(Window.partitionBy(col("__i"))))
    val sized = ui
      .withColumn("__nb", count(lit(1)).over(Window.partitionBy(col("__u"))))
      .where(col("__nb") <= maxItemsPerUser)
      .drop("__nb")
    val a = sized.select(col("__u"), col("__i").as("item_a"), col("__ni").as("na"))
    val b = sized.select(col("__u"), col("__i").as("item_b"), col("__ni").as("nb"))
    val scored = a.join(b, Seq("__u"))
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("co"))
      .where(col("co") >= minCo)
      .select(col("item_a"), col("item_b"), col("co"), col("na"), col("nb"),
        expr("(co * co * 1000000L) div (na * nb)").as("score_e6"))
    if (topK > 0)
      scored.orderBy(desc("score_e6"), col("item_a"), col("item_b")).limit(topK)
    else scored
  }
}
