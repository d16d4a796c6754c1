package graft.queries

import graft.Tables
import graft.ext.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate queries for the approximate-sketch operators. An approximation
  * cannot hash-match an exact oracle, so these gates emit BOUNDS CHECKS:
  * each row carries the exact value (computed by both engines — that part
  * hash-matches) plus booleans asserting the estimate landed inside its
  * declared error bound; the DuckDB oracle emits TRUE for the same rows.
  * The sketches are deterministic (fixed seeds / hash families) over the
  * fixed gate corpus, so the booleans are stable, not flaky.
  */
object SketchQueries {

  // --------------------------------------- k1: HLL distinct (+ merge path)

  /** Distinct users per event type, three ways: exact; a direct HLL
    * sketch per type; and hourly HLL sketches UNIONED up to the type —
    * the mergeable-reaggregation path that answers rollups at 100 TB
    * without rescanning. Both estimates must land within ±5% (≥3σ at
    * lgK=12) of exact. */
  def approxDistinct(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val direct = Sketches
      .distinctSketches(ev, Seq(col("event_type")), col("user_id"))
      .select(col("event_type"), Sketches.estimate(col("nd_sketch")).as("nd_direct"))
    val hourly = Sketches.distinctSketches(ev,
      Seq(col("event_type"), date_trunc("hour", col("ts")).as("h")), col("user_id"))
    val merged = Sketches.mergeSketches(hourly, Seq(col("event_type")))
      .select(col("event_type"), Sketches.estimate(col("nd_sketch")).as("nd_merged"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(direct, "event_type").join(merged, "event_type")
      .select(col("event_type"), col("n_exact"),
        (abs(col("nd_direct") - col("n_exact")) <=
          col("n_exact").cast("double") * 0.05).as("ok_direct"),
        (abs(col("nd_merged") - col("n_exact")) <=
          col("n_exact").cast("double") * 0.05).as("ok_merged"))
      .orderBy("event_type")
  }

  private val approxDistinctOracle =
    """SELECT event_type,
      | CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
      | TRUE AS ok_direct, TRUE AS ok_merged
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------- k2: approximate quantiles

  /** p50/p90/p99 of event value via the percentile digest at accuracy
    * 10⁴ (rank error ≤ 0.01% of N). The bound check brackets each
    * estimate between the EXACT interpolated percentiles at p ± 0.001 —
    * 10× the guaranteed rank error, still a 0.1%-of-N window. */
  def approxQuantiles(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val probs = Seq(0.5, 0.9, 0.99)
    val margin = 0.001
    val aq = Sketches.approxQuantiles(ev, col("value"), probs, accuracy = 10000)
    val bounds = ev.agg(
      count(lit(1)).as("n"),
      expr(s"percentile(value, array(${probs.map(_ - margin).mkString(",")}))").as("lo"),
      expr(s"percentile(value, array(${probs.map(_ + margin).mkString(",")}))").as("hi"))
    aq.join(bounds.select(col("n"),
        explode(arrays_zip(
          array(probs.map(lit(_)): _*).as("p"), col("lo").as("l"), col("hi").as("h"))).as("b"))
      .select(col("n"), col("b.p").as("p"), col("b.l").as("lo"), col("b.h").as("hi")), "p")
      .select(col("p"), col("n"),
        (col("approx_value") >= col("lo") && col("approx_value") <= col("hi"))
          .as("within_bounds"))
      .orderBy("p")
  }

  private val approxQuantilesOracle =
    """SELECT p, (SELECT count(*) FROM events) AS n, TRUE AS within_bounds
      |FROM (VALUES (0.5), (0.9), (0.99)) t(p) ORDER BY p""".stripMargin

  // --------------------------------------- k3: count-min heavy hitters

  /** Frequency of every event type estimated from ONE CountMinSketch
    * binary (eps=0.001, confidence 0.99, fixed seed). CMS never
    * underestimates, and overshoots by at most eps·N with the declared
    * confidence — both sides of that guarantee are asserted per type. */
  def cmsFrequencies(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val eps = 0.001
    val exact = ev.groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n_exact"))
    val total = ev.count()
    Sketches.cmsEstimates(ev, col("event_type"), exact, eps = eps)
      .select(col("key").as("event_type"), col("n_exact"),
        (col("approx_count") >= col("n_exact")).as("ok_no_undercount"),
        (col("approx_count") <= col("n_exact") + (eps * total).toLong)
          .as("ok_overcount_bound"))
      .orderBy("event_type")
  }

  private val cmsOracle =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact,
      | TRUE AS ok_no_undercount, TRUE AS ok_overcount_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------ k4: heavy-hitter discovery

  /** Top-3 event types by frequency via the frequent-items sketch. The
    * column has 5 distinct values ≪ maxItemsTracked, so the sketch never
    * evicts and its counts are EXACT — the oracle is a plain
    * count/order/limit. (At real cardinality the counts carry the
    * standard frequent-items bounds; the gate pins the exact regime.) */
  def approxTopK(s: SparkSession, d: String): DataFrame =
    Sketches.approxTopK(Tables.events(s, d), "event_type", 3)

  private val approxTopKOracle =
    """SELECT event_type AS item, count(*) AS n FROM events
      |GROUP BY event_type ORDER BY n DESC, item LIMIT 3""".stripMargin

  // ----------------------------------- k5: HLL intersection estimate

  /** Audience overlap: distinct viewers ∩ distinct purchasers via
    * inclusion-exclusion over HLL sketches (Sketches
    * .distinctIntersection). The bound is 5% of the UNION size —
    * inclusion-exclusion compounds three ±1.6%σ estimates, and here the
    * overlap is a material fraction of the union (the operator's
    * documented applicability condition). */
  def approxIntersection(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val a = ev.where(col("event_type") === "view").select(col("user_id"))
    val b = ev.where(col("event_type") === "purchase").select(col("user_id"))
    val est = Sketches.distinctIntersection(a, col("user_id"), b, col("user_id"))
    val exactI = a.intersect(b).agg(count(lit(1)).as("n_exact_inter"))
    val exactU = a.union(b).distinct().agg(count(lit(1)).as("n_exact_union"))
    est.crossJoin(exactI).crossJoin(exactU).select(
      col("n_exact_inter"), col("n_exact_union"),
      (abs(col("est_intersection") - col("n_exact_inter")) <=
        col("n_exact_union").cast("double") * 0.05).as("ok_inter"))
  }

  private val approxIntersectionOracle =
    """WITH a AS (
      | SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
      |b AS (
      | SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT
      | (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
      |   AS n_exact_inter,
      | (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
      |   AS n_exact_union,
      | TRUE AS ok_inter""".stripMargin

  /** k6: sketch TAKEDOWN by window refresh (Sketches.refreshWindows —
    * sketches merge but cannot subtract, so a removal rebuilds ONLY the
    * hourly sketches that lost rows and keeps every other hour's bytes):
    * remove every user_id divisible by 7, refresh the affected
    * (event_type, hour) sketches from the remaining events, roll both
    * the refreshed set AND a fresh full rebuild up to event_type. The
    * refreshed estimate must EQUAL the fresh rebuild's (HLL state is a
    * pure function of the input set) and land within the k1 ±5% bound
    * of the exact remaining distinct count. */
  def sketchWindowRefresh(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("user_id"),
      date_trunc("hour", col("ts")).as("h"))
    val removedPred = col("user_id") % 7 === 0
    val windowed = Sketches.distinctSketches(ev,
      Seq(col("event_type"), col("h")), col("user_id"))
    val remaining = ev.where(!removedPred)
    val affected = ev.where(removedPred)
      .select(col("event_type"), col("h")).distinct()
    val refreshed = Sketches.refreshWindows(windowed, remaining, affected,
      Seq("event_type", "h"), col("user_id"))
    val fresh = Sketches.distinctSketches(remaining,
      Seq(col("event_type"), col("h")), col("user_id"))
    val a = Sketches.mergeSketches(refreshed, Seq(col("event_type")))
      .select(col("event_type"),
        Sketches.estimate(col("nd_sketch")).as("nd_refreshed"))
    val b = Sketches.mergeSketches(fresh, Seq(col("event_type")))
      .select(col("event_type"),
        Sketches.estimate(col("nd_sketch")).as("nd_fresh"))
    val exact = remaining.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(a, "event_type").join(b, "event_type")
      .select(col("event_type"), col("n_exact"),
        (col("nd_refreshed") === col("nd_fresh")).as("eq_fresh"),
        (abs(col("nd_refreshed") - col("n_exact")) <=
          col("n_exact").cast("double") * 0.05).as("ok_bound"))
      .orderBy("event_type")
  }

  private val sketchWindowRefreshOracle =
    """SELECT event_type,
      | CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
      | TRUE AS eq_fresh, TRUE AS ok_bound
      |FROM events WHERE user_id % 7 <> 0
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("k6_sketch_window_refresh", sketchWindowRefresh,
      Some(sketchWindowRefreshOracle)),
    QueryDef("k5_approx_intersection", approxIntersection,
      Some(approxIntersectionOracle)),
    QueryDef("k1_approx_distinct", approxDistinct, Some(approxDistinctOracle)),
    QueryDef("k2_approx_quantiles", approxQuantiles, Some(approxQuantilesOracle)),
    QueryDef("k3_cms_frequencies", cmsFrequencies, Some(cmsOracle)),
    QueryDef("k4_approx_topk", approxTopK, Some(approxTopKOracle)))
}
