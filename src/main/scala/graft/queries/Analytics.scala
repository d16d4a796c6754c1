package graft.queries

import graft.Tables
import graft.ext.Analytics
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Gate queries for the event-sequence analytics operators (ext
  * Analytics): ordered funnel conversion and cohort retention over the
  * events table, both fully ANSI-replayable in DuckDB.
  */
object AnalyticsQueries {

  /** signup → view → click → purchase funnel, 7-day window from the
    * signup entry. */
  def funnel(s: SparkSession, d: String): DataFrame =
    Analytics.funnel(Tables.events(s, d), "user_id", "event_type", "ts",
        steps = Seq("signup", "view", "click", "purchase"),
        windowSeconds = 7L * 24 * 3600)
      .orderBy("step")

  private val funnelOracle =
    """WITH s1 AS (
      | SELECT user_id, min(ts) AS t1 FROM events
      | WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      | SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      | WHERE e.event_type = 'view' AND e.ts >= s1.t1
      |   AND e.ts <= s1.t1 + INTERVAL 604800 SECONDS GROUP BY 1),
      |s3 AS (
      | SELECT e.user_id, min(e.ts) AS t3
      | FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
      | WHERE e.event_type = 'click' AND e.ts >= s2.t2
      |   AND e.ts <= s1.t1 + INTERVAL 604800 SECONDS GROUP BY 1),
      |s4 AS (
      | SELECT e.user_id, min(e.ts) AS t4
      | FROM events e JOIN s1 USING (user_id) JOIN s3 USING (user_id)
      | WHERE e.event_type = 'purchase' AND e.ts >= s3.t3
      |   AND e.ts <= s1.t1 + INTERVAL 604800 SECONDS GROUP BY 1)
      |SELECT 1 AS step, 'signup' AS event_type,
      | (SELECT count(*) FROM s1) AS n_users
      |UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
      |UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
      |UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)
      |ORDER BY step""".stripMargin

  /** Daily cohort retention over the month of events. */
  def retention(s: SparkSession, d: String): DataFrame =
    Analytics.retention(Tables.events(s, d), "user_id", "ts",
        unit = "day", periodSeconds = 86400L)
      .orderBy("cohort", "period_offset")

  private val retentionOracle =
    """WITH up AS (
      | SELECT DISTINCT user_id, date_trunc('day', ts) AS p FROM events),
      |wc AS (
      | SELECT user_id, p, min(p) OVER (PARTITION BY user_id) AS cohort
      | FROM up),
      |act AS (
      | SELECT cohort,
      |  CAST((epoch(p) - epoch(cohort)) / 86400 AS BIGINT) AS period_offset,
      |  count(*) AS n_active
      | FROM wc GROUP BY 1, 2),
      |sz AS (
      | SELECT cohort, n_active AS cohort_size FROM act
      | WHERE period_offset = 0)
      |SELECT a.cohort, a.period_offset, a.n_active, s.cohort_size
      |FROM act a JOIN sz s USING (cohort)
      |ORDER BY cohort, period_offset""".stripMargin

  /** Rolling z-score anomaly flags per event type: trailing 24
    * observations, 3σ bar, exact integer algebra (ext
    * TimeSeries.rollingAnomaly). */
  def anomaly(s: SparkSession, d: String): DataFrame =
    graft.ext.TimeSeries.rollingAnomaly(Tables.events(s, d),
        keys = Seq("event_type"), tsCol = "ts", valCol = "value",
        nPrior = 24, k = 3, minObs = 12, tiebreak = Seq("event_id"))
      .orderBy("event_type", "ts", "event_id")

  private val anomalyOracle =
    """WITH x AS (
      | SELECT event_type, ts, event_id,
      |  CAST(floor(value * 1000000) AS BIGINT) AS x_e6
      | FROM events),
      |w AS (
      | SELECT event_type, ts, event_id, x_e6,
      |  count(x_e6) OVER win AS c,
      |  sum(CAST(x_e6 AS HUGEINT)) OVER win AS s,
      |  sum(CAST(x_e6 AS HUGEINT) * CAST(x_e6 AS HUGEINT)) OVER win AS q
      | FROM x
      | WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
      |   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, ts, event_id, x_e6, c AS n_prior,
      | CASE WHEN c >= 12 THEN
      |  (CAST(c AS HUGEINT) * CAST(x_e6 AS HUGEINT) - s)
      |   * (CAST(c AS HUGEINT) * CAST(x_e6 AS HUGEINT) - s)
      |  > 9 * (CAST(c AS HUGEINT) * q - s * s)
      | ELSE FALSE END AS is_anomaly
      |FROM w ORDER BY event_type, ts, event_id""".stripMargin

  /** Top part pairs co-ordered in the same order (ext
    * Analytics.cooccurrence over lineitem baskets). */
  def cooccur(s: SparkSession, d: String): DataFrame =
    Analytics.cooccurrence(Tables.lineitem(s, d), "l_orderkey", "l_partkey",
      topK = 25)

  private val cooccurOracle =
    """WITH gi AS (
      | SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      |sized AS (
      | SELECT g, i FROM (
      |  SELECT g, i, count(*) OVER (PARTITION BY g) AS n FROM gi)
      | WHERE n <= 1000),
      |p AS (
      | SELECT a.i AS item_a, b.i AS item_b
      | FROM sized a JOIN sized b USING (g) WHERE a.i < b.i)
      |SELECT item_a, item_b, count(*) AS n_groups FROM p GROUP BY 1, 2
      |ORDER BY n_groups DESC, item_a, item_b LIMIT 25""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q41_funnel", funnel, Some(funnelOracle)),
    QueryDef("q42_retention", retention, Some(retentionOracle)),
    QueryDef("q43_anomaly", anomaly, Some(anomalyOracle)),
    QueryDef("q46_cooccurrence", cooccur, Some(cooccurOracle)))
}
