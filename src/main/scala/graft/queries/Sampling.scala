package graft.queries

import graft.Tables
import graft.ext.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate queries for the deterministic sampling operators. Membership is a
  * pure function of (key, seed) in an ANSI-expressible hash family, so —
  * unlike RNG sampling — the DuckDB oracle replays EXACT row membership,
  * not just cardinality bounds.
  */
object SamplingQueries {

  /** 20% reproducible sample of documents by doc_id. */
  def hashSample(s: SparkSession, d: String): DataFrame =
    Sampling.hashSample(Tables.documents(s, d), col("doc_id"), 0.2)
      .select(col("doc_id")).orderBy("doc_id")

  private val hashSampleOracle =
    """SELECT doc_id FROM documents
      |WHERE ((doc_id % 2147483647) * ((2654435761 * 1) % 2147483647) + 0)
      |      % 2147483647 < CAST(floor(0.2 * 2147483647) AS BIGINT)
      |ORDER BY doc_id""".stripMargin

  /** Leakage-safe 25% holdout labeling over documents (group key =
    * doc_id here; production callers key by dedup cluster/fingerprint so
    * near-duplicates cannot straddle train/test). */
  def trainTestSplit(s: SparkSession, d: String): DataFrame =
    Sampling.trainTestSplit(Tables.documents(s, d), col("doc_id"), 0.25, seed = 7L)
      .select(col("doc_id"), col("split")).orderBy("doc_id")

  private val trainTestOracle =
    """SELECT doc_id,
      | CASE WHEN ((doc_id % 2147483647) * ((2654435761 * 8) % 2147483647) + 7)
      |           % 2147483647 < CAST(floor(0.25 * 2147483647) AS BIGINT)
      |      THEN 'test' ELSE 'train' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Per-stratum mixing rates over events: downweight the common types,
    * keep every purchase. Emits per-type sampled counts. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSample(Tables.events(s, d),
        col("event_type"), col("event_id"),
        fractions = Map("view" -> 0.05, "click" -> 0.2, "purchase" -> 1.0),
        defaultFraction = 0.1)
      .groupBy("event_type").agg(count(lit(1)).as("n_sampled"))
      .orderBy("event_type")

  private val stratifiedOracle =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled
      |FROM events
      |WHERE ((event_id % 2147483647) * ((2654435761 * 1) % 2147483647) + 0)
      | % 2147483647 <
      | CAST(floor(2147483647 * (CASE event_type
      |   WHEN 'view' THEN 0.05 WHEN 'click' THEN 0.2
      |   WHEN 'purchase' THEN 1.0 ELSE 0.1 END)) AS BIGINT)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Temperature-scaled (p^0.5) language mixing over documents: en
    * dominates the corpus, so it is downsampled hardest; the rarest
    * language keeps every row. Row-exact membership: the oracle
    * replays counts → sqrt rate → hash threshold (sqrt and double
    * division are IEEE-correctly-rounded on both engines, so the
    * per-domain thresholds agree bit-exactly). */
  def temperatureSample(s: SparkSession, d: String): DataFrame =
    Sampling.temperatureSample(Tables.documents(s, d),
        col("lang"), col("doc_id"), alpha = 0.5)
      .select(col("doc_id"), col("lang")).orderBy("doc_id")

  private val temperatureOracle =
    """WITH c AS (
      | SELECT lang, CAST(count(*) AS BIGINT) AS n
      | FROM documents GROUP BY lang),
      |m AS (SELECT CAST(min(n) AS DOUBLE) AS nmin FROM c),
      |r AS (
      | SELECT lang, sqrt(nmin / CAST(n AS DOUBLE)) AS rate
      | FROM c, m)
      |SELECT d.doc_id, d.lang
      |FROM documents d JOIN r ON d.lang = r.lang
      |WHERE ((d.doc_id % 2147483647) * ((2654435761 * 1) % 2147483647) + 0)
      |      % 2147483647 < CAST(floor(rate * 2147483647) AS BIGINT)
      |ORDER BY d.doc_id""".stripMargin

  /** DSIR-shaped importance resampling: score every document's unigram
    * importance ratio toward the English subset (add-one-smoothed
    * target/raw models over the union vocabulary, exact integers),
    * then keep rows with probability min(1, score/cap) decided by the
    * seeded content hash. The oracle replays model training, scoring,
    * AND the resample threshold bit-exactly. */
  def importanceResample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val scored = graft.ext.TextAnalysis.importanceScore(
      docs, "text", "doc_id", docs.where(col("lang") === "en"), "text")
    Sampling.weightedSampleE6(scored, col("doc_id"), col("score_e6"),
        capE6 = 1020000L)
      .select(col("doc_id"), col("n_tokens"), col("score_e6"))
      .orderBy("doc_id")
  }

  private val importanceOracle =
    """WITH toksAll AS (
      | SELECT doc_id, lang,
      |  list_filter(string_split_regex(lower(text), '\s+'),
      |    t -> len(t) > 0) AS ts
      | FROM documents),
      |ct AS (
      | SELECT w, CAST(count(*) AS BIGINT) AS ct
      | FROM (SELECT unnest(ts) AS w FROM toksAll WHERE lang = 'en')
      | GROUP BY 1),
      |cr AS (
      | SELECT w, CAST(count(*) AS BIGINT) AS cr
      | FROM (SELECT unnest(ts) AS w FROM toksAll) GROUP BY 1),
      |model AS (
      | SELECT coalesce(ct.w, cr.w) AS w, coalesce(ct, 0) AS ct,
      |        coalesce(cr, 0) AS cr
      | FROM ct FULL OUTER JOIN cr ON ct.w = cr.w),
      |tot AS (
      | SELECT sum(ct) AS nt, sum(cr) AS nr,
      |        CAST(count(*) AS BIGINT) AS v FROM model),
      |z AS (
      | SELECT d.doc_id,
      |  (coalesce(m.ct, 0) + 1) * (t.nr + t.v) * 1000000
      |    // ((coalesce(m.cr, 0) + 1) * (t.nt + t.v)) AS z
      | FROM (SELECT doc_id, unnest(ts) AS w FROM toksAll) d
      | LEFT JOIN model m ON d.w = m.w CROSS JOIN tot t),
      |s AS (
      | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(z) // count(*) AS BIGINT) AS score_e6
      | FROM z GROUP BY doc_id)
      |SELECT doc_id, n_tokens, score_e6
      |FROM s
      |WHERE ((doc_id % 2147483647) * ((2654435761 * 1) % 2147483647) + 0)
      |      % 2147483647 <
      |      least(2147483647, score_e6 * 2147483647 // 1020000)
      |ORDER BY doc_id""".stripMargin

  /** Per-row weighted sampling: keep probability rises with
    * event_id % 100 (a stand-in for a per-row quality score). Counts per
    * type; membership replayed exactly. */
  def weightedSample(s: SparkSession, d: String): DataFrame =
    Sampling.weightedSample(Tables.events(s, d), col("event_id"),
        (col("event_id") % 100) / 100.0)
      .groupBy("event_type").agg(count(lit(1)).as("n_sampled"))
      .orderBy("event_type")

  private val weightedOracle =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled
      |FROM events
      |WHERE ((event_id % 2147483647) * ((2654435761 * 1) % 2147483647) + 0)
      | % 2147483647 <
      | CAST(floor(least(greatest((event_id % 100) / 100.0, 0.0), 1.0)
      |   * 2147483647) AS BIGINT)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Exact-50 uniform document sample (k smallest hashes, key tiebreak);
    * plans as TakeOrderedAndProject — no global sort. */
  def exactKSample(s: SparkSession, d: String): DataFrame =
    Sampling.exactKSample(
        Tables.documents(s, d).select(col("doc_id")), col("doc_id"), 50)
      .orderBy("doc_id")

  private val exactKOracle =
    """SELECT doc_id FROM (
      | SELECT doc_id FROM documents
      | ORDER BY ((doc_id % 2147483647) * ((2654435761 * 1) % 2147483647) + 0)
      |   % 2147483647, doc_id
      | LIMIT 50) t ORDER BY doc_id""".stripMargin

  /** Language-balanced quota sample over documents: exact per-language
    * counts (en 40 / de 25 / fr 15, 10 otherwise), membership = smallest
    * key hashes per stratum — the oracle replays exact rows. */
  def quotaSample(s: SparkSession, d: String): DataFrame =
    Sampling.quotaSample(Tables.documents(s, d),
        col("lang"), col("doc_id"),
        quotas = Map("en" -> 40, "de" -> 25, "fr" -> 15),
        defaultQuota = 10, seed = 3L)
      .select(col("doc_id"), col("lang")).orderBy("doc_id")

  private val quotaOracle =
    """SELECT doc_id, lang FROM (
      | SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
      |  ORDER BY ((doc_id % 2147483647) * ((2654435761 * 4) % 2147483647)
      |            + 3) % 2147483647, doc_id) AS rn
      | FROM documents) t
      |WHERE rn <= (CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 25
      |             WHEN 'fr' THEN 15 ELSE 10 END)
      |ORDER BY doc_id""".stripMargin

  /** Weighted training-order interleave over documents: en:de:fr = 3:2:1
    * (other languages dropped). First 120 positions of the global mix
    * order — the full (mix_key, lang, doc_id) order is replayed. */
  def weightedInterleave(s: SparkSession, d: String): DataFrame =
    Sampling.weightedInterleave(Tables.documents(s, d),
        col("lang"), col("doc_id"), weights = Map("en" -> 3, "de" -> 2, "fr" -> 1))
      .select(col("doc_id"), col("lang"), col("src_rank"), col("mix_key"))
      .orderBy(col("mix_key"), col("lang"), col("doc_id"))
      .limit(120)

  private val interleaveOracle =
    """WITH r AS (
      | SELECT doc_id, lang,
      |  row_number() OVER (PARTITION BY lang
      |   ORDER BY ((doc_id % 2147483647) * ((2654435761 * 1) % 2147483647)
      |             + 0) % 2147483647, doc_id) AS src_rank
      | FROM documents WHERE lang IN ('en', 'de', 'fr'))
      |SELECT doc_id, lang, CAST(src_rank AS BIGINT) AS src_rank,
      | CAST((2 * src_rank - 1) * (CASE lang WHEN 'en' THEN 2
      |   WHEN 'de' THEN 3 WHEN 'fr' THEN 6 END) AS BIGINT) AS mix_key
      |FROM r ORDER BY mix_key, lang, doc_id LIMIT 120""".stripMargin

  /** Per-language character budgets over documents (n_chars as the token
    * stand-in): rows taken in seeded-hash order until the running total
    * would exceed the budget. Exact membership replay. */
  def tokenBudget(s: SparkSession, d: String): DataFrame =
    Sampling.tokenBudgetSample(Tables.documents(s, d),
        col("lang"), col("doc_id"), col("n_chars"),
        budgets = Map("en" -> 50000L, "de" -> 20000L, "fr" -> 10000L),
        defaultBudget = 5000L, seed = 5L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_kept"))
      .orderBy("lang")

  private val tokenBudgetOracle =
    """WITH c AS (
      | SELECT lang, doc_id, n_chars,
      |  sum(n_chars) OVER (PARTITION BY lang
      |   ORDER BY ((doc_id % 2147483647) * ((2654435761 * 6) % 2147483647)
      |             + 5) % 2147483647, doc_id
      |   ROWS UNBOUNDED PRECEDING) AS cum
      | FROM documents)
      |SELECT lang, count(*) AS n_docs,
      | CAST(sum(n_chars) AS BIGINT) AS n_chars_kept
      |FROM c
      |WHERE cum <= (CASE lang WHEN 'en' THEN 50000 WHEN 'de' THEN 20000
      |              WHEN 'fr' THEN 10000 ELSE 5000 END)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Mixture balancing (ext Sampling.mixturePlan/mixtureSample): a
    * 50/30/15/5 target mixture over four sources, realized as the
    * largest no-oversampling corpus — the scarcest source relative to
    * its target pins the total, the others downsample; exact-integer
    * rates, multiplicative-hash membership, full SQL replay. */
  def mixture(s: SparkSession, d: String): DataFrame =
    Sampling.mixtureSample(Tables.documents(s, d),
        col("source"), col("doc_id"), col("n_chars"),
        targetPpm = Map("src0" -> 500000L, "src1" -> 300000L,
          "src2" -> 150000L, "src3" -> 50000L),
        seed = 7L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_chars_kept"))
      .orderBy("source")

  private val mixtureOracle =
    """WITH w AS (SELECT * FROM (VALUES ('src0', 500000), ('src1', 300000),
      |  ('src2', 150000), ('src3', 50000)) AS t(source, w)),
      |agg AS (
      | SELECT source, sum(n_chars) AS tok FROM documents GROUP BY source),
      |tt AS (
      | SELECT min(tok * 1000000 // w.w) AS T FROM agg JOIN w USING (source)),
      |rates AS (
      | SELECT a.source,
      |  LEAST(1000000, ((w.w * tt.T // 1000000) * 1000000) // a.tok) AS rate_ppm
      | FROM agg a JOIN w USING (source) CROSS JOIN tt)
      |SELECT d.source, count(*) AS n_docs,
      | CAST(sum(n_chars) AS BIGINT) AS n_chars_kept
      |FROM documents d JOIN rates r ON r.source = d.source
      |WHERE ((doc_id % 2147483647) * ((2654435761 * 8) % 2147483647)
      |       + 7) % 2147483647 < r.rate_ppm * 2147483647 // 1000000
      |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** Epoch-style mixture replication (ext Sampling.replicate): sources
    * get 2.5 / 1.0 / 0.4 / 0 effective epochs by source-id mod 4; the
    * copy multiset must replay exactly (integer weights, multiplicative
    * hash Bernoulli). */
  def replicate(s: SparkSession, d: String): DataFrame =
    Sampling.replicate(Tables.documents(s, d),
        expr("CASE cast(substring(source, 4) AS INT) % 4 " +
          "WHEN 0 THEN 2500000 WHEN 1 THEN 1000000 " +
          "WHEN 2 THEN 400000 ELSE 0 END"),
        col("doc_id"))
      .select(col("doc_id"), col("copy_id"))
      .orderBy("doc_id", "copy_id")

  private val replicateOracle =
    """WITH w AS (
      | SELECT doc_id,
      |  CASE CAST(substr(source, 4) AS INT) % 4
      |   WHEN 0 THEN 2500000 WHEN 1 THEN 1000000
      |   WHEN 2 THEN 400000 ELSE 0 END AS w
      | FROM documents),
      |k AS (
      | SELECT doc_id, w // 1000000 +
      |  CASE WHEN ((doc_id % 2147483647) * ((2654435761 * 1) % 2147483647)
      |        + 0) % 2147483647 % 1000000 < w % 1000000
      |   THEN 1 ELSE 0 END AS k
      | FROM w)
      |SELECT doc_id, CAST(unnest(range(1, k + 1)) AS BIGINT) AS copy_id
      |FROM k WHERE k >= 1
      |ORDER BY doc_id, copy_id""".stripMargin

  /** Epoch-capped mixture (ext Sampling.mixtureSampleEpochs): the
    * 50/30/15/5 target again, but src0 may repeat up to 3 epochs — the
    * cap moves the binding source from src0 to src1 and src0's rate
    * rises above 10⁶ ppm, realized as whole copies + a hash-Bernoulli
    * fractional copy. The oracle replays plan arithmetic AND the copy
    * multiset; max_copy > 1 for src0 is the upsampling witness. */
  def epochMixture(s: SparkSession, d: String): DataFrame =
    Sampling.mixtureSampleEpochs(Tables.documents(s, d),
        col("source"), col("doc_id"), col("n_chars"),
        targetPpm = Map("src0" -> 500000L, "src1" -> 300000L,
          "src2" -> 150000L, "src3" -> 50000L),
        capE6 = Map("src0" -> 3000000L),
        seed = 3L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_chars")).cast("long").as("n_chars_eff"),
        max(col("copy_id")).as("max_copy"))
      .orderBy("source")

  private val epochMixtureOracle =
    """WITH w AS (SELECT * FROM (VALUES ('src0', 500000, 3000000),
      |  ('src1', 300000, 1000000), ('src2', 150000, 1000000),
      |  ('src3', 50000, 1000000)) AS t(source, w, e)),
      |agg AS (
      | SELECT source, sum(n_chars) AS tok FROM documents GROUP BY source),
      |tt AS (
      | SELECT min(tok * e // w.w) AS T FROM agg JOIN w USING (source)),
      |rates AS (
      | SELECT a.source,
      |  LEAST(e, ((w.w * tt.T // 1000000) * 1000000) // a.tok) AS rate_ppm
      | FROM agg a JOIN w USING (source) CROSS JOIN tt),
      |k AS (
      | SELECT d.source, d.n_chars,
      |  r.rate_ppm // 1000000 +
      |  CASE WHEN ((d.doc_id % 2147483647) * ((2654435761 * 4) % 2147483647)
      |        + 3) % 2147483647 % 1000000 < r.rate_ppm % 1000000
      |   THEN 1 ELSE 0 END AS k
      | FROM documents d JOIN rates r ON r.source = d.source)
      |SELECT source, CAST(sum(k) AS BIGINT) AS n_rows,
      | CAST(sum(n_chars * k) AS BIGINT) AS n_chars_eff,
      | CAST(max(k) AS BIGINT) AS max_copy
      |FROM k WHERE k >= 1
      |GROUP BY source ORDER BY source""".stripMargin

  /** Deterministic 5-fold assignment over documents (ext
    * Sampling.kFold — same replayable multiplicative hash). */
  def kfold(s: SparkSession, d: String): DataFrame =
    Sampling.kFold(Tables.documents(s, d), col("doc_id"), k = 5)
      .select(col("doc_id"), col("fold")).orderBy("doc_id")

  private val kfoldOracle =
    """SELECT doc_id,
      | ((doc_id % 2147483647) * ((2654435761 * 1) % 2147483647) + 0)
      |   % 2147483647 % 5 AS fold
      |FROM documents ORDER BY doc_id""".stripMargin

  /** sm15: deterministic per-epoch shuffle order (Sampling.epochOrder)
    * — 3 independent epoch permutations of documents at seed 9, global
    * positions from the distributed rank; the multiplier-rescaled hash
    * replays exactly in the oracle. */
  def epochShuffle(s: SparkSession, d: String): DataFrame =
    Sampling.epochOrder(Tables.documents(s, d), col("doc_id"),
        epochs = 3, seed = 9L)
      .orderBy("id", "epoch")

  private val epochShuffleOracle =
    """WITH e AS (
      | SELECT doc_id AS id, unnest(range(0, 3)) AS epoch FROM documents),
      |h AS (
      | SELECT id, epoch,
      |  ((id % 2147483647) * ((2654435761 * (9 + epoch + 1)) % 2147483647)
      |    + (9 + epoch)) % 2147483647 AS hv
      | FROM e)
      |SELECT id, CAST(epoch AS BIGINT) AS epoch,
      | CAST(row_number() OVER (PARTITION BY epoch ORDER BY hv, id)
      |   AS BIGINT) AS pos
      |FROM h ORDER BY id, epoch""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("sm15_epoch_shuffle", epochShuffle, Some(epochShuffleOracle)),
    QueryDef("sm10_kfold", kfold, Some(kfoldOracle)),
    QueryDef("sm9_replicate", replicate, Some(replicateOracle)),
    QueryDef("sm1_hash_sample", hashSample, Some(hashSampleOracle)),
    QueryDef("sm2_train_test_split", trainTestSplit, Some(trainTestOracle)),
    QueryDef("sm3_stratified_sample", stratifiedSample, Some(stratifiedOracle)),
    QueryDef("sm4_weighted_sample", weightedSample, Some(weightedOracle)),
    QueryDef("sm5_exact_k_sample", exactKSample, Some(exactKOracle)),
    QueryDef("sm6_quota_sample", quotaSample, Some(quotaOracle)),
    QueryDef("sm7_weighted_interleave", weightedInterleave, Some(interleaveOracle)),
    QueryDef("sm8_token_budget", tokenBudget, Some(tokenBudgetOracle)),
    QueryDef("sm11_temperature_sample", temperatureSample,
      Some(temperatureOracle)),
    QueryDef("sm13_mixture", mixture, Some(mixtureOracle)),
    QueryDef("sm14_epoch_mixture", epochMixture, Some(epochMixtureOracle)),
    QueryDef("sm12_importance_resample", importanceResample,
      Some(importanceOracle)))
}
