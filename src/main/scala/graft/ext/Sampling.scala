package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the selected rows change
  * whenever the partition layout changes (repartition, AQE coalescing,
  * task retry at the source level) — unacceptable where a sample defines
  * a training set or an eval holdout that must be reproducible. These
  * operators decide membership from a HASH OF THE ROW'S KEY instead:
  *  - reproducible across runs, layouts, and engines (the hash is
  *    ANSI-SQL-expressible — the DuckDB gate oracles replay it exactly);
  *  - a pure narrow filter — zero shuffles at any scale;
  *  - monotone in `fraction`: the 1% sample is a subset of the 10%
  *    sample at the same seed (hash thresholds nest), which makes
  *    scaling-law subset chains consistent for free.
  *
  * Hash family: Knuth multiplicative on the key folded into the Mersenne
  * prime M = 2^31-1, `h = (pmod(key, M) · Ks + seed) mod M` with the
  * MULTIPLIER seed-scaled, `Ks = 2654435761 · (seed+1) mod M`; compared
  * against `floor(fraction · M)` as an INTEGER (no float equality edge
  * between engines). The seed must rescale the multiplier, not just
  * offset the hash: an additive seed (on the hash OR on the multiplier)
  * perturbs h by only `key·Δseed mod M`, so small-keyed corpora would
  * draw near-identical samples under different seeds. Rescaling makes
  * the per-key difference `key·K·Δ mod M` — fully scrambled. Because M
  * is prime, ANY nonzero Ks is a bijection of Z_M — every seed yields a
  * full, uniform permutation (only seed ≡ −1 mod M is degenerate and
  * rejected). The inner pmod bounds the product at < 2^62 < Long.Max, so
  * any long key is safe (base hash shared with Similarity.ivfTopK's
  * centroid sample, Similarity.scala:141-146). String keys: fingerprint
  * first (`GraftFunctions.fingerprint`, whose DuckDB replay is the t4
  * oracle) and pass the long through.
  */
object Sampling {

  val M: Long = 2147483647L // 2^31 - 1
  val K: Long = 2654435761L

  /** The sampling hash in [0, M): deterministic in (key value, seed). */
  def bucketOf(key: Column, seed: Long): Column = {
    val ks = (((BigInt(K) * (BigInt(seed) + 1)) mod BigInt(M)) + M).toLong % M
    require(ks != 0L, s"degenerate seed $seed (multiplier collapses to 0)")
    pmod(pmod(key, lit(M)) * lit(ks) + lit(seed), lit(M))
  }

  private def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction")
    math.floor(fraction * M).toLong
  }

  /** Deterministic per-epoch shuffle order — multi-epoch training wants
    * a DIFFERENT document order each epoch (repeat order hurts
    * convergence) that is nevertheless reproducible and
    * layout-independent (a resumed or re-sharded run must see the same
    * stream). Each document gets, for every epoch, its global position
    * under the order (h_e(key), key) where h_e is [[bucketOf]] with the
    * multiplier rescaled by (seed + epoch) — a full permutation of Z_M
    * per epoch, so epochs are independently shuffled. Positions come
    * from [[Packing.groupRank]] with epoch as the group: the global
    * per-epoch rank is the two-phase distributed form, no single-task
    * sort however many documents an epoch holds.
    *
    * Output: (key column as `id`, epoch, pos) with pos 1-based within
    * the epoch. Scale shape: one |epochs|-way fanout projection + the
    * groupRank range exchange. */
  def epochOrder(df: DataFrame, key: Column, epochs: Int,
      seed: Long = 0L): DataFrame = {
    require(epochs >= 1, s"epochs=$epochs")
    // ks = K·(seed+epoch+1) mod M must stay nonzero (the bijection
    // argument above) and the product inside the fanout hash must not
    // overflow: both hold when seed+epochs is far from M — enforce the
    // sane range instead of documenting a trap.
    require(seed >= 0L && seed + epochs + 1L < M,
      s"seed=$seed epochs=$epochs out of the safe range [0, M)")
    val fanned = df.select(key.as("id"))
      .withColumn("epoch", explode(sequence(lit(0L), lit(epochs - 1L))))
    // bucketOf with a per-row (column) seed: same algebra, the
    // multiplier rescale keeps epochs independent (see object scaladoc)
    val ks = pmod(lit(K) * (lit(seed) + col("epoch") + 1L), lit(M))
    val h = pmod(
      pmod(col("id"), lit(M)) * ks + (lit(seed) + col("epoch")), lit(M))
    Packing.groupRank(fanned.withColumn("__h", h), Seq("epoch"),
        Seq(col("__h"), col("id")))
      .select(col("id"), col("epoch"), col("gr_rank").as("pos"))
  }

  /** Keep rows whose key hashes under `fraction`: a reproducible,
    * layout-independent Bernoulli-style sample (exact membership, not
    * exact cardinality — like Bernoulli, the kept count concentrates
    * around fraction·N). */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      seed: Long = 0L): DataFrame =
    df.where(bucketOf(key, seed) < lit(threshold(fraction)))

  /** Per-stratum fractions (e.g. downweight boilerplate-heavy sources,
    * upweight rare languages — the data-mixing primitive). Strata absent
    * from `fractions` default to `defaultFraction`. Still a narrow
    * filter: the per-stratum threshold is a small when-chain, no join. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      seed: Long = 0L): DataFrame = {
    val thr = fractions.foldLeft(lit(threshold(defaultFraction))) {
      case (acc, (s, f)) => when(stratum === lit(s), lit(threshold(f))).otherwise(acc)
    }
    df.where(bucketOf(key, seed) < thr)
  }

  /** Temperature-scaled mixture sampling — the p^α rule of multilingual
    * / multi-domain pretraining: with domain share p_d = n_d/N, the
    * target mixture is q_d ∝ p_d^α, realized WITHOUT replication by
    * keeping each row of domain d with rate_d ∝ p_d^(α−1), normalized
    * so the rarest domain keeps everything (rates = (n_min/n_d)^(1−α)
    * ≤ 1). α=1 is the natural distribution (keep all), α=0 flattens to
    * uniform-by-domain (rate n_min/n_d), α between interpolates.
    * Membership is the seeded content hash ([[bucketOf]]) under a
    * per-domain threshold, so the sample is reproducible row-exact.
    *
    * Scale shape: one partial-agg shuffle of |domains| rows for the
    * counts, a broadcast join of the tiny rate table onto the corpus,
    * then a narrow filter — the corpus itself is scanned once and
    * never shuffled.
    *
    * Cross-engine exactness: α ∈ {0, 0.5, 1} computes the rate via
    * exact division / IEEE-correctly-rounded sqrt, so an independent
    * SQL engine replays membership bit-exactly (the gate pins α=0.5);
    * other α go through pow(), correct to ~1 ulp, where a hash landing
    * exactly on a threshold boundary could in principle differ. */
  def temperatureSample(df: DataFrame, domain: Column, key: Column,
      alpha: Double = 0.5, seed: Long = 0L): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha=$alpha not in [0,1]")
    Seq("__dom", "__n", "__nmin", "__rate").foreach(c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"temperatureSample: input already has a column named '$c'"))
    val counts = df.groupBy(domain.as("__dom")).agg(count(lit(1)).as("__n"))
    val ratio = col("__nmin").cast("double") / col("__n").cast("double")
    val rate =
      if (alpha == 1.0) lit(1.0)
      else if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 0.0) ratio
      else pow(ratio, lit(1.0 - alpha))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__nmin"))))
      .select(col("__dom"), rate.as("__rate"))
    df.join(broadcast(rates), domain === col("__dom"))
      .where(bucketOf(key, seed) <
        floor(col("__rate") * lit(M.toDouble)).cast("long"))
      .drop("__dom", "__rate")
  }

  /** Per-row WEIGHTED sampling: keep each row with probability
    * `weight` (a column in [0,1], clamped), decided by the same
    * content-keyed hash — reproducible importance sampling (e.g. keep
    * high-quality documents with p=1.0, boilerplate-heavy with p=0.05,
    * where the weight comes from a quality score). Still a pure narrow
    * filter. */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      seed: Long = 0L): DataFrame = {
    val w = least(greatest(weight, lit(0.0)), lit(1.0))
    df.where(bucketOf(key, seed) < floor(w * M).cast("long"))
  }

  /** Exact-integer weighted sampling: keep each row with probability
    * min(1, weightE6/capE6), where the weight is a scaled-integer
    * column (e.g. [[TextAnalysis.importanceScore]]'s score_e6 — this
    * pair is the DSIR resampling step: rows at or above the cap always
    * survive, the rest proportionally). Unlike [[weightedSample]] the
    * threshold arithmetic is pure BIGINT (weight·M div cap), so
    * membership replays bit-exactly in any engine — no double
    * rounding anywhere. Still a narrow filter. Overflow bound:
    * weightE6·M needs weightE6 < 4.3·10⁹. */
  def weightedSampleE6(df: DataFrame, key: Column, weightE6: Column,
      capE6: Long, seed: Long = 0L): DataFrame = {
    require(capE6 > 0L, s"capE6=$capE6")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val scaled = greatest(weightE6.cast("long"), lit(0L)) * lit(M)
    val intDiv = column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        expression(scaled), expression(lit(capE6))))
    df.where(bucketOf(key, seed) < least(lit(M), intDiv))
  }

  /** EXACT-size uniform sample: the k smallest hash values (ties broken
    * by key). Unlike Bernoulli sampling the output cardinality is
    * exactly min(k, N), and it plans as TakeOrderedAndProject — each
    * partition keeps its local top-k, the driver merges k·partitions
    * candidates, no global sort ever materializes. Nested subsets come
    * from nested k at the same seed. */
  def exactKSample(df: DataFrame, key: Column, k: Int,
      seed: Long = 0L): DataFrame =
    df.orderBy(bucketOf(key, seed).asc, key.asc).limit(k)

  /** EXACT per-stratum quotas (language/source-balanced mixing): keep the
    * `quota(stratum)` rows with the smallest key hashes inside each
    * stratum — deterministic membership AND deterministic cardinality
    * per stratum (min(quota, stratum size)), unlike fraction-based
    * stratified sampling whose per-stratum counts fluctuate.
    *
    * Plan shape: one shuffle on the stratum plus a rank filter. The
    * filter is split into a LITERAL `rn <= maxQuota` conjunct and the
    * per-stratum when-chain: the literal bound lets Spark's
    * InferWindowGroupLimit insert a WindowGroupLimit below the exchange,
    * so each map task forwards at most maxQuota candidate rows per
    * stratum instead of the whole stratum — the same partial top-k
    * shape as TakeOrderedAndProject, which is what makes a skewed
    * dominant stratum (80% English) survivable at corpus scale. */
  def quotaSample(df: DataFrame, stratum: Column, key: Column,
      quotas: Map[String, Int], defaultQuota: Int = 0,
      seed: Long = 0L): DataFrame = {
    require(defaultQuota >= 0 && quotas.values.forall(_ >= 0), "quotas must be >= 0")
    require(!df.columns.contains("__rn"),
      "quotaSample: input already has a column named '__rn' (scratch name); rename it first")
    val maxQuota = (quotas.values.toSeq :+ defaultQuota).max
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(bucketOf(key, seed).asc, key.asc)
    val q = quotas.foldLeft(lit(defaultQuota)) {
      case (acc, (s, k)) => when(stratum === lit(s), lit(k)).otherwise(acc)
    }
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= lit(maxQuota) && col("__rn") <= q)
      .drop("__rn")
  }

  /** Deterministic weighted INTERLEAVE — the training-order mixing
    * primitive: given integer mixing weights per source (e.g. web=3,
    * code=2, books=1), assign every row an exact integer `mix_key` such
    * that reading rows in `(mix_key, source, key)` order yields the
    * sources interleaved in weight proportion (stride scheduling: source
    * s occupies positions (2r−1)·L/w_s for r = 1,2,…, L = lcm of the
    * weights — after any prefix of length t, each source has appeared
    * w_s·t/W ± 1 times). Sources absent from `weights` are dropped.
    *
    * Within a source the order is the seeded content hash ([[bucketOf]])
    * — a reproducible shuffle, so the interleave is also the corpus
    * shuffle pass. Everything is exact integer arithmetic: the DuckDB
    * gate oracle replays the full order.
    *
    * Scale shape: one shuffle+sort per source for the rank window; the
    * consumer materializes the order with `orderBy(mix_key, …)`, which
    * Spark executes as a range-partitioned sort (sampled boundaries, all
    * partitions sort in parallel — no single-task global window
    * anywhere). `mix_key` magnitude is bounded by 2·N·L: with L capped
    * at 10^6 that leaves room for N up to ~4.6×10^12 rows in a Long. */
  def weightedInterleave(df: DataFrame, source: Column, key: Column,
      weights: Map[String, Int], seed: Long = 0L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weightedInterleave: weights must be positive (omit a source to drop it)")
    Seq("src_rank", "mix_key").foreach(c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"weightedInterleave: input already has a column named '$c'"))
    val lcmAll = weights.values.map(BigInt(_)).reduce((a, b) => a * b / a.gcd(b))
    require(lcmAll <= 1000000L,
      s"weightedInterleave: lcm of weights is $lcmAll (> 1e6); use smaller coprime weights")
    val strides = weights.map { case (s, wt) => s -> (lcmAll.toLong / wt) }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(source).orderBy(bucketOf(key, seed).asc, key.asc)
    val stride = strides.tail.foldLeft(lit(strides.head._2)) {
      case (acc, (s, st)) => when(source === lit(s), lit(st)).otherwise(acc)
    }
    df.where(source.isin(weights.keys.toSeq.map(x => x: Any): _*))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("mix_key", (lit(2L) * col("src_rank") - lit(1L)) * stride)
  }

  /** Per-stratum TOKEN-BUDGET sampling — corpora are budgeted in tokens,
    * not documents: within each stratum, rows are taken in seeded-hash
    * order ([[bucketOf]], reproducible) while the running `tokens` total
    * stays within the stratum's budget (inclusive: a row is kept iff the
    * cumulative sum THROUGH it is ≤ budget). Deterministic membership,
    * exact-replayable by the gate oracle's cumulative-sum window.
    *
    * Scale shape: one shuffle on the stratum + an in-partition running
    * sum. Unlike [[quotaSample]] there is no WindowGroupLimit pushdown —
    * a prefix sum must see every row of the stratum — so a dominant
    * stratum costs a full sort of its rows; when budgets are far below
    * stratum size, pre-thin with [[quotaSample]] at quota ≈
    * budget/min_tokens_per_row first (same hash order, so the prefix is
    * identical), then budget-cut the survivors. */
  def tokenBudgetSample(df: DataFrame, stratum: Column, key: Column,
      tokens: Column, budgets: Map[String, Long], defaultBudget: Long = 0L,
      seed: Long = 0L): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "tokenBudgetSample: budgets must be >= 0")
    require(!df.columns.contains("__cum"),
      "tokenBudgetSample: input already has a column named '__cum' (scratch name); rename it first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(bucketOf(key, seed).asc, key.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val b = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (s, v)) => when(stratum === lit(s), lit(v)).otherwise(acc)
    }
    df.withColumn("__cum", sum(tokens).over(w))
      .where(col("__cum") <= b)
      .drop("__cum")
  }

  /** Per-source token supplies — the ADDITIVE state [[mixturePlan]]
    * derives from: (source, n_docs, tokens_total). Counts are sums, so
    * increments from disjoint batches merge exactly via
    * [[mergeSupplies]] — a stream maintains the mixture plan under
    * ingest without ever re-scanning the corpus (the sc9/st19
    * incremental-index pattern applied to the data-mix decision). */
  def mixtureSupplies(df: DataFrame, source: Column,
      tokens: Column): DataFrame =
    df.select(source.as("source"), tokens.as("__t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("tokens_total"))

  /** Additive merge of two [[mixtureSupplies]] relations (sources-sized
    * metadata — the exchange is KBs). */
  def mergeSupplies(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("tokens_total")).as("tokens_total"))

  /** Mixture balancing plan: given target mixture weights per source in
    * MILLIONTHS (must sum to 1,000,000) and the corpus's per-source
    * token supply, compute the per-source sampling rates that realize
    * the LARGEST achievable corpus with that mixture WITHOUT
    * oversampling any source (no repetition — pair with [[replicate]]
    * when epoching is acceptable). This is the standard pretraining
    * data-mix operation ("50% curated, 30% web, 15% code, 5% papers"):
    * the scarcest source relative to its target pins the total
    * (T = min_s ⌊tok_s·10⁶ / w_s⌋), every other source downsamples to
    * its share (rate_s = ⌊w_s·T/10⁶⌋·10⁶ / tok_s, ppm).
    *
    * All arithmetic is exact integer division, so the plan — and the
    * sample drawn from it via the ANSI-replayable hash — replays
    * bit-identically in any engine. Sources absent from `targetPpm` get
    * rate 0 (dropped). Output: (source, n_docs, tokens_total,
    * rate_ppm) — an aggregate relation, one row per source.
    *
    * Plan shape: ONE partial-aggregated groupBy over the corpus; the
    * min-T reduction is over the (sources-sized) aggregate. */
  def mixturePlan(df: DataFrame, source: Column, tokens: Column,
      targetPpm: Map[String, Long]): DataFrame =
    mixturePlanFromSupplies(mixtureSupplies(df, source, tokens), targetPpm)

  /** [[mixturePlan]] from an already-aggregated supply relation —
    * lets a maintained (streamed / merged) supply table re-derive the
    * plan without touching data rows. */
  def mixturePlanFromSupplies(supplies: DataFrame,
      targetPpm: Map[String, Long]): DataFrame = {
    require(targetPpm.nonEmpty, "mixturePlan: empty target")
    require(targetPpm.values.forall(_ > 0),
      "mixturePlan: every target weight must be > 0 ppm")
    require(targetPpm.values.sum == 1000000L,
      s"mixturePlan: target weights sum to ${targetPpm.values.sum}, want 1000000")
    val counts = supplies
      .withColumn("__w", targetPpm.foldLeft(lit(0L)) {
        case (acc, (s, w)) =>
          when(col("source") === lit(s), lit(w)).otherwise(acc)
      })
    // A targeted source ABSENT from the corpus (or with zero token
    // supply) cannot satisfy any positive share: T would have to be 0
    // and the "mixture" empty. That is a caller error, not a plan —
    // raise it instead of silently realizing a wrong mixture from the
    // sources that do exist. (The sources-sized collect is metadata.)
    val present = counts.where(col("__w") > 0 && col("tokens_total") > 0)
      .select(col("source")).collect().map(_.getString(0)).toSet
    val missing = targetPpm.keySet -- present
    require(missing.isEmpty,
      s"mixturePlan: targeted sources with no token supply in the corpus: " +
        missing.toSeq.sorted.mkString(", "))
    // DECIMAL(38,0) intermediates: tokens_total·10⁶ overflows BIGINT
    // past ~9.2e12 tokens (a few tens of TB of text); floor of a
    // positive decimal division == integer division, matching the
    // oracle's 128-bit `//`.
    val tRow = counts.where(col("__w") > 0)
      .select(min(expr(
        "CAST(floor(CAST(tokens_total AS DECIMAL(38,0)) * 1000000 / __w)" +
          " AS DECIMAL(38,0))")).as("__T"))
    counts.crossJoin(broadcast(tRow))
      .select(col("source"), col("n_docs"), col("tokens_total"),
        when(col("__w") === 0L || col("tokens_total") === 0L, lit(0L))
          .otherwise(least(lit(1000000L),
            expr("CAST(floor(floor(CAST(__w AS DECIMAL(38,0)) * __T " +
              "/ 1000000) * 1000000 / tokens_total) AS BIGINT)")))
          .as("rate_ppm"))
  }

  /** Draw the mixture [[mixturePlan]] prescribes: per-source hash
    * sampling at the plan's rate_ppm — a broadcast join of the
    * (sources-sized) plan plus the usual narrow hash filter, so the
    * corpus pays one aggregate pass and one filter pass, no shuffle of
    * data rows. The kept multiset is deterministic in (key, seed) and
    * engine-replayable. */
  def mixtureSample(df: DataFrame, source: Column, key: Column,
      tokens: Column, targetPpm: Map[String, Long],
      seed: Long = 0L): DataFrame = {
    require(!df.columns.exists(c => c == "__rate_ppm" || c == "__src"),
      "mixtureSample: input already has a scratch column name; rename it")
    val plan = mixturePlan(df, source, tokens, targetPpm)
      .select(col("source").as("__src"), col("rate_ppm").as("__rate_ppm"))
    df.join(broadcast(plan), source === col("__src"))
      .where(bucketOf(key, seed) <
        expr("__rate_ppm * 2147483647L div 1000000"))
      .drop("__src", "__rate_ppm")
  }

  /** [[mixturePlan]] with per-source EPOCH CAPS — the upsampling form
    * of mixture balancing. The cap-free plan never repeats a document
    * (rate ≤ 10⁶ ppm), so the scarcest source pins the whole corpus
    * and a 30%-code / 70%-web target starves when code is scarce. Real
    * pretraining mixtures instead repeat scarce high-quality sources a
    * bounded number of epochs. `capE6(s)` is source s's maximum
    * effective epochs in MILLIONTHS (4 epochs = 4,000,000); sources
    * absent from the map get `defaultCapE6` (10⁶ = the no-repeat plan,
    * so with an empty map this degenerates to [[mixturePlan]] exactly —
    * same T, same rates, pinned by spec).
    *
    * Arithmetic (exact integers, replayable):
    * T = min over targeted s of ⌊tok_s · e_s / w_s⌋ (the total the
    * scarcest source can sustain AT ITS CAP), take_s = ⌊w_s·T/10⁶⌋
    * tokens, rate_ppm_s = min(e_s, ⌊take_s·10⁶/tok_s⌋) — a rate above
    * 10⁶ means "every doc ⌊rate/10⁶⌋ times plus a hash-Bernoulli
    * fractional copy", which is precisely [[replicate]]'s weight
    * contract, so the plan feeds replicate unchanged
    * ([[mixtureSampleEpochs]]). DECIMAL(38,0) intermediates: tok·e
    * reaches ~10²⁰ at 100 TB-scale token counts, past BIGINT. */
  def mixturePlanEpochsFromSupplies(supplies: DataFrame,
      targetPpm: Map[String, Long], capE6: Map[String, Long],
      defaultCapE6: Long = 1000000L): DataFrame = {
    require(targetPpm.nonEmpty, "mixturePlanEpochs: empty target")
    require(targetPpm.values.forall(_ > 0),
      "mixturePlanEpochs: every target weight must be > 0 ppm")
    require(targetPpm.values.sum == 1000000L,
      s"mixturePlanEpochs: target weights sum to ${targetPpm.values.sum}, want 1000000")
    require(defaultCapE6 > 0, s"defaultCapE6=$defaultCapE6")
    require(capE6.values.forall(_ > 0),
      "mixturePlanEpochs: caps must be > 0 epochs-E6; drop a source via targetPpm, not a zero cap")
    val counts = supplies
      .withColumn("__w", targetPpm.foldLeft(lit(0L)) {
        case (acc, (s, w)) =>
          when(col("source") === lit(s), lit(w)).otherwise(acc)
      })
      .withColumn("__e", capE6.foldLeft(lit(defaultCapE6)) {
        case (acc, (s, e)) =>
          when(col("source") === lit(s), lit(e)).otherwise(acc)
      })
    // Same caller-error guard as the cap-free plan: a targeted source
    // with zero supply cannot satisfy any positive share at ANY epoch
    // cap (0 tokens repeated is still 0).
    val present = counts.where(col("__w") > 0 && col("tokens_total") > 0)
      .select(col("source")).collect().map(_.getString(0)).toSet
    val missing = targetPpm.keySet -- present
    require(missing.isEmpty,
      s"mixturePlanEpochs: targeted sources with no token supply in the corpus: " +
        missing.toSeq.sorted.mkString(", "))
    val tRow = counts.where(col("__w") > 0)
      .select(min(expr(
        "CAST(floor(CAST(tokens_total AS DECIMAL(38,0)) * __e / __w)" +
          " AS DECIMAL(38,0))")).as("__T"))
    counts.crossJoin(broadcast(tRow))
      .select(col("source"), col("n_docs"), col("tokens_total"),
        when(col("__w") === 0L || col("tokens_total") === 0L, lit(0L))
          .otherwise(least(col("__e"),
            expr("CAST(floor(floor(CAST(__w AS DECIMAL(38,0)) * __T " +
              "/ 1000000) * 1000000 / tokens_total) AS BIGINT)")))
          .as("rate_ppm"))
  }

  /** One-pass form of [[mixturePlanEpochsFromSupplies]]. */
  def mixturePlanEpochs(df: DataFrame, source: Column, tokens: Column,
      targetPpm: Map[String, Long], capE6: Map[String, Long],
      defaultCapE6: Long = 1000000L): DataFrame =
    mixturePlanEpochsFromSupplies(mixtureSupplies(df, source, tokens),
      targetPpm, capE6, defaultCapE6)

  /** Realize the epoch-capped mixture: broadcast-join the (sources-
    * sized) plan, then [[replicate]] each row at its source's rate —
    * whole copies ⌊rate/10⁶⌋ plus a hash-Bernoulli fractional copy, so
    * upsampled sources repeat and downsampled sources thin, in one
    * aggregate pass plus one narrow explode. No shuffle of data rows;
    * the copy multiset is deterministic in (key, seed) and
    * engine-replayable. `outCol` numbers copies 1..k as in replicate. */
  def mixtureSampleEpochs(df: DataFrame, source: Column, key: Column,
      tokens: Column, targetPpm: Map[String, Long],
      capE6: Map[String, Long], seed: Long = 0L,
      defaultCapE6: Long = 1000000L,
      outCol: String = "copy_id"): DataFrame = {
    require(!df.columns.exists(c => c == "__rate_ppm" || c == "__src"),
      "mixtureSampleEpochs: input already has a scratch column name; rename it")
    val plan = mixturePlanEpochs(df, source, tokens, targetPpm, capE6,
        defaultCapE6)
      .select(col("source").as("__src"), col("rate_ppm").as("__rate_ppm"))
    replicate(df.join(broadcast(plan), source === col("__src")),
        col("__rate_ppm"), key, seed, outCol)
      .drop("__src", "__rate_ppm")
  }

  /** Mixture re-weighting by row replication — "2.3 epochs of wiki,
    * 0.4 of crawl": each row appears ⌊w⌋ + Bernoulli(frac(w)) times,
    * with `weightE6` the weight in MILLIONTHS as an integer column
    * (float weights don't replay) and the Bernoulli drawn from the same
    * ANSI-replayable multiplicative hash as [[hashSample]] — so the
    * exact copy multiset is reproducible across engines, runs, and
    * partitionings. Weights under 1 downsample (k = 0 rows drop);
    * `outCol` numbers the copies 1..k so downstream exact dedup can
    * still distinguish replication from accidental duplication.
    *
    * Plan: a narrow filter + explode(sequence) — no shuffle; output
    * size is Σ k(row), exactly the mixture the weights prescribe.
    * (Uniformity note: folding the [0,M) hash into [0,10⁶) buckets
    * carries a ≤ M%10⁶/M ≈ 0.05% relative bias — irrelevant next to
    * the sampling variance, and deterministic.) */
  def replicate(df: DataFrame, weightE6: Column, key: Column,
      seed: Long = 0L, outCol: String = "copy_id"): DataFrame = {
    require(!df.columns.exists(_.equalsIgnoreCase(outCol)),
      s"input already has a column named '$outCol'; pass outCol to rename")
    val whole = floor(weightE6 / lit(1000000L)).cast("long")
    val frac = pmod(weightE6, lit(1000000L))
    val k = whole +
      when(pmod(bucketOf(key, seed), lit(1000000L)) < frac, 1L).otherwise(0L)
    df.withColumn("__k", k)
      .where(col("__k") >= 1L)
      .withColumn(outCol, explode(sequence(lit(1L), col("__k"))))
      .drop("__k")
  }

  /** Deterministic k-fold assignment: fold i ∈ [0, k) from the same
    * multiplicative hash as [[trainTestSplit]], keyed by `groupKey` so
    * rows sharing a group (dedup cluster, document fingerprint) land in
    * the SAME fold — the leakage discipline of trainTestSplit, for
    * cross-validation. (The [0,M) hash folds into k buckets with a
    * ≤ k/M relative bias — deterministic and negligible.) */
  def kFold(df: DataFrame, groupKey: Column, k: Int,
      seed: Long = 0L, outCol: String = "fold"): DataFrame = {
    require(k >= 2, s"k=$k")
    require(!df.columns.exists(_.equalsIgnoreCase(outCol)),
      s"input already has a column named '$outCol'; pass outCol to rename")
    df.withColumn(outCol, pmod(bucketOf(groupKey, seed), lit(k.toLong)))
  }

  /** Label every row `train` or `test` by the hash of `groupKey` — all
    * rows sharing a group land in the SAME split. Key the group by a
    * dedup cluster id / document fingerprint and near-duplicates can
    * never straddle the boundary (the train→test leakage that inflates
    * eval numbers). A plain row-id key degrades to an ordinary split.
    *
    * The label lands in `outCol` (default "split"); an input that already
    * has that column is rejected rather than silently overwritten. */
  def trainTestSplit(df: DataFrame, groupKey: Column, testFraction: Double,
      seed: Long = 0L, outCol: String = "split"): DataFrame = {
    require(!df.columns.exists(_.equalsIgnoreCase(outCol)),
      s"input already has a column named '$outCol'; pass outCol to rename the split label")
    df.withColumn(outCol,
      when(bucketOf(groupKey, seed) < lit(threshold(testFraction)), lit("test"))
        .otherwise(lit("train")))
  }
}
