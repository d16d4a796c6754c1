package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the canonical pipeline a
  * 100 TB pretraining run executes, composed from the individually
  * gate-proven stages:
  *
  *   1. quality filter ([[TextAnalysis.gopherQuality]] — narrow
  *      projection, junk never reaches the signature passes);
  *   2. exact dedup (min-id representative per text — one partial-agg
  *      shuffle of (text → min id), semi-join back);
  *   2b. OPTIONAL fuzzy near-dup ([[Dedup.minHashPairs]] LSH pairs →
  *      [[Dedup.dropFromPairsTransitive]] min-id component keep) —
  *      real pretraining curation runs MinHash in the chain, not just
  *      exact; off by default for the cheap-pipeline caller;
  *   3. benchmark decontamination ([[Decontam.clean]] — anti-join on
  *      the gram-hit relation, corpus side never shuffles in the
  *      common broadcast case);
  *   4. temperature-scaled language mixing
  *      ([[Sampling.temperatureSample]] — |domains|-row rate table
  *      broadcast onto a narrow filter);
  *   5. token-balanced shard assignment ([[Packing.shardByTokens]] —
  *      two-phase distributed prefix sum).
  *
  * Stage order matters at scale: the cheap narrow stages (1) run
  * first so every shuffle-bearing stage (2, 2b, 5) sees the smallest
  * possible corpus; near-dup (2b) runs after exact dedup so identical
  * copies never reach the signature pass; mixing (4) runs AFTER
  * decontamination so the per-language rates reflect the corpus that
  * actually ships.
  *
  * Every stage is deterministic (content hashes, not RNG), so the
  * whole pipeline is replayable end to end — the p1 gate's oracle
  * re-derives the full chain in SQL and hash-matches the result.
  */
object Curation {

  /** Runs the five-stage pipeline; returns one row per surviving
    * document: (id, lang, n_tokens, shard_id). Zero-token survivors
    * (none, once quality filtering requires minWords ≥ 1) would be
    * dropped by the sharding stage like empty docs in packing. */
  def curate(docs: DataFrame, text: String, id: String, lang: Column,
      benchmark: DataFrame, benchText: String,
      minWords: Long = 50L, minStopHits: Long = 2L,
      alpha: Double = 0.5, shardTokens: Long = 2048L,
      gramN: Int = 8, seed: Long = 0L,
      nearDup: Option[Dedup.MinHashConfig] = None): DataFrame = {
    // 1. quality — keep rows whose metrics clear the (parametrized)
    // Gopher rules, as an INLINE narrow filter (the [[curateStream]]
    // shape): the previous gopherQuality + id-semi-join formulation
    // cost two exchanges AND evaluated the metric expressions twice
    // per document (once in each join subtree). With unique ids —
    // every caller's contract, and what the gates' oracles replay —
    // the per-row verdict is the same relation. r17 measurement: each
    // exchange is an AQE stage-job plus a 50-150 ms driver gap, and
    // the composed pipelines are gap-bound, so exchange count is the
    // cost that matters here (guide §2.4).
    val metrics = TextAnalysis.gopherMetricCols(col(text))
    metrics.map(_._1).foreach(n =>
      require(!docs.columns.exists(_.equalsIgnoreCase(n)),
        s"curate: input already has a column named '$n'"))
    val flagged = metrics.foldLeft(docs) {
      case (df, (n, c)) => df.withColumn(n, c)
    }
    val afterQuality = flagged
      .where(TextAnalysis.gopherVerdict(minWords, 100000L, minStopHits))
      .drop(metrics.map(_._1): _*)

    // 2. exact dedup — first-seen (min id) representative per text, as
    // ONE partial-aggregated exchange: min over a struct whose first
    // field is the id picks the min-id row whole (ids are unique, so
    // the comparison never reaches the other fields), replacing the
    // old groupBy(text).agg(min(id)) + id-semi-join — three exchanges
    // and a second evaluation of the upstream — with a single shuffle
    // keyed on text. Partial aggregation still collapses a
    // byte-identical flood map-side (the skew-ladder property the
    // semi-join form had).
    // Materialize the filter+dedup front half ONCE: the stages below
    // each reference their input from two plan subtrees (decontam =
    // grams + anti-join, mixing = counts + filter, sharding = totals +
    // window), and Catalyst does not reuse a common scan across
    // subtrees — without the cut, the whole upstream chain re-executes
    // ~4x (measured 11.3 s -> the checkpointed plan at sf0.1).
    // The cut goes through Scale.cut: a RELIABLE checkpoint to the
    // configured dir when one is set (cluster deployments), else a
    // disk-backed localCheckpoint — the same tactic Graphs.pageRank
    // uses per iteration.
    val others = docs.columns.filterNot(c => c == id || c == text)
    val afterDedup = afterQuality
      .groupBy(col(text))
      .agg(min(struct((col(id) +: others.map(col)): _*)).as("__rep"))
      .select(docs.columns.map {
        case c if c == text => col(text)
        case c => col("__rep").getField(c).as(c)
      }: _*)
      .transform(Scale.cut)

    // 2b. optional fuzzy near-dup: MinHash LSH pairs over the
    // exact-deduped survivors, transitive min-id component keep. The
    // checkpointed afterDedup feeds both the signature pass and the
    // anti-join input, so the front half still executes once; the
    // result is checkpointed again because decontamination references
    // IT from two subtrees (grams + anti-join).
    val afterNearDup = nearDup match {
      case None => afterDedup
      case Some(conf) =>
        val pairs = Dedup.minHashPairs(afterDedup, text, id, conf)
        Dedup.dropFromPairsTransitive(afterDedup, id, pairs)
          .transform(Scale.cut)
    }

    // 3. decontamination — drop documents sharing an n-gram with the
    // benchmark, via the join-free [[Decontam.cleanInline]] probe (the
    // st12 machinery, result-identical to [[Decontam.clean]] per its
    // spec): the exploded-gram + anti-join form cost a corpus gram
    // explosion and two more exchanges; the inline form is one
    // stateless narrow filter, at the price of collecting the
    // BENCHMARK gram set once (bounded by the eval-sets-are-MBs
    // premise the operator already rests on).
    val afterDecontam =
      Decontam.cleanInline(afterNearDup, text, id, benchmark, benchText, gramN)

    // 4. temperature-scaled mixing over the surviving distribution;
    // checkpoint again so sharding's two passes replay cached blocks,
    // not the decontam join.
    val sampled = Sampling.temperatureSample(
      afterDecontam, lang, col(id), alpha = alpha, seed = seed)
      .transform(Scale.cut)

    // 5. shard assignment in deterministic id order; lang rides the
    // prefix-sum shuffle as a carry column (no corpus-sized join).
    val langName = sampled.select(lang).columns.head
    Packing.shardByTokens(sampled, id,
        TextAnalysis.tokenCount(col(text)), shardTokens,
        carry = Seq(langName))
      .select(col(id), col(langName).as("lang"), col("n_tokens"),
        col("shard_id"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., LREC 2020): score
    * every document against a reference LM and split each language's
    * corpus into `nBuckets` equal-population quality tiers (CCNet's
    * head/middle/tail at the default 3) — the data-selection step that
    * follows dedup in the CCNet chain, where downstream training keeps
    * head+middle or reweights by tier.
    *
    * Scoring is the exact-integer Kneser–Ney trigram model
    * ([[TextAnalysis.knScoreModel]] — e12 fixed-point, replayable), so
    * the tier assignment is hash-gateable: tiers come from ntile over
    * the TOTAL order (score_e12 desc, id) within each language — ANSI
    * ntile on a total order is engine-independent (earlier tiles take
    * the remainder rows, the standard definition both Spark and the
    * oracle implement).
    *
    * Scale shape: one corpus pass to explode trigrams + the model joins
    * (model-sized sides), then the tier assignment via
    * [[Packing.groupRank]]'s two-phase DISTRIBUTED rank + the exact
    * ANSI-ntile reconstruction ([[Packing.ntileFromRank]]). The naive
    * `ntile().over(Window.partitionBy(lang))` form is a scale-killer:
    * a window's required clustering puts EVERY row of a language into
    * one task and AQE cannot split a window partition, so a corpus
    * that is 40% one language (this test corpus is 41% `en`; a real
    * crawl is worse) sorts 40% of itself on one core. The distributed
    * rank bounds the max task at one range partition whatever the
    * language mix, and — because rank and tile are pure functions of
    * the total (score_e12 desc, id) order within a language — replays
    * bit-identically against the single-node ANSI ntile oracle. There
    * is no all-corpus collect anywhere (the rank's driver phase is
    * per-(partition, language) COUNTS — metadata). Documents with
    * fewer than 3 tokens have no trigrams, hence no score, and are
    * dropped (they belong to a length filter, not a perplexity tier).
    *
    * Output: (id, lang, score_e12, bucket) with bucket 1 = best
    * (highest model probability = CCNet's "head"). */
  def perplexityBuckets(docs: DataFrame, text: String, id: String,
      lang: Column, triModel: DataFrame, nBuckets: Int = 3,
      minCount: Long = 1L): DataFrame = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets")
    val scores = TextAnalysis.knScoreModel(docs, text, id, triModel,
      minCount = minCount)
    val scored = docs.select(col(id), lang.as("lang"))
      .join(scores.select(col(id), col("score_e12")), Seq(id))
    Packing.groupRank(scored, Seq("lang"),
        Seq(col("score_e12").desc, col(id)))
      .withColumn("bucket",
        Packing.ntileFromRank(col("gr_rank"), col("gr_n"), nBuckets)
          .cast("long"))
      .select(col(id), col("lang"), col("score_e12"), col("bucket"))
  }

  /** Curriculum sharding — the training-order counterpart of
    * [[perplexityBuckets]]: tier the corpus by LM quality, then cut
    * token-balanced shards in CURRICULUM order (best tier first, best
    * score first inside a tier, id tiebreak), so shard 0..k stream the
    * cleanest data and a curriculum schedule is just "read shards in
    * order". Composes the tiers with [[Packing.shardByTokens]]'s
    * two-phase distributed prefix sum over a synthetic sort key
    * (bucket, −score, id) — a struct rides the SAME range-partitioned
    * sort machinery a plain id does, so there is still no global
    * single-partition sort and no collect. Docs without a score (fewer
    * than 3 tokens) drop, as in [[perplexityBuckets]].
    *
    * Output: (id, lang, bucket, n_tokens, shard_id). */
  def curriculumShards(docs: DataFrame, text: String, id: String,
      lang: Column, triModel: DataFrame, shardTokens: Long,
      nBuckets: Int = 3, minCount: Long = 1L): DataFrame = {
    val tiers = perplexityBuckets(docs, text, id, lang, triModel,
      nBuckets, minCount)
    val keyed = tiers.join(docs.select(col(id), col(text)), Seq(id))
      .withColumn("__curr_key",
        struct(col("bucket"), (-col("score_e12")).as("neg_score"), col(id)))
    Packing.shardByTokens(keyed, "__curr_key",
        TextAnalysis.tokenCount(col(text)), shardTokens,
        carry = Seq(id, "lang", "bucket"))
      .select(col(id), col("lang"), col("bucket"), col("n_tokens"),
        col("shard_id"))
  }

  /** Classifier-routed data mixing — classify every document with the
    * Naive-Bayes unigram classifier ([[TextAnalysis.nbClassify]],
    * trained on `label`), then derive the token-budget mixture plan
    * ([[Sampling.mixturePlan]]) over the PREDICTED classes: the
    * crawl-curation pattern where domain labels exist only for a seed
    * corpus and the mixing decision must route by the model's output,
    * not by trusted metadata.
    *
    * Everything composes existing exact-integer stages, so the result
    * hash-gates end to end (p6): NB scores are e9 fixed-point with the
    * pinned (score desc, label asc) argmax, the mixture plan is exact
    * ppm arithmetic. Scale shape: classification is the t29 plan
    * (broadcast-or-shuffle model join, auto placement), the plan
    * derivation is one classes-sized aggregate — nothing new shuffles.
    *
    * Output: one row per predicted class,
    * (source, n_docs, tokens_total, rate_ppm). */
  /** Rank-normalized blending of quality signals — the multi-signal
    * ensembling modern curation uses (a corpus kept by the agreement
    * of several classifiers/heuristics beats any single signal; the
    * DataComp/Nemotron-CC recipe): each signal is rank-normalized to
    * [0, 10⁶] ppm and the blend is the exact integer weighted mean,
    * so signals with arbitrary scales (a perplexity, a classifier
    * logit, a length) become commensurable and the blend is invariant
    * to any monotone rescaling of an input signal. Ranks come from
    * [[Packing.groupRank]] over one whole-table group — the two-phase
    * distributed form, no single-task global sort however large the
    * corpus; one narrow range exchange per signal. Ties break by id
    * (deterministic, engine-replayable).
    *
    * The per-signal ranks ACCUMULATE as columns on one frame — there
    * is no id-keyed join of per-signal rank frames, so a duplicated id
    * cannot cross-multiply (N^signals rows per dup) or pair arbitrary
    * norm combinations: every INPUT ROW gets exactly one blend, ranked
    * on its own signal values. (Rows sharing (signal, id) still tie —
    * keep ids unique if per-id determinism matters.)
    *
    * Output: (id, blend_ppm) with blend_ppm in [0, 10⁶]. */
  def blendScores(df: DataFrame, id: String,
      signals: Seq[(Column, Long)]): DataFrame = {
    require(signals.nonEmpty, "blendScores: need at least one signal")
    require(signals.forall(_._2 > 0), "blendScores: weights must be > 0")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    def idiv(a: Column, b: Column): Column = column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        expression(a), expression(b)))
    // rank on the RAW signal (casting a fractional score to long
    // before ranking would collapse its order into giant ties)
    val base = df.select(col(id) +:
      signals.zipWithIndex.map { case ((sig, _), i) => sig.as(s"__s$i") }: _*)
      .withColumn("__g", lit(1))
    val ranked = signals.indices.foldLeft(base) { (cur, i) =>
      Packing.groupRank(cur, Seq("__g"), Seq(col(s"__s$i"), col(id)))
        .withColumn(s"__n$i",
          idiv((col("gr_rank") - 1L) * lit(1000000L),
            greatest(col("gr_n") - 1L, lit(1L))))
        .drop("gr_rank", "gr_n", s"__s$i")
    }
    val w = signals.map(_._2)
    val weighted = signals.indices
      .map(i => col(s"__n$i") * lit(w(i)))
      .reduce(_ + _)
    ranked.select(col(id),
      idiv(weighted, lit(w.sum)).as("blend_ppm"))
  }

  def classifiedMixture(docs: DataFrame, text: String, id: String,
      label: String, tokens: Column,
      targetPpm: Map[String, Long]): DataFrame = {
    val (tok, cls) = TextAnalysis.nbCounts(docs, text, label)
    val preds = TextAnalysis.nbClassify(docs, text, id, tok, cls)
      .select(col(id), col("pred"))
    Sampling.mixturePlan(
      docs.select(col(id), tokens.as("__tok")).join(preds, Seq(id)),
      col("pred"), col("__tok"), targetPpm)
  }

  /** Curate-at-INGEST: the pipeline's front half (quality filter →
    * exact dedup → decontamination) as a single STREAMING transform —
    * the reference's poll-a-folder ingest loop, made continuous, that
    * admits only clean novel documents:
    *
    *   - quality: the Gopher metrics ride inline as a stateless narrow
    *     projection (computed, tested, dropped — nothing buffered);
    *   - dedup: `dropDuplicates` on the content fingerprint — the
    *     state store holds one 8-byte key per distinct document ever
    *     seen, so re-deliveries (the same file polled twice, a
    *     replayed batch) drop exactly once-and-for-all. Note this
    *     keeps the FIRST-ARRIVED copy: identical re-deliveries are
    *     indistinguishable, but two different ids with equal text keep
    *     whichever arrived first (batch [[curate]] keeps min id);
    *   - decontamination: [[Decontam.cleanInline]]'s join-free
    *     codegen'd gram probe (the st12 machinery) — stateless.
    *
    * Works unchanged on a batch frame (the spec pins stream ≡ batch).
    * Mixing and sharding remain batch stages: both are functions of
    * the final corpus distribution, which an unbounded stream does not
    * have yet. */
  def curateStream(src: DataFrame, text: String, id: String,
      benchmark: DataFrame, benchText: String,
      minWords: Long = 50L, minStopHits: Long = 2L,
      gramN: Int = 8): DataFrame = {
    val metrics = TextAnalysis.gopherMetricCols(col(text))
    (metrics.map(_._1) :+ "__fp").foreach(n =>
      require(!src.columns.exists(_.equalsIgnoreCase(n)),
        s"curateStream: input already has a column named '$n'"))
    val flagged = metrics.foldLeft(src) {
      case (df, (n, c)) => df.withColumn(n, c)
    }
    val quality = flagged
      .where(TextAnalysis.gopherVerdict(minWords, 100000L, minStopHits))
      .drop(metrics.map(_._1): _*)
    val deduped = quality
      .withColumn("__fp",
        graft.functions.GraftFunctions.fingerprint(col(text)))
      .dropDuplicates("__fp")
      .drop("__fp")
    Decontam.cleanInline(deduped, text, id, benchmark, benchText, gramN)
  }

  /** Corpus data card — the one-row summary a curation run publishes
    * with its output (the "datasheet" numbers: volume, language
    * spread, duplication, contamination, quality yield). Exact
    * integers end to end, so the card is itself gate-verifiable.
    *
    * Scale shape: one linear corpus pass for the token/dup aggregates
    * (two-level: per-text groups then totals), one pass for quality
    * metrics, and the decontamination hit relation — each a standard
    * partial-agg shuffle; nothing is collected but the single result
    * row. */
  def dataCard(docs: DataFrame, text: String, id: String, lang: Column,
      benchmark: DataFrame, benchText: String,
      minWords: Long = 50L, minStopHits: Long = 2L,
      gramN: Int = 8): DataFrame = {
    val base = docs.select(col(id), col(text),
      lang.as("__lang"),
      TextAnalysis.tokenCount(col(text)).as("__toks"))
    // Per-text groups: exact-duplicate accounting.
    val groups = base.groupBy(col(text))
      .agg(count(lit(1)).as("__n"), sum(col("__toks")).as("__gtoks"))
    val dupStats = groups.agg(
      count(lit(1)).as("n_distinct_texts"),
      sum(col("__n")).as("n_docs"),
      sum(col("__gtoks")).as("n_tokens"),
      sum(when(col("__n") > 1, col("__n") - 1).otherwise(0L))
        .as("n_exact_dup_docs"))
    val langStats = base.agg(
      count_distinct(col("__lang")).as("n_langs"))
    val qualityStats = TextAnalysis
      .gopherQuality(docs, text, id, minWords = minWords,
        minStopHits = minStopHits)
      .agg(sum(when(col("is_quality"), 1L).otherwise(0L))
        .as("n_quality_docs"))
    val contamStats = Decontam
      .flag(docs, text, id, benchmark, benchText, gramN)
      .agg(sum(when(col("contaminated"), 1L).otherwise(0L))
        .as("n_contaminated_docs"))
    dupStats.crossJoin(broadcast(langStats))
      .crossJoin(broadcast(qualityStats))
      .crossJoin(broadcast(contamStats))
      .select(col("n_docs"), col("n_distinct_texts"),
        col("n_exact_dup_docs"), col("n_tokens"), col("n_langs"),
        col("n_quality_docs"), col("n_contaminated_docs"))
  }

  /** Training-READINESS card — the go/no-go row a lab reads before
    * committing a training run, folding the measurement family the
    * plain [[dataCard]] predates into one exact-integer summary:
    *
    *  - contamination: the [[Decontam.contaminationReport]] relation →
    *    eval-set count, sets with any hits, worst per-set ppm;
    *  - tokenizer fit: the [[TextAnalysis.tokenizerFertility]] relation
    *    → language count, worst (highest) fertility ppm — the stratum
    *    the tokenizer serves worst;
    *  - quality-classifier health: the
    *    [[TextAnalysis.classifierReport]] relation → minimum per-class
    *    F1 ppm — the class the router is least trustworthy on;
    *  - retrieval-index health: a [[Similarity.recallReport]]-shaped
    *    relation → exact mean and minimum recall ppm across queries
    *    (and tiers, if several are stacked).
    *
    * Each input is the ALREADY-GATED report of its family (d21 / t46 /
    * t48 / s18 shapes), so the card inherits their provenance; the
    * composition itself is four report-sized aggregates broadcast-
    * crossed into one row — nothing corpus-sized moves. Empty inputs
    * summarize to 0, not null (the total-report contract). */
  def readinessCard(contamination: DataFrame, fertility: DataFrame,
      classifier: DataFrame, recall: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    def idiv(a: Column, b: Column): Column = column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        expression(a), expression(b)))
    def z(c: Column): Column = coalesce(c, lit(0L))
    val c = contamination.agg(
      count(lit(1)).as("n_eval_sets"),
      z(sum(when(col("n_docs_hit") > 0, 1L).otherwise(0L)))
        .as("n_contaminated_sets"),
      z(max(col("contaminated_ppm"))).as("worst_contamination_ppm"))
    val f = fertility.agg(
      count(lit(1)).as("n_langs"),
      z(max(col("fertility_ppm"))).as("worst_fertility_ppm"))
    val k = classifier.agg(z(min(col("f1_ppm"))).as("min_class_f1_ppm"))
    val r = recall.agg(
      idiv(z(sum(col("recall_ppm"))),
        greatest(count(lit(1)), lit(1L))).as("mean_recall_ppm"),
      z(min(col("recall_ppm"))).as("min_recall_ppm"))
    c.crossJoin(broadcast(f)).crossJoin(broadcast(k))
      .crossJoin(broadcast(r))
  }

  /** SERVING-readiness card — the [[readinessCard]] pattern applied to
    * the serving/eval side of the pipeline: one row summarizing what a
    * deployment review reads before putting a corpus behind a
    * retriever and a trainer behind batched inference. Inputs are the
    * EXACT relations their own gates pin:
    *
    *  - `retrievalEval`: [[Similarity.evalRetrieval]] rows (s24) →
    *    query count, MAP / mean-recall / MRR in exact ppm (integer-div
    *    means of the per-query ppm floors);
    *  - `minedPairs` + `sources`: [[Similarity.marginMine]] output and
    *    its source relation (s25) → mining yield in ppm of sources;
    *  - `batchReport`: [[Packing.batchReport]]'s one row (pk10) →
    *    batch count and padding waste.
    *
    * All inputs are report-sized; the card is a few one-row aggregates
    * broadcast-crossed, never a corpus pass. */
  def servingCard(retrievalEval: DataFrame, minedPairs: DataFrame,
      sources: DataFrame, batchReport: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    def idiv(a: Column, b: Column): Column = column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        expression(a), expression(b)))
    def z(c: Column): Column = coalesce(c, lit(0L))
    val e = retrievalEval.agg(
      count(lit(1)).as("n_queries"),
      idiv(z(sum(col("ap_ppm"))),
        greatest(count(lit(1)), lit(1L))).as("map_ppm"),
      idiv(z(sum(col("recall_ppm"))),
        greatest(count(lit(1)), lit(1L))).as("mean_recall_ppm"),
      idiv(z(sum(col("rr_ppm"))),
        greatest(count(lit(1)), lit(1L))).as("mrr_ppm"))
    val m = minedPairs.agg(count(lit(1)).as("n_mined_pairs"))
    val src = sources.agg(count(lit(1)).as("__n_src"))
    val b = batchReport.select(col("n_batches"), col("padding_ppm"))
    e.crossJoin(broadcast(m)).crossJoin(broadcast(src))
      .crossJoin(broadcast(b))
      .select(col("n_queries"), col("map_ppm"), col("mean_recall_ppm"),
        col("mrr_ppm"), col("n_mined_pairs"),
        idiv(col("n_mined_pairs") * lit(1000000L),
          greatest(col("__n_src"), lit(1L))).as("bitext_yield_ppm"),
        col("n_batches"), col("padding_ppm"))
  }

  /** Web-crawl curation — the WARC-to-training-shards composition the
    * generic [[curate]] pipeline cannot express, because crawls dedup
    * on IDENTITY (the URL), not content, before any text stage runs:
    *
    *  1. canonical-URL dedup: [[TextAnalysis.urlCanonicalize]] collapses
    *     spelling variants, first-seen (min id) representative kept —
    *     the crawl-frontier "have I fetched this already";
    *  2. per-host cap: keep the `maxPerHost` lowest-id records per host
    *     (deterministic diversity bound — one mega-host cannot dominate
    *     the corpus; the batch analogue of crawl politeness);
    *  3. Gopher quality rules on the page body;
    *  4. token-balanced shard assignment
    *     ([[Packing.shardByTokens]]), host riding as a carry column.
    *
    * Plan: stages 1-2 shuffle on url/host keys, localCheckpoint cuts
    * the front half exactly as [[curate]] does (Catalyst does not reuse
    * a common scan across the later subtrees), sharding is the standard
    * two-phase prefix sum. Every stage is SQL-replayable, so the whole
    * composition gate (`p2`) hash-checks end to end.
    *
    * Input: (id, url, body) — e.g. [[graft.io.Warc.httpParts]] output
    * with the record id parsed from the WARC headers.
    */
  def curateCrawl(records: DataFrame, id: String, urlCol: String,
      bodyCol: String, maxPerHost: Int, minWords: Long = 20L,
      minStopHits: Long = 1L, shardTokens: Long = 2048L): DataFrame =
    crawlStages(records, id, urlCol, bodyCol, maxPerHost, minWords,
      minStopHits, shardTokens)._4
      .select(col(id), col("host"), col("n_tokens"),
        col("start_offset"), col("shard_id"))

  /** The shared [[curateCrawl]] stage chain: (afterUrlDedup, capped,
    * afterQuality, sharded). */
  private def crawlStages(records: DataFrame, id: String, urlCol: String,
      bodyCol: String, maxPerHost: Int, minWords: Long,
      minStopHits: Long, shardTokens: Long)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(maxPerHost >= 1, s"maxPerHost=$maxPerHost")
    val canon = TextAnalysis.urlCanonicalize(records, urlCol)
    // first-seen (min id) representative per canonical URL in ONE
    // partial-aggregated exchange (the [[curate]] exact-dedup shape):
    // min over an id-led struct picks the min-id row whole, replacing
    // the old agg + id-semi-join (three exchanges, upstream evaluated
    // twice)
    val canonCols = canon.columns
    val othersC = canonCols.filterNot(c => c == id || c == "url_canon")
    val afterUrl = canon.groupBy(col("url_canon"))
      .agg(min(struct((col(id) +: othersC.map(col)): _*)).as("__rep"))
      .select(canonCols.map {
        case c if c == "url_canon" => col("url_canon")
        case c => col("__rep").getField(c).as(c)
      }: _*)
      .withColumn("host",
        regexp_extract(col("url_canon"), "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col(id))
    val capped = afterUrl
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxPerHost)
      .drop("__rn")
      .transform(Scale.cut)
    // inline Gopher filter (the [[curate]] quality shape): one narrow
    // filter instead of gopherQuality + id-semi-join
    val qMetrics = TextAnalysis.gopherMetricCols(col(bodyCol))
    qMetrics.map(_._1).foreach(n =>
      require(!capped.columns.exists(_.equalsIgnoreCase(n)),
        s"curateCrawl: input already has a column named '$n'"))
    val afterQ = qMetrics.foldLeft(capped) {
        case (df, (n, c)) => df.withColumn(n, c)
      }
      .where(TextAnalysis.gopherVerdict(minWords, 100000L, minStopHits))
      .drop(qMetrics.map(_._1): _*)
    val sharded = Packing.shardByTokens(afterQ, id,
      TextAnalysis.tokenCount(col(bodyCol)), shardTokens,
      carry = Seq("host"))
    (afterUrl, capped, afterQ, sharded)
  }

  /** Pipeline observability for [[curateCrawl]]: ONE metadata-sized row
    * with exact survivor counts at every stage boundary plus token and
    * shard totals — the funnel a 100 TB curation run reports so an
    * upstream regression (a dedup key change, a quality threshold
    * drift) is visible as a stage-level delta, not a mystery in the
    * final corpus size. Stage frames come from the SAME chain as
    * [[curateCrawl]] (the capped front half is checkpointed once and
    * shared), each reduced to a one-row aggregate and broadcast-crossed
    * — no data row ever reaches the driver. */
  def crawlFunnel(records: DataFrame, id: String, urlCol: String,
      bodyCol: String, maxPerHost: Int, minWords: Long = 20L,
      minStopHits: Long = 1L, shardTokens: Long = 2048L): DataFrame = {
    val (afterUrl, capped, afterQ, sharded) = crawlStages(records, id,
      urlCol, bodyCol, maxPerHost, minWords, minStopHits, shardTokens)
    records.agg(count(lit(1)).as("n_records"))
      .crossJoin(broadcast(
        afterUrl.agg(count(lit(1)).as("n_after_url_dedup"))))
      .crossJoin(broadcast(
        capped.agg(count(lit(1)).as("n_after_host_cap"))))
      .crossJoin(broadcast(
        afterQ.agg(count(lit(1)).as("n_after_quality"))))
      .crossJoin(broadcast(
        sharded.agg(count(lit(1)).as("n_docs_sharded"),
          sum(col("n_tokens")).as("n_tokens_total"),
          (max(col("shard_id")) + 1).as("n_shards"))))
  }
}
