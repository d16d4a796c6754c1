package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Approximate sketches as first-class operators (SURVEY §8 backlog).
  * At 100 TB exact DISTINCT/percentile answers force full shuffles of the
  * key space; sketches cap the state at kilobytes per group AND — the real
  * scale win — are MERGEABLE: pre-aggregate per partition/day/hour once,
  * then answer any rollup by unioning sketch state without rescanning
  * source data. All three families below ride Spark's built-in codegen'd
  * sketch aggregates (Apache DataSketches HLL, space-saving KLL-style
  * percentile digest, CountMinSketch).
  *
  * Reference scope note: the reference (297-LoC ETL tool) has no
  * aggregate surface of its own — these extend the inherited relational
  * surface per the north-star extension mandate.
  *
  * Takedown (right-to-be-forgotten) note: sketch states are mergeable
  * but NOT subtractive — an HLL/KLL/CMS cannot forget an element, so
  * the unlearning story the additive families have
  * ([[TextAnalysis.knRemove]]/[[TextAnalysis.nbRemove]], the
  * marker-based index deletes) does not apply here. A persisted sketch
  * over a corpus that lost documents is REBUILT from the (already
  * takedown'd) base table; at 100 TB, bound that rebuild by persisting
  * sketches per partition/day/window — exactly the mergeable layout
  * above — and re-sketching only the windows that lost rows, merging
  * the rest untouched.
  */
object Sketches {

  /** Per-group HLL sketch of `key`'s distinct count. lgConfigK=12 ⇒
    * 4096-bucket sketch, ~2.5 KB serialized, relative standard error
    * ≈ 1.04/√4096 ≈ 1.6% — so ±5% is a ≥3σ bound. The aggregation is
    * partial+final like any hash aggregate: each map task sketches its
    * partition, the exchange carries sketch bytes (KBs), never keys.
    */
  def distinctSketches(df: DataFrame, groups: Seq[Column], key: Column,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(groups: _*)
      .agg(hll_sketch_agg(key, lit(lgConfigK)).as("nd_sketch"))

  /** Roll sketches up to a coarser grouping WITHOUT touching source rows:
    * HLL union is lossless re-aggregation (union of sketch registers), so
    * estimate(merge(hourly)) is the same state as sketching the group
    * directly. This is the pattern that answers "distinct users per
    * <any rollup>" from per-hour sketch tables at 100 TB. */
  def mergeSketches(df: DataFrame, groups: Seq[Column],
      sketch: Column = col("nd_sketch")): DataFrame =
    df.groupBy(groups: _*)
      .agg(hll_union_agg(sketch, lit(false)).as("nd_sketch"))

  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Takedown for the NON-subtractive sketch layout (the class-doc
    * note made operational): an HLL cannot forget an element, so a
    * persisted per-(group, window) sketch table absorbs a removal by
    * rebuilding ONLY the windows that lost rows — `affected` keys'
    * sketches are re-derived from the remaining base rows (a semi-join-
    * restricted scan, never the whole base), every other window's
    * bytes ride through untouched. Because HLL state is a pure
    * function of its input SET, the result merges and estimates
    * IDENTICALLY to a fresh windowed build over the remaining corpus
    * (the k6 gate pins estimate equality, not just the error bound).
    * `keys` name the group+window columns shared by all three
    * relations; `affected` is typically `removedRows.select(keys).
    * distinct()`. */
  def refreshWindows(windowed: DataFrame, remainingBase: DataFrame,
      affected: DataFrame, keys: Seq[String], key: Column,
      lgConfigK: Int = 12): DataFrame = {
    val cols = keys.map(col) :+ col("nd_sketch")
    val kept = windowed.join(affected, keys, "left_anti")
    val re = distinctSketches(
      remainingBase.join(affected, keys, "left_semi"),
      keys.map(col), key, lgConfigK)
    kept.select(cols: _*).unionByName(re.select(cols: _*))
  }

  /** Approximate quantiles of `value` at `probabilities`: one output row
    * per probability, `(p, approx_value)`. `accuracy` bounds the RANK
    * error at 1/accuracy of the row count (Spark's percentile digest
    * guarantee) — the returned value's rank is within N/accuracy of p·N.
    */
  def approxQuantiles(df: DataFrame, value: Column, probabilities: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val pArr = array(probabilities.map(lit(_)): _*)
    df.agg(percentile_approx(value, pArr, lit(accuracy)).as("qs"))
      .select(explode(arrays_zip(pArr.as("p"), col("qs").as("q"))).as("z"))
      .select(col("z.p").as("p"), col("z.q").as("approx_value"))
  }

  /** Approximate top-k heavy hitters via Spark's DataSketches
    * frequent-items aggregate — the CANDIDATE DISCOVERY stage whose
    * absence [[cmsEstimates]] documents (it scores a given candidate
    * set; this finds one). One aggregation pass: each task sketches its
    * partition, the exchange carries sketch state, the merged sketch
    * yields the top items. When the column's distinct count stays within
    * `maxItemsTracked` the sketch never evicts and counts are EXACT
    * (the k4 gate exploits this); past it, counts carry the standard
    * frequent-items over/under bounds but true heavy hitters are never
    * lost. Output: (item, n) re-sorted (n desc, item) so tie order is
    * deterministic regardless of sketch-internal ordering. */
  def approxTopK(df: DataFrame, key: String, k: Int,
      maxItemsTracked: Int = 10000): DataFrame =
    df.agg(expr(s"approx_top_k(`$key`, $k, $maxItemsTracked)").as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("n"))
      .orderBy(col("n").desc, col("item").asc)

  /** CountMinSketch estimator whose deserialized sketch is built lazily
    * once per closure instance (NOT per row — the readFrom cost is paid
    * at most once per task). */
  private final class CmsEstimator(bytes: Array[Byte]) extends Serializable {
    @transient private lazy val cms =
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    def estimate(k: String): Long = cms.estimateCount(k)
  }

  /** Frequency estimates for a small candidate/heavy-hitter relation
    * against a CountMinSketch of `df`'s `key` column. `candidateKey`
    * names the candidates' string key column (default `col("key")`).
    * CMS guarantees estimate ≥ true count, and
    * estimate ≤ true + eps·N with probability `confidence`. The sketch
    * aggregates distributively to ONE small binary (width ⌈e/eps⌉ ×
    * depth ⌈ln(1/(1−confidence))⌉ longs); candidates are then scored by
    * a udf that shares the deserialized sketch per task. A null candidate
    * key estimates to null (CMS sketches non-null keys only). Candidate
    * discovery at scale should itself be approximate (e.g. per-partition
    * top-k union) — this scores a given candidate set, it does not scan
    * for one. */
  def cmsEstimates(df: DataFrame, key: Column, candidates: DataFrame,
      candidateKey: Column = col("key"), eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val bytes = df
      .agg(count_min_sketch(key, lit(eps), lit(confidence), lit(seed)).as("s"))
      .head.getAs[Array[Byte]]("s")
    val est = new CmsEstimator(bytes)
    val estimateUdf = udf((k: String) => Option(k).map(est.estimate))
    candidates.withColumn("approx_count", estimateUdf(candidateKey))
  }

  /** Distinct-set INTERSECTION estimate by inclusion-exclusion over HLL
    * sketches: |A∩B| ≈ est(A) + est(B) − est(A∪B), where the union
    * sketch is the lossless register union — the audience-overlap /
    * retargeting-reach query answered without ever co-shuffling the two
    * key sets. One row out: est_a, est_b, est_union, est_intersection.
    *
    * Each side is one sketch aggregation (KB exchange); the final
    * combine is a 1×1 crossJoin. Error compounds across the three
    * estimates, so the practical bound is ~3× a single sketch's σ
    * RELATIVE TO THE UNION size — small intersections of huge sets need
    * a bigger lgConfigK or an exact semi-join instead (documented
    * trade; inclusion-exclusion is the right tool when the overlap is a
    * material fraction of the union). */
  def distinctIntersection(
      dfA: DataFrame, keyA: Column, dfB: DataFrame, keyB: Column,
      lgConfigK: Int = 12): DataFrame = {
    val a = dfA.agg(hll_sketch_agg(keyA, lit(lgConfigK)).as("__sa"))
    val b = dfB.agg(hll_sketch_agg(keyB, lit(lgConfigK)).as("__sb"))
    a.crossJoin(b).select(
      hll_sketch_estimate(col("__sa")).as("est_a"),
      hll_sketch_estimate(col("__sb")).as("est_b"),
      hll_sketch_estimate(hll_union(col("__sa"), col("__sb")))
        .as("est_union"))
      .withColumn("est_intersection",
        col("est_a") + col("est_b") - col("est_union"))
  }
}
