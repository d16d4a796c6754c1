package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document exact substring deduplication: find every maximal run
  * of tokens that also appears in at least `minDocs - 1` OTHER documents,
  * and optionally cut those runs out of the text. This is the
  * "duplicate substring removal" pass of LLM corpus preparation (cf. Lee
  * et al., "Deduplicating Training Data Makes Language Models Better",
  * ACL 2022): document-level dedup (Dedup.*) drops whole near-identical
  * documents, while this operator removes the boilerplate passages,
  * license blocks and quoted chunks that recur INSIDE otherwise-unique
  * documents. The reference tool has no analogue (its validation is
  * row-scalar only); this is a north-star extension operator.
  *
  * Method: slide a token k-gram window over each document (position
  * grid = token index, 1-based). A gram whose text occurs in >= minDocs
  * distinct documents marks tokens [pos, pos+k-1] as duplicated;
  * overlapping marks are merged into maximal spans with a
  * gaps-and-islands window. Removal keeps exactly the unmarked tokens.
  *
  * Scale shape (100 TB audit): everything is count-based — there is NO
  * pair expansion anywhere (a passage shared by 1M documents costs 1M
  * gram rows, never 1M^2 pairs, unlike MinHash bucket verification).
  * The dominant cost is the gram aggregation: one linear shuffle of one
  * row per gram occurrence. With `hashed = true` (the default) the
  * shuffled gram key is an 8-byte xxhash64 fingerprint instead of the
  * k-token string, so the exchange carries ~12 bytes/token regardless
  * of k; the paper's suffix-array formulation avoids the k× blowup
  * entirely but is not expressible as a distributed dataflow without a
  * global sort of the whole corpus. Span merging and removal are
  * per-document windows (partitionBy doc), and the removal join back to
  * the corpus is on doc id against the duplicated-start relation, which
  * is bounded by the duplicated fraction. Unlike the lowercasing gram
  * families (Dedup.ngram*, Decontam), grams here are CASE-SENSITIVE:
  * the operator rebuilds text, so tokens must round-trip verbatim.
  */
object SubstringDedup {

  /** Whitespace tokens of the raw text, empties dropped. Clean text is
    * therefore whitespace-NORMALIZED (single spaces) — documented
    * deviation, same convention as TextAnalysis.chunk. */
  private def toksCol(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** One row per k-gram start: (id, pos, end, gram). pos is the 1-based
    * token index; end = min(pos + k - 1, n_tokens) — a document shorter
    * than k tokens contributes its whole token run as one (clamped)
    * gram, mirroring Decontam.gramsCol. Token array is projected first
    * so the lambda binds an attribute, not a recomputed split. */
  private[ext] def gramStarts(
      df: DataFrame, text: String, id: String, k: Int,
      hashed: Boolean): DataFrame = {
    val ts = col("__ts")
    // The k-gram explosion multiplies rows ~(tokens)x and its cost is
    // CPU, not bytes — fan the narrow input out to the core count
    // (no-op when the scan already has enough splits).
    val grams = Scale.fanOut(df.select(col(id), col(text)))
      .select(col(id), toksCol(col(text)).as("__ts"))
      .select(col(id), explode(transform(
        sequence(lit(0), greatest(size(ts) - k, lit(0))),
        i => struct(
          (i + 1).as("pos"),
          least(i + k, size(ts)).as("end"),
          concat_ws(" ", slice(ts, i + 1, lit(k))).as("gram")))).as("__g"))
    grams.select(
      col(id), col("__g.pos").as("pos"), col("__g.end").as("end"),
      (if (hashed) xxhash64(col("__g.gram")) else col("__g.gram")).as("gram"))
  }

  /** Gram starts that are duplicated across >= minDocs distinct
    * documents: (id, pos, end). Distinct-per-doc projection feeds the
    * per-gram doc count (linear groupBy), then the start grid joins the
    * duplicated gram keys — an equi-join both sides hash on `gram`. */
  private[ext] def dupStarts(
      df: DataFrame, text: String, id: String, k: Int,
      minDocs: Int, hashed: Boolean): DataFrame = {
    val starts = gramStarts(df, text, id, k, hashed)
    val dupGrams = starts.select(col(id), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("gram"))
    starts.join(dupGrams, Seq("gram")).select(col(id), col("pos"), col("end"))
  }

  /** Maximal duplicated token spans per document: (id, span_start,
    * span_end), 1-based inclusive token indexes. Overlapping/adjacent
    * gram marks merge via gaps-and-islands: a start opens a new island
    * iff it begins past the running max end of everything before it. */
  def duplicateSpans(
      df: DataFrame, text: String, id: String, k: Int,
      minDocs: Int = 2, hashed: Boolean = true): DataFrame = {
    val ds = dupStarts(df, text, id, k, minDocs, hashed)
    val w = Window.partitionBy(col(id)).orderBy(col("pos"))
    val prevMaxEnd = max(col("end"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = ds
      .withColumn("__new",
        when(col("pos") <= coalesce(prevMaxEnd, lit(0L)), lit(0)).otherwise(lit(1)))
      .withColumn("__island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy(col(id), col("__island"))
      .agg(min(col("pos")).as("span_start"), max(col("end")).as("span_end"))
      .select(col(id), col("span_start"), col("span_end"))
  }

  /** The corpus with duplicated spans cut out: (id, clean_text), where
    * clean_text is the whitespace-normalized join of the surviving
    * tokens ("" when the whole document was duplicated). Coverage is
    * resolved with the union-and-carry plan (cf. Joins.asofBackward):
    * duplicated-gram markers and token rows interleave on the shared
    * token grid, one running-max window per document tells each token
    * whether any marker still covers it — one shuffle, one sort, zero
    * range joins. */
  def removeDuplicateSpans(
      df: DataFrame, text: String, id: String, k: Int,
      minDocs: Int = 2, hashed: Boolean = true): DataFrame = {
    val markers = dupStarts(df, text, id, k, minDocs, hashed).select(
      col(id), col("pos"),
      lit(null).cast("string").as("__tok"),
      col("end").cast("long").as("__cov"),
      lit(0).as("__istok"))
    val tokens = Scale.fanOut(df.select(col(id), col(text)))
      .select(col(id), posexplode(toksCol(col(text))).as(Seq("__p0", "__tok")))
      .select(col(id), (col("__p0") + 1).as("pos"), col("__tok"),
        lit(null).cast("long").as("__cov"), lit(1).as("__istok"))
    // Marker sorts before the token at its own start position, so that
    // token already sees the marker's coverage in the running max.
    val w = Window.partitionBy(col(id)).orderBy(col("pos"), col("__istok"))
    val covEnd = max(col("__cov"))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val kept = markers.unionByName(tokens)
      .withColumn("__covend", covEnd)
      .where(col("__istok") === 1 &&
        (col("__covend").isNull || col("pos") > col("__covend")))
    // Already hash-partitioned by id from the window — the final
    // aggregate reuses the exchange. array_sort restores token order
    // regardless of aggregation row order.
    val rebuilt = kept.groupBy(col(id)).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("__tok")))),
          x => x("__tok")),
        " ").as("clean_text"))
    df.select(col(id)).join(rebuilt, Seq(id), "left")
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }

  /** Novelty scoring — the inverse view of duplication: per document,
    * how many of its distinct k-grams appear in NO other document
    * (corpus document-frequency 1). High-novelty documents carry
    * information the corpus doesn't already have; low scores mark
    * near-boilerplate. Emits (id, n_grams, n_novel) in exact integers
    * (the caller forms the ratio at display time — a double ratio would
    * be the only non-replayable bit).
    *
    * Plan: the same distinct-gram → df-count shape as [[dupStarts]]
    * minus positions — two linear shuffles (distinct, per-gram count)
    * and one join back on the gram key, then a per-doc count. With
    * `hashed = true` the shuffled key is 8 bytes/gram. */
  def noveltyScore(
      df: DataFrame, text: String, id: String, k: Int,
      hashed: Boolean = true): DataFrame = {
    val docGrams = gramStarts(df, text, id, k, hashed)
      .select(col(id), col("gram")).distinct()
    val dfCounts = docGrams.groupBy(col("gram"))
      .agg(count(lit(1)).as("__df"))
    docGrams.join(dfCounts, Seq("gram"))
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_novel"))
  }
}
