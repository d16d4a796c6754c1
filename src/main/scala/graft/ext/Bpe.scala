package graft.ext

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016) — the tokenizer-training half the text family was missing
  * (t1/pk1 COUNT tokens; this LEARNS the vocabulary they'd count with).
  *
  * The published formulation is what makes it a 100 TB operator: merges
  * are computed over the WORD-FREQUENCY TABLE, not the running text.
  * The corpus is scanned exactly once (a word-count aggregation — the
  * only corpus-sized shuffle); every merge round after that works on
  * the bounded distinct-word vocab, each round one codegen'd merge
  * projection + one pair-count aggregate + a single argmax row to the
  * driver (the global best pair is inherently a driver decision, like
  * every iterative fixed-point here). `localCheckpoint` truncates the
  * per-round lineage exactly as [[Dedup.connectedComponents]] does.
  *
  * Symbol conventions (mirrored by the independent oracle generator
  * tools/gen_bpe_oracle.py): words are whitespace-split with case
  * PRESERVED; initial symbols are code points plus a final "</w>"
  * end-of-word marker; a merge round replaces adjacent (left, right)
  * non-overlapping left-to-right; the best pair is max count with
  * lexicographically-smallest (left, right) tiebreak — deterministic
  * across partitionings and engines (ASCII corpora; both orderings are
  * code-point orders there).
  */
object Bpe {

  /** (word, n) frequency table — the single corpus-sized pass. */
  def wordCounts(df: DataFrame, text: String): DataFrame =
    df.select(explode(filter(split(col(text), "\\s+"),
        w => length(w) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` merges; stops early when the best remaining pair
    * occurs fewer than `minCount` times (weighted by word frequency).
    * Returns (rank, left, right) with rank 1-based in merge order. */
  def learnMerges(df: DataFrame, text: String, numMerges: Int,
      minCount: Long = 2L): DataFrame = {
    require(numMerges >= 1 && numMerges <= 10000,
      s"numMerges out of range: $numMerges")
    val spark = df.sparkSession
    var vocab = wordCounts(df, text)
      .select(GraftFunctions.bpeTokenize(col("word"), Nil).as("syms"),
        col("n"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // Adjacent pairs of the vocab's symbol sequences, frequency-
      // weighted. The single-symbol guard matters: sequence(1, 0) is
      // DESCENDING in Spark (step -1), so a fully-merged one-symbol
      // word would otherwise index past the array instead of yielding
      // no pairs.
      val best = vocab
        .where(size(col("syms")) >= 2)
        .select(explode(transform(
            sequence(lit(1), size(col("syms")) - 1),
            i => struct(
              element_at(col("syms"), i).as("left"),
              element_at(col("syms"), i + 1).as("right")))).as("p"),
          col("n"))
        .groupBy(col("p.left").as("left"), col("p.right").as("right"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(desc("cnt"), asc("left"), asc("right"))
        .limit(1)
        .collect()
      best match {
        case Array(row) if row.getLong(2) >= minCount =>
          val (l, r) = (row.getString(0), row.getString(1))
          rank += 1
          merges += ((rank, l, r))
          vocab = vocab
            .select(GraftFunctions.bpeMergePair(col("syms"), l, r).as("syms"),
              col("n"))
            .localCheckpoint()
        case _ => done = true
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "left", "right")
  }

  /** Tokenize `text` with a learned merge list: one codegen'd pass per
    * row ([[graft.functions.BpeTokenize]]), no joins, no state — the
    * serving-side op that runs over the full corpus. Adds `out`
    * (ARRAY<STRING> of subword tokens). */
  def tokenize(df: DataFrame, text: String, merges: Seq[(String, String)],
      out: String = "bpe_tokens"): DataFrame =
    df.withColumn(out, GraftFunctions.bpeTokenize(col(text), merges))

  /** Driver-side convenience: collect a merges frame (as produced by
    * [[learnMerges]]) into the ordered list [[tokenize]] consumes. The
    * frame is numMerges rows — never data-sized. */
  def collectMerges(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy("rank").collect()
      .map((r: Row) => (r.getString(1), r.getString(2))).toSeq
}
