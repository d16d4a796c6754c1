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
  * only corpus-sized shuffle, and the only Spark job in training); the
  * word-type table is collected and merge learning runs DRIVER-SIDE
  * with Sennrich's incremental pair statistics. The earlier formulation
  * scheduled one distributed pair-count job per merge rank — thousands
  * of job round-trips over a table that is word-type-bounded and fits
  * the driver by construction; merge learning is a driver-state
  * algorithm exactly like every argmax fixed-point here, and the
  * cluster's job is the corpus pass plus the codegen'd [[tokenize]]
  * serving pass. `maxWordTypes` caps the collected table (most frequent
  * types first, deterministic word tiebreak) so an open-vocabulary
  * 100 TB corpus bounds driver memory; rare tail types contribute
  * counts below any practical `minCount` anyway.
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
    * Returns (rank, left, right) with rank 1-based in merge order.
    *
    * ONE Spark job (the word-count pass, capped to the `maxWordTypes`
    * most frequent types); everything after is driver-side Sennrich
    * with incremental pair statistics and a lazy-deletion max-heap:
    * each merge touches only the words that contain the winning pair,
    * subtracting their old adjacent-pair counts and adding the new
    * ones, so a round costs O(affected-word symbols), not a cluster
    * round-trip. Selection is max weighted count with the
    * lexicographically-smallest (left, right) tiebreak — identical to
    * the distributed argmax it replaces (ASCII corpora; see the object
    * scaladoc). Symbol seeding reuses [[graft.functions.BpeTokenize]]
    * with an empty merge list, so the learner and the serving
    * tokenizer can never drift. */
  def learnMerges(df: DataFrame, text: String, numMerges: Int,
      minCount: Long = 2L, maxWordTypes: Int = 2000000): DataFrame = {
    require(numMerges >= 1 && numMerges <= 10000,
      s"numMerges out of range: $numMerges")
    require(maxWordTypes >= 1, s"maxWordTypes out of range: $maxWordTypes")
    val spark = df.sparkSession
    val rows = wordCounts(df, text)
      .orderBy(desc("n"), asc("word"))
      .limit(maxWordTypes)
      .collect()

    // Vocab as driver arrays: symbol sequences + frequencies.
    val nWords = rows.length
    val words = new Array[Array[String]](nWords)
    val freqs = new Array[Long](nWords)
    var wi = 0
    while (wi < nWords) {
      val ad = graft.functions.BpeTokenize.tokenize(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          rows(wi).getString(0)),
        Array.empty)
      words(wi) = Array.tabulate(ad.numElements())(i =>
        ad.getUTF8String(i).toString)
      freqs(wi) = rows(wi).getLong(1)
      wi += 1
    }

    // stats: pair -> weighted adjacent-occurrence count (the truth).
    // index: pair -> words that MAY contain it (complete, lazily stale:
    // a word is re-checked for actual containment when visited).
    val stats = new java.util.HashMap[(String, String), Long]()
    val index = new java.util.HashMap[(String, String),
      java.util.ArrayList[Integer]]()
    def bump(p: (String, String), d: Long): Unit = {
      val nv = stats.getOrDefault(p, 0L) + d
      if (nv == 0L) stats.remove(p) else stats.put(p, nv)
    }
    def addIndex(p: (String, String), w: Int): Unit = {
      var l = index.get(p)
      if (l == null) { l = new java.util.ArrayList[Integer](); index.put(p, l) }
      if (l.isEmpty || l.get(l.size - 1).intValue != w) l.add(w)
    }
    wi = 0
    while (wi < nWords) {
      val syms = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        bump(p, freqs(wi))
        addIndex(p, wi)
        i += 1
      }
      wi += 1
    }

    // Lazy-deletion max-heap: greatest = highest count, then lex-
    // smallest (left, right). An entry is valid iff its count still
    // equals the live stats value; stale entries pop and drop.
    final case class Entry(cnt: Long, l: String, r: String)
    val ord: Ordering[Entry] = new Ordering[Entry] {
      def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Long.compare(a.cnt, b.cnt)
        if (c != 0) c
        else {
          val lc = b.l.compareTo(a.l)
          if (lc != 0) lc else b.r.compareTo(a.r)
        }
      }
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[Entry](ord)
    stats.forEach((p, c) => heap.enqueue(Entry(c, p._1, p._2)))

    def mergeWord(syms: Array[String], l: String, r: String): Array[String] = {
      val out = new Array[String](syms.length)
      var i = 0; var o = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out(o) = l + r; i += 2
        } else { out(o) = syms(i); i += 1 }
        o += 1
      }
      if (o == syms.length) out else java.util.Arrays.copyOf(out, o)
    }

    val merges = Seq.newBuilder[(Int, String, String)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      var best: Entry = null
      while (best == null && heap.nonEmpty) {
        val e = heap.dequeue()
        if (stats.getOrDefault((e.l, e.r), 0L) == e.cnt) best = e
      }
      if (best == null || best.cnt < minCount) done = true
      else {
        rank += 1
        merges += ((rank, best.l, best.r))
        val p = (best.l, best.r)
        val affected = index.remove(p)
        val touched = scala.collection.mutable.HashSet.empty[(String, String)]
        if (affected != null) {
          val seen = scala.collection.mutable.HashSet.empty[Int]
          val it = affected.iterator
          while (it.hasNext) {
            val w = it.next().intValue
            if (seen.add(w)) {
              val old = words(w)
              var has = false
              var i = 0
              while (!has && i < old.length - 1) {
                has = old(i) == best.l && old(i + 1) == best.r; i += 1
              }
              if (has) {
                i = 0
                while (i < old.length - 1) {
                  val q = (old(i), old(i + 1)); bump(q, -freqs(w))
                  touched += q; i += 1
                }
                val nw = mergeWord(old, best.l, best.r)
                words(w) = nw
                i = 0
                while (i < nw.length - 1) {
                  val q = (nw(i), nw(i + 1)); bump(q, freqs(w))
                  touched += q; addIndex(q, w); i += 1
                }
              }
            }
          }
        }
        stats.remove(p)
        touched.foreach { q =>
          if (stats.containsKey(q)) heap.enqueue(Entry(stats.get(q), q._1, q._2))
        }
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

  /** BPE-dropout serving (Provilkov et al., ACL 2020): apply the merge
    * table as [[tokenize]] does but drop each merge site with
    * probability `dropoutPpm`/1e6 via deterministic XXH64 coins
    * ([[graft.functions.BpeDropoutTokenize]]) — the stochastic
    * epoch-augmentation mode of the BPE family. Draws are a pure
    * function of (word, occurrence ordinal, merge rank, site, `seed`),
    * so an epoch is reproducible and partitioning-independent; vary
    * `seed` per epoch to resample. `dropoutPpm = 0` degrades to
    * exactly [[tokenize]]. Adds `out` (ARRAY<STRING>). */
  def tokenizeDropout(df: DataFrame, text: String,
      merges: Seq[(String, String)], dropoutPpm: Int, seed: Long = 42L,
      out: String = "bpe_dropout_tokens"): DataFrame =
    df.withColumn(out, GraftFunctions.bpeDropoutTokenize(
      col(text), merges, dropoutPpm, seed))

  /** Driver-side convenience: collect a merges frame (as produced by
    * [[learnMerges]]) into the ordered list [[tokenize]] consumes. The
    * frame is numMerges rows — never data-sized. */
  def collectMerges(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy("rank").collect()
      .map((r: Row) => (r.getString(1), r.getString(2))).toSeq

  // --------------------------------------- persisted tokenizer model

  /** Persist a learned merge list at `root` — the tokenizer's
    * index/serve split (the t44 NB-model / d20 decontam-index / ANN
    * contract applied to tokenization): train once, tokenize any
    * number of corpora/streams from the SAVED model, never re-learning.
    * Merge ORDER is the model (BPE applies merges by rank), so the
    * rank column is persisted and [[loadModel]] re-sorts by it —
    * parquet row order is not trusted. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, root: String,
      merges: Seq[(String, String)]): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "left", "right")
      .write.mode("errorifexists").parquet(s"$root/merges.parquet")
  }

  /** Load a persisted merge list, rank order restored. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      root: String): Seq[(String, String)] =
    collectMerges(spark.read.parquet(s"$root/merges.parquet"))
}
