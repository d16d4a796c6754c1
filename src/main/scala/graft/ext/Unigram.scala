package graft.ext

import graft.functions.{GraftFunctions, UnigramTokenize}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword vocabulary induction (Kudo,
  * "Subword Regularization", ACL 2018) — the second trainable tokenizer
  * next to [[Bpe]]: real pipelines ship both, and the two families
  * segment differently (BPE grows greedily from characters; unigram
  * starts from a large candidate set and PRUNES toward the target
  * vocabulary under a language-model objective).
  *
  * The 100 TB shape is identical to [[Bpe.learnMerges]]: the corpus is
  * scanned exactly ONCE (the word-count aggregation — the only
  * corpus-sized job in training), the word-TYPE table is capped and
  * collected, and the EM/prune loop runs driver-side over that bounded
  * table; the cluster's job is the corpus pass plus the codegen'd
  * [[tokenize]] serving pass. The published trainer uses soft EM over a
  * Suffix-array candidate lattice with floating-point likelihoods; this
  * implementation makes two bounded-and-exact substitutions so training
  * is INTEGER-deterministic and independently replayable (the pinned-
  * oracle discipline every iterative gate here follows):
  *
  *  - candidates are all substrings up to `maxPieceLen` of the capped
  *    word-type table, seeded with weighted occurrence counts and
  *    bounded to the `seedSize` most frequent multi-character pieces
  *    (plus every single character, which keeps all words segmentable);
  *  - EM is HARD (Viterbi) EM: the E-step assigns each word type its
  *    single best segmentation under p(piece) = count/total, with
  *    likelihood comparisons done in exact BigInteger cross-
  *    multiplication ([[UnigramTokenize.viterbi]] — the SAME routine
  *    the serving expression runs, so trainer and tokenizer can never
  *    drift); the M-step re-counts pieces with integer word
  *    frequencies. Kudo notes Viterbi decoding as the standard hard
  *    approximation of the full EM objective.
  *
  * Determinism conventions (mirrored by the independent oracle replay
  * tools/gen_unigram_oracle.py): words are whitespace-split with case
  * preserved; substrings/segment positions are code-point-based; ties
  * in Viterbi prefer fewer pieces then the lexicographically smaller
  * piece sequence; seed/prune rankings order by (count desc, piece
  * asc); single-character pieces are floored at count 1 after each
  * M-step so every word stays segmentable; a prune round keeps all
  * single characters plus the top multi-character pieces down to
  * max(vocabSize, 3·|vocab|/4) total pieces; the loop runs `emIters`
  * EM iterations per round and stops when |vocab| <= vocabSize.
  */
object Unigram {

  /** Train a unigram piece vocabulary; returns (piece, n) final counts.
    * ONE Spark job (the word-count pass); EM and pruning run driver-side
    * over the capped word-type table. */
  def train(df: DataFrame, text: String, vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 5000, emIters: Int = 2,
      maxWordTypes: Int = 2000000): DataFrame = {
    require(vocabSize >= 1, s"vocabSize out of range: $vocabSize")
    require(maxPieceLen >= 1 && maxPieceLen <= 32,
      s"maxPieceLen out of range: $maxPieceLen")
    require(seedSize >= 0, s"seedSize out of range: $seedSize")
    require(emIters >= 1, s"emIters out of range: $emIters")
    val spark = df.sparkSession
    val rows = Bpe.wordCounts(df, text)
      .orderBy(desc("n"), asc("word"))
      .limit(maxWordTypes)
      .collect()

    val nWords = rows.length
    require(nWords > 0, "Unigram.train: corpus has no words")
    val words = new Array[Array[String]](nWords)
    val freqs = new Array[Long](nWords)
    var wi = 0
    while (wi < nWords) {
      words(wi) = UnigramTokenize.codePoints(rows(wi).getString(0))
      freqs(wi) = rows(wi).getLong(1)
      wi += 1
    }

    // ---- seed: weighted occurrence counts of every substring <= maxLen
    val seedCounts = new java.util.HashMap[String, java.lang.Long]()
    val sb = new java.lang.StringBuilder
    wi = 0
    while (wi < nWords) {
      val cps = words(wi)
      val f = freqs(wi)
      var i = 0
      while (i < cps.length) {
        sb.setLength(0)
        var j = i
        while (j < cps.length && j - i < maxPieceLen) {
          sb.append(cps(j))
          val p = sb.toString
          val prev = seedCounts.get(p)
          seedCounts.put(p, if (prev == null) f else prev.longValue + f)
          j += 1
        }
        i += 1
      }
      wi += 1
    }
    // All single chars + top-seedSize multi-char pieces.
    var counts = {
      val singles = scala.collection.mutable.TreeMap.empty[String, Long]
      val multis = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      seedCounts.forEach { (p, c) =>
        if (p.codePointCount(0, p.length) == 1) singles(p) = c.longValue
        else multis += ((p, c.longValue))
      }
      val kept = multis.sortBy { case (p, c) => (-c, p) }.take(seedSize)
      (singles.toSeq ++ kept).toMap
    }

    // ---- hard-EM + prune loop
    def emIteration(cur: Map[String, Long]): Map[String, Long] = {
      val model = UnigramTokenize.buildModel(
        cur.toSeq.sortBy(_._1), maxPieceLen)
      val next = new java.util.HashMap[String, java.lang.Long]()
      var w = 0
      while (w < nWords) {
        val segs = UnigramTokenize.viterbi(words(w), model)
        val f = freqs(w)
        var i = 0
        while (i < segs.length) {
          val prev = next.get(segs(i))
          next.put(segs(i), if (prev == null) f else prev.longValue + f)
          i += 1
        }
        w += 1
      }
      // Keep every current single char segmentable: floor at 1.
      val out = scala.collection.mutable.HashMap.empty[String, Long]
      next.forEach { (p, c) =>
        if (cur.contains(p)) out(p) = c.longValue
      }
      cur.keysIterator.foreach { p =>
        if (p.codePointCount(0, p.length) == 1 && !out.contains(p))
          out(p) = 1L
      }
      out.toMap
    }

    var done = false
    while (!done) {
      var it = 0
      while (it < emIters) { counts = emIteration(counts); it += 1 }
      if (counts.size <= vocabSize) done = true
      else {
        val (s, m) = counts.partition { case (p, _) =>
          p.codePointCount(0, p.length) == 1 }
        val target = math.max(vocabSize, counts.size * 3 / 4)
        val keepMulti = math.max(0, target - s.size)
        val keptM = m.toSeq.sortBy { case (p, c) => (-c, p) }.take(keepMulti)
        val pruned = (s ++ keptM).toMap
        // Single characters are never pruned (they keep every word
        // segmentable); if they alone exceed vocabSize, this is as
        // small as the vocabulary gets.
        if (pruned.size == counts.size) done = true
        counts = pruned
      }
    }

    import spark.implicits._
    counts.toSeq.sortBy(_._1).toDF("piece", "n")
  }

  /** SOFT-EM unigram training — the published SentencePiece objective
    * ([[train]] substitutes hard Viterbi; this variant runs the full
    * expectation step): each E-step computes EXPECTED piece counts over
    * ALL segmentations of each word type via the forward-backward
    * lattice recurrences
    *
    *   α(j) = Σ_i α(i)·p(piece[i,j)),   β(i) = Σ_j p(piece[i,j))·β(j),
    *   E[count(piece[i,j))] += freq·α(i)·p·β(j)/α(n),
    *
    * and the M-step renormalizes. Likelihoods are IEEE doubles, so the
    * result is not integer-exact like [[train]]; instead every
    * floating-point operation ORDER is pinned (words in (freq desc,
    * word asc) table order; lattice spans ascending; totals accumulated
    * in piece-ascending order), which makes the computation
    * bit-reproducible on any IEEE-754 platform — the independent
    * Python replay (tools/gen_unigram_soft_oracle.py) mirrors the
    * order, and the t36 gate compares scores under an explicit 1e-6
    * TOLERANCE contract rather than a hash (the documented difference
    * from the integer-exact gates). Structural conventions (word table
    * cap, seed, single-char floor — here 1e-12 expected count — prune
    * schedule and (count desc, piece asc) ranking) are [[train]]'s.
    *
    * Returns (piece, score): the final piece probabilities, normalized
    * over the surviving vocabulary. Corpus cost is identical to
    * [[train]]: ONE word-count pass; the lattice EM runs driver-side
    * over the capped word-type table. */
  def trainSoft(df: DataFrame, text: String, vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 5000, emIters: Int = 2,
      maxWordTypes: Int = 2000000): DataFrame = {
    require(vocabSize >= 1, s"vocabSize out of range: $vocabSize")
    require(maxPieceLen >= 1 && maxPieceLen <= 32,
      s"maxPieceLen out of range: $maxPieceLen")
    require(seedSize >= 0, s"seedSize out of range: $seedSize")
    require(emIters >= 1, s"emIters out of range: $emIters")
    val spark = df.sparkSession
    val rows = Bpe.wordCounts(df, text)
      .orderBy(desc("n"), asc("word"))
      .limit(maxWordTypes)
      .collect()
    val nWords = rows.length
    require(nWords > 0, "Unigram.trainSoft: corpus has no words")
    val words = new Array[Array[String]](nWords)
    val freqs = new Array[Long](nWords)
    var wi = 0
    while (wi < nWords) {
      words(wi) = UnigramTokenize.codePoints(rows(wi).getString(0))
      freqs(wi) = rows(wi).getLong(1)
      wi += 1
    }

    // ---- seed: identical structure to train's, held as doubles.
    val seedCounts = new java.util.HashMap[String, java.lang.Long]()
    val sb = new java.lang.StringBuilder
    wi = 0
    while (wi < nWords) {
      val cps = words(wi)
      val f = freqs(wi)
      var i = 0
      while (i < cps.length) {
        sb.setLength(0)
        var j = i
        while (j < cps.length && j - i < maxPieceLen) {
          sb.append(cps(j))
          val p = sb.toString
          val prev = seedCounts.get(p)
          seedCounts.put(p, if (prev == null) f else prev.longValue + f)
          j += 1
        }
        i += 1
      }
      wi += 1
    }
    var e: Map[String, Double] = {
      val singles = scala.collection.mutable.TreeMap.empty[String, Long]
      val multis = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      seedCounts.forEach { (p, c) =>
        if (p.codePointCount(0, p.length) == 1) singles(p) = c.longValue
        else multis += ((p, c.longValue))
      }
      val kept = multis.sortBy { case (p, c) => (-c, p) }.take(seedSize)
      (singles.toSeq ++ kept).map { case (p, c) => (p, c.toDouble) }.toMap
    }

    /** Σ over pieces in ASCENDING piece order — the pinned total. */
    def totalOf(m: Map[String, Double]): Double = {
      var t = 0.0
      m.keysIterator.toSeq.sorted.foreach(p => t += m(p))
      t
    }

    def softEmIteration(cur: Map[String, Double]): Map[String, Double] = {
      val total = totalOf(cur)
      val prob = new java.util.HashMap[String, java.lang.Double](cur.size * 2)
      cur.foreach { case (p, c) => prob.put(p, c / total) }
      val next = new java.util.HashMap[String, java.lang.Double]()
      val sb = new java.lang.StringBuilder
      var w = 0
      while (w < nWords) {
        val cps = words(w)
        val n = cps.length
        val f = freqs(w).toDouble
        // Piece probabilities for every lattice span, row-major
        // (i ascending, then j ascending) — 0.0 marks out-of-vocab.
        val pij = new Array[Double](n * maxPieceLen)
        val names = new Array[String](n * maxPieceLen)
        var i = 0
        while (i < n) {
          sb.setLength(0)
          var j = i
          while (j < n && j - i < maxPieceLen) {
            sb.append(cps(j))
            val piece = sb.toString
            val pp = prob.get(piece)
            if (pp != null) {
              pij(i * maxPieceLen + (j - i)) = pp.doubleValue
              names(i * maxPieceLen + (j - i)) = piece
            }
            j += 1
          }
          i += 1
        }
        val alpha = new Array[Double](n + 1)
        alpha(0) = 1.0
        var jj = 1
        while (jj <= n) {
          var s = 0.0
          var ii = math.max(0, jj - maxPieceLen)
          while (ii < jj) {
            val p = pij(ii * maxPieceLen + (jj - ii - 1))
            if (p > 0.0) s += alpha(ii) * p
            ii += 1
          }
          alpha(jj) = s
          jj += 1
        }
        val z = alpha(n)
        if (z > 0.0) {
          val beta = new Array[Double](n + 1)
          beta(n) = 1.0
          var ii = n - 1
          while (ii >= 0) {
            var s = 0.0
            var jj2 = ii + 1
            while (jj2 <= math.min(n, ii + maxPieceLen)) {
              val p = pij(ii * maxPieceLen + (jj2 - ii - 1))
              if (p > 0.0) s += p * beta(jj2)
              jj2 += 1
            }
            beta(ii) = s
            ii -= 1
          }
          ii = 0
          while (ii < n) {
            var jj2 = ii + 1
            while (jj2 <= math.min(n, ii + maxPieceLen)) {
              val idx = ii * maxPieceLen + (jj2 - ii - 1)
              val p = pij(idx)
              if (p > 0.0) {
                var c = f * alpha(ii)
                c = c * p
                c = c * beta(jj2)
                c = c / z
                val piece = names(idx)
                val prev = next.get(piece)
                next.put(piece,
                  if (prev == null) c else prev.doubleValue + c)
              }
              jj2 += 1
            }
            ii += 1
          }
        }
        w += 1
      }
      val out = scala.collection.mutable.HashMap.empty[String, Double]
      next.forEach { (p, c) =>
        if (cur.contains(p)) out(p) = c.doubleValue
      }
      // Keep every current single char segmentable: floor the expected
      // count at 1e-12.
      cur.keysIterator.foreach { p =>
        if (p.codePointCount(0, p.length) == 1)
          out(p) = math.max(out.getOrElse(p, 0.0), 1e-12)
      }
      out.toMap
    }

    var done = false
    while (!done) {
      var it = 0
      while (it < emIters) { e = softEmIteration(e); it += 1 }
      if (e.size <= vocabSize) done = true
      else {
        val (s, m) = e.partition { case (p, _) =>
          p.codePointCount(0, p.length) == 1 }
        val target = math.max(vocabSize, e.size * 3 / 4)
        val keepMulti = math.max(0, target - s.size)
        val keptM = m.toSeq.sortBy { case (p, c) => (-c, p) }.take(keepMulti)
        val pruned = (s ++ keptM).toMap
        if (pruned.size == e.size) done = true
        e = pruned
      }
    }

    val finalTotal = totalOf(e)
    import spark.implicits._
    e.toSeq.sortBy(_._1).map { case (p, c) => (p, c / finalTotal) }
      .toDF("piece", "score")
  }

  /** Tokenize `text` with a trained vocabulary: one codegen'd exact-
    * Viterbi pass per row ([[UnigramTokenize]]) — the serving-side op
    * that runs over the full corpus. Adds `out` (ARRAY<STRING>). */
  def tokenize(df: DataFrame, text: String, vocab: Seq[(String, Long)],
      maxPieceLen: Int = 6, out: String = "unigram_tokens"): DataFrame =
    df.withColumn(out, GraftFunctions.unigramTokenize(
      col(text), vocab, maxPieceLen))

  /** Subword-regularization sampling serving (Kudo ACL 2018 §3): one
    * codegen'd pass per row that samples each word's segmentation from
    * its `nbest` best lattice paths with probability proportional to
    * p(seg)^alpha ([[graft.functions.UnigramSampleTokenize]]) — the
    * stochastic epoch-augmentation mode next to the deterministic
    * [[tokenize]]. Draws are a pure function of (word, occurrence
    * ordinal, `seed`), so an epoch is reproducible and partitioning-
    * independent at any scale; vary `seed` per epoch to resample the
    * corpus. `nbest = 1` degrades to exactly [[tokenize]]. The
    * effective smoothing exponent is `alpha / alphaDen` —
    * SentencePiece's published fractional defaults (e.g. 0.1 = 1/10)
    * are expressed as a rational and sampled through exact integer
    * alphaDen-th-root weights (see
    * [[graft.functions.UnigramSampleTokenize]] for the floor-rounding
    * contract). Adds `out` (ARRAY<STRING>). */
  def sampleTokenize(df: DataFrame, text: String, vocab: Seq[(String, Long)],
      maxPieceLen: Int = 6, nbest: Int = 4, alpha: Int = 1, seed: Long = 42L,
      out: String = "unigram_sample_tokens", alphaDen: Int = 1): DataFrame =
    df.withColumn(out, GraftFunctions.unigramSampleTokenize(
      col(text), vocab, maxPieceLen, nbest, alpha, seed, alphaDen))

  /** Driver-side convenience: collect a (piece, n) vocabulary frame (as
    * produced by [[train]]) into the list [[tokenize]] consumes. The
    * frame is vocab-sized — never data-sized. */
  def collectVocab(vocab: DataFrame): Seq[(String, Long)] =
    vocab.orderBy("piece").collect()
      .map((r: Row) => (r.getString(0), r.getLong(1))).toSeq

  // --------------------------------------- persisted tokenizer model

  /** Persist a learned (piece, n) vocabulary at `root` with its
    * `maxPieceLen` pinned in a meta sidecar — the tokenizer's
    * index/serve split (cf. [[Bpe.saveModel]]): serving with a
    * different maxPieceLen than the vocabulary was trained for
    * silently changes segmentations, so the serve side reads the
    * pinned value instead of trusting a caller. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, root: String,
      vocab: Seq[(String, Long)], maxPieceLen: Int): Unit = {
    import spark.implicits._
    Seq(maxPieceLen).toDF("max_piece_len")
      .write.mode("errorifexists").parquet(s"$root/meta.parquet")
    vocab.toDF("piece", "n")
      .write.mode("errorifexists").parquet(s"$root/vocab.parquet")
  }

  /** Load a persisted vocabulary and its pinned maxPieceLen. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      root: String): (Seq[(String, Long)], Int) =
    (collectVocab(spark.read.parquet(s"$root/vocab.parquet")),
      spark.read.parquet(s"$root/meta.parquet").head.getInt(0))
}
