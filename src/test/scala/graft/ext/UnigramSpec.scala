package graft.ext

import graft.TestSpark
import graft.functions.UnigramTokenize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("train: frequent whole words become pieces; vocab includes all " +
      "single chars; counts are exact word frequencies") {
    val df = Seq.fill(50)("cat dog").toDF("text")
    val vocab = Unigram.train(df, "text", vocabSize = 12, maxPieceLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 6 singles (a c d g o t) always present; 'cat'/'dog' win the EM.
    assert(vocab.contains("cat") && vocab.contains("dog"))
    assert(vocab("cat") === 50L && vocab("dog") === 50L)
    assert(Seq("a", "c", "d", "g", "o", "t").forall(vocab.contains))
  }

  test("train: prune keeps singles and drops low-count multis down to " +
      "the schedule target") {
    // Many distinct rare words force a large seed; vocabSize below the
    // seed exercises the 3/4 prune rounds. Singles survive every round.
    val words = (0 until 40).map(i => s"w${i}x${i}")
    val df = Seq(words.mkString(" ")).toDF("text")
    val vocab = Unigram.train(df, "text", vocabSize = 20,
      maxPieceLen = 4, seedSize = 200)
    val pieces = vocab.collect().map(_.getString(0))
    val singles = pieces.filter(_.codePointCount(0, 1) == 1)
      .filter(_.length == 1)
    assert(pieces.length <= math.max(20, singles.length))
  }

  test("viterbi: exact-integer likelihood, fewer-pieces then lex " +
      "tiebreaks, UNK-as-char floor") {
    // vocab: ab (4), a (2), b (2), c (1); T = 9.
    val model = UnigramTokenize.buildModel(
      Seq("ab" -> 4L, "a" -> 2L, "b" -> 2L, "c" -> 1L), 2)
    def seg(w: String) =
      UnigramTokenize.viterbi(UnigramTokenize.codePoints(w), model).toSeq
    // "ab": [ab] scores 4/9 > [a][b] 4/81.
    assert(seg("ab") === Seq("ab"))
    // "abc": [ab][c] 4/81 beats [a][b][c] 4/729.
    assert(seg("abc") === Seq("ab", "c"))
    // "az": z unseen -> UNK floor count 1: [a][z].
    assert(seg("az") === Seq("a", "z"))
    // Exact tie in likelihood and k: [a][b] vs ... construct tie via
    // equal counts: vocab x(2) y(2) xy absent -> only one path; instead
    // test lex tie: pieces "aa"(2) and "a"(2): "aaa" paths [aa][a] and
    // [a][aa] tie in product and k -> lex smaller ["a","aa"] wins.
    val m2 = UnigramTokenize.buildModel(Seq("a" -> 2L, "aa" -> 2L), 2)
    assert(UnigramTokenize.viterbi(
      UnigramTokenize.codePoints("aaa"), m2).toSeq === Seq("a", "aa"))
  }

  test("tokenize expression: serving equals trainer segmentation and " +
      "is codegen-stable across repeated words") {
    val corpus = Seq.fill(30)("spark scan scans").toDF("text")
    val vocab = Unigram.collectVocab(
      Unigram.train(corpus, "text", vocabSize = 30, maxPieceLen = 5))
    val out = Unigram.tokenize(
        Seq("spark scans unknownzz").toDF("text"), "text", vocab,
        maxPieceLen = 5)
      .select(col("unigram_tokens")).head().getSeq[String](0)
    // Every output token re-concatenates to the input words.
    assert(out.mkString === "sparkscansunknownzz")
    // 'spark' trained as a whole piece segments as itself.
    assert(out.take(1) === Seq("spark"))
    val model = UnigramTokenize.buildModel(vocab, 5)
    val wordSegs = Seq("spark", "scans", "unknownzz").flatMap(w =>
      UnigramTokenize.viterbi(UnigramTokenize.codePoints(w), model))
    assert(out === wordSegs)
  }

  test("sampleTokenize: nbest=1 equals the deterministic Viterbi " +
      "serving; outputs always reconcatenate to the input words") {
    val corpus = Seq.fill(30)("spark scan scans").toDF("text")
    val vocab = Unigram.collectVocab(
      Unigram.train(corpus, "text", vocabSize = 30, maxPieceLen = 5))
    val in = Seq("spark scans unknownzz spark").toDF("text")
    val det = Unigram.tokenize(in, "text", vocab, maxPieceLen = 5)
      .select(col("unigram_tokens")).head().getSeq[String](0)
    val n1 = Unigram.sampleTokenize(in, "text", vocab, maxPieceLen = 5,
        nbest = 1, alpha = 1, seed = 7L)
      .select(col("unigram_sample_tokens")).head().getSeq[String](0)
    assert(n1 === det)
    val n4 = Unigram.sampleTokenize(in, "text", vocab, maxPieceLen = 5,
        nbest = 4, alpha = 1, seed = 7L)
      .select(col("unigram_sample_tokens")).head().getSeq[String](0)
    assert(n4.mkString === "sparkscansunknownzzspark")
  }

  test("sampleTokenize: deterministic under a fixed seed, varies across " +
      "occurrences and seeds, and every sampled path is a valid lattice " +
      "segmentation") {
    // vocab a(2) aa(2): 'aaa' has three lattice paths — [a,aa] and
    // [aa,a] tie on likelihood (4/T^2), [a,a,a] is 8/T^3; nbest=3 keeps
    // all three, alpha=0 samples them uniformly.
    val vocab = Seq("a" -> 2L, "aa" -> 2L)
    val text = Array.fill(64)("aaa").mkString(" ")
    def run(seed: Long) =
      Unigram.sampleTokenize(Seq(text).toDF("text"), "text", vocab,
          maxPieceLen = 2, nbest = 3, alpha = 0, seed = seed)
        .select(col("unigram_sample_tokens")).head().getSeq[String](0)
    val s1 = run(7L); val s1b = run(7L); val s2 = run(8L)
    assert(s1 === s1b)                 // reproducible epoch
    assert(s1 !== s2)                  // a new seed resamples
    // Split back into per-word segmentations by walking the 3-char words.
    def perWord(toks: Seq[String]): Seq[Seq[String]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      var len = 0
      toks.foreach { t =>
        cur += t; len += t.length
        if (len == 3) {
          out += cur.toSeq
          cur = scala.collection.mutable.ArrayBuffer.empty[String]
          len = 0
        }
      }
      assert(len === 0)
      out.toSeq
    }
    val segs = perWord(s1)
    assert(segs.size === 64)
    val valid = Set(Seq("a", "aa"), Seq("aa", "a"), Seq("a", "a", "a"))
    assert(segs.forall(valid.contains))
    // The same word draws differently across occurrence ordinals.
    assert(segs.distinct.size >= 2)
  }

  test("sampleTokenize fractional alpha: floor big-int root is exact; " +
      "alphaDen=1 is bit-identical to the integer path; a fractional " +
      "exponent flattens the draw distribution toward uniform") {
    import java.math.BigInteger
    // nthRoot: exact on perfect powers, floor just below/above them.
    def rt(x: BigInteger, n: Int) =
      graft.functions.UnigramSampleTokenize.nthRoot(x, n)
    val big = new BigInteger("12345678901234567890123456789")
    for (n <- Seq(2, 3, 7, 10)) {
      val p = big.pow(n)
      assert(rt(p, n) === big)
      assert(rt(p.subtract(BigInteger.ONE), n) === big.subtract(BigInteger.ONE))
      assert(rt(p.add(BigInteger.ONE), n) === big)
    }
    assert(rt(BigInteger.ZERO, 5) === BigInteger.ZERO)
    assert(rt(BigInteger.ONE, 5) === BigInteger.ONE)

    // alphaDen=1 takes the original (no-root) path: same draws.
    val vocab = Seq("a" -> 6L, "aa" -> 2L)
    val text = Array.fill(64)("aaa").mkString(" ")
    def run(alpha: Int, den: Int) =
      Unigram.sampleTokenize(Seq(text).toDF("text"), "text", vocab,
          maxPieceLen = 2, nbest = 3, alpha = alpha, seed = 7L,
          alphaDen = den)
        .select(col("unigram_sample_tokens")).head().getSeq[String](0)
    assert(run(1, 1) === Unigram.sampleTokenize(
      Seq(text).toDF("text"), "text", vocab, maxPieceLen = 2, nbest = 3,
      alpha = 1, seed = 7L).select(col("unigram_sample_tokens"))
      .head().getSeq[String](0))

    // Flattening: with a(6) aa(2), [a,a,a] has weight 216 vs 12/12 for
    // the two-piece paths at alpha=1 (90% of draws); at alpha=1/10 the
    // 10th roots nearly equalize the weights, so the minority paths'
    // share must rise strictly. Count three-piece words in each epoch.
    def threePieceShare(toks: Seq[String]): Int =
      toks.count(_ == "a") // more singles <=> more [a,a,a] words
    val sharp = threePieceShare(run(1, 1))
    val flat = threePieceShare(run(1, 10))
    assert(flat < sharp) // flatter => FEWER all-single draws...
  }

  test("train is invariant to partitioning (single corpus-pass argmax)") {
    // The single-char floor (count 1) does NOT scale with corpus size,
    // so the invariant is physical-layout independence of the SAME
    // rows, not count linearity.
    val rows = Seq.fill(12)("alpha beta beta gamma delta")
    val v1 = Unigram.train(
        spark.sparkContext.parallelize(rows, 1).toDF("text"),
        "text", vocabSize = 25, maxPieceLen = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val v8 = Unigram.train(
        spark.sparkContext.parallelize(rows, 8).toDF("text"),
        "text", vocabSize = 25, maxPieceLen = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(v8 === v1)
  }
}
