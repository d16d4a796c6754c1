package graft.ext

import graft.TestSpark
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learnMerges: hand-computed fixture, lexicographic tiebreak, " +
      "minCount early stop") {
    // "ab ab ab": pairs (a,b) and (b,</w>) tie at 3 -> lexicographic
    // smallest (a,b) merges first, then (ab,</w>).
    val df1 = Seq("ab ab ab").toDF("text")
    val m1 = Bpe.learnMerges(df1, "text", numMerges = 2)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(m1.toSeq === Seq((1, "a", "b"), (2, "ab", "</w>")))

    // "a a b": (a,</w>) has count 2, (b,</w>) count 1 < minCount=2 ->
    // exactly one merge even though numMerges allows five.
    val df2 = Seq("a a b").toDF("text")
    val m2 = Bpe.learnMerges(df2, "text", numMerges = 5)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2)))
    assert(m2.toSeq === Seq(("a", "</w>")))
  }

  test("tokenize: learned merges collapse words; unseen words fall back " +
      "to finer symbols") {
    val merges = Seq(("a", "b"), ("ab", "</w>"))
    val got = Bpe.tokenize(Seq("ab ab xa").toDF("text"), "text", merges)
      .select(col("bpe_tokens")).head.getSeq[String](0)
    assert(got === Seq("ab</w>", "ab</w>", "x", "a", "</w>"))
  }

  test("tokenizeDropout: p=0 equals tokenize; p=1e6 fully character-" +
      "splits; p=0.5 is deterministic per seed and varies across seeds " +
      "and occurrences") {
    val merges = Seq(("a", "b"), ("ab", "</w>"))
    val in = Seq(Array.fill(40)("ab").mkString(" ")).toDF("text")
    def run(ppm: Int, seed: Long) =
      Bpe.tokenizeDropout(in, "text", merges, dropoutPpm = ppm, seed = seed)
        .select(col("bpe_dropout_tokens")).head.getSeq[String](0)
    val det = Bpe.tokenize(in, "text", merges)
      .select(col("bpe_tokens")).head.getSeq[String](0)
    assert(run(0, 7L) === det)
    // Always-drop: every word stays fully split (a, b, </w>).
    assert(run(1000000, 7L) === Seq.fill(40)(Seq("a", "b", "</w>")).flatten)
    val s7 = run(500000, 7L)
    assert(run(500000, 7L) === s7)      // reproducible epoch
    assert(run(500000, 8L) !== s7)      // a new seed resamples
    // The same word draws differently across occurrence ordinals: with
    // 40 occurrences at p=0.5 both outcomes of the first merge appear.
    assert(s7.contains("ab") || s7.contains("ab</w>"))
    assert(s7.contains("a"))
    // Dropped first merge suppresses the second (ab never forms), and
    // every word still reconcatenates to 'ab</w>'.
    assert(s7.mkString.replace("</w>", "|") === "ab|" * 40)
  }

  test("learnMerges: incremental driver-side stats equal a naive " +
      "recompute-per-round reference over 40 merges") {
    // Structured corpus with overlaps, ties, repeats and shared affixes
    // so the incremental subtract/add path and the heap tiebreaks are
    // all exercised.
    val rnd = new scala.util.Random(7)
    val stems = Seq("ab", "abc", "bca", "cab", "aab", "bb", "abab", "ca")
    val wordsPool = for { s <- stems; suf <- Seq("", "a", "ab", "c") } yield s + suf
    val text = (1 to 400).map(_ => wordsPool(rnd.nextInt(wordsPool.size)))
      .mkString(" ")
    val got = Bpe.learnMerges(Seq(text).toDF("text"), "text", numMerges = 40,
        minCount = 2L)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq

    // Naive reference: full pair recount every round.
    val wc = text.split("\\s+").filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }
    var vocab: Seq[(Array[String], Long)] = wc.toSeq.map { case (w, n) =>
      (w.map(_.toString).toArray :+ "</w>", n) }
    val ref = Seq.newBuilder[(String, String)]
    var stop = false
    while (!stop && ref.result().size < 40) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, n) =>
        (0 until syms.length - 1).foreach(i =>
          counts((syms(i), syms(i + 1))) += n)
      }
      if (counts.isEmpty) stop = true
      else {
        val (p, c) = counts.minBy { case ((l, r), cnt) => (-cnt, l, r) }
        if (c < 2L) stop = true
        else {
          ref += p
          vocab = vocab.map { case (syms, n) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == p._1 && syms(i + 1) == p._2) {
                out += p._1 + p._2; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, n)
          }
        }
      }
    }
    assert(got === ref.result())
  }

  test("learnMerges: training runs ONE corpus pass — job count is " +
      "independent of numMerges") {
    val text = (1 to 50).map(i => s"w${i % 9}x w${i % 7}y zz").mkString(" ")
    val sc = spark.sparkContext
    sc.setJobGroup("bpe-train-jobcount", "bpe training job count")
    try Bpe.learnMerges(Seq(text).toDF("text"), "text", numMerges = 60)
    finally sc.clearJobGroup()
    val jobs = sc.statusTracker.getJobIdsForGroup("bpe-train-jobcount").length
    // The word-count collect is 1-3 jobs under AQE; the old formulation
    // ran one-plus jobs PER MERGE (60+ here).
    assert(jobs >= 1 && jobs <= 6, s"expected a constant few jobs, got $jobs")
  }

  test("BpeMergePair: non-overlapping left-to-right (a,a over [a,a,a])") {
    val got = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(GraftFunctions.bpeMergePair(col("syms"), "a", "a").as("m"))
      .head.getSeq[String](0)
    assert(got === Seq("aa", "a"))
  }
}
