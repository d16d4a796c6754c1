package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KneserNeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // The normalization identity the interpolated-KN algebra guarantees:
  // for ANY context, summing P3 over the continuation-unigram
  // vocabulary V1 telescopes to exactly `scale` — the discounted mass
  // (4·c2 − 3·n3d)·S plus the redistributed 3·n3d·Σ P2, where Σ P2
  // telescopes the same way onto Σ Pcont = Σ cn1·S/bsz = S. Every
  // floor division loses < 1, so the integer sum sits within a few
  // |V1| of S from below — a formula-chain error (wrong discount,
  // wrong backoff statistic, a swapped numerator) breaks this by
  // orders of magnitude, not ulps.
  test("knScoreModel: interpolated probabilities normalize to ~scale " +
      "over the continuation vocabulary, for seen, backoff and " +
      "unseen-context cases alike") {
    val corpus = Seq(
      (1L, "a b c a b d a b c e"),
      (2L, "b c d e a"),
      (3L, "c d e a b c"),
      (4L, "e e a b d c")).toDF("doc_id", "text")
    val tri = TextAnalysis.knCounts(corpus, "text")

    // V1 = every word observed as SOME trigram continuation.
    val v1 = tri.select(col("w3")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(v1.length >= 4)

    val scale = 1000000000000L
    def contextSum(w1: String, w2: String): Long = {
      val probes = v1.zipWithIndex.map { case (w3, i) =>
        (i.toLong, s"$w1 $w2 $w3")
      }.toSeq.toDF("doc_id", "text")
      // One trigram per probe doc => score_e12 IS that trigram's P3.
      TextAnalysis.knScoreModel(probes, "text", "doc_id", tri,
          minCount = 1L)
        .agg(sum(col("score_e12"))).head().getLong(0)
    }

    val err = 5L * v1.length // floors: pcont + p2 + p3 per summand
    // Seen context: full trigram interpolation.
    val seen = contextSum("a", "b")
    assert(seen <= scale && seen >= scale - err,
      s"seen-context sum $seen not within $err below $scale")
    // Context whose w2 is known but the (w1,w2) pair is not: P2 path.
    val backoff = contextSum("zzz", "b")
    assert(backoff <= scale && backoff >= scale - err,
      s"bigram-backoff sum $backoff not within $err below $scale")
    // Wholly unknown context: pure continuation-unigram path.
    val unseen = contextSum("zzz", "qqq")
    assert(unseen <= scale && unseen >= scale - err,
      s"unseen-context sum $unseen not within $err below $scale")
  }

  test("knMerge: disjoint halves merged == full counts, row for row") {
    val corpus = Seq(
      (1L, "a b c d"), (2L, "b c d e"), (3L, "a b c e"), (4L, "c d e a"))
      .toDF("doc_id", "text")
    val full = TextAnalysis.knCounts(corpus, "text")
      .orderBy("w1", "w2", "w3")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    val merged = TextAnalysis.knMerge(
        TextAnalysis.knCounts(corpus.where(col("doc_id") <= 2), "text"),
        TextAnalysis.knCounts(corpus.where(col("doc_id") > 2), "text"))
      .orderBy("w1", "w2", "w3")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(merged.toSeq === full.toSeq)
  }
}
