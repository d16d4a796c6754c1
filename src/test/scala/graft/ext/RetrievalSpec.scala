package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hybridTopK: RRF fuses hand-computed lexical and dense ranks; " +
      "a doc absent from one list contributes only the other term") {
    val docs = Seq(
      (1L, "apple banana"), (2L, "cherry"), (3L, "apple apple"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(0.6f, 0.8f)))
      .toDF("cid", "cvec")
    val qv = Seq((99L, Array(0f, 1f))).toDF("qid", "qvec")
    // Lexical (query "apple"): doc3 tf=2 beats doc1 tf=1 (same dl);
    // doc2 has no hit. Dense (kDense=2): doc2 cos=1.0 rank 1, doc3
    // cos=0.8 rank 2; doc1 cos=0 excluded by the cut.
    val got = Similarity.hybridTopK(docs, "text", "doc_id",
        termQuery = Seq("apple"), corpus = corpus, queryVec = qv,
        k = 3, kLex = 10, kDense = 2, rrfK = 0L, scale = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      (3L, 150L, Some(1L), Some(2L)), // 100/1 + 100/2
      (2L, 100L, None, Some(1L)),     // dense only
      (1L, 50L, Some(2L), None)))     // lexical only
  }

  test("hybridTopK: k truncates the fused list by (rrf desc, id)") {
    val docs = Seq((1L, "x y z"), (2L, "x x q"), (3L, "p q r"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f)))
      .toDF("cid", "cvec")
    val qv = Seq((7L, Array(1f, 0f))).toDF("qid", "qvec")
    val got = Similarity.hybridTopK(docs, "text", "doc_id",
      termQuery = Seq("x"), corpus = corpus, queryVec = qv,
      k = 1, kLex = 10, kDense = 3)
    assert(got.count() === 1L)
  }

  test("perplexityBuckets: ntile tiers per language follow the exact " +
      "score order; sub-trigram docs drop out") {
    // Language en: four docs sharing trigram mass unevenly; doc 5 has
    // only two tokens (no trigram) and must vanish. Language fr: one
    // doc, which lands alone in bucket 1.
    val docs = Seq(
      (1L, "a b c a b c a b c", "en"), // repeats the corpus-dominant trigram
      (2L, "a b c d e f", "en"),
      (3L, "d e f d e f", "en"),
      (4L, "g h i j k l", "en"),
      (5L, "a b", "en"),
      (6L, "a b c", "fr"))
      .toDF("doc_id", "text", "lang")
    val tri = TextAnalysis.knCounts(docs, "text")
    val got = Curation.perplexityBuckets(docs, "text", "doc_id",
        col("lang"), tri, nBuckets = 2, minCount = 1L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(!got.map(_._1).contains(5L))
    val en = got.filter(_._2 == "en")
    assert(en.length === 4)
    // ntile(2) over 4 rows: two per tier, and the tier-1 pair must be
    // the two highest scores (desc order, doc_id tiebreak).
    val byScore = en.sortBy(t => (-t._3, t._1))
    assert(byScore.take(2).forall(_._4 == 1L))
    assert(byScore.drop(2).forall(_._4 == 2L))
    val fr = got.filter(_._2 == "fr")
    assert(fr.map(t => (t._1, t._4)).toSeq === Seq((6L, 1L)))
  }

  test("recallReport: hand-computed hits, a fully-missed query reports " +
      "recall 0, extra approx rows outside exact never inflate recall") {
    // exact: q1 -> {10,11,12}; q2 -> {20,21}
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "corpus_id")
    // approx: q1 hits 2 of 3 (+1 stray id never in exact); q2 misses all.
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 77L))
      .toDF("query_id", "corpus_id")
    val got = Similarity.recallReport(approx, exact)
      .orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 3L, 2L, 666666L), // 2*1e6 div 3 floors
      (2L, 2L, 0L, 0L)))
  }

  test("bm25 stats sidecar: serve from merged one-row increments equals " +
      "the legacy full-postings-aggregate serve, bit for bit") {
    val docs = Seq(
      (1L, "spark joins data"), (2L, "spark spark shuffle"),
      (3L, "hash join hash"), (4L, "unrelated words entirely"),
      (5L, "   "), // zero tokens: must not count toward n_docs
      (6L, "spark hash join spark"))
      .toDF("doc_id", "text")
    val lo = docs.where(col("doc_id") <= 3)
    val hi = docs.where(col("doc_id") > 3)
    val ix = TextAnalysis.bm25Index(lo, "text", "doc_id")
      .unionAll(TextAnalysis.bm25Index(hi, "text", "doc_id"))
    val stats = TextAnalysis.bm25Stats(lo, "text", "doc_id")
      .unionAll(TextAnalysis.bm25Stats(hi, "text", "doc_id"))
    // the sidecar sums to the whole-corpus scalars
    val s = stats.agg(sum("n_docs"), sum("n_toks")).head
    assert((s.getLong(0), s.getLong(1)) === (5L, 16L))
    val legacy = TextAnalysis.bm25SearchIndex(ix, "doc_id",
        Seq("spark", "hash"), k = 10)
      .collect().map(_.toSeq).toSeq
    val sidecar = TextAnalysis.bm25SearchIndex(ix, "doc_id",
        Seq("spark", "hash"), k = 10, stats = stats)
      .collect().map(_.toSeq).toSeq
    assert(legacy === sidecar && legacy.nonEmpty)
  }
}
