package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SubstringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3-gram window over a tiny corpus with a planted shared passage.
  private val corpus = Seq(
    // docs 1 & 2 share the interior run "red green blue cyan" (4 tokens)
    (1L, "aa bb red green blue cyan cc dd"),
    (2L, "xx red green blue cyan yy zz ww"),
    // doc 3 is entirely a copy of doc 4 (whole-doc duplication)
    (3L, "one two three four five"),
    (4L, "one two three four five"),
    // doc 5 shares nothing
    (5L, "totally unique words never repeated anywhere else"),
    // docs 6 & 7: shorter than k, byte-identical -> clamped whole-doc gram
    (6L, "tiny pair"),
    (7L, "tiny pair")
  ).toDF("doc_id", "text")

  private def spans(hashed: Boolean) =
    SubstringDedup.duplicateSpans(corpus, "text", "doc_id", k = 3, hashed = hashed)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet

  test("duplicateSpans: shared runs merge to maximal spans; clamped short docs flag whole-doc") {
    val got = spans(hashed = false)
    // "red green blue cyan" = 2 overlapping shared 3-grams -> one merged span
    assert(got.contains((1L, 3, 6)))
    assert(got.contains((2L, 2, 5)))
    // whole-doc copies: one span covering every token
    assert(got.contains((3L, 1, 5)) && got.contains((4L, 1, 5)))
    // sub-k docs via the clamped gram
    assert(got.contains((6L, 1, 2)) && got.contains((7L, 1, 2)))
    assert(!got.exists(_._1 == 5L), "unique doc must have no span")
  }

  test("duplicateSpans: xxhash64 fingerprint path is span-identical to gram text") {
    assert(spans(hashed = true) === spans(hashed = false))
  }

  test("removeDuplicateSpans: cuts exactly the spans; empty when fully duplicated") {
    val got = SubstringDedup
      .removeDuplicateSpans(corpus, "text", "doc_id", k = 3, hashed = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "aa bb cc dd")
    assert(got(2L) === "xx yy zz ww")
    assert(got(3L) === "" && got(4L) === "")
    assert(got(5L) === "totally unique words never repeated anywhere else")
    assert(got(6L) === "" && got(7L) === "")
    assert(got.size === 7, "every input doc must appear in the output")
  }

  test("removeDuplicateSpans: whitespace-normalizes but preserves token case") {
    val df = Seq((1L, "  Mixed   CASE tokens  "), (2L, "other doc entirely"))
      .toDF("doc_id", "text")
    val got = SubstringDedup
      .removeDuplicateSpans(df, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "Mixed CASE tokens")
  }

  test("noveltyScore: df=1 grams count as novel; hashed path identical") {
    val df = Seq(
      (1L, "aa bb cc dd"),      // shares "aa bb cc" 3-gram run with doc 2
      (2L, "aa bb cc zz"),
      (3L, "qq ww ee rr")       // all grams unique to doc 3
    ).toDF("doc_id", "text")
    def run(h: Boolean) =
      SubstringDedup.noveltyScore(df, "text", "doc_id", k = 3, hashed = h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = run(false)
    // doc 1 grams: "aa bb cc"(shared), "bb cc dd"(novel) -> 2 grams, 1 novel
    assert(got.contains((1L, 2L, 1L)))
    assert(got.contains((2L, 2L, 1L)))
    assert(got.contains((3L, 2L, 2L)), "fully unique doc is all-novel")
    assert(run(true) === got)
  }

  test("minDocs raises the cross-document bar") {
    // run shared by only 2 docs disappears at minDocs = 3
    val got = SubstringDedup
      .duplicateSpans(corpus, "text", "doc_id", k = 3, minDocs = 3)
      .collect()
    assert(got.isEmpty)
  }
}
