package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact decremental unlearning for the additive count models
  * (TextAnalysis.knRemove / nbRemove / nbRemoveFromModel): subtracting
  * the removed documents' counts must equal retraining on the remaining
  * corpus BIT-FOR-BIT — including the second-order effects (a zeroed
  * token leaves the vocabulary and shrinks V; a zeroed label leaves the
  * decision; continuation statistics re-derive from the reduced frame).
  */
class UnlearnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog today"),
    (2L, "en", "a quick hash join beats a slow sort merge join"),
    (3L, "fr", "le renard brun rapide saute par dessus le chien"),
    (4L, "fr", "unique gaulois phrase avec des mots singuliers ici"),
    (5L, "en", "the lazy dog sleeps while the quick fox runs"),
    (6L, "de", "der schnelle braune fuchs springt heute wieder hoch"))
    .toDF("doc_id", "lang", "text")

  test("knRemove == knCounts over the remaining corpus, exactly") {
    val removed = docs.where($"doc_id" % 2 === 0)
    val remaining = docs.where($"doc_id" % 2 =!= 0)
    val got = TextAnalysis.knRemove(
        TextAnalysis.knCounts(docs, "text"), removed, "text")
      .orderBy("w1", "w2", "w3").collect().toSeq
    val want = TextAnalysis.knCounts(remaining, "text")
      .orderBy("w1", "w2", "w3").collect().toSeq
    assert(want.nonEmpty && got === want)
    // scoring through the unlearned model == scoring through a fresh one
    val a = TextAnalysis.knScoreModel(remaining, "text", "doc_id",
        TextAnalysis.knRemove(TextAnalysis.knCounts(docs, "text"),
          removed, "text"))
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.knScoreModel(remaining, "text", "doc_id",
        TextAnalysis.knCounts(remaining, "text"))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("nbRemove: zeroed tokens leave the vocabulary, a fully-removed " +
      "label leaves the decision") {
    // removing BOTH fr docs zeroes the whole fr label
    val removed = docs.where($"lang" === "fr")
    val remaining = docs.where($"lang" =!= "fr")
    val (gt, gc) = TextAnalysis.nbRemove(
      TextAnalysis.nbCounts(docs, "text", "lang"), removed, "text", "lang")
    val (wt, wc) = TextAnalysis.nbCounts(remaining, "text", "lang")
    assert(gt.orderBy("label", "w").collect().toSeq ===
      wt.orderBy("label", "w").collect().toSeq)
    assert(gc.orderBy("label").collect().toSeq ===
      wc.orderBy("label").collect().toSeq)
    assert(gc.where($"label" === "fr").count() === 0,
      "a label with no remaining tokens disappears")
    assert(gt.where($"w" === "gaulois").count() === 0,
      "a token only the removed docs held leaves the vocabulary")
  }

  test("nbRemoveFromModel: the swapped persisted model classifies " +
      "exactly like one freshly trained on the remaining corpus, and " +
      "the meta sidecar tracks the shrunk model") {
    val removed = docs.where($"doc_id" % 2 === 0)
    val remaining = docs.where($"doc_id" % 2 =!= 0)
    val root = java.nio.file.Files.createTempDirectory("graft_unlearn_")
      .resolve("nb").toString
    val (tok, cls) = TextAnalysis.nbCounts(docs, "text", "lang")
    TextAnalysis.nbSaveModel(root, tok, cls)
    val metaBefore = spark.read.parquet(s"$root/meta.parquet")
      .head.getLong(0)
    TextAnalysis.nbRemoveFromModel(spark, root, removed, "text", "lang")

    val freshRoot = java.nio.file.Files
      .createTempDirectory("graft_unlearn_fresh_").resolve("nb").toString
    val (ft, fc) = TextAnalysis.nbCounts(remaining, "text", "lang")
    TextAnalysis.nbSaveModel(freshRoot, ft, fc)

    def served(r: String) = TextAnalysis.nbClassifyFromModel(spark, r,
      remaining, "text", "doc_id").orderBy("doc_id").collect().toSeq
    assert(served(root) === served(freshRoot))
    assert(spark.read.parquet(s"$root/tok.parquet")
        .orderBy("label", "w").collect().toSeq ===
      spark.read.parquet(s"$freshRoot/tok.parquet")
        .orderBy("label", "w").collect().toSeq,
      "persisted token counts == fresh model's")
    val metaAfter = spark.read.parquet(s"$root/meta.parquet").head
    assert(metaAfter.getLong(0) < metaBefore,
      "meta re-derived: the size estimate shrank with the model")
    assert(metaAfter.getLong(0) ===
      spark.read.parquet(s"$freshRoot/meta.parquet").head.getLong(0))
  }
}
