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

  test("BpeMergePair: non-overlapping left-to-right (a,a over [a,a,a])") {
    val got = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(GraftFunctions.bpeMergePair(col("syms"), "a", "a").as("m"))
      .head.getSeq[String](0)
    assert(got === Seq("aa", "a"))
  }
}
