package graft.queries

import graft.{Tables, TestSpark}
import graft.ext.Decontam
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The d21/d22/st33 gates run the HASHED contamination probes
  * (contaminationReportHashed / contaminationCurveHashed — the
  * SCALEPROBE_r14 5-6× win), so the published exact-contract STRING
  * operators would otherwise be exercised only on tiny unit fixtures.
  * This spec pins string == hashed on the d21/d22 GATE corpus itself:
  * a regression in either path — or an xxhash64 collision profile
  * change — is a row diff here before it could hide behind the gates'
  * swap. */
class ContaminationParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def bench(d: String) =
    Tables.documents(spark, d).where(col("doc_id") % 20 === 0)
      .select(when(col("doc_id") % 40 === 0, lit("evalA"))
        .otherwise(lit("evalB")).as("eval_set"), col("text"))

  test("contaminationReportHashed == contaminationReport on the d21 " +
      "gate corpus") {
    val d = TestSpark.sf0001
    val corpus = HygieneQueries.decontamCorpus(spark, d)
    val strings = Decontam.contaminationReport(corpus, "text", "doc_id",
        bench(d), "text", "eval_set", n = 8)
      .orderBy("eval_set").collect().toSeq
    val hashed = Decontam.contaminationReportHashed(corpus, "text",
        "doc_id", bench(d), "text", "eval_set", n = 8)
      .orderBy("eval_set").collect().toSeq
    assert(strings.nonEmpty && hashed === strings)
  }

  test("contaminationCurveHashed == contaminationCurve on the d22 " +
      "gate corpus") {
    val d = TestSpark.sf0001
    val corpus = HygieneQueries.decontamCorpus(spark, d)
    val ns = Seq(4, 8, 13)
    val strings = Decontam.contaminationCurve(corpus, "text", "doc_id",
        bench(d), "text", "eval_set", ns)
      .orderBy("eval_set", "n").collect().toSeq
    val hashed = Decontam.contaminationCurveHashed(corpus, "text",
        "doc_id", bench(d), "text", "eval_set", ns)
      .orderBy("eval_set", "n").collect().toSeq
    assert(strings.nonEmpty && hashed === strings)
  }
}
