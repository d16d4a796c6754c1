package graft

import graft.queries.QueryDef
import org.scalatest.funsuite.AnyFunSuite

/** The concurrent-sweep retry contract of [[Verify.runSweep]]: a pooled
  * failure costs one serial retry, and the retry is VISIBLE in the round
  * artifacts — `verify_retries.json` lists exactly the retried gates, so
  * a retried-then-green gate (name in the file + parquet present) is
  * distinguishable from first-pass green (absent from the file) and from
  * retried-and-still-failed (name in the file, no parquet). */
class VerifySweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def smallDf(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq((1L, "ok")).toDF("id", "v")
  }

  test("runSweep records retried gates in verify_retries.json; " +
      "first-pass-green gates never appear") {
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_verify_retry_").toString
    val flakyCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    val defs = Seq(
      QueryDef("zz_clean", (s, _) => smallDf(s), None),
      QueryDef("zz_flaky", (s, _) => {
        if (flakyCalls.getAndIncrement() == 0)
          sys.error("injected first-attempt flake")
        smallDf(s)
      }, None),
      QueryDef("zz_permafail", (_, _) =>
        sys.error("injected permanent failure"), None))

    val retried = Verify.runSweep(spark, "/unused", outDir, defs, par = 2)

    assert(retried.toSet === Set("zz_flaky", "zz_permafail"))
    val json = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$outDir/verify_retries.json")).get(0)
    assert(json.contains("\"zz_flaky\"") &&
      json.contains("\"zz_permafail\""))
    assert(!json.contains("zz_clean"),
      "a first-pass-green gate must not be listed as retried")
    // retried-then-green: parquet present; retried-and-failed: absent
    assert(spark.read.parquet(s"$outDir/zz_flaky").count() === 1)
    assert(spark.read.parquet(s"$outDir/zz_clean").count() === 1)
    assert(!new java.io.File(s"$outDir/zz_permafail").exists())
  }

  test("runSweep with par=1 (sequential) writes an empty retry list") {
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_verify_seq_").toString
    val retried = Verify.runSweep(spark, "/unused", outDir,
      Seq(QueryDef("zz_seq", (s, _) => smallDf(s), None)), par = 1)
    assert(retried.isEmpty)
    assert(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$outDir/verify_retries.json"))
      .get(0) === "[]")
  }
}
