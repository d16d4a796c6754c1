package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, 700L), (2L, 700L), (3L, 100L), (4L, 0L), (5L, 2500L), (6L, 48L)
  ).toDF("doc_id", "toks")

  test("packConcat: offsets are the exact prefix sum; straddling docs span sequences") {
    val got = Packing.packConcat(docs, "doc_id", col("toks"), seqLen = 1024)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 700L, 0L, 0L, 0L),       // [0, 700)    in seq 0
      (2L, 700L, 700L, 0L, 1L),     // [700, 1400) straddles the 1024 cut
      (3L, 100L, 1400L, 1L, 1L),
      // doc 4 (zero tokens) occupies no positions and is dropped
      (5L, 2500L, 1500L, 1L, 3L),   // spans seqs 1,2,3
      (6L, 48L, 4000L, 3L, 3L)))
    assert(Packing.sequenceCount(
      Packing.packConcat(docs, "doc_id", col("toks"), 1024), 1024) === 4L)
  }

  test("packConcat: result is independent of input partitioning AND of numPartitions") {
    def run(df: org.apache.spark.sql.DataFrame, nPart: Int) =
      Packing.packConcat(df, "doc_id", col("toks"), 1024, numPartitions = nPart)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val a = run(docs.repartition(7), 2)
    val b = run(docs.repartition(1), 5)
    val c = run(docs.coalesce(1), 3)
    assert(a === b && b === c)
  }

  test("packConcat plan: no global single-task window — the window is per-partition") {
    val plan = Packing.packConcat(docs, "doc_id", col("toks"), 1024)
      .queryExecution.executedPlan.toString
    // a Window with an empty partition spec would run in one task; ours
    // must partition by the physical partition id
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("__pid")),
      s"window must be keyed by __pid\n$plan")
  }

  test("shardByTokens: contiguous budget windows, straddlers go to their " +
      "first token's shard, manifest is exact") {
    val got = Packing.shardByTokens(docs, "doc_id", col("toks"), shardTokens = 1000)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("shard_id")))
    // offsets: 0, 700, 1400, (dropped), 1500, 4000
    assert(got.toSeq === Seq((1L, 0L), (2L, 0L), (3L, 1L), (5L, 1L), (6L, 4L)))

    val manifest = Packing.shardManifest(
        Packing.shardByTokens(docs, "doc_id", col("toks"), 1000))
      .orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(manifest.toSeq === Seq((0L, 2L, 1400L), (1L, 2L, 2600L), (4L, 1L, 48L)))

    // Layout independence.
    def run(nPart: Int) =
      Packing.shardByTokens(docs.repartition(nPart), "doc_id", col("toks"),
        1000).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run(7) === run(1))
  }

  test("Profile.describe: one row per column with exact stats") {
    val df = Seq(
      (Some(1L), Some("a"), Some(1.5)),
      (Some(2L), None, Some(-2.5)),
      (Some(2L), Some("c"), None)
    ).toDF("k", "s", "v")
    val got = Profile.describe(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("k").getAs[Long]("n") === 3L)
    assert(got("k").getAs[Long]("n_nulls") === 0L)
    assert(got("k").getAs[Long]("n_distinct") === 2L)
    assert(got("k").getAs[Double]("min_num") === 1.0)
    assert(got("k").getAs[Double]("max_num") === 2.0)
    assert(got("s").getAs[Long]("n_nulls") === 1L)
    assert(got("s").getAs[String]("min_str") === "a")
    assert(got("s").getAs[String]("max_str") === "c")
    assert(got("v").getAs[Long]("n_nulls") === 1L)
    assert(got("v").getAs[Double]("min_num") === -2.5)
    assert(got("v").getAs[Double]("max_num") === 1.5)
    assert(got("v").isNullAt(got("v").fieldIndex("min_str")))
  }
}
