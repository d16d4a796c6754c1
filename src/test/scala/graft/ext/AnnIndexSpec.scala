package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(16)(r.nextFloat() - 0.5f)
  }

  test("AnnIndex: build persists, serve replays identically across calls, " +
      "append serves the union without touching existing rows") {
    val root = java.nio.file.Files.createTempDirectory("graft_annidx_")
      .resolve("idx").toString
    val corpus = (0L until 200L).map(i => (i, vec(i.toInt))).toDF("cid", "cvec")
    val queries = (0L until 3L).map(i => (i, vec(i.toInt))).toDF("qid", "qvec")

    AnnIndex.buildIvfPq(corpus.where($"cid" < 150), dim = 16, nlist = 8,
      root = root, m = 4, codes = 8)
    val r1 = AnnIndex.queryIvfPq(spark, root, queries, k = 3, nprobe = 3,
      rerank = 10).orderBy("query_id", "rank").collect()
    assert(r1.length === 9, "k rows per query at realistic pruning")
    // the point of persistence: a second serve re-reads the same index
    // and must replay bit-identically (no re-sampling, no re-encode)
    val r2 = AnnIndex.queryIvfPq(spark, root, queries, k = 3, nprobe = 3,
      rerank = 10).orderBy("query_id", "rank").collect()
    assert(r1.toSeq === r2.toSeq)

    val filesBefore = spark.read.parquet(s"$root/encoded.parquet")
      .inputFiles.toSet
    AnnIndex.appendIvfPq(spark, root, corpus.where($"cid" >= 150))
    val filesAfter = spark.read.parquet(s"$root/encoded.parquet")
      .inputFiles.toSet
    assert(filesBefore.subsetOf(filesAfter),
      "append must not rewrite existing index files")
    assert(spark.read.parquet(s"$root/encoded.parquet").count() === 200)

    // full probing + corpus-wide rerank over the appended index = exact
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect()
    val served = AnnIndex.queryIvfPq(spark, root, queries, k = 3,
        nprobe = 8, rerank = 200)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect()
    assert(served.toSeq === exact.toSeq)
  }
}
