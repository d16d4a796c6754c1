package graft.ext

import graft.TestSpark
import graft.functions.{GraftFunctions, Sq8Adc, Sq8Encode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Sq8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sq8Encode: endpoints hit 0/255, reconstruction error bounded by " +
      "half a step, degenerate dims encode 0") {
    val mins = Array(0.0, -1.0, 5.0)
    val maxs = Array(10.0, 1.0, 5.0) // dim 2 degenerate
    val df = Seq(
        (1L, Array(0.0f, -1.0f, 5.0f)),
        (2L, Array(10.0f, 1.0f, 5.0f)),
        (3L, Array(3.3f, 0.2f, 5.0f)))
      .toDF("id", "v")
      .select(col("id"), GraftFunctions.sq8Encode(col("v"), mins, maxs).as("c"))
    val got = df.orderBy("id").collect()
      .map(_.getAs[Array[Byte]]("c").map(_ & 0xFF))
    assert(got(0).toSeq === Seq(0, 0, 0))
    assert(got(1).toSeq === Seq(255, 255, 0))
    // Round-trip error <= step/2 on non-degenerate dims.
    val step0 = 10.0 / 255; val step1 = 2.0 / 255
    assert(math.abs(0.0 + got(2)(0) * step0 - 3.3) <= step0 / 2 + 1e-9)
    assert(math.abs(-1.0 + got(2)(1) * step1 - 0.2) <= step1 / 2 + 1e-9)
  }

  test("sq8Adc equals the explicit reconstruction dot") {
    val mins = Array(0.0, -2.0)
    val maxs = Array(4.0, 2.0)
    val corpus = Seq((1L, Array(1.5f, -0.5f)), (2L, Array(3.9f, 1.9f)))
      .toDF("cid", "cvec")
    val q = Array(0.25f, -0.75f)
    val got = corpus.select(col("cid"),
        GraftFunctions.sq8Adc(
          GraftFunctions.sq8Encode(col("cvec"), mins, maxs),
          typedLit(q), mins, maxs).as("adc"))
      .orderBy("cid").collect().map(_.getDouble(1))
    def expected(v: Array[Float]): Double = {
      var s = 0.0
      for (j <- 0 until 2) {
        val span = maxs(j) - mins(j)
        val code = math.min(255L, math.max(0L,
          Math.round((v(j) - mins(j)) * 255 / span)))
        s += q(j).toDouble * (mins(j) + code.toDouble * (span / 255))
      }
      s
    }
    assert(got(0) === expected(Array(1.5f, -0.5f)))
    assert(got(1) === expected(Array(3.9f, 1.9f)))
  }

  test("sq8TopK: recovers exact nearest neighbours on a well-separated " +
      "corpus and never returns self") {
    // 4 tight clusters around orthogonal-ish directions; nearest
    // neighbours are cluster-mates, far outside quantization error.
    val base = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f), Array(0.0f, 0.0f, 0.0f, 1.0f))
    val rows = for {
      c <- 0 until 4; i <- 0 until 5
    } yield ((c * 5 + i).toLong,
      base(c).zipWithIndex.map { case (x, j) =>
        x + (if (j == (i % 4)) 0.01f * (i + 1) else 0.0f) })
    val corpus = rows.toDF("cid", "cvec")
    val queries = rows.take(4).map { case (id, v) => (id, v) }
      .toDF("qid", "qvec")
    val got = Similarity.sq8TopK(corpus, queries, k = 4, rerank = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // Queries 0..3 all live in cluster 0 (ids 0..4): each query's 4
    // neighbours are exactly its cluster-mates, self excluded.
    for (q <- 0 until 4) {
      val mates = got.filter(_._1 == q.toLong).map(_._2).toSet
      assert(mates === (0L to 4L).toSet - q.toLong)
    }
    // IVF-SQ8 under full probing with a corpus-wide rerank cut reduces
    // to the same exact answer.
    val ivf = Similarity.ivfSq8TopK(corpus, queries, k = 4,
        nlist = 4, nprobe = 4, rerank = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(ivf.map(t => (t._1, t._2)).sorted.toSeq
      === got.map(t => (t._1, t._2)).sorted.toSeq)
  }
}
