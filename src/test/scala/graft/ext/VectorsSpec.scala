package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("groupCentroids: exact means, 0-based dims, counts") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f)),
      ("a", Array(3.0f, 4.0f)),
      ("b", Array(10.0f, 0.0f))
    ).toDF("g", "v")
    val got = Vectors.groupCentroids(df, "g", "v")
      .orderBy("g", "dim")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got === Seq(
      ("a", 0L, 2L, 2.0), ("a", 1L, 2L, 3.0),
      ("b", 0L, 1L, 10.0), ("b", 1L, 1L, 0.0)))
  }

  test("groupCentroids: rejects a group column colliding with output/scratch names") {
    val df = Seq(("a", Array(1.0f))).toDF("dim", "v")
    val e = intercept[IllegalArgumentException] {
      Vectors.groupCentroids(df, "dim", "v")
    }
    assert(e.getMessage.contains("collides"))
  }

  test("groupCentroids: non-finite embedding values raise instead of corrupting sums") {
    val df = Seq(("a", Array(1.0f, Float.NaN))).toDF("g", "v")
    val e = intercept[Exception] {
      Vectors.groupCentroids(df, "g", "v").collect()
    }
    assert(e.getMessage.contains("non-finite") ||
      Option(e.getCause).exists(_.getMessage.contains("non-finite")))
    val inf = Seq(("a", Array(Float.PositiveInfinity))).toDF("g", "v")
    assertThrows[Exception] {
      Vectors.groupCentroids(inf, "g", "v").collect()
    }
  }

  test("l2Normalize: unit norm, zero vector stays zeros, null vector stays null") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, null.asInstanceOf[Array[Float]])
    ).toDF("id", "v")
    val got = df.select(col("id"), Vectors.l2Normalize(col("v")).as("nv"))
      .orderBy("id").collect()
    val v1 = got(0).getSeq[Float](1)
    assert(math.abs(v1(0) - 0.6f) < 1e-6 && math.abs(v1(1) - 0.8f) < 1e-6)
    assert(got(1).getSeq[Float](1) === Seq(0.0f, 0.0f))
    assert(got(2).isNullAt(1))
  }
}
