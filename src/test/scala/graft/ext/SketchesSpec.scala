package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HLL: union of hourly sketches reproduces the direct sketch exactly") {
    // Lossless mergeability is the 100 TB contract: rolling up per-hour
    // sketch state must yield the SAME registers (hence same estimate)
    // as sketching the coarser group directly, not merely a close one.
    val ev = graft.Tables.events(spark, TestSpark.sf0001)
    val direct = Sketches
      .distinctSketches(ev, Seq(col("event_type")), col("user_id"))
      .select(col("event_type"), Sketches.estimate(col("nd_sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = Sketches.mergeSketches(
        Sketches.distinctSketches(ev,
          Seq(col("event_type"), date_trunc("hour", col("ts")).as("h")),
          col("user_id")),
        Seq(col("event_type")))
      .select(col("event_type"), Sketches.estimate(col("nd_sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct.nonEmpty && merged === direct)
  }

  test("HLL: estimate lands within 5% of a known cardinality") {
    val df = (1L to 50000L).map(i => i % 9973).toDF("k") // 9973 distinct
    val est = Sketches.distinctSketches(df, Seq(lit(1).as("g")), col("k"))
      .select(Sketches.estimate(col("nd_sketch"))).head.getLong(0)
    assert(math.abs(est - 9973L) <= 9973L * 5 / 100, s"estimate $est")
  }

  test("approxQuantiles: rank bound holds against the true order statistics") {
    val n = 10000
    val df = scala.util.Random.shuffle((1 to n).toList).toDF("v")
    val rows = Sketches.approxQuantiles(df, col("v"), Seq(0.5, 0.9), accuracy = 1000)
      .collect().map(r => r.getDouble(0) -> r.getAs[Number](1).doubleValue).toMap
    // values are exactly 1..n, so value == rank; error <= n/accuracy = 10
    assert(math.abs(rows(0.5) - 0.5 * n) <= 10.0)
    assert(math.abs(rows(0.9) - 0.9 * n) <= 10.0)
  }

  test("cmsEstimates: never undercounts, overcount bounded by eps*N") {
    val df = (Seq.fill(5000)("hot") ++ (1 to 2000).map(i => s"k${i % 200}"))
      .toDF("key")
    val exact = df.groupBy("key").agg(count(lit(1)).as("n_exact"))
    val n = df.count()
    val got = Sketches.cmsEstimates(df, col("key"), exact, eps = 0.005)
      .collect().map(r => (r.getAs[Long]("n_exact"), r.getAs[Long]("approx_count")))
    assert(got.nonEmpty)
    got.foreach { case (ex, ap) =>
      assert(ap >= ex, s"undercount: $ap < $ex")
      assert(ap <= ex + (0.005 * n).toLong + 1, s"overcount: $ap vs $ex")
    }
  }

  test("approxTopK: exact when distinct <= maxItemsTracked; true heavy hitter survives eviction") {
    val df = (Seq.fill(900)("hot") ++ (1 to 300).map(i => s"k${i % 100}")).toDF("key")
    val got = Sketches.approxTopK(df, "key", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.head === (("hot", 900L)))
    // tracked capacity far below distinct count: the dominant item must
    // still surface first (the frequent-items guarantee)
    val evicted = Sketches.approxTopK(df, "key", 1, maxItemsTracked = 8)
      .collect().map(_.getString(0))
    assert(evicted.head === "hot")
  }

  test("cmsEstimates: null candidate keys estimate to null; key column is a param") {
    val df = Seq("a", "a", "b").toDF("key")
    val cands = Seq(Some("a"), None).toDF("term")
    val got = Sketches.cmsEstimates(df, col("key"), cands, candidateKey = col("term"))
      .collect().map(r => Option(r.getString(0)) -> Option(r.get(1))).toMap
    assert(got(Some("a")) === Some(2L))
    assert(got(None) === None, "null key must not NPE and must score null")
  }

  test("distinctIntersection: inclusion-exclusion tracks exact overlap") {
    import spark.implicits._
    // A = 1..1000, B = 501..1500 -> exact intersection 500, union 1500
    val a = (1L to 1000L).toDF("k")
    val b = (501L to 1500L).toDF("k")
    val r = Sketches.distinctIntersection(a, col("k"), b, col("k"))
      .collect().head
    val est = r.getAs[Long]("est_intersection").toDouble
    assert(math.abs(est - 500.0) <= 1500 * 0.05,
      s"est $est outside 5%-of-union of exact 500")
    // disjoint sets: estimate collapses toward zero
    val d = Sketches.distinctIntersection(
        (1L to 500L).toDF("k"), col("k"),
        (10001L to 10500L).toDF("k"), col("k"))
      .collect().head.getAs[Long]("est_intersection").toDouble
    assert(math.abs(d) <= 1000 * 0.05, s"disjoint estimate $d not near zero")
  }
}
