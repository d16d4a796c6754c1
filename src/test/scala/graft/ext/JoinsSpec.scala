package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import java.sql.Timestamp

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("asofBackward: latest preceding match per key, inclusive at equal ts") {
    val quotes = Seq(
      (7L, ts(0), 100.0), (7L, ts(10), 101.0), (7L, ts(30), 99.0),
      (8L, ts(5), 50.0))
      .toDF("uid", "qts", "px")
    val trades = Seq(
      (7L, ts(10), 1L),  // equal ts -> inclusive: px 101
      (7L, ts(29), 2L),  // px 101 (ts(30) is after)
      (7L, ts(31), 3L),  // px 99
      (8L, ts(4), 4L),   // before any quote -> null
      (9L, ts(1), 5L))   // key with no quotes -> null
      .toDF("uid", "tts", "tid")
    val got = Joins.asofBackward(
      trades, quotes, keys = Seq("uid"), leftTs = "tts", rightTs = "qts")
      .select($"tid", $"asof_match.px".as("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      1L -> Some(101.0), 2L -> Some(101.0), 3L -> Some(99.0),
      4L -> None, 5L -> None))
  }

  test("asofBackward: tolerance nulls out matches farther back") {
    val right = Seq((1L, ts(0), "old")).toDF("k", "rts", "tag")
    val left = Seq((1L, ts(5), 10L), (1L, ts(90), 11L)).toDF("k", "lts", "id")
    val got = Joins.asofBackward(
      left, right, Seq("k"), "lts", "rts",
      tolerance = Some(expr("INTERVAL 30 MINUTES")))
      .select($"id", $"asof_match.tag".as("tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(10L -> Some("old"), 11L -> None))
  }

  test("asofBackward: equal-ts right rows resolve by tiebreak, latest wins") {
    val right = Seq((1L, ts(0), 1L, "a"), (1L, ts(0), 2L, "b"))
      .toDF("k", "rts", "rid", "tag")
    val left = Seq((1L, ts(1), 10L)).toDF("k", "lts", "id")
    val got = Joins.asofBackward(
      left, right, Seq("k"), "lts", "rts", tiebreak = Seq("rid"))
      .select($"asof_match.tag").collect()(0).getString(0)
    assert(got === "b")
  }

  test("asofForward: earliest following match per key, inclusive at equal ts, tolerance bounds ahead") {
    val quotes = Seq(
      (7L, ts(0), 100.0), (7L, ts(10), 101.0), (7L, ts(30), 99.0),
      (8L, ts(5), 50.0))
      .toDF("uid", "qts", "px")
    val trades = Seq(
      (7L, ts(10), 1L),  // equal ts -> inclusive: px 101
      (7L, ts(11), 2L),  // next ahead is ts(30): px 99
      (7L, ts(31), 3L),  // nothing ahead -> null
      (8L, ts(4), 4L),   // px 50 at ts(5)
      (9L, ts(1), 5L))   // key with no quotes -> null
      .toDF("uid", "tts", "tid")
    val got = Joins.asofForward(
      trades, quotes, keys = Seq("uid"), leftTs = "tts", rightTs = "qts")
      .select($"tid", $"asof_match.px".as("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      1L -> Some(101.0), 2L -> Some(99.0), 3L -> None,
      4L -> Some(50.0), 5L -> None))

    val bounded = Joins.asofForward(
      trades, quotes, Seq("uid"), "tts", "qts",
      tolerance = Some(expr("INTERVAL 5 MINUTES")))
      .select($"tid", $"asof_match.px".as("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(bounded(2L) === None, "ts(30) is 19min ahead of ts(11): over tolerance")
    assert(bounded(4L) === Some(50.0), "1min ahead: within tolerance")
  }

  test("asofNearest: closest match either side; backward wins exact ties") {
    val quotes = Seq(
      (7L, ts(0), 100.0), (7L, ts(20), 101.0), (8L, ts(50), 50.0))
      .toDF("uid", "qts", "px")
    val trades = Seq(
      (7L, ts(4), 1L),   // 4min back vs 16min fwd -> 100
      (7L, ts(15), 2L),  // 15min back vs 5min fwd -> 101
      (7L, ts(10), 3L),  // exact tie 10min both ways -> backward: 100
      (8L, ts(1), 4L),   // only forward exists -> 50
      (7L, ts(40), 5L))  // only backward in range -> 101
      .toDF("uid", "tts", "tid")
    val got = Joins.asofNearest(
      trades, quotes, keys = Seq("uid"), leftTs = "tts", rightTs = "qts")
      .select($"tid", $"asof_match.px".as("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      1L -> Some(100.0), 2L -> Some(101.0), 3L -> Some(100.0),
      4L -> Some(50.0), 5L -> Some(101.0)))
  }

  test("rangeJoin: equals the naive theta join, inclusive at both bounds") {
    val rnd = new scala.util.Random(5)
    val points = (1L to 400L).map(i => (i % 7, i, rnd.nextInt(10000).toLong))
      .toDF("k", "pid", "t")
    val ivs = (1L to 120L).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i % 7, i, lo, lo + 200L + rnd.nextInt(400))
    }.toDF("k", "iid", "lo", "hi")
    // planted exact-boundary hits: point AT lo and AT hi must match
    val p2 = points.union(Seq((6L, 9001L, 500L), (6L, 9002L, 700L)).toDF("k", "pid", "t"))
    val iv2 = ivs.union(Seq((6L, 8001L, 500L, 700L)).toDF("k", "iid", "lo", "hi"))
    val naive = p2.as("p").join(iv2.as("i"),
        col("p.k") === col("i.k") && col("t") >= col("lo") && col("t") <= col("hi"))
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Joins.rangeJoin(p2, iv2, "t", "lo", "hi",
        bucketWidth = 256L, keys = Seq("k"))
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive)
    assert(bucketed.contains((9001L, 8001L)) && bucketed.contains((9002L, 8001L)))
  }

  test("rangeJoin: malformed intervals (hi < lo) are dropped, not exploded") {
    val p = Seq((1L, 10L)).toDF("pid", "t")
    val iv = Seq((1L, 100L, 0L)).toDF("iid", "lo", "hi") // hi < lo
    assert(Joins.rangeJoin(p, iv, "t", "lo", "hi", bucketWidth = 10L).count() === 0)
  }

  test("bandJoin: equals the brute-force theta join incl. bucket edges and negatives") {
    val l = Seq((1L, 0L), (2L, 49L), (3L, 50L), (4L, 51L), (5L, -75L), (6L, 1000L))
      .toDF("lid", "lv")
    val r = Seq((10L, 50L), (11L, -25L), (12L, 99L), (13L, 2000L))
      .toDF("rid", "rv")
    val got = Joins.bandJoin(l, r, "lv", "rv", tol = 50L)
      .select("lid", "rid").collect()
      .map(rr => (rr.getLong(0), rr.getLong(1))).toSet
    val brute = (for {
      (lid, lv) <- Seq((1L, 0L), (2L, 49L), (3L, 50L), (4L, 51L), (5L, -75L), (6L, 1000L))
      (rid, rv) <- Seq((10L, 50L), (11L, -25L), (12L, 99L), (13L, 2000L))
      if math.abs(lv - rv) <= 50
    } yield (lid, rid)).toSet
    assert(got === brute)
  }

  test("bandJoin plan: bucket equi-join, never a nested-loop/cartesian") {
    val l = Seq((1L, 0L)).toDF("lid", "lv")
    val r = Seq((10L, 50L)).toDF("rid", "rv")
    val plan = Joins.bandJoin(l, r, "lv", "rv", tol = 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("intervalJoin: equals the brute-force overlap join, each pair " +
      "emitted exactly once across shared buckets") {
    // Spans straddle bucket boundaries (width 10), nest, touch at a
    // single point, and miss by one; a long interval covers many buckets.
    val li = Seq((1L, 0L, 9L), (2L, 5L, 25L), (3L, 30L, 30L),
      (4L, 100L, 160L), (5L, 41L, 40L)) // 5: degenerate, dropped
    val ri = Seq((10L, 9L, 12L), (11L, 26L, 30L), (12L, 0L, 200L),
      (13L, 31L, 35L))
    val l = li.toDF("lid", "ls", "le")
    val r = ri.toDF("rid", "rs", "re")
    val got = Joins.intervalJoin(l, r, "ls", "le", "rs", "re",
        bucketWidth = 10L)
      .select("lid", "rid").collect()
      .map(rr => (rr.getLong(0), rr.getLong(1)))
    val brute = (for {
      (lid, ls, le) <- li if le >= ls
      (rid, rs, re) <- ri
      if ls <= re && rs <= le
    } yield (lid, rid)).toSet
    assert(got.toSet === brute)
    assert(got.length === brute.size, "a pair was emitted more than once")
  }

  test("intervalJoin plan: bucket equi-join, never a nested-loop/cartesian") {
    val l = Seq((1L, 0L, 9L)).toDF("lid", "ls", "le")
    val r = Seq((10L, 5L, 12L)).toDF("rid", "rs", "re")
    val plan = Joins.intervalJoin(l, r, "ls", "le", "rs", "re", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
