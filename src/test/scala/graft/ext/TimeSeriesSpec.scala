package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("resampleFill: gaps filled with carried value, n_obs=0 on gap rows") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10.0, 1L),
      (1L, ts("2024-01-01 00:50:00"), 20.0, 2L), // same hour, later => wins
      (1L, ts("2024-01-01 03:05:00"), 30.0, 3L), // 2-hour gap before
      (2L, ts("2024-01-01 05:00:00"), 99.0, 4L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleFill(df, Seq("user_id"), "ts", "value",
        "hour", expr("INTERVAL 1 HOUR"), tiebreak = Seq("event_id"))
      .orderBy("user_id", "bucket")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3)))
    assert(out === Seq(
      (1L, "2024-01-01 00:00:00.0", 2L, 20.0), // in-hour last obs wins
      (1L, "2024-01-01 01:00:00.0", 0L, 20.0), // gap: carried
      (1L, "2024-01-01 02:00:00.0", 0L, 20.0), // gap: carried
      (1L, "2024-01-01 03:00:00.0", 1L, 30.0),
      (2L, "2024-01-01 05:00:00.0", 1L, 99.0))) // span is per-key
  }

  test("resampleFill: within-bucket ties on ts resolve by tiebreak order") {
    val t = ts("2024-01-01 00:00:00")
    val df = Seq((1L, t, 1.0, 5L), (1L, t, 2.0, 9L), (1L, t, 3.0, 7L))
      .toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleFill(df, Seq("user_id"), "ts", "value",
        "hour", expr("INTERVAL 1 HOUR"), tiebreak = Seq("event_id"))
      .collect()
    assert(out.length == 1 && out(0).getDouble(3) == 2.0) // event_id 9 wins
  }

  test("resampleFill plan: no cartesian/nested-loop; grid join is equi") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1.0, 1L))
      .toDF("user_id", "ts", "value", "event_id")
    val plan = TimeSeries.resampleFill(df, Seq("user_id"), "ts", "value",
      "hour", expr("INTERVAL 1 HOUR")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("fuzzyJoin: finds pairs within maxDist, blocked by key") {
    val l = Seq((1L, "kitten", 1), (2L, "saturday", 1), (3L, "kitten", 2))
      .toDF("lid", "lname", "lblock")
    val r = Seq((10L, "sitting", 1), (20L, "sunday", 1), (30L, "sitting", 9))
      .toDF("rid", "rname", "rblock")
    val out = Joins.fuzzyJoin(l, r, "lname", "rname", maxDist = 3,
        blockKeys = Seq("lblock" -> "rblock"))
      .select("lid", "rid", "edit_dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // kitten→sitting = 3 edits; saturday→sunday = 3; cross-block pair
    // (3,30) excluded even though the names match.
    assert(out === Set((1L, 10L, 3L), (2L, 20L, 3L)))
  }

  test("fuzzyJoin: length-band prefilter never drops a true match " +
      "(edit distance changes length by <=1 per edit)") {
    val l = Seq((1L, "ab", 1)).toDF("lid", "lname", "lblock")
    val r = Seq((10L, "abcde", 1), (20L, "abcdef", 1))
      .toDF("rid", "rname", "rblock")
    val out = Joins.fuzzyJoin(l, r, "lname", "rname", maxDist = 3,
        blockKeys = Seq("lblock" -> "rblock"))
      .select("rid").as[Long].collect().toSet
    assert(out === Set(10L)) // dist("ab","abcde")=3 kept; len-diff-4 row cut
  }

  test("fuzzyJoin plan: blocked join is an equi join, not a cartesian") {
    val l = Seq((1L, "a", 1)).toDF("lid", "lname", "lblock")
    val r = Seq((10L, "b", 1)).toDF("rid", "rname", "rblock")
    val plan = Joins.fuzzyJoin(l, r, "lname", "rname", 2,
        Seq("lblock" -> "rblock"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q36 exact-moment statistics agree with Spark's built-in " +
      "streaming aggregates to float tolerance") {
    val df = graft.queries.Relational4
      .q36StatSuite(spark, TestSpark.sf0001)
    val li = graft.Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag"),
        col("l_quantity").cast("double").as("x"),
        (round(col("l_extendedprice") * 100)).as("y"))
    val ref = li.groupBy("l_returnflag")
      .agg(var_samp(col("x")).as("v"), corr(col("x"), col("y")).as("c"),
        covar_samp(col("x"), col("y")).as("cv"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    df.collect().foreach { r =>
      val (v, c, cv) = ref(r.getString(0))
      assert(math.abs(r.getDouble(2) - v) <= 1e-6 * math.abs(v))
      assert(math.abs(r.getDouble(5) - c) <= 1e-6)
      assert(math.abs(r.getDouble(4) - cv) <= 1e-6 * math.abs(cv))
    }
  }

  test("q39 rolling hour matches a brute-force recount on a sample") {
    val rows = graft.queries.Relational4
      .q39RollingHour(spark, TestSpark.sf0001).limit(200).collect()
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val ev = graft.Tables.events(spark, TestSpark.sf0001)
      .where(col("user_id") < 50)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1))))
    rows.take(40).foreach { r =>
      val (uid, t) = (r.getLong(1), micros(r.getTimestamp(2)))
      val expect = ev.count { case (u, et) =>
        u == uid && et <= t && et >= t - 3599999999L }
      assert(r.getLong(3) == expect, s"event ${r.getLong(0)}")
    }
  }

  test("resampleInterpolate: gap buckets linearly interpolated in exact e6 units") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0, 1L),
      (1L, ts("2024-01-01 04:00:00"), 20.0, 2L), // 3 gap hours: 12.5/15/17.5
      (1L, ts("2024-01-01 06:00:00"), 14.0, 3L), // downhill: 17.0 at 05
      (2L, ts("2024-01-01 00:00:00"), -1.5, 4L),
      (2L, ts("2024-01-01 02:00:00"), -4.5, 5L)  // negative slope midpoint -3.0
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleInterpolate(df, Seq("user_id"), "ts", "value",
        "hour", expr("INTERVAL 1 HOUR"), stepSeconds = 3600L,
        tiebreak = Seq("event_id"))
      .orderBy("user_id", "bucket")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2),
        r.getLong(3)))
    assert(out === Seq(
      (1L, "2024-01-01 00:00:00.0", 1L, 10000000L),
      (1L, "2024-01-01 01:00:00.0", 0L, 12500000L),
      (1L, "2024-01-01 02:00:00.0", 0L, 15000000L),
      (1L, "2024-01-01 03:00:00.0", 0L, 17500000L),
      (1L, "2024-01-01 04:00:00.0", 1L, 20000000L),
      (1L, "2024-01-01 05:00:00.0", 0L, 17000000L),
      (1L, "2024-01-01 06:00:00.0", 1L, 14000000L),
      (2L, "2024-01-01 00:00:00.0", 1L, -1500000L),
      (2L, "2024-01-01 01:00:00.0", 0L, -3000000L),
      (2L, "2024-01-01 02:00:00.0", 1L, -4500000L)))
  }

  test("resampleInterpolate: anchor rows keep their exact observed value") {
    val df = Seq(
      (1L, ts("2024-01-01 00:30:00"), 1.25, 1L),
      (1L, ts("2024-01-01 00:45:00"), 3.75, 2L), // later obs wins the bucket
      (1L, ts("2024-01-01 01:10:00"), 7.125, 3L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleInterpolate(df, Seq("user_id"), "ts", "value",
        "hour", expr("INTERVAL 1 HOUR"), stepSeconds = 3600L,
        tiebreak = Seq("event_id"))
      .orderBy("bucket").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(out === Seq((2L, 3750000L), (1L, 7125000L)))
  }
}
