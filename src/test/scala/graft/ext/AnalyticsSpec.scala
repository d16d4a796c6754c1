package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("funnel: steps must advance in time, window bounds from step 1") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "a", ts(0)), (1L, "b", ts(10)), (1L, "c", ts(20)),
      // user 2: b BEFORE a => never reaches step 2
      (2L, "b", ts(0)), (2L, "a", ts(10)),
      // user 3: a then b at the same minute (>= passes), no c
      (3L, "a", ts(5)), (3L, "b", ts(5)),
      // user 4: full funnel but c outside the 30-min window
      (4L, "a", ts(0)), (4L, "b", ts(10)), (4L, "c", ts(45)),
      // user 5: never enters
      (5L, "c", ts(0))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("a", "b", "c"), windowSeconds = 30 * 60)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1, "a", 4L), (2, "b", 3L), (3, "c", 1L)))
  }

  test("funnel: unbounded window counts late conversions") {
    val ev = Seq(
      (4L, "a", ts(0)), (4L, "b", ts(10)), (4L, "c", ts(45))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("a", "b", "c"))
      .orderBy("step").collect().map(_.getLong(2))
    assert(got.toSeq === Seq(1L, 1L, 1L))
  }

  test("retention: cohort = first-period, offsets exact, size from offset 0") {
    val ev = Seq(
      // cohort day 0: users 1, 2; user 1 returns day 1 and 3, user 2 never
      (1L, ts(0)), (1L, ts(24 * 60)), (1L, ts(3 * 24 * 60)),
      (2L, ts(60)),
      // cohort day 1: user 3, returns day 2
      (3L, ts(24 * 60 + 5)), (3L, ts(2 * 24 * 60))
    ).toDF("user_id", "ts")
    val got = Analytics.retention(ev, "user_id", "ts", "day", 86400L)
      .orderBy("cohort", "period_offset").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("2023-11-14", 0L, 2L, 2L),
      ("2023-11-14", 1L, 1L, 2L),
      ("2023-11-14", 3L, 1L, 2L),
      ("2023-11-15", 0L, 1L, 1L),
      ("2023-11-15", 1L, 1L, 1L)))
  }

  test("rollingAnomaly: spike flags once the baseline exists; flat history exact") {
    // 14 flat observations then a spike, then another flat: the spike
    // must flag (variance 0, x != mean) and the flats must not.
    val rows = (0 until 14).map(i => (1L, ts(i), 10.0)) ++
      Seq((1L, ts(14), 500.0), (1L, ts(15), 10.0))
    val got = TimeSeries.rollingAnomaly(rows.toDF("k", "ts", "value"),
        Seq("k"), "ts", "value", nPrior = 24, k = 3, minObs = 12)
      .orderBy("ts").collect()
      .map(r => (r.getLong(3), r.getBoolean(4))) // (n_prior, is_anomaly)
    assert(got.take(12).forall(!_._2), "warm-up rows below minObs never flag")
    assert(!got(13)._2, "flat value over flat history is not an anomaly")
    assert(got(14)._2, "spike over a zero-variance baseline flags")
  }

  test("cooccurrence: pair counts, dedup within group, oversized baskets excluded") {
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"), (2L, "y"), // duplicate item collapses
      (3L, "x"), (3L, "z")
    ).toDF("g", "i")
    val got = Analytics.cooccurrence(df, "g", "i", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("x", "y", 2L), ("x", "z", 2L), ("y", "z", 1L)))
    // a basket over the cap contributes NO pairs
    val withBig = df.union(
      (1 to 50).map(i => (9L, s"item_$i")).toDF("g", "i"))
    val capped = Analytics.cooccurrence(withBig, "g", "i", topK = 1000,
        maxItemsPerGroup = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(!capped.exists(p => p._1.startsWith("item_")),
      "oversized basket must be excluded, not exploded")
  }

  test("transitions: per-user adjacency, row-normalized integer " +
      "probabilities, cross-user pairs never counted") {
    val ev = Seq(
      (1L, "a", ts(0), 1L), (1L, "b", ts(1), 2L), (1L, "a", ts(2), 3L),
      (1L, "c", ts(3), 4L),
      (2L, "a", ts(0), 5L), (2L, "b", ts(1), 6L),
      // user 3 has one event: contributes nothing
      (3L, "c", ts(9), 7L),
      // tie on ts within user 4: event_id orders it -> a then b
      (4L, "b", ts(5), 9L), (4L, "a", ts(5), 8L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = Analytics.transitions(ev, "user_id", "event_type", "ts",
        tiebreak = Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // from 'a': a->b x3 (u1, u2, u4), a->c x1 (u1) => n_from 4.
    assert(got(("a", "b")) === ((3L, 4L, 750000L)))
    assert(got(("a", "c")) === ((1L, 4L, 250000L)))
    // from 'b': b->a x1 (u1) only; u2's and u4's 'b' are terminal.
    assert(got(("b", "a")) === ((1L, 1L, 1000000L)))
    assert(got.size === 3)
  }

  test("itemSimilarity: exact integer cosine², minCo floor, full-count " +
      "denominators") {
    // Items A,B share users 1,2 (co=2); A has 3 users, B has 2.
    // score = 2²·10⁶ div (3·2) = 666666. C co-occurs once with A -> cut
    // by minCo=2.
    val df = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"), (3L, "C"),
      (3L, "A") // duplicate interaction must not inflate counts
    ).toDF("u", "i")
    val got = Analytics.itemSimilarity(df, "u", "i", minCo = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(("A", "B", 2L, 3L, 2L, 666666L)))
  }

  test("itemSimilarity: oversized baskets cut pairs but not denominators") {
    // User 99 interacts with everything (over the cap of 3): its pairs
    // vanish, but item user-counts still include it.
    val small = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"))
    val big = Seq("A", "B", "C", "D").map(i => (99L, i))
    val got = Analytics.itemSimilarity((small ++ big).toDF("u", "i"),
        "u", "i", minCo = 2L, maxItemsPerUser = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // co=2 from users 1,2; na=nb=3 including user 99.
    assert(got.toSeq === Seq(("A", "B", 2L, 3L, 3L, 444444L)))
  }

  test("scriptProfile: counts per range and dominant script") {
    val df = Seq(
      (1L, "hello world 123"),
      (2L, "привет мир"),
      (3L, "helloo привет"), // 6 vs 6 tie -> latin wins the >= chain
      (4L, "你好世界 こんにちは"),
      (5L, "γειά σου")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6)))).toMap
    assert(got(1L) === ((10L, 0L, 0L, 0L, 3L, "latin")))
    assert(got(2L) === ((0L, 9L, 0L, 0L, 0L, "cyrillic")))
    assert(got(3L)._6 === "latin")
    assert(got(4L) === ((0L, 0L, 0L, 9L, 0L, "cjk")))
    assert(got(5L) === ((0L, 0L, 7L, 0L, 0L, "greek")))
  }
}
