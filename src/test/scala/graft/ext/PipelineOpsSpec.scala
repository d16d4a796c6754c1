package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Quality.check: each constraint type counts its violations exactly") {
    val df = Seq(
      (1L, Some("a"), Some(10.0)),
      (1L, Some("a"), None),         // dup key; null rate
      (2L, Some("zz"), Some(30.0)),  // bad accepted value
      (3L, None, Some(40.0)),        // null label
      (9L, Some("b"), Some(50.0))    // key 9 missing from ref
    ).toDF("k", "label", "v")
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val out = Quality.check(df, Seq(
        Quality.Unique(Seq("k")),
        Quality.NotNull("label"),
        Quality.AcceptedValues("label", Seq("a", "b")),
        Quality.NullRateBelow("v", 0.1),
        Quality.RefIntegrity("k", ref, "rk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("unique(k)") == 1L)          // one extra row beyond first
    assert(out("not_null(label)") == 1L)
    assert(out("accepted_values(label)") == 1L) // nulls NOT double-counted
    assert(out("null_rate(v<=0.1)") == 1L)  // 1 null, allowance floor(0.5)=0
    assert(out("ref_integrity(k)") == 1L)   // key 9
  }

  test("Quality.check: all-green report and pass flags") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "label")
    val out = Quality.check(df, Seq(
      Quality.Unique(Seq("k")), Quality.NotNull("label")))
      .collect()
    assert(out.forall(_.getBoolean(2)))
    assert(out.forall(_.getLong(1) == 0L))
  }

  test("Cdc.mergeUpsert: update, insert, delete, and untouched rows") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, "B", 99.0, false), // update
      (4L, "d", 40.0, false), // insert
      (3L, "x", 0.0, true)    // delete (payload ignored)
    ).toDF("k", "s", "v", "del")
    val out = Cdc.mergeUpsert(base, changes, Seq("k"), Some("del"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out === Seq((1L, "a", 10.0), (2L, "B", 99.0), (4L, "d", 40.0)))
  }

  test("Cdc.mergeUpsert: an update carrying NULL payload fields still " +
      "overwrites (struct-wrap distinguishes no-match from null fields)") {
    val base = Seq((1L, "a")).toDF("k", "s")
    val changes = Seq((1L, Option.empty[String])).toDF("k", "s")
    val out = Cdc.mergeUpsert(base, changes, Seq("k")).collect()
    assert(out.length == 1 && out(0).isNullAt(1))
  }

  test("Cdc.mergeUpsert: pure upsert without delete column") {
    val base = Seq((1L, "a")).toDF("k", "s")
    val changes = Seq((1L, "A"), (2L, "b")).toDF("k", "s")
    val out = Cdc.mergeUpsert(base, changes, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out === Seq((1L, "A"), (2L, "b")))
  }

  test("Cdc.mergeUpsert: assertUniqueKeys fails fast on duplicate keys, " +
      "passes through on unique ones") {
    val base = Seq((1L, "a"), (1L, "a2"), (2L, "b")).toDF("k", "s")
    val changes = Seq((2L, "B")).toDF("k", "s")
    val e = intercept[IllegalArgumentException] {
      Cdc.mergeUpsert(base, changes, Seq("k"), assertUniqueKeys = true)
    }
    assert(e.getMessage.contains("base") && e.getMessage.contains("duplicate"))
    val ok = Cdc.mergeUpsert(base.where(col("s") =!= "a2"), changes, Seq("k"),
        assertUniqueKeys = true)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(ok === Seq((1L, "a"), (2L, "B")))
  }

  test("Incremental.finalizeAvg: a sum_cents past BIGINT range raises " +
      "instead of wrapping silently") {
    val state = Seq(("k1", 2L)).toDF("g", "n")
      .withColumn("sum_cents",
        lit("12345678901234567890").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
    val e = intercept[Exception] {
      Incremental.finalizeAvg(state, Seq("g")).collect()
    }
    def msg(t: Throwable): String =
      Option(t).map(x => x.getMessage + msg(x.getCause)).getOrElse("")
    assert(msg(e).contains("overflows BIGINT"))
    // in-range states are untouched
    val ok = Incremental.finalizeAvg(
        Seq(("k1", 2L, BigDecimal(500))).toDF("g", "n", "sum_cents"), Seq("g"))
      .collect()(0)
    assert(ok.getLong(2) == 500L && ok.getDouble(3) == 250.0)
  }

  test("Incremental: merged partials equal a direct recompute, " +
      "independent of how history is split into batches") {
    val o = graft.Tables.orders(spark, TestSpark.sf0001)
    val cents = round(col("o_totalprice") * 100).cast("long")
    val keys = Seq("o_orderpriority")
    def stateOf(splits: Seq[org.apache.spark.sql.DataFrame]) =
      Incremental.finalizeAvg(
          Incremental.merge(splits.map(Incremental.partials(_, keys, cents)),
            keys), keys)
        .orderBy("o_orderpriority").collect().toSeq
    val direct = stateOf(Seq(o))
    val byParity = stateOf(Seq(
      o.where(col("o_orderkey") % 2 === 0),
      o.where(col("o_orderkey") % 2 === 1)))
    val byThree = stateOf(Seq(
      o.where(col("o_orderkey") % 3 === 0),
      o.where(col("o_orderkey") % 3 === 1),
      o.where(col("o_orderkey") % 3 === 2)))
    assert(direct === byParity)
    assert(direct === byThree)
  }

  test("Incremental.partialsMinMax: extremes merge to the recompute " +
      "regardless of batch split") {
    val rows = Seq((1L, "a", 500L), (2L, "a", -20L), (3L, "b", 7L),
      (4L, "a", 120L), (5L, "b", 7L), (6L, "b", 900L))
    val df = rows.toDF("id", "k", "cents")
    def partial(p: org.apache.spark.sql.DataFrame) =
      Incremental.partialsMinMax(p, Seq("k"), col("cents"))
    val merged = Incremental.mergeMinMax(Seq(
      partial(df.where(col("id") <= 2)),
      partial(df.where(col("id") === 3)),
      partial(df.where(col("id") >= 4))), Seq("k"))
    val direct = partial(df)
    val key = (d: org.apache.spark.sql.DataFrame) => d
      .select("k", "n", "sum_cents", "min_cents", "max_cents")
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getDecimal(2).longValue, r.getLong(3),
          r.getLong(4)))).toMap
    assert(key(merged) === key(direct))
    assert(key(merged)("a") === ((3L, 600L, -20L, 500L)))
    assert(key(merged)("b") === ((3L, 914L, 7L, 900L)))
  }

  test("Profile.histogram: exact integer bins, observed lo/hi, empty bins absent") {
    import spark.implicits._
    val df = (0L to 9L).toDF("x") // span 10, 2 bins: [0,4] and [5,9]
    val two = Profile.histogram(df, col("x"), 2).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(two.toSeq === Seq((0L, 5L, 0L, 4L), (1L, 5L, 5L, 9L)))
    // max lands in the LAST bin (no overflow bin), negatives fine
    val neg = Seq(-10L, -1L, 0L, 10L).toDF("x")
    val bins = Profile.histogram(neg, col("x"), 4).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(bins.map(_._1).distinct.forall(b => b >= 0 && b <= 3))
    assert(bins.map(_._2).sum === 4)
    // single distinct value: span 1, everything in bin 0
    val one = Profile.histogram(Seq(7L, 7L, 7L).toDF("x"), col("x"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(one.toSeq === Seq((0L, 3L)))
  }

  test("mergeUpsertPruned: untouched partitions byte-identical, result == full merge") {
    import spark.implicits._
    val tbl = "pruned_spec_tbl"
    Seq(tbl, tbl + "__merge_stage").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq((1L, "v1", "A"), (2L, "v2", "A"), (3L, "v3", "B"), (4L, "v4", "C"))
      .toDF("k", "v", "p")
      .write.partitionBy("p").format("parquet").saveAsTable(tbl)
    def files(part: String) = spark.table(tbl).inputFiles
      .filter(_.contains(s"p=$part")).sorted.toSeq
      .map { f =>
        val path = java.nio.file.Paths.get(new java.net.URI(f))
        (f, java.nio.file.Files.getLastModifiedTime(path).toMillis)
      }
    val bBefore = files("B")
    assert(bBefore.nonEmpty)
    // update in A, insert into C, B untouched
    val changes = Seq((1L, "v1-new", "A"), (9L, "v9", "C")).toDF("k", "v", "p")
    Cdc.mergeUpsertPruned(tbl, changes, keys = Seq("k"), partCol = "p")
    assert(files("B") === bBefore, "partition B files must not be rewritten")
    val got = spark.table(tbl).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1L, "v1-new", "A"), (2L, "v2", "A"), (3L, "v3", "B"),
      (4L, "v4", "C"), (9L, "v9", "C")))
  }

  test("mergeUpsertPruned: delete rows and cross-partition moves resolve") {
    import spark.implicits._
    val tbl = "pruned_spec_tbl2"
    Seq(tbl, tbl + "__merge_stage").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq((1L, "x", "A"), (2L, "y", "B"), (3L, "z", "B"))
      .toDF("k", "v", "p")
      .write.partitionBy("p").format("parquet").saveAsTable(tbl)
    // delete k=2; move k=1 from A to B
    val changes = Seq((2L, "y", "B", true), (1L, "x2", "B", false))
      .toDF("k", "v", "p", "del")
    Cdc.mergeUpsertPruned(tbl, changes, keys = Seq("k"), partCol = "p",
      deleteCol = Some("del"))
    val got = spark.table(tbl).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq((1L, "x2", "B"), (3L, "z", "B")))
  }

  test("Cdc.scdType2: change closes + reopens, no-op and stale carry, " +
      "new key inserts, closed history passes through") {
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val dim = Seq(
      // key 1: one closed version + one open version
      (1L, "a", t("2019-01-01"), Option(t("2020-01-01"))),
      (1L, "b", t("2020-01-01"), None),
      // key 2: open, will receive a no-op update
      (2L, "c", t("2020-01-01"), None),
      // key 3: open, will receive a stale (older-ts) update
      (3L, "d", t("2020-01-01"), None)
    ).toDF("k", "attr", "valid_from", "valid_to")
    val upd = Seq(
      (1L, "B", t("2021-06-01")), // real change
      (2L, "c", t("2021-06-01")), // attrs identical -> no-op
      (3L, "x", t("2019-06-01")), // stale -> dropped
      (4L, "new", t("2021-06-01")) // brand-new key
    ).toDF("k", "attr", "ts")
    val out = Cdc.scdType2(dim, upd, Seq("k"), "ts")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString.take(10),
        Option(r.getTimestamp(3)).map(_.toString.take(10)).orNull))
    assert(out.toSeq === Seq(
      (1L, "a", "2019-01-01", "2020-01-01"),
      (1L, "b", "2020-01-01", "2021-06-01"),
      (1L, "B", "2021-06-01", null),
      (2L, "c", "2020-01-01", null),
      (3L, "d", "2020-01-01", null),
      (4L, "new", "2021-06-01", null)))
  }

  test("Cdc.scdType2: batch with several updates per key compacts to the " +
      "latest ts before applying") {
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val dim = Seq((1L, "a", t("2020-01-01"), None: Option[java.sql.Timestamp]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val upd = Seq(
      (1L, "mid", t("2021-01-01")),
      (1L, "late", t("2021-06-01"))
    ).toDF("k", "attr", "ts")
    val out = Cdc.scdType2(dim, upd, Seq("k"), "ts")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getString(1), Option(r.getTimestamp(3)).isEmpty))
    // Only the 2021-06-01 version lands; "mid" is below batch resolution.
    assert(out.toSeq === Seq(("a", false), ("late", true)))
  }

  test("Cdc.diff: added/removed/changed only; null payloads compare null-safe") {
    import spark.implicits._
    val before = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("d")))
      .toDF("k", "v")
    val after = Seq(
      (1L, Some("a")),   // unchanged -> absent from output
      (2L, Some("B")),   // changed
      (3L, None),        // null == null under <=> -> unchanged
      (5L, Some("e")))   // added; 4 removed
      .toDF("k", "v")
    val got = Cdc.diff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 4L -> "removed", 5L -> "added"))
  }

  test("Quality.schemaDiff: added/removed/retyped only; case-insensitive " +
      "match, no-drift is empty") {
    val before = Seq((1L, "a", 2.0)).toDF("id", "name", "score")
    val after = Seq((1, "a", true)).toDF("ID", "name", "flag")
    val got = Quality.schemaDiff(before, after)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got === Set(
      ("id", "bigint", "int", "type_changed"),
      ("score", "double", null, "removed"),
      ("flag", null, "boolean", "added")))
    assert(Quality.schemaDiff(before, before).count() === 0)
  }

  test("Profile.equiDepthBuckets: pinned formula, boundary ties follow " +
      "the tiebreak, partitioning-independent") {
    // 10 rows, k=4: rn 1..10 -> bucket (rn-1)*4 div 10 = 0,0,0,1,1,2,2,2,3,3.
    // Three rows tie at value 5 (ids 4,5,6) straddling the 0/1 boundary:
    // id order decides deterministically.
    val df = Seq(
      (1L, 1), (2L, 2), (3L, 3), (4L, 5), (5L, 5),
      (6L, 5), (7L, 7), (8L, 8), (9L, 9), (10L, 10)
    ).toDF("id", "v").withColumn("g", lit("a"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.equiDepthBuckets(d, Seq("g"), col("v"), 4, Seq("id"))
        .orderBy("id").select("id", "bucket")
        .as[(Long, Int)].collect().toSeq
    val got = run(df)
    assert(got === Seq(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1,
      6L -> 2, 7L -> 2, 8L -> 2, 9L -> 3, 10L -> 3))
    assert(got === run(df.repartition(7)))
  }

  test("Profile.mad: exact lower-median and MAD per group, even and odd n") {
    val df = Seq(
      // group a: {1, 3, 7, 100} -> n=4, rank ceil(4*50/100)=2 -> median 3;
      // devs {2, 0, 4, 97} sorted {0,2,4,97} -> mad at rank 2 = 2.
      ("a", 1L), ("a", 3L), ("a", 7L), ("a", 100L),
      // group b: {5, 6, 10} -> rank 2 -> median 6; devs {1,0,4} -> mad 1.
      ("b", 5L), ("b", 6L), ("b", 10L)
    ).toDF("k", "v")
    val got = Profile.mad(df, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") === ((4L, 3L, 2L)))
    assert(got("b") === ((3L, 6L, 1L)))
  }

  test("Profile.mad: NULL values are excluded, not counted into the ranks") {
    val df = Seq(
      ("a", Some(1L)), ("a", None), ("a", Some(3L)), ("a", None),
      ("a", Some(7L)), ("a", Some(100L))
    ).toDF("k", "v")
    // Same statistics as the all-non-null {1,3,7,100} group above: a NULL
    // sorting first must not shift the rank-2 pick off the true median.
    val got = Profile.mad(df, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") === ((4L, 3L, 2L)))
  }

  test("Cdc.scdType2: attribute type mismatch is rejected up front; " +
      "case-insensitive update column names are accepted") {
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val dim = Seq((1L, "a", t("2020-01-01"), None: Option[java.sql.Timestamp]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val badType = Seq((1L, 7, t("2021-01-01"))).toDF("k", "attr", "ts")
    val e = intercept[IllegalArgumentException] {
      Cdc.scdType2(dim, badType, Seq("k"), "ts")
    }
    assert(e.getMessage.contains("attr"))
    val upperCased = Seq((1L, "B", t("2021-01-01"))).toDF("K", "ATTR", "ts")
    val out = Cdc.scdType2(dim, upperCased, Seq("k"), "ts")
      .orderBy("valid_from").collect()
    assert(out.length === 2 && out(1).getString(1) === "B")
  }

  test("Profile.winsorize: exact discrete percentile clip per group") {
    import spark.implicits._
    val a = (1L to 100L).map(v => ("a", v))
    val b = Seq(("b", 42L)) // singleton group: klo = khi = 1
    val df = (a ++ b).toDF("g", "x")
    val got = Profile.winsorize(df, Seq("g"), col("x"), 5, 95)
      .select("g", "x_e", "win_lo", "win_hi", "clipped")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val ga = got.filter(_._1 == "a")
    assert(ga.forall(r => r._3 === 5L && r._4 === 95L),
      "rank ceil(100*5/100)=5 and ceil(95)=95")
    assert(ga.find(_._2 == 1L).get._5 === 5L, "below lo clips up")
    assert(ga.find(_._2 == 100L).get._5 === 95L, "above hi clips down")
    assert(ga.find(_._2 == 50L).get._5 === 50L, "interior untouched")
    val gb = got.filter(_._1 == "b").head
    assert(gb._3 === 42L && gb._4 === 42L && gb._5 === 42L,
      "singleton group clips to itself")
  }

  test("Curation.curate: each stage drops what it should") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog again and again " +
      "with plenty of ordinary words to clear the word count threshold here"
    val docs = Seq(
      (1L, good, "en"),                      // survives everything
      (2L, good, "en"),                      // exact dup of 1 -> dropped
      (3L, "too short", "en"),               // quality drop
      (4L, good + " unique tail marker", "fr"), // survives
      (5L, "the secret benchmark passage appears verbatim right here in " +
        "this document padded with enough extra words to pass quality " +
        "checks easily one two three four five six seven eight nine ten",
        "en")                                // decontam drop
    ).toDF("doc_id", "text", "lang")
    val bench = Seq("the secret benchmark passage appears verbatim right here")
      .toDF("text")

    val out = graft.ext.Curation.curate(docs, "text", "doc_id", col("lang"),
        bench, "text", minWords = 10L, minStopHits = 1L,
        alpha = 1.0, // keep-all mixing: isolates the filter stages
        shardTokens = 10L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("shard_id")))
    assert(out.map(_._1).toSeq === Seq(1L, 4L),
      s"expected docs 1 and 4 to survive, got ${out.toSeq}")
    // Shards advance with the token stream (doc 1 has 23 tokens at
    // budget 10 -> doc 4 starts in shard 2).
    assert(out.head._3 === 0L && out.last._3 === 2L, s"shards: ${out.toSeq}")
  }

  test("thresholdSweep: hand-computed PR at each cut; empty classes " +
      "yield 0 ppm instead of dividing by zero") {
    import spark.implicits._
    // scores/labels: (10,T) (20,T) (30,F) (40,T) (50,F)
    val df = Seq((10L, true), (20L, true), (30L, false), (40L, true),
      (50L, false)).toDF("s", "p")
    val got = Quality.thresholdSweep(df, col("s"), col("p"),
        Seq(25L, 45L, 60L))
      .orderBy("cut").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // cut 25: pred+ = {30F,40T,50F} -> tp=1 fp=2 fn=2; P=333333 R=333333
    assert(got(0) === ((25L, 1L, 2L, 2L, 333333L, 333333L)))
    // cut 45: pred+ = {50F} -> tp=0 fp=1 fn=3; P=0 R=0
    assert(got(1) === ((45L, 0L, 1L, 3L, 0L, 0L)))
    // cut 60: nothing predicted positive -> precision 0 by convention
    assert(got(2) === ((60L, 0L, 0L, 3L, 0L, 0L)))
  }

  test("Curation.curriculumShards: shard ids follow the (bucket, score " +
      "desc, id) curriculum prefix sum; sub-trigram docs drop") {
    val docs = Seq(
      (1L, "a b c a b c a b c", "en"),
      (2L, "a b c d e f", "en"),
      (3L, "d e f d e f", "en"),
      (4L, "g h i j k l", "en"),
      (5L, "a b", "en"), // no trigram -> dropped
      (6L, "a b c", "fr"))
      .toDF("doc_id", "text", "lang")
    val tri = TextAnalysis.knCounts(docs, "text")
    val got = Curation.curriculumShards(docs, "text", "doc_id",
        col("lang"), tri, shardTokens = 10L, nBuckets = 2, minCount = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))) // (doc_id, bucket, n_tokens, shard_id)
    assert(!got.map(_._1).contains(5L))
    // Replay the contract directly: order rows by (bucket, score desc,
    // id) — recover score order from perplexityBuckets — and the shard
    // id must equal the running-token prefix DIV shardTokens.
    val scores = Curation.perplexityBuckets(docs, "text", "doc_id",
        col("lang"), tri, nBuckets = 2, minCount = 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap // id -> (score, bucket)
    val ordered = got.sortBy { case (id, b, _, _) =>
      (b, -scores(id)._1, id)
    }
    var off = 0L
    ordered.foreach { case (id, _, n, shard) =>
      assert(shard === off / 10L, s"doc $id")
      off += n
    }
    // And the curriculum property itself: shard ids are non-decreasing
    // along the quality order.
    assert(ordered.map(_._4).sliding(2).forall(p => p.head <= p.last))
  }

  test("Curation.classifiedMixture: routing follows the PREDICTED class " +
      "(content), not the metadata label; exact mixture arithmetic") {
    // Classes separate cleanly on vocabulary; doc 7 carries label 'a'
    // but class-b content, so NB routes it to b and the supply table
    // must read a=3 docs / b=4 docs. tok=10 per doc makes the rate
    // math hand-checkable: supplies 30/40, targets 50/50 => T=60,
    // rate_a = 30e6//30 = 1e6 (capped), rate_b = 30e6//40 = 750000.
    val docs = Seq(
      (1L, "xx yy xx", "a"), (2L, "yy xx yy", "a"), (3L, "xx yy", "a"),
      (4L, "zz ww zz", "b"), (5L, "ww zz ww", "b"), (6L, "zz ww", "b"),
      (7L, "zz ww zz ww", "a"))
      .toDF("doc_id", "text", "lang")
      .withColumn("tok", lit(10L))
    val got = Curation.classifiedMixture(docs, "text", "doc_id", "lang",
        col("tok"), Map("a" -> 500000L, "b" -> 500000L))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(
      ("a", 3L, 30L, 1000000L),
      ("b", 4L, 40L, 750000L)))
  }
  test("blendScores: exact rank-normalized weighted mean, invariant " +
      "to monotone rescaling of a signal") {
    val spark0 = spark
    import spark0.implicits._
    // 5 docs, two signals with opposite orders
    val df = Seq((1L, 10L, 5L), (2L, 20L, 4L), (3L, 30L, 3L),
        (4L, 40L, 2L), (5L, 50L, 1L)).toDF("id", "a", "b")
    val got = graft.ext.Curation.blendScores(df, "id",
        Seq((col("a"), 3L), (col("b"), 1L)))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // norms: a -> (0, 25, 50, 75, 100)% ; b -> reversed
    val want = (0 until 5).map { i =>
      val na = i * 1000000L / 4; val nb = (4 - i) * 1000000L / 4
      (i + 1L, (na * 3 + nb) / 4)
    }
    assert(got === want)
    // monotone invariance: squaring the nonnegative signal changes nothing
    val got2 = graft.ext.Curation.blendScores(df, "id",
        Seq((col("a") * col("a"), 3L), (col("b"), 1L)))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 === got)
    // fractional signals rank without truncation: 0.1 < 0.2 < ... must
    // order, not collapse into one giant tie
    val frac = Seq((1L, 0.1), (2L, 0.2), (3L, 0.3)).toDF("id", "f")
    val gf = graft.ext.Curation.blendScores(frac, "id",
        Seq((col("f"), 1L)))
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(gf === Seq(0L, 500000L, 1000000L))
  }

  test("readinessCard: exact one-row summary; empty report inputs " +
      "summarize to 0, not null") {
    val spark0 = spark
    import spark0.implicits._
    val contam = Seq(("evalA", 3L, 9L, 1500L), ("evalB", 0L, 0L, 0L))
      .toDF("eval_set", "n_docs_hit", "n_gram_hits", "contaminated_ppm")
    val fert = Seq(("en", 2100000L), ("de", 2900000L))
      .toDF("lang", "fertility_ppm")
    val cls = Seq(("en", 980000L), ("de", 610000L)).toDF("label", "f1_ppm")
    val rec = Seq((1L, 1000000L), (2L, 500000L), (3L, 750001L))
      .toDF("query_id", "recall_ppm")
    val row = graft.ext.Curation.readinessCard(contam, fert, cls, rec).head()
    assert(row.getAs[Long]("n_eval_sets") === 2L)
    assert(row.getAs[Long]("n_contaminated_sets") === 1L)
    assert(row.getAs[Long]("worst_contamination_ppm") === 1500L)
    assert(row.getAs[Long]("n_langs") === 2L)
    assert(row.getAs[Long]("worst_fertility_ppm") === 2900000L)
    assert(row.getAs[Long]("min_class_f1_ppm") === 610000L)
    assert(row.getAs[Long]("mean_recall_ppm") === 2250001L / 3L)
    assert(row.getAs[Long]("min_recall_ppm") === 500000L)
    // totality: all-empty inputs produce a 0 row, never nulls
    val empty = graft.ext.Curation.readinessCard(
      contam.limit(0), fert.limit(0), cls.limit(0), rec.limit(0)).head()
    (0 until empty.length).foreach(i => assert(!empty.isNullAt(i)))
    assert(empty.getAs[Long]("n_eval_sets") === 0L)
    assert(empty.getAs[Long]("mean_recall_ppm") === 0L)
  }

  test("blendScores: a duplicated id yields one blend PER ROW — no " +
      "cross-multiplied join fanout") {
    val spark0 = spark
    import spark0.implicits._
    // id 2 appears twice with different signal values; the old N-way
    // id join produced 2^signals = 4 rows for it, pairing arbitrary
    // norm combinations
    val df = Seq((1L, 10L, 9L), (2L, 20L, 8L), (2L, 30L, 7L),
        (3L, 40L, 6L)).toDF("id", "a", "b")
    val got = graft.ext.Curation.blendScores(df, "id",
        Seq((col("a"), 1L), (col("b"), 1L)))
      .orderBy("id", "blend_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.length === 4, s"expected one output row per input row: $got")
    // every row ranks on ITS OWN signals (norms are (rank-1)*1e6/3):
    // (10,9)->(0+1000000)/2=500000, (20,8)->(333333+666666)/2=499999,
    // (30,7)->(666666+333333)/2=499999, (40,6)->(1000000+0)/2=500000
    assert(got === Seq((1L, 500000L), (2L, 499999L), (2L, 499999L),
      (3L, 500000L)))
  }
}
