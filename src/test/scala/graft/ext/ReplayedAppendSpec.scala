package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The at-least-once / lifecycle contracts of the persisted indexes
  * (VERDICT r13 items 2, 3, 6):
  *
  *  - a foreachBatch sink can REPLAY a micro-batch after a failure, so
  *    every index append must either be idempotent or be absorbed at
  *    serve time — these specs double-deliver a batch on purpose and
  *    pin serve equality with the exactly-once run;
  *  - appends must not grow a flooded LSH bucket unboundedly —
  *    cross-increment re-capping tombstones a bucket the moment its
  *    distinct-doc count crosses the build cap;
  *  - compaction physically removes what the serves absorb logically,
  *    and swaps via [[graft.io.StagedSwap]] (old tables renamed aside,
  *    rollback on failure, staging kept for recovery).
  */
class ReplayedAppendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(16)(r.nextFloat() - 0.5f)
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("idx").toString

  // ------------------------------------------------------------- ANN

  test("appendIvfPq: a double-delivered micro-batch serves the " +
      "exactly-once answer, and compact rebuilds the exactly-once index") {
    val root = tmp("graft_replay_ann_")
    val corpus = (0L until 200L).map(i => (i, vec(i.toInt))).toDF("cid", "cvec")
    val queries = (0L until 5L).map(i => (i + 300L, vec(i.toInt + 900)))
      .toDF("qid", "qvec")
    val batch = corpus.where($"cid" >= 150)

    AnnIndex.buildIvfPq(corpus.where($"cid" < 150), dim = 16, nlist = 8,
      root = root, m = 4, codes = 8)
    AnnIndex.appendIvfPq(spark, root, batch)
    def serve() = AnnIndex.queryIvfPq(spark, root, queries, k = 3,
        nprobe = 3, rerank = 10, excludeSelf = false)
      .orderBy("query_id", "rank").collect().toSeq
    val once = serve()

    // the replay: the same batch delivered again (at-least-once sink)
    AnnIndex.appendIvfPq(spark, root, batch)
    assert(spark.read.parquet(s"$root/encoded.parquet").count() === 250,
      "replay physically duplicates encoded rows (plain parquet append)")
    assert(serve() === once,
      "TopKAggregator's (id, score) collapse must absorb the replay: " +
        "pruned serve bit-equal to the exactly-once serve")
    // mineTopK (distributed-query serve) absorbs it through the same
    // aggregators
    def mine() = AnnIndex.mineTopK(spark, root, queries, k = 3,
        nprobe = 3, rerank = 10)
      .orderBy("query_id", "rank").collect().toSeq
    val mined = mine()
    assert(mined.nonEmpty && mined === mine())

    // compact after the replay == a fresh build of the exactly-once
    // union corpus (cid-dedup upstream of the hash-ordered samples)
    AnnIndex.compactIvfPq(spark, root, nlist = 10, m = 4, codes = 8)
    assert(spark.read.parquet(s"$root/encoded.parquet").count() === 200,
      "compact physically dedups the replayed rows")
    val fresh = tmp("graft_replay_ann_fresh_")
    AnnIndex.buildIvfPq(corpus, dim = 16, nlist = 10, root = fresh,
      m = 4, codes = 8)
    val servedCompact = AnnIndex.queryIvfPq(spark, root, queries, k = 3,
        nprobe = 4, rerank = 10, excludeSelf = false)
      .orderBy("query_id", "rank").collect().toSeq
    val servedFresh = AnnIndex.queryIvfPq(spark, fresh, queries, k = 3,
        nprobe = 4, rerank = 10, excludeSelf = false)
      .orderBy("query_id", "rank").collect().toSeq
    assert(servedCompact === servedFresh,
      "compact(build + append + replayed append) == build(union) at " +
        "pruned settings")
  }

  // --------------------------------------------------- MinHash index

  private val hotText =
    "the quick brown fox jumps over the lazy dog tonight while the " +
      "silver river bends under the old stone bridge"
  private val coldText =
    "completely different prose about distributed query engines and " +
      "columnar storage layouts for petabyte scale analytics work"

  private val smallCap = Dedup.MinHashConfig(maxBucketSize = 4)

  test("appendMinHashIndex: distinct-doc re-capping tombstones a bucket " +
      "crossing the cap, bounds serve cost, and never counts a replayed " +
      "increment twice") {
    val root = tmp("graft_recap_")
    // build: 3 byte-identical hot docs (every band bucket of the hot
    // family holds 3 <= cap 4) + one cold doc
    val build = Seq((1L, hotText), (2L, hotText), (3L, hotText),
      (10L, coldText)).toDF("doc_id", "text")
    Dedup.saveMinHashIndex(root, build, "text", "doc_id", smallCap)
    assert(spark.read.parquet(s"$root/tombstones.parquet").count() === 0)

    // increment of one more hot doc, delivered TWICE (replay): the
    // distinct-doc union count is 4 == cap — row-based counting would
    // see 5 and tombstone prematurely
    val inc1 = Seq((4L, hotText)).toDF("doc_id", "text")
    Dedup.appendMinHashIndex(root, inc1, "text", "doc_id")
    Dedup.appendMinHashIndex(root, inc1, "text", "doc_id")
    assert(spark.read.parquet(s"$root/tombstones.parquet").count() === 0,
      "replayed increment must not double-count into a premature tombstone")
    assert(spark.read.parquet(s"$root/fps.parquet")
      .where($"doc_id" === 4L).count() === 2,
      "the replay physically duplicated fps rows (plain parquet append)")
    def flagsOf(id: Long, text: String) =
      Dedup.flagAgainstIndex(spark, root, smallCap,
          Seq((id, text)).toDF("doc_id", "text"), "text", "doc_id")
        .orderBy("dup_of").collect().toSeq
    val hotFlags = flagsOf(100L, hotText)
    assert(hotFlags.map(_.getLong(1)) === Seq(1L, 2L, 3L, 4L),
      "serve absorbs the duplicated rows: each indexed hot doc flagged once")

    // one more distinct hot doc crosses the cap -> the hot family's
    // buckets tombstone; its rows are NOT appended
    Dedup.appendMinHashIndex(root, Seq((5L, hotText)).toDF("doc_id", "text"),
      "text", "doc_id")
    val tombs = spark.read.parquet(s"$root/tombstones.parquet")
    assert(tombs.count() === smallCap.bands,
      "every band bucket of the flooded pattern is tombstoned")
    assert(spark.read.parquet(s"$root/buckets.parquet")
      .where($"doc_id" === 5L).count() === 0,
      "the crossing increment's rows are not appended to flooded buckets")
    // bounded serve: every NON-tombstoned bucket holds <= cap distinct
    // docs on disk
    val overCap = spark.read.parquet(s"$root/buckets.parquet")
      .join(broadcast(tombs), Seq("band", "band_hash"), "left_anti")
      .select("band", "band_hash", "doc_id").distinct()
      .groupBy("band", "band_hash").count()
      .where($"count" > smallCap.maxBucketSize).count()
    assert(overCap === 0)
    assert(flagsOf(101L, hotText).isEmpty,
      "tombstoned buckets generate no candidates — the flood contract " +
        "(residual pre-crossing rows are serve-invisible too)")
    assert(flagsOf(102L, coldText).map(_.getLong(1)) === Seq(10L),
      "un-flooded buckets keep serving exactly")

    // compaction: physically dedups fps/postings and drops residual
    // tombstoned rows; serve is bit-identical before and after
    val before = flagsOf(102L, coldText)
    Dedup.compactMinHashIndex(spark, root, targetPartitions = 1)
    assert(flagsOf(102L, coldText) === before)
    assert(flagsOf(101L, hotText).isEmpty)
    assert(spark.read.parquet(s"$root/fps.parquet").count() === 6,
      "one fps row per distinct doc after compact (1,2,3,4,5,10)")
    val residualHot = spark.read.parquet(s"$root/buckets.parquet")
      .join(broadcast(tombs), Seq("band", "band_hash"), "left_semi").count()
    assert(residualHot === 0,
      "compact removes the flooded buckets' residual postings")
    assert(spark.read.parquet(s"$root/buckets.parquet")
      .groupBy("band", "band_hash", "doc_id").count()
      .where($"count" > 1).count() === 0,
      "compact dedups replayed posting rows")
  }

  test("saveMinHashIndex writes meta LAST: a torn build (no meta) does " +
      "not open as a valid index") {
    val root = tmp("graft_torn_")
    val docs = Seq((1L, hotText)).toDF("doc_id", "text")
    Dedup.saveMinHashIndex(root, docs, "text", "doc_id", smallCap)
    // simulate the torn build: everything written except the commit
    // marker
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/meta.parquet"), true)
    assertThrows[Exception] { Dedup.openMinHashIndex(spark, root) }
  }

  // ------------------------------------------------------- decontam

  test("Decontam.compactIndex: distinct + coalesced gram table serves " +
      "bit-identically (both index layouts)") {
    val corpus = (0L until 40L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta doc$i tail " +
        s"word${i % 7} filler one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val bench = corpus.where($"doc_id" % 10 === 0)
      .select($"text", concat(lit("set"), $"doc_id" % 20).as("eval_set"))

    val plain = tmp("graft_dcc_plain_")
    Decontam.saveIndex(plain, bench.select($"text"), "text", n = 4)
    Decontam.saveIndex(plain,
      bench.limit(2).select($"text"), "text", n = 4) // overlapping append
    val flaggedBefore = Decontam.flagFromIndex(spark, plain, corpus,
      "text", "doc_id").orderBy("doc_id").collect().toSeq
    Decontam.compactIndex(spark, plain, targetPartitions = 1)
    assert(Decontam.flagFromIndex(spark, plain, corpus, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq === flaggedBefore)
    assert(spark.read.parquet(s"$plain/grams.parquet").count() ===
      spark.read.parquet(s"$plain/grams.parquet").distinct().count(),
      "compact leaves no duplicate gram rows")

    val labeled = tmp("graft_dcc_set_")
    Decontam.saveSetIndex(labeled, bench, "text", "eval_set", n = 4)
    Decontam.saveSetIndex(labeled, bench, "text", "eval_set", n = 4) // replay
    val reportBefore = Decontam.contaminationReportFromIndex(spark, labeled,
      corpus, "text", "doc_id").orderBy("eval_set").collect().toSeq
    Decontam.compactIndex(spark, labeled, targetPartitions = 1)
    assert(Decontam.contaminationReportFromIndex(spark, labeled, corpus,
      "text", "doc_id").orderBy("eval_set").collect().toSeq === reportBefore)
    assert(spark.read.parquet(s"$labeled/grams.parquet")
        .columns.contains("eval_set"),
      "compact preserves the set-labeled layout")
  }

  // ------------------------------------------------------------ BM25

  test("Bm25Index.append: a double-delivered increment serves the " +
      "exactly-once answer, and compact rebuilds the exactly-once index") {
    val docs = Seq(
      (1L, "spark shuffles hash join tables under spark"),
      (2L, "a hash join beats a sort merge join on small tables"),
      (3L, "spark spark spark and nothing else spark"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "hash partitioned spark join with broadcast hash side"),
      (6L, "join join join hash hash spark"))
      .toDF("doc_id", "text")
    val root = tmp("graft_replay_bm25_")
    Bm25Index.build(root, docs.where(col("doc_id") <= 3), "text", "doc_id")
    val inc = docs.where(col("doc_id") > 3)
    Bm25Index.append(root, inc, "text", "doc_id")
    Bm25Index.append(root, inc, "text", "doc_id") // replayed micro-batch

    val q = Seq("spark", "join")
    def serve() = Bm25Index.search(spark, root, q, k = 10)
      .orderBy("doc_id").collect().toSeq
    val want = TextAnalysis.bm25Search(docs, "text", "doc_id", q, k = 10)
      .orderBy("doc_id").collect().toSeq
    assert(serve() === want,
      "replayed posting rows collapse post-filter and the replayed " +
        "stats increment dedups by its content-derived batch_key — " +
        "N/T/df/tf all exactly-once")

    Bm25Index.compact(spark, root, targetPartitions = 1)
    val postings = spark.read.parquet(s"$root/postings.parquet")
    assert(postings.count() === postings.distinct().count(),
      "compact leaves no duplicate posting rows")
    assert(spark.read.parquet(s"$root/stats.parquet").count() === 1)
    assert(serve() === want,
      "serve bit-identical after the physical dedup")

    // the CROSS-COMPACT replay (round-15 review catch): a retry landing
    // AFTER the compact re-delivers its stats row under the ORIGINAL
    // batch_key, which no longer matches the collapsed row — the
    // absorbed-keys sidecar must drop it or N/T double-count
    Bm25Index.append(root, inc, "text", "doc_id")
    assert(serve() === want,
      "a replayed append delivered after a compact is absorbed: " +
        "postings collapse in the serve dedup, its stats key is retired")
    Bm25Index.compact(spark, root, targetPartitions = 1)
    assert(serve() === want,
      "and the second compact rebuilds the exactly-once index again")
  }

  test("Bm25Index absorbed-keys epoch prune: a lifetime of replayed " +
      "append+compact cycles keeps the sidecar bounded with NO manual " +
      "deletion; a beyond-horizon replay double-counts N/T until the " +
      "next compact heals it") {
    val docs = (1L to 8L).map(i =>
        (i, s"spark join document number $i with hash spark terms"))
      .toDF("doc_id", "text")
    val root = tmp("graft_absorbed_prune_")
    Bm25Index.build(root, docs.where(col("doc_id") <= 2), "text", "doc_id")
    val q = Seq("spark", "join")
    // six compact generations, each retiring its pre-compact stats keys
    // (the collapsed row's + one replayed increment's); lifetime retired
    // keys grow to ~12, but the epoch horizon (default 2) must hold the
    // sidecar at <= 4 rows — under TakedownGuard forever, no operator
    // intervention (the r15 item-4 / r16 item-3 automation)
    for (i <- 3L to 8L) {
      val inc = docs.where(col("doc_id") === i)
      Bm25Index.append(root, inc, "text", "doc_id")
      Bm25Index.append(root, inc, "text", "doc_id") // at-least-once retry
      Bm25Index.compact(spark, root, targetPartitions = 1)
      val absorbed = spark.read.parquet(s"$root/absorbed.parquet")
      assert(absorbed.columns.toSet === Set("batch_key", "epoch"))
      assert(absorbed.count() <= 4,
        s"cycle $i: sidecar must stay bounded by the epoch horizon, " +
          s"got ${absorbed.count()} rows")
    }
    def serve() = Bm25Index.search(spark, root, q, k = 10)
      .orderBy("doc_id").collect().toSeq
    val want = TextAnalysis.bm25Search(docs, "text", "doc_id", q, k = 10)
      .orderBy("doc_id").collect().toSeq
    assert(serve() === want,
      "within-horizon replays all absorbed across the whole lifetime")
    // BEYOND-horizon replay (the pinned trade-off): doc 3's increment
    // key was retired at the third compact and has aged out, so its
    // re-delivered stats row is NOT dropped — N/T double-count doc 3
    // (scores shift for every document) until the next compact rebuilds
    // stats from the postings. Candidates stay exact throughout: the
    // posting rows are byte-identical and collapse in the serve dedup.
    Bm25Index.append(root, docs.where(col("doc_id") === 3L),
      "text", "doc_id")
    val stale = serve()
    assert(stale.map(_.getLong(0)) === want.map(_.getLong(0)),
      "a beyond-horizon replay never perturbs the candidate set")
    assert(stale !== want,
      "its stats row double-counts N/T (the documented score-only " +
        "residual of the bounded sidecar)")
    Bm25Index.compact(spark, root, targetPartitions = 1)
    assert(serve() === want,
      "the next compact rebuilds stats from the postings — healed")
  }

  test("Bm25Index: re-ingest after takedown+compact — docs findable " +
      "immediately, N/T converge at the next compact (the documented " +
      "absorbed-keys residual)") {
    val docs = Seq(
      (1L, "spark shuffles hash join tables under spark"),
      (2L, "a hash join beats a sort merge join on small tables"),
      (3L, "spark spark spark and nothing else spark"),
      (4L, "hash partitioned spark join with broadcast hash side"))
      .toDF("doc_id", "text")
    val root = tmp("graft_reingest_bm25_")
    val inc = docs.where(col("doc_id") > 2)
    Bm25Index.build(root, docs.where(col("doc_id") <= 2), "text", "doc_id")
    Bm25Index.append(root, inc, "text", "doc_id")
    // takedown the increment, make it physical, then the exact same
    // content arrives again (same ids, same text -> same batch_key as
    // the RETIRED one — the ambiguous path)
    Bm25Index.delete(spark, root, inc.select("doc_id"), "doc_id")
    Bm25Index.compact(spark, root, targetPartitions = 1)
    Bm25Index.append(root, inc, "text", "doc_id")

    val q = Seq("spark", "join")
    def serve() = Bm25Index.search(spark, root, q, k = 10)
      .orderBy("doc_id").collect().toSeq
    assert(serve().map(_.getLong(0)).toSet === Set(1L, 2L, 3L, 4L),
      "re-ingested docs are findable immediately (candidates never " +
        "depend on the stats sidecar)")
    Bm25Index.compact(spark, root, targetPartitions = 1)
    val want = TextAnalysis.bm25Search(docs, "text", "doc_id", q, k = 10)
      .orderBy("doc_id").collect().toSeq
    assert(serve() === want,
      "the next compact rebuilds N/T from the postings — full " +
        "convergence with a fresh index on the re-ingested corpus")
  }

  // ------------------------------------------------------ StagedSwap

  test("StagedSwap: a failed swap rolls back to the OLD tables and keeps " +
      "the staging dir for recovery; a clean swap drops backups + staging") {
    val base = java.nio.file.Files.createTempDirectory("graft_swap_")
    val root = base.resolve("root").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((1L, "old")).toDF("id", "v").write.parquet(s"$root/a.parquet")
    Seq((2L, "old")).toDF("id", "v").write.parquet(s"$root/b.parquet")

    // staging missing table b -> swap must fail AFTER a swapped, roll a
    // back, and keep the staging dir
    val badStaging = base.resolve("stage_bad").toString
    Seq((1L, "new")).toDF("id", "v").write.parquet(s"$badStaging/a.parquet")
    val e = intercept[IllegalStateException] {
      graft.io.StagedSwap.swapIn(fs, root, badStaging,
        Seq("a.parquet", "b.parquet"))
    }
    assert(e.getMessage.contains(badStaging), "error names the kept staging")
    assert(spark.read.parquet(s"$root/a.parquet").head.getString(1) === "old",
      "rolled back: live table is still the old copy")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$badStaging/a.parquet")),
      "staging kept on disk for recovery")
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .exists(_.getPath.getName.startsWith(".old-")),
      "no backup debris after rollback")

    // clean swap: both tables land, backups and staging removed
    val okStaging = base.resolve("stage_ok").toString
    Seq((1L, "new")).toDF("id", "v").write.parquet(s"$okStaging/a.parquet")
    Seq((2L, "new")).toDF("id", "v").write.parquet(s"$okStaging/b.parquet")
    graft.io.StagedSwap.swapIn(fs, root, okStaging,
      Seq("a.parquet", "b.parquet"))
    assert(spark.read.parquet(s"$root/a.parquet").head.getString(1) === "new")
    assert(spark.read.parquet(s"$root/b.parquet").head.getString(1) === "new")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(okStaging)))
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .exists(_.getPath.getName.startsWith(".old-")))
  }

  /** A FileSystem whose rename REFUSES a chosen destination — injects
    * the mid-swap failure where a table's live copy is already renamed
    * aside but its staged copy cannot land (the in-flight table). */
  private class RenameFailFs(inner: org.apache.hadoop.fs.FileSystem,
      failSrc: String) extends org.apache.hadoop.fs.FilterFileSystem(inner) {
    override def rename(src: org.apache.hadoop.fs.Path,
        dst: org.apache.hadoop.fs.Path): Boolean =
      if (src.toUri.getPath.endsWith(failSrc)) false
      else super.rename(src, dst)
  }

  test("StagedSwap: a failure AFTER a table was renamed aside restores " +
      "that table's backup too (the in-flight table), not just the " +
      "fully-swapped ones") {
    val base = java.nio.file.Files.createTempDirectory("graft_swap_mid_")
    val root = base.resolve("root").toString
    val rawFs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((1L, "old")).toDF("id", "v").write.parquet(s"$root/a.parquet")
    Seq((2L, "old")).toDF("id", "v").write.parquet(s"$root/b.parquet")
    val staging = base.resolve("stage").toString
    Seq((1L, "new")).toDF("id", "v").write.parquet(s"$staging/a.parquet")
    Seq((2L, "new")).toDF("id", "v").write.parquet(s"$staging/b.parquet")

    // a swaps cleanly; b's live copy renames aside, then staged(b) ->
    // live(b) fails — the exact case where b is neither "swapped" nor
    // untouched, and only an aside-aware rollback restores it
    val fs = new RenameFailFs(rawFs, "stage/b.parquet")
    val e = intercept[IllegalStateException] {
      graft.io.StagedSwap.swapIn(fs, root, staging,
        Seq("a.parquet", "b.parquet"))
    }
    assert(e.getMessage.contains(staging))
    assert(spark.read.parquet(s"$root/a.parquet").head.getString(1) === "old",
      "fully-swapped table rolled back")
    assert(spark.read.parquet(s"$root/b.parquet").head.getString(1) === "old",
      "IN-FLIGHT table restored from its backup")
    assert(spark.read.parquet(s"$staging/a.parquet").head.getString(1) === "new",
      "staged copy of the swapped table returned to staging")
    assert(rawFs.exists(
      new org.apache.hadoop.fs.Path(s"$staging/b.parquet")),
      "staging kept for recovery")
    assert(!rawFs.listStatus(new org.apache.hadoop.fs.Path(root))
        .exists(_.getPath.getName.startsWith(".old-")),
      "no backup debris after rollback")
  }

  test("assertNotTorn: leftover .old-* swap backups fail index opens " +
      "loudly instead of serving mixed-generation tables") {
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val root = tmp("graft_torn_")
    Bm25Index.build(root, docs, "text", "doc_id")
    assert(Bm25Index.search(spark, root, Seq("alpha")).count() === 1)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a compact that died mid-swap: a backup left under root
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/.old-tag-stats.parquet"))
    val e = intercept[IllegalStateException] {
      Bm25Index.search(spark, root, Seq("alpha")).count()
    }
    assert(e.getMessage.contains("MID-SWAP"))
    // manual recovery (here: drop the backup) restores service
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/.old-tag-stats.parquet"),
      true)
    assert(Bm25Index.search(spark, root, Seq("alpha")).count() === 1)
    // a dot-hidden staging dir alone (harmless build phase / kept
    // recovery copy with a consistent live root) must NOT trip it
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/.compact-xyz"))
    assert(Bm25Index.search(spark, root, Seq("alpha")).count() === 1)
  }

  test("StagedSwap: rollback returns a FIRST-MATERIALIZATION table's new " +
      "copy to staging instead of leaving a mixed-version root") {
    val base = java.nio.file.Files.createTempDirectory("graft_swap_new_")
    val root = base.resolve("root").toString
    val rawFs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((1L, "old")).toDF("id", "v").write.parquet(s"$root/a.parquet")
    // c has NO live copy — first materialization
    val staging = base.resolve("stage").toString
    Seq((3L, "new")).toDF("id", "v").write.parquet(s"$staging/c.parquet")
    Seq((1L, "new")).toDF("id", "v").write.parquet(s"$staging/a.parquet")

    // c swaps in (no backup), then a's staged rename fails after a's
    // live copy moved aside
    val fs = new RenameFailFs(rawFs, "stage/a.parquet")
    intercept[IllegalStateException] {
      graft.io.StagedSwap.swapIn(fs, root, staging,
        Seq("c.parquet", "a.parquet"))
    }
    assert(spark.read.parquet(s"$root/a.parquet").head.getString(1) === "old",
      "existing table restored")
    assert(!rawFs.exists(new org.apache.hadoop.fs.Path(s"$root/c.parquet")),
      "first-materialization table absent again — the old root state")
    assert(spark.read.parquet(s"$staging/c.parquet").head.getString(1) === "new",
      "its new copy returned to staging for recovery")
  }
}
