package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Takedown (right-to-be-forgotten) contracts of the persisted indexes:
  * deletion is a marker append (no rebuild, no re-encode), every serve
  * path honors markers immediately, replayed deletes are absorbed, and
  * compaction makes the removal physical and clears the markers. */
class IndexDeleteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(16)(r.nextFloat() - 0.5f)
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("idx").toString

  test("deleteFromIvfPq: serve == brute force over the remaining corpus; " +
      "replayed deletes absorbed; compact makes it physical") {
    val root = tmp("graft_anndel_")
    val corpus = (0L until 200L).map(i => (i, vec(i.toInt))).toDF("cid", "cvec")
    val queries = (0L until 4L).map(i => (i + 500L, vec(i.toInt + 800)))
      .toDF("qid", "qvec")
    AnnIndex.buildIvfPq(corpus, dim = 16, nlist = 8, root = root,
      m = 4, codes = 8)
    val doomed = corpus.where($"cid" % 3 === 0).select("cid")
    AnnIndex.deleteFromIvfPq(spark, root, doomed)
    AnnIndex.deleteFromIvfPq(spark, root, doomed) // replayed takedown

    def serveFull() = AnnIndex.queryIvfPq(spark, root, queries, k = 3,
        nprobe = 8, rerank = 200, excludeSelf = false)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect().toSeq
    val remaining = corpus.where($"cid" % 3 =!= 0)
    val exact = Similarity.bruteForceTopK(remaining, queries, k = 3,
        excludeSelf = false)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect().toSeq
    assert(serveFull() === exact,
      "full-probing serve after delete == brute force on the remaining " +
        "corpus (replayed markers collapse)")

    // pruned settings: a deleted id must never appear at ANY serve tier
    val pruned = AnnIndex.queryIvfPq(spark, root, queries, k = 3,
        nprobe = 3, rerank = 10, excludeSelf = false)
      .select("corpus_id").collect().map(_.getLong(0))
    assert(pruned.forall(_ % 3 != 0), "no deleted id at pruned settings")
    // mineTopK (distributed-query path) honors markers too
    val mined = AnnIndex.mineTopK(spark, root, queries, k = 3,
        nprobe = 3, rerank = 10)
      .select("corpus_id").collect().map(_.getLong(0))
    assert(mined.nonEmpty && mined.forall(_ % 3 != 0))

    val before = serveFull()
    AnnIndex.compactIvfPq(spark, root, nlist = 8, m = 4, codes = 8)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/deletes.parquet")),
      "compact clears the takedown markers")
    assert(spark.read.parquet(s"$root/encoded.parquet").count() === 133,
      "compact physically removed the deleted rows (200 - 67)")
    assert(serveFull() === before,
      "serve bit-identical before and after the physical removal")
  }

  test("deleteFromMinHashIndex: flags == an index built on the remaining " +
      "docs; compact makes it physical and clears markers") {
    val texts = Seq(
      (1L, "alpha beta gamma delta epsilon zeta the quick brown fox"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed"),
      (4L, "pack my box with five dozen liquor jugs right now please"))
      .toDF("doc_id", "text")
    val arrivals = texts.select(($"doc_id" + 100L).as("doc_id"), $"text")

    val root = tmp("graft_nddel_")
    Dedup.saveMinHashIndex(root, texts, "text", "doc_id")
    Dedup.deleteFromMinHashIndex(root,
      texts.where($"doc_id" % 2 === 1).select($"doc_id"), "doc_id")
    def flags(r: String) =
      Dedup.flagAgainstIndex(spark, r, arrivals, "text", "doc_id")
        .orderBy("doc_id", "dup_of").collect().toSeq
    val served = flags(root)
    assert(served.map(_.getLong(1)).forall(_ % 2 == 0) && served.nonEmpty,
      "no deleted doc is ever flagged as dup_of")

    val fresh = tmp("graft_nddel_fresh_")
    Dedup.saveMinHashIndex(fresh, texts.where($"doc_id" % 2 === 0),
      "text", "doc_id")
    assert(served === flags(fresh),
      "marker-deleted serve == index built without the deleted docs " +
        "(no-flood fixture: tombstone histories coincide)")

    Dedup.compactMinHashIndex(spark, root, targetPartitions = 1)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/deletes.parquet")))
    assert(spark.read.parquet(s"$root/fps.parquet").count() === 2,
      "compact physically removed the deleted docs' fingerprints")
    assert(spark.read.parquet(s"$root/buckets.parquet")
        .where($"doc_id" % 2 === 1).count() === 0,
      "compact physically removed the deleted docs' postings")
    assert(flags(root) === served,
      "serve bit-identical before and after the physical removal")
  }

  test("Bm25Index.delete: serve == direct bm25Search over the remaining " +
      "corpus; replayed deletes absorbed; compact makes it physical " +
      "and serves bit-identically") {
    val docs = Seq(
      (1L, "spark shuffles hash join tables under spark"),
      (2L, "a hash join beats a sort merge join on small tables"),
      (3L, "spark spark spark and nothing else spark"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "hash partitioned spark join with broadcast hash side"),
      (6L, "join join join hash hash spark"))
      .toDF("doc_id", "text")
    val root = tmp("graft_bmdel_")
    Bm25Index.build(root, docs.where($"doc_id" <= 3), "text", "doc_id")
    Bm25Index.append(root, docs.where($"doc_id" > 3), "text", "doc_id")
    val doomed = docs.where($"doc_id" % 2 === 0).select("doc_id")
    Bm25Index.delete(spark, root, doomed, "doc_id")
    Bm25Index.delete(spark, root, doomed, "doc_id") // replayed takedown

    val q = Seq("spark", "join")
    def serve() = Bm25Index.search(spark, root, q, k = 10)
      .orderBy("doc_id").collect().toSeq
    val want = TextAnalysis.bm25Search(docs.where($"doc_id" % 2 =!= 0),
        "text", "doc_id", q, k = 10)
      .orderBy("doc_id").collect().toSeq
    assert(serve() === want,
      "marker-deleted serve == direct search over the remaining corpus " +
        "(df, dl, N, T all reflect the takedown; replayed markers collapse)")

    val before = serve()
    Bm25Index.compact(spark, root, targetPartitions = 1)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/deletes.parquet")),
      "compact clears the takedown markers")
    assert(spark.read.parquet(s"$root/postings.parquet")
        .where($"doc_id" % 2 === 0).count() === 0,
      "compact physically removed the deleted docs' postings")
    assert(spark.read.parquet(s"$root/stats.parquet").count() === 1,
      "compact collapsed the stats increments to one row")
    assert(serve() === before,
      "serve bit-identical before and after the physical removal")

    // the compact-crash window (round-15 review catch): markers clear
    // AS PART of the staged swap, so the only post-swap marker state a
    // crash can leave is an EMPTY table — which must serve identically
    // (the old post-swap-delete design could leave REAL markers whose
    // dl would double-subtract from the compacted N/T)
    spark.emptyDataset[(Long, java.lang.Long)].toDF("doc_id", "dl")
      .write.parquet(s"$root/deletes.parquet")
    assert(serve() === before,
      "an empty marker table (the only reachable post-swap crash " +
        "residue) serves bit-identically")

    // a takedown for an id never indexed is a no-op (dl null marker)
    Bm25Index.delete(spark, root, Seq(999L).toDF("doc_id"), "doc_id")
    assert(serve() === before)
  }

  test("Bm25Index.searchMany: batch == per-query serve row-for-row; " +
      "pushdown and semi-join filter modes identical; markers honored") {
    val docs = Seq(
      (1L, "spark shuffles hash join tables under spark"),
      (2L, "a hash join beats a sort merge join on small tables"),
      (3L, "spark spark spark and nothing else spark"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "hash partitioned spark join with broadcast hash side"),
      (6L, "join join join hash hash spark"))
      .toDF("doc_id", "text")
    val root = tmp("graft_bmmany_")
    Bm25Index.build(root, docs, "text", "doc_id")
    Bm25Index.delete(spark, root, Seq(4L).toDF("doc_id"), "doc_id")
    val ix = Bm25Index.open(spark, root)
    val batches = Seq(
      0L -> Seq("spark", "tables"),
      1L -> Seq("hash", "join"),
      2L -> Seq("merge", "broadcast"))
    val queries = batches
      .flatMap { case (q, ts) => ts.map(q -> _) }.toDF("qid", "term")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "doc_id").collect().toSeq
    val pushed = rows(ix.searchMany(queries, k = 10))
    assert(pushed === rows(ix.searchMany(queries, k = 10,
        pushDownTerms = 0)),
      "isin-pushdown and broadcast-semi-join vocabulary filters must " +
        "serve identically")
    // per-query equivalence: each qid's (doc, score, n_terms) equals
    // its own single-query serve, and lex_rank equals that serve's
    // rank order
    batches.foreach { case (qid, terms) =>
      val single = ix.search(terms, k = 10)
        .orderBy(col("score").desc, col("doc_id"))
        .collect().toSeq
      val mine = pushed.filter(_.getLong(0) == qid)
        .sortBy(_.getLong(4)) // lex_rank
      assert(mine.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
          === single.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))),
        s"qid=$qid: batch serve diverged from the single-query serve")
    }
    assert(!pushed.exists(_.getLong(1) == 4L),
      "a taken-down doc must appear in NO query's list")
  }

  test("Bm25Index: a torn build (no meta) does not open; delete/append/" +
      "search all refuse it") {
    val root = tmp("graft_bmtorn_")
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    // simulate the torn state: postings+stats written, meta never landed
    graft.ext.TextAnalysis.bm25Index(docs, "text", "doc_id")
      .write.parquet(s"$root/postings.parquet")
    assertThrows[IllegalArgumentException] {
      Bm25Index.search(spark, root, Seq("alpha"))
    }
    assertThrows[IllegalArgumentException] {
      Bm25Index.append(root, docs, "text", "doc_id")
    }
    assertThrows[IllegalArgumentException] {
      Bm25Index.delete(spark, root, docs.select("doc_id"), "doc_id")
    }
    // retrying build() IS the documented recovery: meta is written last,
    // so a meta-less root can only be a crashed build — the retry clears
    // the partial artifacts (errorifexists would otherwise refuse the
    // leftover postings.parquet) and commits
    Bm25Index.build(root, docs, "text", "doc_id")
    assert(Bm25Index.search(spark, root, Seq("alpha")).count() === 1)
    // a COMMITTED root refuses build (rebuilding live state is
    // compact's job; overwriting would discard appends + markers)
    val e = intercept[IllegalArgumentException] {
      Bm25Index.build(root, docs, "text", "doc_id")
    }
    assert(e.getMessage.contains("already a committed index"))
  }

  test("Bm25Index.open: the pre-opened handle serves the LIVE index — " +
      "append/delete/compact through it are visible to the next search, " +
      "and handle serve == static serve bit-for-bit") {
    val docs = Seq(
      (1L, "spark shuffles hash join tables under spark"),
      (2L, "a hash join beats a sort merge join on small tables"),
      (3L, "spark spark spark and nothing else spark"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "hash partitioned spark join with broadcast hash side"),
      (6L, "join join join hash hash spark"))
      .toDF("doc_id", "text")
    val root = tmp("graft_bmopened_")
    Bm25Index.build(root, docs.where($"doc_id" <= 3), "text", "doc_id")
    val ix = Bm25Index.open(spark, root)
    val q = Seq("spark", "join")
    def handleServe() = ix.search(q, k = 10).orderBy("doc_id").collect().toSeq
    def want(remaining: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bm25Search(remaining, "text", "doc_id", q, k = 10)
        .orderBy("doc_id").collect().toSeq
    assert(handleServe() === want(docs.where($"doc_id" <= 3)))

    // append through the handle: the next serve must see it (no snapshot)
    ix.append(docs.where($"doc_id" > 3), "text", "doc_id")
    assert(handleServe() === want(docs))
    // takedown through the handle: immediately visible, N/T folded
    ix.delete(docs.where($"doc_id" % 2 === 0).select("doc_id"), "doc_id")
    val remaining = docs.where($"doc_id" % 2 =!= 0)
    assert(handleServe() === want(remaining))
    // handle serve == static serve (same impl, no behavioral fork)
    assert(handleServe() ===
      Bm25Index.search(spark, root, q, k = 10)
        .orderBy("doc_id").collect().toSeq)
    // compact through the handle: the handle stays valid and the serve
    // is bit-identical after the physical removal
    val before = handleServe()
    ix.compact(targetPartitions = 1)
    assert(handleServe() === before)
    assert(spark.read.parquet(s"$root/postings.parquet")
      .where($"doc_id" % 2 === 0).count() === 0)
  }

  test("TakedownGuard cache (graft.takedown.guardCacheMs): a cached PASS " +
      "skips re-measuring within the window; cacheMs=0 re-measures; a " +
      "tightened threshold invalidates prior passes") {
    val dir = new org.apache.hadoop.fs.Path(
      tmp("graft_guardcache_"), "deletes.parquet")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    def fill(bytes: Int): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, "part-0"), true)
      out.write(new Array[Byte](bytes)); out.close()
    }
    def check() = graft.io.TakedownGuard.check(spark, dir, "cache-spec")
    try {
      spark.conf.set(graft.io.TakedownGuard.confKey, "100")
      fill(10)
      // no cache: every call re-measures, so growth past the limit throws
      spark.conf.set(graft.io.TakedownGuard.cacheConfKey, "0")
      check()
      fill(1000)
      assertThrows[IllegalStateException](check())
      // cached pass: re-shrink, pass once with a long window, grow again
      // — the stale PASS is honored (the documented bounded staleness)
      fill(10)
      spark.conf.set(graft.io.TakedownGuard.cacheConfKey, "600000")
      check()
      fill(1000)
      check() // would throw without the cache
      // a TIGHTENED threshold must not ride an old pass
      spark.conf.set(graft.io.TakedownGuard.confKey, "5")
      assertThrows[IllegalStateException](check())
      // failures are never cached: on a FRESH dir (no prior pass in the
      // window) an oversized table throws on every call, and a shrink
      // (= the compact remedy) passes immediately — no wait-out-the-window
      spark.conf.set(graft.io.TakedownGuard.confKey, "100")
      val dir2 = new org.apache.hadoop.fs.Path(
        tmp("graft_guardcache2_"), "deletes.parquet")
      fs.mkdirs(dir2)
      def fill2(bytes: Int): Unit = {
        val out = fs.create(new org.apache.hadoop.fs.Path(dir2, "part-0"), true)
        out.write(new Array[Byte](bytes)); out.close()
      }
      def check2() = graft.io.TakedownGuard.check(spark, dir2, "cache-spec")
      fill2(1000)
      assertThrows[IllegalStateException](check2())
      assertThrows[IllegalStateException](check2())
      fill2(10)
      check2()
    } finally {
      spark.conf.unset(graft.io.TakedownGuard.confKey)
      spark.conf.unset(graft.io.TakedownGuard.cacheConfKey)
    }
  }

  test("TakedownGuard: a marker table past graft.takedown.maxMarkerBytes " +
      "fails serves loudly, never compaction (the prescribed fix)") {
    val root = tmp("graft_guard_")
    val corpus = (0L until 60L).map(i => (i, vec(i.toInt))).toDF("cid", "cvec")
    val queries = Seq((500L, vec(901))).toDF("qid", "qvec")
    AnnIndex.buildIvfPq(corpus, dim = 16, nlist = 4, root = root,
      m = 4, codes = 8)
    AnnIndex.deleteFromIvfPq(spark, root,
      corpus.where($"cid" % 3 === 0).select("cid"))
    def serve() = AnnIndex.queryIvfPq(spark, root, queries, k = 3,
      nprobe = 4, rerank = 60, excludeSelf = false).collect()

    val key = graft.io.TakedownGuard.confKey
    try {
      // any non-empty marker table exceeds a 1-byte threshold
      spark.conf.set(key, "1")
      val e = intercept[IllegalStateException](serve())
      assert(e.getMessage.contains("compact"),
        "the error prescribes the fix")
      // the MinHash serve path enforces the same premise
      val texts = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text")
      val ndRoot = tmp("graft_guard_nd_")
      Dedup.saveMinHashIndex(ndRoot, texts, "text", "doc_id")
      Dedup.deleteFromMinHashIndex(ndRoot, texts.select($"doc_id"), "doc_id")
      intercept[IllegalStateException] {
        Dedup.flagAgainstIndex(spark, ndRoot, texts, "text", "doc_id")
          .collect()
      }
      // compaction is EXEMPT — it is what the guard tells the operator
      // to run, and it must work exactly when the guard is firing
      AnnIndex.compactIvfPq(spark, root, nlist = 4, m = 4, codes = 8)
      Dedup.compactMinHashIndex(spark, ndRoot, targetPartitions = 1)
      assert(serve().nonEmpty, "markers cleared by compact: serves again")
      // <= 0 disables the guard outright
      AnnIndex.deleteFromIvfPq(spark, root,
        corpus.where($"cid" === 1L).select("cid"))
      spark.conf.set(key, "0")
      assert(serve().nonEmpty)
    } finally spark.conf.unset(key)
  }

  test("Decontam.removeSetFromIndex: result == an index that never held " +
      "the set; absent set and unlabeled index fail fast") {
    val corpus = (0L until 30L).map(i =>
      (i, s"alpha beta gamma delta doc$i tail word${i % 5} six seven"))
      .toDF("doc_id", "text")
    val bench = corpus.where($"doc_id" % 5 === 0)
      .select(when($"doc_id" % 10 === 0, lit("keep")).otherwise(lit("gone"))
        .as("eval_set"), $"text")

    val root = tmp("graft_dcrm_")
    Decontam.saveSetIndex(root, bench, "text", "eval_set", n = 4)
    Decontam.removeSetFromIndex(spark, root, "gone")
    val fresh = tmp("graft_dcrm_fresh_")
    Decontam.saveSetIndex(fresh, bench.where($"eval_set" === "keep"),
      "text", "eval_set", n = 4)
    val got = spark.read.parquet(s"$root/grams.parquet")
      .orderBy("eval_set", "gram").collect().toSeq
    val want = spark.read.parquet(s"$fresh/grams.parquet")
      .orderBy("eval_set", "gram").collect().toSeq
    assert(got === want, "gram table == fresh index without the set")
    val report = Decontam.contaminationReportFromIndex(spark, root,
      corpus, "text", "doc_id").collect()
    assert(report.map(_.getString(0)).toSeq === Seq("keep"),
      "the removed set's identity is gone from the all-sets frame")

    assertThrows[IllegalArgumentException] {
      Decontam.removeSetFromIndex(spark, root, "never_existed")
    }
    val plain = tmp("graft_dcrm_plain_")
    Decontam.saveIndex(plain, bench.select($"text"), "text", n = 4)
    assertThrows[IllegalArgumentException] {
      Decontam.removeSetFromIndex(spark, plain, "keep")
    }
  }
}
