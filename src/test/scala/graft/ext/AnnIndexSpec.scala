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

  test("mineHardNegatives: full probing equals brute-force cross-label " +
      "mining with the WHOLE CORPUS as the query set") {
    val root = java.nio.file.Files.createTempDirectory("graft_annmine_")
      .resolve("idx").toString
    val labeled = (0L until 200L).map(i => (i, vec(i.toInt), s"lab${i % 4}"))
    val corpus = labeled.map(v => (v._1, v._2)).toDF("cid", "cvec")
    AnnIndex.buildIvfPq(corpus, dim = 16, nlist = 8, root = root,
      m = 4, codes = 8)
    // the training-set-scale contract: queries = the corpus itself
    // (|Q| = |C|), which the broadcast-query shape cannot serve
    val queries = labeled.toDF("qid", "qvec", "qlab")
    val labels = labeled.map(v => (v._1, v._3)).toDF("cid", "clab")
    val mined = AnnIndex.mineHardNegatives(spark, root, queries, labels,
        k = 4, nprobe = 8, rerank = 200)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect()
    val brute = Similarity.hardNegatives(
        labeled.map(v => (v._1, v._2, v._3)).toDF("cid", "cvec", "clab"),
        queries, k = 4)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect()
    assert(mined.length === 200 * 4)
    assert(mined.toSeq === brute.toSeq)
    // label filter BEFORE the rerank cut: even a rerank budget smaller
    // than a bucket's same-label majority still yields k cross-label
    // rows per query (same-label candidates never occupy rerank slots)
    val tight = AnnIndex.mineHardNegatives(spark, root, queries, labels,
      k = 2, nprobe = 8, rerank = 2).collect()
    assert(tight.length === 200 * 2)
    val byLab = labeled.map(v => (v._1, v._3)).toMap
    tight.foreach { r =>
      assert(byLab(r.getAs[Long]("query_id")) !=
        byLab(r.getAs[Long]("corpus_id")))
    }
  }

  test("mineTopK: distributed-query serve at full probing equals " +
      "brute force; excludeSelf drops the identity pair") {
    val root = java.nio.file.Files.createTempDirectory("graft_annmtk_")
      .resolve("idx").toString
    val corpus = (0L until 150L).map(i => (i, vec(i.toInt))).toDF("cid", "cvec")
    AnnIndex.buildIvfPq(corpus, dim = 16, nlist = 6, root = root,
      m = 4, codes = 8)
    // disjoint query ids: the bitext shape (no self pairs possible)
    val queries = (1000L until 1100L).map(i => (i, vec(i.toInt)))
      .toDF("qid", "qvec")
    val served = AnnIndex.mineTopK(spark, root, queries, k = 5,
        nprobe = 6, rerank = 150)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect()
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 5,
        excludeSelf = false)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect()
    assert(served.length === 100 * 5)
    assert(served.toSeq === brute.toSeq)
    // queries that ARE corpus rows: excludeSelf drops cid == qid
    val selfQ = (0L until 10L).map(i => (i, vec(i.toInt))).toDF("qid", "qvec")
    val noSelf = AnnIndex.mineTopK(spark, root, selfQ, k = 5,
      nprobe = 6, rerank = 150, excludeSelf = true).collect()
    assert(!noSelf.exists(r =>
      r.getAs[Long]("query_id") == r.getAs[Long]("corpus_id")))
    val withSelf = AnnIndex.mineTopK(spark, root, selfQ, k = 1,
      nprobe = 6, rerank = 150).collect()
    assert(withSelf.forall(r =>
      r.getAs[Long]("query_id") == r.getAs[Long]("corpus_id")),
      "a corpus row's own top-1 is itself when self pairs are allowed")
  }

  test("compactIvfPq: re-trains from the index's own vectors — the " +
      "compacted tables equal a fresh build on the union bit-for-bit, " +
      "appended file sprawl coalesces, and a re-tuned nlist still " +
      "serves exactly under full probing") {
    val base = java.nio.file.Files.createTempDirectory("graft_anncompact_")
    val root = base.resolve("idx").toString
    val fresh = base.resolve("fresh_idx").toString
    val corpus = (0L until 200L).map(i => (i, vec(i.toInt))).toDF("cid", "cvec")
    AnnIndex.buildIvfPq(corpus.where($"cid" < 150), dim = 16, nlist = 8,
      root = root, m = 4, codes = 8, refineIters = 2)
    // three appends: the file-sprawl + centroid-drift scenario
    Seq((150L, 170L), (170L, 190L), (190L, 200L)).foreach { case (lo, hi) =>
      AnnIndex.appendIvfPq(spark, root,
        corpus.where($"cid" >= lo && $"cid" < hi))
    }
    val sprawl = spark.read.parquet(s"$root/encoded.parquet")
      .inputFiles.length
    AnnIndex.compactIvfPq(spark, root, nlist = 8, m = 4, codes = 8,
      refineIters = 0, targetPartitions = 1)
    assert(spark.read.parquet(s"$root/encoded.parquet")
      .inputFiles.length < sprawl, "compaction must coalesce files")
    assert(spark.read.parquet(s"$root/encoded.parquet").count() === 200)
    // hash-ordered samples are arrival-order-independent, so the
    // compacted index == buildIvfPq run fresh on the union
    AnnIndex.buildIvfPq(corpus, dim = 16, nlist = 8, root = fresh,
      m = 4, codes = 8, refineIters = 0)
    def table(r: String, t: String) =
      spark.read.parquet(s"$r/$t").collect()
        .map(_.toSeq.map {
          case a: Seq[_] => a.toList
          case x => x
        }).sortBy(_.mkString("|")).toSeq
    Seq("meta.parquet", "centroids.parquet", "codebook.parquet",
        "encoded.parquet").foreach { t =>
      assert(table(root, t) === table(fresh, t),
        s"compacted $t differs from the fresh union build")
    }
    // re-tune at compact time (the capacity rule as the corpus grows):
    // nlist changes, full probing must still equal exact KNN
    AnnIndex.compactIvfPq(spark, root, nlist = 13, m = 4, codes = 8)
    val queries = (1000L until 1005L).map(i => (i, vec(i.toInt)))
      .toDF("qid", "qvec")
    val served = AnnIndex.queryIvfPq(spark, root, queries, k = 3,
        nprobe = 13, rerank = 200, excludeSelf = false)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect()
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3,
        excludeSelf = false)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect()
    assert(served.toSeq === exact.toSeq)
    assert(spark.read.parquet(s"$root/meta.parquet").head
      .getAs[Int]("nlist") === 13, "meta must record the re-tuned nlist")
  }

  test("lifecycle interplay: appends through an opened handle, then " +
      "compact, then RE-OPEN — the fresh handle serves the re-trained " +
      "index exactly while the stale handle still holds old centroids") {
    val root = java.nio.file.Files.createTempDirectory("graft_annlife_")
      .resolve("idx").toString
    val corpus = (0L until 200L).map(i => (i, vec(i.toInt))).toDF("cid", "cvec")
    AnnIndex.buildIvfPq(corpus.where($"cid" < 120), dim = 16, nlist = 6,
      root = root, m = 4, codes = 8)
    val h1 = AnnIndex.open(spark, root)
    AnnIndex.appendIvfPq(h1, corpus.where($"cid" >= 120 && $"cid" < 160))
    AnnIndex.appendIvfPq(h1, corpus.where($"cid" >= 160))
    AnnIndex.compactIvfPq(spark, root, nlist = 9, m = 4, codes = 8)
    // the documented hazard: a pre-compact handle carries the OLD
    // metadata driver-side (nlist 6, old centroids)
    assert(h1.nlist === 6)
    val h2 = AnnIndex.open(spark, root)
    assert(h2.nlist === 9, "re-open must see the re-tuned index")
    val queries = (2000L until 2005L).map(i => (i, vec(i.toInt)))
      .toDF("qid", "qvec")
    val served = AnnIndex.queryIvfPq(h2, queries, k = 3, nprobe = 9,
        rerank = 200, excludeSelf = false)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect()
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3,
        excludeSelf = false)
      .select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect()
    assert(served.toSeq === exact.toSeq)
  }

  test("hard-negative mining NULL-label semantics (pinned, both " +
      "shapes): NULL qlab mines nothing, NULL clab is never mined") {
    val root = java.nio.file.Files.createTempDirectory("graft_annnull_")
      .resolve("idx").toString
    val corpus = (0L until 60L).map(i => (i, vec(i.toInt))).toDF("cid", "cvec")
    AnnIndex.buildIvfPq(corpus, dim = 16, nlist = 4, root = root,
      m = 4, codes = 8)
    // corpus rows 0..39 labeled, 40..59 NULL-labeled
    val labels = (0L until 60L)
      .map(i => (i, if (i < 40) s"lab${i % 3}" else null))
      .toDF("cid", "clab")
    // query 0 labeled, query 1 NULL-labeled
    val queries = Seq((1000L, vec(7), "lab0"), (1001L, vec(8), null))
      .toDF("qid", "qvec", "qlab")
    val mined = AnnIndex.mineHardNegatives(spark, root, queries, labels,
      k = 50, nprobe = 4, rerank = 60).collect()
    assert(!mined.exists(_.getAs[Long]("query_id") == 1001L),
      "a NULL-qlab query must mine nothing")
    assert(mined.forall(_.getAs[Long]("corpus_id") < 40L),
      "NULL-clab corpus rows must never be mined")
    assert(mined.nonEmpty)
    // broadcast brute-force shape agrees
    val full = corpus.join(labels, Seq("cid"))
    val brute = Similarity.hardNegatives(full, queries, k = 50).collect()
    assert(!brute.exists(_.getAs[Long]("query_id") == 1001L))
    assert(brute.forall(_.getAs[Long]("corpus_id") < 40L))
    assert(brute.map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("corpus_id"))).toSet ===
      mined.map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("corpus_id"))).toSet)
  }

  test("ivfPqTopK recall@k: degrades gracefully with nprobe, " +
      "monotone non-decreasing toward exact") {
    val corpus = (0L until 500L).map(i => (i, vec(i.toInt))).toDF("cid", "cvec")
    val queries = (1000L until 1020L).map(i => (i, vec(i.toInt)))
      .toDF("qid", "qvec")
    val k = 5
    val exact = Similarity.bruteForceTopK(corpus, queries, k,
        excludeSelf = false)
      .select("query_id", "corpus_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    def recallAt(nprobe: Int, rerank: Int): Double = {
      val got = Similarity.ivfPqTopK(corpus, queries, k, dim = 16,
          nlist = 8, nprobe = nprobe, m = 4, codes = 8, rerank = rerank,
          excludeSelf = false)
        .select("query_id", "corpus_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val hits = exact.map { case (q, ids) =>
        (ids intersect got.getOrElse(q, Set.empty)).size }.sum
      hits.toDouble / (exact.size * k)
    }

    // Probing axis (fixed rerank budget): random uniform vectors are
    // the HARD case for IVF (no cluster structure) — still, a quarter
    // of the lists must find most neighbors, and recall must not
    // decrease as probing widens.
    val r2 = recallAt(2, 40); val r4 = recallAt(4, 40); val r8 = recallAt(8, 40)
    assert(r2 >= 0.5, s"recall@5 with nprobe=2 was $r2")
    assert(r4 >= r2 && r8 >= r4, s"recall must be monotone: $r2 / $r4 / $r8")
    // Rerank axis: at full probing the residual loss is ADC candidate
    // ordering, which a corpus-wide exact rerank removes entirely.
    val rFull = recallAt(8, 500)
    assert(rFull === 1.0, s"full probing + corpus-wide rerank was $rFull")
    assert(rFull >= r8, "wider rerank can only help")
  }
}
