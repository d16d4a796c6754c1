package graft.ext

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PERSISTED IVF-PQ ANN index — the production serving path that
  * [[Similarity.ivfPqTopK]]'s inline build amortizes away from: build
  * the index ONCE (centroids, PQ codebook, encoded corpus on disk),
  * then serve any number of query batches against it and append new
  * vectors incrementally, never re-reading or re-encoding the existing
  * corpus. At 100 TB the build is the expensive pass (full corpus scan +
  * encode); queries touch only `nprobe/nlist` of the encoded table (a
  * few percent) and appends touch only the new rows.
  *
  * Layout under `root` (plain parquet — same crash-safety story as the
  * rest of the engine's sinks; wrap the root in
  * [[graft.sink.VersionedTable]] if index snapshots must be
  * time-travelable):
  *
  *   meta.parquet       (dim, m, codes, nlist) — one row
  *   centroids.parquet  (centroid_id, centroid_vec)
  *   codebook.parquet   (m_idx, code_id, subvec)
  *   encoded.parquet    (cid, centroid_id, codes, cvec)
  *
  * `encoded` keeps the raw float vector alongside the PQ codes: the
  * exact re-rank needs it, and at scale the column is read ONLY for the
  * rerank survivors (parquet column pruning — the ADC scan projects
  * just (cid, centroid_id, codes)). Append is single-writer by design,
  * like every plain-parquet sink here.
  *
  * Same conventions as the Similarity family: corpus/new vectors are
  * (cid BIGINT, cvec ARRAY<FLOAT>), queries (qid BIGINT, qvec
  * ARRAY<FLOAT>) broadcast-small, centroid sampling is the
  * ANSI-replayable multiplicative hash, output is
  * (query_id, corpus_id, cosine, rank).
  */
object AnnIndex {

  private def hashKey = pmod(col("cid") * lit(2654435761L), lit(2147483647L))

  /** Build the index from `corpus` and persist it under `root`. One
    * corpus pass for the encode (narrow, no exchange), plus the
    * centroid sample (+ optional Lloyd refinement) and a `codes`-sized
    * codebook sample — identical math to [[Similarity.ivfPqTopK]]'s
    * inline build, so a full-probing query over the persisted index
    * equals exact KNN the same way the s7 gate pins. */
  def buildIvfPq(corpus: DataFrame, dim: Int, nlist: Int, root: String,
      m: Int = 8, codes: Int = 16, refineIters: Int = 0): Unit = {
    require(dim % m == 0, s"buildIvfPq: dim=$dim not divisible by m=$m")
    val spark = corpus.sparkSession
    val subDim = dim / m

    val sampled = corpus.orderBy(hashKey, col("cid"))
      .limit(nlist)
      .select(col("cid").as("centroid_id"), col("cvec").as("centroid_vec"))
    val centroidsDf =
      if (refineIters > 0) Similarity.refineCentroids(corpus, sampled, refineIters)
      else sampled

    val sampledCb = corpus.orderBy(hashKey, col("cid"))
      .limit(codes).select(col("cvec")).collect()
    require(sampledCb.length == codes,
      s"buildIvfPq: corpus smaller than codes=$codes")
    val codebookRows = for {
      mi <- 0 until m
      (row, ci) <- sampledCb.zipWithIndex
    } yield (mi, ci,
      row.getSeq[Float](0).slice(mi * subDim, (mi + 1) * subDim)
        .map(_.toDouble))
    import spark.implicits._
    Seq((dim, m, codes, nlist)).toDF("dim", "m", "codes", "nlist")
      .write.mode("errorifexists").parquet(s"$root/meta.parquet")
    centroidsDf.write.mode("errorifexists").parquet(s"$root/centroids.parquet")
    codebookRows.toDF("m_idx", "code_id", "subvec")
      .write.mode("errorifexists").parquet(s"$root/codebook.parquet")
    encode(spark, root, corpus, "errorifexists")
  }

  /** Append `newVectors` to an existing index: encode them with the
    * SAVED centroids and codebook (one narrow pass over the new rows
    * only) and append to the encoded table. Centroids are NOT re-fit —
    * the published IVF trade: cluster balance degrades as the appended
    * fraction grows; rebuild when it does. Exactness of full-probing
    * queries is unaffected (the s10 gate pins it).
    *
    * At-least-once delivery (a streaming foreachBatch replaying a batch
    * after a failure) duplicates encoded rows; every serve path absorbs
    * that at read time — [[Similarity.TopKAggregator]] collapses
    * duplicate (id, score) observations, so the replayed index serves
    * the exactly-once answer (ReplayedAppendSpec pins it), and
    * [[compactIvfPq]] dedups rows by cid, so a compact after a replay
    * also rebuilds the exactly-once index physically. */
  def appendIvfPq(spark: SparkSession, root: String,
      newVectors: DataFrame): Unit =
    encode(spark, root, newVectors, "append")

  /** [[appendIvfPq]] against an already-[[open]]ed index — an INGEST
    * stream appending one micro-batch per trigger pays zero per-call
    * metadata jobs (the saved centroids/codebook ride the handle). */
  def appendIvfPq(index: Opened, newVectors: DataFrame): Unit =
    encodeWith(index.root, newVectors, index.centIds, index.centVecs,
      index.codebook, "append")

  /** Delete vectors from the index (takedown / right-to-be-forgotten —
    * a removal request against a 100-TB corpus must not force an index
    * rebuild): the ids append to a `deletes.parquet` marker table; every
    * serve path anti-joins it (so a deleted vector can neither be a
    * candidate nor a rerank survivor, effective immediately), and the
    * next [[compactIvfPq]] removes the rows physically and clears the
    * markers. Idempotent under replay (markers are distinct'd at read).
    * Scale premise: takedown lists are small relative to the corpus
    * (the markers broadcast); a deletion set that stops being small is
    * a rebuild, not a marker list — ENFORCED by
    * [[graft.io.TakedownGuard]]: serve paths fail loudly once the
    * marker table outgrows `graft.takedown.maxMarkerBytes`, pointing
    * at [[compactIvfPq]]. `ids`: one `cid` column. */
  def deleteFromIvfPq(spark: SparkSession, root: String,
      ids: DataFrame): Unit =
    // coalesce(1): a takedown list is broadcast-small by premise, and
    // every delete call appends — hundreds of calls between compacts
    // must accrete one file each, not a shuffle-partition fan per call
    ids.select(col("cid")).distinct().coalesce(1)
      .write.mode("append").parquet(s"$root/deletes.parquet")

  /** The encoded table minus delete markers — what every serve path
    * reads. The existence check is one driver-side FS call, so an index
    * with no deletions (the common case, and every pre-r14 index) plans
    * exactly as before: no extra scan, no extra join. */
  private def liveEncoded(spark: SparkSession, root: String,
      guard: Boolean = true): DataFrame = {
    val enc = spark.read.parquet(s"$root/encoded.parquet")
    val del = new org.apache.hadoop.fs.Path(s"$root/deletes.parquet")
    if (del.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(del)) {
      // loud enforcement of the broadcast-small marker premise on SERVE
      // paths — see TakedownGuard. Compaction passes guard=false: it is
      // the operation the guard tells the operator to run, and its
      // anti-join is one shuffle in a full-rewrite job, not a
      // per-query broadcast.
      if (guard) graft.io.TakedownGuard.check(spark, del, "AnnIndex")
      enc.join(
        broadcast(spark.read.parquet(del.toString).select("cid").distinct()),
        Seq("cid"), "left_anti")
    } else enc
  }

  private def encode(spark: SparkSession, root: String, vectors: DataFrame,
      mode: String): Unit = {
    val (centIds, centVecs) = loadCentroids(spark, root)
    val codebook = loadCodebook(spark, root)
    encodeWith(root, vectors, centIds, centVecs, codebook, mode)
  }

  private def encodeWith(root: String, vectors: DataFrame,
      centIds: Array[Long], centVecs: Array[Array[Double]],
      codebook: Array[Array[Array[Double]]], mode: String): Unit =
    vectors.select(col("cid"),
        GraftFunctions.nearestCentroid(col("cvec"), centIds, centVecs)
          .as("centroid_id"),
        GraftFunctions.pqEncode(col("cvec"), codebook).as("codes"),
        col("cvec"))
      .write.mode(mode).parquet(s"$root/encoded.parquet")

  /** Top-k serve against the persisted index: probe the `nprobe` best
    * centroid buckets per query, ADC-scan ONLY probed buckets (the scan
    * projects (cid, centroid_id, codes) — the raw-vector column is
    * never read here), exact-cosine re-rank the `rerank` ADC survivors.
    * The index is never rebuilt, re-encoded, or fully scanned. */
  def queryIvfPq(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int, rerank: Int,
      excludeSelf: Boolean = true): DataFrame =
    queryIvfPq(open(spark, root), queries, k, nprobe, rerank, excludeSelf)

  /** [[queryIvfPq]] against an already-[[open]]ed index — the serve
    * loop shape (a streaming foreachBatch serving one query batch per
    * trigger, st14/st25): zero per-call metadata jobs, the centroid
    * table rides the handle as a LOCAL relation, and the per-batch
    * plan touches only the (nprobe-pruned) encoded table. Unlike the
    * [[mineTopK]] overload this keeps the broadcast-probe joins — the
    * right plan when each query batch is small; corpus-sized query
    * relations go through [[mineTopK]]. */
  def queryIvfPq(index: Opened, queries: DataFrame,
      k: Int, nprobe: Int, rerank: Int,
      excludeSelf: Boolean): DataFrame = {
    require(rerank >= k, s"queryIvfPq: rerank=$rerank < k=$k")
    val codes = index.codes
    require(nprobe >= 1 && nprobe <= index.nlist,
      s"queryIvfPq: nprobe=$nprobe out of range [1, ${index.nlist}]")
    val codebook = index.codebook
    val centroidsDf = index.centroidsDf
    val encoded = index.encoded

    import Similarity.{Scored, TopKAggregator}
    val probeAgg = udaf(new TopKAggregator(nprobe), Encoders.product[Scored])
    val probes = queries.crossJoin(broadcast(centroidsDf))
      .select(col("qid"), col("qvec"), col("centroid_id"),
        GraftFunctions.cosine(col("qvec"), col("centroid_vec")).as("psim"))
      .groupBy(col("qid"))
      .agg(probeAgg(col("centroid_id"), col("psim")).as("top"),
        first(col("qvec")).as("qvec"))
      .select(col("qid"),
        GraftFunctions.pqLut(col("qvec"), codebook).as("lut"),
        explode(col("top.id")).as("centroid_id"))

    val topR = udaf(new TopKAggregator(rerank), Encoders.product[Scored])
    val candidates = encoded.select("cid", "centroid_id", "codes")
      .join(broadcast(probes), Seq("centroid_id"))
      .where(if (excludeSelf) col("cid") =!= col("qid") else lit(true))
      .select(col("qid"), col("cid"),
        GraftFunctions.pqAdc(col("codes"), col("lut"), codes).as("adc"))
      .groupBy(col("qid"))
      .agg(topR(col("cid"), col("adc")).as("top"))
      .select(col("qid"), explode(col("top.id")).as("cid"))

    val topk = udaf(new TopKAggregator(k), Encoders.product[Scored])
    encoded.select("cid", "cvec")
      .join(broadcast(candidates), Seq("cid"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("cid"),
        GraftFunctions.cosine(col("qvec"), col("cvec")).as("sim"))
      .groupBy(col("qid"))
      .agg(topk(col("cid"), col("sim")).as("top"))
      .select(col("qid").as("query_id"), posexplode(col("top")))
      .select(col("query_id"),
        col("col.id").as("corpus_id"),
        col("col.score").as("cosine"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** Hard-negative mining at TRAINING-SET scale, served from the
    * persisted index: for every query vector, the k most-cosine-similar
    * corpus vectors whose label differs ([[Similarity.hardNegatives]]'s
    * DPR contract, reference semantics unchanged) — but the query side
    * is a first-class DISTRIBUTED relation, never broadcast and never
    * collected, so the "queries" can be the training corpus itself
    * (DPR-style retriever training mines negatives for every training
    * example, a set as large as the corpus — the shape the
    * broadcast-query [[Similarity.hardNegatives]] cannot serve).
    *
    * Plan shape, one bounded-fanout pipeline:
    *  1. probe: each query row derives its `nprobe` best centroids and
    *     its PQ lookup table in ONE narrow codegen'd projection
    *     ([[graft.functions.TopCentroids]] — the centroid table rides
    *     as a reference object, so there is no crossJoin-with-
    *     broadcast-centroids and no per-query shuffle);
    *  2. the encoded corpus joins its labels once (cid-keyed shuffle
    *     join, corpus-sized, label column pruned to (cid, clab));
    *  3. query probes BUCKET-JOIN the encoded table on centroid_id —
    *     a sort-merge join both sides (`MERGE` hints pin the strategy:
    *     never a broadcast at any size, and SMJ spills where a
    *     shuffled-hash build side would OOM on the hot bucket a
    *     skewed corpus makes; AQE's skew handling splits it);
    *  4. the cross-label filter applies BEFORE the ADC rerank cut, so
    *     same-label candidates can never evict true negatives from the
    *     capacity-`rerank` aggregate;
    *  5. ADC top-`rerank` survivors re-rank by exact cosine (two more
    *     cid/qid-keyed shuffle joins — survivor-sized, not
    *     corpus-sized).
    *
    * At full probing (nprobe = nlist) with rerank ≥ the cross-label
    * candidate count this equals the brute-force mining answer exactly
    * (the s20/s21 gate contract); at real settings recall follows the
    * s18/s19 measured ladder (s22 measures it for mining specifically).
    *
    * Scale bounds, stated: (a) the probe expression ships the centroid
    * table as a plan reference object — right up to nlist ~10⁵
    * (⌊√N⌋ covers a 10-billion-vector corpus; tens of MB of task
    * binary); past that a two-level centroid index is the published
    * path. (b) each probe row carries the query's PQ lookup table
    * (m·codes doubles) through the bucket join — nprobe× duplication
    * of ~1 KB/query, the price of computing ADC without re-touching
    * qvec per candidate. (c) `corpusLabels` joins the encoded table
    * with an INNER join: corpus rows ABSENT from `corpusLabels` are
    * excluded from mining by construction.
    *
    * NULL-label semantics (pinned, same as
    * [[Similarity.hardNegatives]]): the cross-label test is SQL `<>`,
    * which yields NULL — i.e. filters the pair out — when EITHER side
    * is NULL. A query with a NULL `qlab` therefore returns no
    * negatives at all, and a corpus row with a NULL `clab` is never
    * mined. "Unlabeled means unusable" is the conservative reading for
    * contrastive training (an unlabeled row might be a positive); a
    * caller that wants NULL-labeled corpus rows to count as
    * cross-label must materialize a sentinel label first.
    *
    * Queries: (qid BIGINT, qvec ARRAY<FLOAT>, qlab). corpusLabels:
    * (cid BIGINT, clab). Output (query_id, corpus_id, cosine, rank),
    * rank 1..k. A query that IS a corpus row never returns itself (its
    * own label matches). */
  def mineHardNegatives(spark: SparkSession, root: String,
      queries: DataFrame, corpusLabels: DataFrame,
      k: Int, nprobe: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"mineHardNegatives: rerank=$rerank < k=$k")
    val meta = spark.read.parquet(s"$root/meta.parquet").head
    val codes = meta.getAs[Int]("codes")
    val nlist = meta.getAs[Int]("nlist")
    require(nprobe >= 1 && nprobe <= nlist,
      s"mineHardNegatives: nprobe=$nprobe out of range [1, $nlist]")
    val codebook = loadCodebook(spark, root)
    val (centIds, centVecs) = loadCentroids(spark, root)
    val encoded = liveEncoded(spark, root)

    val probes = queries.select(col("qid"), col("qlab"),
        GraftFunctions.pqLut(col("qvec"), codebook).as("lut"),
        explode(GraftFunctions.topCentroids(col("qvec"), centIds, centVecs,
          nprobe)).as("centroid_id"))

    val encLab = encoded.select("cid", "centroid_id", "codes")
      .join(corpusLabels.select(col("cid"), col("clab")).hint("merge"),
        Seq("cid"))

    import Similarity.{Scored, TopKAggregator}
    val topR = udaf(new TopKAggregator(rerank), Encoders.product[Scored])
    val candidates = encLab
      .join(probes.hint("merge"), Seq("centroid_id"))
      .where(col("clab") =!= col("qlab"))
      .select(col("qid"), col("cid"),
        GraftFunctions.pqAdc(col("codes"), col("lut"), codes).as("adc"))
      .groupBy(col("qid"))
      .agg(topR(col("cid"), col("adc")).as("top"))
      .select(col("qid"), explode(col("top.id")).as("cid"))

    val topk = udaf(new TopKAggregator(k), Encoders.product[Scored])
    encoded.select("cid", "cvec")
      .join(candidates.hint("merge"), Seq("cid"))
      .join(queries.select(col("qid"), col("qvec")).hint("merge"),
        Seq("qid"))
      .select(col("qid"), col("cid"),
        GraftFunctions.cosine(col("qvec"), col("cvec")).as("sim"))
      .groupBy(col("qid"))
      .agg(topk(col("cid"), col("sim")).as("top"))
      .select(col("qid").as("query_id"), posexplode(col("top")))
      .select(col("query_id"),
        col("col.id").as("corpus_id"),
        col("col.score").as("cosine"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** Distributed-query top-k serve — [[mineHardNegatives]] WITHOUT the
    * label filter: per query row, the k most-cosine-similar corpus
    * vectors from the persisted index, with the query side a
    * first-class DISTRIBUTED relation (never broadcast, never
    * collected — the same probe-projection + MERGE-hinted bucket-join
    * pipeline, same scale bounds). This is the serve tier for
    * corpus×corpus workloads where BOTH sides are big: bitext mining
    * (feed both directions into [[Similarity.marginFromLists]]),
    * all-pairs candidate generation, corpus-sized query batches. At full probing
    * (nprobe = nlist) with `rerank` ≥ the probed candidate count it
    * equals [[Similarity.bruteForceTopK]] exactly (the s21/s26 gate
    * contract). `excludeSelf` drops cid == qid pairs (only meaningful
    * when queries ARE corpus rows under the same id space).
    *
    * Queries: (qid BIGINT, qvec ARRAY<FLOAT>).
    * Output: (query_id, corpus_id, cosine, rank), rank 1..k. */
  def mineTopK(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int, rerank: Int,
      excludeSelf: Boolean = false): DataFrame =
    mineTopK(open(spark, root), queries, k, nprobe, rerank, excludeSelf)

  /** A driver-side handle on an opened index: the KB-sized metadata
    * (meta row, PQ codebook, centroid arrays) collected ONCE, the
    * corpus-sized encoded table left as a lazy relation re-planned per
    * query. A long-lived server (a streaming foreachBatch loop serving
    * one batch per trigger — st32's shape) opens the index once and
    * serves every batch through the handle, so the per-batch work is
    * ONLY the pruned encoded-table scan: no per-batch metadata collect
    * jobs, no centroid/codebook re-read, and certainly no corpus
    * rescan. */
  final class Opened private[AnnIndex] (
      private[AnnIndex] val spark: SparkSession,
      val root: String,
      val dim: Int, val m: Int, val codes: Int, val nlist: Int,
      private[AnnIndex] val codebook: Array[Array[Array[Double]]],
      private[AnnIndex] val centIds: Array[Long],
      private[AnnIndex] val centVecs: Array[Array[Double]],
      private[AnnIndex] val centFloats: Array[Array[Float]]) {
    /** Lazy view of the LIVE encoded table (delete markers anti-joined
      * when any exist) — re-resolved per plan, so an [[appendIvfPq]] or
      * [[deleteFromIvfPq]] between serves is visible to the next
      * serve. */
    private[AnnIndex] def encoded: DataFrame = liveEncoded(spark, root)
    /** The centroid table as a LOCAL relation (built from the handle's
      * collected rows — no file scan, no job) for the broadcast-probe
      * serve shape. */
    private[AnnIndex] def centroidsDf: DataFrame = {
      import spark.implicits._
      centIds.zip(centFloats).toSeq.toDF("centroid_id", "centroid_vec")
    }
  }

  /** Open a persisted index: collect meta + codebook + centroids
    * (driver-side, KB-sized — three small jobs, paid once per server
    * lifetime instead of once per query batch). */
  def open(spark: SparkSession, root: String): Opened = {
    // leftover .old-* backups mean a compact crashed MID-SWAP and the
    // live tables may mix generations (new encoded rows against old
    // centroids/codebook = silently wrong distances) — fail loudly
    graft.io.StagedSwap.assertNotTorn(
      new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      root, "AnnIndex")
    val meta = spark.read.parquet(s"$root/meta.parquet").head
    val centRows = spark.read.parquet(s"$root/centroids.parquet")
      .orderBy("centroid_id").collect()
    val centIds = centRows.map(_.getLong(0))
    val centFloats = centRows.map(_.getSeq[Float](1).toArray)
    new Opened(spark, root, meta.getAs[Int]("dim"), meta.getAs[Int]("m"),
      meta.getAs[Int]("codes"), meta.getAs[Int]("nlist"),
      loadCodebook(spark, root), centIds,
      centFloats.map(_.map(_.toDouble)), centFloats)
  }

  /** [[mineTopK]] against an already-[[open]]ed index — identical plan,
    * zero per-call metadata jobs. */
  def mineTopK(index: Opened, queries: DataFrame,
      k: Int, nprobe: Int, rerank: Int,
      excludeSelf: Boolean): DataFrame = {
    require(rerank >= k, s"mineTopK: rerank=$rerank < k=$k")
    val codes = index.codes
    require(nprobe >= 1 && nprobe <= index.nlist,
      s"mineTopK: nprobe=$nprobe out of range [1, ${index.nlist}]")
    val codebook = index.codebook
    val centIds = index.centIds
    val centVecs = index.centVecs
    val encoded = index.encoded

    val probes = queries.select(col("qid"),
        GraftFunctions.pqLut(col("qvec"), codebook).as("lut"),
        explode(GraftFunctions.topCentroids(col("qvec"), centIds, centVecs,
          nprobe)).as("centroid_id"))

    import Similarity.{Scored, TopKAggregator}
    val topR = udaf(new TopKAggregator(rerank), Encoders.product[Scored])
    val candidates = encoded.select("cid", "centroid_id", "codes")
      .join(probes.hint("merge"), Seq("centroid_id"))
      .where(if (excludeSelf) col("cid") =!= col("qid") else lit(true))
      .select(col("qid"), col("cid"),
        GraftFunctions.pqAdc(col("codes"), col("lut"), codes).as("adc"))
      .groupBy(col("qid"))
      .agg(topR(col("cid"), col("adc")).as("top"))
      .select(col("qid"), explode(col("top.id")).as("cid"))

    val topk = udaf(new TopKAggregator(k), Encoders.product[Scored])
    encoded.select("cid", "cvec")
      .join(candidates.hint("merge"), Seq("cid"))
      .join(queries.select(col("qid"), col("qvec")).hint("merge"),
        Seq("qid"))
      .select(col("qid"), col("cid"),
        GraftFunctions.cosine(col("qvec"), col("cvec")).as("sim"))
      .groupBy(col("qid"))
      .agg(topk(col("cid"), col("sim")).as("top"))
      .select(col("qid").as("query_id"), posexplode(col("top")))
      .select(col("query_id"),
        col("col.id").as("corpus_id"),
        col("col.score").as("cosine"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** Compact / re-train the index IN PLACE from its own encoded table —
    * the lifecycle step [[appendIvfPq]]'s scaladoc promises ("rebuild
    * when cluster balance degrades"): appends encode with the ORIGINAL
    * build's centroids, so after enough of them the inverted lists are
    * unbalanced (hot buckets slow every probe) and the encoded table
    * has accreted one parquet file set per append micro-batch.
    * Compaction re-derives centroids and codebook from the CURRENT full
    * vector set (`encoded` keeps the raw vectors precisely so the index
    * is self-contained), re-encodes every row, and rewrites the four
    * tables — coalesced to `targetPartitions` output files when > 0.
    *
    * Because the centroid/codebook samples are hash-ORDERED samples
    * (order-independent of how rows arrived), the compacted index is
    * BIT-IDENTICAL to [[buildIvfPq]] run fresh on the union corpus —
    * so a pruned serve against it replays under the same oracle as the
    * inline pipeline (the s29 gate pins compact(build+append) ==
    * build(union) at nprobe < nlist, not just under the full-probing
    * equality). `nlist`/`m`/`codes` may change at compact time — this
    * is where quantization gets re-tuned as the corpus grows (the
    * capacity rule nlist ≈ ⌊√N⌋).
    *
    * Cost, stated: one full pass over the encoded table for the
    * re-encode plus two TakeOrdered sample scans — the build cost, by
    * design; run it at the cadence cluster balance demands, not per
    * append. Durability: the new index is staged under a dot-temp
    * sibling and swapped in via [[graft.io.StagedSwap]] — each live
    * table is renamed ASIDE (never deleted first), backups drop only
    * after all four tables swapped, and a failed swap rolls back to
    * the old index while KEEPING the staged copy for recovery. Still
    * single-writer and not snapshot-isolated against concurrent
    * readers mid-swap (wrap the root in [[graft.sink.VersionedTable]]
    * for that). Live [[Opened]] handles hold the OLD
    * centroids/codebook driver-side — re-[[open]] after a compact. */
  def compactIvfPq(spark: SparkSession, root: String, nlist: Int,
      m: Int, codes: Int, refineIters: Int = 0,
      targetPartitions: Int = 0): Unit = {
    val dim = spark.read.parquet(s"$root/meta.parquet").head
      .getAs[Int]("dim")
    // LIVE rows only (delete markers applied — compact is where a
    // takedown becomes physical) and dropDuplicates(cid): at-least-once
    // appends may have replayed a micro-batch (identical vectors under
    // the same cid — appends never update); serve absorbs the copies
    // via the TopKAggregator collapse, compact removes them physically.
    // A duplicate cid reaching the hash-ordered centroid sample would
    // otherwise mint two centroids with the same id.
    val vectors0 = liveEncoded(spark, root, guard = false)
      .select("cid", "cvec").dropDuplicates("cid")
    val vectors =
      if (targetPartitions > 0) vectors0.repartition(targetPartitions)
      else vectors0
    val staging = s"$root/.compact-${java.util.UUID.randomUUID()}"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    try buildIvfPq(vectors, dim, nlist, staging, m, codes, refineIters)
    catch { case e: Throwable =>
      // the staged BUILD failed — the staging dir holds junk, not a
      // recovery copy; drop it and leave the live index untouched
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      throw e
    }
    graft.io.StagedSwap.swapIn(fs, root, staging,
      Seq("meta.parquet", "centroids.parquet", "codebook.parquet",
        "encoded.parquet"))
    // the takedown markers are now physical — clear them AFTER the swap
    // (a crash in between leaves markers pointing at rows that no
    // longer exist: the serve anti-join is then a no-op, never wrong)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/deletes.parquet"), true)
  }

  private def loadCentroids(spark: SparkSession,
      root: String): (Array[Long], Array[Array[Double]]) = {
    val rows = spark.read.parquet(s"$root/centroids.parquet")
      .orderBy("centroid_id").collect()
    (rows.map(_.getLong(0)),
      rows.map(_.getSeq[Float](1).map(_.toDouble).toArray))
  }

  private def loadCodebook(spark: SparkSession,
      root: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$root/codebook.parquet")
      .orderBy("m_idx", "code_id").collect()
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (_, rs) =>
      rs.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
    }.toArray
  }
}
