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
    * queries is unaffected (the s10 gate pins it). */
  def appendIvfPq(spark: SparkSession, root: String,
      newVectors: DataFrame): Unit =
    encode(spark, root, newVectors, "append")

  private def encode(spark: SparkSession, root: String, vectors: DataFrame,
      mode: String): Unit = {
    val (centIds, centVecs) = loadCentroids(spark, root)
    val codebook = loadCodebook(spark, root)
    vectors.select(col("cid"),
        GraftFunctions.nearestCentroid(col("cvec"), centIds, centVecs)
          .as("centroid_id"),
        GraftFunctions.pqEncode(col("cvec"), codebook).as("codes"),
        col("cvec"))
      .write.mode(mode).parquet(s"$root/encoded.parquet")
  }

  /** Top-k serve against the persisted index: probe the `nprobe` best
    * centroid buckets per query, ADC-scan ONLY probed buckets (the scan
    * projects (cid, centroid_id, codes) — the raw-vector column is
    * never read here), exact-cosine re-rank the `rerank` ADC survivors.
    * The index is never rebuilt, re-encoded, or fully scanned. */
  def queryIvfPq(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int, rerank: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(rerank >= k, s"queryIvfPq: rerank=$rerank < k=$k")
    val meta = spark.read.parquet(s"$root/meta.parquet").head
    val codes = meta.getAs[Int]("codes")
    val nlist = meta.getAs[Int]("nlist")
    require(nprobe >= 1 && nprobe <= nlist,
      s"queryIvfPq: nprobe=$nprobe out of range [1, $nlist]")
    val codebook = loadCodebook(spark, root)
    val centroidsDf = spark.read.parquet(s"$root/centroids.parquet")
    val encoded = spark.read.parquet(s"$root/encoded.parquet")

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
