package graft.ext

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd refinement ([[Similarity.refineCentroids]]): recall-per-nprobe
  * must strictly improve over raw hash-sampled centroids on a clustered
  * corpus, exactness must hold under full probing, and the refined
  * centroids must be partition-layout-independent (the exact-decimal
  * mean path is what buys that).
  */
class KMeansRefineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nClusters = 8
  private val dim = 16
  private val perCluster = 25

  /** 8 seeded Gaussian cluster centers (near-orthogonal in 16-dim), 25
    * members each = center + small noise: a corpus where cluster
    * structure is real and hash-sampled centroids almost surely miss
    * some cluster (8 samples covering 8 clusters is a ~0.2% event). */
  private lazy val clustered: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield ((c * perCluster + i).toLong,
      centers(c).map(v => (v + rnd.nextGaussian() * 0.15).toFloat))
  }

  private def corpus: DataFrame = clustered.toDF("cid", "cvec")
  private def queries: DataFrame =
    clustered.filter(_._1 % perCluster == 3).map { case (id, v) => (id, v) }
      .toDF("qid", "qvec")

  private def topIds(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "corpus_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallVs(truth: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    per.sum / per.size
  }

  test("refineCentroids: recall@nprobe=1 strictly improves over hash-sampled centroids") {
    val truth = topIds(Similarity.bruteForceTopK(corpus, queries, k = 5))
    val raw = topIds(Similarity.ivfTopK(corpus, queries, k = 5,
      nlist = nClusters, nprobe = 1))
    val refined = topIds(Similarity.ivfTopK(corpus, queries, k = 5,
      nlist = nClusters, nprobe = 1, refineIters = 4))
    val rawRecall = recallVs(truth, raw)
    val refinedRecall = recallVs(truth, refined)
    assert(refinedRecall > rawRecall,
      s"Lloyd rounds must buy recall: raw=$rawRecall refined=$refinedRecall")
    assert(refinedRecall >= 0.85,
      s"refined centroids should nearly resolve a well-separated corpus: $refinedRecall")
  }

  test("refined IVF under full probing still equals brute force") {
    val bf = Similarity.bruteForceTopK(corpus, queries, k = 4)
      .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
    val ivf = Similarity.ivfTopK(corpus, queries, k = 4,
        nlist = nClusters, nprobe = nClusters, refineIters = 3)
      .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
    assert(ivf === bf)
  }

  test("refineCentroids: deterministic across partition layouts (exact-decimal means)") {
    val sampled = corpus
      .orderBy(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("cid") * 2654435761L, org.apache.spark.sql.functions.lit(2147483647L)),
        org.apache.spark.sql.functions.col("cid"))
      .limit(nClusters)
      .select(org.apache.spark.sql.functions.col("cid").as("centroid_id"),
        org.apache.spark.sql.functions.col("cvec").as("centroid_vec"))
    def vecsOf(c: DataFrame): Map[Long, Seq[Float]] =
      Similarity.refineCentroids(c, sampled, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val once = vecsOf(corpus.repartition(2))
    val other = vecsOf(corpus.repartition(17))
    assert(once === other, "Lloyd means must not depend on partitioning")
  }

  test("semDedup with refinement: copies still drop, originals survive") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val dups = Seq(0L, 5L, 9L).map(i => (i + 1000L, base(i.toInt)._2))
    val vecs = (base ++ dups).toDF("vid", "vec")
    val kept = Dedup.semDedup(vecs, "vec", "vid", nlist = 8, refineIters = 2)
      .select("cid").collect().map(_.getLong(0)).toSet
    assert((0L until 40L).forall(kept.contains))
    assert(Seq(1000L, 1005L, 1009L).forall(id => !kept.contains(id)))
  }
}
