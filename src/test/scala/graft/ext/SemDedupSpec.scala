package graft.ext

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 40 seeded Gaussian 16-dim vectors (pairwise cosines concentrate near
    * 0, far below 0.95) plus exact copies of three of them at high ids. */
  private def vecs: DataFrame = {
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val dups = Seq(0L, 5L, 9L).map(i => (i + 1000L, base(i.toInt)._2))
    (base ++ dups).toDF("vid", "vec")
  }

  test("semDedup: exact copies drop, originals survive, cluster count bounded by nlist") {
    val kept = Dedup.semDedup(vecs, "vec", "vid", nlist = 8)
    val keptIds = kept.select("cid").collect().map(_.getLong(0)).toSet
    assert((0L until 40L).forall(keptIds.contains),
      "independent Gaussians are not near-dups and must all survive")
    assert(Seq(1000L, 1005L, 1009L).forall(id => !keptIds.contains(id)),
      "exact copies must drop (higher id loses)")
    assert(kept.select("cluster_id").distinct().count() <= 8L)
  }

  test("connectedComponents: chains collapse transitively; greedy drop does not") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain 1-2-3-4
      (10L, 11L), (11L, 10L),       // duplicate edge both ways
      (20L, 21L), (21L, 22L), (20L, 22L)) // triangle
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))

    val docs = (1L to 4L).map(i => (i, s"d$i")).toDF("id", "t")
    val keptTransitive = Dedup.dropFromPairsTransitive(docs, "id",
        pairs.where($"id_a" < 5))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptTransitive === Set(1L), "whole chain collapses to its head")
  }

  test("connectedComponentsStar: same labels as propagation on mixed shapes") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain
      (10L, 11L), (11L, 10L),       // duplicate edge both ways
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle
      (30L, 30L))                   // self-loop-only node
      .toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L))
  }

  test("connectedComponentsStar: a chain whose diameter exceeds the " +
      "propagation round budget still converges (O(log n) rounds)") {
    // 0-1-2-...-120: diameter 120. Min-label propagation moves the zero
    // label one hop per round, so maxIter=20 provably cannot finish —
    // while the star alternation collapses it in ~log rounds.
    val chain = (0L until 120L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assertThrows[IllegalArgumentException] {
      Dedup.connectedComponents(chain, maxIter = 20).collect()
    }
    val star = Dedup.connectedComponentsStar(chain, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(star.length == 121 && star.forall(_._2 == 0L),
      "every chain node must label to the head")
  }

  test("latestByKey: one row per key, max order wins, ties broken by the next column") {
    val df = Seq(
      (1L, 10L, "old"), (1L, 20L, "new"),
      (2L, 5L, "only"),
      (3L, 7L, "a"), (3L, 7L, "b") // equal ts: tiebreak col decides
    ).toDF("k", "ts", "v")
    val got = Dedup.latestByKey(df, keys = Seq("k"), order = Seq("ts", "v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === Map(1L -> ((20L, "new")), 2L -> ((5L, "only")),
      3L -> ((7L, "b"))))
  }

  test("clusterAssign: identical vectors always share a cluster") {
    val a = Dedup.clusterAssign(vecs, "vec", "vid", nlist = 8)
      .select("cid", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((orig, dup) <- Seq(0L -> 1000L, 5L -> 1005L, 9L -> 1009L))
      assert(a(orig) === a(dup), s"copy $dup strayed from $orig's cluster")
  }
}
