package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hashSample: layout-independent, plan stays a narrow filter") {
    val df = (1L to 20000L).toDF("id")
    def ids(part: Int) = Sampling.hashSample(df.repartition(part), col("id"), 0.1)
      .collect().map(_.getLong(0)).toSet
    val a = ids(3); val b = ids(17)
    assert(a === b, "membership must not depend on partition layout")
    // Bernoulli-style concentration around fraction*N
    assert(math.abs(a.size - 2000) < 200, s"got ${a.size} of expected ~2000")
    val plan = Sampling.hashSample(df, col("id"), 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must be shuffle-free\n$plan")
  }

  test("hashSample: thresholds nest — the 1% sample is a subset of the 10%") {
    val df = (1L to 20000L).toDF("id")
    val small = Sampling.hashSample(df, col("id"), 0.01)
      .collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(df, col("id"), 0.10)
      .collect().map(_.getLong(0)).toSet
    assert(small.nonEmpty && small.subsetOf(big))
  }

  test("hashSample: different seeds draw different (deterministic) samples") {
    val df = (1L to 5000L).toDF("id")
    def ids(seed: Long) = Sampling.hashSample(df, col("id"), 0.2, seed)
      .collect().map(_.getLong(0)).toSet
    assert(ids(1L) === ids(1L))
    assert(ids(1L) !== ids(2L))
  }

  test("trainTestSplit: groups never straddle the boundary") {
    // 500 groups × 4 rows: every row of a group must carry the same label
    val df = (0L until 2000L).map(i => (i, i % 500)).toDF("row_id", "grp")
    val got = Sampling.trainTestSplit(df, col("grp"), 0.3, seed = 11L)
    val perGroup = got.groupBy("grp")
      .agg(countDistinct(col("split")).as("nsplits"),
        count(lit(1)).as("n"))
      .collect()
    assert(perGroup.forall(_.getAs[Long]("nsplits") === 1L),
      "a group appeared in both train and test")
    assert(perGroup.forall(_.getAs[Long]("n") === 4L))
    val testGroups = got.where(col("split") === "test")
      .select("grp").distinct().count()
    assert(math.abs(testGroups - 150L) < 40, s"got $testGroups of ~150 test groups")
  }

  test("trainTestSplit: rejects an input that already has the output column") {
    val df = Seq((1L, "x")).toDF("id", "split")
    val e = intercept[IllegalArgumentException] {
      Sampling.trainTestSplit(df, col("id"), 0.3)
    }
    assert(e.getMessage.contains("split"))
    // renaming the output column sidesteps the clash
    val ok = Sampling.trainTestSplit(df, col("id"), 0.3, outCol = "holdout")
    assert(ok.columns.toSeq === Seq("id", "split", "holdout"))
  }

  test("weightedSample: keep rate tracks the weight column; weights clamp to [0,1]") {
    val df = (1L to 30000L).map(i =>
      (i, if (i % 3 == 0) 0.0 else if (i % 3 == 1) 0.5 else 5.0)) // 5.0 clamps to 1.0
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, col("id"), col("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(!got.contains(0.0), "zero weight keeps nothing")
    assert(math.abs(got(0.5) - 5000L) < 500, s"got ${got.get(0.5)} of ~5000")
    assert(got(5.0) === 10000L, "clamped weight 1.0 keeps everything")
  }

  test("exactKSample: exact cardinality, deterministic, nested in larger k, top-k plan") {
    val df = (1L to 5000L).toDF("id")
    def ids(k: Int) = Sampling.exactKSample(df, col("id"), k)
      .collect().map(_.getLong(0)).toSet
    val s100 = ids(100)
    assert(s100.size === 100)
    assert(ids(100) === s100, "deterministic")
    assert(s100.subsetOf(ids(200)), "nested k at same seed")
    val plan = Sampling.exactKSample(df, col("id"), 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"must not global-sort\n$plan")
  }

  test("stratifiedSample: per-stratum rates hold; absent strata use the default") {
    val df = (1L to 30000L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "s")
    val got = Sampling.stratifiedSample(df, col("s"), col("id"),
        fractions = Map("a" -> 0.5, "b" -> 0.05), defaultFraction = 0.0)
      .groupBy("s").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(got.getOrElse("a", 0L) - 5000L) < 500)
    assert(math.abs(got.getOrElse("b", 0L) - 500L) < 150)
    assert(!got.contains("c"), "default fraction 0 must drop the stratum")
  }

  test("quotaSample: rejects an input that already has the __rn scratch column") {
    val df = Seq((1L, "a", 7)).toDF("id", "s", "__rn")
    val e = intercept[IllegalArgumentException] {
      Sampling.quotaSample(df, col("s"), col("id"), Map("a" -> 1))
    }
    assert(e.getMessage.contains("__rn"))
  }

  test("weightedInterleave: every prefix holds weight proportions within ±1 per source") {
    // stride scheduling's guarantee: after t positions, source s has
    // appeared floor/ceil of w_s*t/W — never drifts further
    val df = ((1 to 300).map(i => ("a", i.toLong)) ++
      (1 to 300).map(i => ("b", 1000L + i)) ++
      (1 to 300).map(i => ("c", 2000L + i))).toDF("src", "id")
    val weights = Map("a" -> 3, "b" -> 2, "c" -> 1)
    val ordered = Sampling.weightedInterleave(df, col("src"), col("id"), weights)
      .orderBy(col("mix_key"), col("src"), col("id"))
      .select("src").collect().map(_.getString(0))
    val wTot = weights.values.sum
    for (t <- Seq(6, 12, 60, 120, 300)) {
      val counts = ordered.take(t).groupBy(identity).view.mapValues(_.length)
      weights.foreach { case (s, w) =>
        val expect = w.toDouble * t / wTot
        val got = counts.getOrElse(s, 0)
        assert(math.abs(got - expect) <= 1.0,
          s"prefix $t: source $s appeared $got times, expected ~$expect")
      }
    }
  }

  test("weightedInterleave: order is layout-independent and drops unlisted sources") {
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 50).map(i => ("b", 500L + i)) ++
      (1 to 30).map(i => ("z", 900L + i))).toDF("src", "id")
    def orderOf(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedInterleave(d, col("src"), col("id"), Map("a" -> 2, "b" -> 1))
        .orderBy("mix_key", "src", "id").select("src", "id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val o1 = orderOf(df.repartition(13))
    val o2 = orderOf(df.repartition(3))
    assert(o1 === o2, "mix order must not depend on physical layout")
    assert(!o1.exists(_._1 == "z"), "sources without a weight are dropped")
  }

  test("tokenBudgetSample: inclusive running-total cut, deterministic order") {
    // stratum x: rows in hash order with sizes; budget cuts where the
    // cumulative sum first exceeds it
    val df = (1 to 20).map(i => ("x", i.toLong, 10L)).toDF("s", "id", "toks")
    val kept = Sampling.tokenBudgetSample(df, col("s"), col("id"), col("toks"),
        budgets = Map("x" -> 55L))
      .collect()
    // every row is 10 tokens: cum 10,20,30,40,50,60... → exactly 5 rows ≤ 55
    assert(kept.length === 5)
    // and the KEPT rows are the first 5 in the seeded hash order
    val order = df.select(col("id"))
      .withColumn("h", Sampling.bucketOf(col("id"), 0L))
      .orderBy("h", "id").limit(5).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.map(_.getLong(1)).toSet === order)
  }

  test("tokenBudgetSample: zero default budget drops unlisted strata; scratch guard") {
    val df = Seq(("x", 1L, 5L), ("y", 2L, 5L)).toDF("s", "id", "toks")
    val got = Sampling.tokenBudgetSample(df, col("s"), col("id"), col("toks"),
        budgets = Map("x" -> 100L))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("x"))
    val bad = Seq(("x", 1L, 5L, 0L)).toDF("s", "id", "toks", "__cum")
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSample(bad, col("s"), col("id"), col("toks"), Map("x" -> 1L))
    }
    assert(e.getMessage.contains("__cum"))
  }

  test("replicate: floor copies + deterministic fractional Bernoulli, " +
      "zero-weight drops, copy ids 1..k, layout-independent") {
    val df = (1L to 400L).map(i => (i, s"row$i")).toDF("id", "v")
    // weight 2.5M: every row gets 2 or 3 copies; expect ~50% threes.
    val out = Sampling.replicate(df, lit(2500000L), col("id"))
    val perRow = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow.size === 400)
    assert(perRow.values.forall(k => k == 2L || k == 3L))
    val threes = perRow.values.count(_ == 3L)
    assert(threes > 120 && threes < 280, s"fraction draw looks biased: $threes")
    // copy ids are exactly 1..k
    val copies = out.where(col("id") === 1L)
      .select("copy_id").collect().map(_.getLong(0)).sorted
    assert(copies.toSeq === (1L to perRow(1L)).toSeq)
    // zero weight drops everything; determinism across partitionings
    assert(Sampling.replicate(df, lit(0L), col("id")).count() === 0)
    val again = Sampling.replicate(df.repartition(13), lit(2500000L), col("id"))
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === perRow)
  }

  test("kFold: folds in [0,k), group-stable, deterministic across " +
      "partitionings, k<2 rejected") {
    val df = (1L to 300L).map(i => (i, i % 30)).toDF("id", "grp")
    val got = Sampling.kFold(df, col("grp"), k = 5)
      .select("id", "grp", "fold").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(t => t._3 >= 0 && t._3 < 5))
    // same group => same fold (the leakage discipline)
    val byGrp = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byGrp.values.forall(_.size == 1))
    // all folds populated at this size
    assert(got.map(_._3).toSet.size === 5)
    val again = Sampling.kFold(df.repartition(7), col("grp"), k = 5)
      .select("id", "fold").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall(t => again(t._1) == t._3))
    intercept[IllegalArgumentException](Sampling.kFold(df, col("grp"), 1))
  }

  test("replicate: rejects an existing copy_id column") {
    val df = Seq((1L, 9L)).toDF("id", "copy_id")
    intercept[IllegalArgumentException] {
      Sampling.replicate(df, lit(1000000L), col("id"))
    }
  }

  test("importanceScore + weightedSampleE6: target-like docs score above " +
      "1e6 and survive the cap; alien docs score below and can drop") {
    val target = Seq((100L, "cat dog cat dog bird")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "cat dog cat bird"), // shares the target distribution
      (2L, "xx yy zz ww"),      // disjoint vocabulary
      (3L, "cat xx dog yy")     // mixed
    ).toDF("doc_id", "text")

    val scored = TextAnalysis.importanceScore(raw, "text", "doc_id",
        target, "text", raw, "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val byId = scored.toMap
    assert(byId(1L) > 1000000L, s"in-distribution doc scored ${byId(1L)}")
    assert(byId(2L) < 1000000L, s"alien doc scored ${byId(2L)}")
    assert(byId(1L) > byId(3L) && byId(3L) > byId(2L),
      s"mixed doc must land between: $scored")

    // weightedSampleE6: weight >= cap keeps everything; weight 0 drops.
    val df = (1L to 1000L).toDF("id").withColumn("w", lit(500000L))
    assert(Sampling.weightedSampleE6(df, col("id"),
      lit(2000000L), capE6 = 1000000L).count() === 1000L)
    assert(Sampling.weightedSampleE6(df, col("id"),
      lit(0L), capE6 = 1000000L).count() === 0L)
    // weight = cap/2 keeps ~half, deterministically.
    val kept = Sampling.weightedSampleE6(df, col("id"), col("w"),
      capE6 = 1000000L).count()
    assert(math.abs(kept - 500L) < 80, s"kept $kept of expected ~500")
    // Layout-independent membership.
    def ids(p: Int) = Sampling.weightedSampleE6(df.repartition(p), col("id"),
      col("w"), 1000000L).collect().map(_.getLong(0)).toSet
    assert(ids(3) === ids(13))
  }

  test("temperatureSample: rarest domain keeps all, dominant downsampled, " +
      "alpha endpoints and layout independence") {
    // 4000 'big' rows vs 250 'small' rows: p^0.5 keeps small intact and
    // big at sqrt(250/4000) = 0.25.
    val df = ((1L to 4000L).map(i => (i, "big")) ++
      (10001L to 10250L).map(i => (i, "small"))).toDF("id", "dom")

    val half = Sampling.temperatureSample(df, col("dom"), col("id"), alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (bigKept, smallKept) = half.partition(_._2 == "big")
    assert(smallKept.length === 250, "rarest domain must keep every row")
    assert(math.abs(bigKept.length - 1000) < 150,
      s"big kept ${bigKept.length}, expected ~1000 (rate 0.25)")

    // alpha=1: natural distribution — everything survives.
    assert(Sampling.temperatureSample(df, col("dom"), col("id"), alpha = 1.0)
      .count() === 4250L)

    // alpha=0: uniform-by-domain — big's expected kept count equals
    // small's size (rate nmin/n = 250/4000).
    val flat = Sampling.temperatureSample(df, col("dom"), col("id"), alpha = 0.0)
      .where(col("dom") === "big").count()
    assert(math.abs(flat - 250L) < 80, s"alpha=0 big kept $flat, expected ~250")

    // Membership is layout-independent.
    val a = Sampling.temperatureSample(df.repartition(3), col("dom"), col("id"))
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(df.repartition(17), col("dom"), col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(a === b)

    // Scratch-column guard.
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(df.withColumnRenamed("dom", "__rate"),
        col("__rate"), col("id"))
    }
  }

  test("mixturePlan: scarcest source pins the total; rates exact; " +
      "absent sources drop; sample is deterministic and never oversamples") {
    import spark.implicits._
    // Supplies: a=1000, b=10000, c=500 tokens. Targets 50/40/10.
    // T = min(1000e6/5e5, 10000e6/4e5, 500e6/1e5) = min(2000, 25000,
    // 5000) = 2000. wants: 1000, 800, 200. rates: 1e6, 80000, 400000.
    val df = (
      (1 to 10).map(i => ("a", i.toLong, 100L)) ++
      (11 to 110).map(i => ("b", i.toLong, 100L)) ++
      (111 to 115).map(i => ("c", i.toLong, 100L)) ++
      (116 to 120).map(i => ("x", i.toLong, 100L))).toDF("src", "id", "tok")
    val plan = graft.ext.Sampling.mixturePlan(df, col("src"), col("tok"),
        Map("a" -> 500000L, "b" -> 400000L, "c" -> 100000L))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(plan("a") === ((10L, 1000L, 1000000L)))
    assert(plan("b") === ((100L, 10000L, 80000L)))
    assert(plan("c") === ((5L, 500L, 400000L)))
    assert(plan("x")._3 === 0L)

    val kept = graft.ext.Sampling.mixtureSample(df, col("src"), col("id"),
      col("tok"), Map("a" -> 500000L, "b" -> 400000L, "c" -> 100000L))
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") === 10L, "rate 1e6 keeps every a row")
    assert(!bySrc.contains("x"), "untargeted source drops")
    assert(bySrc.getOrElse("b", 0L) <= 100L)
    // Determinism across partitionings.
    val again = graft.ext.Sampling.mixtureSample(df.repartition(7),
        col("src"), col("id"), col("tok"),
        Map("a" -> 500000L, "b" -> 400000L, "c" -> 100000L))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again === kept.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("mixturePlanEpochs: caps move the binding source and let rates " +
      "exceed 1e6; empty caps degenerate to mixturePlan exactly") {
    import spark.implicits._
    // Same supplies as the cap-free spec: a=1000, b=10000, c=500.
    // Cap a at 3 epochs: T = min(1000*3e6/5e5, 10000*1e6/4e5,
    // 500*1e6/1e5) = min(6000, 25000, 5000) = 5000 — c binds now.
    // takes: a 2500, b 2000, c 500. rates: a 2_500_000 (UPsample),
    // b 200_000, c 1_000_000.
    val df = (
      (1 to 10).map(i => ("a", i.toLong, 100L)) ++
      (11 to 110).map(i => ("b", i.toLong, 100L)) ++
      (111 to 115).map(i => ("c", i.toLong, 100L)) ++
      (116 to 120).map(i => ("x", i.toLong, 100L))).toDF("src", "id", "tok")
    val target = Map("a" -> 500000L, "b" -> 400000L, "c" -> 100000L)
    val plan = graft.ext.Sampling.mixturePlanEpochs(df, col("src"),
        col("tok"), target, capE6 = Map("a" -> 3000000L))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(plan("a") === 2500000L)
    assert(plan("b") === 200000L)
    assert(plan("c") === 1000000L)
    assert(plan("x") === 0L)

    // Realization: every 'a' row appears 2 or 3 times (2 whole copies +
    // a Bernoulli(0.5) fractional one), 'c' rows exactly once, 'x' never.
    val drawn = graft.ext.Sampling.mixtureSampleEpochs(df, col("src"),
      col("id"), col("tok"), target, capE6 = Map("a" -> 3000000L),
      seed = 3L)
    val copiesA = drawn.where(col("src") === "a").groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(copiesA.keySet === (1 to 10).map(_.toLong).toSet)
    assert(copiesA.values.forall(k => k == 2L || k == 3L))
    assert(drawn.where(col("src") === "c").count() === 5L)
    assert(drawn.where(col("src") === "x").count() === 0L)
    // Copy multiset is layout-independent.
    val again = graft.ext.Sampling.mixtureSampleEpochs(df.repartition(7),
        col("src"), col("id"), col("tok"), target,
        capE6 = Map("a" -> 3000000L), seed = 3L)
      .select("id", "copy_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(again === drawn.select("id", "copy_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)

    // Degeneration: no caps == the cap-free plan, row for row.
    val free = graft.ext.Sampling.mixturePlan(df, col("src"), col("tok"),
      target).collect().map(_.toSeq).sortBy(_.toString)
    val capped1 = graft.ext.Sampling.mixturePlanEpochs(df, col("src"),
        col("tok"), target, capE6 = Map.empty)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(capped1 === free)
  }

  test("epochOrder: each epoch is a full 1..N permutation, epochs " +
      "differ, and the order is layout-independent") {
    val spark0 = spark
    import spark0.implicits._
    val n = 100
    val df = (0L until n.toLong).map(Tuple1(_)).toDF("k")
    def run(parts: Int) =
      graft.ext.Sampling.epochOrder(df.repartition(parts), col("k"),
          epochs = 3, seed = 9L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = run(7)
    assert(got.length === 3 * n)
    (0L until 3L).foreach { e =>
      val pos = got.filter(_._2 == e).map(_._3).sorted.toSeq
      assert(pos === (1L to n.toLong), s"epoch $e not a permutation")
    }
    // different epochs order documents differently
    def orderOf(e: Long) =
      got.filter(_._2 == e).sortBy(_._3).map(_._1).toSeq
    assert(orderOf(0) !== orderOf(1))
    assert(orderOf(1) !== orderOf(2))
    // layout independence: same positions under another partitioning
    assert(run(2).sorted.toSeq === got.sorted.toSeq)
  }
}
