package graft.ext

import graft.TestSpark
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------ expressions

  test("RollingFingerprint: deterministic, order-sensitive, SQL-registered") {
    GraftFunctions.register(spark)
    val df = Seq("abc", "abc", "acb", "").toDF("t")
      .select(GraftFunctions.fingerprint($"t").as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
    val viaSql = spark.sql("SELECT graft_fingerprint('abc')").collect()(0).getLong(0)
    assert(viaSql === fps(0))
  }

  test("TokenNGrams: exact parity with the interpreted HOF composite it replaced") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and trailing   spaces \t tabs\nnewlines  ",
      "UPPER Case MiXeD",
      "one two",          // fewer tokens than n -> single joined gram
      "solo",             // one token
      "a a a a a",        // repeated tokens -> distinct grams collapse
      "",                 // empty -> empty array
      "Ünïcødé ÅBC déjà vu encore une fois")
    val df = texts.toDF("t")
    // the composite this expression replaced (old tokenGramsCol body)
    val tokens = filter(split(lower(col("t")), "\\s+"), x => length(x) > 0)
    val composite = array_distinct(flatten(transform(
      array(tokens),
      ts => transform(
        sequence(lit(0), greatest(size(ts) - 3, lit(0))),
        i => concat_ws(" ", slice(ts, i + 1, lit(3)))))))
    val rows = df.select(
      sort_array(GraftFunctions.tokenNGrams(col("t"), 3)).as("native"),
      sort_array(composite).as("composite")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"text: '$t'")
    }
  }

  test("SortedIntersectCount: equals size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq("a")),
      (Seq("x", "y", "z"), Seq("x", "y", "z")),
      (Seq("aa", "ab", "b"), Seq("ab", "b", "ba"))).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.sortedIntersectCount(
        sort_array(col("a")), sort_array(col("b"))).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("SortedXxhash64Array + SortedLongIntersectCount: hashed-long " +
      "intersect counts equal the string intersect on distinct arrays") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq("a")),
      (Seq("x gram y", "y gram z", "z"), Seq("x gram y", "z", "q")),
      (Seq("aa", "ab", "b"), Seq("ab", "b", "ba"))).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.sortedLongIntersectCount(
        GraftFunctions.sortedGramHashes(col("a")),
        GraftFunctions.sortedGramHashes(col("b"))).as("hashed"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // the hash matches Spark's xxhash64 (seed 42) element-wise
    val h = Seq(Tuple1(Seq("graft", "spark"))).toDF("a")
      .select(GraftFunctions.sortedGramHashes(col("a")).as("hs"),
        sort_array(array(xxhash64(lit("graft")), xxhash64(lit("spark"))))
          .as("want")).head
    assert(h.getSeq[Long](0) === h.getSeq[Long](1))
  }

  test("TokenNGramHashes: element SET == xxhash64 over TokenNGrams' " +
      "strings (sorted, distinct), including the empty-text sentinel") {
    val df = Seq(
      (1L, "The quick  brown fox\tjumps over the quick brown fox"),
      (2L, "one"),
      (3L, "  "),
      (4L, "a b a b a b")).toDF("id", "text")
    Seq(1, 2, 3).foreach { n =>
      val rows = df.select(
        GraftFunctions.tokenNGramHashes(col("text"), n).as("hashed"),
        sort_array(transform(GraftFunctions.tokenNGrams(col("text"), n),
          g => xxhash64(g))).as("want")).collect()
      rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1),
        s"n=$n"))
    }
  }

  test("SortedLongIntersectCount: a null element throws WHEREVER it sits — " +
      "including the un-merged tail and ahead of the merge window") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Any*) = new GenericArrayData(xs.toArray)
    // null in the tail the merge never reaches (left exhausted first)
    assertThrows[IllegalArgumentException] {
      graft.functions.SortedLongIntersectCount.count(
        arr(1L), arr(2L, 3L, null))
    }
    // null sorted ahead of real values on one side
    assertThrows[IllegalArgumentException] {
      graft.functions.SortedLongIntersectCount.count(
        arr(null, 5L), arr(5L))
    }
    // null-free arrays still merge fine
    assert(graft.functions.SortedLongIntersectCount.count(
      arr(1L, 5L, 9L), arr(5L, 9L, 11L)) === 2)
  }

  test("FloatCosine: parallel/orthogonal/zero vectors; codegen matches interpreted") {
    val df = Seq(
      (Array(1f, 0f), Array(2f, 0f)),   // parallel -> 1
      (Array(1f, 0f), Array(0f, 3f)),   // orthogonal -> 0
      (Array(0f, 0f), Array(1f, 1f)),   // zero norm -> 0
      (Array(1f, 2f), Array(1f, 2f)))   // self -> 1
      .toDF("a", "b")
    val got = df.select(GraftFunctions.cosine($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12 && got(1) === 0.0 && got(2) === 0.0)
    assert(math.abs(got(3) - 1.0) < 1e-12)
  }

  // ------------------------------------------------------------ text

  test("TextAnalysis.stats counts chars/tokens/punct/digits") {
    val df = Seq((1L, "Hello, world! 42 times.")).toDF("doc_id", "text")
    val r = TextAnalysis.stats(df, "text", "doc_id").collect()(0)
    assert(r.getAs[Long]("n_chars") === 23L)
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("n_punct") === 3L)   // , ! .
    assert(r.getAs[Long]("n_digits") === 2L)
  }

  test("TextAnalysis.langId picks the stopword-matching language") {
    val df = Seq(
      (1L, "the cat and the dog of it is that"),
      (2L, "el perro y la casa de que en un los"),
      (3L, "zzz qqq xxx")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(got === Array("en", "es", "und"))
  }

  // ----------------------------------------------------------- dedup

  test("Dedup.byFingerprint groups byte-identical docs") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val groups = Dedup.byFingerprint(df, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(groups.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"))).toSeq
      === Seq((1L, 2L), (3L, 1L)))
  }

  test("TextAnalysis.langSegments: consecutive same-language sentences " +
      "collapse into runs, switches open new segments, counts are exact") {
    val mixed = "the cat is on the mat and it was there. " +
      "it is the best of the day. " +              // second en -> same run
      "el perro y el gato en la casa por un dia. " + // es -> new segment
      "the dog is in the house again. " +           // back to en
      "xyzzy plugh quux"                            // no stopwords -> und
    val df = Seq((1L, mixed), (2L, "the cat is the best. and it is the day."))
      .toDF("doc_id", "text")
    val got = TextAnalysis.langSegments(df, "text", "doc_id")
      .orderBy("doc_id", "seg_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      // doc 1: en run of 2 sentences, es, en, und
      (1L, 1L, "en", 1L, 2L, 10L + 7L),
      (1L, 2L, "es", 3L, 1L, 11L),
      (1L, 3L, "en", 4L, 1L, 7L),
      (1L, 4L, "und", 5L, 1L, 3L),
      // doc 2: one all-en run
      (2L, 1L, "en", 1L, 2L, 5L + 5L)))
  }

  test("Dedup.minHashPairs finds planted near-dups, not unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away " * 3
    val df = Seq(
      (1L, base), (2L, base + " tail"),
      (3L, "completely different content about spark catalyst optimizer internals and shuffles"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(df, "text", "doc_id").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    assert(pairs(0).getAs[Double]("jaccard") > 0.8)
  }

  test("Dedup near-dup index: build+append+serve flags arrivals against " +
      "the indexed corpus, jaccard equals the string-shingle truth, " +
      "re-served docs never flag themselves, floods capped at build") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away " * 3
    val other = "completely different content about spark catalyst optimizer internals and shuffles"
    val corpus = Seq((1L, base), (2L, other),
      (3L, base + " zz")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ndidx_")
    val root = dir.resolve("idx").toString
    Dedup.saveMinHashIndex(root, corpus.where($"doc_id" <= 2), "text", "doc_id")
    Dedup.appendMinHashIndex(root, corpus.where($"doc_id" === 3), "text", "doc_id")
    val arrivals = Seq((100L, base + " tail"), (101L, "unrelated new doc"))
      .toDF("doc_id", "text")
    val flags = Dedup.flagAgainstIndex(spark, root, arrivals, "text", "doc_id")
      .orderBy("doc_id", "dup_of").collect()
    // arrival 100 near-dups BOTH indexed variants (build + append paths);
    // 101 matches nothing
    assert(flags.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((100L, 1L), (100L, 3L)))
    // jaccard equals the exact string-shingle jaccard (hashed-set counts
    // are injective-or-loudly-wrong)
    val want = Seq((base + " tail", base), (base + " tail", base + " zz"))
      .toDF("a", "b")
      .select(GraftFunctions.shingleJaccard($"a", $"b", 5)).collect()
      .map(_.getDouble(0)).toSeq
    assert(flags.map(_.getAs[Double]("jaccard")).toSeq === want)
    // re-serving an indexed doc: its identity pair is excluded, real
    // near-dups still flag
    val self = Dedup.flagAgainstIndex(spark, root,
      corpus.where($"doc_id" === 1), "text", "doc_id").collect()
    assert(!self.exists(r => r.getLong(0) == r.getLong(1)))
    assert(self.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 3L)))
    // opened-handle overload is the same serve
    val conf = Dedup.openMinHashIndex(spark, root)
    val viaConf = Dedup.flagAgainstIndex(spark, root, conf, arrivals,
      "text", "doc_id").orderBy("doc_id", "dup_of").collect()
    assert(viaConf.toSeq === flags.toSeq)
    // at-least-once writer: re-appending an increment duplicates index
    // rows, but the flag output must not multiply (absorbed by the
    // flag-sized distinct)
    Dedup.appendMinHashIndex(root, corpus.where($"doc_id" === 3),
      "text", "doc_id")
    val reFlags = Dedup.flagAgainstIndex(spark, root, arrivals, "text",
      "doc_id").orderBy("doc_id", "dup_of").collect()
    assert(reFlags.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      flags.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // a byte-identical flood larger than maxBucketSize is dropped at
    // build (the bucketPairs contract: exact-dedup floods first)
    val floodRoot = dir.resolve("flood_idx").toString
    val flood = (0L until 10L).map(i => (i, base)).toDF("doc_id", "text")
    Dedup.saveMinHashIndex(floodRoot, flood, "text", "doc_id",
      Dedup.MinHashConfig(maxBucketSize = 5))
    assert(spark.read.parquet(s"$floodRoot/buckets.parquet").count() === 0L,
      "oversized buckets must be capped at build")
  }

  test("property: flagAgainstIndex equals the cross-restriction of " +
      "minHashPairs over the disjoint union — pair set AND jaccard " +
      "values, on random word-soup corpora with planted perturbations") {
    import org.scalacheck.{Gen, Prop, Test => SC}
    val vocab = (0 until 50).map(i => s"w$i")
    val doc: Gen[String] = for {
      n <- Gen.choose(30, 60)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    // an arrival is a corpus doc with a suffix (near-dup), a corpus doc
    // with a word swapped in (usually still a near-dup), or fresh text
    def arrivalsOf(corpus: List[String]): Gen[List[String]] =
      Gen.listOfN(math.min(5, corpus.length), Gen.oneOf(
        Gen.oneOf(corpus).map(_ + " zz"),
        Gen.oneOf(corpus).map(t => "w0 " + t.drop(t.indexOf(' ') + 1)),
        doc))
    val fixture: Gen[(List[String], List[String])] = for {
      n <- Gen.choose(8, 20)
      corpus <- Gen.listOfN(n, doc)
      arr <- arrivalsOf(corpus)
    } yield (corpus, arr)

    val prop = Prop.forAll(fixture) { case (corpusTexts, arrTexts) =>
      val corpus = corpusTexts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val arrivals = arrTexts.zipWithIndex
        .map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
      val root = java.nio.file.Files
        .createTempDirectory("graft_ndprop_").resolve("idx").toString
      Dedup.saveMinHashIndex(root, corpus, "text", "doc_id")
      val served = Dedup.flagAgainstIndex(spark, root, arrivals,
        "text", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // batch truth: pairs over the disjoint union, restricted to
      // (arrival, corpus) pairs — id_a < id_b puts corpus ids first
      val batch = Dedup.minHashPairs(corpus.unionAll(arrivals),
        "text", "doc_id").collect()
        .filter(r => r.getLong(0) < 1000L && r.getLong(1) >= 1000L)
        .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
      served == batch
    }
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("Dedup.simHashPairs: hamming 0 for identical, pairs for near-dups") {
    // many distinct tokens -> few zero-vote ties -> stable signature
    // (simhash's design regime; tiny-vocab docs flip too many bits)
    val base = (1 to 300).map(i => s"tok${i}word").mkString(" ")
    val df = Seq((1L, base), (2L, base + " tail"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(df, "text", "doc_id").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }

  test("hammingPairs64: a byte-identical signature flood is dropped by " +
      "the bucket cap (bounded work, documented recall trade); pairs " +
      "outside the flood are unaffected") {
    // 300 identical signatures: every one of their variant buckets
    // holds 300+ members > cap 100, so the flood contributes ZERO
    // pairs instead of 300^2/2 — the keepHotBuckets contract ("run
    // exact dedup first for byte-identical floods"). An outsider one
    // bit away from the flood sig meets it ONLY in flood-sized buckets,
    // so its pairs are dropped too — the documented collateral of the
    // cap. A near pair far from the flood must still be found.
    val floodSig = -1L
    val flood = (100L until 400L).map(i => (i, floodSig))
    val outsider = Seq((500L, floodSig ^ 1L))
    val farPair = Seq((1L, 0x0FL), (2L, 0x0FL ^ 3L)) // hamming 2
    val sigs = (flood ++ outsider ++ farPair).toDF("doc_id", "sig")
    val got = Dedup.hammingPairs64(sigs, maxDist = 8, maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
    // with the cap lifted the flood pairs (and the outsider's) appear
    val full = Dedup.hammingPairs64(sigs, maxDist = 8,
      maxBucketSize = 1000000).count()
    assert(full === 300L * 299L / 2 + 300L + 1L,
      "flood all-pairs + outsider-x-flood + the far pair")
  }

  test("ShingleJaccard equals the composite array_distinct/intersect plan") {
    val docs = Seq(
      ("the quick brown fox", "the quick brown fox"),      // identical -> 1.0
      ("the quick brown fox", "the quick brown cat"),      // near
      ("abc", "abc"),                                      // shorter than k, clamped window
      ("abc", "xyz"),                                      // disjoint -> 0.0
      ("MiXeD CaSe TeXt", "mixed case text"),              // lowercase folding
      ("aaaaaaa", "aaaa"),                                 // distinct-window collapse
      // non-BMP: surrogate pairs must shingle by CODE POINT like Spark's
      // substr, or the fused expression diverges from the composite plan
      ("café 😀😀 naïve 🎉 text",
       "café 😀😀 naïve 🎉 test"),
      ("😀😁😂", "😀😁😂")) // all non-BMP, shorter than k
    val df = docs.toDF("a", "b")
    val composite = df.select(
      Dedup.shingleCol($"a", 5).as("sa"), Dedup.shingleCol($"b", 5).as("sb"))
      .select(
        (size(array_intersect($"sa", $"sb")).cast("double") /
          (size($"sa") + size($"sb") -
            size(array_intersect($"sa", $"sb")))).as("j"))
      .collect().map(_.getDouble(0))
    val fused = df.select(
      GraftFunctions.shingleJaccard($"a", $"b", 5).as("j"))
      .collect().map(_.getDouble(0))
    assert(fused.toSeq === composite.toSeq)
    assert(fused(0) === 1.0 && fused(3) === 0.0)
  }

  test("Dedup.simHashPairs recall equals brute-force Hamming join " +
      "(radii 3..16 across all three ball expansions)") {
    // 60 docs over a moderate vocab: brute force over signatures is the
    // ground truth; the chunk-banded join must return exactly the pairs
    // with hamming <= maxDist — incl. maxDist > 3, where the chunk count
    // derives from the distance (pigeonhole) instead of the fixed 4x16.
    val docs = (0L until 60L).map { i =>
      val toks = (0 until 40).map(j => s"w${(i * 31 + j * 7) % 97}")
      (i, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val sigs = df.select($"doc_id", GraftFunctions.simhashSig(lower($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 = narrow plan; 4 (the dispatch boundary), 6 and 8 (the m5
    // image radius) = ball(1) expansion; 12 = ball(2); 16 = ball(3)
    // (the r16 item-8 radii, formerly the quadratic narrow fallback)
    for (maxDist <- Seq(3, 4, 6, 8, 12, 16)) {
      val expected = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= maxDist
      } yield (a, b)).toSet
      val got = Dedup.simHashPairs(df, "text", "doc_id", maxDist).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"maxDist=$maxDist")
    }
    assertThrows[IllegalArgumentException] {
      Dedup.simHashPairs(df, "text", "doc_id", maxDist = 40)
    }
  }

  test("Dedup.ngramJaccardPairs and dropFromPairs") {
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val df = Seq((1L, base), (2L, base + " thirteen"), (3L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "text", "doc_id")
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    val kept = Dedup.dropFromPairs(df, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept === Array(1L, 3L))
  }

  test("Dedup.ngramJaccardPairs: hot-gram cap bounds the candidate set") {
    // 60 byte-identical docs (every gram df=60, over the cap of 10) plus
    // two near-dup docs with unique vocabulary (df=2, under the cap).
    // Without the cap the flood contributes 60*59/2 = 1770 pairs; with it
    // the flooded grams never enter the index and only the cold pair
    // survives — the bounded-candidate guarantee at 100 TB, in miniature.
    val flood = (1 to 60).map(i =>
      (1000L + i, "the quick brown fox jumps over the lazy dog again and again"))
    val nearDup = Seq(
      (1L, "zebra quagga okapi tapir bongo kudu eland oryx addax saiga"),
      (2L, "zebra quagga okapi tapir bongo kudu eland oryx addax saiga ibex"))
    val df = (flood ++ nearDup).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "text", "doc_id",
        maxDocsPerGram = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs === Seq((1L, 2L)))
    // A hotCap too small to prove the cap decision complete (top-2 table,
    // both entries over the cap) must fall back to the exact
    // aggregate+join path and produce the identical answer.
    val fallback = Dedup.ngramJaccardPairs(df, "text", "doc_id",
        maxDocsPerGram = 10, hotCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fallback === Seq((1L, 2L)))
  }

  test("Dedup.containmentPairs: asymmetric — the quote scores 1.0 " +
      "inside the long doc, the reverse direction stays under threshold") {
    val quote = "alpha beta gamma delta epsilon zeta"
    val long = "intro words here " + quote + " and a very long tail " +
      "with many more unrelated tokens stretching the document onward " +
      "further and further beyond any overlap"
    val df = Seq((1L, quote), (2L, long), (3L, "unrelated text entirely"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "text", "doc_id",
        thresholdPct = 90)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("Dedup.componentsFor: driver union-find path == distributed star " +
      "rounds on chains, cycles, self-loops") {
    // 4-node chain, a triangle (cycle), a self-loop-only node, shared
    // min labels — every structural case the star rounds handle.
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),      // chain -> component 1
      (10L, 11L), (11L, 12L), (12L, 10L), // cycle -> component 10
      (20L, 20L),                         // self-loop -> itself
      (31L, 30L)                          // reversed order -> 30
    ).toDF("id_a", "id_b")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = key(Dedup.componentsFor(pairs))
    val dist = key(Dedup.componentsFor(pairs, smallLimit = 0))
    assert(fast === dist)
    assert(fast === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L),
      (30L, 30L), (31L, 30L)))
  }

  test("Dedup.dropFromPairsKeepBest: champion by (score desc, id asc), " +
      "loners untouched, one survivor per cluster") {
    // Cluster {1,2,3} (chain), cluster {10,11}, loner 20.
    val df = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L),   // champion: 2 (max score, min id)
      (10L, 1L), (11L, 7L),           // champion: 11
      (20L, 0L)                       // loner: kept regardless of score
    ).toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.dropFromPairsKeepBest(df, "id", pairs, col("q"))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(2L, 11L, 20L))
  }

  test("Dedup.planBands: picks the divisor whose implied threshold is " +
      "nearest the target, smaller band count on ties") {
    assert(Dedup.planBands(64, 0.8) === 8)  // (1/8)^(1/8) ≈ 0.77
    assert(Dedup.planBands(64, 0.5) === 16) // (1/16)^(1/4) = 0.5 exactly
    assert(Dedup.planBands(128, 0.9) === 8) // (1/8)^(1/16) ≈ 0.878 vs 4: 0.958
    val b = Dedup.planBands(60, 0.75)
    assert(60 % b === 0)
    intercept[IllegalArgumentException](Dedup.planBands(64, 1.0))
  }

  test("Dedup.prefixJaccardPairs == ngramJaccardPairs (exact, no recall loss)") {
    // Same planted corpus shape as the gates: real docs + near-dup copies.
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
      .select(col("doc_id"), col("text")).limit(60)
    val planted = docs.unionByName(docs.limit(10)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat(col("text"), lit(" zz"))))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val full = key(Dedup.ngramJaccardPairs(planted, "text", "doc_id",
      maxDocsPerGram = Int.MaxValue))
    val pref = key(Dedup.prefixJaccardPairs(planted, "text", "doc_id"))
    assert(pref === full)
    assert(full.nonEmpty)
  }

  test("skewed corpus: one hot gram in half the docs — d4/d16/d18 exact, " +
      "no per-gram count windows to straggle on") {
    // 120 docs, half carrying the same hot sentence: its grams reach
    // df≈60 while every tail gram is unique — the Zipfian head shape
    // that made the old per-gram count windows a one-task straggler.
    // The hot docs share too little to pair (7 of ~15 grams ≈ 0.3
    // jaccard); the planted near-dup pair is the only true positive.
    val hot = "the quick brown fox jumps over the lazy dog"
    val corpus = (1 to 120).map { i =>
      val tail = s"tail$i unique$i words$i here$i now$i end$i more$i last$i"
      (i.toLong, if (i % 2 == 0) s"$hot $tail" else tail)
    } ++ Seq(
      (201L, "zebra quagga okapi tapir bongo kudu eland oryx addax saiga"),
      (202L, "zebra quagga okapi tapir bongo kudu eland oryx addax saiga ibex"))
    val df = corpus.toDF("doc_id", "text")
    def ids(p: org.apache.spark.sql.DataFrame) =
      p.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids(Dedup.ngramJaccardPairs(df, "text", "doc_id"))
      === Set((201L, 202L)))
    assert(ids(Dedup.prefixJaccardPairs(df, "text", "doc_id"))
      === Set((201L, 202L)))
    // Containment is directed: the contained side scores 1.0, the
    // superset side 8/9 — both above the 80% default.
    val cont = Dedup.containmentPairs(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cont.map(t => (t._1, t._2)) === Set((201L, 202L), (202L, 201L)))
    assert(cont.find(_._1 == 201L).get._3 === 1.0)
  }

  test("Dedup.prefixJaccardPairs: prefix index is strictly smaller than " +
      "the full inverted index") {
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
      .select(col("doc_id"), col("text")).limit(40)
    val grams = docs.select(col("doc_id"),
      Dedup.tokenGramsCol(col("text"), 3).as("gs"))
    val fullRows = grams.select(explode(col("gs"))).count()
    // At t=0.5 each doc indexes ng - ceil(ng/2) + 1 ≈ half its grams.
    val ng = col("ng")
    val prefRows = grams.withColumn("ng", size(col("gs")))
      .select(sum(ng - expr("(50 * ng + 99) div 100") + 1)).collect()(0).getLong(0)
    assert(prefRows * 2 <= fullRows + docs.count() * 2)
    assert(prefRows < fullRows)
  }

  test("Dedup.embeddingPairs finds identical embeddings via LSH buckets") {
    val v1 = Array.tabulate(8)(i => (math.sin(i + 1) * 0.5).toFloat)
    val v2 = v1.clone()
    val v3 = Array.tabulate(8)(i => (math.cos(i * 2 + 1) * 0.5).toFloat)
    val df = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(df, "embedding", "vec_id", dim = 8)
    val got = pairs.collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    assert(math.abs(got(0).getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  // ------------------------------------------------------ similarity

  test("Similarity.bruteForceTopK exact ranks on a tiny known corpus") {
    val q = Seq((0L, Array(1f, 0f, 0f))).toDF("qid", "qvec")
    val c = Seq(
      (0L, Array(1f, 0f, 0f)),    // self, excluded
      (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0.5f, 0.5f, 0f)),
      (3L, Array(0f, 1f, 0f)),
      (4L, Array(-1f, 0f, 0f))).toDF("cid", "cvec")
    val top = Similarity.bruteForceTopK(c, q, k = 3).orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("corpus_id")).toSeq === Seq(1L, 2L, 3L))
    assert(top.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
  }

  test("Similarity.evalRetrieval: hand-computed IR panel — recall, " +
      "precision, MRR, MAP in exact ppm; missed queries report zeros") {
    // q1: rel {10,11,12}, hits at ranks 1 and 3 of 5
    // q2: rel {20}, retrieved but no hits
    // q3: rel {30,31}, absent from results entirely
    val results = Seq(
      (1L, 10L, 1L), (1L, 99L, 2L), (1L, 11L, 3L), (1L, 98L, 4L),
      (1L, 97L, 5L), (1L, 12L, 6L), // rank 6 > kEval — ignored
      (2L, 88L, 1L), (2L, 87L, 2L))
      .toDF("query_id", "corpus_id", "rank")
    val qrels = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L),
      (3L, 30L), (3L, 31L)).toDF("query_id", "corpus_id")
    val got = Similarity.evalRetrieval(results, qrels, kEval = 5)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // q1: n_hit 2/3 -> recall 666666; precision 2/5 -> 400000;
    //     rr 1e6/1; ap = (1*1e6 div 1 + 2*1e6 div 3) div 3
    val ap1 = (1000000L + 2000000L / 3) / 3
    assert(got(0) === ((1L, 3L, 2L, 666666L, 400000L, 1000000L, ap1)))
    assert(got(1) === ((2L, 1L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(2) === ((3L, 2L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("Similarity.recallCurve: every tier equals the per-nprobe " +
      "ivfTopK recall, monotone in nprobe, full probing reads 1e6") {
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextFloat() - 0.5f)
    }
    val c = (0L until 60L).map(i => (i, vec(i.toInt))).toDF("cid", "cvec")
    val q = (0L until 6L).map(i => (i, vec(i.toInt))).toDF("qid", "qvec")
    val curve = Similarity.recallCurve(c, q, k = 3, nlist = 6,
      nprobes = Seq(1, 3, 6)).collect()
    assert(curve.length === 18)
    for (np <- Seq(1, 3, 6)) {
      val want = Similarity.recallReport(
          Similarity.ivfTopK(c, q, k = 3, nlist = 6, nprobe = np),
          Similarity.bruteForceTopK(c, q, k = 3)).collect()
        .map(r => (r.getLong(0), r.getAs[Long]("recall_ppm"))).toMap
      curve.filter(_.getAs[Long]("nprobe") == np.toLong).foreach { r =>
        assert(r.getAs[Long]("recall_ppm") === want(r.getLong(0)),
          s"tier $np query ${r.getLong(0)}")
      }
    }
    curve.groupBy(_.getLong(0)).values.foreach { rows =>
      val rs = rows.sortBy(_.getAs[Long]("nprobe"))
        .map(_.getAs[Long]("recall_ppm")).toSeq
      assert(rs === rs.sorted, s"recall not monotone in nprobe: $rs")
    }
    assert(curve.filter(_.getAs[Long]("nprobe") == 6L)
      .forall(_.getAs[Long]("recall_ppm") == 1000000L),
      "full probing must recover exact recall")
  }

  test("Similarity.evalRetrieval: duplicate qrels rows and duplicate " +
      "result docs do not corrupt the panel (best rank kept)") {
    // qrels for q1 carry a repeated judgment; results repeat doc 10 at
    // ranks 1 and 4 — n_rel must stay 2, n_hit must stay <= n_rel, and
    // the repeated doc scores at its BEST rank (1).
    val results = Seq(
      (1L, 10L, 1L), (1L, 99L, 2L), (1L, 11L, 3L), (1L, 10L, 4L))
      .toDF("query_id", "corpus_id", "rank")
    val qrels = Seq((1L, 10L), (1L, 10L), (1L, 11L))
      .toDF("query_id", "corpus_id")
    val r = Similarity.evalRetrieval(results, qrels, kEval = 5).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_rel") === 2L)
    assert(row.getAs[Long]("n_hit") === 2L)
    assert(row.getAs[Long]("recall_ppm") === 1000000L)
    assert(row.getAs[Long]("rr_ppm") === 1000000L)
    // AP over hit ranks {1, 3}: (1e6/1 + 2e6/3) / 2
    assert(row.getAs[Long]("ap_ppm") === (1000000L + 2000000L / 3) / 2)
  }

  test("Similarity.marginFromLists: a list shorter than k divides by " +
      "its ACTUAL count, not a phantom k") {
    // One query each side; fwd list has 2 rows, bwd has 3, k = 4.
    // Margin must be cos * (2 + 3) / (ssum + tsum) — a /k normalizer
    // would inflate it by 8/5.
    val fwd = Seq((1L, 100L, 0.9, 1L), (1L, 101L, 0.5, 2L))
      .toDF("query_id", "corpus_id", "cosine", "rank")
    val bwd = Seq((100L, 1L, 0.9, 1L), (100L, 2L, 0.4, 2L),
      (100L, 3L, 0.1, 3L)).toDF("query_id", "corpus_id", "cosine", "rank")
    val got = Similarity.marginFromLists(fwd, bwd, k = 4, minMargin = 0.0)
      .collect()
    assert(got.length === 1)
    val m = got.head.getAs[Double]("margin")
    val want = 0.9 * 5.0 / (0.9 + 0.5 + 0.9 + 0.4 + 0.1)
    assert(math.abs(m - want) < 1e-12, s"margin $m != $want")
  }

  test("Similarity.marginFromSums: the margin fold split at the static " +
      "seam — materialized backward sums replay marginFromLists " +
      "bit-identically, batch-split forward lists fold to the batch " +
      "answer, mutual rides the static best relation") {
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed + 7000)
      Array.fill(8)(r.nextFloat() - 0.5f)
    }
    val src = (0L until 20L).map(i => (i, vec(i.toInt))).toDF("sid", "svec")
    val tgt = (100L until 125L).map(i => (i, vec(i.toInt)))
      .toDF("tid", "tvec")
    val fwd = Similarity.bruteForceTopK(
      tgt.select(col("tid").as("cid"), col("tvec").as("cvec")),
      src.select(col("sid").as("qid"), col("svec").as("qvec")),
      4, excludeSelf = false)
    val bwd = Similarity.bruteForceTopK(
      src.select(col("sid").as("cid"), col("svec").as("cvec")),
      tgt.select(col("tid").as("qid"), col("tvec").as("qvec")),
      4, excludeSelf = false)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Double]("margin"))).sortBy(_._1).toSeq
    val want = rows(Similarity.marginFromLists(fwd, bwd, k = 4,
      minMargin = 1.0))
    assert(want.nonEmpty)
    // the sums survive a parquet round-trip (the st35 deployment shape:
    // computed once, persisted, joined per arriving batch)
    val sumsDir = java.nio.file.Files
      .createTempDirectory("graft_msums_").resolve("tgt_sums").toString
    Similarity.tgtNeighborhoodSums(bwd).write.parquet(sumsDir)
    val sums = spark.read.parquet(sumsDir)
    assert(rows(Similarity.marginFromSums(fwd, sums, 1.0)) === want)
    // per-source independence: folding each forward half separately and
    // unioning equals the single batch fold
    val half1 = Similarity.marginFromSums(
      fwd.where(col("query_id") % 2 === 0), sums, 1.0)
    val half2 = Similarity.marginFromSums(
      fwd.where(col("query_id") % 2 === 1), sums, 1.0)
    assert(rows(half1.unionAll(half2)) === want)
    // mutual mode through the static backward-best relation
    val bb = bwd.where(col("rank") === 1)
      .select(col("query_id").as("tid"), col("corpus_id").as("sid"))
    assert(rows(Similarity.marginFromSums(fwd, sums, 1.0, Some(bb))) ===
      rows(Similarity.marginFromLists(fwd, bwd, k = 4, minMargin = 1.0,
        mutual = true)))
  }

  test("Similarity.marginMine: forward-top-1 candidates, ratio margin " +
      "from decimal neighbor sums, threshold filter, mutual option") {
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextFloat() - 0.5f)
    }
    val src = (0L until 20L).map(i => (i, vec(i.toInt))).toDF("sid", "svec")
    val tgt = (100L until 125L).map(i => (i, vec(i.toInt)))
      .toDF("tid", "tvec")
    val k = 4
    // expected margins recomputed from the SAME top-k lists the
    // operator folds (bit-identical inputs), with the decimal-sum
    // semantics replicated via BigDecimal at scale 18
    val fwd = Similarity.bruteForceTopK(
      tgt.select(col("tid").as("cid"), col("tvec").as("cvec")),
      src.select(col("sid").as("qid"), col("svec").as("qvec")),
      k, excludeSelf = false).collect()
    val bwd = Similarity.bruteForceTopK(
      src.select(col("sid").as("cid"), col("svec").as("cvec")),
      tgt.select(col("tid").as("qid"), col("tvec").as("qvec")),
      k, excludeSelf = false).collect()
    // Spark's double->decimal cast goes through the shortest-string
    // BigDecimal (valueOf), not the exact binary expansion
    def dec(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(18, java.math.RoundingMode.HALF_UP)
    val ssum = fwd.groupBy(_.getAs[Long]("query_id")).view.mapValues(
      _.map(r => dec(r.getAs[Double]("cosine")))
        .reduce(_.add(_))).toMap
    val tsum = bwd.groupBy(_.getAs[Long]("query_id")).view.mapValues(
      _.map(r => dec(r.getAs[Double]("cosine")))
        .reduce(_.add(_))).toMap
    val best = fwd.filter(_.getAs[Long]("rank") == 1L)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"),
        r.getAs[Double]("cosine")))
    val wantAll = best.map { case (s, t, c) =>
      (s, t, c * (2.0 * k) / ssum(s).add(tsum(t)).doubleValue)
    }
    val minMargin = wantAll.map(_._3).sorted.apply(wantAll.length / 2)
    val want = wantAll.filter(_._3 >= minMargin)
      .map { case (s, t, m) => (s, t, m) }.sortBy(_._1)
    assert(want.nonEmpty && want.length < wantAll.length,
      "threshold must split the candidates nontrivially")
    val got = Similarity.marginMine(src, tgt, k, minMargin)
      .orderBy("src_id").collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Double]("margin")))
    assert(got.toSeq === want.toSeq)
    // mutual: every kept pair is also the target's backward top-1
    val back1 = bwd.filter(_.getAs[Long]("rank") == 1L)
      .map(r => (r.getAs[Long]("corpus_id"), r.getAs[Long]("query_id")))
      .toSet
    val gotMutual = Similarity.marginMine(src, tgt, k, minMargin,
        mutual = true).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"))).toSet
    assert(gotMutual === got.map(p => (p._1, p._2))
      .filter(back1.contains).toSet)
  }

  test("Similarity.hardNegatives: top-k restricted to cross-label " +
      "pairs, same-label rows never surface") {
    val q = Seq((0L, Array(1f, 0f, 0f), 7)).toDF("qid", "qvec", "qlab")
    val c = Seq(
      (1L, Array(0.99f, 0.1f, 0f), 7),  // most similar but SAME label
      (2L, Array(0.9f, 0.1f, 0f), 3),
      (3L, Array(0.5f, 0.5f, 0f), 3),
      (4L, Array(0f, 1f, 0f), 5),
      (5L, Array(-1f, 0f, 0f), 7)).toDF("cid", "cvec", "clab")
    val got = Similarity.hardNegatives(c, q, k = 3).orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("corpus_id")).toSeq === Seq(2L, 3L, 4L))
    assert(got.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    // cross-check: equals brute force over the pre-filtered corpus
    val want = Similarity.bruteForceTopK(
        c.where(col("clab") =!= 7).select("cid", "cvec"),
        q.select("qid", "qvec"), k = 3, excludeSelf = false)
      .select("query_id", "rank", "corpus_id")
      .collect().map(_.toSeq).toSet
    val gotT = got.map(r => Seq[Any](r.getAs[Long]("query_id"),
      r.getAs[Long]("rank"), r.getAs[Long]("corpus_id"))).toSet
    assert(gotT === want)
  }

  test("Similarity.semanticOrder: groups follow (bucket, id) order, " +
      "are ctxDocs-sized, and keep same-bucket docs contiguous") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = (0L until 50L).map(i =>
      (i, Array.tabulate(6)(j => (math.sin(i * 13 + j) * 0.5).toFloat)))
    val c = vecs.toDF("cid", "cvec").repartition(5)
    val got = Similarity.semanticOrder(c, dim = 6, ctxDocs = 8, bits = 4)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Long]("bucket"), r.getAs[Long]("ctx_group")))
    assert(got.length === 50)
    // group = position in (bucket, id) order div ctxDocs, exactly
    val order = got.sortBy(t => (t._2, t._1))
    order.zipWithIndex.foreach { case ((id, b, g), i) =>
      assert(g === i / 8, s"vec $id bucket $b: group $g, want ${i / 8}")
    }
    // sizes: every group full except possibly the last
    val sizes = got.groupBy(_._3).toSeq.sortBy(_._1).map(_._2.length)
    assert(sizes.init.forall(_ === 8) && sizes.last === 50 % 8)
  }

  test("Similarity.ivfTopK with full probing equals brute force") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(6)(j => (math.sin(i * 7 + j) * 0.3).toFloat)))
    val c = vecs.toDF("cid", "cvec")
    val q = vecs.take(3).map { case (i, v) => (i, v) }.toDF("qid", "qvec")
    val bf = Similarity.bruteForceTopK(c, q, 4)
      .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
    val ivf = Similarity.ivfTopK(c, q, 4, nlist = 8, nprobe = 8)
      .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
    assert(ivf === bf) // nprobe = nlist -> exhaustive -> identical
  }

  test("Similarity.pqTopK with rerank covering the corpus equals brute force") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => (math.sin(i * 7 + j) * 0.3).toFloat)))
    val c = vecs.toDF("cid", "cvec")
    val q = vecs.take(3).toDF("qid", "qvec")
    val bf = Similarity.bruteForceTopK(c, q, 4)
      .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
    // rerank >= corpus size -> every vector reaches the exact re-rank
    val pq = Similarity.pqTopK(c, q, 4, dim = 8, m = 4, codes = 8, rerank = 40)
      .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
    assert(pq === bf)
  }

  test("Similarity.pqTopK: codes are in range and the ADC cut keeps recall high") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(j => (math.cos(i * 13 + j * 3) * 0.5).toFloat)))
    val c = vecs.toDF("cid", "cvec")
    val codebook = Array.tabulate(4)(mi => vecs.take(8).map(_._2
      .slice(mi * 2, mi * 2 + 2).map(_.toDouble)).toArray)
    val enc = c.select(graft.functions.GraftFunctions
        .pqEncode(col("cvec"), codebook).as("codes"))
      .collect().map(_.getSeq[Int](0))
    assert(enc.forall(cs => cs.length == 4 && cs.forall(x => x >= 0 && x < 8)))
    // with a modest rerank cut, most true top-4 neighbors still surface
    val q = vecs.take(5).toDF("qid", "qvec")
    val bf = Similarity.bruteForceTopK(c, q, 4)
      .select("query_id", "corpus_id").collect().map(_.toSeq).toSet
    val pq = Similarity.pqTopK(c, q, 4, dim = 8, m = 4, codes = 16, rerank = 12)
      .select("query_id", "corpus_id").collect().map(_.toSeq).toSet
    val recall = (bf intersect pq).size.toDouble / bf.size
    assert(recall >= 0.7, s"PQ recall@rerank=12 was $recall")
  }

  test("NearestCentroid picks the argmax-cosine id with smallest-id tiebreak") {
    val ids = Array(3L, 7L, 9L)
    val cents = Array(
      Array(1.0, 0.0),
      Array(0.0, 1.0),
      Array(0.0, 2.0)) // same direction as id 7 -> cosine ties, 7 wins
    val df = Seq(
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.1f, 5.0f))).toDF("cid", "cvec")
    val got = df.select(col("cid"), graft.functions.GraftFunctions
        .nearestCentroid(col("cvec"), ids, cents).as("assigned"))
      .orderBy("cid").collect().map(_.getLong(1)).toSeq
    assert(got === Seq(3L, 7L))
  }

  test("TopCentroids: best-first by (cosine desc, id asc); top-1 agrees " +
      "with NearestCentroid; nprobe clamps to list size") {
    val ids = Array(3L, 7L, 9L)
    val cents = Array(
      Array(1.0, 0.0),
      Array(0.0, 1.0),
      Array(0.0, 2.0)) // same direction as id 7 -> cosine ties, 7 first
    val df = Seq(
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.1f, 5.0f))).toDF("cid", "cvec")
    val got = df.select(col("cid"),
        graft.functions.GraftFunctions.topCentroids(col("cvec"), ids,
          cents, 3).as("probes"),
        graft.functions.GraftFunctions
          .nearestCentroid(col("cvec"), ids, cents).as("best"))
      .orderBy("cid").collect()
    got.foreach { r =>
      val probes = r.getAs[scala.collection.Seq[Long]]("probes")
      assert(probes.head === r.getAs[Long]("best"))
      assert(probes.length === 3)
      assert(probes.toSet.size === 3, "each centroid probed once")
    }
    // tie order: for (0.1, 5.0) centroids 7 and 9 tie exactly -> id asc
    assert(got(1).getAs[scala.collection.Seq[Long]]("probes").toSeq ===
      Seq(7L, 9L, 3L))
    // nprobe = 1 is exactly the argmax
    val one = df.select(graft.functions.GraftFunctions
        .topCentroids(col("cvec"), ids, cents, 1).as("p"))
      .collect().map(_.getAs[scala.collection.Seq[Long]]("p").toSeq)
    assert(one.toSeq === Seq(Seq(3L), Seq(7L)))
  }

  test("PrefixCountsTrue: exclusive running count, nulls count as false") {
    val df = Seq(
      (1L, Seq[java.lang.Boolean](true, false, true, true, false)),
      (2L, Seq[java.lang.Boolean](null, true, null)),
      (3L, Seq.empty[java.lang.Boolean])).toDF("id", "flags")
    val got = df.select(col("id"), graft.functions.GraftFunctions
        .prefixCountsTrue(col("flags")).as("ps"))
      .orderBy("id").collect()
      .map(_.getAs[scala.collection.Seq[Int]]("ps").toSeq)
    assert(got(0) === Seq(0, 1, 1, 2, 3))
    assert(got(1) === Seq(0, 0, 1))
    assert(got(2) === Seq.empty)
  }

  test("Similarity.ivfPqTopK with full probing and rerank equals brute force") {
    val spark0 = spark
    import spark0.implicits._
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => (math.sin(i * 7 + j) * 0.3).toFloat)))
    val c = vecs.toDF("cid", "cvec")
    val q = vecs.take(3).toDF("qid", "qvec")
    val bf = Similarity.bruteForceTopK(c, q, 4)
      .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
    val ivfpq = Similarity.ivfPqTopK(c, q, 4, dim = 8, nlist = 8, nprobe = 8,
        m = 4, codes = 8, rerank = 40, refineIters = 1)
      .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
    assert(ivfpq === bf)
  }

  test("Similarity.ivfPqTopK: probed candidate volume scales with nprobe") {
    val spark0 = spark
    import spark0.implicits._
    val n = 60
    val vecs = (0L until n.toLong).map(i =>
      (i, Array.tabulate(8)(j => (math.cos(i * 13 + j * 3) * 0.5).toFloat)))
    val c = vecs.toDF("cid", "cvec")
    val q = vecs.take(4).toDF("qid", "qvec")
    val nlist = 10

    // Independent rebuild of the index pieces from public parts: the same
    // hash-ordered centroid sample, NearestCentroid assignment, and a
    // row_number probe — then count the (query, corpus) pairs the ADC
    // stage would score at each nprobe.
    val cents = c
      .orderBy(pmod(col("cid") * lit(2654435761L), lit(2147483647L)), col("cid"))
      .limit(nlist)
      .select(col("cid").as("centroid_id"), col("cvec").as("centroid_vec"))
    val centRows = cents.orderBy("centroid_id").collect()
    val centIds = centRows.map(_.getLong(0))
    val centVecs = centRows.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val assigned = c.select(col("cid"), graft.functions.GraftFunctions
      .nearestCentroid(col("cvec"), centIds, centVecs).as("centroid_id"))

    def pairsAt(nprobe: Int): Long = {
      val probes = q.crossJoin(broadcast(cents))
        .select(col("qid"), col("centroid_id"),
          graft.functions.GraftFunctions
            .cosine(col("qvec"), col("centroid_vec")).as("psim"))
        .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
          .Window.partitionBy("qid").orderBy(desc("psim"), col("centroid_id"))))
        .where(col("rn") <= nprobe)
        .select("qid", "centroid_id")
      probes.join(assigned, "centroid_id")
        .where(col("cid") =!= col("qid")).count()
    }

    val p1 = pairsAt(1); val p4 = pairsAt(4); val pAll = pairsAt(nlist)
    // full probing scores every non-self pair; pruning scores a fraction
    assert(pAll === 4L * n - 4L)
    assert(p1 <= p4 && p4 <= pAll)
    assert(p1 < pAll / 2, s"nprobe=1 scored $p1 of $pAll pairs — no pruning")

    // and the pruned search still recovers most true neighbors
    val bf = Similarity.bruteForceTopK(c, q, 4)
      .select("query_id", "corpus_id").collect().map(_.toSeq).toSet
    val pruned = Similarity.ivfPqTopK(c, q, 4, dim = 8, nlist = nlist,
        nprobe = 4, m = 4, codes = 8, rerank = 12)
      .select("query_id", "corpus_id").collect().map(_.toSeq).toSet
    val recall = (bf intersect pruned).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF-PQ recall@nprobe=4,rerank=12 was $recall")
  }

  /** Plain-Scala replay of the hyperplane bucket function (same float ->
    * double widening and sequential accumulation as HyperplaneSig). */
  private def lshBucketOf(v: Array[Float], dim: Int, bits: Int): Int = {
    val ps = Dedup.planes(dim, bits)
    (0 until bits).map { i =>
      var dot = 0.0; var j = 0
      while (j < dim) { dot += v(j) * ps(i)(j); j += 1 }
      if (dot > 0) 1 << i else 0
    }.sum
  }

  test("Similarity.lshTopK equals brute force when probing covers all buckets") {
    val spark0 = spark
    import spark0.implicits._
    // bits = 1: two buckets; multi-probe is {b, b^1} = the whole corpus,
    // so the approximate result must be exact.
    val vecs = (0L until 30L).map(i =>
      (i, Array.tabulate(8)(j => (math.sin(i * 3 + j) * 0.5).toFloat)))
    val c = vecs.toDF("cid", "cvec")
    val q = vecs.take(4).toDF("qid", "qvec")
    val bf = Similarity.bruteForceTopK(c, q, 3)
      .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
    val lsh = Similarity.lshTopK(c, q, 3, dim = 8, bits = 1)
      .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
    assert(lsh === bf)
  }

  test("Similarity.lshTopK multi-probe reaches Hamming-1 buckets") {
    val spark0 = spark
    import spark0.implicits._
    // Deterministically search (seeded) for a query and a near-identical
    // neighbor whose buckets differ in exactly one bit: the neighbor is
    // only reachable through multi-probe. The opposite-direction vector
    // lands in the complement bucket (Hamming 5) and must NOT surface.
    val dim = 8; val bits = 5
    val rnd = new scala.util.Random(7)
    val found = Iterator.continually {
      val q = Array.fill(dim)((rnd.nextGaussian() * 0.5).toFloat)
      val c1 = q.map(x => x + (rnd.nextGaussian() * 0.05).toFloat)
      (q, c1)
    }.take(10000).find { case (q, c1) =>
      java.lang.Integer.bitCount(
        lshBucketOf(q, dim, bits) ^ lshBucketOf(c1, dim, bits)) == 1
    }
    assert(found.isDefined, "no Hamming-1 pair found in 10k seeded draws")
    val (qv, c1) = found.get
    val c = Seq((1L, c1), (2L, qv.map(x => -x))).toDF("cid", "cvec")
    val q = Seq((10L, qv)).toDF("qid", "qvec")
    val got = Similarity.lshTopK(c, q, 2, dim = dim, bits = bits)
      .orderBy("rank").collect().map(_.getAs[Long]("corpus_id")).toSeq
    assert(got === Seq(1L))
  }

  test("Similarity.lshTopK spreads an anisotropic corpus across buckets") {
    val spark0 = spark
    import spark0.implicits._
    // Every vector has dominant positive components 0-4 (the components the
    // axis-aligned baseline below reads): axis-aligned sign buckets (the old
    // scheme) collapse the whole corpus into bucket 2^bits - 1. Seeded
    // Gaussian hyperplanes are rotation-invariant, so occupancy must stay
    // spread; and a planted duplicate (same direction => same bucket) must
    // come back at rank 1.
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 40L).map(i => (i, Array.tabulate(8)(j =>
      if (j < 5) 3f + rnd.nextFloat() else rnd.nextGaussian().toFloat)))
    val axisBuckets = vecs.map { case (_, v) =>
      (0 until 5).map(b => if (v(b) > 0) 1 << b else 0).sum
    }.toSet
    val hpBuckets = vecs.map(v => lshBucketOf(v._2, 8, 5)).toSet
    assert(axisBuckets.size <= 4, s"fixture not anisotropic: $axisBuckets")
    assert(hpBuckets.size > axisBuckets.size,
      s"hyperplane buckets must spread: $hpBuckets vs axis $axisBuckets")
    val c = (vecs :+ ((100L, vecs(5)._2.map(x => x * 1.001f)))).toDF("cid", "cvec")
    val q = Seq((5L, vecs(5)._2)).toDF("qid", "qvec")
    val top = Similarity.lshTopK(c, q, 1, dim = 8, bits = 5).collect()
    assert(top.head.getAs[Long]("corpus_id") === 100L)
  }

  test("TextAnalysis.normalize masks urls/emails and collapses whitespace") {
    val df = Seq(
      (1L, "Visit https://example.com/x?q=1 NOW"),
      (2L, "mail Bob.Smith+tag@corp.example.org   please"),
      (3L, "  Tabs\tand\nnewlines  collapse  ")).toDF("doc_id", "text")
    val got = TextAnalysis.normalize(df, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(got(0) === "visit <url> now")
    assert(got(1) === "mail <email> please")
    assert(got(2) === "tabs and newlines collapse")
  }

  test("TextAnalysis.repetition flags duplicate lines and dominant 2-grams") {
    val dupLines = (Seq.fill(7)("same line here") ++ Seq("one", "two")).mkString("\n")
    val dupGrams = Seq.fill(20)("buy now").mkString(" ") + " other text"
    val clean = "a perfectly ordinary sentence with no repeated content at all"
    val df = Seq((1L, dupLines), (2L, dupGrams), (3L, clean)).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(df, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_dup_lines"),
        r.getAs[Long]("top_2gram_n"), r.getAs[Boolean]("is_repetitive"))).toMap
    assert(got(1L)._1 === 6L && got(1L)._3 === true)  // 7 copies -> 6 dups
    assert(got(2L)._2 >= 19L && got(2L)._3 === true)  // "now buy"/"buy now" dominate
    assert(got(3L) === ((0L, 1L, false)))
  }

  // ------------------------------------------------------ multimodal

  test("Multimodal: batched stub decode is deterministic with stable schema") {
    val df = Seq((1L, "payload-one"), (2L, "payload-two"), (1000L, "payload-one"))
      .toDF("doc_id", "text")
    val media = Multimodal.fromText(df, "doc_id", "text")
    assert(media.schema.map(f => (f.name, f.dataType)) ===
      Multimodal.mediaSchema.map(f => (f.name, f.dataType)))
    val feats = Multimodal.extractFeatures(
      Multimodal.toDataset(spark, media), dim = 4, batchSize = 2)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.feature.length).toSeq === Seq(4, 4, 4))
    assert(feats(0).feature.toSeq === feats(2).feature.toSeq) // same bytes
    assert(feats(0).feature.toSeq !== feats(1).feature.toSeq)
    assert(feats(0).n_bytes === "payload-one".getBytes.length.toLong)
    assert(Multimodal.StubCodec.sampleFrames("abcdefgh".getBytes, 4).size === 4)
  }

  test("ImageHeaderParse: real container headers parse; junk never throws") {
    import graft.functions.ImageHeaderParse.{parse => p}
    import Multimodal.SyntheticImages
    def dims(b: Array[Byte]) =
      Option(p(b)).map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))
    assert(dims(SyntheticImages.png(640, 480)) === Some(("png", 640, 480)))
    assert(dims(SyntheticImages.gif(3, 70000 % 65536)) === Some(("gif", 3, 4464)))
    assert(dims(SyntheticImages.jpeg(1920, 1080)) === Some(("jpeg", 1920, 1080)))
    assert(dims(SyntheticImages.bmp(33, 44)) === Some(("bmp", 33, 44)))
    // top-down BMP: height stored negative, parser normalizes
    assert(dims(SyntheticImages.bmp(33, 44, topDown = true)) ===
      Some(("bmp", 33, 44)))
    // the JPEG walk must skip APP0 and not read dims from it
    assert(dims(SyntheticImages.jpeg(1, 2)) === Some(("jpeg", 1, 2)))
    // truncation at every prefix length: null or the correct dims (once
    // the SOF dim bytes are in view), never an exception or a misread
    val full = SyntheticImages.jpeg(100, 200)
    (0 until full.length).foreach { n =>
      dims(full.take(n)).foreach(d => assert(d === (("jpeg", 100, 200))))
    }
    assert(p(Array[Byte]()) == null)
    assert(p("not an image at all".getBytes) == null)
    assert(p(Array.fill[Byte](64)(0xff.toByte)) == null) // fill-byte storm
    // a PNG whose first chunk is not IHDR is rejected, not misread
    val bad = SyntheticImages.png(9, 9)
    bad(12) = 'X'; assert(p(bad) == null)
  }

  test("MediaHeaderParse: wav/mp4/flac headers parse; junk and truncation never throw") {
    import graft.functions.MediaHeaderParse.{parse => p}
    import Multimodal.SyntheticMedia
    def meta(b: Array[Byte]) = Option(p(b)).map { r =>
      (r.getUTF8String(0).toString,
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4),
        if (r.isNullAt(5)) -1 else r.getInt(5))
    }
    // WAV: 2ch 16-bit 8kHz, 64000 data bytes = 32000 bytes/s·ch... = 2000 ms
    assert(meta(SyntheticMedia.wav(8000, 2, 64000)) ===
      Some(("wav", 2000L, 8000, 2, -1, -1)))
    assert(meta(SyntheticMedia.wav(44100, 1, 88200)) ===
      Some(("wav", 1000L, 44100, 1, -1, -1)))
    // FLAC: 48k samples @48kHz = 1000 ms; 8 channels is the 3-bit max
    assert(meta(SyntheticMedia.flac(48000, 8, 48000L)) ===
      Some(("flac", 1000L, 48000, 8, -1, -1)))
    assert(meta(SyntheticMedia.flac(16000, 1, 4000L)) ===
      Some(("flac", 250L, 16000, 1, -1, -1)))
    // MP4: mvhd ms timescale + tkhd 16.16 dims
    assert(meta(SyntheticMedia.mp4(90000, 1920, 1080)) ===
      Some(("mp4", 90000L, -1, -1, 1920, 1080)))
    // truncation at every prefix: null or correct, never a throw/misread
    val full = SyntheticMedia.mp4(500, 64, 48)
    (0 until full.length).foreach(n => meta(full.take(n)))
    val fw = SyntheticMedia.wav(8000, 1, 160)
    (0 until fw.length).foreach(n => meta(fw.take(n)))
    assert(p(Array[Byte]()) == null)
    assert(p("RIFFxxxxJUNK and then some".getBytes) == null)
    assert(p("this is not media".getBytes) == null)
  }

  test("Multimodal.mediaMeta: codegen'd projection over mixed payloads") {
    import Multimodal.SyntheticMedia
    val rows = Seq(
      (1L, SyntheticMedia.wav(8000, 1, 16000)),
      (2L, SyntheticMedia.mp4(1500, 320, 240)),
      (3L, "garbage".getBytes))
    val out = Multimodal.mediaMeta(rows.toDF("media_id", "content"), "content")
      .select("media_id", "format", "duration_ms", "sample_rate", "width")
      .collect().sortBy(_.getLong(0))
    assert(out(0).getString(1) === "wav" && out(0).getLong(2) === 1000L &&
      out(0).getInt(3) === 8000 && out(0).isNullAt(4))
    assert(out(1).getString(1) === "mp4" && out(1).getLong(2) === 1500L &&
      out(1).isNullAt(3) && out(1).getInt(4) === 320)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("Multimodal.imageDims: codegen'd projection over mixed payloads") {
    import Multimodal.SyntheticImages
    val rows = Seq(
      (1L, SyntheticImages.png(10, 20)),
      (2L, SyntheticImages.gif(30, 40)),
      (3L, "garbage".getBytes))
    val out = Multimodal.imageDims(rows.toDF("media_id", "content"), "content")
      .select("media_id", "format", "width", "height")
      .collect().sortBy(_.getLong(0))
    assert(out(0).getString(1) === "png" && out(0).getInt(2) === 10)
    assert(out(1).getString(1) === "gif" && out(1).getInt(3) === 40)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("PdfTextExtract: COS escapes, nested parens, Tj-only, encrypted-empty") {
    import Multimodal.SyntheticDocs
    def ex(b: Array[Byte]) = Option(graft.functions.PdfTextExtract.extract(b))
      .map(_.toString).orNull
    // Round-trip through the builder's escaping: parens + backslash.
    val t = "a (nested (deep)) b \\ c"
    assert(ex(SyntheticDocs.pdf(1, pageTexts = Seq(t))) === t)
    // Multi-page joins with a single space, page order preserved.
    assert(ex(SyntheticDocs.pdf(2, pageTexts = Seq("p one", "p two")))
      === "p one p two")
    // Raw stream: octal and control escapes; a string NOT followed by
    // Tj (a Td operand or TJ array) is not emitted.
    val raw = ("%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj\n" +
      "stream\nBT (skip me) Td (\\110i\\t!) Tj ET\nendstream\n%%EOF")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(ex(raw) === "Hi\t!")
    // Backslash-EOL is a LINE CONTINUATION (contributes nothing), for
    // all three EOL conventions; \n (escape) still decodes to newline.
    val wrapped = ("%PDF-1.4\nstream\nBT (wrap\\\nped \\\r\nlong " +
      "\\\rline\\nend) Tj ET\nendstream\n%%EOF")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(ex(wrapped) === "wrapped long line\nend")
    // A 'BT' inside a literal string must not open a text block.
    val tricky = ("%PDF-1.4\nstream\nBT (has BT inside) Tj ET\nendstream\n" +
      "%%EOF").getBytes
    assert(ex(tricky) === "has BT inside")
    // Encrypted -> empty (ciphertext strings); junk -> NULL; truncation
    // at every prefix never throws.
    assert(ex(SyntheticDocs.pdf(1, encrypted = true,
      pageTexts = Seq("secret"))) === "")
    assert(ex("no pdf here".getBytes) === null)
    val full = SyntheticDocs.pdf(2, pageTexts = Seq("p one", "p two"))
    (0 until full.length by 17).foreach(n =>
      graft.functions.PdfTextExtract.extract(full.take(n)))
  }

  test("CdcChunks: boundaries resync after an insertion (the CDC property); " +
      "size bounds hold; chunkPairs finds embedded payloads") {
    def chunksOf(b: Array[Byte]) = {
      val arr = graft.functions.CdcChunks.chunk(b, 6, 16, 256)
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 3); (r.getInt(0), r.getInt(1), r.getLong(2))
      }
    }
    val rnd = new scala.util.Random(7)
    val payload = Array.fill[Byte](4000)(rnd.nextInt(256).toByte)
    val base = chunksOf(payload)
    // Size bounds: every chunk in [16, 256] except possibly the last.
    assert(base.dropRight(1).forall { case (_, l, _) => l >= 16 && l <= 256 })
    assert(base.map(_._2).sum === 4000)
    // THE content-defined property: prepend 7 bytes — fixed-size
    // chunking would shift every block; gear boundaries resync, so all
    // but the first O(1) chunk fingerprints survive at shifted offsets.
    val shifted = chunksOf(Array.fill[Byte](7)(1) ++ payload)
    val baseFps = base.map(_._3).toSet
    val survived = shifted.map(_._3).count(baseFps.contains)
    assert(survived >= base.size - 3,
      s"only $survived of ${base.size} chunks survived a 7-byte prepend")
    // Determinism + empty input.
    assert(chunksOf(payload) === base)
    assert(chunksOf(Array.emptyByteArray).isEmpty)

    // chunkPairs: an embedded 2KB segment is found across different
    // carriers; an unrelated payload pairs with nobody.
    import spark.implicits._
    val seg = Array.fill[Byte](2000)(rnd.nextInt(256).toByte)
    val other = Array.fill[Byte](2000)(rnd.nextInt(256).toByte)
    val df = Seq(
      (1L, Array.fill[Byte](100)(2) ++ seg ++ Array.fill[Byte](50)(3)),
      (2L, Array.fill[Byte](33)(4) ++ seg),
      (3L, other)).toDF("doc_id", "bytes")
    val pairs = Dedup.chunkPairs(df, "bytes", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length === 1 && pairs(0)._1 === 1L && pairs(0)._2 === 2L)
    assert(pairs(0)._3 >= (2000 / 64) / 2, "most interior chunks shared")
  }

  test("WavEnergy: windowed integer energy, partial last window, format gates") {
    import Multimodal.SyntheticMedia
    // 1s @ 1kHz, 100ms windows: w0 silent, w1 amplitude 100, w2 mixed
    // (half 200 half 0 -> mean 100), rest silent; plus 50 extra samples
    // at 40 (a partial last window averaged over its own length).
    val samples = new Array[Short](1050)
    (100 until 200).foreach(samples(_) = 100)
    (200 until 250).foreach(samples(_) = 200)
    (1000 until 1050).foreach(samples(_) = 40)
    val row = graft.functions.WavEnergy.parse(
      SyntheticMedia.wavPcm(1000, samples), 100)
    assert(row.getInt(0) === 1000)
    val e = row.getArray(1).toLongArray()
    assert(e.length === 11)
    assert(e(0) === 0L && e(1) === 100L && e(2) === 100L && e(9) === 0L)
    assert(e(10) === 40L) // partial window: 50 samples, own-length mean
    // Negative samples contribute |sample|.
    val neg = graft.functions.WavEnergy.parse(
      SyntheticMedia.wavPcm(1000, Array.fill[Short](100)(-50)), 100)
    assert(neg.getArray(1).toLongArray().toSeq === Seq(50L))
    // Stereo / 8-bit / junk / truncation: NULL, never a throw.
    assert(graft.functions.WavEnergy.parse(
      SyntheticMedia.wav(8000, 2, 320), 100) === null) // stereo
    assert(graft.functions.WavEnergy.parse("junk".getBytes, 100) === null)
    val full = SyntheticMedia.wavPcm(1000, samples)
    (0 until full.length by 13).foreach { n =>
      graft.functions.WavEnergy.parse(full.take(n), 100) // must not throw
    }
  }

  test("PdfMetaParse: pages counted with /Pages excluded; flags, truncation, junk") {
    import Multimodal.SyntheticDocs
    val full = graft.functions.PdfMetaParse.parse(
      SyntheticDocs.pdf(pages = 7, version = "1.6",
        encrypted = true, linearized = true))
    assert(full.getString(0) === "1.6")
    assert(full.getInt(1) === 7) // the /Type /Pages tree node must NOT count
    assert(full.getBoolean(2) && full.getBoolean(3) && full.getBoolean(4))
    val plain = graft.functions.PdfMetaParse.parse(SyntheticDocs.pdf(pages = 1))
    assert(plain.getString(0) === "1.4" && plain.getInt(1) === 1)
    assert(!plain.getBoolean(2) && !plain.getBoolean(3) && plain.getBoolean(4))
    // Missing %%EOF -> parsed but not well-formed.
    val trunc = graft.functions.PdfMetaParse.parse(
      SyntheticDocs.pdf(pages = 2, truncated = true))
    assert(trunc.getInt(1) === 2 && !trunc.getBoolean(4))
    // No PDF header -> NULL; truncation at every prefix never throws.
    assert(graft.functions.PdfMetaParse.parse("plain text".getBytes) === null)
    val bytes = SyntheticDocs.pdf(pages = 3)
    (0 until bytes.length by 11).foreach { n =>
      graft.functions.PdfMetaParse.parse(bytes.take(n)) // must not throw
    }
    // /Type/Page with NO whitespace (compact writers) still counts.
    val compact = ("%PDF-1.5\n1 0 obj << /Type/Page >> endobj\n" +
      "2 0 obj << /Type/Pages >> endobj\n%%EOF").getBytes
    assert(graft.functions.PdfMetaParse.parse(compact).getInt(1) === 1)
  }

  test("DHash64: gradient BMP inverts to its signature; row order and pooling invariant") {
    import Multimodal.SyntheticImages
    val sig = SyntheticImages.avalanche(42L)
    // The 9x8 gradient construction is the hash's exact inverse.
    assert(graft.functions.DHash64.hash(
      SyntheticImages.bmpGradient(sig)) === sig)
    // Top-down byte order must not change the signature.
    assert(graft.functions.DHash64.hash(
      SyntheticImages.bmpGradient(sig, topDown = true)) === sig)
    // Average-pooling invariance: scale every cell to a 4x4 block
    // (36x32 image) — constant blocks pool back to the same grid.
    val gray9 = Array.tabulate(8, 9) { (y, x) =>
      var v = 128; var i = 0
      while (i < x) { v += (if (((sig >>> (y * 8 + i)) & 1L) == 1L) 8 else -8); i += 1 }
      v
    }
    val gray36 = Array.tabulate(32, 36)((y, x) => gray9(y / 4)(x / 4))
    assert(graft.functions.DHash64.hash(
      SyntheticImages.bmpGray(gray36)) === sig)
    // Undecodable payloads: junk, truncation at every prefix, non-BMP
    // containers, sub-pool-grid dimensions — all NULL, never a throw.
    val full = SyntheticImages.bmpGradient(sig)
    (0 until full.length by 7).foreach { n =>
      assert(graft.functions.DHash64.hash(full.take(n)) === null)
    }
    assert(graft.functions.DHash64.hash("garbage".getBytes) === null)
    assert(graft.functions.DHash64.hash(SyntheticImages.png(20, 20)) === null)
    assert(graft.functions.DHash64.hash(
      SyntheticImages.bmpGray(Array.fill(4, 4)(7))) === null)
  }

  test("Multimodal.imageNearDup: planted 3-bit flip pair found, unrelated images not") {
    import Multimodal.SyntheticImages
    val base = SyntheticImages.avalanche(100L)
    val rows = Seq(
      (1L, SyntheticImages.bmpGradient(base)),
      (2L, SyntheticImages.bmpGradient(base ^ ((1L << 5) | (1L << 33) | (1L << 60)))),
      (3L, SyntheticImages.bmpGradient(SyntheticImages.avalanche(300L))),
      (4L, "junk".getBytes)) // undecodable: must drop out, not pair
    val got = Multimodal.imageNearDup(
        rows.toDF("media_id", "content"), "media_id", "content", maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, 2L, 3)))
  }

  test("Multimodal.resize: distributed resample updates payload and metadata") {
    val df = Seq((1L, "0123456789abcdef")).toDF("doc_id", "text")
    val media = Multimodal.toDataset(spark,
      Multimodal.fromText(df, "doc_id", "text")
        .withColumn("width", lit(4)).withColumn("height", lit(4)))
    val out = Multimodal.resize(media, 2, 2).collect()(0)
    assert(out.width === 2 && out.height === 2)
    assert(out.content.length === 4)
    // nearest-neighbor picks cols {0,2} of rows {0,2} of the 4x4 grid:
    // bytes 0, 2, 8, 10
    assert(new String(out.content) === "028a")
    // deterministic
    val again = Multimodal.resize(media, 2, 2).collect()(0)
    assert(again.content.toSeq === out.content.toSeq)
  }

  test("incrementalExact: corpus hits drop, within-batch dups keep first id, fp appended") {
    val corpusFps = Seq("known doc text").toDF("t")
      .select(GraftFunctions.fingerprint(col("t")).as("fp"))
    val batch = Seq(
      (1L, "known doc text"),   // already in corpus -> dropped
      (2L, "fresh text one"),   // kept
      (3L, "fresh text one"),   // within-batch dup of 2 -> dropped
      (4L, "fresh text two")    // kept
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(corpusFps, batch, "text", "doc_id")
    assert(got.columns.contains("fp"), "surviving rows must carry fp for the table update")
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L, 4L))
    // second run with the updated fingerprint table: everything drops
    val updated = corpusFps.union(got.select(col("fp")))
    assert(Dedup.incrementalExact(updated, batch, "text", "doc_id").count() === 0)
  }

  test("Nested.flattenStruct: recursive paths, arrays stay opaque, " +
      "idempotent, collisions fail fast") {
    val df = Seq((1L, ("n1", ("c1", 7L)), Seq(1, 2, 3)))
      .toDF("id", "profile", "xs")
      .select(col("id"),
        struct(col("profile._1").as("name"),
          struct(col("profile._2._1").as("code"),
            col("profile._2._2").as("nation")).as("seg")).as("profile"),
        col("xs"))
    val flat = Nested.flattenStruct(df)
    assert(flat.columns.toSeq ===
      Seq("id", "profile_name", "profile_seg_code", "profile_seg_nation", "xs"))
    val row = flat.collect().head
    assert(row.getLong(0) === 1L && row.getString(1) === "n1" &&
      row.getString(2) === "c1" && row.getLong(3) === 7L &&
      row.getSeq[Int](4) === Seq(1, 2, 3))

    // Idempotent on a flat frame.
    assert(Nested.flattenStruct(flat).columns.toSeq === flat.columns.toSeq)

    // A top-level a_b next to struct a.b collides (case-insensitive).
    val clash = Seq((1L, 2L)).toDF("a_B", "v")
      .withColumn("a", struct(col("v").as("b")))
    intercept[IllegalArgumentException] { Nested.flattenStruct(clash) }

    // Dots in field names survive via the backtick-quoted head.
    val dotted = Seq((1L, 2L)).toDF("we.ird", "v")
    assert(Nested.flattenStruct(dotted).columns.toSeq === Seq("we.ird", "v"))
  }
}
