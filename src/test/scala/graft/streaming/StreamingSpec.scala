package graft.streaming

import graft.TestSpark
import graft.queries.Relational
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming hourlyCounts over AvailableNow equals the batch q13 plan") {
    val src = EventStream.source(spark, TestSpark.sf0001)
    assert(src.isStreaming)
    val q = EventStream.hourlyCounts(src)
      .writeStream
      .format("memory")
      .queryName("hourly_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_out")
      .orderBy("hour", "event_type")
      .collect().map(_.toSeq)
    val batch = Relational.q13EventsHourly(spark, TestSpark.sf0001)
      .collect().map(_.toSeq)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("sessionizeStream: closed sessions match batch sessionize") {
    val src = EventStream.source(spark, TestSpark.sf0001)
    val q = EventStream.sessionizeStream(src)
      .writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sessions_out")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events"))).toSet
    val batchRows = EventStream.sessionize(
      graft.Tables.events(spark, TestSpark.sf0001))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events")))
    val batch = batchRows.toSet
    // per-user final sessions may remain open (watermark never passes
    // their end + gap on a finite input) — everything else must match
    val lastPerUser = batchRows.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._2) }.toSet
    assert(streamed.subsetOf(batch))
    assert((batch -- lastPerUser).subsetOf(streamed))
    assert(streamed.nonEmpty)
  }

  test("GraftExtensions: spark.sql.extensions injection path registers SQL functions") {
    import org.apache.spark.sql.SparkSession
    val old = spark // force init of the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT graft_fingerprint('abc') AS fp,
          |       graft_cosine(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS cos,
          |       graft_simhash('hello world') AS sh,
          |       size(graft_minhash('hello world document')) AS mh_len""".stripMargin)
        .collect()(0)
      assert(r.getLong(0) != 0L)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
      assert(r.getLong(2) != 0L)
      assert(r.getInt(3) === 64)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("FileIngestStream: streaming validate/split appends valid AND error tables") {
    import graft.schema.TableMeta
    import graft.sink.TableRef
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("fis_")
    val src = tmp.resolve("in"); Files.createDirectories(src)
    Files.write(src.resolve("batch1.csv"),
      "id,name,score\n1,alice,3.5\n2,bob,not-a-number\n,carol,1.0\n".getBytes)
    val meta = TableMeta.fromMetadata(
      Seq("id" -> "int", "name" -> "string", "score" -> "float"),
      nonNullableFields = Seq("id"))
    val ref = TableRef("graft", "test", "fis_t")
    Seq(ref.qualified, ref.errorSibling.qualified).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    val q = graft.streaming.FileIngestStream.start(
      spark, src.toString, meta, ref,
      checkpoint = Some(tmp.resolve("ckpt").toString))
    q.awaitTermination(120000); q.stop()
    val valid = spark.table(ref.qualified).orderBy("id").collect()
    assert(valid.map(_.getAs[Long]("id")).toSeq === Seq(1L))
    val errs = spark.table(ref.errorSibling.qualified)
      .orderBy("error_type").collect().map(_.getAs[String]("error_type"))
    assert(errs.length === 2)
    assert(errs.exists(_.contains("Null value in non-nullable column: id")))
    assert(errs.exists(_.contains("Type mismatch for column: score")))
  }

  test("FileIngestStream: batchId high-water-mark makes replayed batches no-ops") {
    import graft.schema.TableMeta
    import graft.sink.TableRef
    import java.nio.file.Files
    // marker roundtrip
    val ckDir = Files.createTempDirectory("fis_ck_")
    assert(FileIngestStream.committedBatch(Some(ckDir.toString)) === -1L)
    FileIngestStream.commitBatch(Some(ckDir.toString), 3L)
    assert(FileIngestStream.committedBatch(Some(ckDir.toString)) === 3L)
    assert(FileIngestStream.committedBatch(None) === -1L)

    val tmp = Files.createTempDirectory("fis_replay_")
    val src = tmp.resolve("in"); Files.createDirectories(src)
    val ck = tmp.resolve("ckpt").toString
    Files.write(src.resolve("b0.csv"), "id,name,score\n1,a,1.0\n".getBytes)
    val meta = TableMeta.fromMetadata(
      Seq("id" -> "int", "name" -> "string", "score" -> "float"),
      nonNullableFields = Seq("id"))
    val ref = TableRef("graft", "test", "fis_replay")
    Seq(ref.qualified, ref.errorSibling.qualified).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    def run(): Unit = {
      val q = FileIngestStream.start(
        spark, src.toString, meta, ref, checkpoint = Some(ck))
      q.awaitTermination(120000); q.stop()
    }
    run()
    assert(spark.table(ref.qualified).count() === 1)
    assert(FileIngestStream.committedBatch(Some(ck)) === 0L)

    // Emulate "appends landed but the stream died before the checkpoint
    // commit": the restart will re-run the next file as batch 1, and the
    // marker already says 1 committed — the replay must append NOTHING.
    Files.write(src.resolve("b1.csv"), "id,name,score\n2,b,2.0\n".getBytes)
    FileIngestStream.commitBatch(Some(ck), 1L)
    run()
    assert(spark.table(ref.qualified).count() === 1, "replayed batch must be a no-op")

    // ...and a genuinely new batch after the replayed one still processes.
    Files.write(src.resolve("b2.csv"), "id,name,score\n3,c,3.0\n".getBytes)
    run()
    assert(spark.table(ref.qualified).orderBy("id").collect()
      .map(_.getAs[Long]("id")).toSeq === Seq(1L, 3L))
  }

  test("dedupStream: emitted key set equals batch DISTINCT") {
    val src = EventStream.source(spark, TestSpark.sf0001)
    val q = EventStream.dedupStream(src, Seq("user_id", "event_type"))
      .writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000); q.stop()
    val streamed = spark.table("dedup_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))).toSet
    val batch = graft.Tables.events(spark, TestSpark.sf0001)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))).toSet
    assert(streamed === batch)
    assert(streamed.size === spark.table("dedup_out").count(),
      "each key must emit exactly once")
  }

  test("st34 padded-batch maintenance: the streamed (doc_id, n_tokens) " +
      "ledger fold yields the exact pk9 batch layout over the union") {
    val streamed = graft.queries.StreamingQueries
      .packedBatchesStream(spark, TestSpark.sf0001)
      .collect().map(_.toSeq)
    val batch = graft.queries.PipelineQueries
      .packedBatches(spark, TestSpark.sf0001)
      .collect().map(_.toSeq)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("dedupStreamBounded: dups inside the horizon suppress, beyond it re-emit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventStream.dedupStreamBounded(
        ms.toDF().toDF("k", "ts"), Seq("k"), delay = "10 minutes")
      .writeStream
      .format("memory")
      .queryName("dedup_wm_out")
      .outputMode("append")
      .start()
    def emittedFor(k: Long): Long =
      spark.table("dedup_wm_out").where(s"k = $k").count()
    try {
      ms.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(0)))
      q.processAllAvailable()
      assert(emittedFor(1L) === 1L, "in-batch duplicate suppressed")
      ms.addData((2L, ts(2))) // watermark still before ts(0)+10m: state alive
      q.processAllAvailable()
      assert(emittedFor(2L) === 1L, "cross-batch dup inside horizon suppressed")
      ms.addData((99L, ts(60))) // advances the watermark far past k=1's state
      q.processAllAvailable()
      ms.addData((1L, ts(55))) // k=1 state expired: re-emits (the scoped trade)
      q.processAllAvailable()
      assert(emittedFor(1L) === 2L, "duplicate beyond the horizon re-emits")
    } finally q.stop()
  }

  test("NearDupStream.dropCandidatesBounded: near-dups inside the horizon " +
      "drop, an evicted bucket lets a beyond-horizon dup pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val tA = "the quick brown fox jumps over the lazy dog while the cat " +
      "sleeps in the warm sun near the old barn door"
    val tA2 = tA + " zz" // near-dup of tA (planted-corpus pattern)
    val tC = "completely different content about databases and distributed " +
      "systems scaling horizontally across many machines"
    val tC2 = "yet another unrelated snippet mentioning compilers type " +
      "systems and garbage collection pauses in managed runtimes"
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = graft.streaming.NearDupStream.dropCandidatesBounded(
        ms.toDF().toDF("doc_id", "text", "ts"),
        "text", "doc_id", "ts", delay = "10 minutes")
      .toDF("doc_id")
      .writeStream.format("memory").queryName("neardup_wm_out")
      .outputMode("append").start()
    def drops: Set[Long] = spark.table("neardup_wm_out")
      .collect().map(_.getLong(0)).toSet
    try {
      ms.addData((1L, tA, ts(0)))
      q.processAllAvailable()
      assert(drops === Set.empty, "first copy keeps")
      ms.addData((2L, tA2, ts(1))) // inside the horizon: caught
      q.processAllAvailable()
      assert(drops === Set(2L), "cross-batch near-dup inside horizon drops")
      ms.addData((99L, tC, ts(60))) // advances the watermark to 50min
      q.processAllAvailable()
      ms.addData((98L, tC2, ts(61))) // bucket of tA has no data: timeout fires
      q.processAllAvailable()
      ms.addData((3L, tA, ts(62))) // state evicted: beyond-horizon dup passes
      q.processAllAvailable()
      assert(drops === Set(2L), "beyond-horizon duplicate is not caught")
      ms.addData((4L, tA2, ts(63))) // doc 3 re-seeded the bucket: caught again
      q.processAllAvailable()
      assert(drops === Set(2L, 4L), "new window catches dups against doc 3")
    } finally q.stop()
  }

  test("sessionize: gaps over 30min split sessions per user") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val events = Seq(
      (1L, ts(0), 7L, "view", 1.0, "{}"),
      (2L, ts(10), 7L, "click", 1.0, "{}"),   // same session (gap 10m)
      (3L, ts(50), 7L, "view", 1.0, "{}"),    // new session (gap 40m)
      (4L, ts(5), 8L, "view", 1.0, "{}"))     // other user
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventStream.sessionize(events)
      .orderBy("user_id", "session_id")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events")))
    assert(got.toSeq === Seq((7L, 1L, 2L), (7L, 2L, 1L), (8L, 1L, 1L)))
  }

  test("upsertLatestStream: out-of-order micro-batches never regress a key") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val tmp = java.nio.file.Files.createTempDirectory("graft_upsert_spec_")
    val src = tmp.resolve("src")
    // Two source files processed one per micro-batch: file "a" carries
    // the NEWER rows, file "b" (second batch) the older ones — the
    // newer-wins guard must ignore every row of batch 2 for key 1 and
    // still insert the unseen key 3.
    java.nio.file.Files.createDirectories(src)
    def writeFlat(df: org.apache.spark.sql.DataFrame, name: String,
        mtimeMs: Long): Unit = {
      val stage = tmp.resolve(name + "_stage")
      df.coalesce(1).write.parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = src.resolve(name)
      java.nio.file.Files.move(part, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    writeFlat(Seq((1L, ts(60), "new", 10.0))
      .toDF("k", "ts", "tag", "v"), "a.parquet", 1700000000000L)
    writeFlat(Seq((1L, ts(10), "old", -1.0), (3L, ts(5), "late-insert", 7.0))
      .toDF("k", "ts", "tag", "v"), "b.parquet", 1700000060000L)
    val tbl = "upsert_spec_tbl"
    Seq(tbl, tbl + "__upsert_tmp").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq((2L, ts(0), "seed", 0.0)).toDF("k", "ts", "tag", "v")
      .write.format("parquet").saveAsTable(tbl)
    val stream = spark.readStream
      .schema("k LONG, ts TIMESTAMP, tag STRING, v DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
    val q = EventStream.upsertLatestStream(stream, tbl,
        keys = Seq("k"), order = Seq("ts"))
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.stop()
    val got = spark.table(tbl).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("tag"),
        r.getAs[Double]("v")))
    assert(got.toSeq === Seq(
      (1L, "new", 10.0),        // older batch-2 row must NOT regress it
      (2L, "seed", 0.0),        // untouched key survives the swaps
      (3L, "late-insert", 7.0)) // unseen key inserts even from an old row
    )
  }

  test("Curation.curateStream: streamed survivors equal the batch run " +
      "on the same corpus; re-deliveries admit once") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog with many " +
      "plain words here to clear the minimum word count gate easily"
    val docs = Seq(
      (1L, good),
      (1L, good),                       // re-delivered row: admit once
      (2L, good + " second variant"),   // distinct content survives
      (3L, "too short"),                // quality drop
      (4L, "the secret eval passage sits verbatim inside this document " +
        "padded with sufficient additional words to pass every quality " +
        "rule easily one two three four five six")  // decontam drop
    ).toDF("doc_id", "text")
    val bench = Seq("the secret eval passage sits verbatim inside this")
      .toDF("text")
    val tmp = java.nio.file.Files.createTempDirectory("curate_stream_")
    docs.repartition(2).write.mode("overwrite").parquet(tmp.toString)

    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1).parquet(tmp.toString)
    val q = graft.ext.Curation.curateStream(src, "text", "doc_id",
        bench, "text", minWords = 10L, minStopHits = 1L)
      .writeStream.format("memory").queryName("curate_stream_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000); q.stop()
    val streamed = spark.table("curate_stream_out").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(streamed === Seq(1L, 2L), s"streamed survivors: $streamed")

    // Same transform, batch frame: identical survivors.
    val batch = graft.ext.Curation.curateStream(docs, "text", "doc_id",
        bench, "text", minWords = 10L, minStopHits = 1L)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(batch === streamed)
  }
}
