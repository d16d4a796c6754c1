package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming operators over the events table (SURVEY §2
  * "Streams": the reference is batch-only; its poll-a-folder loop is
  * subsumed by a file-source stream with AvailableNow).
  *
  * events.parquet has shipped with two on-disk `ts` encodings across
  * testdata generations — TIMESTAMP(NANOS) (read as a nanos long via
  * nanosAsLong, floor-divided to micros) and TIMESTAMP(MICROS)
  * isAdjustedToUTC=false (inferred TIMESTAMP_NTZ, cast to TimestampType:
  * value-identity under the pinned UTC session timezone). A file source
  * requires an explicit schema, so [[source]] probes the batch reader's
  * inferred schema once (footer-only, driver-side) and dispatches — the
  * same normalization [[graft.Tables.events]] applies on the batch path.
  */
object EventStream {

  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as nanos since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of event parquet files. */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Probe the on-disk ts encoding (generation dispatch, see object doc).
    // An unreadable/empty dir defaults to TimestampType — what our own
    // parquet sink writes for fixture dirs populated after stream start.
    val tsType = scala.util.Try(
      spark.read.option("pathGlobFilter", "events.parquet")
        .parquet(dir).schema("ts").dataType
    ).getOrElse(TimestampType)
    val schema = StructType(rawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val raw = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    tsType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling 1-hour windowed aggregation with a watermark: the streaming
    * twin of queries.Relational.q13EventsHourly. Late events beyond 1 hour
    * are dropped; state is bounded by (watermark horizon × event types).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Stream-static enrichment join: a streaming fact joined against a
    * (broadcast-small) static dimension. The static side is re-resolved
    * per micro-batch — a dimension table updated between batches is
    * picked up without restarting the query — and the broadcast keeps
    * the stream side shuffle-free and STATELESS (unlike stream-stream
    * joins, nothing is buffered against the watermark). */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Streaming exact dedup — the streaming twin of
    * [[graft.ext.Dedup.exact]]: emit each key's first occurrence. The
    * projection keeps ONLY the key columns, so the emitted SET equals
    * batch DISTINCT no matter which file split a parallel source reads
    * first (emitting non-key columns would make "first seen" racy).
    * State is one state-store entry per distinct live key and never
    * expires on an unbounded stream — at real scale use
    * [[dedupStreamBounded]]. */
  def dedupStream(events: DataFrame, keys: Seq[String]): DataFrame =
    events.select(keys.map(col): _*).dropDuplicates(keys)

  /** Watermark-bounded streaming dedup: per-key state is dropped once
    * the watermark passes its event time plus `delay`, so state is
    * bounded by the key arrival rate × horizon instead of all-time
    * distinct keys — the form that survives an unbounded 100-TB/day
    * stream. The trade is scoped recall: a duplicate arriving more than
    * `delay` after the original re-emits (exactly-once dedup within the
    * horizon, at-least-once beyond it). */
  def dedupStreamBounded(events: DataFrame, keys: Seq[String],
      delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)
      .select(keys.map(col) :+ col("ts"): _*)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join: purchases matched to every signup by
    * the same user within the preceding `windowMinutes` — the streaming
    * attribution join. Both sides carry watermarks and the join
    * condition carries the time range, so Spark bounds each side's state
    * to the watermark horizon instead of buffering either stream forever.
    * Caveat on completeness: once the watermark advances across
    * micro-batches, rows arriving LATER than it are dropped before
    * joining, so matches can be lost in multi-batch/continuous execution.
    * Batch-equality holds when input arrives within the watermark delay —
    * in particular under AvailableNow on a finite input, where the whole
    * input lands in one micro-batch and the watermark is still at its
    * initial value while every row is joined (the st5 gate's condition). */
  def purchaseAttribution(events: DataFrame, windowMinutes: Int = 60): DataFrame = {
    val delay = s"$windowMinutes minutes"
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", delay)
    val sg = events.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("s_id"))
      .withWatermark("s_ts", delay)
    p.join(sg,
      col("user_id") === col("s_user") &&
      col("s_ts") <= col("p_ts") &&
      col("s_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("p_id"), col("p_ts"), col("s_id"), col("s_ts"))
  }

  final case class SessionOut(
      user_id: Long, session_id: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp)

  /** Public: Catalyst's generated state (de)serializer needs accessor
    * visibility. Bounds are MICROseconds since epoch — event time is
    * micro-precision and a millisecond state would truncate the emitted
    * session bounds away from the batch plan's min/max(ts). */
  final case class OpenSession(
      sessionId: Long, nEvents: Long, startUs: Long, endUs: Long)

  /** Streaming sessionization with custom state: one open session per
    * user in `flatMapGroupsWithState`, closed (and emitted, Append mode)
    * either by an in-batch gap over `gapMinutes` or by the event-time
    * timeout once the watermark passes session_end + gap. State per key
    * is O(1) — a 4-field open-session record, never an event buffer.
    * Session ids are 1-based per user in event-time order, matching the
    * batch `sessionize` exactly for closed sessions: a timeout-closed
    * session leaves behind a tiny sentinel record (nEvents=0) that
    * retains the per-user session counter, so the user's NEXT session
    * continues the numbering instead of restarting at 1. Total state is
    * therefore bounded by |users ever seen| × 32 bytes — event-volume-
    * independent, but a RETENTION choice on a long-running stream with
    * unbounded user cardinality. `sentinelTtlGaps` is the knob: when set,
    * a sentinel is dropped once the watermark passes session end by
    * ttl × gap — state becomes O(users active within the TTL horizon),
    * at the cost that a user dormant longer than the TTL restarts their
    * session numbering at 1. Default (None) keeps counters forever
    * (exact numbering, state grows with |users ever seen|; the sentinel
    * is parked ~100 years out, so re-fires are not a practical concern).
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
      sentinelTtlGaps: Option[Int] = None): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60000000L
    // ~100 years: a parked sentinel must carry SOME event-time timeout
    // (leaving the expired one in place would re-fire it every batch).
    val parkMs = 100L * 365 * 86400 * 1000
    // With a TTL, the sentinel's timeout IS the expiry: when it fires,
    // the state (and the user's session counter) is removed.
    val ttlMs: Long = sentinelTtlGaps.map(_ * gapMinutes * 60000L).getOrElse(0L)

    // Local (not object-level) helpers: the stateful closure must not
    // capture the EventStream module, which is not serializable.
    def tsToUs(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    def usToTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }
    def toOut(u: Long, s: OpenSession) = SessionOut(
      u, s.sessionId, s.nEvents, usToTs(s.startUs), usToTs(s.endUs))

    def fn(user: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
        state: GroupState[OpenSession]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val closed = state.get
        if (closed.nEvents == 0L && ttlMs > 0L) {
          state.remove() // sentinel TTL expired: drop the session counter
          Iterator.empty
        } else {
          state.update(closed.copy(nEvents = 0L)) // sentinel keeps sessionId
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() +
            (if (ttlMs > 0L) ttlMs else parkMs))
          if (closed.nEvents > 0L) Iterator.single(toOut(user, closed))
          else Iterator.empty // parked sentinel re-fired; nothing to emit
        }
      } else {
        val evs = it.map { case (u, ts, eid) => (u, tsToUs(ts), eid) }
          .toArray.sortInPlaceBy(e => (e._2, e._3))
        val prior = state.getOption
        var open = prior.filter(_.nEvents > 0L) // sentinel = no open session
        val out = Seq.newBuilder[SessionOut]
        evs.foreach { case (_, t, _) =>
          open = open match {
            case Some(s) if t - s.endUs > gapUs =>
              out += toOut(user, s)
              Some(OpenSession(s.sessionId + 1, 1L, t, t))
            case Some(s) =>
              Some(s.copy(nEvents = s.nEvents + 1, endUs = math.max(s.endUs, t)))
            case None =>
              Some(OpenSession(prior.map(_.sessionId).getOrElse(0L) + 1, 1L, t, t))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(
            math.max(s.endUs / 1000 + gapUs / 1000, state.getCurrentWatermarkMs() + 1))
        }
        out.result().iterator
      }
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .select(col("user_id").as[Long], col("ts").as[java.sql.Timestamp],
        col("event_id").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Batch sessionization (30-min inactivity gap): assigns a session id
    * per user and aggregates per session. One shuffle on user_id; the
    * running sum over the boundary flags is the classic gaps-and-islands
    * plan and needs no self-join. The streaming analogue keeps the open
    * session in flatMapGroupsWithState; batch output is identical for
    * closed sessions.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  /** Streaming hourly distinct-user estimates: watermark-windowed
    * approx_count_distinct (HLL++) — the streaming twin of the k1
    * sketch gate. The sketch state per open window is constant-size
    * (registers, not keys), so cardinality tracking survives unbounded
    * key churn where an exact streaming distinct would grow state per
    * key. Spark's HLL++ has no sparse mode, so small-range accuracy
    * comes from register count: at `rsd` = 0.01 (2^14 registers) the
    * linear-counting estimate rounds to the exact value while n² ≪ 2m —
    * comfortably through thousands of distinct keys per window. */
  def hourlyDistinctUsers(events: DataFrame, rsd: Double = 0.01): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("nd_est"))
      .select(col("window.start").as("hour"), col("nd_est"))

  /** Streaming per-window quantiles via the KLL-style mergeable sketch
    * behind `approx_percentile` — the streaming twin of the k2 batch
    * gate. Like [[hourlyDistinctUsers]], the per-window state is one
    * constant-size sketch (never the value list), so the window's
    * distribution is trackable at any event rate; `accuracy` = 1/eps
    * controls the rank-error bound (10000 → 0.01% of ranks). */
  def hourlyQuantiles(events: DataFrame, valCol: String = "value",
      accuracy: Int = 10000): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr(
        s"approx_percentile($valCol, array(0.5, 0.9), $accuracy)").as("qs"))
      .select(col("window.start").as("hour"),
        col("qs").getItem(0).as("p50_est"),
        col("qs").getItem(1).as("p90_est"))

  final case class KeyCount(key: String, n: Long)

  /** Exact per-window top-k state for a BOUNDED key domain: the buffer
    * is one (key → count) map per open window, bounded by the DOMAIN
    * size (event-type-like columns), never the event rate; an unbounded
    * key domain needs the k4 space-saving sketch trade instead. */
  final class TopCountAggregator(k: Int) extends
      org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Seq[KeyCount]] {
    require(k >= 1, s"k=$k")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(m: Map[String, Long], key: String): Map[String, Long] =
      m.updated(key, m.getOrElse(key, 0L) + 1L)
    override def merge(a: Map[String, Long],
        b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (k2, v)) =>
        m.updated(k2, m.getOrElse(k2, 0L) + v) }
    override def finish(m: Map[String, Long]): Seq[KeyCount] =
      m.toSeq.map { case (k2, v) => KeyCount(k2, v) }
        .sortBy(kc => (-kc.n, kc.key)).take(k)
    override def bufferEncoder = org.apache.spark.sql.Encoders
      .kryo[Map[String, Long]]
    override def outputEncoder = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[KeyCount]]()
  }

  /** Streaming per-window top-k heavy keys — the third member of the
    * windowed-sketch trio next to [[hourlyDistinctUsers]] and
    * [[hourlyQuantiles]]: exact counts with a pinned
    * (count desc, key asc) order, one mergeable map per open window as
    * state (see [[TopCountAggregator]] for the domain-bound contract). */
  def hourlyTopK(events: DataFrame, keyCol: String = "event_type",
      k: Int = 3): DataFrame = {
    val agg = udaf(new TopCountAggregator(k),
      org.apache.spark.sql.Encoders.STRING)
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(agg(col(keyCol)).as("top"))
      .select(col("window.start").as("hour"), posexplode(col("top")))
      .select(col("hour"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.key").as("key"), col("col.n").as("n"))
  }

  /** Streaming materialized upsert view: maintain a latest-record-per-key
    * TABLE from a change stream — the streaming twin of
    * [[graft.ext.Dedup.latestByKey]] composed with
    * [[graft.ext.Cdc.mergeUpsert]] in a `foreachBatch` loop. After every
    * micro-batch the target table equals batch `latestByKey` over
    * everything ingested so far, so downstream batch readers always see
    * a consistent keyed snapshot (the CDC "table view of a stream").
    *
    * Per batch: (1) the micro-batch is compacted to one candidate per
    * key (max_by partial agg — one row per key per partition crosses the
    * shuffle); (2) candidates not strictly newer than the base row (by
    * `order` struct comparison) are dropped, so replayed or reordered
    * batches can never regress a key (idempotent under at-least-once
    * delivery); (3) the survivors MERGE via one full-outer join —
    * broadcast when the batch is small, the normal CDC case; (4) the
    * result is staged into a sibling table and swapped in with
    * DROP + RENAME (cf. TableSink.compact) because a table cannot be
    * overwritten while it is being read. At 100 TB the same loop holds
    * with a partition-pruned rewrite (see Cdc scaladoc); the swap stays
    * metadata-only.
    *
    * Caller sets `.option("checkpointLocation", ...)` and a trigger on
    * the returned writer.
    */
  def upsertLatestStream(
      changes: DataFrame, targetTable: String,
      keys: Seq[String], order: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        val compact = graft.ext.Dedup.latestByKey(batch.toDF(), keys, order)
        if (!sp.catalog.tableExists(targetTable)) {
          compact.write.mode("overwrite").format("parquet")
            .saveAsTable(targetTable)
        } else {
          val base = sp.table(targetTable)
          val bo = base.select(
            keys.map(col) :+ struct(order.map(col): _*).as("__bo"): _*)
          val fresh = compact.join(bo, keys, "left")
            .where(col("__bo").isNull ||
              struct(order.map(col): _*) > col("__bo"))
            .drop("__bo")
          val merged = graft.ext.Cdc.mergeUpsert(base, fresh, keys)
            .select(base.columns.map(col): _*)
          val tmp = targetTable + "__upsert_tmp"
          sp.sql(s"DROP TABLE IF EXISTS $tmp")
          merged.write.mode("overwrite").format("parquet").saveAsTable(tmp)
          sp.sql(s"DROP TABLE $targetTable")
          sp.sql(s"ALTER TABLE $tmp RENAME TO $targetTable")
          sp.catalog.refreshTable(targetTable)
        }
    }
}
