package graft.streaming

import graft.ext.Dedup.MinHashConfig
import graft.functions.{GraftFunctions, ShingleJaccard}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** Streaming NEAR-duplicate dedup — the state-store sibling of the batch
  * [[graft.ext.Dedup.minHashPairs]] family. The reference's poll-a-folder
  * ingest loop (box_ingest.py:44-50), made continuous by the file-source
  * stream, can with this drop near-dups AT INGEST instead of re-running
  * batch dedup over the accumulated corpus.
  *
  * Architecture: the SAME codegen'd MinHash signature + per-band xxhash64
  * bucketing as the batch plan runs as a stateless projection on the
  * stream; each (band, band_hash) bucket is then a `flatMapGroupsWithState`
  * group whose state holds the bucket's members seen so far. A new doc is
  * verified (exact shingle Jaccard — the same static
  * [[ShingleJaccard.jaccard]] the batch expression compiles to) against
  * the retained members, and the HIGHER doc id of every qualifying pair
  * is emitted as a drop candidate. Because the higher id drops no matter
  * which side arrived first, the emitted DISTINCT drop set is arrival-
  * order independent and equals the batch
  * `dropFromPairs(minHashPairs(...))` drop set whenever every qualifying
  * pair lands within the state horizon.
  *
  * Scale: state per bucket is its member (id, text) list, capped at
  * `conf.maxBucketSize` by FIRST ARRIVAL — the streaming twin of the
  * batch `keepHotBuckets` flood guard (a byte-identical-doc flood
  * otherwise grows every state entry and re-verifies B pairs per
  * arrival). Verify cost per arrival is O(members in the probed bucket),
  * never corpus-sized. On an unbounded stream use [[dropCandidatesBounded]],
  * which evicts idle buckets once the watermark passes their last
  * arrival + `delay` — state is then bounded by the arrival rate times
  * the horizon, the only form that survives 100 TB/day; the trade is
  * that a near-dup arriving beyond the horizon is no longer caught.
  */
object NearDupStream {

  /** One stream row fanned out to one of its `conf.bands` LSH buckets. */
  final case class BandedDoc(docId: Long, text: String, band: Int, bandHash: Long)

  /** Bucket members as parallel arrays (ids ascending); a case class of
    * primitive/String arrays keeps the state codec flat and versionable. */
  final case class BucketState(ids: Array[Long], texts: Array[String])

  /** Stateless banding projection shared by both variants: one codegen'd
    * MinHash pass per doc, then a literal-indexed band-hash array (the
    * exact expressions of the batch plan, so buckets — and therefore
    * candidate recall — match batch run-for-run). */
  private def banded(docs: DataFrame, text: String, id: String,
      conf: MinHashConfig, extra: Seq[(String, String)] = Nil): DataFrame = {
    val r = conf.rowsPerBand
    docs
      .where(length(col(text)) > 0)
      .select(Seq(col(id).cast(LongType).as("docId"), col(text).as("text"),
        GraftFunctions.minhashSig(lower(col(text)), conf.shingleSize, conf.numHashes)
          .as("sig")) ++ extra.map { case (c, a) => col(c).as(a) }: _*)
      .select(Seq(col("docId"), col("text"),
        posexplode(array((0 until conf.bands).map(b =>
          xxhash64(lit(b), slice(col("sig"), b * r + 1, r))): _*)))
        ++ extra.map { case (_, a) => col(a) }: _*)
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandHash")
  }

  /** Merge a micro-batch's arrivals into one bucket's state and emit the
    * higher id of every newly-verified qualifying pair. Pure function of
    * (retained members, fresh members) — shared by both variants. */
  private def probeBucket(existing: Vector[(Long, String)],
      arrivals: Iterator[BandedDoc],
      conf: MinHashConfig): (Vector[(Long, String)], Iterator[Long]) = {
    val seen = existing.map(_._1).toSet
    val fresh = arrivals.map(d => (d.docId, d.text)).toVector
      .distinctBy(_._1).filterNot(p => seen(p._1))
    if (fresh.isEmpty) return (existing, Iterator.empty)
    // Flood guard = batch keepHotBuckets: membership capped; docs beyond
    // the cap in a flooded bucket are neither verified nor retained.
    val all = (existing ++ fresh.sortBy(_._1)).take(conf.maxBucketSize)
    val freshIds = fresh.map(_._1).toSet
    val out = Vector.newBuilder[Long]
    var i = 0
    while (i < all.length) {
      var j = i + 1
      while (j < all.length) {
        val (idA, tA) = all(i)
        val (idB, tB) = all(j)
        // only pairs touching a fresh member are NEW this batch
        if (freshIds(idA) || freshIds(idB)) {
          val jac = ShingleJaccard.jaccard(
            UTF8String.fromString(tA), UTF8String.fromString(tB),
            conf.shingleSize)
          if (jac >= conf.threshold) out += math.max(idA, idB)
        }
        j += 1
      }
      i += 1
    }
    (all, out.result().iterator)
  }

  /** Unbounded-state variant: every bucket's members are retained for the
    * stream's lifetime (exact parity with batch dedup over the whole
    * history). Output is a MULTISET of drop candidates — a doc colliding
    * in several bands emits once per qualifying bucket; `.distinct()` of
    * the output is the drop set. */
  def dropCandidates(docs: DataFrame, text: String, id: String,
      conf: MinHashConfig = MinHashConfig()): Dataset[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    banded(docs, text, id, conf).as[BandedDoc]
      .groupByKey(d => (d.band, d.bandHash))
      .flatMapGroupsWithState[BucketState, Long](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[BucketState]) =>
          val existing = state.getOption
            .map(s => s.ids.zip(s.texts).toVector).getOrElse(Vector.empty)
          val (kept, out) = probeBucket(existing, rows, conf)
          state.update(BucketState(kept.map(_._1).toArray, kept.map(_._2).toArray))
          out
      }
  }

  /** Watermark-bounded variant: `tsCol` (timestamp) drives a watermark,
    * and a bucket whose last arrival is older than watermark + `delay`
    * is evicted via event-time timeout — state bounded by arrival rate ×
    * horizon. Near-dups arriving within `delay` of each other are still
    * caught; a duplicate beyond the horizon passes (at-least-once
    * emission of its keepers, same scoped-recall trade as
    * [[EventStream.dedupStreamBounded]]). */
  def dropCandidatesBounded(docs: DataFrame, text: String, id: String,
      tsCol: String, delay: String = "1 hour",
      conf: MinHashConfig = MinHashConfig()): Dataset[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val delayMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(UTF8String.fromString(delay))
    val horizonMs = delayMs.days * 86400000L + delayMs.microseconds / 1000L
    banded(docs.withWatermark(tsCol, delay), text, id, conf,
        extra = Seq(tsCol -> "__ts"))
      .as[BandedTsDoc]
      .groupByKey(d => (d.band, d.bandHash))
      .flatMapGroupsWithState[BucketState, Long](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = rows.toVector
            val existing = state.getOption
              .map(s => s.ids.zip(s.texts).toVector).getOrElse(Vector.empty)
            val (kept, out) = probeBucket(existing,
              arrivals.iterator.map(d => BandedDoc(d.docId, d.text, d.band, d.bandHash)),
              conf)
            state.update(BucketState(kept.map(_._1).toArray, kept.map(_._2).toArray))
            val lastMs = arrivals.map(_.__ts.getTime).max
            state.setTimeoutTimestamp(lastMs + horizonMs)
            out
          }
      }
  }

  /** [[BandedDoc]] plus the event-time column for the bounded variant. */
  final case class BandedTsDoc(docId: Long, text: String, band: Int,
      bandHash: Long, __ts: java.sql.Timestamp)
}
