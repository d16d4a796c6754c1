package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: lay every document end-to-end in a
  * deterministic global order and cut the concatenated token stream every
  * `seqLen` tokens (the standard concat-and-chunk layout). The output
  * maps each document to its global token offset and the range of
  * training sequences it lands in — the bookkeeping a downstream
  * tokenizer shard needs to emit its sequences independently.
  *
  * The core is a GLOBAL prefix sum over token counts. The naive form —
  * `sum().over(Window.orderBy(id))` with no partition key — collapses
  * the whole corpus into ONE window task, the textbook scale-killer, so
  * this implements the classic two-phase distributed prefix sum instead:
  *
  *  1. range-repartition + sort by `id` (Spark's orderBy machinery — a
  *     real distributed sort);
  *  2. per-partition token totals to the driver (one row PER PARTITION —
  *     metadata-sized, like a range sampler, not a data collect);
  *  3. each partition's base offset (the exclusive prefix over partition
  *     totals) rejoins via a literal map keyed by partition id, and a
  *     per-partition window finishes the sum locally.
  *
  * Offsets depend only on the global (id, tokens) order, which is total
  * for unique ids — the partition layout cannot change the answer, and
  * the whole computation is replayable as a single-node window sum (the
  * pk1 gate oracle).
  */
object Packing {

  /** Per-document packing positions.
    * Output: (id, n_tokens, start_offset, seq_first, seq_last) — a doc
    * spans sequences seq_first..seq_last (inclusive); docs straddle cuts
    * by design in concat-and-chunk. Zero-token documents are dropped
    * (they occupy no stream positions). */
  def packConcat(df: DataFrame, id: String, tokenCount: Column,
      seqLen: Int, numPartitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen")
    withOffsets(df, id, tokenCount, numPartitions) { counted =>
      counted.select(col(id), col("n_tokens"),
        (col("end_offset") - col("n_tokens")).as("start_offset"),
        floor((col("end_offset") - col("n_tokens")) / seqLen).as("seq_first"),
        floor((col("end_offset") - 1) / seqLen).as("seq_last"))
    }
  }

  /** Token-balanced SHARD assignment — the training-export layout pass:
    * documents in deterministic `id` order are cut into contiguous
    * shards of ~`shardTokens` tokens each (shard = the document's start
    * offset DIV the budget, so every shard holds the docs whose packed
    * stream positions fall in one budget window; a doc straddling a
    * boundary goes to the shard its FIRST token lands in, keeping
    * shards within one document of the budget). Downstream writers
    * emit one file per shard (`.repartition(col("shard_id"))` then
    * partitionBy), giving the near-equal-size shuffle-shard files a
    * trainer's data loader expects, with membership a pure function of
    * (id, tokens) — reshardable and resumable at any scale. Integer
    * DIV, not float floor: offsets near 2^53 would round wrong in a
    * double. Same two-phase distributed prefix sum as [[packConcat]];
    * replayable by a single window sum (the pk2 gate oracle). */
  def shardByTokens(df: DataFrame, id: String, tokenCount: Column,
      shardTokens: Long, numPartitions: Int = 0,
      carry: Seq[String] = Nil): DataFrame = {
    require(shardTokens > 0, s"shardTokens=$shardTokens")
    withOffsets(df, id, tokenCount, numPartitions, carry) { counted =>
      counted.select(col(id) +: carry.map(col) :+ col("n_tokens") :+
          (col("end_offset") - col("n_tokens")).as("start_offset"): _*)
        .withColumn("shard_id",
          expr(s"start_offset DIV ${shardTokens}L"))
    }
  }

  /** Per-shard manifest for a [[shardByTokens]] result: exact doc and
    * token counts per shard — the sidecar a loader checks before
    * streaming a shard. A |shards|-row aggregate, never the corpus. */
  def shardManifest(sharded: DataFrame): DataFrame =
    sharded.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** Two-phase distributed prefix sum shared by [[packConcat]] /
    * [[shardByTokens]]: hands `body` a frame (id, n_tokens, end_offset)
    * with end_offset = inclusive global running total in `id` order. */
  private def withOffsets(df: DataFrame, id: String, tokenCount: Column,
      numPartitions: Int, carry: Seq[String] = Nil)
      (body: DataFrame => DataFrame): DataFrame = {
    val spark = df.sparkSession
    val nPart =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // Materialized ONCE, eagerly: both the phase-2 totals collect and
    // the caller's eventual execution of the returned (lazy) frame read
    // these partitions. The previous persist + finally-unpersist
    // scaffold defeated itself here — unpersist ran when this function
    // RETURNED, before the caller ever executed the result, so the
    // whole input subtree re-evaluated on the final pass (measured 2x
    // on p7, whose input is the full KN scoring chain). localCheckpoint
    // cuts lineage, so however expensive the input, it runs exactly
    // once; the checkpointed rows are narrow (id, carry, n_tokens).
    val counted = df
      .select(col(id) +: carry.map(col) :+
        tokenCount.cast("long").as("n_tokens"): _*)
      .where(col("n_tokens") > 0)
      .repartitionByRange(nPart, col(id))
      .sortWithinPartitions(col(id))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // Phase 2: one row per partition — metadata, not data.
    val totals = counted.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bases = (0 until nPart).scanLeft(0L) {
      case (acc, p) => acc + totals.getOrElse(p, 0L)
    }
    // Phase 3: base(pid) as a literal lookup + local window.
    val baseExpr = element_at(
      map((0 until nPart).flatMap(p =>
        Seq(lit(p), lit(bases(p)))): _*), col("__pid"))
    val w = Window.partitionBy(col("__pid")).orderBy(col(id))
    body(counted
      .withColumn("end_offset", baseExpr + sum(col("n_tokens")).over(w)))
  }

  /** Total number of full-or-partial sequences the packed stream cuts
    * into (ceil of total tokens / seqLen). */
  def sequenceCount(packed: DataFrame, seqLen: Int): Long = {
    val total = packed.agg(sum(col("n_tokens"))).head.getLong(0)
    (total + seqLen - 1) / seqLen
  }
}
