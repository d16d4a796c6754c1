package graft.streaming

import graft.schema.TableMeta
import graft.sink.{TableRef, TableSink}
import graft.validate.ValidateAndSplit
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Native streaming ingest: the reference's poll-a-folder loop
  * (box_ingest.py:44-50 — list, match, take latest, repeat) re-expressed
  * as a Structured Streaming file source. The file source tracks
  * processed files in the checkpoint, so "only new files" is exact
  * (the reference's latest-by-created_at heuristic can skip or repeat
  * files around restarts); `Trigger.AvailableNow` reproduces one-shot
  * batch ingest, a processing-time trigger gives continuous polling.
  *
  * ValidateAndSplit is a narrow, stateless projection, so the SAME
  * operator instance runs unchanged on the stream — valid and invalid
  * rows append to the main/_error tables per micro-batch via
  * foreachBatch (two sinks from one pass).
  *
  * File-name filtering uses the source's `pathGlobFilter` (glob, pushed
  * to file listing); the reference's anchored REGEX semantics need the
  * driver-side listing path (api.Ingest + FileSelect) — documented
  * difference, same role.
  */
object FileIngestStream {

  /** All-string raw schema over the declared metadata columns — the
    * shape a header CSV of the declared table renders to (file streams
    * require an explicit schema; inference is a batch-only luxury). */
  def rawSchema(meta: TableMeta): StructType =
    StructType(meta.fields.map(f => StructField(f.name, StringType)))

  def start(
      spark: SparkSession,
      folder: String,
      meta: TableMeta,
      table: TableRef,
      pathGlob: String = "*.csv",
      trigger: Trigger = Trigger.AvailableNow(),
      checkpoint: Option[String] = None): StreamingQuery = {
    val raw = spark.readStream
      .schema(rawSchema(meta))
      .option("header", true)
      .option("pathGlobFilter", pathGlob)
      .csv(folder)
    val writer = raw.writeStream
      .queryName(s"graft_ingest_${table.name}")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // Replay guard: after a restart, Structured Streaming re-runs the
        // last micro-batch whose checkpoint commit didn't land. Both
        // appends below are non-transactional parquet appends, so a
        // replayed batch would double its rows. A high-water-mark written
        // AFTER both appends (atomic rename via the Hadoop FS API, so it
        // works wherever the checkpoint lives) makes the common
        // fully-committed-then-replayed case exactly-once.
        if (committedBatch(checkpoint) < batchId) {
          // One pass: both sinks consume the same materialized batch
          // instead of re-running the source scan + validation per sink.
          val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val split = ValidateAndSplit(pinned, meta)
            TableSink.append(split.valid, table)
            TableSink.append(split.invalid, table.errorSibling)
            commitBatch(checkpoint, batchId)
          } finally pinned.unpersist()
          // foreachBatch executes against a CLONED SparkSession, so the
          // write-side relation-cache invalidation lands in the clone;
          // the caller's session would keep serving the pre-append file
          // listing. Refresh there explicitly.
          Seq(table, table.errorSibling).foreach(t =>
            spark.catalog.refreshTable(t.qualified))
        }
        // Remaining window (documented, not closable on plain parquet):
        // a crash BETWEEN the two appends replays the batch and
        // duplicates the valid rows. Closing it needs an atomically
        // committable table format or a staging-then-move sink.
      }
      .trigger(trigger)
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  // ---- batchId high-water-mark, stored next to the checkpoint ----------
  // Only maintained when an explicit checkpoint is configured: without
  // one the temp checkpoint can't survive a restart, so there is nothing
  // to replay against.

  private val MarkerName = "graft_committed_batch"

  private[streaming] def committedBatch(checkpoint: Option[String]): Long =
    checkpoint.flatMap { dir =>
      val store = new graft.io.HadoopStore
      if (store.list(dir).exists(_.name == MarkerName)) {
        val in = store.open(dir, MarkerName)
        try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
        finally in.close()
      } else None
    }.getOrElse(-1L)

  private[streaming] def commitBatch(checkpoint: Option[String], batchId: Long): Unit =
    checkpoint.foreach { dir =>
      new graft.io.HadoopStore()
        .putOverwrite(dir, MarkerName, _.write(batchId.toString.getBytes("UTF-8")))
    }
}
