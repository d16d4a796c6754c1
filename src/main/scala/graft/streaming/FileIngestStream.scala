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
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val split = ValidateAndSplit(batch, meta)
        TableSink.append(split.valid, table)
        TableSink.append(split.invalid, table.errorSibling)
      }
      .trigger(trigger)
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
