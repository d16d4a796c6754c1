package graft.sink

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.slf4j.LoggerFactory

/** Audit-log sink (reference: box_ingest.py:13-20, box_export.py:10-17).
  *
  * The reference INSERTs one row per pipeline action into
  * `box_ingestion_log(task_owner, job_action, log_info, process_dt)` via an
  * f-string SQL INSERT — injectable by any file name containing a quote
  * (box_ingest.py:15-17). Here it is a parameterized 1-row DataFrame
  * append: same table, same columns, no SQL text.
  */
object AuditLog {

  val TableName = "box_ingestion_log"

  private val log = LoggerFactory.getLogger(getClass)

  val Schema: StructType = StructType(Seq(
    StructField("task_owner", StringType),
    StructField("job_action", StringType),
    StructField("log_info", StringType)))

  def logTask(
      spark: SparkSession,
      ref: TableRef,
      owner: String,
      action: String,
      info: String): Unit = {
    // Mirrors the reference's logging.info + print side channel
    // (box_ingest.py:19-20) on slf4j.
    log.info(s"$action: $info")
    val logRef = ref.copy(name = TableName)
    val row = spark.createDataFrame(
      java.util.List.of(Row(owner, action, info)), Schema)
    TableSink.append(row, logRef)
  }
}
