package graft.api

import graft.io.{LocalStore, ObjectStore, Xlsx}
import graft.sink.{AuditLog, TableRef}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import scala.collection.mutable.ListBuffer
import scala.util.control.NonFatal

/** Typed mirror of the reference's `execute_export` kwargs
  * (box_export.py:71-82). `logTable` carries the catalog/schema the audit
  * rows land in (the reference hardcodes development.eda_gc_raw at
  * box_export.py:73-74).
  */
final case class ExportConfig(
    taskOwner: String,
    query: String,
    folder: String,
    fileName: String,
    sheetName: String = "Sheet1",
    columnMapping: Map[String, String] = Map.empty,
    logTable: TableRef = TableRef("development", "eda_gc_raw", "export"))

final case class ExportReport(rows: Long, errors: Seq[String]) {
  def ok: Boolean = errors.isEmpty
}

/** Export orchestration (reference O25-O28, O30 / E2): run arbitrary SQL,
  * rename columns, stream to xlsx, upload (create-or-overwrite by name).
  *
  * Two scale fixes over the reference: columns are renamed BEFORE
  * collection (a projection, box_export.py:38-41 renames in pandas), and
  * rows stream through `toLocalIterator` instead of a full `toPandas()`
  * materialization (box_export.py:37) — the driver holds one partition,
  * not the result set.
  */
object Export {

  def execute(conf: ExportConfig, store: ObjectStore = new LocalStore)(
      implicit spark: SparkSession): ExportReport = {
    val errors = ListBuffer.empty[String]
    def log(action: String, info: String): Unit =
      try AuditLog.logTask(spark, conf.logTable, conf.taskOwner, action, info)
      catch { case NonFatal(e) => errors += s"audit log failed: ${e.getMessage}" }

    var rows = 0L
    try {
      val df = spark.sql(conf.query) // O25: the full Spark SQL surface
      // O26: case-insensitive rename, as a projection not a collect.
      val mapping = conf.columnMapping.map { case (k, v) => k.toLowerCase -> v }
      val renamed = df.select(df.columns.map { c =>
        col(s"`${c.replace("`", "``")}`")
          .as(mapping.getOrElse(c.toLowerCase, c))
      }: _*)
      val header = renamed.columns.toSeq
      store.putOverwrite(conf.folder, conf.fileName, out => {
        val it = renamed.toLocalIterator()
        val rowsIt = new Iterator[Seq[Any]] {
          def hasNext = it.hasNext
          def next() = { rows += 1; it.next().toSeq }
        }
        Xlsx.write(out, conf.sheetName, header, rowsIt) // O27
      }) // O28: upsert-by-name
      log("Exported file", s"${conf.fileName}: $rows rows")
    } catch { case NonFatal(e) =>
      errors += s"export failed: ${e.getMessage}"
      log("Export failed", e.getMessage)
    }
    ExportReport(rows, errors.toSeq)
  }
}
