package graft.queries

import graft.Tables
import graft.api.{Export, ExportConfig, Ingest, IngestConfig}
import graft.io.Xlsx
import graft.schema.TableMeta
import graft.sink.TableRef
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** End-to-end exercises of the ingest (O1-O24, O29) and export (O25-O30)
  * pipelines through the DuckDB correctness gate: orders is rendered to a
  * real CSV file, ingested through the full validate path into a managed
  * table, and read back; a SQL aggregate is exported to a real xlsx and
  * parsed back with the engine's own reader.
  */
object IngestExportQueries {

  private val ordersMeta = TableMeta.fromMetadata(
    Seq(
      "o_orderkey"      -> "int",
      "o_custkey"       -> "int",
      "o_orderstatus"   -> "string",
      "o_totalprice"    -> "float",
      "o_orderdate"     -> "timestamp",
      "o_orderpriority" -> "string"),
    nonNullableFields = Seq("o_orderkey"))

  def ingestCsvE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i1_")
    val srcDir = tmp.resolve("src")
    Tables.orders(s, d)
      .coalesce(1).write
      .option("header", true)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .mode("overwrite").csv(srcDir.toString)

    val ref = TableRef("graft", "verify", "i1_orders")
    Seq(ref.qualified, ref.errorSibling.qualified,
        s"${ref.database}.box_ingestion_log").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
    }
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify",
      table = ref,
      folder = srcDir.toString,
      fileNameRegex = "part-.*\\.csv",
      metadata = Some(ordersMeta),
      justCopy = false))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt").orderBy("o_orderkey")
  }

  private val ingestOracle =
    """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
      | CAST(o_custkey AS BIGINT) AS o_custkey,
      | o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      | o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def exportXlsxE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    val outDir = Files.createTempDirectory("graft_e1_")
    val report = Export.execute(ExportConfig(
      taskOwner = "verify",
      query = """SELECT o_orderpriority, count(*) AS n
                |FROM orders_v GROUP BY o_orderpriority""".stripMargin,
      folder = outDir.toString,
      fileName = "out.xlsx",
      sheetName = "export",
      columnMapping = Map("o_orderpriority" -> "prio"),
      logTable = TableRef("graft", "verify", "export")))
    require(report.ok, s"export errors: ${report.errors.mkString("; ")}")

    // Read the produced artifact back with the engine's own xlsx reader.
    val rows = Xlsx.read(outDir.resolve("out.xlsx"), Some("export"), 0)
    val header = rows.head.map(_.getOrElse(""))
    val data = rows.tail.map(r => Row.fromSeq(r.map(_.orNull)))
    val raw = s.createDataFrame(data.asJava,
      StructType(header.map(h => StructField(h, StringType))))
    raw.select(col("prio"), col("n").cast(LongType).as("n")).orderBy("prio")
  }

  private val exportOracle =
    """SELECT o_orderpriority AS prio, count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY prio""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("i1_ingest_csv_e2e", ingestCsvE2e, Some(ingestOracle)),
    QueryDef("e1_export_xlsx_e2e", exportXlsxE2e, Some(exportOracle)))
}
