package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.nio.file.Path
import scala.jdk.CollectionConverters._

/** Format dispatch (reference O6-O9, box_ingest.py:148-159): csv / json /
  * xlsx|xlsm are parsed, anything else is rejected with a reason. CSV and
  * JSON go through Spark's distributed readers with schema inference
  * (mirroring pandas inference); xlsx is materialized driver-side exactly
  * like the reference (openpyxl is also driver-side).
  */
object FormatReader {

  sealed trait ReadResult
  final case class Parsed(df: DataFrame) extends ReadResult
  final case class Unsupported(reason: String) extends ReadResult

  def read(spark: SparkSession, file: Path,
      sheetName: Option[String] = None, skipRows: Int = 0): ReadResult = {
    val name = file.getFileName.toString.toLowerCase
    val ext = name.drop(name.lastIndexOf('.') + 1)
    ext match {
      case "csv" =>
        Parsed(spark.read
          .option("header", true)
          .option("inferSchema", true)
          .csv(file.toString))
      case "json" =>
        // The reference's pd.read_json default parses a whole-document
        // JSON array of records -> Spark multiLine mode. A JSON-lines
        // file under multiLine would silently yield only its FIRST
        // record, so sniff the document shape: '[' => array document,
        // anything else => line-delimited records.
        Parsed(spark.read
          .option("multiLine", isJsonArrayDocument(file))
          .json(file.toString))
      case "xlsx" | "xlsm" =>
        Parsed(fromXlsx(spark, file, sheetName, skipRows))
      case other =>
        Unsupported(s"Unsupported file type: .$other")
    }
  }

  /** First non-whitespace byte is '[' => whole-document JSON array. */
  private def isJsonArrayDocument(file: Path): Boolean = {
    val in = java.nio.file.Files.newInputStream(file)
    try {
      var b = in.read()
      while (b != -1 && Character.isWhitespace(b)) b = in.read()
      b == '['
    } finally in.close()
  }

  /** Xlsx rows -> all-string DataFrame: header from the first (post-skip)
    * row, like pandas read_excel; empty header cells become _cN. Types are
    * resolved later by validation casts / copy-mode conformance, which is
    * where the reference resolves them too.
    */
  private def fromXlsx(spark: SparkSession, file: Path,
      sheetName: Option[String], skipRows: Int): DataFrame = {
    val all = Xlsx.read(file, sheetName, skipRows)
    if (all.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[Row](), StructType(Nil))
    val header = all.head.zipWithIndex.map {
      case (Some(h), _) => h
      case (None, i)    => s"_c$i"
    }
    val n = header.length
    val rows = all.tail.map { r =>
      Row.fromSeq((0 until n).map(i =>
        r.lift(i).flatten.orNull))
    }
    spark.createDataFrame(rows.asJava,
      StructType(header.map(h => StructField(h, StringType, nullable = true))))
  }
}
