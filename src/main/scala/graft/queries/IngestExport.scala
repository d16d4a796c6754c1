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
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("o_orderkey")
  }

  private val ingestOracle =
    """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
      | CAST(o_custkey AS BIGINT) AS o_custkey,
      | o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      | o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** i19: the i1 CSV e2e through [[graft.io.HadoopStore]] on an explicit
    * `file:` URI — the ObjectStore impl a real cluster runs against
    * (s3a/abfs/hdfs; the reference's whole job is remote-store ingest,
    * box_ingest.py:37-63). Every other ingest/export gate goes through
    * LocalStore, so this is where the Hadoop path differences —
    * URI-qualified listing, hidden-tmp filtering, rename-overwrite
    * upload atomicity, post-ingest delete — would surface first. The
    * gate also drives the store surface LocalStore-free end to end:
    * putOverwrite (twice, same name — the overwrite-by-name contract),
    * hidden-tmp invisibility to list, ingest, then delete + re-list. */
  def ingestHadoopStoreE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i19_")
    val srcDir = tmp.resolve("src")
    Tables.orders(s, d)
      .coalesce(1).write
      .option("header", true)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .mode("overwrite").csv(srcDir.toString)

    val store = new graft.io.HadoopStore(s.sparkContext.hadoopConfiguration)
    val folder = "file:" + srcDir.toString
    // O28 through the Hadoop rename-overwrite path: create, then
    // overwrite the same name; list must see ONE object with the second
    // payload's size and never the in-flight dot-temp
    store.putOverwrite(folder, "note.txt", _.write("v1".getBytes))
    store.putOverwrite(folder, "note.txt", _.write("v2-longer".getBytes))
    val notes = store.list(folder).filter(_.name == "note.txt")
    require(notes.map(_.size) == Seq("v2-longer".getBytes.length.toLong),
      s"HadoopStore overwrite-by-name broken: $notes")
    require(!store.list(folder).exists(_.name.startsWith(".")),
      "HadoopStore list must hide dot-prefixed in-flight temps")

    val ref = TableRef("graft", "verify", "i19_orders")
    Seq(ref.qualified, ref.errorSibling.qualified,
        s"${ref.database}.box_ingestion_log").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
    }
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify",
      table = ref,
      folder = folder,
      fileNameRegex = "part-.*\\.csv",
      metadata = Some(ordersMeta),
      justCopy = false), store)
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")

    // O24 over the Hadoop surface: delete + re-list
    store.delete(folder, "note.txt")
    require(!store.list(folder).exists(_.name == "note.txt"),
      "HadoopStore delete must remove the object from the listing")
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("o_orderkey")
  }

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

  // ----------------------- export format extensions (csv/jsonl/parquet)

  /** CSV export through the same orchestration (O25-O30 with
    * format=Csv), read back by the engine's own CSV ingest reader. */
  def exportCsvE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    import graft.api.ExportFormat
    import graft.io.FormatReader
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    val outDir = Files.createTempDirectory("graft_e2_")
    val report = Export.execute(ExportConfig(
      taskOwner = "verify",
      query = """SELECT c_mktsegment, count(*) AS n,
                |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
                |FROM customer_v GROUP BY c_mktsegment""".stripMargin,
      folder = outDir.toString, fileName = "out.csv",
      format = ExportFormat.Csv,
      logTable = TableRef("graft", "verify", "export")))
    require(report.ok, s"export errors: ${report.errors.mkString("; ")}")
    FormatReader.read(s, outDir.resolve("out.csv")) match {
      case FormatReader.Parsed(df) =>
        df.select(col("c_mktsegment"), col("n").cast(LongType).as("n"), col("total"))
          .orderBy("c_mktsegment")
      case other => throw new IllegalStateException(s"csv read-back: $other")
    }
  }

  private val exportCsvOracle =
    """SELECT c_mktsegment, count(*) AS n,
      | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Fixed-width ingest e2e (FormatReader.fromFwf): customer rendered
    * as a padded fixed-width extract (the mainframe/ERP shape), column
    * boundaries INFERRED pandas-read_fwf-style from blank columns, then
    * through the same validate path as every other format. */
  def ingestFwfE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i11_")
    val srcDir = Files.createDirectory(tmp.resolve("src"))
    def pad(v: String, w: Int) = v.padTo(w, ' ')
    val sb = new StringBuilder
    sb.append(pad("c_custkey", 12)).append(pad("c_name", 26))
      .append("c_nationkey").append('\n')
    // Gate fixture builder (driver-side, like the xlsx fixtures).
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .collect().foreach { r =>
        sb.append(pad(r.getLong(0).toString, 12))
          .append(pad(r.getString(1), 26))
          .append(r.getInt(2).toString).append('\n')
      }
    Files.write(srcDir.resolve("customer.fwf"),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val ref = TableRef("graft", "verify", "i11_customer")
    Seq(ref.qualified, ref.errorSibling.qualified).foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"))
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify",
      table = ref,
      folder = srcDir.toString,
      fileNameRegex = ".*\\.fwf",
      metadata = Some(TableMeta.fromMetadata(
        Seq("c_custkey" -> "int", "c_name" -> "string",
          "c_nationkey" -> "int"),
        nonNullableFields = Seq("c_custkey"))),
      justCopy = false))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt", "process_date")
      .orderBy("c_custkey")
  }

  private val ingestFwfOracle =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      | CAST(c_nationkey AS BIGINT) AS c_nationkey
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Distributed partitioned export (Export.exportPartitioned): orders
    * written hive-partitioned by priority as headered CSV, read back by
    * Spark's csv reader off the partitioned layout. The observed row
    * count must equal the input. */
  def exportPartitionedE2e(s: SparkSession, d: String): DataFrame = {
    val outDir = Files.createTempDirectory("graft_e7_").toString
    val src = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val n = Export.exportPartitioned(src, outDir, "csv",
      partitionCols = Seq("o_orderpriority"))
    require(n == src.count(), s"observed $n rows")
    s.read.option("header", true).option("inferSchema", true).csv(outDir)
      .select(col("o_orderkey").cast(LongType),
        col("o_custkey").cast(LongType), col("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  private val exportPartitionedOracle =
    """SELECT o_orderkey, o_custkey, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Gzip-compressed CSV export: the codec wraps the upload stream
    * in-flight; Spark's CSV scan decompresses *.gz transparently on the
    * read-back, so the whole compressed round trip is inside the gate. */
  def exportCsvGzipE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    import graft.api.ExportFormat
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    val outDir = Files.createTempDirectory("graft_e5_")
    val report = Export.execute(ExportConfig(
      taskOwner = "verify",
      query = """SELECT c_mktsegment, count(*) AS n,
                |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
                |FROM customer_v GROUP BY c_mktsegment""".stripMargin,
      folder = outDir.toString, fileName = "out.csv.gz",
      format = ExportFormat.Csv, codec = Some("gzip"),
      logTable = TableRef("graft", "verify", "export")))
    require(report.ok, s"export errors: ${report.errors.mkString("; ")}")
    val bytes = Files.readAllBytes(outDir.resolve("out.csv.gz"))
    require(bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte,
      "artifact is not gzip")
    s.read.option("header", true).option("inferSchema", true)
      .csv(outDir.resolve("out.csv.gz").toString)
      .select(col("c_mktsegment"), col("n").cast(LongType).as("n"), col("total"))
      .orderBy("c_mktsegment")
  }

  /** Zstd-compressed CSV export: wrapCodec ends the zstd frame on the
    * upload stream in-flight (zstd-jni, already on the Spark classpath);
    * the gate checks the four frame magic bytes, then decompresses with
    * ZstdInputStream and reads the CSV back — the whole compressed round
    * trip inside the gate, with no dependency on Hadoop native codecs. */
  def exportCsvZstdE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    import graft.api.ExportFormat
    Tables.orders(s, d).createOrReplaceTempView("orders_zv")
    val outDir = Files.createTempDirectory("graft_e8_")
    val report = Export.execute(ExportConfig(
      taskOwner = "verify",
      query = """SELECT o_orderpriority, count(*) AS n,
                |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                |FROM orders_zv GROUP BY o_orderpriority""".stripMargin,
      folder = outDir.toString, fileName = "out.csv.zst",
      format = ExportFormat.Csv, codec = Some("zstd"),
      logTable = TableRef("graft", "verify", "export")))
    require(report.ok, s"export errors: ${report.errors.mkString("; ")}")
    val zst = outDir.resolve("out.csv.zst")
    val bytes = Files.readAllBytes(zst)
    require(bytes.length >= 4 && bytes(0) == 0x28.toByte &&
      bytes(1) == 0xb5.toByte && bytes(2) == 0x2f.toByte &&
      bytes(3) == 0xfd.toByte, "artifact is not a zstd frame")
    val plain = outDir.resolve("out.csv")
    val in = new com.github.luben.zstd.ZstdInputStream(
      Files.newInputStream(zst))
    try Files.copy(in, plain) finally in.close()
    s.read.option("header", true).option("inferSchema", true)
      .csv(plain.toString)
      .select(col("o_orderpriority"), col("n").cast(LongType).as("n"),
        col("total"))
      .orderBy("o_orderpriority")
  }

  private val exportCsvZstdOracle =
    """SELECT o_orderpriority, count(*) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Multi-sheet xlsx export: main sheet + an extraSheets query, each
    * read back by name through the engine's own xlsx reader. The gate
    * result unions both sheets (tagged) so either sheet regressing
    * breaks the hash. */
  def exportXlsxSheetsE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    Tables.nation(s, d).createOrReplaceTempView("nation_v")
    Tables.region(s, d).createOrReplaceTempView("region_v")
    val outDir = Files.createTempDirectory("graft_e6_")
    val report = Export.execute(ExportConfig(
      taskOwner = "verify",
      query = "SELECT n_name AS name FROM nation_v",
      folder = outDir.toString, fileName = "out.xlsx", sheetName = "nations",
      extraSheets = Seq("regions" -> "SELECT r_name AS name FROM region_v"),
      logTable = TableRef("graft", "verify", "export")))
    require(report.ok, s"export errors: ${report.errors.mkString("; ")}")
    def sheet(nm: String): DataFrame = {
      val rows = Xlsx.read(outDir.resolve("out.xlsx"), Some(nm), 0)
      val header = rows.head.map(_.getOrElse(""))
      val data = rows.tail.map(r => Row.fromSeq(r.map(_.orNull)))
      s.createDataFrame(data.asJava,
        StructType(header.map(h => StructField(h, StringType))))
        .select(lit(nm).as("sheet"), col("name"))
    }
    sheet("nations").union(sheet("regions")).orderBy("sheet", "name")
  }

  private val exportXlsxSheetsOracle =
    """SELECT 'nations' AS sheet, n_name AS name FROM nation
      |UNION ALL
      |SELECT 'regions' AS sheet, r_name AS name FROM region
      |ORDER BY sheet, name""".stripMargin

  /** Parquet export: Spark's writer produces the artifact (typed columns
    * survive exactly — no text round-trip), uploaded by name. */
  def exportParquetE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    import graft.api.ExportFormat
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    val outDir = Files.createTempDirectory("graft_e3_")
    val report = Export.execute(ExportConfig(
      taskOwner = "verify",
      query = """SELECT o_orderstatus, count(*) AS n,
                |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
                |FROM orders_v GROUP BY o_orderstatus""".stripMargin,
      folder = outDir.toString, fileName = "out.parquet",
      format = ExportFormat.Parquet,
      logTable = TableRef("graft", "verify", "export")))
    require(report.ok && report.rows == 3,
      s"export errors: ${report.errors.mkString("; ")} rows=${report.rows}")
    s.read.parquet(outDir.resolve("out.parquet").toString).orderBy("o_orderstatus")
  }

  private val exportParquetOracle =
    """SELECT o_orderstatus, count(*) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** ORC export (ExportFormat.Orc, the e3 shape on Spark's native
    * vectorized ORC writer), read back by `spark.read.orc` — write/read
    * parity with the i8 ORC ingest gate. */
  def exportOrcE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    import graft.api.ExportFormat
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_e11_v")
    val outDir = Files.createTempDirectory("graft_e11_")
    val report = Export.execute(ExportConfig(
      taskOwner = "verify",
      query = """SELECT l_returnflag, l_linestatus, count(*) AS n,
                |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                |  AS total
                |FROM lineitem_e11_v GROUP BY l_returnflag, l_linestatus"""
        .stripMargin,
      folder = outDir.toString, fileName = "out.orc",
      format = ExportFormat.Orc,
      logTable = TableRef("graft", "verify", "export")))
    require(report.ok && report.rows > 0,
      s"export errors: ${report.errors.mkString("; ")} rows=${report.rows}")
    s.read.orc(outDir.resolve("out.orc").toString)
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val exportOrcOracle =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** JSON-lines export, read back by the engine's JSON shape-sniffing
    * reader (must sniff Lines, not ArrayDoc/Columns). */
  def exportJsonlE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    import graft.api.ExportFormat
    import graft.io.FormatReader
    Tables.nation(s, d).createOrReplaceTempView("nation_v")
    val outDir = Files.createTempDirectory("graft_e4_")
    val report = Export.execute(ExportConfig(
      taskOwner = "verify",
      query = """SELECT n_regionkey, count(*) AS n
                |FROM nation_v GROUP BY n_regionkey""".stripMargin,
      folder = outDir.toString, fileName = "out.json",
      format = ExportFormat.JsonLines,
      logTable = TableRef("graft", "verify", "export")))
    require(report.ok, s"export errors: ${report.errors.mkString("; ")}")
    FormatReader.read(s, outDir.resolve("out.json")) match {
      case FormatReader.Parsed(df) =>
        df.select(col("n_regionkey").cast(LongType).as("n_regionkey"),
          col("n").cast(LongType).as("n")).orderBy("n_regionkey")
      case other => throw new IllegalStateException(s"jsonl read-back: $other")
    }
  }

  private val exportJsonlOracle =
    """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  // ------------------------------------------------- json (O7) ingest

  private val customerMeta = TableMeta.fromMetadata(
    Seq(
      "c_custkey"    -> "int",
      "c_name"       -> "string",
      "c_nationkey"  -> "int",
      "c_acctbal"    -> "float",
      "c_mktsegment" -> "string"),
    nonNullableFields = Seq("c_custkey"))

  /** Whole-document JSON array of records — the shape the reference's
    * pd.read_json default accepts (box_ingest.py:150-151) — through the
    * full validate path. */
  def ingestJsonE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i2_")
    val records = Tables.customer(s, d).orderBy("c_custkey")
      .toJSON.collect() // driver-side render; the INGEST is distributed
    Files.write(tmp.resolve("customers.json"),
      records.mkString("[\n", ",\n", "\n]").getBytes("UTF-8"))

    val ref = TableRef("graft", "verify", "i2_customer")
    dropAll(s, ref)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = tmp.toString,
      fileNameRegex = ".*\\.json", metadata = Some(customerMeta),
      justCopy = false))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("c_custkey")
  }

  private val ingestJsonOracle =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      | CAST(c_nationkey AS BIGINT) AS c_nationkey,
      | CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------- zip spool (O5) + delete (O24) ingest

  /** A zip holding two CSV member files: exercises spool-extract plus
    * per-member recursion, then post-ingest source deletion. */
  def ingestZipE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i3_")
    val cust = Tables.customer(s, d)
    val header = cust.columns.mkString(",")
    def csvLines(df: org.apache.spark.sql.DataFrame): Seq[String] =
      header +: df.collect().toSeq.map(_.toSeq.map {
        case null => ""
        case v    => v.toString
      }.mkString(","))
    val lo = csvLines(cust.where(col("c_custkey") % 2 === 0))
    val hi = csvLines(cust.where(col("c_custkey") % 2 === 1))
    val zipPath = tmp.resolve("batch.zip")
    val z = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
    try Seq("even.csv" -> lo, "odd.csv" -> hi).foreach { case (n, lines) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(lines.mkString("\n").getBytes("UTF-8"))
      z.closeEntry()
    } finally z.close()

    val ref = TableRef("graft", "verify", "i3_customer")
    dropAll(s, ref)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = tmp.toString,
      fileNameRegex = "batch\\.zip", metadata = Some(customerMeta),
      justCopy = false, delete = true))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    require(!Files.exists(zipPath), "O24: source zip should be deleted")
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("c_custkey")
  }

  /** Tarball ingest (O5 extension — the reference recurses into zip
    * only): the same two-member CSV batch as i3, written through the
    * engine's own ustar writer, gzipped with the JDK stream, and
    * ingested via the .tgz recursion path. Same oracle as i3 — a
    * mis-parsed header offset, a dropped 512-byte tail, or a bad size
    * field all hash-mismatch. */
  def ingestTgzE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i13_")
    val cust = Tables.customer(s, d)
    val header = cust.columns.mkString(",")
    def csvBytes(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      (header +: df.collect().toSeq.map(_.toSeq.map {
        case null => ""
        case v    => v.toString
      }.mkString(","))).mkString("\n").getBytes("UTF-8")
    val lo = csvBytes(cust.where(col("c_custkey") % 2 === 0))
    val hi = csvBytes(cust.where(col("c_custkey") % 2 === 1))
    val tgzPath = tmp.resolve("batch.tgz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(tgzPath))
    try graft.io.Tar.write(out, Seq("even.csv" -> lo, "odd.csv" -> hi))
    finally out.close()

    val ref = TableRef("graft", "verify", "i13_customer")
    dropAll(s, ref)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = tmp.toString,
      fileNameRegex = "batch\\.tgz", metadata = Some(customerMeta),
      justCopy = false, delete = true))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    require(!Files.exists(tgzPath), "O24: source tgz should be deleted")
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("c_custkey")
  }

  /** Latin-1 CSV ingest with an explicit encoding (the FIXTURES.md
    * deviation from pandas' sniffing): names carry an 'é' (0xE9 in
    * ISO-8859-1, NOT valid UTF-8), written as latin-1 bytes and ingested
    * with encoding=ISO-8859-1. The oracle regenerates the same strings
    * from the nation table — a mojibaked ingest hash-mismatches. */
  def ingestLatin1E2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i9_")
    val nat = Tables.nation(s, d).orderBy("n_nationkey").collect()
    val lines = "n_nationkey,n_name" +:
      nat.toSeq.map(r => s"${r.get(0)},${r.get(1)}é")
    Files.write(tmp.resolve("nations_latin1.csv"),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

    val ref = TableRef("graft", "verify", "i9_nation")
    dropAll(s, ref)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = tmp.toString,
      fileNameRegex = ".*\\.csv",
      metadata = Some(TableMeta.fromMetadata(
        Seq("n_nationkey" -> "int", "n_name" -> "string"),
        nonNullableFields = Seq("n_nationkey"))),
      justCopy = false, encoding = Some("ISO-8859-1")))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("n_nationkey")
  }

  private val ingestLatin1Oracle =
    """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
      | n_name || 'é' AS n_name
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // ------------------------- xlsx scan (O8: sheet + skiprows) ingest

  /** The engine's own xlsx writer produces the fixture (title row, then
    * header+data on a named sheet); ingest parses it back with
    * sheetName + skipRows — the O8 knobs (box_ingest.py:152-156). */
  def ingestXlsxE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i4_")
    val nat = Tables.nation(s, d).orderBy("n_nationkey").collect()
    val path = tmp.resolve("nations.xlsx")
    val out = Files.newOutputStream(path)
    try Xlsx.write(out, "raw_data",
      // title row first => real header lands on row 2, so skipRows=1
      Seq("quarterly nation refresh", "", ""),
      (Seq(Seq[Any]("n_nationkey", "n_name", "n_regionkey")) ++
        nat.toSeq.map(r => r.toSeq)).iterator)
    finally out.close()

    val ref = TableRef("graft", "verify", "i4_nation")
    dropAll(s, ref)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = tmp.toString,
      fileNameRegex = ".*\\.xlsx", sheetName = Some("raw_data"),
      metadata = Some(TableMeta.fromMetadata(
        Seq("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
        nonNullableFields = Seq("n_nationkey"))),
      justCopy = false, skipRows = 1))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("n_nationkey")
  }

  private val ingestXlsxOracle =
    """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
      | CAST(n_regionkey AS BIGINT) AS n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** All-sheets xlsx ingest (pandas `sheet_name=None` — the reference
    * passes the kwarg verbatim to pd.read_excel, box_ingest.py:152-156):
    * nation split across two tabs, each with its own header row. With
    * allSheets=true the reader unions the sheets by header name and tags
    * each row with a `_sheet` provenance column, which rides through
    * validation as a declared string column. */
  def ingestXlsxAllSheetsE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i12_")
    val nat = Tables.nation(s, d).orderBy("n_nationkey").collect()
    val (lo, hi) = nat.toSeq.partition(
      _.getAs[Number]("n_nationkey").intValue < 12)
    val header = Seq("n_nationkey", "n_name", "n_regionkey")
    val path = tmp.resolve("nations_sheets.xlsx")
    val out = Files.newOutputStream(path)
    try Xlsx.writeSheets(out, Seq(
      Xlsx.SheetSource("first_half", header, () => lo.map(_.toSeq).iterator),
      Xlsx.SheetSource("second_half", header, () => hi.map(_.toSeq).iterator)))
    finally out.close()

    val ref = TableRef("graft", "verify", "i12_nation")
    dropAll(s, ref)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = tmp.toString,
      fileNameRegex = ".*\\.xlsx", allSheets = true,
      metadata = Some(TableMeta.fromMetadata(
        Seq("n_nationkey" -> "int", "n_name" -> "string",
            "n_regionkey" -> "int", "_sheet" -> "string"),
        nonNullableFields = Seq("n_nationkey"))),
      justCopy = false))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("n_nationkey")
  }

  private val ingestXlsxAllSheetsOracle =
    """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
      | CAST(n_regionkey AS BIGINT) AS n_regionkey,
      | CASE WHEN n_nationkey < 12 THEN 'first_half' ELSE 'second_half' END AS _sheet
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // --------------------- column-oriented JSON (O7 dict orientation) ingest

  /** pd.read_json also accepts a column-oriented document
    * {"col": {"label": value, ...}, ...} (box_ingest.py:150-151 — pandas
    * "columns" orientation). Render nation that way, ingest through the
    * full validate path; FormatReader's shape sniff must pick the pivot
    * reader, not json-lines. */
  def ingestJsonColumnsE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i6_")
    val nat = Tables.nation(s, d).orderBy("n_nationkey").collect()
    def esc(v: Any): String = v match {
      case null      => "null"
      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case x         => x.toString
    }
    val colNames = Seq("n_nationkey", "n_name", "n_regionkey")
    val doc = colNames.map { c =>
      val cells = nat.zipWithIndex.map { case (r, i) =>
        s""""$i": ${esc(r.getAs[Any](c))}"""
      }
      s""""$c": {${cells.mkString(", ")}}"""
    }.mkString("{\n", ",\n", "\n}")
    Files.write(tmp.resolve("nations.json"), doc.getBytes("UTF-8"))

    val ref = TableRef("graft", "verify", "i6_nation")
    dropAll(s, ref)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = tmp.toString,
      fileNameRegex = ".*\\.json",
      metadata = Some(TableMeta.fromMetadata(
        Seq("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
        nonNullableFields = Seq("n_nationkey"))),
      justCopy = false))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("n_nationkey")
  }

  // ----------------------- columnar formats (parquet/orc) ingest

  /** Parquet batch through the full validate path — the format extension
    * beyond the reference's csv/json/excel: other pipelines land batches
    * as parquet, and the typed columns flow into the same cast/split
    * machinery the text formats use. */
  def ingestParquetE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i7_")
    val srcDir = tmp.resolve("src")
    Tables.supplier(s, d).coalesce(1).write
      .mode("overwrite").parquet(srcDir.toString)

    val ref = TableRef("graft", "verify", "i7_supplier")
    dropAll(s, ref)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = srcDir.toString,
      fileNameRegex = "part-.*\\.parquet",
      metadata = Some(TableMeta.fromMetadata(
        Seq("s_suppkey" -> "int", "s_name" -> "string",
          "s_nationkey" -> "int", "s_acctbal" -> "float"),
        nonNullableFields = Seq("s_suppkey"))),
      justCopy = false))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("s_suppkey")
  }

  private val ingestParquetOracle =
    """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
      | CAST(s_nationkey AS BIGINT) AS s_nationkey,
      | CAST(s_acctbal AS DOUBLE) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** ORC batch through the same path (Spark's native orc reader). */
  def ingestOrcE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i8_")
    val srcDir = tmp.resolve("src")
    Tables.part(s, d).coalesce(1).write
      .mode("overwrite").orc(srcDir.toString)

    val ref = TableRef("graft", "verify", "i8_part")
    dropAll(s, ref)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = srcDir.toString,
      fileNameRegex = "part-.*\\.orc",
      metadata = Some(TableMeta.fromMetadata(
        Seq("p_partkey" -> "int", "p_name" -> "string", "p_brand" -> "string",
          "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "float"),
        nonNullableFields = Seq("p_partkey"))),
      justCopy = false))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("p_partkey")
  }

  private val ingestOrcOracle =
    """SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name, p_brand,
      | p_type, CAST(p_size AS BIGINT) AS p_size,
      | CAST(p_retailprice AS DOUBLE) AS p_retailprice
      |FROM part ORDER BY p_partkey""".stripMargin

  // --------------------------------------------- copy mode (O22) ingest

  /** justCopy: no metadata/validation — incoming columns conform (via
    * string, box_ingest.py:163-168) to the pre-existing target table's
    * schema minus process_dt; extra source columns are dropped. */
  def ingestCopyE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i5_")
    val srcDir = tmp.resolve("src")
    Tables.customer(s, d).coalesce(1).write
      .option("header", true).mode("overwrite").csv(srcDir.toString)

    val ref = TableRef("graft", "verify", "i5_customer")
    dropAll(s, ref)
    graft.sink.TableSink.ensureDatabase(s, ref)
    s.sql(s"""CREATE TABLE ${ref.qualified}
             | (c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE,
             |  process_dt TIMESTAMP) USING parquet""".stripMargin)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = srcDir.toString,
      fileNameRegex = "part-.*\\.csv", justCopy = true))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt", "process_date").orderBy("c_custkey")
  }

  private val ingestCopyOracle =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      | CAST(c_acctbal AS DOUBLE) AS c_acctbal
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------ audit log (O23)

  /** Every orchestration step logs one row (box_ingest.py:13-20); for a
    * single-file ingest the action sequence is fully determined. */
  def auditLogE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_a1_")
    val srcDir = tmp.resolve("src")
    Tables.region(s, d).coalesce(1).write
      .option("header", true).mode("overwrite").csv(srcDir.toString)

    val ref = TableRef("graft", "audit", "a1_region")
    dropAll(s, ref)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = srcDir.toString,
      fileNameRegex = "part-.*\\.csv",
      metadata = Some(TableMeta.fromMetadata(
        Seq("r_regionkey" -> "int", "r_name" -> "string"),
        nonNullableFields = Seq("r_regionkey"))),
      justCopy = false))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(s"${ref.database}.${graft.sink.AuditLog.TableName}")
      .select(col("task_owner"), col("job_action"))
      .orderBy("job_action")
  }

  private val auditOracle =
    """SELECT * FROM (VALUES
      | ('verify', 'Created temp directory'),
      | ('verify', 'Downloaded file'),
      | ('verify', 'File processed'),
      | ('verify', 'Ingest completed')) t(task_owner, job_action)
      |ORDER BY job_action""".stripMargin

  private def dropAll(s: SparkSession, ref: TableRef): Unit =
    Seq(ref.qualified, ref.errorSibling.qualified,
        s"${ref.database}.${graft.sink.AuditLog.TableName}").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
    }

  /** Provenance lineage: two CSV files with controlled names (even/odd
    * custkeys), ingested with `sourceFileCol` — every row of the target
    * table must carry the name of the file it came from. */
  def ingestProvenanceE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i10_")
    val srcDir = tmp.resolve("src")
    Files.createDirectories(srcDir)
    def writeNamed(df: DataFrame, name: String): Unit = {
      val stage = tmp.resolve(name + "_stage")
      df.coalesce(1).write.option("header", true)
        .mode("overwrite").csv(stage.toString)
      val listing = Files.list(stage)
      val found =
        try {
          import scala.jdk.CollectionConverters._
          listing.iterator().asScala
            .find(_.getFileName.toString.endsWith(".csv")).get
        } finally listing.close()
      Files.move(found, srcDir.resolve(name))
    }
    val c = Tables.customer(s, d)
    writeNamed(c.where(col("c_custkey") % 2 === 0), "even.csv")
    writeNamed(c.where(col("c_custkey") % 2 === 1), "odd.csv")
    val ref = TableRef("graft", "verify", "i10_customer")
    Seq(ref.qualified, ref.errorSibling.qualified).foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS $t"))
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify",
      table = ref,
      folder = srcDir.toString,
      fileNameRegex = ".*\\.csv",
      metadata = Some(customerMeta),
      justCopy = false,
      sourceFileCol = Some("_src_file")))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt", "process_date")
      .orderBy("c_custkey")
  }

  private val ingestProvenanceOracle =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
      | CAST(c_nationkey AS BIGINT) AS c_nationkey,
      | CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment,
      | CASE WHEN c_custkey % 2 = 0 THEN 'even.csv' ELSE 'odd.csv' END
      |   AS _src_file
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Quoted-newline CSV ingest (pd.read_csv default-behavior parity):
    * every 3rd customer's name gains an embedded "\nsecond line" and
    * the CSV is hand-rendered with RFC-4180 quoting. The reader's
    * odd-quote sniff must flip multiLine on, so the logical rows
    * survive the physical line breaks through the full validate path. */
  def ingestQuotedNewlineE2e(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val tmp = Files.createTempDirectory("graft_i15_")
    val cust = Tables.customer(s, d)
    def q(v: Any): String = v match {
      case null => ""
      case s: String
        if s.contains(",") || s.contains("\"") || s.contains("\n") =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case x => x.toString
    }
    val lines = cust.columns.mkString(",") +:
      cust.orderBy("c_custkey").collect().toSeq.map { r =>
        val name =
          if (r.getAs[Long]("c_custkey") % 3 == 0)
            r.getAs[String]("c_name") + "\nsecond line"
          else r.getAs[String]("c_name")
        Seq(r.getAs[Long]("c_custkey"), name,
          r.getAs[Int]("c_nationkey"), r.getAs[Double]("c_acctbal"),
          r.getAs[String]("c_mktsegment")).map(q).mkString(",")
      }
    Files.write(tmp.resolve("customers.csv"),
      lines.mkString("\n").getBytes("UTF-8"))

    val ref = TableRef("graft", "verify", "i15_customer")
    dropAll(s, ref)
    val report = Ingest.execute(IngestConfig(
      taskOwner = "verify", table = ref, folder = tmp.toString,
      fileNameRegex = ".*\\.csv", metadata = Some(customerMeta),
      justCopy = false))
    require(report.ok, s"ingest errors: ${report.errors.mkString("; ")}")
    s.table(ref.qualified).drop("process_dt", "process_date")
      .orderBy("c_custkey")
  }

  private val ingestQuotedNewlineOracle =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
      | CASE WHEN c_custkey % 3 = 0
      |      THEN c_name || chr(10) || 'second line'
      |      ELSE c_name END AS c_name,
      | CAST(c_nationkey AS BIGINT) AS c_nationkey,
      | CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Training-shard export e2e: token-balanced shard assignment
    * (Packing.shardByTokens at a 2048-token budget) written as
    * shard_id-partitioned parquet — one directory per shard, the
    * layout a trainer's loader consumes — then read back through the
    * partition-discovery path. The read-back must hash-match the pk2
    * oracle, and the per-shard file counts must agree with
    * Packing.shardManifest (checked in-gate with require). */
  def exportShardsE2e(s: SparkSession, d: String): DataFrame = {
    val outDir = Files.createTempDirectory("graft_e9_").toString
    val sharded = graft.ext.Packing.shardByTokens(
      Tables.documents(s, d), "doc_id",
      graft.ext.TextAnalysis.tokenCount(col("text")), shardTokens = 2048L)
    val n = Export.exportPartitioned(sharded, outDir, "parquet",
      partitionCols = Seq("shard_id"))
    val back = s.read.parquet(outDir)
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        col("shard_id").cast(LongType))
    require(n == back.count(), s"wrote $n rows, read ${back.count()}")
    val manifest = graft.ext.Packing.shardManifest(sharded)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val observed = back.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    require(manifest == observed,
      s"manifest/file mismatch: $manifest vs $observed")
    back.orderBy("doc_id")
  }

  private val exportShardsOracle =
    """WITH t AS (
      | SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[^\s]+')) AS BIGINT) AS n_tokens
      | FROM documents),
      |o AS (
      | SELECT doc_id, n_tokens,
      |  sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |    - n_tokens AS start_offset
      | FROM t WHERE n_tokens > 0)
      |SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
      | CAST(start_offset // 2048 AS BIGINT) AS shard_id
      |FROM o ORDER BY doc_id""".stripMargin

  /** Nested-JSON ingest + recursive struct flatten (ext Nested): a
    * two-level nested rendering of customer (profile.seg.{code,nation})
    * is written as json-lines, read back with schema inference, and
    * flattened to path-joined columns. The oracle is the equivalent
    * flat projection straight off the parquet table. */
  def flattenNested(s: SparkSession, d: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_i14_")
    val nested = Tables.customer(s, d).select(
      col("c_custkey").as("id"),
      struct(
        col("c_name").as("name"),
        struct(
          col("c_mktsegment").as("code"),
          col("c_nationkey").as("nation")).as("seg")).as("profile"),
      col("c_acctbal").as("bal"))
    Files.write(tmp.resolve("nested.jsonl"),
      nested.toJSON.collect().mkString("\n").getBytes("UTF-8"))
    graft.ext.Nested.flattenStruct(
        s.read.json(tmp.resolve("nested.jsonl").toString))
      .orderBy("id")
  }

  private val flattenNestedOracle =
    """SELECT CAST(c_acctbal AS DOUBLE) AS bal,
      | CAST(c_custkey AS BIGINT) AS id,
      | c_name AS profile_name,
      | c_mktsegment AS profile_seg_code,
      | CAST(c_nationkey AS BIGINT) AS profile_seg_nation
      |FROM customer ORDER BY id""".stripMargin

  /** WARC ingest e2e (io.Warc): the corpus is serialized into two .warc
    * shards (even/odd doc_id, each led by a warcinfo record) with real
    * HTTP response payloads, then read back DISTRIBUTED via the
    * record-delimiter TextInputFormat split, filtered to response
    * records, and HTTP-split columnar. The oracle re-derives the URI,
    * declared byte length (45-byte HTTP preamble + body), status, and
    * body from the documents table alone — agreement means serializer,
    * splitter, header parser, byte-exact Content-Length cut, and HTTP
    * split all invert each other. */
  def ingestWarcE2e(s: SparkSession, d: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_i16_")
    val docs = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def shard(recs: Seq[(Long, String)], name: String): Unit = {
      val sb = new StringBuilder
      sb.append(graft.io.Warc.writeRecord("warcinfo", "<urn:graft:info>",
        "", "2024-01-01T00:00:00Z", "software: graft-fixture\r\n"))
      recs.foreach { case (id, text) =>
        val payload = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" +
          text.take(200)
        sb.append(graft.io.Warc.writeRecord("response", s"<urn:doc:$id>",
          s"http://corpus.example.com/doc/$id", "2024-01-01T00:00:00Z",
          payload))
      }
      Files.write(tmp.resolve(name),
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val (even, odd) = docs.toSeq.partition(_._1 % 2 == 0)
    shard(even, "shard0.warc")
    shard(odd, "shard1.warc")
    graft.io.Warc.httpParts(
        graft.io.Warc.read(s, tmp.toString + "/*.warc")
          .where(col("warc_type") === "response"))
      .select(
        regexp_extract(col("target_uri"), "doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        col("target_uri"), col("content_length"),
        col("http_status"), col("http_body"))
      .orderBy("doc_id")
  }

  private val ingestWarcOracle =
    """SELECT doc_id,
      | 'http://corpus.example.com/doc/' || doc_id AS target_uri,
      | CAST(45 + length(substr(text, 1, 200)) AS BIGINT) AS content_length,
      | CAST(200 AS INTEGER) AS http_status,
      | substr(text, 1, 200) AS http_body
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Avro object-container ingest (io.Avro, no spark-avro datasource):
    * documents serialized into TWO .avro containers (driver-side Avro
    * writer — the independent producer; 16-byte sync markers between
    * blocks) with a union[null,string] nullable field, read back via
    * sync-aligned input splits and the schema pinned from the first
    * header. The oracle re-derives every column from documents alone. */
  def ingestAvroE2e(s: SparkSession, d: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("graft_i17_")
    val schema = org.apache.avro.SchemaBuilder.record("doc").fields()
      .requiredLong("doc_id")
      .requiredString("text")
      .optionalString("lang") // union[null, string]
      .requiredLong("n_chars")
      .endRecord()
    val docs = Tables.documents(s, d)
      .select("doc_id", "text", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    def recs(rows: Seq[(Long, String, String, Long)]) = rows.iterator.map {
      case (id, text, lang, n) =>
        new org.apache.avro.generic.GenericRecordBuilder(schema)
          .set("doc_id", id).set("text", text)
          .set("lang", if (id % 10 == 0) null else lang) // exercise nulls
          .set("n_chars", n).build()
          : org.apache.avro.generic.GenericRecord
    }
    val (even, odd) = docs.toSeq.partition(_._1 % 2 == 0)
    graft.io.Avro.writeContainer(tmp.resolve("shard0.avro"), schema, recs(even))
    graft.io.Avro.writeContainer(tmp.resolve("shard1.avro"), schema, recs(odd))
    graft.io.Avro.read(s, tmp.toString + "/*.avro")
      .orderBy("doc_id")
  }

  private val ingestAvroOracle =
    """SELECT doc_id, text,
      | CASE WHEN doc_id % 10 = 0 THEN NULL ELSE lang END AS lang,
      | n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Distributed Avro export (io.Avro.writeDistributed): every
    * partition writes its own object container through the Hadoop FS
    * API — the driver never sees a row — then the containers round-trip
    * back through the split-aligned reader. The oracle is the source
    * table itself: a full write→read identity proves both directions. */
  def exportAvroE2e(s: SparkSession, d: String): DataFrame = {
    val outDir = Files.createTempDirectory("graft_e10_")
      .resolve("out").toString
    val docs = Tables.documents(s, d)
      .select("doc_id", "text", "lang", "n_chars")
    graft.io.Avro.writeDistributed(docs.repartition(3), outDir)
    graft.io.Avro.read(s, outDir + "/*.avro").orderBy("doc_id")
  }

  private val exportAvroOracle =
    """SELECT doc_id, text, lang, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Lenient JSON-lines ingest (FormatReader.fromJsonLenient): every
    * 9th line of the fixture is mangled mid-object; the PERMISSIVE
    * parse must keep every good row intact (the oracle replays them
    * from documents) while the corrupt lines quarantine — one bad byte
    * costs one row, never the batch (pd.read_json would throw). The
    * corrupt-capture side is pinned in IoSpec. */
  def ingestCorruptJsonE2e(s: SparkSession, d: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_i18_")
    val lines = Tables.documents(s, d).select("doc_id", "lang").collect()
      .sortBy(_.getLong(0))
      .map { r =>
        val id = r.getLong(0)
        if (id % 9 == 0) s"""{"doc_id": $id, "lang": OOPS"""
        else s"""{"doc_id": $id, "lang": "${r.getString(1)}"}"""
      }
    Files.write(tmp.resolve("docs.jsonl"),
      String.join("\n", lines: _*)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType)))
    val (good, _) = graft.io.FormatReader.fromJsonLenient(
      s, tmp.resolve("docs.jsonl").toString, schema)
    good.orderBy("doc_id")
  }

  private val ingestCorruptJsonOracle =
    """SELECT doc_id, lang FROM documents
      |WHERE doc_id % 9 <> 0 ORDER BY doc_id""".stripMargin

  // serial: every gate here creates/drops managed tables in the shared
  // graft.verify / graft.audit databases and appends to the audit log —
  // they must not run concurrently with each other (QueryDef scaladoc)
  def defs: Seq[QueryDef] = rawDefs.map(_.copy(serial = true))

  private def rawDefs: Seq[QueryDef] = Seq(
    QueryDef("i10_ingest_provenance_e2e", ingestProvenanceE2e,
      Some(ingestProvenanceOracle)),
    QueryDef("i1_ingest_csv_e2e", ingestCsvE2e, Some(ingestOracle)),
    QueryDef("i19_ingest_hadoop_store_e2e", ingestHadoopStoreE2e,
      Some(ingestOracle)),
    QueryDef("i2_ingest_json_e2e", ingestJsonE2e, Some(ingestJsonOracle)),
    QueryDef("i3_ingest_zip_e2e", ingestZipE2e, Some(ingestJsonOracle)),
    QueryDef("i4_ingest_xlsx_e2e", ingestXlsxE2e, Some(ingestXlsxOracle)),
    QueryDef("i5_ingest_copy_e2e", ingestCopyE2e, Some(ingestCopyOracle)),
    QueryDef("i6_ingest_json_columns_e2e", ingestJsonColumnsE2e, Some(ingestXlsxOracle)),
    QueryDef("i7_ingest_parquet_e2e", ingestParquetE2e, Some(ingestParquetOracle)),
    QueryDef("i8_ingest_orc_e2e", ingestOrcE2e, Some(ingestOrcOracle)),
    QueryDef("i9_ingest_latin1_e2e", ingestLatin1E2e, Some(ingestLatin1Oracle)),
    QueryDef("a1_audit_log_e2e", auditLogE2e, Some(auditOracle)),
    QueryDef("e1_export_xlsx_e2e", exportXlsxE2e, Some(exportOracle)),
    QueryDef("e2_export_csv_e2e", exportCsvE2e, Some(exportCsvOracle)),
    QueryDef("e3_export_parquet_e2e", exportParquetE2e, Some(exportParquetOracle)),
    QueryDef("e4_export_jsonl_e2e", exportJsonlE2e, Some(exportJsonlOracle)),
    QueryDef("e5_export_csv_gzip_e2e", exportCsvGzipE2e, Some(exportCsvOracle)),
    QueryDef("e8_export_csv_zstd_e2e", exportCsvZstdE2e, Some(exportCsvZstdOracle)),
    QueryDef("e6_export_xlsx_sheets_e2e", exportXlsxSheetsE2e, Some(exportXlsxSheetsOracle)),
    QueryDef("e7_export_partitioned_e2e", exportPartitionedE2e,
      Some(exportPartitionedOracle)),
    QueryDef("i11_ingest_fwf_e2e", ingestFwfE2e, Some(ingestFwfOracle)),
    QueryDef("i12_ingest_xlsx_all_sheets_e2e", ingestXlsxAllSheetsE2e,
      Some(ingestXlsxAllSheetsOracle)),
    QueryDef("i13_ingest_tgz_e2e", ingestTgzE2e, Some(ingestJsonOracle)),
    QueryDef("i14_flatten_nested", flattenNested, Some(flattenNestedOracle)),
    QueryDef("e9_export_shards_e2e", exportShardsE2e,
      Some(exportShardsOracle)),
    QueryDef("i15_ingest_quoted_newline_e2e", ingestQuotedNewlineE2e,
      Some(ingestQuotedNewlineOracle)),
    QueryDef("i16_ingest_warc_e2e", ingestWarcE2e, Some(ingestWarcOracle)),
    QueryDef("i17_ingest_avro_e2e", ingestAvroE2e, Some(ingestAvroOracle)),
    QueryDef("e10_export_avro_e2e", exportAvroE2e, Some(exportAvroOracle)),
    QueryDef("e11_export_orc_e2e", exportOrcE2e, Some(exportOrcOracle)),
    QueryDef("i18_ingest_corrupt_json_e2e", ingestCorruptJsonE2e,
      Some(ingestCorruptJsonOracle)))
}
