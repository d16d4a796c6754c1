package graft.io

import java.io.{InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** Minimal xlsx reader/writer (reference O8 `pd.read_excel`
  * box_ingest.py:152-156 and O27 `pdf.to_excel` box_export.py:42-46).
  *
  * No Excel library ships in /opt/spark/jars, and an xlsx file is just a
  * zip of XML parts, so this implements the slice of SpreadsheetML the
  * reference exercises with JDK-only zip + StAX:
  *   reader: sheet selection by name / first / ALL sheets, skiprows,
  *           shared strings, inline strings, booleans, date-styled
  *           serials (1900 and 1904 systems), raw numeric text
  *   writer: one sheet, header row + data rows, inline strings / numbers
  * Everything else (styles, formulas, 1900-date serials) is out of scope
  * and surfaces as the raw stored text.
  */
object Xlsx {

  // ------------------------------------------------------------- reader

  /** All cell values as strings (None = empty cell), row-major, after
    * dropping `skipRows` leading rows. Sheet chosen by name, else the
    * first sheet (pandas default sheet_name=0).
    */
  def read(path: Path, sheetName: Option[String], skipRows: Int): Seq[Seq[Option[String]]] = {
    val zf = new ZipFile(path.toFile)
    try {
      val wb = readWorkbook(zf) // sheets in workbook order + date system
      val target = sheetName match {
        case Some(n) => wb.sheets.find(_._1 == n).getOrElse(
          throw new IllegalArgumentException(
            s"sheet '$n' not found; have ${wb.sheets.map(_._1).mkString(", ")}"))._2
        case None => wb.sheets.head._2
      }
      val shared = readSharedStrings(zf)
      val rows = readSheet(zf, target, shared, readDateStyles(zf), wb.date1904)
      rows.drop(skipRows)
    } finally zf.close()
  }

  /** EVERY sheet, in workbook order, as (name, rows-after-skip) pairs —
    * the reference passes `sheet_name` verbatim to pd.read_excel
    * (box_ingest.py:152-156), where `sheet_name=None` means all sheets;
    * this is that mode's engine primitive. Shared strings and styles are
    * parsed once and reused across sheets. */
  def readAllSheets(path: Path, skipRows: Int): Seq[(String, Seq[Seq[Option[String]]])] = {
    val zf = new ZipFile(path.toFile)
    try {
      val wb = readWorkbook(zf)
      val shared = readSharedStrings(zf)
      val styles = readDateStyles(zf)
      wb.sheets.map { case (name, part) =>
        name -> readSheet(zf, part, shared, styles, wb.date1904).drop(skipRows)
      }
    } finally zf.close()
  }

  /** Per-cellXf flag: is the style a date/time number format? Excel
    * stores dates as serial NUMBERS; only the style says "date". The
    * reference's pandas/openpyxl path converts such cells to datetimes
    * (box_ingest.py:152-156), so a reader that surfaced the raw serial
    * would flunk every date-typed validation cast downstream. Builtin
    * date format ids plus custom formats containing y/m/d/h/s codes
    * (outside quoted literals and [] sections) count as dates.
    */
  private def readDateStyles(zf: ZipFile): IndexedSeq[Boolean] = {
    if (zf.getEntry("xl/styles.xml") == null) return Vector.empty
    val builtinDate = (14 to 22).toSet ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)
    def isDateCode(code: String): Boolean = {
      val cleaned = code
        .replaceAll("\"[^\"]*\"", "") // quoted literals
        .replaceAll("\\[[^\\]]*\\]", "") // color/locale sections
      cleaned.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
    }
    withPart(zf, "xl/styles.xml") { r =>
      val customDate = scala.collection.mutable.Set[Int]()
      val xfs = ArrayBuffer.empty[Boolean]
      var inCellXfs = false
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            val id = Option(r.getAttributeValue(null, "numFmtId"))
              .flatMap(_.toIntOption)
            val code = Option(r.getAttributeValue(null, "formatCode"))
            if (id.isDefined && code.exists(isDateCode)) customDate += id.get
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            val fmt = Option(r.getAttributeValue(null, "numFmtId"))
              .flatMap(_.toIntOption).getOrElse(0)
            xfs += (builtinDate.contains(fmt) || customDate.contains(fmt))
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
      xfs.toIndexedSeq
    }
  }

  /** Excel serial day number -> "yyyy-MM-dd HH:mm:ss". Default 1900 date
    * system: epoch 1899-12-30 absorbs Excel's phantom 1900-02-29. Mac-
    * authored workbooks set `workbookPr date1904` and count from
    * 1904-01-01 with no phantom day — ignoring the flag shifts every
    * date by 1462 days. Matches what str() of the pandas datetime feeds
    * the reference's validators. */
  private[io] def serialToDateTime(serial: Double, date1904: Boolean = false): String = {
    val epoch =
      if (date1904) java.time.LocalDate.of(1904, 1, 1).atStartOfDay()
      else java.time.LocalDate.of(1899, 12, 30).atStartOfDay()
    val secs = math.round(serial * 86400.0)
    epoch.plusSeconds(secs).format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  private final case class Workbook(sheets: Seq[(String, String)], date1904: Boolean)

  /** Sheet (name -> worksheet part) pairs in workbook order, resolving
    * r:id through workbook.xml.rels, plus the workbookPr date1904 flag. */
  private def readWorkbook(zf: ZipFile): Workbook = {
    val rels = withPart(zf, "xl/_rels/workbook.xml.rels") { r =>
      val m = scala.collection.mutable.Map[String, String]()
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val t = r.getAttributeValue(null, "Target")
          m(id) = if (t.startsWith("/")) t.drop(1)
                  else if (t.startsWith("xl/")) t else s"xl/$t"
        }
      }
      m.toMap
    }
    withPart(zf, "xl/workbook.xml") { r =>
      val out = ListBuffer.empty[(String, String)]
      var date1904 = false
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT) r.getLocalName match {
          case "sheet" =>
            val name = r.getAttributeValue(null, "name")
            val rid = (0 until r.getAttributeCount)
              .find(i => r.getAttributeLocalName(i) == "id")
              .map(r.getAttributeValue).getOrElse(
                throw new IllegalStateException("sheet without r:id"))
            out += name -> rels(rid)
          case "workbookPr" =>
            date1904 = Option(r.getAttributeValue(null, "date1904"))
              .exists(v => v == "1" || v.equalsIgnoreCase("true"))
          case _ =>
        }
      }
      Workbook(out.toSeq, date1904)
    }
  }

  private def readSharedStrings(zf: ZipFile): IndexedSeq[String] = {
    if (zf.getEntry("xl/sharedStrings.xml") == null) return Vector.empty
    withPart(zf, "xl/sharedStrings.xml") { r =>
      val out = ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inSi = false
      var inT = false
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; sb.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += sb.toString
            case _ =>
          }
        case _ =>
      }
      out.toIndexedSeq
    }
  }

  private def readSheet(zf: ZipFile, part: String,
      shared: IndexedSeq[String],
      dateStyle: IndexedSeq[Boolean],
      date1904: Boolean): Seq[Seq[Option[String]]] = {
    withPart(zf, part) { r =>
      val rows = ListBuffer.empty[ArrayBuffer[Option[String]]]
      var cur: ArrayBuffer[Option[String]] = null
      var cellCol = -1
      var cellType = ""
      var cellDate = false
      var inV = false
      var inIs = false
      val text = new StringBuilder
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => cur = ArrayBuffer.empty
          case "c" =>
            cellCol = Option(r.getAttributeValue(null, "r"))
              .map(colIndex).getOrElse(cur.length)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            cellDate = Option(r.getAttributeValue(null, "s"))
              .flatMap(_.toIntOption).exists(i =>
                i >= 0 && i < dateStyle.length && dateStyle(i))
            text.clear()
          case "v" => inV = true
          case "is" => inIs = true
          case "t" if inIs => inV = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inV => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" => inV = false
          case "t" if inIs => inV = false
          case "is" => inIs = false
          case "c" =>
            val raw = text.toString
            val value: Option[String] =
              if (raw.isEmpty) None // incl. t="s" with absent/empty <v>
              else cellType match {
                case "s" => raw.trim.toIntOption.flatMap(shared.lift)
                case "b" => Some(if (raw.trim == "1") "True" else "False")
                case "n" if cellDate =>
                  // date-styled numeric: serial day -> datetime string
                  raw.trim.toDoubleOption.map(serialToDateTime(_, date1904))
                    .orElse(Some(raw))
                case _   => Some(raw) // n, str, inlineStr: stored text as-is
              }
            while (cur.length < cellCol) cur += None
            if (value.isDefined || cur.length == cellCol) {
              if (cur.length == cellCol) cur += value
              else cur(cellCol) = value
            }
          case "row" => rows += cur; cur = null
          case _ =>
        }
        case _ =>
      }
      rows.map(_.toSeq).toSeq
    }
  }

  /** "BC7" -> 0-based column index 54. */
  private[io] def colIndex(cellRef: String): Int = {
    var i = 0
    var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def withPart[A](zf: ZipFile, name: String)(f: XMLStreamReader => A): A = {
    val entry = Option(zf.getEntry(name)).getOrElse(
      throw new IllegalArgumentException(s"missing xlsx part: $name"))
    val in = zf.getInputStream(entry)
    val fac = XMLInputFactory.newInstance()
    fac.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    fac.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = fac.createXMLStreamReader(in, "UTF-8")
    try f(r) finally { r.close(); in.close() }
  }

  // ------------------------------------------------------------- writer

  /** One sheet's content for [[writeSheets]]: name, header row, and a
    * LAZY row source — materialized only when that sheet streams out, so
    * a multi-sheet workbook holds one partition of one query at a time. */
  final case class SheetSource(name: String, header: Seq[String],
      rows: () => Iterator[Seq[Any]])

  /** Stream rows to a single-sheet xlsx (the reference's surface —
    * box_export.py:42-46 writes one sheet). See [[writeSheets]]. */
  def write(out: OutputStream, sheetName: String, header: Seq[String],
      rows: Iterator[Seq[Any]]): Unit =
    writeSheets(out, Seq(SheetSource(sheetName, header, () => rows)))

  /** Stream a MULTI-SHEET xlsx. Strings become inline strings; numbers
    * (Byte..Double, BigDecimal) become numeric cells; null => empty
    * cell; anything else (dates, timestamps) its toString — the export
    * path renders query output, not typed spreadsheets. Sheets are
    * written in order, each row source opened lazily as its sheet
    * begins (driver memory stays one-partition-sized per sheet).
    */
  def writeSheets(out: OutputStream, sheets: Seq[SheetSource]): Unit = {
    require(sheets.nonEmpty, "xlsx needs at least one sheet")
    require(sheets.map(_.name).distinct.length == sheets.length,
      s"duplicate sheet names: ${sheets.map(_.name).mkString(", ")}")
    val z = new ZipOutputStream(out, StandardCharsets.UTF_8)
    def part(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    val idx = sheets.indices.map(_ + 1) // 1-based sheet/rel ids
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |""".stripMargin +
      idx.map(i =>
        s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        .mkString("\n") +
      "\n</Types>")
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>""".stripMargin +
      sheets.zip(idx).map { case (s, i) =>
        s"""<sheet name="${escape(s.name)}" sheetId="$i" r:id="rId$i"/>""" }
        .mkString +
      "</sheets>\n</workbook>")
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |""".stripMargin +
      idx.map(i =>
        s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
        .mkString("\n") +
      "\n</Relationships>")

    sheets.zip(idx).foreach { case (sheet, i) =>
      z.putNextEntry(new ZipEntry(s"xl/worksheets/sheet$i.xml"))
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(z, StandardCharsets.UTF_8))
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      def writeRow(values: Seq[Any]): Unit = {
        w.write("<row>")
        values.foreach {
          case null => w.write("<c/>")
          case n: Byte => numCell(w, n.toString)
          case n: Short => numCell(w, n.toString)
          case n: Int => numCell(w, n.toString)
          case n: Long => numCell(w, n.toString)
          case n: Float => numCell(w, n.toString)
          case n: Double => numCell(w, n.toString)
          case n: java.math.BigDecimal => numCell(w, n.toPlainString)
          case n: BigDecimal => numCell(w, n.bigDecimal.toPlainString)
          case b: Boolean => w.write(s"""<c t="b"><v>${if (b) 1 else 0}</v></c>""")
          case t: java.sql.Timestamp => // ISO, no trailing ".0" nanos
            val s = t.toLocalDateTime.format(
              java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
            w.write(s"""<c t="inlineStr"><is><t>$s</t></is></c>""")
          case d: java.sql.Date =>
            w.write(s"""<c t="inlineStr"><is><t>$d</t></is></c>""")
          case i: java.time.Instant => // java8API.enabled sessions
            val s = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
              .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
            w.write(s"""<c t="inlineStr"><is><t>$s</t></is></c>""")
          case d: java.time.LocalDate =>
            w.write(s"""<c t="inlineStr"><is><t>$d</t></is></c>""")
          case v => w.write(
            s"""<c t="inlineStr"><is><t xml:space="preserve">${escape(v.toString)}</t></is></c>""")
        }
        w.write("</row>")
      }
      writeRow(sheet.header)
      sheet.rows().foreach(writeRow)
      w.write("</sheetData></worksheet>")
      w.flush()
      z.closeEntry()
    }
    z.finish()
  }

  private def numCell(w: java.io.Writer, v: String): Unit =
    w.write(s"<c><v>$v</v></c>")

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '&' => sb.append("&amp;")
      case '"' => sb.append("&quot;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' =>
        sb.append(' ') // control chars are invalid in XML 1.0
      case c => sb.append(c)
    }
    sb.toString
  }
}
