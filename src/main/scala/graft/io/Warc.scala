package graft.io

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) ingest — the container Common Crawl ships, i.e. the
  * on-disk shape of a real 100 TB web corpus (an extension beyond the
  * reference surface; its closest analogue is the folder-poll ingest at
  * box_ingest.py:44-50 which never parses container formats).
  *
  * Spark-first record splitting: a Hadoop `TextInputFormat` with the
  * record delimiter set to the WARC record separator
  * (`\r\n\r\nWARC/1.0\r\n`) — each input split yields whole records, so
  * a 1 GiB .warc shard parses fully distributed with no driver pass and
  * files larger than one split still chunk on record boundaries (Hadoop
  * scans to the first delimiter past each split start). Header parsing
  * is a per-record flatMap; everything downstream is columnar.
  *
  * Payloads are cut to exactly `Content-Length` BYTES (UTF-8 re-encode,
  * so multibyte text survives byte-precise truncation). Binary payloads
  * (gzip bodies, images) do not round-trip through the text decode —
  * this reader targets text records (WET extracts, HTTP text bodies);
  * pair it with [[graft.ext.Multimodal]] for binary media.
  */
object Warc {

  /** One parsed WARC record; `content_length` is the declared header
    * value (-1 when absent/unparsable). */
  final case class WarcRecord(
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_length: Long,
      payload: String)

  private val Delim = "\r\n\r\nWARC/1.0\r\n"
  private val Magic = "WARC/1.0\r\n"

  /** Distributed WARC scan; `path` may be a file, directory, or glob. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", Delim)
    spark.sparkContext.newAPIHadoopFile(path,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text], conf)
      .map(_._2.toString)
      .flatMap(parseSegment)
      .toDF()
  }

  /** Parse one delimiter-split segment into a record. The first segment
    * of each file still carries its own `WARC/1.0\r\n` magic (only
    * inter-record separators are consumed by the delimiter); segments
    * with no header/payload split or an empty header block are dropped,
    * matching the O9 log-and-skip posture for malformed content. */
  def parseSegment(seg0: String): Option[WarcRecord] = {
    val seg = if (seg0.startsWith(Magic)) seg0.substring(Magic.length) else seg0
    val hEnd = seg.indexOf("\r\n\r\n")
    if (hEnd <= 0) return None
    val headers = seg.substring(0, hEnd).split("\r\n").iterator.flatMap { l =>
      val c = l.indexOf(':')
      if (c <= 0) None
      else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
    }.toMap
    if (!headers.contains("warc-type")) return None
    val declared = headers.get("content-length")
      .flatMap(s => s.toLongOption).getOrElse(-1L)
    val raw = seg.substring(hEnd + 4)
    // cut to the declared BYTE length (trailing record CRLFs fall away);
    // when the declaration is absent or overruns, strip the record
    // terminator instead of inventing a length
    val payload =
      if (declared >= 0) {
        val bytes = raw.getBytes(UTF_8)
        if (declared <= bytes.length)
          new String(bytes, 0, declared.toInt, UTF_8)
        else raw.stripSuffix("\r\n\r\n")
      } else raw.stripSuffix("\r\n\r\n")
    Some(WarcRecord(
      headers("warc-type"),
      headers.getOrElse("warc-record-id", ""),
      headers.getOrElse("warc-target-uri", ""),
      headers.getOrElse("warc-date", ""),
      declared, payload))
  }

  /** Columnar HTTP split for `response` records: status code from the
    * status line, body after the first blank line. Pure narrow
    * projection (no UDF) — stays inside whole-stage codegen. */
  def httpParts(df: DataFrame, payload: String = "payload"): DataFrame = {
    val sep = "\r\n\r\n"
    val p: Column = col(payload)
    val pos = instr(p, sep)
    df.withColumn("http_status",
        regexp_extract(p, "^HTTP/1\\.[01] (\\d{3})", 1).cast("int"))
      .withColumn("http_body",
        when(pos > 0, p.substr(pos + 4, length(p))))
  }

  /** Serialize one record (fixture/export side of the same spec). */
  def writeRecord(warcType: String, recordId: String, targetUri: String,
      warcDate: String, payload: String): String = {
    val n = payload.getBytes(UTF_8).length
    val uriLine =
      if (targetUri.isEmpty) "" else s"WARC-Target-URI: $targetUri\r\n"
    s"WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: $recordId\r\n" +
      s"WARC-Date: $warcDate\r\n" +
      uriLine +
      s"Content-Length: $n\r\n" +
      "\r\n" + payload + "\r\n\r\n"
  }
}
