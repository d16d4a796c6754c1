package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * BINARY columns with typed metadata, and per-record decode/feature
  * extraction runs distributed in fixed-size batches via mapPartitions
  * (the JVM analogue of a batched pandas UDF: amortize model/codec setup
  * across a batch, bound peak memory by batch size).
  *
  * The actual byte decoding is a STUB — no image/audio codecs ship in
  * this container (see `StubCodec`); it derives deterministic
  * pseudo-features from the bytes so the Spark-side contract (schema,
  * batching, partitioning, feature shape) is real and testable. A
  * production deployment replaces StubCodec with a real decoder without
  * touching any plan shape.
  */
object Multimodal {

  /** One media record: payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String,           // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int, height: Int,      // images/video
      sample_rate: Int,             // audio
      source: String)

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      n_frames: Long, // frames the sampler yielded (stub: byte-slices)
      feature: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("content", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("source", StringType)))

  /** ??? in spirit: stands in for libjpeg/ffmpeg/librosa decode. Produces
    * `dim` deterministic floats by folding the payload bytes through a
    * per-dimension rolling hash — same bytes in, same features out. */
  object StubCodec {
    def decodeToFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        var h = 1125899906842597L + d * 2654435761L
        var i = 0
        while (i < bytes.length) { h = h * 31L + bytes(i); i += 1 }
        // murmur fmix64 finalizer: the rolling hash concentrates input
        // entropy in the low bits; avalanche it before truncating to float
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
        h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
        h ^= h >>> 33
        // map to [-1, 1)
        out(d) = ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
        d += 1
      }
      out
    }

    /** Resize stub: nearest-neighbor resampling over the payload treated
      * as a row-major srcW x srcH byte image — deterministic, output
      * length exactly dstW*dstH, missing source bytes read as 0. Stands
      * in for a real decoder+scaler; the Spark-side plumbing (batching,
      * metadata update, schema) is what this exercises. */
    def resize(bytes: Array[Byte], srcW: Int, srcH: Int,
        dstW: Int, dstH: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(0, dstW * dstH))
      if (bytes.isEmpty || srcW <= 0 || srcH <= 0) return out
      var y = 0
      while (y < dstH) {
        val sy = y * srcH / dstH
        var x = 0
        while (x < dstW) {
          val sx = x * srcW / dstW
          val i = sy * srcW + sx
          out(y * dstW + x) = if (i < bytes.length) bytes(i) else 0
          x += 1
        }
        y += 1
      }
      out
    }

    /** Frame sampling stub: `n` evenly-spaced byte-slices stand in for
      * decoded video frames. */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty || n <= 0) return Nil
      val stride = math.max(1, bytes.length / n)
      (0 until math.min(n, bytes.length)).map { i =>
        bytes.slice(i * stride, math.min(bytes.length, i * stride + stride))
      }
    }
  }

  /** Batched distributed feature extraction. `batchSize` bounds the
    * records decoded per inner batch (the mapInPandas batch-shape
    * analogue); `dim` is the embedding dimensionality.
    */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 16,
      batchSize: Int = 64, frames: Int = 4): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // A real codec would init once per batch here (model load, etc.).
        batch.iterator.map { r =>
          MediaFeatures(r.media_id, r.media_type, r.content.length.toLong,
            StubCodec.sampleFrames(r.content, frames).size.toLong,
            StubCodec.decodeToFeatures(r.content, dim))
        }
      }
    }
  }

  /** Batched distributed resize: every record's payload resampled to
    * (w, h) with metadata updated — the decode/transform/rewrite shape
    * of an image-normalization pass. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int,
      batchSize: Int = 64): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          r.copy(
            content = StubCodec.resize(r.content, r.width, r.height, w, h),
            width = w, height = h)
        }
      }
    }
  }

  /** Build a media table from any (id, string payload) source — used by
    * tests and the gate query to exercise the plumbing with the documents
    * table standing in for binary blobs. */
  def fromText(df: DataFrame, id: String, text: String): DataFrame =
    df.select(
      col(id).cast(LongType).as("media_id"),
      lit("image").as("media_type"),
      encode(col(text), "UTF-8").cast(BinaryType).as("content"),
      lit(64).as("width"), lit(64).as("height"),
      lit(0).as("sample_rate"),
      lit("synthetic").as("source"))

  def toDataset(spark: SparkSession, df: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    df.as[MediaRecord]
  }

  /** REAL image metadata extraction (not the stub): parse the container
    * header of each payload — PNG IHDR / JPEG SOF / GIF screen
    * descriptor / BMP info header, see functions.ImageHeaderParse — and
    * add `format`/`width`/`height` columns (NULL for unrecognized
    * payloads). One codegen'd narrow projection: at 100 TB this is the
    * scan-speed metadata pass that partitions a multimodal corpus by
    * shape/format before any real pixel decode is scheduled. */
  def imageDims(df: DataFrame, content: String): DataFrame =
    df.withColumn("__img",
        graft.functions.GraftFunctions.imageHeader(col(content)))
      .withColumn("format", col("__img.format"))
      .withColumn("width", col("__img.width"))
      .withColumn("height", col("__img.height"))
      .drop("__img")

  /** REAL audio/video metadata extraction (not the stub): parse the
    * container header of each payload — WAV RIFF chunks, MP4 box tree,
    * FLAC STREAMINFO, see functions.MediaHeaderParse — and add
    * `format`/`duration_ms`/`sample_rate`/`channels`/`width`/`height`
    * columns (all NULL for unrecognized payloads; per-field NULL where a
    * format has no such notion). One codegen'd narrow projection: the
    * scan-speed cataloging pass that partitions a 100 TB audio/video
    * corpus by duration/rate/shape before any transcode is scheduled. */
  /** PDF catalog projection (functions.PdfMetaParse — codegen'd,
    * scan-speed): version/pages/encrypted/linearized/well_formed
    * columns, NULL for non-PDF payloads. The document-corpus triage
    * pass that routes encrypted or malformed files away from the
    * text-extraction stage before any real PDF library is scheduled. */
  def pdfMeta(df: DataFrame, content: String): DataFrame =
    df.withColumn("__pdf",
        graft.functions.GraftFunctions.pdfMeta(col(content)))
      .withColumn("pdf_version", col("__pdf.version"))
      .withColumn("pages", col("__pdf.pages"))
      .withColumn("encrypted", col("__pdf.encrypted"))
      .withColumn("linearized", col("__pdf.linearized"))
      .withColumn("well_formed", col("__pdf.well_formed"))
      .drop("__pdf")

  /** PDF text extraction (functions.PdfTextExtract — codegen'd, scan
    * speed): the extract stage behind [[pdfMeta]] triage for the
    * classic uncompressed COS layout; NULL for non-PDF payloads, empty
    * for encrypted (ciphertext strings) or compressed-stream documents
    * (those route to a real PDF library). */
  def pdfText(df: DataFrame, content: String): DataFrame =
    df.withColumn("pdf_text",
      graft.functions.GraftFunctions.pdfText(col(content)))

  /** Audio activity triage (functions.WavEnergy — codegen'd, scan
    * speed): per-`windowMs`-window integer mean-|sample| energy of mono
    * 16-bit PCM payloads, reduced to activity metrics against
    * `threshold` — window count, active-window count, active duration.
    * The silence/voice triage pass that routes a 100 TB audio corpus
    * BEFORE any transcription model is scheduled; NULL rows are
    * payloads the zero-dependency PCM decoder cannot read. */
  def audioActivity(df: DataFrame, content: String, windowMs: Int,
      threshold: Long): DataFrame =
    df.withColumn("__wav",
        graft.functions.GraftFunctions.wavEnergy(col(content), windowMs))
      .withColumn("sample_rate", col("__wav.sample_rate"))
      .withColumn("n_windows", size(col("__wav.energies")))
      .withColumn("n_active",
        size(filter(col("__wav.energies"), e => e >= lit(threshold))))
      .withColumn("active_ms", col("n_active").cast("long") * windowMs)
      .drop("__wav")

  /** Perceptual signature projection: 64-bit dHash per payload
    * (functions.DHash64 — codegen'd, scan-speed; NULL for payloads the
    * zero-dependency BMP decoder cannot read). */
  def dHash(df: DataFrame, content: String): DataFrame =
    df.withColumn("dhash",
      graft.functions.GraftFunctions.dhash64(col(content)))

  /** Perceptual image near-duplicate pairs: dHash each payload, then
    * find pairs within `maxDist` Hamming bits via the same pigeonhole
    * chunk plan every 64-bit signature family here uses
    * ([[Dedup.hammingPairs64]]) — candidates come from a chunk
    * equi-join, never N². Undecodable payloads (NULL hash) drop out
    * rather than pairing with each other. At 100 TB this is the
    * image-corpus twin of SimHash text dedup: one codegen'd signature
    * pass, banding, capped buckets. */
  def imageNearDup(df: DataFrame, id: String, content: String,
      maxDist: Int = 8, maxBucketSize: Int = 4096): DataFrame = {
    val sigs = dHash(df, content)
      .where(col("dhash").isNotNull)
      .select(col(id).as("doc_id"), col("dhash").as("sig"))
    Dedup.hammingPairs64(sigs, maxDist, maxBucketSize)
  }

  def mediaMeta(df: DataFrame, content: String): DataFrame =
    df.withColumn("__av",
        graft.functions.GraftFunctions.mediaHeader(col(content)))
      .withColumn("format", col("__av.format"))
      .withColumn("duration_ms", col("__av.duration_ms"))
      .withColumn("sample_rate", col("__av.sample_rate"))
      .withColumn("channels", col("__av.channels"))
      .withColumn("width", col("__av.width"))
      .withColumn("height", col("__av.height"))
      .drop("__av")

  /** Minimal structurally-valid image files for specs and gate fixtures:
    * correct magic/signature, header layout, and dimension encoding per
    * the published container specs. PNG chunk CRCs are zeroed (the
    * header parser, like most fast-path scanners, does not checksum). */
  object SyntheticImages {
    private def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    private def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    private def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    private def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)

    def png(w: Int, h: Int): Array[Byte] =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 6, 0, 0, 0) ++ be32(0) ++            // bit depth etc + crc
        be32(0) ++ "IEND".getBytes ++ be32(0)

    /** JFIF APP0 then an SOF0 frame header — the SOF is NOT the first
      * segment, so parsing must actually walk the marker stream. */
    def jpeg(w: Int, h: Int): Array[Byte] =
      Array[Byte](0xff.toByte, 0xd8.toByte) ++
        Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
        "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++
        Array[Byte](0, 0) ++
        Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++
        be16(h) ++ be16(w) ++ Array[Byte](3,
          1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) ++
        Array[Byte](0xff.toByte, 0xd9.toByte)

    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes ++ le16(w) ++ le16(h) ++
        Array[Byte](0, 0, 0, 0x3b) // flags, bg, aspect, trailer

    /** BITMAPINFOHEADER; `topDown` stores the height negated (the
      * top-down row-order convention the parser must normalize). */
    def bmp(w: Int, h: Int, topDown: Boolean = false): Array[Byte] =
      "BM".getBytes ++ le32(54) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(w) ++ le32(if (topDown) -h else h) ++
        le16(1) ++ le16(24) ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0)

    /** fmix64-style avalanche — a deterministic, well-mixed 64-bit
      * signature per id for fixture construction. */
    def avalanche(v: Long): Long = {
      var h = v * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      h *= 0xc4ceb9fe1a85ec53L; h ^= h >>> 33
      h
    }

    /** 9×8 gradient BMP whose [[graft.functions.DHash64]] is `sig`
      * EXACTLY: row y starts at 128 and steps +8 (bit set) or −8 per
      * cell, so each adjacent-cell comparison reproduces one signature
      * bit and the 9×8 pooling is the identity. */
    def bmpGradient(sig: Long, topDown: Boolean = false): Array[Byte] = {
      val gray = Array.ofDim[Int](8, 9)
      var y = 0
      while (y < 8) {
        gray(y)(0) = 128
        var x = 0
        while (x < 8) {
          val bit = (sig >>> (y * 8 + x)) & 1L
          gray(y)(x + 1) = gray(y)(x) + (if (bit == 1L) 8 else -8)
          x += 1
        }
        y += 1
      }
      bmpGray(gray, topDown)
    }

    /** Complete 24-bpp uncompressed BMP with REAL pixel data: gray(y)(x)
      * in [0,255] is written as R=G=B (rows top-to-bottom in the input;
      * stored bottom-up unless `topDown`). This is the one container the
      * engine can round-trip without codec libraries — fixture input for
      * the perceptual-hash path ([[Multimodal.dHash]]). */
    def bmpGray(gray: Array[Array[Int]], topDown: Boolean = false): Array[Byte] = {
      val h = gray.length
      val w = gray(0).length
      val stride = ((w * 3 + 3) / 4) * 4
      val out = new Array[Byte](54 + stride * h)
      def put(off: Int, bytes: Array[Byte]): Unit =
        System.arraycopy(bytes, 0, out, off, bytes.length)
      put(0, "BM".getBytes)
      put(2, le32(out.length)); put(10, le32(54))
      put(14, le32(40)); put(18, le32(w))
      put(22, le32(if (topDown) -h else h))
      put(26, le16(1)); put(28, le16(24))
      var y = 0
      while (y < h) {
        val dstRow = if (topDown) y else h - 1 - y
        var x = 0
        while (x < w) {
          val v = gray(y)(x).toByte
          val p = 54 + dstRow * stride + x * 3
          out(p) = v; out(p + 1) = v; out(p + 2) = v
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Minimal structurally-valid audio/video files for specs and gate
    * fixtures, per the published container specs. PCM bodies are zero
    * samples; the MP4 has a real `ftyp`+`moov` tree but no `mdat`. */
  object SyntheticMedia {
    private def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    private def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    private def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    private def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)

    /** 16-bit PCM WAV; duration = dataBytes / (rate·ch·2) seconds. */
    def wav(rate: Int, ch: Int, dataBytes: Int): Array[Byte] =
      "RIFF".getBytes ++ le32(36 + dataBytes) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++
        le32(rate) ++ le32(rate * ch * 2) ++ le16(ch * 2) ++ le16(16) ++
        "data".getBytes ++ le32(dataBytes) ++ new Array[Byte](dataBytes)

    /** Mono 16-bit PCM WAV with REAL sample data (little-endian). */
    def wavPcm(rate: Int, samples: Array[Short]): Array[Byte] = {
      val dataBytes = samples.length * 2
      val head = "RIFF".getBytes ++ le32(36 + dataBytes) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(rate) ++ le32(rate * 2) ++ le16(2) ++ le16(16) ++
        "data".getBytes ++ le32(dataBytes)
      val out = new Array[Byte](head.length + dataBytes)
      System.arraycopy(head, 0, out, 0, head.length)
      var s = 0
      while (s < samples.length) {
        out(head.length + s * 2) = samples(s).toByte
        out(head.length + s * 2 + 1) = (samples(s) >> 8).toByte
        s += 1
      }
      out
    }

    /** fLaC + STREAMINFO (last-block flag set): sampleRate(20)
      * channels-1(3) bps-1=15(5) totalSamples(36), big-endian packed. */
    def flac(rate: Int, ch: Int, totalSamples: Long): Array[Byte] = {
      val si = new Array[Byte](34)
      si(0) = 0x10; si(1) = 0; si(2) = 0x10; si(3) = 0 // min/max blocksize 4096
      si(10) = (rate >>> 12).toByte
      si(11) = ((rate >>> 4) & 0xff).toByte
      si(12) = (((rate & 0xf) << 4) | ((ch - 1) << 1) | ((16 - 1) >>> 4)).toByte
      si(13) = ((((16 - 1) & 0xf) << 4) | ((totalSamples >>> 32) & 0xf)).toInt.toByte
      si(14) = ((totalSamples >>> 24) & 0xff).toByte
      si(15) = ((totalSamples >>> 16) & 0xff).toByte
      si(16) = ((totalSamples >>> 8) & 0xff).toByte
      si(17) = (totalSamples & 0xff).toByte
      "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ si
    }

    /** ftyp + moov(mvhd v0 timescale=1000, trak(tkhd v0 with 16.16-fixed
      * display dimensions)); duration field is therefore milliseconds. */
    def mp4(durationMs: Int, w: Int, h: Int): Array[Byte] = {
      val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(512)
      val mvhd = be32(8 + 100) ++ "mvhd".getBytes ++ be32(0) ++ // v0+flags
        be32(0) ++ be32(0) ++ be32(1000) ++ be32(durationMs) ++
        new Array[Byte](80)
      val tkhd = be32(8 + 84) ++ "tkhd".getBytes ++ be32(7) ++ // v0, enabled
        be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(durationMs) ++
        new Array[Byte](52) ++ be32(w << 16) ++ be32(h << 16)
      val trak = be32(8 + tkhd.length) ++ "trak".getBytes ++ tkhd
      val moov = be32(8 + mvhd.length + trak.length) ++ "moov".getBytes ++
        mvhd ++ trak
      ftyp ++ moov
    }
  }

  /** Minimal structurally-valid COS-text PDFs for specs and gate
    * fixtures: real header, catalog → pages tree → one object per page
    * (uncompressed, the classic layout), optional /Linearized first
    * object and /Encrypt trailer entry, `%%EOF` sentinel. */
  object SyntheticDocs {
    def pdf(pages: Int, version: String = "1.4",
        encrypted: Boolean = false, linearized: Boolean = false,
        truncated: Boolean = false,
        pageTexts: Seq[String] = Nil): Array[Byte] = {
      val sb = new StringBuilder
      sb.append(s"%PDF-$version\n")
      if (linearized)
        sb.append("9 0 obj << /Linearized 1 /L 1234 >> endobj\n")
      val kids = (0 until pages).map(i => s"${i + 3} 0 R").mkString(" ")
      sb.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
      sb.append(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $pages >> endobj\n")
      (0 until pages).foreach { i =>
        val contents = if (i < pageTexts.length) s" /Contents ${100 + i} 0 R" else ""
        sb.append(s"${i + 3} 0 obj << /Type /Page /Parent 2 0 R " +
          s"/MediaBox [0 0 612 792]$contents >> endobj\n")
      }
      // Uncompressed content streams: BT/ET text blocks with escaped
      // literal strings shown via Tj / TJ-array operators.
      pageTexts.zipWithIndex.foreach { case (t, i) =>
        val esc = t.replace("\\", "\\\\")
          .replace("(", "\\(").replace(")", "\\)")
        val body = s"BT /F1 12 Tf 72 720 Td ($esc) Tj ET"
        sb.append(s"${100 + i} 0 obj << /Length ${body.length} >>\n" +
          s"stream\n$body\nendstream\nendobj\n")
      }
      sb.append("trailer << /Size " + (pages + 3) + " /Root 1 0 R" +
        (if (encrypted) " /Encrypt 8 0 R" else "") + " >>\n")
      if (!truncated) sb.append("%%EOF\n")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
  }
}
