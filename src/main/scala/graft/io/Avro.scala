package graft.io

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro object-container ingest WITHOUT the spark-avro datasource (not
  * on this classpath) — built from the avro core + avro-mapred jars
  * Spark itself ships. An extension beyond the reference surface
  * (box_ingest.py:148-159 reads csv/json/excel): Avro is the classic
  * row-oriented landing format for streamed/CDC batches at scale.
  *
  * Spark-first splitting, the [[Warc]] discipline applied to a binary
  * container: Avro files carry a 16-byte sync marker between blocks, and
  * `AvroKeyInputFormat` aligns each input split to the next marker — so
  * a multi-GiB container parses fully distributed, no driver pass, and
  * several files glob into one read. The writer schema is read once
  * driver-side from the FIRST container's header (a KB-sized header
  * read, not a data scan) and pinned as the reader schema for every
  * split; mixed-schema directories therefore resolve via Avro's own
  * schema-resolution rules against that pinned schema (or fail loudly),
  * never by silent per-file drift.
  *
  * Supported schema subset (fail-fast on anything else): a top-level
  * RECORD whose field types are primitives (boolean/int/long/float/
  * double/string/bytes), `union[null, T]` nullables, arrays of
  * supported types, and nested records of the same subset — the shapes
  * `DataFrame` represents losslessly. Maps/fixed/enums/multi-branch
  * unions are rejected with the offending path named.
  */
object Avro {

  /** Distributed read of `pathGlob` (a file, directory, or glob of
    * `.avro` object-container files). */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val hPath = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = hPath.getFileSystem(conf)
    val files = {
      val matched = fs.globStatus(hPath) match {
        case null => Array.empty[org.apache.hadoop.fs.FileStatus]
        case m => m
      }
      val fl = matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
        else Array(st)
      }.map(_.getPath).filter(_.getName.endsWith(".avro")).sortBy(_.toString)
      require(fl.nonEmpty, s"Avro.read: no .avro files match $pathGlob")
      fl
    }
    val first = files.head
    val writerSchema = {
      val in = fs.open(first)
      try {
        val dfs = new org.apache.avro.file.DataFileStream[GenericRecord](
          in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
        try dfs.getSchema finally dfs.close()
      } finally scala.util.Try(in.close())
    }
    val sparkSchema = toStructType(writerSchema, writerSchema.getFullName)

    conf.set("avro.schema.input.key", writerSchema.toString)
    val schemaJson = writerSchema.toString
    // Feed the SAME filtered .avro list the schema probe used (comma
    // paths — FileInputFormat.setInputPaths splits on commas), not the
    // raw glob: a plain directory would otherwise enumerate every
    // non-hidden file, and a stray sidecar (schema.json, README) would
    // fail the whole read while the probe saw only .avro files.
    val rdd = spark.sparkContext.newAPIHadoopFile(
        files.map(_.toString).mkString(","),
        classOf[org.apache.avro.mapreduce.AvroKeyInputFormat[GenericRecord]],
        classOf[org.apache.avro.mapred.AvroKey[GenericRecord]],
        classOf[org.apache.hadoop.io.NullWritable],
        conf)
      .mapPartitions { it =>
        // Schema objects are not serializable across tasks in general —
        // re-parse from JSON once per partition. Each record is converted
        // to an immutable Row at pull time, BEFORE the reader's next()
        // overwrites its reused datum instance.
        val schema = new Schema.Parser().parse(schemaJson)
        val rootName = schema.getFullName
        it.map { case (k, _) =>
          toRow(k.datum(), schema, rootName).asInstanceOf[Row]
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Avro → Spark schema for the supported subset; `path` names the
    * offending field in rejection messages. */
  private[io] def toStructType(s: Schema, path: String): StructType = {
    require(s.getType == Schema.Type.RECORD,
      s"Avro.read: $path: top-level type must be RECORD, got ${s.getType}")
    StructType(s.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toDataType(f.schema(), s"$path.${f.name}")
      StructField(f.name, dt, nullable)
    })
  }

  private def toDataType(s: Schema, path: String): (DataType, Boolean) =
    s.getType match {
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.INT     => (IntegerType, false)
      case Schema.Type.LONG    => (LongType, false)
      case Schema.Type.FLOAT   => (FloatType, false)
      case Schema.Type.DOUBLE  => (DoubleType, false)
      case Schema.Type.STRING  => (StringType, false)
      case Schema.Type.BYTES   => (BinaryType, false)
      case Schema.Type.ARRAY   =>
        val (elem, elemNullable) = toDataType(s.getElementType, s"$path[]")
        (ArrayType(elem, containsNull = elemNullable), false)
      case Schema.Type.RECORD  => (toStructType(s, path), false)
      case Schema.Type.UNION   =>
        val branches = s.getTypes.asScala
        val nonNull = branches.filter(_.getType != Schema.Type.NULL)
        require(branches.size == 2 && nonNull.size == 1,
          s"Avro.read: $path: only union[null, T] is supported, " +
            s"got ${s.toString(false)}")
        (toDataType(nonNull.head, path)._1, true)
      case other =>
        throw new IllegalArgumentException(
          s"Avro.read: $path: unsupported Avro type $other")
    }

  private def toRow(rec: GenericRecord, schema: Schema,
      path: String): Row = {
    val fields = schema.getFields.asScala
    Row.fromSeq(fields.toSeq.map(f =>
      toValue(rec.get(f.pos), f.schema(), s"$path.${f.name}")))
  }

  private def toValue(v: Any, s: Schema, path: String): Any = {
    if (v == null) return null
    val eff = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s
    eff.getType match {
      case Schema.Type.STRING => v.toString // Utf8 -> String
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining())
        bb.duplicate().get(out)
        out
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(toValue(_, eff.getElementType, s"$path[]"))
      case Schema.Type.RECORD =>
        toRow(v.asInstanceOf[GenericRecord], eff, path)
      case _ => v // primitives arrive already JVM-typed
    }
  }

  /** Driver-side object-container writer (fixture/export-side twin of
    * [[read]]): standard Avro container with the default null codec —
    * any Avro consumer reads it back. Caller owns record construction. */
  def writeContainer(file: java.nio.file.Path, schema: Schema,
      records: Iterator[GenericRecord]): Unit = {
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema))
    try {
      w.create(schema, file.toFile)
      records.foreach(w.append)
    } finally w.close()
  }

  /** Spark → Avro schema for the same subset [[toStructType]] accepts
    * (records of primitives, nullable fields as union[null, T], arrays,
    * nested structs); rejects anything else naming the path. */
  private[io] def fromStructType(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val base = fromDataType(f.dataType, s"${name}_${f.name}")
      val sch =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(f.name, sch, null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false,
      java.util.Arrays.asList(fields: _*))
  }

  private def fromDataType(dt: DataType, path: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case ArrayType(elem, _) =>
      Schema.createArray(fromDataType(elem, s"${path}_item"))
    case st: StructType => fromStructType(st, path)
    case other =>
      throw new IllegalArgumentException(
        s"Avro.write: $path: unsupported Spark type ${other.sql}")
  }

  private def toAvroValue(v: Any, s: Schema): Any = {
    if (v == null) return null
    val eff = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s
    eff.getType match {
      case Schema.Type.BYTES =>
        java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.ARRAY =>
        val elem = eff.getElementType
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(toAvroValue(_, elem)).asJava
      case Schema.Type.RECORD =>
        val row = v.asInstanceOf[Row]
        val rec = new org.apache.avro.generic.GenericData.Record(eff)
        eff.getFields.asScala.foreach(f =>
          rec.put(f.pos, toAvroValue(row.get(f.pos), f.schema())))
        rec
      case _ => v
    }
  }

  /** DISTRIBUTED Avro export — the bulk path: every partition writes its
    * own object container through the Hadoop FileSystem API (works on
    * local paths and HDFS alike); the driver never sees a row. The twin
    * of the partitioned parquet/csv bulk exports: same subset contract
    * as [[read]], so an exported directory round-trips through this
    * module and any Avro consumer. `dir` must not already contain part
    * files (caller owns lifecycle — the TableSink claim discipline).
    * Task commit is the Hadoop temp-write+rename pattern: each attempt
    * writes a dot-prefixed attempt-unique temp (hidden from
    * FileInputFormat and from [[read]]'s `.avro` filter) and renames it
    * into the final part name only after a complete close — so a task
    * that dies mid-write leaves a hidden temp, never a truncated
    * `.avro` a later read would treat as data, and a retried attempt
    * commits cleanly instead of colliding with the dead attempt's
    * partial file. A lost rename race (speculative twin already
    * committed the part) deletes its temp and succeeds. */
  def writeDistributed(df: DataFrame, dir: String): Unit = {
    val schema = fromStructType(df.schema, "row")
    val schemaJson = schema.toString
    val conf = new org.apache.hadoop.conf.Configuration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val confBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      val keep = conf.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
      oos.writeObject(keep); oos.close()
      bos.toByteArray
    }
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val sch = new Schema.Parser().parse(schemaJson)
        val tc = org.apache.spark.TaskContext.get()
        val part = f"part-${tc.partitionId()}%05d.avro"
        val c = new org.apache.hadoop.conf.Configuration(false)
        val ois = new java.io.ObjectInputStream(
          new java.io.ByteArrayInputStream(confBytes))
        ois.readObject().asInstanceOf[Array[(String, String)]]
          .foreach { case (k, v) => c.set(k, v) }
        val p = new org.apache.hadoop.fs.Path(dir, part)
        val tmp = new org.apache.hadoop.fs.Path(dir,
          s".$part.attempt-${tc.taskAttemptId()}.tmp")
        val fs = p.getFileSystem(c)
        val out = fs.create(tmp, true) // attempt-unique: safe to clobber
        val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
          new org.apache.avro.generic.GenericDatumWriter[GenericRecord](sch))
        try {
          w.create(sch, out)
          rows.foreach { row =>
            val rec = new org.apache.avro.generic.GenericData.Record(sch)
            sch.getFields.asScala.foreach(f =>
              rec.put(f.pos, toAvroValue(row.get(f.pos), f.schema())))
            w.append(rec)
          }
        } finally w.close()
        // Commit: rename only after a complete close. A lost rename is
        // ONLY benign when a speculative twin already committed the
        // final part — verify that before dropping the temp; a rename
        // that failed for any other reason (transient FS error,
        // permissions) must fail the task loudly, or the partition's
        // rows silently vanish from a "successful" job.
        if (!fs.rename(tmp, p)) {
          if (fs.exists(p)) fs.delete(tmp, false)
          else throw new java.io.IOException(
            s"avro commit: rename $tmp -> $p failed and no committed " +
              "part exists")
        }
        ()
      }
    }
  }
}
