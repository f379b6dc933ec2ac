package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.io.{BytesWritable, NullWritable, SequenceFile, Text, Writable}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._

/** `hiveseq` — `CREATE TABLE ... STORED AS SEQUENCEFILE` resolves here: the
  * reference's SequenceFile table layout (HiveSequenceFileOutputFormat
  * .java:40-43 — empty BytesWritable key, the LazySimpleSerDe-coded row as
  * the Text value) behind a real Spark FileFormat. Rows share hivetext's
  * exact field codec ([[HiveTextSource.decode]]/[[HiveTextSource.encode]]:
  * ^A fields, `\N` nulls, '' is the empty STRING), so a table written here
  * byte-matches what the reference's SEQUENCEFILE tables hold.
  *
  * Scale posture: SequenceFiles are sync-marker splittable — Hadoop's own
  * SequenceFileRecordReader supplies the boundary semantics, so a 10 GB
  * table file reads as many tasks. The reader is KEY-AGNOSTIC (the
  * reference's files carry BytesWritable keys, QTestUtil fixtures Text):
  * the row is whichever side is Text; a NullWritable value falls back to
  * the key side (HiveLoad.readTable's contract).
  */
class HiveSeqSource extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "hiveseq"
  override def toString: String = "HiveSequenceFile"

  override def inferSchema(sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] = None // schema is DDL-given

  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String], path: Path): Boolean = true

  override def supportDataType(dataType: DataType): Boolean = dataType match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         DoubleType | FloatType | BooleanType | DateType | TimestampType |
         BinaryType => true
    case _: DecimalType => true
    // LazySimpleSerDe's level separators inside the SequenceFile container
    // (inputddl8.q's thrift-schema table): same row codec as hivetext —
    // the read/write paths already delegate nested fields to
    // HiveTextSource.decode/encode
    case ArrayType(et, _) => supportDataType(et)
    case MapType(kt, vt, _) => supportDataType(kt) && supportDataType(vt)
    case StructType(fs) => fs.forall(f => supportDataType(f.dataType))
    case _ => false
  }

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    // HiveSequenceFileOutputFormat.java: mapred.output.compress selects a
    // compressed container (RECORD or BLOCK per mapred.output.compression
    // .type); SequenceFileRecordReader decompresses on read transparently
    val codec = HiveSeqSource.writeCodec(job.getConfiguration, options)
    val ctype = options.get("compression.type")
      .orElse(Option(job.getConfiguration.get("mapred.output.compression.type")))
      .map(_.toUpperCase) match {
      case Some("BLOCK") => SequenceFile.CompressionType.BLOCK
      case _ => SequenceFile.CompressionType.RECORD
    }
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ".seq"
      override def newInstance(path: String, dataSchema: StructType,
          context: TaskAttemptContext): OutputWriter =
        new HiveSeqOutputWriter(path, dataSchema, context, codec, ctype,
          options.getOrElse("sep", HiveText.FieldDelim))
    }
  }

  override def buildReader(sparkSession: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter], options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val fieldIdx = requiredSchema.fields.map(f => dataSchema.fieldIndex(f.name))
    val fieldTypes = requiredSchema.fields.map(_.dataType)
    val nRequired = fieldIdx.length
    // ROW FORMAT DELIMITED FIELDS TERMINATED BY over SEQUENCEFILE
    // (create_1.q's table4): the delimiter applies to the Text value rows
    val sep = options.getOrElse("sep", HiveText.FieldDelim)

    (file: PartitionedFile) => {
      val lines: Iterator[String] =
        try {
          val split = new org.apache.hadoop.mapreduce.lib.input.FileSplit(
            file.toPath, file.start, file.length, Array.empty[String])
          val reader = new org.apache.hadoop.mapreduce.lib.input
            .SequenceFileRecordReader[Writable, Writable]()
          val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
            SharedConf.get, new org.apache.hadoop.mapreduce.TaskAttemptID())
          reader.initialize(split, ctx)
          new Iterator[String] {
            private var ready = false
            private var done = false
            private def advance(): Unit =
              if (!ready && !done) {
                if (reader.nextKeyValue()) ready = true
                else { done = true; reader.close() }
              }
            override def hasNext: Boolean = { advance(); ready }
            override def next(): String = {
              advance()
              if (!ready) throw new NoSuchElementException
              ready = false
              (reader.getCurrentValue, reader.getCurrentKey) match {
                case (t: Text, _) => t.toString
                case (_: NullWritable, k) => k.toString // row-in-key layout
                case (b: BytesWritable, _) =>
                  new String(b.copyBytes(), "UTF-8")
                case (v, _) => v.toString
              }
            }
          }
        } catch {
          // key/value class not on THIS classpath (reference fixtures carry
          // Hive's own ByteWritable): fall back to the raw record walk —
          // the VALUE side is still plain Text framing (Hadoop wraps the
          // ClassNotFound in IOException via WritableName.getClass)
          case scala.util.control.NonFatal(_) =>
            HiveSeqSource.rawValues(file.toPath, file.start,
              file.start + file.length)
        }
      lines.map { line =>
        val parts = line.split(java.util.regex.Pattern.quote(sep), -1)
        val row = new GenericInternalRow(nRequired)
        var i = 0
        while (i < nRequired) {
          val src = fieldIdx(i)
          val raw = if (src < parts.length) parts(src) else null
          row.update(i,
            if (raw == null || raw == HiveText.NullSequence) null
            else HiveTextSource.decode(raw, fieldTypes(i)))
          i += 1
        }
        row
      }
    }
  }

  override def equals(other: Any): Boolean = other.isInstanceOf[HiveSeqSource]
  override def hashCode(): Int = getClass.hashCode()
}

object HiveSeqSource {

  /** Resolve the write-side compression codec: a `compression` write
    * option (gzip/deflate/bzip2/none), else the reference's own conf
    * names (`mapred.output.compress` + `mapred.output.compression.codec`,
    * HiveIgnoreKeyTextOutputFormat.java / HiveSequenceFileOutputFormat
    * .java) from the job conf — which Spark populates from the SQL conf,
    * so a ported `SET mapred.output.compress=true` just works.
    */
  def writeCodec(conf: Configuration, options: Map[String, String])
      : Option[Class[_ <: org.apache.hadoop.io.compress.CompressionCodec]] = {
    import org.apache.hadoop.io.compress.{BZip2Codec, CompressionCodec, DefaultCodec, GzipCodec}
    options.get("compression").map(_.toLowerCase) match {
      case Some("none") | Some("uncompressed") => None
      case Some("gzip") => Some(classOf[GzipCodec])
      case Some("deflate") | Some("default") => Some(classOf[DefaultCodec])
      case Some("bzip2") => Some(classOf[BZip2Codec])
      case Some(other) => throw new IllegalArgumentException(
        s"unsupported compression '$other' (gzip, deflate, bzip2, none)")
      case None =>
        if (conf.getBoolean("mapred.output.compress", false))
          Some(conf.getClass("mapred.output.compression.codec",
            classOf[DefaultCodec], classOf[CompressionCodec]))
        else None
    }
  }

  /** Raw record walk over an UNCOMPRESSED SequenceFile split whose key
    * class need not be loadable here (the reference's kv1.seq fixtures
    * carry `org.apache.hadoop.hive.ql.exec.ByteWritable` keys). The
    * container layout is Hadoop's own (SEQ6 header; `[-1][16-byte sync]`
    * escapes between records; `[recordLen][keyLen][key][value]` framing) —
    * the key bytes are SKIPPED, the value decodes per the header's declared
    * class (Text vint framing / BytesWritable int framing). Honors the
    * Hadoop split boundary rule via the same sync resync as RCFile.
    */
  def rawValues(path: Path, start: Long, end: Long): Iterator[String] = {
    val fs = path.getFileSystem(SharedConf.get)
    val in = fs.open(path)
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(magic(0) == 'S' && magic(1) == 'E' && magic(2) == 'Q',
      s"not a SequenceFile: ${magic.toSeq}")
    require(magic(3) >= 5, s"SequenceFile version ${magic(3)} too old")
    Text.readString(in) // key class (possibly foreign — never instantiated)
    val valueClass = Text.readString(in)
    val compressed = in.readBoolean()
    val blockCompressed = if (magic(3) >= 4) in.readBoolean() else false
    require(!compressed && !blockCompressed,
      "raw SequenceFile fallback reads uncompressed files only " +
        "(compressed files need their key class loadable)")
    if (magic(3) >= 6) new SequenceFile.Metadata().readFields(in)
    val sync = new Array[Byte](16)
    in.readFully(sync)
    if (start > 4 + 16 &&
        HiveRCFile.seekToSync(in, start, sync) < 0) {
      in.close()
      return Iterator.empty
    }
    val textValue = valueClass == "org.apache.hadoop.io.Text"
    val bytesValue = valueClass == "org.apache.hadoop.io.BytesWritable"
    require(textValue || bytesValue,
      s"raw SequenceFile fallback cannot frame value class $valueClass")
    new Iterator[String] {
      private var nextLen = advance()
      private def advance(): Int =
        try {
          var len = in.readInt()
          while (len == -1) {
            val syncStart = in.getPos - 4
            val s = new Array[Byte](16)
            in.readFully(s)
            require(s.toSeq == sync.toSeq, "SequenceFile: sync mismatch")
            if (syncStart >= end) return -2 // next split owns what follows
            len = in.readInt()
          }
          len
        } catch { case _: java.io.EOFException => -2 }
      override def hasNext: Boolean = {
        if (nextLen == -2) in.close()
        nextLen != -2
      }
      override def next(): String = {
        val keyLen = in.readInt()
        var toSkip = keyLen.toLong
        while (toSkip > 0) {
          val n = in.skip(toSkip)
          require(n > 0, "SequenceFile: EOF inside key"); toSkip -= n
        }
        val valRaw = new Array[Byte](nextLen - keyLen)
        in.readFully(valRaw)
        val vin = new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(valRaw))
        val line =
          if (textValue) {
            val n = org.apache.hadoop.io.WritableUtils.readVInt(vin)
            new String(valRaw, valRaw.length - n, n, "UTF-8")
          } else {
            val n = vin.readInt()
            new String(valRaw, 4, n, "UTF-8")
          }
        nextLen = advance()
        line
      }
    }
  }
}

/** Executor-side writer: the reference table layout — empty BytesWritable
  * key + hivetext-coded Text row (no trailing newline; the container frames
  * records).
  */
private class HiveSeqOutputWriter(val path: String, dataSchema: StructType,
    context: TaskAttemptContext,
    codec: Option[Class[_ <: org.apache.hadoop.io.compress.CompressionCodec]] = None,
    ctype: SequenceFile.CompressionType = SequenceFile.CompressionType.NONE,
    sep: String = HiveText.FieldDelim)
    extends OutputWriter {
  // An explicit CompressionType.NONE when no codec was requested: Hadoop's
  // createWriter otherwise falls back to io.seqfile.compression.type, whose
  // core-default is RECORD — i.e. a zlib Deflater reset+deflate PER RECORD
  // (jstack of q922's 5M-row insert: BuiltInZlibDeflater.compress +
  // CompressorStream.resetState dominated both the write and the readback).
  // The reference writes uncompressed unless hive.exec.compress.output is
  // set (HiveSequenceFileOutputFormat passes the job's compress flag), so
  // NONE is both the faithful and the fast default.
  private val writer = SequenceFile.createWriter(context.getConfiguration,
    (Seq(SequenceFile.Writer.file(new Path(path)),
      SequenceFile.Writer.keyClass(classOf[BytesWritable]),
      SequenceFile.Writer.valueClass(classOf[Text])) ++
      (codec match {
        case Some(c) => Seq(SequenceFile.Writer.compression(ctype,
          org.apache.hadoop.util.ReflectionUtils
            .newInstance(c, context.getConfiguration)))
        case None => Seq(SequenceFile.Writer.compression(
          SequenceFile.CompressionType.NONE))
      })): _*)
  private val types = dataSchema.fields.map(_.dataType)
  private val emptyKey = new BytesWritable()
  private val value = new Text()
  private val sb = new java.lang.StringBuilder

  override def write(row: InternalRow): Unit = {
    sb.setLength(0)
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append(sep)
      if (row.isNullAt(i)) sb.append(HiveText.NullSequence)
      else sb.append(HiveTextSource.encode(row, i, types(i)))
      i += 1
    }
    value.set(sb.toString)
    writer.append(emptyKey, value)
  }

  override def close(): Unit = writer.close()
}
