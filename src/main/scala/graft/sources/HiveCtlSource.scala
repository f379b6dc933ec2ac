package graft.sources

import java.util.regex.Pattern

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._

/** `hivectl` — DynamicSerDe rows over TCTLSeparatedProtocol
  * (serde2/dynamic_type/DynamicSerDe.java + serde2/thrift/
  * TCTLSeparatedProtocol.java): plain text lines whose fields split on a
  * configurable `field.delim`, with an optional `quote.delim` REGEX naming
  * quote characters — a quoted region keeps embedded delimiters as one
  * field and sheds its first/last quote char (TCTLSeparatedProtocol.java:
  * 355-364 builds exactly this pattern, :394-420 complexSplit) — and a
  * `serialization.null.format` token that reads back as NULL. input19.q
  * reads an Apache access log through it: `[..]`-bracketed timestamps and
  * `".."`-quoted request lines survive the space delimiter.
  *
  * Scale posture: line-splittable like hivetext (LineRecordReader byte
  * ranges), the tokenizer is a per-line regex with no cross-row state.
  */
class HiveCtlSource extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "hivectl"
  override def toString: String = "HiveCtlText"

  override def inferSchema(sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] = None // schema is DDL-given

  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String], path: Path): Boolean =
    !path.getName.matches(""".*\.(gz|bz2|deflate|snappy|lz4|zst)$""")

  override def supportDataType(dataType: DataType): Boolean = dataType match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         DoubleType | FloatType | BooleanType | DateType | TimestampType => true
    case _ => false // TCTL secondary/map delims: not needed by the battery
  }

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    val sep = HiveCtlSource.fieldDelim(options)
    val nul = HiveCtlSource.nullFormat(options)
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ".txt"
      override def newInstance(path: String, dataSchema: StructType,
          context: TaskAttemptContext): OutputWriter =
        new HiveCtlOutputWriter(path, dataSchema, context, sep, nul)
    }
  }

  override def buildReader(sparkSession: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter], options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val fieldIdx = requiredSchema.fields.map(f => dataSchema.fieldIndex(f.name))
    val fieldTypes = requiredSchema.fields.map(_.dataType)
    val nRequired = fieldIdx.length
    val sep = HiveCtlSource.fieldDelim(options)
    val quote = HiveCtlSource.quoteDelim(options)
    val nul = HiveCtlSource.nullFormat(options)

    (file: PartitionedFile) => {
      val split = new org.apache.hadoop.mapreduce.lib.input.FileSplit(
        file.toPath, file.start, file.length, Array.empty[String])
      val reader = new org.apache.hadoop.mapreduce.lib.input.LineRecordReader()
      val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
        SharedConf.get, new org.apache.hadoop.mapreduce.TaskAttemptID())
      reader.initialize(split, ctx)
      val tok = new HiveCtlSource.Tokenizer(sep, quote)
      new Iterator[InternalRow] {
        private var ready = false
        private var done = false
        private def advance(): Unit =
          if (!ready && !done) {
            if (reader.nextKeyValue()) ready = true
            else { done = true; reader.close() }
          }
        override def hasNext: Boolean = { advance(); ready }
        override def next(): InternalRow = {
          advance()
          if (!ready) throw new NoSuchElementException
          ready = false
          val parts = tok.split(reader.getCurrentValue.toString)
          val row = new GenericInternalRow(nRequired)
          var i = 0
          while (i < nRequired) {
            val src = fieldIdx(i)
            val raw = if (src < parts.length) parts(src) else null
            row.update(i,
              if (raw == null || raw == nul) null
              else HiveTextSource.decode(raw, fieldTypes(i)))
            i += 1
          }
          row
        }
      }
    }
  }

  override def equals(other: Any): Boolean = other.isInstanceOf[HiveCtlSource]
  override def hashCode(): Int = getClass.hashCode()
}

object HiveCtlSource {

  // TCTLSeparatedProtocol defaults (TCTLSeparatedProtocol.java:74-90):
  // primary ^A, null token '\N' unless serialization.null.format overrides
  private[sources] def fieldDelim(options: Map[String, String]): String =
    options.getOrElse("field.delim", "")
  private[sources] def quoteDelim(options: Map[String, String]): Option[String] =
    options.get("quote.delim").filter(_.nonEmpty)
  private[sources] def nullFormat(options: Map[String, String]): String =
    options.getOrElse("serialization.null.format", "\\N")

  /** The reference's tokenizer, ported regex-for-regex: without a quote
    * the line splits on the (regex) separator; with one, the field pattern
    * is TCTLSeparatedProtocol.java:357-359 verbatim and complexSplit
    * (:394-420) strips one leading separator and the surrounding quote
    * chars per match, mapping empty matches to null. */
  private[sources] final class Tokenizer(sep: String, quote: Option[String])
      extends Serializable {
    // the reference embeds the separator as regex TEXT (line 355) — keep
    // that contract (a ' ' or '' separator is regex-inert anyway)
    private val sepQ = sep
    @transient private lazy val plain = Pattern.compile(sepQ)
    @transient private lazy val complex = quote.map { q =>
      Pattern.compile("(?:^|" + sepQ + ")(" + q + "(?:[^" + q + "]+|" +
        q + q + ")*" + q + "|[^" + sepQ + "]*)")
    }
    @transient private lazy val stripSep = Pattern.compile("^" + sepQ)
    @transient private lazy val stripQPre = quote.map(q => Pattern.compile("^" + q))
    @transient private lazy val stripQPost = quote.map(q => Pattern.compile(q + "$"))

    def split(line: String): Array[String] = complex match {
      case None => plain.split(line, -1)
      case Some(p) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        val m = p.matcher(line)
        while (m.find()) {
          var hit = m.group()
          if (hit.isEmpty) out += null
          else {
            if (stripSep.matcher(hit).find()) hit = hit.substring(1)
            if (hit.nonEmpty && stripQPre.get.matcher(hit).find())
              hit = hit.substring(1)
            if (hit.nonEmpty && stripQPost.get.matcher(hit).find())
              hit = hit.substring(0, hit.length - 1)
            out += hit
          }
        }
        out.toArray
    }
  }
}

private class HiveCtlOutputWriter(path: String, dataSchema: StructType,
    context: TaskAttemptContext, sep: String, nul: String)
    extends OutputWriter {
  private val out = {
    val p = new Path(path)
    p.getFileSystem(context.getConfiguration).create(p, true)
  }
  private val types = dataSchema.fields.map(_.dataType)

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append(sep)
      sb.append(if (row.isNullAt(i)) nul
        else HiveTextSource.encode(row, i, types(i)))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString.getBytes("UTF-8"))
  }

  override def close(): Unit = out.close()
  override def path(): String = path
}
