package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `hiveregex` — the contrib RegexSerDe as a real FileFormat
  * (ref contrib/src/java/org/apache/hadoop/hive/contrib/serde2/RegexSerDe
  * .java:1; `ROW FORMAT SERDE '...RegexSerDe' WITH SERDEPROPERTIES
  * ("input.regex" = ..., "output.format.string" = ...)` resolves here via
  * HiveQl's serde rewrite).
  *
  * Read semantics (RegexSerDe.deserialize):
  *  - the pattern compiles with DOTALL (+ CASE_INSENSITIVE when
  *    `input.regex.case.insensitive` = true) and must match the WHOLE line;
  *  - an unmatched line yields a null row, which the reference's map task
  *    skips — here the line is skipped at the reader;
  *  - column `c` is capture group `c + 1`; a group index past the pattern's
  *    group count reads null (the partial-match branch);
  *  - all columns must be STRING (SerDeException otherwise — enforced at
  *    CREATE by the dialect rewrite and again here at plan time).
  *
  * Write semantics (RegexSerDe.serialize): rows format through
  * `output.format.string` via java.util.Formatter; absent that property
  * the write fails loudly, like the reference's SerDeException.
  *
  * Scale posture: line-based and splittable like hivetext — the regex is
  * compiled ONCE per task, matching per line with no per-row allocation
  * beyond the row itself.
  */
class HiveRegexSource extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "hiveregex"
  override def toString: String = "HiveRegexText"

  override def inferSchema(sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] = None // schema is DDL-given

  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String], path: Path): Boolean =
    !path.getName.matches(""".*\.(gz|bz2|deflate|snappy|lz4|zst)$""")

  // RegexSerDe.initialize: "only accepts string columns"
  override def supportDataType(dataType: DataType): Boolean =
    dataType == StringType

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    val fmt = options.getOrElse("output.format.string",
      throw new IllegalStateException(
        "RegexSerDe table has no \"output.format.string\" serde property" +
          " — cannot write"))
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ".txt"
      override def newInstance(path: String, dataSchema: StructType,
          context: TaskAttemptContext): OutputWriter =
        new HiveRegexOutputWriter(path, dataSchema, context, fmt)
    }
  }

  override def buildReader(sparkSession: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter], options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val regex = options.getOrElse("input.regex",
      throw new IllegalStateException(
        "This table does not have serde property \"input.regex\"!"))
    val caseInsensitive =
      options.get("input.regex.case.insensitive").exists(_.equalsIgnoreCase("true"))
    val fieldIdx = requiredSchema.fields.map(f => dataSchema.fieldIndex(f.name))
    val nRequired = fieldIdx.length

    (file: PartitionedFile) => {
      val pattern = java.util.regex.Pattern.compile(regex,
        java.util.regex.Pattern.DOTALL |
          (if (caseInsensitive) java.util.regex.Pattern.CASE_INSENSITIVE else 0))
      val split = new org.apache.hadoop.mapreduce.lib.input.FileSplit(
        file.toPath, file.start, file.length, Array.empty[String])
      val reader = new org.apache.hadoop.mapreduce.lib.input.LineRecordReader()
      val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
        SharedConf.get, new org.apache.hadoop.mapreduce.TaskAttemptID())
      reader.initialize(split, ctx)
      new Iterator[InternalRow] {
        private var row: InternalRow = _
        private var done = false
        private def advance(): Unit =
          while (row == null && !done) {
            if (!reader.nextKeyValue()) { done = true; reader.close() }
            else {
              val m = pattern.matcher(reader.getCurrentValue.toString)
              if (m.matches()) { // unmatched rows are skipped, not nulled
                val out = new GenericInternalRow(nRequired)
                var i = 0
                while (i < nRequired) {
                  val g = fieldIdx(i) + 1 // column c = capture group c+1
                  val v = if (g > m.groupCount()) null else m.group(g)
                  out.update(i,
                    if (v == null) null else UTF8String.fromString(v))
                  i += 1
                }
                row = out
              }
            }
          }
        override def hasNext: Boolean = { advance(); row != null }
        override def next(): InternalRow = {
          advance()
          if (row == null) throw new NoSuchElementException
          val r = row; row = null; r
        }
      }
    }
  }

  override def equals(other: Any): Boolean = other.isInstanceOf[HiveRegexSource]
  override def hashCode(): Int = getClass.hashCode()
}

/** RegexSerDe.serialize: `String.format(outputFormatString, fields...)`,
  * one formatted line per row (null fields print as Formatter renders
  * them — "null", the reference behavior).
  */
private class HiveRegexOutputWriter(val path: String, dataSchema: StructType,
    context: TaskAttemptContext, fmt: String) extends OutputWriter {
  private val out = {
    val p = new Path(path)
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      p.getFileSystem(context.getConfiguration).create(p, false), "UTF-8"))
  }
  override def write(row: InternalRow): Unit = {
    val args = new Array[Object](dataSchema.length)
    var i = 0
    while (i < dataSchema.length) {
      args(i) = if (row.isNullAt(i)) null else row.getUTF8String(i).toString
      i += 1
    }
    out.write(String.format(fmt, args: _*))
    out.write("\n")
  }
  override def close(): Unit = out.close()
}
