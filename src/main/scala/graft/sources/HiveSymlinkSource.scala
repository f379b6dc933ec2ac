package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._

/** `hivesymlink` — SymlinkTextInputFormat (ref ql/io/SymlinkTextInputFormat
  * .java:1, symlink_text_input_format.q): each file in the table directory
  * is a MANIFEST whose lines are paths to the real Hive-text data files.
  * Reading the table reads every target of every manifest with
  * LazySimpleSerDe's row codec (shared with [[HiveTextSource]]).
  *
  * Scale posture: one task per MANIFEST (manifests are not splittable —
  * the reference computes one split per target instead; at engine scale a
  * manifest naming many large files should be split into many manifests,
  * which is also the reference's deployment guidance for symlink tables).
  * The write side is the plain IgnoreKeyTextOutputFormat, i.e. delegate to
  * hivetext writers — matching `STORED AS INPUTFORMAT SymlinkTextInputFormat
  * OUTPUTFORMAT IgnoreKeyTextOutputFormat`.
  */
class HiveSymlinkSource extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "hivesymlink"
  override def toString: String = "HiveSymlinkText"

  override def inferSchema(sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] = None

  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String], path: Path): Boolean = false

  override def supportDataType(dataType: DataType): Boolean =
    new HiveTextSource().supportDataType(dataType)

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory =
    new HiveTextSource().prepareWrite(sparkSession, job, options, dataSchema)

  override def buildReader(sparkSession: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter], options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val fieldIdx = requiredSchema.fields.map(f => dataSchema.fieldIndex(f.name))
    val fieldTypes = requiredSchema.fields.map(_.dataType)
    val nRequired = fieldIdx.length
    val sep = options.getOrElse("sep", HiveText.FieldDelim)

    (file: PartitionedFile) => {
      val conf = SharedConf.get
      val manifest = file.toPath
      val fs = manifest.getFileSystem(conf)
      val targets = {
        val in = fs.open(manifest)
        val text = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
          new String(out.toByteArray, "UTF-8")
        } finally in.close()
        text.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      }
      targets.iterator.flatMap { t =>
        val p = new Path(t)
        val tfs = p.getFileSystem(conf)
        val in = tfs.open(p)
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8"))
        new Iterator[String] {
          private var nextLine = reader.readLine()
          override def hasNext: Boolean = {
            if (nextLine == null) reader.close()
            nextLine != null
          }
          override def next(): String = {
            val l = nextLine; nextLine = reader.readLine(); l
          }
        }
      }.map { line =>
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

  override def equals(other: Any): Boolean = other.isInstanceOf[HiveSymlinkSource]
  override def hashCode(): Int = getClass.hashCode()
}
