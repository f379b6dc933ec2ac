package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** `hivehetero` — a table whose PARTITIONS carry heterogeneous file formats.
  *
  * The reference picks the SerDe/InputFormat PER input partition at read
  * time (MapOperator.java:62 — each path's PartitionDesc names its own
  * format), so one table can hold text partitions written before an
  * `ALTER TABLE ... SET FILEFORMAT RCFILE` next to RCFile partitions
  * written after it (partition_wise_fileformat.q 1-7,
  * alter_partition_format_loc.q). Spark datasource tables bind ONE
  * FileFormat per table, so the graft surface converts an altered table to
  * this dispatching format:
  *
  *  - WRITES go to the table's CURRENT format — the `graft.hetero.write`
  *    storage option, updated by each ALTER ... SET FILEFORMAT. Hive 0.8
  *    semantics (partition_wise_fileformat3.q.out golden): INSERT OVERWRITE
  *    of an EXISTING partition re-creates its descriptor from the table,
  *    i.e. the current format wins — so one OutputWriterFactory per write
  *    job is exactly right, no per-partition write dispatch exists to miss.
  *  - READS dispatch per FILE on content, not metadata: the container
  *    formats are self-describing (parquet `PAR1`, SequenceFile `SEQ`,
  *    RCFile `SEQ` + `RCFile$KeyBuffer` key class (RCFile.java:100-133
  *    header), anything else = LazySimpleSerDe text). One 256-byte sniff
  *    per file per executor (cached by path) — at 100 TB that is one tiny
  *    read ahead of each multi-GB scan task, and partition pruning still
  *    happens BEFORE the dispatch because pruning is directory-level,
  *    driver-side, format-agnostic.
  *
  * Splits stay enabled: every dispatched reader is itself split-aware
  * (text by line, seq/rc by sync marker, parquet by row group), so a
  * mixed-format table still scans with full task parallelism.
  */
class HiveHeteroSource extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "hivehetero"
  override def toString: String = "HiveHetero"

  override def inferSchema(sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] = None // schema is DDL-given

  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String], path: Path): Boolean =
    // the only non-splittable member is whole-file-compressed text; every
    // container format resyncs inside a byte range
    !path.getName.matches(""".*\.(gz|bz2|deflate|snappy|lz4|zst)$""")

  override def supportDataType(dataType: DataType): Boolean =
    new HiveTextSource().supportDataType(dataType)

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    val fmt = options.getOrElse(HiveHeteroSource.WriteFormatKey, "textfile")
    HiveHeteroSource.writerFor(fmt)
      .prepareWrite(sparkSession, job, options, dataSchema)
  }

  override def buildReaderWithPartitionValues(sparkSession: SparkSession,
      dataSchema: StructType, partitionSchema: StructType,
      requiredSchema: StructType, filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    // build all four delegate readers ON THE DRIVER (they close over plain
    // values / broadcast confs); per-file dispatch happens in the task
    val text = new HiveTextSource().buildReaderWithPartitionValues(
      sparkSession, dataSchema, partitionSchema, requiredSchema, filters,
      options, hadoopConf)
    val seq = new HiveSeqSource().buildReaderWithPartitionValues(
      sparkSession, dataSchema, partitionSchema, requiredSchema, filters,
      options, hadoopConf)
    val rc = new HiveRCSource().buildReaderWithPartitionValues(
      sparkSession, dataSchema, partitionSchema, requiredSchema, filters,
      options, hadoopConf)
    // partitions written BEFORE the table's first SET FILEFORMAT are the
    // session-default parquet provider's files — still readable after the
    // conversion (alter_partition_format_loc.q's pre-alter data)
    val parquet = new ParquetFileFormat().buildReaderWithPartitionValues(
      sparkSession, dataSchema, partitionSchema, requiredSchema, filters,
      options, hadoopConf)
    val resultSchema = StructType(requiredSchema.fields ++ partitionSchema.fields)

    (file: PartitionedFile) => {
      HiveHeteroSource.formatOf(file.toPath) match {
        case "rcfile" => rc(file)
        case "sequencefile" => seq(file)
        case "parquet" =>
          // the parquet delegate may emit ColumnarBatch (vectorized) or
          // non-unsafe rows — flatten + project to match the row contract
          // the other delegates honor
          val toUnsafe = UnsafeProjection.create(resultSchema)
          parquet(file).asInstanceOf[Iterator[AnyRef]].flatMap {
            case b: ColumnarBatch =>
              import scala.jdk.CollectionConverters._
              b.rowIterator().asScala.map(toUnsafe)
            case r: InternalRow => Iterator.single(toUnsafe(r))
          }
        case _ => text(file)
      }
    }
  }

  override def equals(other: Any): Boolean = other.isInstanceOf[HiveHeteroSource]
  override def hashCode(): Int = getClass.hashCode()
}

object HiveHeteroSource {

  /** Storage-properties key holding the table's CURRENT write format —
    * what `ALTER TABLE ... SET FILEFORMAT` last declared. */
  val WriteFormatKey = "graft.hetero.write"

  /** Hive's ALTER ... SET FILEFORMAT operand → the graft FileFormat that
    * writes it (Hive.g tableFileFormat keywords). */
  def writerFor(fmt: String): FileFormat = normalize(fmt) match {
    case "sequencefile" => new HiveSeqSource()
    case "rcfile" => new HiveRCSource()
    case _ => new HiveTextSource()
  }

  def normalize(fmt: String): String = fmt.toLowerCase match {
    case "textfile" | "text" => "textfile"
    case "sequencefile" | "seq" => "sequencefile"
    case "rcfile" | "rc" => "rcfile"
    case other => throw new IllegalArgumentException(
      s"ALTER TABLE SET FILEFORMAT: unsupported format $other " +
        "(TEXTFILE | SEQUENCEFILE | RCFILE)")
  }

  // per-executor sniff cache; bounded so a long-lived executor scanning
  // ever-new files can't grow it without limit
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Identify a file's container format from its leading bytes: `PAR1`
    * (parquet), `SEQ` + RCFile.KeyBuffer key class (RCFile.java:100-133
    * writes the SequenceFile-style header with its own key class name),
    * bare `SEQ` (SequenceFile), else LazySimpleSerDe text. */
  def formatOf(path: Path): String = {
    val key = path.toString
    val hit = cache.get(key)
    if (hit != null) return hit
    val fmt = sniff(path)
    if (cache.size > 8192) cache.clear()
    cache.put(key, fmt)
    fmt
  }

  private def sniff(path: Path): String = {
    val fs = path.getFileSystem(SharedConf.get)
    val in = fs.open(path)
    try {
      val buf = new Array[Byte](256)
      var off = 0
      var n = 0
      while (off < buf.length && n >= 0) {
        n = in.read(buf, off, buf.length - off)
        if (n > 0) off += n
      }
      val head = new String(buf, 0, off, "ISO-8859-1")
      if (head.startsWith("PAR1")) "parquet"
      else if (head.startsWith("SEQ")) {
        if (head.contains("RCFile$KeyBuffer")) "rcfile" else "sequencefile"
      } else "textfile"
    } finally in.close()
  }
}
