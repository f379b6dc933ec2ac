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

/** `hiverc` — `CREATE TABLE ... STORED AS RCFILE` (Hive.g:1178
  * KW_STORED KW_AS KW_RCFILE → TOK_TBLRCFILE; rcfile_union.q's
  * `ROW FORMAT SERDE ColumnarSerDe` spelling and rcfile_columnar.q's
  * INPUTFORMAT/OUTPUTFORMAT long form resolve to the same token) behind a
  * real Spark FileFormat over the [[HiveRCFile]] kernel: split-aware reads
  * (byte ranges resync on the sync markers, the RCFileRecordReader
  * contract) and a streaming per-task writer ([[HiveRCFile.StreamWriter]]
  * — one row-group buffered, never the task's whole output). Cells carry
  * the LazySimpleSerDe text encoding, same field codec as hivetext
  * ([[HiveTextSource.decode]]/[[HiveTextSource.encode]], `\N` nulls), so
  * tables written here are reference-interchange RCFiles.
  *
  * Compression: set table/write option `codec=default` for the reference's
  * DefaultCodec (zlib) per-column compression; plain otherwise.
  */
class HiveRCSource extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "hiverc"
  override def toString: String = "HiveRCFile"

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
    // complex columns ride the same LazySimpleSerDe separator ladder the
    // reference's ColumnarSerDe uses per column blob
    // (input_columnarserde.q's array/map columns) — the shared
    // HiveTextSource codec below handles them recursively
    case ArrayType(et, _) => supportDataType(et)
    case MapType(kt, vt, _) => supportDataType(kt) && supportDataType(vt)
    case StructType(fs) => fs.forall(f => supportDataType(f.dataType))
    case _ => false
  }

  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    val codecName = options.get("codec").map {
      case "default" | "zlib" => HiveRCFile.DefaultCodecName
      case other => other
    }
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ".rc"
      override def newInstance(path: String, dataSchema: StructType,
          context: TaskAttemptContext): OutputWriter =
        new HiveRCOutputWriter(path, dataSchema, context, codecName)
    }
  }

  override def buildReader(sparkSession: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter], options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val fieldIdx = requiredSchema.fields.map(f => dataSchema.fieldIndex(f.name))
    val fieldTypes = requiredSchema.fields.map(_.dataType)
    val nRequired = fieldIdx.length
    val nCols = dataSchema.length

    (file: PartitionedFile) => {
      val p = file.toPath
      val fs = p.getFileSystem(SharedConf.get)
      // sync-resync split read: this task owns records [start, start+len)
      // by the Hadoop boundary rule (HiveRCFile.readSplit); COLUMN PRUNING:
      // only the projected columns' blobs are read off disk — unprojected
      // blobs are skipped unread/uninflated (the columnar payoff at scale)
      val wanted = Array.fill(nCols)(false)
      fieldIdx.foreach(wanted(_) = true)
      val cells = HiveRCFile.readSplit(fs, p, file.start,
        file.start + file.length, Some(wanted))
      cells.map { row =>
        // file/table column-count drift is LEGAL (ALTER TABLE CHANGE/
        // REPLACE COLUMNS reinterprets at read; files are never rewritten):
        // columns past the file's count read as NULL, extra file columns
        // are skipped unread — ColumnarSerDe's null-pad/ignore semantics,
        // same as the hivetext/hiveseq short/long-row handling
        val out = new GenericInternalRow(nRequired)
        var i = 0
        while (i < nRequired) {
          val fi = fieldIdx(i)
          val cell = if (fi < row.length) row(fi) else null
          val raw = if (cell == null) null else new String(cell, "UTF-8")
          out.update(i,
            if (raw == null || raw == HiveRCFile.NullSeq) null
            else HiveTextSource.decode(raw, fieldTypes(i)))
          i += 1
        }
        out
      }
    }
  }

  override def equals(other: Any): Boolean = other.isInstanceOf[HiveRCSource]
  override def hashCode(): Int = getClass.hashCode()
}

/** Executor-side writer: one .rc file per task through the streaming
  * row-group writer (header at open, a group flushed per 1000 rows).
  */
private class HiveRCOutputWriter(val path: String, dataSchema: StructType,
    context: TaskAttemptContext, codecName: Option[String]) extends OutputWriter {
  private val out = {
    val p = new Path(path)
    new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      p.getFileSystem(context.getConfiguration).create(p, false)))
  }
  private val types = dataSchema.fields.map(_.dataType)
  private val w = new HiveRCFile.StreamWriter(out, types.length,
    codecName = codecName)

  override def write(row: InternalRow): Unit = {
    val cells = new Array[Array[Byte]](types.length)
    var i = 0
    while (i < types.length) {
      cells(i) =
        (if (row.isNullAt(i)) HiveRCFile.NullSeq
         else HiveTextSource.encode(row, i, types(i))).getBytes("UTF-8")
      i += 1
    }
    w.append(cells.toSeq)
  }

  override def close(): Unit = { w.finish(); out.close() }
}
