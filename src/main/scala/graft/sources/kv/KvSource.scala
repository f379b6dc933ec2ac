package graft.sources.kv

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{MapType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The reference's storage-handler subsystem as a DataSource V2 connector
  * (closes the §7.5 HBase-handler drop at the SUBSYSTEM level): Spark's
  * TableProvider/Scan/Write stack IS the idiomatic form of
  * `ql/metadata/HiveStorageHandler.java` (input format / output format /
  * SerDe triple) — this source implements the HBase handler's semantics
  * over [[KvStore]]:
  *
  *  - positional `kv.columns.mapping` with the reference syntax
  *    (`:key,cf:qual,cf:` — HBaseSerDe.parseColumnMapping): row key,
  *    single cells, whole families as MAP<STRING,STRING>;
  *  - key-predicate pushdown: =, <, <=, >, >= on the `:key` column
  *    narrow the scan to a [start, stop) key range, exactly the
  *    decomposePredicate → convertFilter flow (HBaseStorageHandler
  *    .java:285, HiveHBaseTableInputFormat.java:242) — visible as
  *    PushedFilters in the plan;
  *  - parallel range scan: the key space splits into multiple input
  *    partitions at population quantiles (the region-boundary analogue),
  *    so a big scan fans out like HBase TableSplits;
  *  - writes are key-upserts (HBase Put semantics); INSERT OVERWRITE
  *    truncates first (SupportsTruncate).
  *
  * The in-process store stands in for the remote HBase cluster (the
  * LocalLockManager-for-ZooKeeper posture); on a real deployment the
  * reader/writer bodies would speak to the external service — the
  * connector surface, mapping, and pushdown stay identical.
  */
class KvSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "kv source requires an explicit schema (CREATE TABLE ... STORED BY)")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = properties.asScala
    val name = opts.getOrElse("kv.table.name",
      throw new IllegalArgumentException("kv.table.name required"))
    val mapping = KvMapping.parse(opts.getOrElse("kv.columns.mapping",
      throw new IllegalArgumentException(
        "No kv.columns.mapping defined in Serde.")))
    require(mapping.size == schema.size,
      s"kv.columns.mapping has ${mapping.size} entries for ${schema.size} columns")
    require(mapping.count(_ == KeyMapping) == 1,
      "exactly one :key entry required")
    mapping.zip(schema.fields).foreach {
      case (FamilyMapping(_), f) =>
        require(f.dataType.isInstanceOf[MapType],
          s"family-mapped column ${f.name} must be MAP<STRING,STRING>")
      case (_, f) =>
        require(f.dataType == StringType,
          s"cell-mapped column ${f.name} must be STRING")
    }
    new KvTable(name, schema, mapping)
  }
  override def supportsExternalMetadata(): Boolean = true
}

final class KvTable(tableName: String, tschema: StructType,
    mapping: Seq[KvMapping]) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"kv:$tableName"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  private def keyCol: String =
    tschema.fields(mapping.indexOf(KeyMapping)).name

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
        with SupportsPushDownRequiredColumns {
      private var pushed = Array.empty[Filter]
      private var start: Option[String] = None
      private var stop: Option[String] = None
      private var required: StructType = tschema

      // decomposePredicate: accept key comparisons, leave the rest — and
      // keep everything residual so Spark re-applies (pushdown here only
      // narrows the scan range, like the reference's startRow/stopRow)
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        def tryPush(f: Filter): Boolean = f match {
          case EqualTo(c, v: String) if c == keyCol =>
            start = maxOf(start, v); stop = minOf(stop, v + "\u0000"); true
          case GreaterThan(c, v: String) if c == keyCol =>
            start = maxOf(start, v + "\u0000"); true
          case GreaterThanOrEqual(c, v: String) if c == keyCol =>
            start = maxOf(start, v); true
          case LessThan(c, v: String) if c == keyCol =>
            stop = minOf(stop, v); true
          case LessThanOrEqual(c, v: String) if c == keyCol =>
            stop = minOf(stop, v + "\u0000"); true
          case And(l, r) => tryPush(l) & tryPush(r)
          case _ => false
        }
        pushed = filters.filter(tryPush)
        filters
      }
      private def maxOf(a: Option[String], b: String) =
        Some(a.filter(_ > b).getOrElse(b))
      private def minOf(a: Option[String], b: String) =
        Some(a.filter(_ < b).getOrElse(b))
      override def pushedFilters(): Array[Filter] = pushed
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def description(): String =
          s"kv:$tableName range=[${start.getOrElse("")},${stop.getOrElse("")})"
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] = {
            // region-boundary analogue: split at key-population quantiles
            val splits = KvStore.splitPoints(tableName, start, stop, 4)
            val bounds = (start +: splits.map(Some(_))) :+ stop
            bounds.sliding(2).map { case Seq(a, b) =>
              KvRange(a, b): InputPartition
            }.toArray
          }
          override def createReaderFactory(): PartitionReaderFactory =
            new KvReaderFactory(tableName, tschema, mapping, required)
        }
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              info: PhysicalWriteInfo): DataWriterFactory = {
            if (doTruncate) KvStore.truncate(tableName)
            new KvWriterFactory(tableName, tschema, mapping)
          }
          override def commit(messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

final case class KvRange(from: Option[String], until: Option[String])
    extends InputPartition

final class KvReaderFactory(table: String, full: StructType,
    mapping: Seq[KvMapping], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val KvRange(from, until) = p
      private val it = KvStore.range(table, from, until)
      private val outCols = required.fields.map(f =>
        full.fieldIndex(f.name)).toSeq
      private var row: InternalRow = _
      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          val (key, cells) = it.next()
          row = InternalRow.fromSeq(outCols.map { i =>
            mapping(i) match {
              case KeyMapping => UTF8String.fromString(key)
              case CellMapping(f, q) =>
                cells.get(s"$f:$q").map(UTF8String.fromString).orNull
              case FamilyMapping(f) =>
                val entries = cells.toSeq
                  .filter(_._1.startsWith(f + ":")).sortBy(_._1)
                ArrayBasedMapData(
                  entries.map(e => UTF8String.fromString(
                    e._1.stripPrefix(f + ":"))).toArray,
                  entries.map(e => UTF8String.fromString(e._2)).toArray)
            }
          })
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

final class KvWriterFactory(table: String, schema: StructType,
    mapping: Seq[KvMapping]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val keyIdx = mapping.indexOf(KeyMapping)
    override def write(r: InternalRow): Unit = {
      require(!r.isNullAt(keyIdx), "row key may not be NULL (HBase Put)")
      val key = r.getUTF8String(keyIdx).toString
      val cells = Map.newBuilder[String, String]
      mapping.zipWithIndex.foreach {
        case (CellMapping(f, q), i) if !r.isNullAt(i) =>
          cells += s"$f:$q" -> r.getUTF8String(i).toString
        case (FamilyMapping(f), i) if !r.isNullAt(i) =>
          val m = r.getMap(i)
          (0 until m.numElements()).foreach { j =>
            cells += s"$f:${m.keyArray().getUTF8String(j)}" ->
              m.valueArray().getUTF8String(j).toString
          }
        case _ =>
      }
      KvStore.put(table, key, cells.result())
    }
    override def commit(): WriterCommitMessage =
      new WriterCommitMessage {}
    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}
