package graft.sources.kv

import java.util.concurrent.ConcurrentSkipListMap

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** The key-value store behind [[KvSource]] — the in-process stand-in for
  * HBase, the same posture as Locks.LocalLockManager for ZooKeeper: the
  * storage-handler SUBSYSTEM (mapping, pushdown, MetaHook lifecycle) is
  * the reference capability under test; the remote client is the
  * swappable substrate. Sorted row keys (HBase's defining property — the
  * reason key-range pushdown works), column cells addressed
  * `family:qualifier`, whole-family reads.
  */
object KvStore {

  /** rowKey -> (family:qualifier -> value); sorted by key like HBase. */
  type KvTableData = ConcurrentSkipListMap[String, TrieMap[String, String]]

  private val tables = TrieMap.empty[String, KvTableData]

  def reset(): Unit = tables.clear()

  def exists(name: String): Boolean = tables.contains(name)

  /** HBaseMetaHook preCreateTable: managed tables must not exist yet. */
  def create(name: String): Unit =
    require(tables.putIfAbsent(name, new KvTableData()).isEmpty,
      s"KV table $name already exists")

  def drop(name: String): Unit = tables.remove(name)

  def apply(name: String): KvTableData =
    tables.getOrElse(name,
      throw new IllegalArgumentException(s"KV table $name does not exist"))

  def put(name: String, key: String, cells: Map[String, String]): Unit = {
    val row = apply(name).computeIfAbsent(key, _ => TrieMap.empty)
    cells.foreach { case (c, v) => row.put(c, v) }
  }

  def truncate(name: String): Unit = apply(name).clear()

  /** Snapshot of [from, until) — None = unbounded on that side. */
  def range(name: String, from: Option[String], until: Option[String])
      : Iterator[(String, Map[String, String])] = {
    val t = apply(name)
    val sub = (from, until) match {
      case (Some(a), Some(b)) if a > b => return Iterator.empty
      case (Some(a), Some(b)) => t.subMap(a, true, b, false)
      case (Some(a), None) => t.tailMap(a, true)
      case (None, Some(b)) => t.headMap(b, false)
      case (None, None) => t
    }
    sub.entrySet().iterator().asScala.map(e => e.getKey -> e.getValue.toMap)
  }

  /** Up to n+1 split bounds over the current key population inside
    * [from, until) — the region-boundary analogue HBase splits scans on.
    */
  def splitPoints(name: String, from: Option[String], until: Option[String],
      n: Int): Seq[String] = {
    val keys = range(name, from, until).map(_._1).toIndexedSeq
    if (keys.size <= 1 || n <= 1) Nil
    else (1 until n).map(i => keys(i * keys.size / n)).distinct
  }
}

/** One entry of the reference's `hbase.columns.mapping` string
  * (HBaseSerDe.parseColumnMapping): `:key` = the row key, `fam:qual` = a
  * single cell, `fam:` = the whole family as MAP<STRING,STRING>.
  */
sealed trait KvMapping
case object KeyMapping extends KvMapping
final case class CellMapping(family: String, qualifier: String) extends KvMapping
final case class FamilyMapping(family: String) extends KvMapping

object KvMapping {
  /** Positional, one entry per table column — Hive's alignment rule. */
  def parse(spec: String): Seq[KvMapping] =
    spec.split(",").map(_.trim).toSeq.map {
      case ":key" => KeyMapping
      case m if m.endsWith(":") => FamilyMapping(m.dropRight(1))
      case m if m.contains(":") =>
        val Array(f, q) = m.split(":", 2)
        CellMapping(f, q)
      case m => throw new IllegalArgumentException(
        s"bad column mapping entry '$m' (expect :key, fam:qual, or fam:)")
    }
}
