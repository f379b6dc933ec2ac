package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra–Gries summary: at most k counters. */
final class FreqItemsState(var k: Int = 0) {
  val counts = new java.util.HashMap[String, Long]()
  /** Total decrement applied so far — the per-item undercount bound. */
  var decremented = 0L
}

/** Kernel for the `freq_items` partial aggregate (Misra–Gries / SpaceSaving
  * family — the frequent-items summary behind hot-key detection and
  * stop-word discovery). Pure of Spark types so PropertySpec can drive the
  * exact production paths.
  *
  * Guarantees (classic MG): with capacity k over a stream of n items,
  * every item with true frequency > n/(k+1) is retained, and each held
  * counter undercounts its true frequency by at most `decremented`
  * (itself ≤ n/(k+1)). When k ≥ |distinct| no decrement ever fires and
  * every count is EXACT — the regime the DuckDB oracle checks; the error
  * bound in the tight-capacity regime is property-spec'd instead (the
  * result there depends on the merge tree, as for any mergeable summary).
  */
object FreqItemsKernel {

  def add(s: FreqItemsState, item: String, c: Long): Unit = {
    val cur = s.counts.getOrDefault(item, 0L)
    s.counts.put(item, cur + c)
    if (s.counts.size > s.k) trim(s)
  }

  /** Subtract the (k+1)-th largest count from every counter, drop ≤0 —
    * the standard mergeable-summary reduction (Agarwal et al., PODS'12).
    */
  private def trim(s: FreqItemsState): Unit = {
    val vals = new Array[Long](s.counts.size)
    var i = 0
    val it0 = s.counts.values().iterator()
    while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val m = vals(vals.length - 1 - s.k) // (k+1)-th largest
    s.decremented += m
    val it = s.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - m
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  def merge(a: FreqItemsState, b: FreqItemsState): FreqItemsState = {
    val (base, add0) = if (a.counts.size >= b.counts.size) (a, b) else (b, a)
    base.k = math.max(a.k, b.k)
    base.decremented += add0.decremented
    add0.counts.forEach { (item, c) =>
      base.counts.put(item, base.counts.getOrDefault(item, 0L) + c)
    }
    if (base.counts.size > base.k) trim(base)
    base
  }

  /** (cnt desc, item asc) rows — deterministic given the summary. The item
    * tie-break compares UTF-8 BYTES (UTF8String binary order), not Java
    * String UTF-16 code units: the two orders diverge on supplementary-plane
    * characters, and byte order is what both Spark sorts and the DuckDB
    * oracle's code-point ORDER BY produce.
    */
  def finish(s: FreqItemsState): Seq[(String, Long)] = {
    implicit val utf8Asc: Ordering[String] =
      (a: String, b: String) => UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
    s.counts.entrySet().toArray(Array.empty[java.util.Map.Entry[String, Long]])
      .toSeq.map(e => (e.getKey, e.getValue))
      .sortBy { case (item, cnt) => (-cnt, item) }(Ordering.Tuple2(Ordering.Long, utf8Asc))
  }

  def serialize(s: FreqItemsState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.k)
    out.writeLong(s.decremented)
    out.writeInt(s.counts.size)
    s.counts.forEach { (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): FreqItemsState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new FreqItemsState(in.readInt())
    s.decremented = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.counts.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    s
  }

  val outputType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
}

/** `freq_items(item, k)` — bounded-memory frequent-items aggregate.
  *
  * The point versus `GROUP BY item ORDER BY count(*) DESC LIMIT j`: the
  * exact form shuffles one row per DISTINCT item (web-scale vocabularies:
  * billions), this aggregate ships ≤ k counters per partial buffer —
  * constant memory, one narrow shuffle, with the n/(k+1) frequency
  * guarantee. Hot-key detection for skew mitigation (q49) is the same
  * summary applied to join keys.
  */
case class FreqItemsAgg(
    item: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItemsState] {

  override def children: Seq[Expression] = Seq(item, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = FreqItemsKernel.outputType

  override def checkInputDataTypes(): TypeCheckResult =
    (item.dataType, kExpr.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("freq_items expects (string, int)")
    }

  override def createAggregationBuffer(): FreqItemsState = new FreqItemsState()

  override def update(s: FreqItemsState, input: InternalRow): FreqItemsState = {
    val v = item.eval(input)
    if (v != null) {
      val kv = kExpr.eval(input)
      if (kv == null || kv.asInstanceOf[Int] <= 0)
        throw new IllegalArgumentException(
          s"freq_items k must be a positive integer, got $kv")
      s.k = math.max(s.k, kv.asInstanceOf[Int])
      FreqItemsKernel.add(s, v.asInstanceOf[UTF8String].toString, 1L)
    }
    s
  }

  override def merge(a: FreqItemsState, b: FreqItemsState): FreqItemsState =
    FreqItemsKernel.merge(a, b)
  override def eval(s: FreqItemsState): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      FreqItemsKernel.finish(s).map { case (i, c) =>
        InternalRow(UTF8String.fromString(i), c)
      }.toArray[Any])
  override def serialize(s: FreqItemsState): Array[Byte] =
    FreqItemsKernel.serialize(s)
  override def deserialize(bytes: Array[Byte]): FreqItemsState =
    FreqItemsKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0), kExpr = newChildren(1))
}
