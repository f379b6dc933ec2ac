package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable top-k buffer: a tree of (value, label) → multiplicity ordered
  * WORST-FIRST (value asc, label desc), so trimming is always
  * `pollFirstEntry` and the descending view iterates in final rank order
  * (value desc, label asc). Never holds more than k+1 entries.
  */
final class TopKState(var k: Int = 0) {
  val entries = new java.util.TreeMap[(Double, String), Long](
    new java.util.Comparator[(Double, String)] {
      def compare(a: (Double, String), b: (Double, String)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else b._2.compareTo(a._2)
      }
    })
  var total = 0L
}

/** Kernel for the `top_k` partial aggregate — pure of Spark types so
  * PropertySpec can drive the exact production paths (split/merge laws).
  */
object TopKKernel {

  def add(s: TopKState, v: Double, label: String, c: Long): Unit = {
    val key = (v, label)
    val cur = s.entries.getOrDefault(key, 0L)
    s.entries.put(key, cur + c)
    s.total += c
    trim(s)
  }

  /** Drop worst entries until ≤ k rows are held (multiplicity-aware). */
  private def trim(s: TopKState): Unit =
    while (s.k > 0 && s.total > s.k) {
      val worst = s.entries.firstEntry()
      val excess = s.total - s.k
      if (worst.getValue <= excess) {
        s.entries.pollFirstEntry()
        s.total -= worst.getValue
      } else {
        s.entries.put(worst.getKey, worst.getValue - excess)
        s.total -= excess
      }
    }

  def merge(a: TopKState, b: TopKState): TopKState = {
    val (base, add0) = if (a.entries.size >= b.entries.size) (a, b) else (b, a)
    base.k = math.max(a.k, b.k)
    add0.entries.forEach { (key, c) =>
      base.entries.put(key, base.entries.getOrDefault(key, 0L) + c)
      base.total += c
    }
    trim(base)
    base
  }

  /** Rank-ordered (value desc, label asc) rows, multiplicity expanded. */
  def finish(s: TopKState): Seq[(String, Double)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(String, Double)]
    val it = s.entries.descendingMap().entrySet().iterator()
    while (it.hasNext && out.size < s.k) {
      val e = it.next()
      var c = 0L
      while (c < e.getValue && out.size < s.k) {
        out += ((e.getKey._2, e.getKey._1))
        c += 1
      }
    }
    out.toSeq
  }

  def serialize(s: TopKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.k)
    out.writeInt(s.entries.size)
    s.entries.forEach { (key, c) =>
      out.writeDouble(key._1)
      val b = key._2.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): TopKState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new TopKState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val v = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val c = in.readLong()
      s.entries.put((v, new String(b, "UTF-8")), c)
      s.total += c
      i += 1
    }
    s
  }

  val outputType: DataType = ArrayType(StructType(Seq(
    StructField("label", StringType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)
}

/** `top_k(value, label, k)` — the k (value, label) rows with the largest
  * values per group, ties broken by label ascending; duplicates keep their
  * multiplicity, NaN labels the caller's problem (fixture-free contract).
  *
  * The point versus the `row_number() OVER (...) <= k` formulation: the
  * window shuffles and sorts EVERY row of the group; this aggregate holds
  * at most k rows per partial buffer, so only ~k·partitions rows ever cross
  * the wire — per-group top-k with map-side reduction (the same
  * partial/final shape the reference's UDAF contract expresses,
  * GenericUDAFEvaluator.java:38).
  */
case class TopKAgg(
    value: Expression, label: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  override def children: Seq[Expression] = Seq(value, label, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKKernel.outputType

  override def checkInputDataTypes(): TypeCheckResult =
    (value.dataType, label.dataType, kExpr.dataType) match {
      case (DoubleType, StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "top_k expects (double, string, int)")
    }

  override def createAggregationBuffer(): TopKState = new TopKState()

  override def update(s: TopKState, input: InternalRow): TopKState = {
    val v = value.eval(input)
    val l = label.eval(input)
    if (v != null && l != null) {
      s.k = math.max(s.k, kExpr.eval(input).asInstanceOf[Int])
      TopKKernel.add(s, v.asInstanceOf[Double],
        l.asInstanceOf[UTF8String].toString, 1L)
    }
    s
  }

  override def merge(a: TopKState, b: TopKState): TopKState =
    TopKKernel.merge(a, b)
  override def eval(s: TopKState): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TopKKernel.finish(s).map { case (l, v) =>
        InternalRow(UTF8String.fromString(l), v)
      }.toArray[Any])
  override def serialize(s: TopKState): Array[Byte] = TopKKernel.serialize(s)
  override def deserialize(bytes: Array[Byte]): TopKState =
    TopKKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), label = newChildren(1), kExpr = newChildren(2))
}
