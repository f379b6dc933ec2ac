package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.roaringbitmap.RoaringBitmap

/** The reference's ewah_bitmap UDAF family (GenericUDAFEWAHBitmap.java:53 +
  * scalar ewah_bitmap_and/or/empty, FunctionRegistry.java:349-351) as a
  * Catalyst [[TypedImperativeAggregate]]: the buffer is a live
  * [[RoaringBitmap]] held object-form between rows and only serialized at
  * shuffle boundaries (the same partial/final contract the reference's
  * evaluator implements).
  *
  * Compressed on purpose: the reference chose EWAH word compression so a
  * sparse key domain never allocates dense space; RoaringBitmap gives the
  * same guarantee (memory ~ O(cardinality), not O(max_key)) — a stray key
  * near 2^31 costs one 2-byte container entry, not a ~256 MB dense buffer.
  */
object BitmapCodec {
  // RoaringBitmap's portable format is little-endian and its ByteBuffer
  // serialize/deserialize REQUIRE the buffer order set; ByteBuffer.wrap
  // defaults to BIG_ENDIAN, which corrupts run-compressed containers.
  def toBytes(rb: RoaringBitmap): Array[Byte] = {
    rb.runOptimize()
    val out = new Array[Byte](rb.serializedSizeInBytes())
    rb.serialize(ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN))
    out
  }
  def fromBytes(bytes: Array[Byte]): RoaringBitmap = {
    val rb = new RoaringBitmap()
    rb.deserialize(ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN))
    rb
  }
}

case class BitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RoaringBitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        // a non-integral key would otherwise silently produce an empty
        // bitmap (the reference's UDAF resolver rejects it the same way)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_agg requires an integral key, got ${dt.simpleString}")
    }

  override def createAggregationBuffer(): RoaringBitmap = new RoaringBitmap()

  override def update(buf: RoaringBitmap, input: InternalRow): RoaringBitmap = {
    val v = child.eval(input)
    if (v != null) {
      // keys outside [0, Int.MaxValue] are dropped, never aliased: a
      // truncating toInt would silently map 2^32 onto bit 0. (Like the
      // reference's EWAH bitmaps this is a positive-int-key structure.)
      val bit = v match {
        case i: Int => i.toLong
        case l: Long => l
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case _ => -1L
      }
      if (bit >= 0 && bit <= Int.MaxValue) buf.add(bit.toInt)
    }
    buf
  }

  override def merge(a: RoaringBitmap, b: RoaringBitmap): RoaringBitmap = {
    a.or(b); a
  }
  override def eval(buf: RoaringBitmap): Any = BitmapCodec.toBytes(buf)
  override def serialize(buf: RoaringBitmap): Array[Byte] = BitmapCodec.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): RoaringBitmap =
    BitmapCodec.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** bitmap_and / bitmap_or over two serialized bitmaps. */
case class BitmapCombine(left: Expression, right: Expression, isAnd: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = if (isAnd) "bitmap_and" else "bitmap_or"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = BitmapCodec.fromBytes(l.asInstanceOf[Array[Byte]])
    val b = BitmapCodec.fromBytes(r.asInstanceOf[Array[Byte]])
    if (isAnd) a.and(b) else a.or(b)
    BitmapCodec.toBytes(a)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** bitmap_count: cardinality of a serialized bitmap (ewah_bitmap_empty is
  * `bitmap_count(b) = 0`).
  */
case class BitmapCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bitmap_count"
  override protected def nullSafeEval(v: Any): Any =
    BitmapCodec.fromBytes(v.asInstanceOf[Array[Byte]]).getCardinality
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
