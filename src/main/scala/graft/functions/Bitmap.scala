package graft.functions

import java.util.{BitSet => JBitSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** The reference's ewah_bitmap UDAF family (GenericUDAFEWAHBitmap.java:53 +
  * scalar ewah_bitmap_and/or/empty, FunctionRegistry.java:349-351) as a
  * Catalyst [[TypedImperativeAggregate]]: the buffer is a live
  * `java.util.BitSet` held object-form between rows and only serialized at
  * shuffle boundaries (the same partial/final contract the reference's
  * evaluator implements with EWAH-compressed words).
  */
case class BitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JBitSet] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): JBitSet = new JBitSet()

  override def update(buf: JBitSet, input: InternalRow): JBitSet = {
    val v = child.eval(input)
    if (v != null) {
      // keys outside [0, Int.MaxValue] are dropped, never aliased: a
      // truncating toInt would silently map 2^32 onto bit 0. (Like the
      // reference's EWAH bitmaps this is a positive-int-key structure;
      // dense far-apart keys should be dictionary-encoded first.)
      val bit = v match {
        case i: Int => i.toLong
        case l: Long => l
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case _ => -1L
      }
      if (bit >= 0 && bit <= Int.MaxValue) buf.set(bit.toInt)
    }
    buf
  }

  override def merge(a: JBitSet, b: JBitSet): JBitSet = { a.or(b); a }
  override def eval(buf: JBitSet): Any = buf.toByteArray
  override def serialize(buf: JBitSet): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): JBitSet = JBitSet.valueOf(bytes)

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
    val a = JBitSet.valueOf(l.asInstanceOf[Array[Byte]])
    val b = JBitSet.valueOf(r.asInstanceOf[Array[Byte]])
    if (isAnd) a.and(b) else a.or(b)
    a.toByteArray
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
    JBitSet.valueOf(v.asInstanceOf[Array[Byte]]).cardinality()
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
