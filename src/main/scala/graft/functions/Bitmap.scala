package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
/** The scalar ewah_bitmap_* family in the reference accepts bitmaps in
  * their on-disk `array<bigint>` EWAH word form too (udf_bitmap_empty.q
  * passes a literal `array(13,2,4,...)`) — coerce either representation
  * to the internal Roaring bytes.
  */
private[functions] object BitmapInput {
  def toBitmap(v: Any): org.roaringbitmap.RoaringBitmap = v match {
    case b: Array[Byte] => BitmapCodec.fromBytes(b)
    case a: org.apache.spark.sql.catalyst.util.ArrayData =>
      EwahCodec.decode(a.toLongArray())
    case other => throw new IllegalArgumentException(
      s"not a bitmap: ${other.getClass.getName}")
  }
}

case class BitmapCombine(left: Expression, right: Expression, isAnd: Boolean)
    extends BinaryExpression with CodegenFallback {
  // when BOTH inputs arrive in the reference's EWAH word form, the result
  // keeps that form too (udf_bitmap_and.q goldens are `array<bigint>`);
  // the binary-native Roaring form is preserved for graft-built bitmaps
  private def arrayInputs: Boolean =
    left.dataType.isInstanceOf[ArrayType] && right.dataType.isInstanceOf[ArrayType]
  override def dataType: DataType =
    if (arrayInputs) ArrayType(LongType, containsNull = false) else BinaryType
  override def prettyName: String = if (isAnd) "bitmap_and" else "bitmap_or"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    if (arrayInputs) {
      // stay in the reference's serialized form end-to-end: word-identical
      // to javaewah's and()/or() for the goldens, incl. sizeinbits and the
      // zero-run shape of an annihilated intersection
      val la = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val ra = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      new GenericArrayData(
        EwahCodec.combine(la.toLongArray(), ra.toLongArray(), isAnd))
    } else {
      val a = BitmapInput.toBitmap(l)
      val b = BitmapInput.toBitmap(r)
      if (isAnd) a.and(b) else a.or(b)
      BitmapCodec.toBytes(a)
    }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The reference's on-disk EWAH word-array format (the one place our
  * Roaring-backed family diverges from it, SURVEY §7.5). A bitmap written
  * by the reference is `array<bigint>` — the exact `writeInt`/`writeLong`
  * call sequence of javaewah 0.2's `EWAHCompressedBitmap.serialize`
  * captured one call per element (BitmapObjectOutput.java:104-112):
  *
  *   [0] sizeinbits  [1] actualsizeinwords  [2] buffer.length (allocated)
  *   [3 .. 3+actual)  the EWAH words         [last] rlw.position
  *
  * Each marker word packs (RunningLengthWord.java, disassembled layout):
  * bit 0 = running bit, bits 1..32 = running length (fill words of the
  * running bit), bits 33..63 = literal word count; the literals follow the
  * marker. 64-bit words throughout.
  *
  * [[decode]] accepts anything the reference can emit (both fill polarities,
  * arbitrary marker chains). [[encode]] emits zero-runs + ones-runs +
  * literals greedily — valid input for the reference's deserializer and
  * O(cardinality) even when a stray bit sits near 2^31 (no dense word walk:
  * gaps become run markers without materializing the words between).
  */
object EwahCodec {
  private val MaxRun = 0xFFFFFFFFL // largestrunninglengthcount (32 bits)

  def encode(rb: RoaringBitmap): Array[Long] = {
    // set bits → (ascending) nonzero 64-bit words, sparse
    val idx = scala.collection.mutable.ArrayBuffer[Long]()
    val word = scala.collection.mutable.ArrayBuffer[Long]()
    var maxPos = -1L
    val it = rb.getIntIterator
    while (it.hasNext) {
      val v = it.next()
      require(v >= 0, s"ewah_encode: bit position $v outside the reference's int domain")
      maxPos = v.toLong
      val wi = v.toLong >>> 6
      if (idx.nonEmpty && idx.last == wi) word(word.length - 1) |= 1L << (v & 63)
      else { idx += wi; word += 1L << (v & 63) }
    }
    val buf = scala.collection.mutable.ArrayBuffer[Long]()
    var rlwPos = 0
    var cursor = 0L // next word index not yet covered by the stream
    var i = 0
    while (i < idx.length) {
      var gap = idx(i) - cursor
      while (gap > MaxRun) { rlwPos = buf.length; buf += (MaxRun << 1); gap -= MaxRun }
      var nOnes = 0L // full words become a ones-run, not literals
      while (i + nOnes < idx.length && word((i + nOnes).toInt) == -1L &&
             idx((i + nOnes).toInt) == idx(i) + nOnes && nOnes < MaxRun) nOnes += 1
      // a marker holds ONE run; zero-gap and ones-run can't share it
      if (gap > 0 && nOnes > 0) { rlwPos = buf.length; buf += (gap << 1); gap = 0 }
      val litFrom = i + nOnes.toInt
      val litBase = idx(i) + nOnes
      var nLits = 0
      while (litFrom + nLits < idx.length && word(litFrom + nLits) != -1L &&
             idx(litFrom + nLits) == litBase + nLits) nLits += 1
      rlwPos = buf.length
      buf += (if (nOnes > 0) (nOnes << 1) | 1L else gap << 1) | (nLits.toLong << 33)
      var j = 0
      while (j < nLits) { buf += word(litFrom + j); j += 1 }
      i = litFrom + nLits
      cursor = litBase + nLits
    }
    if (buf.isEmpty) buf += 0L // javaewah's empty bitmap: one all-zero marker
    val sizeinbits = maxPos + 1
    (Seq(sizeinbits, buf.length.toLong, grownCapacity(buf.length)) ++
      buf :+ rlwPos.toLong).toArray
  }

  /** javaewah's serialized word [2] is the buffer ALLOCATION, not the used
    * length: the buffer starts at 4 longs and doubles on growth, so the
    * value is the smallest 4·2^k ≥ actualsizeinwords — reproduced so
    * encode is word-for-word identical to the reference's serialize
    * (udf_bitmap_and.q goldens include the alloc word).
    */
  private def grownCapacity(actual: Long): Long = {
    var c = 4L
    while (c < actual) c *= 2
    c
  }

  /** AND/OR directly on two serialized EWAH streams, the
    * GenericUDFEWAHBitmapAnd/Or surface (AbstractGenericUDFEWAHBitmapBop
    * .java:46 over javaewah 0.2's and()/or()): run-aligned merge, no dense
    * word walk, result sizeinbits = max of the inputs (javaewah's
    * setSizeInBits posture), zero/one result words re-compressed into
    * fills. The shorter stream is padded with a zero fill to the longer
    * stream's word count (AND annihilates the tail, OR passes it through).
    */
  def combine(a: Array[Long], b: Array[Long], isAnd: Boolean): Array[Long] = {
    val sa = new EwahStream(a)
    val sb = new EwahStream(b)
    val out = new EwahBuilder
    while (!sa.done || !sb.done) {
      (sa.inFill, sb.inFill) match {
        case (true, true) =>
          val n = math.min(sa.fillLeft, sb.fillLeft)
          val bit = if (isAnd) sa.fillBit && sb.fillBit else sa.fillBit || sb.fillBit
          out.addFill(bit, n); sa.takeFill(n); sb.takeFill(n)
        case (true, false) =>
          val w = sb.nextLiteral()
          out.addWord(if (isAnd) (if (sa.fillBit) w else 0L)
            else (if (sa.fillBit) -1L else w))
          sa.takeFill(1)
        case (false, true) =>
          val w = sa.nextLiteral()
          out.addWord(if (isAnd) (if (sb.fillBit) w else 0L)
            else (if (sb.fillBit) -1L else w))
          sb.takeFill(1)
        case (false, false) =>
          val (wa, wb) = (sa.nextLiteral(), sb.nextLiteral())
          out.addWord(if (isAnd) wa & wb else wa | wb)
      }
    }
    out.result(math.max(a(0), b(0)))
  }

  /** Cursor over a serialized stream yielding fills and literal words; a
    * stream shorter than its sibling reads as an endless zero fill (`done`
    * flags the true end so [[combine]] stops at max length).
    */
  private final class EwahStream(words: Array[Long]) {
    private val actual = words(1)
    private var p = 0L        // marker index within the buffer
    private var fill = 0L
    private var fb = false
    private var lits = 0L
    private var lit = 0L      // buffer index of next literal
    loadMarker()
    private def loadMarker(): Unit =
      if (p < actual) {
        val m = words((3 + p).toInt)
        fb = (m & 1L) == 1L
        fill = (m >>> 1) & 0xFFFFFFFFL
        lits = m >>> 33
        lit = p + 1
        p += 1 + lits
        if (fill == 0 && lits == 0 && p < actual) loadMarker()
      }
    private def settle(): Unit =
      if (fill == 0 && lits == 0 && p < actual) loadMarker()
    def done: Boolean = { settle(); fill == 0 && lits == 0 && p >= actual }
    def inFill: Boolean = { settle(); fill > 0 || done }
    def fillLeft: Long = if (done) Long.MaxValue else fill
    def fillBit: Boolean = if (done) false else fb
    def takeFill(n: Long): Unit = if (!done) { fill -= n }
    def nextLiteral(): Long = {
      val w = words((3 + lit).toInt); lit += 1; lits -= 1; w
    }
  }

  /** Greedy EWAH writer with javaewah's marker mechanics: one run + its
    * literals per marker, polarity or literal-then-fill transitions open a
    * new marker, all-zero/all-one literal words fold into fills.
    */
  private final class EwahBuilder {
    private val buf = scala.collection.mutable.ArrayBuffer[Long](0L)
    private var mPos = 0      // current marker index
    private var runBit = false
    private var runLen = 0L
    private var nLits = 0L
    private def newMarker(): Unit = {
      mPos = buf.length; buf += 0L; runBit = false; runLen = 0L; nLits = 0L
    }
    private def writeMarker(): Unit =
      buf(mPos) = (if (runBit) 1L else 0L) | (runLen << 1) | (nLits << 33)
    def addFill(bit: Boolean, n0: Long): Unit = {
      var n = n0
      while (n > 0) {
        if (nLits > 0 || (runLen > 0 && runBit != bit) ||
            runLen >= MaxRun) newMarker()
        if (runLen == 0) runBit = bit
        val take = math.min(n, MaxRun - runLen)
        runLen += take; n -= take
        writeMarker()
      }
    }
    def addWord(w: Long): Unit =
      if (w == 0L) addFill(bit = false, 1)
      else if (w == -1L) addFill(bit = true, 1)
      else { nLits += 1; buf += w; writeMarker() }
    def result(sizeinbits: Long): Array[Long] =
      (Seq(sizeinbits, buf.length.toLong, grownCapacity(buf.length)) ++
        buf :+ mPos.toLong).toArray
  }

  def decode(words: Array[Long]): RoaringBitmap = {
    require(words.length >= 5,
      s"ewah_decode: stream too short (${words.length} words; header alone is 3 + trailer 1)")
    val actual = words(1)
    require(actual >= 1 && words(2) >= actual && words.length.toLong == actual + 4,
      s"ewah_decode: header inconsistent (actualsizeinwords=$actual, " +
        s"buffer.length=${words(2)}, stream=${words.length})")
    val rlwPos = words(words.length - 1)
    require(rlwPos >= 0 && rlwPos < actual,
      s"ewah_decode: rlw.position $rlwPos outside buffer of $actual words")
    val rb = new RoaringBitmap()
    var p = 0L
    var cursor = 0L
    while (p < actual) {
      val m = words((3 + p).toInt)
      val runLen = (m >>> 1) & MaxRun
      val nLit = m >>> 33
      require(p + 1 + nLit <= actual,
        s"ewah_decode: marker at word $p declares $nLit literals past the buffer end")
      if ((m & 1L) == 1L && runLen > 0) {
        require((cursor + runLen) * 64 <= Int.MaxValue.toLong + 1,
          "ewah_decode: ones-run extends past the int bit domain")
        rb.add(cursor * 64, (cursor + runLen) * 64)
      }
      cursor += runLen
      var j = 0L
      while (j < nLit) {
        var w = words((3 + p + 1 + j).toInt)
        while (w != 0L) {
          val b = cursor * 64 + java.lang.Long.numberOfTrailingZeros(w)
          require(b <= Int.MaxValue, "ewah_decode: literal bit past the int bit domain")
          rb.add(b.toInt)
          w &= w - 1
        }
        cursor += 1; j += 1
      }
      p += 1 + nLit
    }
    rb
  }
}

/** ewah_encode: Roaring BINARY → the reference's EWAH `array<bigint>`, so
  * bitmaps built here are readable by the reference's ewah_bitmap_* family.
  */
case class EwahEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ewah_encode"
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(EwahCodec.encode(
      BitmapCodec.fromBytes(v.asInstanceOf[Array[Byte]])))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ewah_decode: reference-written EWAH `array<bigint>` → Roaring BINARY,
  * composable with the whole bitmap_* / ewah_bitmap_* family here.
  */
case class EwahDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ewah_decode"
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    // reject null WORDS loudly (a reference EWAH stream has none) — the
    // blind toLongArray() below would NPE with no codec context
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"ewah_decode: null word at index $i of ${arr.numElements()} — " +
            "not a reference EWAH stream")
      i += 1
    }
    BitmapCodec.toBytes(EwahCodec.decode(arr.toLongArray()))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bitmap_count: cardinality of a serialized bitmap (ewah_bitmap_empty is
  * `bitmap_count(b) = 0`).
  */
case class BitmapCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bitmap_count"
  override protected def nullSafeEval(v: Any): Any =
    BitmapInput.toBitmap(v).getCardinality
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
