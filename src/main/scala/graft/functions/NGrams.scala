package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

final case class NGramFreq(ngram: String, freq: Long)

/** Mutable aggregation state for the n-gram UDAFs: a live hash map updated
  * in place per row (an immutable-map buffer would copy the accumulated
  * counts once per input row — quadratic in the per-group corpus) plus the
  * k parameter needed to prune and finish.
  */
final class NGramState(
    val counts: java.util.HashMap[String, Long] = new java.util.HashMap,
    var k: Int = 0)

/** Shared kernel: counting, pruning, merging, and top-k extraction — the
  * reference's iterate/terminatePartial/merge/terminate contract
  * (GenericUDAFEvaluator.java:38) with the pruned-buffer memory bound of
  * GenericUDAFnGrams.java:361's precision factor. Pure of Spark types so
  * PropertySpec can drive the exact production code paths directly.
  */
object NGramKernel {
  /** A gram pruned from a partial buffer and re-encountered later is
    * undercounted (same posture as the reference's estimation pf); 1000×k
    * keeps counts exact whenever the per-partition gram vocabulary fits
    * 1000k while still bounding memory at O(k).
    */
  val PruneFactor = 1000

  def add(s: NGramState, gram: String, c: Long): Unit =
    s.counts.put(gram, s.counts.getOrDefault(gram, 0L) + c)

  def prune(s: NGramState): Unit = {
    val cap = PruneFactor * s.k
    if (s.k > 0 && s.counts.size > cap) {
      val kept = sorted(s).take(cap)
      s.counts.clear()
      kept.foreach { case (g, c) => s.counts.put(g, c) }
    }
  }

  private def sorted(s: NGramState): Seq[(String, Long)] = {
    val buf = new scala.collection.mutable.ArrayBuffer[(String, Long)](s.counts.size)
    s.counts.forEach((g, c) => buf += ((g, c)))
    buf.sortBy { case (g, c) => (-c, g) }.toSeq
  }

  /** Merge b into a (in place), keeping the larger map as the base. */
  def merge(a: NGramState, b: NGramState): NGramState = {
    val (base, add0) = if (a.counts.size >= b.counts.size) (a, b) else (b, a)
    add0.counts.forEach((g, c) => add(base, g, c))
    base.k = math.max(a.k, b.k)
    prune(base)
    base
  }

  def finish(s: NGramState): Seq[NGramFreq] =
    sorted(s).take(s.k).map { case (g, c) => NGramFreq(g, c) }

  def countNGrams(s: NGramState, words: IndexedSeq[String], n: Int): Unit = {
    var i = 0
    val last = words.length - n
    while (i <= last) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      add(s, sb.toString, 1L)
      i += 1
    }
  }

  /** Count the wildcard fills of `pattern` (null = wildcard) in `words` —
    * GenericUDAFContextNGrams.java:424 semantics.
    */
  def countContext(s: NGramState, words: IndexedSeq[String],
      pattern: IndexedSeq[String], n: Int): Unit = {
    var i = 0
    val last = words.length - n
    while (i <= last) {
      var j = 0
      var ok = true
      while (ok && j < n) {
        val p = pattern(j)
        if (p != null && p != words(i + j)) ok = false
        j += 1
      }
      if (ok) {
        val sb = new java.lang.StringBuilder
        var first = true
        var j2 = 0
        while (j2 < n) {
          if (pattern(j2) == null) {
            if (!first) sb.append(' ')
            sb.append(words(i + j2))
            first = false
          }
          j2 += 1
        }
        add(s, sb.toString, 1L)
      }
      i += 1
    }
  }

  def serialize(s: NGramState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.k)
    out.writeInt(s.counts.size)
    s.counts.forEach { (g, c) =>
      val bytes = g.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): NGramState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new NGramState()
    s.k = in.readInt()
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
    StructField("ngram", StringType, nullable = false),
    StructField("freq", LongType, nullable = false))), containsNull = false)

  /** The reference's own output shape (GenericUDAFnGrams.java:361 /
    * GenericUDAFContextNGrams.java:424 terminate):
    * `array<struct<ngram: array<string>, estfrequency: double>>` — grams as
    * word arrays, counts as double estimates. The builtin `ngrams`/
    * `context_ngrams` names present this shape (udaf_ngrams.q does
    * `.estfrequency`); the graft `_topk` extension names keep the compact
    * space-joined string + exact long count.
    */
  val hiveOutputType: DataType = ArrayType(StructType(Seq(
    StructField("ngram", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("estfrequency", DoubleType, nullable = false))),
    containsNull = false)

  def toArrayData(top: Seq[NGramFreq]): GenericArrayData =
    new GenericArrayData(top.map(f =>
      InternalRow(UTF8String.fromString(f.ngram), f.freq)).toArray[Any])

  def toHiveArrayData(top: Seq[NGramFreq]): GenericArrayData =
    new GenericArrayData(top.map { f =>
      val words = f.ngram.split(" ").map(w =>
        UTF8String.fromString(w): Any)
      InternalRow(new GenericArrayData(words), f.freq.toDouble)
    }.toArray[Any])

  /** Word sequences from an input value that is either `array<string>` or
    * the sentences() shape `array<array<string>>` (grams never cross
    * sentence boundaries — GenericUDAFnGrams.java iterate walks each inner
    * list independently).
    */
  def wordSeqs(v: Any, nested: Boolean): Seq[IndexedSeq[String]] =
    if (!nested) Seq(stringArray(v))
    else {
      val arr = v.asInstanceOf[ArrayData]
      (0 until arr.numElements()).flatMap { i =>
        if (arr.isNullAt(i)) None else Some(stringArray(arr.get(i,
          ArrayType(StringType))))
      }
    }

  def stringArray(v: Any): IndexedSeq[String] = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[String](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}

/** `ngrams(words, n, k)` — top-k n-gram frequencies
  * (ref GenericUDAFnGrams.java:361). Output
  * `array<struct<ngram: string, freq: long>>` sorted by (freq desc, gram).
  */
case class NGramsAgg(
    words: Expression, nExpr: Expression, kExpr: Expression,
    hiveShape: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NGramState] {

  override def children: Seq[Expression] = Seq(words, nExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (hiveShape) NGramKernel.hiveOutputType else NGramKernel.outputType

  private lazy val nestedWords = words.dataType match {
    case ArrayType(ArrayType(StringType, _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (words.dataType, nExpr.dataType, kExpr.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(ArrayType(StringType, _), _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "ngrams expects (array<string> | array<array<string>>, int, int)")
    }

  override def createAggregationBuffer(): NGramState = new NGramState()

  override def update(s: NGramState, input: InternalRow): NGramState = {
    val w = words.eval(input)
    if (w != null) {
      val n = nExpr.eval(input).asInstanceOf[Int]
      s.k = math.max(s.k, kExpr.eval(input).asInstanceOf[Int])
      NGramKernel.wordSeqs(w, nestedWords)
        .foreach(NGramKernel.countNGrams(s, _, n))
      NGramKernel.prune(s)
    }
    s
  }

  override def merge(a: NGramState, b: NGramState): NGramState =
    NGramKernel.merge(a, b)
  override def eval(s: NGramState): Any =
    if (hiveShape) NGramKernel.toHiveArrayData(NGramKernel.finish(s))
    else NGramKernel.toArrayData(NGramKernel.finish(s))
  override def serialize(s: NGramState): Array[Byte] = NGramKernel.serialize(s)
  override def deserialize(bytes: Array[Byte]): NGramState =
    NGramKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): NGramsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NGramsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(words = newChildren(0), nExpr = newChildren(1), kExpr = newChildren(2))
}

/** `context_ngrams(words, pattern, k)` — counts the words filling the null
  * slots of `pattern` (ref GenericUDAFContextNGrams.java:424).
  */
case class ContextNGramsAgg(
    words: Expression, pattern: Expression, kExpr: Expression,
    hiveShape: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NGramState] {

  override def children: Seq[Expression] = Seq(words, pattern, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (hiveShape) NGramKernel.hiveOutputType else NGramKernel.outputType

  private lazy val nestedWords = words.dataType match {
    case ArrayType(ArrayType(StringType, _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (words.dataType, pattern.dataType, kExpr.dataType) match {
      case (ArrayType(StringType, _) | ArrayType(ArrayType(StringType, _), _),
            ArrayType(StringType, _) | ArrayType(NullType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "context_ngrams expects (array<string> | array<array<string>>, " +
          "array<string>, int)")
    }

  override def createAggregationBuffer(): NGramState = new NGramState()

  private lazy val nullPattern = pattern.dataType match {
    case ArrayType(NullType, _) => true
    case _ => false
  }

  override def update(s: NGramState, input: InternalRow): NGramState = {
    val w = words.eval(input)
    val p = pattern.eval(input)
    if (w != null && p != null) {
      val pat =
        if (nullPattern) // array(null[, null…]): every slot is a wildcard
          IndexedSeq.fill[String](
            p.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
              .numElements())(null)
        else NGramKernel.stringArray(p)
      s.k = math.max(s.k, kExpr.eval(input).asInstanceOf[Int])
      NGramKernel.wordSeqs(w, nestedWords)
        .foreach(NGramKernel.countContext(s, _, pat, pat.length))
      NGramKernel.prune(s)
    }
    s
  }

  override def merge(a: NGramState, b: NGramState): NGramState =
    NGramKernel.merge(a, b)
  override def eval(s: NGramState): Any =
    if (hiveShape) NGramKernel.toHiveArrayData(NGramKernel.finish(s))
    else NGramKernel.toArrayData(NGramKernel.finish(s))
  override def serialize(s: NGramState): Array[Byte] = NGramKernel.serialize(s)
  override def deserialize(bytes: Array[Byte]): NGramState =
    NGramKernel.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ContextNGramsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ContextNGramsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(words = newChildren(0), pattern = newChildren(1), kExpr = newChildren(2))
}
