package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint kernel (the rolling-hash scheme of the
  * standard winnowing algorithm): character k-grams → first 8 md5 hex chars
  * → per-window-of-w minimum → sorted distinct mins.
  *
  * Semantically identical to the SQL-HOF formulation
  * `array_sort(array_distinct(transform(seq, j -> array_min(slice(hs, j, w)))))`
  * with `hs = transform(seq, i -> substr(md5(substring(text, i, k)), 1, 8))`
  * (WinnowSpec proves equality), but evaluated in one tight loop: no
  * interpreted lambda dispatch, no intermediate array allocation per step,
  * one reused MessageDigest. Returns `struct<n_kgrams: int,
  * mins: array<string>>` so the gram count needs no second pass.
  *
  * `eval`-only (CodegenFallback): the md5 work dominates; codegen would
  * only inline the loop shell.
  */
case class WinnowMins(child: Expression, gramLen: Int, window: Int)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override val dataType: DataType = StructType(Seq(
    StructField("n_kgrams", IntegerType, nullable = false),
    StructField("mins", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("winnow_mins expects a string")

  private val hexChars = "0123456789abcdef".toCharArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return InternalRow(0, new GenericArrayData(Array.empty[Any]))
    val text = v.asInstanceOf[UTF8String]
    val nChars = text.numChars()
    val nGrams = nChars - gramLen + 1
    if (nGrams <= 0) return InternalRow(0, new GenericArrayData(Array.empty[Any]))

    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      // substringSQL is 1-based and char-correct — the exact semantics of
      // Spark's substring(text, i, k) the SQL formulation uses
      val gram = text.substringSQL(i + 1, gramLen)
      val digest = md.digest(gram.getBytes)
      md.reset()
      val hex = new Array[Char](8)
      var b = 0
      while (b < 4) {
        hex(2 * b) = hexChars((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexChars(digest(b) & 0xf)
        b += 1
      }
      hs(i) = new String(hex)
      i += 1
    }

    val nWindows = nGrams - window + 1
    if (nWindows <= 0) return InternalRow(nGrams, new GenericArrayData(Array.empty[Any]))
    val mins = new java.util.TreeSet[String]()
    var j = 0
    while (j < nWindows) {
      var m = hs(j)
      var t = j + 1
      while (t < j + window) {
        if (hs(t).compareTo(m) < 0) m = hs(t)
        t += 1
      }
      mins.add(m)
      j += 1
    }
    val out = new Array[Any](mins.size)
    var o = 0
    val it = mins.iterator()
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    InternalRow(nGrams, new GenericArrayData(out))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
