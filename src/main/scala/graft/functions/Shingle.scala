package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-shingle md5 kernel (the decontamination probe hash of q102/q107):
  * first-occurrence-ordered distinct md5 hex digests of every n-word
  * shingle, empty when the text has fewer than n words. With
  * `dedup = false` (registered as `shingle_md5_pos`, the q124 substring-
  * scrub hash) every shingle keeps its slot: element i is the digest of
  * the shingle STARTING at word i, so posexplode yields (start, hash)
  * pairs directly.
  *
  * Semantically identical to the SQL-HOF formulation
  * {{{
  *   CASE WHEN size(ws) >= n THEN
  *     array_distinct(transform(sequence(1, size(ws) - n + 1),
  *       i -> md5(concat_ws(' ', slice(ws, i, n)))))
  *   ELSE array() END         -- ws = split(text, ' ')  (Hive split:
  * }}}                        --  trailing empty strings dropped)
  * (ShingleSpec proves equality, including consecutive-space empty words,
  * which concat_ws faithfully re-joins), evaluated in one loop: the word
  * byte slices are computed once and each shingle digest streams them
  * through a reused MessageDigest — no per-element lambda dispatch, no
  * intermediate slice arrays, no concatenated strings.
  *
  * eval-only (CodegenFallback): md5 dominates, as with winnow_mins.
  */
case class ShingleMd5(child: Expression, n: Int, dedup: Boolean = true)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override val dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("shingle_md5 expects (string, int>=1)")

  private val hexChars = "0123456789abcdef".toCharArray
  private val space = Array[Byte](' ')

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    // split on single space, preserving internal empties; Hive split
    // semantics drop TRAILING empties (the graft session's split override)
    val all = v.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    var end = all.length
    while (end > 0 && all(end - 1).numBytes() == 0) end -= 1
    val nShingles = end - n + 1
    if (nShingles <= 0) return new GenericArrayData(Array.empty[Any])

    val wordBytes = new Array[Array[Byte]](end)
    var i = 0
    while (i < end) { wordBytes(i) = all(i).getBytes; i += 1 }

    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = if (dedup) new java.util.LinkedHashSet[String]() else null
    val slots = if (dedup) null else new Array[Any](nShingles)
    i = 0
    while (i < nShingles) {
      var w = i
      while (w < i + n) {
        if (w > i) md.update(space)
        md.update(wordBytes(w))
        w += 1
      }
      val digest = md.digest()
      md.reset()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexChars((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexChars(digest(b) & 0xf)
        b += 1
      }
      if (dedup) seen.add(new String(hex))
      else slots(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    if (!dedup) return new GenericArrayData(slots)
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
