package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for text-dedup keys — absent from Spark's builtin
  * registry, yet required before any content hash: the SAME visible string
  * arrives from different sources precomposed (é = U+00E9) or decomposed
  * (e + U+0301), and md5/minhash treat them as different documents.
  * `nfc_normalize` matches DuckDB's function of the same name exactly
  * (canonical composition), so normalized-key dedup oracles byte-for-byte;
  * NFKC additionally folds compatibility forms (ﬁ ligature → fi,
  * full-width digits → ASCII) — the usual choice before training-data
  * dedup. Wraps `java.text.Normalizer` (the JDK's ICU-derived
  * implementation); eval-only, the normalization table lookup dominates.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode normalization expects a string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // fast path: Normalizer.isNormalized is a cheap scan, and real corpora
    // are overwhelmingly already-NFC ASCII
    if (Normalizer.isNormalized(s, form)) v
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
