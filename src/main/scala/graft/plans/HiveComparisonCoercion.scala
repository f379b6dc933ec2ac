package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Hive 0.8 string↔numeric comparison coercion
  * (ref ql/exec/FunctionRegistry.java:1121-1190).
  *
  * `getCommonClassForComparison` walks the numeric promotion ladder
  * tinyint→…→double→string and returns the FIRST type both sides implicitly
  * convert to; since string only converts to double
  * (`implicitConvertable`:1165), comparing a string with ANY numeric type
  * casts BOTH sides to double. Modern Spark instead casts the string to the
  * other side's exact type, which silently diverges for ported HiveQL:
  *
  *   - `'1e1' = 10`   → Hive 10.0 = 10.0 → TRUE; Spark CAST('1e1' AS INT)
  *     is NULL (string-to-integral parses digits only) → NULL
  *   - `'3.5' > 3`    → Hive 3.5 > 3.0 → TRUE; Spark NULL
  *   - `'0.1' = CAST(0.1 AS FLOAT)` → Hive compares at double precision
  *     (0.1 ≠ 0.10000000149…) → FALSE; Spark casts the string to FLOAT and
  *     compares at float precision → TRUE
  *
  * The rewrite targets exactly the casts BUILTIN COERCION inserted: Spark
  * tags parser/API casts with `Cast.USER_SPECIFIED_CAST`, so an untagged
  * string-source cast inside a comparison whose other side has the cast's
  * target type can only come from `PromoteStrings`. Explicit
  * `CAST('1e1' AS INT) = 10` is therefore honored Spark/Hive-style (both
  * engines null the bad parse) and never rewritten.
  *
  * Scope: string vs tinyint/smallint/int/bigint/float. String-vs-double and
  * string-vs-decimal already coerce to double natively (matching Hive), and
  * string-vs-date/timestamp follows Spark's string-compare rule — a
  * documented divergence (SURVEY §7.4): Hive 0.8 has no date type and its
  * timestamp↔string comparison predates the reference's test surface.
  *
  * Runs in the Resolution fixed point after builtin coercion (extension
  * rules append to the batch), so it sees the coerced shape and converges in
  * one extra iteration (both sides double → no rule matches). A comparison
  * always returns BooleanType, so no operator schema above can change.
  * Disable with `spark.graft.hiveCompareCoercion=false`.
  */
object HiveComparisonCoercion extends Rule[LogicalPlan] {

  /** types whose string-comparison coercion diverges from Hive's */
  private def divergentTarget(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType => true
    case _ => false
  }

  private def coercionCast(c: Cast, other: Expression): Boolean =
    c.child.resolved && other.resolved &&
      c.child.dataType == StringType && divergentTarget(c.dataType) &&
      other.dataType == c.dataType &&
      c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty

  private def dbl(e: Expression): Expression = Cast(e, DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.hiveCompareCoercion", "true").toBoolean) plan
    else plan.resolveExpressions {
      case cmp: BinaryComparison =>
        (cmp.left, cmp.right) match {
          case (c: Cast, other) if coercionCast(c, other) =>
            cmp.withNewChildren(Seq(dbl(c.child), dbl(other)))
          case (other, c: Cast) if coercionCast(c, other) =>
            cmp.withNewChildren(Seq(dbl(other), dbl(c.child)))
          case _ => cmp
        }
    }
}
