package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the reference functions Spark lacks
  * (SURVEY.md §2.8/§7.3):
  *
  *  - `field(needle, v1, ..., vn)` — 1-based position of needle in the list,
  *    0 when absent/null (ref ql/udf/generic/GenericUDFField, registered
  *    FunctionRegistry.java:276).
  *  - `hive_hash(e1, ..., en)` — Hive's Java-style int hash (31*h + h_i),
  *    ≠ Spark's murmur3 `hash()` (ref GenericUDFHash, FunctionRegistry.java:417
  *    + ObjectInspectorUtils.hashCode semantics).
  *  - `parse_url_tuple(url, part1, ..., partn)` — one-row generator emitting
  *    n URL parts (ref udf/generic/GenericUDTFParseUrlTuple, registered
  *    FunctionRegistry.java:436).
  */
object GraftFunctions {

  type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def reg(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression): Registration =
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, name), builder)

  val registrations: Seq[Registration] = Seq(
    reg("field", classOf[Field], Field(_)),
    reg("hive_hash", classOf[HiveHash08], HiveHash08(_)),
    reg("parse_url_tuple", classOf[ParseUrlTuple], ParseUrlTuple(_)),
    reg("bitmap_agg", classOf[BitmapAgg],
      es => BitmapAgg(es.head).toAggregateExpression()),
    reg("bitmap_and", classOf[BitmapCombine],
      es => BitmapCombine(es(0), es(1), isAnd = true)),
    reg("bitmap_or", classOf[BitmapCombine],
      es => BitmapCombine(es(0), es(1), isAnd = false)),
    reg("bitmap_count", classOf[BitmapCount], es => BitmapCount(es.head)))
}

/** `field(needle, v1..vn)`: 1-based index of the first vi equal to needle,
  * else 0. All arguments must share the needle's type (callers cast).
  * Cold-path lookup function → interpreted eval (CodegenFallback); the hot
  * relational path never routes through it.
  */
case class Field(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.size < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "field() needs a needle and at least one candidate")
    else if (children.exists(c => c.dataType != children.head.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "field() arguments must all have the needle's type")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def eval(input: InternalRow): Any = {
    val needle = children.head.eval(input)
    if (needle == null) return 0
    var i = 1
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v != null && v == needle) return i
      i += 1
    }
    0
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** Static hash kernels shared by interpreted eval and generated code. */
object HiveHashUtil {
  def hashLong(v: Long): Int = (v ^ (v >>> 32)).toInt
  def hashDouble(v: Double): Int = hashLong(java.lang.Double.doubleToLongBits(v))
  def hashFloat(v: Float): Int = java.lang.Float.floatToIntBits(v)
  def hashString(s: UTF8String): Int = s.toString.hashCode
}

/** Variadic Hive-0.8 hash: h = 31*h + hash(arg_i), null contributes 0.
  * Whole-stage-codegen'd (doGenCode emits straight-line Java calling the
  * [[HiveHashUtil]] kernels) so it can sit in hot projections.
  */
case class HiveHash08(children: Seq[Expression]) extends Expression {
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.isEmpty)
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "hive_hash needs at least one argument")
    val ok = children.forall(c => c.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | TimestampType | DateType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "hive_hash supports primitive (bool/int/float/string/ts/date) args")
  }

  private def elemHash(v: Any, dt: DataType): Int = dt match {
    case BooleanType => if (v.asInstanceOf[Boolean]) 1 else 0
    case ByteType => v.asInstanceOf[Byte].toInt
    case ShortType => v.asInstanceOf[Short].toInt
    case IntegerType | DateType => v.asInstanceOf[Int]
    case LongType | TimestampType => HiveHashUtil.hashLong(v.asInstanceOf[Long])
    case FloatType => HiveHashUtil.hashFloat(v.asInstanceOf[Float])
    case DoubleType => HiveHashUtil.hashDouble(v.asInstanceOf[Double])
    case StringType => HiveHashUtil.hashString(v.asInstanceOf[UTF8String])
    case _ => 0
  }

  override def eval(input: InternalRow): Any = {
    var h = 0
    children.foreach { c =>
      val v = c.eval(input)
      h = 31 * h + (if (v == null) 0 else elemHash(v, c.dataType))
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // top-level object → static forwarders on the companion class
    val util = HiveHashUtil.getClass.getName.stripSuffix("$")
    val h = ctx.freshName("hiveHash")
    def call(dt: DataType, value: String): String = dt match {
      case BooleanType => s"($value ? 1 : 0)"
      case ByteType | ShortType => s"(int) $value"
      case IntegerType | DateType => value
      case LongType | TimestampType => s"$util.hashLong($value)"
      case FloatType => s"$util.hashFloat($value)"
      case DoubleType => s"$util.hashDouble($value)"
      case StringType => s"$util.hashString($value)"
      case _ => "0"
    }
    val parts = children.map { c =>
      val g = c.genCode(ctx)
      code"""
        ${g.code}
        $h = 31 * $h + (${g.isNull} ? 0 : ${call(c.dataType, g.value.toString)});
      """
    }
    ev.copy(
      code = code"int $h = 0;" + parts.reduce(_ + _),
      isNull = FalseLiteral,
      value = JavaCode.variable(h, IntegerType))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** `parse_url_tuple(url, 'HOST', 'PATH', 'QUERY:k', ...)`: generator emitting
  * one row of n string columns c0..c(n-1), null where the part is absent —
  * mirrors json_tuple's column naming. Parses the URL once per row (the
  * reference caches the last URL for the same reason,
  * GenericUDTFParseUrlTuple).
  */
case class ParseUrlTuple(children: Seq[Expression])
    extends Generator with CodegenFallback {
  private lazy val partExprs = children.tail
  override def elementSchema: StructType = StructType(
    partExprs.zipWithIndex.map { case (_, i) =>
      StructField(s"c$i", StringType, nullable = true)
    })
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.size < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "parse_url_tuple needs a url and at least one part")
    else if (children.exists(_.dataType != StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "parse_url_tuple arguments must be strings")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private def part(uri: java.net.URI, spec: String): UTF8String = {
    val s =
      if (spec.startsWith("QUERY:")) {
        val key = spec.substring(6)
        val q = uri.getRawQuery
        if (q == null) null
        else q.split("&").collectFirst {
          case kv if kv.startsWith(key + "=") => kv.substring(key.length + 1)
        }.orNull
      } else spec match {
        case "HOST" => uri.getHost
        case "PATH" => uri.getRawPath
        case "QUERY" => uri.getRawQuery
        case "REF" => uri.getRawFragment
        case "PROTOCOL" => uri.getScheme
        case "AUTHORITY" => uri.getRawAuthority
        case "USERINFO" => uri.getRawUserInfo
        case "FILE" =>
          val p = uri.getRawPath
          val q = uri.getRawQuery
          if (p == null) null else if (q == null) p else s"$p?$q"
        case _ => null
      }
    if (s == null) null else UTF8String.fromString(s)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val url = children.head.eval(input)
    val n = partExprs.size
    val out = new Array[Any](n)
    if (url != null) {
      val uri =
        try new java.net.URI(url.asInstanceOf[UTF8String].toString)
        catch { case _: java.net.URISyntaxException => null }
      if (uri != null) {
        var i = 0
        while (i < n) {
          val spec = partExprs(i).eval(input)
          if (spec != null)
            out(i) = part(uri, spec.asInstanceOf[UTF8String].toString)
          i += 1
        }
      }
    }
    Seq(InternalRow.fromSeq(out.toIndexedSeq))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}
