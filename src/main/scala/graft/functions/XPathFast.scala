package graft.functions

import javax.xml.namespace.QName
import javax.xml.parsers.{DocumentBuilder, DocumentBuilderFactory}
import javax.xml.xpath.{XPath, XPathConstants, XPathExpression, XPathExpressionException, XPathFactory}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM-wide xpath kernel (ref ql/udf/xml/UDFXPathUtil.java:40 and the
  * UDFXPath{String,Boolean,Integer,Short,Long,Float,Double} wrappers,
  * FunctionRegistry.java:309-317).
  *
  * Why not Spark's builtin: its parser state lives in a `transient lazy`
  * per-expression evaluator, so every deserialized task instance re-runs
  * `DocumentBuilderFactory.newInstance()` + `XPathFactory.newInstance()` —
  * each a ServiceLoader scan over every classpath jar (hundreds under
  * /opt/spark/jars) that can cost seconds on a cold or contended filesystem.
  * Here both factory lookups happen exactly once per JVM (static init) and
  * each thread keeps a reusable DocumentBuilder + XPath + compiled-path
  * cache, so the steady-state per-row cost is just the small-document parse.
  *
  * Semantics follow the reference exactly:
  *  - null/empty xml or path → null result (UDFXPathUtil.eval:48-55)
  *  - an uncompilable path → null, cached so it isn't re-tried per row
  *  - malformed XML → RuntimeException (both the reference and Spark throw)
  *  - `xpath` (list form) returns an EMPTY array, never null, once inputs are
  *    non-null (GenericUDFXPath.java:78 emptyResult) — Spark's builtin
  *    returns null there; the reference's shape wins under the Hive names
  *  - missing node: STRING → '', BOOLEAN → false, NUMBER → NaN (numeric
  *    casts then produce 0 via Java Double.intValue, like the reference's
  *    UDFXPathInteger.java:36)
  */
object XPathKernel {
  // the two ServiceLoader scans, once per JVM ever
  private val dbf: DocumentBuilderFactory = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // the entity-resolution hardening Spark's UDFXPathUtil pins
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f
  }
  private val xpf: XPathFactory = XPathFactory.newInstance()

  /** uncompilable-path sentinel (cached so bad paths aren't re-compiled per row) */
  private val BadPath = new Object

  private final class State {
    val builder: DocumentBuilder = dbf.synchronized(dbf.newDocumentBuilder())
    val xp: XPath = xpf.synchronized(xpf.newXPath())
    val compiled = new java.util.HashMap[String, AnyRef]()
  }
  private val state = ThreadLocal.withInitial[State](() => new State)

  private def eval(xml: UTF8String, path: UTF8String, q: QName): AnyRef = {
    val xs = xml.toString
    val ps = path.toString
    if (xs.isEmpty || ps.isEmpty) return null
    val st = state.get()
    var ex = st.compiled.get(ps)
    if (ex == null) {
      ex = try st.xp.compile(ps)
      catch { case _: XPathExpressionException => BadPath }
      // paths are almost always plan constants; the cap only guards a
      // pathological column-valued path from growing the map unboundedly
      if (st.compiled.size > 64) st.compiled.clear()
      st.compiled.put(ps, ex)
    }
    if (ex eq BadPath) return null
    val doc =
      try st.builder.parse(new org.xml.sax.InputSource(new java.io.StringReader(xs)))
      catch { case e: Exception =>
        throw new RuntimeException(s"Invalid XML document: ${e.getMessage}")
      }
    try ex.asInstanceOf[XPathExpression].evaluate(doc, q)
    catch { case _: XPathExpressionException =>
      throw new RuntimeException(s"Invalid expression '$ps'")
    }
  }

  def evalString(xml: UTF8String, path: UTF8String): UTF8String = {
    val r = eval(xml, path, XPathConstants.STRING)
    if (r == null) null else UTF8String.fromString(r.asInstanceOf[String])
  }

  def evalBoolean(xml: UTF8String, path: UTF8String): java.lang.Boolean =
    eval(xml, path, XPathConstants.BOOLEAN).asInstanceOf[java.lang.Boolean]

  def evalNumber(xml: UTF8String, path: UTF8String): java.lang.Double =
    eval(xml, path, XPathConstants.NUMBER).asInstanceOf[java.lang.Double]

  def evalList(xml: UTF8String, path: UTF8String): ArrayData = {
    val r = eval(xml, path, XPathConstants.NODESET)
    if (r == null) return new GenericArrayData(Array.empty[Any])
    val nodes = r.asInstanceOf[org.w3c.dom.NodeList]
    val out = Seq.newBuilder[Any]
    var i = 0
    while (i < nodes.getLength) {
      // getNodeValue: text for text()/attribute nodes, null for elements —
      // null values are SKIPPED, not emitted (GenericUDFXPath.java:82-86)
      val v = nodes.item(i).getNodeValue
      if (v != null) out += UTF8String.fromString(v)
      i += 1
    }
    new GenericArrayData(out.result())
  }
}

/** All nine Hive xpath functions as one codegen'd expression over
  * [[XPathKernel]]; `kind` selects the return conversion. Registered under
  * the builtin names (GraftFunctions.overridesBuiltin) so ported HiveQL —
  * and q58 — get the once-per-JVM parser path.
  */
case class HiveXPath(left: Expression, right: Expression, kind: String)
    extends BinaryExpression {

  override def prettyName: String =
    if (kind == "list") "xpath" else s"xpath_$kind"

  override def dataType: DataType = kind match {
    case "boolean" => BooleanType
    case "short" => ShortType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" | "number" => DoubleType
    case "string" => StringType
    case "list" => ArrayType(StringType, containsNull = false)
  }

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string xml, string path)")

  override protected def nullSafeEval(xml: Any, path: Any): Any = {
    val x = xml.asInstanceOf[UTF8String]
    val p = path.asInstanceOf[UTF8String]
    kind match {
      case "string" => XPathKernel.evalString(x, p)
      case "boolean" => XPathKernel.evalBoolean(x, p)
      case "list" => XPathKernel.evalList(x, p)
      case _ =>
        val d = XPathKernel.evalNumber(x, p)
        if (d == null) null
        else kind match {
          case "short" => d.shortValue()
          case "int" => d.intValue()
          case "long" => d.longValue()
          case "float" => d.floatValue()
          case _ => d.doubleValue()
        }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = XPathKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (x, p) => {
      val tmp = ctx.freshName("xres")
      kind match {
        case "string" =>
          s"""org.apache.spark.unsafe.types.UTF8String $tmp = $kernel.evalString($x, $p);
             |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }""".stripMargin
        case "boolean" =>
          s"""java.lang.Boolean $tmp = $kernel.evalBoolean($x, $p);
             |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.booleanValue(); }""".stripMargin
        case "list" =>
          s"${ev.value} = $kernel.evalList($x, $p);"
        case _ =>
          val conv = kind match {
            case "short" => "shortValue"
            case "int" => "intValue"
            case "long" => "longValue"
            case "float" => "floatValue"
            case _ => "doubleValue"
          }
          s"""java.lang.Double $tmp = $kernel.evalNumber($x, $p);
             |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.$conv(); }""".stripMargin
      }
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
