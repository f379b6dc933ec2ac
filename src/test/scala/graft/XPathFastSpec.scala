package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The graft xpath family (functions/XPathFast.scala) shadows Spark's
  * builtins under the Hive names (FunctionRegistry.java:309-317). This suite
  * proves output equality against the ORIGINAL builtins — re-registered here
  * under `b_`-prefixed names straight from FunctionRegistry.builtin — across
  * every return kind, then pins the deliberate reference-parity divergences
  * (GenericUDFXPath.java:78 empty-list-not-null; null-valued nodes skipped).
  */
class XPathFastSpec extends SparkSpec {
  import spark.implicits._

  private val kinds = Seq("xpath", "xpath_string", "xpath_boolean",
    "xpath_short", "xpath_int", "xpath_long", "xpath_float", "xpath_double",
    "xpath_number")

  private def ensureBuiltins(): Unit = kinds.foreach { name =>
    val ident = new FunctionIdentifier("b_" + name)
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      val builder = FunctionRegistry.builtin
        .lookupFunctionBuilder(new FunctionIdentifier(name))
        .getOrElse(fail(s"no builtin $name"))
      spark.sessionState.functionRegistry.registerFunction(
        ident, new ExpressionInfo("builtin", "b_" + name), builder)
    }
  }

  private val docs = Seq(
    "<r><b>Brand#13</b><s>7</s></r>",
    "<a><b>b1</b><b>b2</b><b>b3</b><c>c1</c><c>c2</c></a>",
    "<a attr=\"va\"><b k=\"1\">x</b><b k=\"2\">y</b></a>",
    "<n><v>1</v><v>2.5</v><v>-3</v></n>",
    "<t><x>true</x><y>0</y></t>",
    "<empty/>")

  private val paths = Seq(
    "r/b", "r/s", "r/missing", "a/b", "a/b[2]", "a/b/text()", "a/c/text()",
    "a/*/text()", "a/@attr", "a/b/@k", "sum(n/v)", "count(a/b)", "n/v",
    "t/x", "t/y", "missing/only")

  test("every kind matches the Spark builtin over the doc x path battery") {
    ensureBuiltins()
    // the builtin requires a FOLDABLE path (graft's accepts a column too) —
    // iterate paths as SQL literals so both sides analyze
    paths.foreach { p =>
      val lit = "'" + p.replace("\\", "\\\\") + "'"
      // aggregate paths (sum/count) produce a NUMBER, which neither engine
      // can convert to a NodeList (both throw) — skip the list form there.
      // For node-set paths: builtin emits null entries for element nodes
      // (getNodeValue null) where the reference SKIPS them — compare after
      // filtering nulls out of the builtin result, which is exact on
      // text()/attribute paths and pins the skip semantics on element paths
      val isNodeSet = !p.startsWith("sum(") && !p.startsWith("count(")
      val listCols =
        if (isNodeSet) Seq(
          s"filter(b_xpath(x, $lit), e -> e IS NOT NULL) AS bl",
          s"xpath(x, $lit) AS gl")
        else Seq("array() AS bl", "array() AS gl")
      val rows = docs.toDF("x").selectExpr(
        (Seq("x") ++ listCols) ++
          kinds.tail.flatMap(k => Seq(s"b_$k(x, $lit) AS b_$k", s"$k(x, $lit) AS g_$k")): _*)
        .collect()
      rows.foreach { r =>
        val ctx = s"xml=${r.getString(0)} path=$p"
        assert(r.getSeq[String](1) == r.getSeq[String](2), s"xpath list: $ctx")
        kinds.tail.zipWithIndex.foreach { case (k, i) =>
          val b = r.get(3 + 2 * i)
          val g = r.get(4 + 2 * i)
          val bothNaN = (b, g) match {
            case (x: java.lang.Double, y: java.lang.Double) => x.isNaN && y.isNaN
            case (x: java.lang.Float, y: java.lang.Float) => x.isNaN && y.isNaN
            case _ => false
          }
          assert(b == g || bothNaN, s"$k: $ctx (builtin=$b graft=$g)")
        }
      }
    }
  }

  test("reference parity corners: empty inputs, bad path, null propagation") {
    // empty xml → scalar kinds null, list form EMPTY (GenericUDFXPath.java:78
    // emptyResult; Spark's builtin returns null there — deliberate divergence)
    val r = spark.sql(
      """SELECT xpath('', 'a/b') AS l, xpath_string('', 'a/b') AS s,
                xpath_int('<a><b>1</b></a>', '') AS i,
                xpath('<a><b>1</b></a>', '\\invalid[') AS badl,
                xpath_string('<a><b>1</b></a>', '\\invalid[') AS bads,
                xpath(CAST(NULL AS STRING), 'a') AS nl,
                xpath_boolean('<a/>', CAST(NULL AS STRING)) AS nb""").head()
    assert(r.getSeq[String](0) == Seq())
    assert(r.isNullAt(1))
    assert(r.isNullAt(2))
    assert(r.getSeq[String](3) == Seq())
    assert(r.isNullAt(4))
    assert(r.isNullAt(5), "null xml -> null (null-intolerant binary expr)")
    assert(r.isNullAt(6))
  }

  test("missing-node conversions match the reference kernels") {
    // STRING → '', BOOLEAN → false, NUMBER → NaN → integral 0
    // (UDFXPathInteger.java:36 Double.intValue on NaN)
    val r = spark.sql(
      """SELECT xpath_string('<a><b>1</b></a>', 'a/c') AS s,
                xpath_boolean('<a><b>1</b></a>', 'a/c') AS bo,
                xpath_int('<a><b>1</b></a>', 'a/c') AS i,
                xpath_long('<a><b>1</b></a>', 'a/c') AS l,
                xpath_double('<a><b>1</b></a>', 'a/c') AS d,
                xpath_number('<a><b>7</b></a>', 'sum(a/b)') AS n""").head()
    assert(r.getString(0) == "")
    assert(!r.getBoolean(1))
    assert(r.getInt(2) == 0)
    assert(r.getLong(3) == 0L)
    assert(r.getDouble(4).isNaN)
    assert(r.getDouble(5) == 7.0)
  }

  test("malformed XML throws, like the reference and the builtin") {
    val e = intercept[Exception] {
      spark.sql("SELECT xpath_string('<a><unclosed>', 'a')").collect()
    }
    assert(e.getMessage != null)
  }
}
