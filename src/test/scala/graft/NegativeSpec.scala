package graft

import org.apache.spark.sql.AnalysisException

/** Error-path coverage — the analogue of the reference's clientnegative
  * corpus (285 error tests, SURVEY.md §5): bad SQL, type-check failures of
  * the custom expressions, and unresolvable references must fail with
  * diagnosable errors, not wrong results.
  */
class NegativeSpec extends SparkSpec {

  test("parse error surfaces as an exception, not a silent empty result") {
    val e = intercept[Exception](spark.sql("SELEC o_orderkey FRUM orders"))
    assert(e.getMessage.toUpperCase.contains("SYNTAX"))
  }

  test("field() accepts mixed argument types; off-type candidates never match") {
    // GenericUDFField takes any primitive mix — udf_field.q goldens pin
    // field('66', 66, 88) = 0 (no coercion) rather than an analysis error
    assert(spark.range(1).selectExpr("field('a', 'b', 3, 'a')")
      .head().getInt(0) === 3)
    assert(spark.range(1).selectExpr("field('3', 3, '4')")
      .head().getInt(0) === 0)
  }

  test("field() rejects a lone needle") {
    val e = intercept[AnalysisException](
      spark.range(1).selectExpr("field('a')").collect())
    assert(e.getMessage.contains("at least one candidate"), e.getMessage)
  }

  test("hive_hash rejects zero args and non-primitive args") {
    val e1 = intercept[AnalysisException](
      spark.range(1).selectExpr("hive_hash()").collect())
    assert(e1.getMessage.contains("at least one argument"), e1.getMessage)
    val e2 = intercept[AnalysisException](
      spark.range(1).selectExpr("hive_hash(array(1, 2))").collect())
    assert(e2.getMessage.contains("primitive"), e2.getMessage)
  }

  test("parse_url_tuple rejects non-string parts") {
    val e = intercept[AnalysisException](
      spark.range(1).selectExpr("parse_url_tuple('http://x', 1) AS (a)").collect())
    assert(e.getMessage.contains("strings"), e.getMessage)
  }

  test("unresolved column names the candidates") {
    Tables.registerAll(spark, sfDir)
    val e = intercept[AnalysisException](
      spark.sql("SELECT no_such_col FROM orders").collect())
    assert(e.getMessage.contains("no_such_col"))
  }

  test("LOAD DATA into a missing table fails with the table name") {
    val e = intercept[Exception](
      HiveQl.sql(spark, "LOAD DATA INPATH '/tmp/nowhere' INTO TABLE no_such_table"))
    assert(e.getMessage.contains("no_such_table"), e.getMessage)
  }

  test("multi-statement input to HiveQl.sql fails loudly, never half-runs") {
    // statement splitting is the CLI's job (GraftSql); the single-statement
    // entry must refuse a `;`-joined pair rather than silently running one
    val e = intercept[Exception](
      HiveQl.sql(spark, "SELECT 1 AS a; SELECT 2 AS b").collect())
    assert(e.getMessage != null, "loud refusal required")
  }

  test("unterminated string literal is a loud pre-parse error") {
    val e = intercept[IllegalArgumentException](
      HiveQl.rewrite("SELECT 'unterminated FROM t"))
    assert(e.getMessage.contains("unterminated"), e.getMessage)
  }

  test("malformed UNIQUEJOIN source list is rejected, not misparsed") {
    val e = intercept[IllegalArgumentException](
      HiveQl.rewrite("SELECT a.k FROM UNIQUEJOIN uj_a a, uj_b b (b.k)"))
    assert(e.getMessage.contains("UNIQUEJOIN"), e.getMessage)
  }

  test("bitmap_agg rejects non-integral keys instead of returning empty") {
    Tables.registerAll(spark, sfDir)
    val e = intercept[AnalysisException](
      spark.sql("SELECT bitmap_count(bitmap_agg(o_orderstatus)) FROM orders")
        .collect())
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("freq_items rejects non-string items and non-int capacity") {
    val e1 = intercept[Exception](
      spark.sql("SELECT freq_items(1.5, 4)").collect())
    assert(e1.getMessage.contains("freq_items") || e1.getMessage.contains("DATATYPE"),
      e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT freq_items('a', 'not_an_int')").collect())
    assert(e2.getMessage.contains("freq_items") || e2.getMessage.contains("DATATYPE"),
      e2.getMessage)
  }

  test("freq_items rejects NULL and non-positive capacity loudly") {
    // k <= 0 would make the MG trim evict every counter and silently
    // return [] — must be a registration-time error, not empty output
    Seq("SELECT freq_items('a', cast(NULL AS int))",
        "SELECT freq_items('a', 0)",
        "SELECT freq_items('a', -3)").foreach { sql =>
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains("freq_items"), s"$sql => ${e.getMessage}")
    }
  }

  test("shingle_md5 requires a literal integer n") {
    val e = intercept[Exception](
      spark.sql("SELECT shingle_md5('a b c', length('xx'))").collect())
    assert(e.getMessage.contains("shingle_md5"), e.getMessage)
  }

  test("vec_normalize rejects non-numeric element types") {
    val e = intercept[Exception](
      spark.sql("SELECT vec_normalize(array('a', 'b'))").collect())
    assert(e.getMessage.contains("vec_normalize") || e.getMessage.contains("DATATYPE"),
      e.getMessage)
  }
}
