package graft

import org.apache.spark.sql.Row

/** Hive 0.8 string↔numeric comparison coercion
  * (plans/HiveComparisonCoercion; ref ql/exec/FunctionRegistry.java:1121-1190
  * `getCommonClassForComparison` — string vs any numeric → both to double).
  *
  * The divergent trio (native Spark casts the string to the numeric side's
  * exact type instead): exponent strings (NULL vs TRUE), fractional strings
  * under ordering (truncated-int compare vs double compare), float-vs-string
  * precision (float compare vs double compare).
  */
class HiveCoercionSpec extends SparkSpec {

  private def row1(sql: String): Row = spark.sql(sql).collect()(0)

  test("divergent literal comparisons follow Hive both-to-double") {
    val r = row1("""SELECT '1e1' = 10 AS a, '3.5' > 3 AS b,
      '0.1' = cast(0.1 AS float) AS c, '1e1' = cast(10 AS tinyint) AS d,
      '2.5' BETWEEN 2 AND 3 AS e""")
    assert(r.getBoolean(0), "'1e1' = 10 must be TRUE (Hive: 10.0 = 10.0)")
    assert(r.getBoolean(1), "'3.5' > 3 must be TRUE (Hive: 3.5 > 3.0)")
    assert(!r.getBoolean(2),
      "'0.1' = float 0.1 must be FALSE (double 0.1 != widened float 0.1)")
    assert(r.getBoolean(3), "tinyint side also coerces to double")
    assert(r.getBoolean(4), "BETWEEN is two BinaryComparisons — both rewritten")
  }

  test("derived (non-foldable) columns coerce identically") {
    Tables.registerAll(spark, sfDir)
    val n = spark.sql("""SELECT count(*) AS n FROM orders
      WHERE concat(cast(o_custkey % 7 AS string), '.5') > 5""").collect()(0).getLong(0)
    // Hive semantics: k%7 + 0.5 > 5 ⇔ k%7 ∈ {5, 6}; native Spark's
    // cast-to-int truncation would also admit k%7 = 5 via 5 > 5 = false but
    // k%7 = 6 only — assert against an explicitly-double reference query
    val ref = spark.sql("""SELECT count(*) AS n FROM orders
      WHERE cast(concat(cast(o_custkey % 7 AS string), '.5') AS double) > cast(5 AS double)""")
      .collect()(0).getLong(0)
    assert(n == ref && n > 0)
  }

  test("explicit user CAST is honored, not rewritten") {
    val r = row1("SELECT CAST('1e1' AS INT) = 10 AS a, CAST('3.5' AS INT) > 3 AS b")
    assert(r.isNullAt(0), "user cast of '1e1' to INT stays NULL (bad parse)")
    assert(!r.getBoolean(1), "user cast of '3.5' to INT is 3; 3 > 3 = FALSE")
  }

  test("string-vs-double and string-vs-string paths are untouched (already Hive)") {
    val r = row1("""SELECT '3.5' > cast(3 AS double) AS a, '10' < '9' AS b""")
    assert(r.getBoolean(0), "string vs double natively coerces to double")
    assert(r.getBoolean(1), "string vs string stays lexicographic ('10' < '9')")
  }

  test("spark.graft.hiveCompareCoercion=false restores native Spark semantics") {
    spark.conf.set("spark.graft.hiveCompareCoercion", "false")
    try {
      val r = row1("SELECT '1e1' = 10 AS a")
      assert(r.isNullAt(0), "native Spark: CAST('1e1' AS INT) is NULL")
    } finally spark.conf.unset("spark.graft.hiveCompareCoercion")
  }
}
