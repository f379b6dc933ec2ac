package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates whose algorithms differ from DuckDB's (SURVEY.md
  * §2.5: percentile_approx is histogram-based in the reference, GK/KLL-style
  * in engines) — verified by tolerance against the exact answer instead of
  * the hash oracle, plus bitmap-aggregate algebra laws.
  */
class ApproxAggSpec extends SparkSpec {

  test("percentile_approx within 1% of exact percentile") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx")).head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.01, s"exact=$exact approx=$approx")
  }

  test("approx_count_distinct (q113) within 3*rsd of the exact vocabulary") {
    val words = Tables.load(spark, sfDir, "documents")
      .selectExpr("lang", "explode(split(trim(text), ' ')) AS word")
      .filter(length(col("word")) > 0)
    val rows = words.groupBy(col("lang"))
      .agg(approx_count_distinct(col("word"), 0.02).as("approx"),
        countDistinct(col("word")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact <= 0.06,
        s"lang=${r.getString(0)} exact=$exact approx=$approx")
    }
  }

  test("histogram_numeric bins cover the data (counts sum to rows)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val bins = li.agg(expr("histogram_numeric(l_quantity, 10)").as("h"))
      .selectExpr("explode(h) AS b").selectExpr("b.x", "b.y")
      .collect()
    assert(bins.length == 10)
    val total = bins.map(_.getDouble(1)).sum
    assert(math.round(total) == li.count())
  }

  test("bitmap_agg algebra: and/or cardinalities match set semantics") {
    Tables.registerAll(spark, sfDir)
    val r = spark.sql("""
      WITH bm AS (SELECT l_returnflag, bitmap_agg(l_suppkey) AS b
                  FROM lineitem GROUP BY l_returnflag)
      SELECT bitmap_count(a.b) AS ca, bitmap_count(n.b) AS cn,
             bitmap_count(bitmap_and(a.b, n.b)) AS cand,
             bitmap_count(bitmap_or(a.b, n.b)) AS cor
      FROM (SELECT b FROM bm WHERE l_returnflag = 'A') a,
           (SELECT b FROM bm WHERE l_returnflag = 'N') n""").head()
    val Seq(ca, cn, cand, cor) =
      (0 to 3).map(i => r.getAs[Number](i).intValue)
    // inclusion-exclusion must hold exactly for exact bitmaps
    assert(ca + cn - cand == cor, s"|A|+|N|-|A∩N| != |A∪N|: $ca $cn $cand $cor")
    assert(cand <= math.min(ca, cn) && cor >= math.max(ca, cn))
    // and the cardinality must be the true distinct count, not a byte-level
    // artifact (guards against builtin bitmap_count popcount shadowing)
    val exact = spark.sql(
      "SELECT count(DISTINCT l_suppkey) FROM lineitem WHERE l_returnflag = 'A'")
      .head().getLong(0).toInt
    assert(ca == exact, s"bitmap cardinality $ca != exact distinct $exact")
  }

  test("ewah_* reference names resolve to the bitmap family (registry :349-351,:401)") {
    Tables.registerAll(spark, sfDir)
    val r = spark.sql("""
      WITH bm AS (SELECT l_returnflag, ewah_bitmap(l_suppkey) AS b
                  FROM lineitem GROUP BY l_returnflag)
      SELECT bitmap_count(ewah_bitmap_and(a.b, n.b)) AS cand,
             bitmap_count(ewah_bitmap_or(a.b, n.b)) AS cor,
             ewah_bitmap_empty(ewah_bitmap_and(a.b, n.b)) AS and_empty,
             ewah_bitmap_empty(ewah_bitmap_or(a.b, n.b)) AS or_empty
      FROM (SELECT b FROM bm WHERE l_returnflag = 'A') a,
           (SELECT b FROM bm WHERE l_returnflag = 'N') n""").head()
    assert(r.getInt(1) >= r.getInt(0))
    assert(r.getBoolean(2) == (r.getInt(0) == 0) && !r.getBoolean(3))
  }
}
