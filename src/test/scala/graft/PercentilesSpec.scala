package graft

import graft.operators.Percentiles
import org.apache.spark.sql.functions._

/** Laws for the bucketed-histogram exact-percentile operator: it must agree
  * with Spark's own exact `percentile` aggregate (the reference
  * UDAFPercentile semantics) for every quantile, on every bucketing — the
  * bucket width is a pure performance knob, never a semantics knob.
  */
class PercentilesSpec extends SparkSpec {

  private lazy val li = Tables.load(spark, sfDir, "lineitem")

  test("exact() matches Spark percentile across quantiles (degenerate buckets)") {
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val got = Percentiles.exact(
        li.selectExpr("l_linestatus", "cast(l_quantity AS bigint) AS q"),
        "l_linestatus", "q", col("q"), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exp = li.groupBy(col("l_linestatus"))
      .agg(expr(s"percentile(cast(l_quantity AS bigint), array(${qs.mkString(",")}))").as("p"))
      .collect().flatMap { r =>
        r.getSeq[Double](1).zip(qs).map { case (v, q) => (r.getString(0), q) -> v }
      }.toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, v) => assert(got(k) == v, s"$k: ${got(k)} vs $v") }
  }

  test("bucket width is semantics-neutral (wide-domain doubles)") {
    def run(width: Double) = Percentiles.exact(
        li, "l_linestatus", "l_extendedprice",
        floor(col("l_extendedprice") / width), Seq(0.25, 0.75))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val w100 = run(100.0)
    val w7 = run(7.0)
    val oneBucket = Percentiles.exact(li, "l_linestatus", "l_extendedprice",
        lit(0), Seq(0.25, 0.75))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(w100 == w7 && w100 == oneBucket)
  }

  test("null values are skipped like the UDAF") {
    val df = li.selectExpr("l_linestatus",
      "CASE WHEN l_orderkey % 3 = 0 THEN NULL ELSE cast(l_quantity AS bigint) END AS q")
    val got = Percentiles.exact(df, "l_linestatus", "q", col("q"), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exp = df.groupBy(col("l_linestatus"))
      .agg(expr("percentile(q, 0.5)").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == exp)
  }

  test("an all-null group yields a NULL value row per quantile (UDAF contract)") {
    val df = li.selectExpr("l_linestatus",
      "CASE WHEN l_linestatus = 'F' THEN NULL ELSE cast(l_quantity AS bigint) END AS q")
    val rows = Percentiles.exact(df, "l_linestatus", "q", col("q"), Seq(0.25, 0.75))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.isNullAt(2)).toMap
    // every (group, q) pair present — including the all-null group, as NULLs
    val groups = df.select("l_linestatus").distinct().collect().map(_.getString(0))
    assert(rows.keySet == groups.flatMap(g => Seq((g, 0.25), (g, 0.75))).toSet)
    assert(rows(("F", 0.25)) && rows(("F", 0.75)), "all-null group must be NULL")
    assert(rows.collect { case ((g, _), isNull) if g != "F" => isNull }.forall(!_))
  }

  test("exactMulti equals per-column exact() in one pass") {
    val df = li.selectExpr("l_linestatus", "cast(l_quantity AS bigint) AS q",
      "l_extendedprice")
    val multi = Percentiles.exactMulti(df, "l_linestatus", Seq(
        Percentiles.Spec("q", col("q"), Seq(0.5, 0.9)),
        Percentiles.Spec("l_extendedprice",
          floor(col("l_extendedprice") / 100), Seq(0.25))))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    val single =
      Percentiles.exact(df, "l_linestatus", "q", col("q"), Seq(0.5, 0.9))
        .collect().map(r => (r.getString(0), "q", r.getDouble(1)) -> r.getDouble(2)).toMap ++
      Percentiles.exact(df, "l_linestatus", "l_extendedprice",
          floor(col("l_extendedprice") / 100), Seq(0.25))
        .collect().map(r => (r.getString(0), "l_extendedprice", r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(multi == single)
  }
}
