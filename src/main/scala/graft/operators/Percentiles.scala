package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT percentile via bucketed-histogram order-statistic
  * selection (ref UDAFPercentile.java semantics; same interpolation as
  * Spark's Percentile / DuckDB quantile_cont: v_lo + (v_hi - v_lo) * frac
  * at position (n-1)*q).
  *
  * The naive exact plans don't scale: a percentile UDAF buffers O(distinct
  * values) per group in ONE aggregation buffer, and a global
  * sort/window-cumsum materializes and sorts every row of the group on one
  * task. This operator instead:
  *
  *   1. counts rows per (group, metric, coarse bucket) — a codegen'd hash
  *      agg whose key space is |groups| × |metrics| × |buckets|, thousands,
  *      regardless of row count;
  *   2. walks the cumulative histogram (tiny) to find, for each requested
  *      order statistic floor/ceil((n-1)*q), WHICH bucket holds it and at
  *      what within-bucket offset;
  *   3. re-scans, keeps only rows of the few needed buckets (broadcast
  *      semi-join against the spec rows), sorts those ~per-bucket-row-count
  *      rows, and picks the offset.
  *
  * Two scans TOTAL for any number of value columns (the input is melted to
  * (group, metric, v, bucket) rows in-scan), all whole-stage-codegen,
  * shuffles only histogram-sized data; per-task memory is O(max bucket
  * population) — tuned by each metric's `bucket`. At 100 TB the same plan
  * holds: the histogram agg is map-side partial, the selection join
  * broadcasts a handful of spec rows.
  *
  * A group whose values are ALL null yields a row with NULL `value` per
  * quantile — the UDAFPercentile null-group contract (it would otherwise
  * vanish: no non-null row reaches the histogram).
  */
object Percentiles {

  /** One value column to extract percentiles for.
    *
    * @param valCol numeric value column (nulls skipped, like the UDAF)
    * @param bucket coarse-bucket expression over `valCol` — must be
    *               monotonic in the value (e.g. floor(v / 100)) and null
    *               on null input; ties in v land in one bucket by
    *               construction
    * @param qs     quantiles in [0, 1]
    */
  final case class Spec(valCol: String, bucket: Column, qs: Seq[Double])

  /** Single-column form; output columns (groupCol, qv, value). */
  def exact(df: DataFrame, groupCol: String, valCol: String,
      bucket: Column, qs: Seq[Double]): DataFrame =
    exactMulti(df, groupCol, Seq(Spec(valCol, bucket, qs))).drop("metric")

  /** Multi-column form: one histogram pass + one selection pass for ALL
    * specs. Output: one row per (group, metric, qv) with column `value`,
    * metric = the spec's valCol name.
    */
  def exactMulti(df: DataFrame, groupCol: String, specs: Seq[Spec]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(specs.nonEmpty && specs.map(_.valCol).distinct.size == specs.size,
      "specs must be non-empty with distinct value columns")
    val g = col(groupCol)
    // melt: one (group, metric, v, b) row per input row per spec — bucket
    // expressions are evaluated against df's original columns, in-scan
    val rows = df.select(g, explode(array(specs.map { sp =>
        struct(lit(sp.valCol).as("metric"),
          col(sp.valCol).cast("double").as("v"),
          sp.bucket.cast("bigint").as("b"))
      }: _*)).as("mv"))
      .select(g, col("mv.metric").as("metric"), col("mv.v").as("v"),
        col("mv.b").as("b"))

    // each metric's quantile list, dispatched on the metric column
    val qvArr = coalesce(specs.map(sp =>
      when(col("metric") === sp.valCol, array(sp.qs.map(lit): _*))): _*)

    // 1. histogram: |groups| × |metrics| × |buckets| rows, map-side partial
    //    agg. Null values stay in (c counts only non-null v) so an all-null
    //    (group, metric) still SURFACES here with n = 0.
    val hist = rows.groupBy(g, col("metric"), col("b"))
      .agg(count(col("v")).as("c"))
    val wOrd = Window.partitionBy(g, col("metric")).orderBy(col("b"))
    val cum = hist.withColumn("cum", sum(col("c")).over(wOrd))
    val nPer = hist.groupBy(g, col("metric")).agg(sum(col("c")).as("n"))

    // 2. per (group, metric, q): target indexes lo/hi and the bucket+offset
    //    holding each — a non-equi join, but both sides are histogram-sized
    val targets = nPer.filter(col("n") > 0)
      .withColumn("qv", explode(qvArr))
      .withColumn("pos", (col("n") - 1) * col("qv"))
      .select(g, col("metric"), col("qv"), col("pos"),
        explode(array_distinct(array(floor(col("pos")), ceil(col("pos")))))
          .as("idx"))
    val specRows = targets.join(cum,
        targets(groupCol) === cum(groupCol) &&
          targets("metric") === cum("metric") &&
          col("idx").between(col("cum") - col("c"), col("cum") - 1))
      .select(targets(groupCol), targets("metric"), col("qv"), col("pos"),
        col("idx"), col("b"), (col("idx") - (col("cum") - col("c"))).as("off"))

    // 3. selection scan: only non-null rows of needed buckets survive the
    //    broadcast join; each (group, metric, q, idx) sorts one bucket
    val wSel = Window.partitionBy(g, col("metric"), col("qv"), col("idx"))
      .orderBy(col("v"))
    val picked = rows.filter(col("v").isNotNull)
      .join(broadcast(specRows), Seq(groupCol, "metric", "b"))
      .withColumn("rn", row_number().over(wSel))
      .filter(col("rn") === col("off") + 1)

    val computed = picked.groupBy(g, col("metric"), col("qv"))
      .agg(
        max(when(col("idx") === floor(col("pos")), col("v"))).as("v_lo"),
        max(when(col("idx") === ceil(col("pos")), col("v"))).as("v_hi"),
        first(col("pos") - floor(col("pos"))).as("frac"))
      .select(g, col("metric"), col("qv"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) * col("frac")).as("value"))

    // all-null (group, metric): one NULL-value row per requested quantile
    val nullGroups = nPer.filter(col("n") === 0)
      .withColumn("qv", explode(qvArr))
      .select(g, col("metric"), col("qv"),
        lit(null).cast("double").as("value"))
    computed.unionByName(nullGroups)
  }
}
