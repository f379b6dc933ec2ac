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
  *   1. counts rows per (group, coarse bucket) — a codegen'd hash agg whose
  *      key space is |groups| × |buckets|, thousands, regardless of row
  *      count;
  *   2. walks the cumulative histogram (tiny) to find, for each requested
  *      order statistic floor/ceil((n-1)*q), WHICH bucket holds it and at
  *      what within-bucket offset;
  *   3. re-scans, keeps only rows of the few needed buckets (broadcast
  *      semi-join against the spec rows), sorts those ~per-bucket-row-count
  *      rows, and picks the offset.
  *
  * Two scans, all whole-stage-codegen, shuffles only histogram-sized data;
  * per-task memory is O(max bucket population) — tuned by `bucket`. At
  * 100 TB the same plan holds: the histogram agg is map-side partial, the
  * selection join broadcasts a handful of spec rows.
  *
  * Returns one row per (group, q) with column `value`.
  */
object Percentiles {

  /** @param df      input rows
    * @param groupCol grouping column (appears in output as its name)
    * @param valCol  numeric value column (nulls skipped, like the UDAF)
    * @param bucket  coarse-bucket expression over `valCol` — must be
    *                monotonic in the value (e.g. floor(v / 100)); ties in
    *                v land in one bucket by construction
    * @param qs      quantiles in [0, 1]
    */
  def exact(df: DataFrame, groupCol: String, valCol: String,
      bucket: Column, qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = col(groupCol)
    // bucket is evaluated against df's original columns (before the rename)
    val rows = df.select(g, col(valCol).as("v"), bucket.cast("bigint").as("b"))
      .filter(col("v").isNotNull)

    // 1. histogram: |groups| × |buckets| rows, map-side partial agg
    val hist = rows.groupBy(g, col("b")).agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(g).orderBy(col("b"))
    val cum = hist.withColumn("cum", sum(col("c")).over(wOrd))
    val nPer = hist.groupBy(g).agg(sum(col("c")).as("n"))

    // 2. per (group, q): target indexes lo/hi and the bucket+offset holding
    //    each — a non-equi join, but both sides are histogram-sized
    val qArr = array(qs.map(lit): _*)
    val targets = nPer
      .withColumn("qv", explode(qArr))
      .withColumn("pos", (col("n") - 1) * col("qv"))
      .select(g, col("qv"), col("pos"),
        explode(array_distinct(array(floor(col("pos")), ceil(col("pos")))))
          .as("idx"))
    val specs = targets.join(cum,
        targets(groupCol) === cum(groupCol) &&
          col("idx").between(col("cum") - col("c"), col("cum") - 1))
      .select(targets(groupCol), col("qv"), col("pos"), col("idx"),
        col("b"), (col("idx") - (col("cum") - col("c"))).as("off"))

    // 3. selection scan: only rows of needed buckets survive the broadcast
    //    join; each (group, q, idx) sorts one bucket's population
    val wSel = Window.partitionBy(g, col("qv"), col("idx")).orderBy(col("v"))
    val picked = rows.join(broadcast(specs), Seq(groupCol, "b"))
      .withColumn("rn", row_number().over(wSel))
      .filter(col("rn") === col("off") + 1)

    picked.groupBy(g, col("qv"))
      .agg(
        max(when(col("idx") === floor(col("pos")), col("v"))).as("v_lo"),
        max(when(col("idx") === ceil(col("pos")), col("v"))).as("v_hi"),
        first(col("pos") - floor(col("pos"))).as("frac"))
      .select(g, col("qv"),
        (col("v_lo") + (col("v_hi") - col("v_lo")) * col("frac")).as("value"))
  }
}
