package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed points-in-intervals (range) join.
  *
  * A pure range predicate (`p BETWEEN start AND end` with no equi-key) gives
  * Spark no join keys, so Catalyst plans BroadcastNestedLoopJoin — O(|P|·|I|)
  * comparisons, the classic scale killer. This operator restores an
  * equi-join plan by quantizing time into fixed-width bins:
  *
  *   - each point belongs to exactly ONE bin;
  *   - each interval explodes to the bins it covers
  *     (ceil(length/width) + 1 rows);
  *   - the join is a hash equi-join on bin, with the exact BETWEEN as a
  *     residual filter.
  *
  * Because the point has a single bin, every qualifying (point, interval)
  * pair meets in exactly one bin — no post-join dedup. Cost model: the
  * interval side replicates by its bin fan-out, so pick `binSeconds` near
  * the typical interval length (fan-out ≈ 2); shuffle volume is then
  * ~|P| + 2|I| rows keyed by bin, and skew (a hot time bucket) is AQE's
  * standard case. Works unchanged when the interval side is broadcast-small.
  */
object RangeJoin {

  /** Inner points-in-intervals join. Caller guarantees disjoint column names
    * between the two sides (the result carries both).
    */
  def pointsInIntervals(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    val w = binSeconds * 1000000L // micros
    val p = points.withColumn("__bin",
      expr(s"floor(unix_micros($pointCol) / ${w}L)"))
    val i = intervals.withColumn("__bin",
      explode(expr(
        s"sequence(floor(unix_micros($startCol) / ${w}L), floor(unix_micros($endCol) / ${w}L))")))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
