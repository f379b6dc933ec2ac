package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Laws for the bucketized range join: bin width is a pure performance knob
  * (results identical at any width), and the result matches the naive
  * nested-loop formulation exactly — including the no-duplicate guarantee
  * (each qualifying pair meets in exactly one bin).
  */
class RangeJoinSpec extends SparkSpec {

  private def pairs(width: Long): Set[(Long, Long)] = {
    val ev = Tables.load(spark, sfDir, "events")
    val intervals = ev.filter(col("event_type") === "error")
      .selectExpr("event_id AS inc_id", "ts AS w_start",
        "ts + INTERVAL 47 MINUTES AS w_end")
    val points = ev.filter(col("event_type") === "view")
      .selectExpr("event_id AS view_id", "ts AS c_ts")
    RangeJoin.pointsInIntervals(points, "c_ts", intervals, "w_start", "w_end", width)
      .select(col("view_id"), col("inc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("matches the naive cross-join formulation, no duplicate pairs") {
    val ev = Tables.load(spark, sfDir, "events")
    val intervals = ev.filter(col("event_type") === "error")
      .selectExpr("event_id AS inc_id", "ts AS w_start",
        "ts + INTERVAL 47 MINUTES AS w_end")
    val points = ev.filter(col("event_type") === "view")
      .selectExpr("event_id AS view_id", "ts AS c_ts")
    val naive = points.crossJoin(intervals)
      .filter(col("c_ts") >= col("w_start") && col("c_ts") <= col("w_end"))
      .select(col("view_id"), col("inc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(naive.length == naive.toSet.size) // sanity on the oracle itself
    val got = RangeJoin.pointsInIntervals(
        points, "c_ts", intervals, "w_start", "w_end", 600)
      .select(col("view_id"), col("inc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "bucketed join produced duplicates")
    assert(got.toSet == naive.toSet)
    assert(got.nonEmpty)
  }

  test("bin width is semantics-neutral") {
    val w60 = pairs(60)
    assert(pairs(3600) == w60 && pairs(613) == w60)
  }
}
