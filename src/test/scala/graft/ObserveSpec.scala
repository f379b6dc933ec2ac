package graft

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Execution hooks — the Spark analogue of the reference's pre/post exec
  * hooks and lineage pass (SURVEY.md §2.11: ql/hooks/,
  * optimizer/lineage/Generator.java → QueryExecutionListener +
  * Dataset.observe metrics).
  */
class ObserveSpec extends SparkSpec {

  test("observe() collects named metrics during execution") {
    val observed = Tables.load(spark, sfDir, "lineitem")
      .observe("li_metrics",
        count(lit(1)).as("rows_seen"),
        sum(col("l_quantity")).as("qty_seen"))
      .filter(col("l_quantity") > 25)
    // collect() runs this DataFrame's own QueryExecution (count() would
    // build a fresh one and the metrics would land there instead)
    val kept = observed.collect().length

    val row = observed.queryExecution.observedMetrics("li_metrics")
    val total = Tables.load(spark, sfDir, "lineitem").count()
    assert(row.getAs[Long]("rows_seen") == total,
      "observe sees pre-filter rows (metric sits below the filter)")
    assert(kept < total)
    assert(row.getAs[Double]("qty_seen") > 0)
  }

  test("QueryExecutionListener fires with the executed plan (exec-hook parity)") {
    val seen = new AtomicReference[String]("")
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        seen.set(funcName + ":" + qe.executedPlan.nodeName)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Tables.load(spark, sfDir, "orders").groupBy("o_orderstatus").count().collect()
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.get.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.get.nonEmpty, "listener never fired")
    } finally spark.listenerManager.unregister(listener)
  }
}
