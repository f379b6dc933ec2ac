package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (semi-join reduction): Spark injects a
  * `might_contain` probe built from the selective creation side into the
  * large application side, so a 100 TB fact scan drops non-joining rows
  * before the shuffle — the runtime analogue of the reference's static
  * partition pruning, and the scale lever for selective dim-fact joins
  * that AQE's broadcast path doesn't cover. Thresholds are tuned down to
  * fire on fixture-sized inputs; the result must equal the unfiltered join.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective join injects a bloom probe into the fact side (and stays correct)") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ords = Tables.load(spark, sfDir, "orders")
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"))
      val joined = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(l_extendedprice * 100) AS bigint)")).as("cents"))
      assert(joined.queryExecution.optimizedPlan.toString.contains("might_contain"),
        s"bloom probe not injected:\n${joined.queryExecution.optimizedPlan}")
      val r = joined.head()

      // same join with runtime filtering off — results must be identical
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(l_extendedprice * 100) AS bigint)")).as("cents"))
        .head()
      assert(r == plain, s"bloom-filtered result diverged: $r vs $plain")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
