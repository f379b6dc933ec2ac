package graft

/** Dev tool: time + explain individual queries.
  * Usage: runMain graft.Explain <sfDir> <name> [name...]   (repeats each twice
  * so the second number is JIT/codegen-warm).
  *
  * When SPARK_GRAFT_PLAN_DIR is set, also writes each query's
  * `explain("formatted")` output (the optimization-round plan artifact) to
  * `<dir>/<name><SPARK_GRAFT_PLAN_SUFFIX>.txt` — e.g.
  * SPARK_GRAFT_PLAN_SUFFIX=_before → plans/r17/q235_before.txt.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.get("graft-explain")
    spark.sparkContext.setLogLevel("WARN")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[explain] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val df = fn(spark, sfDir)
      planDir.foreach { d =>
        val out = java.nio.file.Paths.get(d, s"$name$suffix.txt")
        java.nio.file.Files.createDirectories(out.getParent)
        // the FORMATTED plan of the query's RESULT dataframe. For QueryDefs
        // that are mostly DDL/INSERT side effects this shows the final
        // readback; the side-effect plans are visible through the timing
        // above and the code diff.
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(out, formatted.getBytes("UTF-8"))
        println(s"[explain] wrote $out")
      }
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
