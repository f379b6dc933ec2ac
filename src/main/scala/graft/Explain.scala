package graft

/** Dev tool: time + explain individual queries.
  * Usage: runMain graft.Explain <sfDir> <name> [name...]   (repeats each twice
  * so the second number is JIT/codegen-warm).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.get("graft-explain")
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[explain] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      println(fn(spark, sfDir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
