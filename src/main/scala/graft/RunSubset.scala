package graft
object RunSubset {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args(1); val outDir = args(2)
    val spark = Sessions.get("graft-subset")
    spark.sparkContext.setLogLevel("WARN")
    // same per-query conf isolation as Verify (see comment there)
    names.foreach { n =>
      val qs = Sessions.isolatedClone(spark)
      SparkEntry.queries(n)(qs, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$n")
    }
    val sqls = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = sqls.map { case (k, v) =>
      Verify.jsonQuote(k) + ":" + Verify.jsonQuote(v)
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json.getBytes("UTF-8"))
    spark.stop()
  }
}
