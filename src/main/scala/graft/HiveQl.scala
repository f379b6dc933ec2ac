package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HiveQL dialect entry point (SURVEY.md §7.2 M1). Spark 4 parses nearly the
  * whole Hive-0.8 grammar natively (SORT/DISTRIBUTE/CLUSTER BY, LATERAL
  * VIEW, TABLESAMPLE, TRANSFORM, multi-insert); this layer rewrites only
  * the hint comments whose spelling changed: MAPJOIN(t) (Hive.g:1472-1499)
  * becomes BROADCAST(t), and STREAMTABLE(t) (JoinReorder.java:39) is
  * dropped — Catalyst's CBO join reordering subsumes the manual
  * streaming-side choice.
  */
object HiveQl {
  private val MapJoin = """(?i)/\*\+\s*MAPJOIN\s*\(([^)]*)\)\s*\*/""".r
  private val StreamTable = """(?i)/\*\+\s*STREAMTABLE\s*\(([^)]*)\)\s*\*/""".r

  def rewrite(q: String): String = {
    val noStream = StreamTable.replaceAllIn(q, "")
    MapJoin.replaceAllIn(noStream, m => s"/*+ BROADCAST(${m.group(1)}) */")
  }

  def sql(spark: SparkSession, q: String): DataFrame = spark.sql(rewrite(q))
}
