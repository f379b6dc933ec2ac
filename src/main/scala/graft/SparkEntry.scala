package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator module into the `queries` /
  * `oracleSql` maps consumed by [[Verify]] (DuckDB correctness gate) and
  * [[Bench]] (throughput gate).
  */
object SparkEntry {

  /** Ordered module registry — one module per SURVEY.md §2 capability area. */
  def modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.HiveFunctions,
    operators.Dedup,
    operators.TextAnalysis,
    operators.Multimodal,
    operators.Misc,
    operators.QFileParity,
    operators.QFileParity2,
    operators.QFileParity3,
    operators.QFileParity4,
    operators.QFileParity5,
    operators.QFileParity6,
    operators.QFileParity7,
    operators.QFileParity8,
    operators.QFileParity9,
    operators.QFileParity10,
    operators.QFileParity11,
    operators.QFileParity12,
    operators.QFileParity13,
    operators.QFileParity14,
    operators.QFileParity15,
    operators.QFileParity16,
    operators.QFileParity17,
    operators.QFileParity18,
    operators.QFileParity19,
    operators.QFileParity20,
    operators.QFileParity21,
    operators.QFileParity22,
    operators.QFileParity23,
    operators.QFileParity24,
    operators.QFileParity25,
    operators.QFileParity26,
    operators.QFileParity27,
    operators.QFileParity28,
    operators.QFileParity29,
    operators.QFileParity30,
    operators.QFileParity31,
    operators.QFileParity32,
    operators.QFileParity33,
    operators.QFileParity34,
    operators.QFileParity35,
    operators.QFileParity36,
    operators.QFileParity37,
    operators.Indexes,
    operators.ScaleOps,
    streaming.Streaming)

  private lazy val all: Seq[QueryDef] = {
    val ds = modules.flatMap(_.defs)
    val dup = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every entry is conf-ISOLATED at the registry boundary: the QueryDef
    * runs against a `newSession()` clone of the caller's session (shared
    * SparkContext + catalog, private SQLConf + temp views + function
    * registry). A `.q`-battery `SET hive.*` therefore cannot escape its own
    * query — not into the caller's session and not into a neighboring
    * query — no matter who invokes the registry (Verify, Bench, a spec, or
    * a driver-owned session). This retires the r11 q224→q178 leak class
    * structurally instead of per-QueryDef discipline.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> isolated(d.fn)).toMap

  private def isolated(fn: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => DataFrame = (s, dir) => {
    // a caller that already built a throwaway clone (Bench's per-pass
    // session, Verify's per-query session) marks it; re-wrapping would
    // only pay a second SessionState build inside the caller's timer
    if (s.conf.get(Sessions.IsolatedFlag, "false").toBoolean) fn(s, dir)
    else {
      val qs = Sessions.isolatedClone(s)
      fn(qs, dir)
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(o => d.name -> o)).toMap
}
