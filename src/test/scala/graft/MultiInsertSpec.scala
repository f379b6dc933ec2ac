package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.util.QueryExecutionListener

/** Multi-insert single-scan executor (SURVEY §7.4 hard part 3; ref
  * parse/Hive.g:1385-1419, SemanticAnalyzer.java:1385-1419 — one map phase
  * feeds N FileSinks). The scan assertion counts executed
  * FileSourceScanExec nodes over the source: with the shared cache the
  * branches read the InMemoryRelation (0 top-level file scans — the one
  * real scan happens inside the cache fill, which Spark materializes
  * exactly once); with materialize=none every branch re-scans the files
  * (N file scans). The 0-vs-N pair is the single-scan evidence.
  */
class MultiInsertSpec extends SparkSpec {

  /** file scans of `needle` in an executed plan, NOT descending into
    * cached relations (an InMemoryTableScan reads blocks, not files)
    */
  private def fileScans(p: SparkPlan, needle: String): Int = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan, needle)
    case q: QueryStageExec => fileScans(q.plan, needle) // AQE stages are leaves
    case f: FileSourceScanExec =>
      if (f.relation.location.rootPaths.exists(_.toString.contains(needle))) 1 else 0
    case _: InMemoryTableScanExec => 0
    case other => other.children.map(fileScans(_, needle)).sum
  }

  /** total `needle` file scans across every query executed in `body`
    * (QueryExecutionListener is async — poll until the count is stable)
    */
  private def countSourceScans(needle: String)(body: => Unit): Int = {
    val n = new AtomicInteger
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        n.addAndGet(fileScans(qe.executedPlan, needle))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      body
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 5 && System.nanoTime() < deadline) {
        val cur = n.get
        if (cur == last) stable += 1 else { stable = 0; last = cur }
        Thread.sleep(100)
      }
    } finally spark.listenerManager.unregister(l)
    n.get
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val stmtFor = (t1: String, t2: String) => s"""
    FROM orders
    INSERT OVERWRITE TABLE $t1 SELECT o_orderkey, o_totalprice WHERE o_totalprice < 150000
    INSERT OVERWRITE TABLE $t2 SELECT o_orderkey, o_totalprice WHERE o_totalprice >= 150000"""

  private def mkPair(wh: String, t1: String, t2: String): Unit = {
    spark.sql(s"CREATE TABLE $t1 (k BIGINT, price DOUBLE) USING parquet LOCATION '$wh/a'")
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, price DOUBLE) USING parquet LOCATION '$wh/b'")
  }

  test("multi-insert scans the common source once (0 file scans vs N uncached)") {
    Tables.registerAll(spark, sfDir)
    mkPair(tmp("graft-mi-c"), "mis_c1", "mis_c2")
    mkPair(tmp("graft-mi-u"), "mis_u1", "mis_u2")
    try {
      val cached = countSourceScans("orders") {
        HiveQl.sql(spark, stmtFor("mis_c1", "mis_c2"))
      }
      spark.conf.set("spark.graft.multiInsert.materialize", "none")
      val uncached =
        try countSourceScans("orders") { HiveQl.sql(spark, stmtFor("mis_u1", "mis_u2")) }
        finally spark.conf.unset("spark.graft.multiInsert.materialize")

      // both modes produce identical, complete results
      val total = spark.table("orders").count()
      for ((a, b) <- Seq(("mis_c1", "mis_c2"), ("mis_u1", "mis_u2"))) {
        val (na, nb) = (spark.table(a).count(), spark.table(b).count())
        assert(na > 0 && nb > 0 && na + nb == total,
          s"branches must partition the source: $a=$na $b=$nb total=$total")
      }
      assert(cached == 0,
        s"cached fan-out must not re-scan source files per branch, saw $cached")
      assert(uncached == 2,
        s"materialize=none is the per-branch re-scan baseline, saw $uncached")

      // the executor pruned the cache to exactly the referenced columns
      val rep = operators.MultiInsert.lastReport.get
      assert(rep.cachedColumns.map(_.toLowerCase).toSet ==
        Set("o_orderkey", "o_totalprice"),
        s"cache must hold only branch-referenced columns: ${rep.cachedColumns}")
    } finally Seq("mis_c1", "mis_c2", "mis_u1", "mis_u2")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("WHERE-less and aggregate branches work; subquery source is cached") {
    Tables.registerAll(spark, sfDir)
    val wh = tmp("graft-mi-sub")
    spark.sql(s"CREATE TABLE mis_cnt (st STRING, n BIGINT) USING parquet LOCATION '$wh/cnt'")
    spark.sql(s"CREATE TABLE mis_all (k BIGINT) USING parquet LOCATION '$wh/all'")
    try {
      HiveQl.sql(spark, """
        FROM (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey <= 100) src
        INSERT OVERWRITE TABLE mis_cnt SELECT o_orderstatus, count(*) GROUP BY o_orderstatus
        INSERT OVERWRITE TABLE mis_all SELECT o_orderkey""")
      val cnt = spark.table("mis_cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val all = spark.table("mis_all").count()
      assert(all == cnt.values.sum && all ==
        spark.sql("SELECT count(*) FROM orders WHERE o_orderkey <= 100").collect()(0).getLong(0))
      assert(operators.MultiInsert.lastReport.get.materialized)
    } finally {
      spark.sql("DROP TABLE IF EXISTS mis_cnt")
      spark.sql("DROP TABLE IF EXISTS mis_all")
    }
  }

  test("partitioned INSERT branches (static + dynamic partition spec)") {
    Tables.registerAll(spark, sfDir)
    val wh = tmp("graft-mi-part")
    spark.sql(s"""CREATE TABLE mis_ps (k BIGINT) USING parquet
      PARTITIONED BY (tag STRING) LOCATION '$wh/ps'""")
    spark.sql(s"""CREATE TABLE mis_pd (k BIGINT) USING parquet
      PARTITIONED BY (st STRING) LOCATION '$wh/pd'""")
    try {
      HiveQl.sql(spark, """
        FROM orders
        INSERT OVERWRITE TABLE mis_ps PARTITION (tag='lo') SELECT o_orderkey WHERE o_orderkey <= 50
        INSERT OVERWRITE TABLE mis_pd PARTITION (st) SELECT o_orderkey, o_orderstatus WHERE o_orderkey <= 500""")
      assert(operators.MultiInsert.lastReport.get.materialized)
      assert(spark.table("mis_ps").filter(col("tag") === "lo").count() ==
        spark.sql("SELECT count(*) FROM orders WHERE o_orderkey <= 50").collect()(0).getLong(0))
      val byStatus = spark.table("mis_pd").groupBy("st").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exp = spark.sql("""SELECT o_orderstatus, count(*) FROM orders
          WHERE o_orderkey <= 500 GROUP BY o_orderstatus""")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byStatus == exp, s"dynamic partitions must fan out: $byStatus vs $exp")
    } finally {
      spark.sql("DROP TABLE IF EXISTS mis_ps")
      spark.sql("DROP TABLE IF EXISTS mis_pd")
    }
  }

  test("join-shaped source is shared per table: each base table scanned once") {
    Tables.registerAll(spark, sfDir)
    val wh = tmp("graft-mi-join")
    for (t <- Seq("mis_j1", "mis_j2", "mis_j3", "mis_j4"))
      spark.sql(s"CREATE TABLE $t (n STRING) USING parquet LOCATION '$wh/$t'")
    val stmt = (t1: String, t2: String) => s"""
        FROM nation JOIN region ON n_regionkey = r_regionkey
        INSERT OVERWRITE TABLE $t1 SELECT n_name WHERE r_name = 'ASIA'
        INSERT OVERWRITE TABLE $t2 SELECT r_name WHERE n_name = 'NATION_3'"""
    try {
      operators.MultiInsert.lastReport = None
      // cached: branches re-run the join over the cached per-table blocks —
      // zero top-level file scans of either base table (0-vs-N as for the
      // simple source; the single real scan per table is the cache fill)
      val (nCached, rCached) = {
        var r = -1
        val n = countSourceScans("nation") {
          r = countSourceScans("region") { HiveQl.sql(spark, stmt("mis_j1", "mis_j2")) }
        }
        (n, r)
      }
      val rep = operators.MultiInsert.lastReport
        .getOrElse(fail("join source must be handled, not fall back"))
      assert(rep.materialized)
      // pruned per table: only branch/join-referenced columns are cached
      assert(rep.cachedColumns.map(_.toLowerCase).toSet ==
        Set("nation.n_name", "nation.n_regionkey", "region.r_name", "region.r_regionkey"),
        s"per-table pruning: ${rep.cachedColumns}")

      spark.conf.set("spark.graft.multiInsert.materialize", "none")
      val (nRaw, rRaw) =
        try {
          var r = -1
          val n = countSourceScans("nation") {
            r = countSourceScans("region") { HiveQl.sql(spark, stmt("mis_j3", "mis_j4")) }
          }
          (n, r)
        } finally spark.conf.unset("spark.graft.multiInsert.materialize")

      assert(nCached == 0 && rCached == 0,
        s"cached join fan-out must not re-scan base tables: nation=$nCached region=$rCached")
      assert(nRaw == 2 && rRaw == 2,
        s"materialize=none re-scans each table per branch: nation=$nRaw region=$rRaw")

      // both modes correct and identical
      val asia = spark.sql(
        "SELECT count(*) FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'")
        .collect()(0).getLong(0)
      for ((a, b) <- Seq(("mis_j1", "mis_j2"), ("mis_j3", "mis_j4"))) {
        assert(spark.table(a).count() == asia && asia > 0)
        assert(spark.table(b).count() == 1) // each nation joins exactly one region
      }
    } finally Seq("mis_j1", "mis_j2", "mis_j3", "mis_j4")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("join-source tokenizer is literal-safe: parens/JOIN inside ON strings") {
    Tables.registerAll(spark, sfDir)
    val wh = tmp("graft-mi-lit")
    for (t <- Seq("mis_l1", "mis_l2"))
      spark.sql(s"CREATE TABLE $t (n STRING) USING parquet LOCATION '$wh/$t'")
    try {
      operators.MultiInsert.lastReport = None
      // the ON condition carries a literal with an unbalanced paren AND a
      // JOIN keyword — masking must keep the tokenizer's depth-0 view intact
      // and the literal must reach the executed branches byte-identical
      HiveQl.sql(spark, """
        FROM nation JOIN region ON n_regionkey = r_regionkey
             AND r_name != '(x JOIN'
        INSERT OVERWRITE TABLE mis_l1 SELECT n_name WHERE r_name = 'ASIA'
        INSERT OVERWRITE TABLE mis_l2 SELECT r_name WHERE n_name = 'NATION_3'""")
      val rep = operators.MultiInsert.lastReport
        .getOrElse(fail("literal-bearing join source must still be shared"))
      assert(rep.branchSql.forall(_.contains("'(x JOIN'")),
        s"literal must survive the rewrite verbatim: ${rep.branchSql}")
      val asia = spark.sql(
        """SELECT count(*) FROM nation JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'""").collect()(0).getLong(0)
      assert(spark.table("mis_l1").count() == asia && asia > 0)
      assert(spark.table("mis_l2").count() == 1)
    } finally Seq("mis_l1", "mis_l2")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
