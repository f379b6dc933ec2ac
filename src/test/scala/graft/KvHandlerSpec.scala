package graft

import org.apache.spark.sql.functions._

import graft.sources.kv.KvStore

/** The storage-handler subsystem (closes the §7.5 HBase-handler drop at
  * subsystem level): STORED BY DDL with the reference's column-mapping
  * syntax and MetaHook lifecycle, DSv2 reads with key-range pushdown,
  * family maps, upsert writes, INSERT OVERWRITE truncation.
  */
class KvHandlerSpec extends SparkSpec {

  private def dropAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS kv_t")
    spark.sql("DROP TABLE IF EXISTS kv_ext")
    KvStore.reset()
  }

  test("STORED BY DDL: mapping, upsert writes, reads, family map") {
    dropAll()
    HiveQl.sql(spark,
      """CREATE TABLE kv_t (rk STRING, name STRING, score STRING, attrs MAP<STRING,STRING>)
         STORED BY 'kv'
         WITH SERDEPROPERTIES ('kv.columns.mapping' = ':key,d:name,d:score,meta:')""")
    assert(KvStore.exists("kv_t"), "managed CREATE creates the store table")

    spark.sql("""INSERT INTO kv_t VALUES
      ('r1', 'alice', '10', map('a', '1', 'b', '2')),
      ('r2', 'bob',   '20', map()),
      ('r3', 'carol', '30', map('z', '9'))""")
    val rows = spark.table("kv_t").orderBy("rk").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("r1", "r2", "r3"))
    assert(rows.map(_.getString(1)).toSeq == Seq("alice", "bob", "carol"))
    assert(rows(0).getMap[String, String](3).toMap == Map("a" -> "1", "b" -> "2"))

    // HBase Put semantics: writing the same key UPSERTS cells
    spark.sql("INSERT INTO kv_t VALUES ('r2', 'bobby', '20', map('n', '5'))")
    val r2 = spark.table("kv_t").filter(col("rk") === "r2").collect().head
    assert(r2.getString(1) == "bobby", "same-key write updates the cell")
    assert(r2.getMap[String, String](3).toMap == Map("n" -> "5"))
    assert(spark.table("kv_t").count() == 3, "no duplicate row for the key")

    // INSERT OVERWRITE truncates (SupportsTruncate)
    spark.sql("INSERT OVERWRITE kv_t VALUES ('x', 'only', '1', map())")
    assert(spark.table("kv_t").collect().map(_.getString(0)).toSeq == Seq("x"))
    dropAll()
  }

  test("key-range predicate pushdown narrows the scan (decomposePredicate)") {
    dropAll()
    HiveQl.sql(spark,
      """CREATE TABLE kv_t (rk STRING, v STRING) STORED BY 'kv'
         WITH SERDEPROPERTIES ('kv.columns.mapping' = ':key,d:v')""")
    spark.sql("INSERT INTO kv_t SELECT concat('k', lpad(cast(id AS string), 4, '0')), cast(id AS string) FROM range(1000)")
    val q = spark.table("kv_t")
      .filter(col("rk") >= "k0100" && col("rk") < "k0200")
    assert(q.count() == 100)
    // the pushed range is visible in the executed plan (PushedFilters /
    // the scan's range description)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("k0100") || plan.contains("PushedFilters"),
      s"key range should reach the scan:\n$plan")
    // equality narrows to a single key
    assert(spark.table("kv_t").filter(col("rk") === "k0042")
      .collect().map(_.getString(1)).toSeq == Seq("42"))
    // non-key predicates stay residual and correct
    assert(spark.table("kv_t").filter(col("v") === "7").count() == 1)
    dropAll()
  }

  test("EXTERNAL requires an existing store table; managed DROP drops it") {
    dropAll()
    val e = intercept[Exception](HiveQl.sql(spark,
      """CREATE EXTERNAL TABLE kv_ext (rk STRING, v STRING) STORED BY 'kv'
         WITH SERDEPROPERTIES ('kv.columns.mapping' = ':key,d:v',
                               'kv.table.name' = 'shared_kv')"""))
    assert(e.getMessage.contains("does not exist"),
      "HBaseMetaHook preCreateTable external check")

    // managed table creates the store; an EXTERNAL view over the SAME
    // store table then shares the data (the HBase multi-table pattern)
    HiveQl.sql(spark,
      """CREATE TABLE kv_t (rk STRING, v STRING) STORED BY 'kv'
         WITH SERDEPROPERTIES ('kv.columns.mapping' = ':key,d:v',
                               'kv.table.name' = 'shared_kv')""")
    HiveQl.sql(spark,
      """CREATE EXTERNAL TABLE kv_ext (rk STRING, v STRING) STORED BY 'kv'
         WITH SERDEPROPERTIES ('kv.columns.mapping' = ':key,d:v',
                               'kv.table.name' = 'shared_kv')""")
    spark.sql("INSERT INTO kv_t VALUES ('a', '1')")
    assert(spark.table("kv_ext").count() == 1, "external sees managed writes")

    // dropping the EXTERNAL table leaves the store; dropping the MANAGED
    // one removes it (HiveMetaHook commitDropTable semantics)
    spark.sql("DROP TABLE kv_ext")
    assert(KvStore.exists("shared_kv"))
    spark.sql("DROP TABLE kv_t")
    assert(!KvStore.exists("shared_kv"))
    dropAll()
  }

  test("mapping validation mirrors HBaseSerDe") {
    dropAll()
    val noMap = intercept[Exception](HiveQl.sql(spark,
      "CREATE TABLE kv_t (rk STRING) STORED BY 'kv'"))
    assert(noMap.getMessage.contains("No kv.columns.mapping"),
      "HBaseStorageHandler.java:146 message shape")
    val unknown = intercept[Exception](HiveQl.sql(spark,
      """CREATE TABLE kv_t (rk STRING) STORED BY 'com.example.Foo'
         WITH SERDEPROPERTIES ('kv.columns.mapping' = ':key')"""))
    assert(unknown.getMessage.contains("not available"))
    dropAll()
  }
}
