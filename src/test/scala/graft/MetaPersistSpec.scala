package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Indexes

/** Durable engine metadata (VERDICT r10 #4): index definitions, grants/
  * roles, and protect flags persist under the warehouse
  * (`_graft_metastore/`) and reload on first use — the reference keeps
  * these in metastore tables (ObjectStore.java:113: IDXS, ROLES,
  * TBL_PRIVS), so a restarted session against the same warehouse must
  * keep pruning and enforcing, not silently lapse. The "restart" here is
  * `forgetInMemory()`: in-memory registries cleared, load-on-first-use
  * re-armed — exactly the state of a fresh JVM.
  */
class MetaPersistSpec extends SparkSpec {

  test("index registry survives a restart: pruning still fires from the reloaded def") {
    val dir = Files.createTempDirectory("graft-meta-idx").toString
    Tables.load(spark, SparkTestSession.sf001, "lineitem")
      .repartitionByRange(8, col("l_partkey"))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("meta_li")
    Indexes.dropIndex(spark, "meta_pk", "meta_li", ifExists = true)
    HiveQl.sql(spark,
      "CREATE INDEX meta_pk ON TABLE meta_li (l_partkey) AS 'COMPACT'")

    // ---- restart ----
    Indexes.forgetInMemory()

    spark.conf.set("hive.optimize.index.filter", "true")
    try {
      val res = spark.table("meta_li").filter(col("l_partkey") === 1L)
      val full = spark.read.parquet(dir).inputFiles.length
      assert(res.inputFiles.length < full,
        s"reloaded index must still prune: ${res.inputFiles.length} of $full files")
      assert(res.count() > 0)
    } finally spark.conf.set("hive.optimize.index.filter", "false")

    // the reloaded def is visible to DDL too (SHOW / duplicate-create check)
    assert(HiveQl.sql(spark, "SHOW INDEXES ON meta_li").collect()
      .map(_.getString(0)).toSeq == Seq("meta_pk"))
    val e = intercept[Exception](HiveQl.sql(spark,
      "CREATE INDEX meta_pk ON TABLE meta_li (l_partkey) AS 'COMPACT'"))
    assert(e.getMessage.contains("already exists"))
    HiveQl.sql(spark, "DROP INDEX meta_pk ON meta_li")
  }

  test("grants and roles survive a restart: denial and grant both still fire") {
    Authz.reset(spark)
    spark.sql("DROP TABLE IF EXISTS meta_authz_t")
    spark.sql("CREATE TABLE meta_authz_t (k BIGINT) USING parquet")
    HiveQl.sql(spark, "CREATE ROLE meta_readers")
    HiveQl.sql(spark, "GRANT ROLE meta_readers TO USER alice")
    HiveQl.sql(spark, "GRANT Select ON TABLE meta_authz_t TO ROLE meta_readers")

    // ---- restart ----
    Authz.forgetInMemory()

    spark.conf.set("hive.security.authorization.enabled", "true")
    try {
      spark.conf.set("hive.session.user", "alice")
      // alice reads through her persisted role grant
      HiveQl.sql(spark, "SELECT count(*) AS c FROM meta_authz_t").collect()
      // mallory still has nothing — the denial must fire post-restart
      spark.conf.set("hive.session.user", "mallory")
      val e = intercept[SecurityException](
        HiveQl.sql(spark, "SELECT count(*) AS c FROM meta_authz_t").collect())
      assert(e.getMessage.contains("No privilege 'Select' found"), e.getMessage)
    } finally {
      spark.conf.unset("hive.security.authorization.enabled")
      spark.conf.unset("hive.session.user")
    }
    Authz.reset(spark)
    spark.sql("DROP TABLE meta_authz_t")
  }

  test("protect flags survive a restart: NO_DROP still blocks DROP TABLE") {
    spark.sql("DROP TABLE IF EXISTS meta_prot_t")
    spark.sql("CREATE TABLE meta_prot_t (k BIGINT) USING parquet")
    HiveQl.sql(spark, "ALTER TABLE meta_prot_t ENABLE NO_DROP")

    // ---- restart ----
    Protect.forgetInMemory()

    val e = intercept[Exception](HiveQl.sql(spark, "DROP TABLE meta_prot_t"))
    assert(e.getMessage.contains("protected from being dropped"), e.getMessage)
    HiveQl.sql(spark, "ALTER TABLE meta_prot_t DISABLE NO_DROP")
    HiveQl.sql(spark, "DROP TABLE meta_prot_t")
  }
}
