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

  // ---- r17 delta-log semantics (VERDICT r16 #4 + ADVICE #2/#3) ----

  private def metaDir: java.nio.file.Path =
    java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "_graft_metastore")

  import MetaCodec.modeCodec
  private implicit val modeEnc: org.apache.spark.sql.Encoder[ModeRow] =
    org.apache.spark.sql.Encoders.product[ModeRow]

  test("mutations append row-level deltas; reset compacts the log away") {
    MetaPersist.delete(spark, "mp17_store")
    MetaPersist.append(spark, "mp17_store", ModeRow("t1", noDrop = true, offline = false))
    MetaPersist.append(spark, "mp17_store", ModeRow("t2", noDrop = false, offline = true))
    MetaPersist.appendDelete(spark, "mp17_store", ModeRow("t1", noDrop = false, offline = false))
    val log = metaDir.resolve("mp17_store.log")
    assert(Files.exists(log), "mutations must land in the delta log")
    assert(Files.readAllLines(log).size == 3, "one line per mutation")
    assert(MetaPersist.load[ModeRow](spark, "mp17_store").get ==
      Seq(ModeRow("t2", noDrop = false, offline = true)))
    // a full overwrite (reset/compaction) folds everything into the snap
    MetaPersist.overwrite(spark, "mp17_store",
      Seq(ModeRow("t3", noDrop = true, offline = true)))
    assert(!Files.exists(log), "compaction retires the log")
    assert(Files.exists(metaDir.resolve("mp17_store.snap")))
    assert(MetaPersist.load[ModeRow](spark, "mp17_store").get ==
      Seq(ModeRow("t3", noDrop = true, offline = true)))
    MetaPersist.delete(spark, "mp17_store")
  }

  test("crash between appends: a torn final log line is dropped and repaired") {
    MetaPersist.delete(spark, "mp17_torn")
    MetaPersist.append(spark, "mp17_torn", ModeRow("a", noDrop = true, offline = false))
    MetaPersist.append(spark, "mp17_torn", ModeRow("b", noDrop = true, offline = false))
    val log = metaDir.resolve("mp17_torn.log")
    // simulate a crash mid-append: half of a third line, no newline
    val full = Files.readAllLines(log).get(0)
    Files.write(log, full.substring(0, full.length / 2).getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val rows = MetaPersist.load[ModeRow](spark, "mp17_torn").get
    assert(rows.map(_.table).sorted == Seq("a", "b"),
      "the interrupted mutation never happened; completed ones survive")
    // the torn tail was compacted away — appending again must stay parseable
    MetaPersist.append(spark, "mp17_torn", ModeRow("c", noDrop = false, offline = true))
    assert(MetaPersist.load[ModeRow](spark, "mp17_torn").get
      .map(_.table).sorted == Seq("a", "b", "c"))
    MetaPersist.delete(spark, "mp17_torn")
  }

  test("corruption is LOUD: bad mid-log line and bad snapshot both refuse to load") {
    MetaPersist.delete(spark, "mp17_corrupt")
    MetaPersist.append(spark, "mp17_corrupt", ModeRow("a", noDrop = true, offline = false))
    val log = metaDir.resolve("mp17_corrupt.log")
    // flip bytes in the FIRST line, then add a valid line after it — a
    // mid-log CRC failure is corruption, not a crash artifact
    val lines = Files.readAllLines(log)
    Files.write(log, (lines.get(0).replace("true", "blue") + "\n").getBytes("UTF-8"))
    MetaPersist.append(spark, "mp17_corrupt", ModeRow("b", noDrop = true, offline = false))
    val e = intercept[IllegalStateException](
      MetaPersist.load[ModeRow](spark, "mp17_corrupt"))
    assert(e.getMessage.contains("unreadable"), e.getMessage)
    Files.deleteIfExists(log)
    // corrupt snapshot: same posture (pre-r17 this silently loaded as
    // absent = Protect OFFLINE flags lapsed fail-open, ADVICE r16 #2)
    MetaPersist.overwrite(spark, "mp17_corrupt",
      Seq(ModeRow("a", noDrop = true, offline = false)))
    val snap = metaDir.resolve("mp17_corrupt.snap")
    val bytes = Files.readAllBytes(snap)
    bytes(bytes.length / 2) = '#'
    Files.write(snap, bytes)
    val e2 = intercept[IllegalStateException](
      MetaPersist.load[ModeRow](spark, "mp17_corrupt"))
    assert(e2.getMessage.contains("unreadable"), e2.getMessage)
    MetaPersist.delete(spark, "mp17_corrupt")
  }

  test("legacy .bin snapshot migrates to the delta-log layout on first load") {
    MetaPersist.delete(spark, "mp17_legacy")
    Files.createDirectories(metaDir)
    val bin = metaDir.resolve("mp17_legacy.bin")
    val out = new java.io.ObjectOutputStream(Files.newOutputStream(bin))
    try out.writeObject(List(ModeRow("lt", noDrop = true, offline = false)))
    finally out.close()
    assert(MetaPersist.load[ModeRow](spark, "mp17_legacy").get ==
      Seq(ModeRow("lt", noDrop = true, offline = false)))
    assert(!Files.exists(bin), "legacy snapshot retired after migration")
    assert(Files.exists(metaDir.resolve("mp17_legacy.snap")))
    MetaPersist.delete(spark, "mp17_legacy")
  }

  test("long log compacts on load") {
    MetaPersist.delete(spark, "mp17_compact")
    (0 to MetaPersist.CompactThreshold).foreach(i =>
      MetaPersist.append(spark, "mp17_compact",
        ModeRow(s"t$i", noDrop = true, offline = false)))
    val rows = MetaPersist.load[ModeRow](spark, "mp17_compact").get
    assert(rows.size == MetaPersist.CompactThreshold + 1)
    assert(!Files.exists(metaDir.resolve("mp17_compact.log")),
      "threshold crossing folds the log into the snapshot")
    assert(MetaPersist.load[ModeRow](spark, "mp17_compact").get.size == rows.size)
    MetaPersist.delete(spark, "mp17_compact")
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
