package graft

import org.apache.spark.sql.SparkSession

/** clientnegative parity battery, tranche 3 — DDL misuse (column renames,
  * concatenate, view partitioning), reserved partition names, implicit
  * lock conflicts on INSERT, UDF/UDTF type failures, parse-error family,
  * and documented capability supersets. Same harness contract as
  * [[NegativeParitySpec]].
  */
class NegativeParitySpec3 extends SparkSpec {

  private val sf = SparkTestSession.sf001

  private def freshSession(): SparkSession = {
    val s = Sessions.isolatedClone(spark)
    operators.QFileParity.registerFixtures(s, sf)
    s
  }

  private def run(s: SparkSession, stmts: String*): Unit =
    stmts.foreach(st => HiveQl.sql(s, st).collect())

  private def purge(s: SparkSession, stmts: Seq[String]): Unit = {
    val names = stmts.flatMap("""\b(\w+_neg3)\b""".r.findAllMatchIn(_))
      .map(_.group(1).toLowerCase).distinct
    names.foreach { t =>
      // a crashed prior run can leave a durable index registered (even
      // orphaned past its table)
      try operators.Indexes.forgetMatching(s, t) catch { case _: Exception => }
      try s.sql(s"DROP TABLE IF EXISTS $t") catch { case _: Exception =>
        try s.sql(s"DROP VIEW IF EXISTS $t") catch { case _: Exception => } }
      try s.sql(s"DROP VIEW IF EXISTS $t") catch { case _: Exception => }
      try {
        val p = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), t)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      } catch { case _: Exception => }
    }
  }

  private def refuses(name: String, setup: Seq[String], bad: String,
      frags: String*): Unit =
    test(s"clientnegative/$name.q: refuses") {
      val s = freshSession()
      purge(s, setup :+ bad)
      run(s, setup: _*)
      val e = intercept[Throwable](HiveQl.sql(s, bad).collect())
      val msg = (Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")).toLowerCase
      assert(frags.exists(f => msg.contains(f.toLowerCase)),
        s"expected one of ${frags.mkString("|")}, got: $msg")
    }

  private def superset(name: String, refRefusal: String, stmts: String*): Unit =
    test(s"clientnegative/$name.q: engine superset (reference: $refRefusal)") {
      val s = freshSession()
      purge(s, stmts)
      run(s, stmts: _*)
    }

  // ---- partition DDL -------------------------------------------------------
  refuses("addpart1",
    Seq("drop table if exists addpart1_neg3",
      "create table addpart1_neg3 (a int) partitioned by (b string, c string)",
      "alter table addpart1_neg3 add partition (b='f', c='s')"),
    "alter table addpart1_neg3 add partition (b='f', c='')",
    "empty partition column value", "null or empty")

  refuses("altern1",
    Seq("drop table if exists altern1_neg3",
      "create table altern1_neg3 (a int, b int) partitioned by (ds string)"),
    "alter table altern1_neg3 replace columns (a int, b int, ds string)",
    "Partition column name ds conflicts")

  refuses("column_rename1",
    Seq("drop table if exists colren1_neg3",
      "create table colren1_neg3 (key string, value string)"),
    "alter table colren1_neg3 change src_not_exist key_value string",
    "Invalid column reference")

  refuses("column_rename2",
    Seq("drop table if exists colren2_neg3",
      "create table colren2_neg3 (key string, value string)"),
    "alter table colren2_neg3 change key value string",
    "already exists")

  refuses("column_rename4",
    Seq("drop table if exists colren4_neg3",
      "create table colren4_neg3 (key string, value string)"),
    "alter table colren4_neg3 change key key2 string after key_value",
    "Invalid column reference")

  refuses("default_partition_name",
    Seq("drop table if exists defpart_neg3",
      "create table defpart_neg3 (key int, value string) partitioned by (ds string)"),
    "alter table defpart_neg3 add partition (ds='__HIVE_DEFAULT_PARTITION__')",
    "reserved")

  refuses("archive5",
    Seq("set hive.archive.enabled = true",
      "drop table if exists archive5_neg3",
      "create table archive5_neg3 (key string) partitioned by (ds string, hr string)"),
    "ALTER TABLE archive5_neg3 ADD PARTITION " +
      "(ds='2008-04-08', hr='14_INTERMEDIATE_ORIGINAL')",
    "reserved")

  refuses("drop_partition_failure",
    Seq("drop table if exists mp_neg3",
      "create table mp_neg3 (a string) partitioned by (b string, c string)",
      "alter table mp_neg3 add partition (b='1', c='1')",
      "alter table mp_neg3 add partition (b='1', c='2')",
      "alter table mp_neg3 add partition (b='2', c='2')",
      "set hive.exec.drop.ignorenonexistent=false"),
    "alter table mp_neg3 drop partition (b='3')",
    "Partition not found")

  refuses("merge_negative_2",
    Seq("drop table if exists srcpart2_neg3",
      "create table srcpart2_neg3 (key int, value string) partitioned by (ds string)",
      "insert overwrite table srcpart2_neg3 partition (ds='2011') select * from src"),
    "alter table srcpart2_neg3 concatenate",
    "partitioned but no partition desc found")

  refuses("merge_negative_1",
    Seq("drop table if exists src2mn1_neg3",
      "create table src2mn1_neg3 (key string, value string) stored as rcfile",
      "CREATE INDEX src2mn1_neg3_index ON TABLE src2mn1_neg3(key) " +
        "as 'COMPACT' WITH DEFERRED REBUILD"),
    "alter table src2mn1_neg3 concatenate",
    "index", "indexed")

  // ---- create/alter table misc ---------------------------------------------
  refuses("create_insert_outputformat",
    Seq("drop table if exists ciof_neg3"),
    "CREATE TABLE ciof_neg3 (key INT, value STRING) STORED AS " +
      "INPUTFORMAT 'org.apache.hadoop.mapred.TextInputFormat' " +
      "OUTPUTFORMAT 'org.apache.hadoop.mapred.MapFileOutputFormat'",
    "unmapped", "must implement", "Output Format")

  refuses("ctas", Nil,
    "create external table nzhang_ctas4_neg3 as select key, value from src",
    "path", "external", "LOCATION")

  refuses("line_terminator",
    Seq("drop table if exists lineterm_neg3"),
    "CREATE TABLE lineterm_neg3 (col1 STRING, col2 INT) " +
      "ROW FORMAT DELIMITED LINES TERMINATED BY ','",
    "LINES TERMINATED BY only supports newline")

  refuses("invalid_create_tbl1",
    Seq("drop table if exists invtbl1_neg3"),
    "create table invtbl1_neg3 (a datetime)",
    "UNSUPPORTED_DATATYPE", "DATETIME")

  refuses("invalid_create_tbl2", Nil,
    "create tabl tmp_zshao_22_neg3 (id int, name strin",
    "PARSE", "syntax", "mismatched")

  refuses("load_non_native",
    Seq("drop table if exists non_native2_neg3"),
    "CREATE TABLE non_native2_neg3 (key int, value string) STORED BY " +
      "'org.apache.hadoop.hive.ql.metadata.DefaultStorageHandler'",
    // this engine refuses one statement earlier: the handler class itself
    // is not a bundled handler (the reference creates, then refuses LOAD)
    "storage handler", "not available")

  refuses("bad_indextype", Nil,
    "CREATE INDEX badidx_neg3 ON TABLE graft_qf_nation(n_name) AS 'UNKNOWN' " +
      "WITH DEFERRED REBUILD",
    "unsupported index handler")

  refuses("ddltime",
    Seq("drop table if exists t2ddltime_neg3",
      "create table t2ddltime_neg3 (key string, value string) " +
        "partitioned by (ds string, hr string)"),
    "insert overwrite table t2ddltime_neg3 partition (ds = '2010-06-21', hr='1') " +
      "select /*+ HOLD_DDLTIME */ key, value from src where key > 10",
    "HOLD_DDLTIME")

  // ---- views ----------------------------------------------------------------
  refuses("create_view_failure3",
    Seq("drop table if exists cvf3src_neg3",
      "create table cvf3src_neg3 as select * from src",
      "drop view if exists cvf3_neg3"),
    "CREATE VIEW cvf3_neg3 (x,y,z) AS SELECT key FROM cvf3src_neg3",
    "declares 3 columns but its body yields 1")

  refuses("create_view_failure6",
    Seq("drop table if exists cvf6src_neg3",
      "create table cvf6src_neg3 as select * from src",
      "drop view if exists cvf6_neg3"),
    "CREATE VIEW cvf6_neg3 PARTITIONED ON (baz) AS SELECT key FROM cvf6src_neg3",
    "Rightmost columns in view output do not match", "At least one")

  refuses("create_view_failure7",
    Seq("drop table if exists cvf7src_neg3",
      "create table cvf7src_neg3 as select * from src",
      "drop view if exists cvf7_neg3"),
    "CREATE VIEW cvf7_neg3 PARTITIONED ON (key) AS SELECT key FROM cvf7src_neg3",
    "At least one non-partitioning column")

  refuses("create_view_failure8",
    Seq("drop table if exists cvf8src_neg3",
      "create table cvf8src_neg3 as select * from src",
      "drop view if exists cvf8_neg3"),
    "CREATE VIEW cvf8_neg3 PARTITIONED ON (key) AS " +
      "SELECT key, value FROM cvf8src_neg3",
    "Rightmost columns in view output do not match")

  refuses("alter_view_failure7",
    Seq("drop table if exists avf7src_neg3",
      "create table avf7src_neg3 as select * from srcpart",
      "drop view if exists avf7_neg3",
      "CREATE VIEW avf7_neg3 PARTITIONED ON (ds, hr) AS " +
        "SELECT key, ds, hr FROM avf7src_neg3"),
    "ALTER VIEW avf7_neg3 ADD PARTITION (ds='2011-01-01')",
    "does not fully match table partitioning",
    "partition spec is not specified")

  refuses("invalidate_view1",
    Seq("drop view if exists xxx8_neg3", "drop view if exists xxx9_neg3",
      "drop table if exists xxx10_neg3",
      "CREATE TABLE xxx10_neg3 (key int, value int)",
      "CREATE VIEW xxx9_neg3 AS SELECT * FROM xxx10_neg3",
      "CREATE VIEW xxx8_neg3 AS SELECT * FROM xxx9_neg3 xxx",
      "ALTER TABLE xxx10_neg3 REPLACE COLUMNS (key int)"),
    "SELECT * FROM xxx8_neg3 yyy",
    "cannot resolve", "UNRESOLVED", "incompatible", "view")

  // ---- implicit lock conflicts on INSERT -------------------------------------
  refuses("insert_into1",
    Seq("drop table if exists insert_into1_neg3",
      "CREATE TABLE insert_into1_neg3 (key int, value string)",
      "LOCK TABLE insert_into1_neg3 SHARED"),
    "INSERT INTO TABLE insert_into1_neg3 SELECT * FROM src LIMIT 100",
    "Locks on the underlying objects cannot be acquired")

  refuses("insert_into2",
    Seq("drop table if exists insert_into2_neg3",
      "CREATE TABLE insert_into2_neg3 (key int, value string)",
      "LOCK TABLE insert_into2_neg3 EXCLUSIVE"),
    "INSERT INTO TABLE insert_into2_neg3 SELECT * FROM src LIMIT 100",
    "Locks on the underlying objects cannot be acquired")

  refuses("insert_into3",
    Seq("drop table if exists insert_into3_neg3",
      "CREATE TABLE insert_into3_neg3 (key int, value string) " +
        "PARTITIONED BY (ds string)",
      "INSERT INTO TABLE insert_into3_neg3 PARTITION (ds='1') " +
        "SELECT * FROM src LIMIT 100",
      "LOCK TABLE insert_into3_neg3 PARTITION (ds='1') SHARED"),
    "INSERT INTO TABLE insert_into3_neg3 PARTITION (ds='1') " +
      "SELECT * FROM src LIMIT 100",
    "Locks on the underlying objects cannot be acquired")

  // ---- functions --------------------------------------------------------------
  refuses("create_unknown_genericudf", Nil,
    "CREATE TEMPORARY FUNCTION dummy_genericudf_neg3 AS " +
      "'org.apache.hadoop.hive.ql.udf.generic.DummyGenericUDF'",
    "unknown implementation class")

  refuses("create_udaf_failure", Nil,
    // the reference fails at invocation; this engine refuses one statement
    // earlier — the test class has no engine mapping
    "CREATE TEMPORARY FUNCTION test_udaf_neg3 AS " +
      "'org.apache.hadoop.hive.ql.udf.UDAFWrongArgLengthForTestCase'",
    "unknown implementation class")

  refuses("udf_test_error", Nil,
    "CREATE TEMPORARY FUNCTION test_error_neg3 AS " +
      "'org.apache.hadoop.hive.ql.udf.UDFTestErrorOnFalse'",
    "unknown implementation class")

  refuses("drop_native_udf", Nil,
    "DROP TEMPORARY FUNCTION max",
    "Cannot drop native function")

  refuses("udf_when_type_wrong", Nil,
    "SELECT CASE WHEN TRUE THEN 2 WHEN '1' THEN 4 ELSE 5 END FROM src LIMIT 1",
    "DATATYPE_MISMATCH", "type mismatch")

  refuses("udtf_explode_not_supported3", Nil,
    "select explode(array(1),array(2)) as myCol from src",
    "requires 1 parameters", "WRONG_NUM_ARGS")

  refuses("wrong_column_type",
    Seq("drop table if exists wct_neg3",
      "CREATE TABLE wct_neg3 (a float)"),
    "INSERT OVERWRITE TABLE wct_neg3 SELECT array(1.0,2.0) FROM src",
    "DATATYPE_MISMATCH", "cannot resolve", "CAST")

  // ---- parse errors -----------------------------------------------------------
  refuses("show_tables_bad1", Nil, "SHOW TABLES LIKE",
    "PARSE", "syntax")

  refuses("show_tables_bad2", Nil, "SHOW TABLES FROM default LIKE",
    "PARSE", "syntax")

  refuses("invalid_select_expression", Nil,
    "select foo from src a where foo > .foo",
    "PARSE", "syntax")

  refuses("select_charliteral", Nil,
    "select _c17, count(1) from tmp_tl_foo_neg3 group by _c17",
    // the reference trips on the charset-literal grammar; the engine
    // resolves further and refuses on the missing table
    "not found", "TABLE_OR_VIEW_NOT_FOUND", "PARSE")

  refuses("orderbysortby",
    Seq("drop table if exists obsb_neg3",
      "CREATE TABLE obsb_neg3 (key INT, ten INT, one INT, value STRING)"),
    "FROM src INSERT OVERWRITE TABLE obsb_neg3 MAP src.key, " +
      "CAST(src.key / 10 AS INT), CAST(src.key % 10 AS INT), src.value " +
      "USING '/bin/cat' AS (tkey, ten, one, tvalue) " +
      "ORDER BY tvalue, tkey SORT BY ten, one",
    "Combination of ORDER BY/SORT BY", "UNSUPPORTED_FEATURE", "PARSE")

  // ---- engine supersets --------------------------------------------------------
  superset("percentile(double) — no_matching_udf",
    "No matching method for UDAFPercentile with (double, double)",
    "SELECT percentile(3.5, 0.99) FROM src")

  superset("udf_case_type_wrong",
    "CASE operand/WHEN type equality required (no coercion)",
    "SELECT CASE '1' WHEN 1 THEN 2 WHEN 3 THEN 4 ELSE 5 END FROM src LIMIT 1")

  superset("udtf_not_supported1",
    "Only a single expression in the SELECT clause is supported with UDTF",
    "SELECT explode(array(1,2,3)) as myCol, key FROM src")

  superset("dyn_part3",
    "hive.exec.max.created.files exceeded (MR file-budget guard)",
    Seq("set hive.exec.dynamic.partition.mode=nonstrict",
      "set hive.exec.dynamic.partition=true",
      "drop table if exists nzhang_part_neg3",
      "create table nzhang_part_neg3 (key string) partitioned by (value string)",
      "insert overwrite table nzhang_part_neg3 partition(value) " +
        "select key, value from src where key < 20",
      "drop table nzhang_part_neg3"): _*)

  superset("dyn_part_merge",
    "Dynamic partition merge requires CombineHiveInputFormat",
    Seq("set hive.exec.dynamic.partition=true",
      "set hive.exec.dynamic.partition.mode=nonstrict",
      "set hive.merge.mapfiles=true",
      "drop table if exists dyn_merge_neg3",
      "create table dyn_merge_neg3 (key string, value string) partitioned by (ds string)",
      "insert overwrite table dyn_merge_neg3 partition(ds) " +
        "select key, value, ds from srcpart where ds is not null",
      "drop table dyn_merge_neg3"): _*)

  superset("smb_bucketmapjoin",
    "sorted-merge bucket MAPJOIN cannot be performed with OUTER JOIN",
    Seq("drop table if exists smbbmj1_neg3", "drop table if exists smbbmj2_neg3",
      "set hive.enforce.bucketing = true",
      "CREATE TABLE smbbmj1_neg3 (key int, value string) CLUSTERED BY (key) INTO 2 BUCKETS",
      "CREATE TABLE smbbmj2_neg3 (key int, value string) CLUSTERED BY (key) INTO 2 BUCKETS",
      "insert overwrite table smbbmj1_neg3 select * from src",
      "insert overwrite table smbbmj2_neg3 select * from src",
      "set hive.optimize.bucketmapjoin = true",
      "set hive.optimize.bucketmapjoin.sortedmerge = true",
      "select /*+mapjoin(a)*/ count(*) from smbbmj1_neg3 a " +
        "left outer join smbbmj2_neg3 b on a.key = b.key",
      "set hive.enforce.bucketing = false"): _*)

  superset("deletejar",
    "serde class unavailable after DELETE JAR (TestSerDe is engine-native here)",
    Seq("drop table if exists deletejar_neg3",
      "CREATE TABLE deletejar_neg3 (KEY STRING, VALUE STRING) ROW FORMAT SERDE " +
        "'org.apache.hadoop.hive.serde2.TestSerDe' STORED AS TEXTFILE",
      "drop table deletejar_neg3"): _*)

  superset("autolocal1",
    "mapred.job.tracker=abracadabra breaks MR job submission (no MR here)",
    Seq("set mapred.job.tracker=abracadabra",
      "set hive.exec.mode.local.auto=true",
      "SELECT key FROM src LIMIT 1"): _*)
}
