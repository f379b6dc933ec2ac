package graft

import org.apache.spark.sql.SparkSession

/** clientnegative parity battery, tranche 1 — the reference's error-path
  * corpus (ql/src/test/queries/clientnegative/, 284 files) transcribed
  * against this engine. Each case replays the file's statements: the
  * leading statements must succeed and the flagged statement must REFUSE
  * (fragment-matched against this engine's message; the reference's
  * phrasing is cited where ours differs). Cases where this engine is a
  * deliberate SUPERSET of Hive 0.8 (it executes what the reference
  * refuses) assert successful execution instead and say so — a divergence
  * documented as capability, not a silent skip.
  */
class NegativeParitySpec extends SparkSpec {

  private val sf = SparkTestSession.sf001

  private def freshSession(): SparkSession = {
    val s = Sessions.isolatedClone(spark)
    operators.QFileParity.registerFixtures(s, sf)
    s
  }

  private def run(s: SparkSession, stmts: String*): Unit =
    stmts.foreach(st => HiveQl.sql(s, st).collect())

  /** Purge every `*_neg`-suffixed object a case touches: protect flags,
    * catalog entry, warehouse dir — a previous crashed run must not leak
    * offline/no_drop state or LOCATION_ALREADY_EXISTS into this one.
    */
  private def purge(s: SparkSession, stmts: Seq[String]): Unit = {
    val names = stmts.flatMap("""\b(\w+_neg)\b""".r.findAllMatchIn(_))
      .map(_.group(1).toLowerCase).distinct
    names.foreach { t =>
      try Protect.setMode(s, t, enable = false, "NO_DROP") catch { case _: Exception => }
      try Protect.setMode(s, t, enable = false, "OFFLINE") catch { case _: Exception => }
      try Protect.clearTable(s, t) catch { case _: Exception => }
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

  /** setup must succeed; bad must throw with one of the fragments. */
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

  /** The reference refuses this; the engine deliberately executes it. */
  private def superset(name: String, refRefusal: String,
      stmts: String*): Unit =
    test(s"clientnegative/$name.q: engine superset (reference: $refRefusal)") {
      val s = freshSession()
      purge(s, stmts)
      run(s, stmts: _*)
    }

  private def matSrc(s: String) = Seq(
    s"drop table if exists $s",
    s"create table $s as select * from src")

  // ---- protect mode ------------------------------------------------------
  refuses("protectmode_tbl1",
    Seq("drop table if exists tbl_protectmode_1_neg",
      "create table tbl_protectmode_1_neg (col string)",
      "select * from tbl_protectmode_1_neg",
      "alter table tbl_protectmode_1_neg enable offline"),
    "select * from tbl_protectmode_1_neg", "offline")

  refuses("protectmode_tbl2",
    Seq("drop table if exists tbl_protectmode2_neg",
      "create table tbl_protectmode2_neg (col string) partitioned by (p string)",
      "alter table tbl_protectmode2_neg add partition (p='p1')",
      "alter table tbl_protectmode2_neg enable no_drop",
      "alter table tbl_protectmode2_neg enable offline",
      "alter table tbl_protectmode2_neg disable no_drop",
      "desc extended tbl_protectmode2_neg"),
    "select * from tbl_protectmode2_neg where p='p1'", "offline")

  refuses("protectmode_part",
    Seq("drop table if exists tbl_protectmode3_neg",
      "create table tbl_protectmode3_neg (col string) partitioned by (p string)",
      "alter table tbl_protectmode3_neg add partition (p='p1')",
      "alter table tbl_protectmode3_neg add partition (p='p2')",
      "select * from tbl_protectmode3_neg where p='p2'",
      "alter table tbl_protectmode3_neg partition (p='p1') enable offline",
      "select * from tbl_protectmode3_neg where p='p2'"),
    "select * from tbl_protectmode3_neg where p='p1'", "offline")

  refuses("protectmode_part1",
    Seq("drop table if exists tbl_protectmode5_neg",
      "drop table if exists tbl_protectmode5_1_neg",
      "create table tbl_protectmode5_1_neg (col string)",
      "create table tbl_protectmode5_neg (col string) partitioned by (p string)",
      "alter table tbl_protectmode5_neg add partition (p='p1')",
      "alter table tbl_protectmode5_neg add partition (p='p2')",
      "insert overwrite table tbl_protectmode5_1_neg select col from tbl_protectmode5_neg where p='p1'",
      "alter table tbl_protectmode5_neg partition (p='p1') enable offline",
      "insert overwrite table tbl_protectmode5_1_neg select col from tbl_protectmode5_neg where p='p2'"),
    "insert overwrite table tbl_protectmode5_1_neg select col from tbl_protectmode5_neg where p='p1'",
    "offline")

  refuses("protectmode_part2",
    Seq("drop table if exists tbl_protectmode6_neg",
      "create table tbl_protectmode6_neg (c1 string,c2 string) partitioned by (p string)",
      "alter table tbl_protectmode6_neg add partition (p='p1')",
      "LOAD DATA LOCAL INPATH '/root/reference/data/files/kv1.txt' OVERWRITE INTO TABLE tbl_protectmode6_neg partition (p='p1')",
      "alter table tbl_protectmode6_neg partition (p='p1') enable offline"),
    "LOAD DATA LOCAL INPATH '/root/reference/data/files/kv1.txt' OVERWRITE INTO TABLE tbl_protectmode6_neg partition (p='p1')",
    "offline")

  refuses("protectmode_part_no_drop",
    Seq("drop table if exists tbl_protectmode_no_drop_neg",
      "create table tbl_protectmode_no_drop_neg (c1 string,c2 string) partitioned by (p string)",
      "alter table tbl_protectmode_no_drop_neg add partition (p='p1')",
      "alter table tbl_protectmode_no_drop_neg partition (p='p1') enable no_drop",
      "desc extended tbl_protectmode_no_drop_neg"),
    "alter table tbl_protectmode_no_drop_neg drop partition (p='p1')",
    "protected from being dropped")

  refuses("protectmode_tbl3",
    Seq("drop table if exists tbl_protectmode_4_neg",
      "create table tbl_protectmode_4_neg (col string)",
      "select col from tbl_protectmode_4_neg",
      "alter table tbl_protectmode_4_neg enable offline",
      "desc extended tbl_protectmode_4_neg"),
    "select col from tbl_protectmode_4_neg", "offline")

  refuses("protectmode_tbl4",
    Seq("drop table if exists tbl_protectmode_tbl4_neg",
      "create table tbl_protectmode_tbl4_neg (col string) partitioned by (p string)",
      "alter table tbl_protectmode_tbl4_neg add partition (p='p1')",
      "alter table tbl_protectmode_tbl4_neg enable no_drop",
      "alter table tbl_protectmode_tbl4_neg enable offline",
      "alter table tbl_protectmode_tbl4_neg disable no_drop",
      "desc extended tbl_protectmode_tbl4_neg"),
    "select col from tbl_protectmode_tbl4_neg where p='not_exist'", "offline")

  refuses("protectmode_tbl5",
    Seq("drop table if exists tbl_protectmode_tbl5_neg",
      "drop table if exists tbl_protectmode_tbl5_src_neg",
      "create table tbl_protectmode_tbl5_src_neg (col string)",
      "create table tbl_protectmode_tbl5_neg (col string) partitioned by (p string)",
      "alter table tbl_protectmode_tbl5_neg add partition (p='p1')",
      "alter table tbl_protectmode_tbl5_neg enable no_drop",
      "alter table tbl_protectmode_tbl5_neg enable offline",
      "alter table tbl_protectmode_tbl5_neg disable no_drop"),
    "insert overwrite table tbl_protectmode_tbl5_neg partition (p='not_exist') " +
      "select col from tbl_protectmode_tbl5_src_neg", "offline")

  refuses("protectmode_tbl_no_drop",
    Seq("drop table if exists tbl_protectmode__no_drop_neg",
      "create table tbl_protectmode__no_drop_neg (col string)",
      "select * from tbl_protectmode__no_drop_neg",
      "alter table tbl_protectmode__no_drop_neg enable no_drop",
      "desc extended tbl_protectmode__no_drop_neg"),
    "drop table tbl_protectmode__no_drop_neg", "protected from being dropped")

  // ---- archive -----------------------------------------------------------
  refuses("archive1",
    Seq("set hive.archive.enabled = true",
      "drop table if exists srcpart_archived_neg",
      "create table srcpart_archived_neg (key string, value string) " +
        "partitioned by (ds string, hr string)",
      "insert overwrite table srcpart_archived_neg partition (ds='2008-04-08', hr='12') " +
        "select key, value from srcpart where ds='2008-04-08' and hr='12'",
      "alter table srcpart_archived_neg archive partition (ds='2008-04-08', hr='12')"),
    "alter table srcpart_archived_neg archive partition (ds='2008-04-08', hr='12')",
    "already", "exists")

  refuses("archive2",
    Seq("set hive.archive.enabled = true",
      "drop table if exists tstsrcpart_arch2_neg",
      "create table tstsrcpart_arch2_neg (key string, value string) " +
        "partitioned by (ds string, hr string)",
      "insert overwrite table tstsrcpart_arch2_neg partition (ds='2008-04-08', hr='12') " +
        "select key, value from srcpart where ds='2008-04-08' and hr='12'"),
    "alter table tstsrcpart_arch2_neg unarchive partition (ds='2008-04-08', hr='12')",
    "not archived")

  // ---- TOUCH -------------------------------------------------------------
  refuses("touch1",
    Seq("drop table if exists touch1_neg",
      "create table touch1_neg (key string) partitioned by (ds string, hr string)"),
    "ALTER TABLE touch1_neg TOUCH PARTITION (ds='2008-04-08', hr='13')",
    "Partition not found", "does not exist")

  refuses("touch2",
    Seq("drop table if exists touch2_neg",
      "create table touch2_neg (key string)"),
    "ALTER TABLE touch2_neg TOUCH PARTITION (ds='2008-04-08', hr='12')",
    "not partitioned", "partition spec is invalid", "not a partitioned table")

  // ---- strict mode -------------------------------------------------------
  refuses("strict_join", Seq("set hive.mapred.mode=strict"),
    "SELECT * FROM src src1 JOIN src src2",
    "cartesian product is not allowed")

  refuses("strict_orderby", Seq("set hive.mapred.mode=strict"),
    "SELECT src.key, src.value from src order by src.key",
    "LIMIT must also be specified")

  refuses("strict_pruning",
    Seq("set hive.mapred.mode=strict",
      "drop table if exists strictp_neg",
      "create table strictp_neg (key string) partitioned by (ds string)"),
    "SELECT count(1) FROM strictp_neg",
    "No partition predicate found")

  refuses("input4", Seq("set hive.mapred.mode=strict"),
    "SELECT src.key as k1, src1.value as v1 FROM src src, src src1",
    "cartesian product is not allowed")

  refuses("input_part0_neg",
    Seq("set hive.mapred.mode=strict",
      "drop table if exists ip0_neg",
      "create table ip0_neg (key string) partitioned by (ds string)"),
    "SELECT x.* FROM ip0_neg x WHERE key = '2008-04-08'",
    "No partition predicate found")

  // ---- sampling ----------------------------------------------------------
  refuses("sample", Nil,
    "SELECT s.* FROM src s TABLESAMPLE (BUCKET 5 OUT OF 4 ON key)",
    "bigger than")

  refuses("split_sample_out_of_range", Nil,
    "select key from src tablesample(105 percent)",
    "between 0 and 100")

  refuses("split_sample_wrong_format",
    Seq("set hive.input.format=org.apache.hadoop.hive.ql.io.HiveInputFormat"),
    "select key from src tablesample(1 percent)",
    "Percentage sampling is not supported")

  refuses("bad_sample_clause",
    Seq("drop table if exists bad_sample_neg",
      "create table bad_sample_neg (key string, value string)"),
    // no ON clause and the table is not bucketed
    "SELECT s.* FROM bad_sample_neg s TABLESAMPLE (BUCKET 1 OUT OF 2)",
    "non-bucketed", "not bucketed", "Sampling expression needed")

  // ---- locks -------------------------------------------------------------
  refuses("lockneg2",
    Seq("drop table if exists lockneg2_t",
      "create table lockneg2_t (key string)"),
    "UNLOCK TABLE lockneg2_t", "not locked")

  refuses("lockneg5", Nil,
    "show locks lockneg5_nonexistent_table extended",
    "not found", "cannot be found", "TABLE_OR_VIEW_NOT_FOUND")

  // ---- view misuse -------------------------------------------------------
  refuses("alter_view_failure",
    matSrc("avf_src_neg") ++ Seq(
      "DROP VIEW IF EXISTS xxx3_neg",
      "CREATE VIEW xxx3_neg AS SELECT * FROM avf_src_neg"),
    "ALTER TABLE xxx3_neg REPLACE COLUMNS (xyz int)",
    "view", "not allowed", "EXPECT_TABLE")

  refuses("drop_table_failure2",
    matSrc("dtf2_src_neg") ++ Seq(
      "DROP VIEW IF EXISTS xxx6_dtf2_neg",
      "CREATE VIEW xxx6_dtf2_neg AS SELECT key FROM dtf2_src_neg"),
    "DROP TABLE xxx6_dtf2_neg",
    "view", "DROP VIEW")

  refuses("drop_view_failure1",
    Seq("drop table if exists xxx1_dvf_neg",
      "CREATE TABLE xxx1_dvf_neg (key int)"),
    "DROP VIEW xxx1_dvf_neg",
    "table", "DROP TABLE")

  refuses("insert_view_failure",
    matSrc("ivf_src_neg") ++ Seq(
      "DROP VIEW IF EXISTS xxx2_ivf_neg",
      "CREATE VIEW xxx2_ivf_neg AS SELECT * FROM ivf_src_neg"),
    "INSERT OVERWRITE TABLE xxx2_ivf_neg SELECT key, value FROM ivf_src_neg",
    "view", "not allowed")

  refuses("load_view_failure",
    matSrc("lvf_src_neg") ++ Seq(
      "DROP VIEW IF EXISTS xxx11_lvf_neg",
      "CREATE VIEW xxx11_lvf_neg AS SELECT * FROM lvf_src_neg"),
    "LOAD DATA LOCAL INPATH '/root/reference/data/files/kv1.txt' INTO TABLE xxx11_lvf_neg",
    "view", "not allowed", "UNSUPPORTED")

  refuses("create_view_failure1",
    Seq("drop table if exists xxx12_cvf_neg",
      "drop view if exists xxx12_cvf_neg",
      "CREATE TABLE xxx12_cvf_neg (key int)"),
    "CREATE VIEW xxx12_cvf_neg AS SELECT 1 AS key",
    "already exists")

  // create_view_failure5.q: the reference refuses duplicate body column
  // NAMES behind a column list because its descriptors map BY NAME (its
  // own comment calls the restriction an internal workaround and the
  // SQL:200n-legal form is positional); this engine maps positionally,
  // so the view works — x and y both read `key`
  superset("create_view_failure5",
    "Duplicate column name: key (by-name view descriptor mapping)",
    (matSrc("cvf5_src_neg") ++ Seq(
      "DROP VIEW IF EXISTS xxx14_cvf5_neg",
      "CREATE VIEW xxx14_cvf5_neg (x,y) AS SELECT key,key FROM cvf5_src_neg",
      "SELECT x, y FROM xxx14_cvf5_neg LIMIT 1",
      "DROP VIEW xxx14_cvf5_neg")): _*)

  refuses("create_or_replace_view3",
    Seq("drop table if exists corv3_tbl_neg",
      "create table corv3_tbl_neg (key string)"),
    "create or replace view corv3_tbl_neg as select 1 as x",
    "not a view", "EXPECT_VIEW", "unsupported", "already exists")

  refuses("create_or_replace_view8",
    matSrc("corv8_src_neg") ++ Seq(
      "drop view if exists v1_corv8_neg",
      "create view v1_corv8_neg as select * from corv8_src_neg"),
    "create or replace view v1_corv8_neg as select * from v1_corv8_neg",
    "Recursive view", "RECURSIVE_VIEW")

  // ---- drop failures -----------------------------------------------------
  refuses("drop_function_failure", Nil,
    "DROP TEMPORARY FUNCTION UnknownFunction_neg",
    "Invalid function", "not found", "no such function", "undefined",
    "UNRESOLVED_ROUTINE", "cannot be found")

  refuses("drop_index_failure", Nil,
    "DROP INDEX UnknownIndex_neg ON src",
    "Invalid index", "not found", "no index", "does not exist", "no such")

  refuses("drop_table_failure1", Nil,
    "DROP TABLE UnknownTable_neg",
    "not found", "does not exist", "TABLE_OR_VIEW_NOT_FOUND")

  refuses("drop_view_failure2", Nil,
    "DROP VIEW UnknownView_neg",
    "not found", "does not exist", "TABLE_OR_VIEW_NOT_FOUND")

  // ---- databases ---------------------------------------------------------
  refuses("database_create_already_exists",
    Seq("drop database if exists db_dup_neg cascade",
      "create database db_dup_neg"),
    "create database db_dup_neg",
    "already exists", "SCHEMA_ALREADY_EXISTS")

  refuses("database_drop_does_not_exist", Nil,
    "drop database does_not_exist_neg",
    "not found", "does not exist", "SCHEMA_NOT_FOUND")

  refuses("database_drop_not_empty",
    Seq("drop database if exists db_nonempty_neg cascade",
      "create database db_nonempty_neg",
      "use db_nonempty_neg",
      "create table t_in_db_neg (c string)",
      "use default"),
    "drop database db_nonempty_neg",
    "not empty", "SCHEMA_NOT_EMPTY")

  refuses("database_switch_does_not_exist", Nil,
    "use does_not_exist_neg",
    "not found", "does not exist", "SCHEMA_NOT_FOUND")

  refuses("show_tables_bad_db1", Nil,
    "show tables from nonexistent_neg",
    "not found", "does not exist", "SCHEMA_NOT_FOUND")

  // ---- semantic analysis basics ------------------------------------------
  refuses("ambiguous_col", Nil,
    "select key from (select a.key, b.key from src a join src b on a.key=b.key) t",
    "ambiguous", "AMBIGUOUS_REFERENCE")

  refuses("input1", Nil,
    "SELECT a.* FROM src1 whatever",
    "cannot resolve", "not found", "UNRESOLVED", "Invalid")

  refuses("input2", Nil,
    "SELECT a.key FROM src",
    "cannot resolve", "UNRESOLVED", "Invalid")

  refuses("joinneg", Nil,
    """FROM (SELECT src.* FROM src) x
       JOIN (SELECT src.* FROM src) Y ON (x.key = b.key)
       SELECT Y.*""",
    "cannot resolve", "UNRESOLVED", "Invalid")

  refuses("groupby_key", Nil,
    "SELECT concat(value, concat(value)) FROM src GROUP BY concat(value)",
    "GROUP BY", "MISSING_AGGREGATION", "grouping")

  refuses("nonkey_groupby", Nil,
    "SELECT key, count(1) FROM src where key < 9 GROUP BY value",
    "GROUP BY", "MISSING_AGGREGATION", "grouping")

  refuses("notable_alias4", Nil,
    "SELECT key FROM src a JOIN src b ON a.key = b.key",
    "ambiguous", "AMBIGUOUS_REFERENCE")

  refuses("duplicate_insert1",
    Seq("drop table if exists dest1_din1_neg",
      "create table dest1_din1_neg (key int, value string)"),
    """from src
       insert overwrite table dest1_din1_neg select key, value
       insert overwrite table dest1_din1_neg select key, value""",
    "multiple times", "same output", "duplicate")

  refuses("duplicate_insert2",
    Seq("drop table if exists dest1_din2_neg",
      "create table dest1_din2_neg (key int, value string) partitioned by (ds string)"),
    """from src
       insert overwrite table dest1_din2_neg partition (ds='1') select key, value
       insert overwrite table dest1_din2_neg partition (ds='1') select key, value""",
    "multiple times", "same output", "duplicate")

  // ---- invalid UDAF syntax -----------------------------------------------
  refuses("invalid_avg_syntax", Nil, "SELECT avg(DISTINCT *) FROM src",
    "requires", "WRONG_NUM_ARGS", "invalid", "not supported")

  refuses("invalid_sum_syntax", Nil, "SELECT sum(DISTINCT *) FROM src",
    "requires", "WRONG_NUM_ARGS", "invalid", "not supported")

  // ---- udf arg/type errors -----------------------------------------------
  refuses("udf_elt_wrong_args_len", Nil, "SELECT elt(3) FROM src",
    "argument", "WRONG_NUM_ARGS", "parameter", "requires")

  refuses("udf_if_wrong_args_len", Nil, "SELECT IF(TRUE) FROM src",
    "argument", "WRONG_NUM_ARGS", "parameter", "requires")

  refuses("udf_locate_wrong_args_len", Nil, "SELECT locate('a') FROM src",
    "argument", "WRONG_NUM_ARGS", "parameter", "requires")

  refuses("udf_map_keys_arg_num", Nil,
    "SELECT map_keys(map('a', '1'), map('b', '2')) FROM src",
    "argument", "WRONG_NUM_ARGS", "parameter", "requires")

  refuses("udf_map_keys_arg_type", Nil, "SELECT map_keys(3) FROM src",
    "type", "DATATYPE_MISMATCH", "argument")

  refuses("udf_map_values_arg_type", Nil, "SELECT map_values(4) FROM src",
    "type", "DATATYPE_MISMATCH", "argument")

  refuses("udf_max", Nil,
    "SELECT max(map('key', key, 'value', value)) FROM src",
    "map", "DATATYPE_MISMATCH", "not supported", "cannot be used", "orderable")

  refuses("udf_min", Nil,
    "SELECT min(map('key', key, 'value', value)) FROM src",
    "map", "DATATYPE_MISMATCH", "not supported", "cannot be used", "orderable")

  refuses("udf_size_wrong_args_len", Nil, "SELECT size() FROM src",
    "argument", "WRONG_NUM_ARGS", "parameter", "requires")

  refuses("udf_size_wrong_type", Nil, "SELECT size('wrong type: string') FROM src",
    "type", "DATATYPE_MISMATCH", "argument")

  refuses("udf_array_contains_wrong1", Nil, "SELECT array_contains(1, 2) FROM src",
    "type", "DATATYPE_MISMATCH", "argument")

  // ---- misc --------------------------------------------------------------
  refuses("load_part_nospec",
    Seq("drop table if exists lpn_neg",
      "create table lpn_neg (key string) partitioned by (ds string) stored as textfile"),
    "load data local inpath '/root/reference/data/files/kv1.txt' into table lpn_neg",
    "partition", "PARTITION_SPEC")

  refuses("load_wrong_fileformat",
    Seq("drop table if exists lwf_neg",
      "CREATE TABLE lwf_neg (a STRING) STORED AS SEQUENCEFILE"),
    "LOAD DATA LOCAL INPATH '/root/reference/data/files/kv1.txt' INTO TABLE lwf_neg",
    "file format")

  refuses("load_wrong_fileformat_txt_seq",
    Seq("drop table if exists lwf_txt_neg",
      "CREATE TABLE lwf_txt_neg (a STRING) STORED AS TEXTFILE"),
    "LOAD DATA LOCAL INPATH '/root/reference/data/files/kv1.seq' INTO TABLE lwf_txt_neg",
    "file format")

  refuses("analyze_view",
    matSrc("av_src_neg") ++ Seq(
      "drop view if exists av_view_neg",
      "create view av_view_neg as select * from av_src_neg"),
    "analyze table av_view_neg compute statistics",
    "view", "not supported", "UNSUPPORTED")

  refuses("genericFileFormat", Nil,
    "create table gff_neg (x int) stored as foo",
    "Unrecognized file format", "unmapped", "invalid", "expecting")

  refuses("invalid_tbl_name", Nil,
    "create table invalid-name_neg (a int)",
    "PARSE", "syntax", "invalid", "expecting")

  refuses("subq_insert", Nil,
    "SELECT * FROM (INSERT OVERWRITE TABLE src1 SELECT * FROM src) y",
    "PARSE", "syntax", "invalid", "expecting")

  // clusterbyorderby.q: the reference's GRAMMAR cannot spell CLUSTER BY
  // followed by ORDER BY on a TRANSFORM; this engine's rewrite produces a
  // well-defined plan (cluster-distribute, then a global sort), so the
  // statement executes — a deliberate grammar superset
  superset("clusterbyorderby",
    "Parse Error: mismatched input 'ORDER' (grammar restriction)",
    """FROM src MAP src.key, src.value USING '/bin/cat'
       AS (tkey, tvalue) CLUSTER BY tkey ORDER BY tvalue""")
}
