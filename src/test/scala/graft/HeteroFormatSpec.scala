package graft

import org.apache.spark.sql.Row

/** Per-partition heterogeneous file formats (partition_wise_fileformat.q
  * family; reference MapOperator.java:62 picks the SerDe per input path).
  * The graft surface: `ALTER TABLE [PARTITION] SET FILEFORMAT` converts the
  * table to sources.HiveHeteroSource, which writes the CURRENT format and
  * reads per file by container magic.
  */
class HeteroFormatSpec extends SparkSpec {

  private def freshName(tag: String) = s"hetero_${tag}_${System.nanoTime()}"

  private def partFiles(t: String, spec: Map[String, String]) = {
    val cat = spark.sessionState.catalog
    val ti = spark.sessionState.sqlParser.parseTableIdentifier(t)
    val loc = new org.apache.hadoop.fs.Path(cat.getPartition(ti, spec).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(loc).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      .map(_.getPath).toSeq
  }

  test("text, RCFile and SequenceFile partitions coexist and read back as one table") {
    val t = freshName("mix")
    HiveQl.sql(spark, s"create table $t(k string, v string) " +
      "partitioned by (dt string) stored as textfile")
    HiveQl.sql(spark, s"insert overwrite table $t partition(dt='a') values ('1','x'),('2','y')")
    HiveQl.sql(spark, s"alter table $t set fileformat rcfile")
    HiveQl.sql(spark, s"insert overwrite table $t partition(dt='b') values ('3','z')")
    HiveQl.sql(spark, s"alter table $t set fileformat sequencefile")
    HiveQl.sql(spark, s"insert overwrite table $t partition(dt='c') values ('4','w')")

    // the bytes really are three different containers
    assert(partFiles(t, Map("dt" -> "a"))
      .map(sources.HiveHeteroSource.formatOf).distinct == Seq("textfile"))
    assert(partFiles(t, Map("dt" -> "b"))
      .map(sources.HiveHeteroSource.formatOf).distinct == Seq("rcfile"))
    assert(partFiles(t, Map("dt" -> "c"))
      .map(sources.HiveHeteroSource.formatOf).distinct == Seq("sequencefile"))

    // one scan unions all three transparently
    val rows = spark.sql(s"select k, v, dt from $t order by k").collect().toSeq
    assert(rows == Seq(Row("1", "x", "a"), Row("2", "y", "a"),
      Row("3", "z", "b"), Row("4", "w", "c")))
    spark.sql(s"drop table $t")
  }

  test("parquet partitions written BEFORE the conversion stay readable") {
    val t = freshName("parq")
    // bare create → the session-default parquet provider
    HiveQl.sql(spark, s"create table $t(k string, v string) partitioned by (dt string)")
    HiveQl.sql(spark, s"insert overwrite table $t partition(dt='old') values ('1','p')")
    HiveQl.sql(spark, s"alter table $t set fileformat rcfile")
    HiveQl.sql(spark, s"insert overwrite table $t partition(dt='new') values ('2','r')")

    assert(partFiles(t, Map("dt" -> "old"))
      .map(sources.HiveHeteroSource.formatOf).distinct == Seq("parquet"))
    assert(partFiles(t, Map("dt" -> "new"))
      .map(sources.HiveHeteroSource.formatOf).distinct == Seq("rcfile"))
    val rows = spark.sql(s"select k, v, dt from $t order by k").collect().toSeq
    assert(rows == Seq(Row("1", "p", "old"), Row("2", "r", "new")))
    spark.sql(s"drop table $t")
  }

  test("overwriting an existing partition adopts the table's CURRENT format") {
    // partition_wise_fileformat3.q.out golden: dt=101 flips RCFile →
    // SequenceFile when re-overwritten after the table-level alter
    val t = freshName("flip")
    HiveQl.sql(spark, s"create table $t(k string, v string) " +
      "partitioned by (dt string) stored as textfile")
    HiveQl.sql(spark, s"alter table $t set fileformat rcfile")
    HiveQl.sql(spark, s"insert overwrite table $t partition(dt='x') values ('1','a')")
    assert(partFiles(t, Map("dt" -> "x"))
      .map(sources.HiveHeteroSource.formatOf).distinct == Seq("rcfile"))
    HiveQl.sql(spark, s"alter table $t set fileformat sequencefile")
    HiveQl.sql(spark, s"insert overwrite table $t partition(dt='x') values ('2','b')")
    assert(partFiles(t, Map("dt" -> "x"))
      .map(sources.HiveHeteroSource.formatOf).distinct == Seq("sequencefile"))
    assert(spark.sql(s"select k from $t").collect().map(_.getString(0)).toSeq == Seq("2"))
    spark.sql(s"drop table $t")
  }

  test("partition pruning survives the hetero conversion (scale posture)") {
    val t = freshName("prune")
    HiveQl.sql(spark, s"create table $t(k string, v string) " +
      "partitioned by (dt string) stored as textfile")
    HiveQl.sql(spark, s"insert overwrite table $t partition(dt='a') values ('1','x')")
    HiveQl.sql(spark, s"alter table $t set fileformat rcfile")
    HiveQl.sql(spark, s"insert overwrite table $t partition(dt='b') values ('2','y')")
    val df = spark.sql(s"select k from $t where dt = 'b'")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("dt#"),
      s"partition filter must prune at the scan:\n$p")
    // pruned scan reads ONE partition's files: the sniff dispatch happens
    // after pruning, so only dt=b is opened
    assert(df.collect().map(_.getString(0)).toSeq == Seq("2"))
    spark.sql(s"drop table $t")
  }

  test("partition-level SET FILEFORMAT records metadata and validates existence") {
    val t = freshName("pmeta")
    HiveQl.sql(spark, s"create table $t(k string) partitioned by (ds string) " +
      "stored as textfile")
    HiveQl.sql(spark, s"alter table $t add partition (ds='1')")
    HiveQl.sql(spark, s"alter table $t partition (ds='1') set fileformat rcfile")
    val cat = spark.sessionState.catalog
    val ti = spark.sessionState.sqlParser.parseTableIdentifier(t)
    assert(cat.getPartition(ti, Map("ds" -> "1"))
      .storage.properties.get("graft.format").contains("rcfile"))
    intercept[Exception] {
      HiveQl.sql(spark, s"alter table $t partition (ds='9') set fileformat rcfile")
    }
    spark.sql(s"drop table $t")
  }

  test("SET FILEFORMAT rejects formats outside the Hive triple") {
    val t = freshName("bad")
    HiveQl.sql(spark, s"create table $t(k string) stored as textfile")
    intercept[IllegalArgumentException] {
      HiveQl.sql(spark, s"alter table $t set fileformat orc")
    }
    spark.sql(s"drop table $t")
  }
}
