package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** EXPORT TABLE t TO 'dir' / IMPORT [TABLE t] FROM 'dir'
  * (ref parse/ExportSemanticAnalyzer.java:1, ImportSemanticAnalyzer.java:1,
  * grammar Hive.g:309-317; layout EximUtil: a `_metadata` descriptor beside
  * a `data/` directory).
  *
  * Spark-first re-expression: the data payload is parquet written by the
  * engine (the reference copies raw storage files; byte-level storage compat
  * is out of scope per SURVEY §7.5), and `_metadata` carries the table name
  * and Catalyst schema JSON instead of a Thrift-serialized Hive Table
  * object. Paths go through the Hadoop FileSystem API, so any
  * defaultFS-reachable scheme works on a cluster, not just local disk.
  * Partition specs and IMPORT EXTERNAL/LOCATION are not supported
  * (documented in SURVEY §7.5 — metadata/deployment machinery).
  */
object HiveExim {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exportTable(spark: SparkSession, table: String, dir: String): Unit = {
    val df = spark.table(table)
    val root = new Path(dir)
    val f = fs(spark, root)
    // reference behavior: target may exist only as an empty directory
    // (ExportSemanticAnalyzer "Target is not a directory" / "not empty")
    if (f.exists(root) && f.listStatus(root).nonEmpty)
      throw new IllegalArgumentException(
        s"EXPORT target $dir exists and is not empty")
    df.write.mode(SaveMode.ErrorIfExists).parquet(new Path(root, "data").toString)
    val meta = s"""{"table":"${table.split('.').last}","schema":${df.schema.json}}"""
    val out = f.create(new Path(root, "_metadata"), false)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
  }

  def importTable(spark: SparkSession, table: Option[String], dir: String): Unit = {
    val root = new Path(dir)
    val f = fs(spark, root)
    val in = f.open(new Path(root, "_metadata"))
    val meta = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    // minimal descriptor parse: the exported name is the first "table" field
    val name = table.getOrElse {
      """"table"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(meta)
        .map(_.group(1))
        .getOrElse(throw new IllegalArgumentException(
          s"no table name in $dir/_metadata and none given"))
    }
    val df = spark.read.parquet(new Path(root, "data").toString)
    // ImportSemanticAnalyzer: load into an existing (compatible) table,
    // create it when absent. insertInto is POSITIONAL, so align to the
    // target's column order by name first — a same-columns-different-order
    // table would otherwise silently store misaligned data (the reference
    // checks table compatibility before loading); a missing column fails
    // loudly in the select
    if (spark.catalog.tableExists(name)) {
      import org.apache.spark.sql.functions.col
      df.select(spark.table(name).columns.map(col).toIndexedSeq: _*)
        .write.insertInto(name)
    } else df.write.saveAsTable(name)
  }
}
