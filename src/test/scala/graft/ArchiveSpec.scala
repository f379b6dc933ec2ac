package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.HiveArchive

/** Hadoop archives (closes the §7.5 HAR drop): the written HAR is a real
  * version-3 archive Hadoop's stock HarFileSystem parses — listing,
  * ranged reads, parquet scans over `har://` — and the ALTER TABLE
  * [UN]ARCHIVE PARTITION statements repoint partitions the way the
  * reference's ArchiveWork does.
  */
class ArchiveSpec extends SparkSpec {

  test("archived parquet dir reads through Hadoop's own HarFileSystem") {
    val dir = Files.createTempDirectory("graft-har").toString
    val src = Tables.load(spark, sfDir, "nation")
    src.repartition(3).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).orderBy("n_nationkey").collect()
    val nFiles = spark.read.parquet(dir).inputFiles.length
    assert(nFiles >= 2, "fixture should span several files")

    val uri = HiveArchive.archive(spark, dir)
    // the originals are MOVED into the archive (reference semantics)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet ==
      Set("data.har"), "only the har (and write markers) remains")

    // Hadoop's HarFileSystem (not our code) lists and serves the payload
    val harPath = new Path(uri)
    val harFs = harPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(harFs.getClass.getName == "org.apache.hadoop.fs.HarFileSystem")
    val listed = harFs.listStatus(harPath).map(_.getPath.getName).sorted
    assert(listed.length == nFiles, s"har lists the archived parts: ${listed.toSeq}")

    // a parquet scan straight over har:// — identical rows
    val after = spark.read.parquet(uri).orderBy("n_nationkey").collect()
    assert(after.toSeq == before.toSeq, "payload identical through the har")

    // unarchive restores the original layout byte-for-byte
    HiveArchive.unarchive(spark, dir)
    assert(!fs.exists(new Path(dir, "data.har")))
    val restored = spark.read.parquet(dir).orderBy("n_nationkey").collect()
    assert(restored.toSeq == before.toSeq)
    assert(spark.read.parquet(dir).inputFiles.length == nFiles)
  }

  test("ALTER TABLE ARCHIVE/UNARCHIVE PARTITION repoints like ArchiveWork") {
    spark.sql("DROP TABLE IF EXISTS arch_t")
    val base = Files.createTempDirectory("graft-har-tbl").toString
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .repartition(3)
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(base)
    spark.sql(s"""CREATE TABLE arch_t (l_orderkey BIGINT, l_quantity DOUBLE)
                  USING parquet PARTITIONED BY (l_returnflag STRING)
                  LOCATION '$base'""")
    spark.sql("MSCK REPAIR TABLE arch_t")
    def q = spark.table("arch_t").groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy("l_returnflag").collect().toSeq
    val before = q

    HiveQl.sql(spark, "ALTER TABLE arch_t ARCHIVE PARTITION (l_returnflag='A')")
    // the partition now POINTS AT the har (reference setArchived)
    val loc = spark.sql(
      "DESCRIBE FORMATTED arch_t PARTITION (l_returnflag='A')")
      .filter(col("col_name") === "Location").collect().head.getString(1)
    assert(loc.startsWith("har:"), s"partition location should be har:, got $loc")
    assert(q == before, "query results unchanged over the archived partition")

    HiveQl.sql(spark, "ALTER TABLE arch_t UNARCHIVE PARTITION (l_returnflag='A')")
    val loc2 = spark.sql(
      "DESCRIBE FORMATTED arch_t PARTITION (l_returnflag='A')")
      .filter(col("col_name") === "Location").collect().head.getString(1)
    assert(!loc2.startsWith("har:"))
    assert(q == before, "results unchanged after unarchive")
    spark.sql("DROP TABLE arch_t")
  }

  test("double archive and unarchive of a non-archive are loud") {
    val dir = Files.createTempDirectory("graft-har-err").toString
    Tables.load(spark, sfDir, "region").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    HiveArchive.archive(spark, dir)
    val e = intercept[Exception](HiveArchive.archive(spark, dir))
    assert(e.getMessage.contains("already archived") ||
      e.getMessage.contains("nothing to archive"))
    HiveArchive.unarchive(spark, dir)
    val e2 = intercept[Exception](HiveArchive.unarchive(spark, dir))
    assert(e2.getMessage.contains("not archived"))
  }
}
