package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import graft.sources.Compaction

/** Small-file merge (the reference's conditional merge job,
  * GenMRFileSink1.java): fragmented table directories are rewritten toward
  * the target file size, content-identically, write-audit-publish; healthy
  * directories are left untouched.
  */
class CompactionSpec extends SparkSpec {

  private def fileCount(dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(s => s.isFile && !s.getPath.getName.startsWith("_")
      && !s.getPath.getName.startsWith("."))
  }

  private def contentDigest(dir: String): (Long, Long) = {
    val df = spark.read.parquet(dir)
    val r = df.selectExpr("count(*) AS n",
      "cast(sum(cast(conv(substr(md5(concat_ws('', doc_id, lang, source)), 1, 8), 16, 10) AS bigint)) AS bigint) AS h")
      .head()
    (r.getLong(0), r.getLong(1))
  }

  test("fragmented directory merges to the target count, content-identical") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/docs"
    graft.Tables.load(spark, sfDir, "documents")
      .repartition(40) // fragment: 40 tiny files
      .write.mode("overwrite").parquet(dir)
    assert(fileCount(dir) == 40)
    val before = contentDigest(dir)

    val ran = Compaction.compactIfFragmented(spark, dir,
      targetBytes = 512L * 1024, smallFileAvgThreshold = 256L * 1024)
    assert(ran, "merge should trigger on 40 tiny files")
    assert(fileCount(dir) < 40, "file count must shrink")
    assert(contentDigest(dir) == before, "content must be byte-for-byte stable")
    // no temp/trash residue (write-audit-publish cleaned up)
    val parent = new Path(dir).getParent
    val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(parent).exists(_.getPath.getName.contains("__compact")))
  }

  test("recovers a crashed publish (dir absent, data under __compact_old)") {
    val dir = Files.createTempDirectory("graft_compact3").toString + "/docs"
    graft.Tables.load(spark, sfDir, "documents")
      .repartition(4)
      .write.mode("overwrite").parquet(dir)
    val before = contentDigest(dir)
    // simulate a crash between the two publish renames: table dir gone,
    // data intact under __compact_old
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val trash = new Path(p.getParent, p.getName + "__compact_old")
    assert(fs.rename(p, trash))
    assert(!fs.exists(p))

    val ran = Compaction.compactIfFragmented(spark, dir,
      targetBytes = 512L * 1024, smallFileAvgThreshold = 1L) // healthy after recovery
    assert(!ran, "healthy dir: recovery only, no merge")
    assert(fs.exists(p) && !fs.exists(trash), "old dir restored, trash gone")
    assert(contentDigest(dir) == before, "recovered content intact")
  }

  test("partitioned layout compacts per partition; healthy siblings untouched") {
    val dir = Files.createTempDirectory("graft_compact_p").toString + "/docs"
    val docs = graft.Tables.load(spark, sfDir, "documents")
    // lang=X partitions; fragment only one of them afterwards
    docs.repartition(1).write.mode("overwrite").partitionBy("lang").parquet(dir)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    val frag = s"$dir/lang=${langs.head}"
    val fragRows = spark.read.parquet(frag)
    fragRows.repartition(30).write.mode("overwrite").parquet(frag)
    assert(fileCount(frag) == 30)
    val healthy = s"$dir/lang=${langs.last}"
    val healthyFiles = fileCount(healthy)
    val before = spark.read.parquet(dir).count()

    val ran = Compaction.compactIfFragmented(spark, dir,
      targetBytes = 512L * 1024, smallFileAvgThreshold = 256L * 1024)
    assert(ran, "the fragmented partition must trigger a merge")
    assert(fileCount(frag) < 30, "fragmented partition merged")
    assert(fileCount(healthy) == healthyFiles, "healthy sibling untouched")
    assert(spark.read.parquet(dir).count() == before, "content stable")
  }

  test("recovers a crashed PARTITION publish from the table root") {
    val dir = Files.createTempDirectory("graft_compact_pr").toString + "/docs"
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.repartition(1).write.mode("overwrite").partitionBy("lang").parquet(dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).sorted
    val before = spark.read.parquet(dir).count()

    // crash shape 1: partition dir renamed aside, republish never happened
    val crashed = new Path(dir, s"lang=${langs.head}")
    val crashedOld = new Path(dir, s"lang=${langs.head}__compact_old")
    assert(fs.rename(crashed, crashedOld))
    // crash shape 2: an orphaned scratch dir next to a healthy partition —
    // without cleanup Spark partition discovery would double-count it under
    // a bogus `lang=<v>__compact_tmp` partition value
    val healthy = new Path(dir, s"lang=${langs.last}")
    val orphanTmp = new Path(dir, s"lang=${langs.last}__compact_tmp")
    org.apache.hadoop.fs.FileUtil.copy(fs, healthy, fs, orphanTmp, false,
      spark.sparkContext.hadoopConfiguration)

    val ran = Compaction.compactIfFragmented(spark, dir,
      targetBytes = 512L * 1024, smallFileAvgThreshold = 1L) // healthy after recovery
    assert(!ran, "recovery only — no partition needed a merge")
    assert(fs.exists(crashed) && !fs.exists(crashedOld), "crashed partition restored")
    assert(!fs.exists(orphanTmp), "orphan scratch removed")
    assert(spark.read.parquet(dir).count() == before, "row count restored exactly")
    assert(spark.read.parquet(dir).select("lang").distinct().count() == langs.length,
      "no bogus partition values from recovery dirs")
  }

  test("healthy directory is left untouched (conditional, like the reference)") {
    val dir = Files.createTempDirectory("graft_compact2").toString + "/docs"
    graft.Tables.load(spark, sfDir, "documents")
      .repartition(1)
      .write.mode("overwrite").parquet(dir)
    val files = fileCount(dir)
    val ran = Compaction.compactIfFragmented(spark, dir,
      targetBytes = 512L * 1024, smallFileAvgThreshold = 1L) // avg >= 1 byte
    assert(!ran)
    assert(fileCount(dir) == files)
  }
}
