package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Spark-native analogue of the reference's conditional small-file merge
  * (`optimizer/GenMRFileSink1.java` — the ConditionalTask merge job gated by
  * `hive.merge.mapfiles` / `hive.merge.smallfiles.avgsize` /
  * `hive.merge.size.per.task`, HiveConf.java): when the average data-file
  * size of a table directory falls below the small-file threshold, rewrite
  * the directory with file sizes aimed at `targetBytes`.
  *
  * Spark-first shape: the rewrite is ONE round-robin shuffle
  * (`repartition(n)` with n from actual on-disk bytes — the REBALANCE
  * posture; at cluster scale AQE's rebalance/coalesce does the same from
  * runtime statistics), and the publish is write-audit-publish: the merged
  * copy lands in a sibling temp dir and swaps in only after the write
  * succeeds — the same commit discipline as the reference's MoveTask.
  */
object Compaction {

  /** @return true when a merge ran, false when the directory was already
    *         healthy (files.isEmpty or avg ≥ smallFileAvgThreshold).
    *
    * Crash window: the two publish renames are not atomic together — a crash
    * between them leaves the table dir absent with the data intact under
    * `__compact_old`, and a concurrent reader racing the swap can see ENOENT
    * for one listing. Entry therefore begins with crash RECOVERY: if the
    * table dir is missing but `__compact_old` exists, the old dir is renamed
    * back before anything else. (On a cluster this would sit behind the
    * metastore lock the reference's MoveTask holds; single-writer here.)
    */
  def compactIfFragmented(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      smallFileAvgThreshold: Long = 64L * 1024 * 1024,
      format: String = "parquet",
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      options: Map[String, String] = Map.empty,
      parallel: Boolean = true): Boolean = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val trashAtEntry = new Path(path.getParent, path.getName + "__compact_old")
    if (!fs.exists(path) && fs.exists(trashAtEntry)) {
      // recover from a crash between the two publish renames
      if (!fs.rename(trashAtEntry, path))
        throw new IllegalStateException(
          s"compaction recovery failed: cannot restore $dir from $trashAtEntry")
    }
    // per-CHILD crash recovery (partition layouts): a crash while compacting
    // one partition leaves `k=v__compact_old` (data, table dir missing) or an
    // orphaned `k=v__compact_tmp` (unpublished scratch, source intact) as a
    // SIBLING under this root — restore the former when `k=v` is absent,
    // delete it when `k=v` was already republished, always delete scratch —
    // so neither is ever scanned as a bogus partition value below
    fs.listStatus(path).toSeq.filter(_.isDirectory).foreach { d =>
      val name = d.getPath.getName
      if (name.endsWith("__compact_tmp")) fs.delete(d.getPath, true)
      else if (name.endsWith("__compact_old")) {
        val orig = new Path(path, name.stripSuffix("__compact_old"))
        if (fs.exists(orig)) fs.delete(d.getPath, true)
        else if (!fs.rename(d.getPath, orig))
          throw new IllegalStateException(
            s"compaction recovery failed: cannot restore $orig from ${d.getPath}")
      }
    }
    val entries = fs.listStatus(path).toSeq
      .filterNot(s => s.getPath.getName.startsWith("_")
        || s.getPath.getName.startsWith("."))
    // Hive partition layout (k=v subdirectories): the reference's merge
    // job runs once per partition (GenMRFileSink1 plans the ConditionalTask
    // under the dynamic-partition ctx) — recurse per partition directory,
    // each with its own threshold check and write-audit-publish swap, so
    // one fragmented partition never rewrites its healthy siblings
    val partDirs = entries.filter(s => s.isDirectory && s.getPath.getName.contains("="))
    if (partDirs.nonEmpty) {
      // a 100-dynamic-partition insert means 100 independent merge checks —
      // run them on a bounded pool (concurrent Spark jobs from one session
      // are safe; each dir has its own write-audit-publish swap). At 100 TB
      // with thousands of partitions a sequential walk IS the merge cost:
      // the round-15 idle A/B measured rcfile_merge1 (2 tables × 100 dyn
      // partitions) at 23.5 s sequential, dominated by per-dir driver jobs.
      // Parallelism only at this top call — workers recurse sequentially,
      // so a nested tree can never deadlock the pool.
      val results: Seq[Boolean] =
        if (parallel && partDirs.size > 1) {
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(8, partDirs.size))
          try partDirs.map(d => pool.submit(
            new java.util.concurrent.Callable[Boolean] {
              def call(): Boolean = compactIfFragmented(spark,
                d.getPath.toString, targetBytes, smallFileAvgThreshold,
                format, schema, options, parallel = false)
            })).map(_.get())
          finally pool.shutdown()
        } else partDirs.map(d => compactIfFragmented(spark, d.getPath.toString,
          targetBytes, smallFileAvgThreshold, format, schema, options,
          parallel = false))
      return results.count(identity) > 0
    }
    val dataFiles = entries.filter(_.isFile)
    if (dataFiles.isEmpty) return false
    val total = dataFiles.map(_.getLen).sum
    if (total / dataFiles.size >= smallFileAvgThreshold) return false

    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    // a rewrite that cannot REDUCE the file count is a no-op with I/O cost
    // (the q663 profile: every 1-file partition under the avg threshold was
    // being read and rewritten to the same 1 file) — the merge contract is
    // fewer files, so skip when already at or below the target count
    if (dataFiles.size <= n) return false
    val tmp = new Path(path.getParent, path.getName + "__compact_tmp")
    val trash = new Path(path.getParent, path.getName + "__compact_old")
    // format-aware rewrite: the graft FileFormats (hivetext/hiveseq/hiverc)
    // need their DDL schema and delimiter options; parquet self-describes
    val reader = schema.foldLeft(spark.read.format(format).options(options))(_ schema _)
    reader.load(dir).repartition(n)
      .write.mode("overwrite").format(format).options(options).save(tmp.toString)
    // publish: old dir steps aside only after the merged copy is complete
    if (fs.exists(trash)) fs.delete(trash, true)
    if (!fs.rename(path, trash)) {
      fs.delete(tmp, true)
      throw new IllegalStateException(s"compaction publish failed for $dir")
    }
    if (!fs.rename(tmp, path)) {
      fs.rename(trash, path) // roll back
      throw new IllegalStateException(s"compaction publish failed for $dir")
    }
    fs.delete(trash, true)
    true
  }
}
