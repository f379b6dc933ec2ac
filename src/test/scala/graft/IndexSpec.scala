package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Indexes

/** The index subsystem (closes the §7.5 compact/bitmap index drop):
  * DDL statement surface, reference index-table layouts, the
  * hive.optimize.index.filter rewrite's file pruning, its staleness
  * guard, and the bitmap handler's row-level AND
  * (CompactIndexHandler.java / BitmapIndexHandler.java /
  * IndexWhereProcessor.java).
  */
class IndexSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-idx-$tag").toString

  private def withIndexFilter[T](body: => T): T = {
    spark.conf.set("hive.optimize.index.filter", "true")
    try body finally spark.conf.set("hive.optimize.index.filter", "false")
  }

  test("CREATE/SHOW/ALTER REBUILD/DROP INDEX statement surface") {
    val dir = freshDir("ddl")
    Tables.load(spark, sfDir, "nation").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("idx_nation")

    HiveQl.sql(spark,
      "CREATE INDEX n_idx ON TABLE idx_nation (n_regionkey) AS 'COMPACT' " +
        "WITH DEFERRED REBUILD COMMENT 'region key index'")
    // deferred: registered but not built — SHOW sees it, the rewrite won't
    val shown = HiveQl.sql(spark, "SHOW INDEXES ON idx_nation")
    assert(shown.columns.toSeq == Seq("idx_name", "tab_name", "col_names",
      "idx_tab_name", "idx_type", "comment"),
      "reference ShowIndexesDesc.java:39 schema")
    val row = shown.collect().head
    assert(row.getString(0) == "n_idx")
    assert(row.getString(2) == "n_regionkey")
    assert(row.getString(3) == "default__idx_nation_n_idx__",
      "metastore index-table naming, MetaStoreUtils.java:925")
    assert(row.getString(4) == "compact")
    assert(row.getString(5) == "region key index")
    assert(Indexes.get("idx_nation", "n_idx", spark).exists(!_.built))

    HiveQl.sql(spark, "ALTER INDEX n_idx ON idx_nation REBUILD")
    assert(Indexes.get("idx_nation", "n_idx", spark).exists(_.built))
    // the index table is queryable under its metastore-convention name
    val idxTbl = spark.table("default__idx_nation_n_idx__")
    assert(idxTbl.columns.toSeq == Seq("n_regionkey", "_bucketname", "_offsets"),
      "CompactIndexHandler.java:73-77 layout")
    assert(idxTbl.schema("_offsets").dataType.simpleString == "array<bigint>")
    assert(idxTbl.select("n_regionkey").distinct().count() == 5)

    // SHOW INDEXES also flows through the injected parser (spark.sql)
    assert(spark.sql("SHOW INDEXES ON idx_nation").count() == 1)

    HiveQl.sql(spark, "DROP INDEX n_idx ON idx_nation")
    assert(HiveQl.sql(spark, "SHOW INDEXES ON idx_nation").count() == 0)
    // IF EXISTS tolerates absence; bare DROP is loud
    HiveQl.sql(spark, "DROP INDEX IF EXISTS n_idx ON idx_nation")
    val e = intercept[Exception](HiveQl.sql(spark, "DROP INDEX n_idx ON idx_nation"))
    assert(e.getMessage.contains("does not exist"))
  }

  test("unsupported handler and duplicate index are loud") {
    val dir = freshDir("err")
    Tables.load(spark, sfDir, "region").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("idx_region")
    val bad = intercept[Exception](HiveQl.sql(spark,
      "CREATE INDEX r1 ON TABLE idx_region (r_regionkey) AS 'AGGREGATE'"))
    assert(bad.getMessage.contains("unsupported index handler"))
    HiveQl.sql(spark,
      "CREATE INDEX r1 ON TABLE idx_region (r_regionkey) AS 'COMPACT'")
    val dup = intercept[Exception](HiveQl.sql(spark,
      "CREATE INDEX r1 ON TABLE idx_region (r_regionkey) AS 'BITMAP'"))
    assert(dup.getMessage.contains("already exists"))
    HiveQl.sql(spark, "DROP INDEX r1 ON idx_region")
  }

  test("compact index prunes files; rewrite preserves results; off by default") {
    val dir = freshDir("compact")
    Tables.load(spark, sfDir, "lineitem")
      .repartitionByRange(6, col("l_partkey"))
      .write.mode("overwrite").parquet(dir)
    val view = "idx_li_compact"
    spark.read.parquet(dir).createOrReplaceTempView(view)
    Indexes.createIndex(spark, "pk", view, Seq("l_partkey"), "COMPACT",
      deferred = false, comment = None)
    try {
      val full = spark.read.parquet(dir).inputFiles.length
      assert(full >= 4, s"fixture should span several files, got $full")
      def q = spark.table(view).filter(col("l_partkey") <= 3L)
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("qty"))
      val expected = q.collect().head
      // default off: the conf gates the rewrite (HIVEOPTINDEXFILTER=false)
      assert(q.inputFiles.length == full, "no pruning without the conf")
      withIndexFilter {
        assert(q.inputFiles.length < full, "range predicate should prune")
        assert(q.collect().head == expected, "pruning must not change results")
      }
    } finally Indexes.dropIndex(spark, "pk", view, ifExists = true)
  }

  test("staleness guard: files appended after REBUILD are never pruned") {
    val dir = freshDir("stale")
    val view = "idx_li_stale"
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_partkey") =!= 7L)
      .repartitionByRange(4, col("l_partkey"))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView(view)
    Indexes.createIndex(spark, "pk", view, Seq("l_partkey"), "COMPACT",
      deferred = false, comment = None)
    try {
      // append matching rows AFTER the build — the index knows nothing of
      // this file; a naive rewrite would silently drop these rows
      Tables.load(spark, sfDir, "lineitem").filter(col("l_partkey") === 7L)
        .coalesce(1).write.mode("append").parquet(dir)
      spark.read.parquet(dir).createOrReplaceTempView(view)
      val truth = spark.read.parquet(dir)
        .filter(col("l_partkey") === 7L).count()
      assert(truth > 0, "fixture must have l_partkey=7 rows")
      withIndexFilter {
        val q = spark.table(view).filter(col("l_partkey") === 7L)
        assert(q.count() == truth,
          "appended (unindexed) file must stay in the scan")
      }
    } finally Indexes.dropIndex(spark, "pk", view, ifExists = true)
  }

  test("staleness guard: a file REPLACED in place (same name) is re-scanned") {
    val dir = freshDir("replace")
    import spark.implicits._
    Seq(1L, 1L, 1L, 1L, 1L).toDF("k").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).inputFiles.toSet
    Seq(2L).toDF("k").coalesce(1).write.mode("append").parquet(dir)
    val f2 = (spark.read.parquet(dir).inputFiles.toSet -- before).head
    val view = "idx_replace"
    spark.read.parquet(dir).createOrReplaceTempView(view)
    Indexes.createIndex(spark, "k", view, Seq("k"), "COMPACT",
      deferred = false, comment = None)
    try {
      // an external writer replaces f2's CONTENT under the same name
      // (compaction-style in-place rewrite, different length)
      val tmp = freshDir("replsrc")
      Seq(3L, 3L, 3L).toDF("k").coalesce(1).write.mode("overwrite").parquet(tmp)
      val srcFile = spark.read.parquet(tmp).inputFiles.head
      val conf = spark.sparkContext.hadoopConfiguration
      val dst = new org.apache.hadoop.fs.Path(f2)
      val fs = dst.getFileSystem(conf)
      fs.delete(dst, false)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(srcFile), fs, dst, false, conf)
      // Spark's own listing cache needs the standard refresh after any
      // external rewrite (index or no index); the INDEX must then catch
      // the content change on its own
      spark.catalog.refreshByPath(dir)
      spark.read.parquet(dir).createOrReplaceTempView(view)
      withIndexFilter {
        // the index knows nothing of k=3; a NAME-only guard would prune
        // the replaced file (old name, no k=3 entry) and silently lose
        // the row — the length check keeps it in the scan
        val q = spark.table(view).filter(col("k") === 3L)
        assert(q.count() == 3, "replaced file must be re-scanned")
        // and the old key no longer matches anything — filter still rules
        assert(spark.table(view).filter(col("k") === 2L).count() == 0)
      }
    } finally Indexes.dropIndex(spark, "k", view, ifExists = true)
  }

  test("bitmap indexes AND at row level: co-occurrence decides the file") {
    val dir = freshDir("bitmapand")
    import spark.implicits._
    // file A: has k1='x' rows and k2='q' rows, but never on the SAME row;
    // file B: one row with both. A per-index (compact-style) intersection
    // keeps both files; the reference's bitmap AND join
    // (BitmapIndexHandler.java:103-112) prunes file A.
    Seq(("x", "p", 1L), ("y", "q", 2L)).toDF("k1", "k2", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Seq(("x", "q", 3L), ("z", "z", 4L)).toDF("k1", "k2", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val view = "idx_bitmap_and"
    spark.read.parquet(dir).createOrReplaceTempView(view)
    Indexes.createIndex(spark, "b1", view, Seq("k1"), "BITMAP",
      deferred = false, comment = None)
    Indexes.createIndex(spark, "b2", view, Seq("k2"), "BITMAP",
      deferred = false, comment = None)
    try {
      // layout parity: keys, _bucketname, _offset, _bitmaps array<bigint>
      // decodable by the ewah family (BitmapIndexHandler.java:211-215)
      val idxTbl = spark.table("default__idx_bitmap_and_b1__")
      assert(idxTbl.columns.toSeq ==
        Seq("k1", "_bucketname", "_offset", "_bitmaps"))
      assert(idxTbl.schema("_bitmaps").dataType.simpleString == "array<bigint>")
      assert(idxTbl.filter(col("k1") === "x")
        .selectExpr("bitmap_count(ewah_decode(_bitmaps)) AS c")
        .collect().map(_.getAs[Number](0).longValue).sum == 2,
        "one 'x' row per file, EWAH-decodable")
      withIndexFilter {
        val q = spark.table(view)
          .filter(col("k1") === "x" && col("k2") === "q").select("v")
        assert(q.inputFiles.length == 1,
          "row-level AND must prune the no-co-occurrence file")
        assert(q.collect().map(_.getLong(0)).toSeq == Seq(3L))
      }
    } finally {
      Indexes.dropIndex(spark, "b1", view, ifExists = true)
      Indexes.dropIndex(spark, "b2", view, ifExists = true)
    }
  }

  test("unsupported conjuncts stay residual; supported ones still prune") {
    val dir = freshDir("residual")
    Tables.load(spark, sfDir, "orders")
      .repartitionByRange(4, col("o_custkey"))
      .write.mode("overwrite").parquet(dir)
    val view = "idx_ord_res"
    spark.read.parquet(dir).createOrReplaceTempView(view)
    Indexes.createIndex(spark, "ck", view, Seq("o_custkey"), "COMPACT",
      deferred = false, comment = None)
    try {
      val full = spark.read.parquet(dir).inputFiles.length
      withIndexFilter {
        // LIKE is outside IndexPredicateAnalyzer's shapes — it must stay in
        // the Filter while o_custkey = probes the index
        val q = spark.table(view)
          .filter(col("o_custkey") === 1L &&
            col("o_orderpriority").like("%URGENT%"))
        assert(q.inputFiles.length < full)
        val expect = spark.read.parquet(dir)
          .filter(col("o_custkey") === 1L &&
            col("o_orderpriority").like("%URGENT%")).count()
        assert(q.count() == expect)
      }
    } finally Indexes.dropIndex(spark, "ck", view, ifExists = true)
  }
}
