package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** §2.11 DDL depth (ALTER TABLE, MSCK REPAIR, persistent views) and the
  * partition-pruning guarantees that replace the reference's index
  * machinery (SURVEY.md §1.1: Parquet min/max + partition pruning + DPP
  * supersede compact/bitmap indexes).
  */
class DdlAndPruningSpec extends SparkSpec {

  test("ALTER TABLE ADD COLUMNS and RENAME on a catalog table") {
    spark.sql("DROP TABLE IF EXISTS ddl_t")
    spark.sql("DROP TABLE IF EXISTS ddl_t2")
    spark.sql("CREATE TABLE ddl_t (k BIGINT, v STRING) USING parquet")
    spark.sql("INSERT INTO ddl_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE ddl_t ADD COLUMNS (extra DOUBLE)")
    assert(spark.table("ddl_t").columns.toSeq == Seq("k", "v", "extra"))
    assert(spark.table("ddl_t").filter(col("extra").isNull).count() == 2)
    spark.sql("ALTER TABLE ddl_t RENAME TO ddl_t2")
    assert(spark.table("ddl_t2").count() == 2)
    spark.sql("DROP TABLE ddl_t2")
  }

  test("MSCK REPAIR discovers externally-added partitions") {
    val dir = Files.createTempDirectory("graft-msck").toString
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    spark.sql("DROP TABLE IF EXISTS msck_t")
    spark.sql(s"""CREATE TABLE msck_t (l_orderkey BIGINT, l_quantity DOUBLE)
                  USING parquet PARTITIONED BY (l_returnflag STRING)
                  LOCATION '$dir'""")
    assert(spark.table("msck_t").count() == 0, "partitions unknown before repair")
    spark.sql("MSCK REPAIR TABLE msck_t")
    assert(spark.table("msck_t").count() ==
      Tables.load(spark, sfDir, "lineitem").count())
    spark.sql("DROP TABLE msck_t")
  }

  test("persistent view over catalog tables") {
    spark.sql("DROP VIEW IF EXISTS v_orders")
    spark.sql("DROP TABLE IF EXISTS v_base")
    Tables.load(spark, sfDir, "orders").write.mode("overwrite").saveAsTable("v_base")
    spark.sql("CREATE VIEW v_orders AS SELECT o_orderstatus, count(*) AS n FROM v_base GROUP BY 1")
    assert(spark.sql("SELECT * FROM v_orders").count() > 0)
    spark.sql("DROP VIEW v_orders")
    spark.sql("DROP TABLE v_base")
  }

  test("static partition pruning reaches the scan") {
    val dir = Files.createTempDirectory("graft-prune").toString
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"partition filter not pushed:\n$scan")
    val expected = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "A").count()
    assert(df.count() == expected)
  }

  test("dynamic partition pruning from a filtered dimension join") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    import spark.implicits._
    val fact = spark.read.parquet(dir)
    // DPP requires a selective predicate on the dim side that survives
    // optimization — a LocalRelation filter constant-folds away, so the
    // dim must be a real scan
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("A", "keep"), ("N", "drop"), ("R", "drop"))
      .toDF("flag", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
    val joined = fact.join(dim, col("l_returnflag") === col("flag"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning")
      || plan.contains("dynamicpruningexpression"),
      s"DPP not engaged:\n$plan")
  }
}
