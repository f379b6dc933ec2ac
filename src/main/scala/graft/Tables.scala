package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog facade over the driver-generated parquet fixtures.
  *
  * The reference resolves tables through its metastore
  * (ref: metastore/src/java/org/apache/hadoop/hive/metastore/ObjectStore.java:113);
  * here the Spark catalog plays that role: every fixture is exposed both as a
  * lazily-planned [[DataFrame]] and as a temp view so queries can be written
  * with either the DataFrame DSL or `spark.sql`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by default
      // (PARQUET_TYPE_ILLEGAL). Sessions.builder sets nanosAsLong=true at
      // session creation; the guarded set below only covers foreign sessions
      // (e.g. the driver's own) and never flips an explicit setting.
      if (!spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false").toBoolean)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        // raw nanos → micros via integer division — going through double
        // would lose precision at ~1.7e18 ns.
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every fixture as a temp view (idempotent, lazy — no I/O). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
