package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Physical schema of the events fixture as parquet declares it — the
    * dispatch key for [[normalizeEventsTs]], and the explicit schema the
    * streaming reader needs (readStream cannot infer).
    *
    * The guarded nanosAsLong flip makes the footer *readable* when the
    * fixture is TIMESTAMP(NANOS) (Spark otherwise throws
    * PARQUET_TYPE_ILLEGAL); it does not decide the branch — the returned
    * schema does. Sessions.builder already sets it at creation; this covers
    * foreign sessions (e.g. the driver's own) and never flips an explicit
    * 'false'.
    */
  def eventsRawSchema(spark: SparkSession, sfDir: String): StructType = {
    ensureNanosReadable(spark)
    spark.read.parquet(s"$sfDir/events.parquet").schema
  }

  private def ensureNanosReadable(spark: SparkSession): Unit =
    if (!spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false").toBoolean)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Normalize `ts` to TimestampType regardless of how the fixture encodes
    * it. The reference never assumes one encoding either — its MapOperator
    * resolves the SerDe per input partition from metastore metadata at run
    * time (ref: ql/src/java/org/apache/hadoop/hive/ql/exec/MapOperator
    * .java:62); dispatching on the actual parquet type is the Spark-native
    * equivalent. Branches:
    *   - LongType:      TIMESTAMP(NANOS) surfaced raw via nanosAsLong —
    *                    integer-divide to micros (a double round-trip would
    *                    lose precision at ~1.7e18 ns).
    *   - TimestampNTZ:  TIMESTAMP(MICROS, isAdjustedToUTC=false) — cast to
    *                    TimestampType. Sessions pin the session timezone to
    *                    UTC, so the cast is value-identical and downstream
    *                    code (windows, interval joins, hive_hash) sees the
    *                    exact type every oracle was matched against.
    *   - TimestampType: use as-is.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts fixture drifted to unsupported type $other — extend Tables.normalizeEventsTs")
    }

  /** JVM-wide inferred-schema cache. Schema inference reads parquet
    * footers and is cached per SESSION by Spark — with the per-query
    * session isolation (SparkEntry.isolated) every query would otherwise
    * re-read every table's footers (~80-100 ms/table measured at sf0.1,
    * §6.13b round 12). The fixture schemas are immutable within a run, so
    * one inference serves every session; passing the schema explicitly
    * skips inference entirely.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") ensureNanosReadable(spark)
    val schema = schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Register every fixture as a temp view (idempotent, lazy — no I/O). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
