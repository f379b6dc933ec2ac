package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Hive-default TEXTFILE compatibility (ref serde2/lazy/LazySimpleSerDe.java:62:
  * field delim \u0001, collection delim \u0002, map-key delim \u0003, null
  * sequence \N) on top of the Spark CSV reader — the fixture-parity reader
  * SURVEY.md §2.2 calls for. Nested types are encoded/decoded with the same
  * delimiters via the helpers below (one nesting level, as LazySimpleSerDe
  * does by default).
  */
object HiveText {
  val FieldDelim = "\u0001"
  val CollectionDelim = "\u0002"
  val MapKeyDelim = "\u0003"
  val NullSequence = "\\N"

  // LazySimpleSerDe neither quotes nor escapes: a '"' or '\' in a field is a
  // literal byte. Spark CSV defaults (quote='"', escape='\') would quote on
  // write and strip on read — interchange with the reference engine's files
  // would misparse any field containing those bytes. U+0000 disables both (univocity: NUL = no such char).
  val NoQuote = "\u0000"

  def write(df: DataFrame, path: String): Unit =
    df.write
      .option("sep", FieldDelim)
      .option("nullValue", NullSequence)
      .option("emptyValue", "")
      .option("quote", NoQuote)
      .option("escape", NoQuote)
      .mode("overwrite")
      .csv(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("sep", FieldDelim)
      .option("nullValue", NullSequence)
      .option("emptyValue", "")
      .option("quote", NoQuote)
      .option("escape", NoQuote)
      .schema(schema)
      .csv(path)

  /** array<string> column → \u0002-joined text (write side). */
  def encodeArray(c: Column): Column = array_join(c, CollectionDelim)

  /** \u0002-joined text → array<string> (read side). */
  def decodeArray(c: Column): Column = split(c, CollectionDelim)

  /** map<string,string> → k\u0003v pairs joined by \u0002. */
  def encodeMap(c: Column): Column =
    array_join(transform(map_entries(c),
      e => concat(e.getField("key"), lit(MapKeyDelim), e.getField("value"))),
      CollectionDelim)

  /** Inverse of [[encodeMap]]. */
  def decodeMap(c: Column): Column =
    map_from_entries(transform(split(c, CollectionDelim), kv =>
      struct(
        split(kv, MapKeyDelim).getItem(0).as("key"),
        split(kv, MapKeyDelim).getItem(1).as("value"))))
}
