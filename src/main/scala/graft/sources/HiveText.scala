package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Hive-default TEXTFILE compatibility (ref serde2/lazy/LazySimpleSerDe.java:62:
  * field delim \u0001, collection delim \u0002, map-key delim \u0003, null
  * sequence \N) on top of the Spark CSV reader — the fixture-parity reader
  * SURVEY.md §2.2 calls for. Nested types are encoded/decoded with the
  * reference's full 8-level separator scheme via [[encodeNested]]/
  * [[decodeNested]]; the one-level encodeArray/encodeMap helpers remain as
  * the common-case shorthand.
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

  // ---- Arbitrary-depth nested encoding -------------------------------------
  //
  // LazySimpleSerDe.java:211-223 keeps 8 separator levels: [0]=U+0001 fields,
  // [1]=U+0002, [2]=U+0003, [i]=(i+1) for i>=3 (bytes 4..8).
  // Its serializer walks types recursively: a LIST at level d joins items
  // with sep(d) and recurses at d+1; a MAP joins entries with sep(d),
  // key/value with sep(d+1), recursing at d+2; a STRUCT joins fields with
  // sep(d) at d+1. Nulls write the \N sequence at every level. The helpers
  // below reproduce exactly that walk over Spark complex types, so e.g.
  // array<map<string,int>> round-trips byte-for-byte with the reference.
  //
  // Known format ambiguity (shared with the reference): an empty collection
  // and a collection holding one empty string serialize identically.

  import org.apache.spark.sql.types._

  def sep(level: Int): String = level match {
    case 0 => FieldDelim
    case 1 => CollectionDelim
    case 2 => MapKeyDelim
    case i => (i + 1).toChar.toString
  }

  private def nullable(enc: Column): Column =
    coalesce(enc, lit(NullSequence))

  /** Column of type `dt` → its Hive text encoding (top-level columns sit at
    * nesting level 1; level 0 is the row's field separator used by write()).
    */
  def encodeNested(c: Column, dt: DataType, level: Int = 1): Column = dt match {
    case ArrayType(et, _) =>
      array_join(transform(c, x => nullable(encodeNested(x, et, level + 1))),
        sep(level))
    case MapType(kt, vt, _) =>
      array_join(transform(map_entries(c), e =>
        concat(nullable(encodeNested(e.getField("key"), kt, level + 2)),
          lit(sep(level + 1)),
          nullable(encodeNested(e.getField("value"), vt, level + 2)))),
        sep(level))
    case st: StructType =>
      concat_ws(sep(level), st.fields.map(f =>
        nullable(encodeNested(c.getField(f.name), f.dataType, level + 1))): _*)
    case _ => c.cast(StringType)
  }

  /** Inverse of [[encodeNested]]: text column → `dt`. */
  def decodeNested(c: Column, dt: DataType, level: Int = 1): Column = {
    val decoded = dt match {
      case ArrayType(et, _) =>
        transform(split(c, sep(level)), x => decodeNested(x, et, level + 1))
      case MapType(kt, vt, _) =>
        map_from_entries(transform(split(c, sep(level)), kv => struct(
          decodeNested(split(kv, sep(level + 1)).getItem(0), kt, level + 2)
            .as("key"),
          decodeNested(split(kv, sep(level + 1)).getItem(1), vt, level + 2)
            .as("value"))))
      case st: StructType =>
        struct(st.fields.zipWithIndex.map { case (f, i) =>
          decodeNested(split(c, sep(level)).getItem(i), f.dataType, level + 1)
            .as(f.name)
        }: _*)
      case _ => c.cast(dt)
    }
    when(c.isNull || c === NullSequence, lit(null).cast(dt)).otherwise(decoded)
  }
}
