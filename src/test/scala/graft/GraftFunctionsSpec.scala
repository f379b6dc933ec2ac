package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit coverage for the injected Catalyst expressions (field / hive_hash /
  * parse_url_tuple), checked against Hive-0.8 reference semantics computed
  * by hand (Java hashCode rules, GenericUDFField 1-based indexing).
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("field: 1-based index, 0 on miss, 0 on null needle") {
    val r = Seq(("b", "x"), ("z", "y"), (null, "w"))
      .toDF("needle", "pad")
      .selectExpr("field(needle, 'a', 'b', 'c') as f")
      .collect().map(_.getInt(0)).toSeq
    assert(r == Seq(2, 0, 0))
  }

  test("hive_hash matches Java hash semantics (≠ murmur3 hash())") {
    val row = spark.range(1).selectExpr(
      "hive_hash('abc') as hs",
      "hive_hash(5) as hi",
      "hive_hash(5L) as hl",
      "hive_hash(cast(1.5 as double)) as hd",
      "hive_hash(true) as hb",
      "hive_hash('a', 2) as hmulti",
      "hive_hash(cast(null as string)) as hnull").head()
    assert(row.getInt(0) == "abc".hashCode)
    assert(row.getInt(1) == 5)
    assert(row.getInt(2) == (5L ^ (5L >>> 32)).toInt)
    val dbits = java.lang.Double.doubleToLongBits(1.5)
    assert(row.getInt(3) == (dbits ^ (dbits >>> 32)).toInt)
    assert(row.getInt(4) == 1)
    assert(row.getInt(5) == 31 * "a".hashCode + 2)
    assert(row.getInt(6) == 0)
  }

  test("hash (Hive name) overrides murmur3 and equals hive_hash") {
    // FunctionRegistry.java:417: ported HiveQL calling hash() must get the
    // Java-style hash, not Spark's murmur3 (which returns 'abc' -> murmur3
    // seed 42, never "abc".hashCode)
    val (h, hh) = spark.range(1)
      .selectExpr("hash('abc')", "hive_hash('abc')")
      .as[(Int, Int)].head()
    assert(h == "abc".hashCode && hh == h)
  }

  test("hash of timestamp follows TimestampWritable.hashCode (seconds/nanos)") {
    // serde2/io/TimestampWritable.java:337: (seconds << 32 | nanos) folded
    val micros = 1723475105123456L // 2024-08-12T...Z with sub-second part
    val seconds = Math.floorDiv(micros, 1000000L)
    val nanos = Math.floorMod(micros, 1000000L) * 1000L
    val expected = {
      val v = (seconds << 32) | nanos
      (v ^ (v >>> 32)).toInt
    }
    val got = spark.range(1)
      .selectExpr(s"hive_hash(timestamp_micros(${micros}L)) AS h")
      .as[Int].head()
    assert(got == expected)
  }

  test("create_union (SQL name) encodes tagged struct with one live field") {
    val rows = spark.range(4)
      .selectExpr("create_union(cast(id % 2 AS int), 'str' || id, id * 10) AS u")
      .selectExpr("u.tag AS tag", "u.field0 AS f0", "u.field1 AS f1")
      .collect()
    rows.foreach { r =>
      val tag = r.getByte(0)
      if (tag == 0) assert(r.getString(1) != null && r.isNullAt(2))
      else assert(r.isNullAt(1) && !r.isNullAt(2))
    }
  }

  test("split follows Hive's Java semantics: trailing empties dropped") {
    // GenericUDFSplit.java:75 is raw String.split — split('a,b,,', ',')
    // is [a, b] in the reference; Spark's builtin (limit -1) keeps the two
    // trailing empties. Interior empties stay in both.
    val r = spark.range(1).selectExpr(
      "split('a,b,,', ',') AS hive2",
      "split('a,,b', ',') AS interior",
      "split('a,b,,', ',', -1) AS spark3").head()
    assert(r.getSeq[String](0) == Seq("a", "b"))
    assert(r.getSeq[String](1) == Seq("a", "", "b"))
    assert(r.getSeq[String](2) == Seq("a", "b", "", ""))
  }

  test("reflect is callable under its Hive name (FunctionRegistry.java:407)") {
    val r = spark.range(1)
      .selectExpr("reflect('java.lang.String', 'valueOf', 42) AS s",
        "java_method('java.lang.Math', 'abs', -7) AS a")
      .head()
    assert(r.getString(0) == "42" && r.getString(1) == "7")
  }

  test("parse_url_tuple explodes url parts incl QUERY:<key>") {
    val df = Seq("http://user@example.com:8080/a/b.html?k=v&x=1#frag")
      .toDF("url")
      .selectExpr(
        "parse_url_tuple(url, 'HOST', 'PATH', 'QUERY', 'REF', 'PROTOCOL', 'QUERY:x', 'QUERY:missing') as (host, path, q, ref, proto, qx, qm)")
    val Row(host: String, path: String, q: String, ref: String,
      proto: String, qx: String, qm) = df.head()
    assert(host == "example.com")
    assert(path == "/a/b.html")
    assert(q == "k=v&x=1")
    assert(ref == "frag")
    assert(proto == "http")
    assert(qx == "1")
    assert(qm == null)
  }

  test("toDateCompat returns the Hive-0.8 string form of to_date") {
    val r = Seq("2026-08-12 13:45:00").toDF("ts")
      .select(graft.functions.HiveCompat.toDateCompat(col("ts")).as("d"))
      .head()
    assert(r.getString(0) == "2026-08-12")
  }

  test("parse_url_tuple yields nulls for malformed urls") {
    val r = Seq("ht tp://bad url").toDF("url")
      .selectExpr("parse_url_tuple(url, 'HOST', 'PATH') as (h, p)")
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
