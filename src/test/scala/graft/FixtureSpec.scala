package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-drift tripwire. Round 8 lost 14 queries and 31 tests because the
  * driver regenerated `events.ts` with a different parquet encoding and the
  * failure surfaced as 31 scattered analysis exceptions instead of one
  * diagnosis. This suite pins, per TESTDATA.md, (a) every table's
  * post-normalization column names+types and (b) an era bound on
  * `events.ts`, so an encoding or unit drift fails HERE with the drifted
  * column named — including the silent 1000×-compression mode that a schema
  * check alone cannot catch.
  */
class FixtureSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  // all three driver scales: t1 smoke = sf0.001, t2 correctness = sf0.01,
  // bench = sf0.1 — a drift hitting only one of them (e.g. a partial
  // regeneration) must still trip here
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  test("every fixture table matches the pinned post-normalization schema (all SFs)") {
    val drifted = for {
      dir <- sfDirs
      name <- Tables.names
      got = Tables.load(spark, dir, name).schema.map(f => f.name -> f.dataType)
      if got != expected(name)
    } yield s"$dir/$name: expected ${expected(name).mkString(", ")} but fixture loads as ${got.mkString(", ")}"
    assert(drifted.isEmpty,
      s"\nFIXTURE DRIFT — update Tables.normalizeEventsTs / this pin:\n${drifted.mkString("\n")}")
  }

  test("events.ts era sanity — a unit error cannot survive this bound (all SFs)") {
    // TESTDATA.md fixture: 30 days of events starting 2024-01-01 (seed=42).
    // A nanos/micros/millis confusion moves min(ts) out of this window by
    // orders of magnitude (the r8 failure landed in 1970-01-19).
    val eraLo = java.time.Instant.parse("2023-01-01T00:00:00Z")
    val eraHi = java.time.Instant.parse("2027-01-01T00:00:00Z")
    sfDirs.foreach { dir =>
      val r = Tables.load(spark, dir, "events")
        .agg(min("ts").as("lo"), max("ts").as("hi")).head()
      val lo = r.getTimestamp(0).toInstant
      val hi = r.getTimestamp(1).toInstant
      assert(!lo.isBefore(eraLo) && !hi.isAfter(eraHi),
        s"$dir: events.ts outside documented era: min=$lo max=$hi — check the fixture encoding branch in Tables.normalizeEventsTs")
      // And the streaming path must agree byte-for-byte with the batch path:
      // the r8 silent corruption was a batch/stream divergence, not a bad file.
      val streamType = graft.streaming.Streaming
        .eventsStream(spark, dir).schema("ts").dataType
      assert(streamType == TimestampType,
        s"$dir: streaming events.ts resolves to $streamType, batch resolves to TimestampType")
    }
  }
}
