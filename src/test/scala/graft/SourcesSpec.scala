package graft

import java.nio.file.Files
import graft.sources.HiveText
import org.apache.spark.sql.functions._

/** Hive-delimited TEXTFILE round trip (ref LazySimpleSerDe defaults) and the
  * HiveQl dialect rewrites (MAPJOIN → BROADCAST, STREAMTABLE dropped).
  */
class SourcesSpec extends SparkSpec {

  test("hive \\u0001 text round trip incl array/map encoding and \\N nulls") {
    val dir = Files.createTempDirectory("graft-hivetext").toString
    val df = Tables.load(spark, sfDir, "part")
      .filter(col("p_partkey") <= 200)
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        when(col("p_size") % 5 === 0, lit(null)).otherwise(col("p_brand")).as("maybe_brand"),
        HiveText.encodeArray(split(col("p_type"), " ")).as("type_words"),
        HiveText.encodeMap(map(lit("b"), col("p_brand"), lit("t"), col("p_type"))).as("attrs"))
    HiveText.write(df, dir)

    val back = HiveText.read(spark, dir, df.schema)
      .withColumn("type_arr", HiveText.decodeArray(col("type_words")))
      .withColumn("attr_map", HiveText.decodeMap(col("attrs")))

    val orig = df.orderBy("p_partkey").collect()
    val got = back.orderBy("p_partkey").collect()
    assert(got.length == orig.length)
    got.zip(orig).foreach { case (g, o) =>
      assert(g.getLong(0) == o.getLong(0))
      assert(g.getString(1) == o.getString(1))
      assert(g.getAs[Any]("maybe_brand") == o.getAs[Any]("maybe_brand"))
    }
    // decoded nested values reconstruct the original columns
    val probe = back.filter(col("p_partkey") === got.head.getLong(0))
      .select(col("type_arr"), col("attr_map.b"), col("attr_map.t")).head()
    val origRow = Tables.load(spark, sfDir, "part")
      .filter(col("p_partkey") === got.head.getLong(0))
      .select(col("p_type"), col("p_brand")).head()
    assert(probe.getSeq[String](0) == origRow.getString(0).split(" ").toSeq)
    assert(probe.getString(1) == origRow.getString(1))
    assert(probe.getString(2) == origRow.getString(0))
  }

  test("HiveQl rewrites MAPJOIN to a broadcast plan and drops STREAMTABLE") {
    Tables.registerAll(spark, sfDir)
    val df = HiveQl.sql(spark,
      """SELECT /*+ MAPJOIN(nation) */ /*+ STREAMTABLE(customer) */ n_name, count(*) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""")
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
