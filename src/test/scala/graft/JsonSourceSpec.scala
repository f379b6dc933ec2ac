package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** JSON source/sink round trip (SURVEY.md §2.2: DelimitedJSONSerDe →
  * spark.read.json), including schema inference.
  */
class JsonSourceSpec extends SparkSpec {

  test("json lines round trip with schema inference") {
    val dir = Files.createTempDirectory("graft-json").toString
    val df = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") <= 300)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        struct(col("o_orderpriority").as("prio")).as("meta"))
    df.write.mode("overwrite").json(dir)

    val back = spark.read.json(dir)
    assert(back.count() == df.count())
    // inference finds the nested struct and numeric types
    assert(back.schema("meta").dataType.typeName == "struct")
    val got = back.select(col("o_orderkey"), col("o_totalprice"), col("meta.prio"))
      .orderBy(col("o_orderkey")).collect()
    val exp = df.select(col("o_orderkey"), col("o_totalprice"), col("meta.prio"))
      .orderBy(col("o_orderkey")).collect()
    assert(got.toSeq == exp.toSeq)
  }
}
