package graft

import org.apache.spark.sql.functions._

final case class Li(l_orderkey: Long, l_returnflag: String, l_quantity: Double)

/** Typed Dataset[T] surface (SURVEY.md §1.3: case-class Encoders where type
  * safety helps) — the typed pipeline must agree with the untyped DataFrame
  * plan on the same data.
  */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("typed filter/groupByKey/mapGroups agrees with the DataFrame plan") {
    val ds = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .as[Li]

    val typed = ds.filter(_.l_quantity > 40)
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var n = 0L; var sum = 0.0
        rows.foreach { r => n += 1; sum += r.l_quantity }
        (flag, n, math.round(sum))
      }
      .collect().sortBy(_._1).toSeq

    val untyped = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 40)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)), round(sum(col("l_quantity")), 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

    assert(typed == untyped)
  }

  test("as[T] is lazy and keeps column pruning") {
    val ds = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      .as[Li]
    val p = ds.filter(_.l_quantity > 40).queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"),
      s"typed pipeline should not widen the scan:\n$p")
  }
}
