package graft

import org.apache.spark.sql.Row

/** Asserts the DISTRIBUTE BY + SORT BY invariants behind q28_cluster_by.
  * The query itself now emits its CONTRACT verdicts (co_located /
  * sorted_ok per captured physical placement — Relational.scala), so this
  * spec does two jobs: (1) checks the verdict columns the oracle gates,
  * and (2) INDEPENDENTLY re-derives both invariants from the raw
  * clustered output via mapPartitionsWithIndex, so the in-query
  * placement-capture logic is itself cross-checked.
  */
class SortClauseSpec extends SparkSpec {

  test("q28_cluster_by: verdict columns are all true and counts complete") {
    val rows = SparkEntry.queries("q28_cluster_by")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "co_located must hold for every key")
    assert(rows.forall(_.getBoolean(3)), "sorted_ok must hold globally")
    val expected = Tables.load(spark, sfDir, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == expected, "per-key counts must cover the table")
  }

  test("clustered placement independently verified (keys co-located, partitions sorted)") {
    val df = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .repartition(org.apache.spark.sql.functions.col("l_orderkey"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")
    val perPartition: Array[(Int, Set[Long], Boolean)] =
      df.rdd.mapPartitionsWithIndex { (pid, rows) =>
        val rs = rows.toVector
        val keys = rs.map(_.getLong(0)).toSet
        val sorted = rs.iterator.map { r: Row =>
          (r.getLong(0), r.getInt(1))
        }.sliding(2).forall {
          case Seq(a, b) => a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)
          case _ => true
        }
        Iterator.single((pid, keys, sorted))
      }.collect()

    assert(perPartition.nonEmpty)
    perPartition.foreach { case (pid, _, sorted) =>
      assert(sorted, s"partition $pid not sorted by (l_orderkey, l_linenumber)")
    }
    // co-location: the same orderkey must never appear in two partitions
    val counts = perPartition.flatMap(_._2).groupBy(identity).map(_._2.length)
    assert(counts.forall(_ == 1), "an l_orderkey spans multiple partitions")
    assert(df.count() == Tables.load(spark, sfDir, "lineitem").count())
  }
}
