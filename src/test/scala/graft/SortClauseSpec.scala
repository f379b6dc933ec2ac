package graft

import org.apache.spark.sql.Row

/** Asserts the DISTRIBUTE BY + SORT BY invariants of q28_cluster_by (which
  * the DuckDB oracle cannot check: partition-local order is not globally
  * observable — see Relational.scala):
  *
  *  1. co-location: every l_orderkey lands in exactly one partition, and
  *  2. per-partition monotonic (l_orderkey, l_linenumber) ordering.
  */
class SortClauseSpec extends SparkSpec {

  test("q28_cluster_by: keys co-located and partitions internally sorted") {
    val df = SparkEntry.queries("q28_cluster_by")(spark, sfDir)
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
    // and nothing got lost relative to the source table
    val expected = Tables.load(spark, sfDir, "lineitem").count()
    assert(perPartition.map(_._2.size).sum.toLong <= expected)
    assert(df.count() == expected)
  }
}
