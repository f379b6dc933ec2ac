package graft

/** The registry-boundary conf isolation (SparkEntry.isolated): a QueryDef
  * that SETs semantic Hive confs must poison neither the caller's session
  * nor a neighboring registry query, regardless of execution order — the
  * exact r11 failure where join_1to1's shared-session
  * `SET hive.outerjoin.supports.filters=false` flipped join_filters' FULL
  * OUTER semantics whenever HashMap order ran it afterwards.
  */
class SessionIsolationSpec extends SparkSpec {

  test("a QueryDef's SET never escapes to the caller's session") {
    val before = spark.conf.getOption("hive.auto.convert.join")
    // q390 SETs hive.auto.convert.join=true on the session it receives
    SparkEntry.queries("q390_qf_auto_join_filters")(spark, sfDir).collect()
    assert(spark.conf.getOption("hive.auto.convert.join") == before,
      "the registry wrapper must confine q390's SET to its own session")
  }

  test("poisoned conf cannot flip a neighbor: q224 then q178 (r11 regression)") {
    // q224 runs a supports.filters=false leg; q178's join_filters battery
    // must still see ANSI outer-join semantics (26 rows, its DuckDB oracle
    // count over the constant-size in3/in4 fixtures) when run AFTER it on
    // the same outer session
    SparkEntry.queries("q224_qf_join_1to1")(spark, sfDir).collect()
    val n = SparkEntry.queries("q178_qf_join_filters")(spark, sfDir).count()
    assert(n == 26,
      s"q178 must return its ANSI 26 rows after q224, got $n (conf leak?)")
  }

  test("isolated sessions still share the catalog (persistent dest tables)") {
    // fixtures/dest tables created inside a query's isolated session must
    // land in the shared catalog — that is what makes isolation safe for
    // the battery's CREATE/LOAD/INSERT statements
    SparkEntry.queries("q139_qf_groupby1")(spark, sfDir).collect()
    val sfx = (sfDir.hashCode & Int.MaxValue).toString
    assert(spark.catalog.tableExists(s"dest_g1_$sfx"),
      "q139's dest table must be visible on the outer session")
  }
}
