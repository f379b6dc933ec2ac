package graft

/** [[plans.HiveOuterJoinFilters]]: Hive 0.8's
  * `hive.outerjoin.supports.filters=false` pushes single-side ON conjuncts
  * into the outer join's INPUTS (auto_join_filters.q second half). Default
  * `true` keeps ANSI null-extension semantics.
  */
class OuterJoinFiltersSpec extends SparkSpec {

  /** Run `f` on an isolated newSession with the conf set — a session-wide
    * flip on the shared test session would poison concurrently-running
    * suites' outer joins (the same reason q390 isolates its second leg).
    */
  private def withConf[T](k: String, v: String)(
      f: org.apache.spark.sql.SparkSession => T): T = {
    val s2 = spark.newSession()
    s2.conf.set(k, v)
    mk(s2)
    f(s2)
  }

  private def mk(s: org.apache.spark.sql.SparkSession = spark): Unit = {
    import s.implicits._
    Seq((Some(12), Some(35)), (None, Some(40)), (Some(48), None),
      (Some(100), Some(100)))
      .toDF("key", "value").createOrReplaceTempView("ojf_in3")
  }

  test("default true keeps ANSI semantics: preserved side null-extends") {
    mk()
    val rows = spark.sql(
      """SELECT * FROM ojf_in3 a LEFT OUTER JOIN ojf_in3 b
         ON a.key = b.key AND a.key > 40 AND b.key > 40""").collect()
    assert(rows.length == 4) // every a row preserved
    // (48,NULL) and (100,100) match on key; (12,35) and (NULL,40) null-extend
    assert(rows.count(_.isNullAt(2)) == 2)
  }

  test("false pre-filters both inputs before the outer join") {
    withConf("hive.outerjoin.supports.filters", "false") { s2 =>
      val df = s2.sql(
        """SELECT * FROM ojf_in3 a LEFT OUTER JOIN ojf_in3 b
           ON a.key = b.key AND a.key > 40 AND b.key > 40""")
      val rows = df.collect()
      // both inputs pre-filtered to (48,NULL),(100,100); the equi matches
      // both surviving keys, so nothing null-extends — where ANSI above
      // kept 4 rows, the legacy semantics keep 2
      assert(rows.length == 2)
      assert(rows.count(_.isNullAt(2)) == 0)
    }
  }

  test("false with only-filter ON degenerates to filtered ON-TRUE join") {
    withConf("hive.outerjoin.supports.filters", "false") { s2 =>
      val rows = s2.sql(
        """SELECT * FROM ojf_in3 a FULL OUTER JOIN ojf_in3 b
           ON a.key > 40 AND a.value > 50 AND a.key = a.value
              AND b.key > 40 AND b.value > 50 AND b.key = b.value""").collect()
      assert(rows.length == 1) // 1x1 cross of the single surviving row
      assert(rows.head.getInt(0) == 100 && rows.head.getInt(2) == 100)
    }
  }

  test("cross-side non-equi conjuncts stay in the join condition") {
    withConf("hive.outerjoin.supports.filters", "false") { s2 =>
      val rows = s2.sql(
        """SELECT * FROM ojf_in3 a LEFT OUTER JOIN ojf_in3 b
           ON a.key < b.value AND a.key > 40""").collect()
      // a filtered to (48,NULL),(100,100); cross-side a.key < b.value kept:
      // 48 < 100 only -> one match; (100,100) null-extends
      assert(rows.length == 2)
    }
  }
}
