package graft

/** Round-17 ADVICE regressions: (1) DROP DATABASE's grant purge is scoped
  * to DATABASE-typed rows plus the dropped db's own tables — a table-level
  * grant on a same-named table in ANOTHER database survives, while grants
  * on tables that lived inside the dropped database are cascaded (the
  * ObjectStore.dropDatabase shape); (2) GenScale offsets events.user_id by
  * the CUSTOMER stride (its FK parent), so scaled copies' events attach to
  * their own copy's customers and join fan-out is exactly source-invariant.
  */
class AdviceFixesR17Spec extends SparkSpec {

  private def fresh() = Sessions.isolatedClone(spark)

  test("DROP DATABASE purges DB-typed + contained-table grants, not a same-named table's") {
    val s = fresh()
    Authz.reset(s)
    try s.sql("DROP DATABASE IF EXISTS adv17_shared CASCADE") catch { case _: Exception => }
    try s.sql("DROP DATABASE IF EXISTS adv17_db CASCADE") catch { case _: Exception => }
    s.sql("DROP TABLE IF EXISTS adv17_shared")
    s.sql("DROP TABLE IF EXISTS adv17_t2")

    // a table named like the database, in the DEFAULT database
    s.sql("CREATE TABLE adv17_shared (key INT)")
    s.sql("CREATE DATABASE adv17_shared")
    s.sql("CREATE DATABASE adv17_db")
    s.sql("CREATE TABLE adv17_db.t_in (key INT)")
    // a table in the default db sharing a bare name with one inside adv17_db
    s.sql("CREATE TABLE adv17_t2 (key INT)")
    s.sql("CREATE TABLE adv17_db.adv17_t2 (key INT)")

    Authz.grant(s, Seq("select"), "USER", "u17", "TABLE", "adv17_shared", withGrant = false)
    Authz.grant(s, Seq("select"), "USER", "u17", "DATABASE", "adv17_shared", withGrant = false)
    Authz.grant(s, Seq("select"), "USER", "u17", "TABLE", "adv17_db.t_in", withGrant = false)
    Authz.grant(s, Seq("select"), "USER", "u17", "TABLE", "adv17_t2", withGrant = false)

    HiveQl.sql(s, "DROP DATABASE adv17_db CASCADE")
    HiveQl.sql(s, "DROP DATABASE adv17_shared")

    // survivors: the same-named TABLE grant, and the bare-named grant whose
    // table still resolves in the current database
    assert(Authz.showGrant(s, "USER", "u17", Some("TABLE" -> "adv17_shared")).nonEmpty,
      "table-level grant on a same-named table in another db was wiped")
    assert(Authz.showGrant(s, "USER", "u17", Some("TABLE" -> "adv17_t2")).nonEmpty,
      "bare-named grant purged although a same-named table still resolves")
    // cascaded: the DB grant and the qualified grant on the contained table
    assert(Authz.showGrant(s, "USER", "u17", Some("DATABASE" -> "adv17_shared")).isEmpty,
      "DATABASE-typed grant survived the drop")
    assert(Authz.showGrant(s, "USER", "u17", Some("TABLE" -> "adv17_db.t_in")).isEmpty,
      "qualified grant on a contained table survived the drop")
    // the re-grant path (the 'already granted' failure mode) now succeeds
    s.sql("CREATE DATABASE adv17_db")
    s.sql("CREATE TABLE adv17_db.t_in (key INT)")
    Authz.grant(s, Seq("select"), "USER", "u17", "TABLE", "adv17_db.t_in", withGrant = false)

    Authz.reset(s)
    s.sql("DROP DATABASE IF EXISTS adv17_db CASCADE")
    s.sql("DROP TABLE IF EXISTS adv17_shared")
    s.sql("DROP TABLE IF EXISTS adv17_t2")
  }

  test("GenScale: events.user_id offsets by the customer stride; joins are copy-local") {
    val src = SparkTestSession.sf0001
    val dst = java.nio.file.Files.createTempDirectory("adv17_genscale").toString
    GenScale.run(spark, src, dst, 2)

    val cust0 = spark.read.parquet(s"$src/customer.parquet")
    val ev0 = spark.read.parquet(s"$src/events.parquet")
    val custK = spark.read.parquet(s"$dst/customer.parquet")
    val evK = spark.read.parquet(s"$dst/events.parquet")

    val base = ev0.join(cust0, ev0("user_id") === cust0("c_custkey")).count()
    val scaledJoin = evK.join(custK, evK("user_id") === custK("c_custkey")).count()
    // FK invariance: every copy's events land on that copy's customers, so
    // the join count scales EXACTLY ×k — the pre-fix own-stride offset
    // stranded copy-1 events between copy-0 and copy-1 key ranges
    assert(scaledJoin == 2 * base,
      s"events⋈customer not source-invariant: base=$base scaled=$scaledJoin")
    // and each matched pair is copy-local: same copy index on both sides
    val custS = cust0.agg(org.apache.spark.sql.functions.max("c_custkey"))
      .head.getLong(0) + 1L
    val crossCopy = evK.join(custK, evK("user_id") === custK("c_custkey"))
      .where(!(evK("user_id") / custS).cast("long")
        .equalTo((custK("c_custkey") / custS).cast("long")))
      .count()
    assert(crossCopy == 0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
  }
}
