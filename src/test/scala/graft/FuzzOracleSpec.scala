package graft

/** Oracle-differential fuzzing (VERDICT r16 #3): run the pinned-seed
  * FuzzOracle battery — 200 Hive-dialect statements through `HiveQl.sql`
  * vs hand-translated ANSI in DuckDB — and gate on tools/check.py, the
  * same comparator the driver uses. Unlike FuzzParitySpec (engine vs
  * engine), this leg can catch a Hive-semantics divergence the rewrite
  * pipeline and raw Spark SHARE; its first run caught exactly one:
  * TIMESTAMP_NTZ refusing every integer narrowing cast (q929 regression).
  *
  * Skipped (not failed) when python3+duckdb are unavailable — the oracle
  * is a driver-side tool by contract.
  */
class FuzzOracleSpec extends SparkSpec {

  private def duckdbAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb").start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  test("pinned-seed oracle-differential battery: 200/200 match DuckDB") {
    assume(duckdbAvailable, "python3+duckdb not available in this environment")
    val out = java.nio.file.Files.createTempDirectory("fuzzoracle").toString
    val failed = FuzzOracle.run(spark, SparkTestSession.sf0001, out,
      seed = 20260817L, nPerFamily = 20)
    assert(failed.isEmpty, s"engine-side failures: ${failed.mkString(",")}")
    val pb = new ProcessBuilder("python3", "tools/check.py",
      SparkTestSession.sf0001, out)
    pb.directory(new java.io.File("."))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    assert(code == 0, "oracle mismatches:\n" +
      log.linesIterator.filterNot(_.startsWith("PASS")).mkString("\n"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }
}
