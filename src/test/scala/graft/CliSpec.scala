package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.nio.file.Files

/** `graft-sql` CLI driver loop (GraftSql.scala; reference
  * cli/CliDriver.java:76): statement splitting, command-processor lines
  * interleaved with queries, script execution, per-statement error
  * recovery.
  */
class CliSpec extends SparkSpec {

  private def runCli(text: String, silent: Boolean = true): (Int, String) = {
    val bos = new ByteArrayOutputStream()
    val out = new PrintStream(bos, true, "UTF-8")
    val code = GraftSql.run(spark, new BufferedReader(new StringReader(text)),
      out, interactive = false, silent = silent)
    (code, bos.toString("UTF-8"))
  }

  test("statement splitter respects literals and comments") {
    val (stmts, rest) = GraftSql.splitStatements(
      "SELECT ';' AS a; -- trailing; comment\nSELECT \"x;y\" AS b; SELECT 1")
    // the comment stays attached to the statement that follows it (Spark
    // SQL tolerates embedded -- comments); the `;` inside it doesn't split
    assert(stmts.size == 2 && stmts.head == "SELECT ';' AS a", stmts)
    assert(stmts(1).endsWith("SELECT \"x;y\" AS b"), stmts)
    assert(rest.trim == "SELECT 1")
    // comment-only fragments are no-ops, escapes don't end the literal
    val (s2, r2) = GraftSql.splitStatements("-- just a comment;\n;SELECT '\\';' AS c;")
    assert(s2 == Seq("SELECT '\\';' AS c") && r2.isEmpty)
    // `;` and `--` inside backtick-quoted identifiers don't split or
    // comment (mirrors HiveQl.maskLiterals backtick handling)
    val (s3, r3) = GraftSql.splitStatements(
      "SELECT 1 AS `a;b`; SELECT 2 AS `c--d`; SELECT 3")
    assert(s3 == Seq("SELECT 1 AS `a;b`", "SELECT 2 AS `c--d`"), s3)
    assert(r3.trim == "SELECT 3")
  }

  test("SOURCE propagates a failing script's exit code; outer loop continues") {
    val f = Files.createTempFile("graft_cli_fail", ".q")
    Files.writeString(f,
      "SELECT * FROM no_such_table_in_sourced_script;\nSELECT 'recovered' AS v;\n")
    val (code, outText) = runCli(
      s"source ${f.toString};\nSELECT 'after-source' AS v;")
    assert(code == 1, s"sourced failure must surface in the exit code: $outText")
    assert(outText.contains("FAILED"), outText)
    assert(outText.contains("recovered"), outText)   // per-statement recovery inside
    assert(outText.contains("after-source"), outText) // outer loop continues
  }

  test("3-statement script: SET line, query, table query — end to end") {
    Tables.registerAll(spark, sfDir)
    val (code, outText) = runCli(
      """SET spark.sql.cli.probe=42;
        |SELECT 1 + 1 AS two;
        |SELECT count(*) AS n FROM documents""".stripMargin)
    assert(code == 0, outText)
    val lines = outText.linesIterator.toSeq
    assert(lines.exists(_.contains("spark.sql.cli.probe")), outText) // SET echoes k/v
    assert(lines.contains("2"), outText)
    val docCount = Tables.load(spark, sfDir, "documents").count().toString
    assert(lines.contains(docCount), outText)
  }

  test("SOURCE runs a script file; quit stops the loop") {
    val f = Files.createTempFile("graft_cli", ".q")
    Files.writeString(f, "SELECT 'from-script' AS v;\n")
    val (code, outText) = runCli(
      s"source ${f.toString};\nquit;\nSELECT 'never-runs' AS v;")
    assert(code == 0, outText)
    assert(outText.contains("from-script"), outText)
    assert(!outText.contains("never-runs"), outText)
  }

  test("quit inside a SOURCEd script ends the OUTER session (ADVICE r8)") {
    val f = Files.createTempFile("graft_cli_quit", ".q")
    Files.writeString(f, "SELECT 'pre-quit' AS v;\nquit;\nSELECT 'post-quit' AS v;\n")
    val (code, outText) = runCli(
      s"source ${f.toString};\nSELECT 'outer-never-runs' AS v;")
    assert(code == 0, outText)
    assert(outText.contains("pre-quit"), outText)
    assert(!outText.contains("post-quit"), outText)        // script stops at quit
    assert(!outText.contains("outer-never-runs"), outText) // and so does the session
  }

  test("variable substitution: hiveconf/hivevar/env prefixes, iteration, literal fallback") {
    // SET feeds ${hiveconf:...}; SET hivevar: feeds ${hivevar:...} and bare
    // ${...} (VariableSubstitution.java + SetProcessor.java prefixes)
    val (code, outText) = runCli(
      """SET probe.city=berlin;
        |SET hivevar:suffix=_x;
        |SELECT '${hiveconf:probe.city}${hivevar:suffix}' AS a,
        |       '${suffix}' AS b, '${hiveconf:never.set.key}' AS c""".stripMargin)
    assert(code == 0, outText)
    assert(outText.linesIterator.contains("berlin_x\t_x\t${hiveconf:never.set.key}"),
      outText)
    // iterative: a var whose value contains another var resolves through
    spark.conf.set("hivevar:outer", "${hivevar:inner}!")
    spark.conf.set("hivevar:inner", "deep")
    assert(HiveQl.substituteVars(spark, "${outer}") == "deep!")
    // cycle → loud depth error (MAX_SUBST=40, reference behavior)
    spark.conf.set("hivevar:loop", "${hivevar:loop}")
    intercept[IllegalStateException](HiveQl.substituteVars(spark, "${loop}"))
    // gate off: text passes through untouched
    spark.conf.set("hive.variable.substitute", "false")
    try assert(HiveQl.substituteVars(spark, "${outer}") == "${outer}")
    finally spark.conf.unset("hive.variable.substitute")
    assert(HiveQl.substituteVars(spark, "${env:PATH}") == sys.env("PATH"))
  }

  test("dfs commands run through FsShell; bad ones fail per-statement (r10)") {
    val dir = Files.createTempDirectory("graft_dfs")
    Files.writeString(dir.resolve("probe_file.txt"), "x")
    val (code, outText) = runCli(s"dfs -ls ${dir.toString};")
    assert(code == 0, outText)
    assert(outText.contains("probe_file.txt"),
      s"dfs -ls must list through FsShell:\n$outText")
    // a failing dfs command is a statement failure, not a session death
    val (code2, out2) = runCli(
      s"dfs -ls /definitely/not/a/path_${System.nanoTime()};\nSELECT 'alive' AS v;")
    assert(code2 == 1 && out2.contains("FAILED") && out2.contains("alive"), out2)
  }

  test("!shell escape execs like CliDriver.processCmd; CLI-only (r10)") {
    // output streams to the console; exit 0 statements succeed
    val (code, outText) = runCli("!echo shell_escape_ok;")
    assert(code == 0, outText)
    assert(outText.contains("shell_escape_ok"), outText)
    // nonzero exit = statement failure, session continues (per-statement
    // recovery like any failing query)
    val (code2, out2) = runCli("!false;\nSELECT 'alive' AS v;")
    assert(code2 == 1 && out2.contains("FAILED") && out2.contains("alive"), out2)
    // the reference's layering: `!` is a CliDriver processor, Driver never
    // sees it — the library entry point must NOT exec (a `!` statement is
    // a plain parse error there)
    intercept[Exception](HiveQl.sql(spark, "!echo not_from_library"))
  }

  test("ADD JAR ships a jar to the session; LIST JARS reports it (r10)") {
    // a minimal but REAL jar (manifest-only) — ADD JAR validates existence
    val jar = Files.createTempDirectory("graft_jar").resolve("probe.jar")
    val jos = new java.util.jar.JarOutputStream(
      Files.newOutputStream(jar), new java.util.jar.Manifest())
    jos.close()
    val (code, outText) = runCli(s"ADD JAR ${jar.toString};\nLIST JARS;")
    assert(code == 0, outText)
    assert(outText.contains("probe.jar"),
      s"LIST JARS must report the added jar:\n$outText")
    assert(spark.sparkContext.listJars().exists(_.contains("probe.jar")),
      "the jar must be registered for executor shipping")
  }

  test("a failing statement reports and the loop continues (CliDriver behavior)") {
    val (code, outText) = runCli(
      "SELECT * FROM table_that_does_not_exist_xyz;\nSELECT 'still-alive' AS v;")
    assert(code == 1, outText)
    assert(outText.contains("FAILED"), outText)
    assert(outText.contains("still-alive"), outText)
  }

  test("demo/corpus_build.q: the reference-user workflow end to end") {
    Tables.registerAll(spark, sfDir)
    val expDir = Files.createTempDirectory("graft_demo").toString + "/exp"
    spark.conf.set("hivevar:min_tokens", "10")
    spark.conf.set("hivevar:exp_dir", expDir)
    spark.sql("DROP TABLE IF EXISTS demo_keep")
    spark.sql("DROP TABLE IF EXISTS demo_drop")
    try {
      val (code, outText) = runCli("source demo/corpus_build.q;")
      assert(code == 0, outText)
      val kept = spark.table("demo_keep").count()
      val dropped = spark.table("demo_drop").count()
      val total = Tables.load(spark, sfDir, "documents").count()
      assert(kept > 0 && kept + dropped == total,
        s"multi-insert must partition the corpus: $kept + $dropped != $total")
      assert(outText.contains(s"kept\t$kept"), outText)
      // the EXPORT landed with the EximUtil layout, substituted path
      assert(new java.io.File(expDir, "_metadata").exists(), s"no export at $expDir")
      assert(spark.read.parquet(s"$expDir/data").count() == kept)
    } finally {
      spark.sql("DROP TABLE IF EXISTS demo_keep")
      spark.sql("DROP TABLE IF EXISTS demo_drop")
      spark.conf.unset("hivevar:min_tokens")
      spark.conf.unset("hivevar:exp_dir")
    }
  }

  test("multi-line statements accumulate; NULL prints as NULL; Hive dialect reaches the loop") {
    val (code, outText) = runCli(
      "SELECT /*+ MAPJOIN(x) */ NULL AS a,\n'b' AS b\nFROM (SELECT 1) x")
    assert(code == 0, outText)
    assert(outText.linesIterator.contains("NULL\tb"), outText)
  }
}
