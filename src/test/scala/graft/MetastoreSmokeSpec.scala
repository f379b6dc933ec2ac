package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forks [[MetastoreSmoke]] into its own JVM (hive catalogImplementation
  * is a static conf, so the shared in-memory-catalog test session cannot
  * host it) and asserts the Derby-backed metastore round trip succeeds.
  * Deliberately NOT extending SparkSpec: this suite must not force the
  * shared session into existence.
  */
class MetastoreSmokeSpec extends AnyFunSuite {

  test("hive metastore round trip: catalog state survives a context restart") {
    val scratch = java.nio.file.Files.createTempDirectory("graft-ms").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val argv = Seq(
      s"${sys.props("java.home")}/bin/java") ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"),
      "graft.MetastoreSmoke", scratch)
    val pb = new ProcessBuilder(argv: _*).redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    assert(code == 0 && out.contains("[metastore-smoke] OK"),
      s"metastore smoke failed (exit $code):\n${out.takeRight(4000)}")
  }
}
