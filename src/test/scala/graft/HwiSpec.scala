package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** The HWI analogue (closes the §7.5 HWI drop): named long-lived sessions
  * over HTTP, query batches through the CLI driver loop, history, and
  * per-session isolation (HWISessionManager/HWISessionItem semantics).
  */
class HwiSpec extends SparkSpec {

  private def http(method: String, url: String, body: Option[String] = None)
      : (Int, String) = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(UTF_8))
    }
    val code = conn.getResponseCode
    val in = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = if (in == null) "" else new String(in.readAllBytes(), UTF_8)
    conn.disconnect()
    (code, text)
  }

  test("named sessions, query batches, history, isolation over HTTP") {
    val srv = HwiServer.start(spark)
    try {
      val base = s"http://127.0.0.1:${srv.port}/sessions"
      // create two named sessions (HWISessionManager.createSession)
      assert(http("POST", s"$base/alpha")._1 == 201)
      assert(http("POST", s"$base/beta")._1 == 201)
      assert(http("POST", s"$base/alpha")._1 == 409, "duplicate name rejected")
      assert(http("GET", base)._2.linesIterator.toSeq == Seq("alpha", "beta"))

      // a query batch runs through the CLI driver loop: dialect + SET +
      // results in Hive-CLI tab shape
      val (c1, out1) = http("POST", s"$base/alpha/query", Some(
        s"""SET hivevar:dir=$sfDir;
            SELECT r_regionkey, upper(r_name) AS n
            FROM parquet.`$${dir}/region.parquet`
            ORDER BY r_regionkey LIMIT 2;"""))
      assert(c1 == 200, out1)
      // (the SET statement echoes its key/value row first, like the CLI)
      assert(out1.linesIterator.toSeq.takeRight(2) ==
        Seq("0\tAFRICA", "1\tAMERICA"), out1)

      // per-session isolation: alpha's hivevar is invisible in beta
      val (c2, out2) = http("POST", s"$base/beta/query",
        Some("SELECT '${dir}' AS v;"))
      assert(c2 == 200)
      assert(out2.trim == "${dir}", "unresolved var stays literal in beta")

      // a failing statement yields the CLI's nonzero exit → HTTP 500,
      // with per-statement recovery visible in the output
      val (c3, out3) = http("POST", s"$base/alpha/query",
        Some("SELECT no_such_col FROM range(1);\nSELECT 'still_alive' AS v;"))
      assert(c3 == 500)
      assert(out3.contains("FAILED") && out3.contains("still_alive"))

      // history carries (exit code, statement batch) per submission
      val (_, hist) = http("GET", s"$base/alpha/history")
      val lines = hist.linesIterator.toSeq
      assert(lines.size == 2)
      assert(lines.head.startsWith("0\t") && lines.last.startsWith("1\t"))

      // unknown session and teardown
      assert(http("POST", s"$base/ghost/query", Some("SELECT 1;"))._1 == 404)
      assert(http("DELETE", s"$base/beta")._1 == 200)
      assert(http("GET", base)._2.linesIterator.toSeq == Seq("alpha"))
    } finally srv.stop()
  }
}
