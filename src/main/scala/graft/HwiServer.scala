package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** The Hive Web Interface re-expressed over HTTP (closes the §7.5 HWI
  * drop): the reference's HWI is a webapp where users create NAMED,
  * long-lived sessions, submit query batches to them, and read results
  * and history back (`hwi/.../HWISessionManager.java:149` createSession /
  * :189 findSessionItemByName; `HWISessionItem.java:309-` runQuery
  * iterating the session's query list through the same Driver the CLI
  * uses). The JSP/Jetty rendering is deployment-era chrome; the
  * capability is the named-session query service, which this server
  * provides with the same layering — every submission runs through
  * [[GraftSql]]'s driver loop, so the full statement surface (dialect,
  * command processors, variable substitution, per-statement error
  * recovery) behaves exactly as the CLI, per session.
  *
  * Endpoints (all text/plain):
  *   POST   /sessions/<name>          create a named session
  *   GET    /sessions                 list session names
  *   POST   /sessions/<name>/query    body = `;`-separated statements →
  *                                    runs them; returns the Hive-CLI-
  *                                    shaped output; 500 + output if any
  *                                    statement failed (exit code
  *                                    semantics of CliDriver)
  *   GET    /sessions/<name>/history  "<status>TAB<statement>" per line
  *                                    (HWISessionItem's query list +
  *                                    queryRet codes)
  *   DELETE /sessions/<name>          end the session
  *
  * Each HWI session is a `spark.newSession()` — isolated conf/temp views
  * over the shared context, the HiveServer session model the reference's
  * HWI rides on.
  */
object HwiServer {

  final class HwiSession(val name: String, val spark: SparkSession) {
    val history = mutable.Buffer.empty[(Int, String)] // (exit code, batch)
  }

  final class Running(val server: HttpServer,
      val sessions: TrieMap[String, HwiSession]) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Start on `port` (0 = ephemeral); returns the running server. */
  def start(root: SparkSession, port: Int = 0): Running = {
    val sessions = TrieMap.empty[String, HwiSession]
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

    server.createContext("/sessions", (ex: HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath.stripPrefix("/sessions")
          .stripPrefix("/").stripSuffix("/")
        val method = ex.getRequestMethod
        (method, path.split("/", -1).toList.filter(_.nonEmpty)) match {
          case ("GET", Nil) =>
            respond(ex, 200, sessions.keys.toSeq.sorted.mkString("\n"))
          case ("POST", name :: Nil) =>
            if (sessions.contains(name)) respond(ex, 409, s"session $name exists")
            else {
              // HWISessionManager.createSession: one item per unique name
              sessions.put(name, new HwiSession(name, root.newSession()))
              respond(ex, 201, s"created $name")
            }
          case ("DELETE", name :: Nil) =>
            if (sessions.remove(name).isDefined) respond(ex, 200, s"ended $name")
            else respond(ex, 404, s"no session $name")
          case ("POST", name :: "query" :: Nil) =>
            sessions.get(name) match {
              case None => respond(ex, 404, s"no session $name")
              case Some(s) =>
                val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
                val buf = new ByteArrayOutputStream()
                val out = new PrintStream(buf, true, "UTF-8")
                // the session's queries run through the same driver loop
                // as the CLI (HWISessionItem.runQuery -> Driver layering)
                val code = s.synchronized {
                  GraftSql.run(s.spark, new BufferedReader(new StringReader(body)),
                    out, interactive = false, silent = true)
                }
                s.synchronized(s.history += ((code, body.trim)))
                respond(ex, if (code == 0) 200 else 500, buf.toString("UTF-8"))
            }
          case ("GET", name :: "history" :: Nil) =>
            sessions.get(name) match {
              case None => respond(ex, 404, s"no session $name")
              case Some(s) =>
                val h = s.synchronized(s.history.toSeq)
                respond(ex, 200, h.map { case (c, q) =>
                  s"$c\t${q.linesIterator.mkString(" ")}" }.mkString("\n"))
            }
          case _ => respond(ex, 400, s"unsupported: $method /sessions/$path")
        }
      } catch { case e: Exception =>
        respond(ex, 500, s"error: ${e.getMessage}")
      }
    })
    server.setExecutor(null) // serial dispatch; sessions serialize anyway
    server.start()
    new Running(server, sessions)
  }
}
