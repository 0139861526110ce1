package graft.monitor

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.concurrent.TrieMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame

/** One paused route — the reference's control payload verbatim
  * (`monitor/Endpoints.scala:108` PauseSetting). */
final case class PauseSetting(sourceDb: String, targetDb: String,
                              schema: String, table: String)

/** A REAL HTTP listener over the [[graft.operators.Endpoints]] status
  * relation — the serving half of the reference's monitor surface
  * (`monitor/Endpoints.scala:28-108`), built on the JDK's own
  * `com.sun.net.httpserver` (zero dependencies):
  *
  *  - GET /status/sys /status/sync /status/component /status/datasource
  *    /config serve EXACTLY the bodies the oracle-checked
  *    `endpoint_status` query verifies — /status/sync as the jackson
  *    list (name-sorted), the component/datasource endpoints as the
  *    reference's sorted maps, sys/config as their single objects.
  *  - GET /control/restart and /config/reload acknowledge with "OK"
  *    and count the restart request (the reference calls
  *    `sysctx.restart`; the counter is this model's observable).
  *  - POST /control/pause and /control/resume take the reference's
  *    PauseSetting JSON and maintain the pause set; GET /control/pause
  *    lists it. [[pausedTargets]] feeds
  *    `graft.operators.Ledger.pauseFilter` so a pause taken over HTTP
  *    is the SAME pause the relational route filter enforces.
  *
  * Serving model for 100 TB: status bodies are SNAPSHOTS — [[refresh]]
  * collects the status relation once (a handful of rows by
  * construction: every endpoint_status branch is an O(1)-output
  * aggregate), and requests serve from memory. A monitor polling every
  * few seconds costs zero Spark work between refreshes; the refresh
  * cadence is the caller's trigger (e.g. a foreachBatch hook).
  */
final class StatusServer(port: Int = 0) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  @volatile private var bodies: Map[String, String] = Map.empty
  private val paused = TrieMap.empty[PauseSetting, Unit]
  private val restarts = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Snapshot the status relation (endpoint, name, body) into the
    * served bodies. Call once per refresh trigger, never per request. */
  def refresh(status: DataFrame): Unit = {
    val rows = status.select("endpoint", "name", "body").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val byEp = rows.groupBy(_._1)
    def sorted(ep: String) =
      byEp.getOrElse(ep, Array.empty).sortBy(_._2)
    def single(ep: String) =
      sorted(ep).headOption.map(_._3).getOrElse("{}")
    def sortedMap(ep: String) =
      sorted(ep).map { case (_, n, b) => s""""${esc(n)}":$b""" }
        .mkString("{", ",", "}")
    bodies = Map(
      "/status/sys" -> single("/status/sys"),
      "/status/sync" -> sorted("/status/sync").map(_._3)
        .mkString("[", ",", "]"),
      "/status/component" -> sortedMap("/status/component"),
      "/status/datasource" -> sortedMap("/status/datasource"),
      "/config" -> single("/config"))
  }

  /** The targetDb set of the accumulated pauses — the live input to
    * `Ledger.pauseFilter`. */
  def pausedTargets: Set[String] = paused.keySet.map(_.targetDb).toSet

  /** Restart requests taken (via /control/restart or /config/reload). */
  def restartCount: Long = restarts.get()

  /** Bound port (useful with port=0 ephemeral binding). */
  def boundPort: Int = server.getAddress.getPort

  /** JSON string-value escape for names/fields we interpolate. */
  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    }

  private def respond(ex: HttpExchange, code: Int, body: String,
                      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def parsePause(body: String): Option[PauseSetting] = {
    // the PauseSetting payload is four known string fields — a
    // dependency-free field extractor keeps the serving path decoupled
    // from any JSON library version on the executor classpath
    def field(k: String): Option[String] =
      ("\"" + k + "\"\\s*:\\s*\"([^\"]*)\"").r
        .findFirstMatchIn(body).map(_.group(1))
    for (s <- field("sourceDb"); t <- field("targetDb");
         sc <- field("schema"); tb <- field("table"))
      yield PauseSetting(s, t, sc, tb)
  }

  private def pauseJson(p: PauseSetting): String =
    s"""{"sourceDb":"${esc(p.sourceDb)}","targetDb":"${esc(p.targetDb)}",""" +
      s""""schema":"${esc(p.schema)}","table":"${esc(p.table)}"}"""

  server.createContext("/", (ex: HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path) match {
        case ("GET", p) if bodies.contains(p) =>
          respond(ex, 200, bodies(p))
        case ("GET", "/control/restart") | ("GET", "/config/reload") =>
          restarts.incrementAndGet()
          respond(ex, 200, "OK", "text/plain")
        case ("GET", "/control/pause") =>
          val body = paused.keySet.toSeq
            .sortBy(p => (p.sourceDb, p.targetDb, p.schema, p.table))
            .map(pauseJson).mkString("[", ",", "]")
          respond(ex, 200, body)
        case ("POST", "/control/pause") | ("POST", "/control/resume") =>
          val raw = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          parsePause(raw) match {
            case Some(p) =>
              if (path == "/control/pause") paused.put(p, ())
              else paused.remove(p)
              respond(ex, 200, "OK", "text/plain")
            case None => respond(ex, 400,
              "malformed PauseSetting", "text/plain")
          }
        case _ => respond(ex, 404, "not found", "text/plain")
      }
    } catch {
      case e: Exception =>
        // best-effort 500: the message may be null and the headers may
        // already be sent (mid-write failure) — neither may take down
        // the dispatcher
        val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
        try respond(ex, 500, msg, "text/plain")
        catch { case _: Exception => () }
    } finally ex.close()
  })

  server.setExecutor(null) // serve on the dispatcher thread: O(1) bodies
  def start(): StatusServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
