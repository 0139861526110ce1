package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.monitor.{PauseSetting, StatusServer}
import graft.operators.{ChangeLog, Endpoints, Ledger}

/** The REAL HTTP listener serving the oracle-checked endpoint_status
  * bodies: every GET path returns exactly the relation's composition,
  * and the PauseSetting control loop (POST pause/resume → pausedTargets
  * → Ledger.pauseFilter) flips live route states.
  */
class StatusServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def get(port: Int, path: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(port: Int, path: String, body: String)
  : HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET endpoints serve exactly the endpoint_status relation; " +
    "controls acknowledge and count") {
    val cl = ChangeLog.normalize(Tables.events(spark, TestSpark.Sf))
    val status = Endpoints.statusJson(spark, cl).localCheckpoint()
    val rows = status.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))

    val srv = new StatusServer().start()
    try {
      srv.refresh(status)
      val port = srv.boundPort

      val wantSync = rows.filter(_._1 == "/status/sync").sortBy(_._2)
        .map(_._3).mkString("[", ",", "]")
      assert(get(port, "/status/sync").body() === wantSync)

      val wantSys = rows.find(_._1 == "/status/sys").get._3
      assert(get(port, "/status/sys").body() === wantSys)

      val wantComp = rows.filter(_._1 == "/status/component").sortBy(_._2)
        .map { case (_, n, b) => s""""$n":$b""" }.mkString("{", ",", "}")
      assert(get(port, "/status/component").body() === wantComp)

      val wantDs = rows.filter(_._1 == "/status/datasource").sortBy(_._2)
        .map { case (_, n, b) => s""""$n":$b""" }.mkString("{", ",", "}")
      assert(get(port, "/status/datasource").body() === wantDs)

      assert(get(port, "/config").body() ===
        rows.find(_._1 == "/config").get._3)

      assert(get(port, "/control/restart").body() === "OK")
      assert(get(port, "/config/reload").body() === "OK")
      assert(srv.restartCount === 2L)
      assert(get(port, "/nope").statusCode() === 404)
    } finally srv.stop()
  }

  test("PauseSetting control loop: POST pause flips the live route " +
    "state in Ledger.pauseFilter, resume restores it") {
    val cl = ChangeLog.normalize(Tables.events(spark, TestSpark.Sf))
    val srv = new StatusServer().start()
    try {
      val port = srv.boundPort
      def stateOf(db: String): Set[String] =
        Ledger.pauseFilter(cl, srv.pausedTargets).where(
          org.apache.spark.sql.functions.col("target_db") === db)
          .select("route_state").collect().map(_.getString(0)).toSet

      assert(stateOf("tdb1") === Set("FLOWING"))
      val p = """{"sourceDb":"db0","targetDb":"tdb1",""" +
        """"schema":"app","table":"orders"}"""
      assert(post(port, "/control/pause", p).body() === "OK")
      assert(get(port, "/control/pause").body() === s"[$p]")
      assert(srv.pausedTargets === Set("tdb1"))
      assert(stateOf("tdb1") === Set("PAUSED"))

      assert(post(port, "/control/resume", p).body() === "OK")
      assert(srv.pausedTargets === Set.empty[String])
      assert(stateOf("tdb1") === Set("FLOWING"))

      assert(post(port, "/control/pause", "{\"garbage\":1}")
        .statusCode() === 400)
    } finally srv.stop()
  }
}
