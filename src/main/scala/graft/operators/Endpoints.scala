package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.SyncConfigs

/** The reference's REST monitoring surface as one relation — the
  * query-shaped form of `monitor/Endpoints.scala:28-92` (GET
  * /status/sys, /status/sync, /status/component, /status/datasource,
  * /config).
  *
  * Each endpoint's response body is rendered as the reference's exact
  * JSON shape (`SyncState(name, pending, blocked, error, success,
  * others)` for /status/sync; the sys map of uptime/running/
  * componentStatus/syncStatus/restartReason; the sorted component and
  * datasource maps), one row per (endpoint, entity). The bodies are
  * built with deterministic string concatenation over the SAME
  * aggregates the standalone queries expose (`sync_state`,
  * `status_rollup`, `component_lifecycle`, `datasource_status`), so
  * the serialization is engine-portable and the DuckDB oracle can
  * mirror it byte-for-byte — no JSON library in the loop.
  *
  * Scale shape: every branch is a map-side-combined aggregate of the
  * changelog (or a config-derived VALUES relation); the union is a
  * handful of rows regardless of corpus size — this is the O(1)-output
  * status poll a monitor hits every few seconds, so nothing here may
  * shuffle raw rows.
  */
object Endpoints {

  private def num(c: Column): Column = c.cast("string")

  /** The five GET responses: (endpoint, name, body). */
  def statusJson(spark: SparkSession, changelog: DataFrame): DataFrame = {
    // one sync-state pass feeds BOTH /status/sync and the /status/sys
    // totals — the rollup is an agg over the per-db rows, not a rescan
    val st = Ledger.syncState(changelog)

    // /status/sync — one SyncState per source db, jackson field order
    val sync = st.select(
      lit("/status/sync").as("endpoint"),
      col("db").as("name"),
      concat(
        lit("{\"name\":\""), col("db"),
        lit("\",\"pending\":"), num(col("pending")),
        lit(",\"blocked\":"), num(col("blocked")),
        lit(",\"error\":"), num(col("error")),
        lit(",\"success\":"), num(col("success")),
        lit(",\"others\":0}")).as("body"))

    // /status/sys — uptime is the corpus clock span; running is the
    // steady state; componentStatus is the rollup's worst heartbeat;
    // syncStatus the cross-db totals; restartReason empty (no restart)
    val up = changelog.agg(
      (max("epoch_s") - min("epoch_s")).as("uptime_s"))
    val totals = st.agg(
      sum("pending").as("pending"), sum("blocked").as("blocked"),
      sum("error").as("error"), sum("success").as("success"))
    val worst = Ledger.heartbeatState(changelog).agg(
      max(when(col("hb_status") === "RED", 1L).otherwise(0L)).as("any_red"))
    val sys = totals.join(broadcast(worst)).join(broadcast(up))
      .withColumn("overall",
        when(col("any_red") === 1L, lit("RED")).otherwise(lit("GREEN")))
      .select(
      lit("/status/sys").as("endpoint"),
      lit("sys").as("name"),
      concat(
        lit("{\"uptime\":"), num(col("uptime_s")),
        lit(",\"running\":true,\"componentStatus\":\""), col("overall"),
        lit("\",\"syncStatus\":{\"pending\":"), num(col("pending")),
        lit(",\"blocked\":"), num(col("blocked")),
        lit(",\"error\":"), num(col("error")),
        lit(",\"success\":"), num(col("success")),
        lit("},\"restartReason\":\"\"}")).as("body"))

    // /status/component — the lifecycle supervisor's view per worker
    val comp = Ledger.componentLifecycle(changelog).select(
      lit("/status/component").as("endpoint"),
      concat(col("db"), lit("/"), col("component")).as("name"),
      concat(
        lit("{\"state\":\""), col("state"),
        lit("\",\"restarts\":"), num(col("n_restarts")),
        lit(",\"lastHeartbeat\":"), num(col("last_hb_s")),
        lit(",\"backoffSeconds\":"), num(col("backoff_s")),
        lit("}")).as("body"))

    // /status/datasource — the pool registry (config-derived; the
    // reference reports live Druid pool counters, our sandbox twin
    // reports the static registry + route fan-in/out)
    val ds = SyncConfigs.datasourceStatus(spark).select(
      lit("/status/datasource").as("endpoint"),
      col("db").as("name"),
      concat(
        lit("{\"name\":\""), col("db"),
        lit("\",\"type\":\""), col("db_type"),
        lit("\",\"url\":\""), col("jdbc_url"),
        lit("\",\"sysSchema\":\""), col("sys_schema"),
        lit("\",\"sourceRoutes\":"), num(col("n_source_routes")),
        lit(",\"targetRoutes\":"), num(col("n_target_routes")),
        lit("}")).as("body"))

    // /config — the full parsed configuration (passwords scrubbed in
    // the reference; our model carries none). A 1-row literal: the
    // body is a pure function of the YAML, shared verbatim with the
    // oracle via SyncConfigs.configEndpointJson.
    val cfgRow = {
      import spark.implicits._
      Seq(("/config", "config", SyncConfigs.configEndpointJson()))
        .toDF("endpoint", "name", "body")
    }

    sync.unionByName(sys).unionByName(comp).unionByName(ds)
      .unionByName(cfgRow)
  }

  /** Static delivery targets for [[alertPayloads]] — in the reference
    * these come from each monitor rule's `params` block
    * (EmailParams/WebhookParams); here one constant each, example.com
    * reserved addresses (nothing is ever sent). */
  val AlertEmailTo = "ops@example.com"
  val AlertWebhookUrl = "https://example.com/dbsync/alerts"
  val AlertEmailSubject = "[dbsync monitor] rule matched"

  /** The monitor rule set — the graft twin of the reference's
    * `monitor:` YAML list (config/ConfigObjects.scala:48-59
    * MonitorRule/MonitorConfig; src/config/app-demo.yaml): each rule
    * names its thresholds (−1 = unconfigured, the reference default)
    * and ONE action, and EVERY rule is evaluated independently per db
    * (monitor/SelfMonitor.scala:68 `monitorConfig.foreach`) — a db in
    * deep trouble fires several deliveries, one per matched rule.
    * Fields: (name, pendingOver, blockedOver, errorOver, action). */
  val AlertRules: Seq[(String, Long, Long, Long, String)] = Seq(
    ("ops-email", -1L, 10L, 10L, "email"),
    ("ops-webhook", 400L, -1L, -1L, "webhook"),
    ("pager-webhook", -1L, -1L, 50L, "webhook"))

  /** Delivery payloads for matched monitor rules — the query-shaped
    * form of the reference's alert side effects
    * (monitor/EmailActionHandler.scala:22-56, the indented text
    * template; monitor/WebhookActionHandler.scala:20-31, the JSON
    * POST body): one row per (db, rule, matched threshold), carrying
    * the exact body the handler would put on the wire, rendered with
    * deterministic concatenation from the same sync-state aggregate —
    * so everything UP TO the socket is oracle-checked and only the
    * SMTP/HTTP send itself remains the declared non-goal. The
    * sync-state aggregate runs once (exchange-reused across the rule
    * branches); output is (alerting dbs × matched rules)-sized. */
  def alertPayloads(changelog: DataFrame): DataFrame = {
    val st = Ledger.syncState(changelog)
    val branches = AlertRules.flatMap {
      case (rule, pOver, bOver, eOver, action) =>
        Seq(("pending", pOver), ("blocked", bOver), ("error", eOver))
          .collect { case (kind, t) if t >= 0L =>
            st.where(col(kind) > t)
              .select(col("db"), lit(rule).as("rule"),
                concat(lit(s"$kind="), num(col(kind)),
                  lit(s" threshold=$t")).as("reason"),
                lit(action).as("channel"),
                col("pending"), col("blocked"), col("error"),
                col("success"))
          }
    }
    val al = branches.reduce(_ unionByName _)
    val nl = lit("\n")
    val emailBody = concat(
      lit("matched rule: "), col("rule"), nl,
      lit("reason: "), col("reason"), nl,
      lit("sync status:"), nl,
      lit("  name: "), col("db"), nl,
      lit("  pending: "), num(col("pending")), nl,
      lit("  blocked: "), num(col("blocked")), nl,
      lit("  error: "), num(col("error")), nl,
      lit("  success: "), num(col("success")))
    val hookBody = concat(
      lit("{\"matchedRule\":\""), col("rule"),
      lit("\",\"reason\":\""), col("reason"),
      lit("\",\"syncStatus\":{\"name\":\""), col("db"),
      lit("\",\"pending\":"), num(col("pending")),
      lit(",\"blocked\":"), num(col("blocked")),
      lit(",\"error\":"), num(col("error")),
      lit(",\"success\":"), num(col("success")),
      lit(",\"others\":0}}"))
    al.select(col("db"), col("rule"), col("reason"),
      col("channel"),
      when(col("channel") === "email", lit(AlertEmailTo))
        .otherwise(lit(AlertWebhookUrl)).as("target"),
      when(col("channel") === "email", lit(AlertEmailSubject))
        .otherwise(lit("POST")).as("mode"),
      when(col("channel") === "email", emailBody)
        .otherwise(hookBody).as("body"))
  }
}
