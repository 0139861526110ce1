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
}
