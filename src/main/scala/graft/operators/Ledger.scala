package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ack/status ledger, error retry, blocked-key chains, heartbeats,
  * retention cleanup, queue depth — the operational state machinery of
  * the sync, as aggregations over the changelog.
  *
  * Reference semantics: `dbopt/PgOperation.scala:104-113` (batchAck
  * upsert of OK/ERR + retry counter), `sync/ErrorResolver.scala:47-88`
  * (bounded retry), `sync/QueueManager.scala:32-55` +
  * `sync/BlockedHandler.scala` (later changes of a key blocked behind an
  * unresolved earlier failure), `sync/StateManger.scala` /
  * `sync/ComponentManager.scala` (heartbeats), `job/CleanWorker.scala`
  * (dataKeepHours retention), `monitor/Endpoints.scala` SyncState
  * (pending/blocked/error/success counts).
  */
object Ledger {
  /** Mirrors sysConfig.maxRetry. */
  val MaxRetry = 3

  /** Retention window, mirrors sysConfig.dataKeepHours. */
  val KeepHours = 72L

  /** Heartbeat staleness threshold (seconds). */
  val StaleAfterS = 21600L

  /** Deterministic ack status per change: deletes fail (ERR), every
    * 10th key's updates block (BLK), the rest succeed (OK). Stand-in for
    * the runtime-outcome column the reference writes to
    * sync_data_status. */
  val statusCol: Column =
    when(col("op") === "D", lit("ERR"))
      .when(col("op") === "U" && pmod(col("user_id"), lit(10L)) === 0, lit("BLK"))
      .otherwise(lit("OK"))

  /** Retry counter per change (ERR rows retry 0..4 times). */
  val retryCol: Column =
    when(statusCol === "ERR", pmod(col("event_id"), lit(5L))).otherwise(lit(0L))

  /** Source-db assignment for multi-db state reporting. */
  val dbCol: Column =
    concat(lit("db"), pmod(col("user_id"), lit(3L)).cast("string"))

  /** Ack-ledger rollup: per (part, status) counts + retry stats. */
  def batchAck(changelog: DataFrame): DataFrame =
    changelog
      .withColumn("status", statusCol)
      .withColumn("retry", retryCol)
      .groupBy("part", "status")
      .agg(
        count(lit(1)).as("n"),
        sum("retry").as("sum_retry"),
        max("retry").as("max_retry"))

  /** SyncState per source db: pending (unpolled) + per-status counts of
    * polled changes. Mirrors `monitor/Endpoints.scala` SyncState. */
  def syncState(changelog: DataFrame): DataFrame = {
    val polled = ChangeLog.polledCol
    changelog
      .withColumn("status", statusCol)
      .groupBy(dbCol.as("db"))
      .agg(
        count(when(!polled, 1)).as("pending"),
        count(when(polled && col("status") === "BLK", 1)).as("blocked"),
        count(when(polled && col("status") === "ERR", 1)).as("error"),
        count(when(polled && col("status") === "OK", 1)).as("success"),
        lit(0L).as("others"))
  }

  /** Alert rule evaluation over syncState — mirrors
    * `monitor/SelfMonitor.scala` threshold checks. */
  def monitorAlerts(changelog: DataFrame): DataFrame = {
    val alert =
      when(col("error") > 10, lit("ERR_HIGH"))
        .when(col("pending") > 400, lit("PENDING_HIGH"))
        .when(col("blocked") > 10, lit("BLOCKED_HIGH"))
        .otherwise(lit("HEALTHY"))
    // action routing mirrors the reference's ActionHandler registry
    // (monitor/{Restart,Email,Webhook}ActionHandler.scala)
    val action =
      when(alert === "ERR_HIGH", lit("restart"))
        .when(alert === "PENDING_HIGH", lit("webhook"))
        .when(alert === "BLOCKED_HIGH", lit("email"))
        .otherwise(lit("none"))
    syncState(changelog).select(
      col("db"), alert.as("alert"), action.as("action"),
      col("pending"), col("blocked"), col("error"), col("success"))
  }

  /** Bounded-retry schedule per partition: eligible (retry < MaxRetry)
    * vs exhausted errors, and the next id each partition worker would
    * retry. */
  def errorRetry(changelog: DataFrame): DataFrame =
    changelog
      .where(statusCol === "ERR")
      .withColumn("retry", retryCol)
      .groupBy("part")
      .agg(
        count(lit(1)).as("n_err"),
        count(when(col("retry") < MaxRetry, 1)).as("n_eligible"),
        count(when(col("retry") >= MaxRetry, 1)).as("n_exhausted"),
        min(when(col("retry") < MaxRetry, col("event_id"))).as("next_retry_id"))

  /** Blocked-key chains: every change of a key that comes strictly after
    * the key's FIRST failed change is blocked until that error resolves.
    * Single window over the key — one hash shuffle, ordered by change
    * order (ems, event_id), exactly the reference's per-key queueing.
    * first_err_eid = min event_id among preceding errors, which IS the
    * first-in-change-order error under the changelog contract that
    * event_id is the change sequence number (monotone in ems; see
    * CdcMerge.lastPerKey). */
  def blockedChain(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ems"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    changelog
      .withColumn("first_err_eid",
        min(when(col("op") === "D", col("event_id"))).over(w))
      .where(col("first_err_eid").isNotNull)
      .groupBy("user_id")
      .agg(
        min("first_err_eid").as("first_err_eid"),
        count(lit(1)).as("n_blocked"))
  }

  /** Blocked→unblocked replay schedule — the `ErrorResolver.resolvedError`
    * → `BlockedHandler` re-enqueue transition
    * (`/root/reference/.../sync/ErrorResolver.scala`,
    * `sync/BlockedHandler.scala`): once a key's FIRST error is resolved
    * (deterministic stand-in: its retry counter `event_id % 5` is under
    * MaxRetry, i.e. the bounded retry eventually succeeded), every
    * change queued behind it replays in original change order. Same
    * single key-shuffle as blockedChain; the replay sequence is a
    * row_number over the already-partitioned, already-sorted rows (no
    * second shuffle). */
  def blockedReplay(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ems"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val seqW = Window.partitionBy("user_id").orderBy(col("ems"), col("event_id"))
    changelog
      .withColumn("first_err_eid",
        min(when(col("op") === "D", col("event_id"))).over(w))
      .where(col("first_err_eid").isNotNull &&
        pmod(col("first_err_eid"), lit(5L)) < MaxRetry)
      .withColumn("replay_seq", row_number().over(seqW).cast("long"))
      .select(col("user_id"), col("event_id"), col("first_err_eid"),
        col("replay_seq"))
  }

  /** Adaptive poll backoff — `sync/DataPoller.scala:60-74`: after each
    * poll the worker sleeps `(batch - polled) / batch · maxPollWait`
    * (full batch ⇒ poll again immediately; empty poll ⇒ full backoff).
    * Modeled per (db, hour) poll cycle over the changelog; integer
    * arithmetic in both engines. The same policy drives the streaming
    * job's trigger interval (streaming.StreamRun). */
  def pollBackoff(changelog: DataFrame, batch: Long = 500L,
                  maxPollWaitMs: Long = 10000L): DataFrame =
    changelog
      .withColumn("hour_s", expr("(ems - ems % 3600000) div 1000"))
      .groupBy(dbCol.as("db"), col("hour_s"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("db"), col("hour_s"), col("n_events"),
        least(col("n_events"), lit(batch)).as("n_polled"),
        expr(s"(($batch - least(n_events, $batch)) * $maxPollWaitMs) div $batch")
          .as("wait_ms"))

  /** Heartbeat staleness per (db, component): GREEN if the component
    * heartbeat is within StaleAfterS of the global clock (max ts).
    * The global max is a 1-row aggregate broadcast back — the scalable
    * form of "now" for a deterministic dataset. */
  def heartbeatState(changelog: DataFrame): DataFrame = {
    val comp = concat(lit("worker-"), col("part").cast("string"))
    val lastPer = changelog
      .groupBy(dbCol.as("db"), comp.as("component"))
      .agg(max("epoch_s").as("last_hb_s"))
    val clock = changelog.agg(max("epoch_s").as("now_s"))
    lastPer
      .join(broadcast(clock))
      .select(
        col("db"), col("component"), col("last_hb_s"),
        when(col("now_s") - col("last_hb_s") <= StaleAfterS, lit("GREEN"))
          .otherwise(lit("RED")).as("hb_status"))
  }

  /** Monitor-tick heartbeat interval (seconds) for
    * [[componentLifecycle]] — the unit `ComponentManager.heartbeatLost`
    * divides by. */
  val HeartbeatIntervalS = 7200L

  /** Supervisor give-up bound for [[componentLifecycle]]. The
    * reference relaunches UNBOUNDEDLY (`DbSyncLauncher.scala:30-40`
    * loops while restartFlag); an operator running this at scale wants
    * a cap, so components restarted more than this are parked. */
  val MaxComponentRestarts = 3L

  /** Base restart backoff (seconds), doubled per restart (capped at
    * 2^6×). */
  val RestartBackoffS = 60L

  /** Restart-action lifecycle per component — the deterministic replay
    * of `monitor/SelfMonitor.scala:46-68` (rule match → ActionHandler)
    * + `monitor/RestartActionHandler.scala` (restart flag) +
    * `sync/ComponentManager.scala:58-66` (status = lost-interval
    * multiples: GREEN < 2, YELLOW < 5, RED ≥ 5) over event time:
    *
    * A component's heartbeats are its changes' epoch_s. Every gap
    * between consecutive heartbeats is scored lost = gap div
    * HeartbeatIntervalS; a RED gap (lost ≥ 5) is one fired restart
    * (the monitor crosses the rule threshold once per outage, then the
    * relaunch resets the component). n_restarts past
    * MaxComponentRestarts parks the component (state GIVEN_UP — the
    * bound the reference's infinite relaunch loop lacks); otherwise
    * the state is the CURRENT staleness vs the corpus clock, scored
    * with the same thresholds. backoff_s doubles per restart
    * (exponential supervisor backoff, capped at 2^6×).
    *
    * One key-shuffle on (db, component): the lag window and the
    * aggregate share the partitioning; the clock is a broadcast 1-row
    * aggregate. */
  def componentLifecycle(changelog: DataFrame): DataFrame = {
    val comp = concat(lit("worker-"), col("part").cast("string"))
    val w = Window.partitionBy("db", "component")
      .orderBy(col("epoch_s"), col("event_id"))
    val lost = changelog
      .select(dbCol.as("db"), comp.as("component"),
        col("epoch_s"), col("event_id"))
      .withColumn("gap_s", col("epoch_s") - lag("epoch_s", 1).over(w))
      .withColumn("lost", expr(s"gap_s div $HeartbeatIntervalS"))
    val clock = changelog.agg(max("epoch_s").as("now_s"))
    lost
      .groupBy("db", "component")
      .agg(
        count(lit(1)).as("n_heartbeats"),
        count(when(col("lost") >= 2 && col("lost") < 5, 1))
          .as("n_yellow_gaps"),
        count(when(col("lost") >= 5, 1)).as("n_restarts"),
        max("epoch_s").as("last_hb_s"))
      .join(broadcast(clock))
      .select(col("db"), col("component"), col("n_heartbeats"),
        col("n_yellow_gaps"), col("n_restarts"), col("last_hb_s"),
        expr(s"(now_s - last_hb_s) div $HeartbeatIntervalS").as("now_lost"),
        when(col("n_restarts") > MaxComponentRestarts, lit("GIVEN_UP"))
          .when(expr(s"(now_s - last_hb_s) div $HeartbeatIntervalS") < 2,
            lit("GREEN"))
          .when(expr(s"(now_s - last_hb_s) div $HeartbeatIntervalS") < 5,
            lit("YELLOW"))
          .otherwise(lit("RED")).as("state"),
        expr(s"$RestartBackoffS * shiftleft(1L, " +
          s"cast(least(n_restarts, 6) as int))").as("backoff_s"))
  }

  /** Retention cleanup accounting: rows older than (max ts - KeepHours)
    * are cleaned, the rest kept — per (part, op). Mirrors cleanSysTable.
    * The watermark is a broadcast 1-row aggregate; the "delete" is an
    * anti-filter, i.e. an incremental rewrite at scale. */
  def cleanRetention(changelog: DataFrame): DataFrame = {
    val wm = changelog.agg(max("epoch_s").as("max_s"))
    changelog
      .join(broadcast(wm))
      .withColumn("kept", col("epoch_s") >= col("max_s") - KeepHours * 3600L)
      .groupBy("part", "op")
      .agg(
        count(when(col("kept"), 1)).as("n_kept"),
        count(when(!col("kept"), 1)).as("n_cleaned"))
  }

  /** Global monitor rollup — mirrors `monitor/SelfMonitor.scala:46-68`:
    * sync-state totals reduced across dbs plus the worst component
    * status (any RED heartbeat ⇒ RED overall). One row. */
  def statusRollup(changelog: DataFrame): DataFrame = {
    val totals = syncState(changelog).agg(
      sum("pending").as("pending"),
      sum("blocked").as("blocked"),
      sum("error").as("error"),
      sum("success").as("success"))
    val worst = heartbeatState(changelog).agg(
      max(when(col("hb_status") === "RED", 1L).otherwise(0L)).as("any_red"))
    totals.join(broadcast(worst)).select(
      lit("N/A").as("name"),
      col("pending"), col("blocked"), col("error"), col("success"),
      when(col("any_red") === 1L, lit("RED")).otherwise(lit("GREEN"))
        .as("overall"))
  }

  /** Route pausing — mirrors the PauseSetting control surface
    * (`monitor/Endpoints.scala:108`): changes bound for a paused
    * (targetDb) route are held, the rest flow. The default pause set
    * (tdb2) is the oracle-pinned static model; the live HTTP control
    * surface (graft.monitor.StatusServer's POST /control/pause) feeds
    * its accumulated PauseSettings through the same parameter. */
  def pauseFilter(changelog: DataFrame,
                  paused: Set[String] = Set("tdb2")): DataFrame = {
    val routed = ChangeLog.routeFanout(changelog)
    routed.select(
      col("target_db"), col("part"), col("n"),
      when(col("target_db").isInCollection(paused), lit("PAUSED"))
        .otherwise(lit("FLOWING")).as("route_state"))
  }

  /** Changelog compaction (compacted-topic semantics, the storage form
    * of `job/CleanWorker.scala` + the merge): keep every key's LATEST
    * change unconditionally, plus all changes inside the retention
    * window. One key-shuffle for the latest set (semi-join on change
    * id), broadcast 1-row watermark for the recency filter. */
  def logCompact(changelog: DataFrame): DataFrame = {
    val latestIds = CdcMerge.lastPerKey(changelog).select("event_id")
    val wm = changelog.agg(max("epoch_s").as("max_s"))
    changelog
      .join(broadcast(wm))
      .withColumn("recent",
        col("epoch_s") >= col("max_s") - KeepHours * 3600L)
      .join(latestIds.withColumn("is_last", lit(true)), Seq("event_id"), "left")
      .where(col("recent") || col("is_last").isNotNull)
      .select(col("event_id"), col("user_id"), col("op"),
        when(col("recent") && col("is_last").isNotNull, lit("BOTH"))
          .when(col("is_last").isNotNull, lit("LATEST"))
          .otherwise(lit("RECENT")).as("kept_reason"))
  }

  /** Exact distributed order statistic (no sketch): the lower median of
    * value cents per event op class — the deterministic form
    * percentile_approx can't give.
    *
    * Scale shape: the raw changelog is first collapsed to
    * (op, value_cents) COUNTS — a map-side-combined aggregate, so the
    * shuffle carries at most |ops|·|distinct values| rows, not the raw
    * log. Only that (small) distinct-value relation flows into the
    * per-op cumulative-sum window; the median is the first value whose
    * running count reaches rank (n+1)/2. A window over raw rows with
    * only 3 partitions would sort the whole 100 TB log on 3 reducers —
    * the round-2 plan bug this replaces (PlanSpec pins the aggregate-
    * below-window shape). */
  def valueMedian(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy("op").orderBy("value_cents")
    val cw = Window.partitionBy("op")
    changelog
      .groupBy("op", "value_cents")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(w))
      .withColumn("cnt", sum("c").over(cw))
      .where(col("cum") - col("c") < expr("(cnt + 1) div 2") &&
        expr("(cnt + 1) div 2") <= col("cum"))
      .select(col("op"),
        col("value_cents").as("median_low_cents"),
        col("cnt").as("n"))
  }

  /** Quantile points (percent) reported by [[valueQuantiles]]. */
  val QuantilePcts: Seq[Long] = Seq(25L, 50L, 75L, 90L)

  /** Exact multi-point order statistics per op class — [[valueMedian]]
    * generalized to a quantile vector (the latency/value dashboard
    * form). Same aggregate-below-window scale shape: the raw log
    * collapses to (op, value_cents) counts BEFORE any window; the
    * quantile targets explode against that small distinct-value
    * relation only. Lower quantile at 1-based rank ⌈n·p/100⌉ (p=50
    * reproduces the lower median). */
  def valueQuantiles(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy("op").orderBy("value_cents")
    val cw = Window.partitionBy("op")
    changelog
      .groupBy("op", "value_cents")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(w))
      .withColumn("cnt", sum("c").over(cw))
      .select(col("op"), col("value_cents"), col("cum"), col("cnt"),
        explode(array(QuantilePcts.map(lit): _*)).as("pct"))
      .where(col("cum") >= expr("(cnt * pct + 99) div 100"))
      .groupBy("op", "pct")
      .agg(min("value_cents").as("q_cents"), max("cnt").as("n"))
  }

  /** GK-sketch accuracy knob for [[quantileSketchError]] (rank error
    * ≤ n/accuracy — 50× inside the 2% verdict band below). */
  val SketchAccuracy = 10000

  /** Sketch-quantile accuracy gate per op class — the scale path for
    * [[valueQuantiles]]: at 100 TB the exact pass's per-op sort is
    * reserved for the oracle scale, and the catalog runs
    * `percentile_approx` (mergeable GK sketch, one pass, no sort).
    * This gate prices that swap the [[approxDistinct]] way: the exact
    * quantile vector rides along, and the sketch value collapses to an
    * integer rank-band VERDICT the DuckDB oracle pins to 'true'.
    * Tie-robust: the sketch value occupies the rank interval
    * (count <, count ≤]; the verdict holds iff that interval meets
    * [target − n/50, target + n/50] — cross-multiplied, so a massively
    * tied distribution can't fail a perfect sketch. Shapes: one
    * sketch aggregate over the raw log; the rank counts ride the
    * (op, value) DISTINCT-value relation against the broadcast ≤
    * op×pct sketch grid; never a raw-row window. */
  def quantileSketchError(changelog: DataFrame): DataFrame = {
    val fracs = array(QuantilePcts.map(p => lit(p / 100.0)): _*)
    val pctOf = array(QuantilePcts.map(lit): _*)
    val sketch = changelog
      .groupBy("op")
      .agg(percentile_approx(col("value_cents"), fracs,
        lit(SketchAccuracy)).as("aq"))
      .select(col("op"), posexplode(col("aq")).as(Seq("i", "approx_q")))
      .select(col("op"), element_at(pctOf, col("i") + 1).as("pct"),
        col("approx_q"))
    val ranks = changelog
      .groupBy("op", "value_cents").agg(count(lit(1)).as("c"))
      .join(broadcast(sketch), Seq("op"))
      .groupBy("op", "pct")
      .agg(
        sum(when(col("value_cents") < col("approx_q"), col("c"))
          .otherwise(0L)).as("rk_lt"),
        sum(when(col("value_cents") <= col("approx_q"), col("c"))
          .otherwise(0L)).as("rk_le"))
    valueQuantiles(changelog)
      .join(ranks, Seq("op", "pct"))
      .select(col("op"), col("pct"), col("q_cents").as("q_exact_cents"),
        col("n"),
        (expr("rk_lt * 50 < ((n * pct + 99) div 100) * 50 + n") &&
          expr("rk_le * 50 >= ((n * pct + 99) div 100) * 50 - n"))
          .cast("string").as("approx_within_2pct"))
  }

  /** Per-source-db replication lag — the dashboard number a sync
    * operator actually watches (reference: the SyncState/monitor
    * endpoints expose counts; the lag VIEW derives from the same
    * ledger): time since the latest applied (polled, OK) change, age
    * of the oldest unapplied change, and the unapplied backlog, all
    * against the changelog's own high watermark (1-row broadcast, the
    * status_rollup shape — never a single-partition window). */
  def syncLag(changelog: DataFrame): DataFrame = {
    val applied = ChangeLog.polledCol && statusCol === "OK"
    val perDb = changelog
      .groupBy(dbCol.as("db"))
      .agg(
        max(when(applied, col("ems"))).as("applied_ems"),
        min(when(!applied, col("ems"))).as("oldest_pending_ems"),
        min("ems").as("first_ems"),
        count(when(!applied, 1)).as("n_unapplied"))
    val now = changelog.agg(max("ems").as("now_ems"))
    perDb
      .crossJoin(broadcast(now))
      // a db that never applied anything lags since its FIRST change,
      // not since the epoch (a 55-year sentinel is a useless dashboard
      // number)
      .select(col("db"),
        expr("(now_ems - coalesce(applied_ems, first_ems)) div 1000")
          .as("apply_lag_s"),
        expr("(now_ems - coalesce(oldest_pending_ems, now_ems)) div 1000")
          .as("oldest_pending_age_s"),
        col("n_unapplied"))
  }

  /** Rows reported by [[keySkewReport]]. */
  val SkewTopK = 20

  /** Hot-key diagnosis — the operational query run BEFORE choosing a
    * skew strategy (salting, AQE skew-join thresholds): the top sync
    * keys by change count and their corpus share in ppm. Map-side-
    * combined count, 1-row broadcast total, TakeOrdered top-k — the
    * report itself never materializes the full key distribution on one
    * node. */
  def keySkewReport(changelog: DataFrame): DataFrame = {
    val counts = changelog.groupBy("user_id")
      .agg(count(lit(1)).as("n_changes"))
    val tot = counts.agg(sum("n_changes").cast("long").as("total"))
    counts
      .crossJoin(broadcast(tot))
      .select(col("user_id"), col("n_changes"),
        expr("(n_changes * 1000000) div total").as("share_ppm"))
      .orderBy(col("n_changes").desc, col("user_id"))
      .limit(SkewTopK)
  }

  /** Sketch-based cardinality per db: HLL++ (approx_count_distinct,
    * Spark's built-in sketch — preference order (a): compose built-ins
    * before writing a custom TypedImperativeAggregate) alongside the
    * exact count. At 100 TB the approx column is the one you can
    * afford; rsd=0.02 keeps the merge buffers tiny and the result is
    * deterministic for a fixed input (HLL merge is order-independent).
    *
    * Oracle form: the sketch value itself has no cross-engine twin, so
    * the query emits the exact count plus an integer-arithmetic
    * error-band VERDICT (|approx−exact|·20 ≤ exact ⟺ within 5%, well
    * outside rsd=0.02's range) — the DuckDB oracle recomputes the
    * exact count and pins the verdict to 'true', so a sketch drifting
    * out of band fails the hash gate. OperatorsSpec's sketch-accuracy
    * test still bounds the raw approx value directly (via
    * approxDistinctRaw). */
  def approxDistinct(changelog: DataFrame): DataFrame =
    changelog
      .groupBy(dbCol.as("db"))
      .agg(
        approx_count_distinct("user_id", rsd = 0.02).as("approx"),
        countDistinct("user_id").as("n_users_exact"))
      .select(col("db"), col("n_users_exact"),
        (abs(col("approx") - col("n_users_exact")) * 20L <=
          col("n_users_exact")).cast("string").as("approx_within_5pct"))

  /** The raw sketch value beside the exact count (spec-tested form —
    * the oracle-checked query wraps this in the error-band verdict). */
  def approxDistinctRaw(changelog: DataFrame): DataFrame =
    changelog
      .groupBy(dbCol.as("db"))
      .agg(
        approx_count_distinct("user_id", rsd = 0.02).as("n_users_approx"),
        countDistinct("user_id").as("n_users_exact"))

  /** Queue depth per (partition, hour): tumbling-window inflow counts —
    * the observable analog of the reference's bounded in-memory queues. */
  def queueDepth(changelog: DataFrame): DataFrame =
    changelog
      .withColumn("hour_s", expr("(ems - ems % 3600000) div 1000"))
      .groupBy(col("part"), col("hour_s"))
      .agg(count(lit(1)).as("depth"))
}
