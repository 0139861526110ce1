package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog normalization + poll/partition/routing stages of the CDC
  * pipeline, re-expressed as declarative DataFrame transforms.
  *
  * Reference semantics (cited, not copied):
  *  - poll: `dbopt/PgOperation.scala:27-46` — unpolled rows (anti-join vs
  *    `sync_polled`), id-ordered, bounded batch.
  *  - partition: `sync/DataPoller.scala:88-105` — hash of the sync key
  *    modulo `sysConfig.partition`, so all changes of one key are applied
  *    in order by one worker. Here the *logical* partition id is a column
  *    (key mod N, oracle-checkable) and the *physical* co-location is a
  *    hash shuffle on the key — which is exactly what `groupBy`/`Window`
  *    over the key gives us, at any cluster size.
  *  - routing: `sync/DataPoller.scala pushModel` — one change fans out to
  *    each configured targetDb.
  *
  * All outputs use hash-stable types only (bigint / string): raw
  * timestamps are ns in the parquet files, which Spark truncates to µs —
  * so time is surfaced as epoch milliseconds/seconds (bigint).
  */
object ChangeLog {
  /** Mirrors sysConfig.partition (reference default-ish scale knob). */
  val NumPartitions = 16

  /** Poll batch size, mirrors sysConfig.batch. */
  val BatchSize = 500

  /** event_type → I/U/D op code: deterministic stand-in for the
    * trigger-written operation column (`sync/SyncDataModel.scala`). */
  val opCol: Column =
    when(col("event_type") === "signup", lit("I"))
      .when(col("event_type") === "error", lit("D"))
      .otherwise(lit("U"))

  /** events.parquet → normalized changelog. Column set:
    * event_id, user_id (sync key), op, ems (epoch millis — the change
    * order), epoch_s, value_cents, k (parsed from the JSON props), part.
    */
  def normalize(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("user_id"),
      opCol.as("op"),
      expr("ts_ns div 1000000").as("ems"),
      expr("ts_ns div 1000000000").as("epoch_s"),
      round(col("value") * 100).cast("long").as("value_cents"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      pmod(col("user_id"), lit(NumPartitions.toLong)).as("part"))

  /** Already-polled predicate (stand-in for the `sync_polled` lookup) —
    * THE definition; Ledger.syncState and the oracle ST CTE mirror it. */
  val polledCol: Column = col("event_id") % 7 === 0

  /** Simulated already-polled set. */
  def polledIds(changelog: DataFrame): DataFrame =
    changelog.where(polledCol).select("event_id")

  /** Unpolled changes, id-ordered, bounded batch — the pollBatch step.
    * Anti-join is a single shuffle; the order+limit is a TakeOrdered
    * (no full sort materialization). Returns the FULL changelog schema
    * so the batch composes into merge/apply (Pipeline's incremental
    * mode).
    */
  def pollBatch(changelog: DataFrame, batch: Int = BatchSize): DataFrame =
    changelog
      .join(polledIds(changelog), Seq("event_id"), "left_anti")
      .orderBy("event_id")
      .limit(batch)

  /** Per-partition apply summary after last-writer-wins: how many keys
    * each ordered worker owns and the applied (live) state it would
    * write. One hash shuffle on the key, then a map-side-combined
    * aggregation by partition id.
    */
  def orderedApply(changelog: DataFrame): DataFrame = {
    val last = CdcMerge.lastPerKey(changelog)
    last
      .groupBy("part")
      .agg(
        count(lit(1)).as("n_keys"),
        count(when(col("op") =!= "D", 1)).as("n_live"),
        coalesce(sum(when(col("op") =!= "D", col("value_cents"))), lit(0L))
          .as("sum_live_cents"))
  }

  /** Conditional capture — mirrors the per-table insertCondition /
    * updateCondition the reference compiles into its triggers
    * (`dbopt/PgOperation.scala:140` `{{insertCondition}}`,
    * `config/ConfigObjects.scala`): a change is captured only when its
    * op's condition holds. Demo conditions: inserts capture only at
    * value ≥ 10.00, updates only at value > 0, deletes always. */
  def conditionalCapture(changelog: DataFrame): DataFrame = {
    val captured =
      when(col("op") === "I", col("value_cents") >= 1000L)
        .when(col("op") === "U", col("value_cents") > 0L)
        .otherwise(lit(true))
    changelog
      .groupBy("op")
      .agg(
        count(when(captured, 1)).as("n_captured"),
        count(when(!captured, 1)).as("n_suppressed"))
  }

  /** Rows per applied sub-batch within one poll cycle — mirrors the
    * reference's bounded batched apply (`sync/DataSyncer.scala` applies
    * a polled batch in per-partition slices). */
  val ApplyBatchRows = 50L

  /** Batched-apply plan for ONE poll cycle: the polled batch (bounded
    * by `batch`, so the per-partition windows below order a
    * config-bounded relation — never unbounded history) is split into
    * id-ordered sub-batches of ApplyBatchRows per partition worker,
    * and each sub-batch is summarized (rows, key span, id span). This
    * is the apply schedule a partition worker executes in order.
    * Reference: `sync/DataSyncer.scala:70-133` batched apply,
    * `dbopt/PgOperation.scala:49-82` per-batch statements. */
  def applyBatchPlan(changelog: DataFrame,
                     batch: Int = BatchSize): DataFrame =
    pollBatch(changelog, batch)
      .withColumn("batch_idx",
        expr(s"(row_number() OVER (PARTITION BY part ORDER BY ems, event_id)"
          + s" - 1) div ${ApplyBatchRows}L"))
      .groupBy("part", "batch_idx")
      .agg(
        count(lit(1)).as("n_rows"),
        min("event_id").as("first_event_id"),
        max("event_id").as("last_event_id"),
        countDistinct("user_id").as("n_keys"),
        sum("value_cents").as("sum_cents"))

  /** JSON-payload census — the schema-drift monitor for the trigger-
    * written `data` column (reference: the JSON row payload of
    * `sync/SyncDataModel.scala`; a drifting upstream schema shows up
    * here before it breaks apply). Pairs are pulled with a portable
    * regex (no JSON engine dependence), so both engines agree on
    * malformed fragments too: per (event_type, key) — occurrences,
    * how many values are integral, and their min/max/sum. */
  def propsCensus(events: DataFrame): DataFrame = {
    val pair = "\"([A-Za-z0-9_]+)\"\\s*:\\s*([^,}]+)"
    events
      .select(col("event_type"),
        explode(regexp_extract_all(col("props"), lit(pair), lit(0))).as("m"))
      .select(col("event_type"),
        regexp_extract(col("m"), "\"([A-Za-z0-9_]+)\"", 1).as("key"),
        trim(regexp_extract(col("m"), ":\\s*(.+)$", 1)).as("vs"))
      // try_cast, not cast: under ANSI mode a drifting payload with an
      // integral value beyond long range would otherwise KILL the
      // monitor that exists to report such drift (oracle: TRY_CAST)
      .withColumn("num",
        when(col("vs").rlike("^-?[0-9]+$"), expr("try_cast(vs as long)")))
      .groupBy("event_type", "key")
      .agg(
        count(lit(1)).as("n"),
        count(col("num")).as("n_numeric"),
        coalesce(sum("num"), lit(0L)).as("sum_num"),
        min("num").as("min_num"),
        max("num").as("max_num"))
  }

  /** Multi-target routing: one change row fans out to each configured
    * target db (reference: trigger loop over regexp_split targetDb).
    * Routing table is a deterministic function of the key here.
    */
  def routeFanout(changelog: DataFrame): DataFrame = {
    val targets =
      when(pmod(col("user_id"), lit(3L)) === 0, lit("tdb0,tdb1"))
        .when(pmod(col("user_id"), lit(3L)) === 1, lit("tdb1"))
        .otherwise(lit("tdb1,tdb2"))
    changelog
      .select(col("part"), explode(split(targets, ",")).as("target_db"))
      .groupBy("target_db", "part")
      .agg(count(lit(1)).as("n"))
  }
}
