package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over the changelog — the history-keeping half of
  * a sync engine (what a warehouse does with the stream the reference
  * ships): SCD-2 validity intervals, as-of-previous deltas, and
  * session windows. Each is one window over the sync key — the same
  * single hash shuffle as the merge.
  */
object Temporal {
  /** Session gap: a pause longer than this starts a new session. */
  val SessionGapMs: Long = 30L * 60L * 1000L

  private val keyOrder = Window.partitionBy("user_id")
    .orderBy(col("ems"), col("event_id"))

  /** SCD-2 history: every non-delete change becomes a versioned row
    * with [valid_from, valid_to) in epoch ms; a following change of any
    * kind (including a delete) closes the interval. Open intervals are
    * current. */
  def scd2History(changelog: DataFrame): DataFrame =
    changelog
      .withColumn("valid_to_ms", lead(col("ems"), 1).over(keyOrder))
      .where(col("op") =!= "D")
      .select(
        col("user_id"), col("event_id"), col("op"), col("value_cents"),
        col("ems").as("valid_from_ms"), col("valid_to_ms"),
        when(col("valid_to_ms").isNull, lit("true")).otherwise(lit("false"))
          .as("is_current"))

  /** As-of-previous join (self as-of): each change paired with the
    * user's immediately preceding change → inter-change gap. The lag
    * window IS the as-of join against the same stream. */
  def eventGaps(changelog: DataFrame): DataFrame =
    changelog
      .withColumn("prev_ems", lag(col("ems"), 1).over(keyOrder))
      .withColumn("prev_event_id", lag(col("event_id"), 1).over(keyOrder))
      .where(col("prev_ems").isNotNull)
      .select(
        col("user_id"), col("event_id"), col("prev_event_id"),
        (col("ems") - col("prev_ems")).as("gap_ms"))

  /** Composed per-key profile — the materialized "current user state"
    * a sync target serves (latest op via max_by, activity counts,
    * session count from the same lag window as sessionize, value
    * totals): ONE hash shuffle on the key; the lag window and the
    * aggregate share the same exchange. The session-count rule is
    * literally sessionize's session-start predicate, summed. */
  def userProfile(changelog: DataFrame): DataFrame =
    changelog
      .withColumn("gap_ms",
        col("ems") - lag(col("ems"), 1).over(keyOrder))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("gap_ms").isNull || col("gap_ms") > SessionGapMs, 1L)
          .otherwise(0L)).as("n_sessions"),
        min("ems").as("first_ms"),
        max("ems").as("last_ms"),
        coalesce(sum(when(col("op") =!= "D", col("value_cents"))), lit(0L))
          .as("sum_value_cents"),
        max_by(col("op"), struct(col("ems"), col("event_id"))).as("last_op"))

  /** Inter-arrival cadence + ordering audit per partition worker — the
    * input to the reference's poll-wait tuning (`sync/DataPoller
    * .scala:60-74`) and the out-of-order check a watermark choice
    * rests on: per part, event counts, id-order/time-order inversions
    * (an inversion means applying in id order would apply out of event
    * time), and per-key gap stats. The lag window runs per KEY (fine
    * partitions), never per part — the part-level rollup aggregates
    * window output. */
  def arrivalMonitor(changelog: DataFrame): DataFrame = {
    val idOrder = Window.partitionBy("user_id").orderBy("event_id")
    changelog
      .withColumn("prev_ems", lag(col("ems"), 1).over(idOrder))
      .withColumn("gap_ms", col("ems") - col("prev_ems"))
      .groupBy("part")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("prev_ems") > col("ems"), 1L).otherwise(0L))
          .as("n_inversions"),
        coalesce(min("gap_ms"), lit(0L)).as("min_gap_ms"),
        coalesce(max("gap_ms"), lit(0L)).as("max_gap_ms"),
        coalesce(expr("sum(gap_ms) div count(gap_ms)"), lit(0L))
          .as("mean_gap_ms"))
  }

  /** Sessionization: a gap > SessionGapMs starts a new session; emits
    * per-session bounds and size. Two stacked windows over the same
    * key partitioning — still one shuffle. */
  def sessionize(changelog: DataFrame): DataFrame =
    changelog
      .withColumn("gap_ms",
        col("ems") - lag(col("ems"), 1).over(keyOrder))
      .withColumn("session_id",
        sum(when(col("gap_ms").isNull || col("gap_ms") > SessionGapMs, 1L)
          .otherwise(0L)).over(keyOrder))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ems").as("start_ms"),
        max("ems").as("end_ms"),
        (max("ems") - min("ems")).as("duration_ms"))
}
