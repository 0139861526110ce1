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
