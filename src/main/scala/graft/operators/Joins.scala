package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks natively, composed scale-safely:
  *
  *  - As-of join: each left row picks the latest right row with
  *    t_right <= t_left per key. Implemented with the union+window
  *    trick (tag sides, sort (t, side), running last_value of the
  *    right payload) — ONE hash shuffle on the key, no inequality
  *    join, no per-row probe. A custom LogicalPlan/Strategy isn't
  *    needed; this plan is already the one a custom operator would
  *    produce.
  *  - Range join: right rows match a [t, t+window) interval. A naive
  *    inequality join is a BroadcastNestedLoop at any size; instead
  *    both sides are bucketed into time bands, the interval side
  *    explodes into its covered bands, and the join is an equi-join on
  *    (key, band) with the exact range predicate as a residual filter.
  */
object Joins {
  /** One day in ms — the range-join band width. */
  val BandMs = 86400000L

  /** Range-join window: events within 7 days after an order. */
  val RangeWindowMs: Long = 7L * BandMs

  /** Orders reduced to unique (custkey, epoch-ms) points: cents of the
    * highest orderkey on ties — deterministic on both engines. */
  def orderPoints(orders: DataFrame): DataFrame =
    orders
      .select(
        col("o_custkey"),
        // o_orderdate is parquet TIMESTAMP_NTZ; session tz is UTC, so
        // the cast matches DuckDB's naive epoch_ms exactly
        unix_millis(col("o_orderdate").cast("timestamp")).as("t"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      .groupBy("o_custkey", "t")
      .agg(max_by(col("price_cents"), col("o_orderkey")).as("price_cents"))

  /** As-of enrichment: each change annotated with the customer's most
    * recent order (by event time). */
  def asofEnrich(changelog: DataFrame, orders: DataFrame): DataFrame = {
    val left = changelog.select(
      col("user_id").as("key"), col("ems").as("t"),
      col("event_id"), lit(null).cast("long").as("price_cents"),
      lit(1).as("side"))
    val right = orderPoints(orders).select(
      col("o_custkey").as("key"), col("t"),
      lit(null).cast("long").as("event_id"), col("price_cents"),
      lit(0).as("side"))
    val w = Window.partitionBy("key")
      .orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("last_order_cents",
        last(col("price_cents"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("event_id"), col("key").as("user_id"), col("t").as("ems"),
        col("last_order_cents"))
  }

  /** One day in ms — the [[pitSnapshot]] probe cadence. */
  val DayMs = 86400000L

  /** Point-in-time daily snapshots — the temporal (SCD-2) join a
    * feature store runs to build leakage-free training tables: for
    * every (user, end-of-day) probe, the dimension VERSION that was
    * valid at that instant, where "valid" honors delete tombstones (a
    * plain as-of join would leak the pre-delete version into the gap
    * between a delete and the next insert — here that gap reports
    * DELETED; a user not yet seen reports NONE).
    *
    * Same scale shape as [[asofEnrich]]: tag both sides, ONE hash
    * shuffle on the key, a running `last` of the version struct over
    * (t, side, event_id) — no inequality join, no per-row probe. The
    * probe grid is |users| × |days| — exactly the snapshot table being
    * produced, with the day list broadcast. Version rows carry
    * op/id/cents as one struct so the carried fields can never come
    * from different rows. */
  def pitSnapshot(changelog: DataFrame): DataFrame = {
    val vStruct = "struct<op:string,event_id:bigint,value_cents:bigint>"
    val days = changelog.select(expr(s"ems div $DayMs").as("day")).distinct()
    val facts = changelog.select(col("user_id")).distinct()
      .crossJoin(broadcast(days))
      .select(col("user_id").as("key"),
        ((col("day") + 1) * DayMs - 1).as("t"), // end-of-day probe
        col("day"),
        lit(null).cast(vStruct).as("v"),
        lit(1).as("side"))
    val versions = changelog.select(
      col("user_id").as("key"), col("ems").as("t"),
      lit(null).cast("long").as("day"),
      struct(col("op"), col("event_id"), col("value_cents")).as("v"),
      lit(0).as("side"))
    val w = Window.partitionBy("key")
      .orderBy(col("t"), col("side"), col("v.event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versions.unionByName(facts)
      .withColumn("lv", last(col("v"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("key").as("user_id"), col("day"),
        when(col("lv").isNotNull && col("lv.op") =!= "D",
          col("lv.event_id")).as("v_event_id"),
        when(col("lv").isNotNull && col("lv.op") =!= "D",
          col("lv.value_cents")).as("v_value_cents"),
        when(col("lv").isNull, "NONE")
          .when(col("lv.op") === "D", "DELETED")
          .otherwise("LIVE").as("version_state"))
  }

  /** Bucketed range join: events within [order time, order time + 7d)
    * per customer, counted per order. The order side explodes into its
    * covered day-bands (7 for band-aligned order dates, 8 in the
    * general unaligned case), the event side buckets into one band —
    * the join is a plain equi-join on (key, band). */
  def rangeJoinEvents(changelog: DataFrame, orders: DataFrame): DataFrame = {
    val o = orders.select(
      col("o_orderkey"), col("o_custkey"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("o_ems"))
      .withColumn("band", explode(expr(
        s"sequence(o_ems div $BandMs, (o_ems + $RangeWindowMs - 1) div $BandMs)")))
    val e = changelog.select(
      col("user_id"), col("ems"), col("event_id"),
      expr(s"ems div $BandMs").as("band"))
    o.join(e,
        o("o_custkey") === e("user_id") && o("band") === e("band") &&
          e("ems") >= o("o_ems") && e("ems") < o("o_ems") + RangeWindowMs,
        "left")
      .groupBy("o_orderkey")
      .agg(count(col("event_id")).as("n_events_7d"))
  }

  /** Salt factor for the skew-safe enrichment join. */
  val SaltR = 8

  /** Skew-safe enrichment join + rollup: the changelog's key
    * distribution is whatever the workload makes it (one viral user can
    * be 50% of all events), and a shuffled equi-join would pile that
    * key onto ONE reducer. Salting spreads it: the fact side gets a
    * deterministic salt in [0, SaltR), the dim side replicates SaltR
    * ways, and the join key becomes (key, salt) — a hot key now lands
    * on SaltR reducers. Result is provably identical to the unsalted
    * join (the oracle IS the plain join), and the dim-side blowup is
    * bounded at SaltR×|dim|, the standard trade when the dim is too big
    * to broadcast and the fact is skewed. (AQE's skew-join split only
    * rescues sort-merge joins after the fact; explicit salting also
    * covers the aggregate that follows.) */
  def skewSaltedEnrich(changelog: DataFrame,
                       customer: DataFrame): DataFrame = {
    val fact = changelog.select(
      col("user_id"), col("value_cents"),
      // coalesce: a NULL event_id must not NULL the salt and silently
      // drop the row from the inner join — salting has to be
      // result-neutral for ANY input, matching the unsalted oracle
      coalesce(pmod(col("event_id"), lit(SaltR.toLong)), lit(0L)).as("salt"))
    val dim = customer
      .select(col("c_custkey"), col("c_mktsegment"),
        explode(expr(s"sequence(0, ${SaltR - 1})")).as("salt"))
    fact
      .join(dim, fact("user_id") === dim("c_custkey") &&
        fact("salt") === dim("salt"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum("value_cents").as("sum_cents"))
  }
}
