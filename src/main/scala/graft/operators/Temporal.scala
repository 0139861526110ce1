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

  /** Tier-transition history — attribute-level SCD-2 via the classic
    * gaps-and-islands shape (the one SQL pattern the inventory lacked):
    * each user's value TIER (log2 bucket of value_cents, the
    * value_histogram convention) changes far less often than the value
    * itself, so consecutive same-tier changes collapse into one
    * validity period with a change count — the "customer tier history"
    * a warehouse serves instead of the raw change log. Islands come
    * from the difference of two row_numbers over the SAME key
    * partition (one extra sort key, zero extra shuffles); periods then
    * take their valid_to from the next island's start via one more
    * window on the same partitioning — still ONE hash shuffle total. */
  def tierHistory(changelog: DataFrame): DataFrame = {
    val tier = when(col("value_cents") > 0,
      length(bin(col("value_cents"))).cast("long")).otherwise(lit(0L))
    val wAll = Window.partitionBy("user_id").orderBy("ems", "event_id")
    val wTier = Window.partitionBy("user_id", "tier")
      .orderBy("ems", "event_id")
    val islands = changelog
      .where(col("op") =!= "D")
      .withColumn("tier", tier)
      .withColumn("island",
        row_number().over(wAll) - row_number().over(wTier))
    val periods = islands
      .groupBy("user_id", "tier", "island")
      .agg(count(lit(1)).as("n_changes"),
        min("ems").as("valid_from_ms"),
        max("event_id").as("last_event_id"))
    val wNext = Window.partitionBy("user_id")
      .orderBy("valid_from_ms", "last_event_id")
    periods
      .withColumn("valid_to_ms", lead("valid_from_ms", 1).over(wNext))
      .select(col("user_id"), col("tier"), col("valid_from_ms"),
        col("valid_to_ms"), col("n_changes"), col("last_event_id"),
        when(col("valid_to_ms").isNull, "true").otherwise("false")
          .as("is_current"))
  }

  /** Trailing-baseline width (hours) for [[arrivalAnomaly]]. */
  val AnomalyTrailHours = 24

  /** Arrival-rate anomaly detection — the load monitor the reference's
    * SelfMonitor alert rules point at: hourly event counts against a
    * trailing 24-hour baseline, flagging hours at >2× (SPIKE) or <½
    * (QUIET) of the trailing mean; the first day is WARMUP. The hour
    * grid is DENSE (silent hours count as 0 — an outage IS the quiet
    * case that must fire) via a calendar-bounded sequence explode.
    * Aggregate-below-window: the window runs over the |hours| count
    * relation, never raw events; the series is calendar-bounded (87k
    * rows per decade), so its single partition is a bounded time
    * series, keyed by a non-foldable constant like the other bounded
    * windows in this repo. All comparisons are integer cross-products
    * (n·24 vs 2·Σ) — no division, no floats. */
  def arrivalAnomaly(changelog: DataFrame): DataFrame = {
    val counts = changelog.select(expr("ems div 3600000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
    val grid = counts.agg(min("h").as("lo"), max("h").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("h"))
    val dense = grid.join(counts, Seq("h"), "left").na.fill(0L, Seq("n"))
    val w = Window.partitionBy(pmod(col("h"), lit(1))).orderBy("h")
      .rowsBetween(-AnomalyTrailHours, -1)
    dense
      .withColumn("trail_n", coalesce(sum("n").over(w), lit(0L)))
      .withColumn("trail_cnt", count(lit(1)).over(w))
      .select(col("h"), col("n"), col("trail_n"),
        when(col("trail_cnt") < AnomalyTrailHours, "WARMUP")
          .when(col("n") * AnomalyTrailHours > col("trail_n") * 2, "SPIKE")
          .when(col("n") * AnomalyTrailHours * 2 < col("trail_n"), "QUIET")
          .otherwise("NORMAL").as("status"))
  }

  /** Session-duration quantile vector (p25/50/75/90) — the
    * engagement-dashboard number behind sessionize, in the
    * aggregate-below-window shape (the valueQuantiles rule): the
    * cumulative window runs over the DISTINCT-duration count relation,
    * never raw sessions. Lower quantile at 1-based rank ⌈n·p/100⌉. */
  def sessionQuantiles(changelog: DataFrame): DataFrame = {
    val pcts = Seq(25L, 50L, 75L, 90L)
    // non-foldable constant partition key (the topRevenueOrders trick):
    // the window runs over the tiny distinct-duration relation, but its
    // partition spec must stay DEFINED or Spark warns and plans the
    // single-partition global window
    val part = pmod(col("duration_ms"), lit(1))
    val w = Window.partitionBy(part).orderBy("duration_ms")
    val cw = Window.partitionBy(part)
    sessionize(changelog)
      .groupBy("duration_ms")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(w))
      .withColumn("cnt", sum("c").over(cw))
      .select(col("duration_ms"), col("cum"), col("cnt"),
        explode(array(pcts.map(lit): _*)).as("pct"))
      .where(col("cum") >= expr("(cnt * pct + 99) div 100"))
      .groupBy("pct")
      .agg(min("duration_ms").as("q_ms"), max("cnt").as("n_sessions"))
  }

  /** Rolling weekly engagement: per observed week, the distinct weekly
    * actives (WAU), the distinct actives of the trailing 4 weeks
    * (MAU4), and the stickiness ratio in ppm. Rolling DISTINCT can't
    * ride a plain window frame, so each (user, week) activity row fans
    * out to the ≤4 future weeks it keeps the user active in — one
    * distinct over that bounded fanout IS the rolling distinct count,
    * computed over the user-week relation (≤52·|users| rows/year),
    * never raw events. */
  def activeUsersRolling(changelog: DataFrame): DataFrame = {
    val week = expr(s"ems div ${7L * 86400L * 1000L}")
    val userWeeks = changelog
      .select(col("user_id"), week.as("week")).distinct()
    val wau = userWeeks.groupBy("week").agg(count(lit(1)).as("wau"))
    val mau = userWeeks
      .select(col("user_id"),
        explode(expr("sequence(week, week + 3)")).as("week"))
      .distinct()
      .groupBy("week").agg(count(lit(1)).as("mau4"))
    wau.join(mau, Seq("week"))
      .select(col("week"), col("wau"), col("mau4"),
        expr("(wau * 1000000) div mau4").as("stickiness_ppm"))
  }

  /** CUSUM slack: the drift allowance is mean/[[CusumSlackDiv]] (the
    * classic k ≈ δ/2 for a δ = half-mean shift target). */
  val CusumSlackDiv = 4
  /** Alarm threshold: flag when the CUSUM statistic exceeds
    * [[CusumThreshMult]]× the per-type mean daily count. */
  val CusumThreshMult = 8

  /** CUSUM changepoint detection on daily arrival rates per event
    * type — the sustained-small-shift detector arrivalAnomaly's
    * trailing-ratio rule cannot be (a 30% rate drift never trips a
    * 2×/½× gate; CUSUM accumulates it). The recursion
    * s_t = max(0, s_{t-1} + d_t) is computed in CLOSED FORM as
    * s_t = cum_t − min(0, min_{j≤t} cum_j) — two plain window
    * functions over the (type, day) grid, so the statistic is exact,
    * associative, and identical in the DuckDB oracle (a row-recursive
    * UDF could never hash-match). The baseline μ is the FIRST HALF of
    * the calendar (the in-control reference period, standard CUSUM
    * practice — a full-series mean would absorb the very shift being
    * hunted). Both directions run: d⁺ = n·1000 − (μ‰ + μ‰/4) for
    * rises, d⁻ = (μ‰ − μ‰/4) − n·1000 for drops; status flags
    * RISE/DROP when the statistic crosses 8μ‰ (at this corpus's
    * stationary rates the clean series stays OK everywhere — no false
    * alarms; detection is spec-pinned by an injected sustained 2×
    * shift). The day grid is DENSE (silent days are the drop case
    * that must fire) via a calendar-bounded sequence explode.
    * Everything is integer milli-counts; windows run per event type
    * on the ≤|types|·|days| grid, never on raw events. */
  def rateChangepoint(events: DataFrame): DataFrame = {
    val day = expr("ts_ns div 86400000000000").as("day")
    val counts = events.select(col("event_type"), day)
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val grid = counts.agg(min("day").as("lo"), max("day").as("hi"))
      .select(col("lo"), col("hi"), explode(expr("sequence(lo, hi)")).as("day"))
      .crossJoin(counts.select("event_type").distinct())
    val dense = grid.join(counts, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("n"))
    val wCum = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense
      .withColumn("mu_milli",
        expr("sum(case when day * 2 <= lo + hi then n else 0 end) " +
          "over (partition by event_type) * 1000 div " +
          "sum(case when day * 2 <= lo + hi then 1 else 0 end) " +
          "over (partition by event_type)"))
      .withColumn("d_hi",
        col("n") * 1000L - col("mu_milli")
          - expr(s"mu_milli div $CusumSlackDiv"))
      .withColumn("d_lo",
        col("mu_milli") - expr(s"mu_milli div $CusumSlackDiv")
          - col("n") * 1000L)
      .withColumn("cum_hi", sum("d_hi").over(wCum))
      .withColumn("cum_lo", sum("d_lo").over(wCum))
      .withColumn("cusum_hi_milli",
        col("cum_hi") - least(lit(0L), min("cum_hi").over(wCum)))
      .withColumn("cusum_lo_milli",
        col("cum_lo") - least(lit(0L), min("cum_lo").over(wCum)))
      .select(col("event_type"), col("day"), col("n"),
        col("cusum_hi_milli"), col("cusum_lo_milli"),
        when(col("cusum_hi_milli") > col("mu_milli") * CusumThreshMult,
          "RISE")
          .when(col("cusum_lo_milli") > col("mu_milli") * CusumThreshMult,
            "DROP")
          .otherwise("OK").as("status"))
  }

  /** [[botDetection]] thresholds: sustained rate above
    * [[BotMaxPerMinute]] events/min flags RATE; inter-event
    * coefficient-of-variation below 10% (CV² < 1/100) flags REGULAR;
    * both require [[BotMinEvents]] events so thin users stay HUMAN. */
  val BotMaxPerMinute = 20L
  val BotMinEvents = 10L

  /** Bot/automation census over user event cadence — the traffic-
    * quality gate a training-data pipeline runs before trusting
    * behavioral data (and the abuse screen a sync source runs before
    * trusting a tenant): a metronome's inter-event gaps have near-zero
    * dispersion and a scraper's sustained rate is superhuman; real
    * users are bursty. Verdicts per user — REGULAR (CV² of
    * second-granularity gaps < 1/100, tested as the exact integer
    * cross-product 100·n·Σg² < 101·(Σg)², no division, no floats),
    * RATE (n·60 > span·maxPerMin), else HUMAN — rolled up to the
    * ≤3-row census with event mass (drop-the-bots is then one
    * semi-join). At this corpus's Poisson cadence every user is HUMAN
    * (CV ≈ 1 — no false flags); detection is spec-pinned by an
    * injected metronome. One user-key shuffle; the lag and the moment
    * sums ride it; int64 bounds hold to ~10⁶ gaps·(30-day span)². */
  def botDetection(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ems", "event_id")
    changelog
      .select(col("user_id"), col("ems"), col("event_id"),
        col("epoch_s"))
      .withColumn("g", col("epoch_s") - lag("epoch_s", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        count(col("g")).as("n_gaps"),
        coalesce(sum("g"), lit(0L)).as("sum_g"),
        coalesce(sum(col("g") * col("g")), lit(0L)).as("sum_g2"),
        (max("epoch_s") - min("epoch_s")).as("span_s"))
      .select(col("n"),
        when(col("n") >= BotMinEvents && col("sum_g") > 0L &&
          col("n_gaps") * col("sum_g2") * 100L <
            col("sum_g") * col("sum_g") * 101L,
          lit("REGULAR"))
          .when(col("n") >= BotMinEvents &&
            col("n") * 60L > col("span_s") * BotMaxPerMinute,
            lit("RATE"))
          .otherwise(lit("HUMAN")).as("verdict"))
      .groupBy("verdict")
      .agg(count(lit(1)).as("n_users"), sum("n").as("n_events"))
  }

  /** Deterministic per-op service times (ms) for [[queueWaitAudit]] —
    * the apply cost model: inserts build rows, updates seek+write,
    * deletes seek. */
  val ServiceMsI = 8L
  val ServiceMsU = 5L
  val ServiceMsD = 3L

  /** Queueing-delay audit per partition worker — the Lindley
    * recursion W_n = max(0, W_{n-1} + S_{n-1} − A_n) over each
    * worker's arrival stream, answering the capacity question the
    * queue_depth counts only hint at: how long does a change WAIT
    * behind its partition's backlog under the deterministic service
    * model? Computed exactly like rate_changepoint's CUSUM — the
    * max(0,·) recursion in CLOSED FORM as cum − min(0, running-min
    * cum), two plain windows over the per-part arrival order, so the
    * whole simulation is associative and hash-matches the SQL oracle.
    * Per part: events, max and mean wait (ms), the share of events
    * that waited at all, and utilization (Σservice / span) in ppm —
    * the number that says which partition needs splitting BEFORE it
    * falls behind. One shuffle on the part key; windows ride the same
    * partition. */
  def queueWaitAudit(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy("part").orderBy("ems", "event_id")
    val wCum = w.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val svc = when(col("op") === "I", ServiceMsI)
      .when(col("op") === "U", ServiceMsU).otherwise(ServiceMsD)
    changelog
      .select(col("part"), col("ems"), col("event_id"), svc.as("s"))
      .withColumn("a", col("ems") - lag("ems", 1).over(w))
      .withColumn("d",
        when(col("a").isNull, lit(0L))
          .otherwise(lag("s", 1).over(w) - col("a")))
      .withColumn("cum", sum("d").over(wCum))
      .withColumn("wait_ms",
        col("cum") - least(lit(0L), min("cum").over(wCum)))
      .groupBy("part")
      .agg(count(lit(1)).as("n_events"),
        max("wait_ms").as("max_wait_ms"),
        expr("sum(wait_ms) div count(1)").as("mean_wait_ms"),
        sum((col("wait_ms") > 0L).cast("long")).as("n_waited"),
        sum("s").as("busy_ms"),
        (max("ems") - min("ems")).as("span_ms"))
      .select(col("part"), col("n_events"), col("max_wait_ms"),
        col("mean_wait_ms"),
        expr("n_waited * 1000000 div n_events").as("waited_ppm"),
        expr("busy_ms * 1000000 div greatest(span_ms, 1)")
          .as("utilization_ppm"))
  }

  /** Seasonal-baseline anomaly detection — the hour-of-week-aware
    * sibling of arrivalAnomaly (whose trailing-24h baseline calls
    * every Monday morning a spike if Sundays are quiet): each hour is
    * judged against the mean of ITS OWN hour-of-week slot across the
    * whole calendar (load_profile's 168-slot seasonality, applied as
    * a baseline). SPIKE at >2× the slot mean, QUIET at <½ — both
    * cross-multiplied exact integers (n·cnt vs 2·Σ), no division.
    * The hour grid is DENSE (a silent Friday noon must fire QUIET
    * even though a silent 3am is normal — that is exactly the case
    * the trailing baseline can't express). The slot baseline includes
    * the hour itself: at ≥4 weeks of calendar one hour shifts its own
    * slot mean ≤25%, and self-inclusion keeps the report one window
    * over the ≤\|hours\| grid, never a per-hour leave-one-out
    * re-scan. */
  def seasonalAnomaly(changelog: DataFrame): DataFrame = {
    val counts = changelog.select(expr("ems div 3600000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
    val grid = counts.agg(min("h").as("lo"), max("h").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("h"))
    val dense = grid.join(counts, Seq("h"), "left").na.fill(0L, Seq("n"))
    val wSlot = Window.partitionBy(pmod(col("h"), lit(168L)))
    dense
      .withColumn("slot", pmod(col("h"), lit(168L)))
      .withColumn("slot_sum", sum("n").over(wSlot))
      .withColumn("slot_cnt", count(lit(1)).over(wSlot))
      .select(col("h"), col("slot"), col("n"),
        expr("slot_sum * 1000 div slot_cnt").as("baseline_milli"),
        when(col("n") * col("slot_cnt") > col("slot_sum") * 2, "SPIKE")
          .when(col("n") * col("slot_cnt") * 2 < col("slot_sum"),
            "QUIET")
          .otherwise("NORMAL").as("status"))
  }

  /** Allowed lateness for [[lateDataAudit]] — the watermark delay a
    * streaming deployment of this changelog would configure. */
  val AllowedLatenessMs = 5000L

  /** Watermark / late-data accounting — the batch audit that sizes a
    * streaming watermark: replay each partition worker's arrival order
    * (event_id is the arrival sequence, as in arrivalMonitor), track
    * the running max event-time seen BEFORE each arrival (exactly the
    * per-partition watermark Spark's streaming engine maintains), and
    * count the events that arrive late and the events a watermark with
    * [[AllowedLatenessMs]] of slack would drop. `max_lateness_ms` is
    * the number that picks the delay; `n_dropped` is the cost of the
    * chosen one. Per-part ordered scan — the same single shuffle the
    * streaming job itself would do, no global ordering anywhere. */
  def lateDataAudit(changelog: DataFrame): DataFrame = {
    val wPrev = Window.partitionBy("part").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    changelog
      .withColumn("wm", max("ems").over(wPrev))
      .groupBy("part")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("ems") < col("wm"), 1L).otherwise(0L)).as("n_late"),
        sum(when(col("ems") < col("wm") - AllowedLatenessMs, 1L)
          .otherwise(0L)).as("n_dropped"),
        coalesce(max(when(col("ems") < col("wm"), col("wm") - col("ems"))),
          lit(0L)).as("max_lateness_ms"))
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

  /** Per-db bounce census — the engagement-quality rollup beside
    * session_quantiles: a bounce is a single-event session (the user
    * arrived and left), the metric every funnel report is normalized
    * by. Per db: sessions, bounces, bounce rate ppm, and
    * events-per-session milli. Rides [[sessionize]]'s output verbatim
    * (the session grid, one user-keyed shuffle upstream), so the
    * rollup itself is db-grid-sized. */
  def bounceRate(changelog: DataFrame): DataFrame =
    sessionize(changelog)
      .groupBy(concat(lit("db"),
        pmod(col("user_id"), lit(3L)).cast("string")).as("db"))
      .agg(count(lit(1)).as("n_sessions"),
        sum((col("n_events") === 1L).cast("long")).as("n_bounce"),
        sum("n_events").as("n_events"))
      .select(col("db"), col("n_sessions"), col("n_bounce"),
        expr("n_bounce * 1000000 div n_sessions").as("bounce_ppm"),
        expr("n_events * 1000 div n_sessions")
          .as("events_per_session_milli"))

  /** Candidate inactivity gaps for [[sessionGapSweep]] (seconds). */
  val GapSweepS: Seq[Long] = Seq(900L, 1800L, 3600L)

  /** Inactivity-gap tuning sweep — the question asked BEFORE
    * [[sessionize]]'s 30-minute constant is trusted: how do session
    * count, events-per-session, and mean duration move across
    * candidate gaps? All [[GapSweepS]] thresholds are evaluated in ONE
    * pass over ONE user-keyed window (each event's inter-arrival delta
    * is classified against every gap in the same projection), so the
    * sweep costs exactly one sessionize, not |gaps| of them. Mean
    * duration needs no per-(gap, session) grouping: a session's
    * duration is the sum of its intra-session deltas, so mean =
    * Σ(delta ≤ gap) div n_sessions — grid-sized aggregate output,
    * truncated integer arithmetic throughout. */
  def sessionGapSweep(changelog: DataFrame): DataFrame = {
    val deltas = changelog
      .withColumn("gap_ms",
        col("ems") - lag(col("ems"), 1).over(keyOrder))
    val aggs = GapSweepS.flatMap { g =>
      val newSess = col("gap_ms").isNull || col("gap_ms") > g * 1000L
      Seq(
        sum(when(newSess, 1L).otherwise(0L)).as(s"ns_$g"),
        sum(when(!newSess, col("gap_ms")).otherwise(0L)).as(s"intra_$g"))
    }
    val stackArgs = GapSweepS
      .map(g => s"${g}L, ns_$g, intra_$g").mkString(", ")
    deltas
      .agg(count(lit(1)).as("n_events"), aggs: _*)
      .select(col("n_events"),
        expr(s"stack(${GapSweepS.length}, $stackArgs)" +
          " as (gap_s, n_sessions, intra_ms)"))
      .select(col("gap_s"), col("n_sessions"),
        expr("n_events * 1000L div n_sessions")
          .as("events_per_session_milli"),
        expr("(intra_ms div n_sessions) div 1000").as("mean_duration_s"))
  }

  /** Autocorrelation lags evaluated by [[acfProfile]] (minutes). */
  val AcfLags: Seq[Int] = Seq(1, 2, 3, 5, 10)

  /** Minute width of the [[acfProfile]] arrival series (ms). */
  val AcfBucketMs: Long = 60000L

  /** Arrival-rate autocorrelation profile — the periodicity census a
    * capacity planner (and seasonal_anomaly's baseline window choice)
    * runs on the poll stream: Pearson ACF of the per-minute arrival
    * COUNT series at each [[AcfLags]] lag. The series is densified
    * (missing minutes count 0 — skipping them would splice unrelated
    * instants together and fake correlation), every lag reads the SAME
    * single ordered pass (one lead per lag in one window projection),
    * and the correlation is the exact-integer Pearson convention:
    * sufficient statistics as bigints, one final float divide per lag,
    * e6-rounded. Scale shape: the corpus-sized work is the per-minute
    * pre-aggregate (map-side combined, bucket-keyed); the window runs
    * over the DENSE SERIES whose length is the time SPAN in minutes —
    * bounded by calendar, not data volume (a year is 526k rows) — so
    * the single-partition ordering is a deliberate constant-size step,
    * exactly the k-means-centroid convention. Int64 bound: the SUMS
    * hold to ~3·10⁹ events/minute over a month; the n·Σ COMBINATIONS
    * run in decimal(38,0) — DuckDB's int128 promotion of the same
    * expressions — so the Pearson stays exact however hot the feed
    * (the discount_qty_corr lesson from the 100× amplified lane). */
  def acfProfile(changelog: DataFrame): DataFrame = {
    val counts = changelog
      .select(expr(s"ems div $AcfBucketMs").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val dense = counts
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("cnt"), lit(0L)).as("x"))
    val w = Window.orderBy("bucket")
    val withLeads = AcfLags.foldLeft(dense)((d, l) =>
      d.withColumn(s"y_$l", lead(col("x"), l).over(w)))
    val aggs = AcfLags.flatMap { l =>
      val y = col(s"y_$l")
      val has = y.isNotNull
      Seq(
        sum(when(has, 1L).otherwise(0L)).as(s"n_$l"),
        sum(when(has, col("x")).otherwise(0L)).as(s"sx_$l"),
        sum(when(has, y).otherwise(0L)).as(s"sy_$l"),
        sum(when(has, col("x") * y).otherwise(0L)).as(s"sxy_$l"),
        sum(when(has, col("x") * col("x")).otherwise(0L)).as(s"sxx_$l"),
        sum(when(has, y * y).otherwise(0L)).as(s"syy_$l"))
    }
    val stackArgs = AcfLags
      .map(l => s"${l}L, n_$l, sx_$l, sy_$l, sxy_$l, sxx_$l, syy_$l")
      .mkString(", ")
    withLeads
      .agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${AcfLags.length}, $stackArgs)" +
        " as (lag_m, n_pairs, sx, sy, sxy, sxx, syy)"))
      .select(col("lag_m"), col("n_pairs"), {
        val d38 = (c: String) => col(c).cast("decimal(38,0)")
        val vx = d38("n_pairs") * col("sxx") - d38("sx") * col("sx")
        val vy = d38("n_pairs") * col("syy") - d38("sy") * col("sy")
        val cov = d38("n_pairs") * col("sxy") - d38("sx") * col("sy")
        when(vx > 0 && vy > 0,
          round(cov.cast("double")
            / (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))
            * 1000000L).cast("long"))
          .otherwise(lit(0L)).as("acf_e6")
      })
  }

  /** Candidate allowed-lateness bounds swept by [[watermarkSweep]]
    * (ms): zero tolerance, the production [[AllowedLatenessMs]] (so
    * one arm cross-checks lateDataAudit exactly), 1 min, 5 min,
    * 15 min. */
  val WmSweepMs: Seq[Long] = Seq(0L, AllowedLatenessMs, 60000L,
    300000L, 900000L)

  /** Watermark-policy sweep — the tuning question asked BEFORE
    * [[lateDataAudit]]'s fixed allowed-lateness constant (and the
    * streaming lane's watermark) is trusted: for each candidate bound,
    * how many events would the watermark drop, and by how far does the
    * worst straggler overshoot it? Rides the SAME per-part
    * arrival-order watermark definition as lateDataAudit (max event
    * time over strictly-preceding arrivals), computes each event's
    * lateness once, and classifies it against every candidate in the
    * same projection — the sweep costs exactly one audit, not
    * |candidates| of them (the session_gap_sweep discipline). Output
    * is candidate-grid-sized; the single corpus-sized step is the
    * per-part window the audit already pays. */
  def watermarkSweep(changelog: DataFrame): DataFrame = {
    val wPrev = Window.partitionBy("part").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = changelog
      .withColumn("wm", max("ems").over(wPrev))
      .select(when(col("ems") < col("wm"), col("wm") - col("ems"))
        .otherwise(0L).as("late_ms"))
    val aggs = WmSweepMs.flatMap { d =>
      Seq(
        sum(when(col("late_ms") > d, 1L).otherwise(0L)).as(s"nd_$d"),
        coalesce(max(when(col("late_ms") > d, col("late_ms") - d)),
          lit(0L)).as(s"ov_$d"))
    }
    val stackArgs = WmSweepMs
      .map(d => s"${d}L, nd_$d, ov_$d").mkString(", ")
    late
      .agg(count(lit(1)).as("n_events"), aggs: _*)
      .select(col("n_events"),
        expr(s"stack(${WmSweepMs.length}, $stackArgs)" +
          " as (allowed_ms, n_dropped, max_overshoot_ms)"))
      .select(col("allowed_ms"), col("n_events"), col("n_dropped"),
        expr("n_dropped * 1000000L div n_events").as("drop_ppm"),
        col("max_overshoot_ms"))
  }

  /** Count window for [[fanoBurstiness]] (ms): 10 minutes. */
  val FanoWindowMs: Long = 600000L

  /** Fano-factor verdict band: within ±10% of 1.0 is Poisson-like. */
  val FanoBandE6: Long = 100000L

  /** Burstiness census per user — the count-dispersion complement of
    * [[botDetection]]'s gap-CV screen: the Fano factor (variance /
    * mean of per-[[FanoWindowMs]] event counts, ZERO windows between a
    * user's first and last activity included) is 1 for a Poisson
    * arrival process, >1 for bursty traffic, <1 for metronomes.
    * Exact integer form: with w windows spanning first..last and n
    * events, fano = (w·Σc² − n²) div (w·n) — nonneg by Cauchy-Schwarz,
    * so truncating div agrees across engines. Two map-side-combined
    * aggregates ((user, window) then user), no window function, no
    * densify step (zero windows enter only through w). Int64: Σc²
    * ≤ n·max_c — safe to ~10⁹ events/user. */
  def fanoBurstiness(changelog: DataFrame): DataFrame =
    changelog
      .select(col("user_id"), expr(s"ems div $FanoWindowMs").as("bucket"))
      .groupBy("user_id", "bucket").agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(sum("c").as("n_events"),
        sum(expr("c * c")).as("scc"),
        (max("bucket") - min("bucket") + 1L).as("n_windows"))
      .select(col("user_id"), col("n_events"), col("n_windows"),
        expr("(n_windows * scc - n_events * n_events) * 1000000L" +
          " div (n_windows * n_events)").as("fano_e6"))
      .withColumn("cadence",
        when(col("fano_e6") > 1000000L + FanoBandE6, "BURSTY")
          .when(col("fano_e6") < 1000000L - FanoBandE6, "REGULAR")
          .otherwise("POISSON_LIKE"))
}
