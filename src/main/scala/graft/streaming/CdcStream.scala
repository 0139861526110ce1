package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming form of the CDC pipeline: the reference's
  * poll-loop (`sync/DataPoller.scala:47-80`) becomes a continuous
  * source; per-key ordered apply (`sync/DataSyncer.scala`) becomes
  * keyed state with last-writer-wins; throughput accounting becomes a
  * watermarked windowed aggregation.
  *
  * At scale: state is hash-partitioned by the sync key across
  * executors (same shuffle key as the batch path); state growth is
  * bounded by the optional per-key TTL on latestState (expired keys
  * emit their final state and are evicted — a change arriving after
  * its key expired starts fresh, the usual TTL trade); checkpointing
  * gives exactly-once sinks.
  */
object CdcStream {
  /** One normalized change (streaming twin of ChangeLog.normalize). */
  case class Change(user_id: Long, event_id: Long, ems: Long,
                    op: String, value_cents: Long)

  /** Materialized per-key state after last-writer-wins. */
  case class KeyState(user_id: Long, last_event_id: Long, last_ems: Long,
                      last_op: String, last_value_cents: Long)

  /** LWW change order, the ONE definition every path shares
    * (matches CdcMerge.lastPerKey's struct ordering): (ems, event_id). */
  private def later(aE: Long, aI: Long, bE: Long, bI: Long): Boolean =
    aE > bE || (aE == bE && aI > bI)

  /** Latest change of a micro-batch slice. */
  private def latestOf(batch: Iterator[Change]): Option[Change] =
    batch.reduceOption { (a, b) =>
      if (later(b.ems, b.event_id, a.ems, a.event_id)) b else a
    }

  /** Fold one batch's latest change into the stored state; None when
    * nothing advanced. */
  private def advance(uid: Long, stored: Option[KeyState],
                      incoming: Option[Change]): Option[KeyState] =
    incoming.collect {
      case c if stored.forall(s => later(c.ems, c.event_id, s.last_ems, s.last_event_id)) =>
        KeyState(uid, c.event_id, c.ems, c.op, c.value_cents)
    }

  /** Continuous last-writer-wins: mapGroupsWithState keyed on the sync
    * key; each micro-batch folds its changes into the running maximum
    * by (ems, event_id). Emits the (possibly unchanged) state per key
    * per batch. `stateTtl` evicts keys idle longer than the duration
    * (processing time) — the state-bound for unbounded key spaces.
    */
  def latestState(spark: SparkSession, changes: Dataset[Change],
                  stateTtl: Option[java.time.Duration] = None): Dataset[KeyState] = {
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    changes
      .groupByKey(_.user_id)
      .mapGroupsWithState[KeyState, KeyState](timeoutConf) {
        (uid: Long, batch: Iterator[Change], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove() // evict; final state flows out once more
            last
          } else {
            val merged = advance(uid, state.getOption, latestOf(batch))
              .orElse(state.getOption)
              .getOrElse(KeyState(uid, -1L, -1L, "?", 0L)) // unreachable: group has rows
            state.update(merged)
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            merged
          }
      }
  }

  /** Watermarked tumbling-window throughput (streaming twin of the
    * batch `stream_window_agg` query — same hour_s/event_type/n/
    * sum_cents schema). */
  def windowedThroughput(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value_cents").as("sum_cents"))
      .select(unix_timestamp(col("window.start")).as("hour_s"),
        col("event_type"), col("n"), col("sum_cents"))

  /** Change-feed variant: flatMapGroupsWithState emitting a key's state
    * ONLY in micro-batches where it actually advanced — downstream
    * consumers see a delta stream, not a state dump. Same keyed-state
    * shuffle as latestState. */
  def changedStates(spark: SparkSession, changes: Dataset[Change]): Dataset[KeyState] = {
    import spark.implicits._
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[KeyState, KeyState](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Change], state: GroupState[KeyState]) =>
          advance(uid, state.getOption, latestOf(batch)) match {
            case Some(ns) =>
              state.update(ns)
              Iterator.single(ns)
            case None => Iterator.empty // stale or duplicate delivery
          }
      }
  }

  /** Exactly-once ingestion guard: drop redundant deliveries of the
    * same change id within the watermark horizon (the streaming analog
    * of the reference's sync_polled dedup table —
    * `dbopt/PgOperation.scala:27-46`). State is bounded by the
    * watermark; the dedup key is the shuffle key. */
  def dedupDeliveries(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming training-data ingestion — the arrival path of the
    * LLM-pipeline operators run continuously: quality-gate each
    * arriving document (same rules as TextAnalysis.qualityFilter),
    * then drop exact duplicates by normalized content fingerprint
    * within the watermark horizon (dedup state is bounded — an
    * always-growing fingerprint set would OOM a year-long stream; the
    * batch dedup_exact backstops beyond the horizon). The fingerprint
    * is the dedup/shuffle key. Expects (ts, doc_id, text). */
  def ingestDocuments(docs: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis
    docs
      .where(TextAnalysis.keepCol)
      .select(col("ts"), col("doc_id"),
        md5(TextAnalysis.normCol.cast("binary")).as("fp"))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("fp")
  }

  /** A change carrying its event-time column (watermarkable twin of
    * [[Change]] — ts = timestamp_millis(ems)). */
  case class ChangeTs(user_id: Long, event_id: Long, ems: Long,
                      op: String, value_cents: Long,
                      ts: java.sql.Timestamp)

  /** One closed session — matches Temporal.sessionize's row shape. */
  case class Session(user_id: Long, session_id: Long, n_events: Long,
                     start_ms: Long, end_ms: Long, duration_ms: Long)

  /** Open-session state: 1-based session counter + the open window. */
  case class SessionState(seq: Long, n: Long, startMs: Long, endMs: Long)

  /** Event-time TTL on the closed-session (n=0) counter marker: a key
    * idle this long past its last session close is fully evicted, so
    * state stays bounded by ACTIVE key cardinality, not lifetime key
    * cardinality. A key returning after eviction restarts session
    * numbering at 1 — the documented trade for bounded state. */
  val MarkerTtlMs: Long = 7L * 24 * 3600 * 1000

  /** Streaming sessionization — the continuous twin of
    * Temporal.sessionize (same gap rule, same 1-based session ids):
    * flatMapGroupsWithState keyed on the sync key holds ONE open
    * session per key; a session closes when a later event arrives past
    * the gap, or when the event-time WATERMARK passes end+gap (the
    * EventTimeTimeout — so sessions of idle keys still close, bounded
    * by event time, not wall clock). Closed sessions stream out
    * append-only; state per key is four longs regardless of history.
    * Disorder contract: in-batch disorder is fully absorbed (each
    * micro-batch slice sorts on the LWW order before folding); a
    * CROSS-batch late event still inside the watermark merges into
    * the key's open session with correct min/max bounds, but a split
    * the batch operator would have placed between it and the open
    * session is not revisited — exact split parity holds for feeds
    * ordered across batches per key (the spec's replay); beyond the
    * watermark, events are dropped by the watermark contract. */
  def sessionizeStream(spark: SparkSession,
                       changes: Dataset[ChangeTs]): Dataset[Session] = {
    import spark.implicits._
    val gap = graft.operators.Temporal.SessionGapMs
    changes
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[ChangeTs], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.n == 0) {
              // second firing: the n=0 counter marker's TTL expired —
              // evict. The key's next event restarts numbering at 1.
              state.remove()
              Iterator.empty
            } else {
              // close the open session but keep the counter in an n=0
              // "no open session" marker (removing it here would
              // restart numbering for a promptly-returning key); the
              // marker itself is TTL'd so long-idle keys don't leak
              state.update(s.copy(n = 0))
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + MarkerTtlMs)
              Iterator.single(
                Session(uid, s.seq, s.n, s.startMs, s.endMs, s.endMs - s.startMs))
            }
          } else {
            val evs = batch.toSeq.sortBy(c => (c.ems, c.event_id))
            val closed = scala.collection.mutable.ListBuffer.empty[Session]
            var st = state.getOption
            evs.foreach { e =>
              st = st match {
                case Some(s) if s.n > 0 && e.ems - s.endMs <= gap =>
                  // a cross-batch late arrival (negative delta inside
                  // the watermark) extends the bounds downward too
                  Some(s.copy(n = s.n + 1,
                    startMs = math.min(s.startMs, e.ems),
                    endMs = math.max(s.endMs, e.ems)))
                case Some(s) =>
                  if (s.n > 0)
                    closed += Session(uid, s.seq, s.n, s.startMs, s.endMs,
                      s.endMs - s.startMs)
                  Some(SessionState(s.seq + 1, 1, e.ems, e.ems))
                case None =>
                  Some(SessionState(1, 1, e.ems, e.ems))
              }
            }
            st.foreach { s =>
              state.update(s)
              // clamp to just past the CURRENT watermark: Spark admits
              // rows against the previous batch's watermark but
              // validates timeout timestamps against the new one, so
              // after a large watermark jump an honest endMs+gap can
              // land in the past and would throw, killing the query —
              // the clamped session simply times out next batch
              if (s.n > 0)
                state.setTimeoutTimestamp(
                  math.max(s.endMs + gap, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** Adaptive poll backoff — the exact wait-time policy of
    * `/root/reference/.../sync/DataPoller.scala:60-74`: sleep
    * `(batch - polled)/batch · maxPollWait` ms after each poll (full
    * batch ⇒ 0, poll again immediately; empty poll ⇒ full backoff).
    * Integer arithmetic so the streaming trigger, the Ledger
    * poll_backoff query and the DuckDB oracle agree bit-for-bit. */
  def backoffMs(polled: Long, batch: Long, maxPollWaitMs: Long): Long = {
    require(batch > 0, "batch must be > 0")
    (batch - math.min(polled, batch)) * maxPollWaitMs / batch
  }

  /** Wire a changes stream through latestState into an in-memory sink
    * (used by tests; a production run would writeStream to a table with
    * a checkpoint location). */
  def runToMemory(spark: SparkSession, changes: Dataset[Change],
                  queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    latestState(spark, changes).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()

  private val parityRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Shared replay scaffolding for the parity harnesses: feed the
    * micro-batches through `pipe` into a uniquely-named memory sink,
    * drain each batch, and return the sink contents eagerly
    * checkpointed (so they outlive the dropped temp view). The
    * driver-side batches are the micro-batch SOURCE of a bounded
    * replay, never a processing step — the piped computation runs
    * distributed. */
  private def replay[T](spark: SparkSession, batches: Seq[Seq[T]],
      mode: OutputMode)(pipe: Dataset[T] => DataFrame)(
      implicit enc: org.apache.spark.sql.Encoder[T]): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val name = s"parity_${parityRuns.incrementAndGet()}"
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T]
    val query = pipe(stream.toDS()).writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try batches.foreach { b =>
      stream.addData(b)
      query.processAllAvailable()
    } finally query.stop()
    val result = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    result
  }

  /** `rows` split into ≤ n contiguous chunks. */
  private def chunked[T](rows: Array[T], n: Int): Seq[Seq[T]] =
    rows.grouped(math.max(1,
      math.ceil(rows.length.toDouble / n).toInt)).map(_.toSeq).toSeq

  /** Streaming↔batch sessionization parity harness — [[mergeParity]]'s
    * twin for [[sessionizeStream]]: replays the changelog as `nBatches`
    * CONTIGUOUS event-time chunks (the sessionizer's cross-batch
    * contract is exact parity for per-key-ordered feeds), then a
    * far-future sentinel event per key — the sentinel's arrival closes
    * every key's open real session through the DATA path in that same
    * batch (no timeout needed); the sentinel's own 1-event session
    * never closes (its timeout sits past the final watermark) so only
    * real sessions reach the sink, with the start_ms filter as an
    * explicit guard. Emits exactly the batch `sessionize` row shape,
    * pinned by the same oracle SQL. */
  def sessionizeParity(spark: SparkSession, changelog: DataFrame,
                       nBatches: Int = 3): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = changelog
      .select(col("user_id"), col("event_id"), col("ems"), col("op"),
        col("value_cents"), timestamp_millis(col("ems")).as("ts"))
      .as[ChangeTs].collect().sortBy(c => (c.ems, c.event_id))
    if (rows.isEmpty) // empty feed: empty sessions, don't throw on max
      return changelog.sparkSession.emptyDataFrame
        .select(lit(0L).as("user_id"), lit(0L).as("session_id"),
          lit(0L).as("n_events"), lit(0L).as("start_ms"),
          lit(0L).as("end_ms"), lit(0L).as("duration_ms"))
    val sentinelMs = rows.map(_.ems).max + 10L * 24 * 3600 * 1000
    val sentinels = rows.map(_.user_id).distinct.map(u =>
      ChangeTs(u, 9999999L, sentinelMs, "U", 0L,
        new java.sql.Timestamp(sentinelMs))).toSeq
    replay(spark, chunked(rows, nBatches) :+ sentinels,
        OutputMode.Append())(ds => sessionizeStream(spark, ds).toDF())
      .where(col("start_ms") < sentinelMs) // guard: sentinel sessions
      .select("user_id", "session_id", "n_events", "start_ms", "end_ms",
        "duration_ms")
  }

  /** Exactly-once parity harness for [[dedupDeliveries]]: every event
    * is delivered TWICE (two full at-least-once passes in separate
    * micro-batches); the surviving stream must be each event exactly
    * once — second copies inside the watermark horizon are deduped by
    * state, those behind the watermark are dropped as late, and either
    * way the output hash-equals the oracle's plain `SELECT event_id`.
    * Catches both failure modes (a dropped first delivery or a leaked
    * duplicate) cross-engine. */
  def dedupParity(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = events.select(col("event_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)].collect().toSeq
    replay(spark, Seq(rows, rows), OutputMode.Append())(
        ds => dedupDeliveries(ds.toDF("event_id", "ts")))
      .select(col("event_id"))
  }

  /** Streaming↔batch windowed-aggregation parity harness: replays the
    * events through [[windowedThroughput]] as `nBatches` arbitrary
    * micro-batches in Complete output mode (state is never evicted, so
    * late chunks still land in their window) — the final sink table IS
    * the full windowed aggregate and must hash-equal the batch
    * `stream_window_agg` oracle. */
  def windowParity(spark: SparkSession, events: DataFrame,
                   nBatches: Int = 3): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = events.select(col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .as[(java.sql.Timestamp, String, Long)].collect()
    replay(spark, chunked(rows, nBatches), OutputMode.Complete())(
      ds => windowedThroughput(ds.toDF("ts", "event_type", "value_cents")))
  }

  /** Streaming↔batch LWW parity harness (batch-facing): replays the
    * normalized changelog through [[latestState]] as `nBatches`
    * micro-batches split on `event_id % nBatches` — an interleave, so
    * nearly every key's history straddles batch boundaries — and
    * returns the final keyed state through EXACTLY the cdc_merge
    * projection (deletes dropped, epoch_s = ems div 1000), so the
    * batch query's DuckDB oracle pins the continuous path cross-engine.
    *
    * This is a harness, not a pipeline operator: the driver-side
    * collect/addData loop is the micro-batch *source* (the bounded
    * replay StreamRun stages through files), never a processing step —
    * the state fold itself runs distributed, keyed on user_id like the
    * batch merge's shuffle. */
  def mergeParity(spark: SparkSession, changelog: DataFrame,
                  nBatches: Int = 3): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = changelog
      .select("user_id", "event_id", "ems", "op", "value_cents")
      .as[Change].collect()
    val batches = (0 until nBatches).map(i => rows.filter(c =>
      math.floorMod(c.event_id, nBatches.toLong) == i.toLong).toSeq)
    // Update-mode memory sink appends each batch's emissions — the
    // final state per key is the LWW max, same struct order as batch
    replay(spark, batches, OutputMode.Update())(
        ds => latestState(spark, ds).toDF())
      .groupBy("user_id")
      .agg(max(struct(col("last_ems"), col("last_event_id"),
        col("last_op"), col("last_value_cents"))).as("s"))
      .where(col("s.last_op") =!= "D")
      .select(col("user_id"),
        col("s.last_event_id").as("last_event_id"),
        col("s.last_op").as("last_op"),
        expr("s.last_ems div 1000").as("last_epoch_s"),
        col("s.last_value_cents").as("last_value_cents"))
  }
}
