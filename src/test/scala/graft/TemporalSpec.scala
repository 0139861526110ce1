package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ChangeLog, Temporal}

class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cl = ChangeLog.normalize(Tables.events(spark, TestSpark.Sf)).cache()

  test("scd2 intervals tile the timeline: next valid_from == prev valid_to per key") {
    val h = Temporal.scd2History(cl).collect()
      .groupBy(_.getAs[Long]("user_id"))
    h.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("valid_from_ms"))
      // at most one open (current) interval per key
      assert(sorted.count(_.getAs[String]("is_current") == "true") <= 1)
      sorted.foreach { r =>
        val to = r.getAs[java.lang.Long]("valid_to_ms")
        if (to != null) assert(to >= r.getAs[Long]("valid_from_ms"))
      }
    }
  }

  test("event gaps are nonnegative and count n_events - n_users") {
    val g = Temporal.eventGaps(cl)
    assert(g.where(col("gap_ms") < 0).count() === 0)
    val users = cl.select("user_id").distinct().count()
    assert(g.count() === cl.count() - users)
  }

  test("sessions: every gap inside a session is <= threshold, sessions cover all events") {
    val s = Temporal.sessionize(cl)
    assert(s.agg(sum("n_events")).collect().head.getLong(0) === cl.count())
    // brute: recompute sessions per user and compare counts
    val byUser = cl.select("user_id", "ems").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val expected = byUser.map { case (u, rows) =>
      val ts = rows.map(_._2).sorted
      val breaks = ts.zip(ts.drop(1)).count { case (a, b) => b - a > Temporal.SessionGapMs }
      u -> (breaks + 1).toLong
    }
    val got = s.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("user_profile: session count equals sessionize's sessions per user") {
    val cl = ChangeLog.normalize(Tables.events(spark, TestSpark.Sf))
    val prof = Temporal.userProfile(cl).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val sess = Temporal.sessionize(cl).groupBy("user_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    assert(prof.keySet === sess.keySet)
    prof.foreach { case (u, r) =>
      assert(r.getAs[Long]("n_sessions") === sess(u))
      assert(r.getAs[Long]("first_ms") <= r.getAs[Long]("last_ms"))
    }
    assert(prof.values.map(_.getAs[Long]("n_events")).sum === cl.count())
  }

  test("arrival_monitor: the generated changelog arrives in order") {
    val cl = ChangeLog.normalize(Tables.events(spark, TestSpark.Sf))
    val am = Temporal.arrivalMonitor(cl).collect()
    assert(am.map(_.getAs[Long]("n_events")).sum === cl.count())
    am.foreach { r =>
      // event ids were assigned in event-time order in the generator, so
      // id-order apply is time-ordered — the monitor must prove that
      assert(r.getAs[Long]("n_inversions") === 0L)
      assert(r.getAs[Long]("min_gap_ms") >= 0L)
      assert(r.getAs[Long]("min_gap_ms") <= r.getAs[Long]("mean_gap_ms"))
      assert(r.getAs[Long]("mean_gap_ms") <= r.getAs[Long]("max_gap_ms"))
    }
  }

  test("session_quantiles brackets the session-duration distribution") {
    val q = Temporal.sessionQuantiles(cl).collect()
      .map(r => r.getAs[Long]("pct") -> r.getAs[Long]("q_ms")).toMap
    assert(q.keySet === Set(25L, 50L, 75L, 90L))
    assert(q(25L) <= q(50L) && q(50L) <= q(75L) && q(75L) <= q(90L))
    // the reported quantiles are actual durations, and the p90 bounds
    // at least 90% of sessions from above
    val durations = Temporal.sessionize(cl).collect()
      .map(_.getAs[Long]("duration_ms")).sorted
    assert(q.values.toSet.subsetOf(durations.toSet))
    assert(durations.count(_ <= q(90L)) * 100 >= durations.length * 90)
  }

  test("active_users: week-0 stickiness math and WAU<=MAU4") {
    val au = Temporal.activeUsersRolling(cl).collect()
      .map(r => r.getAs[Long]("week") -> r).toMap
    au.values.foreach { r =>
      assert(r.getAs[Long]("wau") <= r.getAs[Long]("mau4"))
      assert(r.getAs[Long]("stickiness_ppm") <= 1000000L)
    }
    // the first observed week's MAU4 is exactly its WAU (no history)
    val firstWeek = au.keys.min
    assert(au(firstWeek).getAs[Long]("wau")
      === au(firstWeek).getAs[Long]("mau4"))
  }

  test("arrival_monitor counts a planted inversion") {
    import spark.implicits._
    // one key, event 2 carries an EARLIER time than event 1
    val df = Seq(
      (1L, 7L, "U", 1000L, 1L, 100L, 7L % 16),
      (2L, 7L, "U", 500L, 0L, 100L, 7L % 16),
      (3L, 7L, "U", 2000L, 2L, 100L, 7L % 16))
      .toDF("event_id", "user_id", "op", "ems", "epoch_s", "value_cents",
        "part")
    val r = Temporal.arrivalMonitor(df).collect().head
    assert(r.getAs[Long]("n_inversions") === 1L)
    assert(r.getAs[Long]("min_gap_ms") === -500L)
  }

  test("tier_history: conserves changes, adjacent periods differ in " +
    "tier, intervals chain exactly") {
    val rows = Temporal.tierHistory(cl).collect()
      .groupBy(_.getAs[Long]("user_id"))
    val nonD = cl.where(col("op") =!= "D").count()
    assert(rows.values.flatten.map(_.getAs[Long]("n_changes")).sum === nonD)
    rows.foreach { case (_, ps) =>
      val sorted = ps.sortBy(_.getAs[Long]("valid_from_ms"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // no two adjacent periods share a tier (compaction is maximal)
          assert(a.getAs[Long]("tier") !== b.getAs[Long]("tier"))
          // intervals chain: this period ends where the next begins
          assert(a.getAs[Long]("valid_to_ms") ===
            b.getAs[Long]("valid_from_ms"))
        case _ => ()
      }
      assert(sorted.last.getAs[String]("is_current") === "true")
      assert(sorted.init.forall(_.getAs[String]("is_current") == "false"))
    }
  }

  test("arrival_anomaly: dense calendar grid, status matches the " +
    "integer thresholds row by row") {
    val rows = Temporal.arrivalAnomaly(cl).collect().sortBy(_.getLong(0))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(0) === a.getLong(0) + 1) // no calendar gaps
    }
    val t = Temporal.AnomalyTrailHours
    rows.zipWithIndex.foreach { case (r, i) =>
      val (n, trail) = (r.getAs[Long]("n"), r.getAs[Long]("trail_n"))
      val want =
        if (i < t) "WARMUP"
        else if (n * t > trail * 2) "SPIKE"
        else if (n * t * 2 < trail) "QUIET"
        else "NORMAL"
      assert(r.getAs[String]("status") === want, s"hour index $i")
    }
    val states = rows.map(_.getAs[String]("status")).toSet
    assert(states.contains("WARMUP") && states.contains("NORMAL"))
  }

  test("bounce_rate: per-db counts reconcile with sessionize's grid " +
    "and the ratios are grid-exact") {
    val sess = Temporal.sessionize(cl)
      .select(col("user_id"), col("n_events")).collect()
      .map(r => (r.getLong(0) % 3, r.getLong(1)))
    val rows = Temporal.bounceRate(cl).collect()
      .map(r => r.getAs[String]("db") -> r).toMap
    assert(rows.keySet === sess.map(s => s"db${s._1}").toSet)
    sess.groupBy(_._1).foreach { case (d, ss) =>
      val r = rows(s"db$d")
      val n = ss.length.toLong
      val b = ss.count(_._2 == 1L).toLong
      val ev = ss.map(_._2).sum
      assert(r.getAs[Long]("n_sessions") === n, s"db$d")
      assert(r.getAs[Long]("n_bounce") === b, s"db$d")
      assert(r.getAs[Long]("bounce_ppm") === b * 1000000L / n, s"db$d")
      assert(r.getAs[Long]("events_per_session_milli") ===
        ev * 1000L / n, s"db$d")
    }
  }
}
