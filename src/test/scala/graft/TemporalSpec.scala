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
}
