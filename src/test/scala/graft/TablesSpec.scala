package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.events` against the three ts encodings the testdata has
  * shipped with so far: parquet TIMESTAMP(NANOS) read as long
  * (nanosAsLong), TIMESTAMP(MICROS) with tz (TIMESTAMP_LTZ), and
  * TIMESTAMP(MICROS) without tz (TIMESTAMP_NTZ — the round-6 regeneration
  * that broke 54 queries). A re-encoded events.parquet must fail HERE,
  * not at 36% of the query registry.
  */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 4 events with sub-µs ns components to pin the truncation behavior.
  private val nsValues = Seq(
    1700000000000000000L, 1700000001234567891L,
    1700086400999999999L, 1700172801000000500L)

  private def writeVariants(): (String, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString
    val base = nsValues.zipWithIndex.map { case (ns, i) =>
      (i.toLong, i.toLong % 2, s"e$i", i.toDouble, """{"k":1}""", ns)
    }.toDF("event_id", "user_id", "event_type", "value", "props", "ts")

    // ns-as-long: plain long column named ts (what nanosAsLong reads back).
    val nsDir = s"$dir/ns"
    base.write.parquet(nsDir)

    // µs LTZ: truncate ns → µs, TimestampType.
    val ltzDir = s"$dir/ltz"
    base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .write.parquet(ltzDir)

    // µs NTZ: same instant rendered tz-less (session tz is UTC).
    val ntzDir = s"$dir/ntz"
    base.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      .write.parquet(ntzDir)
    (nsDir, ltzDir, ntzDir)
  }

  private def load(dir: String) = {
    // Tables.events expects <sfDir>/events.parquet
    val sf = java.nio.file.Files.createTempDirectory("graft-sf").toString
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir), java.nio.file.Paths.get(s"$sf/events.parquet"))
    Tables.events(spark, sf)
      .select($"event_id", $"ts_ns", unix_micros($"ts").as("ts_us"))
      .orderBy($"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("events loader yields identical (ts_ns trunc to µs, ts) across ns-long, µs-LTZ, µs-NTZ encodings") {
    val (nsDir, ltzDir, ntzDir) = writeVariants()
    val ns  = load(nsDir)
    val ltz = load(ltzDir)
    val ntz = load(ntzDir)

    // ts (µs) must agree exactly across all three encodings.
    assert(ns.map(r => (r._1, r._3)).toSeq === ltz.map(r => (r._1, r._3)).toSeq)
    assert(ltz === ntz)

    // ns branch keeps exact ns; µs branches carry µs-truncated ns.
    assert(ns.map(_._2).toSeq === nsValues)
    assert(ltz.map(_._2).toSeq === nsValues.map(v => v / 1000L * 1000L))

    // ts surfaces as TIMESTAMP_LTZ in every branch (window()/watermark APIs).
    val sf = java.nio.file.Files.createTempDirectory("graft-sf2").toString
    val (nsDir2, _, ntzDir2) = writeVariants()
    java.nio.file.Files.move(
      java.nio.file.Paths.get(ntzDir2), java.nio.file.Paths.get(s"$sf/events.parquet"))
    assert(Tables.events(spark, sf).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$sf/ns"))
    val sfNs = java.nio.file.Files.createTempDirectory("graft-sf3").toString
    java.nio.file.Files.move(
      java.nio.file.Paths.get(nsDir2), java.nio.file.Paths.get(s"$sfNs/events.parquet"))
    assert(Tables.events(spark, sfNs).schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("NTZ decode is session-timezone independent (no session conf mutation)") {
    val (_, _, ntzDir) = writeVariants()
    val sf = java.nio.file.Files.createTempDirectory("graft-sf-tz").toString
    java.nio.file.Files.move(
      java.nio.file.Paths.get(ntzDir), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      // a caller session NOT pinned to UTC: the decode (and the collect,
      // which is when the lazy cast actually evaluates) must still see
      // UTC-epoch micros, and the loader must not touch the conf.
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val got = Tables.events(spark, sf)
        .select($"event_id", $"ts_ns").orderBy($"event_id")
        .collect().map(_.getLong(1)).toSeq
      assert(got === nsValues.map(v => v / 1000L * 1000L))
      assert(spark.conf.get("spark.sql.session.timeZone") ===
        "America/Los_Angeles")
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
  }

  test("real testdata events loads and ts_ns is non-null, monotone-compatible with ts") {
    val ev = Tables.events(spark, TestSpark.Sf)
    val bad = ev.select(
      sum(when($"ts_ns".isNull, 1).otherwise(0)).as("nulls"),
      sum(when(expr("ts_ns div 1000") =!= unix_micros($"ts"), 1).otherwise(0)).as("mismatch"))
      .collect()(0)
    assert(bad.getLong(0) === 0L)
    assert(bad.getLong(1) === 0L)
    assert(ev.count() > 0)
  }
}
