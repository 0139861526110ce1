package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet-backed table loaders (TESTDATA.md tables). Single place that
  * touches storage so column pruning / filter pushdown stay auditable:
  * every operator selects columns immediately after these reads, which
  * Catalyst pushes into the parquet scan (`ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses by default. Read it as an exact ns-since-epoch long
    * (legacy.parquet.nanosAsLong) and surface BOTH `ts_ns` (exact, for
    * ordering/arithmetic) and `ts` (µs-truncated TimestampType, for
    * window()/streaming APIs).
    *
    * NOTE: this sets nanosAsLong on the SESSION (there is no per-read
    * option for it) — a deliberate global: after the first events()
    * call, any other parquet nanos column in the session also reads as
    * long. All engine reads go through this object, so the flag is
    * uniform by construction.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    val base = Seq(col("event_id"), col("user_id"), col("event_type"),
      col("value"), col("props"))
    raw.schema("ts").dataType match {
      case LongType =>
        // integer div: ns values overflow double's exact range, so no `/`
        raw.select(base :+ col("ts").as("ts_ns")
          :+ timestamp_micros(expr("ts div 1000")).as("ts"): _*)
      case TimestampNTZType =>
        // NTZ wall time IS UTC in the testdata. An NTZ→LTZ cast would
        // read the SESSION tz (and mutating the session conf here would
        // silently change every other query of an external caller), so
        // convert with tz-free local arithmetic instead: µs since the
        // NTZ epoch literal — identical under any session time zone.
        val us = expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        raw.select(base :+ (us * 1000L).as("ts_ns")
          :+ timestamp_micros(us).as("ts"): _*)
      case _ =>
        raw.select(base :+ (unix_micros(col("ts")) * 1000L).as("ts_ns")
          :+ col("ts"): _*)
    }
  }
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
