package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins: both sides of a
  * recurring join (base table ⋈ merged sync state) written with the
  * same bucket count on the join key join WITHOUT any exchange — the
  * shuffle is paid once at write time, then every sync pass is
  * shuffle-free on those tables. This is the storage-layout half of
  * the 100 TB design (SURVEY.md §5).
  */
object Bucketing {
  val DefaultBuckets = 8

  /** Write a DataFrame as a bucketed+sorted table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = DefaultBuckets): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner elides
    * both exchanges when bucket specs match. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, leftKey: String,
                    rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
