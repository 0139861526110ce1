package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-headroom probe: amplifies the test corpus k× with
  * STRUCTURE-PRESERVING copies (ids offset per copy; document texts get
  * a copy-specific token so shingle sets differ and no cross-copy
  * duplicates appear; event keys/ids offset so key cardinality scales
  * with volume) and times representative operators at 1× and k×.
  *
  * This is the "would the plan survive a 10× scale-up" experiment run
  * as a reproducible main instead of an ad-hoc commit note: a healthy
  * operator's wall time grows ≲ k× (modulo fixed costs); a
  * super-linear ratio flags a plan whose cost is NOT linear in rows —
  * exactly the regression class the sf-bound bench can't see.
  *
  * Usage: runMain graft.ScaleProbe [sfDir] [k] [workDir] [partitions]
  * Prints one JSON line: per-op seconds at 1× and k×, and the ratio.
  * `partitions` defaults to SPARK_GRAFT_CPUS — pass k·cpus to model a
  * cluster whose partition count scales with the data (the SURVEY §5
  * contract), vs the default which deliberately holds partitions fixed
  * and exposes spill.
  */
object ScaleProbe {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** k structure-preserving copies of documents: doc_id offset by
    * copy·10⁹; EVERY token carries a copy suffix, so the copies'
    * shingle sets are fully disjoint (cross-copy Jaccard = 0) and the
    * dup DENSITY stays exactly that of the base corpus while volume
    * scales k×. (A first cut appended one tag token per doc — that
    * left ~96% shingle overlap across copies, silently turning the
    * whole corpus into k-wide near-dup groups and inflating candidate
    * pairs k² — measured as a phantom 1.4× super-linearity.) */
  def amplifyDocuments(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
        explode(expr(s"sequence(0, ${k - 1})")).as("cp"))
      .select(
        (col("doc_id") + col("cp").cast("long") * 1000000000L).as("doc_id"),
        expr("array_join(transform(split(text, ' '), " +
          "t -> concat(t, '_', cast(cp as string))), ' ')").as("text"),
        col("lang"), col("source"))

  /** k copies of events: event_id/user_id offset per copy (key space
    * scales with volume, per-key history length is preserved), ems
    * jittered by the copy index so no two copies collide on the LWW
    * order. */
  def amplifyEvents(events: DataFrame, k: Int): DataFrame =
    events.withColumn("cp", explode(expr(s"sequence(0, ${k - 1})")))
      .select(
        (col("event_id") + col("cp").cast("long") * 1000000000L)
          .as("event_id"),
        (col("user_id") + col("cp").cast("long") * 1000000000L)
          .as("user_id"),
        col("event_type"), col("value"), col("props"),
        (col("ts_ns") + col("cp").cast("long")).as("ts_ns"),
        col("ts"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val workDir = args.lift(2).getOrElse("/tmp/graft_scaleprobe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val partitions = args.lift(3).getOrElse(cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize both scales to parquet so the probe times the
    // operators, not the amplification
    val docs1 = Tables.documents(spark, sfDir)
    amplifyDocuments(docs1, k).write.mode("overwrite")
      .parquet(s"$workDir/documents_x$k")
    val ev1 = Tables.events(spark, sfDir)
    amplifyEvents(ev1, k).write.mode("overwrite")
      .parquet(s"$workDir/events_x$k")
    val docsK = spark.read.parquet(s"$workDir/documents_x$k")
    val evK = spark.read.parquet(s"$workDir/events_x$k")
    def clOf(ev: DataFrame) = graft.operators.ChangeLog.normalize(ev)

    import graft.operators.{CdcMerge, Dedup, Temporal, TextAnalysis}
    val ops: Seq[(String, DataFrame => Unit, (DataFrame, DataFrame))] = Seq(
      ("dedup_minhash",
        (d: DataFrame) => Dedup.minhashDedup(d)
          .write.format("noop").mode("overwrite").save(),
        (docs1, docsK)),
      ("dup_cluster",
        (d: DataFrame) => Dedup.dupClusters(d)
          .write.format("noop").mode("overwrite").save(),
        (docs1, docsK)),
      ("dedup_exact",
        (d: DataFrame) => TextAnalysis.dedupExact(d)
          .write.format("noop").mode("overwrite").save(),
        (docs1, docsK)),
      ("cdc_merge",
        (e: DataFrame) => CdcMerge.merge(clOf(e))
          .write.format("noop").mode("overwrite").save(),
        (ev1, evK)),
      ("sessionize",
        (e: DataFrame) => Temporal.sessionize(clOf(e))
          .write.format("noop").mode("overwrite").save(),
        (ev1, evK)))

    import JsonOut.q
    def cs(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val results = ops.map { case (name, f, (base, big)) =>
      f(base) // warm codegen/JIT on the small side
      val t1 = time(f(base))
      val tk = time(f(big))
      s"${q(name)}:{\"x1\":${cs(t1)},\"x$k\":${cs(tk)}," +
        s"\"ratio\":${cs(tk / t1)}}"
    }
    println(s"""{"metric":"scaleprobe","k":$k,"sf":${q(sfDir)},"ops":{${results.mkString(",")}}}""")
    spark.stop()
  }
}
