package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. Failed queries are
  * reported explicitly in "failed" (and excluded from the total)
  * instead of hiding as negative timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ListBuffer[String]()
    // Codegen/JIT warmup at the smallest SF (when a sibling sf0.001
    // exists): the first execution of a freshly generated whole-stage
    // method costs seconds of C2 compilation that min-of-2 at one SF
    // doesn't amortize away — the wide dedup signature aggregate was
    // reporting 3-4x its steady state. Timed numbers should measure
    // the plan, not the compiler.
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir).toAbsolutePath
      Option(p.getParent).map(_.resolve("sf0.001"))
        .filter(q => java.nio.file.Files.isDirectory(q) && q != p)
        .map(_.toString)
    }
    warmDir.foreach { wd =>
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try fn(spark, wd).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // min of 2 runs: first run pays JIT/codegen, min is the stable
        // figure for plan-quality comparison against the baseline.
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        timings(name) = runs.min
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
      }
    }
    import JsonOut.q
    // Bounded precision: full-precision doubles made the line overflow
    // the driver's stdout tail window (~2.9 KB observed in round 3 —
    // the head of the JSON was cut and it recorded parsed:null). At
    // 100+ queries even 3 decimals is borderline, so per-query values
    // use 2 decimals (run-to-run noise is ±4% anyway); the total keeps 3.
    // Locale.ROOT: a comma-decimal default locale (de_DE …) would
    // format 34.123 as "34,123" and corrupt the JSON line
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def cs(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = timings.map { case (k, v) => s"${q(k)}:${cs(v)}" }
      .mkString("{", ",", "}")
    val fs = failed.map(q).mkString("[", ",", "]")
    val total = timings.values.sum
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"failed":$fs,"sf":${q(sfDir)}}""")
    spark.stop()
  }
}
