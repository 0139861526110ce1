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
      // The default whole-stage-codegen class cache holds 100 entries;
      // a 300-query suite compiles thousands of distinct codegen units,
      // so every bench pass was re-paying Janino compilation for every
      // stage (measured: catalog_stats_sketch 15.3s -> 10.4s from this
      // alone). Size the cache to the workload, not to local[32] — any
      // deployment running this whole registry wants it.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val failed = scala.collection.mutable.ListBuffer[String]()
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run — local iteration aid
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
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
      names.foreach { case (_, fn) =>
        try fn(spark, wd).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    // Force-materialize the staged relations BEFORE pass 1 and report
    // the cost as staged_sec: otherwise pass 1's first staged consumer
    // silently pays the one-time materialization, min-of-2 discards
    // that sample, and the pass1/pass2 asymmetry pushes noise_ratio
    // above 1.0 even on a quiet host — the noise instrument ends up
    // measuring the cache instead of the machine. With staging paid up
    // front, min-of-2 compares two steady-state passes and the total
    // still carries the true cold-start cost (total + staged_sec).
    val stagedSec = {
      val t0 = System.nanoTime()
      val d = Staged.dedup(spark, sfDir)
      val t = Staged.tokens(spark, sfDir)
      val a = Staged.ann(spark, sfDir)
      val i = Staged.images(spark, sfDir)
      val h = Staged.catalog(spark, sfDir)
      val b = Staged.baskets(spark, sfDir)
      (Seq(d.sh, d.sigs, d.verified, d.simPairs,
        t.tokens, t.freq, t.skipgrams, t.gopher, t.winnow,
        a.sub, a.l2truth, a.cosTruth, a.assign, a.opqPerm, a.opqSub,
        i.imgs, i.fps, h, b)
        ++ a.chain ++ a.opqChain)
        .foreach(_.count())
      (System.nanoTime() - t0) / 1e9
    }
    // Two INTERLEAVED end-to-end passes, per-query min across passes
    // (round-4 lesson: 2× back-to-back per query leaves both samples
    // inside the same multi-minute host-throttling window — ordered_
    // apply logged 16.08s against a real 0.62s; a window now corrupts
    // at most one pass of a query and the other pass's min wins).
    val passes = (1 to 2).map { _ =>
      val t = scala.collection.mutable.LinkedHashMap[String, Double]()
      names.foreach { case (name, fn) =>
        if (!failed.contains(name)) {
          try {
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            t(name) = (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              failed += name
          }
        }
      }
      t
    }
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    names.map(_._1).filterNot(failed.contains).foreach { n =>
      val samples = passes.flatMap(_.get(n))
      if (samples.nonEmpty) timings(n) = samples.min
    }
    // pass2/pass1 wall totals: ≈1.0 on a quiet host; a throttling
    // window during either pass pushes it away from 1 — the driver can
    // flag a polluted artifact instead of recording phantom regressions.
    // Sum over the key INTERSECTION: a query that failed in exactly one
    // pass must not skew the ratio on a quiet host.
    val noiseRatio = {
      val common = passes(0).keySet & passes(1).keySet
      val t1 = common.toSeq.map(passes(0)).sum
      val t2 = common.toSeq.map(passes(1)).sum
      if (t1 > 0 && t2 > 0) math.max(t1, t2) / math.min(t1, t2) else 1.0
    }
    import JsonOut.{cs, q}
    // Locale.ROOT (see JsonOut.cs): a comma-decimal default locale
    // would corrupt the JSON line
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val fs = failed.map(q).mkString("[", ",", "]")
    val total = timings.values.sum
    // The driver records only the LAST ~2000 chars of stdout and
    // parses the JSON line out of that tail — a full 130+-query map
    // (~2.9 KB) overflows it and the line records as unparseable (the
    // round-3 parsed:null). So the stdout line carries the top
    // TailTopK slowest queries (the ones per-round perf comparison
    // actually reads) plus n_queries/other_sec so the total still
    // reconciles; the COMPLETE per-query map goes to BENCH_LOCAL.json
    // in the repo, committed every round for machine diffing.
    val TailTopK = 70
    val byCost = timings.toSeq.sortBy(-_._2)
    val fullQs = timings.map { case (k, v) => s"${q(k)}:${cs(v)}" }
      .mkString("{", ",", "}")
    // anchor the artifact at the repo root: SPARK_GRAFT_REPO_ROOT when
    // set (a bench launched from inside some OTHER sbt project must not
    // silently write to that project's root), else the nearest ancestor
    // of the forked JVM's cwd holding a build.sbt
    val benchLocal = {
      val cwd = java.nio.file.Paths.get(sys.props("user.dir")).toAbsolutePath
      sys.env.get("SPARK_GRAFT_REPO_ROOT")
        .map(java.nio.file.Paths.get(_).toAbsolutePath)
        .orElse(Iterator.iterate(cwd)(_.getParent).takeWhile(_ != null)
          .find(p => java.nio.file.Files.exists(p.resolve("build.sbt"))))
        .getOrElse(cwd)
        .resolve("BENCH_LOCAL.json")
    }
    System.err.println(s"[bench] writing full per-query map to $benchLocal")
    java.nio.file.Files.writeString(benchLocal,
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","staged_sec":${ms(stagedSec)},"noise_ratio":${cs(noiseRatio)},"queries":$fullQs,"failed":$fs,"sf":${q(sfDir)}}""")
    val topQs = byCost.take(TailTopK)
      .map { case (k, v) => s"${q(k)}:${cs(v)}" }.mkString("{", ",", "}")
    val otherSec = byCost.drop(TailTopK).map(_._2).sum
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","staged_sec":${ms(stagedSec)},"noise_ratio":${cs(noiseRatio)},"queries":$topQs,"n_queries":${timings.size},"other_sec":${cs(otherSec)},"failed":$fs,"sf":${q(sfDir)}}""")
    spark.stop()
  }
}
