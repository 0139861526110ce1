package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[Staged]] invalidation contract at the one call site that
  * rewrites parquet in-place within a session: [[AmplifyCorpus.amplify]]
  * over an output dir that may already be staged. Without the
  * `Staged.invalidate()` in the write path, the second stage lookup
  * below would serve the k=2 corpus (localCheckpoint blocks outlive the
  * files they were built from) and the distinct-doc count would not
  * move — i.e. the amplify lane's parity run would silently verify
  * stale data unless launched in a fresh JVM.
  */
class StagedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("in-place re-amplify invalidates staged relations (no fresh JVM)") {
    val out = java.nio.file.Files.createTempDirectory("graft-amp").toString
    val base = TestSpark.Sf

    AmplifyCorpus.amplify(spark, base, out, 2)
    val docs2 = Staged.tokens(spark, out).tokens
      .select("doc_id").distinct().count()
    val sh2 = Staged.dedup(spark, out).sh.count()

    // in-place rewrite of the SAME dir at a larger k
    AmplifyCorpus.amplify(spark, base, out, 3)
    val docs3 = Staged.tokens(spark, out).tokens
      .select("doc_id").distinct().count()
    val sh3 = Staged.dedup(spark, out).sh.count()

    assert(docs2 % 2 == 0 && docs3 == docs2 / 2 * 3,
      s"staged tokens served stale corpus: k=2 docs=$docs2, k=3 docs=$docs3")
    assert(sh3 > sh2,
      s"staged shingle relation served stale corpus: k=2 sh=$sh2, k=3 sh=$sh3")
  }

  test("reliable staging (spark.graft.staged.reliable) writes to the " +
    "checkpoint dir and returns identical relations") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt")
    val before = Staged.tokens(spark, TestSpark.Sf).freq.count()
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    spark.conf.set(Staged.ReliableKey, "true")
    try {
      Staged.invalidate() // force a rebuild through the reliable path
      val freq = Staged.tokens(spark, TestSpark.Sf).freq
      assert(freq.count() === before) // same relation either way
      // materialization must have landed in the reliable checkpoint dir
      val files = java.nio.file.Files.walk(ckpt).iterator()
      var n = 0
      while (files.hasNext) { files.next(); n += 1 }
      assert(n > 1, s"no reliable checkpoint data under $ckpt")
    } finally {
      spark.conf.set(Staged.ReliableKey, "false")
      Staged.invalidate() // don't leak reliable relations to other suites
    }
  }

  test("application end evicts a session's staged entries (no pinned " +
    "block-manager memory past the session's life)") {
    // same (session, dir) lookup twice → the cached instance; after the
    // application-end listener fires, the next lookup must REBUILD
    // (fresh instance), proving the cache no longer retains the session
    val first = Staged.tokens(spark, TestSpark.Sf)
    assert(Staged.tokens(spark, TestSpark.Sf) eq first, "cache miss?")
    org.apache.spark.GraftTestBridge.post(spark.sparkContext,
      org.apache.spark.scheduler.SparkListenerApplicationEnd(0L))
    org.apache.spark.GraftTestBridge.drain(spark.sparkContext)
    val rebuilt = Staged.tokens(spark, TestSpark.Sf)
    assert(!(rebuilt eq first),
      "staged entries survived application end — session retained")
    Staged.invalidate() // leave a clean slate for peer suites
  }
}
