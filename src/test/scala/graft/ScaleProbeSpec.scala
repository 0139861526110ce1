package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The scale probe's amplification must PRESERVE dup structure: every
  * candidate pair stays within one copy (disjoint shingle sets across
  * copies) and the pair count scales exactly k× — otherwise the probe's
  * "linear in rows" verdict measures amplification artifacts, not plans
  * (the bug the first one-tag-per-doc cut had).
  */
class ScaleProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("amplifyDocuments: candidate pairs stay within-copy and scale kx") {
    import spark.implicits._
    val k = 3
    def text(from: Int) = (from until from + 20).map(i => s"w$i").mkString(" ")
    // one dup pair (1~2) + one singleton per copy after amplification
    val base = Seq((1L, text(1)), (2L, text(2)), (9L, text(500)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
    val basePairs = Dedup.minhashCandidates(base).count()
    assert(basePairs >= 1L)
    val amp = ScaleProbe.amplifyDocuments(base, k)
    assert(amp.count() === base.count() * k)
    val pairs = Dedup.minhashCandidates(amp).collect()
    assert(pairs.length.toLong === basePairs * k, "pair count must scale kx")
    pairs.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(a / 1000000000L === b / 1000000000L,
        s"cross-copy candidate pair ($a, $b)")
    }
  }

  test("amplifyEvents: volume and key cardinality both scale kx") {
    val k = 3
    val ev = Tables.events(spark, TestSpark.Sf).limit(200)
    val amp = ScaleProbe.amplifyEvents(ev, k)
    assert(amp.count() === ev.count() * k)
    assert(amp.select("user_id").distinct().count() ===
      ev.select("user_id").distinct().count() * k)
    assert(amp.select("event_id").distinct().count() === amp.count())
  }
}
