package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Correctness of the CDC path: changelog normalize → last-writer-wins
  * merge → upsert/delete apply, checked against a naive in-memory replay
  * of the same change stream (what the reference's ordered per-key apply
  * would produce).
  */
class SyncPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cl = ChangeLog.normalize(Tables.events(spark, TestSpark.Sf)).cache()

  /** Naive replay: apply changes in (ems, event_id) order per key. */
  private lazy val naiveFinal: Map[Long, (String, Long, Long)] = {
    val rows = cl.select("user_id", "ems", "event_id", "op", "value_cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(t => (t._2, t._3))
    rows.foldLeft(Map.empty[Long, (String, Long, Long)]) {
      case (state, (uid, _, eid, op, cents)) => state.updated(uid, (op, eid, cents))
    }
  }

  test("changelog op mapping is total and I/U/D only") {
    val ops = cl.select("op").distinct().collect().map(_.getString(0)).toSet
    assert(ops.subsetOf(Set("I", "U", "D")))
    assert(cl.where(col("op").isNull).count() === 0)
  }

  test("cdc_merge equals naive ordered replay (live keys)") {
    val merged = CdcMerge.merge(cl).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("last_op"), r.getAs[Long]("last_event_id"),
          r.getAs[Long]("last_value_cents"))).toMap
    val expected = naiveFinal.filter(_._2._1 != "D")
      .map { case (k, (op, eid, cents)) => k -> (op, eid, cents) }
    assert(merged === expected)
  }

  test("merge emits at most one row per key and never a delete") {
    val m = CdcMerge.merge(cl)
    assert(m.groupBy("user_id").count().where(col("count") > 1).count() === 0)
    assert(m.where(col("last_op") === "D").count() === 0)
  }

  test("upsertApply: deleted keys are gone, inserts are labeled, base rows pass through") {
    val customer = Tables.customer(spark, TestSpark.Sf)
    val applied = CdcMerge.upsertApply(cl, customer).cache()
    val deletedKeys = naiveFinal.filter(_._2._1 == "D").keySet
    val appliedKeys = applied.select("key").collect().map(_.getLong(0)).toSet
    assert(deletedKeys.intersect(appliedKeys).isEmpty)
    // inserted keys (changed but not in base) carry the synthetic name
    val baseKeys = customer.select("c_custkey").collect().map(_.getLong(0)).toSet
    val inserted = applied.where(col("apply_op") === "INSERT").collect()
    inserted.foreach { r =>
      assert(!baseKeys.contains(r.getAs[Long]("key")))
      assert(r.getAs[String]("name").startsWith("user_"))
    }
    // untouched base rows keep their balance
    val touched = naiveFinal.keySet
    val untouched = applied.where(col("apply_op") === "BASE")
    assert(untouched.collect().forall(r => !touched.contains(r.getAs[Long]("key"))))
  }

  test("deleteApply removes exactly the latest-op-D keys present in base") {
    val customer = Tables.customer(spark, TestSpark.Sf)
    val kept = CdcMerge.deleteApply(cl, customer)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val baseKeys = customer.select("c_custkey").collect().map(_.getLong(0)).toSet
    val deleted = naiveFinal.filter(_._2._1 == "D").keySet
    assert(kept === baseKeys.diff(deleted))
  }

  test("last-writer-wins respects (ems, event_id) tiebreak") {
    import spark.implicits._
    // two changes with identical ems: higher event_id must win
    val df = Seq(
      (1L, 10L, "U", 1000L, 100L, 5L, 1L),
      (2L, 10L, "U", 1000L, 200L, 6L, 1L)
    ).toDF("event_id", "user_id", "op", "ems", "value_cents", "k", "part")
      .withColumn("epoch_s", lit(1L))
    val out = CdcMerge.merge(df).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("last_event_id") === 2L)
    assert(out.head.getAs[Long]("last_value_cents") === 200L)
  }

  test("pollBatch is bounded, id-ordered, and excludes polled ids") {
    val batch = ChangeLog.pollBatch(cl, batch = 100).collect()
    assert(batch.length === 100)
    val ids = batch.map(_.getAs[Long]("event_id"))
    assert(ids.sameElements(ids.sorted))
    assert(ids.forall(_ % 7 != 0))
  }

  test("ordered_apply partition stats reconcile with merge totals") {
    val live = CdcMerge.merge(cl)
    val byPart = ChangeLog.orderedApply(cl)
    val totalLive = byPart.agg(sum("n_live")).collect().head.getLong(0)
    assert(totalLive === live.count())
    val sumCents = byPart.agg(sum("sum_live_cents")).collect().head.getLong(0)
    val expected = live.agg(sum("last_value_cents")).collect().head.getLong(0)
    assert(sumCents === expected)
  }

  test("blocked_chain: events after a key's first error are blocked") {
    val rows = cl.select("user_id", "ems", "event_id", "op").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val expected = rows.flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(t => (t._2, t._3))
      val firstErrIdx = ordered.indexWhere(_._4 == "D")
      if (firstErrIdx >= 0 && firstErrIdx < ordered.length - 1)
        Some(uid -> (ordered(firstErrIdx)._3, (ordered.length - 1 - firstErrIdx).toLong))
      else None
    }
    val actual = Ledger.blockedChain(cl).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("first_err_eid"), r.getAs[Long]("n_blocked"))).toMap
    assert(actual === expected)
  }

  test("training pipeline: stages compose consistently, corpus is dup-free") {
    import graft.operators.{Dedup, TextAnalysis}
    val docs = Tables.documents(spark, TestSpark.Sf)
    val gated = docs.where(TextAnalysis.keepCol).count()
    val kept = TrainingPipeline.corpus(docs)
    val keptN = kept.count()
    assert(keptN > 0 && keptN <= gated)
    // every confirmed near-dup pair had its dup side removed, so a
    // re-run of the detector over the surviving corpus finds nothing
    assert(Dedup.minhashDedup(kept).count() === 0)
    // and no two survivors share identical text
    assert(kept.select("text").distinct().count() === keptN)
    val manifest = TrainingPipeline.run(docs)
    val sampled = manifest.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .collect().head.getLong(0)
    assert(sampled <= keptN)
    assert(manifest.collect().forall(
      r => Set("train", "val", "test")(r.getString(1))))
  }
}
