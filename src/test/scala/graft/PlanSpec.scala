package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical plan-shape guards for the 100 TB contract (SURVEY.md §5 /
  * PLANS.md): shuffle counts, broadcast usage, and the absence of
  * accidental nested-loop/cartesian joins are asserted on the physical
  * plans so a regression fails the suite, not just the plan audit.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Sf = TestSpark.Sf

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf).queryExecution.executedPlan.toString

  private def countOf(p: String, marker: String): Int =
    marker.r.findAllIn(p).length

  test("cdc_merge: exactly one hash shuffle, no sort (agg-based LWW)") {
    val p = plan("cdc_merge")
    assert(countOf(p, "Exchange hashpartitioning") === 1, p)
    assert(!p.contains("CartesianProduct"))
  }

  test("narrow projections are shuffle-free") {
    for (q <- Seq("changelog_normalize", "quality_filter", "doc_fingerprint",
      "multimodal_features", "multimodal_resize")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q has a shuffle:\n$p")
    }
  }

  test("initial_sync and olap_supplier_nation broadcast their dims") {
    for (q <- Seq("initial_sync", "olap_supplier_nation")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q shuffled a dim join:\n$p")
    }
  }

  test("no accidental cartesian products anywhere") {
    SparkEntry.queries.keys.foreach { q =>
      assert(!plan(q).contains("CartesianProduct"), s"$q has a cartesian")
    }
  }

  test("nested-loop joins only where a tiny broadcast side is intended") {
    val allowed = Set("ann_topk", "ann_ivf", "clean_retention",
      "heartbeat_state", "status_rollup", "ivf_assign", "log_compact")
    SparkEntry.queries.keys.filterNot(allowed).foreach { q =>
      assert(!plan(q).contains("BroadcastNestedLoopJoin"),
        s"$q uses an unintended nested-loop join")
    }
  }

  test("range join is an equi-join on (key, band), not a nested loop") {
    val p = plan("range_join_events")
    assert(p.contains("HashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
