package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CdcMerge, ChangeLog}
import graft.sources.Bucketing

/** Proof of the storage-layout claim: same-bucketed tables join with
  * ZERO exchanges (the shuffle is paid once at write time).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-located join of same-bucketed base and state tables is shuffle-free") {
    val cl = ChangeLog.normalize(Tables.events(spark, TestSpark.Sf))
    Bucketing.writeBucketed(
      Tables.customer(spark, TestSpark.Sf), "cust_bucketed", "c_custkey")
    Bucketing.writeBucketed(
      CdcMerge.merge(cl), "state_bucketed", "user_id")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark,
        "cust_bucketed", "state_bucketed", "c_custkey", "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = Tables.customer(spark, TestSpark.Sf)
        .join(CdcMerge.merge(cl),
          col("c_custkey") === col("user_id")).count()
      assert(n === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS cust_bucketed")
      spark.sql("DROP TABLE IF EXISTS state_bucketed")
    }
  }
}
