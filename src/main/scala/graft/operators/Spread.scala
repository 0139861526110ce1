package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scan-parallelism repair for compute-heavy per-row operators (guide
  * §2.5 "input skew — one huge unsplittable file … repartition
  * immediately after the read", §2.6 stragglers/idle capacity).
  *
  * The local test corpora are single parquet files whose row groups
  * bound split count — `documents` at sf0.1 is ONE split — so every
  * compute-bound projection over the raw scan (per-doc HOF chains,
  * shingle/k-gram explodes, regex batteries) runs on ONE core while 31
  * idle. The fix is the image-lane discipline (round 13): spread rows
  * with a deterministic hash repartition BEFORE the heavy expressions.
  *
  * SCALE-ADAPTIVE, not constant: the exchange is added only when the
  * scan's split count is actually deficient (fewer than half the
  * executor cores). At 100 TB the same scan has thousands of splits,
  * the predicate is false, and NO shuffle is added — so this never
  * moves corpus bytes on a real deployment, where the repartition
  * would be the bug. Deterministic key (never round-robin): task
  * retries reproduce the same placement (guide §2.5 SPARK-38388), and
  * keyless repartition would pay sortBeforeRepartition on the payload.
  */
object Spread {
  /** `df` hash-repartitioned on `key` to the executor core count when
    * its current plan parallelism is below half of it; `df` unchanged
    * otherwise. */
  def byKey(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target)
      df.repartition(target, col(key))
    else df
  }
}
