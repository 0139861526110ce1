package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dedup

/** Session-scoped staged relations for the dedup family — the
  * production shape of "the signature table is a staged table"
  * (Dedup scaladoc): the corpus scan, the shingle explode, the 64-wide
  * minhash aggregate, the LSH candidate+verify chain, and the SimHash
  * fingerprint pass each run ONCE per (session, corpus dir), and every
  * composed consumer (sweep, apply, clusters, overlap, agreement,
  * estimator gate, band sweep, incremental) reads the same staged
  * copies. At 100 TB this is the difference between one corpus
  * shuffle feeding ten reports and ten corpus shuffles; locally it
  * removes the rebuilt chain from ~10 of the bench's dedup queries.
  *
  * Staging is lazy (`localCheckpoint(eager = false)`): nothing runs at
  * lookup; the first ACTION on any consumer materializes the staged
  * relation into the block manager (memory+disk), later consumers read
  * the materialized copy. Results are identical to the standalone
  * operator forms — the staged relations are the very intermediates
  * those forms build internally, so the DuckDB oracles are unchanged.
  *
  * Keyed by (session, dir): a new session or a different corpus path
  * stages fresh; re-writing parquet UNDER an already-staged dir within
  * one session serves stale data (same contract as any staged table —
  * call [[invalidate]] after in-place rewrites, as the amplified-corpus
  * parity lane's fresh-JVM runs do implicitly).
  */
object Staged {

  /** The staged dedup relations of one (session, corpus) pair.
    * All four are lazily-checkpointed; `dups` is a cheap filter view
    * over `verified` (no extra copy). */
  final case class DedupRels(sh: DataFrame, sigs: DataFrame,
                             verified: DataFrame, simPairs: DataFrame) {
    /** Confirmed near-dup pairs ([[Dedup.minhashDedup]] shape). */
    def dups: DataFrame = Dedup.minhashDedupFrom(verified)
  }

  private val cache = TrieMap.empty[(SparkSession, String), DedupRels]

  /** The staged dedup relations for the documents table under `sfDir`,
    * built on first request per (session, dir). */
  def dedup(spark: SparkSession, sfDir: String): DedupRels =
    cache.getOrElseUpdate((spark, sfDir), {
      val docs = Tables.documents(spark, sfDir)
      val sh = Dedup.shingleHashes(docs).localCheckpoint(false)
      val sigs = Dedup.signaturesFromHashes(sh).localCheckpoint(false)
      val verified = Dedup.ngramJaccardFrom(sh, sigs).localCheckpoint(false)
      val simPairs = Dedup.simhashDedup(docs).localCheckpoint(false)
      DedupRels(sh, sigs, verified, simPairs)
    })

  /** Drop all staged entries (block-manager copies are reclaimed by the
    * context cleaner once unreferenced). For in-place corpus rewrites
    * within a session — tests and the amplify lane. */
  def invalidate(): Unit = cache.clear()
}
