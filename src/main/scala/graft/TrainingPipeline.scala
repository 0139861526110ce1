package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** The composed training-data build — the LLM-pipeline twin of the
  * sync-side `graft.Pipeline`: one call takes a raw document corpus
  * through quality gating, exact dedup (canonical copy per identical
  * text), MinHash near-dup removal, deterministic stratified sampling,
  * and hash-based split assignment, ending in the per-(lang, split)
  * corpus manifest a training run consumes.
  *
  * Every stage is the SAME operator the standalone queries use (shared
  * predicates/hashes — keepCol, dedupExact, minhashDedup,
  * stratifiedSample, splitCol), so the composition cannot drift from
  * the parts; the DuckDB oracle rebuilds the whole chain in SQL over
  * the identical hash constants.
  *
  * Scale shape: the gate and sample are narrow filters; dedup stages
  * shuffle on digest/band keys only; the final rollup is a
  * map-side-combined aggregate on a tiny (lang, split) key space.
  */
object TrainingPipeline {

  /** The surviving corpus after quality gate → exact dedup → near-dup
    * removal (full document rows). */
  def corpus(documents: DataFrame): DataFrame = {
    val quality = documents.where(TextAnalysis.keepCol)
    val canonical = TextAnalysis.dedupExact(quality)
      .select(col("keeper_doc_id").as("doc_id"))
    // lazy checkpoint: consumed by BOTH the minhash chain and the final
    // anti-join — staging runs the gate + exact-dedup join once
    val uniq = quality.join(canonical, Seq("doc_id")).localCheckpoint(false)
    val dupIds = Dedup.minhashDedup(uniq)
      .select(col("dup_doc_id").as("doc_id")).distinct()
    uniq.join(dupIds, Seq("doc_id"), "left_anti")
  }

  /** Per-(lang, split) manifest of the sampled training corpus:
    * document and whitespace-token counts. */
  def run(documents: DataFrame): DataFrame =
    corpus(documents)
      .where(TextAnalysis.sampledCol)
      .select(col("lang"), TextAnalysis.splitCol.as("split"),
        size(TextAnalysis.tokensCol).cast("long").as("toks"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("sum_tokens"))
}
