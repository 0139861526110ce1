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
    val sh = Dedup.shingleHashes(documents)
    corpusFrom(documents, sh,
      Dedup.signaturesFromHashes(sh).localCheckpoint(false))
  }

  /** [[corpus]] over the already-staged full-corpus shingle-hash and
    * signature relations: shingling and the 64-wide minhash aggregate
    * are strictly PER-DOCUMENT, so filtering commutes with both —
    * semi-joining the staged relations to the quality-gated
    * exact-deduped survivor ids yields bit-identical shingles and
    * signatures to re-deriving them from the survivors' text, and the
    * banding/verify chain then runs on the filtered copies exactly as
    * the oracle's subset chain does. One corpus shingle pass + one
    * signature aggregate feed the standalone dedup family AND this
    * composed pass, instead of the composition re-paying both. */
  def corpusFrom(documents: DataFrame, sh: DataFrame,
                 sigs: DataFrame): DataFrame = {
    val quality = documents.where(TextAnalysis.keepCol)
    val canonical = TextAnalysis.dedupExact(quality)
      .select(col("keeper_doc_id").as("doc_id"))
    // lazy checkpoint: consumed by BOTH the minhash chain and the final
    // anti-join — staging runs the gate + exact-dedup join once
    val uniq = quality.join(canonical, Seq("doc_id")).localCheckpoint(false)
    // the filtered copies are staged like the full-corpus originals:
    // the banding chain references the signature relation three times
    // and the verify references the shingle table twice — without the
    // checkpoint each reference re-runs the semi-join
    val ids = uniq.select("doc_id")
    val shU = sh.join(ids, Seq("doc_id"), "left_semi")
      .localCheckpoint(false)
    val sigsU = sigs.join(ids, Seq("doc_id"), "left_semi")
      .localCheckpoint(false)
    val dupIds = Dedup.minhashDedupFrom(Dedup.ngramJaccardFrom(shU, sigsU))
      .select(col("dup_doc_id").as("doc_id")).distinct()
    uniq.join(dupIds, Seq("doc_id"), "left_anti")
  }

  /** Per-(lang, split) manifest of the sampled training corpus:
    * document and whitespace-token counts. */
  def run(documents: DataFrame): DataFrame = {
    val sh = Dedup.shingleHashes(documents)
    runFrom(documents, sh,
      Dedup.signaturesFromHashes(sh).localCheckpoint(false))
  }

  /** [[run]] over staged shingle-hash/signature relations (the
    * [[corpusFrom]] convention). */
  def runFrom(documents: DataFrame, sh: DataFrame,
              sigs: DataFrame): DataFrame =
    corpusFrom(documents, sh, sigs)
      .where(TextAnalysis.sampledCol)
      .select(col("lang"), TextAnalysis.splitCol.as("split"),
        size(TextAnalysis.tokensCol).cast("long").as("toks"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("sum_tokens"))
}
