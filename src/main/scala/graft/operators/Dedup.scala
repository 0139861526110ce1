package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over `documents` — MinHash+LSH, SimHash,
  * and n-gram Jaccard verification. All bucketed: the LSH band (or
  * simhash band) is the shuffle key; candidate pairs are generated only
  * within buckets — never an all-pairs cross join.
  *
  * Performance shape (the 100 TB contract): each document's shingles/
  * tokens are hashed ONCE into longs via a Generate (explode), and the
  * 64-wide signatures are built by 64 codegen'd min/sum aggregates with
  * map-side partial aggregation — not by higher-order-function lambdas,
  * which are interpreted and invite CollapseProject to duplicate the
  * shingle expression into every seed (measured 60×+ slowdown).
  */
object Dedup {
  /** MinHash signature length and banding (16 bands × 4 rows). */
  val NumHashes = 64
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands

  /** Jaccard duplicate threshold in milli-units (0.6). */
  val JaccardMilli = 600L

  /** SimHash near-dup hamming threshold. */
  val MaxHamming = 6

  /** One row per (doc_id, distinct token-3-shingle hash). The shingle
    * strings exist only inside this projection — downstream everything
    * is a long. Degenerate (<3 token) docs hash the whole text. */
  def shingleHashes(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val shingles = when(size(col("toks")) >= 3,
      expr("transform(sequence(0, size(toks)-3), " +
        "i -> concat_ws(' ', slice(toks, i+1, 3)))"))
      .otherwise(array(concat_ws(" ", col("toks"))))
    toks
      .select(col("doc_id"), explode(array_distinct(shingles)).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
  }

  /** Per-doc signature row: 64 minhashes (seed-mixed via xxhash64 over
    * the fixed-width (h, seed) pair — constant cost, codegen'd) plus the
    * distinct shingle-hash set for exact-Jaccard verification. */
  def docSignatures(documents: DataFrame): DataFrame = {
    val aggs =
      (0 until NumHashes).map(s => min(xxhash64(col("h"), lit(s))).as(s"m$s")) :+
        collect_set(col("h")).as("hs")
    shingleHashes(documents)
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(s => col(s"m$s")): _*).as("mh"),
        col("hs"))
  }

  /** LSH candidate pairs: band signature = xxhash64(slice of the
    * signature, band index); docs sharing any (band, sig) bucket pair
    * up. The bucket is the shuffle key — pairs are generated inside
    * buckets only, never across. */
  def minhashCandidates(documents: DataFrame): DataFrame =
    candidatesFromSignatures(docSignatures(documents))

  /** Above this bucket size, emit star pairs (keeper ↔ member) instead
    * of all pairs: a mass-duplicate cluster of B docs then costs O(B)
    * rows instead of O(B²) on one reducer, and dedup semantics are
    * preserved transitively through the keeper. */
  val MaxQuadraticBucket = 64

  /** Bounded within-bucket pair generation over a sorted array column
    * `arr` of (a,b)-comparable structs/values — all pairs for small
    * buckets, keeper-star above MaxQuadraticBucket. Shared by the
    * MinHash and SimHash banding so the pairing policy can't drift. */
  private def boundedPairs(arr: String) = {
    val allPairs =
      s"flatten(transform($arr, (a, i) -> " +
        s"transform(slice($arr, i + 2, size($arr)), b -> struct(a, b))))"
    val starPairs =
      s"transform(slice($arr, 2, size($arr) - 1), b -> struct($arr[0] as a, b))"
    when(size(col(arr)) <= MaxQuadraticBucket, expr(allPairs))
      .otherwise(expr(starPairs))
  }

  private[operators] def candidatesFromSignatures(sigs: DataFrame): DataFrame = {
    val banded = sigs
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), " +
          s"b -> xxhash64(slice(mh, b*$RowsPerBand + 1, $RowsPerBand), b))"))
        .as(Seq("band", "sig")))
    banded
      .groupBy("band", "sig")
      .agg(sort_array(collect_list("doc_id")).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(boundedPairs("ids")).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard over the LSH candidate pairs only (the
    * verification stage of MinHash dedup), computed on the hashed
    * shingle sets. j_milli = ⌊1000·J⌋. */
  def ngramJaccard(documents: DataFrame): DataFrame = {
    // no cache(): signatures recompute ~once per use, which is cheaper
    // and stateless — a session-lifetime cache here leaks across the
    // 38-query bench run and the eviction churn costs 10× the recompute.
    val sigs = docSignatures(documents)
    val pairs = candidatesFromSignatures(sigs)
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("hs").as("sh_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("hs").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        size(col("sh_a")).cast("long") + size(col("sh_b")) - col("inter"))
      .select(col("doc_a"), col("doc_b"),
        expr("(inter * 1000) div uni").as("j_milli"))
      .withColumn("is_dup", (col("j_milli") >= JaccardMilli).cast("string"))
  }

  /** Near-dup pairs confirmed by Jaccard ≥ threshold, keeping the
    * smaller doc_id as canonical. */
  def minhashDedup(documents: DataFrame): DataFrame =
    ngramJaccard(documents)
      .where(col("j_milli") >= JaccardMilli)
      .select(col("doc_a").as("keeper_doc_id"), col("doc_b").as("dup_doc_id"),
        col("j_milli"))

  /** End-to-end dedup materialization: the corpus minus confirmed
    * near-duplicates (anti-join on the dup ids — the incremental
    * delete shape, same as retention cleanup). */
  def dedupApply(documents: DataFrame): DataFrame =
    documents
      .join(minhashDedup(documents)
        .select(col("dup_doc_id").as("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))

  /** 64-bit SimHash per doc: explode tokens, hash once, then 64
    * codegen'd ±1 sums (one per bit) reassembled into the fingerprint. */
  def simhashes(documents: DataFrame): DataFrame = {
    val tokenHashes = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L) * (1L << i)) =!= 0, 1L)
        .otherwise(-1L)).as(s"b$i")
    }
    val fingerprint = (0 until 64)
      .map(i => when(col(s"b$i") > 0, lit(1L) * (1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    tokenHashes
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fingerprint.as("simhash"))
  }

  /** SimHash near-dup pairs: 4 bands of 16 bits as bucket keys, exact
    * hamming check (bit_count of xor) within buckets only — with the
    * same star-pattern cap as MinHash so a mass-duplicate bucket stays
    * linear. */
  def simhashDedup(documents: DataFrame): DataFrame = {
    val hashed = simhashes(documents)
    val banded = hashed.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> (simhash >> (b * 16)) & 65535)"))
        .as(Seq("band", "key")))
    banded
      .groupBy("band", "key")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash"))))
        .as("ds"))
      .where(size(col("ds")) > 1)
      .select(explode(boundedPairs("ds")).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= MaxHamming)
  }
}
