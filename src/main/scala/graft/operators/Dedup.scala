package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash.{permute, phash}

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
  * shingle expression into every seed (measured 60×+ slowdown). Seed
  * mixing is the universal-hash permutation from
  * [[graft.functions.PortableHash]]: one md5 per shingle, then 64
  * integer ops — portable to the DuckDB oracle, so every query in this
  * family is hash-checked cross-engine (the round-2 gap). The
  * verification joins run against the per-shingle hash table (a narrow
  * explode, cheap to recompute), never against the 64-aggregate
  * signature build — that runs exactly once per query.
  */
object Dedup {
  /** MinHash signature length and banding (16 bands × 4 rows). */
  val NumHashes = 64
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands

  /** Jaccard duplicate threshold in milli-units (0.6). */
  val JaccardMilli = 600L

  /** SimHash width: 60 bits — everything [[graft.functions.PortableHash
    * .phash]] yields. 4 bands × 15 bits. */
  val SimBits = 60
  val SimBands = 4
  val SimBandBits: Int = SimBits / SimBands

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
      .select(col("doc_id"), phash(col("sh")).as("h"))
  }

  /** Per-doc signature row: 64 minhashes — min over the seeded
    * universal-hash permutations of the shingle hashes (constant cost,
    * codegen'd, map-side combined). */
  def docSignatures(documents: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map(s => min(permute(col("h"), s)).as(s"m$s"))
    shingleHashes(documents)
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(s => col(s"m$s")): _*).as("mh"))
  }

  /** LSH candidate pairs: band signature = the ':'-joined 4-minhash
    * slice (a plain string, identical across engines — no second-level
    * hash needed; the bucket count is what matters, not the key width).
    * Docs sharing any (band, sig) bucket pair up. The bucket is the
    * shuffle key — pairs are generated inside buckets only, never
    * across. */
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
        s"transform(sequence(0, ${Bands - 1}), b -> " +
          s"array_join(transform(slice(mh, b*$RowsPerBand + 1, $RowsPerBand), " +
          "x -> cast(x as string)), ':'))"))
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
    * verification stage of MinHash dedup). The intersection size comes
    * from joining the candidate pairs against the per-shingle hash
    * table on both sides — the signature build (the expensive 64-wide
    * aggregate) is NOT re-derived per join side, only the narrow
    * shingle explode is. j_milli = ⌊1000·J⌋. */
  def ngramJaccard(documents: DataFrame): DataFrame = {
    val sh = shingleHashes(documents)
    val pairs = candidatesFromSignatures(docSignatures(documents))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("h")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("h")), Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("c"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("c"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("(c * 1000) div (na + nb - c)").as("j_milli"))
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

  /** 60-bit SimHash per doc: explode tokens, hash once, then 60
    * codegen'd ±1 sums (one per bit) reassembled into the fingerprint. */
  def simhashes(documents: DataFrame): DataFrame = {
    val tokenHashes = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), phash(col("t")).as("h"))
    val bitSums = (0 until SimBits).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L) * (1L << i)) =!= 0, 1L)
        .otherwise(-1L)).as(s"b$i")
    }
    val fingerprint = (0 until SimBits)
      .map(i => when(col(s"b$i") > 0, lit(1L) * (1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    tokenHashes
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fingerprint.as("simhash"))
  }

  /** SimHash near-dup pairs: 4 bands of 15 bits as bucket keys, exact
    * hamming check (bit_count of xor) within buckets only — with the
    * same star-pattern cap as MinHash so a mass-duplicate bucket stays
    * linear. */
  def simhashDedup(documents: DataFrame): DataFrame = {
    val hashed = simhashes(documents)
    val banded = hashed.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        s"transform(sequence(0, ${SimBands - 1}), " +
          s"b -> (simhash >> (b * $SimBandBits)) & ${(1 << SimBandBits) - 1})"))
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
