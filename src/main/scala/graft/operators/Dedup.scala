package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over `documents` — MinHash+LSH, SimHash,
  * and n-gram Jaccard verification. All bucketed: the LSH band (or
  * simhash band) is the shuffle key; candidate pairs are generated only
  * within buckets — never an all-pairs cross join. All hashing uses
  * xxhash64 (codegen'd, deterministic) so results are reproducible.
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

  /** Token 3-gram shingles of the text (distinct). Falls back to whole
    * text for degenerate short docs. */
  val shinglesCol: Column = {
    val t = expr("split(text, ' ')")
    when(size(t) >= 3,
      array_distinct(expr(
        "transform(sequence(0, size(split(text,' '))-3), " +
          "i -> concat_ws(' ', slice(split(text,' '), i+1, 3)))")))
      .otherwise(array(col("text")))
  }

  /** docs → (doc_id, shingles). */
  def withShingles(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), shinglesCol.as("shingles"))

  /** 64-wide MinHash signature: per seed s, min over shingles of
    * xxhash64(shingle, s). Pure array expressions — no explode of the
    * shingle set, no UDF. */
  def withMinhash(documents: DataFrame): DataFrame =
    withShingles(documents).withColumn("mh", expr(
      s"transform(sequence(0, ${NumHashes - 1}), " +
        "s -> array_min(transform(shingles, sh -> xxhash64(sh, s))))"))

  /** LSH candidate pairs: band signature = xxhash64(slice of the
    * signature, band index); docs sharing any (band, sig) bucket pair
    * up. The bucket is the shuffle key — pairs are generated inside
    * buckets only. */
  def minhashCandidates(documents: DataFrame): DataFrame = {
    val banded = withMinhash(documents)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), " +
          s"b -> xxhash64(slice(mh, b*$RowsPerBand + 1, $RowsPerBand), b))"))
        .as(Seq("band", "sig")))
    banded
      .groupBy("band", "sig")
      .agg(sort_array(collect_list("doc_id")).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), b -> struct(a, b))))"))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard over the LSH candidate pairs only (the
    * verification stage of MinHash dedup). j_milli = ⌊1000·J⌋. */
  def ngramJaccard(documents: DataFrame): DataFrame = {
    val sh = withShingles(documents)
    val pairs = minhashCandidates(documents)
    pairs
      .join(sh.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("shingles", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("shingles", "sh_b"), "doc_b")
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

  /** 64-bit SimHash from token hashes: bit i is the sign of the sum of
    * ±1 contributions of each token's hash bit i. */
  val simhashCol: Column = expr(
    """aggregate(
      |  sequence(0, 63),
      |  cast(0 as bigint),
      |  (acc, i) -> acc | shiftleft(
      |    cast(aggregate(transform(split(text, ' '), t -> xxhash64(t)),
      |                   cast(0 as bigint),
      |                   (s, h) -> s + if(((h >> i) & 1) = 1, 1, -1)) > 0
      |         as bigint), i))""".stripMargin)

  /** SimHash near-dup pairs: 4 bands of 16 bits as bucket keys, exact
    * hamming check (bit_count of xor) within buckets only. */
  def simhashDedup(documents: DataFrame): DataFrame = {
    val hashed = documents.select(col("doc_id"), simhashCol.as("simhash"))
    val banded = hashed.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> (simhash >> (b * 16)) & 65535)"))
        .as(Seq("band", "key")))
    val a = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "key"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long")
          .as("hamming"))
      .distinct()
      .where(col("hamming") <= MaxHamming)
  }
}
