package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash.{permuteReduced, phash, P}

/** Deterministic sketch primitives — the probabilistic data structures
  * a 100 TB engine leans on (Bloom-filter join pruning, count-min
  * frequency estimation), built on the SAME portable hash family as
  * the dedup stack so every sketch is bit-identical in the DuckDB
  * oracle. Probabilistic here means "approximate with one-sided
  * error", not "nondeterministic": given the data, every bit of every
  * sketch is reproducible cross-engine.
  *
  * Reference tie: the poll anti-join (`dbopt/PgOperation.scala:27-46`
  * unpolled-batch query) is the exact shape Bloom pruning accelerates —
  * a definitely-not-in-set verdict lets most of the big side skip the
  * exact membership join entirely.
  */
object Sketches {
  /** Bloom geometry: m bits (packed into WordBits-wide words) and k
    * hash functions. m/n ≈ 8 bits per polled key at sf0.001 →
    * theoretical FP ≈ 3% (more keys at larger sf degrade FP — the
    * audit columns report the realized rate). */
  val BloomBits = 8192L
  /** Bits per sketch word: 32, not 64 — bit 63 of a signed 64-bit word
    * is unrepresentable as a positive mask (DuckDB raises on
    * `1::BIGINT << 63`), and positive-only masks keep the two engines'
    * integer semantics identical. */
  val WordBits = 32L
  val BloomWords: Long = BloomBits / WordBits
  val BloomHashes = 3

  /** The k hash positions of a key (each < BloomBits): portable md5
    * base hash, then k universal-hash permutations. */
  private def bloomPositions(key: Column): Seq[Column] = {
    val hm = phash(key) % P
    (0 until BloomHashes).map(s => permuteReduced(hm, s) % BloomBits)
  }

  /** (word, bits) relation of the Bloom filter over `keys` — ≤
    * BloomWords rows regardless of input size (bit_or is a map-side-
    * combined aggregate; the sketch, not the keys, crosses the wire). */
  def bloomBuild(keys: DataFrame, keyCol: Column): DataFrame =
    keys.select(explode(array(bloomPositions(keyCol): _*)).as("pos"))
      .select(expr(s"pos div $WordBits").as("word"),
        expr(s"shiftleft(1L, cast(pos % $WordBits as int))").as("mask"))
      .groupBy("word")
      .agg(expr("bit_or(mask)").as("bits"))

  /** Bloom-pruned membership verdicts, audited against exact truth:
    * the changelog probes a Bloom filter built over the polled-id set
    * (the reference's `sync_polled` lookup). DEFINITELY_NEW rows could
    * skip the exact anti-join at scale — only MAYBE_POLLED rows (a few
    * percent) need it — and the 2×2 verdict×truth counts expose the
    * realized false-positive rate. The filter is ≤BloomWords rows and
    * broadcast; the big side is touched once, shuffle-free. */
  def bloomPrune(changelog: DataFrame): DataFrame = {
    val polled = ChangeLog.polledIds(changelog)
    val bloom = bloomBuild(polled, col("event_id").cast("string"))
    val probes = changelog
      .select(col("event_id"), ChangeLog.polledCol.as("actually_polled"))
      .select(col("event_id"), col("actually_polled"),
        posexplode(array(bloomPositions(col("event_id").cast("string")): _*))
          .as(Seq("i", "pos")))
      .select(col("event_id"), col("actually_polled"),
        expr(s"pos div $WordBits").as("word"),
        expr(s"shiftleft(1L, cast(pos % $WordBits as int))").as("mask"))
    probes
      .join(broadcast(bloom), Seq("word"), "left")
      .select(col("event_id"), col("actually_polled"),
        (col("bits").isNotNull
          && col("bits").bitwiseAND(col("mask")) === col("mask")).as("hit"))
      .groupBy("event_id", "actually_polled")
      .agg((count(when(col("hit"), 1)) === BloomHashes).as("maybe"))
      .groupBy(
        when(col("maybe"), lit("MAYBE_POLLED"))
          .otherwise(lit("DEFINITELY_NEW")).as("verdict"),
        col("actually_polled").cast("string").as("actually_polled"))
      .agg(count(lit(1)).as("n"))
  }

  /** Count-min geometry: d rows × w columns. */
  val CmsDepth = 3
  val CmsWidth = 1024L

  /** Count-min sketch accuracy gate over the corpus token stream: the
    * sketch (≤ d·w cells — map-side combined, corpus-size-independent)
    * vs exact counts for the exact top-K tokens. est = min over rows
    * of the hashed cell, overcount = est − exact ≥ 0 (one-sided error
    * by construction — a negative overcount anywhere means the sketch
    * is broken, and the oracle hash-checks every cell lookup). */
  def cmsError(documents: DataFrame, k: Int = 20): DataFrame = {
    val toks = documents.select(explode(TextAnalysis.tokensCol).as("t"))
    val hm = phash(col("t")) % P
    val cells = toks
      .select(posexplode(array((0 until CmsDepth).map(s =>
        permuteReduced(hm, s) % CmsWidth): _*)).as(Seq("rw", "cc")))
      .groupBy("rw", "cc")
      .agg(count(lit(1)).as("cnt"))
    val top = toks.groupBy("t").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("t"))
      .limit(k)
    val probeHm = phash(col("t")) % P
    top
      .select(col("t"), col("exact_n"),
        posexplode(array((0 until CmsDepth).map(s =>
          permuteReduced(probeHm, s) % CmsWidth): _*)).as(Seq("rw", "cc")))
      .join(cells, Seq("rw", "cc"))
      .groupBy("t", "exact_n")
      .agg(min("cnt").as("est_n"))
      .select(col("t"), col("exact_n"), col("est_n"),
        (col("est_n") - col("exact_n")).as("overcount"))
  }
}
