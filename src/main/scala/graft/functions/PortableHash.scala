package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable 60-bit string hash + a seeded universal-hash family
  * on top of it — the primitive the dedup/winnowing operators build
  * their signatures from.
  *
  * Why not xxhash64: Spark's seeded xxhash64 has no DuckDB twin, which
  * left the MinHash/SimHash family verifiable only by rows-count. Both
  * engines DO share md5 over UTF-8 bytes, so
  * `bigint(first 15 hex chars of md5(s))` is bit-identical across
  * Spark (`conv(substr(md5(s),1,15),16,10)`) and DuckDB
  * (`CAST('0x' || substr(md5(s),1,15) AS BIGINT)`): a nonnegative
  * 60-bit value, cross-checked by the DuckDB oracle for every dedup
  * query.
  *
  * Seed mixing uses the classic universal-hash permutation
  * `(a_s·(h mod P) + b_s) mod P` instead of 64 per-seed md5 calls: ONE
  * md5 per shingle, then 64 codegen'd integer ops. The (a, b)
  * constants derive from md5 too (computed once on the JVM, embedded
  * as literals in both the Column tree and the generated oracle SQL,
  * so they cannot drift). Bounds keep every intermediate inside a
  * signed 64-bit long even under ANSI overflow checks:
  * (h mod P) < P ≈ 2³², a ≤ 2³⁰ ⇒ a·(h mod P) + b < 2⁶³.
  */
object PortableHash {
  /** Modulus of the universal-hash family: smallest prime above 2³². */
  val P: Long = 4294967311L

  /** Number of seeded permutations (MinHash signature width). */
  val NumSeeds = 64

  /** JVM twin of [[phash]] — same md5/15-hex-chars construction, used
    * to derive the A/B constants and by test oracles. */
  def md5Long(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Full 32-hex-char md5 of a string — the trigger version hash
    * (JVM-side analog of the reference's trigger-SQL hashing in
    * `dbopt/MysqlOperation.scala` buildInsertTrigger). */
  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Multipliers in [1, 2³⁰] — bounded so the permutation can't
    * overflow a long. */
  val A: IndexedSeq[Long] =
    (0 until NumSeeds).map(s => md5Long(s"a:$s") % (1L << 30) + 1)

  /** Offsets in [0, P). */
  val B: IndexedSeq[Long] =
    (0 until NumSeeds).map(s => md5Long(s"b:$s") % P)

  /** Portable 60-bit hash of a string column — the [[Md5Long]] native
    * expression (digest bytes straight to long; the equivalent
    * built-in chain `conv(substr(md5(s),1,15),16,10)` round-trips
    * through a 32-char hex string and a base-16 string parse per
    * row). */
  def phash(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      Md5Long(org.apache.spark.sql.GraftBridge.expression(c)))

  /** DuckDB twin of [[phash]] for a SQL expression `e`. */
  def sqlPhash(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** Seeded permutation of an already-phashed (nonnegative) long. */
  def permute(h: Column, seed: Int): Column =
    ((h % P) * A(seed) + B(seed)) % P

  /** Seeded permutation of an already-mod-P-reduced hash — the
    * signature aggregate computes `h % P` once per row and feeds it to
    * all [[NumSeeds]] permutations, instead of re-reducing per seed.
    * Same values as [[permute]] since ((h%P)%P) = h%P. */
  def permuteReduced(hm: Column, seed: Int): Column =
    (hm * A(seed) + B(seed)) % P

  /** DuckDB twin of [[permute]]. */
  def sqlPermute(e: String, seed: Int): String =
    s"((($e) % $P) * ${A(seed)} + ${B(seed)}) % $P"

  /** LSH band-key combiner: Horner fold mod 2³¹−1 over the band's
    * minhash columns — plain integer Column arithmetic (codegen'd; an
    * array_join/transform string key here would run interpreted and
    * was measured as the banding hot spot). Rare cross-band collisions
    * only add candidate pairs, which the exact-Jaccard verify discards;
    * both engines compute the identical key. Bounds: k < Q ⇒
    * k·R + m < 2⁴⁷ + 2³³, inside a long under ANSI. */
  val BandQ: Long = 2147483647L
  val BandR: Long = 65599L

  def bandKey(ms: Seq[Column]): Column =
    ms.tail.foldLeft(ms.head % BandQ)((k, m) => (k * BandR + m) % BandQ)

  /** DuckDB twin of [[bandKey]]. */
  def sqlBandKey(ms: Seq[String]): String =
    ms.tail.foldLeft(s"(${ms.head} % $BandQ)")((k, m) =>
      s"(($k * $BandR + $m) % $BandQ)")
}
