package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Session-scoped staged relations — the production shape of "the
  * signature table is a staged table" (Dedup scaladoc), applied to the
  * two families whose queries share expensive corpus passes:
  *
  *  - [[dedup]]: the corpus scan, the shingle explode, the 64-wide
  *    minhash aggregate, the LSH candidate+verify chain, and the
  *    SimHash fingerprint pass run ONCE per (session, corpus dir);
  *    every composed consumer (sweep, apply, clusters, overlap,
  *    agreement, estimator gate, band sweep, incremental) reads the
  *    same staged copies.
  *  - [[tokens]]: the (doc_id, token) corpus tokenization, the
  *    vocabulary-sized frequency table, the skip-gram relation, the
  *    gopher-quality verdicts, and the winnow fingerprints run ONCE
  *    and feed the whole token family (top-k, BPE merge/apply, vocab
  *    coverage, PMI, co-occurrence, rarity, drift, LM scoring, TF-IDF,
  *    classifier+calibration, rollup, budget, winnow stats,
  *    contamination).
  *  - [[ann]]: the subvector explode, the PQ Lloyd training chain,
  *    the exact L2/cosine ground truths and the IVF list assignment
  *    run ONCE and feed the index-eval family (pq_train, the four
  *    pq recall gates/curves, ivf_recall + its probe curve, ann_topk,
  *    ann_ivf, ivf_assign, semantic_dedup).
  *
  * At 100 TB this is the difference between one corpus shuffle feeding
  * ten reports and ten corpus shuffles; locally it removes the rebuilt
  * chains from ~25 of the bench's queries.
  *
  * Staging is lazy (`localCheckpoint(eager = false)`): nothing runs at
  * lookup; the first ACTION on any consumer materializes the staged
  * relation into the block manager (memory+disk), later consumers read
  * the materialized copy. Results are identical to the standalone
  * operator forms — the staged relations are the very intermediates
  * those forms build internally, so the DuckDB oracles are unchanged.
  *
  * Cluster caveat: localCheckpoint is NOT fault-tolerant — its blocks
  * live in executor storage, so losing an executor after
  * materialization breaks every later consumer of the staged relations
  * for the rest of the session. For long-lived multi-tenant cluster
  * deployments set `spark.graft.staged.reliable=true` (and a
  * `SparkContext.setCheckpointDir` on HDFS/object store): every staged
  * relation then uses reliable `checkpoint()` at the same call sites —
  * the plan shape and the consumers are unchanged, executor loss costs
  * a re-read instead of the session.
  *
  * Keyed by (session, dir): a new session or a different corpus path
  * stages fresh; re-writing parquet UNDER an already-staged dir within
  * one session serves stale data (same contract as any staged table —
  * call [[invalidate]] after in-place rewrites; AmplifyCorpus does so
  * in its write path).
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

  /** The staged token-family relations of one (session, corpus) pair:
    * the (doc_id, lang, source, token) explode, the (token, tf)
    * frequency table, the (doc_id, w1, w2, d) skip-grams, the
    * gopher-quality verdicts, and the (doc_id, source, fp) winnow
    * fingerprints. */
  final case class TokenRels(tokens: DataFrame, freq: DataFrame,
                             skipgrams: DataFrame, gopher: DataFrame,
                             winnow: DataFrame)

  /** The staged ANN/index-eval relations of one (session, corpus):
    * the (vec_id, m, sv6) subvector explode, the Lloyd training chain
    * over it (element i = codebook after i+1 rounds; each round is
    * checkpointed by the chain builder itself), the exact-L2 and
    * exact-cosine ground truths, the IVF list assignment, and the OPQ
    * lane (the 1-row variance-snake permutation array, the permuted
    * subvector explode and ITS Lloyd chain). One trainer + one truth
    * pass feed the whole recall-gate family; the OPQ trainer is a
    * second chain over the same corpus, staged once for the same
    * reason. The OPQ lane is LAZY: constructing the permutation array
    * runs the Dim-row means collect (one small job), which non-OPQ
    * consumers — most of the gate family — must not pay, so the
    * builder stays zero-job until the first opq* access. */
  final class AnnRels(val sub: DataFrame, val chain: Seq[DataFrame],
                      val l2truth: DataFrame, val cosTruth: DataFrame,
                      val assign: DataFrame,
                      opqPermT: () => DataFrame,
                      opqSubT: () => DataFrame,
                      opqChainT: () => Seq[DataFrame]) {
    lazy val opqPerm: DataFrame = opqPermT()
    lazy val opqSub: DataFrame = opqSubT()
    lazy val opqChain: Seq[DataFrame] = opqChainT()
  }

  /** The staged image-lane relations of one (session, corpus): the
    * synthesized PPM payload table (one payload construction feeds the
    * codec, the native decoder AND the dedup) and the aHash
    * fingerprints (doc_id, bands) — staged because the banded-hamming
    * dedup references them three times, and because the nested-HOF
    * hash expression must evaluate once per row, not once per plan
    * reference. */
  final case class ImageRels(imgs: DataFrame, fps: DataFrame)

  private val cache = TrieMap.empty[(SparkSession, String), DedupRels]
  private val tokenCache = TrieMap.empty[(SparkSession, String), TokenRels]
  private val annCache = TrieMap.empty[(SparkSession, String), AnnRels]
  private val imageCache = TrieMap.empty[(SparkSession, String), ImageRels]
  private val catalogCache = TrieMap.empty[(SparkSession, String), DataFrame]
  private val basketCache = TrieMap.empty[(SparkSession, String), DataFrame]

  /** Sessions whose application-end listener is installed. The caches
    * key by session object, which would otherwise strongly retain the
    * session and its checkpointed blocks for process lifetime in a
    * long-lived multi-session JVM — evict a session's entries when its
    * context ends. */
  private val hooked = TrieMap.empty[SparkSession, Unit]

  /** Conf key selecting reliable (fault-tolerant) staging. */
  val ReliableKey = "spark.graft.staged.reliable"

  /** Stage `df` with the session-configured durability: reliable
    * `checkpoint()` when [[ReliableKey]] is true (blocks land in the
    * context's checkpoint dir and survive executor loss), else
    * `localCheckpoint()` (executor storage — fastest, single-tenant).
    * Both lazy: first action materializes. */
  private def stage(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption(ReliableKey).contains("true"))
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)

  private def hookEviction(spark: SparkSession): Unit =
    hooked.getOrElseUpdate(spark, {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
              : Unit = {
            cache.filterInPlace { case ((s, _), _) => s ne spark }
            tokenCache.filterInPlace { case ((s, _), _) => s ne spark }
            annCache.filterInPlace { case ((s, _), _) => s ne spark }
            imageCache.filterInPlace { case ((s, _), _) => s ne spark }
            catalogCache.filterInPlace { case ((s, _), _) => s ne spark }
            basketCache.filterInPlace { case ((s, _), _) => s ne spark }
            hooked.remove(spark)
          }
        })
    })

  /** The staged dedup relations for the documents table under `sfDir`,
    * built on first request per (session, dir). */
  def dedup(spark: SparkSession, sfDir: String): DedupRels =
    cache.getOrElseUpdate((spark, sfDir), {
      hookEviction(spark)
      // spread the (locally single-split) corpus scan before the
      // shingle/fingerprint builds — the staged materialization
      // otherwise runs its explode+md5 passes on one core (Spread is a
      // no-op when the scan already has enough splits)
      val docs = graft.operators.Spread.byKey(
        Tables.documents(spark, sfDir), "doc_id")
      val sh = stage(Dedup.shingleHashes(docs))
      val sigs = stage(Dedup.signaturesFromHashes(sh))
      val verified = stage(Dedup.ngramJaccardFrom(sh, sigs))
      val simPairs = stage(Dedup.simhashDedup(docs))
      DedupRels(sh, sigs, verified, simPairs)
    })

  /** The staged token-family relations for the documents table under
    * `sfDir`, built on first request per (session, dir). */
  def tokens(spark: SparkSession, sfDir: String): TokenRels =
    tokenCache.getOrElseUpdate((spark, sfDir), {
      hookEviction(spark)
      // spread before the token/skip-gram/gopher builds (see dedup)
      val docs = graft.operators.Spread.byKey(
        Tables.documents(spark, sfDir), "doc_id")
      val toks = stage(TextAnalysis.tokensRel(docs))
      val freq = stage(TextAnalysis.tokenFreqFrom(toks))
      val skip = stage(TextAnalysis.skipgramsRel(docs))
      val gopher = stage(TextAnalysis.gopherQualityFrom(docs, toks))
      val winnow = stage(TextAnalysis.winnowSelectedSrc(docs))
      TokenRels(toks, freq, skip, gopher, winnow)
    })

  /** The staged ANN relations for the embeddings table under `sfDir`,
    * built on first request per (session, dir). */
  def ann(spark: SparkSession, sfDir: String): AnnRels =
    annCache.getOrElseUpdate((spark, sfDir), {
      hookEviction(spark)
      val emb = Tables.embeddings(spark, sfDir)
      val sub = stage(Similarity.annSubvectors(emb))
      val chain = Similarity.annLloydChain(sub) // rounds self-checkpoint
      val l2truth = stage(Similarity.annL2Truth(emb))
      val cosTruth = stage(Similarity.bruteTopK(emb))
      val assign = stage(Similarity.ivfAssign(emb))
      // the OPQ lane is deferred: opqPermArray's construction runs the
      // Dim-row means collect (one small job), paid only by the first
      // opq* consumer; the lazy vals memoize so it still runs once
      lazy val opqPerm = stage(Similarity.opqPermArray(emb))
      lazy val opqSub = stage(Similarity.opqSubvectorsFrom(emb, opqPerm))
      lazy val opqChain = Similarity.annLloydChain(opqSub)
      new AnnRels(sub, chain, l2truth, cosTruth, assign,
        () => opqPerm, () => opqSub, () => opqChain)
    })

  /** The staged image-lane relations for the documents table under
    * `sfDir`, built on first request per (session, dir). */
  def images(spark: SparkSession, sfDir: String): ImageRels =
    imageCache.getOrElseUpdate((spark, sfDir), {
      hookEviction(spark)
      val docs = Tables.documents(spark, sfDir)
      val imgs = stage(Multimodal.imageTable(docs))
      val fps = stage(Multimodal.imageFingerprints(imgs))
      ImageRels(imgs, fps)
    })

  /** The audited (table, column) grid as (name, projected table) pairs
    * — shared by the staged histogram and the sketch side of the gate. */
  def catalogGrid(spark: SparkSession, sfDir: String)
  : Seq[(String, org.apache.spark.sql.DataFrame)] =
    graft.operators.Snapshot.CatalogColumns.map { case (t, cols) =>
      t -> Tables.table(spark, sfDir, t)
        .select(cols.map(org.apache.spark.sql.functions.col): _*)
    }

  /** The staged ANALYZE histogram (table, column, value, cnt) for the
    * audited catalog grid under `sfDir` — the per-column value
    * histogram an ANALYZE pass persists, built on first request per
    * (session, dir). Feeds catalog_stats' exact rollup and the exact
    * side of the sketch gate; the sketch side always recomputes from
    * raw rows. */
  def catalog(spark: SparkSession, sfDir: String): DataFrame =
    catalogCache.getOrElseUpdate((spark, sfDir), {
      hookEviction(spark)
      stage(graft.operators.Snapshot.catalogHistogram(
        catalogGrid(spark, sfDir)))
    })

  /** The staged per-order brand-basket relation (okey, sorted brand
    * array) for the star schema under `sfDir` — the one corpus-sized
    * pass of the brand-graph family (market_basket, brand_pagerank,
    * brand_triangles), built on first request per (session, dir). */
  def baskets(spark: SparkSession, sfDir: String): DataFrame =
    basketCache.getOrElseUpdate((spark, sfDir), {
      hookEviction(spark)
      stage(graft.operators.Analytics.basketsRel(
        Tables.part(spark, sfDir), Tables.lineitem(spark, sfDir)))
    })

  /** Drop all staged entries (block-manager copies are reclaimed by the
    * context cleaner once unreferenced). For in-place corpus rewrites
    * within a session — tests and the amplify lane. */
  def invalidate(): Unit = {
    cache.clear(); tokenCache.clear(); annCache.clear(); imageCache.clear()
    catalogCache.clear(); basketCache.clear()
  }

  /** The UNSTAGED build expressions of every relation this object
    * materializes — the plans that actually EXECUTE at materialization
    * time, which the checkpoint boundary hides from every consumer
    * query's own plan. One registry feeds both the audit dump
    * (PlanAudit's `staged:*` blocks → PLANS.md's STAGED-PLANS table)
    * and the CI shape gate (PlanSpec), so a build chain cannot go
    * unaudited. The boolean marks builds whose DECLARED shape includes
    * a tiny-broadcast nested-loop (the 8-query / 16-centroid ANN
    * fan-outs — same allowance as ann_topk/ivf_assign); all others
    * must be nested-loop-free. NOTE: constructing `annChain` runs the
    * chain builder's own per-round checkpoints (cheap at audit scale).
    */
  def buildPlans(spark: SparkSession, sfDir: String)
  : Seq[(String, Boolean, () => DataFrame)] = {
    // same scan spread as the dedup/tokens builders above — the audit
    // must show the plans that actually execute at materialization
    val docs = graft.operators.Spread.byKey(
      Tables.documents(spark, sfDir), "doc_id")
    lazy val sh = Dedup.shingleHashes(docs)
    lazy val sigs = Dedup.signaturesFromHashes(sh)
    lazy val toks = TextAnalysis.tokensRel(docs)
    val emb = Tables.embeddings(spark, sfDir)
    lazy val annSub = Similarity.annSubvectors(emb)
    Seq(
      ("staged:sh", false, () => sh),
      ("staged:sigs", false, () => sigs),
      ("staged:verified", false, () => Dedup.ngramJaccardFrom(sh, sigs)),
      ("staged:simPairs", false, () => Dedup.simhashDedup(docs)),
      ("staged:tokens", false, () => toks),
      ("staged:freq", false, () => TextAnalysis.tokenFreqFrom(toks)),
      ("staged:skipgrams", false, () => TextAnalysis.skipgramsRel(docs)),
      ("staged:gopher", false,
        () => TextAnalysis.gopherQualityFrom(docs, toks)),
      ("staged:winnow", false, () => TextAnalysis.winnowSelectedSrc(docs)),
      ("staged:annSub", false, () => annSub),
      // the chain's own rounds checkpoint at construction (stub plans),
      // so the audited row is ONE un-checkpointed round — the shape
      // every round executes
      ("staged:annRound", false,
        () => Similarity.annLloydRoundPlan(annSub)),
      ("staged:l2truth", true, () => Similarity.annL2Truth(emb)),
      ("staged:cosTruth", true, () => Similarity.bruteTopK(emb)),
      ("staged:assign", true, () => Similarity.ivfAssign(emb)),
      // the OPQ lane: the 1-row permutation build (its triangular
      // rank join is a broadcast nested-loop over the Dim-row grid)
      // and the permuted subvector explode (1-row broadcast cross)
      ("staged:opqPerm", true, () => Similarity.opqPermArray(emb)),
      ("staged:opqSub", true,
        () => Similarity.opqSubvectorsFrom(emb,
          Similarity.opqPermArray(emb))),
      ("staged:images", false, () => Multimodal.imageTable(docs)),
      ("staged:imageFps", false,
        () => Multimodal.imageFingerprints(Multimodal.imageTable(docs))),
      ("staged:catalogHist", false,
        () => graft.operators.Snapshot.catalogHistogram(
          catalogGrid(spark, sfDir))),
      ("staged:baskets", false,
        () => graft.operators.Analytics.basketsRel(
          Tables.part(spark, sfDir), Tables.lineitem(spark, sfDir))))
  }
}
