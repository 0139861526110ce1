package graft

/** DuckDB oracle SQL per query (see SURVEY.md §4 for the hash-stability
  * rules: bigint/string outputs only, epoch-ms arithmetic instead of raw
  * ns timestamps, CAST on every SUM because DuckDB sums to HUGEINT).
  */
object OracleSql {
  /** Hyperplane literals for the LSH oracles — same planes as
    * operators.Similarity; Double.toString round-trips exactly. */
  private def planeLit(p: Array[Double]): String =
    p.mkString("[", ", ", "]::DOUBLE[]")

  private lazy val bucketExpr: String =
    graft.operators.Similarity.hyperplanes.zipWithIndex.map { case (p, b) =>
      s"(CASE WHEN list_dot_product(v, ${planeLit(p)}) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
  import graft.functions.PortableHash.{sqlPermute, sqlPhash}
  import graft.operators.{Analytics, Curation, Dedup, Similarity, Temporal, TextAnalysis}

  /** SQL string literal escape for generated VALUES clauses. */
  private def esc(s: String) = "'" + s.replace("'", "''") + "'"

  /** PQ codebook as a VALUES relation pqcb(m, k, cv) — the literals
    * come from Similarity.pqCodebook itself (Double.toString
    * round-trips exactly), so the two engines share one codebook. */
  private lazy val pqCbValues: String = {
    import graft.operators.Similarity._
    (0 until PqM).flatMap(m => (0 until PqK).map(k =>
      s"($m, $k, ${planeLit(pqCodebook(m)(k))})")).mkString(",\n")
  }

  /** Left-associated squared subvector distance (same fold order as
    * the Column tree, so the doubles are bit-identical) over v/cv. */
  private lazy val pqSubDistSql: String =
    (1 to graft.operators.Similarity.PqSubDim)
      .map(i => s"(v[m * ${graft.operators.Similarity.PqSubDim} + $i] - cv[$i]) * " +
        s"(v[m * ${graft.operators.Similarity.PqSubDim} + $i] - cv[$i])")
      .mkString(" + ")

  /** Left-associated exact squared-L2 sum over qv/cv (64 dims) — the
    * ground-truth metric of pq_recall, same fold order as the Column
    * tree's zip_with/aggregate. */
  private lazy val l2SumSql: String =
    (1 to graft.operators.Similarity.Dim)
      .map(i => s"(qv[$i] - cv[$i]) * (qv[$i] - cv[$i])")
      .mkString(" + ")

  /** Trained-PQ CTE chain — the SQL twin of Similarity.pqTrain's
    * integer Lloyd rounds (Forgy seeds from vec_ids CentroidLo..+15,
    * e6 coordinates, truncated integer means, empty codewords keep
    * position). Ends at pt_r{Iters} (m, k, dim, c6_e6, n_members) and
    * pt_c{Iters} (m, k, c6 list). */
  private lazy val PqTrainCtes: String = {
    import graft.operators.Similarity._
    val sd = PqSubDim
    val rounds = lloydRoundsSql("pt")
    s"""pt_v6 AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS v6
       |  FROM embeddings),
       |pt_sub AS (SELECT vec_id, CAST(sm.m AS BIGINT) AS m,
       |    list_transform(generate_series(1, $sd),
       |      i -> v6[sm.m * $sd + i]) AS sv6
       |  FROM pt_v6, UNNEST(generate_series(0, ${PqM - 1})) AS sm(m)
       |  WHERE vec_id >= $QueryCount),
       |pt_c0 AS (SELECT m, vec_id - $CentroidLo AS k, sv6 AS c6
       |  FROM pt_sub
       |  WHERE vec_id BETWEEN $CentroidLo AND ${CentroidLo + PqK - 1}),
       |$rounds""".stripMargin
  }

  /** One Lloyd round's named relation bodies over `${p}_sub`
    * (vec_id, m, sv6) and the previous round's `${p}_c{r-1}`
    * (m, k, c6) — six (name, body) pairs ending at `${p}_r$r`
    * (m, k, dim, c6_e6, n_members) and `${p}_c$r` (m, k, c6 list).
    * One source of truth for both the CTE-chain assembly (the recall
    * consumers) and the TEMP-TABLE staged assembly (pq_train's
    * memory-robust oracle). */
  private def lloydRoundDefs(p: String, r: Int): Seq[(String, String)] = {
    import graft.operators.Similarity._
    val sd = PqSubDim
    val intL2 = (a: String, b: String) =>
      s"list_sum(list_transform(generate_series(1, $sd), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    val prev = s"${p}_c${r - 1}"
    Seq(
      s"${p}_d$r" ->
        s"""SELECT s.vec_id, s.m, c.k,
           |    ${intL2("s.sv6", "c.c6")} AS d12
           |  FROM ${p}_sub s JOIN $prev c ON s.m = c.m""".stripMargin,
      s"${p}_a$r" ->
        s"""SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d12, k)
           |      AS rn FROM ${p}_d$r) t WHERE rn = 1""".stripMargin,
      s"${p}_m$r" ->
        s"""SELECT a.m, a.k, CAST(d.i AS BIGINT) - 1 AS dim,
           |    CAST(SUM(s.sv6[d.i]) AS BIGINT) AS s6,
           |    CAST(COUNT(*) AS BIGINT) AS n
           |  FROM ${p}_a$r a JOIN ${p}_sub s
           |      ON a.vec_id = s.vec_id AND a.m = s.m,
           |    UNNEST(generate_series(1, $sd)) AS d(i)
           |  GROUP BY 1, 2, 3""".stripMargin,
      s"${p}_g$r" ->
        s"""SELECT c.m, c.k, CAST(d.i AS BIGINT) - 1 AS dim,
           |    c.c6[d.i] AS old6
           |  FROM $prev c, UNNEST(generate_series(1, $sd)) AS d(i)""".stripMargin,
      s"${p}_r$r" ->
        s"""SELECT g.m, g.k, g.dim,
           |    CAST(COALESCE((mm.s6 - mm.s6 % mm.n) // mm.n, g.old6)
           |      AS BIGINT) AS c6_e6,
           |    CAST(COALESCE(mm.n, 0) AS BIGINT) AS n_members
           |  FROM ${p}_g$r g LEFT JOIN ${p}_m$r mm
           |    ON mm.m = g.m AND mm.k = g.k AND mm.dim = g.dim""".stripMargin,
      s"${p}_c$r" ->
        s"""SELECT m, k, list(c6_e6 ORDER BY dim) AS c6
           |  FROM ${p}_r$r GROUP BY 1, 2""".stripMargin)
  }

  /** [[graft.operators.Similarity.PqTrainIters]] Lloyd-round CTEs over
    * `${p}_sub` (vec_id, m, sv6), seeded from `${p}_c0` (m, k, c6) —
    * ends at `${p}_r{Iters}` (m, k, dim, c6_e6, n_members) and
    * `${p}_c{Iters}` (m, k, c6 list). Shared by the raw-vector chain
    * (prefix pt) and the residual chain (prefix rr). */
  private def lloydRoundsSql(p: String): String = {
    import graft.operators.Similarity._
    (1 to PqTrainIters)
      .flatMap(r => lloydRoundDefs(p, r))
      .map { case (name, body) => s"$name AS ($body)" }
      .mkString(",\n")
  }

  /** Self-carried DuckDB resource bounds for the heavy iterated vector
    * oracles: a spill directory plus a hard memory cap, so the 4-round
    * Lloyd replays stay robust inside the DRIVER's checker even when a
    * co-resident Spark JVM holds most of the host's RAM (the observed
    * r8 `pq_train` "bad allocation" flake). Multi-statement oracles are
    * supported by both `con.sql` and `con.execute` — the result of the
    * final SELECT is what the checker compares. */
  private val DuckBounds: String =
    "SET temp_directory='/tmp/graft_duckdb_spill';\n" +
      "SET memory_limit='16GB';\n" +
      "SET threads=4;\n"

  /** Re-settable subset of [[DuckBounds]] for every bounded oracle
    * AFTER the alphabetically first one: DuckDB refuses ANY
    * `SET temp_directory` once the session has spilled ("Cannot
    * switch temporary directory after the current one has been
    * used") — even to the same path — so only the session's FIRST
    * oracle may set the spill dir; memory/thread caps re-set safely
    * at any point. Observed at the 10× amplified run: the dedup
    * chain spilled mid-session and every later temp_directory SET
    * errored. */
  private val DuckSoftBounds: String =
    "SET memory_limit='16GB';\n" +
      "SET threads=4;\n"

  /** Per-dim variance diagonal + OPQ snake-permutation CTEs (prefix
    * `p`), reading `${p}_base` (vec_id, v6 e6-list over ALL
    * embeddings): ends at `${p}_dv` (dim, var_e12 — embed_covariance's
    * diagonal, same truncated-mean/-div arithmetic), `${p}_pm`
    * (olddim, newpos — rank by (var desc, dim) via triangular count,
    * dealt snake-wise across the M subspaces) and `${p}_pv` (the 1-row
    * permutation list pv with pv[newpos+1] = olddim). The SQL twin of
    * Similarity.opqPermFrom/opqPermArr. */
  private def opqPermCtes(p: String): String = {
    import graft.operators.Similarity.{Dim, PqM, PqSubDim}
    s"""${p}_x AS (SELECT vec_id, CAST(d.i AS BIGINT) - 1 AS dim,
       |    v6[d.i] AS x6
       |  FROM ${p}_base, UNNEST(generate_series(1, $Dim)) AS d(i)),
       |${p}_mn AS (SELECT dim,
       |    (SUM(x6) - SUM(x6) % COUNT(*)) // COUNT(*) AS mean6
       |  FROM ${p}_x GROUP BY 1),
       |${p}_cc AS (SELECT x.dim, (x6 - mean6) * (x6 - mean6) AS c2
       |  FROM ${p}_x x JOIN ${p}_mn USING (dim)),
       |${p}_dv AS (SELECT dim,
       |    CAST((SUM(c2) - SUM(c2) % COUNT(*)) // COUNT(*) AS BIGINT)
       |      AS var_e12
       |  FROM ${p}_cc GROUP BY 1),
       |${p}_rk AS (SELECT a.dim AS olddim, CAST(COUNT(b.dim) AS BIGINT)
       |      AS r0
       |  FROM ${p}_dv a LEFT JOIN ${p}_dv b
       |    ON b.var_e12 > a.var_e12
       |      OR (b.var_e12 = a.var_e12 AND b.dim < a.dim)
       |  GROUP BY 1),
       |${p}_pm AS (SELECT olddim,
       |    (CASE WHEN (r0 // $PqM) % 2 = 0 THEN r0 % $PqM
       |          ELSE ${PqM - 1} - r0 % $PqM END) * $PqSubDim
       |      + r0 // $PqM AS newpos
       |  FROM ${p}_rk),
       |${p}_pv AS (SELECT list(olddim ORDER BY newpos) AS pv
       |  FROM ${p}_pm)""".stripMargin
  }

  /** pq_train's staged oracle: the same Lloyd rounds as
    * [[lloydRoundsSql]] (identical per-round bodies via
    * [[lloydRoundDefs]]) but materialized one round at a time into TEMP
    * TABLEs, so DuckDB's peak working set is a single round instead of
    * the whole 4-round CTE pyramid. Ends with the final SELECT over
    * `pt_r{Iters}`. */
  private lazy val PqTrainTempSql: String = {
    import graft.operators.Similarity._
    val sd = PqSubDim
    val stage =
      s"""CREATE OR REPLACE TEMP TABLE pt_v6 AS
         |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
         |    x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS v6
         |  FROM embeddings;
         |CREATE OR REPLACE TEMP TABLE pt_sub AS
         |  SELECT vec_id, CAST(sm.m AS BIGINT) AS m,
         |    list_transform(generate_series(1, $sd),
         |      i -> v6[sm.m * $sd + i]) AS sv6
         |  FROM pt_v6, UNNEST(generate_series(0, ${PqM - 1})) AS sm(m)
         |  WHERE vec_id >= $QueryCount;
         |CREATE OR REPLACE TEMP TABLE pt_c0 AS
         |  SELECT m, vec_id - $CentroidLo AS k, sv6 AS c6
         |  FROM pt_sub
         |  WHERE vec_id BETWEEN $CentroidLo AND ${CentroidLo + PqK - 1};""".stripMargin
    val rounds = (1 to PqTrainIters).map { r =>
      val defs = lloydRoundDefs("pt", r)
      val inner = defs.dropRight(2)
      val (rName, rBody) = defs(defs.length - 2)
      val (cName, cBody) = defs.last
      val withClause = inner
        .map { case (name, body) => s"$name AS ($body)" }
        .mkString(",\n")
      s"""CREATE OR REPLACE TEMP TABLE $rName AS
         |WITH $withClause
         |$rBody;
         |CREATE OR REPLACE TEMP TABLE $cName AS
         |$cBody;""".stripMargin
    }.mkString("\n")
    s"""$DuckSoftBounds$stage
       |$rounds
       |SELECT m, k, dim, c6_e6, n_members FROM pt_r$PqTrainIters""".stripMargin
  }

  /** bpe_train_curve's staged oracle — the pq_train discipline applied
    * to text: each merge round materializes its winning pair and merged
    * vocabulary as TEMP tables (bt_top{r}, bt_v{r}), so DuckDB's peak
    * working set is one vocabulary copy instead of an 8-round CTE
    * pyramid; the final SELECT unions the per-round compression rows.
    * Same round bodies as Similarity's Lloyd staging convention; the
    * fresh merge symbols are the SAME private-use codepoints as
    * TextAnalysis.bpeSym (chr(57344 + r − 1)). */
  private lazy val BpeTrainTempSql: String = {
    import graft.operators.TextAnalysis.BpeTrainRounds
    val rounds = (1 to BpeTrainRounds).map { r =>
      s"""CREATE OR REPLACE TEMP TABLE bt_top$r AS
         |  SELECT substr(t, u.i, 2) AS pair,
         |    CAST(SUM(tf) AS BIGINT) AS pair_n
         |  FROM bt_v${r - 1}, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
         |  WHERE len(t) >= 2
         |  GROUP BY 1 ORDER BY pair_n DESC, pair LIMIT 1;
         |CREATE OR REPLACE TEMP TABLE bt_v$r AS
         |  SELECT replace(v.t, p.pair, chr(${0xE000 + r - 1})) AS t, v.tf
         |  FROM bt_v${r - 1} v, bt_top$r p;""".stripMargin
    }.mkString("\n")
    val sel = (1 to BpeTrainRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS iter, p.pair, p.pair_n,
         |  (SELECT CAST(SUM(tf * len(t)) AS BIGINT) FROM bt_v$r)
         |    AS chars_after
         |FROM bt_top$r p""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""${DuckSoftBounds}CREATE OR REPLACE TEMP TABLE bt_v0 AS
       |  SELECT t.t AS t, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)
       |  GROUP BY 1;
       |$rounds
       |$sel""".stripMargin
  }

  /** knn_recall's staged oracle: the IVF-blocked graph, its NN-descent
    * repair and the brute-force truth are materialized as TEMP TABLEs,
    * and the N² truth is accumulated in [[KnnTruthBlocks]] source-hash
    * blocks so DuckDB's peak working set (and spill footprint) is 1/B
    * of the all-pairs volume — the single-query form exhausted the
    * spill device at the 30× amplified run. Blocking partitions by
    * src, so each source's top-K window is computed whole; the rows
    * are identical to the unblocked form. */
  private lazy val KnnRecallTempSql: String = {
    import graft.operators.Similarity.KnnK
    val B = KnnTruthBlocks
    // per block: materialize the compact (src, nbr, sim) triples FIRST
    // (24 bytes/row), THEN window — piping the join straight into the
    // window carries two 64-double vectors per pair and blew the 16GB
    // cap at 30× even though only the sim survives the projection
    val blocks = (0 until B).map { i =>
      s"""CREATE OR REPLACE TEMP TABLE kr_blk AS
         |SELECT l.vec_id AS src_id, r.vec_id AS nbr_id,
         |  CAST(ROUND(list_cosine_similarity(l.v, r.v) * 1000000)
         |    AS BIGINT) AS sim_e6
         |FROM kr_cand l JOIN kr_cand r ON l.vec_id <> r.vec_id
         |WHERE l.vec_id % $B = $i;
         |INSERT INTO kr_truth
         |SELECT src_id, nbr_id FROM (
         |  SELECT src_id, nbr_id,
         |    ROW_NUMBER() OVER (PARTITION BY src_id
         |      ORDER BY sim_e6 DESC, nbr_id) AS rn
         |  FROM kr_blk) t
         |WHERE rn <= $KnnK;""".stripMargin
    }.mkString("\n") + "\nDROP TABLE kr_blk;"
    s"""${DuckSoftBounds}CREATE OR REPLACE TEMP TABLE kr_cand AS
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id >= 8;
       |CREATE OR REPLACE TEMP TABLE kr_base AS
       |WITH $KnnGraphCtes
       |SELECT src_id, nbr_id FROM knn;
       |CREATE OR REPLACE TEMP TABLE kr_refined AS
       |WITH bk AS (SELECT vec_id, v, $bucketExpr AS bucket FROM kr_cand),
       |lp AS (SELECT l.vec_id AS src_id, r.vec_id AS nbr_id,
       |    CAST(ROUND(list_cosine_similarity(l.v, r.v) * 1000000)
       |      AS BIGINT) AS sim_e6
       |  FROM bk l JOIN bk r
       |    ON l.bucket = r.bucket AND l.vec_id <> r.vec_id),
       |lsh AS (SELECT src_id, nbr_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
       |      ORDER BY sim_e6 DESC, nbr_id) AS rn FROM lp) t
       |  WHERE rn <= $KnnK),
       |ed AS (SELECT src_id, nbr_id FROM kr_base
       |  UNION SELECT src_id, nbr_id FROM lsh),
       |und AS (SELECT src_id, nbr_id FROM ed
       |  UNION SELECT nbr_id, src_id FROM ed),
       |ex AS (
       |  SELECT a.src_id, b.nbr_id AS cand_id
       |  FROM und a JOIN und b ON a.nbr_id = b.src_id
       |  WHERE a.src_id <> b.nbr_id
       |  UNION
       |  SELECT src_id, nbr_id FROM ed),
       |sc AS (SELECT x.src_id, x.cand_id,
       |    CAST(ROUND(list_cosine_similarity(l.v, r.v) * 1000000)
       |      AS BIGINT) AS sim_e6
       |  FROM ex x JOIN kr_cand l ON x.src_id = l.vec_id
       |    JOIN kr_cand r ON x.cand_id = r.vec_id)
       |SELECT src_id, cand_id AS nbr_id FROM (
       |    SELECT src_id, cand_id,
       |      ROW_NUMBER() OVER (PARTITION BY src_id
       |        ORDER BY sim_e6 DESC, cand_id) AS rn FROM sc) t
       |  WHERE rn <= $KnnK;
       |CREATE OR REPLACE TEMP TABLE kr_truth (
       |  src_id BIGINT, nbr_id BIGINT);
       |$blocks
       |WITH tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth
       |  FROM kr_truth)
       |SELECT 'ivf_blocked' AS variant, n_truth,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM kr_base b
       |    JOIN kr_truth t ON b.src_id = t.src_id
       |      AND b.nbr_id = t.nbr_id) AS n_hit,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM kr_base b
       |    JOIN kr_truth t ON b.src_id = t.src_id
       |      AND b.nbr_id = t.nbr_id) * 1000 // n_truth AS recall_milli
       |FROM tt
       |UNION ALL
       |SELECT 'nn_descent', n_truth,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM kr_refined b
       |    JOIN kr_truth t ON b.src_id = t.src_id
       |      AND b.nbr_id = t.nbr_id),
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM kr_refined b
       |    JOIN kr_truth t ON b.src_id = t.src_id
       |      AND b.nbr_id = t.nbr_id) * 1000 // n_truth
       |FROM tt""".stripMargin
  }

  /** Source-hash block count for [[KnnRecallTempSql]]'s truth
    * accumulation — purely an oracle-resource knob (the Spark side
    * computes its own truth), so it is not a shared engine constant:
    * any B yields identical rows because blocks partition by src. */
  private val KnnTruthBlocks = 8

  /** pq_recall_residual's staged oracle: the coarse-quantizer Lloyd
    * rounds, the residual computation, the residual-codebook Lloyd
    * rounds and the ADC scoring each materialize into TEMP TABLEs
    * (the pq_train discipline), so DuckDB's peak working set is a
    * single stage instead of the whole two-pyramid CTE chain — the
    * single-query form hit the 16GB cap at the 30× amplified run.
    * Round bodies are IDENTICAL to the previous inline form: the
    * coarse rounds from the same rkd/rka/rkm/rkg templates, the
    * residual rounds from the shared [[lloydRoundDefs]]. */
  private lazy val PqResidualTempSql: String = {
    import graft.operators.Similarity.{CentroidLo, Dim, IvfTrainRounds,
      NumCentroids, PqK, PqM, PqSubDim, PqTrainIters, QueryCount,
      ResidualSeedLo, TopK}
    val k = TopK
    val sd = PqSubDim
    val seedHi = ResidualSeedLo + PqK - 1
    val intL2d = (a: String, b: String) =>
      s"list_sum(list_transform(generate_series(1, $Dim), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    val intL2s = (a: String, b: String) =>
      s"list_sum(list_transform(generate_series(1, $sd), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    // one TEMP TABLE per coarse k-means round (64-dim, keep-old-on-empty)
    val kmStages = (1 to IvfTrainRounds).map { r =>
      val prev = s"rc${r - 1}"
      s"""CREATE OR REPLACE TEMP TABLE rc$r AS
         |WITH rkd$r AS (SELECT v.vec_id, c.centroid_id,
         |    ${intL2d("v.v6", "c.c6")} AS d12
         |  FROM rve v, $prev c),
         |rka$r AS (SELECT vec_id, centroid_id FROM (
         |  SELECT vec_id, centroid_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY d12, centroid_id) AS rn FROM rkd$r) t
         |  WHERE rn = 1),
         |rkm$r AS (SELECT t.centroid_id, CAST(d.i AS BIGINT) - 1 AS dim,
         |    CAST(SUM(t.v6[d.i]) AS BIGINT) AS s,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM (SELECT a.centroid_id, v.v6 FROM rka$r a
         |        JOIN rve v USING (vec_id)) t,
         |    UNNEST(generate_series(1, $Dim)) AS d(i)
         |  GROUP BY 1, 2),
         |rkg$r AS (SELECT c.centroid_id, CAST(d.i AS BIGINT) - 1 AS dim,
         |    c.c6[d.i] AS old6
         |  FROM $prev c, UNNEST(generate_series(1, $Dim)) AS d(i))
         |SELECT g.centroid_id,
         |    list(CAST(COALESCE((m.s - m.s % m.n) // m.n, g.old6)
         |      AS BIGINT) ORDER BY g.dim) AS c6
         |  FROM rkg$r g LEFT JOIN rkm$r m
         |    ON m.centroid_id = g.centroid_id AND m.dim = g.dim
         |  GROUP BY 1;""".stripMargin
    }.mkString("\n")
    val cfin = s"rc$IvfTrainRounds"
    // one TEMP TABLE pair per residual Lloyd round (shared bodies)
    val rrStages = (1 to PqTrainIters).map { r =>
      val defs = lloydRoundDefs("rr", r)
      val inner = defs.dropRight(2)
      val (rName, rBody) = defs(defs.length - 2)
      val (cName, cBody) = defs.last
      val withClause = inner
        .map { case (name, body) => s"$name AS ($body)" }
        .mkString(",\n")
      s"""CREATE OR REPLACE TEMP TABLE $rName AS
         |WITH $withClause
         |$rBody;
         |CREATE OR REPLACE TEMP TABLE $cName AS
         |$cBody;""".stripMargin
    }.mkString("\n")
    val fin = s"rr_c$PqTrainIters"
    s"""${DuckSoftBounds}CREATE OR REPLACE TEMP TABLE rr_all6 AS
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS v6
       |  FROM embeddings;
       |CREATE OR REPLACE TEMP TABLE rve AS
       |  SELECT vec_id, v6 FROM rr_all6 WHERE vec_id >= $QueryCount;
       |CREATE OR REPLACE TEMP TABLE rc0 AS
       |  SELECT vec_id - $CentroidLo AS centroid_id, v6 AS c6
       |  FROM rr_all6 WHERE vec_id BETWEEN $CentroidLo
       |    AND ${CentroidLo + NumCentroids - 1};
       |$kmStages
       |CREATE OR REPLACE TEMP TABLE rassign AS
       |  SELECT vec_id, centroid_id FROM (
       |  SELECT v.vec_id, c.centroid_id,
       |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${intL2d("v.v6", "c.c6")}, c.centroid_id) AS rn
       |  FROM rve v, $cfin c) t WHERE rn = 1;
       |CREATE OR REPLACE TEMP TABLE rr_sub AS
       |WITH rres AS (SELECT a.vec_id,
       |    list_transform(generate_series(1, $Dim),
       |      i -> v.v6[i] - c.c6[i]) AS v6
       |  FROM rassign a JOIN rve v USING (vec_id)
       |    JOIN $cfin c USING (centroid_id))
       |SELECT vec_id, CAST(sm.m AS BIGINT) AS m,
       |    list_transform(generate_series(1, $sd),
       |      i -> v6[sm.m * $sd + i]) AS sv6
       |  FROM rres, UNNEST(generate_series(0, ${PqM - 1})) AS sm(m);
       |CREATE OR REPLACE TEMP TABLE rr_c0 AS
       |  SELECT m, vec_id - $ResidualSeedLo AS k, sv6 AS c6
       |  FROM rr_sub
       |  WHERE vec_id BETWEEN $ResidualSeedLo AND $seedHi;
       |$rrStages
       |CREATE OR REPLACE TEMP TABLE rcodes AS
       |WITH rde AS (SELECT s.vec_id, s.m, c.k,
       |    ${intL2s("s.sv6", "c.c6")} AS d12
       |  FROM rr_sub s JOIN $fin c ON s.m = c.m)
       |SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d12, k)
       |      AS rn FROM rde) t WHERE rn = 1;
       |CREATE OR REPLACE TEMP TABLE rqres AS
       |WITH rqs AS (SELECT vec_id AS q_id, CAST(sm.m AS BIGINT) AS m,
       |    list_transform(generate_series(1, $sd),
       |      i -> v6[sm.m * $sd + i]) AS qv6
       |  FROM rr_all6, UNNEST(generate_series(0, ${PqM - 1})) AS sm(m)
       |  WHERE vec_id < $QueryCount),
       |rcs AS (SELECT centroid_id, CAST(sm.m AS BIGINT) AS m,
       |    list_transform(generate_series(1, $sd),
       |      i -> c6[sm.m * $sd + i]) AS cs6
       |  FROM $cfin, UNNEST(generate_series(0, ${PqM - 1})) AS sm(m))
       |SELECT q.q_id, c.centroid_id, q.m,
       |    list_transform(generate_series(1, $sd),
       |      i -> q.qv6[i] - c.cs6[i]) AS qr6
       |  FROM rqs q JOIN rcs c ON q.m = c.m;
       |CREATE OR REPLACE TEMP TABLE rap AS
       |WITH rsc AS (SELECT r.q_id, a.vec_id,
       |    CAST(SUM(${intL2s("r.qr6", "c.c6")}) AS BIGINT) AS dist
       |  FROM rcodes a JOIN rassign s ON a.vec_id = s.vec_id
       |    JOIN $fin c ON a.m = c.m AND a.k = c.k
       |    JOIN rqres r ON r.centroid_id = s.centroid_id AND r.m = a.m
       |  GROUP BY 1, 2)
       |SELECT q_id, vec_id AS cand_id FROM (SELECT q_id, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, vec_id)
       |      AS rn FROM rsc) t WHERE rn <= $k;
       |WITH pe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |rtq AS (SELECT vec_id AS q_id, v AS qv FROM pe
       |  WHERE vec_id < $QueryCount),
       |rtc AS (SELECT vec_id AS cand_id, v AS cv FROM pe
       |  WHERE vec_id >= $QueryCount),
       |rtr AS (SELECT q_id, cand_id FROM (SELECT q_id, cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY CAST(ROUND(($l2SumSql) * 1e9) AS BIGINT), cand_id)
       |      AS rn FROM rtq, rtc) t WHERE rn <= $k),
       |rh AS (SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits
       |  FROM rtr t JOIN rap a
       |    ON t.q_id = a.q_id AND t.cand_id = a.cand_id
       |  GROUP BY 1)
       |SELECT b.q_id, COALESCE(h.n_hits, 0) AS n_hits,
       |  (COALESCE(h.n_hits, 0) * 1000) // $k AS recall_milli
       |FROM (SELECT DISTINCT q_id FROM rtr) b
       |LEFT JOIN rh h USING (q_id)""".stripMargin
  }

  /** embed_covariance's SQL — standalone oracle AND the staging input
    * of [[AnisotropyTempSql]] (same text, so the two cannot drift). */
  private lazy val EmbedCovBody: String = {
    import graft.operators.Similarity.Dim
    s"""WITH v AS (SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS v6
       |  FROM embeddings),
       |x AS (SELECT vec_id, CAST(d.i AS BIGINT) - 1 AS dim, v6[d.i] AS x6
       |  FROM v, UNNEST(generate_series(1, $Dim)) AS d(i)),
       |m AS (SELECT dim,
       |    (SUM(x6) - SUM(x6) % COUNT(*)) // COUNT(*) AS mean6
       |  FROM x GROUP BY 1),
       |c AS (SELECT vec_id, dim, x6 - mean6 AS c6
       |  FROM x JOIN m USING (dim)),
       |p AS (SELECT a.dim AS dim_a, b.dim AS dim_b, a.c6 * b.c6 AS pr
       |  FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.dim <= b.dim)
       |SELECT dim_a, dim_b,
       |  CAST((SUM(pr) - SUM(pr) % COUNT(*)) // COUNT(*) AS BIGINT)
       |    AS cov_e12
       |FROM p GROUP BY 1, 2""".stripMargin
  }

  /** anisotropy_audit's staged oracle: the covariance matrix (the
    * embed_covariance SQL verbatim) symmetrized and e6-truncated, then
    * the SAME integer power-iteration rounds as
    * Similarity.anisotropyAudit materialized one round per TEMP TABLE;
    * every division uses the (x - x % d) // d truncation form so the
    * DuckDB floor-division and Scala's truncating `/` agree on
    * negative intermediates. */
  private lazy val AnisotropyTempSql: String = {
    import graft.operators.Similarity.{Dim, PowerIters}
    val stage =
      s"""CREATE OR REPLACE TEMP TABLE aw_m AS
         |WITH cov AS (
         |$EmbedCovBody
         |)
         |SELECT dim_a AS a, dim_b AS b,
         |  (cov_e12 - cov_e12 % 1000000) // 1000000 AS m6 FROM cov
         |UNION ALL
         |SELECT dim_b, dim_a,
         |  (cov_e12 - cov_e12 % 1000000) // 1000000 FROM cov
         |WHERE dim_a <> dim_b;
         |CREATE OR REPLACE TEMP TABLE aw_v0 AS
         |SELECT CAST(d.i AS BIGINT) AS dim, CAST(1000000 AS BIGINT) AS v
         |FROM UNNEST(generate_series(0, ${Dim - 1})) AS d(i);""".stripMargin
    val rounds = (1 to PowerIters).map { r =>
      s"""CREATE OR REPLACE TEMP TABLE aw_w$r AS
         |SELECT m.a AS dim, SUM(m.m6 * v.v) AS w
         |FROM aw_m m JOIN aw_v${r - 1} v ON v.dim = m.b GROUP BY 1;
         |CREATE OR REPLACE TEMP TABLE aw_v$r AS
         |SELECT dim, (w - w % mx.s) // mx.s AS v
         |FROM aw_w$r,
         |  (SELECT GREATEST(MAX(ABS(w)) // 1000000, 1) AS s
         |   FROM aw_w$r) mx;""".stripMargin
    }.mkString("\n")
    s"""$DuckSoftBounds$stage
       |$rounds
       |WITH wf AS (SELECT m.a AS dim, SUM(m.m6 * v.v) AS w
       |  FROM aw_m m JOIN aw_v$PowerIters v ON v.dim = m.b GROUP BY 1),
       |nd AS (SELECT
       |    SUM(v.v * ((w.w - w.w % 1000000) // 1000000)) AS num,
       |    SUM(v.v * v.v) AS den
       |  FROM aw_v$PowerIters v JOIN wf w USING (dim)),
       |tr AS (SELECT CAST(SUM(m6) AS BIGINT) AS trace_e6
       |  FROM aw_m WHERE a = b),
       |lam AS (SELECT CAST((num - num % ds) // ds AS BIGINT)
       |    AS lambda1_e6
       |  FROM (SELECT CAST(num AS BIGINT) AS num,
       |    CAST(GREATEST(den // 1000000, 1) AS BIGINT) AS ds FROM nd)),
       |tp AS (SELECT dim AS top_dim FROM aw_v$PowerIters
       |  ORDER BY ABS(v) DESC, dim LIMIT 1),
       |l1 AS (SELECT CAST(SUM(ABS(v)) AS BIGINT) AS v_l1
       |  FROM aw_v$PowerIters)
       |SELECT lambda1_e6, trace_e6,
       |  CAST((lambda1_e6 * 1000000
       |      - (lambda1_e6 * 1000000) % GREATEST(trace_e6, 1))
       |    // GREATEST(trace_e6, 1) AS BIGINT) AS anisotropy_ppm,
       |  top_dim, v_l1
       |FROM lam, tr, tp, l1""".stripMargin
  }

  /** mmr_diversify's staged oracle: shortlist and pairwise-sim tables,
    * then one TEMP TABLE per greedy MMR pick replaying the identical
    * integer argmax (λ·sim_q − (1−λ)·max-sim-to-picked, ties to the
    * smaller cand_id). */
  private lazy val MmrTempSql: String = {
    import graft.operators.Similarity.{MmrK, MmrLambdaPpm, MmrShort, QueryCount}
    val lam = MmrLambdaPpm
    val mu = 1000000L - lam
    val stage =
      s"""CREATE OR REPLACE TEMP TABLE mm_sl AS
         |WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e
         |  WHERE vec_id < $QueryCount),
         |c AS (SELECT vec_id AS cand_id, v AS cv FROM e
         |  WHERE vec_id >= $QueryCount),
         |s AS (SELECT q_id, cand_id, cv,
         |    CAST(ROUND(list_cosine_similarity(qv, cv) * 1000000)
         |      AS BIGINT) AS sq
         |  FROM q, c),
         |r AS (SELECT q_id, cand_id, cv, sq,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY sq DESC, cand_id) AS rn
         |  FROM s)
         |SELECT q_id, cand_id, cv, sq FROM r WHERE rn <= $MmrShort;
         |CREATE OR REPLACE TEMP TABLE mm_pm AS
         |SELECT a.q_id, a.cand_id AS id_a, b.cand_id AS id_b,
         |  CAST(ROUND(list_cosine_similarity(a.cv, b.cv) * 1000000)
         |    AS BIGINT) AS ps
         |FROM mm_sl a JOIN mm_sl b
         |  ON a.q_id = b.q_id AND a.cand_id <> b.cand_id;
         |CREATE OR REPLACE TEMP TABLE mm_sel0 AS
         |SELECT q_id, cand_id, CAST(0 AS BIGINT) AS rank
         |FROM mm_sl WHERE false;""".stripMargin
    val steps = (1 to MmrK).map { r =>
      s"""CREATE OR REPLACE TEMP TABLE mm_sel$r AS
         |SELECT * FROM mm_sel${r - 1}
         |UNION ALL
         |SELECT q_id, cand_id, CAST($r AS BIGINT) AS rank FROM (
         |  SELECT s.q_id, s.cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY s.q_id ORDER BY
         |      $lam * s.sq - $mu * COALESCE(mx.m, 0) DESC,
         |      s.cand_id) AS pick
         |  FROM mm_sl s
         |  LEFT JOIN (SELECT p.q_id, p.id_b AS cand_id, MAX(p.ps) AS m
         |      FROM mm_pm p JOIN mm_sel${r - 1} t
         |        ON t.q_id = p.q_id AND t.cand_id = p.id_a
         |      GROUP BY 1, 2) mx
         |    ON mx.q_id = s.q_id AND mx.cand_id = s.cand_id
         |  WHERE NOT EXISTS (SELECT 1 FROM mm_sel${r - 1} t
         |    WHERE t.q_id = s.q_id AND t.cand_id = s.cand_id)
         |) WHERE pick = 1;""".stripMargin
    }.mkString("\n")
    s"""$DuckSoftBounds$stage
       |$steps
       |SELECT s.q_id, s.rank, s.cand_id, l.sq AS sim_e6
       |FROM mm_sel$MmrK s JOIN mm_sl l
       |  ON l.q_id = s.q_id AND l.cand_id = s.cand_id""".stripMargin
  }

  /** market_basket's SQL — standalone oracle AND the edge-extraction
    * stage of [[BrandPagerankTempSql]] (same text, no drift). */
  /** Per-db running-balance rollup — ONE text pins the batch
    * balance_audit window form AND the streaming balanceParity
    * state-machine replay (the stream_merge_parity convention). */
  /** Compaction-plan SQL — twin of Ledger.compactionPlan, shared
    * verbatim by compaction_plan and stream_compaction_parity. */
  private lazy val CompactionSql: String = {
    val win = graft.operators.Ledger.CompactWinMs
    val tgt = graft.operators.Ledger.CompactTargetRows
    s"""WITH $CL,
       |f AS (SELECT 'db' || (user_id % 3) AS db,
       |    ems // $win AS win, CAST(COUNT(*) AS BIGINT) AS n_rows
       |  FROM cl GROUP BY 1, 2),
       |c AS (SELECT *, CAST(SUM(n_rows) OVER (PARTITION BY db
       |    ORDER BY win) AS BIGINT) AS cum FROM f),
       |b AS (SELECT db, (cum - 1) // $tgt AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n_files,
       |    CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
       |    CAST(MIN(win) AS BIGINT) AS first_win,
       |    CAST(MAX(win) AS BIGINT) AS last_win
       |  FROM c GROUP BY 1, 2)
       |SELECT db, bin, n_files, bin_rows, first_win, last_win,
       |  CAST(bin_rows * 1000000 // $tgt AS BIGINT) AS fill_ppm,
       |  CASE WHEN n_files = 1 AND bin_rows * 1000000 // $tgt >= 1000000
       |    THEN 'PASSTHROUGH' ELSE 'COMPACT' END AS verdict
       |FROM b""".stripMargin
  }

  /** Id-continuity audit SQL — twin of Ledger.sequenceGapAudit,
    * shared verbatim by sequence_gap_audit and the streaming
    * stream_gap_parity lane. */
  private lazy val SeqGapSql: String = {
    val b = graft.operators.Ledger.SeqBucket
    s"""WITH $CL,
       |g AS (SELECT event_id // $b AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(MIN(event_id) AS BIGINT) AS id_lo,
       |    CAST(MAX(event_id) AS BIGINT) AS id_hi
       |  FROM cl GROUP BY 1),
       |h AS (SELECT *, id_hi - id_lo + 1 - n_events AS missing_inside,
       |    COALESCE(id_lo - LAG(id_hi) OVER (ORDER BY bucket) - 1, 0)
       |      AS gap_before
       |  FROM g)
       |SELECT bucket, n_events, id_lo, id_hi, missing_inside,
       |  gap_before,
       |  CASE WHEN missing_inside = 0 AND gap_before = 0
       |    THEN 'CONTIGUOUS' ELSE 'GAPPED' END AS verdict
       |FROM h""".stripMargin
  }

  private lazy val BalanceAuditSql: String =
    s"""WITH $CL,
       |r AS (SELECT user_id, 'db' || (user_id % 3) AS db,
       |    CASE op WHEN 'I' THEN value_cents
       |      WHEN 'U' THEN -value_cents ELSE 0 END AS delta,
       |    SUM(CASE op WHEN 'I' THEN value_cents
       |      WHEN 'U' THEN -value_cents ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ems, event_id
       |        ROWS UNBOUNDED PRECEDING) AS bal
       |  FROM cl),
       |p AS (SELECT db, user_id, CAST(MIN(bal) AS BIGINT) AS min_bal,
       |    CAST(SUM(CASE WHEN bal < 0 AND bal - delta >= 0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS dips,
       |    CAST(SUM(delta) AS BIGINT) AS end_bal
       |  FROM r GROUP BY 1, 2)
       |SELECT db, CAST(COUNT(*) AS BIGINT) AS n_users,
       |  CAST(SUM(CASE WHEN min_bal < 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_overdrawn,
       |  MIN(min_bal) AS min_balance_cents,
       |  CAST(SUM(dips) AS BIGINT) AS n_dips,
       |  CAST(SUM(end_bal) AS BIGINT) AS end_balance_sum_cents
       |FROM p GROUP BY 1""".stripMargin

  private lazy val MarketBasketBody: String =
    """WITH b AS (SELECT DISTINCT l.l_orderkey AS okey,
      |    p.p_brand AS brand
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |bc AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM b GROUP BY 1),
      |no AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders
      |  FROM b),
      |pr AS (SELECT a.brand AS brand_a, c.brand AS brand_b,
      |    CAST(COUNT(*) AS BIGINT) AS support
      |  FROM b a JOIN b c ON a.okey = c.okey AND a.brand < c.brand
      |  GROUP BY 1, 2)
      |SELECT pr.brand_a, pr.brand_b, pr.support,
      |  ca.cnt AS cnt_a, cb.cnt AS cnt_b,
      |  CAST(pr.support * 1000000 // ca.cnt AS BIGINT) AS conf_ab_ppm,
      |  CAST(((pr.support * 1000000 // ca.cnt) * no.n_orders) // cb.cnt
      |    AS BIGINT) AS lift_ppm
      |FROM pr JOIN bc ca ON ca.brand = pr.brand_a
      |  JOIN bc cb ON cb.brand = pr.brand_b, no""".stripMargin

  /** brand_pagerank's staged oracle: the co-purchase edges (the
    * market_basket SQL verbatim) symmetrized, then the SAME damped
    * integer PageRank rounds as Analytics.brandPagerank, one TEMP
    * TABLE per round; per-edge contributions divide before summing so
    * both engines are edge-order-free. */
  private lazy val BrandPagerankTempSql: String = {
    import graft.operators.Analytics.{PrDampPpm, PrIters}
    val d = 1000000L - PrDampPpm
    val stage =
      s"""CREATE OR REPLACE TEMP TABLE pg_e AS
         |WITH mb AS (
         |$MarketBasketBody
         |)
         |SELECT brand_a AS a, brand_b AS b, support FROM mb
         |UNION ALL
         |SELECT brand_b, brand_a, support FROM mb;
         |CREATE OR REPLACE TEMP TABLE pg_ow AS
         |SELECT a AS brand, CAST(SUM(support) AS BIGINT) AS ow
         |FROM pg_e GROUP BY 1;
         |CREATE OR REPLACE TEMP TABLE pg_p0 AS
         |SELECT brand, CAST(1000000 AS BIGINT) AS pr FROM pg_ow;"""
        .stripMargin
    val rounds = (1 to PrIters).map { r =>
      s"""CREATE OR REPLACE TEMP TABLE pg_p$r AS
         |SELECT e.b AS brand,
         |  CAST($PrDampPpm + ($d *
         |      CAST(SUM((p.pr * e.support) // ow.ow) AS BIGINT))
         |    // 1000000 AS BIGINT) AS pr
         |FROM pg_e e
         |  JOIN pg_p${r - 1} p ON p.brand = e.a
         |  JOIN pg_ow ow ON ow.brand = e.a
         |GROUP BY 1;""".stripMargin
    }.mkString("\n")
    s"""$DuckSoftBounds$stage
       |$rounds
       |SELECT p.brand, p.pr AS pagerank_ppm, ow.ow AS out_weight,
       |  CAST(ROW_NUMBER() OVER (ORDER BY p.pr DESC, p.brand)
       |    AS BIGINT) AS rank
       |FROM pg_p$PrIters p JOIN pg_ow ow ON ow.brand = p.brand"""
      .stripMargin
  }

  /** Shared PQ CTE chain: pqe (vectors as DOUBLE[]), pqcb (codebook),
    * pqd (per-(vec, m, k) e9 distances), pqbest (rn=1 ⇒ the code). */
  private lazy val PqCodesCtes: String =
    s"""pqe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |pqcb(m, k, cv) AS (VALUES
       |$pqCbValues),
       |pqd AS (SELECT vec_id, m, k,
       |    CAST(ROUND(($pqSubDistSql) * 1e9) AS BIGINT) AS d9
       |  FROM pqe, pqcb),
       |pqbest AS (SELECT vec_id, m, k, d9,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d9, k) AS rn
       |  FROM pqd)""".stripMargin

  /** MinHash dedup CTE chain — the SQL twin of operators.Dedup
    * (shingle → portable hash → 64 universal-hash minhashes → 16-band
    * LSH buckets → bounded pair generation → exact Jaccard). The
    * band/threshold/star-cap constants come from Dedup itself so the
    * two engines cannot drift. */
  /** 64 min-permutation aggregate columns (m0..m63). */
  /** IVF-blocked exact kNN-graph CTE chain — twin of
    * Similarity.knnGraphFrom; ends in `knn(src_id, rank, nbr_id,
    * sim_e6)` with `cand` still in scope. Shared by knn_graph and
    * hubness_audit (nn_descent carries its own extended chain). */
  private def knnGraphCtes(srcPred: String): String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
       |         WHERE vec_id BETWEEN 8 AND 23),
       |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
       |assign AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT cand.vec_id, cent.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
       |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
       |    FROM cand, cent) t WHERE rn = 1),
       |vv AS (SELECT a.vec_id, a.centroid_id, c.v
       |  FROM assign a JOIN cand c ON a.vec_id = c.vec_id),
       |p AS (SELECT l.vec_id AS src_id, r.vec_id AS nbr_id,
       |    CAST(ROUND(list_cosine_similarity(l.v, r.v) * 1000000)
       |      AS BIGINT) AS sim_e6
       |  FROM vv l JOIN vv r
       |    ON l.centroid_id = r.centroid_id AND l.vec_id <> r.vec_id$srcPred),
       |knn AS (SELECT src_id, CAST(rn AS BIGINT) AS rank, nbr_id,
       |    sim_e6 FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
       |    ORDER BY sim_e6 DESC, nbr_id) AS rn FROM p) t
       |WHERE rn <= ${graft.operators.Similarity.KnnK})""".stripMargin

  private lazy val KnnGraphCtes: String = knnGraphCtes("")

  /** The probe-form src restriction (knn_recall_probe convention). */
  private lazy val KnnProbePred: String =
    s" AND l.vec_id < ${graft.operators.Similarity.KnnProbeHi}"

  private lazy val KnnGraphProbeCtes: String = knnGraphCtes(KnnProbePred)

  /** min-label propagation unrolled to the same fixed round count as
    * the Spark operator (the pq_train discipline). The kNN edge list
    * is materialized ONCE as a TEMP TABLE: the label-prop pyramid
    * references it 2 + 2·rounds times, and inlining the blocked-join
    * CTE that many times blew DuckDB's 16GB cap at the 10× amplified
    * run — staging caps peak memory at one knn build. Shared by the
    * full gate and its probe form (probe edges, full label census). */
  private def knnComponentsSql(tmp: String, ctes: String): String = {
    val rounds = (0 until graft.operators.Similarity.ClpRounds).map {
      r =>
        s"""nbr$r AS (SELECT u.src_id AS id, MIN(l$r.label) AS nl
           |  FROM u JOIN l$r ON u.nbr_id = l$r.id GROUP BY 1),
           |l${r + 1} AS (SELECT l$r.id,
           |    LEAST(l$r.label, COALESCE(nbr$r.nl, l$r.label)) AS label
           |  FROM l$r LEFT JOIN nbr$r USING (id))""".stripMargin
    }.mkString(",\n")
    val last = s"l${graft.operators.Similarity.ClpRounds}"
    s"""${DuckSoftBounds}CREATE OR REPLACE TEMP TABLE $tmp AS
       |WITH $ctes
       |SELECT src_id, nbr_id FROM knn;
       |WITH u AS (SELECT src_id, nbr_id FROM $tmp
       |  UNION SELECT nbr_id, src_id FROM $tmp),
       |l0 AS (SELECT vec_id AS id, vec_id AS label FROM embeddings
       |  WHERE vec_id >= 8),
       |$rounds
       |SELECT label AS component_label,
       |  CAST(COUNT(*) AS BIGINT) AS n_members,
       |  CAST(SUM(id) AS BIGINT) AS id_sum
       |FROM $last GROUP BY 1""".stripMargin
  }

  /** k-occurrence histogram over the knn twin; the 0 bucket is the
    * uncited remainder; thresholds from the shared constants. Shared
    * by the full audit and its probe form (probe-rooted in-degrees,
    * full candidate census in the denominator). */
  private def hubnessAuditSql(ctes: String): String =
    s"""WITH $ctes,
       |ideg AS (SELECT nbr_id, CAST(COUNT(*) AS BIGINT) AS k_occ
       |  FROM knn GROUP BY 1),
       |h AS (SELECT k_occ, CAST(COUNT(*) AS BIGINT) AS n_vectors
       |  FROM ideg GROUP BY 1),
       |t AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)
       |      AS n_vecs,
       |    CAST(COUNT(*) AS BIGINT) AS n_cited,
       |    CAST(MAX(k_occ) AS BIGINT) AS max_k_occ
       |  FROM ideg),
       |hh AS (SELECT k_occ, n_vectors FROM h
       |  UNION ALL SELECT 0, n_vecs - n_cited FROM t)
       |SELECT k_occ, n_vectors,
       |  CAST(n_vectors * 1000000 // n_vecs AS BIGINT) AS share_ppm,
       |  max_k_occ,
       |  CASE WHEN max_k_occ >=
       |    ${Similarity.HubFactor * Similarity.KnnK}
       |    THEN 'HUBBY' ELSE 'OK' END AS verdict
       |FROM hh, t WHERE n_vectors > 0""".stripMargin

  private lazy val mins: String = (0 until Dedup.NumHashes)
    .map(s => s"CAST(MIN(${sqlPermute("h", s)}) AS BIGINT) AS m$s")
    .mkString(", ")

  /** Band-key CASE arm per LSH band (same Horner fold as the Column). */
  private lazy val bandSig: String = (0 until Dedup.Bands).map { b =>
    val cols = (0 until Dedup.RowsPerBand)
      .map(r => s"m${b * Dedup.RowsPerBand + r}")
    s"WHEN $b THEN ${graft.functions.PortableHash.sqlBandKey(cols)}"
  }.mkString(" ")

  /** Shingle → portable-hash CTE prefix (tk/grams/sh), shared by the
    * intra-corpus and incremental dedup chains. */
  private def shingleCtes(src: String): String =
    s"""tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $src),
       |grams AS (SELECT doc_id,
       |    CASE WHEN len(tk) >= 3
       |      THEN list_transform(generate_series(0, len(tk)-3),
       |             i -> array_to_string(tk[i+1:i+3], ' '))
       |      ELSE [array_to_string(tk, ' ')] END AS gs
       |  FROM tk),
       |sh AS (SELECT doc_id, ${sqlPhash("g.g")} AS h
       |  FROM grams, UNNEST(list_distinct(gs)) AS g(g))""".stripMargin

  private lazy val ShingleCtes: String = shingleCtes("documents")

  private def minhashCtes(src: String): String = {
    s"""${shingleCtes(src)},
       |sigs AS (SELECT doc_id, $mins, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM sh GROUP BY doc_id),
       |banded AS (SELECT doc_id, n, b.j AS band,
       |    CASE b.j $bandSig END AS sig
       |  FROM sigs, UNNEST(generate_series(0, ${Dedup.Bands - 1})) AS b(j)),
       |bn AS (SELECT band, sig, COUNT(*) AS cnt, MIN(doc_id) AS keeper
       |  FROM banded GROUP BY 1, 2 HAVING COUNT(*) > 1),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, a.n AS na, b.doc_id AS doc_b, b.n AS nb
       |  FROM bn JOIN banded a USING (band, sig) JOIN banded b USING (band, sig)
       |  WHERE bn.cnt <= ${Dedup.MaxQuadraticBucket} AND a.doc_id < b.doc_id
       |  UNION
       |  SELECT bn.keeper, k.n, b.doc_id, b.n
       |  FROM bn JOIN banded b USING (band, sig)
       |  JOIN banded k ON k.band = bn.band AND k.sig = bn.sig
       |    AND k.doc_id = bn.keeper
       |  WHERE bn.cnt > ${Dedup.MaxQuadraticBucket} AND b.doc_id <> bn.keeper),
       |it AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS c
       |  FROM pairs p
       |  JOIN sh s1 ON s1.doc_id = p.doc_a
       |  JOIN sh s2 ON s2.doc_id = p.doc_b AND s2.h = s1.h
       |  GROUP BY 1, 2),
       |jac AS (SELECT p.doc_a, p.doc_b,
       |    (COALESCE(it.c, 0) * 1000) // (p.na + p.nb - COALESCE(it.c, 0)) AS j_milli
       |  FROM pairs p
       |  LEFT JOIN it ON p.doc_a = it.doc_a AND p.doc_b = it.doc_b)""".stripMargin
  }

  private lazy val MinhashCtes: String = minhashCtes("documents")

  /** Gopher repetition-rule CTE chain — twin of TextAnalysis
    * .gopherQuality; ends in `gq(doc_id, n_tokens, distinct_milli,
    * mean_len_milli, top2gram_milli, keep_b)`, shared by
    * quality_gopher and source_rollup. */
  private lazy val GopherCtes: String =
    s"""gtk AS (SELECT doc_id, string_split(text, ' ') AS tk
       |  FROM documents),
       |gts AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(COUNT(DISTINCT t.t) AS BIGINT) AS n_distinct,
       |    CAST(SUM(len(t.t)) AS BIGINT) AS sum_len
       |  FROM gtk, UNNEST(tk) AS t(t) GROUP BY doc_id),
       |gg2 AS (SELECT doc_id, g.g, COUNT(*) AS c
       |  FROM gtk, UNNEST(CASE WHEN len(tk) >= 2
       |    THEN list_transform(generate_series(0, len(tk)-2),
       |           i -> tk[i+1] || ' ' || tk[i+2])
       |    ELSE [] END) AS g(g)
       |  GROUP BY 1, 2),
       |ggm AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_gram,
       |    CAST(SUM(c) AS BIGINT) AS n_grams
       |  FROM gg2 GROUP BY doc_id),
       |gqr AS (SELECT gts.doc_id, gts.n_tokens,
       |    (gts.n_distinct * 1000) // gts.n_tokens AS distinct_milli,
       |    (gts.sum_len * 1000) // gts.n_tokens AS mean_len_milli,
       |    CASE WHEN COALESCE(ggm.n_grams, 0) = 0 THEN 0
       |      ELSE (ggm.top_gram * 1000) // ggm.n_grams END AS top2gram_milli
       |  FROM gts LEFT JOIN ggm ON gts.doc_id = ggm.doc_id),
       |gq AS (SELECT *,
       |    (distinct_milli >= ${TextAnalysis.MinDistinctMilli}
       |      AND top2gram_milli <= ${TextAnalysis.MaxTop2GramMilli}
       |      AND mean_len_milli BETWEEN ${TextAnalysis.MinMeanLenMilli}
       |        AND ${TextAnalysis.MaxMeanLenMilli}) AS keep_b
       |  FROM gqr)""".stripMargin

  /** Quality-gate signal CTE chain (classifier / LM fluency / rarity
    * flags left-joined onto the Gopher relation `gq` — requires
    * GopherCtes in scope); ends in `j(doc_id, keep_gopher, keep_clf,
    * keep_lm, keep_rare)`. Shared by quality_ensemble and the composed
    * curation_pipeline. */
  private lazy val EnsembleCtes: String = {
    val cases = TextAnalysis.ClassifierWeights
      .map { case (w, v) => s"WHEN ${esc(w)} THEN $v" }.mkString(" ")
    s"""qct AS (SELECT doc_id,
       |    CAST(CASE t.t $cases ELSE 0 END AS BIGINT) AS w
       |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)),
       |clf AS (SELECT doc_id,
       |    (${TextAnalysis.ClassifierBias} +
       |      CAST(SUM(w) AS BIGINT) // COUNT(*)) >
       |      ${TextAnalysis.ClassifierThreshold} AS keep_clf
       |  FROM qct GROUP BY doc_id),
       |ltk AS (SELECT doc_id, string_split(text, ' ') AS tk
       |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
       |lbg AS (SELECT doc_id, tk[u.i+1] AS w1, tk[u.i+2] AS w2
       |  FROM ltk, UNNEST(generate_series(0, len(tk)-2)) AS u(i)),
       |lpc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
       |  FROM lbg GROUP BY 1, 2),
       |luc AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
       |  FROM lbg GROUP BY 1),
       |lp AS (SELECT lbg.doc_id, (lpc.c2 * 1000000) // luc.c1 AS p_ppm
       |  FROM lbg JOIN lpc USING (w1, w2) JOIN luc USING (w1)),
       |lmk AS (SELECT doc_id,
       |    (CAST(SUM(p_ppm) AS BIGINT) // COUNT(*)) >=
       |      ${TextAnalysis.LmKeepPpm} AS keep_lm
       |  FROM lp GROUP BY doc_id),
       |rtk AS (SELECT doc_id, t.t
       |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)),
       |rfq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM rtk GROUP BY t),
       |rar AS (SELECT doc_id,
       |    ((CAST(SUM(tf) AS BIGINT) * 1000) // COUNT(*)) <=
       |      ${TextAnalysis.RareMaxMilli} AS keep_rare
       |  FROM rtk JOIN rfq USING (t) GROUP BY doc_id),
       |j AS (SELECT gq.doc_id, gq.keep_b AS keep_gopher,
       |    COALESCE(clf.keep_clf, FALSE) AS keep_clf,
       |    COALESCE(lmk.keep_lm, FALSE) AS keep_lm,
       |    COALESCE(rar.keep_rare, FALSE) AS keep_rare
       |  FROM gq LEFT JOIN clf USING (doc_id)
       |    LEFT JOIN lmk USING (doc_id) LEFT JOIN rar USING (doc_id))""".stripMargin
  }

  /** Winnowing CTE chain over `src` with CTE names prefixed by `p`
    * (`{p}tok/{p}kg/{p}w/{p}sel` — prefixing lets two chains coexist
    * in one query, as the contamination check needs). The selected
    * fingerprints land in `{p}sel(doc_id, fp)`. */
  private def winnowCtes(src: String, p: String): String =
    s"""${p}tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM $src
       |  WHERE len(string_split(text, ' ')) >= ${TextAnalysis.WinnowK}),
       |${p}kg AS (SELECT doc_id, g.i AS pos,
       |    ${sqlPhash(s"array_to_string(tk[g.i+1:g.i+${TextAnalysis.WinnowK}], ' ')")} AS h
       |  FROM ${p}tok,
       |    UNNEST(generate_series(0, len(tk)-${TextAnalysis.WinnowK})) AS g(i)),
       |${p}w AS (SELECT doc_id, pos,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS n_kgrams,
       |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW
       |      AND ${TextAnalysis.WinnowW - 1} FOLLOWING) AS fp
       |  FROM ${p}kg),
       |${p}sel AS (SELECT doc_id, fp FROM ${p}w
       |  WHERE pos <= greatest(n_kgrams - ${TextAnalysis.WinnowW}, 0))""".stripMargin

  /** SimHash dedup CTE chain — twin of Dedup.simhashDedup (60-bit
    * portable simhash, 4×15-bit bands, bounded pairs, hamming check). */
  private lazy val SimhashCtes: String = {
    val bitSums = (0 until Dedup.SimBits)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(", ")
    val fp = (0 until Dedup.SimBits)
      .map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    val mask = (1 << Dedup.SimBandBits) - 1
    s"""stok AS (SELECT doc_id, ${sqlPhash("t.t")} AS h
       |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)),
       |sbits AS (SELECT doc_id, $bitSums FROM stok GROUP BY doc_id),
       |sfp AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM sbits),
       |sbanded AS (SELECT doc_id, simhash, b.j AS band,
       |    (simhash >> (b.j * ${Dedup.SimBandBits})) & $mask AS bkey
       |  FROM sfp, UNNEST(generate_series(0, ${Dedup.SimBands - 1})) AS b(j)),
       |sbn AS (SELECT band, bkey, COUNT(*) AS n, MIN(doc_id) AS keeper
       |  FROM sbanded GROUP BY 1, 2 HAVING COUNT(*) > 1),
       |spairs AS (
       |  SELECT a.doc_id AS doc_a, a.simhash AS sa,
       |         b.doc_id AS doc_b, b.simhash AS sb
       |  FROM sbn JOIN sbanded a USING (band, bkey)
       |       JOIN sbanded b USING (band, bkey)
       |  WHERE sbn.n <= ${Dedup.MaxQuadraticBucket} AND a.doc_id < b.doc_id
       |  UNION
       |  SELECT sbn.keeper, k.simhash, b.doc_id, b.simhash
       |  FROM sbn JOIN sbanded b USING (band, bkey)
       |  JOIN sbanded k ON k.band = sbn.band AND k.bkey = sbn.bkey
       |    AND k.doc_id = sbn.keeper
       |  WHERE sbn.n > ${Dedup.MaxQuadraticBucket} AND b.doc_id <> sbn.keeper)""".stripMargin
  }

  /** Connected-components CTE suffix (dup/edges/nodes/lab) over the
    * MinhashCtes `jac` relation — exact min-reachable labels via a
    * RECURSIVE CTE; shared by dup_cluster and cluster_size_hist. */
  private lazy val DupClusterCtes: String =
    s"""dup AS (SELECT doc_a AS a, doc_b AS b FROM jac
       |  WHERE j_milli >= ${Dedup.JaccardMilli}),
       |edges AS (SELECT a, b FROM dup UNION SELECT b, a FROM dup),
       |nodes AS (SELECT DISTINCT a AS v FROM edges),
       |lab AS (
       |  WITH RECURSIVE reach(src, node) AS (
       |    SELECT v, v FROM nodes
       |    UNION
       |    SELECT r.src, g.b FROM reach r JOIN edges g ON g.a = r.node)
       |  SELECT node AS doc_id, MIN(src) AS cluster_id
       |  FROM reach GROUP BY node)""".stripMargin

  /** Bucketed-checksum CTE chain (cs/csrc/ct/ctgt/cver) — the SQL twin
    * of Snapshot.checksumCompare incl. its target-drift simulation;
    * shared by checksum_compare and repair_plan. */
  private lazy val ChecksumCtes: String = {
    val b = graft.operators.Snapshot.ChecksumBuckets
    s"""cs AS (SELECT c_custkey AS k,
       |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
       |  FROM customer),
       |csrc AS (SELECT k % $b AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS n_src,
       |    CAST(bit_xor(${sqlPhash("k || ':' || cents")}) AS BIGINT)
       |      AS x_src
       |  FROM cs GROUP BY 1),
       |ct AS (
       |  SELECT k AS tk, cents + CASE WHEN k % 10 = 0 THEN 100 ELSE 0 END
       |    AS tc FROM cs WHERE k % 13 <> 0
       |  UNION ALL
       |  SELECT k + 1000000, cents FROM cs WHERE k % 17 = 0),
       |ctgt AS (SELECT tk % $b AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS n_tgt,
       |    CAST(bit_xor(${sqlPhash("tk || ':' || tc")}) AS BIGINT) AS x_tgt
       |  FROM ct GROUP BY 1),
       |cver AS (SELECT COALESCE(csrc.bucket, ctgt.bucket) AS bucket,
       |  COALESCE(n_src, 0) AS n_src, COALESCE(x_src, 0) AS x_src,
       |  COALESCE(n_tgt, 0) AS n_tgt, COALESCE(x_tgt, 0) AS x_tgt,
       |  CASE WHEN COALESCE(n_src, 0) = COALESCE(n_tgt, 0)
       |    AND COALESCE(x_src, 0) = COALESCE(x_tgt, 0)
       |    THEN 'MATCH' ELSE 'DIVERGED' END AS verdict
       |FROM csrc FULL OUTER JOIN ctgt ON csrc.bucket = ctgt.bucket)""".stripMargin
  }

  /** Shared normalized-changelog CTE body — the SQL twin of
    * operators.ChangeLog.normalize. */
  val CL: String =
    """cl AS (
      |  SELECT event_id, user_id,
      |    CASE WHEN event_type='signup' THEN 'I'
      |         WHEN event_type='error' THEN 'D' ELSE 'U' END AS op,
      |    epoch_ms(ts) AS ems,
      |    epoch_ms(ts)//1000 AS epoch_s,
      |    CAST(ROUND(value*100) AS BIGINT) AS value_cents,
      |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k,
      |    user_id % 16 AS part
      |  FROM events
      |)""".stripMargin

  /** Latest-change-per-key CTE (deletes included). */
  val LAST: String =
    """last AS (
      |  SELECT * FROM cl
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
      |                             ORDER BY ems DESC, event_id DESC) = 1
      |)""".stripMargin

  /** Last-touch attribution SQL — shared verbatim by
    * `attribution_last_touch` and the streaming replay
    * `stream_attribution_parity`. */
  /** Linear multi-touch attribution SQL — twin of
    * Analytics.attributionLinear, shared verbatim by
    * attribution_linear and the streaming stream_linear_parity. */
  val LinearAttributionSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
      |    event_type,
      |    CAST(ROUND(value * 100) AS BIGINT) AS value_cents
      |  FROM events),
      |j AS (SELECT *, COALESCE(SUM(CASE WHEN event_type = 'purchase'
      |      THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS journey FROM e),
      |tch AS (SELECT user_id, journey, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n_touch_type
      |  FROM j WHERE event_type <> 'purchase' GROUP BY 1, 2, 3),
      |js AS (SELECT user_id, journey,
      |    CAST(SUM(n_touch_type) AS BIGINT) AS n_touches
      |  FROM tch GROUP BY 1, 2),
      |pur AS (SELECT user_id, journey, value_cents FROM j
      |  WHERE event_type = 'purchase'),
      |cr AS (SELECT p.user_id, p.journey, p.value_cents,
      |    COALESCE(js.n_touches, 0) AS n_touches
      |  FROM pur p LEFT JOIN js USING (user_id, journey)),
      |touched AS (SELECT t.event_type AS touch_type,
      |    t.n_touch_type AS n_touches_row,
      |    ((c.value_cents * 1000 - (c.value_cents * 1000) % c.n_touches)
      |      // c.n_touches) * t.n_touch_type
      |      AS credit_milli
      |  FROM cr c JOIN tch t
      |    ON c.user_id = t.user_id AND c.journey = t.journey
      |  WHERE c.n_touches > 0),
      |nn AS (SELECT 'none' AS touch_type,
      |    CAST(1 AS BIGINT) AS n_touches_row,
      |    value_cents * 1000 AS credit_milli
      |  FROM cr WHERE n_touches = 0),
      |a AS (SELECT * FROM touched UNION ALL SELECT * FROM nn)
      |SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_journeys,
      |  CAST(SUM(n_touches_row) AS BIGINT) AS n_touches,
      |  CAST(SUM(credit_milli) AS BIGINT) AS credit_milli_cents
      |FROM a GROUP BY 1""".stripMargin

  /** U-shape position attribution — first/last touch take
    * PosEndNum/PosDen each, the middle pool splits equally; every
    * division uses the (x - x % d) // d truncation form so the oracle
    * matches the Spark/streaming trunc exactly even on negative
    * (refund-style) purchase values. Generated from the SAME
    * PosEndNum/PosDen constants the batch window form and the
    * streaming journey state use. */
  val PositionAttributionSql: String = {
    val en = graft.operators.Analytics.PosEndNum
    val de = graft.operators.Analytics.PosDen
    s"""WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
       |    event_type,
       |    CAST(ROUND(value * 100) AS BIGINT) AS value_cents
       |  FROM events),
       |j AS (SELECT *, COALESCE(SUM(CASE WHEN event_type = 'purchase'
       |      THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS journey FROM e),
       |t AS (SELECT user_id, journey, event_type,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id, journey
       |      ORDER BY ts_ns, event_id) AS BIGINT) AS pos,
       |    CAST(COUNT(*) OVER (PARTITION BY user_id, journey)
       |      AS BIGINT) AS n_touches
       |  FROM j WHERE event_type <> 'purchase'),
       |p AS (SELECT user_id, journey, value_cents FROM j
       |  WHERE event_type = 'purchase'),
       |js AS (SELECT user_id, journey, CAST(COUNT(*) AS BIGINT) AS n_t
       |  FROM t GROUP BY 1, 2),
       |tc0 AS (SELECT t.event_type, t.pos, t.n_touches,
       |    p.value_cents * 1000 AS vm,
       |    (p.value_cents * 1000 - (p.value_cents * 1000) % $de) // $de
       |      AS pool
       |  FROM t JOIN p ON t.user_id = p.user_id AND t.journey = p.journey),
       |tc AS (SELECT event_type AS touch_type,
       |    CASE WHEN n_touches = 1 THEN 'solo'
       |         WHEN pos = 1 THEN 'first'
       |         WHEN pos = n_touches THEN 'last'
       |         ELSE 'mid' END AS role,
       |    CASE WHEN n_touches = 1 THEN vm
       |         WHEN pos > 1 AND pos < n_touches THEN
       |           (pool - pool % (n_touches - 2)) // (n_touches - 2)
       |         WHEN n_touches = 2 THEN (vm - vm % 2) // 2
       |         ELSE (vm * $en - (vm * $en) % $de) // $de
       |    END AS credit_milli
       |  FROM tc0),
       |nn AS (SELECT 'none' AS touch_type, 'none' AS role,
       |    p.value_cents * 1000 AS credit_milli
       |  FROM p LEFT JOIN js ON p.user_id = js.user_id
       |    AND p.journey = js.journey
       |  WHERE js.n_t IS NULL),
       |a AS (SELECT * FROM tc UNION ALL SELECT * FROM nn)
       |SELECT touch_type, role, CAST(COUNT(*) AS BIGINT) AS n_credits,
       |  CAST(SUM(credit_milli) AS BIGINT) AS credit_milli_cents
       |FROM a GROUP BY 1, 2""".stripMargin
  }

  val AttributionSql: String =
    """WITH a AS (SELECT user_id, event_id, event_type,
        |    CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT COALESCE(touch, 'none') AS touch_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(value_cents) AS BIGINT) AS revenue_cents
        |FROM a WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  /** Lindley queue-wait SQL — shared verbatim by `queue_wait_audit`
    * and the streaming replay `stream_queue_parity`. */
  val QueueWaitSql: String = {
      import graft.operators.Temporal.{ServiceMsD, ServiceMsI, ServiceMsU}
      s"""WITH $CL,
         |b AS (SELECT part, ems, event_id,
         |    CASE op WHEN 'I' THEN $ServiceMsI WHEN 'U' THEN $ServiceMsU
         |      ELSE $ServiceMsD END AS s
         |  FROM cl),
         |l AS (SELECT *, ems - LAG(ems) OVER w AS a, LAG(s) OVER w AS ps
         |  FROM b WINDOW w AS (PARTITION BY part ORDER BY ems,
         |    event_id)),
         |d AS (SELECT *, CASE WHEN a IS NULL THEN 0 ELSE ps - a END
         |    AS dd FROM l),
         |c AS (SELECT *, CAST(SUM(dd) OVER w2 AS BIGINT) AS cum
         |  FROM d WINDOW w2 AS (PARTITION BY part ORDER BY ems,
         |    event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
         |    ROW)),
         |wt AS (SELECT *, cum - LEAST(0, MIN(cum) OVER w2) AS wait_ms
         |  FROM c WINDOW w2 AS (PARTITION BY part ORDER BY ems,
         |    event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
         |    ROW))
         |SELECT part, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(MAX(wait_ms) AS BIGINT) AS max_wait_ms,
         |  CAST(SUM(wait_ms) // COUNT(*) AS BIGINT) AS mean_wait_ms,
         |  CAST(SUM(CASE WHEN wait_ms > 0 THEN 1 ELSE 0 END) * 1000000
         |    // COUNT(*) AS BIGINT) AS waited_ppm,
         |  CAST(SUM(s) * 1000000 // GREATEST(MAX(ems) - MIN(ems), 1)
         |    AS BIGINT) AS utilization_ppm
         |FROM wt GROUP BY 1""".stripMargin
  }

  /** Strict-funnel SQL — shared verbatim by `funnel_conversion` and
    * the streaming replay `stream_funnel_parity`. */
  val FunnelSql: String =
      """WITH s AS (SELECT user_id,
        |    MIN(CASE WHEN event_type='signup' THEN epoch_ns(ts) END)
        |      AS t_signup,
        |    MIN(CASE WHEN event_type='click' THEN epoch_ns(ts) END)
        |      AS t_click,
        |    MIN(CASE WHEN event_type='purchase' THEN epoch_ns(ts) END)
        |      AS t_purchase
        |  FROM events GROUP BY 1)
        |SELECT CAST(COUNT(t_signup) AS BIGINT) AS n_signup,
        |  CAST(COUNT(CASE WHEN t_click > t_signup THEN 1 END) AS BIGINT)
        |    AS n_signup_click,
        |  CAST(COUNT(CASE WHEN t_purchase > t_click
        |    AND t_click > t_signup THEN 1 END) AS BIGINT) AS n_full_funnel
        |FROM s""".stripMargin

  /** Next-event transition-matrix SQL — shared verbatim by
    * `event_transitions` and the streaming replay
    * `stream_transitions_parity`. */
  val TransitionsSql: String =
    """WITH s AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
      |    event_type,
      |    COALESCE(LEAD(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ns(ts), event_id), 'end') AS to_type
      |  FROM events),
      |g AS (SELECT event_type AS from_type, to_type,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM s GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(n * 1000000 AS BIGINT) //
      |    CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
      |FROM g""".stripMargin

  /** Gaps-and-islands tier-history SQL — shared verbatim by
    * `tier_history` and the streaming replay `stream_tier_parity`. */
  val TierHistorySql: String =
    s"""WITH $CL,
         |b AS (SELECT user_id, event_id, ems,
         |    CASE WHEN value_cents > 0
         |      THEN CAST(length(format('{:b}', value_cents)) AS BIGINT)
         |      ELSE 0 END AS tier
         |  FROM cl WHERE op <> 'D'),
         |i AS (SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY ems, event_id)
         |    - ROW_NUMBER() OVER (PARTITION BY user_id, tier
         |      ORDER BY ems, event_id) AS island
         |  FROM b),
         |p AS (SELECT user_id, tier, island,
         |    CAST(COUNT(*) AS BIGINT) AS n_changes,
         |    MIN(ems) AS valid_from_ms,
         |    MAX(event_id) AS last_event_id
         |  FROM i GROUP BY 1, 2, 3)
         |SELECT user_id, tier, valid_from_ms,
         |  LEAD(valid_from_ms) OVER (PARTITION BY user_id
         |    ORDER BY valid_from_ms, last_event_id) AS valid_to_ms,
         |  n_changes, last_event_id,
         |  CASE WHEN LEAD(valid_from_ms) OVER (PARTITION BY user_id
         |    ORDER BY valid_from_ms, last_event_id) IS NULL
         |    THEN 'true' ELSE 'false' END AS is_current
         |FROM p""".stripMargin

  /** Hourly windowed-aggregate SQL — shared verbatim by
    * `stream_window_agg` and the streaming replay
    * `stream_window_parity`. */
  val WindowAggSql: String =
    """WITH e AS (
      |  SELECT epoch_ms(ts) AS ems, event_type,
      |         CAST(ROUND(value*100) AS BIGINT) AS value_cents
      |  FROM events)
      |SELECT (ems - ems % 3600000) // 1000 AS hour_s, event_type,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(value_cents) AS BIGINT) AS sum_cents
      |FROM e GROUP BY 1, 2""".stripMargin

  /** Batch sessionization SQL — shared verbatim by `sessionize` and
    * the streaming replay `stream_sessionize_parity`, so the two
    * engines AND the two execution modes pin one definition. */
  val SessionizeSql: String =
    s"""WITH $CL,
       |g AS (SELECT user_id, event_id, ems,
       |  ems - LAG(ems, 1) OVER (PARTITION BY user_id ORDER BY ems, event_id) AS gap_ms
       |  FROM cl),
       |s AS (SELECT user_id, ems,
       |  SUM(CASE WHEN gap_ms IS NULL OR gap_ms > 1800000 THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id ORDER BY ems, event_id) AS session_id
       |  FROM g)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  MIN(ems) AS start_ms, MAX(ems) AS end_ms,
       |  MAX(ems) - MIN(ems) AS duration_ms
       |FROM s GROUP BY 1, 2""".stripMargin

  /** Ack-status CTE (twin of Ledger.statusCol) — shared by sync_state,
    * monitor_alerts and status_rollup so the rules can't drift apart. */
  val STATUS: String =
    """a AS (SELECT *,
      |  CASE WHEN op='D' THEN 'ERR'
      |       WHEN op='U' AND user_id%10=0 THEN 'BLK' ELSE 'OK' END AS status
      |  FROM cl)""".stripMargin

  /** Per-db state counts over STATUS (twin of Ledger.syncState). */
  val ST: String =
    """st AS (
      |  SELECT 'db' || (user_id % 3) AS db,
      |    CAST(COUNT(CASE WHEN event_id%7<>0 THEN 1 END) AS BIGINT) AS pending,
      |    CAST(COUNT(CASE WHEN event_id%7=0 AND status='BLK' THEN 1 END) AS BIGINT) AS blocked,
      |    CAST(COUNT(CASE WHEN event_id%7=0 AND status='ERR' THEN 1 END) AS BIGINT) AS error,
      |    CAST(COUNT(CASE WHEN event_id%7=0 AND status='OK' THEN 1 END) AS BIGINT) AS success
      |  FROM a GROUP BY 1)""".stripMargin

  /** Fan-out routing CTE (twin of ChangeLog.routeFanout) — shared by
    * route_fanout and pause_filter. */
  val ROUTED: String =
    """r AS (SELECT part,
      |  CASE WHEN user_id%3=0 THEN 'tdb0,tdb1'
      |       WHEN user_id%3=1 THEN 'tdb1' ELSE 'tdb1,tdb2' END AS tgts
      |  FROM cl),
      |routed AS (
      |  SELECT t.target_db, r.part, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM r, UNNEST(string_split(r.tgts, ',')) AS t(target_db)
      |  GROUP BY 1, 2)""".stripMargin

  /** Component-lifecycle CTE chain (twin of Ledger.componentLifecycle)
    * — shared by component_lifecycle and endpoint_status so the
    * supervisor rules can't drift apart. Defines hb/lc/clock/lcf;
    * `clock` is the corpus clock (also used by endpoint_status's
    * rollup branch). */
  val LIFECYCLE: String = {
    import graft.operators.Ledger.{HeartbeatIntervalS => HI,
      MaxComponentRestarts => MR, RestartBackoffS => RB}
    s"""hb AS (SELECT 'db' || (user_id % 3) AS db,
       |    'worker-' || part AS component, epoch_s,
       |    epoch_s - LAG(epoch_s) OVER (
       |      PARTITION BY user_id % 3, part
       |      ORDER BY epoch_s, event_id) AS gap_s
       |  FROM cl),
       |lc AS (SELECT db, component,
       |    CAST(COUNT(*) AS BIGINT) AS n_heartbeats,
       |    CAST(COUNT(CASE WHEN gap_s // $HI >= 2 AND gap_s // $HI < 5
       |      THEN 1 END) AS BIGINT) AS n_yellow_gaps,
       |    CAST(COUNT(CASE WHEN gap_s // $HI >= 5 THEN 1 END) AS BIGINT)
       |      AS n_restarts,
       |    MAX(epoch_s) AS last_hb_s
       |  FROM hb GROUP BY 1, 2),
       |clock AS (SELECT MAX(epoch_s) AS now_s FROM cl),
       |lcf AS (SELECT db, component, n_heartbeats, n_yellow_gaps,
       |    n_restarts, last_hb_s, (now_s - last_hb_s) // $HI AS now_lost,
       |    CASE WHEN n_restarts > $MR THEN 'GIVEN_UP'
       |         WHEN (now_s - last_hb_s) // $HI < 2 THEN 'GREEN'
       |         WHEN (now_s - last_hb_s) // $HI < 5 THEN 'YELLOW'
       |         ELSE 'RED' END AS state,
       |    $RB * (1::BIGINT << LEAST(n_restarts, 6)) AS backoff_s
       |  FROM lc, clock)""".stripMargin
  }

  /** Shared by cdc_upsert_apply and pipeline_e2e (the pipeline's
    * applied output IS the upsert apply — one definition, two gates). */
  private val UpsertApplySql: String =
    s"""WITH $CL, $LAST,
       |base AS (
       |  SELECT c_custkey, c_name, c_mktsegment,
       |         CAST(ROUND(c_acctbal*100) AS BIGINT) AS base_cents
       |  FROM customer)
       |SELECT COALESCE(l.user_id, b.c_custkey) AS key,
       |       COALESCE(b.c_name, 'user_' || l.user_id) AS name,
       |       COALESCE(b.c_mktsegment, 'NEW') AS mktsegment,
       |       COALESCE(l.value_cents, b.base_cents) AS acctbal_cents,
       |       CASE WHEN l.op IS NULL THEN 'BASE'
       |            WHEN b.c_custkey IS NULL THEN 'INSERT'
       |            ELSE 'UPDATE' END AS apply_op
       |FROM base b FULL OUTER JOIN last l ON b.c_custkey = l.user_id
       |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin

  /** DuckDB regex backreference, kept out of the interpolated strings
    * (the s-interpolator would eat the backslash). */
  private val Bref: String = "\\1"

  /** Byte-level P6 header regex over the hex-encoded payload:
    * "P6\n" = 50360A, ASCII digits = 3x pairs, space = 20 — the parse
    * never UTF-8-decodes binary data. Same regex the Spark side uses
    * (Multimodal.rasterParsed). */
  private val PpmHdrRe: String =
    "^50360A((?:3[0-9])+)20((?:3[0-9])+)0A((?:3[0-9])+)0A"

  /** Shared PPM(P6) image-lane CTE chain — the SQL twin of
    * Multimodal.imageTable + rasterParsed: `ipay` rebuilds the
    * IDENTICAL payload bytes from the same documents columns and
    * doc_id arithmetic, then the parse CTEs re-read them byte-level
    * (hex pairs, header regex, '0x' casts). Ends with
    * `ibytes(doc_id, hs, byte_len, w, h, maxval, b)` where `b` is the
    * raster as a 1-indexed BIGINT list. */
  private lazy val PpmCtes: String = {
    import graft.operators.Multimodal.GroupCount
    s"""iimg AS (SELECT doc_id, doc_id % $GroupCount AS g,
       |    8 + (doc_id % $GroupCount) % 5 AS w0,
       |    8 + ((doc_id % $GroupCount) * 3) % 5 AS h0
       |  FROM documents),
       |ipx AS (SELECT doc_id, g, w0, h0,
       |    string_agg(printf('%02X',
       |      CAST(((g*37 + (i*i)%251 + i*11) % 200 + doc_id % 56
       |            + CASE WHEN doc_id % 3 = 0 AND i % 31 = 0
       |              THEN 97 ELSE 0 END) % 256 AS INT)),
       |      '' ORDER BY i) AS pxhex
       |  FROM iimg, UNNEST(range(0, 3*w0*h0)) AS t(i)
       |  GROUP BY doc_id, g, w0, h0),
       |ipay AS (SELECT doc_id,
       |    encode('P6' || chr(10) || w0 || ' ' || h0 || chr(10) ||
       |      '255' || chr(10)) || unhex(pxhex) AS payload
       |  FROM ipx),
       |ihx AS (SELECT doc_id, hex(payload) AS hs,
       |    CAST(octet_length(payload) AS BIGINT) AS byte_len FROM ipay),
       |ihdr AS (SELECT doc_id, hs, byte_len,
       |    regexp_extract(hs, '$PpmHdrRe', 1) AS wg,
       |    regexp_extract(hs, '$PpmHdrRe', 2) AS hg,
       |    regexp_extract(hs, '$PpmHdrRe', 3) AS mg
       |  FROM ihx),
       |idims AS (SELECT doc_id, hs, byte_len,
       |    CAST(regexp_replace(wg, '3([0-9])', '$Bref', 'g') AS BIGINT) AS w,
       |    CAST(regexp_replace(hg, '3([0-9])', '$Bref', 'g') AS BIGINT) AS h,
       |    CAST(regexp_replace(mg, '3([0-9])', '$Bref', 'g') AS BIGINT)
       |      AS maxval,
       |    6 + len(wg) + 2 + len(hg) + 2 + len(mg) + 2 AS poff
       |  FROM ihdr),
       |ibytes AS (SELECT doc_id, hs, byte_len, w, h, maxval,
       |    [('0x' || substring(hs, CAST(poff + 1 + 2*i AS INT), 2))::BIGINT
       |     for i in range(0, 3*w*h)] AS b
       |  FROM idims)""".stripMargin
  }

  /** aHash fingerprint CTEs over [[PpmCtes]] — the SQL twin of
    * Multimodal.imageFingerprints (integer area-downsample to 8×8,
    * cross-multiplied cell-vs-mean bits, 4×16-bit band values). Ends
    * with `ifp(doc_id, bands)`. */
  private lazy val PpmAHashCtes: String = {
    import graft.operators.Multimodal.{HashBands, BandBits}
    s"""icells AS (SELECT doc_id, w, h,
       |    [list_sum(flatten(
       |       [[b[CAST(3*(y*w+x)+1 AS INT)] + b[CAST(3*(y*w+x)+2 AS INT)]
       |         + b[CAST(3*(y*w+x)+3 AS INT)]
       |         for x in range(((idx%8)*w)//8, (((idx%8)+1)*w)//8)]
       |        for y in range(((idx//8)*h)//8, (((idx//8)+1)*h)//8)]))
       |     for idx in range(0,64)] AS cs,
       |    [3 * ((((idx//8)+1)*h)//8 - ((idx//8)*h)//8)
       |       * ((((idx%8)+1)*w)//8 - ((idx%8)*w)//8)
       |     for idx in range(0,64)] AS ca
       |  FROM ibytes),
       |ifp AS (SELECT doc_id,
       |    [list_sum([CASE WHEN cs[CAST($BandBits*bb + j + 1 AS INT)]
       |                         * list_sum(ca)
       |                    > list_sum(cs)
       |                         * ca[CAST($BandBits*bb + j + 1 AS INT)]
       |               THEN 1::BIGINT << j ELSE 0 END
       |               for j in range(0, $BandBits)])
       |     for bb in range(0, $HashBands)] AS bands
       |  FROM icells)""".stripMargin
  }

  /** One NN-descent oracle round, shared by the full gate and its
    * probe form ([[KnnProbePred]] caps both seed blockings; `finalPred`
    * drops the non-probe sources the symmetrized expansion roots). */
  private def nnDescentSql(srcPred: String, finalPred: String): String =
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
         |         WHERE vec_id BETWEEN 8 AND 23),
         |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
         |assign AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT cand.vec_id, cent.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
         |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
         |    FROM cand, cent) t WHERE rn = 1),
         |vv AS (SELECT a.vec_id, a.centroid_id, c.v
         |  FROM assign a JOIN cand c ON a.vec_id = c.vec_id),
         |p AS (SELECT l.vec_id AS src_id, r.vec_id AS nbr_id,
         |    CAST(ROUND(list_cosine_similarity(l.v, r.v) * 1000000)
         |      AS BIGINT) AS sim_e6
         |  FROM vv l JOIN vv r
         |    ON l.centroid_id = r.centroid_id AND l.vec_id <> r.vec_id$srcPred),
         |base AS (SELECT src_id, nbr_id, sim_e6 FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
         |      ORDER BY sim_e6 DESC, nbr_id) AS rn FROM p) t
         |  WHERE rn <= ${Similarity.KnnK}),
         |bk AS (SELECT vec_id, v, $bucketExpr AS bucket FROM cand),
         |lp AS (SELECT l.vec_id AS src_id, r.vec_id AS nbr_id,
         |    CAST(ROUND(list_cosine_similarity(l.v, r.v) * 1000000)
         |      AS BIGINT) AS sim_e6
         |  FROM bk l JOIN bk r
         |    ON l.bucket = r.bucket AND l.vec_id <> r.vec_id$srcPred),
         |lsh AS (SELECT src_id, nbr_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
         |      ORDER BY sim_e6 DESC, nbr_id) AS rn FROM lp) t
         |  WHERE rn <= ${Similarity.KnnK}),
         |ed AS (SELECT src_id, nbr_id FROM base
         |  UNION SELECT src_id, nbr_id FROM lsh),
         |und AS (SELECT src_id, nbr_id FROM ed
         |  UNION SELECT nbr_id, src_id FROM ed),
         |ex AS (
         |  SELECT a.src_id, b.nbr_id AS cand_id
         |  FROM und a JOIN und b ON a.nbr_id = b.src_id
         |  WHERE a.src_id <> b.nbr_id
         |  UNION
         |  SELECT src_id, nbr_id FROM ed),
         |sc AS (SELECT x.src_id, x.cand_id,
         |    CAST(ROUND(list_cosine_similarity(l.v, r.v) * 1000000)
         |      AS BIGINT) AS sim_e6
         |  FROM ex x JOIN cand l ON x.src_id = l.vec_id
         |    JOIN cand r ON x.cand_id = r.vec_id),
         |ref AS (SELECT src_id, cand_id, sim_e6,
         |    ROW_NUMBER() OVER (PARTITION BY src_id
         |      ORDER BY sim_e6 DESC, cand_id) AS rn FROM sc)
         |SELECT r.src_id, CAST(r.rn AS BIGINT) AS rank,
         |  r.cand_id AS nbr_id, r.sim_e6,
         |  CAST(b.nbr_id IS NULL AS VARCHAR) AS is_new
         |FROM ref r LEFT JOIN base b
         |  ON b.src_id = r.src_id AND b.nbr_id = r.cand_id
         |WHERE r.rn <= ${Similarity.KnnK}$finalPred""".stripMargin

  private val rawSql: Map[String, String] = Map(
    "changelog_normalize" ->
      s"""WITH $CL
         |SELECT event_id, user_id, op, ems, epoch_s, value_cents, k, part
         |FROM cl""".stripMargin,

    "poll_batch" ->
      s"""WITH $CL,
         |polled AS (SELECT event_id FROM cl WHERE event_id % 7 = 0)
         |SELECT event_id, user_id, op, part FROM cl
         |WHERE NOT EXISTS (SELECT 1 FROM polled p WHERE p.event_id = cl.event_id)
         |ORDER BY event_id LIMIT 500""".stripMargin,

    "cdc_merge" ->
      s"""WITH $CL, $LAST
         |SELECT user_id, event_id AS last_event_id, op AS last_op,
         |       epoch_s AS last_epoch_s, value_cents AS last_value_cents
         |FROM last WHERE op <> 'D'""".stripMargin,

    // the streaming LWW replay must converge to the batch merge — the
    // oracle IS cdc_merge's (same projection, same LWW order)
    "stream_merge_parity" ->
      s"""WITH $CL, $LAST
         |SELECT user_id, event_id AS last_event_id, op AS last_op,
         |       epoch_s AS last_epoch_s, value_cents AS last_value_cents
         |FROM last WHERE op <> 'D'""".stripMargin,

    // snapshot@T + catch-up(>T) must equal continuous LWW — one
    // verdict row; cut T = ems-range midpoint, LWW order (ems, event_id)
    "handoff_audit" ->
      s"""WITH $CL,
         |bb AS (SELECT (MIN(ems) + MAX(ems)) // 2 AS t FROM cl),
         |snap AS (
         |  SELECT cl.* FROM cl, bb WHERE ems <= t
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
         |                             ORDER BY ems DESC, event_id DESC) = 1),
         |uni AS (SELECT * FROM snap
         |  UNION ALL SELECT cl.* FROM cl, bb WHERE ems > t),
         |hlast AS (
         |  SELECT * FROM uni
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
         |                             ORDER BY ems DESC, event_id DESC) = 1),
         |h AS (SELECT user_id, event_id, op, epoch_s, value_cents
         |  FROM hlast WHERE op <> 'D'),
         |flast AS (
         |  SELECT * FROM cl
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
         |                             ORDER BY ems DESC, event_id DESC) = 1),
         |f AS (SELECT user_id, event_id, op, epoch_s, value_cents
         |  FROM flast WHERE op <> 'D'),
         |j AS (SELECT
         |    f.user_id IS NOT NULL AS in_f, h.user_id IS NOT NULL AS in_h,
         |    (f.event_id = h.event_id AND f.op = h.op
         |      AND f.epoch_s = h.epoch_s
         |      AND f.value_cents = h.value_cents) AS same
         |  FROM f FULL OUTER JOIN h ON f.user_id = h.user_id)
         |SELECT (SELECT t FROM bb) AS cut_ems,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(CASE WHEN in_f AND in_h AND same THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_match,
         |  CAST(SUM(CASE WHEN in_f AND NOT in_h THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_only_full,
         |  CAST(SUM(CASE WHEN in_h AND NOT in_f THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_only_handoff,
         |  CAST(SUM(CASE WHEN in_f AND in_h AND NOT same THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_differ,
         |  CASE WHEN SUM(CASE WHEN in_f AND in_h AND same THEN 1 ELSE 0 END)
         |    = COUNT(*) THEN 'CONSISTENT' ELSE 'DIVERGED' END AS verdict
         |FROM j""".stripMargin,

    "cdc_upsert_apply" -> UpsertApplySql,

    // apply the same merged batch twice; a healthy upsert/delete apply
    // drifts by exactly zero rows
    "idempotence_gate" ->
      s"""WITH $CL, $LAST,
         |base AS (
         |  SELECT c_custkey, c_name, c_mktsegment,
         |         CAST(ROUND(c_acctbal*100) AS BIGINT) AS base_cents
         |  FROM customer),
         |once AS (
         |  SELECT COALESCE(l.user_id, b.c_custkey) AS key,
         |    COALESCE(b.c_name, 'user_' || l.user_id) AS name,
         |    COALESCE(b.c_mktsegment, 'NEW') AS mktsegment,
         |    COALESCE(l.value_cents, b.base_cents) AS acctbal_cents
         |  FROM base b FULL OUTER JOIN last l ON b.c_custkey = l.user_id
         |  WHERE l.op IS NULL OR l.op <> 'D'),
         |twice AS (
         |  SELECT COALESCE(l.user_id, o.key) AS key,
         |    COALESCE(o.name, 'user_' || l.user_id) AS name,
         |    COALESCE(o.mktsegment, 'NEW') AS mktsegment,
         |    COALESCE(l.value_cents, o.acctbal_cents) AS acctbal_cents
         |  FROM once o FULL OUTER JOIN last l ON o.key = l.user_id
         |  WHERE l.op IS NULL OR l.op <> 'D'),
         |d AS (SELECT
         |    CAST(COUNT(o.acctbal_cents) AS BIGINT) AS n_once,
         |    CAST(COUNT(t.acctbal_cents) AS BIGINT) AS n_twice,
         |    CAST(SUM(CASE WHEN o.acctbal_cents IS NULL
         |        OR t.acctbal_cents IS NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_key_drift,
         |    CAST(SUM(CASE WHEN o.acctbal_cents IS NOT NULL
         |        AND t.acctbal_cents IS NOT NULL
         |        AND (o.acctbal_cents <> t.acctbal_cents
         |          OR o.name <> t.name OR o.mktsegment <> t.mktsegment)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_value_drift
         |  FROM once o FULL OUTER JOIN twice t ON o.key = t.key)
         |SELECT n_once, n_twice, n_key_drift, n_value_drift,
         |  CASE WHEN n_key_drift = 0 AND n_value_drift = 0
         |    THEN 'IDEMPOTENT' ELSE 'DIVERGENT' END AS verdict
         |FROM d""".stripMargin,

    "pipeline_e2e" -> UpsertApplySql,

    "cdc_delete_apply" ->
      s"""WITH $CL, $LAST,
         |del AS (SELECT user_id FROM last WHERE op = 'D')
         |SELECT c_custkey, c_mktsegment,
         |       CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_cents
         |FROM customer c
         |WHERE NOT EXISTS (SELECT 1 FROM del d WHERE d.user_id = c.c_custkey)""".stripMargin,

    "incremental_agg" ->
      s"""WITH $CL, $LAST,
         |base AS (
         |  SELECT c_custkey, c_name, c_mktsegment,
         |         CAST(ROUND(c_acctbal*100) AS BIGINT) AS base_cents
         |  FROM customer),
         |applied AS (
         |  SELECT COALESCE(b.c_mktsegment, 'NEW') AS mktsegment,
         |         COALESCE(l.value_cents, b.base_cents) AS acctbal_cents
         |  FROM base b FULL OUTER JOIN last l ON b.c_custkey = l.user_id
         |  WHERE l.op IS NULL OR l.op <> 'D')
         |SELECT mktsegment,
         |  CAST(SUM(acctbal_cents) AS BIGINT) AS acctbal_cents,
         |  CAST(COUNT(*) AS BIGINT) AS n_customers
         |FROM applied GROUP BY 1""".stripMargin,

    "ordered_apply" ->
      s"""WITH $CL, $LAST
         |SELECT part,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(COUNT(CASE WHEN op <> 'D' THEN 1 END) AS BIGINT) AS n_live,
         |  CAST(COALESCE(SUM(CASE WHEN op <> 'D' THEN value_cents END), 0) AS BIGINT) AS sum_live_cents
         |FROM last GROUP BY part""".stripMargin,

    "route_fanout" ->
      s"""WITH $CL, $ROUTED
         |SELECT target_db, part, n FROM routed""".stripMargin,

    "conditional_capture" ->
      s"""WITH $CL,
         |c AS (SELECT op,
         |  CASE WHEN op='I' THEN value_cents >= 1000
         |       WHEN op='U' THEN value_cents > 0
         |       ELSE TRUE END AS captured
         |  FROM cl)
         |SELECT op,
         |  CAST(COUNT(CASE WHEN captured THEN 1 END) AS BIGINT) AS n_captured,
         |  CAST(COUNT(CASE WHEN NOT captured THEN 1 END) AS BIGINT) AS n_suppressed
         |FROM c GROUP BY op""".stripMargin,

    "batch_ack" ->
      s"""WITH $CL,
         |a AS (SELECT part,
         |  CASE WHEN op='D' THEN 'ERR'
         |       WHEN op='U' AND user_id%10=0 THEN 'BLK' ELSE 'OK' END AS status,
         |  CASE WHEN op='D' THEN event_id%5 ELSE 0 END AS retry
         |  FROM cl)
         |SELECT part, status, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(retry) AS BIGINT) AS sum_retry,
         |  CAST(MAX(retry) AS BIGINT) AS max_retry
         |FROM a GROUP BY 1, 2""".stripMargin,

    "sync_state" ->
      s"""WITH $CL, $STATUS, $ST
         |SELECT db, pending, blocked, error, success,
         |       CAST(0 AS BIGINT) AS others
         |FROM st""".stripMargin,

    "monitor_alerts" ->
      s"""WITH $CL, $STATUS, $ST
         |SELECT db,
         |  CASE WHEN error > 10 THEN 'ERR_HIGH'
         |       WHEN pending > 400 THEN 'PENDING_HIGH'
         |       WHEN blocked > 10 THEN 'BLOCKED_HIGH'
         |       ELSE 'HEALTHY' END AS alert,
         |  CASE WHEN error > 10 THEN 'restart'
         |       WHEN pending > 400 THEN 'webhook'
         |       WHEN blocked > 10 THEN 'email'
         |       ELSE 'none' END AS action,
         |  pending, blocked, error, success
         |FROM st""".stripMargin,

    // the delivery bodies the reference's Email/Webhook handlers would
    // put on the wire — rule branches generated from the SAME
    // Endpoints.AlertRules constant, newlines via chr(10)
    "alert_payloads" -> {
      import graft.operators.Endpoints.{AlertEmailSubject, AlertEmailTo,
        AlertRules, AlertWebhookUrl}
      val branches = AlertRules.flatMap {
        case (rule, pOver, bOver, eOver, action) =>
          Seq(("pending", pOver), ("blocked", bOver), ("error", eOver))
            .collect { case (kind, t) if t >= 0L =>
              s"""SELECT db, '$rule' AS rule,
                 |  '$kind=' || $kind || ' threshold=$t' AS reason,
                 |  '$action' AS channel,
                 |  pending, blocked, error, success
                 |FROM st WHERE $kind > $t""".stripMargin
            }
      }.mkString("\nUNION ALL\n")
      s"""WITH $CL, $STATUS, $ST,
         |al AS ($branches)
         |SELECT db, rule, reason, channel,
         |  CASE WHEN channel = 'email' THEN '$AlertEmailTo'
         |    ELSE '$AlertWebhookUrl' END AS target,
         |  CASE WHEN channel = 'email' THEN '$AlertEmailSubject'
         |    ELSE 'POST' END AS mode,
         |  CASE WHEN channel = 'email' THEN
         |    'matched rule: ' || rule || chr(10) ||
         |    'reason: ' || reason || chr(10) ||
         |    'sync status:' || chr(10) ||
         |    '  name: ' || db || chr(10) ||
         |    '  pending: ' || pending || chr(10) ||
         |    '  blocked: ' || blocked || chr(10) ||
         |    '  error: ' || error || chr(10) ||
         |    '  success: ' || success
         |  ELSE
         |    '{"matchedRule":"' || rule || '","reason":"' || reason ||
         |    '","syncStatus":{"name":"' || db ||
         |    '","pending":' || pending ||
         |    ',"blocked":' || blocked ||
         |    ',"error":' || error ||
         |    ',"success":' || success || ',"others":0}}'
         |  END AS body
         |FROM al""".stripMargin
    },

    "error_retry" ->
      s"""WITH $CL,
         |e AS (SELECT part, event_id, event_id % 5 AS retry FROM cl WHERE op='D')
         |SELECT part,
         |  CAST(COUNT(*) AS BIGINT) AS n_err,
         |  CAST(COUNT(CASE WHEN retry < 3 THEN 1 END) AS BIGINT) AS n_eligible,
         |  CAST(COUNT(CASE WHEN retry >= 3 THEN 1 END) AS BIGINT) AS n_exhausted,
         |  CAST(MIN(CASE WHEN retry < 3 THEN event_id END) AS BIGINT) AS next_retry_id
         |FROM e GROUP BY part""".stripMargin,

    "blocked_chain" ->
      s"""WITH $CL,
         |b AS (SELECT user_id,
         |  MIN(CASE WHEN op='D' THEN event_id END) OVER (
         |    PARTITION BY user_id ORDER BY ems, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_err_eid
         |  FROM cl)
         |SELECT user_id, CAST(MIN(first_err_eid) AS BIGINT) AS first_err_eid,
         |       CAST(COUNT(*) AS BIGINT) AS n_blocked
         |FROM b WHERE first_err_eid IS NOT NULL GROUP BY user_id""".stripMargin,

    "heartbeat_state" ->
      s"""WITH $CL,
         |lastper AS (
         |  SELECT 'db' || (user_id % 3) AS db,
         |         'worker-' || part AS component,
         |         MAX(epoch_s) AS last_hb_s
         |  FROM cl GROUP BY 1, 2),
         |clock AS (SELECT MAX(epoch_s) AS now_s FROM cl)
         |SELECT db, component, last_hb_s,
         |  CASE WHEN now_s - last_hb_s <= 21600 THEN 'GREEN' ELSE 'RED' END AS hb_status
         |FROM lastper, clock""".stripMargin,

    "component_lifecycle" ->
      s"""WITH $CL, $LIFECYCLE
         |SELECT db, component, n_heartbeats, n_yellow_gaps, n_restarts,
         |  last_hb_s, now_lost, state, backoff_s
         |FROM lcf""".stripMargin,

    "endpoint_status" -> {
      val dsValues = graft.config.SyncConfigs.datasourceStatusRows()
        .map { case (db, t, url, sch, ns, nt) =>
          s"(${esc(db)}, ${esc(t)}, ${esc(url)}, ${esc(sch)}, " +
            s"CAST($ns AS BIGINT), CAST($nt AS BIGINT))"
        }.mkString(",\n  ")
      s"""WITH $CL, $STATUS, $ST, $LIFECYCLE,
         |up AS (SELECT MAX(epoch_s) - MIN(epoch_s) AS uptime_s FROM cl),
         |lastper AS (
         |  SELECT 'db' || (user_id % 3) AS db, 'worker-' || part AS component,
         |         MAX(epoch_s) AS last_hb_s
         |  FROM cl GROUP BY 1, 2),
         |worst AS (
         |  SELECT CAST(MAX(CASE WHEN now_s - last_hb_s <= 21600
         |    THEN 0 ELSE 1 END) AS BIGINT) AS any_red
         |  FROM lastper, clock),
         |tot AS (SELECT CAST(SUM(pending) AS BIGINT) AS pending,
         |    CAST(SUM(blocked) AS BIGINT) AS blocked,
         |    CAST(SUM(error) AS BIGINT) AS error,
         |    CAST(SUM(success) AS BIGINT) AS success
         |  FROM st)
         |SELECT '/status/sync' AS endpoint, db AS name,
         |  '{"name":"' || db ||
         |  '","pending":' || CAST(pending AS VARCHAR) ||
         |  ',"blocked":' || CAST(blocked AS VARCHAR) ||
         |  ',"error":' || CAST(error AS VARCHAR) ||
         |  ',"success":' || CAST(success AS VARCHAR) ||
         |  ',"others":0}' AS body
         |FROM st
         |UNION ALL
         |SELECT '/status/sys', 'sys',
         |  '{"uptime":' || CAST(uptime_s AS VARCHAR) ||
         |  ',"running":true,"componentStatus":"' ||
         |  CASE WHEN any_red = 1 THEN 'RED' ELSE 'GREEN' END ||
         |  '","syncStatus":{"pending":' || CAST(pending AS VARCHAR) ||
         |  ',"blocked":' || CAST(blocked AS VARCHAR) ||
         |  ',"error":' || CAST(error AS VARCHAR) ||
         |  ',"success":' || CAST(success AS VARCHAR) ||
         |  '},"restartReason":""}'
         |FROM tot, worst, up
         |UNION ALL
         |SELECT '/status/component', db || '/' || component,
         |  '{"state":"' || state ||
         |  '","restarts":' || CAST(n_restarts AS VARCHAR) ||
         |  ',"lastHeartbeat":' || CAST(last_hb_s AS VARCHAR) ||
         |  ',"backoffSeconds":' || CAST(backoff_s AS VARCHAR) || '}'
         |FROM lcf
         |UNION ALL
         |SELECT '/status/datasource', db,
         |  '{"name":"' || db ||
         |  '","type":"' || db_type ||
         |  '","url":"' || jdbc_url ||
         |  '","sysSchema":"' || sys_schema ||
         |  '","sourceRoutes":' || CAST(n_source_routes AS VARCHAR) ||
         |  ',"targetRoutes":' || CAST(n_target_routes AS VARCHAR) || '}'
         |FROM (VALUES
         |  $dsValues
         |) AS t(db, db_type, jdbc_url, sys_schema,
         |       n_source_routes, n_target_routes)
         |UNION ALL
         |SELECT '/config', 'config',
         |  ${esc(graft.config.SyncConfigs.configEndpointJson())}""".stripMargin
    },

    // one age computation classified against every candidate window;
    // candidates from the shared Ledger constants
    "retention_sweep" -> {
      import graft.operators.Ledger.{KeepHours, RetentionSweepH}
      val cands = (RetentionSweepH :+ KeepHours).distinct.sorted
        .mkString(", ")
      s"""WITH $CL,
         |wm AS (SELECT MAX(epoch_s) AS max_s FROM cl),
         |x AS (SELECT value_cents, wm.max_s - epoch_s AS age_s,
         |    k.keep_h
         |  FROM cl CROSS JOIN wm,
         |    UNNEST([$cands]) AS k(keep_h))
         |SELECT CAST(keep_h AS BIGINT) AS keep_h,
         |  CAST(COUNT(CASE WHEN age_s <= keep_h * 3600 THEN 1 END)
         |    AS BIGINT) AS n_kept,
         |  CAST(COUNT(CASE WHEN age_s > keep_h * 3600 THEN 1 END)
         |    AS BIGINT) AS n_purged,
         |  CAST(COALESCE(SUM(CASE WHEN age_s <= keep_h * 3600
         |    THEN value_cents END), 0) AS BIGINT) AS kept_mass_cents,
         |  CAST(keep_h = ${graft.operators.Ledger.KeepHours} AS VARCHAR)
         |    AS is_production
         |FROM x GROUP BY keep_h""".stripMargin
    },

    "clean_retention" ->
      s"""WITH $CL,
         |wm AS (SELECT MAX(epoch_s) AS max_s FROM cl)
         |SELECT part, op,
         |  CAST(COUNT(CASE WHEN epoch_s >= max_s - 259200 THEN 1 END) AS BIGINT) AS n_kept,
         |  CAST(COUNT(CASE WHEN epoch_s < max_s - 259200 THEN 1 END) AS BIGINT) AS n_cleaned
         |FROM cl, wm GROUP BY 1, 2""".stripMargin,

    "scd2_history" ->
      s"""WITH $CL,
         |h AS (SELECT *,
         |  LEAD(ems, 1) OVER (PARTITION BY user_id
         |    ORDER BY ems, event_id) AS valid_to_ms
         |  FROM cl)
         |SELECT user_id, event_id, op, value_cents,
         |  ems AS valid_from_ms, valid_to_ms,
         |  CASE WHEN valid_to_ms IS NULL THEN 'true' ELSE 'false' END AS is_current
         |FROM h WHERE op <> 'D'""".stripMargin,

    // gaps-and-islands: island id = difference of two row_numbers over
    // the same key partition; periods chain via LEAD on island starts
    "tier_history" -> TierHistorySql,

    "stream_tier_parity" -> TierHistorySql,

    "event_gaps" ->
      s"""WITH $CL,
         |g AS (SELECT user_id, event_id, ems,
         |  LAG(ems, 1) OVER (PARTITION BY user_id ORDER BY ems, event_id) AS prev_ems,
         |  LAG(event_id, 1) OVER (PARTITION BY user_id ORDER BY ems, event_id) AS prev_event_id
         |  FROM cl)
         |SELECT user_id, event_id, prev_event_id, ems - prev_ems AS gap_ms
         |FROM g WHERE prev_ems IS NOT NULL""".stripMargin,

    "sessionize" -> SessionizeSql,

    // single-event-session census over the sessionize grid verbatim
    "bounce_rate" ->
      s"""WITH sess AS ($SessionizeSql)
         |SELECT 'db' || (user_id % 3) AS db,
         |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
         |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_bounce,
         |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
         |    * 1000000 // COUNT(*) AS BIGINT) AS bounce_ppm,
         |  CAST(SUM(n_events) * 1000 // COUNT(*) AS BIGINT)
         |    AS events_per_session_milli
         |FROM sess GROUP BY 1""".stripMargin,

    // the streaming sessionizer's ordered replay must close exactly
    // the batch sessions — the oracle IS sessionize's
    "stream_sessionize_parity" -> SessionizeSql,

    // two full at-least-once delivery passes must survive as each
    // event exactly once — a leaked duplicate or dropped first
    // delivery both hash-fail against the plain id set
    "stream_dedup_parity" -> "SELECT event_id FROM events",

    "asof_enrich" ->
      s"""WITH $CL,
         |op AS (
         |  SELECT o_custkey, epoch_ms(o_orderdate) AS t,
         |    arg_max(CAST(ROUND(o_totalprice*100) AS BIGINT), o_orderkey) AS price_cents
         |  FROM orders GROUP BY 1, 2)
         |SELECT cl.event_id, cl.user_id, cl.ems,
         |       op.price_cents AS last_order_cents
         |FROM cl ASOF LEFT JOIN op
         |  ON cl.user_id = op.o_custkey AND cl.ems >= op.t""".stripMargin,

    // PIT semantics: latest change at-or-before each end-of-day probe,
    // deduped to the max event_id per (user, ems); a 'D' there =
    // validity gap (DELETED), no prior change at all = NONE
    "pit_snapshot" ->
      s"""WITH $CL,
         |vs AS (SELECT user_id, ems, MAX(event_id) AS event_id,
         |    arg_max(op, event_id) AS op,
         |    arg_max(value_cents, event_id) AS value_cents
         |  FROM cl GROUP BY 1, 2),
         |d AS (SELECT DISTINCT ems // 86400000 AS day FROM cl),
         |u AS (SELECT DISTINCT user_id FROM cl),
         |f AS (SELECT u.user_id, d.day,
         |    (d.day + 1) * 86400000 - 1 AS t FROM u, d)
         |SELECT f.user_id, f.day,
         |  CASE WHEN vs.op IS NOT NULL AND vs.op <> 'D'
         |    THEN vs.event_id END AS v_event_id,
         |  CASE WHEN vs.op IS NOT NULL AND vs.op <> 'D'
         |    THEN vs.value_cents END AS v_value_cents,
         |  CASE WHEN vs.op IS NULL THEN 'NONE'
         |       WHEN vs.op = 'D' THEN 'DELETED'
         |       ELSE 'LIVE' END AS version_state
         |FROM f ASOF LEFT JOIN vs
         |  ON f.user_id = vs.user_id AND f.t >= vs.ems""".stripMargin,

    "range_join_events" ->
      s"""WITH $CL
         |SELECT o.o_orderkey, CAST(COUNT(cl.event_id) AS BIGINT) AS n_events_7d
         |FROM orders o LEFT JOIN cl
         |  ON cl.user_id = o.o_custkey
         |  AND cl.ems >= epoch_ms(o.o_orderdate)
         |  AND cl.ems < epoch_ms(o.o_orderdate) + 604800000
         |GROUP BY 1""".stripMargin,

    // the oracle is the UNSALTED join — salting must be invisible in
    // the result
    "skew_salted_join" ->
      s"""WITH $CL
         |SELECT c.c_mktsegment,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(SUM(cl.value_cents) AS BIGINT) AS sum_cents
         |FROM cl JOIN customer c ON cl.user_id = c.c_custkey
         |GROUP BY 1""".stripMargin,

    "log_compact" ->
      s"""WITH $CL, $LAST,
         |wm AS (SELECT MAX(epoch_s) AS max_s FROM cl)
         |SELECT cl.event_id, cl.user_id, cl.op,
         |  CASE WHEN cl.epoch_s >= wm.max_s - 259200 AND l.event_id IS NOT NULL THEN 'BOTH'
         |       WHEN l.event_id IS NOT NULL THEN 'LATEST'
         |       ELSE 'RECENT' END AS kept_reason
         |FROM cl CROSS JOIN wm
         |LEFT JOIN last l ON cl.event_id = l.event_id
         |WHERE cl.epoch_s >= wm.max_s - 259200 OR l.event_id IS NOT NULL""".stripMargin,

    // (db, window) file inventory + cumulative-sum binning generated
    // from the same CompactWinMs/CompactTargetRows constants
    "compaction_plan" -> CompactionSql,

    // the streaming file-inventory lane bins through the SAME batch
    // code path and replays into the same oracle text
    "stream_compaction_parity" -> CompactionSql,

    // the sketch has no DuckDB twin; the oracle recomputes the exact
    // count and pins the error-band verdict — an out-of-band sketch
    // breaks the hash match
    "approx_distinct" ->
      s"""WITH $CL
         |SELECT 'db' || (user_id % 3) AS db,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
         |  'true' AS approx_within_5pct
         |FROM cl GROUP BY 1""".stripMargin,

    "value_median" ->
      s"""WITH $CL,
         |r AS (SELECT op, value_cents, event_id,
         |  ROW_NUMBER() OVER (PARTITION BY op ORDER BY value_cents, event_id) AS rn,
         |  COUNT(*) OVER (PARTITION BY op) AS cnt
         |  FROM cl)
         |SELECT op, value_cents AS median_low_cents, CAST(cnt AS BIGINT) AS n
         |FROM r WHERE rn = (cnt + 1) // 2""".stripMargin,

    "value_quantiles" -> {
      val pcts = graft.operators.Ledger.QuantilePcts.mkString("[", ", ", "]")
      s"""WITH $CL,
         |a AS (SELECT op, value_cents, COUNT(*) AS c FROM cl GROUP BY 1, 2),
         |r AS (SELECT op, value_cents,
         |    CAST(SUM(c) OVER (PARTITION BY op ORDER BY value_cents)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(c) OVER (PARTITION BY op) AS BIGINT) AS cnt FROM a),
         |x AS (SELECT op, value_cents, cum, cnt, CAST(p.pct AS BIGINT) AS pct
         |  FROM r, UNNEST($pcts) AS p(pct))
         |SELECT op, pct, MIN(value_cents) AS q_cents,
         |  CAST(MAX(cnt) AS BIGINT) AS n
         |FROM x WHERE cum >= (cnt * pct + 99) // 100
         |GROUP BY 1, 2""".stripMargin
    },

    // the GK sketch has no DuckDB twin; the oracle recomputes the
    // exact quantile vector and pins the rank-band verdict (the
    // approx_distinct pattern) — a sketch straying past 2% rank error
    // breaks the hash match
    "quantile_sketch_error" -> {
      val pcts = graft.operators.Ledger.QuantilePcts.mkString("[", ", ", "]")
      s"""WITH $CL,
         |a AS (SELECT op, value_cents, COUNT(*) AS c FROM cl GROUP BY 1, 2),
         |r AS (SELECT op, value_cents,
         |    CAST(SUM(c) OVER (PARTITION BY op ORDER BY value_cents)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(c) OVER (PARTITION BY op) AS BIGINT) AS cnt FROM a),
         |x AS (SELECT op, value_cents, cum, cnt, CAST(p.pct AS BIGINT) AS pct
         |  FROM r, UNNEST($pcts) AS p(pct))
         |SELECT op, pct, MIN(value_cents) AS q_exact_cents,
         |  CAST(MAX(cnt) AS BIGINT) AS n, 'true' AS approx_within_2pct
         |FROM x WHERE cum >= (cnt * pct + 99) // 100
         |GROUP BY 1, 2""".stripMargin
    },

    "sync_lag" ->
      s"""WITH $CL, $STATUS,
         |g AS (SELECT 'db' || (user_id % 3) AS db,
         |    MAX(CASE WHEN event_id % 7 = 0 AND status = 'OK'
         |      THEN ems END) AS applied_ems,
         |    MIN(CASE WHEN NOT (event_id % 7 = 0 AND status = 'OK')
         |      THEN ems END) AS oldest_pending_ems,
         |    MIN(ems) AS first_ems,
         |    CAST(COUNT(CASE WHEN NOT (event_id % 7 = 0 AND status = 'OK')
         |      THEN 1 END) AS BIGINT) AS n_unapplied
         |  FROM a GROUP BY 1),
         |n AS (SELECT MAX(ems) AS now_ems FROM cl)
         |SELECT db,
         |  (now_ems - COALESCE(applied_ems, first_ems)) // 1000
         |    AS apply_lag_s,
         |  (now_ems - COALESCE(oldest_pending_ems, now_ems)) // 1000
         |    AS oldest_pending_age_s,
         |  n_unapplied
         |FROM g, n""".stripMargin,

    "key_skew_report" ->
      s"""WITH $CL,
         |c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_changes
         |  FROM cl GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_changes) AS BIGINT) AS total FROM c)
         |SELECT user_id, n_changes, (n_changes * 1000000) // total
         |  AS share_ppm
         |FROM c, t ORDER BY n_changes DESC, user_id
         |LIMIT ${graft.operators.Ledger.SkewTopK}""".stripMargin,

    "queue_depth" ->
      s"""WITH $CL
         |SELECT part, (ems - ems % 3600000) // 1000 AS hour_s,
         |       CAST(COUNT(*) AS BIGINT) AS depth
         |FROM cl GROUP BY 1, 2""".stripMargin,

    "session_gap_sweep" -> {
      import graft.operators.Temporal.GapSweepS
      val aggs = GapSweepS.map { g =>
        s"""    CAST(SUM(CASE WHEN gap_ms IS NULL OR gap_ms > ${g * 1000}
           |      THEN 1 ELSE 0 END) AS BIGINT) AS ns_$g,
           |    CAST(SUM(CASE WHEN NOT (gap_ms IS NULL
           |      OR gap_ms > ${g * 1000})
           |      THEN gap_ms ELSE 0 END) AS BIGINT) AS intra_$g"""
          .stripMargin
      }.mkString(",\n")
      val rows = GapSweepS.map { g =>
        s"""SELECT CAST($g AS BIGINT) AS gap_s, ns_$g AS n_sessions,
           |  n_events * 1000 // ns_$g AS events_per_session_milli,
           |  (intra_$g // ns_$g) // 1000 AS mean_duration_s FROM t"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $CL,
         |d AS (SELECT ems - LAG(ems) OVER (PARTITION BY user_id
         |    ORDER BY ems, event_id) AS gap_ms FROM cl),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
         |$aggs
         |  FROM d)
         |$rows""".stripMargin
    },

    "balance_audit" -> BalanceAuditSql,

    // the streaming twin replays the same ledger through
    // flatMapGroupsWithState — ONE oracle pins both lanes
    "stream_balance_parity" -> BalanceAuditSql,

    "rpo_audit" -> {
      import graft.operators.Ledger.{RpoSlaS, RtoSlaS}
      s"""WITH $CL, $STATUS,
         |g AS (SELECT 'db' || (user_id % 3) AS db,
         |    CAST(COUNT(CASE WHEN event_id % 7 = 0 AND status = 'OK'
         |      THEN 1 END) AS BIGINT) AS n_applied,
         |    CAST(COUNT(CASE WHEN NOT (event_id % 7 = 0
         |      AND status = 'OK') THEN 1 END) AS BIGINT) AS n_unapplied,
         |    MAX(CASE WHEN event_id % 7 = 0 AND status = 'OK'
         |      THEN ems END) AS last_applied_ems,
         |    MIN(CASE WHEN event_id % 7 = 0 AND status = 'OK'
         |      THEN ems END) AS first_applied_ems,
         |    MIN(CASE WHEN NOT (event_id % 7 = 0 AND status = 'OK')
         |      THEN ems END) AS oldest_pending_ems
         |  FROM a GROUP BY 1),
         |n AS (SELECT MAX(ems) AS now_ems FROM cl),
         |r AS (SELECT db, n_applied, n_unapplied,
         |    (now_ems - COALESCE(oldest_pending_ems, now_ems)) // 1000
         |      AS rpo_s,
         |    GREATEST((COALESCE(last_applied_ems, 0)
         |      - COALESCE(first_applied_ems, 0)) // 1000, 1) AS window_s
         |  FROM g, n)
         |SELECT db, n_applied, n_unapplied, rpo_s, window_s,
         |  n_unapplied * window_s // GREATEST(n_applied, 1) AS rto_s,
         |  CASE WHEN rpo_s <= $RpoSlaS
         |    AND n_unapplied * window_s // GREATEST(n_applied, 1)
         |      <= $RtoSlaS
         |    THEN 'true' ELSE 'false' END AS meets_sla
         |FROM r""".stripMargin
    },

    "status_rollup" ->
      s"""WITH $CL, $STATUS, $ST,
         |lastper AS (
         |  SELECT 'db' || (user_id % 3) AS db, 'worker-' || part AS component,
         |         MAX(epoch_s) AS last_hb_s
         |  FROM cl GROUP BY 1, 2),
         |clock AS (SELECT MAX(epoch_s) AS now_s FROM cl),
         |worst AS (
         |  SELECT CAST(MAX(CASE WHEN now_s - last_hb_s <= 21600 THEN 0 ELSE 1 END) AS BIGINT) AS any_red
         |  FROM lastper, clock)
         |SELECT 'N/A' AS name,
         |  CAST(SUM(pending) AS BIGINT) AS pending,
         |  CAST(SUM(blocked) AS BIGINT) AS blocked,
         |  CAST(SUM(error) AS BIGINT) AS error,
         |  CAST(SUM(success) AS BIGINT) AS success,
         |  CASE WHEN (SELECT any_red FROM worst) = 1 THEN 'RED' ELSE 'GREEN' END AS overall
         |FROM st""".stripMargin,

    "pause_filter" ->
      s"""WITH $CL, $ROUTED
         |SELECT target_db, part, n,
         |  CASE WHEN target_db = 'tdb2' THEN 'PAUSED' ELSE 'FLOWING' END AS route_state
         |FROM routed""".stripMargin,

    "olap_pricing_summary" ->
      """WITH l AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_c,
        |    CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c,
        |    CAST(ROUND(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) AS rev_c
        |  FROM lineitem)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(qty_c) AS BIGINT) AS sum_qty_c,
        |  CAST(SUM(price_c) AS BIGINT) AS sum_price_c,
        |  CAST(SUM(rev_c) AS BIGINT) AS sum_rev_c,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM l GROUP BY 1, 2""".stripMargin,

    "olap_top_revenue" ->
      """WITH r AS (
        |  SELECT o.o_orderkey,
        |    CAST(SUM(CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
        |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1)
        |SELECT o_orderkey, revenue_c, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue_c DESC, o_orderkey) AS rn
        |  FROM r) t WHERE rn <= 10""".stripMargin,

    "olap_supplier_nation" ->
      """SELECT n.n_name,
        |  CAST(SUM(CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY 1""".stripMargin,

    "olap_top_supplier" ->
      s"""WITH rev AS (SELECT l_suppkey,
         |    CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*100)
         |      AS BIGINT)) AS BIGINT) AS total_rev_c
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '${Analytics.TopSupplierStart}'
         |    AND l_shipdate < TIMESTAMP '${Analytics.TopSupplierEndEx}'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_rev_c
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM rev)""".stripMargin,

    "olap_trade_matrix" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
        |  CAST(SUM(CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)*100)
        |    AS BIGINT)) AS BIGINT) AS revenue_c,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |WHERE sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3""".stripMargin,

    "olap_market_share" ->
      s"""SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
         |  CAST(SUM(CASE WHEN sn.n_name = '${Analytics.ShareNation}'
         |    THEN CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)*100)
         |      AS BIGINT) ELSE 0 END) AS BIGINT) AS nation_rev_c,
         |  CAST(SUM(CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)*100)
         |    AS BIGINT)) AS BIGINT) AS total_rev_c,
         |  CAST(SUM(CASE WHEN sn.n_name = '${Analytics.ShareNation}'
         |    THEN CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)*100)
         |      AS BIGINT) ELSE 0 END) * 1000000
         |    // SUM(CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)*100)
         |      AS BIGINT)) AS BIGINT) AS share_ppm
         |FROM lineitem l
         |JOIN part p ON l.l_partkey = p.p_partkey
         |  AND p.p_type = '${Analytics.SharePartType}'
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         |JOIN region r ON cn.n_regionkey = r.r_regionkey
         |  AND r.r_name = '${Analytics.ShareRegion}'
         |GROUP BY 1""".stripMargin,

    "olap_product_profit" ->
      s"""SELECT sn.n_name AS supp_nation,
         |  CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
         |  CAST(SUM(CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)*100)
         |    AS BIGINT)) AS BIGINT) AS profit_c,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem l
         |JOIN part p ON l.l_partkey = p.p_partkey
         |  AND p.p_name LIKE '%${Analytics.ProfitNameToken}%'
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |GROUP BY 1, 2""".stripMargin,

    "olap_order_dist" ->
      """SELECT c_count,
        |  CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (SELECT c.c_custkey,
        |    CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1)
        |GROUP BY 1""".stripMargin,

    "olap_parts_suppliers" ->
      s"""SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
         |  CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
         |FROM lineitem l
         |JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE p.p_size IN (${Analytics.PartsSupplierSizes.mkString(", ")})
         |  AND p.p_brand <> '${Analytics.PartsSupplierExclBrand}'
         |  AND p.p_type NOT LIKE 'PROMO%'
         |GROUP BY 1, 2, 3""".stripMargin,

    "olap_small_qty" ->
      s"""WITH b AS (SELECT
         |    CAST(ROUND(l.l_quantity*100) AS BIGINT) AS qty_c,
         |    CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)*100)
         |      AS BIGINT) AS rev_c,
         |    SUM(CAST(ROUND(l.l_quantity*100) AS BIGINT))
         |      OVER (PARTITION BY l.l_partkey) AS sum_qty_c,
         |    COUNT(*) OVER (PARTITION BY l.l_partkey) AS n_part
         |  FROM lineitem l
         |  JOIN part p ON l.l_partkey = p.p_partkey
         |    AND p.p_brand = '${Analytics.SmallQtyBrand}')
         |SELECT CAST(SUM(rev_c) AS BIGINT) AS small_qty_rev_c,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM b WHERE qty_c * n_part * 5 < sum_qty_c""".stripMargin,

    "olap_bulk_discount" ->
      """WITH f AS (SELECT
        |    CAST(ROUND(l.l_quantity*100) AS BIGINT) AS qty_c,
        |    CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)*100)
        |      AS BIGINT) AS rev_c,
        |    p.p_brand, p.p_size
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT CAST(SUM(rev_c) AS BIGINT) AS bulk_rev_c,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM f
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND qty_c BETWEEN 100 AND 1100)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND qty_c BETWEEN 1000 AND 2000)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |    AND qty_c BETWEEN 2000 AND 3000)""".stripMargin,

    "olap_sales_opportunity" ->
      s"""WITH cust AS (SELECT c_custkey, c_mktsegment,
         |    CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c
         |  FROM customer),
         |pos AS (SELECT SUM(bal_c) AS sum_pos_c, COUNT(*) AS n_pos
         |  FROM cust WHERE bal_c > 0)
         |SELECT c_mktsegment,
         |  CAST(COUNT(*) AS BIGINT) AS n_custs,
         |  CAST(SUM(bal_c) AS BIGINT) AS total_bal_c
         |FROM cust, pos
         |WHERE bal_c * n_pos > sum_pos_c
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |    WHERE o.o_custkey = cust.c_custkey
         |      AND o.o_orderdate >=
         |        TIMESTAMP '${Analytics.OpportunityCutoff} 00:00:00')
         |GROUP BY 1""".stripMargin,

    "olap_returned_top" ->
      s"""WITH r AS (SELECT o.o_custkey,
         |    CAST(SUM(CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)*100)
         |      AS BIGINT)) AS BIGINT) AS lost_rev_c,
         |    CAST(COUNT(*) AS BIGINT) AS n_items
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE l.l_returnflag = 'R' GROUP BY 1)
         |SELECT c_custkey, c_name, n_name, lost_rev_c, n_items,
         |  CAST(ROW_NUMBER() OVER (ORDER BY lost_rev_c DESC, c_custkey)
         |    AS BIGINT) AS rank
         |FROM r JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY lost_rev_c DESC, c_custkey
         |LIMIT ${Analytics.ReturnedTopK}""".stripMargin,

    "olap_large_orders" ->
      s"""WITH big AS (SELECT l_orderkey,
         |    CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
         |      AS sum_qty_c
         |  FROM lineitem GROUP BY 1
         |  HAVING sum_qty_c > ${Analytics.LargeOrderMinQtyC})
         |SELECT c_custkey, c_name, o_orderkey,
         |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_price_c,
         |  sum_qty_c
         |FROM big JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // one SELECT per (table, column) — exact NDV so the profile is
    // hash-verifiable; generated from the same column lists Spark scans
    // both catalog oracles are generated from Snapshot.CatalogColumns —
    // the same grid the Spark registry entries select — so testdata
    // schema evolution cannot silently desynchronize the two sides
    "catalog_stats" ->
      graft.operators.Snapshot.CatalogColumns.flatMap { case (t, cols) =>
        cols.map { c =>
          s"""SELECT '$t' AS table_name,
             |  CAST((SELECT COUNT(*) FROM $t) AS BIGINT) AS n_rows,
             |  '$c' AS column_name,
             |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(COALESCE(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END),
             |    0) AS BIGINT) AS n_null
             |FROM $t""".stripMargin
        }
      }.mkString("\nUNION ALL\n"),

    // per-table byte estimate generated from the SAME AdvisorGrid
    // (fixed widths + exact octet-length sums) and target constant
    "partition_advisor" -> {
      val tgt = graft.operators.Snapshot.TargetPartitionBytes
      val per = graft.operators.Snapshot.AdvisorGrid.map {
        case (t, cols) =>
          val fixedW = cols.collect {
            case (_, "f8") => 8L
            case (_, "f4") => 4L
          }.sum
          // DuckDB byte length of VARCHAR is strlen (octet_length is
          // BLOB-only there); Spark's octet_length is the byte twin
          val strs = cols.collect { case (c, "str") =>
            s"strlen($c)"
          }
          val strSum =
            if (strs.isEmpty) "0"
            else s"COALESCE(SUM(${strs.mkString(" + ")}), 0)"
          s"""SELECT '$t' AS table_name,
             |  CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(COUNT(*) * $fixedW + $strSum AS BIGINT) AS est_bytes
             |FROM $t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH u AS ($per)
         |SELECT table_name, n_rows, est_bytes,
         |  CAST(est_bytes // greatest(n_rows, 1) AS BIGINT)
         |    AS bytes_per_row,
         |  CAST(greatest((est_bytes + $tgt - 1) // $tgt, 1) AS BIGINT)
         |    AS rec_partitions,
         |  CASE WHEN greatest((est_bytes + $tgt - 1) // $tgt, 1) = 1
         |    THEN 'SINGLE' ELSE 'SPLIT' END AS verdict
         |FROM u""".stripMargin
    },

    // the sketch gate: DuckDB recomputes the exact NDV and pins the
    // error-band verdict to 'true' (the approx_distinct pattern) — a
    // sketch drifting out of its 5% band fails the hash match
    "catalog_stats_sketch" ->
      graft.operators.Snapshot.CatalogColumns.flatMap { case (t, cols) =>
        cols.map { c =>
          s"""SELECT '$t' AS table_name,
             |  CAST((SELECT COUNT(*) FROM $t) AS BIGINT) AS n_rows,
             |  '$c' AS column_name,
             |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  'true' AS approx_within_5pct
             |FROM $t""".stripMargin
        }
      }.mkString("\nUNION ALL\n"),

    // live schema read from DuckDB's OWN catalog (DESCRIBE) and
    // canonicalized — only the table LIST comes from the shared
    // constant, so the check cross-verifies that both engines derive
    // the same logical schema from the same parquet
    "schema_drift" -> {
      import graft.operators.Snapshot.DriftMod
      val descrs = graft.operators.Snapshot.CatalogColumns.map(_._1)
        .map { t =>
          s"  SELECT '$t' AS table_name, column_name, column_type " +
            s"FROM (DESCRIBE $t)"
        }.mkString("\nUNION ALL\n")
      s"""WITH live AS (
         |$descrs),
         |c AS (SELECT table_name, column_name,
         |    CASE column_type
         |      WHEN 'INTEGER' THEN 'int32' WHEN 'BIGINT' THEN 'int64'
         |      WHEN 'FLOAT' THEN 'float32' WHEN 'DOUBLE' THEN 'float64'
         |      WHEN 'VARCHAR' THEN 'string' WHEN 'DATE' THEN 'date'
         |      WHEN 'TIMESTAMP' THEN 'timestamp'
         |      WHEN 'TIMESTAMP_NS' THEN 'timestamp'
         |      ELSE lower(column_type) END AS col_type
         |  FROM live),
         |d AS (SELECT *,
         |    ${sqlPhash("'target:' || table_name || ':' || column_name")}
         |      % $DriftMod != 0 AS on_target
         |  FROM c)
         |SELECT table_name, column_name, col_type,
         |  CASE WHEN on_target THEN 'OK' ELSE 'ADD' END AS action,
         |  CASE WHEN on_target THEN ''
         |    ELSE 'ALTER TABLE ' || table_name || ' ADD COLUMN ' ||
         |      column_name || ' ' ||
         |      CASE col_type
         |        WHEN 'int32' THEN 'INTEGER' WHEN 'int64' THEN 'BIGINT'
         |        WHEN 'float32' THEN 'REAL'
         |        WHEN 'float64' THEN 'DOUBLE PRECISION'
         |        WHEN 'string' THEN 'TEXT'
         |        WHEN 'timestamp' THEN 'TIMESTAMP'
         |        WHEN 'date' THEN 'DATE' ELSE '' END
         |    END AS ddl
         |FROM d""".stripMargin
    },

    "initial_sync" ->
      """SELECT c_custkey, c_name, n_name, r_name, c_mktsegment,
        |       CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "delta_detect" ->
      """WITH base AS (
        |  SELECT c_custkey, CAST(ROUND(c_acctbal*100) AS BIGINT) AS cents
        |  FROM customer),
        |src AS (SELECT c_custkey AS src_key, cents AS src_cents FROM base),
        |tgt AS (
        |  SELECT c_custkey AS tgt_key,
        |         cents + CASE WHEN c_custkey%10=0 THEN 100 ELSE 0 END AS tgt_cents
        |  FROM base WHERE c_custkey%13 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, cents FROM base WHERE c_custkey%17 = 0)
        |SELECT * FROM (
        |  SELECT COALESCE(src_key, tgt_key) AS key,
        |    CASE WHEN tgt_key IS NULL THEN 'INSERT'
        |         WHEN src_key IS NULL THEN 'DELETE'
        |         WHEN src_cents <> tgt_cents THEN 'UPDATE'
        |         ELSE 'NONE' END AS change_type,
        |    src_cents, tgt_cents
        |  FROM src FULL OUTER JOIN tgt ON src_key = tgt_key) d
        |WHERE change_type <> 'NONE'""".stripMargin,

    // two-way conflict classification + LWW pick, same simulated-drift
    // convention as delta_detect (deterministic key mods, phash ts)
    "sync_conflicts" ->
      s"""WITH b AS (SELECT CAST(c_custkey AS BIGINT) AS key,
         |    CAST(ROUND(c_acctbal*100) AS BIGINT) AS base_cents,
         |    c_custkey % 7 = 0 AS src_edit,
         |    c_custkey % 10 = 0 AS tgt_edit
         |  FROM customer),
         |e AS (SELECT key, base_cents, src_edit, tgt_edit,
         |    CASE WHEN src_edit THEN base_cents + 50
         |      ELSE base_cents END AS src_cents,
         |    CASE WHEN tgt_edit THEN base_cents + 100
         |      ELSE base_cents END AS tgt_cents,
         |    CASE WHEN src_edit THEN ${sqlPhash("'s:' || key")} % 1000
         |      ELSE -1 END AS src_ts,
         |    CASE WHEN tgt_edit THEN ${sqlPhash("'t:' || key")} % 1000
         |      ELSE -1 END AS tgt_ts
         |  FROM b WHERE src_edit OR tgt_edit)
         |SELECT key, base_cents, src_cents, tgt_cents,
         |  CAST(src_ts AS BIGINT) AS src_ts, CAST(tgt_ts AS BIGINT) AS tgt_ts,
         |  CASE WHEN src_edit AND NOT tgt_edit THEN 'APPLY_TO_TARGET'
         |       WHEN tgt_edit AND NOT src_edit THEN 'APPLY_TO_SOURCE'
         |       WHEN tgt_ts > src_ts THEN 'CONFLICT_TGT_WINS'
         |       ELSE 'CONFLICT_SRC_WINS' END AS action,
         |  CASE WHEN (tgt_edit AND NOT src_edit)
         |      OR (src_edit AND tgt_edit AND tgt_ts > src_ts)
         |    THEN tgt_cents ELSE src_cents END AS resolved_cents
         |FROM e""".stripMargin,

    "source_partition_plan" ->
      """WITH b AS (
        |  SELECT CAST(MIN(c_custkey) AS BIGINT) AS lo,
        |         CAST(MAX(c_custkey) AS BIGINT) AS hi
        |  FROM customer),
        |p AS (SELECT UNNEST(range(0, 8)) AS pid),
        |s AS (SELECT pid, lo, hi, (hi - lo) // 8 AS stride FROM p, b)
        |SELECT pid,
        |  lo + pid*stride AS range_lo,
        |  CASE WHEN pid = 7 THEN hi + 1 ELSE lo + (pid+1)*stride END AS range_hi,
        |  'c_custkey >= ' || (lo + pid*stride) || ' AND c_custkey < ' ||
        |    (CASE WHEN pid = 7 THEN hi + 1 ELSE lo + (pid+1)*stride END) AS predicate
        |FROM s""".stripMargin,

    "trigger_specs" -> {
      val values = graft.config.SyncConfigs.triggerSpecRows()
        .map { case (db, dia, sch, tbl, op, trg, fn, ddl) =>
          s"(${esc(db)}, ${esc(dia)}, ${esc(sch)}, ${esc(tbl)}, " +
            s"${esc(op)}, ${esc(trg)}, ${esc(fn)}, ${esc(ddl)})"
        }.mkString(",\n  ")
      s"""SELECT * FROM (VALUES
         |  $values
         |) AS t(source_db, dialect, schema_name, table_name, op,
         |       trigger_name, function_name, ddl)""".stripMargin
    },

    // The reconciliation INPUTS (config-derived desired set, simulated
    // existing catalog) are shared literals; the DIFF itself is computed
    // independently — DataFrame full-outer join in Spark, SQL full-outer
    // join here.
    "sync_reconcile" -> {
      def catalogValues(rows: Seq[graft.config.SyncConfigs.CatalogRow],
                        vcol: String): String = {
        val values = rows.map { case (db, sch, tbl, ot, on, v) =>
          s"(${esc(db)}, ${esc(sch)}, ${esc(tbl)}, ${esc(ot)}, ${esc(on)}, ${esc(v)})"
        }.mkString(",\n    ")
        s"""SELECT * FROM (VALUES
           |    $values
           |  ) AS t(db, schema_name, table_name, object_type, object_name, $vcol)"""
          .stripMargin
      }
      s"""WITH want AS (
         |  ${catalogValues(graft.config.SyncConfigs.desiredCatalogRows(), "want_version")}),
         |have AS (
         |  ${catalogValues(graft.config.SyncConfigs.existingCatalogRows(), "have_version")})
         |SELECT COALESCE(w.db, h.db) AS db,
         |  COALESCE(w.schema_name, h.schema_name) AS schema_name,
         |  COALESCE(w.table_name, h.table_name) AS table_name,
         |  COALESCE(w.object_type, h.object_type) AS object_type,
         |  COALESCE(w.object_name, h.object_name) AS object_name,
         |  CASE WHEN h.have_version IS NULL THEN 'CREATE'
         |       WHEN w.want_version IS NULL
         |            AND h.object_type = 'trigger' THEN 'DROP'
         |       WHEN w.want_version IS NULL THEN 'KEEP'
         |       WHEN w.want_version = h.have_version THEN 'MATCHED'
         |       ELSE 'REBUILD' END AS action
         |FROM want w FULL OUTER JOIN have h
         |  ON w.db = h.db AND w.schema_name = h.schema_name
         |  AND w.table_name = h.table_name AND w.object_type = h.object_type
         |  AND w.object_name = h.object_name""".stripMargin
    },

    "datasource_status" -> {
      val values = graft.config.SyncConfigs.datasourceStatusRows()
        .map { case (db, t, url, sch, ns, nt) =>
          s"(${esc(db)}, ${esc(t)}, ${esc(url)}, ${esc(sch)}, " +
            s"CAST($ns AS BIGINT), CAST($nt AS BIGINT))"
        }.mkString(",\n  ")
      s"""SELECT * FROM (VALUES
         |  $values
         |) AS t(db, db_type, jdbc_url, sys_schema,
         |       n_source_routes, n_target_routes)""".stripMargin
    },

    "blocked_replay" ->
      s"""WITH $CL,
         |b AS (SELECT user_id, event_id, ems,
         |  MIN(CASE WHEN op='D' THEN event_id END) OVER (
         |    PARTITION BY user_id ORDER BY ems, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_err_eid
         |  FROM cl)
         |SELECT user_id, event_id, first_err_eid,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
         |    ORDER BY ems, event_id) AS BIGINT) AS replay_seq
         |FROM b WHERE first_err_eid IS NOT NULL AND first_err_eid % 5 < 3""".stripMargin,

    "poll_backoff" -> {
      val sys = graft.config.SyncConfigs
        .parse(graft.config.SyncConfigs.DemoYaml).sys
      val (batch, wait) = (sys.batch, sys.maxPollWait)
      s"""WITH $CL,
         |p AS (SELECT 'db' || (user_id % 3) AS db,
         |    (ems - ems % 3600000) // 1000 AS hour_s,
         |    CAST(COUNT(*) AS BIGINT) AS n_events
         |  FROM cl GROUP BY 1, 2)
         |SELECT db, hour_s, n_events,
         |  least(n_events, $batch) AS n_polled,
         |  (($batch - least(n_events, $batch)) * $wait) // $batch AS wait_ms
         |FROM p""".stripMargin
    },

    // independently pinned expected lint verdict for the demo config
    // (3 dbs, 5 routes, acyclic cascade, keys everywhere)
    "config_lint" ->
      """SELECT * FROM (VALUES
        |  ('CASCADE_CYCLE', CAST(0 AS BIGINT), '-', 'OK'),
        |  ('DUP_ROUTE', 0, '-', 'OK'),
        |  ('EMPTY_KEYS', 0, '-', 'OK'),
        |  ('SELF_ROUTE', 0, '-', 'OK'),
        |  ('UNKNOWN_DB', 0, '-', 'OK')
        |) AS t("check", n_violations, offenders, verdict)""".stripMargin,

    "config_matrix" ->
      """SELECT * FROM (VALUES
        |  ('db0','db1','public','customer','c_custkey', CAST(16 AS BIGINT)),
        |  ('db0','db2','public','customer','c_custkey', 16),
        |  ('db0','db1','public','orders','o_orderkey', 16),
        |  ('db1','db2','public','orders','o_orderkey', 16),
        |  ('db1','db2','public','lineitem','l_orderkey,l_linenumber', 16)
        |) AS t(source_db, target_db, schema_name, table_name, sync_keys, n_partitions)""".stripMargin,

    // the Spark side unrolls the closure with bounded joins; this
    // oracle walks the same edges with an actual recursive CTE —
    // independent derivations of the cascade topology
    "sync_topology" -> {
      val cfg = graft.config.SyncConfigs.parse(graft.config.SyncConfigs.DemoYaml)
      val edges = (for {
        sc <- cfg.sync
        t <- sc.targetDb.split(",").map(_.trim)
      } yield s"(${esc(sc.sourceTable)}, ${esc(sc.sourceDb)}, ${esc(t)})")
        .mkString(",\n    ")
      val maxHops = math.max(cfg.dbs.length - 1, 1)
      s"""WITH RECURSIVE edges AS (
         |  SELECT * FROM (VALUES
         |    $edges
         |  ) AS t(table_name, source_db, target_db)),
         |paths(table_name, origin_db, dest_db, hops, path) AS (
         |  SELECT table_name, source_db, target_db, CAST(1 AS BIGINT),
         |         source_db || '>' || target_db
         |  FROM edges
         |  UNION ALL
         |  SELECT p.table_name, p.origin_db, e.target_db, p.hops + 1,
         |         p.path || '>' || e.target_db
         |  FROM paths p JOIN edges e
         |    ON e.table_name = p.table_name AND e.source_db = p.dest_db
         |  WHERE p.hops < $maxHops)
         |SELECT table_name, origin_db, dest_db, hops, path FROM paths""".stripMargin
    },

    "stream_window_agg" -> WindowAggSql,

    // the Complete-mode streaming replay's final state must equal the
    // batch windowed aggregate — the oracle IS stream_window_agg's
    "stream_window_parity" -> WindowAggSql,

    // SQL replay of the watermark recurrence: batch = event-time range
    // (+1 for 1-in-10 hash stragglers), wm(b) = max ems of prior
    // batches - 5000, keep iff the 1-minute window end is still ahead
    // of wm at arrival — must hash-match Spark's Append-mode drops
    "stream_late_parity" -> {
      // the range-assignment arms, the straggler mod, the watermark
      // delay and the window width all come from the SAME CdcStream
      // constants the Scala replay uses — neither side can drift alone
      import graft.streaming.CdcStream.{LateBatches, LateDelayMs,
        LateStragglerMod, LateWindowMs}
      val rangeArms = (LateBatches - 1 to 1 by -1)
        .map(i => s"WHEN ems >= lo + (span * $i) // $LateBatches THEN $i")
        .mkString(" ")
      s"""WITH e AS (SELECT epoch_ms(ts) AS ems, event_type,
         |    CAST(ROUND(value * 100) AS BIGINT) AS value_cents, event_id
         |  FROM events),
         |bb AS (SELECT MIN(ems) AS lo, MAX(ems) AS hi,
         |    MAX(ems) - MIN(ems) + 1 AS span FROM e),
         |a AS (SELECT e.*,
         |    (CASE $rangeArms ELSE 0 END)
         |    + (CASE WHEN ${sqlPhash("'late:' || event_id")}
         |        % $LateStragglerMod = 0
         |        THEN 1 ELSE 0 END) AS b
         |  FROM e, bb),
         |bmax AS (SELECT b, MAX(ems) AS bm FROM a GROUP BY b),
         |wm AS (SELECT b, MAX(bm) OVER (ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |    - $LateDelayMs AS w
         |  FROM bmax),
         |surv AS (SELECT a.* FROM a JOIN wm USING (b)
         |  WHERE w IS NULL OR ((ems // $LateWindowMs) + 1) * $LateWindowMs > w)
         |SELECT (ems // $LateWindowMs) * ${LateWindowMs / 1000} AS win_s,
         |  event_type,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(value_cents) AS BIGINT) AS sum_cents
         |FROM surv GROUP BY 1, 2""".stripMargin
    },

    // the composed corpus build: quality gate → exact dedup → near-dup
    // removal → stratified sample → (lang, split) manifest. Rebuilt
    // stage by stage in SQL over the same hash constants; the minhash
    // chain reads the gated/exact-deduped survivor set (qq), exactly
    // like the Spark composition.
    "training_pipeline" -> {
      val rateCase = TextAnalysis.SampleRateMilli
        .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
      val keepSql =
        "length(text) BETWEEN 50 AND 2000 " +
          "AND len(string_split(text, ' ')) >= 10 " +
          "AND (len(regexp_extract_all(text, '[.,!?;:]')) * 1000) " +
          "// greatest(length(text), 1) <= 100"
      s"""WITH q AS (SELECT * FROM documents WHERE $keepSql),
         |ex AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),
         |qq AS (SELECT q.* FROM q JOIN ex USING (doc_id)),
         |${minhashCtes("qq")},
         |dups AS (SELECT DISTINCT doc_b AS doc_id FROM jac
         |  WHERE j_milli >= ${Dedup.JaccardMilli}),
         |kept AS (SELECT * FROM qq
         |  WHERE NOT EXISTS (SELECT 1 FROM dups d WHERE d.doc_id = qq.doc_id)),
         |samp AS (SELECT * FROM kept
         |  WHERE ${sqlPhash("'sample:' || doc_id")} % 1000 <
         |    CASE lang $rateCase
         |      ELSE ${TextAnalysis.DefaultRateMilli} END),
         |sp AS (SELECT lang,
         |    CASE WHEN ${sqlPhash("'split:' || doc_id")} % 100 < 98 THEN 'train'
         |         WHEN ${sqlPhash("'split:' || doc_id")} % 100 < 99 THEN 'val'
         |         ELSE 'test' END AS split,
         |    len(string_split(text, ' ')) AS toks
         |  FROM samp)
         |SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(toks) AS BIGINT) AS sum_tokens
         |FROM sp GROUP BY 1, 2""".stripMargin
    },

    "corpus_sample" -> {
      val rateCase = graft.operators.TextAnalysis.SampleRateMilli
        .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
      s"""WITH b AS (SELECT doc_id, lang,
         |    ${sqlPhash("'sample:' || doc_id")} % 1000 AS bucket,
         |    CAST(CASE lang $rateCase
         |      ELSE ${graft.operators.TextAnalysis.DefaultRateMilli} END
         |      AS BIGINT) AS rate_milli
         |  FROM documents)
         |SELECT doc_id, lang, bucket, rate_milli,
         |       CAST(bucket < rate_milli AS VARCHAR) AS sampled
         |FROM b""".stripMargin
    },

    "split_assign" ->
      s"""WITH b AS (SELECT lang,
         |    ${sqlPhash("'split:' || doc_id")} % 100 AS bucket
         |  FROM documents)
         |SELECT lang,
         |  CASE WHEN bucket < 98 THEN 'train'
         |       WHEN bucket < 99 THEN 'val' ELSE 'test' END AS split,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM b GROUP BY 1, 2""".stripMargin,

    // fold assignment and balance verdict generated from the SAME
    // NumFolds/KfoldTolPpm constants the Spark expression uses
    "split_kfold" -> {
      val k = graft.operators.TextAnalysis.NumFolds
      val tol = graft.operators.TextAnalysis.KfoldTolPpm
      s"""WITH p AS (SELECT
         |    ${sqlPhash("'fold:' || doc_id")} % $k AS fold,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |g AS (SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_tok) AS BIGINT) AS token_mass
         |  FROM p GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs FROM g),
         |x AS (SELECT fold, n_docs, token_mass,
         |    CAST(n_docs * 1000000 // tot_docs AS BIGINT) AS share_ppm
         |  FROM g, t)
         |SELECT fold, n_docs, token_mass, share_ppm,
         |  abs(share_ppm - ${1000000L / k}) AS dev_ppm,
         |  CASE WHEN abs(share_ppm - ${1000000L / k}) <= $tol
         |    THEN 'BALANCED' ELSE 'SKEWED' END AS verdict
         |FROM x""".stripMargin
    },

    "k_anonymity" ->
      s"""WITH t AS (SELECT lang, source, doc_id,
         |    CASE WHEN len(string_split(text, ' ')) > 0
         |      THEN CAST(length(format('{:b}',
         |        len(string_split(text, ' ')))) AS BIGINT)
         |      ELSE 0 END AS len_bucket
         |  FROM documents)
         |SELECT lang, source, len_bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
         |  CAST(COUNT(*) < ${TextAnalysis.KAnonThreshold} AS VARCHAR)
         |    AS at_risk
         |FROM t GROUP BY 1, 2, 3""".stripMargin,

    // one ROLLUP pass over the k_anonymity QI grid -> 4 ladder levels;
    // chosen = minimal level with zero at-risk cells
    "anon_generalize" ->
      s"""WITH t AS (SELECT lang, source,
         |    CASE WHEN len(string_split(text, ' ')) > 0
         |      THEN CAST(length(format('{:b}',
         |        len(string_split(text, ' ')))) AS BIGINT)
         |      ELSE 0 END AS len_bucket
         |  FROM documents),
         |cells AS (SELECT
         |    CASE GROUPING(lang, source, len_bucket)
         |      WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 3 THEN 2
         |      ELSE 3 END AS level,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM t GROUP BY ROLLUP (lang, source, len_bucket)),
         |per AS (SELECT CAST(level AS BIGINT) AS level,
         |    CAST(COUNT(*) AS BIGINT) AS n_groups,
         |    CAST(MIN(n_docs) AS BIGINT) AS min_group,
         |    CAST(SUM(CASE WHEN n_docs < ${TextAnalysis.KAnonThreshold}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_at_risk,
         |    CAST(SUM(CASE WHEN n_docs < ${TextAnalysis.KAnonThreshold}
         |      THEN n_docs ELSE 0 END) AS BIGINT) AS docs_at_risk
         |  FROM cells GROUP BY 1),
         |best AS (SELECT MIN(level) AS best_level FROM per
         |  WHERE n_at_risk = 0)
         |SELECT level, n_groups, min_group, n_at_risk, docs_at_risk,
         |  CAST(n_at_risk = 0 AS VARCHAR) AS satisfies_k,
         |  CAST(COALESCE(level = best_level, FALSE) AS VARCHAR)
         |    AS chosen
         |FROM per, best""".stripMargin,

    // exact integer log2 points (rank from the vocab-sized window,
    // tie-permutation-invariant), bigint sufficient statistics,
    // truncating div for slope/intercept, e6 float Pearson for r
    // damped tf^(3/4)-style weight as floor-sqrt(tf) * floor-sqrt of
    // that — the SAME ±1-adjusted integer sqrt as mix_temperature, so
    // both engines agree bit-for-bit with no float pow
    "negative_sampling" ->
      """WITH tk AS (SELECT UNNEST(string_split(text, ' ')) AS token
        |  FROM documents),
        |f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tk GROUP BY 1),
        |s1 AS (SELECT *, CAST(FLOOR(SQRT(CAST(tf AS DOUBLE)))
        |    AS BIGINT) AS r0 FROM f),
        |w1 AS (SELECT token, tf,
        |    CASE WHEN (r0 + 1) * (r0 + 1) <= tf THEN r0 + 1
        |         WHEN r0 * r0 <= tf THEN r0
        |         ELSE r0 - 1 END AS r FROM s1),
        |s2 AS (SELECT *, CAST(FLOOR(SQRT(CAST(r AS DOUBLE)))
        |    AS BIGINT) AS q0 FROM w1),
        |w2 AS (SELECT token, tf,
        |    r * (CASE WHEN (q0 + 1) * (q0 + 1) <= r THEN q0 + 1
        |              WHEN q0 * q0 <= r THEN q0
        |              ELSE q0 - 1 END) AS w75 FROM s2),
        |t AS (SELECT CAST(SUM(w75) AS BIGINT) AS t75 FROM w2)
        |SELECT token, tf, w75,
        |  (w75 * 1000000) // t75 AS share_ppm,
        |  CAST((SUM(w75) OVER (ORDER BY tf DESC, token
        |     ROWS UNBOUNDED PRECEDING) * 1000000) // t75 AS BIGINT)
        |    AS cum_ppm
        |FROM w2, t""".stripMargin,

    "zipf_fit" ->
      """WITH t AS (SELECT UNNEST(string_split(text, ' ')) AS token
        |  FROM documents),
        |f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM t GROUP BY 1),
        |p AS (SELECT
        |    CAST(length(format('{:b}', ROW_NUMBER() OVER
        |      (ORDER BY tf DESC, token))) - 1 AS BIGINT) AS lx,
        |    CAST(length(format('{:b}', tf)) - 1 AS BIGINT) AS ly
        |  FROM f),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(lx) AS BIGINT) AS sx,
        |    CAST(SUM(ly) AS BIGINT) AS sy,
        |    CAST(SUM(lx * ly) AS BIGINT) AS sxy,
        |    CAST(SUM(lx * lx) AS BIGINT) AS sxx,
        |    CAST(SUM(ly * ly) AS BIGINT) AS syy FROM p),
        |d AS (SELECT *, (n * sxy - sx * sy) * 1000000 AS sa,
        |    n * sxx - sx * sx AS sb FROM g),
        |s AS (SELECT *, CASE WHEN sb > 0
        |    THEN (sa - sa % sb) // sb ELSE 0 END AS slope_e6 FROM d),
        |i AS (SELECT *, sy * 1000000 - slope_e6 * sx AS ia FROM s)
        |SELECT n AS n_types, slope_e6,
        |  (ia - ia % n) // n AS intercept_e6,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN CAST(ROUND((n * sxy - sx * sy) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |      * 1000000) AS BIGINT)
        |    ELSE 0 END AS r_e6
        |FROM i""".stripMargin,

    // sensitive attribute = dominant PII class (ssn > email > phone >
    // none), same QI grid as k_anonymity
    "l_diversity" ->
      s"""WITH t AS (SELECT lang, source,
         |    CASE WHEN len(string_split(text, ' ')) > 0
         |      THEN CAST(length(format('{:b}',
         |        len(string_split(text, ' ')))) AS BIGINT)
         |      ELSE 0 END AS len_bucket,
         |    CASE WHEN len(regexp_extract_all(text,
         |        '${TextAnalysis.SsnRe}')) > 0 THEN 'ssn'
         |      WHEN len(regexp_extract_all(text,
         |        '${TextAnalysis.EmailRe}')) > 0 THEN 'email'
         |      WHEN len(regexp_extract_all(text,
         |        '${TextAnalysis.PhoneRe}')) > 0 THEN 'phone'
         |      ELSE 'none' END AS pii_class
         |  FROM documents),
         |c AS (SELECT lang, source, len_bucket, pii_class,
         |    CAST(COUNT(*) AS BIGINT) AS n_class
         |  FROM t GROUP BY 1, 2, 3, 4)
         |SELECT lang, source, len_bucket,
         |  CAST(SUM(n_class) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
         |  (CAST(MAX(n_class) AS BIGINT) * 1000000) //
         |    CAST(SUM(n_class) AS BIGINT) AS top_class_ppm,
         |  CAST(COUNT(*) < ${TextAnalysis.LDivThreshold} AS VARCHAR)
         |    AS at_risk
         |FROM c GROUP BY 1, 2, 3""".stripMargin,

    // t-closeness: exact integer total-variation distance per cell,
    // absent classes folded into the closed-form (N - Σ g_c)·n tail;
    // sensitive attribute = lang (see the operator scaladoc)
    "t_closeness" ->
      s"""WITH t AS (SELECT source,
         |    CASE WHEN len(string_split(text, ' ')) > 0
         |      THEN CAST(length(format('{:b}',
         |        len(string_split(text, ' ')))) AS BIGINT)
         |      ELSE 0 END AS len_bucket,
         |    lang
         |  FROM documents),
         |c AS (SELECT source, len_bucket, lang,
         |    CAST(COUNT(*) AS BIGINT) AS n_class
         |  FROM t GROUP BY 1, 2, 3),
         |g AS (SELECT lang, CAST(SUM(n_class) AS BIGINT) AS g_class
         |  FROM c GROUP BY 1),
         |tot AS (SELECT CAST(SUM(g_class) AS BIGINT) AS n_tot FROM g),
         |w AS (SELECT c.source, c.len_bucket, c.n_class, g.g_class,
         |    CAST(SUM(n_class) OVER (PARTITION BY c.source,
         |      c.len_bucket) AS BIGINT) AS n_docs
         |  FROM c JOIN g USING (lang)),
         |a AS (SELECT source, len_bucket,
         |    CAST(MAX(n_docs) AS BIGINT) AS n_docs,
         |    CAST(SUM(ABS(n_class * n_tot - g_class * n_docs)) AS BIGINT)
         |      AS d_present,
         |    CAST(SUM(g_class) AS BIGINT) AS present_g,
         |    CAST(MAX(n_tot) AS BIGINT) AS n_tot
         |  FROM w, tot GROUP BY 1, 2)
         |SELECT source, len_bucket, n_docs,
         |  CAST((d_present + (n_tot - present_g) * n_docs) * 1000000
         |    // (2 * n_docs * n_tot) AS BIGINT) AS tvd_ppm,
         |  CAST((d_present + (n_tot - present_g) * n_docs) * 1000000
         |    // (2 * n_docs * n_tot) >
         |      ${TextAnalysis.TCloseThresholdPpm} AS VARCHAR) AS at_risk
         |FROM a""".stripMargin,

    "corpus_diversity" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS tk
        |  FROM documents),
        |u AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_unigrams,
        |    CAST(COUNT(DISTINCT g) AS BIGINT) AS d_unigrams
        |  FROM (SELECT source, unnest(tk) AS g FROM t) GROUP BY 1),
        |b AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(COUNT(DISTINCT g) AS BIGINT) AS d_bigrams
        |  FROM (SELECT source,
        |      unnest(list_transform(generate_series(1, len(tk) - 1),
        |        i -> tk[i] || ' ' || tk[i + 1])) AS g
        |    FROM t WHERE len(tk) >= 2) GROUP BY 1)
        |SELECT u.source, n_unigrams, d_unigrams,
        |  (d_unigrams * 1000000) // n_unigrams AS distinct1_ppm,
        |  COALESCE(n_bigrams, 0) AS n_bigrams,
        |  COALESCE(d_bigrams, 0) AS d_bigrams,
        |  (COALESCE(d_bigrams, 0) * 1000000) //
        |    GREATEST(COALESCE(n_bigrams, 0), 1) AS distinct2_ppm
        |FROM u LEFT JOIN b ON u.source = b.source""".stripMargin,

    "split_audit" ->
      s"""WITH $GopherCtes,
         |sd AS (SELECT doc_id, lang,
         |    CASE WHEN ${sqlPhash("'split:' || doc_id")} % 100 < 98
         |      THEN 'train'
         |      WHEN ${sqlPhash("'split:' || doc_id")} % 100 < 99
         |      THEN 'val' ELSE 'test' END AS split
         |  FROM documents),
         |a AS (SELECT sd.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(gq.n_tokens) AS BIGINT) AS sum_tokens,
         |    CAST(SUM(gq.distinct_milli) AS BIGINT) // COUNT(*)
         |      AS mean_distinct_milli,
         |    (CAST(SUM(CASE WHEN gq.keep_b THEN 1 ELSE 0 END) AS BIGINT)
         |      * 1000000) // COUNT(*) AS keep_ppm
         |  FROM sd JOIN gq ON sd.doc_id = gq.doc_id GROUP BY 1),
         |lc AS (SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM sd GROUP BY 1, 2),
         |lt AS (SELECT split, lang AS top_lang,
         |    (c * 1000000) //
         |      CAST(SUM(c) OVER (PARTITION BY split) AS BIGINT)
         |      AS top_lang_ppm,
         |    ROW_NUMBER() OVER (PARTITION BY split
         |      ORDER BY c DESC, lang DESC) AS rn
         |  FROM lc)
         |SELECT a.split, n_docs, sum_tokens, mean_distinct_milli, keep_ppm,
         |  top_lang, top_lang_ppm
         |FROM a JOIN lt ON a.split = lt.split AND lt.rn = 1""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS text_hash,
        |       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    // FK coefficients in milli-units with the same truncating div and
    // the same three regex counts as the Spark projection
    "readability_score" ->
      """WITH r AS (SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(text, '[.!?]')) + 1 AS BIGINT)
        |      AS s,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS syl
        |  FROM documents),
        |g AS (SELECT lang,
        |    390 * w // s + 11800 * syl // w - 15590 AS grade_milli
        |  FROM r WHERE w > 0)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(grade_milli) // COUNT(*) AS BIGINT)
        |    AS mean_grade_milli,
        |  CAST(MIN(grade_milli) AS BIGINT) AS min_grade_milli,
        |  CAST(MAX(grade_milli) AS BIGINT) AS max_grade_milli
        |FROM g GROUP BY 1""".stripMargin,

    "text_stats" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(length(text) AS BIGINT) AS chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS stops,
        |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS puncts
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(toks) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(stops) AS BIGINT) AS sum_stopwords,
        |  CAST(SUM(puncts) AS BIGINT) AS sum_punct
        |FROM d GROUP BY lang""".stripMargin,

    "lang_id" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text,' '),
        |      t -> t IN ('the','a'))) AS BIGINT) AS c_en,
        |    CAST(len(list_filter(string_split(text,' '),
        |      t -> t IN ('scan','merge','hash'))) AS BIGINT) AS c_de,
        |    CAST(len(list_filter(string_split(text,' '),
        |      t -> t IN ('data','query','row'))) AS BIGINT) AS c_es
        |  FROM documents),
        |p AS (SELECT lang,
        |  CASE WHEN c_en >= c_de AND c_en >= c_es THEN 'en'
        |       WHEN c_de >= c_es THEN 'de' ELSE 'es' END AS predicted
        |  FROM d)
        |SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
        |FROM p GROUP BY 1, 2""".stripMargin,

    "token_count" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
        |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(ws) AS BIGINT) AS sum_ws_tokens,
        |  CAST(SUM(bpe) AS BIGINT) AS sum_bpe_tokens
        |FROM d GROUP BY source""".stripMargin,

    "doc_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |      ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS fp,
        |       CAST(length(norm) AS BIGINT) AS n_chars_norm
        |FROM n""".stripMargin,

    "multimodal_features" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  md5(text) AS checksum,
        |  CAST(n_chars % 640 AS BIGINT) AS width,
        |  CAST((doc_id * 37) % 480 AS BIGINT) AS height,
        |  CAST(strlen(text) % 256 AS BIGINT) AS fake_brightness
        |FROM documents""".stripMargin,

    "quality_filter" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS stops,
        |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS puncts
        |  FROM documents)
        |SELECT doc_id, chars, tokens,
        |  (stops * 1000) // tokens AS stop_milli,
        |  (puncts * 1000) // greatest(chars, 1) AS punct_milli,
        |  CAST(chars BETWEEN 50 AND 2000
        |       AND tokens >= 10
        |       AND (puncts * 1000) // greatest(chars, 1) <= 100 AS VARCHAR) AS keep
        |FROM d""".stripMargin,

    "token_topk" ->
      """WITH t AS (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
        |SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        |FROM t GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "pii_scrub" ->
      s"""WITH r AS (SELECT doc_id, text,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${graft.operators.TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
         |    '${graft.operators.TextAnalysis.SsnRe}', '<SSN>', 'g'),
         |    '${graft.operators.TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS red
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(text, '${graft.operators.TextAnalysis.SsnRe}')) AS BIGINT) AS n_ssns,
         |  md5(red) AS redacted_md5
         |FROM r""".stripMargin,

    "multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(n_chars % 640 AS BIGINT) AS width,
        |    CAST((doc_id * 37) % 480 AS BIGINT) AS height
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CASE WHEN greatest(width, height) <= 224 THEN width
        |       ELSE (width * 224) // greatest(width, height) END AS out_width,
        |  CASE WHEN greatest(width, height) <= 224 THEN height
        |       ELSE (height * 224) // greatest(width, height) END AS out_height
        |FROM m""".stripMargin,

    "embed_quantize" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(ROUND(GREATEST(LEAST(x, 1.0), -1.0) * 127) AS BIGINT)) AS qv,
        |    CAST(len(list_filter(CAST(embedding AS DOUBLE[]),
        |      x -> x > 1.0 OR x < -1.0)) AS BIGINT) AS n_clipped
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(list_max(qv) AS BIGINT) AS q_max,
        |  n_clipped
        |FROM q""".stripMargin,

    "ivf_assign" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
        |         WHERE vec_id BETWEEN 8 AND 23),
        |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8)
        |SELECT vec_id, centroid_id FROM (
        |  SELECT cand.vec_id, cent.centroid_id,
        |    ROW_NUMBER() OVER (PARTITION BY cand.vec_id
        |      ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
        |  FROM cand, cent) t WHERE rn = 1""".stripMargin,

    // cluster-local ordering by centroid proximity over the ivf_assign
    // relation; e6-rounded similarity (the ann_lsh convention)
    "incontext_order" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
        |         WHERE vec_id BETWEEN 8 AND 23),
        |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
        |assign AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT cand.vec_id, cent.centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
        |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
        |    FROM cand, cent) t WHERE rn = 1),
        |s AS (SELECT a.centroid_id, a.vec_id,
        |    CAST(ROUND(list_cosine_similarity(cand.v, cent.cv) * 1000000)
        |      AS BIGINT) AS sim_e6
        |  FROM assign a
        |  JOIN cand ON a.vec_id = cand.vec_id
        |  JOIN cent ON a.centroid_id = cent.centroid_id)
        |SELECT centroid_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY centroid_id
        |    ORDER BY sim_e6 DESC, vec_id) AS BIGINT) AS position,
        |  vec_id AS doc_id, sim_e6
        |FROM s""".stripMargin,

    "ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
        |         WHERE vec_id BETWEEN 8 AND 23),
        |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
        |assign AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT cand.vec_id, cent.centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
        |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
        |    FROM cand, cent) t WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
        |probes AS (
        |  SELECT q_id, centroid_id FROM (
        |    SELECT q_id, centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY list_cosine_similarity(qv, cv) DESC, centroid_id) AS rn
        |    FROM q, cent) t WHERE rn <= 4),
        |probed AS (SELECT p.q_id, a.vec_id FROM probes p JOIN assign a USING (centroid_id))
        |SELECT q_id, vec_id AS cand_id, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT pr.q_id, pr.vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY pr.q_id
        |      ORDER BY list_cosine_similarity(q.qv, c.v) DESC, pr.vec_id) AS rn
        |  FROM probed pr JOIN q ON pr.q_id = q.q_id
        |  JOIN cand c ON pr.vec_id = c.vec_id) t WHERE rn <= 10""".stripMargin,

    // one-row index datasheet: populations, list geometry, storage
    // ladder; assign CTE is the ivf_assign twin verbatim
    "ann_index_card" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
         |         WHERE vec_id BETWEEN 8 AND 23),
         |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
         |assign AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT cand.vec_id, cent.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
         |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
         |    FROM cand, cent) t WHERE rn = 1),
         |ls AS (SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS sz
         |  FROM assign GROUP BY 1),
         |l AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lists,
         |    CAST(MIN(sz) AS BIGINT) AS min_list,
         |    CAST(MAX(sz) AS BIGINT) AS max_list,
         |    CAST(SUM(sz) AS BIGINT) AS n_vectors FROM ls),
         |d AS (SELECT CAST(MAX(len(embedding)) AS BIGINT) AS dim
         |  FROM embeddings),
         |q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries
         |  FROM embeddings WHERE vec_id < 8)
         |SELECT n_vectors, n_queries, dim, n_lists, min_list, max_list,
         |  n_vectors // n_lists AS mean_list,
         |  (max_list * 1000000) // greatest(n_vectors // n_lists, 1)
         |    AS skew_ppm,
         |  dim * 4 AS f32_bytes, dim AS int8_bytes,
         |  CAST(${Similarity.PqM} AS BIGINT) AS pq_bytes,
         |  (dim * 4000000) // ${Similarity.PqM} AS pq_ratio_ppm
         |FROM l, d, q""".stripMargin,

    // incremental maintenance: 1-in-8 hash "delta" vectors assigned to
    // the existing lists; per-list growth + centroid-staleness drift
    "ivf_incremental" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
         |         WHERE vec_id BETWEEN 8 AND 23),
         |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
         |assign AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT cand.vec_id, cent.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
         |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
         |    FROM cand, cent) t WHERE rn = 1),
         |s AS (SELECT a.centroid_id,
         |    CAST(ROUND(list_cosine_similarity(c.v, ct.cv) * 1000000)
         |      AS BIGINT) AS sim_e6,
         |    (${sqlPhash("'delta:' || a.vec_id")} %
         |      ${Similarity.DeltaMod} = 0) AS is_delta
         |  FROM assign a JOIN cand c ON a.vec_id = c.vec_id
         |    JOIN cent ct USING (centroid_id)),
         |g AS (SELECT centroid_id,
         |    CAST(SUM(CASE WHEN NOT is_delta THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_base,
         |    CAST(SUM(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_new,
         |    CAST(COALESCE(SUM(CASE WHEN NOT is_delta THEN sim_e6 END), 0)
         |      AS BIGINT) AS sb,
         |    CAST(COALESCE(SUM(CASE WHEN is_delta THEN sim_e6 END), 0)
         |      AS BIGINT) AS sn
         |  FROM s GROUP BY 1)
         |SELECT centroid_id, n_base, n_new,
         |  sb // greatest(n_base, 1) AS mean_sim_base_e6,
         |  sn // greatest(n_new, 1) AS mean_sim_new_e6,
         |  (n_new * 1000000) // greatest(n_base, 1) AS growth_ppm,
         |  CAST((n_new * 1000000) // greatest(n_base, 1) >
         |      ${Similarity.RebalancePpm}
         |    OR sn // greatest(n_new, 1) <
         |      sb // greatest(n_base, 1) - ${Similarity.SimDriftE6}
         |    AS VARCHAR) AS rebalance
         |FROM g""".stripMargin,

    // list-balance report over the ivf_assign twin; integer ppm/milli
    "ivf_balance" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
         |         WHERE vec_id BETWEEN 8 AND 23),
         |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
         |assign AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT cand.vec_id, cent.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
         |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
         |    FROM cand, cent) t WHERE rn = 1),
         |c AS (SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_vecs
         |  FROM assign GROUP BY 1),
         |tt AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total,
         |  CAST(COUNT(*) AS BIGINT) AS n_lists FROM c)
         |SELECT centroid_id, n_vecs,
         |  CAST(n_vecs * 1000000 // n_total AS BIGINT) AS share_ppm,
         |  CAST(n_vecs * n_lists * 1000 // n_total AS BIGINT) AS load_milli,
         |  CAST(n_vecs * n_lists * 1000 // n_total >
         |    ${Similarity.BalanceOverloadMilli} AS VARCHAR) AS overloaded
         |FROM c, tt""".stripMargin,

    // IVF-blocked kNN graph: within-list pairs only, e6-rounded sim
    // ranks (integer-deterministic), top-KnnK per node
    "knn_graph" ->
      s"""WITH $KnnGraphCtes
         |SELECT src_id, rank, nbr_id, sim_e6 FROM knn""".stripMargin,

    // the probe form: same chain, src side capped — linear at scale
    "knn_graph_probe" ->
      s"""WITH $KnnGraphProbeCtes
         |SELECT src_id, rank, nbr_id, sim_e6 FROM knn""".stripMargin,

    "knn_components" -> knnComponentsSql("kc_knn", KnnGraphCtes),
    "knn_components_probe" ->
      knnComponentsSql("kcp_knn", KnnGraphProbeCtes),

    "hubness_audit" -> hubnessAuditSql(KnnGraphCtes),
    "hubness_audit_probe" -> hubnessAuditSql(KnnGraphProbeCtes),

    // one NN-descent round over the knn_graph twin, seeded with the
    // LSH-bucket graph (a second blocking bridges IVF lists); exact
    // re-score, top-KnnK; is_new marks edges IVF blocking missed
    "nn_descent" -> nnDescentSql("", ""),
    // probe form: both seed blockings src-capped, output capped too
    "nn_descent_probe" -> nnDescentSql(KnnProbePred,
      s" AND r.src_id < ${graft.operators.Similarity.KnnProbeHi}"),

    // recall of the blocked graph and its NN-descent repair against
    // the brute-force all-pairs top-K truth (gate-scale N² by design;
    // staged + source-blocked so the oracle's spill stays bounded)
    "knn_recall" -> KnnRecallTempSql,

    // probe-sampled kNN recall: truth and both arms restricted to the
    // fixed 512-probe prefix — the reduced-truth gate that runs at
    // every amplified tier (the full gate's N² truth cannot)
    "knn_recall_probe" -> {
      import graft.operators.Similarity.{KnnK, KnnProbeHi}
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
         |         WHERE vec_id BETWEEN 8 AND 23),
         |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
         |assign AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT cand.vec_id, cent.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
         |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
         |    FROM cand, cent) t WHERE rn = 1),
         |vv AS (SELECT a.vec_id, a.centroid_id, c.v
         |  FROM assign a JOIN cand c ON a.vec_id = c.vec_id),
         |tp AS (SELECT l.vec_id AS src_id, r.vec_id AS nbr_id,
         |    CAST(ROUND(list_cosine_similarity(l.v, r.v) * 1000000)
         |      AS BIGINT) AS sim_e6
         |  FROM cand l JOIN cand r ON l.vec_id <> r.vec_id
         |  WHERE l.vec_id < $KnnProbeHi),
         |truth AS (SELECT src_id, nbr_id FROM (
         |    SELECT src_id, nbr_id, ROW_NUMBER() OVER (PARTITION BY src_id
         |      ORDER BY sim_e6 DESC, nbr_id) AS rn FROM tp) t
         |  WHERE rn <= $KnnK),
         |lp AS (SELECT l.vec_id AS src_id, r.vec_id AS nbr_id
         |  FROM vv l JOIN vv r
         |    ON l.centroid_id = r.centroid_id AND l.vec_id <> r.vec_id
         |  WHERE l.vec_id < $KnnProbeHi),
         |bk AS (SELECT vec_id, v, $bucketExpr AS bucket FROM cand),
         |bp AS (SELECT l.vec_id AS src_id, r.vec_id AS nbr_id
         |  FROM bk l JOIN bk r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id
         |  WHERE l.vec_id < $KnnProbeHi),
         |up AS (SELECT src_id, nbr_id FROM lp
         |  UNION SELECT src_id, nbr_id FROM bp),
         |sc1 AS (SELECT u.src_id, u.nbr_id,
         |    CAST(ROUND(list_cosine_similarity(l.v, r.v) * 1000000)
         |      AS BIGINT) AS sim_e6
         |  FROM lp u JOIN cand l ON u.src_id = l.vec_id
         |    JOIN cand r ON u.nbr_id = r.vec_id),
         |arm1 AS (SELECT src_id, nbr_id FROM (
         |    SELECT src_id, nbr_id, ROW_NUMBER() OVER (PARTITION BY src_id
         |      ORDER BY sim_e6 DESC, nbr_id) AS rn FROM sc1) t
         |  WHERE rn <= $KnnK),
         |sc2 AS (SELECT u.src_id, u.nbr_id,
         |    CAST(ROUND(list_cosine_similarity(l.v, r.v) * 1000000)
         |      AS BIGINT) AS sim_e6
         |  FROM up u JOIN cand l ON u.src_id = l.vec_id
         |    JOIN cand r ON u.nbr_id = r.vec_id),
         |arm2 AS (SELECT src_id, nbr_id FROM (
         |    SELECT src_id, nbr_id, ROW_NUMBER() OVER (PARTITION BY src_id
         |      ORDER BY sim_e6 DESC, nbr_id) AS rn FROM sc2) t
         |  WHERE rn <= $KnnK),
         |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth)
         |SELECT 'ivf_blocked' AS variant, n_truth,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM arm1 b
         |    JOIN truth t ON b.src_id = t.src_id
         |      AND b.nbr_id = t.nbr_id) AS n_hit,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM arm1 b
         |    JOIN truth t ON b.src_id = t.src_id
         |      AND b.nbr_id = t.nbr_id) * 1000 // n_truth AS recall_milli
         |FROM tt
         |UNION ALL
         |SELECT 'ivf_plus_lsh', n_truth,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM arm2 b
         |    JOIN truth t ON b.src_id = t.src_id
         |      AND b.nbr_id = t.nbr_id),
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM arm2 b
         |    JOIN truth t ON b.src_id = t.src_id
         |      AND b.nbr_id = t.nbr_id) * 1000 // n_truth
         |FROM tt""".stripMargin
    },

    // per-label base-vs-delta mean-vector drift; integer e6 sums and
    // truncating means, one identically-ordered double cosine at the end
    "embed_drift" ->
      s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  WHERE vec_id >= 8),
         |x AS (SELECT label,
         |    (${sqlPhash("'delta:' || vec_id")} %
         |      ${Similarity.DeltaMod} = 0) AS is_delta,
         |    CAST(u.i AS BIGINT) AS dim,
         |    CAST(ROUND(v[u.i + 1] * 1000000) AS BIGINT) AS x_e6
         |  FROM e, UNNEST(generate_series(0, ${Similarity.Dim - 1}))
         |    AS u(i)),
         |d AS (SELECT label, dim,
         |    CAST(COALESCE(SUM(CASE WHEN NOT is_delta THEN x_e6 END), 0)
         |      AS BIGINT) AS sb,
         |    CAST(COALESCE(SUM(CASE WHEN is_delta THEN x_e6 END), 0)
         |      AS BIGINT) AS sd,
         |    CAST(SUM(CASE WHEN NOT is_delta THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nb,
         |    CAST(SUM(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nd
         |  FROM x GROUP BY 1, 2),
         |m AS (SELECT label, sb // greatest(nb, 1) AS mb,
         |    sd // greatest(nd, 1) AS md, nb, nd FROM d),
         |g AS (SELECT label, CAST(SUM(mb * md) AS BIGINT) AS dot,
         |    CAST(SUM(mb * mb) AS BIGINT) AS bb,
         |    CAST(SUM(md * md) AS BIGINT) AS dd,
         |    CAST(MAX(nb) AS BIGINT) AS n_base,
         |    CAST(MAX(nd) AS BIGINT) AS n_delta
         |  FROM m GROUP BY 1)
         |SELECT label, n_base, n_delta,
         |  CASE WHEN bb > 0 AND dd > 0
         |    THEN CAST(ROUND(dot / (sqrt(CAST(bb AS DOUBLE))
         |      * sqrt(CAST(dd AS DOUBLE))) * 1000000) AS BIGINT)
         |    ELSE 0 END AS drift_cos_e6
         |FROM g""".stripMargin,

    // per-IVF-list composition report; assign CTE is the ivf_assign
    // twin verbatim; ties break (count DESC, value DESC) on both sides
    "topic_clusters" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
        |         WHERE vec_id BETWEEN 8 AND 23),
        |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
        |assign AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT cand.vec_id, cent.centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
        |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
        |    FROM cand, cent) t WHERE rn = 1),
        |d AS (SELECT a.centroid_id, doc.doc_id, doc.lang, doc.text
        |  FROM assign a JOIN documents doc ON a.vec_id = doc.doc_id),
        |dagg AS (SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |  FROM d GROUP BY 1),
        |lc AS (SELECT centroid_id, lang, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM d GROUP BY 1, 2),
        |lt AS (SELECT centroid_id, lang AS top_lang, c AS top_lang_n
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY centroid_id
        |    ORDER BY c DESC, lang DESC) AS rn FROM lc) WHERE rn = 1),
        |tok AS (SELECT centroid_id, t.t AS token
        |  FROM d, UNNEST(string_split(text, ' ')) AS t(t)),
        |tc AS (SELECT centroid_id, token, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |tt AS (SELECT centroid_id, token AS top_token, c AS top_token_n
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY centroid_id
        |    ORDER BY c DESC, token DESC) AS rn FROM tc) WHERE rn = 1)
        |SELECT dagg.centroid_id, n_docs, n_langs, top_lang, top_lang_n,
        |  top_token, top_token_n, id_sum
        |FROM dagg JOIN lt USING (centroid_id) JOIN tt USING (centroid_id)""".stripMargin,

    // the ivf_assign twin verbatim + the corpus_sample decision
    // verbatim, reduced per cluster; tolerance from the shared constant
    "sample_coverage" -> {
      val rateCase = graft.operators.TextAnalysis.SampleRateMilli
        .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
      val dflt = graft.operators.TextAnalysis.DefaultRateMilli
      val tol = graft.operators.Similarity.CoverageTolPpm
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
         |         WHERE vec_id BETWEEN 8 AND 23),
         |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
         |assign AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT cand.vec_id, cent.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
         |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
         |    FROM cand, cent) t WHERE rn = 1),
         |d AS (SELECT a.centroid_id, doc.doc_id, doc.lang
         |  FROM assign a JOIN documents doc ON a.vec_id = doc.doc_id),
         |s AS (SELECT centroid_id,
         |    ${sqlPhash("'sample:' || doc_id")} % 1000
         |      < CAST(CASE lang $rateCase ELSE $dflt END AS BIGINT)
         |      AS sampled
         |  FROM d),
         |g AS (SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_corpus,
         |    CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_sample
         |  FROM s GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_corpus) AS BIGINT) AS tc,
         |    CAST(SUM(n_sample) AS BIGINT) AS ts FROM g),
         |x AS (SELECT centroid_id, n_corpus, n_sample,
         |    CAST(n_corpus * 1000000 // tc AS BIGINT) AS corpus_ppm,
         |    CAST(CASE WHEN ts = 0 THEN 0
         |      ELSE n_sample * 1000000 // ts END AS BIGINT) AS sample_ppm
         |  FROM g, t)
         |SELECT centroid_id, n_corpus, n_sample, corpus_ppm, sample_ppm,
         |  abs(sample_ppm - corpus_ppm) AS delta_ppm,
         |  CASE WHEN n_sample = 0 THEN 'MISSED'
         |       WHEN abs(sample_ppm - corpus_ppm) <= $tol THEN 'COVERED'
         |       ELSE 'SKEWED' END AS verdict
         |FROM x""".stripMargin
    },

    "ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id < 8),
         |c AS (SELECT vec_id AS cand_id, v AS cv, bucket FROM b WHERE vec_id >= 8),
         |s AS (SELECT q_id, cand_id, list_cosine_similarity(qv, cv) AS sim,
         |  ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY list_cosine_similarity(qv, cv) DESC, cand_id) AS rn
         |  FROM q JOIN c USING (bucket))
         |SELECT q_id, cand_id, CAST(rn AS BIGINT) AS rank,
         |       CAST(ROUND(sim * 1000000) AS BIGINT) AS sim_e6
         |FROM s WHERE rn <= 10""".stripMargin,

    // multi-probe LSH gate: probe = own bucket (flip -1) + every
    // 1-bit-flip neighbor; truth = the same exact top-K the ann gates
    // calibrate against; per-variant candidate cost + recall
    "lsh_multiprobe" -> {
      import graft.operators.Similarity.{Planes, TopK}
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id < 8),
         |c AS (SELECT vec_id AS cand_id, v AS cv, bucket AS c_bucket
         |  FROM b WHERE vec_id >= 8),
         |pr AS (SELECT q_id, qv,
         |    CASE WHEN f.i = -1 THEN bucket
         |      ELSE xor(bucket, CAST(1 AS BIGINT) << f.i) END AS probe_bucket,
         |    (f.i = -1) AS is_single
         |  FROM q, UNNEST(generate_series(-1, ${Planes - 1})) AS f(i)),
         |j AS (SELECT pr.q_id, c.cand_id, pr.is_single,
         |    list_cosine_similarity(pr.qv, c.cv) AS sim
         |  FROM pr JOIN c ON pr.probe_bucket = c.c_bucket),
         |tp AS (SELECT q_id, cand_id FROM (SELECT q.q_id, c.cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.q_id
         |      ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
         |        c.cand_id) AS rn
         |  FROM q, c) t WHERE rn <= $TopK),
         |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM tp),
         |sing AS (SELECT q_id, cand_id FROM (SELECT q_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY sim DESC, cand_id) AS rn
         |  FROM j WHERE is_single) t WHERE rn <= $TopK),
         |multi AS (SELECT q_id, cand_id FROM (SELECT q_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY sim DESC, cand_id) AS rn
         |  FROM j) t WHERE rn <= $TopK)
         |SELECT 'single' AS variant,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM j WHERE is_single)
         |    AS n_candidates,
         |  n_truth,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sing s JOIN tp
         |     ON s.q_id = tp.q_id AND s.cand_id = tp.cand_id) AS n_hit,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sing s JOIN tp
         |     ON s.q_id = tp.q_id AND s.cand_id = tp.cand_id) * 1000
         |    // n_truth AS recall_milli
         |FROM tt
         |UNION ALL
         |SELECT 'multiprobe',
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM j),
         |  n_truth,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM multi s JOIN tp
         |     ON s.q_id = tp.q_id AND s.cand_id = tp.cand_id),
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM multi s JOIN tp
         |     ON s.q_id = tp.q_id AND s.cand_id = tp.cand_id) * 1000
         |    // n_truth
         |FROM tt""".stripMargin
    },

    // bitext mining census over the same sign-LSH buckets; the struct
    // argmax ties break (sim DESC, id_a DESC, id_b DESC) on both sides
    "cross_lang_pairs" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
         |p AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
         |    CAST(ROUND(list_cosine_similarity(a.v, b2.v) * 1000000)
         |      AS BIGINT) AS sim_e6
         |  FROM b a JOIN b b2 USING (bucket)
         |  WHERE a.vec_id < b2.vec_id),
         |l AS (SELECT p.*, da.lang AS lang_a, db.lang AS lang_b
         |  FROM p JOIN documents da ON p.id_a = da.doc_id
         |  JOIN documents db ON p.id_b = db.doc_id
         |  WHERE da.lang <> db.lang),
         |c AS (SELECT LEAST(lang_a, lang_b) AS lang_lo,
         |    GREATEST(lang_a, lang_b) AS lang_hi, sim_e6, id_a, id_b
         |  FROM l),
         |g AS (SELECT lang_lo, lang_hi,
         |    CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |    CAST(SUM(sim_e6) // COUNT(*) AS BIGINT) AS mean_sim_e6,
         |    CAST(SUM(CASE WHEN sim_e6 >= ${Similarity.BitextTauE6}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_bitext
         |  FROM c GROUP BY 1, 2),
         |t AS (SELECT lang_lo, lang_hi, sim_e6 AS max_sim_e6,
         |    id_a AS best_a, id_b AS best_b
         |  FROM (SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY lang_lo, lang_hi
         |      ORDER BY sim_e6 DESC, id_a DESC, id_b DESC) AS rn
         |    FROM c) WHERE rn = 1)
         |SELECT g.lang_lo, g.lang_hi, n_candidates, mean_sim_e6,
         |  max_sim_e6, best_a, best_b, n_bitext,
         |  CASE WHEN n_bitext > 0 THEN 'BITEXT' ELSE 'NONE' END
         |    AS verdict
         |FROM g JOIN t USING (lang_lo, lang_hi)""".stripMargin,

    "dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
         |p AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
         |  CAST(ROUND(list_cosine_similarity(a.v, b2.v) * 1000000) AS BIGINT) AS sim_e6
         |  FROM b a JOIN b b2 USING (bucket) WHERE a.vec_id < b2.vec_id)
         |SELECT id_a, id_b, sim_e6 FROM p WHERE sim_e6 >= 950000""".stripMargin,

    // heldout lane = the SAME stable hash split split_assign uses
    // (val+test = buckets 98/99); candidates from the SAME sign-LSH
    // buckets as dedup_embedding; threshold from ContamTauE6
    "semantic_contamination" -> {
      val tau = Similarity.ContamTauE6
      val dim = Similarity.Dim
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    CAST(label AS BIGINT) AS label,
         |    ${sqlPhash("'split:' || vec_id")} % 100 >= 98 AS heldout
         |  FROM embeddings),
         |b AS (SELECT vec_id, v, label, heldout, $bucketExpr AS bucket,
         |    list_transform(v, x -> CAST(ROUND(x * 1000000) AS BIGINT))
         |      AS v6
         |  FROM e),
         |bn AS (SELECT *, CAST(list_sum(list_transform(v6, x -> x * x))
         |    AS BIGINT) AS n2 FROM b),
         |ev AS (SELECT bucket, vec_id AS e_id, v6 AS ev6, n2 AS en2,
         |    label FROM bn WHERE heldout),
         |tr AS (SELECT bucket, vec_id AS t_id, v6 AS tv6, n2 AS tn2
         |  FROM bn WHERE NOT heldout),
         |c AS (SELECT ev.e_id, ev.label,
         |    CASE WHEN tr.t_id IS NULL THEN NULL
         |      ELSE CAST(ROUND(
         |        CAST(list_sum(list_transform(generate_series(1, $dim),
         |          i -> ev6[i] * tv6[i])) AS DOUBLE)
         |        / (SQRT(CAST(en2 AS DOUBLE)) * SQRT(CAST(tn2 AS DOUBLE)))
         |        * 1000000) AS BIGINT) END AS sim_e6,
         |    CASE WHEN tr.t_id IS NULL THEN 0 ELSE 1 END AS cand
         |  FROM ev LEFT JOIN tr USING (bucket)),
         |m AS (SELECT e_id, label, MAX(sim_e6) AS best_e6,
         |    CAST(SUM(cand) AS BIGINT) AS n_cands FROM c GROUP BY 1, 2)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_heldout,
         |  CAST(SUM(CASE WHEN n_cands > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_matched,
         |  CAST(SUM(CASE WHEN best_e6 >= $tau THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_leaked,
         |  MAX(best_e6) AS max_sim_e6,
         |  CASE WHEN SUM(CASE WHEN best_e6 >= $tau THEN 1 ELSE 0 END) > 0
         |    THEN 'LEAKED' ELSE 'CLEAN' END AS verdict
         |FROM m GROUP BY 1""".stripMargin
    },

    // the JVM PPM codec's oracle: rebuild the identical payload bytes,
    // parse them byte-level in SQL, compare dims + channel means
    "multimodal_decode" ->
      s"""WITH $PpmCtes
         |SELECT doc_id, byte_len, w AS width, h AS height, maxval,
         |  CAST(list_sum([b[CAST(3*p+1 AS INT)] for p in range(0, w*h)])
         |       // (w*h) AS BIGINT) AS mean_r,
         |  CAST(list_sum([b[CAST(3*p+2 AS INT)] for p in range(0, w*h)])
         |       // (w*h) AS BIGINT) AS mean_g,
         |  CAST(list_sum([b[CAST(3*p+3 AS INT)] for p in range(0, w*h)])
         |       // (w*h) AS BIGINT) AS mean_b
         |FROM ibytes""".stripMargin,

    // the native-expression decoder's oracle — same parse, plus pixel
    // count and the hex-text md5 (DuckDB md5 is VARCHAR-only, so both
    // engines hash the hex string)
    "image_decode" ->
      s"""WITH $PpmCtes
         |SELECT doc_id, byte_len, w AS width, h AS height, maxval,
         |  w * h AS n_pixels,
         |  CAST(list_sum([b[CAST(3*p+1 AS INT)] for p in range(0, w*h)])
         |       // (w*h) AS BIGINT) AS mean_r,
         |  CAST(list_sum([b[CAST(3*p+2 AS INT)] for p in range(0, w*h)])
         |       // (w*h) AS BIGINT) AS mean_g,
         |  CAST(list_sum([b[CAST(3*p+3 AS INT)] for p in range(0, w*h)])
         |       // (w*h) AS BIGINT) AS mean_b,
         |  md5(hs) AS checksum
         |FROM ibytes""".stripMargin,

    // banded-hamming aHash near-dup twin: same band buckets, same
    // minhash star-cap, full 64-bit hamming at <= HammingTau
    "image_dedup" -> {
      import graft.operators.Multimodal.{HashBands, HammingTau}
      val ham = (1 to HashBands).map(i =>
        s"bit_count(xor(fa.bands[$i], fb.bands[$i]))").mkString(" + ")
      s"""WITH $PpmCtes,
         |$PpmAHashCtes,
         |ibanded AS (SELECT doc_id, bb AS band,
         |    bands[CAST(bb + 1 AS INT)] AS sig
         |  FROM ifp, UNNEST(range(0, $HashBands)) AS t(bb)),
         |ibn AS (SELECT band, sig, COUNT(*) AS cnt, MIN(doc_id) AS keeper
         |  FROM ibanded GROUP BY 1, 2 HAVING COUNT(*) > 1),
         |icand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM ibn JOIN ibanded a USING (band, sig)
         |           JOIN ibanded b USING (band, sig)
         |  WHERE ibn.cnt <= ${Dedup.MaxQuadraticBucket}
         |    AND a.doc_id < b.doc_id
         |  UNION
         |  SELECT ibn.keeper, b.doc_id
         |  FROM ibn JOIN ibanded b USING (band, sig)
         |  WHERE ibn.cnt > ${Dedup.MaxQuadraticBucket}
         |    AND b.doc_id <> ibn.keeper),
         |iham AS (SELECT c.doc_a, c.doc_b,
         |    CAST($ham AS BIGINT) AS hamming
         |  FROM icand c JOIN ifp fa ON fa.doc_id = c.doc_a
         |               JOIN ifp fb ON fb.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, hamming FROM iham
         |WHERE hamming <= $HammingTau""".stripMargin
    },

    "multimodal_frames" ->
      """WITH m AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS len,
        |    CAST(n_chars % 640 AS BIGINT) AS width,
        |    CAST((doc_id * 37) % 480 AS BIGINT) AS height
        |  FROM documents),
        |x AS (SELECT doc_id, len, width, height,
        |    UNNEST(range(0, (len + 99) // 100)) AS idx FROM m),
        |f AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY idx) AS rn
        |      FROM x WHERE idx % 3 = 0)
        |SELECT doc_id, CAST(idx AS BIGINT) AS frame_idx,
        |  CAST(least(100, len - idx * 100) AS BIGINT) AS frame_len,
        |  width, height
        |FROM f WHERE rn <= 8""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $MinhashCtes
         |SELECT doc_a, doc_b, j_milli,
         |       CAST(j_milli >= ${Dedup.JaccardMilli} AS VARCHAR) AS is_dup
         |FROM jac""".stripMargin,

    // asymmetric containment over the same pairs/it CTEs; thresholds
    // from the shared Dedup constants
    "ngram_containment" ->
      s"""WITH $MinhashCtes,
         |ct AS (SELECT p.doc_a, p.doc_b,
         |    (COALESCE(it.c, 0) * 1000)
         |      // (p.na + p.nb - COALESCE(it.c, 0)) AS j_milli,
         |    (COALESCE(it.c, 0) * 1000) // LEAST(p.na, p.nb)
         |      AS cont_milli
         |  FROM pairs p
         |  LEFT JOIN it ON p.doc_a = it.doc_a AND p.doc_b = it.doc_b)
         |SELECT doc_a, doc_b, CAST(j_milli AS BIGINT) AS j_milli,
         |  CAST(cont_milli AS BIGINT) AS cont_milli,
         |  CASE WHEN j_milli >= ${Dedup.JaccardMilli} THEN 'NEAR_DUP'
         |       WHEN cont_milli >= ${Dedup.ContainMilli} THEN 'CONTAINED'
         |       ELSE 'DISTINCT' END AS relation
         |FROM ct""".stripMargin,

    "dedup_minhash" ->
      s"""WITH $MinhashCtes
         |SELECT doc_a AS keeper_doc_id, doc_b AS dup_doc_id, j_milli
         |FROM jac WHERE j_milli >= ${Dedup.JaccardMilli}""".stripMargin,

    "dedup_editdist" -> {
      val p = Dedup.EditPrefixChars
      s"""WITH $MinhashCtes,
         |ed AS (SELECT jac.j_milli,
         |    CAST(levenshtein(substr(da.text, 1, $p),
         |      substr(db.text, 1, $p)) AS BIGINT) AS d,
         |    CAST(GREATEST(length(substr(da.text, 1, $p)),
         |      length(substr(db.text, 1, $p))) AS BIGINT) AS m
         |  FROM jac
         |  JOIN documents da ON jac.doc_a = da.doc_id
         |  JOIN documents db ON jac.doc_b = db.doc_id),
         |r AS (SELECT j_milli, (m - d) * 1000000 // m AS ratio_ppm
         |  FROM ed WHERE m > 0)
         |SELECT CAST(j_milli // 100 * 100 AS BIGINT) AS j_bucket_milli,
         |  CAST(ratio_ppm // 100000 * 100000 AS BIGINT)
         |    AS edit_bucket_ppm,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(MIN(ratio_ppm) AS BIGINT) AS min_ratio_ppm,
         |  CAST(MAX(ratio_ppm) AS BIGINT) AS max_ratio_ppm
         |FROM r GROUP BY 1, 2""".stripMargin
    },

    "dedup_apply" ->
      s"""WITH $MinhashCtes
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM jac
         |  WHERE jac.j_milli >= ${Dedup.JaccardMilli}
         |    AND jac.doc_b = d.doc_id)""".stripMargin,

    "dedup_incremental" -> {
      val mod = Dedup.IncrementalBatchMod
      val cap = Dedup.MaxQuadraticBucket
      s"""WITH $ShingleCtes,
         |csigs AS (SELECT doc_id, $mins, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM sh WHERE doc_id % $mod <> 0 GROUP BY doc_id),
         |bsigs AS (SELECT doc_id, $mins, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM sh WHERE doc_id % $mod = 0 GROUP BY doc_id),
         |cban AS (SELECT doc_id, n, b.j AS band, CASE b.j $bandSig END AS sig
         |  FROM csigs, UNNEST(generate_series(0, ${Dedup.Bands - 1})) AS b(j)),
         |bban AS (SELECT doc_id, n, b.j AS band, CASE b.j $bandSig END AS sig
         |  FROM bsigs, UNNEST(generate_series(0, ${Dedup.Bands - 1})) AS b(j)),
         |cb AS (SELECT band, sig, COUNT(*) AS cnt, MIN(doc_id) AS keeper
         |  FROM cban GROUP BY 1, 2),
         |pairs AS (
         |  SELECT b.doc_id AS batch_doc_id, b.n AS nb,
         |         c.doc_id AS corpus_doc_id, c.n AS nc
         |  FROM bban b JOIN cb USING (band, sig) JOIN cban c USING (band, sig)
         |  WHERE cb.cnt <= $cap
         |  UNION
         |  SELECT b.doc_id, b.n, k.doc_id, k.n
         |  FROM bban b JOIN cb USING (band, sig)
         |  JOIN cban k ON k.band = cb.band AND k.sig = cb.sig
         |    AND k.doc_id = cb.keeper
         |  WHERE cb.cnt > $cap),
         |it AS (SELECT p.batch_doc_id, p.corpus_doc_id, COUNT(*) AS c
         |  FROM pairs p
         |  JOIN sh s1 ON s1.doc_id = p.batch_doc_id
         |  JOIN sh s2 ON s2.doc_id = p.corpus_doc_id AND s2.h = s1.h
         |  GROUP BY 1, 2),
         |j AS (SELECT p.batch_doc_id, p.corpus_doc_id,
         |    (COALESCE(it.c, 0) * 1000) //
         |      (p.nb + p.nc - COALESCE(it.c, 0)) AS j_milli
         |  FROM pairs p
         |  LEFT JOIN it ON p.batch_doc_id = it.batch_doc_id
         |    AND p.corpus_doc_id = it.corpus_doc_id)
         |SELECT batch_doc_id, corpus_doc_id, j_milli,
         |       CAST(j_milli >= ${Dedup.JaccardMilli} AS VARCHAR) AS is_dup
         |FROM j""".stripMargin
    },

    "ivf_train" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
        |         WHERE vec_id BETWEEN 8 AND 23),
        |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
        |assign AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT cand.vec_id, cent.centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
        |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
        |    FROM cand, cent) t WHERE rn = 1),
        |m AS (SELECT a.centroid_id, d.i AS dim,
        |    CAST(ROUND(c.v[d.i+1] * 1000000) AS BIGINT) AS x_e6
        |  FROM assign a JOIN cand c ON c.vec_id = a.vec_id,
        |  UNNEST(generate_series(0, len(c.v) - 1)) AS d(i)),
        |g AS (SELECT centroid_id, dim,
        |    CAST(SUM(x_e6) AS BIGINT) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS n_members
        |  FROM m GROUP BY 1, 2)
        |SELECT centroid_id, CAST(dim AS BIGINT) AS dim,
        |  (s - s % n_members) // n_members AS mean_e6, n_members
        |FROM g""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $SimhashCtes
         |SELECT DISTINCT doc_a, doc_b,
         |       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM spairs
         |WHERE bit_count(xor(sa, sb)) <= ${Dedup.MaxHamming}""".stripMargin,

    "doc_winnow" ->
      s"""WITH ${winnowCtes("documents", "w")}
         |SELECT doc_id, CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fps,
         |       MIN(fp) AS min_fp, MAX(fp) AS max_fp
         |FROM wsel GROUP BY doc_id""".stripMargin,

    // two independent winnow chains (train vs eval shard) joined on the
    // fingerprint — the SQL twin of TextAnalysis.contaminationCheck
    "contamination_check" ->
      s"""WITH ${winnowCtes(
             s"(SELECT * FROM documents WHERE source <> '${TextAnalysis.EvalSource}')", "t")},
         |${winnowCtes(
             s"(SELECT * FROM documents WHERE source = '${TextAnalysis.EvalSource}')", "e")},
         |tf AS (SELECT DISTINCT doc_id, fp FROM tsel),
         |ef AS (SELECT DISTINCT doc_id AS eval_doc_id, fp FROM esel)
         |SELECT tf.doc_id,
         |  CAST(COUNT(DISTINCT ef.eval_doc_id) AS BIGINT) AS n_eval_docs,
         |  CAST(COUNT(DISTINCT tf.fp) AS BIGINT) AS n_shared_fps
         |FROM tf JOIN ef ON tf.fp = ef.fp
         |GROUP BY 1""".stripMargin,

    // exact min-reachable-label connected components via a RECURSIVE
    // CTE — independent of the Spark side's bounded label propagation,
    // so a diameter undershoot there would hash-mismatch here. The
    // RECURSIVE marker is scoped to an inner WITH: a top-level WITH
    // RECURSIVE makes DuckDB reinterpret every UNION-bearing CTE in
    // the list, corrupting the minhash pair chain (356 vs 25 pairs).
    "dup_cluster" ->
      s"""WITH $MinhashCtes, $DupClusterCtes
         |SELECT doc_id, cluster_id,
         |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
         |FROM lab""".stripMargin,

    // soft dedup: every cluster member keeps 1e6/|cluster| ppm of
    // sampling mass (trunc), unique docs keep the full 1e6
    "soft_dedup_weights" ->
      s"""WITH $MinhashCtes, $DupClusterCtes,
         |cs AS (SELECT doc_id,
         |    CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
         |      AS mem
         |  FROM lab),
         |d AS (SELECT dd.source, COALESCE(cs.mem, 1) AS mem
         |  FROM documents dd LEFT JOIN cs ON dd.doc_id = cs.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN mem > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_members,
         |  CAST(SUM(1000000 // mem) AS BIGINT) AS effective_docs_ppm,
         |  CAST(SUM(1000000 // mem) // COUNT(*) AS BIGINT)
         |    AS dedup_ratio_ppm
         |FROM d GROUP BY 1""".stripMargin,

    "cluster_size_hist" ->
      s"""WITH $MinhashCtes, $DupClusterCtes,
         |csz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
         |  FROM lab GROUP BY 1)
         |SELECT n_members, CAST(COUNT(*) AS BIGINT) AS n_clusters
         |FROM csz GROUP BY 1""".stripMargin,

    // representative = argmax (distinct_milli, lowest doc_id) inside
    // each connected component; dropped_* checksums pin the exact
    // decision set cross-engine
    "cluster_representative" ->
      s"""WITH $MinhashCtes, $DupClusterCtes, $GopherCtes,
         |cr AS (SELECT lab.cluster_id, lab.doc_id,
         |    gq.distinct_milli, gq.n_tokens,
         |    ROW_NUMBER() OVER (PARTITION BY lab.cluster_id
         |      ORDER BY gq.distinct_milli DESC, lab.doc_id ASC) AS rk
         |  FROM lab JOIN gq ON lab.doc_id = gq.doc_id)
         |SELECT cluster_id,
         |  CAST(MAX(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT)
         |    AS rep_doc_id,
         |  CAST(MAX(CASE WHEN rk = 1 THEN distinct_milli END) AS BIGINT)
         |    AS rep_distinct_milli,
         |  CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(SUM(doc_id) - MAX(CASE WHEN rk = 1 THEN doc_id END)
         |    AS BIGINT) AS dropped_id_sum,
         |  CAST(SUM(n_tokens) - MAX(CASE WHEN rk = 1 THEN n_tokens END)
         |    AS BIGINT) AS dropped_tokens
         |FROM cr GROUP BY cluster_id""".stripMargin,

    "quality_gopher" ->
      s"""WITH $GopherCtes
         |SELECT doc_id, n_tokens, distinct_milli, mean_len_milli,
         |  top2gram_milli, CAST(keep_b AS VARCHAR) AS keep
         |FROM gq""".stripMargin,

    "source_rollup" ->
      s"""WITH $GopherCtes,
         |r AS (SELECT d.source, gq.*
         |  FROM gq JOIN documents d ON gq.doc_id = d.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN keep_b THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  (CAST(SUM(CASE WHEN keep_b THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // COUNT(*) AS keep_ppm,
         |  CAST(SUM(distinct_milli) AS BIGINT) // COUNT(*)
         |    AS mean_distinct_milli,
         |  CAST(SUM(top2gram_milli) AS BIGINT) // COUNT(*) AS mean_top2_milli
         |FROM r GROUP BY source""".stripMargin,

    "doc_chunk" -> {
      val c = TextAnalysis.ChunkTokens
      val stride = c - TextAnalysis.ChunkOverlap
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk
         |  FROM documents),
         |t AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tokens FROM tk),
         |c AS (SELECT doc_id, tk, n_tokens,
         |    1 + (greatest(n_tokens - $c, 0) + ${stride - 1}) // $stride
         |      AS n_chunks FROM t),
         |x AS (SELECT doc_id, tk, n_tokens, u.i AS chunk_idx
         |  FROM c, UNNEST(generate_series(0, n_chunks - 1)) AS u(i))
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  CAST(chunk_idx * $stride AS BIGINT) AS start_tok,
         |  CAST(least($c, n_tokens - chunk_idx * $stride) AS BIGINT)
         |    AS chunk_len,
         |  ${sqlPhash(s"array_to_string(tk[chunk_idx * $stride + 1 : " +
             s"chunk_idx * $stride + least($c, n_tokens - chunk_idx * $stride)]" +
             ", ' ')")} AS chunk_hash
         |FROM x""".stripMargin
    },

    "pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, lang, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |w AS (SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY lang, source
         |    ORDER BY doc_id) AS BIGINT) AS end_off FROM t)
         |SELECT doc_id, lang, source, n_tokens,
         |  (end_off - n_tokens) // ${TextAnalysis.SeqLen} AS bin,
         |  (end_off - n_tokens) % ${TextAnalysis.SeqLen} AS bin_offset
         |FROM w""".stripMargin,

    // one cumulative-offset window shared by every candidate length;
    // padding = only the last bin per (lang, source) stream is partial
    // serving-side padding plan: 64-multiple length buckets, batch
    // counts under the token budget, per-bucket + global-naive waste
    "padding_plan" -> {
      val m = TextAnalysis.PadMultiple
      val bt = TextAnalysis.MaxBatchTokens
      s"""WITH t AS (SELECT
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
         |  FROM documents WHERE len(string_split(text, ' ')) > 0),
         |b AS (SELECT ((toks + ${m - 1}) // $m) * $m AS bucket_len,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(toks) AS BIGINT) AS total_tokens
         |  FROM t GROUP BY 1),
         |g AS (SELECT CAST(MAX(bucket_len) AS BIGINT) AS max_len,
         |    CAST(SUM(n_docs) AS BIGINT) AS all_docs,
         |    CAST(SUM(total_tokens) AS BIGINT) AS all_tokens FROM b)
         |SELECT bucket_len, n_docs, total_tokens,
         |  CAST((n_docs * bucket_len + ${bt - 1}) // $bt AS BIGINT)
         |    AS n_batches,
         |  CAST(((n_docs * bucket_len - total_tokens) * 1000000)
         |    // (n_docs * bucket_len) AS BIGINT) AS padding_ppm,
         |  CAST(((all_docs * max_len - all_tokens) * 1000000)
         |    // (all_docs * max_len) AS BIGINT) AS naive_ppm
         |FROM b, g""".stripMargin
    },

    "pack_efficiency" -> {
      val lens = TextAnalysis.PackLens.mkString(", ")
      s"""WITH t AS (SELECT doc_id, lang, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |o AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY lang, source
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS end_off FROM t),
         |x AS (SELECT o.*, l.seq_len,
         |    end_off // l.seq_len - (end_off - n_tokens) // l.seq_len
         |      AS crossings
         |  FROM o, UNNEST([${lens}]) AS l(seq_len)),
         |g AS (SELECT lang, source, seq_len,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(MAX(end_off) AS BIGINT) AS group_tokens,
         |    CAST(SUM(crossings) AS BIGINT) AS crossings
         |  FROM x GROUP BY 1, 2, 3),
         |s AS (SELECT seq_len, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
         |    CAST(SUM(group_tokens) AS BIGINT) AS total_tokens,
         |    CAST(SUM((group_tokens + seq_len - 1) // seq_len) AS BIGINT)
         |      AS n_bins,
         |    CAST(SUM(crossings) AS BIGINT) AS n_crossings
         |  FROM g GROUP BY 1)
         |SELECT CAST(seq_len AS BIGINT) AS seq_len, n_docs, total_tokens,
         |  n_bins, n_crossings,
         |  ((n_bins * seq_len - total_tokens) * 1000000)
         |    // (n_bins * seq_len) AS padding_ppm
         |FROM s""".stripMargin
    },

    "dist_drift" ->
      s"""WITH toks AS (SELECT source, t.t AS token
         |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)),
         |tr AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_train
         |  FROM toks WHERE source <> '${TextAnalysis.EvalSource}' GROUP BY 1),
         |ev AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_eval
         |  FROM toks WHERE source = '${TextAnalysis.EvalSource}' GROUP BY 1),
         |al AS (SELECT token, COALESCE(c_train, 0) AS c_train,
         |    COALESCE(c_eval, 0) AS c_eval
         |  FROM tr FULL JOIN ev USING (token)),
         |t AS (SELECT CAST(SUM(c_train) AS BIGINT) AS tot_train,
         |    CAST(SUM(c_eval) AS BIGINT) AS tot_eval FROM al),
         |p AS (SELECT token, (c_train * 1000000) // tot_train AS train_ppm,
         |    (c_eval * 1000000) // tot_eval AS eval_ppm FROM al, t)
         |SELECT token, train_ppm, eval_ppm,
         |  abs(train_ppm - eval_ppm) AS drift_ppm
         |FROM p ORDER BY drift_ppm DESC, token
         |LIMIT ${TextAnalysis.DriftTopK}""".stripMargin,

    "doc_rarity" ->
      """WITH toks AS (SELECT doc_id, t.t
        |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)),
        |freq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY t)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  (CAST(SUM(tf) AS BIGINT) * 1000) // COUNT(*) AS mean_tf_milli,
        |  MIN(tf) AS min_tf
        |FROM toks JOIN freq USING (t)
        |GROUP BY doc_id""".stripMargin,

    "mix_weights" ->
      s"""WITH g AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1, 2),
         |w AS (SELECT *, CAST(LEAST(n_docs, ${TextAnalysis.MixCap}) AS BIGINT)
         |    AS weight FROM g),
         |t AS (SELECT CAST(SUM(weight) AS BIGINT) AS total_w FROM w)
         |SELECT lang, source, n_docs, n_tokens, weight,
         |  (weight * 1000000) // total_w AS share_ppm
         |FROM w, t""".stripMargin,

    // term list and flag budget generated from the SAME
    // BlocklistTerms/BlocklistFlagMax constants the Spark filter uses
    "blocklist_filter" -> {
      val terms = TextAnalysis.BlocklistTerms.map(esc).mkString(", ")
      val fm = TextAnalysis.BlocklistFlagMax
      s"""WITH h AS (SELECT doc_id, source,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      t -> t IN ($terms))) AS BIGINT) AS n_hits
         |  FROM documents),
         |v AS (SELECT source, n_hits,
         |    CASE WHEN n_hits = 0 THEN 'KEEP'
         |         WHEN n_hits <= $fm THEN 'FLAG'
         |         ELSE 'DROP' END AS verdict FROM h)
         |SELECT source, verdict, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_hits) AS BIGINT) AS n_hits
         |FROM v GROUP BY 1, 2""".stripMargin
    },

    // temperature ladder n^{1, 1/2, 1/4} via the SAME ±1-adjusted
    // integer sqrt as the Spark isqrtCol — exact on both engines
    "mix_temperature" ->
      """WITH g AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1, 2),
        |s1 AS (SELECT *, CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)))
        |    AS BIGINT) AS r0 FROM g),
        |w1 AS (SELECT lang, source, n_docs,
        |    CASE WHEN (r0 + 1) * (r0 + 1) <= n_docs THEN r0 + 1
        |         WHEN r0 * r0 <= n_docs THEN r0
        |         ELSE r0 - 1 END AS w50 FROM s1),
        |s2 AS (SELECT *, CAST(FLOOR(SQRT(CAST(w50 AS DOUBLE)))
        |    AS BIGINT) AS q0 FROM w1),
        |w2 AS (SELECT lang, source, n_docs, w50,
        |    CASE WHEN (q0 + 1) * (q0 + 1) <= w50 THEN q0 + 1
        |         WHEN q0 * q0 <= w50 THEN q0
        |         ELSE q0 - 1 END AS w25 FROM s2),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS t100,
        |    CAST(SUM(w50) AS BIGINT) AS t50,
        |    CAST(SUM(w25) AS BIGINT) AS t25 FROM w2)
        |SELECT lang, source, n_docs, w50, w25,
        |  (n_docs * 1000000) // t100 AS share_a100_ppm,
        |  (w50 * 1000000) // t50 AS share_a50_ppm,
        |  (w25 * 1000000) // t25 AS share_a25_ppm
        |FROM w2, t""".stripMargin,

    "span_dedup" -> {
      val sp = TextAnalysis.SpanTokens
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk
         |  FROM documents),
         |sp AS (SELECT doc_id, u.i AS span_idx,
         |    array_to_string(tk[u.i * $sp + 1 : u.i * $sp + $sp], ' ')
         |      AS span_text
         |  FROM tk, UNNEST(generate_series(0, (len(tk) - 1) // $sp)) AS u(i)),
         |h AS (SELECT doc_id, span_idx, span_text,
         |    ${sqlPhash("span_text")} AS sh FROM sp),
         |f AS (SELECT sh, COUNT(DISTINCT doc_id) AS span_docs
         |  FROM h GROUP BY sh),
         |j AS (SELECT h.*, f.span_docs >= 2 AS boiler
         |  FROM h JOIN f USING (sh))
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         |  CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_removed,
         |  CAST(SUM(CASE WHEN NOT boiler
         |    THEN len(string_split(span_text, ' ')) ELSE 0 END) AS BIGINT)
         |    AS kept_tokens,
         |  ${sqlPhash("COALESCE(string_agg(CASE WHEN NOT boiler " +
             "THEN span_text END, ' ' ORDER BY span_idx), '')")} AS kept_hash
         |FROM j GROUP BY doc_id""".stripMargin
    },

    "bpe_merge" ->
      s"""WITH v AS (SELECT t.t AS t, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)
         |  GROUP BY 1)
         |SELECT substr(t, u.i, 2) AS pair, CAST(SUM(tf) AS BIGINT) AS n
         |FROM v, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
         |WHERE len(t) >= 2
         |GROUP BY 1 ORDER BY n DESC, pair
         |LIMIT ${TextAnalysis.BpeTopK}""".stripMargin,

    "token_budget" ->
      s"""WITH $GopherCtes,
         |d AS (SELECT gq.doc_id, gq.n_tokens,
         |    gq.distinct_milli AS quality_milli, doc.lang
         |  FROM gq JOIN documents doc ON gq.doc_id = doc.doc_id),
         |b AS (SELECT lang, quality_milli,
         |    CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
         |  FROM d GROUP BY 1, 2),
         |cb AS (SELECT lang, quality_milli,
         |    CAST(SUM(bucket_tokens) OVER (PARTITION BY lang
         |      ORDER BY quality_milli DESC) AS BIGINT) - bucket_tokens
         |      AS cum_before
         |  FROM b),
         |r AS (SELECT d.doc_id, d.lang, d.quality_milli, d.n_tokens,
         |    cb.cum_before,
         |    CAST(SUM(d.n_tokens) OVER (PARTITION BY d.lang, d.quality_milli
         |      ORDER BY d.doc_id) AS BIGINT) AS run_in
         |  FROM d JOIN cb USING (lang, quality_milli))
         |SELECT doc_id, lang, quality_milli, n_tokens,
         |  CAST(cum_before + run_in <= ${TextAnalysis.TokenBudget} AS VARCHAR)
         |    AS selected
         |FROM r""".stripMargin,

    "epoch_shuffle" ->
      s"""WITH e AS (SELECT doc_id, CAST(u.e AS BIGINT) AS epoch
         |  FROM documents,
         |  UNNEST(generate_series(0, ${TextAnalysis.NumEpochs - 1})) AS u(e)),
         |o AS (SELECT doc_id, epoch,
         |    ${sqlPhash("concat('epoch:', CAST(epoch AS VARCHAR), ':', " +
             "CAST(doc_id AS VARCHAR))")} AS ord
         |  FROM e)
         |SELECT epoch, doc_id, ord % ${TextAnalysis.NumShards} AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch,
         |    ord % ${TextAnalysis.NumShards} ORDER BY ord, doc_id) AS BIGINT)
         |    AS pos
         |FROM o""".stripMargin,

    // curriculum phases from the SAME CurriculumBand constant and the
    // SAME gopher distinct_milli the Spark operator reads; order and
    // shard from the portable hash exactly as epoch_shuffle
    "curriculum_order" ->
      s"""WITH $GopherCtes,
         |c AS (SELECT doc_id,
         |    CAST(distinct_milli AS BIGINT) AS quality_milli,
         |    CAST((999 - LEAST(distinct_milli, 999))
         |      // ${TextAnalysis.CurriculumBand} AS BIGINT) AS phase,
         |    ${sqlPhash("concat('curr:', CAST(doc_id AS VARCHAR))")} AS ord
         |  FROM gq)
         |SELECT doc_id, quality_milli, phase,
         |  ord % ${TextAnalysis.NumShards} AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY phase,
         |    ord % ${TextAnalysis.NumShards} ORDER BY ord, doc_id)
         |    AS BIGINT) AS pos
         |FROM c""".stripMargin,

    "vocab_coverage" ->
      s"""WITH toks AS (SELECT lang, t.t AS t
         |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)),
         |v AS (SELECT t FROM (SELECT t, COUNT(*) AS c FROM toks
         |  GROUP BY t ORDER BY c DESC, t LIMIT ${TextAnalysis.VocabK})),
         |j AS (SELECT toks.lang, v.t IS NOT NULL AS iv
         |  FROM toks LEFT JOIN v ON toks.t = v.t)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN NOT iv THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  (CAST(SUM(CASE WHEN NOT iv THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // COUNT(*) AS oov_ppm
         |FROM j GROUP BY lang""".stripMargin,

    // vocabulary-size sweep: rank the frequency relation once, classify
    // every token against each ladder K; the ladder Ks come from the
    // shared constant
    "vocab_coverage_curve" -> {
      val ladder = TextAnalysis.VocabLadder.mkString(", ")
      s"""WITH toks AS (SELECT lang, t.t AS t
         |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)),
         |f AS (SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM toks GROUP BY 1),
         |r AS (SELECT token,
         |    ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS rn FROM f),
         |ks AS (SELECT CAST(UNNEST([$ladder]) AS BIGINT) AS k_vocab),
         |lad AS (SELECT token, k_vocab FROM r, ks WHERE rn <= k_vocab),
         |nl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens
         |  FROM toks GROUP BY 1),
         |cov AS (SELECT lang, k_vocab, CAST(COUNT(*) AS BIGINT)
         |    AS n_covered
         |  FROM toks JOIN lad ON toks.t = lad.token GROUP BY 1, 2),
         |g AS (SELECT nl.lang, ks.k_vocab, nl.n_tokens FROM nl, ks)
         |SELECT g.lang, g.k_vocab, g.n_tokens,
         |  g.n_tokens - COALESCE(c.n_covered, 0) AS n_oov,
         |  (g.n_tokens - COALESCE(c.n_covered, 0)) * 1000000
         |    // g.n_tokens AS oov_ppm
         |FROM g LEFT JOIN cov c
         |  ON g.lang = c.lang AND g.k_vocab = c.k_vocab""".stripMargin
    },

    // Heaps-law growth curve: first-bucket per token via one
    // min-aggregate, cumulative sums over the 8-row bucket grid
    "vocab_growth" ->
      s"""WITH tk AS (SELECT doc_id, t.t AS token
         |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)),
         |b AS (SELECT ${sqlPhash("'vg:' || doc_id")} %
         |    ${TextAnalysis.GrowthBuckets} AS bucket, token FROM tk),
         |occ AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_occurrences
         |  FROM b GROUP BY 1),
         |f AS (SELECT CAST(MIN(bucket) AS BIGINT) AS first_bucket
         |  FROM b GROUP BY token),
         |nf AS (SELECT first_bucket, CAST(COUNT(*) AS BIGINT) AS n_new_types
         |  FROM f GROUP BY 1),
         |j AS (SELECT occ.bucket, occ.n_occurrences,
         |    CAST(COALESCE(nf.n_new_types, 0) AS BIGINT) AS n_new_types
         |  FROM occ LEFT JOIN nf ON occ.bucket = nf.first_bucket)
         |SELECT bucket, n_occurrences, n_new_types,
         |  CAST(SUM(n_occurrences) OVER w AS BIGINT) AS tokens_cum,
         |  CAST(SUM(n_new_types) OVER w AS BIGINT) AS vocab_cum,
         |  CAST(SUM(n_new_types) OVER w AS BIGINT) * 1000000 //
         |    CAST(SUM(n_occurrences) OVER w AS BIGINT) AS ttr_ppm
         |FROM j WINDOW w AS (ORDER BY bucket
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "ngram_lm_score" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT doc_id, tk[u.i+1] AS w1, tk[u.i+2] AS w2
        |  FROM tk, UNNEST(generate_series(0, len(tk)-2)) AS u(i)),
        |pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        |  FROM bg GROUP BY 1, 2),
        |uc AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        |  FROM bg GROUP BY 1),
        |p AS (SELECT bg.doc_id, (pc.c2 * 1000000) // uc.c1 AS p_ppm
        |  FROM bg JOIN pc USING (w1, w2) JOIN uc USING (w1))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(p_ppm) AS BIGINT) // COUNT(*) AS mean_p_ppm,
        |  MIN(p_ppm) AS min_p_ppm
        |FROM p GROUP BY doc_id""".stripMargin,

    "quality_classify" -> {
      val cases = TextAnalysis.ClassifierWeights
        .map { case (w, v) => s"WHEN ${esc(w)} THEN $v" }.mkString(" ")
      s"""WITH t AS (SELECT doc_id,
         |    CAST(CASE t.t $cases ELSE 0 END AS BIGINT) AS w
         |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t))
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  ${TextAnalysis.ClassifierBias} +
         |    CAST(SUM(w) AS BIGINT) // COUNT(*) AS score_milli,
         |  CAST((${TextAnalysis.ClassifierBias} +
         |    CAST(SUM(w) AS BIGINT) // COUNT(*)) >
         |    ${TextAnalysis.ClassifierThreshold} AS VARCHAR) AS keep
         |FROM t GROUP BY doc_id""".stripMargin
    },

    // agreement matrix of the four quality gates; base relation = gq
    // (all tokenized docs), signals outside their domain default false
    "quality_ensemble" ->
      s"""WITH $GopherCtes, $EnsembleCtes
         |SELECT CAST(keep_gopher AS VARCHAR) AS keep_gopher,
         |  CAST(keep_clf AS VARCHAR) AS keep_clf,
         |  CAST(keep_lm AS VARCHAR) AS keep_lm,
         |  CAST(keep_rare AS VARCHAR) AS keep_rare,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
         |  CAST((CAST(keep_gopher AS INT) + CAST(keep_clf AS INT) +
         |    CAST(keep_lm AS INT) + CAST(keep_rare AS INT)) >= 3 AS VARCHAR)
         |    AS ensemble_keep
         |FROM j GROUP BY keep_gopher, keep_clf, keep_lm, keep_rare""".stripMargin,

    // composed curation funnel: ensemble gate -> representative-keeping
    // near-dup removal -> per-source hash cap; per-source rollup with
    // final id-sum so the end-to-end decision set is pinned
    "curation_pipeline" ->
      s"""WITH $MinhashCtes, $DupClusterCtes, $GopherCtes, $EnsembleCtes,
         |sig AS (SELECT doc_id,
         |    (CAST(keep_gopher AS INT) + CAST(keep_clf AS INT) +
         |     CAST(keep_lm AS INT) + CAST(keep_rare AS INT)) >= 3 AS keep_q
         |  FROM j),
         |crep AS (SELECT cluster_id, doc_id AS rep_doc_id FROM (
         |  SELECT lab.cluster_id, lab.doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lab.cluster_id
         |      ORDER BY gq.distinct_milli DESC, lab.doc_id ASC) AS rk
         |  FROM lab JOIN gq ON lab.doc_id = gq.doc_id) WHERE rk = 1),
         |cl2 AS (SELECT lab.doc_id,
         |    lab.doc_id = crep.rep_doc_id AS is_rep
         |  FROM lab JOIN crep USING (cluster_id)),
         |st AS (SELECT d.doc_id, d.source, gq.n_tokens, sig.keep_q,
         |    (sig.keep_q AND COALESCE(cl2.is_rep, TRUE)) AS keep_dedup
         |  FROM documents d JOIN sig ON d.doc_id = sig.doc_id
         |    JOIN gq ON d.doc_id = gq.doc_id
         |    LEFT JOIN cl2 ON d.doc_id = cl2.doc_id),
         |sv AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY ${sqlPhash("'cap:' || doc_id")}, doc_id) AS rk
         |  FROM st WHERE keep_dedup),
         |fin AS (SELECT source,
         |    CAST(SUM(CASE WHEN rk <= ${Curation.PipelineCap}
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
         |    CAST(COALESCE(SUM(CASE WHEN rk <= ${Curation.PipelineCap}
         |      THEN n_tokens END), 0) AS BIGINT) AS final_tokens,
         |    CAST(COALESCE(SUM(CASE WHEN rk <= ${Curation.PipelineCap}
         |      THEN doc_id END), 0) AS BIGINT) AS final_id_sum
         |  FROM sv GROUP BY 1),
         |sa AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_input,
         |    CAST(SUM(CASE WHEN keep_q THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_quality,
         |    CAST(SUM(CASE WHEN keep_dedup THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dedup
         |  FROM st GROUP BY 1)
         |SELECT sa.source, n_input, n_quality, n_dedup,
         |  COALESCE(n_final, 0) AS n_final,
         |  COALESCE(final_tokens, 0) AS final_tokens,
         |  COALESCE(final_id_sum, 0) AS final_id_sum
         |FROM sa LEFT JOIN fin ON sa.source = fin.source""".stripMargin,

    "dataset_card" ->
      s"""WITH d AS (SELECT lang, source, md5(text) AS th,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
         |    (length(text) BETWEEN 50 AND 2000
         |      AND len(string_split(text, ' ')) >= 10
         |      AND (len(regexp_extract_all(text, '[.,!?;:]')) * 1000)
         |        // greatest(length(text), 1) <= 100) AS keep,
         |    (len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) +
         |     len(regexp_extract_all(text, '${TextAnalysis.PhoneRe}')) +
         |     len(regexp_extract_all(text, '${TextAnalysis.SsnRe}'))) > 0
         |      AS has_pii
         |  FROM documents)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         |  CAST(COUNT(*) - COUNT(DISTINCT th) AS BIGINT) AS n_exact_dups,
         |  CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_quality_fail,
         |  CAST(SUM(CASE WHEN has_pii THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pii_docs,
         |  CAST(SUM(toks) AS BIGINT) // COUNT(*) AS mean_doc_tokens
         |FROM d""".stripMargin,

    "substring_dedup" -> {
      val l = Dedup.SubstrL
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk
         |  FROM documents),
         |kg AS (SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         |    ${sqlPhash(s"array_to_string(tk[u.i+1:u.i+$l], ' ')")} AS h
         |  FROM tk, UNNEST(generate_series(0, len(tk)-$l)) AS u(i)
         |  WHERE len(tk) >= $l),
         |rep AS (SELECT h FROM kg
         |  GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
         |cov AS (SELECT DISTINCT kg.doc_id, p.p
         |  FROM kg JOIN rep USING (h),
         |  UNNEST(generate_series(kg.pos, kg.pos + ${l - 1})) AS p(p)),
         |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_covered
         |  FROM cov GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
         |  COALESCE(cnt.n_covered, 0) AS n_covered,
         |  (COALESCE(cnt.n_covered, 0) * 1000) // len(t.tk) AS covered_milli
         |FROM tk t LEFT JOIN cnt ON t.doc_id = cnt.doc_id""".stripMargin
    },

    "semantic_dedup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
         |  WHERE vec_id BETWEEN 8 AND 23),
         |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
         |assign AS (SELECT vec_id, centroid_id, v FROM (
         |  SELECT cand.vec_id, cent.centroid_id, cand.v,
         |    ROW_NUMBER() OVER (PARTITION BY cand.vec_id
         |      ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id) AS rn
         |  FROM cand, cent) t WHERE rn = 1)
         |SELECT a.centroid_id, a.vec_id AS keep_vec_id,
         |  b.vec_id AS dup_vec_id,
         |  CAST(ROUND(list_cosine_similarity(a.v, b.v) * 1000000) AS BIGINT)
         |    AS sim_e6
         |FROM assign a JOIN assign b ON a.centroid_id = b.centroid_id
         |  AND a.vec_id < b.vec_id
         |WHERE CAST(ROUND(list_cosine_similarity(a.v, b.v) * 1000000)
         |  AS BIGINT) >= ${graft.operators.Similarity.SemTauE6}""".stripMargin,

    "pq_encode" -> s"""WITH $PqCodesCtes
      |SELECT vec_id,
      |  ${(0 until graft.operators.Similarity.PqM).map(m =>
           s"CAST(MAX(CASE WHEN m = $m THEN k END) AS BIGINT) AS c$m")
           .mkString(", ")},
      |  CAST(SUM(d9) AS BIGINT) // 1000 AS err_e6
      |FROM pqbest WHERE rn = 1 GROUP BY vec_id""".stripMargin,

    "pq_search" -> s"""WITH $PqCodesCtes,
      |q AS (SELECT vec_id AS q_id, v AS qv FROM pqe WHERE vec_id < 8),
      |lut AS (SELECT q_id, m, k,
      |    CAST(ROUND(($pqSubDistSql) * 1e9) AS BIGINT) AS d9
      |  FROM (SELECT q_id, qv AS v FROM q), pqcb),
      |score AS (SELECT l.q_id, b.vec_id, CAST(SUM(l.d9) AS BIGINT)
      |    AS dist_e9
      |  FROM pqbest b JOIN lut l ON l.m = b.m AND l.k = b.k
      |  WHERE b.rn = 1 AND b.vec_id >= 8
      |  GROUP BY 1, 2),
      |r AS (SELECT q_id, vec_id, dist_e9,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist_e9, vec_id)
      |      AS rn
      |  FROM score)
      |SELECT q_id, vec_id AS cand_id, CAST(rn AS BIGINT) AS rank, dist_e9
      |FROM r WHERE rn <= ${graft.operators.Similarity.TopK}""".stripMargin,

    "tfidf_topk" ->
      s"""WITH tf AS (SELECT doc_id, t.t AS token,
         |    CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)
         |  GROUP BY 1, 2),
         |idf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
         |  FROM tf GROUP BY 1),
         |r AS (SELECT tf.doc_id, tf.token, tf.tf, idf.df,
         |    (tf.tf * 1000000) // idf.df AS tfidf_ppm
         |  FROM tf JOIN idf USING (token)),
         |k AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf_ppm DESC, token) AS rank FROM r)
         |SELECT doc_id, token, tf, df, tfidf_ppm, CAST(rank AS BIGINT)
         |  AS rank
         |FROM k WHERE rank <= ${graft.operators.TextAnalysis.TfidfTopN}""".stripMargin,

    "pq_recall" -> {
      val k = graft.operators.Similarity.TopK
      s"""WITH $PqCodesCtes,
         |q AS (SELECT vec_id AS q_id, v AS qv FROM pqe WHERE vec_id < 8),
         |cand AS (SELECT vec_id AS cand_id, v AS cv FROM pqe
         |  WHERE vec_id >= 8),
         |ts AS (SELECT q_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY CAST(ROUND(($l2SumSql) * 1e9) AS BIGINT), cand_id)
         |      AS rn
         |  FROM q, cand),
         |truth AS (SELECT q_id, cand_id FROM ts WHERE rn <= $k),
         |lut AS (SELECT q_id, m, k,
         |    CAST(ROUND(($pqSubDistSql) * 1e9) AS BIGINT) AS d9
         |  FROM (SELECT q_id, qv AS v FROM q), pqcb),
         |score AS (SELECT l.q_id, b.vec_id, CAST(SUM(l.d9) AS BIGINT)
         |    AS dist_e9
         |  FROM pqbest b JOIN lut l ON l.m = b.m AND l.k = b.k
         |  WHERE b.rn = 1 AND b.vec_id >= 8
         |  GROUP BY 1, 2),
         |pr AS (SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist_e9, vec_id)
         |      AS rn
         |  FROM score),
         |approx AS (SELECT q_id, vec_id AS cand_id FROM pr WHERE rn <= $k),
         |hits AS (SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM truth t JOIN approx a
         |    ON t.q_id = a.q_id AND t.cand_id = a.cand_id
         |  GROUP BY 1)
         |SELECT b.q_id, COALESCE(h.n_hits, 0) AS n_hits,
         |  (COALESCE(h.n_hits, 0) * 1000) // $k AS recall_milli
         |FROM (SELECT DISTINCT q_id FROM truth) b
         |LEFT JOIN hits h USING (q_id)""".stripMargin
    },

    "ann_hard_negatives" -> {
      import graft.operators.Similarity.{QueryCount, TopK}
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    CAST(label AS BIGINT) AS label FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv, label AS q_label FROM e
         |  WHERE vec_id < $QueryCount),
         |c AS (SELECT vec_id AS cand_id, v AS cv, label AS c_label FROM e
         |  WHERE vec_id >= $QueryCount),
         |s AS (SELECT q_id, q_label, cand_id, c_label,
         |    list_cosine_similarity(qv, cv) AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY list_cosine_similarity(qv, cv) DESC, cand_id) AS rn
         |  FROM q, c WHERE c_label <> q_label)
         |SELECT q_id, q_label, cand_id, c_label, CAST(rn AS BIGINT) AS rank,
         |  CAST(ROUND(sim * 1000000) AS BIGINT) AS sim_e6
         |FROM s WHERE rn <= $TopK""".stripMargin
    },

    "pq_train" -> PqTrainTempSql,

    "pq_recall_trained" -> {
      import graft.operators.Similarity.{PqSubDim, PqTrainIters, QueryCount, TopK}
      val k = TopK
      val fin = s"pt_c$PqTrainIters"
      val adc = s"list_sum(list_transform(generate_series(1, $PqSubDim), " +
        s"i -> (q.qv6[i] - c.c6[i]) * (q.qv6[i] - c.c6[i])))"
      val enc = s"list_sum(list_transform(generate_series(1, $PqSubDim), " +
        s"i -> (s.sv6[i] - c.c6[i]) * (s.sv6[i] - c.c6[i])))"
      s"""${DuckSoftBounds}WITH $PqTrainCtes,
         |pt_de AS (SELECT s.vec_id, s.m, c.k, $enc AS d12
         |  FROM pt_sub s JOIN $fin c ON s.m = c.m),
         |pt_codes AS (SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d12, k)
         |      AS rn FROM pt_de) t WHERE rn = 1),
         |pt_qs AS (SELECT vec_id AS q_id, CAST(sm.m AS BIGINT) AS m,
         |    list_transform(generate_series(1, $PqSubDim),
         |      i -> v6[sm.m * $PqSubDim + i]) AS qv6
         |  FROM pt_v6, UNNEST(generate_series(0,
         |    ${graft.operators.Similarity.PqM - 1})) AS sm(m)
         |  WHERE vec_id < $QueryCount),
         |pt_sc AS (SELECT q.q_id, a.vec_id, CAST(SUM($adc) AS BIGINT)
         |    AS dist
         |  FROM pt_codes a JOIN $fin c ON a.m = c.m AND a.k = c.k
         |    JOIN pt_qs q ON q.m = a.m
         |  GROUP BY 1, 2),
         |pt_ap AS (SELECT q_id, vec_id AS cand_id FROM (SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, vec_id)
         |      AS rn FROM pt_sc) t WHERE rn <= $k),
         |pe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |pt_tq AS (SELECT vec_id AS q_id, v AS qv FROM pe
         |  WHERE vec_id < $QueryCount),
         |pt_tc AS (SELECT vec_id AS cand_id, v AS cv FROM pe
         |  WHERE vec_id >= $QueryCount),
         |pt_tr AS (SELECT q_id, cand_id FROM (SELECT q_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY CAST(ROUND(($l2SumSql) * 1e9) AS BIGINT), cand_id)
         |      AS rn FROM pt_tq, pt_tc) t WHERE rn <= $k),
         |pt_h AS (SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM pt_tr t JOIN pt_ap a
         |    ON t.q_id = a.q_id AND t.cand_id = a.cand_id
         |  GROUP BY 1)
         |SELECT b.q_id, COALESCE(h.n_hits, 0) AS n_hits,
         |  (COALESCE(h.n_hits, 0) * 1000) // $k AS recall_milli
         |FROM (SELECT DISTINCT q_id FROM pt_tr) b
         |LEFT JOIN pt_h h USING (q_id)""".stripMargin
    },

    "pq_opq_balance" -> {
      import graft.operators.Similarity.{PqM, PqSubDim}
      s"""WITH ob_base AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS v6
         |  FROM embeddings),
         |${opqPermCtes("ob")},
         |pp AS (SELECT olddim // $PqSubDim AS subspace,
         |    CAST(SUM(var_e12) AS BIGINT) AS plain_var_e12
         |  FROM ob_dv JOIN ob_pm ON dim = olddim GROUP BY 1),
         |op AS (SELECT newpos // $PqSubDim AS subspace,
         |    CAST(SUM(var_e12) AS BIGINT) AS opq_var_e12
         |  FROM ob_dv JOIN ob_pm ON dim = olddim GROUP BY 1),
         |t AS (SELECT CAST(SUM(var_e12) AS BIGINT) AS tot FROM ob_dv)
         |SELECT subspace, plain_var_e12, opq_var_e12,
         |  CAST(CAST(plain_var_e12 AS HUGEINT) * $PqM * 1000000
         |    // GREATEST(tot, 1) AS BIGINT) AS plain_balance_ppm,
         |  CAST(CAST(opq_var_e12 AS HUGEINT) * $PqM * 1000000
         |    // GREATEST(tot, 1) AS BIGINT) AS opq_balance_ppm
         |FROM pp JOIN op USING (subspace), t""".stripMargin
    },

    "pq_recall_opq" -> {
      import graft.operators.Similarity.{Dim, PqM, PqSubDim, PqTrainIters,
        CentroidLo, PqK, QueryCount, TopK}
      val k = TopK
      val fin = s"po_c$PqTrainIters"
      val adc = s"list_sum(list_transform(generate_series(1, $PqSubDim), " +
        s"i -> (q.qv6[i] - c.c6[i]) * (q.qv6[i] - c.c6[i])))"
      val enc = s"list_sum(list_transform(generate_series(1, $PqSubDim), " +
        s"i -> (s.sv6[i] - c.c6[i]) * (s.sv6[i] - c.c6[i])))"
      s"""${DuckSoftBounds}WITH po_base AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS v6
         |  FROM embeddings),
         |${opqPermCtes("po")},
         |po_v6 AS (SELECT vec_id,
         |    list_transform(generate_series(1, $Dim),
         |      j -> v6[pv[j] + 1]) AS v6
         |  FROM po_base, po_pv),
         |po_sub AS (SELECT vec_id, CAST(sm.m AS BIGINT) AS m,
         |    list_transform(generate_series(1, $PqSubDim),
         |      i -> v6[sm.m * $PqSubDim + i]) AS sv6
         |  FROM po_v6, UNNEST(generate_series(0, ${PqM - 1})) AS sm(m)
         |  WHERE vec_id >= $QueryCount),
         |po_c0 AS (SELECT m, vec_id - $CentroidLo AS k, sv6 AS c6
         |  FROM po_sub
         |  WHERE vec_id BETWEEN $CentroidLo AND ${CentroidLo + PqK - 1}),
         |${lloydRoundsSql("po")},
         |po_de AS (SELECT s.vec_id, s.m, c.k, $enc AS d12
         |  FROM po_sub s JOIN $fin c ON s.m = c.m),
         |po_codes AS (SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d12, k)
         |      AS rn FROM po_de) t WHERE rn = 1),
         |po_qs AS (SELECT vec_id AS q_id, CAST(sm.m AS BIGINT) AS m,
         |    list_transform(generate_series(1, $PqSubDim),
         |      i -> v6[sm.m * $PqSubDim + i]) AS qv6
         |  FROM po_v6, UNNEST(generate_series(0, ${PqM - 1})) AS sm(m)
         |  WHERE vec_id < $QueryCount),
         |po_sc AS (SELECT q.q_id, a.vec_id, CAST(SUM($adc) AS BIGINT)
         |    AS dist
         |  FROM po_codes a JOIN $fin c ON a.m = c.m AND a.k = c.k
         |    JOIN po_qs q ON q.m = a.m
         |  GROUP BY 1, 2),
         |po_ap AS (SELECT q_id, vec_id AS cand_id FROM (SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, vec_id)
         |      AS rn FROM po_sc) t WHERE rn <= $k),
         |po_e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |po_tq AS (SELECT vec_id AS q_id, v AS qv FROM po_e
         |  WHERE vec_id < $QueryCount),
         |po_tc AS (SELECT vec_id AS cand_id, v AS cv FROM po_e
         |  WHERE vec_id >= $QueryCount),
         |po_tr AS (SELECT q_id, cand_id FROM (SELECT q_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY CAST(ROUND(($l2SumSql) * 1e9) AS BIGINT), cand_id)
         |      AS rn FROM po_tq, po_tc) t WHERE rn <= $k),
         |po_h AS (SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM po_tr t JOIN po_ap a
         |    ON t.q_id = a.q_id AND t.cand_id = a.cand_id
         |  GROUP BY 1)
         |SELECT b.q_id, COALESCE(h.n_hits, 0) AS n_hits,
         |  (COALESCE(h.n_hits, 0) * 1000) // $k AS recall_milli
         |FROM (SELECT DISTINCT q_id FROM po_tr) b
         |LEFT JOIN po_h h USING (q_id)""".stripMargin
    },

    "pq_recall_curve" -> {
      import graft.operators.Similarity.{PqSubDim, PqTrainIters, QueryCount, TopK}
      val k = TopK
      val adc = s"list_sum(list_transform(generate_series(1, $PqSubDim), " +
        s"i -> (q.qv6[i] - c.c6[i]) * (q.qv6[i] - c.c6[i])))"
      val enc = s"list_sum(list_transform(generate_series(1, $PqSubDim), " +
        s"i -> (s.sv6[i] - c.c6[i]) * (s.sv6[i] - c.c6[i])))"
      val perIter = (0 to PqTrainIters).map { i =>
        s"""pc_de$i AS (SELECT s.vec_id, s.m, c.k, $enc AS d12
           |  FROM pt_sub s JOIN pt_c$i c ON s.m = c.m),
           |pc_codes$i AS (SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d12, k)
           |      AS rn FROM pc_de$i) t WHERE rn = 1),
           |pc_sc$i AS (SELECT q.q_id, a.vec_id, CAST(SUM($adc) AS BIGINT)
           |    AS dist
           |  FROM pc_codes$i a JOIN pt_c$i c ON a.m = c.m AND a.k = c.k
           |    JOIN pt_qs q ON q.m = a.m
           |  GROUP BY 1, 2),
           |pc_ap$i AS (SELECT q_id, vec_id AS cand_id FROM (SELECT q_id,
           |    vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY dist, vec_id) AS rn FROM pc_sc$i) t
           |  WHERE rn <= $k),
           |pc_h$i AS (SELECT CAST($i AS BIGINT) AS iters,
           |    CAST(COUNT(*) AS BIGINT) AS sum_hits
           |  FROM pt_tr t JOIN pc_ap$i a
           |    ON t.q_id = a.q_id AND t.cand_id = a.cand_id)""".stripMargin
      }.mkString(",\n")
      val union = (0 to PqTrainIters)
        .map(i => s"SELECT iters, sum_hits FROM pc_h$i")
        .mkString("\n  UNION ALL ")
      s"""${DuckSoftBounds}WITH $PqTrainCtes,
         |pt_qs AS (SELECT vec_id AS q_id, CAST(sm.m AS BIGINT) AS m,
         |    list_transform(generate_series(1, $PqSubDim),
         |      i -> v6[sm.m * $PqSubDim + i]) AS qv6
         |  FROM pt_v6, UNNEST(generate_series(0,
         |    ${graft.operators.Similarity.PqM - 1})) AS sm(m)
         |  WHERE vec_id < $QueryCount),
         |pe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |pt_tq AS (SELECT vec_id AS q_id, v AS qv FROM pe
         |  WHERE vec_id < $QueryCount),
         |pt_tc AS (SELECT vec_id AS cand_id, v AS cv FROM pe
         |  WHERE vec_id >= $QueryCount),
         |pt_tr AS (SELECT q_id, cand_id FROM (SELECT q_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY CAST(ROUND(($l2SumSql) * 1e9) AS BIGINT), cand_id)
         |      AS rn FROM pt_tq, pt_tc) t WHERE rn <= $k),
         |$perIter
         |SELECT u.iters, u.sum_hits,
         |  (u.sum_hits * 1000) //
         |    ((SELECT COUNT(DISTINCT q_id) FROM pt_tr) * $k)
         |    AS mean_recall_milli
         |FROM ($union) u""".stripMargin
    },

    "pq_rerank_curve" -> {
      import graft.operators.Similarity.{PqSubDim, PqTrainIters, QueryCount, RerankRs, TopK}
      val k = TopK
      val fin = s"pt_c$PqTrainIters"
      val adc = s"list_sum(list_transform(generate_series(1, $PqSubDim), " +
        s"i -> (q.qv6[i] - c.c6[i]) * (q.qv6[i] - c.c6[i])))"
      val enc = s"list_sum(list_transform(generate_series(1, $PqSubDim), " +
        s"i -> (s.sv6[i] - c.c6[i]) * (s.sv6[i] - c.c6[i])))"
      val perR = RerankRs.map { r =>
        s"""re$r AS (SELECT q_id, cand_id FROM (
           |  SELECT s.q_id, s.vec_id AS cand_id,
           |    ROW_NUMBER() OVER (PARTITION BY s.q_id
           |      ORDER BY CAST(ROUND(($l2SumSql) * 1e9) AS BIGINT), s.vec_id)
           |      AS rk
           |  FROM (SELECT q_id, vec_id FROM pt_rn WHERE rn <= $r) s
           |  JOIN pt_tq q ON q.q_id = s.q_id
           |  JOIN pt_tc c ON c.cand_id = s.vec_id) t WHERE rk <= $k),
           |rh$r AS (SELECT CAST($r AS BIGINT) AS rerank_r,
           |    CAST(COUNT(*) AS BIGINT) AS sum_hits
           |  FROM pt_tr t JOIN re$r a
           |    ON t.q_id = a.q_id AND t.cand_id = a.cand_id)""".stripMargin
      }.mkString(",\n")
      val union = RerankRs.map(r => s"SELECT rerank_r, sum_hits FROM rh$r")
        .mkString("\n  UNION ALL ")
      s"""${DuckSoftBounds}WITH $PqTrainCtes,
         |pt_de AS (SELECT s.vec_id, s.m, c.k, $enc AS d12
         |  FROM pt_sub s JOIN $fin c ON s.m = c.m),
         |pt_codes AS (SELECT vec_id, m, k FROM (SELECT vec_id, m, k,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d12, k)
         |      AS rn FROM pt_de) t WHERE rn = 1),
         |pt_qs AS (SELECT vec_id AS q_id, CAST(sm.m AS BIGINT) AS m,
         |    list_transform(generate_series(1, $PqSubDim),
         |      i -> v6[sm.m * $PqSubDim + i]) AS qv6
         |  FROM pt_v6, UNNEST(generate_series(0,
         |    ${graft.operators.Similarity.PqM - 1})) AS sm(m)
         |  WHERE vec_id < $QueryCount),
         |pt_sc AS (SELECT q.q_id, a.vec_id, CAST(SUM($adc) AS BIGINT)
         |    AS dist
         |  FROM pt_codes a JOIN $fin c ON a.m = c.m AND a.k = c.k
         |    JOIN pt_qs q ON q.m = a.m
         |  GROUP BY 1, 2),
         |pt_rn AS (SELECT q_id, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, vec_id)
         |      AS rn FROM pt_sc),
         |pe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |pt_tq AS (SELECT vec_id AS q_id, v AS qv FROM pe
         |  WHERE vec_id < $QueryCount),
         |pt_tc AS (SELECT vec_id AS cand_id, v AS cv FROM pe
         |  WHERE vec_id >= $QueryCount),
         |pt_tr AS (SELECT q_id, cand_id FROM (SELECT q_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY CAST(ROUND(($l2SumSql) * 1e9) AS BIGINT), cand_id)
         |      AS rn FROM pt_tq, pt_tc) t WHERE rn <= $k),
         |$perR
         |SELECT u.rerank_r, u.sum_hits,
         |  (u.sum_hits * 1000) //
         |    ((SELECT COUNT(DISTINCT q_id) FROM pt_tr) * $k)
         |    AS mean_recall_milli
         |FROM ($union) u""".stripMargin
    },

    // residual IVF-PQ recall gate — staged TEMP-TABLE form (the
    // coarse k-means, residual Lloyd rounds and ADC scoring each
    // materialize one stage; see PqResidualTempSql)
    "pq_recall_residual" -> PqResidualTempSql,

    "ivf_recall" -> {
      val k = graft.operators.Similarity.TopK
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
         |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
         |truth AS (SELECT q_id, cand_id FROM (
         |  SELECT q_id, cand.vec_id AS cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY list_cosine_similarity(qv, v) DESC, cand.vec_id)
         |      AS rn
         |  FROM q, cand) t WHERE rn <= $k),
         |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
         |  WHERE vec_id BETWEEN 8 AND 23),
         |assign AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT cand.vec_id, cent.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
         |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id)
         |        AS rn
         |    FROM cand, cent) t WHERE rn = 1),
         |probes AS (
         |  SELECT q_id, centroid_id FROM (
         |    SELECT q_id, centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY list_cosine_similarity(qv, cv) DESC, centroid_id)
         |        AS rn
         |    FROM q, cent) t WHERE rn <= 4),
         |probed AS (SELECT p.q_id, a.vec_id
         |  FROM probes p JOIN assign a USING (centroid_id)),
         |approx AS (SELECT q_id, vec_id AS cand_id FROM (
         |  SELECT pr.q_id, pr.vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY pr.q_id
         |      ORDER BY list_cosine_similarity(q.qv, c.v) DESC, pr.vec_id)
         |      AS rn
         |  FROM probed pr JOIN q ON pr.q_id = q.q_id
         |  JOIN cand c ON pr.vec_id = c.vec_id) t WHERE rn <= $k),
         |hits AS (SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM truth t JOIN approx a
         |    ON t.q_id = a.q_id AND t.cand_id = a.cand_id
         |  GROUP BY 1)
         |SELECT b.q_id, COALESCE(h.n_hits, 0) AS n_hits,
         |  (COALESCE(h.n_hits, 0) * 1000) // $k AS recall_milli
         |FROM (SELECT DISTINCT q_id FROM truth) b
         |LEFT JOIN hits h USING (q_id)""".stripMargin
    },

    // combined IVF probe pruning + int8 in-list ranking vs exact truth
    "ivf_sq_recall" -> {
      val k = graft.operators.Similarity.TopK
      val p = graft.operators.Similarity.NumProbes
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
         |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
         |truth AS (SELECT q_id, cand_id FROM (
         |  SELECT q_id, cand.vec_id AS cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY list_cosine_similarity(qv, v) DESC, cand.vec_id)
         |      AS rn
         |  FROM q, cand) t WHERE rn <= $k),
         |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
         |  WHERE vec_id BETWEEN 8 AND 23),
         |assign AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT cand.vec_id, cent.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
         |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id)
         |        AS rn
         |    FROM cand, cent) t WHERE rn = 1),
         |probes AS (
         |  SELECT q_id, centroid_id FROM (
         |    SELECT q_id, centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY list_cosine_similarity(qv, cv) DESC, centroid_id)
         |        AS rn
         |    FROM q, cent) t WHERE rn <= $p),
         |i8 AS (SELECT vec_id, list_transform(v,
         |    x -> CAST(ROUND(GREATEST(LEAST(x, 1.0), -1.0) * 127)
         |      AS BIGINT)) AS qv8 FROM e),
         |approx AS (SELECT q_id, vec_id AS cand_id FROM (
         |  SELECT pr.q_id, pr.vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY pr.q_id
         |      ORDER BY list_sum(list_transform(
         |        list_zip(qi.qv8, ci.qv8), z -> z[1] * z[2])) DESC,
         |        pr.vec_id) AS rn
         |  FROM (SELECT p2.q_id, a.vec_id
         |        FROM probes p2 JOIN assign a USING (centroid_id)) pr
         |  JOIN i8 qi ON pr.q_id = qi.vec_id
         |  JOIN i8 ci ON pr.vec_id = ci.vec_id) t WHERE rn <= $k),
         |hits AS (SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM truth t JOIN approx a
         |    ON t.q_id = a.q_id AND t.cand_id = a.cand_id
         |  GROUP BY 1)
         |SELECT b.q_id, COALESCE(h.n_hits, 0) AS n_hits,
         |  (COALESCE(h.n_hits, 0) * 1000) // $k AS recall_milli
         |FROM (SELECT DISTINCT q_id FROM truth) b
         |LEFT JOIN hits h USING (q_id)""".stripMargin
    },

    "ivf_recall_curve" -> {
      val k = graft.operators.Similarity.TopK
      val ps = graft.operators.Similarity.IvfProbeCounts
      val perP = ps.map { p =>
        s"""ap$p AS (SELECT q_id, vec_id AS cand_id FROM (
           |  SELECT pr.q_id, pr.vec_id,
           |    ROW_NUMBER() OVER (PARTITION BY pr.q_id
           |      ORDER BY list_cosine_similarity(q.qv, c.v) DESC, pr.vec_id)
           |      AS rn
           |  FROM (SELECT p.q_id, a.vec_id
           |        FROM probes p JOIN assign a USING (centroid_id)
           |        WHERE p.rn <= $p) pr
           |  JOIN q ON pr.q_id = q.q_id
           |  JOIN cand c ON pr.vec_id = c.vec_id) t WHERE rn <= $k),
           |h$p AS (SELECT CAST($p AS BIGINT) AS probes,
           |    CAST(COUNT(*) AS BIGINT) AS sum_hits
           |  FROM truth t JOIN ap$p a
           |    ON t.q_id = a.q_id AND t.cand_id = a.cand_id)""".stripMargin
      }.mkString(",\n")
      val union = ps.map(p => s"SELECT probes, sum_hits FROM h$p")
        .mkString("\n  UNION ALL ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
         |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= 8),
         |truth AS (SELECT q_id, cand_id FROM (
         |  SELECT q_id, cand.vec_id AS cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY list_cosine_similarity(qv, v) DESC, cand.vec_id)
         |      AS rn
         |  FROM q, cand) t WHERE rn <= $k),
         |cent AS (SELECT vec_id - 8 AS centroid_id, v AS cv FROM e
         |  WHERE vec_id BETWEEN 8 AND 23),
         |assign AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT cand.vec_id, cent.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
         |        ORDER BY list_cosine_similarity(v, cv) DESC, centroid_id)
         |        AS rn
         |    FROM cand, cent) t WHERE rn = 1),
         |probes AS (
         |  SELECT q_id, centroid_id, rn FROM (
         |    SELECT q_id, centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY list_cosine_similarity(qv, cv) DESC, centroid_id)
         |        AS rn
         |    FROM q, cent) t),
         |$perP
         |SELECT u.probes, u.sum_hits,
         |  (u.sum_hits * 1000) //
         |    ((SELECT COUNT(DISTINCT q_id) FROM truth) * $k)
         |    AS mean_recall_milli
         |FROM ($union) u""".stripMargin
    },

    "pmi_pairs" ->
      s"""WITH uni AS (SELECT t.t AS t, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)
         |  GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM uni),
         |tk AS (SELECT string_split(text, ' ') AS tk FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2),
         |p AS (SELECT tk[u.i+1] AS w1, tk[u.i+2] AS w2,
         |    CAST(COUNT(*) AS BIGINT) AS c12
         |  FROM tk, UNNEST(generate_series(0, len(tk)-2)) AS u(i)
         |  GROUP BY 1, 2 HAVING COUNT(*) >= ${TextAnalysis.PmiMinCount})
         |SELECT w1, w2, c12,
         |  ((c12 * 1000000) // u1.c) * n_tok // u2.c AS lift_ppm
         |FROM p JOIN uni u1 ON p.w1 = u1.t JOIN uni u2 ON p.w2 = u2.t, tot
         |ORDER BY lift_ppm DESC, w1, w2
         |LIMIT ${TextAnalysis.PmiTopK}""".stripMargin,

    "bpe_apply" ->
      s"""WITH v AS (SELECT t.t AS t, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)
         |  GROUP BY 1),
         |top AS (SELECT substr(t, u.i, 2) AS pair,
         |    CAST(SUM(tf) AS BIGINT) AS pair_n
         |  FROM v, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
         |  WHERE len(t) >= 2
         |  GROUP BY 1 ORDER BY pair_n DESC, pair LIMIT 1),
         |r AS (SELECT pair, pair_n, tf,
         |    CAST(len(t) AS BIGINT) AS len_before,
         |    CAST(len(replace(t, pair, '_')) AS BIGINT) AS len_after
         |  FROM v, top)
         |SELECT pair, pair_n,
         |  CAST(SUM(CASE WHEN len_after < len_before THEN tf ELSE 0 END)
         |    AS BIGINT) AS tokens_affected,
         |  CAST(SUM(tf * len_before) AS BIGINT) AS chars_before,
         |  CAST(SUM(tf * len_after) AS BIGINT) AS chars_after
         |FROM r GROUP BY 1, 2""".stripMargin,

    "bpe_train_curve" -> BpeTrainTempSql,

    "ingest_parity" ->
      """WITH k AS (SELECT lang,
        |    md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
        |  FROM documents
        |  WHERE length(text) BETWEEN 50 AND 2000
        |    AND len(string_split(text, ' ')) >= 10
        |    AND (len(regexp_extract_all(text, '[.,!?;:]')) * 1000)
        |      // greatest(length(text), 1) <= 100)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_emitted,
        |  CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_suppressed
        |FROM k GROUP BY lang""".stripMargin,

    "shard_balance" -> {
      val n = TextAnalysis.OutShards
      s"""WITH s AS (SELECT
         |    ${sqlPhash("concat('shard:', CAST(doc_id AS VARCHAR))")} % $n
         |      AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
         |  FROM documents),
         |p AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(toks) AS BIGINT) AS n_tokens FROM s GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM p)
         |SELECT shard, n_docs, n_tokens,
         |  (n_tokens * 1000000) // total_tokens - ${1000000L / n} AS dev_ppm
         |FROM p, t""".stripMargin
    },

    "backfill_plan" -> {
      val b = graft.operators.Snapshot.BackfillBatch
      s"""SELECT CAST(c_custkey % ${graft.operators.Snapshot.ReadPartitions}
         |    AS BIGINT) AS pid,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  (CAST(COUNT(*) AS BIGINT) + ${b - 1}) // $b AS n_batches,
         |  CAST(MIN(c_custkey) AS BIGINT) AS key_lo,
         |  CAST(MAX(c_custkey) AS BIGINT) AS key_hi
         |FROM customer GROUP BY 1""".stripMargin
    },

    "apply_batch_plan" -> {
      val b = graft.operators.ChangeLog.ApplyBatchRows
      s"""WITH $CL,
         |polled AS (SELECT event_id FROM cl WHERE event_id % 7 = 0),
         |pb AS (SELECT * FROM cl
         |  WHERE NOT EXISTS (SELECT 1 FROM polled p
         |                    WHERE p.event_id = cl.event_id)
         |  ORDER BY event_id LIMIT ${graft.operators.ChangeLog.BatchSize}),
         |rb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY part
         |    ORDER BY ems, event_id) AS rn FROM pb)
         |SELECT part, (rn - 1) // $b AS batch_idx,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  MIN(event_id) AS first_event_id,
         |  MAX(event_id) AS last_event_id,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
         |  CAST(SUM(value_cents) AS BIGINT) AS sum_cents
         |FROM rb GROUP BY 1, 2""".stripMargin
    },

    "props_census" ->
      """WITH m AS (SELECT event_type, u.m AS m
        |  FROM events, UNNEST(regexp_extract_all(props,
        |    '"([A-Za-z0-9_]+)"\s*:\s*([^,}]+)', 0)) AS u(m)),
        |p AS (SELECT event_type,
        |    regexp_extract(m, '"([A-Za-z0-9_]+)"', 1) AS key,
        |    trim(regexp_extract(m, ':\s*(.+)$', 1)) AS vs
        |  FROM m),
        |nm AS (SELECT event_type, key,
        |    CASE WHEN regexp_matches(vs, '^-?[0-9]+$')
        |      THEN TRY_CAST(vs AS BIGINT) END AS num
        |  FROM p)
        |SELECT event_type, key, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(num) AS BIGINT) AS n_numeric,
        |  CAST(COALESCE(SUM(num), 0) AS BIGINT) AS sum_num,
        |  MIN(num) AS min_num, MAX(num) AS max_num
        |FROM nm GROUP BY 1, 2""".stripMargin,

    // dense hour grid (silent hours = 0), trailing-24h window over the
    // count relation, integer cross-product thresholds
    "arrival_anomaly" ->
      s"""WITH $CL,
         |hc AS (SELECT ems // 3600000 AS h, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM cl GROUP BY 1),
         |bb AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM hc),
         |g AS (SELECT gs.h FROM bb, UNNEST(generate_series(lo, hi))
         |  AS gs(h)),
         |d AS (SELECT g.h, COALESCE(hc.n, 0) AS n
         |  FROM g LEFT JOIN hc USING (h)),
         |wn AS (SELECT h, n,
         |    CAST(COALESCE(SUM(n) OVER w, 0) AS BIGINT) AS trail_n,
         |    CAST(COUNT(*) OVER w AS BIGINT) AS trail_cnt
         |  FROM d WINDOW w AS (ORDER BY h
         |    ROWS BETWEEN ${Temporal.AnomalyTrailHours} PRECEDING
         |    AND 1 PRECEDING))
         |SELECT CAST(h AS BIGINT) AS h, n, trail_n,
         |  CASE WHEN trail_cnt < ${Temporal.AnomalyTrailHours} THEN 'WARMUP'
         |       WHEN n * ${Temporal.AnomalyTrailHours} > trail_n * 2
         |         THEN 'SPIKE'
         |       WHEN n * ${Temporal.AnomalyTrailHours} * 2 < trail_n
         |         THEN 'QUIET'
         |       ELSE 'NORMAL' END AS status
         |FROM wn""".stripMargin,

    "attribution_last_touch" -> AttributionSql,

    // linear multi-touch: journey id = count of PRECEDING purchases
    // over the same (ts_ns, event_id) order; equal split in
    // milli-cents with the same truncating div on both engines
    "attribution_linear" -> LinearAttributionSql,

    // the streaming journey state replays into the SAME oracle text
    "stream_linear_parity" -> LinearAttributionSql,

    // U-shape position attribution: roles solo/first/last/mid/none,
    // endpoint shares and the mid pool from the shared PosEndNum/PosDen
    // constants; the streaming U-shape state replays into the SAME text
    "attribution_position"   -> PositionAttributionSql,
    "stream_position_parity" -> PositionAttributionSql,

    // GDPR subject-access export for the bounded request cohort;
    // cohort modulus from the shared Snapshot constant
    "access_export" -> {
      val m = graft.operators.Snapshot.AccessMod
      s"""WITH $CL,
         |coh AS (SELECT c_custkey AS u, c_name, c_mktsegment
         |  FROM customer WHERE c_custkey % $m = 0),
         |ord AS (SELECT o_custkey AS u,
         |    CAST(COUNT(*) AS BIGINT) AS n_orders,
         |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
         |      AS BIGINT) AS order_mass_cents
         |  FROM orders WHERE EXISTS
         |    (SELECT 1 FROM coh WHERE coh.u = o_custkey)
         |  GROUP BY 1),
         |ev AS (SELECT user_id AS u,
         |    CAST(COUNT(*) AS BIGINT) AS n_events,
         |    CAST(MAX(ems) AS BIGINT) AS last_ems
         |  FROM cl WHERE EXISTS
         |    (SELECT 1 FROM coh WHERE coh.u = user_id)
         |  GROUP BY 1),
         |x AS (SELECT coh.u, coh.c_name, coh.c_mktsegment,
         |    COALESCE(ord.n_orders, 0) AS n_orders,
         |    COALESCE(ord.order_mass_cents, 0) AS order_mass_cents,
         |    COALESCE(ev.n_events, 0) AS n_events,
         |    COALESCE(ev.last_ems, 0) AS last_ems
         |  FROM coh LEFT JOIN ord ON coh.u = ord.u
         |  LEFT JOIN ev ON coh.u = ev.u)
         |SELECT u AS user_id, n_orders, n_events,
         |  '{"userId":' || u ||
         |  ',"name":"' || c_name ||
         |  '","segment":"' || c_mktsegment ||
         |  '","orders":' || n_orders ||
         |  ',"orderMassCents":' || order_mass_cents ||
         |  ',"events":' || n_events ||
         |  ',"lastEventMs":' || last_ems || '}' AS body
         |FROM x""".stripMargin
    },

    // next-event transition matrix over the same (ts_ns, event_id)
    // arrival order as sessionize/attribution; 'end' sink rows keep
    // each from_type's outgoing ppm mass complete
    "event_transitions" -> TransitionsSql,

    "stream_transitions_parity" -> TransitionsSql,

    // RFM quartile census: boundaries via the value_quantiles
    // convention on the (metric, value) aggregate of the user grid
    "rfm_segments" -> {
      val pcts = graft.operators.Analytics.RfmPcts.mkString(", ")
      s"""WITH u AS (SELECT user_id, MAX(epoch_ns(ts)) AS r,
         |    CAST(COUNT(*) AS BIGINT) AS f,
         |    CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS m
         |  FROM events GROUP BY 1),
         |mv AS (
         |  SELECT user_id, 'r' AS metric, r AS value FROM u
         |  UNION ALL SELECT user_id, 'f', f FROM u
         |  UNION ALL SELECT user_id, 'm', m FROM u),
         |grid AS (SELECT metric, value, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM mv GROUP BY 1, 2),
         |cums AS (SELECT metric, value,
         |    CAST(SUM(c) OVER (PARTITION BY metric ORDER BY value
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(c) OVER (PARTITION BY metric) AS BIGINT) AS cnt
         |  FROM grid),
         |bounds AS (SELECT metric, pct, MIN(value) AS q
         |  FROM cums, UNNEST([$pcts]) AS p(pct)
         |  WHERE cum >= (cnt * pct + 99) // 100
         |  GROUP BY 1, 2),
         |scored AS (SELECT mv.user_id, mv.metric,
         |    1 + CAST(SUM(CASE WHEN b.q < mv.value THEN 1 ELSE 0 END)
         |      AS BIGINT) AS score,
         |    MAX(mv.value) AS value
         |  FROM mv JOIN bounds b USING (metric) GROUP BY 1, 2),
         |users AS (SELECT user_id,
         |    MAX(CASE WHEN metric = 'r' THEN score END) AS r_score,
         |    MAX(CASE WHEN metric = 'f' THEN score END) AS f_score,
         |    MAX(CASE WHEN metric = 'm' THEN score END) AS m_score,
         |    MAX(CASE WHEN metric = 'm' THEN value END) AS m_cents
         |  FROM scored GROUP BY 1)
         |SELECT r_score, f_score, m_score,
         |  CAST(COUNT(*) AS BIGINT) AS n_users,
         |  CAST(SUM(m_cents) AS BIGINT) AS total_cents
         |FROM users GROUP BY 1, 2, 3""".stripMargin
    },

    "stream_attribution_parity" -> AttributionSql,

    "funnel_conversion" -> FunnelSql,

    "stream_funnel_parity" -> FunnelSql,


    // signup-week cohorts × purchase-age weeks with a grid cumsum;
    // pre-signup purchases clamp to age 0 on both engines
    "cohort_ltv" ->
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_ns(ts) // 1000000000 // 604800 AS week,
        |    CAST(ROUND(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |b AS (SELECT cohort_week,
        |    GREATEST(week - cohort_week, 0) AS age_weeks,
        |    e.user_id, cents
        |  FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE event_type = 'purchase'),
        |g AS (SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
        |    CAST(age_weeks AS BIGINT) AS age_weeks,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
        |    CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |  FROM b GROUP BY 1, 2)
        |SELECT *, CAST(SUM(revenue_cents) OVER (PARTITION BY cohort_week
        |    ORDER BY age_weeks) AS BIGINT) AS ltv_cents
        |FROM g""".stripMargin,

    "retention_cohorts" -> {
      val w = graft.operators.Analytics.WeekNs
      s"""WITH uw AS (SELECT DISTINCT user_id,
         |    epoch_ns(ts) // $w AS week FROM events),
         |ch AS (SELECT user_id, MIN(week) AS cohort_week
         |  FROM uw GROUP BY 1)
         |SELECT ch.cohort_week, uw.week - ch.cohort_week AS age_weeks,
         |  CAST(COUNT(*) AS BIGINT) AS n_users
         |FROM uw JOIN ch USING (user_id) GROUP BY 1, 2""".stripMargin
    },

    "value_histogram" ->
      s"""WITH $CL
         |SELECT op,
         |  CASE WHEN value_cents > 0
         |    THEN CAST(length(format('{:b}', value_cents)) AS BIGINT)
         |    ELSE 0 END AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(value_cents) AS BIGINT) AS sum_cents
         |FROM cl GROUP BY 1, 2""".stripMargin,

    "minhash_est_error" -> {
      val agree = (0 until Dedup.NumHashes)
        .map(s => s"(CASE WHEN a.m$s = b.m$s THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $MinhashCtes,
         |est AS (SELECT j.doc_a, j.doc_b, j.j_milli,
         |    CAST($agree AS BIGINT) AS n_agree
         |  FROM jac j
         |  JOIN sigs a ON a.doc_id = j.doc_a
         |  JOIN sigs b ON b.doc_id = j.doc_b)
         |SELECT doc_a, doc_b, n_agree,
         |  (n_agree * 1000) // ${Dedup.NumHashes} AS est_milli, j_milli,
         |  abs((n_agree * 1000) // ${Dedup.NumHashes} - j_milli) AS err_milli
         |FROM est""".stripMargin
    },

    // 1-bit rung beside the full-width estimator on the same pair set;
    // Ĵ₁ = max(2c−1, 0) with the same truncating div both sides
    "bbit_minhash" -> {
      val agree64 = (0 until Dedup.NumHashes)
        .map(s => s"(CASE WHEN a.m$s = b.m$s THEN 1 ELSE 0 END)")
        .mkString(" + ")
      val agree1 = (0 until Dedup.NumHashes)
        .map(s => s"(CASE WHEN a.m$s % 2 = b.m$s % 2 THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $MinhashCtes,
         |est AS (SELECT j.j_milli,
         |    CAST($agree64 AS BIGINT) AS n_agree,
         |    CAST($agree1 AS BIGINT) AS n_bit_agree
         |  FROM jac j
         |  JOIN sigs a ON a.doc_id = j.doc_a
         |  JOIN sigs b ON b.doc_id = j.doc_b),
         |r AS (SELECT j_milli // 100 * 100 AS j_bucket_milli,
         |    (n_agree * 1000) // ${Dedup.NumHashes} AS est64_milli,
         |    greatest((n_bit_agree * 2000) // ${Dedup.NumHashes} - 1000,
         |      0) AS est1_milli,
         |    j_milli
         |  FROM est)
         |SELECT j_bucket_milli, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(abs(est64_milli - j_milli)) // COUNT(*) AS BIGINT)
         |    AS mae64_milli,
         |  CAST(SUM(abs(est1_milli - j_milli)) // COUNT(*) AS BIGINT)
         |    AS mae1_milli,
         |  CAST(MAX(abs(est1_milli - j_milli)) AS BIGINT)
         |    AS max_err1_milli
         |FROM r GROUP BY 1""".stripMargin
    },

    // prefix-width estimator ladder over the same joined signatures;
    // widths from the shared constant
    "minhash_width_sweep" -> {
      def agree(w: Int) = (0 until w)
        .map(s => s"(CASE WHEN a.m$s = b.m$s THEN 1 ELSE 0 END)")
        .mkString(" + ")
      val arms = Dedup.WidthSweep.map { w =>
        s"""SELECT CAST($w AS BIGINT) AS width,
           |  (n_agree$w * 1000) // $w AS est_milli, j_milli
           |FROM est""".stripMargin
      }.mkString("\nUNION ALL\n")
      val agreeCols = Dedup.WidthSweep.map(w =>
        s"CAST(${agree(w)} AS BIGINT) AS n_agree$w").mkString(",\n    ")
      s"""WITH $MinhashCtes,
         |est AS (SELECT j.j_milli,
         |    $agreeCols
         |  FROM jac j
         |  JOIN sigs a ON a.doc_id = j.doc_a
         |  JOIN sigs b ON b.doc_id = j.doc_b),
         |arms AS ($arms)
         |SELECT width, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(abs(est_milli - j_milli)) // COUNT(*) AS BIGINT)
         |    AS mae_milli,
         |  CAST(MAX(abs(est_milli - j_milli)) AS BIGINT)
         |    AS max_err_milli
         |FROM arms GROUP BY 1""".stripMargin
    },

    "dedup_agreement" ->
      s"""WITH $MinhashCtes, $SimhashCtes,
         |mh AS (SELECT doc_a, doc_b FROM jac
         |  WHERE j_milli >= ${Dedup.JaccardMilli}),
         |sp AS (SELECT DISTINCT doc_a, doc_b FROM spairs
         |  WHERE bit_count(xor(sa, sb)) <= ${Dedup.MaxHamming}),
         |u AS (SELECT COALESCE(mh.doc_a, sp.doc_a) AS doc_a,
         |    COALESCE(mh.doc_b, sp.doc_b) AS doc_b,
         |    (mh.doc_a IS NOT NULL) AS in_mh, (sp.doc_a IS NOT NULL) AS in_sp
         |  FROM mh FULL OUTER JOIN sp
         |    ON mh.doc_a = sp.doc_a AND mh.doc_b = sp.doc_b)
         |SELECT CAST(COUNT(CASE WHEN in_mh THEN 1 END) AS BIGINT) AS n_minhash,
         |  CAST(COUNT(CASE WHEN in_sp THEN 1 END) AS BIGINT) AS n_simhash,
         |  CAST(COUNT(CASE WHEN in_mh AND in_sp THEN 1 END) AS BIGINT)
         |    AS n_both,
         |  CAST(COUNT(*) AS BIGINT) AS n_union
         |FROM u""".stripMargin,

    "doclen_histogram" ->
      """WITH t AS (SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN ntok > 0
        |    THEN CAST(length(format('{:b}', ntok)) AS BIGINT)
        |    ELSE 0 END AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(ntok) AS BIGINT) AS sum_tokens
        |FROM t GROUP BY 1, 2""".stripMargin,

    "ngram_novelty" -> {
      val k = TextAnalysis.WinnowK
      s"""WITH nt AS (SELECT lang,
         |    ${sqlPhash("'split:' || doc_id")} % 100 AS bucket,
         |    string_split(text, ' ') AS tk
         |  FROM documents),
         |ng AS (SELECT lang,
         |    CASE WHEN bucket < 98 THEN 'train' ELSE 'held' END AS split,
         |    ${sqlPhash("gg.g")} AS h
         |  FROM nt, UNNEST(list_transform(generate_series(0, len(tk)-$k),
         |    i -> array_to_string(tk[i+1:i+$k], ' '))) AS gg(g)
         |  WHERE len(tk) >= $k),
         |ntr AS (SELECT DISTINCT lang, h FROM ng WHERE split = 'train'),
         |nhd AS (SELECT DISTINCT lang, h FROM ng WHERE split = 'held'),
         |nv AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_novel FROM nhd
         |  WHERE NOT EXISTS (SELECT 1 FROM ntr
         |    WHERE ntr.lang = nhd.lang AND ntr.h = nhd.h)
         |  GROUP BY 1),
         |hg AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_held_grams
         |  FROM nhd GROUP BY 1)
         |SELECT hg.lang, hg.n_held_grams,
         |  CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
         |  (CAST(COALESCE(nv.n_novel, 0) AS BIGINT) * 1000000)
         |    // hg.n_held_grams AS novel_ppm
         |FROM hg LEFT JOIN nv USING (lang)""".stripMargin
    },

    "embed_norm_stats" ->
      """WITH s AS (SELECT CAST(label AS BIGINT) AS label,
        |    CAST(list_sum(list_transform(embedding,
        |      x -> CAST(ROUND(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e6)
        |        AS BIGINT))) AS BIGINT) AS sq_e6
        |  FROM embeddings)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  MIN(sq_e6) AS min_sq_e6, MAX(sq_e6) AS max_sq_e6,
        |  CAST(SUM(sq_e6) AS BIGINT) AS sum_sq_e6
        |FROM s GROUP BY 1""".stripMargin,

    "checksum_compare" ->
      s"""WITH $ChecksumCtes
         |SELECT * FROM cver""".stripMargin,

    // header vs per-row-rounded line revenue, log2-bucketed mismatch
    "order_reconcile" ->
      """WITH l AS (SELECT l_orderkey,
        |    CAST(ROUND(l_extendedprice * (1.0 - l_discount)
        |      * (1.0 + l_tax) * 100) AS BIGINT) AS line_c
        |  FROM lineitem),
        |la AS (SELECT l_orderkey, CAST(SUM(line_c) AS BIGINT)
        |    AS lines_cents FROM l GROUP BY 1),
        |o AS (SELECT o_orderkey,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS header_cents
        |  FROM orders),
        |j AS (SELECT header_cents,
        |    abs(header_cents - COALESCE(lines_cents, 0)) AS diff_cents
        |  FROM o LEFT JOIN la ON o.o_orderkey = la.l_orderkey),
        |k AS (SELECT header_cents, diff_cents,
        |    CASE WHEN diff_cents = 0 THEN -1
        |      ELSE CAST(length(format('{:b}', diff_cents)) AS BIGINT)
        |    END AS bucket
        |  FROM j)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(MIN(diff_cents) AS BIGINT) AS min_diff_cents,
        |  CAST(MAX(diff_cents) AS BIGINT) AS max_diff_cents,
        |  CAST(SUM(header_cents) AS BIGINT) AS header_mass_cents
        |FROM k GROUP BY 1""".stripMargin,

    // expectation CASE generated from the SAME Snapshot.BenfordPpm
    // constant the Spark expression folds over
    "benford_audit" -> {
      // densified onto the full 9-digit grid (0-count digits carry
      // dev_ppm = exp_ppm), mirroring the Spark operator's grid join
      val gridRows = graft.operators.Snapshot.BenfordPpm
        .map { case (d, p) =>
          s"(CAST($d AS BIGINT), CAST($p AS BIGINT))"
        }.mkString(", ")
      s"""WITH grid(digit, exp_ppm) AS (VALUES $gridRows),
         |v AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT)
         |    AS cents FROM orders),
         |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
         |    AS BIGINT) AS digit FROM v WHERE cents > 0),
         |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM d GROUP BY 1),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g),
         |e AS (SELECT grid.digit, COALESCE(g.n, 0) AS n,
         |    CAST(COALESCE(g.n, 0) * 1000000 // tot AS BIGINT) AS obs_ppm,
         |    grid.exp_ppm
         |  FROM grid LEFT JOIN g USING (digit), t),
         |x AS (SELECT *, abs(obs_ppm - exp_ppm) AS dev_ppm FROM e),
         |y AS (SELECT *, CAST(SUM(dev_ppm) OVER () AS BIGINT) // 2
         |    AS tvd_ppm FROM x)
         |SELECT digit, n, obs_ppm, exp_ppm, dev_ppm, tvd_ppm,
         |  CASE WHEN tvd_ppm <= ${graft.operators.Snapshot.BenfordTolPpm}
         |    THEN 'BENFORD' ELSE 'SKEWED' END AS verdict
         |FROM y""".stripMargin
    },

    // robust median/MAD outlier census per segment — lower-median
    // convention on integer cents, windows over the distinct-value
    // counts relation (the value_median discipline)
    "mad_outliers" -> {
      val k = graft.operators.Snapshot.MadK
      s"""WITH oc AS (SELECT c_mktsegment AS segment,
         |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |cc AS (SELECT segment, cents, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM oc GROUP BY 1, 2),
         |m0 AS (SELECT segment, cents, c,
         |    SUM(c) OVER (PARTITION BY segment ORDER BY cents) AS cum,
         |    SUM(c) OVER (PARTITION BY segment) AS cnt FROM cc),
         |med AS (SELECT segment, cents AS median_cents,
         |    CAST(cnt AS BIGINT) AS n_orders
         |  FROM m0 WHERE cum - c < (cnt + 1) // 2
         |    AND (cnt + 1) // 2 <= cum),
         |dl AS (SELECT cc.segment, cc.cents - m.median_cents AS delta,
         |    cc.c
         |  FROM cc JOIN med m ON cc.segment = m.segment),
         |ad AS (SELECT segment, abs(delta) AS dev,
         |    CAST(SUM(c) AS BIGINT) AS c
         |  FROM dl GROUP BY 1, 2),
         |a0 AS (SELECT segment, dev, c,
         |    SUM(c) OVER (PARTITION BY segment ORDER BY dev) AS cum,
         |    SUM(c) OVER (PARTITION BY segment) AS cnt FROM ad),
         |mad AS (SELECT segment, dev AS mad_cents
         |  FROM a0 WHERE cum - c < (cnt + 1) // 2
         |    AND (cnt + 1) // 2 <= cum),
         |outl AS (SELECT dl.segment,
         |    CAST(COALESCE(SUM(CASE WHEN dl.delta > $k * md.mad_cents
         |      THEN dl.c END), 0) AS BIGINT) AS n_outliers
         |  FROM dl JOIN mad md ON dl.segment = md.segment GROUP BY 1)
         |SELECT m.segment, m.n_orders, m.median_cents, md.mad_cents,
         |  o.n_outliers,
         |  o.n_outliers * 1000000 // m.n_orders AS outlier_ppm
         |FROM med m JOIN mad md ON m.segment = md.segment
         |JOIN outl o ON m.segment = o.segment""".stripMargin
    },

    "repair_plan" -> {
      val b = graft.operators.Snapshot.ChecksumBuckets
      val bb = graft.operators.Snapshot.BackfillBatch
      s"""WITH $ChecksumCtes,
         |rdiv AS (SELECT bucket FROM cver WHERE verdict = 'DIVERGED'),
         |rsrc AS (SELECT c_custkey % $b AS bucket,
         |    CAST(c_custkey AS BIGINT) AS key
         |  FROM customer)
         |SELECT rsrc.bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  (CAST(COUNT(*) AS BIGINT) + ${bb - 1}) // $bb AS n_batches,
         |  MIN(key) AS key_lo, MAX(key) AS key_hi
         |FROM rsrc JOIN rdiv ON rsrc.bucket = rdiv.bucket
         |GROUP BY 1""".stripMargin
    },

    "fk_integrity" ->
      """WITH oc AS (SELECT o_custkey AS k, COUNT(*) AS n
        |  FROM orders GROUP BY 1),
        |cp AS (SELECT DISTINCT c_custkey AS k FROM customer),
        |lo AS (SELECT l_orderkey AS k, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1),
        |op AS (SELECT DISTINCT o_orderkey AS k FROM orders),
        |cn AS (SELECT c_nationkey AS k, COUNT(*) AS n
        |  FROM customer GROUP BY 1),
        |np AS (SELECT DISTINCT n_nationkey AS k FROM nation)
        |SELECT 'orders->customer' AS relation,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_child_rows,
        |  (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM oc
        |    WHERE NOT EXISTS (SELECT 1 FROM cp WHERE cp.k = oc.k))
        |    AS n_orphan_rows,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cp) AS n_parents,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cp
        |    WHERE NOT EXISTS (SELECT 1 FROM oc WHERE oc.k = cp.k))
        |    AS n_childless_parents
        |UNION ALL
        |SELECT 'lineitem->orders',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM lo
        |    WHERE NOT EXISTS (SELECT 1 FROM op WHERE op.k = lo.k)),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM op),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM op
        |    WHERE NOT EXISTS (SELECT 1 FROM lo WHERE lo.k = op.k))
        |UNION ALL
        |SELECT 'customer->nation',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
        |  (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM cn
        |    WHERE NOT EXISTS (SELECT 1 FROM np WHERE np.k = cn.k)),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM np),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM np
        |    WHERE NOT EXISTS (SELECT 1 FROM cn WHERE cn.k = np.k))""".stripMargin,

    "kmeans_shift" ->
      """WITH ve AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS v6
        |  FROM embeddings WHERE vec_id >= 8),
        |kc0 AS (SELECT vec_id - 8 AS centroid_id, v6 AS c6 FROM ve
        |  WHERE vec_id BETWEEN 8 AND 23),
        |kd1 AS (SELECT ve.vec_id, kc0.centroid_id,
        |    list_sum(list_transform(generate_series(1, len(ve.v6)),
        |      i -> (ve.v6[i] - kc0.c6[i]) * (ve.v6[i] - kc0.c6[i]))) AS d12
        |  FROM ve, kc0),
        |ka1 AS (SELECT vec_id, centroid_id FROM (SELECT vec_id, centroid_id,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d12, centroid_id)
        |      AS rn FROM kd1) t WHERE rn = 1),
        |km1 AS (SELECT t.centroid_id, CAST(d.i AS BIGINT) - 1 AS dim,
        |    CAST(SUM(t.v6[d.i]) AS BIGINT) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT ka1.centroid_id, ve.v6 FROM ka1
        |        JOIN ve USING (vec_id)) t,
        |    UNNEST(generate_series(1, len(t.v6))) AS d(i)
        |  GROUP BY 1, 2),
        |kmm1 AS (SELECT centroid_id, dim, (s - s % n) // n AS m_e6, n
        |  FROM km1),
        |kc1 AS (SELECT centroid_id, list(m_e6 ORDER BY dim) AS c6
        |  FROM kmm1 GROUP BY 1),
        |kd2 AS (SELECT ve.vec_id, kc1.centroid_id,
        |    list_sum(list_transform(generate_series(1, len(ve.v6)),
        |      i -> (ve.v6[i] - kc1.c6[i]) * (ve.v6[i] - kc1.c6[i]))) AS d12
        |  FROM ve, kc1),
        |ka2 AS (SELECT vec_id, centroid_id FROM (SELECT vec_id, centroid_id,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d12, centroid_id)
        |      AS rn FROM kd2) t WHERE rn = 1),
        |km2 AS (SELECT t.centroid_id, CAST(d.i AS BIGINT) - 1 AS dim,
        |    CAST(SUM(t.v6[d.i]) AS BIGINT) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT ka2.centroid_id, ve.v6 FROM ka2
        |        JOIN ve USING (vec_id)) t,
        |    UNNEST(generate_series(1, len(t.v6))) AS d(i)
        |  GROUP BY 1, 2),
        |kmm2 AS (SELECT centroid_id, dim, (s - s % n) // n AS m_e6, n
        |  FROM km2),
        |kf AS (SELECT COALESCE(kmm1.centroid_id, kmm2.centroid_id)
        |      AS centroid_id,
        |    kmm1.m_e6 AS m1, kmm2.m_e6 AS m2, kmm1.n AS n1, kmm2.n AS n2
        |  FROM kmm1 FULL OUTER JOIN kmm2
        |    ON kmm1.centroid_id = kmm2.centroid_id AND kmm1.dim = kmm2.dim)
        |SELECT centroid_id,
        |  CAST(COALESCE(MAX(n1), 0) AS BIGINT) AS n_members_1,
        |  CAST(COALESCE(MAX(n2), 0) AS BIGINT) AS n_members_2,
        |  CAST(SUM(ABS(COALESCE(m2, 0) - COALESCE(m1, 0))) AS BIGINT)
        |    AS shift_e6
        |FROM kf GROUP BY 1""".stripMargin,

    "cooccur_topk" -> {
      import graft.operators.TextAnalysis.{CooccurTopK, CooccurWindow}
      s"""WITH ctk AS (SELECT string_split(text, ' ') AS tk FROM documents),
         |cpair AS (SELECT tk[a.i] AS w_a, tk[a.i + o.d] AS w_b
         |  FROM ctk,
         |    UNNEST(generate_series(1, len(tk))) AS a(i),
         |    UNNEST(generate_series(1, $CooccurWindow)) AS o(d)
         |  WHERE a.i + o.d <= len(tk))
         |SELECT w_a, w_b, CAST(COUNT(*) AS BIGINT) AS n
         |FROM cpair GROUP BY 1, 2
         |ORDER BY n DESC, w_a, w_b LIMIT $CooccurTopK""".stripMargin
    },

    "olap_order_priority" -> {
      val d = graft.operators.Analytics.LateDays
      s"""WITH lt AS (SELECT o_orderpriority, COUNT(*) AS n_late
         |  FROM orders o
         |  WHERE EXISTS (SELECT 1 FROM lineitem l
         |    WHERE l.l_orderkey = o.o_orderkey
         |      AND l.l_shipdate > o.o_orderdate + INTERVAL $d DAY)
         |  GROUP BY 1)
         |SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  CAST(COALESCE(MAX(lt.n_late), 0) AS BIGINT) AS n_late
         |FROM orders o LEFT JOIN lt USING (o_orderpriority)
         |GROUP BY 1""".stripMargin
    },

    "quality_calibration" -> {
      val cases = TextAnalysis.ClassifierWeights
        .map { case (w, v) => s"WHEN ${esc(w)} THEN $v" }.mkString(" ")
      s"""WITH $GopherCtes,
         |qct AS (SELECT doc_id,
         |    CAST(CASE t.t $cases ELSE 0 END AS BIGINT) AS w
         |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)),
         |qcs AS (SELECT doc_id,
         |    (${TextAnalysis.ClassifierBias} +
         |     CAST(SUM(w) AS BIGINT) // COUNT(*) +
         |     ${TextAnalysis.CalibShiftMilli}) // 100 AS score_bucket
         |  FROM qct GROUP BY doc_id)
         |SELECT qcs.score_bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN gq.keep_b THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_gopher_keep,
         |  (CAST(SUM(CASE WHEN gq.keep_b THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000) // COUNT(*) AS keep_ppm
         |FROM qcs JOIN gq ON qcs.doc_id = gq.doc_id
         |GROUP BY 1""".stripMargin
    },

    "user_profile" ->
      s"""WITH $CL,
         |up AS (SELECT user_id, event_id, ems, op, value_cents,
         |    ems - LAG(ems, 1) OVER (PARTITION BY user_id
         |      ORDER BY ems, event_id) AS gap_ms,
         |    FIRST_VALUE(op) OVER (PARTITION BY user_id
         |      ORDER BY ems DESC, event_id DESC) AS last_op
         |  FROM cl)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(SUM(CASE WHEN gap_ms IS NULL OR gap_ms > 1800000
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
         |  MIN(ems) AS first_ms, MAX(ems) AS last_ms,
         |  CAST(COALESCE(SUM(CASE WHEN op <> 'D' THEN value_cents END), 0)
         |    AS BIGINT) AS sum_value_cents,
         |  MAX(last_op) AS last_op
         |FROM up GROUP BY 1""".stripMargin,

    "arrival_monitor" ->
      s"""WITH $CL,
         |am AS (SELECT part, ems,
         |    LAG(ems, 1) OVER (PARTITION BY user_id ORDER BY event_id)
         |      AS prev_ems
         |  FROM cl)
         |SELECT part, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(SUM(CASE WHEN prev_ems > ems THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_inversions,
         |  CAST(COALESCE(MIN(ems - prev_ems), 0) AS BIGINT) AS min_gap_ms,
         |  CAST(COALESCE(MAX(ems - prev_ems), 0) AS BIGINT) AS max_gap_ms,
         |  CAST(COALESCE(SUM(ems - prev_ems) // COUNT(ems - prev_ems), 0)
         |    AS BIGINT) AS mean_gap_ms
         |FROM am GROUP BY 1""".stripMargin,

    "olap_promo_revenue" ->
      s"""WITH pl AS (SELECT
         |    CAST(strftime(l_shipdate, '%Y%m') AS BIGINT) AS ship_month,
         |    CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
         |      AS rev_c,
         |    p.p_type
         |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
         |SELECT ship_month,
         |  CAST(SUM(CASE WHEN p_type = '${graft.operators.Analytics.PromoType}' THEN rev_c ELSE 0 END)
         |    AS BIGINT) AS promo_rev_c,
         |  CAST(SUM(rev_c) AS BIGINT) AS total_rev_c,
         |  (CAST(SUM(CASE WHEN p_type = '${graft.operators.Analytics.PromoType}' THEN rev_c ELSE 0 END)
         |    AS BIGINT) * 1000000) // CAST(SUM(rev_c) AS BIGINT) AS promo_ppm
         |FROM pl GROUP BY 1""".stripMargin,

    "load_profile" ->
      s"""WITH $CL
         |SELECT (ems // 86400000 + 4) % 7 AS dow,
         |  (ems // 3600000) % 24 AS hour,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(value_cents) AS BIGINT) AS sum_cents
         |FROM cl GROUP BY 1, 2""".stripMargin,

    "table_manifest" ->
      s"""SELECT 'region' AS table_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COALESCE(bit_xor(${sqlPhash("CAST(r_regionkey AS VARCHAR)")}),
         |    0) AS BIGINT) AS key_xor FROM region
         |UNION ALL SELECT 'nation', CAST(COUNT(*) AS BIGINT),
         |  CAST(COALESCE(bit_xor(${sqlPhash("CAST(n_nationkey AS VARCHAR)")}),
         |    0) AS BIGINT) FROM nation
         |UNION ALL SELECT 'customer', CAST(COUNT(*) AS BIGINT),
         |  CAST(COALESCE(bit_xor(${sqlPhash("CAST(c_custkey AS VARCHAR)")}),
         |    0) AS BIGINT) FROM customer
         |UNION ALL SELECT 'supplier', CAST(COUNT(*) AS BIGINT),
         |  CAST(COALESCE(bit_xor(${sqlPhash("CAST(s_suppkey AS VARCHAR)")}),
         |    0) AS BIGINT) FROM supplier
         |UNION ALL SELECT 'part', CAST(COUNT(*) AS BIGINT),
         |  CAST(COALESCE(bit_xor(${sqlPhash("CAST(p_partkey AS VARCHAR)")}),
         |    0) AS BIGINT) FROM part
         |UNION ALL SELECT 'orders', CAST(COUNT(*) AS BIGINT),
         |  CAST(COALESCE(bit_xor(${sqlPhash("CAST(o_orderkey AS VARCHAR)")}),
         |    0) AS BIGINT) FROM orders
         |UNION ALL SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         |  CAST(COALESCE(bit_xor(${sqlPhash(
              "l_orderkey || ':' || l_linenumber")}), 0) AS BIGINT)
         |  FROM lineitem""".stripMargin,

    "modal_align" ->
      """WITH ma AS (SELECT
        |    CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL
        |      THEN 'MATCHED'
        |      WHEN d.doc_id IS NOT NULL THEN 'DOC_ONLY'
        |      ELSE 'EMB_ONLY' END AS status,
        |    COALESCE(d.lang, '-') AS lang,
        |    COALESCE(CAST(e.label AS BIGINT), -1) AS label
        |  FROM documents d FULL OUTER JOIN embeddings e
        |    ON d.doc_id = e.vec_id)
        |SELECT status, lang, label, CAST(COUNT(*) AS BIGINT) AS n
        |FROM ma GROUP BY 1, 2, 3""".stripMargin,

    "bloom_prune" -> {
      import graft.operators.Sketches.{BloomBits, BloomHashes, WordBits}
      val keyE = "CAST(event_id AS VARCHAR)"
      def posE(s: Int) =
        s"(${sqlPermute(sqlPhash(keyE), s)}) % $BloomBits"
      val posList = (0 until BloomHashes).map(posE).mkString(", ")
      s"""WITH $CL,
         |bk AS (SELECT event_id FROM cl WHERE event_id % 7 = 0),
         |bpos AS (SELECT p.p AS pos FROM bk, UNNEST([$posList]) AS p(p)),
         |bloom AS (SELECT pos // $WordBits AS word,
         |    CAST(bit_or(1::BIGINT << CAST(pos % $WordBits AS INT))
         |      AS BIGINT) AS bits
         |  FROM bpos GROUP BY 1),
         |probe AS (SELECT event_id, (event_id % 7 = 0) AS actually_polled,
         |    p.p AS pos
         |  FROM cl, UNNEST([$posList]) AS p(p)),
         |hits AS (SELECT event_id, actually_polled,
         |    COUNT(CASE WHEN bloom.bits IS NOT NULL AND
         |      (bloom.bits &
         |        (1::BIGINT << CAST(probe.pos % $WordBits AS INT))) =
         |      (1::BIGINT << CAST(probe.pos % $WordBits AS INT)) THEN 1 END)
         |      = $BloomHashes AS maybe
         |  FROM probe LEFT JOIN bloom
         |    ON probe.pos // $WordBits = bloom.word
         |  GROUP BY 1, 2)
         |SELECT CASE WHEN maybe THEN 'MAYBE_POLLED'
         |    ELSE 'DEFINITELY_NEW' END AS verdict,
         |  CAST(actually_polled AS VARCHAR) AS actually_polled,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM hits GROUP BY 1, 2""".stripMargin
    },

    "cms_error" -> {
      import graft.operators.Sketches.{CmsDepth, CmsWidth}
      def colE(s: Int) = s"(${sqlPermute(sqlPhash("t.t"), s)}) % $CmsWidth"
      def pColE(s: Int) = s"(${sqlPermute(sqlPhash("t"), s)}) % $CmsWidth"
      val cellRows = (0 until CmsDepth)
        .map(s => s"SELECT $s AS rw, ${colE(s)} AS cc FROM tokstream t")
        .mkString(" UNION ALL ")
      val probeRows = (0 until CmsDepth)
        .map(s => s"SELECT t, exact_n, $s AS rw, ${pColE(s)} AS cc FROM top")
        .mkString(" UNION ALL ")
      s"""WITH tokstream AS (SELECT t.t AS t
         |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)),
         |cmscells AS (SELECT rw, cc, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM ($cellRows) u GROUP BY 1, 2),
         |top AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS exact_n
         |  FROM tokstream GROUP BY 1
         |  ORDER BY exact_n DESC, t LIMIT 20),
         |probes AS ($probeRows)
         |SELECT p.t, p.exact_n, MIN(c.cnt) AS est_n,
         |  MIN(c.cnt) - p.exact_n AS overcount
         |FROM probes p JOIN cmscells c ON p.rw = c.rw AND p.cc = c.cc
         |GROUP BY 1, 2""".stripMargin
    },

    "olap_rollup" ->
      """SELECT COALESCE(l_returnflag, '-') AS l_returnflag,
        |  COALESCE(l_linestatus, '-') AS l_linestatus,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS rev_c,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "olap_moving_revenue" ->
      """WITH md AS (SELECT epoch_ms(l_shipdate) // 86400000 AS ship_day,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1)
        |SELECT ship_day, rev_c,
        |  CAST(SUM(rev_c) OVER (ORDER BY ship_day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS mov7_rev_c
        |FROM md""".stripMargin,

    "op_mix_pivot" ->
      s"""WITH $CL
         |SELECT part,
         |  CAST(COUNT(CASE WHEN op = 'I' THEN 1 END) AS BIGINT) AS n_insert,
         |  CAST(COUNT(CASE WHEN op = 'U' THEN 1 END) AS BIGINT) AS n_update,
         |  CAST(COUNT(CASE WHEN op = 'D' THEN 1 END) AS BIGINT) AS n_delete
         |FROM cl GROUP BY 1""".stripMargin,

    "dedup_sweep" -> {
      val taus = graft.operators.Dedup.SweepThresholds.mkString(", ")
      s"""WITH $MinhashCtes,
         |sw AS (SELECT j.j_milli, CAST(t.t AS BIGINT) AS tau_milli
         |  FROM jac j, UNNEST([$taus]) AS t(t))
         |SELECT tau_milli, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |  CAST(COUNT(CASE WHEN j_milli >= tau_milli THEN 1 END) AS BIGINT)
         |    AS n_dup_pairs
         |FROM sw GROUP BY 1""".stripMargin
    },

    "cross_source_overlap" ->
      s"""WITH $MinhashCtes,
         |xsp AS (SELECT doc_a, doc_b FROM jac
         |  WHERE j_milli >= ${Dedup.JaccardMilli}),
         |xss AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS source_x,
         |  greatest(a.source, b.source) AS source_y,
         |  CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
         |FROM xsp JOIN xss a ON xsp.doc_a = a.doc_id
         |JOIN xss b ON xsp.doc_b = b.doc_id
         |GROUP BY 1, 2""".stripMargin,

    // duplicated-token-mass census over the same verified-pair chain
    "dup_token_share" ->
      s"""WITH $MinhashCtes,
         |losers AS (SELECT DISTINCT doc_b AS doc_id FROM jac
         |  WHERE j_milli >= ${Dedup.JaccardMilli}),
         |dts AS (SELECT d.doc_id, d.source,
         |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS toks,
         |    CASE WHEN losers.doc_id IS NOT NULL THEN 1 ELSE 0 END
         |      AS is_dup
         |  FROM documents d LEFT JOIN losers ON d.doc_id = losers.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
         |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN is_dup = 1 THEN toks ELSE 0 END) AS BIGINT)
         |    AS n_dup_tokens,
         |  CAST(SUM(CASE WHEN is_dup = 1 THEN toks ELSE 0 END) AS BIGINT)
         |    * 1000000 // greatest(CAST(SUM(toks) AS BIGINT), 1)
         |    AS dup_token_ppm
         |FROM dts GROUP BY 1""".stripMargin,

    "supplier_returns" ->
      s"""WITH per AS (SELECT l_suppkey,
         |    CAST(COUNT(*) AS BIGINT) AS n_items,
         |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_returned,
         |    CAST(SUM(CASE WHEN l_returnflag = 'R'
         |      THEN CAST(ROUND(l_extendedprice*(1.0-l_discount)*100)
         |        AS BIGINT) ELSE 0 END) AS BIGINT) AS returned_rev_c
         |  FROM lineitem GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_items) AS BIGINT) AS t_items,
         |  CAST(SUM(n_returned) AS BIGINT) AS t_returned FROM per)
         |SELECT s_suppkey, s_name, n_items, n_returned, returned_rev_c,
         |  CAST(n_returned * 1000000 // n_items AS BIGINT) AS return_ppm,
         |  CAST(n_returned * t_items > t_returned * n_items AS VARCHAR)
         |    AS above_corpus_rate
         |FROM per CROSS JOIN tot
         |JOIN supplier ON per.l_suppkey = supplier.s_suppkey
         |WHERE n_items >= ${Analytics.ReturnsMinItems}""".stripMargin,

    "olap_ship_delay" -> {
      val w = graft.operators.Analytics.DelayBucketDays
      s"""WITH g AS (SELECT o.o_orderpriority,
         |    CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
         |      CAST(l.l_shipdate AS DATE)) AS BIGINT) // $w * $w
         |      AS delay_lo_days
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |a AS (SELECT o_orderpriority, delay_lo_days,
         |    CAST(COUNT(*) AS BIGINT) AS n_items
         |  FROM g GROUP BY 1, 2)
         |SELECT o_orderpriority, delay_lo_days, n_items,
         |  CAST(n_items * 1000000 //
         |    SUM(n_items) OVER (PARTITION BY o_orderpriority) AS BIGINT)
         |    AS share_ppm
         |FROM a""".stripMargin
    },

    "olap_late_suppliers" ->
      """WITH ps AS (SELECT l_orderkey, l_suppkey,
        |    MAX(l_shipdate) AS sup_last
        |  FROM lineitem GROUP BY 1, 2),
        |f AS (SELECT ps.* FROM ps
        |  JOIN orders o ON ps.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'),
        |w AS (SELECT l_orderkey, l_suppkey, sup_last,
        |    CAST(COUNT(*) OVER (PARTITION BY l_orderkey) AS BIGINT)
        |      AS n_sups,
        |    MAX(sup_last) OVER (PARTITION BY l_orderkey) AS order_last
        |  FROM f),
        |w2 AS (SELECT *,
        |    CAST(SUM(CASE WHEN sup_last = order_last THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_at_last
        |  FROM w)
        |SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT)
        |    AS n_held_orders
        |FROM w2 JOIN supplier ON l_suppkey = s_suppkey
        |WHERE n_sups >= 2 AND n_at_last = 1 AND sup_last = order_last
        |GROUP BY 1, 2""".stripMargin,

    "olap_min_cost_supplier" ->
      s"""WITH sups AS (SELECT s_suppkey, s_name, n_name,
         |    CAST(ROUND(s_acctbal*100) AS BIGINT) AS s_acctbal_c
         |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         |  JOIN region r ON n.n_regionkey = r.r_regionkey
         |    AND r.r_name = '${Analytics.MinCostRegion}'),
         |g AS (SELECT l.l_partkey AS p_partkey, l.l_suppkey,
         |    CAST(MIN((CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
         |      * 100000) // CAST(ROUND(l.l_quantity*100) AS BIGINT))
         |      AS BIGINT) AS best_unit_u
         |  FROM lineitem l
         |  JOIN part p ON l.l_partkey = p.p_partkey
         |    AND p.p_size % ${Analytics.MinCostSizeStep} = 0
         |    AND p.p_type = '${Analytics.MinCostType}'
         |  WHERE l.l_quantity > 0
         |  GROUP BY 1, 2),
         |r AS (SELECT g.p_partkey, s.s_suppkey, s.s_name, s.n_name,
         |    g.best_unit_u, s.s_acctbal_c,
         |    ROW_NUMBER() OVER (PARTITION BY g.p_partkey
         |      ORDER BY g.best_unit_u, s.s_suppkey) AS rk
         |  FROM g JOIN sups s ON g.l_suppkey = s.s_suppkey)
         |SELECT p_partkey, s_suppkey, s_name, n_name, best_unit_u,
         |  s_acctbal_c
         |FROM r WHERE rk = 1""".stripMargin,

    "olap_important_stock" ->
      """WITH g AS (SELECT n.n_name, l.l_partkey,
        |    CAST(SUM(CAST(ROUND(l.l_extendedprice*(1.0-l.l_discount)
        |      *100) AS BIGINT)) AS BIGINT) AS value_c
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |w AS (SELECT *, CAST(SUM(value_c) OVER (PARTITION BY n_name)
        |    AS BIGINT) AS nation_total_c,
        |    CAST(COUNT(*) OVER (PARTITION BY n_name) AS BIGINT)
        |      AS n_parts FROM g)
        |SELECT n_name, l_partkey, value_c,
        |  CAST(value_c * 1000000 // nation_total_c AS BIGINT)
        |    AS share_ppm
        |FROM w
        |WHERE value_c > 2 * (nation_total_c // n_parts)""".stripMargin,

    "olap_dominant_shippers" ->
      s"""WITH g AS (SELECT l.l_partkey AS p_partkey, l.l_suppkey,
         |    CAST(SUM(CAST(ROUND(l.l_quantity*100) AS BIGINT))
         |      AS BIGINT) AS sup_qty_c
         |  FROM lineitem l
         |  JOIN part p ON l.l_partkey = p.p_partkey
         |    AND p.p_name LIKE '${Analytics.DominantNamePrefix}%'
         |  WHERE year(l.l_shipdate) = ${Analytics.DominantYear}
         |  GROUP BY 1, 2),
         |w AS (SELECT *, CAST(SUM(sup_qty_c)
         |    OVER (PARTITION BY p_partkey) AS BIGINT) AS part_qty_c
         |  FROM g)
         |SELECT s.s_suppkey, s.s_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_dominated_parts,
         |  CAST(SUM(sup_qty_c) AS BIGINT) AS qty_moved_c
         |FROM w JOIN supplier s ON w.l_suppkey = s.s_suppkey
         |WHERE sup_qty_c * 2 > part_qty_c
         |GROUP BY 1, 2""".stripMargin,

    "market_basket" -> MarketBasketBody,

    "brand_pagerank" -> BrandPagerankTempSql,

    // support-thresholded co-purchase graph, a<b<c oriented triangle
    // join, per-node membership + local clustering coefficient
    "brand_triangles" -> {
      import graft.operators.Analytics.TriSupportPpm
      s"""WITH b AS (SELECT DISTINCT l.l_orderkey AS okey,
         |    p.p_brand AS brand
         |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         |no AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders
         |  FROM b),
         |pr AS (SELECT a.brand AS ba, c.brand AS bb,
         |    CAST(COUNT(*) AS BIGINT) AS support
         |  FROM b a JOIN b c ON a.okey = c.okey AND a.brand < c.brand
         |  GROUP BY 1, 2),
         |ed AS (SELECT ba AS a, bb AS b FROM pr, no
         |  WHERE support * 1000000 >= n_orders * $TriSupportPpm),
         |tr AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM ed e1 JOIN ed e2 ON e1.b = e2.a
         |    JOIN ed e3 ON e1.a = e3.a AND e2.b = e3.b),
         |pn AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_triangles
         |  FROM (SELECT x AS brand FROM tr UNION ALL
         |    SELECT y FROM tr UNION ALL SELECT z FROM tr)
         |  GROUP BY 1),
         |dg AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS degree
         |  FROM (SELECT a AS brand FROM ed UNION ALL SELECT b FROM ed)
         |  GROUP BY 1)
         |SELECT dg.brand, dg.degree,
         |  COALESCE(pn.n_triangles, 0) AS n_triangles,
         |  CASE WHEN dg.degree >= 2
         |    THEN COALESCE(pn.n_triangles, 0) * 2000000
         |      // (dg.degree * (dg.degree - 1))
         |    ELSE 0 END AS clustering_ppm
         |FROM dg LEFT JOIN pn USING (brand)""".stripMargin
    },

    "weighted_sample" -> {
      import graft.functions.PortableHash.sqlPhash
      import graft.operators.TextAnalysis.{PriorityUnitMod, WeightedSampleN}
      s"""WITH w AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
         |    ${sqlPhash("'wsample:' || doc_id")} % $PriorityUnitMod AS u
         |  FROM documents)
         |SELECT doc_id, weight,
         |  weight * 1000000000000 // (u + 1) AS priority
         |FROM w
         |ORDER BY priority DESC, doc_id LIMIT $WeightedSampleN""".stripMargin
    },

    "rrf_fusion" -> {
      import graft.operators.Similarity.{CentroidLo, NumCentroids,
        NumProbes, QueryCount, RrfK0, TopK}
      val hi = CentroidLo + NumCentroids - 1
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e
         |  WHERE vec_id < $QueryCount),
         |c AS (SELECT vec_id AS cand_id, v AS cv FROM e
         |  WHERE vec_id >= $QueryCount),
         |brute AS (SELECT q_id, cand_id, rn FROM (
         |  SELECT q_id, cand_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY list_cosine_similarity(qv, cv) DESC, cand_id)
         |    AS rn FROM q, c) t WHERE rn <= $TopK),
         |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
         |lq AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b
         |  WHERE vec_id < $QueryCount),
         |lc AS (SELECT vec_id AS cand_id, v AS cv, bucket FROM b
         |  WHERE vec_id >= $QueryCount),
         |lsh AS (SELECT q_id, cand_id, rn FROM (
         |  SELECT q_id, cand_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY list_cosine_similarity(qv, cv) DESC, cand_id)
         |    AS rn FROM lq JOIN lc USING (bucket)) t WHERE rn <= $TopK),
         |cent AS (SELECT vec_id - $CentroidLo AS centroid_id, v AS ctv
         |  FROM e WHERE vec_id BETWEEN $CentroidLo AND $hi),
         |asg AS (SELECT vec_id, centroid_id FROM (
         |  SELECT cd.cand_id AS vec_id, cent.centroid_id,
         |    ROW_NUMBER() OVER (PARTITION BY cd.cand_id
         |      ORDER BY list_cosine_similarity(cd.cv, cent.ctv) DESC,
         |        centroid_id) AS rn
         |  FROM c cd, cent) t WHERE rn = 1),
         |probes AS (SELECT q_id, centroid_id FROM (
         |  SELECT q.q_id, cent.centroid_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.q_id
         |      ORDER BY list_cosine_similarity(q.qv, cent.ctv) DESC,
         |        centroid_id) AS rn
         |  FROM q, cent) t WHERE rn <= $NumProbes),
         |ivf AS (SELECT q_id, cand_id, rn FROM (
         |  SELECT pr.q_id, a.vec_id AS cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY pr.q_id
         |      ORDER BY list_cosine_similarity(qq.qv, cc.cv) DESC,
         |        a.vec_id) AS rn
         |  FROM probes pr JOIN asg a USING (centroid_id)
         |    JOIN q qq ON qq.q_id = pr.q_id
         |    JOIN c cc ON cc.cand_id = a.vec_id) t WHERE rn <= $TopK),
         |u AS (SELECT q_id, cand_id, rn FROM brute
         |  UNION ALL SELECT q_id, cand_id, rn FROM lsh
         |  UNION ALL SELECT q_id, cand_id, rn FROM ivf),
         |f AS (SELECT q_id, cand_id,
         |    CAST(SUM(1000000 // ($RrfK0 + rn)) AS BIGINT) AS rrf_e6,
         |    CAST(COUNT(*) AS BIGINT) AS n_systems
         |  FROM u GROUP BY 1, 2)
         |SELECT q_id, CAST(rnk AS BIGINT) AS rank, cand_id, rrf_e6,
         |  n_systems
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY rrf_e6 DESC, cand_id) AS rnk FROM f) t
         |WHERE rnk <= $TopK""".stripMargin
    },

    "embed_covariance" -> EmbedCovBody,

    "pq_subspace_balance" -> {
      import graft.operators.Similarity.{PqM, PqSubDim}
      s"""WITH cov AS (
         |$EmbedCovBody
         |),
         |per AS (SELECT dim_a // $PqSubDim AS subspace,
         |    CAST(SUM(cov_e12) AS BIGINT) AS var_e12
         |  FROM cov WHERE dim_a = dim_b GROUP BY 1),
         |t AS (SELECT CAST(SUM(var_e12) AS BIGINT) AS tot_e12 FROM per)
         |SELECT subspace, var_e12,
         |  var_e12 * 1000000 // GREATEST(tot_e12, 1) AS share_ppm,
         |  var_e12 * $PqM * 1000000 // GREATEST(tot_e12, 1)
         |    AS balance_ppm
         |FROM per, t""".stripMargin
    },

    "char_diversity" ->
      """WITH d AS (SELECT lang,
        |    list_transform(generate_series(1, GREATEST(len(text) - 1, 1)),
        |      i -> substr(text, i, 2)) AS bgs
        |  FROM documents),
        |v AS (SELECT lang,
        |    CAST(len(list_distinct(bgs)) AS BIGINT) * 1000000
        |      // len(bgs) AS div_ppm
        |  FROM d)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(div_ppm) AS min_div_ppm, MAX(div_ppm) AS max_div_ppm,
        |  CAST(SUM(div_ppm) // COUNT(*) AS BIGINT) AS mean_div_ppm
        |FROM v GROUP BY 1""".stripMargin,

    "anisotropy_audit" -> AnisotropyTempSql,

    "mmr_diversify" -> MmrTempSql,

    "join_advisor" -> {
      import graft.operators.Snapshot.{BroadcastRowLimit, SkewSharePpm}
      graft.operators.Snapshot.JoinEdges.map { case (lt, lk, rt, rk) =>
        s"""SELECT '$lt.$lk=$rt.$rk' AS edge, n_left, n_right,
           |  max_key_n * 1000000 // GREATEST(n_left, 1)
           |    AS max_key_share_ppm,
           |  CASE WHEN n_right <= $BroadcastRowLimit THEN 'BROADCAST'
           |    ELSE 'SORT_MERGE' END AS strategy,
           |  CASE WHEN max_key_n * 1000000 // GREATEST(n_left, 1)
           |      > $SkewSharePpm
           |    THEN 'true' ELSE 'false' END AS salt_left
           |FROM
           |  (SELECT CAST(COALESCE(SUM(cl), 0) AS BIGINT) AS n_left,
           |     CAST(COALESCE(MAX(cl), 0) AS BIGINT) AS max_key_n
           |   FROM (SELECT $lk AS k, COUNT(*) AS cl FROM $lt
           |         GROUP BY 1)) ls,
           |  (SELECT CAST(COUNT(*) AS BIGINT) AS n_right FROM $rt) rs"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
    },

    // generated from Snapshot.JoinEdges — the same grid the Spark
    // estimator walks, so an edge edit cannot desynchronize the sides
    "join_size_estimate" ->
      graft.operators.Snapshot.JoinEdges.map { case (lt, lk, rt, rk) =>
        s"""SELECT '$lt.$lk=$rt.$rk' AS edge, n_left, n_right,
           |  ndv_left, ndv_right,
           |  CAST(CAST(n_left AS HUGEINT) * n_right
           |    // GREATEST(ndv_left, ndv_right) AS BIGINT) AS est_rows,
           |  exact_rows,
           |  CAST(CAST(n_left AS HUGEINT) * n_right
           |      // GREATEST(ndv_left, ndv_right) * 1000000
           |    // GREATEST(exact_rows, 1) AS BIGINT) AS est_ppm_of_exact
           |FROM
           |  (SELECT CAST(COUNT(*) AS BIGINT) AS n_left,
           |     CAST(COUNT(DISTINCT $lk) AS BIGINT) AS ndv_left
           |   FROM $lt) ls,
           |  (SELECT CAST(COUNT(*) AS BIGINT) AS n_right,
           |     CAST(COUNT(DISTINCT $rk) AS BIGINT) AS ndv_right
           |   FROM $rt) rs,
           |  (SELECT CAST(COALESCE(SUM(cl * cr), 0) AS BIGINT)
           |       AS exact_rows
           |   FROM (SELECT $lk AS k, COUNT(*) AS cl FROM $lt
           |         GROUP BY 1) lp
           |   JOIN (SELECT $rk AS k, COUNT(*) AS cr FROM $rt
           |         GROUP BY 1) rp USING (k)) ex""".stripMargin
      }.mkString("\nUNION ALL\n"),

    "event_paths" -> {
      val k = graft.operators.Analytics.PathTopK
      s"""WITH t AS (SELECT event_type AS p1,
         |    LEAD(event_type, 1) OVER w AS p2,
         |    LEAD(event_type, 2) OVER w AS p3
         |  FROM events WINDOW w AS (PARTITION BY user_id
         |    ORDER BY epoch_ns(ts), event_id)),
         |g AS (SELECT p1, p2, p3, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM t WHERE p3 IS NOT NULL GROUP BY 1, 2, 3)
         |SELECT p1, p2, p3, n,
         |  CAST(n * 1000000 // (SELECT SUM(n) FROM g) AS BIGINT)
         |    AS share_ppm
         |FROM g ORDER BY n DESC, p1, p2, p3 LIMIT $k""".stripMargin
    },

    "rate_changepoint" -> {
      val sd = graft.operators.Temporal.CusumSlackDiv
      val tm = graft.operators.Temporal.CusumThreshMult
      s"""WITH c AS (SELECT event_type,
         |    epoch_ns(ts) // 86400000000000 AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
         |span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM c),
         |grid AS (SELECT t.event_type, d.day, d.lo, d.hi
         |  FROM (SELECT DISTINCT event_type FROM c) t,
         |    (SELECT lo, hi, UNNEST(generate_series(lo, hi)) AS day
         |     FROM span) d),
         |dense AS (SELECT g.event_type, g.day, g.lo, g.hi,
         |    CAST(COALESCE(c.n, 0) AS BIGINT) AS n
         |  FROM grid g LEFT JOIN c
         |    ON g.event_type = c.event_type AND g.day = c.day),
         |m AS (SELECT *,
         |    CAST(SUM(CASE WHEN day * 2 <= lo + hi THEN n ELSE 0 END)
         |        OVER (PARTITION BY event_type) * 1000 //
         |      SUM(CASE WHEN day * 2 <= lo + hi THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY event_type) AS BIGINT)
         |      AS mu_milli FROM dense),
         |dd AS (SELECT *,
         |    n * 1000 - mu_milli - mu_milli // $sd AS d_hi,
         |    mu_milli - mu_milli // $sd - n * 1000 AS d_lo FROM m),
         |cum AS (SELECT *, CAST(SUM(d_hi) OVER w AS BIGINT) AS cum_hi,
         |    CAST(SUM(d_lo) OVER w AS BIGINT) AS cum_lo
         |  FROM dd WINDOW w AS (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |s AS (SELECT *,
         |    cum_hi - LEAST(0, MIN(cum_hi) OVER w) AS cusum_hi_milli,
         |    cum_lo - LEAST(0, MIN(cum_lo) OVER w) AS cusum_lo_milli
         |  FROM cum WINDOW w AS (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT event_type, day, n, cusum_hi_milli, cusum_lo_milli,
         |  CASE WHEN cusum_hi_milli > mu_milli * $tm THEN 'RISE'
         |       WHEN cusum_lo_milli > mu_milli * $tm THEN 'DROP'
         |       ELSE 'OK' END AS status
         |FROM s""".stripMargin
    },

    "cluster_cohesion" ->
      """WITH ve AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS v6
        |  FROM embeddings WHERE vec_id >= 8),
        |cent AS (SELECT vec_id - 8 AS centroid_id, v6 AS c6 FROM ve
        |  WHERE vec_id BETWEEN 8 AND 23),
        |dist AS (SELECT ve.vec_id, cent.centroid_id,
        |    list_sum(list_transform(generate_series(1, len(ve.v6)),
        |      i -> (ve.v6[i] - cent.c6[i]) * (ve.v6[i] - cent.c6[i])))
        |      AS d12
        |  FROM ve, cent),
        |asg AS (SELECT vec_id, centroid_id, d12 // 1000000 AS d_u
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY d12, centroid_id) AS rn FROM dist) t
        |  WHERE rn = 1),
        |intra AS (SELECT centroid_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_members,
        |    CAST(SUM(d_u) // COUNT(*) AS BIGINT) AS intra_u
        |  FROM asg GROUP BY 1),
        |cd AS (SELECT a.centroid_id, b.centroid_id AS cid_b,
        |    list_sum(list_transform(generate_series(1, len(a.c6)),
        |      i -> (a.c6[i] - b.c6[i]) * (a.c6[i] - b.c6[i]))) AS d12
        |  FROM cent a, cent b WHERE a.centroid_id <> b.centroid_id),
        |inter AS (SELECT centroid_id,
        |    CAST(d12 // 1000000 AS BIGINT) AS inter_u,
        |    cid_b AS nearest_cid
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY centroid_id
        |      ORDER BY d12, cid_b) AS rn FROM cd) t
        |  WHERE rn = 1)
        |SELECT i.centroid_id,
        |  CAST(COALESCE(t.n_members, 0) AS BIGINT) AS n_members,
        |  CAST(COALESCE(t.intra_u, 0) AS BIGINT) AS intra_u,
        |  i.nearest_cid, i.inter_u,
        |  CAST(COALESCE(t.intra_u, 0) * 4 > i.inter_u AS VARCHAR)
        |    AS overlap_flag
        |FROM inter i LEFT JOIN intra t USING (centroid_id)""".stripMargin,

    "ann_tombstones" -> {
      import graft.operators.Similarity.{NumProbes, QueryCount,
        TombstoneMod, TopK}
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |cent AS (SELECT vec_id - $QueryCount AS centroid_id, v AS cv
         |  FROM e WHERE vec_id BETWEEN $QueryCount
         |    AND ${QueryCount + 15}),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e
         |  WHERE vec_id < $QueryCount),
         |cand AS (SELECT vec_id, v FROM e WHERE vec_id >= $QueryCount),
         |assign AS (SELECT vec_id, centroid_id FROM (
         |    SELECT cand.vec_id, cent.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY cand.vec_id
         |        ORDER BY list_cosine_similarity(v, cv) DESC,
         |          centroid_id) AS rn
         |    FROM cand, cent) t WHERE rn = 1),
         |probes AS (SELECT q_id, centroid_id FROM (
         |    SELECT q.q_id, cent.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY list_cosine_similarity(qv, cv) DESC,
         |          centroid_id) AS rn
         |    FROM q, cent) t WHERE rn <= $NumProbes),
         |scanned AS (SELECT p.q_id, a.vec_id,
         |    (a.vec_id % $TombstoneMod = 0) AS is_dead,
         |    list_cosine_similarity(q.qv, c.v) AS sim
         |  FROM probes p JOIN assign a USING (centroid_id)
         |  JOIN cand c ON a.vec_id = c.vec_id
         |  JOIN q ON p.q_id = q.q_id),
         |waste AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_scanned,
         |    CAST(SUM(CASE WHEN is_dead THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dead_scanned
         |  FROM scanned GROUP BY 1),
         |res AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY sim DESC, vec_id) AS rnk
         |    FROM scanned WHERE NOT is_dead) t WHERE rnk <= $TopK),
         |truth AS (SELECT q_id, vec_id FROM (SELECT q.q_id, c.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY list_cosine_similarity(qv, v) DESC, vec_id)
         |        AS rnk
         |    FROM q, cand c WHERE c.vec_id % $TombstoneMod <> 0) t
         |  WHERE rnk <= $TopK),
         |hits AS (SELECT t.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM truth t JOIN res r
         |    ON t.q_id = r.q_id AND t.vec_id = r.vec_id
         |  GROUP BY 1)
         |SELECT w.q_id, w.n_scanned, w.n_dead_scanned,
         |  CAST(n_dead_scanned * 1000000 // n_scanned AS BIGINT)
         |    AS waste_ppm,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST(COALESCE(h.n_hits, 0) * 1000 // $TopK AS BIGINT)
         |    AS recall_milli
         |FROM waste w LEFT JOIN hits h USING (q_id)""".stripMargin
    },

    "ops_dashboard" ->
      s"""WITH $CL, $STATUS, $ST,
         |g AS (SELECT 'db' || (user_id % 3) AS db,
         |    MAX(CASE WHEN event_id % 7 = 0 AND status = 'OK'
         |      THEN ems END) AS applied_ems,
         |    MIN(ems) AS first_ems,
         |    CAST(COUNT(CASE WHEN NOT (event_id % 7 = 0
         |      AND status = 'OK') THEN 1 END) AS BIGINT) AS n_unapplied
         |  FROM a GROUP BY 1),
         |n AS (SELECT MAX(ems) AS now_ems FROM cl),
         |lg AS (SELECT db,
         |    (now_ems - COALESCE(applied_ems, first_ems)) // 1000
         |      AS apply_lag_s,
         |    n_unapplied
         |  FROM g, n)
         |SELECT st.db, pending, blocked, error, success, apply_lag_s,
         |  n_unapplied,
         |  CASE WHEN error > success THEN 'ERROR'
         |       WHEN apply_lag_s > 3600 THEN 'WARN'
         |       ELSE 'OK' END AS health
         |FROM st JOIN lg ON st.db = lg.db""".stripMargin,

    "data_skipping_audit" -> {
      import graft.operators.Snapshot.{ProbeHiDay, ProbeLoDay,
        SkipDateChunkDays, SkipHashBuckets, SkipKeyChunkWidth}
      val h = sqlPhash("CAST(l_orderkey AS VARCHAR) || ':' || " +
        "CAST(l_linenumber AS VARCHAR)")
      def lay(name: String, chunk: String): String =
        s"""SELECT '$name' AS layout,
           |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
           |  CAST(SUM(pruned) AS BIGINT) AS n_pruned_chunks,
           |  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN pruned = 1 THEN n_rows ELSE 0 END)
           |    AS BIGINT) AS rows_skipped,
           |  CAST(SUM(CASE WHEN pruned = 1 THEN n_rows ELSE 0 END)
           |    * 1000000 // SUM(n_rows) AS BIGINT) AS skip_ppm,
           |  CAST(SUM(n_matched) AS BIGINT) AS n_matched
           |FROM (SELECT chunk, COUNT(*) AS n_rows,
           |    SUM(CASE WHEN d >= $ProbeLoDay AND d < $ProbeHiDay
           |      THEN 1 ELSE 0 END) AS n_matched,
           |    CASE WHEN MAX(d) < $ProbeLoDay
           |      OR MIN(d) >= $ProbeHiDay THEN 1 ELSE 0 END AS pruned
           |  FROM (SELECT $chunk AS chunk, d FROM b) GROUP BY 1)""".stripMargin
      s"""WITH b AS (SELECT l_orderkey, l_linenumber,
         |    CAST(date_diff('day', DATE '1992-01-01',
         |      CAST(l_shipdate AS DATE)) AS BIGINT) AS d
         |  FROM lineitem)
         |${lay("date_ranged", s"d // $SkipDateChunkDays")}
         |UNION ALL
         |${lay("orderkey_ranged", s"l_orderkey // $SkipKeyChunkWidth")}
         |UNION ALL
         |${lay("hash_scattered", s"$h % $SkipHashBuckets")}""".stripMargin
    },

    "queue_wait_audit" -> QueueWaitSql,

    "stream_queue_parity" -> QueueWaitSql,

    "bot_detection" -> {
      import graft.operators.Temporal.{BotMaxPerMinute, BotMinEvents}
      s"""WITH $CL,
         |g AS (SELECT user_id, epoch_s,
         |    epoch_s - LAG(epoch_s) OVER (PARTITION BY user_id
         |      ORDER BY ems, event_id) AS g
         |  FROM cl),
         |u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(COUNT(g) AS BIGINT) AS n_gaps,
         |    CAST(COALESCE(SUM(g), 0) AS BIGINT) AS sum_g,
         |    CAST(COALESCE(SUM(g * g), 0) AS BIGINT) AS sum_g2,
         |    CAST(MAX(epoch_s) - MIN(epoch_s) AS BIGINT) AS span_s
         |  FROM g GROUP BY 1),
         |v AS (SELECT n, CASE
         |    WHEN n >= $BotMinEvents AND sum_g > 0
         |      AND n_gaps * sum_g2 * 100 < sum_g * sum_g * 101
         |      THEN 'REGULAR'
         |    WHEN n >= $BotMinEvents
         |      AND n * 60 > span_s * $BotMaxPerMinute THEN 'RATE'
         |    ELSE 'HUMAN' END AS verdict FROM u)
         |SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_users,
         |  CAST(SUM(n) AS BIGINT) AS n_events
         |FROM v GROUP BY 1""".stripMargin
    },

    // heavy dense-grid self-join: keep the re-settable soft bounds.
    // The session-wide bounds (incl. the ONLY temp_directory SET) are
    // attached structurally to keys.min when [[sql]] is derived from
    // this map — NOT pinned to any one query — so an earlier-sorting
    // insertion can never strand the session unbounded (the round-9
    // access_export regression).
    "acf_profile" -> {
      import graft.operators.Temporal.{AcfBucketMs, AcfLags}
      val lagCtes = AcfLags.map { l =>
        s"""s$l AS (SELECT CAST($l AS BIGINT) AS lag_m,
           |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |    CAST(COALESCE(SUM(a.x), 0) AS BIGINT) AS sx,
           |    CAST(COALESCE(SUM(bb.x), 0) AS BIGINT) AS sy,
           |    CAST(COALESCE(SUM(a.x * bb.x), 0) AS BIGINT) AS sxy,
           |    CAST(COALESCE(SUM(a.x * a.x), 0) AS BIGINT) AS sxx,
           |    CAST(COALESCE(SUM(bb.x * bb.x), 0) AS BIGINT) AS syy
           |  FROM dense a JOIN dense bb ON bb.bucket = a.bucket + $l)""".stripMargin
      }.mkString(",\n")
      val lagUnion = AcfLags.map(l => s"SELECT * FROM s$l")
        .mkString("\n  UNION ALL ")
      s"""${DuckSoftBounds}WITH $CL,
         |c AS (SELECT ems // $AcfBucketMs AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS cnt FROM cl GROUP BY 1),
         |grid AS (SELECT UNNEST(generate_series(
         |    (SELECT MIN(bucket) FROM c),
         |    (SELECT MAX(bucket) FROM c))) AS bucket),
         |dense AS (SELECT g.bucket, COALESCE(c.cnt, 0) AS x
         |  FROM grid g LEFT JOIN c USING (bucket)),
         |$lagCtes,
         |lh AS (SELECT lag_m, n_pairs,
         |    CAST(n_pairs AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS vx,
         |    CAST(n_pairs AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS vy,
         |    CAST(n_pairs AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS cov
         |  FROM ($lagUnion))
         |SELECT lag_m, n_pairs,
         |  CASE WHEN vx > 0 AND vy > 0
         |    THEN CAST(ROUND(CAST(cov AS DOUBLE) /
         |      (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE)))
         |      * 1000000) AS BIGINT)
         |    ELSE 0 END AS acf_e6
         |FROM lh""".stripMargin
    },

    "fano_burstiness" -> {
      import graft.operators.Temporal.{FanoBandE6, FanoWindowMs}
      s"""WITH $CL,
         |w AS (SELECT user_id, ems // $FanoWindowMs AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS c FROM cl GROUP BY 1, 2),
         |u AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
         |    CAST(SUM(c * c) AS BIGINT) AS scc,
         |    CAST(MAX(bucket) - MIN(bucket) + 1 AS BIGINT) AS n_windows
         |  FROM w GROUP BY 1),
         |f AS (SELECT user_id, n_events, n_windows,
         |    (n_windows * scc - n_events * n_events) * 1000000
         |      // (n_windows * n_events) AS fano_e6 FROM u)
         |SELECT user_id, n_events, n_windows, fano_e6,
         |  CASE WHEN fano_e6 > ${1000000L + FanoBandE6} THEN 'BURSTY'
         |       WHEN fano_e6 < ${1000000L - FanoBandE6} THEN 'REGULAR'
         |       ELSE 'POISSON_LIKE' END AS cadence
         |FROM f""".stripMargin
    },

    "watermark_sweep" -> {
      import graft.operators.Temporal.WmSweepMs
      val arms = WmSweepMs.map { d =>
        s"""SELECT CAST($d AS BIGINT) AS allowed_ms,
           |  CAST(SUM(CASE WHEN late_ms > $d THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_dropped,
           |  CAST(COALESCE(MAX(CASE WHEN late_ms > $d
           |    THEN late_ms - $d END), 0) AS BIGINT) AS max_overshoot_ms
           |FROM lt""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $CL,
         |w AS (SELECT ems, MAX(ems) OVER (PARTITION BY part
         |    ORDER BY event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
         |  FROM cl),
         |lt AS (SELECT CASE WHEN ems < wm THEN wm - ems ELSE 0 END
         |    AS late_ms FROM w),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_events FROM lt),
         |u AS ($arms)
         |SELECT allowed_ms, n_events, n_dropped,
         |  n_dropped * 1000000 // n_events AS drop_ppm,
         |  max_overshoot_ms
         |FROM u, tot""".stripMargin
    },

    "sequence_gap_audit" -> SeqGapSql,

    // the streaming id-continuity lane replays into the SAME oracle
    // text — one total order, zero room for twin drift
    "stream_gap_parity" -> SeqGapSql,

    "view_refresh_plan" -> {
      val mod = graft.operators.CdcMerge.ViewDeltaMod
      val h = sqlPhash("CAST(l_orderkey AS VARCHAR) || ':' || " +
        "CAST(l_linenumber AS VARCHAR)")
      s"""WITH t AS (SELECT l_orderkey,
         |    CAST(COUNT(*) AS BIGINT) AS n_touched_items
         |  FROM lineitem
         |  WHERE $h % $mod = 0
         |  GROUP BY 1)
         |SELECT o.o_orderpriority,
         |  CAST(COUNT(*) AS BIGINT) AS n_view_rows,
         |  CAST(COUNT(t.l_orderkey) AS BIGINT) AS n_affected,
         |  CAST(COALESCE(SUM(t.n_touched_items), 0) AS BIGINT)
         |    AS n_touched_items,
         |  CAST(COUNT(t.l_orderkey) * 1000000 // COUNT(*) AS BIGINT)
         |    AS refresh_ppm
         |FROM orders o LEFT JOIN t ON o.o_orderkey = t.l_orderkey
         |GROUP BY 1""".stripMargin
    },

    "seasonal_anomaly" ->
      s"""WITH $CL,
         |c AS (SELECT ems // 3600000 AS h, CAST(COUNT(*) AS BIGINT)
         |    AS n FROM cl GROUP BY 1),
         |grid AS (SELECT UNNEST(generate_series((SELECT MIN(h) FROM c),
         |    (SELECT MAX(h) FROM c))) AS h),
         |dense AS (SELECT g.h, COALESCE(c.n, 0) AS n
         |  FROM grid g LEFT JOIN c USING (h)),
         |s AS (SELECT h, h % 168 AS slot, CAST(n AS BIGINT) AS n,
         |    CAST(SUM(n) OVER (PARTITION BY h % 168) AS BIGINT)
         |      AS slot_sum,
         |    CAST(COUNT(*) OVER (PARTITION BY h % 168) AS BIGINT)
         |      AS slot_cnt
         |  FROM dense)
         |SELECT h, slot, n,
         |  CAST(slot_sum * 1000 // slot_cnt AS BIGINT)
         |    AS baseline_milli,
         |  CASE WHEN n * slot_cnt > slot_sum * 2 THEN 'SPIKE'
         |       WHEN n * slot_cnt * 2 < slot_sum THEN 'QUIET'
         |       ELSE 'NORMAL' END AS status
         |FROM s""".stripMargin,

    "kmeans_stability" -> {
      import graft.operators.Similarity.{AltSeedBase, QueryCount}
      def assignCte(name: String, seedCte: String): String =
        s"""$name AS (SELECT vec_id, centroid_id FROM (
           |    SELECT ve.vec_id, $seedCte.centroid_id,
           |      ROW_NUMBER() OVER (PARTITION BY ve.vec_id ORDER BY
           |        list_sum(list_transform(generate_series(1,
           |          len(ve.v6)), i -> (ve.v6[i] - $seedCte.c6[i]) *
           |          (ve.v6[i] - $seedCte.c6[i]))), centroid_id) AS rn
           |    FROM ve, $seedCte) t WHERE rn = 1)""".stripMargin
      s"""WITH ve AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS v6
         |  FROM embeddings WHERE vec_id >= $QueryCount),
         |sa AS (SELECT vec_id - $QueryCount AS centroid_id, v6 AS c6
         |  FROM ve WHERE vec_id BETWEEN $QueryCount
         |    AND ${QueryCount + 15}),
         |sb AS (SELECT vec_id - $AltSeedBase AS centroid_id, v6 AS c6
         |  FROM ve WHERE vec_id BETWEEN $AltSeedBase
         |    AND ${AltSeedBase + 15}),
         |${assignCte("aa", "sa")},
         |${assignCte("ab", "sb")},
         |cells AS (SELECT aa.centroid_id AS ca, ab.centroid_id AS cb,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM aa JOIN ab USING (vec_id) GROUP BY 1, 2),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_vecs,
         |    CAST(COUNT(*) AS BIGINT) AS n_cells,
         |    CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS s_cells
         |  FROM cells),
         |ra AS (SELECT CAST(SUM(na * (na - 1) // 2) AS BIGINT) AS s_a
         |  FROM (SELECT CAST(SUM(n) AS BIGINT) AS na FROM cells
         |        GROUP BY ca)),
         |rb AS (SELECT CAST(SUM(nb * (nb - 1) // 2) AS BIGINT) AS s_b
         |  FROM (SELECT CAST(SUM(n) AS BIGINT) AS nb FROM cells
         |        GROUP BY cb))
         |SELECT n_vecs, n_cells,
         |  CAST((n_vecs * (n_vecs - 1) // 2 - s_a - s_b + 2 * s_cells)
         |    * 1000 // (n_vecs * (n_vecs - 1) // 2) AS BIGINT)
         |    AS rand_milli
         |FROM tot, ra, rb""".stripMargin
    },

    "value_concentration" -> {
      val pcts = graft.operators.Ledger.ConcentrationPcts
        .mkString("[", ", ", "]")
      s"""WITH $CL,
         |u AS (SELECT op, user_id, CAST(SUM(value_cents) AS BIGINT)
         |    AS user_total FROM cl GROUP BY 1, 2),
         |g AS (SELECT op, user_total, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM u GROUP BY 1, 2),
         |r AS (SELECT op, user_total, c,
         |    CAST(SUM(c) OVER (PARTITION BY op ORDER BY user_total DESC)
         |      AS BIGINT) AS cum_users,
         |    CAST(SUM(user_total * c) OVER (PARTITION BY op
         |      ORDER BY user_total DESC) AS BIGINT) AS cum_mass,
         |    CAST(SUM(c) OVER (PARTITION BY op) AS BIGINT) AS n_users,
         |    CAST(SUM(user_total * c) OVER (PARTITION BY op) AS BIGINT)
         |      AS total_mass
         |  FROM g),
         |x AS (SELECT r.*, CAST(p.pct AS BIGINT) AS pct
         |  FROM r, UNNEST($pcts) AS p(pct)
         |  WHERE cum_users * 100 >= n_users * pct),
         |sel AS (SELECT op, pct, cum_users AS n_top_users, n_users,
         |    cum_mass, total_mass,
         |    ROW_NUMBER() OVER (PARTITION BY op, pct
         |      ORDER BY cum_users) AS rn FROM x)
         |SELECT op, pct, n_top_users, n_users,
         |  CAST(cum_mass * 1000000 // total_mass AS BIGINT)
         |    AS value_share_ppm
         |FROM sel WHERE rn = 1""".stripMargin
    },

    "slo_burn" -> {
      val b = graft.operators.Ledger.SloBudgetPpm
      s"""WITH $CL,
         |c AS (SELECT ems // 3600000 AS h, CAST(COUNT(*) AS BIGINT)
         |      AS tot,
         |    CAST(SUM(CASE WHEN op = 'D' AND event_id % 5 = 4
         |      THEN 1 ELSE 0 END) AS BIGINT) AS err
         |  FROM cl GROUP BY 1),
         |grid AS (SELECT UNNEST(generate_series((SELECT MIN(h) FROM c),
         |    (SELECT MAX(h) FROM c))) AS h),
         |dense AS (SELECT g.h, COALESCE(c.tot, 0) AS tot,
         |    COALESCE(c.err, 0) AS err
         |  FROM grid g LEFT JOIN c USING (h)),
         |wnd AS (SELECT h, tot AS tot_1h, err AS err_1h,
         |    CAST(SUM(err) OVER w6 AS BIGINT) AS err_6h,
         |    CAST(SUM(tot) OVER w6 AS BIGINT) AS tot_6h,
         |    CAST(SUM(err) OVER w24 AS BIGINT) AS err_24h,
         |    CAST(SUM(tot) OVER w24 AS BIGINT) AS tot_24h,
         |    CAST(COUNT(*) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS age
         |  FROM dense WINDOW
         |    w6 AS (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
         |    w24 AS (ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT
         |      ROW)),
         |bb AS (SELECT *,
         |    CAST(err_1h * 1000 // GREATEST(1, tot_1h * $b // 1000000)
         |      AS BIGINT) AS burn_1h_milli,
         |    CAST(err_6h * 1000 // GREATEST(1, tot_6h * $b // 1000000)
         |      AS BIGINT) AS burn_6h_milli,
         |    CAST(err_24h * 1000 // GREATEST(1, tot_24h * $b // 1000000)
         |      AS BIGINT) AS burn_24h_milli
         |  FROM wnd)
         |SELECT h, tot_1h, err_1h, burn_1h_milli, burn_6h_milli,
         |  burn_24h_milli,
         |  CASE WHEN age < 24 THEN 'WARMUP'
         |       WHEN tot_24h < ${graft.operators.Ledger.SloMinSample}
         |         THEN 'LOW_TRAFFIC'
         |       WHEN burn_1h_milli > 14400 AND burn_6h_milli > 6000
         |         THEN 'PAGE'
         |       WHEN burn_6h_milli > 6000 OR burn_24h_milli > 3000
         |         THEN 'TICKET'
         |       ELSE 'OK' END AS verdict
         |FROM bb""".stripMargin
    },

    "migration_plan" -> {
      val tables = graft.operators.Snapshot.DesiredSchema
        .map(_._1).distinct
      val live = tables.map(t =>
        s"""SELECT '$t' AS table_name, column_name, column_type
           |  FROM (DESCRIBE SELECT * FROM $t)""".stripMargin)
        .mkString("\n  UNION ALL ")
      val des = graft.operators.Snapshot.DesiredSchema
        .map { case (t, c, ty) => s"('$t', '$c', '$ty')" }
        .mkString(",\n    ")
      s"""WITH live AS ($live),
         |lm AS (SELECT table_name, column_name,
         |    CASE column_type WHEN 'BIGINT' THEN 'bigint'
         |      WHEN 'INTEGER' THEN 'int' WHEN 'DOUBLE' THEN 'double'
         |      WHEN 'VARCHAR' THEN 'string'
         |      WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
         |      WHEN 'FLOAT[]' THEN 'array<float>'
         |      ELSE lower(column_type) END AS current_type
         |  FROM live),
         |des(table_name, column_name, desired_type) AS (VALUES
         |    $des),
         |j AS (SELECT COALESCE(lm.table_name, des.table_name)
         |      AS table_name,
         |    COALESCE(lm.column_name, des.column_name) AS column_name,
         |    lm.current_type, des.desired_type
         |  FROM lm FULL OUTER JOIN des
         |    ON lm.table_name = des.table_name
         |    AND lm.column_name = des.column_name)
         |SELECT table_name, column_name,
         |  COALESCE(current_type, '-') AS current_type,
         |  COALESCE(desired_type, '-') AS desired_type,
         |  CASE WHEN current_type IS NULL THEN 'ADD'
         |       WHEN desired_type IS NULL THEN 'DROP'
         |       WHEN current_type <> desired_type THEN 'CAST'
         |       ELSE 'OK' END AS action,
         |  CASE WHEN current_type IS NULL THEN 'ALTER TABLE ' ||
         |      table_name || ' ADD COLUMN ' || column_name || ' ' ||
         |      desired_type
         |    WHEN desired_type IS NULL THEN 'ALTER TABLE ' ||
         |      table_name || ' DROP COLUMN ' || column_name
         |    WHEN current_type <> desired_type THEN 'ALTER TABLE ' ||
         |      table_name || ' ALTER COLUMN ' || column_name ||
         |      ' TYPE ' || desired_type
         |    ELSE '-' END AS ddl
         |FROM j""".stripMargin
    },

    "ring_rebalance" -> {
      val ta = graft.operators.TextAnalysis
      val vals = ta.ringEnc(ta.RingNodes + 1).map(e => s"($e)")
        .mkString(", ")
      s"""WITH ring(enc) AS (VALUES $vals),
         |k AS (SELECT doc_id,
         |    (CAST(concat('0x', substr(md5('key:' ||
         |      CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |      % ${ta.RingMask + 1}) * 16 + 15 AS khe
         |  FROM documents),
         |s AS (SELECT doc_id,
         |    COALESCE(MIN(CASE WHEN enc % 16 < ${ta.RingNodes}
         |        AND enc > khe THEN enc END),
         |      MIN(CASE WHEN enc % 16 < ${ta.RingNodes} THEN enc END))
         |      % 16 AS n8,
         |    COALESCE(MIN(CASE WHEN enc > khe THEN enc END), MIN(enc))
         |      % 16 AS n9
         |  FROM k CROSS JOIN ring GROUP BY doc_id, khe),
         |b AS (SELECT n8 AS node, CAST(COUNT(*) AS BIGINT) AS n_before,
         |    CAST(SUM(CASE WHEN n9 <> n8 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS moved_out
         |  FROM s GROUP BY 1),
         |a AS (SELECT n9 AS node, CAST(COUNT(*) AS BIGINT) AS n_after
         |  FROM s GROUP BY 1),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM s)
         |SELECT COALESCE(b.node, a.node) AS node,
         |  COALESCE(n_before, CAST(0 AS BIGINT)) AS n_before,
         |  COALESCE(moved_out, CAST(0 AS BIGINT)) AS moved_out,
         |  COALESCE(n_after, CAST(0 AS BIGINT)) AS n_after,
         |  COALESCE(n_after, CAST(0 AS BIGINT)) * 1000000 // total
         |    AS after_share_ppm
         |FROM b FULL JOIN a ON b.node = a.node CROSS JOIN t""".stripMargin
    },

    "discount_qty_corr" ->
      """WITH s AS (SELECT p.p_type,
        |    CAST(ROUND(l.l_discount*10000) AS BIGINT) AS x,
        |    CAST(ROUND(l.l_quantity*100) AS BIGINT) AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |g AS (SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x*y) AS BIGINT) AS sxy,
        |    CAST(SUM(x*x) AS BIGINT) AS sxx,
        |    CAST(SUM(y*y) AS BIGINT) AS syy
        |  FROM s GROUP BY 1),
        |h AS (SELECT p_type, n,
        |    CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS vx,
        |    CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS vy,
        |    CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS cov
        |  FROM g)
        |SELECT p_type, n,
        |  CASE WHEN vx > 0 AND vy > 0
        |    THEN CAST(ROUND(CAST(cov AS DOUBLE) /
        |      (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE)))
        |      * 1000000) AS BIGINT)
        |    ELSE 0 END AS corr_e6
        |FROM h""".stripMargin,

    "forget_audit" -> {
      val m = graft.operators.Snapshot.ForgetMod
      s"""WITH $CL,
         |fc AS (SELECT c_custkey AS k FROM customer
         |  WHERE c_custkey % $m = 0),
         |fo AS (SELECT o_orderkey FROM orders
         |  WHERE EXISTS (SELECT 1 FROM fc WHERE fc.k = orders.o_custkey))
         |SELECT 'events' AS relation, CAST(COUNT(*) AS BIGINT)
         |    AS n_rows_to_purge
         |  FROM cl WHERE EXISTS (SELECT 1 FROM fc WHERE fc.k = cl.user_id)
         |UNION ALL
         |SELECT 'customer', CAST(COUNT(*) AS BIGINT) FROM fc
         |UNION ALL
         |SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM fo
         |UNION ALL
         |SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem
         |  WHERE EXISTS (SELECT 1 FROM fo
         |    WHERE fo.o_orderkey = lineitem.l_orderkey)""".stripMargin
    },

    "lsh_band_sweep" -> {
      import graft.functions.PortableHash.sqlBandKey
      val configCtes = Dedup.BandSweep.map { case (b, r) =>
        val arms = (0 until b).map { i =>
          s"WHEN $i THEN ${sqlBandKey((0 until r).map(j => s"m${i * r + j}"))}"
        }.mkString(" ")
        s"""bd$b AS (SELECT doc_id, n, bb.j AS band, CASE bb.j $arms END AS sig
           |  FROM sigs, UNNEST(generate_series(0, ${b - 1})) AS bb(j)),
           |bn$b AS (SELECT band, sig, COUNT(*) AS cnt, MIN(doc_id) AS keeper
           |  FROM bd$b GROUP BY 1, 2 HAVING COUNT(*) > 1),
           |pr$b AS (
           |  SELECT a.doc_id AS doc_a, a.n AS na, b.doc_id AS doc_b, b.n AS nb
           |  FROM bn$b JOIN bd$b a USING (band, sig)
           |  JOIN bd$b b USING (band, sig)
           |  WHERE bn$b.cnt <= ${Dedup.MaxQuadraticBucket}
           |    AND a.doc_id < b.doc_id
           |  UNION
           |  SELECT bn$b.keeper, k.n, b.doc_id, b.n
           |  FROM bn$b JOIN bd$b b USING (band, sig)
           |  JOIN bd$b k ON k.band = bn$b.band AND k.sig = bn$b.sig
           |    AND k.doc_id = bn$b.keeper
           |  WHERE bn$b.cnt > ${Dedup.MaxQuadraticBucket}
           |    AND b.doc_id <> bn$b.keeper)""".stripMargin
      }.mkString(",\n")
      val unioned = Dedup.BandSweep.map { case (b, r) =>
        s"SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT)" +
          s" AS rows_per_band, doc_a, na, doc_b, nb FROM pr$b"
      }.mkString(" UNION ALL ")
      s"""WITH $ShingleCtes,
         |sigs AS (SELECT doc_id, $mins, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM sh GROUP BY doc_id),
         |$configCtes,
         |allp AS ($unioned),
         |up AS (SELECT DISTINCT doc_a, na, doc_b, nb FROM allp),
         |it2 AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS c
         |  FROM up p
         |  JOIN sh s1 ON s1.doc_id = p.doc_a
         |  JOIN sh s2 ON s2.doc_id = p.doc_b AND s2.h = s1.h
         |  GROUP BY 1, 2),
         |tr AS (SELECT p.doc_a, p.doc_b FROM up p
         |  LEFT JOIN it2 ON p.doc_a = it2.doc_a AND p.doc_b = it2.doc_b
         |  WHERE (COALESCE(it2.c, 0) * 1000)
         |    // (p.na + p.nb - COALESCE(it2.c, 0)) >= ${Dedup.JaccardMilli})
         |SELECT allp.bands, allp.rows_per_band,
         |  CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |  CAST(COUNT(tr.doc_a) AS BIGINT) AS n_dups_captured
         |FROM allp LEFT JOIN tr
         |  ON allp.doc_a = tr.doc_a AND allp.doc_b = tr.doc_b
         |GROUP BY 1, 2""".stripMargin
    },

    "conversion_lag" ->
      """WITH cvs AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN epoch_ns(ts) END)
        |      AS ts_su,
        |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END)
        |      AS ts_pu
        |  FROM events GROUP BY 1),
        |cvl AS (SELECT (ts_pu - ts_su) // 1000000000 AS lag_s
        |  FROM cvs WHERE ts_pu > ts_su)
        |SELECT CASE WHEN lag_s > 0
        |    THEN CAST(length(format('{:b}', lag_s)) AS BIGINT)
        |    ELSE 0 END AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  MIN(lag_s) AS min_lag_s, MAX(lag_s) AS max_lag_s
        |FROM cvl GROUP BY 1""".stripMargin,

    "session_quantiles" ->
      s"""WITH $CL,
         |sg AS (SELECT user_id, event_id, ems,
         |  ems - LAG(ems, 1) OVER (PARTITION BY user_id
         |    ORDER BY ems, event_id) AS gap_ms
         |  FROM cl),
         |ss AS (SELECT user_id, ems,
         |  SUM(CASE WHEN gap_ms IS NULL OR gap_ms > 1800000
         |    THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY user_id ORDER BY ems, event_id) AS session_id
         |  FROM sg),
         |sd AS (SELECT MAX(ems) - MIN(ems) AS duration_ms
         |  FROM ss GROUP BY user_id, session_id),
         |dc AS (SELECT duration_ms, COUNT(*) AS c FROM sd GROUP BY 1),
         |cc AS (SELECT duration_ms,
         |  SUM(c) OVER (ORDER BY duration_ms) AS cum,
         |  SUM(c) OVER () AS cnt FROM dc)
         |SELECT CAST(p.p AS BIGINT) AS pct,
         |  MIN(duration_ms) AS q_ms, CAST(MAX(cnt) AS BIGINT) AS n_sessions
         |FROM cc, UNNEST([25, 50, 75, 90]) AS p(p)
         |WHERE cum >= (cnt * p.p + 99) // 100
         |GROUP BY 1""".stripMargin,

    "active_users" ->
      s"""${DuckSoftBounds}WITH $CL,
         |auw AS (SELECT DISTINCT user_id,
         |    ems // ${7L * 86400L * 1000L} AS week FROM cl),
         |wau AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS wau
         |  FROM auw GROUP BY 1),
         |rolled AS (SELECT DISTINCT user_id, week + o.d AS week
         |  FROM auw, UNNEST(generate_series(0, 3)) AS o(d)),
         |mau AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS mau4
         |  FROM rolled GROUP BY 1)
         |SELECT wau.week, wau.wau, mau.mau4,
         |  (wau.wau * 1000000) // mau.mau4 AS stickiness_ppm
         |FROM wau JOIN mau USING (week)""".stripMargin,

    "olap_q6_discount" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
        |    AS BIGINT)), 0) AS BIGINT) AS discount_rev_c
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    // int8 symmetric-dot top-k vs exact cosine truth; the int8 ranking
    // is integer arithmetic end-to-end (bit-identical cross-engine)
    "sq_recall" -> {
      val k = graft.operators.Similarity.TopK
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |i8 AS (SELECT vec_id, list_transform(v,
         |    x -> CAST(ROUND(GREATEST(LEAST(x, 1.0), -1.0) * 127)
         |      AS BIGINT)) AS qv FROM e),
         |q AS (SELECT vec_id AS q_id, qv FROM i8 WHERE vec_id < 8),
         |c AS (SELECT vec_id AS cand_id, qv AS cv FROM i8
         |  WHERE vec_id >= 8),
         |approx AS (SELECT q_id, cand_id FROM (
         |  SELECT q.q_id, c.cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.q_id
         |      ORDER BY list_sum(list_transform(
         |        list_zip(q.qv, c.cv), p -> p[1] * p[2])) DESC,
         |        c.cand_id) AS rn
         |  FROM q, c) t WHERE rn <= $k),
         |tq AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
         |tc AS (SELECT vec_id AS cand_id, v AS cv FROM e
         |  WHERE vec_id >= 8),
         |truth AS (SELECT q_id, cand_id FROM (
         |  SELECT tq.q_id, tc.cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY tq.q_id
         |      ORDER BY list_cosine_similarity(qv, cv) DESC, cand_id)
         |      AS rn
         |  FROM tq, tc) t WHERE rn <= $k),
         |h AS (SELECT truth.q_id, CAST(COUNT(approx.cand_id) AS BIGINT)
         |    AS n_hits
         |  FROM truth LEFT JOIN approx
         |    ON truth.q_id = approx.q_id AND truth.cand_id = approx.cand_id
         |  GROUP BY 1)
         |SELECT q_id, n_hits, (n_hits * 1000) // $k AS recall_milli
         |FROM h""".stripMargin
    },

    // JL signed-random-projection recall: the ±1 sign matrix is the
    // SAME phash-derived literal the Spark expression embeds
    "rp_recall" -> {
      val k = graft.operators.Similarity.TopK
      val signs = graft.operators.Similarity.rpSigns
        .map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |p AS (SELECT vec_id, list_transform($signs,
         |    row -> list_sum(list_transform(list_zip(row,
         |      list_transform(v, x -> CAST(ROUND(x * 1000000) AS BIGINT))),
         |      pr -> pr[1] * pr[2]))) AS y FROM e),
         |q AS (SELECT vec_id AS q_id, y AS yq FROM p WHERE vec_id < 8),
         |c AS (SELECT vec_id AS cand_id, y AS yc FROM p
         |  WHERE vec_id >= 8),
         |approx AS (SELECT q_id, cand_id FROM (
         |  SELECT q.q_id, c.cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.q_id
         |      ORDER BY list_sum(list_transform(
         |        list_zip(q.yq, c.yc), pr -> pr[1] * pr[2])) DESC,
         |        c.cand_id) AS rn
         |  FROM q, c) t WHERE rn <= $k),
         |tq AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
         |tc AS (SELECT vec_id AS cand_id, v AS cv FROM e
         |  WHERE vec_id >= 8),
         |truth AS (SELECT q_id, cand_id FROM (
         |  SELECT tq.q_id, tc.cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY tq.q_id
         |      ORDER BY list_cosine_similarity(qv, cv) DESC, cand_id)
         |      AS rn
         |  FROM tq, tc) t WHERE rn <= $k),
         |h AS (SELECT truth.q_id, CAST(COUNT(approx.cand_id) AS BIGINT)
         |    AS n_hits
         |  FROM truth LEFT JOIN approx
         |    ON truth.q_id = approx.q_id AND truth.cand_id = approx.cand_id
         |  GROUP BY 1)
         |SELECT q_id, n_hits, (n_hits * 1000) // $k AS recall_milli
         |FROM h""".stripMargin
    },

    // matryoshka prefix-dim int8 ranking per dims arm; generated from
    // the same MrlDims constant the Spark curve iterates
    "mrl_recall" -> {
      val k = graft.operators.Similarity.TopK
      val arms = graft.operators.Similarity.MrlDims.map { d =>
        s"""  SELECT CAST($d AS BIGINT) AS dims, q_id, cand_id FROM (
           |    SELECT q.q_id, c.cand_id,
           |      ROW_NUMBER() OVER (PARTITION BY q.q_id
           |        ORDER BY list_sum(list_transform(
           |          list_zip(q.qv[1:$d], c.cv[1:$d]), p -> p[1] * p[2]))
           |          DESC, c.cand_id) AS rn
           |    FROM q, c) t WHERE rn <= $k""".stripMargin
      }.mkString("\nUNION ALL\n")
      val dimRows = graft.operators.Similarity.MrlDims
        .map(d => s"($d)").mkString(", ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |i8 AS (SELECT vec_id, list_transform(v,
         |    x -> CAST(ROUND(GREATEST(LEAST(x, 1.0), -1.0) * 127)
         |      AS BIGINT)) AS w FROM e),
         |q AS (SELECT vec_id AS q_id, w AS qv FROM i8 WHERE vec_id < 8),
         |c AS (SELECT vec_id AS cand_id, w AS cv FROM i8
         |  WHERE vec_id >= 8),
         |approx AS (
         |$arms),
         |tq AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
         |tc AS (SELECT vec_id AS cand_id, v AS cv FROM e
         |  WHERE vec_id >= 8),
         |truth AS (SELECT q_id, cand_id FROM (
         |  SELECT tq.q_id, tc.cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY tq.q_id
         |      ORDER BY list_cosine_similarity(qv, cv) DESC, cand_id)
         |      AS rn
         |  FROM tq, tc) t WHERE rn <= $k),
         |nq AS (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_q
         |  FROM truth),
         |h AS (SELECT a.dims, CAST(COUNT(*) AS BIGINT) AS hits
         |  FROM approx a JOIN truth t
         |    ON a.q_id = t.q_id AND a.cand_id = t.cand_id
         |  GROUP BY 1)
         |SELECT CAST(dd.dims AS BIGINT) AS dims,
         |  COALESCE(h.hits, 0) AS sum_hits,
         |  (COALESCE(h.hits, 0) * 1000) // (nq.n_q * $k)
         |    AS mean_recall_milli
         |FROM (VALUES $dimRows) dd(dims)
         |LEFT JOIN h ON dd.dims = h.dims, nq""".stripMargin
    },

    // 1-bit sign quantization: hamming ranking over two packed 32-bit
    // words, then int8 re-rank of the shortlist — both arms integer
    "bq_recall" -> {
      import graft.operators.Similarity.{BqShortlist, TopK}
      def word(lo: Int): String =
        s"CAST(list_sum(list_transform(list_zip(v[${lo + 1}:${lo + 32}], " +
          "generate_series(0, 31)), p -> CASE WHEN p[1] > 0 " +
          "THEN (1::BIGINT << p[2]) ELSE 0::BIGINT END)) AS BIGINT)"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |w AS (SELECT vec_id, ${word(0)} AS lo, ${word(32)} AS hi,
         |    list_transform(v, x -> CAST(ROUND(GREATEST(LEAST(x, 1.0),
         |      -1.0) * 127) AS BIGINT)) AS i8 FROM e),
         |q AS (SELECT vec_id AS q_id, lo AS ql, hi AS qh, i8 AS qq
         |  FROM w WHERE vec_id < 8),
         |c AS (SELECT vec_id AS cand_id, lo AS cl, hi AS ch, i8 AS cq
         |  FROM w WHERE vec_id >= 8),
         |short AS (SELECT q_id, cand_id, qq, cq, rn FROM (
         |  SELECT q.q_id, c.cand_id, q.qq, c.cq,
         |    ROW_NUMBER() OVER (PARTITION BY q.q_id
         |      ORDER BY bit_count(xor(ql, cl)) + bit_count(xor(qh, ch)),
         |        c.cand_id) AS rn
         |  FROM q, c) t WHERE rn <= $BqShortlist),
         |ham AS (SELECT 'hamming' AS variant, q_id, cand_id FROM short
         |  WHERE rn <= $TopK),
         |rr AS (SELECT 'rerank' AS variant, q_id, cand_id FROM (
         |  SELECT q_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY list_sum(list_transform(list_zip(qq, cq),
         |        p -> p[1] * p[2])) DESC, cand_id) AS r2
         |  FROM short) t WHERE r2 <= $TopK),
         |approx AS (SELECT * FROM ham UNION ALL SELECT * FROM rr),
         |tq AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
         |tc AS (SELECT vec_id AS cand_id, v AS cv FROM e
         |  WHERE vec_id >= 8),
         |truth AS (SELECT q_id, cand_id FROM (
         |  SELECT tq.q_id, tc.cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY tq.q_id
         |      ORDER BY list_cosine_similarity(qv, cv) DESC, cand_id)
         |      AS rn
         |  FROM tq, tc) t WHERE rn <= $TopK),
         |nq AS (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_q
         |  FROM truth),
         |h AS (SELECT a.variant, CAST(COUNT(*) AS BIGINT) AS hits
         |  FROM approx a JOIN truth t
         |    ON a.q_id = t.q_id AND a.cand_id = t.cand_id
         |  GROUP BY 1)
         |SELECT vv.variant, COALESCE(h.hits, 0) AS sum_hits,
         |  (COALESCE(h.hits, 0) * 1000) // (nq.n_q * $TopK)
         |    AS mean_recall_milli
         |FROM (VALUES ('hamming'), ('rerank')) vv(variant)
         |LEFT JOIN h ON vv.variant = h.variant, nq""".stripMargin
    },

    "ann_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 8),
        |c AS (
        |  SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings WHERE vec_id >= 8),
        |s AS (
        |  SELECT q_id, cand_id,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY list_cosine_similarity(qv, cv) DESC, cand_id) AS rn
        |  FROM q, c)
        |SELECT q_id, cand_id, CAST(rn AS BIGINT) AS rank
        |FROM s WHERE rn <= 10""".stripMargin,

    "span_corruption" -> {
      import graft.operators.TextAnalysis.{SpanEvery, SpanLen}
      s"""WITH sct AS (SELECT doc_id, string_split(text, ' ') AS tk
         |  FROM documents),
         |scb AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
         |    list_filter(generate_series(0, len(tk) - 1),
         |      p -> ${sqlPhash("'mask:' || doc_id || ':' || p")}
         |        % $SpanEvery = 0) AS starts
         |  FROM sct),
         |scm AS (SELECT doc_id, n, starts,
         |    list_filter(generate_series(0, n - 1),
         |      p -> len(list_filter(starts,
         |        s -> p >= s AND p < s + $SpanLen)) > 0) AS masked
         |  FROM scb)
         |SELECT doc_id, n AS n_tokens,
         |  CAST(len(starts) AS BIGINT) AS n_spans,
         |  CAST(len(list_filter(masked,
         |    p -> NOT list_contains(masked, p - 1))) AS BIGINT)
         |    AS n_sentinels,
         |  CAST(len(masked) AS BIGINT) AS n_masked,
         |  (len(masked) * 1000) // n AS masked_milli
         |FROM scm""".stripMargin
    },

    "contrastive_triplets" ->
      s"""WITH $MinhashCtes,
         |ctd AS (SELECT doc_a, doc_b, j_milli FROM jac
         |  WHERE j_milli >= ${Dedup.JaccardMilli}),
         |cte_e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    CAST(label AS BIGINT) AS label FROM embeddings),
         |ctb AS (SELECT vec_id, v, label, ($bucketExpr) AS bucket
         |  FROM cte_e),
         |can AS (SELECT DISTINCT doc_a AS anchor_id FROM ctd),
         |cae AS (SELECT anchor_id, v AS av, label AS albl, bucket
         |  FROM can JOIN ctb ON anchor_id = vec_id),
         |cmate AS (SELECT doc_a AS a, doc_b AS b FROM ctd
         |  UNION SELECT doc_b, doc_a FROM ctd),
         |ccand AS (SELECT cae.anchor_id, ctb.vec_id AS negative_id,
         |    ctb.label AS neg_label,
         |    CAST(ROUND(list_cosine_similarity(cae.av, ctb.v) * 1000000)
         |      AS BIGINT) AS neg_sim_e6
         |  FROM cae JOIN ctb USING (bucket)
         |  WHERE ctb.vec_id <> cae.anchor_id AND ctb.label <> cae.albl
         |    AND NOT EXISTS (SELECT 1 FROM cmate m
         |      WHERE m.a = cae.anchor_id AND m.b = ctb.vec_id)),
         |cneg AS (SELECT anchor_id, negative_id, neg_label, neg_sim_e6
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
         |      ORDER BY neg_sim_e6 DESC, negative_id) AS rn FROM ccand) t
         |  WHERE rn = 1)
         |SELECT d.doc_a AS anchor_id, d.doc_b AS positive_id,
         |  d.j_milli AS pos_j_milli, n.negative_id, n.neg_label,
         |  n.neg_sim_e6
         |FROM ctd d JOIN cneg n ON n.anchor_id = d.doc_a""".stripMargin,

    // UniMax waterfill on the language grid — the cum-prev/candidate-
    // share/first-uncapped-level closed form, constants shared with
    // Curation.unimaxAlloc
    "unimax_alloc" -> {
      import graft.operators.Curation.{UnimaxBudgetX, UnimaxEpochCap}
      s"""WITH pl AS (SELECT lang,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |    CAST(COUNT(*) AS BIGINT) AS n_langs FROM pl),
         |g AS (SELECT pl.*, total_tokens, n_langs,
         |    n_tokens * $UnimaxEpochCap AS cap,
         |    $UnimaxBudgetX * total_tokens AS budget,
         |    CAST(ROW_NUMBER() OVER (ORDER BY n_tokens * $UnimaxEpochCap,
         |      lang) AS BIGINT) AS idx,
         |    CAST(COALESCE(SUM(n_tokens * $UnimaxEpochCap) OVER (
         |      ORDER BY n_tokens * $UnimaxEpochCap, lang
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum_prev
         |  FROM pl, t),
         |h AS (SELECT *, GREATEST((budget - cum_prev) //
         |    (n_langs - idx + 1), 0) AS cand_share FROM g),
         |i AS (SELECT *, cap <= cand_share AS capped FROM h),
         |j AS (SELECT *, MAX(CASE WHEN NOT capped THEN cand_share END)
         |    OVER () AS lvl FROM i)
         |SELECT lang, n_tokens, n_docs, cap,
         |  LEAST(cap, COALESCE(lvl, cap)) AS alloc_tokens,
         |  (LEAST(cap, COALESCE(lvl, cap)) * 1000) //
         |    GREATEST(n_tokens, 1) AS epochs_milli,
         |  CAST(capped AS VARCHAR) AS capped
         |FROM j""".stripMargin
    },

    "repeat_plan" -> {
      import graft.operators.Curation.{MaxRepeatEpochs, RepeatBudgetX,
        RepeatDecayMilli}
      val d = RepeatDecayMilli.mkString("[", ", ", "]::BIGINT[]")
      s"""WITH $GopherCtes,
         |rs AS (SELECT d.source,
         |    CAST(SUM(gq.n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN gq.keep_b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_keep
         |  FROM gq JOIN documents d USING (doc_id) GROUP BY 1),
         |rw AS (SELECT source, n_tokens,
         |    (n_keep * 1000) // n_docs AS keep_milli,
         |    (n_tokens * ((n_keep * 1000) // n_docs)) // 1000 AS weight
         |  FROM rs),
         |rt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |    CAST(SUM(weight) AS BIGINT) AS total_weight FROM rw),
         |rp AS (SELECT rw.*, total_tokens,
         |    (weight * 1000000) // GREATEST(total_weight, 1)
         |      AS share_ppm
         |  FROM rw, rt),
         |ra AS (SELECT rp.*,
         |    ($RepeatBudgetX * total_tokens // 1000000) * share_ppm +
         |    (($RepeatBudgetX * total_tokens % 1000000) * share_ppm)
         |      // 1000000 AS alloc_tokens
         |  FROM rp),
         |rb AS (SELECT *, alloc_tokens // n_tokens AS epochs_full FROM ra),
         |rc AS (SELECT *,
         |    LEAST(epochs_full, $MaxRepeatEpochs) AS epochs_sched,
         |    CASE WHEN epochs_full >= $MaxRepeatEpochs THEN 0
         |      ELSE alloc_tokens % n_tokens END AS rem_tokens,
         |    GREATEST(alloc_tokens - $MaxRepeatEpochs * n_tokens, 0)
         |      AS wasted_tokens
         |  FROM rb)
         |SELECT source, n_tokens, keep_milli, alloc_tokens,
         |  CAST(epochs_sched AS BIGINT) AS epochs_sched,
         |  CAST(rem_tokens AS BIGINT) AS rem_tokens,
         |  CAST(wasted_tokens AS BIGINT) AS wasted_tokens,
         |  CAST((COALESCE(list_sum(list_transform(
         |      generate_series(1, CAST(epochs_sched AS INT)),
         |      i -> n_tokens * ($d)[i])), 0)
         |    + CASE WHEN epochs_sched < $MaxRepeatEpochs
         |        THEN rem_tokens * ($d)[CAST(epochs_sched AS INT) + 1]
         |        ELSE 0 END) // 1000 AS BIGINT) AS effective_tokens
         |FROM rc""".stripMargin
    },

    "domain_caps" ->
      s"""WITH r AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    ${sqlPhash("'cap:' || doc_id")} AS pri
         |  FROM documents),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY pri, doc_id) AS rk FROM r)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN rk <= ${Curation.DomainCap} THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN rk > ${Curation.DomainCap} THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dropped,
         |  CAST(COALESCE(SUM(CASE WHEN rk <= ${Curation.DomainCap}
         |    THEN n_tokens END), 0) AS BIGINT) AS kept_tokens,
         |  CAST(COALESCE(SUM(CASE WHEN rk <= ${Curation.DomainCap}
         |    THEN doc_id END), 0) AS BIGINT) AS kept_id_sum
         |FROM rk GROUP BY 1""".stripMargin,

    "ccnet_buckets" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT doc_id, tk[u.i+1] AS w1, tk[u.i+2] AS w2
        |  FROM tk, UNNEST(generate_series(0, len(tk)-2)) AS u(i)),
        |pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        |  FROM bg GROUP BY 1, 2),
        |uc AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        |  FROM bg GROUP BY 1),
        |p AS (SELECT bg.doc_id, (pc.c2 * 1000000) // uc.c1 AS p_ppm
        |  FROM bg JOIN pc USING (w1, w2) JOIN uc USING (w1)),
        |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(p_ppm) AS BIGINT) // COUNT(*) AS mean_p_ppm
        |  FROM p GROUP BY doc_id),
        |s AS (SELECT sc.*, d.lang FROM sc JOIN documents d USING (doc_id)),
        |dist AS (SELECT lang, mean_p_ppm, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM s GROUP BY 1, 2),
        |cum AS (SELECT lang, mean_p_ppm,
        |    SUM(cnt) OVER (PARTITION BY lang ORDER BY mean_p_ppm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crank
        |  FROM dist),
        |tot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM s GROUP BY 1),
        |th AS (SELECT lang,
        |    MIN(CASE WHEN crank * 3 >= n THEN mean_p_ppm END) AS t33,
        |    MIN(CASE WHEN crank * 3 >= 2 * n THEN mean_p_ppm END) AS t67
        |  FROM cum JOIN tot USING (lang) GROUP BY 1),
        |b AS (SELECT s.lang, n_bigrams, mean_p_ppm,
        |    CASE WHEN mean_p_ppm < t33 THEN 'tail'
        |         WHEN mean_p_ppm < t67 THEN 'middle'
        |         ELSE 'head' END AS bucket
        |  FROM s JOIN th USING (lang))
        |SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams,
        |  MIN(mean_p_ppm) AS min_p_ppm, MAX(mean_p_ppm) AS max_p_ppm
        |FROM b GROUP BY 1, 2""".stripMargin,

    "dsir_weights" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk
         |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
         |bg AS (SELECT doc_id, tk[u.i+1] AS w1, tk[u.i+2] AS w2
         |  FROM tk, UNNEST(generate_series(0, len(tk)-2)) AS u(i)),
         |f AS (SELECT bg.doc_id,
         |    ${sqlPhash("'dsir:' || w1 || ' ' || w2")}
         |      % ${Curation.DsirBuckets} AS f, d.source
         |  FROM bg JOIN documents d USING (doc_id)),
         |raw AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS cr
         |  FROM f GROUP BY 1),
         |tgt AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS ct
         |  FROM f WHERE source = '${TextAnalysis.EvalSource}' GROUP BY 1),
         |r0 AS (SELECT raw.f, cr, COALESCE(ct, 0) AS ct
         |  FROM raw LEFT JOIN tgt USING (f)),
         |tots AS (SELECT CAST(SUM(cr) AS BIGINT) AS tot_r,
         |    CAST(SUM(ct) AS BIGINT) AS tot_t FROM r0),
         |rt AS (SELECT f,
         |    ((ct + 1) * 1000000 // (cr + 1)) *
         |    ((tot_r + ${Curation.DsirBuckets}) * 1000
         |      // (tot_t + ${Curation.DsirBuckets})) // 1000 AS r_ppm
         |  FROM r0, tots)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(r_ppm - 1000000) AS BIGINT) AS net_ppm,
         |  CAST(SUM(r_ppm) AS BIGINT) // COUNT(*) AS mean_r_ppm
         |FROM f JOIN rt USING (f) GROUP BY 1""".stripMargin,

    "token_fertility" ->
      """WITH t AS (SELECT d.lang, d.source, t.t
        |  FROM documents d, UNNEST(string_split(text, ' ')) AS t(t)),
        |tok AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(DISTINCT t) AS BIGINT) AS n_types
        |  FROM t GROUP BY 1, 2),
        |dc AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY 1, 2)
        |SELECT lang, source, n_docs, n_tokens, n_types,
        |  (sum_chars * 1000) // n_tokens AS chars_per_token_milli,
        |  (n_types * 1000) // n_tokens AS ttr_milli,
        |  n_tokens // n_docs AS tokens_per_doc
        |FROM dc JOIN tok USING (lang, source)""".stripMargin,

    "late_data_audit" ->
      s"""WITH $CL,
         |w AS (SELECT part, ems,
         |    MAX(ems) OVER (PARTITION BY part ORDER BY event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
         |  FROM cl)
         |SELECT part, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(SUM(CASE WHEN ems < wm THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_late,
         |  CAST(SUM(CASE WHEN ems < wm - ${Temporal.AllowedLatenessMs}
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(COALESCE(MAX(CASE WHEN ems < wm THEN wm - ems END), 0)
         |    AS BIGINT) AS max_lateness_ms
         |FROM w GROUP BY 1""".stripMargin
  )

  /** The oracle registry the driver runs. The checker executes all
    * oracles in name order in ONE DuckDB session, so the session-wide
    * resource bounds — a hard memory cap, a thread cap, and the ONLY
    * legal `SET temp_directory` (DuckDB refuses any later one once the
    * session has spilled) — are attached HERE to whichever key sorts
    * alphabetically first, structurally rather than inside any one
    * query's text. Any future earlier-sorting insertion therefore
    * inherits the bounds automatically instead of silently stranding
    * the whole session unbounded (the round-9 `access_export`
    * regression; the round-8 `pq_train` bad_alloc). Individual heavy
    * oracles still carry the re-settable [[DuckSoftBounds]]; the
    * redundant memory/thread SETs are idempotent. */
  val sql: Map[String, String] = {
    require(!rawSql.valuesIterator.exists(_.contains("SET temp_directory")),
      "temp_directory may only be set by the structural bounds prefix")
    subset(rawSql.keySet)
  }

  /** [[sql]] restricted to `keys`, with the session bounds attached to
    * the SUBSET's own first key — a filtered run (the amplified-parity
    * lane) must not lose the bounds just because the globally-first
    * oracle was filtered out. */
  def subset(keys: Set[String]): Map[String, String] = {
    val m = rawSql.filter { case (k, _) => keys(k) }
    if (m.isEmpty) m
    else m.updated(m.keys.min, DuckBounds + m(m.keys.min))
  }
}
