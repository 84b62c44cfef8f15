package graft

/** DuckDB oracle SQL for the training-data-pipeline extensions (text
  * analysis, dedup, similarity). Same contract as Oracle: identical
  * column names/types to the Spark side; md5-string hashing and
  * left-to-right double folds so both engines compute bit-identical
  * values.
  */
object OracleExt {

  /** Re-target an oracle's `documents` references to the doc_id-bounded
    * sub-corpus — the second-scale twin discipline: every oracle in the
    * report/profile family reads the corpus exclusively through `FROM
    * documents`, so one textual re-target covers the whole composed
    * query (including shared CTEs embedded as subqueries).
    */
  def docsUnder(sql: String, maxDoc: Long): String =
    sql.replace("FROM documents",
      s"FROM (SELECT * FROM documents WHERE doc_id < $maxDoc)")

  /** Normalised documents + word lists (mirrors TextOps.normalize). */
  private val norm =
    """WITH norm AS (
      |  SELECT doc_id, text,
      |         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      |  FROM documents
      |)""".stripMargin

  /** Stopword counts over doubled delimiters (mirrors
    * TextOps.stopwordHits): after doubling every space each token
    * carries its own surrounding spaces, so consecutive occurrences
    * no longer overlap and the literal-replace count is exact.
    */
  private def stopHits(pd: String, words: Seq[String]): String =
    words.map { w =>
      s"(length($pd) - length(replace($pd, ' $w ', ' '))) / ${w.length + 1}"
    }.mkString(" + ")

  val qTextAnalyze: String = {
    val langs = text.TextOps.LangMarkers
    val scoreExprs = langs.map { case (lang, ws) =>
      s"(${stopHits("pd", ws)}) AS s_$lang"
    }.mkString(", ")
    val best = s"greatest(${langs.map("s_" + _._1).mkString(", ")})"
    val langCase = langs.map { case (lang, _) =>
      s"WHEN s_$lang = $best AND $best > 0 THEN '$lang'"
    }.mkString(" ")
    s"""$norm, pad AS (SELECT doc_id, text, nt,
       |  ' ' || replace(nt, ' ', '  ') || ' ' AS pd FROM norm),
       |sc AS (SELECT doc_id, text, nt, $scoreExprs,
       |         (${stopHits("pd", Seq("the", "a", "and", "of", "is"))}) AS stop_hits
       |       FROM pad)
       |SELECT doc_id,
       |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens_bpe,
       |  md5(nt) AS fingerprint,
       |  least(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / 200.0, 1.0) * 0.4
       |    + (1.0 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
       |        / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
       |    + least(stop_hits / 10.0, 1.0) * 0.3 AS quality,
       |  CASE $langCase ELSE 'unknown' END AS lang_pred
       |FROM sc""".stripMargin
  }

  val qDedupExact: String =
    s"""$norm, fp AS (SELECT doc_id, md5(nt) AS fingerprint FROM norm)
       |SELECT doc_id,
       |  MIN(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
       |  CAST(COUNT(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS group_size,
       |  CAST(CASE WHEN doc_id <> MIN(doc_id) OVER (PARTITION BY fingerprint)
       |       THEN 1 ELSE 0 END AS INTEGER) AS is_duplicate
       |FROM fp""".stripMargin

  /** Incremental dedup (Dedup.incrementalDedup): batch rows whose
    * fingerprint is absent from the corpus. The bloom + broadcast
    * verify on the Spark side is exactly an anti-join, so the oracle
    * is the plain NOT EXISTS.
    */
  val qDedupIncremental: String =
    s"""$norm, batch AS (
       |  SELECT doc_id + 10000 AS doc_id,
       |         CASE WHEN doc_id % 2 = 0 THEN text
       |              ELSE text || ' fresh-batch-suffix' END AS text
       |  FROM documents WHERE doc_id % 3 = 0),
       |bfp AS (SELECT doc_id,
       |  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
       |  FROM batch)
       |SELECT b.doc_id, b.fingerprint FROM bfp b
       |WHERE NOT EXISTS (SELECT 1 FROM norm c WHERE md5(c.nt) = b.fingerprint)""".stripMargin

  /** BPE pair stats (Bpe.pairStats): frequency-weighted adjacent char
    * pair counts over the deduplicated word table — training
    * iteration 1, top 20 with the trainer's deterministic tie-break.
    */
  val qBpePairStats: String =
    s"""$norm,
       |wds AS (SELECT unnest(string_split(nt, ' ')) AS w FROM norm),
       |wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
       |       FROM wds WHERE len(w) > 0 GROUP BY w),
       |ps AS (SELECT substr(w, CAST(i AS INTEGER), 1) AS a,
       |              substr(w, CAST(i AS INTEGER) + 1, 1) AS b, freq
       |       FROM wf, unnest(generate_series(1, len(w) - 1)) AS t(i)
       |       WHERE len(w) >= 2)
       |SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt
       |FROM ps GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 20""".stripMargin

  /** BPE merge training (Bpe.trainMerges, 8 rounds) — the greedy
    * argmax → re-merge recursion unrolled as chained CTEs, one
    * (pair-count, argmax, re-merge) triple per round, the
    * qEmbedIvfTopK Lloyd-unroll discipline.
    *
    * The re-merge step is the subtle part: Spark's `mergePair` is a
    * left-to-right NON-OVERLAPPING fold over the symbol array. SQL has
    * no list fold, but literal `replace()` has exactly those scan
    * semantics — so each word travels as a separator-encoded string
    * (symbols joined by a DOUBLED chr(31), boundaries included:
    * `··a··b··`) and merging pair (a,b) is
    * `replace(enc, '·a··b·', '·ab·')`: each match consumes one
    * separator from each neighbouring boundary, so back-to-back
    * occurrences (`··a··b··a··b··`) still both match in one pass —
    * the single-separator encoding would miss every second one.
    * chr(31) cannot appear in a symbol (it survives neither the
    * corpus alphabet nor `normalize`'s space-split).
    */
  def qBpeTrain(rounds: Int = 8): String = {
    val S = "chr(31)"
    val SS = "(chr(31)||chr(31))"
    val sb = new StringBuilder(
      s"""$norm,
         |wds AS (SELECT unnest(string_split(nt, ' ')) AS w FROM norm),
         |wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
         |       FROM wds WHERE len(w) > 0 GROUP BY w),
         |w0 AS (SELECT $SS || array_to_string(string_split(w, ''), $SS)
         |         || $SS AS enc, freq FROM wf)""".stripMargin)
    (0 until rounds).foreach { r =>
      sb.append(
        s""",
           |p$r AS (
           |  SELECT sy[CAST(i AS INTEGER)] AS a,
           |         sy[CAST(i AS INTEGER) + 1] AS b, freq
           |  FROM (SELECT string_split(trim(enc, chr(31)), $SS) AS sy, freq
           |        FROM w$r) t,
           |       unnest(generate_series(1, len(sy) - 1)) AS u(i)),
           |m$r AS (SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt
           |        FROM p$r GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1),
           |w${r + 1} AS (
           |  SELECT replace(enc, $S || m.a || $SS || m.b || $S,
           |                      $S || m.a || m.b || $S) AS enc, freq
           |  FROM w$r, m$r m)""".stripMargin)
    }
    val union = (0 until rounds).map { r =>
      s"""SELECT CAST(${r + 1} AS INTEGER) AS rank, a AS "left",
         |  b AS "right", a || b AS merged, cnt AS pair_freq FROM m$r"""
        .stripMargin
    }.mkString(" UNION ALL ")
    sb.append(s"\nSELECT * FROM ($union) ORDER BY rank").toString
  }

  /** Salted join (SkewJoin.saltedJoin): the salt only routes rows, so
    * the oracle is the plain equi-join.
    */
  val qSaltedJoin: String =
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_name
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin

  /** Heavy hitters (TextOps.heavyHittersChecked): exact top-20 token
    * frequencies; the Spark side's CMS envelope verdict must come back
    * TRUE per row.
    */
  val qHeavyHitters: String =
    s"""$norm,
       |toks AS (SELECT unnest(string_split(nt, ' ')) AS token FROM norm)
       |SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt, TRUE AS within_bound
       |FROM toks GROUP BY token
       |ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  /** Curriculum ranking (Ranking.globalNtile): the two-phase
    * range-partitioned rank equals the textbook single-window
    * row_number/ntile, which IS the oracle formulation.
    */
  val qCurriculum: String =
    """WITH t AS (SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT doc_id, n_tokens,
      |  CAST(row_number() OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS rank,
      |  CAST(ntile(4) OVER (ORDER BY n_tokens, doc_id) AS INTEGER) AS stage
      |FROM t""".stripMargin

  /** Word-bigram shingle CTE over a bounded doc set. */
  private def shingleCte(filter: String): String =
    s"""words AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM norm $filter),
       |wi AS (SELECT doc_id, ws,
       |         unnest(generate_series(1, greatest(len(ws) - 1, 1))) AS i
       |       FROM words),
       |sh AS (SELECT DISTINCT doc_id, concat_ws(' ', ws[i], ws[i+1]) AS shingle
       |       FROM wi)""".stripMargin

  val MinhashHashes = 12

  /** MinHash+LSH pair oracle over `filter`-bounded docs, banded
    * `bandRows` signature rows per band (bucket = md5 of the
    * '|'-joined band rows, mirroring Dedup.lshCandidates). The capped
    * bandRows=1 variant is the round-tripped high-recall correctness
    * row; the uncapped bandRows=2 variant runs the SAME re-derivation
    * over the whole corpus, backing the full-corpus bench entry
    * `q_minhash_lsh_full` with a real oracle rather than a rows-only
    * check.
    */
  /** CTE chain ending in `j(id_a, id_b, jaccard)` — the banded
    * candidate pairs with exact-Jaccard scores; shared by the pair
    * queries and the near-dup-filter pipeline oracle.
    */
  private def minhashPairCtes(filter: String, bandRows: Int): String = {
    val nBands = MinhashHashes / bandRows
    val mins = (0 until MinhashHashes)
      .map(s => s"min(md5(shingle || ':$s')) AS mh_$s").mkString(", ")
    val bandVals = (0 until nBands).map(b => s"($b)").mkString(", ")
    val bucketCase = (0 until nBands).map { b =>
      val cat = (0 until bandRows).map(r => s"mh_${b * bandRows + r}")
        .mkString(" || '|' || ")
      s"WHEN $b THEN md5($cat)"
    }.mkString(" ")
    s"""${shingleCte(filter)},
       |mh AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |bands AS (SELECT doc_id, band, CASE band $bucketCase END AS bucket
       |          FROM mh, (VALUES $bandVals) b(band)),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |         FROM bands a JOIN bands b2
       |           ON a.band = b2.band AND a.bucket = b2.bucket
       |              AND a.doc_id < b2.doc_id),
       |szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |inter AS (SELECT c.id_a, c.id_b, count(*) AS n
       |          FROM cand c
       |          JOIN sh sa ON sa.doc_id = c.id_a
       |          JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
       |          GROUP BY 1, 2),
       |j AS (SELECT c.id_a, c.id_b,
       |        CAST(COALESCE(i.n, 0) AS DOUBLE)
       |          / CAST(za.sz + zb.sz - COALESCE(i.n, 0) AS DOUBLE) AS jaccard
       |      FROM cand c
       |      LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |      JOIN szs za ON za.doc_id = c.id_a
       |      JOIN szs zb ON zb.doc_id = c.id_b)""".stripMargin
  }

  def qMinhashLshFiltered(filter: String, bandRows: Int,
                          threshold: Double): String =
    s"""$norm, ${minhashPairCtes(filter, bandRows)}
       |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= $threshold""".stripMargin

  val qMinhashLsh: String = qMinhashLshFiltered("WHERE doc_id < 200", 1, 0.1)
  val qMinhashLshFull: String = qMinhashLshFiltered("", 2, 0.5)

  /** LSH recall audit (Dedup.lshRecallAudit): the shared banded-pair
    * CTEs for the LSH side, a shingle-keyed COMPLETE candidate set for
    * the truth side, the same exact-Jaccard verify on both.
    */
  def qLshRecallAudit(filter: String, bandRows: Int,
                      threshold: Double): String =
    s"""$norm, ${minhashPairCtes(filter, bandRows)},
       |tc AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sh a JOIN sh b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
       |ti AS (SELECT c.id_a, c.id_b, count(*) AS n FROM tc c
       |  JOIN sh sa ON sa.doc_id = c.id_a
       |  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
       |  GROUP BY 1, 2),
       |truth AS (SELECT t.id_a, t.id_b FROM ti t
       |  JOIN szs za ON za.doc_id = t.id_a
       |  JOIN szs zb ON zb.doc_id = t.id_b
       |  WHERE CAST(t.n AS DOUBLE)
       |    / CAST(za.sz + zb.sz - t.n AS DOUBLE) >= $threshold),
       |lshp AS (SELECT id_a, id_b FROM j WHERE jaccard >= $threshold),
       |hit AS (SELECT t.id_a FROM truth t
       |  JOIN lshp l ON l.id_a = t.id_a AND l.id_b = t.id_b)
       |SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
       |  CAST((SELECT COUNT(*) FROM lshp) AS BIGINT) AS n_lsh,
       |  CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hit,
       |  round((SELECT COUNT(*) FROM hit)
       |    / greatest((SELECT COUNT(*) FROM truth), 1), 6) AS recall""".stripMargin

  /** More-like-this retrieval (Dedup.moreLikeThis): the shared banded
    * candidate + exact-Jaccard CTEs, symmetrized, top-5 per seed.
    */
  val qMoreLikeThis: String =
    s"""$norm, ${minhashPairCtes("WHERE doc_id < 200", 1)},
       |sym AS (SELECT id_a AS seed_id, id_b AS match_id, jaccard FROM j
       |        UNION ALL SELECT id_b, id_a, jaccard FROM j),
       |f AS (SELECT * FROM sym WHERE seed_id < 5 AND jaccard > 0.0),
       |r AS (SELECT seed_id, match_id, jaccard,
       |        CAST(row_number() OVER (PARTITION BY seed_id
       |          ORDER BY jaccard DESC, match_id) AS BIGINT) AS match_rank
       |      FROM f)
       |SELECT seed_id, match_id, jaccard, match_rank
       |FROM r WHERE match_rank <= 5""".stripMargin

  /** Last-touch attribution (Attribution.lastTouch): conversions ASOF
    * against deduplicated touchpoints (arg_max tie-break at one
    * timestamp, matching Spark's max_by).
    */
  val qAttribution: String =
    """WITH e AS (SELECT user_id,
      |  CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t, event_id, event_type
      |  FROM events),
      |c AS (SELECT user_id, t, event_id FROM e
      |      WHERE event_type = 'purchase'),
      |tp AS (SELECT user_id, t,
      |         arg_max(event_type, event_id) AS touch_type,
      |         MAX(event_id) AS touch_event_id
      |       FROM e WHERE event_type <> 'purchase' GROUP BY user_id, t)
      |SELECT c.user_id, c.t, c.event_id, tp.touch_type, tp.touch_event_id
      |FROM c ASOF LEFT JOIN tp
      |  ON c.user_id = tp.user_id AND c.t >= tp.t""".stripMargin

  /** One-pass numeric profile (Profile.profile over lineitem):
    * per-column stats via plain aggregates + quantile_cont median.
    */
  val qProfile: String = {
    def row(c: String) =
      s"""SELECT '$c' AS "column",
         |  CAST(COUNT($c) AS BIGINT) AS n_values,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
         |  round(CAST(MIN($c) AS DOUBLE), 6) AS min,
         |  round(CAST(MAX($c) AS DOUBLE), 6) AS max,
         |  round(CAST(SUM(CAST(round($c * 1e6) AS HUGEINT)) AS DOUBLE)
         |        / COUNT($c) / 1e6, 6) AS mean,
         |  round(quantile_cont(CAST($c AS DOUBLE), 0.5), 6) AS p50
         |FROM lineitem""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount")
      .map(row).mkString("\nUNION ALL\n")
  }

  /** Sketch-median profile envelope (Profile.profileApprox): exact
    * count + exact median, TRUE for the in-plan sketch verdict.
    */
  val qProfileApprox: String = {
    def row(c: String) =
      s"""SELECT '$c' AS "column",
         |  CAST(COUNT($c) AS BIGINT) AS n_values,
         |  round(quantile_cont(CAST($c AS DOUBLE), 0.5), 6) AS p50,
         |  TRUE AS p50_within_tol
         |FROM lineitem""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount")
      .map(row).mkString("\nUNION ALL\n")
  }

  /** Asymmetric containment pairs (Dedup.containmentPairs over the
    * banded candidates, threshold 0.5 on the max direction): the same
    * candidate/intersection/size CTEs, containment = inter / own size.
    */
  val qContainment: String =
    s"""$norm, ${minhashPairCtes("WHERE doc_id < 200", 1)},
       |ct AS (SELECT c.id_a, c.id_b,
       |  round(CAST(COALESCE(i.n, 0) AS DOUBLE) / za.sz, 6) AS containment_a,
       |  round(CAST(COALESCE(i.n, 0) AS DOUBLE) / zb.sz, 6) AS containment_b,
       |  round(CAST(COALESCE(i.n, 0) AS DOUBLE)
       |    / (za.sz + zb.sz - COALESCE(i.n, 0)), 6) AS jaccard
       |FROM cand c
       |LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |JOIN szs za ON za.doc_id = c.id_a
       |JOIN szs zb ON zb.doc_id = c.id_b)
       |SELECT * FROM ct
       |WHERE greatest(containment_a, containment_b) >= 0.5""".stripMargin

  /** Distribution drift (Sampling.distributionDrift on source, B =
    * doc_id % 3 = 0, α = 0.5): identical Laplace-smoothed JS
    * arithmetic.
    */
  val qDistributionDrift: String =
    """WITH ca AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_a
      |            FROM documents GROUP BY source),
      |cb AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_b
      |       FROM documents WHERE doc_id % 3 = 0 GROUP BY source),
      |j AS (SELECT source, COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
      |      FROM ca FULL JOIN cb USING (source)),
      |st AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb, COUNT(*) AS kk FROM j),
      |sm AS (SELECT source, n_a, n_b,
      |         (n_a + 0.5) / (ta + 0.5 * kk) AS p,
      |         (n_b + 0.5) / (tb + 0.5 * kk) AS q
      |       FROM j, st)
      |SELECT source, n_a, n_b,
      |  round(p, 6) AS share_a, round(q, 6) AS share_b,
      |  round((p * ln(p / ((p + q) / 2.0)) + q * ln(q / ((p + q) / 2.0)))
      |    / (2.0 * ln(2.0)), 6) AS js_bits
      |FROM sm""".stripMargin

  /** MinHash estimator gate (Dedup.minhashEstimateGate): exact
    * candidate count + mean exact Jaccard, TRUE for the mean-error
    * verdict the Spark side computes against its own signatures.
    */
  val qMinhashEstimate: String =
    s"""$norm, ${minhashPairCtes("WHERE doc_id < 200", 1)}
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  round(avg(jaccard), 6) AS mean_jaccard, TRUE AS est_ok
       |FROM j""".stripMargin

  /** Windowed funnel (Funnel.funnel with maxGapSec 6h): the strictly-
    * after gate additionally bounded above by the conversion window.
    */
  val qFunnelWindowed: String = {
    val gap = 6L * 3600L * 1000000L
    s"""WITH e AS (SELECT user_id, event_type,
       |  CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t FROM events),
       |s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
       |       WHERE event_type = 'view' GROUP BY user_id),
       |s2 AS (SELECT s1.user_id, MIN(e.t) AS t2 FROM s1 JOIN e
       |       ON e.user_id = s1.user_id AND e.event_type = 'click'
       |          AND e.t > s1.t1 AND e.t <= s1.t1 + $gap GROUP BY s1.user_id),
       |s3 AS (SELECT s2.user_id, MIN(e.t) AS t3 FROM s2 JOIN e
       |       ON e.user_id = s2.user_id AND e.event_type = 'purchase'
       |          AND e.t > s2.t2 AND e.t <= s2.t2 + $gap GROUP BY s2.user_id)
       |SELECT CAST(1 AS INTEGER) AS stage, 'view' AS step,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_users
       |UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
       |UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)""".stripMargin
  }

  /** Robust anomaly flags (Anomaly.robustFlags, k=3): group median/IQR
    * via quantile_cont (the winsorize parity), margin rounded 1e-6.
    */
  val qEventAnomaly: String =
    """WITH e AS (SELECT event_id, event_type, value FROM events),
      |st AS (SELECT event_type,
      |         quantile_cont(value, 0.5) AS med,
      |         quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
      |       FROM e GROUP BY event_type),
      |rz AS (SELECT e.event_id, e.event_type, e.value,
      |         CASE WHEN iqr = 0.0 THEN 0.0
      |              ELSE (e.value - med) / iqr END AS z
      |       FROM e JOIN st USING (event_type))
      |SELECT event_id, event_type, value, round(z, 6) AS robust_z,
      |  CAST(round(abs(z) - 3.0, 6) > 0.0 AS INTEGER) AS is_anomaly
      |FROM rz""".stripMargin

  /** Edit-distance-verified pairs oracle (mirrors
    * Dedup.editVerifiedPairs): the same banded candidate CTEs, then
    * exact Levenshtein on the normalised texts — integer distances, so
    * the similarity ratio is the identical rational in both engines.
    */
  def qEditVerifiedPairs(filter: String, bandRows: Int,
                         minSim: Double): String =
    s"""$norm, ${minhashPairCtes(filter, bandRows)},
       |ev AS (
       |  SELECT c.id_a, c.id_b,
       |    levenshtein(na.nt, nb.nt) AS edit_dist,
       |    greatest(length(na.nt), length(nb.nt), 1) AS mx
       |  FROM cand c
       |  JOIN norm na ON na.doc_id = c.id_a
       |  JOIN norm nb ON nb.doc_id = c.id_b)
       |SELECT id_a, id_b, CAST(edit_dist AS INTEGER) AS edit_dist,
       |  round(1.0 - CAST(edit_dist AS DOUBLE) / mx, 6) AS edit_sim
       |FROM ev
       |WHERE 1.0 - CAST(edit_dist AS DOUBLE) / mx >= $minSim""".stripMargin

  private val highHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    .map(h => s"'$h'").mkString(", ")

  /** 16-bit simhash signature CTE (hex-MSB projection, token-frequency
    * weighted) — mirrors Dedup.simhash.
    */
  private def simhashCte(filter: String): String = {
    val bits = (1 to 16).map(j =>
      s"""CASE WHEN SUM(CASE WHEN substr(h, $j, 1) IN ($highHex)
         | THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END""".stripMargin)
      .mkString(" || ")
    s"""toks0 AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok
       |          FROM norm $filter),
       |toks AS (SELECT doc_id, md5(tok) AS h FROM toks0),
       |sig AS (SELECT doc_id, $bits AS simhash FROM toks GROUP BY doc_id)""".stripMargin
  }

  val qSimhash: String =
    s"$norm, ${simhashCte("")} SELECT doc_id, simhash FROM sig"

  /** CTE chain ending in `h(id_a, id_b, hamming)` — the half-blocked
    * simhash candidate pairs of docs < 200 (mirrors
    * Dedup.simhashPairs); shared by the pair query and the
    * connected-components clustering oracle.
    */
  private val simhashPairCtes: String = {
    val ham = (1 to 16).map(j =>
      s"CASE WHEN substr(sh_a, $j, 1) <> substr(sh_b, $j, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""${simhashCte("WHERE doc_id < 200")},
       |blocks AS (
       |  SELECT doc_id, simhash,
       |         unnest(['1:' || substr(simhash, 1, 8),
       |                 '2:' || substr(simhash, 9, 8)]) AS block
       |  FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |                a.simhash AS sh_a, b.simhash AS sh_b
       |         FROM blocks a JOIN blocks b
       |           ON a.block = b.block AND a.doc_id < b.doc_id),
       |h AS (SELECT id_a, id_b, $ham AS hamming FROM cand)""".stripMargin
  }

  val qSimhashPairs: String =
    s"""$norm, $simhashPairCtes
       |SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming
       |FROM h WHERE hamming <= 3""".stripMargin

  /** PageRank over the simhash near-dup graph (graphs.PageRank, 5
    * iterations, damping 0.85): the rounded power-iteration recurrence
    * unrolled as chained CTEs — round(…, 9) per iteration keeps both
    * engines on the identical trajectory (the qBpeTrain/Lloyd
    * discipline applied to float recursion).
    */
  def qPageRank(iters: Int = 5, damping: Double = 0.85): String = {
    val sb = new StringBuilder(
      s"""$norm, $simhashPairCtes,
         |e0 AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
         |sym AS (SELECT id_a AS src, id_b AS dst FROM e0
         |        UNION SELECT id_b, id_a FROM e0),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |        FROM sym GROUP BY src),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
         |r0 AS (SELECT src AS id, round(1.0 / n, 9) AS rank
         |       FROM deg, nn)""".stripMargin)
    (1 to iters).foreach { i =>
      sb.append(
        s""",
           |c$i AS (SELECT s.dst,
           |          SUM(CAST(round(r.rank / d.deg * 1e15) AS HUGEINT)) AS ci
           |        FROM sym s
           |        JOIN deg d ON d.src = s.src
           |        JOIN r${i - 1} r ON r.id = s.src
           |        GROUP BY s.dst),
           |r$i AS (SELECT d.src AS id,
           |          round((1.0 - $damping) / nn.n
           |            + CAST(COALESCE(c.ci, 0) AS DOUBLE) / 1e15
           |              * $damping, 9) AS rank
           |        FROM deg d CROSS JOIN nn
           |        LEFT JOIN c$i c ON c.dst = d.src)""".stripMargin)
    }
    sb.append(s"\nSELECT id, round(rank, 6) AS pagerank FROM r$iters")
      .toString
  }

  /** Personalized PageRank oracle (graphs.PageRank
    * .personalizedPageRank): seed-restart teleport, the same unrolled
    * integer-fixed recurrence as qPageRank.
    */
  def qPersonalizedPageRank(iters: Int = 5, maxSeed: Long = 5L,
                            damping: Double = 0.85): String = {
    def mass(id: String) =
      s"CASE WHEN $id < $maxSeed THEN 1.0 / ns.n ELSE 0.0 END"
    val sb = new StringBuilder(
      s"""$norm, $simhashPairCtes,
         |e0 AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
         |sym AS (SELECT id_a AS src, id_b AS dst FROM e0
         |        UNION SELECT id_b, id_a FROM e0),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |        FROM sym GROUP BY src),
         |ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg
         |       WHERE src < $maxSeed),
         |r0 AS (SELECT src AS id, round(${mass("src")}, 9) AS rank
         |       FROM deg, ns)""".stripMargin)
    (1 to iters).foreach { i =>
      sb.append(
        s""",
           |c$i AS (SELECT s.dst,
           |          SUM(CAST(round(r.rank / d.deg * 1e15) AS HUGEINT)) AS ci
           |        FROM sym s
           |        JOIN deg d ON d.src = s.src
           |        JOIN r${i - 1} r ON r.id = s.src
           |        GROUP BY s.dst),
           |r$i AS (SELECT d.src AS id,
           |          round(${mass("d.src")} * (1.0 - $damping)
           |            + CAST(COALESCE(c.ci, 0) AS DOUBLE) / 1e15
           |              * $damping, 9) AS rank
           |        FROM deg d CROSS JOIN ns
           |        LEFT JOIN c$i c ON c.dst = d.src)""".stripMargin)
    }
    sb.append(s"\nSELECT id, round(rank, 6) AS ppr FROM r$iters")
      .toString
  }

  /** 64-bit simhash signature CTE — mirrors Dedup.simhash64: bits
    * 1..32 from the hex-MSB projection of md5(tok), 33..64 from
    * md5(tok || '#2').
    */
  private def simhash64Cte(filter: String): String = {
    def bitsOf(c: String) = (1 to 32).map(j =>
      s"""CASE WHEN SUM(CASE WHEN substr($c, $j, 1) IN ($highHex)
         | THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END""".stripMargin)
    val bits = (bitsOf("h1") ++ bitsOf("h2")).mkString(" || ")
    s"""toks0 AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok
       |          FROM norm $filter),
       |toks AS (SELECT doc_id, md5(tok) AS h1, md5(tok || '#2') AS h2
       |         FROM toks0),
       |sig64 AS (SELECT doc_id, $bits AS simhash64 FROM toks GROUP BY doc_id)""".stripMargin
  }

  val qSimhash64: String =
    s"$norm, ${simhash64Cte("")} SELECT doc_id, simhash64 FROM sig64"

  /** 64-bit near-dup pair oracle: brute-force ALL-PAIRS hamming ≤ 3
    * over the bounded subset. Deliberately NOT a mirror of the band
    * blocking — matching this oracle proves the pigeonhole exactness
    * claim (maxDist ≤ 3 over 4 × 16-bit bands loses no pair), not just
    * that both engines run the same plan.
    */
  def qSimhash64PairsFiltered(filter: String): String = {
    val ham = (1 to 64).map(j =>
      s"CASE WHEN substr(a.simhash64, $j, 1) <> substr(b.simhash64, $j, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""$norm, ${simhash64Cte(filter)},
       |h AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, $ham AS hamming
       |      FROM sig64 a JOIN sig64 b ON a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming
       |FROM h WHERE hamming <= 3""".stripMargin
  }

  val qSimhash64Pairs: String = qSimhash64PairsFiltered("WHERE doc_id < 500")
  /** Uncapped variant: still the brute-force all-pairs hamming (the
    * anti-mirror that proves band-blocking exactness), just over the
    * whole correctness corpus — quadratic in DuckDB but bounded
    * (~125k pairs at sf0.01); the Spark side runs the banded scale
    * path on the full table, which is the point of the bench row.
    */
  val qSimhash64PairsFull: String = qSimhash64PairsFiltered("")

  /** Duplicate-cluster oracle: transitive closure of the simhash pair
    * graph via a recursive CTE — cluster_id(x) = min id reachable from
    * x (mirrors Dedup.connectedComponents over simhashPairs ≤ 3).
    */
  val qDedupClusters: String =
    s"""${norm.replaceFirst("WITH ", "WITH RECURSIVE ")}, $simhashPairCtes,
       |pairs AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT doc_id FROM documents WHERE doc_id < 200),
       |reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM nodes
       |  UNION
       |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
       |       FROM reach GROUP BY node),
       |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |       FROM cl GROUP BY 1)
       |SELECT c.doc_id, c.cluster_id, s.cluster_size
       |FROM cl c JOIN sz s ON s.cluster_id = c.cluster_id""".stripMargin

  /** Tokenizer fertility stats (TokenizerStats.fertility): one
    * language-keyed aggregate of exact long sums.
    */
  val qTokenizerFertility: String =
    """WITH t AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |      AS n_words,
      |    CAST(SUM(len(regexp_extract_all(lower(text),
      |      '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_subwords,
      |    CAST(SUM(length(text)) AS BIGINT) AS n_chars_sum
      |  FROM documents GROUP BY lang)
      |SELECT lang, n_docs, n_words, n_subwords,
      |  round(CAST(n_subwords AS DOUBLE) / n_words, 6) AS fertility,
      |  round(CAST(n_chars_sum AS DOUBLE) / n_subwords, 6)
      |    AS chars_per_subword
      |FROM t""".stripMargin

  /** Character entropy (TextOps.charEntropy): per-char probabilities
    * from exact counts, each −p·ln(p) term fixed to 1e-9 BIGINT units
    * before the per-doc sum — identical arithmetic to the Spark side.
    */
  val qCharEntropy: String =
    s"""$norm, chars AS (
       |  SELECT doc_id, CAST(length(nt) AS BIGINT) AS n_chars,
       |         unnest(regexp_extract_all(nt, '.')) AS ch
       |  FROM norm WHERE length(nt) > 0),
       |cc AS (
       |  SELECT doc_id, n_chars, ch, CAST(COUNT(*) AS DOUBLE) AS cnt
       |  FROM chars GROUP BY 1, 2, 3),
       |terms AS (
       |  SELECT doc_id, n_chars,
       |    CAST(round((cnt / n_chars) * ln(cnt / n_chars) * -1e9, 0)
       |      AS BIGINT) AS term_nano
       |  FROM cc)
       |SELECT doc_id, n_chars,
       |  round(CAST(SUM(term_nano) AS DOUBLE) / 1e9, 6) AS char_entropy
       |FROM terms GROUP BY doc_id, n_chars""".stripMargin

  /** Per-source quality calibration (percent_rank of the 1e-9-rounded
    * quality score within source — cross-source comparable
    * thresholds).
    */
  val qQualityCalibrate: String =
    s"""$norm, pad AS (SELECT doc_id, text, nt,
       |  ' ' || replace(nt, ' ', '  ') || ' ' AS pd FROM norm),
       |q AS (SELECT p.doc_id, d.source, round(
       |    least(CAST(len(string_split_regex(trim(p.text), '\\s+')) AS DOUBLE) / 200.0, 1.0) * 0.4
       |    + (1.0 - (length(p.text) - length(regexp_replace(p.text, '[.,!?;:]', '', 'g')))
       |        / CAST(greatest(length(p.text), 1) AS DOUBLE)) * 0.3
       |    + least((${stopHits("pd", Seq("the", "a", "and", "of", "is"))}) / 10.0, 1.0) * 0.3, 9) AS quality
       |  FROM pad p JOIN documents d ON d.doc_id = p.doc_id)
       |SELECT doc_id, source, round(quality, 6) AS quality,
       |  round(percent_rank() OVER (PARTITION BY source
       |    ORDER BY quality, doc_id), 6) AS q_rank
       |FROM q""".stripMargin

  /** Winnowing fingerprint pairs (Dedup.winnowPairs, k=3 w=4
    * minShared=2 maxDf=50): gram hashes by positional slice, window
    * minima by bounded range join, identical md5/lexicographic-min
    * arithmetic.
    */
  def qWinnowPairs(k: Int = 3, w: Int = 4, minShared: Long = 2L,
                   maxDf: Long = 50L): String =
    s"""$norm,
       |words AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM norm),
       |g AS (SELECT doc_id, ws,
       |        unnest(range(1, len(ws) - ${k - 1} + 1)) AS i
       |      FROM words WHERE len(ws) >= ${k + w - 1}),
       |grams AS (SELECT doc_id, i,
       |        md5(array_to_string(ws[i:i+${k - 1}], ' ')) AS h FROM g),
       |gc AS (SELECT doc_id, COUNT(*) AS cnt FROM grams GROUP BY 1),
       |wdx AS (SELECT doc_id, unnest(range(1, cnt - ${w - 1} + 1)) AS j
       |        FROM gc),
       |win AS (SELECT wdx.doc_id, wdx.j, MIN(grams.h) AS fp
       |        FROM wdx JOIN grams ON grams.doc_id = wdx.doc_id
       |          AND grams.i BETWEEN wdx.j AND wdx.j + ${w - 1}
       |        GROUP BY 1, 2),
       |fps AS (SELECT DISTINCT doc_id, fp FROM win),
       |keep AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= $maxDf),
       |fk AS (SELECT f.doc_id, f.fp FROM fps f JOIN keep kp ON kp.fp = f.fp)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= $minShared""".stripMargin

  /** Keep-best canonical selection (Dedup.keepBest over the
    * qDedupClusters graph + the TextOps quality score): per-cluster
    * argmax of 1e-9-rounded quality, ties to the smallest doc_id.
    */
  val qDedupKeepBest: String = {
    val stop = stopHits("pd", Seq("the", "a", "and", "of", "is"))
    s"""${norm.replaceFirst("WITH ", "WITH RECURSIVE ")}, $simhashPairCtes,
       |pairs AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT doc_id FROM documents WHERE doc_id < 200),
       |reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM nodes
       |  UNION
       |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
       |       FROM reach GROUP BY node),
       |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |       FROM cl GROUP BY 1),
       |pad AS (SELECT doc_id, text, nt,
       |  ' ' || replace(nt, ' ', '  ') || ' ' AS pd
       |  FROM norm WHERE doc_id < 200),
       |qual AS (SELECT doc_id, round(
       |    least(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / 200.0, 1.0) * 0.4
       |    + (1.0 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
       |        / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
       |    + least(($stop) / 10.0, 1.0) * 0.3, 9) AS quality
       |  FROM pad),
       |r AS (SELECT c.doc_id, c.cluster_id, s.cluster_size, q.quality,
       |        row_number() OVER (PARTITION BY c.cluster_id
       |          ORDER BY q.quality DESC, c.doc_id) AS rn
       |      FROM cl c JOIN sz s ON s.cluster_id = c.cluster_id
       |      JOIN qual q ON q.doc_id = c.doc_id)
       |SELECT doc_id, cluster_id, cluster_size,
       |  round(quality, 6) AS quality,
       |  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INTEGER) AS keep
       |FROM r""".stripMargin
  }

  /** NFC normalization oracle: DuckDB's independent nfc_normalize over
    * the same ASCII prefix + decomposed suffix (combining acute 0x301,
    * combining diaeresis 0x308); n_composed counts the code points the
    * canonical composition removed.
    */
  val qNfcNormalize: String =
    s"""WITH p AS (
       |  SELECT doc_id,
       |    substr(text, 1, 16) || ' cafe' || chr(769) || ' u' || chr(776)
       |      || 'ber' AS probed
       |  FROM documents)
       |SELECT doc_id, nfc_normalize(probed) AS nfc_text,
       |  CAST(length(probed) - length(nfc_normalize(probed)) AS BIGINT)
       |    AS n_composed
       |FROM p""".stripMargin

  /** Leakage-safe split oracle: the qDedupClusters recursive closure
    * (same 16-bit simhash pair graph, doc_id < 200) with the split
    * CASE drawn from md5 of the CLUSTER id — threshold literals from
    * the same cumulative-sum builder as Sampling.hashSplit.
    */
  val qSplitNoLeakage: String = {
    val Seq(t1, t2) = graft.sampling.Sampling.splitThresholds(
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).toSeq
    s"""${norm.replaceFirst("WITH ", "WITH RECURSIVE ")}, $simhashPairCtes,
       |pairs AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT doc_id FROM documents WHERE doc_id < 200),
       |reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM nodes
       |  UNION
       |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
       |       FROM reach GROUP BY node)
       |SELECT doc_id, cluster_id,
       |  CASE WHEN md5(CAST(cluster_id AS VARCHAR) || ':split2') < '$t1'
       |         THEN 'train'
       |       WHEN md5(CAST(cluster_id AS VARCHAR) || ':split2') < '$t2'
       |         THEN 'val'
       |       ELSE 'test' END AS split
       |FROM cl""".stripMargin
  }

  /** Deterministic hash sample (mirrors Sampling.hashSample over
    * documents, fraction 0.25, salt "split0" — identical md5 input
    * string and threshold literal on both engines).
    */
  val qSampleHash: String = {
    val t = graft.sampling.Sampling.thresholdHex(0.25)
    s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
       |FROM documents
       |WHERE md5(CAST(doc_id AS VARCHAR) || ':split0') < '$t'""".stripMargin
  }

  /** Deterministic train/val/test assignment (mirrors
    * Sampling.hashSplit 0.8/0.1/0.1, salt "split1"; thresholds come
    * from the same cumulative-sum code so the float literals match
    * bit-for-bit).
    */
  val qSampleSplit: String = {
    val Seq(t1, t2) = graft.sampling.Sampling.splitThresholds(
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).toSeq
    s"""SELECT doc_id,
       |  CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':split1') < '$t1' THEN 'train'
       |       WHEN md5(CAST(doc_id AS VARCHAR) || ':split1') < '$t2' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  /** Gaps-and-islands reformulation of Spark's session_window
    * semantics (Sessions.sessionize, gap 3600 s): an event extends the
    * session when its gap to the previous event is <= the gap
    * (boundary-inclusive merge — verified against Spark 4.1's
    * session_window); a new session starts strictly beyond it. The
    * session end is last event + gap. Timestamps as epoch
    * microseconds, truncated from nanos the same way Panel.readEvents
    * does.
    */
  val qSessionize: String = {
    val gapUs = 3600L * 1000000L
    s"""WITH e AS (
       |  SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t,
       |         value, event_id
       |  FROM events),
       |m AS (
       |  SELECT user_id, t, value, event_id,
       |    CASE WHEN LAG(t) OVER w IS NULL OR t - LAG(t) OVER w > $gapUs
       |         THEN 1 ELSE 0 END AS ns
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
       |s AS (
       |  SELECT user_id, t, value,
       |    SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
       |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM m)
       |SELECT user_id, MIN(t) AS t_start_us, MAX(t) + $gapUs AS t_end_us,
       |  CAST(COUNT(*) AS BIGINT) AS n_events, SUM(value) AS sum_value
       |FROM s GROUP BY user_id, sid""".stripMargin
  }

  /** Two-level token-budget packing (mirrors Packing.packShards:
    * budget 4000, 8 buckets, salt "pack0"): bucket = first-4-hex-digit
    * value of the salted md5 draw mod 8 (per-digit strpos arithmetic —
    * the identical computation on both engines), shard = budget
    * quotient of the per-bucket prefix token sum in hash order.
    */
  val qPackShards: String = {
    val band = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    md5(CAST(doc_id AS VARCHAR) || ':pack0') AS h
       |  FROM documents),
       |b AS (SELECT doc_id, n_tokens, h,
       |        CAST(($band) % 8 AS BIGINT) AS bucket FROM d),
       |p AS (SELECT doc_id, n_tokens, bucket,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
       |  FROM b)
       |SELECT doc_id, n_tokens, bucket,
       |  CAST(FLOOR(prefix / 4000.0) AS BIGINT) AS shard
       |FROM p""".stripMargin
  }

  /** Shard manifest (Packing.shardManifest over the qPackShards
    * packing): grouped totals plus the salted-band checksum —
    * `SUM(band(md5(doc_id || '_' || n_tokens || ':pack0:mf')))`.
    */
  val qShardManifest: String = {
    val band = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    val cband = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substr(ch, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    md5(CAST(doc_id AS VARCHAR) || ':pack0') AS h
       |  FROM documents),
       |b AS (SELECT doc_id, n_tokens, h,
       |        CAST(($band) % 8 AS BIGINT) AS bucket FROM d),
       |p AS (SELECT doc_id, n_tokens, bucket,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
       |  FROM b),
       |m AS (SELECT doc_id, n_tokens, bucket,
       |    CAST(FLOOR(prefix / 4000.0) AS BIGINT) AS shard,
       |    md5(CAST(doc_id AS VARCHAR) || '_' || CAST(n_tokens AS VARCHAR)
       |        || ':pack0:mf') AS ch
       |  FROM p)
       |SELECT bucket, shard,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  MIN(doc_id) AS min_doc_id,
       |  MAX(doc_id) AS max_doc_id,
       |  CAST(SUM($cband) AS BIGINT) AS checksum
       |FROM m GROUP BY bucket, shard""".stripMargin
  }

  /** Scale-adaptive packing oracle (mirrors Packing.packShardsAuto:
    * budget 4000, shardsPerBucket 4, salt 'packa'): the bucket count
    * itself is derived in SQL — ceil(Σ tokens / (4000·4)), min 1 — so
    * the derivation arithmetic is part of the checked value.
    */
  val qPackShardsAuto: String = {
    val band = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    md5(CAST(doc_id AS VARCHAR) || ':packa') AS h
       |  FROM documents),
       |nb AS (SELECT GREATEST(
       |         CAST(ceil(SUM(n_tokens) / (4000.0 * 4)) AS BIGINT), 1) AS nbuckets
       |       FROM d),
       |b AS (SELECT doc_id, n_tokens, h,
       |        CAST(($band) % nb.nbuckets AS BIGINT) AS bucket FROM d, nb),
       |p AS (SELECT doc_id, n_tokens, bucket,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
       |  FROM b)
       |SELECT doc_id, n_tokens, bucket,
       |  CAST(FLOOR(prefix / 4000.0) AS BIGINT) AS shard
       |FROM p""".stripMargin
  }

  /** Repeated-span removal oracle (mirrors Dedup.removeRepeatedSpans
    * with n = 8, minDf = 2): positional word 8-grams keyed by the same
    * 16-hex-char md5 prefix, df over distinct docs, covered token
    * positions cut, survivors reassembled in order.
    */
  val qDedupSpans: String = {
    val n = 8
    s"""$norm,
       |tw AS (SELECT doc_id, string_split(nt, ' ') AS ws,
       |         len(string_split(nt, ' ')) AS L FROM norm),
       |gr AS (SELECT doc_id, ws, unnest(generate_series(0, L - $n)) AS p
       |       FROM tw WHERE L >= $n),
       |gt AS (SELECT doc_id, p,
       |         substr(md5(array_to_string(ws[p + 1 : p + $n], ' ')), 1, 16) AS gram
       |       FROM gr),
       |dup AS (SELECT gram FROM (
       |          SELECT gram, COUNT(DISTINCT doc_id) AS df FROM gt GROUP BY 1) x
       |        WHERE df >= 2),
       |cov AS (SELECT DISTINCT g.doc_id, g.p FROM gt g JOIN dup d ON d.gram = g.gram),
       |tok AS (SELECT doc_id, ws, L, unnest(generate_series(0, L - 1)) AS i FROM tw),
       |keep AS (SELECT t.doc_id, t.i, t.ws[t.i + 1] AS w
       |         FROM tok t LEFT JOIN cov c
       |           ON c.doc_id = t.doc_id AND t.i >= c.p AND t.i < c.p + $n
       |         WHERE c.p IS NULL),
       |ag AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS cleaned,
       |         COUNT(*) AS kept FROM keep GROUP BY 1)
       |SELECT t.doc_id, COALESCE(a.cleaned, '') AS cleaned,
       |  CAST(t.L - COALESCE(a.kept, 0) AS BIGINT) AS n_removed
       |FROM tw t LEFT JOIN ag a ON a.doc_id = t.doc_id""".stripMargin
  }

  /** Top-5 TF-IDF keywords per doc (mirrors TextOps.tfidfKeywords:
    * smoothed idf, ties by token, 1e-6 output rounding).
    */
  val qTfidf: String =
    s"""$norm,
       |t AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM norm),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       |df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
       |sc AS (SELECT f.doc_id, f.tok, f.tf, d.df,
       |        CAST(f.tf AS DOUBLE)
       |          * (ln((nn.n + 1.0) / (CAST(d.df AS DOUBLE) + 1.0)) + 1.0) AS score
       |       FROM tf f JOIN df d ON d.tok = f.tok, nn),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |        ORDER BY score DESC, tok ASC) AS rank FROM sc)
       |SELECT doc_id, CAST(rank AS INTEGER) AS rank, tok AS token,
       |  CAST(tf AS BIGINT) AS tf, df, round(score, 6) AS tfidf
       |FROM r WHERE rank <= 5""".stripMargin

  /** Context-window packing (mirrors Packing.packSequences: context
    * 512, 8 buckets, salt "seq0") — qPackShards' cumsum plus the
    * in-sequence token offset.
    */
  val qPackSequences: String = {
    val band = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    md5(CAST(doc_id AS VARCHAR) || ':seq0') AS h
       |  FROM documents),
       |b AS (SELECT doc_id, n_tokens, h,
       |        CAST(($band) % 8 AS BIGINT) AS bucket FROM d),
       |p AS (SELECT doc_id, n_tokens, bucket,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
       |  FROM b)
       |SELECT doc_id, n_tokens, bucket,
       |  CAST(FLOOR(prefix / 512.0) AS BIGINT) AS seq,
       |  CAST(prefix - CAST(FLOOR(prefix / 512.0) AS BIGINT) * 512 AS BIGINT) AS offset
       |FROM p""".stripMargin
  }

  /** Keep-first repeated-span removal (mirrors
    * Dedup.removeRepeatedSpansKeepFirst, n=8, minDf=2): identical to
    * qDedupSpans except the canonical occurrence of each duplicated
    * gram — ROW_NUMBER() = 1 under ORDER BY (doc_id, p), exactly
    * Spark's min(struct(id, pos)) — is excluded from coverage, so the
    * first copy of every duplicated span survives.
    */
  private def spansKeepFirstCtes(n: Int): String =
    s"""$norm,
       |tw AS (SELECT doc_id, string_split(nt, ' ') AS ws,
       |         len(string_split(nt, ' ')) AS L FROM norm),
       |gr AS (SELECT doc_id, ws, unnest(generate_series(0, L - $n)) AS p
       |       FROM tw WHERE L >= $n),
       |gt AS (SELECT doc_id, p,
       |         substr(md5(array_to_string(ws[p + 1 : p + $n], ' ')), 1, 16) AS gram
       |       FROM gr),
       |df AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM gt GROUP BY 1),
       |rn AS (SELECT doc_id, p, gram,
       |         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, p) AS rn
       |       FROM gt),
       |cov AS (SELECT DISTINCT r.doc_id, r.p FROM rn r
       |        JOIN df d ON d.gram = r.gram
       |        WHERE d.df >= 2 AND r.rn > 1),
       |tok AS (SELECT doc_id, ws, L, unnest(generate_series(0, L - 1)) AS i FROM tw),
       |keep AS (SELECT t.doc_id, t.i, t.ws[t.i + 1] AS w
       |         FROM tok t LEFT JOIN cov c
       |           ON c.doc_id = t.doc_id AND t.i >= c.p AND t.i < c.p + $n
       |         WHERE c.p IS NULL),
       |ag AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS cleaned,
       |         COUNT(*) AS kept FROM keep GROUP BY 1)""".stripMargin

  val qDedupSpansKeepFirst: String =
    s"""${spansKeepFirstCtes(8)}
       |SELECT t.doc_id, COALESCE(a.cleaned, '') AS cleaned,
       |  CAST(t.L - COALESCE(a.kept, 0) AS BIGINT) AS n_removed
       |FROM tw t LEFT JOIN ag a ON a.doc_id = t.doc_id""".stripMargin

  /** The wire-format step's frame contract: text replaced in place. */
  val qPipelineSpansKeepFirst: String =
    s"""${spansKeepFirstCtes(8)}
       |SELECT t.doc_id, COALESCE(a.cleaned, '') AS text
       |FROM tw t LEFT JOIN ag a ON a.doc_id = t.doc_id""".stripMargin

  /** Target mixture for q_mix_sources — shared by the Spark query and
    * this oracle so both derive identical normalised shares.
    */
  val MixShares: Seq[(String, Double)] = Seq(
    "src0" -> 0.30, "src1" -> 0.25, "src2" -> 0.20,
    "src3" -> 0.15, "src4" -> 0.07, "src5" -> 0.03)

  /** Token-mass domain mixing (mirrors Sampling.mixByTokenMass over
    * MixShares, salt "mix0"): per-source mass → T = min(mass/w) →
    * rate = w·T/mass → keep iff the first 8 md5 hex digits sort below
    * floor(rate·16⁸) as zero-padded lowercase hex. Normalised share
    * literals are injected via Double.toString (round-trip exact), so
    * every arithmetic step is IEEE-identical in both engines.
    */
  private def mixSourcesCtes: String = {
    val total = MixShares.map(_._2).sum
    val values = MixShares
      .map { case (s, w) => s"('$s', ${(w / total).toString})" }
      .mkString(", ")
    s"""WITH tk AS (SELECT doc_id, source,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |w(source, w) AS (VALUES $values),
       |m AS (SELECT tk.source, CAST(SUM(tk.n_tokens) AS DOUBLE) AS mass
       |      FROM tk JOIN w ON w.source = tk.source GROUP BY 1),
       |mt AS (SELECT MIN(m.mass / w.w) AS t FROM m JOIN w USING (source)),
       |r AS (SELECT m.source, w.w * mt.t / m.mass AS rate
       |      FROM m JOIN w USING (source), mt)""".stripMargin
  }

  private val mixKeepPredicate: String =
    """substr(md5(CAST(tk.doc_id AS VARCHAR) || ':mix0'), 1, 8) <
      |  CASE WHEN r.rate >= 1.0 THEN 'g'
      |       ELSE lpad(lower(hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT))), 8, '0')
      |       END""".stripMargin

  val qMixSources: String =
    s"""$mixSourcesCtes
       |SELECT tk.doc_id, tk.source, tk.n_tokens, r.rate
       |FROM tk JOIN r ON r.source = tk.source
       |WHERE $mixKeepPredicate""".stripMargin

  /** Temperature mixing (Sampling.mixByTemperature, α=0.5, n_chars
    * mass, salt temp0): shares ∝ mass^α derived in-SQL, rate rounded
    * 1e-9 before the hex threshold exactly as the Spark side.
    */
  val qMixTemperature: String =
    """WITH m AS (SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS mass
      |           FROM documents GROUP BY source),
      |w AS (SELECT source, mass, power(mass, 0.5) AS wt FROM m),
      |t AS (SELECT MIN(mass / wt) AS t FROM w),
      |r AS (SELECT source, round(wt * t.t / mass, 9) AS rate FROM w, t)
      |SELECT d.doc_id, d.source, d.n_chars, r.rate
      |FROM documents d JOIN r USING (source)
      |WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp0'), 1, 8) <
      |  CASE WHEN r.rate >= 1.0 THEN 'g'
      |       ELSE lpad(lower(hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT))), 8, '0')
      |       END""".stripMargin

  /** The wire-format step's frame contract: a pure row filter. */
  val qPipelineMix: String =
    s"""$mixSourcesCtes
       |SELECT tk.doc_id, tk.source
       |FROM tk JOIN r ON r.source = tk.source
       |WHERE $mixKeepPredicate""".stripMargin

  /** BM25 top-10 retrieval (mirrors Index.bm25Search: k1=1.2, b=0.75,
    * maxDfRatio=0.773; queries = the first 12 normalised tokens of
    * every 37th document). All floating literals are injected from the
    * SAME Scala doubles via toString (round-trip exact) and every
    * arithmetic step associates identically to the Column expression;
    * the 1e-6 rounding inside the aggregation absorbs ln/sum-order
    * noise, and ranking orders by the ROUNDED score so the top-k cut
    * agrees across engines.
    */
  val qBm25: String = {
    val k1 = 1.2; val b = 0.75; val kTop = 10; val maxDfRatio = 0.773
    s"""$norm,
       |ql AS (SELECT doc_id AS query_id,
       |         array_to_string((string_split(nt, ' '))[1:12], ' ') AS qtext
       |       FROM norm WHERE doc_id % 37 = 0),
       |qt AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS tok
       |       FROM ql),
       |dt AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM norm),
       |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
       |       FROM dt GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(len(string_split(nt, ' ')) AS DOUBLE) AS dlen
       |       FROM norm),
       |dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df
       |          FROM tf GROUP BY 1
       |          HAVING CAST(COUNT(*) AS DOUBLE) <=
       |            $maxDfRatio * (SELECT CAST(COUNT(*) AS DOUBLE) FROM norm)),
       |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |         CAST(SUM(len(string_split(nt, ' '))) AS DOUBLE) AS sl FROM norm),
       |sc AS (SELECT q.query_id, f.doc_id,
       |         round(SUM(
       |           ln(1.0 + (st.n - d.df + 0.5) / (d.df + 0.5)) *
       |           (f.tf * ${k1 + 1.0}) /
       |           (f.tf + $k1 * (${1.0 - b} + $b * l.dlen / (st.sl / st.n)))
       |         ), 6) AS score
       |       FROM qt q JOIN dfreq d ON d.tok = q.tok
       |       JOIN tf f ON f.tok = q.tok
       |       JOIN dl l ON l.doc_id = f.doc_id, st
       |       GROUP BY 1, 2),
       |rk AS (SELECT query_id, doc_id, score,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY score DESC, doc_id) AS rank
       |       FROM sc)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, score
       |FROM rk WHERE rank <= $kTop""".stripMargin
  }

  /** Deterministic PII probe appended to every 7th document so the
    * scrub exercises real matches on the synthetic corpus (the raw
    * documents carry no contact info). Shared verbatim by the Spark
    * query and this oracle.
    */
  val PiiProbe: String =
    " contact bob@example.com via https://ex.com/a?b=1 at 10.0.0.1 or +1 (555) 123-4567"

  /** PII scrub oracle (mirrors TextOps.scrubPii): staged
    * regexp_replace with the SAME patterns — restricted to the
    * Java-regex ∩ RE2 common subset — counts taken on the stage each
    * category sees.
    */
  val qScrubPii: String = {
    import text.TextOps.{EmailPattern, IpPattern, PhonePattern, UrlPattern}
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN text || '$PiiProbe' ELSE text END AS tx
       |  FROM documents),
       |s1 AS (SELECT doc_id, tx,
       |         regexp_replace(tx, '$UrlPattern', '<URL>', 'g') AS a FROM t),
       |s2 AS (SELECT *, regexp_replace(a, '$EmailPattern', '<EMAIL>', 'g') AS b FROM s1),
       |s3 AS (SELECT *, regexp_replace(b, '$IpPattern', '<IP>', 'g') AS c FROM s2),
       |s4 AS (SELECT *, regexp_replace(c, '$PhonePattern', '<PHONE>', 'g') AS e FROM s3)
       |SELECT doc_id, e AS scrubbed,
       |  CAST(len(regexp_extract_all(tx, '$UrlPattern')) AS BIGINT) AS n_urls,
       |  CAST(len(regexp_extract_all(a, '$EmailPattern')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(b, '$IpPattern')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(c, '$PhonePattern')) AS BIGINT) AS n_phones
       |FROM s4""".stripMargin
  }

  /** Stratified deterministic sampling (mirrors
    * Sampling.hashSampleStratified: en 0.5, de 0.3, default 0.05,
    * salt "strat0"); thresholds come from the same Scala code so the
    * hex literals match exactly.
    */
  val qSampleStratified: String = {
    val langs = text.TextOps.LangMarkers
    val scoreExprs = langs.map { case (lang, ws) =>
      s"(${stopHits("pd", ws)}) AS s_$lang"
    }.mkString(", ")
    val best = s"greatest(${langs.map("s_" + _._1).mkString(", ")})"
    val langCase = langs.map { case (lang, _) =>
      s"WHEN s_$lang = $best AND $best > 0 THEN '$lang'"
    }.mkString(" ")
    val tEn = graft.sampling.Sampling.thresholdHex(0.5)
    val tDe = graft.sampling.Sampling.thresholdHex(0.3)
    val tDef = graft.sampling.Sampling.thresholdHex(0.05)
    s"""$norm, pad AS (SELECT doc_id, nt,
       |  ' ' || replace(nt, ' ', '  ') || ' ' AS pd FROM norm),
       |sc AS (SELECT doc_id, $scoreExprs FROM pad),
       |lp AS (SELECT doc_id, CASE $langCase ELSE 'unknown' END AS lang_pred
       |       FROM sc)
       |SELECT doc_id, lang_pred FROM lp
       |WHERE md5(CAST(doc_id AS VARCHAR) || ':strat0') <
       |  CASE WHEN lang_pred = 'en' THEN '$tEn'
       |       WHEN lang_pred = 'de' THEN '$tDe'
       |       ELSE '$tDef' END""".stripMargin
  }

  /** Exact-size balanced subset (mirrors Sampling.hashTopKPerStratum:
    * 20 docs per predicted language by salted md5 rank, salt "bal0").
    */
  val qSampleTopKStratum: String = {
    val langs = text.TextOps.LangMarkers
    val scoreExprs = langs.map { case (lang, ws) =>
      s"(${stopHits("pd", ws)}) AS s_$lang"
    }.mkString(", ")
    val best = s"greatest(${langs.map("s_" + _._1).mkString(", ")})"
    val langCase = langs.map { case (lang, _) =>
      s"WHEN s_$lang = $best AND $best > 0 THEN '$lang'"
    }.mkString(" ")
    s"""$norm, pad AS (SELECT doc_id, nt,
       |  ' ' || replace(nt, ' ', '  ') || ' ' AS pd FROM norm),
       |sc AS (SELECT doc_id, $scoreExprs FROM pad),
       |lp AS (SELECT doc_id, CASE $langCase ELSE 'unknown' END AS lang_pred
       |       FROM sc),
       |rk AS (SELECT doc_id, lang_pred,
       |         ROW_NUMBER() OVER (PARTITION BY lang_pred
       |           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':bal0'), doc_id)
       |           AS r
       |       FROM lp)
       |SELECT doc_id, lang_pred FROM rk WHERE r <= 20""".stripMargin
  }

  /** Shared CTE chain ending in `lp(doc_id, text, nt, lang_pred)` —
    * the language-prediction preamble used by several oracles.
    */
  private def langPredCtes: String = {
    val langs = text.TextOps.LangMarkers
    val scoreExprs = langs.map { case (lang, ws) =>
      s"(${stopHits("pd", ws)}) AS s_$lang"
    }.mkString(", ")
    val best = s"greatest(${langs.map("s_" + _._1).mkString(", ")})"
    val langCase = langs.map { case (lang, _) =>
      s"WHEN s_$lang = $best AND $best > 0 THEN '$lang'"
    }.mkString(" ")
    s"""$norm, pad AS (SELECT doc_id, text, nt,
       |  ' ' || replace(nt, ' ', '  ') || ' ' AS pd FROM norm),
       |sc AS (SELECT doc_id, text, nt, $scoreExprs FROM pad),
       |lp AS (SELECT doc_id, text, nt,
       |         CASE $langCase ELSE 'unknown' END AS lang_pred
       |       FROM sc)""".stripMargin
  }

  /** Exact per-language vocabulary stats (mirrors TextOps.vocabStats). */
  val qVocab: String =
    s"""$langPredCtes,
       |toks AS (SELECT doc_id, lang_pred,
       |           unnest(string_split(nt, ' ')) AS tok FROM lp)
       |SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct
       |FROM toks GROUP BY lang_pred""".stripMargin

  /** Bounded-error assertion for the HLL vocab estimate: the oracle
    * computes the exact side and expects `within_5pct = TRUE` per
    * language — the Spark side joins its HLL estimate against its own
    * exact count, so a sketch drifting outside the 5% envelope
    * hash-mismatches this row.
    */
  val qVocabApprox: String =
    s"""$langPredCtes,
       |toks AS (SELECT doc_id, lang_pred,
       |           unnest(string_split(nt, ' ')) AS tok FROM lp)
       |SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  TRUE AS within_5pct
       |FROM toks GROUP BY lang_pred""".stripMargin

  /** Per-language token-count quantiles (mirrors q_length_quantiles:
    * exact linear-interpolation percentiles — Spark `percentile` and
    * DuckDB `quantile_cont` use the same definition).
    */
  val qLengthQuantiles: String =
    s"""$langPredCtes,
       |nt2 AS (SELECT lang_pred,
       |  CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS n
       |  FROM lp)
       |SELECT lang_pred,
       |  quantile_cont(n, 0.25) AS p25,
       |  quantile_cont(n, 0.5) AS p50,
       |  quantile_cont(n, 0.75) AS p75
       |FROM nt2 GROUP BY lang_pred""".stripMargin

  /** Epoch-style upsampling oracle: same per-stratum factor table,
    * generate_series replication, and md5-vs-hex fractional draw as
    * Sampling.upsampleByFactor (hex literals from the same builder).
    */
  def qMixUpsample(factors: Seq[(String, Double)], salt: String): String = {
    val facCase = factors.map { case (s, f) => s"WHEN '$s' THEN $f" }
      .mkString("CASE source ", " ", " ELSE 1.0 END")
    val thrCase = factors.map { case (s, f) =>
      s"WHEN '$s' THEN '${graft.sampling.Sampling.thresholdHex(f - math.floor(f))}'"
    }.mkString("CASE source ", " ",
      s" ELSE '${graft.sampling.Sampling.thresholdHex(0.0)}' END")
    s"""WITH d AS (
       |  SELECT doc_id, source, $facCase AS fac FROM documents),
       |e AS (
       |  SELECT doc_id, source, fac,
       |    unnest(generate_series(1, CAST(ceil(fac) AS BIGINT))) AS copy_id
       |  FROM d WHERE fac > 0)
       |SELECT doc_id, source, CAST(copy_id AS BIGINT) AS copy_id
       |FROM e
       |WHERE copy_id <= CAST(floor(fac) AS BIGINT)
       |   OR md5(CAST(doc_id AS VARCHAR) || '#' || CAST(copy_id AS VARCHAR)
       |          || ':$salt') < $thrCase""".stripMargin
  }

  /** Envelope oracle for the quantile sketch (same shape as
    * qVocabApprox): per-language doc counts are exact; within_5pct is
    * TRUE — a drifting sketch estimate hash-mismatches the row.
    */
  val qLengthQuantilesApprox: String =
    s"""$langPredCtes
       |SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  TRUE AS within_5pct
       |FROM lp GROUP BY lang_pred""".stripMargin

  /** As-of join via DuckDB's NATIVE ASOF LEFT JOIN — an independent
    * engine implementation of the same inclusive backward-join
    * semantics as AsofJoin.asofJoin (right unique per (key, time) by
    * pre-aggregation).
    */
  val qAsofPurchase: String =
    """WITH e AS (
      |  SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t,
      |         event_id, value, event_type
      |  FROM events),
      |r AS (SELECT user_id, t, MAX(value) AS purchase_value
      |      FROM e WHERE event_type = 'purchase' GROUP BY user_id, t)
      |SELECT l.user_id, l.t, l.event_id, r.purchase_value
      |FROM e l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.t >= r.t""".stripMargin

  /** Tolerance-bounded as-of (AsofJoin with tolerance 1h): DuckDB's
    * native ASOF JOIN carries the matched right time; matches staler
    * than the bound null out.
    */
  val qAsofTolerance: String =
    """WITH e AS (
      |  SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t,
      |         event_id, value, event_type
      |  FROM events),
      |r AS (SELECT user_id, t, MAX(value) AS purchase_value
      |      FROM e WHERE event_type = 'purchase' GROUP BY user_id, t),
      |a AS (SELECT l.user_id, l.t, l.event_id, r.purchase_value,
      |        r.t AS rt
      |      FROM e l ASOF LEFT JOIN r
      |        ON l.user_id = r.user_id AND l.t >= r.t)
      |SELECT user_id, t, event_id,
      |  CASE WHEN rt >= t - 3600000000 THEN purchase_value END
      |    AS purchase_value
      |FROM a""".stripMargin

  /** Hierarchical ROLLUP revenue (StarQueries.revenueRollup): same
    * grouping-set expansion and GROUPING bitmask in DuckDB.
    */
  val qRollupRevenue: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
      |    * 10000) AS HUGEINT)) AS DOUBLE) / 10000.0, 2) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Keyless interval join over the 20 longest sessions (mirrors
    * q_range_join): sessions via the same gaps-and-islands chain as
    * qSessionize, top-20 by duration with a deterministic tie-break,
    * then a plain BETWEEN range join — the semantics the bucketized
    * Spark implementation must reproduce.
    */
  val qRangeJoin: String = {
    val gapUs = 3600L * 1000000L
    s"""WITH e AS (
       |  SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t,
       |         value, event_id
       |  FROM events),
       |m AS (
       |  SELECT user_id, t, value, event_id,
       |    CASE WHEN LAG(t) OVER w IS NULL OR t - LAG(t) OVER w > $gapUs
       |         THEN 1 ELSE 0 END AS ns
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
       |s AS (
       |  SELECT user_id, t, value,
       |    SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
       |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS sid
       |  FROM m),
       |agg AS (
       |  SELECT user_id, MIN(t) AS t_start_us, MAX(t) + $gapUs AS t_end_us
       |  FROM s GROUP BY user_id, sid),
       |top AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY t_end_us - t_start_us DESC,
       |           user_id, t_start_us) AS BIGINT) AS rk,
       |         user_id AS s_user, t_start_us, t_end_us
       |  FROM agg
       |  ORDER BY t_end_us - t_start_us DESC, user_id, t_start_us
       |  LIMIT 20)
       |SELECT top.rk, top.s_user, top.t_start_us, top.t_end_us,
       |  CAST(COUNT(e2.t) AS BIGINT) AS n_in,
       |  COALESCE(SUM(e2.value), 0.0) AS v_in
       |FROM top LEFT JOIN e e2
       |  ON e2.t >= top.t_start_us AND e2.t < top.t_end_us
       |GROUP BY top.rk, top.s_user, top.t_start_us, top.t_end_us""".stripMargin
  }

  /** Interval-overlap join (RangeJoin.intervalOverlapJoin over the 20
    * longest click vs view sessions, 1800 s gap): both session sets
    * via the gaps-and-islands chain, then the plain overlap predicate.
    */
  val qIntervalOverlap: String = {
    val gapUs = 1800L * 1000000L
    def sessions(tpe: String, pfx: String) =
      s"""e_$pfx AS (
         |  SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t,
         |         event_id
         |  FROM events WHERE event_type = '$tpe'),
         |m_$pfx AS (
         |  SELECT user_id, t, event_id,
         |    CASE WHEN LAG(t) OVER w IS NULL OR t - LAG(t) OVER w > $gapUs
         |         THEN 1 ELSE 0 END AS ns
         |  FROM e_$pfx WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         |s_$pfx AS (
         |  SELECT user_id, t,
         |    SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS sid
         |  FROM m_$pfx),
         |agg_$pfx AS (
         |  SELECT user_id, MIN(t) AS ts, MAX(t) + $gapUs AS te
         |  FROM s_$pfx GROUP BY user_id, sid),
         |top_$pfx AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY te - ts DESC,
         |           user_id, ts) AS BIGINT) AS ${pfx}_rk,
         |         user_id AS ${pfx}_user, ts AS ${pfx}_s, te AS ${pfx}_e
         |  FROM agg_$pfx
         |  ORDER BY te - ts DESC, user_id, ts
         |  LIMIT 20)""".stripMargin
    s"""WITH ${sessions("click", "c")},
       |${sessions("view", "v")}
       |SELECT c.c_rk, c.c_user, c.c_s, c.c_e,
       |  v.v_rk, v.v_user, v.v_s, v.v_e,
       |  least(c.c_e, v.v_e) - greatest(c.c_s, v.v_s) AS overlap_us
       |FROM top_c c JOIN top_v v
       |  ON c.c_s < v.v_e AND v.v_s < c.c_e""".stripMargin
  }

  /** Weighted sampling (Sampling.weightedSample, weight = n_chars,
    * k = 50, salt ws0): the identical seeded Gumbel arithmetic.
    */
  val qWeightedSample: String = {
    val u = s"(${hexInt8("CAST(doc_id AS VARCHAR) || ':ws0'")} + 0.5) / 4294967296.0"
    s"""WITH w AS (
       |  SELECT doc_id, text, lang, source, n_chars,
       |    round(ln(CAST(n_chars AS DOUBLE)) - ln(-ln($u)), 6)
       |      AS gumbel_score
       |  FROM documents WHERE n_chars > 0)
       |SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY gumbel_score DESC,
       |  doc_id) AS INTEGER) AS rank
       |FROM w ORDER BY gumbel_score DESC, doc_id LIMIT 50""".stripMargin
  }

  /** Typed JSON extraction rollup (mirrors SemiStructured.propsRollup). */
  val qJsonRollup: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
      |    AS sum_k,
      |  SUM(value) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin

  /** Long→wide event-type pivot (mirrors
    * SemiStructured.pivotEventCounts with the explicit type list).
    */
  val qPivotEvents: String = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cols = types.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
      .mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events GROUP BY user_id""".stripMargin
  }

  /** Inverted char-5-gram index with capped posting lists (mirrors
    * Index.invertedIndex n=5, maxPostings=10, doc_id < 150).
    */
  val qNgramIndex: String =
    s"""$norm, ni AS (
       |  SELECT doc_id, nt,
       |         unnest(generate_series(1, greatest(length(nt) - 4, 1))) AS i
       |  FROM norm WHERE doc_id < 150),
       |grams AS (SELECT DISTINCT doc_id, substr(nt, i, 5) AS shingle FROM ni)
       |SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df_count,
       |  array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 10), ',')
       |    AS postings
       |FROM grams GROUP BY shingle""".stripMargin

  /** Word-n-gram CTE fragment shared by the contamination oracles:
    * distinct word `n`-grams per doc with concat_ws null-skipping tail
    * semantics (mirrors Dedup.shingles' row-local slice/join form).
    */
  private def wordShingles(n: Int): String = {
    val terms = (0 until n).map(o => s"ws[i+$o]").mkString(", ")
    s"""words AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM norm),
       |wi AS (SELECT doc_id, ws,
       |         unnest(generate_series(1, greatest(len(ws) - ${n - 1}, 1))) AS i
       |       FROM words),
       |sh AS (SELECT DISTINCT doc_id, concat_ws(' ', $terms) AS shingle
       |       FROM wi)""".stripMargin
  }

  /** n-gram decontamination (mirrors Contamination.decontaminate:
    * eval = doc_id % 10 == 0, word 4-grams).
    */
  val qDecontaminate: String =
    s"""$norm, ${wordShingles(4)},
       |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
       |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0),
       |cnt AS (SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
       |        FROM tr JOIN ev USING (shingle) GROUP BY tr.doc_id)
       |SELECT d.doc_id, CAST(COALESCE(c.n_shared, 0) AS BIGINT) AS n_shared,
       |  CAST(CASE WHEN COALESCE(c.n_shared, 0) > 0 THEN 1 ELSE 0 END
       |       AS INTEGER) AS contaminated
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
       |LEFT JOIN cnt c USING (doc_id)""".stripMargin

  /** Corpus-common boilerplate ratio (mirrors
    * Contamination.boilerplateRatio: word 3-grams, minDocs = 5).
    */
  val qBoilerplate: String =
    s"""$norm, ${wordShingles(3)},
       |common AS (SELECT shingle FROM sh GROUP BY shingle
       |           HAVING COUNT(*) >= 5),
       |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
       |        FROM sh GROUP BY doc_id),
       |com AS (SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_common
       |        FROM sh JOIN common USING (shingle) GROUP BY sh.doc_id)
       |SELECT t.doc_id, t.n_shingles,
       |  CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
       |  CAST(COALESCE(c.n_common, 0) AS DOUBLE) / CAST(t.n_shingles AS DOUBLE)
       |    AS boilerplate_ratio
       |FROM tot t LEFT JOIN com c USING (doc_id)""".stripMargin

  /** Per-source cap (Sampling.capPerSource, cap 10, salt cap0): the
    * bounded min-k aggregation equals a per-source rank over the same
    * salted md5 order, which IS the oracle formulation.
    */
  val qSourceCap: String =
    """SELECT doc_id, text, lang, source, n_chars FROM (
      |  SELECT d.*, row_number() OVER (PARTITION BY source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap0'), doc_id) AS rn
      |  FROM documents d) WHERE rn <= 10""".stripMargin

  /** Gopher quality rules (TextOps.gopherRules, default thresholds).
    * Mean word length uses the same separator identity both sides:
    * Σ len(w) = len(nt) − (n−1).
    */
  val qGopherRules: String = {
    val stop = stopHits("pd", Seq("the", "a", "and", "of", "is"))
    s"""$norm, pad AS (SELECT doc_id, nt,
       |  ' ' || replace(nt, ' ', '  ') || ' ' AS pd FROM norm),
       |m AS (SELECT doc_id,
       |        CAST(len(string_split(nt, ' ')) AS BIGINT) AS n_words,
       |        length(nt) AS nc, CAST(($stop) AS BIGINT) AS stop_hits
       |      FROM pad),
       |r AS (SELECT doc_id, n_words,
       |        round(CAST(nc - n_words + 1 AS DOUBLE)
       |          / greatest(CAST(n_words AS DOUBLE), 1.0), 6) AS mean_word_len,
       |        CAST(nc - n_words + 1 AS DOUBLE)
       |          / greatest(CAST(n_words AS DOUBLE), 1.0) AS mwl,
       |        stop_hits FROM m)
       |SELECT doc_id, n_words, mean_word_len, stop_hits,
       |  (n_words >= 30 AND n_words <= 100000) AS ok_words,
       |  (mwl >= 3.0 AND mwl <= 10.0) AS ok_mwl,
       |  (stop_hits >= 2) AS ok_stop,
       |  ((n_words >= 30 AND n_words <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
       |    AND stop_hits >= 2) AS keep
       |FROM r""".stripMargin
  }

  /** Cross-source shingle overlap (Contamination.sourceOverlap, n=5):
    * per-source distinct word 5-grams (the shingles tail semantics —
    * a doc shorter than n yields its one shorter shingle), then the
    * pair counts via a plain self-join, which the bounded
    * collect_set formulation must reproduce.
    */
  val qSourceOverlap: String = {
    val terms = (0 until 5).map(o => s"ws[i+$o]").mkString(", ")
    s"""WITH snorm AS (
       |  SELECT source,
       |         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
       |  FROM documents),
       |words AS (SELECT source, string_split(nt, ' ') AS ws FROM snorm),
       |wi AS (SELECT source, ws,
       |         unnest(generate_series(1, greatest(len(ws) - 4, 1))) AS i
       |       FROM words),
       |sh AS (SELECT DISTINCT source, concat_ws(' ', $terms) AS shingle
       |       FROM wi)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
       |GROUP BY src_a, src_b""".stripMargin
  }

  /** Ordered funnel (Funnel.funnel, view → click → purchase): chained
    * strictly-after min-joins per stage, stage counts unioned.
    */
  val qFunnel: String =
    """WITH e AS (SELECT user_id, event_type,
      |  CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t FROM events),
      |s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
      |       WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT s1.user_id, MIN(e.t) AS t2 FROM s1 JOIN e
      |       ON e.user_id = s1.user_id AND e.event_type = 'click'
      |          AND e.t > s1.t1 GROUP BY s1.user_id),
      |s3 AS (SELECT s2.user_id, MIN(e.t) AS t3 FROM s2 JOIN e
      |       ON e.user_id = s2.user_id AND e.event_type = 'purchase'
      |          AND e.t > s2.t2 GROUP BY s2.user_id)
      |SELECT CAST(1 AS INTEGER) AS stage, 'view' AS step,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_users
      |UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
      |UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)""".stripMargin

  val qNgramJaccard: String =
    s"""$norm, ni AS (
       |  SELECT doc_id, nt,
       |         unnest(generate_series(1, greatest(length(nt) - 3, 1))) AS i
       |  FROM norm WHERE doc_id < 60),
       |grams AS (SELECT DISTINCT doc_id, substr(nt, i, 4) AS shingle FROM ni),
       |szs AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
       |ids AS (SELECT doc_id FROM norm WHERE doc_id < 60),
       |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |          FROM ids a, ids b WHERE a.doc_id < b.doc_id),
       |inter AS (SELECT p.id_a, p.id_b, count(*) AS n
       |          FROM pairs p
       |          JOIN grams ga ON ga.doc_id = p.id_a
       |          JOIN grams gb ON gb.doc_id = p.id_b AND gb.shingle = ga.shingle
       |          GROUP BY 1, 2),
       |j AS (SELECT p.id_a, p.id_b,
       |        CAST(COALESCE(i.n, 0) AS DOUBLE)
       |          / CAST(za.sz + zb.sz - COALESCE(i.n, 0) AS DOUBLE) AS jaccard
       |      FROM pairs p
       |      LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
       |      JOIN szs za ON za.doc_id = p.id_a
       |      JOIN szs zb ON zb.doc_id = p.id_b)
       |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.35""".stripMargin

  /** Gopher-style repetition signals (mirrors TextOps.repetitionStats):
    * top-token / top-bigram fractions and the distinct-token ratio over
    * the normalised token stream.
    */
  val qRepetition: String =
    s"""$norm,
       |tw AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM norm),
       |t AS (SELECT doc_id, unnest(ws) AS tok FROM tw),
       |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
       |ta AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |         MAX(c) AS top_tok, COUNT(*) AS n_distinct
       |       FROM tc GROUP BY 1),
       |b AS (SELECT doc_id,
       |        unnest(list_transform(range(1, len(ws)),
       |          i -> ws[i] || ' ' || ws[i + 1])) AS bigram
       |      FROM tw WHERE len(ws) > 1),
       |bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM b GROUP BY 1, 2),
       |ba AS (SELECT doc_id, MAX(c) AS top_bi, SUM(c) AS n_bi FROM bc GROUP BY 1)
       |SELECT ta.doc_id, ta.n_tokens,
       |  CAST(top_tok AS DOUBLE) / n_tokens AS top_token_frac,
       |  COALESCE(CAST(top_bi AS DOUBLE) / n_bi, 0.0) AS top_bigram_frac,
       |  CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio
       |FROM ta LEFT JOIN ba ON ba.doc_id = ta.doc_id""".stripMargin

  /** Sliding-window chunking (mirrors TextOps.chunkDocuments with
    * maxTokens=64, overlap=8): same start/stop arithmetic, 1-based
    * inclusive list slicing.
    */
  val qChunk: String = {
    val (maxTokens, overlap) = (64, 8)
    val step = maxTokens - overlap
    s"""$norm,
       |tw AS (SELECT doc_id, string_split(nt, ' ') AS ws,
       |         len(string_split(nt, ' ')) AS n FROM norm),
       |ch AS (SELECT doc_id, ws, n,
       |         unnest(range(0, GREATEST(
       |           CAST(ceil(CAST(n - $overlap AS DOUBLE) / $step) AS BIGINT), 1))) AS k
       |       FROM tw)
       |SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
       |  array_to_string(ws[1 + k * $step : LEAST(k * $step + $maxTokens, n)], ' ')
       |    AS chunk_text,
       |  CAST(LEAST($maxTokens, n - k * $step) AS BIGINT) AS n_tokens
       |FROM ch""".stripMargin
  }

  /** Shared CTEs ending in `wcost(w, cost)` — the greedy
    * longest-match BPE cost of every DISTINCT corpus word against the
    * corpus' own top-50 vocab (mirrors Bpe.corpusVocab +
    * Bpe.wordCost). The matching rule is a recursive CTE whose step
    * advances the cursor by the longest vocab entry prefixing the
    * remaining word (correlated MAX-length subquery), else 1 — the
    * identical rule the Spark expression folds.
    */
  private val bpeWcostCtes: String =
    s"""tl AS (SELECT unnest(string_split(nt, ' ')) AS tok FROM norm),
       |vcb AS (SELECT tok, COUNT(*) AS c FROM tl GROUP BY 1),
       |vocab AS (SELECT tok FROM vcb ORDER BY c DESC, tok LIMIT 50),
       |dw AS (SELECT DISTINCT unnest(string_split(nt, ' ')) AS w FROM norm),
       |rec(w, pos, cnt) AS (
       |  SELECT w, 1, 0 FROM dw
       |  UNION ALL
       |  SELECT w,
       |    pos + COALESCE((SELECT MAX(length(tok)) FROM vocab
       |                    WHERE length(tok) <= length(w) - pos + 1
       |                      AND substr(w, pos, length(tok)) = tok), 1),
       |    cnt + 1
       |  FROM rec WHERE pos <= length(w)),
       |wcost AS (SELECT w, MAX(cnt) AS cost FROM rec GROUP BY w)""".stripMargin

  /** BPE-budget chunking oracle (mirrors Bpe.chunkByBudget with
    * budget 48 over the corpus-vocab tokenizer): a second recursion
    * folds each document's word sequence through the greedy
    * chunk-fill rule, then chunks reassemble by (doc, chunk).
    */
  val qChunkBpe: String =
    s"""${norm.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |$bpeWcostCtes,
       |dw2 AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM norm),
       |wrd AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS i, ws FROM dw2),
       |wc2 AS (SELECT wrd.doc_id, wrd.i, wrd.ws[wrd.i] AS w, wcost.cost
       |        FROM wrd JOIN wcost ON wcost.w = wrd.ws[wrd.i]),
       |crec(doc_id, i, cid, filled) AS (
       |  SELECT doc_id, i, 0, cost FROM wc2 WHERE i = 1
       |  UNION ALL
       |  SELECT c.doc_id, n.i,
       |    CASE WHEN c.filled + n.cost <= 48 THEN c.cid ELSE c.cid + 1 END,
       |    CASE WHEN c.filled + n.cost <= 48 THEN c.filled + n.cost ELSE n.cost END
       |  FROM crec c JOIN wc2 n ON n.doc_id = c.doc_id AND n.i = c.i + 1)
       |SELECT w2.doc_id, CAST(cr.cid AS INTEGER) AS chunk_id,
       |  string_agg(w2.w, ' ' ORDER BY w2.i) AS chunk_text,
       |  CAST(SUM(w2.cost) AS BIGINT) AS n_tokens_bpe
       |FROM wc2 w2 JOIN crec cr ON cr.doc_id = w2.doc_id AND cr.i = w2.i
       |GROUP BY w2.doc_id, cr.cid""".stripMargin

  /** BPE-denominated sequence packing oracle (mirrors
    * Packing.packSequences with tokenCounter = Bpe.tokenCount, context
    * 512, 8 buckets, salt 'seqb'): per-doc BPE totals feed the same
    * two-level bucket cumsum as qPackSequences.
    */
  val qPackSequencesBpe: String = {
    val band = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""${norm.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |$bpeWcostCtes,
       |dwords AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS w FROM norm),
       |d AS (SELECT dw.doc_id, CAST(SUM(wc.cost) AS BIGINT) AS n_tokens,
       |        md5(CAST(dw.doc_id AS VARCHAR) || ':seqb') AS h
       |      FROM dwords dw JOIN wcost wc ON wc.w = dw.w
       |      GROUP BY dw.doc_id),
       |b AS (SELECT doc_id, n_tokens, h,
       |        CAST(($band) % 8 AS BIGINT) AS bucket FROM d),
       |p AS (SELECT doc_id, n_tokens, bucket,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
       |  FROM b)
       |SELECT doc_id, n_tokens, bucket,
       |  CAST(FLOOR(prefix / 512.0) AS BIGINT) AS seq,
       |  CAST(prefix - CAST(FLOOR(prefix / 512.0) AS BIGINT) * 512 AS BIGINT) AS offset
       |FROM p""".stripMargin
  }

  /** OOV rate vs the corpus' own top-50 tokens (mirrors
    * TextOps.oovRate: global counts, ties lexicographic).
    */
  val qOov: String =
    s"""$norm,
       |t AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM norm),
       |vc AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY 1),
       |vocab AS (SELECT tok FROM vc ORDER BY c DESC, tok LIMIT 50)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(COUNT(*) FILTER (v.tok IS NULL) AS BIGINT) AS n_oov,
       |  CAST(COUNT(*) FILTER (v.tok IS NULL) AS DOUBLE) / COUNT(*) AS oov_rate
       |FROM t LEFT JOIN vocab v ON v.tok = t.tok
       |GROUP BY doc_id""".stripMargin

  /** Self-trained bigram LM score (mirrors TextOps.bigramLmScore):
    * corpus-global bigram / prefix counts, per-doc mean ln ratio,
    * rounded to 1e-6 to absorb float-sum ordering noise.
    */
  val qLmScore: String =
    s"""$norm,
       |tw AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM norm),
       |bi AS (SELECT doc_id,
       |         unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
       |         unnest(list_transform(range(1, len(ws)),
       |           i -> ws[i] || ' ' || ws[i + 1])) AS bigram
       |       FROM tw WHERE len(ws) > 1),
       |cb AS (SELECT bigram, COUNT(*) AS c FROM bi GROUP BY 1),
       |cp AS (SELECT w1, COUNT(*) AS c FROM bi GROUP BY 1)
       |SELECT bi.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |  round(AVG(ln(CAST(cb.c AS DOUBLE) / cp.c)), 6) AS lm_score
       |FROM bi JOIN cb ON cb.bigram = bi.bigram JOIN cp ON cp.w1 = bi.w1
       |GROUP BY bi.doc_id""".stripMargin

  private val embCte =
    """WITH c AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |)""".stripMargin

  /** Cosine with the same zero-norm guard as Similarity.cosine. */
  private def cosSql(a: String, b: String): String =
    s"""CASE WHEN sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)) = 0
       | THEN 0.0
       | ELSE list_dot_product($a, $b)
       |   / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) END""".stripMargin

  /** JL random projection (Similarity.randomProject): the identical
    * ±1 sign matrix (from Similarity.rpSigns — the oracle builder
    * calls the same pure function) and one list_dot_product fold per
    * output component, scaled by the inlined 1/√outDim. Exploded to
    * scalar (vec_id, dim, value) rows (r13) to match the declared
    * query's wire shape — the driver compare cannot sort an array
    * column.
    */
  def qEmbedRp(outDim: Int = 16, salt: String = "rp",
               inDim: Int = 64): String = {
    val signs = graft.similarity.Similarity.rpSigns(inDim, outDim, salt)
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    val comps = signs.map { row =>
      val arr = row.map(s => s"$s.0").mkString("[", ", ", "]")
      s"round(list_dot_product(v, $arr) * $inv, 6)"
    }.mkString(",\n  ")
    s"""$embCte,
       |p AS (SELECT vec_id, [$comps] AS proj FROM c)
       |SELECT vec_id, CAST(g AS INTEGER) AS dim, proj[g + 1] AS value
       |FROM p, generate_series(0, ${outDim - 1}) t(g)""".stripMargin
  }

  /** JL distortion gate (Similarity.randomProjectGate): worst/mean
    * absolute cosine error over the bounded pair sample, 1e-9-fixed
    * terms, envelope verdict on the rounded maximum.
    */
  def qEmbedRpGate(outDim: Int = 16, maxId: Long = 40,
                   envelope: Double = 0.8, salt: String = "rp",
                   inDim: Int = 64): String = {
    val signs = graft.similarity.Similarity.rpSigns(inDim, outDim, salt)
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    val comps = signs.map { row =>
      val arr = row.map(s => s"$s.0").mkString("[", ", ", "]")
      s"round(list_dot_product(v, $arr) * $inv, 6)"
    }.mkString(",\n    ")
    s"""$embCte,
       |o AS (SELECT vec_id, v, [$comps] AS p
       |  FROM c WHERE vec_id < $maxId),
       |e AS (SELECT CAST(round(abs((${cosSql("a.v", "b.v")})
       |      - (${cosSql("a.p", "b.p")})) * 1e9) AS BIGINT) AS e9
       |  FROM o a JOIN o b ON a.vec_id < b.vec_id)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  round(CAST(MAX(e9) AS DOUBLE) / 1e9, 6) AS max_err,
       |  round((CAST(SUM(e9) AS DOUBLE) / COUNT(*)) / 1e9, 6) AS mean_err,
       |  round(CAST(MAX(e9) AS DOUBLE) / 1e9, 6) < $envelope AS ok
       |FROM e""".stripMargin
  }

  /** Embedding-space outliers (Similarity.centroidOutliers): distance
    * to own-label centroid, z-scored per label. Centroids, distances,
    * and stats all rounded 1e-9 before downstream use; the squared
    * deviation is an explicit multiply — identical arithmetic to the
    * Spark side.
    */
  val qEmbedOutliers: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |x AS (
      |  SELECT vec_id, label,
      |         CAST(round(unnest(v) * 1e9) AS BIGINT) AS val_i,
      |         generate_subscripts(v, 1) AS pos
      |  FROM e),
      |cent AS (
      |  SELECT label, pos,
      |    CAST(round(CAST(SUM(CAST(val_i AS HUGEINT)) AS DOUBLE)
      |               / COUNT(*)) AS BIGINT) AS cv_i
      |  FROM x GROUP BY 1, 2),
      |d AS (
      |  SELECT x.vec_id, x.label,
      |    CAST(round(sqrt(CAST(SUM(CAST(x.val_i - c.cv_i AS HUGEINT)
      |                             * (x.val_i - c.cv_i)) AS DOUBLE)))
      |      AS BIGINT) AS dist_i
      |  FROM x JOIN cent c ON c.label = x.label AND c.pos = x.pos
      |  GROUP BY 1, 2),
      |st AS (
      |  SELECT vec_id, label, dist_i,
      |    COUNT(*) OVER (PARTITION BY label) AS n,
      |    SUM(CAST(dist_i AS HUGEINT)) OVER (PARTITION BY label) AS s,
      |    SUM(CAST(dist_i AS HUGEINT) * dist_i)
      |      OVER (PARTITION BY label) AS q
      |  FROM d),
      |g AS (
      |  SELECT vec_id, label, dist_i,
      |    CAST(n * dist_i - s AS DOUBLE) AS num,
      |    sqrt(CAST(n * q - s * s AS DOUBLE)) AS den
      |  FROM st)
      |SELECT vec_id, label, round(dist_i / 1e9, 6) AS dist,
      |  round(CASE WHEN den = 0.0 THEN 0.0 ELSE num / den END, 6) AS z,
      |  CAST(round(CASE WHEN den = 0.0 THEN 0.0
      |             ELSE num / den END - 2.0, 6) > 0.0 AS INTEGER) AS outlier
      |FROM g""".stripMargin

  val qEmbedTopK: String =
    s"""$embCte, q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 50),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("qv", "v")} AS cosine
       |  FROM c, q WHERE c.vec_id <> q.query_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
       |FROM rk WHERE rank <= 10""".stripMargin

  /** IVF recall gate (Similarity.ivfRecall): the exact per-query brute
    * top-10 mean cosine, plus TRUE for the recall verdict the Spark
    * side computes in-plan against its own brute pass — IVF quality
    * drift hash-mismatches the row (the qVocabApprox envelope
    * discipline).
    */
  val qEmbedIvfRecall: String =
    s"""$embCte, q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 50),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("qv", "v")} AS cosine
       |  FROM c, q WHERE c.vec_id <> q.query_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id,
       |  round(CAST(SUM(CAST(round(cosine * 1e9) AS BIGINT)) AS DOUBLE)
       |        / COUNT(*) / 1e9, 6) AS brute_mean_cosine,
       |  TRUE AS recall_ok
       |FROM rk WHERE rank <= 10 GROUP BY query_id""".stripMargin

  /** Aggregate recall gate (Similarity.annRecallSummary over the
    * IVF-PQ serving config): exact n_queries + global brute mean
    * cosine, TRUE for the micro-recall verdict.
    */
  val qEmbedIvfPqRecall: String =
    s"""$embCte, q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 50),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("qv", "v")} AS cosine
       |  FROM c, q WHERE c.vec_id <> q.query_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
       |  round(CAST(SUM(CAST(round(cosine * 1e9) AS BIGINT)) AS DOUBLE)
       |        / COUNT(*) / 1e9, 6) AS brute_mean_cosine,
       |  TRUE AS recall_ok
       |FROM rk WHERE rank <= 10""".stripMargin

  /** Int8 quantization CTEs `mx, qz(vec_id, scale, qv)` over a prior
    * `c(vec_id, v)` — the identical floor(x/scale + 0.5) arithmetic as
    * Similarity.quantize (floor avoids round()-mode ambiguity across
    * engines).
    */
  private val quantTail =
    """mx AS (SELECT vec_id, v,
      |         list_max(list_transform(v, x -> abs(x))) AS m FROM c),
      |qz AS (SELECT vec_id, v,
      |         CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS scale,
      |         list_transform(v,
      |           x -> CAST(floor(x / (CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END) + 0.5)
      |                AS INTEGER)) AS qv
      |       FROM mx)""".stripMargin

  private val quantCte = s"$embCte,\n$quantTail"

  /** Hard-negative mining oracle (mirrors Similarity.hardNegatives):
    * top-k by cosine among DIFFERENT-label corpus vectors.
    */
  def qHardNegatives(k: Int = 5, queryMax: Int = 20): String =
    s"""WITH c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
       |),
       |q AS (SELECT vec_id AS query_id, v AS qv, label AS ql
       |      FROM c WHERE vec_id < $queryMax),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("qv", "v")} AS cosine
       |  FROM c, q WHERE c.vec_id <> q.query_id AND c.label <> q.ql),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
       |FROM rk WHERE rank <= $k""".stripMargin

  /** Source-interleave oracle (mirrors Sampling.interleaveSources). */
  def qInterleave(weights: Seq[(String, Double)], salt: String): String = {
    val wCase = weights.map { case (s, x) => s"WHEN '$s' THEN $x" }
      .mkString("CASE source ", " ", " ELSE 1.0 END")
    s"""WITH s AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':$salt'), doc_id) AS idx
       |  FROM documents)
       |SELECT doc_id, source, CAST(idx AS BIGINT) AS source_idx,
       |  idx / ($wCase) AS serve_key
       |FROM s""".stripMargin
  }

  /** L2-normalize / MRL-truncate oracles (mirror Similarity.l2Normalize
    * / truncateDims): exploded to (vec_id, dim, nval) doubles; the norm
    * is the same left-to-right list_dot_product fold as cosine's.
    */
  val qEmbedNormalize: String =
    s"""$embCte,
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM c),
       |i AS (SELECT vec_id, v, nrm,
       |        unnest(generate_series(1, len(v))) AS i FROM n)
       |SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
       |  CASE WHEN nrm = 0 THEN v[i] ELSE v[i] / nrm END AS nval
       |FROM i""".stripMargin

  def qEmbedMrl(d: Int = 16): String =
    s"""$embCte,
       |t AS (SELECT vec_id, v[1:$d] AS tv FROM c),
       |n AS (SELECT vec_id, tv, sqrt(list_dot_product(tv, tv)) AS nrm FROM t),
       |i AS (SELECT vec_id, tv, nrm,
       |        unnest(generate_series(1, len(tv))) AS i FROM n)
       |SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
       |  CASE WHEN nrm = 0 THEN tv[i] ELSE tv[i] / nrm END AS nval
       |FROM i""".stripMargin

  val qEmbedQuantize: String =
    s"""$quantCte
       |SELECT vec_id, scale, array_to_string(qv, ',') AS q_csv FROM qz""".stripMargin

  val qEmbedTopKQ8: String =
    s"""$quantCte,
       |q AS (SELECT vec_id AS query_id, scale AS qs,
       |        CAST(qv AS DOUBLE[]) AS qq FROM qz WHERE vec_id < 50),
       |scored AS (
       |  SELECT q.query_id, z.vec_id AS neighbor_id,
       |    q.qs * z.scale * list_dot_product(qq, CAST(z.qv AS DOUBLE[])) AS score
       |  FROM qz z, q WHERE z.vec_id <> q.query_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY score DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
       |FROM rk WHERE rank <= 10""".stripMargin

  val qEmbedLshTopK: String = {
    val bucket = (1 to 8).map(d =>
      s"CASE WHEN v[$d] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    s"""$embCte, cb AS (SELECT vec_id, v, $bucket AS bucket FROM c),
       |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM cb WHERE vec_id < 50),
       |scored AS (
       |  SELECT q.query_id, cb.vec_id AS neighbor_id,
       |    ${cosSql("qv", "v")} AS cosine
       |  FROM cb JOIN q ON cb.bucket = q.bucket AND cb.vec_id <> q.query_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
       |FROM rk WHERE rank <= 10""".stripMargin
  }

  /** Embedding drift oracle (Similarity.embeddingDrift over the
    * vec_id-parity split): per-(label, dim) exact integer component
    * sums, rounded-9 centroids, 1e-9-fixed squared differences.
    */
  def qEmbeddingDrift(threshold: Double, dim: Int = 64): String = {
    def side(pred: String, t: String) =
      s"""x$t AS (SELECT CAST(label AS BIGINT) AS label, d.i AS dim,
         |    CAST(round(v[d.i] * 1e6) AS BIGINT) AS x6
         |  FROM c, (SELECT unnest(generate_series(1, $dim)) AS i) d
         |  WHERE $pred),
         |c$t AS (SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n_$t,
         |    round(CAST(SUM(CAST(x6 AS HUGEINT)) AS DOUBLE)
         |      / COUNT(*) / 1e6, 9) AS c_$t
         |  FROM x$t GROUP BY 1, 2)""".stripMargin
    s"""WITH c AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |${side("vec_id % 2 = 0", "a")},
       |${side("vec_id % 2 = 1", "b")},
       |g AS (SELECT label, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
       |    SUM(CAST(round((c_a - c_b) * (c_a - c_b) * 1e9) AS BIGINT))
       |      AS d9
       |  FROM ca JOIN cb USING (label, dim) GROUP BY 1)
       |SELECT label, n_a, n_b,
       |  round(sqrt(d9 / 1e9), 6) AS centroid_shift,
       |  round(sqrt(d9 / 1e9) - $threshold, 6) > 0.0 AS drifted
       |FROM g""".stripMargin
  }

  /** Retrieval-eval oracle (Similarity.retrievalEval of the int8 MIPS
    * top-k against the float brute-force ground truth): both rankings
    * rebuilt exactly, per-item 1e-9-fixed DCG/RR terms, the ideal DCG
    * as the SAME driver-computed constant.
    */
  def qRetrievalEval(k: Int = 10, queryMax: Int = 50): String = {
    val idcg9: Long = (1 to k).map(i =>
      math.round((k + 1 - i).toDouble /
        (math.log(i + 1.0) / math.log(2.0)) * 1e9)).sum
    s"""$quantCte,
       |q AS (SELECT vec_id AS query_id, scale AS qs,
       |        CAST(qv AS DOUBLE[]) AS qq FROM qz WHERE vec_id < $queryMax),
       |ascored AS (
       |  SELECT q.query_id, z.vec_id AS neighbor_id,
       |    q.qs * z.scale * list_dot_product(qq, CAST(z.qv AS DOUBLE[]))
       |      AS score
       |  FROM qz z, q WHERE z.vec_id <> q.query_id),
       |a AS (SELECT query_id, neighbor_id, arank FROM (
       |  SELECT query_id, neighbor_id, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS arank
       |  FROM ascored) t WHERE arank <= $k),
       |bq AS (SELECT vec_id AS query_id, v AS qv2 FROM c
       |       WHERE vec_id < $queryMax),
       |bscored AS (
       |  SELECT bq.query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("qv2", "v")} AS cosine
       |  FROM c, bq WHERE c.vec_id <> bq.query_id),
       |b AS (SELECT query_id, neighbor_id, brank FROM (
       |  SELECT query_id, neighbor_id, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS brank
       |  FROM bscored) t WHERE brank <= $k),
       |j AS (SELECT a.query_id,
       |    CAST(round(COALESCE(${k + 1} - b.brank, 0)
       |      / log2(CAST(a.arank AS DOUBLE) + 1.0) * 1e9) AS BIGINT) AS dcg9,
       |    CASE WHEN b.brank = 1
       |         THEN CAST(round(1e9 / a.arank) AS BIGINT)
       |         ELSE 0 END AS rr9,
       |    CASE WHEN b.brank IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM a LEFT JOIN b
       |    ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id)
       |SELECT query_id, CAST(SUM(hit) AS BIGINT) AS hits,
       |  round(SUM(hit) / $k, 6) AS recall,
       |  round(MAX(rr9) / 1e9, 6) AS rr,
       |  round(SUM(dcg9) / 1e9, 6) AS dcg,
       |  round(CAST(SUM(dcg9) AS DOUBLE) / $idcg9, 6) AS ndcg
       |FROM j GROUP BY query_id""".stripMargin
  }

  /** kNN majority-vote oracle (Similarity.knnClassify): the brute
    * ranking, per-(query, label) vote counts, (votes desc, label asc)
    * argmax, correctness vs the query's own label.
    */
  def qKnnClassify(k: Int = 10, queryMax: Int = 50): String =
    s"""WITH c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv,
       |        CAST(label AS BIGINT) AS tl FROM c WHERE vec_id < $queryMax),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    CAST(c.label AS BIGINT) AS nl, ${cosSql("qv", "v")} AS cosine
       |  FROM c, q WHERE c.vec_id <> q.query_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, neighbor_id) AS rank FROM scored),
       |votes AS (SELECT query_id, nl, CAST(COUNT(*) AS BIGINT) AS votes
       |  FROM rk WHERE rank <= $k GROUP BY 1, 2),
       |best AS (SELECT query_id, nl, votes, row_number() OVER (
       |    PARTITION BY query_id ORDER BY votes DESC, nl ASC) AS rn
       |  FROM votes)
       |SELECT b.query_id, q.tl AS true_label, b.nl AS pred_label,
       |  b.votes, b.nl = q.tl AS correct
       |FROM best b JOIN q ON q.query_id = b.query_id WHERE rn = 1""".stripMargin

  /** Per-label P/R/F1 oracle (Similarity.knnF1): the full kNN
    * classification as a derived table, exact confusion-cell integers,
    * 1e-9-rounded ratios composed identically.
    */
  def qKnnF1(k: Int = 10, queryMax: Int = 50): String = {
    val p = "round(tp / npred, 9)"
    val r = "round(tp / n_true, 9)"
    s"""WITH cells AS (SELECT true_label, pred_label,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM (${qKnnClassify(k, queryMax)}) pr GROUP BY 1, 2),
       |bt AS (SELECT true_label AS label, SUM(n) AS n_true,
       |    SUM(CASE WHEN pred_label = true_label THEN n ELSE 0 END) AS tp
       |  FROM cells GROUP BY 1),
       |bp AS (SELECT pred_label AS label, SUM(n) AS npred
       |  FROM cells GROUP BY 1),
       |j AS (SELECT COALESCE(bt.label, bp.label) AS label,
       |    COALESCE(n_true, 0) AS n_true, COALESCE(tp, 0) AS tp,
       |    COALESCE(npred, 0) AS npred
       |  FROM bt FULL OUTER JOIN bp ON bt.label = bp.label)
       |SELECT label, CAST(n_true AS BIGINT) AS n_true,
       |  CAST(tp AS BIGINT) AS tp,
       |  CAST(npred - tp AS BIGINT) AS fp,
       |  CAST(n_true - tp AS BIGINT) AS fn,
       |  CASE WHEN npred = 0 THEN NULL
       |       ELSE round($p, 6) END AS "precision",
       |  CASE WHEN n_true = 0 THEN NULL
       |       ELSE round($r, 6) END AS recall,
       |  CASE WHEN npred = 0 OR n_true = 0 OR $p + $r = 0.0 THEN NULL
       |       ELSE round(2.0 * $p * $r / ($p + $r), 6) END AS f1
       |FROM j""".stripMargin
  }

  /** Vocabulary-coverage oracle (TextOps.vocabCoverage, ks 10/100/
    * 1000): the same deterministic head, cumulative masses, exact
    * integer shares.
    */
  def qVocabCoverage(ks: Seq[Int] = Seq(10, 100, 1000)): String =
    s"""$norm,
       |toks AS (SELECT unnest(string_split(nt, ' ')) AS tok FROM norm),
       |counts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM toks GROUP BY 1),
       |tot AS (SELECT SUM(cnt) AS tot FROM counts),
       |head AS (SELECT row_number() OVER (ORDER BY cnt DESC, tok) AS r,
       |    SUM(cnt) OVER (ORDER BY cnt DESC, tok
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mass
       |  FROM (SELECT * FROM counts ORDER BY cnt DESC, tok
       |        LIMIT ${ks.max}) h),
       |kk AS (SELECT unnest([${ks.mkString(", ")}]) AS k)
       |SELECT CAST(k AS INTEGER) AS k, CAST(MAX(r) AS BIGINT) AS top_terms,
       |  CAST(MAX(mass) AS BIGINT) AS head_mass,
       |  round(MAX(mass) / tot, 6) AS coverage
       |FROM kk JOIN head ON r <= k, tot GROUP BY k, tot""".stripMargin

  /** Diversity index (Profile.diversityIndex over document sources):
    * 1e-9-fixed entropy terms, exact Σc² Simpson, evenness from the
    * rounded H.
    */
  val qSourceDiversity: String =
    """WITH cells AS (SELECT source AS c, CAST(COUNT(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1),
      |t AS (SELECT SUM(o) AS n, CAST(COUNT(*) AS BIGINT) AS k FROM cells),
      |h AS (SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
      |    round(CAST(SUM(CAST(round((CAST(o AS DOUBLE) / n)
      |      * ln(CAST(o AS DOUBLE) / n) * -1e9) AS BIGINT)) AS DOUBLE)
      |      / 1e9, 6) AS shannon,
      |    SUM(CAST(o AS HUGEINT) * o) AS s2
      |  FROM cells, t GROUP BY 1, 2)
      |SELECT k, n, shannon,
      |  CASE WHEN k <= 1 THEN NULL
      |       ELSE round(shannon / ln(CAST(k AS DOUBLE)), 6) END AS evenness,
      |  round(CAST(s2 AS DOUBLE)
      |    / CAST(CAST(n AS HUGEINT) * n AS DOUBLE), 6) AS simpson
      |FROM h""".stripMargin

  /** Token-mass Gini across documents (Profile.gini over per-doc token
    * counts — the qGini machinery on the corpus).
    */
  val qTokenGini: String =
    """WITH cents AS (SELECT doc_id AS u,
      |    SUM(CAST(round(CAST(len(string_split_regex(trim(text), '\s+'))
      |      AS BIGINT) * 100) AS BIGINT)) AS x
      |  FROM documents GROUP BY 1),
      |r AS (SELECT x, row_number() OVER (ORDER BY x, u) AS rk FROM cents),
      |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
      |        SUM(CAST(x AS HUGEINT)) AS t,
      |        SUM(CAST(rk AS HUGEINT) * CAST(x AS HUGEINT)) AS s1
      |      FROM r)
      |SELECT n_units, round(CAST(t AS DOUBLE) / 100, 6) AS total,
      |  CASE WHEN t = 0 THEN NULL
      |       ELSE round(CAST(2 * s1 - (n_units + 1) * t AS DOUBLE)
      |                  / CAST(n_units * t AS DOUBLE), 6) END AS gini
      |FROM a""".stripMargin

  /** Per-source lexical health (TextOps.lexicalStats): ratios of
    * exact (source, token) counts.
    */
  val qLexicalStats: String =
    """WITH cw AS (
      |  SELECT source, unnest(string_split(
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
      |  FROM documents),
      |cn AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM cw GROUP BY 1, 2)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_types,
      |  round(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS ttr,
      |  round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 6) AS hapax_share
      |FROM cn GROUP BY 1""".stripMargin

  /** Pairwise source vocabulary drift (TextOps.vocabDrift): JS
    * divergence from the common-token join only — exclusive mass
    * contributes the analytic ln2 term; per-token 1e-9-fixed terms,
    * the ln2 constant inlined (engine ln(2) may differ in the last
    * ULP).
    */
  val qVocabDrift: String = {
    val ln2 = "0.6931471805599453"
    val p = "(CAST(a.c AS DOUBLE) / ta.n)"
    val q = "(CAST(b.c AS DOUBLE) / tb.n)"
    s"""WITH cw AS (
       |  SELECT source AS s, unnest(string_split(
       |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
       |  FROM documents),
       |cn AS (SELECT s, tok, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM cw GROUP BY 1, 2),
       |t AS (SELECT s, SUM(c) AS n FROM cn GROUP BY 1),
       |terms AS (
       |  SELECT a.s AS sa, b.s AS sb, a.c AS ca, b.c AS cb,
       |    CAST(round($p * ln(2.0 * $p / ($p + $q)) * 1e9) AS BIGINT) AS ta9,
       |    CAST(round($q * ln(2.0 * $q / ($p + $q)) * 1e9) AS BIGINT) AS tb9
       |  FROM cn a JOIN cn b ON a.tok = b.tok AND a.s < b.s
       |  JOIN t ta ON ta.s = a.s JOIN t tb ON tb.s = b.s),
       |pp AS (SELECT sa, sb, SUM(CAST(ta9 AS HUGEINT)) AS sta9,
       |    SUM(CAST(tb9 AS HUGEINT)) AS stb9,
       |    SUM(ca) AS cca, SUM(cb) AS ccb,
       |    CAST(COUNT(*) AS BIGINT) AS ncom
       |  FROM terms GROUP BY 1, 2),
       |allp AS (SELECT ta.s AS sa, tb.s AS sb, ta.n AS na, tb.n AS nb
       |  FROM t ta JOIN t tb ON ta.s < tb.s)
       |SELECT sa AS source_a, sb AS source_b,
       |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       |  COALESCE(ncom, 0) AS n_common,
       |  round((
       |    (CAST(COALESCE(sta9, 0) AS DOUBLE) / 1e9
       |      + $ln2 * CAST(na - COALESCE(cca, 0) AS DOUBLE) / na)
       |  + (CAST(COALESCE(stb9, 0) AS DOUBLE) / 1e9
       |      + $ln2 * CAST(nb - COALESCE(ccb, 0) AS DOUBLE) / nb)
       |  ) / 2.0, 6) AS js
       |FROM allp LEFT JOIN pp USING (sa, sb)""".stripMargin
  }

  /** Corpus report card (TextOps.corpusReport): each metric row
    * recomputed by its component's own oracle as a derived table.
    */
  def qCorpusReport: String =
    s"""SELECT 'n_docs' AS metric, CAST(COUNT(*) AS DOUBLE) AS value
       |FROM documents
       |UNION ALL
       |SELECT 'total_tokens',
       |  CAST(SUM(CAST(len(string_split_regex(trim(text), '\\s+'))
       |    AS BIGINT)) AS DOUBLE)
       |FROM documents
       |UNION ALL
       |SELECT 'mean_flesch',
       |  round(CAST(SUM(CAST(round(flesch * 1e6) AS BIGINT)) AS DOUBLE)
       |    / COUNT(*) / 1e6, 6)
       |FROM ($qReadability) rr
       |UNION ALL
       |SELECT 'zipf_slope', slope FROM ($qZipf) z1
       |UNION ALL
       |SELECT 'zipf_r', r FROM ($qZipf) z2
       |UNION ALL
       |SELECT 'coverage_top100', coverage
       |FROM (${qVocabCoverage(Seq(100))}) cv WHERE k = 100""".stripMargin

  /** Centroid-silhouette oracle (Similarity.silhouette): the unrolled
    * Lloyd assignment, per-vector own/other centroid distances fixed
    * 1e-9, s = (b−a)/max(a,b) fixed 1e-9, per-list exact-integer mean.
    */
  def qSilhouette(nlists: Int = 16, iters: Int = 3, dim: Int = 64): String =
    s"""${ivfAssignCtes(nlists, iters, dim)},
       |dd AS (SELECT f.vec_id, f.list, ct.list AS cl,
       |    CAST(round(sqrt(greatest(
       |      list_dot_product(f.v, f.v)
       |        - 2 * list_dot_product(f.v, ct.cent)
       |        + list_dot_product(ct.cent, ct.cent), 0.0)) * 1e9)
       |      AS BIGINT) AS d9
       |  FROM asgnF f CROSS JOIN cent$iters ct),
       |pv AS (SELECT vec_id, list,
       |    MIN(CASE WHEN cl = list THEN d9 END) AS a9,
       |    MIN(CASE WHEN cl <> list THEN d9 END) AS b9
       |  FROM dd GROUP BY 1, 2),
       |s AS (SELECT list,
       |    CASE WHEN greatest(a9, b9) = 0 THEN 0
       |         ELSE CAST(round(CAST(b9 - a9 AS DOUBLE) / greatest(a9, b9)
       |                * 1e9) AS BIGINT) END AS s9
       |  FROM pv)
       |SELECT CAST(list AS INTEGER) AS list,
       |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |  round(CAST(SUM(s9) AS DOUBLE) / COUNT(*) / 1e9, 6) AS silhouette
       |FROM s GROUP BY 1""".stripMargin

  /** LSH-blocked near-dup pairs: sign-bucket self-join + exact cosine
    * verify (mirrors Similarity.lshNearDupPairs with dims 0..7).
    */
  val qEmbedNearDupLsh: String = {
    val bucket = (1 to 8).map(d =>
      s"CASE WHEN v[$d] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    s"""$embCte, cb AS (SELECT vec_id, v, $bucket AS bucket FROM c),
       |p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${cosSql("a.v", "b.v")} AS cosine
       |  FROM cb a JOIN cb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.3""".stripMargin
  }

  /** Embeddings wire-pipeline oracles (mirror Registry.runEmbeddings):
    * a deterministic half-corpus hash sample (salt 'e7') feeds the
    * sign-LSH near-dup pairs / the quantize + int8 MIPS top-k — the
    * same operator SQL over the sampled `c`.
    */
  val qPipelineEmbed: String = {
    val t = graft.sampling.Sampling.thresholdHex(0.5)
    val bucket = (1 to 8).map(d =>
      s"CASE WHEN v[$d] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    s"""WITH c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE md5(CAST(vec_id AS VARCHAR) || ':e7') < '$t'),
       |cb AS (SELECT vec_id, v, $bucket AS bucket FROM c),
       |p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${cosSql("a.v", "b.v")} AS cosine
       |  FROM cb a JOIN cb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.3""".stripMargin
  }

  val qPipelineEmbedQ8: String = {
    val t = graft.sampling.Sampling.thresholdHex(0.5)
    s"""WITH c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE md5(CAST(vec_id AS VARCHAR) || ':e7') < '$t'),
       |$quantTail,
       |q AS (SELECT vec_id AS query_id, scale AS qs,
       |        CAST(qv AS DOUBLE[]) AS qq FROM qz WHERE vec_id < 50),
       |scored AS (
       |  SELECT q.query_id, z.vec_id AS neighbor_id,
       |    q.qs * z.scale * list_dot_product(qq, CAST(z.qv AS DOUBLE[])) AS score
       |  FROM qz z, q WHERE z.vec_id <> q.query_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY score DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
       |FROM rk WHERE rank <= 5""".stripMargin
  }

  val qEmbedNearDup: String =
    s"""$embCte, p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${cosSql("a.v", "b.v")} AS cosine
       |  FROM c a, c b
       |  WHERE a.vec_id < b.vec_id AND a.vec_id < 200 AND b.vec_id < 200)
       |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.3""".stripMargin

  /** IVF ANN oracle — replicates Similarity.ivfTopK end-to-end in SQL:
    * seeds = the `nlists` smallest-id corpus vectors; `iters` unrolled
    * Lloyd steps, each an argmin assignment by
    * (−2·v·c + ||c||², list) followed by per-dimension means (lists
    * with no members keep their previous centroid, as the Scala side's
    * partial update does); queries probe the `nprobe` nearest lists;
    * exact cosine top-k over the probed lists. Deterministic by
    * construction on both engines — the only cross-engine freedom is
    * summation order inside the 64-dim means, which can only change
    * the output if an ulp flips an argmin.
    */
  // nearest-list score: ||v−c||² minus the per-row constant ||v||²,
  // exactly the rank-equivalent form the Scala assignment codegens
  private def ivfScore(v: String, cent: String) =
    s"-2 * list_dot_product($v, $cent) + list_dot_product($cent, $cent)"

  /** Shared unrolled-Lloyd CTE chain: seeds, `iters` assignment+mean
    * steps, and the final assignment `asgnF(vec_id, v, list)` (with
    * `cent$iters` in scope for probe ranking) — the oracle twin of
    * Similarity.buildIvfIndex, reused by every IVF-derived oracle.
    */
  private def ivfAssignCtes(nlists: Int, iters: Int, dim: Int,
                            cDef: String = ""): String = {
    // MATERIALIZED throughout (r12): each Lloyd step references the
    // previous one, downstream oracles read asgnF several times (probe
    // join + residual/PQ stages), and DuckDB 1.0 inlines plain CTEs
    // per reference — the unrolled chain re-ran the full corpus
    // assignment exponentially often (q_embed_ivfpq_res_topk measured
    // 17.7 s → 1 s materialized, identical rows)
    def assign(cent: String, out: String) =
      s"""$out AS MATERIALIZED (
         |  SELECT vec_id, v, list FROM (
         |    SELECT c.vec_id, c.v, ct.list,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${ivfScore("c.v", "ct.cent")}, ct.list) AS rn
         |    FROM c, $cent ct)
         |  WHERE rn = 1)""".stripMargin
    val means = (1 to dim).map(j => s"avg(v[$j])").mkString(", ")
    val steps = (0 until iters).map { i =>
      s"""${assign(s"cent$i", s"asgn$i")},
         |mean$i AS MATERIALIZED (
         |  SELECT list, [$means] AS cent FROM asgn$i GROUP BY list),
         |cent${i + 1} AS MATERIALIZED (
         |  SELECT p.list, COALESCE(m.cent, p.cent) AS cent
         |  FROM cent$i p LEFT JOIN mean$i m ON m.list = p.list)""".stripMargin
    }.mkString(",\n")
    val lead = if (cDef.isEmpty) embCte else cDef
    s"""$lead,
       |cent0 AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list, v AS cent
       |  FROM c ORDER BY vec_id LIMIT $nlists),
       |$steps,
       |${assign(s"cent$iters", "asgnF")}""".stripMargin
  }

  /** Z-order key oracle (mirrors spatial.ZOrder.zkey over the panel's
    * unit grid): the identical shift/mask bit-spread ladder, staged
    * through CTE columns.
    */
  val qZorder: String =
    """WITH u AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS unit_id FROM events),
      |g AS (SELECT unit_id, unit_id % 40 AS lon, unit_id // 40 AS lat FROM u),
      |s1 AS (SELECT unit_id, lon, lat,
      |         ((lon & 65535) | ((lon & 65535) << 8)) & 16711935 AS lx,
      |         ((lat & 65535) | ((lat & 65535) << 8)) & 16711935 AS ly FROM g),
      |s2 AS (SELECT unit_id, lon, lat,
      |         (lx | (lx << 4)) & 252645135 AS lx,
      |         (ly | (ly << 4)) & 252645135 AS ly FROM s1),
      |s3 AS (SELECT unit_id, lon, lat,
      |         (lx | (lx << 2)) & 858993459 AS lx,
      |         (ly | (ly << 2)) & 858993459 AS ly FROM s2),
      |s4 AS (SELECT unit_id, lon, lat,
      |         (lx | (lx << 1)) & 1431655765 AS lx,
      |         (ly | (ly << 1)) & 1431655765 AS ly FROM s3)
      |SELECT unit_id, lon, lat, lx | (ly << 1) AS zkey FROM s4""".stripMargin

  private def pqScore(v: String, cent: String) =
    s"-2 * list_dot_product($v, $cent) + list_dot_product($cent, $cent)"

  /** Per-subspace unrolled-Lloyd codebooks + final code assignment
    * (mirrors Pq.buildPqIndex: seeds from the ksub smallest-id
    * vectors' subvectors, smallest-j tie-break). Assumes `c(vec_id,
    * v)` in scope; ends with `codes(vec_id, code0..code{m-1})` and
    * leaves each `ps{s}c{iters}` codebook in scope for LUTs.
    */
  private def pqCodeCtes(m: Int, ksub: Int, iters: Int, dim: Int,
                         src: String = "c"): String = {
    val dsub = dim / m
    def lo(s: Int) = s * dsub + 1
    def hi(s: Int) = (s + 1) * dsub
    val subCtes = (0 until m).map { s =>
      def assign(cent: String, out: String) =
        s"""$out AS (
           |  SELECT vec_id, sv, j FROM (
           |    SELECT c.vec_id, c.v[${lo(s)}:${hi(s)}] AS sv, ct.j,
           |      row_number() OVER (PARTITION BY c.vec_id
           |        ORDER BY ${pqScore(s"c.v[${lo(s)}:${hi(s)}]", "ct.cent")}, ct.j) AS rn
           |    FROM $src c, $cent ct)
           |  WHERE rn = 1)""".stripMargin
      val means = (1 to dsub).map(d => s"avg(sv[$d])").mkString(", ")
      val steps = (0 until iters).map { i =>
        s"""${assign(s"ps${s}c$i", s"ps${s}a$i")},
           |ps${s}m$i AS (SELECT j, [$means] AS cent FROM ps${s}a$i GROUP BY j),
           |ps${s}c${i + 1} AS (
           |  SELECT p.j, COALESCE(mm.cent, p.cent) AS cent
           |  FROM ps${s}c$i p LEFT JOIN ps${s}m$i mm ON mm.j = p.j)""".stripMargin
      }.mkString(",\n")
      s"""ps${s}c0 AS (SELECT j, v[${lo(s)}:${hi(s)}] AS cent FROM pqseed),
         |$steps,
         |${assign(s"ps${s}c$iters", s"ps${s}F")}""".stripMargin
    }.mkString(",\n")
    val codeJoin = (0 until m).map(s =>
      s"JOIN ps${s}F f$s ON f$s.vec_id = c.vec_id").mkString(" ")
    val codeCols = (0 until m).map(s => s"f$s.j AS code$s").mkString(", ")
    s"""pqseed AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v
       |  FROM $src ORDER BY vec_id LIMIT $ksub),
       |$subCtes,
       |codes AS (SELECT c.vec_id, $codeCols FROM $src c $codeJoin)""".stripMargin
  }

  /** Per-query partial-distance tables `qd{s}(query_id, j, d)` against
    * the trained codebooks, for queries vec_id < queryMax.
    */
  private def pqQdCtes(m: Int, iters: Int, dim: Int, queryMax: Int): String = {
    val dsub = dim / m
    (0 until m).map { s =>
      s"""qd$s AS (
         |  SELECT q.vec_id AS query_id, ct.j,
         |    ${pqScore(s"q.v[${s * dsub + 1}:${(s + 1) * dsub}]", "ct.cent")} AS d
         |  FROM c q, ps${s}c$iters ct WHERE q.vec_id < $queryMax)""".stripMargin
    }.mkString(",\n")
  }

  /** ADC scoring + top-k tail over a candidate relation `cd` that
    * carries (vec_id, code0..): distances summed in fixed subspace
    * order, ranked ascending with id tie-break.
    */
  private def pqRankTail(m: Int, k: Int, candidates: String,
                         candQueryCol: Option[String] = None,
                         perList: Boolean = false): String = {
    val dSum = (0 until m).map(s => s"d$s.d").mkString(" + ")
    val dJoins = (0 until m).map { s =>
      val qcond =
        if (s == 0) candQueryCol.fold("")(qc => s" AND d0.query_id = cd.$qc") +
          (if (perList) " AND d0.list = cd.list" else "")
        else s" AND d$s.query_id = d0.query_id" +
          (if (perList) s" AND d$s.list = d0.list" else "")
      s"JOIN qd$s d$s ON d$s.j = cd.code$s$qcond"
    }.mkString(" ")
    s"""scored AS (
       |  SELECT d0.query_id, cd.vec_id AS neighbor_id,
       |    round($dSum, 6) AS adc_dist
       |  FROM $candidates $dJoins
       |  WHERE cd.vec_id <> d0.query_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY adc_dist, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INTEGER) AS rank
       |FROM rk WHERE rank <= $k""".stripMargin
  }

  /** Product-quantization ADC top-k oracle (mirrors Pq.pqTopK):
    * full-corpus candidate scan over the codes.
    */
  def qEmbedPqTopK(k: Int = 10, m: Int = 4, ksub: Int = 8,
                   iters: Int = 2, dim: Int = 64): String =
    s"""$embCte,
       |${pqCodeCtes(m, ksub, iters, dim)},
       |${pqQdCtes(m, iters, dim, 50)},
       |${pqRankTail(m, k, "codes cd")}""".stripMargin

  /** IVF-PQ oracle (mirrors Pq.ivfPqTopK): the IVF unrolled-Lloyd
    * coarse assignment prunes candidates to each query's nprobe
    * nearest lists; ADC scores only those entries. Non-residual codes,
    * so the PQ chain is byte-identical to qEmbedPqTopK's.
    */
  def qEmbedIvfPqTopK(k: Int = 10, nlists: Int = 8, nprobe: Int = 2,
                      m: Int = 4, ksub: Int = 8, itersIvf: Int = 2,
                      itersPq: Int = 2, dim: Int = 64): String =
    s"""${ivfAssignCtes(nlists, itersIvf, dim)},
       |${pqCodeCtes(m, ksub, itersPq, dim)},
       |${pqQdCtes(m, itersPq, dim, 50)},
       |ql AS (
       |  SELECT query_id, list FROM (
       |    SELECT q.vec_id AS query_id, ct.list,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${ivfScore("q.v", "ct.cent")}, ct.list) AS rn
       |    FROM c q, cent$itersIvf ct WHERE q.vec_id < 50)
       |  WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT ql.query_id AS pq_query_id, cd.*
       |  FROM ql JOIN asgnF a ON a.list = ql.list
       |  JOIN codes cd ON cd.vec_id = a.vec_id),
       |${pqRankTail(m, k, "cand cd", candQueryCol = Some("pq_query_id"))}""".stripMargin

  /** Residual IVF-PQ oracle (mirrors Pq.ivfPqTopK(residual = true)):
    * codes quantize v − centroid(list); LUTs are per (query, probed
    * list) against the residual query q − centroid(list).
    */
  def qEmbedIvfPqResTopK(k: Int = 10, nlists: Int = 8, nprobe: Int = 2,
                         m: Int = 4, ksub: Int = 8, itersIvf: Int = 2,
                         itersPq: Int = 2, dim: Int = 64): String = {
    val dsub = dim / m
    val qdCtes = (0 until m).map { s =>
      val lo = s * dsub + 1; val hi = (s + 1) * dsub
      s"""qd$s AS (
         |  SELECT qr.query_id, qr.list, ct.j,
         |    ${pqScore(s"qr.v[$lo:$hi]", "ct.cent")} AS d
         |  FROM qres qr, ps${s}c$itersPq ct)""".stripMargin
    }.mkString(",\n")
    s"""${ivfAssignCtes(nlists, itersIvf, dim)},
       |resid AS (
       |  SELECT a.vec_id, a.list,
       |    list_transform(generate_series(1, len(a.v)),
       |      i -> a.v[i] - ct.cent[i]) AS v
       |  FROM asgnF a JOIN cent$itersIvf ct ON ct.list = a.list),
       |${pqCodeCtes(m, ksub, itersPq, dim, src = "resid")},
       |ql AS (
       |  SELECT query_id, list FROM (
       |    SELECT q.vec_id AS query_id, ct.list,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${ivfScore("q.v", "ct.cent")}, ct.list) AS rn
       |    FROM c q, cent$itersIvf ct WHERE q.vec_id < 50)
       |  WHERE rn <= $nprobe),
       |qres AS (
       |  SELECT ql.query_id, ql.list,
       |    list_transform(generate_series(1, len(q.v)),
       |      i -> q.v[i] - ct.cent[i]) AS v
       |  FROM ql JOIN c q ON q.vec_id = ql.query_id
       |  JOIN cent$itersIvf ct ON ct.list = ql.list),
       |$qdCtes,
       |cand AS (
       |  SELECT ql.query_id AS pq_query_id, a.list, cd.vec_id,
       |    ${(0 until m).map(s => s"cd.code$s").mkString(", ")}
       |  FROM ql JOIN asgnF a ON a.list = ql.list
       |  JOIN codes cd ON cd.vec_id = a.vec_id),
       |${pqRankTail(m, k, "cand cd", candQueryCol = Some("pq_query_id"),
          perList = true)}""".stripMargin
  }

  def qEmbedIvfTopK(k: Int = 10, nlists: Int = 16, nprobe: Int = 4,
                    iters: Int = 3, dim: Int = 64): String =
    s"""${ivfAssignCtes(nlists, iters, dim)},
       |ql AS (
       |  SELECT query_id, list FROM (
       |    SELECT q.vec_id AS query_id, ct.list,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${ivfScore("q.v", "ct.cent")}, ct.list) AS rn
       |    FROM c q, cent$iters ct WHERE q.vec_id < 50)
       |  WHERE rn <= $nprobe),
       |qv AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 50),
       |scored AS (
       |  SELECT ql.query_id, a.vec_id AS neighbor_id,
       |    ${cosSql("qv.qv", "a.v")} AS cosine
       |  FROM ql
       |  JOIN asgnF a ON a.list = ql.list
       |  JOIN qv ON qv.query_id = ql.query_id
       |  WHERE a.vec_id <> ql.query_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
       |FROM rk WHERE rank <= $k""".stripMargin

  /** IVF quantizer health audit (Similarity.ivfStats): the same Lloyd
    * assignment, distance to own centroid via the identical
    * left-associated dot chain, per-list means from exact 1e-9-unit
    * integer sums.
    */
  def qIvfStats(nlists: Int = 16, iters: Int = 3, dim: Int = 64): String =
    s"""${ivfAssignCtes(nlists, iters, dim)},
       |dd AS (
       |  SELECT a.list,
       |    CAST(round(sqrt(greatest(
       |      list_dot_product(a.v, a.v)
       |        - 2 * list_dot_product(a.v, ct.cent)
       |        + list_dot_product(ct.cent, ct.cent), 0.0)) * 1e9)
       |      AS BIGINT) AS di
       |  FROM asgnF a JOIN cent$iters ct ON ct.list = a.list),
       |g AS (
       |  SELECT CAST(list AS INTEGER) AS list,
       |    CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |    SUM(CAST(di AS HUGEINT)) AS s
       |  FROM dd GROUP BY 1),
       |t AS (SELECT SUM(n_vecs) AS tot FROM g)
       |SELECT list, n_vecs,
       |  round(CAST(n_vecs AS DOUBLE) / tot, 6) AS share,
       |  round(CAST(s AS DOUBLE) / n_vecs / 1e9, 6) AS mean_dist
       |FROM g, t""".stripMargin

  /** Cluster-diverse sampling oracle: the same Lloyd assignment, then
    * a per-cluster deterministic hash rank capped at `perCluster`
    * (mirrors Similarity.diverseSample / Sampling.hashTopKPerStratum).
    */
  def qEmbedDiverse(perCluster: Int, salt: String, nlists: Int = 16,
                    iters: Int = 3, dim: Int = 64): String =
    s"""${ivfAssignCtes(nlists, iters, dim)},
       |rk AS (SELECT vec_id, list,
       |  ROW_NUMBER() OVER (PARTITION BY list
       |    ORDER BY md5(CAST(vec_id AS VARCHAR) || ':$salt'), vec_id) AS r
       |  FROM asgnF)
       |SELECT vec_id, CAST(list AS INTEGER) AS list
       |FROM rk WHERE r <= $perCluster""".stripMargin

  /** SemDeDup oracle: the same Lloyd assignment, then within-cluster
    * near-dup pruning — a vector is dropped when a lower-id clustermate
    * has cosine ≥ threshold (mirrors Similarity.semanticDedup).
    */
  def qSemanticDedup(threshold: Double, nlists: Int = 16,
                     iters: Int = 3, dim: Int = 64): String =
    s"""${ivfAssignCtes(nlists, iters, dim)},
       |drp AS (
       |  SELECT DISTINCT b.vec_id AS id_b
       |  FROM asgnF a JOIN asgnF b
       |    ON a.list = b.list AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.v", "b.v")} >= $threshold)
       |SELECT a.vec_id, CAST(a.list AS INTEGER) AS list
       |FROM asgnF a LEFT JOIN drp ON drp.id_b = a.vec_id
       |WHERE drp.id_b IS NULL""".stripMargin

  /** Shared CTE chain ending in `feat(doc_id, nt, fingerprint,
    * n_tokens, quality, lang_pred)` — the per-document analysis
    * columns of TextOps.analyze over the normalised corpus.
    */
  private lazy val corpusFeatCtes: String = {
    val langs = text.TextOps.LangMarkers
    val scoreExprs = langs.map { case (lang, ws) =>
      s"(${stopHits("pd", ws)}) AS s_$lang"
    }.mkString(", ")
    val best = s"greatest(${langs.map("s_" + _._1).mkString(", ")})"
    val langCase = langs.map { case (lang, _) =>
      s"WHEN s_$lang = $best AND $best > 0 THEN '$lang'"
    }.mkString(" ")
    s"""$norm, pad AS (SELECT doc_id, text, nt,
       |  ' ' || replace(nt, ' ', '  ') || ' ' AS pd FROM norm),
       |sc AS (SELECT doc_id, text, nt, $scoreExprs,
       |         (${stopHits("pd", Seq("the", "a", "and", "of", "is"))}) AS stop_hits
       |       FROM pad),
       |feat AS (
       |  SELECT doc_id, nt, md5(nt) AS fingerprint,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    least(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / 200.0, 1.0) * 0.4
       |      + (1.0 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
       |          / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.3
       |      + least(stop_hits / 10.0, 1.0) * 0.3 AS quality,
       |    CASE $langCase ELSE 'unknown' END AS lang_pred
       |  FROM sc)""".stripMargin
  }

  /** Embedding curation chain oracle (mirrors the wire spec
    * normalize → semdedup → topk): L2 normalization feeds the Lloyd
    * clustering and the within-cluster pruning; the final exact top-k
    * runs over the SURVIVORS with surviving sub-`queryMax` vectors as
    * queries — step order is part of the checked contract.
    */
  def qPipelineEmbedCurated(threshold: Double = 0.3, k: Int = 5,
                            queryMax: Int = 20, nlists: Int = 16,
                            iters: Int = 3, dim: Int = 64): String = {
    val normDef =
      """WITH c0 AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |),
        |c AS (
        |  SELECT vec_id,
        |    CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
        |         ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
        |    END AS v
        |  FROM c0)""".stripMargin
    s"""${ivfAssignCtes(nlists, iters, dim, cDef = normDef)},
       |drp AS (
       |  SELECT DISTINCT b.vec_id AS id_b
       |  FROM asgnF a JOIN asgnF b
       |    ON a.list = b.list AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.v", "b.v")} >= $threshold),
       |surv AS (
       |  SELECT a.vec_id, a.v FROM asgnF a
       |  LEFT JOIN drp ON drp.id_b = a.vec_id WHERE drp.id_b IS NULL),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM surv
       |      WHERE vec_id < $queryMax),
       |scored AS (
       |  SELECT q.query_id, s.vec_id AS neighbor_id,
       |    ${cosSql("qv", "s.v")} AS cosine
       |  FROM surv s, q WHERE s.vec_id <> q.query_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
       |FROM rk WHERE rank <= $k""".stripMargin
  }

  /** Token-budget curation oracle (mirrors Sampling.budgetByTokens over
    * qualityScore/tokenCount): ordered cumulative token mass capped at
    * the budget.
    */
  def qBudgetSample(budget: Long = 5000L): String =
    s"""$corpusFeatCtes,
       |cum AS (
       |  SELECT doc_id, n_tokens,
       |    SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS cum_tokens
       |  FROM feat)
       |SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM cum WHERE cum_tokens <= $budget""".stripMargin

  /** The composed corpus-preparation pipeline: drop normalised-text
    * duplicates (keep the canonical id), keep documents above a quality
    * floor whose predicted language is English, emit the surviving ids
    * with their stats — the realistic end-to-end shape the individual
    * text/dedup operators exist for.
    */
  val qCorpusFilter: String =
    s"""$corpusFeatCtes,
       |dedup AS (
       |  SELECT *, MIN(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id
       |  FROM feat)
       |SELECT doc_id, n_tokens, quality, lang_pred
       |FROM dedup
       |WHERE doc_id = canonical_id AND quality >= 0.5 AND lang_pred = 'en'""".stripMargin

  /** JSON-wire corpus pipeline (Registry.runCorpus): quality_filter
    * [0.5, 'en'] → dedup_exact → chunk [64, 8]. Step order matters and
    * the oracle mirrors it: the quality gate runs FIRST, so canonical
    * selection happens among the gate's survivors (unlike
    * qCorpusFilter, which dedups first).
    */
  val qPipelineCorpus: String = {
    val (maxTokens, overlap) = (64, 8)
    val step = maxTokens - overlap
    s"""$corpusFeatCtes,
       |keep AS (
       |  SELECT doc_id, nt, fingerprint FROM feat
       |  WHERE quality >= 0.5 AND lang_pred = 'en'),
       |ded AS (
       |  SELECT doc_id, nt,
       |         MIN(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id
       |  FROM keep),
       |tw AS (SELECT doc_id, string_split(nt, ' ') AS ws,
       |         len(string_split(nt, ' ')) AS n
       |       FROM ded WHERE doc_id = canonical_id),
       |ch AS (SELECT doc_id, ws, n,
       |         unnest(range(0, GREATEST(
       |           CAST(ceil(CAST(n - $overlap AS DOUBLE) / $step) AS BIGINT), 1))) AS k
       |       FROM tw)
       |SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
       |  array_to_string(ws[1 + k * $step : LEAST(k * $step + $maxTokens, n)], ' ')
       |    AS chunk_text,
       |  CAST(LEAST($maxTokens, n - k * $step) AS BIGINT) AS n_tokens
       |FROM ch""".stripMargin
  }

  /** Full-curation wire pipeline oracle (mirrors
    * q_pipeline_corpus_full: scrub_pii → remove_repeated_spans [8,2]
    * → quality_filter [0.3] → dedup_exact → chunk [64,8] →
    * pack_sequences [512,8,'seqf']). Each stage re-derives the
    * corresponding operator's established SQL on the PREVIOUS stage's
    * text: scrub on the probe-augmented documents, span removal on the
    * scrubbed text, quality/fingerprint/chunk on the span-cleaned
    * (normalised) text, and the packing hash on the composite
    * doc:chunk key (the frame is chunk-granular by then).
    */
  val qPipelineCorpusFull: String = {
    import text.TextOps.{EmailPattern, IpPattern, PhonePattern, UrlPattern}
    val n = 8                          // span n-gram
    val (maxTokens, overlap) = (64, 8) // chunk
    val step = maxTokens - overlap
    val (context, nBuckets) = (512, 8) // pack
    val stop = stopHits("pd", Seq("the", "a", "and", "of", "is"))
    val band = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN text || '$PiiProbe' ELSE text END AS tx
       |  FROM documents),
       |s1 AS (SELECT doc_id, regexp_replace(tx, '$UrlPattern', '<URL>', 'g') AS a FROM t),
       |s2 AS (SELECT doc_id, regexp_replace(a, '$EmailPattern', '<EMAIL>', 'g') AS b FROM s1),
       |s3 AS (SELECT doc_id, regexp_replace(b, '$IpPattern', '<IP>', 'g') AS c FROM s2),
       |s4 AS (SELECT doc_id, regexp_replace(c, '$PhonePattern', '<PHONE>', 'g') AS sc FROM s3),
       |nrm AS (SELECT doc_id,
       |          trim(regexp_replace(lower(sc), '\\s+', ' ', 'g')) AS nt FROM s4),
       |tw AS (SELECT doc_id, string_split(nt, ' ') AS ws,
       |         len(string_split(nt, ' ')) AS L FROM nrm),
       |gr AS (SELECT doc_id, ws, unnest(generate_series(0, L - $n)) AS p
       |       FROM tw WHERE L >= $n),
       |gt AS (SELECT doc_id, p,
       |         substr(md5(array_to_string(ws[p + 1 : p + $n], ' ')), 1, 16) AS gram
       |       FROM gr),
       |dup AS (SELECT gram FROM (
       |          SELECT gram, COUNT(DISTINCT doc_id) AS df FROM gt GROUP BY 1) x
       |        WHERE df >= 2),
       |cov AS (SELECT DISTINCT g.doc_id, g.p FROM gt g JOIN dup d ON d.gram = g.gram),
       |tok AS (SELECT doc_id, ws, L, unnest(generate_series(0, L - 1)) AS i FROM tw),
       |keep0 AS (SELECT t.doc_id, t.i, t.ws[t.i + 1] AS w
       |          FROM tok t LEFT JOIN cov c
       |            ON c.doc_id = t.doc_id AND t.i >= c.p AND t.i < c.p + $n
       |          WHERE c.p IS NULL),
       |ag AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS cleaned
       |       FROM keep0 GROUP BY 1),
       |cl AS (SELECT t.doc_id, COALESCE(a.cleaned, '') AS ct
       |       FROM tw t LEFT JOIN ag a ON a.doc_id = t.doc_id),
       |pad AS (SELECT doc_id, ct,
       |          ' ' || replace(ct, ' ', '  ') || ' ' AS pd FROM cl),
       |qs AS (SELECT doc_id, ct,
       |  least(CAST(len(string_split_regex(trim(ct), '\\s+')) AS DOUBLE) / 200.0, 1.0) * 0.4
       |    + (1.0 - (length(ct) - length(regexp_replace(ct, '[.,!?;:]', '', 'g')))
       |        / CAST(greatest(length(ct), 1) AS DOUBLE)) * 0.3
       |    + least(($stop) / 10.0, 1.0) * 0.3 AS q
       |  FROM pad),
       |keep AS (SELECT doc_id, ct FROM qs WHERE q >= 0.3),
       |ded AS (SELECT doc_id, ct,
       |          MIN(doc_id) OVER (PARTITION BY md5(ct)) AS canonical_id
       |        FROM keep),
       |tw2 AS (SELECT doc_id, string_split(ct, ' ') AS ws,
       |          len(string_split(ct, ' ')) AS nn
       |        FROM ded WHERE doc_id = canonical_id),
       |ch AS (SELECT doc_id, ws, nn,
       |         unnest(range(0, GREATEST(
       |           CAST(ceil(CAST(nn - $overlap AS DOUBLE) / $step) AS BIGINT), 1))) AS k
       |       FROM tw2),
       |chunks AS (SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
       |    array_to_string(ws[1 + k * $step : LEAST(k * $step + $maxTokens, nn)], ' ')
       |      AS ctext
       |  FROM ch),
       |pk AS (SELECT doc_id, chunk_id,
       |    CAST(len(string_split_regex(trim(ctext), '\\s+')) AS BIGINT) AS n_tokens,
       |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_id AS VARCHAR)
       |        || ':seqf') AS h,
       |    CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_id AS VARCHAR) AS pid
       |  FROM chunks),
       |bk AS (SELECT *, CAST(($band) % $nBuckets AS BIGINT) AS bucket FROM pk),
       |pr AS (SELECT doc_id, chunk_id, n_tokens, bucket,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY h, pid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
       |  FROM bk)
       |SELECT doc_id, chunk_id, n_tokens, bucket,
       |  CAST(FLOOR(prefix / $context.0) AS BIGINT) AS seq,
       |  CAST(prefix - CAST(FLOOR(prefix / $context.0) AS BIGINT) * $context
       |       AS BIGINT) AS offset
       |FROM pr""".stripMargin
  }

  /** Signal-append wire pipeline oracle (mirrors
    * q_pipeline_corpus_signals: decontaminate [4,10] → repetition →
    * oov [50] → lm_score → boilerplate [3,5]). Decontamination keys
    * off the FULL corpus (train vs eval split on doc_id % 10); every
    * later stat is computed over the narrowed train frame, exactly as
    * the left-to-right step composition implies.
    */
  val qPipelineCorpusSignals: String =
    s"""$norm,
       |w4 AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM norm),
       |i4 AS (SELECT doc_id, ws,
       |         unnest(generate_series(1, greatest(len(ws) - 3, 1))) AS i
       |       FROM w4),
       |sh4 AS (SELECT DISTINCT doc_id,
       |          concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3]) AS shingle
       |        FROM i4),
       |ev AS (SELECT DISTINCT shingle FROM sh4 WHERE doc_id % 10 = 0),
       |trn AS (SELECT doc_id, shingle FROM sh4 WHERE doc_id % 10 <> 0),
       |cnt AS (SELECT trn.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
       |        FROM trn JOIN ev USING (shingle) GROUP BY trn.doc_id),
       |tw AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM norm
       |       WHERE doc_id % 10 <> 0),
       |tk AS (SELECT doc_id, unnest(ws) AS tok FROM tw),
       |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tk GROUP BY 1, 2),
       |ta AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |         MAX(c) AS top_tok, COUNT(*) AS n_distinct
       |       FROM tc GROUP BY 1),
       |bi AS (SELECT doc_id,
       |         unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
       |         unnest(list_transform(range(1, len(ws)),
       |           i -> ws[i] || ' ' || ws[i + 1])) AS bigram
       |       FROM tw WHERE len(ws) > 1),
       |bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bi GROUP BY 1, 2),
       |ba AS (SELECT doc_id, MAX(c) AS top_bi, SUM(c) AS n_bi FROM bc GROUP BY 1),
       |vc AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY 1),
       |vocab AS (SELECT tok FROM vc ORDER BY c DESC, tok LIMIT 50),
       |ov AS (SELECT doc_id,
       |         CAST(COUNT(*) FILTER (v.tok IS NULL) AS BIGINT) AS n_oov,
       |         CAST(COUNT(*) FILTER (v.tok IS NULL) AS DOUBLE) / COUNT(*) AS oov_rate
       |       FROM tk LEFT JOIN vocab v ON v.tok = tk.tok
       |       GROUP BY doc_id),
       |cb AS (SELECT bigram, COUNT(*) AS c FROM bi GROUP BY 1),
       |cp AS (SELECT w1, COUNT(*) AS c FROM bi GROUP BY 1),
       |lm AS (SELECT bi.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |         round(AVG(ln(CAST(cb.c AS DOUBLE) / cp.c)), 6) AS lm_score
       |       FROM bi JOIN cb ON cb.bigram = bi.bigram JOIN cp ON cp.w1 = bi.w1
       |       GROUP BY bi.doc_id),
       |i3 AS (SELECT doc_id, ws,
       |         unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i
       |       FROM tw),
       |sh3 AS (SELECT DISTINCT doc_id,
       |          concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS shingle
       |        FROM i3),
       |common AS (SELECT shingle FROM sh3 GROUP BY shingle
       |           HAVING COUNT(*) >= 5),
       |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
       |        FROM sh3 GROUP BY doc_id),
       |com AS (SELECT sh3.doc_id, CAST(COUNT(*) AS BIGINT) AS n_common
       |        FROM sh3 JOIN common USING (shingle) GROUP BY sh3.doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(cnt.n_shared, 0) AS BIGINT) AS n_shared,
       |  CAST(CASE WHEN COALESCE(cnt.n_shared, 0) > 0 THEN 1 ELSE 0 END
       |       AS INTEGER) AS contaminated,
       |  CAST(ta.top_tok AS DOUBLE) / ta.n_tokens AS top_token_frac,
       |  COALESCE(CAST(ba.top_bi AS DOUBLE) / ba.n_bi, 0.0) AS top_bigram_frac,
       |  CAST(ta.n_distinct AS DOUBLE) / ta.n_tokens AS distinct_ratio,
       |  ov.n_oov, ov.oov_rate,
       |  lm.n_bigrams, lm.lm_score,
       |  tot.n_shingles,
       |  CAST(COALESCE(com.n_common, 0) AS BIGINT) AS n_common,
       |  CAST(COALESCE(com.n_common, 0) AS DOUBLE)
       |    / CAST(tot.n_shingles AS DOUBLE) AS boilerplate_ratio
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
       |LEFT JOIN cnt USING (doc_id)
       |JOIN ta USING (doc_id)
       |LEFT JOIN ba USING (doc_id)
       |JOIN ov USING (doc_id)
       |LEFT JOIN lm USING (doc_id)
       |JOIN tot USING (doc_id)
       |LEFT JOIN com USING (doc_id)""".stripMargin

  /** MinHash near-dup FILTER oracle (mirrors q_pipeline_neardup:
    * banded candidates at bandRows=1 over docs < 200, exact Jaccard
    * >= 0.1, recursive transitive closure, keep each cluster's
    * minimum id).
    */
  val qPipelineNeardup: String =
    s"""${norm.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |${minhashPairCtes("WHERE doc_id < 200", 1)},
       |pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.1),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT doc_id FROM documents WHERE doc_id < 200),
       |reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM nodes
       |  UNION
       |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
       |       FROM reach GROUP BY node)
       |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars
       |FROM documents d JOIN cl c
       |  ON c.doc_id = d.doc_id AND c.cluster_id = d.doc_id""".stripMargin

  /** Wire-dispatched duplicate clusters oracle (mirrors
    * q_pipeline_clusters: docs < 500, simhash64 near-dup graph at
    * hamming <= 3). The pair base is the brute-force all-pairs
    * hamming — the anti-mirror that re-proves the band blocking exact
    * — and the closure is a recursive CTE.
    */
  val qPipelineClusters: String = {
    val ham = (1 to 64).map(j =>
      s"CASE WHEN substr(a.simhash64, $j, 1) <> substr(b.simhash64, $j, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""${norm.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |${simhash64Cte("WHERE doc_id < 500")},
       |h AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, $ham AS hamming
       |      FROM sig64 a JOIN sig64 b ON a.doc_id < b.doc_id),
       |pairs AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT doc_id FROM documents WHERE doc_id < 500),
       |reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM nodes
       |  UNION
       |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
       |       FROM reach GROUP BY node),
       |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |       FROM cl GROUP BY 1)
       |SELECT c.doc_id, c.cluster_id, s.cluster_size
       |FROM cl c JOIN sz s ON s.cluster_id = c.cluster_id""".stripMargin
  }

  /** Corpus budgeting: token totals per predicted language. */
  val qCorpusStats: String = {
    val langs = text.TextOps.LangMarkers
    val scoreExprs = langs.map { case (lang, ws) =>
      s"(${stopHits("pd", ws)}) AS s_$lang"
    }.mkString(", ")
    val best = s"greatest(${langs.map("s_" + _._1).mkString(", ")})"
    val langCase = langs.map { case (lang, _) =>
      s"WHEN s_$lang = $best AND $best > 0 THEN '$lang'"
    }.mkString(" ")
    s"""$norm, pad AS (SELECT doc_id, text, nt,
       |  ' ' || replace(nt, ' ', '  ') || ' ' AS pd FROM norm),
       |sc AS (SELECT doc_id, text, $scoreExprs FROM pad),
       |feat AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    CASE $langCase ELSE 'unknown' END AS lang_pred
       |  FROM sc)
       |SELECT lang_pred,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  AVG(CAST(n_tokens AS DOUBLE)) AS avg_tokens
       |FROM feat GROUP BY 1""".stripMargin
  }

  // --- relational star-schema queries --------------------------------------

  val qPricingSummary: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS DOUBLE)
      |    / 100.0 AS sum_base_price,
      |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000)
      |    AS HUGEINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
      |  AVG(l_quantity) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY 1, 2""".stripMargin

  /** Bucketed-join rollup (sources.Bucketing): the values are layout-
    * independent, so the oracle is the plain join — the bucketing
    * claim (zero input exchanges) is pinned by PlanSpec, not here.
    */
  val qBucketedJoin: String =
    """SELECT o.o_orderpriority,
      |  round(CAST(SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
      |    * 10000) AS HUGEINT)) AS DOUBLE) / 10000.0, 2) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1""".stripMargin

  /** Chi-square independence test (Stats.chi2Test over order priority
    * × status, dof (5−1)(3−1)=8, critical 15.507): cell terms fixed
    * to 1e-9 integers before the sum.
    */
  val qChi2: String =
    """WITH cells AS (
      |  SELECT o_orderpriority AS a, o_orderstatus AS b,
      |         CAST(COUNT(*) AS BIGINT) AS o
      |  FROM orders GROUP BY 1, 2),
      |rt AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
      |ct AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
      |t AS (SELECT SUM(o) AS n, COUNT(DISTINCT a) AS ka,
      |             COUNT(DISTINCT b) AS kb FROM cells),
      |dense AS (
      |  SELECT rt.a, ct.b, rt.ra, ct.cb, COALESCE(c.o, 0) AS o
      |  FROM rt CROSS JOIN ct
      |  LEFT JOIN cells c ON c.a = rt.a AND c.b = ct.b),
      |terms AS (
      |  SELECT n, ka, kb,
      |    CAST(round((o - CAST(ra AS DOUBLE) * cb / n)
      |             * (o - CAST(ra AS DOUBLE) * cb / n)
      |             / (CAST(ra AS DOUBLE) * cb / n) * 1e9) AS BIGINT) AS t9
      |  FROM dense, t)
      |SELECT CAST(n AS BIGINT) AS n,
      |  CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
      |  round(CAST(SUM(t9) AS DOUBLE) / 1e9, 6) AS chi2,
      |  round(sqrt(round(CAST(SUM(t9) AS DOUBLE) / 1e9, 6)
      |    / (n * (least(ka, kb) - 1))), 6) AS cramers_v,
      |  round(round(CAST(SUM(t9) AS DOUBLE) / 1e9, 6) - 15.507, 6) > 0.0
      |    AS significant
      |FROM terms GROUP BY n, ka, kb""".stripMargin

  /** One-pass Pearson correlation matrix (Stats.corrMatrix over the
    * lineitem numerics): exact 1e-6-unit integer sufficient
    * statistics, the closed form divides exact HUGEINTs.
    */
  val qCorrMatrix: String = {
    val cols = Seq("l_quantity" -> "q", "l_extendedprice" -> "e",
      "l_discount" -> "d")
    val fix = cols.map { case (c, t) =>
      s"CAST(round($c * 1e6) AS HUGEINT) AS i$t" }.mkString(", ")
    val sums = cols.map { case (_, t) => s"SUM(i$t) AS s$t" } ++
      cols.map { case (_, t) => s"SUM(i$t * i$t) AS q$t" }
    val pairs = for { (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1) }
      yield (a, b)
    val xs = pairs.map { case ((_, ta), (_, tb)) =>
      s"SUM(i$ta * i$tb) AS x$ta$tb" }
    def corrRow(a: (String, String), b: (String, String)) = {
      val (ca, ta) = a; val (cb, tb) = b
      val da = s"CAST(n * q$ta - s$ta * s$ta AS DOUBLE)"
      val db = s"CAST(n * q$tb - s$tb * s$tb AS DOUBLE)"
      s"""SELECT '$ca' AS col_a, '$cb' AS col_b,
         |  CASE WHEN $da <= 0.0 OR $db <= 0.0 THEN NULL
         |       ELSE round(CAST(n * x$ta$tb - s$ta * s$tb AS DOUBLE)
         |                  / sqrt($da * $db), 6) END AS corr
         |FROM s""".stripMargin
    }
    s"""WITH f AS (SELECT $fix FROM lineitem),
       |s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
       |        ${(sums ++ xs).mkString(", ")}
       |      FROM f)
       |${pairs.map { case (a, b) => corrRow(a, b) }.mkString("\nUNION ALL\n")}"""
      .stripMargin
  }

  /** Per-group trimmed mean (Stats.trimmedMean over lineitem prices by
    * returnflag): exact quantile_cont bounds (Spark `percentile`'s
    * twin), survivors averaged on exact cents.
    */
  val qTrimmedMean: String =
    """WITH b AS (
      |  SELECT l_returnflag,
      |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.1) AS lo,
      |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) AS hi
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag,
      |  round(lo, 6) AS q_lo, round(hi, 6) AS q_hi,
      |  CAST(COUNT(*) AS BIGINT) AS n_kept,
      |  round(CAST(SUM(CAST(round(l.l_extendedprice * 100) AS HUGEINT))
      |          AS DOUBLE) / COUNT(*) / 100.0, 6) AS trimmed_mean
      |FROM lineitem l JOIN b ON b.l_returnflag = l.l_returnflag
      |WHERE l.l_extendedprice >= lo AND l.l_extendedprice <= hi
      |GROUP BY 1, 2, 3""".stripMargin

  val qTopOrders: String =
    """WITH revenue AS (
      |  SELECT l.l_orderkey, o.o_orderdate,
      |    SUM(l.l_extendedprice * (1.0 - l.l_discount)) AS revenue
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_mktsegment = 'BUILDING'
      |    AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |    AND l.l_shipdate > TIMESTAMP '1998-01-01'
      |  GROUP BY 1, 2)
      |SELECT l_orderkey, o_orderdate, revenue,
      |  CAST(rk AS INTEGER) AS rk
      |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) AS rk
      |      FROM revenue)
      |WHERE rk <= 10""".stripMargin

  /** revenue mirrors the Spark side's r14 integer fixing: per-row
    * 1e-6-grid longs summed exactly (order-invariant), one division
    * back — the float SUM's 6th decimal was scan-order-dependent at
    * this magnitude (caught by tools/verify_order_invariance.py).
    */
  val qRegionRevenue: String =
    """SELECT r.r_name,
      |  CAST(SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 1e6)
      |           AS BIGINT)) AS BIGINT) / 1e6 AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY 1""".stripMargin

  /** Shared UTF-8 byte access for `documents.text`, as the hex string
    * `hx = hex(encode(text))` plus byte count `n` (r12 rewrite): byte
    * j is hex pair 2j..2j+1, read by `byteAt` as two O(1) substr
    * lookups. The r11 formulation reconstructed the byte STREAM from
    * codepoints (per-char UTF-8 CASE, an unbounded per-doc offset
    * window, a per-byte unnest, then joins against it) -- measured at
    * ~33% of the whole DuckDB gate, for queries that each read at most
    * ~1k byte positions per document. hex() pairs are byte-exact for
    * ANY corpus (the same UTF-8 stream both engines hash), and the
    * two-hex-digit substr pair IS the token Spark's `hex()` emits, so
    * payload digests concatenate substr pairs directly.
    */
  private def utf8BytesFrom(src: String): String =
    s"""d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id, text,
      |         hex(encode(text)) AS hx,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS n
      |  FROM $src)""".stripMargin

  /** 0-based byte `j` of the stream behind `hx` as an exact integer in
    * 0..255; `j` must be < n (callers index mod n). The row must carry
    * the `hx` column (alias-qualify with `hxq` when joined).
    */
  private def byteAt(j: String, hxq: String = "hx"): String =
    s"((strpos('0123456789ABCDEF', substr($hxq, 2 * ($j) + 1, 1)) - 1) * 16" +
      s" + strpos('0123456789ABCDEF', substr($hxq, 2 * ($j) + 2, 1)) - 1)"

  private val utf8Bytes: String = utf8BytesFrom("documents")


  /** Shared pixel table of `Multimodal.synthesizeImages` PNGs: the
    * image is w = 8 + id mod 24 by h = 8 + n mod 24 grayscale, and the
    * gray of row-major pixel p is UTF-8 text byte p mod n (0 when the
    * text is empty). PNG is lossless, so the REAL ImageIO decode on
    * the Spark side recovers exactly these values — the oracle
    * recomputes the pixel function instead of decoding. Yields
    * `pg(media_id, w, h, p, g)`.
    */
  private def pngPixelsFrom(src: String): String =
    s"""${utf8BytesFrom(src)},
       |dims AS (
       |  SELECT media_id, n, hx,
       |    CAST(8 + media_id % 24 AS INT) AS w,
       |    CAST(8 + n % 24 AS INT) AS h
       |  FROM d),
       |px AS (
       |  SELECT media_id, n, hx, w, h,
       |         unnest(generate_series(0, w * h - 1)) AS p
       |  FROM dims),
       |pg AS (
       |  SELECT media_id, w, h, p,
       |    CASE WHEN n = 0 THEN 0 ELSE ${byteAt("p % n")} END AS g
       |  FROM px)""".stripMargin

  private val pngPixels: String = pngPixelsFrom("documents")

  /** Multimodal feature extraction over REAL decoded PNGs
    * (Multimodal.synthesizeImages → extractFeatures): decoded
    * dimensions come back as width/height, and feature d = mean gray
    * of vertical strip d (column x in strip x·FeatureDim/w) / 255,
    * rounded through float32 exactly as the Scala kernel. Pixel sums
    * of integers are exact in double, so association order is
    * irrelevant here (unlike the entropy window sums).
    */
  val qMultimodalFeatures: String = {
    val dim = graft.multimodal.Multimodal.FeatureDim
    val feats = (0 until dim).map { d =>
      s"""COALESCE(CAST(CAST(
         |  SUM(CASE WHEN (p % w) * $dim // w = $d THEN CAST(g AS DOUBLE) END)
         |    / COUNT(CASE WHEN (p % w) * $dim // w = $d THEN g END) / 255.0
         |  AS REAL) AS DOUBLE), 0.0) AS f$d""".stripMargin
    }.mkString(",\n")
    s"""WITH $pngPixels,
       |agg AS (
       |  SELECT media_id,
       |$feats
       |  FROM pg GROUP BY media_id)
       |SELECT dm.media_id, TRUE AS decoded, dm.w AS width, dm.h AS height,
       |  ${(0 until dim).map(d => s"COALESCE(a.f$d, 0.0) AS f$d").mkString(", ")}
       |FROM dims dm LEFT JOIN agg a ON a.media_id = dm.media_id""".stripMargin
  }

  /** Perceptual-hash image dedup oracle (mirrors
    * Multimodal.imageDHash/dedupByDHash over synthesizeImages): the
    * 9×8 nearest-neighbour grid re-derives from the synthesized pixel
    * function, bits compare adjacent grays, groups key on the hash.
    */
  /** CTE chain ending in `hs(media_id, dhash)` — the 9×8
    * nearest-neighbour dHash re-derived from the synthesized pixel
    * function; shared by the group-dedup and near-pair oracles.
    */
  private def phashHsFrom(src: String): String = {
    val cells = for (y <- 0 until 8; x <- 0 until 9) yield (x, y)
    val pivot = cells.map { case (x, y) =>
      s"MAX(CASE WHEN xx = $x AND yy = $y THEN g END) AS g_${x}_$y"
    }.mkString(",\n")
    val bits = (for (y <- 0 until 8; x <- 0 until 8) yield
      s"CASE WHEN g_${x}_$y > g_${x + 1}_$y THEN '1' ELSE '0' END")
      .mkString(" || ")
    s"""${pngPixelsFrom(src)},
       |grid AS (
       |  SELECT d2.media_id, gx.xx, gy.yy,
       |    (gy.yy * d2.h // 8) * d2.w + (gx.xx * d2.w // 9) AS p
       |  FROM dims d2,
       |    generate_series(0, 8) gx(xx), generate_series(0, 7) gy(yy)),
       |gs AS (SELECT gr.media_id, gr.xx, gr.yy, pg.g
       |       FROM grid gr JOIN pg
       |         ON pg.media_id = gr.media_id AND pg.p = gr.p),
       |pv AS (SELECT media_id, $pivot FROM gs GROUP BY media_id),
       |hs AS (SELECT media_id, $bits AS dhash FROM pv)""".stripMargin
  }

  private val phashHs: String = phashHsFrom("documents")

  val qMultimodalPhash: String =
    s"""WITH $phashHs,
       |canon AS (SELECT dhash, MIN(media_id) AS canonical_id,
       |            CAST(COUNT(*) AS BIGINT) AS group_size
       |          FROM hs GROUP BY 1)
       |SELECT h.media_id, h.dhash, c.canonical_id, c.group_size,
       |  CAST(h.media_id <> c.canonical_id AS INTEGER) AS is_duplicate
       |FROM hs h JOIN canon c ON c.dhash = h.dhash""".stripMargin

  /** Near-dup image pairs (Multimodal.dhashPairs, maxDist 3) over the
    * AUGMENTED corpus (docs + id-shifted exact copies of doc_id < 60;
    * +10008 is 0 mod 24 so the synthesized dimensions — hence pixels —
    * are identical): the banded blocking is EXACT at hamming ≤ 3, so
    * brute-force all-pairs hamming over the re-derived hashes is the
    * oracle.
    */
  val qMultimodalPhashPairs: String = {
    val ham = (1 to 64).map(j =>
      s"CASE WHEN substr(a.dhash, $j, 1) <> substr(b.dhash, $j, 1) THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    val aug = """(SELECT doc_id, text FROM documents
                | UNION ALL
                | SELECT doc_id + 10008, text FROM documents
                | WHERE doc_id < 60) aug""".stripMargin
    s"""WITH ${phashHsFrom(aug)},
       |h AS (SELECT a.media_id AS id_a, b.media_id AS id_b, $ham AS hamming
       |      FROM hs a JOIN hs b ON a.media_id < b.media_id)
       |SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming
       |FROM h WHERE hamming <= 3""".stripMargin
  }

  /** Cohort retention (Funnel.retention, weekly periods): integer-div
    * epoch-micros weeks, first week per user = cohort, distinct
    * active offsets counted per cell.
    */
  val qRetention: String =
    """WITH e AS (SELECT user_id,
      |  CAST(epoch_ns(ts) // 1000 AS BIGINT) // 604800000000 AS wk
      |  FROM events),
      |f AS (SELECT user_id, MIN(wk) AS cw FROM e GROUP BY user_id),
      |a AS (SELECT DISTINCT e.user_id, f.cw, e.wk - f.cw AS off
      |      FROM e JOIN f USING (user_id))
      |SELECT cw AS cohort_period, CAST(off AS BIGINT) AS period_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM a GROUP BY 1, 2""".stripMargin

  /** Per-frame video fingerprint oracle (mirrors
    * Multimodal.videoFrameDHash over synthesizeGifs): the 9×8 grid
    * re-derives per frame from the GIF pixel function.
    */
  val qMultimodalVideoPhash: String = {
    val pivot = (for (y <- 0 until 8; x <- 0 until 9) yield
      s"MAX(CASE WHEN xx = $x AND yy = $y THEN g END) AS g_${x}_$y")
      .mkString(",\n")
    val bits = (for (y <- 0 until 8; x <- 0 until 8) yield
      s"CASE WHEN g_${x}_$y > g_${x + 1}_$y THEN '1' ELSE '0' END")
      .mkString(" || ")
    s"""WITH $utf8Bytes,
       |dims AS (SELECT media_id, n, hx,
       |    CAST(6 + media_id % 10 AS INT) AS w,
       |    CAST(6 + n % 10 AS INT) AS h,
       |    CAST(2 + media_id % 3 AS INT) AS nf FROM d),
       |frm AS (SELECT media_id, n, hx, w, h,
       |          unnest(generate_series(0, nf - 1)) AS f FROM dims),
       |grid AS (SELECT fr.media_id, fr.n, fr.hx, fr.f, gx.xx, gy.yy,
       |    (gy.yy * fr.h // 8) * fr.w + (gx.xx * fr.w // 9) AS p
       |  FROM frm fr,
       |    generate_series(0, 8) gx(xx), generate_series(0, 7) gy(yy)),
       |gs AS (SELECT media_id, f, xx, yy,
       |    CASE WHEN n = 0 THEN 0
       |         ELSE ${byteAt("(p + 7 * f) % n")} END AS g
       |  FROM grid),
       |pv AS (SELECT media_id, f, $pivot FROM gs GROUP BY media_id, f)
       |SELECT media_id, CAST(f AS INTEGER) AS frame_idx, $bits AS dhash,
       |  TRUE AS decoded
       |FROM pv""".stripMargin
  }

  /** Audio fingerprint oracle (mirrors Multimodal.audioFingerprint
    * over synthesizeAudio): frame energies are exact integer sums of
    * squares over the re-derived PCM samples.
    */
  val qMultimodalAfp: String = {
    // empty frames (ns < 65 leaves some [f·ns//65, (f+1)·ns//65) ranges
    // empty) must pivot to energy 0, not NULL — a NULL would turn a
    // true `e_f > 0` bit into '0'
    val pivot = (0 to 64).map(f =>
      s"COALESCE(MAX(CASE WHEN f = $f THEN e END), 0) AS e_$f").mkString(",\n")
    val bits = (0 until 64).map(f =>
      s"CASE WHEN e_$f > e_${f + 1} THEN '1' ELSE '0' END").mkString(" || ")
    s"""WITH $utf8Bytes,
       |adims AS (SELECT media_id, n, hx,
       |            CAST(64 + n % 192 AS BIGINT) AS ns FROM d),
       |asmp AS (SELECT media_id, n, hx, ns,
       |           unnest(generate_series(0, ns - 1)) AS k FROM adims),
       |asv AS (SELECT media_id, ns, k,
       |          CAST((CASE WHEN n = 0 THEN 0
       |                     ELSE ${byteAt("k % n")} END - 128)
       |            * 256 AS BIGINT) AS v
       |        FROM asmp),
       |fr AS (SELECT media_id,
       |         (65 * (k + 1) + ns - 1) // ns - 1 AS f,
       |         SUM(v * v) AS e
       |       FROM asv GROUP BY 1, 2),
       |pv AS (SELECT media_id, $pivot FROM fr GROUP BY media_id),
       |hs AS (SELECT media_id, $bits AS afp FROM pv),
       |canon AS (SELECT afp, MIN(media_id) AS canonical_id,
       |            CAST(COUNT(*) AS BIGINT) AS group_size
       |          FROM hs GROUP BY 1)
       |SELECT h.media_id, h.afp, c.canonical_id, c.group_size,
       |  CAST(h.media_id <> c.canonical_id AS INTEGER) AS is_duplicate
       |FROM hs h JOIN canon c ON c.afp = h.afp""".stripMargin
  }

  /** Audio-feature oracle over REAL decoded WAVs
    * (Multimodal.synthesizeAudio → extractAudioFeatures): sample k is
    * (byte[k mod n] − 128)·256 (−32768 for empty text),
    * nSamples = 64 + n mod 192 — WAV PCM is lossless, so the Spark
    * side's real decode recovers exactly these values. Integer sums
    * are exact in double and division/sqrt are IEEE-exactly rounded,
    * so mean/RMS need no tolerance.
    */
  val qMultimodalAudio: String =
    s"""WITH $utf8Bytes,
       |dims AS (SELECT media_id, n, hx,
       |           CAST(64 + n % 192 AS BIGINT) AS ns FROM d),
       |smp AS (SELECT media_id, n, hx, ns,
       |          unnest(generate_series(0, ns - 1)) AS k FROM dims),
       |sv AS (SELECT media_id, k,
       |         (CASE WHEN n = 0 THEN 0
       |               ELSE ${byteAt("k % n")} END - 128) * 256 AS v
       |       FROM smp),
       |svl AS (SELECT media_id, k, v,
       |          LAG(v) OVER (PARTITION BY media_id ORDER BY k) AS pv
       |        FROM sv),
       |zc AS (SELECT media_id,
       |         SUM(CASE WHEN (v < 0) <> (pv < 0) THEN 1 ELSE 0 END) AS zcs,
       |         SUM(CAST(v AS DOUBLE)) AS sv_,
       |         SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS sq,
       |         CAST(COUNT(*) AS DOUBLE) AS cnt
       |       FROM svl GROUP BY media_id)
       |SELECT dm.media_id, TRUE AS decoded, 8000 AS sample_rate,
       |  dm.ns AS n_samples,
       |  z.sv_ / z.cnt AS mean_amp, sqrt(z.sq / z.cnt) AS rms,
       |  CAST(z.zcs AS BIGINT) AS zero_crossings
       |FROM dims dm JOIN zc z ON z.media_id = dm.media_id""".stripMargin

  /** Resize oracle over REAL decoded PNGs: nearest-neighbour pixel
    * resample — output gray at (X, Y) = source pixel (X·w/W, Y·h/H),
    * W·H bytes always — digested as the hex string, mirroring
    * Multimodal.imageResizeGray + md5(hex(..)) byte-for-byte.
    */
  def qMultimodalResize(targetW: Int, targetH: Int): String = {
    val outLen = targetW * targetH
    s"""WITH $pngPixels,
       |og AS (
       |  SELECT media_id, n, hx, w, h,
       |         unnest(generate_series(0, $outLen - 1)) AS q
       |  FROM dims),
       |src AS (
       |  SELECT media_id, n, hx, q,
       |    ((q // $targetW) * h // $targetH) * w + ((q % $targetW) * w // $targetW) AS p
       |  FROM og),
       |sel AS (
       |  SELECT media_id, q,
       |    CASE WHEN n = 0 THEN '00'
       |         ELSE substr(hx, 2 * (p % n) + 1, 2) END AS gh
       |  FROM src),
       |pay AS (
       |  SELECT media_id, string_agg(gh, '' ORDER BY q) AS payload
       |  FROM sel GROUP BY media_id)
       |SELECT d.media_id, $targetW AS out_w, $targetH AS out_h,
       |  CAST($outLen AS BIGINT) AS n_bytes,
       |  md5(h.payload) AS content_md5
       |FROM d LEFT JOIN pay h ON h.media_id = d.media_id""".stripMargin
  }

  /** Frame-sample stub oracle: frame i = bytes [i·fb, (i+1)·fb), every
    * `everyN`-th frame emitted with its length, byte mean, and
    * hex-string md5 — mirrors Multimodal.frameSample's opaque-payload
    * fallback over the UTF-8 byte table (decoded = FALSE).
    */
  def qMultimodalFrames(frameBytes: Int, everyN: Int): String =
    s"""WITH $utf8Bytes,
       |frm AS (
       |  SELECT media_id, n, hx,
       |    unnest(generate_series(0, (n + $frameBytes - 1) // $frameBytes - 1)) AS fi
       |  FROM d WHERE n > 0),
       |sel AS (
       |  SELECT media_id, fi, hx, fi * $frameBytes AS lo,
       |         least((fi + 1) * $frameBytes, n) AS hi
       |  FROM frm WHERE fi % $everyN = 0),
       |pos AS (
       |  SELECT media_id, fi, hx, unnest(generate_series(lo, hi - 1)) AS j
       |  FROM sel),
       |agg AS (
       |  SELECT media_id, fi, COUNT(*) AS flen,
       |         SUM(${byteAt("j")}) AS sb
       |  FROM pos GROUP BY 1, 2)
       |SELECT s.media_id, CAST(s.fi AS INTEGER) AS frame_idx, FALSE AS decoded,
       |  CAST(a.flen AS BIGINT) AS frame_len,
       |  CAST(a.sb AS DOUBLE) / a.flen AS mean_gray,
       |  md5(substr(s.hx, 2 * s.lo + 1, 2 * (s.hi - s.lo))) AS frame_md5
       |FROM sel s JOIN agg a USING (media_id, fi)""".stripMargin

  /** REAL video-frame oracle (Multimodal.synthesizeGifs → frameSample,
    * everyN = 2): the animated GIF is lossless over its 256-gray
    * palette, so the Spark side's actual multi-frame ImageIO decode
    * recovers exactly the synthesized pixels — the oracle recomputes
    * the frame function (gray of frame f, pixel p = text byte
    * (p + 7·f) mod n; w = 6 + id mod 10, h = 6 + n mod 10,
    * frames = 2 + id mod 3) instead of decoding.
    */
  def qMultimodalGifFrames(everyN: Int): String =
    s"""WITH $utf8Bytes,
       |dims AS (
       |  SELECT media_id, n, hx,
       |    CAST(6 + media_id % 10 AS INT) AS w,
       |    CAST(6 + n % 10 AS INT) AS h,
       |    CAST(2 + media_id % 3 AS INT) AS nf
       |  FROM d),
       |frm AS (
       |  SELECT media_id, n, hx, w, h,
       |         unnest(generate_series(0, nf - 1)) AS f
       |  FROM dims),
       |sel AS (SELECT * FROM frm WHERE f % $everyN = 0),
       |px AS (
       |  SELECT media_id, n, hx, w, h, f,
       |         unnest(generate_series(0, w * h - 1)) AS p
       |  FROM sel),
       |pg AS (
       |  SELECT media_id, f, w, h, p,
       |    CASE WHEN n = 0 THEN 0
       |         ELSE ${byteAt("(p + 7 * f) % n")} END AS g,
       |    CASE WHEN n = 0 THEN '00'
       |         ELSE substr(hx, 2 * ((p + 7 * f) % n) + 1, 2) END AS gh
       |  FROM px)
       |SELECT media_id, CAST(f AS INTEGER) AS frame_idx, TRUE AS decoded,
       |  CAST(w * h AS BIGINT) AS frame_len,
       |  CAST(SUM(g) AS DOUBLE) / (w * h) AS mean_gray,
       |  md5(string_agg(gh, '' ORDER BY p)) AS frame_md5
       |FROM pg GROUP BY media_id, f, w, h""".stripMargin

  /** Regression imputation (the 2-column analogue of the reference's
    * IterativeImputer, missing.py:165-209): OLS of value on value2 over
    * observed rows, predictions clipped to the observed min/max.
    */
  val qImputeRegression: String =
    s"""${Oracle.mpanel},
       |obs AS (SELECT * FROM mpanel WHERE value IS NOT NULL),
       |st AS (SELECT AVG(value2) AS mx, AVG(value) AS my,
       |              SUM(value2 * value) AS sxy, SUM(value2 * value2) AS sxx,
       |              CAST(COUNT(*) AS DOUBLE) AS n,
       |              MIN(value) AS vmin, MAX(value) AS vmax
       |       FROM obs),
       |b AS (SELECT CASE WHEN sxx - n * mx * mx = 0.0 THEN 0.0
       |             ELSE (sxy - n * mx * my) / (sxx - n * mx * mx) END AS beta,
       |             mx, my, vmin, vmax FROM st)
       |SELECT m.month_id, m.unit_id,
       |  CASE WHEN m.value IS NOT NULL THEN m.value
       |       ELSE least(greatest((b.my - b.beta * b.mx) + b.beta * m.value2,
       |                           b.vmin), b.vmax) END AS imputed
       |FROM mpanel m, b""".stripMargin

  /** Shared closed form for the MICE oracles. On the gate panel only
    * `value` carries nulls, so the round-robin chain is exactly solvable:
    * the predictor (value2, fully observed — its own imputation is the
    * identity) and the observed target set never change between passes,
    * so pass 1 already produces the closed-form OLS fill and every later
    * pass is idempotent. The chain oracle is therefore the regression
    * imputation, independent of maxIter.
    */
  private val miceFill: String =
    s"""${Oracle.mpanel},
       |obs AS (SELECT * FROM mpanel WHERE value IS NOT NULL),
       |st AS (SELECT AVG(value2) AS mx, AVG(value) AS my,
       |              SUM(value2 * value) AS sxy, SUM(value2 * value2) AS sxx,
       |              SUM(value * value) AS syy,
       |              CAST(COUNT(*) AS DOUBLE) AS n,
       |              MIN(value) AS vmin, MAX(value) AS vmax
       |       FROM obs),
       |b AS (SELECT CASE WHEN sxx - n * mx * mx = 0.0 THEN 0.0
       |             ELSE (sxy - n * mx * my) / (sxx - n * mx * mx) END AS beta,
       |             mx, my, vmin, vmax, n, sxx, syy FROM st),
       |b2 AS (SELECT *, CASE WHEN n <= 2 THEN 0.0
       |              ELSE sqrt(greatest(
       |                (syy - n * my * my - beta * beta * (sxx - n * mx * mx))
       |                  / (n - 2), 0.0)) END AS sd
       |       FROM b),
       |fill AS (
       |  SELECT m.month_id, m.unit_id, m.value, m.value2, b.sd, b.vmin, b.vmax,
       |    CASE WHEN m.value IS NOT NULL THEN m.value
       |         ELSE least(greatest((b.my - b.beta * b.mx) + b.beta * m.value2,
       |                             b.vmin), b.vmax) END AS value_imp
       |  FROM mpanel m, b2 b)""".stripMargin

  val qMice: String =
    s"$miceFill SELECT month_id, unit_id, value_imp, value2 AS value2_imp FROM fill"

  /** First 8 hex digits of md5($s) as an exact integer (digit-sum —
    * this DuckDB build has no hex-to-int cast), mirroring the Spark
    * side's conv(substring(md5, 1, 8), 16, 10).
    */
  private def hexInt8(s: String): String =
    (1 to 8).map(k =>
      s"(strpos('0123456789abcdef', substr(md5($s), $k, 1)) - 1) * ${1L << (4 * (8 - k))}")
      .mkString("(", " + ", ")")

  /** First 4 hex digits of md5($s) as an exact integer — the Dsir
    * feature-cell hash, mirroring conv(substring(md5, 1, 4), 16, 10).
    */
  private def hexInt4(s: String): String =
    (1 to 4).map(k =>
      s"(strpos('0123456789abcdef', substr(md5($s), $k, 1)) - 1) * ${1L << (4 * (4 - k))}")
      .mkString("(", " + ", ")")

  /** Shared DSIR weight CTE chain (mirrors Dsir.importanceWeights:
    * target = lang-'en' rows, `b` hashed cells, Laplace α): ends in
    * `dw(doc_id, n_tokens, dsir_weight)`.
    */
  private def dsirCtes(b: Int, alpha: Double,
                       from: String = "documents",
                       prelude: String = "",
                       ngram: Int = 1): String = {
    val features =
      if (ngram == 1)
        """dtoks AS (SELECT doc_id, (lang = 'en') AS it,
          |            unnest(string_split(nt, ' ')) AS tok FROM dnorm),""".stripMargin
      else
        """dws AS (SELECT doc_id, (lang = 'en') AS it,
          |          string_split(nt, ' ') AS ws FROM dnorm),
          |dtoks AS (SELECT doc_id, it,
          |            unnest(list_transform(range(1, len(ws)),
          |              i -> ws[i] || ' ' || ws[i + 1])) AS tok
          |          FROM dws WHERE len(ws) > 1),""".stripMargin
    s"""WITH ${if (prelude.nonEmpty) prelude + "," else ""}
       |dnorm AS (
       |  SELECT doc_id, lang,
       |         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
       |  FROM $from),
       |$features
       |dtb AS (SELECT doc_id, it, ${hexInt4("tok")} % $b AS bucket FROM dtoks),
       |dcells AS (SELECT bucket, COUNT(*) AS rc,
       |             COUNT(*) FILTER (WHERE it) AS tc
       |           FROM dtb GROUP BY 1),
       |dtot AS (SELECT CAST(SUM(rc) AS DOUBLE) AS r,
       |           CAST(SUM(tc) AS DOUBLE) AS t FROM dcells),
       |dlr AS (SELECT bucket,
       |          ln((tc + $alpha) / (t + $alpha * $b))
       |            - ln((rc + $alpha) / (r + $alpha * $b)) AS lr
       |        FROM dcells, dtot),
       |dw AS (SELECT dtb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |         round(SUM(dlr.lr), 6) AS dsir_weight
       |       FROM dtb JOIN dlr USING (bucket) GROUP BY 1)""".stripMargin
  }

  def qDsirWeights(b: Int = 256, alpha: Double = 1.0,
                   ngram: Int = 1): String =
    s"""${dsirCtes(b, alpha, ngram = ngram)}
       |SELECT doc_id, n_tokens, dsir_weight FROM dw""".stripMargin

  /** Gumbel scoring + top-k tail over a prior `dw` — shared by the
    * standalone sample oracle and the pretrain pipeline chain.
    */
  private def dsirSampleTail(k: Int, temperature: Double, salt: String): String = {
    val u = s"(${hexInt8(s"CAST(doc_id AS VARCHAR) || ':$salt'")} + 0.5) / 4294967296.0"
    s"""sc AS (SELECT doc_id, n_tokens, dsir_weight,
       |         round(dsir_weight / $temperature - ln(-ln($u)), 6) AS gumbel_score
       |       FROM dw),
       |srk AS (SELECT *, row_number() OVER
       |         (ORDER BY gumbel_score DESC, doc_id) AS rank FROM sc),
       |keep AS (SELECT * FROM srk WHERE rank <= $k)""".stripMargin
  }

  def qDsirSample(k: Int = 100, b: Int = 256, alpha: Double = 1.0,
                  temperature: Double = 1.0, salt: String = "dsir"): String =
    s"""${dsirCtes(b, alpha)},
       |${dsirSampleTail(k, temperature, salt)}
       |SELECT doc_id, n_tokens, dsir_weight, gumbel_score,
       |  CAST(rank AS INTEGER) AS rank
       |FROM keep""".stripMargin

  /** End-to-end pretraining curation chain (mirrors the wire spec
    * dedup_exact → dsir_sample → curriculum): exact dedup keeps the
    * smallest-id canonical per normalized fingerprint, DSIR fits its
    * multinomials on the SURVIVORS (not the raw corpus — step order
    * matters and the oracle preserves it), Gumbel-top-k keeps k docs,
    * and curriculum re-ranks/bins the kept set by token count.
    */
  def qPipelinePretrain(k: Int = 100, b: Int = 256, alpha: Double = 1.0,
                        temperature: Double = 1.0, salt: String = "dsir",
                        stages: Int = 4): String = {
    val prelude =
      """pfp AS (
        |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
        |  FROM documents),
        |pcanon AS (SELECT f, MIN(doc_id) AS doc_id FROM pfp GROUP BY 1),
        |surv AS (SELECT d.* FROM documents d JOIN pcanon c ON c.doc_id = d.doc_id)""".stripMargin
    s"""${dsirCtes(b, alpha, from = "surv", prelude = prelude)},
       |${dsirSampleTail(k, temperature, salt)}
       |SELECT doc_id, dsir_weight, gumbel_score,
       |  CAST(row_number() OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS rank,
       |  CAST(ntile($stages) OVER (ORDER BY n_tokens, doc_id) AS INTEGER) AS stage
       |FROM keep""".stripMargin
  }

  /** PMI collocations (Collocations.pmiPairs, minCount 5): bigrams by
    * positional self-join, exact-long counts, one ln on an identical
    * rational.
    */
  val qCollocations: String =
    s"""$norm, toks AS (
       |  SELECT doc_id, unnest(string_split(nt, ' ')) AS tok,
       |         generate_subscripts(string_split(nt, ' '), 1) AS pos
       |  FROM norm),
       |uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n1
       |        FROM toks GROUP BY tok),
       |tot AS (SELECT CAST(SUM(n1) AS BIGINT) AS t_uni FROM uni),
       |bi AS (
       |  SELECT a.tok AS tok_a, b.tok AS tok_b,
       |         CAST(COUNT(*) AS BIGINT) AS pair_count
       |  FROM toks a JOIN toks b
       |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  GROUP BY 1, 2),
       |bt AS (SELECT CAST(SUM(pair_count) AS BIGINT) AS t_bi FROM bi)
       |SELECT p.tok_a, p.tok_b, p.pair_count,
       |  round(ln(CAST(p.pair_count AS DOUBLE) * t.t_uni * t.t_uni
       |    / (CAST(b.t_bi AS DOUBLE) * ua.n1 * ub.n1)), 6) AS pmi
       |FROM bi p
       |JOIN uni ua ON ua.tok = p.tok_a
       |JOIN uni ub ON ub.tok = p.tok_b, tot t, bt b
       |WHERE p.pair_count >= 5""".stripMargin

  /** Association rules (Association.pairRules over user event
    * baskets): distinct (user, event_type) baskets, bounded-fan-out
    * pair self-join, exact-long ratio scoring.
    */
  val qAssociation: String =
    """WITH baskets AS (
      |  SELECT DISTINCT user_id AS basket, event_type AS item FROM events),
      |n AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets
      |      FROM baskets),
      |supp AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS s
      |         FROM baskets GROUP BY item),
      |pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b,
      |         CAST(COUNT(*) AS BIGINT) AS pair_support
      |  FROM baskets a JOIN baskets b
      |    ON a.basket = b.basket AND a.item < b.item
      |  GROUP BY 1, 2)
      |SELECT p.item_a, p.item_b, p.pair_support,
      |  round(CAST(p.pair_support AS DOUBLE) / sa.s, 6) AS conf_a_to_b,
      |  round(CAST(p.pair_support AS DOUBLE) / sb.s, 6) AS conf_b_to_a,
      |  round(CAST(p.pair_support AS DOUBLE) * n.n_baskets
      |    / (sa.s * sb.s), 6) AS lift
      |FROM pairs p
      |JOIN supp sa ON sa.item = p.item_a
      |JOIN supp sb ON sb.item = p.item_b, n""".stripMargin

  /** Distinctive vocabulary per source (Classifier.distinctiveTerms,
    * group = source, k = 10, α = 0.5): the Monroe log-odds z with
    * identical 1e-9 rounding of δ and variance before the ratio.
    */
  def qDistinctiveTerms(k: Int = 10, alpha: Double = 0.5): String =
    s"""$norm, toks AS (
       |  SELECT d.source AS grp, unnest(string_split(n.nt, ' ')) AS tok
       |  FROM norm n JOIN documents d ON d.doc_id = n.doc_id),
       |gw AS (SELECT grp, tok, CAST(COUNT(*) AS BIGINT) AS n
       |       FROM toks GROUP BY 1, 2),
       |w AS (SELECT tok, CAST(SUM(n) AS BIGINT) AS n_w FROM gw GROUP BY tok),
       |g AS (SELECT grp, CAST(SUM(n) AS BIGINT) AS n_g FROM gw GROUP BY grp),
       |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
       |               CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM gw),
       |sc AS (
       |  SELECT gw.grp, gw.tok, gw.n,
       |    round(ln((gw.n + $alpha) / (g.n_g + t.v * $alpha - gw.n - $alpha))
       |      - ln((w.n_w - gw.n + $alpha)
       |           / (t.n_tot - g.n_g + t.v * $alpha - (w.n_w - gw.n) - $alpha)), 9)
       |      AS delta,
       |    round(1.0 / (gw.n + $alpha) + 1.0 / (w.n_w - gw.n + $alpha), 9)
       |      AS variance
       |  FROM gw JOIN w ON w.tok = gw.tok JOIN g ON g.grp = gw.grp, tot t),
       |z AS (SELECT grp, tok, n, round(delta / sqrt(variance), 9) AS z FROM sc),
       |r AS (SELECT *, row_number() OVER (PARTITION BY grp
       |        ORDER BY z DESC, tok) AS rank FROM z)
       |SELECT grp AS "group", tok, n, round(z, 6) AS zscore,
       |  CAST(rank AS INTEGER) AS rank
       |FROM r WHERE rank <= $k""".stripMargin

  /** Event-transition matrix (Association.transitions): lead over the
    * deterministic (ts, event_id) order, exact-long conditional
    * probabilities.
    */
  val qTransitions: String =
    """WITH nxt AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |pairs AS (
      |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
      |        FROM pairs GROUP BY 1)
      |SELECT p.from_type, p.to_type, p.n,
      |  round(CAST(p.n AS DOUBLE) / t.n_from, 6) AS prob
      |FROM pairs p JOIN tot t ON t.from_type = p.from_type""".stripMargin

  /** Benford first-digit audit (Profile.benford over
    * lineitem.l_extendedprice): identical ln-based digit arithmetic;
    * expected shares are the SAME inlined double literals.
    */
  val qBenford: String = {
    val exp = graft.relational.Profile.BenfordExpected
      .map { case (d, e) => s"($d, $e)" }.mkString(", ")
    s"""WITH counts AS (
       |  SELECT least(greatest(CAST(floor(v / pow(10.0,
       |      floor(ln(v) / ${math.log(10.0)}))) AS INTEGER), 1), 9) AS digit,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem)
       |  WHERE v > 0.0 GROUP BY 1),
       |expected AS (SELECT digit, CAST(expected AS DOUBLE) AS expected
       |             FROM (VALUES $exp) e(digit, expected)),
       |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS n_tot FROM counts),
       |j AS (
       |  SELECT e.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n, e.expected,
       |         t.n_tot
       |  FROM expected e LEFT JOIN counts c ON c.digit = e.digit, tot t),
       |terms AS (
       |  SELECT *, round((n - n_tot * expected) * (n - n_tot * expected)
       |    / (n_tot * expected), 9) AS chi_term
       |  FROM j)
       |SELECT CAST(digit AS INTEGER) AS digit, n,
       |  round(CAST(n AS DOUBLE) / n_tot, 6) AS share,
       |  round(expected, 6) AS expected,
       |  round(CAST(n AS DOUBLE) / n_tot - expected, 6) AS dev,
       |  round(SUM(chi_term) OVER (), 6) AS chi2
       |FROM terms""".stripMargin
  }

  /** Frequent triples (Association.tripleRules, minSupport 2): the
    * ANTI-MIRROR — a direct three-way self-join count with no apriori
    * prune, so matching it proves the Spark side's candidate pruning
    * lossless (downward closure), not just plan equality.
    */
  def qAssociationTriples(minSupport: Long = 2L): String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT user_id AS basket, event_type AS item FROM events),
       |n AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets
       |      FROM baskets),
       |supp AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS s
       |         FROM baskets GROUP BY item),
       |tri AS (
       |  SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
       |         CAST(COUNT(*) AS BIGINT) AS support
       |  FROM baskets a
       |  JOIN baskets b ON a.basket = b.basket AND a.item < b.item
       |  JOIN baskets c ON a.basket = c.basket AND b.item < c.item
       |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= $minSupport)
       |SELECT t.item_a, t.item_b, t.item_c, t.support,
       |  round(CAST(t.support AS DOUBLE) * n.n_baskets * n.n_baskets
       |    / (sa.s * sb.s * sc.s), 6) AS lift3
       |FROM tri t
       |JOIN supp sa ON sa.item = t.item_a
       |JOIN supp sb ON sb.item = t.item_b
       |JOIN supp sc ON sc.item = t.item_c, n""".stripMargin

  /** SCD2 snapshot merge (Scd.scd2Merge over orders, baseSeq 1 →
    * updSeq 2): full-outer join of snapshot vs derived update extract,
    * changed keys emit the closed version + the new current one,
    * inserts open at the update sequence. IS DISTINCT FROM mirrors the
    * Spark side's null-safe `<=>` comparison.
    */
  val qScd2: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      |upd AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 13 = 0
      |         THEN o_totalprice + 1.5
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus
      |  FROM orders WHERE o_orderkey % 13 = 0 OR o_orderkey % 17 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
      |  FROM orders WHERE o_orderkey % 19 = 0),
      |j AS (
      |  SELECT COALESCE(b.o_orderkey, u.o_orderkey) AS o_orderkey,
      |    b.o_totalprice AS bp, b.o_orderstatus AS bs,
      |    u.o_totalprice AS up, u.o_orderstatus AS us,
      |    b.o_orderkey IS NOT NULL AS in_b,
      |    u.o_orderkey IS NOT NULL AS in_u
      |  FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey),
      |ch AS (
      |  SELECT *, in_b AND in_u AND (bp IS DISTINCT FROM up
      |    OR bs IS DISTINCT FROM us) AS is_change
      |  FROM j)
      |SELECT o_orderkey, bp AS o_totalprice, bs AS o_orderstatus,
      |  CAST(1 AS BIGINT) AS valid_from, CAST(2 AS BIGINT) AS valid_to,
      |  CAST(0 AS INTEGER) AS is_current
      |FROM ch WHERE is_change
      |UNION ALL
      |SELECT o_orderkey,
      |  CASE WHEN is_change OR NOT in_b THEN up ELSE bp END,
      |  CASE WHEN is_change OR NOT in_b THEN us ELSE bs END,
      |  CAST(CASE WHEN is_change OR NOT in_b THEN 2 ELSE 1 END AS BIGINT),
      |  CAST(NULL AS BIGINT), CAST(1 AS INTEGER)
      |FROM ch""".stripMargin

  /** Type-1 CDC apply (Scd.cdcApply over the orders-derived I/U/D
    * log): highest-sequence row wins per key via row_number DESC (the
    * anti-mirror of the Spark side's max_by aggregate — matching
    * proves the one-agg compaction ≡ the textbook window form),
    * delete winners drop out.
    */
  val qCdcApply: String =
    """WITH log AS (
      |  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      |         o_orderstatus, CAST(1 AS BIGINT) AS seq, 'I' AS op
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, CAST(o_totalprice + 2.5 AS DOUBLE), 'P',
      |         CAST(2 AS BIGINT), 'U'
      |  FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
      |         CAST(3 AS BIGINT), 'D'
      |  FROM orders WHERE o_orderkey % 11 = 0),
      |w AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |    ORDER BY seq DESC) AS rn
      |  FROM log)
      |SELECT o_orderkey, o_totalprice, o_orderstatus, seq
      |FROM w WHERE rn = 1 AND op <> 'D'""".stripMargin

  /** RFM quintiles (Rfm.rfm over orders, 5 buckets): textbook ntile
    * windows over the identical total orders — the anti-mirror of the
    * range-partitioned [[graft.ops.Ranking.globalNtile]], proving its
    * bit-identical ntile semantics on every gate run.
    */
  val qRfm: String =
    """WITH pc AS (
      |  SELECT o_custkey AS cust, max(o_orderdate) AS last_d,
      |         CAST(COUNT(*) AS BIGINT) AS frequency,
      |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
      |           AS DOUBLE) / 100.0 AS monetary
      |  FROM orders GROUP BY 1),
      |a AS (SELECT max(o_orderdate) AS anchor FROM orders),
      |b AS (
      |  SELECT cust,
      |    CAST(date_diff('day', CAST(last_d AS DATE), CAST(anchor AS DATE))
      |      AS BIGINT) AS recency_days,
      |    frequency, monetary
      |  FROM pc, a),
      |s AS (
      |  SELECT *,
      |    ntile(5) OVER (ORDER BY recency_days DESC, cust) AS r,
      |    ntile(5) OVER (ORDER BY frequency, cust) AS f,
      |    ntile(5) OVER (ORDER BY monetary, cust) AS m
      |  FROM b)
      |SELECT cust, recency_days, frequency, monetary,
      |  CAST(r AS INTEGER) AS r, CAST(f AS INTEGER) AS f,
      |  CAST(m AS INTEGER) AS m,
      |  CAST(r * 100 + f * 10 + m AS INTEGER) AS rfm
      |FROM s""".stripMargin

  /** k-anonymity audit (Profile.kAnonymity over customer
    * quasi-identifiers, k = 10): one grouped count + broadcast total.
    */
  val qKAnonymity: String =
    """WITH cls AS (
      |  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cls)
      |SELECT c_nationkey, c_mktsegment, n,
      |  round(CAST(n AS DOUBLE) / t.total, 6) AS share,
      |  n < 10 AS at_risk
      |FROM cls, t""".stripMargin

  /** A/B readout (Experiment.abTest over events, salt "ab"): identical
    * md5-threshold variant split, exact-long conversion counts, the
    * pooled-variance z with the same 1e-9 term fixing and the same
    * se = 0 guard.
    */
  val qAbTest: String =
    """WITH u AS (SELECT DISTINCT user_id AS u FROM events),
      |v AS (
      |  SELECT u, CASE WHEN md5(CAST(u AS VARCHAR) || ':ab') < '8'
      |              THEN 'A' ELSE 'B' END AS variant
      |  FROM u),
      |d AS (
      |  SELECT max(CASE WHEN variant = 'A' THEN n END) AS n_a,
      |         max(CASE WHEN variant = 'B' THEN n END) AS n_b
      |  FROM (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n
      |        FROM v GROUP BY 1)),
      |c AS (
      |  SELECT metric,
      |    CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS conv_a,
      |    CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS conv_b
      |  FROM (SELECT DISTINCT event_type AS metric, user_id AS u
      |        FROM events) e
      |  JOIN v USING (u) GROUP BY 1),
      |s AS (
      |  SELECT c.*, d.n_a, d.n_b,
      |    CAST(conv_a AS DOUBLE) / d.n_a AS pa,
      |    CAST(conv_b AS DOUBLE) / d.n_b AS pb,
      |    CAST(conv_a + conv_b AS DOUBLE) / (d.n_a + d.n_b) AS pp
      |  FROM c, d),
      |se AS (
      |  SELECT *, round(sqrt(pp * (1 - pp) * (1.0 / n_a + 1.0 / n_b)), 9)
      |    AS sev
      |  FROM s),
      |f AS (
      |  SELECT metric, n_a, n_b, conv_a, conv_b,
      |    round(pa, 6) AS rate_a, round(pb, 6) AS rate_b,
      |    CASE WHEN sev > 0
      |         THEN round((round(pa, 9) - round(pb, 9)) / sev, 6)
      |         ELSE 0.0 END AS z
      |  FROM se)
      |SELECT *, abs(z) > 1.96 AS significant FROM f""".stripMargin

  /** Naive Bayes corpus classifier (Classifier.nbScore, label
    * lang = 'en'): per-token Laplace log-odds fixed to 1e-6 BIGINT
    * units before the per-doc integer sum — the micro-fixing makes the
    * score order-independent and immune to cross-engine ln() ULP
    * noise; arithmetic shape (two lns, one division each) mirrors the
    * Spark side exactly.
    */
  val qNbScore: String =
    s"""$norm, toks AS (
       |  SELECT n.doc_id,
       |    CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos,
       |    unnest(string_split(n.nt, ' ')) AS tok
       |  FROM norm n JOIN documents d ON d.doc_id = n.doc_id),
       |counts AS (
       |  SELECT tok, CAST(SUM(pos) AS DOUBLE) AS cp,
       |         CAST(SUM(1 - pos) AS DOUBLE) AS cn
       |  FROM toks GROUP BY tok),
       |tot AS (
       |  SELECT SUM(cp) AS tp, SUM(cn) AS tn,
       |         CAST(COUNT(*) AS DOUBLE) AS v
       |  FROM counts),
       |lo AS (
       |  SELECT tok,
       |    CAST(round((ln((cp + 1.0) / (tp + v))
       |      - ln((cn + 1.0) / (tn + v))) * 1e6, 0) AS BIGINT) AS lo_micro
       |  FROM counts, tot),
       |prior AS (
       |  SELECT CAST(round(ln(
       |      (CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
       |      / (CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS DOUBLE) + 1.0)
       |    ) * 1e6, 0) AS BIGINT) AS prior_micro
       |  FROM documents),
       |scores AS (
       |  SELECT t.doc_id, SUM(l.lo_micro) AS s_micro
       |  FROM toks t JOIN lo l ON l.tok = t.tok
       |  GROUP BY t.doc_id)
       |SELECT s.doc_id,
       |  round(CAST(s.s_micro + p.prior_micro AS DOUBLE) / 1e6, 6) AS nb_score,
       |  CAST(s.s_micro + p.prior_micro > 0 AS INTEGER) AS nb_pred
       |FROM scores s, prior p""".stripMargin

  /** impute_mice_generator (missing.py:212-230): n = 3 chains stacked
    * under imputation_id. Chain i redraws every null-origin cell as
    * prediction + sd·z, where sd is the fitted regression's residual
    * standard deviation and z a Box–Muller normal from md5-seeded
    * uniforms keyed (month_id, unit_id, column, chain) — mirroring
    * Imputer.miceGenerator's deterministic posterior-style noise.
    * Observed cells are identical across chains.
    */
  val qMiceGen: String = {
    val key = s"CAST(month_id AS VARCHAR) || ':' || CAST(unit_id AS VARCHAR) || ':value:' || CAST(c.i AS VARCHAR)"
    val u1 = s"(${hexInt8(s"$key || ':u1'")} + 0.5) / 4294967296.0"
    val u2 = s"(${hexInt8(s"$key || ':u2'")} + 0.5) / 4294967296.0"
    s"""$miceFill,
       |noisy AS (
       |  SELECT month_id, unit_id, value, value2, sd, vmin, vmax, value_imp,
       |    c.i AS i,
       |    sqrt(-2.0 * ln($u1)) * cos(2.0 * pi() * ($u2)) AS z
       |  FROM fill, (VALUES (0), (1), (2)) c(i))
       |SELECT month_id, unit_id, CAST(i AS INTEGER) AS imputation_id,
       |  CASE WHEN value IS NULL
       |       THEN round(least(greatest(value_imp + sd * z, vmin), vmax), 6)
       |       ELSE value_imp END AS value_imp,
       |  value2 AS value2_imp
       |FROM noisy""".stripMargin
  }

  /** l-diversity audit (Profile.lDiversity, quasi = c_nationkey,
    * sensitive = c_mktsegment, l = 3): exact distinct-sensitive count
    * per quasi class.
    */
  val qLDiversity: String =
    """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS distinct_sensitive,
      |  COUNT(DISTINCT c_mktsegment) < 3 AS at_risk
      |FROM customer GROUP BY 1""".stripMargin

  /** Gini revenue concentration (Profile.gini over per-customer order
    * totals): values fixed to integer cents per ROW before any sum (so
    * both engines aggregate exact integers in any order), closed-form
    * rank statistic in HUGEINT/DECIMAL(38,0).
    */
  val qGini: String =
    """WITH cents AS (
      |  SELECT o_custkey AS u,
      |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
      |  FROM orders GROUP BY 1),
      |r AS (SELECT x, row_number() OVER (ORDER BY x, u) AS rk FROM cents),
      |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
      |        SUM(CAST(x AS HUGEINT)) AS t,
      |        SUM(CAST(rk AS HUGEINT) * CAST(x AS HUGEINT)) AS s1
      |      FROM r)
      |SELECT n_units, round(CAST(t AS DOUBLE) / 100, 6) AS total,
      |  CASE WHEN t = 0 THEN NULL
      |       ELSE round(CAST(2 * s1 - (n_units + 1) * t AS DOUBLE)
      |                  / CAST(n_units * t AS DOUBLE), 6) END AS gini
      |FROM a""".stripMargin

  /** Triangle counts (graphs.Triangles over the simhash near-dup
    * pairs): the same degree-ordered orientation re-derived
    * relationally — each triangle closes exactly once at its
    * lowest-(deg, id) corner.
    */
  val qTriangles: String =
    s"""$norm, $simhashPairCtes,
       |e0 AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
       |canon AS (SELECT DISTINCT least(id_a, id_b) AS a,
       |            greatest(id_a, id_b) AS b
       |          FROM e0 WHERE id_a <> id_b),
       |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |          SELECT a AS id FROM canon
       |          UNION ALL SELECT b FROM canon) GROUP BY 1),
       |o AS (SELECT
       |        CASE WHEN (da.deg, c.a) < (db.deg, c.b)
       |             THEN c.a ELSE c.b END AS src,
       |        CASE WHEN (da.deg, c.a) < (db.deg, c.b)
       |             THEN c.b ELSE c.a END AS dst,
       |        CASE WHEN (da.deg, c.a) < (db.deg, c.b)
       |             THEN db.deg ELSE da.deg END AS ddeg
       |      FROM canon c
       |      JOIN deg da ON da.id = c.a
       |      JOIN deg db ON db.id = c.b),
       |wg AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
       |       FROM o e1 JOIN o e2 ON e1.src = e2.src
       |       WHERE (e1.ddeg, e1.dst) < (e2.ddeg, e2.dst)),
       |tri AS (SELECT u, v, w FROM wg
       |        JOIN o ON o.src = wg.v AND o.dst = wg.w),
       |pn AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
       |         SELECT u AS id FROM tri
       |         UNION ALL SELECT v FROM tri
       |         UNION ALL SELECT w FROM tri) GROUP BY 1)
       |SELECT d.id, COALESCE(pn.triangles, 0) AS triangles
       |FROM deg d LEFT JOIN pn ON pn.id = d.id""".stripMargin

  /** Link-prediction scores (graphs.LinkPredict over the simhash
    * near-dup pairs): wedge join on the shared neighbour, 1e-9-fixed
    * Adamic–Adar terms, exact-integer Jaccard, existing edges
    * anti-joined away.
    */
  val qLinkPredict: String =
    s"""$norm, $simhashPairCtes,
       |e0 AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
       |canon AS (SELECT DISTINCT least(id_a, id_b) AS a,
       |            greatest(id_a, id_b) AS b
       |          FROM e0 WHERE id_a <> id_b),
       |adj AS (SELECT a AS x, b AS z FROM canon
       |        UNION ALL SELECT b, a FROM canon),
       |deg AS (SELECT x AS id, CAST(COUNT(*) AS BIGINT) AS deg
       |        FROM adj GROUP BY 1),
       |w AS (SELECT e1.x AS a, e2.x AS b, e1.z AS z
       |      FROM adj e1 JOIN adj e2
       |        ON e1.z = e2.z AND e1.x < e2.x),
       |agg AS (SELECT w.a, w.b,
       |    CAST(COUNT(*) AS BIGINT) AS common_neighbors,
       |    SUM(CAST(round(1e9 / ln(CAST(dz.deg AS DOUBLE))) AS BIGINT))
       |      AS aa9
       |  FROM w JOIN deg dz ON dz.id = w.z GROUP BY 1, 2),
       |miss AS (SELECT agg.* FROM agg
       |  LEFT JOIN canon c ON c.a = agg.a AND c.b = agg.b
       |  WHERE c.a IS NULL)
       |SELECT m.a AS id_a, m.b AS id_b, m.common_neighbors,
       |  round(m.common_neighbors
       |    / (da.deg + db.deg - m.common_neighbors), 6) AS jaccard,
       |  round(aa9 / 1e9, 6) AS adamic_adar
       |FROM miss m
       |JOIN deg da ON da.id = m.a
       |JOIN deg db ON db.id = m.b""".stripMargin

  /** Stickiness (Engagement.stickiness): exact daily and rolling-7
    * distinct actives (the qRollingDau join formulation), observed
    * days only, one integer division.
    */
  val qStickiness: String =
    """WITH e AS (SELECT
      |  CAST(epoch_ns(ts) // 1000 // 86400000000 AS BIGINT) AS day,
      |  user_id FROM events),
      |p AS (SELECT DISTINCT day, user_id FROM e),
      |dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      |        FROM p GROUP BY 1),
      |days AS (SELECT DISTINCT day FROM e),
      |wau AS (SELECT d.day, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS wau
      |        FROM days d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
      |        GROUP BY 1)
      |SELECT dau.day, dau.dau, wau.wau,
      |  round(dau.dau / wau.wau, 6) AS stickiness
      |FROM dau JOIN wau ON wau.day = dau.day""".stripMargin

  /** Multi-touch attribution (Attribution.multiTouch): the
    * next-conversion assignment is a min over the FOLLOWING frame in
    * (t, event_id) order — the Spark side takes a struct min, the SQL
    * encodes the same pair as t·2³² + event_id in HUGEINT (event ids
    * are < 2³², so the encoding preserves the lexicographic order
    * exactly).
    */
  val qAttributionMulti: String =
    """WITH e AS (SELECT user_id,
      |  CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t, event_id, event_type
      |  FROM events),
      |tt AS (SELECT user_id, t, event_id, event_type,
      |         MIN(CASE WHEN event_type = 'purchase'
      |             THEN CAST(t AS HUGEINT) * 4294967296 + event_id END)
      |           OVER (PARTITION BY user_id ORDER BY t, event_id
      |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |           AS ck
      |       FROM e),
      |g AS (SELECT user_id, t, event_id AS touch_event_id,
      |        event_type AS touch_type,
      |        CAST(ck // 4294967296 AS BIGINT) AS conv_t,
      |        CAST(ck % 4294967296 AS BIGINT) AS conv_event_id
      |      FROM tt
      |      WHERE event_type <> 'purchase' AND ck IS NOT NULL),
      |p AS (SELECT *,
      |        CAST(COUNT(*) OVER (PARTITION BY user_id, conv_event_id)
      |          AS BIGINT) AS n_touches,
      |        CAST(row_number() OVER (PARTITION BY user_id, conv_event_id
      |          ORDER BY t, touch_event_id) AS BIGINT) AS position
      |      FROM g)
      |SELECT user_id, conv_t, conv_event_id, touch_event_id, touch_type,
      |  n_touches, position,
      |  round(1.0 / n_touches, 6) AS credit_linear,
      |  round(CASE WHEN n_touches <= 2 THEN 1.0 / n_touches
      |             WHEN position = 1 OR position = n_touches THEN 0.4
      |             ELSE 0.2 / (n_touches - 2.0) END, 6) AS credit_position
      |FROM p""".stripMargin

  /** Kaplan–Meier life table (Survival.kaplanMeier, censorDays = 7):
    * identical per-user lifetimes, censor convention, and the
    * 1e-9-rounded log-sum product form.
    */
  /** Log-rank test (Survival.logRank over the user-parity cohorts):
    * per-cohort lives against their OWN horizons, the dense two-group
    * life table, 1e-9-fixed per-time terms, the same χ² closed form.
    */
  def qLogRank(censorDays: Int = 7): String = {
    def lives(pred: String, g: Int) =
      s"""pu$g AS (SELECT user_id, MIN(ts) AS f, MAX(ts) AS l
         |  FROM events WHERE $pred GROUP BY 1),
         |hm$g AS (SELECT MAX(ts) AS hmax FROM events WHERE $pred),
         |lv$g AS (SELECT $g AS g,
         |    CAST(date_diff('day', CAST(f AS DATE), CAST(l AS DATE))
         |      AS BIGINT) AS t,
         |    CASE WHEN l < hmax - INTERVAL $censorDays DAY
         |         THEN 1 ELSE 0 END AS churn
         |  FROM pu$g, hm$g)""".stripMargin
    val e1 = "CAST(dt AS DOUBLE) * n1 / nt"
    val v1 = "CASE WHEN nt <= 1 THEN 0.0 ELSE dt * (CAST(n1 AS DOUBLE) / nt)" +
      " * (1.0 - CAST(n1 AS DOUBLE) / nt)" +
      " * CAST(nt - dt AS DOUBLE) / (nt - 1) END"
    val chi2 = "(oe9 / 1e9) * (oe9 / 1e9) / (v9 / 1e9)"
    s"""WITH ${lives("user_id % 2 = 0", 1)},
       |${lives("user_id % 2 = 1", 2)},
       |lv AS (SELECT * FROM lv1 UNION ALL SELECT * FROM lv2),
       |byt AS (SELECT t, g, CAST(SUM(churn) AS BIGINT) AS d,
       |    CAST(COUNT(*) AS BIGINT) AS lv_n
       |  FROM lv GROUP BY 1, 2),
       |times AS (SELECT DISTINCT t FROM byt),
       |dense AS (SELECT times.t, gg.g, COALESCE(byt.d, 0) AS d,
       |    COALESCE(byt.lv_n, 0) AS lv_n
       |  FROM times CROSS JOIN (SELECT unnest([1, 2]) AS g) gg
       |  LEFT JOIN byt ON byt.t = times.t AND byt.g = gg.g),
       |ar AS (SELECT *,
       |    SUM(lv_n) OVER (PARTITION BY g)
       |      - COALESCE(SUM(lv_n) OVER (PARTITION BY g ORDER BY t
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
       |  FROM dense),
       |wide AS (SELECT t,
       |    MAX(CASE WHEN g = 1 THEN d END) AS d1,
       |    MAX(CASE WHEN g = 2 THEN d END) AS d2,
       |    MAX(CASE WHEN g = 1 THEN n END) AS n1,
       |    MAX(CASE WHEN g = 2 THEN n END) AS n2
       |  FROM ar GROUP BY 1),
       |w2 AS (SELECT *, d1 + d2 AS dt, n1 + n2 AS nt FROM wide
       |  WHERE d1 + d2 >= 1),
       |terms AS (SELECT
       |    CAST(round((d1 - $e1) * 1e9) AS BIGINT) AS oe9,
       |    CAST(round(($v1) * 1e9) AS BIGINT) AS v9
       |  FROM w2),
       |s AS (SELECT SUM(oe9) AS oe9, SUM(v9) AS v9 FROM terms),
       |n1u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_1
       |  FROM events WHERE user_id % 2 = 0),
       |n2u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_2
       |  FROM events WHERE user_id % 2 = 1)
       |SELECT n_users_1, n_users_2,
       |  CASE WHEN v9 = 0 THEN NULL ELSE round($chi2, 6) END AS chi2,
       |  CASE WHEN v9 = 0 THEN NULL
       |       ELSE round($chi2 - 3.841, 6) > 0.0 END AS significant
       |FROM s, n1u, n2u""".stripMargin
  }

  val qSurvival: String =
    """WITH pu AS (SELECT user_id, MIN(ts) AS f, MAX(ts) AS l
      |            FROM events GROUP BY 1),
      |hm AS (SELECT MAX(ts) AS hmax FROM events),
      |lv AS (SELECT
      |         CAST(date_diff('day', CAST(f AS DATE), CAST(l AS DATE))
      |           AS BIGINT) AS duration_days,
      |         l < hmax - INTERVAL 7 DAY AS ch
      |       FROM pu, hm),
      |tb AS (SELECT duration_days,
      |         CAST(SUM(CASE WHEN ch THEN 1 ELSE 0 END) AS BIGINT)
      |           AS churned,
      |         CAST(SUM(CASE WHEN ch THEN 0 ELSE 1 END) AS BIGINT)
      |           AS censored
      |       FROM lv GROUP BY 1),
      |cw AS (SELECT *,
      |         CAST(SUM(churned + censored) OVER ()
      |           - COALESCE(SUM(churned + censored) OVER (
      |               ORDER BY duration_days
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS BIGINT) AS n_risk
      |       FROM tb),
      |lg AS (SELECT *,
      |         CASE WHEN churned < n_risk THEN
      |           CAST(round(ln(1.0 - CAST(churned AS DOUBLE) / n_risk)
      |             * 1e9) AS BIGINT)
      |         END AS lt9,
      |         CASE WHEN churned >= n_risk THEN 1 ELSE 0 END AS z
      |       FROM cw),
      |fin AS (SELECT *,
      |          SUM(z) OVER (ORDER BY duration_days
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zc,
      |          SUM(lt9) OVER (ORDER BY duration_days
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ls9
      |        FROM lg)
      |SELECT duration_days, churned, censored, n_risk,
      |  CASE WHEN zc > 0 THEN 0.0
      |       ELSE round(exp(CAST(COALESCE(ls9, 0) AS DOUBLE) / 1e9), 6)
      |  END AS survival
      |FROM fin""".stripMargin

  /** Two-sample KS drift (Sampling.ksTest over order totals split by
    * customer-key parity): exact ECDFs from grouped long counts.
    */
  val qKsTest: String =
    """WITH r AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
      |           WHERE o_custkey % 2 = 0),
      |c AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
      |      WHERE o_custkey % 2 = 1),
      |cr AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n_ref FROM r GROUP BY 1),
      |cc AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n_cur FROM c GROUP BY 1),
      |m AS (SELECT COALESCE(cr.v, cc.v) AS v,
      |        COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
      |      FROM cr FULL JOIN cc ON cr.v = cc.v),
      |cum AS (SELECT
      |          SUM(n_ref) OVER (ORDER BY v
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cref,
      |          SUM(n_cur) OVER (ORDER BY v
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccur
      |        FROM m),
      |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
      |        CAST(SUM(n_cur) AS BIGINT) AS tc FROM m),
      |s AS (SELECT tr AS n_ref, tc AS n_cur,
      |        round(MAX(abs(CAST(cref AS DOUBLE) / tr
      |          - CAST(ccur AS DOUBLE) / tc)), 6) AS d_stat,
      |        round(1.358 * sqrt(CAST(tr + tc AS DOUBLE)
      |          / (CAST(tr AS DOUBLE) * CAST(tc AS DOUBLE))), 6) AS d_crit
      |      FROM cum, t GROUP BY tr, tc)
      |SELECT *, d_stat > d_crit AS drifted FROM s""".stripMargin

  /** Per-unit autocorrelation function at lags 1..3 (TemporalOps.acf
    * over the dense panel): explicit-sum Pearson per lag, numerator
    * and both variances rounded 1e-9 (the rollingCorr discipline).
    */
  val qAcf: String =
    s"""${Oracle.panel},
       |lx AS (SELECT unit_id, value AS x,
       |         lag(value, 1) OVER (PARTITION BY unit_id
       |           ORDER BY month_id) AS y1,
       |         lag(value, 2) OVER (PARTITION BY unit_id
       |           ORDER BY month_id) AS y2,
       |         lag(value, 3) OVER (PARTITION BY unit_id
       |           ORDER BY month_id) AS y3
       |       FROM panel),
       |pairs AS (
       |  SELECT unit_id, 1 AS lag, x, y1 AS y FROM lx
       |  UNION ALL SELECT unit_id, 2, x, y2 FROM lx
       |  UNION ALL SELECT unit_id, 3, x, y3 FROM lx),
       |st AS (SELECT unit_id, lag,
       |         CAST(COUNT(CASE WHEN y IS NOT NULL THEN 1 END) AS DOUBLE)
       |           AS n,
       |         SUM(CASE WHEN y IS NOT NULL THEN x END) AS sx,
       |         SUM(y) AS sy,
       |         SUM(CASE WHEN y IS NOT NULL THEN x * x END) AS sxx,
       |         SUM(y * y) AS syy,
       |         SUM(x * y) AS sxy
       |       FROM pairs GROUP BY 1, 2)
       |SELECT unit_id, CAST(lag AS INTEGER) AS lag,
       |  CAST(n AS BIGINT) AS n_pairs,
       |  CASE WHEN n < 2 OR round(n * sxx - sx * sx, 9) <= 0
       |            OR round(n * syy - sy * sy, 9) <= 0 THEN NULL
       |       ELSE round(round(n * sxy - sx * sy, 9)
       |                  / sqrt(round(n * sxx - sx * sx, 9)
       |                         * round(n * syy - sy * sy, 9)), 6)
       |  END AS acf
       |FROM st""".stripMargin

  private val spatialCellsCtes =
    s"""${Oracle.panel},
       |cells AS (SELECT month_id, unit_id,
       |    unit_id % 40 AS lon, unit_id // 40 AS lat,
       |    CAST(round(value * 1e6) AS BIGINT) AS x6
       |  FROM panel),
       |ms AS (SELECT month_id, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(CAST(x6 AS HUGEINT)) AS s6,
       |    SUM(CAST(x6 AS HUGEINT) * x6) AS q
       |  FROM cells GROUP BY 1)""".stripMargin

  /** Global Moran's I (SpatialStats.moranI): queen pairs via the
    * coordinate join, exact integer z'ᵢ = n·x6ᵢ − Σx6 cross-products,
    * the denominator from the month moments — identical closed form.
    */
  val qMoranI: String =
    s"""$spatialCellsCtes,
       |off(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
       |                       (0,1),(1,-1),(1,0),(1,1)),
       |pr AS (SELECT c.month_id,
       |    (m.n * c.x6 - m.s6) * (m.n * nb.x6 - m.s6) AS zz
       |  FROM cells c CROSS JOIN off k
       |  JOIN cells nb ON nb.month_id = c.month_id
       |    AND nb.lon = c.lon + k.dx AND nb.lat = c.lat + k.dy
       |  JOIN ms m ON m.month_id = c.month_id),
       |ag AS (SELECT month_id, SUM(zz) AS num,
       |    CAST(COUNT(*) AS BIGINT) AS w_sum
       |  FROM pr GROUP BY 1)
       |SELECT m.month_id, m.n, COALESCE(a.w_sum, 0) AS w_sum,
       |  CASE WHEN (m.n * m.n * m.q - m.n * m.s6 * m.s6) = 0
       |            OR COALESCE(a.w_sum, 0) = 0 THEN NULL
       |       ELSE round((CAST(m.n AS DOUBLE) / a.w_sum)
       |         * (CAST(a.num AS DOUBLE)
       |            / CAST(m.n * m.n * m.q - m.n * m.s6 * m.s6 AS DOUBLE)), 6)
       |  END AS moran_i
       |FROM ms m LEFT JOIN ag a USING (month_id)""".stripMargin

  /** Geary's C (SpatialStats.gearyC): exact 1e-12-unit squared
    * differences over queen pairs, the moranI no-second-pass
    * denominator, the same closed form.
    */
  val qGearyC: String =
    s"""$spatialCellsCtes,
       |off(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
       |                       (0,1),(1,-1),(1,0),(1,1)),
       |pr AS (SELECT c.month_id,
       |    (CAST(c.x6 AS HUGEINT) - nb.x6) * (CAST(c.x6 AS HUGEINT) - nb.x6)
       |      AS dd
       |  FROM cells c CROSS JOIN off k
       |  JOIN cells nb ON nb.month_id = c.month_id
       |    AND nb.lon = c.lon + k.dx AND nb.lat = c.lat + k.dy),
       |ag AS (SELECT month_id, SUM(dd) AS num,
       |    CAST(COUNT(*) AS BIGINT) AS w_sum
       |  FROM pr GROUP BY 1)
       |SELECT m.month_id, m.n, COALESCE(a.w_sum, 0) AS w_sum,
       |  CASE WHEN (m.n * m.q - m.s6 * m.s6) = 0
       |            OR COALESCE(a.w_sum, 0) = 0 OR m.n <= 1 THEN NULL
       |       ELSE round((CAST(m.n - 1 AS DOUBLE) * m.n / (2 * a.w_sum))
       |         * (CAST(a.num AS DOUBLE)
       |            / CAST(m.n * m.q - m.s6 * m.s6 AS DOUBLE)), 6)
       |  END AS geary_c
       |FROM ms m LEFT JOIN ag a USING (month_id)""".stripMargin

  /** Local Moran Iᵢ (SpatialStats.localMoran): the integer z' scaling,
    * per-cell neighbour z-sums, one float division.
    */
  val qLocalMoran: String =
    s"""$spatialCellsCtes,
       |off(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
       |                       (0,1),(1,-1),(1,0),(1,1)),
       |sums AS (SELECT c.month_id, c.unit_id,
       |    CAST(COUNT(*) AS BIGINT) AS w_i,
       |    MAX(m.n * c.x6 - m.s6) AS zi,
       |    SUM(m.n * nb.x6 - m.s6) AS zsum
       |  FROM cells c CROSS JOIN off k
       |  JOIN cells nb ON nb.month_id = c.month_id
       |    AND nb.lon = c.lon + k.dx AND nb.lat = c.lat + k.dy
       |  JOIN ms m ON m.month_id = c.month_id
       |  GROUP BY 1, 2)
       |SELECT s.month_id, s.unit_id, s.w_i,
       |  CASE WHEN (m.n * m.n * m.q - m.n * m.s6 * m.s6) = 0 THEN NULL
       |       ELSE round(CAST(m.n AS DOUBLE) * (CAST(s.zi * s.zsum AS DOUBLE)
       |         / CAST(m.n * m.n * m.q - m.n * m.s6 * m.s6 AS DOUBLE)), 6)
       |  END AS local_i
       |FROM sums s JOIN ms m USING (month_id)""".stripMargin

  /** Local Getis–Ord Gi* (SpatialStats.getisOrdGi): queen-plus-self
    * neighbour sums, exact month moments, the same z-score closed form.
    */
  val qGetisOrd: String =
    s"""$spatialCellsCtes,
       |off(dx, dy) AS (VALUES (0,0),(-1,-1),(-1,0),(-1,1),(0,-1),
       |                       (0,1),(1,-1),(1,0),(1,1)),
       |gs AS (SELECT c.month_id, c.unit_id,
       |    CAST(COUNT(*) AS BIGINT) AS w_i,
       |    SUM(CAST(nb.x6 AS HUGEINT)) AS g6
       |  FROM cells c CROSS JOIN off k
       |  JOIN cells nb ON nb.month_id = c.month_id
       |    AND nb.lon = c.lon + k.dx AND nb.lat = c.lat + k.dy
       |  GROUP BY 1, 2)
       |SELECT g.month_id, g.unit_id, g.w_i,
       |  CASE WHEN (m.n * m.q - m.s6 * m.s6) = 0 OR m.n <= 1
       |            OR (m.n * g.w_i - g.w_i * g.w_i) = 0 THEN NULL
       |       ELSE round((CAST(g.g6 AS DOUBLE) / 1e6
       |           - (CAST(m.s6 AS DOUBLE) / m.n / 1e6) * g.w_i)
       |         / (sqrt(CAST(m.n * m.q - m.s6 * m.s6 AS DOUBLE)
       |                 / m.n / m.n / 1e12)
       |            * sqrt(CAST(m.n * g.w_i - g.w_i * g.w_i AS DOUBLE)
       |                   / (m.n - 1))), 6)
       |  END AS gi
       |FROM gs g JOIN ms m USING (month_id)""".stripMargin

  /** Seasonal/trend strength (TemporalOps.seasonalStrength, period 7,
    * half 2): the qDecompose windows, 1e-6-fixed components, exact
    * integer variance quantities whose n factors cancel in the ratio.
    */
  def qSeasonalStrength(period: Int = 7, half: Int = 2): String = {
    def ss(c: String) =
      s"COUNT(*) * SUM(CAST($c AS HUGEINT) * $c) - " +
        s"SUM(CAST($c AS HUGEINT)) * SUM(CAST($c AS HUGEINT))"
    s"""${Oracle.panel}, t AS (
       |  SELECT month_id, unit_id, value,
       |    avg(value) OVER (PARTITION BY unit_id ORDER BY month_id
       |      ROWS BETWEEN $half PRECEDING AND $half FOLLOWING) AS trend
       |  FROM panel),
       |s AS (
       |  SELECT *, avg(value - trend)
       |    OVER (PARTITION BY unit_id, month_id % $period) AS seasonal
       |  FROM t),
       |c AS (SELECT unit_id,
       |    CAST(round((value - trend - seasonal) * 1e6) AS BIGINT) AS r6,
       |    CAST(round((value - trend) * 1e6) AS BIGINT) AS dt6,
       |    CAST(round((value - seasonal) * 1e6) AS BIGINT) AS ds6
       |  FROM s WHERE (value - trend - seasonal) IS NOT NULL),
       |g AS (SELECT unit_id, CAST(COUNT(*) AS BIGINT) AS n,
       |    ${ss("r6")} AS vr, ${ss("dt6")} AS vdt, ${ss("ds6")} AS vds
       |  FROM c GROUP BY 1)
       |SELECT unit_id, n,
       |  CASE WHEN vds = 0 THEN NULL
       |       ELSE round(greatest(0.0,
       |         1.0 - CAST(vr AS DOUBLE) / CAST(vds AS DOUBLE)), 6)
       |  END AS f_trend,
       |  CASE WHEN vdt = 0 THEN NULL
       |       ELSE round(greatest(0.0,
       |         1.0 - CAST(vr AS DOUBLE) / CAST(vdt AS DOUBLE)), 6)
       |  END AS f_seasonal
       |FROM g""".stripMargin
  }

  /** FK-candidate inference (Integrity.fkCandidates): exact distinct
    * counts and containment via EXISTS, one UNION ALL block per pair.
    */
  def qFkCandidates(
      pairs: Seq[(String, String, String, String, String)]): String =
    pairs.map { case (name, ct, ck, pt, pk) =>
      s"""SELECT '$name' AS pair_name,
         |  CAST(c.n AS BIGINT) AS n_child_distinct,
         |  CAST(p.n AS BIGINT) AS n_parent_distinct,
         |  CAST(x.n AS BIGINT) AS n_contained,
         |  round(x.n / c.n, 6) AS containment,
         |  x.n = c.n AS is_candidate
         |FROM (SELECT COUNT(DISTINCT $ck) AS n FROM $ct
         |      WHERE $ck IS NOT NULL) c,
         |     (SELECT COUNT(DISTINCT $pk) AS n FROM $pt
         |      WHERE $pk IS NOT NULL) p,
         |     (SELECT COUNT(DISTINCT $ck) AS n FROM $ct o
         |      WHERE $ck IS NOT NULL AND EXISTS
         |        (SELECT 1 FROM $pt WHERE $pk = o.$ck)) x""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Burstiness (Engagement.burstiness): exact integer-micros gaps
    * from the same ordered lag, exact moment sums, the identical
    * (σ−μ)/(σ+μ) closed form.
    */
  val qBurstiness: String =
    """WITH e AS (SELECT user_id,
      |  CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t, event_id FROM events),
      |g AS (SELECT user_id,
      |    t - lag(t, 1) OVER (PARTITION BY user_id
      |      ORDER BY t, event_id) AS g
      |  FROM e),
      |st AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |    SUM(CAST(g AS HUGEINT)) AS s, SUM(CAST(g AS HUGEINT) * g) AS q
      |  FROM g WHERE g IS NOT NULL GROUP BY 1),
      |c AS (SELECT user_id, n_gaps,
      |    CAST(s AS DOUBLE) / n_gaps AS mu,
      |    sqrt(CAST(n_gaps * q - s * s AS DOUBLE)) / n_gaps AS sd
      |  FROM st)
      |SELECT user_id, n_gaps,
      |  round(mu / 1e6, 6) AS mean_gap_sec,
      |  CASE WHEN n_gaps < 2 OR sd + mu = 0.0 THEN NULL
      |       ELSE round((sd - mu) / (sd + mu), 6) END AS burstiness
      |FROM c""".stripMargin

  /** Runs test (TemporalOps.runsTest): explicit middle-statistic
    * median, integer a/b/R, the identical large-sample z.
    */
  val qRunsTest: String = {
    val muR = "(2.0 * n_above * n_below / (n_above + n_below) + 1.0)"
    val sigR = "sqrt(2.0 * n_above * n_below * " +
      "(2.0 * n_above * n_below - n_above - n_below) / " +
      "CAST((n_above + n_below) * (n_above + n_below) * " +
      "(n_above + n_below - 1) AS DOUBLE))"
    s"""${Oracle.panel},
       |obs AS (SELECT unit_id, month_id, value AS v FROM panel
       |  WHERE value IS NOT NULL AND NOT isnan(value)),
       |r AS (SELECT *,
       |    row_number() OVER (PARTITION BY unit_id
       |      ORDER BY v, month_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY unit_id) AS nn
       |  FROM obs),
       |med AS (SELECT unit_id, SUM(v) / COUNT(*) AS med FROM r
       |  WHERE rn = floor((nn + 1) / 2.0) OR rn = floor((nn + 2) / 2.0)
       |  GROUP BY 1),
       |sg AS (SELECT o.unit_id, o.month_id,
       |    CASE WHEN o.v > m.med THEN 1 ELSE 0 END AS s
       |  FROM obs o JOIN med m ON m.unit_id = o.unit_id
       |  WHERE o.v <> m.med),
       |ch AS (SELECT unit_id, s,
       |    CASE WHEN lag(s, 1) OVER (PARTITION BY unit_id
       |           ORDER BY month_id) IS NULL
       |         OR lag(s, 1) OVER (PARTITION BY unit_id
       |           ORDER BY month_id) <> s
       |         THEN 1 ELSE 0 END AS chg
       |  FROM sg),
       |st AS (SELECT unit_id, CAST(SUM(s) AS BIGINT) AS n_above,
       |    CAST(SUM(1 - s) AS BIGINT) AS n_below,
       |    CAST(SUM(chg) AS BIGINT) AS runs
       |  FROM ch GROUP BY 1)
       |SELECT unit_id, n_above, n_below, runs,
       |  CASE WHEN n_above = 0 OR n_below = 0 OR n_above + n_below < 2
       |       THEN NULL
       |       ELSE round((runs - $muR) / $sigR, 6) END AS z
       |FROM st""".stripMargin
  }

  /** Dominant period (TemporalOps.dominantPeriod): per-unit DFT power
    * with 1e-9-rounded trig factors, 1e-9-fixed terms, 1e-6-fixed
    * power, (power desc, k asc) argmax — identical arithmetic.
    */
  val qDominantPeriod: String =
    s"""${Oracle.panel},
       |obs AS (SELECT unit_id, value AS v,
       |    CAST(row_number() OVER (PARTITION BY unit_id
       |      ORDER BY month_id) - 1 AS BIGINT) AS t,
       |    CAST(COUNT(*) OVER (PARTITION BY unit_id) AS BIGINT) AS n
       |  FROM panel),
       |terms AS (SELECT unit_id, n, kk.k,
       |    CAST(round(v * round(cos(2 * pi() * kk.k * t / n), 9) * 1e9)
       |      AS BIGINT) AS c9,
       |    CAST(round(v * round(sin(2 * pi() * kk.k * t / n), 9) * 1e9)
       |      AS BIGINT) AS s9
       |  FROM obs, LATERAL (SELECT
       |    unnest(generate_series(1, CAST(floor(n / 2.0) AS BIGINT)))
       |      AS k) kk),
       |g AS (SELECT unit_id, n, k, SUM(c9) AS c, SUM(s9) AS s
       |  FROM terms GROUP BY 1, 2, 3),
       |p AS (SELECT unit_id, n, k,
       |    CAST(round(((c / 1e9) * (c / 1e9) + (s / 1e9) * (s / 1e9))
       |      * 1e6) AS BIGINT) AS p9
       |  FROM g),
       |best AS (SELECT *, row_number() OVER (PARTITION BY unit_id
       |    ORDER BY p9 DESC, k ASC) AS rn FROM p)
       |SELECT unit_id, n, CAST(k AS BIGINT) AS k,
       |  round(CAST(n AS DOUBLE) / k, 6) AS period,
       |  round(p9 / 1e6, 6) AS power
       |FROM best WHERE rn = 1""".stripMargin

  /** Mann–Kendall trend (TemporalOps.mannKendall): the same pair
    * signs, exact integer S, n recovered from the pair count by the
    * identical closed form.
    */
  val qMannKendall: String =
    s"""${Oracle.panel},
       |obs AS (SELECT unit_id, month_id, value AS v FROM panel
       |  WHERE value IS NOT NULL AND NOT isnan(value)),
       |pr AS (SELECT a.unit_id, CAST(sign(b.v - a.v) AS BIGINT) AS sgn
       |  FROM obs a JOIN obs b
       |    ON a.unit_id = b.unit_id AND a.month_id < b.month_id),
       |g AS (SELECT unit_id, CAST(COUNT(*) AS BIGINT) AS np,
       |    SUM(sgn) AS s
       |  FROM pr GROUP BY 1)
       |SELECT unit_id,
       |  CAST(round((1.0 + sqrt(1.0 + 8.0 * np)) / 2.0) AS BIGINT) AS n,
       |  CAST(s AS BIGINT) AS s, round(s / np, 6) AS tau
       |FROM g""".stripMargin

  /** Emerging-hot-spot taxonomy (SpatialStats.emergingHotspots): the
    * full Gi* query as a derived table, exact MK integers over the
    * rounded z-scores, arg_max for the last month, identical CASE
    * ladder.
    */
  val qEmergingHotspots: String =
    s"""WITH gi AS (SELECT month_id, unit_id, gi
       |  FROM ($qGetisOrd) g0 WHERE gi IS NOT NULL),
       |mk AS (SELECT a.unit_id,
       |    SUM(CAST(sign(b.gi - a.gi) AS BIGINT)) AS mk_s
       |  FROM gi a JOIN gi b
       |    ON a.unit_id = b.unit_id AND a.month_id < b.month_id
       |  GROUP BY 1),
       |per AS (SELECT unit_id, CAST(COUNT(*) AS BIGINT) AS n_months,
       |    CAST(SUM(CASE WHEN gi > 1.96 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_hot,
       |    CAST(SUM(CASE WHEN gi < -1.96 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_cold,
       |    arg_max(gi, month_id) AS last_gi
       |  FROM gi GROUP BY 1)
       |SELECT p.unit_id, p.n_months, p.n_hot, p.n_cold,
       |  CAST(COALESCE(m.mk_s, 0) AS BIGINT) AS mk_s,
       |  CASE WHEN p.n_hot * 10 >= p.n_months * 9
       |            AND COALESCE(m.mk_s, 0) > 0 THEN 'intensifying'
       |       WHEN p.n_hot * 10 >= p.n_months * 9 THEN 'persistent'
       |       WHEN p.last_gi > 1.96 AND p.n_hot * 2 <= p.n_months
       |         THEN 'emerging'
       |       WHEN p.n_hot > 0 THEN 'sporadic'
       |       ELSE 'none' END AS pattern
       |FROM per p LEFT JOIN mk m USING (unit_id)""".stripMargin

  /** PACF via Durbin–Levinson (TemporalOps.pacf): the full qAcf query
    * as a derived table, lag-pivoted, then the identical closed forms
    * over the 1e-6-rounded coefficients.
    */
  val qPacf: String =
    s"""WITH wide AS (
       |  SELECT unit_id,
       |    MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
       |    MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
       |    MAX(CASE WHEN lag = 3 THEN acf END) AS r3
       |  FROM ($qAcf) acf_t GROUP BY 1),
       |c1 AS (SELECT unit_id, r1, r2, r3,
       |    (1.0 - r1 * r1) AS den2,
       |    ((r2 - r1 * r1) / (1.0 - r1 * r1)) AS phi22
       |  FROM wide),
       |c2 AS (SELECT *, (r1 * (1.0 - phi22)) AS phi21 FROM c1),
       |c3 AS (SELECT *,
       |    (1.0 - phi21 * r1 - phi22 * r2) AS den3,
       |    ((r3 - phi21 * r2 - phi22 * r1)
       |      / (1.0 - phi21 * r1 - phi22 * r2)) AS phi33
       |  FROM c2),
       |p AS (SELECT unit_id, 1 AS lag, round(r1, 6) AS pacf FROM c3
       |  UNION ALL
       |  SELECT unit_id, 2, CASE WHEN den2 = 0.0 THEN NULL
       |    ELSE round(phi22, 6) END FROM c3
       |  UNION ALL
       |  SELECT unit_id, 3, CASE WHEN den2 = 0.0 OR den3 = 0.0 THEN NULL
       |    ELSE round(phi33, 6) END FROM c3)
       |SELECT unit_id, CAST(lag AS INTEGER) AS lag, pacf FROM p""".stripMargin

  /** Seasonal-naive backtest (TemporalOps.forecastBacktest, period 7):
    * the same lag forecast, 1e-9-fixed sMAPE terms, exact-integer
    * per-unit mean.
    */
  val qForecast: String =
    s"""${Oracle.panel},
       |lx AS (SELECT unit_id, value AS x,
       |         lag(value, 7) OVER (PARTITION BY unit_id
       |           ORDER BY month_id) AS f
       |       FROM panel),
       |t AS (SELECT unit_id,
       |    CAST(round(CASE WHEN abs(f) + abs(x) = 0.0 THEN 0.0
       |         ELSE 2.0 * abs(f - x) / (abs(f) + abs(x)) END * 1e9)
       |      AS BIGINT) AS t9
       |  FROM lx
       |  WHERE x IS NOT NULL AND NOT isnan(x)
       |    AND f IS NOT NULL AND NOT isnan(f))
       |SELECT unit_id, CAST(COUNT(*) AS BIGINT) AS n_eval,
       |  round(CAST(SUM(CAST(t9 AS HUGEINT)) AS DOUBLE) / COUNT(*) / 1e9, 6)
       |    AS smape
       |FROM t GROUP BY 1""".stripMargin

  /** Bounded-hop BFS (graphs.Bfs over the simhash near-dup pairs,
    * seeds = doc ids < 5): the frontier relaxation unrolled as one
    * chained CTE per hop — the qPageRank iteration discipline.
    */
  def qBfsHops(maxHops: Int = 4): String = {
    val sb = new StringBuilder(
      s"""$norm, $simhashPairCtes,
         |e0 AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
         |sym AS (SELECT id_a AS src, id_b AS dst FROM e0
         |        UNION SELECT id_b, id_a FROM e0),
         |nodes AS (SELECT DISTINCT src AS id FROM sym),
         |d0 AS (SELECT id,
         |         CASE WHEN id < 5 THEN CAST(0 AS BIGINT) END AS hops
         |       FROM nodes)""".stripMargin)
    (1 to maxHops).foreach { i =>
      sb.append(
        s""",
           |c$i AS (SELECT s.src AS id, MIN(d.hops) + 1 AS nh
           |        FROM sym s JOIN d${i - 1} d ON d.id = s.dst
           |        WHERE d.hops IS NOT NULL GROUP BY 1),
           |d$i AS (SELECT d.id,
           |          CASE WHEN d.hops IS NULL THEN c.nh
           |               WHEN c.nh IS NULL THEN d.hops
           |               ELSE least(d.hops, c.nh) END AS hops
           |        FROM d${i - 1} d LEFT JOIN c$i c ON c.id = d.id)"""
          .stripMargin)
    }
    sb.append(s"\nSELECT id, hops FROM d$maxHops").toString
  }

  /** Synchronous label propagation (graphs.LabelProp over the simhash
    * near-dup pairs): each round unrolled as neighbour-label counts +
    * a (count desc, label) argmax — the qBfsHops/qPageRank discipline.
    */
  /** The label-propagation CTE chain (sym edges + l0..l{iters}),
    * shared by qLabelProp and qModularity.
    */
  private def labelPropCtes(iters: Int): String = {
    val sb = new StringBuilder(
      s"""e0 AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
         |sym AS (SELECT id_a AS src, id_b AS dst FROM e0
         |        UNION SELECT id_b, id_a FROM e0),
         |l0 AS (SELECT DISTINCT src AS id, src AS label FROM sym)"""
        .stripMargin)
    (1 to iters).foreach { i =>
      sb.append(
        s""",
           |c$i AS (SELECT s.src, l.label, COUNT(*) AS n
           |        FROM sym s JOIN l${i - 1} l ON l.id = s.dst
           |        GROUP BY 1, 2),
           |l$i AS (SELECT src AS id, label FROM (
           |          SELECT src, label, row_number() OVER (PARTITION BY src
           |            ORDER BY n DESC, label) AS rn FROM c$i) z
           |        WHERE rn = 1)""".stripMargin)
    }
    sb.toString
  }

  def qLabelProp(iters: Int = 4): String =
    s"""$norm, $simhashPairCtes,
       |${labelPropCtes(iters)}
       |SELECT id, label FROM l$iters""".stripMargin

  /** Newman modularity (GraphStats.modularity of the labelProp
    * communities over the simhash pairs): exact integer intra-edge /
    * degree-mass counts on the doubled edge list, per-community
    * 1e-9-fixed terms.
    */
  def qModularity(iters: Int = 4): String =
    s"""$norm, $simhashPairCtes,
       |${labelPropCtes(iters)},
       |tag AS (SELECT s.src, s.dst, la.label AS csrc, lb.label AS cdst
       |  FROM sym s JOIN l$iters la ON la.id = s.src
       |  JOIN l$iters lb ON lb.id = s.dst),
       |intra AS (SELECT csrc AS c, CAST(COUNT(*) AS BIGINT) AS e2
       |  FROM tag WHERE csrc = cdst GROUP BY 1),
       |dm AS (SELECT csrc AS c, CAST(COUNT(*) AS BIGINT) AS d
       |  FROM tag GROUP BY 1),
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM tag),
       |terms AS (SELECT m2, CAST(round((CAST(COALESCE(e2, 0) AS DOUBLE) / m2
       |    - (CAST(d AS DOUBLE) / m2) * (CAST(d AS DOUBLE) / m2)) * 1e9)
       |    AS BIGINT) AS t9
       |  FROM dm LEFT JOIN intra USING (c), mm)
       |SELECT CAST(m2 / 2 AS BIGINT) AS m,
       |  CAST(COUNT(*) AS BIGINT) AS n_communities,
       |  round(CAST(SUM(t9) AS DOUBLE) / 1e9, 6) AS q
       |FROM terms GROUP BY m2""".stripMargin

  /** Degree assortativity (GraphStats.assortativity over the simhash
    * pairs): Pearson over edge endpoint degrees, exact HUGEINT
    * sufficient statistics.
    */
  val qAssortativity: String =
    s"""$norm, $simhashPairCtes,
       |e0 AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM e0
       |        UNION SELECT id_b, id_a FROM e0),
       |deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS dg
       |  FROM sym GROUP BY 1),
       |ee AS (SELECT da.dg AS da, db.dg AS db
       |  FROM sym s JOIN deg da ON da.id = s.src
       |  JOIN deg db ON db.id = s.dst),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
       |    SUM(CAST(da AS HUGEINT)) AS sx, SUM(CAST(db AS HUGEINT)) AS sy,
       |    SUM(CAST(da AS HUGEINT) * da) AS sxx,
       |    SUM(CAST(db AS HUGEINT) * db) AS syy,
       |    SUM(CAST(da AS HUGEINT) * db) AS sxy
       |  FROM ee)
       |SELECT CAST(m2 / 2 AS BIGINT) AS m,
       |  CASE WHEN m2 * sxx - sx * sx <= 0 OR m2 * syy - sy * sy <= 0
       |       THEN NULL
       |       ELSE round(CAST(m2 * sxy - sx * sy AS DOUBLE)
       |         / sqrt(CAST(m2 * sxx - sx * sx AS DOUBLE)
       |              * CAST(m2 * syy - sy * sy AS DOUBLE)), 6) END AS r
       |FROM st""".stripMargin

  /** Edit-distance-verified near-dup pairs (Dedup.editPairs): the
    * simhash band candidates re-verified with DuckDB's own levenshtein
    * over the shared normalized text — both engines run the textbook
    * unit-cost DP, so `edits` is an exact integer.
    */
  def qEditPairs(maxEdits: Int = 20): String =
    s"""$norm, $simhashPairCtes,
       |ecand AS (SELECT id_a, id_b FROM h WHERE hamming <= 3)
       |SELECT c.id_a, c.id_b,
       |  CAST(levenshtein(ta.nt, tb.nt) AS INTEGER) AS edits
       |FROM ecand c
       |JOIN norm ta ON ta.doc_id = c.id_a
       |JOIN norm tb ON tb.doc_id = c.id_b
       |WHERE levenshtein(ta.nt, tb.nt) <= $maxEdits""".stripMargin

  /** Round-bounded k-core peel (graphs.KCore over the simhash near-dup
    * pairs): each synchronous peel unrolled as keep-set + semi-joined
    * degree recount CTEs — the qBfsHops discipline; `converged`
    * recomputes the Spark side's fixpoint test (last peel kept every
    * admitted node and nothing remains below k).
    */
  def qKCore(k: Int = 2, rounds: Int = 4): String = {
    // every round CTE is MATERIALIZED: each d_i references s_i twice
    // (both IN-subqueries) and s_i references d_{i-1} — DuckDB 1.0
    // INLINES non-materialized CTEs per reference, so a 4-round peel
    // re-executed the whole pair pipeline exponentially many times
    // (measured 74 s; materialized, 0.6 s — same 186 rows)
    val sb = new StringBuilder(
      s"""$norm, $simhashPairCtes,
         |e0 AS (SELECT id_a, id_b FROM h WHERE hamming <= 3),
         |sym AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM e0
         |        UNION SELECT id_b, id_a FROM e0),
         |d0 AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
         |       FROM sym GROUP BY 1)""".stripMargin)
    (1 to rounds).foreach { i =>
      sb.append(
        s""",
           |s$i AS MATERIALIZED (SELECT id FROM d${i - 1} WHERE deg >= $k),
           |d$i AS MATERIALIZED (
           |        SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
           |        FROM sym
           |        WHERE src IN (SELECT id FROM s$i)
           |          AND dst IN (SELECT id FROM s$i)
           |        GROUP BY 1)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT id, deg,
         |  ((SELECT COUNT(*) FROM s$rounds) = (SELECT COUNT(*) FROM d$rounds)
         |   AND (SELECT COUNT(*) FROM d$rounds WHERE deg < $k) = 0)
         |  AS converged
         |FROM d$rounds WHERE deg >= $k""".stripMargin)
    sb.toString
  }

  /** Snapshot diff (Scd.snapshotDiff of orders vs the deterministic
    * synthetic "next extract": keys %97 removed, prices %31 bumped,
    * keys %53 re-added shifted): per-row value hashes compared WITHIN
    * each engine, so the counts are engine-exact whatever the float
    * rendering; NULLs encode as an explicit 0x00-prefixed sentinel
    * per column (concat_ws skips NULL operands — the Scala twin).
    */
  val qSnapshotDiff: String =
    """WITH bef AS (SELECT o_orderkey AS k,
      |    md5(concat_ws(chr(1),
      |      coalesce(CAST(o_totalprice AS VARCHAR), chr(0) || 'NULL'),
      |      coalesce(o_orderstatus, chr(0) || 'NULL'))) AS h
      |  FROM orders),
      |aft0 AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
      |  FROM orders WHERE o_orderkey % 53 = 0),
      |aft AS (SELECT o_orderkey AS k,
      |    md5(concat_ws(chr(1),
      |      coalesce(CAST(o_totalprice AS VARCHAR), chr(0) || 'NULL'),
      |      coalesce(o_orderstatus, chr(0) || 'NULL'))) AS h
      |  FROM aft0),
      |j AS (SELECT b.h AS hb, a.h AS ha
      |  FROM bef b FULL JOIN aft a ON a.k = b.k)
      |SELECT CAST(COUNT(hb) AS BIGINT) AS n_before,
      |  CAST(COUNT(ha) AS BIGINT) AS n_after,
      |  CAST(SUM(CASE WHEN hb IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS added,
      |  CAST(SUM(CASE WHEN ha IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS removed,
      |  CAST(SUM(CASE WHEN hb IS NOT NULL AND ha IS NOT NULL AND hb <> ha
      |    THEN 1 ELSE 0 END) AS BIGINT) AS changed,
      |  CAST(SUM(CASE WHEN hb = ha THEN 1 ELSE 0 END) AS BIGINT)
      |    AS unchanged
      |FROM j""".stripMargin

  /** IPF raking (Sampling.rake over priority × status toward uniform
    * marginals): each row/column scaling unrolled as a marginal-mass
    * CTE (exact 1e-9-unit integer sums) plus a 1e-9-rounded weight
    * update — the PageRank float-recursion discipline.
    */
  def qRake(iters: Int = 4): String = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val stats = Seq("F", "O", "P")
    val taVals = prios.map(p => s"('$p', CAST(0.2 AS DOUBLE))").mkString(", ")
    val tbVals = stats.map(s0 => s"('$s0', CAST(${1.0 / 3} AS DOUBLE))")
      .mkString(", ")
    val sb = new StringBuilder(
      s"""WITH cells AS (SELECT CAST(o_orderpriority AS VARCHAR) AS a,
         |    CAST(o_orderstatus AS VARCHAR) AS b,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM orders GROUP BY 1, 2),
         |t AS (SELECT SUM(n) AS tot FROM cells),
         |ta(a, tA) AS (VALUES $taVals),
         |tb(b, tB) AS (VALUES $tbVals),
         |w0 AS (SELECT a, b, n, tot, tA, tB, CAST(1.0 AS DOUBLE) AS w
         |  FROM cells CROSS JOIN t
         |  JOIN ta USING (a) JOIN tb USING (b))""".stripMargin)
    (1 to iters).foreach { i =>
      sb.append(
        s""",
           |ra$i AS (SELECT a, SUM(CAST(round(n * w * 1e9) AS BIGINT)) AS m9
           |  FROM w${i - 1}a GROUP BY 1),
           |wa$i AS (SELECT w.a, w.b, w.n, w.tot, w.tA, w.tB,
           |    round(w.w * (tA * tot) / (CAST(m9 AS DOUBLE) / 1e9), 9) AS w
           |  FROM w${i - 1}a w JOIN ra$i USING (a)),
           |rb$i AS (SELECT b, SUM(CAST(round(n * w * 1e9) AS BIGINT)) AS m9
           |  FROM wa$i GROUP BY 1),
           |w${i}a AS (SELECT w.a, w.b, w.n, w.tot, w.tA, w.tB,
           |    round(w.w * (tB * tot) / (CAST(m9 AS DOUBLE) / 1e9), 9) AS w
           |  FROM wa$i w JOIN rb$i USING (b))""".stripMargin
          .replace(s"w0a", "w0"))
    }
    sb.append(
      s"""
         |SELECT a AS o_orderpriority, b AS o_orderstatus, n,
         |  round(w, 6) AS weight
         |FROM w${iters}a""".stripMargin)
    sb.toString
  }

  /** McNemar (Stats.mcnemar of high-priority vs finished flags on the
    * same orders): discordant-cell counts, one exact ratio.
    */
  val qMcnemar: String =
    """WITH r AS (SELECT
      |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS a,
      |    o_orderstatus = 'F' AS b
      |  FROM orders),
      |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM r)
      |SELECT n, b, c,
      |  CASE WHEN b + c = 0 THEN NULL
      |       ELSE round(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 6)
      |  END AS chi2,
      |  CASE WHEN b + c = 0 THEN NULL
      |       ELSE round(CAST((b - c) * (b - c) AS DOUBLE) / (b + c)
      |         - 3.841, 6) > 0.0 END AS significant
      |FROM s""".stripMargin

  /** Cohen's kappa (Stats.cohensKappa of priority-class vs status):
    * exact cells and margins, p_o/p_e as ratios of exact integers.
    */
  val qCohensKappa: String =
    """WITH cells AS (SELECT
      |    CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS VARCHAR) AS a,
      |    CAST(o_orderstatus = 'F' AS VARCHAR) AS b,
      |    CAST(COUNT(*) AS BIGINT) AS o
      |  FROM orders GROUP BY 1, 2),
      |ag AS (SELECT SUM(o) AS n,
      |    SUM(CASE WHEN a = b THEN o ELSE 0 END) AS agr FROM cells),
      |ra AS (SELECT a AS v, SUM(o) AS rt FROM cells GROUP BY 1),
      |cb AS (SELECT b AS v, SUM(o) AS ct FROM cells GROUP BY 1),
      |pe0 AS (SELECT COALESCE(SUM(CAST(rt AS HUGEINT) * ct), 0) AS p0
      |  FROM ra JOIN cb USING (v))
      |SELECT CAST(n AS BIGINT) AS n,
      |  round(CAST(agr AS DOUBLE) / n, 6) AS po,
      |  round(CAST(p0 AS DOUBLE) / CAST(CAST(n AS HUGEINT) * n AS DOUBLE), 6)
      |    AS pe,
      |  CASE WHEN CAST(p0 AS DOUBLE) / CAST(CAST(n AS HUGEINT) * n AS DOUBLE)
      |         = 1.0 THEN NULL
      |       ELSE round((CAST(agr AS DOUBLE) / n
      |           - CAST(p0 AS DOUBLE) / CAST(CAST(n AS HUGEINT) * n AS DOUBLE))
      |         / (1.0 - CAST(p0 AS DOUBLE)
      |             / CAST(CAST(n AS HUGEINT) * n AS DOUBLE)), 6)
      |  END AS kappa
      |FROM ag, pe0""".stripMargin

  /** Weight of evidence + IV (ml.Eval.weightOfEvidence of priority vs
    * finished status): Laplace-smoothed shares as ratios of exact
    * counts, identical association, 1e-6-rounded outputs.
    */
  val qWoe: String = {
    val ps = "((n_pos + 0.5) / (tp + k * 0.5))"
    val ns = "((n - n_pos + 0.5) / (tn - tp + k * 0.5))"
    s"""WITH cells AS (SELECT o_orderpriority AS f,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_pos
       |  FROM orders GROUP BY 1),
       |t AS (SELECT SUM(n) AS tn, SUM(n_pos) AS tp,
       |    CAST(COUNT(*) AS BIGINT) AS k FROM cells)
       |SELECT f AS o_orderpriority, n, n_pos,
       |  round(ln($ps / $ns), 6) AS woe,
       |  round(($ps - $ns) * ln($ps / $ns), 6) AS iv_term
       |FROM cells, t""".stripMargin
  }

  /** Decile lift chart (ml.Eval.liftChart of order totals vs high
    * priority): exact ntile buckets (ties are identical rows, so any
    * tie assignment gives identical per-bucket counts), cumulative
    * capture and lift as ratios of exact integers.
    */
  def qLiftChart(buckets: Int = 10): String =
    s"""WITH r AS (SELECT round(o_totalprice, 9) AS s,
       |    CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS BIGINT) AS y
       |  FROM orders),
       |b AS (SELECT ntile($buckets) OVER (ORDER BY s DESC, y DESC)
       |    AS bucket, y FROM r),
       |per AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(y) AS BIGINT) AS n_pos FROM b GROUP BY 1),
       |t AS (SELECT SUM(n) AS tn, SUM(n_pos) AS tp FROM per),
       |c AS (SELECT bucket, n, n_pos,
       |    SUM(n_pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cp,
       |    SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cn
       |  FROM per)
       |SELECT CAST(bucket AS INTEGER) AS bucket, n, n_pos,
       |  round(CAST(n_pos AS DOUBLE) / tp, 6) AS capture,
       |  round(CAST(cp AS DOUBLE) / tp, 6) AS cum_capture,
       |  round((CAST(cp AS DOUBLE) / cn) / (CAST(tp AS DOUBLE) / tn), 6)
       |    AS lift
       |FROM c, t""".stripMargin

  /** Shared calibration CTEs (ml.Eval.calibration over max-normalized
    * order totals vs the high-priority flag): 1e-9-fixed scores,
    * equal-width clamped bins, per-bin exact integer sums.
    */
  private def calibCtes(bins: Int): String =
    s"""WITH sc AS (SELECT
       |    o_totalprice / (SELECT MAX(o_totalprice) FROM orders) AS s0,
       |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS y0
       |  FROM orders),
       |r AS (SELECT round(s0, 9) AS s, CAST(y0 AS BIGINT) AS y FROM sc),
       |cells AS (SELECT
       |    CAST(least(greatest(floor(s * $bins), 0), ${bins - 1})
       |      AS INTEGER) AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS pos,
       |    SUM(CAST(round(s * 1e9) AS BIGINT)) AS ss9
       |  FROM r GROUP BY 1)""".stripMargin

  def qCalibration(bins: Int = 10): String =
    s"""${calibCtes(bins)}
       |SELECT bin, n,
       |  round(CAST(ss9 AS DOUBLE) / n / 1e9, 6) AS mean_pred,
       |  round(CAST(pos AS DOUBLE) / n, 6) AS frac_pos,
       |  round(abs(CAST(ss9 AS DOUBLE) / n / 1e9
       |    - CAST(pos AS DOUBLE) / n), 6) AS gap
       |FROM cells""".stripMargin

  def qCalibrationSummary(bins: Int = 10): String =
    s"""${calibCtes(bins)},
       |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(CAST(CAST(round((s - y) * (s - y) * 1e9) AS BIGINT)
       |      AS HUGEINT)) AS sb9
       |  FROM r),
       |g AS (SELECT SUM(CAST(n AS HUGEINT) * CAST(round(abs(
       |      round(CAST(ss9 AS DOUBLE) / n / 1e9, 6)
       |      - round(CAST(pos AS DOUBLE) / n, 6)) * 1e9) AS BIGINT)) AS sg9
       |  FROM cells)
       |SELECT n,
       |  round(CAST(sb9 AS DOUBLE) / n / 1e9, 6) AS brier,
       |  round(CAST(sg9 AS DOUBLE) / n / 1e9, 6) AS ece
       |FROM b, g""".stripMargin

  /** Exact ROC AUC (ml.Eval.aucRoc over order totals vs high-priority
    * flag): Mann–Whitney U with average-rank ties from grouped counts,
    * half-ranks kept integral by doubling.
    */
  val qAuc: String =
    """WITH cells AS (
      |  SELECT round(o_totalprice, 9) AS s,
      |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |        THEN 1 ELSE 0 END) AS BIGINT) AS pos,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1),
      |cum AS (SELECT *, SUM(n) OVER (ORDER BY s
      |          ROWS UNBOUNDED PRECEDING) AS c FROM cells),
      |r AS (SELECT pos, n, 2 * (c - n) + n + 1 AS r2 FROM cum)
      |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
      |  CAST(SUM(n - pos) AS BIGINT) AS n_neg,
      |  CASE WHEN SUM(pos) = 0 OR SUM(n - pos) = 0 THEN NULL
      |       ELSE round(CAST(SUM(pos * r2) - SUM(pos) * (SUM(pos) + 1)
      |                    AS DOUBLE)
      |                  / (2.0 * SUM(pos) * SUM(n - pos)), 6) END AS auc
      |FROM r""".stripMargin

  /** Per-doc TF-IDF top-k terms (Index.tfidfTerms, k = 5): smoothed
    * idf rounded 1e-9 before the tf multiply, rank over the 1e-6
    * rounded score with the term as tiebreak.
    */
  val qTfidfTerms: String =
    s"""$norm,
       |toks AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS term
       |         FROM norm),
       |t1 AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM toks WHERE len(term) > 0 GROUP BY 1, 2),
       |d1 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
       |       FROM t1 GROUP BY 1),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
       |sc AS (SELECT doc_id, t1.term, tf, df,
       |         round(tf * round(ln((n + 1.0) / (df + 1.0)) + 1.0, 9), 6)
       |           AS score
       |       FROM t1 JOIN d1 USING (term), nn),
       |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
       |         ORDER BY score DESC, term) AS BIGINT) AS term_rank
       |       FROM sc)
       |SELECT doc_id, term, tf, df, score, term_rank
       |FROM rk WHERE term_rank <= 5""".stripMargin

  /** Time-to-convert (Attribution.conversionLatency): the
    * qAttributionMulti assignment encoding, then one group per
    * conversion.
    */
  val qConversionLatency: String =
    """WITH e AS (SELECT user_id,
      |  CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t, event_id, event_type
      |  FROM events),
      |tt AS (SELECT user_id, t, event_id, event_type,
      |         MIN(CASE WHEN event_type = 'purchase'
      |             THEN CAST(t AS HUGEINT) * 4294967296 + event_id END)
      |           OVER (PARTITION BY user_id ORDER BY t, event_id
      |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |           AS ck
      |       FROM e),
      |g AS (SELECT user_id, t,
      |        CAST(ck % 4294967296 AS BIGINT) AS conv_event_id,
      |        CAST(ck // 4294967296 AS BIGINT) AS ct
      |      FROM tt
      |      WHERE event_type <> 'purchase' AND ck IS NOT NULL)
      |SELECT user_id, conv_event_id, MIN(ct) AS conv_t,
      |  CAST(COUNT(*) AS BIGINT) AS n_touches,
      |  round(CAST(MIN(ct) - MIN(t) AS DOUBLE) / 1000000.0, 6)
      |    AS latency_sec
      |FROM g GROUP BY 1, 2""".stripMargin

  /** Rolling 7-day distinct actives (Engagement.rollingDistinctUsers):
    * the exact expansion only — the sketch estimate is engine-specific,
    * so the checked value is the emitted bounded-error verdict (the
    * qVocabApprox discipline: oracle returns TRUE).
    */
  val qRollingDau: String =
    """WITH e AS (SELECT
      |  CAST(epoch_ns(ts) // 1000 // 86400000000 AS BIGINT) AS day,
      |  user_id FROM events),
      |p AS (SELECT DISTINCT day, user_id FROM e),
      |days AS (SELECT DISTINCT day FROM e)
      |SELECT d.day AS day,
      |  CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS dau_exact,
      |  TRUE AS within_5pct
      |FROM days d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
      |GROUP BY 1""".stripMargin

  /** Cohort LTV curve (Engagement.ltvCurve): integer-div epoch-week
    * cohorts (the qRetention convention), exact-cents purchase sums,
    * per-cohort cumulative over age.
    */
  val qLtv: String =
    """WITH e AS (SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t,
      |  value, event_type FROM events),
      |f AS (SELECT user_id, MIN(t) // 604800000000 AS cohort_week
      |      FROM e GROUP BY 1),
      |s AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
      |      FROM f GROUP BY 1),
      |p AS (SELECT f.cohort_week,
      |        (e.t // 604800000000) - f.cohort_week AS age_week,
      |        SUM(CAST(round(e.value * 100) AS HUGEINT)) AS cents
      |      FROM e JOIN f USING (user_id)
      |      WHERE e.event_type = 'purchase' GROUP BY 1, 2),
      |w AS (SELECT cohort_week, age_week, cents,
      |        SUM(cents) OVER (PARTITION BY cohort_week ORDER BY age_week
      |          ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM p)
      |SELECT w.cohort_week, CAST(w.age_week AS BIGINT) AS age_week,
      |  s.n_users,
      |  round(CAST(cents AS DOUBLE) / 100, 6) AS revenue,
      |  round(CAST(cum AS DOUBLE) / 100.0 / s.n_users, 6) AS ltv_per_user
      |FROM w JOIN s USING (cohort_week)""".stripMargin

  /** Dedup impact report (Dedup.dedupImpact): global keep-lowest-id
    * exact dedup on md5(nt), per-source doc/token survival.
    */
  val qDedupImpact: String =
    s"""$norm,
       |b AS (SELECT n.doc_id, d.source, md5(n.nt) AS fp,
       |        CAST(len(string_split_regex(trim(n.text), '\\s+'))
       |          AS BIGINT) AS ntok
       |      FROM norm n JOIN documents d USING (doc_id)),
       |k AS (SELECT fp, MIN(doc_id) AS keep FROM b GROUP BY 1)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN b.doc_id = k.keep THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_kept,
       |  CAST(SUM(ntok) AS BIGINT) AS tokens,
       |  CAST(SUM(CASE WHEN b.doc_id = k.keep THEN ntok ELSE 0 END)
       |    AS BIGINT) AS tokens_kept,
       |  round(1.0 - CAST(SUM(CASE WHEN b.doc_id = k.keep THEN 1 ELSE 0 END)
       |          AS DOUBLE) / COUNT(*), 6) AS dup_ratio
       |FROM b JOIN k USING (fp)
       |GROUP BY source""".stripMargin

  /** Top-20 session paths (Engagement.sessionPaths, gap 3600 s, first
    * 8 event types): gap sessions via lag + running sum, ordered
    * array_agg sliced to the path cap.
    */
  val qSessionPaths: String =
    """WITH e AS (SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t,
      |  event_id, event_type FROM events),
      |m AS (SELECT *, CASE WHEN t - lag(t) OVER
      |         (PARTITION BY user_id ORDER BY t, event_id) <= 3600000000
      |       THEN 0 ELSE 1 END AS ns FROM e),
      |s AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id
      |        ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM m),
      |p AS (SELECT user_id, sid, array_to_string(
      |        (array_agg(event_type ORDER BY t, event_id))[1:8], '>') AS path
      |      FROM s GROUP BY 1, 2),
      |c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      |      FROM p GROUP BY 1),
      |r AS (SELECT path, n_sessions, CAST(row_number() OVER
      |        (ORDER BY n_sessions DESC, path) AS BIGINT) AS path_rank
      |      FROM c)
      |SELECT path, n_sessions, path_rank FROM r WHERE path_rank <= 20"""
      .stripMargin

  /** Pareto concentration deciles (Profile.paretoShare): the qGini
    * exact-cents discipline + window ntile (bit-identical to the
    * repo's exact global ntile).
    */
  val qPareto: String =
    """WITH cents AS (SELECT o_custkey AS u,
      |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
      |  FROM orders GROUP BY 1),
      |b AS (SELECT u, x, ntile(10) OVER (ORDER BY x DESC, u) AS bucket
      |      FROM cents),
      |g AS (SELECT CAST(bucket AS BIGINT) AS bucket,
      |        CAST(COUNT(*) AS BIGINT) AS n_units,
      |        SUM(CAST(x AS HUGEINT)) AS v
      |      FROM b GROUP BY 1),
      |t AS (SELECT SUM(v) AS tot FROM g)
      |SELECT bucket, n_units,
      |  round(CAST(v AS DOUBLE) / 100, 6) AS bucket_value,
      |  round(CAST(v AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS value_share,
      |  round(CAST(SUM(v) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
      |          AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_value_share
      |FROM g, t""".stripMargin

  /** Star-schema integrity audit (Integrity.audit): six UNION ALL
    * verdict rows — FK orphans count NULL child keys as violations
    * (anti-join semantics), PK duplicate counts include every row of
    * a duplicated key.
    */
  val qRefIntegrity: String = {
    def fk(name: String, child: String, ck: String, parent: String,
           pk: String) =
      s"""SELECT '$name' AS check_name,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child) AS n_rows,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child c
         |    WHERE NOT EXISTS (SELECT 1 FROM $parent p
         |                      WHERE p.$pk = c.$ck)) AS n_bad""".stripMargin
    def pk(name: String, table: String, keys: Seq[String]) = {
      val kc = keys.mkString(", ")
      val nullPred = keys.map(k => s"$k IS NULL").mkString(" OR ")
      s"""SELECT '$name' AS check_name,
         |  CAST(SUM(n) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN n > 1 OR ($nullPred) THEN n ELSE 0 END)
         |    AS BIGINT) AS n_bad
         |FROM (SELECT $kc, COUNT(*) AS n FROM $table
         |      GROUP BY $kc) g""".stripMargin
    }
    val parts = Seq(
      fk("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      fk("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      fk("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      fk("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      pk("orders_pk", "orders", Seq("o_orderkey")),
      pk("lineitem_pk", "lineitem", Seq("l_orderkey", "l_linenumber")))
    s"""SELECT check_name, n_rows, n_bad, n_bad = 0 AS ok FROM (
       |${parts.mkString("\nUNION ALL\n")}
       |) checks""".stripMargin
  }

  /** Time-decay attribution (Attribution.timeDecay, halflife 7 d):
    * the qConversionLatency struct-min encoding, per-touch pow weight
    * fixed to 1e-9 ints, normalized inside each conversion.
    */
  val qTimeDecay: String =
    """WITH e AS (SELECT user_id,
      |  CAST(epoch_ns(ts) // 1000 AS BIGINT) AS t, event_id, event_type
      |  FROM events),
      |tt AS (SELECT user_id, t, event_id, event_type,
      |         MIN(CASE WHEN event_type = 'purchase'
      |             THEN CAST(t AS HUGEINT) * 4294967296 + event_id END)
      |           OVER (PARTITION BY user_id ORDER BY t, event_id
      |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |           AS ck
      |       FROM e),
      |a AS (SELECT user_id, t, event_id AS touch_event_id,
      |        event_type AS touch_type,
      |        CAST(ck % 4294967296 AS BIGINT) AS conv_event_id,
      |        CAST((ck // 4294967296) - t AS DOUBLE) / 1e6 AS age_sec
      |      FROM tt WHERE event_type <> 'purchase' AND ck IS NOT NULL),
      |w AS (SELECT *, CAST(round(power(2.0, -age_sec / 604800.0) * 1e9)
      |        AS BIGINT) AS w9 FROM a),
      |s AS (SELECT *, SUM(w9) OVER (PARTITION BY user_id, conv_event_id)
      |        AS tot FROM w)
      |SELECT user_id, conv_event_id, touch_event_id, touch_type,
      |  round(age_sec, 6) AS age_sec,
      |  round(CAST(w9 AS DOUBLE) / tot, 6) AS credit_decay
      |FROM s""".stripMargin

  /** Mutual information (Stats.mutualInfo over order priority ×
    * status): observed-cell 1e-9-int terms, marginal entropies the
    * same way, NMI from the rounded pieces.
    */
  val qMutualInfo: String =
    """WITH cells AS (
      |  SELECT o_orderpriority AS a, o_orderstatus AS b,
      |         CAST(COUNT(*) AS BIGINT) AS o
      |  FROM orders GROUP BY 1, 2),
      |rt AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
      |ct AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
      |t AS (SELECT SUM(o) AS n FROM cells),
      |mi AS (
      |  SELECT CAST(n AS BIGINT) AS n,
      |    round(CAST(SUM(CAST(round((CAST(o AS DOUBLE) / n)
      |      * ln(CAST(o AS DOUBLE) * n / (CAST(ra AS DOUBLE) * cb))
      |      * 1e9) AS BIGINT)) AS DOUBLE) / 1e9, 6) AS mi
      |  FROM cells JOIN rt USING (a) JOIN ct USING (b), t
      |  GROUP BY n),
      |ha AS (SELECT round(CAST(SUM(CAST(round((CAST(ra AS DOUBLE) / n)
      |         * ln(CAST(ra AS DOUBLE) / n) * -1e9) AS BIGINT)) AS DOUBLE)
      |         / 1e9, 6) AS h_a FROM rt, t),
      |hb AS (SELECT round(CAST(SUM(CAST(round((CAST(cb AS DOUBLE) / n)
      |         * ln(CAST(cb AS DOUBLE) / n) * -1e9) AS BIGINT)) AS DOUBLE)
      |         / 1e9, 6) AS h_b FROM ct, t)
      |SELECT n, mi, h_a, h_b,
      |  CASE WHEN h_a <= 0.0 OR h_b <= 0.0 THEN NULL
      |       ELSE round(mi / sqrt(h_a * h_b), 6) END AS nmi
      |FROM mi, ha, hb""".stripMargin

  /** Categorical top-values profile (Profile.topValues over order
    * priority/status, k = 5): per-column value counts + rank, share
    * against the table total.
    */
  val qTopValues: String = {
    def cte(c: String, i: Int) =
      s"""c$i AS (SELECT COALESCE(CAST($c AS VARCHAR), '<null>') AS value,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1),
         |r$i AS (SELECT '$c' AS "column", value, n,
         |  CAST(row_number() OVER (ORDER BY n DESC, value) AS BIGINT)
         |    AS value_rank FROM c$i)""".stripMargin
    s"""WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM orders),
       |${cte("o_orderpriority", 1)},
       |${cte("o_orderstatus", 2)}
       |SELECT "column", value, n,
       |  round(CAST(n AS DOUBLE) / tot, 6) AS share, value_rank
       |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2) u, t
       |WHERE value_rank <= 5""".stripMargin
  }

  /** Welch t-test (Stats.welchT over order totals split by customer
    * parity): identical exact-cent sufficient statistics and closed
    * forms.
    */
  val qWelchT: String = {
    def stats(pred: String, t: String) =
      s"""s$t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_$t,
         |  SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS s_$t,
         |  SUM(CAST(round(o_totalprice * 100) AS HUGEINT)
         |    * CAST(round(o_totalprice * 100) AS HUGEINT)) AS q_$t
         |FROM orders WHERE $pred)""".stripMargin
    def m(t: String) = s"CAST(s_$t AS DOUBLE) / n_$t / 100.0"
    def v(t: String) =
      s"(CAST(n_$t * q_$t - s_$t * s_$t AS DOUBLE) / n_$t / (n_$t - 1) / 1e4)"
    val se2a = s"(${v("a")} / n_a)"
    val se2b = s"(${v("b")} / n_b)"
    val tStat = s"((${m("a")} - ${m("b")}) / sqrt($se2a + $se2b))"
    val dof = s"(($se2a + $se2b) * ($se2a + $se2b) / ($se2a * $se2a / (n_a - 1) + $se2b * $se2b / (n_b - 1)))"
    s"""WITH ${stats("o_custkey % 2 = 0", "a")},
       |${stats("o_custkey % 2 = 1", "b")}
       |SELECT n_a, n_b,
       |  round(${m("a")}, 6) AS mean_a, round(${m("b")}, 6) AS mean_b,
       |  round($tStat, 6) AS t, round($dof, 6) AS dof,
       |  round(abs($tStat) - 1.96, 6) > 0.0 AS significant
       |FROM sa, sb""".stripMargin
  }

  /** Distinct-cardinality profile (Profile.distinctProfile over
    * lineitem keys): exact counts + TRUE for the sketch envelope (the
    * estimate is engine-specific — qVocabApprox discipline).
    */
  val qDistinctProfile: String = {
    def row(c: String) =
      s"""SELECT '$c' AS "column",
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  TRUE AS within_5pct
         |FROM lineitem""".stripMargin
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
      .map(row).mkString("\nUNION ALL\n")
  }

  /** Equi-width histogram (Stats.histogram over lineitem prices, 12
    * bins): identical width-then-divide arithmetic, max lands in the
    * last bin.
    */
  val qHistogram: String =
    """WITH ext AS (SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS mn,
      |  MAX(CAST(l_extendedprice AS DOUBLE)) AS mx FROM lineitem),
      |b AS (SELECT CASE WHEN mx = mn THEN 0
      |        ELSE CAST(least(floor((CAST(l_extendedprice AS DOUBLE) - mn)
      |               / ((mx - mn) / 12)), 11) AS BIGINT) END AS bin,
      |        mn, mx
      |      FROM lineitem, ext)
      |SELECT bin,
      |  round(mn + bin * ((mx - mn) / 12), 6) AS lo,
      |  round(mn + (bin + 1) * ((mx - mn) / 12), 6) AS hi,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM b GROUP BY bin, mn, mx""".stripMargin

  /** Equi-depth histogram (Stats.equiDepthHistogram, 8 bins over
    * prices): the same exact interior percentiles (quantile_cont ≡
    * Spark percentile), strictly-below bin assignment, min/max outer
    * edges.
    */
  def qHistogramEq(nbins: Int = 8): String = {
    val qs = (1 until nbins).map(i => i.toDouble / nbins).mkString(", ")
    val bin = (1 until nbins)
      .map(i => s"CASE WHEN CAST(l_extendedprice AS DOUBLE) > qs[$i] THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH b AS (SELECT
       |  quantile_cont(CAST(l_extendedprice AS DOUBLE), [$qs]) AS qs,
       |  MIN(CAST(l_extendedprice AS DOUBLE)) AS mn,
       |  MAX(CAST(l_extendedprice AS DOUBLE)) AS mx FROM lineitem),
       |a AS (SELECT CAST($bin AS BIGINT) AS bin FROM lineitem, b),
       |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM a GROUP BY 1)
       |SELECT bin,
       |  round(CASE WHEN bin = 0 THEN mn ELSE qs[CAST(bin AS INTEGER)] END, 6)
       |    AS q_lo,
       |  round(CASE WHEN bin = ${nbins - 1} THEN mx
       |        ELSE qs[CAST(bin + 1 AS INTEGER)] END, 6) AS q_hi,
       |  n
       |FROM g, b""".stripMargin
  }

  /** Exact global quantiles (Stats.exactQuantiles): quantile_cont per
    * requested q — the type-7 interpolation both engines share.
    */
  def qQuantiles(qs: Seq[Double]): String =
    qs.map(q =>
      s"""SELECT $q AS q,
         |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), $q), 6)
         |    AS value
         |FROM lineitem""".stripMargin)
      .mkString("\nUNION ALL\n")

  /** Quantile sketch gate (Stats.quantileSketchGate): exact values via
    * quantile_cont, TRUE for the rank-envelope verdict (the sketch is
    * engine-specific — qVocabApprox discipline).
    */
  def qQuantilesApprox(qs: Seq[Double]): String =
    qs.map(q =>
      s"""SELECT $q AS q,
         |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), $q), 6)
         |    AS value,
         |  TRUE AS within_eps
         |FROM lineitem""".stripMargin)
      .mkString("\nUNION ALL\n")

  /** Flesch readability (TextOps.readability): the same three regex
    * counts floored at 1 and the same row-local closed form.
    */
  val qReadability: String =
    """WITH c AS (SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |    AS n_words,
      |  greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
      |    AS n_sentences,
      |  greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |    AS BIGINT), 1) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  round(206.835 - 1.015 * (n_words / n_sentences)
      |    - 84.6 * (n_syllables / n_words), 6) AS flesch
      |FROM c""".stripMargin

  /** Bloom audit (Dedup.bloomAudit on the qDedupIncremental split):
    * exact member/non-member ground truth; the filter's false-positive
    * verdict is the envelope TRUE (q_vocab_approx discipline).
    */
  val qBloomAudit: String =
    s"""$norm, batch AS (
       |  SELECT doc_id + 10000 AS doc_id,
       |         CASE WHEN doc_id % 2 = 0 THEN text
       |              ELSE text || ' fresh-batch-suffix' END AS text
       |  FROM documents WHERE doc_id % 3 = 0),
       |bfp AS (SELECT
       |  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
       |  FROM batch),
       |m AS (SELECT CASE WHEN EXISTS (
       |    SELECT 1 FROM norm c WHERE md5(c.nt) = b.fingerprint)
       |    THEN 1 ELSE 0 END AS mem FROM bfp b)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
       |  CAST(SUM(mem) AS BIGINT) AS n_members,
       |  CAST(SUM(1 - mem) AS BIGINT) AS n_nonmembers,
       |  TRUE AS fpr_ok
       |FROM m""".stripMargin

  /** One-way ANOVA F (Stats.anovaF over price × return flag): exact
    * integer-cent group sums → 1e-9-rounded means → integer-fixed
    * squared-deviation sums (1e-2 units within, 1e0 between), the
    * identical two-pass arithmetic.
    */
  val qAnova: String = {
    val f = "(CAST(ssb0 AS DOUBLE) / (k - 1)) / " +
      "(CAST(ssw2 AS DOUBLE) / 100.0 / (n - k))"
    s"""WITH g AS (SELECT l_returnflag AS grp,
       |  CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
       |means AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
       |  round(CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) / COUNT(*) / 100.0, 9)
       |    AS mg FROM g GROUP BY 1),
       |grand AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |  round(CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) / COUNT(*) / 100.0, 9)
       |    AS mu FROM g),
       |ssw AS (SELECT SUM(CAST(CAST(round(
       |    (CAST(c AS DOUBLE) / 100.0 - mg) * (CAST(c AS DOUBLE) / 100.0 - mg)
       |    * 100) AS BIGINT) AS HUGEINT)) AS ssw2
       |  FROM g JOIN means USING (grp)),
       |ssb AS (SELECT SUM(CAST(CAST(round(ng * (mg - mu) * (mg - mu))
       |    AS BIGINT) AS HUGEINT)) AS ssb0, CAST(COUNT(*) AS BIGINT) AS k
       |  FROM means, grand)
       |SELECT n, k,
       |  round(CAST(ssb0 AS DOUBLE), 6) AS ss_between,
       |  round(CAST(ssw2 AS DOUBLE) / 100.0, 6) AS ss_within,
       |  round($f, 6) AS f,
       |  round($f - 2.996, 6) > 0.0 AS significant
       |FROM grand, ssw, ssb""".stripMargin
  }

  /** Spearman rho (Stats.spearman over quantity × discount): doubled
    * tie-averaged ranks from the margin cumsums, cell-count-weighted
    * exact HUGEINT sufficient statistics, the same closed form.
    */
  val qSpearman: String =
    """WITH cells AS (SELECT l_quantity AS a, l_discount AS b,
      |  CAST(COUNT(*) AS BIGINT) AS o FROM lineitem GROUP BY 1, 2),
      |ra AS (SELECT a, 2 * SUM(nv) OVER (ORDER BY a
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nv + 1 AS r2a
      |  FROM (SELECT a, SUM(o) AS nv FROM cells GROUP BY 1) ma),
      |rb AS (SELECT b, 2 * SUM(nv) OVER (ORDER BY b
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nv + 1 AS r2b
      |  FROM (SELECT b, SUM(o) AS nv FROM cells GROUP BY 1) mb),
      |s AS (SELECT SUM(o) AS n,
      |    SUM(CAST(o AS HUGEINT) * r2a) AS sx,
      |    SUM(CAST(o AS HUGEINT) * r2b) AS sy,
      |    SUM(CAST(o AS HUGEINT) * r2a * r2a) AS sxx,
      |    SUM(CAST(o AS HUGEINT) * r2b * r2b) AS syy,
      |    SUM(CAST(o AS HUGEINT) * r2a * r2b) AS sxy
      |  FROM cells JOIN ra USING (a) JOIN rb USING (b))
      |SELECT CAST(n AS BIGINT) AS n,
      |  CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN NULL
      |       ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |         sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |            * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS rho
      |FROM s""".stripMargin

  /** Kruskal–Wallis H (Stats.kruskalWallis over quantity × return
    * flag): the spearman doubled-rank machinery, exact HUGEINT rank
    * sums, integer-fixed per-group terms, exact tie correction.
    */
  val qKruskalWallis: String = {
    val corr = "(1.0 - CAST(tt AS DOUBLE) / CAST(n * n * n - n AS DOUBLE))"
    val h0 = "(3.0 * CAST(t AS DOUBLE) / CAST(n * (n + 1) AS DOUBLE)" +
      " - 3.0 * (n + 1))"
    s"""WITH cells AS (SELECT l_returnflag AS g, l_quantity AS v,
       |    CAST(COUNT(*) AS BIGINT) AS o
       |  FROM lineitem GROUP BY 1, 2),
       |m AS (SELECT v, SUM(o) AS nv FROM cells GROUP BY 1),
       |rk AS (SELECT v, 2 * SUM(nv) OVER (ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    - nv + 1 AS r2
       |  FROM m),
       |pg AS (SELECT g, SUM(o) AS ng,
       |    SUM(CAST(o AS HUGEINT) * r2) AS s2
       |  FROM cells JOIN rk USING (v) GROUP BY 1),
       |s AS (SELECT SUM(ng) AS n, CAST(COUNT(*) AS BIGINT) AS k,
       |    SUM(CAST(round(CAST(s2 * s2 AS DOUBLE) / ng) AS HUGEINT)) AS t
       |  FROM pg),
       |tt AS (SELECT SUM(CAST(nv AS HUGEINT) * nv * nv - nv) AS tt FROM m)
       |SELECT CAST(n AS BIGINT) AS n, k,
       |  CASE WHEN $corr = 0.0 THEN NULL
       |       ELSE round($h0 / $corr, 6) END AS h,
       |  CASE WHEN $corr = 0.0 THEN NULL
       |       ELSE round($h0 / $corr - 5.991, 6) > 0.0 END AS significant
       |FROM s, tt""".stripMargin
  }

  /** Mann–Whitney U (Stats.mannWhitney over quantity split by orderkey
    * parity): the kruskal doubled-rank cell machinery specialised to
    * two samples — exact HUGEINT rank sums, exact doubled U, the
    * tie-corrected normal approximation with identical association.
    */
  val qMannWhitney: String = {
    val varU = "CAST(na * nb AS DOUBLE) / 12.0 * " +
      "(CAST(na + nb + 1 AS DOUBLE) - CAST(tt AS DOUBLE) " +
      "/ CAST((na + nb) * (na + nb - 1) AS DOUBLE))"
    val z = s"CAST(r2a - na * (na + 1) - na * nb AS DOUBLE) / 2.0 " +
      s"/ sqrt($varU)"
    s"""WITH cells AS (SELECT CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE 1 END
       |    AS g, l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS o
       |  FROM lineitem GROUP BY 1, 2),
       |m AS (SELECT v, SUM(o) AS nv FROM cells GROUP BY 1),
       |rk AS (SELECT v, 2 * SUM(nv) OVER (ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    - nv + 1 AS r2
       |  FROM m),
       |pg AS (SELECT g, SUM(o) AS ng,
       |    SUM(CAST(o AS HUGEINT) * r2) AS s2
       |  FROM cells JOIN rk USING (v) GROUP BY 1),
       |s AS (SELECT MAX(CASE WHEN g = 0 THEN ng END) AS na,
       |    MAX(CASE WHEN g = 1 THEN ng END) AS nb,
       |    MAX(CASE WHEN g = 0 THEN s2 END) AS r2a FROM pg),
       |tt AS (SELECT SUM(CAST(nv AS HUGEINT) * nv * nv - nv) AS tt FROM m)
       |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       |  round(CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0, 6) AS u,
       |  round(CAST(r2a - na * (na + 1) AS DOUBLE)
       |    / CAST(na * nb AS DOUBLE) / 2.0, 6) AS auc,
       |  CASE WHEN $varU <= 0.0 THEN NULL
       |       ELSE round($z, 6) END AS z,
       |  CASE WHEN $varU <= 0.0 THEN NULL
       |       ELSE round(abs($z) - 1.96, 6) > 0.0 END AS significant
       |FROM s, tt""".stripMargin
  }

  /** Brown–Forsythe W (Stats.brownForsythe over quantity × return
    * flag): per-group explicit-middle medians from the cell cumsums,
    * 1e-6-fixed absolute deviations, the anovaF arithmetic
    * cell-weighted at the shared 1e-6 scale.
    */
  val qBrownForsythe: String = {
    val w = "(CAST(ssb6 AS DOUBLE) / (k - 1)) / " +
      "(CAST(ssw6 AS DOUBLE) / (n - k))"
    s"""WITH cells AS (SELECT l_returnflag AS g,
       |    CAST(l_quantity AS DOUBLE) AS v, CAST(COUNT(*) AS BIGINT) AS o
       |  FROM lineitem GROUP BY 1, 2),
       |tg AS (SELECT g, SUM(o) AS ngt FROM cells GROUP BY 1),
       |cc AS (SELECT g, v, o, SUM(o) OVER (PARTITION BY g ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM cells),
       |meds AS (SELECT g, round((
       |      MIN(CASE WHEN cum >= floor((ngt + 1) / 2) THEN v END)
       |    + MIN(CASE WHEN cum >= ceil((ngt + 1) / 2) THEN v END)) / 2.0, 9)
       |    AS med
       |  FROM cc JOIN tg USING (g) GROUP BY 1),
       |zc AS (SELECT g, o, CAST(round(abs(v - med) * 1e6) AS BIGINT) AS z6
       |  FROM cells JOIN meds USING (g)),
       |means AS (SELECT g, SUM(o) AS ng,
       |    round(CAST(SUM(CAST(o AS HUGEINT) * z6) AS DOUBLE)
       |      / SUM(o) / 1e6, 9) AS mg
       |  FROM zc GROUP BY 1),
       |grand AS (SELECT SUM(o) AS n,
       |    round(CAST(SUM(CAST(o AS HUGEINT) * z6) AS DOUBLE)
       |      / SUM(o) / 1e6, 9) AS mu
       |  FROM zc),
       |ssw AS (SELECT SUM(CAST(o AS HUGEINT) * CAST(round(
       |    (CAST(z6 AS DOUBLE) / 1e6 - mg) * (CAST(z6 AS DOUBLE) / 1e6 - mg)
       |    * 1e6) AS BIGINT)) AS ssw6
       |  FROM zc JOIN means USING (g)),
       |ssb AS (SELECT SUM(CAST(CAST(round(ng * (mg - mu) * (mg - mu) * 1e6)
       |    AS BIGINT) AS HUGEINT)) AS ssb6, CAST(COUNT(*) AS BIGINT) AS k
       |  FROM means, grand)
       |SELECT CAST(n AS BIGINT) AS n, k,
       |  round($w, 6) AS w,
       |  round($w - 2.996, 6) > 0.0 AS significant
       |FROM grand, ssw, ssb""".stripMargin
  }

  /** Mood's median test (Stats.moodMedian over quantity × return
    * flag): grand median as the explicit middle order statistics of
    * the pooled value margin, then the qChi2 machinery over the 2×k
    * above-vs-not contingency.
    */
  val qMoodMedian: String =
    """WITH mg AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS nv
      |  FROM lineitem GROUP BY 1),
      |mc AS (SELECT v, nv, SUM(nv) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM mg),
      |mt AS (SELECT SUM(nv) AS nt FROM mg),
      |med AS (SELECT round((
      |    MIN(CASE WHEN cum >= floor((nt + 1) / 2) THEN v END)
      |  + MIN(CASE WHEN cum >= ceil((nt + 1) / 2) THEN v END)) / 2.0, 9)
      |    AS med FROM mc, mt),
      |cells AS (SELECT l_returnflag AS a,
      |    CAST(l_quantity AS DOUBLE) > med AS b,
      |    CAST(COUNT(*) AS BIGINT) AS o
      |  FROM lineitem, med GROUP BY 1, 2),
      |rt AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
      |ct AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
      |t AS (SELECT SUM(o) AS n, COUNT(DISTINCT a) AS ka,
      |             COUNT(DISTINCT b) AS kb FROM cells),
      |dense AS (
      |  SELECT rt.a, ct.b, rt.ra, ct.cb, COALESCE(c.o, 0) AS o
      |  FROM rt CROSS JOIN ct
      |  LEFT JOIN cells c ON c.a = rt.a AND c.b = ct.b),
      |terms AS (
      |  SELECT n, ka, kb,
      |    CAST(round((o - CAST(ra AS DOUBLE) * cb / n)
      |             * (o - CAST(ra AS DOUBLE) * cb / n)
      |             / (CAST(ra AS DOUBLE) * cb / n) * 1e9) AS BIGINT) AS t9
      |  FROM dense, t)
      |SELECT CAST(n AS BIGINT) AS n,
      |  CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
      |  round(CAST(SUM(t9) AS DOUBLE) / 1e9, 6) AS chi2,
      |  round(sqrt(round(CAST(SUM(t9) AS DOUBLE) / 1e9, 6)
      |    / (n * (least(ka, kb) - 1))), 6) AS cramers_v,
      |  round(round(CAST(SUM(t9) AS DOUBLE) / 1e9, 6) - 5.991, 6) > 0.0
      |    AS significant,
      |  (SELECT med FROM med) AS grand_median
      |FROM terms GROUP BY n, ka, kb""".stripMargin

  /** t-closeness (Profile.tCloseness, quasi = nation, sensitive =
    * segment, t = 0.2): densified class × sensitive cells, 1e-9-fixed
    * |p − q| terms, per-class halved sum.
    */
  val qTCloseness: String =
    """WITH cells AS (SELECT c_nationkey AS q, c_mktsegment AS s,
      |  CAST(COUNT(*) AS BIGINT) AS o FROM customer GROUP BY 1, 2),
      |ct AS (SELECT q, SUM(o) AS nc FROM cells GROUP BY 1),
      |st AS (SELECT s, SUM(o) AS gs FROM cells GROUP BY 1),
      |t AS (SELECT SUM(o) AS n FROM cells),
      |dens AS (SELECT ct.q, ct.nc, st.s, st.gs, COALESCE(cells.o, 0) AS o, n
      |  FROM ct CROSS JOIN st
      |  LEFT JOIN cells ON cells.q = ct.q AND cells.s = st.s, t),
      |cls AS (SELECT q AS c_nationkey, CAST(nc AS BIGINT) AS n,
      |    round(CAST(SUM(CAST(round(abs(CAST(o AS DOUBLE) / nc
      |      - CAST(gs AS DOUBLE) / n) * 1e9) AS BIGINT)) AS DOUBLE) / 2e9, 6)
      |      AS tvd
      |  FROM dens GROUP BY 1, 2)
      |SELECT c_nationkey, n, tvd,
      |  round(tvd - 0.2, 6) > 0.0 AS at_risk
      |FROM cls""".stripMargin

  /** Theil–Sen slope (TemporalOps.theilSen on the panel): pairwise
    * slopes from a unit-keyed self-join, median as the average of the
    * explicit middle order statistics — the same two floats.
    */
  val qTheilSen: String =
    s"""${Oracle.panel},
       |pairs AS (SELECT a.unit_id,
       |    (b.value - a.value) / CAST(b.month_id - a.month_id AS DOUBLE) AS s,
       |    a.month_id AS m1, b.month_id AS m2
       |  FROM panel a JOIN panel b
       |    ON a.unit_id = b.unit_id AND a.month_id < b.month_id
       |  WHERE a.value IS NOT NULL AND NOT isnan(a.value)
       |    AND b.value IS NOT NULL AND NOT isnan(b.value)),
       |r AS (SELECT unit_id, s,
       |    row_number() OVER (PARTITION BY unit_id ORDER BY s, m1, m2) AS rn,
       |    COUNT(*) OVER (PARTITION BY unit_id) AS np
       |  FROM pairs)
       |SELECT unit_id, CAST(MAX(np) AS BIGINT) AS n_pairs,
       |  round(SUM(s) / COUNT(*), 6) AS ts_slope
       |FROM r
       |WHERE rn = floor((np + 1) / 2.0) OR rn = floor((np + 2) / 2.0)
       |GROUP BY unit_id""".stripMargin

  /** Level-shift changepoint (TemporalOps.changepoint on the panel):
    * values 1e-9-fixed to BIGINT at the scan, EXACT integer cumulative
    * and full-series sums (association-proof — no window-reassociation
    * noise can exist), the 1e-9-fixed statistic, and the same
    * (stat desc, month asc) argmax.
    */
  val qChangepoint: String = {
    val cum = "OVER (PARTITION BY unit_id ORDER BY month_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    val shift = "(CAST(stot9 - c9 AS DOUBLE) / 1e9 / (tt - t) " +
      "- CAST(c9 AS DOUBLE) / 1e9 / t)"
    s"""${Oracle.panel},
       |fx AS (SELECT unit_id, month_id, value,
       |    CASE WHEN value IS NOT NULL AND NOT isnan(value)
       |         THEN CAST(round(value * 1e9) AS BIGINT) END AS v9
       |  FROM panel),
       |st AS (SELECT unit_id, month_id, value,
       |    SUM(v9) $cum AS c9,
       |    COUNT(v9) $cum AS t,
       |    SUM(v9) OVER (PARTITION BY unit_id) AS stot9,
       |    COUNT(v9) OVER (PARTITION BY unit_id) AS tt
       |  FROM fx),
       |cand AS (SELECT unit_id, month_id, t, tt,
       |    CAST(round(abs($shift)
       |      * sqrt(CAST(t * (tt - t) AS DOUBLE) / tt) * 1e9) AS BIGINT) AS s9,
       |    CAST(round($shift * 1e9) AS BIGINT) AS d9
       |  FROM st
       |  WHERE value IS NOT NULL AND NOT isnan(value) AND t >= 1 AND t < tt),
       |best AS (SELECT unit_id, month_id, s9, d9, tt,
       |    row_number() OVER (PARTITION BY unit_id
       |      ORDER BY s9 DESC, month_id ASC) AS rn
       |  FROM cand)
       |SELECT unit_id, CAST(tt AS BIGINT) AS n, month_id AS cp_month,
       |  round(d9 / 1e9, 6) AS shift, round(s9 / 1e9, 6) AS stat
       |FROM best WHERE rn = 1""".stripMargin
  }

  /** Zipf fit (TextOps.zipfFit, top 200): the same deterministic head
    * (count desc, token asc), 1e-9-fixed logs, exact HUGEINT OLS
    * sufficient statistics, slope rounded 1e-9 before the intercept.
    */
  val qZipf: String = {
    val num = "CAST(n * sxy - sx * sy AS DOUBLE)"
    val dx = "CAST(n * sxx - sx * sx AS DOUBLE)"
    val dy = "CAST(n * syy - sy * sy AS DOUBLE)"
    s"""$norm,
       |toks AS (SELECT unnest(string_split(nt, ' ')) AS tok FROM norm),
       |top AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks
       |  GROUP BY tok ORDER BY cnt DESC, tok LIMIT 200),
       |fixed AS (SELECT
       |    CAST(round(ln(CAST(row_number() OVER (ORDER BY cnt DESC, tok)
       |      AS DOUBLE)) * 1e9) AS BIGINT) AS x,
       |    CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e9) AS BIGINT) AS y
       |  FROM top),
       |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
       |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |    SUM(CAST(y AS HUGEINT) * y) AS syy,
       |    SUM(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM fixed)
       |SELECT n AS n_terms,
       |  round(round($num / $dx, 9), 6) AS slope,
       |  round((CAST(sy AS DOUBLE) - round($num / $dx, 9)
       |    * CAST(sx AS DOUBLE)) / n / 1e9, 6) AS intercept,
       |  CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN NULL
       |       ELSE round($num / sqrt($dx * $dy), 6) END AS r
       |FROM s""".stripMargin
  }

  /** Component-size histogram (Dedup.componentStats over the
    * q_dedup_clusters labelling): wraps the recursive-CTE clusters
    * oracle as a subquery.
    */
  def qCcStats: String =
    s"""SELECT cluster_size, n_clusters, n_docs,
       |  round(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6)
       |    AS doc_share
       |FROM (
       |  SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |         CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
       |  FROM (SELECT DISTINCT cluster_id, cluster_size
       |        FROM ($qDedupClusters) b) s
       |  GROUP BY 1) g""".stripMargin
}
