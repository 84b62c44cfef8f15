package graft

/** DuckDB oracle SQL for every SQL-expressible operator. Each string is
  * self-contained ANSI SQL over the driver-registered parquet tables
  * (`events`, `documents`, `embeddings`, `lineitem`, ...).
  *
  * The panel CTE mirrors graft.Panel exactly: time = day-of-month of
  * `ts`, unit = `user_id`, features value (sum) / value2 (count), dense
  * cross-product reindex with 0.0 fill. Column names and types are
  * aligned with the Spark side (BIGINT keys, DOUBLE measures, INTEGER
  * indicators) because the driver hash-compares by sorted column name.
  */
object Oracle {

  /** Shared dense-panel CTE prefix (ends inside the WITH list, so
    * queries can append further CTEs before the final SELECT).
    */
  val panel: String =
    """WITH raw AS (
      |  SELECT CAST(day(ts) AS BIGINT) AS month_id,
      |         CAST(user_id AS BIGINT) AS unit_id,
      |         SUM(value) AS value,
      |         CAST(COUNT(*) AS DOUBLE) AS value2
      |  FROM events GROUP BY 1, 2
      |), months AS (SELECT DISTINCT month_id FROM raw),
      |units AS (SELECT DISTINCT unit_id FROM raw),
      |panel AS (
      |  SELECT m.month_id, u.unit_id,
      |         COALESCE(r.value, 0.0) AS value,
      |         COALESCE(r.value2, 0.0) AS value2
      |  FROM months m CROSS JOIN units u
      |  LEFT JOIN raw r ON r.month_id = m.month_id AND r.unit_id = u.unit_id
      |)""".stripMargin

  /** Panel with deterministic missingness in `value` (graft.Panel.missingPanel). */
  val mpanel: String = panel +
    """, mpanel AS (
      |  SELECT month_id, unit_id,
      |         CASE WHEN (unit_id*31 + month_id) % 7 = 0 THEN NULL ELSE value END AS value,
      |         value2
      |  FROM panel
      |)""".stripMargin

  private val wuo = "PARTITION BY unit_id ORDER BY month_id"
  private def trail(n: Int) =
    s"$wuo ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW"
  private val cum = s"$wuo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
  private val fut = s"$wuo ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"

  // --- §2.2 pointwise -----------------------------------------------------

  val qIdentity: String =
    s"$panel SELECT month_id, unit_id, value, value2 FROM panel"

  val qGe: String =
    s"""$panel SELECT month_id, unit_id,
       | CAST(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS INTEGER) AS ge_50
       | FROM panel""".stripMargin

  val qLe: String =
    s"""$panel SELECT month_id, unit_id,
       | CAST(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END AS INTEGER) AS le_50
       | FROM panel""".stripMargin

  val qInRange: String =
    s"""$panel SELECT month_id, unit_id,
       | CAST(CASE WHEN value BETWEEN 10.0 AND 100.0 THEN 1 ELSE 0 END AS INTEGER) AS in_range
       | FROM panel""".stripMargin

  val qLn: String =
    s"$panel SELECT month_id, unit_id, LN(1.0 + value) AS ln_val FROM panel"

  val qDecay: String =
    s"$panel SELECT month_id, unit_id, POWER(2.0, (value * -1.0) / 12.0) AS decay_12 FROM panel"

  val qAdd: String =
    s"$panel SELECT month_id, unit_id, value + value2 AS added FROM panel"
  val qSub: String =
    s"$panel SELECT month_id, unit_id, value - value2 AS subtracted FROM panel"
  val qMul: String =
    s"$panel SELECT month_id, unit_id, value * value2 AS multiplied FROM panel"
  val qDiv: String =
    s"""$panel SELECT month_id, unit_id, value / value2 AS divided
       | FROM panel WHERE value2 > 0.0""".stripMargin

  // --- §2.5 temporal windows ----------------------------------------------

  val qTlag: String =
    s"$panel SELECT month_id, unit_id, LAG(value, 2) OVER ($wuo) AS tlag_2 FROM panel"

  val qTlead: String =
    s"$panel SELECT month_id, unit_id, LEAD(value, 2) OVER ($wuo) AS tlead_2 FROM panel"

  val qDelta: String =
    s"$panel SELECT month_id, unit_id, value - LAG(value, 1) OVER ($wuo) AS delta_1 FROM panel"

  val qMavg: String =
    s"$panel SELECT month_id, unit_id, AVG(value) OVER (${trail(3)}) AS mavg_3 FROM panel"

  val qMsum: String =
    s"$panel SELECT month_id, unit_id, SUM(value) OVER (${trail(5)}) AS msum_5 FROM panel"

  val qRollmax: String =
    s"$panel SELECT month_id, unit_id, MAX(value) OVER (${trail(4)}) AS rollmax_4 FROM panel"

  val qMean: String =
    s"$panel SELECT month_id, unit_id, AVG(value) OVER (PARTITION BY unit_id) AS mean_val FROM panel"

  val qDemean: String =
    s"$panel SELECT month_id, unit_id, value - AVG(value) OVER (PARTITION BY unit_id) AS demeaned FROM panel"

  private def cweqSql(src: String, valueExpr: String, v: String,
                      seed: Option[Int], out: String): String = {
    val mask = s"CASE WHEN $valueExpr = $v THEN 1 ELSE 0 END"
    val cnt = seed match {
      case Some(s) =>
        s"""CASE WHEN month_id = (SELECT MIN(month_id) FROM $src) AND $valueExpr = $v
           | THEN $s ELSE $mask END""".stripMargin
      case None => mask
    }
    s"""cw AS (
       |  SELECT month_id, unit_id, $cnt AS cnt,
       |    SUM(CASE WHEN $valueExpr = $v THEN 0 ELSE 1 END) OVER ($cum) AS block
       |  FROM $src)
       |SELECT month_id, unit_id,
       |  CAST(SUM(cnt) OVER (PARTITION BY unit_id, block ORDER BY month_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS $out
       |FROM cw""".stripMargin
  }

  val qCweq: String =
    s"$panel, ${cweqSql("panel", "value", "0.0", None, "cweq")}"

  val qCweqSeed: String =
    s"$panel, ${cweqSql("panel", "value", "0.0", Some(12), "cweq")}"

  val qTimeSince: String =
    s"""$panel, lagged AS (
       |  SELECT month_id, unit_id, LAG(value, 1) OVER ($wuo) AS lv FROM panel
       |), kept AS (SELECT * FROM lagged WHERE lv IS NOT NULL),
       |${cweqSql("kept", "lv", "0.0", None, "time_since")}""".stripMargin

  val qOnsetPossible: String =
    s"""$panel, lz AS (
       |  SELECT month_id, unit_id, value,
       |         COALESCE(LAG(value, 1) OVER ($wuo), 0.0) AS lv0
       |  FROM panel)
       |SELECT month_id, unit_id,
       |  CAST(CASE WHEN MAX(lv0) OVER (${trail(6)}) = 0.0 THEN 1 ELSE 0 END AS INTEGER) AS onset_possible
       |FROM lz""".stripMargin

  val qOnset: String =
    s"""$panel, lz AS (
       |  SELECT month_id, unit_id, value,
       |         COALESCE(LAG(value, 1) OVER ($wuo), 0.0) AS lv0
       |  FROM panel)
       |SELECT month_id, unit_id,
       |  CAST(CASE WHEN MAX(lv0) OVER (${trail(6)}) = 0.0 AND value <> 0.0
       |       THEN 1 ELSE 0 END AS INTEGER) AS onset
       |FROM lz""".stripMargin

  val qTick: String =
    s"""$panel, lagged AS (
       |  SELECT month_id, unit_id, value, LAG(value, 1) OVER ($wuo) AS lv FROM panel
       |), kept AS (SELECT * FROM lagged WHERE lv IS NOT NULL),
       |cw AS (
       |  SELECT month_id, unit_id, value,
       |    CASE WHEN lv = 0.0 THEN 1 ELSE 0 END AS cnt,
       |    SUM(CASE WHEN lv = 0.0 THEN 0 ELSE 1 END) OVER ($cum) AS block
       |  FROM kept),
       |tis AS (
       |  SELECT month_id, unit_id, value,
       |    CAST(SUM(cnt) OVER (PARTITION BY unit_id, block ORDER BY month_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS time_since
       |  FROM cw)
       |SELECT month_id, unit_id,
       |  CASE WHEN LAG(value, 1) OVER ($wuo) <> 0.0 THEN 0.0
       |       ELSE LAG(time_since, 1) OVER ($wuo) + 1.0 END AS tick
       |FROM tis""".stripMargin

  val qEntropy: String =
    s"""$panel, e AS (
       |  SELECT month_id, unit_id,
       |    SUM(value + 1.0) OVER (${trail(12)}) AS x,
       |    SUM((value + 1.0) * LOG2(value + 1.0)) OVER (${trail(12)}) AS s
       |  FROM panel)
       |SELECT month_id, unit_id,
       |  CASE WHEN x > 0.0 THEN LOG2(x) - s / x ELSE 0.0 END AS entropy
       |FROM e""".stripMargin

  // --- §2.10 missing data --------------------------------------------------

  val qReplaceNa: String =
    s"$mpanel SELECT month_id, unit_id, COALESCE(value, 0.0) AS filled FROM mpanel"

  val qFfill: String =
    s"""$mpanel SELECT month_id, unit_id,
       | COALESCE(value, LAST_VALUE(value IGNORE NULLS) OVER ($cum)) AS filled
       | FROM mpanel""".stripMargin

  val qBfill: String =
    s"""$mpanel SELECT month_id, unit_id,
       | COALESCE(value, FIRST_VALUE(value IGNORE NULLS) OVER ($fut)) AS filled
       | FROM mpanel""".stripMargin

  val qFillBoth: String =
    s"""$mpanel SELECT month_id, unit_id,
       | COALESCE(value,
       |   LAST_VALUE(value IGNORE NULLS) OVER ($cum),
       |   FIRST_VALUE(value IGNORE NULLS) OVER ($fut)) AS filled
       | FROM mpanel""".stripMargin

  val qFillInside: String =
    s"""$mpanel, b AS (
       |  SELECT month_id, unit_id, value,
       |    LAST_VALUE(value IGNORE NULLS) OVER ($cum) AS pv,
       |    FIRST_VALUE(value IGNORE NULLS) OVER ($fut) AS nv
       |  FROM mpanel)
       |SELECT month_id, unit_id,
       |  CASE WHEN value IS NULL AND pv IS NOT NULL AND nv IS NOT NULL
       |       THEN pv ELSE value END AS filled
       |FROM b""".stripMargin

  val qFillOutside: String =
    s"""$mpanel, b AS (
       |  SELECT month_id, unit_id, value,
       |    LAST_VALUE(value IGNORE NULLS) OVER ($cum) AS pv,
       |    FIRST_VALUE(value IGNORE NULLS) OVER ($fut) AS nv
       |  FROM mpanel)
       |SELECT month_id, unit_id,
       |  CASE WHEN value IS NULL AND pv IS NULL THEN nv
       |       WHEN value IS NULL AND nv IS NULL THEN pv
       |       ELSE value END AS filled
       |FROM b""".stripMargin

  val qInterpolate: String =
    s"""$mpanel, r AS (
       |  SELECT month_id, unit_id, value,
       |    ROW_NUMBER() OVER ($wuo) AS rn
       |  FROM mpanel),
       |b AS (
       |  SELECT month_id, unit_id, value, rn,
       |    LAST_VALUE(value IGNORE NULLS) OVER ($cum) AS pv,
       |    FIRST_VALUE(value IGNORE NULLS) OVER ($fut) AS nv,
       |    LAST_VALUE(CASE WHEN value IS NOT NULL THEN rn END IGNORE NULLS) OVER ($cum) AS prn,
       |    FIRST_VALUE(CASE WHEN value IS NOT NULL THEN rn END IGNORE NULLS) OVER ($fut) AS nrn
       |  FROM r)
       |SELECT month_id, unit_id,
       |  CASE WHEN value IS NULL AND pv IS NOT NULL AND nv IS NOT NULL
       |         THEN pv + (nv - pv) * (rn - prn) / (nrn - prn)
       |       WHEN value IS NULL AND nv IS NULL THEN pv
       |       WHEN value IS NULL AND pv IS NULL THEN nv
       |       ELSE value END AS interp
       |FROM b""".stripMargin

  val qGroupGlobalMeans: String =
    s"""$mpanel SELECT month_id, unit_id,
       | COALESCE(value,
       |   AVG(value) OVER (PARTITION BY unit_id),
       |   (SELECT AVG(value) FROM mpanel)) AS filled
       | FROM mpanel""".stripMargin

  val qTimeMeans: String =
    s"""$panel, tm AS (
       |  SELECT month_id, unit_id,
       |    CASE WHEN unit_id % 17 = 0 THEN NULL ELSE value END AS value
       |  FROM panel)
       |SELECT month_id, unit_id,
       |  CASE WHEN COUNT(value) OVER (PARTITION BY unit_id) = 0
       |       THEN AVG(value) OVER (PARTITION BY month_id)
       |       ELSE value END AS filled
       |FROM tm""".stripMargin

  // --- §2.8 spatial ---------------------------------------------------------

  /** Panel with grid coordinates (Grid.unitLon/unitLat embedding). */
  private val cells =
    """cells AS (
      |  SELECT month_id, unit_id,
      |         unit_id % 40 AS lon, unit_id // 40 AS lat, value
      |  FROM panel
      |)""".stripMargin

  private def splag4dSql(inner: Int, width: Int, power: Double, norm: Boolean): String = {
    val kv = spatial.Grid.kernelValuesSql(inner, width, power, norm)
    s"""$panel, $cells, kernel(dx, dy, w) AS (VALUES $kv),
       |contrib AS (
       |  SELECT c.month_id, c.unit_id, SUM(n.value * k.w) AS s
       |  FROM cells c CROSS JOIN kernel k
       |  JOIN cells n ON n.month_id = c.month_id
       |    AND n.lon = c.lon + k.dx AND n.lat = c.lat + k.dy
       |  GROUP BY 1, 2)
       |SELECT p.month_id, p.unit_id, COALESCE(ct.s, 0.0) AS splag
       |FROM panel p LEFT JOIN contrib ct
       |  ON ct.month_id = p.month_id AND ct.unit_id = p.unit_id""".stripMargin
  }

  val qSplag4d: String = splag4dSql(1, 1, 1.0, norm = false)
  val qSplag4dNorm: String = splag4dSql(1, 2, 2.0, norm = true)

  /** Queen adjacency over the unit grid (month-invariant derivation; the
    * Spark side replicates it per month, which is equivalent).
    */
  private val adj =
    """u AS (SELECT unit_id, unit_id % 40 AS lon, unit_id // 40 AS lat FROM units),
      |adj AS (
      |  SELECT a.unit_id AS a_id, b.unit_id AS b_id
      |  FROM u a, u b
      |  WHERE abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
      |    AND a.unit_id <> b.unit_id
      |)""".stripMargin

  val qSplagCountry: String =
    s"""$panel, $adj,
       |lagv AS (
       |  SELECT p.month_id, a.a_id AS unit_id, SUM(p.value) AS s
       |  FROM adj a JOIN panel p ON p.unit_id = a.b_id
       |  GROUP BY 1, 2)
       |SELECT p.month_id, p.unit_id, COALESCE(l.s, 0.0) AS splag
       |FROM panel p LEFT JOIN lagv l
       |  ON l.month_id = p.month_id AND l.unit_id = p.unit_id""".stripMargin

  val qSplagCountryRing2: String =
    s"""$panel, $adj,
       |o1 AS (SELECT unit_id AS seed, unit_id AS member FROM units
       |       UNION SELECT a_id, b_id FROM adj),
       |o2 AS (SELECT seed, member FROM o1
       |       UNION SELECT o1.seed, adj.b_id FROM o1 JOIN adj ON adj.a_id = o1.member),
       |ring AS (SELECT seed, member FROM o2 EXCEPT SELECT seed, member FROM o1),
       |lagv AS (
       |  SELECT p.month_id, r.seed AS unit_id, SUM(p.value) AS s
       |  FROM ring r JOIN panel p ON p.unit_id = r.member
       |  GROUP BY 1, 2)
       |SELECT p.month_id, p.unit_id, COALESCE(l.s, 0.0) AS splag
       |FROM panel p LEFT JOIN lagv l
       |  ON l.month_id = p.month_id AND l.unit_id = p.unit_id""".stripMargin

  val qSplagCountryNorm: String =
    s"""$panel, $adj,
       |adjd AS (
       |  SELECT a_id, b_id,
       |    sqrt(pow(0.5*((a_id % 40) - (b_id % 40)), 2)
       |       + pow(0.5*((a_id // 40) - (b_id // 40)), 2)) AS d
       |  FROM adj),
       |nw AS (SELECT a_id, b_id, d / SUM(d) OVER (PARTITION BY a_id) AS w FROM adjd),
       |lagv AS (
       |  SELECT p.month_id, n.a_id AS unit_id, SUM(p.value * n.w) AS s
       |  FROM nw n JOIN panel p ON p.unit_id = n.b_id
       |  GROUP BY 1, 2)
       |SELECT p.month_id, p.unit_id, COALESCE(l.s, 0.0) AS splag
       |FROM panel p LEFT JOIN lagv l
       |  ON l.month_id = p.month_id AND l.unit_id = p.unit_id""".stripMargin

  private val stEvents =
    """ev AS (
      |  SELECT month_id AS e_t, lon AS e_lon, lat AS e_lat,
      |         unit_id AS e_u, value AS e_size
      |  FROM cells WHERE value > 400.0
      |)""".stripMargin

  private def stPairs(nu: Double): String =
    s"""pairs AS (
       |  SELECT c.month_id, c.unit_id, e.e_t, e.e_u, e.e_size,
       |    sqrt(pow(0.5*(c.lon - e.e_lon), 2) + pow(0.5*(c.lat - e.e_lat), 2)
       |       + pow(${Grid.fmt(nu)}*(c.month_id - e.e_t), 2)) AS d
       |  FROM cells c JOIN ev e ON e.e_t <= c.month_id
       |)""".stripMargin
  private def Grid = spatial.Grid

  val qSpacetimeDistK1: String =
    s"""$panel, $cells, $stEvents, ${stPairs(1.0)},
       |mind AS (SELECT month_id, unit_id, MIN(d) AS d FROM pairs GROUP BY 1, 2)
       |SELECT c.month_id, c.unit_id, COALESCE(m.d, 999.0) AS stdist
       |FROM cells c LEFT JOIN mind m
       |  ON m.month_id = c.month_id AND m.unit_id = c.unit_id""".stripMargin

  val qSpacetimeDistK5: String =
    s"""$panel, $cells, $stEvents, ${stPairs(2.0)},
       |topk AS (
       |  SELECT month_id, unit_id, d,
       |    ROW_NUMBER() OVER (PARTITION BY month_id, unit_id
       |      ORDER BY d, e_t, e_u) AS rn
       |  FROM pairs),
       |agg AS (SELECT month_id, unit_id, AVG(d) AS d FROM topk WHERE rn <= 5 GROUP BY 1, 2)
       |SELECT c.month_id, c.unit_id, COALESCE(a.d, 999.0) AS stdist
       |FROM cells c LEFT JOIN agg a
       |  ON a.month_id = c.month_id AND a.unit_id = c.unit_id""".stripMargin

  val qSpacetimeWeightsK1: String =
    s"""$panel, $cells, $stEvents, ${stPairs(1.0)},
       |topk AS (
       |  SELECT month_id, unit_id, d, e_size,
       |    ROW_NUMBER() OVER (PARTITION BY month_id, unit_id
       |      ORDER BY d, e_t, e_u) AS rn
       |  FROM pairs)
       |SELECT c.month_id, c.unit_id,
       |  COALESCE(CASE WHEN t.d = 0.0 THEN t.e_size
       |                ELSE t.e_size / pow(t.d, 2.0) END, 999.0) AS stdist
       |FROM cells c LEFT JOIN (SELECT * FROM topk WHERE rn = 1) t
       |  ON t.month_id = c.month_id AND t.unit_id = c.unit_id""".stripMargin

  val qListTotallyMissing: String =
    s"""$mpanel, allnull AS (
       |  SELECT month_id, unit_id, value, CAST(NULL AS DOUBLE) AS value3 FROM mpanel)
       |SELECT 'value' AS col_name, COUNT(value) = 0 AS totally_missing FROM allnull
       |UNION ALL
       |SELECT 'value3' AS col_name, COUNT(value3) = 0 AS totally_missing FROM allnull""".stripMargin
}
