package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** Nonparametric statistical tests over the events stream — the
  * robustness companions to the moment-based family ([[Forecast]] Pearson
  * autocorrelation, [[Changepoint]] z²/CUSUM/runs): Spearman rank
  * correlation (monotone-trend detection immune to outliers a Pearson
  * slope would chase) and the χ² test of independence between
  * day-of-week and event type (is the traffic MIX a function of the
  * weekday, or just the volume).
  *
  * Determinism: both tests reduce to EXACT integers before any double —
  * ranks are `row_number` over total orders (ties broken by day), cell
  * counts are counts, and the χ² accumulation reuses the
  * [[graft.llm.TextAnalysis]] drift recipe (per-term ROUND-9 →
  * DECIMAL(28,9) → DECIMAL(38,9) SUM) so the sum order cannot leak into
  * the hash.  Day-of-week is the engine-neutral epoch arithmetic of
  * [[Heatmap]], never the engines' disagreeing dow() builtins.
  */
object StatTests {

  /** Pearson chain over exact integer moments, NULLIF-guarded — the
    * [[Forecast]] formula with rank moments substituted. */
  private val RankCorrFormula: String =
    "ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) " +
      "* sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) " +
      "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0), 6)"

  /** Spearman rank correlation of the daily-revenue series against time,
    * per event type: rx = day index, ry = rank of the day's total
    * (ties broken by day — a TOTAL order, so both rank columns and all
    * five moments are engine-exact integers).  |rho| near 1 = a monotone
    * trend regardless of its shape.
    *
    * Scale: day cells first (one exchange, map-side combine), then both
    * rank windows and the moment rollup run per event_type over
    * #days-sized frames. */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    val daily = Sources.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr(s"CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT)")
        .as("t"))
    val byDay = Window.partitionBy("event_type").orderBy("day")
    val byVal = Window.partitionBy("event_type").orderBy(col("t"), col("day"))
    daily
      .withColumn("rx", row_number().over(byDay))
      .withColumn("ry", row_number().over(byVal))
      .selectExpr("event_type", "CAST(rx AS DECIMAL(18,0)) AS x",
        "CAST(ry AS DECIMAL(18,0)) AS y")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(expr("x")).as("sx"),
        sum(expr("y")).as("sy"), sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"))
      .selectExpr("event_type", "n", s"$RankCorrFormula AS spearman_rho")
  }

  val spearmanOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS t
       |  FROM events GROUP BY 1, 2),
       |rk AS (
       |  SELECT event_type,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
       |         AS DECIMAL(18,0)) AS x,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY t, day)
       |         AS DECIMAL(18,0)) AS y
       |  FROM daily),
       |m AS (
       |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
       |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
       |  FROM rk GROUP BY 1)
       |SELECT event_type, CAST(n AS BIGINT) AS n,
       |  $RankCorrFormula AS spearman_rho
       |FROM m""".stripMargin

  /** Shared-verbatim χ² cell term over exact operands: observed count o,
    * expected e = row_total·col_total/N. */
  private val Chi2Term: String =
    "(CAST(o AS DOUBLE) " +
      "- CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(nn AS DOUBLE)) " +
      "* (CAST(o AS DOUBLE) " +
      "- CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(nn AS DOUBLE)) " +
      "/ (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))"

  /** χ² independence of (day-of-week × event_type): one contingency
    * grid DENSIFIED to every (observed dow × observed type) cell — a
    * structural zero contributes its full (0−e)²/e = e term, which a
    * sparse observed-cells-only sum would silently drop (exactly the
    * strong-dependence cells the test exists to catch; pinned by the
    * perfect-separation spec case where sparse scores N/2 and dense the
    * correct N).  Marginals as window sums over the grid, decimal-exact
    * χ² accumulation, df = (R−1)(C−1).  One row out.
    *
    * Scale: a single events scan into the ≤ 7×#types aggregate;
    * densification is a 1-row dow-set broadcast + explode against the
    * ≤ #types distinct list — all downstream arithmetic is
    * cell-count-sized. */
  def chi2Independence(spark: SparkSession, dir: String): DataFrame = {
    val observed = Sources.events(spark, dir)
      .select(col("ts").cast("bigint").as("sec"), col("event_type"))
      .select(expr("(sec DIV 86400 + 3) % 7 + 1").cast("int").as("dow"),
        col("event_type"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("o"))
    val dowsRow = observed.agg(collect_set(col("dow")).as("dows"))
    val cells = observed.select(col("event_type")).distinct()
      .crossJoin(broadcast(dowsRow))
      .select(col("event_type"), explode(col("dows")).as("dow"))
      .join(observed, Seq("dow", "event_type"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    cells
      .withColumn("r", sum(col("o")).over(Window.partitionBy(col("dow"))))
      .withColumn("c",
        sum(col("o")).over(Window.partitionBy(col("event_type"))))
      .withColumn("nn", sum(col("o")).over(
        Window.partitionBy(lit(1))))
      .withColumn("term", expr(Chi2Term))
      .agg(
        countDistinct(col("dow")).as("n_dows"),
        countDistinct(col("event_type")).as("n_types"),
        max(col("nn")).as("n_events"),
        expr("CAST(SUM(CAST(ROUND(term, 9) AS DECIMAL(28,9))) " +
          "AS DECIMAL(38,9))").as("chi2"))
      .withColumn("df",
        ((col("n_dows") - 1) * (col("n_types") - 1)).cast("long"))
  }

  val chi2IndependenceOracle: String =
    s"""WITH ev AS (
       |  SELECT CAST((CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 + 3) % 7 + 1
       |              AS INT) AS dow,
       |    event_type
       |  FROM events),
       |obs AS (
       |  SELECT dow, event_type, COUNT(*) AS o FROM ev GROUP BY 1, 2),
       |cells AS (
       |  SELECT d.dow, t.event_type, COALESCE(obs.o, 0) AS o
       |  FROM (SELECT DISTINCT dow FROM obs) d
       |  CROSS JOIN (SELECT DISTINCT event_type FROM obs) t
       |  LEFT JOIN obs ON obs.dow = d.dow
       |             AND obs.event_type = t.event_type),
       |marg AS (
       |  SELECT dow, event_type, o,
       |    SUM(o) OVER (PARTITION BY dow) AS r,
       |    SUM(o) OVER (PARTITION BY event_type) AS c,
       |    SUM(o) OVER () AS nn
       |  FROM cells)
       |SELECT CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_dows,
       |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       |  CAST(MAX(nn) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(ROUND($Chi2Term, 9) AS DECIMAL(28,9)))
       |    AS DECIMAL(38,9)) AS chi2,
       |  CAST((COUNT(DISTINCT dow) - 1) * (COUNT(DISTINCT event_type) - 1)
       |    AS BIGINT) AS df
       |FROM marg""".stripMargin
}
