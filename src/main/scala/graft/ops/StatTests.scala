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

  /** Daily revenue cells with the engine-neutral weekday flag — the
    * shared frame of the two-sample tests below: sample A = weekday
    * days, sample B = weekend days, observations = exact daily cents.
    * Day/dow from pure epoch arithmetic (the [[Heatmap]] convention). */
  private def weekendCells(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .select(col("ts").cast("bigint").as("sec"), col("event_type"),
        col("value"))
      .select(col("event_type"), expr("sec DIV 86400").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(expr(s"CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT)")
        .as("t"))
      .withColumn("wknd", expr("(day + 3) % 7 + 1 >= 6"))

  private val WeekendCellsCte: String =
    s"""daily AS (
       |  SELECT event_type,
       |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS t
       |  FROM events GROUP BY 1, 2),
       |cells AS (
       |  SELECT event_type, t, ((day + 3) % 7 + 1 >= 6) AS wknd
       |  FROM daily)""".stripMargin

  /** Two-sample Kolmogorov–Smirnov distance between weekday and weekend
    * daily-revenue distributions, per event type — "does the weekend
    * change the SHAPE of daily load, not just its mean".  D is kept as
    * an EXACT integer numerator (max |cumA·nB − cumB·nA| over the
    * pooled value order) with one final division — no empirical-CDF
    * doubles anywhere.
    *
    * Scale: the corpus collapses to ≤ #days cells per type in one
    * exchange; the ranking window runs on calendar-sized frames. */
  def ksWeekend(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Window.partitionBy("event_type")
      .orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekendCells(spark, dir)
      .groupBy(col("event_type"), col("t"))
      .agg(count(when(!col("wknd"), 1)).as("ca"),
        count(when(col("wknd"), 1)).as("cb"))
      .withColumn("cum_a", sum(col("ca")).over(byVal))
      .withColumn("cum_b", sum(col("cb")).over(byVal))
      .withColumn("na",
        sum(col("ca")).over(Window.partitionBy(col("event_type"))))
      .withColumn("nb",
        sum(col("cb")).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_weekday"), max(col("nb")).as("n_weekend"),
        max(abs(col("cum_a") * col("nb") - col("cum_b") * col("na")))
          .as("d_num"))
      .withColumn("ks_d", expr("ROUND(d_num / CAST(NULLIF(" +
        "n_weekday * n_weekend, 0) AS DOUBLE), 6)"))
  }

  val ksWeekendOracle: String =
    s"""WITH $WeekendCellsCte,
       |g AS (
       |  SELECT event_type, t,
       |    COUNT(CASE WHEN NOT wknd THEN 1 END) AS ca,
       |    COUNT(CASE WHEN wknd THEN 1 END) AS cb
       |  FROM cells GROUP BY 1, 2),
       |c AS (
       |  SELECT event_type, ca, cb,
       |    SUM(ca) OVER (PARTITION BY event_type ORDER BY t
       |                  ROWS UNBOUNDED PRECEDING) AS cum_a,
       |    SUM(cb) OVER (PARTITION BY event_type ORDER BY t
       |                  ROWS UNBOUNDED PRECEDING) AS cum_b,
       |    SUM(ca) OVER (PARTITION BY event_type) AS na,
       |    SUM(cb) OVER (PARTITION BY event_type) AS nb
       |  FROM g)
       |SELECT event_type, CAST(MAX(na) AS BIGINT) AS n_weekday,
       |  CAST(MAX(nb) AS BIGINT) AS n_weekend,
       |  CAST(MAX(abs(cum_a * nb - cum_b * na)) AS BIGINT) AS d_num,
       |  ROUND(MAX(abs(cum_a * nb - cum_b * na))
       |    / CAST(NULLIF(MAX(na) * MAX(nb), 0) AS DOUBLE), 6) AS ks_d
       |FROM c GROUP BY 1""".stripMargin

  /** Shared verbatim: dispersion chain from exact integer moments
    * (n, S = Σc, Q = Σc²).  Variance uses the unbiased (n−1) form. */
  private val DispersionExprs = Seq(
    "ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_events",
    "ROUND((CAST(n AS DOUBLE) * CAST(q AS DOUBLE) " +
      "- CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) " +
      "/ NULLIF(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0), 0.0), 6)" +
      " AS var_events",
    "ROUND(((CAST(n AS DOUBLE) * CAST(q AS DOUBLE) " +
      "- CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) " +
      "/ NULLIF(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0), 0.0)) " +
      "/ NULLIF(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 0.0), 6) AS fano",
    "ROUND(sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE) " +
      "- CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) " +
      "/ NULLIF(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0), 0.0)) " +
      "/ NULLIF(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 0.0), 6) AS cv")

  /** Daily-count dispersion per event type — Fano factor (variance/mean:
    * 1 = Poisson, >1 overdispersed/bursty) and the coefficient of
    * variation, the traffic-shape profile capacity planning reads before
    * trusting any mean-based sizing.  All moments exact integers; the
    * chains are single shared-verbatim IEEE expressions with NULLIF'd
    * degenerate denominators.
    *
    * Scale: day-cell aggregate (one exchange) → ≤ #types rows. */
  def dispersion(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        expr("CAST(SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0)))" +
          " AS DECIMAL(38,0))").as("q"))
      .selectExpr(Seq("event_type", "n") ++ DispersionExprs: _*)

  val dispersionOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       |    COUNT(*) AS c
       |  FROM events GROUP BY 1, 2),
       |m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(c) AS BIGINT) AS s,
       |    CAST(SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0)))
       |      AS DECIMAL(38,0)) AS q
       |  FROM daily GROUP BY 1)
       |SELECT event_type, n, ${DispersionExprs.mkString(",\n  ")}
       |FROM m""".stripMargin

  /** Shared-verbatim Mann–Whitney z over exact operands: u2 = 2·U_A,
    * tie = Σ(t³−t), all integers until the final chain. */
  private val MwZFormula: String =
    "ROUND((CAST(u2 AS DOUBLE) " +
      "- CAST(n_weekday AS DOUBLE) * CAST(n_weekend AS DOUBLE)) / " +
      "NULLIF(2.0 * sqrt(" +
      "CAST(n_weekday AS DOUBLE) * CAST(n_weekend AS DOUBLE) / 12.0 " +
      "* (CAST(nn AS DOUBLE) + 1.0 - CAST(tie AS DOUBLE) " +
      "/ NULLIF(CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0), 0.0))" +
      "), 0.0), 6)"

  /** Mann–Whitney U (weekday vs weekend daily revenue, per event type) —
    * the rank-sum location test that needs no normality assumption,
    * completing the family: [[spearman]] for trend, [[ksWeekend]] for
    * shape, this for location shift.  Tie-averaged ranks are kept as
    * EXACT integers by working in 2× units (2·avgrank = 2·cum_before +
    * cnt + 1), so U itself is exact (emitted as u2 = 2U plus the .5-exact
    * double), and the normal approximation applies the full tie
    * correction Σ(t³−t).  Same calendar-bounded shape as [[ksWeekend]]. */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Window.partitionBy("event_type")
      .orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekendCells(spark, dir)
      .groupBy(col("event_type"), col("t"))
      .agg(count(when(!col("wknd"), 1)).as("ca"),
        count(when(col("wknd"), 1)).as("cb"))
      .withColumn("cnt", col("ca") + col("cb"))
      .withColumn("r2",
        lit(2) * (sum(col("cnt")).over(byVal) - col("cnt")) + col("cnt") + 1)
      .groupBy(col("event_type"))
      .agg(sum(col("ca")).as("n_weekday"), sum(col("cb")).as("n_weekend"),
        sum(col("ca") * col("r2")).as("r2a"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie"))
      .withColumn("nn", col("n_weekday") + col("n_weekend"))
      .withColumn("u2",
        col("r2a") - col("n_weekday") * (col("n_weekday") + 1))
      // CAST before the divide: a bare `u2 / 2.0` parses as DECIMAL
      // division in Spark (literal 2.0 is DECIMAL(2,1)).
      .withColumn("u", expr("CAST(u2 AS DOUBLE) / 2.0"))
      .withColumn("z", expr(MwZFormula))
      .select("event_type", "n_weekday", "n_weekend", "u2", "u", "z")
  }

  val mannWhitneyOracle: String =
    s"""WITH $WeekendCellsCte,
       |g AS (
       |  SELECT event_type, t,
       |    COUNT(CASE WHEN NOT wknd THEN 1 END) AS ca,
       |    COUNT(CASE WHEN wknd THEN 1 END) AS cb
       |  FROM cells GROUP BY 1, 2),
       |r AS (
       |  SELECT event_type, ca, cb, ca + cb AS cnt,
       |    2 * (SUM(ca + cb) OVER (PARTITION BY event_type ORDER BY t
       |                            ROWS UNBOUNDED PRECEDING) - (ca + cb))
       |      + (ca + cb) + 1 AS r2
       |  FROM g),
       |m AS (
       |  SELECT event_type,
       |    CAST(SUM(ca) AS BIGINT) AS n_weekday,
       |    CAST(SUM(cb) AS BIGINT) AS n_weekend,
       |    CAST(SUM(ca * r2) AS BIGINT) AS r2a,
       |    CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie
       |  FROM r GROUP BY 1),
       |f AS (
       |  SELECT event_type, n_weekday, n_weekend,
       |    n_weekday + n_weekend AS nn,
       |    r2a - n_weekday * (n_weekday + 1) AS u2, tie
       |  FROM m)
       |SELECT event_type, n_weekday, n_weekend, CAST(u2 AS BIGINT) AS u2,
       |  CAST(u2 AS DOUBLE) / 2.0 AS u, $MwZFormula AS z
       |FROM f""".stripMargin

  /** One-way ANOVA of daily revenue BY day-of-week, per event type —
    * "how much of the day-to-day variance does the weekday explain":
    * η² = SS_between/SS_total plus the F statistic, the variance-side
    * companion to [[chi2Independence]] (which only sees the traffic MIX)
    * and [[ksWeekend]]'s binary split.
    *
    * Determinism: group sums are exact BIGINTs; each group's S_g²/n_g
    * term goes through the drift recipe (one shared IEEE chain → ROUND-9
    * → DECIMAL(28,9)) before the DECIMAL sum, so the ≤7-term summation
    * order cannot leak into the hash; SS_total subtracts the same
    * correction term from the exact Σt².
    *
    * Scale: day cells in one exchange, then ≤ 7 rows per type. */
  def anovaDow(spark: SparkSession, dir: String): DataFrame = {
    val cells = Sources.events(spark, dir)
      .select(col("ts").cast("bigint").as("sec"), col("event_type"),
        col("value"))
      .select(col("event_type"), expr("sec DIV 86400").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(expr(s"CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT)")
        .as("t"))
      .withColumn("dow", expr("CAST((day + 3) % 7 + 1 AS INT)"))
    cells
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("ng"), sum(col("t")).as("sg"),
        expr("CAST(SUM(CAST(t AS DECIMAL(18,0)) * CAST(t AS DECIMAL(18,0)))" +
          " AS DECIMAL(38,0))").as("qg"))
      .withColumn("term", expr(
        "CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) " +
          "/ CAST(ng AS DOUBLE), 9) AS DECIMAL(28,9))"))
      .groupBy(col("event_type"))
      .agg(sum(col("ng")).as("n_days"), count(lit(1)).as("k_dows"),
        sum(col("sg")).as("s"),
        expr("CAST(SUM(qg) AS DECIMAL(38,0))").as("q"),
        expr("CAST(SUM(term) AS DECIMAL(38,9))").as("sum_terms"))
      .withColumn("corr", expr(
        "CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) " +
          "/ CAST(n_days AS DOUBLE), 9) AS DECIMAL(28,9))"))
      .withColumn("ss_between",
        expr("CAST(sum_terms - corr AS DECIMAL(38,9))"))
      .withColumn("ss_total",
        expr("CAST(CAST(q AS DECIMAL(38,9)) - corr AS DECIMAL(38,9))"))
      .withColumn("eta2", expr(
        "ROUND(CAST(ss_between AS DOUBLE) " +
          "/ NULLIF(CAST(ss_total AS DOUBLE), 0.0), 6)"))
      .withColumn("f_stat", expr(
        "ROUND((CAST(ss_between AS DOUBLE) / NULLIF(CAST(k_dows AS DOUBLE)" +
          " - 1.0, 0.0)) / NULLIF((CAST(ss_total AS DOUBLE) " +
          "- CAST(ss_between AS DOUBLE)) / NULLIF(CAST(n_days AS DOUBLE) " +
          "- CAST(k_dows AS DOUBLE), 0.0), 0.0), 6)"))
      .select("event_type", "n_days", "k_dows", "eta2", "f_stat")
  }

  val anovaDowOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS t
       |  FROM events GROUP BY 1, 2),
       |cells AS (
       |  SELECT event_type, t, CAST((day + 3) % 7 + 1 AS INT) AS dow
       |  FROM daily),
       |g AS (
       |  SELECT event_type, dow, COUNT(*) AS ng,
       |    CAST(SUM(t) AS BIGINT) AS sg,
       |    CAST(SUM(CAST(t AS DECIMAL(18,0)) * CAST(t AS DECIMAL(18,0)))
       |      AS DECIMAL(38,0)) AS qg
       |  FROM cells GROUP BY 1, 2),
       |gt AS (
       |  SELECT event_type, ng, sg, qg,
       |    CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
       |      / CAST(ng AS DOUBLE), 9) AS DECIMAL(28,9)) AS term
       |  FROM g),
       |m AS (
       |  SELECT event_type, CAST(SUM(ng) AS BIGINT) AS n_days,
       |    CAST(COUNT(*) AS BIGINT) AS k_dows,
       |    CAST(SUM(sg) AS BIGINT) AS s,
       |    CAST(SUM(qg) AS DECIMAL(38,0)) AS q,
       |    CAST(SUM(term) AS DECIMAL(38,9)) AS sum_terms
       |  FROM gt GROUP BY 1),
       |f AS (
       |  SELECT event_type, n_days, k_dows,
       |    CAST(sum_terms - CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
       |        / CAST(n_days AS DOUBLE), 9) AS DECIMAL(28,9))
       |      AS DECIMAL(38,9)) AS ss_between,
       |    CAST(CAST(q AS DECIMAL(38,9))
       |      - CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
       |          / CAST(n_days AS DOUBLE), 9) AS DECIMAL(28,9))
       |      AS DECIMAL(38,9)) AS ss_total
       |  FROM m)
       |SELECT event_type, n_days, k_dows,
       |  ROUND(CAST(ss_between AS DOUBLE)
       |    / NULLIF(CAST(ss_total AS DOUBLE), 0.0), 6) AS eta2,
       |  ROUND((CAST(ss_between AS DOUBLE)
       |      / NULLIF(CAST(k_dows AS DOUBLE) - 1.0, 0.0))
       |    / NULLIF((CAST(ss_total AS DOUBLE) - CAST(ss_between AS DOUBLE))
       |      / NULLIF(CAST(n_days AS DOUBLE) - CAST(k_dows AS DOUBLE), 0.0),
       |      0.0), 6) AS f_stat
       |FROM f""".stripMargin

  /** Shared-verbatim Kendall τ-b chain over exact pair counts.  With x =
    * calendar day there are no x-ties (n1 = 0), so the denominator is
    * √n0·√(n0 − tie_y). */
  private val KendallFormula: String =
    "ROUND((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE)) / " +
      "NULLIF(sqrt(CAST(n0 AS DOUBLE)) " +
      "* sqrt(CAST(n0 AS DOUBLE) - CAST(tie_y AS DOUBLE)), 0.0), 6)"

  /** Kendall τ-b of the daily-revenue series against time, per event
    * type — the pair-concordance companion to [[spearman]]: ρ asks "are
    * the RANKS linear", τ asks "what FRACTION of day pairs move the same
    * way", which is the quantity a human reads as "X% of the time a later
    * day is bigger".  x = the epoch day (all distinct, so no x-ties and
    * n1 = 0); ties in y are counted exactly pairwise (tie_y = n2 =
    * Σ t(t−1)/2 without ever forming the tie groups), and every operand
    * of the τ-b chain is an exact integer until one shared ROUND-6
    * division.
    *
    * Scale: the corpus collapses to calendar-bounded day cells in ONE
    * exchange; the pair join is keyed on event_type with day< as the
    * range residual — #days²/2 pairs per type (a few thousand at any
    * corpus size, since the calendar, not the data, bounds it).  The
    * cells frame is localCheckpointed so both join sides read the
    * materialized aggregate instead of re-scanning events. */
  def kendall(spark: SparkSession, dir: String): DataFrame = {
    val cells = Sources.events(spark, dir)
      .select(col("ts").cast("bigint").as("sec"), col("event_type"),
        col("value"))
      .select(col("event_type"), expr("sec DIV 86400").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(expr(s"CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT)")
        .as("t"))
      .localCheckpoint()
    val a = cells.select(col("event_type"), col("day").as("da"),
      col("t").as("ta"))
    val b = cells.select(col("event_type"), col("day").as("db"),
      col("t").as("tb"))
    a.join(b, Seq("event_type")).filter(col("da") < col("db"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n0"),
        sum(when(col("tb") > col("ta"), 1L).otherwise(0L)).as("conc"),
        sum(when(col("tb") < col("ta"), 1L).otherwise(0L)).as("disc"),
        sum(when(col("tb") === col("ta"), 1L).otherwise(0L)).as("tie_y"))
      .withColumn("tau_b", expr(KendallFormula))
  }

  val kendallOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS t
       |  FROM events GROUP BY 1, 2),
       |p AS (
       |  SELECT a.event_type, a.t AS ta, b.t AS tb
       |  FROM daily a JOIN daily b
       |    ON a.event_type = b.event_type AND a.day < b.day),
       |m AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n0,
       |    CAST(SUM(CASE WHEN tb > ta THEN 1 ELSE 0 END) AS BIGINT) AS conc,
       |    CAST(SUM(CASE WHEN tb < ta THEN 1 ELSE 0 END) AS BIGINT) AS disc,
       |    CAST(SUM(CASE WHEN tb = ta THEN 1 ELSE 0 END) AS BIGINT) AS tie_y
       |  FROM p GROUP BY 1)
       |SELECT event_type, n0, conc, disc, tie_y, $KendallFormula AS tau_b
       |FROM m""".stripMargin

  /** Shared-verbatim χ² cell term over exact operands: observed count o,
    * expected e = row_total·col_total/N.  Shared with
    * [[graft.llm.Sampling]]'s split-balance audit. */
  private[graft] val Chi2Term: String =
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

  /** Cramér's V over the [[chi2Independence]] grid — the EFFECT SIZE the
    * raw χ² statistic lacks (χ² grows with N; V = √(χ²/(N·min(R,C)−1))
    * is the [0,1] association strength a human can compare across
    * tables).  One extra projection on the already-audited chi2 plan:
    * the decimal-exact χ² casts to double, one division, one IEEE-exact
    * sqrt, one ROUND — deterministic cross-engine because every operand
    * is already hash-identical. */
  def cramersV(spark: SparkSession, dir: String): DataFrame =
    chi2Independence(spark, dir).withColumn("cramers_v", expr(CramersVTerm))

  private val CramersVTerm: String =
    // NULLIF: a 1×C or R×1 grid (single weekday or single type — the
    // degenerate single-row sweep) has min dim 1 and V undefined; ANSI
    // mode errors on the bare division.
    "ROUND(sqrt(CAST(chi2 AS DOUBLE) / NULLIF(CAST(n_events AS DOUBLE) " +
      "* (CAST(least(n_dows, n_types) AS DOUBLE) - 1.0), 0.0)), 6)"

  val cramersVOracle: String =
    s"""SELECT n_dows, n_types, n_events, chi2, df,
       |  $CramersVTerm AS cramers_v
       |FROM ($chi2IndependenceOracle) base""".stripMargin

  /** Daily revenue cells with the engine-neutral day-of-week (1..7) —
    * the pooled frame of the rank tests below. */
  private def dowCells(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .select(col("ts").cast("bigint").as("sec"), col("event_type"),
        col("value"))
      .select(col("event_type"), expr("sec DIV 86400").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(expr(s"CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT)")
        .as("t"))
      .withColumn("dow", expr("CAST((day + 3) % 7 + 1 AS INT)"))

  private val DowCellsCte: String =
    s"""daily AS (
       |  SELECT event_type,
       |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS t
       |  FROM events GROUP BY 1, 2),
       |cells AS (
       |  SELECT event_type, day, t,
       |    CAST((day + 3) % 7 + 1 AS INT) AS dow
       |  FROM daily)""".stripMargin

  /** Kruskal–Wallis H across the 7 day-of-week groups of daily revenue,
    * per event type — the RANK-based one-way test completing the
    * [[anovaDow]] pair: ANOVA asks "do the group MEANS differ" under a
    * normal-ish assumption, H asks "does any weekday's distribution
    * stochastically dominate" with no distribution assumption at all.
    *
    * Exactness: pooled ranks are tie-averaged via 2·r̄ = 2·rank + cnt − 1
    * (an INTEGER — rank() min-rank plus the tie-group size), so every
    * per-group rank sum is exact; the per-group s²/nᵢ terms go through
    * the engine's ROUND-6 → DECIMAL sum (order-independent), and the
    * final H — tie-corrected by 1 − Σ(t³−t)/(N³−N) — is one shared
    * verbatim double chain.
    *
    * Scale: the corpus collapses to calendar-bounded day cells in one
    * exchange; every window below runs per event_type over ≤ #days
    * frames (the documented-safe unpartitioned-window regime). */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val cells = dowCells(spark, dir).localCheckpoint()
    val ranked = cells
      .withColumn("mrank",
        rank().over(Window.partitionBy("event_type").orderBy("t")))
      .withColumn("cnt", count(lit(1))
        .over(Window.partitionBy("event_type", "t")))
      .withColumn("avg2", expr("2 * CAST(mrank AS BIGINT) + cnt - 1"))
    val groups = ranked.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_i"), sum(col("avg2")).as("s2"))
      .withColumn("term", expr(
        "CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n_i AS DOUBLE)"))
    val ties = cells.groupBy(col("event_type"), col("t"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(sum(expr("c * c * c - c")).as("tt"))
    groups.groupBy(col("event_type"))
      .agg(sum(col("n_i")).as("nn"),
        count(lit(1)).as("k_dows"),
        expr("CAST(SUM(CAST(ROUND(term, 6) AS DECIMAL(28,6))) " +
          "AS DECIMAL(38,6))").as("s4"))
      .join(ties, Seq("event_type"))
      .selectExpr("event_type", "nn", "k_dows", "tt",
        s"$KruskalFormula AS h")
  }

  /** H from the 2·rank moments: Σ R̄ᵢ²/nᵢ = s4/4 (s4 sums (2R̄ᵢ)²/nᵢ),
    * so H = 3·s4/(N(N+1)) − 3(N+1), then the tie correction. */
  private val KruskalFormula: String =
    // Both divisions NULLIF-guarded: a single pooled observation makes
    // N³−N zero, which under ANSI mode is an ERROR inside the outer
    // NULLIF, not a NULL (caught by the degenerate single-row sweep).
    "ROUND((3.0 * CAST(s4 AS DOUBLE) " +
      "/ (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)) " +
      "- 3.0 * (CAST(nn AS DOUBLE) + 1.0)) " +
      "/ NULLIF(1.0 - CAST(tt AS DOUBLE) " +
      "/ NULLIF(CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) " +
      "* CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE), 0.0), 0.0), 6)"

  val kruskalWallisOracle: String =
    s"""WITH $DowCellsCte,
       |rk AS (
       |  SELECT event_type, dow,
       |    2 * CAST(RANK() OVER (PARTITION BY event_type ORDER BY t)
       |             AS BIGINT)
       |      + COUNT(*) OVER (PARTITION BY event_type, t) - 1 AS avg2
       |  FROM cells),
       |grp AS (
       |  SELECT event_type, dow, COUNT(*) AS n_i,
       |    CAST(SUM(avg2) AS BIGINT) AS s2
       |  FROM rk GROUP BY 1, 2),
       |ties AS (
       |  SELECT event_type, CAST(SUM(c * c * c - c) AS BIGINT) AS tt
       |  FROM (SELECT event_type, t, COUNT(*) AS c FROM cells GROUP BY 1, 2)
       |  GROUP BY 1),
       |agg AS (
       |  SELECT g.event_type, CAST(SUM(n_i) AS BIGINT) AS nn,
       |    CAST(COUNT(*) AS BIGINT) AS k_dows,
       |    CAST(SUM(CAST(ROUND(
       |        CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
       |          / CAST(n_i AS DOUBLE), 6)
       |      AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS s4
       |  FROM grp g GROUP BY 1)
       |SELECT a.event_type, nn, k_dows, tt, $KruskalFormula AS h
       |FROM agg a JOIN ties USING (event_type)""".stripMargin

  /** Pettitt change-point test over the daily-revenue series, per event
    * type — the RANK-based single-change-point detector completing the
    * regime-shift family: [[Changepoint]]'s CUSUM chases mean shifts in
    * z-units (variance-sensitive), Pettitt asks "is there a day after
    * which values are stochastically larger/smaller" with no
    * distribution assumption, via the Mann–Whitney statistic at every
    * cut: Uₜ = Σᵢ≤ₜ Σⱼ>ₜ sgn(xᵢ−xⱼ), K = max|Uₜ|, and the argmax day is
    * the estimated change point.
    *
    * Exactness: the O(n²) double sum collapses to the classic O(n)
    * recurrence Uₜ = Uₜ₋₁ + Vₜ with Vₜ = Σⱼ sgn(xₜ−xⱼ) = 2·less + eq − N
    * — all from the same min-rank + tie-count windows as
    * [[kruskalWallis]], so K and the change day are exact BIGINTs; the
    * significance p ≈ 2·exp(−6K²/(n³+n²)) needs libm exp (not
    * cross-engine-exact), so the registered output reports K and its
    * share of the n(n+1)/2 maximum instead — one rounded division.
    *
    * Scale: calendar-bounded day cells; per-type windows over ≤ #days
    * frames.  Argmax tie-break: earliest day. */
  def pettitt(spark: SparkSession, dir: String): DataFrame = {
    val cells = dowCells(spark, dir)
      .select(col("event_type"), col("day"), col("t"))
    val byType = Window.partitionBy("event_type")
    val v = cells
      .withColumn("nn", count(lit(1)).over(byType))
      .withColumn("mrank", rank().over(byType.orderBy("t")))
      .withColumn("cnt", count(lit(1))
        .over(Window.partitionBy("event_type", "t")))
      // V_t = less - greater = 2*(mrank-1) + cnt - nn  (self's sgn(0)=0
      // rides in cnt, contributing zero either way).
      .withColumn("v", expr(
        "2 * (CAST(mrank AS BIGINT) - 1) + cnt - nn"))
      .withColumn("u", sum(col("v")).over(
        byType.orderBy("day").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    v.withColumn("pick", row_number().over(
        byType.orderBy(abs(col("u")).desc, col("day").asc)))
      .filter(col("pick") === 1)
      .selectExpr("event_type", "nn AS n_days",
        "abs(u) AS k_stat", "day AS change_day",
        "ROUND(CAST(abs(u) AS DOUBLE) / NULLIF(CAST(nn AS DOUBLE) " +
          "* (CAST(nn AS DOUBLE) + 1.0) / 2.0, 0.0), 6) AS k_share")
  }

  val pettittOracle: String =
    s"""WITH $DowCellsCte,
       |v AS (
       |  SELECT event_type, day,
       |    COUNT(*) OVER (PARTITION BY event_type) AS nn,
       |    2 * (CAST(RANK() OVER (PARTITION BY event_type ORDER BY t)
       |             AS BIGINT) - 1)
       |      + COUNT(*) OVER (PARTITION BY event_type, t)
       |      - COUNT(*) OVER (PARTITION BY event_type) AS v
       |  FROM cells),
       |u AS (
       |  SELECT event_type, day, nn,
       |    CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY day
       |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u
       |  FROM v),
       |pick AS (
       |  SELECT event_type, day, nn, u,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |                       ORDER BY abs(u) DESC, day ASC) AS pick
       |  FROM u)
       |SELECT event_type, CAST(nn AS BIGINT) AS n_days,
       |  CAST(abs(u) AS BIGINT) AS k_stat,
       |  CAST(day AS BIGINT) AS change_day,
       |  ROUND(CAST(abs(u) AS DOUBLE) / NULLIF(CAST(nn AS DOUBLE)
       |    * (CAST(nn AS DOUBLE) + 1.0) / 2.0, 0.0), 6) AS k_share
       |FROM pick WHERE pick = 1""".stripMargin

  /** Friedman test of day-of-week effects with WEEKS AS BLOCKS, per
    * event type — the repeated-measures member of the rank family:
    * [[kruskalWallis]] pools every day into one sample, so a strong
    * week-to-week LEVEL trend can drown a within-week pattern; Friedman
    * ranks each week internally (block = the (day+3) DIV 7 Monday week,
    * the grain that makes dow a complete 7-treatment layout) and asks
    * whether the dow rank PROFILE repeats across weeks.  Incomplete edge
    * weeks are dropped (the test is defined on complete blocks).
    *
    * Exactness: within-block tie-averaged ranks via the 2·r̄ integer
    * trick; treatment rank sums and their squares stay BIGINT (no
    * per-group division at all — equal block sizes fold n into the
    * closed form), so χ²_F = 3·s4/(n·k(k+1)) − 3n(k+1) is ONE shared
    * double chain over exact integers.  Classic statistic over
    * tie-averaged ranks (no tie-correction divisor), stated as such.
    *
    * Scale: calendar-bounded cells; every window runs per (type, week)
    * over ≤ 7-row frames. */
  def friedman(spark: SparkSession, dir: String): DataFrame = {
    val complete = dowCells(spark, dir)
      .withColumn("week", expr("(day + 3) DIV 7"))
      .withColumn("days_in_week",
        count(lit(1)).over(Window.partitionBy("event_type", "week")))
      .filter(col("days_in_week") === 7)
      .localCheckpoint()
    val ranked = complete
      .withColumn("mrank", rank()
        .over(Window.partitionBy("event_type", "week").orderBy("t")))
      .withColumn("cnt", count(lit(1))
        .over(Window.partitionBy("event_type", "week", "t")))
      .withColumn("avg2", expr("2 * CAST(mrank AS BIGINT) + cnt - 1"))
    val byDow = ranked.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("avg2")).as("r2"))
    byDow.groupBy(col("event_type"))
      .agg(count(lit(1)).as("kk"), sum(expr("r2 * r2")).as("s4"))
      .join(complete.groupBy(col("event_type"))
        .agg(countDistinct(col("week")).as("nw")), Seq("event_type"))
      .selectExpr("event_type", "nw", "kk", s"$FriedmanFormula AS chi2_f")
  }

  /** χ²_F from 2·rank sums: ΣR_j² = s4/4 → 12·ΣR_j²/(n·k(k+1)) − 3n(k+1)
    * = 3·s4/(n·k(k+1)) − 3n(k+1). */
  private val FriedmanFormula: String =
    "ROUND(3.0 * CAST(s4 AS DOUBLE) / (CAST(nw AS DOUBLE) " +
      "* CAST(kk AS DOUBLE) * (CAST(kk AS DOUBLE) + 1.0)) " +
      "- 3.0 * CAST(nw AS DOUBLE) * (CAST(kk AS DOUBLE) + 1.0), 6)"

  val friedmanOracle: String =
    s"""WITH $DowCellsCte,
       |wk AS (
       |  SELECT event_type, day, t, dow, (day + 3) // 7 AS week
       |  FROM cells),
       |complete AS (
       |  SELECT * FROM (
       |    SELECT event_type, week, t, dow,
       |      COUNT(*) OVER (PARTITION BY event_type, week) AS days_in_week
       |    FROM wk)
       |  WHERE days_in_week = 7),
       |rk AS (
       |  SELECT event_type, dow,
       |    2 * CAST(RANK() OVER (PARTITION BY event_type, week ORDER BY t)
       |             AS BIGINT)
       |      + COUNT(*) OVER (PARTITION BY event_type, week, t) - 1 AS avg2
       |  FROM complete),
       |bydow AS (
       |  SELECT event_type, dow, CAST(SUM(avg2) AS BIGINT) AS r2
       |  FROM rk GROUP BY 1, 2),
       |agg AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS kk,
       |    CAST(SUM(r2 * r2) AS BIGINT) AS s4
       |  FROM bydow GROUP BY 1),
       |blocks AS (
       |  SELECT event_type, CAST(COUNT(DISTINCT week) AS BIGINT) AS nw
       |  FROM complete GROUP BY 1)
       |SELECT a.event_type, nw, kk, $FriedmanFormula AS chi2_f
       |FROM agg a JOIN blocks USING (event_type)""".stripMargin

  /** Wilcoxon signed-rank of week-over-week daily revenue, per event
    * type: pairs are (day, day − 7) — same weekday one week apart, the
    * natural "did this week shift the level" pairing — with d = tᵈ −
    * tᵈ⁻⁷, zero differences dropped (the standard treatment), |d|
    * tie-average-ranked with the same 2·r̄ integer trick as
    * [[kruskalWallis]], and the positive/negative 2·rank sums reported
    * exactly.  w2_plus + w2_minus = n·(n+1) is the built-in self-check;
    * r_plus_share is the one rounded division (0.5 = no shift,
    * 1.0 = every week-over-week move was up).
    *
    * Scale: day cells, then a calendar-bounded self-join on day = day+7
    * (equi-join on the derived key) and #pairs-sized windows. */
  def wilcoxonSigned(spark: SparkSession, dir: String): DataFrame = {
    val cells = dowCells(spark, dir).select(
      col("event_type"), col("day"), col("t")).localCheckpoint()
    val prev = cells.select(col("event_type"),
      (col("day") + 7).as("day"), col("t").as("t_prev"))
    val pairs = cells.join(prev, Seq("event_type", "day"))
      .withColumn("d", col("t") - col("t_prev"))
      .filter(col("d") =!= 0)
      .withColumn("ad", abs(col("d")))
    val ranked = pairs
      .withColumn("mrank",
        rank().over(Window.partitionBy("event_type").orderBy("ad")))
      .withColumn("cnt", count(lit(1))
        .over(Window.partitionBy("event_type", "ad")))
      .withColumn("avg2", expr("2 * CAST(mrank AS BIGINT) + cnt - 1"))
    ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("d") > 0, col("avg2")).otherwise(0L)).as("w2_plus"),
        sum(when(col("d") < 0, col("avg2")).otherwise(0L)).as("w2_minus"))
      .withColumn("r_plus_share", expr(
        "ROUND(CAST(w2_plus AS DOUBLE) " +
          "/ CAST(w2_plus + w2_minus AS DOUBLE), 6)"))
  }

  val wilcoxonSignedOracle: String =
    s"""WITH $DowCellsCte,
       |pairs AS (
       |  SELECT a.event_type, a.t - b.t AS d, abs(a.t - b.t) AS ad
       |  FROM cells a JOIN cells b
       |    ON a.event_type = b.event_type AND a.day = b.day + 7
       |  WHERE a.t <> b.t),
       |rk AS (
       |  SELECT event_type, d,
       |    2 * CAST(RANK() OVER (PARTITION BY event_type ORDER BY ad)
       |             AS BIGINT)
       |      + COUNT(*) OVER (PARTITION BY event_type, ad) - 1 AS avg2
       |  FROM pairs)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(CASE WHEN d > 0 THEN avg2 ELSE 0 END) AS BIGINT)
       |    AS w2_plus,
       |  CAST(SUM(CASE WHEN d < 0 THEN avg2 ELSE 0 END) AS BIGINT)
       |    AS w2_minus,
       |  ROUND(CAST(SUM(CASE WHEN d > 0 THEN avg2 ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(avg2) AS DOUBLE), 6) AS r_plus_share
       |FROM rk GROUP BY 1""".stripMargin
}
