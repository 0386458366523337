package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** CUSUM changepoint detection over daily revenue per event type — "on
  * which day did this metric's level shift", the monitoring primitive
  * behind regression alerts on any KPI series.  (Beyond-reference
  * analytics in the [[AnalyticsQueries.rollingVariance]] family.)
  *
  * Statistic: the classic cumulative-sum deviation S_t = Σ_{i≤t} (x_i −
  * x̄) peaks at the most likely level-shift point.  Dividing by n to form
  * x̄ would put an inexact quotient inside a cross-engine sum, so the
  * statistic is lifted to the EQUIVALENT integer form
  *   S*_t = n·P_t − t·T   (P_t = prefix sum, T = total, n = #days)
  * which is n·S_t with every operand an exact int64 (cents); argmax is
  * unchanged.  The changepoint is the earliest day attaining max |S*_t|.
  *
  * Scale shape: ONE shuffle builds the per-(event_type, day) integer
  * cells (map-side combined); the prefix-sum window then runs per event
  * type over ALREADY AGGREGATED day cells (the [[AnalyticsQueries
  * .cohortLtv]] convention — a few hundred rows per group at any corpus
  * size, never the event log), and the argmax is a MIN over a comparison
  * struct (partial map-side, the keepLatest recipe).  Overflow headroom:
  * n·P stays below 2^63 until ~10^5 days × 10^14 cents.
  */
object Changepoint {

  def cusum(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    cusumOf(Sources.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(bigsum(money_cents(value)) AS BIGINT)")
        .as("cents")))
  }

  /** Core over prepared (event_type, day, cents) daily cells —
    * spec-testable on synthetic series. */
  private[graft] def cusumOf(daily: DataFrame): DataFrame = {
    val byDay = Window.partitionBy("event_type").orderBy("day")
    val whole = Window.partitionBy("event_type")
    val scored = daily
      .withColumn("t", row_number().over(byDay))
      .withColumn("pref", sum("cents").over(byDay))
      .withColumn("tot", sum("cents").over(whole))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("s_abs", abs(expr("n * pref - t * tot")))
    scored
      .groupBy("event_type")
      .agg(max(col("n")).cast("bigint").as("n_days"),
        min(struct((-col("s_abs")).as("neg"), col("day"))).as("m"))
      .select(col("event_type"), col("n_days"),
        col("m.day").as("cp_day"), (-col("m.neg")).as("cusum_abs"))
  }

  /** Trailing-window anomaly flags per event-type revenue series — the
    * alerting twin of [[cusum]] (cusum localizes ONE level shift in a
    * closed series; this flags EVERY day that deviates from its own
    * recent history, the production monitoring rule).  A day is
    * anomalous when its total sits more than 3σ from the trailing
    * 7-observed-day mean — evaluated WITHOUT sqrt or division through
    * the cross-multiplied form
    *
    *   (m·t − S1)² > 9·(m·S2 − S1²)     (m = 7, S1 = Σtᵢ, S2 = Σtᵢ²)
    *
    * which is z² > 9 with every operand an exact int64, so the flags
    * hash-check cross-engine (the [[cusum]] integer-lift recipe; a σ or
    * mean would put inexact quotients in the comparison).  Overflow
    * headroom: all products stay below 2^63 while daily totals stay
    * under ~3·10⁸ cents per type; beyond that lift the four operands to
    * DECIMAL.  Zero-variance windows flag any deviation (exactly the
    * σ = 0 semantics); the first 7 observed days per type are unscored
    * (no full window) and rows-filtered, not NULL-padded.
    *
    * Scale: ONE shuffle builds the (type, day) integer cells; the
    * trailing window runs per type over ALREADY AGGREGATED day cells
    * (the cusum convention), and the flag is a pure projection. */
  def anomalyDays(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    anomalyDaysOf(Sources.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(bigsum(money_cents(value)) AS BIGINT)")
        .as("t")))
  }

  private[graft] def anomalyDaysOf(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    daily
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("s1", sum(col("t")).over(w))
      .withColumn("s2", sum(expr("t * t")).over(w))
      .filter(col("m") === 7)
      .withColumn("anomaly",
        expr("(7 * t - s1) * (7 * t - s1) > 9 * (7 * s2 - s1 * s1)"))
      .select(col("event_type"), col("day"), col("t").as("cents"),
        col("anomaly"))
  }

  val anomalyDaysOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS t
       |  FROM events GROUP BY 1, 2),
       |scored AS (
       |  SELECT event_type, day, t,
       |    COUNT(*) OVER w AS m,
       |    CAST(SUM(t) OVER w AS BIGINT) AS s1,
       |    CAST(SUM(t * t) OVER w AS BIGINT) AS s2
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
       |SELECT event_type, day, t AS cents,
       |  (7 * t - s1) * (7 * t - s1) > 9 * (7 * s2 - s1 * s1) AS anomaly
       |FROM scored WHERE m = 7""".stripMargin

  val cusumOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |scored AS (
       |  SELECT event_type, day,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
       |    SUM(cents) OVER (PARTITION BY event_type ORDER BY day) AS pref,
       |    SUM(cents) OVER (PARTITION BY event_type) AS tot,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM daily),
       |ranked AS (
       |  SELECT event_type, day, n, ABS(n * pref - t * tot) AS s_abs,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |      ORDER BY ABS(n * pref - t * tot) DESC, day) AS rn
       |  FROM scored)
       |SELECT event_type, CAST(n AS BIGINT) AS n_days, day AS cp_day,
       |  CAST(s_abs AS BIGINT) AS cusum_abs
       |FROM ranked WHERE rn = 1""".stripMargin

  /** Wald–Wolfowitz runs test per event-type revenue series — "are the
    * day-over-day ups and downs RANDOM, or does the series trend/
    * oscillate": too few sign runs ⇒ momentum, too many ⇒ mean
    * reversion.  The third member of the series-forensics family
    * ([[cusum]] finds the level shift, [[anomalyDays]] the outlier day;
    * this scores the sequence's randomness itself).
    *
    * All counts are exact integers from one LAG over the aggregated day
    * cells (zero deltas drop — the standard tie handling); E[R] =
    * 1 + 2·n₁·n₂/n and Var[R] = 2n₁n₂(2n₁n₂−n)/(n²(n−1)) evaluate in
    * one shared-verbatim IEEE chain with an exact sqrt (the
    * [[AnalyticsQueries.abTest]] recipe), NULLIF-guarding the
    * one-sided (n₁·n₂ = 0) and single-delta regimes.  Scale: day-cells
    * aggregate (one shuffle) + per-type windows over cells + #types-row
    * rollup. */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    runsTestOf(Sources.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(bigsum(money_cents(value)) AS BIGINT)")
        .as("cents")))
  }

  private[graft] def runsTestOf(daily: DataFrame): DataFrame = {
    val wLag = Window.partitionBy("event_type").orderBy("day")
    val signs = daily
      .withColumn("delta", col("cents") - lag(col("cents"), 1).over(wLag))
      .filter(col("delta").isNotNull && col("delta") =!= 0)
      .withColumn("sign", when(col("delta") > 0, 1).otherwise(-1))
      .withColumn("prev_sign", lag(col("sign"), 1).over(wLag))
      .withColumn("run_start",
        (col("prev_sign").isNull || col("sign") =!= col("prev_sign"))
          .cast("long"))
    signs.groupBy(col("event_type"))
      .agg(count(when(col("sign") === 1, 1)).as("n_up"),
        count(when(col("sign") === -1, 1)).as("n_down"),
        sum(col("run_start")).as("n_runs"))
      .withColumn("e_runs", expr(RunsERuns))
      .withColumn("z", expr(RunsZ))
  }

  /** Shared verbatim with the oracle: expectation and z over exact
    * integer counts (the abTest chain discipline). */
  private val RunsERuns =
    "ROUND(CAST(1 AS DOUBLE) + CAST(2 AS DOUBLE) * CAST(n_up AS DOUBLE) " +
      "* CAST(n_down AS DOUBLE) " +
      "/ CAST(NULLIF(n_up + n_down, 0) AS DOUBLE), 6)"
  private val RunsZ =
    "ROUND((CAST(n_runs AS DOUBLE) - (CAST(1 AS DOUBLE) " +
      "+ CAST(2 AS DOUBLE) * CAST(n_up AS DOUBLE) " +
      "* CAST(n_down AS DOUBLE) / CAST(NULLIF(n_up + n_down, 0) AS DOUBLE))) " +
      "/ SQRT(CAST(NULLIF(2 * n_up * n_down " +
      "* (2 * n_up * n_down - (n_up + n_down)), 0) AS DOUBLE) " +
      "/ (CAST(n_up + n_down AS DOUBLE) * CAST(n_up + n_down AS DOUBLE) " +
      "* CAST(NULLIF(n_up + n_down - 1, 0) AS DOUBLE))), 6)"

  val runsTestOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |d AS (
       |  SELECT event_type, day,
       |    cents - LAG(cents) OVER (PARTITION BY event_type ORDER BY day)
       |      AS delta
       |  FROM daily),
       |s AS (
       |  SELECT event_type, day,
       |    CASE WHEN delta > 0 THEN 1 ELSE -1 END AS sign
       |  FROM d WHERE delta IS NOT NULL AND delta <> 0),
       |r AS (
       |  SELECT event_type, sign,
       |    CASE WHEN LAG(sign) OVER (PARTITION BY event_type ORDER BY day)
       |              IS DISTINCT FROM sign THEN 1 ELSE 0 END AS run_start
       |  FROM s),
       |agg AS (
       |  SELECT event_type,
       |    CAST(COUNT(CASE WHEN sign = 1 THEN 1 END) AS BIGINT) AS n_up,
       |    CAST(COUNT(CASE WHEN sign = -1 THEN 1 END) AS BIGINT) AS n_down,
       |    CAST(SUM(run_start) AS BIGINT) AS n_runs
       |  FROM r GROUP BY 1)
       |SELECT event_type, n_up, n_down, n_runs,
       |  $RunsERuns AS e_runs,
       |  $RunsZ AS z
       |FROM agg""".stripMargin
}
