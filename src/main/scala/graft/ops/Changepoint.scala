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

  def cusum(spark: SparkSession, dir: String): DataFrame =
    cusumOf(Sources.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr(s"CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT)")
        .as("cents")))

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
  def anomalyDays(spark: SparkSession, dir: String): DataFrame =
    anomalyDaysOf(Sources.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr(s"CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT)")
        .as("t")))

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
}
