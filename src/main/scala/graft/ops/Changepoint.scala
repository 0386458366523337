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
