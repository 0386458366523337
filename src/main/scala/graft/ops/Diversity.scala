package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Daily event-mix diversity — "did the traffic composition collapse
  * into one event type today?", the mix-shift monitor that catches a
  * broken producer long before volume alarms do.  (Beyond-reference
  * analytics, [[Changepoint]] family.)
  *
  * Statistic: the Gini–Simpson index 1 − Σ pᵢ² and its inverse-Simpson
  * companion (the "effective number of types", 1/Σ pᵢ²) — the standard
  * diversity pair chosen here deliberately over Shannon entropy, whose
  * log() is a libm call with no cross-engine bit guarantee.  Both
  * reduce to the exact integer pair (N² − Σcᵢ², N²): every operand is
  * an int64 count, and the single ROUNDed double division per day is
  * IEEE-deterministic on hash-identical operands (the engine's
  * integer-lift discipline; see [[Changepoint.cusum]]).
  *
  * Scale shape: ONE exchange builds the (day, event_type) count cells
  * (map-side combined); the per-day reduction runs over ≤ #types rows
  * per day — never the event log — in a second tiny keyed aggregation.
  * Overflow: N² stays below 2^63 until ~3·10^9 events per day. */
object Diversity {

  def simpsonDaily(spark: SparkSession, dir: String): DataFrame =
    simpsonDailyOf(Sources.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c")))

  /** Core over prepared (day, event_type, c) cells — spec-testable on
    * synthetic mixes. */
  private[graft] def simpsonDailyOf(cells: DataFrame): DataFrame =
    cells
      .groupBy(col("day"))
      .agg(sum(col("c")).as("n_events"),
        count(lit(1)).cast("bigint").as("n_types"),
        sum(col("c") * col("c")).as("ssq"))
      .select(col("day"), col("n_events"), col("n_types"),
        expr("CAST(ROUND(CAST(n_events * n_events - ssq AS DOUBLE) / " +
          "CAST(n_events * n_events AS DOUBLE), 6) AS DECIMAL(18,6))")
          .as("gini_simpson"),
        expr("CAST(ROUND(CAST(n_events * n_events AS DOUBLE) / " +
          "CAST(ssq AS DOUBLE), 6) AS DECIMAL(18,6))").as("inv_simpson"))
      .orderBy(col("day"))

  val simpsonDailyOracle: String =
    """WITH cells AS (
      |  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |d AS (
      |  SELECT day, CAST(SUM(c) AS BIGINT) AS n_events,
      |    CAST(COUNT(*) AS BIGINT) AS n_types,
      |    CAST(SUM(c * c) AS BIGINT) AS ssq
      |  FROM cells GROUP BY 1)
      |SELECT day, n_events, n_types,
      |  CAST(ROUND(CAST(n_events * n_events - ssq AS DOUBLE) /
      |             CAST(n_events * n_events AS DOUBLE), 6)
      |       AS DECIMAL(18,6)) AS gini_simpson,
      |  CAST(ROUND(CAST(n_events * n_events AS DOUBLE) /
      |             CAST(ssq AS DOUBLE), 6) AS DECIMAL(18,6)) AS inv_simpson
      |FROM d ORDER BY day""".stripMargin
}
