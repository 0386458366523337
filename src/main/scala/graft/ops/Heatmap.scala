package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** Day-of-week × hour activity heatmap — the traffic-shape view behind
  * staffing/capacity dashboards.  The interesting part is DETERMINISM:
  * engine calendar functions disagree on conventions (Spark `dayofweek`
  * is 1 = Sunday; DuckDB's is 0 = Sunday), so the grid coordinates are
  * PURE INTEGER arithmetic on the epoch second, shared verbatim —
  * `dow = (sec DIV 86400 + 3) % 7 + 1` (1 = Monday; 1970-01-01 was a
  * Thursday = day 4) and `hour = sec % 86400 DIV 3600` — no calendar
  * call exists in either plan, the same discipline that pinned
  * [[graft.ops.AnalyticsQueries.cohortLtv]]'s week arithmetic.  UTC by
  * session convention.
  *
  * Scale: one scan into a ≤168-cell hash aggregate with map-side
  * partials — like [[CmsFreq]], the cheapest possible shape.
  */
object Heatmap {

  private val DowExpr = "(sec DIV 86400 + 3) % 7 + 1"
  private val HourExpr = "sec % 86400 DIV 3600"

  def dowHour(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    Sources.events(spark, dir)
      .select(col("ts").cast("bigint").as("sec"),
        expr("money_cents(value)").as("cents"))
      .select(expr(DowExpr).cast("int").as("dow"),
        expr(HourExpr).cast("int").as("hora"), col("cents"))
      .groupBy(col("dow"), col("hora"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
  }

  val dowHourOracle: String =
    s"""WITH ev AS (
       |  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
       |    CAST(${Frag.money("value")} * 100 AS BIGINT) AS cents
       |  FROM events)
       |SELECT CAST((sec // 86400 + 3) % 7 + 1 AS INT) AS dow,
       |  CAST(sec % 86400 // 3600 AS INT) AS hora,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(cents) AS BIGINT) AS cents
       |FROM ev GROUP BY 1, 2""".stripMargin
}
