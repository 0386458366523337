package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Kaplan–Meier survival over user LIFETIMES — the churn curve the
  * retention cohort grid ([[graft.ops.OperatorQueries]] retention)
  * approximates by calendar buckets: S(t) = Π over churn times tᵢ ≤ t
  * of (1 − dᵢ/nᵢ), the standard product-limit estimator with RIGHT
  * CENSORING — a user whose last event falls inside the trailing
  * 7-day horizon hasn't churned, they just haven't been observed
  * longer, and dropping them (what a naive "lifetime histogram" does)
  * biases every long-duration estimate down.  Censored users leave the
  * risk set without contributing an event, exactly the KM treatment
  * (Kaplan & Meier 1958).
  *
  * Exactness/determinism: durations and risk-set counts are exact
  * integers (nᵢ = total − running prefix of earlier departures); each
  * factor 1 − dᵢ/nᵢ is one IEEE division; the survival PRODUCT is the
  * engine's ordered-fold recipe (the [[Forecast.ewma]] pattern) — a
  * prefix array collected in duration order folded left-to-right, the
  * same multiplication sequence in both engines, so the doubles hash.
  * No libm beyond multiply/divide.
  *
  * Scale: one events scan → per-user (first, last) aggregate → the
  * ≤ #durations grid (calendar-bounded); the prefix windows run over
  * that grid, never the corpus.  The O(grid²) slice-folds are bounded
  * by days², driver-irrelevant.
  */
object Survival {

  def kaplanMeier(spark: SparkSession, dir: String,
      horizonDays: Int = 7): DataFrame = {
    val users = Sources.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS BIGINT) DIV 86400").as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val maxd = users.agg(max(col("mx")).as("maxd"))
    val grid = users.crossJoin(broadcast(maxd))
      .select((col("mx") - col("mn")).as("dur"),
        when(col("mx") < col("maxd") - horizonDays, 1L).otherwise(0L)
          .as("churn"))
      .groupBy(col("dur"))
      .agg(sum(col("churn")).as("d"),
        (count(lit(1)) - sum(col("churn"))).as("c"))
    val byDur = Window.orderBy(col("dur"))
    grid
      .withColumn("departed_before", coalesce(
        sum(expr("d + c")).over(
          byDur.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk",
        sum(expr("d + c")).over(
          Window.partitionBy(lit(1))) - col("departed_before"))
      .withColumn("factor", expr(
        "CASE WHEN d > 0 THEN 1.0 - CAST(d AS DOUBLE) " +
          "/ CAST(n_risk AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END"))
      .withColumn("prefix", collect_list(col("factor")).over(
        byDur.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .selectExpr("dur", "n_risk", "d AS d_churned", "c AS c_censored",
        "ROUND(aggregate(prefix, CAST(1.0 AS DOUBLE), " +
          "(acc, x) -> acc * x), 6) AS survival")
  }

  /** Nelson–Aalen cumulative hazard over the same censored lifetimes —
    * H(t) = Σ over churn times tᵢ ≤ t of dᵢ/nᵢ (Nelson 1972, Aalen
    * 1978), the additive companion of [[kaplanMeier]]'s product: where
    * S(t) answers "what fraction survives past t", H(t) reads as the
    * expected churn events per still-active user by t, and its
    * INCREMENTS localize when the churn pressure happens (a flat H is
    * a quiet stretch; KM's multiplicative form hides that).  Same
    * exactness recipe: integer risk sets, one IEEE division per term,
    * the cumulative SUM as the ordered prefix fold both engines spell
    * identically — no libm.  Same grid-bounded scale shape as KM. */
  def nelsonAalen(spark: SparkSession, dir: String,
      horizonDays: Int = 7): DataFrame = {
    val users = Sources.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS BIGINT) DIV 86400").as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val maxd = users.agg(max(col("mx")).as("maxd"))
    val grid = users.crossJoin(broadcast(maxd))
      .select((col("mx") - col("mn")).as("dur"),
        when(col("mx") < col("maxd") - horizonDays, 1L).otherwise(0L)
          .as("churn"))
      .groupBy(col("dur"))
      .agg(sum(col("churn")).as("d"),
        (count(lit(1)) - sum(col("churn"))).as("c"))
    val byDur = Window.orderBy(col("dur"))
    grid
      .withColumn("departed_before", coalesce(
        sum(expr("d + c")).over(
          byDur.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk",
        sum(expr("d + c")).over(
          Window.partitionBy(lit(1))) - col("departed_before"))
      .withColumn("term", expr(
        "CASE WHEN d > 0 THEN CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) " +
          "ELSE CAST(0.0 AS DOUBLE) END"))
      .withColumn("prefix", collect_list(col("term")).over(
        byDur.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .selectExpr("dur", "n_risk", "d AS d_churned", "c AS c_censored",
        "ROUND(aggregate(prefix, CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + x), 6) AS cum_hazard")
  }

  def nelsonAalenOracle(horizonDays: Int = 7): String =
    s"""WITH u AS (
       |  SELECT user_id,
       |    MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) AS mn,
       |    MAX(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) AS mx
       |  FROM events GROUP BY 1),
       |m AS (SELECT MAX(mx) AS maxd FROM u),
       |lif AS (
       |  SELECT mx - mn AS dur,
       |    CASE WHEN mx < maxd - $horizonDays THEN 1 ELSE 0 END AS churn
       |  FROM u, m),
       |g AS (
       |  SELECT dur, CAST(SUM(churn) AS BIGINT) AS d,
       |    CAST(COUNT(*) - SUM(churn) AS BIGINT) AS c
       |  FROM lif GROUP BY 1),
       |r AS (
       |  SELECT dur, d, c,
       |    COALESCE(SUM(d + c) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS departed_before,
       |    SUM(d + c) OVER () AS total
       |  FROM g),
       |f AS (
       |  SELECT dur, total - departed_before AS n_risk, d, c,
       |    CASE WHEN d > 0 THEN CAST(d AS DOUBLE)
       |      / CAST(total - departed_before AS DOUBLE)
       |      ELSE CAST(0.0 AS DOUBLE) END AS term
       |  FROM r),
       |p AS (
       |  SELECT dur, n_risk, d, c,
       |    list(term) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
       |  FROM f)
       |SELECT dur, CAST(n_risk AS BIGINT) AS n_risk,
       |  d AS d_churned, c AS c_censored,
       |  ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), prefix),
       |    (acc, x) -> acc + x), 6) AS cum_hazard
       |FROM p""".stripMargin

  def kaplanMeierOracle(horizonDays: Int = 7): String =
    s"""WITH u AS (
       |  SELECT user_id,
       |    MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) AS mn,
       |    MAX(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) AS mx
       |  FROM events GROUP BY 1),
       |m AS (SELECT MAX(mx) AS maxd FROM u),
       |lif AS (
       |  SELECT mx - mn AS dur,
       |    CASE WHEN mx < maxd - $horizonDays THEN 1 ELSE 0 END AS churn
       |  FROM u, m),
       |g AS (
       |  SELECT dur, CAST(SUM(churn) AS BIGINT) AS d,
       |    CAST(COUNT(*) - SUM(churn) AS BIGINT) AS c
       |  FROM lif GROUP BY 1),
       |r AS (
       |  SELECT dur, d, c,
       |    COALESCE(SUM(d + c) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS departed_before,
       |    SUM(d + c) OVER () AS total
       |  FROM g),
       |f AS (
       |  SELECT dur, total - departed_before AS n_risk, d, c,
       |    CASE WHEN d > 0 THEN 1.0 - CAST(d AS DOUBLE)
       |      / CAST(total - departed_before AS DOUBLE)
       |      ELSE CAST(1.0 AS DOUBLE) END AS factor
       |  FROM r),
       |p AS (
       |  SELECT dur, n_risk, d, c,
       |    list(factor) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
       |  FROM f)
       |SELECT dur, CAST(n_risk AS BIGINT) AS n_risk,
       |  d AS d_churned, c AS c_censored,
       |  ROUND(list_reduce(list_prepend(CAST(1.0 AS DOUBLE), prefix),
       |    (acc, x) -> acc * x), 6) AS survival
       |FROM p""".stripMargin
}
