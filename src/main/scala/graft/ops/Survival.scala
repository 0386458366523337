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

  /** Shared double spellings for the log-rank terms — IDENTICAL text on
    * both engines so the per-duration doubles (and therefore the folded
    * sums and the statistic) hash bit-for-bit. */
  private val LogRankE1 =
    "CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)"
  private val LogRankV =
    "CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) " +
      "* (CAST(n2 AS DOUBLE) / CAST(n AS DOUBLE)) " +
      "* (CAST(n - d AS DOUBLE) / CAST(NULLIF(n - 1, 0) AS DOUBLE))"

  /** Log-rank (Mantel–Cox) test: do two user cohorts CHURN at the same
    * rate?  Groups are the deterministic `user_id % 2` split (the
    * [[graft.llm.Sampling]] convention for oracle-reproducible
    * cohorts); the test compares the groups' whole hazard curves, not
    * one horizon's retention — per churn duration t, observed group-1
    * events d₁ₜ vs expected `E₁ₜ = dₜ·n₁ₜ/nₜ` under the shared-hazard
    * null, variance the hypergeometric `dₜ(n₁ₜ/nₜ)(n₂ₜ/nₜ)(nₜ−dₜ)/(nₜ−1)`,
    * statistic `(ΣO₁−ΣE₁)²/ΣV ~ χ²₁` (Mantel 1966).  Censoring is
    * [[kaplanMeier]]'s: horizon-active users leave both risk sets
    * eventless.
    *
    * Exactness: risk sets and observed counts are exact integers; per
    * duration the E/V terms are the shared double chains above; the two
    * sums are ordered prefix folds over the duration-sorted term array
    * (the KM recipe), so both engines add in the same sequence.  The
    * statistic divides the unrounded folds; ROUND(…,6) is applied only
    * at the output.  Scale: same grid-bounded shape as KM — one events
    * scan, per-user aggregate, then a ≤ #durations frame. */
  def logRank(spark: SparkSession, dir: String,
      horizonDays: Int = 7): DataFrame = {
    val users = Sources.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS BIGINT) DIV 86400").as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val maxd = users.agg(max(col("mx")).as("maxd"))
    val lives = users.crossJoin(broadcast(maxd))
      .select((col("mx") - col("mn")).as("dur"),
        pmod(col("user_id"), lit(2L)).as("grp"),
        when(col("mx") < col("maxd") - horizonDays, 1L).otherwise(0L)
          .as("churn"))
    val grid = lives.groupBy(col("dur"))
      .agg(
        sum(when(col("grp") === 0 && col("churn") === 1, 1L)
          .otherwise(0L)).as("d1"),
        sum(when(col("grp") === 1 && col("churn") === 1, 1L)
          .otherwise(0L)).as("d2"),
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("dep1"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("dep2"))
    val byDur = Window.orderBy(col("dur"))
    val all = Window.partitionBy(lit(1))
    grid
      .withColumn("n1", sum(col("dep1")).over(all) - coalesce(
        sum(col("dep1")).over(
          byDur.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n2", sum(col("dep2")).over(all) - coalesce(
        sum(col("dep2")).over(
          byDur.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("d", col("d1") + col("d2"))
      .withColumn("e1",
        when(col("d") > 0, expr(LogRankE1)).otherwise(lit(0.0)))
      .withColumn("v", when(col("d") > 0,
        coalesce(expr(LogRankV), lit(0.0))).otherwise(lit(0.0)))
      .groupBy()
      .agg(sum(col("d1")).as("o1"), sum(col("d2")).as("o2"),
        expr("sort_array(collect_list(struct(dur, e1, v)))").as("arr"))
      .selectExpr("o1", "o2",
        "aggregate(transform(arr, s -> s.e1), CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + x) AS e1_sum",
        "aggregate(transform(arr, s -> s.v), CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + x) AS v_sum")
      .selectExpr("o1", "o2", "ROUND(e1_sum, 6) AS e1",
        "ROUND(v_sum, 6) AS var_sum",
        "ROUND((CAST(o1 AS DOUBLE) - e1_sum) * " +
          "(CAST(o1 AS DOUBLE) - e1_sum) " +
          "/ NULLIF(v_sum, 0.0), 6) AS logrank_chi2")
  }

  def logRankOracle(horizonDays: Int = 7): String =
    s"""WITH u AS (
       |  SELECT user_id,
       |    MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) AS mn,
       |    MAX(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) AS mx
       |  FROM events GROUP BY 1),
       |m AS (SELECT MAX(mx) AS maxd FROM u),
       |lif AS (
       |  SELECT mx - mn AS dur, user_id % 2 AS grp,
       |    CASE WHEN mx < maxd - $horizonDays THEN 1 ELSE 0 END AS churn
       |  FROM u, m),
       |g AS (
       |  SELECT dur,
       |    CAST(SUM(CASE WHEN grp = 0 AND churn = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS d1,
       |    CAST(SUM(CASE WHEN grp = 1 AND churn = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS d2,
       |    CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS dep1,
       |    CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS dep2
       |  FROM lif GROUP BY 1),
       |r AS (
       |  SELECT dur, d1, d2,
       |    SUM(dep1) OVER () - COALESCE(SUM(dep1) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
       |    SUM(dep2) OVER () - COALESCE(SUM(dep2) OVER (ORDER BY dur
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n2
       |  FROM g),
       |t AS (
       |  SELECT dur, d1, d2, n1, n2, n1 + n2 AS n, d1 + d2 AS d FROM r),
       |terms AS (
       |  SELECT dur, d1, d2,
       |    CASE WHEN d > 0 THEN $LogRankE1 ELSE CAST(0.0 AS DOUBLE) END
       |      AS e1,
       |    CASE WHEN d > 0 THEN COALESCE($LogRankV, CAST(0.0 AS DOUBLE))
       |      ELSE CAST(0.0 AS DOUBLE) END AS v
       |  FROM t),
       |folded AS (
       |  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
       |    CAST(SUM(d2) AS BIGINT) AS o2,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'dur': dur, 'e1': e1, 'v': v}
       |        ORDER BY dur), s -> s.e1)), (acc, x) -> acc + x) AS e1_sum,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list({'dur': dur, 'e1': e1, 'v': v}
       |        ORDER BY dur), s -> s.v)), (acc, x) -> acc + x) AS v_sum
       |  FROM terms)
       |SELECT o1, o2, ROUND(e1_sum, 6) AS e1, ROUND(v_sum, 6) AS var_sum,
       |  ROUND((CAST(o1 AS DOUBLE) - e1_sum) * (CAST(o1 AS DOUBLE) - e1_sum)
       |    / NULLIF(v_sum, 0.0), 6) AS logrank_chi2
       |FROM folded""".stripMargin

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
