package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Time-to-convert: how long users take from first signup to first
  * subsequent purchase — the funnel's TIMING dimension next to
  * [[AnalyticsQueries.funnel]]'s step counts, the number a growth team
  * tracks week over week (median and p90 latency plus conversion rate).
  *
  * Scale shape: ONE user_id shuffle does all per-user work — a window
  * broadcasts each user's first-signup second across their rows, and the
  * same-exchange aggregation (window partitioning satisfies the groupBy)
  * reduces to one row per signed-up user with the minimal post-signup
  * purchase delay.  The final rollup is a single global aggregation
  * whose quantiles ride the mergeable [[graft.functions.QuantileSketch]]
  * (map-side partials; one `q_sketch_multi` buffer for both probes) —
  * no global sort, no per-group rank walk.  Cap 32768 ≥ the converted
  * population at both gate scales, so the sketch sits in its exact
  * regime and the boundaries hash-match the oracle's explicit rank walk
  * (the [[AnalyticsQueries.quantileSketch]] convention; the bounded-cap
  * production regime is gated by `q_an_quantile_sketch_capped`).
  *
  * Determinism: deltas are exact integer seconds; the conversion rate is
  * ONE IEEE division of exact counts, shared verbatim, ROUND 6.  Users
  * whose only purchases precede their signup count as signed-up but not
  * converted.
  */
object TimeToConvert {

  /** Shared verbatim with the oracle: one exact-operand IEEE division. */
  private val RateExpr =
    "ROUND(CAST(n_converted AS DOUBLE) / CAST(n_signups AS DOUBLE), 6)"

  def timeToConvert(spark: SparkSession, dir: String,
      cap: Int = 0): DataFrame = {
    graft.functions.QuantileSketch.register(spark)
    // Adaptive cap (r12 verdict #1): the sketch group is one delta per
    // signup user, bounded above by the customer dimension — a
    // metadata-cheap count, so the exact regime holds by rule at every
    // gate scale and the bounded cap engages past the ceiling.
    val c =
      if (cap != 0) cap
      else AnalyticsQueries.adaptiveSketchCap(
        Sources.customer(spark, dir).count())
    timeToConvertOf(Sources.events(spark, dir)
      .select(col("user_id"), col("ts").cast("bigint").as("sec"),
        col("event_type")), c)
  }

  /** Core over a prepared (user_id, sec, event_type) frame —
    * spec-testable on synthetic histories. */
  private[graft] def timeToConvertOf(ev: DataFrame, cap: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val perUser = ev
      .withColumn("s",
        min(when(col("event_type") === "signup", col("sec"))).over(byUser))
      .groupBy("user_id")
      .agg(max(col("s")).as("s"),
        min(when(col("event_type") === "purchase" &&
          col("sec") >= col("s"), col("sec") - col("s"))).as("delta"))
      .where(col("s").isNotNull)
    perUser
      .agg(count(lit(1)).as("n_signups"),
        count(col("delta")).as("n_converted"),
        expr(s"q_sketch_multi(delta, array(0.5D, 0.9D), $cap)").as("qs"))
      .select(col("n_signups"), col("n_converted"),
        expr(RateExpr).as("conv_rate"),
        expr("qs[0]").as("p50_sec"), expr("qs[1]").as("p90_sec"))
  }

  val timeToConvertOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
       |    event_type
       |  FROM events),
       |su AS (
       |  SELECT user_id,
       |    MIN(CASE WHEN event_type = 'signup' THEN sec END) AS s
       |  FROM ev GROUP BY 1),
       |pu AS (
       |  SELECT su.user_id,
       |    MIN(CASE WHEN e.event_type = 'purchase' AND e.sec >= su.s
       |      THEN e.sec - su.s END) AS delta
       |  FROM su JOIN ev e ON su.user_id = e.user_id
       |  WHERE su.s IS NOT NULL
       |  GROUP BY 1),
       |r AS (
       |  SELECT delta,
       |    ROW_NUMBER() OVER (ORDER BY delta) AS rn,
       |    COUNT(*) OVER () AS n
       |  FROM pu WHERE delta IS NOT NULL)
       |SELECT
       |  CAST((SELECT COUNT(*) FROM pu) AS BIGINT) AS n_signups,
       |  CAST((SELECT COUNT(delta) FROM pu) AS BIGINT) AS n_converted,
       |  ROUND(CAST((SELECT COUNT(delta) FROM pu) AS DOUBLE) /
       |    CAST((SELECT COUNT(*) FROM pu) AS DOUBLE), 6) AS conv_rate,
       |  (SELECT MIN(CASE WHEN rn >= CEIL(0.5 * n) THEN delta END) FROM r)
       |    AS p50_sec,
       |  (SELECT MIN(CASE WHEN rn >= CEIL(0.9 * n) THEN delta END) FROM r)
       |    AS p90_sec""".stripMargin
}
