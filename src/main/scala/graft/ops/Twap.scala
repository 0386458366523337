package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** Time-weighted average value (TWAP) per event type — the
  * irregular-sampling average every pricing/telemetry pipeline needs:
  * a plain AVG over-weights bursts; weighting each observation by how
  * long it REMAINED CURRENT (seconds until the next same-type event)
  * integrates the step function the observations trace.
  *
  * Exactness: weights are integer second gaps from the engine-wide
  * (sec, event_id) ordering, values are exact cents, so Σ(cents·w) and
  * Σw are exact int64 sums (headroom: ~10⁶ cents × ~10⁵ s gaps × 10⁹
  * rows still < 2^63 per group only if gaps shrink as rows grow — which
  * they do: Σw telescopes to the observed time span, so Σ(cents·w) ≤
  * max_cents · span_seconds, span-bounded at ANY row count).  The TWAP
  * itself is ONE division of exact operands, ROUND 6 — deterministic
  * cross-engine.  The last observation per type has no closing gap and
  * is excluded (an unclosed interval has no defined weight; spec-pinned).
  *
  * Scale: one event_type-keyed exchange, one LEAD window, map-side
  * partial sums into a #types-row aggregate.
  */
object Twap {

  def twap(spark: SparkSession, dir: String): DataFrame =
    twapOf(Sources.events(spark, dir)
      .select(col("event_type"), col("ts").cast("bigint").as("sec"),
        col("event_id"),
        expr(s"CAST(${Frag.money("value")} * 100 AS BIGINT)").as("cents")))

  private[graft] def twapOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    ev
      .withColumn("w", lead(col("sec"), 1).over(w) - col("sec"))
      .filter(col("w").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("w")).as("total_seconds"),
        sum(col("cents") * col("w")).as("weighted_cents"))
      .withColumn("twap_cents", when(col("total_seconds") > 0, round(
        col("weighted_cents").cast("double")
          / col("total_seconds").cast("double"), 6)))
      .select(col("event_type"), col("n_intervals"), col("total_seconds"),
        col("twap_cents"))
  }

  val twapOracle: String =
    s"""WITH ev AS (
       |  SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
       |    event_id,
       |    CAST(${Frag.money("value")} * 100 AS BIGINT) AS cents
       |  FROM events),
       |g AS (
       |  SELECT event_type, cents,
       |    LEAD(sec, 1) OVER (PARTITION BY event_type
       |      ORDER BY sec, event_id) - sec AS w
       |  FROM ev),
       |s AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
       |    CAST(SUM(w) AS BIGINT) AS total_seconds,
       |    CAST(SUM(cents * w) AS BIGINT) AS weighted_cents
       |  FROM g WHERE w IS NOT NULL GROUP BY 1)
       |SELECT event_type, n_intervals, total_seconds,
       |  CASE WHEN total_seconds > 0 THEN
       |    ROUND(CAST(weighted_cents AS DOUBLE)
       |      / CAST(total_seconds AS DOUBLE), 6) END AS twap_cents
       |FROM s""".stripMargin
}
