package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Event-level AS-OF join: each purchase picks up the latest view by the
  * same user at-or-before it, within a tolerance — the point-in-time
  * lookup every feature store and attribution pipeline runs (the
  * reference's month-snapshot variant is [[Snapshot]]/J6; this is the
  * event-granularity general form, beyond the reference's surface).
  *
  * Spark-first shape: NOT a range join.  Both sides union into one
  * stream, ONE shuffle on user_id, and a running `last(view_ts)` window
  * carries the most recent view forward — per-row state is a single
  * timestamp, no candidate-pair blowup, and the same plan is exactly
  * Structured Streaming's last-value state shape.  A range join would
  * re-shuffle both sides AND multiply every purchase by its candidate
  * views before aggregating them back down ([[graft.streaming.EventsStream
  * .conversions]] needs that — it keeps EVERY pair; as-of keeps one).
  *
  * The DuckDB oracle is the engine's native `ASOF LEFT JOIN` — a fully
  * independent formulation, so the gate cross-checks the union+window
  * trick against a purpose-built as-of operator.  Ordering tie contract:
  * views sort before purchases at equal ts, matching ASOF's `v.ts <=
  * p.ts` inclusive bound; ties among equal-ts views emit the same ts
  * value either way.  Tolerance: the carried view IS the maximum
  * at-or-before view, so "max older than tolerance" ⇒ "no view inside
  * tolerance" — one post-filter, no second pass.  Lag uses the
  * whole-second epoch convention shared with conversions/sessionize.
  */
object AsOfEvent {

  def asOf(spark: SparkSession, dir: String,
      toleranceMinutes: Int = 30): DataFrame = {
    val ev = Sources.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val viewsFirst = when(col("event_type") === "view", lit(0)).otherwise(lit(1))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, viewsFirst.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_view_ts",
        last(when(col("event_type") === "view", col("ts")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_event_id"),
        col("user_id"),
        col("ts").as("purchase_ts"),
        when(col("last_view_ts") >=
            col("ts") - expr(s"INTERVAL $toleranceMinutes MINUTES"),
          col("last_view_ts")).as("asof_view_ts"))
      .withColumn("lag_seconds",
        col("purchase_ts").cast("bigint") - col("asof_view_ts").cast("bigint"))
  }

  /** Native ASOF LEFT JOIN; the tolerance NULLs out a stale match (and its
    * lag) after the fact — sound because the matched view is the maximum
    * at-or-before one. */
  def asOfOracle(toleranceMinutes: Int = 30): String =
    s"""SELECT p.event_id AS purchase_event_id, p.user_id,
       |  p.ts AS purchase_ts,
       |  CASE WHEN v.ts >= p.ts - INTERVAL $toleranceMinutes MINUTE
       |    THEN v.ts END AS asof_view_ts,
       |  CASE WHEN v.ts >= p.ts - INTERVAL $toleranceMinutes MINUTE
       |    THEN CAST(epoch_us(p.ts) // 1000000 AS BIGINT)
       |      - CAST(epoch_us(v.ts) // 1000000 AS BIGINT)
       |  END AS lag_seconds
       |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
       |  ON p.user_id = v.user_id AND v.ts <= p.ts""".stripMargin
}
