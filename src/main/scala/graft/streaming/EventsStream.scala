package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Frag

/** Structured Streaming demonstration over the events table.
  *
  * The reference has NO streaming surface (SURVEY.md §2.10) — its
  * "incremental" behavior is batch recomputation of the current month with
  * delete-then-insert idempotency.  This module shows the Spark-native
  * upgrade path: the same tumbling-window aggregation expressed once and
  * runnable in either mode, with watermarked late-data handling in
  * streaming.
  *
  * Scale notes: the aggregation keys on (window, event_type) so state is
  * bounded by (watermark horizon / window size) × type cardinality; the
  * watermark lets Spark drop state for closed windows.
  */
object EventsStream {

  /** Tumbling daily aggregate — works on a batch OR streaming frame. */
  def dailyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        expr(Frag.sumMoney(Frag.money("value"))).as("valor"))
      .select(to_date(col("w.start")).as("dia"), col("event_type"),
        col("n_events"), col("valor"))

  /** Streaming variant with a 1-day watermark for late events. */
  def dailyAggStream(events: DataFrame): DataFrame =
    dailyAgg(events.withWatermark("ts", "1 day"))

  /** Batch-mode oracle (windows are epoch-aligned, so a daily tumbling
    * window start equals date_trunc('day')). */
  val dailyAggOracle: String =
    s"""SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS dia, event_type,
       |  COUNT(*) AS n_events,
       |  ${Frag.sumMoney(Frag.money("value"))} AS valor
       |FROM events GROUP BY 1, 2""".stripMargin
}
