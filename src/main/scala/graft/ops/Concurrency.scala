package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Sweep-line interval concurrency — "how many orders had shipping in
  * flight at once, per month" — the overlap-counting primitive behind
  * capacity questions (concurrent sessions, open tickets, active
  * rentals) that a naive interval SELF-JOIN answers in O(n²).  Beyond
  * the reference surface, in the [[Changepoint]] monitoring family.
  *
  * The sweep-line shape: each order's shipping window [first ship day,
  * last ship day] contributes two DELTA events (+1 at start, −1 the day
  * AFTER the end — end day inclusive); concurrency on any day is the
  * prefix sum of deltas, and the answer is the per-month MAX of that
  * running value over observed delta days (concurrency is constant
  * between deltas, so every level change is observed by construction).
  *
  * Scale shape — the reason this pattern exists: intervals never meet
  * each other.  ONE lineitem scan feeds a map-side-combined
  * min/max-per-order aggregate (the only corpus-sized shuffle); the
  * delta explode doubles ORDER-count rows and immediately re-aggregates
  * to per-DAY cells — bounded by the calendar (~2.5k days for the
  * 7-year corpus), not the corpus — so the global ordered prefix-sum
  * window runs over calendar-bounded cells (the [[Changepoint]] /
  * cohort-LTV aggregated-cells convention; a finer-than-day grid would
  * bucket by coarse range first and carry per-bucket offsets).  An
  * interval self-join would shuffle n² pairs; the sweep-line moves 2n
  * deltas and sorts ~2.5k cells.
  *
  * Every value is an exact integer (counts), so the peaks hash-check
  * cross-engine.  ConcurrencySpec pins hand-built nest/chain/disjoint
  * layouts, the deltas-telescope-to-zero invariant, and a brute-force
  * day-by-day recount of the real corpus.
  */
object Concurrency {

  def activeOrders(spark: SparkSession, dir: String): DataFrame =
    peaksOf(Sources.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(to_date(min(col("l_shipdate"))).as("s"),
        to_date(max(col("l_shipdate"))).as("e")))

  /** Core over prepared (s, e) date intervals (end inclusive) —
    * spec-testable on synthetic layouts. */
  private[graft] def peaksOf(span: DataFrame): DataFrame = {
    val deltas = span.select(explode(array(
      struct(col("s").as("d"), lit(1L).as("delta")),
      struct(date_add(col("e"), 1).as("d"), lit(-1L).as("delta"))))
      .as("x"))
      .select(col("x.d").as("d"), col("x.delta").as("delta"))
    val daily = deltas.groupBy(col("d")).agg(sum(col("delta")).as("delta"))
    val run = daily.withColumn("conc",
      sum(col("delta")).over(Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    run.groupBy(date_trunc("month", col("d")).cast("date").as("mes"))
      .agg(max(col("conc")).as("peak_active"))
  }

  val activeOrdersOracle: String =
    """WITH span AS (
      |  SELECT l_orderkey, CAST(MIN(l_shipdate) AS DATE) AS s,
      |         CAST(MAX(l_shipdate) AS DATE) AS e
      |  FROM lineitem GROUP BY 1),
      |ev AS (
      |  SELECT s AS d, 1 AS delta FROM span
      |  UNION ALL
      |  SELECT e + 1 AS d, -1 AS delta FROM span),
      |daily AS (SELECT d, SUM(delta) AS delta FROM ev GROUP BY 1),
      |run AS (
      |  SELECT d, CAST(SUM(delta) OVER (ORDER BY d) AS BIGINT) AS conc
      |  FROM daily)
      |SELECT CAST(DATE_TRUNC('month', d) AS DATE) AS mes,
      |  MAX(conc) AS peak_active
      |FROM run GROUP BY 1""".stripMargin
}
