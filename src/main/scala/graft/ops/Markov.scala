package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Sources

/** First-order Markov transition matrix over per-user event sequences —
  * the "what do users do next" model behind journey analysis, next-action
  * prediction, and anomaly scoring on clickstreams.  (The reference has no
  * sequence operator; this extends its event-log analytics the same way
  * [[Attribution]] does.)
  *
  * Scale design: ONE shuffle on user_id orders each user's history for the
  * LEAD pairing (per-user partitions are session-history sized, never the
  * corpus — the [[graft.streaming.EventsStream.sessionize]] shape); the
  * transition aggregation that follows is map-side-combined down to at
  * most #event_types² rows, and the row-probability normalization joins
  * the #event_types-row totals back by broadcast.  No self-join of the
  * event log, no second scan.
  *
  * Determinism: event order is (epoch second, event_id) — the sessionize
  * convention, immune to the nanos-vs-micros precision split.  Transition
  * counts are exact integers; each probability is ONE correctly-rounded
  * IEEE division of two exact integers, shared verbatim with the oracle
  * (the cosine/z-score precedent), rounded to 6dp at output.
  */
object Markov {

  /** Shared verbatim with the oracle: one exact-operand IEEE division. */
  private val ProbExpr = "ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6)"

  def transitions(spark: SparkSession, dir: String): DataFrame =
    transitionsOf(Sources.events(spark, dir)
      .select(col("user_id"), col("ts").cast("bigint").as("sec"),
        col("event_id"), col("event_type")))

  /** Core over a prepared (user_id, sec, event_id, event_type) frame —
    * spec-testable on synthetic histories.
    *
    * The from-row totals are a window over the ALREADY AGGREGATED
    * transition counts (≤ #event_types² rows), not a groupBy+join-back:
    * a derived-aggregate join would re-execute the event scan and the
    * user_id exchange a second time (the plan is lazy — the audit showed
    * exactly that before this form). */
  private[graft] def transitionsOf(ev: DataFrame): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val byFrom = Window.partitionBy("from_type")
    ev
      .withColumn("to_type", lead(col("event_type"), 1).over(byTime))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("tot", sum("n").over(byFrom))
      .select(col("from_type"), col("to_type"), col("n"),
        expr(ProbExpr).as("p"))
  }

  /** Top entry paths: each user's first [[k]] event types joined into a
    * path string, counted across users — the journey-analysis rollup on
    * top of the transition matrix ("how do users actually start").
    *
    * Scale shape: ONE user_id shuffle ranks events (same window as the
    * matrix); only rank ≤ k rows survive into the per-user aggregation,
    * so collect_list holds at most k structs per user — never the
    * history.  The path rollup that follows is map-side combined over at
    * most #types^k distinct strings.
    *
    * Determinism: the k structs are array_sort'ed on (sec, event_id)
    * inside the aggregation (collect_list order is partition-dependent),
    * and DuckDB's STRING_AGG(... ORDER BY sec, event_id) matches the
    * same total order.
    */
  def topPaths(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    topPathsOf(Sources.events(spark, dir)
      .select(col("user_id"), col("ts").cast("bigint").as("sec"),
        col("event_id"), col("event_type")), k)

  private[graft] def topPathsOf(ev: DataFrame, k: Int): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("sec", "event_id")
    ev
      .withColumn("rn", row_number().over(byTime))
      .where(col("rn") <= k)
      .groupBy("user_id")
      .agg(concat_ws(">",
        expr("transform(array_sort(collect_list(struct(sec, event_id, " +
          "event_type))), x -> x.event_type)")).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).cast("bigint").as("users"))
  }

  def topPathsOracle(k: Int = 3): String =
    s"""WITH raw AS (
       |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
       |    event_id, event_type
       |  FROM events),
       |ev AS (
       |  SELECT user_id, sec, event_id, event_type,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY sec, event_id) AS rn
       |  FROM raw),
       |paths AS (
       |  SELECT user_id,
       |    STRING_AGG(event_type, '>' ORDER BY sec, event_id) AS path
       |  FROM ev WHERE rn <= $k GROUP BY 1)
       |SELECT path, CAST(COUNT(*) AS BIGINT) AS users
       |FROM paths GROUP BY 1""".stripMargin

  val transitionsOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
       |    event_id, event_type
       |  FROM events),
       |tr AS (
       |  SELECT event_type AS from_type,
       |    LEAD(event_type) OVER (PARTITION BY user_id
       |      ORDER BY sec, event_id) AS to_type
       |  FROM ev),
       |c AS (
       |  SELECT from_type, to_type, COUNT(*) AS n
       |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |t AS (
       |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
       |  FROM c GROUP BY 1)
       |SELECT c.from_type, c.to_type, c.n, $ProbExpr AS p
       |FROM c JOIN t ON c.from_type = t.from_type""".stripMargin
}
