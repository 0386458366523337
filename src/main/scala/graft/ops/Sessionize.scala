package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Batch gap-based sessionization of the events log — the batch twin of
  * the streaming session windows
  * ([[graft.streaming.EventsStream]] sessionize): a user's events belong
  * to one session until a silence longer than `gapSec` splits them.  The
  * classic two-window recipe: LAG finds each event's silence, a running
  * SUM of the break flags numbers the sessions — both over the SAME
  * (user_id) partitioning, so the corpus is exchanged exactly once.
  *
  * The registered output is the session-SIZE histogram (sessions,
  * distinct users, exact total/max duration per size) rather than the
  * per-session frame: bounded rows, every cell an exact integer, and
  * it pins the quantity capacity planning actually reads (how long is
  * the tail of marathon sessions).
  *
  * Determinism: the per-user order is (epoch second, event_id) — a total
  * order, so session numbering is reproducible across engines and
  * partitionings; ties at the same second share a session regardless of
  * order because their gap is zero.
  *
  * Scale: ONE user_id exchange carries both windows (Spark plans a
  * single Sort + two WindowExecs, no second shuffle); the session
  * rollup reuses the same partitioning via partial aggregation, and the
  * histogram is ≤ max-session-size rows.  No corpus-sized state:
  * this is exactly the shape that replaces the driver-side groupby-loop
  * sessionizers pandas pipelines use. */
object Sessionize {

  def sessionHistogram(spark: SparkSession, dir: String,
      gapSec: Int = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("sec"), col("event_id"))
    val running = byUser
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Sources.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("bigint").as("sec"))
      .withColumn("prev", lag(col("sec"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev").isNull || col("sec") - col("prev") > gapSec, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(running))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("session_events"),
        (max(col("sec")) - min(col("sec"))).as("dur"))
      .groupBy(col("session_events"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("dur")).as("total_duration_sec"),
        max(col("dur")).as("max_duration_sec"))
  }

  def sessionHistogramOracle(gapSec: Int = 1800): String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id,
       |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
       |  FROM events),
       |g AS (
       |  SELECT user_id, event_id, sec,
       |    CASE WHEN LAG(sec) OVER w IS NULL
       |           OR sec - LAG(sec) OVER w > $gapSec
       |         THEN 1 ELSE 0 END AS brk
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
       |n AS (
       |  SELECT user_id, sec,
       |    SUM(brk) OVER (PARTITION BY user_id ORDER BY sec, event_id
       |                   ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM g),
       |s AS (
       |  SELECT user_id, sid, COUNT(*) AS session_events,
       |    MAX(sec) - MIN(sec) AS dur
       |  FROM n GROUP BY 1, 2)
       |SELECT CAST(session_events AS BIGINT) AS session_events,
       |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(SUM(dur) AS BIGINT) AS total_duration_sec,
       |  CAST(MAX(dur) AS BIGINT) AS max_duration_sec
       |FROM s GROUP BY 1""".stripMargin
}
