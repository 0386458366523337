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

  /** Log₂-bucketed inter-event gap histogram — the distribution the
    * [[sessionHistogram]] gap threshold should be READ OFF: per user the
    * silence before each event, bucketed by binary order of magnitude
    * (bucket b holds gaps in [2^b − 1, 2^(b+1) − 1)), with exact min/max
    * per bucket and the share of all gaps.  A clean bimodal histogram
    * (intra-session seconds vs inter-session hours) justifies the
    * threshold; a flat one says gap sessionization is the wrong model.
    *
    * The bucket is `length(bin(gap + 1)) − 1` — the BIT LENGTH, exact
    * integer arithmetic in both engines, deliberately not
    * `floor(log2(x))`, whose last-ULP rounding at exact powers of two is
    * not guaranteed to agree across engines.
    *
    * Scale: the same single user_id exchange as [[sessionHistogram]];
    * the histogram is ≤ 40 rows and the share's global window runs over
    * those rows only. */
  def gapHistogram(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("sec"), col("event_id"))
    Sources.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("bigint").as("sec"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(byUser))
      .filter(col("gap").isNotNull)
      .withColumn("bucket",
        expr("CAST(length(bin(gap + 1)) - 1 AS INT)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_gap_sec"),
        max(col("gap")).as("max_gap_sec"))
      .withColumn("share", expr("ROUND(n_gaps / CAST(SUM(n_gaps) OVER ()" +
        " AS DOUBLE), 6)"))
  }

  def gapHistogramOracle(): String =
    """WITH ev AS (
      |  SELECT user_id, event_id,
      |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
      |  FROM events),
      |g AS (
      |  SELECT sec - LAG(sec) OVER (PARTITION BY user_id
      |                              ORDER BY sec, event_id) AS gap
      |  FROM ev),
      |b AS (
      |  SELECT CAST(length(bin(gap + 1)) - 1 AS INT) AS bucket, gap
      |  FROM g WHERE gap IS NOT NULL),
      |h AS (
      |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |    CAST(MIN(gap) AS BIGINT) AS min_gap_sec,
      |    CAST(MAX(gap) AS BIGINT) AS max_gap_sec
      |  FROM b GROUP BY 1)
      |SELECT bucket, n_gaps, min_gap_sec, max_gap_sec,
      |  ROUND(n_gaps / CAST(SUM(n_gaps) OVER () AS DOUBLE), 6) AS share
      |FROM h""".stripMargin
}
