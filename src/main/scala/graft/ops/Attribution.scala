package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** First-touch revenue attribution — the marketing-analytics staple: every
  * user's purchase revenue is credited to the channel (event type) of the
  * user's FIRST-ever event, answering "which front door brought the money
  * in".
  *
  * Scale design: ONE shuffle on user_id does all the per-user work — a
  * single aggregation computes the first event (MIN over a comparison
  * struct, the [[OperatorQueries.keepLatest]] recipe in reverse: partial
  * MIN runs map-side, so the exchange carries one candidate per user per
  * map partition, never the event log) AND the user's purchase totals in
  * the same pass.  The per-channel rollup that follows sees one row per
  * user, and its output is #channels rows.  No window, no self-join, no
  * second scan of events.
  *
  * Determinism: event ordering is (epoch second, event_id) — the
  * sessionize convention.  The raw nanosecond timestamps would order
  * differently across engines once Spark truncates to micros, so both
  * engines compare the SAME integer second and break ties on the unique
  * event_id; the comparison struct's trailing field (the channel string)
  * can never decide a comparison.  Purchase money is decimal-exact cents
  * ([[Frag]]); users without purchases contribute zero, keeping the
  * channel totals a partition of overall revenue.
  */
object Attribution {

  def firstTouch(spark: SparkSession, dir: String): DataFrame =
    firstTouchOf(Sources.events(spark, dir)
      .select(col("user_id"),
        col("ts").cast("bigint").as("sec"),
        col("event_id"), col("event_type"),
        expr(Frag.money("value")).as("cents")))

  /** Core over a prepared (user_id, sec, event_id, event_type, cents)
    * frame — spec-testable on synthetic histories. */
  private[graft] def firstTouchOf(ev: DataFrame): DataFrame = {
    val perUser = ev
      .groupBy("user_id")
      .agg(
        min(struct(col("sec"), col("event_id"), col("event_type")))
          .as("first_ev"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"),
        sum(when(col("event_type") === "purchase", col("cents")))
          .as("purchase_cents"))
    perUser
      .groupBy(col("first_ev.event_type").as("first_channel"))
      .agg(count(lit(1)).as("users"),
        sum("purchases").cast("bigint").as("purchases"),
        expr(s"${Frag.sumMoney("COALESCE(purchase_cents, 0)")}")
          .as("attributed"))
  }

  /** Linear multi-touch attribution — [[firstTouch]]'s fairer sibling:
    * each purchase's revenue is split EQUALLY across the distinct
    * channels the user touched strictly before it (no prior touches →
    * the 'direct' channel).  The split is exact to the cent via the
    * largest-remainder rule: base = cents DIV k to every channel, plus
    * one cent to the first (cents MOD k) channels in alphabetical
    * order — all integer arithmetic, so per-channel credits sum to
    * total purchase revenue EXACTLY (spec-pinned) and hash-check
    * cross-engine.  A float split would neither tile nor reproduce.
    *
    * Scale: ONE user_id exchange; the prior-channel set is a running
    * `collect_set` window whose state is bounded by the CHANNEL DOMAIN
    * (≤ #event types, not history length — the same bounded-state
    * argument as streaming dedup), ordered by the engine-wide
    * (sec, event_id) convention.  The explode emits ≤ k rows per
    * purchase and the rollup is #channels-sized.  The oracle reaches
    * the same credits through an independent purchase×history
    * self-join formulation. */
  def linearTouch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    linearTouchOf(Sources.events(spark, dir)
      .select(col("user_id"),
        col("ts").cast("bigint").as("sec"),
        col("event_id"), col("event_type"),
        expr("money_cents(value)").as("cents")))
  }

  private[graft] def linearTouchOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("chans", array_sort(collect_set(
        when(col("event_type") =!= "purchase", col("event_type"))).over(w)))
      .filter(col("event_type") === "purchase")
      .withColumn("chans", when(size(col("chans")) === 0,
        array(lit("direct"))).otherwise(col("chans")))
      .withColumn("k", size(col("chans")).cast("long"))
      .select(col("event_id"), col("cents"), col("k"),
        posexplode(col("chans")).as(Seq("pos", "channel")))
      .withColumn("credit",
        expr("cents DIV k + CAST(pos < cents % k AS BIGINT)"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("credit")).as("credited_cents"))
  }

  val linearTouchOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
       |    event_id, event_type,
       |    CAST(${Frag.money("value")} * 100 AS BIGINT) AS cents
       |  FROM events),
       |p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
       |t AS (
       |  SELECT DISTINCT p.event_id, e.event_type AS channel
       |  FROM p JOIN ev e ON e.user_id = p.user_id
       |    AND e.event_type <> 'purchase'
       |    AND (e.sec < p.sec
       |         OR (e.sec = p.sec AND e.event_id < p.event_id))),
       |tt AS (
       |  SELECT p.event_id, p.cents, COALESCE(t.channel, 'direct') AS channel
       |  FROM p LEFT JOIN t USING (event_id)),
       |r AS (
       |  SELECT event_id, cents, channel,
       |    COUNT(*) OVER (PARTITION BY event_id) AS k,
       |    ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY channel) AS rnk
       |  FROM tt)
       |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       |  CAST(SUM(cents // k
       |    + CASE WHEN rnk <= cents % k THEN 1 ELSE 0 END) AS BIGINT)
       |    AS credited_cents
       |FROM r GROUP BY 1""".stripMargin

  val firstTouchOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
       |    event_id, event_type, ${Frag.money("value")} AS cents
       |  FROM events),
       |firsts AS (
       |  SELECT user_id, event_type AS first_channel,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY sec, event_id) AS rn
       |  FROM ev),
       |per_user AS (
       |  SELECT user_id,
       |    COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       |    SUM(CASE WHEN event_type = 'purchase' THEN cents END)
       |      AS purchase_cents
       |  FROM ev GROUP BY 1)
       |SELECT f.first_channel, COUNT(*) AS users,
       |  CAST(SUM(p.purchases) AS BIGINT) AS purchases,
       |  ${Frag.sumMoney("COALESCE(p.purchase_cents, 0)")} AS attributed
       |FROM firsts f JOIN per_user p ON f.user_id = p.user_id
       |WHERE f.rn = 1
       |GROUP BY 1""".stripMargin
}
