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

  /** Daily revenue cells for the streaming anomaly monitor — the
    * stateful stage of [[graft.ops.Changepoint.anomalyDays]]'s streaming
    * twin.  State is the same bounded (window × type) shape as
    * [[dailyAgg]]; the trailing-window z² scoring is the SINK's job
    * (foreachBatch over the emitted cells — a trailing comparison is
    * not incrementally maintainable under append semantics because a
    * late event rewrites its day's total and every window containing
    * it, the [[trendingTopK]] sink-side-ranking argument).  Works on a
    * batch OR streaming frame. */
  def anomalyCells(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(expr(s"CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT)")
        .as("t"))
      .select(col("event_type"), to_date(col("w.start")).as("day"),
        col("t"))

  def anomalyCellsStream(events: DataFrame): DataFrame =
    anomalyCells(events.withWatermark("ts", "1 day"))

  /** Batch evaluation for the driver gate: streamed cells + the
    * sink-side scoring, sharing [[graft.ops.Changepoint]]'s oracle. */
  def anomalyFromEvents(events: DataFrame): DataFrame =
    graft.ops.Changepoint.anomalyDaysOf(anomalyCells(events))

  /** Daily distinct users via the engine's mergeable
    * [[graft.functions.HllSketch]] next to the exact count.  The sketch
    * buffer is what the streaming state store keeps per window — 64 bytes
    * per day instead of a growing distinct-user set, so state is O(1) per
    * window at any traffic volume (StreamingSpec proves streaming ≡ batch;
    * the micro-batch cut points are invisible because sketch merge is an
    * elementwise max).  Batch-evaluated here for the driver gate, same as
    * [[dailyAgg]]; DuckDB reproduces the estimate bit-for-bit. */
  def dailyDistinct(events: DataFrame): DataFrame = {
    graft.functions.HllSketch.register(events.sparkSession)
    events
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(round(expr("hll_distinct(user_id)"), 4).as("users_hll"),
        count_distinct(col("user_id")).as("users_exact"))
      .select(to_date(col("w.start")).as("dia"), col("users_hll"),
        col("users_exact"))
  }

  /** Streaming daily distinct users — HLL only: Spark refuses exact
    * DISTINCT aggregation on streams (unbounded per-window state), which
    * is exactly the gap the 64-byte mergeable sketch closes.  The batch
    * [[dailyDistinct]] keeps the exact column alongside for the oracle's
    * error-band evidence. */
  def dailyDistinctStream(events: DataFrame): DataFrame = {
    graft.functions.HllSketch.register(events.sparkSession)
    events.withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(round(expr("hll_distinct(user_id)"), 4).as("users_hll"))
      .select(to_date(col("w.start")).as("dia"), col("users_hll"))
  }

  /** Streaming exactly-once dedup: repeated event ids within the watermark
    * horizon are dropped; state is bounded because ids older than the
    * watermark are expired.  This is the ingestion-side guard an
    * at-least-once source needs before the corpus-level dedup operators
    * ([[graft.llm.Dedup]]) run downstream. */
  def dedupeStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 day").dropDuplicates("event_id")

  /** A closed user session: contiguous events with gaps below the
    * sessionization threshold. */
  case class UserSession(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long,
      total_value: Double)

  /** `private[streaming]`, not `private`: Scala `private` emits a
    * package-private CLASS FILE, and the state-store serializer Spark
    * codegens for `flatMapGroupsWithState` lives in another package —
    * janino then rejects every accessor as inapplicable and the query
    * dies on its first REAL stream (batch evaluation, which the driver
    * gate uses, never touches the state serializer; found by the r13
    * `streambench` probe).  Scala-level privacy stays; the bytecode
    * becomes public, which is what the generated serializer needs. */
  private[streaming] case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /** Custom stateful streaming: gap-based sessionization via
    * `flatMapGroupsWithState` (the reference has no streaming at all; this
    * is the Spark-native upgrade path for per-key custom state).  State per
    * user is O(1) — start/last/count/sum — and is dropped via processing-
    * time timeout once a session closes, so state size is bounded by the
    * number of concurrently-active users regardless of stream length.
    *
    * Works on a streaming Dataset (Update mode) and, for tests/batch
    * backfill, on a bounded one.
    *
    * Spark 4.1.2 operational note (found by the r13 `streambench`
    * probe): the engine dies planning a NO-DATA micro-batch over
    * `flatMapGroupsWithState` ([INTERNAL_ERROR] NPE building the exec
    * node's metrics with no active session).  No-data batches are how
    * an IDLE stream fires processing-time timeouts, so on this Spark
    * version run sessionize with
    * `spark.sql.streaming.noDataMicroBatches.enabled=false` — trailing
    * sessions then close on the next data batch instead of on wall
    * clock, which is the usual trade on engines without idle triggers.
    */
  def sessionize(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      gapMinutes: Int = 30): org.apache.spark.sql.Dataset[UserSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapMs = gapMinutes.toLong * 60 * 1000

    def flush(userId: Long, events: Iterator[(Long, Double)],
        state: GroupState[SessionState]): Iterator[UserSession] = {
      val sorted = events.toSeq.sortBy(_._1)
      var st = state.getOption.orNull
      val closed = Seq.newBuilder[UserSession]
      sorted.foreach { case (ts, v) =>
        st match {
          case null =>
            st = SessionState(ts, ts, 1, v)
          case s if ts - s.last <= gapMs =>
            st = SessionState(s.start, ts, s.n + 1, s.total + v)
          case s =>
            closed += UserSession(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.total)
            st = SessionState(ts, ts, 1, v)
        }
      }
      if (st != null) {
        if (state.hasTimedOut) {
          // Timeout callback (empty input iterator): the trailing session's
          // gap elapsed with no new events — emit it and drop the state so
          // per-user state is actually bounded.
          closed += UserSession(userId, new java.sql.Timestamp(st.start),
            new java.sql.Timestamp(st.last), st.n, st.total)
          state.remove()
        } else {
          state.update(st)
          // Without arming the timeout, hasTimedOut could never fire and
          // trailing sessions would be held (and state leaked) forever.
          // Processing time approximates the event-time gap here; a
          // watermark + EventTimeTimeout is the strict variant.  In batch
          // evaluation this is a legal no-op.
          state.setTimeoutDuration(gapMs)
        }
      }
      closed.result().iterator
    }

    events
      .selectExpr("user_id", "CAST(ts AS BIGINT) * 1000 AS ts_ms", "value")
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(
        (k: Long, it: Iterator[(Long, Long, Double)],
            st: GroupState[SessionState]) =>
          flush(k, it.map(t => (t._2, t._3)), st))
  }

  /** Streaming → idempotent table: lands each micro-batch through the
    * same keyed-overwrite sink the batch pipelines use
    * ([[graft.core.Sinks.overwriteByKey]]), so late data or a replayed
    * batch repairs its partitions instead of duplicating them — the
    * streaming continuation of the reference's delete-then-insert
    * idempotency contract.
    *
    * The partition keys MUST match the update granularity: update mode
    * emits only the changed (day, type) groups, so overwriting at coarser
    * grain (day alone) would wipe the day's untouched groups.
    */
  def writeDailyAgg(events: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    dailyAggStream(events)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.core.Sinks.overwriteByKey(batch.toDF(), path,
          Seq("dia", "event_type"))
      }
      .start()

  /** Conversion attribution as an interval JOIN: every `purchase` a user
    * makes within `windowMinutes` of their `view` (inclusive bounds).
    *
    * Works on batch OR streaming frames.  As a stream-stream join, each
    * side is watermarked and the join condition carries the explicit time
    * bound, so Spark can expire buffered state once the watermark passes
    * `view.ts + window` — state is bounded by (watermark horizon ×
    * arrival rate), never the whole stream.  StreamingSpec proves
    * streaming ≡ batch on the same input.
    *
    * Scale notes: the join is an equi-join on user_id with the interval as
    * a residual predicate — it shuffles both sides by user (or streams
    * per-user state in streaming mode); there is no cross product.
    */
  def conversions(views: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val v = views.select(col("user_id"), col("event_id").as("view_event_id"),
      col("ts").as("view_ts"))
    val p = purchases.select(col("user_id").as("p_user_id"),
      col("event_id").as("purchase_event_id"), col("ts").as("purchase_ts"))
    v.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") +
            expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("view_event_id"), col("purchase_event_id"),
        col("view_ts"), col("purchase_ts"),
        // Whole-second lag, the cross-engine-stable convention
        // ([[sessionizeOracle]]): CAST(ts AS BIGINT) is epoch seconds.
        (col("purchase_ts").cast("bigint") - col("view_ts").cast("bigint"))
          .as("lag_seconds"))
  }

  /** Batch evaluation over the events table (the registered query). */
  def conversionsFromEvents(events: DataFrame,
      windowMinutes: Int = 30): DataFrame =
    conversions(events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "purchase"), windowMinutes)

  /** Streaming variant: both sides watermarked; append mode.  The
    * watermark horizon must cover the join window plus allowed lateness. */
  def conversionsStream(events: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val wm = events.withWatermark("ts", s"${2 * windowMinutes} minutes")
    conversions(wm.filter(col("event_type") === "view"),
      wm.filter(col("event_type") === "purchase"), windowMinutes)
  }

  /** LEFT-OUTER conversion join: every view emits a row, converted or
    * not — the funnel-leak view the inner join can't give ("which
    * impressions never turned into money").  Streaming, this is the
    * state-timeout shape: Spark holds an unmatched view in the join
    * state until the watermark passes view_ts + window and only then
    * emits the NULL-extended row (so outer results are late by exactly
    * the watermark horizon — the price of correctness under late data;
    * StreamingSpec advances the watermark with a sentinel event and
    * proves streamed ≡ batch including the unmatched rows).  Batch, it
    * is the same interval condition with left_outer.  The converted
    * flag is integer; lag is NULL on unconverted views. */
  def conversionsOuter(views: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val v = views.select(col("user_id"), col("event_id").as("view_event_id"),
      col("ts").as("view_ts"))
    val p = purchases.select(col("user_id").as("p_user_id"),
      col("event_id").as("purchase_event_id"), col("ts").as("purchase_ts"))
    v.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") +
            expr(s"INTERVAL $windowMinutes MINUTES"),
        "left_outer")
      .select(col("user_id"), col("view_event_id"),
        col("purchase_event_id"),
        when(col("purchase_event_id").isNotNull, 1L).otherwise(0L)
          .cast("bigint").as("converted"),
        (col("purchase_ts").cast("bigint") - col("view_ts").cast("bigint"))
          .as("lag_seconds"))
  }

  /** Batch evaluation over the events table (the registered query). */
  def conversionsOuterFromEvents(events: DataFrame,
      windowMinutes: Int = 30): DataFrame =
    conversionsOuter(events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "purchase"), windowMinutes)

  /** Streaming variant — both sides watermarked (required for outer
    * state eviction); append mode. */
  def conversionsOuterStream(events: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val wm = events.withWatermark("ts", s"${2 * windowMinutes} minutes")
    conversionsOuter(wm.filter(col("event_type") === "view"),
      wm.filter(col("event_type") === "purchase"), windowMinutes)
  }

  def conversionsOuterOracle(windowMinutes: Int = 30): String =
    s"""SELECT v.user_id, v.event_id AS view_event_id,
       |  p.event_id AS purchase_event_id,
       |  CAST(CASE WHEN p.event_id IS NOT NULL THEN 1 ELSE 0 END
       |    AS BIGINT) AS converted,
       |  CAST(epoch_us(p.ts) // 1000000 AS BIGINT)
       |    - CAST(epoch_us(v.ts) // 1000000 AS BIGINT) AS lag_seconds
       |FROM (SELECT * FROM events WHERE event_type = 'view') v
       |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
       |  ON v.user_id = p.user_id
       | AND p.ts >= v.ts
       | AND p.ts <= v.ts + INTERVAL $windowMinutes MINUTE""".stripMargin

  /** DuckDB oracle for [[conversionsFromEvents]] — the same interval
    * equi-join.  Raw micro timestamps are cross-engine safe: both engines
    * truncate the parquet TIMESTAMP(NANOS) to microseconds (verified
    * bit-for-bit over the corpus).  The lag uses exact integer epoch
    * microseconds (`epoch_us(ts) // 1e6` ≡ Spark's `CAST(ts AS BIGINT)`
    * for positive timestamps) — a float `epoch()` could round across a
    * whole-second boundary before flooring. */
  def conversionsOracle(windowMinutes: Int = 30): String =
    s"""SELECT v.user_id, v.event_id AS view_event_id,
       |  p.event_id AS purchase_event_id,
       |  v.ts AS view_ts, p.ts AS purchase_ts,
       |  CAST(epoch_us(p.ts) // 1000000 AS BIGINT)
       |    - CAST(epoch_us(v.ts) // 1000000 AS BIGINT) AS lag_seconds
       |FROM (SELECT * FROM events WHERE event_type = 'view') v
       |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
       |  ON v.user_id = p.user_id
       | AND p.ts >= v.ts
       | AND p.ts <= v.ts + INTERVAL $windowMinutes MINUTE""".stripMargin

  /** Batch-mode oracle (windows are epoch-aligned, so a daily tumbling
    * window start equals date_trunc('day')). */
  val dailyAggOracle: String =
    s"""SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS dia, event_type,
       |  COUNT(*) AS n_events,
       |  ${Frag.sumMoney(Frag.money("value"))} AS valor
       |FROM events GROUP BY 1, 2""".stripMargin

  /** SLIDING (hopping) window aggregate — the window shape [[dailyAgg]]'s
    * tumbling form can't express: a 24 h window advancing every 12 h, so
    * every event lands in EXACTLY TWO windows and each window overlaps
    * half of its neighbor (the "last 24 h, refreshed twice a day"
    * dashboard primitive).  Uses Spark's native `window(ts, width, slide)`
    * — in streaming the state is (horizon/slide) × types rows, same
    * bounded-state story as the tumbling form, and the watermark closes a
    * window `slide` after its last-contained event.
    *
    * The window start crosses the gate as EPOCH SECONDS: both engines
    * floor the same integer second to the 12 h grid (`(sec // 43200) *
    * 43200` — UTC-aligned, timezone-free), where a rendered TIMESTAMP
    * would hang the hash on engine formatting.  StreamingSpec proves the
    * streamed run across arbitrary micro-batch cuts ≡ this batch form and
    * the exactly-two-windows invariant. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "24 hours", "12 hours").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        expr(Frag.sumMoney(Frag.money("value"))).as("valor"))
      .select(col("w.start").cast("bigint").as("ws_sec"), col("event_type"),
        col("n_events"), col("valor"))

  /** Streaming variant: watermark ≥ width so late events within a day
    * still land; append emits a window once the watermark passes its end. */
  def slidingAggStream(events: DataFrame): DataFrame =
    slidingAgg(events.withWatermark("ts", "24 hours"))

  /** Each event replicated to its two containing window starts — the
    * slide-aligned floor and the one before it. */
  val slidingAggOracle: String =
    s"""WITH ev AS (
       |  SELECT event_type, value,
       |    (CAST(FLOOR(epoch(ts)) AS BIGINT) // 43200) * 43200 AS w1
       |  FROM events),
       |e2 AS (
       |  SELECT event_type, value, w1 AS ws_sec FROM ev
       |  UNION ALL
       |  SELECT event_type, value, w1 - 43200 AS ws_sec FROM ev)
       |SELECT ws_sec, event_type, COUNT(*) AS n_events,
       |  ${Frag.sumMoney(Frag.money("value"))} AS valor
       |FROM e2 GROUP BY 1, 2""".stripMargin

  /** Trending top-K: the K most frequent event types per day window —
    * the dashboard/alerting staple on any event stream.  The STATEFUL
    * stage is the windowed count ([[dailyAgg]]'s shape: watermark +
    * window keeps per-(day, type) state bounded); the ranking stage runs
    * over the already-aggregated rows — #types per day, metadata-sized —
    * which in a live stream happens in `foreachBatch` on each emitted
    * window (a rank is not incrementally maintainable under append
    * semantics: a late event can reorder the board, so the sink owns the
    * final sort — the same split every streaming leaderboard uses).
    * Batch-evaluated for the driver gate like every streaming entry.
    * Ties break (count DESC, type ASC) — a total order, deterministic
    * cross-engine. */
  def trendingTopK(events: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(to_date(col("w.start")).as("dia"), col("event_type"),
        col("n_events"))
    val w = Window.partitionBy(col("dia"))
      .orderBy(col("n_events").desc, col("event_type").asc)
    daily.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("dia"), col("rnk"), col("event_type"), col("n_events"))
  }

  /** Streaming variant of [[trendingTopK]]'s stateful stage (the window
    * counts; ranking lives in the sink per the scaladoc above). */
  def trendingTopKStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(to_date(col("w.start")).as("dia"), col("event_type"),
        col("n_events"))

  def trendingTopKOracle(k: Int = 3): String =
    s"""WITH d AS (
       |  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS dia, event_type,
       |    COUNT(*) AS n_events
       |  FROM events GROUP BY 1, 2),
       |r AS (
       |  SELECT dia, event_type, n_events,
       |    ROW_NUMBER() OVER (PARTITION BY dia
       |                       ORDER BY n_events DESC, event_type ASC) AS rnk
       |  FROM d)
       |SELECT dia, CAST(rnk AS INT) AS rnk, event_type, n_events
       |FROM r WHERE rnk <= $k""".stripMargin

  /** Stream-static dimension enrichment — the remaining Structured
    * Streaming join mode after the stream-stream interval join
    * ([[conversionsFromEvents]]): each micro-batch hash-joins the STATIC
    * customer dimension, re-read per trigger (so a slowly-changing dim is
    * picked up at the next batch) — no state store involved, unlike the
    * stream-stream case.  The dim side is an explicit broadcast: at 100 TB
    * of stream the customers table is dwarfed by the fact stream, so the
    * join is map-side and the only stream-side shuffle is the windowed
    * aggregation's own exchange.  Batch-evaluated for the driver gate like
    * every streaming entry; StreamingSpec proves streaming ≡ batch through
    * MemoryStream. */
  def enrichBySegment(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(broadcast(customers.select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segmento"))), Seq("user_id"), "left")
      .groupBy(window(col("ts"), "1 day").as("w"), col("segmento"))
      .agg(count(lit(1)).as("n_events"),
        expr(Frag.sumMoney(Frag.money("value"))).as("valor"))
      .select(to_date(col("w.start")).as("dia"), col("segmento"),
        col("n_events"), col("valor"))

  /** Streaming form: watermarked stream side, same plan otherwise. */
  def enrichBySegmentStream(events: DataFrame,
      customers: DataFrame): DataFrame =
    enrichBySegment(events.withWatermark("ts", "1 day"), customers)

  val enrichOracle: String =
    s"""SELECT CAST(DATE_TRUNC('day', e.ts) AS DATE) AS dia,
       |  c.c_mktsegment AS segmento,
       |  COUNT(*) AS n_events,
       |  ${Frag.sumMoney(Frag.money("e.value"))} AS valor
       |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
       |GROUP BY 1, 2""".stripMargin

  /** DuckDB mirror of [[dailyDistinct]] — the
    * [[graft.functions.HllSketch]] register math per day (same spelling as
    * `AnalyticsQueries.hllDistinctOracle`, grouped by the window day). */
  val dailyDistinctOracle: String = {
    val mix = graft.functions.Mix31.duckSql("user_id")
    s"""WITH h AS (
       |  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS dia, $mix AS h
       |  FROM events),
       |rw AS (SELECT dia, h & 63 AS reg, h >> 6 AS w FROM h),
       |regs AS (
       |  SELECT dia, reg,
       |    MAX(CASE WHEN w = 0 THEN 26
       |             ELSE 1 + bit_count((w & -w) - 1) END) AS rho
       |  FROM rw GROUP BY dia, reg),
       |est AS (
       |  SELECT dia,
       |    0.709::DOUBLE * 64 * 64 /
       |      (64 - COUNT(*) + SUM(1.0::DOUBLE / (1::BIGINT << rho))) AS est
       |  FROM regs GROUP BY dia),
       |ex AS (
       |  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS dia,
       |    COUNT(DISTINCT user_id) AS users_exact
       |  FROM events GROUP BY 1)
       |SELECT e.dia, ROUND(e.est, 4) AS users_hll, ex.users_exact
       |FROM est e JOIN ex USING (dia)""".stripMargin
  }

  /** [[sessionize]] projected onto its oracle-stable columns.  `total_value`
    * is excluded from the hash-checked surface on purpose: it is an ordered
    * float fold whose rounding no independent engine reproduces bit-for-bit
    * (it stays covered by StreamingSpec); boundaries and counts are integer/
    * timestamp-exact in both engines. */
  def sessionizeSummary(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes).toDF()
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))

  /** Batch-mode oracle for [[sessionizeSummary]]: the classic
    * gaps-and-islands formulation (LAG boundary flags + running SUM as the
    * session id — the same window shapes as reference W2/W3,
    * `utils/client_responsibility.py:55`).  Two deliberate mirrors of the
    * Spark semantics: timestamps floor to whole SECONDS (`CAST(ts AS
    * BIGINT)` in [[sessionize]] is epoch seconds), and each user's LAST
    * session is excluded — batch `flatMapGroupsWithState` never times out,
    * so the trailing open session is held in state, not emitted. */
  def sessionizeOracle(gapMinutes: Int = 30): String = {
    val gapSec = gapMinutes * 60
    s"""WITH ev AS (
       |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events),
       |marked AS (
       |  SELECT user_id, sec,
       |    CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec)
       |              <= $gapSec
       |         THEN 0 ELSE 1 END AS is_new
       |  FROM ev),
       |sess AS (
       |  SELECT user_id, sec,
       |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec
       |                      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM marked),
       |agg AS (
       |  SELECT user_id, sid, MIN(sec) AS start_sec, MAX(sec) AS end_sec,
       |         COUNT(*) AS n_events
       |  FROM sess GROUP BY 1, 2)
       |SELECT a.user_id,
       |  make_timestamp(start_sec * 1000000) AS session_start,
       |  make_timestamp(end_sec * 1000000) AS session_end,
       |  n_events
       |FROM agg a
       |JOIN (SELECT user_id, MAX(sid) AS last_sid FROM agg GROUP BY 1) l
       |  ON a.user_id = l.user_id AND a.sid < l.last_sid""".stripMargin
  }

  /** Compact an event batch to its latest row per (user_id, event_type)
    * — [[graft.ops.OperatorQueries.keepLatest]]'s MAX-of-struct form,
    * shared by the streaming CDC sink below and its spec. */
  private[graft] def latestPerKey(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("last"))
      .select(col("user_id"), col("event_type"),
        col("last.event_id").as("event_id"), col("last.ts").as("ts"),
        col("last.value").as("value"))

  /** Streaming CDC upsert — the end-to-end change-data pipeline: each
    * micro-batch compacts to its latest row per key and upserts into a
    * parquet table through [[graft.core.Sinks.merge]], so the table IS
    * the stream's keepLatest view at every commit.
    *
    * The correctness subtlety this encodes (and the spec pins): a LATE
    * batch can carry an OLDER version of a stored key, and a naive
    * merge would regress the row.  Resolution happens against the
    * store — the batch's survivors union the CURRENTLY STORED rows for
    * the same keys and keepLatest runs over both, so the stored newer
    * version wins and the upsert is monotone in (ts, event_id).  Cost
    * per batch: one batch-sized aggregate + a stored-side semi-join on
    * the BATCH's keys (partition-prunable on a key-partitioned table)
    * — never a full-table rewrite of untouched keys' history, which is
    * exactly the Delta/Iceberg MERGE access pattern.
    */
  /** Streaming CDC upsert into the COMMIT LOG — [[writeCdcUpsert]] with
    * every rename-chain caveat gone: each micro-batch compacts to its
    * latest row per key, resolves against the stored rows (the same
    * late-batch regression guard), and lands through
    * [[graft.core.TxLog.mergeBatch]] — data files plus the
    * `appId:batchId` txn marker in ONE atomic commit, so a replayed
    * batch (crash between sink commit and checkpoint advance) is
    * recognized and SKIPPED rather than re-merged: exactly-once on any
    * store with an atomic create/CAS, no recoverSwap, no existence
    * probe, and readers see whole merges or nothing. */
  def writeTxLogUpsert(events: DataFrame, path: String,
      checkpoint: String, appId: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val latest = latestPerKey(batch.toDF())
        val keys = Seq("user_id", "event_type")
        val stored =
          if (graft.core.TxLog.snapshot(spark, path).isEmpty) None
          else Some(graft.core.TxLog.read(spark, path)
            .join(latest.select(keys.map(col): _*).distinct(), keys,
              "left_semi"))
        val resolved = stored match {
          case Some(s) => latestPerKey(s.unionByName(latest))
          case None    => latest
        }
        graft.core.TxLog.mergeBatch(spark, resolved, path, keys,
          appId, batchId)
        ()
      }
      .start()

  def writeCdcUpsert(events: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val latest = latestPerKey(batch.toDF())
        // A crash inside Sinks.merge's swap can leave the stored table
        // renamed aside; restore it BEFORE the existence probe, or the
        // replayed batch would be mistaken for a first write and the
        // store silently reset to one batch's keys (r7 ADVICE #1).
        graft.core.Sinks.recoverSwap(spark, path)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
          latest.write.mode("overwrite").parquet(path)
        else {
          val keys = Seq("user_id", "event_type")
          val stored = spark.read.parquet(path)
            .join(latest.select(keys.map(col): _*).distinct(), keys,
              "left_semi")
          val resolved = latestPerKey(stored.unionByName(latest))
          graft.core.Sinks.merge(spark, path, resolved, keys)
        }
        ()
      }
      .start()
}
