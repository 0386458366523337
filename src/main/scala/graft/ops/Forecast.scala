package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** Seasonal-naive forecast backtest — "does last week's same weekday
  * predict today better than yesterday does?" — the baseline every
  * forecasting system must beat and the first thing a metric owner
  * backtests.  For each event type the two naive predictors (lag-7 =
  * seasonal-naive, lag-1 = persistence) are scored over all days where
  * both are defined, and the output is the per-type absolute-error
  * totals plus the verdict.
  *
  * Everything is exact: daily totals are cents integers, the errors
  * are |t − lag| in int64, and the totals are plain sums — no MAE
  * division crosses the gate (consumers divide by n_scored themselves),
  * so the whole row hash-checks cross-engine ([[Changepoint]]'s
  * integer-lift family).  Lags are over OBSERVED days (the day-cell
  * convention; on this corpus every calendar day trades, making lag-7
  * the same-weekday value).
  *
  * Scale: ONE shuffle to the (type, day) cells; both lags ride a
  * single per-type window over the aggregated cells; the rollup is
  * #types rows.
  */
object Forecast {

  def naiveBacktest(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    naiveBacktestOf(Sources.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(bigsum(money_cents(value)) AS BIGINT)")
        .as("t")))
  }

  private[graft] def naiveBacktestOf(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("f7", lag(col("t"), 7).over(w))
      .withColumn("f1", lag(col("t"), 1).over(w))
      .filter(col("f7").isNotNull && col("f1").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(col("t") - col("f7"))).as("sae_lag7"),
        sum(abs(col("t") - col("f1"))).as("sae_lag1"))
      .withColumn("seasonal_wins", col("sae_lag7") < col("sae_lag1"))
  }

  val naiveBacktestOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS t
       |  FROM events GROUP BY 1, 2),
       |lagged AS (
       |  SELECT event_type, t,
       |    LAG(t, 7) OVER w AS f7, LAG(t, 1) OVER w AS f1
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day))
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored,
       |  CAST(SUM(ABS(t - f7)) AS BIGINT) AS sae_lag7,
       |  CAST(SUM(ABS(t - f1)) AS BIGINT) AS sae_lag1,
       |  CAST(SUM(ABS(t - f7)) AS BIGINT)
       |    < CAST(SUM(ABS(t - f1)) AS BIGINT) AS seasonal_wins
       |FROM lagged
       |WHERE f7 IS NOT NULL AND f1 IS NOT NULL
       |GROUP BY 1""".stripMargin

  /** Lag-7 autocorrelation of the daily revenue series per event type —
    * the diagnostic BEHIND [[naiveBacktest]]: the backtest reports
    * whether the seasonal predictor wins; this measures HOW MUCH weekly
    * structure exists (Pearson r between each day and its 7-back
    * neighbor).  The [[AnalyticsQueries.correlation]] recipe verbatim:
    * exact DECIMAL moments over the paired cells, then one shared
    * ROUND-6 IEEE chain (mul/sub/div + exact sqrt).  NULLIF guards the
    * constant-series zero-variance denominator (ANSI would raise; the
    * gains-curve sweep lesson applied at design time).  One shuffle to
    * day cells + one lag window over cells + a #types-row aggregate. */
  def weeklyAutocorr(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    weeklyAutocorrOf(Sources.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(bigsum(money_cents(value)) AS BIGINT)")
        .as("t")))
  }

  private[graft] def weeklyAutocorrOf(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("t7", lag(col("t"), 7).over(w))
      .filter(col("t7").isNotNull)
      .selectExpr("event_type", "CAST(t AS DECIMAL(18,0)) AS x",
        "CAST(t7 AS DECIMAL(18,0)) AS y")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(expr("x")).as("sx"),
        sum(expr("y")).as("sy"), sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"))
      .selectExpr("event_type", "n", s"$AutocorrFormula AS autocorr_lag7")
  }

  /** The correlation chain with a NULLIF-guarded denominator, shared
    * verbatim with the oracle. */
  private val AutocorrFormula: String =
    "ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) " +
      "* sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) " +
      "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0), 6)"

  val weeklyAutocorrOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS t
       |  FROM events GROUP BY 1, 2),
       |lagged AS (
       |  SELECT event_type, CAST(t AS DECIMAL(18,0)) AS x,
       |    CAST(LAG(t, 7) OVER (PARTITION BY event_type ORDER BY day)
       |         AS DECIMAL(18,0)) AS y
       |  FROM daily),
       |m AS (
       |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
       |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
       |  FROM lagged WHERE y IS NOT NULL GROUP BY 1)
       |SELECT event_type, CAST(n AS BIGINT) AS n,
       |  $AutocorrFormula AS autocorr_lag7
       |FROM m""".stripMargin

  /** Lagged CROSS-correlation between ordered pairs of event types'
    * daily-revenue series at lags 0..`maxLag` days — the lead-lag
    * discovery companion of [[weeklyAutocorr]]: a high r at lag L for
    * (A, B) says A's day-d revenue co-moves with B's day-(d+L), i.e. A
    * LEADS B by L.  Pairs are ordered (both directions appear), so the
    * asymmetric lag covers leads and lags without negative offsets.
    *
    * Exactness is the [[weeklyAutocorr]] recipe verbatim: exact cent
    * cells, DECIMAL moment sums, and the one shared double Pearson
    * chain ([[AutocorrFormula]]) with its NULLIF variance guard.
    * Scale: day cells in one exchange (calendar × types sized,
    * checkpointed — never corpus-sized); the lag frame is a bounded
    * broadcast; the pair join keys on the shifted day. */
  def crossCorr(spark: SparkSession, dir: String,
      maxLag: Int = 3): DataFrame = {
    graft.functions.Fast.register(spark)
    val daily = Sources.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(bigsum(money_cents(value)) AS BIGINT)")
        .as("t"))
      .localCheckpoint()
    val lags = spark.range(0, maxLag + 1L)
      .select(col("id").cast("int").as("lag_days"))
    val a = daily.select(col("event_type").as("type_a"), col("day"),
      col("t").cast("decimal(18,0)").as("x"))
    val b = daily.select(col("event_type").as("type_b"),
      col("day").as("day_b"), col("t").cast("decimal(18,0)").as("y"))
    a.crossJoin(broadcast(lags))
      .withColumn("day_b", date_add(col("day"), col("lag_days")))
      .join(b, Seq("day_b"))
      .filter(col("type_a") =!= col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("lag_days"))
      .agg(count(lit(1)).as("n"), sum(expr("x")).as("sx"),
        sum(expr("y")).as("sy"), sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"))
      .selectExpr("type_a", "type_b", "lag_days", "n AS n_days",
        s"$AutocorrFormula AS xcorr")
  }

  def crossCorrOracle(maxLag: Int = 3): String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS t
       |  FROM events GROUP BY 1, 2),
       |lags AS (
       |  SELECT CAST(UNNEST(generate_series(0, $maxLag)) AS INT)
       |    AS lag_days),
       |p AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    l.lag_days,
       |    CAST(a.t AS DECIMAL(18,0)) AS x,
       |    CAST(b.t AS DECIMAL(18,0)) AS y
       |  FROM daily a
       |  CROSS JOIN lags l
       |  JOIN daily b ON b.day = a.day + l.lag_days
       |  WHERE a.event_type <> b.event_type),
       |m AS (
       |  SELECT type_a, type_b, lag_days, COUNT(*) AS n, SUM(x) AS sx,
       |    SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx,
       |    SUM(y * y) AS syy
       |  FROM p GROUP BY 1, 2, 3)
       |SELECT type_a, type_b, lag_days, CAST(n AS BIGINT) AS n_days,
       |  $AutocorrFormula AS xcorr
       |FROM m""".stripMargin

  /** Exponential smoothing (EWMA, α = ½) of the daily-revenue series per
    * event type, with the one-step forecast MAE — the exponential member
    * of the backtest family next to [[naiveBacktest]]'s lag baselines.
    * α is DELIBERATELY ½: each update `(s + x)/2` divides by a power of
    * two (exact in binary floating point), and the recursion is evaluated
    * as ONE ordered left fold written identically in both engines, so the
    * final level is bit-deterministic — a generic α through `pow` or a
    * window-sum would not be.
    *
    * Scale: day cells in one exchange; the fold runs over a ≤ #days
    * array per type (calendar-bounded, never corpus-sized). */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    Sources.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(bigsum(money_cents(value)) AS BIGINT)")
        .as("t"))
      .groupBy(col("event_type"))
      .agg(expr(
        "transform(sort_array(collect_list(struct(day, t))), c -> c.t)")
        .as("ts"))
      .selectExpr("event_type", "size(ts) AS n_days",
        """aggregate(
          |  slice(ts, 2, size(ts) - 1),
          |  named_struct('s', CAST(ts[0] AS DOUBLE),
          |               'e', CAST(0.0 AS DOUBLE)),
          |  (acc, x) -> named_struct(
          |    's', (acc.s + CAST(x AS DOUBLE)) / 2.0,
          |    'e', acc.e + abs(CAST(x AS DOUBLE) - acc.s))) AS st"""
          .stripMargin)
      .selectExpr("event_type", "n_days",
        "ROUND(st.s, 4) AS ewma_cents",
        "ROUND(st.e / CAST(greatest(n_days - 1, 1) AS DOUBLE), 4)" +
          " AS mae_cents")
  }

  val ewmaOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS t
       |  FROM events GROUP BY 1, 2),
       |g AS (
       |  SELECT event_type, list(t ORDER BY day) AS ts
       |  FROM daily GROUP BY 1),
       |f AS (
       |  SELECT event_type, len(ts) AS n_days,
       |    -- Field ORDER is load-bearing: DuckDB evaluates the lambda's
       |    -- struct fields sequentially and a later field sees acc with
       |    -- the earlier fields already UPDATED (verified: s-then-e
       |    -- accumulated |x - s_new|, halving every error term).  'e'
       |    -- must therefore read acc.s before 's' overwrites it.  Spark's
       |    -- named_struct is pure, so only this side needs the ordering.
       |    list_reduce(
       |      list_prepend(
       |        {'e': CAST(0.0 AS DOUBLE), 's': CAST(ts[1] AS DOUBLE)},
       |        list_transform(list_slice(ts, 2, len(ts)),
       |          x -> {'e': CAST(0.0 AS DOUBLE), 's': CAST(x AS DOUBLE)})),
       |      (acc, x) -> {'e': acc.e + abs(x.s - acc.s),
       |                   's': (acc.s + x.s) / 2.0}) AS st
       |  FROM g)
       |SELECT event_type, n_days,
       |  ROUND(st.s, 4) AS ewma_cents,
       |  ROUND(st.e / CAST(greatest(n_days - 1, 1) AS DOUBLE), 4)
       |    AS mae_cents
       |FROM f""".stripMargin

  /** Month-over-month revenue growth — the LAG-ratio BI staple over the
    * exact monthly cents series: previous month's total rides in on a
    * LAG window, growth is ONE division of exact integers (NULL on the
    * first month and on a zero base, never a fake 0%).
    *
    * Scale: one orders scan → #months rows; the single-partition window
    * runs over the calendar, not the corpus. */
  def momGrowth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("mes"))
    Sources.orders(spark, dir)
      .groupBy(expr(Frag.mes("o_orderdate")).as("mes"))
      .agg(expr(s"CAST(SUM(CAST(${Frag.money("o_totalprice")} * 100 " +
        "AS BIGINT)) AS BIGINT)").as("cents"))
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .withColumn("growth", expr(
        "ROUND((cents - prev_cents) " +
          "/ CAST(NULLIF(prev_cents, 0) AS DOUBLE), 6)"))
  }

  val momGrowthOracle: String =
    s"""WITH m AS (
       |  SELECT ${Frag.mes("o_orderdate")} AS mes,
       |    CAST(SUM(CAST(${Frag.money("o_totalprice")} * 100 AS BIGINT))
       |      AS BIGINT) AS cents
       |  FROM orders GROUP BY 1)
       |SELECT mes, cents,
       |  LAG(cents, 1) OVER (ORDER BY mes) AS prev_cents,
       |  ROUND((cents - LAG(cents, 1) OVER (ORDER BY mes))
       |    / CAST(NULLIF(LAG(cents, 1) OVER (ORDER BY mes), 0) AS DOUBLE),
       |    6) AS growth
       |FROM m""".stripMargin

  /** Month-of-year seasonal index of revenue — the classical ratio-to-
    * moving-average simplification the [[momGrowth]] LAG view can't
    * give: index(moy) = mean(monthly totals landing in that calendar
    * month) / mean(all monthly totals).  Index > 1 = a seasonally
    * strong month REGARDLESS of which years contributed; the deseason
    * divisor a forecast pipeline applies before trend fitting.
    *
    * Determinism: monthly totals are exact cents; the index is the
    * fixed three-op IEEE chain (sumₘ/cntₘ)/(sumₜ/cntₜ) over exact
    * integers, ROUND-6 — same text both engines.  Scale: orders
    * collapse to ≤ #months cells, then ≤ 12 rows; totals ride a 1-row
    * broadcast. */
  def seasonalIndex(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Sources.orders(spark, dir)
      .groupBy(expr(Frag.mes("o_orderdate")).as("mes"))
      .agg(expr(s"CAST(SUM(CAST(${Frag.money("o_totalprice")} * 100 " +
        "AS BIGINT)) AS BIGINT)").as("cents"))
      .localCheckpoint()
    val totals = monthly.agg(sum(col("cents")).as("tot_cents"),
      count(lit(1)).as("tot_months"))
    monthly
      .groupBy(expr("month(mes)").cast("int").as("moy"))
      .agg(count(lit(1)).as("n_months"), sum(col("cents")).as("cents"))
      .crossJoin(broadcast(totals))
      .selectExpr("moy", "n_months", "cents",
        s"$SeasonalIndexFormula AS seasonal_index")
  }

  private val SeasonalIndexFormula: String =
    "ROUND((CAST(cents AS DOUBLE) / CAST(n_months AS DOUBLE)) " +
      "/ NULLIF(CAST(tot_cents AS DOUBLE) / CAST(tot_months AS DOUBLE), " +
      "0.0), 6)"

  val seasonalIndexOracle: String =
    s"""WITH m AS (
       |  SELECT ${Frag.mes("o_orderdate")} AS mes,
       |    CAST(SUM(CAST(${Frag.money("o_totalprice")} * 100 AS BIGINT))
       |      AS BIGINT) AS cents
       |  FROM orders GROUP BY 1),
       |tot AS (
       |  SELECT CAST(SUM(cents) AS BIGINT) AS tot_cents,
       |    CAST(COUNT(*) AS BIGINT) AS tot_months FROM m),
       |grp AS (
       |  SELECT CAST(month(mes) AS INT) AS moy,
       |    CAST(COUNT(*) AS BIGINT) AS n_months,
       |    CAST(SUM(cents) AS BIGINT) AS cents
       |  FROM m GROUP BY 1)
       |SELECT moy, n_months, cents, $SeasonalIndexFormula AS seasonal_index
       |FROM grp, tot""".stripMargin

  /** Theil–Sen slope of the daily revenue series per event type — the
    * MEDIAN of all pairwise slopes (t_b − t_a)/(day_b − day_a), the
    * robust-regression companion to the OLS trend
    * ([[graft.ops.AnalyticsQueries]] linearTrend): one wild day drags an
    * OLS slope arbitrarily far but moves the pairwise-slope median by at
    * most one rank (spec-pinned with a 1000× outlier day).
    *
    * Determinism: x = the epoch day, so every slope is ONE IEEE division
    * of exact integers (cents per day); the median rank walk orders by
    * (slope, day_a, day_b) — a TOTAL order even when two pairs tie on
    * slope — and averages the two middle ranks (one addition of two
    * doubles: commutative, so engine-safe, unlike an n-term float sum).
    *
    * Scale: the [[graft.ops.StatTests]] pair-frame shape — corpus to
    * calendar-bounded day cells in one exchange (localCheckpointed so
    * both join sides reuse the materialized aggregate), then ≤ #days²/2
    * pairs per type; the rank window runs over those calendar²-bounded
    * frames, never the corpus. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    val cells = Sources.events(spark, dir)
      .select(col("ts").cast("bigint").as("sec"), col("event_type"),
        col("value"))
      .select(col("event_type"), expr("sec DIV 86400").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(expr("CAST(bigsum(money_cents(value)) AS BIGINT)")
        .as("t"))
      .localCheckpoint()
    val a = cells.select(col("event_type"), col("day").as("da"),
      col("t").as("ta"))
    val b = cells.select(col("event_type"), col("day").as("db"),
      col("t").as("tb"))
    val byslope = Window.partitionBy("event_type")
      .orderBy(col("slope"), col("da"), col("db"))
    a.join(b, Seq("event_type")).filter(col("da") < col("db"))
      .withColumn("slope",
        expr("CAST(tb - ta AS DOUBLE) / CAST(db - da AS DOUBLE)"))
      .withColumn("rn", row_number().over(byslope))
      .withColumn("m",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(expr("rn = (m + 1) DIV 2 OR rn = m DIV 2 + 1"))
      .groupBy(col("event_type"))
      .agg(max(col("m")).as("n_pairs"),
        expr("ROUND(AVG(slope), 6)").as("sen_slope_cents_per_day"))
  }

  val theilSenOracle: String =
    s"""WITH daily AS (
       |  SELECT event_type,
       |    CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS t
       |  FROM events GROUP BY 1, 2),
       |p AS (
       |  SELECT a.event_type, a.day AS da, b.day AS db,
       |    CAST(b.t - a.t AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
       |      AS slope
       |  FROM daily a JOIN daily b
       |    ON a.event_type = b.event_type AND a.day < b.day),
       |r AS (
       |  SELECT event_type, slope,
       |    ROW_NUMBER() OVER (PARTITION BY event_type
       |                       ORDER BY slope, da, db) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS m
       |  FROM p)
       |SELECT event_type, CAST(MAX(m) AS BIGINT) AS n_pairs,
       |  ROUND(AVG(slope), 6) AS sen_slope_cents_per_day
       |FROM r
       |WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
       |GROUP BY 1""".stripMargin

  /** Daily new-vs-returning split — the audience-composition metric
    * next to retention: per day, events from users seen for the first
    * time that day vs. returning users, plus the count of users born
    * that day.  A user's birth day is a MIN over their partition — ONE
    * user_id exchange serves both the window and nothing else rescans
    * events; the day rollup sees per-event rows already carrying the
    * flag.  All counts exact. */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Sources.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("first_day", min(col("day")).over(w))
      .withColumn("is_new", col("day") === col("first_day"))
      .groupBy(col("day"))
      .agg(sum(when(col("is_new"), 1L).otherwise(0L)).as("new_events"),
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("returning_events"),
        countDistinct(when(col("first_day") === col("day"), col("user_id")))
          .as("new_users"))
  }

  val newVsReturningOracle: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day
      |  FROM events),
      |f AS (SELECT user_id, MIN(day) AS first_day FROM ev GROUP BY 1)
      |SELECT ev.day,
      |  CAST(SUM(CASE WHEN ev.day = f.first_day THEN 1 ELSE 0 END)
      |    AS BIGINT) AS new_events,
      |  CAST(SUM(CASE WHEN ev.day <> f.first_day THEN 1 ELSE 0 END)
      |    AS BIGINT) AS returning_events,
      |  CAST(COUNT(DISTINCT CASE WHEN ev.day = f.first_day
      |    THEN ev.user_id END) AS BIGINT) AS new_users
      |FROM ev JOIN f USING (user_id)
      |GROUP BY 1""".stripMargin
}
