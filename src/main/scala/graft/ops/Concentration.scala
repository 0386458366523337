package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** Revenue-concentration audit — the Herfindahl–Hirschman index per
  * month over customer order revenue, plus the top-customer share and
  * the effective number of customers (1/HHI).  The portfolio-risk view
  * the reference's per-farmer KPI tables feed ("how dependent is this
  * month's book on its biggest client"), re-expressed over the
  * driver's orders table; the antitrust HHI convention scaled to
  * [0, 1].
  *
  * Determinism: shares are never summed as floats.  Per-(month,
  * customer) revenue is exact cents (the [[Frag.money]] convention);
  * HHI = Σ cᵢ² / T² is computed from the EXACT integer Σ cᵢ² — lifted
  * to DECIMAL before squaring because the sum of squares overflows
  * int64 at ~2000 active customers × $500k months (DECIMAL(38,0) holds
  * to 10²⁰ groups) — and the division is one shared-verbatim IEEE
  * chain over exact operands (mul + div + ROUND 6, the
  * [[AnalyticsQueries.linearTrend]] recipe).  max(cᵢ) rides the same
  * aggregate for the top-1 share.
  *
  * Scale: one orders scan → partial (month, customer) aggregate →
  * ONE exchange on (month, customer) → per-month rollup re-using the
  * month prefix (#months rows out).  No window, no join; at 100 TB
  * this is two hash aggregates, the cheapest concentration shape.
  */
object Concentration {

  /** Shared verbatim: HHI and top-share from exact integer operands. */
  private val HhiExpr =
    "ROUND(CAST(sumsq AS DOUBLE) " +
      "/ (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)), 6)"
  private val TopShareExpr =
    "ROUND(CAST(maxc AS DOUBLE) / CAST(t AS DOUBLE), 6)"

  def hhi(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    Sources.orders(spark, dir)
      .select(expr(Frag.mes("o_orderdate")).as("mes"), col("o_custkey"),
        expr("money_cents(o_totalprice)").as("cents"))
      .groupBy(col("mes"), col("o_custkey"))
      .agg(sum(col("cents")).as("c"))
      .groupBy(col("mes"))
      // r15 (guide step 4 / r14 verdict #4): Σ c² through the guarded
      // 64-bit [[graft.functions.LongProductSum]] fast path — the
      // DECIMAL spelling paid a BigDecimal multiply per group member in
      // the hash aggregate; bigprodsum is the same exact integer (the
      // oracle keeps the DECIMAL-product spelling, LongProductSumSpec
      // pins equality) with overflow handled by the guard, not by
      // precision headroom.
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c")).as("t"),
        expr("bigprodsum(c, c)").as("sumsq"),
        max(col("c")).as("maxc"))
      .select(col("mes"), col("n_customers"), col("t").as("cents"),
        expr(HhiExpr).as("hhi"),
        expr(TopShareExpr).as("top1_share"))
  }

  val hhiOracle: String =
    s"""WITH oc AS (
       |  SELECT ${Frag.mes("o_orderdate")} AS mes, o_custkey,
       |    SUM(CAST(${Frag.money("o_totalprice")} * 100 AS BIGINT)) AS c
       |  FROM orders GROUP BY 1, 2),
       |m AS (
       |  SELECT mes, CAST(COUNT(*) AS BIGINT) AS n_customers,
       |    CAST(SUM(c) AS BIGINT) AS t,
       |    CAST(SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0)))
       |      AS DECIMAL(38,0)) AS sumsq,
       |    CAST(MAX(c) AS BIGINT) AS maxc
       |  FROM oc GROUP BY 1)
       |SELECT mes, n_customers, t AS cents,
       |  $HhiExpr AS hhi,
       |  $TopShareExpr AS top1_share
       |FROM m""".stripMargin

  /** Shared verbatim: the rank-form Gini
    * `G = (2·Σ i·cᵢ − (n+1)·T) / (n·T)` over exact integer operands —
    * Σ i·cᵢ lifted to DECIMAL(38,0) like [[HhiExpr]]'s Σ cᵢ² (rank ×
    * cents overflows int64 in the same regime), then one shared-verbatim
    * IEEE chain. */
  private val GiniExpr =
    "ROUND((2.0 * CAST(s_ic AS DOUBLE) " +
      "- (CAST(n_customers AS DOUBLE) + 1.0) * CAST(t AS DOUBLE)) " +
      "/ (CAST(n_customers AS DOUBLE) * CAST(t AS DOUBLE)), 6)"

  /** Gini coefficient of monthly customer-revenue inequality — [[hhi]]'s
    * distribution-wide companion (HHI is dominated by the head; Gini sees
    * the whole Lorenz curve).  Exactness: per-customer cents are exact
    * integers, ranks come from a TOTAL order (`(c, o_custkey)` — ties
    * broken by key, so the rank assignment and therefore Σ i·cᵢ are
    * engine-independent), and the one divide happens at the end.
    *
    * Scale: same two hash aggregates as [[hhi]] plus one rank window
    * PARTITIONED by month — each month's frame is its active-customer
    * set, never the corpus, and the window reuses the (mes, o_custkey)
    * exchange the aggregate already made. */
  def gini(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("mes"))
      .orderBy(col("c").asc, col("o_custkey").asc)
    Sources.orders(spark, dir)
      .select(expr(Frag.mes("o_orderdate")).as("mes"), col("o_custkey"),
        expr("money_cents(o_totalprice)").as("cents"))
      .groupBy(col("mes"), col("o_custkey"))
      .agg(sum(col("cents")).as("c"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("mes"))
      // r15: Σ rk·c via the guarded long fast path (see [[hhi]]).
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c")).as("t"),
        expr("bigprodsum(CAST(rk AS BIGINT), c)").as("s_ic"))
      .select(col("mes"), col("n_customers"), col("t").as("cents"),
        expr(GiniExpr).as("gini"))
  }

  val giniOracle: String =
    s"""WITH oc AS (
       |  SELECT ${Frag.mes("o_orderdate")} AS mes, o_custkey,
       |    SUM(CAST(${Frag.money("o_totalprice")} * 100 AS BIGINT)) AS c
       |  FROM orders GROUP BY 1, 2),
       |rk AS (
       |  SELECT mes, c,
       |    ROW_NUMBER() OVER (PARTITION BY mes ORDER BY c, o_custkey) AS rk
       |  FROM oc),
       |m AS (
       |  SELECT mes, CAST(COUNT(*) AS BIGINT) AS n_customers,
       |    CAST(SUM(c) AS BIGINT) AS t,
       |    CAST(SUM(CAST(rk AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0)))
       |      AS DECIMAL(38,0)) AS s_ic
       |  FROM rk GROUP BY 1)
       |SELECT mes, n_customers, t AS cents,
       |  $GiniExpr AS gini
       |FROM m""".stripMargin

  /** Join-key skew profile — the diagnostic that decides whether a key
    * needs salting ([[SkewJoin]]) or AQE skew handling BEFORE the job
    * ships: per audited (relation, key), the count distribution of the
    * key collapsed to a count-of-counts frame, from which exact lower
    * median and p99 fall out of an integer rank walk (smallest count
    * whose cumulative key tally crosses the threshold — the comparison
    * is cross-multiplied, `100·cum ≥ 99·keys`, so no floating
    * percentile anywhere), plus max, top-1 share and the max/avg skew
    * factor as single ROUND-6 chains.
    *
    * Scale: one exchange to per-key counts (map-side combine), a second
    * tiny exchange to count-of-counts (≤ #distinct counts rows — data-
    * sketch-sized, NOT key-sized); the rank-walk window runs over that
    * bounded frame.  Registered over the two natural skew suspects:
    * `events.user_id` and `lineitem.l_orderkey`. */
  def keySkew(spark: SparkSession, dir: String): DataFrame =
    keySkewOf(Sources.events(spark, dir), "user_id", "events.user_id")
      .unionAll(keySkewOf(Sources.lineitem(spark, dir), "l_orderkey",
        "lineitem.l_orderkey"))

  private[graft] def keySkewOf(df: DataFrame, keyCol: String,
      label: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("cnt")).agg(count(lit(1)).as("freq"))
    val whole = Window.partitionBy(lit(1))
    cc.withColumn("cum", sum(col("freq")).over(
        Window.orderBy(col("cnt"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_keys", sum(col("freq")).over(whole))
      .withColumn("n_rows", sum(expr("cnt * freq")).over(whole))
      .agg(
        max(col("n_rows")).as("n_rows"), max(col("n_keys")).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        min(when(expr("2 * cum >= n_keys + 1"), col("cnt")))
          .as("median_cnt"),
        min(when(expr("100 * cum >= 99 * n_keys"), col("cnt")))
          .as("p99_cnt"))
      .selectExpr(s"'$label' AS relation", "n_rows", "n_keys", "max_cnt",
        "median_cnt", "p99_cnt",
        "ROUND(n_rows / CAST(n_keys AS DOUBLE), 6) AS avg_cnt",
        "ROUND(max_cnt / CAST(n_rows AS DOUBLE), 6) AS top1_share",
        "ROUND(CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE) " +
          "/ CAST(n_rows AS DOUBLE), 6) AS skew_factor")
  }

  private def keySkewOracleOf(table: String, keyCol: String,
      label: String): String =
    s"""SELECT '$label' AS relation, n_rows, n_keys, max_cnt, median_cnt,
       |  p99_cnt,
       |  ROUND(n_rows / CAST(n_keys AS DOUBLE), 6) AS avg_cnt,
       |  ROUND(max_cnt / CAST(n_rows AS DOUBLE), 6) AS top1_share,
       |  ROUND(CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
       |    / CAST(n_rows AS DOUBLE), 6) AS skew_factor
       |FROM (
       |  SELECT CAST(MAX(n_rows) AS BIGINT) AS n_rows,
       |    CAST(MAX(n_keys) AS BIGINT) AS n_keys,
       |    CAST(MAX(cnt) AS BIGINT) AS max_cnt,
       |    CAST(MIN(CASE WHEN 2 * cum >= n_keys + 1 THEN cnt END)
       |      AS BIGINT) AS median_cnt,
       |    CAST(MIN(CASE WHEN 100 * cum >= 99 * n_keys THEN cnt END)
       |      AS BIGINT) AS p99_cnt
       |  FROM (
       |    SELECT cnt, freq,
       |      SUM(freq) OVER (ORDER BY cnt ROWS UNBOUNDED PRECEDING) AS cum,
       |      SUM(freq) OVER () AS n_keys,
       |      SUM(cnt * freq) OVER () AS n_rows
       |    FROM (
       |      SELECT cnt, COUNT(*) AS freq FROM (
       |        SELECT $keyCol AS k, COUNT(*) AS cnt
       |        FROM $table GROUP BY 1) kc
       |      GROUP BY 1) cc) m) f""".stripMargin

  def keySkewOracle(): String =
    keySkewOracleOf("events", "user_id", "events.user_id") +
      "\nUNION ALL\n" +
      keySkewOracleOf("lineitem", "l_orderkey", "lineitem.l_orderkey")
}
