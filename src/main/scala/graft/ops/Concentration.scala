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

  def hhi(spark: SparkSession, dir: String): DataFrame =
    Sources.orders(spark, dir)
      .select(expr(Frag.mes("o_orderdate")).as("mes"), col("o_custkey"),
        expr(s"CAST(${Frag.money("o_totalprice")} * 100 AS BIGINT)")
          .as("cents"))
      .groupBy(col("mes"), col("o_custkey"))
      .agg(sum(col("cents")).as("c"))
      .groupBy(col("mes"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c")).as("t"),
        expr("CAST(SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0))) " +
          "AS DECIMAL(38,0))").as("sumsq"),
        max(col("c")).as("maxc"))
      .select(col("mes"), col("n_customers"), col("t").as("cents"),
        expr(HhiExpr).as("hhi"),
        expr(TopShareExpr).as("top1_share"))

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
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("mes"))
      .orderBy(col("c").asc, col("o_custkey").asc)
    Sources.orders(spark, dir)
      .select(expr(Frag.mes("o_orderdate")).as("mes"), col("o_custkey"),
        expr(s"CAST(${Frag.money("o_totalprice")} * 100 AS BIGINT)")
          .as("cents"))
      .groupBy(col("mes"), col("o_custkey"))
      .agg(sum(col("cents")).as("c"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("mes"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c")).as("t"),
        expr("CAST(SUM(CAST(rk AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0)))" +
          " AS DECIMAL(38,0))").as("s_ic"))
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
}
