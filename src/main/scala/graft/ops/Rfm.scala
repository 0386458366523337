package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** RFM segmentation (recency / frequency / monetary quartile scores per
  * customer, rolled up to segment cells) — the classic CRM cohorting
  * operator, built WITHOUT the global ntile window a textbook
  * implementation reaches for.  ntile over hundreds of millions of
  * customers is a single-task global sort (the rank-walk problem); here
  * the quartile BOUNDARIES come from one mergeable
  * [[graft.functions.QuantileSketch]] aggregate over the customer cells
  * (map-side partials, one 1-row result) and scoring is a broadcast
  * compare — embarrassingly parallel, no global sort anywhere.
  *
  * Semantics pinned cross-engine: boundaries use the engine-wide
  * discrete-quantile convention (smallest value with 1-based rank ≥
  * ⌈p·n⌉ — [[AnalyticsQueries.quantileSketch]]'s exact regime, mirrored
  * by the oracle's rank walk), and a score is 1 + #(boundaries strictly
  * below the value): ties land in the lower quartile on both engines.
  * Scores are quartile indices 1–4 of each metric's own distribution
  * (r_score 1 = most recent, f/m_score 4 = most active/valuable).
  * Recency is measured against the pinned corpus horizon [[Now]] (the
  * RunConfig pinned-runDate convention; dates are exact day diffs).
  * Money runs through the cents convention so every compared and summed
  * operand is an exact integer; the one division producing the
  * segment's receita is a single IEEE op on exact operands.
  *
  * Scale: one custkey-keyed shuffle builds the cells (map-side partial
  * MAX/COUNT/SUM); the cells persist once (the ngramJaccard convention)
  * and feed (a) the 1-row boundary aggregate and (b) the broadcast-join
  * scoring pass; the final rollup has ≤ 4³ groups.  At 100 TB no stage
  * moves more than the customer dimension, and the adaptive sketch cap
  * ([[AnalyticsQueries.adaptiveSketchCap]]) bounds the boundary
  * aggregate's memory regardless of customer count (bounded-cap regime
  * gated by q_an_quantile_sketch_capped).
  */
object Rfm {

  /** Pinned "now" for recency: first month boundary past the corpus's
    * last order (orders span 1995-01-01 .. 2001-08-01). */
  val Now = "2001-09-01"

  def rfm(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.QuantileSketch.register(spark)
    graft.functions.Fast.register(spark)
    rfmOf(Sources.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        datediff(lit(Now).cast("date"), to_date(max(col("o_orderdate"))))
          .cast("long").as("r"),
        count(lit(1)).as("f"),
        expr("CAST(bigsum(money_cents(o_totalprice)) AS BIGINT)")
          .as("m")))
  }

  /** Core over prepared per-customer ("r", "f", "m" — all long) cells;
    * caller must have registered [[graft.functions.QuantileSketch]]. */
  private[graft] def rfmOf(rawCells: DataFrame): DataFrame = {
    val cells = rawCells
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Adaptive cap (r12 verdict #1): the boundary "group" is the whole
    // cells frame; its count materializes the persist the scoring pass
    // reuses anyway, so the sizing pre-pass is free.  Exact regime to
    // the ceiling, bounded compaction beyond.
    val cap = AnalyticsQueries.adaptiveSketchCap(cells.count())
    def qs(c: String) =
      expr(s"q_sketch_multi($c, array(0.25D, 0.5D, 0.75D), $cap)").as(s"b_$c")
    val bounds = cells.agg(qs("r"), qs("f"), qs("m"))
    def score(c: String) =
      (lit(1) + (col(c) > expr(s"b_$c[0]")).cast("int")
        + (col(c) > expr(s"b_$c[1]")).cast("int")
        + (col(c) > expr(s"b_$c[2]")).cast("int")).as(s"${c}_score")
    cells.crossJoin(broadcast(bounds))
      .select(score("r"), score("f"), score("m"), col("m"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("m")).cast("double") / 100.0).as("receita_total"))
  }

  val rfmOracle: String = {
    def pick(metric: String, p: String, alias: String) =
      s"MIN(CASE WHEN rn >= CEIL($p * n) THEN v END) AS $alias"
    def boundsCte(metric: String) =
      s"""${metric}_r AS (
         |  SELECT $metric AS v, ROW_NUMBER() OVER (ORDER BY $metric) AS rn,
         |    COUNT(*) OVER () AS n
         |  FROM cells),
         |${metric}_b AS (
         |  SELECT ${pick(metric, "0.25", s"${metric}25")},
         |    ${pick(metric, "0.50", s"${metric}50")},
         |    ${pick(metric, "0.75", s"${metric}75")}
         |  FROM ${metric}_r)""".stripMargin
    def score(metric: String) =
      s"""(1 + CASE WHEN $metric > ${metric}25 THEN 1 ELSE 0 END
         |   + CASE WHEN $metric > ${metric}50 THEN 1 ELSE 0 END
         |   + CASE WHEN $metric > ${metric}75 THEN 1 ELSE 0 END)"""
        .stripMargin
    s"""WITH cells AS (
       |  SELECT o_custkey,
       |    DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE),
       |              DATE '$Now') AS r,
       |    COUNT(*) AS f,
       |    CAST(SUM(${Frag.money("o_totalprice")}) * 100 AS BIGINT) AS m
       |  FROM orders GROUP BY 1),
       |${boundsCte("r")},
       |${boundsCte("f")},
       |${boundsCte("m")},
       |scored AS (
       |  SELECT CAST(${score("r")} AS INT) AS r_score,
       |    CAST(${score("f")} AS INT) AS f_score,
       |    CAST(${score("m")} AS INT) AS m_score, m
       |  FROM cells CROSS JOIN r_b CROSS JOIN f_b CROSS JOIN m_b)
       |SELECT r_score, f_score, m_score,
       |  CAST(COUNT(*) AS BIGINT) AS n_customers,
       |  CAST(SUM(m) AS DOUBLE) / 100.0 AS receita_total
       |FROM scored GROUP BY 1, 2, 3""".stripMargin
  }
}
