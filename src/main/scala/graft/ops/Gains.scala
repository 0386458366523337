package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** Decile gains curve — the model-evaluation primitive ("ranking users
  * by this score, what share of the revenue do the top k deciles
  * capture?") behind every lift/gains chart and targeting decision.
  * Here the score is the user's activity (event count) and the response
  * is purchase revenue; swap in a model score column and the plan is a
  * production model evaluation.
  *
  * No global ntile: decile BOUNDARIES come from one 1-row
  * `q_sketch_multi` aggregate over the per-user cells (the [[Rfm]]
  * recipe — map-side mergeable, cap-bounded) and decile assignment is a
  * broadcast compare; the cumulative walk runs over the TEN aggregated
  * decile cells ordered best-first.  Cum shares are single IEEE
  * divisions of exact cents integers, ROUND 6.  Ties at a boundary land
  * in the lower decile on both engines (the engine-wide
  * discrete-quantile convention).
  *
  * Scale: one user_id shuffle (cells), a 1-row boundary aggregate, a
  * broadcast-compare scoring pass, a ≤10-cell rollup + window.
  */
object Gains {

  def gainsCurve(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.QuantileSketch.register(spark)
    graft.functions.Fast.register(spark)
    gainsOf(Sources.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("score"),
        sum(when(col("event_type") === "purchase",
          expr("money_cents(value)"))
          .otherwise(0L)).as("cents")))
  }

  /** Core over prepared per-user ("score" long, "cents" long) cells;
    * caller registers [[graft.functions.QuantileSketch]]. */
  private[graft] def gainsOf(rawCells: DataFrame): DataFrame = {
    val cells = rawCells
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Adaptive cap (r12 verdict #1): counting the persisted cells frame
    // materializes the persist the scoring pass reuses anyway.
    val cap = AnalyticsQueries.adaptiveSketchCap(cells.count())
    val ps = (1 to 9).map(i => s"0.${i}D").mkString(", ")
    val bounds = cells.agg(
      expr(s"q_sketch_multi(score, array($ps), $cap)").as("b"))
    val decile = (1 to 9).map(i => (col("score") > expr(s"b[${i - 1}]"))
      .cast("int")).reduce(_ + _) + lit(1)
    val byDecile = cells.crossJoin(broadcast(bounds))
      .select(decile.as("decile"), col("cents"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("users"), sum(col("cents")).as("cents"))
    val wDesc = Window.orderBy(col("decile").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDecile
      .withColumn("cum_cents", sum(col("cents")).over(wDesc))
      .withColumn("total_cents", sum(col("cents")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      // NULLIF: a corpus with zero response revenue has no defined
      // share — NULL on both engines, never an ANSI divide-by-zero
      // (the linearTrend degenerate-denominator convention; caught by
      // the degenerate-input sweep).
      .withColumn("cum_share", round(
        col("cum_cents").cast("double")
          / expr("CAST(NULLIF(total_cents, 0) AS DOUBLE)"), 6))
      .select(col("decile"), col("users"), col("cents"), col("cum_share"))
  }

  val gainsCurveOracle: String = {
    def pick(p: String, alias: String) =
      s"MIN(CASE WHEN rn >= CEIL($p * n) THEN v END) AS $alias"
    val picks = (1 to 9).map(i => pick(s"0.$i", s"b$i")).mkString(",\n    ")
    val scoreExpr = (1 to 9).map(i =>
      s"CASE WHEN score > b$i THEN 1 ELSE 0 END").mkString("(1 + ", " + ", ")")
    s"""WITH cells AS (
       |  SELECT user_id, COUNT(*) AS score,
       |    CAST(SUM(CASE WHEN event_type = 'purchase'
       |      THEN ${Frag.money("value")} * 100 ELSE 0 END) AS BIGINT)
       |      AS cents
       |  FROM events GROUP BY 1),
       |r AS (
       |  SELECT score AS v, ROW_NUMBER() OVER (ORDER BY score) AS rn,
       |    COUNT(*) OVER () AS n
       |  FROM cells),
       |b AS (
       |  SELECT $picks
       |  FROM r),
       |scored AS (
       |  SELECT CAST($scoreExpr AS INT) AS decile, cents
       |  FROM cells CROSS JOIN b),
       |d AS (
       |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS users,
       |    CAST(SUM(cents) AS BIGINT) AS cents
       |  FROM scored GROUP BY 1)
       |SELECT decile, users, cents,
       |  ROUND(CAST(SUM(cents) OVER (ORDER BY decile DESC
       |      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
       |    / CAST(NULLIF(SUM(cents) OVER (), 0) AS DOUBLE), 6)
       |    AS cum_share
       |FROM d""".stripMargin
  }
}
