package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** Benford first-digit audit — the forensic-accounting screen: natural
  * money amounts spanning magnitudes follow P(d) = log10(1 + 1/d), and
  * a ledger whose leading digits drift from that curve is the classic
  * fabrication signal.  Emits the per-digit observed counts and shares
  * next to the Benford expectation and the χ²-style deviation term.
  *
  * Determinism: the leading digit of the POSITIVE INTEGER cents is the
  * first character of its decimal rendering — pure string/integer ops,
  * no log10 at query time (the nine Benford constants are baked as
  * 12-dp literals shared verbatim with the oracle, so no libm call
  * exists anywhere); shares and deviation terms are fixed IEEE chains
  * on exact counts, ROUND 6/9 ([[graft.llm.TextAnalysis]]'s χ²-drift
  * recipe).
  *
  * Scale: one scan into a ≤9-group hash aggregate with map-side
  * partials, then projections — the cheapest possible audit pass.
  */
object Benford {

  /** log10(1 + 1/d) for d = 1..9, to 12 dp — exact doubles shared with
    * the oracle; spelled once here, rendered into both SQL strings. */
  val P: Seq[String] = Seq(
    "0.301029995664", "0.176091259056", "0.124938736608",
    "0.096910013008", "0.079181246048", "0.066946789631",
    "0.057991946978", "0.051152522447", "0.045757490561")

  private def pCase(digitCol: String): String =
    "CAST(CASE " + P.zipWithIndex.map { case (p, i) =>
      s"WHEN $digitCol = ${i + 1} THEN $p"
    }.mkString(" ") + " END AS DOUBLE)"

  def firstDigit(spark: SparkSession, dir: String): DataFrame = {
    val counts = Sources.lineitem(spark, dir)
      .select(expr(s"CAST(${Frag.money("l_extendedprice")} * 100 AS BIGINT)")
        .as("cents"))
      .filter(col("cents") > 0)
      .select(expr("CAST(SUBSTRING(CAST(cents AS STRING), 1, 1) AS INT)")
        .as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .withColumn("share", round(
        col("n").cast("double") / col("total").cast("double"), 6))
      .withColumn("benford_p", expr(pCase("digit")))
      .withColumn("dev_term", round(expr(
        "(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - " + pCase("digit") +
          ") * (CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - " +
          pCase("digit") + ") / " + pCase("digit")), 9))
      .select(col("digit"), col("n"), col("share"), col("benford_p"),
        col("dev_term"))
  }

  val firstDigitOracle: String = {
    val pc = pCase("digit")
    s"""WITH c AS (
       |  SELECT CAST(SUBSTRING(CAST(cents AS VARCHAR), 1, 1) AS INT)
       |    AS digit
       |  FROM (SELECT CAST(${Frag.money("l_extendedprice")} * 100
       |               AS BIGINT) AS cents
       |        FROM lineitem)
       |  WHERE cents > 0),
       |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1),
       |t AS (SELECT digit, n, CAST(SUM(n) OVER () AS BIGINT) AS total FROM g)
       |SELECT digit, n,
       |  ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
       |  $pc AS benford_p,
       |  ROUND((CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - $pc)
       |    * (CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - $pc)
       |    / $pc, 9) AS dev_term
       |FROM t""".stripMargin
  }
}
