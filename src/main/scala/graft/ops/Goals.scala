package graft.ops

import graft.core.Frag

/** Goal-evaluation CASE ladders (reference operator C6/C8/C17) — the
  * commission rulebook at `kpi_fechamento_m_presente/extract.py:176-252`:
  * per goal (churn / captação / receita) the closing computes a hit status
  * ('Batida'/'Não Batida'), an achievement percentage, and a
  * hierarchy-dependent bonus amount.
  *
  * Expressed as SQL fragments shared between the Spark plan (`expr`) and the
  * DuckDB oracle so the decimal math is identical.  The achievement
  * percentage deviates from the reference's `ROUND(100*x/m, 2)` by
  * truncating at 4 decimal digits (basis points) via exact integer
  * arithmetic: cross-engine decimal division has engine-specific result
  * scales and double rounding is representation-sensitive, while integer
  * division is exact everywhere.  Deviation documented per SURVEY.md §7.1.
  *
  * The only engine-specific token is the integer-division operator —
  * `div` in Spark SQL, `//` in DuckDB — injected via `intDiv`.
  */
object Goals {

  val SparkDiv = "div"
  val DuckDiv = "//"

  /** 'Batida' when achieved >= target (NULL-safe: no target → 'Sem Meta',
    * mirroring the LEFT-JOIN-then-CASE NULL behavior at extract.py:176-189). */
  def status(achieved: String, target: String): String =
    s"""CASE WHEN $target IS NULL OR $target = 0 THEN 'Sem Meta'
       | WHEN $achieved >= $target THEN 'Batida'
       | ELSE 'Não Batida' END""".stripMargin

  /** Achievement percentage with 2 decimal digits, exact integer math. */
  def pct(achieved: String, target: String, intDiv: String): String =
    s"""CAST((10000 * CAST($achieved * 100 AS BIGINT)) $intDiv
       | NULLIF(CAST($target * 100 AS BIGINT), 0) AS DOUBLE) / 100""".stripMargin

  /** Bonus amount: rate applied to the revenue base when the goal is hit;
    * the rate depends on hierarchy level (junior/pleno tiers,
    * extract.py:190-216). */
  def bonus(achieved: String, target: String, base: String,
      hierarchy: String, juniorRate: String, plenoRate: String): String =
    s"""CASE WHEN $target IS NOT NULL AND $target <> 0 AND $achieved >= $target
       | THEN ${Frag.asMoney(s"$base * (CASE WHEN $hierarchy = 'junior' THEN $juniorRate ELSE $plenoRate END)")}
       | ELSE CAST(0.00 AS DECIMAL(18,2)) END""".stripMargin
}
