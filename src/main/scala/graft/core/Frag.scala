package graft.core

/** SQL fragments shared verbatim between the Spark plans (via
  * `functions.expr`) and the DuckDB oracle strings.
  *
  * Money math must hash-match an independent engine (the driver's DuckDB
  * compare, see /root/repo/BASELINE.md), which rules out floating-point
  * aggregation: the sum of doubles depends on partition order.  Every measure
  * therefore casts to decimal *before* aggregating — exact in both engines —
  * and the final value is pinned to DECIMAL(18,2) so scale/precision agree
  * bit-for-bit.  This mirrors the reference's NUMERIC(15,2) target columns
  * (`utils/db_schema_farmer/db_schema_receita.py:47-61`) and its `ROUND(x,2)`
  * / `.round(2)` conventions (`kpi_fechamento_m_presente/extract.py:186`,
  * `kpi_receita_farmer_m_passado/transform.py:47-49`); we standardize on
  * HALF_UP as documented in SURVEY.md §7.1.
  */
object Frag {
  /** Exact money view of a raw (double) measure column. */
  def money(c: String): String = s"CAST($c AS DECIMAL(18,2))"

  /** Exact small-rate view (2 fractional digits) of a raw rate column. */
  def rate(c: String): String = s"CAST($c AS DECIMAL(4,2))"

  /** Aggregate a decimal expression and pin the output type. */
  def sumMoney(e: String): String =
    s"CAST(ROUND(SUM($e), 2) AS DECIMAL(18,2))"

  /** Pin a scalar decimal expression's output type. */
  def asMoney(e: String): String = s"CAST(ROUND($e, 2) AS DECIMAL(18,2))"

  /** Month bucket (`DATE_TRUNC('month', d)` — reference C1, ubiquitous). */
  def mes(c: String): String = s"CAST(DATE_TRUNC('month', $c) AS DATE)"
}
