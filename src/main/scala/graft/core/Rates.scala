package graft.core

/** The business rate table.
  *
  * The reference scatters these magic numbers across five files (e.g.
  * `kpi_receita_farmer_m_presente/extract.py:64-89`,
  * `kpi_receita_farmer_m_passado/extract.py:49`,
  * `kpi_receita_cliente/extract.py:207`); they must match exactly between the
  * Spark plans and the DuckDB oracle SQL, so they live in one place and the
  * oracle strings interpolate them from here.
  */
object Rates {
  /** Net factor applied to gross commission: `1 - 0.195`
    * (`kpi_receita_farmer_m_passado/extract.py:49`). */
  val Net = "0.805"

  /** COE / structured-ops gross factor
    * (`kpi_receita_farmer_m_presente/extract.py:40-42`). */
  val Coe = "0.95"

  /** Component revenue weights, keyed by (returnflag, linestatus) in the
    * testdata analog — mirrors the reference's six per-component rates
    * `bovespa*0.665 + ... + fixed*0.475` at
    * `kpi_receita_farmer_m_presente/extract.py:64-89`.
    */
  val ComponentWeights: Seq[((String, String), String)] = Seq(
    ("R", "F") -> "0.665",
    ("R", "O") -> "0.665",
    ("A", "F") -> "0.475",
    ("A", "O") -> "0.475",
    ("N", "F") -> "0.50",
    ("N", "O") -> "0.58")

  /** Commission share of gross revenue in the detail pipeline analog
    * (`kpi_receita_cliente/extract.py:205-210`). */
  val CoePct = "5"

  /** Structured-ops commission share. */
  val OpPct = "4"
}
