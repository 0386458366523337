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

  /** Commission share of gross revenue in the COE detail analog
    * (`kpi_receita_cliente/extract.py:205-210`). */
  val CoeShare = "0.05"

  /** Structured-ops commission share. */
  val OpShare = "0.04"

  /** Hierarchy-tiered bonus rates (compensation table analog,
    * `kpi_fechamento_m_presente/extract.py:190-216`). */
  val JuniorRevenueBonus = "0.015"
  val PlenoRevenueBonus = "0.025"
  val JuniorCaptacaoBonus = "0.01"
  val PlenoCaptacaoBonus = "0.02"
  val JuniorChurnBonus = "0.005"
  val PlenoChurnBonus = "0.0075"

  /** Shared CASE fragment applying [[ComponentWeights]] to a lineitem row —
    * the per-component rate weighting of
    * `kpi_receita_farmer_m_presente/extract.py:64-89`. */
  val WeightCase: String = "CASE " + ComponentWeights.map { case ((rf, ls), w) =>
    s"WHEN l_returnflag = '$rf' AND l_linestatus = '$ls' THEN $w"
  }.mkString(" ") + " ELSE 0 END"
}
