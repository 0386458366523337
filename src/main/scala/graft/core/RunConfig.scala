package graft.core

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Run-scoped parameters.
  *
  * The reference anchors every query on `NOW()` / `CURRENT_DATE` (e.g.
  * `kpis/farmer/receita/kpi_receita_farmer_m_passado/extract.py:54-55`,
  * `kpis/farmer/comissao/kpi_fechamento_m_presente/extract.py:171`).  The
  * rebuild parameterizes the anchor as [[runDate]] so that (a) tests and the
  * DuckDB oracle are deterministic, and (b) the "past month" pipeline P5 and
  * the "current month" pipeline P6 collapse into one month-parameterized
  * implementation (the reference duplicated the code instead and shipped P5
  * broken — `kpi_fechamento_m_passado/main.py:26-28`).
  *
  * The default anchor 2001-08-15 sits inside the synthetic testdata's date
  * range (orders span 1995-01..2001-08, see /root/repo/TESTDATA.md), so the
  * "current month" is 2001-08 and the default 11-months-back window is
  * [2000-09-01, 2001-08-01).
  *
  * @param runDate    logical "today" (replaces `NOW()`)
  * @param monthsBack rolling window size in months, excluding the current
  *                   month (reference default 11, `run_etl.ps1:4`)
  * @param farmerId   optional scope filter (reference `--farmer-id` CLI arg,
  *                   `kpi_receita_farmer_m_passado/extract.py:60-62`)
  */
final case class RunConfig(
    runDate: LocalDate = RunConfig.DefaultRunDate,
    monthsBack: Int = 11,
    farmerId: Option[Int] = None) {

  /** First day of the current month — `DATE_TRUNC('month', NOW())`. */
  def currentMonthStart: LocalDate = runDate.withDayOfMonth(1)

  /** Inclusive lower bound of the rolling window —
    * `DATE_TRUNC('month', NOW()) - INTERVAL 'N months'`.
    */
  def windowStart: LocalDate = currentMonthStart.minusMonths(monthsBack.toLong)

  /** Column literal for [[currentMonthStart]]. */
  def currentMonthCol: Column = to_date(lit(currentMonthStart.toString))

  /** Column literal for [[windowStart]]. */
  def windowStartCol: Column = to_date(lit(windowStart.toString))

  /** Column literal for [[runDate]]. */
  def runDateCol: Column = to_date(lit(runDate.toString))

  /** Exclusive upper bound of the current month — used to express
    * "current month" as a range predicate the parquet scan can push down
    * (`date_trunc('month', d) = m` is not pushable; `m <= d < m+1` is). */
  def nextMonthStart: LocalDate = currentMonthStart.plusMonths(1)

  def nextMonthCol: Column = to_date(lit(nextMonthStart.toString))
}

object RunConfig {
  /** Pinned default anchor used by SparkEntry + oracle SQL. */
  val DefaultRunDate: LocalDate = LocalDate.of(2001, 8, 15)

  val default: RunConfig = RunConfig()

  /** Environment-driven run parameters (S2 parity: the reference takes
    * `--months-back`/`--farmer-id` per CLI and everything else from
    * `.env`).  `GRAFT_RUN_DATE` (ISO date) pins the `NOW()` anchor —
    * unset means the pipeline-pinned default, so tests and the oracle
    * stay deterministic; a production deployment sets it per run (or to
    * today) from the scheduler. */
  def fromEnv(env: Map[String, String]): RunConfig = RunConfig(
    runDate = env.get("GRAFT_RUN_DATE").filter(_.nonEmpty)
      .map(LocalDate.parse).getOrElse(DefaultRunDate),
    monthsBack = env.get("GRAFT_MONTHS_BACK").filter(_.nonEmpty)
      .map(_.toInt).getOrElse(11),
    farmerId = env.get("GRAFT_FARMER_ID").filter(_.nonEmpty).map(_.toInt))
}
