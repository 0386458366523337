package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** "Last snapshot of the month" selector (reference operators J6/W1/U3).
  *
  * The reference's `positivador_historical` is a daily snapshot table where
  * only the month's last snapshot is meaningful; every consumer derives
  * `MAX(record_date) OVER (PARTITION BY month)` and keeps rows on that date
  * (`kpi_receita_farmer_m_presente/extract.py:30-35`,
  * `kpi_receita_cliente/extract.py:92-100`).
  *
  * Spark-first: a `groupBy(month).agg(max(date))` followed by a broadcast
  * join back onto the fact, NOT a window function.  A window
  * `PARTITION BY month` would shuffle the full 100 TB fact into one
  * partition per month (a handful of partitions → extreme skew); the
  * aggregate reduces map-side to one row per month and the join back is a
  * broadcast of a tiny table, so the fact table is never shuffled at all.
  */
object Snapshot {

  /** Distinct (mes, ultima_data) pairs — one row per month. */
  def lastDates(df: DataFrame, dateCol: Column): DataFrame =
    df.groupBy(to_date(date_trunc("month", dateCol)).as("mes"))
      .agg(max(to_date(dateCol)).as("ultima_data"))

  /** Rows of `df` falling on their month's last snapshot date. */
  def atMonthEnd(df: DataFrame, dateCol: Column): DataFrame =
    df.join(broadcast(lastDates(df, dateCol)),
      to_date(dateCol) === col("ultima_data"))

  /** Oracle fragment for [[lastDates]] over a table/column. */
  def oracleLastDates(table: String, col: String): String =
    s"""SELECT CAST(DATE_TRUNC('month', $col) AS DATE) AS mes,
       |  MAX(CAST($col AS DATE)) AS ultima_data
       |FROM $table GROUP BY 1""".stripMargin
}
