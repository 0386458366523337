package graft.ops

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Month-spine generator (reference operator C4/J9/A9).
  *
  * The reference asks Postgres for `generate_series(start, end, '1 month')`
  * and left-joins monthly aggregates onto it so empty months still appear
  * (`kpi_receita_cliente/extract.py:41-55`).  Spark-first: a single-row
  * `sequence(...)` literal exploded into one row per month — no data shuffle,
  * the spine is a few dozen rows regardless of fact-table size, and Catalyst
  * broadcasts it into any join.
  */
object MonthSpine {

  /** One row per month in [start, end], column `mes: DATE`. */
  def apply(spark: SparkSession, start: LocalDate, end: LocalDate): DataFrame =
    spark.range(1).select(
      explode(sequence(
        to_date(lit(start.toString)),
        to_date(lit(end.toString)),
        expr("INTERVAL 1 MONTH"))).as("mes"))

  /** Shared oracle fragment: DuckDB spells the same idiom with
    * `generate_series` + `unnest`. */
  def oracleSpine(start: LocalDate, end: LocalDate): String =
    s"""SELECT CAST(unnest(generate_series(
       |  DATE '$start', DATE '$end', INTERVAL 1 MONTH)) AS DATE) AS mes""".stripMargin
}
