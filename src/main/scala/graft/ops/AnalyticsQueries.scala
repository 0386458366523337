package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** General-analytics operators beyond the reference's surface (SURVEY.md §2
  * marks these ABSENT in ETL-Gamma): rollup hierarchies, distinct and
  * sketch aggregates, JSON extraction, pivot.  A user replacing the
  * reference gets the analytics their next query will inevitably need.
  */
object AnalyticsQueries {

  /** ROLLUP hierarchy totals (reference has no grouping sets at all). */
  def rollup(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(expr(Frag.sumMoney(Frag.money("l_extendedprice"))).as("receita"),
        count(lit(1)).as("n"))

  val rollupOracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Frag.sumMoney(Frag.money("l_extendedprice"))} AS receita,
       |  COUNT(*) AS n
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Exact COUNT(DISTINCT) per group. */
  def countDistinct(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinctCol.as("n_parts"), count(lit(1)).as("n_rows"))

  private def countDistinctCol =
    count_distinct(col("l_partkey"))

  val countDistinctOracle: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY 1""".stripMargin

  /** HLL++ sketch cardinality — the scale path when exact distinct would
    * shuffle every key: the sketch merges map-side in O(registers).
    * Deterministic (register maxima are order-insensitive) but
    * engine-specific, so rows-only. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        count_distinct(col("l_partkey")).as("exact_parts"))

  /** JSON extraction over the events props payload (C-series analog the
    * reference never needed — its payloads were relational). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast("int").as("k_int"),
      get_json_object(col("props"), "$.missing").as("missing"))

  val jsonExtractOracle: String =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      |  json_extract_string(props, '$.missing') AS missing
      |FROM events""".stripMargin

  /** Pivot: monthly revenue with one column per return flag. */
  def pivot(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .groupBy(expr(Frag.mes("l_shipdate")).as("mes"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(expr(Frag.sumMoney(Frag.money("l_extendedprice"))))

  val pivotOracle: String =
    s"""SELECT ${Frag.mes("l_shipdate")} AS mes,
       |  ${Frag.sumMoney(s"CASE WHEN l_returnflag = 'A' THEN ${Frag.money("l_extendedprice")} END")} AS A,
       |  ${Frag.sumMoney(s"CASE WHEN l_returnflag = 'N' THEN ${Frag.money("l_extendedprice")} END")} AS N,
       |  ${Frag.sumMoney(s"CASE WHEN l_returnflag = 'R' THEN ${Frag.money("l_extendedprice")} END")} AS R
       |FROM lineitem GROUP BY 1""".stripMargin
}
