package graft.kpi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Rates, RunConfig, Sources}

/** P1 — monthly revenue per account manager, past months.
  *
  * Reference: `kpis/farmer/receita/kpi_receita_farmer_m_passado/extract.py:42-66`
  * — rolling-N-months filter (F2), fact→clients→employees double equi-join
  * with a cast-normalized key (J1), SUM rollup by (month, farmer, name) with
  * the `* (1 - 0.195)` net factor (A1/C17), `mes_formatado` "MM/yyyy" (C9),
  * constant `fonte` column (C16).
  *
  * Testdata analog: lineitem (revenue fact, `l_shipdate` = record_date) →
  * orders (client link) → customer (client) → nation (account manager):
  * `farmer_id` = nation key, `employee_name` = nation name.  The
  * `CAST(c_nationkey AS INT)` mirrors the reference's text-typed
  * `clients.farmer_id` normalization (`extract.py:44`).
  *
  * Scale notes: the dimension joins (customer, nation) are broadcast — no
  * shuffle of the fact table for the join; the only shuffle is the final
  * hash aggregation, which Spark executes with map-side partial aggregation.
  * The rolling-month predicate is pushed to the parquet scan
  * (`PushedFilters: [GreaterThanOrEqual(l_shipdate,...), LessThan(...)]`).
  */
object ReceitaFarmerPassado {

  private val measures: Seq[(String, String)] = Seq(
    "receita_bruta" -> Frag.sumMoney(Frag.money("l_extendedprice")),
    "receita_liquida" -> Frag.sumMoney(
      s"${Frag.money("l_extendedprice")} * (1 - ${Frag.rate("l_discount")})"),
    "comissao_bruta" -> Frag.sumMoney(
      s"${Frag.money("l_extendedprice")} * ${Frag.rate("l_tax")}"),
    "comissao_liquida" -> Frag.sumMoney(
      s"${Frag.money("l_extendedprice")} * ${Frag.rate("l_tax")} * ${Rates.Net}"))

  def apply(spark: SparkSession, dir: String,
      cfg: RunConfig = RunConfig.default): DataFrame = {
    val li = Sources.lineitem(spark, dir)
      .filter(col("l_shipdate") >= cfg.windowStartCol &&
        col("l_shipdate") < cfg.currentMonthCol)
    val ord = Sources.orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = Sources.customer(spark, dir).select("c_custkey", "c_nationkey")
    val nat = Sources.nation(spark, dir).select("n_nationkey", "n_name")

    val fact = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat),
        col("c_nationkey").cast("int") === col("n_nationkey"))

    val scoped = cfg.farmerId // F8 param-driven dynamic predicate
      .map(id => fact.filter(col("n_nationkey") === id)).getOrElse(fact)

    scoped
      .groupBy(expr(Frag.mes("l_shipdate")).as("mes"),
        col("n_nationkey").as("farmer_id"), col("n_name").as("employee_name"))
      .agg(measures.map { case (n, e) => expr(e).as(n) }.head,
        measures.map { case (n, e) => expr(e).as(n) }.tail: _*)
      .withColumn("mes_formatado", date_format(col("mes"), "MM/yyyy"))
      .withColumn("fonte", lit("historical"))
  }

  def oracle(cfg: RunConfig = RunConfig.default): String = {
    val aggs = measures.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val scope = cfg.farmerId // F8 mirror
      .map(id => s"\n  AND n_nationkey = $id").getOrElse("")
    s"""SELECT ${Frag.mes("l_shipdate")} AS mes,
       |  n_nationkey AS farmer_id, n_name AS employee_name, $aggs,
       |  strftime(${Frag.mes("l_shipdate")}, '%m/%Y') AS mes_formatado,
       |  'historical' AS fonte
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON CAST(c_nationkey AS INT) = n_nationkey
       |WHERE l_shipdate >= DATE '${cfg.windowStart}'
       |  AND l_shipdate < DATE '${cfg.currentMonthStart}'$scope
       |GROUP BY 1, 2, 3""".stripMargin
  }
}
