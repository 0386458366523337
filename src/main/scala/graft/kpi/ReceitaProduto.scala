package graft.kpi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, RunConfig, Sources}

/** P4 — revenue rollup per product, past months.
  *
  * Reference: `kpis/farmer/receita/kpi_receita_produto_f_m_passado/` —
  * product-grain SUM rollup (A2, `extract.py:46-75`), NULL category/product
  * defaulting to 'OUTROS' (F10, `extract.py:85-86` + `transform.py:43-50`),
  * positive-measure filter (F6, `transform.py:63`), strictly-past-month
  * filter (F7 — the *intent* of `transform.py:39`, whose tz-aware/naive
  * comparison raises `TypeError` in the reference; defect #4 in SURVEY.md §0).
  *
  * Testdata analog: category = p_type, product = p_brand, with NULLs
  * synthesized deterministically from p_size so the 'OUTROS' path is
  * actually exercised; farmer = customer's nation, as in P1.
  */
object ReceitaProduto {

  /** F10 — 'OUTROS' defaulting with deterministically synthesized NULLs. */
  private val category = "COALESCE(CASE WHEN p_size >= 10 THEN p_type END, 'OUTROS')"
  private val product = "COALESCE(CASE WHEN p_size >= 5 THEN p_brand END, 'OUTROS')"

  private val m = Frag.money("l_extendedprice")

  def apply(spark: SparkSession, dir: String,
      cfg: RunConfig = RunConfig.default): DataFrame = {
    // F2 + F7: strictly-past-month as a plain date bound — for a month
    // start m, date_trunc('month', d) < m  ⟺  d < m, and the latter pushes
    // to the parquet scan.
    val li = Sources.lineitem(spark, dir)
      .filter(col("l_shipdate") >= cfg.windowStartCol &&
        col("l_shipdate") < cfg.currentMonthCol)
    val prt = Sources.part(spark, dir).select("p_partkey", "p_type", "p_brand", "p_size")
    val ord = Sources.orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = Sources.customer(spark, dir).select("c_custkey", "c_nationkey")
    val nat = Sources.nation(spark, dir).select("n_nationkey", "n_name")

    li.join(broadcast(prt), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey").cast("int") === col("n_nationkey"))
      .groupBy(
        expr(Frag.mes("l_shipdate")).as("mes"),
        expr(category).as("category"),
        expr(product).as("product"),
        col("n_nationkey").as("farmer_id"),
        col("n_name").as("employee_name"))
      .agg(expr(Frag.sumMoney(m)).as("receita_bruta"))
      .filter(col("receita_bruta") > 0) // F6
      .withColumn("mes_formatado", date_format(col("mes"), "MM/yyyy"))
      .withColumn("fonte", lit("historical"))
  }

  def oracle(cfg: RunConfig = RunConfig.default): String =
    s"""SELECT ${Frag.mes("l_shipdate")} AS mes,
       |  $category AS category, $product AS product,
       |  n_nationkey AS farmer_id, n_name AS employee_name,
       |  ${Frag.sumMoney(m)} AS receita_bruta,
       |  strftime(${Frag.mes("l_shipdate")}, '%m/%Y') AS mes_formatado,
       |  'historical' AS fonte
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON CAST(c_nationkey AS INT) = n_nationkey
       |WHERE l_shipdate >= DATE '${cfg.windowStart}'
       |  AND l_shipdate < DATE '${cfg.currentMonthStart}'
       |GROUP BY 1, 2, 3, 4, 5
       |HAVING ${Frag.sumMoney(m)} > 0""".stripMargin
}
