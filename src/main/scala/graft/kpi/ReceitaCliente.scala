package graft.kpi

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Frag, Rates, RunConfig, Sources}
import graft.ops.Snapshot

/** P3 — per-client revenue detail, three-source union.
  *
  * Reference: `kpis/farmer/receita/kpi_receita_cliente/` — three independent
  * extracts (positivador snapshot detail `extract.py:92-152`, COE detail
  * `extract.py:195-223`, structured-ops detail `extract.py:265-293`) are
  * concatenated with NULL-padded columns and a `tipo_operacao` discriminator
  * (U2, `transform.py:33-62`), enriched with client + farmer names (J1),
  * bounded by a BETWEEN date window (F5, `extract.py:145,216`), and
  * presentation-sorted (O1, `transform.py:122`).
  *
  * Scale notes: the three sources are one DAG — Spark scans each input once
  * and the union is a zero-cost plan node (no shuffle).  Dimension joins are
  * broadcasts; the only shuffle is the final sort, which the reference also
  * pays (it sorts the whole frame in pandas).
  */
object ReceitaCliente {

  private val m = Frag.money("l_extendedprice")
  private val w = Rates.WeightCase
  private val tp = Frag.money("o_totalprice")

  private def nullMoney: Column = lit(null).cast(DecimalType(18, 2))

  def apply(spark: SparkSession, dir: String,
      cfg: RunConfig = RunConfig.default): DataFrame = {
    val ord = Sources.orders(spark, dir)

    // Source 1 — snapshot detail rows (J6) with per-row weighted measures.
    val positivador = Snapshot
      .atMonthEnd(Sources.lineitem(spark, dir), col("l_shipdate"))
      .join(ord.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        to_date(col("l_shipdate")).as("data_operacao"),
        lit("Positivador").as("tipo_operacao"),
        col("o_custkey").as("client_id"),
        expr(m).as("valor_financeiro"),
        lit(null).cast(DecimalType(5, 2)).as("percentual_comissao"),
        expr(Frag.asMoney(s"$m * ($w)")).as("receita_bruta"),
        expr(Frag.asMoney(s"$m * ($w) * ${Rates.Coe}")).as("comissao_bruta"),
        expr(Frag.asMoney(s"$m * ($w) * ${Rates.Coe} * ${Rates.Net}"))
          .as("comissao_liquida"),
        col("l_linestatus").as("status"),
        expr(Frag.asMoney(
          s"CASE WHEN l_returnflag = 'R' THEN ${Frag.money("l_quantity")} ELSE 0 END"))
          .as("churn"),
        expr(Frag.asMoney(m)).as("patrimony"),
        expr(Frag.asMoney(s"$m * (1 - ${Frag.rate("l_discount")})"))
          .as("net_capture"))

    // Source 2 + 3 — COE and structured-ops detail rows.
    // OPTIMIZATION r14 (guide §2.3/§2.4): the two branches were separate
    // filtered projections of the SAME orders scan UNIONed together —
    // two fact passes.  One scan now emits both streams: each row builds
    // an array of its (at most two) matching branch structs and explodes
    // it — identical rows (an order matching both predicates still
    // yields both detail rows), one orders pass.  The date-window filter
    // is applied to the scan BEFORE the explode (both branches derive
    // data_operacao from o_orderdate identically), so predicate pushdown
    // to parquet survives the generator.  Oracle unchanged (hash gate).
    val coeCond = "o_orderstatus = 'F'"
    val opCond = "o_orderpriority = '1-URGENT' AND o_orderstatus <> 'P'"
    def branchStruct(tipo: String, pctExpr: String, share: String) =
      s"""struct(
         |  CAST(o_orderdate AS DATE) AS data_operacao,
         |  '$tipo' AS tipo_operacao,
         |  o_custkey AS client_id,
         |  $tp AS valor_financeiro,
         |  $pctExpr AS percentual_comissao,
         |  ${Frag.asMoney(s"$tp * $share")} AS receita_bruta,
         |  ${Frag.asMoney(s"$tp * $share * ${Rates.Coe}")} AS comissao_bruta,
         |  ${Frag.asMoney(s"$tp * $share * ${Rates.Coe} * ${Rates.Net}")}
         |    AS comissao_liquida,
         |  o_orderstatus AS status,
         |  CAST(NULL AS DECIMAL(18,2)) AS churn,
         |  CAST(NULL AS DECIMAL(18,2)) AS patrimony,
         |  CAST(NULL AS DECIMAL(18,2)) AS net_capture)""".stripMargin
    val coeOp = ord
      .filter(expr(s"($coeCond) OR ($opCond)"))
      .filter(to_date(col("o_orderdate"))
        .between(cfg.windowStartCol, cfg.runDateCol))
      .select(explode(expr(
        s"""array(
           |  CASE WHEN $coeCond THEN ${branchStruct("COE",
                s"CAST(100 * ${Rates.CoeShare} AS DECIMAL(5,2))", Rates.CoeShare)} END,
           |  CASE WHEN $opCond THEN ${branchStruct("OperacaoEstruturada",
                s"CAST(100 * ${Rates.OpShare} AS DECIMAL(5,2))", Rates.OpShare)} END)"""
          .stripMargin)).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.*"))

    val cust = Sources.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val nat = Sources.nation(spark, dir).select("n_nationkey", "n_name")

    positivador.unionByName(coeOp) // U2 (coe+op emitted by one scan)
      .filter(col("data_operacao").between(cfg.windowStartCol, cfg.runDateCol)) // F5
      .join(broadcast(cust), col("client_id") === col("c_custkey")) // J1
      .join(broadcast(nat), col("c_nationkey").cast("int") === col("n_nationkey"))
      .select(
        col("data_operacao"),
        expr(Frag.mes("data_operacao")).as("mes"),
        date_format(expr(Frag.mes("data_operacao")), "MM/yyyy").as("mes_formatado"),
        col("tipo_operacao"), col("client_id"), col("c_name").as("nome_cliente"),
        col("n_nationkey").as("farmer_id"), col("n_name").as("nome_farmer"),
        col("valor_financeiro"), col("percentual_comissao"), col("receita_bruta"),
        col("comissao_bruta"), col("comissao_liquida"), col("status"),
        col("churn"), col("patrimony"), col("net_capture"),
        expr(s"CAST(DATE '${cfg.runDate}' AS TIMESTAMP)").as("updated_at"))
      .orderBy(col("data_operacao").desc, col("tipo_operacao").asc,
        col("nome_cliente").asc) // O1
  }

  def oracle(cfg: RunConfig = RunConfig.default): String = {
    def src(body: String): String = body
    s"""WITH snap AS (
       |  SELECT l.* FROM lineitem l
       |  JOIN (SELECT ${Frag.mes("l_shipdate")} AS mes,
       |               MAX(CAST(l_shipdate AS DATE)) AS ultima_data
       |        FROM lineitem GROUP BY 1) u
       |    ON CAST(l.l_shipdate AS DATE) = u.ultima_data),
       |positivador AS (
       |  SELECT CAST(l_shipdate AS DATE) AS data_operacao,
       |    'Positivador' AS tipo_operacao, o_custkey AS client_id,
       |    $m AS valor_financeiro,
       |    CAST(NULL AS DECIMAL(5,2)) AS percentual_comissao,
       |    ${Frag.asMoney(s"$m * ($w)")} AS receita_bruta,
       |    ${Frag.asMoney(s"$m * ($w) * ${Rates.Coe}")} AS comissao_bruta,
       |    ${Frag.asMoney(s"$m * ($w) * ${Rates.Coe} * ${Rates.Net}")} AS comissao_liquida,
       |    l_linestatus AS status,
       |    ${Frag.asMoney(s"CASE WHEN l_returnflag = 'R' THEN ${Frag.money("l_quantity")} ELSE 0 END")} AS churn,
       |    ${Frag.asMoney(m)} AS patrimony,
       |    ${Frag.asMoney(s"$m * (1 - ${Frag.rate("l_discount")})")} AS net_capture
       |  FROM snap JOIN orders ON l_orderkey = o_orderkey),
       |coe AS (
       |  SELECT CAST(o_orderdate AS DATE) AS data_operacao, 'COE' AS tipo_operacao,
       |    o_custkey AS client_id, $tp AS valor_financeiro,
       |    CAST(100 * ${Rates.CoeShare} AS DECIMAL(5,2)) AS percentual_comissao,
       |    ${Frag.asMoney(s"$tp * ${Rates.CoeShare}")} AS receita_bruta,
       |    ${Frag.asMoney(s"$tp * ${Rates.CoeShare} * ${Rates.Coe}")} AS comissao_bruta,
       |    ${Frag.asMoney(s"$tp * ${Rates.CoeShare} * ${Rates.Coe} * ${Rates.Net}")} AS comissao_liquida,
       |    o_orderstatus AS status, CAST(NULL AS DECIMAL(18,2)) AS churn,
       |    CAST(NULL AS DECIMAL(18,2)) AS patrimony, CAST(NULL AS DECIMAL(18,2)) AS net_capture
       |  FROM orders WHERE o_orderstatus = 'F'),
       |op_est AS (
       |  SELECT CAST(o_orderdate AS DATE) AS data_operacao,
       |    'OperacaoEstruturada' AS tipo_operacao,
       |    o_custkey AS client_id, $tp AS valor_financeiro,
       |    CAST(100 * ${Rates.OpShare} AS DECIMAL(5,2)) AS percentual_comissao,
       |    ${Frag.asMoney(s"$tp * ${Rates.OpShare}")} AS receita_bruta,
       |    ${Frag.asMoney(s"$tp * ${Rates.OpShare} * ${Rates.Coe}")} AS comissao_bruta,
       |    ${Frag.asMoney(s"$tp * ${Rates.OpShare} * ${Rates.Coe} * ${Rates.Net}")} AS comissao_liquida,
       |    o_orderstatus AS status, CAST(NULL AS DECIMAL(18,2)) AS churn,
       |    CAST(NULL AS DECIMAL(18,2)) AS patrimony, CAST(NULL AS DECIMAL(18,2)) AS net_capture
       |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'P'),
       |unioned AS (
       |  SELECT * FROM positivador UNION ALL SELECT * FROM coe
       |  UNION ALL SELECT * FROM op_est)
       |SELECT data_operacao, ${Frag.mes("data_operacao")} AS mes,
       |  strftime(${Frag.mes("data_operacao")}, '%m/%Y') AS mes_formatado,
       |  tipo_operacao, client_id, c_name AS nome_cliente,
       |  n_nationkey AS farmer_id, n_name AS nome_farmer,
       |  valor_financeiro, percentual_comissao, receita_bruta, comissao_bruta,
       |  comissao_liquida, status, churn, patrimony, net_capture,
       |  CAST(DATE '${cfg.runDate}' AS TIMESTAMP) AS updated_at
       |FROM unioned
       |JOIN customer ON client_id = c_custkey
       |JOIN nation ON CAST(c_nationkey AS INT) = n_nationkey
       |WHERE data_operacao BETWEEN DATE '${cfg.windowStart}' AND DATE '${cfg.runDate}'
       |ORDER BY data_operacao DESC, tipo_operacao ASC, nome_cliente ASC""".stripMargin
  }
}
