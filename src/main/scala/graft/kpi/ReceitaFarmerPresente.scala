package graft.kpi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Rates, RunConfig, Sources}
import graft.ops.Snapshot

/** P2 — firm-level revenue, current month.
  *
  * Reference: `kpis/farmer/receita/kpi_receita_farmer_m_presente/extract.py:22-96`
  * — current-month predicate (F3), last-snapshot-of-month selection (W1/J6
  * via `ultima_data_mes` CTE, extract.py:30-35), firm-level weighted
  * 6-component aggregation (A3, extract.py:64-89), COE revenue aggregate
  * (A5, extract.py:37-49), structured-ops aggregate (A6, extract.py:50-62),
  * assembled by left joins on the month (J2, extract.py:94-95).
  *
  * Testdata analog: the daily-snapshot table is lineitem (snapshot day = the
  * month's max shipdate); component weights key off
  * (l_returnflag, l_linestatus); COE = orders with status 'F' ("Liquidada"
  * analog); structured ops = urgent orders not in status 'P' ("Cancelado"
  * analog).
  *
  * Scale notes: each CTE is an independent aggregate whose shuffle carries
  * one row per group (month) after map-side partial aggregation; the final
  * J2 joins are single-row broadcasts.  Month-end selection uses
  * groupBy+broadcast-join, not a window, so the fact table never shuffles
  * (see [[graft.ops.Snapshot]]).
  *
  * Resolution of SURVEY.md defect #3: the reference's P2 loader deletes by
  * a `farmer_id` column its firm-level table does not have
  * (`kpi_receita_farmer_m_presente/load.py:44-48`), so its farmer-scoped
  * reload can never have worked.  This rebuild intentionally drops that
  * dead parameter: P2 is firm-grain, so the idempotent reload key is the
  * month alone ([[graft.core.Sinks.overwriteByKey]] on `mes`); farmer-
  * scoped reload exists only where farmer is a real grain (P1/P3-P6 via
  * `RunConfig.farmerId`).
  */
object ReceitaFarmerPresente {

  private val m = Frag.money("l_extendedprice")
  private val w = Rates.WeightCase

  def apply(spark: SparkSession, dir: String,
      cfg: RunConfig = RunConfig.default): DataFrame = {
    // F3 as a pushable range: date_trunc-equality would block parquet
    // predicate pushdown (verified via explain("formatted")).
    val li = Sources.lineitem(spark, dir)
      .filter(col("l_shipdate") >= cfg.currentMonthCol &&
        col("l_shipdate") < cfg.nextMonthCol)
    val snap = Snapshot.atMonthEnd(li, col("l_shipdate"))

    val main = snap.groupBy(col("mes"))
      .agg(
        expr(Frag.sumMoney(m)).as("pos_receita"),
        expr(Frag.sumMoney(s"$m * ($w)")).as("pos_comissao"))

    val ord = Sources.orders(spark, dir)
      .filter(col("o_orderdate") >= cfg.currentMonthCol &&
        col("o_orderdate") < cfg.nextMonthCol)
    val tp = Frag.money("o_totalprice")

    // OPTIMIZATION r14 (guide §2.3/§2.4): coe + op were two separate
    // filtered aggregates over the same month-scoped orders scan; both
    // key on mes, so one conditional aggregate computes all four sums in
    // a single orders pass.  A month with orders but no 'F' (or no
    // urgent) rows gets NULL sums — identical to the old
    // missing-row-then-LEFT-JOIN NULL (the projection COALESCEs), so the
    // output is unchanged (oracle hash gate).
    val coeCond = "o_orderstatus = 'F'" // F4 'Liquidada' analog
    val opCond = // F4 '!= Cancelado' analog
      "o_orderpriority = '1-URGENT' AND o_orderstatus <> 'P'"
    val ordAgg = ord
      .groupBy(expr(Frag.mes("o_orderdate")).as("mes"))
      .agg(
        expr(Frag.sumMoney(s"CASE WHEN $coeCond THEN " +
          s"$tp * ${Rates.CoeShare} END")).as("coe_receita"),
        expr(Frag.sumMoney(s"CASE WHEN $coeCond THEN " +
          s"$tp * ${Rates.CoeShare} * ${Rates.Coe} END")).as("coe_comissao"),
        expr(Frag.sumMoney(s"CASE WHEN $opCond THEN " +
          s"$tp * ${Rates.OpShare} END")).as("op_receita"),
        expr(Frag.sumMoney(s"CASE WHEN $opCond THEN " +
          s"$tp * ${Rates.OpShare} * ${Rates.Coe} END")).as("op_comissao"))

    main
      .join(broadcast(ordAgg), Seq("mes"), "left") // J2
      .select(
        col("mes"),
        date_format(col("mes"), "MM/yyyy").as("mes_formatado"),
        expr(Frag.asMoney(
          "pos_receita + COALESCE(coe_receita, 0) + COALESCE(op_receita, 0)"))
          .as("receita_bruta"),
        expr(Frag.asMoney(
          "pos_comissao + COALESCE(coe_comissao, 0) + COALESCE(op_comissao, 0)"))
          .as("comissao_bruta"),
        expr(Frag.asMoney(
          s"(pos_comissao + COALESCE(coe_comissao, 0) + COALESCE(op_comissao, 0)) * ${Rates.Net}"))
          .as("comissao_liquida"),
        lit("positivador").as("fonte"))
  }

  def oracle(cfg: RunConfig = RunConfig.default): String = {
    val mes = s"DATE '${cfg.currentMonthStart}'"
    val nextMes = s"DATE '${cfg.nextMonthStart}'"
    s"""WITH snap AS (
       |  SELECT l.* FROM lineitem l
       |  JOIN (SELECT MAX(CAST(l_shipdate AS DATE)) AS ultima_data FROM lineitem
       |        WHERE l_shipdate >= $mes AND l_shipdate < $nextMes) u
       |    ON CAST(l.l_shipdate AS DATE) = u.ultima_data),
       |main AS (
       |  SELECT $mes AS mes, ${Frag.sumMoney(m)} AS pos_receita,
       |         ${Frag.sumMoney(s"$m * ($w)")} AS pos_comissao
       |  FROM snap),
       |coe AS (
       |  SELECT ${Frag.mes("o_orderdate")} AS mes,
       |         ${Frag.sumMoney(s"${Frag.money("o_totalprice")} * ${Rates.CoeShare}")} AS coe_receita,
       |         ${Frag.sumMoney(s"${Frag.money("o_totalprice")} * ${Rates.CoeShare} * ${Rates.Coe}")} AS coe_comissao
       |  FROM orders
       |  WHERE o_orderdate >= $mes AND o_orderdate < $nextMes
       |    AND o_orderstatus = 'F'
       |  GROUP BY 1),
       |op AS (
       |  SELECT ${Frag.mes("o_orderdate")} AS mes,
       |         ${Frag.sumMoney(s"${Frag.money("o_totalprice")} * ${Rates.OpShare}")} AS op_receita,
       |         ${Frag.sumMoney(s"${Frag.money("o_totalprice")} * ${Rates.OpShare} * ${Rates.Coe}")} AS op_comissao
       |  FROM orders
       |  WHERE o_orderdate >= $mes AND o_orderdate < $nextMes
       |    AND o_orderpriority = '1-URGENT' AND o_orderstatus <> 'P'
       |  GROUP BY 1)
       |SELECT main.mes, strftime(main.mes, '%m/%Y') AS mes_formatado,
       |  ${Frag.asMoney("pos_receita + COALESCE(coe_receita, 0) + COALESCE(op_receita, 0)")} AS receita_bruta,
       |  ${Frag.asMoney("pos_comissao + COALESCE(coe_comissao, 0) + COALESCE(op_comissao, 0)")} AS comissao_bruta,
       |  ${Frag.asMoney(s"(pos_comissao + COALESCE(coe_comissao, 0) + COALESCE(op_comissao, 0)) * ${Rates.Net}")} AS comissao_liquida,
       |  'positivador' AS fonte
       |FROM main
       |LEFT JOIN coe ON main.mes = coe.mes
       |LEFT JOIN op ON main.mes = op.mes""".stripMargin
  }
}
