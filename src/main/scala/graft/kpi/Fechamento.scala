package graft.kpi

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Rates, RunConfig, Sources}
import graft.ops.Goals

/** P5 + P6 unified — the commission closing (the reference's "big query").
  *
  * Reference: `kpis/farmer/comissao/kpi_fechamento_m_presente/extract.py:22-312`,
  * a single 250-line SQL statement: per-farmer weighted revenue aggregates
  * (A4, extract.py:70-93), COE and structured-ops aggregates (A5/A6,
  * extract.py:46-69), snapshot-day captação/churn sums via a correlated
  * max-date scalar subquery (A7/J10, extract.py:106-131), responsibility
  * period min/max + DATE[] array (A8/C15, extract.py:169-172), left-join
  * assembly per farmer (J3, extract.py:102-104) including the
  * compound-condition compensation join on employee AND month (J4,
  * extract.py:254-256), and the goal/bonus CASE rulebook (C6/C8,
  * extract.py:176-252).
  *
  * The reference duplicates this logic into a broken past-month copy
  * (defect #1, `kpi_fechamento_m_passado/main.py:26-28` imports functions
  * its modules don't define); here one month-parameterized implementation
  * serves both: P6 = current month with a DATE[] period column
  * (`db_schema_comissao.py:142-178`), P5 = any past month with scalar
  * period start/end columns (`db_schema_comissao.py:50-87`).
  *
  * Scale notes: every CTE aggregates down to ≤ one row per farmer before
  * any join, so the assembly is a chain of broadcast joins on a
  * farmer-cardinality frame; the fact table is scanned once per component
  * aggregate and never shuffled at detail grain.  The scalar max-date
  * subquery is computed once and broadcast (never re-evaluated per row as
  * the reference's correlated subquery is, 3× — extract.py:112-168).
  */
object Fechamento {

  private val m = Frag.money("l_extendedprice")
  private val w = Rates.WeightCase
  private val tp = Frag.money("o_totalprice")

  private val hierarchy =
    "CASE WHEN n_nationkey % 2 = 0 THEN 'junior' ELSE 'pleno' END"

  // Goal layer fragments, shared verbatim modulo the integer-div token.
  private def goalCols(intDiv: String): Seq[(String, String)] = Seq(
    "status_churn" -> Goals.status("churn_total", "meta_churn"),
    "porcentagem_churn" -> Goals.pct("churn_total", "meta_churn", intDiv),
    "bonus_churn" -> Goals.bonus("churn_total", "meta_churn", "receita_total",
      "hierarchy_level", Rates.JuniorChurnBonus, Rates.PlenoChurnBonus),
    "status_captacao" -> Goals.status("captacao_total", "meta_captacao"),
    "porcentagem_captacao" -> Goals.pct("captacao_total", "meta_captacao", intDiv),
    "bonus_captacao" -> Goals.bonus("captacao_total", "meta_captacao",
      "receita_total", "hierarchy_level",
      Rates.JuniorCaptacaoBonus, Rates.PlenoCaptacaoBonus),
    "status_receita" -> Goals.status("receita_total", "meta_receita"),
    "porcentagem_receita" -> Goals.pct("receita_total", "meta_receita", intDiv),
    "bonus_receita" -> Goals.bonus("receita_total", "meta_receita",
      "receita_total", "hierarchy_level",
      Rates.JuniorRevenueBonus, Rates.PlenoRevenueBonus))

  private val totalCols: Seq[(String, String)] = Seq(
    "receita_total" -> Frag.asMoney(
      "COALESCE(pos_receita, 0) + COALESCE(coe_receita, 0) + COALESCE(op_receita, 0)"),
    "comissao_bruta_total" -> Frag.asMoney(
      "COALESCE(pos_comissao, 0) + COALESCE(coe_comissao, 0) + COALESCE(op_comissao, 0)"),
    "captacao_total" -> Frag.asMoney("COALESCE(captacao_raw, 0)"),
    "churn_total" -> Frag.asMoney("COALESCE(churn_raw, 0)"))

  /** @param month         closing month (first day)
    * @param isCurrent     P6 semantics (current-month flag) vs P5
    * @param periodAsArray P6's DATE[] period column
    *                      (`db_schema_comissao.py:142-178`); the primary
    *                      registered query passes false (P5-style scalar
    *                      bounds) because the driver's row-sorter crashes on
    *                      array cells — the DATE[] shape is exercised by
    *                      `q_p6_fechamento_periodo_array`, which builds the
    *                      array in-plan and string-renders it in the final
    *                      projection (hash-checked vs a concat_ws oracle).
    */
  def apply(spark: SparkSession, dir: String, month: LocalDate,
      isCurrent: Boolean, cfg: RunConfig = RunConfig.default,
      periodAsArray: Boolean = true): DataFrame = {
    val monthCol = to_date(lit(month.toString))
    val nextMonthCol = to_date(lit(month.plusMonths(1).toString))
    // Month membership as range predicates so they push to the parquet scan
    // (date_trunc-equality is not pushable).
    val li = Sources.lineitem(spark, dir)
      .filter(col("l_shipdate") >= monthCol && col("l_shipdate") < nextMonthCol)
    val ord = Sources.orders(spark, dir)
      .filter(col("o_orderdate") >= monthCol && col("o_orderdate") < nextMonthCol)
    val custFarmer = Sources.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").cast("int").as("farmer_key"))
    val orderFarmer = ord.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"), col("o_orderstatus"), col("o_orderpriority"))
      .join(broadcast(custFarmer), col("o_custkey") === col("c_custkey"))

    // Fact lineitems of the month with their farmer (via the order's client).
    val liFarmer = li.join(
      Sources.orders(spark, dir).select("o_orderkey", "o_custkey"),
      col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custFarmer), col("o_custkey") === col("c_custkey"))

    // J10 — the month's snapshot date, computed once and broadcast.
    val ultima = li.agg(max(to_date(col("l_shipdate"))).as("data_positivador"))

    // OPTIMIZATION r14 (guide §2.3/§2.4): pos + capt + churn were three
    // separate aggregates over liFarmer (capt/churn behind a snapshot-day
    // join), so the lineitem fact and its orders join ran 3×.  All three
    // key on farmer_id, so ONE conditional aggregate computes them in a
    // single fact pass: the snapshot-day membership becomes a CASE
    // predicate against the broadcast 1-row ultima.  SUM over an
    // all-NULL CASE is NULL, exactly matching the missing-row-then-
    // LEFT-JOIN NULL of the old shape (every consumer COALESCEs), so the
    // output is identical — proven by the unchanged oracle hash.
    val isSnap = "to_date(l_shipdate) = data_positivador"
    val liAgg = liFarmer.crossJoin(broadcast(ultima))
      .groupBy(col("farmer_key").as("farmer_id"))
      .agg(expr(Frag.sumMoney(m)).as("pos_receita"),
        expr(Frag.sumMoney(s"$m * ($w)")).as("pos_comissao"),
        expr(Frag.sumMoney(s"CASE WHEN $isSnap THEN " +
          s"$m * (1 - ${Frag.rate("l_discount")}) END")).as("captacao_raw"),
        expr(Frag.sumMoney(s"CASE WHEN $isSnap THEN " +
          s"(CASE WHEN l_returnflag = 'R' THEN ${Frag.money("l_quantity")} " +
          "ELSE 0 END) END")).as("churn_raw"))

    // Same fold for the orders side: coe + op + periods all key on
    // farmer_id — one conditional aggregate, one orders pass instead of 3.
    val coeCond = "o_orderstatus = 'F'"
    val opCond = "o_orderpriority = '1-URGENT' AND o_orderstatus <> 'P'"
    val ordAgg = orderFarmer.groupBy(col("farmer_key").as("farmer_id"))
      .agg(
        expr(Frag.sumMoney(s"CASE WHEN $coeCond THEN " +
          s"$tp * ${Rates.CoeShare} END")).as("coe_receita"),
        expr(Frag.sumMoney(s"CASE WHEN $coeCond THEN " +
          s"$tp * ${Rates.CoeShare} * ${Rates.Coe} END")).as("coe_comissao"),
        expr(Frag.sumMoney(s"CASE WHEN $opCond THEN " +
          s"$tp * ${Rates.OpShare} END")).as("op_receita"),
        expr(Frag.sumMoney(s"CASE WHEN $opCond THEN " +
          s"$tp * ${Rates.OpShare} * ${Rates.Coe} END")).as("op_comissao"),
        min(to_date(col("o_orderdate"))).as("periodo_inicio"),
        max(to_date(col("o_orderdate"))).as("periodo_fim_raw"))

    // Compensation analog (J4 — compound join on farmer AND month).
    val comp = Sources.supplier(spark, dir)
      .groupBy(col("s_nationkey").cast("int").as("farmer_id"))
      .agg(expr(Frag.asMoney(s"SUM(${Frag.money("s_acctbal")}) * 50")).as("meta_receita"),
        expr(Frag.asMoney(s"SUM(${Frag.money("s_acctbal")}) * 2")).as("meta_captacao"),
        expr(Frag.asMoney("COUNT(*) * 5")).as("meta_churn"))
      .withColumn("target_date", monthCol)

    val employees = Sources.nation(spark, dir).select(
      col("n_nationkey").as("farmer_id"),
      col("n_name").as("farmer_name"),
      expr(hierarchy).as("hierarchy_level"))
      .filter(col("hierarchy_level").isin("junior", "pleno")) // F4

    val assembled = employees
      .join(broadcast(liAgg), Seq("farmer_id"), "left") // J3 chain
      .join(broadcast(ordAgg), Seq("farmer_id"), "left")
      .join(broadcast(comp.withColumnRenamed("farmer_id", "comp_farmer_id")),
        col("farmer_id") === col("comp_farmer_id") &&
          col("target_date") === monthCol, "left") // J4 compound condition
      .drop("comp_farmer_id", "target_date")
      .crossJoin(broadcast(ultima))

    val totals = totalCols.foldLeft(assembled) { case (df, (n, e)) =>
      df.withColumn(n, expr(e))
    }
    val goals = goalCols(Goals.SparkDiv).foldLeft(totals) { case (df, (n, e)) =>
      df.withColumn(n, expr(e))
    }

    val base = goals.select(
      Seq(monthCol.as("mes"),
        date_format(monthCol, "MM/yyyy").as("mes_formatado"),
        col("farmer_id"), col("farmer_name"), col("hierarchy_level"),
        col("data_positivador"),
        col("churn_total"), col("meta_churn"), col("status_churn"),
        col("porcentagem_churn"), col("bonus_churn"),
        col("captacao_total"), col("meta_captacao"), col("status_captacao"),
        col("porcentagem_captacao"), col("bonus_captacao"),
        col("receita_total"), col("meta_receita"), col("status_receita"),
        col("porcentagem_receita"), col("bonus_receita"),
        col("comissao_bruta_total"),
        expr(Frag.asMoney("bonus_churn + bonus_captacao + bonus_receita"))
          .as("bonus_total"),
        lit(isCurrent).as("is_current_month")) ++
      (if (isCurrent && periodAsArray)
        Seq(array(col("periodo_inicio"),
          coalesce(col("periodo_fim_raw"), cfg.runDateCol))
          .as("periodo_responsabilidade")) // C15 DATE[] (P6 schema)
      else
        Seq(col("periodo_inicio").as("periodo_responsabilidade_inicio"),
          coalesce(col("periodo_fim_raw"), cfg.runDateCol)
            .as("periodo_responsabilidade_fim"))): _*) // P5 schema
    base
  }

  /** P5's month loop (`kpi_fechamento_m_passado/main.py:157-181` iterates
    * `mes_referencia`) as ONE single-pass plan: the month becomes a group
    * key, so the fact tables are scanned once for the whole window instead
    * of ~6 times per month (the naive union of per-month plans — and the
    * reference's sequential re-runs — scan N× more).  The oracle is
    * deliberately the naive per-month UNION ALL formulation, so the
    * correctness gate proves the one-pass rewrite equivalent.
    *
    * Months must be contiguous (the window filter is their envelope). */
  def range(spark: SparkSession, dir: String, months: Seq[LocalDate],
      cfg: RunConfig = RunConfig.default): DataFrame = {
    require(months.nonEmpty)
    val lo = to_date(lit(months.min.toString))
    val hi = to_date(lit(months.max.plusMonths(1).toString))
    val li = Sources.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
    val ord = Sources.orders(spark, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val custFarmer = Sources.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").cast("int").as("farmer_key"))

    val liFarmer = li
      .join(Sources.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custFarmer), col("o_custkey") === col("c_custkey"))
      .withColumn("mes", expr(Frag.mes("l_shipdate")))
    val ordFarmer = ord
      .join(broadcast(custFarmer), col("o_custkey") === col("c_custkey"))
      .withColumn("mes", expr(Frag.mes("o_orderdate")))

    def perFarmer(df: org.apache.spark.sql.DataFrame,
        aggs: Seq[(String, String)]) =
      df.groupBy(col("mes"), col("farmer_key").as("farmer_id"))
        .agg(expr(aggs.head._2).as(aggs.head._1),
          aggs.tail.map { case (n, e) => expr(e).as(n) }: _*)

    val ultima = liFarmer.groupBy(col("mes"))
      .agg(max(to_date(col("l_shipdate"))).as("data_positivador"))

    // OPTIMIZATION r14 (guide §2.3/§2.4): pos/capt/churn and coe/op/
    // periods were six separate aggregates, so each fact table (and the
    // lineitem-orders join) ran several times per query.  Everything
    // keys on (mes, farmer_id), so one conditional aggregate per fact
    // side computes all components in a single pass — the snapshot-day
    // membership joins the per-month ultima (aliased to a fresh key so
    // the self-derived join cannot be ambiguous) and becomes a CASE
    // predicate.  SUM over an all-NULL CASE is NULL = the old
    // missing-row-then-LEFT-JOIN NULL; consumers COALESCE, so the
    // output is identical (oracle hash unchanged, BENCH/check gates).
    val snapKeyed = ultima
      .select(col("mes").as("snap_mes"), col("data_positivador"))
    val isSnap = "to_date(l_shipdate) = data_positivador"
    val liAgg = perFarmer(
      liFarmer
        .join(broadcast(snapKeyed), col("mes") === col("snap_mes"), "left")
        .drop("snap_mes"),
      Seq(
        "pos_receita" -> Frag.sumMoney(m),
        "pos_comissao" -> Frag.sumMoney(s"$m * ($w)"),
        "captacao_raw" -> Frag.sumMoney(s"CASE WHEN $isSnap THEN " +
          s"$m * (1 - ${Frag.rate("l_discount")}) END"),
        "churn_raw" -> Frag.sumMoney(s"CASE WHEN $isSnap THEN " +
          s"(CASE WHEN l_returnflag = 'R' THEN ${Frag.money("l_quantity")} " +
          "ELSE 0 END) END")))
    val coeCond = "o_orderstatus = 'F'"
    val opCond = "o_orderpriority = '1-URGENT' AND o_orderstatus <> 'P'"
    val ordAgg = ordFarmer
      .groupBy(col("mes"), col("farmer_key").as("farmer_id"))
      .agg(
        expr(Frag.sumMoney(s"CASE WHEN $coeCond THEN " +
          s"$tp * ${Rates.CoeShare} END")).as("coe_receita"),
        expr(Frag.sumMoney(s"CASE WHEN $coeCond THEN " +
          s"$tp * ${Rates.CoeShare} * ${Rates.Coe} END")).as("coe_comissao"),
        expr(Frag.sumMoney(s"CASE WHEN $opCond THEN " +
          s"$tp * ${Rates.OpShare} END")).as("op_receita"),
        expr(Frag.sumMoney(s"CASE WHEN $opCond THEN " +
          s"$tp * ${Rates.OpShare} * ${Rates.Coe} END")).as("op_comissao"),
        min(to_date(col("o_orderdate"))).as("periodo_inicio"),
        max(to_date(col("o_orderdate"))).as("periodo_fim_raw"))

    val comp = Sources.supplier(spark, dir)
      .groupBy(col("s_nationkey").cast("int").as("comp_farmer_id"))
      .agg(expr(Frag.asMoney(s"SUM(${Frag.money("s_acctbal")}) * 50")).as("meta_receita"),
        expr(Frag.asMoney(s"SUM(${Frag.money("s_acctbal")}) * 2")).as("meta_captacao"),
        expr(Frag.asMoney("COUNT(*) * 5")).as("meta_churn"))

    val monthsDf = months.map(_.toString)
      .foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) { (acc, s) =>
        val one = spark.range(1).select(to_date(lit(s)).as("mes"))
        Some(acc.map(_ unionByName one).getOrElse(one))
      }.get
    val employees = Sources.nation(spark, dir).select(
      col("n_nationkey").as("farmer_id"),
      col("n_name").as("farmer_name"),
      expr(hierarchy).as("hierarchy_level"))
      .filter(col("hierarchy_level").isin("junior", "pleno"))
      .crossJoin(broadcast(monthsDf))

    val assembled = employees
      .join(broadcast(liAgg), Seq("mes", "farmer_id"), "left")
      .join(broadcast(ordAgg), Seq("mes", "farmer_id"), "left")
      .join(broadcast(comp), col("farmer_id") === col("comp_farmer_id"), "left")
      .drop("comp_farmer_id")
      // Same broadcast subplan as liAgg's snapKeyed join, so Spark's
      // ReuseExchange computes the per-month snapshot dates ONCE.
      .join(broadcast(snapKeyed), col("mes") === col("snap_mes"), "left")
      .drop("snap_mes")

    val totals = totalCols.foldLeft(assembled) { case (df, (n, e)) =>
      df.withColumn(n, expr(e))
    }
    val goals = goalCols(Goals.SparkDiv).foldLeft(totals) { case (df, (n, e)) =>
      df.withColumn(n, expr(e))
    }
    goals.select(
      col("mes"),
      date_format(col("mes"), "MM/yyyy").as("mes_formatado"),
      col("farmer_id"), col("farmer_name"), col("hierarchy_level"),
      col("data_positivador"),
      col("churn_total"), col("meta_churn"), col("status_churn"),
      col("porcentagem_churn"), col("bonus_churn"),
      col("captacao_total"), col("meta_captacao"), col("status_captacao"),
      col("porcentagem_captacao"), col("bonus_captacao"),
      col("receita_total"), col("meta_receita"), col("status_receita"),
      col("porcentagem_receita"), col("bonus_receita"),
      col("comissao_bruta_total"),
      expr(Frag.asMoney("bonus_churn + bonus_captacao + bonus_receita"))
        .as("bonus_total"),
      lit(false).as("is_current_month"),
      col("periodo_inicio").as("periodo_responsabilidade_inicio"),
      coalesce(col("periodo_fim_raw"), cfg.runDateCol)
        .as("periodo_responsabilidade_fim"))
  }

  def rangeOracle(months: Seq[LocalDate],
      cfg: RunConfig = RunConfig.default): String =
    months.map(m => s"SELECT * FROM (\n${oracle(m, isCurrent = false, cfg)}\n)")
      .mkString("\nUNION ALL\n")

  def oracle(month: LocalDate, isCurrent: Boolean,
      cfg: RunConfig = RunConfig.default,
      periodAsArray: Boolean = true): String = {
    val mes = s"DATE '$month'"
    val nextMes = s"DATE '${month.plusMonths(1)}'"
    val totals = totalCols.map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")
    val goals = goalCols(Goals.DuckDiv).map { case (n, e) => s"$e AS $n" }
      .mkString(",\n  ")
    val periodCols =
      if (isCurrent && periodAsArray)
        // Matches the registered query's array_join rendering: concat_ws and
        // array_join both skip NULL elements, and both engines render DATE
        // as 'yyyy-MM-dd', so the strings agree cell-for-cell.
        s"concat_ws(',', CAST(periodo_inicio AS VARCHAR), CAST(COALESCE(periodo_fim_raw, DATE '${cfg.runDate}') AS VARCHAR)) AS periodo_responsabilidade"
      else
        s"""periodo_inicio AS periodo_responsabilidade_inicio,
           |  COALESCE(periodo_fim_raw, DATE '${cfg.runDate}') AS periodo_responsabilidade_fim""".stripMargin
    s"""WITH li AS (
       |  SELECT l.*, CAST(c_nationkey AS INT) AS farmer_key
       |  FROM lineitem l
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  WHERE l_shipdate >= $mes AND l_shipdate < $nextMes),
       |ordf AS (
       |  SELECT o.*, CAST(c_nationkey AS INT) AS farmer_key
       |  FROM orders o JOIN customer ON o_custkey = c_custkey
       |  WHERE o_orderdate >= $mes AND o_orderdate < $nextMes),
       |pos AS (
       |  SELECT farmer_key AS farmer_id, ${Frag.sumMoney(m)} AS pos_receita,
       |         ${Frag.sumMoney(s"$m * ($w)")} AS pos_comissao
       |  FROM li GROUP BY 1),
       |coe AS (
       |  SELECT farmer_key AS farmer_id,
       |         ${Frag.sumMoney(s"$tp * ${Rates.CoeShare}")} AS coe_receita,
       |         ${Frag.sumMoney(s"$tp * ${Rates.CoeShare} * ${Rates.Coe}")} AS coe_comissao
       |  FROM ordf WHERE o_orderstatus = 'F' GROUP BY 1),
       |op AS (
       |  SELECT farmer_key AS farmer_id,
       |         ${Frag.sumMoney(s"$tp * ${Rates.OpShare}")} AS op_receita,
       |         ${Frag.sumMoney(s"$tp * ${Rates.OpShare} * ${Rates.Coe}")} AS op_comissao
       |  FROM ordf WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'P'
       |  GROUP BY 1),
       |ultima AS (SELECT MAX(CAST(l_shipdate AS DATE)) AS data_positivador FROM li),
       |snap_day AS (
       |  SELECT li.* FROM li, ultima
       |  WHERE CAST(l_shipdate AS DATE) = data_positivador),
       |capt AS (
       |  SELECT farmer_key AS farmer_id,
       |         ${Frag.sumMoney(s"$m * (1 - ${Frag.rate("l_discount")})")} AS captacao_raw
       |  FROM snap_day GROUP BY 1),
       |churn AS (
       |  SELECT farmer_key AS farmer_id,
       |         ${Frag.sumMoney(s"CASE WHEN l_returnflag = 'R' THEN ${Frag.money("l_quantity")} ELSE 0 END")} AS churn_raw
       |  FROM snap_day GROUP BY 1),
       |periods AS (
       |  SELECT farmer_key AS farmer_id,
       |         MIN(CAST(o_orderdate AS DATE)) AS periodo_inicio,
       |         MAX(CAST(o_orderdate AS DATE)) AS periodo_fim_raw
       |  FROM ordf GROUP BY 1),
       |comp AS (
       |  SELECT CAST(s_nationkey AS INT) AS farmer_id,
       |         ${Frag.asMoney(s"SUM(${Frag.money("s_acctbal")}) * 50")} AS meta_receita,
       |         ${Frag.asMoney(s"SUM(${Frag.money("s_acctbal")}) * 2")} AS meta_captacao,
       |         ${Frag.asMoney("COUNT(*) * 5")} AS meta_churn,
       |         $mes AS target_date
       |  FROM supplier GROUP BY 1),
       |employees AS (
       |  SELECT n_nationkey AS farmer_id, n_name AS farmer_name,
       |         $hierarchy AS hierarchy_level
       |  FROM nation
       |  WHERE ($hierarchy) IN ('junior', 'pleno')),
       |assembled AS (
       |  SELECT e.*, pos_receita, pos_comissao, coe_receita, coe_comissao,
       |         op_receita, op_comissao, captacao_raw, churn_raw,
       |         periodo_inicio, periodo_fim_raw,
       |         meta_receita, meta_captacao, meta_churn, data_positivador
       |  FROM employees e
       |  LEFT JOIN pos USING (farmer_id)
       |  LEFT JOIN coe USING (farmer_id)
       |  LEFT JOIN op USING (farmer_id)
       |  LEFT JOIN capt USING (farmer_id)
       |  LEFT JOIN churn USING (farmer_id)
       |  LEFT JOIN periods USING (farmer_id)
       |  LEFT JOIN comp ON e.farmer_id = comp.farmer_id AND comp.target_date = $mes
       |  CROSS JOIN ultima),
       |totals AS (SELECT *, $totals FROM assembled)
       |SELECT $mes AS mes, strftime($mes, '%m/%Y') AS mes_formatado,
       |  farmer_id, farmer_name, hierarchy_level, data_positivador,
       |  churn_total, meta_churn, status_churn, porcentagem_churn, bonus_churn,
       |  captacao_total, meta_captacao, status_captacao, porcentagem_captacao,
       |  bonus_captacao,
       |  receita_total, meta_receita, status_receita, porcentagem_receita,
       |  bonus_receita,
       |  comissao_bruta_total,
       |  ${Frag.asMoney("bonus_churn + bonus_captacao + bonus_receita")} AS bonus_total,
       |  $isCurrent AS is_current_month,
       |  $periodCols
       |FROM (SELECT *, $goals FROM totals) g""".stripMargin
  }
}
