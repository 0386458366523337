package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, RunConfig, Sources}

/** Small targeted queries exercising each SURVEY.md §2 operator that is not
  * already covered by a KPI pipeline, each with a DuckDB oracle.  These keep
  * individual operators visible to the correctness gate even when the
  * pipelines compose several of them.
  */
object OperatorQueries {

  /** S1/F1 — scan + projection with computed expressions. */
  def scanProject(spark: SparkSession, dir: String): DataFrame =
    Sources.region(spark, dir).select(
      col("r_regionkey"), col("r_name"),
      upper(col("r_name")).as("name_upper"),
      (col("r_regionkey") * 10 + 1).as("calc"))

  val scanProjectOracle: String =
    """SELECT r_regionkey, r_name, UPPER(r_name) AS name_upper,
      |  r_regionkey * 10 + 1 AS calc FROM region""".stripMargin

  /** F4/F5 — status equality, IN-list, BETWEEN-date predicates. */
  def filters(spark: SparkSession, dir: String, cfg: RunConfig): DataFrame =
    Sources.orders(spark, dir)
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_orderdate").between(cfg.windowStartCol, cfg.runDateCol))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"), to_date(col("o_orderdate")).as("data"),
        expr(Frag.money("o_totalprice")).as("valor"))

  def filtersOracle(cfg: RunConfig): String =
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
       |  CAST(o_orderdate AS DATE) AS data,
       |  ${Frag.money("o_totalprice")} AS valor
       |FROM orders
       |WHERE o_orderstatus = 'F'
       |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
       |  AND o_orderdate BETWEEN DATE '${cfg.windowStart}' AND DATE '${cfg.runDate}'""".stripMargin

  /** J5 — anti-join: clients with no pending ('P') order
    * (`NOT EXISTS` at `utils/client_responsibility.py:43-47`; the predicate
    * keeps the result non-empty at every scale factor). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Sources.customer(spark, dir)
      .join(Sources.orders(spark, dir)
        .filter(col("o_orderstatus") === "P").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  val antiJoinOracle: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin

  /** W1/J6/U3 — distinct (month, last snapshot date) pairs. */
  def snapshotDates(spark: SparkSession, dir: String): DataFrame =
    Snapshot.lastDates(Sources.lineitem(spark, dir), col("l_shipdate")).distinct()

  val snapshotDatesOracle: String = Snapshot.oracleLastDates("lineitem", "l_shipdate")

  /** C4/J9/A9 — month spine left-joined to monthly order aggregates. */
  def monthSpine(spark: SparkSession, dir: String, cfg: RunConfig): DataFrame = {
    val spine = MonthSpine(spark, cfg.windowStart, cfg.currentMonthStart)
    val monthly = Sources.orders(spark, dir)
      .groupBy(expr(Frag.mes("o_orderdate")).as("mes"))
      .agg(count(lit(1)).as("n_orders"),
        max(to_date(col("o_orderdate"))).as("ultima_data"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"))
    spine.join(monthly, Seq("mes"), "left")
  }

  def monthSpineOracle(cfg: RunConfig): String =
    s"""WITH spine AS (${MonthSpine.oracleSpine(cfg.windowStart, cfg.currentMonthStart)}),
       |monthly AS (
       |  SELECT ${Frag.mes("o_orderdate")} AS mes, COUNT(*) AS n_orders,
       |    MAX(CAST(o_orderdate AS DATE)) AS ultima_data,
       |    ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita
       |  FROM orders GROUP BY 1)
       |SELECT spine.mes, n_orders, ultima_data, receita
       |FROM spine LEFT JOIN monthly ON spine.mes = monthly.mes""".stripMargin

  /** J10/A10 — scalar subquery: lineitems on the global max ship date. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val li = Sources.lineitem(spark, dir)
    val maxDate = li.agg(max(to_date(col("l_shipdate"))).as("max_date"))
    li.join(broadcast(maxDate), to_date(col("l_shipdate")) === col("max_date"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr(Frag.sumMoney(Frag.money("l_extendedprice"))).as("receita"),
        max(col("max_date")).as("data"))
  }

  val scalarSubqueryOracle: String =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ${Frag.sumMoney(Frag.money("l_extendedprice"))} AS receita,
       |  MAX(CAST(l_shipdate AS DATE)) AS data
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) =
       |  (SELECT MAX(CAST(l_shipdate AS DATE)) FROM lineitem)
       |GROUP BY 1""".stripMargin

  /** W2/W3/U1/J5 — the responsibility period table itself. */
  def periods(spark: SparkSession, dir: String): DataFrame =
    Responsibility.periods(spark, dir)

  val periodsOracle: String =
    s"""WITH ${Responsibility.oraclePeriodsCte}
       |SELECT client_id, farmer_id, start_date, end_date FROM periods""".stripMargin

  private def factsDf(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .join(Sources.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("client_id"),
        to_date(col("l_shipdate")).as("fact_date"),
        expr(Frag.money("l_extendedprice")).as("receita"))

  private val factsCte: String =
    """facts AS (
      |  SELECT o_custkey AS client_id, CAST(l_shipdate AS DATE) AS fact_date,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) AS receita
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""".stripMargin

  /** J7 — interval-membership semi join replacing the reference's O(N×M)
    * pandas loop; aggregated per client to a stable summary. */
  def responsibilityFilter(spark: SparkSession, dir: String): DataFrame =
    Responsibility.filterByResponsibility(
      factsDf(spark, dir), Responsibility.periods(spark, dir),
      col("client_id"), col("fact_date"))
      .groupBy(col("client_id"))
      .agg(count(lit(1)).as("n_rows"),
        expr(Frag.sumMoney("receita")).as("receita_total"))

  // The three period-membership oracles spell the open-ended interval as
  // `fact_date < COALESCE(end_date, DATE '9999-12-31')` rather than
  // `(end_date IS NULL OR ...)`: the OR keeps DuckDB from using the
  // client_id equality as a hash-join key (it planned BLOCKWISE_NL_JOIN
  // and timed out at sf1 — r10 verdict #1); the sentinel form hash-joins
  // with inequality residuals and is equivalent for any fact_date below
  // the sentinel.  The Spark side is unchanged.
  val responsibilityFilterOracle: String =
    s"""WITH ${Responsibility.oraclePeriodsCte},
       |$factsCte
       |SELECT client_id, COUNT(*) AS n_rows,
       |  ${Frag.sumMoney("receita")} AS receita_total
       |FROM facts
       |WHERE EXISTS (
       |  SELECT 1 FROM periods p
       |  WHERE p.client_id = facts.client_id
       |    AND p.start_date <= facts.fact_date
       |    AND facts.fact_date < COALESCE(p.end_date, DATE '9999-12-31'))
       |GROUP BY 1""".stripMargin

  /** J8 — enrichment variant: July-2001 fact rows with the responsible
    * farmer attached. */
  def responsibilityEnrich(spark: SparkSession, dir: String): DataFrame =
    Responsibility.addResponsibleFarmer(
      factsDf(spark, dir)
        .filter(expr(Frag.mes("fact_date")) === to_date(lit("2001-07-01"))),
      Responsibility.periods(spark, dir),
      col("client_id"), col("fact_date"))
      .select("client_id", "fact_date", "receita", "responsible_farmer_id")

  val responsibilityEnrichOracle: String =
    s"""WITH ${Responsibility.oraclePeriodsCte},
       |$factsCte
       |SELECT facts.client_id, fact_date, receita,
       |  p.farmer_id AS responsible_farmer_id
       |FROM facts
       |LEFT JOIN periods p
       |  ON p.client_id = facts.client_id
       |  AND p.start_date <= facts.fact_date
       |  AND facts.fact_date < COALESCE(p.end_date, DATE '9999-12-31')
       |WHERE ${Frag.mes("fact_date")} = DATE '2001-07-01'""".stripMargin

  /** J8 composed into an A1-style rollup — the reference's core
    * attribution semantic: revenue credited to whoever was RESPONSIBLE for
    * the client when the fact occurred (period membership), not to the
    * client's current manager (`utils/client_responsibility.py:228-279`
    * feeding the per-farmer pipelines). */
  def revenueByResponsibility(spark: SparkSession, dir: String,
      cfg: RunConfig): DataFrame =
    Responsibility.addResponsibleFarmer(
      factsDf(spark, dir)
        .filter(col("fact_date") >= cfg.windowStartCol &&
          col("fact_date") < cfg.currentMonthCol),
      Responsibility.periods(spark, dir),
      col("client_id"), col("fact_date"))
      .groupBy(expr(Frag.mes("fact_date")).as("mes"),
        col("responsible_farmer_id"))
      .agg(count(lit(1)).as("n_rows"),
        expr(Frag.sumMoney("receita")).as("receita_total"))

  def revenueByResponsibilityOracle(cfg: RunConfig): String =
    s"""WITH ${Responsibility.oraclePeriodsCte},
       |$factsCte
       |SELECT ${Frag.mes("fact_date")} AS mes,
       |  p.farmer_id AS responsible_farmer_id,
       |  COUNT(*) AS n_rows,
       |  ${Frag.sumMoney("receita")} AS receita_total
       |FROM facts
       |LEFT JOIN periods p
       |  ON p.client_id = facts.client_id
       |  AND p.start_date <= facts.fact_date
       |  AND facts.fact_date < COALESCE(p.end_date, DATE '9999-12-31')
       |WHERE fact_date >= DATE '${cfg.windowStart}'
       |  AND fact_date < DATE '${cfg.currentMonthStart}'
       |GROUP BY 1, 2""".stripMargin

  /** U3/O1/O2 — distinct + multi-key mixed-direction sort. */
  def distinctSort(spark: SparkSession, dir: String): DataFrame =
    Sources.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment").asc, col("c_nationkey").desc)

  val distinctSortOracle: String =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment ASC, c_nationkey DESC""".stripMargin

  /** C7/C10/C11/C14 — lenient casts and date normalization over events. */
  def casts(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir).select(
      col("event_id"),
      expr("TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS INT)").as("prop_k"),
      expr("TRY_CAST(event_type AS DOUBLE)").as("bad_cast"),
      to_date(col("ts")).as("event_date"),
      expr(Frag.mes("ts")).as("mes"),
      date_format(expr(Frag.mes("ts")), "MM/yyyy").as("mes_formatado"),
      expr(Frag.money("value")).as("valor"))

  val castsOracle: String =
    s"""SELECT event_id,
       |  TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS INT) AS prop_k,
       |  TRY_CAST(event_type AS DOUBLE) AS bad_cast,
       |  CAST(ts AS DATE) AS event_date,
       |  ${Frag.mes("ts")} AS mes,
       |  strftime(${Frag.mes("ts")}, '%m/%Y') AS mes_formatado,
       |  ${Frag.money("value")} AS valor
       |FROM events""".stripMargin

  /** F9 — the reference's 3-way OR gating predicate over employee scope
    * (`kpi_fechamento_m_presente/extract.py:264-268`: the same scope
    * parameter appears three times — group gate, firm-wide gate, or an
    * exact-name match).  Analog: scope '2. Farmers' limits to the "farmers
    * group" (region 1) unless the firm-wide scope or a name match applies. */
  private def scopePredicate(scope: String, name: String): String =
    s"""('$scope' = '2. Farmers' AND n_regionkey = 1)
       | OR ('$scope' = '1. Gamma Capital')
       | OR (n_name = '$name')""".stripMargin

  def scopeFilter(spark: SparkSession, dir: String,
      scope: String = "2. Farmers", name: String = "NATION_3"): DataFrame =
    Sources.nation(spark, dir)
      .filter(expr(scopePredicate(scope, name)))
      .select(col("n_nationkey").as("farmer_id"), col("n_name"), col("n_regionkey"))

  def scopeFilterOracle(scope: String = "2. Farmers",
      name: String = "NATION_3"): String =
    s"""SELECT n_nationkey AS farmer_id, n_name, n_regionkey FROM nation
       |WHERE ${scopePredicate(scope, name)}""".stripMargin

  /** Skew-safe two-stage aggregation ([[SaltedAgg]]) — results must be
    * identical to a plain GROUP BY, which the oracle asserts. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    SaltedAgg.sums(
      Sources.lineitem(spark, dir),
      Seq("l_returnflag", "l_linestatus"),
      Seq("receita" -> Frag.money("l_extendedprice"),
        "quantidade" -> Frag.money("l_quantity")))

  val saltedAggOracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Frag.sumMoney(Frag.money("l_extendedprice"))} AS receita,
       |  ${Frag.sumMoney(Frag.money("l_quantity"))} AS quantidade
       |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** A8 — per-client min/max order dates.  Scalar columns only: the
    * driver's row-sorter crashes on array cells (round-2 verdict), so the
    * C15 DATE[] constructor lives in the rows-only [[minMaxArrayRaw]]
    * variant and in OperatorQueriesSpec. */
  def minMaxArray(spark: SparkSession, dir: String, cfg: RunConfig): DataFrame =
    Sources.orders(spark, dir)
      .groupBy(col("o_custkey").as("client_id"))
      .agg(min(to_date(col("o_orderdate"))).as("primeira"),
        max(to_date(col("o_orderdate"))).as("ultima"))

  def minMaxArrayOracle(cfg: RunConfig): String =
    s"""SELECT o_custkey AS client_id,
       |  MIN(CAST(o_orderdate AS DATE)) AS primeira,
       |  MAX(CAST(o_orderdate AS DATE)) AS ultima
       |FROM orders GROUP BY 1""".stripMargin

  /** C15 — the DATE[a,b] constructor itself (reference
    * `kpi_fechamento_m_presente/extract.py:169-172`), rows-only. */
  def minMaxArrayRaw(spark: SparkSession, dir: String, cfg: RunConfig): DataFrame =
    minMaxArray(spark, dir, cfg)
      .withColumn("periodo",
        array(col("primeira"), coalesce(col("ultima"), cfg.runDateCol)))

  /** S1 landing path — the explicit-schema CSV reader
    * ([[Sources.csv]]) exercised end-to-end under the driver gate: stage
    * `orders` out as headered CSV, read it back with the parquet truth's
    * schema, and aggregate.  The oracle aggregates the PARQUET table in
    * DuckDB, so a hash match proves the CSV round-trip is lossless for
    * every column type it carries (bigint keys, doubles via shortest
    * round-trip rendering, quoted strings, timestamps).  The re-staging is
    * deliberate (self-contained + cold-honest under the bench's
    * clear-cache protocol); at 100 TB landing files are written once by
    * the producer, and the read side here is the same one predictable
    * explicit-schema pass. */
  def landingCsv(spark: SparkSession, dir: String): DataFrame = {
    val truth = Sources.orders(spark, dir)
    val landing =
      s"/tmp/graft_landing/${new java.io.File(dir).getName}/orders_csv"
    truth.write.mode("overwrite").option("header", "true").csv(landing)
    Sources.csv(spark, landing, truth.schema)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"),
        min(to_date(col("o_orderdate"))).as("primeira"),
        max(to_date(col("o_orderdate"))).as("ultima"))
  }

  val landingCsvOracle: String =
    s"""SELECT o_orderstatus,
       |  COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita,
       |  MIN(CAST(o_orderdate AS DATE)) AS primeira,
       |  MAX(CAST(o_orderdate AS DATE)) AS ultima
       |FROM orders GROUP BY 1""".stripMargin

  /** S1 landing path, JSON-lines flavor — same contract as
    * [[landingCsv]] (stage, explicit-schema read-back, aggregate vs the
    * parquet-truth oracle), proving the JSONL round-trip for the types it
    * carries.  Distinct aggregate key so the two landing queries aren't
    * plan-identical. */
  def landingJsonl(spark: SparkSession, dir: String): DataFrame = {
    val truth = Sources.orders(spark, dir)
    val landing =
      s"/tmp/graft_landing/${new java.io.File(dir).getName}/orders_jsonl"
    truth.write.mode("overwrite").json(landing)
    Sources.jsonLines(spark, landing, truth.schema)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"))
  }

  val landingJsonlOracle: String =
    s"""SELECT o_orderpriority,
       |  COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita
       |FROM orders GROUP BY 1""".stripMargin

  /** S1 landing path, ORC flavor — same stage / explicit-schema read-back /
    * aggregate-vs-parquet-truth contract as [[landingCsv]], proving the
    * typed columnar round-trip (DECIMAL-precision doubles, dates,
    * strings).  Keyed by clerk so the three landing queries aren't
    * plan-identical. */
  def landingOrc(spark: SparkSession, dir: String): DataFrame = {
    val truth = Sources.orders(spark, dir)
    val landing =
      s"/tmp/graft_landing/${new java.io.File(dir).getName}/orders_orc"
    truth.write.mode("overwrite").orc(landing)
    Sources.orc(spark, landing, truth.schema)
      .groupBy(year(to_date(col("o_orderdate"))).cast("int").as("order_year"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"),
        max(to_date(col("o_orderdate"))).as("ultima"))
  }

  val landingOrcOracle: String =
    s"""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS order_year,
       |  COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita,
       |  MAX(CAST(o_orderdate AS DATE)) AS ultima
       |FROM orders GROUP BY 1""".stripMargin

  /** CDC "keep latest" compaction (change-log → current state): one row
    * per (user_id, event_type), the lexicographically greatest
    * (ts, event_id) observation.  Implemented as MAX over a comparison
    * struct, NOT a ROW_NUMBER window: the aggregate combines map-side, so
    * the exchange carries one candidate per key per input partition
    * instead of every log row — at 100 TB of change-log that is the
    * difference between shuffling the log and shuffling the keys.
    * event_id is unique, so the struct order is total and the trailing
    * `value` field never decides a comparison — it just rides along.
    * The oracle spells the SAME semantics as the textbook
    * ROW_NUMBER() = 1 window, so the aggregate and window formulations
    * hash-matching is itself a check of the tie-break logic. */
  def keepLatest(spark: SparkSession, dir: String): DataFrame =
    keepLatestOf(Sources.events(spark, dir))

  /** The MAX-of-struct compaction over any (user_id, event_type,
    * event_id, ts, value) frame — shared with the streaming CDC sink
    * ([[graft.streaming.EventsStream.writeCdcUpsert]]) and its spec. */
  private[graft] def keepLatestOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("last"))
      .select(col("user_id"), col("event_type"),
        col("last.event_id").as("event_id"), col("last.ts").as("ts"),
        col("last.value").as("value"))

  val keepLatestOracle: String =
    """SELECT user_id, event_type, event_id, ts, value
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                               ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1""".stripMargin

  /** SCD type-2 history reconstruction — the warehouse dual of
    * [[keepLatest]]: instead of compacting the change log to its latest
    * version per key, expand it into validity intervals
    * (valid_from, valid_to] with a version number and an is_current
    * flag — the dimension-table shape every as-of join
    * ([[graft.ops.Snapshot]]) consumes.  One LEAD per key over the
    * deterministic version order (ts, event_id): a single shuffle on
    * the key, then a per-key ordered walk — the standard distributed
    * SCD2 build (each key's history is small; the parallelism unit is
    * the key, exactly like sessionization).  The open version's
    * valid_to is NULL; `is_current` rows reproduce [[keepLatest]]'s
    * output bit-for-bit (spec-asserted). */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Sources.events(spark, dir)
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), col("version"), col("valid_from"), col("valid_to"),
        col("is_current"))
  }

  val scd2Oracle: String =
    """SELECT user_id, event_type, event_id, value,
      |  CAST(ROW_NUMBER() OVER w AS INT) AS version,
      |  ts AS valid_from,
      |  LEAD(ts) OVER w AS valid_to,
      |  (LEAD(ts) OVER w IS NULL) AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id, event_type
      |             ORDER BY ts, event_id)""".stripMargin

  /** Snapshot DIFF — the third member of the CDC family: [[keepLatest]]
    * compacts a log to current state, [[scd2]] expands it to history,
    * and this DIFFS two states into the insert/update/delete change set
    * a downstream consumer (cache invalidation, search-index sync,
    * reverse ETL) applies.  Here the two states are "as of the cutoff"
    * vs "now", both derived in-query by the keepLatest max-struct
    * aggregate; in production they are two stored table versions.
    *
    * Classification is one full-outer join on the key: a key only in
    * the new state is an INSERT, only in the old a DELETE, in both with
    * a different latest version an UPDATE; keys whose latest
    * (ts, event_id) is unchanged drop out (event_id is unique, so
    * comparing it alone decides change).  An append-only log can never
    * produce 'D' rows (the new state's keys are a superset) — the spec
    * exercises the delete branch with a hand-built pair of states.
    *
    * Scale: both aggregates and the join share the same
    * (user_id, event_type) hash partitioning, so the plan pays the key
    * exchange once per side and the join reuses it — no extra shuffle;
    * output is change-sized.  The aggregates combine map-side (the
    * keepLatest argument: the exchange carries one candidate per key
    * per partition, never the log). */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
    def latest(df: DataFrame) = df
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("last"))
    val ev = Sources.events(spark, dir)
    val after = latest(ev).select(
      col("user_id"), col("event_type"),
      col("last.event_id").as("new_event_id"),
      col("last.ts").as("new_ts"), col("last.value").as("new_value"))
    val before = latest(ev.filter(col("ts") < cutoff)).select(
      col("user_id").as("b_user_id"),
      col("event_type").as("b_event_type"),
      col("last.event_id").as("old_event_id"),
      col("last.ts").as("old_ts"), col("last.value").as("old_value"))
    after.join(before,
        col("user_id") === col("b_user_id") &&
          col("event_type") === col("b_event_type"), "full_outer")
      .filter(col("old_event_id").isNull || col("new_event_id").isNull ||
        col("old_event_id") =!= col("new_event_id"))
      .select(
        coalesce(col("user_id"), col("b_user_id")).as("user_id"),
        coalesce(col("event_type"), col("b_event_type")).as("event_type"),
        when(col("old_event_id").isNull, "I")
          .when(col("new_event_id").isNull, "D")
          .otherwise("U").as("change"),
        col("new_event_id"), col("new_ts"), col("new_value"),
        col("old_event_id"), col("old_ts"), col("old_value"))
  }

  val snapshotDiffOracle: String =
    """WITH b AS (
      |  SELECT user_id, event_type, event_id, ts, value FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                                 ORDER BY ts DESC, event_id DESC) rn
      |    FROM events
      |    WHERE ts < TIMESTAMP '2024-01-21 00:00:00') t
      |  WHERE rn = 1),
      |a AS (
      |  SELECT user_id, event_type, event_id, ts, value FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                                 ORDER BY ts DESC, event_id DESC) rn
      |    FROM events) t
      |  WHERE rn = 1)
      |SELECT
      |  COALESCE(a.user_id, b.user_id) AS user_id,
      |  COALESCE(a.event_type, b.event_type) AS event_type,
      |  CASE WHEN b.event_id IS NULL THEN 'I'
      |       WHEN a.event_id IS NULL THEN 'D'
      |       ELSE 'U' END AS change,
      |  a.event_id AS new_event_id, a.ts AS new_ts, a.value AS new_value,
      |  b.event_id AS old_event_id, b.ts AS old_ts, b.value AS old_value
      |FROM a FULL OUTER JOIN b
      |  ON a.user_id = b.user_id AND a.event_type = b.event_type
      |WHERE b.event_id IS NULL OR a.event_id IS NULL
      |   OR a.event_id <> b.event_id""".stripMargin

  /** The remaining §2.3 join types in one query: LEFT SEMI (nations with
    * any high-balance customer), FULL OUTER against per-nation supplier
    * counts (so nations with customers but no suppliers AND vice versa
    * both surface with NULL-filled sides), coalesced into one row per
    * nation key.  All equi-joins on n_nationkey — broadcastable dims. */
  def joinTypes(spark: SparkSession, dir: String): DataFrame = {
    val nat = Sources.nation(spark, dir)
    val richNations = nat.join(
      Sources.customer(spark, dir).filter(col("c_acctbal") > 5000),
      nat("n_nationkey") === col("c_nationkey"), "left_semi")
    val custCounts = Sources.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val suppCounts = Sources.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_supp"))
    richNations.select(col("n_nationkey"), col("n_name"))
      .join(custCounts, col("n_nationkey") === custCounts("nk"), "left")
      .drop("nk")
      .join(suppCounts, col("n_nationkey") === suppCounts("nk"),
        "full_outer")
      .select(
        coalesce(col("n_nationkey"), col("nk")).as("nation_key"),
        col("n_name"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  val joinTypesOracle: String =
    """WITH rich AS (
      |  SELECT n_nationkey, n_name FROM nation n
      |  WHERE EXISTS (SELECT 1 FROM customer c
      |                WHERE c.c_nationkey = n.n_nationkey
      |                  AND c.c_acctbal > 5000)),
      |cc AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
      |       FROM customer GROUP BY 1),
      |sc AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
      |       FROM supplier GROUP BY 1),
      |l AS (
      |  SELECT r.n_nationkey, r.n_name, cc.n_cust
      |  FROM rich r LEFT JOIN cc ON r.n_nationkey = cc.nk)
      |SELECT COALESCE(l.n_nationkey, sc.nk) AS nation_key, l.n_name,
      |  COALESCE(l.n_cust, 0) AS n_cust,
      |  COALESCE(sc.n_supp, 0) AS n_supp
      |FROM l FULL OUTER JOIN sc ON l.n_nationkey = sc.nk""".stripMargin

  private val q3Revenue =
    s"${Frag.money("l_extendedprice")} * (1 - ${Frag.rate("l_discount")})"

  /** TPC-H Q3 shape — the classic 3-way fact join + top-k: highest-value
    * orders of one segment, ordered before the cutoff but (partly)
    * unshipped after it.  What it exercises at scale: Catalyst joins the
    * two FACT tables on orderkey (shuffle/SMJ territory) while the
    * filtered customer dim broadcasts; both date predicates reach their
    * parquet scans; the top-10 runs as TakeOrderedAndProject (per-
    * partition heaps — the full result never sorts globally).  The total
    * (receita DESC, orderkey ASC) order makes the LIMIT boundary
    * deterministic, so both engines pick the identical set. */
  def mjoinTopK(spark: SparkSession, dir: String,
      segment: String = "BUILDING", cutoff: String = "1998-06-01",
      k: Int = 10): DataFrame = {
    val cust = Sources.customer(spark, dir)
      .filter(col("c_mktsegment") === segment)
    val ord = Sources.orders(spark, dir)
      .filter(col("o_orderdate") < to_timestamp(lit(cutoff)))
    val li = Sources.lineitem(spark, dir)
      .filter(col("l_shipdate") > to_timestamp(lit(cutoff)))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"),
        to_date(col("o_orderdate")).as("data"), col("o_orderpriority"))
      .agg(expr(Frag.sumMoney(q3Revenue)).as("receita"))
      .orderBy(col("receita").desc, col("l_orderkey").asc)
      .limit(k)
  }

  def mjoinTopKOracle(segment: String = "BUILDING",
      cutoff: String = "1998-06-01", k: Int = 10): String =
    s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS data,
       |  o_orderpriority, ${Frag.sumMoney(q3Revenue)} AS receita
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = '$segment'
       |  AND o_orderdate < TIMESTAMP '$cutoff'
       |  AND l_shipdate > TIMESTAMP '$cutoff'
       |GROUP BY 1, 2, 3
       |ORDER BY receita DESC, l_orderkey ASC
       |LIMIT $k""".stripMargin

  /** TPC-H Q5 shape — the snowflake: revenue per nation for one region's
    * customers served by SAME-NATION suppliers in one order-date year.
    * Six tables; at scale the region→nation→customer spine and the
    * supplier dim broadcast while orders⋈lineitem is the one real
    * shuffle — exactly the plan Catalyst's join reordering should find
    * (the dims are forced broadcastable here by their size, not hints). */
  def snowflakeAgg(spark: SparkSession, dir: String,
      region: String = "ASIA", yearStart: String = "1996-01-01"): DataFrame = {
    val nat = Sources.nation(spark, dir)
      .join(Sources.region(spark, dir)
          .filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
    val cust = Sources.customer(spark, dir)
      .join(nat, col("c_nationkey") === col("n_nationkey"))
    val ord = Sources.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit(yearStart)) &&
        col("o_orderdate") < to_timestamp(lit(yearStart)) + expr("interval 1 year"))
    val li = Sources.lineitem(spark, dir)
    val supp = Sources.supplier(spark, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey") &&
        supp("s_nationkey") === cust("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(expr(Frag.sumMoney(q3Revenue)).as("receita"),
        count(lit(1)).as("n_items"))
  }

  def snowflakeAggOracle(region: String = "ASIA",
      yearStart: String = "1996-01-01"): String =
    s"""SELECT n_name, ${Frag.sumMoney(q3Revenue)} AS receita,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |             AND s_nationkey = c_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = '$region'
       |  AND o_orderdate >= TIMESTAMP '$yearStart'
       |  AND o_orderdate < TIMESTAMP '$yearStart' + INTERVAL 1 YEAR
       |GROUP BY 1""".stripMargin

  /** Unpivot (melt) — [[AnalyticsQueries.pivot]]'s dual, the wide→narrow
    * reshaping every report-table ingest needs: the registered query
    * melts the pivot's own (mes, A, N, R) output back to (mes, flag,
    * receita) rows through Spark's native `unpivot` (Catalyst `Expand` —
    * each input row fans to the 3 value columns in-place, no shuffle
    * beyond the pivot's own aggregate).  NULL cells are dropped (the
    * melt convention, and DuckDB UNPIVOT's default), so the round trip
    * is EXACTLY the plain GROUP BY — which is the oracle: greenness
    * proves unpivot ∘ pivot ≡ identity on the aggregate, the same
    * result-invariance trick as [[graft.ops.BloomPrune]]. */
  def unpivotMelt(spark: SparkSession, dir: String): DataFrame =
    AnalyticsQueries.pivot(spark, dir)
      .unpivot(Array(col("mes")),
        Array(col("A"), col("N"), col("R")), "l_returnflag", "receita")
      .filter(col("receita").isNotNull)

  val unpivotMeltOracle: String =
    s"""SELECT ${Frag.mes("l_shipdate")} AS mes, l_returnflag,
       |  ${Frag.sumMoney(Frag.money("l_extendedprice"))} AS receita
       |FROM lineitem GROUP BY 1, 2""".stripMargin
}
