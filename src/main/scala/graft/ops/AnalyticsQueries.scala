package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Scaffold, Sources}

/** General-analytics operators beyond the reference's surface (SURVEY.md §2
  * marks these ABSENT in ETL-Gamma): rollup hierarchies, distinct and
  * sketch aggregates, JSON extraction, pivot.  A user replacing the
  * reference gets the analytics their next query will inevitably need.
  */
object AnalyticsQueries {

  /** ROLLUP hierarchy totals (reference has no grouping sets at all). */
  def rollup(spark: SparkSession, dir: String): DataFrame =
    // OPTIMIZATION r14 (guide §2.3 "aggregate before you shuffle"):
    // ROLLUP plans as Expand×3 over every fact row — the scan stage
    // replicated 600k rows (single-task at bench scale; 3× the shuffle
    // bytes at any scale) before aggregating.  Pre-aggregating at the
    // finest grain first makes Expand run over a handful of partial
    // rows; decimal SUM and COUNT re-aggregate exactly (associative),
    // ROUND still applied once at the end, so the output is
    // bit-identical (oracle hash gate).
    Sources.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(expr(s"SUM(${Frag.money("l_extendedprice")})").as("s"),
        count(lit(1)).as("c"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("CAST(ROUND(SUM(s), 2) AS DECIMAL(18,2))").as("receita"),
        sum(col("c")).as("n"))

  val rollupOracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Frag.sumMoney(Frag.money("l_extendedprice"))} AS receita,
       |  COUNT(*) AS n
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Exact COUNT(DISTINCT) per group.
    *
    * r15 MEASURED NOTE (r14 verdict "what's wrong" #4): the explicit
    * two-level distinct was probed same-boot at sf0.1/32 cores against
    * this plain form — plain COUNT(DISTINCT) 0.39 s, distinct-with-
    * REPARTITION(flag, key) 0.41 s, repartition-raw-rows-then-distinct
    * 0.44 s (min of 4 reps each).  Spark already plans COUNT(DISTINCT)
    * as partial-distinct-by-(flag, key) → exchange → merge → count, so
    * the manual staging only adds work, and spreading the raw rows
    * first re-pays the r14 lesson that the shuffle WRITE runs in the
    * same single scan task it was meant to relieve.  Kept as-is. */
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
    * The ESTIMATE is deterministic (register maxima are order-insensitive)
    * but engine-specific (Spark's HLL++ register layout has no DuckDB
    * mirror), so what the gate verifies is the operator's CONTRACT rather
    * than its registers: the plan computes both the sketch estimate and
    * the exact distinct per group and emits `approx_ok = |approx − exact|
    * / exact ≤ 0.15` — THREE standard deviations at the default
    * precision (rsd 0.05) — alongside the exact count.  Two deliberate
    * sizings here, both sf10-taught: (1) the band is 3σ, not 1σ — the
    * estimate is DETERMINISTIC for a fixed corpus (fixed hash, no
    * runtime randomness), and at sf10's ~2M distinct per group the
    * realized error was ~5.1%, just over a 1σ band — a fixed property
    * of that corpus, not a flaky coin flip, but exactly the kind of
    * knife-edge a 1σ gate invites; (2) precision stays DEFAULT because
    * Spark's HLL++ aggregation buffer is one long word per 6 registers
    * and the hash-agg update cost grows LINEARLY with buffer width —
    * measured at sf0.1, same boot, same probe: rsd 0.05 (86 words)
    * 1.5 s, rsd 0.02 (683 words) 3.1 s, rsd 0.01 (2730 words) 7.6 s.  A
    * tighter sketch is 8× the wall for a gate the 3σ band already
    * makes robust.  The oracle emits the exact count and literal TRUE,
    * so the hash-compare fails iff the estimate ever leaves the band
    * (r6 verdict #1: this closes the registry's last rows-only entry).
    * The engine's own fully-oracled HLL lives in [[hllDistinct]]. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Sources.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        count_distinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double")
          <= col("exact_parts").cast("double") * 0.15).as("approx_ok"))

  val approxDistinctOracle: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS approx_ok
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Distinct parts per return flag via the engine's OWN HLL sketch
    * ([[graft.functions.HllSketch]]) — unlike [[approxDistinct]]'s built-in
    * HLL++ (whose register layout is engine-private, hence rows-only), this
    * sketch's spec is exact integer math an independent engine reproduces
    * bit-for-bit, so the ESTIMATE itself is hash-checked cross-engine.
    * Exact count alongside shows the ±1.04/√64 error band holds. */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.HllSketch.register(spark)
    Sources.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("hll_distinct(CAST(l_partkey AS BIGINT))"), 4)
          .as("hll_parts"),
        count_distinct(col("l_partkey")).as("exact_parts"))
  }

  /** DuckDB mirror of the [[graft.functions.HllSketch]] spec: same
    * mix-mod-p hash, register index, ρ (trailing zeros via
    * `bit_count((w & -w) - 1)`), max-per-register, and raw harmonic
    * estimate.  `1.0/(1<<ρ)` keeps every addend an exact dyadic, so the sum
    * — and therefore the rounded estimate — matches Spark bit-for-bit; the
    * `64 - COUNT(*)` term supplies the 2^0 = 1 contribution of registers no
    * key ever touched. */
  val hllDistinctOracle: String =
    """WITH x0 AS (
      |  SELECT l_returnflag,
      |    CAST(l_partkey AS BIGINT) & 2147483647 AS h FROM lineitem),
      |x1 AS (SELECT l_returnflag, xor(h, h >> 16) AS h FROM x0),
      |x2 AS (SELECT l_returnflag, (h * 2246822507) & 2147483647 AS h FROM x1),
      |x3 AS (SELECT l_returnflag, xor(h, h >> 13) AS h FROM x2),
      |x4 AS (SELECT l_returnflag, (h * 3266489909) & 2147483647 AS h FROM x3),
      |h AS (SELECT l_returnflag, xor(h, h >> 16) AS h FROM x4),
      |rw AS (
      |  SELECT l_returnflag, h & 63 AS reg, h >> 6 AS w FROM h),
      |regs AS (
      |  SELECT l_returnflag, reg,
      |    MAX(CASE WHEN w = 0 THEN 26
      |             ELSE 1 + bit_count((w & -w) - 1) END) AS rho
      |  FROM rw GROUP BY l_returnflag, reg),
      |est AS (
      |  SELECT l_returnflag,
      |    0.709::DOUBLE * 64 * 64 /
      |      (64 - COUNT(*) + SUM(1.0::DOUBLE / (1::BIGINT << rho))) AS est
      |  FROM regs GROUP BY l_returnflag),
      |ex AS (
      |  SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT e.l_returnflag, ROUND(e.est, 4) AS hll_parts, ex.exact_parts
      |FROM est e JOIN ex USING (l_returnflag)""".stripMargin

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

  /** Ranking windows (absent in the reference: SURVEY §2.5): per-customer
    * order ranking by value, deterministic tie-break on the key. */
  def ranking(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Sources.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        expr(Frag.money("o_totalprice")).as("valor"),
        col("rn"), col("rnk"), col("drnk"))
  }

  val rankingOracle: String =
    s"""SELECT o_custkey, o_orderkey,
       |  ${Frag.money("o_totalprice")} AS valor, rn, rnk, drnk
       |FROM (
       |  SELECT o_custkey, o_orderkey, o_totalprice,
       |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
       |    DENSE_RANK() OVER w AS drnk
       |  FROM orders
       |  WINDOW w AS (PARTITION BY o_custkey
       |               ORDER BY o_totalprice DESC, o_orderkey ASC)) t
       |WHERE rn <= 3""".stripMargin

  /** Frame-spec running total (absent in the reference): cumulative
    * customer spend in order-date order, unique sort key so the frame is
    * deterministic. */
  def runningTotal(spark: SparkSession, dir: String): DataFrame =
    Sources.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("data"),
        expr(Frag.asMoney(
          s"SUM(${Frag.money("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
          .as("acumulado"))

  val runningTotalOracle: String =
    s"""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS data,
       |  ${Frag.asMoney(s"SUM(${Frag.money("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS acumulado
       |FROM orders""".stripMargin

  /** Set operations (absent in the reference: SURVEY §2.7): customers
    * active in both of two years, minus the always-pending ones. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ord = Sources.orders(spark, dir)
    def active(year: Int) = ord
      .filter(expr(s"year(o_orderdate) = $year")).select("o_custkey")
    active(2000).intersect(active(2001))
      .except(ord.filter(col("o_orderstatus") === "P").select("o_custkey"))
      .withColumnRenamed("o_custkey", "client_id")
  }

  val setOpsOracle: String =
    """SELECT o_custkey AS client_id FROM orders WHERE year(o_orderdate) = 2000
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin

  /** Exact percentiles per group (absent in the reference), computed
    * DISTRIBUTED: a per-group sort-rank window locates each quantile's
    * bracketing rows and one ordinary aggregation interpolates between
    * them.  Spark's holistic `percentile()` aggregate would buffer every
    * value of a group inside a single reducer — at 100 TB a billion-row
    * group OOMs it — while a sort rank is a distributed range sort
    * (`PercentilesSpec` proves this formulation ≡ `percentile()`).
    *
    * Cross-engine bit-equality: the interpolation replicates Spark
    * Percentile's exact double sequence — `pos = p·(n−1)` with p a DOUBLE
    * literal (a bare SQL `0.9` parses as DECIMAL and rounds differently),
    * weighted form `(ceil(pos) − pos)·lo + (pos − floor(pos))·hi`, exact
    * ranks special-cased — which PercentilesSpec pins bit-for-bit against
    * `percentile()`, itself proven hash-equal to DuckDB `quantile_cont`
    * in rounds 3-4.  Ties in the sort are harmless: tied rows hold equal
    * VALUES, so whichever gets the bracketing rank contributes the same
    * number.  One scalar column
    * per quantile — the driver's row-sorter crashes on array cells
    * (round-2 verdict), so the array form `percentile(x, array(...))` is
    * avoided in the registered output. */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    Scaffold.exactTwin("percentiles", "q_an_quantile_sketch")
    import org.apache.spark.sql.expressions.Window
    def ranked(valCol: String) = {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col(valCol))
      Sources.lineitem(spark, dir)
        .select(col("l_returnflag"), col(valCol))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt",
          count(lit(1)).over(Window.partitionBy(col("l_returnflag"))))
    }
    // pos depends only on the per-group constant cnt, so the bracketing
    // ranks are selectable inside a plain aggregation; the interpolation
    // is Spark Percentile's exact double sequence — the WEIGHTED form
    // `(ceil(pos) − pos)·lo + (pos − floor(pos))·hi` with the exact-rank
    // special case, which differs from `lo + (hi − lo)·frac` in the last
    // ulp (PercentilesSpec caught exactly that).
    def bracket(valCol: String, p: Double, tag: String) = Seq(
      max(expr(s"CASE WHEN rn = CAST(floor(${p}D * (cnt - 1)) AS BIGINT) + 1 THEN $valCol END")).as(s"lo_$tag"),
      max(expr(s"CASE WHEN rn = CAST(ceil(${p}D * (cnt - 1)) AS BIGINT) + 1 THEN $valCol END")).as(s"hi_$tag"))
    def interp(p: Double, tag: String) = expr(
      s"""CASE WHEN floor(${p}D * (cnt - 1)) = ceil(${p}D * (cnt - 1)) THEN CAST(lo_$tag AS DOUBLE)
         | ELSE (ceil(${p}D * (cnt - 1)) - ${p}D * (cnt - 1)) * lo_$tag
         |      + (${p}D * (cnt - 1) - floor(${p}D * (cnt - 1))) * hi_$tag END""".stripMargin)
      .as(tag)
    val priceQs = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
    val price = ranked("l_extendedprice").groupBy(col("l_returnflag"))
      .agg(max(col("cnt")).as("cnt"),
        priceQs.flatMap { case (t, p) => bracket("l_extendedprice", p, t) }: _*)
      .select(col("l_returnflag") +:
        priceQs.map { case (t, p) => interp(p, t) }: _*)
    val qty = ranked("l_quantity").groupBy(col("l_returnflag"))
      .agg(max(col("cnt")).as("cnt"),
        bracket("l_quantity", 0.5, "median_qty"): _*)
      .select(col("l_returnflag"), interp(0.5, "median_qty"))
    price.join(qty, "l_returnflag")
  }

  val percentilesOracle: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.25) AS p25,
      |  quantile_cont(l_extendedprice, 0.5) AS p50,
      |  quantile_cont(l_extendedprice, 0.9) AS p90,
      |  quantile_cont(l_quantity, 0.5) AS median_qty
      |FROM lineitem GROUP BY 1""".stripMargin

  /** GROUPING SETS with explicit grouping flags (completes the
    * grouping-sets family next to [[rollup]]'s hierarchy): one pass
    * produces (flag, status) cells, per-flag totals, and per-status totals.
    * `grouping(col)` disambiguates a subtotal row's NULL from a genuine
    * NULL key — identical semantics in both engines. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    // r14: pre-aggregate below Expand (see [[rollup]]) — the finest
    // grouping set (l_returnflag, l_linestatus) is the pre-grain, so
    // every set re-aggregates the partial sums exactly.
    Sources.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(expr(s"SUM(${Frag.money("l_extendedprice")})").as("s"),
        count(lit(1)).as("c"))
      .createOrReplaceTempView("lineitem_gs_pre")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status,
        |  CAST(ROUND(SUM(s), 2) AS DECIMAL(18,2)) AS receita,
        |  SUM(c) AS n
        |FROM lineitem_gs_pre
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), (l_linestatus))""".stripMargin)
  }

  val groupingSetsOracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
       |  CAST(grouping(l_linestatus) AS INT) AS g_status,
       |  ${Frag.sumMoney(Frag.money("l_extendedprice"))} AS receita,
       |  COUNT(*) AS n
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
       |                        (l_returnflag), (l_linestatus))""".stripMargin

  /** Interval RANGE-frame moving window (absent in the reference): each
    * order's trailing-30-day customer spend.  The frame is VALUE-based
    * (days since epoch), so rows sharing an order date share one frame and
    * the result is deterministic under ties — a ROWS frame would not be.
    * Decimal-exact sum per [[Frag]]. */
  def movingWindow(spark: SparkSession, dir: String): DataFrame =
    Sources.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("data"),
        expr(Frag.asMoney(
          s"""SUM(${Frag.money("o_totalprice")}) OVER (
             |  PARTITION BY o_custkey
             |  ORDER BY datediff(o_orderdate, DATE '1970-01-01')
             |  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin))
          .as("janela_30d"))

  val movingWindowOracle: String =
    s"""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS data,
       |  ${Frag.asMoney(
      s"""SUM(${Frag.money("o_totalprice")}) OVER (
         |    PARTITION BY o_custkey
         |    ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin)} AS janela_30d
       |FROM orders""".stripMargin

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

  /** Equi-width histogram in ONE scan: bin = ⌊value / width⌋ as an exact
    * integer key, per-bin count and decimal-exact mass.  The single-pass
    * profile primitive for distribution monitoring at scale — map-side
    * partial counts into #bins groups, no second pass for bounds (unlike
    * equi-DEPTH, which needs quantiles first — see [[percentiles]]).
    * The double division and floor are per-row IEEE ops both engines
    * evaluate identically. */
  def histogram(spark: SparkSession, dir: String,
      width: Int = 5000): DataFrame =
    Sources.orders(spark, dir)
      .groupBy(expr(s"CAST(floor(o_totalprice / $width) AS BIGINT)").as("bin"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("massa"))
      .withColumn("bin_lo", col("bin") * width)

  def histogramOracle(width: Int = 5000): String =
    s"""SELECT bin, COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS massa,
       |  bin * $width AS bin_lo
       |FROM (SELECT o_totalprice,
       |        CAST(floor(o_totalprice / $width) AS BIGINT) AS bin
       |      FROM orders) t
       |GROUP BY bin""".stripMargin

  /** LIKE/regex predicate coverage (§2 marks the whole string-matching
    * family ABSENT in the reference): infix LIKE on the scan (pushed to
    * the parquet reader as a StringContains filter) + a regex extraction
    * aggregated per brand.  Both engines share the regex subset used
    * (a literal word alternation). */
  def likeFilter(spark: SparkSession, dir: String): DataFrame =
    Sources.part(spark, dir)
      .filter(col("p_name").like("%red%"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        count(when(expr("p_type LIKE '%large%'"), 1)).as("n_large"),
        expr("COUNT(CASE WHEN regexp_extract(p_name, 'red (widget|bolt)', 1) <> '' THEN 1 END)")
          .as("n_widget_bolt"))

  val likeFilterOracle: String =
    """SELECT p_brand, COUNT(*) AS n_parts,
      |  COUNT(CASE WHEN p_type LIKE '%large%' THEN 1 END) AS n_large,
      |  COUNT(CASE WHEN COALESCE(regexp_extract(p_name, 'red (widget|bolt)', 1), '') <> ''
      |             THEN 1 END) AS n_widget_bolt
      |FROM part WHERE p_name LIKE '%red%'
      |GROUP BY 1""".stripMargin

  /** Pearson correlation from EXACT decimal sums — the statistics-family
    * gap §2 marks ABSENT.  Built-in `corr()` accumulates doubles in
    * partition order (non-deterministic across engines/partitionings, the
    * same trap as float SUM), so instead the five moments are exact
    * DECIMAL sums (quantity is integral; price goes through the
    * [[Frag.money]] cents convention) and the textbook formula runs ONCE
    * per group on doubles cast from exact decimals — every arithmetic
    * step deterministic and identical in DuckDB, so the coefficient
    * hash-matches.  One scan, map-side partial sums, 3 groups. */
  private val corrFormula: String = {
    val (n, sx, sy, sxy, sxx, syy) = (
      "CAST(n AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)",
      "CAST(sxy AS DOUBLE)", "CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)")
    s"""ROUND(($n * $sxy - $sx * $sy) /
       |  (sqrt($n * $sxx - $sx * $sx) * sqrt($n * $syy - $sy * $sy)),
       |  6)""".stripMargin
  }

  /** The five moment inputs: per-row PRODUCTS in 64-bit integer
    * arithmetic — the linear-trend recipe applied to the corr family
    * (r12 verdict #3's "same recipe").  qty ≤ ~2^6 and cents ≤ ~2^24 per
    * row, so x·y and y·y fit a long with ~2^15 headroom.  Pearson r is
    * invariant under the dollars→cents rescaling of y, and the two
    * spellings produce the SAME integers per row (MoneyCentsSpec pins
    * the equivalence on every double), so the hash contract is
    * untouched.  `moments(x, y)` builds both sides' product set from the
    * normalization spelling each engine runs: the engine normalizes via
    * [[graft.functions.MoneyCents]] (codegen'd long fast path — Probe
    * attribution showed the per-row Decimal casts, not the sums,
    * dominating this scan), the oracle via the canonical Frag casts. */
  private def corrMoments(x: String, y: String): Seq[(String, String)] =
    Seq("sx" -> x, "sy" -> y, "sxy" -> s"$x * $y",
      "sxx" -> s"$x * $x", "syy" -> s"$y * $y")

  private val corrMomentsEngine: Seq[(String, String)] =
    corrMoments("money_cents(l_quantity, 0)",
      "money_cents(l_extendedprice)")

  private val corrMomentsOracle: Seq[(String, String)] =
    corrMoments("CAST(CAST(l_quantity AS DECIMAL(18,0)) AS BIGINT)",
      s"CAST(${Frag.money("l_extendedprice")} * 100 AS BIGINT)")

  /** Engine side sums the integer products with
    * [[graft.functions.LongExactSum]] (`bigsum`): the hash-aggregate hot
    * path is a long add — Spark's own SUM-over-DECIMAL(>18 digits) buffer
    * pays a BigDecimal round-trip per row.  The oracle keeps DuckDB's
    * plain SUM (HUGEINT accumulation) — integer sums are
    * grouping-/accumulator-independent, the linear-trend precedent. */
  def correlation(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    Sources.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        corrMomentsEngine.map { case (a, e) =>
          expr(s"bigsum($e)").as(a) }: _*)
      .selectExpr("l_returnflag", "n",
        s"$corrFormula AS corr_qty_price")
  }

  val correlationOracle: String =
    s"""SELECT l_returnflag, n, $corrFormula AS corr_qty_price
       |FROM (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    ${corrMomentsOracle.map { case (a, e) => s"SUM($e) AS $a" }.mkString(",\n    ")}
       |  FROM lineitem GROUP BY 1) t""".stripMargin

  /** Sequential conversion funnel (view → click → purchase, each stage
    * strictly after the previous) in ONE shuffle: conditional per-user
    * event-time lists are collected in a single `groupBy(user_id)` and the
    * strict-ordering walk runs as array expressions on the grouped row —
    * no join cascade, no second shuffle, per-user state bounded by that
    * user's event count.  The oracle spells the same semantics as the
    * textbook three-stage join cascade, so the two independent formulations
    * checking bit-equal is also a test of the sequencing logic itself.
    * Scale: one hash partial + one exchange on user_id; the final 3-row
    * unpivot is a single-row aggregate. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Sources.events(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        sort_array(collect_list(
          when(col("event_type") === "click", col("ts")))).as("clicks"),
        sort_array(collect_list(
          when(col("event_type") === "purchase", col("ts")))).as("buys"))
      .withColumn("t_click",
        array_min(filter(col("clicks"), c => c > col("t_view"))))
      .withColumn("t_buy",
        array_min(filter(col("buys"), c => c > col("t_click"))))
    perUser
      .agg(count(col("t_view")).as("nv"), count(col("t_click")).as("nc"),
        count(col("t_buy")).as("np"))
      .selectExpr(
        """stack(3,
          |  1, 'view',                CAST(nv AS BIGINT),
          |  2, 'view>click',          CAST(nc AS BIGINT),
          |  3, 'view>click>purchase', CAST(np AS BIGINT))
          |  AS (stage_idx, stage, n_users)""".stripMargin,
        "CAST(nv AS BIGINT) AS top_users")
      .selectExpr("stage_idx", "stage", "n_users",
        """CASE WHEN top_users = 0 THEN NULL
          |  ELSE CAST(n_users AS DOUBLE) / CAST(top_users AS DOUBLE)
          |END AS pct_of_top""".stripMargin)
  }

  /** Oracle = the independent join-cascade formulation of the same funnel
    * (each stage joins the previous stage's first-completion time and takes
    * the min strictly-later event). */
  val funnelOracle: String =
    """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t_buy
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1),
      |n AS (SELECT (SELECT COUNT(*) FROM v) AS nv,
      |             (SELECT COUNT(*) FROM c) AS nc,
      |             (SELECT COUNT(*) FROM p) AS np)
      |SELECT stage_idx, stage, n_users,
      |  CASE WHEN nv = 0 THEN NULL
      |       ELSE CAST(n_users AS DOUBLE) / CAST(nv AS DOUBLE)
      |  END AS pct_of_top
      |FROM (
      |  SELECT 1 AS stage_idx, 'view' AS stage,
      |    CAST(nv AS BIGINT) AS n_users, nv FROM n
      |  UNION ALL SELECT 2, 'view>click', CAST(nc AS BIGINT), nv FROM n
      |  UNION ALL SELECT 3, 'view>click>purchase',
      |    CAST(np AS BIGINT), nv FROM n) t""".stripMargin

  /** Cohort retention matrix: cohort = ISO week of a user's FIRST signup,
    * retention cell = distinct users of that cohort active (any event) in
    * cohort-week + k.  The classic product-analytics query the reference
    * cannot express (no window/cohort surface).  Two aggregations and one
    * equi-join, all hash-partitioned by user_id before the final small
    * (cohort, k) rollup; the week distance is an exact integer day-diff
    * div 7 (both engines truncate weeks to Monday, so the diff is always a
    * multiple of 7).  Weekly grain because the synthetic events span ~one
    * month — monthly cohorts would collapse to a single cell. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(spark, dir)
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date")
        .as("cohort_week"))
    val active = ev
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("active_week"))
      .distinct()
    cohort.join(active, Seq("user_id"))
      .filter(col("active_week") >= col("cohort_week"))
      .withColumn("weeks_since",
        expr("datediff(active_week, cohort_week) div 7").cast("int"))
      .groupBy(col("cohort_week"), col("weeks_since"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  val retentionOracle: String =
    """WITH cohort AS (
      |  SELECT user_id,
      |    CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |active AS (
      |  SELECT DISTINCT user_id,
      |    CAST(DATE_TRUNC('week', ts) AS DATE) AS active_week
      |  FROM events)
      |SELECT cohort_week,
      |  CAST(DATE_DIFF('day', cohort_week, active_week) // 7 AS INT)
      |    AS weeks_since,
      |  COUNT(DISTINCT c.user_id) AS n_users
      |FROM cohort c JOIN active a ON c.user_id = a.user_id
      |WHERE active_week >= cohort_week
      |GROUP BY 1, 2""".stripMargin

  /** CUBE — the third member of the grouping-sets family next to
    * [[rollup]] and [[groupingSets]]: all 4 subtotal combinations of
    * (priority, order year) in one pass.  Spark expands the cube in the
    * aggregate (map-side partials per grouping id), not by re-scanning per
    * subtotal. */
  def cube(spark: SparkSession, dir: String): DataFrame =
    // r14: pre-aggregate below Expand (see [[rollup]]) — CUBE×4 then
    // multiplies partial rows, not fact rows; exact re-aggregation.
    Sources.orders(spark, dir)
      .groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).cast("int").as("ano"))
      .agg(expr(s"SUM(${Frag.money("o_totalprice")})").as("s"),
        count(lit(1)).as("c"))
      .cube(col("o_orderpriority"), col("ano"))
      .agg(expr("CAST(ROUND(SUM(s), 2) AS DECIMAL(18,2))").as("receita"),
        sum(col("c")).as("n"))

  val cubeOracle: String =
    s"""SELECT o_orderpriority, CAST(YEAR(o_orderdate) AS INT) AS ano,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita,
       |  COUNT(*) AS n
       |FROM orders
       |GROUP BY CUBE (o_orderpriority, CAST(YEAR(o_orderdate) AS INT))""".stripMargin

  /** Distribution-rank window family (NTILE / PERCENT_RANK / CUME_DIST) —
    * completes §2.5 beyond row_number/rank/dense_rank.  The order key
    * (acctbal, custkey) is total, so NTILE's tie-split is deterministic;
    * percent_rank = (rank−1)/(n−1) and cume_dist = peers/n divide the SAME
    * small integers in both engines, so the doubles are bit-identical. */
  def windowRanks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Sources.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        expr(Frag.money("c_acctbal")).as("saldo"),
        ntile(4).over(w).cast("int").as("quartil"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
  }

  val windowRanksOracle: String =
    s"""SELECT c_custkey, c_mktsegment, ${Frag.money("c_acctbal")} AS saldo,
       |  CAST(NTILE(4) OVER w AS INT) AS quartil,
       |  PERCENT_RANK() OVER w AS pct_rank,
       |  CUME_DIST() OVER w AS cum_dist
       |FROM customer
       |WINDOW w AS (PARTITION BY c_mktsegment
       |             ORDER BY c_acctbal ASC, c_custkey ASC)""".stripMargin

  // ---- Adaptive sketch caps (r12 verdict #1) ------------------------
  //
  // The r12 sketch twins ran gate-exact `cap = 1 << 20` buffers — the
  // last manual scale-knob family, a near-exact sort in disguise above
  // gate scale.  Retired with the adaptiveLshBits/adaptiveKmeansK
  // recipe: the cap is an integer-only function of the MAX GROUP COUNT
  // (one column-pruned pre-pass, the adaptiveKmeansK count-scan
  // precedent), recomputed independently by the oracle in SQL
  // ([[sketchCapRule]] pins the arithmetic at every scale), with a
  // fail-fast on grossly undersized manual caps.  Two regimes:
  //
  //   g ≤ SketchExactCapMax → cap = max(SketchMinCap, g): ZERO
  //     compaction anywhere (cap equals the group size), so the sketch
  //     IS the sorted group and hash-matches the exact rank-walk oracle
  //     — guaranteed at every gate scale, by rule instead of by the
  //     r12 luck of value ties.  The buffer is bounded by the constant
  //     (64 MB of longs at the final merge), never by the data.
  //   g > SketchExactCapMax → cap = SketchBoundedCap: the production
  //     compaction regime (the [[quantileSketchCapped]] ε-band, its
  //     rank error property-tested in QuantileSketchSpec) — map-side
  //     partials stay KB-sized no matter how large the group grows.

  /** Floor for [[adaptiveSketchCap]]: tiny groups still get a sane
    * buffer (8 KB of longs). */
  private[graft] val SketchMinCap = 1024

  /** Exact-regime ceiling: the largest group the rule holds VERBATIM
    * (64 MB of longs at the final merge — the deliberate memory bound;
    * map-side partials only ever hold a partition's share). */
  private[graft] val SketchExactCapMax = 1 << 23

  /** Compaction cap above the ceiling: deterministic-KLL rank error
    * ~ log2²(n/cap)/cap stays under ~1% out to n ≈ 10^12 per group. */
  private[graft] val SketchBoundedCap = 1 << 14

  private[graft] def adaptiveSketchCap(maxGroup: Long): Int =
    if (maxGroup <= SketchExactCapMax)
      math.max(SketchMinCap.toLong, maxGroup).toInt
    else SketchBoundedCap

  /** The same rule, DuckDB spelling over a max-group-count scalar
    * subquery — interpolated from the SAME constants so the spellings
    * cannot desync (the adaptiveKSql recipe).  The scalar is COALESCEd
    * to 0 (r13 ADVICE): on an EMPTY scope `MAX(c)` yields SQL NULL,
    * which would fall through the CASE to the bounded branch, while
    * [[maxGroupOf]] returns 0 and [[adaptiveSketchCap]] picks the
    * exact-regime floor — the two spellings must agree on that edge. */
  private[graft] def adaptiveCapSql(gSql: String): String =
    s"(SELECT CASE WHEN g <= $SketchExactCapMax " +
      s"THEN GREATEST($SketchMinCap, g) ELSE $SketchBoundedCap END " +
      s"FROM (SELECT COALESCE(($gSql), 0)) _g(g))"

  /** Resolve a sketch entry's cap: `manual = 0` means adaptive; a
    * manual cap below the adaptive choice refuses fast naming the fix
    * (the semanticDedup guard recipe — a mis-sized knob must never
    * silently leave the regime the gate expects). */
  private[graft] def sketchCapFor(maxGroup: Long, manual: Int,
      who: String): Int = {
    val needed = adaptiveSketchCap(maxGroup)
    if (manual == 0) needed
    else {
      require(manual >= needed,
        s"$who: cap=$manual is below the adaptive choice $needed for " +
          s"max group size $maxGroup — this cap is sized for a smaller " +
          s"corpus. Omit cap (adaptive) or pass >= $needed.")
      manual
    }
  }

  /** Max group count pre-pass: one column-pruned scan + tiny agg. */
  private def maxGroupOf(df: DataFrame, key: String): Long = {
    val r = df.groupBy(col(key)).count().agg(max(col("count"))).first()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  private def lineitemFlagMaxGroup(spark: SparkSession, dir: String): Long =
    maxGroupOf(Sources.lineitem(spark, dir).select(col("l_returnflag")),
      "l_returnflag")

  /** The cap rule itself as a gated query — one row per group scope the
    * sketch entries size against, engine side from [[adaptiveSketchCap]]
    * (Scala), oracle side from [[adaptiveCapSql]] (SQL).  Green at EVERY
    * scale (the rule is scale-free arithmetic), so the sf10 sweep pins
    * the regime switch cross-engine even where the bounded-regime value
    * oracles are infeasible — the q_dedup_semantic_adaptive precedent. */
  def sketchCapRule(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = maxGroupOf(
      Sources.events(spark, dir).select(col("event_type")), "event_type")
    val li = lineitemFlagMaxGroup(spark, dir)
    val glob = Sources.lineitem(spark, dir).count()
    Seq(("events_by_type", ev, adaptiveSketchCap(ev).toLong),
      ("lineitem_by_flag", li, adaptiveSketchCap(li).toLong),
      ("lineitem_global", glob, adaptiveSketchCap(glob).toLong))
      .toDF("scope", "g", "cap")
  }

  val sketchCapRuleOracle: String = {
    def row(scope: String, gSql: String) =
      s"SELECT '$scope' AS scope, CAST(($gSql) AS BIGINT) AS g, " +
        s"CAST(${adaptiveCapSql(gSql)} AS BIGINT) AS cap"
    Seq(
      row("events_by_type",
        "SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM events GROUP BY event_type) _e"),
      row("lineitem_by_flag",
        "SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_returnflag) _l"),
      row("lineitem_global", "SELECT COUNT(*) FROM lineitem"))
      .mkString("\nUNION ALL\n")
  }

  /** Percentiles via the engine's own mergeable quantile sketch
    * ([[graft.functions.QuantileSketch]]) — the bounded-memory companion
    * to [[percentiles]]' exact distributed sort-rank: the sketch merges
    * map-side (one bounded buffer per partition × group crosses the
    * exchange, never the rows), which is what survives a 100 TB group.
    * Values go through the exact cents convention (DECIMAL(18,2)·100 →
    * BIGINT) so the sketch operates on integers; the cap comes from
    * [[adaptiveSketchCap]] — exact regime at every gate scale by rule
    * (so the estimates hash-match the oracle's explicit rank-walk),
    * bounded compaction above (the [[hllDistinct]] precedent — prove
    * the machinery where exactness is defined, property-test the
    * compaction band beyond in QuantileSketchSpec). */
  def quantileSketch(spark: SparkSession, dir: String,
      cap: Int = 0): DataFrame = {
    graft.functions.QuantileSketch.register(spark)
    graft.functions.Fast.register(spark)
    val vals = Sources.events(spark, dir)
      .select(col("event_type"),
        expr("money_cents(value)").as("cents"))
    val c = sketchCapFor(maxGroupOf(vals, "event_type"), cap,
      "quantileSketch")
    def q(p: String, alias: String) =
      expr(s"q_sketch(cents, $p, $c)").as(alias)
    vals
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), q("0.25D", "p25_cents"),
        q("0.5D", "p50_cents"), q("0.75D", "p75_cents"))
  }

  /** The BOUNDED-CAP (production) sketch regime under the driver gate —
    * r6 verdict #2.  [[quantileSketch]] and the `*_sketch` scale variants
    * register with cap ≥ n so the gate can hash-check exact values; the
    * regime a 100 TB run actually uses (cap ≪ n, compaction bounding
    * memory) was property-tested only.  This entry runs `q_sketch_multi`
    * at cap = 1024 over groups of ~2k (sf0.01) / ~20k (sf0.1) rows —
    * compaction is GUARANTEED at both gate scales (QuantileSketchSpec
    * asserts it at this exact cap/scale) — and registers the ε-RANK-BOUND
    * ITSELF: for each probe p, the sketch boundary's true rank bracket
    * [#(x < b) + 1, #(x ≤ b)] must intersect ⌈p·n⌉ ± ε·n, ε = 2% (the
    * band the spec measures at n = 64·cap; here n/cap ≤ 20).  The oracle
    * computes nothing approximate — it emits the exact per-group count
    * and literal TRUE per bound — so the hash-compare fails iff the
    * production regime ever drifts out of its advertised band
    * cross-engine.  The second pass that ranks the boundaries is gate
    * scaffolding, not operator cost: production reads the sketch output
    * directly. */
  def quantileSketchCapped(spark: SparkSession, dir: String,
      cap: Int = 1024, eps: Double = 0.02): DataFrame = {
    graft.functions.QuantileSketch.register(spark)
    graft.functions.Fast.register(spark)
    val ps = Seq(0.25, 0.5, 0.75)
    val vals = Sources.events(spark, dir)
      .select(col("event_type"),
        expr("money_cents(value)").as("cents"))
    val psArray = ps.map(p => s"${p}D").mkString(", ")
    val sk = vals.groupBy(col("event_type"))
      .agg(expr(s"q_sketch_multi(cents, array($psArray), $cap)").as("qs"))
      .select(col("event_type") +:
        ps.indices.map(i => expr(s"qs[$i]").as(s"b$i")): _*)
    def ok(i: Int, p: Double) = {
      val target = s"CEIL($p * n)"
      (expr(s"lt$i + 1 <= $target + $eps * n") &&
        expr(s"le$i >= $target - $eps * n")).as(s"ok_p${(p * 100).toInt}")
    }
    vals.join(broadcast(sk), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        ps.indices.flatMap(i => Seq(
          sum(expr(s"CAST(cents < b$i AS BIGINT)")).as(s"lt$i"),
          sum(expr(s"CAST(cents <= b$i AS BIGINT)")).as(s"le$i"))): _*)
      .select(col("event_type") +: col("n") +:
        ps.zipWithIndex.map { case (p, i) => ok(i, p) }: _*)
  }

  val quantileSketchCappedOracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  TRUE AS ok_p25, TRUE AS ok_p50, TRUE AS ok_p75
      |FROM events GROUP BY 1""".stripMargin

  /** IQR outlier fences per group, in EXACT integer arithmetic: q1/q3 are
    * discrete ⌈p·n⌉-rank quantiles of the cents-integer price, and the
    * Tukey fences are compared through the doubled inequality
    * `2·x < 2·q1 − 3·IQR` (so the 1.5×IQR factor never leaves ℤ — no
    * float fence, no rounding disagreement cross-engine).  One ranked
    * window + a per-group constant join-back, then a single aggregation;
    * the rank window is the same distributed sort [[percentiles]] uses. */
  def outliers(spark: SparkSession, dir: String): DataFrame = {
    Scaffold.exactTwin("outliers", "q_an_outliers_sketch")
    graft.functions.Fast.register(spark)
    import org.apache.spark.sql.expressions.Window
    val cents = expr("money_cents(l_extendedprice)")
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
    val ranked = Sources.lineitem(spark, dir)
      .select(col("l_returnflag"), cents.as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("l_returnflag"))))
    // The sketch/oracle quantile definition: the smallest value whose
    // rank reaches ⌈p·n⌉ = MIN over rows at/after that rank.
    def pick(p: String, alias: String) =
      min(expr(s"CASE WHEN rn >= CEIL($p * n) THEN cents END")).as(alias)
    val fences = ranked.groupBy(col("l_returnflag"))
      .agg(pick("0.25", "q1_cents"), pick("0.75", "q3_cents"))
    ranked.join(broadcast(fences), Seq("l_returnflag"))
      .withColumn("is_outlier",
        expr("2 * cents < 2 * q1_cents - 3 * (q3_cents - q1_cents) OR " +
          "2 * cents > 2 * q3_cents + 3 * (q3_cents - q1_cents)"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("is_outlier"), 1)).as("n_outliers"),
        min(when(col("is_outlier"), col("cents"))).as("min_outlier_cents"),
        max(when(col("is_outlier"), col("cents"))).as("max_outlier_cents"),
        max(col("q1_cents")).as("q1_cents"),
        max(col("q3_cents")).as("q3_cents"))
  }

  val outliersOracle: String =
    s"""WITH r AS (
       |  SELECT l_returnflag,
       |    CAST(${Frag.money("l_extendedprice")} * 100 AS BIGINT) AS cents
       |  FROM lineitem),
       |rk AS (
       |  SELECT l_returnflag, cents,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
       |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
       |  FROM r),
       |f AS (
       |  SELECT l_returnflag,
       |    MIN(CASE WHEN rn >= CEIL(0.25 * n) THEN cents END) AS q1_cents,
       |    MIN(CASE WHEN rn >= CEIL(0.75 * n) THEN cents END) AS q3_cents
       |  FROM rk GROUP BY 1)
       |SELECT rk.l_returnflag, COUNT(*) AS n_rows,
       |  COUNT(CASE WHEN 2 * cents < 2 * q1_cents - 3 * (q3_cents - q1_cents)
       |               OR 2 * cents > 2 * q3_cents + 3 * (q3_cents - q1_cents)
       |             THEN 1 END) AS n_outliers,
       |  MIN(CASE WHEN 2 * cents < 2 * q1_cents - 3 * (q3_cents - q1_cents)
       |             OR 2 * cents > 2 * q3_cents + 3 * (q3_cents - q1_cents)
       |           THEN cents END) AS min_outlier_cents,
       |  MAX(CASE WHEN 2 * cents < 2 * q1_cents - 3 * (q3_cents - q1_cents)
       |             OR 2 * cents > 2 * q3_cents + 3 * (q3_cents - q1_cents)
       |           THEN cents END) AS max_outlier_cents,
       |  MAX(q1_cents) AS q1_cents, MAX(q3_cents) AS q3_cents
       |FROM rk JOIN f ON rk.l_returnflag = f.l_returnflag
       |GROUP BY 1""".stripMargin

  /** The mergeable-boundary scale form of [[outliers]] — the last
    * rank-walk family member to get its sketch companion (mad and
    * eqdepth have theirs; r6 verdict #6).  Both IQR fences come from ONE
    * `q_sketch_multi` group aggregate (map-side partials, one shared
    * buffer for q1 and q3) instead of the per-group rank window that
    * serializes one task per group; the fence comparison and final
    * aggregation are identical.  Bit-equal to [[outliers]] in the exact
    * regime ([[adaptiveSketchCap]] holds cap = group size wherever the
    * max group fits the exact ceiling — every gate scale, by rule) and
    * shares its oracle; the bounded-cap compaction regime above the
    * ceiling is the production trade, property-tested in
    * QuantileSketchSpec and gate-checked via [[quantileSketchCapped]]. */
  def outliersSketch(spark: SparkSession, dir: String,
      cap: Int = 0): DataFrame = {
    graft.functions.QuantileSketch.register(spark)
    graft.functions.Fast.register(spark)
    val c = sketchCapFor(lineitemFlagMaxGroup(spark, dir), cap,
      "outliersSketch")
    // r14 NOTE (measured, kept single-pass): a round-robin spread of
    // the (flag, cents) rows was tried here to parallelize the sketch
    // inserts — it REGRESSED (+0.5–0.9 s at sf0.1): with a one-row-group
    // input the shuffle WRITE (sort-before-repartition + serialization)
    // runs on the same single scan task, costing more than the
    // parallelism buys.  The single-task scan is the bench data's floor
    // (guide §2.5 input skew); at production scan widths the stage is
    // already wide.
    val cents = Sources.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("money_cents(l_extendedprice)")
          .as("cents"))
    val fences = cents.groupBy(col("l_returnflag"))
      .agg(expr(s"q_sketch_multi(cents, array(0.25D, 0.75D), $c)").as("qs"))
      .select(col("l_returnflag"),
        expr("qs[0]").as("q1_cents"), expr("qs[1]").as("q3_cents"))
    cents.join(broadcast(fences), Seq("l_returnflag"))
      .withColumn("is_outlier",
        expr("2 * cents < 2 * q1_cents - 3 * (q3_cents - q1_cents) OR " +
          "2 * cents > 2 * q3_cents + 3 * (q3_cents - q1_cents)"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("is_outlier"), 1)).as("n_outliers"),
        min(when(col("is_outlier"), col("cents"))).as("min_outlier_cents"),
        max(when(col("is_outlier"), col("cents"))).as("max_outlier_cents"),
        max(col("q1_cents")).as("q1_cents"),
        max(col("q3_cents")).as("q3_cents"))
  }

  /** 10 %-trimmed mean per group — the robust-location summary between
    * the plain mean (outlier-hostage) and the median (discards 98 % of
    * the sample): drop everything outside [p10, p90] and average the
    * rest.  Completes the robust-stats family next to [[mad]] (robust
    * spread) and [[outliers]] (fence flags), built the same way its
    * siblings' scale variants are: BOTH trim boundaries come from ONE
    * `q_sketch_multi` group aggregate (mergeable, map-side partials —
    * never a per-group rank window), the trimmed aggregation is exact
    * integer cents, and the mean is one shared-verbatim IEEE division
    * (ROUND 6).  Boundary rows are KEPT (closed interval) — with the
    * engine-wide ⌈p·n⌉ discrete-quantile convention both engines trim
    * the identical row set, so counts and mean hash-match.  Exact
    * regime at gate scales ([[adaptiveSketchCap]], by rule); the
    * bounded-cap production regime is gated by [[quantileSketchCapped]].
    *
    * Scale: sketch agg (one exchange) → broadcast fence join → one
    * more group aggregate.  Same topology as [[outliersSketch]]. */
  def trimmedMean(spark: SparkSession, dir: String,
      cap: Int = 0): DataFrame = {
    graft.functions.QuantileSketch.register(spark)
    graft.functions.Fast.register(spark)
    val c = sketchCapFor(lineitemFlagMaxGroup(spark, dir), cap,
      "trimmedMean")
    // r14 NOTE (measured, kept single-pass): a round-robin spread of
    // the (flag, cents) rows was tried here to parallelize the sketch
    // inserts — it REGRESSED (+0.5–0.9 s at sf0.1): with a one-row-group
    // input the shuffle WRITE (sort-before-repartition + serialization)
    // runs on the same single scan task, costing more than the
    // parallelism buys.  The single-task scan is the bench data's floor
    // (guide §2.5 input skew); at production scan widths the stage is
    // already wide.
    val cents = Sources.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("money_cents(l_extendedprice)")
          .as("cents"))
    val fences = cents.groupBy(col("l_returnflag"))
      .agg(expr(s"q_sketch_multi(cents, array(0.1D, 0.9D), $c)").as("qs"))
      .select(col("l_returnflag"),
        expr("qs[0]").as("lo_cents"), expr("qs[1]").as("hi_cents"))
    cents.join(broadcast(fences), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("cents").between(col("lo_cents"), col("hi_cents")), 1))
          .as("n_kept"),
        sum(when(col("cents").between(col("lo_cents"), col("hi_cents")),
          col("cents"))).as("kept_cents"),
        max(col("lo_cents")).as("lo_cents"),
        max(col("hi_cents")).as("hi_cents"))
      .select(col("l_returnflag"), col("n_rows"), col("n_kept"),
        col("lo_cents"), col("hi_cents"),
        expr("ROUND(CAST(kept_cents AS DOUBLE) / CAST(n_kept AS DOUBLE), 6)")
          .as("trimmed_mean_cents"))
  }

  /** Exact rank-walk mirror: boundaries via the engine-wide ⌈p·n⌉
    * discrete-quantile convention (the [[outliers]] oracle shape). */
  val trimmedMeanOracle: String =
    s"""WITH r AS (
       |  SELECT l_returnflag,
       |    CAST(${Frag.money("l_extendedprice")} * 100 AS BIGINT) AS cents
       |  FROM lineitem),
       |rk AS (
       |  SELECT l_returnflag, cents,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
       |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
       |  FROM r),
       |f AS (
       |  SELECT l_returnflag,
       |    MIN(CASE WHEN rn >= CEIL(0.1 * n) THEN cents END) AS lo_cents,
       |    MIN(CASE WHEN rn >= CEIL(0.9 * n) THEN cents END) AS hi_cents
       |  FROM rk GROUP BY 1)
       |SELECT rk.l_returnflag, COUNT(*) AS n_rows,
       |  COUNT(CASE WHEN cents BETWEEN lo_cents AND hi_cents THEN 1 END)
       |    AS n_kept,
       |  MAX(lo_cents) AS lo_cents, MAX(hi_cents) AS hi_cents,
       |  ROUND(CAST(SUM(CASE WHEN cents BETWEEN lo_cents AND hi_cents
       |                      THEN cents END) AS DOUBLE)
       |    / CAST(COUNT(CASE WHEN cents BETWEEN lo_cents AND hi_cents
       |                      THEN 1 END) AS DOUBLE), 6)
       |    AS trimmed_mean_cents
       |FROM rk JOIN f ON rk.l_returnflag = f.l_returnflag
       |GROUP BY 1""".stripMargin

  /** Two-proportion A/B test over the event stream: users split by id
    * parity (the deterministic stand-in for an experiment assignment
    * column), conversion = the user ever fired a high-value purchase
    * (plain "any purchase" saturates this corpus — every user has one —
    * which would zero the pooled variance), and the pooled two-proportion
    * z-statistic decides the lift.  Everything
    * derives from exact integer counts; the z formula is a fixed chain
    * of correctly-rounded IEEE ops (±, ×, ÷, sqrt — sqrt IS exact per
    * IEEE-754), shared VERBATIM with the oracle, so the statistic
    * hash-matches cross-engine at 6 dp (the [[graft.llm.Similarity]]
    * cosine precedent, which also rides a sqrt).  Scale: one user-keyed
    * aggregation (map-side partial), then a 2-row pivot — the z math
    * runs on a single row. */
  def abTest(spark: SparkSession, dir: String,
      threshold: Int = 200): DataFrame = {
    val perUser = Sources.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
          col("value") > threshold, 1).otherwise(0))
        .as("converted"))
      .withColumn("variant", (col("user_id") % 2).cast("int"))
    perUser.groupBy()
      .agg(
        count(when(col("variant") === 0, 1)).as("users_a"),
        count(when(col("variant") === 1, 1)).as("users_b"),
        sum(when(col("variant") === 0, col("converted"))).as("conv_a"),
        sum(when(col("variant") === 1, col("converted"))).as("conv_b"))
      .withColumn("z_score", round(expr(AbZ), 6))
  }

  /** Pooled two-proportion z — shared verbatim between engines so the
    * IEEE op sequence is identical.  The NULLIF guards make every
    * degenerate regime — an EMPTY variant arm (a fresh tenant, or the
    * whole table empty, divides by zero users under ANSI) and zero or
    * saturated conversion (zero pooled variance) — yield NULL instead of
    * a division error: the honest "no lift is measurable" answer,
    * identical in both engines (DegenerateInputsSpec sweeps it). */
  private val AbZ: String =
    "(CAST(conv_a AS DOUBLE) / CAST(NULLIF(users_a, 0) AS DOUBLE) " +
      "- CAST(conv_b AS DOUBLE) / CAST(NULLIF(users_b, 0) AS DOUBLE)) " +
      "/ NULLIF(sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(NULLIF(users_a + users_b, 0) AS DOUBLE)) " +
      "* (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(NULLIF(users_a + users_b, 0) AS DOUBLE)) " +
      "* (1.0 / CAST(NULLIF(users_a, 0) AS DOUBLE) + 1.0 / CAST(NULLIF(users_b, 0) AS DOUBLE))), 0.0)"

  def abTestOracle(threshold: Int = 200): String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN event_type = 'purchase' AND value > $threshold
       |             THEN 1 ELSE 0 END)
       |      AS converted,
       |    CAST(user_id % 2 AS INT) AS variant
       |  FROM events GROUP BY user_id),
       |agg AS (
       |  SELECT
       |    COUNT(CASE WHEN variant = 0 THEN 1 END) AS users_a,
       |    COUNT(CASE WHEN variant = 1 THEN 1 END) AS users_b,
       |    CAST(SUM(CASE WHEN variant = 0 THEN converted END) AS BIGINT)
       |      AS conv_a,
       |    CAST(SUM(CASE WHEN variant = 1 THEN converted END) AS BIGINT)
       |      AS conv_b
       |  FROM pu)
       |SELECT users_a, users_b, conv_a, conv_b,
       |  ROUND($AbZ, 6) AS z_score
       |FROM agg""".stripMargin

  /** Time-series gap filling with linear interpolation: the sparse daily
    * revenue series (only days where a sale cleared the threshold) is
    * completed onto the full day × event_type spine, and missing cells
    * interpolate linearly between the nearest present neighbors
    * (IGNORE-NULLS window walk both directions — no self-join per gap).
    * Edges (no neighbor on one side) stay NULL.  The division's operands
    * are exact integers (cents and day distances), so the interpolated
    * doubles are bit-identical cross-engine.  Scale: two sequential
    * windows per series key, partitioned by event_type — the same
    * parallelism story as any per-key ordered walk; the spine is a
    * broadcast-sized dimension. */
  def interpolate(spark: SparkSession, dir: String,
      threshold: Int = 200): DataFrame = {
    graft.functions.Fast.register(spark)
    import org.apache.spark.sql.expressions.Window
    val ev = Sources.events(spark, dir)
    val sparse = ev.filter(col("value") > threshold)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("dia"),
        col("event_type"))
      .agg(expr("CAST(bigsum(money_cents(value)) AS BIGINT)")
        .as("cents"))
    val days = ev.agg(
        min(date_trunc("day", col("ts")).cast("date")).as("d0"),
        max(date_trunc("day", col("ts")).cast("date")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("dia"))
    val spine = days.crossJoin(
      ev.select(col("event_type")).distinct())
    val wBack = Window.partitionBy(col("event_type")).orderBy(col("dia"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col("event_type")).orderBy(col("dia"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(sparse, Seq("dia", "event_type"), "left")
      .withColumn("prev_c", last(col("cents"), ignoreNulls = true).over(wBack))
      .withColumn("prev_d", last(when(col("cents").isNotNull, col("dia")),
        ignoreNulls = true).over(wBack))
      .withColumn("next_c", first(col("cents"), ignoreNulls = true).over(wFwd))
      .withColumn("next_d", first(when(col("cents").isNotNull, col("dia")),
        ignoreNulls = true).over(wFwd))
      .select(col("dia"), col("event_type"), col("cents"),
        expr("""CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
               | WHEN prev_c IS NULL OR next_c IS NULL THEN NULL
               | ELSE prev_c + (next_c - prev_c)
               |   * (CAST(datediff(dia, prev_d) AS DOUBLE)
               |      / CAST(datediff(next_d, prev_d) AS DOUBLE))
               |END""".stripMargin).as("filled"))
  }

  def interpolateOracle(threshold: Int = 200): String =
    s"""WITH sparse AS (
       |  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS dia, event_type,
       |    CAST(SUM(${Frag.money("value")}) * 100 AS BIGINT) AS cents
       |  FROM events WHERE value > $threshold GROUP BY 1, 2),
       |bounds AS (
       |  SELECT MIN(CAST(DATE_TRUNC('day', ts) AS DATE)) AS d0,
       |         MAX(CAST(DATE_TRUNC('day', ts) AS DATE)) AS d1
       |  FROM events),
       |spine AS (
       |  SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS dia,
       |    et.event_type
       |  FROM bounds, (SELECT DISTINCT event_type FROM events) et),
       |j AS (
       |  SELECT s.dia, s.event_type, sp.cents FROM spine s
       |  LEFT JOIN sparse sp
       |    ON s.dia = sp.dia AND s.event_type = sp.event_type),
       |w AS (
       |  SELECT dia, event_type, cents,
       |    LAST_VALUE(cents IGNORE NULLS) OVER wb AS prev_c,
       |    LAST_VALUE(CASE WHEN cents IS NOT NULL THEN dia END IGNORE NULLS)
       |      OVER wb AS prev_d,
       |    FIRST_VALUE(cents IGNORE NULLS) OVER wf AS next_c,
       |    FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN dia END IGNORE NULLS)
       |      OVER wf AS next_d
       |  FROM j
       |  WINDOW wb AS (PARTITION BY event_type ORDER BY dia
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         wf AS (PARTITION BY event_type ORDER BY dia
       |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT dia, event_type, cents,
       |  CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
       |       WHEN prev_c IS NULL OR next_c IS NULL THEN NULL
       |       ELSE prev_c + (next_c - prev_c)
       |         * (CAST(DATE_DIFF('day', prev_d, dia) AS DOUBLE)
       |            / CAST(DATE_DIFF('day', prev_d, next_d) AS DOUBLE))
       |  END AS filled
       |FROM w""".stripMargin

  /** Rolling 7-day distinct users from STORED sketches — the two-step
    * warehouse sketch pattern: (1) one raw scan builds a 64-byte
    * [[graft.functions.HllSketchBytes]] sketch per day; (2) every rolling
    * window answers by MERGING the stored sketches
    * ([[graft.functions.HllMergeEst]] — elementwise register max, a
    * lossless union), never re-reading events.  At 100 TB step 2 touches
    * #days × 64 bytes; an exact rolling COUNT(DISTINCT) would re-shuffle
    * a week of raw keys per day.  The register spec is exact integer math
    * (see [[hllDistinct]]), so the merged ESTIMATES hash-match a DuckDB
    * mirror that recomputes the windowed registers from raw rows —
    * proving sketch(day-union) ≡ sketch-merge, i.e. the losslessness of
    * the union, cross-engine. */
  def rollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.HllSketchBytes.register(spark)
    graft.functions.HllMergeEst.register(spark)
    val daily = Sources.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("dia"))
      .agg(expr("hll_sketch_bytes(user_id)").as("sk"))
    // Each day's sketch CONTRIBUTES to the 7 windows ending on
    // dia..dia+6: a scan-fused explode + hash merge — strictly linear in
    // #days, where the equivalent `d BETWEEN dia AND dia+6` range join
    // would nested-loop #days² (harmless at 365 days, pointless at 10
    // years of them).  Output is pinned to OBSERVED window ends (the
    // oracle's day-table semantics, even with calendar gaps) by carrying
    // the source day through the explode and keeping only targets some
    // contributor landed on exactly — deciding observedness inside the
    // one merge aggregation instead of semi-joining against a second
    // `daily` branch, which re-ran the events scan + sketch build twice
    // (r6 ADVICE #3).
    daily
      .select(col("dia").as("src"),
        explode(expr("sequence(dia, dia + interval 6 day)")).as("target"),
        col("sk"))
      .groupBy(col("target").cast("date").as("dia"))
      .agg(round(expr("hll_merge_est(sk)"), 4).as("users_hll_7d"),
        max(when(col("src") === col("target").cast("date"), 1)).as("obs"))
      .filter(col("obs") === 1)
      .drop("obs")
  }

  val rollingDistinctOracle: String = {
    val mix = graft.functions.Mix31.duckSql("user_id")
    s"""WITH h AS (
       |  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS dia, $mix AS h
       |  FROM events),
       |days AS (SELECT DISTINCT dia FROM h),
       |win AS (
       |  SELECT d.dia, h.h FROM days d
       |  JOIN h ON h.dia >= d.dia - 6 AND h.dia <= d.dia),
       |rw AS (SELECT dia, h & 63 AS reg, h >> 6 AS w FROM win),
       |regs AS (
       |  SELECT dia, reg,
       |    MAX(CASE WHEN w = 0 THEN 26
       |             ELSE 1 + bit_count((w & -w) - 1) END) AS rho
       |  FROM rw GROUP BY dia, reg)
       |SELECT dia,
       |  ROUND(0.709::DOUBLE * 64 * 64 /
       |    (64 - COUNT(*) + SUM(1.0::DOUBLE / (1::BIGINT << rho))), 4)
       |    AS users_hll_7d
       |FROM regs GROUP BY dia""".stripMargin
  }

  /** 7-day rolling variance from STORED DAILY MOMENTS — the plain-
    * statistics member of the stored-partial re-aggregation family
    * ([[rollingDistinct]] is the HLL member): each day persists exact
    * integer moments (n, Σx, Σx²) — 24 bytes of state per day, the
    * Chan/parallel-Welford merge representation — and any window over
    * days is a SUM of those partials, never a rescan of the events.  At
    * 100 TB this is the difference between an incremental daily job and
    * re-reading a quarter's raw data per dashboard refresh.  The final
    * variance is one pinned IEEE chain over the exact integer sums
    * (population form (Σx² − (Σx)²/n)/n, shared verbatim with the
    * oracle), rounded at 4 dp for the gate. */
  def rollingVariance(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    val daily = Sources.events(spark, dir)
      .select(date_trunc("day", col("ts")).cast("date").as("dia"),
        expr("money_cents(value)").as("cents"))
      .groupBy(col("dia"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
        sum(expr("cents * cents")).as("sx2"))
    daily
      .select(col("dia").as("src"),
        explode(expr("sequence(dia, dia + interval 6 day)")).as("target"),
        col("n"), col("sx"), col("sx2"))
      .groupBy(col("target").cast("date").as("dia"))
      .agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
        sum(col("sx2")).as("sx2"),
        max(when(col("src") === col("target").cast("date"), 1)).as("obs"))
      .filter(col("obs") === 1)
      .select(col("dia"), col("n"),
        round(expr(RollingVar), 4).as("var_7d"))
  }

  /** Population variance from exact integer moments — shared verbatim. */
  private val RollingVar: String =
    "(CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) " +
      "/ CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)"

  val rollingVarianceOracle: String =
    s"""WITH d AS (
       |  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS dia,
       |    COUNT(*) AS n,
       |    CAST(SUM(CAST(${Frag.money("value")} * 100 AS BIGINT)) AS BIGINT)
       |      AS sx,
       |    CAST(SUM(CAST(${Frag.money("value")} * 100 AS BIGINT)
       |           * CAST(${Frag.money("value")} * 100 AS BIGINT)) AS BIGINT)
       |      AS sx2
       |  FROM events GROUP BY 1),
       |w AS (
       |  SELECT t.dia,
       |    CAST(SUM(d.n) AS BIGINT) AS n,
       |    CAST(SUM(d.sx) AS BIGINT) AS sx,
       |    CAST(SUM(d.sx2) AS BIGINT) AS sx2
       |  FROM (SELECT DISTINCT dia FROM d) t
       |  JOIN d ON d.dia >= t.dia - 6 AND d.dia <= t.dia
       |  GROUP BY t.dia)
       |SELECT dia, n, ROUND($RollingVar, 4) AS var_7d
       |FROM w""".stripMargin

  /** Equi-DEPTH histogram — the quantile-bucket companion to
    * [[histogram]]'s fixed-width bins: boundaries are the exact discrete
    * k/B quantiles (one rank-walk pass), every row then lands in
    * `Σ_k [v > b_k]` via a broadcast 1-row boundary struct — a codegen'd
    * chain of 7 comparisons fused into the second scan, no per-row join.
    * Ties pile on the lower bucket deterministically (ceil-rank
    * boundaries + strict >), so masses are equal only up to tie mass —
    * the honest behavior of a discrete distribution.
    *
    * Scale note: the boundary pass is a GLOBAL rank (one-task sort) —
    * exact on purpose for the cross-engine gate.  At 100 TB swap that
    * single pass for `q_sketch(cents, k/B, cap)` boundaries
    * ([[quantileSketch]] — map-side mergeable, bounded memory, ε rank
    * error) and keep the scan-fused bucket assignment identical; the
    * second pass is already scale-clean (broadcast 1-row bounds, no
    * per-row join). */
  def histogramEqDepth(spark: SparkSession, dir: String,
      buckets: Int = 8): DataFrame = {
    Scaffold.exactTwin("histogramEqDepth", "q_an_histogram_eqdepth_sketch")
    graft.functions.Fast.register(spark)
    import org.apache.spark.sql.expressions.Window
    val cents = Sources.lineitem(spark, dir)
      .select(expr("money_cents(l_extendedprice)")
        .as("cents"))
    val w = Window.orderBy(col("cents"))
    val ranked = cents
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val bs = (1 until buckets)
    val bounds = ranked.agg(
      min(expr(s"CASE WHEN rn >= CEIL(${bs.head}.0 * n / $buckets) " +
        s"THEN cents END")).as(s"b${bs.head}"),
      bs.tail.map(k =>
        min(expr(s"CASE WHEN rn >= CEIL($k.0 * n / $buckets) " +
          s"THEN cents END")).as(s"b$k")): _*)
    val bucketExpr = bs.map(k => s"CAST(cents > b$k AS INT)").mkString(" + ")
    cents.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(bucketExpr).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"))
  }

  /** The SCALE form of [[histogramEqDepth]]: boundaries come from the
    * mergeable [[graft.functions.QuantileSketch]] instead of a global
    * rank window — map-side partials, no single-task sort anywhere.  The
    * sketch's quantile definition (smallest value with cumulative weight
    * ⌈p·n⌉, p = k/B an exact dyadic) IS the rank-walk boundary
    * definition, so in the exact regime (cap ≥ n — this is one GLOBAL
    * group, so [[adaptiveSketchCap]] sizes against the whole table count)
    * this variant is bit-equal to the exact form and shares its oracle.
    * Past the exact ceiling the rule snaps to the bounded compaction
    * cap and takes the ε rank error — that trade is the operator's
    * whole point, property-tested in QuantileSketchSpec; the gate pins
    * the exact regime (the [[quantileSketch]]/Packing lesson: the scale
    * path exists as CODE under the gate, not as a scaladoc promise). */
  def histogramEqDepthSketch(spark: SparkSession, dir: String,
      buckets: Int = 8, cap: Int = 0): DataFrame = {
    graft.functions.QuantileSketch.register(spark)
    graft.functions.Fast.register(spark)
    // Global sketch: the "group" is the whole table, so the adaptive
    // rule sizes against the table count (parquet-metadata cheap).
    val c = sketchCapFor(Sources.lineitem(spark, dir).count(), cap,
      "histogramEqDepthSketch")
    val cents = Sources.lineitem(spark, dir)
      .select(expr("money_cents(l_extendedprice)")
        .as("cents"))
    val bs = (1 until buckets)
    // ONE q_sketch_multi aggregate buffers the table once for all B−1
    // boundaries (r6 verdict #4: seven independent q_sketch aggregates
    // each carried their own full copy of identical sketch state).
    val psArray = bs.map(k => s"${k.toDouble / buckets}D").mkString(", ")
    val bounds = cents
      .agg(expr(s"q_sketch_multi(cents, array($psArray), $c)").as("qs"))
      .select(bs.map(k => expr(s"qs[${k - 1}]").as(s"b$k")): _*)
    val bucketExpr = bs.map(k => s"CAST(cents > b$k AS INT)").mkString(" + ")
    cents.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(bucketExpr).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"))
  }

  def histogramEqDepthOracle(buckets: Int = 8): String = {
    val bs = (1 until buckets)
    val boundSel = bs.map(k =>
      s"MIN(CASE WHEN rn >= CEIL($k.0 * n / $buckets) THEN cents END) AS b$k")
      .mkString(",\n    ")
    val bucketExpr = bs.map(k => s"CAST(cents > b$k AS INT)").mkString(" + ")
    s"""WITH c AS (
       |  SELECT CAST(${Frag.money("l_extendedprice")} * 100 AS BIGINT)
       |    AS cents FROM lineitem),
       |r AS (
       |  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
       |    COUNT(*) OVER () AS n
       |  FROM c),
       |b AS (
       |  SELECT
       |    $boundSel
       |  FROM r)
       |SELECT CAST($bucketExpr AS INT) AS bucket, COUNT(*) AS n_rows,
       |  MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
       |FROM c, b GROUP BY 1""".stripMargin
  }

  /** Median absolute deviation — the robust-statistics companion to
    * [[outliers]]' IQR fences: MAD = median(|x − median(x)|), immune to
    * the outliers that poison a stddev.  Exact integers end to end: both
    * medians are discrete ⌈n/2⌉-rank picks of cents values, the absolute
    * deviations stay in ℤ, and each stage is the same distributed
    * sort-rank shape as [[percentiles]] (two passes by construction —
    * the second ranking needs the first median, a broadcast scalar). */
  def mad(spark: SparkSession, dir: String): DataFrame = {
    Scaffold.exactTwin("mad", "q_an_mad_sketch")
    graft.functions.Fast.register(spark)
    import org.apache.spark.sql.expressions.Window
    // r14 NOTE (measured, kept single-pass): a round-robin spread of
    // the (flag, cents) rows was tried here to parallelize the sketch
    // inserts — it REGRESSED (+0.5–0.9 s at sf0.1): with a one-row-group
    // input the shuffle WRITE (sort-before-repartition + serialization)
    // runs on the same single scan task, costing more than the
    // parallelism buys.  The single-task scan is the bench data's floor
    // (guide §2.5 input skew); at production scan widths the stage is
    // already wide.
    val cents = Sources.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("money_cents(l_extendedprice)")
          .as("cents"))
    def medianOf(df: DataFrame, valCol: String, alias: String) = {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col(valCol))
      df.withColumn("rn", row_number().over(w))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy(col("l_returnflag"))))
        .groupBy(col("l_returnflag"))
        .agg(min(expr(s"CASE WHEN rn >= CEIL(0.5 * n) THEN $valCol END"))
          .as(alias))
    }
    val med = medianOf(cents, "cents", "median_cents")
    val dev = cents.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("adev", abs(col("cents") - col("median_cents")))
    medianOf(dev, "adev", "mad_cents")
      .join(med, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("median_cents"), col("mad_cents"))
  }

  /** The mergeable-boundary scale form of [[mad]] — both medians through
    * `q_sketch` group aggregates (map-side partials) instead of per-group
    * rank windows, which serialize one task per group regardless of group
    * size.  Bit-equal to [[mad]] in the exact regime
    * ([[adaptiveSketchCap]] — every gate scale, by rule) and shares its
    * oracle; the bounded-cap regime above the exact ceiling is the
    * production trade, property-tested in QuantileSketchSpec. */
  def madSketch(spark: SparkSession, dir: String,
      cap: Int = 0): DataFrame = {
    graft.functions.QuantileSketch.register(spark)
    graft.functions.Fast.register(spark)
    val c = sketchCapFor(lineitemFlagMaxGroup(spark, dir), cap,
      "madSketch")
    // r14 NOTE (measured, kept single-pass): a round-robin spread of
    // the (flag, cents) rows was tried here to parallelize the sketch
    // inserts — it REGRESSED (+0.5–0.9 s at sf0.1): with a one-row-group
    // input the shuffle WRITE (sort-before-repartition + serialization)
    // runs on the same single scan task, costing more than the
    // parallelism buys.  The single-task scan is the bench data's floor
    // (guide §2.5 input skew); at production scan widths the stage is
    // already wide.
    val cents = Sources.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("money_cents(l_extendedprice)")
          .as("cents"))
    val med = cents.groupBy(col("l_returnflag"))
      .agg(expr(s"q_sketch(cents, 0.5D, $c)").as("median_cents"))
    cents.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("adev", abs(col("cents") - col("median_cents")))
      .groupBy(col("l_returnflag"))
      .agg(max(col("median_cents")).as("median_cents"),
        expr(s"q_sketch(adev, 0.5D, $c)").as("mad_cents"))
  }

  val madOracle: String =
    s"""WITH c AS (
       |  SELECT l_returnflag,
       |    CAST(${Frag.money("l_extendedprice")} * 100 AS BIGINT) AS cents
       |  FROM lineitem),
       |r1 AS (
       |  SELECT l_returnflag, cents,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
       |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
       |  FROM c),
       |m1 AS (
       |  SELECT l_returnflag,
       |    MIN(CASE WHEN rn >= CEIL(0.5 * n) THEN cents END) AS median_cents
       |  FROM r1 GROUP BY 1),
       |d AS (
       |  SELECT c.l_returnflag, abs(c.cents - m1.median_cents) AS adev,
       |    m1.median_cents
       |  FROM c JOIN m1 ON c.l_returnflag = m1.l_returnflag),
       |r2 AS (
       |  SELECT l_returnflag, adev, median_cents,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY adev) AS rn,
       |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
       |  FROM d)
       |SELECT l_returnflag, MAX(median_cents) AS median_cents,
       |  MIN(CASE WHEN rn >= CEIL(0.5 * n) THEN adev END) AS mad_cents
       |FROM r2 GROUP BY 1""".stripMargin

  /** Percent-of-total (ratio_to_report): each segment's revenue share of
    * the grand total via an unpartitioned window SUM over the ALREADY
    * AGGREGATED per-segment rows — the window sees #segments rows, never
    * the fact table, so the "global window" is a metadata-sized
    * operation.  Share = exact-decimal cents divided as identical
    * integers → bit-identical doubles. */
  def shareOfTotal(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Fast.register(spark)
    import org.apache.spark.sql.expressions.Window
    val perSeg = Sources.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(expr("CAST(bigsum(money_cents(c_acctbal)) AS BIGINT)")
        .as("cents"))
    perSeg
      .withColumn("total_cents",
        sum(col("cents")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .select(col("c_mktsegment"), col("cents"),
        (col("cents").cast("double") / col("total_cents").cast("double"))
          .as("share"))
  }

  val shareOfTotalOracle: String =
    s"""WITH s AS (
       |  SELECT c_mktsegment,
       |    CAST(SUM(${Frag.money("c_acctbal")}) * 100 AS BIGINT) AS cents
       |  FROM customer GROUP BY 1)
       |SELECT c_mktsegment, cents,
       |  CAST(cents AS DOUBLE)
       |    / CAST(SUM(cents) OVER () AS DOUBLE) AS share
       |FROM s""".stripMargin

  /** The discrete-quantile definition spelled out as a rank walk: the
    * smallest value whose 1-based rank reaches ⌈p·n⌉. */
  val quantileSketchOracle: String = {
    def pick(p: String, alias: String) =
      s"MIN(CASE WHEN rn >= CEIL($p * n) THEN cents END) AS $alias"
    s"""WITH s AS (
       |  SELECT event_type,
       |    CAST(${Frag.money("value")} * 100 AS BIGINT) AS cents
       |  FROM events),
       |r AS (
       |  SELECT event_type, cents,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM s)
       |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       |  ${pick("0.25", "p25_cents")},
       |  ${pick("0.50", "p50_cents")},
       |  ${pick("0.75", "p75_cents")}
       |FROM r GROUP BY 1""".stripMargin
  }

  /** Least-squares revenue trend per return flag — the statistics gap
    * next to [[correlation]]: slope and intercept of extendedprice over
    * ship-day, from the SAME exact-moments recipe that keeps `corr`
    * hash-stable.  Built-in `regr_slope` accumulates doubles in
    * partition order (non-deterministic cross-engine); here the four
    * moments are exact DECIMAL sums over an exact integer day index and
    * the closed-form normal equations run once per group as a fixed
    * chain of correctly-rounded IEEE ops (mul/sub/div — the proven-green
    * `corrFormula` shape).  Both slope and intercept use the full
    * rational form, so neither inherits the other's rounding.
    *
    * Scale (r12 verdict #4): the r12 form summed
    * `CAST(d AS DECIMAL)·cents` per ROW — a Java-BigDecimal multiply-add
    * chain over the whole fact table (715 s at sf10 for a plan that is
    * otherwise one scan).  The moments are exact integers, so the hot
    * path needs no decimals at all: the engine first folds the table to
    * DAY GRAIN with pure-BIGINT map-side partials (count + cents sum per
    * (flag, day) — codegen'd long adds; a day·flag's cents bounded by
    * ~9·10^16 dollars before ANSI raises), then computes the five
    * moments over the ≤ #flags×#days day rows, where the DECIMAL(38,0)
    * widening that protects the 100 TB regime costs thousands of decimal
    * ops instead of per-row billions.  The moments are exact either way,
    * so the value is grouping-path-independent and the ORACLE keeps the
    * one-level spelling (DuckDB sums BIGINT into exact HUGEINT).  The
    * day index is engine-local (Spark `DATEDIFF` / DuckDB date
    * subtraction both yield exact INTs from the shared epoch); the
    * formula fragments are shared verbatim and divide the cents scale
    * back out inside the ROUND.  NULLIF guards the all-one-day
    * degenerate group (ANSI would raise where LEGACY returned NULL). */
  def linearTrend(spark: SparkSession, dir: String): DataFrame =
    trendOf(Sources.lineitem(spark, dir)
      .selectExpr("l_returnflag",
        s"DATEDIFF(CAST(l_shipdate AS DATE), DATE '$trendEpoch') AS d",
        s"CAST(${Frag.money("l_extendedprice")} * 100 AS BIGINT) AS cents"))

  /** Normal-equations core over a (l_returnflag, d INT, cents BIGINT)
    * frame — split out so degenerate regimes (one distinct day per
    * group) are spec-testable on synthetic frames. */
  private[graft] def trendOf(points: DataFrame): DataFrame = {
    val daily = points
      .groupBy("l_returnflag", "d")
      .agg(count(lit(1)).as("c"), sum(col("cents")).as("sc"))
    daily
      .groupBy("l_returnflag")
      .agg(expr(trendMoments.head._2).as(trendMoments.head._1),
        trendMoments.tail.map { case (a, e) => expr(e).as(a) }: _*)
      .selectExpr("l_returnflag", "n",
        s"$trendSlope AS slope_per_day", s"$trendIntercept AS intercept")
  }

  private val trendEpoch = "1995-01-01"

  /** Day-grain → group moments.  `d·c` stays BIGINT (days ≤ ~10^4,
    * count ≤ ~10^12 before ANSI raises); the cents-carrying and
    * quadratic moments widen to DECIMAL(38,0) — per DAY row, not per
    * fact row. */
  private val trendMoments: Seq[(String, String)] = {
    val d38 = "CAST(d AS DECIMAL(38,0))"
    Seq("n" -> "SUM(c)", "sx" -> "SUM(d * c)",
      "sy" -> "SUM(CAST(sc AS DECIMAL(38,0)))",
      "sxy" -> s"SUM($d38 * sc)", "sxx" -> s"SUM($d38 * d * c)")
  }

  private val trendDenom =
    "NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0)"

  /** sy/sxy carry cents (100× money); the x-moments don't, so slope and
    * intercept each divide the scale back out ONCE, inside the ROUND —
    * shared verbatim, deterministic IEEE in both engines. */
  private val trendSlope: String =
    s"""ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / $trendDenom
       |  / CAST(100 AS DOUBLE), 6)""".stripMargin

  private val trendIntercept: String =
    s"""ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
       |  - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE)) / $trendDenom
       |  / CAST(100 AS DOUBLE), 6)""".stripMargin

  /** One-level spelling: DuckDB's SUM(BIGINT) accumulates in exact
    * HUGEINT, so its moments equal the engine's day-grain sums exactly
    * (integer sums are grouping-path-independent); the formula
    * fragments are shared verbatim. */
  val linearTrendOracle: String =
    s"""SELECT l_returnflag, n,
       |  $trendSlope AS slope_per_day, $trendIntercept AS intercept
       |FROM (
       |  SELECT l_returnflag, COUNT(*) AS n, SUM(d) AS sx, SUM(cents) AS sy,
       |    SUM(d * cents) AS sxy, SUM(d * d) AS sxx
       |  FROM (
       |    SELECT l_returnflag,
       |      CAST(l_shipdate AS DATE) - DATE '$trendEpoch' AS d,
       |      CAST(${Frag.money("l_extendedprice")} * 100 AS BIGINT) AS cents
       |    FROM lineitem)
       |  GROUP BY 1) t""".stripMargin

  /** Cohort LTV curve — the money companion to [[retention]]: for each
    * signup-week cohort, cumulative purchase revenue by weeks-since-signup
    * plus per-signup LTV.  This is how a growth team reads payback.
    *
    * Scale: the per-(cohort, week) revenue cells aggregate with map-side
    * partials (one user_id-keyed join to attach cohorts, the
    * [[retention]] shape), and the cumulative window runs over the
    * ALREADY AGGREGATED cells — #cohorts × #weeks rows, metadata-sized,
    * partitioned by cohort ([[shareOfTotal]]'s rule: windows only ever
    * see aggregate-sized frames).  Money stays exact DECIMAL through the
    * cumulative sum; the LTV ratio is ONE double division of exact
    * operands (decimal→nearest-double is deterministic on both engines).
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Sources.events(spark, dir)
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date")
        .as("cohort_week"))
    val cohortSize = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_n"))
    val cells = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("purchase_week"),
        expr(Frag.money("value")).as("cents"))
      .join(cohort, Seq("user_id"))
      .filter(col("purchase_week") >= col("cohort_week"))
      .withColumn("weeks_since",
        expr("datediff(purchase_week, cohort_week) div 7").cast("int"))
      .groupBy(col("cohort_week"), col("weeks_since"))
      .agg(count_distinct(col("user_id")).as("buyers"),
        expr(Frag.sumMoney("cents")).as("receita"))
    cells
      .withColumn("receita_cum",
        sum(col("receita")).over(Window.partitionBy(col("cohort_week"))
          .orderBy(col("weeks_since"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(cohortSize), Seq("cohort_week"))
      .select(col("cohort_week"), col("weeks_since"), col("buyers"),
        col("receita"),
        expr("CAST(receita_cum AS DOUBLE) / CAST(cohort_n AS DOUBLE)")
          .as("ltv_per_signup"))
  }

  val cohortLtvOracle: String =
    s"""WITH cohort AS (
       |  SELECT user_id,
       |    CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week
       |  FROM events WHERE event_type = 'signup' GROUP BY 1),
       |csize AS (
       |  SELECT cohort_week, COUNT(*) AS cohort_n FROM cohort GROUP BY 1),
       |cells AS (
       |  SELECT c.cohort_week,
       |    CAST(DATE_DIFF('day', c.cohort_week,
       |      CAST(DATE_TRUNC('week', e.ts) AS DATE)) // 7 AS INT)
       |      AS weeks_since,
       |    COUNT(DISTINCT e.user_id) AS buyers,
       |    ${Frag.sumMoney(Frag.money("e.value"))} AS receita
       |  FROM events e JOIN cohort c ON e.user_id = c.user_id
       |  WHERE e.event_type = 'purchase'
       |    AND CAST(DATE_TRUNC('week', e.ts) AS DATE) >= c.cohort_week
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT cohort_week, weeks_since, buyers, receita,
       |    SUM(receita) OVER (PARTITION BY cohort_week ORDER BY weeks_since
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS receita_cum
       |  FROM cells)
       |SELECT cohort_week, weeks_since, buyers, receita,
       |  CAST(receita_cum AS DOUBLE) / CAST(cohort_n AS DOUBLE)
       |    AS ltv_per_signup
       |FROM cum JOIN csize USING (cohort_week)""".stripMargin

  /** Audience overlap between event types via [[graft.functions.KmvSketch]]
    * — the set-INTERSECTION question HLL cannot answer (its registers union
    * but carry no element identity).  The "audience" of an event type is
    * its set of active (user, day) pairs (user_id·64 + day — day < 32 < 64
    * keeps the packing collision-free and every product exact); per type a
    * KMV sketch keeps the k = 256 smallest distinct [[Mix31]] hashes.  For
    * each type pair the union sketch is the k smallest of the two arrays'
    * union (pure array math on ≤ k-sized inputs), and with n_u = |union
    * sketch|, thr = its largest element, n_both = members of the union
    * sketch present in BOTH input sketches (Beyer et al. 2007):
    *
    *   union_est = n_u < k ? n_u : (k−1)·2^31 DIV thr
    *   inter_est = n_both · union_est DIV n_u
    *
    * All integer arithmetic ((k−1)·2^31 = 2^39), so the ESTIMATES
    * themselves hash-check cross-engine — at sf0.01+ the ~1800-pair
    * audiences exceed k and the gate pins the genuinely APPROXIMATE
    * regime; below k the estimator degrades to exact size by definition
    * (the [[graft.functions.QuantileSketch]] dual-regime contract, both
    * branches spelled in both engines).
    *
    * Scale: the per-type aggregate is map-side mergeable (≤ 8k bytes per
    * (partition, type)); the pair stage touches only #types² k-sized
    * arrays — metadata, never data.  A warehouse persists per-segment
    * sketches and answers any later overlap question without re-scanning
    * raw events.  KmvSketchSpec pins the sketch invariants, merge ≡
    * whole-data equality, and the estimator's error band. */
  def kmvSetOps(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.KmvSketch.register(spark)
    val k = 256
    val sk = Sources.events(spark, dir)
      .select(col("event_type"),
        (col("user_id") * 64 + dayofmonth(col("ts"))).as("pk"))
      .groupBy(col("event_type"))
      .agg(expr(s"kmv_sketch(pk, $k)").as("sk"))
    val a = sk.select(col("event_type").as("et_a"), col("sk").as("sk_a"))
    val b = sk.select(col("event_type").as("et_b"), col("sk").as("sk_b"))
    a.join(b, col("et_a") < col("et_b"))
      .withColumn("u",
        slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k))
      .withColumn("n_u", size(col("u")).cast("long"))
      .withColumn("thr", element_at(col("u"), size(col("u"))))
      .withColumn("n_both",
        size(filter(col("u"), x =>
          array_contains(col("sk_a"), x) && array_contains(col("sk_b"), x)))
          .cast("long"))
      .withColumn("union_est",
        when(col("n_u") < k, col("n_u"))
          .otherwise(expr(s"${(k - 1).toLong * 2147483648L}L DIV thr")))
      .withColumn("inter_est", expr("n_both * union_est DIV n_u"))
      .select(col("et_a"), col("et_b"),
        col("n_u").as("n_union_sketch"), col("n_both"),
        col("union_est"), col("inter_est"))
  }

  val kmvSetOpsOracle: String = {
    val h = graft.functions.Mix31.duckSql("(user_id * 64 + day(ts))")
    s"""WITH ph AS (
       |  SELECT DISTINCT event_type, $h AS h FROM events),
       |kk AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |    FROM ph) t
       |  WHERE rn <= 256),
       |uh AS (
       |  SELECT a.event_type AS et_a, b.event_type AS et_b, x.h
       |  FROM (SELECT DISTINCT event_type FROM kk) a
       |  JOIN (SELECT DISTINCT event_type FROM kk) b
       |    ON a.event_type < b.event_type
       |  JOIN kk x ON x.event_type IN (a.event_type, b.event_type)
       |  GROUP BY 1, 2, 3),
       |uk AS (
       |  SELECT et_a, et_b, h FROM (
       |    SELECT et_a, et_b, h,
       |      ROW_NUMBER() OVER (PARTITION BY et_a, et_b ORDER BY h) AS rn
       |    FROM uh) t
       |  WHERE rn <= 256),
       |st AS (
       |  SELECT u.et_a, u.et_b, COUNT(*) AS n_u, MAX(u.h) AS thr,
       |    COUNT(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
       |               THEN 1 END) AS n_both
       |  FROM uk u
       |  LEFT JOIN kk sa ON sa.event_type = u.et_a AND sa.h = u.h
       |  LEFT JOIN kk sb ON sb.event_type = u.et_b AND sb.h = u.h
       |  GROUP BY 1, 2)
       |SELECT et_a, et_b, n_u AS n_union_sketch, n_both,
       |  CASE WHEN n_u < 256 THEN n_u
       |       ELSE ${255L * 2147483648L} // thr END AS union_est,
       |  n_both * (CASE WHEN n_u < 256 THEN n_u
       |                 ELSE ${255L * 2147483648L} // thr END) // n_u
       |    AS inter_est
       |FROM st""".stripMargin
  }
}
