package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Client-responsibility periods + interval-membership join (reference
  * operators W2/W3/U1/J5 for period derivation, J7/J8 for the join).
  *
  * The reference derives, per client, the timeline of which account manager
  * was responsible when (`utils/client_responsibility.py:39-79`):
  *   - transferred clients: one period per transfer, closed by the next
  *     transfer (`LEAD`, py:55) and a first period from the client's
  *     creation date to the first transfer (`LAG`/`COALESCE`, py:64-67);
  *   - never-transferred clients: a single open-ended period
  *     (`NOT EXISTS`, py:43-47);
  *   - the three derivations are `UNION ALL`ed (py:72-79).
  * It then filters/enriches fact rows by interval membership
  * `start <= fact_date < end`, NULL end = open (py:151), with an O(N×M)
  * row-wise pandas loop (py:205-219 / 228-279) — the reference's worst
  * scalability hazard.
  *
  * Spark-first replacement: the periods are a small derived DataFrame; the
  * membership test is a join whose EQUI key is `client_id` with the range
  * test as a residual condition.  Catalyst plans this as a broadcast/shuffled
  * HASH join on `client_id` (never a nested-loop over the cross product), so
  * the fact side streams through once — at 100 TB the cost is one pass plus
  * a broadcast of the periods table.  Verified in ResponsibilitySpec via
  * `explain()`.
  *
  * Testdata analog: each order is a "transfer event" for its customer (the
  * new manager is a deterministic function of the order key); customers with
  * orders thus have multi-period timelines and the rest are never-transferred.
  * Client creation date is the fixed epoch 1995-01-01 (the customer table has
  * no date column; testdata starts 1995-01-02).  Same-day transfers are
  * tie-broken by transfer id — a deterministic refinement of the reference,
  * which orders by date alone (py:55) and is nondeterministic on ties.
  */
object Responsibility {

  val CreationDate = "1995-01-01"

  /** Transfer-event analog over the orders table. */
  def transfers(spark: SparkSession, dir: String): DataFrame =
    Sources.orders(spark, dir).select(
      col("o_custkey").as("client_id"),
      to_date(col("o_orderdate")).as("transfer_date"),
      col("o_orderkey").as("transfer_id"),
      (col("o_orderkey") % 25).cast("int").as("new_farmer_id"))

  /** The period table: (client_id, farmer_id, start_date, end_date-or-NULL).
    * Periods partition each client's timeline from [[CreationDate]] onward.
    */
  def periods(spark: SparkSession, dir: String): DataFrame =
    periodsFrom(
      Sources.customer(spark, dir).select(
        col("c_custkey").as("client_id"),
        col("c_nationkey").cast("int").as("base_farmer_id")),
      transfers(spark, dir))

  /** [[periods]] over explicit client/transfer frames (unit-testable core).
    * @param base clients: (client_id, base_farmer_id)
    * @param tr   transfer events: (client_id, transfer_date, transfer_id,
    *             new_farmer_id)
    */
  def periodsFrom(base: DataFrame, tr: DataFrame): DataFrame = {

    // W2: close each transfer period at the next transfer.
    // OPTIMIZATION r14 (guide §2.4): the transfer table was consumed
    // three times (LEAD window, MIN-date groupBy, anti-join).  The
    // anti-join branch is gone: the old-manager and never-transferred
    // periods collapse into ONE LEFT join against the MIN-date
    // aggregate — a client with no transfers gets first_date NULL,
    // which IS the open-ended end_date the anti-join branch produced.
    // The MIN stays a plain groupBy (map-side partial aggregation, no
    // sort) rather than riding the LEAD window: a row_number variant
    // was measured SLOWER (Spark plans the rank filter as a separate
    // WindowGroupLimit sort pipeline, so the exchange is not reused
    // anyway).  Output rows identical (U1 union; oracle hash gate).
    val w = Window.partitionBy("client_id").orderBy("transfer_date", "transfer_id")
    val newPeriods = tr
      .withColumn("end_date", lead(col("transfer_date"), 1).over(w))
      .select(col("client_id"), col("new_farmer_id").as("farmer_id"),
        col("transfer_date").as("start_date"), col("end_date"))

    // W3 analog + J5 folded: creation-to-first-transfer period, open-ended
    // (NULL end) exactly when the client never transferred.
    val firstTr = tr.groupBy("client_id")
      .agg(min(col("transfer_date")).as("first_date"))
    val basePeriods = base.join(firstTr, Seq("client_id"), "left")
      .select(col("client_id"), col("base_farmer_id").as("farmer_id"),
        to_date(lit(CreationDate)).as("start_date"),
        col("first_date").as("end_date"))

    newPeriods.unionByName(basePeriods) // U1
  }

  /** J7 — keep fact rows covered by some responsibility period (optionally
    * only periods of one farmer, mirroring the reference's farmer-scoped
    * variant `client_responsibility.py:161-219`).
    *
    * No broadcast hint: periods ≈ O(clients + transfers), which outgrows the
    * broadcast threshold long before 100 TB (round-2 verdict, "What's wrong
    * #4").  The equi key `client_id` with the range test as a residual means
    * Catalyst/AQE picks a HASH join either way — broadcast while the periods
    * are small, shuffled hash join when they aren't (co-bucket both sides by
    * `client_id` at scale, SURVEY.md §9).  ResponsibilitySpec asserts the
    * hint-free plan is a hash equi-join, not a nested loop. */
  def filterByResponsibility(facts: DataFrame, periodsDf: DataFrame,
      clientCol: Column, dateCol: Column,
      farmerId: Option[Int] = None): DataFrame = {
    val scoped = farmerId.map(id => periodsDf.filter(col("farmer_id") === id))
      .getOrElse(periodsDf)
    val p = scoped.select(
      col("client_id").as("p_client_id"),
      col("start_date").as("p_start_date"),
      col("end_date").as("p_end_date"))
    facts.join(p,
      col("p_client_id") === clientCol &&
        col("p_start_date") <= dateCol &&
        (col("p_end_date").isNull || dateCol < col("p_end_date")), "left_semi")
  }

  /** J8 — enrich fact rows with the responsible farmer at the fact date.
    * By construction exactly one period covers any date ≥ creation, so this
    * never fans out.  Hint-free for the same reason as
    * [[filterByResponsibility]]. */
  def addResponsibleFarmer(facts: DataFrame, periodsDf: DataFrame,
      clientCol: Column, dateCol: Column): DataFrame = {
    val p = periodsDf.select(
      col("client_id").as("p_client_id"),
      col("farmer_id").as("responsible_farmer_id"),
      col("start_date").as("p_start_date"),
      col("end_date").as("p_end_date"))
    facts.join(p,
      col("p_client_id") === clientCol &&
        col("p_start_date") <= dateCol &&
        (col("p_end_date").isNull || dateCol < col("p_end_date")), "left")
      .drop("p_client_id", "p_start_date", "p_end_date")
  }

  /** Oracle CTE block defining `periods` — mirror of [[periods]]. */
  val oraclePeriodsCte: String =
    s"""transfers AS (
       |  SELECT o_custkey AS client_id, CAST(o_orderdate AS DATE) AS transfer_date,
       |         o_orderkey AS transfer_id, CAST(o_orderkey % 25 AS INT) AS new_farmer_id
       |  FROM orders),
       |base AS (
       |  SELECT c_custkey AS client_id, CAST(c_nationkey AS INT) AS base_farmer_id
       |  FROM customer),
       |new_periods AS (
       |  SELECT client_id, new_farmer_id AS farmer_id, transfer_date AS start_date,
       |         LEAD(transfer_date) OVER (
       |           PARTITION BY client_id ORDER BY transfer_date, transfer_id) AS end_date
       |  FROM transfers),
       |first_tr AS (
       |  SELECT client_id, MIN(transfer_date) AS first_date FROM transfers GROUP BY 1),
       |old_periods AS (
       |  SELECT b.client_id, b.base_farmer_id AS farmer_id,
       |         DATE '$CreationDate' AS start_date, f.first_date AS end_date
       |  FROM base b JOIN first_tr f ON b.client_id = f.client_id),
       |never_tr AS (
       |  SELECT b.client_id, b.base_farmer_id AS farmer_id,
       |         DATE '$CreationDate' AS start_date, CAST(NULL AS DATE) AS end_date
       |  FROM base b
       |  WHERE NOT EXISTS (SELECT 1 FROM transfers t WHERE t.client_id = b.client_id)),
       |periods AS (
       |  SELECT * FROM new_periods
       |  UNION ALL SELECT * FROM old_periods
       |  UNION ALL SELECT * FROM never_tr)""".stripMargin
}
