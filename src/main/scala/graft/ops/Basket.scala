package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Market-basket pair affinity over orders — "which parts are bought
  * together", the co-occurrence/frequent-itemset primitive behind
  * recommendations and assortment analysis (beyond-reference analytics
  * on the TPC-H fact tables, the [[Markov]] of the order domain).
  *
  * Candidate generation is basket-local: the (order, part) self-join
  * keys on l_orderkey, so per-key pair work is bounded by basket size²
  * (TPC-H baskets are ≤ 7 lines; real carts are tens) — never parts²
  * and never orders².  Before pair generation, the classical a-priori
  * prune drops every part in fewer than minSupport baskets (such a part
  * cannot appear in any qualifying pair — result-identical by
  * construction, BasketSpec pins it), shrinking both self-join inputs
  * and the pair exchange on any popularity distribution with a
  * sub-minSupport tail.  The pair aggregation map-combines, and the
  * support filter cuts the singleton tail before the lift joins.  The
  * per-part order counts and the 1-row order total are dimension-sized
  * sides (Spark broadcasts them on its own; the 1-row total is the
  * scalar-subquery crossJoin precedent).  The distinct basket frame is
  * consumed three times (pair sides + part counts), so it is persisted
  * once (the ngramJaccard convention; cache lifecycle caller-owned).
  *
  * Determinism: support and the per-part counts are exact integers;
  * lift = (support·N) / (n_a·n_b) is ONE IEEE division of exact int64
  * operands (numerator ≤ ~2^41 at sf0.1), shared verbatim, ROUND 6.
  */
object Basket {

  /** Shared verbatim with the oracle: one exact-operand IEEE division. */
  private val LiftExpr =
    "ROUND(CAST(support * n_orders AS DOUBLE) / CAST(n_a * n_b AS DOUBLE), 6)"

  def pairAffinity(spark: SparkSession, dir: String,
      minSupport: Long = 2L): DataFrame =
    pairAffinityOf(Sources.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pk")),
      minSupport)

  /** Core over raw (okey, pk) basket lines — spec-testable on hand
    * baskets.  Repeated lines of one part in one basket count once. */
  private[graft] def pairAffinityOf(lines: DataFrame,
      minSupport: Long): DataFrame = {
    val baskets = lines.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partOrders = baskets.groupBy("pk")
      .agg(count(lit(1)).cast("bigint").as("n"))
    // Classical a-priori prune (r12 verdict #3): a part in fewer than
    // minSupport baskets cannot appear in ANY pair with
    // support >= minSupport, so both self-join inputs drop its lines
    // BEFORE pair generation — identical output by construction, smaller
    // pair exchange whenever the part popularity distribution has a
    // sub-minSupport tail.  CONDITIONAL: one cheap driver-side probe
    // over the persisted baskets (it doubles as the persist
    // materializer) decides whether a tail exists at all — on
    // distributions where every part is frequent (TPC-H at
    // minSupport=2: ~30 baskets/part) the semi-join would prune nothing
    // and only pay its broadcast + two extra stages (measured +2.0 s at
    // sf0.1), so it is skipped and the plan is the bare self-join.
    // Broadcast semi-join when it does engage: the frequent-part id set
    // is dimension-sized next to the basket lines (and shrinks as
    // minSupport grows), so the prune adds no basket-side shuffle.
    val tailExists =
      !partOrders.where(col("n") < minSupport).limit(1).isEmpty
    val pruned =
      if (!tailExists) baskets
      else baskets.join(
        broadcast(partOrders.where(col("n") >= minSupport).select(col("pk"))),
        Seq("pk"), "left_semi")
    val pairs = pruned.select(col("okey"), col("pk").as("part_a"))
      .join(pruned.select(col("okey"), col("pk").as("part_b")), "okey")
      .where(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
    val totalOrders = baskets.agg(
      count_distinct(col("okey")).as("n_orders"))
    pairs
      .join(partOrders.select(col("pk").as("part_a"), col("n").as("n_a")),
        "part_a")
      .join(partOrders.select(col("pk").as("part_b"), col("n").as("n_b")),
        "part_b")
      .crossJoin(broadcast(totalOrders))
      .select(col("part_a"), col("part_b"), col("support"),
        col("n_a"), col("n_b"), expr(LiftExpr).as("lift"))
  }

  def pairAffinityOracle(minSupport: Long = 2L): String =
    s"""WITH baskets AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
       |  FROM lineitem),
       |pairs AS (
       |  SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS support
       |  FROM baskets a JOIN baskets b
       |    ON a.okey = b.okey AND a.pk < b.pk
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $minSupport),
       |part_orders AS (
       |  SELECT pk, CAST(COUNT(*) AS BIGINT) AS n FROM baskets GROUP BY 1),
       |total AS (
       |  SELECT COUNT(DISTINCT okey) AS n_orders FROM baskets)
       |SELECT part_a, part_b, support, n_a, n_b, $LiftExpr AS lift
       |FROM (
       |  SELECT p.part_a, p.part_b, p.support, pa.n AS n_a, pb.n AS n_b,
       |    t.n_orders
       |  FROM pairs p
       |  JOIN part_orders pa ON p.part_a = pa.pk
       |  JOIN part_orders pb ON p.part_b = pb.pk
       |  CROSS JOIN total t)""".stripMargin
}
