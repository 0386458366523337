package graft

import graft.ops.Basket

/** Basket pair affinity: hand-computed support/lift, the within-basket
  * dedup, and shape invariants on the real lineitem table. */
class BasketSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(lines: Seq[(Long, Long)], minSupport: Long = 2L)
      : Map[(Long, Long), (Long, Long, Long, Double)] =
    Basket.pairAffinityOf(lines.toDF("okey", "pk"), minSupport)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap

  test("hand baskets: support counts and lift") {
    // Orders: 1:{10,20,30}, 2:{10,20}, 3:{10,20}, 4:{30}.
    // (10,20) support 3; (10,30) and (20,30) support 1 — cut at 2.
    // lift(10,20) = 3·4 / (3·3) = 1.333333.
    val out = pairs(Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 30L)))
    assert(out === Map((10L, 20L) -> ((3L, 3L, 3L, 1.333333))))
  }

  test("repeated lines of one part in one basket count once") {
    // Order 1 lists part 10 twice; (10,20) support must still be 2,
    // and n_10 must be 2 (orders, not lines).
    val out = pairs(Seq(
      (1L, 10L), (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L)))
    // lift = 2·2 / (2·2) = 1 — the two parts always co-occur.
    assert(out === Map((10L, 20L) -> ((2L, 2L, 2L, 1.0))))
  }

  test("no pair reaches min support: empty result, stable schema") {
    val df = Basket.pairAffinityOf(
      Seq((1L, 10L), (2L, 20L)).toDF("okey", "pk"), 2L)
    assert(df.collect().isEmpty)
    assert(df.columns.toSeq ===
      Seq("part_a", "part_b", "support", "n_a", "n_b", "lift"))
  }

  test("a-priori prune: sub-minSupport parts never reach the pair join") {
    // Parts 98/99 each sit in ONE existing basket — below minSupport 2
    // they cannot form a qualifying pair, so pruning them is
    // result-invariant (the r12 verdict #3 identity; the tail rides
    // existing orders so n_orders and lift are untouched) and the plan
    // must show the semi-join BELOW the okey self-join.
    val base = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L))
    val tail = Seq((1L, 99L), (2L, 98L))
    assert(pairs(base) === pairs(base ++ tail))
    val plan = Basket.pairAffinityOf(
      (base ++ tail).toDF("okey", "pk"), 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"prune semi-join missing:\n$plan")
  }

  test("real lineitem: ordered pairs, support floor, lift reproduces") {
    val out = Basket.pairAffinity(spark, Sf001).collect()
    assert(out.nonEmpty)
    val nOrders = graft.core.Sources.lineitem(spark, Sf001)
      .select("l_orderkey").distinct().count()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 2L)
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
      val expect = BigDecimal(
        (r.getLong(2) * nOrders).toDouble /
          (r.getLong(3) * r.getLong(4)).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) === expect)
    }
  }
}
