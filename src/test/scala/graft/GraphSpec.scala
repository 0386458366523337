package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Integer PageRank: hand-computed two-node chain, influence ordering on
  * a hub graph, and conservation bounds on the real trade graph. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long, Long)], verts: Seq[Long],
      iters: Int): Map[Long, Long] =
    Graph.pagerankOf(
      Graph.withOutWeights(edges.toDF("src", "dst", "w")),
      verts.toDF("v"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node chain, hand-computed through two iterations") {
    // 0 → 1, w = 1.  Iter 1: r(1) = 150000 + (85·1000000)÷100 = 1000000,
    // r(0) = 150000.  Iter 2: r(1) = 150000 + (85·150000)÷100 = 277500.
    val r1 = ranksOf(Seq((0L, 1L, 1L)), Seq(0L, 1L), iters = 1)
    assert(r1 === Map(0L -> 150000L, 1L -> 1000000L))
    val r2 = ranksOf(Seq((0L, 1L, 1L)), Seq(0L, 1L), iters = 2)
    assert(r2 === Map(0L -> 150000L, 1L -> 277500L))
  }

  test("inbound weight orders the ranks on a dangling-hub graph") {
    // 0 sends 3/4 of its mass to hub 2 and 1/4 to 1; 1 forwards to 2.
    // The hub has no out-edges (its mass leaks — the dangling case),
    // 1 lives off 0's quarter, 0 lives off the base alone.
    val r = ranksOf(Seq((0L, 2L, 3L), (0L, 1L, 1L), (1L, 2L, 3L)),
      Seq(0L, 1L, 2L), iters = 4)
    assert(r(2L) > r(1L), r.toString)
    assert(r(1L) > r(0L), r.toString)
    assert(r(0L) === 150000L, "no inbound → base mass only")
  }

  test("trade-graph ranks stay inside the mass envelope") {
    val out = Graph.pagerank(spark, Sf001)
    val rows = out.collect()
    assert(rows.length === 25)
    val ranks = rows.map(_.getLong(1))
    assert(ranks.forall(_ >= 150000L), "base mass is a floor")
    // Σ r ≤ initial total mass: the base injects 0.15/vertex and damping
    // keeps 0.85 of the (floored, leaking) previous total.
    assert(ranks.sum <= 25L * 1000000L)
    // Determinism: a rebuilt plan yields identical ranks.
    val again = Graph.pagerank(spark, Sf001).collect().map(_.getLong(1))
    assert(again.sorted.toSeq === ranks.sorted.toSeq)
  }
}
