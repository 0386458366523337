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

  // ------------------------------------------------------------------
  // BFS shortest-path hops
  // ------------------------------------------------------------------

  private def hops(edges: Seq[(Long, Long)], verts: Seq[Long],
      source: Int, iters: Int = 6): Map[Long, Option[Long]] =
    Graph.bfsOf(edges.toDF("src", "dst"), verts.toDF("v"), source, iters)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

  test("chain graph: hop counts accumulate along direction") {
    val h = hops(Seq((0L, 1L), (1L, 2L), (2L, 3L)), Seq(0L, 1L, 2L, 3L),
      source = 0)
    assert(h === Map(0L -> Some(0L), 1L -> Some(1L), 2L -> Some(2L),
      3L -> Some(3L)))
  }

  test("direction matters and disconnected vertices stay unreached") {
    // Edges point AT the source; nothing is reachable from it.
    val h = hops(Seq((1L, 0L), (2L, 1L)), Seq(0L, 1L, 2L, 9L), source = 0)
    assert(h === Map(0L -> Some(0L), 1L -> None, 2L -> None, 9L -> None))
  }

  test("a shortcut beats the long way round") {
    val h = hops(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)),
      Seq(0L, 1L, 2L, 3L), source = 0)
    assert(h(3L) === Some(1L))
  }

  test("iteration cap truncates deeper levels to unreached") {
    val h = hops(Seq((0L, 1L), (1L, 2L), (2L, 3L)), Seq(0L, 1L, 2L, 3L),
      source = 0, iters = 2)
    assert(h === Map(0L -> Some(0L), 1L -> Some(1L), 2L -> Some(2L),
      3L -> None))
  }

  test("trade graph hops: source at zero, -1 only for unreached") {
    val out = Graph.bfsHops(spark, Sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size === 25)
    val bySrc = graft.core.Sources.nation(spark, Sf001).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(bySrc(0)) === 0L)
    assert(out.values.forall(h => h == -1L || (h >= 0L && h <= 6L)))
    val again = Graph.bfsHops(spark, Sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === out)
  }

  // ------------------------------------------------------------------
  // Triangle counting
  // ------------------------------------------------------------------

  private def triCounts(und: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.trianglesOf(und.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two glued triangles, hand-counted per vertex") {
    // {0,1,2} and {1,2,3} share edge 1–2: middle vertices sit in two
    // triangles, outer vertices in one.
    val t = triCounts(Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)))
    assert(t === Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("K4: every vertex is in C(3,2) = 3 triangles") {
    val t = triCounts(Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 2L), (1L, 3L), (2L, 3L)))
    assert(t === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangle-free graphs emit no rows") {
    // A path and a 4-cycle both have wedges but no closures.
    assert(triCounts(Seq((0L, 1L), (1L, 2L), (2L, 3L))).isEmpty)
    assert(triCounts(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))).isEmpty)
  }

  test("trade graph matches a brute-force recount") {
    val out = Graph.triangles(spark, Sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size === 25)
    // Brute-force the same undirected edge set driver-side (≤ #nations²
    // edges) and recount triangles per vertex.
    val und = graft.core.Sources.lineitem(spark, Sf001)
      .join(graft.core.Sources.orders(spark, Sf001),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.core.Sources.customer(spark, Sf001),
        col("o_custkey") === col("c_custkey"))
      .join(graft.core.Sources.supplier(spark, Sf001),
        col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey")).as("a"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
      .distinct().collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong)).toSet
    val verts = und.flatMap(e => Seq(e._1, e._2)).toSeq.distinct.sorted
    val brute = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- verts.indices; j <- i + 1 until verts.size
      k <- j + 1 until verts.size
      (u, v, w) = (verts(i), verts(j), verts(k))
      if und((u, v)) && und((v, w)) && und((u, w))
      x <- Seq(u, v, w)
    } brute(x) += 1L
    val names = graft.core.Sources.nation(spark, Sf001).collect()
      .map(r => r.getInt(0).toLong -> r.getString(1)).toMap
    val expected = names.map { case (k, n) => n -> brute(k) }
    assert(out === expected)
  }
}
