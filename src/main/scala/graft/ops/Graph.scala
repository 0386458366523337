package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Weighted PageRank over the nation-level trade graph — the
  * message-passing iterative-graph shape next to the connected components
  * in [[graft.llm.Dedup.duplicateClusters]]: CC propagates an idempotent
  * MIN label, PageRank propagates WEIGHTED ADDITIVE mass, which is what
  * importance/influence ranking on any entity graph (domains linking in a
  * crawl, suppliers in a trade network) actually runs.
  *
  * Graph: one edge per (customer nation → supplier nation) trading
  * relation, weight = number of lineitems shipped across it (built from
  * lineitem ⋈ orders ⋈ customer ⋈ supplier, aggregated before any
  * iteration touches it — the iteration input is #nation² rows max, the
  * fact tables are scanned exactly once).
  *
  * Determinism (the oracle reproduces every rank bit-for-bit): ranks are
  * BIGINT micro-units (initial mass 1e6 per vertex) and one iteration is
  *   r'(v) = 150000 + Σ_u (85 * ((r(u) * w(u,v)) div W(u))) div 100
  * — damping 0.85 spelled as integer ×85 ÷100, per-edge floor division,
  * integer sums (order-free).  Dangling mass simply leaks (no out-edges →
  * no contribution), which both engines agree on by construction.  A fixed
  * iteration count, like [[graft.llm.Clustering]]'s Lloyd's.
  *
  * Scale shape (100 TB of fact data, millions of vertices): the edge
  * aggregation is the only corpus-sized work.  Per iteration the rank
  * vector joins the edge table on src — broadcast here (#vertices ≪
  * edges, the kmeans centroid pattern); at web-scale vertex counts it
  * becomes an equi-join where BOTH sides are hash-partitioned on src, and
  * since edges never change, pre-partitioning/bucketing the edge table by
  * src makes every iteration reuse that layout and shuffle only the rank
  * vector (GraphX/Pregel's strategy, spelled in plain DataFrame ops).
  */
object Graph {

  private val Iters = 4
  private val InitMicro = 1000000L
  private val BaseMicro = 150000L // (1 − 0.85) × 1e6

  /** (src, dst, w, wout) edge table with precomputed out-weights. */
  private def edges(spark: SparkSession, dir: String): DataFrame = {
    val e = Sources.lineitem(spark, dir)
      .join(Sources.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Sources.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(Sources.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    withOutWeights(e)
  }

  def pagerank(spark: SparkSession, dir: String,
      iters: Int = Iters): DataFrame = {
    val verts = Sources.nation(spark, dir)
      .select(col("n_nationkey").as("v"))
    // Materialize the edge aggregation ONCE (eager localCheckpoint, the
    // duplicateClusters convention): a lazy plan would re-derive the
    // 4-table join on every iteration reference — the audit showed the
    // fact subtree repeated 2× per iteration before this. This is the
    // persisted edge table every Pregel-style runtime keeps.
    pagerankOf(edges(spark, dir).localCheckpoint(), verts, iters)
      .join(Sources.nation(spark, dir),
        col("v") === col("n_nationkey"))
      .select(col("n_name"), col("r").as("rank_micro"))
  }

  /** Core iteration over explicit (src, dst, w, wout) edges and a vertex
    * frame — spec-testable on hand-built graphs.  Returns (v, r). */
  private[graft] def pagerankOf(e: DataFrame, verts: DataFrame,
      iters: Int): DataFrame = {
    var ranks = verts.withColumn("r", lit(InitMicro))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(broadcast(ranks), e("src") === ranks("v"))
        .select(col("dst").as("v"),
          expr("(85 * ((r * w) DIV wout)) DIV 100").as("c"))
        .groupBy("v")
        .agg(sum("c").cast("bigint").as("c"))
      ranks = verts
        .join(contribs, Seq("v"), "left")
        .select(col("v"),
          (lit(BaseMicro) + coalesce(col("c"), lit(0L))).as("r"))
    }
    ranks
  }

  /** Out-weight prep for [[pagerankOf]] from raw (src, dst, w) edges. */
  private[graft] def withOutWeights(e: DataFrame): DataFrame =
    e.join(e.groupBy("src").agg(sum("w").cast("bigint").as("wout")), "src")

  def pagerankOracle(iters: Int = Iters): String = {
    // Same per-edge integer contribution; `//` is DuckDB's floor division
    // (Spark spells it DIV — identical on the non-negative operands here).
    def step(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT v0.v, $BaseMicro + COALESCE(c.c, 0) AS r
         |  FROM (SELECT n_nationkey AS v FROM nation) v0
         |  LEFT JOIN (
         |    SELECT e.dst AS v,
         |      CAST(SUM((85 * (($prev.r * e.w) // e.wout)) // 100) AS BIGINT) AS c
         |    FROM e JOIN $prev ON e.src = $prev.v
         |    GROUP BY 1) c ON v0.v = c.v)""".stripMargin
    val iterCtes = (1 to iters)
      .map(i => step(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH edges AS (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
       |    COUNT(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2),
       |outw AS (
       |  SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM edges GROUP BY 1),
       |e AS (
       |  SELECT edges.src, dst, w, wout
       |  FROM edges JOIN outw ON edges.src = outw.src),
       |r0 AS (
       |  SELECT n_nationkey AS v, CAST($InitMicro AS BIGINT) AS r
       |  FROM nation),
       |$iterCtes
       |SELECT n_name, r$iters.r AS rank_micro
       |FROM r$iters JOIN nation ON r$iters.v = n_nationkey""".stripMargin
  }

  // ------------------------------------------------------------------
  // BFS shortest-path hops
  // ------------------------------------------------------------------

  /** Minimum hop count from a source nation over the STRONG trade edges
    * (weight ≥ the mean edge weight, decided as the exact integer
    * comparison w·#edges ≥ Σw — no quotient crosses the gate) — the
    * distance/reachability member of the graph family next to
    * [[pagerank]] (importance), [[graft.llm.Dedup.duplicateClusters]]
    * (community) and [[triangles]] (cohesion).  Unreachable vertices
    * report −1.
    *
    * The iteration is Bellman-Ford-shaped message passing with one
    * subtle plan property: each round must reference the previous
    * distance vector EXACTLY once, or the lazy plan doubles per round
    * (2^iters copies of round 0).  Zero-cost self-edges appended to the
    * edge table make the relaxation a single join —
    *   d'(v) = min over e'(u,v) of d(u) + cost(u,v)
    * with e' = edges(cost 1) ∪ self-loops(cost 0) — so the old vector
    * appears once per round and the plan grows linearly, the
    * [[pagerankOf]] discipline.  Edge table checkpointed once; at
    * web-scale vertex counts the same bucketing note as [[pagerank]]
    * applies.
    */
  def bfsHops(spark: SparkSession, dir: String, source: Int = 0,
      iters: Int = 6): DataFrame = {
    // r14 (guide §2.4): the edge aggregation is referenced twice (the
    // mean-weight bounds AND the strong filter) — without an eager
    // checkpoint the 4-table fact join ran twice.  Materialize the
    // ≤ nations² edge table once; everything downstream reads it.
    val e = Sources.lineitem(spark, dir)
      .join(Sources.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Sources.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(Sources.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val bounds = e.agg(sum("w").cast("bigint").as("tot"),
      count(lit(1)).as("cnt"))
    val strong = e.crossJoin(broadcast(bounds))
      .where(expr("w * cnt >= tot"))
      .select("src", "dst")
    val verts = Sources.nation(spark, dir)
      .select(col("n_nationkey").as("v"))
    val hops = bfsOf(strong.localCheckpoint(), verts, source, iters)
    Sources.nation(spark, dir)
      .join(hops, col("n_nationkey") === hops("v"))
      .select(col("n_name"),
        coalesce(col("d"), lit(-1L)).cast("bigint").as("hops"))
  }

  /** Core over explicit (src, dst) edges — spec-testable on hand
    * graphs.  Returns (v, d) with d NULL when unreachable. */
  private[graft] def bfsOf(e: DataFrame, verts: DataFrame, source: Int,
      iters: Int): DataFrame = {
    val withSelf = e.select(col("src"), col("dst"), lit(1L).as("cost"))
      .unionAll(verts.select(col("v").as("src"), col("v").as("dst"),
        lit(0L).as("cost")))
    var dist = verts.select(col("v"),
      when(col("v") === source, 0L).otherwise(lit(null)).cast("bigint")
        .as("d"))
    for (_ <- 1 to iters) {
      val relaxed = withSelf
        .join(dist, withSelf("src") === dist("v"))
        .where(col("d").isNotNull)
        .select(col("dst").as("v"), (col("d") + col("cost")).as("c"))
        .groupBy("v").agg(min("c").cast("bigint").as("c"))
      dist = verts.join(relaxed, Seq("v"), "left")
        .select(col("v"), col("c").as("d"))
    }
    dist
  }

  def bfsHopsOracle(source: Int = 0, iters: Int = 6): String = {
    def step(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT v0.v, c.d FROM verts v0
         |  LEFT JOIN (
         |    SELECT e2.dst AS v, CAST(MIN($prev.d + e2.cost) AS BIGINT) AS d
         |    FROM e2 JOIN $prev ON e2.src = $prev.v
         |    WHERE $prev.d IS NOT NULL
         |    GROUP BY 1) c ON v0.v = c.v)""".stripMargin
    val iterCtes = (1 to iters)
      .map(i => step(s"d${i - 1}", s"d$i")).mkString(",\n")
    s"""WITH edges AS MATERIALIZED (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
       |    COUNT(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  WHERE c.c_nationkey <> s.s_nationkey
       |  GROUP BY 1, 2),
       |verts AS MATERIALIZED (SELECT n_nationkey AS v FROM nation),
       |e2 AS MATERIALIZED (
       |  SELECT src, dst, CAST(1 AS BIGINT) AS cost
       |  FROM edges CROSS JOIN (
       |    SELECT CAST(SUM(w) AS BIGINT) AS tot, COUNT(*) AS cnt
       |    FROM edges) b
       |  WHERE w * cnt >= tot
       |  UNION ALL
       |  SELECT v, v, CAST(0 AS BIGINT) FROM verts),
       |d0 AS (
       |  SELECT v, CASE WHEN v = $source THEN CAST(0 AS BIGINT) END AS d
       |  FROM verts),
       |$iterCtes
       |SELECT n_name,
       |  CAST(COALESCE(d$iters.d, -1) AS BIGINT) AS hops
       |FROM d$iters JOIN nation ON d$iters.v = n_nationkey""".stripMargin
  }

  // ------------------------------------------------------------------
  // Triangle counting
  // ------------------------------------------------------------------

  /** Per-nation triangle participation on the undirected trade graph —
    * the clustering/cohesion metric next to [[pagerank]]'s importance
    * ranking (communities, spam/bot ring detection on entity graphs).
    *
    * Algorithm: degree-ordered edge orientation (the standard distributed
    * triangle enumeration).  Every undirected edge {a,b} is directed from
    * the lower- to the higher-ranked endpoint under rank(v) = (deg(v), v);
    * a triangle {u,v,w} with rank u < v < w is then found EXACTLY once as
    * the wedge e(u,v) ⋈ e(v,w) closed by e(u,w).  Orienting by degree
    * (not id) is the scale lever: every vertex's out-degree is bounded by
    * O(√|E|) regardless of how skewed the raw degree distribution is, so
    * the wedge join never explodes on a hub vertex the way id-ordering
    * does — the difference between O(|E|^1.5) total wedge work and a
    * hub-degree² blowup on a power-law graph.
    *
    * Scale shape: the fact tables are scanned once to build the distinct
    * trade-pair edge list (corpus-sized work); everything after runs on
    * the #nations²-bounded edge table, materialized once (eager
    * localCheckpoint, the [[pagerank]] convention) because the wedge
    * join references it three times — a lazy plan would re-derive the
    * 4-table fact join per reference.  All joins are equi-joins on vertex
    * ids; counts are exact integers.
    */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val und = Sources.lineitem(spark, dir)
      .join(Sources.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Sources.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(Sources.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey")).as("a"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
      .distinct()
    val perVertex = trianglesOf(und.localCheckpoint())
    Sources.nation(spark, dir)
      .join(perVertex, col("n_nationkey") === col("v"), "left")
      .select(col("n_name"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Core count over an undirected (a, b) edge frame with a < b, distinct
    * — spec-testable on hand graphs.  Returns (v, triangles).
    *
    * The oriented edge table is materialized (eager localCheckpoint)
    * before the wedge join references it three times: `e`'s own plan
    * reads `und` three ways (edges + both degree joins), so a lazy `e`
    * would re-run that subtree per reference — the same repeated-subtree
    * trap the [[pagerank]] iteration hit. */
  private[graft] def trianglesOf(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).cast("bigint").as("deg"))
    // Orient each edge low-rank → high-rank under rank(v) = (deg, v).
    val e = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("w"))
      .localCheckpoint()
    val wedges = e.select(col("u").as("x"), col("w").as("y"))
      .join(e.select(col("u").as("y"), col("w").as("z")), "y")
    val tris = wedges.join(
      e.select(col("u").as("x"), col("w").as("z")), Seq("x", "z"))
    tris.select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy("v").agg(count(lit(1)).cast("bigint").as("triangles"))
  }

  // The CTEs are MATERIALIZED: DuckDB otherwise inlines `und` into every
  // one of its (transitively ~27) references, re-running the 4-table
  // fact join per reference — the SQL-side twin of the localCheckpoint
  // above.  Spark never parses this string.
  val trianglesOracle: String =
    """WITH und AS MATERIALIZED (
      |  SELECT DISTINCT LEAST(c.c_nationkey, s.s_nationkey) AS a,
      |    GREATEST(c.c_nationkey, s.s_nationkey) AS b
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey),
      |deg AS MATERIALIZED (
      |  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
      |  FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
      |  GROUP BY 1),
      |e AS MATERIALIZED (
      |  SELECT CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.a ELSE u.b
      |    END AS u,
      |    CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.b ELSE u.a
      |    END AS w
      |  FROM und u
      |  JOIN deg da ON u.a = da.v
      |  JOIN deg db ON u.b = db.v),
      |tri AS MATERIALIZED (
      |  SELECT e1.u AS x, e1.w AS y, e2.w AS z
      |  FROM e e1
      |  JOIN e e2 ON e1.w = e2.u
      |  JOIN e e3 ON e3.u = e1.u AND e3.w = e2.w),
      |verts AS (
      |  SELECT x AS v FROM tri
      |  UNION ALL SELECT y AS v FROM tri
      |  UNION ALL SELECT z AS v FROM tri)
      |SELECT n.n_name,
      |  CAST(COALESCE(c.n, 0) AS BIGINT) AS triangles
      |FROM nation n
      |LEFT JOIN (SELECT v, COUNT(*) AS n FROM verts GROUP BY 1) c
      |  ON n.n_nationkey = c.v""".stripMargin
}
