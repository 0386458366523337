package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Distributed k-means over the embeddings table, and the semantic
  * deduplication built on top of it (the SemDeDup recipe: cluster the
  * corpus, then look for near-duplicates only WITHIN a cluster — the
  * cluster assignment is the candidate bound that replaces an all-pairs
  * cosine scan).  Beyond the reference surface, per the LLM-pipeline brief;
  * the reference has no clustering operator of any kind.
  *
  * Determinism is the whole design (the oracle must reproduce every
  * centroid bit-for-bit):
  *
  *   - Embeddings are quantized once to exact integers
  *     (`round(x * 1000)` per element — max |x| is ~0.53 in this corpus, so
  *     values stay ≪ overflow and the quantization error is bounded at
  *     5e-4 per element).  All distances are then exact BIGINT sums of
  *     squares, and cross-row aggregation (the centroid update) sums exact
  *     integers — partition-order independent, unlike a float sum.
  *   - Initial centroids are the `k` lowest vec_ids (the [[Similarity]]
  *     IVF convention), not an RNG draw.
  *   - The centroid update is the ROUNDED INTEGER MEAN: `round(sum/count)`
  *     with the sum and count exact, the division an IEEE double op on
  *     integers ≪ 2^53, and both engines rounding half away from zero —
  *     so the next iteration's centroids are again exact integers.
  *   - Assignment ties break on (dist ASC, cid ASC); empty clusters simply
  *     drop (both engines derive the same survivor set).
  *
  * Scale shape (100 TB): per iteration, the assignment is a BROADCAST of
  * k×dim integers against a scan (no shuffle of the corpus side), and the
  * update is one groupBy(cid, pos) with map-side partial sums — k×dim
  * groups regardless of data size.  The iteration count is a constant.  A
  * production run would persist the quantized vectors and checkpoint each
  * iteration's assignment; at this testbed's plan depth (3 iterations) the
  * single lazy plan is fine.  Pair generation in [[semanticDedup]] is
  * bounded by Σ cluster_size² — k is chosen so clusters stay ~corpus/k;
  * at 100 TB one raises k (clusters of a few thousand docs), keeping the
  * per-cluster pair work constant — and the pair join shuffles ids only.
  */
object Clustering {

  // SemDeDup wants MANY SMALL clusters (the pair bound is Σ cluster_size²,
  // so per-corpus pair work scales with N²/k — at 100 TB one raises k to
  // keep cluster sizes roughly constant).  16 keeps sf0.001's clusters
  // non-trivial while quartering sf0.1's pair volume vs k = 8.
  val DefaultK = 16
  val DefaultIters = 3

  /** `round(x*1000)` quantization, Spark spelling (FLOAT[] → BIGINT[]). */
  private[llm] val quantSpark =
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** Same quantization, DuckDB spelling (DOUBLE[] → BIGINT[]). */
  private[llm] val quantDuck =
    "list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x * 1000) AS BIGINT))"

  /** Exact integer squared L2 distance: the codegen'd
    * [[graft.functions.SquaredL2]] kernel ([[assignments]] registers it).
    * Exact integers have no summation-order contract, so the declarative
    * fold spec ([[distSpec]], asserted ≡ in ClusteringSpec) and the DuckDB
    * `list_reduce` oracle agree with it unconditionally. */
  private def distSpark(a: String, b: String): String = s"vec_dist2($a, $b)"

  /** Declarative HOF spelling — the SPEC for [[graft.functions.SquaredL2]]. */
  private[graft] def distSpec(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)),
       |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin

  /** DuckDB mirror of [[distSpark]] — same exact integer arithmetic. */
  private def distDuck(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, len($a)),
       |        i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
       |    (acc, v) -> acc + v)""".stripMargin

  /** Final Lloyd's-iteration assignment: (vec_id, cid, dist).
    *
    * The per-row argmin is a `min(struct(dist, cid))` AGGREGATE, not a
    * `row_number` window (r12): both spell the same (dist ASC, cid ASC)
    * tie-break, but the window form shuffled all n×k scored rows — each
    * still carrying the 8·dim-byte quantized vector — to sort them per
    * vec_id, which is exactly the exchange that would melt at an
    * adaptive k (n×k grows with n²/target).  The aggregate form folds
    * the k candidates into one 16-byte struct per vec_id INSIDE the
    * scan stage (map-side partial min over the broadcast-product
    * stream), so the only exchange per iteration is n one-struct rows;
    * the quantized vectors are re-attached by a vec_id equi-join ONLY
    * for the centroid update (and not at all after the last
    * iteration). */
  private[graft] def assignments(spark: SparkSession, dir: String,
      k: Int = DefaultK, iters: Int = DefaultIters): DataFrame = {
    graft.functions.SquaredL2.register(spark)
    // r14: the quantized frame feeds every iteration's assignment AND
    // centroid update (2 references × iters) — persist it once so the
    // embeddings scan + quantize transform runs once, not O(iters)
    // times (cache lifecycle caller-owned; Bench/Verify clearCache).
    val q = Sources.embeddings(spark, dir)
      .select(col("vec_id"), expr(quantSpark).as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids = q.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    var assigned: DataFrame = null
    for (it <- 1 to iters) {
      // k×dim integers: a legitimate bounded broadcast (the IVF pattern).
      assigned = q.crossJoin(broadcast(centroids))
        .select(col("vec_id"),
          struct(expr(distSpark("qv", "cv")).as("dist"), col("cid")).as("dc"))
        .groupBy(col("vec_id"))
        .agg(min(col("dc")).as("dc"))
        .select(col("vec_id"), col("dc.cid").as("cid"),
          col("dc.dist").as("dist"))
      if (it < iters)
        // Rounded integer mean per (cid, pos): exact int sums (map-side
        // partials, k×dim groups), then ONE deterministic double division.
        centroids = assigned.join(q, "vec_id")
          .select(col("cid"), posexplode(col("qv")))
          .groupBy(col("cid"), col("pos"))
          .agg(expr("CAST(round(CAST(sum(col) AS DOUBLE) / count(*)) AS BIGINT)")
            .as("m"))
          .groupBy(col("cid"))
          .agg(expr("transform(sort_array(collect_list(struct(pos, m))), s -> s.m)")
            .as("cv"))
    }
    assigned
  }

  /** Per-cluster summary of the converged assignment — sizes and EXACT
    * integer inertia (so the whole output hash-checks). */
  def kmeans(spark: SparkSession, dir: String,
      k: Int = DefaultK, iters: Int = DefaultIters): DataFrame =
    assignments(spark, dir, k, iters)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("dist")).as("inertia"),
        min(col("vec_id")).as("first_member"))

  /** CTE chain `q, c0, d1, a1, c1, d2, a2, …` ending at `a$iters` — the
    * DuckDB mirror of [[assignments]], iterations unrolled. */
  private def assignCtes(kSql: String, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH q AS (
       |  SELECT vec_id, $quantDuck AS qv FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < $kSql)""".stripMargin
    for (it <- 1 to iters) {
      sb ++= s""",
         |d$it AS (
         |  SELECT q.vec_id, q.qv, c.cid, ${distDuck("q.qv", "c.cv")} AS dist
         |  FROM q CROSS JOIN c${it - 1} c),
         |a$it AS (
         |  SELECT vec_id, qv, cid, dist FROM (
         |    SELECT vec_id, qv, cid, dist,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id
         |                         ORDER BY dist ASC, cid ASC) AS rn
         |    FROM d$it) t
         |  WHERE rn = 1)""".stripMargin
      if (it < iters)
        sb ++= s""",
           |c$it AS (
           |  SELECT cid, list(m ORDER BY pos) AS cv
           |  FROM (SELECT cid, u.p AS pos,
           |          CAST(round(CAST(SUM(u.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
           |        FROM (SELECT cid,
           |                UNNEST(list_transform(generate_series(1, len(qv)),
           |                  i -> {'p': i - 1, 'v': qv[i]})) AS u
           |              FROM a$it) px
           |        GROUP BY cid, u.p) s
           |  GROUP BY cid)""".stripMargin
    }
    sb.toString
  }

  def kmeansOracle(k: Int = DefaultK, iters: Int = DefaultIters): String =
    s"""${assignCtes(k.toString, iters)}
       |SELECT cid, COUNT(*) AS n_members,
       |  CAST(SUM(dist) AS BIGINT) AS inertia,
       |  MIN(vec_id) AS first_member
       |FROM a$iters GROUP BY cid""".stripMargin

  /** SemDeDup: exact-cosine near-duplicate pairs, candidates bounded to
    * same-cluster pairs of the converged k-means assignment.  The cosine
    * kernel and its determinism story are [[Dedup.embeddingCosine]]'s
    * (per-row left fold over the ORIGINAL double vectors — cluster ids
    * bound candidates; they never touch the score). */
  def semanticDedup(spark: SparkSession, dir: String,
      minCosine: Double = 0.35, k: Int = DefaultK,
      iters: Int = DefaultIters): DataFrame = {
    // Fail-fast sizing guard (the [[Dedup.embeddingCosine]] recipe, r12):
    // pair work is Σ cluster_size² ≈ n²/k, so a k sized for a much
    // smaller corpus makes the within-cluster pair join explode
    // quadratically (the fixed k = 16 ran 268 s at sf10 and only gets
    // worse).  Refuse up front when the mean cluster size exceeds ~16×
    // the design target; [[semanticDedupAdaptive]] never trips this —
    // it computes k from the same count and passes it down.
    require(k > 0, s"semanticDedup: k must be positive, got $k")
    val n = Sources.embeddings(spark, dir).count()
    val needed = adaptiveKmeansK(n)
    require(needed / k < 16,
      s"semanticDedup: k=$k gives ~${n / math.max(k, 1)} vectors per " +
        s"cluster at corpus size $n — this configuration is sized for a " +
        s"smaller corpus and its within-cluster pair volume would be " +
        s"~${needed / math.max(k, 1)}× the design target. Use " +
        s"semanticDedupAdaptive (would pick k=$needed) or pass a larger k.")
    semanticDedupSized(spark, dir, minCosine, k, iters)
  }

  /** Upper clamp for [[adaptiveKmeansK]]: past this the per-iteration
    * centroid broadcast (k×dim integers) stops being trivially
    * broadcast-sized. */
  val MaxK = 65536

  /** Design mean cluster size for [[adaptiveKmeansK]] — the pair bound
    * Σ cluster_size² ≈ n·KTarget is linear in the corpus at this size. */
  val KTarget = 128L

  /** Mean-cluster-size-targeted k: the smallest k whose clusters hold
    * ≤ `target` vectors each on average, clamped to [DefaultK, MaxK].
    * Integer-only (one ceil-div) so the DuckDB oracle computes the
    * IDENTICAL value via [[adaptiveKSql]] — the [[Dedup.adaptiveLshBits]]
    * recipe applied to the LAST manual scale knob (r11 verdict #1):
    * holding the mean cluster size constant bounds
    * Σ cluster_size² ≈ n·target, so SemDeDup's pair work grows linearly
    * with the corpus instead of quadratically. */
  private[graft] def adaptiveKmeansK(count: Long, target: Long = KTarget): Int =
    math.min(MaxK.toLong,
      math.max(DefaultK.toLong, (count + target - 1) / target)).toInt

  /** The adaptive-k rule, DuckDB spelling — interpolated from the SAME
    * constants as [[adaptiveKmeansK]] so the two spellings cannot desync
    * (r12 advice #4); ClusteringSpec pins them equal on the boundary
    * fixtures. */
  private[graft] val adaptiveKSql: String =
    s"(SELECT GREATEST($DefaultK, LEAST($MaxK, " +
      s"(COUNT(*) + ${KTarget - 1}) // $KTarget)) FROM embeddings)"

  /** [[semanticDedup]] with k computed from ONE cheap count scan via
    * [[adaptiveKmeansK]] — the same query needs no per-scale edit from
    * sf0.01 through sf10; the corpus count is the knob. */
  def semanticDedupAdaptive(spark: SparkSession, dir: String,
      minCosine: Double = 0.35, iters: Int = DefaultIters): DataFrame = {
    val k = adaptiveKmeansK(Sources.embeddings(spark, dir).count())
    semanticDedupSized(spark, dir, minCosine, k, iters)
  }

  /** [[semanticDedup]] body with the sizing already settled — no count
    * scan, no guard. */
  private def semanticDedupSized(spark: SparkSession, dir: String,
      minCosine: Double, k: Int, iters: Int): DataFrame = {
    val asg = assignments(spark, dir, k, iters).select("vec_id", "cid")
    // Both sides of the pair join read this table; materialize it once so
    // the 3-iteration k-means lineage isn't executed twice (the
    // [[Dedup.ngramJaccard]] signature-table pattern — cache lifecycle is
    // caller-owned, Bench/Verify clearCache() between queries).
    val emb = Similarity.withNorm(Sources.embeddings(spark, dir))
      .join(asg, "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = emb.select(col("cid"), col("vec_id").as("vec_a"),
        col("embedding").as("q_embedding"), col("norm").as("q_norm"))
      .join(emb.select(col("cid"), col("vec_id").as("vec_b"),
        col("embedding"), col("norm")), Seq("cid"))
      .filter(col("vec_a") < col("vec_b"))
    pairs
      .withColumn("cosine", expr(s"${Similarity.dot} / (norm * q_norm)"))
      .filter(col("cosine") >= minCosine)
      .select(col("cid"), col("vec_a"), col("vec_b"),
        round(col("cosine"), 6).as("cosine"))
  }

  def semanticDedupOracle(minCosine: Double = 0.35, k: Int = DefaultK,
      iters: Int = DefaultIters): String =
    semanticDedupOracleFrom(assignCtes(k.toString, iters), minCosine, iters)

  /** DuckDB oracle for [[semanticDedupAdaptive]]: ONE static SQL string
    * for every scale — k is computed IN SQL from the same integer-only
    * ceil-div rule ([[adaptiveKSql]]), so the oracle can never desync
    * from the engine's sizing. */
  def semanticDedupAdaptiveOracle(minCosine: Double = 0.35,
      iters: Int = DefaultIters): String =
    semanticDedupOracleFrom(assignCtes(adaptiveKSql, iters), minCosine, iters)

  private def semanticDedupOracleFrom(ctes: String, minCosine: Double,
      iters: Int): String =
    s"""$ctes,
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |n AS (SELECT vec_id, emb,
       |        sqrt(${Similarity.dotOracle("emb", "emb")}) AS norm FROM e),
       |m AS (SELECT a.vec_id, a.cid, n.emb, n.norm
       |      FROM a$iters a JOIN n ON n.vec_id = a.vec_id),
       |scored AS (
       |  SELECT a.cid, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${Similarity.dotOracle("b.emb", "a.emb")} / (b.norm * a.norm) AS cos
       |  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id)
       |SELECT cid, vec_a, vec_b, ROUND(cos, 6) AS cosine
       |FROM scored WHERE cos >= $minCosine""".stripMargin

  /** Exact BIGINT dot fold, Spark spelling (quantized centroids). */
  private def intDotSpark(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> x * y),
       |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin

  /** Same fold, DuckDB spelling. */
  private def intDotDuck(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, len($a)),
       |        i -> $a[i] * $b[i])),
       |    (acc, v) -> acc + v)""".stripMargin

  /** Per-LABEL centroid similarity matrix: the mean embedding of every
    * label (the [[assignments]] rounded-integer-mean convention, so each
    * centroid is an exact BIGINT vector) and the pairwise cosine between
    * label centroids — the corpus-composition view a curation pass reads
    * before [[semanticDedup]]: two labels whose centroids sit at cosine
    * ≈ 1 are candidate merge/contamination classes, near-orthogonal
    * labels are genuinely distinct material.
    *
    * Determinism: quantize → exact integer sums → ONE rounded division
    * per (label, dim); both dot products and squared norms are integer
    * folds (no float-sum order dependence), and the cosine is a single
    * shared ROUND-6 chain.
    *
    * Scale: the centroid aggregate exchanges #labels × dim integer
    * cells (map-side partial sums — the corpus vectors are NEVER
    * shuffled), and the pair stage is a #labels-row broadcast
    * nested-loop — bounded by the label vocabulary, not the data. */
  /** Greedy k-center coreset (Gonzalez 1985 farthest-point traversal) —
    * the DIVERSE-SUBSET selector a training-data pipeline uses where
    * [[semanticDedup]] removes redundancy: pick the lowest vec_id, then
    * repeatedly pick the point FARTHEST from everything picked so far.
    * The greedy sequence is a 2-approximation of the optimal k-center
    * cover, and its distances are the coverage radii — d2 of selection i
    * bounds how far any corpus point is from the first i centers, the
    * number a "how many exemplars do I need" curve reads off directly.
    *
    * Determinism: the [[kmeans]] conventions — quantized BIGINT vectors,
    * exact integer squared L2 ([[graft.functions.SquaredL2]]), ties on
    * (d2 DESC, vec_id ASC), lowest-vec_id seed — so every selection and
    * every radius is exact and the output hash-checks cross-engine.
    *
    * Scale shape: k passes, each a broadcast of ≤ k centers against the
    * corpus scan, a groupBy(vec_id) min with map-side partials, and a
    * TakeOrderedAndProject top-1 — no corpus shuffle anywhere, driver
    * state is k rows.  At 100 TB one runs the same greedy over a
    * [[graft.llm.Sampling]] uniform sample (the standard
    * sample-then-select coreset recipe); the loop itself is unchanged. */
  def kcenterCoreset(spark: SparkSession, dir: String,
      k: Int = 8): DataFrame = {
    import spark.implicits._
    graft.functions.SquaredL2.register(spark)
    val q = Sources.embeddings(spark, dir)
      .select(col("vec_id"), expr(quantSpark).as("qv"))
      .persist()
    try {
      val seed = q.orderBy(col("vec_id").asc).limit(1)
        .select(col("vec_id")).collect()
      if (seed.isEmpty)
        return Seq.empty[(Int, Long, Long)].toDF("sel", "vec_id", "d2")
      val chosen = scala.collection.mutable.ListBuffer(
        (seed(0).getLong(0), 0L))
      var done = false
      for (_ <- 1 until k if !done) {
        val ids = chosen.map(_._1).toSeq
        val cents = q.filter(col("vec_id").isin(ids: _*))
          .select(col("qv").as("cv"))
        val next = q.filter(!col("vec_id").isin(ids: _*))
          .crossJoin(broadcast(cents))
          .withColumn("d2", expr(distSpark("qv", "cv")))
          .groupBy(col("vec_id")).agg(min(col("d2")).as("d2"))
          .orderBy(col("d2").desc, col("vec_id").asc)
          .limit(1).collect()
        if (next.isEmpty) done = true
        else chosen += ((next(0).getLong(0), next(0).getLong(1)))
      }
      chosen.zipWithIndex
        .map { case ((id, d2), i) => (i, id, d2) }
        .toSeq.toDF("sel", "vec_id", "d2")
    } finally q.unpersist()
  }

  /** DuckDB mirror of [[kcenterCoreset]]: the greedy loop unrolled as an
    * INCREMENTAL state chain — s_i carries each remaining point's best
    * distance to the centers so far (`LEAST(prev, dist-to-new-center)`,
    * the standard farthest-point recurrence), c_i takes its (d2 DESC,
    * vec_id ASC) top-1.  Every CTE is MATERIALIZED: each c_i is consumed
    * by the next state AND the final union, and the naive re-unioned
    * form re-inlines the whole prefix per step — exponential
    * re-evaluation that took minutes where this runs in milliseconds.
    * The recurrence computes the same exact-integer minima the Spark
    * side recomputes in full each pass. */
  def kcenterOracle(k: Int = 8): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id, $quantDuck AS qv FROM embeddings),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id, qv, CAST(0 AS BIGINT) AS d2
       |  FROM q ORDER BY vec_id ASC LIMIT 1),
       |s1 AS MATERIALIZED (
       |  SELECT v.vec_id, v.qv, ${distDuck("v.qv", "c.qv")} AS d2
       |  FROM q v, c0 c WHERE v.vec_id <> c.vec_id)""".stripMargin
    for (i <- 1 until k) {
      sb ++= s""",
         |c$i AS MATERIALIZED (
         |  SELECT vec_id, qv, d2 FROM s$i
         |  ORDER BY d2 DESC, vec_id ASC LIMIT 1)""".stripMargin
      if (i < k - 1)
        sb ++= s""",
           |s${i + 1} AS MATERIALIZED (
           |  SELECT s.vec_id, s.qv,
           |    LEAST(s.d2, ${distDuck("s.qv", "c.qv")}) AS d2
           |  FROM s$i s, c$i c WHERE s.vec_id <> c.vec_id)""".stripMargin
    }
    sb ++= (0 until k).map(i =>
      s"\nSELECT CAST($i AS INT) AS sel, vec_id, d2 FROM c$i")
      .mkString("", "\nUNION ALL", "")
    sb.toString
  }

  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val cents = Sources.embeddings(spark, dir)
      .select(col("label"), posexplode(expr(quantSpark)))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(CAST(sum(col) AS DOUBLE) / count(*)) AS BIGINT)")
          .as("m"))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"),
        expr("transform(sort_array(collect_list(struct(pos, m))), s -> s.m)")
          .as("cv"))
      .localCheckpoint()
    val a = cents.select(col("label").as("label_a"),
      col("n_vecs").as("n_a"), col("cv").as("ca"))
    val b = cents.select(col("label").as("label_b"),
      col("n_vecs").as("n_b"), col("cv").as("cb"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .withColumn("dot", expr(intDotSpark("ca", "cb")))
      .withColumn("na2", expr(intDotSpark("ca", "ca")))
      .withColumn("nb2", expr(intDotSpark("cb", "cb")))
      .withColumn("cosine", expr(
        "ROUND(CAST(dot AS DOUBLE) / NULLIF(" +
          "sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)), 0.0), 6)"))
      .select("label_a", "label_b", "n_a", "n_b", "dot", "cosine")
  }

  def labelCentroidsOracle(): String =
    s"""WITH q AS (
       |  SELECT label, $quantDuck AS qv FROM embeddings),
       |px AS (
       |  SELECT label, u.p AS pos, u.v AS v
       |  FROM (SELECT label,
       |          UNNEST(list_transform(generate_series(1, len(qv)),
       |            i -> {'p': i - 1, 'v': qv[i]})) AS u
       |        FROM q) t),
       |g AS (
       |  SELECT label, pos, COUNT(*) AS n,
       |    CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
       |  FROM px GROUP BY 1, 2),
       |c AS (
       |  SELECT label, CAST(MAX(n) AS BIGINT) AS n_vecs,
       |    list(m ORDER BY pos) AS cv
       |  FROM g GROUP BY 1)
       |SELECT a.label AS label_a, b.label AS label_b,
       |  a.n_vecs AS n_a, b.n_vecs AS n_b,
       |  CAST(${intDotDuck("a.cv", "b.cv")} AS BIGINT) AS dot,
       |  ROUND(CAST(${intDotDuck("a.cv", "b.cv")} AS DOUBLE) / NULLIF(
       |    sqrt(CAST(${intDotDuck("a.cv", "a.cv")} AS DOUBLE))
       |    * sqrt(CAST(${intDotDuck("b.cv", "b.cv")} AS DOUBLE)), 0.0), 6)
       |    AS cosine
       |FROM c a JOIN c b ON a.label < b.label""".stripMargin

  /** Per-label embedding QUALITY audit — the vector-side twin of the
    * corpus profiler: exact squared-norm extremes, zero-vector count
    * (broken upstream encoders emit all-zero rows; a single one poisons
    * cosine math downstream), and the RMS norm back in original units.
    * Reads go through the same `round(x·1000)` quantization as
    * [[assignments]], so every aggregate operand is an exact BIGINT and
    * the output hash-checks bit-for-bit.
    *
    * Scale: one scan, norm² fused into the projection (integer fold per
    * row), then a #labels-row aggregate with map-side partials — the
    * vectors themselves never shuffle. */
  def embeddingStats(spark: SparkSession, dir: String): DataFrame =
    Sources.embeddings(spark, dir)
      .select(col("label"), expr(quantSpark).as("qv"))
      .withColumn("norm2", expr(intDotSpark("qv", "qv")))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("norm2")).as("min_norm2"),
        max(col("norm2")).as("max_norm2"),
        sum(col("norm2")).as("sum_norm2"),
        sum(when(col("norm2") === 0, 1L).otherwise(0L)).as("n_zero"))
      .withColumn("rms_norm", expr(
        "ROUND(sqrt(CAST(sum_norm2 AS DOUBLE) / CAST(n_vecs AS DOUBLE))" +
          " / 1000.0, 6)"))

  def embeddingStatsOracle(): String =
    s"""WITH q AS (
       |  SELECT label, $quantDuck AS qv FROM embeddings),
       |n AS (
       |  SELECT label, ${intDotDuck("qv", "qv")} AS norm2 FROM q),
       |m AS (
       |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |    CAST(MIN(norm2) AS BIGINT) AS min_norm2,
       |    CAST(MAX(norm2) AS BIGINT) AS max_norm2,
       |    CAST(SUM(norm2) AS BIGINT) AS sum_norm2,
       |    CAST(SUM(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_zero
       |  FROM n GROUP BY 1)
       |SELECT label, n_vecs, min_norm2, max_norm2, sum_norm2, n_zero,
       |  ROUND(sqrt(CAST(sum_norm2 AS DOUBLE) / CAST(n_vecs AS DOUBLE))
       |    / 1000.0, 6) AS rms_norm
       |FROM m""".stripMargin
}
