package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Approximate-nearest-neighbor search over the embeddings table — beyond
  * the reference's surface; built per the LLM-pipeline brief.
  *
  * The cosine kernel is built-in higher-order functions (`zip_with` dot
  * product + `aggregate` fold) — no UDF and no Python boundary, but NOTE:
  * HOF lambdas are evaluated interpreted, outside whole-stage codegen
  * (the reason [[graft.functions.MinHashSignature]] exists).  The LSH
  * bucket computation DID dominate the embedding-dedup profile (tables ×
  * bits interpreted folds per row) and moved into the codegen'd
  * [[graft.functions.HyperplaneBuckets]] expression in round 4; the
  * pairwise dot product, evaluated only on bucket-pruned candidates, is
  * the next candidate if it ever dominates.  Two variants:
  *
  *   - [[bruteForceTopK]]: exact baseline.  Scoring is a broadcast nested
  *     loop of the (tiny) query set against all candidates — each candidate
  *     partition streams once, O(|Q|·N) work but zero shuffle of the
  *     candidate side; top-k is a per-query window.
  *   - [[lshTopK]]: the 100 TB path.  Random-hyperplane signatures bucket
  *     both sides; scoring only happens inside matching buckets, pruning the
  *     candidate set by ~2^bits.  With an IVF-style layout (bucket =
  *     partition key on disk) the scan itself prunes to matching partitions.
  *
  * Determinism: hyperplane weights derive from an integer multiplicative
  * mix of (plane, dim) — no RNG state, and exact 64-bit arithmetic both
  * Spark and DuckDB reproduce, so even the LSH variants are
  * oracle-checkable; ranking ties break on vec_id.
  */
object Similarity {

  /** L2 norm + raw vector, precomputed once per side.  The norm is the
    * self-dot through the codegen'd [[graft.functions.DotProduct]] kernel
    * (bit-identical to the declarative fold — see [[dotSpec]]). */
  private[graft] def withNorm(df: DataFrame): DataFrame = {
    graft.functions.DotProduct.register(df.sparkSession)
    df.withColumn("norm", expr("sqrt(vec_dot(embedding, embedding))"))
  }

  /** Pair-scoring dot product: the codegen'd kernel (registered by
    * [[withNorm]], which every call site goes through first). */
  private[graft] val dot = "vec_dot(embedding, q_embedding)"

  /** The declarative HOF spelling is the SPEC for the codegen'd kernel —
    * two lambda-interpreted vector walks per pair, outside whole-stage
    * codegen, which dominated pair scoring once candidates grew;
    * SimilaritySpec asserts `vec_dot` ≡ this fold bit-for-bit on real
    * data, so the two can never drift apart. */
  private[graft] def dotSpec(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"

  /** Exact cosine top-k of every candidate for each query vector. */
  def bruteForceTopK(spark: SparkSession, dir: String,
      numQueries: Int = 8, k: Int = 5): DataFrame =
    bruteForceTopKOf(Sources.embeddings(spark, dir), numQueries, k)

  /** [[bruteForceTopK]] over any (vec_id, embedding) frame — the scorer
    * [[matryoshkaRecall]] reuses on truncated vectors. */
  private def bruteForceTopKOf(embSrc: DataFrame,
      numQueries: Int, k: Int): DataFrame = {
    val emb = withNorm(embSrc)
    val queries = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("norm").as("q_norm"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(s"$dot / (norm * q_norm)"))
    rankTopK(scored, k)
  }

  /** Explicit left-to-right double fold for every oracle dot product — the
    * same evaluation order as the Spark kernel's `aggregate(zip_with(...))`.
    * Spelled out as `list_reduce` rather than `list_dot_product` so the
    * oracle does not depend on that function's summation order staying a
    * scalar left fold (a vectorized/pairwise rewrite in a future DuckDB
    * would silently flip unrounded threshold and rank comparisons). */
  private[llm] def dotOracle(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])),
       |    (acc, v) -> acc + v)""".stripMargin

  /** DuckDB oracle for [[bruteForceTopK]].  The cosine is spelled
    * `dot / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with the explicit
    * [[dotOracle]] fold — the same left-to-right summation and the same
    * norm factorization as the Spark kernel, so the doubles agree
    * bit-for-bit and the 6dp rounding + (cosine DESC, id ASC) ranking are
    * identical. */
  def bruteForceOracle(numQueries: Int = 8, k: Int = 5): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |n AS (
       |  SELECT vec_id, emb, sqrt(${dotOracle("emb", "emb")}) AS norm FROM e),
       |q AS (
       |  SELECT vec_id AS query_id, emb AS q_emb, norm AS q_norm
       |  FROM n WHERE vec_id < $numQueries),
       |scored AS (
       |  SELECT q.query_id, n.vec_id AS neighbor_id,
       |    ${dotOracle("n.emb", "q.q_emb")} / (n.norm * q.q_norm) AS cos
       |  FROM n, q WHERE n.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id ASC) AS rnk
       |  FROM scored)
       |SELECT query_id, CAST(rnk AS INT) AS "rank", neighbor_id,
       |  ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rnk <= $k""".stripMargin

  /** Number of random hyperplanes = signature bits. */
  val LshBits = 8

  /** Hyperplane weight for (plane key `k`): an exact-integer multiplicative
    * mix mod the prime 1e9+7, scaled to [-1, 1].  Replaces round-2's
    * murmur3 `hash()` (Spark-only) so the SAME doubles come out of DuckDB;
    * max intermediate ≈ 2.7e14, far below signed-64 overflow (ANSI-safe). */
  private[llm] def weightExpr(k: String): String =
    s"CAST((($k) * 2654435761) % 1000000007 AS DOUBLE) / 500000003.0 - 1.0"

  /** Deterministic random-hyperplane bucket id for an embedding column,
    * over planes [planeOffset, planeOffset + bits).  Different offsets give
    * independent hash tables (multi-table LSH trades compute for recall).
    *
    * This built-in SQL formulation is the REFERENCE semantics; production
    * paths use the bit-identical codegen'd
    * [[graft.functions.HyperplaneBuckets]] (SimilaritySpec asserts the
    * equivalence on real data, so the two can never drift apart). */
  private[graft] def bucketExpr(embCol: String, planeOffset: Int = 0,
      bits: Int = LshBits): String = {
    val bit = (b: Int) => {
      val p = planeOffset + b
      s"""CASE WHEN aggregate(zip_with($embCol, sequence(0, size($embCol) - 1),
         |  (x, i) -> CAST(x AS DOUBLE) * (${weightExpr(s"$p * 4099 + i + 1")})),
         |  0D, (acc, v) -> acc + v) > 0 THEN ${1 << b} ELSE 0 END""".stripMargin
    }
    (0 until bits).map(bit).mkString(" + ")
  }

  /** DuckDB mirror of [[bucketExpr]] over a DOUBLE[] column: same weights,
    * same left-to-right fold, 1-based list indexing mapped back to the
    * 0-based plane-dim key. */
  private def bucketOracleExpr(embCol: String, planeOffset: Int,
      bits: Int): String = {
    val bit = (b: Int) => {
      val p = planeOffset + b
      s"""CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(generate_series(1, len($embCol)),
         |    i -> $embCol[i] * (${weightExpr(s"$p * 4099 + (i - 1) + 1")}))),
         |  (acc, v) -> acc + v) > 0 THEN ${1 << b} ELSE 0 END""".stripMargin
    }
    (0 until bits).map(bit).mkString(" + ")
  }

  /** DuckDB oracle for [[lshTopK]] — same buckets (see
    * [[bucketOracleExpr]]), same cosine kernel as [[bruteForceOracle]]. */
  def lshOracle(numQueries: Int = 8, k: Int = 5): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |b AS (
       |  SELECT vec_id, emb, sqrt(${dotOracle("emb", "emb")}) AS norm,
       |    ${bucketOracleExpr("emb", 0, LshBits)} AS bucket
       |  FROM e),
       |q AS (
       |  SELECT vec_id AS query_id, bucket, emb AS q_emb, norm AS q_norm
       |  FROM b WHERE vec_id < $numQueries),
       |scored AS (
       |  SELECT q.query_id, b.vec_id AS neighbor_id,
       |    ${dotOracle("b.emb", "q.q_emb")} / (b.norm * q.q_norm) AS cos
       |  FROM b JOIN q USING (bucket)
       |  WHERE b.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id ASC) AS rnk
       |  FROM scored)
       |SELECT query_id, CAST(rnk AS INT) AS "rank", neighbor_id,
       |  ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rnk <= $k""".stripMargin

  /** Shared with [[Dedup.embeddingCosineOracle]]. */
  private[llm] def bucketOracle(embCol: String, planeOffset: Int,
      bits: Int): String = bucketOracleExpr(embCol, planeOffset, bits)

  /** DuckDB oracle for [[ivfTopK]]: same deterministic coarse quantizer
    * (centroids = the nlist lowest ids), same centroid ranking with the
    * (c_sim DESC, cid ASC) tie-break, same probe set, same cosine kernel. */
  def ivfOracle(numQueries: Int = 8, k: Int = 5, nlist: Int = 16,
      nprobe: Int = 4): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |n AS (
       |  SELECT vec_id, emb, sqrt(${dotOracle("emb", "emb")}) AS norm FROM e),
       |c AS (
       |  SELECT vec_id AS cid, emb AS c_emb, norm AS c_norm
       |  FROM n WHERE vec_id < $nlist),
       |csim AS (
       |  SELECT n.vec_id, n.emb, n.norm, c.cid,
       |    ${dotOracle("n.emb", "c.c_emb")} / (n.norm * c.c_norm) AS c_sim
       |  FROM n CROSS JOIN c),
       |ranked_c AS (
       |  SELECT vec_id, emb, norm, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |                       ORDER BY c_sim DESC, cid ASC) AS c_rank
       |  FROM csim),
       |assigned AS (
       |  SELECT vec_id, emb, norm, cid FROM ranked_c WHERE c_rank = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cid FROM ranked_c
       |  WHERE vec_id < $numQueries AND c_rank <= $nprobe),
       |q AS (
       |  SELECT vec_id AS query_id, emb AS q_emb, norm AS q_norm
       |  FROM n WHERE vec_id < $numQueries),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    ${dotOracle("a.emb", "q.q_emb")} / (a.norm * q.q_norm) AS cos
       |  FROM assigned a
       |  JOIN probes p USING (cid)
       |  JOIN q ON q.query_id = p.query_id
       |  WHERE a.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id ASC) AS rnk
       |  FROM scored)
       |SELECT query_id, CAST(rnk AS INT) AS "rank", neighbor_id,
       |  ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rnk <= $k""".stripMargin

  /** LSH-bucketed approximate top-k: candidates are scored only when they
    * share the query's hyperplane-sign bucket.  Buckets come from the
    * codegen'd [[graft.functions.HyperplaneBuckets]] kernel (bit-identical
    * to the [[bucketExpr]] SQL formulation — SimilaritySpec proves it). */
  def lshTopK(spark: SparkSession, dir: String,
      numQueries: Int = 8, k: Int = 5): DataFrame = {
    graft.functions.HyperplaneBuckets.register(spark)
    val emb = withNorm(Sources.embeddings(spark, dir))
      .withColumn("bucket", expr(s"hyperplane_buckets(embedding, 1, $LshBits)[0]"))
    val queries = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("bucket"),
        col("embedding").as("q_embedding"), col("norm").as("q_norm"))
    val scored = emb
      .join(broadcast(queries), Seq("bucket")) // equi-join on bucket: pruned scoring
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(s"$dot / (norm * q_norm)"))
    rankTopK(scored, k)
  }

  /** IVF-style ANN: a deterministic coarse quantizer (centroids = the
    * `nlist` lowest-id vectors) partitions the corpus into inverted lists;
    * each query scores only the lists of its `nprobe` nearest centroids.
    * At scale the inverted-list id doubles as the table's partition key, so
    * the scan itself prunes to the probed lists — the candidate set (and
    * I/O) shrinks by ~nlist/nprobe versus brute force.  A trained k-means
    * quantizer would drop in by replacing `centroids`; the plumbing
    * (assignment, probing, scoring) is identical. */
  def ivfTopK(spark: SparkSession, dir: String, numQueries: Int = 8,
      k: Int = 5, nlist: Int = 16, nprobe: Int = 4): DataFrame =
    rankTopK(ivfScored(spark, dir, numQueries, nlist, nprobe), k)

  /** The list-pruned scoring stage of [[ivfTopK]] split out so the scale
    * probe can measure the scanned (query, vector) candidate population —
    * Σ over probed lists of list size — separately from the top-K rank. */
  private[graft] def ivfScored(spark: SparkSession, dir: String,
      numQueries: Int, nlist: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = withNorm(Sources.embeddings(spark, dir))
    val centroids = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("embedding").as("q_embedding"),
        col("norm").as("q_norm"))

    // OPTIMIZATION r14 (guide §2.3/§2.4; the r12 kmeans argmin-as-
    // aggregate recipe): inverted-list assignment was a row_number
    // window over the full n×nlist cross product — an exchange+sort of
    // every (vector, centroid) row, embeddings included.  An argmax
    // folded as max(struct(c_sim, -cid, …)) map-combines to ONE row per
    // vector before the shuffle and needs no sort.  Struct ordering and
    // the window's (c_sim DESC, cid ASC) sort use the same comparator
    // (NaN greatest, tie → smallest cid), so the selected centroid is
    // identical row-for-row.  The nprobe probe set still uses a window,
    // but only over the numQueries query vectors (a few rows).
    val scoredC = emb.crossJoin(broadcast(centroids))
      .withColumn("c_sim", expr(s"$dot / (norm * q_norm)"))
    val assigned = scoredC
      .groupBy(col("vec_id"))
      .agg(max(struct(col("c_sim"), negate(col("cid")).as("ncid"),
        col("embedding"), col("norm"))).as("b"))
      .select(col("vec_id"), col("b.embedding").as("embedding"),
        col("b.norm").as("norm"), negate(col("b.ncid")).as("cid"))
    val probes = scoredC.filter(col("vec_id") < numQueries)
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("c_sim").desc, col("cid").asc)))
      .filter(col("c_rank") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cid"))

    val queries = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("norm").as("q_norm"))
    assigned
      .join(broadcast(probes), Seq("cid")) // list pruning
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cosine", expr(s"$dot / (norm * q_norm)"))
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  // ---------------------------------------------------------------- PQ ---

  /** Product quantization + asymmetric-distance (ADC) search — the third
    * ANN regime after LSH bucketing and IVF list pruning, and the one
    * that makes a 100 TB embedding store FIT: each 64-dim vector
    * compresses to `m` one-byte codes (here 4 codes = 4 bytes vs 256
    * bytes of floats, the FAISS IVFPQ recipe), and query scoring never
    * touches the original vectors — a per-query lookup table of
    * query-subvector × codeword distances is broadcast, and the scan
    * reads only the CODES.  Scale shape: codebook training is per-subspace
    * k-means (the [[graft.llm.Clustering]] integer-exact Lloyd's, m
    * independent runs over slices — same broadcast-assign / k×subdim-group
    * update, no corpus shuffle); encoding is one broadcast argmin pass;
    * ADC scoring is a chain of m BROADCAST joins on the code columns (the
    * corpus side never shuffles), then the same per-query top-K rank as
    * [[bruteForceTopK]].
    *
    * Determinism is the [[graft.llm.Clustering]] convention end-to-end:
    * quantized BIGINT subvectors, init codewords = the `codes` lowest
    * vec_ids' slices, rounded-integer-mean updates, (dist ASC, cid ASC)
    * ties — so codebooks, codes, and the ADC distances are ALL exact
    * integers and the entire output hash-checks cross-engine, approximate
    * though the distances are by construction. */
  def pqTopK(spark: SparkSession, dir: String, m: Int = 4,
      codes: Int = 8, iters: Int = 2, numQueries: Int = 8,
      k: Int = 5, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (codesTbl, luts) =
      pqCodesAndLuts(spark, dir, m, codes, iters, numQueries, dim)
    val scored = luts.zipWithIndex.foldLeft(codesTbl) {
      case (acc, (lut, 0)) => acc.join(broadcast(lut), Seq("c0"))
      case (acc, (lut, mi)) =>
        acc.join(broadcast(lut), Seq(s"c$mi", "query_id"))
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist2").asc, col("vec_id").asc)
    scored
      .withColumn("approx_dist2",
        (0 until m).map(mi => col(s"d$mi")).reduce(_ + _))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("approx_dist2"))
  }

  /** [[pqTopK]]'s training+encoding stages split out so IVF list pruning
    * can compose in front of the ADC scan ([[ivfpqTopK]]): returns the
    * stored codes table (vec_id, c0..c{m-1}) and the m per-query LUT
    * frames (query_id, c{mi}, d{mi}). */
  private def pqCodesAndLuts(spark: SparkSession, dir: String, m: Int,
      codes: Int, iters: Int, numQueries: Int, dim: Int)
      : (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.SquaredL2.register(spark)
    require(dim % m == 0, "subspaces must tile the dimension")
    val subDim = dim / m
    // r15 MEASURED REVERT (extending the r14 persist revert): spreading
    // the quantized frame across the cluster BEFORE persisting — so the
    // cache is multi-partition instead of the 1-partition frame r14's
    // probe rejected — STILL loses the same-boot A/B: q_ann_pq 3.09 →
    // 3.77 s, q_ann_ivfpq 2.69 → 4.32 s.  The ~5·m plan references are
    // independent single-task scan+quantize leaves that already run in
    // parallel across cores; the spread+cache path serializes an
    // exchange + columnar cache build onto the critical path before any
    // consumer starts.  Production stores the ENCODED table (the codes
    // are the persisted artifact), which no runtime cache emulates.
    val q = Sources.embeddings(spark, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
        .as("qv"))

    // Per subspace: Lloyd's over the slice → (final codebook, assignment).
    val perSub = (0 until m).map { mi =>
      val sv = q.select(col("vec_id"),
        expr(s"slice(qv, ${mi * subDim + 1}, $subDim)").as("sv"))
      var cb = sv.filter(col("vec_id") < codes)
        .select(col("vec_id").as("cid"), col("sv").as("cv"))
      var asg: DataFrame = null
      for (it <- 1 to iters) {
        // r14: argmin folded as min(struct(dist, cid)) — the
        // [[graft.llm.Clustering]] kmeans aggregate shape (map-side
        // partials over primitive structs; no per-iteration window sort
        // of the n×codes rows).  A/B-probed at sf0.1 against the window
        // form: aggregate+join-back 2.4 s vs window 3.4 s, and at scale
        // the window is the melting exchange.  The subvector re-attaches
        // by a vec_id equi-join against the cached slice frame only for
        // the centroid update (never after the last iteration).
        asg = sv.crossJoin(broadcast(cb))
          .select(col("vec_id"),
            struct(expr("vec_dist2(sv, cv)").as("dist"), col("cid")).as("dc"))
          .groupBy(col("vec_id"))
          .agg(min(col("dc")).as("dc"))
          .select(col("vec_id"), col("dc.cid").as("cid"))
        if (it < iters)
          cb = asg.join(sv, Seq("vec_id"))
            .select(col("cid"), posexplode(col("sv")))
            .groupBy(col("cid"), col("pos"))
            .agg(expr("CAST(round(CAST(sum(col) AS DOUBLE) / count(*)) AS BIGINT)")
              .as("mn"))
            .groupBy(col("cid"))
            .agg(expr("transform(sort_array(collect_list(struct(pos, mn))), s -> s.mn)")
              .as("cv"))
      }
      val codeCol = asg.select(col("vec_id"), lit(mi).as("mi"), col("cid"))
      // Per-query LUT: numQueries × codes rows of exact integer distances.
      val lut = sv.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("sv").as("qsv"))
        .crossJoin(broadcast(cb))
        .select(col("query_id"), col("cid").as(s"c$mi"),
          expr("vec_dist2(qsv, cv)").as(s"d$mi"))
      (codeCol, lut)
    }

    // The stored representation: one row of m code columns per vector,
    // assembled from the per-subspace assignments through ONE exchange
    // (union + pivot-by-aggregation with map-side partials) — an m-way
    // join of corpus-sized code tables would sort-merge m times for the
    // same rows.  Production encodes once and STORES this table; query
    // time starts at the codes.
    val codesTbl = perSub.map(_._1).reduce(_.unionByName(_))
      .groupBy(col("vec_id"))
      .agg(
        max(when(col("mi") === 0, col("cid"))).as("c0"),
        (1 until m).map(mi =>
          max(when(col("mi") === mi, col("cid"))).as(s"c$mi")): _*)
    // ...scored downstream by chained BROADCAST LUT joins (the corpus
    // never shuffles; the first join fans out by query, the rest key on
    // (code, query)).
    (codesTbl, perSub.map(_._2))
  }

  /** IVF + PQ combined — the FAISS IVFPQ shape and the production ANN
    * capstone: the coarse quantizer prunes the SCAN (each query reads
    * only its `nprobe` inverted lists, which at 100 TB are the partition
    * key, so pruning happens at the I/O layer), and ADC scoring over the
    * survivors never touches a float vector (m one-byte codes per vector
    * + a broadcast per-query LUT).  Store cut × scan cut compose: 64×
    * fewer bytes per vector (4 codes vs 256 float bytes) over nlist/
    * nprobe-fold fewer vectors read.  Non-residual variant: codebooks
    * train over the full vectors, not centroid residuals — simpler, and
    * exactness of the cross-engine gate is preserved because every ADC
    * distance stays an exact BIGINT (the coarse stage reuses [[ivfTopK]]'s
    * deterministic double cosine, gated since round 6).
    *
    * Plan shape: coarse assign/probe = one broadcast(nlist-row) rank;
    * codes+LUTs = [[pqCodesAndLuts]] (no corpus shuffle); the pruning
    * join keys the codes table on list id against a BROADCAST probe set;
    * ADC = m broadcast LUT joins; final per-query top-K is the rank
    * window over candidates only. */
  def ivfpqTopK(spark: SparkSession, dir: String, nlist: Int = 16,
      nprobe: Int = 4, m: Int = 4, codes: Int = 8, iters: Int = 2,
      numQueries: Int = 8, k: Int = 5, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = withNorm(Sources.embeddings(spark, dir))
    val centroids = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("embedding").as("q_embedding"),
        col("norm").as("q_norm"))
    // r14: list assignment as max(struct(c_sim, -cid)) — map-side argmax,
    // no full-corpus window sort (see [[ivfScored]] for the equivalence
    // argument); the probe window runs over the query vectors only.
    val scoredC = emb.crossJoin(broadcast(centroids))
      .withColumn("c_sim", expr(s"$dot / (norm * q_norm)"))
    val lists = scoredC
      .groupBy(col("vec_id"))
      .agg(max(struct(col("c_sim"), negate(col("cid")).as("ncid"))).as("b"))
      .select(col("vec_id"), negate(col("b.ncid")).as("cid"))
    val probes = scoredC.filter(col("vec_id") < numQueries)
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("c_sim").desc, col("cid").asc)))
      .filter(col("c_rank") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cid"))
    val (codesTbl, luts) =
      pqCodesAndLuts(spark, dir, m, codes, iters, numQueries, dim)
    val candidates = codesTbl
      .join(lists, Seq("vec_id"))
      .join(broadcast(probes), Seq("cid")) // list pruning before any LUT
    val scored = luts.zipWithIndex.foldLeft(candidates) {
      case (acc, (lut, mi)) =>
        acc.join(broadcast(lut), Seq(s"c$mi", "query_id"))
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist2").asc, col("vec_id").asc)
    scored
      .withColumn("approx_dist2",
        (0 until m).map(mi => col(s"d$mi")).reduce(_ + _))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("approx_dist2"))
  }

  /** DuckDB mirror of [[pqTopK]]: per-subspace unrolled Lloyd CTE chains
    * (the [[graft.llm.Clustering]] oracle pattern over list slices), then
    * the same code join + LUT sum + rank. */
  def pqOracle(m: Int = 4, codes: Int = 8, iters: Int = 2,
      numQueries: Int = 8, k: Int = 5, dim: Int = 64): String = {
    val subDim = dim / m
    def dist(a: String, b: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(generate_series(1, len($a)),
         |        i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
         |    (acc, v) -> acc + v)""".stripMargin
    val sb = new StringBuilder
    sb ++= s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(round(x * 1000) AS BIGINT)) AS qv
       |  FROM embeddings)""".stripMargin
    for (mi <- 0 until m) {
      val lo = mi * subDim + 1
      val hi = (mi + 1) * subDim
      sb ++= s""",
         |s${mi}v AS (SELECT vec_id, qv[$lo:$hi] AS sv FROM q),
         |s${mi}c0 AS (SELECT vec_id AS cid, sv AS cv FROM s${mi}v
         |             WHERE vec_id < $codes)""".stripMargin
      for (it <- 1 to iters) {
        sb ++= s""",
           |s${mi}d$it AS (
           |  SELECT v.vec_id, v.sv, c.cid, ${dist("v.sv", "c.cv")} AS dist
           |  FROM s${mi}v v CROSS JOIN s${mi}c${it - 1} c),
           |s${mi}a$it AS (
           |  SELECT vec_id, sv, cid FROM (
           |    SELECT vec_id, sv, cid,
           |      ROW_NUMBER() OVER (PARTITION BY vec_id
           |                         ORDER BY dist ASC, cid ASC) AS rn
           |    FROM s${mi}d$it) t
           |  WHERE rn = 1)""".stripMargin
        if (it < iters)
          sb ++= s""",
             |s${mi}c$it AS (
             |  SELECT cid, list(mn ORDER BY pos) AS cv
             |  FROM (SELECT cid, u.p AS pos,
             |          CAST(round(CAST(SUM(u.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mn
             |        FROM (SELECT cid,
             |                UNNEST(list_transform(generate_series(1, len(sv)),
             |                  i -> {'p': i - 1, 'v': sv[i]})) AS u
             |              FROM s${mi}a$it) px
             |        GROUP BY cid, u.p) s
             |  GROUP BY cid)""".stripMargin
      }
      sb ++= s""",
         |s${mi}lut AS (
         |  SELECT v.vec_id AS query_id, c.cid, ${dist("v.sv", "c.cv")} AS d
         |  FROM s${mi}v v CROSS JOIN s${mi}c${iters - 1} c
         |  WHERE v.vec_id < $numQueries)""".stripMargin
    }
    val tables = ((0 until m).map(mi => s"s${mi}a$iters a$mi") ++
      (0 until m).map(mi => s"s${mi}lut l$mi")).mkString(", ")
    val conds = ((1 until m).map(mi => s"a$mi.vec_id = a0.vec_id") ++
      (0 until m).map(mi => s"l$mi.cid = a$mi.cid") ++
      (1 until m).map(mi => s"l$mi.query_id = l0.query_id"))
      .mkString("\n    AND ")
    val dSum = (0 until m).map(mi => s"l$mi.d").mkString(" + ")
    sb ++= s""",
       |scored AS (
       |  SELECT l0.query_id, a0.vec_id, $dSum AS approx_dist2
       |  FROM $tables
       |  WHERE $conds
       |    AND a0.vec_id <> l0.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, approx_dist2,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY approx_dist2 ASC, vec_id ASC) AS rnk
       |  FROM scored)
       |SELECT query_id, CAST(rnk AS INT) AS "rank", vec_id AS neighbor_id,
       |  approx_dist2
       |FROM ranked WHERE rnk <= $k""".stripMargin
    sb.toString
  }

  /** DuckDB mirror of [[ivfpqTopK]]: [[ivfOracle]]'s coarse
    * assign/probe CTEs prepended to [[pqOracle]]'s per-subspace Lloyd
    * chains, with the scored join additionally constrained to the
    * probed inverted lists. */
  def ivfpqOracle(nlist: Int = 16, nprobe: Int = 4, m: Int = 4,
      codes: Int = 8, iters: Int = 2, numQueries: Int = 8, k: Int = 5,
      dim: Int = 64): String = {
    val subDim = dim / m
    def dist(a: String, b: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(generate_series(1, len($a)),
         |        i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
         |    (acc, v) -> acc + v)""".stripMargin
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |n AS (
       |  SELECT vec_id, emb, sqrt(${dotOracle("emb", "emb")}) AS norm FROM e),
       |cc AS (
       |  SELECT vec_id AS cid, emb AS c_emb, norm AS c_norm
       |  FROM n WHERE vec_id < $nlist),
       |csim AS (
       |  SELECT n.vec_id, n.norm, cc.cid,
       |    ${dotOracle("n.emb", "cc.c_emb")} / (n.norm * cc.c_norm) AS c_sim
       |  FROM n CROSS JOIN cc),
       |ranked_c AS (
       |  SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |                       ORDER BY c_sim DESC, cid ASC) AS c_rank
       |  FROM csim),
       |lists AS (SELECT vec_id, cid FROM ranked_c WHERE c_rank = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cid FROM ranked_c
       |  WHERE vec_id < $numQueries AND c_rank <= $nprobe),
       |q AS (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(round(x * 1000) AS BIGINT)) AS qv
       |  FROM embeddings)""".stripMargin
    for (mi <- 0 until m) {
      val lo = mi * subDim + 1
      val hi = (mi + 1) * subDim
      sb ++= s""",
         |s${mi}v AS (SELECT vec_id, qv[$lo:$hi] AS sv FROM q),
         |s${mi}c0 AS (SELECT vec_id AS cid, sv AS cv FROM s${mi}v
         |             WHERE vec_id < $codes)""".stripMargin
      for (it <- 1 to iters) {
        sb ++= s""",
           |s${mi}d$it AS (
           |  SELECT v.vec_id, v.sv, c.cid, ${dist("v.sv", "c.cv")} AS dist
           |  FROM s${mi}v v CROSS JOIN s${mi}c${it - 1} c),
           |s${mi}a$it AS (
           |  SELECT vec_id, sv, cid FROM (
           |    SELECT vec_id, sv, cid,
           |      ROW_NUMBER() OVER (PARTITION BY vec_id
           |                         ORDER BY dist ASC, cid ASC) AS rn
           |    FROM s${mi}d$it) t
           |  WHERE rn = 1)""".stripMargin
        if (it < iters)
          sb ++= s""",
             |s${mi}c$it AS (
             |  SELECT cid, list(mn ORDER BY pos) AS cv
             |  FROM (SELECT cid, u.p AS pos,
             |          CAST(round(CAST(SUM(u.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mn
             |        FROM (SELECT cid,
             |                UNNEST(list_transform(generate_series(1, len(sv)),
             |                  i -> {'p': i - 1, 'v': sv[i]})) AS u
             |              FROM s${mi}a$it) px
             |        GROUP BY cid, u.p) s
             |  GROUP BY cid)""".stripMargin
      }
      sb ++= s""",
         |s${mi}lut AS (
         |  SELECT v.vec_id AS query_id, c.cid, ${dist("v.sv", "c.cv")} AS d
         |  FROM s${mi}v v CROSS JOIN s${mi}c${iters - 1} c
         |  WHERE v.vec_id < $numQueries)""".stripMargin
    }
    val tables = ((0 until m).map(mi => s"s${mi}a$iters a$mi") ++
      (0 until m).map(mi => s"s${mi}lut l$mi")).mkString(", ") +
      ", lists al, probes p"
    val conds = ((1 until m).map(mi => s"a$mi.vec_id = a0.vec_id") ++
      (0 until m).map(mi => s"l$mi.cid = a$mi.cid") ++
      (1 until m).map(mi => s"l$mi.query_id = l0.query_id") ++
      Seq("al.vec_id = a0.vec_id", "p.cid = al.cid",
        "p.query_id = l0.query_id"))
      .mkString("\n    AND ")
    val dSum = (0 until m).map(mi => s"l$mi.d").mkString(" + ")
    sb ++= s""",
       |scored AS (
       |  SELECT l0.query_id, a0.vec_id, $dSum AS approx_dist2
       |  FROM $tables
       |  WHERE $conds
       |    AND a0.vec_id <> l0.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, approx_dist2,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY approx_dist2 ASC, vec_id ASC) AS rnk
       |  FROM scored)
       |SELECT query_id, CAST(rnk AS INT) AS "rank", vec_id AS neighbor_id,
       |  approx_dist2
       |FROM ranked WHERE rnk <= $k""".stripMargin
    sb.toString
  }

  // ---------------------------------------------------------------- SQ8 --

  /** Exact BIGINT dot product over two int-code arrays — a left fold,
    * every term and partial sum an exact integer (max |code| = 127, dim
    * 64 → |dot| ≤ 64·127² ≈ 1.03e6, nowhere near overflow). */
  private def qdotSpec(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"

  /** Scalar quantization (SQ8) + integer-domain search — the fourth ANN
    * regime after LSH buckets, IVF lists, and PQ codes, and the simplest
    * compression that matters at 100 TB: each float dimension maps to an
    * int8 code via a per-dimension max-abs scale (code = round(x/s·127)),
    * cutting the store 4× while keeping per-dimension resolution (PQ
    * compresses harder but quantizes whole subspaces).  Search never
    * touches the floats: scoring is the exact BIGINT code dot product,
    * ranked by quantized cosine — so unlike float-reconstruction SQ, the
    * entire pipeline is integer arithmetic both engines reproduce
    * bit-for-bit and the output hash-checks cross-engine, approximate
    * though the RANKING is by construction (the quantization error is
    * the approximation; the arithmetic is exact).
    *
    * Scale shape: the per-dimension scales are ONE partial-aggregated
    * exchange collapsing to dim rows (posexplode partials combine
    * map-side), broadcast back; encoding is a zip_with projection fused
    * into the scan; scoring is the [[bruteForceTopK]] broadcast pattern —
    * the corpus side never shuffles, and in production the codes table
    * is written once and scanned INSTEAD of the float table (¼ the
    * bytes), composing with the IVF partition layout.  Zero-variance
    * dimensions (s = 0) code to 0 via the NULLIF/COALESCE guard. */
  def sq8TopK(spark: SparkSession, dir: String,
      numQueries: Int = 8, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Sources.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val scales = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(max(abs(col("x").cast("double"))).as("s"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, s))), t -> t.s)")
        .as("scales"))
    val coded = emb.crossJoin(broadcast(scales))
      .select(col("vec_id"), expr(
        "zip_with(embedding, scales, (x, s) -> coalesce(" +
          "CAST(round(CAST(x AS DOUBLE) / nullif(s, 0D) * 127) AS BIGINT), " +
          "CAST(0 AS BIGINT)))").as("code"))
      .withColumn("qnorm2", expr(qdotSpec("code", "code")))
    val queries = coded.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"),
        col("code").as("q_code"), col("qnorm2").as("q_norm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcosine").desc, col("vec_id").asc)
    coded.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("qdot", expr(qdotSpec("code", "q_code")))
      .withColumn("qcosine",
        expr("CAST(qdot AS DOUBLE) / sqrt(CAST(qnorm2 * q_norm2 AS DOUBLE))"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("qdot"), round(col("qcosine"), 6).as("qcosine"))
  }

  /** DuckDB mirror of [[sq8TopK]]: same per-dim max-abs scales, same
    * rounding, the same exact-integer code dot (a BIGINT left fold), the
    * same one double division per pair. */
  def sq8Oracle(numQueries: Int = 8, k: Int = 5): String = {
    def qdot(a: String, b: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])),
         |    (acc, v) -> acc + v)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |d AS (
       |  SELECT u.i AS pos, MAX(ABS(u.x)) AS s
       |  FROM (SELECT UNNEST(list_transform(generate_series(1, len(emb)),
       |          i -> {'i': i, 'x': emb[i]})) AS u FROM e) t
       |  GROUP BY 1),
       |sc AS (SELECT list(s ORDER BY pos) AS scales FROM d),
       |c AS (
       |  SELECT vec_id,
       |    list_transform(generate_series(1, len(emb)), i ->
       |      COALESCE(CAST(round(emb[i] / NULLIF(scales[i], 0) * 127)
       |        AS BIGINT), 0)) AS code
       |  FROM e, sc),
       |n AS (SELECT vec_id, code, ${qdot("code", "code")} AS qnorm2 FROM c),
       |q AS (
       |  SELECT vec_id AS query_id, code AS q_code, qnorm2 AS q_norm2
       |  FROM n WHERE vec_id < $numQueries),
       |scored AS (
       |  SELECT q.query_id, n.vec_id AS neighbor_id,
       |    ${qdot("n.code", "q.q_code")} AS qdot, n.qnorm2, q.q_norm2
       |  FROM n, q WHERE n.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, qdot,
       |    CAST(qdot AS DOUBLE) / sqrt(CAST(qnorm2 * q_norm2 AS DOUBLE))
       |      AS qcos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY CAST(qdot AS DOUBLE)
       |                         / sqrt(CAST(qnorm2 * q_norm2 AS DOUBLE)) DESC,
       |                         neighbor_id ASC) AS rnk
       |  FROM scored)
       |SELECT query_id, CAST(rnk AS INT) AS "rank", neighbor_id, qdot,
       |  ROUND(qcos, 6) AS qcosine
       |FROM ranked WHERE rnk <= $k""".stripMargin
  }

  /** Recall@k of the SQ8 integer-domain ranking against the exact float
    * brute force — what the 4× compression actually costs on THIS
    * corpus, the [[annRecall]] companion for the quantization axis. */
  def sq8Recall(spark: SparkSession, dir: String,
      numQueries: Int = 8, k: Int = 5): DataFrame = {
    val bf = bruteForceTopK(spark, dir, numQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val sq = sq8TopK(spark, dir, numQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("in_sq"))
    bf.join(sq, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k_truth"), count(col("in_sq")).as("n_hit"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("k_truth")).as("n_truth"),
        sum(col("n_hit")).as("n_hits"),
        min(col("n_hit")).as("worst_query_hits"))
      .withColumn("recall_at_k",
        expr("ROUND(n_hits / CAST(NULLIF(n_truth, 0) AS DOUBLE), 6)"))
  }

  def sq8RecallOracle(numQueries: Int = 8, k: Int = 5): String =
    s"""WITH bf AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${bruteForceOracle(numQueries, k)}) b),
       |sq AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${sq8Oracle(numQueries, k)}) s),
       |j AS (
       |  SELECT bf.query_id,
       |    CASE WHEN sq.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM bf LEFT JOIN sq
       |    ON bf.query_id = sq.query_id
       |   AND bf.neighbor_id = sq.neighbor_id),
       |p AS (
       |  SELECT query_id, COUNT(*) AS kt, SUM(hit) AS nh
       |  FROM j GROUP BY 1)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       |  CAST(SUM(kt) AS BIGINT) AS n_truth,
       |  CAST(SUM(nh) AS BIGINT) AS n_hits,
       |  CAST(MIN(nh) AS BIGINT) AS worst_query_hits,
       |  ROUND(SUM(nh) / CAST(NULLIF(SUM(kt), 0) AS DOUBLE), 6)
       |    AS recall_at_k
       |FROM p""".stripMargin

  /** Matryoshka truncation recall — the THIRD compression axis after
    * code quantization ([[sq8Recall]]) and subspace quantization (PQ):
    * keep only the first `dims` of 64 dimensions (the MRL premise —
    * Kusupati et al. 2022 — that prefix dimensions carry the coarse
    * structure) and measure recall@k of the truncated cosine ranking
    * against the full-dimension exact one.  A 4× scan-width cut with
    * ZERO index structure: the truncated table is just a narrower
    * column, and the scorer is [[bruteForceTopK]] verbatim on sliced
    * vectors (swap into the IVF layout unchanged).  Float arithmetic is
    * the already-proven [[dotOracle]] left-fold contract, so this
    * hash-checks like the rest of the family. */
  def matryoshkaRecall(spark: SparkSession, dir: String, dims: Int = 16,
      numQueries: Int = 8, k: Int = 5): DataFrame = {
    val bf = bruteForceTopK(spark, dir, numQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val tr = bruteForceTopKOf(
      Sources.embeddings(spark, dir).select(col("vec_id"),
        expr(s"slice(embedding, 1, $dims)").as("embedding")),
      numQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("in_tr"))
    bf.join(tr, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k_truth"), count(col("in_tr")).as("n_hit"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("k_truth")).as("n_truth"),
        sum(col("n_hit")).as("n_hits"),
        min(col("n_hit")).as("worst_query_hits"))
      .withColumn("recall_at_k",
        expr("ROUND(n_hits / CAST(NULLIF(n_truth, 0) AS DOUBLE), 6)"))
  }

  /** DuckDB mirror: [[bruteForceOracle]] with the embedding list sliced
    * to the prefix, joined against the full-dimension truth. */
  def matryoshkaOracle(dims: Int = 16, numQueries: Int = 8,
      k: Int = 5): String = {
    val truncated =
      s"""WITH e AS (
         |  SELECT vec_id, (CAST(embedding AS DOUBLE[]))[1:$dims] AS emb
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, emb, sqrt(${dotOracle("emb", "emb")}) AS norm FROM e),
         |q AS (
         |  SELECT vec_id AS query_id, emb AS q_emb, norm AS q_norm
         |  FROM n WHERE vec_id < $numQueries),
         |scored AS (
         |  SELECT q.query_id, n.vec_id AS neighbor_id,
         |    ${dotOracle("n.emb", "q.q_emb")} / (n.norm * q.q_norm) AS cos
         |  FROM n, q WHERE n.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, neighbor_id ASC) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id FROM ranked WHERE rnk <= $k""".stripMargin
    s"""WITH bf AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${bruteForceOracle(numQueries, k)}) b),
       |tr AS ($truncated),
       |j AS (
       |  SELECT bf.query_id,
       |    CASE WHEN tr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM bf LEFT JOIN tr
       |    ON bf.query_id = tr.query_id
       |   AND bf.neighbor_id = tr.neighbor_id),
       |p AS (
       |  SELECT query_id, COUNT(*) AS kt, SUM(hit) AS nh
       |  FROM j GROUP BY 1)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       |  CAST(SUM(kt) AS BIGINT) AS n_truth,
       |  CAST(SUM(nh) AS BIGINT) AS n_hits,
       |  CAST(MIN(nh) AS BIGINT) AS worst_query_hits,
       |  ROUND(SUM(nh) / CAST(NULLIF(SUM(kt), 0) AS DOUBLE), 6)
       |    AS recall_at_k
       |FROM p""".stripMargin
  }

  /** Hard-negative mining for contrastive training — per query vector,
    * the top-k most-similar candidates whose LABEL differs from the
    * query's: the examples a retrieval/embedding model learns the most
    * from (easy negatives are already far away; random negatives are
    * mostly easy).  The scorer is [[bruteForceTopK]]'s broadcast
    * pattern with the label carried through and the same-label
    * candidates filtered BEFORE ranking, so rank i is the i-th hardest
    * negative.  Cosine is the proven [[dotOracle]] float contract; at
    * scale the scorer swaps for the IVF/SQ8 pipelines unchanged (mining
    * only needs SOME high-similarity candidate pool). */
  def hardNegatives(spark: SparkSession, dir: String,
      numQueries: Int = 8, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = withNorm(Sources.embeddings(spark, dir))
    val queries = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("q_embedding"), col("norm").as("q_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .filter(!(col("label") <=> col("q_label")))
      .withColumn("cosine", expr(s"$dot / (norm * q_norm)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("q_label"), col("rank"),
        col("vec_id").as("negative_id"), col("label").as("neg_label"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** DuckDB mirror of [[hardNegatives]] — [[bruteForceOracle]] with the
    * label columns carried and the NULL-safe label-difference filter
    * (`IS DISTINCT FROM`, matching Spark's `<=>` negation). */
  def hardNegativesOracle(numQueries: Int = 8, k: Int = 5): String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, label, emb,
       |    sqrt(${dotOracle("emb", "emb")}) AS norm FROM e),
       |q AS (
       |  SELECT vec_id AS query_id, label AS q_label, emb AS q_emb,
       |    norm AS q_norm
       |  FROM n WHERE vec_id < $numQueries),
       |scored AS (
       |  SELECT q.query_id, q.q_label, n.vec_id AS negative_id,
       |    n.label AS neg_label,
       |    ${dotOracle("n.emb", "q.q_emb")} / (n.norm * q.q_norm) AS cos
       |  FROM n, q
       |  WHERE n.vec_id <> q.query_id
       |    AND n.label IS DISTINCT FROM q.q_label),
       |ranked AS (
       |  SELECT query_id, q_label, negative_id, neg_label, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, negative_id ASC) AS rnk
       |  FROM scored)
       |SELECT query_id, q_label, CAST(rnk AS INT) AS "rank", negative_id,
       |  neg_label, ROUND(cos, 6) AS cosine
       |FROM ranked WHERE rnk <= $k""".stripMargin

  // ---------------------------------------------------------------- MMR --

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    * — the retrieval-side diversity operator [[graft.llm.Clustering
    * .kcenterCoreset]] is for corpora: from each query's relevance
    * top-`poolN`, greedily select `k` results maximizing
    * relevance − redundancy, where redundancy is the max similarity to
    * the already-selected set.  The retrieval stack returns near-
    * duplicates of one good hit without this; with it, slot i buys the
    * most NEW information.  λ is fixed at ½ and the ½ factored out, so
    * the objective is the exact BIGINT `qdot − max-pairwise-dot` — the
    * [[graft.llm.Clustering]] integer discipline again (quantized
    * vectors, integer dots, ties on vec_id ASC), making every selection
    * and both score components hash-check cross-engine.
    *
    * Scale shape: relevance scoring is the [[bruteForceTopK]] broadcast
    * pattern (swap in the IVF/SQ8 scorer at scale — MMR only needs SOME
    * relevance pool); everything after operates on poolN·|Q| rows —
    * pool pairs and the k greedy picks are bounded by poolN² per query
    * regardless of corpus size, with lineage checkpointed per pick. */
  def mmrTopK(spark: SparkSession, dir: String, numQueries: Int = 8,
      poolN: Int = 12, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = Sources.embeddings(spark, dir)
      .select(col("vec_id"), expr(Clustering.quantSpark).as("qv"))
    val queries = q.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"))
    val pool = q.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("qdot", expr(qdotSpec("qv", "q_qv")))
      .withColumn("rn", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("qdot").desc, col("vec_id").asc)))
      .filter(col("rn") <= poolN)
      .select(col("query_id"), col("vec_id"), col("qv"), col("qdot"),
        col("rn"))
      .localCheckpoint()
    val pairs = pool.select(col("query_id"), col("vec_id").as("a_id"),
        col("qv").as("a_qv"))
      .join(pool.select(col("query_id"), col("vec_id").as("b_id"),
        col("qv").as("b_qv")), Seq("query_id"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("query_id"), col("a_id"), col("b_id"),
        expr(qdotSpec("a_qv", "b_qv")).as("pdot"))
      .localCheckpoint()
    var result = pool.filter(col("rn") === 1)
      .select(col("query_id"), col("vec_id"), lit(1).as("sel"),
        col("qdot"), lit(0L).as("penalty"))
    for (i <- 2 to k) {
      val pen = pairs
        .join(result.select(col("query_id"), col("vec_id").as("a_id")),
          Seq("query_id", "a_id"))
        .groupBy(col("query_id"), col("b_id"))
        .agg(max(col("pdot")).as("penalty"))
      val pick = pool
        .join(result.select(col("query_id"), col("vec_id")),
          Seq("query_id", "vec_id"), "left_anti")
        .join(pen, pool("query_id") === pen("query_id") &&
          col("vec_id") === col("b_id"))
        .select(pool("query_id"), col("vec_id"), col("qdot"),
          col("penalty"))
        .withColumn("rn2", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy((col("qdot") - col("penalty")).desc,
              col("vec_id").asc)))
        .filter(col("rn2") === 1)
        .select(col("query_id"), col("vec_id"), lit(i).as("sel"),
          col("qdot"), col("penalty"))
      // Eager per-round checkpoint: the frame is referenced twice in the
      // next round (penalty join + anti join); a lazy variant was
      // measured slower (r14) — the first touching job computes the
      // partitions for both references before the blocks land.
      result = result.unionByName(pick).localCheckpoint()
    }
    result.select(col("query_id"), col("sel"),
      col("vec_id").as("neighbor_id"), col("qdot"), col("penalty"),
      (col("qdot") - col("penalty")).as("mmr"))
  }

  /** DuckDB mirror of [[mmrTopK]]: the greedy loop unrolled as an
    * accumulated-selection CTE chain, every step MATERIALIZED (the
    * [[graft.llm.Clustering.kcenterOracle]] lesson — inlined CTE
    * prefixes re-evaluate exponentially). */
  def mmrOracle(numQueries: Int = 8, poolN: Int = 12, k: Int = 5): String = {
    def qdot(a: String, b: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])),
         |    (acc, v) -> acc + v)""".stripMargin
    val sb = new StringBuilder
    sb ++= s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id, ${Clustering.quantDuck} AS qv FROM embeddings),
       |qq AS MATERIALIZED (
       |  SELECT vec_id AS query_id, qv AS q_qv FROM q
       |  WHERE vec_id < $numQueries),
       |pool AS MATERIALIZED (
       |  SELECT query_id, vec_id, qv, qdot, rn FROM (
       |    SELECT qq.query_id, v.vec_id, v.qv,
       |      ${qdot("v.qv", "qq.q_qv")} AS qdot,
       |      ROW_NUMBER() OVER (PARTITION BY qq.query_id
       |        ORDER BY ${qdot("v.qv", "qq.q_qv")} DESC, v.vec_id ASC) AS rn
       |    FROM q v, qq WHERE v.vec_id <> qq.query_id) t
       |  WHERE rn <= $poolN),
       |pairs AS MATERIALIZED (
       |  SELECT a.query_id, a.vec_id AS a_id, b.vec_id AS b_id,
       |    ${qdot("a.qv", "b.qv")} AS pdot
       |  FROM pool a JOIN pool b
       |    ON a.query_id = b.query_id AND a.vec_id <> b.vec_id),
       |acc1 AS MATERIALIZED (
       |  SELECT query_id, vec_id, 1 AS sel, qdot, CAST(0 AS BIGINT) AS penalty
       |  FROM pool WHERE rn = 1)""".stripMargin
    for (i <- 2 to k) {
      sb ++= s""",
         |pen$i AS MATERIALIZED (
         |  SELECT p.query_id, p.b_id, MAX(p.pdot) AS penalty
         |  FROM pairs p JOIN acc${i - 1} s
         |    ON p.query_id = s.query_id AND p.a_id = s.vec_id
         |  GROUP BY 1, 2),
         |pick$i AS MATERIALIZED (
         |  SELECT query_id, vec_id, $i AS sel, qdot, penalty FROM (
         |    SELECT c.query_id, c.vec_id, c.qdot, pe.penalty,
         |      ROW_NUMBER() OVER (PARTITION BY c.query_id
         |        ORDER BY c.qdot - pe.penalty DESC, c.vec_id ASC) AS rn2
         |    FROM pool c
         |    JOIN pen$i pe
         |      ON c.query_id = pe.query_id AND c.vec_id = pe.b_id
         |    WHERE NOT EXISTS (SELECT 1 FROM acc${i - 1} s
         |      WHERE s.query_id = c.query_id AND s.vec_id = c.vec_id)) t
         |  WHERE rn2 = 1),
         |acc$i AS MATERIALIZED (
         |  SELECT * FROM acc${i - 1} UNION ALL SELECT * FROM pick$i)""".stripMargin
    }
    sb ++= s"""
       |SELECT query_id, CAST(sel AS INT) AS sel, vec_id AS neighbor_id,
       |  qdot, penalty, qdot - penalty AS mmr
       |FROM acc$k""".stripMargin
    sb.toString
  }

  /** ANN quality evaluation — recall@k of the IVF index against the
    * brute-force ground truth, the [[graft.llm.Dedup.lshEval]] companion
    * for the similarity side: nprobe < nlist trades recall for scan
    * fraction, and this measures what the trade actually bought on THIS
    * corpus (the number an index deployment must publish).  One row:
    * total hits/truth, the exact-rational mean recall, and the worst
    * query's hit count (a mean can hide a zero-recall query).
    *
    * Scale: both sides are the already-registered pipelines; the join is
    * on (query, neighbor) id pairs — numQueries·k rows. */
  def annRecall(spark: SparkSession, dir: String,
      numQueries: Int = 8, k: Int = 5): DataFrame = {
    val bf = bruteForceTopK(spark, dir, numQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = ivfTopK(spark, dir, numQueries, k)
      .select(col("query_id"), col("neighbor_id"), lit(true).as("in_ivf"))
    bf.join(ivf, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k_truth"), count(col("in_ivf")).as("n_hit"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("k_truth")).as("n_truth"),
        sum(col("n_hit")).as("n_hits"),
        min(col("n_hit")).as("worst_query_hits"))
      .withColumn("recall_at_k",
        expr("ROUND(n_hits / CAST(NULLIF(n_truth, 0) AS DOUBLE), 6)"))
  }

  def annRecallOracle(numQueries: Int = 8, k: Int = 5): String =
    s"""WITH bf AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${bruteForceOracle(numQueries, k)}) b),
       |iv AS (
       |  SELECT query_id, neighbor_id
       |  FROM (${ivfOracle(numQueries, k)}) i),
       |j AS (
       |  SELECT bf.query_id,
       |    CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM bf LEFT JOIN iv
       |    ON bf.query_id = iv.query_id
       |   AND bf.neighbor_id = iv.neighbor_id),
       |p AS (
       |  SELECT query_id, COUNT(*) AS kt, SUM(hit) AS nh
       |  FROM j GROUP BY 1)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       |  CAST(SUM(kt) AS BIGINT) AS n_truth,
       |  CAST(SUM(nh) AS BIGINT) AS n_hits,
       |  CAST(MIN(nh) AS BIGINT) AS worst_query_hits,
       |  ROUND(SUM(nh) / CAST(NULLIF(SUM(kt), 0) AS DOUBLE), 6)
       |    AS recall_at_k
       |FROM p""".stripMargin
}
