package graft

import org.apache.spark.sql.functions._

import graft.llm.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val dir = Sf001
  private def docs = graft.core.Sources.embeddings(spark, dir)

  test("k-means assignment partitions the corpus exactly once") {
    val asg = Clustering.assignments(spark, dir).cache()
    try {
      assert(asg.count() == docs.count())
      assert(asg.select("vec_id").distinct().count() == asg.count())
      assert(asg.select("cid").distinct().count() <= Clustering.DefaultK)
      // Every surviving centroid id came from the init set (lowest ids).
      val badCid = asg.filter(col("cid") >= Clustering.DefaultK).count()
      assert(badCid == 0)
    } finally asg.unpersist()
  }

  test("assignment is deterministic under re-evaluation and repartitioning") {
    val a = Clustering.assignments(spark, dir).select("vec_id", "cid", "dist")
    val b = Clustering.assignments(spark, dir).repartition(13)
      .withColumnsRenamed(Map("cid" -> "cid2", "dist" -> "dist2"))
      .select("vec_id", "cid2", "dist2")
    val disagree = a.join(b, "vec_id")
      .filter(col("cid") =!= col("cid2") || col("dist") =!= col("dist2"))
      .count()
    assert(disagree == 0)
  }

  test("more Lloyd iterations never raise the exact integer inertia") {
    // With rounded-integer centroid means the classic monotone-descent
    // proof bends by at most the rounding, but on real data each extra
    // iteration should still (weakly) improve the fit.
    val i1 = Clustering.kmeans(spark, dir, iters = 1)
      .agg(sum("inertia")).collect().head.getLong(0)
    val i3 = Clustering.kmeans(spark, dir, iters = 3)
      .agg(sum("inertia")).collect().head.getLong(0)
    assert(i3 <= i1, s"inertia rose across iterations: $i1 -> $i3")
  }

  test("adaptive k: integer rule matches its SQL mirror's fixtures and clamps") {
    // The DuckDB spelling is GREATEST(16, LEAST(65536, (n+127)//128));
    // these fixtures pin the Scala rule to the same arithmetic at the
    // boundaries where a float-log formulation could drift.
    import Clustering.adaptiveKmeansK
    assert(adaptiveKmeansK(0) == 16)
    assert(adaptiveKmeansK(1) == 16)
    assert(adaptiveKmeansK(2048) == 16)
    assert(adaptiveKmeansK(2049) == 17) // first count past the clamp
    assert(adaptiveKmeansK(2560) == 20)
    assert(adaptiveKmeansK(2561) == 21) // ceil, not floor
    assert(adaptiveKmeansK(200000) == 1563) // the sf10 corpus
    assert(adaptiveKmeansK(Long.MaxValue / 2) == 65536) // upper clamp
  }

  test("adaptive semantic dedup ≡ fixed-k at gate scale, and undersized k refuses") {
    // At 500 vectors the ceil-div clamps to DefaultK, so the adaptive
    // entry must be row-identical to the fixed one (the same property
    // the driver gate hash-checks at sf0.01).
    val fixed = Clustering.semanticDedup(spark, dir)
      .orderBy("cid", "vec_a", "vec_b").collect().toSeq
    val adaptive = Clustering.semanticDedupAdaptive(spark, dir)
      .orderBy("cid", "vec_a", "vec_b").collect().toSeq
    assert(fixed == adaptive)
    // k=1 means one corpus-sized cluster — all-pairs in disguise; the
    // sizing guard must refuse at plan-build time, not spill at runtime.
    val e = intercept[IllegalArgumentException] {
      Clustering.semanticDedup(spark, dir, k = 1)
    }
    assert(e.getMessage.contains("semanticDedupAdaptive"))
  }

  test("semantic dedup equals brute-force cosine restricted to clusters") {
    val minCos = 0.3
    val pairs = Clustering.semanticDedup(spark, dir, minCosine = minCos)
      .select("vec_a", "vec_b", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // Naive recomputation: same-cluster membership via assignments, exact
    // cosine via a double fold over the raw vectors.
    val asg = Clustering.assignments(spark, dir)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = docs.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids
      if a < b && asg(a) == asg(b)
      c = cos(vecs(a), vecs(b)) if c >= minCos
    } yield (a, b, math.rint(c * 1e6) / 1e6)).toSet
    // Compare pair identity exactly; cosines to 1e-6 (the fold order in
    // the naive loop differs from the registered kernel's).
    assert(pairs.map(p => (p._1, p._2)) == expected.map(p => (p._1, p._2)),
      s"pair sets differ: ${pairs.size} vs ${expected.size}")
    val byPair = expected.map(p => (p._1, p._2) -> p._3).toMap
    pairs.foreach { case (a, b, c) =>
      assert(math.abs(c - byPair((a, b))) < 2e-6, s"cosine drift on ($a,$b)")
    }
  }

  test("codegen'd vec_dist2 equals the declarative fold spec exactly") {
    import org.apache.spark.sql.functions.expr
    graft.functions.SquaredL2.register(spark)
    val quant =
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
    val q = docs.select(col("vec_id"), expr(quant).as("qv"))
    val pairs = q.crossJoin(
      q.select(col("qv").as("cv")).filter(col("vec_id") < 4).drop("vec_id"))
    val mismatches = pairs.select(
        expr("vec_dist2(qv, cv)").as("nat"),
        expr(Clustering.distSpec("qv", "cv")).as("sql"))
      .filter("nat <> sql").count()
    assert(mismatches == 0L)
    val nulls = spark.sql(
      """SELECT vec_dist2(array(1L, NULL), array(1L, 2L)) AS a,
        |       vec_dist2(array(1L), array(1L, 2L)) AS b""".stripMargin).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("k-means never shuffles or sort-merge-joins the corpus side") {
    // The per-iteration assignment must be a BROADCAST of k×dim centroid
    // rows against the scan (BroadcastNestedLoopJoin is the intentional
    // bounded cross-join shape, as with the IVF centroids) — a
    // SortMergeJoin or corpus-keyed Exchange before the argmin would mean
    // Spark decided to shuffle the corpus per iteration.
    val plan = Clustering.kmeans(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("every semantic-dedup pair lives inside one cluster") {
    val asg = Clustering.assignments(spark, dir).select("vec_id", "cid")
    val pairs = Clustering.semanticDedup(spark, dir)
    val crossCluster = pairs
      .join(asg.withColumnsRenamed(Map("vec_id" -> "vec_a", "cid" -> "cid_a")), "vec_a")
      .join(asg.withColumnsRenamed(Map("vec_id" -> "vec_b", "cid" -> "cid_b")), "vec_b")
      .filter(col("cid_a") =!= col("cid_b") || col("cid_a") =!= col("cid"))
      .count()
    assert(crossCluster == 0)
  }

  test("k-center greedy: farthest-point invariants against a local recompute") {
    import graft.llm.Clustering
    val out = Clustering.kcenterCoreset(spark, dir, k = 6)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0 until 6))
    assert(out.map(_._2).distinct.length == 6)    // 6 distinct exemplars
    assert(out.head._3 == 0L)                     // seed has no radius
    // Coverage radii are non-increasing: each pick is the farthest point
    // from a SUPERSET of the previous centers.
    val d = out.tail.map(_._3)
    assert(d.zip(d.tail).forall { case (a, b) => a >= b })
    // Local recompute of the greedy sequence on collected vectors.
    val vecs = graft.core.Sources.embeddings(spark, dir)
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv")
      .as[(Long, Seq[Long])].collect().toMap
    def dist2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val chosen = scala.collection.mutable.ListBuffer(vecs.keys.min)
    for (_ <- 1 until 6) {
      val next = vecs.keys.filterNot(chosen.contains).map { id =>
        (id, chosen.map(c => dist2(vecs(id), vecs(c))).min)
      }.minBy { case (id, dd) => (-dd, id) }
      chosen += next._1
    }
    assert(out.map(_._2).toSeq == chosen.toSeq)
  }

  test("label centroids: hand-computed means, orthogonal and identical") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("centroids").toString
    // Label 0 points along e1 (mean 1000, 0 after quantization), label 1
    // along e2, label 2 a single e1 vector: cos(0,1) = 0, cos(0,2) = 1.
    Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(0.5f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Clustering.labelCentroids(spark, tmp).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out((0, 1)) == ((2L, 2L, 0L, 0.0)))
    assert(out((0, 2)) == ((2L, 1L, 500000L, 1.0)))
    assert(out((1, 2)) == ((2L, 1L, 0L, 0.0)))
  }

  test("embedding stats: hand-computed norms and a zero-vector flag") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("embstats").toString
    Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.5f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Clustering.embeddingStats(spark, tmp).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // Quantized norms²: 1000² and 500²; RMS = sqrt(1250000/2)/1000.
    assert(out(0) == ((2L, 250000L, 1000000L, 1250000L, 0L, 0.790569)))
    assert(out(1) == ((1L, 0L, 0L, 0L, 1L, 0.0)))
  }

  test("embedding stats tile the corpus and bound the norms") {
    val rows = Clustering.embeddingStats(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum == docs.count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))
      assert(r.getLong(4) >= r.getLong(3)) // sum >= max
      assert(r.getLong(5) >= 0L && r.getDouble(6) >= 0.0)
    }
  }

  test("label centroid matrix covers every label pair on the real corpus") {
    val labels = docs.select("label").distinct().count()
    val rows = Clustering.labelCentroids(spark, dir).collect()
    assert(rows.length == labels * (labels - 1) / 2)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(5)) <= 1.0 + 1e-9)
      assert(r.getLong(2) >= 1L && r.getLong(3) >= 1L)
    }
  }
}
