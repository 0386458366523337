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
