package graft

import org.apache.spark.sql.SparkSession

/** End-to-end contract of [[GraftExtensions]] — the cluster-deployment
  * surface (`--conf spark.sql.extensions=graft.GraftExtensions`): a
  * session built with the extensions must expose every engine function
  * to PURE SQL users and apply the kernel-rewrite optimizer rules, with
  * no library `register` call anywhere.  The suite builds a second
  * SparkSession over the shared SparkContext (sessions are cheap; the
  * context is the expensive singleton) and restores the default session
  * afterward so the other suites keep theirs.
  */
class ExtensionsSpec extends SparkSpec {

  private def withExtensionSession[T](f: SparkSession => T): T = {
    val base = spark // force the shared session/context to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false") // kernel rewrites are LEGACY-only
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(ext)
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("every engine function resolves and computes from pure SQL") {
    withExtensionSession { s =>
      // Text kernel.
      val sh = s.sql(
        "SELECT ngram_shingles('alpha beta gamma', 2, false) AS g")
        .head.getSeq[String](0)
      assert(sh === Seq("alpha beta", "beta gamma"))
      // HLL estimate over a generated range ≈ its exact cardinality.
      val est = s.sql(
        "SELECT hll_distinct(CAST(id AS BIGINT)) FROM range(500)")
        .head.getDouble(0)
      assert(math.abs(est - 500.0) / 500.0 < 0.1)
      // Quantile sketch in its exact regime: the median of 1..101.
      val med = s.sql(
        "SELECT q_sketch_multi(CAST(id + 1 AS BIGINT), array(0.5D), 1024) " +
          "FROM range(101)").head.getSeq[Long](0)
      assert(med === Seq(51L))
      // KMV: ascending bottom-4 of the shared mix31 permutation.
      val kmv = s.sql(
        "SELECT kmv_sketch(CAST(id AS BIGINT), 4) FROM range(64)")
        .head.getSeq[Long](0)
      val want = (0L until 64L).map(graft.functions.Mix31.mix).sorted.take(4)
      assert(kmv === want)
      // Vector kernels.
      val dot = s.sql(
        "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F))")
        .head.getDouble(0)
      assert(dot === 11.0)
      // Bloom runtime-filter pair is registered for SQL users too.
      Seq("graft_bloom_agg", "graft_might_contain", "mg_topk",
        "simhash_bands", "hyperplane_buckets", "minhash_signature",
        "hll_sketch_bytes", "hll_merge_est", "q_sketch").foreach { fn =>
        assert(s.catalog.functionExists(fn), s"$fn missing from registry")
      }
    }
  }

  test("the injected optimizer rule rewrites declarative folds to the kernel") {
    withExtensionSession { s =>
      // A SQL user writing the textbook HOF dot product gets the
      // codegen'd DotProduct transparently (no graft imports anywhere).
      // range(1) keeps the input non-foldable: a VALUES literal would be
      // constant-folded into a LocalRelation before the rule could show.
      val df = s.sql(
        "SELECT aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * " +
          "CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v) AS d " +
          "FROM (SELECT array(CAST(id + 1 AS FLOAT), 2.0F) AS a, " +
          "array(5.0F, 6.0F) AS b FROM range(1))")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("vec_dot"),
        s"fold not rewritten to the kernel:\n$optimized")
      assert(df.head.getDouble(0) === 17.0)
    }
  }
}
