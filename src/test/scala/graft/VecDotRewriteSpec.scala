package graft

import org.apache.spark.sql.functions.{col, expr}

import graft.plans.VecDotRewrite

/** The optimizer rule must rewrite exactly the declarative dot-product
  * shape into the codegen'd kernel — and nothing else — without changing
  * a single output bit. */
class VecDotRewriteSpec extends SparkSpec {

  private def emb = graft.core.Sources.embeddings(spark, Sf001)

  private val dotSpec = graft.llm.Similarity.dotSpec("embedding", "q_embedding")

  private def pairs = emb.crossJoin(
    emb.filter(col("vec_id") < 4)
      .select(col("embedding").as("q_embedding")))

  test("the declarative fold rewrites to the DotProduct expression") {
    val analyzed = withAnsi(on = false) {
      pairs.select(expr(dotSpec).as("d")).queryExecution.analyzed
    }
    val rewritten = VecDotRewrite(analyzed)
    val hits = rewritten.expressions.flatMap(_.collect {
      case d: graft.functions.DotProduct => d
    })
    assert(hits.nonEmpty, "rule did not fire on the dot-product shape")
    assert(!rewritten.expressions.exists(_.collectFirst {
      case a: org.apache.spark.sql.catalyst.expressions.ArrayAggregate => a
    }.isDefined), "the HOF aggregate should be gone")
  }

  test("ANSI-mode arithmetic is left untouched (r6 ADVICE #1)") {
    // Under spark.sql.ansi.enabled the fold's +/* carry raise-on-error
    // semantics the kernel does not reproduce; the guard must keep the
    // rule from substituting it.
    val analyzed = withAnsi(on = true) {
      pairs.select(expr(dotSpec).as("d")).queryExecution.analyzed
    }
    val rewritten = VecDotRewrite(analyzed)
    assert(rewritten.expressions.forall(_.collectFirst {
      case d: graft.functions.DotProduct => d
    }.isEmpty), "rule must not fire on ANSI arithmetic")
  }

  test("non-dot folds are left untouched") {
    // Same skeleton, + instead of * inside zip_with: must NOT rewrite.
    val sumSpec =
      """aggregate(zip_with(embedding, q_embedding,
        |  (x, y) -> CAST(x AS DOUBLE) + CAST(y AS DOUBLE)),
        |  0D, (acc, v) -> acc + v)""".stripMargin
    val analyzed = pairs.select(expr(sumSpec).as("d")).queryExecution.analyzed
    val rewritten = VecDotRewrite(analyzed)
    assert(rewritten.expressions.forall(_.collectFirst {
      case d: graft.functions.DotProduct => d
    }.isEmpty))
  }

  test("an installed rule changes the plan but not one output bit") {
    graft.functions.DotProduct.register(spark)
    val baseline = pairs
      .select(col("vec_id"), expr(s"vec_dot(embedding, q_embedding)").as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ VecDotRewrite
    try withAnsi(on = false) {
      val df = pairs.select(col("vec_id"), expr(dotSpec).as("d"))
      assert(df.queryExecution.executedPlan.toString.contains("vec_dot"),
        "optimized plan should run the kernel")
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
      assert(got.toSeq == baseline.toSeq) // bitwise: Double == Double
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == VecDotRewrite)
    }
  }
}
