package graft

import org.apache.spark.sql.functions.{col, expr}

import graft.plans.VecDist2Rewrite

/** [[VecDist2Rewrite]] must rewrite exactly the declarative squared-L2
  * fold into the integer kernel — and nothing else — with identical
  * output (exact integers: equality is unconditional). */
class VecDist2RewriteSpec extends SparkSpec {

  private val quant =
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  private def pairs = {
    val emb = graft.core.Sources.embeddings(spark, Sf001)
      .select(col("vec_id"), expr(quant).as("qv"))
    emb.crossJoin(
      emb.filter(col("vec_id") < 4).select(col("qv").as("cv"),
        col("vec_id").as("cid")))
  }

  private val spec =
    """aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)),
      |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin

  test("the declarative fold rewrites to the SquaredL2 expression") {
    // optimizedPlan, not analyzed: the spec spells the zero as
    // CAST(0 AS BIGINT), which only folds to Literal(0L) — the shape the
    // rule matches — during optimization, where the rule actually runs.
    val analyzed = withAnsi(on = false) {
      pairs.select(expr(spec).as("d")).queryExecution.optimizedPlan
    }
    val rewritten = VecDist2Rewrite(analyzed)
    val hits = rewritten.expressions.flatMap(_.collect {
      case d: graft.functions.SquaredL2 => d
    })
    assert(hits.nonEmpty, "rule did not fire on the dist2 shape")
    assert(!rewritten.expressions.exists(_.collectFirst {
      case a: org.apache.spark.sql.catalyst.expressions.ArrayAggregate => a
    }.isDefined), "the HOF aggregate should be gone")
  }

  test("ANSI-mode arithmetic is left untouched (r6 ADVICE #1)") {
    // ANSI subtraction/multiplication raise on long overflow where the
    // kernel's wrapping loop would not — the guard must leave the ANSI
    // shape to the HOF evaluator.
    val analyzed = withAnsi(on = true) {
      pairs.select(expr(spec).as("d")).queryExecution.optimizedPlan
    }
    val rewritten = VecDist2Rewrite(analyzed)
    assert(rewritten.expressions.forall(_.collectFirst {
      case d: graft.functions.SquaredL2 => d
    }.isEmpty), "rule must not fire on ANSI arithmetic")
  }

  test("asymmetric folds are left untouched") {
    // (x - y) * (y - x): same skeleton, NOT the squared-L2 shape.
    val negSpec =
      """aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (y - x)),
        |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin
    val analyzed = pairs.select(expr(negSpec).as("d")).queryExecution.analyzed
    val rewritten = VecDist2Rewrite(analyzed)
    assert(rewritten.expressions.forall(_.collectFirst {
      case d: graft.functions.SquaredL2 => d
    }.isEmpty))
  }

  test("an installed rule changes the plan but not any output value") {
    graft.functions.SquaredL2.register(spark)
    val baseline = pairs
      .select(col("vec_id"), col("cid"), expr("vec_dist2(qv, cv)").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ VecDist2Rewrite
    try withAnsi(on = false) {
      val df = pairs.select(col("vec_id"), col("cid"), expr(spec).as("d"))
      assert(df.queryExecution.executedPlan.toString.contains("vec_dist2"),
        "optimized plan should run the kernel")
      val got = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got.toSeq == baseline.toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == VecDist2Rewrite)
    }
  }
}
