package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning

import graft.ops.SkewJoin

/** The salted join must be a pure plan transformation: bit-identical
  * results to the plain join, with the fact-side exchange keyed on
  * (event_type, salt) — 5×S shuffle groups where the naive join has 5. */
class SkewJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private lazy val events = graft.core.Sources.events(spark, Sf001)

  test("salted join result is bit-identical to the plain join, any S") {
    val plain = SkewJoin.saltedJoinOf(events, saltBuckets = 1)
      .orderBy("event_type").collect()
    val salted = SkewJoin.saltedJoinOf(events, saltBuckets = 16)
      .orderBy("event_type").collect()
    assert(salted.toSeq === plain.toSeq)
    assert(salted.length === 5)
  }

  test("the join shuffles on (event_type, salt), not event_type alone") {
    val plan = SkewJoin.saltedJoinOf(events, saltBuckets = 16)
      .queryExecution.executedPlan
    val joins = collectWithSubqueries(plan) {
      case j: ShuffledHashJoinExec => j }
    assert(joins.nonEmpty, "SHUFFLE_HASH hint must pin a shuffled join")
    assert(joins.head.leftKeys.size === 2, "join key must include the salt")
    assert(collectWithSubqueries(plan) {
      case b: BroadcastHashJoinExec => b }.isEmpty,
      "a broadcast join would defeat the salting demonstration")
    val saltedExchanges = collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec
          if (e.outputPartitioning match {
            case h: HashPartitioning => h.expressions.size == 2
            case _ => false
          }) => e
    }
    assert(saltedExchanges.nonEmpty,
      "fact exchange must hash on the composite (event_type, salt)")
  }
}
