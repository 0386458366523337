package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's OWN runtime-filter expressions, which ship in
  * catalyst but are not in the public function registry: Catalyst's
  * `InjectRuntimeFilter` builds `bloom_filter_agg` / `might_contain`
  * plans only when its join-selectivity heuristics fire, and at 100 TB
  * the single biggest shuffle saving — semi-join reduction of a fact
  * scan by a selective dimension — is too important to leave to a
  * heuristic.  Registering the expressions makes the technique a
  * first-class, hand-placeable operator (see
  * [[graft.ops.BloomPrune]]) with exactly the shape Spark's optimizer
  * would inject: a scalar-subquery bloom build on the dim side and a
  * pre-shuffle `might_contain` filter on the fact side.
  *
  * Both are thin builders over battle-tested catalyst classes — the
  * aggregate's buffer is a mergeable `org.apache.spark.util.sketch
  * .BloomFilter` (map-side partials; the shuffle carries one filter per
  * partition, never keys), and the probe compiles into whole-stage
  * codegen.  `graft_might_contain` requires its filter input to be a
  * constant or scalar subquery (enforced by the underlying expression) —
  * the bloom is evaluated ONCE, broadcast with the plan, and never
  * deserialized per row.
  */
object BloomRuntimeFilter {

  /** `graft_bloom_agg(xxhash64(k), estimatedItems, numBits) → BINARY`. */
  val aggDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new BloomFilterAggregate(children(0), children(1), children(2)))

  /** `graft_might_contain(bloomBinary, xxhash64(k)) → BOOLEAN`. */
  val probeDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) =>
        BloomFilterMightContain(children(0), children(1)))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      aggDescription._1, aggDescription._2, aggDescription._3)
    spark.sessionState.functionRegistry.registerFunction(
      probeDescription._1, probeDescription._2, probeDescription._3)
  }
}
