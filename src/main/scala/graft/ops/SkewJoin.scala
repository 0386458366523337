package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** Skew-safe salted equi-join — the join-side twin of [[SaltedAgg]].
  *
  * The events fact table joins a fee dimension on `event_type`: FIVE
  * distinct keys.  A plain shuffle join hash-partitions both sides on the
  * key, so five reducers receive the whole fact table no matter how many
  * executors exist — the canonical low-cardinality/skewed-key join.  AQE's
  * OptimizeSkewedJoin can split an oversized PARTITION of a sort-merge
  * join, but a partition holding exactly one hot key still lands its merge
  * on one task when the downstream aggregation needs the same key — and
  * salting composes with the partial aggregation, which AQE cannot do.
  *
  * Salting: the fact side gets `salt = pmod(xxhash64(event_id), S)`
  * (deterministic — reruns shuffle identically), the dim side explodes
  * ×S, and the join key becomes (event_type, salt): 5×S shuffle groups
  * instead of 5.  The follow-up aggregation reuses the salted
  * partitioning for its partial pass and combines per event_type in a
  * second, 5-row aggregation — SUM/COUNT distribute over the salt split,
  * so the result is bit-identical to the plain join, which is exactly
  * what the oracle asserts.
  *
  * The dim here is a rate table ([[graft.core.Rates]] precedent) small
  * enough to broadcast — production uses salting when the dim is itself
  * too large for that (so the join MUST shuffle) yet hot on few keys; the
  * SHUFFLE_HASH hint pins that regime so the registered plan is the one
  * the pattern exists for (SkewJoinSpec asserts the salted exchange).
  */
object SkewJoin {

  /** (event_type, fee in basis points) — shared with the oracle VALUES. */
  private[graft] val feeBp: Seq[(String, Int)] = Seq(
    "signup" -> 120, "click" -> 45, "view" -> 10,
    "purchase" -> 250, "error" -> 0)

  private[graft] val SaltBuckets = 16

  def saltedJoin(spark: SparkSession, dir: String,
      saltBuckets: Int = SaltBuckets): DataFrame =
    saltedJoinOf(Sources.events(spark, dir), saltBuckets)

  /** Core over an explicit events frame — spec-testable. */
  private[graft] def saltedJoinOf(events: DataFrame,
      saltBuckets: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val fact = events
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(saltBuckets)))
      .withColumn("cents", expr(Frag.money("value")))
    val dim = feeBp.toDF("event_type", "fee_bp")
      .withColumn("salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    val joined = fact.hint("SHUFFLE_HASH")
      .join(dim, Seq("event_type", "salt"))
    val partial = joined
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("n"),
        sum(expr("cents * fee_bp")).as("fee"))
    partial
      .groupBy("event_type")
      // ×100 lifts the scale-2 decimal to an exact integer: decimal
      // DIVISION scale rules differ across engines, integer sums don't.
      .agg(sum("n").as("n"),
        expr("CAST(SUM(fee) * 100 AS BIGINT)").as("fee_bp_cents"))
  }

  val saltedJoinOracle: String = {
    val dimValues = feeBp.map { case (t, f) => s"('$t', $f)" }.mkString(", ")
    s"""WITH dim(event_type, fee_bp) AS (VALUES $dimValues)
       |SELECT e.event_type, COUNT(*) AS n,
       |  CAST(SUM(${Frag.money("value")} * fee_bp) * 100 AS BIGINT)
       |    AS fee_bp_cents
       |FROM events e JOIN dim ON e.event_type = dim.event_type
       |GROUP BY 1""".stripMargin
  }
}
