package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: the runtime half of the engine's skew story
  * (the compile-time half — two-stage salting for skewed AGGREGATION keys,
  * which AQE cannot split — is `ops/SaltedAgg` + its oracle).  For skewed
  * JOIN keys no rewrite is needed at all: AQE detects oversized partitions
  * at the shuffle boundary and splits them across tasks.  This spec forces
  * the conditions (one hot key, thresholds scaled down to test size,
  * broadcast disabled so the join actually shuffles) and asserts the final
  * adaptive plan marks the join skew-handled.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("a hot join key is split by AQE rather than serializing one task") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k rows on one hot key vs ~100 rows on each of 99 others.
      val fact = spark.range(110000).select(
        when(col("id") < 100000, lit(7L)).otherwise(col("id") % 100).as("k"),
        concat(lit("payload-padding-to-make-bytes-count-"), col("id")).as("v"))
      val dim = spark.range(100).select(col("id").as("k"),
        concat(lit("name"), col("id")).as("name"))
      val joined = fact.join(dim, "k")
      // Execute THIS QueryExecution (a count() would both spawn a separate
      // execution and prune the payload column, shrinking partitions below
      // the skew threshold); only after execution does the adaptive plan
      // reach its final, skew-split form.
      assert(joined.collect().length == 110000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
        s"expected a skew-split join in the adaptive plan:\n$plan")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
