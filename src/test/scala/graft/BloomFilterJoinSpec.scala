package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — the third leg of the engine's
  * join-at-scale story next to broadcast (plan-time) and AQE skew split
  * (run-time repartitioning): when a selective dimension filters a huge
  * fact through a shuffle join, the optimizer builds a Bloom filter from
  * the dimension's join keys and pushes it into the fact SCAN, so
  * non-matching fact rows die before the exchange instead of shuffling
  * 100 TB to be dropped by the join.  Spark 4 ships this
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on by default) —
  * the engine's job is to keep plans in the shape that triggers it, which
  * is what this spec pins: a selective filter on the creation side, a
  * shuffle join, thresholds met.  Production defaults gate it to ≥10 GB
  * application-side scans; the spec scales the thresholds to test size.
  */
class BloomFilterJoinSpec extends SparkSpec {

  test("a selective dim filter injects a bloom filter into the fact scan") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = graft.core.Sources.lineitem(spark, Sf001)
      val dim = graft.core.Sources.orders(spark, Sf001)
        .filter(col("o_orderpriority") === "1-URGENT") // selective creation side
      val joined = fact.join(dim,
        fact("l_orderkey") === dim("o_orderkey"))
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("o_orderpriority"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloom"),
        s"expected a runtime bloom filter in the optimized plan:\n$optimized")
      // And the filtered plan returns exactly the unfiltered join's rows.
      val n = joined.collect().length
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val n0 = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .collect().length
      assert(n == n0, "bloom pruning must not change the result")
      assert(n > 0)
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("without the selective filter no bloom filter is injected") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = graft.core.Sources.lineitem(spark, Sf001)
      val dim = graft.core.Sources.orders(spark, Sf001) // no creation-side filter
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(!optimized.toLowerCase.contains("bloom"),
        "an unfiltered dim must not pay for a useless bloom filter")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
