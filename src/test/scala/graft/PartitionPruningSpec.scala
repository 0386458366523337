package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.core.Sinks

/** Partition pruning on the keyed-overwrite layout: the same
  * `partitionBy` directories that make [[graft.core.Sinks.overwriteByKey]]
  * reloads idempotent make date/key-scoped READS skip every non-matching
  * partition at planning time — the scan never opens their files.  This is
  * the 100 TB complement to BucketingSpec: bucketing removes the join
  * shuffle, date/key partitioning removes the scan I/O for the
  * month-window predicates every KPI query carries (F2/F3/F7).
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.get

  test("a partition-key predicate prunes the scan to matching directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, s"2024-0${i % 3 + 1}", (i % 100).toDouble))
      .toDF("id", "mes", "valor")
    Sinks.overwriteByKey(rows, dir, Seq("mes"))

    val pruned = spark.read.parquet(dir).filter(col("mes") === "2024-02")
    val scan = scanOf(pruned)
    // Pruning happens in the scan's partition selection, not a post-filter:
    // exactly one of the three mes= directories survives.
    assert(scan.metadata("PartitionFilters").contains("mes"),
      s"partition filter missing: ${scan.metadata}")
    assert(pruned.count() == 100)
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 of 3 partitions, scanned ${scan.selectedPartitions.partitionCount}")

    // An unpartitioned-column predicate cannot prune: all 3 scanned.
    val unpruned = spark.read.parquet(dir).filter(col("valor") < 10)
    assert(scanOf(unpruned).selectedPartitions.partitionCount == 3)
  }

  test("dynamic partition pruning: the dim filter reaches the fact scan") {
    val df = graft.core.DynamicPruning.prunedRevenue(spark, Sf001)
    // The runtime filter is visible in the fact scan's partition filters.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in:\n$plan")
    // And the result equals the direct month-window aggregate.
    val got = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = graft.core.Sources.orders(spark, Sf001)
      .filter(expr("month(o_orderdate) BETWEEN 1 AND 3"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mes"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("c"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == want && got.nonEmpty)
    got.keys.foreach(m => assert(Set("01", "02", "03")(m.substring(5))))
  }

  test("dynamic keyed overwrite leaves pruned siblings byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune2").toString
    val v1 = Seq((1L, "2024-01", 1.0), (2L, "2024-02", 2.0))
      .toDF("id", "mes", "valor")
    Sinks.overwriteByKey(v1, dir, Seq("mes"))
    // Reload ONLY 2024-02 with new data; 2024-01 must survive untouched.
    val v2 = Seq((3L, "2024-02", 9.0)).toDF("id", "mes", "valor")
    Sinks.overwriteByKey(v2, dir, Seq("mes"))

    val out = spark.read.parquet(dir).orderBy("id")
      .select("id", "mes", "valor").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "2024-01", 1.0), (3L, "2024-02", 9.0)))
  }
}
