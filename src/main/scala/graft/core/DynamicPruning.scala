package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning (DPP) demonstrated end-to-end — the scale
  * feature that makes "join the 100 TB month-partitioned fact to a
  * filtered dimension" read only the matching month DIRECTORIES: the
  * dimension's filter result is broadcast and re-used as a runtime
  * partition filter on the fact scan, so file listing itself shrinks
  * before a single row is read.  Static pruning (PartitionPruningSpec)
  * covers literal predicates; DPP covers predicates only known at RUN
  * time through a join — the reference's month-scoped extracts
  * (`kpi_receita_farmer_m_passado/extract.py` WHERE-month template)
  * re-expressed as the layout-aware join Spark optimizes.
  *
  * [[prunedRevenue]] stages a `mes=yyyy-MM`-partitioned copy of orders
  * (once per JVM, the [[Manifest]] staging convention — setup, not the
  * measured operator), derives a month dimension from the SAME source,
  * filters it to Q1 months, and joins.  The plan carries
  * `dynamicpruning#N` in the fact scan's PartitionFilters
  * (spec-asserted); the gate hash-checks the RESULT against a direct
  * filtered aggregate of the unpartitioned table, so pruning that drops
  * or duplicates a partition fails correctness, not just the plan shape.
  */
object DynamicPruning {

  /** Orders staged as a mes-partitioned table (string yyyy-MM dirs) —
    * content-fingerprinted and shutdown-swept via [[Staging]]
    * (r8 ADVICE #4: no stale reuse after the source changes, no /tmp
    * accumulation across JVMs). */
  private[graft] def stagedOrders(spark: SparkSession, dir: String): String = {
    val fp = Staging.fingerprint(spark, dir, "orders")
    Staging.ensure(s"dpp#$dir", fp) { root =>
      Sources.orders(spark, dir)
        .withColumn("mes", date_format(col("o_orderdate"), "yyyy-MM"))
        .write.partitionBy("mes").mode("overwrite")
        .parquet(s"$root/orders_by_mes")
    } + "/orders_by_mes"
  }

  /** True iff the staged tree contains at least one parquet data file —
    * pure FS metadata (an empty source stages only _SUCCESS, and
    * `read.parquet` cannot infer a schema from that). */
  private def hasParquet(spark: SparkSession, p: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(p)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def any(d: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(d).exists(s =>
        if (s.isDirectory) any(s.getPath)
        else s.getPath.getName.endsWith(".parquet"))
    fs.exists(root) && any(root)
  }

  /** Q1 revenue per month through the DPP join; quarter comes from the
    * month dimension, not a literal on the fact, so the partition filter
    * can only arrive dynamically. */
  def prunedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val stagedPath = stagedOrders(spark, dir)
    if (!hasParquet(spark, stagedPath))
      // Degenerate source: keep the schema contract without a scan.
      return spark.range(0).selectExpr("CAST(NULL AS STRING) AS mes",
        "CAST(0 AS BIGINT) AS n_orders", "CAST(0 AS BIGINT) AS cents")
    val fact = spark.read.parquet(stagedPath)
    val monthDim = Sources.orders(spark, dir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("mes"))
      .distinct()
      // Month number BETWEEN, not a division-derived quarter: DuckDB
      // CASTs double→int by rounding while Spark truncates, so any /3
      // formula would disagree on month 3.
      .filter(expr("CAST(substring(mes, 6, 2) AS INT) BETWEEN 1 AND 3"))
      .select(col("mes"))
    fact.join(broadcast(monthDim), Seq("mes"))
      .groupBy(col("mes"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr(s"CAST(${Frag.money("o_totalprice")} * 100 AS BIGINT)"))
          .as("cents"))
  }

  val prunedRevenueOracle: String =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS mes,
       |  COUNT(*) AS n_orders,
       |  CAST(SUM(CAST(${Frag.money("o_totalprice")} * 100 AS BIGINT))
       |    AS BIGINT) AS cents
       |FROM orders
       |WHERE CAST(strftime(o_orderdate, '%m') AS INT) BETWEEN 1 AND 3
       |GROUP BY 1""".stripMargin
}
