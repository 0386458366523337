package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max manifest + manifest-driven file skipping — the
  * data-skipping primitive of the table formats (Iceberg/Delta manifests,
  * Hive index files), built from plain parquet directories.
  *
  * At 100 TB a predicate on a clustered column should decide which FILES
  * to open before any row is read: the manifest holds one row per data
  * file with (row count, min, max) of the clustering column, so a range
  * predicate intersects [lo, hi] intervals — pure metadata, proportional
  * to the file count, not the data.  Partition pruning
  * (PartitionPruningSpec) skips directories; this skips files WITHIN a
  * partition, which is what a sorted/Z-ordered layout
  * ([[Sinks.overwriteSorted]], [[ZOrder]]) exists to enable.
  *
  * [[build]] computes the manifest with ONE distributed scan
  * (`groupBy(input_file_name())` — map-side partials, #files result
  * rows); a production write path appends the same rows incrementally at
  * commit time instead of rescanning.  [[prunedFiles]] collects only the
  * surviving file PATHS to the driver — bounded metadata, the same size
  * class as the driver's own file listing, never data rows.
  *
  * Reference analogue: none — the reference reads whole tables through a
  * single cursor (`utils/db_connection.py`); skipping is part of the
  * beyond-reference scale surface.  The registered query
  * ([[prunedAgg]]) stages a sorted multi-file copy, prunes by manifest,
  * and aggregates ONLY the surviving files — hash-checked against an
  * oracle that scans the full logical table, so a pruning bug that drops
  * or duplicates boundary rows fails the gate, not just a spec.
  */
object Manifest {

  /** One manifest row per data file: (file, rows, lo, hi) for `column`. */
  def build(spark: SparkSession, path: String, column: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col(column)).as("lo"), max(col(column)).as("hi"))

  /** Files whose [lo, hi] interval intersects [from, to] — the candidate
    * set a range predicate on `column` must open. */
  def prunedFiles(spark: SparkSession, path: String, column: String,
      from: Long, to: Long): Seq[String] =
    build(spark, path, column)
      .filter(!(col("hi") < from || col("lo") > to))
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** One staged sorted copy per (JVM, source dir, file count, source
    * fingerprint): the staging write is setup for the skipping proof, not
    * part of the measured operator, and a fixed path raced concurrent
    * Bench/Verify runs on the same sf dir (overwrite under a reader — r6
    * ADVICE #2).  Paths are unique per process and repeat invocations
    * (bench passes) reuse them; [[Staging]] adds content-fingerprint
    * staleness detection and shutdown cleanup (r8 ADVICE #4). */

  /** End-to-end skipping proof: stage orders SORTED by o_orderkey into
    * `files` parquet files, keep only manifest-surviving files for the
    * key range, and aggregate them (re-applying the row predicate — file
    * grain is coarser than row grain).  Equals the full-table filtered
    * aggregate iff pruning kept every boundary row.  An empty surviving
    * set short-circuits to an empty frame of the same schema (a range
    * that misses every file must yield zero groups, not a reader error). */
  def prunedAgg(spark: SparkSession, dir: String,
      lo: Long = 1000L, hi: Long = 2199L, files: Int = 8): DataFrame = {
    val fp = Staging.fingerprint(spark, dir, "orders")
    val staged = Staging.ensure(s"manifest#$dir#$files", fp) { root =>
      Sinks.overwriteSorted(Sources.orders(spark, dir),
        s"$root/orders_sorted", Seq("o_orderkey"), files)
    } + "/orders_sorted"
    val keep = prunedFiles(spark, staged, "o_orderkey", lo, hi)
    val survivors =
      if (keep.isEmpty) spark.read.parquet(staged).limit(0)
      else spark.read.parquet(keep: _*)
    survivors
      .filter(col("o_orderkey").between(lo, hi))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        expr(Frag.sumMoney(Frag.money("o_totalprice"))).as("receita"))
  }

  def prunedAggOracle(lo: Long = 1000L, hi: Long = 2199L): String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       |  ${Frag.sumMoney(Frag.money("o_totalprice"))} AS receita
       |FROM orders
       |WHERE o_orderkey BETWEEN $lo AND $hi
       |GROUP BY 1""".stripMargin
}
