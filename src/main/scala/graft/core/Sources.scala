package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders (reference operator S1/S2).
  *
  * The reference pulls every input through `pd.read_sql` against Postgres
  * (`kpi_receita_farmer_m_passado/extract.py:66`); this harness reads the
  * driver-generated parquet star schema (/root/repo/TESTDATA.md).  Each
  * loader is a plain lazy scan — predicate pushdown and column pruning reach
  * the parquet reader through Catalyst, so callers simply `.filter`/`.select`
  * and the scan narrows automatically (verified via `explain("formatted")`:
  * `PushedFilters` / `ReadSchema`).
  *
  * A JDBC deployment would swap `parquet(...)` for
  * `format("jdbc").option("dbtable", ...)` with no caller change.
  */
object Sources {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** OPTIMIZATION r14 (guide §2.5 "input skew: one huge unsplittable
    * file… repartition immediately after the read"): the bench parquet
    * ships ONE row group per table, so every scan — and everything
    * codegen-fused into its stage — runs as a single task no matter the
    * core count.  Heavy derived frames (shingle sets, quantized
    * vectors) therefore repartition before they are persisted/reused —
    * but ONLY when the scan actually arrived narrower than the cluster:
    * at production scale the scan already carries thousands of splits
    * and an unconditional repartition would be a full extra shuffle of
    * the table.  The decision is derived from the plan's own partition
    * count vs `defaultParallelism`, not from a constant, so the same
    * code is a spread at bench scale and a no-op at 100 TB. */
  def spread(df: DataFrame,
      keys: org.apache.spark.sql.Column*): DataFrame = {
    val sc = df.sparkSession.sparkContext
    // ×4 margin, not ×2: an sf1 A/B showed that once the scan arrives at
    // even a third of the core count, the extra shuffle already costs
    // more than the extra parallelism returns — spread only a REALLY
    // narrow scan (the one-row-group bench shape), leave everything
    // else to its native split width.
    if (estScanParts(df) * 4 <= sc.defaultParallelism)
      if (keys.isEmpty) df.repartition(sc.defaultParallelism)
      else df.repartition(sc.defaultParallelism, keys: _*)
    else df
  }

  /** Estimated scan width (input split count) from FILE METADATA alone:
    * Σ file bytes / `files.maxPartitionBytes`, the same arithmetic the
    * scan's own split planner applies.  r15: the r14 form read
    * `df.rdd.getNumPartitions`, which forces a full analyze/optimize/
    * plan pass of the subtree per invocation — a fixed driver cost
    * every execution re-pays (measured ~0.2 s on the smallest dedup
    * bench entry); the file listing is already cached on the relation,
    * so this is a handful of getFileStatus calls.  The walk early-exits
    * once the total provably exceeds every caller's widest guard
    * (parallelism × maxPartitionBytes), so a production table with
    * thousands of files stats only enough of them to prove it is wide.
    * The estimate ignores openCost packing and row-group boundaries —
    * both only matter within a factor callers' margins absorb. */
  private[graft] def estScanParts(df: DataFrame): Long = {
    val spark = df.sparkSession
    val maxPB = spark.sessionState.conf.filesMaxPartitionBytes
    val cap = spark.sparkContext.defaultParallelism.toLong * maxPB
    val hconf = spark.sparkContext.hadoopConfiguration
    var bytes = 0L
    val it = df.inputFiles.iterator
    while (it.hasNext && bytes <= cap) {
      val p = new org.apache.hadoop.fs.Path(it.next())
      bytes += p.getFileSystem(hconf).getFileStatus(p).getLen
    }
    math.max(1L, (bytes + maxPB - 1) / maxPB)
  }

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** The events table's `ts` physical type has varied across driver data
    * generations — TIMESTAMP(NANOS) (which Spark's parquet reader only
    * accepts as a raw long under `spark.sql.legacy.parquet.nanosAsLong`)
    * and plain TIMESTAMP(MICROS) — so the adaptation is SCHEMA-DRIVEN
    * rather than assumed: a long column is nanos and converts via
    * `timestamp_micros(ts div 1000)` (the same truncation DuckDB applies,
    * so oracles agree), an NTZ column casts to the session-zoned type
    * (sessions pin UTC, so the instant is unchanged), and a zoned
    * timestamp passes through.  Downstream code always sees one type:
    * TIMESTAMP (ltz, microsecond).
    *
    * The `nanosAsLong` flag still comes from the SESSION BUILDER (Bench,
    * Verify, Probe, SparkSpec all set it; it is harmless for micros
    * files): it is captured at plan time, so a set-and-restore around
    * this lazy read would break the later action, and a permanent
    * `spark.conf.set` here would leak the legacy flag into every
    * subsequent parquet read on the shared session (the same hygiene
    * rule applied to sinks in round 3). */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(table(spark, dir, "events"))

  /** See [[events]]; public so streaming readers over the same file
    * (Probe's readStream path) share the adaptation. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Landing-format readers: CSV and JSON-lines ingestion with an EXPLICIT
    * schema.  Schema inference reads the data twice and guesses types from
    * whatever sample it sees — at 100 TB that is both a second full scan
    * and a correctness roulette (a column of ids that happen to be numeric
    * in the sample infers LONG, then a later alphanumeric id kills the
    * job) — so these entry points require the schema and keep ingestion a
    * single predictable pass.  Malformed rows land in the PERMISSIVE
    * corrupt-record column rather than failing the scan; SourcesSpec
    * round-trips both formats against parquet-read truth and exercises
    * the malformed path. */
  def csv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .csv(path)

  def jsonLines(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** ORC landing reader — the third columnar interchange format after
    * parquet and the text formats above.  ORC files carry their own types,
    * but the explicit schema still pins the read to the expected contract
    * (a landing file with a drifted column type fails loudly at plan time
    * instead of poisoning downstream arithmetic). */
  def orc(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** JDBC table source — the deployment shape the reference actually runs
    * (`pd.read_sql` against Postgres, one driver-side cursor).  Here the
    * read is Spark's JDBC relation: predicates and column pruning push
    * into the remote query, and the partitioned overload issues
    * `numPartitions` range-bounded queries in PARALLEL (each executor
    * pulls its own slice — the single-cursor bottleneck the reference has
    * is exactly what this removes at scale).  Proven against an embedded
    * in-memory Derby database in SourcesSpec (no sockets: the sandbox has
    * zero egress, but Derby runs in-process off the Spark classpath). */
  def jdbc(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()

  /** Credentialed read via the environment-driven connection config (the
    * reference's `.env` surface) — user/password ride as JDBC OPTIONS,
    * never in the URL (they would leak into plans and logs). */
  def jdbc(spark: SparkSession, env: JdbcEnv, table: String): DataFrame =
    spark.read.format("jdbc")
      .options(env.options).option("dbtable", table).load()

  /** Partition-parallel JDBC read: `numPartitions` disjoint range scans on
    * an indexed numeric column, the unit of parallelism for bulk pulls. */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    jdbcPartitioned(spark, JdbcEnv(url, None, None), table,
      partitionColumn, lowerBound, upperBound, numPartitions)

  def jdbcPartitioned(spark: SparkSession, env: JdbcEnv, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .options(env.options).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()
}
