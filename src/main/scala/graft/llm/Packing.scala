package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Sources
import graft.functions.Mix31

/** Sequence packing: assign documents to fixed-token-budget training
  * shards — the step between a curated corpus and a trainer that consumes
  * ~budget-token sequences.
  *
  * The assignment is CONTIGUOUS CUMULATIVE packing: within a language,
  * documents in a deterministic order (doc_id) go to shard
  * ⌊exclusive-running-token-sum / budget⌋.  Chosen over greedy first-fit
  * bin packing deliberately: first-fit's assignment depends on visit order
  * and bin state (unreproducible across engines and partitionings, and
  * inherently sequential), while the cumulative form is a window function —
  * reproducible everywhere, one shuffle, and its packing efficiency loss
  * is bounded by one straddling document per shard boundary (trainers
  * truncate or wrap those).  Every shard except a language's last then
  * holds ≥ budget − max_doc_tokens and < budget + max_doc_tokens tokens.
  *
  * Scale: one window per partition key.  Contiguity within a key is
  * inherently sequential, so [[pack]]'s plain per-language window tops out
  * at #languages concurrent tasks — at 100 TB the dominant language's
  * whole token stream would flow through one task.  [[packBucketed]] is
  * the scale form: the key widens to (lang, bucket) where bucket =
  * mix31(doc_id) mod nBuckets, shards never span buckets, every bucket
  * packs in parallel, and the per-task state is still one running sum.
  * The cost is bounded: at most one underfilled tail shard per bucket
  * instead of per language (nBuckets × #langs partial shards total,
  * negligible against a 100 TB shard count).  Size nBuckets ≈ cluster
  * cores / #languages so every core packs.  Same tokenization as
  * [[TextAnalysis]] (whitespace), so token budgets agree across the
  * pipeline.  Beyond the reference surface (its unit of work is the month,
  * never a size-bounded shard).
  */
object Packing {

  /** Per-shard summary: docs, token load, and the bounded overflow —
    * integer-exact, DuckDB-checked ([[packOracle]]). */
  def pack(spark: SparkSession, dir: String,
      budgetTokens: Long = 4096L): DataFrame = {
    val toks = Sources.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("cum_excl", coalesce(sum(col("toks")).over(w), lit(0L)))
      .withColumn("shard_id", floor(col("cum_excl") / budgetTokens))
      .groupBy(col("lang"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("shard_tokens"))
  }

  /** The (lang, bucket) scale form: mix31-bucketed windows so packing
    * parallelism is nBuckets × #languages, not #languages.  Bucket
    * assignment is the engine-wide [[Mix31]] hash of `doc_id` — pure,
    * cross-engine, partitioning-independent — so the output (and the
    * DuckDB check, [[packBucketedOracle]]) is deterministic. */
  def packBucketed(spark: SparkSession, dir: String,
      budgetTokens: Long = 4096L, nBuckets: Int = 8): DataFrame = {
    val toks = Sources.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        expr(s"${Mix31.sparkSql("doc_id")} % $nBuckets").cast("int")
          .as("bucket"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val w = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("cum_excl", coalesce(sum(col("toks")).over(w), lit(0L)))
      .withColumn("shard_id", floor(col("cum_excl") / budgetTokens))
      .groupBy(col("lang"), col("bucket"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("shard_tokens"))
  }

  def packBucketedOracle(budgetTokens: Long = 4096L,
      nBuckets: Int = 8): String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(${Mix31.duckSql("doc_id")} % $nBuckets AS INT) AS bucket,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
       |  FROM documents),
       |c AS (
       |  SELECT lang, bucket, toks,
       |    COALESCE(SUM(toks) OVER (PARTITION BY lang, bucket ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS cum_excl
       |  FROM t)
       |SELECT lang, bucket,
       |  CAST(FLOOR(cum_excl / $budgetTokens) AS BIGINT) AS shard_id,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(toks) AS BIGINT) AS shard_tokens
       |FROM c GROUP BY 1, 2, 3""".stripMargin

  def packOracle(budgetTokens: Long = 4096L): String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
       |  FROM documents),
       |c AS (
       |  SELECT lang, toks,
       |    COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS cum_excl
       |  FROM t)
       |SELECT lang,
       |  CAST(FLOOR(cum_excl / $budgetTokens) AS BIGINT) AS shard_id,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(toks) AS BIGINT) AS shard_tokens
       |FROM c GROUP BY 1, 2""".stripMargin
}
