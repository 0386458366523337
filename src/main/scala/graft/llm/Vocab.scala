package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Tokenizer-vocabulary preparation: the global top-K token frequency
  * table with cumulative corpus coverage — the first artifact a
  * BPE/WordPiece training run derives from a corpus (seed vocabulary +
  * the coverage curve that picks the vocab size).  Beyond the reference
  * surface, per the LLM-pipeline brief.
  *
  * Scale shape: explode → groupBy(word) with map-side partial counts (one
  * shuffle keyed by word), then the top-K selection is Spark's
  * TakeOrderedAndProject — per-partition top-K heaps merged once, never a
  * global sort of the vocabulary.  Only the K surviving rows pass through
  * the single-partition ranking window, and the corpus-wide token total
  * rides in as a 1-row broadcast.  All counts are exact integers; the
  * coverage division is one IEEE double op — deterministic across engines.
  */
object Vocab {

  val DefaultK = 200

  def topK(spark: SparkSession, dir: String, k: Int = DefaultK): DataFrame = {
    val counts = Sources.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total_tokens"))
    // (cnt DESC, word ASC) is a total order → the top-K cut and every
    // rank below are deterministic.
    val top = counts.orderBy(col("cnt").desc, col("word").asc).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("word").asc)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_tokens",
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("coverage",
        col("cum_tokens") / col("total_tokens").cast("double"))
      .select("rank", "word", "cnt", "cum_tokens", "coverage")
  }

  def topKOracle(k: Int = DefaultK): String =
    s"""WITH w AS (
       |  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents),
       |c AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM c),
       |top AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word ASC LIMIT $k)
       |SELECT
       |  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) AS INT) AS "rank",
       |  word, cnt,
       |  CAST(SUM(cnt) OVER (ORDER BY cnt DESC, word ASC
       |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
       |  CAST(SUM(cnt) OVER (ORDER BY cnt DESC, word ASC
       |                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |    / CAST(tot.total_tokens AS DOUBLE) AS coverage
       |FROM top, tot""".stripMargin

  /** Per-language frequent tokens via the engine's own Misra-Gries sketch
    * ([[graft.functions.HeavyHitters]]) — the fixed-memory, mergeable
    * alternative to [[topK]]'s exact global count: at 100 TB the exchange
    * carries ≤ k counters per (partition, lang) instead of every distinct
    * token.  k = 64 exceeds the synthetic vocabulary, so the sketch sits
    * in its exact regime and the driver gate hash-checks its output
    * against DuckDB's exact counts; the approximate regime's n/(k+1)
    * guarantee band is property-tested in HeavyHittersSpec. */
  def heavyHitters(spark: SparkSession, dir: String,
      k: Int = 64): DataFrame = {
    graft.functions.HeavyHitters.register(spark)
    Sources.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("lang"))
      .agg(expr(s"mg_topk(token, $k)").as("hh"))
      .select(col("lang"), explode(col("hh")).as("e"))
      .select(col("lang"), col("e.token").as("token"),
        col("e.est").as("est_count"))
  }

  def heavyHittersOracle(k: Int = 64): String =
    s"""SELECT lang, token, COUNT(*) AS est_count
       |FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS token
       |      FROM documents) t
       |GROUP BY 1, 2""".stripMargin
}
