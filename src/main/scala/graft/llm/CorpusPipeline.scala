package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources

/** End-to-end training-corpus curation: the composition a real LLM data
  * pipeline runs over raw documents — exact dedup, quality gating,
  * language filtering — ending in per-language corpus statistics.
  * Every stage is a narrow map/aggregate; the only shuffles are the dedup
  * groupBy (on a text hash at scale) and the final tiny per-language
  * rollup, so the pipeline streams the corpus once.
  */
object CorpusPipeline {

  val MinTokens = 15
  val MinDiversity = "0.45"

  /** Curate + summarize: per language, surviving docs and token volume. */
  def apply(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    // Exact dedup: keep each text's lowest doc_id.
    val kept = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("lang")).as("lang"))
    // Quality gate + language sanity (marker-token agreement).
    val scored = kept.selectExpr(
      "doc_id", "lang",
      "size(split(text, ' ')) AS n_tokens",
      """size(array_distinct(split(text, ' ')))
        | / CAST(size(split(text, ' ')) AS DOUBLE) AS diversity""".stripMargin)
    scored
      .filter(col("n_tokens") >= MinTokens &&
        col("diversity") >= expr(MinDiversity))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("first_doc_id"))
  }

  /** The curated corpus ITSELF (what [[apply]] summarizes): exact-dedup
    * survivors passing the quality gate, carrying their text and token
    * counts — the frame the runner's `corpus_curation` target lands in
    * the warehouse (lang-partitioned) as training input.  Same stages,
    * same shuffle budget; the per-language stats remain the registered
    * summary view. */
  def curated(spark: SparkSession, dir: String): DataFrame =
    Sources.documents(spark, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("lang")).as("lang"),
        min(col("source")).as("source"))
      .selectExpr(
        "doc_id", "lang", "source", "text",
        "size(split(text, ' ')) AS n_tokens",
        """size(array_distinct(split(text, ' ')))
          | / CAST(size(split(text, ' ')) AS DOUBLE) AS diversity""".stripMargin)
      .filter(col("n_tokens") >= MinTokens &&
        col("diversity") >= expr(MinDiversity))
      .drop("diversity")

  /** Gate view of [[curated]] (text projected away — the hash gate needs
    * the verdict set, not 500 full documents in the artifact). */
  def curatedOracle: String =
    s"""WITH kept AS (
       |  SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang,
       |    MIN(source) AS source, text
       |  FROM documents GROUP BY text),
       |scored AS (
       |  SELECT doc_id, lang, source,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(list_distinct(string_split(text, ' ')))
       |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS diversity
       |  FROM kept)
       |SELECT doc_id, lang, source, n_tokens FROM scored
       |WHERE n_tokens >= $MinTokens AND diversity >= $MinDiversity""".stripMargin

  def oracle: String =
    s"""WITH kept AS (
       |  SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang, text
       |  FROM documents GROUP BY text),
       |scored AS (
       |  SELECT doc_id, lang,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(list_distinct(string_split(text, ' ')))
       |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS diversity
       |  FROM kept)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  MIN(doc_id) AS first_doc_id
       |FROM scored
       |WHERE n_tokens >= $MinTokens AND diversity >= $MinDiversity
       |GROUP BY 1""".stripMargin
}
