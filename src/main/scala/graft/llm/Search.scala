package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Sources

/** BM25 full-text retrieval (Robertson–Spärck Jones) — "score every
  * document for this multi-term query, return the top K" — the search
  * primitive over the corpus, completing the retrieval family next to
  * [[TextAnalysis.tfidf]] (per-doc characteristic terms) and the ANN
  * operators (embedding-space retrieval).
  *
  * Determinism contract (the tfidf/drift recipe, composed): the IDF is
  * the RATIONAL BM25 form (N − df + 0.5)/(df + 0.5) — exact operands,
  * no log — and the whole per-term score is ONE expression string
  * shared verbatim with the oracle (identical IEEE op sequence; avgdl
  * is a single division of exact integers).  Cross-term summation pins
  * each term to 9 dp and sums EXACTLY as DECIMAL(28,9) (the χ²-drift
  * money-sum convention), so the final ranking compares exact decimals
  * and the tie-break (score DESC, doc_id ASC) is total.
  *
  * Scale shape: ONE corpus scan feeds the explode, with the query-term
  * filter applied BEFORE the (doc, token) aggregate — posting lists for
  * the |q| query terms are all that ever shuffles — and the per-doc
  * length rides that aggregate as a MAX (constant per doc), so no
  * doc-keyed join with a lengths table exists.  Document frequencies
  * are a window over the already-aggregated posting rows ([[graft.ops
  * .Markov]]'s totals convention), corpus stats ride a 1-row broadcast,
  * and the top-K cut is TakeOrderedAndProject — per-partition heaps,
  * never a global sort.  A second, explode-free scan computes the
  * 2-integer corpus stats.  At 100 TB this is the standard sharded
  * inverted-index probe expressed declaratively.
  */
object Search {

  val QueryTerms = Seq("dup", "vector", "query")
  val TopK = 10

  /** k1 = 1.2, b = 0.75 (the canonical BM25 constants) baked into the
    * verbatim-shared term.  Needs columns: tf, df, len, n_docs, avgdl. */
  private val Bm25Term: String =
    "((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) " +
      "/ (CAST(df AS DOUBLE) + 0.5)) " +
      "* (CAST(tf AS DOUBLE) * (1.2 + 1.0)) " +
      "/ (CAST(tf AS DOUBLE) " +
      "+ 1.2 * (1.0 - 0.75 + 0.75 * CAST(len AS DOUBLE) / avgdl))"

  def bm25(spark: SparkSession, dir: String): DataFrame =
    bm25Of(Sources.documents(spark, dir))

  /** Core over a prepared (doc_id, text) corpus — spec-testable. */
  private[graft] def bm25Of(docs: DataFrame): DataFrame = {
    val stats = docs.agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_len"))
      .withColumn("avgdl",
        expr("CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)"))
    val postings = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("len"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isin(QueryTerms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
    val ranked = Window.orderBy(col("score").desc, col("doc_id").asc)
    postings.crossJoin(broadcast(stats))
      .withColumn("term", expr(Bm25Term))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_terms"),
        expr("CAST(SUM(CAST(ROUND(term, 9) AS DECIMAL(28,9))) " +
          "AS DECIMAL(38,9))").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(TopK)
      .withColumn("rnk", row_number().over(ranked).cast("int"))
      .select(col("rnk"), col("doc_id"), col("n_terms"), col("score"))
  }

  def bm25Oracle: String = {
    val q = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE) AS avgdl
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS len,
       |    UNNEST(string_split(text, ' ')) AS token
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, token, COUNT(*) AS tf, MAX(len) AS len
       |  FROM tok WHERE token IN ($q) GROUP BY 1, 2),
       |p AS (
       |  SELECT doc_id, token, tf, len,
       |    COUNT(*) OVER (PARTITION BY token) AS df
       |  FROM tf),
       |terms AS (
       |  SELECT doc_id, $Bm25Term AS term FROM p CROSS JOIN stats),
       |s AS (
       |  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_terms,
       |    CAST(SUM(CAST(ROUND(term, 9) AS DECIMAL(28,9)))
       |      AS DECIMAL(38,9)) AS score
       |  FROM terms GROUP BY 1),
       |r AS (
       |  SELECT doc_id, n_terms, score,
       |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
       |  FROM s)
       |SELECT CAST(rnk AS INT) AS rnk, doc_id, n_terms, score
       |FROM r WHERE rnk <= $TopK""".stripMargin
  }
}
