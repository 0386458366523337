package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources

/** DSIR-style data selection: score every raw document by how much its
  * hashed n-gram feature distribution looks like a TARGET corpus
  * (public design: Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023).  The published estimator
  * hashes features into B buckets, fits bucket multinomials p (target)
  * and q (raw) with add-one smoothing, and ranks documents by an
  * importance weight aggregated over their tokens; high-weight raw
  * documents are the ones worth keeping when the training mixture
  * should drift toward the target domain.
  *
  * Determinism: the paper's log(p/q) sum needs libm `log`, which is not
  * bit-reproducible across engines — this implementation ranks by the
  * RATIO-LINEARIZED weight Σ_b c_d(b) · p(b)/q(b) instead, an order-
  * equivalent-in-spirit scoring computed as TWO SPLIT double ratios,
  * p(b)/q(b) = ((ct_b+1)/(cr_b+1)) · ((N+B)/(T+B)): each factor is a
  * BIGINT-exact count (no BIGINT product anywhere, so nothing can
  * overflow below 2^63 total corpus tokens — the single num·den
  * product of the earlier formulation wrapped at a few billion), and
  * the divisions/products are IEEE-754 doubles in a FIXED evaluation
  * order, which every engine reproduces bit-for-bit; each term is
  * ROUNDed to 6 decimals and summed as DECIMAL — the engine's
  * per-term-round discipline, so the DuckDB oracle reproduces the
  * hash bit-for-bit.
  *
  * Scale shape: tokens collapse to (doc, bucket) counts in ONE exchange;
  * the bucket marginals, totals, and the B-row rate table all derive
  * from that small frame (B = 256 keys); scoring is a map-side join of
  * per-doc counts against the BROADCAST rate table; the final top-K is
  * TakeOrderedAndProject (per-partition heaps), never a global sort of
  * the corpus.  At 100 TB nothing here shuffles the corpus twice. */
object Importance {

  val Buckets = 256
  val TopK = 50
  val TargetLang = "en"

  /** Hashed-unigram bucket: md5-prefix BIGINT (cross-engine exact,
    * see [[Dedup.shingleHashSpark]]) mod B — non-negative. */
  private def bucketSpark(c: String): String =
    s"${Dedup.shingleHashSpark(c)} % $Buckets"
  private def bucketDuck(c: String): String =
    s"${Dedup.shingleHashDuck(c)} % $Buckets"

  def dsirOf(docs: DataFrame, targetLang: String = TargetLang,
      k: Int = TopK): DataFrame = {
    // OPTIMIZATION r14 (guide §2.3/§2.4): perDoc was referenced four
    // times (raw, target, totals, final scoring join) — four corpus
    // explodes.  It is now spread (input-skew no-op at scale), persisted
    // once, and the three bucket-level statistics fold into ONE
    // aggregate: raw LEFT JOIN tgt + fill(0) ≡ a conditional sum with 0
    // default, and the corpus totals re-aggregate the bucket sums
    // exactly (integers).  Output identical (oracle hash gate).
    val perDoc = graft.core.Sources.spread(docs, col("doc_id"))
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), col("lang"),
        expr(bucketSpark("word")).as("b"))
      .groupBy("doc_id", "lang", "b")
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byBucket = perDoc.groupBy("b")
      .agg(sum(col("c")).as("cr"),
        sum(when(col("lang") === targetLang, col("c")).otherwise(lit(0L)))
          .as("ct"))
    val totals = byBucket.agg(sum(col("cr")).as("n_raw"),
      sum(col("ct")).as("n_tgt"))
    // Two SPLIT double ratios instead of one BIGINT num/den pair:
    // (ct+1)*(n_raw+B) overflows BIGINT once corpus token counts reach
    // a few billion (n_tgt*n_raw ~ 2^63).  Each factor below stays
    // BIGINT-exact; the divisions and products are IEEE-754 doubles
    // evaluated in a FIXED order, which both engines reproduce
    // bit-for-bit, so the hash gate still holds — and nothing can
    // overflow below 2^63 TOTAL corpus tokens (≫ 100 TB of text).
    val rates = byBucket
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (expr("CAST(ct + 1 AS DOUBLE)") / expr("CAST(cr + 1 AS DOUBLE)"))
          .as("r_bucket"),
        (expr(s"CAST(n_raw + $Buckets AS DOUBLE)") /
          expr(s"CAST(n_tgt + $Buckets AS DOUBLE)")).as("r_corpus"))
    perDoc.join(broadcast(rates), Seq("b"))
      .withColumn("term", expr(
        "CAST(ROUND(CAST(c AS DOUBLE) * r_bucket * r_corpus, 6) " +
          "AS DECIMAL(18,6))"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("term")).as("importance"))
      .orderBy(col("importance").desc, col("doc_id").asc)
      .limit(k)
  }

  def dsir(spark: SparkSession, dir: String): DataFrame =
    dsirOf(Sources.documents(spark, dir))

  def dsirOracle(targetLang: String = TargetLang,
      k: Int = TopK): String =
    s"""WITH w AS (
       |  SELECT doc_id, lang, ${bucketDuck("word")} AS b
       |  FROM (SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS word
       |        FROM documents)),
       |per_doc AS (
       |  SELECT doc_id, lang, b, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM w GROUP BY 1, 2, 3),
       |raw AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cr FROM per_doc
       |        GROUP BY 1),
       |tgt AS (SELECT b, CAST(SUM(c) AS BIGINT) AS ct FROM per_doc
       |        WHERE lang = '$targetLang' GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_raw,
       |               CAST(SUM(CASE WHEN lang = '$targetLang' THEN c
       |                             ELSE 0 END) AS BIGINT) AS n_tgt
       |        FROM per_doc),
       |rates AS (
       |  SELECT raw.b,
       |    CAST(COALESCE(ct, 0) + 1 AS DOUBLE) / CAST(cr + 1 AS DOUBLE)
       |      AS r_bucket,
       |    CAST(n_raw + $Buckets AS DOUBLE) / CAST(n_tgt + $Buckets AS DOUBLE)
       |      AS r_corpus
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot)
       |SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |  SUM(CAST(ROUND(CAST(c AS DOUBLE) * r_bucket * r_corpus, 6)
       |           AS DECIMAL(18,6))) AS importance
       |FROM per_doc JOIN rates USING (b)
       |GROUP BY 1, 2
       |ORDER BY importance DESC, doc_id ASC LIMIT $k""".stripMargin
}
