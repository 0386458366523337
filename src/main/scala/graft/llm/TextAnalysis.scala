package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Text-analysis operators over the documents table — language ID, quality
  * scoring, token counting, fingerprinting.  All pure per-row expressions
  * (codegen'd, no UDFs, no shuffle except a final exchange if the caller
  * aggregates), so at 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Marker tokens per language (derived from the synthetic corpus's
    * per-language token distributions). */
  val Markers: Seq[(String, String)] = Seq(
    "en" -> "the", "zh" -> "join", "es" -> "slow",
    "de" -> "customer", "fr" -> "scan")

  private def countTokSpark(t: String) =
    s"size(filter(split(text, ' '), x -> x = '$t'))"
  private def countTokDuck(t: String) =
    s"len(list_filter(string_split(text, ' '), x -> x = '$t'))"

  /** N-gram-heuristic language ID: argmax of marker-token counts with a
    * fixed precedence for ties.  The CASE ladder is identical in both
    * engines modulo the token-count spelling. */
  private def langIdExprs(cnt: String => String): (Seq[String], String) = {
    val cols = Markers.map { case (lang, tok) => s"${cnt(tok)} AS c_$lang" }
    val all = Markers.map { case (lang, _) => s"c_$lang" }.mkString(", ")
    val ladder = "CASE " + Markers.map { case (lang, _) =>
      s"WHEN c_$lang >= GREATEST($all) THEN '$lang'"
    }.mkString(" ") + " ELSE 'und' END"
    (cols, ladder)
  }

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val (cols, ladder) = langIdExprs(countTokSpark)
    Sources.documents(spark, dir)
      .selectExpr(Seq("doc_id", "lang") ++ cols: _*)
      .withColumn("predicted_lang", expr(ladder))
      .withColumn("agrees", col("predicted_lang") === col("lang"))
  }

  val langIdOracle: String = {
    val (cols, ladder) = langIdExprs(countTokDuck)
    s"""SELECT doc_id, lang, ${Markers.map(m => s"c_${m._1}").mkString(", ")},
       |  $ladder AS predicted_lang,
       |  ($ladder) = lang AS agrees
       |FROM (SELECT doc_id, lang, ${cols.mkString(", ")} FROM documents) t""".stripMargin
  }

  /** Quality scoring: length, token stats, stopword/punctuation ratios.
    * Ratios are per-row IEEE double divisions — deterministic across
    * engines. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    Sources.documents(spark, dir).selectExpr(
      "doc_id",
      "length(text) AS n_chars_actual",
      "size(split(text, ' ')) AS n_tokens",
      "size(array_distinct(split(text, ' '))) AS n_unique_tokens",
      "length(text) / CAST(size(split(text, ' ')) AS DOUBLE) AS avg_token_span",
      """size(filter(split(text, ' '),
        | x -> x IN ('the', 'and', 'of', 'a', 'to'))) AS n_stopwords""".stripMargin,
      "size(regexp_extract_all(text, '[.!?,;:]', 0)) AS n_punct",
      """size(array_distinct(split(text, ' ')))
        | / CAST(size(split(text, ' ')) AS DOUBLE) AS lexical_diversity""".stripMargin)

  val qualityOracle: String =
    """SELECT doc_id,
      |  length(text) AS n_chars_actual,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
      |  length(text) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_span,
      |  len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the', 'and', 'of', 'a', 'to'))) AS n_stopwords,
      |  len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
      |  len(list_distinct(string_split(text, ' ')))
      |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS lexical_diversity
      |FROM documents""".stripMargin

  /** Token counting: whitespace tokens plus a BPE-ish regex segmentation
    * (letter runs, digit runs, single non-alphanumerics). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Sources.documents(spark, dir).selectExpr(
      "doc_id",
      "size(split(text, ' ')) AS ws_tokens",
      """size(regexp_extract_all(lower(text),
        | '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS bpe_ish_tokens""".stripMargin)

  val tokenCountOracle: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens
      |FROM documents""".stripMargin

  /** Tokenizer fertility per language — the budgeting numbers a
    * pretraining run reads before fixing a context length: characters
    * per whitespace token, characters per BPE-ish token (the
    * [[tokenCount]] regex tokenizer), and BPE-ish tokens per whitespace
    * word (fertility proper: how many subword pieces an average word
    * splits into, the metric that differs wildly across languages and
    * drives per-language token budgets).
    *
    * All numerators/denominators are exact BIGINT corpus totals
    * (map-side combine, one exchange to ≤ #langs rows); each ratio is a
    * single shared ROUND-6 IEEE division. */
  def fertility(spark: SparkSession, dir: String): DataFrame =
    Sources.documents(spark, dir)
      .selectExpr("lang", "CAST(length(text) AS BIGINT) AS chars",
        "CAST(size(split(text, ' ')) AS BIGINT) AS ws",
        """CAST(size(regexp_extract_all(lower(text),
          | '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS BIGINT) AS bpe"""
          .stripMargin)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("chars")).as("n_chars"),
        sum(col("ws")).as("n_ws_tokens"), sum(col("bpe")).as("n_bpe_tokens"))
      .selectExpr("lang", "n_docs", "n_chars", "n_ws_tokens", "n_bpe_tokens",
        "ROUND(n_chars / CAST(NULLIF(n_ws_tokens, 0) AS DOUBLE), 6)" +
          " AS chars_per_word",
        "ROUND(n_chars / CAST(NULLIF(n_bpe_tokens, 0) AS DOUBLE), 6)" +
          " AS chars_per_token",
        "ROUND(n_bpe_tokens / CAST(NULLIF(n_ws_tokens, 0) AS DOUBLE), 6)" +
          " AS fertility")

  val fertilityOracle: String =
    """WITH d AS (
      |  SELECT lang, CAST(length(text) AS BIGINT) AS chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
      |    CAST(len(regexp_extract_all(lower(text),
      |      '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe
      |  FROM documents),
      |m AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(chars) AS BIGINT) AS n_chars,
      |    CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
      |    CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens
      |  FROM d GROUP BY 1)
      |SELECT lang, n_docs, n_chars, n_ws_tokens, n_bpe_tokens,
      |  ROUND(n_chars / CAST(NULLIF(n_ws_tokens, 0) AS DOUBLE), 6)
      |    AS chars_per_word,
      |  ROUND(n_chars / CAST(NULLIF(n_bpe_tokens, 0) AS DOUBLE), 6)
      |    AS chars_per_token,
      |  ROUND(n_bpe_tokens / CAST(NULLIF(n_ws_tokens, 0) AS DOUBLE), 6)
      |    AS fertility
      |FROM m""".stripMargin

  /** Token burstiness over the vocabulary head: corpus frequency vs
    * document frequency per word — burstiness cf/df is the average
    * number of occurrences in a document that contains the word at all
    * (Church & Gale's observation: content words are "bursty", function
    * words are spread evenly), and df_share is the fraction of documents
    * touched.  A content word ranking high on burstiness but low on
    * df_share is topical; a high-df low-burstiness word is a stopword —
    * the split a stopword-list builder actually wants measured, not
    * assumed.
    *
    * Scale: one explode into a word-keyed aggregate (cf and df in the
    * same pass — df is a COUNT(DISTINCT doc_id) whose partial
    * aggregation Spark plans as the standard two-phase distinct); the
    * (cf DESC, word ASC) top-K cut and rank window run over K rows, and
    * the 1-row doc total broadcasts for the share. */
  def burstiness(spark: SparkSession, dir: String, k: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Sources.documents(spark, dir)
    val total = docs.agg(countDistinct(col("doc_id")).as("total_docs"))
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cf"), countDistinct(col("doc_id")).as("df"))
    val w = Window.orderBy(col("cf").desc, col("word").asc)
    counts.orderBy(col("cf").desc, col("word").asc).limit(k)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .selectExpr("rank", "word", "cf", "df",
        "ROUND(cf / CAST(df AS DOUBLE), 6) AS burstiness",
        "ROUND(df / CAST(total_docs AS DOUBLE), 6) AS df_share")
  }

  def burstinessOracle(k: Int = 30): String =
    s"""WITH tot AS (
       |  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS total_docs
       |  FROM documents),
       |wrd AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
       |  FROM documents),
       |c AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cf,
       |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM wrd GROUP BY 1),
       |top AS (SELECT word, cf, df FROM c
       |        ORDER BY cf DESC, word ASC LIMIT $k)
       |SELECT
       |  CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, word ASC) AS INT)
       |    AS "rank",
       |  word, cf, df,
       |  ROUND(cf / CAST(df AS DOUBLE), 6) AS burstiness,
       |  ROUND(df / CAST(tot.total_docs AS DOUBLE), 6) AS df_share
       |FROM top, tot""".stripMargin

  /** Document fingerprint: polynomial rolling hash over tokens, exact
    * 64-bit integer math (identical fold in both engines). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Sources.documents(spark, dir).selectExpr(
      "doc_id",
      """aggregate(
        |  transform(split(text, ' '), t -> CAST(ascii(t) * length(t) AS BIGINT)),
        |  CAST(0 AS BIGINT),
        |  (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint""".stripMargin)

  val fingerprintOracle: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ' '),
      |        t -> CAST(ascii(t) * length(t) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
      |FROM documents""".stripMargin

  /** Word-bigram list WITH multiplicity (unlike [[Dedup.ngramSetExpr]]'s
    * distinct sets — repetition measures need the duplicates).  A 1-token
    * document contributes its single token (the length-capped `slice`
    * convention).  This declarative form is the SPEC; the hot path runs
    * the codegen'd [[graft.functions.WordNgramShingles]] kernel's
    * multiplicity variant (`ngram_shingles(text, 2, false)`) — the
    * declarative lambda re-tokenizes the document for every shingle index,
    * O(tokens²) interpreted string work per doc, and dominated this
    * query's first benchmark read (WordNgramShinglesSpec asserts kernel ≡
    * spec element-for-element). */
  private[graft] val bigramsSpec =
    """transform(sequence(1, greatest(size(split(text, ' ')) - 1, 1)),
      |  i -> concat_ws(' ', slice(split(text, ' '), i, 2)))""".stripMargin

  private val bigramsDuck =
    """list_transform(
      |  generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
      |  j -> array_to_string(list_slice(string_split(text, ' '), j, j + 1), ' '))""".stripMargin

  /** Repetition metrics (the Gopher/C4 quality-filter family): how much of
    * a document is its most-repeated word bigram (`top_fraction`), and how
    * much sits in ANY repeated bigram (`dup_fraction`).  Degenerate
    * machine-generated or boilerplate text scores high on both and gets
    * filtered before training.
    *
    * Shape: explode → two-level aggregation, both with map-side partial
    * combine; all counts are exact integers and the two fractions are
    * single IEEE divisions — deterministic across engines.  At 100 TB this
    * is the same scan-plus-agg shape as [[quality]], keyed by doc_id. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.WordNgramShingles.register(spark)
    Sources.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr("ngram_shingles(text, 2, false)")).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("distinct_bigrams"),
        sum(col("cnt")).as("n_bigrams"),
        max(col("cnt")).as("top_count"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L)))
          .as("dup_bigram_tokens"))
      .withColumn("top_fraction",
        col("top_count") / col("n_bigrams").cast("double"))
      .withColumn("dup_fraction",
        col("dup_bigram_tokens") / col("n_bigrams").cast("double"))
  }

  /** Context-window chunking: split each document into token windows of
    * `size` at stride `stride` (overlap = size − stride) — the standard
    * prep for fixed-context pretraining and retrieval indexing.  Chunk
    * starts are `j·stride + 1` for j = 0 .. ⌊(tokens−1)/stride⌋, each
    * chunk length-capped at the document end (the `slice` convention), so
    * every token lands in ≥1 chunk and boundaries are a pure function of
    * the token count — reproducible across engines and partitionings.
    *
    * Per-row explode with no shuffle at all: chunking fuses into the scan
    * and the output is written partition-local.  The lambda re-slices the
    * token list per chunk (O(chunks · size) string work); chunks per doc
    * is small by construction (tokens/stride), so unlike the per-shingle
    * escalations this stays cheap — measured, not assumed. */
  def chunks(spark: SparkSession, dir: String,
      size: Int = 64, stride: Int = 48): DataFrame =
    Sources.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, (greatest(size(split(text, ' ')) - 1, 0)) div $stride),
             |  j -> concat_ws(' ', slice(split(text, ' '),
             |                 CAST(j * $stride + 1 AS INT), $size)))""".stripMargin)))
      .select(col("doc_id"), col("lang"), col("pos").cast("int").as("chunk_id"),
        col("col").as("chunk_text"))
      .withColumn("chunk_tokens", expr("size(split(chunk_text, ' '))"))

  def chunksOracle(size: Int = 64, stride: Int = 48): String =
    s"""SELECT doc_id, lang, CAST(u.j AS INT) AS chunk_id,
       |  u.t AS chunk_text,
       |  len(string_split(u.t, ' ')) AS chunk_tokens
       |FROM (
       |  SELECT doc_id, lang,
       |    UNNEST(list_transform(
       |      generate_series(0, (greatest(len(string_split(text, ' ')) - 1, 0)) // $stride),
       |      j -> {'j': j, 't': array_to_string(list_slice(string_split(text, ' '),
       |                        j * $stride + 1, j * $stride + $size), ' ')})) AS u
       |  FROM documents) x""".stripMargin

  /** DuckDB mirror of [[repetition]] (SUM(BIGINT) widens to HUGEINT there,
    * so every sum is cast back — the [[Sampling]] driver-gate rule). */
  val repetitionOracle: String =
    s"""WITH bg AS (
       |  SELECT doc_id, UNNEST($bigramsDuck) AS bigram FROM documents),
       |c AS (SELECT doc_id, bigram, COUNT(*) AS cnt FROM bg GROUP BY 1, 2)
       |SELECT doc_id,
       |  COUNT(*) AS distinct_bigrams,
       |  CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       |  MAX(cnt) AS top_count,
       |  CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
       |    AS dup_bigram_tokens,
       |  MAX(cnt) / CAST(SUM(cnt) AS DOUBLE) AS top_fraction,
       |  CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
       |    / CAST(SUM(cnt) AS DOUBLE) AS dup_fraction
       |FROM c GROUP BY doc_id""".stripMargin

  /** PII redaction patterns, applied in order — RE2-compatible (no
    * lookaround, no backreferences) so Spark's Java regex and DuckDB's RE2
    * find the exact same matches.  Emails go first (their local part may
    * contain digits), then phone-shaped runs (≥8 chars of digits and
    * separators), then bare digit runs; the replacement tokens contain no
    * digits, so later patterns never re-match inside an earlier
    * redaction.  The synthetic corpus only carries digit runs — the
    * email/phone paths are proven on literals in TextAnalysisSpec, the
    * digit path cross-engine by the driver gate. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?[0-9][0-9() -]{6,}[0-9]" -> "<PHONE>",
    "[0-9]+" -> "<NUM>")

  /** The full redaction chain as a single codegen'd column expression —
    * scan speed, no UDF. */
  def redactPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    PiiPatterns.foldLeft(c) { case (acc, (pat, tok)) =>
      regexp_replace(acc, pat, tok)
    }

  /** PII scrub over the events props payload (the corpus's only
    * digit-bearing free text): redacted text plus the redaction count —
    * the audit column a compliance pipeline wants next to the scrub. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .select(col("event_id"), col("props"),
        redactPii(col("props")).as("props_redacted"),
        size(expr("regexp_extract_all(props, '[0-9]+', 0)"))
          .cast("int").as("n_redacted"))

  val piiRedactOracle: String = {
    val chain = PiiPatterns.foldLeft("props") { case (acc, (pat, tok)) =>
      s"regexp_replace($acc, '$pat', '$tok', 'g')"
    }
    s"""SELECT event_id, props, $chain AS props_redacted,
       |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT)
       |    AS n_redacted
       |FROM events""".stripMargin
  }

  /** Per-document characteristic terms: TF × BM25-style IDF with a
    * per-doc top-K cut — the keyword/topic-surfacing operator of a corpus
    * triage pipeline (and the relevance kernel retrieval stacks rank
    * with).  IDF is the RATIONAL BM25 form `(N − df + 0.5)/(df + 0.5)`
    * rather than its logarithm: every operand is an exactly-representable
    * double (integer counts ± 0.5) and the score is then two
    * correctly-rounded IEEE ops (one divide, one multiply), so the
    * doubles hash-match DuckDB bit-for-bit — a `ln()` would hostage the
    * gate to libm rounding differences for zero analytical content
    * (log is monotone: the per-doc ranking is IDENTICAL either way).
    *
    * Scale shape: explode → (doc, token) hash agg with map-side partials
    * (the corpus-heavy stage, one shuffle keyed by doc⊗token); df is a
    * second vocabulary-sized agg off the tf rows (never re-reads the
    * corpus); N rides in as a 1-row broadcast; the top-K window
    * partitions BY DOCUMENT, so each task ranks ~distinct-tokens-per-doc
    * rows — no global sort anywhere.  Ties break on (score DESC, token
    * ASC), a total order, so the cut is deterministic cross-engine. */
  /** Token-distribution drift per corpus slice: the χ² statistic of each
    * source's token distribution against the corpus-wide distribution —
    * the data-drift monitor a production ingest runs per batch/domain
    * (a source whose token mix diverges from the corpus flags crawler
    * rot, template spam, or a language shift).  χ² instead of KL: every
    * per-token term is `(p−q)²/q` — subtract/multiply/divide on exact
    * integer-derived doubles, each a single correctly-rounded IEEE op —
    * where KL's `ln` would hostage the cross-engine gate to libm ULP
    * differences.  The cross-token SUM is order-dependent in doubles, so
    * each term pins to 9 decimals and sums EXACTLY as DECIMAL(28,9) (the
    * [[graft.core.Frag]] money-sum convention; the 1e-9 quantization is
    * noise against the statistic's scale).
    *
    * Scale shape: one explode → (source, token) hash agg, a token-keyed
    * corpus agg off those rows, a broadcast join of the vocabulary-sized
    * corpus distribution, one final per-source agg — the corpus is read
    * once and never re-shuffled. */
  def drift(spark: SparkSession, dir: String): DataFrame = {
    val bySrc = Sources.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c_st"))
    val corpus = bySrc.groupBy(col("token"))
      .agg(sum(col("c_st")).as("c_t"))
    val totals = bySrc.groupBy(col("source"))
      .agg(sum(col("c_st")).as("t_s"))
    val grand = corpus.agg(sum(col("c_t")).as("t"))
    bySrc
      .join(broadcast(corpus), Seq("token"))
      .join(broadcast(totals), Seq("source"))
      .crossJoin(broadcast(grand))
      .withColumn("term", expr(DriftTerm))
      .groupBy(col("source"))
      .agg(max(col("t_s")).as("n_tokens"),
        expr("CAST(SUM(CAST(ROUND(term, 9) AS DECIMAL(28,9))) AS DECIMAL(38,9))")
          .as("chi2"))
  }

  /** The per-token χ² term — shared VERBATIM with the oracle so the IEEE
    * op sequence is identical on both engines. */
  private val DriftTerm: String =
    "(CAST(c_st AS DOUBLE) / CAST(t_s AS DOUBLE) " +
      "- CAST(c_t AS DOUBLE) / CAST(t AS DOUBLE)) " +
      "* (CAST(c_st AS DOUBLE) / CAST(t_s AS DOUBLE) " +
      "- CAST(c_t AS DOUBLE) / CAST(t AS DOUBLE)) " +
      "/ (CAST(c_t AS DOUBLE) / CAST(t AS DOUBLE))"

  def driftOracle: String =
    s"""WITH w AS (
       |  SELECT source, UNNEST(string_split(text, ' ')) AS token
       |  FROM documents),
       |b AS (SELECT source, token, COUNT(*) AS c_st FROM w GROUP BY 1, 2),
       |c AS (SELECT token, CAST(SUM(c_st) AS BIGINT) AS c_t FROM b GROUP BY 1),
       |s AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s FROM b GROUP BY 1),
       |g AS (SELECT CAST(SUM(c_t) AS BIGINT) AS t FROM c),
       |terms AS (
       |  SELECT b.source, s.t_s, $DriftTerm AS term
       |  FROM b JOIN c USING (token) JOIN s USING (source), g)
       |SELECT source, MAX(t_s) AS n_tokens,
       |  CAST(SUM(CAST(ROUND(term, 9) AS DECIMAL(28,9))) AS DECIMAL(38,9))
       |    AS chi2
       |FROM terms GROUP BY 1""".stripMargin

  /** Per-document n-gram novelty — what share of a document's distinct
    * bigrams appears in NO other document.  The inter-document
    * data-curation signal completing the family: [[repetition]] scores
    * WITHIN-doc redundancy, [[graft.llm.Dedup]] decontamination scores
    * against a held-out set, and this scores against the REST OF THE
    * CORPUS — low novelty = boilerplate/template text, high = unique
    * content worth keeping.  Duplicated documents drive each other's
    * novelty to exactly zero (spec-pinned).
    *
    * Scale: one explode through the shared codegen'd shingle kernel
    * into a distinct (doc, bigram) aggregate; the document frequency is
    * a window over those AGGREGATED rows keyed by bigram (the
    * [[graft.ops.Markov]] totals convention — vocabulary-sized, never
    * corpus-sized, and never a broadcast of the bigram vocabulary); the
    * per-doc rollup and one ROUND-6 division finish it.  Two exchanges
    * total. */
  def novelty(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.WordNgramShingles.register(spark)
    noveltyOf(Sources.documents(spark, dir))
  }

  /** Core over a prepared (doc_id, text) corpus — spec-testable; caller
    * registers [[graft.functions.WordNgramShingles]]. */
  private[graft] def noveltyOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs
      .select(col("doc_id"),
        explode(expr("ngram_shingles(text, 2, false)")).as("bigram"))
      .filter(expr("size(split(bigram, ' ')) = 2")) // drop 1-token docs
      .distinct()
    d.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("bigram"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty", round(
        col("n_unique").cast("double") / col("n_bigrams").cast("double"), 6))
  }

  val noveltyOracle: String =
    """WITH bg AS (
      |  SELECT doc_id, UNNEST(list_transform(
      |    generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
      |    j -> array_to_string(list_slice(string_split(text, ' '), j, j + 1),
      |                         ' '))) AS bigram
      |  FROM documents),
      |d AS (
      |  SELECT DISTINCT doc_id, bigram FROM bg
      |  WHERE len(string_split(bigram, ' ')) = 2),
      |w AS (
      |  SELECT doc_id, COUNT(*) OVER (PARTITION BY bigram) AS df FROM d)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(COUNT(CASE WHEN df = 1 THEN 1 END) AS BIGINT) AS n_unique,
      |  ROUND(CAST(COUNT(CASE WHEN df = 1 THEN 1 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
      |FROM w GROUP BY 1""".stripMargin

  def tfidf(spark: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Sources.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = Sources.documents(spark, dir)
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
          / (col("df").cast("double") + lit(0.5)))
      .withColumn("score", col("tf").cast("double") * col("idf"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("rnk"), col("token"), col("tf"),
        col("df"), col("score"))
  }

  def tfidfOracle(topK: Int = 5): String =
    s"""WITH t AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
       |  FROM documents),
       |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |s AS (
       |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
       |    CAST(tf AS DOUBLE) *
       |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |        / (CAST(df AS DOUBLE) + 0.5)) AS score
       |  FROM tf JOIN df USING (token), n),
       |r AS (
       |  SELECT doc_id, token, tf, df, score,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |                       ORDER BY score DESC, token ASC) AS rnk
       |  FROM s)
       |SELECT doc_id, CAST(rnk AS INT) AS rnk, token, tf, df, score
       |FROM r WHERE rnk <= $topK""".stripMargin

  /** RAKE keyphrase extraction (Rose et al. 2010) — per-document top-K
    * candidate phrases, the multi-word complement to [[tfidf]]'s
    * single-token characteristic terms: candidate phrases are maximal
    * stopword-free token runs (gaps-and-islands on a running stopword
    * count — the [[graft.streaming.EventsStream]] sessionize shape
    * applied to token positions), each word scores deg/freq within its
    * document (deg = Σ length of the phrases its occurrences sit in),
    * and a phrase scores the sum of its words' scores.
    *
    * Gate determinism: word scores are 9-dp-rounded DECIMALs and phrase
    * scores their EXACT decimal sums (the χ²/BM25 convention), so the
    * (score DESC, phrase, phrase_id) ranking is a total order both
    * engines sort identically; the stopword list is the engine-wide
    * five-word set [[quality]] counts, shared verbatim.
    *
    * Scale: one corpus explode and ONE doc_id exchange end to end —
    * r15 (guide §2.4, r14 verdict #5): the phrase-length, word-score,
    * and phrase-score passes were three groupBy+join round trips over a
    * localCheckpointed token frame (the checkpoint erased the window's
    * doc_id partitioning, so every consumer re-exchanged the token
    * stream — ~6 token-volume exchanges); they are now windows over
    * doc_id-PREFIXED keys ((doc_id, phrase_id), (doc_id, word)), each of
    * which ClusteredDistribution-satisfies on the doc_id hash the
    * stopword-run window already established, so the whole chain is
    * intra-partition sorts after a single exchange.  Per-document state
    * only, no global structure anywhere. */
  def rake(spark: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stops = "'the', 'and', 'of', 'a', 'to'"
    val runW = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPhrase = Window.partitionBy(col("doc_id"), col("phrase_id"))
    val wWord = Window.partitionBy(col("doc_id"), col("word"))
    val scored = Sources.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .withColumn("is_stop", expr(s"word IN ($stops)"))
      .withColumn("phrase_id", sum(col("is_stop").cast("int")).over(runW))
      .filter(!col("is_stop"))
      .select(col("doc_id"), col("phrase_id"), col("pos"), col("word"))
      // deg = Σ plen over a word's occurrences; the old join attached
      // plen by the UNIQUE (doc_id, phrase_id) key (no fan-out), so the
      // window spelling sums the identical row set.
      .withColumn("plen", count(lit(1)).over(wPhrase))
      .withColumn("freq", count(lit(1)).over(wWord))
      .withColumn("deg", sum(col("plen")).over(wWord))
      .withColumn("wscore", expr(
        "CAST(ROUND(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE), 9) " +
          "AS DECIMAL(28,9))"))
    // Phrase score = exact decimal Σ of the member occurrences' word
    // scores (order-free), phrase text from the pos-sorted members —
    // one aggregate replaces the old score-groupBy + phrases join.
    val phraseScores = scored.groupBy(col("doc_id"), col("phrase_id"))
      .agg(count(lit(1)).as("plen"),
        expr("array_join(transform(array_sort(collect_list(" +
          "struct(pos, word))), s -> s.word), ' ')").as("phrase"),
        expr("CAST(SUM(wscore) AS DECIMAL(38,9))").as("score"))
    val rankW = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("phrase").asc, col("phrase_id").asc)
    phraseScores.withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("rnk").cast("int").as("rnk"),
        col("phrase"), col("plen"), col("score"))
  }

  def rakeOracle(topK: Int = 3): String =
    s"""WITH toks AS (
       |  SELECT doc_id, j AS pos, string_split(text, ' ')[j] AS word
       |  FROM documents,
       |    UNNEST(generate_series(1, len(string_split(text, ' ')))) AS t(j)),
       |m AS (
       |  SELECT doc_id, pos, word,
       |    word IN ('the', 'and', 'of', 'a', 'to') AS is_stop,
       |    SUM(CASE WHEN word IN ('the', 'and', 'of', 'a', 'to')
       |             THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS UNBOUNDED PRECEDING) AS phrase_id
       |  FROM toks),
       |w AS (SELECT doc_id, phrase_id, pos, word FROM m WHERE NOT is_stop),
       |ph AS (
       |  SELECT doc_id, phrase_id, CAST(COUNT(*) AS BIGINT) AS plen,
       |    STRING_AGG(word, ' ' ORDER BY pos) AS phrase
       |  FROM w GROUP BY 1, 2),
       |ws AS (
       |  SELECT w.doc_id, w.word,
       |    CAST(ROUND(CAST(SUM(ph.plen) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 9) AS DECIMAL(28,9)) AS wscore
       |  FROM w JOIN ph USING (doc_id, phrase_id) GROUP BY 1, 2),
       |ps AS (
       |  SELECT w.doc_id, w.phrase_id,
       |    CAST(SUM(ws.wscore) AS DECIMAL(38,9)) AS score
       |  FROM w JOIN ws ON w.doc_id = ws.doc_id AND w.word = ws.word
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT ps.doc_id, ph.phrase, ph.plen, ps.score,
       |    ROW_NUMBER() OVER (PARTITION BY ps.doc_id
       |                       ORDER BY ps.score DESC, ph.phrase ASC,
       |                                ps.phrase_id ASC) AS rnk
       |  FROM ps JOIN ph ON ps.doc_id = ph.doc_id
       |                 AND ps.phrase_id = ph.phrase_id)
       |SELECT doc_id, CAST(rnk AS INT) AS rnk, phrase, plen, score
       |FROM r WHERE rnk <= $topK""".stripMargin

  /** Flesch–Kincaid-style readability grade per document — the classic
    * surface-form difficulty signal curation pipelines band on (too-easy
    * boilerplate vs impenetrable noise both correlate with low training
    * value).  Sentences are sentence-ending punctuation runs, syllables
    * the standard vowel-group approximation; both floored at 1 so
    * degenerate texts (no punctuation, empty string) stay finite.
    *
    * Determinism: counts are exact integers, the grade is the published
    * constant formula over TWO single IEEE divisions, written
    * identically in both dialects, then ROUND-4 — no libm
    * transcendentals.  Pure per-row projection: fuses into the scan,
    * shuffles nothing at any corpus size. */
  def readability(spark: SparkSession, dir: String): DataFrame =
    readabilityOf(Sources.documents(spark, dir))

  private[graft] def readabilityOf(docs: DataFrame): DataFrame = docs
    .selectExpr(
      "doc_id", "lang",
      "size(split(text, ' ')) AS n_words",
      "greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1) AS n_sentences",
      """greatest(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)), 1)
        | AS n_syllables""".stripMargin)
    .withColumn("words_per_sentence",
      expr("ROUND(n_words / CAST(n_sentences AS DOUBLE), 4)"))
    .withColumn("syllables_per_word",
      expr("ROUND(n_syllables / CAST(greatest(n_words, 1) AS DOUBLE), 4)"))
    .withColumn("fk_grade", expr(
      """ROUND(0.39 * (n_words / CAST(n_sentences AS DOUBLE))
        | + 11.8 * (n_syllables / CAST(greatest(n_words, 1) AS DOUBLE))
        | - 15.59, 4)""".stripMargin))
    .withColumn("band", expr(ReadabilityBandCase))

  private val ReadabilityBandCase =
    """CASE WHEN fk_grade < 6 THEN 'easy'
      |     WHEN fk_grade < 12 THEN 'standard'
      |     ELSE 'dense' END""".stripMargin

  val readabilityOracle: String =
    s"""WITH c AS (
       |  SELECT doc_id, lang,
       |    len(string_split(text, ' ')) AS n_words,
       |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
       |      AS n_sentences,
       |    greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
       |      AS n_syllables
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, lang, n_words, n_sentences, n_syllables,
       |    ROUND(n_words / CAST(n_sentences AS DOUBLE), 4)
       |      AS words_per_sentence,
       |    ROUND(n_syllables / CAST(greatest(n_words, 1) AS DOUBLE), 4)
       |      AS syllables_per_word,
       |    ROUND(0.39 * (n_words / CAST(n_sentences AS DOUBLE))
       |      + 11.8 * (n_syllables / CAST(greatest(n_words, 1) AS DOUBLE))
       |      - 15.59, 4) AS fk_grade
       |  FROM c)
       |SELECT doc_id, lang, n_words, n_sentences, n_syllables,
       |  words_per_sentence, syllables_per_word, fk_grade,
       |  $ReadabilityBandCase AS band
       |FROM g""".stripMargin

  /** Lexical-diversity profile per document: type count, type–token
    * ratio, Guiraud's root-TTR (the length-robust variant), and Yule's K
    * (`10⁴·(Σm² − N)/N²` over the per-type multiplicities m) — the
    * vocabulary-richness trio quality filters use to separate natural
    * prose from keyword stuffing and template spam.  TTR alone shrinks
    * with document length; Guiraud divides by √N, and Yule's K is
    * length-invariant and built from EXACT integers (Σm², N), so the
    * only doubles are single divisions and a correctly-rounded sqrt.
    *
    * Scale: one (doc_id, token) exchange with map-side combine into the
    * per-type multiplicities, then a per-doc rollup whose exchange
    * carries only the already-combined per-type rows (far smaller than
    * the corpus) — the [[tfidf]] shape without the vocabulary window. */
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    lexicalDiversityOf(Sources.documents(spark, dir))

  private[graft] def lexicalDiversityOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    .groupBy(col("doc_id"), col("tok"))
    .agg(count(lit(1)).as("m"))
    .groupBy(col("doc_id"))
    .agg(sum(col("m")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(col("m") * col("m")).as("sum_m2"))
    .select(col("doc_id"), col("n_tokens"), col("n_types"), col("sum_m2"),
      expr("ROUND(n_types / CAST(n_tokens AS DOUBLE), 6)").as("ttr"),
      expr("ROUND(n_types / SQRT(CAST(n_tokens AS DOUBLE)), 6)")
        .as("guiraud"),
      expr("""ROUND(10000.0 * CAST(sum_m2 - n_tokens AS DOUBLE)
        | / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6)"""
        .stripMargin).as("yule_k"))

  val lexicalDiversityOracle: String =
    """WITH m AS (
      |  SELECT doc_id, tok, COUNT(*) AS m
      |  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
      |        FROM documents) t
      |  GROUP BY 1, 2),
      |d AS (
      |  SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_types,
      |    CAST(SUM(m * m) AS BIGINT) AS sum_m2
      |  FROM m GROUP BY 1)
      |SELECT doc_id, n_tokens, n_types, sum_m2,
      |  ROUND(n_types / CAST(n_tokens AS DOUBLE), 6) AS ttr,
      |  ROUND(n_types / SQRT(CAST(n_tokens AS DOUBLE)), 6) AS guiraud,
      |  ROUND(10000.0 * CAST(sum_m2 - n_tokens AS DOUBLE)
      |    / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6)
      |    AS yule_k
      |FROM d""".stripMargin

  /** fastText-style hashed linear quality classifier — the GPT-3/CCNet
    * curation move: score = Σ w(token) over hashed bag-of-words features
    * with a FIXED weight table, threshold at 0.  Here the weight table is
    * the hash itself mapped to an integer milli-weight in [-1000, 1000]
    * (`(md5₆₀(token) mod 2001) − 1000` — a deterministic stand-in with
    * the real model's exact execution shape: per-token hash → weight
    * lookup → integer accumulation), so the logit is an EXACT BIGINT and
    * the verdict/mean are cross-engine reproducible.  Swapping in trained
    * weights = replacing the modular map with a broadcast lookup; the
    * plan shape does not change.
    *
    * Scale: the whole classifier is one `aggregate(transform(...))`
    * higher-order expression — scan-fused, zero shuffle, no UDF; at
    * 100 TB it runs at parquet-read speed. */
  def linearQualityScore(spark: SparkSession, dir: String): DataFrame =
    linearQualityScoreOf(Sources.documents(spark, dir))

  private[graft] def linearQualityScoreOf(docs: DataFrame): DataFrame = docs
    .selectExpr(
      "doc_id", "lang",
      "size(split(text, ' ')) AS n_tokens",
      s"""aggregate(
         |  transform(split(text, ' '),
         |    t -> (${Dedup.shingleHashSpark("t")} % 2001) - 1000),
         |  CAST(0 AS BIGINT), (acc, x) -> acc + x) AS logit_milli"""
        .stripMargin)
    .withColumn("mean_w_milli",
      expr("ROUND(logit_milli / CAST(n_tokens AS DOUBLE), 4)"))
    .withColumn("verdict",
      expr("CASE WHEN logit_milli >= 0 THEN 'keep' ELSE 'drop' END"))

  val linearQualityScoreOracle: String =
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(string_split(text, ' '),
       |          t -> (${Dedup.shingleHashDuck("t")} % 2001) - 1000)),
       |      (acc, x) -> acc + x) AS logit_milli
       |  FROM documents)
       |SELECT doc_id, lang, n_tokens, logit_milli,
       |  ROUND(logit_milli / CAST(n_tokens AS DOUBLE), 4) AS mean_w_milli,
       |  CASE WHEN logit_milli >= 0 THEN 'keep' ELSE 'drop' END AS verdict
       |FROM s""".stripMargin

  /** Language-ID confusion matrix — [[langId]] evaluated against the
    * corpus's labeled `lang` column: one row per (true, predicted) pair
    * with the within-language share, the classifier-QA artifact
    * completing the evaluation family ([[graft.llm.Dedup.lshEval]] for
    * dedup, [[graft.llm.Similarity.annRecall]] for ANN).  The diagonal
    * shares ARE per-language accuracy; off-diagonal mass says which
    * languages the marker heuristic confuses.
    *
    * Scale: the scan-fused predictions collapse into a ≤ #langs² grid in
    * one exchange; the share window runs over grid rows. */
  def langIdEval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    langId(spark, dir)
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lang_total",
        sum(col("n")).over(Window.partitionBy(col("lang"))))
      .select(col("lang"), col("predicted_lang"), col("n"),
        expr("ROUND(n / CAST(lang_total AS DOUBLE), 6)").as("share"),
        (col("lang") === col("predicted_lang")).as("is_correct"))
  }

  val langIdEvalOracle: String =
    s"""WITH pred AS (
       |  SELECT lang, predicted_lang FROM ($langIdOracle) p),
       |g AS (
       |  SELECT lang, predicted_lang, COUNT(*) AS n
       |  FROM pred GROUP BY 1, 2),
       |w AS (
       |  SELECT lang, predicted_lang, n,
       |    SUM(n) OVER (PARTITION BY lang) AS lang_total
       |  FROM g)
       |SELECT lang, predicted_lang, n,
       |  ROUND(n / CAST(lang_total AS DOUBLE), 6) AS share,
       |  lang = predicted_lang AS is_correct
       |FROM w""".stripMargin

  /** Cohen's κ of [[langId]] against the labeled `lang` column — the
    * CHANCE-CORRECTED agreement [[langIdEval]]'s raw accuracy overstates
    * on skewed label mixes (a classifier that always answers the
    * majority language scores high accuracy but κ ≈ 0).  Entirely
    * rational: with N docs, D the confusion diagonal and
    * P = Σₖ rowₖ·colₖ the chance-agreement numerator,
    * κ = (N·D − P)/(N² − P) — exact BIGINTs into ONE rounded division,
    * the cross-engine-deterministic shape of the [[graft.ops.StatTests]]
    * family.
    *
    * Scale: the scan-fused predictions collapse to the ≤ #langs² grid
    * in one exchange; marginals, the diagonal, and κ are grid-sized
    * arithmetic on 1-row broadcast frames. */
  def langIdKappa(spark: SparkSession, dir: String): DataFrame = {
    val grid = langId(spark, dir)
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rows = grid.groupBy(col("lang").as("cat"))
      .agg(sum(col("n")).as("r"))
    val cols = grid.groupBy(col("predicted_lang").as("cat"))
      .agg(sum(col("n")).as("c"))
    val pe = rows.join(cols, Seq("cat"), "full_outer")
      .na.fill(0L, Seq("r", "c"))
      .agg(sum(expr("r * c")).as("pe_num"))
    val totals = grid.agg(sum(col("n")).as("n_docs"),
      sum(when(col("lang") === col("predicted_lang"), col("n"))
        .otherwise(0L)).as("n_correct"))
    totals.crossJoin(broadcast(pe))
      .selectExpr("n_docs", "n_correct", "pe_num",
        "ROUND(CAST(n_correct AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) " +
          "AS accuracy",
        s"$KappaFormula AS kappa")
  }

  private val KappaFormula: String =
    // NULLIF guard: a single-category corpus with perfect agreement has
    // pe_num = N² (chance agreement is certain) — κ is undefined there,
    // and under ANSI mode an unguarded division is an error, not NULL.
    "ROUND(CAST(n_docs * n_correct - pe_num AS DOUBLE) " +
      "/ NULLIF(CAST(n_docs * n_docs - pe_num AS DOUBLE), 0.0), 6)"

  val langIdKappaOracle: String =
    s"""WITH pred AS (
       |  SELECT lang, predicted_lang FROM ($langIdOracle) p),
       |g AS (
       |  SELECT lang, predicted_lang, COUNT(*) AS n
       |  FROM pred GROUP BY 1, 2),
       |r AS (SELECT lang AS cat, SUM(n) AS r FROM g GROUP BY 1),
       |c AS (SELECT predicted_lang AS cat, SUM(n) AS c FROM g GROUP BY 1),
       |pe AS (
       |  SELECT CAST(SUM(COALESCE(r.r, 0) * COALESCE(c.c, 0)) AS BIGINT)
       |    AS pe_num
       |  FROM r FULL OUTER JOIN c USING (cat)),
       |tot AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN lang = predicted_lang THEN n ELSE 0 END)
       |         AS BIGINT) AS n_correct
       |  FROM g)
       |SELECT n_docs, n_correct, pe_num,
       |  ROUND(CAST(n_correct AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
       |    AS accuracy,
       |  $KappaFormula AS kappa
       |FROM tot, pe""".stripMargin

  /** McNemar's paired test: does the n-gram language-ID classifier
    * actually BEAT the predict-the-majority-language baseline on the
    * same documents?  The two classifiers score the identical doc set,
    * so the right comparison is the PAIRED one — only the discordant
    * pairs carry evidence: b = docs the classifier gets right and the
    * baseline wrong, c = the reverse, statistic (b−c)²/(b+c) (the
    * χ²₁-distributed McNemar form, continuity correction omitted as
    * published for b+c large).  Accuracy deltas alone can't separate
    * "better classifier" from "different docs" — this is the standard
    * classifier-comparison test on a shared eval set.
    *
    * Exactness: cell counts are exact integers; the statistic is one
    * ROUNDed double division (NULLIF-guarded — b + c = 0 when the
    * classifiers agree everywhere, where the test is undefined).  The
    * majority language is a deterministic argmax (count DESC, lang ASC).
    * Scale: predictions collapse to four cells in one exchange; the
    * 1-row majority frame rides in broadcast. */
  def langIdMcNemar(spark: SparkSession, dir: String): DataFrame = {
    val major = Sources.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("lang").asc).limit(1)
      .select(col("lang").as("major_lang"))
    langId(spark, dir).select(col("lang"), col("predicted_lang"))
      .crossJoin(broadcast(major))
      .groupBy(col("major_lang"))
      .agg(
        expr(s"${McNemarCells(0)}").as("b"),
        expr(s"${McNemarCells(1)}").as("c"),
        expr(s"${McNemarCells(2)}").as("n_both"),
        expr(s"${McNemarCells(3)}").as("n_neither"))
      .selectExpr("major_lang", "b", "c", "n_both", "n_neither",
        s"$McNemarFormula AS mcnemar_chi2")
  }

  /** Shared cell spellings — IDENTICAL text on both engines, so the
    * NULL-propagation of a missing label behaves the same way. */
  private val McNemarCells = Seq(
    "SUM(CASE WHEN (predicted_lang = lang) AND NOT (major_lang = lang) " +
      "THEN 1 ELSE 0 END)",
    "SUM(CASE WHEN NOT (predicted_lang = lang) AND (major_lang = lang) " +
      "THEN 1 ELSE 0 END)",
    "SUM(CASE WHEN (predicted_lang = lang) AND (major_lang = lang) " +
      "THEN 1 ELSE 0 END)",
    "SUM(CASE WHEN NOT (predicted_lang = lang) AND " +
      "NOT (major_lang = lang) THEN 1 ELSE 0 END)")

  private val McNemarFormula: String =
    "ROUND(CAST((b - c) * (b - c) AS DOUBLE) " +
      "/ NULLIF(CAST(b + c AS DOUBLE), 0.0), 6)"

  val langIdMcNemarOracle: String =
    s"""WITH pred AS (
       |  SELECT lang, predicted_lang FROM ($langIdOracle) p),
       |major AS (
       |  SELECT lang AS major_lang FROM documents
       |  GROUP BY 1 ORDER BY COUNT(*) DESC, lang ASC LIMIT 1),
       |cells AS (
       |  SELECT major_lang,
       |    CAST(${McNemarCells(0)} AS BIGINT) AS b,
       |    CAST(${McNemarCells(1)} AS BIGINT) AS c,
       |    CAST(${McNemarCells(2)} AS BIGINT) AS n_both,
       |    CAST(${McNemarCells(3)} AS BIGINT) AS n_neither
       |  FROM pred, major GROUP BY 1)
       |SELECT major_lang, b, c, n_both, n_neither,
       |  $McNemarFormula AS mcnemar_chi2
       |FROM cells""".stripMargin

  /** Winnowing document fingerprints (Schleimer, Wilkinson & Aiken 2003,
    * the MOSS algorithm) — per sliding window of w consecutive k-gram
    * hashes, select the window MINIMUM; the distinct selected hashes are
    * the document's fingerprint set.  The guarantee [[fingerprint]]'s
    * single rolling hash can't give: any shared substring of length
    * ≥ w + k − 1 tokens contributes at least one COMMON fingerprint, at
    * a fraction ≈ 2/(w+1) of the grams — local, position-robust
    * plagiarism/copy detection with tunable density.
    *
    * Exactness: k-gram hashes are the engine-wide md5-prefix BIGINTs,
    * window minima exact integer comparisons.  Scale: the whole selection
    * is higher-order array work fused into the scan — zero shuffle; at
    * 100 TB the fingerprint SETS would be exploded into an inverted
    * (fingerprint → doc) index, the [[Dedup.verbatimSpans]] posting-list
    * shape. */
  def winnowing(spark: SparkSession, dir: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    graft.functions.WordNgramShingles.register(spark)
    winnowingOf(Sources.documents(spark, dir), k, w)
  }

  private[graft] def winnowingOf(docs: DataFrame,
      k: Int = 3, w: Int = 4): DataFrame = docs
    .selectExpr("doc_id",
      s"""transform(ngram_shingles(text, $k, false),
         |  s -> ${Dedup.shingleHashSpark("s")}) AS h""".stripMargin)
    .selectExpr("doc_id", "size(h) AS n_grams",
      s"""CASE WHEN size(h) >= $w
         |  THEN transform(sequence(1, size(h) - ${w - 1}),
         |         j -> array_min(slice(h, j, $w)))
         |  ELSE CAST(array() AS ARRAY<BIGINT>) END AS mins""".stripMargin)
    .selectExpr("doc_id", "n_grams",
      "size(mins) AS n_windows",
      "size(array_distinct(mins)) AS n_fingerprints")
    .withColumn("density", expr(
      "ROUND(n_fingerprints / CAST(greatest(n_windows, 1) AS DOUBLE), 6)"))

  def winnowingOracle(k: Int = 3, w: Int = 4): String =
    s"""WITH g AS (
       |  SELECT doc_id,
       |    list_transform(
       |      generate_series(1,
       |        greatest(len(string_split(text, ' ')) - ${k - 1}, 1)),
       |      j -> ${Dedup.shingleHashDuck(
      s"array_to_string(list_slice(string_split(text, ' '), j, j + ${k - 1}), ' ')")})
       |      AS h
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, len(h) AS n_grams,
       |    CASE WHEN len(h) >= $w
       |      THEN list_transform(generate_series(1, len(h) - ${w - 1}),
       |             j -> list_min(list_slice(h, j, j + ${w - 1})))
       |      ELSE []::BIGINT[] END AS mins
       |  FROM g)
       |SELECT doc_id, n_grams,
       |  len(mins) AS n_windows,
       |  len(list_distinct(mins)) AS n_fingerprints,
       |  ROUND(len(list_distinct(mins))
       |    / CAST(greatest(len(mins), 1) AS DOUBLE), 6) AS density
       |FROM m""".stripMargin

  /** Boilerplate/template mining — the global top-K SENTENCES by
    * document frequency (appearing in ≥ minDocs distinct docs).  The
    * C4-style move against headers, footers, cookie banners and license
    * blurbs: [[novelty]] scores each document's uniqueness, this surfaces
    * the shared text ITSELF so a cleaning pass can strip it corpus-wide.
    * Sentences are normalized (trailing sentence punctuation stripped,
    * trimmed) so "Foo bar." and "Foo bar!" collapse.
    *
    * Scale: explode → distinct (doc, sentence) → sentence-keyed count
    * (one exchange, map-side combine), a document-frequency floor that
    * cuts the tail BEFORE the top-K heap, and the [[Vocab.topK]]
    * TakeOrderedAndProject cut — only the K survivors meet the ranking
    * window.  The 1-row corpus total broadcasts for the share. */
  def boilerplate(spark: SparkSession, dir: String,
      minDocs: Int = 3, k: Int = 20): DataFrame =
    boilerplateOf(Sources.documents(spark, dir), minDocs, k)

  private[graft] def boilerplateOf(docs: DataFrame,
      minDocs: Int = 3, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = docs.agg(countDistinct(col("doc_id")).as("total_docs"))
    val sents = docs
      .select(col("doc_id"),
        explode(split(col("text"), "[.!?]+ ")).as("raw"))
      .select(col("doc_id"),
        trim(regexp_replace(col("raw"), "[.!?]+$", "")).as("sentence"))
      .filter(length(col("sentence")) > 0)
      .distinct()
      .groupBy(col("sentence"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    val top = sents.orderBy(col("n_docs").desc, col("sentence").asc).limit(k)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_docs").desc, col("sentence").asc)))
      .select(col("rank"), col("sentence"), col("n_docs"),
        expr("ROUND(n_docs / CAST(total_docs AS DOUBLE), 6)")
          .as("doc_share"))
  }

  def boilerplateOracle(minDocs: Int = 3, k: Int = 20): String =
    s"""WITH tot AS (
       |  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS total_docs
       |  FROM documents),
       |raw AS (
       |  SELECT doc_id,
       |    UNNEST(string_split_regex(text, '[.!?]+ ')) AS raw
       |  FROM documents),
       |s AS (
       |  SELECT DISTINCT doc_id,
       |    trim(regexp_replace(raw, '[.!?]+$$', '')) AS sentence
       |  FROM raw),
       |c AS (
       |  SELECT sentence, COUNT(*) AS n_docs FROM s
       |  WHERE length(sentence) > 0
       |  GROUP BY 1 HAVING COUNT(*) >= $minDocs),
       |top AS (
       |  SELECT sentence, n_docs FROM c
       |  ORDER BY n_docs DESC, sentence ASC LIMIT $k)
       |SELECT
       |  CAST(ROW_NUMBER() OVER (ORDER BY n_docs DESC, sentence ASC) AS INT)
       |    AS "rank",
       |  sentence, n_docs,
       |  ROUND(n_docs / CAST(tot.total_docs AS DOUBLE), 6) AS doc_share
       |FROM top, tot""".stripMargin
}
