package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Deletion-neighborhood fuzzy key matching (the SymSpell index, Garbe
  * 2012) — entity keys within edit distance 1, the fuzzy-join behind
  * typo-tolerant entity resolution and data-entry QA on ID columns.
  * Complements [[graft.llm.Vocab.fuzzyVocab]]'s LENGTH-BAND candidate
  * generator, which is exactly wrong for ID-like vocabularies: every
  * "Supplier#NNNNNNNNN" has the same length, so the band degenerates to
  * the full vocab² cross product.  The deletion index keys on CONTENT
  * instead: each key explodes to its ≤ len+1 single-deletion variants
  * (plus itself), and candidates are pairs sharing a variant — bucket
  * sizes track how many keys REDUCE to the same string, tiny even when
  * all keys look alike.
  *
  * Recall is provably 100 % for distance ≤ 1: equal-length pairs at
  * distance 1 differ by one substitution, and deleting that position
  * from both yields the same variant; length-±1 pairs ARE a deletion —
  * the shorter key is literally in the longer key's variant set (which
  * is why the variant set must include the key itself).  So the plain
  * all-pairs DuckDB oracle hash-matches, the [[graft.llm.Dedup]]
  * lossless-prefix-filter convention.  Levenshtein is the classic DP in
  * both engines — identical integers.
  *
  * Scale: the variant table is (len+2−dedup)·|keys| rows joined on the
  * variant string (an equi-join; at 100 TB the key would be
  * xxhash64(variant) — kept as strings so the oracle reproduces it);
  * candidate volume is Σ_v bucket(v)², never |keys|², and the verify
  * stage runs one levenshtein per surviving candidate.  FuzzyKeysSpec
  * pins substitution/deletion/insertion recall, the transposition
  * (distance-2) exclusion, identity with brute force, and the
  * ID-vocabulary candidate bound the length band cannot give.
  */
object FuzzyKeys {

  /** Single-deletion neighborhood D1(k) ∪ {k} as a column expression
    * over a string column `k`.  `array_union` dedups the variants a
    * run of equal characters collapses to. */
  private val variantsExpr =
    """array_union(array(k), transform(sequence(1, length(k)),
      |  i -> concat(left(k, i - 1), substring(k, i + 1, length(k)))))"""
      .stripMargin

  /** Core over a prepared single-column ("k", string) key set. */
  private[graft] def pairsOf(keys: DataFrame): DataFrame = {
    val vars = keys.filter(length(col("k")) >= 1)
      .select(col("k"), explode(expr(variantsExpr)).as("v"))
    vars.as("a").join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.k") < col("b.k"))
      .select(col("a.k").as("a"), col("b.k").as("b"))
      .distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= 1)
      .select(col("a"), col("b"), col("dist").cast("int").as("dist"))
  }

  def supplierKeys(spark: SparkSession, dir: String): DataFrame =
    pairsOf(Sources.supplier(spark, dir)
      .select(col("s_name").as("k")).distinct())

  /** All-pairs oracle: the supplier dim is the SMALL side at any scale
    * (the Spark side's index is what scales to a large key set), so the
    * gate can afford the quadratic reference formulation. */
  val supplierKeysOracle: String =
    """WITH v AS (SELECT DISTINCT s_name AS k FROM supplier)
      |SELECT a.k AS a, b.k AS b,
      |  CAST(levenshtein(a.k, b.k) AS INT) AS dist
      |FROM v a JOIN v b ON a.k < b.k
      |WHERE levenshtein(a.k, b.k) <= 1""".stripMargin
}
