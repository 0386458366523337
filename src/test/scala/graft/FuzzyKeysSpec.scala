package graft

import org.apache.spark.sql.functions._

import graft.ops.FuzzyKeys

/** Deletion-neighborhood fuzzy keys: per-edit-kind recall, the
  * distance-2 exclusion, identity with brute force on real keys, and
  * the candidate bound that makes the index beat a length band on
  * uniform-length ID vocabularies. */
class FuzzyKeysSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(keys: Seq[String]): Set[(String, String, Int)] =
    FuzzyKeys.pairsOf(keys.toDF("k"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet

  test("substitution, deletion, and insertion pairs are all found") {
    val out = pairs(Seq("abcd", "abxd", "abd", "xabcd", "zzzz"))
    assert(out.contains(("abcd", "abxd", 1))) // substitution
    assert(out.contains(("abcd", "abd", 1)))  // shorter = one deletion
    assert(out.contains(("abcd", "xabcd", 1))) // insertion
    assert(!out.exists(p => p._1 == "zzzz" || p._2 == "zzzz"))
  }

  test("transpositions are distance 2 and excluded") {
    assert(pairs(Seq("abcd", "abdc")).isEmpty)
  }

  test("duplicate-character runs: collapsed variants still match") {
    // "aab" vs "ab": deleting either 'a' from "aab" yields "ab" — the
    // variant dedup must not lose the pair.
    assert(pairs(Seq("aab", "ab")) === Set(("aab", "ab", 1)))
  }

  test("identity with brute-force all-pairs on real supplier names") {
    val keys = graft.core.Sources.supplier(spark, Sf001)
      .select(col("s_name")).distinct().as[String].collect().toSeq
    val brute = (for {
      a <- keys; b <- keys if a < b
      d = levenshteinDist(a, b) if d <= 1
    } yield (a, b, d)).toSet
    assert(pairs(keys) === brute)
  }

  test("uniform-length ID vocabulary: candidates stay far below vocab²") {
    // 100 same-length keys — the regime where a length band degenerates
    // to the full cross product (4950 pairs).  The deletion index's
    // candidate volume is Σ_v bucket(v)² — measured 1665 on this DENSE
    // ID set (every 3-digit code occupied, so variant buckets are as
    // full as they can get); a real key space is sparser and the gap
    // widens with key length.
    val keys = (0 until 100).map(i => f"K$i%03d")
    val vars = keys.toDF("k")
      .select(col("k"), explode(expr(
        """array_union(array(k), transform(sequence(1, length(k)),
          |  i -> concat(left(k, i - 1), substring(k, i + 1, length(k)))))"""
          .stripMargin)).as("v"))
    val candidates = vars.as("a").join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.k") < col("b.k"))
      .select(col("a.k"), col("b.k")).distinct().count()
    assert(candidates < 2000, s"candidate volume $candidates")
    // And recall is still total: every distance-≤1 pair is a candidate.
    val brute = (for {
      a <- keys; b <- keys if a < b && levenshteinDist(a, b) <= 1
    } yield (a, b, 1)).toSet
    assert(pairs(keys) === brute)
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
