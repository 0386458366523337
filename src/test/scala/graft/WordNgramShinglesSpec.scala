package graft

import org.apache.spark.sql.functions._

import graft.functions.WordNgramShingles
import graft.llm.Dedup

/** The codegen'd shingle kernel must be indistinguishable from the
  * declarative `array_distinct(transform(...))` spec it replaces —
  * including order, empty-token, and short-document conventions. */
class WordNgramShinglesSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one two one two one two",       // repeated shingles → distinct order
    "a  b c",                        // double space → empty token survives
    "trailing space ",               // trailing empty token
    "short",                         // shorter than one 3-gram
    "two words",
    "",                              // empty doc → [""]
    "x y z x y z x y"
  ).toDF("text")

  private def both(n: Int) = {
    WordNgramShingles.register(spark)
    texts.select(
      expr(s"ngram_shingles(text, $n)").as("fast"),
      expr(Dedup.ngramSetExpr("text", n)).as("spec")).collect()
  }

  for (n <- Seq(1, 2, 3, 5)) {
    test(s"kernel equals the declarative spec element-for-element, n=$n") {
      both(n).foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1))
      }
    }
  }

  test("multiplicity variant equals the no-distinct declarative spec") {
    WordNgramShingles.register(spark)
    // Synthetic edge cases AND the real corpus: every occurrence, in order.
    texts.select(
        expr("ngram_shingles(text, 2, false)").as("fast"),
        expr(graft.llm.TextAnalysis.bigramsSpec).as("spec")).collect()
      .foreach { r => assert(r.getSeq[String](0) == r.getSeq[String](1)) }
    val diff = graft.core.Sources.documents(spark, "/root/testdata/sf0.001")
      .select(
        expr("ngram_shingles(text, 2, false)").as("fast"),
        expr(graft.llm.TextAnalysis.bigramsSpec).as("spec"))
      .filter(not(col("fast") === col("spec")))
      .count()
    assert(diff == 0)
  }

  test("kernel equals the spec on the real documents corpus (sf0.001)") {
    WordNgramShingles.register(spark)
    val diff = graft.core.Sources.documents(spark, "/root/testdata/sf0.001")
      .select(
        expr("ngram_shingles(text, 3)").as("fast"),
        expr(Dedup.ngramSetExpr("text", 3)).as("spec"))
      .filter(not(col("fast") === col("spec")))
      .count()
    assert(diff == 0)
  }
}
