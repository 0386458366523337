package graft

import graft.llm.Importance

/** DSIR-style importance reweighting: documents whose hashed-unigram
  * distribution leans toward the target corpus must outrank documents
  * made of raw-only tokens — checked on a fixture small enough to
  * verify the smoothed bucket ratios by hand. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha alpha beta", "en", "s", 16L),
    (2L, "alpha beta", "en", "s", 10L),
    (3L, "gamma gamma gamma", "fr", "s", 17L),
    (4L, "alpha alpha alpha", "fr", "s", 17L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("target-leaning documents outrank raw-only documents") {
    val got = Importance.dsirOf(docs)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toSeq
    // Hand computation (N = 11 raw tokens, T = 5 target tokens, B=256):
    //   r(alpha) = 4·267/(7·261) ≈ 0.585, r(beta) = 3·267/(3·261) ≈ 1.023,
    //   r(gamma) = 1·267/(4·261) ≈ 0.256
    // → doc1 ≈ 2.19 > doc4 ≈ 1.75 > doc2 ≈ 1.61 > doc3 ≈ 0.77.
    assert(got.map(_._1) == Seq(1L, 4L, 2L, 3L))
    assert(got.toMap == Map(1L -> 3L, 2L -> 2L, 3L -> 3L, 4L -> 3L))
    // The all-target-vocabulary doc outside the target language beats
    // the raw-only doc — DSIR scores CONTENT, not the label.
    val imp = Importance.dsirOf(docs)
      .select("doc_id", "importance").as[(Long, BigDecimal)]
      .collect().toMap
    assert(imp(4L) > imp(3L))
  }

  test("an empty target corpus still scores (uniform smoothing), deterministically") {
    val noTarget = docs.filter($"lang" =!= "en")
    val a = Importance.dsirOf(noTarget).collect().toSeq
    val b = Importance.dsirOf(noTarget).collect().toSeq
    assert(a == b)
    assert(a.size == 2) // docs 3 and 4 survive with finite weights
  }
}
