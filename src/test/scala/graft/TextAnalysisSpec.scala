package graft

import graft.llm.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("quality invariants hold for every document") {
    val q = TextAnalysis.quality(spark, Sf001)
    assert(q.filter($"n_unique_tokens" > $"n_tokens").count() == 0)
    assert(q.filter($"lexical_diversity" > 1.0 || $"lexical_diversity" <= 0.0).count() == 0)
    assert(q.filter($"n_tokens" <= 0).count() == 0)
  }

  test("language ID predicts only known languages") {
    val langs = TextAnalysis.langId(spark, Sf001)
      .select("predicted_lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(TextAnalysis.Markers.map(_._1).toSet + "und"))
  }

  test("fingerprints are deterministic and mostly distinct on distinct texts") {
    val fp1 = TextAnalysis.fingerprint(spark, Sf001).as[(Long, Long)].collect().sortBy(_._1)
    val fp2 = TextAnalysis.fingerprint(spark, Sf001).as[(Long, Long)].collect().sortBy(_._1)
    assert(fp1.toSeq == fp2.toSeq)
    val distinctRatio = fp1.map(_._2).distinct.length.toDouble / fp1.length
    assert(distinctRatio > 0.9, s"fingerprint collision ratio too high: $distinctRatio")
  }

  test("BPE-ish tokenization counts at least the whitespace tokens") {
    val t = TextAnalysis.tokenCount(spark, Sf001)
    assert(t.filter($"bpe_ish_tokens" < $"ws_tokens").count() == 0)
  }
}
