package graft

import graft.llm.Multimodal
import graft.llm.Multimodal.FakeDecoder

class MultimodalSpec extends SparkSpec {

  test("FakeDecoder features are exact 1/256-grained floats") {
    val payload = "Hello, multimodal world!".getBytes("UTF-8")
    val feats = FakeDecoder.decode(payload)
    assert(feats.length == FakeDecoder.FeatureDim)
    // Integer lane sums scaled by a power of two: 256 * feature must be a
    // whole number recovered without any float residue.
    feats.foreach { f =>
      val scaled = f * 256.0
      assert(scaled == scaled.floor, s"feature $f is not 1/256-grained")
    }
    // Lane 0 takes bytes 0, 8, 16, ... — check against a direct sum.
    val lane0 = payload.indices.filter(_ % FakeDecoder.FeatureDim == 0)
      .map(i => payload(i) & 0xff).sum
    assert(feats(0) == lane0 / 256.0f)
  }

  test("decode is deterministic and empty-payload-safe") {
    val p = "abc".getBytes("UTF-8")
    assert(FakeDecoder.decode(p).toSeq == FakeDecoder.decode(p).toSeq)
    assert(FakeDecoder.decode(Array.emptyByteArray).toSeq ==
      Seq.fill(FakeDecoder.FeatureDim)(0.0f))
  }

  test("resize halves the payload and frame sampling tiles it without overlap") {
    val p = (0 until 130).map(_.toByte).toArray
    val small = FakeDecoder.resize(p)
    assert(small.length == 65)
    assert(small.toSeq == p.indices.filter(_ % 2 == 0).map(p(_)).toSeq)

    val frames = FakeDecoder.sampleFrames(p) // frames 0 and 2 exist; step 4 keeps 0
    assert(frames.map(_._1) == Seq(0))
    assert(frames.head._2.toSeq == p.take(64).toSeq)
    // A payload long enough to reach frame 4 keeps frames 0 and 4.
    val long = (0 until 64 * 5 + 1).map(_.toByte).toArray
    assert(FakeDecoder.sampleFrames(long).map(_._1) == Seq(0, 4))
    assert(FakeDecoder.sampleFrames(Array.emptyByteArray).isEmpty)
  }

  test("featureSummary carries one exact row per document") {
    val df = Multimodal.featureSummary(spark, Sf001)
    val rows = df.collect()
    val nDocs = graft.core.Sources.documents(spark, Sf001).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Int]("feature_dim") == FakeDecoder.FeatureDim)
      assert(r.getAs[Double]("feature_sq_norm") >= 0.0)
    }
  }
}
