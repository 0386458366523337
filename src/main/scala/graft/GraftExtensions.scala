package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{BloomRuntimeFilter, DotProduct, HeavyHitters, HllMergeEst, HllSketch, HllSketchBytes, HyperplaneBuckets, KmvSketch, MinHashSignature, QuantileSketch, QuantileSketchMulti, SimHashBands, SquaredL2, WordNgramShingles}

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * functions available to ANY session (including plain `spark-sql` /
  * thrift users) via
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * Library call sites don't depend on this — they register on their own
  * session ([[MinHashSignature.register]]) — but a cluster deployment
  * injects once here instead of per-job.  Besides the function registry
  * entries, it injects the [[graft.plans.VecDotRewrite]] optimizer rule,
  * so even users writing the declarative
  * `aggregate(zip_with(...), 0D, +)` dot product get the codegen'd
  * kernel transparently.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(MinHashSignature.description)
    ext.injectFunction(SimHashBands.description)
    ext.injectFunction(HyperplaneBuckets.description)
    ext.injectFunction(HllSketch.description)
    ext.injectFunction(WordNgramShingles.description)
    ext.injectFunction(DotProduct.description)
    ext.injectFunction(SquaredL2.description)
    ext.injectFunction(HllSketchBytes.description)
    ext.injectFunction(HllMergeEst.description)
    ext.injectFunction(HeavyHitters.description)
    ext.injectFunction(QuantileSketch.description)
    ext.injectFunction(QuantileSketchMulti.description)
    ext.injectFunction(KmvSketch.description)
    ext.injectFunction(BloomRuntimeFilter.aggDescription)
    ext.injectFunction(BloomRuntimeFilter.probeDescription)
    ext.injectOptimizerRule(_ => graft.plans.VecDotRewrite)
    ext.injectOptimizerRule(_ => graft.plans.VecDist2Rewrite)
  }
}
