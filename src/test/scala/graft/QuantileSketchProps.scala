package graft

import scala.collection.mutable.ArrayBuffer

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.QuantileSketch

/** ScalaCheck properties for the quantile sketch pair: the multi form
  * must be indistinguishable from per-probe single sketches on ANY input
  * and cap (they share one State implementation — this pins that the
  * sharing can never drift), and the deterministic-compaction contract
  * must hold under arbitrary chunked merges. */
object QuantileSketchProps extends Properties("QuantileSketch") {

  private def freshState() = QuantileSketch.emptyState()

  private def stateOf(xs: Seq[Long], cap: Int): QuantileSketch.State = {
    val s = freshState(); xs.foreach(s.add(_, cap)); s
  }

  private val inputs = for {
    n <- Gen.choose(1, 2000)
    cap <- Gen.oneOf(8, 16, 64, 256)
    xs <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
  } yield (xs, cap)

  // One shared state answers all probes; per-probe states see the same
  // insertion order — element-wise equality must be exact in BOTH
  // regimes (exact and compacted), because the level structure is a
  // pure function of the insertion sequence.
  property("multi ≡ per-probe singles on arbitrary inputs and caps") =
    forAll(inputs) { case (xs, capRaw) =>
      val cap = math.max(8, capRaw) // shrinker can leave the gen's domain
      val shared = stateOf(xs, cap)
      Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0).forall { p =>
        shared.quantile(p) == stateOf(xs, cap).quantile(p)
      }
    }

  private val chunked = for {
    (xs, cap) <- inputs
    k <- Gen.choose(1, 8)
  } yield (xs, cap, k)

  // Weight is conserved only APPROXIMATELY in the compacted regime: a
  // compaction of an odd-length level buffer promotes ⌈len/2⌉ or
  // ⌊len/2⌋ items at double weight — a ±2^level drift per compaction.
  // Compactions at level i number ≤ ~2n/(cap·2^i), so total drift is
  // bounded by ~2n·levels/cap — at the registered production config
  // (n≈20k, cap=1024, ~6 levels) that is ~1.2% of n, inside the 2%
  // rank-error band the capped gate entry asserts.  (This property
  // originally asserted exact conservation; ScalaCheck found the
  // odd-compaction counterexample immediately — the spec's fixed-size
  // merge test conserves exactly only by the arithmetic of its sizes.)
  // The answer, however, is ALWAYS an actual input value: compaction
  // promotes existing items, never invents one.
  property("weight within the drift bound; answers are input values") =
    forAll(chunked) { case (xs0, capRaw, k) =>
      val xs = if (xs0.isEmpty) List(0L) else xs0
      val cap = math.max(8, capRaw) // shrinker can leave the gen's domain
      val chunks = xs.grouped(math.max(1, math.max(1, xs.length) / math.max(1, k))).toSeq
      val merged = chunks.map(stateOf(_, cap))
        .reduceLeft { (a, b) => a.mergeIn(b, cap); a }
      val drift = math.abs(merged.totalWeight - xs.length.toLong)
      val bound = math.max(8L,
        2L * xs.length * merged.levels.length / cap)
      drift <= bound &&
        xs.contains(merged.quantile(0.5).asInstanceOf[Long])
    }

  private val small = for {
    n <- Gen.choose(1, 300)
    xs <- Gen.listOfN(n, Gen.choose(-5000L, 5000L))
    k <- Gen.choose(1, 6)
  } yield (xs, k)

  // cap ≥ n: no compaction anywhere, so ANY merge tree must yield the
  // exact discrete quantile.
  property("exact regime under merge equals the rank walk") =
    forAll(small) { case (xs0, k) =>
      val xs = if (xs0.isEmpty) List(0L) else xs0
      val cap = 4096
      val chunks = xs.grouped(math.max(1, xs.length / math.max(1, k))).toSeq
      val merged = chunks.map(stateOf(_, cap))
        .reduceLeft { (a, b) => a.mergeIn(b, cap); a }
      val sorted = xs.sorted
      Seq(0.25, 0.5, 0.75).forall { p =>
        val want =
          sorted((math.max(1L, math.ceil(p * xs.length).toLong) - 1).toInt)
        merged.quantile(p) == want
      }
    }
}
