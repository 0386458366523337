package graft.functions

/** The engine's shared 31-bit integer mixer — the murmur3 `fmix32`
  * finalizer restricted to 31 bits so that every intermediate stays exact
  * in ANY engine with 64-bit integers (largest product
  * (2^31−1) · 0xc2b2ae35 ≈ 7.0e18 < 2^63−1; no wraparound, which DuckDB
  * rejects and Spark's ANSI mode throws on).  Used wherever a
  * cross-engine-reproducible uniform hash of an integer key is needed:
  * [[HllSketch]] registers and [[graft.llm.Sampling]] split/sample
  * assignment.  Avalanche quality is the finalizer's: HllSketchSpec's
  * error-band test and SamplingSpec's rate test both fail with a plain
  * multiplicative mix here (+90% HLL error on sequential keys).
  */
object Mix31 {
  val Mask = 0x7FFFFFFFL // 2^31 − 1

  def mix(key: Long): Long = {
    var h = key & Mask
    h ^= h >>> 16
    h = (h * 0x85ebca6bL) & Mask
    h ^= h >>> 13
    h = (h * 0xc2b2ae35L) & Mask
    h ^= h >>> 16
    h
  }

  /** The same chain as DuckDB SQL over a BIGINT expression (constants in
    * decimal: 0x85ebca6b, 0xc2b2ae35).  Nesting mirrors [[mix]] exactly. */
  def duckSql(col: String): String = {
    val x0 = s"($col & 2147483647)"
    val x1 = s"xor($x0, $x0 >> 16)"
    val x2 = s"((($x1) * 2246822507) & 2147483647)"
    val x3 = s"xor($x2, $x2 >> 13)"
    val x4 = s"((($x3) * 3266489909) & 2147483647)"
    s"xor($x4, $x4 >> 16)"
  }

  /** The same chain as Spark SQL (identical operator semantics on
    * nonnegative BIGINTs; `^` is Spark's xor). */
  def sparkSql(col: String): String = {
    val x0 = s"(CAST($col AS BIGINT) & 2147483647)"
    val x1 = s"($x0 ^ shiftright($x0, 16))"
    val x2 = s"(($x1 * 2246822507) & 2147483647)"
    val x3 = s"($x2 ^ shiftright($x2, 13))"
    val x4 = s"(($x3 * 3266489909) & 2147483647)"
    s"($x4 ^ shiftright($x4, 16))"
  }
}
