package graft

/** Guards the driver's bench channel at TEST time: the driver keeps only
  * the last 2000 chars of stdout (measured across BENCH_r01–r05 — r4/r5
  * both lost the round's official number to this window), so the compact
  * JSON line Bench prints must stay inside it for the CURRENT registry.
  * Mirrors Bench.scala's three-tier formatting (ms precision → 10 ms →
  * 40-slowest-only) without running Spark.
  */
class BenchContractSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq

  // "name":123.456, → len(name) + quotes(2) + colon(1) + value + comma(1).
  // 7 chars covers any sub-1000-second value at %.3f.
  private def lineLen(perValue: Int, n: Seq[String]) =
    100 /* header + sf path */ + n.map(_.length + 4 + perValue).sum

  test("registry names are short enough for the stdout tail window") {
    names.foreach(n => assert(n.length <= 34, s"'$n' too long for the line"))
  }

  test("some tier of the compact bench line always fits 2000 chars") {
    val tiers = Seq(
      lineLen(7, names),                          // %.3f, all queries
      lineLen(6, names),                          // %.2f, all queries
      lineLen(6, names.sortBy(-_.length).take(40)) // top-40 fallback
    )
    assert(tiers.exists(_ <= 1950),
      s"no formatting tier fits: $tiers — shrink names or the top-N cap")
    // The top-40 tier is the hard guarantee and must fit even under this
    // spec's pessimistic per-value bound (real lines run ~100 chars
    // shorter: most values are "1.23", not "123.45").
    assert(tiers.last <= 1950,
      s"top-40 fallback no longer fits (${tiers.last}) — lower the cap")
  }
}
