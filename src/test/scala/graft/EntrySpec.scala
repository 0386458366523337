package graft

/** Driver-contract smoke: the flagship entry returns rows, and the
  * registry is structurally sound (unique names, oracle keys ⊆ query keys). */
class EntrySpec extends SparkSpec {

  test("entry (flagship fechamento) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and every oracle has a query") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length == names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
