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

  test("oracle-checked outputs carry no decimal or array columns (driver-gate contract)") {
    // The driver's canonicalizer stringifies Decimal cells with trailing
    // zeros (DuckDB's side is float64 -> hash mismatch) and its row-sorter
    // crashes on array cells: 29/50 queries went red in round 2 on exactly
    // this.  Guard the whole registry so a future query can't regress it.
    import org.apache.spark.sql.types.{ArrayType, DecimalType}
    val oracleNames = SparkEntry.oracleSql.keySet
    val offenders = SparkEntry.queries.toSeq
      .filter { case (name, _) => oracleNames.contains(name) }
      .flatMap { case (name, fn) =>
        fn(spark, Sf001).schema.fields.toSeq.collect {
          case f if f.dataType.isInstanceOf[DecimalType] => s"$name.${f.name}: decimal"
          case f if f.dataType.isInstanceOf[ArrayType]   => s"$name.${f.name}: array"
        }
      }
    assert(offenders.isEmpty, s"driver-gate hazards: ${offenders.mkString(", ")}")
  }
}
