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

  test("exact scaffolds and their twins are both registered; gate scales demote nothing") {
    val names = SparkEntry.registry.map(_.name).toSet
    SparkEntry.exactScaffolds.foreach { case (exact, twin) =>
      assert(names(exact), s"scaffold $exact not in registry")
      assert(names(twin), s"twin $twin not in registry")
      assert(SparkEntry.oracleSql.contains(twin),
        s"twin $twin must stay oracle-gated — it is the production path")
    }
    // The driver's correctness run (sf0.01) and smoke dirs must see the
    // FULL registry; only above-gate sweeps drop the exact forms.
    assert(SparkEntry.demotedAt("/root/testdata/sf0.01").isEmpty)
    assert(SparkEntry.demotedAt("/root/testdata/sf0.001").isEmpty)
    assert(SparkEntry.demotedAt("/weird/dir").isEmpty)
    assert(SparkEntry.demotedAt("/root/testdata/sf0.1") ==
      SparkEntry.exactScaffolds)
    // The sweep directories spell the scale as a SUFFIX — the first r12
    // sf10 sweep ran the 367 s exact histogram because this spelling
    // fell through to "unrecognized = gate scale".
    assert(SparkEntry.demotedAt("/root/repo/testdata_sf10") ==
      SparkEntry.exactScaffolds)
    assert(SparkEntry.demotedAt("/root/repo/testdata_sf1") ==
      SparkEntry.exactScaffolds)
  }

  test("bench_duck.py mirrors the demotion population rule (r12 advice #1)") {
    // A cross-engine total must compare the same population on both
    // sides; the Python yardstick carries its own copy of the scaffold
    // map, so pin every name (and the twin it names) into the script.
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("scripts/bench_duck.py")), "UTF-8")
    SparkEntry.exactScaffolds.foreach { case (exact, twin) =>
      assert(script.contains("\"" + exact + "\""),
        s"bench_duck.py EXACT_SCAFFOLDS is missing $exact")
      assert(script.contains("\"" + twin + "\""),
        s"bench_duck.py EXACT_SCAFFOLDS is missing twin $twin")
    }
    assert(script.contains("GRAFT_RUN_EXACT"),
      "bench_duck.py must honor the GRAFT_RUN_EXACT override")
  }

  test("registered outputs carry no driver-gate hazard columns") {
    // The driver's canonicalizer stringifies Decimal cells with trailing
    // zeros (DuckDB's side is float64 -> hash mismatch) and its row-sorter
    // crashes on array cells: 29/50 queries went red in round 2 on exactly
    // this, and round 3 lost q_p6_fechamento_periodo_array because the
    // guard only covered oracle-checked entries — the driver sorts rows
    // even for rows-only checks, so arrays are forbidden in EVERY
    // registered output; decimals only hash-mismatch, so they are
    // forbidden wherever an oracle exists.
    import org.apache.spark.sql.types.{ArrayType, DecimalType, MapType}
    val oracleNames = SparkEntry.oracleSql.keySet
    val offenders = SparkEntry.queries.toSeq
      .flatMap { case (name, fn) =>
        fn(spark, Sf001).schema.fields.toSeq.collect {
          case f if f.dataType.isInstanceOf[DecimalType] && oracleNames(name) =>
            s"$name.${f.name}: decimal"
          case f if f.dataType.isInstanceOf[ArrayType] => s"$name.${f.name}: array"
          case f if f.dataType.isInstanceOf[MapType]   => s"$name.${f.name}: map"
        }
      }
    assert(offenders.isEmpty, s"driver-gate hazards: ${offenders.mkString(", ")}")
  }

  test("unpartitioned windows run over aggregate-bounded frames only (r9 verdict #5)") {
    // A Window with no partitionSpec moves its WHOLE input to one task.
    // That is fine over a GRID (distinct durations, month spines, top-K
    // vocabularies — anything an Aggregate or Limit bounded first) and a
    // disaster over a corpus.  This walks every registered query's
    // optimized plan: each unpartitioned Window must have an Aggregate /
    // Limit / Deduplicate somewhere below it, except the DOCUMENTED
    // exact scaffolds whose corpus-sized single-task pass is the point
    // (cross-engine hash gate) and which carry registered sketch twins
    // (Scaffold.exactTwin logs the swap at plan-build time).
    import org.apache.spark.sql.catalyst.plans.logical._
    val exactScaffolds = Map(
      "q_an_histogram_eqdepth" -> "q_an_histogram_eqdepth_sketch")
    def bounded(p: LogicalPlan): Boolean = p.exists {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit |
           _: Deduplicate => true
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq
      .filterNot { case (n, _) => exactScaffolds.contains(n) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, Sf001).queryExecution.optimizedPlan
        plan.collect {
          case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) =>
            s"$name: unpartitioned window over unbounded input"
        }
      }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
