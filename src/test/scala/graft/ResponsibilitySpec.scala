package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ops.Responsibility

/** Edge cases from SURVEY.md §5 item 2: transfer chains of length 0/1/n,
  * same-day ties, the `start <= d < end` boundary with NULL = open
  * (`utils/client_responsibility.py:151`), and the physical-plan guarantee
  * that the interval join is hash-equi on client_id, not a nested loop. */
class ResponsibilitySpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val base = Seq(
    (1L, 10), // never transferred
    (2L, 20), // one transfer
    (3L, 30)  // two transfers, same-day tie
  ).toDF("client_id", "base_farmer_id")

  private val tr = Seq(
    (2L, d("2001-03-01"), 100L, 21),
    (3L, d("2001-02-01"), 200L, 31),
    (3L, d("2001-02-01"), 201L, 32) // same-day: tie-broken by transfer_id
  ).toDF("client_id", "transfer_date", "transfer_id", "new_farmer_id")

  private lazy val periods = Responsibility.periodsFrom(base, tr).cache()

  test("never-transferred client gets one open-ended period from creation") {
    val p = periods.filter($"client_id" === 1L).collect()
    assert(p.length == 1)
    assert(p.head.getAs[Int]("farmer_id") == 10)
    assert(p.head.getAs[Date]("start_date") == d(Responsibility.CreationDate))
    assert(p.head.getAs[Date]("end_date") == null)
  }

  test("single transfer yields old period closed at the transfer + open new period") {
    val p = periods.filter($"client_id" === 2L)
      .orderBy("start_date").collect()
    assert(p.length == 2)
    assert(p(0).getAs[Int]("farmer_id") == 20)
    assert(p(0).getAs[Date]("end_date") == d("2001-03-01"))
    assert(p(1).getAs[Int]("farmer_id") == 21)
    assert(p(1).getAs[Date]("start_date") == d("2001-03-01"))
    assert(p(1).getAs[Date]("end_date") == null)
  }

  test("same-day transfers produce one empty period and one live period") {
    val p = periods.filter($"client_id" === 3L && $"farmer_id" === 31).collect()
    assert(p.length == 1)
    // Closed on its own start date -> matches nothing under start <= d < end.
    assert(p.head.getAs[Date]("start_date") == p.head.getAs[Date]("end_date"))
  }

  test("membership boundary: start inclusive, end exclusive, NULL end open") {
    val facts = Seq(
      (2L, d("2001-02-28")), // day before transfer -> old farmer
      (2L, d("2001-03-01")), // transfer day -> new farmer (start inclusive)
      (2L, d("2009-01-01"))  // far future -> open period
    ).toDF("client_id", "fact_date")
    val enriched = Responsibility
      .addResponsibleFarmer(facts, periods, $"client_id", $"fact_date")
      .orderBy("fact_date")
      .select("responsible_farmer_id").as[Int].collect()
    assert(enriched.toSeq == Seq(20, 21, 21))
  }

  test("every fact date is covered by exactly one period") {
    val facts = Seq.tabulate(200)(i => (1L + i % 3, d(f"2001-${1 + i % 12}%02d-${1 + i % 28}%02d")))
      .toDF("client_id", "fact_date")
    val n = facts.count()
    val enriched = Responsibility
      .addResponsibleFarmer(facts, periods, $"client_id", $"fact_date")
    assert(enriched.count() == n) // left join never fans out
    assert(enriched.filter($"responsible_farmer_id".isNull).count() == 0)
  }

  test("interval join plans as a hash equi-join on client_id, not a nested loop") {
    // No broadcast() hint in the code path: Catalyst must pick an equi hash
    // join on its own (broadcast while small, shuffled-hash/sort-merge at
    // scale) — a forced broadcast would die once periods outgrow the
    // threshold at 100 TB.
    val facts = Seq((1L, d("2001-05-05"))).toDF("client_id", "fact_date")
    val plan = Responsibility
      .filterByResponsibility(facts, periods, $"client_id", $"fact_date")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi hash join with a range residual, got:\n$plan")
    assert(!plan.contains("NestedLoopJoin"), plan)
  }
}
