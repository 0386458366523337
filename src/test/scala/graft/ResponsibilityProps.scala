package graft

import java.sql.Date
import java.time.LocalDate

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.SparkSession

import graft.ops.Responsibility

/** Property-based checks (SURVEY.md §5 item 3): for arbitrary transfer
  * histories, the derived responsibility periods PARTITION each client's
  * timeline — every date from the creation epoch onward is covered by
  * exactly one period (no gaps, no overlaps), with the final period open.
  */
object ResponsibilityProps extends Properties("Responsibility") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each case runs a Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // keep in sync with SparkSpec: getOrCreate may CREATE the JVM-wide
    // session here, and later suites read events.parquet through it
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genTransfer: Gen[(Long, Date, Long, Int)] = for {
    client <- Gen.choose(1L, 4L)
    day <- Gen.choose(0, 700)
    id <- Gen.choose(1L, 1000000L)
    farmer <- Gen.choose(0, 9)
  } yield (client, Date.valueOf(LocalDate.of(2000, 1, 1).plusDays(day.toLong)), id, farmer)

  property("periods partition every client timeline") =
    forAll(Gen.listOf(genTransfer)) { transfers =>
      import spark.implicits._
      val base = (1L to 4L).map(c => (c, 100 + c.toInt))
        .toDF("client_id", "base_farmer_id")
      val tr = transfers
        .toDF("client_id", "transfer_date", "transfer_id", "new_farmer_id")
      val periods = Responsibility.periodsFrom(base, tr)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1),
          r.getDate(2).toLocalDate,
          Option(r.getDate(3)).map(_.toLocalDate)))

      val probes = (0 until 40).map(i =>
        LocalDate.of(2000, 1, 1).plusDays((i * 23).toLong))
      (1L to 4L).forall { client =>
        val ps = periods.filter(_._1 == client)
        val oneOpen = ps.count(_._4.isEmpty) == 1
        val covered = probes.forall { d =>
          ps.count { case (_, _, s, e) =>
            !d.isBefore(s) && e.forall(d.isBefore)
          } == 1
        }
        oneOpen && covered
      }
    }
}
