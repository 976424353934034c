package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SeriesQueries

/** q124 gaps-and-islands streaks + q125 dyadic-weight EWMA: invariants the
  * oracle hash can't express (internal consistency, hand-computed values).
  */
class StreaksEwmaSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q124 streak invariants: masses partition active days, bounds hold") {
    val rows = SeriesQueries.q124ActivityStreaks(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (longest, n, active) = (r.getAs[Long]("longest_streak"),
        r.getAs[Long]("n_streaks"), r.getAs[Long]("active_days"))
      assert(longest >= 1 && n >= 1)
      assert(longest <= active, "longest streak cannot exceed active days")
      assert(active <= n * longest,
        "islands partition active days: sum of runs <= n * max run")
    }
    // total active days across users == |distinct (user, day)|
    val expect = Kpis_eventsDistinctUserDays
    assert(rows.map(_.getAs[Long]("active_days")).sum == expect)
  }

  private def Kpis_eventsDistinctUserDays: Long =
    graft.queries.Kpis.eventsTable(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().count()

  test("q124 hand-check one user against a scala reference") {
    val days = graft.queries.Kpis.eventsTable(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val uid = days.keys.min
    val ds = days(uid)
    val runs = ds.foldLeft(List.empty[Long]) { (acc, d) =>
      acc match {
        case h :: t if ds.contains(d.minusDays(1)) => (h + 1) :: t
        case _ => 1L :: acc
      }
    }
    val row = SeriesQueries.q124ActivityStreaks(spark, sfDir)
      .filter(col("user_id") === uid).collect().head
    assert(row.getAs[Long]("longest_streak") == runs.max)
    assert(row.getAs[Long]("n_streaks") == runs.size)
    assert(row.getAs[Long]("active_days") == ds.size)
  }

  test("q125 ewma: first row equals revenue; steady rows match hand weights") {
    val rows = SeriesQueries.q125EwmaRevenue(spark, sfDir)
      .collect()
    assert(rows.head.getAs[Double]("ewma") == rows.head.getAs[Double]("revenue"),
      "with a single observation the renormalized EWMA is the observation")
    // hand-compute row 15 from the revenue series with integer weights
    val revs = rows.map(_.getAs[Double]("revenue"))
    val i = 15
    val num = (0 to 9).map(j => BigDecimal(revs(i - j)) * BigDecimal(512 >> j)).sum
    val den = (0 to 9).map(j => BigDecimal(512 >> j)).sum
    val expect = (num / den).toDouble
    val got = rows(i).getAs[Double]("ewma")
    assert(math.abs(got - expect) < 1e-9, s"row $i: got $got expect $expect")
    // smoothing bound: ewma lies within the min/max of its 10-obs window
    (9 until rows.length).foreach { k =>
      val window = (0 to 9).map(j => revs(k - j))
      val e = rows(k).getAs[Double]("ewma")
      assert(e >= window.min - 1e-9 && e <= window.max + 1e-9)
    }
  }
}
