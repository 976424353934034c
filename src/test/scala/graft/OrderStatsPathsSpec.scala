package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{SessionQueries, StatsQueries}

/** q127 exact order statistics + q128 trigram path mining: Scala-reference
  * replays (the rank convention re-derived from first principles on
  * collected data) plus the invariants the oracle hash can't express.
  */
class OrderStatsPathsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The shared rank convention: lower median, ceil-rank quartiles. */
  private def rank(sorted: Array[Double], k: Long): Double =
    sorted((k - 1).toInt)

  test("q127 matches a Scala order-statistic reference per nation") {
    val byNation = graft.queries.Kpis.table(spark, sfDir, "customer")
      .select(col("c_nationkey").cast("long"), col("c_acctbal"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = StatsQueries.q127NationOrderStats(spark, sfDir).collect()
    assert(rows.length == byNation.size)
    rows.foreach { r =>
      val vs = byNation(r.getAs[Long]("c_nationkey"))
      val n = vs.length.toLong
      assert(r.getAs[Long]("n_customers") == n)
      val med = rank(vs, (n + 1) / 2)
      val p25 = rank(vs, (n + 3) / 4)
      val p75 = rank(vs, (3 * n + 3) / 4)
      assert(r.getAs[Double]("median") == med) // element selection: bit-exact
      assert(r.getAs[Double]("p25") == p25)
      assert(r.getAs[Double]("p75") == p75)
      assert(r.getAs[Double]("iqr") == p75 - p25)
      val devs = vs.map(v => math.abs(v - med)).sorted
      assert(r.getAs[Double]("mad") == rank(devs, (n + 1) / 2))
    }
  }

  test("q127 invariants: ordering, membership, non-negative spread") {
    StatsQueries.q127NationOrderStats(spark, sfDir).collect().foreach { r =>
      val (p25, med, p75) = (r.getAs[Double]("p25"),
        r.getAs[Double]("median"), r.getAs[Double]("p75"))
      assert(p25 <= med && med <= p75, "quartiles must be ordered")
      assert(r.getAs[Double]("iqr") >= 0 && r.getAs[Double]("mad") >= 0)
    }
  }

  test("q128 matches a Scala trigram reference, top-20 deterministic") {
    val perUser = graft.queries.Kpis.eventsTable(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getString(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    val counts = perUser.values.flatMap(_.sliding(3).filter(_.size == 3))
      .map(_.mkString(">"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expectTop = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = SessionQueries.q128Event3Paths(spark, sfDir).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_occurrences")))
    assert(got.toSeq == expectTop)
    // mass check: every user with n>=3 events contributes n-2 trigrams
    val totalTrigrams = perUser.values.map(l => math.max(0, l.size - 2)).sum
    assert(counts.values.sum == totalTrigrams)
  }
}
