package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SessionQueries

/** q377's calibration contract: session counts are monotone
  * non-increasing in the gap threshold (a larger gap can only merge
  * sessions), every user has at least one session at any threshold,
  * and the 30-minute row reconciles exactly with q34's registered
  * sessionization. */
class GapCalibrationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = SessionQueries
    .q377GapCalibration(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("gap_minutes"))

  test("all five thresholds; counts monotone non-increasing in the gap") {
    assert(rows.map(_.getAs[Long]("gap_minutes")).toSeq ==
      Seq(5L, 15L, 30L, 60L, 120L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_sessions") >= b.getAs[Long]("n_sessions"),
          s"larger gaps can only merge sessions: $a vs $b")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("sessions_per_user") >= 1.0 - 1e-9,
        s"every active user has at least one session: $r")
      assert(r.getAs[Double]("mean_events_per_session") >= 1.0 - 1e-9)
    }
  }

  test("the 30-minute row reconciles with q34's sessionizer") {
    val n30 = rows.find(_.getAs[Long]("gap_minutes") == 30L).get
      .getAs[Long]("n_sessions")
    val q34 = SessionQueries.q34Sessions(spark, sfDir).count()
    assert(n30 == q34,
      s"calibration says $n30 sessions at 30 min; q34 built $q34")
  }
}
