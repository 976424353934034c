package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SessionQueries

/** q382's calibration contract: drop counts are monotone non-increasing
  * in the watermark delay, a delay beyond the maximum observed lateness
  * drops nothing, and lateness is measured against the EXCLUSIVE
  * high-water mark (the first event is never late). */
class WatermarkCalibrationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = SessionQueries
    .q382WatermarkCalibration(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("delay_seconds"))

  test("four candidate delays; drops monotone non-increasing") {
    assert(rows.map(_.getAs[Long]("delay_seconds")).toSeq ==
      Seq(60L, 600L, 3600L, 86400L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_dropped") >= b.getAs[Long]("n_dropped"),
          s"longer delays can only drop fewer events: $a vs $b")
      case _ =>
    }
    rows.foreach { r =>
      val share = r.getAs[Double]("drop_share")
      assert(share >= 0.0 && share <= 1.0, r.toString)
    }
  }

  test("a delay beyond the max observed lateness drops nothing") {
    val maxLate = rows.head.getAs[Double]("max_lateness_sec")
    rows.filter(_.getAs[Long]("delay_seconds").toDouble > maxLate)
      .foreach { r =>
        assert(r.getAs[Long]("n_dropped") == 0L,
          s"delay ${r.getAs[Long]("delay_seconds")}s exceeds max lateness " +
            s"$maxLate s yet drops rows: $r")
      }
  }
}
