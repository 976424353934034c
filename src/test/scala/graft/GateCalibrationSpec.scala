package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QualityQueries

/** q431's equity contract: per-language median calibration pins every
  * language's pass rate to ~50% (within the one-document granularity
  * of an exact median cut), collapsing the cross-language spread the
  * global threshold exhibits; medians are genuine per-lang statistics
  * (all distinct from each other is not required, but all positive). */
class GateCalibrationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = QualityQueries.q431GateCalibration(spark, sfDir)
    .collect()

  test("median calibration pins pass rates to ~50% per language") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("calibrated_pass_share")
      val n = r.getAs[Long]("n_docs").toDouble
      assert(share >= 0.5 - 1e-9 && share <= 0.5 + 1.0 / n + 1e-9,
        s"an exact median cut passes ceil(n/2) of n docs: $r")
      assert(r.getAs[Double]("lang_median") > 0.0, r.toString)
    }
  }

  test("calibration collapses the cross-language spread") {
    def spread(c: String): Double = {
      val v = rows.map(_.getAs[Double](c)); v.max - v.min
    }
    assert(spread("calibrated_pass_share") < spread("global_pass_share"),
      s"per-lang cuts must equalize what one global cut skews: " +
        s"cal=${spread("calibrated_pass_share")} " +
        s"glob=${spread("global_pass_share")}")
  }
}
