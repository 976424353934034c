package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SeriesQueries

/** q390's detector contract: ACF values are genuine correlations
  * (|r| <= 1), the argmax is self-consistent (r_best >= r_annual with
  * equality exactly when lag 12 wins the tie rule), and a constructed
  * perfectly-periodic series through the SAME exact-integer algebra
  * detects its true period. */
class PeriodDetectSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows =
    SeriesQueries.q390PeriodDetect(spark, sfDir).collect()

  test("bounded correlations; argmax dominates the annual lag") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val best = r.getAs[Double]("r_best")
      val annual = r.getAs[Double]("r_annual")
      assert(math.abs(best) <= 1.0 + 1e-6, r.toString)
      assert(best >= annual - 1e-9, r.toString)
      val lag = r.getAs[Long]("best_lag")
      assert(lag >= 1 && lag <= 12)
      assert(r.getAs[Boolean]("annual_dominant") == (lag == 12L))
    }
  }

  test("a constructed period-6 series detects lag 6 via the same algebra") {
    // y_t = m*x_t - S; ACF(k) = sum y_t y_{t+k} / sum y_t^2 in exact math
    val m = 48
    val x = Array.tabulate(m)(t => 1000L + (if (t % 6 == 0) 500L else 0L))
    val s = x.sum
    val y = x.map(v => m * v - s)
    def acf(k: Int): Double = {
      val num = (0 until m - k).map(t => BigInt(y(t)) * BigInt(y(t + k)))
        .sum
      val den = y.map(v => BigInt(v) * BigInt(v)).sum
      (BigDecimal(num) / BigDecimal(den)).toDouble
    }
    val rs = (1 to 12).map(k => k -> acf(k))
    val best = rs.maxBy { case (k, r) => (r, -k) }
    assert(best._1 == 6, s"constructed series must peak at lag 6: $rs")
    assert(acf(12) > acf(11), "harmonic at 12 beats its neighbors")
  }
}
