package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExperimentQueries

/** q369's regression contract: the minimax-identity output must BE the
  * PAVA solution — monotone, mass-conserving, and bit-close to a plain
  * JVM pool-adjacent-violators replay on the same bin census. */
class IsotonicSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = ExperimentQueries
    .q369IsotonicCalibration(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("p1_orders"))

  test("iso rates are monotone non-decreasing in the score") {
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("iso_rate") <=
          b.getAs[Double]("iso_rate") + 1e-9,
          s"monotonicity violated between ${a} and ${b}")
      case _ =>
    }
  }

  test("the fit conserves total positive mass") {
    val fitted = rows.map(r =>
      r.getAs[Double]("iso_rate") * r.getAs[Long]("n_customers")).sum
    val k = rows.map(_.getAs[Long]("k_active")).sum.toDouble
    // iso_rate is snapped at 6 dp, so allow the snap error per bin
    val tol = 1e-6 * rows.map(_.getAs[Long]("n_customers")).sum + 1e-6
    assert(math.abs(fitted - k) <= tol,
      s"sum n*iso $fitted must equal total positives $k (PAVA identity)")
  }

  test("the minimax identity reproduces a JVM PAVA replay") {
    val n = rows.map(_.getAs[Long]("n_customers"))
    val k = rows.map(_.getAs[Long]("k_active"))
    // classic stack PAVA over (n, k) pools in score order
    val stack = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (i <- rows.indices) {
      stack += ((n(i), k(i)))
      var merged = true
      while (merged && stack.length >= 2) {
        val (n2, k2) = stack(stack.length - 1)
        val (n1, k1) = stack(stack.length - 2)
        // rate2 < rate1  <=>  k2*n1 < k1*n2 (exact integer comparison)
        if (k2 * n1 < k1 * n2) {
          stack.remove(stack.length - 1)
          stack(stack.length - 1) = (n1 + n2, k1 + k2)
        } else merged = false
      }
    }
    // expand pools to per-bin fitted rates
    val perBin = scala.collection.mutable.ArrayBuffer[Double]()
    var idx = 0
    stack.foreach { case (pn, pk) =>
      var w = 0L
      val rate = pk.toDouble / pn.toDouble
      while (w < pn) {
        w += n(idx); perBin += rate; idx += 1
      }
      assert(w == pn, "pool weights must partition the bins")
    }
    assert(perBin.length == rows.length)
    rows.indices.foreach { i =>
      assert(math.abs(rows(i).getAs[Double]("iso_rate") - perBin(i)) <= 1e-6,
        s"bin $i: iso ${rows(i).getAs[Double]("iso_rate")} vs PAVA " +
          s"${perBin(i)}")
    }
  }
}
