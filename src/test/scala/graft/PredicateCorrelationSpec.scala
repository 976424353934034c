package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EstimateQueries

/** q408's audit contract: independent base-column pairs certify a
  * correlation factor ≈ 1 (the generator draws them independently),
  * the derived-expression and same-column pairs land well above 1, and
  * the probability algebra holds on every row (joint ≤ min marginal,
  * q_error ≥ 1, q_error consistent with the factor). */
class PredicateCorrelationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val byPair =
    EstimateQueries.q408PredicateCorrelation(spark, sfDir).collect()
      .map(r => (r.getAs[String]("pred_a"), r.getAs[String]("pred_b")) -> r)
      .toMap

  test("independent base pairs sit near factor 1; dependent pairs far above") {
    val indep = Seq(("qty_gt25", "disc_gt05"), ("qty_gt25", "price_gt30k"),
      ("disc_gt05", "price_gt30k"))
    indep.foreach { k =>
      val f = byPair(k).getAs[Double]("corr_factor")
      assert(f > 0.9 && f < 1.1, s"$k expected ~independent, factor=$f")
    }
    val derived = byPair(("price_gt30k", "rev_gt30k"))
      .getAs[Double]("corr_factor")
    val sameCol = byPair(("ship_ge99", "ship_in99"))
      .getAs[Double]("corr_factor")
    assert(derived > 1.3, s"derived-expression pair must correlate: $derived")
    assert(sameCol > 2.0, s"same-column range pair must correlate: $sameCol")
  }

  test("probability algebra: joint bounded by marginals; q_error >= 1") {
    byPair.values.foreach { r =>
      assert(r.getAs[Long]("n_joint") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")), r.toString)
      val qe = r.getAs[Double]("q_error")
      assert(qe >= 1.0, r.toString)
      val f = r.getAs[Double]("corr_factor")
      val expect = if (f >= 1.0) f else 1.0 / f
      assert(math.abs(qe - expect) < 1e-4,
        s"q_error must be the factor folded above 1: $r")
    }
  }

  test("the same-column pair is a strict subset: joint == n_b") {
    val r = byPair(("ship_ge99", "ship_in99"))
    assert(r.getAs[Long]("n_joint") == r.getAs[Long]("n_b"),
      s"year(ship)=1999 implies ship >= 1999-01-01: $r")
  }
}
