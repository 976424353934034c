package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QualityQueries

/** q429's bias contract: the quality gate's pass rate is monotone
  * non-decreasing in length (the designed bias), its decile spread
  * dwarfs the NLL gate's (the perplexity gate is the length-neutral
  * baseline), and the deciles are equal-count with ordered length
  * ranges. */
class GateLengthBiasSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = QualityQueries.q429GateLengthBias(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("length_decile"))

  test("quality pass rate climbs with length; NLL stays comparatively flat") {
    assert(rows.map(_.getAs[Long]("length_decile")).toSeq == (1L to 10L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("quality_pass_share") <=
          b.getAs[Double]("quality_pass_share"),
          s"the composite's length terms make its gate monotone: $a vs $b")
        assert(a.getAs[Int]("max_tokens") <= b.getAs[Int]("min_tokens") + 1,
          s"deciles must be length-ordered: $a vs $b")
      case _ =>
    }
    def spread(c: String): Double = {
      val v = rows.map(_.getAs[Double](c)); v.max - v.min
    }
    assert(spread("quality_pass_share") > 2 * spread("nll_pass_share"),
      s"the quality gate's length bias must dwarf the NLL gate's: " +
        s"q=${spread("quality_pass_share")} nll=${spread("nll_pass_share")}")
  }

  test("equal-count deciles") {
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1, s"equal-count split: $counts")
  }
}
