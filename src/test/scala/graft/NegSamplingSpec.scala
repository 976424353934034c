package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusStatsQueries

/** q418's smoothing contract: lowering α flattens the sampler —
  * entropy (and effective vocab) strictly rises, the bottom-half mass
  * strictly rises (the rare-token boost), the top-decile mass falls —
  * and every row's entropy is bounded by log2(vocab). */
class NegSamplingSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = CorpusStatsQueries.q418NegSampling(spark, sfDir)
    .collect().sortBy(_.getAs[Double]("alpha"))

  test("flattening direction: entropy and rare mass fall as alpha rises") {
    assert(rows.map(_.getAs[Double]("alpha")).toSeq == Seq(0.5, 0.75, 1.0))
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Double]("entropy_bits") >
          hi.getAs[Double]("entropy_bits"),
          s"smaller alpha must flatten (raise entropy): $lo vs $hi")
        assert(lo.getAs[Double]("bottom_half_mass") >
          hi.getAs[Double]("bottom_half_mass"), s"$lo vs $hi")
        assert(lo.getAs[Double]("top_decile_mass") <
          hi.getAs[Double]("top_decile_mass"), s"$lo vs $hi")
      case _ =>
    }
  }

  test("entropy bounded by log2(vocab); effective vocab consistent") {
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val v = r.getAs[Long]("vocab")
      assert(h > 0.0 && h <= math.log(v.toDouble) / math.log(2.0) + 1e-9,
        s"entropy cannot exceed the uniform bound: $r")
      assert(math.abs(r.getAs[Double]("effective_vocab")
        - math.pow(2.0, h)) < 1e-3, r.toString)
      assert(r.getAs[Double]("effective_vocab") <= v.toDouble + 1e-6)
    }
  }
}
