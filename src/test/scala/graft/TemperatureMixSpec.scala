package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorpusStatsQueries, SplitQueries}

/** q372 + q373 contracts: Good–Turing's unseen-mass prediction must be
  * a genuine probability that lands near the measured held-out OOV
  * rate, and temperature scaling must compress shares toward uniform
  * without changing their order. */
class TemperatureMixSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q372: GT mass is a probability and the ledger is consistent") {
    val r = CorpusStatsQueries.q372GoodTuring(spark, sfDir).collect().head
    val gt = r.getAs[Double]("gt_unseen_mass")
    val meas = r.getAs[Double]("measured_oov_rate")
    assert(gt >= 0.0 && gt <= 1.0)
    assert(meas >= 0.0 && meas <= 1.0)
    assert(r.getAs[Long]("oov_tokens") <= r.getAs[Long]("n_test_tokens"))
    assert(r.getAs[Long]("f1") <= r.getAs[Long]("n_train_types"))
    assert(math.abs(r.getAs[Double]("gt_minus_measured") - (gt - meas))
      <= 2e-6)
  }

  test("q373: tau=2 compresses toward uniform, order-preserving") {
    val rows = SplitQueries.q373TemperatureMix(spark, sfDir).collect()
    assert(rows.length >= 2, "need several sources to rebalance")
    val raw = rows.map(_.getAs[Double]("share_raw"))
    val t2 = rows.map(_.getAs[Double]("share_tau2"))
    assert(math.abs(raw.sum - 1.0) < 1e-4 && math.abs(t2.sum - 1.0) < 1e-4)
    // order preserved: sqrt is monotone
    assert(raw.zip(t2).sliding(2).forall {
      case Array((r1, s1), (r2, s2)) =>
        (r1 <= r2 + 1e-9) == (s1 <= s2 + 1e-9) ||
          math.abs(r1 - r2) < 1e-6
      case _ => true
    })
    // compression: the largest source loses share, the smallest gains
    val iMax = raw.indexOf(raw.max); val iMin = raw.indexOf(raw.min)
    if (raw.max - raw.min > 1e-4) {
      assert(t2(iMax) <= raw(iMax) + 1e-9,
        "temperature must shrink the dominant source's share")
      assert(t2(iMin) >= raw(iMin) - 1e-9,
        "temperature must boost the smallest source's share")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens_1b") >= 0L)
      assert(r.getAs[Double]("effective_epochs") >= 0.0)
    }
  }
}
