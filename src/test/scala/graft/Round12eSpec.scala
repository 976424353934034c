package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-12e queries (q227–q245): mathematical
  * properties the DuckDB hash gate can't distinguish from coordinated
  * drift. */
class Round12eSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q227: the base month's index is exactly 1") {
    val rows = queries.MarketQueries.q227PriceIndex(spark, sfDir).collect()
    val base = rows.find(_.getAs[String]("month") == "1995-01")
    assert(base.isDefined)
    assert(math.abs(base.get.getAs[Double]("laspeyres_index") - 1.0) < 1e-9)
  }

  test("q228: token Gini in [0,1)") {
    val g = queries.CorpusStatsQueries.q228TokenGini(spark, sfDir)
      .collect().head.getAs[Double]("gini")
    assert(g >= 0 && g < 1)
  }

  test("q229: the first quarter is all-new revenue") {
    val rows = queries.FunnelQueries.q229NewVsReturning(spark, sfDir)
      .orderBy("quarter").collect()
    assert(math.abs(rows.head.getAs[Double]("new_share") - 1.0) < 1e-9)
    assert(rows.head.getAs[Double]("returning_revenue") == 0.0)
  }

  test("q231: quartiles ordered and a positive bin recommendation") {
    val r = queries.StatsQueries.q231FdBinning(spark, sfDir).collect().head
    assert(r.getAs[Double]("q1") <= r.getAs[Double]("q3"))
    assert(r.getAs[Long]("fd_bins") >= 1)
  }

  test("q233: Count-Min never underestimates") {
    val rows = queries.CorpusStatsQueries.q233CountMinCert(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_cnt"))
      assert(r.getAs[Long]("overestimate") >= 0)
    }
  }

  test("q234: q-error is >= 1 by construction") {
    queries.EstimateQueries.q234JoinCardEst(spark, sfDir).collect()
      .foreach(r => assert(r.getAs[Double]("q_error") >= 1.0 - 1e-9))
  }

  test("q235: defined rich-club densities lie in [0,1]") {
    queries.GraphQueries.q235RichClub(spark, sfDir).collect().foreach { r =>
      val phi = Option(r.getAs[java.lang.Double]("phi"))
      phi.foreach(p => assert(p >= 0 && p <= 1, s"phi $p"))
    }
  }

  test("q236: truncation losses shrink as the context grows") {
    val rows = queries.LmQueries.q236ContextOverflow(spark, sfDir)
      .orderBy("context_len").collect()
    val losses = rows.map(_.getAs[Double]("token_loss_share"))
    assert(losses.zip(losses.tail).forall { case (a, b) => b <= a + 1e-12 })
  }

  test("q237: pair overlaps bounded by the list length") {
    val rows = queries.RankQueries.q237Bm25Stability(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val c = r.getAs[Long]("n_common")
      assert(c >= 1 && c <= 10)
      val j = r.getAs[Double]("jaccard")
      assert(j > 0 && j <= 1)
    }
  }

  test("q238: five folds, non-negative spread, consistent sign count") {
    val rows = queries.ExperimentQueries.q238FoldStability(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Int]("fold")).toSeq.sorted == (0 to 4))
    assert(rows.head.getAs[Double]("slope_spread") >= 0)
    val np = rows.head.getAs[Long]("n_positive")
    assert(np == rows.count(_.getAs[Double]("slope") > 0))
  }

  test("q239: residual cells reproduce q179's chi-square when squared") {
    val cells = queries.InfoQueries.q239ResidualCells(spark, sfDir)
      .collect()
    assert(cells.length == 25)
    val chi2FromCells = cells.map { r =>
      val res = r.getAs[Double]("residual"); res * res
    }.sum
    val chi2 = queries.InfoQueries.q179Chi2Independence(spark, sfDir)
      .collect().head.getAs[Double]("chi2")
    assert(math.abs(chi2FromCells - chi2) < 1e-2,
      s"sum of squared residuals $chi2FromCells vs chi2 $chi2")
  }

  test("q241: control limits bracket the center line") {
    queries.SeriesQueries.q241PChart(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Double]("lcl") <= r.getAs[Double]("p_bar"))
      assert(r.getAs[Double]("p_bar") <= r.getAs[Double]("ucl"))
    }
  }

  test("q242: coverage is monotone in vocab size") {
    val rows = queries.CorpusStatsQueries.q242VocabSizing(spark, sfDir)
      .orderBy("vocab_size").collect()
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => b >= a - 1e-12 })
    assert(cov.forall(c => c > 0 && c <= 1))
  }

  test("q244: shrinkage corrections are ranked and non-negative") {
    val rows = queries.EstimateQueries.q244EbShrinkage(spark, sfDir)
      .collect()
    val cs = rows.map(_.getAs[Double]("correction"))
    assert(cs.forall(_ >= 0))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b - 1e-12 })
  }

  test("q245: overlap bounded by captures; estimate positive") {
    val r = queries.EstimateQueries.q245CaptureRecapture(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("m") <= math.min(r.getAs[Long]("n1"),
      r.getAs[Long]("n2")))
    assert(r.getAs[Long]("chapman_est") > 0)
  }
}
