package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SeriesQueries

/** q366's recursion contract: the relational fold must compute the
  * TEXTBOOK Holt–Winters additive recursion — verified by replaying
  * the identical IEEE chain in plain JVM doubles on the same series
  * and comparing error mass and next-month forecast, plus the basic
  * backtest invariants. */
class HoltWintersSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = SeriesQueries.q366HoltWinters(spark, sfDir)
    .collect().map(r => r.getAs[String]("nation") -> r).toMap

  test("backtest shape: burn-in of 12, non-negative error masses") {
    assert(rows.nonEmpty)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_test") == r.getAs[Long]("n_months") - 12L)
      assert(r.getAs[Double]("mae_hw") >= 0.0, r.toString)
      assert(r.getAs[Double]("mae_snaive") >= 0.0, r.toString)
    }
  }

  test("the fold reproduces a plain-JVM Holt-Winters replay exactly") {
    val nation = rows.keys.min
    val v = SeriesQueries.nationMonthlyCentsVecs(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("nation") === nation)
      .collect().head.getSeq[Long](1)
    val m = v.length
    assert(m >= 25, s"fixture must span >= 25 months, got $m")
    val vd = v.map(_.toDouble)
    val meanA = vd.slice(0, 12).foldLeft(0.0)(_ + _) / 12.0
    val meanB = vd.slice(12, 24).foldLeft(0.0)(_ + _) / 12.0
    var l = meanA
    var b = (meanB - meanA) / 12.0
    val s = Array.tabulate(12)(i => vd(i) - meanA)
    var sae = 0.0
    for (t <- 13 to m) {
      val x = vd(t - 1)
      val idx = (t - 1) % 12
      val scur = s(idx)
      val f = l + b + scur
      val lp = 0.3 * (x - scur) + 0.7 * (l + b)
      val bp = 0.1 * (lp - l) + 0.9 * b
      sae += math.abs(x - f)
      s(idx) = 0.2 * (x - lp) + 0.8 * scur
      l = lp; b = bp
    }
    val expMae = sae / (m - 12).toDouble / 100.0
    val expNext = (l + b + s(m % 12)) / 100.0
    val r = rows(nation)
    assert(math.abs(r.getAs[Double]("mae_hw") - expMae) <=
      1e-6 * math.max(1.0, math.abs(expMae)),
      s"mae_hw ${r.getAs[Double]("mae_hw")} vs JVM replay $expMae")
    assert(math.abs(r.getAs[Double]("forecast_next") - expNext) <=
      1e-6 * math.max(1.0, math.abs(expNext)),
      s"forecast_next ${r.getAs[Double]("forecast_next")} vs $expNext")
  }

  test("seasonal-naive matches a direct integer recomputation") {
    val nation = rows.keys.min
    val v = SeriesQueries.nationMonthlyCentsVecs(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("nation") === nation)
      .collect().head.getSeq[Long](1)
    val m = v.length
    val sn = (13 to m).map(t => math.abs(v(t - 1) - v(t - 13))).sum
    val expMae = sn.toDouble / (m - 12).toDouble / 100.0
    val got = rows(nation).getAs[Double]("mae_snaive")
    assert(math.abs(got - expMae) <= 1e-6 * math.max(1.0, expMae),
      s"mae_snaive $got vs integer recomputation $expMae")
  }
}
