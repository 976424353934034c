package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExperimentQueries

/** q367's coverage contract: the split is a partition of the fact, the
  * rank index is the finite-sample conformal index (not the plug-in
  * percentile), and the measured coverage honors the >=90% marginal
  * guarantee within binomial noise on the disjoint test half. */
class ConformalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val r =
    ExperimentQueries.q367ConformalCert(spark, sfDir).collect().head

  test("the md5 split partitions the fact exactly") {
    val total = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") == total)
    assert(r.getAs[Long]("n_cal") > 0 && r.getAs[Long]("n_test") > 0)
  }

  test("k is the finite-sample conformal rank ceil(0.9 * (n_cal + 1))") {
    val n = r.getAs[Long]("n_cal")
    assert(r.getAs[Long]("k") == math.ceil(0.9 * (n + 1)).toLong)
  }

  test("coverage honors the 90% marginal guarantee within noise") {
    val cov = r.getAs[Double]("coverage")
    val n = r.getAs[Long]("n_test").toDouble
    // 4-sigma binomial band around the guaranteed >= 0.9 marginal rate
    val slack = 4.0 * math.sqrt(0.9 * 0.1 / n)
    assert(cov >= 0.9 - slack, s"coverage $cov below guarantee band")
    assert(cov <= 1.0)
    assert(math.abs(r.getAs[Double]("coverage_gap") - (cov - 0.9)) < 2e-6)
  }
}
