package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DocQueries

/** q389's estimator contract: mean |error| shrinks as the signature
  * grows (the sqrt(J(1-J)/k) law, measured), every error is bounded by
  * 1, and the pair census is identical across the three k rows (same
  * candidates, three prefixes). */
class SigCalibrationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = DocQueries
    .q389SigLengthCalibration(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("k"))

  test("three prefixes over one candidate census") {
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(8L, 16L, 32L))
    assert(rows.map(_.getAs[Long]("n_pairs")).distinct.length == 1,
      "every k scores the same surfaced pairs")
    assert(rows.head.getAs[Long]("n_pairs") > 0)
  }

  test("longer signatures estimate no worse; errors bounded") {
    val mae = rows.map(_.getAs[Double]("mean_abs_err"))
    assert(mae(0) >= mae(2) - 1e-9,
      s"k=32 must beat k=8 on mean |error|: $mae")
    rows.foreach { r =>
      assert(r.getAs[Double]("max_abs_err") <= 1.0 + 1e-9)
      assert(math.abs(r.getAs[Double]("mean_err")) <=
        r.getAs[Double]("mean_abs_err") + 1e-9)
    }
  }
}
