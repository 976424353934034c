package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans

/** q375's selection contract: the kept half is the FAR half of every
  * cell — so kept means dominate cell means, the cut distance lower-
  * bounds nothing kept violates, and the split sizes are exact halves
  * (ceil for odd cells). */
class CoresetSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = KMeans.q375CoresetCells(spark, sfDir).collect()

  test("split sizes: kept = n - floor(n/2), every cell represented") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_members")
      assert(r.getAs[Long]("n_kept") == n - n / 2, r.toString)
    }
  }

  test("the kept half is the far half") {
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_d2_kept") >=
        r.getAs[Double]("mean_d2_all") - 1e-9,
        s"pruning prototypes must raise the mean distance: $r")
      // cut_d2 is the largest DROPPED distance; with >= 2 members it is
      // a genuine lower boundary of the kept half
      if (r.getAs[Long]("n_members") >= 2)
        assert(r.getAs[Double]("cut_d2") <=
          r.getAs[Double]("mean_d2_kept") + 1e-9 ||
            r.getAs[Double]("mean_d2_kept") == 0.0, r.toString)
    }
  }
}
