package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ScrubQueries

/** q380's costing contract: the victim cascade is non-empty and
  * internally consistent, touched partitions are a subset of all
  * partitions, and rewrite amplification is >= 1 by construction
  * (victim rows live inside the partitions being rewritten). */
class DeletionCostSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val r =
    ScrubQueries.q380DeletionCost(spark, sfDir).collect().head

  test("the victim cascade is non-empty and consistent") {
    assert(r.getAs[Long]("n_victims") > 0L, "md5 cohort must select someone")
    assert(r.getAs[Long]("n_orders") >= 0L)
    assert(r.getAs[Long]("months_touched") <=
      r.getAs[Long]("months_total"))
    if (r.getAs[Long]("n_lineitems") > 0)
      assert(r.getAs[Long]("months_touched") > 0L)
  }

  test("rewrite amplification >= 1 and matches its own ledger") {
    val nl = r.getAs[Long]("n_lineitems")
    if (nl > 0) {
      val amp = r.getAs[Double]("rewrite_amplification")
      assert(amp >= 1.0 - 1e-9,
        s"rows_touched must cover the victim rows: $r")
      val expected = r.getAs[Long]("rows_touched").toDouble / nl
      assert(math.abs(amp - expected) <= 2e-6, r.toString)
    }
  }
}
