package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QualityQueries

/** q424's tuning-surface contract: kept mass is monotone along BOTH
  * grid axes (loosening either gate can only keep more), the loosest
  * corner is the global max and the tightest the global min, and both
  * gates actually bite somewhere on the grid (no inert dimension). */
class GateGridSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val byCell = QualityQueries.q424GateGrid(spark, sfDir)
    .collect()
    .map(r => (r.getAs[Double]("quality_min"), r.getAs[Double]("nll_max"))
      -> r.getAs[Long]("kept_docs")).toMap

  private val qs = Seq(0.4, 0.5, 0.6)
  private val ns = Seq(3.40, 3.41, 3.43)

  test("monotone along both axes; extreme corners are global extremes") {
    for (q <- qs; Seq(a, b) <- ns.sliding(2))
      assert(byCell((q, a)) <= byCell((q, b)),
        s"raising the NLL ceiling can only keep more: ($q, $a->$b)")
    for (n <- ns; Seq(a, b) <- qs.sliding(2))
      assert(byCell((a, n)) >= byCell((b, n)),
        s"raising the quality floor can only keep fewer: ($a->$b, $n)")
    val all = byCell.values
    assert(byCell((qs.min, ns.max)) == all.max)
    assert(byCell((qs.max, ns.min)) == all.min)
  }

  test("no inert dimension: each gate bites somewhere on the grid") {
    assert(byCell((qs.min, ns.min)) != byCell((qs.min, ns.max)),
      "the NLL axis must change the kept set at the loosest floor")
    assert(byCell((qs.min, ns.max)) != byCell((qs.max, ns.max)),
      "the quality axis must change the kept set at the loosest ceiling")
  }
}
