package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LmQueries

/** q391's tuning-table contract: drops are monotone non-increasing in
  * the cut, shares bounded, and the per-lang doc totals reconcile with
  * q59's registered scoring. */
class NllSweepSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = LmQueries
    .q391NllThresholdSweep(spark, sfDir).collect()

  test("monotone drops, bounded shares, four cuts per language") {
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Double]("nll_cut"))
      assert(sorted.map(_.getAs[Double]("nll_cut")).toSeq ==
        Seq(6.0, 7.0, 8.0, 9.0))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("docs_dropped") >=
            b.getAs[Long]("docs_dropped"),
            "a higher cut can only drop fewer docs")
          assert(a.getAs[Long]("tokens_dropped") >=
            b.getAs[Long]("tokens_dropped"))
        case _ =>
      }
      sorted.foreach { r =>
        assert(r.getAs[Double]("doc_drop_share") <= 1.0 + 1e-9)
        assert(r.getAs[Double]("token_drop_share") <= 1.0 + 1e-9)
      }
    }
  }

  test("drop counts reconcile with q59's registered scores") {
    val scored = LmQueries.q59UnigramNll(spark, sfDir).collect()
    val expect = scored.groupBy(_.getAs[String]("lang")).map {
      case (lang, rs) =>
        lang -> rs.count(_.getAs[Double]("avg_nll") > 8.0).toLong
    }
    rows.filter(_.getAs[Double]("nll_cut") == 8.0).foreach { r =>
      assert(r.getAs[Long]("docs_dropped") ==
        expect(r.getAs[String]("lang")),
        s"cut=8 drop count diverges for ${r.getAs[String]("lang")}")
    }
  }
}
