package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DupClusters

/** q427's robustness contract: similarity decays strictly with edit
  * intensity, detection is monotone non-increasing, the prefix filter
  * is recall-complete (every verified pair IS a candidate — candidate
  * share dominates verified share on each row), and one substitution
  * never hides a ~50-token document from the 0.7 verify. */
class EditToleranceSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = DupClusters.q427EditTolerance(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("k_edits"))

  test("the curve: similarity and detection fall with edit intensity") {
    assert(rows.map(_.getAs[Long]("k_edits")).toSeq == Seq(1L, 2L, 4L, 8L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("avg_jaccard") >
          b.getAs[Double]("avg_jaccard"),
          s"more edits must lower similarity: $a vs $b")
        assert(a.getAs[Long]("n_verified") >= b.getAs[Long]("n_verified"),
          s"$a vs $b")
      case _ =>
    }
    assert(rows.head.getAs[Double]("verified_share") == 1.0,
      s"one substitution in a ~50-token doc keeps J well above 0.7: " +
        s"${rows.head}")
  }

  test("prefix-filter recall-completeness: candidates dominate verified") {
    rows.foreach { r =>
      assert(r.getAs[Long]("n_candidates") >= r.getAs[Long]("n_verified"),
        s"a verified pair that never surfaced as a candidate would " +
          s"break the prefix filter's contract: $r")
      assert(r.getAs[Long]("n_pairs") == rows.head.getAs[Long]("n_pairs"),
        "one planted pair per base doc per intensity")
    }
  }
}
