package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DupClusters

/** q364's weighting contract: soft-dedup weights must conserve mass
  * cluster-by-cluster (each cluster contributes its MEAN member's
  * token count once, so effective ≤ raw with equality only for a
  * duplicate-free source), and the weighted-membership count must
  * reconcile exactly with q45's registered cluster output. */
class SoftDedupSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows =
    DupClusters.q364SoftDedupWeights(spark, sfDir).collect()

  test("every source is weighted down: 0 < discount < 1, eff < raw") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_tokens").toDouble
      val eff = r.getAs[Double]("effective_tokens")
      val disc = r.getAs[Double]("dedup_discount")
      assert(eff > 0.0 && eff < raw, r.toString)
      // the q45 corpus appends two variants per base doc, so every
      // source that contributes docs contributes clusters
      assert(disc > 0.0 && disc < 1.0, r.toString)
    }
  }

  test("weighted membership reconciles with q45's cluster output") {
    val nWeighted = rows.map(_.getAs[Long]("n_weighted")).sum
    val q45Docs = DupClusters.q45DupClusters(spark, sfDir).count()
    assert(nWeighted == q45Docs,
      s"docs carrying weight < 1 ($nWeighted) must equal q45's" +
        s" clustered-doc count ($q45Docs)")
  }

  test("doc census is the 3-variant corpus, clustered docs a subset") {
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") % 3 == 0, r.toString)
      assert(r.getAs[Long]("n_weighted") <= r.getAs[Long]("n_docs"))
    }
  }
}
