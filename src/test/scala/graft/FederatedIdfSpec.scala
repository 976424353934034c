package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RankQueries

/** q425's federation contract: local-IDF scoring genuinely drifts from
  * the global ranking on sharded corpora (somewhere on the sweep the
  * overlap is imperfect — the reason global-IDF refreshes exist), the
  * drift magnitude is positive wherever overlap is imperfect, and the
  * accounting is bounded by the protocol (overlap ≤ k, recall
  * consistent). */
class FederatedIdfSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = RankQueries.q425FederatedIdf(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("n_shards"))

  test("local IDF drifts: the sweep is not uniformly perfect") {
    assert(rows.map(_.getAs[Long]("n_shards")).toSeq == Seq(2L, 4L, 8L))
    assert(rows.exists(r => r.getAs[Long]("overlap") < r.getAs[Long]("k")),
      s"sharded stats must disagree with global stats somewhere: " +
        s"${rows.mkString("; ")}")
  }

  test("drift accounting: bounded overlap, consistent recall, real drift") {
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      assert(r.getAs[Long]("overlap") <= k, r.toString)
      assert(math.abs(r.getAs[Double]("recall_at_k") -
        r.getAs[Long]("overlap").toDouble / k) < 1e-9, r.toString)
      if (r.getAs[Long]("overlap") < k)
        assert(r.getAs[Double]("max_score_drift") > 0.0,
          s"an imperfect merge implies nonzero score distortion: $r")
    }
  }
}
